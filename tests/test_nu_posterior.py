"""Posterior over nu (VERDICT r3 item 5): traced-nu gradients + sampler.

The reference's flagship sweep covers nu in [1, 25] and its MAP analysis
moves nu off the bound to 3.03
(reference examples/FindOptimalCovarianceParameters.py:119-146,664-666).
The nu coordinate rides autodiff through the from-scratch Bessel K_nu
(ops.special: Temme series + Steed CF2 + masked recurrence) — these
tests validate that gradient against central differences, which nothing
else exercises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gppe_tpu.models import hmc
from gppe_tpu.models.kernel_posterior import (make_bounded_log_posterior_nu,
                                              make_profile_loglik,
                                              make_profile_loglik_nu)
from gppe_tpu.ops import kernels
from gppe_tpu.utils import data as data_utils


@pytest.fixture(scope="module")
def problem_small():
    pts = data_utils.generate_points(8, dimension=2)    # n=64
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    return pts, z, X


def test_matern_nu_gradient_matches_fd():
    """d k(x; nu)/d nu through the Bessel K_nu autodiff vs central
    differences, across the general-nu range."""
    xs = jnp.asarray([0.05, 0.3, 1.0, 2.5, 6.0])
    for nu in [0.7, 1.3, 2.2, 3.7, 8.0, 20.0]:
        g = jax.vmap(jax.grad(lambda n_, x=xs: jnp.sum(
            kernels.matern(x, n_))))(jnp.asarray([nu]))[0]
        h = 1e-5 * nu
        fd = (np.asarray(kernels.matern(xs, nu + h)).sum()
              - np.asarray(kernels.matern(xs, nu - h)).sum()) / (2 * h)
        assert float(g) == pytest.approx(float(fd), rel=1e-4), (nu, g, fd)


def test_profile_loglik_nu_gradients_match_fd(problem_small):
    """All three gradients of lp(log10 eta, log10 rho, nu) vs central
    differences — the leapfrog force HMC integrates."""
    pts, z, X = problem_small
    lp = make_profile_loglik_nu(pts, z, X)
    grad = jax.jit(jax.grad(lambda t: lp(t[0], t[1], t[2])))
    for theta in ([0.0, -0.8, 2.0], [0.5, -1.0, 3.5], [-0.5, -0.7, 1.2]):
        t0 = jnp.asarray(theta)
        g = np.asarray(grad(t0))
        for i in range(3):
            h = 1e-5 * max(abs(theta[i]), 1.0)
            tp = np.asarray(theta, float)
            tm = tp.copy()
            tp[i] += h
            tm[i] -= h
            fd = (float(lp(*tp)) - float(lp(*tm))) / (2 * h)
            assert g[i] == pytest.approx(fd, rel=2e-4, abs=1e-7), (
                theta, i, g[i], fd)


def test_profile_loglik_nu_matches_static_at_closed_form(problem_small):
    """At nu = 0.5 the traced-nu pipeline must equal the static-nu
    2-parameter surface exactly (same Cholesky pipeline, closed-form
    branch selected elementwise)."""
    pts, z, X = problem_small
    lp3 = make_profile_loglik_nu(pts, z, X)
    lp2 = make_profile_loglik(pts, z, X, nu=0.5)
    # rtol: the traced-nu path evaluates the kernel on the UNIQUE
    # distance set and gathers back (reordered arithmetic vs dense)
    for le, lr in [(0.0, -1.0), (1.0, -0.6), (-1.5, -1.2)]:
        np.testing.assert_allclose(float(lp3(le, lr, 0.5)),
                                   float(lp2(le, lr)), rtol=1e-9)


def test_sample_posterior_nu_smoke(problem_small):
    """Short 3-param HMC run: finite samples inside the box, chains
    move, nu coordinate actually explored."""
    pts, z, X = problem_small
    res = hmc.sample_posterior_nu(pts, z, X, num_chains=4,
                                  num_samples=40, num_warmup=40,
                                  num_leapfrog=8, key=2,
                                  log10_rho_bounds=(-1.5, -0.3),
                                  nu_bounds=(0.6, 25.0))
    s = np.asarray(res.samples)
    assert s.shape == (40, 4, 3)
    assert np.all(np.isfinite(s))
    assert np.all((s[..., 2] > 0.6) & (s[..., 2] < 25.0))
    assert float(np.mean(np.asarray(res.accept_rate))) > 0.2
    assert np.std(s[..., 2]) > 1e-3          # nu is being explored


def test_profile_posterior_rho_nu_smoke(problem_small):
    """Profiled (rho, nu) sampler: the eta-maximized target (the
    sampler counterpart of the reference's MAP sweep) runs, accepts,
    and stays in the box."""
    res = hmc.sample_profile_posterior_rho_nu(
        problem_small[0], problem_small[1], problem_small[2],
        num_chains=2, num_samples=15, num_warmup=15, num_leapfrog=4,
        key=1, eta_grid=11, golden_iters=8)
    s = np.asarray(res.samples)
    assert s.shape == (15, 2, 2)
    assert np.all(np.isfinite(s))
    assert np.all((s[..., 1] >= 1.0) & (s[..., 1] <= 25.0))
    assert float(np.mean(np.asarray(res.accept_rate))) > 0.2


def test_artifact_marginals_match_golden_surface():
    """Distributional validation of the shipped profiled-(rho, nu)
    sampler artifact against the exp-normalized golden with-prior
    surface (VERDICT r4 item 3): the raw chains must reproduce the
    golden MARGINALS (quantiles + binned TV) — the golden-MAP recovery
    claim belongs to the deterministic refinement, which the artifact
    records separately in map_refined."""
    import os
    import pickle

    from drivers.sample_posterior import (_marginal_validation,
                                          golden_marginals)

    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        "profile_posterior_rho_nu.pickle")
    gold_path = "/root/reference/data/OptimalCovariance_WithPrior.pickle"
    if not (os.path.exists(path) and os.path.exists(gold_path)):
        pytest.skip("artifact or golden surface not present")
    with open(path, "rb") as f:
        art = pickle.load(f)
    flat = np.asarray(art["samples"]).reshape(-1, 2)
    gold = golden_marginals(gold_path)
    v = _marginal_validation(10.0 ** flat[:, 0], flat[:, 1], gold)
    # rho: golden support is [0.1, 0.3] — quartiles must agree to a few
    # grid cells; nu: the ridge is flat (< 0.5 nat), marginal broad —
    # quartiles within ~12% of the [1, 25] range, TV modest
    assert v["quantiles"]["rho"]["max_abs_diff"] < 0.08, v
    assert v["quantiles"]["nu"]["max_abs_diff"] < 3.0, v
    assert v["tv_rho"] < 0.2, v
    assert v["tv_nu"] < 0.2, v
    # regenerated artifacts carry convergence diagnostics
    if "diagnostics" in art:
        for name in ("log10_rho", "nu"):
            assert art["diagnostics"][name]["rhat"] < 1.2
            assert art["diagnostics"][name]["ess"] > 30
