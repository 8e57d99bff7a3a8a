"""Tests for the 2-D (rho, nu) amortized posterior surface
(models.krylov_posterior.KrylovPosteriorSurfaceRhoNu) — the large-N
(eta, rho, nu) HMC target (VERDICT r4 item 2: nu as a first-class
inference coordinate at any n, not just the n=900 dense path).

Oracle: the dense traced-nu profile likelihood
(models.kernel_posterior.make_profile_loglik_nu), itself FD-validated
and golden-tested. The surface runs exact FFT matvecs per node, so the
only error sources are Lanczos truncation, the shared-probe SLQ logdet,
and the 2-D barycentric interpolation between nodes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gppe_tpu.models import hmc
from gppe_tpu.models.kernel_posterior import make_profile_loglik_nu
from gppe_tpu.models.krylov_posterior import KrylovPosteriorSurfaceRhoNu
from gppe_tpu.utils import data as data_utils


@pytest.fixture(scope="module")
def dataset():
    pts = data_utils.generate_points(12, dimension=2)    # n = 144 grid
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    return pts, z, X


@pytest.fixture(scope="module")
def surface(dataset):
    pts, z, X = dataset
    return KrylovPosteriorSurfaceRhoNu(
        pts, z, X, log10_rho_bounds=(-1.2, -0.6), nu_bounds=(1.0, 25.0),
        num_rho_nodes=7, num_nu_nodes=9, lanczos_steps=40,
        num_probes=16, key=3)


def test_surface_matches_dense_lp(dataset, surface):
    """lp(eta, rho, nu) within fractions of a nat of the exact dense
    traced-nu profile lp across the 3-D box, at off-node AND node
    (rho, nu) values, closed-form and general nu alike."""
    pts, z, X = dataset
    lp_dense = make_profile_loglik_nu(pts, z, X)
    cases = [(0.5, -0.9, 2.5), (1.0, -1.1, 1.3), (0.0, -0.7, 8.0),
             (1.5, -0.8, 20.0), (0.5, -0.93, 3.034), (2.0, -1.0, 1.0),
             (-0.5, -1.0, 5.0)]
    for le, lr, nu in cases:
        a = float(surface.profile_loglik(le, lr, nu))
        b = float(lp_dense(le, lr, nu))
        tol = 0.35 if le < 0 else 0.1      # small-eta edge: probe variance
        assert abs(a - b) < tol, (le, lr, nu, a, b)


def test_surface_gradient_matches_dense(dataset, surface):
    """Autodiff gradients in all THREE coordinates vs the dense oracle,
    at off-node points (exact node hits have a documented measure-zero
    clamp in the barycentric form)."""
    pts, z, X = dataset
    lp_dense = make_profile_loglik_nu(pts, z, X)
    for th in ([0.5, -0.93, 3.0], [1.2, -0.77, 12.5]):
        th = jnp.asarray(th)
        g_s = jax.grad(lambda t: surface.profile_loglik(
            t[0], t[1], t[2]))(th)
        g_d = jax.grad(lambda t: lp_dense(t[0], t[1], t[2]))(th)
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                                   rtol=0.08, atol=0.3)


def test_bounded_posterior_maps_into_box(surface):
    log_post_u, u_to_theta = surface.make_bounded_log_posterior(
        log10_eta_bounds=(-2.0, 3.0))
    u = jnp.asarray([[-20.0, 20.0, 0.0], [0.0, 0.0, 5.0],
                     [5.0, -5.0, -30.0]])
    th = jax.vmap(u_to_theta)(u)
    assert bool(jnp.all(th[:, 0] >= -2.0)) and bool(jnp.all(th[:, 0] <= 3.0))
    assert bool(jnp.all(th[:, 1] >= -1.2)) and bool(jnp.all(th[:, 1] <= -0.6))
    assert bool(jnp.all(th[:, 2] >= 1.0)) and bool(jnp.all(th[:, 2] <= 25.0))
    vals = jax.vmap(log_post_u)(u)
    assert bool(jnp.all(jnp.isfinite(vals)))


def test_hmc_rho_nu_large(dataset, surface):
    """(eta, rho, nu) HMC on the surface: healthy acceptance, finite
    in-box samples, eta posterior consistent with the fixed-nu surface
    path (same dataset as test_krylov_posterior)."""
    pts, z, X = dataset
    res, _ = hmc.sample_posterior_rho_nu_large(
        pts, z, X, surface=surface, num_chains=8, num_samples=120,
        num_warmup=120, log10_eta_bounds=(-2.0, 3.0), log_prior=None,
        key=2)
    acc = float(np.asarray(res.accept_rate).mean())
    assert 0.5 < acc <= 1.0
    s = np.asarray(res.samples).reshape(-1, 3)
    assert np.all(np.isfinite(s))
    assert np.all((s[:, 2] >= 1.0) & (s[:, 2] <= 25.0))
    # eta bulk: profile-MLE at this dataset sits near log10 eta ~ 1-3
    assert -1.0 < s[:, 0].mean() < 3.0


def test_resume_continues_chain(dataset, surface):
    pts, z, X = dataset
    res1, _ = hmc.sample_posterior_rho_nu_large(
        pts, z, X, surface=surface, num_chains=4, num_samples=10,
        num_warmup=30, log10_eta_bounds=(-2.0, 3.0), log_prior=None,
        key=5)
    res2, _ = hmc.sample_posterior_rho_nu_large(
        pts, z, X, surface=surface, num_chains=4, num_samples=6,
        log10_eta_bounds=(-2.0, 3.0), log_prior=None,
        resume_state=res1.state())
    assert res2.samples.shape == (6, 4, 3)
    assert bool(jnp.all(jnp.isfinite(res2.samples)))


def test_reference_prior_shifts_nu_down(dataset, surface):
    """The reference's inverse-square prior on nu/25 must pull the nu
    marginal down relative to the flat-in-box posterior (the golden MAP
    analysis: prior moves nu* from the bound 25 to 3.03)."""
    pts, z, X = dataset
    kw = dict(surface=surface, num_chains=8, num_samples=100,
              num_warmup=100, log10_eta_bounds=(-2.0, 3.0), key=7)
    res_flat, _ = hmc.sample_posterior_rho_nu_large(
        pts, z, X, log_prior=None, **kw)
    res_ref, _ = hmc.sample_posterior_rho_nu_large(
        pts, z, X, log_prior="reference", **kw)
    nu_flat = np.asarray(res_flat.samples)[..., 2].mean()
    nu_ref = np.asarray(res_ref.samples)[..., 2].mean()
    assert nu_ref < nu_flat


def test_non_grid_points_rejected():
    rng = np.random.RandomState(0)
    pts = rng.rand(100, 2)
    z = rng.standard_normal(100)
    X = np.ones((100, 1))
    with pytest.raises(ValueError, match="grid"):
        KrylovPosteriorSurfaceRhoNu(pts, z, X, num_rho_nodes=3,
                                    num_nu_nodes=3, lanczos_steps=8,
                                    num_probes=4)


def test_nuts_rho_nu_large(dataset, surface):
    """NUTS on the 3-D surface (adaptive-trajectory parity with the HMC
    path): healthy acceptance statistic, finite in-box samples, no
    divergences on the smooth interpolated target."""
    from gppe_tpu.models import nuts

    pts, z, X = dataset
    res, _ = nuts.sample_posterior_rho_nu_large(
        pts, z, X, surface=surface, num_chains=4, num_samples=60,
        num_warmup=60, max_depth=7, log10_eta_bounds=(-2.0, 3.0),
        log_prior=None, key=9)
    acc = float(np.asarray(res.accept_rate).mean())
    assert 0.5 < acc <= 1.0
    s = np.asarray(res.samples).reshape(-1, 3)
    assert np.all(np.isfinite(s))
    assert np.all((s[:, 2] >= 1.0) & (s[:, 2] <= 25.0))
    assert int(np.asarray(res.divergences).sum()) == 0


def test_node_dtype_f64_option(dataset):
    """node_dtype=float64 routes node factorizations to the host CPU in
    native f64 (on the CPU test backend this coincides with the default
    compute dtype — the assertion here is that the routing path builds
    and agrees; the accuracy payoff is measured on-chip in
    data/posterior_rho_nu_n100k_f64.pickle)."""
    pts, z, X = dataset
    kw = dict(log10_rho_bounds=(-1.2, -0.6), nu_bounds=(1.0, 25.0),
              num_rho_nodes=4, num_nu_nodes=4, lanczos_steps=24,
              num_probes=8, key=3)
    s_def = KrylovPosteriorSurfaceRhoNu(pts, z, X, **kw)
    s_f64 = KrylovPosteriorSurfaceRhoNu(pts, z, X,
                                        node_dtype=jnp.float64, **kw)
    for le, lr, nu in [(0.5, -0.9, 2.5), (1.0, -1.0, 8.0)]:
        a = float(s_def.profile_loglik(le, lr, nu))
        b = float(s_f64.profile_loglik(le, lr, nu))
        assert abs(a - b) < 0.2, (le, lr, nu, a, b)
