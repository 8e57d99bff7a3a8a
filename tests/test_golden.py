"""Golden tests against the reference's pickled results (SURVEY §4 item 3).

The reference ships its quantitative record as pickles under
``/root/reference/data`` (see BASELINE.md). These tests recompute the same
quantities with this framework and compare:

* ``GeneralizedCrossValidation.pickle`` — exact golden: contains the actual
  500x500 correlation matrix K and T0 = trace(K^-1); deterministic to
  machine precision.
* ``NoiseLevelResults.pickle`` — (sigma, sigma0, eta) estimates over noise
  levels at n=2500, rho=0.1, nu=0.5 (reference
  examples/CompareVariousNoiseLevel.py:57-66, exact-trace method): the
  estimates must match to ~1e-4 relative, including the eta=inf
  high-noise boundary optimum.
* ``OptimalCovariance_WithoutPrior.pickle`` — the 61x60 (rho, nu)
  log-likelihood surface at n=900 (reference
  examples/FindOptimalCovarianceParameters.py:643-666). The legacy stack
  omits the -(n-m)/2 log(2pi) constant, so the surfaces must agree up to
  exactly that additive constant.
* ``OptimalCovariance_WithPrior.pickle`` — the MAP surface. Generated with
  the inverse-square priors 1/(1+rho)^2 and 1/(1+nu/25)^2 (reference
  examples/FindOptimalCovarianceParameters.py:128-130; verified:
  Lp_with - Lp_without equals exactly the two log-priors, max deviation
  6e-14 over the whole 61x60 grid), which move the ridge optimum from the
  nu=25 bound to the interior MAP point (rho~0.177, nu~3.03).

The remaining two pickles, ``VariousNumberOfPoints-{dense,sparse}.pickle``,
are *timing* records (the reference machine's wall-clock per phase), not
correctness goldens — they are the baselines ``bench.py`` and
``drivers/compare_various_num_points.py`` race against (see BASELINE.md).
"""

import os
import pickle

import numpy as np
import pytest

import gppe_tpu
from gppe_tpu.models import direct_likelihood as dl
from gppe_tpu.models import profile_likelihood as pl
from gppe_tpu.models.mixed_correlation import MixedCorrelation
from gppe_tpu.utils import data as data_utils

GOLDEN_DIR = "/root/reference/data"

requires_goldens = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR),
    reason="reference golden pickles not available")


def _load(name):
    with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
        return pickle.load(f, encoding="latin1")


@requires_goldens
def test_gcv_traceinv_matches_golden_T0():
    """T0 = trace(K^-1) of the exact K stored in the GCV golden."""
    gcv = _load("GeneralizedCrossValidation.pickle")
    K = np.asarray(gcv["K"])
    T0_golden = float(
        gcv["TraceEstimationUtilitiesList"][0][
            "AuxilliaryEstimationMethodUtilities"]["T0"])
    Km = MixedCorrelation(K, method="eigenvalue")
    T0 = float(Km.traceinv(0.0))
    assert T0 == pytest.approx(T0_golden, rel=1e-9)


@requires_goldens
def test_noise_level_sweep_matches_golden():
    """(sigma, sigma0, eta) vs the exact-method noise-sweep golden, for
    ALL FOUR basis families of the reference driver
    (examples/CompareVariousNoiseLevel.py:138-142), including the eta=inf
    boundary at high noise. One eigendecomposition serves every basis and
    noise level."""
    all_res = _load("NoiseLevelResults.pickle")
    bases = [dict(polynomial_degree=0),                      # Polynomial-0
             dict(polynomial_degree=2),                      # Polynomial-2
             dict(polynomial_degree=4),                      # Polynomial-4
             dict(polynomial_degree=2, trigonometric=True)]  # P-2-Trig-1

    pts = data_utils.generate_points(50, dimension=2)   # n = 2500 grid
    K = gppe_tpu.generate_correlation(pts, 0.1, nu=0.5)
    Km = MixedCorrelation(K, method="eigenvalue")

    for j, basis_kw in enumerate(bases):
        res = all_res[j]
        X = data_utils.generate_basis_functions(pts, **basis_kw)
        for i in (60, 120, 180):
            z = data_utils.generate_data(pts,
                                         float(res["NoiseMagnitude"][i]))
            sd = dl.make_spectral_data(Km, X, z)
            r = pl.find_log_likelihood_der1_zeros(sd, [1e-4, 1e3])
            assert r["sigma"] == pytest.approx(res["sigma"][i],
                                               abs=2e-4), (j, i)
            # trig basis contains the signal exactly -> degenerate
            # eta -> inf boundary; sigma0 then matches at ~1e-3 relative
            # (legacy takes the exact OLS limit, we may localize the root
            # at a huge finite eta — same statistical answer)
            assert r["sigma0"] == pytest.approx(res["sigma0"][i],
                                                rel=1e-3, abs=2e-4), (j, i)
            if np.isinf(res["eta"][i]):
                assert np.isinf(r["eta"]) or r["eta"] > 1e6, (j, i)
            else:
                assert r["eta"] == pytest.approx(res["eta"][i],
                                                 rel=2e-3), (j, i)


@requires_goldens
def test_optimal_covariance_surface_matches_golden():
    """Lp(rho, nu) surface values agree with the golden up to the
    (n-m)/2 log(2pi) constant the legacy stack omits — verified at the
    golden's argmax and at spread-out grid points (general-nu kernels up
    to nu=25 via the pure-JAX Bessel K_nu)."""
    ref = _load("OptimalCovariance_WithoutPrior.pickle")
    rho_grid = np.asarray(ref["DecorrelationScale"])
    nu_grid = np.asarray(ref["nu"])
    Lp = np.asarray(ref["Lp"])

    pts = data_utils.generate_points(30, dimension=2)   # n = 900 grid
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    n, m = X.shape
    const = 0.5 * (n - m) * np.log(2.0 * np.pi)

    imax = np.unravel_index(np.argmax(Lp), Lp.shape)
    probe = [tuple(imax), (0, 0), (30, 30), (60, 10)]
    for i, j in probe:
        K = gppe_tpu.generate_correlation(pts, float(rho_grid[i]),
                                          nu=float(nu_grid[j]))
        Km = MixedCorrelation(K, method="eigenvalue")
        sd = dl.make_spectral_data(Km, X, z)
        r = pl.find_log_likelihood_der1_zeros(sd, [1e-4, 1e3])
        lp = float(dl.log_likelihood(sd, r["sigma"],
                                     max(r["sigma0"], 1e-10)))
        assert lp + const == pytest.approx(Lp[i, j], abs=5e-3), (i, j)


@requires_goldens
def test_optimal_covariance_map_matches_golden():
    """The MAP (with-prior) surface: log-posterior values recomputed with
    this framework's likelihood + priors agree with the golden at the
    golden's own argmax (the interior MAP point rho~0.1767, nu~3.034 from
    SURVEY §6) and at spread-out probes."""
    from gppe_tpu.models.priors import inverse_square_log_prior

    ref = _load("OptimalCovariance_WithPrior.pickle")
    rho_grid = np.asarray(ref["DecorrelationScale"])
    nu_grid = np.asarray(ref["nu"])
    Lp = np.asarray(ref["Lp"])

    pts = data_utils.generate_points(30, dimension=2)   # n = 900 grid
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    n, m = X.shape
    const = 0.5 * (n - m) * np.log(2.0 * np.pi)

    imax = np.unravel_index(np.argmax(Lp), Lp.shape)
    assert rho_grid[imax[0]] == pytest.approx(0.17667, abs=1e-4)
    assert nu_grid[imax[1]] == pytest.approx(3.0339, abs=1e-3)

    probe = [tuple(imax), (10, 40), (45, 20)]
    for i, j in probe:
        rho, nu = float(rho_grid[i]), float(nu_grid[j])
        K = gppe_tpu.generate_correlation(pts, rho, nu=nu)
        Km = MixedCorrelation(K, method="eigenvalue")
        sd = dl.make_spectral_data(Km, X, z)
        r = pl.find_log_likelihood_der1_zeros(sd, [1e-4, 1e3])
        lik = float(dl.log_likelihood(sd, r["sigma"],
                                      max(r["sigma0"], 1e-10)))
        log_post = (lik + float(inverse_square_log_prior(rho))
                    + float(inverse_square_log_prior(nu, scale=25.0)))
        assert log_post + const == pytest.approx(Lp[i, j], abs=5e-3), (i, j)


@requires_goldens
def test_grid_krylov_resolves_golden_ridge():
    """The grid-batched Krylov surface vs the golden no-prior ridge
    (VERDICT r2 item 5 'done' criterion). The golden surface
    (OptimalCovariance_WithoutPrior.pickle) is flat to < 0.2 nat over
    the whole ridge region, so 'resolving the argmax' statistically
    means: every surface value within ~0.1 nat of golden AND the
    engine's argmax golden-value within the ridge's own flatness of the
    true max. The grid engine shares ONE probe set across all grid
    points, so its SLQ noise is strongly correlated along the surface —
    surface DIFFERENCES (which drive the argmax) are more accurate than
    the absolute values."""
    from gppe_tpu.models.grid_krylov import GridKrylovProfileLikelihood

    ref = _load("OptimalCovariance_WithoutPrior.pickle")
    rho_grid = np.asarray(ref["DecorrelationScale"])
    nu_grid = np.asarray(ref["nu"])
    Lp = np.asarray(ref["Lp"])

    pts = data_utils.generate_points(30, dimension=2)   # n = 900 grid
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    ii = [10, 15, 20, 25, 30]       # rho 0.133 .. 0.2 (golden argmax i=20)
    jj = [20, 40, 59]               # nu 9.1, 17.3, 25.0 (argmax j=59)
    I, J = np.meshgrid(ii, jj, indexing="ij")
    rhos = rho_grid[I.ravel()]
    nus = nu_grid[J.ravel()]

    g = GridKrylovProfileLikelihood(pts, X, z, rhos, nus,
                                    lanczos_steps=60, num_probes=32)
    results = g.fit_all()
    # the Krylov engine's profile lp follows the legacy golden's
    # convention (the (n-m)/2 log 2pi constant omitted) — direct compare
    got = np.array([r["lp"] for r in results])
    want = Lp[I.ravel(), J.ravel()]
    np.testing.assert_allclose(got, want, atol=0.15)

    # argmax: within the ridge's flatness of the golden max on this grid
    gap = want.max() - want[int(np.argmax(got))]
    assert gap <= 0.05, (gap, got, want)
