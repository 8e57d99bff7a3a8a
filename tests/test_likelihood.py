"""Likelihood layer: value vs naive REML, analytic vs autodiff derivatives,
direct-vs-profile agreement (the reference's own oracle,
likelihood.py:71-94), and end-to-end training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gppe_tpu
from gppe_tpu.models import direct_likelihood as dl
from gppe_tpu.models import profile_likelihood as pl_mod
from gppe_tpu.models.mixed_correlation import MixedCorrelation
from gppe_tpu.ops import assembly
from gppe_tpu.utils import data as data_utils


def naive_reml(K, X, z, sigma, sigma0):
    """Direct numpy evaluation of the REML log-likelihood
    (formula of reference _direct_likelihood.py:75-76)."""
    n, m = X.shape
    S = sigma ** 2 * K + sigma0 ** 2 * np.eye(n)
    Sinv = np.linalg.inv(S)
    XtSinvX = X.T @ Sinv @ X
    M = Sinv - Sinv @ X @ np.linalg.solve(XtSinvX, X.T @ Sinv)
    lp = (-0.5 * (n - m) * np.log(2 * np.pi)
          - 0.5 * np.linalg.slogdet(S)[1]
          - 0.5 * np.linalg.slogdet(XtSinvX)[1]
          - 0.5 * z @ (M @ z))
    return lp


@pytest.fixture(scope="module")
def problem():
    pts = data_utils.generate_points(8, dimension=2)  # n=64
    K = np.asarray(assembly.dense_correlation(pts, 0.1, 0.5))
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, polynomial_degree=2)
    Km = MixedCorrelation(K, method="eigenvalue")
    data = dl.make_spectral_data(Km, X, z)
    return K, X, z, data


@pytest.fixture(scope="module")
def problem_identifiable():
    """Denser grid (15x15) where eta is well identified — the config of
    reference examples/maximize_likelihood_direct_method.py:28-61 at
    reduced size."""
    pts = data_utils.generate_points(15, dimension=2)  # n=225
    K = np.asarray(assembly.dense_correlation(pts, 0.1, 0.5))
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, polynomial_degree=2)
    Km = MixedCorrelation(K, method="eigenvalue")
    data = dl.make_spectral_data(Km, X, z)
    return K, X, z, data


def test_direct_loglik_matches_naive(problem):
    K, X, z, data = problem
    for sigma, sigma0 in [(0.2, 0.2), (0.05, 0.3), (1.0, 0.01)]:
        got = float(dl.log_likelihood(data, sigma, sigma0))
        want = naive_reml(K, X, z, sigma, sigma0)
        np.testing.assert_allclose(got, want, rtol=1e-8)


def test_direct_loglik_degenerate_sigma(problem):
    K, X, z, data = problem
    # sigma below tol -> S = sigma0^2 I branch (reference :50-55)
    got = float(dl.log_likelihood(data, 0.0, 0.3))
    want = naive_reml(K, X, z, 1e-300, 0.3)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_analytic_jacobian_vs_autodiff(problem):
    K, X, z, data = problem
    sigma, sigma0 = 0.17, 0.23
    # autodiff gradient wrt (sigma, sigma0)
    g = jax.grad(lambda hp: dl.log_likelihood(data, hp[0], hp[1]))(
        jnp.array([sigma, sigma0]))
    # analytic derivatives are wrt (sigma^2, sigma0^2): chain rule 2*s
    a = dl.log_likelihood_jacobian(data, sigma, sigma0)
    np.testing.assert_allclose(float(g[0]), 2 * sigma * float(a[0]),
                               rtol=1e-7)
    np.testing.assert_allclose(float(g[1]), 2 * sigma0 * float(a[1]),
                               rtol=1e-7)


def test_analytic_hessian_vs_autodiff(problem):
    K, X, z, data = problem
    sigma, sigma0 = 0.17, 0.23
    # autodiff hessian wrt theta=(sigma^2, sigma0^2)
    def lp_theta(theta):
        return dl.log_likelihood(data, jnp.sqrt(theta[0]),
                                 jnp.sqrt(theta[1]))
    H_auto = jax.hessian(lp_theta)(jnp.array([sigma ** 2, sigma0 ** 2]))
    H_ana = dl.log_likelihood_hessian(data, sigma, sigma0)
    np.testing.assert_allclose(np.asarray(H_ana), np.asarray(H_auto),
                               rtol=1e-6)


def test_profile_der1_vs_autodiff(problem):
    K, X, z, data = problem
    # dlp/deta at profiled sigma should equal autodiff of
    # lp(sigma_opt(eta_fixed), eta) wrt eta at the profiled point
    log_eta = 0.3
    eta = 10.0 ** log_eta

    def lp_of_eta(e):
        sig = pl_mod.find_optimal_sigma(data, e)
        return pl_mod.log_likelihood(data, sig, e)

    want = float(jax.grad(lp_of_eta)(jnp.asarray(eta)))
    got = float(pl_mod.log_likelihood_der1_eta(data, jnp.asarray(log_eta)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_profile_der2_vs_autodiff_at_root(problem_identifiable):
    """The reference's der2 identity holds *at the root of der1*
    (its own comment, _profile_likelihood.py:183); verify there against
    the autodiff second derivative of the profiled likelihood."""
    K, X, z, data = problem_identifiable
    res = pl_mod.find_log_likelihood_der1_zeros(data, [1e-4, 1e3])
    eta_star = res["eta"]

    def lp_of_eta(e):
        sig = pl_mod.find_optimal_sigma(data, e)
        return pl_mod.log_likelihood(data, sig, e)

    want = float(jax.grad(jax.grad(lp_of_eta))(jnp.asarray(eta_star)))
    got = float(pl_mod.log_likelihood_der2_eta(data, eta_star))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    assert got < 0  # maximum


def test_direct_profile_agreement(problem_identifiable):
    """The reference's core oracle: both methods find the same optimum."""
    K, X, z, data = problem_identifiable
    res_direct = dl.maximize_log_likelihood(data)
    res_profile = pl_mod.find_log_likelihood_der1_zeros(
        data, [1e-4, 1e3])
    assert res_direct["success"] and res_profile["success"]
    np.testing.assert_allclose(res_direct["eta"], res_profile["eta"],
                               rtol=1e-3)
    np.testing.assert_allclose(res_direct["sigma"], res_profile["sigma"],
                               rtol=1e-3)
    np.testing.assert_allclose(res_direct["sigma0"], res_profile["sigma0"],
                               rtol=1e-3)
    # noise floor recovered
    assert 0.15 < res_direct["sigma0"] < 0.25


def test_end_to_end_train():
    """End-to-end GaussianProcess.train on the reference example config
    (examples/maximize_likelihood_direct_method.py:28-61, smaller grid)."""
    pts = data_utils.generate_points(15, dimension=2)  # n=225
    noise = 0.2
    z = data_utils.generate_data(pts, noise)
    X = data_utils.generate_basis_functions(pts, polynomial_degree=2)
    K = assembly.dense_correlation(pts, 0.1, 0.5)

    gp = gppe_tpu.GaussianProcess(X, K, likelihood_method="direct")
    res = gp.train(z)
    assert res["success"]
    # the estimated noise floor should recover the injected noise level
    assert 0.1 < res["sigma0"] < 0.3

    gp2 = gppe_tpu.GaussianProcess(X, K, likelihood_method="profiled")
    res2 = gp2.train(z)
    np.testing.assert_allclose(res["eta"], res2["eta"], rtol=1e-2)
    # profile lp omits the -(n-m)/2 log 2pi constant (reference
    # _profile_likelihood.py:76-78 vs _direct_likelihood.py:75-76)
    n, m = X.shape
    lp_profile = float(pl_mod.log_likelihood(
        dl.make_spectral_data(gp2.likelihood.K_mixed, X, z),
        res2["sigma"], res2["eta"]))
    np.testing.assert_allclose(
        res["max_lp"], lp_profile - 0.5 * (n - m) * np.log(2 * np.pi),
        rtol=1e-5)


def test_optimal_sigma0_closed_form(problem):
    K, X, z, data = problem
    got = float(pl_mod.find_optimal_sigma0(data))
    # OLS residual variance with n-m divisor
    n, m = X.shape
    beta = np.linalg.lstsq(X, z, rcond=None)[0]
    resid = z - X @ beta
    want = np.sqrt(resid @ resid / (n - m))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_bounds_der1_eta(problem):
    K, X, z, data = problem
    for eta in [0.01, 1.0, 100.0]:
        ub, lb = pl_mod.compute_bounds_der1_eta(data, eta)
        val = float(pl_mod.log_likelihood_der1_eta(
            data, jnp.log10(jnp.asarray(eta))))
        assert float(lb) - 1e-9 <= val <= float(ub) + 1e-9
