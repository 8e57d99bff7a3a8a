"""HMC sampler validation: exact Gaussian target, then GP posterior mode
vs MLE (the cross-method oracle of SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gppe_tpu.models import hmc, kernel_posterior, priors
from gppe_tpu.models import direct_likelihood as dl
from gppe_tpu.models import profile_likelihood as pl_mod
from gppe_tpu.models.mixed_correlation import MixedCorrelation
from gppe_tpu.ops import assembly
from gppe_tpu.utils import data as data_utils


def test_hmc_gaussian_moments():
    """Sampler must reproduce the moments of a known 2-D Gaussian."""
    cov = jnp.asarray([[1.0, 0.6], [0.6, 2.0]])
    prec = jnp.linalg.inv(cov)
    mean = jnp.asarray([1.0, -2.0])

    def log_prob(x):
        d = x - mean
        return -0.5 * d @ (prec @ d)

    init = jnp.zeros((8, 2))
    res = hmc.hmc_sample(log_prob, init, jax.random.PRNGKey(0),
                         num_samples=1500, num_warmup=500,
                         num_leapfrog=12)
    samples = np.asarray(res.samples).reshape(-1, 2)
    assert res.accept_rate.min() > 0.5
    np.testing.assert_allclose(samples.mean(0), np.asarray(mean), atol=0.1)
    emp_cov = np.cov(samples.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.3)


@pytest.fixture(scope="module")
def gp_problem():
    pts = data_utils.generate_points(10, dimension=2)  # n=100
    z = data_utils.generate_data(pts, 0.3)
    X = data_utils.generate_basis_functions(pts, 1)
    return pts, z, X


def test_profile_loglik_pipeline_matches_spectral(gp_problem):
    """The fused cholesky profile lp must equal the spectral-path profile
    lp at the profiled sigma (up to the (n-m)/2 constant convention)."""
    pts, z, X = gp_problem
    n, m = X.shape
    lp_fn = kernel_posterior.make_profile_loglik(pts, z, X, nu=0.5)

    K = np.asarray(assembly.dense_correlation(pts, 0.1, 0.5))
    Km = MixedCorrelation(K)
    data = dl.make_spectral_data(Km, X, z)
    for log_eta in [-1.0, 0.5, 1.5]:
        eta = 10.0 ** log_eta
        sig = float(pl_mod.find_optimal_sigma(data, eta))
        want = float(pl_mod.log_likelihood(data, sig, eta))
        got = float(lp_fn(jnp.asarray(log_eta), jnp.asarray(np.log10(0.1))))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_profile_loglik_grad_finite(gp_problem):
    pts, z, X = gp_problem
    lp_fn = kernel_posterior.make_profile_loglik(pts, z, X, nu=0.5)
    g = jax.grad(lambda th: lp_fn(th[0], th[1]))(jnp.asarray([0.5, -1.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check
    th0 = np.asarray([0.5, -1.0])
    h = 1e-5
    for i in range(2):
        e = np.zeros(2)
        e[i] = h
        fd = (float(lp_fn(*(th0 + e))) - float(lp_fn(*(th0 - e)))) / (2 * h)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-4, atol=1e-4)


def test_gp_posterior_mode_near_mle(gp_problem):
    """Posterior samples of (log10 eta, log10 rho), with the bounded
    priors the reference's own outer loop uses
    (FindOptimalCovarianceParameters.py:119-130), should concentrate near
    the grid MAP."""
    pts, z, X = gp_problem

    def log_prior(eta, rho):
        return (priors.uniform_log_prior(eta, (1e-2, 1e3))
                + priors.uniform_log_prior(rho, (0.03, 0.45)))

    res = hmc.sample_posterior(pts, z, X, nu=0.5, num_chains=4,
                               num_samples=300, num_warmup=300,
                               num_leapfrog=10, key=1,
                               log_prior=log_prior)
    samples = np.asarray(res.samples).reshape(-1, 2)
    assert res.accept_rate.mean() > 0.4
    post_mean = samples.mean(0)

    # grid MAP over the prior support (same parameterization + Jacobian)
    from gppe_tpu.models.kernel_posterior import make_log_posterior
    log_post = make_log_posterior(pts, z, X, nu=0.5, log_prior=log_prior)
    g_eta = np.linspace(-2, 3, 40)
    g_rho = np.linspace(np.log10(0.03), np.log10(0.45), 40)
    vals = np.asarray(jax.vmap(lambda a: jax.vmap(
        lambda b: log_post(jnp.asarray([a, b])))(jnp.asarray(g_rho)))(
        jnp.asarray(g_eta)))
    i, j = np.unravel_index(np.argmax(vals), vals.shape)
    assert abs(post_mean[0] - g_eta[i]) < 1.0
    assert abs(post_mean[1] - g_rho[j]) < 0.5


def test_priors():
    assert float(priors.uniform_log_prior(0.5, (0.0, 1.0))) == 0.0
    assert np.isneginf(float(priors.uniform_log_prior(1.5, (0.0, 1.0))))
    np.testing.assert_allclose(
        float(priors.inverse_square_log_prior(1.0, scale=1.0)),
        np.log(1.0 / 4.0))


def test_hmc_resume_reproduces_uninterrupted_chain(tmp_path):
    """VERDICT r1 item 7: checkpoint (theta, key, step_size, inv_mass) and
    resume. Adaptation freezes after warmup, so the resumed chain
    reproduces the uninterrupted one exactly up to XLA scheduling
    rounding: the two programs differ only in scan LENGTH, and with the
    r4 fused-half-kick leapfrog XLA may fuse the trajectory prologue
    differently per program — same arithmetic, last-ulp freedom (f64
    drift ~1e-13 over 20 steps). Semantic exactness (same accept
    decisions, same adapted state) is the guarantee."""
    from gppe_tpu.utils import checkpoint

    def log_prob(theta):
        return -0.5 * jnp.sum(theta ** 2) - 0.1 * theta[0] * theta[1]

    chains, dim = 4, 2
    init = jax.random.normal(jax.random.PRNGKey(1), (chains, dim))
    key = jax.random.PRNGKey(7)

    full = hmc.hmc_sample(log_prob, init, key, num_samples=40,
                          num_warmup=30, num_leapfrog=8)
    part = hmc.hmc_sample(log_prob, init, key, num_samples=20,
                          num_warmup=30, num_leapfrog=8)
    # round-trip the state through the pickle checkpoint
    path = str(tmp_path / "hmc_state.pickle")
    checkpoint.save_hmc_state(part, path)
    state = checkpoint.load_hmc_state(path)
    cont = hmc.resume_hmc(log_prob, state, num_samples=20, num_leapfrog=8)

    np.testing.assert_allclose(np.asarray(part.samples),
                               np.asarray(full.samples[:20]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cont.samples),
                               np.asarray(full.samples[20:]),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cont.final_theta),
                               np.asarray(full.final_theta),
                               rtol=1e-10, atol=1e-10)


def test_sample_posterior_resume_state(gp_problem):
    """resume_state through the public sample_posterior surface (bounded
    support path): continued samples equal the uninterrupted tail."""
    pts, z, X = gp_problem
    box = ((-2.0, 3.0), (-2.0, 0.0))
    kw = dict(nu=0.5, num_chains=2, num_leapfrog=4, key=3,
              support_log10=box)
    full = hmc.sample_posterior(pts, z, X, num_samples=12, num_warmup=10,
                                **kw)
    part = hmc.sample_posterior(pts, z, X, num_samples=6, num_warmup=10,
                                **kw)
    cont = hmc.sample_posterior(pts, z, X, num_samples=6,
                                resume_state=part.state(), **kw)
    np.testing.assert_allclose(np.asarray(cont.samples),
                               np.asarray(full.samples[6:]), atol=1e-12)


def test_hmc_chunked_matches_unchunked_statistics():
    """chunk_steps splits the scan into short device programs with the
    FULL adaptation state (dual averaging, Welford, global index)
    carried across — warmup must continue seamlessly across chunk
    boundaries and the sampled posterior must match the single-program
    run statistically."""
    def log_prob(theta):
        return -0.5 * jnp.sum((theta - 1.5) ** 2)

    init = jax.random.normal(jax.random.PRNGKey(3), (8, 2))
    key = jax.random.PRNGKey(11)
    kw = dict(num_samples=200, num_warmup=60, num_leapfrog=8)

    full = hmc.hmc_sample(log_prob, init, key, **kw)
    chunked = hmc.hmc_sample(log_prob, init, key, chunk_steps=35, **kw)

    assert chunked.samples.shape == full.samples.shape
    for res in (full, chunked):
        assert np.all(np.isfinite(np.asarray(res.samples)))
        assert float(np.mean(np.asarray(res.accept_rate))) > 0.5
        assert np.all(np.asarray(res.step_size) > 0)
    # both estimate the N(1.5, 1) target within MC error
    for res in (full, chunked):
        s = np.asarray(res.samples).reshape(-1, 2)
        np.testing.assert_allclose(s.mean(0), 1.5, atol=0.15)
        np.testing.assert_allclose(s.std(0), 1.0, atol=0.2)
    # adapted state agrees between the two runs (same target, same
    # warmup trajectory up to program-boundary rounding)
    np.testing.assert_allclose(np.asarray(chunked.inv_mass),
                               np.asarray(full.inv_mass), rtol=0.2)
