"""NUTS sampler validation: exact Gaussian target moments, agreement with
HMC on the GP hyperparameter posterior (cross-method oracle, SURVEY §4),
and the iterative tree bookkeeping's bit arithmetic."""

import jax
import jax.numpy as jnp
import numpy as np

from gppe_tpu.models import hmc, nuts, priors
from gppe_tpu.utils import data as data_utils


def test_bit_helpers():
    from gppe_tpu.models.nuts import _popcount, _trailing_ones
    for n in [0, 1, 2, 3, 6, 7, 12, 13, 255]:
        assert int(_popcount(jnp.int32(n))) == bin(n).count("1"), n
        expected = len(bin(n)) - len(bin(n).rstrip("1")) if n > 0 else 0
        assert int(_trailing_ones(jnp.int32(n))) == expected, n


def test_nuts_gaussian_moments():
    """NUTS must reproduce the moments of a known correlated Gaussian."""
    cov = jnp.asarray([[2.0, 1.2], [1.2, 1.5]])
    prec = jnp.linalg.inv(cov)
    mean = jnp.asarray([0.5, -1.0])

    def log_prob(x):
        d = x - mean
        return -0.5 * d @ (prec @ d)

    init = jnp.zeros((8, 2))
    res = nuts.nuts_sample(log_prob, init, jax.random.PRNGKey(3),
                           num_samples=1500, num_warmup=500, max_depth=8)
    samples = np.asarray(res.samples).reshape(-1, 2)
    assert float(res.divergences.sum()) == 0.0
    assert float(res.accept_rate.min()) > 0.4
    assert float(res.mean_tree_depth.mean()) >= 1.0
    np.testing.assert_allclose(samples.mean(0), np.asarray(mean), atol=0.1)
    np.testing.assert_allclose(np.cov(samples.T), np.asarray(cov), atol=0.3)


def test_nuts_matches_hmc_on_gp_posterior():
    """NUTS and HMC posterior means over (log10 eta, log10 rho) must agree
    — the sampler-level cross-method oracle."""
    pts = data_utils.generate_points(8, dimension=2)   # n = 64
    z = data_utils.generate_data(pts, 0.3)
    X = data_utils.generate_basis_functions(pts, 1)

    def log_prior(eta, rho):
        return (priors.uniform_log_prior(eta, (1e-2, 1e3))
                + priors.uniform_log_prior(rho, (0.03, 0.45)))

    kw = dict(nu=0.5, num_chains=4, num_samples=400, num_warmup=300,
              key=2, log_prior=log_prior)
    res_h = hmc.sample_posterior(pts, z, X, num_leapfrog=10, **kw)
    res_n = nuts.sample_posterior(pts, z, X, max_depth=6, **kw)
    mean_h = np.asarray(res_h.samples).reshape(-1, 2).mean(0)
    mean_n = np.asarray(res_n.samples).reshape(-1, 2).mean(0)
    np.testing.assert_allclose(mean_n, mean_h, atol=0.5)
    # NOTE: hard uniform-prior boundaries register as "divergences" (the
    # leapfrog steps into log p = -inf); those subtrees are correctly
    # discarded, so only sanity-bound the count rather than requiring 0.
    assert float(res_n.divergences.sum()) < 0.9 * 4 * 400


def test_bounded_support_sampling():
    """Sigmoid-transformed (bounded-box) sampling: no divergences, samples
    inside the box, NUTS and HMC agree."""
    pts = data_utils.generate_points(8, dimension=2)   # n = 64
    z = data_utils.generate_data(pts, 0.3)
    X = data_utils.generate_basis_functions(pts, 1)
    box = ((-2.0, 3.0), (np.log10(0.03), np.log10(0.45)))

    kw = dict(nu=0.5, num_chains=4, num_samples=300, num_warmup=300,
              key=2, support_log10=box)
    res_n = nuts.sample_posterior(pts, z, X, max_depth=6, **kw)
    res_h = hmc.sample_posterior(pts, z, X, num_leapfrog=10, **kw)
    s_n = np.asarray(res_n.samples).reshape(-1, 2)
    s_h = np.asarray(res_h.samples).reshape(-1, 2)

    assert float(res_n.divergences.sum()) == 0.0
    assert s_n[:, 0].min() >= box[0][0] and s_n[:, 0].max() <= box[0][1]
    assert s_n[:, 1].min() >= box[1][0] and s_n[:, 1].max() <= box[1][1]
    np.testing.assert_allclose(s_n.mean(0), s_h.mean(0), atol=0.3)


def test_nuts_resume_reproduces_uninterrupted_chain():
    """NUTS resume parity with hmc.resume_hmc (r4): a num_warmup=0
    restart from NUTSResult.state() continues the chain the
    uninterrupted scan would have produced (to XLA scheduling rounding).
    Also regression-pins the log_eps_bar init: the old zero init reset
    resumed runs to step size 1.0 regardless of the adapted value."""
    def log_prob(theta):
        return -0.5 * jnp.sum(theta ** 2) - 0.1 * theta[0] * theta[1]

    init = jax.random.normal(jax.random.PRNGKey(2), (4, 2))
    key = jax.random.PRNGKey(9)

    full = nuts.nuts_sample(log_prob, init, key, num_samples=30,
                            num_warmup=25, max_depth=6)
    part = nuts.nuts_sample(log_prob, init, key, num_samples=15,
                            num_warmup=25, max_depth=6)
    state = part.state()
    # resumed step size must be the ADAPTED one, not 1.0
    np.testing.assert_allclose(np.asarray(state["step_size"]),
                               np.asarray(full.step_size), rtol=1e-10)
    cont = nuts.resume_nuts(log_prob, state, num_samples=15, max_depth=6)
    np.testing.assert_allclose(np.asarray(part.samples),
                               np.asarray(full.samples[:15]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cont.samples),
                               np.asarray(full.samples[15:]),
                               rtol=1e-8, atol=1e-8)
