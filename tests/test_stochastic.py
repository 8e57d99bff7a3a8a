"""SLQ / Hutchinson / interpolation vs exact spectral truth
(the reference's implicit oracle: stochastic methods agree with the
eigenvalue method within Monte-Carlo error)."""

import numpy as np
import pytest

from gppe_tpu.models.mixed_correlation import MixedCorrelation
from gppe_tpu.ops import assembly, stochastic
from gppe_tpu.utils import data as data_utils


@pytest.fixture(scope="module")
def K_np():
    pts = data_utils.generate_points(20, dimension=2)  # n=400
    return np.asarray(assembly.dense_correlation(pts, 0.1, 0.5))


@pytest.fixture(scope="module")
def engine(K_np):
    import jax.numpy as jnp
    return stochastic.StochasticTraceEngine(
        jnp.asarray(K_np), num_probes=24, lanczos_steps=60, key=0)


def exact(K, eta, f):
    lam = np.linalg.eigvalsh(K)
    return f(lam + eta).sum()


def test_slq_logdet(K_np, engine):
    for eta in [0.01, 0.1, 1.0, 10.0]:
        got = engine.logdet(eta)
        want = exact(K_np, eta, np.log)
        assert abs(got - want) / abs(want) < 0.06, (eta, got, want)


def test_slq_traceinv(K_np, engine):
    for eta in [0.01, 0.1, 1.0, 10.0]:
        got = engine.traceinv(eta)
        want = exact(K_np, eta, lambda x: 1.0 / x)
        assert abs(got - want) / abs(want) < 0.06, (eta, got, want)


def test_slq_traceinv_squared(K_np, engine):
    eta = 0.5
    got = engine.traceinv(eta, exponent=2)
    want = exact(K_np, eta, lambda x: x ** -2.0)
    assert abs(got - want) / abs(want) < 0.05


def test_slq_affine_amortization(K_np, engine):
    """One engine (one Lanczos pass) must serve many etas — the
    AffineMatrixFunction property."""
    etas = np.logspace(-2, 2, 9)
    n = K_np.shape[0]
    for eta in etas:
        got = engine.logdet(eta)
        want = exact(K_np, eta, np.log)
        # MC error scales with n; logdet itself crosses zero on this range
        assert abs(got - want) / n < 0.03


def test_hutchinson_traceinv(K_np):
    import jax.numpy as jnp
    eta = 0.5
    got = stochastic.hutchinson_traceinv(jnp.asarray(K_np), eta,
                                         num_probes=100, key=1)
    want = exact(K_np, eta, lambda x: 1.0 / x)
    assert abs(got - want) / abs(want) < 0.05


def test_lanczos_quadrature_exact_per_probe():
    """For k = n, the Gauss rule reproduces each probe's quadratic form
    v^T f(K) v exactly (the trace estimate itself keeps Hutchinson MC
    error — that is tested separately)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    A = rng.standard_normal((30, 30))
    K = A @ A.T / 30 + np.eye(30)
    eng = stochastic.StochasticTraceEngine(jnp.asarray(K), num_probes=8,
                                           lanczos_steps=30, key=0)
    eta = 0.3
    lam, U = np.linalg.eigh(K)
    logKn = U @ np.diag(np.log(lam + eta)) @ U.T
    V = np.asarray(eng.probes)
    for i in range(V.shape[1]):
        v = V[:, i] / np.linalg.norm(V[:, i])
        want_i = v @ (logKn @ v)
        got_i = (eng.tau[i] * np.log(eng.theta[i] + eta)).sum()
        np.testing.assert_allclose(got_i, want_i, rtol=1e-6)


def test_mixed_correlation_slq_backend(K_np):
    Km = MixedCorrelation(K_np, method="slq",
                          options={"num_probes": 24, "lanczos_steps": 60})
    lam = np.linalg.eigvalsh(K_np)
    eta = 1.0
    got = float(Km.logdet(eta))
    want = np.log(lam + eta).sum()
    assert abs(got - want) / abs(want) < 0.06
    got = float(Km.traceinv(eta))
    want = (1 / (lam + eta)).sum()
    assert abs(got - want) / abs(want) < 0.06
    # solve via CG against dense truth
    rng = np.random.default_rng(2)
    b = rng.standard_normal(K_np.shape[0])
    x = np.asarray(Km.solve(eta, b))
    np.testing.assert_allclose(x, np.linalg.solve(
        K_np + eta * np.eye(len(b)), b), atol=1e-4)


def test_traceinv_interpolation(K_np):
    Km = MixedCorrelation(K_np, method="eigenvalue", interpolate=True,
                          interpolant_points=np.logspace(-4, 3, 9))
    lam = np.linalg.eigvalsh(K_np)
    for eta in [3e-4, 0.02, 0.7, 5.0, 300.0]:
        got = float(Km.traceinv(eta))
        want = (1 / (lam + eta)).sum()
        assert abs(got - want) / abs(want) < 5e-3, (eta, got, want)
    # exact at the interpolant points themselves (collocation)
    for eta in [1e-4, 1e3]:
        got = float(Km.traceinv(eta))
        want = (1 / (lam + eta)).sum()
        assert abs(got - want) / abs(want) < 1e-4
