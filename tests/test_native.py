"""Native C++/OpenMP tapered-CSR builder vs pure paths."""

import numpy as np
import pytest

from gppe_tpu import native
from gppe_tpu.ops import assembly, taper
from gppe_tpu.utils import data as data_utils

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_native_csr_parity():
    pts = data_utils.generate_points(20, dimension=2)  # n=400
    scale = np.array([0.05, 0.05])
    tau = taper.estimate_kernel_threshold(400, 2, 0.02, scale, 0.5)
    K = np.asarray(assembly.dense_correlation(pts, 0.05, 0.5))
    Kd = np.where(K >= tau, K, 0.0)
    csr = taper.generate_tapered_correlation(pts, 0.05, 0.5, 0.02)
    np.testing.assert_allclose(csr.toarray(), Kd, atol=1e-12)


@pytest.mark.parametrize("nu", [1.5, 2.5])
def test_native_csr_parity_other_nus(nu):
    rng = np.random.default_rng(0)
    pts = rng.random((300, 2))
    scale = np.array([0.05, 0.05])
    tau = taper.estimate_kernel_threshold(300, 2, 0.05, scale, nu)
    K = np.asarray(assembly.dense_correlation(pts, 0.05, nu))
    Kd = np.where(K >= tau, K, 0.0)
    csr = taper.generate_tapered_correlation(pts, 0.05, nu, 0.05)
    np.testing.assert_allclose(csr.toarray(), Kd, atol=1e-12)


def test_native_3d_points():
    rng = np.random.default_rng(1)
    pts = rng.random((200, 3))
    res = native.taper_csr(pts / 0.2, 1.0, 0.5)
    assert res is not None
    values, indices, indptr = res
    assert indptr[-1] == len(values)
    # row sums symmetric-ish: matrix is symmetric by construction
    import scipy.sparse
    M = scipy.sparse.csr_matrix((values, indices, indptr), shape=(200, 200))
    asym = abs(M - M.T).max()
    assert asym < 1e-12


def test_native_general_nu_falls_back():
    rng = np.random.default_rng(2)
    pts = rng.random((100, 2))
    assert native.taper_csr(pts / 0.1, 1.0, 0.77) is None
