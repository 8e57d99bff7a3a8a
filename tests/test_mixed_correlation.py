"""MixedCorrelation trace/traceinv/logdet/solve/dot vs dense numpy truth
(the role of the reference's exact 'eigenvalue' method,
mixed_correlation.py:76-79,127-136)."""

import numpy as np
import pytest

from gppe_tpu.models.mixed_correlation import MixedCorrelation
from gppe_tpu.ops import assembly
from gppe_tpu.utils import data as data_utils


@pytest.fixture(scope="module")
def K_np():
    pts = data_utils.generate_points(7, dimension=2, grid=True)  # n=49
    K = np.asarray(assembly.dense_correlation(pts, 0.1, 0.5))
    return K


@pytest.mark.parametrize("method", ["eigenvalue", "cholesky"])
def test_trace_family(K_np, method):
    Km = MixedCorrelation(K_np, method=method)
    n = K_np.shape[0]
    for eta in [0.1, 1.0, 17.3]:
        Kn = K_np + eta * np.eye(n)
        Kn_inv = np.linalg.inv(Kn)
        np.testing.assert_allclose(float(Km.trace(eta)), np.trace(Kn),
                                   rtol=1e-10)
        np.testing.assert_allclose(float(Km.trace(eta, exponent=2)),
                                   np.trace(Kn @ Kn), rtol=1e-10)
        np.testing.assert_allclose(float(Km.traceinv(eta)),
                                   np.trace(Kn_inv), rtol=1e-8)
        np.testing.assert_allclose(float(Km.traceinv(eta, exponent=2)),
                                   np.trace(Kn_inv @ Kn_inv), rtol=1e-8)
        np.testing.assert_allclose(float(Km.logdet(eta)),
                                   np.linalg.slogdet(Kn)[1], rtol=1e-9)


@pytest.mark.parametrize("method", ["eigenvalue", "cholesky"])
def test_solve(K_np, method):
    Km = MixedCorrelation(K_np, method=method)
    n = K_np.shape[0]
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, 3))
    b = rng.standard_normal(n)
    eta = 0.7
    Kn = K_np + eta * np.eye(n)
    np.testing.assert_allclose(np.asarray(Km.solve(eta, B)),
                               np.linalg.solve(Kn, B), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Km.solve(eta, b)),
                               np.linalg.solve(Kn, b), atol=1e-9)


def test_dot_powers(K_np):
    Km = MixedCorrelation(K_np, method="eigenvalue")
    n = K_np.shape[0]
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n)
    eta = 0.3
    Kn = K_np + eta * np.eye(n)
    np.testing.assert_allclose(np.asarray(Km.dot(eta, x, exponent=0)), x)
    np.testing.assert_allclose(np.asarray(Km.dot(eta, x, exponent=1)),
                               Kn @ x, atol=1e-10)
    # exponent=2 must be a true operator power (reference's version is
    # buggy here, see SURVEY.md §7)
    np.testing.assert_allclose(np.asarray(Km.dot(eta, x, exponent=2)),
                               Kn @ (Kn @ x), atol=1e-9)


def test_matrix_size(K_np):
    Km = MixedCorrelation(K_np)
    assert Km.get_matrix_size() == K_np.shape[0]
    assert Km.shape == K_np.shape
