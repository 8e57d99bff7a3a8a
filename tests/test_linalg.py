"""Iterative solver building blocks: batched CG and MINRES.

MINRES is the symmetric-indefinite fallback (the role of the reference's
scipy.minres dispatch, _linear_solver.py:61-63) — the one case that needs
it here is a hard-tapered K that lost positive definiteness, making
K + eta*I indefinite for eta < |lambda_min|."""

import numpy as np
import pytest

from gppe_tpu.ops import linalg


@pytest.fixture(scope="module")
def indefinite():
    rng = np.random.default_rng(0)
    n = 120
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.concatenate([np.linspace(-2, -0.1, 30),
                          np.linspace(0.1, 5, 90)])
    A = (Q * lam) @ Q.T
    B = rng.standard_normal((n, 4))
    return A, B


def test_minres_indefinite(indefinite):
    A, B = indefinite
    X = np.asarray(linalg.minres_solve(A, B, tol=1e-12, max_iter=2000))
    np.testing.assert_allclose(X, np.linalg.solve(A, B), atol=1e-9)


def test_minres_shifted_and_vector(indefinite):
    A, B = indefinite
    n = A.shape[0]
    X = np.asarray(linalg.minres_solve(A, B, tol=1e-12, max_iter=2000,
                                       shift=0.7))
    np.testing.assert_allclose(X, np.linalg.solve(A + 0.7 * np.eye(n), B),
                               atol=1e-9)
    x = np.asarray(linalg.minres_solve(A, B[:, 0], tol=1e-12,
                                       max_iter=2000))
    np.testing.assert_allclose(x, np.linalg.solve(A, B[:, 0]), atol=1e-9)


def test_minres_matches_cg_on_spd(indefinite):
    A, B = indefinite
    n = A.shape[0]
    spd = A @ A.T + 0.5 * np.eye(n)
    X_mr = np.asarray(linalg.minres_solve(spd, B, tol=1e-12,
                                          max_iter=3000))
    X_cg = np.asarray(linalg.cg_solve(spd, B, tol=1e-12, max_iter=3000))
    np.testing.assert_allclose(X_mr, X_cg, atol=1e-7)


def test_cg_shifted(indefinite):
    A, B = indefinite
    n = A.shape[0]
    spd = A @ A.T
    X = np.asarray(linalg.cg_solve(spd, B, tol=1e-12, max_iter=3000,
                                   shift=1.3))
    np.testing.assert_allclose(X, np.linalg.solve(spd + 1.3 * np.eye(n), B),
                               atol=1e-8)
