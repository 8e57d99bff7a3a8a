"""Stochastic trace estimation: batched Lanczos / SLQ and Hutchinson.

TPU-native replacement for the reference's external imate backend
(reference: gaussian_proc/_mixed_correlation/mixed_correlation.py:17,44,
138-143,193-209,263-268 — imate.trace/traceinv/logdet with methods
'hutchinson'/'slq' and imate.AffineMatrixFunction). Design:

* Probe vectors are a *batch axis*: Lanczos runs vmapped over probes, so
  all probe tridiagonalizations execute as one batched XLA program whose
  matvecs are (n, p) matmuls on the MXU rather than p sequential (n,)
  matvecs. On a mesh, the probe axis shards (see gppe_tpu.parallel).
* The affine-family amortization (imate.AffineMatrixFunction's trick):
  Lanczos tridiagonalizes K *once*; for any eta, f(K + eta I) uses the
  same Ritz pairs with shifted nodes theta + eta. Every trace quantity at
  every optimizer iterate reuses one Krylov factorization.
* Ritz values/weights are promoted to float64 on the host: the quadrature
  sums are tiny (p x k) and precision-critical, while the O(n k p) Lanczos
  matvecs stay in the accelerator compute dtype.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import compute_dtype, inference_dtype


def _as_matvec(K):
    if callable(K):
        return K
    if hasattr(K, "matmat"):
        return lambda V: K.matmat(V)
    return lambda V: jnp.matmul(K, V, precision="highest")


@partial(jax.jit, static_argnames=("matvec", "num_steps", "reorthogonalize"))
def lanczos(matvec, V0, num_steps, reorthogonalize=True):
    """Batched Lanczos tridiagonalization.

    ``V0``: (n, p) starting block (columns are independent runs).
    Returns (alphas (p, k), betas (p, k-1), V (k, n, p)) with V the
    orthonormal Lanczos bases (needed for solve-reuse; slice [:0] if not).

    Full reorthogonalization (Gram-Schmidt against all previous vectors,
    batched as (k, n, p) tensor contractions) is on by default — in f32 on
    TPU, loss of orthogonality otherwise corrupts the Ritz spectrum.
    """
    n, p = V0.shape
    dtype = V0.dtype
    k = num_steps

    nrm0 = jnp.linalg.norm(V0, axis=0)
    q = V0 / nrm0
    V = jnp.zeros((k, n, p), dtype=dtype)
    V = V.at[0].set(q)
    alphas = jnp.zeros((p, k), dtype=dtype)
    betas = jnp.zeros((p, k - 1), dtype=dtype)

    def body(j, carry):
        V, alphas, betas, q, q_prev, beta_prev = carry
        w = matvec(q)                                   # (n, p)
        alpha = jnp.sum(q * w, axis=0)                  # (p,)
        w = w - alpha[None, :] * q - beta_prev[None, :] * q_prev
        if reorthogonalize:
            # w -= V_i (V_i . w) for all i <= j (masked): einsum over k
            mask = (jnp.arange(k) <= j).astype(dtype)   # (k,)
            coeffs = jnp.einsum("inp,np->ip", V, w) * mask[:, None]
            w = w - jnp.einsum("inp,ip->np", V, coeffs)
        beta = jnp.linalg.norm(w, axis=0)
        beta_safe = jnp.where(beta > 0, beta, 1.0)
        q_next = w / beta_safe
        V = V.at[j + 1].set(jnp.where(j + 1 < k, q_next, V[j + 1]))
        alphas = alphas.at[:, j].set(alpha)
        betas = jax.lax.cond(
            j < k - 1, lambda b: b.at[:, j].set(beta), lambda b: b, betas)
        return (V, alphas, betas, q_next, q, beta)

    init = (V, alphas, betas, q, jnp.zeros_like(q), jnp.zeros(p, dtype=dtype))
    V, alphas, betas, q, q_prev, beta_prev = jax.lax.fori_loop(
        0, k, body, init)
    return alphas, betas, V


def ritz_decompose(alphas, betas):
    """Ritz values and SLQ weights from batched tridiagonal coefficients.

    Returns (theta (p, k), tau (p, k)) with tau the squared first
    components of T's eigenvectors — the Gauss quadrature weights of the
    Lanczos rule. Computed in float64 on host (tiny k x k problems).
    """
    a = np.asarray(alphas, dtype=np.float64)
    b = np.asarray(betas, dtype=np.float64)
    p, k = a.shape
    theta = np.empty((p, k))
    tau = np.empty((p, k))
    for i in range(p):
        T = np.diag(a[i]) + np.diag(b[i], 1) + np.diag(b[i], -1)
        w, U = np.linalg.eigh(T)
        theta[i] = w
        tau[i] = U[0, :] ** 2
    return theta, tau


class StochasticTraceEngine:
    """One Lanczos pass over K; every eta and every f() amortized.

    The TPU-native realization of imate.AffineMatrixFunction + SLQ
    (reference mixed_correlation.py:44,138-143,204-209,263-268).
    """

    def __init__(self, K, num_probes=16, lanczos_steps=64, key=0,
                 reorthogonalize=True, probes=None, dtype=None):
        self.matvec = _as_matvec(K)
        self.n = K.shape[0]
        self.num_probes = num_probes
        self.lanczos_steps = min(lanczos_steps, self.n)
        dtype = dtype or compute_dtype()

        if probes is None:
            probes = jax.random.rademacher(
                jax.random.PRNGKey(key), (self.n, num_probes), dtype=dtype)
        self.probes = probes

        alphas, betas, _V = lanczos(self.matvec, probes, self.lanczos_steps,
                                    reorthogonalize=reorthogonalize)
        theta, tau = ritz_decompose(alphas, betas)
        # clip tiny negative Ritz values from f32 roundoff: K is PSD
        self.theta = np.maximum(theta, 0.0)
        self.tau = tau
        self._dt = inference_dtype()

    def _quad(self, f, eta):
        """n * mean_probes sum_j tau_j f(theta_j + eta)."""
        theta = self.theta + float(eta)
        vals = (self.tau * f(theta)).sum(axis=1)
        return float(self.n * vals.mean())

    def logdet(self, eta):
        return self._quad(lambda t: np.log(np.maximum(t, 1e-300)), eta)

    def traceinv(self, eta, exponent=1):
        return self._quad(lambda t: np.maximum(t, 1e-300) ** (-exponent), eta)

    def trace_pow(self, eta, exponent=1):
        return self._quad(lambda t: t ** exponent, eta)


def hutchinson_traceinv(K, eta, num_probes=32, key=0, tol=1e-6,
                        max_iter=1000, exponent=1):
    """Hutchinson estimator of trace((K+eta I)^-p) via batched CG solves
    (the role of imate's 'hutchinson' method,
    reference mixed_correlation.py:193-202). All probes solve
    simultaneously as one multi-RHS CG on the MXU.
    """
    from . import linalg
    n = K.shape[0]
    dtype = compute_dtype()
    V = jax.random.rademacher(jax.random.PRNGKey(key), (n, num_probes),
                              dtype=dtype)
    eta = jnp.asarray(eta, dtype=dtype)
    A = K.matmat if hasattr(K, "matmat") else jnp.asarray(K, dtype=dtype)
    X = linalg.cg_solve(A, V, tol=tol, max_iter=max_iter, shift=eta)
    if exponent == 2:
        X = linalg.cg_solve(A, X, tol=tol, max_iter=max_iter, shift=eta)
    elif exponent != 1:
        raise ValueError("exponent must be 1 or 2")
    est = jnp.sum(V * X, axis=0)
    return float(jnp.mean(est))
