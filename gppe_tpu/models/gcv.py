"""Generalized cross-validation noise estimation.

Capability parity with the reference's GCV golden data
(reference: data/GeneralizedCrossValidation.pickle — produced by a
predecessor driver not in the tree; it stores a 500x500 K and rational
traceinv-interpolation coefficients) and with BASELINE.json config 4.

For the model z ~ N(X beta, sigma^2 K + sigma0^2 I) with the REML
projector M(eta) (reference _direct_likelihood.py:276-340), the smoother
residual is eta * M z, giving the classic Golub-Heath-Wahba functional

    V(eta) = n * z^T M^2 z / trace(M)^2,

whose minimizer estimates eta and the noise via
sigma0_hat^2 = eta * z^T M^2 z / trace(M). All pieces are the spectral
O(n m) quantities of the profile likelihood, so a full eta-sweep is one
vectorized evaluation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import root_finding
from .profile_likelihood import _eta_stats


def gcv_function(data, eta):
    """V(eta), vectorized over eta arrays; jittable."""
    lam, Xt, zt = data
    n, m = Xt.shape

    def scalar(e):
        D, Yt, B, Binv, logdet_B, Mzt = _eta_stats(data, e)
        trace_M = jnp.sum(D) - jnp.trace(Binv @ (Yt.T @ Yt))
        zM2z = Mzt @ Mzt
        return n * zM2z / trace_M ** 2

    eta = jnp.asarray(eta)
    if eta.ndim == 0:
        return scalar(eta)
    return jax.vmap(scalar)(jnp.reshape(eta, (-1,))).reshape(eta.shape)


def minimize_gcv(data, interval_eta=(1e-4, 1e3), tol=1e-8):
    """Minimize V over eta: root of dV/d(log eta) by bracket +
    Chandrupatla (autodiff derivative), with grid fallback."""
    lam, Xt, zt = data
    n, m = Xt.shape

    dV = jax.jit(jax.grad(
        lambda le: gcv_function(data, jnp.power(10.0, le))))

    lo, hi = np.log10(interval_eta[0]), np.log10(interval_eta[1])
    found, bracket, fvals = root_finding.find_interval_with_sign_change(
        lambda le: float(dV(jnp.asarray(le))), [lo, hi], 4)
    if found:
        root, _ = root_finding.chandrupatla(
            dV, jnp.asarray(bracket[0]), jnp.asarray(bracket[1]),
            f0=jnp.asarray(fvals[0]), f1=jnp.asarray(fvals[1]),
            eps_m=tol, eps_a=tol)
        eta = float(10.0 ** float(root))
    else:
        grid = np.logspace(lo, hi, 200)
        vals = np.asarray(gcv_function(data, jnp.asarray(grid)))
        eta = float(grid[np.argmin(vals)])

    D, Yt, B, Binv, logdet_B, Mzt = _eta_stats(data, jnp.asarray(eta))
    trace_M = float(jnp.sum(D) - jnp.trace(Binv @ (Yt.T @ Yt)))
    zM2z = float(Mzt @ Mzt)
    sigma0_sq = eta * zM2z / trace_M
    return {
        "eta": eta,
        "sigma0": float(np.sqrt(max(sigma0_sq, 0.0))),
        "gcv": float(gcv_function(data, jnp.asarray(eta))),
    }
