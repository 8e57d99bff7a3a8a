"""Likelihood facade dispatching direct / profiled maximization.

Mirrors the reference facade (gaussian_proc/_likelihood/likelihood.py:23-102):
builds the MixedCorrelation (default method 'eigenvalue', as the reference
hard-codes at likelihood.py:41) and dispatches ``likelihood_method`` to the
direct (sigma, sigma0) trust-region MLE or to the profile-likelihood root
find over eta with interval [1e-4, 1e3] (likelihood.py:90).

K may be dense, scipy CSR (the reference's sparse path,
mixed_correlation.py:44), or a matrix-free operator
(MaternOperator / TaperedMaternOperator / SparseOperator). Small sparse K
is densified inside MixedCorrelation for the exact spectral path; large
sparse or matrix-free K routes the maximization through the Krylov
profile-likelihood engine (one batched Lanczos factorization, O(k^2) per
eta — models.large_scale). The direct and profiled methods maximize the
*same* likelihood, so on the operator path both dispatch to the Krylov
root-find; they differ only in their optimizer, not their optimum.
"""

import jax.numpy as jnp

from . import direct_likelihood, profile_likelihood
from .mixed_correlation import MixedCorrelation


class Likelihood:

    def __init__(self, X, K, likelihood_method="direct",
                 imate_method="eigenvalue", interpolate=False,
                 interpolant_points=None, options=None,
                 lanczos_steps=80, num_probes=16, dense_threshold=4096):
        if likelihood_method not in ("direct", "profiled"):
            raise ValueError(
                f"likelihood_method must be 'direct' or 'profiled', got "
                f"{likelihood_method!r}")
        self.X = jnp.asarray(X)
        self.K = K
        self.likelihood_method = likelihood_method
        self.K_mixed = MixedCorrelation(K, method=imate_method,
                                        interpolate=interpolate,
                                        interpolant_points=interpolant_points,
                                        options=options,
                                        dense_threshold=dense_threshold)
        self._lanczos_steps = lanczos_steps
        self._num_probes = num_probes
        self._spectral = None

    @property
    def operator_mode(self):
        """True when K has no exact eigendecomposition available (large
        sparse / matrix-free): inference runs through the Krylov engine."""
        return self.K_mixed.eigenvalues is None

    def _data(self, z):
        return direct_likelihood.make_spectral_data(self.K_mixed, self.X,
                                                    jnp.asarray(z))

    def _krylov_engine(self, z):
        from .large_scale import KrylovProfileLikelihood
        return KrylovProfileLikelihood(
            self.K_mixed.K, self.X, z,
            lanczos_steps=self._lanczos_steps,
            num_probes=self._num_probes)

    def likelihood(self, z, hyperparam):
        """lp at hyperparam = (sigma, sigma0) (reference likelihood.py:55-61)."""
        if self.operator_mode:
            return self._operator_log_likelihood(z, hyperparam[0],
                                                 hyperparam[1])
        data = self._data(z)
        return float(direct_likelihood.log_likelihood(
            data, hyperparam[0], hyperparam[1]))

    def _operator_log_likelihood(self, z, sigma, sigma0):
        """REML lp on the operator path: logdet via SLQ, solves via CG —
        the role of the reference's imate-backed lp on sparse K
        (_direct_likelihood.py:31-83 with mixed_correlation solves)."""
        import numpy as np
        z = jnp.asarray(z)
        n, m = self.X.shape
        sigma = float(sigma)
        sigma0 = float(sigma0)
        if sigma < 1e-8:
            # degenerate branch (reference _direct_likelihood.py:50-55):
            # S = sigma0^2 I — ordinary least squares pieces
            X = np.asarray(self.X, dtype=np.float64)
            zh = np.asarray(z, dtype=np.float64)
            B0 = X.T @ X
            c = np.linalg.solve(B0, X.T @ zh)
            zMz = float(zh @ (zh - X @ c)) / sigma0 ** 2
            logdet_S = n * np.log(sigma0 ** 2)
            sign, logdet_B0 = np.linalg.slogdet(B0)
            logdet_XtSinvX = logdet_B0 - m * np.log(sigma0 ** 2)
        else:
            eta = (sigma0 / sigma) ** 2
            Y = self.K_mixed.solve(eta, self.X)          # Kn^-1 X  (CG)
            w = self.K_mixed.solve(eta, z)               # Kn^-1 z
            X = np.asarray(self.X, dtype=np.float64)
            Yh = np.asarray(Y, dtype=np.float64)
            zh = np.asarray(z, dtype=np.float64)
            wh = np.asarray(w, dtype=np.float64)
            B = X.T @ Yh
            B = 0.5 * (B + B.T)
            c = np.linalg.solve(B, Yh.T @ zh)
            zMz = float(zh @ wh - (Yh.T @ zh) @ c) / sigma ** 2
            logdet_Kn = float(self.K_mixed.logdet(eta))
            logdet_S = n * np.log(sigma ** 2) + logdet_Kn
            sign, logdet_B = np.linalg.slogdet(B)
            logdet_XtSinvX = logdet_B - m * np.log(sigma ** 2)
        lp = (-0.5 * (n - m) * np.log(2.0 * np.pi) - 0.5 * logdet_S
              - 0.5 * logdet_XtSinvX - 0.5 * zMz)
        return float(lp)

    def maximize_log_likelihood(self, z, plot=False, verbose=False):
        if self.operator_mode:
            # Krylov engine: same MLE for both methods (the direct and
            # profiled criteria have the same maximizer); the profile
            # root-find is the scalable optimizer.
            eng = self._krylov_engine(z)
            results = eng.fit(verbose=verbose)
            if plot:
                from ..utils import plot as plot_utils
                plot_utils.plot_likelihood_result(self, z, results)
            return results
        data = self._data(z)
        if self.likelihood_method == "direct":
            results = direct_likelihood.maximize_log_likelihood(
                data, verbose=verbose)
        elif self.likelihood_method == "profiled":
            interval_eta = [1e-4, 1e+3]
            results = profile_likelihood.find_log_likelihood_der1_zeros(
                data, interval_eta, verbose=verbose)
        else:
            raise ValueError(
                f"likelihood_method must be 'direct' or 'profiled', got "
                f"{self.likelihood_method!r}")
        if plot:
            from ..utils import plot as plot_utils
            plot_utils.plot_likelihood_result(self, z, results)
        return results
