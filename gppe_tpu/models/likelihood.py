"""Likelihood facade dispatching direct / profiled maximization.

Mirrors the reference facade (gaussian_proc/_likelihood/likelihood.py:23-102):
builds the MixedCorrelation (default method 'eigenvalue', as the reference
hard-codes at likelihood.py:41) and dispatches ``likelihood_method`` to the
direct (sigma, sigma0) trust-region MLE or to the profile-likelihood root
find over eta with interval [1e-4, 1e3] (likelihood.py:90).
"""

import jax.numpy as jnp

from . import direct_likelihood, profile_likelihood
from .mixed_correlation import MixedCorrelation


class Likelihood:

    def __init__(self, X, K, likelihood_method="direct",
                 imate_method="eigenvalue", interpolate=False,
                 interpolant_points=None, options=None):
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
                                        options=options)
        self._spectral = None

    def _data(self, z):
        if self.K_mixed.eigenvalues is None:
            raise NotImplementedError(
                "likelihood on matrix-free/stochastic operators uses the "
                "large-scale path (gppe_tpu.models.large_scale)")
        return direct_likelihood.make_spectral_data(self.K_mixed, self.X,
                                                    jnp.asarray(z))

    def likelihood(self, z, hyperparam):
        """lp at hyperparam = (sigma, sigma0) (reference likelihood.py:55-61)."""
        data = self._data(z)
        return float(direct_likelihood.log_likelihood(
            data, hyperparam[0], hyperparam[1]))

    def maximize_log_likelihood(self, z, plot=False, verbose=False):
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
