"""Priors over kernel hyperparameters.

Port of the reference's prior semantics
(reference: examples/FindOptimalCovarianceParameters.py:73-146): uniform
within bounds and the inverse-square family 1/(1+x)^2 (optionally with a
scale, as in 1/(1+nu/25)^2). Log-densities are jittable and -inf outside
support (the reference returns prior 0 -> -inf log posterior).
"""

import jax.numpy as jnp


def uniform_log_prior(x, bounds):
    """log of UniformPrior(x, bounds) (reference :73-81): 0 inside,
    -inf outside (unnormalized)."""
    lo, hi = bounds
    inside = jnp.logical_and(x >= lo, x <= hi)
    return jnp.where(inside, 0.0, -jnp.inf)


def inverse_square_log_prior(x, scale=1.0):
    """log 1/(1 + x/scale)^2 (reference :128-130, unnormalized)."""
    return -2.0 * jnp.log1p(jnp.maximum(x, 0.0) / scale) + jnp.where(
        x >= 0, 0.0, -jnp.inf)
