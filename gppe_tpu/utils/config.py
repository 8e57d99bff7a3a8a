"""Dtype and platform policy.

The reference stack runs float64 everywhere (numpy/scipy defaults). TPUs are
float32/bfloat16 machines; we default to float64 when JAX's x64 mode is on
(CPU test runs, verification) and float32 otherwise (TPU production path).
Precision-critical reductions use compensated/fp32-accumulated arithmetic in
the kernels instead of blanket fp64.
"""

import jax
import jax.numpy as jnp


def default_dtype():
    """float64 under jax x64 mode, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
