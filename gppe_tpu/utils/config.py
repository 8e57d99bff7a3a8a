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
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def compute_dtype():
    """Dtype for the heavy device math (assembly, eigh, matvecs, Lanczos).

    TPUs are float32 machines (f64 is pathologically slow emulation —
    measured: f64 eigh effectively hangs); CPUs use the x64 policy.
    """
    return jnp.float32 if is_tpu() else default_dtype()


def inference_dtype():
    """Dtype for the O(n m) likelihood scalars and optimizer loops.

    The profile-likelihood derivative resolves ~1e-6 relative differences
    of O(n) sums; float32 visibly distorts the optimum (verified on TPU:
    eta* 637 vs 87). Requires jax x64 mode for float64.
    """
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def host_device():
    """The CPU device scalars run on when the accelerator can't do f64.

    On TPU sessions the axon plugin registers platforms "axon,cpu", so a
    CPU device is always available for the tiny sequential optimizer math.
    """
    try:
        return jax.devices("cpu")[0]
    except Exception:
        return jax.devices()[0]


def inference_device():
    """Where likelihood scalars run: host CPU on TPU sessions (f64 there
    is native), the default device otherwise."""
    return host_device() if is_tpu() else jax.devices()[0]


def _cache_dir_for_backend(base="/tmp/gppe_jax_cache"):
    """Per-backend cache directory. CPU entries are AOT-compiled against
    the build machine's exact feature set and can hang/SIGILL when a
    TPU-session process (which also registers the cpu platform)
    deserializes them — keep the platforms in separate directories."""
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    return f"{base}_{backend}"


def ensure_inference_precision():
    """Enable jax x64 mode if it is off.

    The inference scalars REQUIRE float64 (see inference_dtype); on TPU
    sessions where the user skipped setup(), f32 scalars silently push the
    profile-likelihood root to a spurious boundary optimum (verified:
    eta* = inf instead of 16.2 at n = 400). Called from the likelihood
    entry points so the public API is correct without any setup. Heavy
    device math is unaffected (compute_dtype() stays f32 on TPU).
    """
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    # the tunneled TPU's remote compiles cost minutes; make sure they are
    # cached even when the user never called setup()
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          _cache_dir_for_backend())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def setup(cache_dir=None):
    """Production entrypoint setup: enable x64 (heavy math stays f32 via
    compute_dtype()) and the persistent compilation cache (the tunneled
    TPU's remote compile costs minutes per new graph — caching is
    essential). ``cache_dir`` defaults to a per-backend directory (see
    _cache_dir_for_backend)."""
    jax.config.update("jax_enable_x64", True)
    if cache_dir is None:
        cache_dir = _cache_dir_for_backend()
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# Backwards-compatible alias
setup_x64 = setup
