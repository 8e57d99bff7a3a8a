"""Test configuration: run on a virtual 8-device CPU mesh with x64.

The multi-device tests emulate a TPU pod slice on CPU
(xla_force_host_platform_device_count), the standard JAX substitute for
testing sharding without real chips.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the session env points
# JAX at the tunneled TPU (axon); unit tests always run on the virtual CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu";
# override it back to CPU-only for the unit-test mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/gppe_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
