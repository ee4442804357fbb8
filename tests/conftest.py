"""Test harness: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize registers a TPU ('axon') backend and
overrides JAX_PLATFORMS, so plain env vars are not enough — we force the
platform through jax.config after import, and set the host device count
flag before the CPU backend is first initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# the suite is XLA-compile-bound on this class of host (tiny graphs, one
# core); skipping the heavy optimization passes cuts a cold run ~35%
# without changing semantics (tests assert with tolerances)
jax.config.update("jax_disable_most_optimizations", True)

# persistent compilation cache: repeat suite runs skip most XLA compiles
# (works on the CPU backend; the tunneled TPU backend ignores it)
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

assert jax.device_count() == 8, jax.devices()
