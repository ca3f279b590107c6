import os

# Tests run on a virtual 8-device CPU mesh in double precision; TPU runs are
# exercised by bench.py / __graft_entry__.py.
#
# NOTE: this environment's sitecustomize imports jax and registers the
# 'axon' TPU backend at interpreter startup, so JAX_PLATFORMS env tweaks are
# too late — we must switch platform via jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The suite is compile-dominated (single-CPU box): persist compiled
# executables across runs.  First run pays the compiles; reruns load
# from .jax_cache/ (gitignored) and finish several times faster.
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
