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
