import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is reserved for
# bench.py. XLA_FLAGS must be set before jax initializes its backends, and on
# this machine the axon TPU plugin ignores JAX_PLATFORMS, so we also force
# the platform through jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
