import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is reserved for
# bench.py. XLA_FLAGS must be set before jax initializes its backends, and on
# this machine the axon TPU plugin ignores JAX_PLATFORMS, so we also force
# the platform through jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# NOTE: the gate-zoo lookup-argument module hits a pathological XLA:CPU
# compile (LLVM codegen >10 min; fine on TPU). Its device-path checks run
# via the zoo_device_check.py subprocess, spawned by
# test_gate_zoo.py::test_zoo_device_subprocess only when P2V_ZOO_DEVICE=1;
# the standing evidence is ZOO_DEVICE_r04.json (same script on real TPU).

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the per-template verifier modules are large;
# cache them across test runs.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
