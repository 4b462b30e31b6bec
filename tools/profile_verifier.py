import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
t0 = time.time()
from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
from plonky2_verifier_tpu.models.fibonacci import fibonacci_fixture
from plonky2_verifier_tpu.prover.prove import prove
from plonky2_verifier_tpu.verifier_jax import JaxVerifier

fx = fibonacci_fixture(num_query_rounds=6)
vkey, pwp = prove(fx)
print("prove", time.time() - t0, flush=True)
t = time.time()
tpl = CircuitTemplate(fx.common)
arrays = flatten_proofs(tpl, [(vkey, pwp)] * 3)
print("flatten", time.time() - t, flush=True)
t = time.time()
v = JaxVerifier(tpl, debug=False)
print("build", time.time() - t, flush=True)
t = time.time()
dev = v.prepare(arrays)
print("prepare", time.time() - t, flush=True)
t = time.time()
traced = jax.jit(v._verify).trace(dev)
print("trace", time.time() - t, flush=True)
t = time.time()
lowered = traced.lower()
print("lower", time.time() - t, flush=True)
t = time.time()
compiled = lowered.compile()
print("compile", time.time() - t, flush=True)
t = time.time()
out = compiled(dev)
import numpy as np

print("run", time.time() - t, np.asarray(out["ok"]), flush=True)
