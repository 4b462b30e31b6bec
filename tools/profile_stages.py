import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
from plonky2_verifier_tpu.models.fibonacci import fibonacci_fixture
from plonky2_verifier_tpu.prover.prove import prove
from plonky2_verifier_tpu.verifier_jax import JaxVerifier, sponge_rows
from plonky2_verifier_tpu.ops import field as jf
from plonky2_verifier_tpu.ops import poseidon as jp

fx = fibonacci_fixture(num_query_rounds=6)
vkey, pwp = prove(fx)
tpl = CircuitTemplate(fx.common)
arrays = flatten_proofs(tpl, [(vkey, pwp)] * 3)
v = JaxVerifier(tpl)
dev = v.prepare(arrays)
print("setup done", flush=True)


def timeit(name, fn, *args):
    t = time.time()
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t_compile = time.time() - t
    t = time.time()
    for _ in range(3):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: compile+1 {t_compile:.1f}s, steady {(time.time()-t)/3*1000:.1f}ms", flush=True)


B = 3

# raw permutation
state = jf.zeros((B, 12))
timeit("permutation", jp.permutation, state)

# transcript
data = jf.zeros((B, tpl.schedule.n_data))
timeit("transcript", v._run_transcript, data)

# oracle sponge (widest)
timeit("sponge135", lambda x: sponge_rows(x, 135), jf.zeros((B, 6, 135)))

# merkle batched
timeit(
    "merkle",
    lambda d, i, s, c: v._merkle_batched(d, i, s, c, tpl.initial_path_len),
    jf.zeros((B, 6, 4)),
    np.zeros((B, 6), dtype=np.uint32),
    jf.zeros((B, 6, tpl.initial_path_len, 4)),
    jf.zeros((B, 6, 16, 4)),
)

# levelized arithmetic gate
from plonky2_verifier_tpu.compiler.gates_jax import run_levelized

lp = v._gates_program
inputs = {
    "sel": jf.ext_zeros((B, tpl.n_gate_selectors)),
    "lkpsel": jf.ext_zeros((B, 0)),
    "const": jf.ext_zeros((B, 2)),
    "wire": jf.ext_zeros((B, 135)),
    "pi": jf.ext_zeros((B, 4)),
}
timeit("gates_merged", lambda i: run_levelized(lp, i, (B,)), inputs)

# ext division (inversion chain)
timeit("ext_div", jf.ext_div, jf.ext_constant(5, shape=(B, 6)), jf.ext_constant(7, shape=(B, 6)))

# full plonk + fri split
def plonk_only(a):
    out = v._verify(a)
    return out["eqs_ok"]

timeit("full_verify", v._verify, dev)
