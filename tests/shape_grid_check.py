"""Subprocess body for one shape-grid device point (see test_shape_grid.py).

Usage: python shape_grid_check.py CAP_HEIGHT ARITY_BITS FINAL_POLY_BITS

Builds a minimal-gate circuit (the gate set is irrelevant to the shape
axes; Constant+Noop+PublicInput keeps the constraint module tiny so the
compile is dominated by the shape-sensitive FRI/cap/transcript modules),
proves it, and runs the DEVICE verifier: accept, then four fault
injections against the same compiled executable (pow, constants cap,
fold-step siblings, final poly). The shape facts under test are the
data-derived FRI parameters (reference Types.hs:151-171, the reduction
strategy expansion Plonk/FRI.hs:337-354) on the device path.

Prints one JSON line; exit 0 iff all checks pass.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
from plonky2_verifier_tpu.gate_parser import Gate
from plonky2_verifier_tpu.models.builder import CircuitBuilder
from plonky2_verifier_tpu.prover.prove import prove
from plonky2_verifier_tpu.verifier_jax import JaxVerifier


def tiny_fixture(cap_height: int, arity_bits: int, final_poly_bits: int):
    b = CircuitBuilder(
        num_query_rounds=2,
        proof_of_work_bits=2,
        cap_height=cap_height,
        arity_bits=arity_bits,
        final_poly_bits=final_poly_bits,
    )
    b.add_row(Gate("ConstantGate", (2,)), constants=(3, 4))
    for _ in range(4):
        b.add_row(Gate("NoopGate", ()))
    b.add_row(Gate("PublicInputGate"))
    b.set_public_inputs([3])
    return b.build(name=f"grid_c{cap_height}a{arity_bits}f{final_poly_bits}")


def main():
    cap, ar, fp = (int(x) for x in sys.argv[1:4])
    t0 = time.time()
    fx = tiny_fixture(cap, ar, fp)
    vkey, pwp = prove(fx)
    tpl = CircuitTemplate(fx.common)
    v = JaxVerifier(tpl)
    base = flatten_proofs(tpl, [(vkey, pwp)] * 2)
    out = v(v.prepare(base))
    accept = bool(np.asarray(out["ok"]).all())

    rejects = {}
    # cap_w is transcript-absorbed, so its mutation rejects DETERMINISTICALLY
    # at any shape; cap_cs (constants cap, not absorbed — it is vkey data)
    # is only caught when a query round lands in the mutated entry's subtree,
    # so it is not a valid always-reject probe at cap_len >> num_queries.
    fault_arrays = ["pow_witness", "cap_w", "final_poly"]
    if tpl.steps:
        # step_sibs can be zero-size when the step cap covers the whole
        # folded tree (path_len 0); step_evals is never empty
        fault_arrays += ["step_sibs_0", "step_evals_0"]
    for name in fault_arrays:
        if base[name].size == 0:
            continue
        mutated = {k: a.copy() for k, a in base.items()}
        flat = mutated[name].reshape(-1)
        flat[0] ^= np.uint64(1)
        bad = v(v.prepare(mutated))
        rejects[name] = not bool(np.asarray(bad["ok"])[0])

    result = {
        "cap_height": cap,
        "arity_bits": ar,
        "final_poly_bits": fp,
        "degree_bits": fx.common.fri_params.degree_bits,
        "cap_len": tpl.cap_len,
        "steps": len(tpl.steps),
        "final_poly_len": tpl.final_poly_len,
        "accept": accept,
        "rejects": rejects,
        "wall_s": round(time.time() - t0, 1),
        "pass": accept and all(rejects.values()),
    }
    print(json.dumps(result), flush=True)
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
