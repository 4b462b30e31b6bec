"""Subprocess body for one fuzz-circuit device check (see
test_fuzz_circuits.py). Usage: python fuzz_device_check.py SEED

Rebuilds tests/test_fuzz_circuits._random_circuit(SEED) — a seeded random
gate mix that includes the hard gates (Poseidon, CosetInterpolation,
RandomAccess, ArithmeticExtension, PoseidonMds; Gate/Constraints.hs:40-108)
— proves it, and runs the DEVICE verifier: accept, then fault injections
(pow, an opening, a Merkle leaf) against the same compiled executable.

Prints one JSON line; exit 0 iff all checks pass.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

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
from plonky2_verifier_tpu.prover.prove import prove
from plonky2_verifier_tpu.verifier_jax import JaxVerifier


def main():
    seed = int(sys.argv[1])
    from test_fuzz_circuits import _random_circuit

    t0 = time.time()
    fx = _random_circuit(seed)
    vkey, pwp = prove(fx)
    tpl = CircuitTemplate(fx.common)
    v = JaxVerifier(tpl)
    base = flatten_proofs(tpl, [(vkey, pwp)] * 2)
    out = v(v.prepare(base))
    accept = bool(np.asarray(out["ok"]).all())

    rejects = {}
    for name in ["pow_witness", "openings1", "leaves_1"]:
        if base[name].size == 0:
            continue
        mutated = {k: a.copy() for k, a in base.items()}
        flat = mutated[name].reshape(-1)
        flat[0] ^= np.uint64(1)
        bad = v(v.prepare(mutated))
        rejects[name] = not bool(np.asarray(bad["ok"])[0])

    result = {
        "seed": seed,
        "gates": sorted({g.kind for g in fx.common.gates}),
        "luts": len(fx.common.luts),
        "degree_bits": fx.common.fri_params.degree_bits,
        "accept": accept,
        "rejects": rejects,
        "wall_s": round(time.time() - t0, 1),
        "pass": accept and all(rejects.values()),
    }
    print(json.dumps(result), flush=True)
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
