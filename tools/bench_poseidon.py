"""A/B throughput: jnp (ops/poseidon.py scan) vs Pallas fused kernel
(ops/pallas_poseidon.py) for the batched Poseidon-12 permutation.

Usage: python tools/bench_poseidon.py [batch ...]
Prints one JSON line per (backend, batch) with perms/s, plus a final
verdict line. Run on the real TPU (bench tier — no JAX_PLATFORMS=cpu)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.ops import field as jf
from plonky2_verifier_tpu.ops import pallas_poseidon as pp
from plonky2_verifier_tpu.ops import poseidon as jp

BATCHES = [int(x) for x in sys.argv[1:]] or [1 << 12, 1 << 15, 1 << 18, 1 << 20]
ITERS = int(os.environ.get("ITERS", "20"))
CHAIN = int(os.environ.get("CHAIN", "8"))  # sequential perms per step (sponge-like)


def bench(name, fn, state):
    # chain CHAIN permutations so the measurement isn't dispatch-bound
    @jax.jit
    def step(s):
        for _ in range(CHAIN):
            s = fn(s)
        return s

    out = step(state)
    jax.block_until_ready(out.hi)
    t0 = time.time()
    for _ in range(ITERS):
        out = step(out)
    jax.block_until_ready(out.hi)
    dt = (time.time() - t0) / (ITERS * CHAIN)
    n = state.hi.shape[0]
    return n / dt


def main():
    rng = np.random.default_rng(0)
    results = {}
    for b in BATCHES:
        arr = rng.integers(0, gf.P, size=(b, 12), dtype=np.uint64)
        state = jf.from_u64(arr)
        # correctness cross-check on a few rows
        a_j = jf.to_u64(jp.permutation(state))
        a_p = jf.to_u64(pp.permutation(state))
        assert (a_j == a_p).all(), "pallas/jnp mismatch!"
        r_j = bench("jnp", jp.permutation, state)
        r_p = bench("pallas", pp.permutation, state)
        results[b] = (r_j, r_p)
        print(json.dumps({
            "batch": b,
            "jnp_perms_per_sec": round(r_j, 1),
            "pallas_perms_per_sec": round(r_p, 1),
            "speedup": round(r_p / r_j, 3),
            "device": str(jax.devices()[0]),
        }))
    best = max(b for b in results)
    r_j, r_p = results[best]
    print(json.dumps({
        "verdict": "pallas" if r_p > r_j else "jnp",
        "best_batch": best,
        "best_speedup": round(r_p / r_j, 3),
    }))


if __name__ == "__main__":
    main()
