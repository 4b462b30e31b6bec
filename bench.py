#!/usr/bin/env python3
"""Benchmark: batched Plonky2 proof verification throughput on the local
accelerator (TPU when available).

Prints ONE JSON line:
  {"metric": "proofs_per_sec_per_chip", "value": N, "unit": "proofs/s/chip",
   "vs_baseline": R, ...}

Default workload is the STANDARD proof shape (degree_bits=12, rate 1/8,
PoW 16, 28 query rounds, 135 wires, ~2,774 Poseidon perms/proof — matching
the reference cost model, commentary/FRI.md:46,250-267). Override with
BENCH_MODEL/BENCH_DEGREE_BITS/BENCH_BATCH/... env vars.

Baseline denominator: the BASELINE.json north star is >= 10k proofs/s on a
v5p-16 (8 chips) => 1250 proofs/s/chip for standard-size proofs.
vs_baseline = value / 1250.

Compile-time accounting: a persistent XLA compilation cache lives in
.jax_cache; `cache_state` reports whether this template's module was
already cached ("warm") or compiled fresh ("cold"), so compile_s swings
are attributable (the r1->r2 58s->384s swing was an uncached cold compile).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = int(os.environ.get("BENCH_BATCH", "1024"))  # 512->1024: +2.3% measured
MODEL = os.environ.get("BENCH_MODEL", "fibonacci")
# fused sponge/Merkle chain kernels are the faster validated config for the
# standard shape (BENCH_FUSED_r05.json: 5,621 @1024 / 5,630 @2048 vs 5,537
# plain; bit-exactness re-proven each round in HASH_KERNELS artifacts), so
# they are the bench default there. Gate-zoo-class shapes keep the plain
# kernel: a shape-specific Mosaic fault crashes the worker at batch >= 512
# even unfused (docs/performance.md), so stay conservative off the
# standard shape. Override with P2V_FUSED_HASH=0|1.
if MODEL == "fibonacci":
    os.environ.setdefault("P2V_FUSED_HASH", "1")
DEGREE_BITS = int(os.environ.get("BENCH_DEGREE_BITS", "12"))
QUERIES = int(os.environ.get("BENCH_QUERIES", "28"))
POW_BITS = int(os.environ.get("BENCH_POW_BITS", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
BASELINE_PER_CHIP = 1250.0
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def fixture_params():
    if MODEL == "fibonacci":
        # n rows = 1 const + n_arith + 1 public-input, padded to 2^degree_bits
        return {
            "n_arith_rows": (1 << DEGREE_BITS) - 3,
            "num_query_rounds": QUERIES,
            "proof_of_work_bits": POW_BITS,
        }
    if MODEL == "gate_zoo":
        # gate-heavy / recursion-shaped config (BASELINE configs 3-4): every
        # gate kind incl. lookups, filled with real gate rows to 2^DEGREE_BITS
        return {
            "target_degree_bits": DEGREE_BITS,
            "num_query_rounds": QUERIES,
            "proof_of_work_bits": POW_BITS,
        }
    return {"num_query_rounds": QUERIES, "proof_of_work_bits": POW_BITS}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t_setup = time.time()
    from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
    from plonky2_verifier_tpu.models.cache import get_fixture_proof
    from plonky2_verifier_tpu.verifier_jax import JaxVerifier

    common, vkey, pwp = get_fixture_proof(MODEL, **fixture_params())
    tpl = CircuitTemplate(common)
    arrays = flatten_proofs(tpl, [(vkey, pwp)] * BATCH)
    v = JaxVerifier(tpl)
    dev = v.prepare(arrays)
    setup_s = time.time() - t_setup

    cached_before = set(os.listdir(CACHE_DIR)) if os.path.isdir(CACHE_DIR) else set()

    # warmup / compile
    t_c = time.time()
    out = v(dev)
    ok = bool(jax.device_get(out["ok"]).all())
    compile_s = time.time() - t_c
    assert ok, "benchmark proof failed to verify!"

    cached_after = set(os.listdir(CACHE_DIR)) if os.path.isdir(CACHE_DIR) else set()
    cache_state = "cold" if cached_after - cached_before else "warm"

    t0 = time.time()
    for _ in range(ITERS):
        out = v(dev)
    jax.block_until_ready(out["ok"])
    dt = (time.time() - t0) / ITERS

    from plonky2_verifier_tpu.metrics import perms_per_proof

    proofs_per_sec = BATCH / dt
    perms = perms_per_proof(tpl)
    result = {
        "metric": "proofs_per_sec_per_chip",
        "value": round(proofs_per_sec, 2),
        "unit": "proofs/s/chip",
        "vs_baseline": round(proofs_per_sec / BASELINE_PER_CHIP, 4),
        "batch": BATCH,
        "model": MODEL,
        "query_rounds": tpl.num_queries,
        "degree_bits": tpl.degree_bits,
        "pow_bits": tpl.pow_bits,
        "poseidon_perms_per_proof": perms,
        "poseidon_perms_per_sec": round(proofs_per_sec * perms, 1),
        "step_ms": round(dt * 1000, 2),
        "compile_s": round(compile_s, 1),
        "cache_state": cache_state,
        "setup_s": round(setup_s, 1),
        "device": str(jax.devices()[0]),
        "all_verified": ok,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
