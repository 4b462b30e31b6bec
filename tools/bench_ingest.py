"""A/B the host proof-ingest paths: JSON bytes -> flattened uint64 arrays.

  python tools/bench_ingest.py [n_proofs]

Paths compared on the standard proof shape (degree 2^12, 28 queries):
- python: json.loads -> types.from_json -> compiler.flatten.flatten_proofs
- native: plonky2_verifier_tpu.native (C++ parser, GIL-free) x 1 thread
- native x N threads (N = host cores)

Prints one JSON line. Context: one v5e chip verifies ~5,400 proofs/s
(docs/performance.md), so the python path (~150 proofs/s/core) starves the
device ~36x; the native path is the production ingest tier.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def main():
    from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
    from plonky2_verifier_tpu.models.cache import get_fixture_proof
    from plonky2_verifier_tpu.native import flatten_proof_jsons, get_fastload
    from plonky2_verifier_tpu.types import ProofWithPublicInputs, VerifierOnlyCircuitData

    common, vkey, pwp = get_fixture_proof(
        "fibonacci", n_arith_rows=4093, num_query_rounds=28, proof_of_work_bits=16
    )
    tpl = CircuitTemplate(common)
    vk_b = json.dumps(vkey.to_json()).encode()
    pf_b = json.dumps(pwp.to_json()).encode()
    pairs = [(vk_b, pf_b)] * N

    t0 = time.time()
    objs = [
        (VerifierOnlyCircuitData.from_json(json.loads(vk)), ProofWithPublicInputs.from_json(json.loads(pf)))
        for vk, pf in pairs
    ]
    ref = flatten_proofs(tpl, objs)
    t_py = time.time() - t0

    results = {"n": N, "proof_json_mb": round(len(pf_b) / 1e6, 2)}
    results["python_ms_per_proof"] = round(t_py / N * 1000, 2)

    if get_fastload() is None:
        results["native"] = "unavailable (no toolchain)"
        print(json.dumps(results))
        return

    t0 = time.time()
    got = flatten_proof_jsons(tpl, pairs, workers=0)
    t_n1 = time.time() - t0
    for k in ref:
        assert (got[k] == ref[k]).all(), k

    cores = os.cpu_count() or 1
    t0 = time.time()
    got = flatten_proof_jsons(tpl, pairs, workers=cores)
    t_nk = time.time() - t0
    for k in ref:
        assert (got[k] == ref[k]).all(), k

    results.update(
        native_ms_per_proof=round(t_n1 / N * 1000, 2),
        native_threads=cores,
        native_mt_ms_per_proof=round(t_nk / N * 1000, 2),
        speedup_1t=round(t_py / t_n1, 1),
        speedup_mt=round(t_py / t_nk, 1),
        python_proofs_per_sec=round(N / t_py, 1),
        native_mt_proofs_per_sec=round(N / t_nk, 1),
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
