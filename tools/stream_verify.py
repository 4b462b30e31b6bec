"""Stream-verify N >> batch proofs with rolling metrics (BASELINE config 5
shape, single host unless P2V_DISTRIBUTED=1).

  python tools/stream_verify.py [n_proofs] [batch]

Streams `n_proofs` standard-shape proofs (cached fixture, with a deterministic
sprinkling of corrupted ones to prove the verdict path is live), prints a
rolling metrics line per batch and one final JSON line. The final
poseidon_perms_per_sec is the measured proofs/s times the analytic FRI.md
permutation count — cross-check it against tools/bench_poseidon.py's raw
kernel rate to see verifier overhead vs pure hashing."""

import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plonky2_verifier_tpu.compiler import CircuitTemplate
from plonky2_verifier_tpu.models.cache import get_fixture_proof
from plonky2_verifier_tpu.parallel.stream import StreamVerifier, init_distributed

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 512
CORRUPT_EVERY = int(os.environ.get("CORRUPT_EVERY", "1000"))
# P2V_RAW_INGEST=1: stream raw JSON byte pairs through the native C++
# ingest (GIL-free thread pool) instead of parsed dataclasses — the
# production path; ~10x the host-side throughput (tools/bench_ingest.py).
RAW = os.environ.get("P2V_RAW_INGEST") == "1"


def main():
    dist = init_distributed()
    common, vkey, pwp = get_fixture_proof(
        "fibonacci", n_arith_rows=4093, num_query_rounds=28, proof_of_work_bits=16
    )
    tpl = CircuitTemplate(common)
    bad = copy.deepcopy(pwp)
    bad.proof.opening_proof.pow_witness ^= 1

    if RAW:
        vk_b = json.dumps(vkey.to_json()).encode()
        pf_b = json.dumps(pwp.to_json()).encode()
        bad_b = json.dumps(bad.to_json()).encode()

        def stream():
            for i in range(N):
                corrupt = CORRUPT_EVERY and i % CORRUPT_EVERY == CORRUPT_EVERY - 1
                yield (vk_b, bad_b if corrupt else pf_b)

    else:

        def stream():
            for i in range(N):
                corrupt = CORRUPT_EVERY and i % CORRUPT_EVERY == CORRUPT_EVERY - 1
                yield (vkey, bad if corrupt else pwp)

    sv = StreamVerifier(tpl, BATCH, raw_json=RAW)

    def progress(m):
        line = m.snapshot()
        line["rolling_proofs_per_sec"] = round(m.rolling_rate(), 1)
        print(json.dumps(line), flush=True)

    m = sv.run(stream(), on_batch=progress)
    final = m.snapshot()
    final["expected_rejected"] = N // CORRUPT_EVERY if CORRUPT_EVERY else 0
    final["distributed"] = dist
    final["raw_ingest"] = RAW
    final["device"] = str(jax.devices()[0])
    print(json.dumps(final))
    assert final["rejected"] == final["expected_rejected"], "verdict path miscounted!"


if __name__ == "__main__":
    main()
