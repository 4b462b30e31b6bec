"""Subprocess body for the gate-zoo device-path checks (see test_gate_zoo.py).

Backend is selected by P2V_ZOO_BACKEND:
- "cpu" (default): forces XLA:CPU with the workaround flag
  (--xla_backend_optimization_level=0 — the lookup-argument module's LLVM
  codegen is pathological at higher levels, docs/performance.md) in its own
  process so the flag does not leak into the rest of the suite. Even so,
  this compile historically exceeds 10 minutes on 2-core hosts.
- "tpu": uses the default accelerator — the production path. The round
  artifact ZOO_DEVICE_r04.json is this script's output on the real chip.

Prints one JSON line with all check results; exit code 0 iff all passed.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BACKEND = os.environ.get("P2V_ZOO_BACKEND", "cpu")

if BACKEND == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_backend_optimization_level" not in flags:
        flags = (flags + " --xla_backend_optimization_level=0").strip()
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=2").strip()
    os.environ["XLA_FLAGS"] = flags

import jax

if BACKEND == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
from plonky2_verifier_tpu.golden.challenges import proof_challenges
from plonky2_verifier_tpu.models.gate_zoo import gate_zoo_fixture
from plonky2_verifier_tpu.prover.prove import prove
from plonky2_verifier_tpu.verifier_jax import JaxVerifier


def main():
    t0 = time.time()
    results = {"backend": BACKEND, "device": str(jax.devices()[0])}
    fx = gate_zoo_fixture(num_query_rounds=4, proof_of_work_bits=4)
    vkey, pwp = prove(fx)
    tpl = CircuitTemplate(fx.common)
    arrays = flatten_proofs(tpl, [(vkey, pwp)] * 2)
    assert fx.common.num_lookup_polys > 0
    v = JaxVerifier(tpl, debug=True)
    dev = v.prepare(arrays)
    out = v(dev)
    ok = np.asarray(out["ok"])
    results["accepts"] = bool(ok.all())

    # transcript equality (zeta + device-derived query indices)
    ch = proof_challenges(fx.common, vkey, pwp)
    dz = out["debug"]["zeta"]
    zeta_dev = (
        (int(np.asarray(dz[0])[0]) << 32) | int(np.asarray(dz[1])[0]),
        (int(np.asarray(dz[2])[0]) << 32) | int(np.asarray(dz[3])[0]),
    )
    results["zeta_bit_exact"] = zeta_dev == ch.zeta
    qi = [int(x) for x in np.asarray(out["debug"]["query_indices"])[0]]
    results["query_indices_bit_exact"] = qi == list(ch.fri.query_indices)

    # fault injection: EVERY flattened array, lane 0 only. (NB: `arr[0]` on a
    # 1-D array is a scalar COPY, so mutate through a (B, -1) reshape and
    # write the result back in case reshape had to copy.)
    bad_keys = []
    for key in sorted(arrays.keys()):
        bad = {k: np.array(val, copy=True) for k, val in arrays.items()}
        flat = bad[key].reshape(bad[key].shape[0], -1)
        if key == "cap_cs":
            # the constants/sigmas cap is the one input never absorbed into
            # the transcript (Challenge/Verifier.hs:73-75 absorbs only the
            # circuit digest); a single mutated cap row is detected only if
            # some query's residual index lands on it, so flip every row.
            flat[0, :] ^= np.uint64(1)
        else:
            flat[0, 0] ^= np.uint64(1)
        bad[key] = flat.reshape(bad[key].shape)
        o = np.asarray(v(v.prepare(bad))["ok"])
        if o[0] or not o[1]:
            bad_keys.append(key)
    results["mutated_keys_total"] = len(arrays)
    results["fault_injection_failures"] = bad_keys

    results["pass"] = bool(
        results["accepts"]
        and results["zeta_bit_exact"]
        and results["query_indices_bit_exact"]
        and not bad_keys
    )
    results["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(results))
    sys.exit(0 if results["pass"] else 1)


if __name__ == "__main__":
    main()
