"""Full-template lookup-argument device check on the REAL accelerator.

XLA:CPU cannot compile lookup templates (combineInitial pathology,
docs/performance.md), so the full-template evidence for the device lookup
path runs here on TPU: a minimal lookup circuit (8-entry LUT, 6 uses) and
the standard `lookup` fixture both verify through JaxVerifier, and a fault
sweep over lookup-relevant arrays (lookup_zs / lookup_zs_next openings,
the lookup-selector constant columns, wires carrying LUT rows) must reject
per-lane. Mirrors Plonk/Lookups.hs:45-132 at the template level; the
always-on CPU suite pins `_lookup_checks` at the module boundary
(tests/test_lookup_golden.py).

Writes LOOKUP_DEVICE_r05.json at the repo root; exit 0 iff all pass.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
from plonky2_verifier_tpu.models.cache import get_fixture_proof
from plonky2_verifier_tpu.verifier_jax import JaxVerifier


def run_case(name, common, vkey, pwp):
    tpl = CircuitTemplate(common)
    v = JaxVerifier(tpl)
    base = flatten_proofs(tpl, [(vkey, pwp)] * 2)
    t0 = time.time()
    out = v(v.prepare(base))
    accept = bool(np.asarray(out["ok"]).all())
    t_first = round(time.time() - t0, 1)

    # fault sweep over the lookup-relevant array regions
    rejects = {}
    lz_off = tpl.n_const_cols + tpl.n_sigmas + tpl.num_wires + tpl.n_zs + tpl.n_pp + tpl.n_quot

    def mutate(label, arr, index):
        mut = {k: a.copy() for k, a in base.items()}
        mut[arr][index] ^= np.uint64(1)
        bad = v(v.prepare(mut))
        rejects[label] = not bool(np.asarray(bad["ok"])[0])

    for i in range(tpl.n_lookup):
        mutate(f"lookup_zs[{i}]", "openings1", (0, lz_off + i, 0))
    for i in range(tpl.n_lookup):
        mutate(f"lookup_zs_next[{i}]", "openings2", (0, tpl.n_zs + i, 0))
    # lookup-selector constant-column openings
    for i in range(tpl.n_lookup_selectors):
        mutate(
            f"lkp_sel[{i}]", "openings1", (0, tpl.n_gate_selectors + i, 0)
        )
    # a wire opening in the LUT-row region (first triple's multiplicity)
    mutate("lut_wire_mult", "openings1", (0, tpl.n_const_cols + tpl.n_sigmas + 2, 0))

    return {
        "case": name,
        "degree_bits": tpl.degree_bits,
        "num_queries": tpl.num_queries,
        "n_lookup": tpl.n_lookup,
        "n_lookup_selectors": tpl.n_lookup_selectors,
        "accept": accept,
        "first_call_s": t_first,
        "rejects": rejects,
        "pass": accept and all(rejects.values()),
    }


def main():
    cases = []
    common, vkey, pwp = get_fixture_proof(
        "lookup", table_size=8, n_lookups=6, num_query_rounds=2, proof_of_work_bits=2
    )
    cases.append(run_case("minimal_lookup", common, vkey, pwp))
    common, vkey, pwp = get_fixture_proof(
        "lookup", table_size=37, n_lookups=50, num_query_rounds=8, proof_of_work_bits=8
    )
    cases.append(run_case("standard_lookup", common, vkey, pwp))

    report = {
        "device": str(jax.devices()[0]),
        "ok": all(c["pass"] for c in cases),
        "cases": cases,
    }
    with open(os.path.join(REPO, "LOOKUP_DEVICE_r05.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
