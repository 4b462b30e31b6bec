"""CLI driver: the reference's end-to-end entry point, TPU-native.

Mirrors `src/testmain.hs:24-63` — read `{prefix}_common.json`,
`{prefix}_vkey.json`, `{prefix}_proof.json`, print the public-input hash,
opening-set sizes, per-stage booleans, and the verdict — with a batch/device
dimension the reference doesn't have, plus a fixture generator standing in
for the reference's gitignored `json/` corpus (SURVEY §4).

    python -m plonky2_verifier_tpu verify PREFIX [--backend jax|golden]
        [--batch N] [--quiet]
    python -m plonky2_verifier_tpu fixture MODEL OUT_PREFIX
        [--queries N] [--pow-bits N] [--degree-bits N]

Exit code 0 iff every proof verifies.
"""

from __future__ import annotations

import argparse
import sys
import time


def _cmd_verify(args) -> int:
    from .types import load_common, load_proof, load_vkey

    common = load_common(f"{args.prefix}_common.json")
    vkey = load_vkey(f"{args.prefix}_vkey.json")
    pwp = load_proof(f"{args.prefix}_proof.json")

    if not args.quiet:  # the testmain.hs:40-52 diagnostics
        from .golden.hashing import sponge

        o = pwp.proof.openings
        print(f"gates: {[str(g) for g in common.gates]}")
        print(f"public inputs: {pwp.public_inputs}")
        print(f"PI hash: {list(sponge(pwp.public_inputs))}")
        for name in (
            "constants", "plonk_sigmas", "wires", "plonk_zs", "plonk_zs_next",
            "partial_products", "quotient_polys", "lookup_zs", "lookup_zs_next",
        ):
            print(f"openings.{name}: {len(getattr(o, name))}")

    if args.backend == "golden":
        from .golden.challenges import proof_challenges
        from .golden.fri import check_fri_proof
        from .golden.plonk import check_combined_plonk_equations

        t0 = time.time()
        ch = proof_challenges(common, vkey, pwp)
        eqs = check_combined_plonk_equations(common, pwp, ch)
        fri_ok = check_fri_proof(common, vkey, pwp.proof, ch)
        ok = all(eqs) and fri_ok
        if not args.quiet:
            print(f"plonk equations per round: {eqs}")
            print(f"fri ok: {fri_ok}")
        print(f"verified (golden, {time.time() - t0:.2f}s): {ok}")
        return 0 if ok else 1

    import numpy as np

    from .compiler import CircuitTemplate, flatten_proofs
    from .verifier_jax import JaxVerifier

    tpl = CircuitTemplate(common)
    arrays = flatten_proofs(tpl, [(vkey, pwp)] * args.batch)
    v = JaxVerifier(tpl)
    t0 = time.time()
    out = v(v.prepare(arrays))
    eqs = np.asarray(out["eqs_ok"])
    fri = np.asarray(out["fri_ok"])
    ok = np.asarray(out["ok"])
    dt = time.time() - t0
    if not args.quiet:
        print(f"plonk equations ok: {eqs.tolist()}")
        print(f"fri ok: {fri.tolist()}")
    print(
        f"verified (jax, batch {args.batch}, {dt:.2f}s incl. compile): "
        f"{int(ok.sum())}/{args.batch}"
    )
    return 0 if bool(ok.all()) else 1


def _cmd_fixture(args) -> int:
    import json

    from .models.cache import get_fixture_proof

    params = {"num_query_rounds": args.queries, "proof_of_work_bits": args.pow_bits}
    if args.degree_bits:
        if args.model == "fibonacci":
            params["n_arith_rows"] = (1 << args.degree_bits) - 3
        elif args.model == "gate_zoo":
            params["target_degree_bits"] = args.degree_bits
    common, vkey, pwp = get_fixture_proof(args.model, **params)
    for obj, kind in [(common, "common"), (vkey, "vkey"), (pwp, "proof")]:
        path = f"{args.out_prefix}_{kind}.json"
        with open(path, "w") as f:
            json.dump(obj.to_json(), f)
        print(f"wrote {path}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="python -m plonky2_verifier_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("verify", help="verify {prefix}_{common,vkey,proof}.json")
    pv.add_argument("prefix")
    pv.add_argument("--backend", choices=("jax", "golden"), default="jax")
    pv.add_argument("--batch", type=int, default=1)
    pv.add_argument("--quiet", action="store_true")
    pv.set_defaults(fn=_cmd_verify)

    pf = sub.add_parser("fixture", help="generate + prove a fixture circuit")
    pf.add_argument("model", choices=("fibonacci", "gate_zoo", "lookup", "multi_lookup", "poseidon_chain"))
    pf.add_argument("out_prefix")
    pf.add_argument("--queries", type=int, default=8)
    pf.add_argument("--pow-bits", type=int, default=8)
    pf.add_argument("--degree-bits", type=int, default=0)
    pf.set_defaults(fn=_cmd_fixture)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
