"""Seeded random-circuit fuzz: random gate mixes through the whole stack —
build -> solve witnesses -> prove -> golden verify -> mutate -> reject,
plus a DEVICE (JaxVerifier) accept + mutation reject per device seed.

This is the property-style tier on top of the fixed fixtures: shapes vary
per seed (different gate sets, row counts, arities), so it exercises the
template/selector/vanishing machinery on circuits nobody hand-tuned. The
menu covers all constraint families including the hard gates where layout
bugs live (Poseidon, CosetInterpolation, RandomAccess, ArithmeticExtension,
PoseidonMds — Gate/Constraints.hs:40-108) and seeded lookup blocks. Golden
runs cover every seed; the device pass runs in subprocesses
(fuzz_device_check.py) because per-shape XLA:CPU compiles are ~1-2 min."""

import copy
import random

import pytest

from plonky2_verifier_tpu.gate_parser import Gate
from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.golden.verifier import verify_proof
from plonky2_verifier_tpu.models.builder import CircuitBuilder
from plonky2_verifier_tpu.models.gate_zoo import barycentric_weights
from plonky2_verifier_tpu.prover.prove import prove

MENU = [
    "arith", "mulext", "basesum", "exp", "reducing", "noop",
    "arith_ext", "poseidon", "poseidon_mds", "coset", "random_access",
]


def _random_circuit(seed: int):
    rng = random.Random(seed)
    b = CircuitBuilder(
        seed=seed,
        num_query_rounds=rng.choice([3, 4, 6]),
        proof_of_work_bits=rng.choice([0, 2, 4]),
        arity_bits=rng.choice([1, 2]),
        final_poly_bits=rng.choice([0, 1]),
    )
    rnd = lambda: rng.randrange(gf.P)

    # a random multiset of gate rows; prefills give solvable inputs
    n_gates = rng.randrange(2, 6)
    for _ in range(n_gates):
        kind = rng.choice(MENU)
        if kind == "arith":
            ops = rng.choice([2, 5, 20])
            pre = {}
            for op in range(ops):
                pre[4 * op] = rnd()
                pre[4 * op + 1] = rnd()
                pre[4 * op + 2] = rnd()
            b.add_row(Gate("ArithmeticGate", (ops,)), constants=(rnd(), rnd()), prefill=pre)
        elif kind == "mulext":
            ops = rng.choice([1, 3, 13])
            pre = {}
            for op in range(ops):
                for c in range(4):
                    pre[6 * op + c] = rnd()
            b.add_row(Gate("MulExtensionGate", (ops,)), constants=(rnd(),), prefill=pre)
        elif kind == "basesum":
            # limbs prefilled (each range-constrained), the sum wire is solved
            limbs = rng.choice([4, 8, 16])
            base = rng.choice([2, 4])
            val = rng.randrange(base**limbs)
            pre = {}
            for i in range(limbs):
                pre[1 + i] = val % base
                val //= base
            b.add_row(Gate("BaseSumGate", (limbs, base)), prefill=pre)
        elif kind == "exp":
            bits = rng.choice([2, 3, 5])
            b.add_row(
                Gate("ExponentiationGate", (bits,)),
                prefill={0: rnd(), **{1 + i: rng.randrange(2) for i in range(bits)}},
            )
        elif kind == "reducing":
            # wires: out(0,1) alpha(2,3) old_acc(4,5) coeffs(6..6+n) — solve
            # out and the accumulators, prefill the rest
            n = rng.choice([2, 4])
            pre = {k: rnd() for k in range(2, 6)}
            for i in range(n):
                pre[6 + i] = rnd()
            b.add_row(Gate("ReducingGate", (n,)), prefill=pre)
        elif kind == "arith_ext":
            ops = rng.choice([2, 10])
            pre = {}
            for op in range(ops):
                for c in range(6):  # x,y,z ext pairs; out solved
                    pre[8 * op + c] = rnd()
            b.add_row(Gate("ArithmeticExtensionGate", (ops,)), constants=(rnd(), rnd()), prefill=pre)
        elif kind == "poseidon":
            pre = {i: rnd() for i in range(12)}
            pre[24] = 0  # no merkle swap
            b.add_row(Gate("PoseidonGate", (12,)), prefill=pre)
        elif kind == "poseidon_mds":
            b.add_row(Gate("PoseidonMdsGate", (12,)), prefill={i: rnd() for i in range(24)})
        elif kind == "coset":
            sub_bits, degree = 4, rng.choice([6, 8])
            g = Gate("CosetInterpolationGate", (sub_bits, degree, barycentric_weights(sub_bits)))
            n_points = 1 << sub_bits
            pre = {0: gf.MULT_GEN}
            for k in range(n_points):
                pre[1 + 2 * k] = rnd()
                pre[1 + 2 * k + 1] = rnd()
            n_intermediates = (n_points - 2) // (degree - 1)
            sl_base = 1 + 2 * (n_points + 2) + 4 * n_intermediates
            pre[sl_base] = rnd()
            pre[sl_base + 1] = rnd()
            b.add_row(g, prefill=pre)
        elif kind == "random_access":
            bits, copies, extra = 2, rng.choice([2, 4]), 0
            g = Gate("RandomAccessGate", (bits, copies, extra))
            width = 2 + (1 << bits)
            pre = {}
            for k in range(copies):
                idx = rng.randrange(1 << bits)
                pre[k * width] = idx
                for j in range(1 << bits):
                    pre[k * width + 2 + j] = rnd()
                for j in range(bits):
                    pre[copies * width + extra + k * bits + j] = (idx >> j) & 1
            b.add_row(g, prefill=pre)
        else:
            b.add_row(Gate("NoopGate", ()))
    if rng.random() < 0.5:
        # seeded lookup block: small LUT, a few uses
        tsize = rng.choice([8, 16])
        table = [(x, (x * x + rng.randrange(16)) % gf.P) for x in range(tsize)]
        lut = b.add_lookup_table(table)
        for _ in range(rng.randrange(1, 6)):
            b.add_lookup(lut, rng.randrange(tsize))
    b.set_public_inputs([rng.randrange(1000) for _ in range(rng.randrange(0, 3))])
    return b.build(name=f"fuzz{seed}")


def menu_coverage(seeds):
    """Which gate kinds appear across these seeds' circuits."""
    kinds = set()
    for s in seeds:
        fx = _random_circuit(s)
        kinds |= {g.kind for g in fx.common.gates}
        if fx.common.luts:
            kinds |= {"LookupGate", "LookupTableGate"}
    return kinds


def test_menu_covers_all_constraint_families():
    """Across the fuzz seeds the menu must actually surface every gate kind
    it advertises, including the hard gates and a lookup block."""
    kinds = menu_coverage([5, 9, 11, 13, 23, 31, 47, 52])
    for want in [
        "PoseidonGate", "PoseidonMdsGate", "CosetInterpolationGate",
        "RandomAccessGate", "ArithmeticExtensionGate", "BaseSumGate",
        "ExponentiationGate", "MulExtensionGate", "ReducingGate",
        "LookupGate", "LookupTableGate",
    ]:
        assert want in kinds, f"fuzz menu never produced {want}"


@pytest.mark.parametrize("seed", [5, 11, 23, 47, 52])
def test_random_circuit_proves_and_verifies(seed):
    fx = _random_circuit(seed)
    vkey, pwp = prove(fx)
    assert verify_proof(fx.common, vkey, pwp), f"seed {seed} rejected"

    # one random mutation per layer must flip the verdict
    rng = random.Random(seed * 7)
    bad = copy.deepcopy(pwp)
    bad.proof.opening_proof.pow_witness ^= 1
    assert not verify_proof(fx.common, vkey, bad), "pow mutation accepted"

    bad = copy.deepcopy(pwp)
    i = rng.randrange(len(bad.proof.openings.wires))
    re, im = bad.proof.openings.wires[i]
    bad.proof.openings.wires[i] = ((re + 1) % gf.P, im)
    assert not verify_proof(fx.common, vkey, bad), "opening mutation accepted"


def test_fuzz_device_seeds():
    """Two fuzz circuits with hard-gate mixes through the DEVICE verifier
    (accept + fault-injection rejects), in concurrent subprocesses — seed 13
    carries PoseidonGate + ArithmeticExtension, seed 23 adds RandomAccess +
    PoseidonMds (the gate families where layout bugs live)."""
    import json
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "fuzz_device_check.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(seed)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for seed in (13, 23)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        lines = [l for l in out.splitlines() if l.startswith("{")]
        assert p.returncode == 0 and lines, f"rc={p.returncode}\n{err[-2000:]}"
        results.append(json.loads(lines[-1]))
    for r in results:
        assert r["pass"], r
    hard = {g for r in results for g in r["gates"]}
    assert {"PoseidonGate", "ArithmeticExtensionGate", "RandomAccessGate", "PoseidonMdsGate"} <= hard
