"""Seeded random-circuit fuzz: random gate mixes through the whole stack —
build -> solve witnesses -> prove -> golden verify -> mutate -> reject.

This is the property-style tier on top of the fixed fixtures: shapes vary
per seed (different gate sets, row counts, arities), so it exercises the
template/selector/vanishing machinery on circuits nobody hand-tuned.
Golden-only (device compiles per shape are minutes on XLA:CPU; the device
path's shape coverage comes from the fixed fixtures + the TPU artifacts)."""

import copy
import random

import pytest

from plonky2_verifier_tpu.gate_parser import Gate
from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.golden.verifier import verify_proof
from plonky2_verifier_tpu.models.builder import CircuitBuilder
from plonky2_verifier_tpu.models.gate_zoo import barycentric_weights
from plonky2_verifier_tpu.prover.prove import prove


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
        kind = rng.choice(["arith", "mulext", "basesum", "exp", "reducing", "noop"])
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
        else:
            b.add_row(Gate("NoopGate", ()))
    b.set_public_inputs([rng.randrange(1000) for _ in range(rng.randrange(0, 3))])
    return b.build(name=f"fuzz{seed}")


@pytest.mark.parametrize("seed", [11, 23, 47])
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
