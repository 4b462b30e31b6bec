"""Structural tests for the symbolic gate programs."""

import random

from plonky2_verifier_tpu.gate_parser import Gate, gate_to_string, parse_gate
from plonky2_verifier_tpu.gates import (
    EvaluationVars,
    GoldenExtAlgebra,
    constraint_degree,
    gate_program,
    run_straight_line,
)
from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.golden.poseidon import permutation


def test_poseidon_gate_shape():
    """123 constraints of degree 7 over a 135-cell row (commentary/Poseidon.md)."""
    prog = gate_program(Gate("PoseidonGate", (12,)))
    assert len(prog.constraints) == 123
    assert constraint_degree(prog) == 7


def test_gate_degrees():
    assert constraint_degree(gate_program(Gate("ArithmeticGate", (20,)))) == 3
    assert constraint_degree(gate_program(Gate("MulExtensionGate", (13,)))) == 3
    assert constraint_degree(gate_program(Gate("BaseSumGate", (63, 2)))) == 2
    assert constraint_degree(gate_program(Gate("BaseSumGate", (13, 6)))) == 6
    assert constraint_degree(gate_program(Gate("ExponentiationGate", (13,)))) == 4
    assert constraint_degree(gate_program(Gate("PoseidonMdsGate", (12,)))) == 1
    assert constraint_degree(gate_program(Gate("ConstantGate", (2,)))) == 1
    assert constraint_degree(gate_program(Gate("PublicInputGate", ()))) == 1
    assert constraint_degree(gate_program(Gate("RandomAccessGate", (4, 4, 2)))) == 5
    assert constraint_degree(gate_program(Gate("ReducingGate", (21,)))) == 2
    assert constraint_degree(gate_program(Gate("NoopGate", ()))) == 0


def _fresh_row():
    # deterministic fake row mirroring Gate/Computation.hs:187-198
    return EvaluationVars(
        selectors=[],
        lkp_selectors=[],
        constants=[(666, 0), (77, 0)],
        wires=[((1001 + 71 * i) % gf.P, 13) for i in range(135)],
        public_inputs_hash=[101, 102, 103, 104],
    )


def test_run_gate_programs_smoke():
    """All gate evaluators run on a synthetic row and produce ext values."""
    gates = [
        Gate("ArithmeticGate", (20,)),
        Gate("ArithmeticExtensionGate", (10,)),
        Gate("BaseSumGate", (13, 3)),
        Gate("ConstantGate", (2,)),
        Gate("ExponentiationGate", (13,)),
        Gate("MulExtensionGate", (13,)),
        Gate("PublicInputGate", ()),
        Gate("PoseidonGate", (12,)),
        Gate("PoseidonMdsGate", (12,)),
        Gate("RandomAccessGate", (4, 4, 2)),
        Gate("ReducingGate", (13,)),
        Gate("ReducingExtensionGate", (13,)),
        Gate("NoopGate", ()),
    ]
    ev = _fresh_row()
    for g in gates:
        out = run_straight_line(gate_program(g), ev, GoldenExtAlgebra)
        assert all(isinstance(x, tuple) and len(x) == 2 for x in out)


def test_poseidon_gate_consistency_with_permutation():
    """A row filled with a real permutation trace satisfies all 123 constraints."""
    from plonky2_verifier_tpu.prover.witness import poseidon_gate_witness

    rng = random.Random(7)
    inputs = [gf.rand_f(rng) for _ in range(12)]
    row = poseidon_gate_witness(inputs, swap=0)
    assert row[12:24] == permutation(inputs)
    ev = EvaluationVars(
        selectors=[],
        lkp_selectors=[],
        constants=[(0, 0), (0, 0)],
        wires=[(w, 0) for w in row],
        public_inputs_hash=[0, 0, 0, 0],
    )
    out = run_straight_line(gate_program(Gate("PoseidonGate", (12,))), ev, GoldenExtAlgebra)
    assert all(x == (0, 0) for x in out)


def test_gate_string_roundtrip():
    strings = [
        "NoopGate",
        "PublicInputGate",
        "ArithmeticGate { num_ops: 20 }",
        "ArithmeticExtensionGate { num_ops: 10 }",
        "BaseSumGate { num_limbs: 63 } + Base: 2",
        "ConstantGate { num_consts: 2 }",
        "ExponentiationGate { num_power_bits: 66 }",
        "MulExtensionGate { num_ops: 13 }",
        "PoseidonGate(PhantomData<plonky2_field::goldilocks_field::GoldilocksField>)<WIDTH=12>",
        "PoseidonMdsGate(PhantomData<plonky2_field::goldilocks_field::GoldilocksField>)<WIDTH=12>",
        "RandomAccessGate { bits: 4, num_copies: 4, num_extra_constants: 2, "
        "_phantom: PhantomData<plonky2_field::goldilocks_field::GoldilocksField> }<D=2>",
        "ReducingGate { num_coeffs: 33 }",
        "ReducingExtensionGate { num_coeffs: 32 }",
        "CosetInterpolationGate { subgroup_bits: 4, degree: 6, barycentric_weights: "
        "[17293822565076172801, 18446744069414584577], "
        "_phantom: PhantomData<plonky2_field::goldilocks_field::GoldilocksField> }<D=2>",
        "LookupGate { num_slots: 40, lut_hash: [1, 2, 3] }",
        "LookupTableGate { num_slots: 26, lut_hash: [1, 2, 3], last_lut_row: 5 }",
    ]
    for s in strings:
        g = parse_gate(s)
        assert g.kind != "UnknownGate", s
        assert parse_gate(gate_to_string(g)) == g
