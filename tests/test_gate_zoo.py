"""Gate-zoo coverage: every gate kind in one proved circuit, accepted by both
the golden and the device verifier, with a device fault-injection sweep over
EVERY flattened proof array (the device analog of the golden mutation suite).

This is the analog of the reference's recursion fixtures
(testmain.hs:28-29): CosetInterpolation, RandomAccess, Reducing(Ext),
PoseidonMds & co. appear in a real accepted proof, and the device lookup
path (verifier_jax.py _lookup_checks) runs under pytest for the first time.
"""

import numpy as np
import pytest

from plonky2_verifier_tpu.gate_parser import Gate, gate_to_string, parse_gate
from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.golden.verifier import verify_proof
from plonky2_verifier_tpu.models.gate_zoo import gate_zoo_fixture
from plonky2_verifier_tpu.prover.fft import eval_poly_ext
from plonky2_verifier_tpu.prover.prove import prove

ALL_16_KINDS = {
    "ArithmeticGate", "ArithmeticExtensionGate", "BaseSumGate", "ConstantGate",
    "CosetInterpolationGate", "ExponentiationGate", "LookupGate", "LookupTableGate",
    "MulExtensionGate", "NoopGate", "PublicInputGate", "PoseidonGate",
    "PoseidonMdsGate", "RandomAccessGate", "ReducingGate", "ReducingExtensionGate",
}


@pytest.fixture(scope="module")
def zoo():
    fx = gate_zoo_fixture(num_query_rounds=4, proof_of_work_bits=4)
    vkey, pwp = prove(fx)
    return fx, vkey, pwp


def test_all_16_gate_kinds_present(zoo):
    fx, _, _ = zoo
    assert {g.kind for g in fx.common.gates} == ALL_16_KINDS


def test_golden_accepts(zoo):
    fx, vkey, pwp = zoo
    assert verify_proof(fx.common, vkey, pwp)


def test_witness_semantics(zoo):
    """The solved witnesses are mathematically meaningful, not just
    constraint-satisfying: the CosetInterpolation row interpolates p over
    shift*H and evaluates it at eval_loc; RandomAccess muxes the right
    element; Exponentiation computes base^e."""
    fx, _, _ = zoo
    m = fx.meta
    ci = fx.witness[m["ci_row"]]
    n_points = 16
    eval_loc = (ci[1 + 2 * n_points], ci[1 + 2 * n_points + 1])
    eval_result = (ci[1 + 2 * n_points + 2], ci[1 + 2 * n_points + 3])
    assert eval_result == eval_poly_ext(m["ci_coeffs"], eval_loc)
    # eval_loc really is shifted_loc * coset_shift
    assert eval_loc == gf.escale(m["ci_shift"], m["ci_shifted_loc"])

    w = fx.witness[m["ra_row"]]
    for k in range(4):
        assert w[k * m["ra_width"] + 1] == m["ra_vecs"][k][m["ra_idxs"][k]]

    we = fx.witness[m["exp_row"]]
    assert we[8 + 1] == gf.fpow(m["exp_base"], m["exp_e"])


def test_gate_string_roundtrip(zoo):
    fx, _, _ = zoo
    for g in fx.common.gates:
        assert parse_gate(gate_to_string(g)) == g


def test_golden_rejects_per_gate_wire_mutation(zoo):
    """Corrupting the wire opening that carries each custom gate's output
    flips the verdict: every gate family's constraints are load-bearing."""
    import copy

    fx, vkey, pwp = zoo
    # wire indices of signature output cells per gate family (see gate_zoo.py)
    signature_wires = {
        "RandomAccess output": 1,
        "Reducing output": 0,
        "CosetInterpolation eval": 35,
        "PoseidonMds output": 24,
        "BaseSum sum": 0,
        "Exponentiation out": 9,
    }
    for name, wi in signature_wires.items():
        bad = copy.deepcopy(pwp)
        re, im = bad.proof.openings.wires[wi]
        bad.proof.openings.wires[wi] = ((re + 1) % gf.P, im)
        assert not verify_proof(fx.common, vkey, bad), f"{name} mutation accepted"


# ---------------------------------------------------------------------------
# device path


@pytest.fixture(scope="module")
def zoo_device(zoo):
    from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
    from plonky2_verifier_tpu.verifier_jax import JaxVerifier

    fx, vkey, pwp = zoo
    tpl = CircuitTemplate(fx.common)
    arrays = flatten_proofs(tpl, [(vkey, pwp)] * 2)
    v = JaxVerifier(tpl)
    return tpl, v, arrays


def test_jax_accepts_and_runs_lookup_path(zoo, zoo_device):
    fx, _, _ = zoo
    tpl, v, arrays = zoo_device
    assert fx.common.num_lookup_polys > 0, "zoo must exercise the lookup path"
    out = v(v.prepare(arrays))
    ok = np.asarray(out["ok"])
    assert ok.shape == (2,) and ok.all()


def test_jax_transcript_matches_golden(zoo, zoo_device):
    from plonky2_verifier_tpu.compiler import CircuitTemplate
    from plonky2_verifier_tpu.golden.challenges import proof_challenges
    from plonky2_verifier_tpu.verifier_jax import JaxVerifier

    fx, vkey, pwp = zoo
    tpl, _, arrays = zoo_device
    vdbg = JaxVerifier(tpl, debug=True)
    out = vdbg(vdbg.prepare(arrays))
    ch = proof_challenges(fx.common, vkey, pwp)
    dz = out["debug"]["zeta"]
    zeta_dev = (
        (int(dz[0][0]) << 32) | int(dz[1][0]),
        (int(dz[2][0]) << 32) | int(dz[3][0]),
    )
    assert zeta_dev == ch.zeta
    qi = np.asarray(out["debug"]["query_indices"])[0]
    assert list(qi) == list(ch.fri.query_indices)


def _array_keys():
    # every key flatten_proofs emits for a 1-fold-step zoo template; the
    # parameterization is validated against the real dict inside the test.
    base = [
        "circuit_digest", "public_inputs", "cap_cs", "cap_w", "cap_zp", "cap_q",
        "openings1", "openings2", "final_poly", "pow_witness",
    ]
    oracles = [f"{p}_{o}" for o in range(4) for p in ("leaves", "sibs")]
    steps = [f"step_{p}_0" for p in ("cap", "evals", "sibs")]
    return base + oracles + steps


@pytest.mark.parametrize("key", _array_keys())
def test_device_fault_injection_every_array(zoo_device, key):
    """Mutating ANY flattened proof array in lane 0 must flip lane 0's
    verdict and leave lane 1 accepted — full device-path parity with the
    golden fault-injection suite (SURVEY section 5 'fault injection')."""
    tpl, v, arrays = zoo_device
    assert set(_array_keys()) == set(arrays.keys()), "parameterization out of date"
    bad = {k: np.array(val, copy=True) for k, val in arrays.items()}
    lane0 = bad[key][0]
    lane0.reshape(-1)[0] ^= np.uint64(1)
    out = v(v.prepare(bad))
    ok = np.asarray(out["ok"])
    assert not ok[0], f"lane 0 accepted despite corrupted {key}"
    assert ok[1], f"lane 1 rejected by lane 0's corrupted {key}"


# ---------------------------------------------------------------------------
# UnknownGate handling


def test_unknown_gate_parses_and_roundtrips():
    s = "FancyNewGate { num_things: 7 }"
    g = parse_gate(s)
    assert g.kind == "UnknownGate"
    assert gate_to_string(g) == s


def test_unknown_gate_vkey_rejected_host_side(zoo):
    """A vkey whose gate list contains an unparseable gate is rejected
    cleanly at template-compile time (malformed inputs are host-side
    errors, not device verdicts — SURVEY section 5 'failure detection');
    the reference parses it as UnknownGate (Gate/Parser.hs:130) and would
    error only on constraint evaluation."""
    import copy

    from plonky2_verifier_tpu.compiler import CircuitTemplate

    fx, vkey, pwp = zoo
    common2 = copy.deepcopy(fx.common)
    common2.gates[3] = Gate("UnknownGate", ("FancyNewGate { num_things: 7 }",))
    with pytest.raises(ValueError, match="[Uu]nknown gate"):
        CircuitTemplate(common2)
    with pytest.raises(ValueError, match="[Uu]nknown gate"):
        verify_proof(common2, vkey, pwp)
