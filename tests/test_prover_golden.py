"""End-to-end: fixture prover -> golden verifier, plus fault injection.

The reference ships no proof fixtures (its JSON vectors are gitignored,
SURVEY.md section 4), so these tests are the ground truth for the whole
stack: the prover and verifier are developed against the same spec but
through entirely different code paths (coefficient-space vs point-space),
making agreement a strong cross-check. Fault injection asserts that
*every* mutated proof component flips the verdict.
"""

import copy
import json

import pytest

from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.golden.verifier import verify_proof
from plonky2_verifier_tpu.models.fibonacci import fibonacci_fixture
from plonky2_verifier_tpu.models.poseidon_chain import poseidon_chain_fixture
from plonky2_verifier_tpu.prover.prove import prove
from plonky2_verifier_tpu.types import CommonCircuitData, ProofWithPublicInputs, VerifierOnlyCircuitData


@pytest.fixture(scope="module")
def fib():
    fx = fibonacci_fixture(num_query_rounds=4)
    vkey, pwp = prove(fx)
    return fx, vkey, pwp


@pytest.fixture(scope="module")
def posf():
    # 6 poseidon rows -> N=8; arity 2 + final_poly_bits 1 forces a fold step
    fx = poseidon_chain_fixture(n_chain=6, num_query_rounds=4, arity_bits=2, final_poly_bits=1)
    vkey, pwp = prove(fx)
    return fx, vkey, pwp


def test_fibonacci_accepts(fib):
    fx, vkey, pwp = fib
    assert verify_proof(fx.common, vkey, pwp)


def test_poseidon_chain_accepts(posf):
    fx, vkey, pwp = posf
    assert fx.common.fri_params.reduction_arity_bits, "fixture must exercise folding"
    assert verify_proof(fx.common, vkey, pwp)


def test_json_roundtrip(fib):
    fx, vkey, pwp = fib
    common2 = CommonCircuitData.from_json(json.loads(json.dumps(fx.common.to_json())))
    vkey2 = VerifierOnlyCircuitData.from_json(json.loads(json.dumps(vkey.to_json())))
    pwp2 = ProofWithPublicInputs.from_json(json.loads(json.dumps(pwp.to_json())))
    assert verify_proof(common2, vkey2, pwp2)


def _mutate_leaf(obj, path):
    """Walk a JSON tree to a leaf int and flip a low bit."""
    node = obj
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = node[path[-1]] ^ 1


def _int_leaf_paths(obj, prefix=()):
    if isinstance(obj, dict):
        for k, v in obj.items():
            yield from _int_leaf_paths(v, prefix + (k,))
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            yield from _int_leaf_paths(v, prefix + (i,))
    elif isinstance(obj, int) and not isinstance(obj, bool):
        yield prefix


def test_fault_injection_rejects(fib):
    """Flipping any single field element anywhere in the proof must reject."""
    fx, vkey, pwp = fib
    base = pwp.to_json()
    paths = list(_int_leaf_paths(base))
    # sample across the whole proof (every 7th leaf) to keep runtime sane
    for path in paths[::7]:
        mutated = copy.deepcopy(base)
        _mutate_leaf(mutated, path)
        pwp2 = ProofWithPublicInputs.from_json(mutated)
        assert not verify_proof(fx.common, vkey, pwp2), f"mutation at {path} was accepted"


def test_vkey_mutation_rejects(fib):
    """circuit_digest seeds the transcript (any flip rejects); cap roots are
    only checked where queried, so target the queried residual indices."""
    from plonky2_verifier_tpu.golden.challenges import proof_challenges

    fx, vkey, pwp = fib
    base = vkey.to_json()
    for i in range(4):
        mutated = copy.deepcopy(base)
        _mutate_leaf(mutated, ("circuit_digest", "elements", i))
        vkey2 = VerifierOnlyCircuitData.from_json(mutated)
        assert not verify_proof(fx.common, vkey2, pwp), f"digest mutation {i} accepted"

    ch = proof_challenges(fx.common, vkey, pwp)
    path_len = fx.common.fri_params.lde_bits - fx.common.config.fri_config.cap_height
    queried_roots = {q >> path_len for q in ch.fri.query_indices}
    assert queried_roots
    for root in queried_roots:
        mutated = copy.deepcopy(base)
        _mutate_leaf(mutated, ("constants_sigmas_cap", root, "elements", 0))
        vkey2 = VerifierOnlyCircuitData.from_json(mutated)
        assert not verify_proof(fx.common, vkey2, pwp), f"queried cap root {root} mutation accepted"


def test_reduction_arity_expansion_matches_upstream():
    """The ConstantArityBits expansion is pinned to upstream semantics
    (commentary/FRI.md:46): FULL arity per step while logn > final_poly_bits,
    overshoot below final_poly_bits allowed (the final poly may be SMALLER
    than 2^final_poly_bits); only the upstream-unreachable logn < arity
    corner folds the remaining logn. Round 5 briefly diverged here (a clamp
    to logn - final_poly_bits changed the standard shape [4,4] -> [4,3] and
    rejected every cached standard proof) — this pin prevents a repeat."""
    from plonky2_verifier_tpu.golden.fri import expand_reduction_strategy
    from plonky2_verifier_tpu.types import FriReductionStrategy

    def expand(deg, ar, fp):
        return expand_reduction_strategy(
            deg, FriReductionStrategy(constant_arity_bits=(ar, fp))
        )

    assert expand(12, 4, 5) == [4, 4]  # standard shape: 2^12 -> 2^8 -> 2^4
    assert expand(14, 4, 5) == [4, 4, 4]  # 2^14 -> ... -> 2^2 (< 2^5: fine)
    assert expand(13, 4, 5) == [4, 4]  # 2^13 -> 2^9 -> 2^5 == final: stop
    assert expand(3, 4, 5) == []  # already small enough
    assert expand(3, 2, 0) == [2, 1]  # corner: fold remaining 1 bit, not 2
    assert expand(3, 3, 2) == [3]  # overshoot to 2^0 (< 2^2: fine)

    # the builder must agree with the golden expansion on every shape it emits
    from plonky2_verifier_tpu.models.fibonacci import fibonacci_fixture

    for ar, fp in [(1, 0), (2, 1), (4, 5)]:
        fx = fibonacci_fixture(
            num_query_rounds=2, proof_of_work_bits=0, arity_bits=ar, final_poly_bits=fp
        )
        assert fx.common.fri_params.reduction_arity_bits == expand(
            fx.common.fri_params.degree_bits, ar, fp
        )
