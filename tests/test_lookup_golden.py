"""Lookup argument, golden model: the lookup/multi_lookup fixture families
prove and verify end-to-end, and every mutated proof is rejected
(Plonk/Lookups.hs semantics; commentary/Lookups.md layout)."""

import pytest

from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.golden.challenges import proof_challenges
from plonky2_verifier_tpu.golden.plonk import check_combined_plonk_equations
from plonky2_verifier_tpu.golden.verifier import verify_proof
from plonky2_verifier_tpu.models.lookup import lookup_fixture, multi_lookup_fixture
from plonky2_verifier_tpu.prover.prove import prove


@pytest.fixture(scope="module")
def lookup_proof():
    fx = lookup_fixture(num_query_rounds=4, proof_of_work_bits=4)
    vkey, pwp = prove(fx)
    return fx, vkey, pwp


def test_lookup_verifies(lookup_proof):
    fx, vkey, pwp = lookup_proof
    assert fx.common.num_lookup_polys == 7  # 1 RE + ceil(40/7) SLDC
    assert fx.common.num_lookup_selectors == 5  # 4 + #luts
    assert verify_proof(fx.common, vkey, pwp)


def test_multi_lookup_verifies():
    fx = multi_lookup_fixture(num_query_rounds=4, proof_of_work_bits=4)
    assert fx.common.num_lookup_selectors == 6
    vkey, pwp = prove(fx)
    assert verify_proof(fx.common, vkey, pwp)


def test_lookup_rejects_mutations(lookup_proof):
    fx, vkey, pwp = lookup_proof
    ch = proof_challenges(fx.common, vkey, pwp)

    # corrupt each lookup opening: the combined quotient equation must break
    for i in range(len(pwp.proof.openings.lookup_zs)):
        orig = pwp.proof.openings.lookup_zs[i]
        pwp.proof.openings.lookup_zs[i] = (gf.fadd(orig[0], 1), orig[1])
        assert not all(check_combined_plonk_equations(fx.common, pwp, ch)), (
            f"mutated lookup_zs[{i}] accepted"
        )
        pwp.proof.openings.lookup_zs[i] = orig
    assert verify_proof(fx.common, vkey, pwp)


def test_unused_table_rejected():
    from plonky2_verifier_tpu.models.builder import CircuitBuilder

    b = CircuitBuilder()
    b.add_lookup_table([(1, 2)])
    with pytest.raises(ValueError):
        b.build()


def test_lookup_of_missing_input_rejected():
    from plonky2_verifier_tpu.models.builder import CircuitBuilder

    b = CircuitBuilder()
    lut = b.add_lookup_table([(1, 2), (3, 4)])
    with pytest.raises(ValueError):
        b.add_lookup(lut, 5)
