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


def test_device_lookup_checks_bit_exact_vs_golden(lookup_proof):
    """ALWAYS-ON device-path regression for `_lookup_checks`
    (verifier_jax.py, mirroring Plonk/Lookups.hs:45-132): jit the lookup
    module in isolation on XLA:CPU and assert its per-round equation vector
    is BIT-EXACT against golden eval_lookup_equations, and that a mutated
    lookup_zs limb changes it. The full lookup template is compiled/run on
    CPU too (see the minimal-template note in docs/performance.md) but the
    module-level pin is what catches refactors of these 170 lines without
    a TPU in the loop."""
    import jax
    import numpy as np

    from plonky2_verifier_tpu.compiler.template import CircuitTemplate
    from plonky2_verifier_tpu.golden.plonk import (
        eval_lookup_equations,
        get_selector_config,
        split_constant_columns,
    )
    from plonky2_verifier_tpu.ops import field as jf
    from plonky2_verifier_tpu.verifier_jax import JaxVerifier

    fx, vkey, pwp = lookup_proof
    common = fx.common
    tpl = CircuitTemplate(common)
    v = JaxVerifier(tpl)
    ch = proof_challenges(common, vkey, pwp)
    op = pwp.proof.openings

    # golden reference vector
    selcfg = get_selector_config(common)
    _, lkp_sels_g, _ = split_constant_columns(selcfg, op.constants)
    want = eval_lookup_equations(common, lkp_sels_g, op, ch)

    B = 2

    def ext_arr(rows):  # list of (re, im) -> GExt (B, n)
        a = np.array(rows, dtype=np.uint64).reshape(1, -1, 2).repeat(B, axis=0)
        return jf.ext_from_u64(a[..., 0], a[..., 1])

    def base_arr(x):  # scalar -> G (B,)
        return jf.from_u64(np.full((B,), x, dtype=np.uint64))

    lkp_sels = ext_arr(lkp_sels_g)
    wires = ext_arr(op.wires)
    lookup_zs = ext_arr(op.lookup_zs)
    lookup_zs_next = ext_arr(op.lookup_zs_next)
    deltas = [
        (base_arr(d.a), base_arr(d.b), base_arr(d.alpha), base_arr(d.delta))
        for d in ch.deltas
    ]

    fn = jax.jit(v._lookup_checks)
    out = fn(lkp_sels, wires, lookup_zs, lookup_zs_next, deltas)
    re_u, im_u = jf.ext_to_u64(out)
    got = [(int(r), int(i)) for r, i in zip(np.asarray(re_u)[0], np.asarray(im_u)[0])]
    assert got == [tuple(w) for w in want], "device lookup vector != golden"
    # both batch lanes agree (the module is batch-uniform)
    got1 = [(int(r), int(i)) for r, i in zip(np.asarray(re_u)[1], np.asarray(im_u)[1])]
    assert got1 == got

    # sensitivity: a flipped lookup_zs limb must change the vector
    mut = [list(x) for x in op.lookup_zs]
    mut[0][0] ^= 1
    out2 = fn(lkp_sels, wires, ext_arr(mut), lookup_zs_next, deltas)
    re2, _ = jf.ext_to_u64(out2)
    assert not np.array_equal(np.asarray(re_u), np.asarray(re2))
