"""Trap mutation-testing: prove docs/traps.md is load-bearing.

With no external oracle available on this host (no GHC, upstream fixtures
gitignored — SURVEY §4), the strongest defense against self-consistent
semantics drift is to patch the NAIVE semantics into the golden model, one
trap at a time, and assert honest fixture proofs are then REJECTED (and the
unpatched pipeline still accepts). Each test kills one mutant; if a future
refactor silently drops a trap behavior, the corresponding mutant would
survive and the test fails.

Rows mechanized here (numbering per docs/traps.md):
  1 squeeze-buffer reversal          (Challenge/Pure.hs:41-43)
  2 lazy duplex flush                (Challenge/Pure.hs:50-69)
  4 transcript-vs-combine order      (Plonk/FRI.hs:171-186)
  5 the alpha^{M2} swap              (Plonk/FRI.hs:204-207)
  8 LUT first-entry padding          (Plonk/Lookups.hs:99-109)
  9 UNUSED selector factor           (Gate/Selector.hs:87-89)
 10 beta/gamma reuse for lookups     (Challenge/Verifier.hs:82-86)
"""

import pytest

from plonky2_verifier_tpu.golden import challenges as gch
from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.golden import fri as gfri
from plonky2_verifier_tpu.golden import plonk as gpl
from plonky2_verifier_tpu.golden.duplex import RATE, Duplex
from plonky2_verifier_tpu.golden.field import (
    EXT_ONE,
    eadd,
    ediv,
    emul,
    epow,
    escale,
    esub,
    from_base,
    reduce_with_powers,
)
from plonky2_verifier_tpu.golden.verifier import verify_proof
from plonky2_verifier_tpu.models.cache import get_fixture_proof


@pytest.fixture(scope="module")
def fib():
    return get_fixture_proof("fibonacci", num_query_rounds=4)


@pytest.fixture(scope="module")
def lkp():
    return get_fixture_proof(
        "lookup", table_size=37, n_lookups=50, num_query_rounds=4, proof_of_work_bits=4
    )


def _accepts(fx3):
    common, vkey, pwp = fx3
    return verify_proof(common, vkey, pwp)


# -- row 1: squeeze-buffer reversal -----------------------------------------


def test_mutant_no_squeeze_reversal_killed(fib, monkeypatch):
    """Naive: squeeze outputs state[0..7] in order instead of reversed."""
    assert _accepts(fib)

    def naive_fresh(self):
        self._out = list(self.state[:RATE])
        self._out_lane = list(range(RATE))
        self._squeeze_mode = True

    monkeypatch.setattr(Duplex, "_fresh_squeezing", naive_fresh)
    assert not _accepts(fib), "squeeze-reversal mutant survived"


# -- row 2: lazy duplex flush ------------------------------------------------


def test_mutant_eager_flush_killed(fib, monkeypatch):
    """Naive: the permutation fires eagerly when the 8th felt is absorbed
    (instead of lazily on the 9th absorb / at squeeze time). The two agree
    on flush grouping but diverge whenever a squeeze happens with exactly 8
    pending felts: lazy does ONE overwrite-8 permute, eager has already
    flushed and does an extra empty-buffer permute."""
    assert _accepts(fib)

    spec_absorb = Duplex.absorb

    # unit divergence reference: absorb exactly 8 then squeeze, spec path
    d2 = Duplex()
    d2.absorb_many(list(range(8)))
    want = d2.squeeze()

    def eager_absorb(self, x):
        spec_absorb(self, x)
        if len(self._buf) == RATE:
            self._permute_with(self._buf, self._buf_pos)
            self._buf = []
            self._buf_pos = []

    monkeypatch.setattr(Duplex, "absorb", eager_absorb)
    d = Duplex()
    d.absorb_many(list(range(8)))
    got = d.squeeze()
    assert got != want, "eager-flush mutant produced the spec transcript"
    assert not _accepts(fib), "eager-flush mutant survived"


# -- row 4: transcript order vs combineInitial order -------------------------


def test_mutant_transcript_order_combine_killed(lkp, monkeypatch):
    """Naive: combineInitial pairs alpha powers in TRANSCRIPT order
    (…zs|pp|quotient|lookups) instead of tree order (…zs|pp|lookups swapped
    after quotient). Only distinguishable when lookups exist — the quotient
    and lookup blocks swap positions."""
    assert _accepts(lkp)
    spec = gfri.combine_initial

    def naive_combine(common, challenges, y0, y1, row_oracles, query_idx):
        cfg = common.config
        alpha = challenges.fri.alpha
        zeta = challenges.zeta
        constants, witness, pp_lookup, quotient = row_oracles
        r = cfg.num_challenges
        npp = -(-cfg.num_routed_wires // common.quotient_degree_factor)
        oracle_pp = list(pp_lookup[: r * npp])
        oracle_lookup = list(pp_lookup[r * npp :])
        # transcript order: pp_lookup block stays together, quotient last
        first_batch = list(constants) + list(witness) + oracle_pp + oracle_lookup + list(quotient)
        second_batch = oracle_pp[:r] + oracle_lookup
        g0 = reduce_with_powers(alpha, [from_base(x) for x in first_batch])
        g1 = reduce_with_powers(alpha, [from_base(x) for x in second_batch])
        logn_lde = common.fri_params.lde_bits
        omega = gf.subgroup_generator(common.fri_params.degree_bits)
        eta = gf.subgroup_generator(logn_lde)
        rev_idx = gf.reverse_bits(logn_lde, query_idx)
        point_x = from_base(gf.fmul(gf.MULT_GEN, gf.fpow(eta, rev_idx)))
        one = ediv(esub(g0, y0), esub(point_x, zeta))
        two = ediv(esub(g1, y1), esub(point_x, escale(omega, zeta)))
        return eadd(emul(epow(alpha, len(second_batch)), one), two)

    monkeypatch.setattr(gfri, "combine_initial", naive_combine)
    assert not _accepts(lkp), "transcript-order-combine mutant survived"
    monkeypatch.undo()
    # sanity: the naive combine really is a behavior change, not a crash path
    assert gfri.combine_initial is spec and _accepts(lkp)


# -- row 5: the alpha^{M2} swap ----------------------------------------------


def test_mutant_alpha_swap_killed(fib, monkeypatch):
    """Naive: scale the SECOND quotient term by alpha^{M2} (the plausible
    reading) instead of the first."""
    assert _accepts(fib)
    spec = gfri.combine_initial

    def swapped(common, challenges, y0, y1, row_oracles, query_idx):
        # recompute with the spec, then undo/redo the alpha placement:
        # spec = a^M2 * one + two; naive = one + a^M2 * two. Recover one/two
        # by calling the spec twice is fragile — just reimplement the tail.
        cfg = common.config
        alpha = challenges.fri.alpha
        zeta = challenges.zeta
        constants, witness, pp_lookup, quotient = row_oracles
        r = cfg.num_challenges
        npp = -(-cfg.num_routed_wires // common.quotient_degree_factor)
        oracle_pp = list(pp_lookup[: r * npp])
        oracle_lookup = list(pp_lookup[r * npp :])
        first_batch = list(constants) + list(witness) + oracle_pp + list(quotient) + oracle_lookup
        second_batch = oracle_pp[:r] + oracle_lookup
        g0 = reduce_with_powers(alpha, [from_base(x) for x in first_batch])
        g1 = reduce_with_powers(alpha, [from_base(x) for x in second_batch])
        logn_lde = common.fri_params.lde_bits
        omega = gf.subgroup_generator(common.fri_params.degree_bits)
        eta = gf.subgroup_generator(logn_lde)
        rev_idx = gf.reverse_bits(logn_lde, query_idx)
        point_x = from_base(gf.fmul(gf.MULT_GEN, gf.fpow(eta, rev_idx)))
        one = ediv(esub(g0, y0), esub(point_x, zeta))
        two = ediv(esub(g1, y1), esub(point_x, escale(omega, zeta)))
        return eadd(one, emul(epow(alpha, len(second_batch)), two))  # swapped

    monkeypatch.setattr(gfri, "combine_initial", swapped)
    assert not _accepts(fib), "alpha^M2-swap mutant survived"
    monkeypatch.undo()
    assert gfri.combine_initial is spec


# -- row 8: LUT first-entry padding ------------------------------------------


def test_mutant_zero_lut_padding_killed(lkp, monkeypatch):
    """Naive: pad the last LookupTable row with zeros instead of the first
    table entry (pre-fix-091047f behavior)."""
    common, vkey, pwp = lkp
    # the fixture's table must actually need padding for this to bite
    num_lut_slots = common.config.num_routed_wires // 3
    assert len(common.luts[0]) % num_lut_slots != 0
    assert verify_proof(common, vkey, pwp)
    monkeypatch.setattr(
        gpl, "pad_lut", lambda table, n: list(table) + [(0, 0)] * (n - len(table))
    )
    assert not verify_proof(common, vkey, pwp), "zero-LUT-padding mutant survived"


# -- row 9: UNUSED selector factor -------------------------------------------


def test_mutant_no_unused_factor_killed(monkeypatch):
    """Naive: selector polynomial without the (2^32-1 - x) opt-out factor.
    Only live with >1 selector group, so build a two-group circuit (maxdeg 4
    forces the greedy packing in models/builder.py _group_selectors to
    split)."""
    import random

    from plonky2_verifier_tpu.gate_parser import Gate
    from plonky2_verifier_tpu.models.builder import CircuitBuilder
    from plonky2_verifier_tpu.prover.prove import prove

    b = CircuitBuilder(num_query_rounds=4, proof_of_work_bits=4, max_quotient_degree_factor=4)
    rnd = random.Random(0).randrange
    pre = {}
    for op in range(20):
        pre[4 * op] = rnd(1000)
        pre[4 * op + 1] = rnd(1000)
        pre[4 * op + 2] = rnd(1000)
    b.add_row(Gate("ArithmeticGate", (20,)), constants=(1, 1), prefill=pre)
    b.add_row(Gate("ConstantGate", (2,)), constants=(5, 6))
    b.add_row(Gate("PublicInputGate"))
    b.set_public_inputs([7])
    fx = b.build(name="twogroup")
    vkey, pwp = prove(fx)
    common = fx.common
    assert len(common.selectors_info.groups) > 1, "fixture must have >1 group"
    assert verify_proof(common, vkey, pwp)

    def naive_selector(selectors_info, x, gate_idx):
        rng = selectors_info.groups[selectors_info.selector_indices[gate_idx]]
        value = EXT_ONE
        for j in range(rng.start, rng.end):
            if j != gate_idx:
                value = emul(value, esub(from_base(j), x))
        return value

    monkeypatch.setattr(gpl, "eval_gate_selector", naive_selector)
    assert not verify_proof(common, vkey, pwp), "UNUSED-factor mutant survived"


# -- row 10: beta/gamma reuse as lookup challenges ---------------------------


def test_mutant_fresh_lookup_challenges_killed(lkp, monkeypatch):
    """Naive: squeeze 4r fresh felts for the lookup 4-tuples instead of
    reusing betas ++ gammas ++ 2r extra. Both the tuples AND the downstream
    transcript (extra squeezes advance the duplex) diverge."""
    assert _accepts(lkp)

    def naive_deltas(d, betas, gammas, num_challenges):
        fresh = d.squeeze_n(4 * num_challenges)
        return [gch.LookupDelta(*fresh[i : i + 4]) for i in range(0, len(fresh), 4)]

    monkeypatch.setattr(gch, "lookup_delta_challenges", naive_deltas)
    assert not _accepts(lkp), "fresh-lookup-challenges mutant survived"


# -- meta: every mechanizable traps-table row above is actually exercised ----


def test_traps_rows_covered():
    """docs/traps.md rows mechanized here stay in sync with the table."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "docs", "traps.md")
    with open(path) as f:
        text = f.read()
    for needle in [
        "Squeeze-buffer reversal",
        "Lazy duplex flush",
        "Transcript order vs combine order",
        "swap",
        "Lookup-table padding fix",
        "UNUSED selector factor",
        "reuse as lookup challenges",
    ]:
        assert needle in text, f"traps.md row missing: {needle}"
