"""The fixture prover: turn a Fixture (circuit + witness) into a real
Plonky2 proof that the verifier accepts bit-exactly.

Pipeline (the honest-prover side of the protocol the verifier checks):
1. commit constants+sigmas, wires (coset LDE at shift g, bit-reversed-leaf
   Merkle caps),
2. run the Fiat-Shamir transcript (golden duplex) to get betas/gammas,
3. build the partial-product columns (z + 9 partial columns per challenge
   round, in the shifted layout of commentary/Wiring.md), commit,
4. alphas -> evaluate the full constraint vector on the LDE domain (reusing
   the *verifier's own* golden constraint code pointwise), divide by Z_H,
   split the quotient into maxdeg chunks, commit,
5. zeta -> openings at zeta / omega*zeta,
6. FRI: combined polynomial (combine order + alpha^{M2} swap of
   Plonk/FRI.hs:171-207), commit phase with per-step folding, grinding,
   query rounds against all trees.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass
from types import SimpleNamespace
from typing import List, Sequence, Tuple

from ..golden import field as gf
from ..golden.challenges import fri_opening_batches
from ..golden.duplex import Duplex
from ..golden.hashing import sponge
from ..golden.plonk import eval_all_plonk_constraints
from ..models.builder import Fixture
from ..types import (
    FriInitialTreeProof,
    FriProof,
    FriQueryRound,
    FriQueryStep,
    MerkleProof,
    OpeningSet,
    Proof,
    ProofWithPublicInputs,
    VerifierOnlyCircuitData,
)
from .fft import BaseAlg, ExtAlg, coset_evaluate, eval_poly_ext, interpolate
from .merkle import MerkleTree


@dataclass
class _Committed:
    """A committed matrix: per-column coefficients, LDE rows, Merkle tree."""

    col_coeffs: List[List[int]]  # base-field coefficient vectors
    lde_rows: List[List[int]]  # lde_n rows (natural index order)
    tree: MerkleTree


def _commit(columns: Sequence[Sequence[int]], rate_bits: int, cap_height: int) -> _Committed:
    n = len(columns[0])
    bits = n.bit_length() - 1
    lde_bits = bits + rate_bits
    col_coeffs = [interpolate(list(c)) for c in columns]
    col_ldes = [coset_evaluate(cc, gf.MULT_GEN, lde_bits) for cc in col_coeffs]
    lde_n = 1 << lde_bits
    lde_rows = [[col[i] for col in col_ldes] for i in range(lde_n)]
    leaves = [lde_rows[gf.reverse_bits(lde_bits, j)] for j in range(lde_n)]
    tree = MerkleTree(leaves, cap_height)
    return _Committed(col_coeffs, lde_rows, tree)


def _commit_from_coeffs(col_coeffs: Sequence[Sequence[int]], lde_bits: int, cap_height: int) -> _Committed:
    col_ldes = [coset_evaluate(list(cc), gf.MULT_GEN, lde_bits) for cc in col_coeffs]
    lde_n = 1 << lde_bits
    lde_rows = [[col[i] for col in col_ldes] for i in range(lde_n)]
    leaves = [lde_rows[gf.reverse_bits(lde_bits, j)] for j in range(lde_n)]
    tree = MerkleTree(leaves, cap_height)
    return _Committed([list(c) for c in col_coeffs], lde_rows, tree)


def _synthetic_div(coeffs: List[gf.FExt], root: gf.FExt) -> List[gf.FExt]:
    """Divide sum c_i X^i by (X - root); remainder must be zero."""
    out: List[gf.FExt] = [gf.EXT_ZERO] * (len(coeffs) - 1)
    acc = gf.EXT_ZERO
    for i in range(len(coeffs) - 1, 0, -1):
        acc = gf.eadd(coeffs[i], gf.emul(acc, root)) if i < len(coeffs) - 1 else coeffs[i]
        out[i - 1] = acc
        acc = out[i - 1]
    rem = gf.eadd(coeffs[0], gf.emul(out[0], root))
    assert rem == gf.EXT_ZERO, f"nonzero remainder {rem}"
    return out


def compute_partial_product_columns(
    fixture: Fixture, betas: Sequence[int], gammas: Sequence[int]
) -> Tuple[List[List[int]], int]:
    """Per challenge round: [z] + num_partial_products partial columns, in the
    shifted layout of commentary/Wiring.md (z holds the running product; the
    partial columns hold per-chunk prefixes within each row)."""
    common = fixture.common
    n = common.nrows
    maxdeg = common.quotient_degree_factor
    nrouted = common.config.num_routed_wires
    omega_pows = gf.powers(gf.subgroup_generator(common.fri_params.degree_bits), n)

    zs_cols: List[List[int]] = []
    pp_cols_all: List[List[int]] = []
    for beta, gamma in zip(betas, gammas):
        z = [1] * n
        pp_cols = [[0] * n for _ in range(common.num_partial_products)]
        for i in range(n):
            x = omega_pows[i]
            acc = z[i]
            chunk_prefix = []
            for c in range(nrouted // maxdeg):
                num = den = 1
                for j in range(c * maxdeg, (c + 1) * maxdeg):
                    w = fixture.witness[i][j]
                    num = num * ((w + beta * common.k_is[j] % gf.P * x + gamma) % gf.P) % gf.P
                    den = den * ((w + beta * fixture.sigma_columns[j][i] + gamma) % gf.P) % gf.P
                acc = acc * num % gf.P * gf.finv(den) % gf.P
                chunk_prefix.append(acc)
            for c in range(common.num_partial_products):
                pp_cols[c][i] = chunk_prefix[c]
            if i + 1 < n:
                z[i + 1] = chunk_prefix[-1]
            else:
                assert chunk_prefix[-1] == 1, "grand product does not close to 1"
        zs_cols.append(z)
        pp_cols_all.extend(pp_cols)
    return zs_cols + pp_cols_all, len(zs_cols)


def compute_lookup_columns(fixture: Fixture, deltas) -> List[List[int]]:
    """Per challenge round: the RE column + num_sldc SLDC running-sum columns
    (commentary/Lookups.md). Accumulation runs from the bottom row upward
    (row transitions reference omega*x = the row below): zero on each block's
    Noop row, Sum added across LookupTable rows, LDC subtracted across Lookup
    rows, closing at zero on the topmost Lookup row. Row roles are read off
    the committed lookup selector columns, so the columns match exactly what
    the verifier's equations (Plonk/Lookups.hs:45-132) constrain."""
    common = fixture.common
    cfg = common.config
    n = common.nrows
    num_lu_slots = cfg.num_routed_wires // 2
    num_lut_slots = cfg.num_routed_wires // 3
    num_sldc = common.num_lookup_polys - 1
    lu_degree = common.quotient_degree_factor - 1
    lut_degree = -(-num_lut_slots // num_sldc)

    n_sel = len(common.selectors_info.groups)
    trans_sre = fixture.constant_columns[n_sel + 0]
    trans_ldc = fixture.constant_columns[n_sel + 1]

    cols: List[List[int]] = []
    for delta in deltas:
        re_col = [0] * n
        sldc_cols = [[0] * n for _ in range(num_sldc)]
        re_below = 0
        a_below = 0
        for i in range(n - 1, -1, -1):
            w = fixture.witness[i]
            if trans_sre[i]:  # LookupTable row: RE Horner step + Sum chunks
                acc = re_below
                for j in range(num_lut_slots):
                    acc = (delta.delta * acc + w[3 * j] + delta.b * w[3 * j + 1]) % gf.P
                re_col[i] = acc
                prev = a_below
                for k in range(num_sldc):
                    for j in range(k * lut_degree, min((k + 1) * lut_degree, num_lut_slots)):
                        combo = (w[3 * j] + delta.a * w[3 * j + 1]) % gf.P
                        prev = (prev + w[3 * j + 2] * gf.finv((delta.alpha - combo) % gf.P)) % gf.P
                    sldc_cols[k][i] = prev
            elif trans_ldc[i]:  # Lookup row: LDC chunks subtract
                prev = a_below
                for k in range(num_sldc):
                    for j in range(k * lu_degree, min((k + 1) * lu_degree, num_lu_slots)):
                        combo = (w[2 * j] + delta.a * w[2 * j + 1]) % gf.P
                        prev = (prev - gf.finv((delta.alpha - combo) % gf.P)) % gf.P
                    sldc_cols[k][i] = prev
            re_below = re_col[i]
            a_below = sldc_cols[-1][i]
        cols.append(re_col)
        cols.extend(sldc_cols)
    return cols


def _point_challenges(challenges_ns, x: int):
    """Clone the challenge namespace with zeta := (x, 0) for pointwise LDE
    evaluation of the constraint vector."""
    return SimpleNamespace(
        betas=challenges_ns.betas,
        gammas=challenges_ns.gammas,
        alphas=challenges_ns.alphas,
        deltas=challenges_ns.deltas,
        zeta=(x, 0),
        public_inputs_hash=challenges_ns.public_inputs_hash,
        fri=None,
    )


def prove(fixture: Fixture, grind_hook=None) -> Tuple[VerifierOnlyCircuitData, ProofWithPublicInputs]:
    common = fixture.common
    cfg = common.config
    n = common.nrows
    degree_bits = common.fri_params.degree_bits
    rate_bits = cfg.fri_config.rate_bits
    lde_bits = degree_bits + rate_bits
    lde_n = 1 << lde_bits
    cap_h = cfg.fri_config.cap_height
    r = cfg.num_challenges
    maxdeg = common.quotient_degree_factor

    # 1. commit constants+sigmas and wires --------------------------------
    const_sigma_cols = [list(c) for c in fixture.constant_columns] + [
        list(c) for c in fixture.sigma_columns
    ]
    cs = _commit(const_sigma_cols, rate_bits, cap_h)
    wire_cols = [[fixture.witness[i][j] for i in range(n)] for j in range(cfg.num_wires)]
    wires = _commit(wire_cols, rate_bits, cap_h)

    circuit_digest = sponge([x for d in cs.tree.cap for x in d] + [n])
    vkey = VerifierOnlyCircuitData(constants_sigmas_cap=cs.tree.cap, circuit_digest=circuit_digest)

    # 2. transcript: betas, gammas ----------------------------------------
    pi_hash = sponge(fixture.public_inputs)
    d = Duplex()
    d.absorb_digest(circuit_digest)
    d.absorb_digest(pi_hash)
    d.absorb_cap(wires.tree.cap)
    betas = d.squeeze_n(r)
    gammas = d.squeeze_n(r)
    deltas: List = []
    if common.num_lookup_polys > 0:
        extra = d.squeeze_n(2 * r)
        from ..golden.challenges import LookupDelta

        all4 = betas + gammas + extra
        deltas = [LookupDelta(*all4[i : i + 4]) for i in range(0, len(all4), 4)]

    # 3. partial products (+ lookup running sums) --------------------------
    pp_columns, n_z = compute_partial_product_columns(fixture, betas, gammas)
    if common.num_lookup_polys > 0:
        pp_columns = pp_columns + compute_lookup_columns(fixture, deltas)
    pps = _commit(pp_columns, rate_bits, cap_h)
    d.absorb_cap(pps.tree.cap)
    alphas = d.squeeze_n(r)

    # 4. quotient ----------------------------------------------------------
    challenges_ns = SimpleNamespace(
        betas=betas,
        gammas=gammas,
        alphas=alphas,
        deltas=deltas,
        zeta=None,
        public_inputs_hash=pi_hash,
        fri=None,
    )
    lde_points = [gf.fmul(gf.MULT_GEN, w) for w in gf.powers(gf.subgroup_generator(lde_bits), lde_n)]
    next_shift = 1 << rate_bits  # z(omega*x) is `2^rate_bits` LDE rows ahead

    n_const_cols = len(fixture.constant_columns)
    quotient_values: List[List[int]] = [[0] * lde_n for _ in range(r)]
    for i in range(lde_n):
        row = cs.lde_rows[i]
        wrow = wires.lde_rows[i]
        prow = pps.lde_rows[i]
        prow_next = pps.lde_rows[(i + next_shift) % lde_n]
        openings_pt = OpeningSet(
            constants=[(v, 0) for v in row[:n_const_cols]],
            plonk_sigmas=[(v, 0) for v in row[n_const_cols:]],
            wires=[(v, 0) for v in wrow],
            plonk_zs=[(v, 0) for v in prow[:n_z]],
            plonk_zs_next=[(v, 0) for v in prow_next[:n_z]],
            partial_products=[(v, 0) for v in prow[n_z : n_z + r * common.num_partial_products]],
            quotient_polys=[],
            lookup_zs=[(v, 0) for v in prow[n_z + r * common.num_partial_products :]],
            lookup_zs_next=[(v, 0) for v in prow_next[n_z + r * common.num_partial_products :]],
        )
        x = lde_points[i]
        cons = eval_all_plonk_constraints(common, openings_pt, _point_challenges(challenges_ns, x))
        zh = (gf.fpow(x, n) - 1) % gf.P
        zh_inv = gf.finv(zh)
        for ri, alpha in enumerate(alphas):
            acc = gf.combine_with_powers_of_alpha(alpha, cons)
            assert acc[1] == 0, "constraint evaluation left the base field"
            quotient_values[ri][i] = acc[0] * zh_inv % gf.P

    # interpolate each round's quotient over the LDE coset, split into chunks
    quotient_col_coeffs: List[List[int]] = []
    for ri in range(r):
        shift_inv = gf.finv(gf.MULT_GEN)
        # coset IFFT: values on g*K -> coefficients
        coeffs = interpolate(quotient_values[ri])
        sp = 1
        for idx in range(len(coeffs)):
            coeffs[idx] = coeffs[idx] * sp % gf.P
            sp = gf.fmul(sp, shift_inv)
        # degree < maxdeg * n by construction; split into maxdeg chunks of n
        assert all(c == 0 for c in coeffs[maxdeg * n :]), "quotient degree too high"
        for k in range(maxdeg):
            quotient_col_coeffs.append(coeffs[k * n : (k + 1) * n])
    quot = _commit_from_coeffs(quotient_col_coeffs, lde_bits, cap_h)
    d.absorb_cap(quot.tree.cap)
    zeta = d.squeeze_ext()

    # 5. openings ----------------------------------------------------------
    omega = gf.subgroup_generator(degree_bits)
    omega_zeta = gf.escale(omega, zeta)
    zs_coeffs = pps.col_coeffs[:n_z]
    pp_coeffs = pps.col_coeffs[n_z : n_z + r * common.num_partial_products]
    lookup_coeffs = pps.col_coeffs[n_z + r * common.num_partial_products :]
    openings = OpeningSet(
        constants=[eval_poly_ext(c, zeta) for c in cs.col_coeffs[:n_const_cols]],
        plonk_sigmas=[eval_poly_ext(c, zeta) for c in cs.col_coeffs[n_const_cols:]],
        wires=[eval_poly_ext(c, zeta) for c in wires.col_coeffs],
        plonk_zs=[eval_poly_ext(c, zeta) for c in zs_coeffs],
        plonk_zs_next=[eval_poly_ext(c, omega_zeta) for c in zs_coeffs],
        partial_products=[eval_poly_ext(c, zeta) for c in pp_coeffs],
        quotient_polys=[eval_poly_ext(c, zeta) for c in quot.col_coeffs],
        lookup_zs=[eval_poly_ext(c, zeta) for c in lookup_coeffs],
        lookup_zs_next=[eval_poly_ext(c, omega_zeta) for c in lookup_coeffs],
    )

    # 6. FRI ----------------------------------------------------------------
    batch_this, batch_next = fri_opening_batches(openings)
    d.absorb_many(gf.flatten_ext(batch_this))
    d.absorb_many(gf.flatten_ext(batch_next))
    fri_alpha = d.squeeze_ext()

    # combined polynomial (combine order == transcript order elementwise;
    # cf. Plonk/FRI.hs:171-186 and Challenge/FRI.hs:46-61)
    first_batch_coeffs = (
        cs.col_coeffs[:n_const_cols]
        + cs.col_coeffs[n_const_cols:]
        + wires.col_coeffs
        + zs_coeffs
        + pp_coeffs
        + quot.col_coeffs
        + lookup_coeffs
    )
    second_batch_coeffs = zs_coeffs + lookup_coeffs

    def combine(coeff_lists: Sequence[Sequence[int]]) -> List[gf.FExt]:
        width = max(len(c) for c in coeff_lists)
        out = [gf.EXT_ZERO] * width
        ap = gf.EXT_ONE
        for cc in coeff_lists:
            for i, c in enumerate(cc):
                out[i] = gf.eadd(out[i], gf.escale(c, ap))
            ap = gf.emul(ap, fri_alpha)
        return out

    g0 = combine(first_batch_coeffs)
    g1 = combine(second_batch_coeffs)
    y0 = gf.reduce_with_powers(fri_alpha, batch_this)
    y1 = gf.reduce_with_powers(fri_alpha, batch_next)
    g0[0] = gf.esub(g0[0], y0)
    g1[0] = gf.esub(g1[0], y1)
    p0 = _synthetic_div(g0, zeta)
    p1 = _synthetic_div(g1, omega_zeta)
    m2 = len(second_batch_coeffs)
    a_m2 = gf.epow(fri_alpha, m2)
    p_coeffs = [gf.EXT_ZERO] * max(len(p0), len(p1))
    for i, c in enumerate(p0):
        p_coeffs[i] = gf.eadd(p_coeffs[i], gf.emul(a_m2, c))
    for i, c in enumerate(p1):
        p_coeffs[i] = gf.eadd(p_coeffs[i], c)

    # commit phase
    from ..golden.fri import expand_reduction_strategy

    step_arities = expand_reduction_strategy(degree_bits, cfg.fri_config.reduction_strategy)
    codeword_coeffs = p_coeffs
    shift = gf.MULT_GEN
    cur_bits = lde_bits
    commit_caps: List = []
    commit_trees: List[MerkleTree] = []
    commit_brvs: List[List[gf.FExt]] = []
    fri_betas: List[gf.FExt] = []
    for a_bits in step_arities:
        arity = 1 << a_bits
        codeword = coset_evaluate(codeword_coeffs, shift, cur_bits, ExtAlg)
        brv = gf.reverse_index_bits(codeword)
        leaves = [
            gf.flatten_ext(brv[j * arity : (j + 1) * arity]) for j in range(len(brv) // arity)
        ]
        tree = MerkleTree(leaves, min(cap_h, (cur_bits - a_bits)))
        commit_trees.append(tree)
        commit_brvs.append(brv)
        commit_caps.append(tree.cap)
        d.absorb_cap(tree.cap)
        beta = d.squeeze_ext()
        fri_betas.append(beta)
        # fold coefficients: new_c[j] = sum_k beta^k c[arity*j + k]
        new_coeffs = []
        for j in range(0, len(codeword_coeffs), arity):
            chunk = codeword_coeffs[j : j + arity]
            acc = gf.EXT_ZERO
            for c in reversed(chunk):
                acc = gf.eadd(c, gf.emul(beta, acc))
            new_coeffs.append(acc)
        codeword_coeffs = new_coeffs
        for _ in range(a_bits):
            shift = gf.fmul(shift, shift)
        cur_bits -= a_bits

    # pad to the canonical final-poly length so the transcript schedule is
    # fully determined by the circuit shape (Plonky2 sends exactly
    # 2^(degree_bits - sum(arity_bits)) coefficients)
    canonical_len = 1 << (degree_bits - sum(step_arities))
    assert len(codeword_coeffs) <= canonical_len, "final polynomial too long"
    final_poly = codeword_coeffs + [gf.EXT_ZERO] * (canonical_len - len(codeword_coeffs))
    d.absorb_many(gf.flatten_ext(final_poly))

    # grinding: find pow_witness whose response has pow_bits leading zeros
    pow_bits = cfg.fri_config.proof_of_work_bits
    mask = ((1 << pow_bits) - 1) << (64 - pow_bits) if pow_bits else 0
    if grind_hook is not None:
        pow_witness = grind_hook(copy.deepcopy(d), mask)
    else:
        pow_witness = 0
        while True:
            trial = copy.deepcopy(d)
            trial.absorb(pow_witness)
            if (trial.squeeze() & mask) == 0:
                break
            pow_witness += 1
    d.absorb(pow_witness)
    pow_response = d.squeeze()
    assert (pow_response & mask) == 0

    query_indices = [q % lde_n for q in d.squeeze_n(cfg.fri_config.num_query_rounds)]

    # query rounds
    trees = [cs, wires, pps, quot]
    rounds: List[FriQueryRound] = []
    for q in query_indices:
        evals_proofs = []
        nat = gf.reverse_bits(lde_bits, q)
        for t in trees:
            evals_proofs.append((list(t.lde_rows[nat]), MerkleProof(t.tree.prove(q))))
        steps: List[FriQueryStep] = []
        idx = q
        for a_bits, tree, brv in zip(step_arities, commit_trees, commit_brvs):
            arity = 1 << a_bits
            leaf_idx = idx >> a_bits
            evals = brv[leaf_idx * arity : (leaf_idx + 1) * arity]
            steps.append(FriQueryStep(evals=list(evals), merkle_proof=MerkleProof(tree.prove(leaf_idx))))
            idx = leaf_idx
        rounds.append(
            FriQueryRound(initial_trees_proof=FriInitialTreeProof(evals_proofs=evals_proofs), steps=steps)
        )

    fri_proof = FriProof(
        commit_phase_merkle_caps=commit_caps,
        query_round_proofs=rounds,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )
    proof = Proof(
        wires_cap=wires.tree.cap,
        plonk_zs_partial_products_cap=pps.tree.cap,
        quotient_polys_cap=quot.tree.cap,
        openings=openings,
        opening_proof=fri_proof,
    )
    return vkey, ProofWithPublicInputs(proof=proof, public_inputs=list(fixture.public_inputs))
