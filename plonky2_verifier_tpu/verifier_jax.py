"""The batched TPU verifier: one jit computation per circuit template.

Everything after host-side flattening happens on device, vmapped over the
proof batch B (and internally over the Q FRI query rounds):

1. public-input hash + transcript replay (static schedule -> lax.scan of
   Poseidon permutations) -> all Fiat-Shamir challenges, bit-exact.
2. Plonk checks at zeta: selector evaluation, L0/partial-product/gate
   constraints (levelized gate programs), alpha-combination, quotient
   equation (reference semantics: Plonk/Verifier.hs, Plonk/Vanishing.hs).
3. FRI: proof-of-work mask, 4-oracle Merkle openings, combined-quotient
   evaluation, per-step coset folding (IDFT as a scan), final-poly check
   (Plonk/FRI.hs:358-408).

All control flow is static; data-dependent bits (Merkle sibling order, cap
root selection, coset slot checks) are branch-free where/gather patterns.
The output is a per-proof verdict bitmap plus (optionally) challenge
intermediates for transcript-divergence debugging.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .compiler.gates_jax import levelize_gates, run_levelized
from .compiler.template import CircuitTemplate
from .gates import CONST, LKPSEL, PI, SEL, WIRE
from .golden import field as gf
from .golden.plonk import UNUSED_SELECTOR
from .ops import field as jf
from .ops import poseidon as jp
from .ops.field import G, GExt


def _move_axis_to_front(t, axis):
    return jax.tree.map(lambda x: jnp.moveaxis(x, axis, 0), t)


def horner_ext(values: GExt, point: GExt) -> GExt:
    """sum_i point^i values[..., i] via a reversed-order scan over the last
    axis (reduceWithPowers, Algebra/Goldilocks.hs:179-184)."""
    k = values.shape[-1]
    if k == 0:
        return jf.ext_zeros(point.shape)
    xs = _move_axis_to_front(values, -1)  # (K, ...)

    def body(acc, v):
        return v + jf.emul(point, acc), None

    init = jf.ext_zeros(values.shape[:-1])
    xs_rev = jax.tree.map(lambda x: jnp.flip(x, 0), xs)
    acc, _ = jax.lax.scan(body, init, xs_rev)
    return acc


def horner_scaled(values: GExt, scale: G) -> GExt:
    """sum_i scale^i values[..., i] with a *base-field* scale
    (combineWithPowersOfAlpha, Plonk/Vanishing.hs:52-56).

    `scale` may carry extra trailing axes (e.g. a challenge-round axis):
    values (B, K) with scale (B, r) -> result (B, r), accumulated once per
    scale lane via broadcasting."""
    extra = scale.shape[len(values.shape[:-1]) :]
    xs = _move_axis_to_front(values, -1)

    def body(acc, v):
        if extra:
            v = jax.tree.map(lambda t: t.reshape(t.shape + (1,) * len(extra)), v)
        return v + GExt(jf.mul(scale, acc.re), jf.mul(scale, acc.im)), None

    init = jf.ext_zeros(values.shape[:-1] + extra)
    xs_rev = jax.tree.map(lambda x: jnp.flip(x, 0), xs)
    acc, _ = jax.lax.scan(body, init, xs_rev)
    return acc


def _unsq(x, axis: int):
    """Insert a broadcastable singleton axis into a G/GExt tree."""
    return jax.tree.map(lambda t: jnp.expand_dims(t, axis), x)


def tree_prod_last(v: GExt) -> GExt:
    """Product over the last axis by halving (pads odd widths with 1)."""
    width = v.shape[-1]
    while width > 1:
        if width % 2:
            pad = jf.ext_constant(1, shape=v.shape[:-1] + (1,))
            v = jf.ext_concat([v, pad], axis=-1)
            width += 1
        half = width // 2
        v = jf.emul(v[..., :half], v[..., half:])
        width = half
    return v[..., 0]


def ext_sum_axis(v: GExt, axis: int) -> GExt:
    """Sum a GExt over `axis` by halving (few add instances, not a fold)."""
    v = _move_axis_to_front(v, axis)
    width = v.shape[0]
    if width == 0:
        raise ValueError("empty sum")
    while width > 1:
        if width % 2:
            v = jax.tree.map(
                lambda t: jnp.concatenate([t, jnp.zeros_like(t[:1])], axis=0), v
            )
            width += 1
        half = width // 2
        v = v[:half] + v[half:]
        width = half
    return v[0]


def sponge_rows(rows: G, width: int) -> G:
    """Rate-8 overwrite sponge over rows (..., width) via a chunk scan of
    Poseidon permutations (each a Pallas kernel on TPU).

    P2V_FUSED_HASH=1 swaps in the fully-fused chain kernel
    (ops/pallas_hash.py; state stays in VMEM across permutations). Measured
    A/B on v5e (BENCH_FUSED_r04.json): +1.4% proofs/s for ~5x the cold
    compile (156s -> 765s) — the permutation is compute-bound, not
    HBM-bound, so fusion is opt-in for long-running services only."""
    if width == 0:
        return jf.zeros(rows.shape[:-1] + (4,))
    if jp.use_pallas() and os.environ.get("P2V_FUSED_HASH") == "1":
        from .ops import pallas_hash

        return pallas_hash.sponge_rows(rows, width)
    n_chunks = -(-width // 8)
    pad = n_chunks * 8 - width
    hi = jnp.pad(rows.hi, [(0, 0)] * (rows.hi.ndim - 1) + [(0, pad)])
    lo = jnp.pad(rows.lo, [(0, 0)] * (rows.lo.ndim - 1) + [(0, pad)])
    chunks_hi = jnp.moveaxis(hi.reshape(hi.shape[:-1] + (n_chunks, 8)), -2, 0)
    chunks_lo = jnp.moveaxis(lo.reshape(lo.shape[:-1] + (n_chunks, 8)), -2, 0)
    mask = np.zeros((n_chunks, 8), dtype=bool)
    for c in range(n_chunks):
        mask[c, : min(8, width - 8 * c)] = True

    def body(state, xs):
        chi, clo, m = xs
        first8 = G(jnp.where(m, chi, state.hi[..., :8]), jnp.where(m, clo, state.lo[..., :8]))
        state = jf.concat([first8, state[..., 8:]], axis=-1)
        state = jp.permutation(state)
        return state, None

    init = jf.zeros(rows.shape[:-1] + (12,))
    state, _ = jax.lax.scan(body, init, (chunks_hi, chunks_lo, jnp.asarray(mask)))
    return state[..., :4]


def _bit_reverse(idx, bits: int):
    out = jnp.zeros_like(idx)
    for k in range(bits):
        out = out | (((idx >> k) & 1) << (bits - 1 - k))
    return out


class JaxVerifier:
    """Compiled batched verifier for one circuit template."""

    def __init__(self, tpl: CircuitTemplate, debug: bool = False):
        self.tpl = tpl
        self.debug = debug
        assert tpl.lde_bits <= 32 and tpl.pow_bits <= 32

        # static transcript schedule -> scan arrays
        sched = tpl.schedule
        n_perms = len(sched.permutes)
        self._ov_mask = np.zeros((n_perms, 12), dtype=bool)
        self._ov_idx = np.zeros((n_perms, 12), dtype=np.int32)
        for i, ov in enumerate(sched.permutes):
            for lane, pos in ov:
                self._ov_mask[i, lane] = True
                self._ov_idx[i, lane] = pos

        # one merged levelized program for all gates (single scan)
        self._gates_program = levelize_gates(
            tuple(tpl.common.gates),
            tpl.n_gate_selectors,
            tpl.n_lookup_selectors,
            tpl.n_gate_constants,
            tpl.num_wires,
        )

        self._jitted = jax.jit(self._verify)

    # -- host-side ----------------------------------------------------------
    def prepare(self, arrays: Dict[str, np.ndarray]):
        """Convert flattened uint64 host arrays into device limb arrays."""
        return {k: jf.from_u64(v) for k, v in arrays.items()}

    def __call__(self, device_arrays):
        return self._jitted(device_arrays)

    # -- transcript ---------------------------------------------------------
    def _run_transcript(self, data: G):
        B = data.shape[0]

        def body(state, xs):
            mask, idx = xs
            gathered = G(data.hi[:, idx], data.lo[:, idx])  # (B, 12)
            state = jf.where(mask[None, :], gathered, state)
            state = jp.permutation(state)
            return state, state

        init = jf.zeros((B, 12))
        _, states = jax.lax.scan(body, init, (jnp.asarray(self._ov_mask), jnp.asarray(self._ov_idx)))
        # states: (n_perms, B, 12)
        felts = {}
        for name, coords in self.tpl.schedule.challenges.items():
            felts[name] = [G(states.hi[pi][:, lane], states.lo[pi][:, lane]) for pi, lane in coords]
        return felts

    # -- main ----------------------------------------------------------------
    def _verify(self, a):
        tpl = self.tpl
        r = tpl.r
        B = a["public_inputs"].shape[0] if tpl.n_pi else a["circuit_digest"].shape[0]

        pi_hash = sponge_rows(a["public_inputs"], tpl.n_pi)

        def flat_caps(c: G) -> G:
            return c.reshape(c.shape[0], -1)

        def flat_ext(c: GExt = None, arr: G = None) -> G:
            return arr.reshape(arr.shape[0], -1)

        data = jf.concat(
            [
                a["circuit_digest"],
                pi_hash,
                flat_caps(a["cap_w"]),
                flat_caps(a["cap_zp"]),
                flat_caps(a["cap_q"]),
                flat_ext(arr=a["openings1"]),
                flat_ext(arr=a["openings2"]),
            ]
            + [flat_caps(a[f"step_cap_{s}"]) for s in range(len(tpl.steps))]
            + [flat_ext(arr=a["final_poly"]), a["pow_witness"].reshape(-1, 1)],
            axis=1,
        )
        assert data.shape[1] == tpl.schedule.n_data, (data.shape, tpl.schedule.n_data)

        ch = self._run_transcript(data)
        betas = ch["betas"]
        gammas = ch["gammas"]
        alphas = ch["alphas"]
        zeta = GExt(ch["zeta"][0], ch["zeta"][1])
        fri_alpha = GExt(ch["fri_alpha"][0], ch["fri_alpha"][1])
        fri_betas = [
            GExt(ch[f"fri_beta_{i}"][0], ch[f"fri_beta_{i}"][1]) for i in range(len(tpl.steps))
        ]
        pow_response = ch["pow_response"][0]
        qidx = jnp.stack([q.lo & np.uint32(tpl.lde_n - 1) for q in ch["query_indices"]], axis=1)
        # (B, Q) uint32; lde_n <= 2^32 so the modulo is a low-bit mask of the
        # canonical u64 (hi limb contributes multiples of 2^32).
        if tpl.lde_bits > 32:
            raise AssertionError("lde domains beyond 2^32 unsupported")

        # openings as ext views -------------------------------------------------
        o1 = GExt(
            G(a["openings1"].hi[..., 0], a["openings1"].lo[..., 0]),
            G(a["openings1"].hi[..., 1], a["openings1"].lo[..., 1]),
        )  # (B, M1)
        o2 = GExt(
            G(a["openings2"].hi[..., 0], a["openings2"].lo[..., 0]),
            G(a["openings2"].hi[..., 1], a["openings2"].lo[..., 1]),
        )
        final_poly = GExt(
            G(a["final_poly"].hi[..., 0], a["final_poly"].lo[..., 0]),
            G(a["final_poly"].hi[..., 1], a["final_poly"].lo[..., 1]),
        )  # (B, F)

        ncc = tpl.n_const_cols
        s0 = 0
        constants = o1[:, s0 : s0 + ncc]
        s0 += ncc
        sigmas = o1[:, s0 : s0 + tpl.n_sigmas]
        s0 += tpl.n_sigmas
        wires = o1[:, s0 : s0 + tpl.num_wires]
        s0 += tpl.num_wires
        zs = o1[:, s0 : s0 + tpl.n_zs]
        s0 += tpl.n_zs
        pps = o1[:, s0 : s0 + tpl.n_pp]
        s0 += tpl.n_pp
        quots = o1[:, s0 : s0 + tpl.n_quot]
        s0 += tpl.n_quot
        lookup_zs = o1[:, s0 : s0 + tpl.n_lookup]
        zs_next = o2[:, : tpl.n_zs]
        lookup_zs_next = o2[:, tpl.n_zs :]

        # lookup challenge 4-tuples = chunks of betas ++ gammas ++ deltas
        # (Challenge/Verifier.hs:82-86)
        deltas = []
        if tpl.common.num_lookup_polys > 0:
            all4 = betas + gammas + ch["deltas"]
            deltas = [tuple(all4[i : i + 4]) for i in range(0, len(all4), 4)]

        eqs_ok = self._plonk_checks(
            a, pi_hash, constants, sigmas, wires, zs, zs_next, pps, lookup_zs,
            lookup_zs_next, quots, betas, gammas, alphas, deltas, zeta
        )

        fri_ok = self._fri_checks(a, o1, o2, zeta, fri_alpha, fri_betas, pow_response, qidx, final_poly)

        ok = jnp.logical_and(eqs_ok, fri_ok)
        out = {"ok": ok, "eqs_ok": eqs_ok, "fri_ok": fri_ok}
        if self.debug:
            out["debug"] = {
                "zeta": (zeta.re.hi, zeta.re.lo, zeta.im.hi, zeta.im.lo),
                "betas": [(b.hi, b.lo) for b in betas],
                "alphas": [(x.hi, x.lo) for x in alphas],
                "fri_alpha": (fri_alpha.re.hi, fri_alpha.re.lo, fri_alpha.im.hi, fri_alpha.im.lo),
                "pow_response": (pow_response.hi, pow_response.lo),
                "query_indices": qidx,
                "pi_hash": (pi_hash.hi, pi_hash.lo),
            }
        return out

    # -- plonk --------------------------------------------------------------
    def _plonk_checks(
        self, a, pi_hash, constants, sigmas, wires, zs, zs_next, pps, lookup_zs, lookup_zs_next, quots, betas, gammas, alphas, deltas, zeta
    ):
        """All Plonk checks at zeta, with challenge rounds / gates / chunks as
        tensor axes rather than Python loops: every field op below is emitted
        once, keeping the HLO module small (XLA compile time is superlinear
        in module size) while the batched shapes carry the parallelism."""
        tpl = self.tpl
        common = tpl.common
        r = tpl.r
        n = tpl.n
        maxdeg = common.quotient_degree_factor
        B = zeta.shape[0]

        gate_sels = constants[:, : tpl.n_gate_selectors]
        lkp_sels = constants[:, tpl.n_gate_selectors : tpl.n_gate_selectors + tpl.n_lookup_selectors]
        gate_consts = constants[:, tpl.n_gate_selectors + tpl.n_lookup_selectors :]

        # L0(zeta)(z-1) -----------------------------------------------------
        zeta_n = jf.ext_pow_const(zeta, n)
        one = jf.ext_constant(1, shape=(B,))
        nval = jf.constant(n % gf.P, (B,))
        lag0 = jf.ext_div(
            zeta_n - one, GExt(jf.mul(nval, (zeta - one).re), jf.mul(nval, (zeta - one).im))
        )
        zs1 = jf.emul(_unsq(lag0, 1), zs - jf.ext_constant(1, shape=(B, 1)))  # (B, r)

        # partial products: all rounds + numer/denom in one tensor ----------
        ns = tpl.n_sigmas
        n_chunks = ns // maxdeg
        k_is = jf.from_u64(np.array(common.k_is, dtype=np.uint64))  # (ns,)
        beta_s = _unsq(jf.stack(betas, axis=1), -1)  # (B, r, 1)
        gamma_s = _unsq(jf.stack(gammas, axis=1), -1)
        routed = _unsq(wires[:, :ns], 1)  # (B, 1, ns)
        bk = jf.mul(beta_s, _unsq(_unsq(k_is, 0), 0))  # (B, r, ns)
        zeta_b = _unsq(_unsq(zeta, 1), 1)
        bz = GExt(jf.mul(bk, zeta_b.re), jf.mul(bk, zeta_b.im))
        numer = GExt(
            jf.add(jf.add(routed.re, bz.re), gamma_s), jf.add(routed.im, bz.im)
        )
        sig_b = _unsq(sigmas, 1)
        bs = GExt(jf.mul(beta_s, sig_b.re), jf.mul(beta_s, sig_b.im))
        denom = GExt(jf.add(jf.add(routed.re, bs.re), gamma_s), jf.add(routed.im, bs.im))
        nd = jf.ext_stack([numer, denom], axis=2)  # (B, r, 2, ns)
        nd = GExt(
            nd.re.reshape(B, r, 2, n_chunks, maxdeg), nd.im.reshape(B, r, 2, n_chunks, maxdeg)
        )
        prods = tree_prod_last(nd)  # (B, r, 2, n_chunks)
        pp_round = GExt(
            pps.re.reshape(B, r, common.num_partial_products),
            pps.im.reshape(B, r, common.num_partial_products),
        )
        current = jf.ext_concat(
            [_unsq(zs, -1), pp_round, _unsq(zs_next, -1)], axis=-1
        )  # (B, r, n_chunks + 1)
        pv = jf.ext_stack([current[..., :-1], current[..., 1:]], axis=2)  # (B, r, 2, n_chunks)
        pn = jf.emul(pv, prods)
        diff = pn[:, :, 0] - pn[:, :, 1]  # (B, r, n_chunks)
        pp_vec = GExt(diff.re.reshape(B, r * n_chunks), diff.im.reshape(B, r * n_chunks))

        # lookup argument ----------------------------------------------------
        lookup_vec = None
        if common.num_lookup_polys > 0:
            lookup_vec = self._lookup_checks(lkp_sels, wires, lookup_zs, lookup_zs_next, deltas)

        # gate constraints ---------------------------------------------------
        sel_values = self._eval_selectors(gate_sels)  # (B, n_gates)
        inputs = {
            SEL: gate_sels,
            LKPSEL: lkp_sels,
            CONST: gate_consts,
            WIRE: wires,
            PI: GExt(pi_hash, jf.zeros(pi_hash.shape)),
        }
        n_gc = tpl.common.num_gate_constraints
        cons_per_gate = run_levelized(self._gates_program, inputs, (B,), per_prog=True)
        cons_rows = []
        live_gates = []
        for gi, cons in enumerate(cons_per_gate):
            if cons.shape[-1] == 0:
                continue
            pad = n_gc - cons.shape[-1]
            if pad:
                cons = jax.tree.map(lambda t: jnp.pad(t, ((0, 0), (0, pad))), cons)
            cons_rows.append(cons)
            live_gates.append(gi)
        acc = jf.ext_zeros((B, n_gc))
        if cons_rows:
            cons_all = jf.ext_stack(cons_rows, axis=1)  # (B, G, n_gc)
            sel_live = sel_values[:, np.array(live_gates)]
            filt = jf.emul(_unsq(sel_live, -1), cons_all)
            acc = ext_sum_axis(filt, axis=1)

        # assemble + alpha-combine -------------------------------------------
        parts = [zs1, pp_vec] + ([lookup_vec] if lookup_vec is not None else []) + [acc]
        constraint_vec = jf.ext_concat(parts, axis=1)  # (B, K)

        alpha_s = jf.stack(alphas, axis=1)  # (B, r)
        combined = horner_scaled(constraint_vec, alpha_s)  # (B, r)
        quots_r = GExt(quots.re.reshape(B, r, maxdeg), quots.im.reshape(B, r, maxdeg))
        zeta_n_r = GExt(
            G(jnp.broadcast_to(zeta_n.re.hi[:, None], (B, r)), jnp.broadcast_to(zeta_n.re.lo[:, None], (B, r))),
            G(jnp.broadcast_to(zeta_n.im.hi[:, None], (B, r)), jnp.broadcast_to(zeta_n.im.lo[:, None], (B, r))),
        )
        q = horner_ext(quots_r, zeta_n_r)
        zn1 = zeta_n - one
        ok = jf.ext_equal(jf.emul(q, _unsq(zn1, 1)), combined)  # (B, r)
        return ok.all(axis=1)

    def _eval_selectors(self, gate_sels: GExt) -> GExt:
        """Closed-form selector values for all gates at once
        (Gate/Selector.hs:78-95): per gate, (optional UNUSED factor) times
        prod_{j in group, j != gate}(j - x). Factors are packed into a static
        (n_gates, span) constant/mask matrix and multiplied out with a
        log-depth tree product."""
        tpl = self.tpl
        si = tpl.common.selectors_info
        B = gate_sels.shape[0]
        n_gates = len(si.selector_indices)
        multi = len(si.groups) > 1
        span = max(g.end - g.start for g in si.groups) - 1 + (1 if multi else 0)
        span = max(span, 1)
        tmat = np.zeros((n_gates, span), dtype=np.uint64)
        mask = np.zeros((n_gates, span), dtype=bool)
        cols = np.array(si.selector_indices, dtype=np.int64)
        for g, grp in enumerate(si.selector_indices):
            rng = si.groups[grp]
            fs = ([UNUSED_SELECTOR] if multi else []) + [
                j for j in range(rng.start, rng.end) if j != g
            ]
            tmat[g, : len(fs)] = fs
            mask[g, : len(fs)] = True
        x = gate_sels[:, cols]  # (B, n_gates)
        consts = _unsq(jf.ext_from_u64(tmat, np.zeros_like(tmat)), 0)  # (1, n_gates, span)
        terms = jf.ext_where(
            jnp.asarray(mask),
            consts - _unsq(x, -1),
            jf.ext_constant(1, shape=(1, 1, 1)),
        )  # (B, n_gates, span)
        return tree_prod_last(terms)  # (B, n_gates)

    def _lookup_checks(self, lkp_sels: GExt, wires: GExt, lookup_zs: GExt, lookup_zs_next: GExt, deltas) -> GExt:
        """Log-derivative lookup equations (Plonk/Lookups.hs:45-132), all
        challenge rounds batched on a leading round axis. Per round the
        canonical order is [last_sldc, init_sum, init_re] ++ finals_re ++
        [re_trans] ++ interleaved (sum_trans, ldc_trans) per SLDC chunk."""
        tpl = self.tpl
        common = tpl.common
        cfg = common.config
        r = tpl.r
        B = wires.shape[0]
        nluts = common.num_luts
        num_lu = cfg.num_routed_wires // 2
        num_lut = cfg.num_routed_wires // 3
        n_sldc = common.num_lookup_polys - 1
        lu_deg = common.quotient_degree_factor - 1
        lut_deg = -(-num_lut // n_sldc)

        # challenges per round: (a, b, alpha, delta), base field (B, r)
        av = jf.stack([d[0] for d in deltas], axis=1)
        bv = jf.stack([d[1] for d in deltas], axis=1)
        alv = jf.stack([d[2] for d in deltas], axis=1)
        dlv = jf.stack([d[3] for d in deltas], axis=1)

        # lookup_zs layout per round: [RE, SLDC_0..SLDC_{n_sldc-1}]
        lz = GExt(
            lookup_zs.re.reshape(B, r, common.num_lookup_polys),
            lookup_zs.im.reshape(B, r, common.num_lookup_polys),
        )
        lzn = GExt(
            lookup_zs_next.re.reshape(B, r, common.num_lookup_polys),
            lookup_zs_next.im.reshape(B, r, common.num_lookup_polys),
        )
        re_o, sldc = lz[..., 0], lz[..., 1:]
        re_next, sldc_next = lzn[..., 0], lzn[..., 1:]

        def sel(i: int, rank: int = 2) -> GExt:
            """Selector opening reshaped to (B, 1, ..., 1) for rank-`rank` use."""
            s = lkp_sels[:, i]
            return jax.tree.map(lambda t: t.reshape((B,) + (1,) * (rank - 1)), s)

        pairs_in = _unsq(wires[:, 0 : 2 * num_lu : 2], 1)  # (B, 1, num_lu)
        pairs_out = _unsq(wires[:, 1 : 2 * num_lu : 2], 1)
        trip_in = _unsq(wires[:, 0 : 3 * num_lut : 3], 1)  # (B, 1, num_lut)
        trip_out = _unsq(wires[:, 1 : 3 * num_lut : 3], 1)
        trip_mult = _unsq(wires[:, 2 : 3 * num_lut : 3], 1)

        def combo(inp: GExt, out: GExt, c: G) -> GExt:
            c = _unsq(c, -1)  # (B, r, 1)
            return GExt(
                jf.add(inp.re, jf.mul(c, out.re)), jf.add(inp.im, jf.mul(c, out.im))
            )  # (B, r, slots)

        lu_combos = combo(pairs_in, pairs_out, av)
        lut_combos_a = combo(trip_in, trip_out, av)
        lut_combos_b = combo(trip_in, trip_out, bv)

        alpha_e = GExt(_unsq(alv, -1), jf.zeros((B, r, 1)))

        def chunked_terms(combos: GExt, deg: int, slots: int):
            """(terms, weights_mask): terms (B, r, n_sldc, deg) = alpha-combo,
            padded with 1; mask marks real slots."""
            pad = n_sldc * deg - slots
            t = alpha_e - combos  # (B, r, slots)
            if pad:
                t = jf.ext_concat(
                    [t, jf.ext_constant(1, shape=(B, r, pad))], axis=-1
                )
            t = GExt(t.re.reshape(B, r, n_sldc, deg), t.im.reshape(B, r, n_sldc, deg))
            m = np.zeros((n_sldc, deg), dtype=bool)
            m.reshape(-1)[:slots] = True
            return t, m

        lu_terms, lu_mask = chunked_terms(lu_combos, lu_deg, num_lu)
        lut_terms, lut_mask = chunked_terms(lut_combos_a, lut_deg, num_lut)

        def loo(terms: GExt, deg: int):
            """(full product, leave-one-out products) over the last axis via
            exclusive prefix/suffix product scans: prod (B,r,C), loo
            (B,r,C,deg). Scans (not unrolled multiply chains): XLA:CPU's
            loop fusion inlines an unrolled chain once per consumer of the
            stacked result, and LLVM then faces exponentially duplicated
            expression trees (>9 min codegen on the gate-zoo template); a
            scan materializes each step once."""
            xs = _move_axis_to_front(terms, -1)  # (deg, B, r, C)
            one = jf.ext_constant(1, shape=terms.shape[:-1])

            def step(acc, t):
                return jf.emul(acc, t), acc  # ys are EXCLUSIVE products

            full, pre = jax.lax.scan(step, one, xs)  # pre[i] = prod_{j<i}
            xs_rev = jax.tree.map(lambda x: jnp.flip(x, 0), xs)
            _, suf_r = jax.lax.scan(step, one, xs_rev)
            suf = jax.tree.map(lambda x: jnp.flip(x, 0), suf_r)  # prod_{j>i}
            loo_v = jf.emul(pre, suf)  # (deg, B, r, C)
            return full, jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), loo_v)

        lu_prod, lu_loo = loo(lu_terms, lu_deg)
        lut_prod, lut_loo = loo(lut_terms, lut_deg)
        # masked leave-one-out sums: padded slots contribute 0
        lu_sum = ext_sum_axis(
            jf.ext_where(jnp.asarray(lu_mask), lu_loo, jf.ext_zeros((1, 1, 1, 1))), -1
        )
        mult_pad = n_sldc * lut_deg - num_lut
        mults = trip_mult
        if mult_pad:
            mults = jf.ext_concat([mults, jf.ext_zeros((B, 1, mult_pad))], axis=-1)
        mults = GExt(
            G(
                mults.re.hi.reshape(B, 1, n_sldc, lut_deg),
                mults.re.lo.reshape(B, 1, n_sldc, lut_deg),
            ),
            G(
                mults.im.hi.reshape(B, 1, n_sldc, lut_deg),
                mults.im.lo.reshape(B, 1, n_sldc, lut_deg),
            ),
        )
        lut_sum = ext_sum_axis(
            jf.ext_where(jnp.asarray(lut_mask), jf.emul(mults, lut_loo), jf.ext_zeros((1, 1, 1, 1))),
            -1,
        )

        # transitions: prev of chunk 0 is SLDC_last(omega x)
        prev = jf.ext_concat([_unsq(sldc_next[..., -1], -1), sldc[..., :-1]], axis=-1)
        dmin = sldc - prev  # (B, r, n_sldc)
        eq_sum_t = jf.emul(sel(0, 3), jf.emul(lut_prod, dmin) - lut_sum)  # TransSre
        eq_ldc_t = jf.emul(sel(1, 3), jf.emul(lu_prod, dmin) + lu_sum)  # TransLdc
        # interleave (sum, ldc) per chunk -> (B, r, 2*n_sldc)
        inter = jf.ext_stack([eq_sum_t, eq_ldc_t], axis=-1)
        inter = GExt(inter.re.reshape(B, r, 2 * n_sldc), inter.im.reshape(B, r, 2 * n_sldc))

        # RE transition: re - (delta-Horner from re_next over combos_B)
        def re_scan(acc, v):
            return GExt(
                jf.add(jf.mul(dlv, acc.re), v.re), jf.add(jf.mul(dlv, acc.im), v.im)
            ), None

        combos_b_f = _move_axis_to_front(lut_combos_b, -1)  # (num_lut, B, r)
        cur_sum, _ = jax.lax.scan(re_scan, re_next, combos_b_f)
        eq_re_t = jf.emul(sel(0), re_o - cur_sum)  # (B, r)

        # final RE per LUT: evaluate the padded table polynomial at delta —
        # coefficients are static, so it is two base-field Horner scans
        eq_finals = []
        for k, table in enumerate(common.luts):
            lut_nrows = -(-len(table) // num_lut)
            padded = list(table) + [table[0]] * (lut_nrows * num_lut - len(table))
            ins = np.array([t[0] for t in padded], dtype=np.uint64)
            outs = np.array([t[1] for t in padded], dtype=np.uint64)

            def horner_pair(coeffs):
                def body(acc, c):
                    return jf.add(jf.mul(dlv, acc), c.broadcast_to(acc.shape)), None

                acc0 = jf.zeros((B, r))
                acc, _ = jax.lax.scan(body, acc0, jf.from_u64(coeffs))
                return acc

            expected = jf.add(horner_pair(ins), jf.mul(bv, horner_pair(outs)))  # (B, r)
            eq_finals.append(jf.emul(sel(4 + k), re_o - GExt(expected, jf.zeros((B, r)))))

        eq_last = jf.emul(sel(3), sldc[..., -1])  # LastLdc
        eq_ini_sum = jf.emul(sel(2), sldc[..., 0])  # InitSre
        eq_ini_re = jf.emul(sel(2), re_o)

        per_round = jf.ext_concat(
            [_unsq(eq_last, -1), _unsq(eq_ini_sum, -1), _unsq(eq_ini_re, -1)]
            + [_unsq(e, -1) for e in eq_finals]
            + [_unsq(eq_re_t, -1), inter],
            axis=-1,
        )  # (B, r, 4 + nluts + 2*n_sldc)
        k_round = per_round.shape[-1]
        return GExt(
            per_round.re.reshape(B, r * k_round), per_round.im.reshape(B, r * k_round)
        )

    # -- FRI ----------------------------------------------------------------
    def _fri_checks(self, a, o1, o2, zeta, fri_alpha, fri_betas, pow_response, qidx, final_poly):
        tpl = self.tpl
        common = tpl.common
        B, Q = qidx.shape
        r = tpl.r

        # proof of work
        if tpl.pow_bits:
            pow_ok = (pow_response.hi >> np.uint32(32 - tpl.pow_bits)) == 0
        else:
            pow_ok = jnp.ones((B,), dtype=bool)

        # reduced openings
        y0 = horner_ext(o1, fri_alpha)  # (B,)
        y1 = horner_ext(o2, fri_alpha)

        # initial tree checks ------------------------------------------------
        # the 4 oracle paths share length and digest width, so they walk as
        # ONE batched scan on a stacked (B, 4, Q, ...) axis (4x fewer scan
        # bodies in the module => faster XLA compiles); only the leaf sponges
        # stay separate (row widths differ per oracle).
        caps = [a["cap_cs"], a["cap_w"], a["cap_zp"], a["cap_q"]]
        digests = jf.stack(
            [sponge_rows(a[f"leaves_{o}"], tpl.oracle_widths[o]) for o in range(4)], axis=1
        )  # (B, 4, Q, 4)
        sibs = jf.stack([a[f"sibs_{o}"] for o in range(4)], axis=1)  # (B, 4, Q, L, 4)
        cap_b = jf.stack(
            [
                G(
                    jnp.broadcast_to(c.hi[:, None], (B, Q) + c.hi.shape[1:]),
                    jnp.broadcast_to(c.lo[:, None], (B, Q) + c.lo.shape[1:]),
                )
                for c in caps
            ],
            axis=1,
        )  # (B, 4, Q, cap, 4)
        idx4 = jnp.broadcast_to(qidx[:, None], (B, 4, Q))
        ok4 = self._merkle_batched(digests, idx4, sibs, cap_b, tpl.initial_path_len)
        merkle_ok = ok4.all(axis=1)  # (B, Q)

        # combineInitial ------------------------------------------------------
        npp = -(-tpl.n_sigmas // common.quotient_degree_factor)
        w_c, w_w, w_p, w_q = tpl.oracle_widths
        pp_leaf = a["leaves_2"]
        oracle_pp = pp_leaf[..., : r * npp]
        oracle_lookup = pp_leaf[..., r * npp :]
        first_batch = jf.concat(
            [a["leaves_0"], a["leaves_1"], oracle_pp, a["leaves_3"], oracle_lookup], axis=-1
        )  # (B, Q, M1)
        second_batch = jf.concat([oracle_pp[..., :r], oracle_lookup], axis=-1)
        g0 = horner_ext(GExt(first_batch, jf.zeros(first_batch.shape)), self._bq(fri_alpha, Q))
        g1 = horner_ext(GExt(second_batch, jf.zeros(second_batch.shape)), self._bq(fri_alpha, Q))

        eta = jf.constant(tpl.g_lde, (B, Q))
        rev_idx = _bit_reverse(qidx, tpl.lde_bits)
        point_x = GExt(
            jf.mul(jf.constant(gf.MULT_GEN, (B, Q)), jf.pow_dynamic(eta, rev_idx, tpl.lde_bits)),
            jf.zeros((B, Q)),
        )
        zeta_bq = self._bq(zeta, Q)
        omega_zeta = GExt(
            jf.mul(jf.constant(tpl.g_small, (B, Q)), zeta_bq.re),
            jf.mul(jf.constant(tpl.g_small, (B, Q)), zeta_bq.im),
        )
        one_div = jf.ext_div(g0 - self._bq(y0, Q), point_x - zeta_bq)
        two_div = jf.ext_div(g1 - self._bq(y1, Q), point_x - omega_zeta)
        m2 = tpl.n_zs + tpl.n_lookup
        alpha_m2 = jf.ext_pow_const(self._bq(fri_alpha, Q), m2)
        eval_cur = jf.emul(alpha_m2, one_div) + two_div  # (B, Q)

        # folding -------------------------------------------------------------
        fold_ok = jnp.ones((B, Q), dtype=bool)
        idx = qidx
        for s, st in enumerate(tpl.steps):
            abits = st["arity_bits"]
            arity = 1 << abits
            evals = a[f"step_evals_{s}"]  # (B, Q, A, 2) limb pairs
            evals_ext = GExt(
                G(evals.hi[..., 0], evals.lo[..., 0]), G(evals.hi[..., 1], evals.lo[..., 1])
            )  # (B, Q, A)
            # Merkle check of the flattened coset leaf
            leaf_row = evals.reshape(B, Q, 2 * arity)
            digest = sponge_rows(leaf_row, 2 * arity)
            new_idx = idx >> abits
            cap = a[f"step_cap_{s}"]
            cap_b = G(
                jnp.broadcast_to(cap.hi[:, None], (B, Q) + cap.hi.shape[1:]),
                jnp.broadcast_to(cap.lo[:, None], (B, Q) + cap.lo.shape[1:]),
            )
            ok_m = self._merkle_batched(digest, new_idx, a[f"step_sibs_{s}"], cap_b, st["path_len"])
            # eval matches opened coset slot
            slot = (idx & np.uint32(arity - 1)).astype(jnp.int32)
            opened = GExt(
                G(
                    jnp.take_along_axis(evals_ext.re.hi, slot[..., None], axis=-1)[..., 0],
                    jnp.take_along_axis(evals_ext.re.lo, slot[..., None], axis=-1)[..., 0],
                ),
                G(
                    jnp.take_along_axis(evals_ext.im.hi, slot[..., None], axis=-1)[..., 0],
                    jnp.take_along_axis(evals_ext.im.lo, slot[..., None], axis=-1)[..., 0],
                ),
            )
            ok_e = jf.ext_equal(opened, eval_cur)
            fold_ok = jnp.logical_and(fold_ok, jnp.logical_and(ok_m, ok_e))

            # coset fold: values to subgroup order, offset, IDFT, beta-Horner
            perm = np.array([gf.reverse_bits(abits, i) for i in range(arity)], dtype=np.int32)
            vals = evals_ext[..., perm]  # subgroup order
            bits_lvl = st["codeword_bits"]
            start = _bit_reverse((idx >> abits) << abits, bits_lvl)
            offset = jf.mul(
                jf.constant(tpl.level_shifts[s], (B, Q)),
                jf.pow_dynamic(jf.constant(gf.subgroup_generator(bits_lvl), (B, Q)), start, bits_lvl),
            )
            # y'_k = sum_j omega^{-jk} v_j : A scan steps over j
            omega_inv = gf.finv(gf.subgroup_generator(abits))
            wmat = np.zeros((arity, arity), dtype=np.uint64)
            for k in range(arity):
                for j in range(arity):
                    wmat[k, j] = gf.fpow(omega_inv, j * k)

            def idft_body(acc, xs):
                v_re_hi, v_re_lo, v_im_hi, v_im_lo, w_hi, w_lo = xs
                # v: (B, Q) ext; w: (A,) base consts -> broadcast outer
                w = G(
                    jnp.broadcast_to(w_hi[None, None, :], (B, Q, arity)),
                    jnp.broadcast_to(w_lo[None, None, :], (B, Q, arity)),
                )
                v = GExt(
                    G(
                        jnp.broadcast_to(v_re_hi[..., None], (B, Q, arity)),
                        jnp.broadcast_to(v_re_lo[..., None], (B, Q, arity)),
                    ),
                    G(
                        jnp.broadcast_to(v_im_hi[..., None], (B, Q, arity)),
                        jnp.broadcast_to(v_im_lo[..., None], (B, Q, arity)),
                    ),
                )
                term = GExt(jf.mul(w, v.re), jf.mul(w, v.im))
                return acc + term, None

            wmat_cols = wmat.T  # [j] -> omega^{-jk} over k
            xs = (
                jnp.moveaxis(vals.re.hi, -1, 0),
                jnp.moveaxis(vals.re.lo, -1, 0),
                jnp.moveaxis(vals.im.hi, -1, 0),
                jnp.moveaxis(vals.im.lo, -1, 0),
                jnp.asarray((wmat_cols >> np.uint64(32)).astype(np.uint32)),
                jnp.asarray(wmat_cols.astype(np.uint32)),
            )
            acc0 = jf.ext_zeros((B, Q, arity))
            yprime, _ = jax.lax.scan(idft_body, acc0, xs)
            # y_k = (1/A) * offset^{-k} * y'_k
            off_inv = jf.inv(offset)
            # powers 0..A-1 of off_inv by log-doubling: [p] -> [p, p*x^k]
            pows = jf.constant(1, (B, Q, 1))
            cur = off_inv
            while pows.shape[-1] < arity:
                cur_b = G(cur.hi[..., None], cur.lo[..., None])
                pows = jf.concat([pows, jf.mul(pows, cur_b)], axis=-1)
                if pows.shape[-1] < arity:
                    cur = jf.square(cur)
            pows = pows[..., :arity]  # (B, Q, A)
            ys = GExt(jf.mul(pows, yprime.re), jf.mul(pows, yprime.im))
            inv_arity = jf.constant(gf.finv(arity % gf.P), (B, Q))
            folded = horner_ext(ys, self._bq2(fri_betas[s], (B, Q)))
            eval_cur = GExt(jf.mul(inv_arity, folded.re), jf.mul(inv_arity, folded.im))
            idx = new_idx

        # final poly ----------------------------------------------------------
        x_final = jf.mul(
            jf.constant(tpl.level_shifts[len(tpl.steps)], (B, Q)),
            jf.pow_dynamic(
                jf.constant(gf.subgroup_generator(tpl.final_bits), (B, Q)),
                _bit_reverse(idx, tpl.final_bits),
                max(tpl.final_bits, 1),
            ),
        )
        fp_b = GExt(
            G(
                jnp.broadcast_to(final_poly.re.hi[:, None, :], (B, Q, tpl.final_poly_len)),
                jnp.broadcast_to(final_poly.re.lo[:, None, :], (B, Q, tpl.final_poly_len)),
            ),
            G(
                jnp.broadcast_to(final_poly.im.hi[:, None, :], (B, Q, tpl.final_poly_len)),
                jnp.broadcast_to(final_poly.im.lo[:, None, :], (B, Q, tpl.final_poly_len)),
            ),
        )
        final_eval = horner_ext(fp_b, GExt(x_final, jf.zeros((B, Q))))
        final_ok = jf.ext_equal(final_eval, eval_cur)

        round_ok = jnp.logical_and(jnp.logical_and(merkle_ok, fold_ok), final_ok)
        return jnp.logical_and(pow_ok, round_ok.all(axis=1))

    # helpers ---------------------------------------------------------------
    @staticmethod
    def _bq(x, Q: int):
        """Broadcast a (B,)-shaped G/GExt to (B, Q)."""
        if isinstance(x, GExt):
            return GExt(JaxVerifier._bq(x.re, Q), JaxVerifier._bq(x.im, Q))
        return G(
            jnp.broadcast_to(x.hi[:, None], x.hi.shape[:1] + (Q,)),
            jnp.broadcast_to(x.lo[:, None], x.lo.shape[:1] + (Q,)),
        )

    @staticmethod
    def _bq2(x, shape):
        if isinstance(x, GExt):
            return GExt(JaxVerifier._bq2(x.re, shape), JaxVerifier._bq2(x.im, shape))
        return G(
            jnp.broadcast_to(x.hi[:, None], shape), jnp.broadcast_to(x.lo[:, None], shape)
        )

    @staticmethod
    def _merkle_batched(digest: G, index, sibs: G, cap: G, path_len: int):
        """digest (B,Q,4), index (B,Q), sibs (B,Q,L,4), cap (B,Q,cap,4).
        P2V_FUSED_HASH=1 runs the L-level walk as one fused Pallas kernel
        (see sponge_rows for the measured trade-off)."""
        if path_len == 0:
            cur = digest
        elif jp.use_pallas() and os.environ.get("P2V_FUSED_HASH") == "1":
            from .ops import pallas_hash

            cur = pallas_hash.merkle_fold(digest, index, sibs, path_len)
        else:
            sibs_f = _move_axis_to_front(sibs, -2)
            bits = jnp.stack([(index >> l) & 1 for l in range(path_len)])

            def body(c, xs):
                sib, bit = xs
                is_left = (bit == 0)[..., None]
                left = jf.where(is_left, c, sib)
                right = jf.where(is_left, sib, c)
                return jp.compress(left, right), None

            cur, _ = jax.lax.scan(body, digest, (sibs_f, bits))
        residual = (index >> path_len).astype(jnp.int32)
        root = G(
            jnp.take_along_axis(cap.hi, residual[..., None, None], axis=-2)[..., 0, :],
            jnp.take_along_axis(cap.lo, residual[..., None, None], axis=-2)[..., 0, :],
        )
        return jf.equal(cur, root).all(axis=-1)


def verify_batch(tpl: CircuitTemplate, arrays: Dict[str, np.ndarray], debug: bool = False):
    v = JaxVerifier(tpl, debug=debug)
    dev = v.prepare(arrays)
    return v(dev)
