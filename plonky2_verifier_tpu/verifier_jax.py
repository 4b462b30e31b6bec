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

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .compiler.gates_jax import levelize_gate, run_levelized
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
    (combineWithPowersOfAlpha, Plonk/Vanishing.hs:52-56)."""
    xs = _move_axis_to_front(values, -1)

    def body(acc, v):
        return v + GExt(jf.mul(scale, acc.re), jf.mul(scale, acc.im)), None

    init = jf.ext_zeros(values.shape[:-1])
    xs_rev = jax.tree.map(lambda x: jnp.flip(x, 0), xs)
    acc, _ = jax.lax.scan(body, init, xs_rev)
    return acc


def sponge_rows(rows: G, width: int) -> G:
    """Rate-8 overwrite sponge over rows (..., width) via a chunk scan."""
    if width == 0:
        return jf.zeros(rows.shape[:-1] + (4,))
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


def merkle_walk(leaf_digest: G, index, siblings: G, cap: G, path_len: int):
    """Branch-free Merkle path walk + cap root compare. Shapes:
    leaf_digest (..., 4), index (...,) uint32, siblings (..., L, 4),
    cap (cap_len, 4) broadcast over the batch."""
    if path_len == 0:
        cur = leaf_digest
    else:
        sibs = _move_axis_to_front(siblings, -2)  # (L, ..., 4)
        bits = jnp.stack([(index >> l) & 1 for l in range(path_len)])  # (L, ...)

        def body(cur, xs):
            sib, bit = xs
            is_left = (bit == 0)[..., None]
            left = jf.where(is_left, cur, sib)
            right = jf.where(is_left, sib, cur)
            return jp.compress(left, right), None

        cur, _ = jax.lax.scan(body, leaf_digest, (sibs, bits))
    residual = (index >> path_len).astype(jnp.int32)
    root = G(cap.hi[residual], cap.lo[residual])  # gather over leading cap axis
    return jf.equal(cur, root).all(axis=-1)


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
        if tpl.common.num_lookup_polys > 0:
            raise NotImplementedError("lookup circuits land in the lookup milestone")
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

        # levelized programs per gate
        self._gate_programs = [
            levelize_gate(
                g, tpl.n_gate_selectors, tpl.n_lookup_selectors, tpl.n_gate_constants, tpl.num_wires
            )
            for g in tpl.common.gates
        ]

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
        zs_next = o2[:, : tpl.n_zs]

        eqs_ok = self._plonk_checks(
            a, pi_hash, constants, sigmas, wires, zs, zs_next, pps, quots, betas, gammas, alphas, zeta
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
        self, a, pi_hash, constants, sigmas, wires, zs, zs_next, pps, quots, betas, gammas, alphas, zeta
    ):
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
        lag0 = jf.ext_div(
            zeta_n - one,
            GExt(jf.mul(jf.constant(n % gf.P, (B,)), (zeta - one).re), jf.mul(jf.constant(n % gf.P, (B,)), (zeta - one).im)),
        )
        zs1 = jf.ext_stack([jf.emul(lag0, zs[:, i] - one) for i in range(r)], axis=1)  # (B, r)

        # partial products --------------------------------------------------
        k_is = jf.from_u64(np.array(common.k_is, dtype=np.uint64))  # (80,)
        n_chunks = tpl.n_sigmas // maxdeg  # 10
        pp_rounds = []
        for ri in range(r):
            beta = betas[ri]
            gamma = gammas[ri]
            bk = jf.mul(G(jnp.broadcast_to(beta.hi[:, None], (B, tpl.n_sigmas)), jnp.broadcast_to(beta.lo[:, None], (B, tpl.n_sigmas))), G(jnp.broadcast_to(k_is.hi, (B, tpl.n_sigmas)), jnp.broadcast_to(k_is.lo, (B, tpl.n_sigmas))))
            gamma_b = G(jnp.broadcast_to(gamma.hi[:, None], (B, tpl.n_sigmas)), jnp.broadcast_to(gamma.lo[:, None], (B, tpl.n_sigmas)))
            routed = wires[:, : tpl.n_sigmas]
            # numer = w + beta*k_i*zeta + gamma ; denom = w + beta*sigma + gamma
            zre = G(
                jnp.broadcast_to(zeta.re.hi[:, None], bk.hi.shape),
                jnp.broadcast_to(zeta.re.lo[:, None], bk.hi.shape),
            )
            zim = G(
                jnp.broadcast_to(zeta.im.hi[:, None], bk.hi.shape),
                jnp.broadcast_to(zeta.im.lo[:, None], bk.hi.shape),
            )
            bz = GExt(jf.mul(bk, zre), jf.mul(bk, zim))
            numer = GExt(
                jf.add(jf.add(routed.re, bz.re), gamma_b),
                jf.add(routed.im, bz.im),
            )
            beta_b = G(jnp.broadcast_to(beta.hi[:, None], (B, tpl.n_sigmas)), jnp.broadcast_to(beta.lo[:, None], (B, tpl.n_sigmas)))
            bs = GExt(jf.mul(beta_b, sigmas.re), jf.mul(beta_b, sigmas.im))
            denom = GExt(jf.add(jf.add(routed.re, bs.re), gamma_b), jf.add(routed.im, bs.im))

            def chunk_prod(v: GExt) -> GExt:
                v = GExt(
                    v.re.reshape(B, n_chunks, maxdeg),
                    v.im.reshape(B, n_chunks, maxdeg),
                )
                cur = v
                width = maxdeg
                while width > 1:
                    half = width // 2
                    cur = jf.emul(cur[:, :, :half], cur[:, :, half : 2 * half])
                    if width % 2:
                        cur = jf.emul(cur, GExt(G(v.re.hi[:, :, -1:], v.re.lo[:, :, -1:]), G(v.im.hi[:, :, -1:], v.im.lo[:, :, -1:])))
                    width = half
                return cur[:, :, 0]  # (B, n_chunks)

            numprod = chunk_prod(numer)
            denprod = chunk_prod(denom)
            pp_round = pps[:, ri * common.num_partial_products : (ri + 1) * common.num_partial_products]
            current = jf.ext_stack(
                [zs[:, ri]] + [pp_round[:, i] for i in range(common.num_partial_products)] + [zs_next[:, ri]],
                axis=1,
            )  # (B, n_chunks + 1)
            prev = current[:, :-1]
            nxt = current[:, 1:]
            pp_rounds.append(jf.emul(prev, numprod) - jf.emul(nxt, denprod))  # (B, n_chunks)
        pp_vec = GExt(
            G(
                jnp.concatenate([p.re.hi for p in pp_rounds], axis=1),
                jnp.concatenate([p.re.lo for p in pp_rounds], axis=1),
            ),
            G(
                jnp.concatenate([p.im.hi for p in pp_rounds], axis=1),
                jnp.concatenate([p.im.lo for p in pp_rounds], axis=1),
            ),
        )

        # gate constraints --------------------------------------------------
        sel_values = self._eval_selectors(gate_sels)  # list per gate, (B,)
        inputs = {
            SEL: gate_sels,
            LKPSEL: lkp_sels,
            CONST: gate_consts,
            WIRE: wires,
            PI: GExt(pi_hash, jf.zeros(pi_hash.shape)),
        }
        n_gc = tpl.common.num_gate_constraints
        acc = jf.ext_zeros((B, n_gc))
        for gi, lp in enumerate(self._gate_programs):
            if len(lp.out_slots) == 0:
                continue
            cons = run_levelized(lp, inputs, (B,))  # (B, n_out)
            sel = sel_values[gi]
            # filtered = sel (ext scalar) * cons (ext vector)
            sel_b_re = G(jnp.broadcast_to(sel.re.hi[:, None], cons.shape), jnp.broadcast_to(sel.re.lo[:, None], cons.shape))
            sel_b_im = G(jnp.broadcast_to(sel.im.hi[:, None], cons.shape), jnp.broadcast_to(sel.im.lo[:, None], cons.shape))
            filt = jf.emul(GExt(sel_b_re, sel_b_im), cons)
            pad = n_gc - cons.shape[-1]
            if pad:
                filt = GExt(
                    G(
                        jnp.pad(filt.re.hi, ((0, 0), (0, pad))),
                        jnp.pad(filt.re.lo, ((0, 0), (0, pad))),
                    ),
                    G(
                        jnp.pad(filt.im.hi, ((0, 0), (0, pad))),
                        jnp.pad(filt.im.lo, ((0, 0), (0, pad))),
                    ),
                )
            acc = acc + filt

        # assemble + alpha-combine ------------------------------------------
        def cat_ext(parts: List[GExt]) -> GExt:
            return GExt(
                G(
                    jnp.concatenate([p.re.hi for p in parts], axis=1),
                    jnp.concatenate([p.re.lo for p in parts], axis=1),
                ),
                G(
                    jnp.concatenate([p.im.hi for p in parts], axis=1),
                    jnp.concatenate([p.im.lo for p in parts], axis=1),
                ),
            )

        constraint_vec = cat_ext([zs1, pp_vec, acc])  # (B, K)

        oks = []
        zn1 = zeta_n - jf.ext_constant(1, shape=(B,))
        for ri in range(r):
            combined = horner_scaled(constraint_vec, alphas[ri])
            chunk = quots[:, ri * maxdeg : (ri + 1) * maxdeg]
            q = horner_ext(chunk, zeta_n)
            oks.append(jf.ext_equal(jf.emul(q, zn1), combined))
        return jnp.stack(oks, axis=1).all(axis=1)

    def _eval_selectors(self, gate_sels: GExt) -> List[GExt]:
        """Closed-form selector values per gate (Gate/Selector.hs:78-95)."""
        tpl = self.tpl
        si = tpl.common.selectors_info
        B = gate_sels.shape[0]
        out = []
        multi = len(si.groups) > 1
        for gate_idx, grp in enumerate(si.selector_indices):
            x = gate_sels[:, grp]
            rng = si.groups[grp]
            if multi:
                value = GExt(jf.constant(UNUSED_SELECTOR, (B,)), jf.zeros((B,))) - x
            else:
                value = jf.ext_constant(1, shape=(B,))
            for j in range(rng.start, rng.end):
                if j != gate_idx:
                    value = jf.emul(value, GExt(jf.constant(j, (B,)), jf.zeros((B,))) - x)
            out.append(value)
        return out

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
        caps = [a["cap_cs"], a["cap_w"], a["cap_zp"], a["cap_q"]]
        merkle_ok = jnp.ones((B, Q), dtype=bool)
        for o in range(4):
            leaves = a[f"leaves_{o}"]  # (B, Q, w)
            digest = sponge_rows(leaves, tpl.oracle_widths[o])
            cap = caps[o]  # (B, cap, 4)
            cap_b = G(
                jnp.broadcast_to(cap.hi[:, None], (B, Q) + cap.hi.shape[1:]),
                jnp.broadcast_to(cap.lo[:, None], (B, Q) + cap.lo.shape[1:]),
            )
            ok_o = self._merkle_batched(digest, qidx, a[f"sibs_{o}"], cap_b, tpl.initial_path_len)
            merkle_ok = jnp.logical_and(merkle_ok, ok_o)

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
            # powers 0..A-1 of off_inv: sequential squaring-free scan
            pw = jf.constant(1, (B, Q))
            pw_list = []
            for k in range(arity):
                pw_list.append(pw)
                if k + 1 < arity:
                    pw = jf.mul(pw, off_inv)
            pows = jf.stack([p for p in pw_list], axis=-1)  # (B, Q, A)
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
        """digest (B,Q,4), index (B,Q), sibs (B,Q,L,4), cap (B,Q,cap,4)."""
        if path_len == 0:
            cur = digest
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
