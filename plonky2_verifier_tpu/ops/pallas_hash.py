"""Fused Pallas TPU kernels for the verifier's Poseidon *chains*.

The per-call Pallas permutation (ops/pallas_poseidon.py) still pays one HBM
round-trip of the state per permutation because the sponge/Merkle loops live
in XLA between calls. The two kernels here move the whole chain into VMEM:

- sponge_rows: the rate-8 overwrite sponge over statically-sized rows
  (Hash/Sponge.hs:18-31). All ceil(width/8) chunk overwrites + permutations
  of a row run in one kernel program; the row streams from HBM exactly once
  and the 12-lane state never leaves VMEM.

- merkle_fold: the full Merkle path walk (Hash/Merkle.hs:30-37): per level,
  branch-free sibling ordering by the index bit, then the 2-to-1 compress
  permutation — L levels fused, siblings stream once, state stays in VMEM.
  The cap-row compare stays outside (it is a gather over a tiny array).

Layout matches the permutation kernel: lane-major (12, N) uint32 limb
planes so the batch rides the 128-wide vector lanes. Two Mosaic constraints
shape the code: (a) the chain loops are lax.fori_loop so the compiler sees
ONE permutation body per kernel (a fully-unrolled ceil(135/8) x 30-round
straight-line program made kernel compiles pathological); (b) dynamic
sublane offsets must be 8-aligned, so chunk/sibling planes are padded to
8-row groups host-side and path bits derive from the index in-kernel.

Bit-exact vs the golden model on real TPU: tools/check_hash_kernels.py
(HASH_KERNELS_r{N}.json); A/B throughput: tools/bench_poseidon.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import field as jf
from .field import G, U32
from .pallas_poseidon import HAVE_PALLAS, _rc_planes, _rounds
from ..golden.poseidon_constants import MDS_DIAG

if HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

WIDTH = 12
BLOCK = 512


def _consts():
    rc_hi, rc_lo = _rc_planes()
    diag = np.array(MDS_DIAG, dtype=np.uint32).reshape(WIDTH, 1)
    return jnp.asarray(rc_hi), jnp.asarray(rc_lo), jnp.asarray(diag)


def _const_specs():
    rc_spec = pl.BlockSpec((30, WIDTH, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    diag_spec = pl.BlockSpec((WIDTH, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return [rc_spec, rc_spec, diag_spec]


def _to_lane_major(x: G, feat: int, block: int):
    """(..., feat) -> padded (feat, total) planes + (n, total)."""
    shape = x.shape
    n = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    hi = x.hi.reshape(n, feat).T
    lo = x.lo.reshape(n, feat).T
    n_pad = -n % block
    if n_pad:
        hi = jnp.pad(hi, ((0, 0), (0, n_pad)))
        lo = jnp.pad(lo, ((0, 0), (0, n_pad)))
    return hi, lo, n, n + n_pad


# ---------------------------------------------------------------------------
# fused sponge


def _sponge_kernel(width, rc_hi_ref, rc_lo_ref, diag_ref, rows_hi_ref, rows_lo_ref, out_hi_ref, out_lo_ref):
    block = rows_hi_ref.shape[1]
    diag = diag_ref[:]
    s = G(jnp.zeros((WIDTH, block), U32), jnp.zeros((WIDTH, block), U32))
    n_full = width // 8
    tail = width - 8 * n_full

    def body(c, carry):
        hi, lo = carry
        s = G(
            jnp.concatenate([rows_hi_ref[pl.ds(c * 8, 8), :], hi[8:]], axis=0),
            jnp.concatenate([rows_lo_ref[pl.ds(c * 8, 8), :], lo[8:]], axis=0),
        )
        s = _rounds(s, rc_hi_ref, rc_lo_ref, diag)
        return s.hi, s.lo

    if n_full:
        hi, lo = jax.lax.fori_loop(0, n_full, body, (s.hi, s.lo))
        s = G(hi, lo)
    if tail:  # partial last chunk: rows plane is padded to 8-row groups, so
        # the load stays aligned; overwrite only the first `tail` lanes.
        chunk_hi = rows_hi_ref[8 * n_full : 8 * n_full + 8, :]
        chunk_lo = rows_lo_ref[8 * n_full : 8 * n_full + 8, :]
        s = G(
            jnp.concatenate([chunk_hi[:tail], s.hi[tail:]], axis=0),
            jnp.concatenate([chunk_lo[:tail], s.lo[tail:]], axis=0),
        )
        s = _rounds(s, rc_hi_ref, rc_lo_ref, diag)
    out_hi_ref[:] = s.hi[:4]
    out_lo_ref[:] = s.lo[:4]


@partial(jax.jit, static_argnames=("width", "block", "interpret"))
def sponge_rows(rows: G, width: int, block: int = BLOCK, interpret: bool = False) -> G:
    """Fused drop-in for verifier_jax.sponge_rows: (..., width) -> (..., 4)."""
    if width == 0:
        return jf.zeros(rows.shape[:-1] + (4,))
    hi, lo, n, total = _to_lane_major(rows, width, block)
    w8 = -(-width // 8) * 8
    if w8 != width:  # pad the feature axis to full 8-row chunks
        hi = jnp.pad(hi, ((0, w8 - width), (0, 0)))
        lo = jnp.pad(lo, ((0, w8 - width), (0, 0)))
    grid = (total // block,)
    row_spec = pl.BlockSpec((w8, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((4, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_hi, out_lo = pl.pallas_call(
        partial(_sponge_kernel, width),
        grid=grid,
        in_specs=_const_specs() + [row_spec, row_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((4, total), U32),
            jax.ShapeDtypeStruct((4, total), U32),
        ],
        interpret=interpret,
    )(*_consts(), hi, lo)
    out_shape = rows.shape[:-1] + (4,)
    return G(out_hi[:, :n].T.reshape(out_shape), out_lo[:, :n].T.reshape(out_shape))


# ---------------------------------------------------------------------------
# fused Merkle walk


def _merkle_kernel(path_len, rc_hi_ref, rc_lo_ref, diag_ref, dig_hi_ref, dig_lo_ref, sib_hi_ref, sib_lo_ref, idx_ref, out_hi_ref, out_lo_ref):
    diag = diag_ref[:]
    block = dig_hi_ref.shape[1]
    zero = jnp.zeros((4, block), U32)
    idx = idx_ref[0:1, :]  # (1, block) uint32

    def body(l, carry):
        chi, clo = carry
        # siblings live in 8-row groups (rows 8l..8l+3) for aligned loads
        sib8_hi = sib_hi_ref[pl.ds(8 * l, 8), :]
        sib8_lo = sib_lo_ref[pl.ds(8 * l, 8), :]
        sib = G(sib8_hi[:4], sib8_lo[:4])
        is_left = ((idx >> l.astype(U32)) & 1) == 0  # (1, block), broadcasts
        left = G(jnp.where(is_left, chi, sib.hi), jnp.where(is_left, clo, sib.lo))
        right = G(jnp.where(is_left, sib.hi, chi), jnp.where(is_left, sib.lo, clo))
        s = G(
            jnp.concatenate([left.hi, right.hi, zero], axis=0),
            jnp.concatenate([left.lo, right.lo, zero], axis=0),
        )
        s = _rounds(s, rc_hi_ref, rc_lo_ref, diag)
        return s.hi[:4], s.lo[:4]

    hi, lo = jax.lax.fori_loop(0, path_len, body, (dig_hi_ref[:], dig_lo_ref[:]))
    out_hi_ref[:] = hi
    out_lo_ref[:] = lo


@partial(jax.jit, static_argnames=("path_len", "block", "interpret"))
def merkle_fold(digest: G, index, sibs: G, path_len: int, block: int = BLOCK, interpret: bool = False) -> G:
    """Walk the path; returns the reconstructed root digest (..., 4).
    digest (..., 4), index (...,) uint32, sibs (..., path_len, 4)."""
    if path_len == 0:
        return digest
    batch_shape = digest.shape[:-1]
    dig_hi, dig_lo, n, total = _to_lane_major(digest, 4, block)
    # pad each sibling digest 4 -> 8 rows so level loads are 8-aligned
    pad8 = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, 4)])
    sibs8 = G(pad8(sibs.hi), pad8(sibs.lo))  # (..., L, 8)
    sibs_flat = sibs8.reshape(sibs8.shape[:-2] + (path_len * 8,))
    sib_hi, sib_lo, _, _ = _to_lane_major(sibs_flat, path_len * 8, block)
    idx_plane = index.reshape(-1)[None, :].astype(U32)  # (1, n)
    if total != n:
        idx_plane = jnp.pad(idx_plane, ((0, 0), (0, total - n)))
    grid = (total // block,)
    dig_spec = pl.BlockSpec((4, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    sib_spec = pl.BlockSpec((path_len * 8, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_hi, out_lo = pl.pallas_call(
        partial(_merkle_kernel, path_len),
        grid=grid,
        in_specs=_const_specs() + [dig_spec, dig_spec, sib_spec, sib_spec, idx_spec],
        out_specs=[dig_spec, dig_spec],
        out_shape=[
            jax.ShapeDtypeStruct((4, total), U32),
            jax.ShapeDtypeStruct((4, total), U32),
        ],
        interpret=interpret,
    )(*_consts(), dig_hi, dig_lo, sib_hi, sib_lo, idx_plane)
    out_shape = batch_shape + (4,)
    return G(out_hi[:, :n].T.reshape(out_shape), out_lo[:, :n].T.reshape(out_shape))
