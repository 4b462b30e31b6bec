"""Fused Pallas TPU kernel for the batched Poseidon-12 permutation.

One `pallas_call` runs all 30 rounds in VMEM with zero HBM round-trips
between rounds (the jnp path scans over rounds, so its loop state crosses
the XLA while-loop boundary every round). Layout is lane-major: the state
travels as two (12, N) uint32 limb planes so the batch rides the 128-wide
vector lanes and the 12 Poseidon lanes sit on sublanes.

Kernel math mirrors ops/poseidon.py exactly (semantics per reference
Hash/Poseidon.hs:42-101):
- sbox x^7 on all 12 lanes (external rounds) or lane 0 only (internal),
  via the 2x32-limb field multiplier from ops/field.py — jnp ops compose
  inside Pallas kernels, so the verifier and the kernel share one field
  implementation;
- MDS as the circulant structure: y_i = sum_t CIRC[t] x_{(i+t) mod 12}
  (+ DIAG[i] x_i), i.e. 12 sublane rolls, each multiply-accumulated per
  16-bit limb plane in exact 32-bit integer arithmetic (max column sum
  12 * 49 * 65535 < 2^26), then one 128-bit reduction per lane.

Bit-exact vs golden.poseidon (KAT) and ops.poseidon — tests/test_pallas.py.
A/B throughput vs the jnp path: tools/bench_poseidon.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..golden.poseidon_constants import ALL_ROUND_CONSTANTS, MDS_CIRC, MDS_DIAG
from . import field as jf
from .field import G, MASK16, U32

try:  # pallas is TPU/CPU-interpret only; keep the module importable anywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

WIDTH = 12
BLOCK = 512  # batch rows per kernel program (lanes)


@lru_cache(maxsize=None)
def _rc_planes():
    rc = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, WIDTH, 1)
    return (rc >> np.uint64(32)).astype(np.uint32), rc.astype(np.uint32)


def _sbox7(x: G) -> G:
    x2 = jf.mul(x, x)
    x3 = jf.mul(x2, x)
    x4 = jf.mul(x2, x2)
    return jf.mul(x3, x4)


def _mds_rolled(state: G, diag) -> G:
    """MDS on a (12, N) state via sublane rolls + per-16-bit-limb integer
    contraction (same arithmetic as ops.poseidon._mds, restructured for the
    lane-major layout)."""
    limbs = (
        state.lo & MASK16,
        state.lo >> 16,
        state.hi & MASK16,
        state.hi >> 16,
    )
    accs = [jnp.zeros_like(limbs[0]) for _ in range(4)]
    for t in range(WIDTH):
        c = np.uint32(MDS_CIRC[t])
        if c == 0:
            continue
        for k in range(4):
            rolled = pltpu.roll(limbs[k], -t % WIDTH, 0) if t else limbs[k]
            accs[k] = accs[k] + c * rolled
    for k in range(4):
        accs[k] = accs[k] + diag * limbs[k]
    # recombine sum_k accs[k] * 2^(16k) (each acc < 2^26) into canonical form
    c = accs[0]
    w0 = c & MASK16
    c = (c >> 16) + accs[1]
    w1 = c & MASK16
    c = (c >> 16) + accs[2]
    w2 = c & MASK16
    c = (c >> 16) + accs[3]
    w3 = c & MASK16
    r = c >> 16  # < 2^10: the 2^64.. overflow word
    n0 = w0 | (w1 << 16)
    n1 = w2 | (w3 << 16)
    return jf._reduce128(jnp.zeros_like(r), r, n1, n0)


def _rounds(s: G, rc_hi_ref, rc_lo_ref, diag) -> G:
    """The 30-round permutation body on a lane-major (12, N) state; shared
    by the plain-permutation, fused-sponge and fused-Merkle kernels
    (ops/pallas_hash.py)."""
    for r in range(30):
        rc = G(rc_hi_ref[r], rc_lo_ref[r])  # (12, 1)
        s = jf.add(s, rc)
        if 4 <= r < 26:  # internal: sbox lane 0 only
            lane0 = _sbox7(G(s.hi[0:1], s.lo[0:1]))
            s = G(
                jnp.concatenate([lane0.hi, s.hi[1:]], axis=0),
                jnp.concatenate([lane0.lo, s.lo[1:]], axis=0),
            )
        else:  # external: sbox every lane
            s = _sbox7(s)
        s = _mds_rolled(s, diag)
    return s


def _poseidon_kernel(rc_hi_ref, rc_lo_ref, diag_ref, hi_ref, lo_ref, out_hi_ref, out_lo_ref):
    s = _rounds(G(hi_ref[:], lo_ref[:]), rc_hi_ref, rc_lo_ref, diag_ref[:])
    out_hi_ref[:] = s.hi
    out_lo_ref[:] = s.lo


@partial(jax.jit, static_argnames=("block", "interpret"))
def permutation(state: G, block: int = BLOCK, interpret: bool = False) -> G:
    """Drop-in for ops.poseidon.permutation: state (..., 12) -> (..., 12).

    `interpret=True` runs the kernel through the Pallas interpreter (for
    CPU-only test environments; the compiled path needs a real TPU)."""
    shape = state.shape
    n = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    hi = state.hi.reshape(n, WIDTH).T  # (12, n)
    lo = state.lo.reshape(n, WIDTH).T
    n_pad = -n % block
    if n_pad:
        hi = jnp.pad(hi, ((0, 0), (0, n_pad)))
        lo = jnp.pad(lo, ((0, 0), (0, n_pad)))
    total = n + n_pad
    grid = (total // block,)
    spec = pl.BlockSpec((WIDTH, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((30, WIDTH, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    diag_spec = pl.BlockSpec((WIDTH, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    rc_hi, rc_lo = _rc_planes()
    diag = np.array(MDS_DIAG, dtype=np.uint32).reshape(WIDTH, 1)
    out_hi, out_lo = pl.pallas_call(
        _poseidon_kernel,
        grid=grid,
        in_specs=[rc_spec, rc_spec, diag_spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((WIDTH, total), U32),
            jax.ShapeDtypeStruct((WIDTH, total), U32),
        ],
        interpret=interpret,
    )(jnp.asarray(rc_hi), jnp.asarray(rc_lo), jnp.asarray(diag), hi, lo)
    return G(
        out_hi[:, :n].T.reshape(shape),
        out_lo[:, :n].T.reshape(shape),
    )
