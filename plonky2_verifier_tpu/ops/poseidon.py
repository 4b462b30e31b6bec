"""Batched Poseidon-12 permutation on TPU (jnp reference kernel).

State is a Goldilocks array of shape (..., 12); the 30 rounds are fully
unrolled at trace time into one fused XLA computation. The MDS layer
exploits the tiny circulant coefficients (<= 49): each 16-bit limb of the
state is contracted against the integer MDS matrix in 32-bit lanes (max
column sum 12*49*65535 < 2^26, no overflow), then the four widened limbs
are carry-propagated and reduced mod p once per lane. This replaces 144
full field multiplications per round with 4 small integer matmuls.

Validated bit-exactly against golden.poseidon (which carries the KAT).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..golden.poseidon import mds_matrix
from ..golden.poseidon_constants import ALL_ROUND_CONSTANTS
from . import field as jf
from .field import G, MASK16, U32

WIDTH = 12


@lru_cache(maxsize=None)
def _mds_np() -> np.ndarray:
    return np.array(mds_matrix(), dtype=np.uint32)  # (12, 12), entries <= 49


@lru_cache(maxsize=None)
def _rc_np():
    rc = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, 12)
    return (rc >> np.uint64(32)).astype(np.uint32), rc.astype(np.uint32)


def _add_rc(state: G, r: int) -> G:
    hi, lo = _rc_np()
    return jf.add(state, G(jnp.asarray(hi[r]), jnp.asarray(lo[r])))


def _sbox7(x: G) -> G:
    x2 = jf.mul(x, x)
    x3 = jf.mul(x2, x)
    x4 = jf.mul(x2, x2)
    return jf.mul(x3, x4)


def _mds(state: G) -> G:
    """y_i = sum_j M[i][j] x_j via per-16-bit-limb integer contraction."""
    m = jnp.asarray(_mds_np())  # (12, 12) uint32
    limbs = (
        state.lo & MASK16,
        state.lo >> 16,
        state.hi & MASK16,
        state.hi >> 16,
    )
    accs = [jnp.einsum("ij,...j->...i", m, l.astype(U32)) for l in limbs]
    return _from_wide16(accs)


def _from_wide16(accs) -> G:
    """Recombine sum_k accs[k] * 2^(16k) (each acc < 2^26) into canonical G."""
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


def _rc_g(rows) -> G:
    hi, lo = _rc_np()
    return G(jnp.asarray(hi[rows]), jnp.asarray(lo[rows]))


def use_pallas() -> bool:
    """One policy for every Pallas hash kernel (permutation, fused sponge,
    fused Merkle walk): on by default on TPU, off elsewhere (CPU tests would
    need interpret mode). Override with P2V_POSEIDON_BACKEND=jnp|pallas."""
    backend = os.environ.get("P2V_POSEIDON_BACKEND", "auto")
    return backend == "pallas" or (backend == "auto" and jax.default_backend() == "tpu")


def permutation(state: G) -> G:
    """The full 30-round permutation; state shape (..., 12).

    Dispatches to the fused Pallas kernel (ops/pallas_poseidon.py) on TPU —
    measured 1.4x the jnp path at large batch (tools/bench_poseidon.py) —
    and to the jnp scan elsewhere."""
    if use_pallas():
        from . import pallas_poseidon

        return pallas_poseidon.permutation(state)
    return _permutation_jnp(state)


@jax.jit
def _permutation_jnp(state: G) -> G:
    """jnp reference path: rounds as lax.scan over per-round constants.

    Structured for compile-time economy: the rounds run as lax.scan over
    per-round constants (one ~300-HLO external body + one internal body)
    and the whole function is jit-wrapped so its jaxpr is traced once and
    reused as a called computation at every site (transcript, sponges,
    Merkle walks). Naively unrolling 30 rounds at every call site made the
    full-verifier HLO ~100x larger and pushed XLA compiles past 5 minutes."""
    assert state.shape[-1] == WIDTH

    def external(s, rc: G):
        return _mds(_sbox7(jf.add(s, rc))), None

    def internal(s, rc: G):
        s = jf.add(s, rc)
        lane0 = _sbox7(s[..., :1])
        s = jf.concat([lane0, s[..., 1:]], axis=-1)
        return _mds(s), None

    s, _ = jax.lax.scan(external, state, _rc_g(list(range(0, 4))))
    s, _ = jax.lax.scan(internal, s, _rc_g(list(range(4, 26))))
    s, _ = jax.lax.scan(external, s, _rc_g(list(range(26, 30))))
    return s


def sponge(inputs: G, width: int) -> G:
    """Rate-8 overwrite-mode sponge over a statically-sized row.
    inputs shape (..., width); returns digest (..., 4)."""
    batch = inputs.shape[:-1]
    state = jf.zeros(batch + (WIDTH,))
    for i in range(0, width, 8):
        chunk = inputs[..., i : min(i + 8, width)]
        k = chunk.shape[-1]
        state = jf.concat([chunk, state[..., k:]], axis=-1)
        state = permutation(state)
    if width == 0:
        return jf.zeros(batch + (4,))
    return state[..., :4]


def compress(x: G, y: G) -> G:
    """2-to-1 digest compression; x, y shape (..., 4)."""
    batch = x.shape[:-1]
    state = jf.concat([x, y, jf.zeros(batch + (4,))], axis=-1)
    return permutation(state)[..., :4]


def verify_merkle_path(leaf_digest: G, index, siblings: G, cap: G, path_len: int):
    """Walk a Merkle path with branch-free sibling ordering, then compare to
    the cap root selected by the residual index (Hash/Merkle.hs:30-42).

    leaf_digest: (..., 4); index: (...,) uint32; siblings: (..., path_len, 4);
    cap: (..., cap_size, 4). Returns bool (...,)."""
    cur = leaf_digest
    for lvl in range(path_len):
        sib = siblings[..., lvl, :]
        bit = (index >> lvl) & 1
        is_left = (bit == 0)[..., None]
        left = jf.where(is_left, cur, sib)
        right = jf.where(is_left, sib, cur)
        cur = compress(left, right)
    residual = (index >> path_len).astype(jnp.int32)
    root = G(
        jnp.take_along_axis(cap.hi, residual[..., None, None], axis=-2)[..., 0, :],
        jnp.take_along_axis(cap.lo, residual[..., None, None], axis=-2)[..., 0, :],
    )
    return jf.equal(cur, root).all(axis=-1)
