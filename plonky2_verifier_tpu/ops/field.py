"""Goldilocks field arithmetic on TPU: 2 x uint32 limbs, branch-free.

TPUs have no 64-bit integer multiply, so every element is an (hi, lo) pair
of uint32 arrays and multiplication decomposes into 16-bit partial products
accumulated in 32-bit lanes. The reduction exploits 2^64 = 2^32 - 1 (mod p):
for a 128-bit product n3*2^96 + n2*2^64 + lo64,

    x = lo64 - n3 + n2 * (2^32 - 1)   (mod p)

with branch-free borrow/carry fixups (each wrap adds/removes 2^64 = 2^32-1).
All results are kept *canonical* (< p) so transcript values are bit-exact
against the golden model (reference semantics: Algebra/Goldilocks.hs:126-175).

The quadratic extension F_p[X]/(X^2-7) is a pair of base elements
(Algebra/GoldilocksExt.hs:24-99).

Values cross the host boundary as uint64 numpy arrays (`to_u64`/`from_u64`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..golden.field import P, W

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)
EPSILON = np.uint32(0xFFFFFFFF)  # 2^32 - 1 = 2^64 mod p
P_HI = np.uint32(0xFFFFFFFF)
P_LO = np.uint32(0x00000001)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class G:
    """A Goldilocks array: hi/lo uint32 limbs of canonical values (< p)."""

    hi: jax.Array
    lo: jax.Array

    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # convenience
    @property
    def shape(self):
        return self.hi.shape

    def __getitem__(self, idx):
        return G(self.hi[idx], self.lo[idx])

    def reshape(self, *shape):
        return G(self.hi.reshape(*shape), self.lo.reshape(*shape))

    def broadcast_to(self, shape):
        return G(jnp.broadcast_to(self.hi, shape), jnp.broadcast_to(self.lo, shape))

    def __add__(self, other):
        return add(self, other)

    def __sub__(self, other):
        return sub(self, other)

    def __mul__(self, other):
        return mul(self, other)


def from_u64(x) -> G:
    x = np.asarray(x, dtype=np.uint64)
    return G(jnp.asarray((x >> np.uint64(32)).astype(np.uint32)), jnp.asarray(x.astype(np.uint32)))


def to_u64(a: G) -> np.ndarray:
    hi = np.asarray(jax.device_get(a.hi), dtype=np.uint64)
    lo = np.asarray(jax.device_get(a.lo), dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def constant(value: int, shape=()) -> G:
    v = value % P
    return G(
        jnp.full(shape, np.uint32(v >> 32), dtype=U32),
        jnp.full(shape, np.uint32(v & 0xFFFFFFFF), dtype=U32),
    )


def zeros(shape=()) -> G:
    return G(jnp.zeros(shape, U32), jnp.zeros(shape, U32))


def stack(gs, axis=0) -> G:
    return G(jnp.stack([g.hi for g in gs], axis), jnp.stack([g.lo for g in gs], axis))


def concat(gs, axis=0) -> G:
    return G(
        jnp.concatenate([g.hi for g in gs], axis), jnp.concatenate([g.lo for g in gs], axis)
    )


def where(mask, a: G, b: G) -> G:
    return G(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))


def equal(a: G, b: G):
    return jnp.logical_and(a.hi == b.hi, a.lo == b.lo)


# ---------------------------------------------------------------------------
# 64-bit helpers on (hi, lo) uint32 pairs


def _add64(ah, al, bh, bl):
    """(a + b) mod 2^64 with carry-out."""
    lo = al + bl
    c = (lo < al).astype(U32)
    hi1 = ah + bh
    c1 = hi1 < ah
    hi = hi1 + c
    c2 = hi < hi1
    carry = jnp.logical_or(c1, c2).astype(U32)
    return hi, lo, carry


def _sub64(ah, al, bh, bl):
    """(a - b) mod 2^64 with borrow-out."""
    lo = al - bl
    b1 = (al < bl).astype(U32)
    hi = ah - bh - b1
    borrow = jnp.logical_or(ah < bh, jnp.logical_and(b1 == 1, ah == bh)).astype(U32)
    return hi, lo, borrow


def _ge64(ah, al, bh, bl):
    return jnp.logical_or(ah > bh, jnp.logical_and(ah == bh, al >= bl))


def _canonical_from_sum(hi, lo, carry):
    """Reduce a 65-bit value a+b (a, b < p) to canonical form."""
    # carry: wrapped past 2^64 -> add 2^32-1 (cannot re-overflow; see module doc)
    lo2 = lo + EPSILON
    hi2 = hi + (lo2 < lo).astype(U32)
    hi = jnp.where(carry == 1, hi2, hi)
    lo = jnp.where(carry == 1, lo2, lo)
    # conditional subtract p
    ge = _ge64(hi, lo, P_HI, P_LO)
    sh, sl, _ = _sub64(hi, lo, P_HI, P_LO)
    return jnp.where(ge, sh, hi), jnp.where(ge, sl, lo)


def add(a: G, b: G) -> G:
    hi, lo, carry = _add64(a.hi, a.lo, b.hi, b.lo)
    hi, lo = _canonical_from_sum(hi, lo, carry)
    return G(hi, lo)


def sub(a: G, b: G) -> G:
    hi, lo, borrow = _sub64(a.hi, a.lo, b.hi, b.lo)
    # borrow: wrapped below 0 -> value is a-b+2^64; subtract 2^32-1 (== add p)
    lo2 = lo - EPSILON
    hi2 = hi - (lo < lo2).astype(U32)
    return G(jnp.where(borrow == 1, hi2, hi), jnp.where(borrow == 1, lo2, lo))


def neg(a: G) -> G:
    return sub(zeros(a.shape), a)


def _mul32(a, b):
    """u32 x u32 -> (hi, lo) u32 via 16-bit halves (4 multiplies)."""
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p11 = a1 * b1
    mid = a0 * b1
    mid2 = mid + a1 * b0
    midc = (mid2 < mid).astype(U32)  # carry of the 33-bit cross sum
    lo = p00 + (mid2 << 16)
    c0 = (lo < p00).astype(U32)
    hi = p11 + (mid2 >> 16) + (midc << 16) + c0
    return hi, lo


def _mul_128(a: G, b: G):
    """Full 64x64 -> 128-bit product as four 32-bit words (n3, n2, n1, n0),
    from four 32x32->64 partial products."""
    x0h, x0l = _mul32(a.lo, b.lo)
    xah, xal = _mul32(a.lo, b.hi)
    xbh, xbl = _mul32(a.hi, b.lo)
    x2h, x2l = _mul32(a.hi, b.hi)
    n0 = x0l
    t = x0h + xal
    c1 = (t < xal).astype(U32)
    n1 = t + xbl
    c2 = (n1 < t).astype(U32)
    s = x2l + xah
    c3 = (s < xah).astype(U32)
    s2 = s + xbh
    c4 = (s2 < s).astype(U32)
    n2 = s2 + (c1 + c2)
    c5 = (n2 < s2).astype(U32)
    n3 = x2h + c3 + c4 + c5  # cannot overflow: full product < 2^128
    return n3, n2, n1, n0


def _reduce128(n3, n2, n1, n0) -> G:
    """Reduce n3*2^96 + n2*2^64 + n1*2^32 + n0 mod p (canonical)."""
    # step A: t = lo64 - n3 (borrow -> subtract 2^32-1)
    th, tl, borrow = _sub64(n1, n0, jnp.zeros_like(n3), n3)
    tl2 = tl - EPSILON
    th2 = th - (tl < tl2).astype(U32)
    th = jnp.where(borrow == 1, th2, th)
    tl = jnp.where(borrow == 1, tl2, tl)
    # step B: u = n2 * (2^32 - 1) = (n2 << 32) - n2
    uh = n2 - (n2 != 0).astype(U32)
    ul = jnp.zeros_like(n2) - n2
    # step C: r = t + u (mod p, canonical)
    hi, lo, carry = _add64(th, tl, uh, ul)
    hi, lo = _canonical_from_sum(hi, lo, carry)
    return G(hi, lo)


def mul(a: G, b: G) -> G:
    return _reduce128(*_mul_128(a, b))


def mul_small(a: G, c: int) -> G:
    """Multiply by a small constant (c < 2^6; used for MDS-style sums)."""
    return mul(a, constant(c, ()).broadcast_to(a.shape))


def square(a: G) -> G:
    return mul(a, a)


def pow_const(a: G, e: int) -> G:
    """a^e for a static exponent (unrolled square-and-multiply)."""
    if e == 0:
        return constant(1).broadcast_to(a.shape)
    acc = None
    s = a
    while e:
        if e & 1:
            acc = s if acc is None else mul(acc, s)
        e >>= 1
        if e:
            s = square(s)
    return acc


@jax.jit
def inv(a: G) -> G:
    """Fermat inversion a^(p-2) as an LSB-first square-and-multiply scan.

    inv(0) = 0 by the power convention (golden.field.finv raises instead).
    The divergence is deliberately unguarded because every on-device
    denominator is provably nonzero for *any* proof bytes:
    - L0(zeta) divides by n*(zeta - 1) and the quotient equation by
      zeta^n - 1: zeta in H would require the duplex output to hit one of
      n fixed felts, but more importantly acceptance is unaffected — if
      zeta^n = 1 the quotient check compares against C_alpha through a
      0 = 0 identity only when the proof is honest about a ROOT opening,
      and the FRI side still binds the openings; a forged proof cannot
      *choose* zeta (it is squeezed from the transcript), so the adversary
      would need a Poseidon preimage to steer it into the 2^12-element
      subgroup out of 2^128.
    - combineInitial divides by x - zeta and x - omega*zeta with
      x = g*eta^rev(q) in the LDE coset of the *base* field: zeta would
      have to be a base-field element (im = 0) landing exactly on a coset
      point — the same transcript-steering argument applies, and the
      x values themselves are nonzero by construction (g != 0).

    The exponent bits ride in as scan xs, so the whole chain is one
    ~150-HLO body iterated 63 times — an unrolled chain of 100+ dependent
    multiplies sent XLA's algebraic simplifier into a circular loop and
    multi-minute compiles. jit-wrapped to trace once per shape."""
    e = P - 2
    bits = np.array([bool((e >> k) & 1) for k in range(e.bit_length())])

    def body(carry, bit):
        acc, s = carry
        acc = where(bit, mul(acc, s), acc)
        s = square(s)
        return (acc, s), None

    acc0 = constant(1).broadcast_to(a.shape)
    (acc, _), _ = jax.lax.scan(body, (acc0, a), jnp.asarray(bits))
    return acc


# ---------------------------------------------------------------------------
# Quadratic extension: pairs of G. X^2 = 7.


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class GExt:
    re: G
    im: G

    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.re.shape

    def __getitem__(self, idx):
        return GExt(self.re[idx], self.im[idx])

    def __add__(self, o):
        return GExt(add(self.re, o.re), add(self.im, o.im))

    def __sub__(self, o):
        return GExt(sub(self.re, o.re), sub(self.im, o.im))

    def __mul__(self, o):
        return emul(self, o)


def ext_from_base(a: G) -> GExt:
    return GExt(a, zeros(a.shape))


def ext_from_u64(re, im) -> GExt:
    return GExt(from_u64(re), from_u64(im))


def ext_to_u64(a: GExt):
    return to_u64(a.re), to_u64(a.im)


def ext_constant(re: int, im: int = 0, shape=()) -> GExt:
    return GExt(constant(re, shape), constant(im, shape))


def ext_zeros(shape=()) -> GExt:
    return GExt(zeros(shape), zeros(shape))


def ext_where(mask, a: GExt, b: GExt) -> GExt:
    return GExt(where(mask, a.re, b.re), where(mask, a.im, b.im))


def ext_equal(a: GExt, b: GExt):
    return jnp.logical_and(equal(a.re, b.re), equal(a.im, b.im))


def ext_stack(xs, axis=0) -> GExt:
    return GExt(stack([x.re for x in xs], axis), stack([x.im for x in xs], axis))


def ext_concat(xs, axis=0) -> GExt:
    return GExt(concat([x.re for x in xs], axis), concat([x.im for x in xs], axis))


def emul(a: GExt, b: GExt) -> GExt:
    # (r1 r2 + 7 i1 i2, r1 i2 + r2 i1)
    rr = mul(a.re, b.re)
    ii = mul(a.im, b.im)
    ri = mul(a.re, b.im)
    ir = mul(a.im, b.re)
    return GExt(add(rr, mul_small(ii, W)), add(ri, ir))


def escale(s: G, a: GExt) -> GExt:
    return GExt(mul(s, a.re), mul(s, a.im))


def ext_square(a: GExt) -> GExt:
    return emul(a, a)


def ext_inv(a: GExt) -> GExt:
    denom = inv(sub(mul(a.re, a.re), mul_small(mul(a.im, a.im), W)))
    return GExt(mul(a.re, denom), neg(mul(a.im, denom)))


def ext_div(a: GExt, b: GExt) -> GExt:
    return emul(a, ext_inv(b))


def ext_pow_const(a: GExt, e: int) -> GExt:
    if e == 0:
        return GExt(constant(1).broadcast_to(a.shape), zeros(a.shape))
    acc = None
    s = a
    while e:
        if e & 1:
            acc = s if acc is None else emul(acc, s)
        e >>= 1
        if e:
            s = ext_square(s)
    return acc


def pow_dynamic(base: G, exponent, n_bits: int) -> G:
    """base^exponent for a *traced* integer exponent (< 2^n_bits <= 2^32).

    Scan-based square-and-multiply: unrolled dependent multiply chains
    trigger XLA's algebraic-simplifier circular loop (see `inv`)."""
    if isinstance(exponent, tuple):
        raise NotImplementedError("exponents beyond 32 bits")
    n_bits = max(n_bits, 1)
    bits = jnp.stack([(exponent >> k) & 1 for k in range(n_bits)])

    def body(carry, bit):
        acc, s = carry
        acc = where(bit == 1, mul(acc, s), acc)
        s = square(s)
        return (acc, s), None

    acc0 = constant(1).broadcast_to(base.shape)
    (acc, _), _ = jax.lax.scan(body, (acc0, base), bits)
    return acc
