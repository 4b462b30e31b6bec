"""Bit-exact validation of the TPU limb field ops against the golden model,
including the edge band around p and the 2^32 boundaries."""

import numpy as np
import pytest

from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.ops import field as jf


def _edge_band():
    p = gf.P
    vals = [0, 1, 2, 0xFFFFFFFF, 0x100000000, 0x100000001, p - 1, p - 2, p - 0xFFFFFFFF, 1 << 63]
    return [v % p for v in vals]


def _rand_vals(n, seed):
    rng = np.random.default_rng(seed)
    return [int(x) % gf.P for x in rng.integers(0, 1 << 64, n, dtype=np.uint64)]


@pytest.fixture(scope="module")
def pairs():
    xs = _edge_band() + _rand_vals(3000, 0)
    ys = list(reversed(_edge_band())) + _rand_vals(3000, 1)
    return xs, ys


def test_roundtrip(pairs):
    xs, _ = pairs
    a = jf.from_u64(np.array(xs, dtype=np.uint64))
    assert (jf.to_u64(a) == np.array(xs, dtype=np.uint64)).all()


def test_add_sub_mul(pairs):
    xs, ys = pairs
    a = jf.from_u64(np.array(xs, dtype=np.uint64))
    b = jf.from_u64(np.array(ys, dtype=np.uint64))
    want_add = np.array([gf.fadd(x, y) for x, y in zip(xs, ys)], dtype=np.uint64)
    want_sub = np.array([gf.fsub(x, y) for x, y in zip(xs, ys)], dtype=np.uint64)
    want_mul = np.array([gf.fmul(x, y) for x, y in zip(xs, ys)], dtype=np.uint64)
    assert (jf.to_u64(jf.add(a, b)) == want_add).all()
    assert (jf.to_u64(jf.sub(a, b)) == want_sub).all()
    assert (jf.to_u64(jf.mul(a, b)) == want_mul).all()


def test_inv(pairs):
    xs, _ = pairs
    xs = [x for x in xs if x != 0][:500]
    a = jf.from_u64(np.array(xs, dtype=np.uint64))
    want = np.array([gf.finv(x) for x in xs], dtype=np.uint64)
    assert (jf.to_u64(jf.inv(a)) == want).all()


def test_pow_const(pairs):
    xs, _ = pairs
    xs = xs[:200]
    a = jf.from_u64(np.array(xs, dtype=np.uint64))
    for e in (1, 2, 7, 64, (1 << 32) - 1):
        want = np.array([gf.fpow(x, e) for x in xs], dtype=np.uint64)
        assert (jf.to_u64(jf.pow_const(a, e)) == want).all(), e


def test_pow_dynamic():
    rng = np.random.default_rng(2)
    xs = _rand_vals(200, 3)
    es = [int(e) for e in rng.integers(0, 1 << 26, 200)]
    a = jf.from_u64(np.array(xs, dtype=np.uint64))
    e_arr = np.array(es, dtype=np.uint32)
    import jax.numpy as jnp

    got = jf.to_u64(jf.pow_dynamic(a, jnp.asarray(e_arr), 26))
    want = np.array([gf.fpow(x, e) for x, e in zip(xs, es)], dtype=np.uint64)
    assert (got == want).all()


def test_ext_ops():
    rng = np.random.default_rng(4)
    n = 500
    re1, im1, re2, im2 = (_rand_vals(n, s) for s in (10, 11, 12, 13))
    a = jf.ext_from_u64(np.array(re1, dtype=np.uint64), np.array(im1, dtype=np.uint64))
    b = jf.ext_from_u64(np.array(re2, dtype=np.uint64), np.array(im2, dtype=np.uint64))
    want_mul = [gf.emul((x, y), (z, w)) for x, y, z, w in zip(re1, im1, re2, im2)]
    got_re, got_im = jf.ext_to_u64(jf.emul(a, b))
    assert (got_re == np.array([m[0] for m in want_mul], dtype=np.uint64)).all()
    assert (got_im == np.array([m[1] for m in want_mul], dtype=np.uint64)).all()
    want_inv = [gf.einv((x, y)) for x, y in zip(re1, im1)]
    got_re, got_im = jf.ext_to_u64(jf.ext_inv(a))
    assert (got_re == np.array([m[0] for m in want_inv], dtype=np.uint64)).all()
    assert (got_im == np.array([m[1] for m in want_inv], dtype=np.uint64)).all()
