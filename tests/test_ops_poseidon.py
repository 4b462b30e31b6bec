"""TPU Poseidon / sponge / Merkle ops vs the golden model."""

import random

import jax
import numpy as np

from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.golden.hashing import compress as g_compress, sponge as g_sponge
from plonky2_verifier_tpu.golden.poseidon import KAT_OUTPUT, permutation as g_perm
from plonky2_verifier_tpu.ops import field as jf
from plonky2_verifier_tpu.ops import poseidon as jp


def test_permutation_kat():
    state = jf.from_u64(np.arange(12, dtype=np.uint64))
    out = jf.to_u64(jp.permutation(state))
    assert tuple(int(x) for x in out) == KAT_OUTPUT


def test_permutation_batch_random():
    rng = random.Random(0)
    batch = [[gf.rand_f(rng) for _ in range(12)] for _ in range(64)]
    arr = jf.from_u64(np.array(batch, dtype=np.uint64))
    out = jax.jit(jp.permutation)(arr)
    got = jf.to_u64(out)
    for i, row in enumerate(batch):
        assert [int(x) for x in got[i]] == g_perm(row), i


def test_sponge_widths():
    rng = random.Random(1)
    for width in (3, 8, 16, 20, 85, 135):
        rows = [[gf.rand_f(rng) for _ in range(width)] for _ in range(4)]
        arr = jf.from_u64(np.array(rows, dtype=np.uint64))
        got = jf.to_u64(jp.sponge(arr, width))
        for i, row in enumerate(rows):
            assert tuple(int(x) for x in got[i]) == g_sponge(row), (width, i)


def test_compress():
    rng = random.Random(2)
    xs = [[gf.rand_f(rng) for _ in range(4)] for _ in range(8)]
    ys = [[gf.rand_f(rng) for _ in range(4)] for _ in range(8)]
    got = jf.to_u64(jp.compress(jf.from_u64(np.array(xs, dtype=np.uint64)), jf.from_u64(np.array(ys, dtype=np.uint64))))
    for i in range(8):
        assert tuple(int(v) for v in got[i]) == g_compress(tuple(xs[i]), tuple(ys[i]))


def test_merkle_path_batch():
    from plonky2_verifier_tpu.prover.merkle import MerkleTree

    rng = random.Random(3)
    leaves = [[gf.rand_f(rng) for _ in range(5)] for _ in range(32)]
    tree = MerkleTree(leaves, cap_height=2)  # path length 3, cap 4
    idxs = list(range(32))
    sibs = [tree.prove(i) for i in idxs]
    leaf_digests = [g_sponge(leaves[i]) for i in idxs]

    ld = jf.from_u64(np.array(leaf_digests, dtype=np.uint64))
    sb = jf.from_u64(np.array(sibs, dtype=np.uint64))  # (32, 3, 4)
    cap = jf.from_u64(np.broadcast_to(np.array(tree.cap, dtype=np.uint64), (32, 4, 4)))
    import jax.numpy as jnp

    ok = jp.verify_merkle_path(ld, jnp.array(idxs, dtype=jnp.uint32), sb, cap, path_len=3)
    assert np.asarray(ok).all()
    # flip one index -> that row fails
    bad_idx = jnp.array([i ^ 1 for i in idxs], dtype=jnp.uint32)
    ok2 = jp.verify_merkle_path(ld, bad_idx, sb, cap, path_len=3)
    assert not np.asarray(ok2).any()
