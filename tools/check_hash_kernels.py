"""Bit-exactness check of the compiled Pallas hash kernels on real TPU.

Validates, against the golden (python-int) model:
- the plain Poseidon-12 permutation (incl. the reference KAT,
  Hash/Poseidon.hs:27-35, and the p-edge band);
- the fused sponge over every leaf-row width the verifier uses
  (Hash/Sponge.hs:18-31 semantics);
- the fused Merkle path walk incl. sibling ordering by index bit
  (Hash/Merkle.hs:30-37).

Prints one JSON line; exit 0 iff all bit-exact. The round artifact
HASH_KERNELS_r{N}.json is this script's output on the real chip. (The
interpret-mode unit tests in tests/test_pallas.py cover the same math but
are env-gated: the Pallas interpreter's compile on XLA:CPU is pathological.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.golden import poseidon as gp
from plonky2_verifier_tpu.golden.hashing import sponge as gold_sponge
from plonky2_verifier_tpu.ops import field as jf
from plonky2_verifier_tpu.ops import pallas_hash as ph
from plonky2_verifier_tpu.ops import pallas_poseidon as pp


def main():
    t0 = time.time()
    rng = np.random.default_rng(0)
    res = {"device": str(jax.devices()[0])}

    # permutation: KAT + edge band + random
    arr = rng.integers(0, gf.P, size=(64, 12), dtype=np.uint64)
    arr[0] = np.arange(12, dtype=np.uint64)
    arr[1, :4] = [0, 1, gf.P - 1, gf.P - 2]
    got = jf.to_u64(pp.permutation(jf.from_u64(arr)))
    perm_ok = got[0].tolist() == list(gp.KAT_OUTPUT)
    for i in range(64):
        perm_ok = perm_ok and got[i].tolist() == gp.permutation(arr[i].tolist())
    res["permutation_bit_exact"] = bool(perm_ok)

    # fused sponge: every oracle/leaf width in play (85/135/20/16 initial-tree
    # rows, 2*arity coset rows, small PI rows)
    sponge_ok = True
    for width in (4, 8, 16, 20, 32, 85, 135):
        rows = rng.integers(0, gf.P, size=(37, width), dtype=np.uint64)
        got = jf.to_u64(ph.sponge_rows(jf.from_u64(rows), width))
        for i in range(rows.shape[0]):
            exp = np.array(gold_sponge([int(x) for x in rows[i]]), dtype=np.uint64)[:4]
            sponge_ok = sponge_ok and (got[i] == exp).all()
    res["sponge_bit_exact"] = bool(sponge_ok)

    # fused Merkle walk vs a golden per-level compress chain
    def gold_compress(x, y):
        return gp.permutation(list(x) + list(y) + [0, 0, 0, 0])[:4]

    merkle_ok = True
    for L in (1, 5, 9, 13):
        digests = rng.integers(0, gf.P, size=(5, 7, 4), dtype=np.uint64)
        sibs = rng.integers(0, gf.P, size=(5, 7, L, 4), dtype=np.uint64)
        idx = rng.integers(0, 1 << (L + 3), size=(5, 7)).astype(np.uint32)
        cur = ph.merkle_fold(
            jf.from_u64(digests), jax.numpy.asarray(idx), jf.from_u64(sibs), L
        )
        got = jf.to_u64(cur)
        for i in range(5):
            for j in range(7):
                c = [int(v) for v in digests[i, j]]
                for l in range(L):
                    s = [int(v) for v in sibs[i, j, l]]
                    bit = (int(idx[i, j]) >> l) & 1
                    c = gold_compress(c, s) if bit == 0 else gold_compress(s, c)
                merkle_ok = merkle_ok and (got[i, j] == np.array(c, dtype=np.uint64)).all()
    res["merkle_bit_exact"] = bool(merkle_ok)

    res["pass"] = bool(perm_ok and sponge_ok and merkle_ok)
    res["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(res))
    sys.exit(0 if res["pass"] else 1)


if __name__ == "__main__":
    main()
