"""Pallas Poseidon kernel: bit-exact vs the golden model and the jnp path.

The interpret-mode cases are gated behind P2V_PALLAS_INTERPRET=1: the Pallas
interpreter pays a pathological compile for the fully-unrolled 30-round
kernel on XLA:CPU (>10 min / tens of GB RSS on a 2-core host, regardless of
input shape). The kernels' standing validation is on real TPU:
tools/check_hash_kernels.py (bit-exactness vs golden, HASH_KERNELS_r04.json)
and tools/bench_poseidon.py (A/B throughput; docs/performance.md)."""

import os
import random

import numpy as np
import pytest

from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.golden import poseidon as gp
from plonky2_verifier_tpu.ops import field as jf

pp = pytest.importorskip("plonky2_verifier_tpu.ops.pallas_poseidon")

interpret_mode = pytest.mark.skipif(
    os.environ.get("P2V_PALLAS_INTERPRET") != "1",
    reason="Pallas interpreter compile is pathological on XLA:CPU; "
    "set P2V_PALLAS_INTERPRET=1 (validated on TPU by tools/check_hash_kernels.py)",
)


@interpret_mode
def test_kat_interpret():
    st = jf.from_u64(np.arange(12, dtype=np.uint64).reshape(1, 12))
    out = pp.permutation(st, block=128, interpret=True)
    assert jf.to_u64(out)[0].tolist() == list(gp.KAT_OUTPUT)


@interpret_mode
def test_batch_vs_golden_and_jnp_interpret():
    # Interpret-mode Pallas pays per-row interpreter overhead; keep the case
    # tiny (the compiled Mosaic path is validated on TPU by
    # tools/bench_poseidon.py and bench.py). 8 rows incl. the edge band.
    from plonky2_verifier_tpu.ops.poseidon import _permutation_jnp

    rng = random.Random(99)
    arr = np.array(
        [[rng.randrange(gf.P) for _ in range(12)] for _ in range(8)], dtype=np.uint64
    )
    arr[0, :4] = [0, 1, gf.P - 1, gf.P - 2]  # edge band
    state = jf.from_u64(arr)
    got = jf.to_u64(pp.permutation(state, block=8, interpret=True))
    jnp_out = jf.to_u64(_permutation_jnp(state))
    assert (got == jnp_out).all()
    for i in (0, 7):
        assert got[i].tolist() == gp.permutation(arr[i].tolist())


@interpret_mode
def test_multi_block_grid_and_padding():
    # n deliberately not a multiple of block, and >1 grid step — but tiny:
    # block=4, n=10 gives 3 grid steps with a padded tail.
    rng = random.Random(7)
    arr = np.array(
        [[rng.randrange(gf.P) for _ in range(12)] for _ in range(10)], dtype=np.uint64
    )
    state = jf.from_u64(arr)
    got = jf.to_u64(pp.permutation(state, block=4, interpret=True))
    for i in (0, 3, 4, 9):
        assert got[i].tolist() == gp.permutation(arr[i].tolist())


def test_dispatcher_uses_jnp_on_cpu(monkeypatch):
    import jax

    from plonky2_verifier_tpu.ops import poseidon as jp

    assert jax.default_backend() == "cpu"  # conftest forces it
    # auto mode on CPU must route to the jnp path (no interpreter surprise)
    st = jf.from_u64(np.arange(12, dtype=np.uint64).reshape(1, 12))
    out = jp.permutation(st)
    assert jf.to_u64(out)[0].tolist() == list(gp.KAT_OUTPUT)
