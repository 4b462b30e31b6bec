"""Multi-device sharded verification on the 8-device virtual CPU mesh.

Covers the reference's unit of work (`verifyProof`, Plonk/Verifier.hs:56-66)
sharded over a jax.sharding.Mesh per SURVEY §2.8: proof-batch data
parallelism ('dp'), FRI query-round parallelism ('qp'), and the psum verdict
reduction. Batches here are *heterogeneous* — every lane carries a distinct
proof — so lane scrambles or wrong-lane reads cannot pass silently.
"""

import jax
import numpy as np
import pytest

from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
from plonky2_verifier_tpu.models.cache import get_fixture_proof
from plonky2_verifier_tpu.parallel import ShardedVerifier, make_mesh
from plonky2_verifier_tpu.verifier_jax import JaxVerifier


@pytest.fixture(scope="module")
def hetero_batch():
    """8 distinct fibonacci proofs over one circuit shape (x0 varies)."""
    proofs = []
    common = None
    for lane in range(8):
        c, vkey, pwp = get_fixture_proof(
            "fibonacci", num_query_rounds=8, x0=lane + 1, x1=lane + 2
        )
        common = common or c
        proofs.append((vkey, pwp))
    tpl = CircuitTemplate(common)
    return tpl, proofs


def _arrays(tpl, proofs):
    return flatten_proofs(tpl, proofs)


def test_dp_only_mesh(hetero_batch):
    tpl, proofs = hetero_batch
    mesh = make_mesh(jax.devices()[:8], dp=8, qp=1)
    sv = ShardedVerifier(tpl, mesh, shard_queries=False)
    out = sv(sv.shard_arrays(_arrays(tpl, proofs)))
    ok = np.asarray(jax.device_get(out["ok"]))
    assert ok.shape == (8,) and ok.all()
    assert int(jax.device_get(out["n_valid"])) == 8


def test_dp_qp_mesh(hetero_batch):
    tpl, proofs = hetero_batch
    mesh = make_mesh(jax.devices()[:8], dp=4, qp=2)
    sv = ShardedVerifier(tpl, mesh, shard_queries=True)
    out = sv(sv.shard_arrays(_arrays(tpl, proofs)))
    assert np.asarray(jax.device_get(out["ok"])).all()
    assert int(jax.device_get(out["n_valid"])) == 8


def test_psum_matches_per_lane_truth(hetero_batch):
    """Corrupt two lanes; the sharded verdict must equal the single-device
    per-lane truth, and n_valid (psum over the mesh) must count exactly the
    clean lanes."""
    tpl, proofs = hetero_batch
    arrays = _arrays(tpl, proofs)
    bad = (2, 5)
    arrays["openings1"][bad[0], 0, 0] ^= np.uint64(1)
    arrays["pow_witness"][bad[1]] ^= np.uint64(1 << 17)

    ref = JaxVerifier(tpl)
    truth = np.asarray(jax.device_get(ref(ref.prepare(arrays))["ok"]))
    assert not truth[bad[0]] and not truth[bad[1]] and truth.sum() == 6

    mesh = make_mesh(jax.devices()[:8], dp=4, qp=2)
    sv = ShardedVerifier(tpl, mesh)
    out = sv(sv.shard_arrays(arrays))
    np.testing.assert_array_equal(np.asarray(jax.device_get(out["ok"])), truth)
    assert int(jax.device_get(out["n_valid"])) == 6


def test_lane_scramble(hetero_batch):
    """Permuting the batch lanes permutes the verdict identically — catches
    any cross-lane leakage in the sharded path."""
    tpl, proofs = hetero_batch
    arrays = _arrays(tpl, proofs)
    arrays["openings2"][3, 0, 1] ^= np.uint64(1)  # lane 3 invalid

    perm = np.array([5, 3, 7, 0, 2, 6, 1, 4])
    scrambled = {k: v[perm] for k, v in arrays.items()}

    mesh = make_mesh(jax.devices()[:8], dp=8, qp=1)
    sv = ShardedVerifier(tpl, mesh, shard_queries=False)
    ok = np.asarray(jax.device_get(sv(sv.shard_arrays(scrambled))["ok"]))
    expected = np.ones(8, bool)
    expected[np.where(perm == 3)[0][0]] = False
    np.testing.assert_array_equal(ok, expected)


def test_mesh_shapes():
    assert make_mesh(jax.devices()[:8], dp=8, qp=1).shape == {"dp": 8, "qp": 1}
    assert make_mesh(jax.devices()[:8], dp=2, qp=4).shape == {"dp": 2, "qp": 4}
    with pytest.raises(ValueError):
        make_mesh(jax.devices()[:8], dp=3, qp=2)
