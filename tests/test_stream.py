"""Stream/metrics tier (SURVEY §5 checkpoint/streaming + metrics rows).

Covers: final-partial-batch padding (pad lanes masked out of the live
count), corrupted lanes counted as rejections, rolling metrics sanity,
StreamVerifier over an 8-device mesh, and the mixed-shape bucketing driver
(BASELINE config 3 — the reference verifies one proof shape per invocation,
testmain.hs:24-63; a production stream multiplexes shapes).
"""

import copy

import jax
import numpy as np
import pytest

from plonky2_verifier_tpu.compiler import CircuitTemplate
from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.models.cache import get_fixture_proof
from plonky2_verifier_tpu.parallel import (
    BucketedStreamVerifier,
    StreamVerifier,
    make_mesh,
    template_key,
)


@pytest.fixture(scope="module")
def fib():
    common, vkey, pwp = get_fixture_proof("fibonacci", num_query_rounds=4)
    return common, vkey, pwp


@pytest.fixture(scope="module")
def fib8():
    common, vkey, pwp = get_fixture_proof("fibonacci", num_query_rounds=8)
    return common, vkey, pwp


def _corrupt(pwp):
    bad = copy.deepcopy(pwp)
    re, im = bad.proof.openings.wires[0]
    bad.proof.openings.wires[0] = ((re + 1) % gf.P, im)
    return bad


def test_partial_batch_padding_and_live_count(fib):
    common, vkey, pwp = fib
    sv = StreamVerifier(CircuitTemplate(common), batch=4)
    m = sv.run([(vkey, pwp)] * 6)  # 1 full batch + a 2-live padded batch
    assert m.proofs == 6 and m.accepted == 6 and m.rejected == 0
    assert m.batches == 2


def test_corrupted_lanes_counted(fib):
    common, vkey, pwp = fib
    bad = _corrupt(pwp)
    sv = StreamVerifier(CircuitTemplate(common), batch=4)
    stream = [(vkey, bad if i in (1, 5, 6) else pwp) for i in range(7)]
    m = sv.run(stream)
    assert m.proofs == 7 and m.rejected == 3 and m.accepted == 4


def test_corrupted_pad_source_not_double_counted(fib):
    """The final partial batch pads by repeating its LAST proof; if that
    proof is corrupt, it must still count as exactly ONE rejection."""
    common, vkey, pwp = fib
    sv = StreamVerifier(CircuitTemplate(common), batch=4)
    m = sv.run([(vkey, pwp), (vkey, _corrupt(pwp))])  # live=2, 2 pad lanes
    assert m.proofs == 2 and m.rejected == 1 and m.accepted == 1


def test_rolling_metrics_sane(fib):
    common, vkey, pwp = fib
    tpl = CircuitTemplate(common)
    sv = StreamVerifier(tpl, batch=4)
    seen = []
    m = sv.run([(vkey, pwp)] * 8, on_batch=lambda mm: seen.append(mm.snapshot()))
    assert len(seen) == 2  # one callback per folded batch
    snap = m.snapshot()
    assert snap["proofs_per_sec"] > 0
    assert snap["poseidon_perms_per_sec"] == pytest.approx(
        snap["proofs_per_sec"] * m.perms_per_proof, rel=0.01
    )
    assert snap["fri_queries_per_sec"] == pytest.approx(
        snap["proofs_per_sec"] * tpl.num_queries, rel=0.01
    )
    assert m.rolling_rate() >= 0.0


def test_ingest_device_split_reported(fib):
    """The snapshot must attribute stream wall time: host-side ingest
    (flatten + device put) vs blocking on the device verdict — the numbers
    that show whether a host can feed a mesh (docs/performance.md)."""
    common, vkey, pwp = fib
    sv = StreamVerifier(CircuitTemplate(common), batch=4)
    m = sv.run([(vkey, pwp)] * 8)
    snap = m.snapshot()
    assert snap["ingest_s"] > 0
    assert snap["ingest_ms_per_proof"] > 0
    assert 0.0 <= snap["ingest_utilization"] <= 1.0
    assert snap["device_wait_s"] >= 0
    # conservation: ingest + device wait cannot exceed total elapsed
    assert snap["ingest_s"] + snap["device_wait_s"] <= snap["elapsed_s"] + 0.05


def test_stream_over_mesh(fib8):
    """StreamVerifier with a mesh routes through ShardedVerifier: same
    counts, psum verdict, corrupt lane still detected."""
    common, vkey, pwp = fib8
    mesh = make_mesh(jax.devices()[:8], dp=4, qp=2)
    sv = StreamVerifier(CircuitTemplate(common), batch=8, mesh=mesh)
    stream = [(vkey, _corrupt(pwp) if i == 3 else pwp) for i in range(8)]
    m = sv.run(stream)
    assert m.proofs == 8 and m.rejected == 1 and m.accepted == 7


def test_template_key_groups_by_shape(fib, fib8):
    c4, c8 = fib[0], fib8[0]
    assert template_key(c4) == template_key(copy.deepcopy(c4))
    assert template_key(c4) != template_key(c8)


def test_bucketed_mixed_shapes(fib, fib8):
    """Config-3 shape: one stream interleaving two circuit shapes; each
    bucket compiles its own template, batches fill interleaved, partial
    buckets flush at end, per-bucket counts are exact."""
    c4, vk4, p4 = fib
    c8, vk8, p8 = fib8
    bad8 = _corrupt(p8)

    items = []
    for i in range(5):  # 5 of shape A
        items.append((c4, vk4, p4))
        if i < 3:  # 3 of shape B, one corrupt
            items.append((c8, vk8, bad8 if i == 1 else p8))

    bsv = BucketedStreamVerifier(batch=4)
    folded = []
    out = bsv.run(items, on_batch=lambda k, m: folded.append(k))
    k4, k8 = template_key(c4), template_key(c8)
    assert set(out) == {k4, k8}
    assert out[k4].proofs == 5 and out[k4].accepted == 5
    assert out[k8].proofs == 3 and out[k8].accepted == 2 and out[k8].rejected == 1
    assert sorted(folded.count(k) for k in (k4, k8)) == [1, 2]  # 2 batches A, 1 B
