"""Streaming verification driver: N >> batch proofs through one compiled
step, with rolling metrics and multi-host hooks (BASELINE config 5 minus
real multi-host hardware).

Design: proofs arrive as (vkey, proof) pairs of ONE circuit shape per
StreamVerifier; the driver packs fixed-size batches, pads the final partial
batch by repeating its last proof (padding lanes are masked out of the
verdict), and overlaps host-side flattening of batch k+1 with device
verification of batch k (dispatch is async; we only block on the previous
batch's verdict when the next one is already enqueued).

Mixed-shape workloads (BASELINE config 3) go through BucketedStreamVerifier:
items carry their CommonCircuitData, are grouped by canonical shape hash
(shape is data — SURVEY section 5 'config'), and each bucket owns its own
compiled StreamVerifier; batches dispatch interleaved as buckets fill.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, Iterable, Iterator, Optional, Tuple

import numpy as np

from ..compiler.flatten import flatten_proofs
from ..compiler.template import CircuitTemplate
from ..metrics import StreamMetrics, perms_per_proof
from ..types import CommonCircuitData


def template_key(common: CommonCircuitData) -> str:
    """Canonical shape hash of a circuit: two proofs verify through the same
    compiled template iff their commons serialize identically (the template
    is a pure function of CommonCircuitData)."""
    blob = json.dumps(common.to_json(), sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def init_distributed() -> bool:
    """Env-gated multi-host initialization (ICI/DCN tier).

    Set P2V_DISTRIBUTED=1 plus the standard JAX env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) to bring up jax.distributed before any
    backend touch; every process then sees the global device set and
    ShardedVerifier's psum rides ICI within a slice and DCN across hosts.
    Returns True when initialization ran."""
    if os.environ.get("P2V_DISTRIBUTED") != "1":
        return False
    import jax

    # jax 0.9 auto-reads only JAX_COORDINATOR_ADDRESS; on plain hosts (no
    # SLURM/GKE cluster detection) num_processes/process_id must be explicit
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        num_processes=int(num) if num else None,
        process_id=int(pid) if pid else None,
    )
    return True


class StreamVerifier:
    """Fixed-shape streaming loop around JaxVerifier / ShardedVerifier.

    `raw_json=True` streams (vkey_json_bytes, proof_json_bytes) pairs
    through the native C++ ingest (plonky2_verifier_tpu.native, GIL-free;
    `ingest_workers` threads) instead of parsed dataclasses — the Python
    json/dataclass path caps at ~150 proofs/s/core vs ~5,400/s/chip on
    device (tools/bench_ingest.py)."""

    def __init__(
        self,
        tpl: CircuitTemplate,
        batch: int,
        mesh=None,
        shard_queries: bool = True,
        raw_json: bool = False,
        ingest_workers: int = 0,
    ):
        self.tpl = tpl
        self.batch = batch
        self.raw_json = raw_json
        self.ingest_workers = ingest_workers or (os.cpu_count() or 1)
        if mesh is not None:
            from .mesh import ShardedVerifier

            self._v = ShardedVerifier(tpl, mesh, shard_queries=shard_queries)
            self._prepare = self._v.shard_arrays
        else:
            from ..verifier_jax import JaxVerifier

            self._v = JaxVerifier(tpl)
            self._prepare = self._v.prepare
        self.metrics = StreamMetrics(
            perms_per_proof=perms_per_proof(tpl), queries_per_proof=tpl.num_queries
        )
        self._pending = None  # (out, live) dispatched but not folded yet

    def _batches(self, proofs: Iterable[Tuple]) -> Iterator[Tuple[list, int]]:
        buf: list = []
        for p in proofs:
            buf.append(p)
            if len(buf) == self.batch:
                yield buf, self.batch
                buf = []
        if buf:
            live = len(buf)
            buf = buf + [buf[-1]] * (self.batch - live)  # pad: masked below
            yield buf, live

    def _flatten(self, group: list):
        if self.raw_json:
            from ..native import flatten_proof_jsons

            return flatten_proof_jsons(self.tpl, group, workers=self.ingest_workers)
        return flatten_proofs(self.tpl, group)

    def submit(self, group: list, live: int, on_batch=None) -> None:
        """Dispatch one full-size batch (async); folds the previous batch's
        verdict once this one is enqueued (the pipelining overlap)."""
        import time

        t0 = time.time()
        dev = self._prepare(self._flatten(group))
        self.metrics.record_ingest(time.time() - t0, len(group))
        out = self._v(dev)  # async dispatch
        if self._pending is not None:
            self._fold(self._pending, on_batch)
        self._pending = (out, live)

    def flush(self, on_batch=None) -> None:
        """Block on the last in-flight batch and fold its verdict."""
        if self._pending is not None:
            self._fold(self._pending, on_batch)
            self._pending = None

    def run(
        self,
        proofs: Iterable[Tuple],
        on_batch: Optional[Callable[[StreamMetrics], None]] = None,
    ) -> StreamMetrics:
        """Verify a stream; returns the final metrics. `on_batch(metrics)`
        fires after each batch's verdict lands (for progress lines)."""
        for group, live in self._batches(proofs):
            self.submit(group, live, on_batch)
        self.flush(on_batch)
        return self.metrics

    def _fold(self, pending, on_batch) -> None:
        import time

        import jax

        out, live = pending
        t0 = time.time()
        ok = np.asarray(jax.device_get(out["ok"]))[:live]
        self.metrics.record_device_wait(time.time() - t0)
        self.metrics.record_batch(live, int(ok.sum()))
        if on_batch is not None:
            on_batch(self.metrics)


class BucketedStreamVerifier:
    """Mixed-shape streaming (BASELINE config 3): items are
    (common, vkey, proof) triples; they bucket by `template_key(common)` and
    each bucket runs its own per-template StreamVerifier. Templates compile
    lazily on first sight of a shape, batches dispatch interleaved as
    buckets fill, and partial buckets pad+flush at end-of-stream exactly
    like the single-shape driver. With `raw_json=True` the vkey/proof slots
    carry JSON bytes for the native ingest (common stays a parsed object —
    it is the bucket key)."""

    def __init__(
        self,
        batch: int,
        mesh=None,
        shard_queries: bool = True,
        raw_json: bool = False,
        ingest_workers: int = 0,
    ):
        self.batch = batch
        self.mesh = mesh
        self.shard_queries = shard_queries
        self.raw_json = raw_json
        self.ingest_workers = ingest_workers
        self._buckets: dict = {}  # key -> (StreamVerifier, buffer list)

    def _bucket(self, common: CommonCircuitData):
        key = template_key(common)
        if key not in self._buckets:
            sv = StreamVerifier(
                CircuitTemplate(common),
                self.batch,
                mesh=self.mesh,
                shard_queries=self.shard_queries,
                raw_json=self.raw_json,
                ingest_workers=self.ingest_workers,
            )
            self._buckets[key] = (sv, [])
        return key, self._buckets[key]

    def run(
        self,
        items: Iterable[Tuple],
        on_batch: Optional[Callable[[str, StreamMetrics], None]] = None,
    ) -> dict:
        """Verify a mixed stream; returns {shape_key: StreamMetrics}.
        `on_batch(shape_key, metrics)` fires per folded batch."""
        for common, vkey, proof in items:
            key, (sv, buf) = self._bucket(common)
            buf.append((vkey, proof))
            if len(buf) == self.batch:
                cb = (lambda m, k=key: on_batch(k, m)) if on_batch else None
                sv.submit(list(buf), self.batch, cb)
                buf.clear()
        for key, (sv, buf) in self._buckets.items():
            cb = (lambda m, k=key: on_batch(k, m)) if on_batch else None
            if buf:
                live = len(buf)
                sv.submit(buf + [buf[-1]] * (self.batch - live), live, cb)
                buf.clear()
            sv.flush(cb)
        return {k: sv.metrics for k, (sv, _) in self._buckets.items()}
