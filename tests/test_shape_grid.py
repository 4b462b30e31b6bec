"""Device-path shape-grid coverage (SURVEY §5 'config': shape is data).

Rounds 1-4 verified the device path only at a handful of fixed shapes;
cap_height / arity_bits / final_poly_bits variation was golden-only. This
tier proves + device-verifies a 6-point diagonal of the
{cap_height 0/2/4} x {arity_bits 1/2/3} x {final_poly_bits 0/1/2} grid
(every axis value appears >=2x), with four fault injections per point
against the same compiled executable. The FRI parameter derivations under
test mirror reference Types.hs:151-171 and Plonk/FRI.hs:337-354.

Each point runs in its own subprocess (tests/shape_grid_check.py) so the
XLA:CPU compiles — the dominant cost, ~40-60 s/shape on a 2-core host —
overlap two at a time instead of serializing through one process.
"""

import json
import os
import subprocess
import sys

import pytest

GRID = [
    (0, 1, 0),
    (2, 2, 1),
    (4, 3, 2),
    (0, 3, 1),
    (2, 1, 2),
    (4, 2, 0),
]


def test_shape_grid_device():
    script = os.path.join(os.path.dirname(__file__), "shape_grid_check.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}

    procs = {}
    results = {}

    def launch(point):
        cap, ar, fp = point
        procs[point] = subprocess.Popen(
            [sys.executable, script, str(cap), str(ar), str(fp)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )

    def collect(point):
        p = procs.pop(point)
        out, err = p.communicate(timeout=900)
        lines = [l for l in out.splitlines() if l.startswith("{")]
        assert p.returncode == 0 and lines, f"{point}: rc={p.returncode}\n{err[-2000:]}"
        results[point] = json.loads(lines[-1])

    # two in flight at a time (2-core host; each compile is mostly 1 LLVM thread)
    pending = list(GRID)
    inflight = []
    while pending or inflight:
        while pending and len(inflight) < 2:
            pt = pending.pop(0)
            launch(pt)
            inflight.append(pt)
        collect(inflight.pop(0))

    for pt, r in results.items():
        assert r["pass"], f"{pt}: {r}"
        assert r["cap_len"] == 1 << min(pt[0], r["degree_bits"] + 3)
    # the grid really exercised distinct fold structures
    assert len({r["steps"] for r in results.values()}) >= 2
    assert len({r["final_poly_len"] for r in results.values()}) >= 2
    assert len({r["cap_len"] for r in results.values()}) >= 2
