"""Multi-process jax.distributed dryrun of the sharded verifier (SURVEY §2.8
collectives tier; multi-host shape of the reference's single verifyProof
unit of work, Plonk/Verifier.hs:56-66).

Parent mode (no args): spawns P2V_DIST_NPROC child processes (default 2)
wired to a localhost coordinator (P2V_DISTRIBUTED=1 + the standard JAX_*
env), each owning P2V_DIST_LOCAL virtual CPU devices (default 4) of a
global ('dp','qp') mesh. Each child verifies its addressable shards of one
global proof batch containing ONE corrupted lane; the psum'd `n_valid`
must equal batch-1 in EVERY process — the verdict reduction really crossed
the process boundary and the fault was detected across it. Writes
P2V_DIST_OUT (default DISTRIBUTED_r05.json) at the repo root.

The 8-process x 1-device setting (P2V_DIST_NPROC=8 P2V_DIST_LOCAL=1) is the
pure-DCN shape: every collective hop crosses a process boundary.

Child mode (``--child``): uses `parallel.stream.init_distributed` (the
env-gated production hook) and `jax.make_array_from_callback` so each
process materializes only its addressable shards.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("P2V_COORD_PORT", "29517"))
NPROC = int(os.environ.get("P2V_DIST_NPROC", "2"))
LOCAL_DEVICES = int(os.environ.get("P2V_DIST_LOCAL", "4"))
QUERIES = int(os.environ.get("P2V_DIST_QUERIES", "8"))
OUT = os.environ.get("P2V_DIST_OUT", "DISTRIBUTED_r05.json")
BATCH = NPROC * LOCAL_DEVICES  # one proof per global 'dp' slot
BAD_LANE = 1 % BATCH  # exactly one corrupted lane in the global batch


def child():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from plonky2_verifier_tpu.parallel.stream import init_distributed

    assert init_distributed(), "P2V_DISTRIBUTED env must gate this child"
    pid = jax.process_index()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())

    from jax.sharding import NamedSharding

    from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
    from plonky2_verifier_tpu.models.cache import get_fixture_proof
    from plonky2_verifier_tpu.ops import field as jf
    from plonky2_verifier_tpu.parallel import ShardedVerifier, make_mesh

    common, vkey, pwp = get_fixture_proof("fibonacci", num_query_rounds=QUERIES)
    tpl = CircuitTemplate(common)
    import copy

    bad = copy.deepcopy(pwp)
    bad.proof.opening_proof.pow_witness ^= 1
    lanes = [(vkey, bad if i == BAD_LANE else pwp) for i in range(BATCH)]
    arrays = flatten_proofs(tpl, lanes)

    mesh = make_mesh(jax.devices(), dp=n_global // 2, qp=2)
    sv = ShardedVerifier(tpl, mesh)

    def shard_global(arrays):
        # every process holds the full host batch; each materializes only
        # its addressable shards of the global arrays
        out = {}
        for k, v in arrays.items():
            g = jf.from_u64(v)
            sh = NamedSharding(mesh, sv._spec_for(k))
            out[k] = jax.tree.map(
                lambda x, sh=sh: jax.make_array_from_callback(
                    x.shape, sh, lambda idx, x=x: x[idx]
                ),
                g,
            )
        return out

    t0 = time.time()
    out = sv(shard_global(arrays))
    n_valid = int(jax.device_get(out["n_valid"]))  # replicated => addressable
    want = BATCH - 1  # the corrupted lane must be rejected mesh-wide
    print(
        json.dumps(
            {
                "process": pid,
                "global_devices": n_global,
                "local_devices": n_local,
                "batch": BATCH,
                "corrupt_lane": BAD_LANE,
                "n_valid": n_valid,
                "wall_s": round(time.time() - t0, 1),
                "ok": n_valid == want,
            }
        ),
        flush=True,
    )
    sys.exit(0 if n_valid == want else 1)


def parent():
    procs = []
    for i in range(NPROC):
        env = dict(os.environ)
        env.update(
            P2V_DISTRIBUTED="1",
            JAX_COORDINATOR_ADDRESS=f"localhost:{PORT}",
            JAX_NUM_PROCESSES=str(NPROC),
            JAX_PROCESS_ID=str(i),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--child"],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                cwd=REPO,
            )
        )
    results, ok = [], True
    for p in procs:
        try:
            out, err = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            ok = False
        lines = [l for l in out.splitlines() if l.startswith("{")]
        if lines:
            results.append(json.loads(lines[-1]))
        else:
            results.append({"error": err[-2000:]})
            ok = False
        ok = ok and p.returncode == 0
    report = {
        "ok": ok and all(r.get("ok") for r in results),
        "processes": results,
        "mesh": {"dp": NPROC * LOCAL_DEVICES // 2, "qp": 2},
        "corrupt_lane": BAD_LANE,
        "transport": "gloo cross-process CPU collectives (DCN stand-in)",
    }
    path = os.path.join(REPO, OUT)
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    child() if "--child" in sys.argv else parent()
