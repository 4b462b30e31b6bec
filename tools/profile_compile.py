"""Decompose verifier compile time by stage: lower+compile each piece of
JaxVerifier separately (fresh in-memory cache, persistent cache off) and
report HLO module sizes. Prints one JSON line at the end (the COMPILE_r05
artifact row). Usage:
    python tools/profile_compile.py [model] [num_query_rounds]
Backend: XLA:CPU by default (tunnel-free — the axon TPU tunnel makes
compile_s noise, BENCH_WARM_r04.json); set P2V_PROFILE_TPU=1 to measure the
real chip instead."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
TPU = os.environ.get("P2V_PROFILE_TPU") == "1"
if not TPU:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

if not TPU:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
from plonky2_verifier_tpu.verifier_jax import JaxVerifier, sponge_rows
from plonky2_verifier_tpu.ops import field as jf

MODEL = sys.argv[1] if len(sys.argv) > 1 else "fibonacci"
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 4
B = 2

from plonky2_verifier_tpu.prover.prove import prove

if MODEL == "fibonacci":
    from plonky2_verifier_tpu.models.fibonacci import fibonacci_fixture

    fx = fibonacci_fixture(num_query_rounds=Q)
elif MODEL == "lookup":
    from plonky2_verifier_tpu.models.lookup import lookup_fixture

    fx = lookup_fixture(table_size=8, n_lookups=6, num_query_rounds=Q, proof_of_work_bits=2)
elif MODEL == "fibonacci12":
    from plonky2_verifier_tpu.models.cache import get_fixture_proof

    common, vkey, pwp = get_fixture_proof(
        "fibonacci", n_arith_rows=4093, num_query_rounds=28, proof_of_work_bits=16
    )
    fx = None
elif MODEL == "gate_zoo":
    from plonky2_verifier_tpu.models.gate_zoo import gate_zoo_fixture

    fx = gate_zoo_fixture(num_query_rounds=Q, proof_of_work_bits=4)
else:
    raise SystemExit(f"unknown model {MODEL}")

if fx is not None:
    vkey, pwp = prove(fx)
    common = fx.common

tpl = CircuitTemplate(common)
arrays = flatten_proofs(tpl, [(vkey, pwp)] * B)
v = JaxVerifier(tpl)
dev = v.prepare(arrays)
print(f"model={MODEL} degree_bits={tpl.degree_bits} Q={tpl.num_queries} gates={len(common.gates)}", flush=True)


STAGES = []


def profile(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.time() - t0
    txt = lowered.as_text()
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    out = compiled(*args)
    jax.block_until_ready(out)
    t_exec = time.time() - t0
    print(
        f"{name:18s} lower {t_lower:6.1f}s  compile {t_compile:6.1f}s  exec {t_exec:8.3f}s  hlo {len(txt)/1e6:7.2f} MB  lines {txt.count(chr(10)):>8}",
        flush=True,
    )
    STAGES.append(
        {
            "stage": name.strip(),
            "lower_s": round(t_lower, 2),
            "compile_s": round(t_compile, 2),
            "exec_s": round(t_exec, 3),
            "hlo_mb": round(len(txt) / 1e6, 2),
            "hlo_lines": txt.count(chr(10)),
        }
    )
    return compiled


ONLY = os.environ.get("P2V_PROFILE_STAGES", "").split(",") if os.environ.get("P2V_PROFILE_STAGES") else None


def want(name):
    return ONLY is None or any(s and s in name for s in ONLY)


# full verify
if want("FULL"):
    profile("FULL _verify", v._verify, dev)

# transcript only
def transcript(a):
    pi_hash = sponge_rows(a["public_inputs"], tpl.n_pi)
    data = jf.concat(
        [a["circuit_digest"], pi_hash, a["cap_w"].reshape(B, -1), a["cap_zp"].reshape(B, -1),
         a["cap_q"].reshape(B, -1), a["openings1"].reshape(B, -1), a["openings2"].reshape(B, -1)]
        + [a[f"step_cap_{s}"].reshape(B, -1) for s in range(len(tpl.steps))]
        + [a["final_poly"].reshape(B, -1), a["pow_witness"].reshape(-1, 1)],
        axis=1,
    )
    ch = v._run_transcript(data)
    return ch["zeta"][0].hi


if want("transcript"):
    profile("transcript", transcript, dev)


def fri_only(a):
    from plonky2_verifier_tpu.ops.field import G, GExt

    o1 = GExt(G(a["openings1"].hi[..., 0], a["openings1"].lo[..., 0]),
              G(a["openings1"].hi[..., 1], a["openings1"].lo[..., 1]))
    o2 = GExt(G(a["openings2"].hi[..., 0], a["openings2"].lo[..., 0]),
              G(a["openings2"].hi[..., 1], a["openings2"].lo[..., 1]))
    fp = GExt(G(a["final_poly"].hi[..., 0], a["final_poly"].lo[..., 0]),
              G(a["final_poly"].hi[..., 1], a["final_poly"].lo[..., 1]))
    zeta = o1[:, 0]
    fri_alpha = o1[:, 1]
    fri_betas = [o1[:, 2 + i] for i in range(len(tpl.steps))]
    pow_response = o1[:, 0].re
    qidx = jnp.zeros((B, tpl.num_queries), dtype=jnp.uint32)
    return v._fri_checks(a, o1, o2, zeta, fri_alpha, fri_betas, pow_response, qidx, fp)


if want("fri"):
    profile("fri_checks", fri_only, dev)


def plonk_only(a):
    from plonky2_verifier_tpu.ops.field import G, GExt

    pi_hash = sponge_rows(a["public_inputs"], tpl.n_pi)
    o1 = GExt(G(a["openings1"].hi[..., 0], a["openings1"].lo[..., 0]),
              G(a["openings1"].hi[..., 1], a["openings1"].lo[..., 1]))
    o2 = GExt(G(a["openings2"].hi[..., 0], a["openings2"].lo[..., 0]),
              G(a["openings2"].hi[..., 1], a["openings2"].lo[..., 1]))
    ncc = tpl.n_const_cols
    s0 = 0
    constants = o1[:, s0 : s0 + ncc]; s0 += ncc
    sigmas = o1[:, s0 : s0 + tpl.n_sigmas]; s0 += tpl.n_sigmas
    wires = o1[:, s0 : s0 + tpl.num_wires]; s0 += tpl.num_wires
    zs = o1[:, s0 : s0 + tpl.n_zs]; s0 += tpl.n_zs
    pps = o1[:, s0 : s0 + tpl.n_pp]; s0 += tpl.n_pp
    quots = o1[:, s0 : s0 + tpl.n_quot]; s0 += tpl.n_quot
    lookup_zs = o1[:, s0 : s0 + tpl.n_lookup]
    zs_next = o2[:, : tpl.n_zs]
    lookup_zs_next = o2[:, tpl.n_zs :]
    zeta = o1[:, 0]
    betas = [o1[:, 1 + i].re for i in range(tpl.r)]
    gammas = [o1[:, 1 + tpl.r + i].re for i in range(tpl.r)]
    alphas = [o1[:, 1 + 2 * tpl.r + i].re for i in range(tpl.r)]
    deltas = []
    if tpl.common.num_lookup_polys > 0:
        pool = betas + gammas + [o1[:, 4 + i].re for i in range(2 * tpl.r)]
        deltas = [tuple(pool[i : i + 4]) for i in range(0, len(pool), 4)]
    return v._plonk_checks(a, pi_hash, constants, sigmas, wires, zs, zs_next, pps,
                           lookup_zs, lookup_zs_next, quots, betas, gammas, alphas, deltas, zeta)


if want("plonk"):
    profile("plonk_checks", plonk_only, dev)

import json

print(
    json.dumps(
        {
            "model": MODEL,
            "backend": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "degree_bits": tpl.degree_bits,
            "num_queries": tpl.num_queries,
            "batch": B,
            "stages": STAGES,
        }
    ),
    flush=True,
)
