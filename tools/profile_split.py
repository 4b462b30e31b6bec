import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
from plonky2_verifier_tpu.models.fibonacci import fibonacci_fixture
from plonky2_verifier_tpu.prover.prove import prove
from plonky2_verifier_tpu.verifier_jax import JaxVerifier, sponge_rows
from plonky2_verifier_tpu.ops.field import G, GExt
from plonky2_verifier_tpu.ops import field as jf

fx = fibonacci_fixture(num_query_rounds=6)
vkey, pwp = prove(fx)
tpl = CircuitTemplate(fx.common)
arrays = flatten_proofs(tpl, [(vkey, pwp)] * 3)
v = JaxVerifier(tpl)
dev = v.prepare(arrays)
print("setup done", flush=True)


def timeit(name, fn, *args):
    t = time.time()
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t1 = time.time() - t
    t = time.time()
    for _ in range(3):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: compile+1 {t1:.1f}s, steady {(time.time()-t)/3*1000:.1f}ms", flush=True)
    return out


B = 3
r = tpl.r

def transcript_part(a):
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

timeit("transcript_part", transcript_part, dev)


def plonk_part(a):
    pi_hash = sponge_rows(a["public_inputs"], tpl.n_pi)
    o1 = GExt(G(a["openings1"].hi[..., 0], a["openings1"].lo[..., 0]),
              G(a["openings1"].hi[..., 1], a["openings1"].lo[..., 1]))
    o2 = GExt(G(a["openings2"].hi[..., 0], a["openings2"].lo[..., 0]),
              G(a["openings2"].hi[..., 1], a["openings2"].lo[..., 1]))
    ncc = tpl.n_const_cols
    s0 = 0
    constants = o1[:, s0:s0+ncc]; s0 += ncc
    sigmas = o1[:, s0:s0+tpl.n_sigmas]; s0 += tpl.n_sigmas
    wires = o1[:, s0:s0+tpl.num_wires]; s0 += tpl.num_wires
    zs = o1[:, s0:s0+tpl.n_zs]; s0 += tpl.n_zs
    pps = o1[:, s0:s0+tpl.n_pp]; s0 += tpl.n_pp
    quots = o1[:, s0:s0+tpl.n_quot]
    zs_next = o2[:, :tpl.n_zs]
    fake = jf.constant(3, (B,))
    betas = [fake]*r; gammas=[fake]*r; alphas=[fake]*r
    zeta = GExt(fake, fake)
    return v._plonk_checks(a, pi_hash, constants, sigmas, wires, zs, zs_next, pps, quots, betas, gammas, alphas, zeta)

timeit("plonk_part", plonk_part, dev)


def fri_part(a):
    o1 = GExt(G(a["openings1"].hi[..., 0], a["openings1"].lo[..., 0]),
              G(a["openings1"].hi[..., 1], a["openings1"].lo[..., 1]))
    o2 = GExt(G(a["openings2"].hi[..., 0], a["openings2"].lo[..., 0]),
              G(a["openings2"].hi[..., 1], a["openings2"].lo[..., 1]))
    final_poly = GExt(G(a["final_poly"].hi[..., 0], a["final_poly"].lo[..., 0]),
                      G(a["final_poly"].hi[..., 1], a["final_poly"].lo[..., 1]))
    fake = jf.constant(3, (B,))
    zeta = GExt(fake, fake)
    fri_alpha = GExt(fake, fake)
    fri_betas = [GExt(fake, fake) for _ in tpl.steps]
    qidx = jnp.zeros((B, tpl.num_queries), dtype=jnp.uint32)
    return v._fri_checks(a, o1, o2, zeta, fri_alpha, fri_betas, fake, qidx, final_poly)

timeit("fri_part", fri_part, dev)
