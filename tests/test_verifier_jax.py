"""End-to-end: flattened proofs through the batched JAX verifier, checked
against the golden verifier (verdicts) and golden challenges (bit-exact
transcript intermediates)."""

import numpy as np
import pytest

from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
from plonky2_verifier_tpu.golden import field as gf
from plonky2_verifier_tpu.golden.challenges import proof_challenges
from plonky2_verifier_tpu.models.fibonacci import fibonacci_fixture
from plonky2_verifier_tpu.models.poseidon_chain import poseidon_chain_fixture
from plonky2_verifier_tpu.prover.prove import prove
from plonky2_verifier_tpu.verifier_jax import JaxVerifier


def _u64pair(g):
    hi, lo = np.asarray(g[0], dtype=np.uint64), np.asarray(g[1], dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


@pytest.fixture(scope="module")
def fib_batch():
    fx = fibonacci_fixture(num_query_rounds=6)
    vkey, pwp = prove(fx)
    return fx, [(vkey, pwp)] * 3


@pytest.fixture(scope="module")
def pos_batch():
    fx = poseidon_chain_fixture(n_chain=6, num_query_rounds=5, arity_bits=2, final_poly_bits=1)
    vkey, pwp = prove(fx)
    return fx, [(vkey, pwp)] * 2


def test_fibonacci_jax_verifies(fib_batch):
    fx, proofs = fib_batch
    tpl = CircuitTemplate(fx.common)
    arrays = flatten_proofs(tpl, proofs)
    v = JaxVerifier(tpl, debug=True)
    out = v(v.prepare(arrays))
    assert np.asarray(out["eqs_ok"]).all(), "plonk equations failed"
    assert np.asarray(out["fri_ok"]).all(), "fri failed"
    assert np.asarray(out["ok"]).all()

    # transcript intermediates must be bit-exact vs golden
    vkey, pwp = proofs[0]
    ch = proof_challenges(fx.common, vkey, pwp)
    dbg = out["debug"]
    zre = _u64pair(dbg["zeta"][:2])
    zim = _u64pair(dbg["zeta"][2:])
    assert int(zre[0]) == ch.zeta[0] and int(zim[0]) == ch.zeta[1]
    for i, b in enumerate(ch.betas):
        assert int(_u64pair(dbg["betas"][i])[0]) == b
    for i, al in enumerate(ch.alphas):
        assert int(_u64pair(dbg["alphas"][i])[0]) == al
    assert int(_u64pair(dbg["pow_response"])[0]) == ch.fri.pow_response
    assert [int(x) for x in np.asarray(dbg["query_indices"])[0]] == ch.fri.query_indices
    from plonky2_verifier_tpu.golden.hashing import sponge

    assert tuple(int(x) for x in _u64pair(dbg["pi_hash"])[0]) == sponge(pwp.public_inputs)


def test_heterogeneous_batch_transcripts_bit_exact():
    """Every lane of a distinct-proof batch carries its own transcript; the
    device intermediates must match each proof's golden challenges
    per-lane (not just lane 0 of a homogeneous batch)."""
    fx0 = fibonacci_fixture(num_query_rounds=6)  # shares the template below
    tpl = CircuitTemplate(fx0.common)
    lanes = []
    for x0, x1 in [(1, 2), (3, 5), (10, 11), (7, 1)]:
        fx = fibonacci_fixture(num_query_rounds=6, x0=x0, x1=x1)
        assert fx.common.to_json() == fx0.common.to_json(), "shape must be shared"
        lanes.append(prove(fx))
    arrays = flatten_proofs(tpl, lanes)
    v = JaxVerifier(tpl, debug=True)
    out = v(v.prepare(arrays))
    assert np.asarray(out["ok"]).all()
    dbg = out["debug"]
    zre = _u64pair(dbg["zeta"][:2])
    zim = _u64pair(dbg["zeta"][2:])
    qidx = np.asarray(dbg["query_indices"])
    for lane, (vkey, pwp) in enumerate(lanes):
        ch = proof_challenges(fx0.common, vkey, pwp)
        assert (int(zre[lane]), int(zim[lane])) == ch.zeta, f"lane {lane} zeta"
        for i, b in enumerate(ch.betas):
            assert int(_u64pair(dbg["betas"][i])[lane]) == b
        for i, al in enumerate(ch.alphas):
            assert int(_u64pair(dbg["alphas"][i])[lane]) == al
        assert int(_u64pair(dbg["pow_response"])[lane]) == ch.fri.pow_response
        assert [int(x) for x in qidx[lane]] == ch.fri.query_indices
    # distinct proofs really have distinct transcripts
    assert len({int(z) for z in zre}) == len(lanes)


def test_poseidon_chain_jax_verifies(pos_batch):
    fx, proofs = pos_batch
    tpl = CircuitTemplate(fx.common)
    assert tpl.steps, "fixture must exercise fold steps"
    arrays = flatten_proofs(tpl, proofs)
    v = JaxVerifier(tpl)
    out = v(v.prepare(arrays))
    assert np.asarray(out["ok"]).all()


def test_jax_rejects_mutations(fib_batch):
    fx, proofs = fib_batch
    tpl = CircuitTemplate(fx.common)
    arrays = flatten_proofs(tpl, proofs)
    v = JaxVerifier(tpl)

    # mutate a different component in each batch lane
    targets = ["openings1", "pow_witness", "leaves_1", "final_poly", "public_inputs", "circuit_digest"]
    for t in targets:
        m = {k: v2.copy() for k, v2 in arrays.items()}
        flat = m[t].reshape(-1)
        flat[0] ^= np.uint64(1)
        out = v(v.prepare(m))
        ok = np.asarray(out["ok"])
        assert not ok[0], f"mutating {t} was accepted"
