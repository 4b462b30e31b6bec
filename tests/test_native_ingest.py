"""Native C++ proof ingest (plonky2_verifier_tpu.native): bit-exact vs the
Python flattener, malformed-input rejection, thread-pool path, and the
raw-JSON stream tier."""

import json

import numpy as np
import pytest

from plonky2_verifier_tpu.compiler import CircuitTemplate, flatten_proofs
from plonky2_verifier_tpu.models.fibonacci import fibonacci_fixture
from plonky2_verifier_tpu.native import flatten_proof_jsons, get_fastload
from plonky2_verifier_tpu.prover.prove import prove

if get_fastload() is None:  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def fib():
    fx = fibonacci_fixture(num_query_rounds=6)
    vkey, pwp = prove(fx)
    tpl = CircuitTemplate(fx.common)
    vk_b = json.dumps(vkey.to_json()).encode()
    pf_b = json.dumps(pwp.to_json()).encode()
    return fx, tpl, (vkey, pwp), (vk_b, pf_b)


def test_native_matches_python_flatten(fib):
    fx, tpl, objs, raw = fib
    ref = flatten_proofs(tpl, [objs] * 3)
    got = flatten_proof_jsons(tpl, [raw] * 3, workers=0)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].dtype == np.uint64 and got[k].shape == ref[k].shape, k
        assert (got[k] == ref[k]).all(), k


def test_native_thread_pool_matches(fib):
    fx, tpl, objs, raw = fib
    ref = flatten_proofs(tpl, [objs] * 5)
    got = flatten_proof_jsons(tpl, [raw] * 5, workers=4)
    for k in ref:
        assert (got[k] == ref[k]).all(), k


def test_native_rejects_malformed(fib):
    fx, tpl, objs, (vk_b, pf_b) = fib
    with pytest.raises(ValueError):
        flatten_proof_jsons(tpl, [(vk_b, pf_b[:-50])])  # truncated JSON
    with pytest.raises(ValueError):
        flatten_proof_jsons(tpl, [(pf_b, pf_b)])  # wrong document for vkey
    # structurally valid JSON, wrong shape: drop one opening
    obj = json.loads(pf_b)
    obj["proof"]["openings"]["wires"] = obj["proof"]["openings"]["wires"][:-1]
    with pytest.raises(ValueError, match="wire openings"):
        flatten_proof_jsons(tpl, [(vk_b, json.dumps(obj).encode())])
    # mutated value still parses (semantic rejection is the verifier's job)
    obj = json.loads(pf_b)
    obj["proof"]["opening_proof"]["pow_witness"] ^= 1
    out = flatten_proof_jsons(tpl, [(vk_b, json.dumps(obj).encode())])
    assert out["pow_witness"][0] != np.uint64(json.loads(pf_b.decode())["proof"]["opening_proof"]["pow_witness"])


def test_native_duplicate_key_rejected(fib):
    """Parser-differential guard: json.loads is last-wins on duplicated keys
    while a naive native parser is first-wins — the same untrusted bytes must
    not be read differently by the two ingest tiers. Both raw tiers REJECT:
    the native parser throws on a duplicated schema key, and the Python
    fallback uses native.strict_loads."""
    from plonky2_verifier_tpu.native import strict_loads

    fx, tpl, objs, (vk_b, pf_b) = fib
    # splice a second pow_witness into the opening_proof object
    marker = b'"pow_witness":'
    i = pf_b.index(marker)
    dup = pf_b[:i] + b'"pow_witness": 12345, ' + pf_b[i:]
    with pytest.raises(ValueError, match="duplicate key"):
        flatten_proof_jsons(tpl, [(vk_b, dup)])
    with pytest.raises(ValueError, match="duplicate key"):
        strict_loads(dup)


def test_native_trailing_garbage_rejected(fib):
    fx, tpl, objs, (vk_b, pf_b) = fib
    with pytest.raises(ValueError, match="trailing"):
        flatten_proof_jsons(tpl, [(vk_b, pf_b + b" {}")])
    with pytest.raises(ValueError, match="trailing"):
        flatten_proof_jsons(tpl, [(vk_b + b"7", pf_b)])


def test_native_key_order_and_unknown_keys(fib):
    """The single-pass parser dispatches on key names, not position: a
    reordered document and one with extra unknown keys must flatten to the
    same arrays (json.loads tolerance, minus duplicates)."""
    fx, tpl, objs, (vk_b, pf_b) = fib
    ref = flatten_proofs(tpl, [objs])

    def reorder(o):
        if isinstance(o, dict):
            return {k: reorder(o[k]) for k in reversed(list(o))}
        if isinstance(o, list):
            return [reorder(x) for x in o]
        return o

    obj = reorder(json.loads(pf_b))
    obj["extra_field"] = {"nested": [1, 2, {"deep": "str"}], "b": True, "n": None}
    got = flatten_proof_jsons(tpl, [(vk_b, json.dumps(obj).encode())])
    for k in ref:
        assert (got[k] == ref[k]).all(), k


def test_python_fallback_matches_native(fib, monkeypatch):
    """flatten_proof_jsons must produce identical arrays with the toolchain
    absent (the documented pure-Python fallback path)."""
    import plonky2_verifier_tpu.native as native

    fx, tpl, objs, raw = fib
    ref = flatten_proof_jsons(tpl, [raw] * 2, workers=0)
    monkeypatch.setattr(native, "get_fastload", lambda: None)
    got = native.flatten_proof_jsons(tpl, [raw] * 2, workers=0)
    for k in ref:
        assert (got[k] == ref[k]).all(), k


def test_native_parser_byte_fuzz(fib):
    """Adversarial-bytes robustness of the single-pass C++ parser: random
    truncations, splices, byte flips, and structural garbage over real proof
    bytes must either parse to SOME array contents or raise ValueError —
    never crash the process or write out of bounds. 200 seeded mutations."""
    import random

    fx, tpl, objs, (vk_b, pf_b) = fib
    rng = random.Random(1234)
    junk = [b"{", b"}", b"[", b"]", b",", b":", b'"', b"\\", b"-", b"9" * 30, b"null", b"1e9", b"\x00", b"\xff"]
    for trial in range(200):
        b = bytearray(pf_b)
        op = rng.randrange(4)
        if op == 0:  # truncate
            del b[rng.randrange(1, len(b)) :]
        elif op == 1:  # flip a byte
            i = rng.randrange(len(b))
            b[i] ^= rng.randrange(1, 256)
        elif op == 2:  # splice junk in
            i = rng.randrange(len(b))
            b[i:i] = rng.choice(junk)
        else:  # delete a span
            i = rng.randrange(len(b))
            del b[i : i + rng.randrange(1, 40)]
        try:
            flatten_proof_jsons(tpl, [(vk_b, bytes(b))])
        except ValueError:
            pass  # clean structured rejection is the expected outcome


def test_raw_json_stream_tier(fib):
    from plonky2_verifier_tpu.parallel.stream import StreamVerifier

    fx, tpl, objs, raw = fib
    sv = StreamVerifier(tpl, batch=2, raw_json=True, ingest_workers=2)
    m = sv.run([raw] * 5)  # 2 full batches + padded partial
    assert m.proofs == 5 and m.accepted == 5 and m.rejected == 0


def test_raw_json_bucketed_stream(fib):
    from plonky2_verifier_tpu.parallel.stream import BucketedStreamVerifier, template_key

    fx, tpl, objs, (vk_b, pf_b) = fib
    bsv = BucketedStreamVerifier(batch=2, raw_json=True, ingest_workers=2)
    per_shape = bsv.run([(fx.common, vk_b, pf_b)] * 3)
    key = template_key(fx.common)
    assert per_shape[key].proofs == 3 and per_shape[key].accepted == 3
