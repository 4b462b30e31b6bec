"""CLI driver (__main__.py): fixture generation + verify round-trip, and
the reject exit code — the testmain.hs-shaped end-to-end surface."""

import copy
import json
import os

import pytest

from plonky2_verifier_tpu.__main__ import main


@pytest.fixture(scope="module")
def prefix(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "fib")
    rc = main(["fixture", "fibonacci", out, "--queries", "6", "--pow-bits", "4"])
    assert rc == 0
    for kind in ("common", "vkey", "proof"):
        assert os.path.exists(f"{out}_{kind}.json")
    return out


def test_cli_golden_verify_accepts(prefix, capsys):
    rc = main(["verify", prefix, "--backend", "golden"])
    assert rc == 0
    outp = capsys.readouterr().out
    assert "PI hash" in outp and "verified (golden" in outp


def _write_corrupt(prefix, tmp_path, name="bad"):
    with open(f"{prefix}_proof.json") as f:
        obj = json.load(f)
    bad = copy.deepcopy(obj)
    bad["proof"]["opening_proof"]["pow_witness"] ^= 1
    bad_prefix = str(tmp_path / name)
    for kind in ("common", "vkey"):
        with open(f"{prefix}_{kind}.json") as src, open(f"{bad_prefix}_{kind}.json", "w") as dst:
            dst.write(src.read())
    with open(f"{bad_prefix}_proof.json", "w") as f:
        json.dump(bad, f)
    return bad_prefix


def test_cli_golden_verify_rejects_mutation(prefix, tmp_path):
    rc = main(["verify", _write_corrupt(prefix, tmp_path), "--backend", "golden", "--quiet"])
    assert rc == 1


def test_cli_jax_verify_accepts_batch(prefix, capsys):
    """The device-backend CLI glue: batch flag, per-lane booleans, exit code
    from ok.all() (__main__.py _cmd_verify jax branch)."""
    rc = main(["verify", prefix, "--backend", "jax", "--batch", "2"])
    assert rc == 0
    outp = capsys.readouterr().out
    assert "verified (jax, batch 2" in outp and "2/2" in outp


def test_cli_jax_verify_rejects_mutation(prefix, tmp_path):
    rc = main(["verify", _write_corrupt(prefix, tmp_path), "--backend", "jax", "--quiet"])
    assert rc == 1


def test_cli_stream_dir(prefix, tmp_path, capsys):
    """`stream` over a directory of proof triples: native raw ingest, batch
    padding, exit code 0 on all-accept."""
    import shutil

    d = tmp_path / "streamdir"
    d.mkdir()
    for kind in ("common", "vkey", "proof"):
        shutil.copy(f"{prefix}_{kind}.json", d / f"fib_{kind}.json")
    rc = main(["stream", str(d), "--batch", "2", "--repeat", "3", "--quiet"])
    outp = capsys.readouterr().out
    assert rc == 0
    summary = json.loads(outp.strip().splitlines()[-1])
    assert summary["proofs"] == 3 and summary["accepted"] == 3
    assert summary["shapes"] == 1


def test_cli_stream_jsonl_detects_corrupt(prefix, tmp_path, capsys):
    """Manifest mode with a corrupted lane: per-shape metrics fold it in and
    the exit code flips."""
    bad_prefix = _write_corrupt(prefix, tmp_path, "streambad")
    manifest = tmp_path / "m.jsonl"
    manifest.write_text(
        json.dumps({"prefix": prefix})
        + "\n"
        + json.dumps(
            {
                "common_file": f"{bad_prefix}_common.json",
                "vkey_file": f"{bad_prefix}_vkey.json",
                "proof_file": f"{bad_prefix}_proof.json",
            }
        )
        + "\n"
    )
    rc = main(["stream", str(manifest), "--batch", "2", "--quiet"])
    outp = capsys.readouterr().out
    assert rc == 1
    summary = json.loads(outp.strip().splitlines()[-1])
    assert summary["proofs"] == 2 and summary["rejected"] == 1


def test_cli_stream_empty_dir_is_an_error(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    assert main(["stream", str(d), "--quiet"]) == 2
