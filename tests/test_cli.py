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


def test_cli_golden_verify_rejects_mutation(prefix, tmp_path):
    with open(f"{prefix}_proof.json") as f:
        obj = json.load(f)
    bad = copy.deepcopy(obj)
    bad["proof"]["opening_proof"]["pow_witness"] ^= 1
    bad_prefix = str(tmp_path / "bad")
    for kind in ("common", "vkey"):
        with open(f"{prefix}_{kind}.json") as src, open(f"{bad_prefix}_{kind}.json", "w") as dst:
            dst.write(src.read())
    with open(f"{bad_prefix}_proof.json", "w") as f:
        json.dump(bad, f)
    rc = main(["verify", bad_prefix, "--backend", "golden", "--quiet"])
    assert rc == 1
