#!/usr/bin/env python3
"""Extract the Plonky2 Poseidon constant tables into a Python module.

The constants are protocol data (identical across every Plonky2
implementation; they originate in
plonky2/src/hash/poseidon_goldilocks.rs). We extract them from the
reference spec's constant tables (reference: Hash/Constants.hs) rather
than hand-typing 400+ numbers, so they are guaranteed typo-free.

Output: plonky2_verifier_tpu/golden/poseidon_constants.py
"""

import re
import sys

SRC = "/root/reference/src/Hash/Constants.hs"
DST = "plonky2_verifier_tpu/golden/poseidon_constants.py"

HEX = re.compile(r"0x[0-9a-fA-F_]+")


def section(text: str, start_marker: str, end_marker: str) -> str:
    i = text.index(start_marker)
    j = text.index(end_marker, i + len(start_marker))
    return text[i:j]


def hex_values(chunk: str) -> list[int]:
    return [int(tok.replace("_", ""), 16) for tok in HEX.findall(chunk)]


def main() -> None:
    text = open(SRC).read()

    first_rc = hex_values(
        section(text, "fast_PARTIAL_FIRST_ROUND_CONSTANT = listArray", "fast_PARTIAL_ROUND_CONSTANTS ::")
    )
    partial_rc = hex_values(
        section(text, "fast_PARTIAL_ROUND_CONSTANTS = listArray", "fast_PARTIAL_ROUND_VS ::")
    )
    vs_flat = hex_values(section(text, "fast_PARTIAL_ROUND_VS = listArray", "fast_PARTIAL_ROUND_W_HATS ::"))
    w_hats_flat = hex_values(
        section(text, "fast_PARTIAL_ROUND_W_HATS = listArray", "-- ^ NB: This is in ROW-major order")
    )
    init_mat_flat = hex_values(
        section(text, "fast_PARTIAL_ROUND_INITIAL_MATRIX = listArray", "partialMdsMatrixCoeff ::")
    )
    all_rc = hex_values(section(text, "all_ROUND_CONSTANTS = listArray", "---------"))

    assert len(first_rc) == 12, len(first_rc)
    assert len(partial_rc) == 22, len(partial_rc)
    assert len(vs_flat) == 22 * 11, len(vs_flat)
    assert len(w_hats_flat) == 22 * 11, len(w_hats_flat)
    assert len(init_mat_flat) == 11 * 11, len(init_mat_flat)
    assert len(all_rc) == 30 * 12, len(all_rc)

    def fmt_list(vals, per_line=4, indent="    "):
        lines = []
        for i in range(0, len(vals), per_line):
            lines.append(indent + ", ".join(f"0x{v:016x}" for v in vals[i : i + per_line]) + ",")
        return "\n".join(lines)

    def fmt_nested(vals_flat, ncols, indent="    "):
        rows = [vals_flat[i : i + ncols] for i in range(0, len(vals_flat), ncols)]
        out = []
        for row in rows:
            out.append(indent + "(" + ", ".join(f"0x{v:016x}" for v in row) + "),")
        return "\n".join(out)

    with open(DST, "w") as f:
        f.write('"""Plonky2 Poseidon-over-Goldilocks constant tables (protocol data).\n\n')
        f.write("Width-12 permutation: 8 external (full) rounds + 22 internal (partial)\n")
        f.write("rounds. MDS matrix = circulant(MDS_CIRC) + diag(MDS_DIAG). The FAST_*\n")
        f.write("tables implement the equivalent partial-round optimization; the plain\n")
        f.write("permutation only needs ALL_ROUND_CONSTANTS + the MDS matrix, while the\n")
        f.write("PoseidonGate constraint generator consumes the FAST_* tables.\n")
        f.write("Values match plonky2/src/hash/poseidon_goldilocks.rs (upstream protocol\n")
        f.write('constants; cf. reference spec Hash/Constants.hs:19-207).\n"""\n\n')
        f.write("MDS_CIRC = (17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20)\n")
        f.write("MDS_DIAG = (8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)\n\n")
        f.write("# 30 rounds x 12 lanes, flattened row-major.\n")
        f.write("ALL_ROUND_CONSTANTS = (\n%s\n)\n\n" % fmt_list(all_rc))
        f.write("FAST_PARTIAL_FIRST_ROUND_CONSTANT = (\n%s\n)\n\n" % fmt_list(first_rc))
        f.write("FAST_PARTIAL_ROUND_CONSTANTS = (\n%s\n)\n\n" % fmt_list(partial_rc))
        f.write("# 22 rounds x 11 entries.\n")
        f.write("FAST_PARTIAL_ROUND_VS = (\n%s\n)\n\n" % fmt_nested(vs_flat, 11))
        f.write("FAST_PARTIAL_ROUND_W_HATS = (\n%s\n)\n\n" % fmt_nested(w_hats_flat, 11))
        f.write("# 11 x 11, row-major as serialized; note the constraint generator\n")
        f.write("# indexes it transposed (partialMdsMatrixCoeff i j = M[j][i]).\n")
        f.write("FAST_PARTIAL_ROUND_INITIAL_MATRIX = (\n%s\n)\n" % fmt_nested(init_mat_flat, 11))

    print(f"wrote {DST}")


if __name__ == "__main__":
    sys.exit(main())
