"""Witness generation by triangular constraint solving.

Every Plonky2 gate's constraints are triangular: each committed constraint is
(up to sign) ``expr - cell`` where ``cell`` is a single not-yet-assigned wire
and ``expr`` only references inputs or previously-assigned cells. So instead
of hand-writing a generator per gate, we *solve* the gate's own symbolic
program: evaluate constraints in commit order (with lazy, memoized local
defs) and assign the one unknown wire per constraint. This guarantees the
witness satisfies the exact constraints the verifier checks.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from ..gate_parser import Gate
from ..gates import CONST, LKPSEL, LOCAL, PI, SEL, WIRE, Expr, gate_program
from ..golden import field as gf


class _Unknown(Exception):
    def __init__(self, wire_idx: int):
        self.wire_idx = wire_idx


class GateWitnessSolver:
    def __init__(
        self,
        gate: Gate,
        row: List[Optional[int]],
        constants: Sequence[int],
        pi_hash: Sequence[int] = (0, 0, 0, 0),
    ):
        self.prog = gate_program(gate)
        self.row = row
        self.constants = list(constants)
        self.pi_hash = list(pi_hash)
        self._local_cache: Dict[int, int] = {}

    def _eval(self, e: Expr) -> int:
        op = e.op
        if op == "lit":
            return e.args[0]
        if op == "var":
            kind, idx = e.args
            if kind == WIRE:
                v = self.row[idx]
                if v is None:
                    raise _Unknown(idx)
                return v
            if kind == CONST:
                return self.constants[idx]
            if kind == PI:
                return self.pi_hash[idx]
            if kind == LOCAL:
                if idx not in self._local_cache:
                    self._local_cache[idx] = self._eval(self.prog.local_defs[idx])
                return self._local_cache[idx]
            if kind in (SEL, LKPSEL):
                raise ValueError("gate constraints must not reference selector columns")
            raise KeyError(kind)
        a = self._eval(e.args[0])
        if op == "img":
            raise ValueError("img nodes have no base-field witness semantics")
        b = self._eval(e.args[1])
        if op == "add":
            return (a + b) % gf.P
        if op == "sub":
            return (a - b) % gf.P
        if op == "mul":
            return (a * b) % gf.P
        raise KeyError(op)

    def solve(self) -> List[Optional[int]]:
        for c in self.prog.constraints:
            try:
                v = self._eval(c)
            except _Unknown as u:
                # constraint must be `lhs - rhs` with the unknown a bare wire
                if c.op != "sub":
                    raise ValueError(f"cannot solve non-sub constraint with unknown wire {u.wire_idx}")
                lhs, rhs = c.args
                if rhs.op == "var" and rhs.args == (WIRE, u.wire_idx) and self.row[u.wire_idx] is None:
                    self.row[u.wire_idx] = self._eval(lhs)
                elif lhs.op == "var" and lhs.args == (WIRE, u.wire_idx) and self.row[u.wire_idx] is None:
                    self.row[u.wire_idx] = self._eval(rhs)
                else:
                    raise ValueError(
                        f"constraint not triangular in wire {u.wire_idx}: {c!r}"
                    )
                continue
            if v % gf.P != 0:
                raise ValueError(f"pre-filled witness violates constraint: {c!r} = {v}")
        return self.row


def solve_gate_witness(
    gate: Gate,
    num_wires: int,
    prefill: Dict[int, int],
    constants: Sequence[int] = (0, 0),
    pi_hash: Sequence[int] = (0, 0, 0, 0),
    fill_unused: int = 0,
) -> List[int]:
    """Solve a full row for `gate`. `prefill` maps wire index -> value for the
    gate's free inputs; remaining cells are derived from the constraints.
    Unconstrained cells are set to `fill_unused`."""
    row: List[Optional[int]] = [None] * num_wires
    for k, v in prefill.items():
        row[k] = v % gf.P
    solver = GateWitnessSolver(gate, row, constants, pi_hash)
    row = solver.solve()
    return [fill_unused if v is None else v for v in row]


def poseidon_gate_witness(inputs: Sequence[int], swap: int = 0, num_wires: int = 135) -> List[int]:
    """Fill a PoseidonGate row: inputs at wires 0..11, swap flag at 24;
    outputs (12..23), deltas, and all sbox-input cells are solved."""
    prefill = {i: int(x) % gf.P for i, x in enumerate(inputs)}
    prefill[24] = swap
    return solve_gate_witness(Gate("PoseidonGate", (12,)), num_wires, prefill)
