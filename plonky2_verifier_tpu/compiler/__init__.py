"""Circuit-template compiler.

A `CircuitTemplate` freezes everything shape-like about a circuit
(CommonCircuitData): array dimensions for every proof component, the static
Fiat-Shamir absorb/squeeze schedule, FRI step plan, and precomputed
constants. Proofs of the same circuit then flatten into fixed-shape device
arrays and verify as one vmapped jit computation.
"""

from .template import CircuitTemplate  # noqa: F401
from .flatten import flatten_proofs  # noqa: F401
