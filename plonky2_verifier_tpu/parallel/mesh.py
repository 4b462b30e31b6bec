"""Sharded batched verification over a jax.sharding.Mesh.

Axes:
- 'dp': proof-batch data parallelism (primary throughput axis). Every proof
  array has batch as its leading dimension, so sharding is uniform.
- 'qp': FRI query-round parallelism within a proof (optional second axis).
  Query rounds are independent after challenge derivation
  (Plonk/FRI.hs:372), so the per-query arrays shard on their Q axis; the
  transcript/Plonk stages replicate across 'qp' and the final
  `round_ok.all(axis=Q)` induces the only cross-'qp' collective.

The verdict summary (`n_valid`) is a psum over the whole mesh, inserted by
GSPMD from the sharded->replicated output annotation.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from ..compiler.template import CircuitTemplate
from ..verifier_jax import JaxVerifier

# arrays whose second axis is the FRI query-round axis
_QUERY_AXIS_ARRAYS = ("leaves_", "sibs_", "step_evals_", "step_sibs_")


def make_mesh(devices: Optional[Sequence] = None, dp: Optional[int] = None, qp: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // qp
    if dp * qp != n:  # a real error, not an assert: survives python -O
        raise ValueError(f"mesh {dp}x{qp} does not cover {n} devices")
    arr = np.array(devices).reshape(dp, qp)
    return Mesh(arr, ("dp", "qp"))


class ShardedVerifier:
    """A JaxVerifier compiled with explicit shardings over a mesh."""

    def __init__(self, tpl: CircuitTemplate, mesh: Mesh, shard_queries: bool = True):
        self.tpl = tpl
        self.mesh = mesh
        self.inner = JaxVerifier(tpl)
        self.shard_queries = shard_queries and "qp" in mesh.axis_names and mesh.shape["qp"] > 1

        def step(arrays):
            out = self.inner._verify(arrays)
            ok = out["ok"]
            return {"ok": ok, "n_valid": jnp.sum(ok.astype(jnp.int32))}

        self._step = step
        self._compiled: Dict[tuple, object] = {}

    def _spec_for(self, name: str) -> PS:
        if self.shard_queries and any(name.startswith(p) for p in _QUERY_AXIS_ARRAYS):
            return PS("dp", "qp")
        return PS("dp")

    def shard_arrays(self, arrays: Dict[str, np.ndarray]):
        """Host uint64 arrays -> device limb arrays laid out on the mesh."""
        from ..ops import field as jf

        out = {}
        for k, v in arrays.items():
            g = jf.from_u64(v)
            sh = NamedSharding(self.mesh, self._spec_for(k))
            out[k] = jax.tree.map(lambda x: jax.device_put(x, sh), g)
        return out

    def __call__(self, sharded_arrays):
        # the compiled executable is keyed by the actual input sharding layout
        # so a later call with differently-sharded arrays compiles its own
        # specialization instead of silently resharding to the first layout
        in_shardings = (jax.tree.map(lambda x: x.sharding, sharded_arrays),)
        leaves = jax.tree_util.tree_leaves(in_shardings)
        key = tuple(str(s) for s in leaves)
        if key not in self._compiled:
            out_shardings = {
                "ok": NamedSharding(self.mesh, PS("dp")),
                "n_valid": NamedSharding(self.mesh, PS()),  # replicated => psum
            }
            self._compiled[key] = jax.jit(
                self._step, in_shardings=in_shardings, out_shardings=out_shardings
            )
        return self._compiled[key](sharded_arrays)
