"""plonky2_verifier_tpu: a TPU-native Plonky2 zero-knowledge proof
verification framework (JAX / XLA / Pallas / pjit).

Layers:
- ``golden``:    bit-exact pure-Python executable spec (the oracle)
- ``types``:     proof/vkey data model + Plonky2 JSON codecs
- ``gates``:     symbolic gate-constraint programs (shared by all backends)
- ``prover``:    fixture generator (host-side prover for test circuits)
- ``ops``:       TPU kernels: Goldilocks limb arithmetic, Poseidon, Merkle,
                 FRI folding in jnp, plus the fused Pallas Poseidon-12
                 kernel (``ops.pallas_poseidon``, the TPU default — 1.4x
                 the jnp scan, tools/bench_poseidon.py)
- ``compiler``:  circuit-template compiler (shapes, transcript schedules,
                 flattened proof arrays, traced constraint evaluators)
- ``verifier_jax``: the batched jit TPU verifier
- ``parallel``:  mesh sharding + psum verdict reduction (``parallel.mesh``),
                 streaming driver with rolling metrics (``parallel.stream``)
- ``metrics``:   proofs/s / perms/s / queries/s counters + the FRI.md
                 analytic permutation-count model
- ``models``:    test-circuit families (fibonacci, poseidon_chain, lookup,
                 multi_lookup, gate_zoo — all 16 gate kinds in one circuit)
"""

__version__ = "0.1.0"
