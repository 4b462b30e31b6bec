"""plonky2_verifier_tpu: a TPU-native Plonky2 zero-knowledge proof
verification framework (JAX / XLA / Pallas / pjit).

Layers:
- ``golden``:    bit-exact pure-Python executable spec (the oracle)
- ``types``:     proof/vkey data model + Plonky2 JSON codecs
- ``gates``:     symbolic gate-constraint programs (shared by all backends)
- ``prover``:    fixture generator (host-side prover for test circuits)
- ``ops``:       TPU kernels (Goldilocks limb arithmetic, Poseidon, Merkle,
                 FRI folding) in jnp + Pallas
- ``compiler``:  circuit-template compiler (shapes, transcript schedules,
                 flattened proof arrays, traced constraint evaluators)
- ``verifier_jax``: the batched jit TPU verifier
- ``parallel``:  mesh sharding, psum verdict reduction, streaming driver
- ``models``:    test-circuit families (fibonacci, poseidon, lookup, ...)
"""

__version__ = "0.1.0"
