"""TPU kernel tier: Goldilocks limb arithmetic, Poseidon, Merkle, FRI ops.

Everything here is jnp/Pallas on uint32 limbs (TPUs have no 64-bit integer
multiply), branch-free, and vmappable over proof batches. Each op is
validated bit-exactly against `plonky2_verifier_tpu.golden`.
"""
