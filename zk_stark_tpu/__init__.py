"""zk_stark_tpu — a TPU-native STARK proving framework.

A from-scratch JAX/XLA/Pallas implementation of the full "STARK anatomy"
stack with the same capabilities as the reference Rust crate
(SpekalsG3/zk-stark-tutor): 128-bit prime field, NTT polynomial arithmetic,
Merkle commitments, FRI, a complete STARK prover/verifier, the Rescue-Prime
hash/AIR, and the RPSSS signature scheme — redesigned for TPU hardware
(vectorized limb kernels, batched hashing, sharded evaluation domains).
"""

from .field import FIELD_PRIME, Field, FieldElement  # noqa: F401

__version__ = "0.1.0"
