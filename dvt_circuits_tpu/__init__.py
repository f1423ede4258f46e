"""dvt_circuits_tpu — a TPU-native zero-knowledge fault-proving framework for DKG.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
metacraft-labs/dvt-circuits (reference mounted read-only at /root/reference):

  * ``hostcrypto``  — host-side cryptography (BLS12-381, secp256k1, ChaCha20)
  * ``dkg``         — DKG data model, polynomial-commitment math, fault verification
  * ``circuits``    — the four fault-proof witness programs ("guests")
  * ``field``       — BabyBear prime-field arithmetic on int32 TPU lanes
  * ``hash``        — Poseidon2 / SHA-256 kernels
  * ``ntt``         — radix-2 NTT + coset LDE (Pallas kernels, shard_map multi-chip)
  * ``pcs``         — Merkle commitments, FRI, Fiat–Shamir challenger
  * ``stark``       — AIR abstraction + uni-STARK prove/verify
  * ``prover``      — proof pipeline/orchestration, proof containers
  * ``parallel``    — device-mesh utilities and distributed kernels
  * ``service``     — HTTP service exposing prove/execute/spec routes

Unlike the reference (which delegates proving to the SP1 RISC-V zkVM), the
proving stack here is the product: a native STARK prover whose hot loops
(NTT, Poseidon2, Merkle, FRI) are TPU kernels.
"""

__version__ = "0.1.0"
