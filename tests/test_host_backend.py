"""Host (numpy/native) mirrors of device kernels used by the verifier.

The verifier must be cheap and DEVICE-FREE: the preprocessed-column
commitment is recomputed with a numpy NTT + native Poseidon2 Merkle root,
which must be bit-identical to the prover's device commitment.
"""

import importlib

import numpy as np

import jax.numpy as jnp

from dvt_circuits_tpu.field import babybear as bb
from dvt_circuits_tpu.ntt import coset_lde
from dvt_circuits_tpu.pcs.merkle import MerkleTree, host_merkle_root

nttmod = importlib.import_module("dvt_circuits_tpu.ntt.ntt")


def test_np_ntt_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.integers(0, bb.P, size=(128, 3), dtype=np.uint64)
    back = nttmod.np_ntt(nttmod.np_ntt(x), inverse=True)
    assert np.array_equal(back, x)


def test_np_coset_lde_matches_device():
    rng = np.random.default_rng(2)
    mat = rng.integers(0, bb.P, size=(256, 7), dtype=np.uint32)
    dev = np.asarray(
        bb.from_mont(coset_lde(bb.to_mont(jnp.asarray(mat)), 2, 31, axis=0))
    )
    host = nttmod.np_coset_lde(mat.astype(np.uint64), 2, 31)
    assert np.array_equal(dev.astype(np.uint64), host)


def test_host_merkle_root_matches_device():
    rng = np.random.default_rng(3)
    mat = rng.integers(0, bb.P, size=(128, 5), dtype=np.uint32)
    lde = coset_lde(bb.to_mont(jnp.asarray(mat)), 2, 31, axis=0)
    tree = MerkleTree(lde)
    host = host_merkle_root(np.asarray(bb.from_mont(lde)))
    assert [int(v) for v in tree.root] == host


def test_preprocessed_commitment_host_matches_proof():
    """The host-computed verifying key equals the commitment the prover
    places in proofs (end-to-end bit-identity).  Uses the numpy host
    prover (bit-identical to the fused prover — covered by the heavy
    suite/dryrun) so the default suite skips a ~4 min XLA CPU compile."""
    from dvt_circuits_tpu.stark.config import TEST_CONFIG
    from dvt_circuits_tpu.stark.host_prover import host_prove_tables
    from dvt_circuits_tpu.stark.prover import preprocessed_commitment
    from dvt_circuits_tpu.stark.sha256_air import Sha256Air, pad_message

    padded = pad_message(b"host backend check")
    air = Sha256Air(len(padded) // 64)
    trace, publics = air.generate_trace(padded)
    proofs, _ = host_prove_tables([(air, trace, publics)], TEST_CONFIG)
    vk = preprocessed_commitment(air, proofs[0]["log_n"], TEST_CONFIG)
    assert proofs[0]["root_p"] == vk
