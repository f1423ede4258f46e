"""verification.rs unit-test ports (verification.rs:553-667) plus
framework-level checks of the error taxonomy."""

import pytest

from dvt_circuits_tpu.dkg.keys import BlsDkgWithSecp256kCommitment as Setup
from dvt_circuits_tpu.dkg.keys import BlsG1, BlsPublicKey
from dvt_circuits_tpu.dkg.types import (
    BLSSignatureRaw,
    DkgGenId,
    GenerateSettings,
    Generation,
    InitialCommitment,
    SHA256Raw,
)
from dvt_circuits_tpu.dkg.verification import (
    compute_initial_commitment_hash,
    get_index_in_commitments,
    verify_generation_hashes,
    verify_generations,
    verify_initial_commitment_hash,
)
from dvt_circuits_tpu.utils.errors import VerificationError


def test_get_index_in_commitments():
    hashes = [SHA256Raw(b"\x01" * 32), SHA256Raw(b"\x02" * 32), SHA256Raw(b"\x00" * 32)]
    dst = SHA256Raw(b"\x02" * 32)
    index = get_index_in_commitments(hashes, dst)
    assert index == 2
    assert sorted(hashes)[index] == dst


def test_get_index_not_found():
    hashes = [SHA256Raw(bytes([i]) * 32) for i in (1, 2, 3)]
    with pytest.raises(VerificationError):
        get_index_in_commitments(hashes, SHA256Raw(b"\x09" * 32))


def test_initial_commitment_hash_roundtrip():
    settings = GenerateSettings(n=2, k=1, gen_id=DkgGenId(b"\x01" * 16))
    pk = BlsG1.identity().to_bytes()
    base_pubkeys = [pk, pk]
    h = compute_initial_commitment_hash(settings, base_pubkeys)
    commitment = InitialCommitment(hash=h, settings=settings, base_pubkeys=base_pubkeys)
    assert verify_initial_commitment_hash(commitment)

    bad = InitialCommitment(
        hash=h,
        settings=settings,
        base_pubkeys=[type(pk)(bytes([pk[0] ^ 1]) + bytes(pk[1:])), pk],
    )
    assert not verify_initial_commitment_hash(bad)


def _dummy_generation(msg: str) -> Generation:
    identity = BlsG1.identity().to_bytes()
    return Generation(
        verification_vector=[identity],
        base_hash=SHA256Raw(bytes(32)),
        partial_pubkey=identity,
        message_cleartext=msg,
        message_signature=BLSSignatureRaw(bytes(96)),
    )


def test_verify_generation_hashes_empty():
    settings = GenerateSettings(n=1, k=1, gen_id=DkgGenId(bytes(16)))
    with pytest.raises(VerificationError):
        verify_generation_hashes(Setup, [], settings)


def test_verify_generation_hashes_message_mismatch():
    settings = GenerateSettings(n=2, k=1, gen_id=DkgGenId(bytes(16)))
    g1 = _dummy_generation("hello")
    g2 = _dummy_generation("world")
    with pytest.raises(VerificationError):
        verify_generation_hashes(Setup, [g1, g2], settings)


def test_verify_generations_wrong_n():
    settings = GenerateSettings(n=2, k=1, gen_id=DkgGenId(bytes(16)))
    g = _dummy_generation("hello")
    agg_key = BlsPublicKey.from_bytes(BlsG1.identity().to_bytes())
    with pytest.raises(VerificationError):
        verify_generations(Setup, [g], settings, agg_key)
