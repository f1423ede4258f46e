"""SHA-256 gadget AIR: digest correctness vs hashlib + STARK soundness.

The arithmetized counterpart of the reference's sha2 precompile usage
(SURVEY.md §2.2); the trace proves the full compression schedule."""

import copy
import hashlib

import numpy as np
import pytest

from dvt_circuits_tpu.stark import StarkError, prove, verify
from dvt_circuits_tpu.stark.config import TEST_CONFIG
from dvt_circuits_tpu.stark.sha256_air import (
    Sha256Air,
    digest_from_publics,
    message_publics,
    pad_message,
)

# STARK prove/verify round-trips here test AIR/constraint LOGIC, not the
# device backend — route them through the bit-identical numpy host prover
# (no XLA compile; the device path is covered by test_pcs/test_parallel/
# test_dist_stark and the heavy suites).
@pytest.fixture(scope="module", autouse=True)
def _host_prover():
    mp = pytest.MonkeyPatch()
    mp.setenv("DVT_PROVER", "host")
    yield
    mp.undo()


def _publics_for(data: bytes):
    padded = pad_message(data)
    air = Sha256Air(len(padded) // 64)
    trace, publics = air.generate_trace(padded)
    return air, padded, trace, publics


def test_trace_digest_matches_hashlib():
    for data in (b"", b"abc", bytes(range(55)), bytes(range(56)), bytes(range(200))):
        air, padded, trace, publics = _publics_for(data)
        assert digest_from_publics(air, publics) == hashlib.sha256(data).digest()
        assert publics[: 32 * air.num_blocks] == message_publics(padded)
        air.check_publics(publics)


@pytest.fixture(scope="module")
def sha_proof():
    air, _, trace, publics = _publics_for(b"dvt-circuits-tpu sha256 gadget")
    proof = prove(air, trace, publics, TEST_CONFIG)
    return air, trace, publics, proof


class TestSha256Stark:
    def test_roundtrip(self, sha_proof):
        air, _, publics, proof = sha_proof
        assert verify(air, proof, publics, TEST_CONFIG)

    def test_wrong_digest_rejected(self, sha_proof):
        air, _, publics, proof = sha_proof
        bad = list(publics)
        bad[-1] ^= 1  # flip a digest limb
        with pytest.raises(StarkError):
            verify(air, proof, bad, TEST_CONFIG)

    def test_wrong_message_rejected(self, sha_proof):
        air, _, publics, proof = sha_proof
        bad = list(publics)
        bad[0] ^= 1  # flip a message limb
        with pytest.raises(StarkError):
            verify(air, proof, bad, TEST_CONFIG)

    def test_tampered_trace_rejected(self, sha_proof):
        air, trace, publics, _ = sha_proof
        bad_trace = trace.copy()
        bad_trace[10, 0] ^= 1  # flip one bit column of a round row
        proof = prove(air, bad_trace, publics, TEST_CONFIG)
        with pytest.raises(StarkError):
            verify(air, proof, publics, TEST_CONFIG)


def test_two_block_message():
    data = bytes(range(100))  # pads to 2 blocks
    air, padded, trace, publics = _publics_for(data)
    assert air.num_blocks == 2
    proof = prove(air, trace, publics, TEST_CONFIG)
    assert verify(air, proof, publics, TEST_CONFIG)
    assert digest_from_publics(air, publics) == hashlib.sha256(data).digest()
