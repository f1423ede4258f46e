"""ChaCha20 gadget AIR: keystream correctness vs the host cipher + STARK
soundness.  The arithmetized counterpart of the reference's chacha20-crate
decrypt (crates/bad_encrypted_share_prove/src/main.rs:16-30, SURVEY.md §2.2)."""

import hashlib

import pytest

from dvt_circuits_tpu.hostcrypto.chacha20 import chacha20_block
from dvt_circuits_tpu.stark import StarkError, prove, verify
from dvt_circuits_tpu.stark.config import TEST_CONFIG
from dvt_circuits_tpu.stark.chacha20_air import (
    ChaCha20Air,
    init_from_publics,
    init_publics,
    keystream_from_publics,
)

pytestmark = pytest.mark.heavy  # full-size proving suite (DVT_HEAVY_TESTS=1)

KEY = hashlib.sha256(b"ecdh point").digest()
NONCE = KEY[:12]


def _build(inits):
    air = ChaCha20Air(len(inits))
    trace, publics = air.generate_trace(inits)
    return air, trace, publics


def test_trace_keystream_matches_host_cipher():
    for counter in (0, 1, 7, 0xFFFFFFFF):
        air, _, publics = _build([(KEY, counter, NONCE)])
        assert keystream_from_publics(publics, 0) == chacha20_block(KEY, counter, NONCE)
        assert publics[:24] == init_publics(KEY, counter, NONCE)
        assert init_from_publics(publics, 0) == (KEY, counter & 0xFFFFFFFF, NONCE)
        air.check_publics(publics)


@pytest.fixture(scope="module")
def chacha_proof():
    air, trace, publics = _build([(KEY, 0, NONCE), (KEY, 1, NONCE)])
    proof = prove(air, trace, publics, TEST_CONFIG)
    return air, trace, publics, proof


class TestChaCha20Stark:
    def test_roundtrip(self, chacha_proof):
        air, _, publics, proof = chacha_proof
        assert verify(air, proof, publics, TEST_CONFIG)
        for blk in range(2):
            assert keystream_from_publics(publics, blk) == chacha20_block(KEY, blk, NONCE)

    def test_wrong_keystream_rejected(self, chacha_proof):
        air, _, publics, proof = chacha_proof
        bad = list(publics)
        bad[-1] ^= 1  # flip an output limb
        with pytest.raises(StarkError):
            verify(air, proof, bad, TEST_CONFIG)

    def test_wrong_key_rejected(self, chacha_proof):
        air, _, publics, proof = chacha_proof
        bad = list(publics)
        bad[0] ^= 1  # flip a key limb
        with pytest.raises(StarkError):
            verify(air, proof, bad, TEST_CONFIG)

    def test_tampered_trace_rejected(self, chacha_proof):
        air, trace, publics, _ = chacha_proof
        bad_trace = trace.copy()
        bad_trace[5, 3] ^= 1  # flip a state bit on a round row
        proof = prove(air, bad_trace, publics, TEST_CONFIG)
        with pytest.raises(StarkError):
            verify(air, proof, publics, TEST_CONFIG)
