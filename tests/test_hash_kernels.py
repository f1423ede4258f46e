"""Batched SHA-256 / ChaCha20 TPU kernels vs scalar references (bit-exact).

The reference gets these primitives from sp1-patched crates
(crates/dkg/Cargo.toml:22, crates/bad_encrypted_share_prove/Cargo.toml:18-20);
here they are VPU kernels checked word-for-word against hashlib / the scalar
host path."""

import hashlib

import numpy as np
import pytest

from dvt_circuits_tpu.hash import chacha20_tpu, sha256 as sha256k
from dvt_circuits_tpu.hostcrypto import chacha20 as cc_host


@pytest.mark.parametrize("msg_len", [0, 1, 3, 32, 55, 56, 64, 100, 129, 200])
def test_sha256_batch_matches_hashlib(msg_len):
    rng = np.random.default_rng(msg_len)
    msgs = [rng.integers(0, 256, size=msg_len, dtype=np.uint8).tobytes() for _ in range(9)]
    got = sha256k.sha256_batch(msgs)
    want = [hashlib.sha256(m).digest() for m in msgs]
    assert got == want


def test_sha256_large_batch():
    msgs = [bytes([i % 256]) * 80 for i in range(257)]
    got = sha256k.sha256_batch(msgs)
    want = [hashlib.sha256(m).digest() for m in msgs]
    assert got == want


def test_sha256_rejects_mixed_lengths():
    with pytest.raises(ValueError):
        sha256k.pack_messages([b"a", b"bb"])


def test_chacha20_blocks_match_host():
    key = bytes(range(32))
    nonce = bytes(range(100, 112))
    ks = chacha20_tpu.keystream(key, nonce, 64 * 5 + 17)
    want = cc_host.chacha20_keystream(key, nonce, 64 * 5 + 17)
    assert ks == want


def test_chacha20_counter_offset_and_xor():
    key = b"\x07" * 32
    nonce = b"\x01" * 12
    data = bytes(range(200)) * 3
    enc = chacha20_tpu.xor(key, nonce, data, counter=3)
    assert enc == cc_host.chacha20_xor(key, nonce, data, counter=3)
    assert chacha20_tpu.xor(key, nonce, enc, counter=3) == data


def test_chacha20_rfc8439_vector():
    # RFC 8439 §2.3.2 test vector (block counter 1)
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    block = chacha20_tpu.keystream(key, nonce, 64, counter=1)
    assert block == bytes.fromhex(
        "10f1e7e4d13b5915500fdd1fa32071c4"
        "c7d1f4c733c068030422aa9ac3d46c4e"
        "d2826446079faa0914c2d705d98b02a2"
        "b5129cd1de164eb9cbd083e8a2503c4e"
    )


def test_sha3_256_matches_hashlib():
    rng = np.random.default_rng(7)
    from dvt_circuits_tpu.hash import keccak
    for ln in (0, 1, 135, 136, 137, 200, 300):
        msgs = [rng.integers(0, 256, size=ln, dtype=np.uint8).tobytes() for _ in range(5)]
        got = keccak.sha3_256_batch(msgs)
        want = [hashlib.sha3_256(m).digest() for m in msgs]
        assert got == want, f"len {ln}"


def test_keccak256_golden():
    from dvt_circuits_tpu.hash import keccak
    # Ethereum Keccak-256 golden vectors
    assert keccak.keccak256_batch([b""])[0] == bytes.fromhex(
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak.keccak256_batch([b"abc"])[0] == bytes.fromhex(
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
