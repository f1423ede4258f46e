"""Host-crypto unit tests.

Ports the reference's in-crate test suites with their hard-coded golden
values: dkg_math.rs:250-432, bls_common.rs:118-182, bls_keys.rs:220-274,
secp256k1_keys.rs:186-245, plus RFC vectors for ChaCha20.
"""

import pytest

from dvt_circuits_tpu.dkg.keys import (
    BlsG1,
    BlsG1Curve,
    BlsPublicKey,
    BlsScalar,
    BlsSecretKey,
    BlsSignature,
    Secp256k1PublicKey,
    Secp256k1SecretKey,
    Secp256k1Signature,
)
from dvt_circuits_tpu.dkg.dkg_math import evaluate_polynomial, lagrange_interpolation
from dvt_circuits_tpu.dkg.types import (
    BLSPubkeyRaw,
    BLSSecretRaw,
    BLSSignatureRaw,
    SECP256K1PubkeyRaw,
    SECP256K1SecretRaw,
)
from dvt_circuits_tpu.hostcrypto import bls12_381 as bls
from dvt_circuits_tpu.hostcrypto import secp256k1 as secp
from dvt_circuits_tpu.hostcrypto.chacha20 import chacha20_block, chacha20_xor
from dvt_circuits_tpu.utils.errors import InvalidPoint

GOLD_MSG = bytes.fromhex("2f901d5cec8722e44afd59e94d0a56bf1506a72a0a60709920aad714d1a2ece0")
GOLD_PK = "90346f9c5f3c09d96ea02acd0220daa8459f03866ed938c798e3716e42c7e033c9a7ef66a10f83af06d5c00b508c6d0f"
GOLD_SIG = "a9c08eff13742f78f1e5929888f223b5b5b12b4836b5417c5a135cf24f4e2a4c66a6cdef91be3098b7e7a6a63903b61302e3cf2b8653101da245cf01a8d82b25debe7b18a3a2eb1778f8628fd2c59c8687f6e048a31250fbc2804c20043b8443"
WRONG_PK = "98876a81fe982573ec5f986956bf9bf0bcb5349d95c3c8da0aefd05a49fea6215f59b0696f906547baed90ab245804e8"
BAD_SIG = "999e7b24bee2587d687e8f358ed10627ef57ec54935bd7a500bbbb18a57e7aa21b800f8b1f487a980d7c93918fdbd8020b66ce9a9e5788a4826e610ac937d8c2ce0ad9c0ee9a5732cf73052493e9a500cc5100a15bdbf9e5b79104db52dbf07c"


class TestBlsVerify:
    """dkg_math.rs test_verify_signature golden vectors."""

    def test_golden_signature(self):
        pk = bls.g1_from_compressed(bytes.fromhex(GOLD_PK))
        sig = bls.g2_from_compressed(bytes.fromhex(GOLD_SIG))
        assert bls.bls_verify(pk, sig, GOLD_MSG)
        assert not bls.bls_verify(pk, sig, b"\x00")
        wrong_pk = bls.g1_from_compressed(bytes.fromhex(WRONG_PK))
        assert not bls.bls_verify(wrong_pk, sig, GOLD_MSG)
        bad_sig = bls.g2_from_compressed(bytes.fromhex(BAD_SIG))
        assert not bls.bls_verify(pk, bad_sig, GOLD_MSG)

    def test_precomputed_hash(self):
        pk = bls.g1_from_compressed(bytes.fromhex(GOLD_PK))
        sig = bls.g2_from_compressed(bytes.fromhex(GOLD_SIG))
        hashed = bls.hash_to_g2(GOLD_MSG)
        assert bls.bls_verify_precomputed_hash(pk, sig, hashed)
        wrong = bls.hash_to_g2(b"bad")
        assert not bls.bls_verify_precomputed_hash(pk, wrong, hashed)

    def test_hash_to_g2_deterministic(self):
        p1 = bls.hash_to_g2(b"hello")
        p2 = bls._hash_to_g2_uncached(b"hello")
        assert p1 == p2
        assert p1 != bls.hash_to_g2(b"world")
        assert bls.g2_in_subgroup(p1)


class TestEvaluatePolynomial:
    """dkg_math.rs:281-318."""

    PKS = [
        "92cad77a95432bc1030d81b5465cb69be672c1dd0da752230bf8112f8449b03149e7fa208a6fae460a9f0a1d5bd175e9",
        "98876a81fe982573ec5f986956bf9bf0bcb5349d95c3c8da0aefd05a49fea6215f59b0696f906547baed90ab245804e8",
        "ad2c4e5b631fbded449ede4dca2d040b9c7eae58d1e73b3050486c1ba22c15a92d9ff13c05c356f974447e4fca84864a",
    ]
    TARGET = "af8e0095ecc662f65b95ce57e5bd2f8739ff93b0621a1ad53f5616538d1323ff40e6e9ddd7132298710974fe6fc0344e"

    def test_golden(self):
        cfs = [BlsG1.from_bytes(BLSPubkeyRaw(h)) for h in self.PKS]
        result = evaluate_polynomial(cfs, BlsScalar.from_u32(1), BlsG1)
        assert result.to_bytes().hex() == self.TARGET

    def test_bad_base_keys(self):
        cfs = [BlsG1.from_bytes(BLSPubkeyRaw(self.PKS[0]))] * 3
        result = evaluate_polynomial(cfs, BlsScalar.from_u32(1), BlsG1)
        assert result.to_bytes().hex() != self.TARGET


class TestLagrange:
    """dkg_math.rs:321-431."""

    PKS = [
        "8da434e68daef9af33e39ab727557a3cd86d7991cd6b545746bf92c8edec37012912cfa2292a21512bce9040a1c0e502",
        "a3cd061aab6013f7561978959482d79e9ca636392bc94d4bcad9cb6f90fe2cdf52100f211052f1570db0ca690b6a9903",
        "8cbfb6cb7af927cfe5fb17621df7036de539b7ff4aa0620cdc218d6b7fe7f2e714a96bdeddb2a0dc24867a90594427e1",
        "9892b390d9d3000c7bf04763006fbc617b7ba9c261fff35094aec3f43599f2c254ae667d9ba135747309b77cd02f1fbc",
        "b255c8a66fd1a13373537e8a4ba258f4990c141fc3c06daccda0711f5ebaffc092f0e5b0e4454e6344e2f97957be4017",
    ]
    TARGET = "a31d9a483703cd0da9873e5e76b4de5f7035d0a73d79b3be8667daa4fc7065a1bbb5bf77787fcf2a35bd327eecc4fa6b"

    def _points(self, order):
        return [BlsG1.from_bytes(BLSPubkeyRaw(self.PKS[i])) for i in order]

    def test_golden(self):
        ids = [BlsScalar.from_u32(i) for i in (1, 2, 3, 4, 5)]
        result = lagrange_interpolation(self._points([0, 1, 2, 3, 4]), ids)
        assert result.to_bytes().hex() == self.TARGET

    def test_out_of_order(self):
        # pairing (id, point) permuted consistently → same result
        ids = [BlsScalar.from_u32(i) for i in (5, 1, 2, 3, 4)]
        result = lagrange_interpolation(self._points([4, 0, 1, 2, 3]), ids)
        assert result.to_bytes().hex() == self.TARGET

    def test_wrong_order(self):
        # points shuffled against ids → different result
        ids = [BlsScalar.from_u32(i) for i in (1, 2, 3, 4, 5)]
        result = lagrange_interpolation(self._points([1, 0, 2, 3, 4]), ids)
        assert result.to_bytes().hex() != self.TARGET

    def test_wrong_base_keys(self):
        ids = [BlsScalar.from_u32(i) for i in (1, 2, 3, 4, 5)]
        result = lagrange_interpolation(self._points([1, 1, 1, 1, 1]), ids)
        assert result.to_bytes().hex() != self.TARGET

    def test_degenerate_inputs(self):
        ids = [BlsScalar.from_u32(1), BlsScalar.from_u32(1)]
        pts = self._points([0, 1])
        with pytest.raises(ValueError):
            lagrange_interpolation(pts, ids)
        with pytest.raises(ValueError):
            lagrange_interpolation([], [])
        with pytest.raises(ValueError):
            lagrange_interpolation(pts, [BlsScalar.from_u32(0), BlsScalar.from_u32(2)])


class TestBlsKeys:
    """bls_keys.rs:220-274 and bls_common.rs:162-181."""

    def test_invalid_encodings_rejected(self):
        with pytest.raises(InvalidPoint):
            BlsPublicKey.from_bytes(BLSPubkeyRaw(bytes(48)))
        with pytest.raises(InvalidPoint):
            BlsSecretKey.from_bytes(BLSSecretRaw(b"\xff" * 32))
        with pytest.raises(InvalidPoint):
            BlsSignature.from_bytes(BLSSignatureRaw(bytes(96)))

    def test_safe_and_fast_decompression_agree(self):
        raw = BLSPubkeyRaw(GOLD_PK)
        assert BlsPublicKey.from_bytes(raw).point == BlsPublicKey.from_bytes_safe(raw).point
        with pytest.raises(InvalidPoint):
            BlsPublicKey.from_bytes_safe(BLSPubkeyRaw(bytes(48)))
        with pytest.raises(InvalidPoint):
            BlsSignature.from_bytes_safe(BLSSignatureRaw(bytes(96)))

    def test_bls_id_from_u32(self):
        # LE embedding: to_bytes of the crate Scalar is little-endian
        for v in (0, 1, 2):
            le = bls.scalar_id_from_u32(v).to_bytes(32, "little")
            assert le[0] == v and not any(le[1:])

    def test_secret_key_roundtrip_and_pubkey(self):
        sk = BlsSecretKey(12345)
        raw = sk.to_bytes()
        assert BlsSecretKey.from_bytes(raw).scalar == 12345
        pk = sk.to_public_key()
        assert pk.point == bls.g1_mul(bls.G1_GEN, 12345)


class TestSecp256k1:
    """secp256k1_keys.rs:186-245."""

    def test_invalid_encodings(self):
        with pytest.raises(InvalidPoint):
            Secp256k1PublicKey.from_bytes(SECP256K1PubkeyRaw(bytes(33)))
        with pytest.raises(InvalidPoint):
            Secp256k1SecretKey.from_bytes(SECP256K1SecretRaw(bytes(32)))

    def test_roundtrip_and_sign(self):
        sk = Secp256k1SecretKey.from_bytes(SECP256K1SecretRaw(b"\x01" * 32))
        pk = sk.to_public_key()
        decoded = Secp256k1PublicKey.from_bytes(pk.to_bytes())
        assert decoded.to_bytes() == pk.to_bytes()
        msg = b"\x02" * 32
        sig = sk.sign(msg)
        assert pk.verify_signature(msg, sig)
        assert not pk.verify_signature(b"\x03" * 32, sig)
        assert not pk.verify_signature(b"\x01" * 31, sig)  # non-32-byte digest

    def test_high_s_rejected(self):
        sk = Secp256k1SecretKey.from_bytes(SECP256K1SecretRaw(b"\x01" * 32))
        pk = sk.to_public_key()
        msg = b"\x02" * 32
        r, s = sk.sign(msg).sig
        assert not secp.verify(pk.point, msg, (r, secp.N - s))

    def test_signature_compact_roundtrip(self):
        sk = Secp256k1SecretKey.from_bytes(SECP256K1SecretRaw(b"\x07" * 32))
        sig = sk.sign(b"\x09" * 32)
        assert Secp256k1Signature.from_bytes(sig.to_bytes()).sig == sig.sig


class TestChaCha20:
    def test_rfc8439_block(self):
        key = bytes(range(32))
        nonce = bytes.fromhex("000000090000004a00000000")
        blk = chacha20_block(key, 1, nonce)
        assert blk[:16].hex() == "10f1e7e4d13b5915500fdd1fa32071c4"

    def test_rfc8439_encrypt(self):
        key = bytes(range(32))
        nonce = bytes.fromhex("000000000000004a00000000")
        pt = (
            b"Ladies and Gentlemen of the class of '99: If I could offer you "
            b"only one tip for the future, sunscreen would be it."
        )
        ct = chacha20_xor(key, nonce, pt, counter=1)
        assert ct[:16].hex() == "6e2e359a2568f98041ba0728dd0d6981"
        assert chacha20_xor(key, nonce, ct, counter=1) == pt


class TestSerialization:
    def test_g1_roundtrip(self):
        for k in (1, 2, 3, 12345):
            pt = bls.g1_mul(bls.G1_GEN, k)
            assert bls.g1_from_compressed(bls.g1_to_compressed(pt)) == pt
            assert bls.g1_from_uncompressed(bls.g1_to_uncompressed(pt)) == pt

    def test_g2_roundtrip(self):
        for k in (1, 2, 7):
            pt = bls.g2_mul(bls.G2_GEN, k)
            assert bls.g2_from_compressed(bls.g2_to_compressed(pt)) == pt
            assert bls.g2_from_uncompressed(bls.g2_to_uncompressed(pt)) == pt

    def test_infinity_encodings(self):
        assert bls.g1_from_compressed(bytes([0xC0]) + bytes(47)) is None
        assert bls.g1_to_compressed(None) == bytes([0xC0]) + bytes(47)
        assert bls.g2_from_compressed(bytes([0xC0]) + bytes(95)) is None

    def test_non_canonical_scalar_rejected(self):
        with pytest.raises(InvalidPoint):
            bls.scalar_from_le_bytes(bls.R.to_bytes(32, "little"))
        assert bls.scalar_from_le_bytes((bls.R - 1).to_bytes(32, "little")) == bls.R - 1
