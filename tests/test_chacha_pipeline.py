"""Encrypted-share proof: ChaCha20 decrypt table integration.

The parse-failure path of the encrypted-share circuit (the reference's only
exit-0 path, crates/bad_encrypted_share_prove/src/main.rs:358-370) now
carries a ChaCha20 keystream table on the shared transcript: the key is
bound to the SHA table's ECDH-point digest and the ciphertext to the
committed stream, so the decryption the witness performed is
verifier-recomputable (prover/pipeline.py proof semantics v4)."""

import copy
import json

import pytest

from dvt_circuits_tpu.circuits.registry import get_circuit
from dvt_circuits_tpu.hostcrypto.chacha20 import chacha20_keystream
from dvt_circuits_tpu.prover.pipeline import (
    VerifyError,
    prove_circuit,
    verify_proof,
)
from dvt_circuits_tpu.stark.chacha20_air import (
    init_from_publics,
    keystream_from_publics,
)
from dvt_circuits_tpu.stark.config import TEST_CONFIG

import pytest as _pytest

pytestmark = _pytest.mark.heavy  # full-size proving suite (DVT_HEAVY_TESTS=1)

VEC = (
    "/root/reference/test_vectors/auth/bad_encrypted_share/"
    "seeds-commitment-from-1-to-2-bad-encrypted-msg.json"
)


@pytest.fixture(scope="module")
def container():
    spec = get_circuit("bad-encrypted-share")
    data = spec.data_type.from_json(
        json.load(open(VEC))["scenario"], spec.setup.layout, True
    )
    return prove_circuit("bad-encrypted-share", data, True, TEST_CONFIG)


def _chacha_gadget(container):
    return next(g for g in container["gadgets"] if g["kind"] == "chacha20")


class TestChaChaPipeline:
    def test_roundtrip_with_chacha_table(self, container):
        assert verify_proof(container)
        g = _chacha_gadget(container)
        assert container["chacha_omitted"] == 0
        assert g["stream_offsets"][0] is not None

    def test_keystream_matches_cipher_and_stream_ciphertext(self, container):
        g = _chacha_gadget(container)
        publics = g["proof"]["public_values"]
        key, ctr0, nonce = init_from_publics(publics, 0)
        assert ctr0 == 0 and nonce == key[:12]
        nb, ct_len = g["block_counts"][0], g["extras"][1]
        ks = b"".join(keystream_from_publics(publics, j) for j in range(nb))
        assert ks[:ct_len] == chacha20_keystream(key, nonce, ct_len)
        stream = bytes.fromhex(container["public_values"])
        off = g["stream_offsets"][0]
        ct = bytes.fromhex(stream[off : off + 2 * ct_len].decode("ascii"))
        assert len(ct) == ct_len  # plaintext = ct XOR ks is recomputable

    def test_tampered_keystream_public_rejected(self, container):
        bad = copy.deepcopy(container)
        g = _chacha_gadget(bad)
        g["proof"]["public_values"][30] = int(g["proof"]["public_values"][30]) ^ 1
        with pytest.raises(VerifyError):
            verify_proof(bad)

    def test_key_binding_to_sha_digest_enforced(self, container):
        bad = copy.deepcopy(container)
        g = _chacha_gadget(bad)
        # point the key at a different SHA-table message: binding must fail
        g["extras"][2] = (g["extras"][2] + 1) % 4
        with pytest.raises(VerifyError):
            verify_proof(bad)

    def test_stripped_chacha_table_rejected(self, container):
        bad = copy.deepcopy(container)
        bad["gadgets"] = [g for g in bad["gadgets"] if g["kind"] != "chacha20"]
        with pytest.raises(VerifyError):
            verify_proof(bad)
