"""Fast DEFAULT-PATH pipeline smoke: full prove → verify round-trip.

Uses the pure-numpy host prover (stark/host_prover.py, DVT_PROVER=host) so
no XLA phase compile is involved — the whole smoke runs in seconds, which
is what lets a REAL container round-trip live in the default CI budget
(VERDICT r3 item 8; the device provers' first compile costs minutes per
table shape and stays behind DVT_HEAVY_TESTS).
"""

import json
import os

import pytest

from dvt_circuits_tpu.circuits.registry import get_circuit
from dvt_circuits_tpu.prover.pipeline import (
    VerifyError,
    load_proof,
    prove_circuit,
    save_proof,
    verify_proof,
)
from dvt_circuits_tpu.stark.config import TEST_CONFIG

VEC = "/root/reference/test_vectors/auth/share/seeds-commitment-from-2-to-1-bad-base-hash.json"


@pytest.fixture(scope="module", autouse=True)
def _host_prover():
    os.environ["DVT_PROVER"] = "host"
    yield
    os.environ.pop("DVT_PROVER", None)


@pytest.fixture(scope="module")
def container():
    spec = get_circuit("bad-share")
    data = spec.data_type.from_json(
        json.load(open(VEC))["scenario"], spec.setup.layout, True
    )
    return prove_circuit("bad-share", data, True, TEST_CONFIG)


def test_roundtrip(container, tmp_path):
    res = verify_proof(container, "bad-share")
    assert res.binding == "hash-bound"  # this vector faults pre-curve-check
    path = str(tmp_path / "proof.bin")
    save_proof(container, path)
    assert verify_proof(load_proof(path))


def test_tampered_stream_rejected(container):
    bad = dict(container)
    stream = bytearray(bytes.fromhex(bad["public_values"]))
    stream[len(stream) // 2] ^= 1
    bad["public_values"] = bytes(stream).hex()
    with pytest.raises(VerifyError):
        verify_proof(bad)


def test_curve_relation_smoke():
    """The tall G1 chip end-to-end on the host prover: the generated
    poly-mismatch fault carries a g1mul table whose glue verifies."""
    from dvt_circuits_tpu.dkg.scenario_gen import DkgCommittee

    data = DkgCommittee(3, 2).shared_data_bad_secret(0, 1, True)
    container = prove_circuit("bad-share", data, True, TEST_CONFIG)
    res = verify_proof(container, strict=True)
    assert res.binding == "curve-bound+sig" and res.g1_relations == 1


def test_strict_covers_finalization_and_partial_key():
    """strict/--require-curve-binding now also rejects finalization and
    bad-partial-key containers whose curve relations are omitted or absent
    (advisor r4 finding 2 / VERDICT r4 item 6) — host prover, no XLA."""
    import os

    import pytest

    from dvt_circuits_tpu.dkg.scenario_gen import DkgCommittee

    os.environ["DVT_PROVER"] = "host"
    os.environ["DVT_G1"] = "0"
    try:
        committee = DkgCommittee(3, 2)
        for name, data in (
            ("finalization", committee.finalization_data()),
            ("bad-partial-key", committee.bad_partial_key_data(1, True)),
        ):
            container = prove_circuit(name, data, True, TEST_CONFIG)
            assert container["g1_omitted"] == 1
            res = verify_proof(container)  # non-strict: flagged only
            assert res.binding == "hash-bound" and res.g1_omitted == 1
            with pytest.raises(VerifyError):
                verify_proof(container, strict=True)
    finally:
        os.environ.pop("DVT_G1", None)
        os.environ.pop("DVT_PROVER", None)
