"""Curve-relation glue tests (prover/curve_glue.py) — default path.

Exercises the statement → chains planning and the verifier-side host
re-derivation for all three relation kinds WITHOUT proving the STARK
(chip constraint correctness is covered by test_g1mul_air.py; the full
container round-trip by the heavy suites).  The witness programs run for
real and the glue is checked against their recorded relations.
"""

import pytest

from dvt_circuits_tpu.circuits.guest_api import run_guest
from dvt_circuits_tpu.circuits.registry import get_circuit
from dvt_circuits_tpu.dkg.hash_recorder import (
    chacha_recording,
    g1_recording,
    recording,
)
from dvt_circuits_tpu.dkg.scenario_gen import DkgCommittee
from dvt_circuits_tpu.hostcrypto import bls12_381 as host
from dvt_circuits_tpu.prover import curve_glue
from dvt_circuits_tpu.stark.sha256_air import Sha256Air, pad_message
from dvt_circuits_tpu.utils import cbor


def _run(circuit, data, auth):
    spec = get_circuit(circuit)
    with recording() as rh, chacha_recording(), g1_recording() as rg:
        res = run_guest(spec.guest, cbor.encode(data.to_json(auth)), auth)
    assert res.exit_code == 0, res.panic_message
    seen, rels = set(), []
    for pre, dig in rh:
        if dig not in seen:
            seen.add(dig)
            rels.append((pre, dig))
    # mirror the pipeline's sort-by-block-count table order
    order = sorted(range(len(rels)), key=lambda i: -len(pad_message(rels[i][0])))
    originals = [rels[i][0] for i in order]
    digests = [rels[i][1] for i in order]
    sair = Sha256Air(tuple(len(pad_message(m)) // 64 for m in originals))
    _, spub = sair.generate_trace([pad_message(m) for m in originals])
    return res, list(rg), originals, digests, (sair, spub)


def _glue_roundtrip(circuit, data, auth):
    res, rg, originals, digests, sha_ctx = _run(circuit, data, auth)
    assert rg, "witness recorded no curve relation"
    out = []
    for rel in rg:
        gadget, (air, trace, publics) = curve_glue.build_gadget(
            rel, originals, digests, res.public_values, auth
        )
        kind, sig_checks = curve_glue.verify_gadget_glue(
            air, publics, gadget["extras"], res.public_values, sha_ctx,
            auth, circuit,
        )
        out.append((rel, gadget, air, publics, res, sha_ctx, kind, sig_checks))
    return out


@pytest.mark.parametrize("auth", [True, False])
def test_poly_glue_roundtrip(auth):
    data = DkgCommittee(3, 2).shared_data_bad_secret(0, 1, auth)
    (rel, gadget, air, publics, res, sha_ctx, kind, sig_checks), = _glue_roundtrip(
        "bad-share", data, auth
    )
    assert kind == "poly"
    assert sig_checks == (1 if auth else 0)  # verify_commitment ECDSA re-run
    assert air.chain_bits == (256, 32)
    # chain 0 proves sk·G, the Horner chain id·C_1
    assert air.operand_of(publics, 0) == host.G1_GEN


@pytest.mark.parametrize("auth", [True, False])
def test_agg_glue_roundtrip(auth):
    data = DkgCommittee(3, 2).finalization_data()
    (rel, gadget, air, publics, res, sha_ctx, kind, sig_checks), = _glue_roundtrip(
        "finalization", data, auth
    )
    assert kind == "agg"
    assert sig_checks == 3  # n per-generation BLS verifies re-run
    # n=3, k=2: 3 Horner chains (32-bit) + 2·3 Lagrange chains (256-bit)
    assert air.chain_bits == (32,) * 3 + (256,) * 6


@pytest.mark.parametrize("auth", [True, False])
def test_partial_glue_roundtrip(auth):
    data = DkgCommittee(3, 2).bad_partial_key_data(1, auth)
    (rel, gadget, air, publics, res, sha_ctx, kind, sig_checks), = _glue_roundtrip(
        "bad-partial-key", data, auth
    )
    assert kind == "partial"
    # perpetrator BLS sig always; + commitment ECDSA in auth mode
    assert sig_checks == (2 if auth else 1)
    assert air.chain_bits == (32,)


def test_poly_glue_rejects_wrong_scalar():
    data = DkgCommittee(3, 2).shared_data_bad_secret(0, 1, True)
    (rel, gadget, air, publics, res, sha_ctx, _, _), = _glue_roundtrip(
        "bad-share", data, True
    )
    bad = list(publics)
    bad[0] = (bad[0] + 1) % 256  # first sk byte
    with pytest.raises(curve_glue.GlueError):
        curve_glue.verify_gadget_glue(
            air, bad, gadget["extras"], res.public_values, sha_ctx, True,
            "bad-share",
        )


def test_agg_glue_rejects_wrong_aggregate():
    data = DkgCommittee(3, 2).finalization_data()
    (rel, gadget, air, publics, res, sha_ctx, _, _), = _glue_roundtrip(
        "finalization", data, True
    )
    # tamper the committed aggregate key frame → both Lagrange sums mismatch
    stream = bytearray(res.public_values)
    stream[-1] ^= 0x01
    with pytest.raises(curve_glue.GlueError):
        curve_glue.verify_gadget_glue(
            air, publics, gadget["extras"], bytes(stream), sha_ctx, True,
            "finalization",
        )


def test_partial_glue_enforces_last_match_and_binding():
    data = DkgCommittee(3, 2).bad_partial_key_data(1, True)
    (rel, gadget, air, publics, res, sha_ctx, _, _), = _glue_roundtrip(
        "bad-partial-key", data, True
    )
    # point the perpetrator index at a different generation → preimage
    # binding (auth) must reject it
    extras = list(gadget["extras"])
    extras[3] = (extras[3] + 1) % 3
    with pytest.raises(curve_glue.GlueError):
        curve_glue.verify_gadget_glue(
            air, publics, extras, res.public_values, sha_ctx, True,
            "bad-partial-key",
        )


def test_scaled_committee_bad_share_fully_carried():
    """n=16, k=8: every relation carriable, nothing silently degraded
    (VERDICT r3 item 3 done-criterion at generator scale)."""
    data = DkgCommittee(16, 8).shared_data_bad_secret(3, 7, True)
    (rel, gadget, air, publics, res, sha_ctx, kind, sig_checks), = _glue_roundtrip(
        "bad-share", data, True
    )
    assert kind == "poly"
    assert air.chain_bits == (256,) + (32,) * 7  # sk·G + 7 Horner chains


def test_scaled_committee_partial_key_fully_carried():
    data = DkgCommittee(8, 3).bad_partial_key_data(5, True)
    (rel, gadget, air, publics, res, sha_ctx, kind, sig_checks), = _glue_roundtrip(
        "bad-partial-key", data, True
    )
    assert kind == "partial"
    assert air.chain_bits == (32, 32)


def test_scaled_committee_finalization_fully_carried():
    data = DkgCommittee(4, 2).finalization_data()
    (rel, gadget, air, publics, res, sha_ctx, kind, sig_checks), = _glue_roundtrip(
        "finalization", data, True
    )
    assert kind == "agg"
    # 4 Horner chains (32-bit) + 2·4 Lagrange chains (256-bit)
    assert air.chain_bits == (32,) * 4 + (256,) * 8


def test_scaled_committee_sha_table_fits_caps():
    """The raised SHA caps (64 msgs / 512 blocks) absorb n=16 committees
    without omissions."""
    from dvt_circuits_tpu.prover.pipeline import MAX_SHA_BLOCKS, MAX_SHA_GADGETS

    data = DkgCommittee(16, 8).shared_data_bad_secret(3, 7, True)
    res, rg, originals, digests, _ = _run("bad-share", data, True)
    blocks = sum(len(pad_message(m)) // 64 for m in originals)
    assert len(originals) <= MAX_SHA_GADGETS
    assert blocks <= MAX_SHA_BLOCKS


def test_valid_share_is_not_slashable():
    """A VALID share's relation must be rejected by the glue (pk == poly)."""
    cm = DkgCommittee(3, 2)
    data = cm.shared_data(0, 1, True)  # valid exchange
    spec = get_circuit("bad-share")
    with recording() as rh, chacha_recording(), g1_recording() as rg:
        res = run_guest(spec.guest, cbor.encode(data.to_json(True)), True)
    assert res.exit_code == 1  # guest panics: share is valid
    assert rg, "relation recorded before the validity decision"
    # craft the gadget anyway: the glue must refuse the pk == poly outcome
    rel = rg[0]
    with pytest.raises(Exception):
        # public_values stream is empty on panic — binding cannot anchor
        curve_glue.build_gadget(rel, [], [], res.public_values, True)


@pytest.mark.heavy  # host-prover STARK of the full chip (CPU-minutes)
def test_finalization_container_roundtrip_host_prover():
    """End-to-end finalization container with the aggregation chip, proven
    by the numpy host prover and strictly verified (curve-bound)."""
    import os

    from dvt_circuits_tpu.dkg.scenario_gen import DkgCommittee
    from dvt_circuits_tpu.prover.pipeline import prove_circuit, verify_proof
    from dvt_circuits_tpu.stark.config import TEST_CONFIG

    os.environ["DVT_PROVER"] = "host"
    try:
        data = DkgCommittee(3, 2).finalization_data()
        container = prove_circuit("finalization", data, True, TEST_CONFIG)
        res = verify_proof(container, strict=False)
        assert res.binding == "curve-bound+sig" and res.g1_relations == 1
        assert res.sig_checks == 3  # n BLS verifies re-run by the verifier
        assert container["g1_omitted"] == 0
    finally:
        os.environ.pop("DVT_PROVER", None)
