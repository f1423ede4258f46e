"""G1 gadget integration: the bad-share proof carries the curve relation.

Covers the v6 proof semantics (prover/pipeline.py + prover/curve_glue.py):
the tall G1MulAir table proves pk(secret) ≠ poly(id) in-circuit and the
verifier glue binds its public scalars/operands/results to the SHA table's
preimages and the committed stream.
"""

import numpy as np
import pytest

from dvt_circuits_tpu.dkg.scenario_gen import DkgCommittee
from dvt_circuits_tpu.prover.pipeline import (
    VerifyError,
    prove_circuit,
    verify_proof,
)
from dvt_circuits_tpu.stark.config import TEST_CONFIG

pytestmark = pytest.mark.heavy  # full-size proving suite (DVT_HEAVY_TESTS=1)


def _load(auth: bool):
    """A share that does not lie on the sender's committed polynomial — the
    poly-mismatch slashable fault (the reference's own exit-0 share vectors
    all fault at the hash/parse level BEFORE the curve check, so the G1
    relation is exercised via the scenario generator)."""
    return DkgCommittee(3, 2).shared_data_bad_secret(0, 1, auth)


@pytest.fixture(scope="module", autouse=True)
def _phase_prover():
    # the phase-per-dispatch prover keeps CPU compile time sane for the
    # production-width chip; fused-vs-phase identity is covered separately
    import os

    os.environ["DVT_FUSED"] = "0"
    yield
    os.environ.pop("DVT_FUSED", None)


@pytest.fixture(scope="module")
def container_auth():
    return prove_circuit("bad-share", _load(True), True, TEST_CONFIG)


def _copy(container):
    import copy

    return copy.deepcopy(container)


def test_badshare_auth_proof_carries_g1mul_gadget(container_auth):
    container = container_auth
    kinds = [g["kind"] for g in container["gadgets"]]
    assert "g1mul" in kinds, kinds
    entry = next(g for g in container["gadgets"] if g["kind"] == "g1mul")
    kind_id, k, seed_ref, init_ref = entry["extras"][:4]
    assert kind_id == 1 and k == 2  # "poly" relation at threshold 2
    assert len(entry["extras"]) == 4 + 97  # + ECDSA commitment credentials
    assert entry["block_counts"] == [256, 32]  # sk·G chain + one Horner chain
    assert init_ref > 0  # C_j bound to the initial-commitment preimage
    assert seed_ref > 0  # sk/id anchored via the seed-exchange preimage
    assert container["g1_omitted"] == 0
    result = verify_proof(container, strict=True)
    assert result.binding == "curve-bound+sig" and result.g1_relations == 1
    assert result.sig_checks == 1  # verify_commitment ECDSA re-run


def test_badshare_noauth_proof_carries_g1mul_gadget():
    container = prove_circuit("bad-share", _load(False), False, TEST_CONFIG)
    entry = next(g for g in container["gadgets"] if g["kind"] == "g1mul")
    kind_id, k, seed_ref, init_ref = entry["extras"][:4]
    assert init_ref > 0
    assert seed_ref == 0  # no hash anchor without auth_commitment
    result = verify_proof(container, strict=True)
    assert result.binding == "curve-bound-noauth"


def test_tampered_g1_public_rejected(container_auth):
    container = _copy(container_auth)
    entry = next(g for g in container["gadgets"] if g["kind"] == "g1mul")
    pv = entry["proof"]["public_values"]
    pv[0] = (pv[0] + 1) % 256  # first sk byte → seed-preimage binding breaks
    with pytest.raises(VerifyError):
        verify_proof(container)


def test_stripped_g1_gadget_rejected(container_auth):
    container = _copy(container_auth)
    container["gadgets"] = [
        g for g in container["gadgets"] if g["kind"] != "g1mul"
    ]
    with pytest.raises(VerifyError):
        verify_proof(container)


def test_strict_rejects_omitted_relations(container_auth):
    """DVT_G1=0 containers honestly count the omission; strict callers must
    see them rejected (advisor r3 finding 2)."""
    import os

    os.environ["DVT_G1"] = "0"
    try:
        container = prove_circuit("bad-share", _load(True), True, TEST_CONFIG)
    finally:
        os.environ.pop("DVT_G1", None)
    assert container["g1_omitted"] == 1
    result = verify_proof(container)  # non-strict: flagged, not rejected
    assert result.binding == "hash-bound" and result.g1_omitted == 1
    with pytest.raises(VerifyError):
        verify_proof(container, strict=True)


def test_fused_g1_matches_phase_prover():
    """Fused vs phase prover bit-identity for the chip, INCLUDING the
    wide-table group split: [narrow fib, wide g1mul] chains the transcript
    across two fused dispatches and must equal the phase prover's chained
    result exactly (reduced chain widths keep the CPU graph small)."""
    from dvt_circuits_tpu.hostcrypto import bls12_381 as host
    from dvt_circuits_tpu.pcs.challenger import DuplexChallenger
    from dvt_circuits_tpu.stark import prove as phase_prove
    from dvt_circuits_tpu.stark import verify as stark_verify
    from dvt_circuits_tpu.stark.airs import FibonacciAir
    from dvt_circuits_tpu.stark.fused import prove_tables
    from dvt_circuits_tpu.stark.g1mul_air import G1MulAir

    rng = np.random.default_rng(7)
    air = G1MulAir((16,))
    p = host.g1_mul(host.G1_GEN, int(rng.integers(2, 1 << 40)))
    sk = int(rng.integers(1, 1 << 16))
    trace, publics = air.generate_trace([(sk.to_bytes(2, "big"), p)])
    fib = FibonacciAir()
    ftrace = fib.generate_trace(16)
    fpub = fib.public_values(ftrace)

    entries = [(fib, ftrace, fpub), (air, trace, publics)]
    fused_proofs, _ = prove_tables(entries, TEST_CONFIG)

    ch = DuplexChallenger()
    phase_proofs = [phase_prove(a, t, p_, TEST_CONFIG, ch) for a, t, p_ in entries]
    assert fused_proofs == phase_proofs

    ch = DuplexChallenger()
    assert stark_verify(fib, fused_proofs[0], fpub, TEST_CONFIG, ch)
    assert stark_verify(air, fused_proofs[1], publics, TEST_CONFIG, ch)
