"""Scenario generator at scaled committee sizes + reference examples."""

import json

import pytest

from dvt_circuits_tpu.circuits.registry import get_circuit
from dvt_circuits_tpu.dkg.scenario_gen import DkgCommittee
from dvt_circuits_tpu.prover.pipeline import execute_circuit


@pytest.mark.parametrize("n,k", [(3, 2), (5, 3)])
def test_committee_scenarios(n, k):
    c = DkgCommittee(n, k)
    # valid finalization verifies (exit 0)
    r = execute_circuit("finalization", c.finalization_data(), False)
    assert r.exit_code == 0, r.panic_message
    # wrong aggregate key fails
    assert execute_circuit("finalization", c.finalization_bad_aggregate(), False).exit_code == 1
    for auth in (False, True):
        # a valid share is unprovable (guest panics, exit 1)
        assert execute_circuit("bad-share", c.shared_data(0, 1, auth), auth).exit_code == 1
        # a corrupted share is a provable slashable fault (exit 0)
        r = execute_circuit("bad-share", c.shared_data_bad_secret(0, 1, auth), auth)
        assert r.exit_code == 0, r.panic_message
        assert r.commit_count == n + 1  # n hashes + perpetrator pubkey


def test_reference_examples_bls_setup():
    """The reference examples carry BLS commitment keys — provable under the
    bls-commitment setup extension (the reference host itself cannot parse
    them; SURVEY.md §2.1 documents the bit-rot)."""
    cases = [
        ("bad-share", "dvt_bad_share.json", 0),
        ("finalization", "finalization_test.json", 0),
        ("bad-partial-key", "bad_partial_key.json", 0),
    ]
    for circuit, fname, expected in cases:
        spec = get_circuit(circuit, "bls-commitment")
        data = spec.data_type.from_json(
            json.load(open(f"/root/reference/examples/{fname}")), spec.setup.layout, False
        )
        r = execute_circuit(circuit, data, False, "bls-commitment")
        assert r.exit_code == expected, (fname, r.panic_message)
