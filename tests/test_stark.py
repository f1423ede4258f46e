"""End-to-end uni-STARK tests: prove/verify roundtrips, soundness smoke."""

import copy

import numpy as np
import pytest

from dvt_circuits_tpu.stark import StarkError, prove, verify
from dvt_circuits_tpu.stark.airs import FibonacciAir, MulChainAir
from dvt_circuits_tpu.stark.config import TEST_CONFIG

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


@pytest.fixture(scope="module")
def fib_proof():
    air = FibonacciAir()
    trace = air.generate_trace(64)
    pv = air.public_values(trace)
    proof = prove(air, trace, pv, TEST_CONFIG)
    return air, trace, pv, proof


class TestFibonacci:
    def test_roundtrip(self, fib_proof):
        air, _, pv, proof = fib_proof
        assert verify(air, proof, pv, TEST_CONFIG)

    def test_wrong_public_value(self, fib_proof):
        air, _, pv, proof = fib_proof
        with pytest.raises(StarkError):
            verify(air, proof, [pv[0], pv[1], (pv[2] + 1)], TEST_CONFIG)

    def test_tampered_trace_root(self, fib_proof):
        air, _, pv, proof = fib_proof
        bad = copy.deepcopy(proof)
        bad["root_t"][0] ^= 1
        with pytest.raises(StarkError):
            verify(air, bad, pv, TEST_CONFIG)

    def test_tampered_opening(self, fib_proof):
        air, _, pv, proof = fib_proof
        bad = copy.deepcopy(proof)
        blob = bytearray(bad["opened_t_zeta"])
        blob[3] ^= 1  # first opened value's low byte (packed 4-byte words)
        bad["opened_t_zeta"] = bytes(blob)
        with pytest.raises(StarkError):
            verify(air, bad, pv, TEST_CONFIG)

    def test_tampered_outer_opening(self, fib_proof):
        air, _, pv, proof = fib_proof
        bad = copy.deepcopy(proof)
        blob = bytearray(bad["query_openings"][1]["t"]["lo"]["row"])
        blob[3] ^= 1
        bad["query_openings"][1]["t"]["lo"]["row"] = bytes(blob)
        with pytest.raises(StarkError):
            verify(air, bad, pv, TEST_CONFIG)

    def test_invalid_trace_rejected(self, fib_proof):
        air, trace, pv, _ = fib_proof
        bad_trace = trace.copy()
        bad_trace[10, 0] = 999
        proof = prove(air, bad_trace, pv, TEST_CONFIG)
        with pytest.raises(StarkError):
            verify(air, proof, pv, TEST_CONFIG)


def test_mulchain_degree3():
    air = MulChainAir()
    trace = air.generate_trace(32)
    pv = air.public_values(trace)
    proof = prove(air, trace, pv, TEST_CONFIG)
    assert verify(air, proof, pv, TEST_CONFIG)
    with pytest.raises(StarkError):
        verify(air, proof, [pv[0], (pv[1] + 1)], TEST_CONFIG)
