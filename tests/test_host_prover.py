"""Host (numpy) prover: correctness + bit-identity with the device provers."""

import numpy as np
import pytest

from dvt_circuits_tpu.stark import prove as device_prove
from dvt_circuits_tpu.stark import verify as stark_verify
from dvt_circuits_tpu.stark.airs import FibonacciAir, MulChainAir
from dvt_circuits_tpu.stark.config import TEST_CONFIG
from dvt_circuits_tpu.stark.host_prover import host_prove, host_prove_tables
from dvt_circuits_tpu.pcs.challenger import DuplexChallenger


def _fib(n=64):
    air = FibonacciAir()
    trace = air.generate_trace(n)
    return air, trace, air.public_values(trace)


def test_host_proof_verifies():
    air, trace, pub = _fib()
    proof = host_prove(air, trace, pub, TEST_CONFIG)
    assert stark_verify(air, proof, pub, TEST_CONFIG)


def test_host_tampered_trace_rejected():
    from dvt_circuits_tpu.stark.verifier import StarkError

    air, trace, pub = _fib()
    bad = np.asarray(trace).copy()
    bad[10, 0] = 999
    proof = host_prove(air, bad, pub, TEST_CONFIG)
    with pytest.raises(StarkError):
        stark_verify(air, proof, pub, TEST_CONFIG)


def test_host_multi_table_chained():
    e1 = _fib()
    a2 = MulChainAir()
    t2 = a2.generate_trace(64)
    entries = [e1, (a2, t2, a2.public_values(t2))]
    proofs, _ = host_prove_tables(entries, TEST_CONFIG)
    ch = DuplexChallenger()
    for (air, _, pub), proof in zip(entries, proofs):
        assert stark_verify(air, proof, pub, TEST_CONFIG, ch)


@pytest.mark.heavy  # compiles the device phase prover (minutes on CPU)
def test_host_bit_identical_to_device_prover():
    air, trace, pub = _fib()
    host_p = host_prove(air, trace, pub, TEST_CONFIG)
    device_p = device_prove(air, trace, pub, TEST_CONFIG)
    assert host_p == device_p
