"""Single-dispatch fused prover (stark/fused.py).

The fused prover must be BIT-IDENTICAL to the phase-per-dispatch legacy
prover (same transcript, same grind witness — both scan candidates from 0),
so the legacy prover + host verifier double as its oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvt_circuits_tpu.field import babybear as bb
from dvt_circuits_tpu.pcs.challenger import DuplexChallenger
from dvt_circuits_tpu.stark import prove as legacy_prove
from dvt_circuits_tpu.stark import verify
from dvt_circuits_tpu.stark.airs import FibonacciAir, MulChainAir
from dvt_circuits_tpu.stark.config import TEST_CONFIG
from dvt_circuits_tpu.stark.fused import TraceChallenger, prove_tables

import pytest as _pytest

pytestmark = _pytest.mark.heavy  # full-size proving suite (DVT_HEAVY_TESTS=1)


class TestTraceChallenger:
    def test_matches_host_challenger(self):
        """Mixed observe/sample schedule, incl. a partial-buffer duplex."""

        def run(state):
            ch = TraceChallenger(state)
            outs = []
            for i in range(5):
                ch.observe_const(1000 + i)
            outs.append(bb.from_mont(ch.sample_mont()))
            for i in range(13):
                ch.observe_const(7 * i)
            outs.extend(bb.from_mont(v) for v in ch.sample_ext_mont())
            outs.append(ch.sample_bits(11))
            return jnp.stack(outs), ch.state

        res, _ = jax.jit(run)(jnp.zeros((16,), jnp.uint32))

        host = DuplexChallenger()
        expected = []
        for i in range(5):
            host.observe(1000 + i)
        expected.append(host.sample())
        for i in range(13):
            host.observe(7 * i)
        expected.extend(host.sample_ext())
        expected.append(host.sample_bits(11))
        assert [int(x) for x in res] == [int(x) for x in expected]

    def test_grind_matches_host(self):
        bits = 6

        def run(state):
            ch = TraceChallenger(state)
            ch.observe_const(42)
            w, check = ch.grind(bits)
            return w, check, ch.state

        w, check, state = jax.jit(run)(jnp.zeros((16,), jnp.uint32))
        host = DuplexChallenger()
        host.observe(42)
        hw = host.grind(bits)
        assert int(w) == hw
        assert int(check) == 0
        assert [int(bb.from_mont(v)) for v in state] == host.state


@pytest.fixture(scope="module")
def fib():
    air = FibonacciAir()
    trace = air.generate_trace(64)
    return air, trace, air.public_values(trace)


class TestFusedProver:
    def test_bit_identical_to_legacy(self, fib):
        air, trace, pv = fib
        legacy = legacy_prove(air, trace, pv, TEST_CONFIG)
        fused, _ = prove_tables([(air, trace, pv)], TEST_CONFIG)
        assert legacy == fused[0]

    def test_verifies(self, fib):
        air, trace, pv = fib
        fused, _ = prove_tables([(air, trace, pv)], TEST_CONFIG)
        assert verify(air, fused[0], pv, TEST_CONFIG)

    def test_multi_table_chain(self, fib):
        """Two chained tables: identical to legacy chaining, and the final
        device challenger state equals the host challenger state."""
        air, trace, pv = fib
        air2 = MulChainAir()
        trace2 = air2.generate_trace(32)
        pv2 = air2.public_values(trace2)

        ch = DuplexChallenger()
        l1 = legacy_prove(air, trace, pv, TEST_CONFIG, ch)
        l2 = legacy_prove(air2, trace2, pv2, TEST_CONFIG, ch)
        proofs, state_out = prove_tables(
            [(air, trace, pv), (air2, trace2, pv2)], TEST_CONFIG
        )
        assert proofs[0] == l1
        assert proofs[1] == l2

        vch = DuplexChallenger()
        assert verify(air, proofs[0], pv, TEST_CONFIG, vch)
        assert verify(air2, proofs[1], pv2, TEST_CONFIG, vch)

        if ch.input_buffer:
            ch._duplex()
        assert [int(x) for x in np.asarray(state_out)] == [
            bb.s_to_mont(v) for v in ch.state
        ]

    def test_rejects_bad_trace_shape(self, fib):
        air, trace, pv = fib
        with pytest.raises(ValueError):
            prove_tables([(air, trace[:63], pv)], TEST_CONFIG)
        with pytest.raises(ValueError):
            prove_tables([(air, trace, pv[:-1])], TEST_CONFIG)
