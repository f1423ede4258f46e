"""Tall G1 multi-chain scalar-mul chip tests (stark/g1mul_air.py).

Reduced scalar widths keep CPU traces tiny; the sub-row program is
width-parametric so the production 256-bit chains run the identical
constraint system.  ``check_trace`` exercises the scalar ``eval``; the
prove/verify round-trip is the tensor-vs-scalar cross-check (prover uses
``eval_tensor``, verifier replays ``eval`` at ζ).
"""

import numpy as np
import pytest

from dvt_circuits_tpu.hostcrypto import bls12_381 as host
from dvt_circuits_tpu.stark import bigfield as bf
from dvt_circuits_tpu.stark.config import TEST_CONFIG
from dvt_circuits_tpu.stark.debug import check_trace
from dvt_circuits_tpu.stark.g1mul_air import (
    B_COL,
    COPY0,
    G1MulAir,
    INF_COL,
)


def _setup(seed, chain_bits=(8, 16)):
    rng = np.random.default_rng(seed)
    air = G1MulAir(chain_bits)
    chains = []
    expects = []
    for bits in chain_bits:
        s = int(rng.integers(1, 1 << bits))
        p = host.g1_mul(host.G1_GEN, int(rng.integers(2, 1 << 60)))
        chains.append((s.to_bytes(bits // 8, "big"), p))
        expects.append(host.g1_mul(p, s))
    trace, publics = air.generate_trace(chains)
    return air, trace, publics, chains, expects


def test_trace_matches_host_and_satisfies_constraints():
    air, trace, publics, chains, expects = _setup(1)
    for c, exp in enumerate(expects):
        inf, x, y = air.result_of(publics, c)
        assert inf == 0 and (x, y) == exp
        assert air.operand_of(publics, c) == chains[c][1]
    check_trace(air, trace, publics)


def test_zero_scalar_gives_infinity():
    air = G1MulAir((8,))
    p = host.g1_mul(host.G1_GEN, 5)
    trace, publics = air.generate_trace([(b"\x00", p)])
    inf, x, y = air.result_of(publics, 0)
    assert inf == 1
    check_trace(air, trace, publics)


@pytest.mark.heavy
def test_prove_verify_roundtrip():
    from dvt_circuits_tpu.stark import prove, verify

    air, trace, publics, _, _ = _setup(2, chain_bits=(8,))
    proof = prove(air, trace, publics, TEST_CONFIG)
    assert verify(air, proof, publics, TEST_CONFIG)


@pytest.mark.heavy
def test_tampered_result_public_rejected():
    from dvt_circuits_tpu.stark import prove, verify
    from dvt_circuits_tpu.stark.verifier import StarkError

    air, trace, publics, _, _ = _setup(3, chain_bits=(8,))
    proof = prove(air, trace, publics, TEST_CONFIG)
    bad = list(publics)
    b0 = air.pub_base[0] + 1 + 2 * bf.NLIMBS  # first result limb
    bad[b0 + 1] = (bad[b0 + 1] + 1) % (1 << bf.LIMB_BITS)
    with pytest.raises(StarkError):
        verify(air, proof, bad, TEST_CONFIG)


def test_tampered_bit_fails_constraints():
    air, trace, publics, _, _ = _setup(4, chain_bits=(8,))
    bad = trace.copy()
    # flip the ladder bit of op 3 on all 7 sub-rows (consistently, so the
    # in-op propagation holds — the scalar byte binding must still catch it)
    rows = slice(3 * 7, 4 * 7)
    bad[rows, B_COL] = 1 - bad[rows, B_COL]
    with pytest.raises(AssertionError):
        check_trace(air, bad, publics)


def test_tampered_copy_fails_constraints():
    air, trace, publics, _, _ = _setup(5, chain_bits=(8,))
    bad = trace.copy()
    # CP4 (copy bank 4) carries dZ3 through the whole ladder op — row 10 is
    # phase L3 of op 1, where CP4 is both a copy target and a copy source
    col = COPY0 + 4 * bf.NLIMBS
    bad[10, col] = (bad[10, col] + 1) % 1024
    with pytest.raises(AssertionError):
        check_trace(air, bad, publics, max_rows=16)


def test_x_collision_unprovable():
    air = G1MulAir((8,))
    # scalar 0b11: after the first add (acc = P), the next madd adds P to 2P
    # — fine; force the collision: scalar 0b101 on P gives acc=4P+...; use
    # the direct construction instead: s=3 makes dbl(P)=2P then madd P:
    # x(2P) != x(P) normally, so craft the actual collision via s where the
    # running acc equals ±P: s = 0b11 → after bit1: acc=P; bit2: dbl→2P,
    # madd P → H = x(P)−x(2P) ≠ 0.  The reliable collision: P with order-2?
    # none on G1.  So instead check the guard column directly: zeroing H's
    # inverse on an active madd row must fail the HI=1 constraint.
    p = host.g1_mul(host.G1_GEN, 9)
    trace, publics = air.generate_trace([(b"\x05", p)])
    bad = trace.copy()
    # find an L6 row with b=1, inf=0 and zero its INVV crumb bank
    rows = [
        r
        for r in range(air.min_rows)
        if air.rows[r]["ph"] == "L6"
        and bad[r, B_COL] == 1
        and bad[r, INF_COL] == 0
    ]
    assert rows
    r = rows[-1]
    from dvt_circuits_tpu.stark.g1mul_air import INVV, M0R, VALUE_CRUMBS

    bad[r, INVV * VALUE_CRUMBS : (INVV + 1) * VALUE_CRUMBS] = 0
    with pytest.raises(AssertionError):
        check_trace(air, bad, publics, max_rows=None)
