"""G1 program chip tests (stark/g1_air.py + stark/bigfield.py).

Reduced scalar widths (sk_bits=16, id_bits=8) keep CPU traces tiny; the
row program is width-parametric so the production 256/32-bit chip runs the
identical constraint system.  The prove/verify round-trip is the
tensor-vs-scalar eval cross-check (prover uses ``eval_tensor``, verifier
replays ``eval`` at ζ).
"""

import numpy as np
import pytest

from dvt_circuits_tpu.hostcrypto import bls12_381 as host
from dvt_circuits_tpu.stark import bigfield as bf
from dvt_circuits_tpu.stark.debug import check_trace
from dvt_circuits_tpu.stark.g1_air import G1PolyAir
from dvt_circuits_tpu.stark.config import TEST_CONFIG

import pytest as _pytest

pytestmark = _pytest.mark.heavy  # full-size proving suite (DVT_HEAVY_TESTS=1)


def _poly_eval(c_points, x):
    """Horner over affine points, mirroring dkg_math.evaluate_polynomial."""
    res = c_points[-1]
    for c in reversed(c_points[:-1]):
        res = host.g1_add(host.g1_mul(res, x), c)
    return res


def _setup(seed, k=2, sk_bits=16, id_bits=8):
    rng = np.random.default_rng(seed)
    air = G1PolyAir(k, sk_bits=sk_bits, id_bits=id_bits)
    sk = int(rng.integers(1, 1 << sk_bits))
    idv = int(rng.integers(1, 1 << id_bits))
    cs = [host.g1_mul(host.G1_GEN, int(rng.integers(2, 1 << 60))) for _ in range(k)]
    sk_bytes = sk.to_bytes(sk_bits // 8, "big")
    trace, publics = air.generate_trace(sk_bytes, idv, cs)
    return air, trace, publics, sk, idv, cs


def test_bigfield_mul_red_witness():
    rng = np.random.default_rng(0)
    a = [int.from_bytes(rng.bytes(47), "big") % host.P for _ in range(8)]
    b = [int.from_bytes(rng.bytes(47), "big") % host.P for _ in range(8)]
    q, r, carries = bf.mul_witness_rows(a, b)
    for i in range(8):
        assert r[i] == a[i] * b[i] % host.P
        assert a[i] * b[i] == q[i] * host.P + r[i]
    f = [ai * 7 + 3 * host.P for ai in a]
    qs, rr, rc = bf.red_witness_rows(f)
    for i in range(8):
        assert rr[i] == f[i] % host.P


def test_trace_satisfies_constraints_and_matches_host():
    air, trace, publics, sk, idv, cs = _setup(1)
    check_trace(air, trace, publics)
    (infa, xa, ya), (infb, xb, yb) = air.out_points(publics)
    assert (infa, (xa, ya)) == (0, host.g1_mul(host.G1_GEN, sk))
    expect = _poly_eval(cs, idv)
    assert (infb, (xb, yb)) == (0, expect)


def test_trace_k3_horner_with_norm_rows():
    air, trace, publics, sk, idv, cs = _setup(2, k=3)
    check_trace(air, trace, publics)
    (_, xa, ya), (infb, xb, yb) = air.out_points(publics)
    assert (xa, ya) == host.g1_mul(host.G1_GEN, sk)
    assert (infb, (xb, yb)) == (0, _poly_eval(cs, idv))


def test_tampered_trace_fails():
    air, trace, publics, *_ = _setup(3)
    bad = trace.copy()
    # flip one crumb of the first mul output on an active row
    col = (11) * bf.VALUE_CRUMBS + 10
    bad[0, col] = (bad[0, col] + 1) % 4
    with pytest.raises(AssertionError):
        check_trace(air, bad, publics, max_rows=4)


def test_wrong_public_result_fails():
    air, trace, publics, *_ = _setup(4)
    bad = list(publics)
    bad[air.oa_base + 1] = (bad[air.oa_base + 1] + 1) % (1 << bf.LIMB_BITS)
    with pytest.raises(AssertionError):
        check_trace(air, trace, bad, max_rows=None)


def test_check_publics_ranges():
    air, trace, publics, *_ = _setup(5)
    air.check_publics(publics)
    bad = list(publics)
    bad[0] = 300
    with pytest.raises(ValueError):
        air.check_publics(bad)
    bad = list(publics)
    bad[air.c_base] = 1 << bf.LIMB_BITS
    with pytest.raises(ValueError):
        air.check_publics(bad)


def test_stark_roundtrip_and_soundness():
    """Full prove/verify on the chip: the tensor-path prover against the
    scalar-path verifier, plus a tampered-public rejection."""
    from dvt_circuits_tpu.stark import prove, verify
    from dvt_circuits_tpu.stark.verifier import StarkError

    air, trace, publics, *_ = _setup(6)
    proof = prove(air, trace, publics, TEST_CONFIG)
    assert verify(air, proof, publics, TEST_CONFIG)
    bad = list(publics)
    bad[air.oa_base + 3] = (bad[air.oa_base + 3] + 1) % (1 << bf.LIMB_BITS)
    with pytest.raises(StarkError):
        verify(air, proof, bad, TEST_CONFIG)
