"""Native BLS12-381 backend (native/bls381.cpp) vs the pure-Python oracle."""

import random

import pytest

from dvt_circuits_tpu.hostcrypto import bls12_381 as b
from dvt_circuits_tpu.hostcrypto import bls_native as nb

pytestmark = pytest.mark.skipif(
    nb.load() is None, reason="native BLS backend unavailable"
)


def _py_g1_mul(pt, k):
    result = None
    add = pt
    while k > 0:
        if k & 1:
            result = b.g1_add(result, add)
        add = b.g1_add(add, add)
        k >>= 1
    return result


def _py_g2_mul(pt, k):
    result = None
    add = pt
    while k > 0:
        if k & 1:
            result = b.g2_add(result, add)
        add = b.g2_add(add, add)
        k >>= 1
    return result


def test_g1_mul_matches_python():
    rng = random.Random(11)
    for _ in range(5):
        k = rng.randrange(1, b.R)
        assert nb.g1_mul(b.G1_GEN, k)[0] == _py_g1_mul(b.G1_GEN, k)
    assert nb.g1_mul(b.G1_GEN, b.R) == (None,)  # order annihilates
    assert nb.g1_mul(None, 7) == (None,)
    assert nb.g1_mul(b.G1_GEN, 0) == (None,)


def test_g2_mul_matches_python():
    rng = random.Random(12)
    for _ in range(3):
        k = rng.randrange(1, b.R)
        assert nb.g2_mul(b.G2_GEN, k)[0] == _py_g2_mul(b.G2_GEN, k)
    assert nb.g2_mul(b.G2_GEN, b.R) == (None,)
    # cofactor-clearing-sized scalar (∼636 bits)
    big = (1 << 636) + 987654321
    assert nb.g2_mul(b.G2_GEN, big)[0] == _py_g2_mul(b.G2_GEN, big)


def test_pairings_equal_bilinear():
    rng = random.Random(13)
    x, y = rng.randrange(2, b.R), rng.randrange(2, b.R)
    P = b.g1_mul(b.G1_GEN, x)
    Q = b.g2_mul(b.G2_GEN, y)
    xyG1 = b.g1_mul(b.G1_GEN, x * y % b.R)
    assert nb.pairings_equal(P, Q, xyG1, b.G2_GEN) is True
    assert nb.pairings_equal(P, Q, b.g1_mul(b.G1_GEN, (x * y + 1) % b.R), b.G2_GEN) is False
    # infinity handling: e(∞, Q) == e(P, ∞) == 1
    assert nb.pairings_equal(None, Q, P, None) is True


def test_pairings_equal_matches_python_miller():
    """Full agreement with the pure pairing on a signature-verify shape."""
    rng = random.Random(14)
    sk = rng.randrange(2, b.R)
    pk = b.g1_mul(b.G1_GEN, sk)
    H = b.hash_to_g2(b"native backend check")
    sig = b.g2_mul(H, sk)
    # e(pk, H) == e(g1, sig)
    assert nb.pairings_equal(pk, H, b.G1_GEN, sig) is True
    f = b.fp12_mul(b.miller_loop(pk, H), b.miller_loop(b.g1_neg(b.G1_GEN), sig))
    assert b.final_exponentiation(f) == b.FP12_ONE


def test_g1_msm_matches_python():
    rng = random.Random(15)
    pts = [b.g1_mul(b.G1_GEN, rng.randrange(1, b.R)) for _ in range(4)] + [None]
    ks = [rng.randrange(0, b.R) for _ in range(5)]
    expected = None
    for p, k in zip(pts, ks):
        expected = b.g1_add(expected, _py_g1_mul(p, k) if p else None)
    assert nb.g1_msm(pts, ks)[0] == expected
