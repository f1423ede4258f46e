"""BabyBear + BB4 property tests against exact Python-int ground truth."""

import numpy as np
import pytest

from dvt_circuits_tpu.field import babybear as bb
from dvt_circuits_tpu.field import ext


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(2024)


class TestBabyBear:
    def test_mont_mul_matches_ints(self, rng):
        a = rng.integers(0, bb.P, size=2048, dtype=np.uint32)
        b = rng.integers(0, bb.P, size=2048, dtype=np.uint32)
        got = np.asarray(bb.from_mont(bb.mont_mul(bb.to_mont(a), bb.to_mont(b))))
        want = (a.astype(object) * b.astype(object)) % bb.P
        assert np.array_equal(got.astype(object), want)

    def test_add_sub_neg(self, rng):
        a = rng.integers(0, bb.P, size=2048, dtype=np.uint32)
        b = rng.integers(0, bb.P, size=2048, dtype=np.uint32)
        assert np.array_equal(
            np.asarray(bb.add(a, b)).astype(object), (a.astype(object) + b) % bb.P
        )
        assert np.array_equal(
            np.asarray(bb.sub(a, b)).astype(object), (a.astype(object) - b) % bb.P
        )
        assert np.array_equal(np.asarray(bb.neg(a)).astype(object), (-a.astype(object)) % bb.P)

    def test_edge_values(self):
        e = np.array([0, 1, bb.P - 1], dtype=np.uint32)
        em = bb.to_mont(e)
        got = np.asarray(bb.from_mont(bb.mont_mul(em, em))).astype(object)
        assert np.array_equal(got, (e.astype(object) ** 2) % bb.P)

    def test_inverse(self, rng):
        a = rng.integers(1, bb.P, size=256, dtype=np.uint32)
        inv = np.asarray(bb.from_mont(bb.mont_inv(bb.to_mont(a))))
        assert all(int(x) * int(ix) % bb.P == 1 for x, ix in zip(a, inv))

    def test_two_adic_generators(self):
        for bits in (1, 2, 10, 27):
            g = bb.two_adic_generator(bits)
            assert pow(g, 1 << bits, bb.P) == 1
            assert pow(g, 1 << (bits - 1), bb.P) != 1
        with pytest.raises(ValueError):
            bb.two_adic_generator(28)


def _polymulmod(a, b):
    """Multiply two deg<4 polys mod x⁴ − W over BabyBear."""
    res = [0] * 7
    for i, x in enumerate(a):
        if x:
            for j, y in enumerate(b):
                res[i + j] = (res[i + j] + x * y) % bb.P
    for k in range(6, 3, -1):
        res[k - 4] = (res[k - 4] + ext.W * res[k]) % bb.P
        res[k] = 0
    return tuple(res[:4])


def _x_pow(e):
    result = (1, 0, 0, 0)
    base = (0, 1, 0, 0)
    while e:
        if e & 1:
            result = _polymulmod(result, base)
        base = _polymulmod(base, base)
        e >>= 1
    return result


def test_bb4_irreducible():
    """x⁴ − 11 has no factor of degree ≤ 2 ⟺ gcd(x^{p^k} − x, f) trivial for
    k = 1, 2; a quartic with no linear/quadratic factor is irreducible."""

    def polydeg(a):
        for i in range(len(a) - 1, -1, -1):
            if a[i]:
                return i
        return -1

    def polymod(a, b):
        a = list(a)
        db = polydeg(b)
        assert db >= 0
        binv = pow(b[db], bb.P - 2, bb.P)
        for i in range(polydeg(a), db - 1, -1):
            c = a[i] * binv % bb.P
            if c:
                for j in range(db + 1):
                    a[i - db + j] = (a[i - db + j] - c * b[j]) % bb.P
        return tuple(a[: max(db, 1)])

    def polygcd(a, b):
        a, b = tuple(a), tuple(b)
        while polydeg(b) >= 0:
            a, b = b, polymod(a, b)
        return a

    f = ((-ext.W) % bb.P, 0, 0, 0, 1)
    for k in (1, 2):
        g = list(_x_pow(bb.P**k))
        g[1] = (g[1] - 1) % bb.P  # x^{p^k} − x, already reduced mod f
        d = polygcd(f, tuple(g))
        assert polydeg(d) == 0, f"x^4-11 has a degree-{k} factor"


class TestBB4:
    def _rand(self, rng, n):
        return [tuple(int(x) for x in rng.integers(0, bb.P, 4)) for _ in range(n)]

    def test_scalar_field_laws(self, rng):
        for a, b, c in zip(self._rand(rng, 64), self._rand(rng, 64), self._rand(rng, 64)):
            assert ext.s_mul(a, b) == ext.s_mul(b, a)
            assert ext.s_mul(ext.s_mul(a, b), c) == ext.s_mul(a, ext.s_mul(b, c))
            assert ext.s_mul(a, ext.s_add(b, c)) == ext.s_add(ext.s_mul(a, b), ext.s_mul(a, c))
            if not ext.s_is_zero(a):
                assert ext.s_mul(a, ext.s_inv(a)) == ext.S_ONE

    def test_vectorized_matches_scalar(self, rng):
        A = self._rand(rng, 256)
        B = self._rand(rng, 256)
        Am, Bm = ext.to_array_mont(A), ext.to_array_mont(B)
        assert ext.from_array_mont(ext.mul(Am, Bm)) == [ext.s_mul(a, b) for a, b in zip(A, B)]
        assert ext.from_array_mont(ext.add(Am, Bm)) == [ext.s_add(a, b) for a, b in zip(A, B)]
        assert ext.from_array_mont(ext.inv(Am)) == [ext.s_inv(a) for a in A]

    def test_mul_base(self, rng):
        A = self._rand(rng, 128)
        s = [int(x) for x in rng.integers(0, bb.P, 128)]
        Am = ext.to_array_mont(A)
        sm = bb.to_mont(np.array(s, dtype=np.uint32))
        got = ext.from_array_mont(ext.mul_base(Am, sm))
        assert got == [ext.s_mul_base(a, x) for a, x in zip(A, s)]
