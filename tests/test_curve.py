"""TPU-vectorized BLS12-381 (curve/) vs the host implementation (which is
itself pinned by the reference's golden vectors).

The scalar-multiplication/MSM programs compile 256-round point-op bodies —
minutes of XLA CPU compile — so they only run with DVT_HEAVY_TESTS=1
(tests/test_curve.py keeps the field + point-op layers in the default
suite)."""

import os

import numpy as np
import pytest
import jax

from dvt_circuits_tpu.curve import fp, g1
from dvt_circuits_tpu.hostcrypto import bls12_381 as host
from dvt_circuits_tpu.parallel.mesh import make_mesh

HEAVY = os.environ.get("DVT_HEAVY_TESTS") == "1"


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(5)


class TestFp:
    def test_ops_match_ints(self, rng):
        vals_a = [int.from_bytes(rng.bytes(47), "big") % host.P for _ in range(32)]
        vals_a += [0, 1, host.P - 1, host.P - 2]
        vals_b = [int.from_bytes(rng.bytes(47), "big") % host.P for _ in range(32)]
        vals_b += [host.P - 1, 0, host.P - 1, 1]
        A, B = fp.from_ints(vals_a), fp.from_ints(vals_b)
        assert fp.to_ints(A) == vals_a
        assert fp.to_ints(fp.mont_mul(A, B)) == [a * b % host.P for a, b in zip(vals_a, vals_b)]
        assert fp.to_ints(fp.add(A, B)) == [(a + b) % host.P for a, b in zip(vals_a, vals_b)]
        assert fp.to_ints(fp.sub(A, B)) == [(a - b) % host.P for a, b in zip(vals_a, vals_b)]
        assert fp.to_ints(fp.neg(A)) == [(-a) % host.P for a in vals_a]

    def test_inverse(self, rng):
        vals = [int.from_bytes(rng.bytes(40), "big") % host.P for _ in range(4)]
        inv = fp.to_ints(fp.inv(fp.from_ints(vals)))
        for a, ia in zip(vals, inv):
            assert a * ia % host.P == 1


class TestG1:
    @pytest.fixture(scope="class")
    def points(self, ):
        rng = np.random.default_rng(6)
        ks = [int.from_bytes(rng.bytes(31), "big") % host.R for _ in range(4)]
        return [host.g1_mul(host.G1_GEN, k) for k in ks]

    def test_add_double_exceptions(self, points):
        P = g1.from_affine_points(points)
        Q = g1.from_affine_points(points[1:] + points[:1])
        assert g1.to_affine_points(g1.add_jit(P, Q)) == [
            host.g1_add(a, b) for a, b in zip(points, points[1:] + points[:1])
        ]
        dbl = [host.g1_add(a, a) for a in points]
        assert g1.to_affine_points(g1.double_jit(P)) == dbl
        assert g1.to_affine_points(g1.add_jit(P, P)) == dbl  # P == Q
        negs = g1.from_affine_points([host.g1_neg(a) for a in points])
        assert g1.to_affine_points(g1.add_jit(P, negs)) == [None] * 4  # P == −Q
        assert g1.to_affine_points(g1.add_jit(P, g1.identity((4,)))) == points

    @pytest.mark.skipif(not HEAVY, reason="256-round MSM compile; DVT_HEAVY_TESTS=1")
    def test_msm_matches_host(self, points):
        rng = np.random.default_rng(7)
        sc = [int.from_bytes(rng.bytes(16), "big") for _ in range(4)]
        got = g1.msm(points, sc)
        want = None
        for p, s in zip(points, sc):
            want = host.g1_add(want, host.g1_mul(p, s))
        assert got == want

    @pytest.mark.skipif(
        not HEAVY or len(jax.devices()) < 4,
        reason="sharded MSM compile; DVT_HEAVY_TESTS=1 + multi-device mesh",
    )
    def test_dist_msm(self, points):
        rng = np.random.default_rng(8)
        sc = [int.from_bytes(rng.bytes(16), "big") for _ in range(4)]
        mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
        got = g1.dist_msm(points, sc, mesh)
        want = None
        for p, s in zip(points, sc):
            want = host.g1_add(want, host.g1_mul(p, s))
        assert got == want


class TestBucketMsm:
    """GLV decomposition + Pippenger bucket MSM (curve/g1.py msm_bucket)."""

    def test_glv_decompose(self, rng):
        for _ in range(50):
            k = int.from_bytes(rng.bytes(32), "big") % host.R
            (s1, a1), (s2, a2) = g1.glv_decompose(k)
            assert (s1 * a1 + s2 * a2 * g1.GLV_LAMBDA) % host.R == k
            assert a1 < 1 << g1.GLV_BITS and a2 < 1 << g1.GLV_BITS

    def test_endomorphism_matches_eigenvalue(self):
        for k in (2, 3, 12345):
            x, y = host.g1_mul(host.G1_GEN, k)
            assert host.g1_mul((x, y), g1.GLV_LAMBDA) == (
                x * g1.GLV_BETA % host.P,
                y,
            )

    @pytest.mark.skipif(not HEAVY, reason="minutes of XLA CPU compile")
    def test_msm_bucket_matches_host(self, rng):
        n = 16
        pts = [host.g1_mul(host.G1_GEN, 7 * i + 3) for i in range(n)]
        scs = [int.from_bytes(rng.bytes(32), "big") % host.R for _ in range(n)]
        expect = None
        for p, s in zip(pts, scs):
            expect = host.g1_add(expect, host.g1_mul(p, s))
        assert g1.msm_bucket(pts, scs) == expect

    @pytest.mark.skipif(not HEAVY, reason="minutes of XLA CPU compile")
    def test_msm_bucket_identities_and_zeros(self, rng):
        pts = [None, host.g1_mul(host.G1_GEN, 9), host.g1_mul(host.G1_GEN, 11)]
        scs = [7, 0, 13]
        assert g1.msm_bucket(pts, scs) == host.g1_mul(pts[2], 13)


class TestG2:
    """Device G2 ops (curve/g2.py, Fp² towers) vs the host implementation."""

    def test_add_double_match_host(self):
        from dvt_circuits_tpu.curve import g2 as tg2

        pts = [host.g2_mul(host.G2_GEN, k) for k in (1, 2, 5, 9)]
        P1 = tg2.from_host_points(pts)
        P2 = tg2.from_host_points(list(reversed(pts)))
        assert tg2.to_host_points(tg2.add_jit(P1, P2)) == [
            host.g2_add(a, b) for a, b in zip(pts, reversed(pts))
        ]
        assert tg2.to_host_points(tg2.double_jit(P1)) == [
            host.g2_add(p, p) for p in pts
        ]

    def test_identity_and_cancellation(self):
        from dvt_circuits_tpu.curve import g2 as tg2

        pts = [host.g2_mul(host.G2_GEN, k) for k in (1, 2, 5, 9)]
        mix = [None, pts[0], pts[1], pts[2]]
        neg = [None, None, (pts[1][0], host.fp2_neg(pts[1][1])), pts[3]]
        got = tg2.to_host_points(
            tg2.add_jit(tg2.from_host_points(mix), tg2.from_host_points(neg))
        )
        assert got == [host.g2_add(a, b) for a, b in zip(mix, neg)]

    @pytest.mark.skipif(not HEAVY, reason="256-round compile")
    def test_scalar_mul_matches_host(self, rng):
        from dvt_circuits_tpu.curve import g1 as tg1
        from dvt_circuits_tpu.curve import g2 as tg2

        pts = [host.g2_mul(host.G2_GEN, k) for k in (3, 7)]
        scs = [int.from_bytes(rng.bytes(32), "big") % host.R for _ in range(2)]
        bits = tg1.scalars_to_bits(scs)
        got = tg2.to_host_points(
            jax.jit(tg2.scalar_mul)(tg2.from_host_points(pts), bits)
        )
        assert got == [host.g2_mul(p, s) for p, s in zip(pts, scs)]
