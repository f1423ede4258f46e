"""Vectorized BLS12-381 G2 group ops on TPU (Fp² towers over ``curve.fp``).

Closes the "no device G2" gap of the curve layer (SURVEY.md §2.2: the
sp1-patched crate accelerates G2 inside the guest; the host path lives in
``hostcrypto.bls12_381``).  Points are batched Jacobian triples of Fp²
elements — each Fp² element is a pair of ``fp`` limb arrays (c0 + c1·u,
u² = −1) — with the same branchless flag-select control flow as
``curve.g1``.  Property-tested against the host implementation.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..hostcrypto import bls12_381 as host
from . import fp

SCALAR_BITS = 256


# -- Fp² arithmetic (c0, c1) pairs of (…, 32) limb arrays --------------------


def f2_add(a, b):
    return (fp.add(a[0], b[0]), fp.add(a[1], b[1]))


def f2_sub(a, b):
    return (fp.sub(a[0], b[0]), fp.sub(a[1], b[1]))


def f2_neg(a):
    return (fp.neg(a[0]), fp.neg(a[1]))


def f2_mul(a, b):
    """Karatsuba: 3 base muls."""
    t0 = fp.mont_mul(a[0], b[0])
    t1 = fp.mont_mul(a[1], b[1])
    t2 = fp.mont_mul(fp.add(a[0], a[1]), fp.add(b[0], b[1]))
    return (fp.sub(t0, t1), fp.sub(fp.sub(t2, t0), t1))


def f2_sq(a):
    """(c0+c1u)² = (c0+c1)(c0−c1) + 2c0c1·u — 2 base muls."""
    t0 = fp.mont_mul(fp.add(a[0], a[1]), fp.sub(a[0], a[1]))
    t1 = fp.mont_mul(a[0], a[1])
    return (t0, fp.add(t1, t1))


def f2_is_zero(a):
    return fp.is_zero(a[0]) & fp.is_zero(a[1])


def f2_select(c, a, b):
    return (fp.select(c, a[0], b[0]), fp.select(c, a[1], b[1]))


def f2_zeros(shape=()):
    return (fp.zeros(shape), fp.zeros(shape))


def f2_ones(shape=()):
    return (fp.ones_mont(shape), fp.zeros(shape))


# -- Jacobian G2 -------------------------------------------------------------


def from_host_points(points) -> tuple:
    """Host affine G2 points (((x0,x1),(y0,y1)) or None) → Jacobian arrays."""
    x0, x1, y0, y1, z0 = [], [], [], [], []
    for pt in points:
        if pt is None:
            x0.append(0); x1.append(0); y0.append(1); y1.append(0); z0.append(0)
        else:
            (a0, a1), (b0, b1) = pt
            x0.append(a0); x1.append(a1); y0.append(b0); y1.append(b1); z0.append(1)
    X = (fp.from_ints(x0), fp.from_ints(x1))
    Y = (fp.from_ints(y0), fp.from_ints(y1))
    Z = (fp.from_ints(z0), fp.zeros((len(points),)))
    return (X, Y, Z)


def to_host_points(p) -> list:
    """Jacobian arrays → host affine G2 points (None for identity)."""
    (X0, X1), (Y0, Y1), (Z0, Z1) = p
    xs0, xs1 = fp.to_ints(X0), fp.to_ints(X1)
    ys0, ys1 = fp.to_ints(Y0), fp.to_ints(Y1)
    zs0, zs1 = fp.to_ints(Z0), fp.to_ints(Z1)
    out = []
    for a0, a1, b0, b1, c0, c1 in zip(xs0, xs1, ys0, ys1, zs0, zs1):
        if c0 == 0 and c1 == 0:
            out.append(None)
            continue
        z = (c0, c1)
        zinv = host.fp2_inv(z)
        zi2 = host.fp2_sq(zinv)
        zi3 = host.fp2_mul(zi2, zinv)
        out.append((host.fp2_mul((a0, a1), zi2), host.fp2_mul((b0, b1), zi3)))
    return out


def identity(shape=()) -> tuple:
    return (f2_zeros(shape), f2_ones(shape), f2_zeros(shape))


def double(p):
    """Jacobian doubling (a = 0); identity-safe (Z=0 → Z3=0)."""
    X, Y, Z = p
    A = f2_sq(X)
    B = f2_sq(Y)
    C = f2_sq(B)
    t = f2_sq(f2_add(X, B))
    D = f2_add(f2_sub(f2_sub(t, A), C), f2_sub(t, f2_add(A, C)))
    E = f2_add(f2_add(A, A), A)
    F = f2_sq(E)
    X3 = f2_sub(F, f2_add(D, D))
    C8 = f2_add(C, C)
    C8 = f2_add(C8, C8)
    C8 = f2_add(C8, C8)
    Y3 = f2_sub(f2_mul(E, f2_sub(D, X3)), C8)
    YZ = f2_mul(Y, Z)
    Z3 = f2_add(YZ, YZ)
    return (X3, Y3, Z3)


def add(p, q):
    """Branchless unified Jacobian addition (mirrors ``g1.add``)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = f2_sq(Z1)
    Z2Z2 = f2_sq(Z2)
    U1 = f2_mul(X1, Z2Z2)
    U2 = f2_mul(X2, Z1Z1)
    S1 = f2_mul(f2_mul(Y1, Z2), Z2Z2)
    S2 = f2_mul(f2_mul(Y2, Z1), Z1Z1)
    H = f2_sub(U2, U1)
    rr = f2_sub(S2, S1)
    rr = f2_add(rr, rr)
    I = f2_sq(f2_add(H, H))
    J = f2_mul(H, I)
    V = f2_mul(U1, I)
    X3 = f2_sub(f2_sub(f2_sq(rr), J), f2_add(V, V))
    SJ = f2_mul(S1, J)
    Y3 = f2_sub(f2_mul(rr, f2_sub(V, X3)), f2_add(SJ, SJ))
    ZZ = f2_sub(f2_sub(f2_sq(f2_add(Z1, Z2)), Z1Z1), Z2Z2)
    Z3 = f2_mul(ZZ, H)

    p_inf = f2_is_zero(Z1)
    q_inf = f2_is_zero(Z2)
    same_x = f2_is_zero(H)
    same_y = f2_is_zero(rr)
    dbl = double(p)

    def sel(c, a, b):
        return tuple(f2_select(c, ca, cb) for ca, cb in zip(a, b))

    inf = identity(Z1[0].shape[:-1])
    res = sel(same_x & same_y, dbl, (X3, Y3, Z3))
    res = sel(same_x & ~same_y & ~p_inf & ~q_inf, inf, res)
    res = sel(q_inf, p, res)
    res = sel(p_inf, q, res)
    return res


def scalar_mul(p, bits):
    """Batched double-and-add over a (n, 256) little-endian bit array."""
    batch = bits.shape[:-1]
    acc = identity(batch)

    def body(i, acc):
        b = SCALAR_BITS - 1 - i
        acc = double(acc)
        bit = jax.lax.dynamic_slice_in_dim(bits, b, 1, axis=-1)[..., 0]
        added = add(acc, p)
        return tuple(
            f2_select(bit.astype(bool), a, c) for a, c in zip(added, acc)
        )

    return jax.lax.fori_loop(0, SCALAR_BITS, body, acc)


add_jit = jax.jit(add)
double_jit = jax.jit(double)
