"""Quartic extension field BB4 = BabyBear[x]/(x⁴ − 11).

FRI/DEEP challenges must come from a field of ≥ ~124 bits for soundness;
BabyBear is 31 bits, so the challenger samples from BB4 (irreducibility of
x⁴ − 11 is checked by tests/test_field.py via polynomial gcds).

Vectorized form: trailing axis of length 4 over Montgomery-form uint32.
A scalar (tuple-of-ints, standard form) mirror backs the verifier and tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import babybear as bb

W = 11  # binomial non-residue: x^4 = 11
_W_MONT = np.uint32(bb.s_to_mont(W))

D = 4  # extension degree


# ---------------------------------------------------------------------------
# Vectorized (JAX, Montgomery form, trailing axis = 4)
# ---------------------------------------------------------------------------


def from_base(a):
    """Embed a BabyBear array (..., ) into BB4 (..., 4)."""
    a = jnp.asarray(a, jnp.uint32)
    z = jnp.zeros_like(a)
    return jnp.stack([a, z, z, z], axis=-1)


def zeros(shape):
    return jnp.zeros((*shape, D), jnp.uint32)


def ones(shape):
    o = jnp.full(shape, np.uint32(bb.MONT_ONE), jnp.uint32)
    return from_base(o)


def add(a, b):
    return bb.add(a, b)


def sub(a, b):
    return bb.sub(a, b)


def neg(a):
    return bb.neg(a)


def _mul_w(a):
    """Multiply a BabyBear lane array by the constant W (Montgomery form)."""
    return bb.mont_mul(a, _W_MONT)


def mul(a, b):
    """BB4 product; a, b shaped (..., 4)."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    m = bb.mont_mul
    c0 = bb.add(m(a0, b0), _mul_w(bb.add(bb.add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = bb.add(bb.add(m(a0, b1), m(a1, b0)), _mul_w(bb.add(m(a2, b3), m(a3, b2))))
    c2 = bb.add(bb.add(m(a0, b2), m(a1, b1)), bb.add(m(a2, b0), _mul_w(m(a3, b3))))
    c3 = bb.add(bb.add(m(a0, b3), m(a1, b2)), bb.add(m(a2, b1), m(a3, b0)))
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def mul_base(a, s):
    """BB4 (..., 4) times BabyBear (...,) broadcast over the trailing axis."""
    return bb.mont_mul(a, jnp.asarray(s, jnp.uint32)[..., None])


def square(a):
    return mul(a, a)


def inv(a):
    """Inverse via the even/odd conjugate: a* = (a0, −a1, a2, −a3);
    a·a* ∈ BB[x²], whose norm down to BB is invertible in the base field."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    m = bb.mont_mul
    # t = a · a* has only even coordinates: t0 + t1·x², with
    # t0 = a0² + W(a2² − 2·a1·a3),  t1 = 2·a0·a2 − a1² − W·a3²
    aa0 = m(a0, a0)
    aa2 = m(a2, a2)
    a13 = m(a1, a3)
    t0 = bb.add(bb.sub(aa0, _mul_w(bb.add(a13, a13))), _mul_w(aa2))
    t1 = bb.sub(bb.add(m(a0, a2), m(a2, a0)), bb.add(m(a1, a1), _mul_w(m(a3, a3))))
    # norm = t0² − W·t1²  ∈ BB
    norm = bb.sub(m(t0, t0), _mul_w(m(t1, t1)))
    ninv = bb.mont_inv(norm)
    # t⁻¹ = (t0 − t1·x²)/norm
    u0 = m(t0, ninv)
    u2 = bb.neg(m(t1, ninv))
    # a⁻¹ = a* · t⁻¹ where t⁻¹ = u0 + u2·x²
    s0 = bb.add(m(a0, u0), _mul_w(m(a2, u2)))
    s1 = bb.neg(bb.add(m(a1, u0), _mul_w(m(a3, u2))))
    s2 = bb.add(m(a2, u0), m(a0, u2))
    s3 = bb.neg(bb.add(m(a3, u0), m(a1, u2)))
    return jnp.stack([s0, s1, s2, s3], axis=-1)


# ---------------------------------------------------------------------------
# Scalar mirror (tuples of standard-form ints) — verifier / tests
# ---------------------------------------------------------------------------

S_ZERO = (0, 0, 0, 0)
S_ONE = (1, 0, 0, 0)


def s_from_base(a: int):
    return (a % bb.P, 0, 0, 0)


def s_add(a, b):
    return tuple((x + y) % bb.P for x, y in zip(a, b))


def s_sub(a, b):
    return tuple((x - y) % bb.P for x, y in zip(a, b))


def s_neg(a):
    return tuple((-x) % bb.P for x in a)


def s_mul(a, b):
    p = bb.P
    a0, a1, a2, a3 = a
    b0, b1, b2, b3 = b
    c0 = (a0 * b0 + W * (a1 * b3 + a2 * b2 + a3 * b1)) % p
    c1 = (a0 * b1 + a1 * b0 + W * (a2 * b3 + a3 * b2)) % p
    c2 = (a0 * b2 + a1 * b1 + a2 * b0 + W * (a3 * b3)) % p
    c3 = (a0 * b3 + a1 * b2 + a2 * b1 + a3 * b0) % p
    return (c0, c1, c2, c3)


def s_mul_base(a, s: int):
    return tuple(x * s % bb.P for x in a)


def s_pow(a, e: int):
    result = S_ONE
    base = a
    while e > 0:
        if e & 1:
            result = s_mul(result, base)
        base = s_mul(base, base)
        e >>= 1
    return result


def s_inv(a):
    p = bb.P
    a0, a1, a2, a3 = a
    t0 = (a0 * a0 - W * 2 * a1 * a3 + W * a2 * a2) % p
    t1 = (2 * a0 * a2 - a1 * a1 - W * a3 * a3) % p
    norm = (t0 * t0 - W * t1 * t1) % p
    if norm == 0:
        raise ZeroDivisionError("inverse of zero in BB4")
    ninv = pow(norm, p - 2, p)
    u0 = t0 * ninv % p
    u2 = -t1 * ninv % p
    s0 = (a0 * u0 + W * a2 * u2) % p
    s1 = (-(a1 * u0 + W * a3 * u2)) % p
    s2 = (a2 * u0 + a0 * u2) % p
    s3 = (-(a3 * u0 + a1 * u2)) % p
    return (s0, s1, s2, s3)


def s_is_zero(a) -> bool:
    return all(x % bb.P == 0 for x in a)


def to_array_mont(scalars) -> jnp.ndarray:
    """List of scalar BB4 tuples (standard form) → (n, 4) Montgomery array."""
    arr = np.array(scalars, dtype=np.uint64).reshape(-1, 4)
    return jnp.asarray(bb.np_to_mont(arr), jnp.uint32)


def from_array_mont(arr) -> list:
    """(..., 4) Montgomery array → list of scalar tuples (standard form)."""
    std = np.asarray(bb.from_mont(arr))
    flat = std.reshape(-1, 4)
    return [tuple(int(v) for v in row) for row in flat]
