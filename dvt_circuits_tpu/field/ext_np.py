"""Vectorized BB4 arithmetic on host numpy arrays (standard form, uint64).

The host verifier's hot path: DEEP-codeword recomputation and FRI fold
walks are data-parallel across queries, so the per-query scalar tuple math
of ``ext`` (s_mul/s_inv) vectorizes to a handful of numpy ops.  Shapes are
(..., 4) uint64 with values < p; every op reduces mod p before any sum can
overflow 64 bits (11·3·(p−1)² < 2⁶³ after per-product reduction).

Property-tested against the scalar mirror in ``field.ext``.
"""

from __future__ import annotations

import numpy as np

from . import babybear as bb
from .ext import W

P = np.uint64(bb.P)


def asarray(vals) -> np.ndarray:
    """List of BB4 tuples → (n, 4) uint64 array."""
    return np.asarray(vals, dtype=np.uint64).reshape(-1, 4)


def from_base(a) -> np.ndarray:
    """Base-field array (...,) → BB4 (..., 4)."""
    a = np.asarray(a, dtype=np.uint64) % P
    out = np.zeros((*a.shape, 4), dtype=np.uint64)
    out[..., 0] = a
    return out


def add(a, b):
    return (a + b) % P


def sub(a, b):
    return (a + P - b % P) % P


def mul(a, b):
    """(..., 4) × (..., 4) → (..., 4); broadcasts like numpy."""
    a0, a1, a2, a3 = (a[..., i] % P for i in range(4))
    b0, b1, b2, b3 = (b[..., i] % P for i in range(4))
    m = lambda x, y: (x * y) % P  # x, y < p < 2^31 → product < 2^62
    c0 = (m(a0, b0) + np.uint64(W) * ((m(a1, b3) + m(a2, b2) + m(a3, b1)) % P)) % P
    c1 = (m(a0, b1) + m(a1, b0) + np.uint64(W) * ((m(a2, b3) + m(a3, b2)) % P)) % P
    c2 = (m(a0, b2) + m(a1, b1) + m(a2, b0) + np.uint64(W) * m(a3, b3) % P) % P
    c3 = (m(a0, b3) + m(a1, b2) + m(a2, b1) + m(a3, b0)) % P
    return np.stack([c0, c1, c2, c3], axis=-1)


def mul_base(a, s):
    """BB4 (..., 4) times base-field (...,) broadcast."""
    s = np.asarray(s, dtype=np.uint64) % P
    return (a * s[..., None]) % P


def _pow_base(a, e: int):
    """Elementwise a**e mod p for base-field uint64 arrays (static e)."""
    result = np.ones_like(a)
    base = a % P
    while e > 0:
        if e & 1:
            result = (result * base) % P
        base = (base * base) % P
        e >>= 1
    return result


def inv(a):
    """Batched BB4 inverse via the even/odd conjugate (mirror of ext.s_inv).

    Zero inputs produce zeros (callers guard); norm inverse via Fermat."""
    p = int(bb.P)
    a0, a1, a2, a3 = (a[..., i] % P for i in range(4))
    m = lambda x, y: (x * y) % P
    w = np.uint64(W)
    t0 = (m(a0, a0) + P - m(w, m(np.uint64(2), m(a1, a3))) % P + m(w, m(a2, a2))) % P
    t1 = (m(np.uint64(2), m(a0, a2)) + np.uint64(2) * P - m(a1, a1) - m(w, m(a3, a3))) % P
    norm = (m(t0, t0) + P - m(w, m(t1, t1))) % P
    ninv = _pow_base(norm, p - 2)
    u0 = m(t0, ninv)
    u2 = (P - m(t1, ninv)) % P
    s0 = (m(a0, u0) + m(w, m(a2, u2))) % P
    s1 = (P - (m(a1, u0) + m(w, m(a3, u2))) % P) % P
    s2 = (m(a2, u0) + m(a0, u2)) % P
    s3 = (P - (m(a3, u0) + m(a1, u2)) % P) % P
    return np.stack([s0, s1, s2, s3], axis=-1)
