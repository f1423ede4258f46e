"""Vectorized BLS12-381 base-field arithmetic on TPU int32 lanes.

The TPU-native re-creation of the 381-bit arithmetic the reference gets from
the sp1-patched ``bls12_381`` crate (SURVEY.md §2.2): batched Montgomery
multiplication without any wide-integer hardware.

Representation: base 2¹², 32 limbs (= 384 bits) in uint32 arrays with the
limb axis LAST: shape (..., 32), little-endian limbs, values in Montgomery
form (R = 2³⁸⁴).  12-bit limbs keep every schoolbook partial product and
32-term column sum below 2³⁰ — no uint32 overflow anywhere, which is the
whole design: carry handling becomes a handful of vectorized passes instead
of per-limb sequential chains.

The scalar host mirror lives in ``hostcrypto.bls12_381`` (plain ints); all
ops here are property-tested against it.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..hostcrypto.bls12_381 import P as P_INT

LIMB_BITS = 12
NLIMBS = 32  # 384 bits
MASK = (1 << LIMB_BITS) - 1
R_INT = 1 << (LIMB_BITS * NLIMBS)  # Montgomery radix 2^384
R_MOD_P = R_INT % P_INT
R2_MOD_P = (R_INT * R_INT) % P_INT
PPRIME_INT = (-pow(P_INT, -1, R_INT)) % R_INT  # -p^{-1} mod R


def int_to_limbs(x: int) -> np.ndarray:
    out = np.empty(NLIMBS, dtype=np.uint32)
    for i in range(NLIMBS):
        out[i] = x & MASK
        x >>= LIMB_BITS
    return out


def limbs_to_int(limbs) -> int:
    x = 0
    for i in reversed(range(len(limbs))):
        x = (x << LIMB_BITS) | int(limbs[i])
    return x


P_LIMBS = jnp.asarray(int_to_limbs(P_INT))
PPRIME_LIMBS = jnp.asarray(int_to_limbs(PPRIME_INT))
R2_LIMBS = jnp.asarray(int_to_limbs(R2_MOD_P))
ONE_MONT_LIMBS = jnp.asarray(int_to_limbs(R_MOD_P))


def from_ints(values) -> jnp.ndarray:
    """Host ints (standard form) → (n, 32) Montgomery limb array."""
    arr = np.stack([int_to_limbs(v * R_INT % P_INT) for v in values])
    return jnp.asarray(arr)


def to_ints(arr) -> list:
    """(..., 32) Montgomery limb array → list of standard-form ints."""
    host = np.asarray(arr).reshape(-1, NLIMBS)
    rinv = pow(R_INT, -1, P_INT)
    return [limbs_to_int(row) * rinv % P_INT for row in host]


def _carry_passes(cols, passes: int):
    """Magnitude-reduction passes: each moves every limb's overflow into its
    neighbor, shrinking limbs by ~LIMB_BITS bits per pass (not exact — a
    ±1 carry can still ripple; finish with ``_normalize``)."""
    for _ in range(passes):
        carry = cols >> LIMB_BITS
        cols = (cols & MASK) + jnp.concatenate(
            [jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1
        )
    return cols


def _normalize(cols, passes: int = 3):
    """Exact normalization of unsigned column sums (< 2³²) to 12-bit limbs.

    Three magnitude passes bound every limb by 2^12 (carry ∈ {0, 1}); the
    residual single-bit ripple is resolved EXACTLY with a Kogge–Stone
    generate/propagate prefix (log₂(n) vector steps) instead of the old
    n-iteration fori_loop — the sequential carry loop dominated the
    latency of every Montgomery multiply (hundreds of tiny kernel steps
    per group-law op in the MSM).  The carry out of the last limb is
    dropped (callers size arrays so it is provably zero, or mod-R is
    intended)."""
    cols = _carry_passes(cols, passes)
    # limbs now ≤ 2^LIMB_BITS: generate = bit LIMB_BITS, propagate = low
    # part equal to MASK
    g = (cols >> LIMB_BITS).astype(jnp.uint32)  # {0, 1}
    p = ((cols & MASK) == MASK).astype(jnp.uint32)
    shift = 1
    n = cols.shape[-1]
    while shift < n:
        zpad_g = jnp.zeros_like(g[..., :shift])
        zpad_p = jnp.zeros_like(p[..., :shift])
        g_prev = jnp.concatenate([zpad_g, g[..., :-shift]], axis=-1)
        p_prev = jnp.concatenate([zpad_p, p[..., :-shift]], axis=-1)
        g = g | (p & g_prev)
        p = p & p_prev
        shift *= 2
    cin = jnp.concatenate(
        [jnp.zeros_like(g[..., :1]), g[..., :-1]], axis=-1
    )
    return ((cols & MASK) + cin) & MASK


from functools import lru_cache


@lru_cache(maxsize=None)
def _band_matrix(out_len: int) -> np.ndarray:
    """(NLIMBS², out_len) 0/1 matrix: flat outer-product index (i, j) → its
    product column k = i + j."""
    M = np.zeros((NLIMBS * NLIMBS, out_len), dtype=np.int32)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            if i + j < out_len:
                M[i * NLIMBS + j, i + j] = 1
    return M


def _mul_columns(a, b, out_len: int):
    """Schoolbook column accumulation: out[k] = Σ_{i+j=k} a_i·b_j (k < out_len).

    ONE outer product + ONE dot_general against a constant banded 0/1
    matrix: the antidiagonal sums become a matrix contraction the TPU runs
    on the MXU, and the traced graph is two ops per call — the previous
    32-partial-product tree made a single group-law `add` cost thousands
    of HLO ops and pushed XLA compile times of MSM graphs past 3 minutes.
    Magnitudes: limbs < 2^12, products < 2^24, column sums < 32·2^24 <
    2^31 — exact in int32."""
    outer = (a[..., :, None] * b[..., None, :]).astype(jnp.int32)
    flat = outer.reshape(*outer.shape[:-2], NLIMBS * NLIMBS)
    M = jnp.asarray(_band_matrix(out_len))
    out = jax.lax.dot_general(
        flat,
        M,
        (((flat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return out.astype(jnp.uint32)


def mont_mul(a, b):
    """Montgomery product of (..., 32) limb arrays; result < p, normalized."""
    # T = a·b (64 columns, sums < 32·2^24 < 2^30)
    t = _normalize(_mul_columns(a, b, 2 * NLIMBS))
    # m = (T mod R)·p' mod R (low 32 columns; final carry drop == mod R)
    m = _normalize(_mul_columns(t[..., :NLIMBS], PPRIME_LIMBS, NLIMBS))
    # U = T + m·p; low 384 bits ≡ 0 (mod R)
    mp = _mul_columns(m, P_LIMBS, 2 * NLIMBS)
    u = _normalize(t + mp)
    # divide by R: take the high 32 limbs (low ones are zero)
    hi = u[..., NLIMBS:]
    return cond_sub_p(hi)


def mont_sq(a):
    return mont_mul(a, a)


def add(a, b):
    s = _normalize(a + b, passes=1)
    return cond_sub_p(s)


def _geq(a, b):
    """Lexicographic a >= b over normalized limb arrays."""
    neq = a != b
    gt = a > b
    # index of the most significant differing limb
    rev = jnp.flip(neq, axis=-1)
    idx = NLIMBS - 1 - jnp.argmax(rev, axis=-1)
    any_neq = jnp.any(neq, axis=-1)
    top_gt = jnp.take_along_axis(gt, idx[..., None], axis=-1)[..., 0]
    return jnp.where(any_neq, top_gt, True)


def _sub_exact(a, b):
    """a − b for normalized limbs with a ≥ b (fori borrow ripple)."""
    d = a.astype(jnp.int32) - b.astype(jnp.int32)

    def step(_, c):
        borrow = (c < 0).astype(jnp.int32)
        c = c + borrow * (1 << LIMB_BITS)
        return c - jnp.concatenate(
            [jnp.zeros_like(borrow[..., :1]), borrow[..., :-1]], axis=-1
        )

    d = jax.lax.fori_loop(0, NLIMBS, step, d)
    return d.astype(jnp.uint32)


def cond_sub_p(a):
    """Subtract p where a ≥ p (input normalized, a < 2p)."""
    ge = _geq(a, P_LIMBS)
    diff = _sub_exact(a, jnp.broadcast_to(P_LIMBS, a.shape))
    return jnp.where(ge[..., None], diff, a)


def sub(a, b):
    """a − b mod p (normalized inputs)."""
    ge = _geq(a, b)
    a_adj = jnp.where(ge[..., None], a, _normalize(a + P_LIMBS, passes=1))
    return _sub_exact(a_adj, b)


def neg(a):
    is_zero = jnp.all(a == 0, axis=-1)
    r = _sub_exact(jnp.broadcast_to(P_LIMBS, a.shape), a)
    return jnp.where(is_zero[..., None], a, r)


def zeros(shape):
    return jnp.zeros((*shape, NLIMBS), jnp.uint32)


def ones_mont(shape):
    return jnp.broadcast_to(ONE_MONT_LIMBS, (*shape, NLIMBS))


def select(cond, a, b):
    """Elementwise select: cond shape (...,), operands (..., 32)."""
    return jnp.where(cond[..., None], a, b)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def mont_pow(a, e: int):
    """a^e for a static exponent — left-to-right square-and-multiply inside
    a fori_loop (the exponent's bits become a constant table), keeping the
    traced graph at one square + one multiply regardless of exponent size."""
    nbits = max(1, e.bit_length())
    bits = jnp.asarray(
        np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32)
    )
    one = jnp.broadcast_to(ONE_MONT_LIMBS, a.shape)

    def body(i, acc):
        acc = mont_sq(acc)
        withmul = mont_mul(acc, a)
        take = bits[i] == 1
        return jnp.where(take, withmul, acc)

    return jax.lax.fori_loop(0, nbits, body, one)


def inv(a):
    """Batched inverse via Fermat (a^{p−2}); 0 → 0."""
    return mont_pow(a, P_INT - 2)
