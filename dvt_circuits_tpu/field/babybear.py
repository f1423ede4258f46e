"""BabyBear prime field (p = 15·2²⁷ + 1 = 2013265921) on uint32 TPU lanes.

This is the base field of the proving stack — the TPU-native replacement for
the field arithmetic SP1 performs on CPU inside ``client.prove``
(SURVEY.md §2.2).  Design:

  * elements live in **Montgomery form** (R = 2³²) as ``uint32`` arrays so a
    modular multiply is 7 hardware int32 multiplies + cheap VPU ops, with no
    64-bit integers anywhere (TPUs have no native wide multiply);
  * the same expressions trace under plain ``jax.numpy``, inside Pallas
    kernels, and under ``shard_map`` — all prover kernels share this module;
  * a scalar Python-int mirror of every op backs property tests.

The field has 2-adicity 27 (p − 1 = 15·2²⁷), generator 31; NTT twiddles come
from ``two_adic_generator``.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..utils import jaxcfg  # noqa: F401  (enables the persistent compile cache)

P = 2013265921  # 15 * 2**27 + 1
TWO_ADICITY = 27
GENERATOR = 31  # smallest multiplicative generator of F_p^*

_R = 1 << 32
R_MOD_P = _R % P
R2_MOD_P = (_R * _R) % P
# n' = -p⁻¹ mod 2³²  (Montgomery constant)
NPRIME = (-pow(P, -1, _R)) % _R

_U32 = jnp.uint32
_P_ARR = np.uint32(P)
_NP_NPRIME = np.uint32(NPRIME)

# p = P_HI·2¹⁶ + 1 — exploited in the m·p high-half multiply
_P_HI = P >> 16
assert (P & 0xFFFF) == 1


def _u32(x):
    return jnp.asarray(x, dtype=_U32)


def mulhi(a, b):
    """High 32 bits of the 64-bit product of two uint32 arrays.

    4 hardware multiplies; the two middle partials are summed in one uint32
    add whose wrap-around carry is recovered from the unsigned compare
    (mid < lh ⇔ overflow), saving two mask/shift ops per call vs the naive
    four-way split."""
    a = _u32(a)
    b = _u32(b)
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl  # may wrap: carry = (mid < lh) goes to bit 16 of hi
    carry16 = (mid < lh).astype(_U32) << 16
    t = (ll >> 16) + (mid & 0xFFFF)
    return hh + carry16 + (mid >> 16) + (t >> 16)


def _mulhi_p(m):
    """High 32 bits of m·p, using p = P_HI·2¹⁶ + 1 (2 multiplies).

    ll = m0·1 = m0 < 2¹⁶ so ll >> 16 == 0; mid = lh + hl = m0·P_HI + m1
    < 2³¹ + 2¹⁶ never wraps uint32 — both simplifications are exact."""
    m = _u32(m)
    m0 = m & 0xFFFF
    m1 = m >> 16
    mid = m0 * _P_HI + m1  # a0·b1 + a1·b0 (b0 == 1); < 2³¹ + 2¹⁶, no wrap
    hh = m1 * _P_HI
    return hh + (mid >> 16)


def mont_reduce(hi, lo):
    """Montgomery reduction of a 64-bit value hi·2³² + lo; result < p.

    (An unsigned-min wrap-around reduction would save one op but Mosaic has
    no vector ``arith.minui`` lowering, so cmp+select it is.)"""
    m = lo * _NP_NPRIME  # wrapping low-half multiply
    mp_hi = _mulhi_p(m)
    carry = (lo != 0).astype(_U32)
    res = hi + mp_hi + carry  # < 2p, no uint32 overflow
    return jnp.where(res >= _P_ARR, res - _P_ARR, res)


def mont_mul(a, b):
    """Product of two Montgomery-form elements, in Montgomery form."""
    a = _u32(a)
    b = _u32(b)
    return mont_reduce(mulhi(a, b), a * b)


def mont_sq(a):
    return mont_mul(a, a)


def shoup_mul(x, w, w_shoup):
    """x·w mod p for a PLAIN-form constant vector w with precomputed Shoup
    factor w' = ⌊w·2³²/p⌋ (Harvey butterfly).  6 hardware multiplies vs
    mont_mul's 8: q = mulhi(x, w'), r = (w·x − q·p) mod 2³² ∈ [0, 2p), then
    one conditional subtract.  Exact for any uint32 x and w < p; multiplying
    a Montgomery-form x by a plain constant keeps Montgomery form."""
    x = _u32(x)
    w = _u32(w)
    q = mulhi(x, w_shoup)
    # q·p mod 2³² via p = P_HI·2¹⁶ + 1
    qp_lo = q + ((q * _P_HI) << 16)
    r = x * w - qp_lo
    return jnp.where(r >= _P_ARR, r - _P_ARR, r)


def np_shoup(w: np.ndarray) -> np.ndarray:
    """Host-side Shoup precompute: ⌊w·2³²/p⌋ for a standard-form array."""
    return ((np.asarray(w, dtype=np.uint64) << np.uint64(32)) // np.uint64(P)).astype(
        np.uint32
    )


def add(a, b):
    s = _u32(a) + _u32(b)
    return jnp.where(s >= _P_ARR, s - _P_ARR, s)


def sub(a, b):
    a = _u32(a)
    b = _u32(b)
    d = a - b
    return jnp.where(a >= b, d, d + _P_ARR)


def neg(a):
    a = _u32(a)
    return jnp.where(a == 0, a, _P_ARR - a)


def double(a):
    return add(a, a)


#: shortest double/add/sub chains for mul_small (value -> op sequence over a
#: running accumulator seeded with x; 'd'=double acc, 'a'=acc+=x, 's'=acc-=x)
_SMALL_CHAINS = {
    1: "",
    2: "d",
    3: "da",
    4: "dd",
    5: "dda",
    6: "dad",
    7: "ddds",
    8: "ddd",
    9: "ddda",
    10: "ddad",
    11: "ddada",  # 2, 4, 5, 10, 11
    12: "dadd",
    13: "dadda",
    14: "dddsd",
    15: "dddds",
    16: "dddd",
}


def mul_small(x, m: int):
    """x·m mod p for a small static positive integer m via a double/add/sub
    chain — replaces a full Montgomery multiply (~26 VPU ops) with 1-5
    modular adds (~3 ops each) for the Poseidon2 internal-diagonal family.
    Works identically on Montgomery- or standard-form inputs (linearity)."""
    chain = _SMALL_CHAINS.get(m)
    if chain is None:  # fallback: generic binary chain
        acc = x
        for bit in bin(m)[3:]:
            acc = double(acc)
            if bit == "1":
                acc = add(acc, x)
        return acc
    acc = x
    for op in chain:
        if op == "d":
            acc = double(acc)
        elif op == "a":
            acc = add(acc, x)
        else:
            acc = sub(acc, x)
    return acc


def to_mont(a):
    """Standard → Montgomery form (multiply by R² then reduce)."""
    return mont_mul(_u32(a), _u32(R2_MOD_P))


def from_mont(a):
    """Montgomery → standard form (Montgomery-reduce against 1)."""
    return mont_reduce(jnp.zeros_like(_u32(a)), _u32(a))


MONT_ONE = R_MOD_P  # 1 in Montgomery form


def mont_pow(a, e: int):
    """a**e for a traced Montgomery-form array and a *static* exponent."""
    result = jnp.full_like(_u32(a), np.uint32(MONT_ONE))
    base = _u32(a)
    while e > 0:
        if e & 1:
            result = mont_mul(result, base)
        base = mont_sq(base)
        e >>= 1
    return result


def mont_inv(a):
    """Inverse via Fermat (a^(p-2)); 0 maps to 0."""
    return mont_pow(a, P - 2)


def mul(a, b):
    """Standard-form modular multiply (converts through Montgomery)."""
    return from_mont(mont_mul(to_mont(a), to_mont(b)))


# ---------------------------------------------------------------------------
# Scalar (Python int) mirror — ground truth for property tests and host-side
# precomputation (twiddle tables, Poseidon2 constants).
# ---------------------------------------------------------------------------


def s_add(a: int, b: int) -> int:
    return (a + b) % P


def s_sub(a: int, b: int) -> int:
    return (a - b) % P


def s_mul(a: int, b: int) -> int:
    return a * b % P


def s_inv(a: int) -> int:
    return pow(a, P - 2, P)


def s_to_mont(a: int) -> int:
    return a * _R % P


def s_from_mont(a: int) -> int:
    return a * pow(_R, -1, P) % P


@lru_cache(maxsize=None)
def two_adic_generator(bits: int) -> int:
    """Standard-form generator of the order-2^bits subgroup."""
    if not 0 <= bits <= TWO_ADICITY:
        raise ValueError(f"no 2^{bits} roots of unity in BabyBear")
    g = pow(GENERATOR, (P - 1) >> bits, P)
    assert pow(g, 1 << bits, P) == 1
    if bits > 0:
        assert pow(g, 1 << (bits - 1), P) != 1
    return g


def np_to_mont(arr: np.ndarray) -> np.ndarray:
    """Host-side NumPy standard → Montgomery (for constant tables)."""
    return ((arr.astype(np.uint64) * (_R % P)) % P).astype(np.uint32)
