"""Poseidon2 permutation over BabyBear, width 16 (TPU-batched).

The algebraic hash of the proving stack: Merkle leaves/nodes and the
Fiat–Shamir challenger all run on this permutation, replacing the Poseidon2
SP1 uses inside its prover (SURVEY.md §2.2).

Structure follows the Poseidon2 design (external/internal rounds, M4-block
external matrix, diag-plus-all-ones internal matrix), S-box x⁷
(gcd(7, p−1) = 1 for BabyBear).  Round counts: 8 external + 13 internal.

Round constants and the internal diagonal are generated deterministically
("nothing up my sleeve") from SHA-256 in counter mode with rejection
sampling; they intentionally do NOT match SP1/plonky3's constants — this
framework defines its own transcript format (proofs are verified by its own
verifier, documented divergence from byte-level SP1 proof compatibility).
The internal matrix is checked invertible at import time.

Vectorized layout: state is a (..., 16) uint32 array in Montgomery form.
Batched over leading axes — on TPU every round is pure VPU work and XLA maps
the batch across lanes.
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb

WIDTH = 16
RATE = 8  # sponge rate (words absorbed/squeezed per permutation)
DIGEST_WIDTH = 8  # 8 × 31-bit words ≈ 248-bit digests
ROUNDS_F = 8  # external (full) rounds: 4 + 4
ROUNDS_P = 13  # internal (partial) rounds
SBOX_DEGREE = 7

_SEED = b"dvt-circuits-tpu/poseidon2/babybear/w16/v1"


def _field_stream(label: bytes, count: int) -> list[int]:
    """Deterministic uniform field elements via SHA-256 counter mode with
    rejection sampling (no modulo bias)."""
    out = []
    counter = 0
    bound = (1 << 32) - ((1 << 32) % bb.P)
    while len(out) < count:
        block = hashlib.sha256(_SEED + b"/" + label + counter.to_bytes(4, "big")).digest()
        counter += 1
        for i in range(0, 32, 4):
            v = int.from_bytes(block[i : i + 4], "big")
            if v < bound:
                out.append(v % bb.P)
                if len(out) == count:
                    break
    return out


EXTERNAL_CONSTANTS = [
    _field_stream(b"ext", ROUNDS_F * WIDTH)[r * WIDTH : (r + 1) * WIDTH]
    for r in range(ROUNDS_F)
]
INTERNAL_CONSTANTS = _field_stream(b"int", ROUNDS_P)
#: Internal-matrix diagonal μ: the small-integer family the Poseidon2 paper
#: recommends for efficiency (§5.2 "choose small values for the diagonal").
#: A multiply by μ_i is then a 1-5-step double/add chain (bb.mul_small)
#: instead of a full Montgomery multiply — the internal rounds drop from 208
#: mont_muls to ~0 per permutation.  Distinctness and invertibility of
#: J + diag(μ) are asserted below; constants remain self-defined (this
#: framework owns its transcript format — see module docstring).
INTERNAL_DIAG = list(range(1, WIDTH + 1))
assert len(set(INTERNAL_DIAG)) == WIDTH


def _check_internal_matrix_invertible():
    """det(J + diag(μ)) mod p ≠ 0 via Gaussian elimination over F_p."""
    # entry = 1 + μ_i on the diagonal, 1 elsewhere
    m = [
        [((1 + INTERNAL_DIAG[i]) if i == j else 1) % bb.P for j in range(WIDTH)]
        for i in range(WIDTH)
    ]
    det = 1
    for col in range(WIDTH):
        pivot = next((r for r in range(col, WIDTH) if m[r][col]), None)
        if pivot is None:
            raise AssertionError("Poseidon2 internal matrix is singular")
        if pivot != col:
            m[col], m[pivot] = m[pivot], m[col]
            det = -det % bb.P
        det = det * m[col][col] % bb.P
        inv = pow(m[col][col], bb.P - 2, bb.P)
        for r in range(col + 1, WIDTH):
            f = m[r][col] * inv % bb.P
            if f:
                for c in range(col, WIDTH):
                    m[r][c] = (m[r][c] - f * m[col][c]) % bb.P
    assert det != 0


_check_internal_matrix_invertible()


# ---------------------------------------------------------------------------
# Scalar reference (standard-form ints)
# ---------------------------------------------------------------------------


def _s_sbox(x: int) -> int:
    x2 = x * x % bb.P
    x3 = x2 * x % bb.P
    x4 = x2 * x2 % bb.P
    return x4 * x3 % bb.P


def _s_m4(x):
    """Multiply a 4-vector by the Poseidon2 M4 block (add/double chain)."""
    p = bb.P
    t0 = (x[0] + x[1]) % p
    t1 = (x[2] + x[3]) % p
    t2 = (2 * x[1] + t1) % p
    t3 = (2 * x[3] + t0) % p
    t4 = (4 * t1 + t3) % p
    t5 = (4 * t0 + t2) % p
    t6 = (t3 + t5) % p
    t7 = (t2 + t4) % p
    return [t6, t5, t7, t4]


def _s_external_linear(state):
    groups = [_s_m4(state[i : i + 4]) for i in range(0, WIDTH, 4)]
    sums = [sum(g[j] for g in groups) % bb.P for j in range(4)]
    return [
        (groups[i // 4][i % 4] + sums[i % 4]) % bb.P for i in range(WIDTH)
    ]


def _s_internal_linear(state):
    total = sum(state) % bb.P
    return [(INTERNAL_DIAG[i] * state[i] + total) % bb.P for i in range(WIDTH)]


def s_permute(state):
    """Scalar Poseidon2 permutation on a list of 16 standard-form ints.

    Dispatches to the native host library (native/dvt_native.cpp) when built
    — the challenger and Merkle-opening verification hot path — with the
    pure-Python body as the reference fallback."""
    from ..utils import native

    out = native.s_permute_native(state)
    if out is not None:
        return out
    return _s_permute_py(state)


def _s_permute_py(state):
    assert len(state) == WIDTH
    state = _s_external_linear([x % bb.P for x in state])
    for r in range(ROUNDS_F // 2):
        state = [(x + c) % bb.P for x, c in zip(state, EXTERNAL_CONSTANTS[r])]
        state = [_s_sbox(x) for x in state]
        state = _s_external_linear(state)
    for r in range(ROUNDS_P):
        state[0] = _s_sbox((state[0] + INTERNAL_CONSTANTS[r]) % bb.P)
        state = _s_internal_linear(state)
    for r in range(ROUNDS_F // 2, ROUNDS_F):
        state = [(x + c) % bb.P for x, c in zip(state, EXTERNAL_CONSTANTS[r])]
        state = [_s_sbox(x) for x in state]
        state = _s_external_linear(state)
    return state


# ---------------------------------------------------------------------------
# Vectorized (JAX, Montgomery form, trailing axis = 16)
# ---------------------------------------------------------------------------

_EXT_C_MONT = jnp.asarray(bb.np_to_mont(np.array(EXTERNAL_CONSTANTS, dtype=np.uint64)))
_INT_C_MONT = jnp.asarray(bb.np_to_mont(np.array(INTERNAL_CONSTANTS, dtype=np.uint64)))


def _v_sbox(x):
    x2 = bb.mont_sq(x)
    x3 = bb.mont_mul(x2, x)
    x4 = bb.mont_sq(x2)
    return bb.mont_mul(x4, x3)


def _v_m4(x0, x1, x2, x3):
    t0 = bb.add(x0, x1)
    t1 = bb.add(x2, x3)
    t2 = bb.add(bb.double(x1), t1)
    t3 = bb.add(bb.double(x3), t0)
    t4 = bb.add(bb.double(bb.double(t1)), t3)
    t5 = bb.add(bb.double(bb.double(t0)), t2)
    t6 = bb.add(t3, t5)
    t7 = bb.add(t2, t4)
    return t6, t5, t7, t4


def _v_external_linear(state):
    # state: (..., 16).  Reshape to (..., 4 groups, 4) and apply M4 per group.
    v = state.reshape(*state.shape[:-1], 4, 4)
    y0, y1, y2, y3 = _v_m4(v[..., 0], v[..., 1], v[..., 2], v[..., 3])
    y = jnp.stack([y0, y1, y2, y3], axis=-1)  # (..., 4, 4)
    # add the column sums of the four groups to every group
    s = y[..., 0, :]
    for g in range(1, 4):
        s = bb.add(s, y[..., g, :])
    y = bb.add(y, s[..., None, :])
    return y.reshape(*state.shape[:-1], WIDTH)


def _v_internal_linear(state):
    total = state[..., 0]
    for i in range(1, WIDTH):
        total = bb.add(total, state[..., i])
    diag = jnp.stack(
        [bb.mul_small(state[..., i], INTERNAL_DIAG[i]) for i in range(WIDTH)],
        axis=-1,
    )
    return bb.add(diag, total[..., None])


import jax


def _ext_round(r, state):
    state = bb.add(state, _EXT_C_MONT[r])
    state = _v_sbox(state)
    return _v_external_linear(state)


def _int_round(r, state):
    s0 = _v_sbox(bb.add(state[..., 0], _INT_C_MONT[r]))
    state = state.at[..., 0].set(s0)
    return _v_internal_linear(state)


@jax.jit
def poseidon2_permute(state):
    """Vectorized permutation on (..., 16) Montgomery-form uint32 arrays.

    Rounds run under ``lax.fori_loop`` (constants gathered per iteration) so
    the traced graph stays small — tracing/lowering time, not FLOPs, is the
    practical cost of a wide unrolled permutation graph.
    """
    state = _v_external_linear(state)
    state = jax.lax.fori_loop(0, ROUNDS_F // 2, _ext_round, state)
    state = jax.lax.fori_loop(0, ROUNDS_P, _int_round, state)
    state = jax.lax.fori_loop(ROUNDS_F // 2, ROUNDS_F, _ext_round, state)
    return state
