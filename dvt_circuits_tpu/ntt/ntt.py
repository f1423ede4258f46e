"""Radix-2 NTT and coset LDE over BabyBear (the prover's hottest loop).

TPU-native replacement for SP1's CPU NTT/LDE stage (SURVEY.md §2.2): batched
iterative Cooley–Tukey over the last axis of Montgomery-form uint32 arrays.
The butterflies are pure VPU element-wise work; XLA fuses each stage into a
single pass.  Twiddle-factor stages are precomputed host-side per size and
closed over as constants, so under ``jit`` they live in HBM once.

Layout: arrays are (..., N) with N a power of two; evaluations are in natural
(index = exponent) order.  The distributed (multi-chip) variant that
all-to-alls the butterfly exchanges over ICI lives in
``dvt_circuits_tpu.parallel.dist_ntt``.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb


@lru_cache(maxsize=None)
def _bit_reverse_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _twiddle_stages(log_n: int, inverse: bool):
    """Per-stage twiddle tables for DIT butterflies, as (plain, shoup)
    pairs for Harvey/Shoup constant multiplication (bb.shoup_mul): plain
    standard-form w and w' = ⌊w·2³²/p⌋.

    Stage s (1-based, block size m = 2^s) uses w_m^j for j < m/2 where
    w_m is the m-th root of unity (inverse root for the inverse NTT).
    """
    stages = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w = bb.two_adic_generator(s)
        if inverse:
            w = bb.s_inv(w)
        tw = np.empty(m // 2, dtype=np.uint64)
        acc = 1
        for j in range(m // 2):
            tw[j] = acc
            acc = acc * w % bb.P
        # stored as host numpy so the cache never captures jit tracers
        stages.append((tw.astype(np.uint32), bb.np_shoup(tw)))
    return tuple(stages)


def _ntt_core(x, log_n: int, inverse: bool):
    n = 1 << log_n
    rev = _bit_reverse_indices(log_n)
    x = jnp.take(x, rev, axis=-1)
    stages = _twiddle_stages(log_n, inverse)
    batch_shape = x.shape[:-1]
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        tw, tw_s = stages[s - 1]  # (half,) each
        v = x.reshape(*batch_shape, n // m, 2, half)
        even = v[..., 0, :]
        odd = bb.shoup_mul(v[..., 1, :], tw, tw_s)
        x = jnp.concatenate([bb.add(even, odd), bb.sub(even, odd)], axis=-1).reshape(
            *batch_shape, n
        )
    return x


# ---------------------------------------------------------------------------
# Four-step NTT: the TPU fast path for large sizes.
#
# Butterflies along the minor (lane) axis relayout every stage — measured at
# ~1% of roofline for 2^20 on v5e.  The four-step factorization N = N1·N2
# keeps every butterfly on the sublane axis with a full lane vector riding
# along: column NTT (N1) → twiddle w_N^{k1·n2} → transpose → column NTT (N2);
# the (N2, N1) result flattens directly to natural order.
# ---------------------------------------------------------------------------


def _ntt_sublane(x, log_n: int, inverse: bool):
    """NTT along axis -2; the minor axis is untouched batch (lanes)."""
    n = 1 << log_n
    rev = _bit_reverse_indices(log_n)
    x = jnp.take(x, rev, axis=-2)
    stages = _twiddle_stages(log_n, inverse)
    lead = x.shape[:-2]
    lanes = x.shape[-1]
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        tw, tw_s = stages[s - 1]  # (half,) each
        v = x.reshape(*lead, n // m, 2, half, lanes)
        even = v[..., 0, :, :]
        odd = bb.shoup_mul(v[..., 1, :, :], tw[:, None], tw_s[:, None])
        x = jnp.concatenate([bb.add(even, odd), bb.sub(even, odd)], axis=-2).reshape(
            *lead, n, lanes
        )
    return x


# -- radix-4 sublane stages -------------------------------------------------
#
# A radix-4 DIT stage does two radix-2 levels in ONE memory pass: the NTT is
# roughly balanced between VPU work and HBM traffic, so halving the stage
# count nearly halves wall time (measured ~1.4× on v5e for 2^20).


@lru_cache(maxsize=None)
def _twiddle_stages_r4(log_n: int, inverse: bool):
    """Twiddles for fused-radix-4 DIT stages: for block size m = 2^e, the
    three tables w_m^j, w_m^{2j}, w_m^{3j} for j < m/4 (Montgomery form)."""
    start = 1 + (log_n % 2)
    stages = []
    for e in range(start + 1, log_n + 1, 2):
        m = 1 << e
        q = m // 4
        w = bb.two_adic_generator(e)
        if inverse:
            w = bb.s_inv(w)
        tw1 = np.empty(q, dtype=np.uint64)
        acc = 1
        for j in range(q):
            tw1[j] = acc
            acc = acc * w % bb.P
        tw2 = tw1 * tw1 % bb.P
        tw3 = tw2 * tw1 % bb.P
        stages.append(
            tuple((t.astype(np.uint32), bb.np_shoup(t)) for t in (tw1, tw2, tw3))
        )
    return tuple(stages)


def _ntt_sublane_r4(x, log_n: int, inverse: bool):
    """NTT along axis -2 with two radix-2 levels fused per memory pass.

    Same bit-reversed input permutation as ``_ntt_sublane`` (a fused stage
    is literally two consecutive radix-2 DIT levels), one radix-2 stage
    first when log_n is odd.  Derivation: with sub-blocks v0..v3 (the two
    E/O halves of the two half-size sub-NTTs), t1 = w_m^{2j}·v1,
    t2 = w_m^j·v2, t3 = w_m^{3j}·v3 and i = w_4:

        out[j]    = (v0 + t1) + (t2 + t3)
        out[j+q]  = (v0 − t1) + i(t2 − t3)
        out[j+2q] = (v0 + t1) − (t2 + t3)
        out[j+3q] = (v0 − t1) − i(t2 − t3)

    Bit-identical to ``_ntt_sublane`` (property-tested)."""
    n = 1 << log_n
    rev = _bit_reverse_indices(log_n)
    x = jnp.take(x, rev, axis=-2)
    lead = x.shape[:-2]
    lanes = x.shape[-1]
    w4 = bb.two_adic_generator(2)
    if inverse:
        w4 = bb.s_inv(w4)
    w4_p = jnp.uint32(w4)
    w4_s = jnp.uint32(int(bb.np_shoup(np.array([w4], dtype=np.uint64))[0]))
    e = 0
    if log_n % 2 == 1:
        v = x.reshape(*lead, n // 2, 2, 1, lanes)
        even = v[..., 0, :, :]
        odd = v[..., 1, :, :]
        x = jnp.concatenate(
            [bb.add(even, odd), bb.sub(even, odd)], axis=-2
        ).reshape(*lead, n, lanes)
        e = 1
    r4_stages = _twiddle_stages_r4(log_n, inverse)
    for st_i, e2 in enumerate(range(e + 2, log_n + 1, 2)):
        m = 1 << e2
        q = m // 4
        tw1, tw2, tw3 = r4_stages[st_i]
        v = x.reshape(*lead, n // m, 4, q, lanes)
        t0 = v[..., 0, :, :]
        t1 = bb.shoup_mul(v[..., 1, :, :], tw2[0][:, None], tw2[1][:, None])
        t2 = bb.shoup_mul(v[..., 2, :, :], tw1[0][:, None], tw1[1][:, None])
        t3 = bb.shoup_mul(v[..., 3, :, :], tw3[0][:, None], tw3[1][:, None])
        s0 = bb.add(t0, t1)
        s1 = bb.sub(t0, t1)
        s2 = bb.add(t2, t3)
        s3 = bb.shoup_mul(bb.sub(t2, t3), w4_p, w4_s)
        x = jnp.concatenate(
            [
                bb.add(s0, s2),
                bb.add(s1, s3),
                bb.sub(s0, s2),
                bb.sub(s1, s3),
            ],
            axis=-2,
        ).reshape(*lead, n, lanes)
    return x


@lru_cache(maxsize=None)
def _fourstep_twiddles(log_n1: int, log_n2: int, inverse: bool) -> np.ndarray:
    """(N1, N2) table of w_N^{k1·n2} (Montgomery form, host numpy)."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    w = bb.two_adic_generator(log_n1 + log_n2)
    if inverse:
        w = bb.s_inv(w)
    # row k1 is a geometric sequence with ratio w^{k1}
    ratios = np.empty(n1, dtype=np.uint64)
    acc = 1
    for i in range(n1):
        ratios[i] = acc
        acc = acc * w % bb.P
    table = np.empty((n1, n2), dtype=np.uint64)
    col = np.ones(n1, dtype=np.uint64)
    for j in range(n2):
        table[:, j] = col
        col = col * ratios % bb.P
    return table.astype(np.uint32), bb.np_shoup(table)


_FOURSTEP_MIN_LOG_N = 10


def _ntt_fourstep(x, log_n: int, inverse: bool):
    """x: (..., N) → (..., N), natural order in and out."""
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    lead = x.shape[:-1]
    a = x.reshape(*lead, n1, n2)
    b = _ntt_sublane_r4(a, log_n1, inverse)  # B[k1, n2], lanes = n2
    fw, fs = _fourstep_twiddles(log_n1, log_n2, inverse)
    b = bb.shoup_mul(b, jnp.asarray(fw), jnp.asarray(fs))
    c = jnp.swapaxes(b, -1, -2)  # (n2, n1)
    d = _ntt_sublane_r4(c, log_n2, inverse)  # D[k2, k1] = X[k1 + n1·k2]
    return d.reshape(*lead, 1 << log_n)


def _ntt_dispatch(x, log_n: int, inverse: bool):
    if log_n >= _FOURSTEP_MIN_LOG_N:
        return _ntt_fourstep(x, log_n, inverse)
    return _ntt_core(x, log_n, inverse)


def ntt(x, axis: int = -1):
    """Forward NTT (evaluations at ω^0..ω^{N-1}) of Montgomery-form coeffs."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError(f"NTT size must be a power of two, got {n}")
    out = _ntt_dispatch(x, log_n, inverse=False)
    return jnp.moveaxis(out, -1, axis)


def intt(x, axis: int = -1):
    """Inverse NTT: evaluations → coefficients (Montgomery form)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError(f"NTT size must be a power of two, got {n}")
    out = _ntt_dispatch(x, log_n, inverse=True)
    n_inv = bb.s_inv(n % bb.P)
    n_inv_s = int(bb.np_shoup(np.array([n_inv], dtype=np.uint64))[0])
    out = bb.shoup_mul(out, jnp.uint32(n_inv), jnp.uint32(n_inv_s))
    return jnp.moveaxis(out, -1, axis)


@lru_cache(maxsize=None)
def _shift_powers(log_n: int, shift: int):
    n = 1 << log_n
    pw = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        pw[i] = acc
        acc = acc * shift % bb.P
    # (plain, shoup) pair; host numpy: safe to cache across jit traces
    return pw.astype(np.uint32), bb.np_shoup(pw)


# ---------------------------------------------------------------------------
# Host (numpy) mirror — standard-form uint64, axis 0.  The proof VERIFIER
# must be cheap and device-free (pcs/merkle.py contract); it recomputes the
# preprocessed-column commitment with this path instead of dispatching to
# the accelerator.
# ---------------------------------------------------------------------------


def np_ntt(x: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Radix-2 NTT along axis 0 of a standard-form uint64 array (n, ...)."""
    x = np.asarray(x, dtype=np.uint64) % np.uint64(bb.P)
    n = x.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    P64 = np.uint64(bb.P)
    x = x[_bit_reverse_indices(log_n)]
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        w = bb.two_adic_generator(s)
        if inverse:
            w = bb.s_inv(w)
        tw = np.empty(half, dtype=np.uint64)
        acc = 1
        for j in range(half):
            tw[j] = acc
            acc = acc * w % bb.P
        xs = x.reshape(n // m, m, *x.shape[1:])
        a = xs[:, :half]
        b = xs[:, half:] * tw.reshape(1, half, *([1] * (x.ndim - 1))) % P64
        x = np.concatenate([(a + b) % P64, (a + P64 - b) % P64], axis=1).reshape(
            x.shape
        )
    if inverse:
        x = x * np.uint64(bb.s_inv(n)) % P64
    return x


def np_coset_lde(
    evals: np.ndarray, log_blowup: int, shift: int = bb.GENERATOR
) -> np.ndarray:
    """Host mirror of ``coset_lde`` (axis 0): H-evaluations → shift·K."""
    evals = np.asarray(evals, dtype=np.uint64)
    n = evals.shape[0]
    coeffs = np_ntt(evals, inverse=True)
    pw = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        pw[i] = acc
        acc = acc * shift % bb.P
    coeffs = coeffs * pw.reshape(n, *([1] * (evals.ndim - 1))) % np.uint64(bb.P)
    pad = np.zeros((n * ((1 << log_blowup) - 1), *evals.shape[1:]), dtype=np.uint64)
    return np_ntt(np.concatenate([coeffs, pad], axis=0))


def coset_lde(evals, log_blowup: int, shift: int = bb.GENERATOR, axis: int = -1):
    """Low-degree extension: evaluations over H (size N) → evaluations over
    the coset shift·K (size N·2^log_blowup).

    intt → scale coefficient i by shift^i (evaluates p(shift·x)) → zero-pad →
    ntt at the larger size.
    """
    evals = jnp.moveaxis(evals, axis, -1)
    n = evals.shape[-1]
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError(f"LDE size must be a power of two, got {n}")
    coeffs = intt(evals)
    sw, ss = _shift_powers(log_n, shift % bb.P)
    coeffs = bb.shoup_mul(coeffs, sw, ss)
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, n * ((1 << log_blowup) - 1))]
    coeffs = jnp.pad(coeffs, pad)
    out = ntt(coeffs)
    return jnp.moveaxis(out, -1, axis)
