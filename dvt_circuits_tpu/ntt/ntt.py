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
    """Per-stage twiddle tables (Montgomery form) for DIT butterflies.

    Stage s (1-based, block size m = 2^s) uses w_m^j for j < m/2 where
    w_m is the m-th root of unity (inverse root for the inverse NTT).
    """
    stages = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w = bb.two_adic_generator(s)
        if inverse:
            w = bb.s_inv(w)
        tw = np.empty(m // 2, dtype=np.uint32)
        acc = 1
        for j in range(m // 2):
            tw[j] = acc
            acc = acc * w % bb.P
        # stored as host numpy so the cache never captures jit tracers
        stages.append(bb.np_to_mont(tw))
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
        tw = stages[s - 1]  # (half,)
        v = x.reshape(*batch_shape, n // m, 2, half)
        even = v[..., 0, :]
        odd = bb.mont_mul(v[..., 1, :], tw)
        x = jnp.concatenate([bb.add(even, odd), bb.sub(even, odd)], axis=-1).reshape(
            *batch_shape, n
        )
    return x


def ntt(x, axis: int = -1):
    """Forward NTT (evaluations at ω^0..ω^{N-1}) of Montgomery-form coeffs."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError(f"NTT size must be a power of two, got {n}")
    out = _ntt_core(x, log_n, inverse=False)
    return jnp.moveaxis(out, -1, axis)


def intt(x, axis: int = -1):
    """Inverse NTT: evaluations → coefficients (Montgomery form)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError(f"NTT size must be a power of two, got {n}")
    out = _ntt_core(x, log_n, inverse=True)
    n_inv = np.uint32(bb.s_to_mont(bb.s_inv(n % bb.P)))
    out = bb.mont_mul(out, jnp.full((), n_inv, jnp.uint32))
    return jnp.moveaxis(out, -1, axis)


@lru_cache(maxsize=None)
def _shift_powers(log_n: int, shift: int):
    n = 1 << log_n
    pw = np.empty(n, dtype=np.uint32)
    acc = 1
    for i in range(n):
        pw[i] = acc
        acc = acc * shift % bb.P
    return bb.np_to_mont(pw)  # host numpy: safe to cache across jit traces


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
    coeffs = bb.mont_mul(coeffs, _shift_powers(log_n, shift % bb.P))
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, n * ((1 << log_blowup) - 1))]
    coeffs = jnp.pad(coeffs, pad)
    out = ntt(coeffs)
    return jnp.moveaxis(out, -1, axis)
