"""Multi-chip NTT: four-step decomposition with all-to-all axis swaps.

The direct analogue of Ulysses-style sequence parallelism (SURVEY.md §2.3):
a size-N NTT is decomposed over an A×B matrix (N = A·B, row-major, rows
sharded contiguously across the `sp` mesh axis):

  1. all-to-all (tiled) swaps the sharded axis: rows → columns, so each
     device holds all A rows of a B/d-column block,
  2. A-point NTTs along the row axis — local,
  3. twiddle multiply M[k1, i2] ·= ω_N^{i2·k1} — local,
  4. all-to-all swaps back: columns → rows,
  5. B-point NTTs along the column axis — local.

Each element crosses the interconnect exactly twice — the classic
communication schedule for a distributed NTT; both exchanges ride ICI.

Output is in digit order: local flat position k1_local·B + k2 holds
X[k1 + k2·A].  Consumers (Merkle leaves, FRI folds) only need a consistent
order; `undigit` restores natural order host-side for tests.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..field import babybear as bb
from ..ntt import intt, ntt


@lru_cache(maxsize=None)
def _outer_twiddles(log_a: int, log_b: int, inverse: bool):
    """ω_N^{i2·k1} table of shape (A, B) (k1 rows, i2 cols), Montgomery."""
    a, b_sz = 1 << log_a, 1 << log_b
    w = bb.two_adic_generator(log_a + log_b)
    if inverse:
        w = bb.s_inv(w)
    out = np.empty((a, b_sz), dtype=np.uint64)
    for k1 in range(a):
        base = pow(w, k1, bb.P)
        acc = 1
        for i2 in range(b_sz):
            out[k1, i2] = acc
            acc = acc * base % bb.P
    return bb.np_to_mont(out)


def four_step_ntt(x, log_a: int, inverse: bool = False):
    """Single-device reference of the four-step NTT (digit-ordered output).

    x: (..., N) Montgomery.  Output position k1·B + k2 holds X[k1 + k2·A].
    """
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    log_b = log_n - log_a
    a, b_sz = 1 << log_a, 1 << log_b
    ntt_fn = intt if inverse else ntt
    m = x.reshape(*x.shape[:-1], a, b_sz)
    m = ntt_fn(m, axis=-2)
    m = bb.mont_mul(m, jnp.asarray(_outer_twiddles(log_a, log_b, inverse)))
    m = ntt_fn(m, axis=-1)
    return m.reshape(*x.shape[:-1], n)


def undigit(y, log_n: int) -> np.ndarray:
    """Digit order (k1·B + k2 ↦ X[k1 + k2·A]) → natural order, host-side."""
    log_a = log_n // 2
    a = 1 << log_a
    b_sz = 1 << (log_n - log_a)
    y = np.asarray(y)
    m = y.reshape(*y.shape[:-1], a, b_sz)
    return np.swapaxes(m, -1, -2).reshape(*y.shape[:-1], a * b_sz)


def dist_ntt(x, mesh, axis_name: str = "sp", inverse: bool = False):
    """Sharded four-step NTT under shard_map (digit-ordered output).

    x: (..., N) with the last axis sharded over `axis_name`.  Each device's
    contiguous block is a row block of the A×B matrix.
    """
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError("NTT size must be a power of two")
    d = mesh.shape[axis_name]
    log_a = log_n // 2
    log_b = log_n - log_a
    a, b_sz = 1 << log_a, 1 << log_b
    if a % d or b_sz % d:
        raise ValueError(f"grid {a}x{b_sz} not divisible by {d} devices")
    tw = _outer_twiddles(log_a, log_b, inverse)
    ntt_fn = intt if inverse else ntt

    def kernel(xl):
        bs = xl.shape[:-1]
        nb = len(bs)
        m = xl.reshape(*bs, a // d, b_sz)  # local contiguous row block
        # rows-sharded → cols-sharded: split columns, concat rows
        m = jax.lax.all_to_all(
            m, axis_name, split_axis=nb + 1, concat_axis=nb, tiled=True
        )  # (A, B/d)
        m = ntt_fn(m, axis=-2)  # A-point NTTs, local
        me = jax.lax.axis_index(axis_name)
        tw_local = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(tw), me * (b_sz // d), b_sz // d, axis=1
        )
        m = bb.mont_mul(m, tw_local)
        # cols-sharded → rows-sharded: split rows, concat columns
        m = jax.lax.all_to_all(
            m, axis_name, split_axis=nb, concat_axis=nb + 1, tiled=True
        )  # (A/d, B)
        m = ntt_fn(m, axis=-1)  # B-point NTTs, local
        return m.reshape(*bs, (a // d) * b_sz)

    spec = P(*([None] * (x.ndim - 1) + [axis_name]))
    return shard_map(kernel, mesh=mesh, in_specs=spec, out_specs=spec)(x)
