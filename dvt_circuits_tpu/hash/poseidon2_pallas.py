"""Pallas TPU kernel for the Poseidon2 permutation.

Layout is the whole trick: states are stored transposed as (16, N) so the
batch axis lands on the 128-wide VPU lanes (the natural (N, 16) layout
wastes 7/8 of every vector op) and the 16 state elements live on sublanes.
Each grid step keeps a (16, BLOCK) tile resident in VMEM for all 22 rounds
— zero HBM traffic between rounds, unlike the XLA fusion which materializes
intermediates.

Bit-identical to ``poseidon2.poseidon2_permute`` (tested); used by the
batched leaf-hashing path when shapes allow.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import babybear as bb
from . import poseidon2 as p2

BLOCK = 2048  # lanes per grid step (multiple of 128; swept on v5e — 512 runs
# at ~78M perm/s, 2048 at ~159M perm/s ≈ 88% of the VPU roofline estimate)

_EXT_C = np.asarray(bb.np_to_mont(np.array(p2.EXTERNAL_CONSTANTS, dtype=np.uint64)))
_INT_C = np.asarray(bb.np_to_mont(np.array(p2.INTERNAL_CONSTANTS, dtype=np.uint64)))


def _sbox(x):
    x2 = bb.mont_sq(x)
    x3 = bb.mont_mul(x2, x)
    return bb.mont_mul(bb.mont_sq(x2), x3)


def _m4_rows(x0, x1, x2, x3):
    t0 = bb.add(x0, x1)
    t1 = bb.add(x2, x3)
    t2 = bb.add(bb.double(x1), t1)
    t3 = bb.add(bb.double(x3), t0)
    t4 = bb.add(bb.double(bb.double(t1)), t3)
    t5 = bb.add(bb.double(bb.double(t0)), t2)
    return bb.add(t3, t5), t5, bb.add(t2, t4), t4


def _external_linear_rows(rows):
    """rows: list of 16 (BLOCK,) lane vectors."""
    groups = [list(_m4_rows(*rows[g : g + 4])) for g in range(0, 16, 4)]
    sums = [
        bb.add(bb.add(groups[0][j], groups[1][j]), bb.add(groups[2][j], groups[3][j]))
        for j in range(4)
    ]
    return [bb.add(groups[i // 4][i % 4], sums[i % 4]) for i in range(16)]


def _internal_linear_rows(rows):
    total = rows[0]
    for r in rows[1:]:
        total = bb.add(total, r)
    # diag = 1..16: double/add chains (bb.mul_small) instead of mont_muls
    return [
        bb.add(bb.mul_small(rows[i], p2.INTERNAL_DIAG[i]), total) for i in range(16)
    ]


def _kernel(in_ref, out_ref):
    rows = [in_ref[i, :] for i in range(16)]
    rows = _external_linear_rows(rows)
    for r in range(p2.ROUNDS_F // 2):
        rows = [_sbox(bb.add(rows[i], jnp.uint32(_EXT_C[r, i]))) for i in range(16)]
        rows = _external_linear_rows(rows)
    for r in range(p2.ROUNDS_P):
        rows[0] = _sbox(bb.add(rows[0], jnp.uint32(_INT_C[r])))
        rows = _internal_linear_rows(rows)
    for r in range(p2.ROUNDS_F // 2, p2.ROUNDS_F):
        rows = [_sbox(bb.add(rows[i], jnp.uint32(_EXT_C[r, i]))) for i in range(16)]
        rows = _external_linear_rows(rows)
    for i in range(16):
        out_ref[i, :] = rows[i]


@jax.jit
def permute_lanes(states_t):
    """Permute states in transposed layout: (16, N) Montgomery, N % BLOCK == 0."""
    n = states_t.shape[1]
    grid = (n // BLOCK,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        interpret=jax.default_backend() == "cpu",  # Mosaic is TPU-only
        in_specs=[
            pl.BlockSpec((16, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((16, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(states_t.shape, jnp.uint32),
    )(states_t)


@jax.jit
def poseidon2_permute_pallas(states):
    """Drop-in batched permutation: (N, 16) Montgomery → (N, 16).

    Pads N up to a BLOCK multiple, runs the transposed-lane kernel."""
    n = states.shape[0]
    pad = (-n) % BLOCK
    x = jnp.pad(states, ((0, pad), (0, 0)))
    out = permute_lanes(x.T)
    return out.T[:n]
