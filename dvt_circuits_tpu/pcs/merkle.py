"""Poseidon2 Merkle commitments over BabyBear matrices.

TPU-native replacement for the Merkle/commitment stage of SP1's prover
(SURVEY.md §2.2): leaf hashing is a width-16 sponge over each matrix row
(pure batched VPU work), interior levels compress digest pairs.  The whole
tree build is ONE jitted device call (`_build_levels`, shape-cached);
openings read from host mirrors materialized in a single transfer.

Digests are 8 BabyBear words (~248 bits).  Opening verification is host-side
scalar (a few dozen permutations per query).  The multi-chip variant reduces
per-shard subtree caps with collectives (parallel/dist_merkle.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..hash.poseidon2 import DIGEST_WIDTH, RATE, WIDTH, poseidon2_permute, s_permute


def hash_rows(matrix):
    """Sponge-hash each row of a (n, w) Montgomery-form matrix → (n, 8)."""
    n, w = matrix.shape
    state = jnp.zeros((n, WIDTH), jnp.uint32)
    for off in range(0, w, RATE):
        chunk = matrix[:, off : off + RATE]
        if chunk.shape[1] < RATE:
            chunk = jnp.pad(chunk, ((0, 0), (0, RATE - chunk.shape[1])))
        state = state.at[:, :RATE].set(chunk)
        state = poseidon2_permute(state)
    return state[:, :DIGEST_WIDTH]


def compress_pairs(digests):
    """(n, 2, 8) digest pairs → (n, 8) parent digests."""
    n = digests.shape[0]
    state = jnp.zeros((n, WIDTH), jnp.uint32)
    state = state.at[:, : 2 * DIGEST_WIDTH].set(digests.reshape(n, 2 * DIGEST_WIDTH))
    return poseidon2_permute(state)[:, :DIGEST_WIDTH]


@jax.jit
def _build_levels(matrix):
    """Full tree build (leaf hash + all compress levels) in one device call."""
    levels = [hash_rows(matrix)]
    while levels[-1].shape[0] > 1:
        cur = levels[-1]
        levels.append(compress_pairs(cur.reshape(cur.shape[0] // 2, 2, DIGEST_WIDTH)))
    return tuple(levels)


@jax.jit
def _to_std(arrs):
    return tuple(bb.from_mont(a) for a in arrs)


class MerkleTree:
    """Commitment to a (n_leaves, row_width) matrix; n_leaves a power of two."""

    def __init__(self, matrix):
        matrix = jnp.asarray(matrix, jnp.uint32)
        n = matrix.shape[0]
        if n & (n - 1):
            raise ValueError("leaf count must be a power of two")
        self.matrix = matrix
        self.levels = _build_levels(matrix)
        self._host = None  # lazy standard-form mirrors for opening

    def _materialize(self):
        if self._host is None:
            std = _to_std(tuple([self.matrix] + list(self.levels)))
            self._host = [np.asarray(a) for a in std]
        return self._host

    @property
    def root(self) -> np.ndarray:
        """Root digest as 8 standard-form uint32 words (host numpy)."""
        return self._materialize()[-1][0]

    def open(self, index: int):
        """Return (row_values_standard, sibling_path_standard)."""
        host = self._materialize()
        row = host[0][index]
        path = []
        idx = index
        for level in host[1:-1]:
            path.append(level[idx ^ 1])
            idx >>= 1
        return row, path


def _s_hash_row(row) -> list:
    state = [0] * WIDTH
    for off in range(0, len(row), RATE):
        chunk = list(row[off : off + RATE])
        chunk += [0] * (RATE - len(chunk))
        state[:RATE] = chunk
        state = s_permute(state)
    return state[:DIGEST_WIDTH]


def _s_compress(left, right) -> list:
    state = list(left) + list(right) + [0] * (WIDTH - 2 * DIGEST_WIDTH)
    return s_permute(state)[:DIGEST_WIDTH]


def verify_opening(root, index: int, row, path) -> bool:
    """Host-side scalar verification of a Merkle opening (standard-form ints)."""
    digest = _s_hash_row([int(v) for v in row])
    idx = index
    for sib in path:
        sib = [int(v) for v in sib]
        if idx & 1:
            digest = _s_compress(sib, digest)
        else:
            digest = _s_compress(digest, sib)
        idx >>= 1
    return digest == [int(v) for v in root]
