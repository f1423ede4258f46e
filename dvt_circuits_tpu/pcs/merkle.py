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
from ..hash.poseidon2_pallas import BLOCK, permute_lanes


#: unroll the leaf-sponge chunk loop only for narrow rows; wide matrices
#: (the 26k-column G1 chip trace) use lax.scan so the traced graph stays
#: O(1) in width instead of one inlined permutation per 8 columns
_UNROLL_CHUNKS = 64


def hash_rows(matrix):
    """Sponge-hash each row of a (n, w) Montgomery-form matrix → (n, 8)."""
    n, w = matrix.shape
    pad = (-w) % RATE
    if pad:
        matrix = jnp.pad(matrix, ((0, 0), (0, pad)))
    nchunks = matrix.shape[1] // RATE
    state = jnp.zeros((n, WIDTH), jnp.uint32)
    if nchunks <= _UNROLL_CHUNKS:
        for off in range(0, matrix.shape[1], RATE):
            chunk = matrix[:, off : off + RATE]
            state = state.at[:, :RATE].set(chunk)
            state = poseidon2_permute(state)
        return state[:, :DIGEST_WIDTH]

    chunks = matrix.reshape(n, nchunks, RATE).transpose(1, 0, 2)

    def absorb(st, chunk):
        st = st.at[:, :RATE].set(chunk)
        return poseidon2_permute(st), None

    state, _ = jax.lax.scan(absorb, state, chunks)
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


# ---------------------------------------------------------------------------
# Transposed-lane (Pallas) tree build: TPU hot path
# ---------------------------------------------------------------------------
# States live as (16, N) so the batch rides the 128-wide VPU lanes and every
# permutation's 22 rounds stay resident in VMEM (hash/poseidon2_pallas.py).
# The whole tree is built in this layout — one transpose in, one per level
# out — and is bit-identical to ``_build_levels`` (tested on hardware).


def _permute_t(state_t):
    """(16, n) → (16, n) permutation, padding lanes to a BLOCK multiple."""
    n = state_t.shape[1]
    pad = (-n) % BLOCK
    if pad:
        state_t = jnp.pad(state_t, ((0, 0), (0, pad)))
    out = permute_lanes(state_t)
    return out[:, :n] if pad else out


def _hash_rows_t(matrix_t):
    """Sponge-hash columns of a (w, n) transposed matrix → (8, n)."""
    w, n = matrix_t.shape
    pad = (-w) % RATE
    if pad:
        matrix_t = jnp.pad(matrix_t, ((0, pad), (0, 0)))
    nchunks = matrix_t.shape[0] // RATE
    state = jnp.zeros((WIDTH, n), jnp.uint32)
    if nchunks <= _UNROLL_CHUNKS:
        for off in range(0, matrix_t.shape[0], RATE):
            chunk = matrix_t[off : off + RATE]
            state = jnp.concatenate([chunk, state[RATE:]], axis=0)
            state = _permute_t(state)
        return state[:DIGEST_WIDTH]

    # lane-pad once so the scanned permutation has a static shape
    lane_pad = (-n) % BLOCK
    if lane_pad:
        matrix_t = jnp.pad(matrix_t, ((0, 0), (0, lane_pad)))
        state = jnp.pad(state, ((0, 0), (0, lane_pad)))
    chunks = matrix_t.reshape(nchunks, RATE, matrix_t.shape[1])

    def absorb(st, chunk):
        st = jnp.concatenate([chunk, st[RATE:]], axis=0)
        return permute_lanes(st), None

    state, _ = jax.lax.scan(absorb, state, chunks)
    return state[:DIGEST_WIDTH, :n]


def _compress_t(level_t):
    """(8, n) digests → (8, n/2) parents: rows 0-7 = left child, 8-15 = right."""
    pairs = level_t.reshape(DIGEST_WIDTH, level_t.shape[1] // 2, 2)
    state = jnp.concatenate([pairs[..., 0], pairs[..., 1]], axis=0)
    return _permute_t(state)[:DIGEST_WIDTH]


@jax.jit
def _build_levels_pallas(matrix):
    """Tree build in transposed-lane layout; returns (n, 8) levels like
    ``_build_levels``."""
    mt = matrix.T
    levels = [_hash_rows_t(mt)]
    while levels[-1].shape[1] > 1:
        levels.append(_compress_t(levels[-1]))
    return tuple(lvl.T for lvl in levels)


def build_levels(matrix):
    """Backend-dispatched tree build (Pallas on TPU, XLA elsewhere)."""
    if jax.default_backend() == "tpu":
        return _build_levels_pallas(matrix)
    return _build_levels(matrix)


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
        self.levels = build_levels(matrix)
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


def host_merkle_root(matrix_std) -> list:
    """Whole-tree root on the HOST from a standard-form (n, w) matrix —
    native-batched Poseidon2, scalar fallback.  Bit-identical to the device
    ``build_levels`` root (which hashes the Montgomery image of the same
    values).  Used by the verifier's preprocessed-commitment recomputation
    so verification never dispatches to an accelerator."""
    from ..utils import native

    matrix = np.asarray(matrix_std, dtype=np.uint32)
    digests = native.hash_rows_np(matrix)
    if digests is None:
        digests = np.array([_s_hash_row([int(v) for v in r]) for r in matrix],
                           dtype=np.uint32)
    while digests.shape[0] > 1:
        pairs = digests.reshape(-1, 16)
        nxt = native.compress_np(pairs)
        if nxt is None:
            nxt = np.array(
                [_s_compress(p[:8], p[8:]) for p in pairs], dtype=np.uint32
            )
        digests = nxt
    return [int(v) for v in digests[0]]


def verify_openings_batch(root, indices, rows, paths) -> bool:
    """Batched verification of same-tree openings (the verifier's hot path:
    every query opens the same committed matrix).

    ``rows``: (nq, w); ``paths``: (nq, depth, 8); all standard-form.  Uses
    the native host library in two calls per level; falls back to the scalar
    walk when it is unavailable."""
    from ..utils import native

    rows = np.asarray(rows, dtype=np.uint32)
    paths = np.asarray(paths, dtype=np.uint32)
    digests = native.hash_rows_np(rows)
    if digests is None:  # pure-Python fallback
        return all(
            verify_opening(root, int(i), r, p)
            for i, r, p in zip(indices, rows, paths)
        )
    # copy: the shift below must not mutate the caller's index array
    idx = np.array(indices, dtype=np.int64, copy=True)
    for level in range(paths.shape[1]):
        sib = paths[:, level]
        odd = (idx & 1).astype(bool)[:, None]
        left = np.where(odd, sib, digests)
        right = np.where(odd, digests, sib)
        digests = native.compress_np(np.concatenate([left, right], axis=1))
        idx >>= 1
    return bool(np.all(digests == np.asarray(root, dtype=np.uint32)[None, :]))
