"""Distributed FRI: blockwise commit/fold over a row-sharded codeword.

The missing SP-axis phase of the sharded pipeline (SURVEY.md §2.3 — FRI
folding for codewords larger than per-chip HBM; VERDICT r3 item 6).

Layout invariant (group replication): at round r the size-M_r codeword is
sharded over g_r = d/2^r groups of devices, each device holding one
contiguous block of s = M_0/d rows (the block size never changes); devices
p and p' with p ≡ p' (mod g_r) hold identical blocks.  One fold round:

  1. ONE ``ppermute`` with the involution p → p ⊕ g_{r+1} — the two
     partners hold exactly the v(x) and v(−x) blocks of each other's fold
     targets (pair (i, i+M/2) ⇔ block index differing in the top bit);
  2. locally build the round's (s, 8) pair-leaf rows [v0 ‖ v1], the local
     Merkle subtree, and the folded half-size block — both partners compute
     the SAME folded block, doubling the replication factor;
  3. the round root folds the g_{r+1} group caps (gathered once, tiny).

Each element crosses ICI exactly once per round; after log2(d) rounds the
codeword is fully replicated and folding continues locally (bit-identical
on every device).  Query openings combine the owner device's local subtree
path with the replicated cap levels — identical bytes to the single-chip
``MerkleTree`` paths because subtree boundaries align.
"""

from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..field import ext
from ..pcs.fri import _inv2x_table
from ..pcs.merkle import DIGEST_WIDTH, build_levels, compress_pairs


def _fold_block(v0, v1, beta_mont, inv2x_local):
    half_const = np.uint32(bb.s_to_mont((bb.P + 1) // 2))
    even = ext.mul_base(
        ext.add(v0, v1), jnp.full((v0.shape[0],), half_const, jnp.uint32)
    )
    odd = ext.mul_base(ext.sub(v0, v1), inv2x_local)
    return ext.add(even, ext.mul(jnp.broadcast_to(beta_mont, odd.shape), odd))


def _cap_root(levels, axis_name: str, groups: int):
    """Fold the per-group subtree caps into the round root (replicated).

    ``levels[-1]``: (1, 8) local cap.  Gathers all d caps, keeps one
    representative per group (devices are group-replicated), folds."""
    caps = jax.lax.all_gather(levels[-1][0], axis_name, axis=0)  # (d, 8)
    caps = caps[:groups]
    top = [caps]
    while caps.shape[0] > 1:
        caps = compress_pairs(caps.reshape(caps.shape[0] // 2, 2, DIGEST_WIDTH))
        top.append(caps)
    return top  # top[-1][0] is the root


def dist_fri_round(codeword_local, r: int, axis_name: str, d: int, shift_r: int, cur_log: int):
    """Round r commit HALF: exchange partner blocks and build the pair-leaf
    subtree.  Returns (v0, v1, levels, top_levels, root) — fold happens in
    ``dist_fri_fold_half`` once β is known.

    codeword_local: (s, 4) block; group count at entry g = d >> r (g ≥ 1;
    once g == 1 every device holds the full codeword and the exchange is
    the identity)."""
    g = max(1, d >> r)
    g_next = g // 2
    me = jax.lax.axis_index(axis_name)
    if g_next >= 1:
        perm = [(p, p ^ g_next) for p in range(d)]
        partner = jax.lax.ppermute(codeword_local, axis_name, perm)
        # device p holds block index (p mod g); the v0 (lower) block is the
        # one whose index has the top bit (g_next) clear
        is_upper = (me & g_next) != 0
        v0 = jnp.where(is_upper, partner, codeword_local)
        v1 = jnp.where(is_upper, codeword_local, partner)
    else:
        # fully replicated: local split
        half = codeword_local.shape[0] // 2
        v0, v1 = codeword_local[:half], codeword_local[half:]
    pairs = jnp.concatenate([v0, v1], axis=1)  # (s[, /2], 8)
    levels = build_levels(pairs)
    top = _cap_root(levels, axis_name, max(1, g_next))
    root = bb.from_mont(top[-1][0])
    return v0, v1, pairs, levels, top, root


def dist_fri_fold_half(v0, v1, r: int, axis_name: str, d: int, shift_r: int, cur_log: int, beta_mont):
    """Round r fold HALF: β-fold the exchanged blocks into the next block.

    The 1/(2x) table slice is selected by this device's PAIR-block index
    (p mod g_next) — both partners compute the identical folded block."""
    g_next = max(1, (d >> r) // 2)
    me = jax.lax.axis_index(axis_name)
    half = 1 << (cur_log - 1)
    s = v0.shape[0]
    inv2x = _inv2x_table(shift_r, cur_log)  # (half,)
    if half > s:
        block_idx = jnp.remainder(me, g_next)
        inv2x_local = jax.lax.dynamic_slice_in_dim(inv2x, block_idx * s, s)
    else:
        inv2x_local = inv2x
    return _fold_block(v0, v1, beta_mont, inv2x_local)


def gather_sharded_opening(rows, levels, top_levels, j_global, axis_name: str):
    """Masked-psum gather of a row-sharded Merkle opening (row, path).

    ``rows``: (s, w) this device's leaf-value block; ``levels``: its local
    subtree digest levels; ``top_levels``: the replicated cap levels.
    Every device evaluates; exactly ONE canonical owner (device index ==
    global block index) contributes its leaf row and local sibling chain;
    the replicated cap levels supply the top of the path.  Returns
    (row (w,), path (depth, 8)) replicated, Montgomery form — bit-identical
    to the single-chip ``MerkleTree.open`` because subtree boundaries
    align.  Works for group-replicated layouts too (canonical owner index
    < group count always holds the block)."""
    s = rows.shape[0]
    me = jax.lax.axis_index(axis_name)
    block = (j_global // s).astype(jnp.uint32)
    local_j = jnp.remainder(j_global, s).astype(jnp.int32)
    own = (me.astype(jnp.uint32) == block).astype(jnp.uint32)

    row = jnp.take(rows, local_j, axis=0) * own
    row = jax.lax.psum(row, axis_name)
    sibs = []
    cur = local_j
    for level in levels[:-1]:
        sibs.append(jnp.take(level, cur ^ 1, axis=0))
        cur = cur >> 1
    if sibs:
        path_local = jax.lax.psum(jnp.stack(sibs, axis=0) * own, axis_name)
    else:
        path_local = jnp.zeros((0, DIGEST_WIDTH), jnp.uint32)
    top_sibs = []
    cur = block.astype(jnp.int32)
    for level in top_levels[:-1]:
        top_sibs.append(jnp.take(level, cur ^ 1, axis=0))
        cur = cur >> 1
    if top_sibs:
        path = jnp.concatenate([path_local, jnp.stack(top_sibs, axis=0)], axis=0)
    else:
        path = path_local
    return row, path
