"""Expert-parallel (EP) table commitment: different AIR tables on different
device groups.

SP1 proves many AIR "chips" (tables) per shard and commits them together;
the reference never distributes this (SURVEY.md §2.3 — EP row).  Here the
table axis is sharded over an ``ep`` mesh axis: each device group runs the
full LDE + Merkle commit for its tables locally, and the per-table roots are
gathered over ICI at the commitment step — the "different AIR chips proved
on different device groups, gathered at the commitment step" mapping.

Tables are padded to a common (rows, width) so the kernel is one traced
program; roots are bit-identical to single-device ``MerkleTree`` commits of
the same padded matrices (tested on the virtual CPU mesh).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..field import babybear as bb
from ..ntt import coset_lde
from ..pcs.merkle import DIGEST_WIDTH, compress_pairs, hash_rows


def _commit_one(mat_std, log_blowup: int, shift: int):
    """standard-form (n, w) table → 8-word Merkle root of its coset LDE."""
    lde = coset_lde(bb.to_mont(mat_std), log_blowup, shift, axis=0)
    digests = hash_rows(lde)
    while digests.shape[0] > 1:
        digests = compress_pairs(digests.reshape(-1, 2, DIGEST_WIDTH))
    return digests[0]


def pad_tables(tables) -> np.ndarray:
    """Stack ragged standard-form tables into one (K, n_max, w_max) array.

    Rows are padded to the max power-of-two row count, columns with zeros;
    the padding is part of the committed matrix (deterministic both sides).
    """
    n_max = max(t.shape[0] for t in tables)
    n_max = 1 << (n_max - 1).bit_length()
    w_max = max(t.shape[1] for t in tables)
    out = np.zeros((len(tables), n_max, w_max), dtype=np.uint32)
    for k, t in enumerate(tables):
        out[k, : t.shape[0], : t.shape[1]] = t
    return out


def ep_commit_tables(tables, mesh, log_blowup: int = 1, shift: int = bb.GENERATOR,
                     axis_name: str = "ep"):
    """Commit K padded tables with the table axis sharded over ``axis_name``.

    tables: (K, n, w) standard-form uint32 (see ``pad_tables``); K must be a
    multiple of the axis size.  Returns (K, 8) Montgomery roots, replicated.
    """
    k = tables.shape[0]
    ep = mesh.shape[axis_name]
    if k % ep:
        raise ValueError(f"table count {k} not divisible by ep={ep}")

    def kernel(local):
        roots = jax.vmap(lambda m: _commit_one(m, log_blowup, shift))(local)
        return jax.lax.all_gather(roots, axis_name, axis=0, tiled=True)

    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=P(axis_name, None, None),
        out_specs=P(None, None),
        check_rep=False,  # gather makes the output replicated
    )(jnp.asarray(tables, jnp.uint32))
