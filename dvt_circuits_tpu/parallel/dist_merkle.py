"""Multi-chip Merkle commitment: local subtrees + gathered cap.

Each device hashes and reduces its contiguous leaf block to a single
subtree-cap digest (pure local VPU work), then an all_gather over ICI
collects the d caps and every device folds the cap chain — the psum-tree
analogue SURVEY.md §2.3 prescribes for Merkle caps.  The resulting root is
bit-identical to the single-device ``MerkleTree`` root for the same matrix
(tested), so proofs are sharding-invariant.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..pcs.merkle import DIGEST_WIDTH, compress_pairs, hash_rows


def dist_merkle_root(matrix, mesh, axis_name: str = "sp"):
    """Root of the Merkle tree over `matrix` (n_leaves, w), leaves sharded
    contiguously along axis 0 over `axis_name`.  Returns the (8,) root
    (Montgomery form), replicated."""
    n = matrix.shape[0]
    d = mesh.shape[axis_name]
    if n % d or (n // d) & (n // d - 1):
        raise ValueError("leaf block per device must be a power of two")

    def kernel(local):
        # local: (n/d, w) leaf block → local subtree cap
        digests = hash_rows(local)
        while digests.shape[0] > 1:
            digests = compress_pairs(
                digests.reshape(digests.shape[0] // 2, 2, DIGEST_WIDTH)
            )
        caps = jax.lax.all_gather(digests[0], axis_name)  # (d, 8)
        while caps.shape[0] > 1:
            caps = compress_pairs(caps.reshape(caps.shape[0] // 2, 2, DIGEST_WIDTH))
        return caps[0]

    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=P(),
        check_rep=False,  # root is replicated by construction (all_gather)
    )(matrix)
