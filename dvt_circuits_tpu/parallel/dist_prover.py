"""Sharded proving-step building blocks over a (dp, sp, tp) mesh.

Axis mapping (SURVEY.md §2.3 — every axis is net-new vs the reference):

  * dp — independent proofs in a batch (shards the batch axis)
  * sp — the NTT/trace row dimension (four-step NTT with ICI all-to-all)
  * tp — trace columns (per-column transforms local; leaf hashing
         all_gathers the row across tp)

``dist_commit_step`` is the sharded analogue of the prover's commit phase:
trace batch → per-column NTT over sharded rows → row hashes → Merkle caps
reduced over sp.  It executes collectives on whatever mesh it is given and
is what ``__graft_entry__.dryrun_multichip`` compiles and runs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..field import babybear as bb
from ..ntt import ntt
from ..pcs.merkle import DIGEST_WIDTH, compress_pairs, hash_rows
from .dist_ntt import _outer_twiddles


def dist_commit_step(traces, mesh):
    """Batched sharded commit step.

    traces: (B, N, W) standard-form uint32, sharded (dp, sp, tp).
    Returns (B, 8) Merkle roots (Montgomery), sharded (dp,).
    """
    B, n, w = traces.shape
    dp = mesh.shape.get("dp", 1)
    sp = mesh.shape.get("sp", 1)
    tp = mesh.shape.get("tp", 1)
    log_n = n.bit_length() - 1
    log_a = log_n // 2
    log_b = log_n - log_a
    a, b_sz = 1 << log_a, 1 << log_b
    if a % sp or b_sz % sp:
        raise ValueError("row grid not divisible by sp")
    tw = _outer_twiddles(log_a, log_b, False)

    def kernel(tr):
        # tr: (B/dp, N/sp, W/tp)
        bs, n_loc, w_loc = tr.shape
        x = bb.to_mont(tr)
        # --- four-step NTT over the sharded row axis (per batch, per col) ---
        m = jnp.moveaxis(x, 1, -1)  # (B/dp, W/tp, N/sp)
        m = m.reshape(bs, w_loc, a // sp, b_sz)
        m = jax.lax.all_to_all(m, "sp", split_axis=3, concat_axis=2, tiled=True)
        m = ntt(m, axis=-2)  # A-point NTTs (local)
        me = jax.lax.axis_index("sp")
        tw_local = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(tw), me * (b_sz // sp), b_sz // sp, axis=1
        )
        m = bb.mont_mul(m, tw_local)
        m = jax.lax.all_to_all(m, "sp", split_axis=2, concat_axis=3, tiled=True)
        m = ntt(m, axis=-1)  # B-point NTTs (local)
        m = m.reshape(bs, w_loc, n_loc)
        evals = jnp.moveaxis(m, -1, 1)  # (B/dp, N/sp, W/tp) digit-ordered rows

        # --- leaf hashing needs full rows: gather the tp-sharded columns ---
        full = jax.lax.all_gather(evals, "tp", axis=2, tiled=True)  # (B/dp, N/sp, W)

        # --- local subtree caps, then reduce caps over sp ------------------
        def one(mat):
            digests = hash_rows(mat)
            while digests.shape[0] > 1:
                digests = compress_pairs(
                    digests.reshape(digests.shape[0] // 2, 2, DIGEST_WIDTH)
                )
            return digests[0]

        caps = jax.vmap(one)(full)  # (B/dp, 8)
        gathered = jax.lax.all_gather(caps, "sp", axis=0)  # (sp, B/dp, 8)
        gathered = jnp.moveaxis(gathered, 0, 1)  # (B/dp, sp, 8)

        def fold(caps_one):
            c = caps_one
            while c.shape[0] > 1:
                c = compress_pairs(c.reshape(c.shape[0] // 2, 2, DIGEST_WIDTH))
            return c[0]

        return jax.vmap(fold)(gathered)  # (B/dp, 8)

    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=P("dp", "sp", "tp"),
        out_specs=P("dp", None),
        check_rep=False,  # roots are sp/tp-replicated by construction
    )(traces)
