"""Pipeline-parallel (PP) commit: prover stages on device groups, microbatch
stream hand-offs over ICI.

The GPipe-style mapping of SURVEY.md §2.3's PP row ("witness-gen → trace-gen
→ LDE → Merkle → …, overlapped across shards"): stage s of the commit
pipeline lives on device s of a ``pp`` mesh axis, microbatches (independent
traces of a proof batch) stream through, and at any step device d is working
on microbatch (step − d) — all stages busy once the pipe fills, with
``ppermute`` carrying the activation buffer one hop per step.

Stages (S = pp axis size ≥ 3) — EVERY stage carries real work:
  0        — to-Montgomery + coset LDE
  1        — Poseidon2 leaf hashing
  2..S−1   — the log₂(n_lde) Merkle compression levels, distributed evenly
             across the remaining stages (the last one emits the root)

Roots are bit-identical to the sequential single-device commit of each
microbatch (tested on the virtual CPU mesh).  All control flow is a
``fori_loop`` over B + S − 1 steps with a ``lax.switch`` on the stage id —
one traced program for every device.
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


def pp_commit_pipeline(traces, mesh, log_blowup: int = 1, shift: int = bb.GENERATOR,
                       axis_name: str = "pp"):
    """Pipelined batched commit.

    traces: (B, n, w) standard-form uint32 (microbatches of a proof batch).
    Returns (B, 8) Montgomery Merkle roots (replicated across the mesh).
    """
    S = mesh.shape[axis_name]
    if S < 3:
        raise ValueError("pipeline needs at least 3 stages (lde, hash, reduce)")
    B, n, w = traces.shape
    n_lde = n << log_blowup
    buf_w = max(w, DIGEST_WIDTH)
    steps = B + S - 1
    # distribute the log2(n_lde) compression levels over stages 2..S-1:
    # earlier reduce stages take the (larger) lower levels
    total_levels = n_lde.bit_length() - 1
    n_reduce = S - 2
    base, extra = divmod(total_levels, n_reduce)
    levels_per_stage = [base + (1 if i < extra else 0) for i in range(n_reduce)]
    # rows of live digests ENTERING each reduce stage
    rows_in = []
    rows = n_lde
    for lv in levels_per_stage:
        rows_in.append(rows)
        rows >>= lv

    def kernel(tr):
        stage = jax.lax.axis_index(axis_name)

        def stage_lde(buf, step):
            idx = jnp.clip(step, 0, B - 1)
            mb = jax.lax.dynamic_slice_in_dim(tr, idx, 1, axis=0)[0]  # (n, w)
            lde = coset_lde(bb.to_mont(mb), log_blowup, shift, axis=0)
            out = jnp.zeros((n_lde, buf_w), jnp.uint32)
            return out.at[:, :w].set(lde)

        def stage_hash(buf, step):
            digests = hash_rows(buf[:, :w])  # (n_lde, 8)
            out = jnp.zeros((n_lde, buf_w), jnp.uint32)
            return out.at[:, :DIGEST_WIDTH].set(digests)

        def make_reduce(rows_live: int, n_levels: int):
            def stage_reduce(buf, step):
                digests = buf[:rows_live, :DIGEST_WIDTH]
                for _ in range(n_levels):
                    digests = compress_pairs(
                        digests.reshape(-1, 2, DIGEST_WIDTH)
                    )
                out = jnp.zeros((n_lde, buf_w), jnp.uint32)
                return out.at[: digests.shape[0], :DIGEST_WIDTH].set(digests)

            return stage_reduce

        branches = [stage_lde, stage_hash] + [
            make_reduce(rows_in[i], levels_per_stage[i]) for i in range(n_reduce)
        ]
        branch = jnp.clip(stage, 0, len(branches) - 1)

        def body(step, carry):
            buf, roots = carry
            new_buf = jax.lax.switch(branch, branches, buf, step)
            # the root emerges on the last stage at step = microbatch + S - 1
            mb_idx = step - (S - 1)
            is_root = (stage == S - 1) & (mb_idx >= 0) & (mb_idx < B)
            upd = jax.lax.dynamic_update_slice_in_dim(
                roots, new_buf[0:1, :DIGEST_WIDTH], jnp.clip(mb_idx, 0, B - 1), axis=0
            )
            roots = jnp.where(is_root, upd, roots)
            # hand the buffer one stage down the pipe (ring; stage 0 ignores input)
            perm = [(d, (d + 1) % S) for d in range(S)]
            buf = jax.lax.ppermute(new_buf, axis_name, perm)
            return buf, roots

        buf0 = jnp.zeros((n_lde, buf_w), jnp.uint32)
        roots0 = jnp.zeros((B, DIGEST_WIDTH), jnp.uint32)
        _, roots = jax.lax.fori_loop(0, steps, body, (buf0, roots0))
        # only the last stage holds real roots; psum broadcasts them
        roots = jnp.where(stage == S - 1, roots, jnp.zeros_like(roots))
        return jax.lax.psum(roots, axis_name)

    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=P(None, None, None),
        out_specs=P(None, None),
        check_rep=False,
    )(jnp.asarray(traces, jnp.uint32))
