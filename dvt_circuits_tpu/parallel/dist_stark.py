"""Distributed STARK prover: the full DEEP-ALI pipeline over a device mesh.

Puts the mesh into the PRODUCTION proof path (VERDICT r3 item 5): every
phase of ``stark.prover.prove`` — trace LDE, Merkle commit, constraint
quotient, DEEP openings, DEEP codeword, FRI commit/fold, query openings —
executes sharded over a mesh axis, and the resulting proof dict is
BIT-IDENTICAL to the single-chip prover's (asserted by tests and the
driver's multichip dryrun).

Communication-minimal sharding plan (one axis, ``sp``, d devices):

  * LDE: trace COLUMNS sharded — per-column NTTs are local, zero comms;
  * commit: ONE all_to_all re-shards to contiguous ROW blocks (full rows
    are needed for leaf hashing); local Poseidon2 subtrees + a tiny cap
    gather produce the identical root (subtree boundaries align);
  * quotient: row-sharded constraint evaluation; the `next`-row access
    needs exactly ``blowup`` halo rows from the cyclic successor — ONE
    ppermute;
  * quotient chunks: the folded quotient is only 4 columns wide — one
    small all_gather, then every device runs the identical chunk iNTT/NTT
    (replicated), committing its own row block;
  * DEEP openings: per-column ζ-dots on the column-sharded coefficients +
    a small all_gather of the (W, 4) results;
  * DEEP codeword + FRI: row-sharded; FRI folds exchange partner blocks
    with ONE ppermute per round (parallel.dist_fri group-replication
    scheme);
  * query openings: masked-psum gathers (every device contributes its
    owned rows/paths; exactly one owner per index).

The Fiat–Shamir transcript runs on the host exactly as in the phase
prover, so challenges — and therefore every committed value — match the
single-chip proof byte-for-byte.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..field import babybear as bb
from ..field import ext
from ..ntt import coset_lde
from ..pcs.challenger import DuplexChallenger
from ..pcs.merkle import DIGEST_WIDTH, build_levels
from ..stark.air import Air
from ..stark.config import StarkConfig
from ..stark.prover import (
    ProverBuilder,
    TensorBuilder,
    _coeffs_to_coset_evals,
    _coset_evals_to_coeffs,
    _domain_tables,
    _ext_power_table,
    _fold_columns,
    deep_body,
    opened_digest_std,
)
from .dist_fri import _cap_root, dist_fri_fold_half, dist_fri_round

_PHASE_CACHE: dict = {}


def _pad_cols(mat: np.ndarray, d: int) -> np.ndarray:
    w = mat.shape[1]
    wp = -(-max(w, 1) // d) * d
    if wp == w:
        return mat
    return np.pad(mat, ((0, 0), (0, wp - w)))


def _levels_specs(n_local: int, ax: str):
    specs = []
    n = n_local
    while True:
        specs.append(P(ax, None))
        if n == 1:
            break
        n //= 2
    return specs


def _top_specs(d: int):
    specs = []
    n = d
    while True:
        specs.append(P(None, None))
        if n == 1:
            break
        n //= 2
    return specs


def _phases(air: Air, log_n: int, config: StarkConfig, mesh, ax: str):
    # device IDENTITY is part of the key: under EP, same-shaped tables run
    # on different device groups, and a shape-only key would hand table B
    # phase functions bound to table A's devices
    key = (
        air.cache_key(),
        log_n,
        config,
        tuple(mesh.shape.items()),
        ax,
        tuple(dev.id for dev in mesh.devices.flatten()),
    )
    hit = _PHASE_CACHE.get(key)
    if hit is not None:
        return hit
    d = mesh.shape[ax]
    n = 1 << log_n
    blowup = config.blowup
    n_lde = n << config.log_blowup
    s = n_lde // d
    assert n_lde % d == 0 and s >= blowup, (
        "LDE rows must divide evenly over the mesh axis with a block no "
        "smaller than the blowup halo"
    )
    width = air.width
    pre_width = air.preprocessed_width
    tables = _domain_tables(log_n, config.log_blowup, config.shift)
    shift = config.shift

    # Materialize every lru-cached constant table EAGERLY (outside any
    # trace): a first call from inside a shard_map would cache tracers
    # (UnexpectedTracerError on the next single-chip use — same hazard
    # stark/fused.py documents for its fused build).
    from ..pcs.fri import _inv2x_table

    final_len = (1 << config.log_final_poly_len) * config.blowup
    size = n_lde
    shift_r = config.shift
    while size > final_len:
        _inv2x_table(shift_r, size.bit_length() - 1)
        shift_r = shift_r * shift_r % bb.P
        size //= 2

    counter: dict = {}

    def commit_kernel(mat_l, w_true):
        lde_l = coset_lde(bb.to_mont(mat_l), config.log_blowup, shift, axis=0)
        rows = jax.lax.all_to_all(
            lde_l, ax, split_axis=0, concat_axis=1, tiled=True
        )[:, :w_true]
        levels = build_levels(rows)
        top = _cap_root(levels, ax, d)
        return lde_l, rows, list(levels), list(top)

    def _commit_phase(w_true, wp):
        out_specs = (
            P(None, ax),
            P(ax, None),
            _levels_specs(s, ax),
            _top_specs(d),
        )

        @jax.jit
        def fn(mat_padded):
            return shard_map(
                partial(commit_kernel, w_true=w_true),
                mesh=mesh,
                in_specs=P(None, ax),
                out_specs=out_specs,
                check_rep=False,
            )(mat_padded)

        return fn

    wp_t = -(-width // d) * d
    wp_p = -(-max(pre_width, 1) // d) * d
    commit_t = _commit_phase(width, wp_t)
    commit_p = _commit_phase(pre_width, wp_p) if pre_width else None

    # ---- quotient ---------------------------------------------------------

    def quotient_kernel(rows_l, pre_l, alpha_mont, publics_mont):
        perm = [(p, (p - 1) % d) for p in range(d)]
        halo = jax.lax.ppermute(rows_l[:blowup], ax, perm)
        nxt = jnp.concatenate([rows_l[blowup:], halo], axis=0)
        if pre_width:
            pre_halo = jax.lax.ppermute(pre_l[:blowup], ax, perm)
            pre_nxt = jnp.concatenate([pre_l[blowup:], pre_halo], axis=0)
        else:
            pre_nxt = pre_l
        me = jax.lax.axis_index(ax)
        off = me * s
        tl = {
            k: jax.lax.dynamic_slice_in_dim(tables[k], off, s)
            for k in ("zh_inv", "sel_first", "sel_last", "sel_transition")
        }
        if getattr(air, "eval_tensor", None):
            builder = TensorBuilder(
                rows_l, nxt, pre_l, pre_nxt, publics_mont, tl, s
            )
            air.eval_tensor(builder)
            fold = builder.finalize(alpha_mont)
        else:
            cols = [rows_l[:, j] for j in range(width)]
            nexts = [nxt[:, j] for j in range(width)]
            pcols = [pre_l[:, j] for j in range(pre_width)] if pre_width else []
            pnexts = [pre_nxt[:, j] for j in range(pre_width)] if pre_width else []
            builder = ProverBuilder(
                cols, nexts, publics_mont, tl, alpha_mont, s, pcols, pnexts
            )
            air.eval(builder)
            fold = builder.finalize()
        counter["constraints"] = builder.count
        quotient_l = ext.mul_base(fold, tl["zh_inv"])  # (s, 4)

        # quotient is 4 columns wide: gather it (small) and run the chunk
        # pipeline replicated — every device derives the identical matrix
        q_full = jax.lax.all_gather(quotient_l, ax, axis=0, tiled=True)
        q_coeffs = _coset_evals_to_coeffs(q_full, shift)
        chunks = [q_coeffs[k * n : (k + 1) * n] for k in range(blowup)]
        chunk_evals = [
            _coeffs_to_coset_evals(c, config.log_blowup, shift) for c in chunks
        ]
        q_matrix = jnp.concatenate(chunk_evals, axis=1)  # (n_lde, 4b)
        q_col_coeffs = jnp.concatenate(chunks, axis=1)  # (n, 4b)
        me_off = me * s
        q_rows_l = jax.lax.dynamic_slice_in_dim(q_matrix, me_off, s, axis=0)
        q_levels = build_levels(q_rows_l)
        q_top = _cap_root(q_levels, ax, d)
        return q_rows_l, list(q_levels), list(q_top), q_col_coeffs

    @jax.jit
    def quotient_phase(rows, pre_rows, alpha_mont, publics_mont):
        return shard_map(
            quotient_kernel,
            mesh=mesh,
            in_specs=(P(ax, None), P(ax, None), P(None), P(None)),
            out_specs=(
                P(ax, None),
                _levels_specs(s, ax),
                _top_specs(d),
                P(None, None),
            ),
            check_rep=False,
        )(rows, pre_rows, alpha_mont, publics_mont)

    # ---- openings ---------------------------------------------------------

    def openings_kernel(lde_l, p_lde_l, q_col_coeffs, zeta_mont, gzeta_mont):
        pow_z = _ext_power_table(zeta_mont, n)
        pow_gz = _ext_power_table(gzeta_mont, n)
        t_coeffs_l = _coset_evals_to_coeffs(lde_l, shift)[:n]
        at_z_l = _fold_columns(t_coeffs_l.T, pow_z)  # (wp_t/d, 4)
        at_gz_l = _fold_columns(t_coeffs_l.T, pow_gz)
        t_zeta = jax.lax.all_gather(at_z_l, ax, axis=0, tiled=True)[:width]
        t_gzeta = jax.lax.all_gather(at_gz_l, ax, axis=0, tiled=True)[:width]
        out = {"t_zeta": t_zeta, "t_gzeta": t_gzeta}
        q_z = _fold_columns(q_col_coeffs.T, pow_z)  # replicated
        out["q_zeta"] = q_z
        if pre_width:
            p_coeffs_l = _coset_evals_to_coeffs(p_lde_l, shift)[:n]
            pz = _fold_columns(p_coeffs_l.T, pow_z)
            pgz = _fold_columns(p_coeffs_l.T, pow_gz)
            out["p_zeta"] = jax.lax.all_gather(pz, ax, axis=0, tiled=True)[
                :pre_width
            ]
            out["p_gzeta"] = jax.lax.all_gather(pgz, ax, axis=0, tiled=True)[
                :pre_width
            ]
        return out

    @jax.jit
    def openings_phase(lde_cols, p_lde_cols, q_col_coeffs, zeta_mont, gzeta_mont):
        return shard_map(
            openings_kernel,
            mesh=mesh,
            in_specs=(P(None, ax), P(None, ax), P(None), P(None), P(None)),
            out_specs=P(None, None),
            check_rep=False,
        )(lde_cols, p_lde_cols, q_col_coeffs, zeta_mont, gzeta_mont)

    # ---- DEEP codeword ----------------------------------------------------

    def deep_kernel(rows_l, p_rows_l, q_rows_l, opened, zeta_mont, gzeta_mont, gamma_mont):
        me = jax.lax.axis_index(ax)
        tl = {"x": jax.lax.dynamic_slice_in_dim(tables["x"], me * s, s)}
        return deep_body(
            air, rows_l, p_rows_l, q_rows_l, opened, zeta_mont, gzeta_mont,
            gamma_mont, tl, config,
        )

    @jax.jit
    def deep_phase(rows, p_rows, q_rows, opened, zeta_mont, gzeta_mont, gamma_mont):
        return shard_map(
            deep_kernel,
            mesh=mesh,
            in_specs=(
                P(ax, None), P(ax, None), P(ax, None),
                P(None), P(None), P(None), P(None),
            ),
            out_specs=P(ax, None),
            check_rep=False,
        )(rows, p_rows, q_rows, opened, zeta_mont, gzeta_mont, gamma_mont)

    fns = dict(
        commit_t=commit_t,
        commit_p=commit_p,
        quotient=quotient_phase,
        openings=openings_phase,
        deep=deep_phase,
        d=d,
        s=s,
        wp_t=wp_t,
        wp_p=wp_p,
        counter=counter,
    )
    _PHASE_CACHE[key] = fns
    return fns


# ---------------------------------------------------------------------------
# FRI rounds (jitted per round shape) and query gathers
# ---------------------------------------------------------------------------


def _fri_commit_jit(mesh, ax, d, r, shift_r, cur_log):
    g_next = max(1, (d >> r) // 2) if (d >> r) >= 1 else 1

    @jax.jit
    def fn(cw):
        def kernel(cw_l):
            v0, v1, pairs, levels, top, root = dist_fri_round(
                cw_l, r, ax, d, shift_r, cur_log
            )
            return v0, v1, pairs, list(levels), list(top), root

        s_pairs = cw.shape[0] // d if (d >> r) >= 2 else cw.shape[0] // (2 * d)
        # levels count from local pair rows
        nl = max(1, s_pairs).bit_length()
        return shard_map(
            kernel,
            mesh=mesh,
            in_specs=P(ax, None),
            out_specs=(
                P(ax, None), P(ax, None), P(ax, None),
                _levels_specs(max(1, s_pairs), ax),
                _top_specs(max(1, g_next)),
                P(None),
            ),
            check_rep=False,
        )(cw)

    return fn


def _fri_fold_jit(mesh, ax, d, r, shift_r, cur_log):
    @jax.jit
    def fn(v0, v1, beta_mont):
        def kernel(v0_l, v1_l, beta):
            return dist_fri_fold_half(v0_l, v1_l, r, ax, d, shift_r, cur_log, beta)

        return shard_map(
            kernel,
            mesh=mesh,
            in_specs=(P(ax, None), P(ax, None), P(None)),
            out_specs=P(ax, None),
            check_rep=False,
        )(v0, v1, beta_mont)

    return fn


def _gather_openings_jit(mesh, ax):
    @jax.jit
    def fn(rows, levels, top_levels, idxs):
        def kernel(rows_l, levels_l, top_l, idxs_l):
            s = rows_l.shape[0]
            me = jax.lax.axis_index(ax)
            block = (idxs_l // s).astype(jnp.uint32)
            lj = jnp.remainder(idxs_l, s).astype(jnp.int32)
            own = (me.astype(jnp.uint32) == block).astype(jnp.uint32)
            row = jnp.take(rows_l, lj, axis=0) * own[:, None]
            row = jax.lax.psum(row, ax)
            sibs = []
            cur = lj
            for level in levels_l[:-1]:
                sibs.append(jnp.take(level, cur ^ 1, axis=0))
                cur = cur >> 1
            if sibs:
                pl = jax.lax.psum(
                    jnp.stack(sibs, axis=1) * own[:, None, None], ax
                )  # (nq, depth_local, 8)
            else:
                pl = jnp.zeros((idxs_l.shape[0], 0, DIGEST_WIDTH), jnp.uint32)
            tops = []
            cur = block.astype(jnp.int32)
            for level in top_l[:-1]:
                tops.append(jnp.take(level, cur ^ 1, axis=0))
                cur = cur >> 1
            if tops:
                path = jnp.concatenate(
                    [pl, jnp.stack(tops, axis=1)], axis=1
                )
            else:
                path = pl
            return bb.from_mont(row), bb.from_mont(path)

        nspec = [P(ax, None)] * len(levels)
        tspec = [P(None, None)] * len(top_levels)
        return shard_map(
            kernel,
            mesh=mesh,
            in_specs=(P(ax, None), nspec, tspec, P(None)),
            out_specs=P(None, None),
            check_rep=False,
        )(rows, levels, top_levels, idxs)

    return fn


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def dist_precommit(
    air: Air,
    trace: np.ndarray,
    config: StarkConfig,
    mesh,
    axis_name: str = "sp",
) -> dict:
    """Dispatch the transcript-INDEPENDENT phases of ``dist_prove`` —
    preprocessed + trace LDE and Merkle commit — without blocking.

    This is the EP (table-parallel) hook: the commits of a container's
    tables have no Fiat–Shamir dependency, so ``ep_prove_tables`` dispatches
    them all up front on DIFFERENT device groups; JAX's async dispatch then
    overlaps table k+1's commit execution with table k's
    transcript-dependent phases.  The returned device values synchronize
    only when ``dist_prove`` fetches their roots."""
    trace = np.asarray(trace, dtype=np.uint32)
    n, width = trace.shape
    log_n = n.bit_length() - 1
    d = mesh.shape[axis_name]
    n_lde = n << config.log_blowup
    fns = _phases(air, log_n, config, mesh, axis_name)
    out = {
        "fns": fns,
        "p_lde_cols": jnp.zeros(
            (n_lde, fns["wp_p"] // d * d and fns["wp_p"]), jnp.uint32
        ),
        "p_rows": jnp.zeros((n_lde, 0), jnp.uint32),
        "p_levels": None,
        "p_top": None,
    }
    if air.preprocessed_width:
        pre = np.asarray(air.preprocessed_trace(n), dtype=np.uint32)
        (
            out["p_lde_cols"],
            out["p_rows"],
            out["p_levels"],
            out["p_top"],
        ) = fns["commit_p"](jnp.asarray(_pad_cols(pre, d)))
    out["t"] = fns["commit_t"](jnp.asarray(_pad_cols(trace, d)))
    return out


def dist_prove(
    air: Air,
    trace: np.ndarray,
    public_values: Sequence[int],
    config: StarkConfig,
    mesh,
    axis_name: str = "sp",
    challenger: DuplexChallenger | None = None,
    precommit: dict | None = None,
) -> dict:
    """Prove one AIR instance on the mesh; output == ``stark.prover.prove``.

    Host transcript + sharded device phases (module docstring).  Chain a
    ``challenger`` for multi-table proofs exactly as with the phase prover.
    """
    from ..ntt.ntt import np_ntt  # final-poly path (host, exact)

    trace = np.asarray(trace, dtype=np.uint32)
    n, width = trace.shape
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError("trace height must be a power of two")
    if width != air.width:
        raise ValueError("trace width does not match the AIR")
    publics = [int(v) % bb.P for v in public_values]
    if len(publics) != air.num_public_values:
        raise ValueError("wrong number of public values")
    d = mesh.shape[axis_name]
    pre_width = air.preprocessed_width
    n_lde = n << config.log_blowup
    if precommit is None:
        precommit = dist_precommit(air, trace, config, mesh, axis_name)
    fns = precommit["fns"]
    s = fns["s"]

    if challenger is None:
        challenger = DuplexChallenger()
    challenger.observe(log_n)
    challenger.observe(width)
    challenger.observe_many(publics)

    gather = _gather_openings_jit(mesh, axis_name)

    # 0.-1. preprocessed + trace LDE/commit: dispatched (possibly long ago,
    # concurrently with OTHER tables' phases — EP) by dist_precommit; the
    # root fetches below are the first synchronization points.
    p_lde_cols = precommit["p_lde_cols"]
    p_rows = precommit["p_rows"]
    p_levels = precommit["p_levels"]
    p_top = precommit["p_top"]
    root_p = None
    if pre_width:
        root_p = np.asarray(bb.from_mont(p_top[-1][0]))
        challenger.observe_many(root_p.tolist())

    t_lde_cols, t_rows, t_levels, t_top = precommit["t"]
    root_t = np.asarray(bb.from_mont(t_top[-1][0]))
    challenger.observe_many(root_t.tolist())
    alpha = challenger.sample_ext()
    alpha_mont = ext.to_array_mont([alpha])[0]
    publics_mont = bb.to_mont(jnp.asarray(np.array(publics or [0], dtype=np.uint32)))

    # 2.-3. quotient + chunk commit
    q_rows, q_levels, q_top, q_col_coeffs = fns["quotient"](
        t_rows, p_rows if pre_width else jnp.zeros((n_lde // d, 0), jnp.uint32),
        alpha_mont, publics_mont,
    )
    root_q = np.asarray(bb.from_mont(q_top[-1][0]))
    challenger.observe_many(root_q.tolist())
    zeta = challenger.sample_ext()
    zeta_mont = ext.to_array_mont([zeta])[0]
    g = bb.two_adic_generator(log_n)
    gzeta = ext.s_mul_base(zeta, g)
    gzeta_mont = ext.to_array_mont([gzeta])[0]

    # 4. openings at ζ, g·ζ
    opened = fns["openings"](
        t_lde_cols, p_lde_cols, q_col_coeffs, zeta_mont, gzeta_mont
    )
    opened_t_zeta = ext.from_array_mont(opened["t_zeta"])
    opened_t_gzeta = ext.from_array_mont(opened["t_gzeta"])
    opened_q_zeta = ext.from_array_mont(opened["q_zeta"])
    opened_p_zeta = (
        ext.from_array_mont(opened["p_zeta"]) if pre_width else []
    )
    opened_p_gzeta = (
        ext.from_array_mont(opened["p_gzeta"]) if pre_width else []
    )
    challenger.observe_many(
        opened_digest_std(
            opened_p_zeta, opened_p_gzeta, opened_t_zeta, opened_t_gzeta,
            opened_q_zeta,
        )
    )
    gamma = challenger.sample_ext()
    gamma_mont = ext.to_array_mont([gamma])[0]

    # 5. DEEP codeword (row-sharded)
    G_rows = fns["deep"](
        t_rows, p_rows if pre_width else jnp.zeros((n_lde // d, 0), jnp.uint32),
        q_rows, opened, zeta_mont, gzeta_mont, gamma_mont,
    )

    # 6. FRI commit/fold (distributed rounds, host transcript)
    final_len = (1 << config.log_final_poly_len) * config.blowup
    codeword = G_rows  # (n_lde/d, 4) sharded
    shift_r = config.shift
    size = n_lde
    r = 0
    fri_roots = []
    fri_rounds = []  # (pairs, levels, top, s_pairs)
    while size > final_len:
        cur_log = size.bit_length() - 1
        commit_fn = _fri_commit_jit(mesh, axis_name, d, r, shift_r, cur_log)
        v0, v1, pairs, levels, top, root = commit_fn(codeword)
        root_std = np.asarray(bb.from_mont(top[-1][0]))
        fri_roots.append([int(x) for x in root_std])
        challenger.observe_many(root_std.tolist())
        beta = challenger.sample_ext()
        beta_mont = ext.to_array_mont([beta])[0]
        fold_fn = _fri_fold_jit(mesh, axis_name, d, r, shift_r, cur_log)
        codeword = fold_fn(v0, v1, beta_mont)
        fri_rounds.append((pairs, levels, top, size // 2))
        shift_r = shift_r * shift_r % bb.P
        size //= 2
        r += 1

    # final polynomial: assemble the replicated/sharded remainder on host
    g_r = max(1, d >> r)
    cw_host = np.asarray(bb.from_mont(jnp.asarray(codeword)))  # (d*s_r or g blocks)
    s_r = size // g_r
    blocks = cw_host.reshape(d, -1, 4)[:g_r, :s_r]
    final_cw = blocks.reshape(size, 4).astype(np.uint64)
    coeffs = np_ntt(final_cw, inverse=True)
    s_inv = bb.s_inv(shift_r)
    acc = 1
    for i in range(size):
        coeffs[i] = coeffs[i] * np.uint64(acc) % np.uint64(bb.P)
        acc = acc * s_inv % bb.P
    keep = size >> config.log_blowup
    assert not np.any(coeffs[keep:]), "final codeword exceeds degree bound"
    final_coeffs = [tuple(int(x) for x in c) for c in coeffs[:keep]]
    for c in final_coeffs:
        challenger.observe_ext(c)
    pow_witness = challenger.grind(config.proof_of_work_bits)

    # 7. queries: indices from the transcript, openings via masked gathers
    log_n0 = n_lde.bit_length() - 1
    indices = [challenger.sample_bits(log_n0 - 1) for _ in range(config.num_queries)]
    idx_arr = jnp.asarray(np.array(indices, dtype=np.int64))
    half = n_lde // 2

    outer = {}
    tree_list = [("t", t_rows, t_levels, t_top), ("q", q_rows, q_levels, q_top)]
    if pre_width:
        tree_list.insert(0, ("p", p_rows, p_levels, p_top))
    for name, rows, levels, top in tree_list:
        lo_row, lo_path = gather(rows, levels, top, idx_arr)
        hi_row, hi_path = gather(rows, levels, top, idx_arr + half)
        outer[name] = {
            "lo_row": np.asarray(lo_row), "lo_path": np.asarray(lo_path),
            "hi_row": np.asarray(hi_row), "hi_path": np.asarray(hi_path),
        }

    from ..utils.packing import pack_u32

    fri_queries = [[] for _ in range(config.num_queries)]
    idx_np = np.array(indices, dtype=np.int64)
    for (pairs, levels, top, n_half) in fri_rounds:
        j = idx_np % n_half
        row, path = gather(pairs, levels, top, jnp.asarray(j))
        row = np.asarray(row)
        path = np.asarray(path)
        for qi in range(config.num_queries):
            fri_queries[qi].append(
                {"leaf": pack_u32(row[qi]), "path": pack_u32(path[qi])}
            )
        idx_np = j

    queries = [
        {"index": int(indices[qi]), "rounds": fri_queries[qi]}
        for qi in range(config.num_queries)
    ]

    proof = {
        "version": 1,
        "log_n": log_n,
        "width": width,
        "public_values": publics,
        "root_t": [int(v) for v in root_t],
        "root_q": [int(v) for v in root_q],
        "opened_t_zeta": pack_u32(np.asarray(opened_t_zeta, dtype=np.uint32)),
        "opened_t_gzeta": pack_u32(np.asarray(opened_t_gzeta, dtype=np.uint32)),
        "opened_q_zeta": pack_u32(np.asarray(opened_q_zeta, dtype=np.uint32)),
        "fri": {
            "roots": fri_roots,
            "final_coeffs": [list(c) for c in final_coeffs],
            "pow_witness": pow_witness,
            "queries": queries,
            "log_n": log_n0,
        },
        "query_openings": [
            {
                name: {
                    "lo": {
                        "row": pack_u32(outer[name]["lo_row"][qi]),
                        "path": pack_u32(outer[name]["lo_path"][qi]),
                    },
                    "hi": {
                        "row": pack_u32(outer[name]["hi_row"][qi]),
                        "path": pack_u32(outer[name]["hi_path"][qi]),
                    },
                }
                for name, *_ in tree_list
            }
            for qi in range(config.num_queries)
        ],
        "constraint_count": fns["counter"].get("constraints"),
    }
    if pre_width:
        proof["root_p"] = [int(v) for v in root_p]
        proof["opened_p_zeta"] = pack_u32(np.asarray(opened_p_zeta, dtype=np.uint32))
        proof["opened_p_gzeta"] = pack_u32(
            np.asarray(opened_p_gzeta, dtype=np.uint32)
        )
    return proof


def dist_prove_tables(entries, config: StarkConfig, mesh, axis_name: str = "sp"):
    """Multi-table chained proving on the mesh (``fused.prove_tables``
    semantics, phase-style transcript)."""
    challenger = DuplexChallenger()
    return [
        dist_prove(air, trace, publics, config, mesh, axis_name, challenger)
        for air, trace, publics in entries
    ]


def ep_prove_tables(entries, config: StarkConfig, mesh, axis_name: str = "sp"):
    """EP (table-parallel) multi-table proving: each table runs on its OWN
    device group, with every table's transcript-independent commit phase
    dispatched UP FRONT (``dist_precommit``) so the groups work
    concurrently — table k+1's LDE/Merkle executes while table k's
    quotient/DEEP/FRI phases run.  The Fiat–Shamir transcript (and hence
    every proof byte) is IDENTICAL to ``dist_prove_tables`` / the fused /
    phase / host provers: the challenger consumes the same roots in the
    same order; only the devices producing them differ (SURVEY §2.3 EP
    row).  Tables that cannot shard over their group (tiny traces) fall
    back to a 1-device group."""
    from jax.sharding import Mesh

    devices = list(mesh.devices.flatten())
    g = min(len(entries), len(devices))
    per = len(devices) // g
    groups = []
    for i, (air, trace, publics) in enumerate(entries):
        if g == 0:
            break
        devs = devices[(i % g) * per : (i % g) * per + per]
        n = np.asarray(trace).shape[0]
        n_lde = n << config.log_blowup
        # shrink the group until the LDE rows divide it with a full halo
        nd = len(devs)
        while nd > 1 and (n_lde % nd or n_lde // nd < config.blowup):
            nd -= 1
        groups.append(Mesh(np.array(devs[:nd]), (axis_name,)))
    # dispatch ALL commits first (no transcript dependency — EP overlap)
    pres = [
        dist_precommit(air, trace, config, groups[i], axis_name)
        for i, (air, trace, publics) in enumerate(entries)
    ]
    challenger = DuplexChallenger()
    return [
        dist_prove(
            air, trace, publics, config, groups[i], axis_name, challenger,
            precommit=pres[i],
        )
        for i, (air, trace, publics) in enumerate(entries)
    ]
