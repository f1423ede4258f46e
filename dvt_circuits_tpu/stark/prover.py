"""Uni-STARK prover (DEEP-ALI + batched FRI), TPU-batched.

Pipeline (the TPU-native re-creation of SP1's `client.prove` inner stack,
SURVEY.md §3.1 hot loops):

  trace → column LDEs (NTT) → Merkle commit → α-folded constraint quotient
  → chunked quotient commit → DEEP openings at ζ, g·ζ → γ-batched DEEP
  codeword → FRI commit/fold/query.

The device work is organized into a handful of jitted *phase functions*
(LDE, quotient+chunks, openings, DEEP codeword), cached per
(AIR, trace-size, config) — a proof in a warm process is a few device
dispatches plus the host-side transcript; nothing inside a phase round-trips
to Python.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..field import ext
from ..ntt import coset_lde, intt, ntt
from ..pcs.challenger import DuplexChallenger
from ..pcs.fri import fri_prove
from ..pcs.merkle import MerkleTree
from .air import Air, AirBuilder
from .config import StarkConfig


# ---------------------------------------------------------------------------
# Domain helpers
# ---------------------------------------------------------------------------


def power_series(base: int, n: int, start: int = 1):
    """Device array [start, start·b, start·b², …] of length n (Montgomery)."""
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    arr = jnp.asarray(np.array([bb.s_to_mont(start % bb.P)], dtype=np.uint32))
    b_pow = base % bb.P
    for _ in range(log_n):
        scaled = bb.mont_mul(arr, jnp.full((), np.uint32(bb.s_to_mont(b_pow)), jnp.uint32))
        arr = jnp.concatenate([arr, scaled])
        b_pow = b_pow * b_pow % bb.P
    return arr


@lru_cache(maxsize=None)
def _domain_tables(log_n: int, log_blowup: int, shift: int):
    """Precomputed LDE-domain tables (Montgomery): x, Z_H, selectors."""
    n = 1 << log_n
    w_k = bb.two_adic_generator(log_n + log_blowup)
    x = power_series(w_k, n << log_blowup, start=shift)  # x_i = shift·ω_K^i
    # Z_H(x_i) = shift^N·ω_b^i − 1, period `blowup` in i
    w_b = bb.two_adic_generator(log_blowup) if log_blowup else 1
    s_n = pow(shift, n, bb.P)
    zh_short = np.array(
        [(s_n * pow(w_b, i, bb.P) - 1) % bb.P for i in range(1 << log_blowup)],
        dtype=np.uint64,
    )
    zh = jnp.asarray(np.tile(bb.np_to_mont(zh_short), n))
    zh_inv = bb.mont_inv(zh)

    g_last = pow(bb.two_adic_generator(log_n), n - 1, bb.P)
    one_m = jnp.full((), np.uint32(bb.MONT_ONE), jnp.uint32)
    glast_m = jnp.full((), np.uint32(bb.s_to_mont(g_last)), jnp.uint32)
    denom_first = bb.sub(x, one_m)
    sel_transition = bb.sub(x, glast_m)
    sel_first = bb.mont_mul(zh, bb.mont_inv(denom_first))
    sel_last = bb.mont_mul(zh, bb.mont_inv(sel_transition))
    return dict(
        x=x,
        zh=zh,
        zh_inv=zh_inv,
        sel_first=sel_first,
        sel_last=sel_last,
        sel_transition=sel_transition,
        g_last=g_last,
    )


class ProverBuilder(AirBuilder):
    """Constraint evaluation over full LDE columns; α-fold in BB4."""

    P = bb.P

    def __init__(self, lde_cols, next_cols, publics_mont, sels, alpha_mont, n_lde,
                 pre_cols=(), pre_next_cols=()):
        self._cols = lde_cols
        self._nexts = next_cols
        self._pres = pre_cols
        self._pre_nexts = pre_next_cols
        self._publics = publics_mont  # traced (np,) Montgomery array
        self._sels = sels
        self._alpha = alpha_mont
        self._exprs = []
        self._n_lde = n_lde
        self.count = 0

    def _local(self, j):
        return self._cols[j]

    def _next(self, j):
        return self._nexts[j]

    def _pre(self, j):
        return self._pres[j]

    def _pre_next(self, j):
        return self._pre_nexts[j]

    def _public(self, i):
        return self._publics[i]

    def _const(self, c):
        return jnp.full((), np.uint32(bb.s_to_mont(c)), jnp.uint32)

    def _add(self, a, b):
        return bb.add(a, b)

    def _sub(self, a, b):
        return bb.sub(a, b)

    def _mul(self, a, b):
        return bb.mont_mul(a, b)

    def _sel_first(self):
        return self._sels["sel_first"]

    def _sel_last(self):
        return self._sels["sel_last"]

    def _sel_transition(self):
        return self._sels["sel_transition"]

    def _accumulate(self, expr):
        # collect base-field constraint arrays; the α-fold Σ αⁱ·cᵢ happens
        # once at the end as a stacked modular matvec (keeps the traced
        # graph linear in #constraints, not quadratic)
        self._exprs.append(jnp.broadcast_to(expr, (self._n_lde,)))
        self.count += 1

    def finalize(self):
        """Σ αⁱ·cᵢ over all collected constraints → (n_lde, 4) BB4 array."""
        k = len(self._exprs)
        alpha_pows = _ext_power_table(self._alpha, k)  # (k, 4)
        stack = jnp.stack(self._exprs, axis=1)  # (n_lde, k)
        return _fold_columns(stack, alpha_pows)


class TensorBuilder:
    """Fast-path constraint builder: AIRs with lane-structured constraints
    (``Air.eval_tensor``) emit whole (n_lde, m) residual tensors; the m lane
    constraints take consecutive α powers in emission order, which must match
    the scalar ``eval`` enumeration (cross-checked by tests)."""

    def __init__(self, t_lde, nxt, pre, pre_nxt, publics_mont, sels, n_lde):
        self.local = t_lde  # (n_lde, w) Montgomery
        self.next = nxt
        self.pre = pre
        self.pre_next = pre_nxt
        self.publics = publics_mont  # (np,) Montgomery
        self.sel_first = sels["sel_first"]
        self.sel_last = sels["sel_last"]
        self.sel_transition = sels["sel_transition"]
        self._n_lde = n_lde
        self._groups = []
        self.count = 0

    def assert_group(self, tensor):
        if tensor.ndim == 1:
            tensor = tensor[:, None]
        self._groups.append(jnp.broadcast_to(tensor, (self._n_lde, tensor.shape[1])))
        self.count += tensor.shape[1]

    def finalize(self, alpha_mont):
        stack = jnp.concatenate(self._groups, axis=1)  # (n_lde, k)
        alpha_pows = _ext_power_table(alpha_mont, stack.shape[1])
        return _fold_columns(stack, alpha_pows)


def _coeffs_to_coset_evals(coeffs, log_blowup: int, shift: int):
    """Coefficient array (N, …) → evaluations over shift·K (N·2^b, …)."""
    n = coeffs.shape[0]
    pw = power_series(shift, n)
    coeffs = bb.mont_mul(coeffs, pw[:, None] if coeffs.ndim == 2 else pw)
    pad = [(0, n * ((1 << log_blowup) - 1))] + [(0, 0)] * (coeffs.ndim - 1)
    return ntt(jnp.pad(coeffs, pad), axis=0)


def _coset_evals_to_coeffs(evals, shift: int):
    """Evaluations over shift·K → coefficient array (same length)."""
    n = evals.shape[0]
    coeffs = intt(evals, axis=0)
    pw = power_series(bb.s_inv(shift), n)
    return bb.mont_mul(coeffs, pw[:, None] if coeffs.ndim == 2 else pw)


def _eval_poly_at_ext(coeffs_mont, zeta_mont):
    """Evaluate BabyBear coeff columns (N, w) at a BB4 point → (w, 4).

    Powers-of-ζ inner product; the power table is built by log-doubling.
    """
    n, w = coeffs_mont.shape
    log_n = n.bit_length() - 1
    powers = ext.ones((1,))
    z = zeta_mont[None, :]
    for _ in range(log_n):
        shifted = ext.mul(powers, jnp.broadcast_to(z, powers.shape))
        powers = jnp.concatenate([powers, shifted], axis=0)
        z = ext.mul(z, z)
    prods = ext.mul_base(powers[:, None, :], coeffs_mont)  # (n, w, 4)
    return _tree_sum(prods, axis=0)


def _tree_sum(arr, axis):
    # modular tree reduction along `axis`
    n = arr.shape[axis]
    while n > 1:
        half = n // 2
        a = jax.lax.slice_in_dim(arr, 0, half, axis=axis)
        b = jax.lax.slice_in_dim(arr, half, 2 * half, axis=axis)
        rest = jax.lax.slice_in_dim(arr, 2 * half, n, axis=axis)
        arr = jnp.concatenate([bb.add(a, b), rest], axis=axis)
        n = arr.shape[axis]
    return jnp.squeeze(arr, axis=axis)


def _ext_power_table(x_mont, k: int):
    """[x⁰, x¹, …, x^{k-1}] as a (k, 4) Montgomery array (log-doubling)."""
    powers = ext.ones((1,))
    z = x_mont[None, :]
    while powers.shape[0] < k:
        shifted = ext.mul(powers, jnp.broadcast_to(z, powers.shape))
        powers = jnp.concatenate([powers, shifted], axis=0)
        z = ext.mul(z, z)
    return powers[:k]


def _fold_columns(stack, coeffs_ext):
    """Σᵢ coeffsᵢ·stack[:,i] for base-field columns and BB4 coefficients.

    stack: (n, k) Montgomery BabyBear; coeffs_ext: (k, 4) Montgomery BB4.
    Returns (n, 4).  One vectorized multiply + tree-sum per ext coordinate.
    """
    coords = []
    for c in range(ext.D):
        prods = bb.mont_mul(stack, coeffs_ext[None, :, c])  # (n, k)
        coords.append(_tree_sum(prods, axis=1))
    return jnp.stack(coords, axis=-1)


def _ext_dot(a_ext, b_ext):
    """Σᵢ aᵢ·bᵢ over (m, 4) BB4 arrays → (4,)."""
    prods = ext.mul(a_ext, b_ext)  # (m, 4)
    return _tree_sum(prods, axis=0)


# ---------------------------------------------------------------------------
# Phase bodies (module-level, traced by both the per-phase jits below and the
# single-dispatch fused prover in stark/fused.py)
# ---------------------------------------------------------------------------


def lde_body(mat_std, config: StarkConfig):
    """standard-form matrix → coset LDE (Montgomery)."""
    return coset_lde(bb.to_mont(mat_std), config.log_blowup, config.shift, axis=0)


def quotient_body(
    air: Air,
    t_lde,
    p_lde,
    alpha_mont,
    publics_mont,
    tables,
    log_n: int,
    config: StarkConfig,
    counter: dict | None = None,
):
    """Constraint quotient + chunked commitment matrix for one AIR table."""
    n = 1 << log_n
    width = air.width
    pre_width = air.preprocessed_width
    log_blowup = config.log_blowup
    blowup = config.blowup
    n_lde = n << log_blowup
    shift = config.shift
    if getattr(air, "eval_tensor", None):
        nxt = jnp.roll(t_lde, -(1 << log_blowup), axis=0)
        pre_nxt = (
            jnp.roll(p_lde, -(1 << log_blowup), axis=0) if pre_width else p_lde
        )
        builder = TensorBuilder(
            t_lde, nxt, p_lde, pre_nxt, publics_mont, tables, n_lde
        )
        air.eval_tensor(builder)
    else:
        cols = [t_lde[:, j] for j in range(width)]
        nexts = [jnp.roll(c, -(1 << log_blowup)) for c in cols]
        pre_cols = [p_lde[:, j] for j in range(pre_width)] if pre_width else []
        pre_nexts = [jnp.roll(c, -(1 << log_blowup)) for c in pre_cols]
        builder = ProverBuilder(
            cols, nexts, publics_mont, tables, alpha_mont, n_lde, pre_cols, pre_nexts
        )
        air.eval(builder)
    if counter is not None:
        counter["constraints"] = builder.count
    quotient = ext.mul_base(
        builder.finalize(alpha_mont) if isinstance(builder, TensorBuilder) else builder.finalize(),
        tables["zh_inv"],
    )  # (n_lde, 4)
    q_coeffs = _coset_evals_to_coeffs(quotient, shift)
    chunks = [q_coeffs[k * n : (k + 1) * n] for k in range(blowup)]
    chunk_evals = [_coeffs_to_coset_evals(c, log_blowup, shift) for c in chunks]
    q_matrix = jnp.concatenate(chunk_evals, axis=1)  # (n_lde, 4·blowup)
    q_col_coeffs = jnp.concatenate(chunks, axis=1)  # (n, 4·blowup)
    return q_matrix, q_col_coeffs


def openings_body(
    air: Air, t_lde, p_lde, q_col_coeffs, zeta_mont, gzeta_mont, log_n: int, config: StarkConfig
):
    """DEEP openings of trace/quotient/preprocessed columns at ζ and g·ζ."""
    n = 1 << log_n
    width = air.width
    pre_width = air.preprocessed_width
    blowup = config.blowup
    shift = config.shift
    t_coeffs = _coset_evals_to_coeffs(t_lde, shift)[:n]
    cols = [t_coeffs, q_col_coeffs]
    if pre_width:
        p_coeffs = _coset_evals_to_coeffs(p_lde, shift)[:n]
        cols.append(p_coeffs)
    all_coeffs = jnp.concatenate(cols, axis=1)  # (n, w + 4b [+ pw])
    # p_j(pt) = Σ_i c_{i,j}·ptⁱ — one powers table per point, one fold
    pow_z = _ext_power_table(zeta_mont, n)
    pow_gz = _ext_power_table(gzeta_mont, n)
    at_z = _fold_columns(all_coeffs.T, pow_z)  # (w_total, 4)
    at_gz = _fold_columns(all_coeffs.T, pow_gz)
    out = {
        "t_zeta": at_z[:width],
        "t_gzeta": at_gz[:width],
        "q_zeta": at_z[width : width + 4 * blowup],
    }
    if pre_width:
        out["p_zeta"] = at_z[width + 4 * blowup :]
        out["p_gzeta"] = at_gz[width + 4 * blowup :]
    return out


def deep_body(
    air, t_lde, p_lde, q_matrix, opened, zeta_mont, gzeta_mont, gamma_mont, tables, config
):
    """G = Σᵢ γⁱ(colᵢ − oᵢ)/(x − ptᵢ), grouped by opening point.

    γ-power order (must match the verifier): p@ζ, p@gζ, t@ζ, t@gζ, q@ζ —
    each segment is one contiguous MATRIX fold (Σγⁱcolᵢ via one stacked
    modular matvec, Σγⁱoᵢ via one ext dot).  Folding whole matrices keeps
    the traced graph O(#matrices), not O(#columns) — a per-column Python
    enumeration made XLA compile time explode for the 26k-column G1 chip."""
    width = air.width
    pre_width = air.preprocessed_width
    blowup = config.blowup
    x_ext = ext.from_base(tables["x"])
    inv_z = ext.inv(ext.sub(x_ext, jnp.broadcast_to(zeta_mont, x_ext.shape)))
    inv_gz = ext.inv(ext.sub(x_ext, jnp.broadcast_to(gzeta_mont, x_ext.shape)))

    total = 2 * pre_width + 2 * width + 4 * blowup
    gamma_pows = _ext_power_table(gamma_mont, total)

    def to_arr(vals):
        # opened values arrive as a (m, 4) device array (fused path) or a
        # list of BB4 tuples (phase path)
        if isinstance(vals, (list, tuple)):
            import numpy as _np

            return bb.to_mont(jnp.asarray(_np.array(vals, dtype=_np.uint32)))
        return vals

    def group(parts, inv_den):
        """parts: (matrix, opened (m,4) mont, γ-power offset)."""
        fc = None
        fo = None
        for mat, opened_arr, off in parts:
            m = mat.shape[1]
            coeffs = gamma_pows[off : off + m]
            c_fold = _fold_columns(mat, coeffs)
            o_fold = _ext_dot(coeffs, to_arr(opened_arr))
            fc = c_fold if fc is None else ext.add(fc, c_fold)
            fo = o_fold if fo is None else ext.add(fo, o_fold)
        num = ext.sub(fc, jnp.broadcast_to(fo, fc.shape))
        return ext.mul(num, inv_den)

    z_parts = []
    gz_parts = []
    if pre_width:
        z_parts.append((p_lde, opened["p_zeta"], 0))
        gz_parts.append((p_lde, opened["p_gzeta"], pre_width))
    z_parts.append((t_lde, opened["t_zeta"], 2 * pre_width))
    gz_parts.append((t_lde, opened["t_gzeta"], 2 * pre_width + width))
    z_parts.append((q_matrix, opened["q_zeta"], 2 * pre_width + 2 * width))

    return ext.add(group(z_parts, inv_z), group(gz_parts, inv_gz))


# ---------------------------------------------------------------------------
# Jitted phase functions, cached per (air, log_n, config)
# ---------------------------------------------------------------------------

def opened_digest_std(p_zeta, p_gzeta, t_zeta, t_gzeta, q_zeta) -> list:
    """Merkle digest (8 words) of a table's opened values.

    The transcript absorbs this digest instead of every opened value: for
    wide tables (the 26k-column G1 chip) absorbing 200k+ words costs tens
    of thousands of SEQUENTIAL sponge permutations — inside the fused
    prover that is tens of thousands of traced ops.  A batched Merkle root
    over the (m, 4) opened-value matrix is log-depth on device and one
    native-batched host call for the verifier.  Row order: p@ζ, p@gζ,
    t@ζ, t@gζ, q@ζ (the γ-power order), zero-padded to a power of two."""
    from ..pcs.merkle import host_merkle_root

    rows = [list(v) for group in (p_zeta, p_gzeta, t_zeta, t_gzeta, q_zeta) for v in group]
    m = len(rows)
    target = 1 << max(0, m - 1).bit_length()
    rows += [[0, 0, 0, 0]] * (target - m)
    return host_merkle_root(np.asarray(rows, dtype=np.uint32))


_PHASE_CACHE: dict = {}


def _phases(air: Air, log_n: int, config: StarkConfig):
    key = (air.cache_key(), log_n, config)
    hit = _PHASE_CACHE.get(key)
    if hit is not None:
        return hit

    tables = _domain_tables(log_n, config.log_blowup, config.shift)
    counter = {}

    @jax.jit
    def lde_phase(mat_std):
        return lde_body(mat_std, config)

    @jax.jit
    def quotient_phase(t_lde, p_lde, alpha_mont, publics_mont):
        return quotient_body(
            air, t_lde, p_lde, alpha_mont, publics_mont, tables, log_n, config, counter
        )

    @jax.jit
    def openings_phase(t_lde, p_lde, q_col_coeffs, zeta_mont, gzeta_mont):
        return openings_body(
            air, t_lde, p_lde, q_col_coeffs, zeta_mont, gzeta_mont, log_n, config
        )

    @jax.jit
    def deep_phase(t_lde, p_lde, q_matrix, opened, zeta_mont, gzeta_mont, gamma_mont):
        return deep_body(
            air, t_lde, p_lde, q_matrix, opened, zeta_mont, gzeta_mont, gamma_mont, tables, config
        )

    fns = dict(
        lde=lde_phase,
        quotient=quotient_phase,
        openings=openings_phase,
        deep=deep_phase,
        counter=counter,
    )
    _PHASE_CACHE[key] = fns
    return fns


_EMPTY = jnp.zeros((0,), jnp.uint32)


def prove(
    air: Air,
    trace: np.ndarray,
    public_values: Sequence[int],
    config: StarkConfig,
    challenger: DuplexChallenger | None = None,
) -> dict:
    """Prove one AIR instance.  ``trace``: (N, width) standard-form uint32.

    Passing a ``challenger`` chains this proof onto an existing Fiat–Shamir
    transcript (multi-table proving: the challenges of table i+1 depend on
    every commitment of tables 0..i — SP1's multi-chip shard analogue).
    The matching verifier must replay the tables in the same order.

    ``DVT_PROVER=host`` reroutes to the pure-numpy host prover
    (bit-identical output, no XLA compile) — the seam the default test
    suite and accelerator-free environments use.
    """
    import os as _os

    if _os.environ.get("DVT_PROVER") == "host":
        from .host_prover import host_prove

        return host_prove(air, trace, public_values, config, challenger)
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
    pre_width = air.preprocessed_width
    n_lde = n << config.log_blowup
    fns = _phases(air, log_n, config)

    if challenger is None:
        challenger = DuplexChallenger()
    challenger.observe(log_n)
    challenger.observe(width)
    challenger.observe_many(publics)

    # 0. preprocessed (fixed) columns — part of the verifying key
    tree_p = None
    p_lde = _EMPTY
    if pre_width:
        pre = np.asarray(air.preprocessed_trace(n), dtype=np.uint32)
        assert pre.shape == (n, pre_width)
        p_lde = fns["lde"](jnp.asarray(pre))
        tree_p = MerkleTree(p_lde)
        root_p = tree_p.root
        challenger.observe_many(root_p.tolist())

    # 1. trace LDE + commit
    t_lde = fns["lde"](jnp.asarray(trace))
    tree_t = MerkleTree(t_lde)
    root_t = tree_t.root
    challenger.observe_many(root_t.tolist())
    alpha = challenger.sample_ext()
    alpha_mont = ext.to_array_mont([alpha])[0]
    publics_mont = bb.to_mont(
        jnp.asarray(np.array(publics or [0], dtype=np.uint32))
    )

    # 2.–3. constraint quotient + chunk commitments
    q_matrix, q_col_coeffs = fns["quotient"](t_lde, p_lde, alpha_mont, publics_mont)
    tree_q = MerkleTree(q_matrix)
    root_q = tree_q.root
    challenger.observe_many(root_q.tolist())
    zeta = challenger.sample_ext()
    zeta_mont = ext.to_array_mont([zeta])[0]
    g = bb.two_adic_generator(log_n)
    gzeta = ext.s_mul_base(zeta, g)
    gzeta_mont = ext.to_array_mont([gzeta])[0]

    # 4. openings at ζ and g·ζ
    opened = fns["openings"](t_lde, p_lde, q_col_coeffs, zeta_mont, gzeta_mont)
    opened_t_zeta = ext.from_array_mont(opened["t_zeta"])
    opened_t_gzeta = ext.from_array_mont(opened["t_gzeta"])
    opened_q_zeta = ext.from_array_mont(opened["q_zeta"])
    if pre_width:
        opened_p_zeta = ext.from_array_mont(opened["p_zeta"])
        opened_p_gzeta = ext.from_array_mont(opened["p_gzeta"])
    else:
        opened_p_zeta = []
        opened_p_gzeta = []

    challenger.observe_many(
        opened_digest_std(
            opened_p_zeta, opened_p_gzeta, opened_t_zeta, opened_t_gzeta, opened_q_zeta
        )
    )
    gamma = challenger.sample_ext()
    gamma_mont = ext.to_array_mont([gamma])[0]

    # 5. DEEP codeword G over the LDE domain
    G = fns["deep"](t_lde, p_lde, q_matrix, opened, zeta_mont, gzeta_mont, gamma_mont)

    # 6. FRI on G
    fri_proof = fri_prove(G, config.shift, config.fri, challenger)

    # 7. per-query outer openings (both halves of each round-0 leaf pair),
    # packed as 4-byte words (utils.packing — query openings dominate proof
    # size; packing cuts ~20% vs CBOR integer arrays)
    from ..utils.packing import pack_u32

    half = n_lde // 2
    openings = []
    trees = [("t", tree_t), ("q", tree_q)]
    if tree_p is not None:
        trees.insert(0, ("p", tree_p))
    for q in fri_proof["queries"]:
        li = int(q["index"])
        rows = {}
        for name, tree in trees:
            row0, path0 = tree.open(li)
            row1, path1 = tree.open(li + half)
            rows[name] = {
                "lo": {"row": pack_u32(row0), "path": pack_u32(np.asarray(path0))},
                "hi": {"row": pack_u32(row1), "path": pack_u32(np.asarray(path1))},
            }
        openings.append(rows)

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
        "fri": fri_proof,
        "query_openings": openings,
        "constraint_count": fns["counter"].get("constraints"),
    }
    if pre_width:
        proof["root_p"] = [int(v) for v in root_p]
        proof["opened_p_zeta"] = pack_u32(np.asarray(opened_p_zeta, dtype=np.uint32))
        proof["opened_p_gzeta"] = pack_u32(np.asarray(opened_p_gzeta, dtype=np.uint32))
    return proof


_PRE_COMMIT_CACHE: dict = {}


def preprocessed_commitment(air: Air, log_n: int, config: StarkConfig):
    """Verifying-key material: the Merkle root of the AIR's preprocessed
    columns at the given size (deterministic; cached per AIR/size/config).

    Computed entirely on the HOST (numpy NTT + native Poseidon2) so the
    verifier never dispatches to an accelerator; bit-identical to the
    prover's device commitment (tested)."""
    if not air.preprocessed_width:
        return None
    key = (air.cache_key(), log_n, config)
    hit = _PRE_COMMIT_CACHE.get(key)
    if hit is None:
        from ..ntt.ntt import np_coset_lde
        from ..pcs.merkle import host_merkle_root

        n = 1 << log_n
        pre = np.asarray(air.preprocessed_trace(n), dtype=np.uint64)
        p_lde = np_coset_lde(pre, config.log_blowup, config.shift)
        hit = _PRE_COMMIT_CACHE[key] = host_merkle_root(p_lde)
    return hit
