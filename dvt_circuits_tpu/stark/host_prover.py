"""Host (numpy) STARK prover — no accelerator, no XLA compile.

A third, device-free implementation of the EXACT prover transcript
(bit-identical proofs to ``stark.prover.prove`` and ``stark.fused`` —
asserted by tests).  Three jobs:

  * **CI/dev speed**: XLA CPU compiles of the jitted phase functions cost
    minutes per table shape; the numpy path proves tiny TEST_CONFIG
    tables in seconds, so a full pipeline prove/verify smoke fits the
    default test budget (VERDICT r3 item 8);
  * **cross-implementation oracle**: a numpy/ native-Poseidon2 prover and
    a JAX/TPU prover agreeing byte-for-byte is a strong determinism check
    (the reference relies on SP1's single implementation);
  * **host fallback** for environments without an accelerator.

Select in the pipeline with ``DVT_PROVER=host``.

Constraint evaluation runs the AIR's scalar ``eval`` with a numpy COLUMN
algebra: each builder value is a full (n_lde,) uint64 LDE column in
standard form — the AirBuilder contract is value-algebra-agnostic, so
every AIR works unchanged (including the 4.3k-column G1 chip, at CPU
speed).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..field import babybear as bb
from ..field import ext
from ..field import ext_np as enp
from ..ntt.ntt import np_coset_lde, np_ntt
from ..pcs.challenger import DuplexChallenger
from ..pcs.merkle import host_merkle_root
from ..utils.packing import pack_u32
from .air import Air, AirBuilder
from .config import StarkConfig

P = bb.P
P64 = np.uint64(P)


# ---------------------------------------------------------------------------
# numpy Merkle trees (native-batched Poseidon2, standard-form ints)
# ---------------------------------------------------------------------------


def _np_levels(matrix_std: np.ndarray):
    """Digest levels of a (n, w) standard-form matrix (bottom to root) —
    native-batched Poseidon2 with a scalar fallback (the
    ``merkle.host_merkle_root`` pattern, keeping all levels)."""
    from ..pcs.merkle import _s_compress, _s_hash_row
    from ..utils import native

    matrix = np.asarray(matrix_std, dtype=np.uint32)
    digests = native.hash_rows_np(matrix)
    if digests is None:
        digests = np.array(
            [_s_hash_row([int(v) for v in r]) for r in matrix], dtype=np.uint32
        )
    levels = [digests]
    while levels[-1].shape[0] > 1:
        pairs = levels[-1].reshape(-1, 16)
        nxt = native.compress_np(pairs)
        if nxt is None:
            nxt = np.array(
                [_s_compress(p[:8], p[8:]) for p in pairs], dtype=np.uint32
            )
        levels.append(nxt)
    return levels


class _NpTree:
    def __init__(self, matrix_std: np.ndarray):
        self.matrix = np.asarray(matrix_std, dtype=np.uint64)
        self.levels = _np_levels(self.matrix)

    @property
    def root(self):
        return [int(v) for v in self.levels[-1][0]]

    def open(self, index: int):
        row = self.matrix[index]
        path = []
        idx = index
        for level in self.levels[:-1]:
            path.append(level[idx ^ 1])
            idx >>= 1
        return row, path


# ---------------------------------------------------------------------------
# Column-algebra builder (standard-form uint64 columns)
# ---------------------------------------------------------------------------


class NpColumnBuilder(AirBuilder):
    """AirBuilder whose values are (n_lde,) uint64 columns mod P."""

    P = P

    def __init__(self, t, nxt, pre, pre_nxt, publics, sels, alpha):
        self._t = t
        self._n = nxt
        self._p = pre
        self._pn = pre_nxt
        self._pub = publics
        self._sels = sels
        self._alpha = np.asarray(alpha, dtype=np.uint64)
        self._alpha_pow = np.asarray((1, 0, 0, 0), dtype=np.uint64)
        self._acc = np.zeros((t.shape[0] if t.ndim == 2 else 1, 4), np.uint64)
        self.count = 0

    def _local(self, j):
        return self._t[:, j]

    def _next(self, j):
        return self._n[:, j]

    def _pre(self, j):
        return self._p[:, j]

    def _pre_next(self, j):
        return self._pn[:, j]

    def _public(self, i):
        return np.uint64(self._pub[i])

    def _const(self, c):
        return np.uint64(c % P)

    def _add(self, a, b):
        return (a + b) % P64

    def _sub(self, a, b):
        return (a + P64 - b) % P64

    def _mul(self, a, b):
        return a * b % P64

    def _sel_first(self):
        return self._sels["first"]

    def _sel_last(self):
        return self._sels["last"]

    def _sel_transition(self):
        return self._sels["transition"]

    def _accumulate(self, expr):
        expr = np.broadcast_to(np.asarray(expr, dtype=np.uint64), (self._acc.shape[0],))
        # acc += alpha_pow * expr (BB4 × base)
        self._acc = (self._acc + self._alpha_pow[None, :] * expr[:, None]) % P64
        self._alpha_pow = enp.mul(
            self._alpha_pow[None, :], self._alpha[None, :]
        )[0]
        self.count += 1


def _np_domain(log_n: int, log_blowup: int, shift: int):
    n = 1 << log_n
    n_lde = n << log_blowup
    w = bb.two_adic_generator(log_n + log_blowup)
    x = np.empty(n_lde, dtype=np.uint64)
    acc = shift % P
    for i in range(n_lde):
        x[i] = acc
        acc = acc * w % P
    s_n = pow(shift, n, P)
    w_b = bb.two_adic_generator(log_blowup) if log_blowup else 1
    zh_short = np.array(
        [(s_n * pow(w_b, i, P) - 1) % P for i in range(1 << log_blowup)],
        dtype=np.uint64,
    )
    zh = np.tile(zh_short, n)
    zh_inv = enp._pow_base(zh, P - 2)
    g_last = pow(bb.two_adic_generator(log_n), n - 1, P)
    denom_first = (x + P64 - 1) % P64
    sel_transition = (x + P64 - np.uint64(g_last)) % P64
    sel_first = zh * enp._pow_base(denom_first, P - 2) % P64
    sel_last = zh * enp._pow_base(sel_transition, P - 2) % P64
    return dict(
        x=x,
        zh_inv=zh_inv,
        first=sel_first,
        last=sel_last,
        transition=sel_transition,
    )


def _eval_cols_at_ext(coeffs: np.ndarray, pt) -> list:
    """(n, w) standard coeff columns evaluated at a BB4 point → list of
    BB4 tuples (vectorized Horner over rows)."""
    n, w = coeffs.shape
    pt_arr = np.asarray(pt, dtype=np.uint64)[None, :]
    vals = np.zeros((w, 4), dtype=np.uint64)
    for i in range(n - 1, -1, -1):
        vals = enp.mul(vals, np.broadcast_to(pt_arr, vals.shape))
        vals[:, 0] = (vals[:, 0] + coeffs[i]) % P64
    return [tuple(int(x) for x in row) for row in vals]


def host_prove(
    air: Air,
    trace: np.ndarray,
    public_values: Sequence[int],
    config: StarkConfig,
    challenger: DuplexChallenger | None = None,
) -> dict:
    """Prove one AIR instance on the host; output == ``stark.prover.prove``."""
    trace = np.asarray(trace, dtype=np.uint64)
    n, width = trace.shape
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError("trace height must be a power of two")
    if width != air.width:
        raise ValueError("trace width does not match the AIR")
    publics = [int(v) % P for v in public_values]
    if len(publics) != air.num_public_values:
        raise ValueError("wrong number of public values")
    pre_width = air.preprocessed_width
    log_blowup = config.log_blowup
    blowup = config.blowup
    n_lde = n << log_blowup
    shift = config.shift

    if challenger is None:
        challenger = DuplexChallenger()
    challenger.observe(log_n)
    challenger.observe(width)
    challenger.observe_many(publics)

    tree_p = None
    p_lde = np.zeros((n_lde, 0), dtype=np.uint64)
    if pre_width:
        pre = np.asarray(air.preprocessed_trace(n), dtype=np.uint64)
        p_lde = np_coset_lde(pre, log_blowup, shift)
        tree_p = _NpTree(p_lde)
        challenger.observe_many(tree_p.root)

    t_lde = np_coset_lde(trace, log_blowup, shift)
    tree_t = _NpTree(t_lde)
    challenger.observe_many(tree_t.root)
    alpha = challenger.sample_ext()

    # quotient via the scalar eval over numpy columns
    dom = _np_domain(log_n, log_blowup, shift)
    roll = 1 << log_blowup
    nxt = np.roll(t_lde, -roll, axis=0)
    pre_nxt = np.roll(p_lde, -roll, axis=0) if pre_width else p_lde
    builder = NpColumnBuilder(
        t_lde, nxt, p_lde, pre_nxt, publics, dom, alpha
    )
    air.eval(builder)
    quotient = enp.mul_base(builder._acc, dom["zh_inv"])  # (n_lde, 4)

    # quotient chunks: iNTT (coset) → split → per-chunk coset NTT
    def coset_intt(evals):
        coeffs = np_ntt(evals, inverse=True)
        s_inv = bb.s_inv(shift)
        accp = 1
        for i in range(coeffs.shape[0]):
            coeffs[i] = coeffs[i] * np.uint64(accp) % P64
            accp = accp * s_inv % P
        return coeffs

    q_coeffs = coset_intt(quotient)
    chunks = [q_coeffs[k * n : (k + 1) * n] for k in range(blowup)]
    chunk_evals = [np_coset_lde_coeffs(c, log_blowup, shift) for c in chunks]
    q_matrix = np.concatenate(chunk_evals, axis=1)
    q_col_coeffs = np.concatenate(chunks, axis=1)
    tree_q = _NpTree(q_matrix)
    challenger.observe_many(tree_q.root)
    zeta = challenger.sample_ext()
    g = bb.two_adic_generator(log_n)
    gzeta = ext.s_mul_base(zeta, g)

    t_coeffs = coset_intt(t_lde)[:n]
    opened_t_zeta = _eval_cols_at_ext(t_coeffs, zeta)
    opened_t_gzeta = _eval_cols_at_ext(t_coeffs, gzeta)
    opened_q_zeta = _eval_cols_at_ext(q_col_coeffs, zeta)
    if pre_width:
        p_coeffs = coset_intt(p_lde)[:n]
        opened_p_zeta = _eval_cols_at_ext(p_coeffs, zeta)
        opened_p_gzeta = _eval_cols_at_ext(p_coeffs, gzeta)
    else:
        opened_p_zeta = []
        opened_p_gzeta = []

    from .prover import opened_digest_std

    challenger.observe_many(
        opened_digest_std(
            opened_p_zeta, opened_p_gzeta, opened_t_zeta, opened_t_gzeta,
            opened_q_zeta,
        )
    )
    gamma = challenger.sample_ext()

    # DEEP codeword: γ-power order p@ζ, p@gζ, t@ζ, t@gζ, q@ζ
    total = 2 * pre_width + 2 * width + 4 * blowup
    gp = np.empty((total, 4), dtype=np.uint64)
    gp[0] = (1, 0, 0, 0)
    gam = np.asarray(gamma, dtype=np.uint64)
    for i in range(1, total):
        gp[i] = enp.mul(gp[i - 1][None], gam[None])[0]

    x4 = enp.from_base(dom["x"])
    inv_z = enp.inv(enp.sub(x4, np.asarray(zeta, np.uint64)[None, :]))
    inv_gz = enp.inv(enp.sub(x4, np.asarray(gzeta, np.uint64)[None, :]))

    def fold_group(mats, opened_lists, offs, inv_den):
        num = np.zeros((n_lde, 4), dtype=np.uint64)
        o_fold = np.zeros(4, dtype=np.uint64)
        for mat, opened, off in zip(mats, opened_lists, offs):
            m = mat.shape[1]
            coeff = gp[off : off + m]  # (m, 4)
            for c in range(4):
                # (mat·coeff) mod P per term BEFORE summing: entries < 2^31,
                # so partial sums of ≤ m < 2^20 terms stay inside uint64
                prods = mat * coeff[None, :, c] % P64
                num[:, c] = (num[:, c] + prods.sum(axis=1)) % P64
            o = np.asarray(opened, dtype=np.uint64).reshape(-1, 4)
            o_fold = (o_fold + enp.mul(coeff, o).sum(axis=0)) % P64
        num = enp.sub(num, np.broadcast_to(o_fold[None], num.shape))
        return enp.mul(num, inv_den)

    z_mats = ([p_lde] if pre_width else []) + [t_lde, q_matrix]
    z_opened = ([opened_p_zeta] if pre_width else []) + [
        opened_t_zeta,
        opened_q_zeta,
    ]
    z_offs = ([0] if pre_width else []) + [
        2 * pre_width,
        2 * pre_width + 2 * width,
    ]
    gz_mats = ([p_lde] if pre_width else []) + [t_lde]
    gz_opened = ([opened_p_gzeta] if pre_width else []) + [opened_t_gzeta]
    gz_offs = ([pre_width] if pre_width else []) + [2 * pre_width + width]
    G = (
        fold_group(z_mats, z_opened, z_offs, inv_z)
        + fold_group(gz_mats, gz_opened, gz_offs, inv_gz)
    ) % P64

    fri_proof = _np_fri_prove(G, shift, config, challenger)

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
        "root_t": tree_t.root,
        "root_q": tree_q.root,
        "opened_t_zeta": pack_u32(np.asarray(opened_t_zeta, dtype=np.uint32)),
        "opened_t_gzeta": pack_u32(np.asarray(opened_t_gzeta, dtype=np.uint32)),
        "opened_q_zeta": pack_u32(np.asarray(opened_q_zeta, dtype=np.uint32)),
        "fri": fri_proof,
        "query_openings": openings,
        "constraint_count": builder.count,
    }
    if pre_width:
        proof["root_p"] = tree_p.root
        proof["opened_p_zeta"] = pack_u32(
            np.asarray(opened_p_zeta, dtype=np.uint32)
        )
        proof["opened_p_gzeta"] = pack_u32(
            np.asarray(opened_p_gzeta, dtype=np.uint32)
        )
    return proof


def np_coset_lde_coeffs(coeffs: np.ndarray, log_blowup: int, shift: int):
    """Coefficient columns → evaluations over shift·K (np mirror of
    ``prover._coeffs_to_coset_evals``)."""
    n = coeffs.shape[0]
    out = coeffs.copy()
    accp = 1
    for i in range(n):
        out[i] = out[i] * np.uint64(accp) % P64
        accp = accp * shift % P
    pad = np.zeros((n * ((1 << log_blowup) - 1), coeffs.shape[1]), np.uint64)
    return np_ntt(np.concatenate([out, pad], axis=0))


def _np_fri_prove(codeword, shift, config: StarkConfig, challenger):
    """numpy mirror of ``pcs.fri.fri_prove`` (bit-identical transcript)."""
    fri = config.fri
    n = codeword.shape[0]
    log_n = n.bit_length() - 1
    final_len = (1 << fri.log_final_poly_len) * fri.blowup

    half_inv = np.uint64((P + 1) // 2)
    trees = []
    shifts = [shift % P]
    roots = []
    cw = codeword
    while cw.shape[0] > final_len:
        m = cw.shape[0]
        pairs = np.concatenate([cw[: m // 2], cw[m // 2 :]], axis=1)
        tree = _NpTree(pairs)
        trees.append(tree)
        roots.append(tree.root)
        challenger.observe_many(tree.root)
        beta = challenger.sample_ext()
        cur_log = m.bit_length() - 1
        w = bb.two_adic_generator(cur_log)
        x = np.empty(m // 2, dtype=np.uint64)
        accp = shifts[-1]
        for j in range(m // 2):
            x[j] = accp
            accp = accp * w % P
        x_inv = enp._pow_base(x, P - 2)
        v0, v1 = cw[: m // 2], cw[m // 2 :]
        even = enp.mul_base(enp.add(v0, v1), np.full(m // 2, half_inv, np.uint64))
        odd = enp.mul_base(
            enp.sub(v0, v1), half_inv * x_inv % P64
        )
        beta_arr = np.asarray(beta, dtype=np.uint64)[None, :]
        cw = enp.add(even, enp.mul(np.broadcast_to(beta_arr, odd.shape), odd))
        shifts.append(shifts[-1] * shifts[-1] % P)

    fin_n = cw.shape[0]
    coeffs = np_ntt(cw, inverse=True)
    s_inv = bb.s_inv(shifts[-1])
    accp = 1
    for i in range(fin_n):
        coeffs[i] = coeffs[i] * np.uint64(accp) % P64
        accp = accp * s_inv % P
    keep = fin_n >> fri.log_blowup
    assert not np.any(coeffs[keep:]), "final codeword exceeds degree bound"
    final_coeffs = [tuple(int(x) for x in c) for c in coeffs[:keep]]
    for c in final_coeffs:
        challenger.observe_ext(c)
    pow_witness = challenger.grind(fri.proof_of_work_bits)

    queries = []
    for _ in range(fri.num_queries):
        leaf_index = challenger.sample_bits(log_n - 1)
        rounds = []
        idx = leaf_index
        for tree in trees:
            n_half = tree.matrix.shape[0]
            j = idx % n_half
            row, path = tree.open(j)
            rounds.append(
                {"leaf": pack_u32(row), "path": pack_u32(np.asarray(path))}
            )
            idx = j
        queries.append({"index": leaf_index, "rounds": rounds})

    return {
        "roots": roots,
        "final_coeffs": [list(c) for c in final_coeffs],
        "pow_witness": pow_witness,
        "queries": queries,
        "log_n": log_n,
    }


def host_prove_tables(entries, config: StarkConfig):
    """Multi-table chained proving on the host (``fused.prove_tables``
    semantics)."""
    challenger = DuplexChallenger()
    return (
        [
            host_prove(air, trace, publics, config, challenger)
            for air, trace, publics in entries
        ],
        None,
    )
