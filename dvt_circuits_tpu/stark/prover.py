"""Uni-STARK prover (DEEP-ALI + batched FRI), TPU-batched.

Pipeline (the TPU-native re-creation of SP1's `client.prove` inner stack,
SURVEY.md §3.1 hot loops):

  trace → column LDEs (NTT) → Merkle commit → α-folded constraint quotient
  → chunked quotient commit → DEEP openings at ζ, g·ζ → γ-batched DEEP
  codeword → FRI commit/fold/query.

Everything left of the query phase is batched JAX on device; transcript and
query assembly are host-side.
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
    n_lde = n << log_blowup
    w_k = bb.two_adic_generator(log_n + log_blowup)
    x = power_series(w_k, n_lde, start=shift)  # x_i = shift·ω_K^i
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

    def __init__(self, lde_cols, next_cols, publics, sels, alpha_mont, n_lde):
        self._cols = lde_cols
        self._nexts = next_cols
        self._publics = publics
        self._sels = sels
        self._alpha = alpha_mont
        self._acc = ext.zeros((n_lde,))
        self._n_lde = n_lde
        self.count = 0

    def _local(self, j):
        return self._cols[j]

    def _next(self, j):
        return self._nexts[j]

    def _public(self, i):
        return jnp.full((), np.uint32(bb.s_to_mont(self._publics[i] % bb.P)), jnp.uint32)

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
        expr = jnp.broadcast_to(expr, (self._n_lde,))
        alpha = jnp.broadcast_to(self._alpha, (self._n_lde, ext.D))
        self._acc = ext.add(ext.mul(self._acc, alpha), ext.from_base(expr))
        self.count += 1


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

    Uses powers-of-ζ inner product; the power table is built by log-doubling.
    """
    n, w = coeffs_mont.shape
    log_n = n.bit_length() - 1
    powers = ext.ones((1,))
    z = zeta_mont[None, :]
    for _ in range(log_n):
        shifted = ext.mul(powers, jnp.broadcast_to(z, powers.shape))
        powers = jnp.concatenate([powers, shifted], axis=0)
        z = ext.mul(z, z)
    # sum_i coeffs[i, j] · powers[i]  → (w, 4)
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


def prove(
    air: Air,
    trace: np.ndarray,
    public_values: Sequence[int],
    config: StarkConfig,
) -> dict:
    """Prove one AIR instance.  ``trace``: (N, width) standard-form uint32."""
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
    shift = config.shift
    log_blowup = config.log_blowup
    n_lde = n << log_blowup

    challenger = DuplexChallenger()
    challenger.observe(log_n)
    challenger.observe(width)
    challenger.observe_many(publics)

    # 1. trace LDE + commit
    t_mont = bb.to_mont(jnp.asarray(trace))
    t_lde = coset_lde(t_mont, log_blowup, shift, axis=0)  # (n_lde, w)
    tree_t = MerkleTree(t_lde)
    root_t = tree_t.root
    challenger.observe_many(root_t.tolist())
    alpha = challenger.sample_ext()
    alpha_mont = ext.to_array_mont([alpha])[0]

    # 2. constraint quotient on the LDE domain
    tables = _domain_tables(log_n, log_blowup, shift)
    cols = [t_lde[:, j] for j in range(width)]
    nexts = [jnp.roll(c, -(1 << log_blowup)) for c in cols]
    builder = ProverBuilder(cols, nexts, publics, tables, alpha_mont, n_lde)
    air.eval(builder)
    quotient = ext.mul_base(builder._acc, tables["zh_inv"])  # (n_lde, 4) BB4

    # 3. chunk the quotient into `blowup` degree-<N polys, commit their LDEs
    q_coeffs = _coset_evals_to_coeffs(quotient, shift)  # (n_lde, 4)
    chunks = [
        q_coeffs[k * n : (k + 1) * n] for k in range(config.blowup)
    ]  # each (n, 4) BB4-coeff chunks
    chunk_evals = [
        _coeffs_to_coset_evals(c, log_blowup, shift) for c in chunks
    ]  # (n_lde, 4) each
    q_matrix = jnp.concatenate(chunk_evals, axis=1)  # (n_lde, 4·blowup)
    tree_q = MerkleTree(q_matrix)
    root_q = tree_q.root
    challenger.observe_many(root_q.tolist())
    zeta = challenger.sample_ext()
    zeta_mont = ext.to_array_mont([zeta])[0]

    # 4. openings at ζ and g·ζ
    g = bb.two_adic_generator(log_n)
    gzeta = ext.s_mul_base(zeta, g)
    gzeta_mont = ext.to_array_mont([gzeta])[0]
    t_coeffs = _coset_evals_to_coeffs(t_lde, shift)  # degree < n: high part zero
    t_coeffs_low = t_coeffs[:n]
    opened_t_zeta = ext.from_array_mont(_eval_poly_at_ext(t_coeffs_low, zeta_mont))
    opened_t_gzeta = ext.from_array_mont(_eval_poly_at_ext(t_coeffs_low, gzeta_mont))
    q_cols = q_matrix  # (n_lde, 4b) — evaluate each column at ζ
    q_col_coeffs = jnp.concatenate([chunks[k] for k in range(config.blowup)], axis=1)
    opened_q_zeta = ext.from_array_mont(_eval_poly_at_ext(q_col_coeffs, zeta_mont))

    for v in opened_t_zeta:
        challenger.observe_ext(v)
    for v in opened_t_gzeta:
        challenger.observe_ext(v)
    for v in opened_q_zeta:
        challenger.observe_ext(v)
    gamma = challenger.sample_ext()
    gamma_mont = ext.to_array_mont([gamma])[0]

    # 5. DEEP codeword G over the LDE domain
    x = tables["x"]  # BabyBear (n_lde,)
    x_ext = ext.from_base(x)
    inv_x_zeta = ext.inv(ext.sub(x_ext, jnp.broadcast_to(zeta_mont, x_ext.shape)))
    inv_x_gzeta = ext.inv(ext.sub(x_ext, jnp.broadcast_to(gzeta_mont, x_ext.shape)))

    gpow = ext.ones((1,))[0]
    G = ext.zeros((n_lde,))
    opened_all = []

    def accum(G, gpow, col_vals_base, opened_scalar, inv_den):
        opened_m = ext.to_array_mont([opened_scalar])[0]
        num = ext.sub(ext.from_base(col_vals_base), jnp.broadcast_to(opened_m, (n_lde, ext.D)))
        term = ext.mul(num, inv_den)
        G = ext.add(G, ext.mul(jnp.broadcast_to(gpow, term.shape), term))
        gpow = ext.mul(gpow[None], gamma_mont[None])[0]
        return G, gpow

    for j in range(width):
        G, gpow = accum(G, gpow, t_lde[:, j], opened_t_zeta[j], inv_x_zeta)
    for j in range(width):
        G, gpow = accum(G, gpow, t_lde[:, j], opened_t_gzeta[j], inv_x_gzeta)
    for j in range(4 * config.blowup):
        G, gpow = accum(G, gpow, q_matrix[:, j], opened_q_zeta[j], inv_x_zeta)

    # 6. FRI on G
    fri_proof = fri_prove(G, shift, config.fri, challenger)

    # 7. per-query outer openings (both halves of each round-0 leaf pair)
    half = n_lde // 2
    openings = []
    for q in fri_proof["queries"]:
        li = int(q["index"])
        rows = {}
        for name, tree in (("t", tree_t), ("q", tree_q)):
            row0, path0 = tree.open(li)
            row1, path1 = tree.open(li + half)
            rows[name] = {
                "lo": {"row": [int(v) for v in row0], "path": [[int(v) for v in p] for p in path0]},
                "hi": {"row": [int(v) for v in row1], "path": [[int(v) for v in p] for p in path1]},
            }
        openings.append(rows)

    return {
        "version": 1,
        "log_n": log_n,
        "width": width,
        "public_values": publics,
        "root_t": [int(v) for v in root_t],
        "root_q": [int(v) for v in root_q],
        "opened_t_zeta": [list(v) for v in opened_t_zeta],
        "opened_t_gzeta": [list(v) for v in opened_t_gzeta],
        "opened_q_zeta": [list(v) for v in opened_q_zeta],
        "fri": fri_proof,
        "query_openings": openings,
        "constraint_count": builder.count,
    }
