"""FRI low-degree proof over BB4 codewords (TPU prover, host verifier).

Replaces the FRI commit/fold/query stage of SP1's prover (SURVEY.md §2.2).
The codeword lives on a multiplicative coset s·K (natural index order).  Each
round commits leaf *pairs* (v[i], v[i+N/2]) — the two points ±x that fold
into one value of the next round — as an (N/2, 8)-word Poseidon2 Merkle
matrix, then folds with a BB4 challenge β:

    v'(x²) = (v(x) + v(−x))/2 + β · (v(x) − v(−x))/(2x)

Folding is pure VPU element-wise work; every round halves the array.  The
final codeword is sent as coefficients.  Queries are grinded (proof-of-work)
and verified host-side by walking the fold chain against Merkle openings.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..field import ext
from ..ntt import intt
from .challenger import DuplexChallenger
from .merkle import MerkleTree, verify_opening, verify_openings_batch


@dataclass(frozen=True)
class FriConfig:
    log_blowup: int = 2
    num_queries: int = 50
    proof_of_work_bits: int = 16
    log_final_poly_len: int = 3

    @property
    def blowup(self) -> int:
        return 1 << self.log_blowup


def _pair_matrix(codeword):
    """(N, 4) BB4 codeword → (N/2, 8) leaf matrix [v[i] || v[i+N/2]]."""
    n = codeword.shape[0]
    return jnp.concatenate([codeword[: n // 2], codeword[n // 2 :]], axis=1)


@lru_cache(maxsize=None)
def _inv2x_table(shift: int, log_n: int):
    """Montgomery 1/(2x_j) for x_j = shift·ω^j, j < N/2 (host-precomputed)."""
    half = 1 << (log_n - 1)
    w = bb.two_adic_generator(log_n)
    pw = np.empty(half, dtype=np.uint64)
    acc = (2 * shift) % bb.P
    for j in range(half):
        pw[j] = acc
        acc = acc * w % bb.P
    # batch inversion host-side (Montgomery's trick) then to Montgomery form
    prefix = np.empty(half, dtype=object)
    run = 1
    for j in range(half):
        prefix[j] = run
        run = run * int(pw[j]) % bb.P
    inv_run = pow(run, bb.P - 2, bb.P)
    out = np.empty(half, dtype=np.uint64)
    for j in range(half - 1, -1, -1):
        out[j] = inv_run * prefix[j] % bb.P
        inv_run = inv_run * int(pw[j]) % bb.P
    return jnp.asarray(bb.np_to_mont(out))


@partial(jax.jit, static_argnames=("log_n",))
def _fold_jit(codeword, beta_mont, inv2x, log_n: int):
    n = 1 << log_n
    half = n // 2
    v0 = codeword[:half]
    v1 = codeword[half:]
    half_const = np.uint32(bb.s_to_mont((bb.P + 1) // 2))  # 1/2
    even = ext.mul_base(ext.add(v0, v1), jnp.full((half,), half_const, jnp.uint32))
    odd = ext.mul_base(ext.sub(v0, v1), inv2x)
    return ext.add(even, ext.mul(jnp.broadcast_to(beta_mont, odd.shape), odd))


def _fold(codeword, beta_mont, shift: int, log_n: int):
    """One fold round on the device; returns the half-size codeword."""
    return _fold_jit(codeword, beta_mont, _inv2x_table(shift, log_n), log_n)


def fri_prove(codeword, shift: int, config: FriConfig, challenger: DuplexChallenger):
    """Commit-fold a (N, 4) Montgomery BB4 codeword; returns the proof dict.

    `shift` is the coset shift of the codeword's domain (standard form).
    """
    n = codeword.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    final_len = (1 << config.log_final_poly_len) * config.blowup

    trees: List[MerkleTree] = []
    codewords = [codeword]
    shifts = [shift]
    roots = []
    while codeword.shape[0] > final_len:
        tree = MerkleTree(_pair_matrix(codeword))
        trees.append(tree)
        root = tree.root
        roots.append([int(x) for x in root])
        challenger.observe_many(root.tolist())
        beta = challenger.sample_ext()
        beta_mont = ext.to_array_mont([beta])[0]
        cur_log = codeword.shape[0].bit_length() - 1
        codeword = _fold(codeword, beta_mont, shifts[-1], cur_log)
        shifts.append(shifts[-1] * shifts[-1] % bb.P)
        codewords.append(codeword)

    # final polynomial: coset iNTT, unscale, truncate to len/blowup
    fin_n = codeword.shape[0]
    coeffs = intt(codeword, axis=0)  # componentwise == BB4 iNTT
    s_inv = bb.s_inv(shifts[-1])
    unscale = np.empty(fin_n, dtype=np.uint64)
    acc = 1
    for i in range(fin_n):
        unscale[i] = acc
        acc = acc * s_inv % bb.P
    coeffs = ext.mul_base(coeffs, jnp.asarray(bb.np_to_mont(unscale)))
    coeffs_std = ext.from_array_mont(coeffs)
    keep = fin_n >> config.log_blowup
    assert all(
        ext.s_is_zero(c) for c in coeffs_std[keep:]
    ), "final codeword exceeds degree bound — prover bug"
    final_coeffs = coeffs_std[:keep]
    for c in final_coeffs:
        challenger.observe_ext(c)

    pow_witness = challenger.grind(config.proof_of_work_bits)

    # queries (leaves/paths packed as 4-byte words — utils.packing)
    from ..utils.packing import pack_u32

    queries = []
    log_n0 = log_n
    for _ in range(config.num_queries):
        leaf_index = challenger.sample_bits(log_n0 - 1)
        rounds = []
        idx = leaf_index
        for tree in trees:
            n_half = tree.matrix.shape[0]
            j = idx % n_half
            row, path = tree.open(j)
            rounds.append(
                {"leaf": pack_u32(row), "path": pack_u32(np.asarray(path))}
            )
            idx = j  # i_{r+1} = i_r mod N_r/2
        queries.append({"index": leaf_index, "rounds": rounds})

    return {
        "roots": roots,
        "final_coeffs": [list(c) for c in final_coeffs],
        "pow_witness": pow_witness,
        "queries": queries,
        "log_n": log_n,
    }


class FriError(ValueError):
    pass


def _pow_mod_vec(base: int, exps: np.ndarray) -> np.ndarray:
    """base^exps mod p for a uint64 exponent array (binary expansion)."""
    out = np.ones_like(exps, dtype=np.uint64)
    b = base % bb.P
    e = exps.astype(np.uint64).copy()
    while np.any(e):
        out = np.where(e & 1, out * np.uint64(b) % np.uint64(bb.P), out)
        b = b * b % bb.P
        e >>= 1
    return out


def _as_field_array(values, shape, err: str) -> np.ndarray:
    """Convert nested ints OR packed 4-byte-word blobs (utils.packing) to a
    uint64 array, enforcing 0 ≤ v < p."""
    from ..utils.packing import unpack_rows

    try:
        arr = unpack_rows(values, shape, err)
    except ValueError:
        raise FriError(err) from None
    if arr.shape != shape or np.any(arr >= np.uint64(bb.P)):
        raise FriError(err)
    return arr


def fri_verify(
    proof: dict,
    shift: int,
    log_n: int,
    config: FriConfig,
    challenger: DuplexChallenger,
    open_input_batch,
):
    """Verify a FRI proof — host-side, batched across queries (the per-query
    work is data-parallel: numpy BB4 for the fold walk, native-batched
    Poseidon2 for Merkle openings).

    ``open_input_batch(indices, v0s, v1s)`` is called ONCE with the opened
    round-0 pairs of every query ((nq,) int array and two (nq, 4) uint64
    arrays); the caller (the STARK verifier) must raise on mismatch with the
    outer openings, binding the FRI codeword to the committed polynomials.
    """
    from ..field import ext_np as enp

    if proof.get("log_n") != log_n:
        raise FriError("wrong codeword size")
    final_len = (1 << config.log_final_poly_len) * config.blowup
    n_rounds = 0
    betas = []
    shifts = [shift % bb.P]
    size = 1 << log_n
    while size > final_len:
        n_rounds += 1
        size //= 2
        shifts.append(shifts[-1] * shifts[-1] % bb.P)
    if len(proof["roots"]) != n_rounds:
        raise FriError("wrong number of FRI rounds")
    for root in proof["roots"]:
        if len(root) != 8:
            raise FriError("malformed root")
        challenger.observe_many(root)
        betas.append(challenger.sample_ext())

    final_coeffs = [tuple(int(x) % bb.P for x in c) for c in proof["final_coeffs"]]
    if len(final_coeffs) != (final_len >> config.log_blowup):
        raise FriError("wrong final polynomial length")
    for c in final_coeffs:
        challenger.observe_ext(c)

    if not challenger.check_witness(config.proof_of_work_bits, int(proof["pow_witness"])):
        raise FriError("proof-of-work check failed")

    nq = config.num_queries
    queries = proof["queries"]
    if len(queries) != nq:
        raise FriError("wrong query count")

    # transcript: sample every query index first (same order as the prover)
    indices = np.empty(nq, dtype=np.int64)
    for qi, q in enumerate(queries):
        leaf_index = challenger.sample_bits(log_n - 1)
        if int(q["index"]) != leaf_index:
            raise FriError("query index mismatch")
        if len(q["rounds"]) != n_rounds:
            raise FriError("wrong per-query round count")
        indices[qi] = leaf_index

    half_inv = (bb.P + 1) // 2
    idx = indices.copy()
    expected = None  # (nq, 4) value the current round must contain at `idx`
    v0_r0 = v1_r0 = None
    for r in range(n_rounds):
        cur_log = log_n - r
        n_half = 1 << (cur_log - 1)
        depth = cur_log - 1
        j = idx % n_half
        leaves = _as_field_array(
            [q["rounds"][r]["leaf"] for q in queries], (nq, 8), "malformed FRI leaf"
        )
        paths = _as_field_array(
            [q["rounds"][r]["path"] for q in queries],
            (nq, depth, 8),
            "malformed FRI path",
        )
        if not verify_openings_batch(proof["roots"][r], j, leaves, paths):
            raise FriError(f"bad Merkle opening in round {r}")
        v0 = leaves[:, 0:4]
        v1 = leaves[:, 4:8]
        if r == 0:
            v0_r0, v1_r0 = v0, v1
        else:
            got = np.where((idx < n_half)[:, None], v0, v1)
            if not np.array_equal(got, expected):
                raise FriError(f"fold mismatch entering round {r}")
        # fold to the next round's value at index j (vectorized)
        w = bb.two_adic_generator(cur_log)
        x = shifts[r] * _pow_mod_vec(w, j.astype(np.uint64)) % np.uint64(bb.P)
        x_inv = enp._pow_base(x, bb.P - 2)
        even = enp.mul_base(enp.add(v0, v1), np.full(nq, half_inv, np.uint64))
        odd = enp.mul_base(enp.sub(v0, v1), np.uint64(half_inv) * x_inv % np.uint64(bb.P))
        beta_arr = np.asarray(betas[r], dtype=np.uint64)[None, :]
        expected = enp.add(even, enp.mul(np.broadcast_to(beta_arr, odd.shape), odd))
        idx = j

    # final polynomial evaluation at the tracked points (vectorized Horner)
    fin_log = final_len.bit_length() - 1
    w = bb.two_adic_generator(fin_log)
    x = shifts[n_rounds] * _pow_mod_vec(w, idx.astype(np.uint64)) % np.uint64(bb.P)
    value = np.zeros((nq, 4), dtype=np.uint64)
    for c in reversed(final_coeffs):
        value = enp.add(
            enp.mul_base(value, x), np.asarray(c, dtype=np.uint64)[None, :]
        )
    if not np.array_equal(value, expected):
        raise FriError("final polynomial mismatch")

    open_input_batch(indices, v0_r0, v1_r0)
    return True
