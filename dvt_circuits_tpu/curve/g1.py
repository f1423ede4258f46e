"""Vectorized BLS12-381 G1 group ops + multi-scalar multiplication on TPU.

The MSM with collective-reduced partial sums is the BASELINE.json north star
("MSM bucket sums reduced via collectives").  Points are batched Jacobian
triples (X, Y, Z) of `curve.fp` limb arrays; the identity is Z = 0.  All
control flow is branchless (flag selects), so the same traced program
handles identities, doublings, and cancellations — a requirement for both
XLA and constant-shape batching.

Correctness is property-tested against the host implementation
(`hostcrypto.bls12_381`), which is itself pinned by the reference's golden
vectors.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..hostcrypto import bls12_381 as host
from . import fp

SCALAR_BITS = 256


def from_affine_points(points) -> tuple:
    """Host affine points ((x, y) ints or None) → Jacobian limb arrays."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    return (fp.from_ints(xs), fp.from_ints(ys), fp.from_ints(zs))


def to_affine_points(p) -> list:
    """Jacobian limb arrays → host affine points (None for identity)."""
    X, Y, Z = (fp.to_ints(c) for c in p)
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
        else:
            zinv = pow(z, host.P - 2, host.P)
            out.append((x * zinv * zinv % host.P, y * zinv * zinv % host.P * zinv % host.P))
    return out


def identity(shape=()) -> tuple:
    return (fp.zeros(shape), fp.ones_mont(shape), fp.zeros(shape))


def double(p):
    """Jacobian doubling (a = 0 curve); identity-safe (Z=0 → Z3=0)."""
    X, Y, Z = p
    A = fp.mont_sq(X)
    B = fp.mont_sq(Y)
    C = fp.mont_sq(B)
    t = fp.mont_sq(fp.add(X, B))
    D = fp.add(fp.sub(fp.sub(t, A), C), fp.sub(t, fp.add(A, C)))  # 2((X+B)²−A−C)
    E = fp.add(fp.add(A, A), A)
    F = fp.mont_sq(E)
    X3 = fp.sub(F, fp.add(D, D))
    C8 = fp.add(C, C)
    C8 = fp.add(C8, C8)
    C8 = fp.add(C8, C8)
    Y3 = fp.sub(fp.mont_mul(E, fp.sub(D, X3)), C8)
    YZ = fp.mont_mul(Y, Z)
    Z3 = fp.add(YZ, YZ)
    return (X3, Y3, Z3)


def add(p, q):
    """Branchless unified Jacobian addition."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = fp.mont_sq(Z1)
    Z2Z2 = fp.mont_sq(Z2)
    U1 = fp.mont_mul(X1, Z2Z2)
    U2 = fp.mont_mul(X2, Z1Z1)
    S1 = fp.mont_mul(fp.mont_mul(Y1, Z2), Z2Z2)
    S2 = fp.mont_mul(fp.mont_mul(Y2, Z1), Z1Z1)
    H = fp.sub(U2, U1)
    rr = fp.sub(S2, S1)
    rr = fp.add(rr, rr)  # r = 2(S2−S1)
    I = fp.mont_sq(fp.add(H, H))
    J = fp.mont_mul(H, I)
    V = fp.mont_mul(U1, I)
    X3 = fp.sub(fp.sub(fp.mont_sq(rr), J), fp.add(V, V))
    SJ = fp.mont_mul(S1, J)
    Y3 = fp.sub(fp.mont_mul(rr, fp.sub(V, X3)), fp.add(SJ, SJ))
    ZZ = fp.sub(fp.sub(fp.mont_sq(fp.add(Z1, Z2)), Z1Z1), Z2Z2)
    Z3 = fp.mont_mul(ZZ, H)

    p_inf = fp.is_zero(Z1)
    q_inf = fp.is_zero(Z2)
    same_x = fp.is_zero(H)
    same_y = fp.is_zero(rr)
    dbl = double(p)

    def sel(c, a, b):
        return tuple(fp.select(c, ca, cb) for ca, cb in zip(a, b))

    inf = identity(X1.shape[:-1])
    res = sel(same_x & same_y, dbl, (X3, Y3, Z3))  # P == Q → double
    res = sel(same_x & ~same_y & ~p_inf & ~q_inf, inf, res)  # P == −Q → ∞
    res = sel(q_inf, p, res)
    res = sel(p_inf, q, res)
    return res


def scalars_to_bits(scalars) -> jnp.ndarray:
    """Host ints → (n, 256) bit array, little-endian bit order."""
    out = np.zeros((len(scalars), SCALAR_BITS), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s = int(s) % host.R
        for b in range(SCALAR_BITS):
            out[i, b] = (s >> b) & 1
    return jnp.asarray(out)


WINDOW_BITS = 4
NUM_WINDOWS = SCALAR_BITS // WINDOW_BITS  # 64


def scalars_to_digits(scalars) -> jnp.ndarray:
    """Host ints → (n, 64) base-16 digit array, most-significant first."""
    out = np.zeros((len(scalars), NUM_WINDOWS), dtype=np.int32)
    for i, s in enumerate(scalars):
        s = int(s) % host.R
        for w in range(NUM_WINDOWS):
            out[i, NUM_WINDOWS - 1 - w] = (s >> (WINDOW_BITS * w)) & 0xF
    return jnp.asarray(out)


def scalar_mul_windowed(p, digits):
    """Batched fixed-window scalar multiplication.

    Builds the 16-entry multiples table T[j] = j·P per point (15 batched
    adds), then scans the 64 base-16 digits MSB-first: 4 doublings + one
    table-gather add per digit — 256 doubles + 79 adds total vs the
    double-and-add ladder's 256 + 256 (~1.8× fewer field multiplies).
    p: batched Jacobian point; digits: (n, 64) int32 from
    ``scalars_to_digits``.
    """
    batch = digits.shape[:-1]
    table = [identity(batch), p]
    for _ in range(14):
        table.append(add(table[-1], p))
    # (16, ..., 32) per coordinate
    T = tuple(jnp.stack([t[c] for t in table], axis=0) for c in range(3))

    acc = identity(batch)

    def body(i, acc):
        for _ in range(WINDOW_BITS):
            acc = double(acc)
        d = jax.lax.dynamic_slice_in_dim(digits, i, 1, axis=-1)[..., 0]  # (...)
        # gather T[d] along the table axis
        idx = d[None, ..., None]  # (1, ..., 1)
        entry = tuple(
            jnp.take_along_axis(c, jnp.broadcast_to(idx, (1, *batch, fp.NLIMBS)), axis=0)[0]
            for c in T
        )
        return add(acc, entry)

    return jax.lax.fori_loop(0, NUM_WINDOWS, body, acc)


def scalar_mul(p, bits):
    """Batched double-and-add: p = batched Jacobian, bits (n, 256)."""
    batch = bits.shape[:-1]
    acc = identity(batch)

    def body(i, acc):
        b = SCALAR_BITS - 1 - i
        acc = double(acc)
        bit = jax.lax.dynamic_slice_in_dim(bits, b, 1, axis=-1)[..., 0]
        added = add(acc, p)
        return tuple(fp.select(bit.astype(bool), a, c) for a, c in zip(added, acc))

    return jax.lax.fori_loop(0, SCALAR_BITS, body, acc)


def _tree_reduce(p):
    """Reduce a batch of points ((n, 32) coords) to one with log n adds."""
    n = p[0].shape[0]
    while n > 1:
        half = n // 2
        a = tuple(c[:half] for c in p)
        b = tuple(c[half : 2 * half] for c in p)
        rest = tuple(c[2 * half :] for c in p)
        s = add(a, b)
        p = tuple(jnp.concatenate([cs, cr], axis=0) for cs, cr in zip(s, rest))
        n = p[0].shape[0]
    return tuple(c[0] for c in p)


#: jitted entry points (the raw functions are building blocks for larger
#: traced programs; calling them eagerly per-op is dispatch-bound)
add_jit = jax.jit(add)
double_jit = jax.jit(double)


@jax.jit
def _msm_jit(points, digits):
    per_point = scalar_mul_windowed(points, digits)
    return _tree_reduce(per_point)


def msm(points_affine, scalars):
    """Σ scalarᵢ·Pᵢ on device: batched windowed scalar-mul + tree reduction.

    points_affine: host affine tuples; scalars: host ints.
    Returns the host affine result.
    """
    p = from_affine_points(points_affine)
    digits = scalars_to_digits(scalars)
    out = _msm_jit(p, digits)
    return to_affine_points(tuple(c[None] for c in out))[0]


# ---------------------------------------------------------------------------
# Pippenger bucket MSM with GLV decomposition (the BASELINE.json north star:
# "MSM with bucket accumulation reduced via collectives").
#
# GLV: the BLS12-381 cube-root endomorphism φ(x, y) = (β·x, y) satisfies
# φ(P) = λ·P with λ = z²−1 (z the BLS parameter), so every 256-bit scalar
# splits into two ~128-bit halves over the lattice basis {(λ, −1), (1, z²)}
# (both ≡ 0 as a + b·λ mod r; the second because 1 + z²λ = z⁴−z²+1 = r).
# Signs fold into point negation (y → −y), doubling the point set and
# halving the window count.
#
# Buckets, TPU-style (no data-dependent scatter): per window, SORT the
# points by digit (argsort + gather), take one group-law PREFIX SCAN
# (jax.lax.associative_scan over the branchless `add`), and read each
# bucket sum as prefix[last(b)] − prefix[last(b−1)] (point subtraction =
# add of the negated point; empty buckets give P − P = ∞ branchlessly).
# The Σ b·S_b weighted reduction uses the binary trick: for each bit j,
# T_j = Σ_{b: bit j set} S_b (masked tree reduce), then Σ 2^j·T_j by
# doubling — all windows processed as one batched axis.
# ---------------------------------------------------------------------------

_BLS_Z = -0xD201000000010000
GLV_LAMBDA = (_BLS_Z * _BLS_Z - 1) % host.R


def _find_beta() -> int:
    """The Fp cube root of unity matching GLV_LAMBDA (checked on G)."""
    # the two primitive cube roots are roots of x² + x + 1
    for beta in (
        pow(2, (host.P - 1) // 3, host.P),
        pow(pow(2, (host.P - 1) // 3, host.P), 2, host.P),
    ):
        gx, gy = host.G1_GEN
        if host.g1_mul(host.G1_GEN, GLV_LAMBDA) == (gx * beta % host.P, gy):
            return beta
    raise AssertionError("no matching cube root for the GLV eigenvalue")


GLV_BETA = _find_beta()


def glv_decompose(k: int):
    """k ≡ k1 + k2·λ (mod r) with |k1|, |k2| ≈ √r — Babai rounding on the
    basis {(λ, −1), (1, z²)}.  Returns ((sign1, |k1|), (sign2, |k2|))."""
    k = int(k) % host.R
    z2 = _BLS_Z * _BLS_Z
    c1 = (k * z2 + host.R // 2) // host.R
    c2 = (k + host.R // 2) // host.R
    k1 = k - c1 * GLV_LAMBDA - c2 * 1
    k2 = c1 * 1 - c2 * z2
    assert (k1 + k2 * GLV_LAMBDA) % host.R == k
    return (
        (1 if k1 >= 0 else -1, abs(k1)),
        (1 if k2 >= 0 else -1, abs(k2)),
    )


GLV_BITS = 130  # |k_i| < √r·(1+ε); 130 bits is a safe static bound


def _bucket_digits(values, window_bits: int) -> np.ndarray:
    """(m,) host ints → (m, nwin) digits, most-significant window first."""
    nwin = -(-GLV_BITS // window_bits)
    out = np.zeros((len(values), nwin), dtype=np.int32)
    mask = (1 << window_bits) - 1
    for i, v in enumerate(values):
        v = int(v)
        for w in range(nwin):
            out[i, nwin - 1 - w] = (v >> (window_bits * w)) & mask
    return out


def _neg_point(p):
    return (p[0], fp.neg(p[1]), p[2])


def msm_bucket(points_affine, scalars, window_bits: int | None = None):
    """Σ scalarᵢ·Pᵢ via GLV + bucket accumulation (host in/out API)."""
    n = len(points_affine)
    if window_bits is None:
        window_bits = max(2, min(8, (2 * n).bit_length() - 1))
    pts = []
    subscalars = []
    for pt, s in zip(points_affine, scalars):
        (s1, a1), (s2, a2) = glv_decompose(s)
        if pt is None:
            pts += [None, None]
        else:
            x, y = pt
            pts.append((x, y if s1 > 0 else (host.P - y) % host.P))
            bx = x * GLV_BETA % host.P
            pts.append((bx, y if s2 > 0 else (host.P - y) % host.P))
        subscalars += [a1, a2]
    # Blelloch scan needs a power-of-two point count: pad with identity
    # points at digit 0 (zero scalar) — excluded from every bucket
    m = len(pts)
    m2 = 1 << max(m - 1, 1).bit_length()
    pts += [None] * (m2 - m)
    subscalars += [0] * (m2 - m)
    p = from_affine_points(pts)
    digits = jnp.asarray(_bucket_digits(subscalars, window_bits))
    out = _msm_bucket_jit(p, digits, window_bits)
    return to_affine_points(tuple(c[None] for c in out))[0]


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("window_bits",))
def _msm_bucket_jit(p, digits, window_bits: int):
    """p: (m,)-batched Jacobian; digits: (m, nwin) int32 MSB-first."""
    m, nwin = digits.shape
    nbuckets = (1 << window_bits) - 1

    # sort each window's points by digit: (nwin, m) gather indices
    order = jnp.argsort(digits, axis=0).T  # (nwin, m)
    sorted_digits = jnp.take_along_axis(digits, order.T, axis=0).T  # (nwin, m)
    pw = tuple(c[order] for c in p)  # (nwin, m, 32) per coordinate

    # group-law EXCLUSIVE prefix scan along the point axis: Blelloch
    # up/down-sweep — ~2m batched point-adds total (vs m·log2(m) for the
    # r4 Hillis–Steele inclusive scan: 6.5× less group-law work at
    # m = 8192) in 2·log2(m) add instances, so the graph stays small.
    nl = pw[0].shape[-1]
    v = pw
    step = 2
    while step <= m:
        vr = tuple(c.reshape(nwin, m // step, step, nl) for c in v)
        left = tuple(c[:, :, step // 2 - 1] for c in vr)
        right = tuple(c[:, :, step - 1] for c in vr)
        s = add(right, left)
        v = tuple(
            c.at[:, :, step - 1].set(sc).reshape(nwin, m, nl)
            for c, sc in zip(vr, s)
        )
        step *= 2
    total = tuple(c[:, m - 1] for c in v)  # (nwin, 32): Σ of the window
    ident_root = identity((nwin,))
    v = tuple(
        c.at[:, m - 1].set(i) for c, i in zip(v, ident_root)
    )
    step = m
    while step >= 2:
        vr = tuple(c.reshape(nwin, m // step, step, nl) for c in v)
        left = tuple(c[:, :, step // 2 - 1] for c in vr)
        right = tuple(c[:, :, step - 1] for c in vr)
        s = add(left, right)
        v = tuple(
            c.at[:, :, step // 2 - 1].set(r).at[:, :, step - 1].set(sc)
            .reshape(nwin, m, nl)
            for c, r, sc in zip(vr, right, s)
        )
        step //= 2
    # E[i] = Σ_{j<i} P_j (E[0] = identity); extend with the window total so
    # index m is addressable: V(i) = E[i] for i < m, V(m) = Σ all
    prefix_ext = tuple(
        jnp.concatenate([c, t[:, None]], axis=1) for c, t in zip(v, total)
    )  # (nwin, m+1, 32)

    # bucket sums via exclusive-prefix differences at digit-run boundaries:
    # Σ_{digit=b} = V(last(b)+1) − V(last(b−1)+1); +1-shifted indices are
    # always ≥ 0, so no identity masking is needed
    buckets = jnp.arange(1, nbuckets + 1, dtype=jnp.int32)  # (nb,)

    def last_idx(row_digits, b):
        # index of the last element with digit ≤ b (−1 if none)
        return jnp.searchsorted(row_digits, b, side="right") - 1

    li = jax.vmap(
        lambda rd: jax.vmap(lambda b: last_idx(rd, b))(buckets)
    )(sorted_digits)  # (nwin, nb)
    li_prev = jax.vmap(
        lambda rd: jax.vmap(lambda b: last_idx(rd, b - 1))(buckets)
    )(sorted_digits)  # (nwin, nb)

    def pick(idx_plus1):
        return tuple(
            jnp.take_along_axis(c, idx_plus1[:, :, None], axis=1)
            for c in prefix_ext
        )  # (nwin, nb, 32)

    upper = pick(li + 1)
    lower = pick(li_prev + 1)
    bucket_sums = add(upper, _neg_point(lower))  # (nwin, nb, 32)

    # Σ b·S_b per window via the binary-weight trick, with ALL (bit, window)
    # pairs batched through ONE tree reduction (graph size ~log(nb) group
    # adds instead of bits × nb — the unrolled variant made XLA compile
    # times explode)
    bit_masks = jnp.stack(
        [((buckets >> j) & 1).astype(bool) for j in range(window_bits)]
    )  # (w, nb)
    mask_b = jnp.broadcast_to(
        bit_masks[:, None, :], (window_bits, nwin, nbuckets)
    ).reshape(window_bits * nwin, nbuckets)
    ident = identity((window_bits * nwin, nbuckets))
    t = tuple(
        fp.select(
            mask_b,
            jnp.broadcast_to(c[None], (window_bits,) + c.shape).reshape(
                window_bits * nwin, nbuckets, fp.NLIMBS
            ),
            ident[ci],
        )
        for ci, c in enumerate(bucket_sums)
    )
    nb = nbuckets
    while nb > 1:
        half = nb // 2
        a = tuple(c[:, :half] for c in t)
        b2 = tuple(c[:, half : 2 * half] for c in t)
        rest = tuple(c[:, 2 * half :] for c in t)
        s = add(a, b2)
        t = tuple(jnp.concatenate([cs, cr], axis=1) for cs, cr in zip(s, rest))
        nb = t[0].shape[1]
    T = tuple(c[:, 0].reshape(window_bits, nwin, fp.NLIMBS) for c in t)

    # per-window Horner over bits (w sequential double+add steps, batched
    # over windows)
    win_sums = tuple(c[window_bits - 1] for c in T)
    for j in range(window_bits - 2, -1, -1):
        win_sums = add(double(win_sums), tuple(c[j] for c in T))

    # cross-window Horner: MSB window first, window_bits doublings between
    # (runtime fori_loop — one add + w doubles in the traced body)
    acc0 = tuple(c[0] for c in win_sums)

    def body(w, acc):
        for _ in range(window_bits):
            acc = double(acc)
        entry = tuple(
            jax.lax.dynamic_slice_in_dim(c, w, 1, axis=0)[0] for c in win_sums
        )
        return add(acc, entry)

    return jax.lax.fori_loop(1, nwin, body, acc0)


def dist_msm(points_affine, scalars, mesh, axis_name: str = "sp"):
    """MSM with points sharded across devices; per-device partial sums are
    gathered over ICI and folded — the collective-reduction pattern of the
    north-star MSM (BASELINE.json)."""
    d = mesh.shape[axis_name]
    n = len(points_affine)
    pad = (-n) % d
    points_affine = list(points_affine) + [None] * pad
    scalars = list(scalars) + [0] * pad
    p = from_affine_points(points_affine)
    bits = scalars_to_digits(scalars)

    def kernel(px, py, pz, bl):
        part = _tree_reduce(scalar_mul_windowed((px, py, pz), bl))
        gathered = tuple(
            jax.lax.all_gather(c, axis_name) for c in part
        )  # (d, 32) each
        return _tree_reduce(gathered)

    spec = P(axis_name)
    out = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )(*p, bits)
    return to_affine_points(tuple(c[None] for c in out))[0]
