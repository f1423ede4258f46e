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
