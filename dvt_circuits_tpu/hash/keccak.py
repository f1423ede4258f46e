"""Batched Keccak-f[1600] / Keccak-256 / SHA3-256 on TPU uint32 lanes.

SP1's prover offers Keccak both as a guest precompile and as a commitment
wrap hash (SURVEY.md §2.2: "Poseidon2, Keccak, FRI"); this is the TPU-native
equivalent.  The 64-bit Keccak lanes are modeled as (lo, hi) uint32 pairs —
TPU has no 64-bit integer lanes — so every θ/ρ/π/χ/ι step is two uint32 VPU
ops plus cross-word shifts for the rotations.

State layout: a pair of (..., 25) uint32 arrays (lo, hi), batch on the
leading axes.  The 24 rounds are unrolled (the round constants specialize
the graph; 24 × ~150 ops is a small graph).  Bit-exact vs hashlib.sha3_256
and the Ethereum Keccak-256 golden vectors (tested).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

RATE_BYTES = 136  # 1088-bit rate for 256-bit digests

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
# rotation offsets r[x][y] indexed as lane x + 5y
_ROT = [
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14,
]
# π: dst lane (x, y) ← src lane (x + 3y mod 5, x), dst index = x + 5y
_PI_SRC = [((x + 3 * y) % 5) + 5 * x for y in range(5) for x in range(5)]


def _rotl64(lo, hi, n: int):
    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n < 32:
        return (
            (lo << n) | (hi >> (32 - n)),
            (hi << n) | (lo >> (32 - n)),
        )
    m = n - 32
    return (
        (hi << m) | (lo >> (32 - m)),
        (lo << m) | (hi >> (32 - m)),
    )


_RC_LO = jnp.asarray(np.array([rc & 0xFFFFFFFF for rc in _RC], dtype=np.uint32))
_RC_HI = jnp.asarray(np.array([rc >> 32 for rc in _RC], dtype=np.uint32))


def _round(lo, hi, rc_lo, rc_hi):
    """One round on TRANSPOSED state: lo/hi are (25, ...) — each Keccak
    word is a leading-axis row whose batch rides the VPU lanes.  (The old
    (..., 25) layout put the 25 words on the 128-wide minor axis: every
    word extraction was a strided lane shuffle, measured ~25× slower.)"""
    # θ
    clo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20] for x in range(5)]
    chi_ = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20] for x in range(5)]
    dlo, dhi = [], []
    for x in range(5):
        rl, rh = _rotl64(clo[(x + 1) % 5], chi_[(x + 1) % 5], 1)
        dlo.append(clo[(x - 1) % 5] ^ rl)
        dhi.append(chi_[(x - 1) % 5] ^ rh)
    alo = [lo[i] ^ dlo[i % 5] for i in range(25)]
    ahi = [hi[i] ^ dhi[i % 5] for i in range(25)]
    # ρ then π
    blo, bhi = [None] * 25, [None] * 25
    for dst in range(25):
        src = _PI_SRC[dst]
        rl, rh = _rotl64(alo[src], ahi[src], _ROT[src])
        blo[dst], bhi[dst] = rl, rh
    # χ
    olo, ohi = [], []
    for y in range(5):
        for x in range(5):
            i = x + 5 * y
            j = (x + 1) % 5 + 5 * y
            k = (x + 2) % 5 + 5 * y
            olo.append(blo[i] ^ (~blo[j] & blo[k]))
            ohi.append(bhi[i] ^ (~bhi[j] & bhi[k]))
    # ι
    olo[0] = olo[0] ^ rc_lo
    ohi[0] = ohi[0] ^ rc_hi
    return jnp.stack(olo, axis=0), jnp.stack(ohi, axis=0)


_KECCAK_BLOCK = 1024  # lanes per Pallas grid step


def _pallas_kernel(lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    """All 24 rounds VMEM-resident on a (25, BLOCK) tile pair — the XLA
    fori_loop path round-trips the 50-row state through HBM every round
    (measured 13× slower than speed-of-light); this keeps it on-chip."""
    lo = [lo_ref[i, :] for i in range(25)]
    hi = [hi_ref[i, :] for i in range(25)]
    for r in range(24):
        lo, hi = _round(lo, hi, jnp.uint32(_RC[r] & 0xFFFFFFFF), jnp.uint32(_RC[r] >> 32))
        lo = [lo[i] for i in range(25)]
        hi = [hi[i] for i in range(25)]
    for i in range(25):
        out_lo_ref[i, :] = lo[i]
        out_hi_ref[i, :] = hi[i]


@jax.jit
def _keccak_pallas(lo_t, hi_t):
    """(25, N) transposed permutation via Pallas; N % _KECCAK_BLOCK == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = lo_t.shape[1]
    grid = (n // _KECCAK_BLOCK,)
    spec = pl.BlockSpec(
        (25, _KECCAK_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _pallas_kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(lo_t.shape, jnp.uint32),
            jax.ShapeDtypeStruct(hi_t.shape, jnp.uint32),
        ),
    )(lo_t, hi_t)


@jax.jit
def _keccak_xla(lo_t, hi_t):
    """(25, N) transposed permutation via plain XLA (fori_loop over rounds)
    — the non-TPU path (the Pallas interpreter is orders of magnitude too
    slow for the unrolled 24-round kernel)."""

    def body(r, carry):
        lo, hi = _round(list(carry[0]), list(carry[1]), _RC_LO[r], _RC_HI[r])
        return lo, hi

    lo_t, hi_t = jax.lax.fori_loop(0, 24, body, (lo_t, hi_t))
    return lo_t, hi_t


@jax.jit
def keccak_f1600(lo, hi):
    """Batched permutation on (..., 25) lo/hi uint32 lane arrays.

    Internally transposed to (25, batch) so the batch rides the VPU lanes;
    on TPU the rounds run in a Pallas kernel with the state VMEM-resident
    (``_pallas_kernel``), lane-padded to the block size."""
    shape = lo.shape
    lo_t = jnp.moveaxis(lo, -1, 0).reshape(25, -1)
    hi_t = jnp.moveaxis(hi, -1, 0).reshape(25, -1)
    n = lo_t.shape[1]
    if jax.default_backend() != "tpu":
        lo_t, hi_t = _keccak_xla(lo_t, hi_t)
    else:
        pad = (-n) % _KECCAK_BLOCK
        if pad:
            lo_t = jnp.pad(lo_t, ((0, 0), (0, pad)))
            hi_t = jnp.pad(hi_t, ((0, 0), (0, pad)))
        lo_t, hi_t = _keccak_pallas(lo_t, hi_t)
        lo_t = lo_t[:, :n]
        hi_t = hi_t[:, :n]
    lo_t = lo_t.reshape((25,) + shape[:-1])
    hi_t = hi_t.reshape((25,) + shape[:-1])
    return jnp.moveaxis(lo_t, 0, -1), jnp.moveaxis(hi_t, 0, -1)


def _pack(messages, domain_byte: int):
    """Equal-length messages → (n_blocks, n, 25) lo/hi absorb blocks."""
    ln = len(messages[0])
    if any(len(m) != ln for m in messages):
        raise ValueError("messages must share one length (pad the batch)")
    n_blocks = ln // RATE_BYTES + 1
    total = n_blocks * RATE_BYTES
    pad = bytearray(total - ln)
    pad[0] ^= domain_byte
    pad[-1] ^= 0x80
    pad = bytes(pad)
    buf = np.frombuffer(b"".join(m + pad for m in messages), dtype="<u8")
    lanes = buf.reshape(len(messages), n_blocks, RATE_BYTES // 8).transpose(1, 0, 2)
    full = np.zeros((n_blocks, len(messages), 25), dtype=np.uint64)
    full[:, :, : RATE_BYTES // 8] = lanes
    return (
        jnp.asarray((full & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((full >> 32).astype(np.uint32)),
    )


@jax.jit
def _absorb_all(blo, bhi):
    n = blo.shape[1]
    lo = jnp.zeros((n, 25), jnp.uint32)
    hi = jnp.zeros((n, 25), jnp.uint32)
    for i in range(blo.shape[0]):  # static block count: unrolled absorb
        lo, hi = keccak_f1600(lo ^ blo[i], hi ^ bhi[i])
    return lo, hi


def _digests(lo, hi) -> list:
    lo = np.asarray(lo[:, :4]).astype(np.uint64)
    hi = np.asarray(hi[:, :4]).astype(np.uint64)
    lanes = (lo | (hi << 32)).astype("<u8")
    return [row.tobytes() for row in lanes]


def keccak256_batch(messages) -> list:
    """Batched Ethereum Keccak-256 (0x01 domain padding) → 32-byte digests."""
    return _digests(*_absorb_all(*_pack(messages, 0x01)))


def sha3_256_batch(messages) -> list:
    """Batched FIPS 202 SHA3-256 (0x06 domain padding) → 32-byte digests."""
    return _digests(*_absorb_all(*_pack(messages, 0x06)))
