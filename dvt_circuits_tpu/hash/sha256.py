"""Batched SHA-256 on TPU uint32 lanes.

TPU-native re-creation of the reference's sp1-patched ``sha2`` crates
(crates/dkg/Cargo.toml:22, crates/bad_encrypted_share_prove/Cargo.toml:20 —
SURVEY.md §2.2: "SHA-256 kernel (message schedule + compression) — needed
bit-exactly for every hash").  Every commitment hash in the DKG layer
(initial-commitment, seed-exchange, partial-share, base hashes) is SHA-256;
witness generation hashes one message at a time on the host (hashlib), but
batched scenario pipelines (scenario generation, batched witness checks,
future SHA-256 gadget-AIR trace generation) hash thousands of same-shape
messages — that is this kernel.

Layout: a batch of equal-length messages is packed into (n_blocks, n, 16)
big-endian words; compression is vectorized over the batch axis (VPU lanes),
rounds run under ``lax.fori_loop`` with the K constants gathered per
iteration so the traced graph is one round body.  All ops are uint32
add/xor/and/shift — pure VPU work, bit-exact vs hashlib (tested).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# FIPS 180-4 constants
_H0 = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)
_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
        0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
        0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
        0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
        0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
        0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)
_K_J = jnp.asarray(_K)


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


def _compress_block(state, block):
    """One SHA-256 compression: state (..., 8), block (..., 16) → (..., 8).

    The 64-round loop carries a rolling 16-word schedule window; round t
    consumes w[0] of the window and appends the newly scheduled word, so the
    full 64-word schedule is never materialized."""

    def round_body(t, carry):
        a, b, c, d, e, f, g, h, w = carry
        wt = w[..., 0]
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + _K_J[t] + wt
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        # schedule the word for round t+16 (harmlessly computed for t>47)
        sig0 = _rotr(w[..., 1], 7) ^ _rotr(w[..., 1], 18) ^ (w[..., 1] >> 3)
        sig1 = _rotr(w[..., 14], 17) ^ _rotr(w[..., 14], 19) ^ (w[..., 14] >> 10)
        w_new = w[..., 0] + sig0 + w[..., 9] + sig1
        w = jnp.concatenate([w[..., 1:], w_new[..., None]], axis=-1)
        return (t1 + t2, a, b, c, d + t1, e, f, g, w)

    a, b, c, d, e, f, g, h = (state[..., i] for i in range(8))
    init = (a, b, c, d, e, f, g, h, block)
    a2, b2, c2, d2, e2, f2, g2, h2, _ = jax.lax.fori_loop(0, 64, round_body, init)
    return jnp.stack(
        [a2 + a, b2 + b, c2 + c, d2 + d, e2 + e, f2 + f, g2 + g, h2 + h], axis=-1
    )


@jax.jit
def sha256_words(blocks):
    """Digest a batch of padded messages: (n_blocks, n, 16) → (n, 8).

    Blocks must already carry FIPS 180-4 padding (see ``pack_messages``)."""
    n = blocks.shape[1]
    state = jnp.broadcast_to(jnp.asarray(_H0), (n, 8))

    def body(i, st):
        return _compress_block(st, blocks[i])

    return jax.lax.fori_loop(0, blocks.shape[0], body, state)


def pack_messages(messages) -> jnp.ndarray:
    """Pad and pack equal-length byte messages into (n_blocks, n, 16) words."""
    if not messages:
        raise ValueError("empty batch")
    ln = len(messages[0])
    if any(len(m) != ln for m in messages):
        raise ValueError("messages must share one length (pad the batch)")
    n_blocks = (ln + 9 + 63) // 64
    total = n_blocks * 64
    tail = b"\x80" + b"\x00" * (total - ln - 9) + (8 * ln).to_bytes(8, "big")
    buf = np.frombuffer(
        b"".join(m + tail for m in messages), dtype=">u4"
    ).astype(np.uint32)
    words = buf.reshape(len(messages), n_blocks, 16).transpose(1, 0, 2)
    return jnp.asarray(words)


def digests_to_bytes(digests) -> list:
    """(n, 8) word digests → list of 32-byte digests."""
    host = np.asarray(digests).astype(">u4")
    return [row.tobytes() for row in host]


def sha256_batch(messages) -> list:
    """Batched SHA-256 of equal-length byte messages → list of 32-byte digests."""
    return digests_to_bytes(sha256_words(pack_messages(messages)))
