"""Batched ChaCha20 block function on TPU uint32 lanes (RFC 8439).

TPU-native re-creation of the ``chacha20`` 0.9.1 crate the reference's
encrypted-share guest uses (crates/bad_encrypted_share_prove/Cargo.toml:18,
main.rs:16-30 — SURVEY.md §2.2: "ChaCha20 block function (pure ARX — maps
well to int32 vector ops)").

The batch axis is (key, nonce, counter) tuples — one lane per keystream
block — so bulk decryption of many exchanged-share payloads (or many blocks
of one long payload) is a single VPU pass.  The 20 rounds run under
``lax.fori_loop`` with the column/diagonal pattern selected by round parity;
bit-exact vs the scalar host path (tested).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_CONSTANTS = np.array(
    [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574], dtype=np.uint32
)

# quarter-round index groups: even rounds = columns, odd rounds = diagonals
_COLS = np.array([[0, 4, 8, 12], [1, 5, 9, 13], [2, 6, 10, 14], [3, 7, 11, 15]])
_DIAGS = np.array([[0, 5, 10, 15], [1, 6, 11, 12], [2, 7, 8, 13], [3, 4, 9, 14]])


def _rotl(x, n: int):
    return (x << n) | (x >> (32 - n))


def _quarter(a, b, c, d):
    a = a + b
    d = _rotl(d ^ a, 16)
    c = c + d
    b = _rotl(b ^ c, 12)
    a = a + b
    d = _rotl(d ^ a, 8)
    c = c + d
    b = _rotl(b ^ c, 7)
    return a, b, c, d


def _apply_groups(state, groups):
    """state (..., 16); apply the 4 independent quarter-rounds of one round."""
    cols = [state[..., groups[g]] for g in range(4)]  # each (..., 4)
    outs = []
    for col in cols:
        a, b, c, d = _quarter(col[..., 0], col[..., 1], col[..., 2], col[..., 3])
        outs.append(jnp.stack([a, b, c, d], axis=-1))
    flat = jnp.concatenate(outs, axis=-1)  # order: groups then lanes
    perm = np.argsort(np.concatenate([groups[g] for g in range(4)]))
    return flat[..., perm]


@jax.jit
def chacha20_blocks(states):
    """(n, 16) initial states → (n, 16) keystream blocks (words, LE order)."""

    def double_round(_, st):
        return _apply_groups(_apply_groups(st, _COLS), _DIAGS)

    working = jax.lax.fori_loop(0, 10, double_round, states)
    return working + states


def make_states(key: bytes, nonce: bytes, counters) -> jnp.ndarray:
    """One (key, nonce) with many counters → (n, 16) initial states."""
    if len(key) != 32 or len(nonce) != 12:
        raise ValueError("ChaCha20 needs a 32-byte key and 12-byte nonce")
    kw = np.frombuffer(key, dtype="<u4").astype(np.uint32)
    nw = np.frombuffer(nonce, dtype="<u4").astype(np.uint32)
    n = len(counters)
    st = np.empty((n, 16), dtype=np.uint32)
    st[:, 0:4] = _CONSTANTS
    st[:, 4:12] = kw
    st[:, 12] = np.asarray(counters, dtype=np.uint32)
    st[:, 13:16] = nw
    return jnp.asarray(st)


def keystream(key: bytes, nonce: bytes, length: int, counter: int = 0) -> bytes:
    """Keystream bytes via the batched kernel (all blocks in one device call)."""
    n_blocks = (length + 63) // 64
    blocks = chacha20_blocks(make_states(key, nonce, range(counter, counter + n_blocks)))
    out = np.asarray(blocks).astype("<u4").tobytes()
    return out[:length]


def xor(key: bytes, nonce: bytes, data: bytes, counter: int = 0) -> bytes:
    ks = keystream(key, nonce, len(data), counter)
    return bytes(a ^ b for a, b in zip(data, ks))
