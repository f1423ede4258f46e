"""Recording of SHA-256 invocations performed by witness programs.

The reference proves every commitment hash inside SP1 via its sha2
precompile chip (SURVEY.md §2.2); the TPU framework's equivalent is the
SHA-256 gadget AIR (stark/sha256_air.py).  This module is the seam between
the two: while a witness program runs under ``recording()``, every SHA-256
the DKG verification layer computes is captured as a (preimage, digest)
pair, and the prover pipeline turns the captured set into gadget STARK
proofs whose digests are bound to the committed public-value stream.

Recording is process-global (witness programs are single-threaded by
construction, like the reference's zkVM guests) and zero-cost when off.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import List, Optional, Tuple

_RECORDS: Optional[List[Tuple[bytes, bytes]]] = None
_CHACHA: Optional[List[Tuple[bytes, bytes, int, bytes]]] = None
_G1: Optional[List[dict]] = None


def record(preimage: bytes, digest: bytes) -> None:
    """Called by the verification layer for every SHA-256 it computes."""
    if _RECORDS is not None:
        _RECORDS.append((bytes(preimage), bytes(digest)))


def record_chacha(key: bytes, nonce: bytes, counter: int, data: bytes) -> None:
    """Called by the encrypted-share witness for every ChaCha20 decrypt
    (key, nonce, start counter, ciphertext) — the seam feeding the ChaCha20
    gadget AIR (stark/chacha20_air.py), like ``record`` feeds the SHA table."""
    if _CHACHA is not None:
        _CHACHA.append((bytes(key), bytes(nonce), int(counter), bytes(data)))


def record_g1_poly_check(
    secret: bytes, dest_id: int, points: List[Optional[Tuple[int, int]]]
) -> None:
    """Called by ``verify_seed_exchange_commitment`` for the Feldman share
    check (verification.rs:107-118): pk(secret) ?= poly(dest_id) over the
    verification vector.  Feeds the G1 program chip (stark/g1_air.py) —
    the curve-relation analogue of ``record``/``record_chacha``."""
    if _G1 is not None:
        _G1.append(
            {
                "secret": bytes(secret),
                "dest_id": int(dest_id),
                "points": [None if p is None else (int(p[0]), int(p[1])) for p in points],
            }
        )


@contextmanager
def g1_recording():
    """Capture G1 poly-check relations performed by the witness."""
    global _G1
    prev = _G1
    _G1 = [] if prev is None else prev
    try:
        yield _G1
    finally:
        _G1 = prev


@contextmanager
def recording():
    """Capture all SHA-256 (preimage, digest) pairs computed in the block.

    Yields the live list; duplicates are preserved in call order (the
    pipeline dedupes).  Nested use shares the innermost list.
    """
    global _RECORDS
    prev = _RECORDS
    _RECORDS = [] if prev is None else prev
    try:
        yield _RECORDS
    finally:
        _RECORDS = prev


@contextmanager
def chacha_recording():
    """Capture all ChaCha20 (key, nonce, counter, ciphertext) invocations."""
    global _CHACHA
    prev = _CHACHA
    _CHACHA = [] if prev is None else prev
    try:
        yield _CHACHA
    finally:
        _CHACHA = prev
