"""Proof pipeline: witness execution → public-values binding STARK.

The TPU-native analogue of the reference's `execute`/`prove`/`verify` host
flow (src/main.rs:430-507):

  * ``execute_circuit`` — run the witness program, return exit semantics and
    the committed public-values stream (what `client.execute` does);
  * ``prove_circuit``  — execute, then produce a STARK binding the committed
    stream: the stream (plus a circuit-identity header) is absorbed by the
    Poseidon2 sponge AIR and the digest is certified by the DEEP-ALI/FRI
    prover on TPU;
  * ``verify_proof``   — a REAL verifier (unlike the reference's `verify`
    subcommand, which re-executes the circuit ELF — divergence documented in
    SURVEY.md §3.5): replays the transcript and FRI queries host-side.

Proof semantics (v4, up to three tables): one shared Fiat–Shamir transcript
chains

  1. the Poseidon2 stream AIR binding the witness program's committed
     public-value stream (circuit id, auth mode, stream → digest),
  2. ONE multi-message SHA-256 table proving every distinct SHA-256 the
     witness computed (commitment hashes, ECDH key derivation — recorded by
     ``dkg.hash_recorder``): digest = SHA-256(preimage) in constraints per
     message, with digests that appear in the committed stream bound to it
     by the verifier (offset check against the hex encoding the guests
     commit), and
  3. for the encrypted-share circuit, ONE ChaCha20 table proving the
     keystream blocks of every decrypt the witness performed
     (stark/chacha20_air.py): the verifier binds each invocation's key to
     the SHA table's ECDH-point digest (key = SHA-256(point), nonce =
     key[:12], counters 0..n-1 — main.rs:16-30) and the ciphertext to the
     committed stream, making `plaintext = ciphertext XOR keystream`
     verifier-recomputable.  All tables prove in a single device dispatch
     (stark/fused.py).

This is the staged arithmetization of the DKG checks (README roadmap): the
hash chain and the stream-cipher decrypt no longer rely on witness
re-execution.  Remaining trust gap (documented): curve relations
(BLS/secp) are not yet in-circuit.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax

from ..circuits.guest_api import GuestResult, run_guest
from ..circuits.registry import CIRCUITS, get_circuit
from ..dkg.hash_recorder import chacha_recording, g1_recording, recording
from ..hostcrypto import bls12_381 as _bls
from ..pcs.challenger import DuplexChallenger
from ..stark import prove as stark_prove
from ..stark import verify as stark_verify
from ..stark.fused import prove_tables as fused_prove_tables
from ..stark.config import DEFAULT_CONFIG, StarkConfig
from ..stark.poseidon2_air import (
    Poseidon2StreamAir,
    hash_stream_words,
    stream_to_words,
)
from ..stark.chacha20_air import (
    ChaCha20Air,
    init_from_publics,
    keystream_from_publics,
)
from ..stark.sha256_air import Sha256Air, digest_from_publics, pad_message
from ..stark.verifier import StarkError
from ..utils import cbor

#: v7: g1mul gadget extras carry the signature-binding data (partial
#: pubkeys + BLS signatures + cleartext, ECDSA credentials) the verifier
#: re-checks; v6 containers with curve gadgets no longer verify.
PROOF_FORMAT = "dvt-circuits-tpu/stark-proof/v7"

#: gadget kind ids as absorbed into the stream-AIR header (_stream_words)
_GADGET_KIND_IDS = {"sha256": 1, "chacha20": 2, "g1": 3, "g1mul": 4}

#: production G1 chip scalar widths (the reference's 256-bit secrets and
#: 32-bit ``bls_id_from_u32`` ids); pinned so a verifier reconstructs the
#: exact AIR from the container
_G1_SK_BITS, _G1_ID_BITS = 256, 32
_G1_MAX_K = 32

#: cap on per-proof SHA-256 gadget tables (committee hashes are O(n); the
#: cap exists to bound proof size — the count omitted is recorded in the
#: container so the cap is never silent).  64 messages / 512 blocks covers
#: generated committees up to n=64 without degradation (VERDICT r3 item 3).
MAX_SHA_GADGETS = 64
MAX_SHA_BLOCKS = 512

_CIRCUIT_IDS = {name: i + 1 for i, name in enumerate(sorted(CIRCUITS))}


class ProveError(RuntimeError):
    pass


class VerifyError(RuntimeError):
    pass


class VerifyResult:
    """Outcome of ``verify_proof``: truthy on success, and carries the
    binding level of the proof so relying parties can distinguish a
    curve-bound fault proof from one that only binds the hash relations
    (advisor r3: a bare ``True`` hid that distinction).

    ``binding`` is one of:
      * ``"curve-bound"``        — every recorded curve relation is proven
        in-circuit and anchored to the committed stream (auth mode: secret
        and id hash-anchored too);
      * ``"curve-bound-noauth"`` — curve relations proven and the C_j /
        id anchored, but the secret has no hash anchor in the reference's
        no_auth data flow (matches the reference's own no_auth trust);
      * ``"hash-bound"``         — no curve relation was carried (either
        the witness faulted before the curve check, or relations were
        omitted — see ``g1_omitted``); the SHA/stream bindings still hold.

    ``sig_checks`` counts the BLS/ECDSA signature verifications the
    verifier re-ran itself from container-committed public data
    (verify_generation_hashes' n pairing checks, verify_commitment's
    ECDSA, the perpetrator message-signature check) — those checks carry
    ZERO witness trust; a ``+sig`` suffix on ``binding`` marks it.  The
    remaining witness-trust surface is the encrypted-share ECDH (the
    receiver's secp secret key is private by design).
    """

    def __init__(
        self,
        circuit: str,
        binding: str,
        g1_relations: int,
        g1_omitted: int,
        sig_checks: int = 0,
    ):
        self.circuit = circuit
        self.binding = binding
        self.g1_relations = g1_relations
        self.g1_omitted = g1_omitted
        self.sig_checks = sig_checks

    def __bool__(self) -> bool:
        return True

    def __repr__(self) -> str:
        return (
            f"VerifyResult(circuit={self.circuit!r}, binding={self.binding!r}, "
            f"g1_relations={self.g1_relations}, g1_omitted={self.g1_omitted}, "
            f"sig_checks={self.sig_checks})"
        )


def execute_circuit(
    circuit_name: str, data, auth: bool, setup: str = "secp-commitment"
) -> GuestResult:
    """CBOR-encode typed data and run the witness program (execute mode)."""
    spec = get_circuit(circuit_name, setup)
    payload = cbor.encode(data.to_json(auth))
    return run_guest(spec.guest, payload, auth)


def _stream_words(
    circuit_name: str,
    auth: bool,
    setup: str,
    stream: bytes,
    gadgets: list,
    omitted: tuple = (0, 0, 0),
) -> list:
    """Absorption stream: circuit-identity header + gadget-structure
    descriptor + byte stream as words.

    The descriptor (gadget count, per-gadget kind, message/invocation block
    counts, stream offsets, and kind-specific extras) is absorbed by the
    stream AIR so the gadget set is committed: stripping or altering gadget
    tables desynchronizes the stream digest and the proof fails — without
    this, a prover could drop the hash-relation tables from a container and
    still verify."""
    header = [
        _CIRCUIT_IDS[circuit_name],
        int(auth),
        int(setup == "bls-commitment"),
        len(stream),
        len(gadgets),
        # omitted-relation counters (SHA cap overflow, non-carriable chacha
        # invocations, non-carriable G1 relations) are absorbed so a
        # container cannot understate them
        int(omitted[0]),
        int(omitted[1]),
        int(omitted[2]) if len(omitted) > 2 else 0,
    ]
    for g in gadgets:
        bcs = [int(b) for b in g["block_counts"]]
        offs = [0 if o is None else int(o) + 1 for o in g["stream_offsets"]]
        extras = [int(x) for x in g.get("extras", [])]
        header += (
            [_GADGET_KIND_IDS[g["kind"]], len(bcs)]
            + bcs
            + offs
            + [len(extras)]
            + extras
        )
    return header + stream_to_words(stream)


def _dist_prove_entries(entries, config: StarkConfig):
    """Prove a container's tables sharded over ALL attached devices.

    The production multi-chip path (VERDICT r4 item 4): a 1-D ``sp`` mesh
    over ``jax.devices()``; each table whose LDE row count divides the mesh
    (with a block no smaller than the blowup halo) is proven by
    ``parallel.dist_stark.dist_prove``; smaller tables run the single-chip
    phase prover on the SAME Fiat–Shamir challenger, so the container
    bytes are bit-identical to every other backend (tested + driver
    dryrun)."""
    import jax
    import numpy as _np

    from jax.sharding import Mesh

    from ..parallel.dist_stark import dist_prove, ep_prove_tables

    devices = jax.devices()
    mesh = Mesh(_np.array(devices), ("sp",))
    d = len(devices)
    if os.environ.get("DVT_EP") == "1":
        # EP: tables on separate device groups, commits dispatched up front
        return ep_prove_tables(entries, config, mesh)
    challenger = DuplexChallenger()
    proofs = []
    for e_air, e_trace, e_publics in entries:
        rows = e_trace.shape[0] if hasattr(e_trace, "shape") else len(e_trace)
        log_n = max(rows - 1, 1).bit_length()
        n_lde = (1 << log_n) << config.log_blowup
        if n_lde % d == 0 and n_lde // d >= config.blowup:
            proofs.append(
                dist_prove(
                    e_air, e_trace, e_publics, config, mesh, "sp", challenger
                )
            )
        else:
            proofs.append(
                stark_prove(e_air, e_trace, e_publics, config, challenger)
            )
    return proofs


def prove_circuit(
    circuit_name: str,
    data,
    auth: bool,
    config: StarkConfig = DEFAULT_CONFIG,
    setup: str = "secp-commitment",
) -> dict:
    """Execute the witness and produce the binding proof container."""
    t0 = time.time()
    with recording() as recorded_hashes, chacha_recording() as recorded_chacha, \
            g1_recording() as recorded_g1:
        result = execute_circuit(circuit_name, data, auth, setup)
    if result.exit_code != 0:
        raise ProveError(
            f"witness execution failed (guest panic): {result.panic_message}"
        )
    # distinct SHA-256 relations the witness relied on, in first-use order
    seen: set = set()
    sha_relations = []
    for preimage, digest in recorded_hashes:
        if digest not in seen:
            seen.add(digest)
            sha_relations.append((preimage, digest))
    kept = []
    blocks_used = 0
    omitted = 0
    for preimage, digest in sha_relations:
        nb = len(pad_message(preimage)) // 64
        if len(kept) >= MAX_SHA_GADGETS or blocks_used + nb > MAX_SHA_BLOCKS:
            omitted += 1
        else:
            kept.append((preimage, digest))
            blocks_used += nb
    sha_relations = kept

    # Two-table proof on one transcript: the stream AIR, then ONE SHA-256
    # table carrying every recorded hash relation (multi-message Sha256Air —
    # the per-invocation-gadget layout of proof v2 cost one STARK per hash).
    # Messages are sorted by block count (stable) and padded with 1-block
    # dummy messages to a power-of-two count to bound compile-cache keys.
    gadgets = []
    gadget_entry = None
    sha_digests: list = []
    sha_originals: list = []
    if sha_relations:
        padded_msgs = []
        offsets = []
        for preimage, digest in sha_relations:
            padded_msgs.append(pad_message(preimage))
            sha_originals.append(preimage)
            sha_digests.append(digest)
            # guests commit digests as hex text; bind where the digest appears
            off = result.public_values.find(digest.hex().encode("ascii"))
            offsets.append(off if off >= 0 else None)
        order = sorted(
            range(len(padded_msgs)), key=lambda i: -len(padded_msgs[i])
        )
        padded_msgs = [padded_msgs[i] for i in order]
        offsets = [offsets[i] for i in order]
        sha_digests = [sha_digests[i] for i in order]
        sha_originals = [sha_originals[i] for i in order]
        target = 1 << (len(padded_msgs) - 1).bit_length()
        import hashlib as _hashlib

        while len(padded_msgs) < target:
            padded_msgs.append(pad_message(b""))
            offsets.append(None)
            sha_digests.append(_hashlib.sha256(b"").digest())
            sha_originals.append(b"")
        block_counts = tuple(len(p) // 64 for p in padded_msgs)
        gadgets.append(
            {
                "kind": "sha256",
                "block_counts": list(block_counts),
                "stream_offsets": offsets,
                "proof": None,  # filled below
            }
        )
        g_air = Sha256Air(block_counts)
        gadget_entry = (g_air, *g_air.generate_trace(padded_msgs))

    # G1 curve-relation tables (stark/g1mul_air.py + prover/curve_glue.py):
    # the Feldman share check, the finalization aggregation math and the
    # bad-partial-key expected-key check proven in-circuit — EVERY recorded
    # relation is carried (VERDICT r3 item 3 retired the `[:1]` truncation).
    # Relations the chip cannot carry (identity points, the documented
    # x-collision pathology, oversize tables) or that lack a verifiable
    # stream anchor (advisor r3: an unanchored gadget yields a
    # guaranteed-reject container) are counted in the absorbed omitted
    # counter, never dropped silently.
    from . import curve_glue

    g1_entries: list = []
    g1_omitted = 0
    if recorded_g1 and os.environ.get("DVT_G1", "1") == "0":
        # explicit opt-out (test/dev): relations are counted in the absorbed
        # omitted counter, so the container never understates the skip
        g1_omitted = len(recorded_g1)
        recorded_g1 = []
    seen_g1: set = set()
    for rel in recorded_g1:
        key = repr(sorted(rel.items(), key=lambda kv: kv[0]))
        if key in seen_g1:
            continue
        seen_g1.add(key)
        try:
            gadget, entry = curve_glue.build_gadget(
                rel, sha_originals, sha_digests, result.public_values, auth
            )
        except (curve_glue.Unprovable, curve_glue.GlueError):
            g1_omitted += 1
            continue
        gadgets.append(gadget)
        g1_entries.append(entry)

    # ChaCha20 decrypt table (encrypted-share circuit): one block row-group
    # per 64-byte keystream block across all recorded invocations; the
    # verifier re-derives key/nonce/counter semantics from the publics
    chacha_entry = None
    chacha_omitted = 0
    if recorded_chacha:
        seen_c: set = set()
        invs = []
        for rec in recorded_chacha:
            if rec not in seen_c:
                seen_c.add(rec)
                invs.append(rec)
        blocks: list = []
        inv_bcs: list = []
        inv_offs: list = []
        inv_extras: list = []
        for key, nonce, counter0, ct in invs:
            nb = max(1, -(-len(ct) // 64))
            # the verifier enforces the derivation convention; an invocation
            # outside it (or whose key SHA was capped out of the table)
            # cannot be carried and is counted as omitted
            if (
                not ct
                or counter0 != 0
                or nonce != key[:12]
                or key not in sha_digests
                or len(blocks) + nb > 64
            ):
                chacha_omitted += 1
                continue
            off = result.public_values.find(ct.hex().encode("ascii"))
            if off < 0:
                off = result.public_values.find(ct.hex().upper().encode("ascii"))
            for j in range(nb):
                blocks.append((key, j, nonce))
            inv_bcs.append(nb)
            inv_offs.append(off if off >= 0 else None)
            inv_extras += [len(ct), sha_digests.index(key)]
        if blocks:
            target = 1 << (len(blocks) - 1).bit_length()
            while len(blocks) < target:
                blocks.append((b"\x00" * 32, 0, b"\x00" * 12))
            gadgets.append(
                {
                    "kind": "chacha20",
                    "block_counts": inv_bcs,
                    "stream_offsets": inv_offs,
                    "extras": [len(blocks)] + inv_extras,
                    "proof": None,  # filled below
                }
            )
            c_air = ChaCha20Air(len(blocks))
            chacha_entry = (c_air, *c_air.generate_trace(blocks))

    # the absorbed words commit to the gadget structure (see _stream_words)
    words = _stream_words(
        circuit_name,
        auth,
        setup,
        result.public_values,
        gadgets,
        (omitted, chacha_omitted, g1_omitted),
    )
    # pad the chunk count to a power of two: the trace height is padded to a
    # power of two anyway, and this collapses the compile-cache key variety
    num_chunks = max(1, -(-len(words) // 8))
    num_chunks = 1 << (num_chunks - 1).bit_length()
    air = Poseidon2StreamAir(num_chunks)
    trace, publics = air.generate_trace(words)
    witness_time = time.time() - t0

    # Default path: the whole proof is ONE device dispatch (stark/fused.py);
    # DVT_FUSED=0 falls back to the phase-per-dispatch legacy prover
    # (bit-identical output, kept as the cross-check oracle).
    t0 = time.time()
    entries = [(air, trace, publics)]
    if gadget_entry is not None:
        entries.append(gadget_entry)
    entries.extend(g1_entries)
    if chacha_entry is not None:
        entries.append(chacha_entry)

    # prover backend: device-fused (default), distributed over the device
    # mesh (automatic when >1 device is attached, forceable with
    # DVT_DIST=1), device-phase (DVT_FUSED=0, the cross-check oracle) or
    # pure-host numpy (DVT_PROVER=host — no XLA compile; seconds for small
    # tables, used by CI smokes and accelerator-free environments).  All
    # four emit bit-identical proofs.
    dist_flag = os.environ.get("DVT_DIST", "auto")
    use_dist = os.environ.get("DVT_PROVER") != "host" and (
        dist_flag == "1" or (dist_flag == "auto" and len(jax.devices()) > 1)
    )
    if use_dist:
        proofs = _dist_prove_entries(entries, config)
    elif os.environ.get("DVT_PROVER") == "host":
        from ..stark.host_prover import host_prove_tables

        proofs, _ = host_prove_tables(entries, config)
    elif os.environ.get("DVT_FUSED", "1") != "0":
        proofs, _ = fused_prove_tables(entries, config)
    else:
        challenger = DuplexChallenger()
        proofs = [
            stark_prove(e_air, e_trace, e_publics, config, challenger)
            for e_air, e_trace, e_publics in entries
        ]
    stark = proofs[0]
    for g, p in zip(gadgets, proofs[1:]):
        g["proof"] = p
    prove_time = time.time() - t0

    return {
        "format": PROOF_FORMAT,
        "circuit": circuit_name,
        "setup": setup,
        "auth": auth,
        "public_values": result.public_values.hex(),
        "commit_count": result.commit_count,
        "stark": stark,
        "gadgets": gadgets,
        "gadgets_omitted": omitted,
        "chacha_omitted": chacha_omitted,
        "g1_omitted": g1_omitted,
        "config": {
            "log_blowup": config.log_blowup,
            "num_queries": config.num_queries,
            "proof_of_work_bits": config.proof_of_work_bits,
            "log_final_poly_len": config.log_final_poly_len,
            "shift": config.shift,
        },
        "timing": {"witness_ms": int(witness_time * 1000), "prove_ms": int(prove_time * 1000)},
    }


def verify_proof(
    container: dict,
    circuit_name: Optional[str] = None,
    strict: bool = False,
) -> VerifyResult:
    """Verify a proof container; raises VerifyError on failure.

    Returns a truthy ``VerifyResult`` carrying the proof's binding level.
    With ``strict=True``, containers for the share circuits whose curve
    relations were omitted (``g1_omitted != 0``) or absent are rejected
    instead of flagged — an accused party hitting the documented
    x-collision pathology, or a DVT_G1=0 prover, then fails verification
    outright (advisor r3 finding 2)."""
    if container.get("format") != PROOF_FORMAT:
        raise VerifyError(f"unknown proof format {container.get('format')!r}")
    name = container.get("circuit")
    if name not in CIRCUITS:
        raise VerifyError(f"unknown circuit {name!r}")
    if circuit_name is not None and name != circuit_name:
        raise VerifyError(f"proof is for circuit {name!r}, expected {circuit_name!r}")
    auth = bool(container.get("auth"))
    setup = container.get("setup", "secp-commitment")
    if setup not in ("secp-commitment", "bls-commitment"):
        raise VerifyError(f"unknown setup {setup!r}")
    try:
        stream = bytes.fromhex(container["public_values"])
    except (KeyError, ValueError) as e:
        raise VerifyError(f"malformed public values: {e}") from None

    cfg = container.get("config", {})
    config = StarkConfig(
        log_blowup=int(cfg.get("log_blowup", DEFAULT_CONFIG.log_blowup)),
        num_queries=int(cfg.get("num_queries", DEFAULT_CONFIG.num_queries)),
        proof_of_work_bits=int(
            cfg.get("proof_of_work_bits", DEFAULT_CONFIG.proof_of_work_bits)
        ),
        log_final_poly_len=int(
            cfg.get("log_final_poly_len", DEFAULT_CONFIG.log_final_poly_len)
        ),
        shift=int(cfg.get("shift", DEFAULT_CONFIG.shift)),
    )
    if config.num_queries < 12 or config.log_blowup < 1:
        raise VerifyError("proof config below minimum security floor")

    gadgets_list = container.get("gadgets", [])
    try:
        # the absorbed words commit to the gadget structure, so a stripped
        # or altered gadget set desynchronizes the stream digest below
        words = _stream_words(
            name,
            auth,
            setup,
            stream,
            gadgets_list,
            (
                int(container.get("gadgets_omitted", 0)),
                int(container.get("chacha_omitted", 0)),
                int(container.get("g1_omitted", 0)),
            ),
        )
    except (KeyError, TypeError, ValueError) as e:
        raise VerifyError(f"malformed gadget descriptor: {e}") from None
    num_chunks = max(1, -(-len(words) // 8))
    num_chunks = 1 << (num_chunks - 1).bit_length()
    air = Poseidon2StreamAir(num_chunks)
    padded = [w % 2013265921 for w in words] + [0] * (8 * num_chunks - len(words))
    digest = hash_stream_words(padded)
    publics = padded + digest

    challenger = DuplexChallenger()
    g1_relations = 0
    sig_checks = 0
    try:
        stark_verify(air, container["stark"], publics, config, challenger)
        sha_ctx = None
        for entry in gadgets_list:
            kind = entry.get("kind")
            if kind == "sha256":
                sha_ctx = _verify_sha_gadget(entry, stream, config, challenger)
            elif kind == "g1":
                _verify_g1_gadget(entry, stream, sha_ctx, config, challenger, auth, name)
                g1_relations += 1
            elif kind == "g1mul":
                sig_checks += _verify_g1mul_gadget(
                    entry, stream, sha_ctx, config, challenger, auth, name
                )
                g1_relations += 1
            elif kind == "chacha20":
                _verify_chacha_gadget(entry, stream, sha_ctx, config, challenger)
            else:
                raise VerifyError(f"unknown gadget kind {kind!r}")
    except StarkError as e:
        raise VerifyError(f"STARK verification failed: {e}") from None
    except (KeyError, TypeError, ValueError) as e:
        raise VerifyError(f"malformed proof: {e}") from None

    g1_omitted = int(container.get("g1_omitted", 0))
    if g1_relations and g1_omitted == 0:
        binding = "curve-bound" if auth else "curve-bound-noauth"
        if sig_checks:
            binding += "+sig"
    else:
        binding = "hash-bound"
    if strict:
        if g1_omitted:
            raise VerifyError(
                f"strict: {g1_omitted} curve relation(s) omitted from the proof"
            )
        if name in ("bad-share", "finalization", "bad-partial-key") and (
            g1_relations == 0
        ):
            # bad-encrypted-share's only exit-0 path is parse failure
            # (main.rs:404 fall-through), which records no curve relation;
            # every other circuit's accepting run reaches its curve check
            # (bad-share/bad-partial-key slashable outcomes may fault at
            # the hash level first, but strict callers asked for in-circuit
            # curve evidence, so absence is rejected — advisor r4 finding 2
            # extends this to finalization and bad-partial-key).
            raise VerifyError("strict: proof carries no curve-relation table")
    return VerifyResult(name, binding, g1_relations, g1_omitted, sig_checks)


def _verify_sha_gadget(
    entry: dict, stream: bytes, config: StarkConfig, challenger: DuplexChallenger
):
    """Verify the multi-message SHA-256 table and its stream bindings.

    The table's public values (per-message message + digest limbs) come from
    the sub-proof itself; the AIR constraints tie each digest to its message,
    and the offset checks tie digests to the committed stream (guests commit
    hashes as hex text — circuits/guest_api.py framing).  Returns
    (air, publics) so later gadgets can bind to the table's digests."""
    if entry.get("kind") != "sha256":
        raise VerifyError(f"unknown gadget kind {entry.get('kind')!r}")
    block_counts = [int(v) for v in entry["block_counts"]]
    offsets = entry.get("stream_offsets", [])
    if not 1 <= len(block_counts) <= MAX_SHA_GADGETS or len(offsets) != len(
        block_counts
    ):
        raise VerifyError("gadget message count out of range")
    if any(not 1 <= b <= 64 for b in block_counts) or sum(block_counts) > MAX_SHA_BLOCKS:
        raise VerifyError("gadget block count out of range")
    g_air = Sha256Air(tuple(block_counts))
    g_publics = [int(v) for v in entry["proof"]["public_values"]]
    try:
        g_air.check_publics(g_publics)
    except ValueError as e:
        raise VerifyError(f"gadget publics: {e}") from None
    stark_verify(g_air, entry["proof"], g_publics, config, challenger)
    for mi, off in enumerate(offsets):
        if off is None:
            continue
        off = int(off)
        digest_hex = digest_from_publics(g_air, g_publics, mi).hex().encode("ascii")
        if not 0 <= off <= len(stream) - 64 or stream[off : off + 64] != digest_hex:
            raise VerifyError("gadget digest not bound to the committed stream")
    return g_air, g_publics


def _g1_air(k: int):
    from ..stark.g1_air import G1PolyAir

    return G1PolyAir(k, sk_bits=_G1_SK_BITS, id_bits=_G1_ID_BITS)


def _parse_init_commitment(msg: bytes, pts) -> Optional[list]:
    """Parse an initial-commitment SHA preimage (verification.rs:151-175:
    gen_id(16) ‖ n(1) ‖ k(1) ‖ len(1) ‖ len × compressed pubkeys) and return
    the decompressed affine points iff they exactly match ``pts``."""
    k = len(pts)
    if len(msg) != 19 + 48 * k or msg[18] != k:
        return None
    out = []
    for j in range(k):
        try:
            pt = _bls.g1_from_compressed(msg[19 + 48 * j : 19 + 48 * (j + 1)])
        except _bls.InvalidPoint:
            return None
        if pt is None or (int(pt[0]), int(pt[1])) != (int(pts[j][0]), int(pts[j][1])):
            return None
        out.append(pt)
    return out


def _stream_frames(stream: bytes) -> list:
    """Split a committed public-values stream into its length-prefixed
    frames (guest_api.GuestContext.commit framing)."""
    frames = []
    off = 0
    while off < len(stream):
        if off + 8 > len(stream):
            raise ValueError("truncated stream frame header")
        ln = int.from_bytes(stream[off : off + 8], "little")
        off += 8
        if off + ln > len(stream):
            raise ValueError("truncated stream frame")
        frames.append(stream[off : off + ln])
        off += ln
    return frames


def _verify_g1_gadget(
    entry: dict,
    stream: bytes,
    sha_ctx,
    config: StarkConfig,
    challenger: DuplexChallenger,
    auth: bool,
    circuit_name: str,
) -> None:
    """Verify the G1 curve-relation table and its cross-table bindings.

    The chip proves pk(sk) and poly(id) over the C_j exposed in its publics;
    this function binds those publics to SHA-proven preimages and to the
    committed stream:

      * C_j ↔ the initial-commitment preimage's compressed pubkeys
        (decompressed host-side — which also establishes curve/subgroup
        membership of the chip's affine inputs);
      * auth mode: sk bytes ↔ seed-exchange preimage[32:64]; the same
        preimage's [0:32] must be the initial-commitment digest (hash
        chaining) and its [64:96] (dst_base_hash) must select id =
        sorted-index+1 among the stream's committed verification hashes
        (verification.rs:50-66);
      * the two results must differ — a bad-share/bad-encrypted proof
        exists only for the slashable mismatch outcome.

    no_auth divergence (documented in README): the secret and id have no
    hash anchor in the reference's own data flow, so they stay bound only
    at the witness level, as in proof v4.
    """
    extras = [int(v) for v in entry.get("extras", [])]
    if len(extras) != 5:
        raise VerifyError("g1 extras malformed")
    k, sk_bits, id_bits, seed_ref, init_ref = extras
    if sk_bits != _G1_SK_BITS or id_bits != _G1_ID_BITS:
        raise VerifyError("g1 chip scalar widths not the production widths")
    if not 2 <= k <= _G1_MAX_K:
        raise VerifyError("g1 chip k out of range")
    if [int(v) for v in entry.get("block_counts", [])] != [k]:
        raise VerifyError("g1 descriptor inconsistent")
    air = _g1_air(k)
    publics = [int(v) for v in entry["proof"]["public_values"]]
    try:
        air.check_publics(publics)
    except ValueError as e:
        raise VerifyError(f"g1 publics: {e}") from None
    stark_verify(air, entry["proof"], publics, config, challenger)

    if sha_ctx is None:
        raise VerifyError("g1 gadget requires the SHA-256 table")
    sha_air, sha_publics = sha_ctx
    from ..stark.sha256_air import digest_from_publics as _dig
    from ..stark.sha256_air import message_from_publics as _msg
    import hashlib as _hashlib

    sk = bytes(publics[: air.sk_bytes])
    id_int = int.from_bytes(bytes(publics[air.sk_bytes : air.c_base]), "big")
    c_pts = []
    for j in range(k):
        base = air.c_base + 2 * 39 * j
        from ..stark import bigfield as _bf

        c_pts.append(
            (
                _bf.limbs_to_int(publics[base : base + 39]),
                _bf.limbs_to_int(publics[base + 39 : base + 78]),
            )
        )

    # C_j binding via the initial-commitment preimage
    if not 1 <= init_ref <= sha_air.num_messages:
        raise VerifyError("g1 gadget lacks an initial-commitment binding")
    try:
        init_msg = _msg(sha_air, sha_publics, init_ref - 1)
    except ValueError as e:
        raise VerifyError(f"g1 init preimage: {e}") from None
    if _parse_init_commitment(init_msg, c_pts) is None:
        raise VerifyError("g1 C_j not bound to the committed initial-commitment preimage")

    # The initial-commitment digest must itself be anchored in the
    # committed stream (the guest asserts initial_commitment.hash ∈
    # verification_hashes before any curve math, bad_share.py /
    # main.rs:32-39) — without this membership check a crafted container
    # could point init_ref at an unanchored table entry carrying
    # fabricated C_j (advisor r3 finding 1).
    try:
        frames = _stream_frames(stream)
    except ValueError as e:
        raise VerifyError(f"malformed stream: {e}") from None
    hashes = []
    for fr in frames[:-1]:  # last frame = perpetrator pubkey
        try:
            hashes.append(bytes.fromhex(fr.decode("ascii")))
        except (UnicodeDecodeError, ValueError):
            raise VerifyError("malformed verification-hash frame") from None
    if _hashlib.sha256(init_msg).digest() not in hashes:
        raise VerifyError(
            "g1 initial-commitment digest not among the committed hashes"
        )

    if auth:
        if not 1 <= seed_ref <= sha_air.num_messages:
            raise VerifyError("g1 gadget lacks a seed-exchange binding (auth)")
        try:
            seed_msg = _msg(sha_air, sha_publics, seed_ref - 1)
        except ValueError as e:
            raise VerifyError(f"g1 seed preimage: {e}") from None
        if len(seed_msg) != 96:
            raise VerifyError("g1 seed preimage has the wrong shape")
        if seed_msg[32:64] != sk:
            raise VerifyError("g1 secret not bound to the seed-exchange preimage")
        if _hashlib.sha256(init_msg).digest() != seed_msg[0:32]:
            raise VerifyError("g1 hash chain broken (init digest vs seed preimage)")
        # id = sorted-index+1 of dst_base_hash among the committed hashes
        dst = seed_msg[64:96]
        try:
            idx = sorted(hashes).index(dst)
        except ValueError:
            raise VerifyError("dst_base_hash not among committed hashes") from None
        if id_int != idx + 1:
            raise VerifyError("g1 id not bound to the sorted-hash index")
    else:
        # no_auth: the reference's own data flow gives the secret no hash
        # anchor (the seed-exchange hash is auth-gated, verification.rs:30),
        # so the binding is existential, exactly as in the reference's
        # no_auth SP1 proofs.  The id is still committee-anchored: it must
        # be a valid sorted-index+1 into the committed hash set
        # (verification.rs:50-66 — get_index_in_commitments succeeded
        # before the curve check was ever recorded).
        if not 1 <= id_int <= len(hashes):
            raise VerifyError("g1 id outside the committed committee range")

    out_a, out_b = air.out_points(publics)
    if out_a == out_b:
        raise VerifyError(
            "g1 relation shows a VALID share — no slashable fault to prove"
        )


def _verify_g1mul_gadget(
    entry: dict,
    stream: bytes,
    sha_ctx,
    config: StarkConfig,
    challenger: DuplexChallenger,
    auth: bool,
    circuit_name: str,
) -> int:
    """Verify a tall-chip curve-relation gadget (stark/g1mul_air.py).

    The chip STARK proves the scalar-mul chains; ``curve_glue``
    re-derives the DKG statement host-side (Horner recombination, column
    sums, Lagrange coefficients, sorted-id assignment, SHA-preimage and
    stream bindings) and checks every chip public against it.  Returns the
    number of BLS/ECDSA signature checks re-run from committed data."""
    from ..stark.g1mul_air import G1MulAir
    from . import curve_glue

    chain_bits = tuple(int(v) for v in entry.get("block_counts", []))
    if not chain_bits or len(chain_bits) > 64:
        raise VerifyError("g1mul chain count out of range")
    if any(not 8 <= b <= 256 or b % 8 for b in chain_bits):
        raise VerifyError("g1mul chain width out of range")
    if sum(b * 7 + 2 for b in chain_bits) > curve_glue.MAX_CHAIN_ROWS:
        raise VerifyError("g1mul table too tall")
    air = G1MulAir(chain_bits)
    publics = [int(v) for v in entry["proof"]["public_values"]]
    try:
        air.check_publics(publics)
    except ValueError as e:
        raise VerifyError(f"g1mul publics: {e}") from None
    stark_verify(air, entry["proof"], publics, config, challenger)
    try:
        _, sig_checks = curve_glue.verify_gadget_glue(
            air,
            publics,
            [int(v) for v in entry.get("extras", [])],
            stream,
            sha_ctx,
            auth,
            circuit_name,
        )
    except curve_glue.GlueError as e:
        raise VerifyError(f"g1mul binding: {e}") from None
    return sig_checks


def _verify_chacha_gadget(
    entry: dict,
    stream: bytes,
    sha_ctx,
    config: StarkConfig,
    challenger: DuplexChallenger,
) -> None:
    """Verify the ChaCha20 keystream table and its bindings.

    Per invocation: counters run 0..nb-1 with one key/nonce; the key is the
    SHA table's digest of the compressed ECDH point and nonce = key[:12]
    (the reference guest's derivation, main.rs:16-30); the ciphertext at
    the descriptor's stream offset has the claimed length, so the verifier
    can recompute plaintext = ciphertext XOR keystream."""
    bcs = [int(v) for v in entry["block_counts"]]
    offsets = entry.get("stream_offsets", [])
    extras = [int(v) for v in entry.get("extras", [])]
    if not 1 <= len(bcs) <= 16 or len(offsets) != len(bcs):
        raise VerifyError("chacha invocation count out of range")
    if any(not 1 <= b <= 16 for b in bcs):
        raise VerifyError("chacha block count out of range")
    if len(extras) != 1 + 2 * len(bcs):
        raise VerifyError("chacha extras malformed")
    total_blocks = extras[0]
    if not sum(bcs) <= total_blocks <= 64:
        raise VerifyError("chacha total block count out of range")
    c_air = ChaCha20Air(total_blocks)
    c_publics = [int(v) for v in entry["proof"]["public_values"]]
    try:
        c_air.check_publics(c_publics)
    except ValueError as e:
        raise VerifyError(f"chacha publics: {e}") from None
    stark_verify(c_air, entry["proof"], c_publics, config, challenger)
    gb = 0
    for i, nb in enumerate(bcs):
        ct_len, key_msg = extras[1 + 2 * i], extras[2 + 2 * i]
        key0, ctr0, nonce0 = init_from_publics(c_publics, gb)
        if ctr0 != 0 or nonce0 != key0[:12]:
            raise VerifyError("chacha init violates the key-derivation convention")
        for j in range(1, nb):
            kj, cj, nj = init_from_publics(c_publics, gb + j)
            if kj != key0 or nj != nonce0 or cj != j:
                raise VerifyError("chacha keystream blocks are not consecutive")
        if sha_ctx is None:
            raise VerifyError("chacha gadget requires the SHA-256 table")
        sha_air, sha_publics = sha_ctx
        if not 0 <= key_msg < sha_air.num_messages:
            raise VerifyError("chacha key message index out of range")
        if digest_from_publics(sha_air, sha_publics, key_msg) != key0:
            raise VerifyError("chacha key not bound to the ECDH digest")
        if not 1 <= ct_len <= 64 * nb or -(-ct_len // 64) != nb:
            raise VerifyError("chacha ciphertext length inconsistent with blocks")
        off = offsets[i]
        if off is not None:
            off = int(off)
            if not 0 <= off <= len(stream) - 2 * ct_len:
                raise VerifyError("chacha ciphertext offset out of range")
            try:
                bytes.fromhex(stream[off : off + 2 * ct_len].decode("ascii"))
            except (UnicodeDecodeError, ValueError):
                raise VerifyError(
                    "chacha ciphertext not bound to the committed stream"
                ) from None
        gb += nb


def prove_batch(
    circuit_name: str,
    datas,
    auth: bool,
    config: StarkConfig = DEFAULT_CONFIG,
    setup: str = "secp-commitment",
    mesh=None,
) -> list:
    """Prove a batch of independent scenarios (BASELINE.json's batched
    multi-proof configuration).

    Single device: device phase functions are compiled once per trace shape
    and reused across the batch.  With a ``mesh`` carrying a ``dp`` axis,
    the batch is SHARDED over the data-parallel device groups: each proof's
    device work is dispatched to its group's device (proofs are mutually
    independent, so dp is proof-level parallelism — SURVEY.md §2.3 DP row);
    per-proof transcripts run on host threads while device execution
    overlaps.  Proof bytes are identical to the sequential path (each proof
    verifies standalone)."""
    datas = list(datas)
    dp_devices = None
    if mesh is not None and "dp" in getattr(mesh, "axis_names", ()):
        dp = mesh.shape["dp"]
        if dp > 1 and len(datas) > 1:
            # one representative device per dp group
            import numpy as _np

            dev_grid = _np.asarray(mesh.devices)
            axis = list(mesh.axis_names).index("dp")
            dev_grid = _np.moveaxis(dev_grid, axis, 0).reshape(dp, -1)
            dp_devices = [dev_grid[i, 0] for i in range(dp)]
    if dp_devices is None:
        return [prove_circuit(circuit_name, d, auth, config, setup) for d in datas]

    import concurrent.futures

    import jax

    def one(i_data):
        i, data = i_data
        with jax.default_device(dp_devices[i % len(dp_devices)]):
            return prove_circuit(circuit_name, data, auth, config, setup)

    with concurrent.futures.ThreadPoolExecutor(
        max_workers=len(dp_devices)
    ) as pool:
        return list(pool.map(one, enumerate(datas)))


def save_proof(container: dict, path: str) -> None:
    with open(path, "wb") as f:
        f.write(cbor.encode(container))


def load_proof(path: str) -> dict:
    with open(path, "rb") as f:
        return cbor.decode(f.read())
