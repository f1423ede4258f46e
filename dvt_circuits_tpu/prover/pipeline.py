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

Round-1 proof semantics: the STARK certifies the integrity binding of the
witness program's committed output stream (circuit id, auth mode, stream
bytes → Poseidon2 digest).  Arithmetization of the DKG verification logic
itself (SHA-256 / BLS gadget AIRs, so the verifier need not trust witness
re-execution) is the staged roadmap — see README.md.
"""

from __future__ import annotations

import time
from typing import Optional

from ..circuits.guest_api import GuestResult, run_guest
from ..circuits.registry import CIRCUITS, get_circuit
from ..stark import prove as stark_prove
from ..stark import verify as stark_verify
from ..stark.config import DEFAULT_CONFIG, StarkConfig
from ..stark.poseidon2_air import (
    Poseidon2StreamAir,
    hash_stream_words,
    stream_to_words,
)
from ..stark.verifier import StarkError
from ..utils import cbor

PROOF_FORMAT = "dvt-circuits-tpu/stark-proof/v1"

_CIRCUIT_IDS = {name: i + 1 for i, name in enumerate(sorted(CIRCUITS))}


class ProveError(RuntimeError):
    pass


class VerifyError(RuntimeError):
    pass


def execute_circuit(
    circuit_name: str, data, auth: bool, setup: str = "secp-commitment"
) -> GuestResult:
    """CBOR-encode typed data and run the witness program (execute mode)."""
    spec = get_circuit(circuit_name, setup)
    payload = cbor.encode(data.to_json(auth))
    return run_guest(spec.guest, payload, auth)


def _stream_words(circuit_name: str, auth: bool, setup: str, stream: bytes) -> list:
    """Absorption stream: circuit-identity header + byte stream as words."""
    header = [
        _CIRCUIT_IDS[circuit_name],
        int(auth),
        int(setup == "bls-commitment"),
        len(stream),
    ]
    return header + stream_to_words(stream)


def prove_circuit(
    circuit_name: str,
    data,
    auth: bool,
    config: StarkConfig = DEFAULT_CONFIG,
    setup: str = "secp-commitment",
) -> dict:
    """Execute the witness and produce the binding proof container."""
    t0 = time.time()
    result = execute_circuit(circuit_name, data, auth, setup)
    if result.exit_code != 0:
        raise ProveError(
            f"witness execution failed (guest panic): {result.panic_message}"
        )
    words = _stream_words(circuit_name, auth, setup, result.public_values)
    num_chunks = max(1, -(-len(words) // 8))
    air = Poseidon2StreamAir(num_chunks)
    trace, publics = air.generate_trace(words)
    witness_time = time.time() - t0

    t0 = time.time()
    stark = stark_prove(air, trace, publics, config)
    prove_time = time.time() - t0

    return {
        "format": PROOF_FORMAT,
        "circuit": circuit_name,
        "setup": setup,
        "auth": auth,
        "public_values": result.public_values.hex(),
        "commit_count": result.commit_count,
        "stark": stark,
        "config": {
            "log_blowup": config.log_blowup,
            "num_queries": config.num_queries,
            "proof_of_work_bits": config.proof_of_work_bits,
            "log_final_poly_len": config.log_final_poly_len,
            "shift": config.shift,
        },
        "timing": {"witness_ms": int(witness_time * 1000), "prove_ms": int(prove_time * 1000)},
    }


def verify_proof(container: dict, circuit_name: Optional[str] = None) -> bool:
    """Verify a proof container; raises VerifyError on failure."""
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

    words = _stream_words(name, auth, setup, stream)
    num_chunks = max(1, -(-len(words) // 8))
    air = Poseidon2StreamAir(num_chunks)
    padded = [w % 2013265921 for w in words] + [0] * (8 * num_chunks - len(words))
    digest = hash_stream_words(padded)
    publics = padded + digest

    try:
        stark_verify(air, container["stark"], publics, config)
    except StarkError as e:
        raise VerifyError(f"STARK verification failed: {e}") from None
    except (KeyError, TypeError, ValueError) as e:
        raise VerifyError(f"malformed proof: {e}") from None
    return True


def prove_batch(
    circuit_name: str,
    datas,
    auth: bool,
    config: StarkConfig = DEFAULT_CONFIG,
    setup: str = "secp-commitment",
) -> list:
    """Prove a batch of independent scenarios (BASELINE.json's batched
    multi-proof configuration).  Device phase functions are compiled once
    per trace shape and reused across the batch; the per-proof transcripts
    stay independent (each proof verifies standalone)."""
    return [prove_circuit(circuit_name, d, auth, config, setup) for d in datas]


def save_proof(container: dict, path: str) -> None:
    with open(path, "wb") as f:
        f.write(cbor.encode(container))


def load_proof(path: str) -> dict:
    with open(path, "rb") as f:
        return cbor.decode(f.read())
