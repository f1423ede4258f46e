"""Circuit registry: kebab-case CLI names → witness programs + data types.

Mirrors the host's CircuitType enum (src/main.rs:36-42) and its dispatch to
the four embedded guest ELFs (src/main.rs:115-118).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ..dkg.keys import BlsDkgWithBlsCommitment, BlsDkgWithSecp256kCommitment
from ..dkg.types import (
    BadEncryptedShare,
    BadPartialShareData,
    FinalizationData,
    SharedData,
)
from . import bad_encrypted_share, bad_partial_key, bad_share, finalization


@dataclass(frozen=True)
class CircuitSpec:
    name: str  # CLI name (kebab-case)
    guest: Callable  # guest main(ctx, input_bytes, auth)
    data_type: type  # typed input (has from_json/to_json)
    setup: type  # DKG setup bundle
    schema_name: str  # schemars root title
    spec_file: str  # generated schema file stem (script/gen_spec.sh)


CIRCUITS = {
    "bad-share": CircuitSpec(
        name="bad-share",
        guest=bad_share.main,
        data_type=SharedData,
        setup=BlsDkgWithSecp256kCommitment,
        schema_name="SharedData",
        spec_file="share_exchange_spec",
    ),
    "finalization": CircuitSpec(
        name="finalization",
        guest=finalization.main,
        data_type=FinalizationData,
        setup=BlsDkgWithBlsCommitment,
        schema_name="FinalizationData",
        spec_file="finalization_spec",
    ),
    "bad-partial-key": CircuitSpec(
        name="bad-partial-key",
        guest=bad_partial_key.main,
        data_type=BadPartialShareData,
        setup=BlsDkgWithSecp256kCommitment,
        schema_name="BadPartialShareData",
        spec_file="bad_partial_key_spec",
    ),
    "bad-encrypted-share": CircuitSpec(
        name="bad-encrypted-share",
        guest=bad_encrypted_share.main,
        data_type=BadEncryptedShare,
        setup=BlsDkgWithSecp256kCommitment,
        schema_name="BadEncryptedShare",
        spec_file="bad_encrypted_partial_key_spec",
    ),
}


def get_circuit(name: str) -> CircuitSpec:
    if name not in CIRCUITS:
        raise KeyError(
            f"unknown circuit type {name!r}; expected one of {sorted(CIRCUITS)}"
        )
    return CIRCUITS[name]
