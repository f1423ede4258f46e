"""Shared golden-vector harness.

Replays the reference's integration suite (script/run.sh + test_vectors/):
each vector is ``{params: {cmd_extra_args, expected_exit_code, disabled?},
scenario: {...}}``; the harness reproduces the host pipeline (typed JSON parse
→ CBOR → guest execute) and compares the process-level exit code only,
exactly like script/run.sh:85-96.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

from dvt_circuits_tpu.circuits import get_circuit, run_guest
from dvt_circuits_tpu.dkg.types import DeserializeError
from dvt_circuits_tpu.utils import cbor

REFERENCE_VECTORS = Path(
    os.environ.get("DVT_TEST_VECTORS", "/root/reference/test_vectors")
)


@dataclass
class VectorOutcome:
    path: Path
    expected: int
    got: int
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.expected == self.got


def iter_vectors(root: Path = REFERENCE_VECTORS):
    for variant in ("auth", "no_auth"):
        vdir = root / variant
        if not vdir.is_dir():
            continue
        for suite in sorted(p for p in vdir.iterdir() if p.is_dir()):
            for path in sorted(suite.glob("*.json")):
                yield variant == "auth", path


def parse_circuit_type(cmd_extra_args: str) -> str:
    m = re.search(r"--type[= ]([a-z-]+)", cmd_extra_args)
    if not m:
        raise ValueError(f"cannot find --type in {cmd_extra_args!r}")
    return m.group(1)


def execute_scenario(circuit_name: str, scenario: dict, auth: bool):
    """Host pipeline: typed parse → CBOR → guest.  Returns (exit_code, result)."""
    spec = get_circuit(circuit_name)
    try:
        data = spec.data_type.from_json(scenario, spec.setup.layout, auth)
    except DeserializeError as e:
        return 1, f"host deserialize error: {e}"
    payload = cbor.encode(data.to_json(auth))
    result = run_guest(spec.guest, payload, auth)
    return result.exit_code, result


def run_vector(path: Path, auth: bool) -> Optional[VectorOutcome]:
    doc = json.loads(path.read_text())
    params = doc["params"]
    if params.get("disabled") is True:
        return None
    circuit = parse_circuit_type(params["cmd_extra_args"])
    expected = int(params["expected_exit_code"])
    got, result = execute_scenario(circuit, doc["scenario"], auth)
    detail = ""
    if got != expected:
        detail = getattr(result, "panic_message", None) or str(result)
    return VectorOutcome(path=path, expected=expected, got=got, detail=detail)


def main():
    import sys

    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    passed = failed = 0
    for auth, path in iter_vectors():
        if filt and filt not in str(path):
            continue
        outcome = run_vector(path, auth)
        if outcome is None:
            continue
        if outcome.ok:
            passed += 1
        else:
            failed += 1
            print(f"[FAIL] {path} expected {outcome.expected} got {outcome.got}: {outcome.detail[:200]}")
    print(f"passed={passed} failed={failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
