#!/usr/bin/env python3
"""Run the reference's example inputs through the framework.

Mirrors script/run_all_examples.sh with the bit-rot consciously fixed
(SURVEY.md §2.1): correct filenames, correct spec paths, and the examples'
actual setup — they carry 48-byte BLS commitment keys, which the reference
host (pinned to secp identities) cannot even deserialize; the `--setup
bls-commitment` extension runs them.  `bad_encrypted_bad_share.json` uses a
legacy field layout and is expected to fail deserialization.
"""

import json
import subprocess
import sys
from pathlib import Path

EXAMPLES = Path("/root/reference/examples")
REPO = Path(__file__).resolve().parent.parent

CASES = [
    # (file, circuit, setup, expected_exit)
    ("dvt_bad_share.json", "bad-share", "bls-commitment", 0),
    ("finalization_test.json", "finalization", "bls-commitment", 0),
    ("bad_partial_key.json", "bad-partial-key", "bls-commitment", 0),
    ("bad_encrypted_bad_share.json", "bad-encrypted-share", "bls-commitment", 1),  # legacy layout
]


def main() -> int:
    failures = 0
    for fname, circuit, setup, expected in CASES:
        cmd = [
            sys.executable,
            "-m",
            "dvt_circuits_tpu.cli",
            "--setup",
            setup,
            "execute",
            f"--type={circuit}",
            "-i",
            str(EXAMPLES / fname),
        ]
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        status = "OK" if proc.returncode == expected else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"[{status}] {fname} ({circuit}): exit {proc.returncode} (expected {expected})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
