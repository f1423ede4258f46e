import os
import sys
from pathlib import Path

# Multi-chip logic tests run on a virtual 8-device CPU mesh.  The environment
# boots JAX against the real TPU tunnel (sitecustomize imports jax with
# JAX_PLATFORMS=axon before pytest starts), so flipping the env var is not
# enough — update the live config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
# The 8-device mesh would auto-trigger prove_circuit's DISTRIBUTED path
# (production behavior) in every proving test; pin tests to the
# single-device backends — dist/EP are tested explicitly
# (test_dist_stark.py, the driver dryrun).
os.environ.setdefault("DVT_DIST", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Heavy full-size proving suites run only when opted in: the default
    `make test` must fit a CI budget (VERDICT r3 item 8 — the reference's
    CI finishes in minutes, rust.yml:20-31).  A fast prove/verify smoke
    stays in the default path (test_pipeline_smoke.py)."""
    if os.environ.get("DVT_HEAVY_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="heavy proving test (set DVT_HEAVY_TESTS=1 or run `make heavy-test`)"
    )
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)
