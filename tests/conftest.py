import os
import sys
from pathlib import Path

# Multi-chip logic tests run on a virtual 8-device CPU mesh.  The environment
# boots JAX against the real TPU tunnel (sitecustomize imports jax with
# JAX_PLATFORMS=axon before pytest starts), so flipping the env var is not
# enough — update the live config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
