import os
import sys
from pathlib import Path

# Multi-chip logic tests run on a virtual CPU mesh; force the platform before
# any JAX import (the environment defaults JAX_PLATFORMS to the real TPU
# tunnel, which would remote-compile every tiny test kernel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
