"""Device-mesh helpers.

The parallelism axes of the proving stack (SURVEY.md §2.3):

  * ``dp`` — data parallel: independent proofs / witness shards
  * ``sp`` — sequence parallel: NTT row dimension, butterfly all-to-all
  * ``tp`` — tensor parallel: trace columns (per-column LDE/Merkle is local)

The reference has no distributed execution at all; these axes are net-new,
first-class components of the TPU build.  Collectives ride ICI within a
slice (psum / all_gather / all_to_all inside shard_map); nothing here ever
issues NCCL/MPI-style calls.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh over the given axes, e.g. {"dp": 2, "sp": 4}.

    Defaults to a 1-D ``sp`` mesh over all devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"sp": len(devices)}
    total = 1
    for v in axes.values():
        total *= v
    if total != len(devices):
        raise ValueError(f"mesh axes {axes} need {total} devices, have {len(devices)}")
    import numpy as np

    arr = np.array(devices).reshape(*axes.values())
    return Mesh(arr, tuple(axes))
