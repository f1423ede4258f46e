"""Pallas Poseidon2 kernel vs the XLA reference (bit-identical).

Runs only on a real TPU backend: Mosaic doesn't target CPU and interpret
mode takes minutes for the unrolled 22-round kernel.  (The kernel is also
exercised by bench.py on hardware.)"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dvt_circuits_tpu.field import babybear as bb
from dvt_circuits_tpu.hash.poseidon2 import poseidon2_permute


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="Mosaic kernels need TPU")
def test_pallas_matches_xla():
    from dvt_circuits_tpu.hash.poseidon2_pallas import poseidon2_permute_pallas

    rng = np.random.default_rng(0)
    states = rng.integers(0, bb.P, size=(700, 16), dtype=np.uint32)
    sm = bb.to_mont(jnp.asarray(states))
    a = np.asarray(poseidon2_permute(sm))
    b = np.asarray(poseidon2_permute_pallas(sm))
    assert np.array_equal(a, b)
