"""Native host library (native/dvt_native.cpp) vs the pure-Python reference."""

import numpy as np
import pytest

from dvt_circuits_tpu.hash import poseidon2 as p2
from dvt_circuits_tpu.utils import native


@pytest.mark.skipif(native.load() is None, reason="native toolchain unavailable")
def test_native_permutation_matches_python():
    rng = np.random.default_rng(0)
    for _ in range(10):
        st = [int(x) for x in rng.integers(0, p2.bb.P, 16)]
        assert native.s_permute_native(st) == p2._s_permute_py(st)


def test_s_permute_dispatch_consistent():
    st = list(range(16))
    assert p2.s_permute(st) == p2._s_permute_py(st)
