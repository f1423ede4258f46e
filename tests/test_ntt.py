"""NTT/LDE correctness against naive O(N²) integer evaluation."""

import numpy as np
import pytest

from dvt_circuits_tpu.field import babybear as bb
from dvt_circuits_tpu.ntt import coset_lde, intt, ntt


def naive_ntt(coeffs, n):
    w = bb.two_adic_generator(n.bit_length() - 1)
    return [
        sum(c * pow(w, i * j, bb.P) for j, c in enumerate(coeffs)) % bb.P
        for i in range(n)
    ]


@pytest.mark.parametrize("log_n", [0, 1, 3, 6, 10])
def test_ntt_matches_naive(log_n):
    n = 1 << log_n
    rng = np.random.default_rng(log_n)
    coeffs = rng.integers(0, bb.P, size=n, dtype=np.uint32)
    got = np.asarray(bb.from_mont(ntt(bb.to_mont(coeffs))))
    want = naive_ntt([int(c) for c in coeffs], n)
    assert got.tolist() == want


def test_ntt_roundtrip_batched():
    rng = np.random.default_rng(7)
    x = rng.integers(0, bb.P, size=(5, 256), dtype=np.uint32)
    xm = bb.to_mont(x)
    back = np.asarray(bb.from_mont(intt(ntt(xm))))
    assert np.array_equal(back, x)
    back2 = np.asarray(bb.from_mont(ntt(intt(xm))))
    assert np.array_equal(back2, x)


def test_ntt_axis():
    rng = np.random.default_rng(8)
    x = rng.integers(0, bb.P, size=(64, 3), dtype=np.uint32)
    xm = bb.to_mont(x)
    a = np.asarray(ntt(xm, axis=0))
    b = np.asarray(ntt(xm.T).T)
    assert np.array_equal(a, b)


def test_coset_lde_agrees_with_direct_eval():
    log_n, log_blowup = 4, 2
    n = 1 << log_n
    shift = bb.GENERATOR
    rng = np.random.default_rng(9)
    coeffs = [int(c) for c in rng.integers(0, bb.P, size=n, dtype=np.uint32)]
    evals_h = naive_ntt(coeffs, n)

    lde = np.asarray(
        bb.from_mont(
            coset_lde(bb.to_mont(np.array(evals_h, dtype=np.uint32)), log_blowup, shift)
        )
    )
    big_n = n << log_blowup
    wk = bb.two_adic_generator(log_n + log_blowup)
    for i in range(0, big_n, 7):
        x = shift * pow(wk, i, bb.P) % bb.P
        want = 0
        for j in reversed(range(n)):
            want = (want * x + coeffs[j]) % bb.P
        assert int(lde[i]) == want, f"mismatch at {i}"


def test_lde_prefix_consistency():
    """The LDE restricted to K-indices that hit shift·H must equal p(shift·ω_H^j)."""
    log_n, log_blowup = 5, 1
    n = 1 << log_n
    rng = np.random.default_rng(10)
    evals = rng.integers(0, bb.P, size=n, dtype=np.uint32)
    lde = np.asarray(bb.from_mont(coset_lde(bb.to_mont(evals), log_blowup)))
    # index 2i in K corresponds to ω_K^{2i} = ω_H^i
    sub = lde[:: 1 << log_blowup]
    # evaluating p at shift·ω_H^i — recompute directly
    coeffs = np.asarray(bb.from_mont(intt(bb.to_mont(evals))))
    wh = bb.two_adic_generator(log_n)
    for i in range(0, n, 5):
        x = bb.GENERATOR * pow(wh, i, bb.P) % bb.P
        want = 0
        for j in reversed(range(n)):
            want = (want * x + int(coeffs[j])) % bb.P
        assert int(sub[i]) == want


def test_fourstep_matches_core():
    # the TPU fast path (sublane butterflies + transpose) vs the direct
    # lane-axis implementation, both directions, odd and even log sizes
    import jax.numpy as jnp

    from dvt_circuits_tpu.ntt.ntt import _ntt_core, _ntt_fourstep

    rng = np.random.default_rng(42)
    for log_n in (10, 11):
        x = bb.to_mont(jnp.asarray(rng.integers(0, bb.P, size=(1 << log_n,), dtype=np.uint32)))
        for inverse in (False, True):
            a = np.asarray(_ntt_core(x, log_n, inverse))
            b = np.asarray(_ntt_fourstep(x, log_n, inverse))
            assert np.array_equal(a, b), (log_n, inverse)
