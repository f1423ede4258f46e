"""Merkle, challenger, and FRI tests."""

import copy

import numpy as np
import pytest
import jax.numpy as jnp

from dvt_circuits_tpu.field import babybear as bb
from dvt_circuits_tpu.field import ext
from dvt_circuits_tpu.ntt import ntt
from dvt_circuits_tpu.pcs.challenger import DuplexChallenger
from dvt_circuits_tpu.pcs.fri import FriConfig, FriError, fri_prove, fri_verify
from dvt_circuits_tpu.pcs.merkle import MerkleTree, verify_opening


class TestMerkle:
    def test_commit_open_verify(self):
        rng = np.random.default_rng(0)
        mat = rng.integers(0, bb.P, size=(64, 5), dtype=np.uint32)
        tree = MerkleTree(bb.to_mont(mat))
        root = tree.root
        for idx in (0, 1, 31, 63):
            row, path = tree.open(idx)
            assert np.array_equal(row, mat[idx])
            assert verify_opening(root, idx, row, path)
            assert not verify_opening(root, idx ^ 1, row, path)
        bad_row = list(mat[0])
        bad_row[0] ^= 1
        row, path = tree.open(0)
        assert not verify_opening(root, 0, bad_row, path)

    def test_different_matrices_different_roots(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, bb.P, size=(8, 3), dtype=np.uint32)
        b = a.copy()
        b[3, 1] ^= 1
        assert not np.array_equal(
            MerkleTree(bb.to_mont(a)).root, MerkleTree(bb.to_mont(b)).root
        )


class TestChallenger:
    def test_deterministic(self):
        a, b = DuplexChallenger(), DuplexChallenger()
        for ch in (a, b):
            ch.observe_many([1, 2, 3])
        assert a.sample() == b.sample()
        assert a.sample_ext() == b.sample_ext()

    def test_order_sensitivity(self):
        a, b = DuplexChallenger(), DuplexChallenger()
        a.observe_many([1, 2])
        b.observe_many([2, 1])
        assert a.sample() != b.sample()

    def test_grind_matches_scalar_check(self):
        ch = DuplexChallenger()
        ch.observe_many([7, 8, 9])
        clone = ch.clone()
        w = ch.grind(6)
        assert clone.check_witness(6, w)
        # both transcripts advanced identically
        assert ch.sample() == clone.sample()

    def test_sample_bits_range(self):
        ch = DuplexChallenger()
        ch.observe(42)
        for bits in (1, 8, 27):
            v = ch.clone().sample_bits(bits)
            assert 0 <= v < (1 << bits)


def _low_degree_codeword(log_n, log_blowup, seed=3):
    n = 1 << log_n
    deg = n >> log_blowup
    rng = np.random.default_rng(seed)
    coeffs = [tuple(int(x) for x in rng.integers(0, bb.P, 4)) for _ in range(deg)]
    arr = np.zeros((n, 4), dtype=np.uint64)
    pw = 1
    for i in range(n):
        if i < deg:
            arr[i] = [int(v) * pw % bb.P for v in coeffs[i]]
        pw = pw * bb.GENERATOR % bb.P
    return ntt(jnp.asarray(bb.np_to_mont(arr)), axis=0)


class TestFri:
    CFG = FriConfig(log_blowup=2, num_queries=12, proof_of_work_bits=6, log_final_poly_len=2)
    LOG_N = 8

    @pytest.fixture(scope="class")
    def setup(self):
        cw = _low_degree_codeword(self.LOG_N, self.CFG.log_blowup)
        proof = fri_prove(cw, bb.GENERATOR, self.CFG, DuplexChallenger())
        return cw, proof

    def _open_input(self, cw):
        cw_std = ext.from_array_mont(cw)
        n = len(cw_std)

        def open_input_batch(indices, v0s, v1s):
            for i, v0, v1 in zip(indices, v0s, v1s):
                assert tuple(int(x) for x in v0) == cw_std[int(i)]
                assert tuple(int(x) for x in v1) == cw_std[int(i) + n // 2]

        return open_input_batch

    def test_roundtrip(self, setup):
        cw, proof = setup
        assert fri_verify(
            proof, bb.GENERATOR, self.LOG_N, self.CFG, DuplexChallenger(), self._open_input(cw)
        )

    def test_tampered_final_poly_rejected(self, setup):
        cw, proof = setup
        bad = copy.deepcopy(proof)
        bad["final_coeffs"][0][0] ^= 1
        with pytest.raises(FriError):
            fri_verify(bad, bb.GENERATOR, self.LOG_N, self.CFG, DuplexChallenger(), self._open_input(cw))

    def test_tampered_leaf_rejected(self, setup):
        cw, proof = setup
        bad = copy.deepcopy(proof)
        blob = bytearray(bad["queries"][2]["rounds"][1]["leaf"])
        blob[3 * 4 + 3] ^= 1  # value 3 of the packed leaf
        bad["queries"][2]["rounds"][1]["leaf"] = bytes(blob)
        with pytest.raises(FriError):
            fri_verify(bad, bb.GENERATOR, self.LOG_N, self.CFG, DuplexChallenger(), self._open_input(cw))

    def test_high_degree_rejected_by_prover(self):
        rng = np.random.default_rng(5)
        arr = rng.integers(0, bb.P, size=(1 << self.LOG_N, 4)).astype(np.uint64)
        with pytest.raises(AssertionError):
            fri_prove(
                jnp.asarray(bb.np_to_mont(arr)), bb.GENERATOR, self.CFG, DuplexChallenger()
            )
