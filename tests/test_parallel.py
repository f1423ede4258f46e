"""Multi-chip logic tests on the virtual 8-device CPU mesh: the distributed
kernels must be bit-identical to their single-device counterparts at any
sharding (the determinism contract SURVEY.md §4 prescribes)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dvt_circuits_tpu.field import babybear as bb
from dvt_circuits_tpu.ntt import ntt
from dvt_circuits_tpu.parallel.dist_merkle import dist_merkle_root
from dvt_circuits_tpu.parallel.dist_ntt import dist_ntt, four_step_ntt, undigit
from dvt_circuits_tpu.parallel.dist_prover import dist_commit_step
from dvt_circuits_tpu.parallel.mesh import make_mesh
from dvt_circuits_tpu.pcs.merkle import MerkleTree

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


class TestDistNtt:
    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_matches_single_device(self, rng, n_dev):
        mesh = make_mesh({"sp": n_dev}, devices=jax.devices()[:n_dev])
        x = rng.integers(0, bb.P, size=(1024,), dtype=np.uint32)
        xm = bb.to_mont(jnp.asarray(x))
        got = np.asarray(dist_ntt(xm, mesh))
        want = np.asarray(four_step_ntt(xm, 5))
        assert np.array_equal(got, want)

    def test_digit_order_vs_natural(self, rng):
        x = rng.integers(0, bb.P, size=(256,), dtype=np.uint32)
        xm = bb.to_mont(jnp.asarray(x))
        digit = np.asarray(four_step_ntt(xm, 4))
        nat = np.asarray(ntt(xm))
        assert np.array_equal(undigit(digit[None, :], 8)[0], nat)


class TestDistMerkle:
    def test_root_sharding_invariant(self, rng):
        mat = rng.integers(0, bb.P, size=(512, 4), dtype=np.uint32)
        mm = bb.to_mont(jnp.asarray(mat))
        single = np.asarray(MerkleTree(mm).levels[-1][0])
        for n_dev in (2, 8):
            mesh = make_mesh({"sp": n_dev}, devices=jax.devices()[:n_dev])
            got = np.asarray(dist_merkle_root(mm, mesh))
            assert np.array_equal(got, single), n_dev


class TestDistCommitStep:
    def test_roots_match_single_chip(self, rng):
        mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
        traces = rng.integers(0, bb.P, size=(2, 256, 4), dtype=np.uint32)
        roots = np.asarray(dist_commit_step(jnp.asarray(traces), mesh))
        log_n = 8
        for i in range(2):
            x = bb.to_mont(jnp.asarray(traces[i]))
            evals = four_step_ntt(x.T, log_n // 2).T
            want = np.asarray(MerkleTree(evals).levels[-1][0])
            assert np.array_equal(roots[i], want), i


@pytest.mark.heavy  # runs the FULL driver dryrun (real container proved
# distributed + EP) — the driver executes the same entry point itself on
# every round; keeping it default doubled suite wall time
def test_graft_entry_points():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    g.dryrun_multichip(8)


@pytest.mark.heavy  # standalone EP demo; production EP is covered by the
# default test_dist_stark EP test + the driver dryrun stage 1b
class TestEpTables:
    def test_roots_match_single_device(self, rng):
        from dvt_circuits_tpu.ntt import coset_lde
        from dvt_circuits_tpu.parallel.ep_tables import ep_commit_tables, pad_tables

        # ragged "AIR chip" tables like a multi-table shard
        tables = pad_tables(
            [
                rng.integers(0, bb.P, size=(96, 3), dtype=np.uint32),
                rng.integers(0, bb.P, size=(128, 5), dtype=np.uint32),
                rng.integers(0, bb.P, size=(64, 5), dtype=np.uint32),
                rng.integers(0, bb.P, size=(128, 2), dtype=np.uint32),
            ]
        )
        mesh = make_mesh({"ep": 4}, devices=jax.devices()[:4])
        roots = np.asarray(ep_commit_tables(tables, mesh))
        for k in range(tables.shape[0]):
            lde = coset_lde(bb.to_mont(jnp.asarray(tables[k])), 1, axis=0)
            want = np.asarray(MerkleTree(lde).levels[-1][0])
            assert np.array_equal(roots[k], want), k

    def test_bad_table_count(self, rng):
        from dvt_circuits_tpu.parallel.ep_tables import ep_commit_tables

        mesh = make_mesh({"ep": 4}, devices=jax.devices()[:4])
        with pytest.raises(ValueError):
            ep_commit_tables(np.zeros((3, 8, 2), np.uint32), mesh)


@pytest.mark.heavy  # PP stage-pipeline demo (XLA CPU compile-bound)
class TestPpPipeline:
    @pytest.mark.parametrize("n_stages", [3, 4, 8])
    def test_roots_match_sequential(self, rng, n_stages):
        from dvt_circuits_tpu.ntt import coset_lde
        from dvt_circuits_tpu.parallel.pp_pipeline import pp_commit_pipeline

        mesh = make_mesh({"pp": n_stages}, devices=jax.devices()[:n_stages])
        traces = rng.integers(0, bb.P, size=(5, 64, 4), dtype=np.uint32)
        roots = np.asarray(pp_commit_pipeline(jnp.asarray(traces), mesh))
        for i in range(traces.shape[0]):
            lde = coset_lde(bb.to_mont(jnp.asarray(traces[i])), 1, axis=0)
            want = np.asarray(MerkleTree(lde).levels[-1][0])
            assert np.array_equal(roots[i], want), i

    def test_too_few_stages(self, rng):
        from dvt_circuits_tpu.parallel.pp_pipeline import pp_commit_pipeline

        mesh = make_mesh({"pp": 2}, devices=jax.devices()[:2])
        with pytest.raises(ValueError):
            pp_commit_pipeline(np.zeros((2, 64, 4), np.uint32), mesh)
