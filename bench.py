"""Benchmark harness (runs on the real TPU chip under the driver).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline here is
the per-chip roofline estimate for the measured kernel: vs_baseline is the
fraction of estimated speed-of-light achieved (north-star target ≥ 0.8).
Detailed sub-benchmarks go to stderr.
"""

import json
import sys
import time

import numpy as np


def _sync(out):
    """Force completion: fetch one element to host.  ``block_until_ready``
    alone does not wait for device execution under the axon TPU tunnel, so a
    (tiny) device→host read of a value that depends on the result is the
    only reliable fence."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def _bench(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        _sync(fn(*args))
    # subtract the sync fence's own round-trip (measured on the warm result)
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    _sync(out)
    fence = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return max(1e-9, (time.perf_counter() - t0 - fence) / iters)


def main():
    import jax
    import jax.numpy as jnp

    from dvt_circuits_tpu.field import babybear as bb
    from dvt_circuits_tpu.hash.poseidon2 import poseidon2_permute
    from dvt_circuits_tpu.hash.poseidon2_pallas import permute_lanes
    from dvt_circuits_tpu.ntt import ntt
    from dvt_circuits_tpu.pcs.merkle import build_levels

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() == "tpu"
    print(f"# device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(0)

    # --- Poseidon2 permutation throughput ---------------------------------
    # On TPU the production layout is transposed (16, N): batch on VPU lanes,
    # all 22 rounds VMEM-resident (hash/poseidon2_pallas.py, used by the
    # Merkle tree build).  Elsewhere fall back to the XLA (N, 16) path.
    batch = 1 << 20 if on_tpu else 1 << 17
    if on_tpu:
        states = jnp.asarray(
            rng.integers(0, bb.P, size=(16, batch), dtype=np.uint32)
        )
        perm = permute_lanes
    else:
        states = jnp.asarray(
            rng.integers(0, bb.P, size=(batch, 16), dtype=np.uint32)
        )
        perm = jax.jit(poseidon2_permute)
    t = _bench(perm, states)
    perms_per_s = batch / t
    # roofline: ~22k uint32 VPU ops per permutation at ~4e12 int32 op/s (v5e)
    P2_ROOFLINE = 4e12 / 22e3
    print(
        f"# poseidon2: {perms_per_s:.3e} perm/s ({t*1e3:.2f} ms/batch, "
        f"{perms_per_s/P2_ROOFLINE:.2%} of roofline est)",
        file=sys.stderr,
    )

    # --- NTT throughput ----------------------------------------------------
    log_n = 20
    x = bb.to_mont(
        jnp.asarray(rng.integers(0, bb.P, size=(1 << log_n,), dtype=np.uint32))
    )
    ntt_fn = jax.jit(lambda v: ntt(v))
    t_ntt = _bench(ntt_fn, x, iters=20)
    elems_per_s = (1 << log_n) / t_ntt
    # roofline: HBM-bound — each of ~2·(log_n/2)+4 stage passes streams every
    # element (read+write, 4B each) at ~819 GB/s (v5e)
    NTT_ROOFLINE = 819e9 / (8 * (log_n + 4))
    print(
        f"# ntt 2^{log_n}: {t_ntt*1e3:.2f} ms, {elems_per_s:.3e} elem/s "
        f"({elems_per_s/NTT_ROOFLINE:.2%} of roofline est)",
        file=sys.stderr,
    )

    # --- Merkle commit throughput ------------------------------------------
    mat = bb.to_mont(
        jnp.asarray(rng.integers(0, bb.P, size=(1 << 16, 8), dtype=np.uint32))
    )
    t_mk = _bench(lambda m: build_levels(m)[-1], mat)
    leaves_per_s = (1 << 16) / t_mk
    print(
        f"# merkle 2^16 leaves: {t_mk*1e3:.2f} ms, {leaves_per_s:.3e} leaves/s",
        file=sys.stderr,
    )

    # --- native host crypto (witness-generation hot path) ------------------
    try:
        from dvt_circuits_tpu.hostcrypto import bls12_381 as bls

        sk = 123456789
        pk = bls.g1_mul(bls.G1_GEN, sk)
        H = bls.hash_to_g2(b"bench")
        sig = bls.g2_mul(H, sk)
        t0 = time.perf_counter()
        ok = bls.pairings_equal(pk, H, bls.G1_GEN, sig)
        t_pair = time.perf_counter() - t0
        assert ok
        print(
            f"# bls verify (2 pairings, native C++): {t_pair*1e3:.1f} ms",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# bls bench skipped: {e}", file=sys.stderr)

    # --- Keccak-256 permutation throughput ----------------------------------
    try:
        from dvt_circuits_tpu.hash.keccak import keccak_f1600 as _kf

        kb = 1 << 15
        lo = jnp.asarray(rng.integers(0, 1 << 32, size=(kb, 25), dtype=np.uint32))
        hi = jnp.asarray(rng.integers(0, 1 << 32, size=(kb, 25), dtype=np.uint32))
        kfn = jax.jit(_kf)
        t_k = _bench(kfn, lo, hi)
        print(
            f"# keccak-f1600: {kb/t_k:.3e} perm/s ({t_k*1e3:.2f} ms/batch)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# keccak bench skipped: {e}", file=sys.stderr)

    # --- BLS12-381 MSM on-device (north-star kernel) ------------------------
    try:
        from dvt_circuits_tpu.curve import g1 as tg1
        from dvt_circuits_tpu.hostcrypto import bls12_381 as bls

        npts = 64
        pts = [bls.g1_mul(bls.G1_GEN, 7 * i + 3) for i in range(npts)]
        scs = [int(rng.integers(1, 1 << 62)) for _ in range(npts)]
        p_dev = tg1.from_affine_points(pts)
        d_dev = tg1.scalars_to_digits(scs)
        t_m = _bench(lambda a, b: tg1._msm_jit(a, b), p_dev, d_dev, warmup=1, iters=3)
        print(
            f"# g1 msm ({npts} pts, 256-bit): {t_m*1e3:.0f} ms, "
            f"{npts/t_m:.1f} scalar-muls/s equivalent",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# msm bench skipped: {e}", file=sys.stderr)

    # --- end-to-end proofs: all four circuits (v5 multi-table, one dispatch;
    # bad-share carries the in-circuit G1 curve-relation table) -------------
    bench_t0 = time.perf_counter()
    try:
        import json as _json

        from dvt_circuits_tpu.circuits.registry import get_circuit
        from dvt_circuits_tpu.prover.pipeline import (
            prove_batch,
            prove_circuit,
            verify_proof,
        )
        from dvt_circuits_tpu.stark.config import StarkConfig
        from dvt_circuits_tpu.utils import cbor

        from dvt_circuits_tpu.dkg.scenario_gen import DkgCommittee

        cfg = StarkConfig(num_queries=40, proof_of_work_bits=12)
        # bad-share uses the generated poly-mismatch fault so the proof
        # carries the in-circuit G1 curve table (the reference's own exit-0
        # share vectors fault before the curve check); the rest are
        # reference golden vectors
        vecs = {
            "bad-share": None,
            "finalization": "auth/finalization/report-1.json",
            "bad-partial-key": "auth/wrong_final_key_generation/badreport-1-gen-bad-partial-pubkey.json",
            "bad-encrypted-share": "auth/bad_encrypted_share/seeds-commitment-from-1-to-2-bad-encrypted-msg.json",
        }
        first = None
        for name, rel in vecs.items():
            if time.perf_counter() - bench_t0 > 2400 and first is not None:
                print(f"# {name} proof skipped (bench time budget)", file=sys.stderr)
                continue
            try:
                spec = get_circuit(name)
                if rel is None:
                    data = DkgCommittee(3, 2).shared_data_bad_secret(0, 1, True)
                else:
                    vec = _json.load(open(f"/root/reference/test_vectors/{rel}"))
                    data = spec.data_type.from_json(
                        vec["scenario"], spec.setup.layout, True
                    )
                prove_circuit(name, data, True, cfg)  # warm the caches
                t0 = time.perf_counter()
                container = prove_circuit(name, data, True, cfg)
                t_prove = time.perf_counter() - t0
                verify_proof(container)  # warm
                t0 = time.perf_counter()
                verify_proof(container)
                t_verify = time.perf_counter() - t0
                gk = ",".join(g["kind"] for g in container["gadgets"]) or "-"
                print(
                    f"# dkg {name} proof: prove {t_prove*1e3:.0f} ms "
                    f"(witness {container['timing']['witness_ms']} ms), "
                    f"verify {t_verify*1e3:.0f} ms, "
                    f"proof {len(cbor.encode(container))//1024} KiB, "
                    f"tables [{gk}], "
                    f"throughput {1.0/max(t_prove,1e-9):.2f} proofs/s/chip",
                    file=sys.stderr,
                )
                if first is None:
                    first = (name, data, spec)
            except Exception as e:
                print(f"# {name} proof bench skipped: {e}", file=sys.stderr)

        # batched multi-proof throughput (BASELINE.json configs[4])
        if first is not None and time.perf_counter() - bench_t0 < 2400:
            name, data, spec = first
            t0 = time.perf_counter()
            batch = prove_batch(name, [data] * 4, True, cfg)
            t_b = time.perf_counter() - t0
            print(
                f"# batched {name} ×{len(batch)}: {t_b*1e3:.0f} ms total, "
                f"{len(batch)/t_b:.2f} proofs/s/chip sustained",
                file=sys.stderr,
            )
    except Exception as e:  # bench must still emit its one line
        print(f"# proof bench skipped: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "poseidon2_permutations_per_s",
                "value": round(perms_per_s),
                "unit": "perm/s",
                "vs_baseline": round(perms_per_s / P2_ROOFLINE, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
