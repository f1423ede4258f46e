"""Benchmark harness (runs on the real TPU chip under the driver).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline here is
the per-chip roofline estimate for the measured kernel: vs_baseline is the
fraction of estimated speed-of-light achieved (north-star target ≥ 0.8).
Detailed sub-benchmarks go to stderr.

Contract hardening (VERDICT r3 item 1): the JSON line is emitted right
after the headline kernel measurement — BEFORE the heavy end-to-end proof
sections — so a driver timeout mid-proof can never suppress it, and every
subsequent section runs under its own SIGALRM wall-clock guard.
"""

import json
import signal
import sys
import time
from contextlib import contextmanager

import numpy as np

import os

_T_START = time.perf_counter()
#: overall soft budget: proof sections check this before starting.
#: Overridable for cache-warming runs (scripts/warm_caches.sh): the first
#: prove of each table-shape combination triggers a multi-minute XLA
#:  compile that lands in the persistent AOT/compile caches.
TOTAL_BUDGET_S = float(os.environ.get("DVT_BENCH_BUDGET_S", 1500.0))
_SECTION_SCALE = float(os.environ.get("DVT_BENCH_SECTION_SCALE", 1.0))


def _elapsed():
    return time.perf_counter() - _T_START


class SectionTimeout(Exception):
    pass


@contextmanager
def section(name, budget_s):
    """Run a bench section under a SIGALRM wall-clock guard.  A section that
    exceeds its budget (or raises) is reported on stderr and skipped — the
    JSON contract line has already been printed by then."""

    budget_s = budget_s * _SECTION_SCALE

    def _on_alarm(signum, frame):
        raise SectionTimeout(f"{name}: exceeded {budget_s:.0f}s budget")

    old = signal.signal(signal.SIGALRM, _on_alarm)
    # round up: int() truncation of a sub-second scaled budget would pass 0
    # to alarm(), silently CANCELLING the guard (advisor r4 finding)
    signal.alarm(max(1, int(round(budget_s))))
    t0 = time.perf_counter()
    try:
        yield
    except SectionTimeout as e:
        print(f"# {name} skipped: {e}", file=sys.stderr)
    except Exception as e:
        print(f"# {name} skipped: {type(e).__name__}: {e}", file=sys.stderr)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
        print(
            f"# [{name}: {time.perf_counter()-t0:.1f}s, total {_elapsed():.0f}s]",
            file=sys.stderr,
        )


def _sync(out):
    """Force completion: fetch one element to host.  ``block_until_ready``
    alone does not wait for device execution under the axon TPU tunnel, so a
    (tiny) device→host read of a value that depends on the result is the
    only reliable fence."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def _bench(fn, *args, min_time=0.05, reps=5, max_iters=2000, min_iters=12):
    """Sustained per-call latency: median over ``reps`` timed loops, each
    sized so the async-dispatch queue amortizes the host↔device fence to
    noise (loop wall time ≥ min_time AND ≥ min_iters calls — the tunnel's
    device→host fetch costs ~15-20 ms, so a 1-2-call loop silently adds
    ~50% to a ~30 ms kernel; r04's poseidon2 "43%" was exactly this).
    Replaces the r1-r3 fence-subtraction scheme whose one-shot fence
    estimate made fast kernels report negative or inflated times."""
    out = fn(*args)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    _sync(fn(*args))
    t_probe = max(time.perf_counter() - t0, 1e-6)
    iters = int(min(max_iters, max(min_iters, round(min_time / t_probe))))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


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

    # --- Poseidon2 permutation throughput (the headline metric) ------------
    # On TPU the production layout is transposed (16, N): batch on VPU lanes,
    # all 22 rounds VMEM-resident (hash/poseidon2_pallas.py, used by the
    # Merkle tree build).  Elsewhere fall back to the XLA (N, 16) path.
    # 2^22 lanes amortize the per-dispatch tunnel overhead (measured ~2×
    # apparent throughput vs 2^20 on days the shared tunnel runs slow).
    batch = 1 << 22 if on_tpu else 1 << 17
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
    t = _bench(perm, states, reps=7)
    perms_per_s = batch / t
    # roofline: ~22k uint32 VPU ops per permutation at ~4e12 int32 op/s (v5e)
    P2_ROOFLINE = 4e12 / 22e3
    print(
        f"# poseidon2: {perms_per_s:.3e} perm/s ({t*1e3:.2f} ms/batch, "
        f"{perms_per_s/P2_ROOFLINE:.2%} of roofline est)",
        file=sys.stderr,
    )

    # ONE-LINE CONTRACT: emit now, before any heavy/fragile section.
    print(
        json.dumps(
            {
                "metric": "poseidon2_permutations_per_s",
                "value": round(perms_per_s),
                "unit": "perm/s",
                "vs_baseline": round(perms_per_s / P2_ROOFLINE, 4),
            }
        ),
        flush=True,
    )

    # --- NTT throughput ----------------------------------------------------
    # Dispatch-amortized (VERDICT r4 item 1): the axon tunnel costs ~2 ms
    # per dispatch, swamping a 0.25 ms kernel — so the bench measures a
    # fori_loop of K data-DEPENDENT transforms over a 16-column batch
    # inside ONE jit call (chained NTTs cannot be fused away; linearity is
    # not exploited by XLA).  Fence soundness is self-checked: doubling K
    # must ~double wall time, which a broken fence (r02) fails.
    with section("ntt", 180):
        log_n = 20
        ncols = 16
        xb = bb.to_mont(
            jnp.asarray(
                rng.integers(0, bb.P, size=(ncols, 1 << log_n), dtype=np.uint32)
            )
        )

        def chain(k):
            return jax.jit(
                lambda v: jax.lax.fori_loop(
                    0, k, lambda i, a: ntt(a, axis=-1), v
                )
            )

        t4 = _bench(chain(4), xb, min_time=0.1, reps=5)
        t8 = _bench(chain(8), xb, min_time=0.1, reps=7)
        ratio = t8 / t4
        t_ntt = t8 / 8 / ncols  # per single 2^20 transform
        elems_per_s = (1 << log_n) / t_ntt
        # roofline: the r04 ruler — HBM streaming model of a radix-2 NTT,
        # ~(log_n+4) passes × 8 B/element at ~819 GB/s (v5e).  The kernel
        # now does FEWER passes than that model (fused-radix-4 halves the
        # stage count, Shoup multiplication cuts the twiddle muls), so
        # >100% of this radix-2 ruler is genuine algorithmic headroom, not
        # fence error — the K-doubling check above guards the fence.
        NTT_ROOFLINE = 819e9 / (8 * (log_n + 4))
        print(
            f"# ntt 2^{log_n}: {t_ntt*1e3:.3f} ms, {elems_per_s:.3e} elem/s "
            f"({elems_per_s/NTT_ROOFLINE:.2%} of radix-2 streaming roofline; "
            f"radix-4+Shoup kernel, x{ncols} batch, 8-deep in-graph chain; "
            f"fence check t8/t4 = {ratio:.2f}, expect ~2.0)",
            file=sys.stderr,
        )

    # --- Merkle commit throughput ------------------------------------------
    with section("merkle", 120):
        # 2^20 leaves per dispatch (16x the r04 size) so the ~2 ms tunnel
        # dispatch is <2% of the measurement
        mat = bb.to_mont(
            jnp.asarray(
                rng.integers(0, bb.P, size=(1 << 20, 8), dtype=np.uint32)
            )
        )
        t_mk = _bench(lambda m: build_levels(m)[-1], mat)
        print(
            f"# merkle 2^20 leaves: {t_mk*1e3:.2f} ms, "
            f"{(1 << 20)/t_mk:.3e} leaves/s",
            file=sys.stderr,
        )

    # --- native host crypto (witness-generation hot path) ------------------
    with section("bls-pairing", 60):
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

    # --- Keccak-256 permutation throughput ----------------------------------
    # Pallas kernel (state VMEM-resident across all 24 rounds); wired into
    # the product as the CLI's proof-artifact fingerprint (Ethereum-style
    # keccak256 of the container, cli.py verify/prove output).  Reported as
    # plain throughput: the workload is shift-dominated and v5e lowers
    # uint32 shifts multi-op, so an op-count roofline would be guesswork.
    with section("keccak", 120):
        from dvt_circuits_tpu.hash.keccak import keccak_f1600 as _kf

        kb = 1 << 18
        lo = jnp.asarray(rng.integers(0, 1 << 32, size=(kb, 25), dtype=np.uint32))
        hi = jnp.asarray(rng.integers(0, 1 << 32, size=(kb, 25), dtype=np.uint32))
        t_k = _bench(lambda a, b: _kf(a, b)[0], lo, hi, min_time=0.1)
        print(
            f"# keccak-f1600 (pallas): {kb/t_k:.3e} perm/s "
            f"({t_k*1e3:.2f} ms per 2^18 batch)",
            file=sys.stderr,
        )

    # --- BLS12-381 MSM on-device (north-star kernel) ------------------------
    # Blelloch-scan bucket accumulation (~2m group adds per window vs the
    # r4 Hillis-Steele's m·log2 m); sizes per VERDICT r4 item 7 (2^12).
    with section("msm", 900):
        from dvt_circuits_tpu.curve import g1 as tg1
        from dvt_circuits_tpu.hostcrypto import bls12_381 as bls

        for npts in (1024, 4096):
            pts = [bls.g1_mul(bls.G1_GEN, 7 * i + 3) for i in range(npts)]
            scs = [
                int.from_bytes(rng.bytes(32), "big") % bls.R
                for _ in range(npts)
            ]
            tg1.msm_bucket(pts, scs)  # compile+warm (host API syncs)
            t0 = time.perf_counter()
            tg1.msm_bucket(pts, scs)
            t_m = time.perf_counter() - t0
            print(
                f"# g1 msm bucket+glv ({npts} pts, 256-bit): {t_m*1e3:.0f} ms, "
                f"{npts/t_m:.0f} scalar-muls/s equivalent",
                file=sys.stderr,
            )

    # --- end-to-end proofs: all four circuits ------------------------------
    print(
        "# scaling note: one physical TPU chip is attached — multi-chip "
        "correctness (proof-byte identity at any sharding) is validated by "
        "the driver dryrun + tests/test_dist_stark.py; ICI scaling "
        "efficiency is unmeasurable without >=2 real chips",
        file=sys.stderr,
    )
    if os.environ.get("DVT_BENCH_SKIP_PROOFS", "0") != "1":
        _proof_sections(rng)


def _proof_sections(rng):
    import json as _json

    from dvt_circuits_tpu.circuits.registry import get_circuit
    from dvt_circuits_tpu.dkg.scenario_gen import DkgCommittee
    from dvt_circuits_tpu.prover.pipeline import (
        prove_batch,
        prove_circuit,
        verify_proof,
    )
    from dvt_circuits_tpu.stark.config import StarkConfig
    from dvt_circuits_tpu.utils import cbor

    cfg = StarkConfig(num_queries=40, proof_of_work_bits=12)
    # bad-share and bad-partial-key use generated fault scenarios so the
    # proofs carry the in-circuit G1 curve tables (the reference's own
    # exit-0 vectors fault at the hash/signature level BEFORE the curve
    # checks); finalization's reference vector carries the aggregation
    # chip on its own.
    committee = DkgCommittee(3, 2)
    vecs = {
        "bad-share": committee.shared_data_bad_secret(0, 1, True),
        "finalization": "auth/finalization/report-1.json",
        "bad-partial-key": committee.bad_partial_key_data(1, True),
        "bad-encrypted-share": "auth/bad_encrypted_share/seeds-commitment-from-1-to-2-bad-encrypted-msg.json",
    }
    first = None
    for name, rel in vecs.items():
        if _elapsed() > TOTAL_BUDGET_S:
            print(
                f"# {name} proof skipped (total bench budget)", file=sys.stderr
            )
            continue
        with section(f"proof:{name}", 900):
            spec = get_circuit(name)
            if not isinstance(rel, str):
                data = rel
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
            res = verify_proof(container)
            t_verify = time.perf_counter() - t0
            gk = ",".join(g["kind"] for g in container["gadgets"]) or "-"
            print(
                f"# dkg {name} proof: prove {t_prove*1e3:.0f} ms "
                f"(witness {container['timing']['witness_ms']} ms), "
                f"verify {t_verify*1e3:.0f} ms, "
                f"proof {len(cbor.encode(container))//1024} KiB, "
                f"tables [{gk}], binding {res.binding}, "
                f"throughput {1.0/max(t_prove,1e-9):.2f} proofs/s/chip",
                file=sys.stderr,
            )
            if first is None:
                first = (name, data, spec)

    # batched multi-proof throughput (BASELINE.json configs[4])
    if first is not None and _elapsed() < TOTAL_BUDGET_S:
        with section("proof:batched", 420):
            name, data, spec = first
            t0 = time.perf_counter()
            batch = prove_batch(name, [data] * 4, True, cfg)
            t_b = time.perf_counter() - t0
            print(
                f"# batched {name} ×{len(batch)}: {t_b*1e3:.0f} ms total, "
                f"{len(batch)/t_b:.2f} proofs/s/chip sustained",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
