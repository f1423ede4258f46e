#!/usr/bin/env bash
# Pre-build every XLA/AOT cache the benchmark touches.
#
# The first fused prove of each table-shape combination traces + compiles a
# large graph (~10-15 min on this host); the results persist in
# ~/.cache/dvt_circuits_tpu/{jax,aot}, keyed by a fingerprint of the
# kernel sources (stark/fused.py _code_fingerprint).  Run this after any
# kernel change so subsequent `python bench.py` runs measure warm-cache
# performance instead of compile time.
set -u
cd "$(dirname "$0")/.."
DVT_BENCH_BUDGET_S=100000 DVT_BENCH_SECTION_SCALE=100 python bench.py "$@"
