"""Framework-wide JAX configuration.

Enables the persistent compilation cache so the prover's kernel pyramid
(Poseidon2 permutation, Merkle levels, NTT stages, FRI folds — one variant
per array shape) compiles once per machine instead of once per process.
"""

from __future__ import annotations

import os

import jax

_CACHE_DIR = os.environ.get(
    "DVT_TPU_JAX_CACHE", os.path.expanduser("~/.cache/dvt_circuits_tpu/jax")
)


def setup() -> None:
    try:
        platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        if platforms.strip() == "cpu":
            # XLA:CPU AOT cache entries are machine-feature-pinned and can
            # SIGILL when reloaded; the cache only pays off on TPU anyway.
            return
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization only


setup()
