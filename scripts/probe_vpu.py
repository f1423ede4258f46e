"""Microbenchmark: measured peak uint32 ALU throughput on this chip.

Establishes the honest roofline denominator for bench.py: a Pallas kernel
that does nothing but a long chain of dependent uint32 multiply/adds on a
VMEM-resident tile — the same instruction mix as the Poseidon2 sbox — so
its achieved ops/s IS the speed of light for that workload on this chip.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 2048
CHAIN = 512  # dependent ops per element per kernel pass


def _kernel_mul(in_ref, out_ref):
    x = in_ref[...]
    y = x
    for _ in range(CHAIN):
        y = y * x + jnp.uint32(12345)
    out_ref[...] = y


@jax.jit
def mulchain(x):
    n = x.shape[1]
    return pl.pallas_call(
        _kernel_mul,
        grid=(n // BLOCK,),
        in_specs=[pl.BlockSpec((16, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
    )(x)


def _sync(out):
    np.asarray(out.ravel()[:1])


def bench(fn, x, reps=5, iters=20):
    out = fn(x); _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    n = 1 << 18
    x = jnp.asarray(rng.integers(0, 1 << 32, size=(16, n), dtype=np.uint32))
    t = bench(mulchain, x)
    total_elems = 16 * n
    # each chain step = 1 mul + 1 add = 2 ops
    ops = total_elems * CHAIN * 2
    print(f"mul+add chain: {t*1e3:.3f} ms -> {ops/t/1e12:.3f} Tops/s (uint32 mul+add)")

    # pure independent elementwise mul over big array via XLA for comparison
    @jax.jit
    def xla_chain(x):
        y = x
        for _ in range(64):
            y = y * x + jnp.uint32(1)
        return y
    t2 = bench(xla_chain, x)
    print(f"xla mul+add chain (64 deep): {t2*1e3:.3f} ms -> {total_elems*64*2/t2/1e12:.3f} Tops/s")


if __name__ == "__main__":
    main()
