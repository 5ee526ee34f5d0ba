#!/usr/bin/env python
"""Microbenchmark: Pallas multi-buffered DMA row gather vs XLA gather.

The deep-DB probe is bound by the row-fetch rate of XLA's gather
(~27 ns/row on v5e regardless of row width <= 128 lanes; measured in
round 2/3). A Pallas kernel that issues NBUF outstanding per-row DMAs
(HBM -> VMEM) could beat that if XLA's gather is not keeping enough
fetches in flight. This decides whether a fused DMA-probe kernel (and
with it variable-width row layouts) is worth building.

Usage: python tools/profile_dma_gather.py [rows_log2]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dma_gather(table, idx, chunk: int, nbuf: int):
    """table (N, W) i32, idx (R,) i32 -> (R, W) via per-row DMAs,
    nbuf outstanding, chunk rows per grid step."""
    n, w = table.shape
    r = idx.shape[0]
    assert r % chunk == 0

    def kernel(idx_ref, table_ref, out_ref, sem):
        def get_dma(i):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[i]],
                out_ref.at[i],
                sem.at[jax.lax.rem(i, nbuf)],
            )

        for j in range(nbuf):
            get_dma(jnp.int32(j)).start()

        def body(i, carry):
            get_dma(i).wait()

            @pl.when(i + nbuf < chunk)
            def _():
                get_dma(i + nbuf).start()

            return carry

        jax.lax.fori_loop(0, chunk, body, 0, unroll=4)

    grid = (r // chunk,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((chunk, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, w), jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nbuf,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(idx, table)


def bench(fn, *args, iters=8):
    out = fn(*args)
    np.asarray(out[0] if isinstance(out, tuple) else out)
    t0 = time.time()
    prev = None
    for _ in range(iters):
        r = fn(*args)
        if prev is not None:
            np.asarray(prev)[0, 0]
        prev = r
    np.asarray(prev)[0, 0]
    return (time.time() - t0) / iters


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    n = 1 << n_log2
    r = 131072        # 8192 reads x 16 features
    rng = np.random.default_rng(0)

    for w in (128, 256, 512):
        table = jnp.asarray(
            rng.integers(0, 2**31, (n, w), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, n, (r,), dtype=np.int32))

        xla_gather = jax.jit(lambda t, i: t[i])
        dt = bench(xla_gather, table, idx)
        print(f"W={w:4d} N=2^{n_log2}  XLA gather: {dt*1e3:7.3f} ms  "
              f"{dt/r*1e9:6.1f} ns/row  "
              f"{r*w*4/dt/2**30:7.1f} GiB/s")

        for chunk, nbuf in ((512, 8), (512, 16), (512, 32), (1024, 64)):
            f = jax.jit(functools.partial(dma_gather, chunk=chunk,
                                          nbuf=nbuf))
            try:
                ok = bool(np.array_equal(np.asarray(f(table, idx)),
                                         np.asarray(table)[np.asarray(idx)]))
                dt = bench(f, table, idx)
            except Exception as e:
                print(f"  chunk={chunk} nbuf={nbuf}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            print(f"  pallas chunk={chunk:4d} nbuf={nbuf:3d}: "
                  f"{dt*1e3:7.3f} ms  {dt/r*1e9:6.1f} ns/row  "
                  f"{r*w*4/dt/2**30:7.1f} GiB/s  ok={ok}")
        del table
import gc  # noqa: E402


if __name__ == "__main__":
    main()
