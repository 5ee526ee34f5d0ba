#!/usr/bin/env python
"""Microbenchmark: Pallas multi-buffered DMA row gather vs XLA gather.

The deep-DB probe is bound by the row-fetch rate of XLA's gather
(~27 ns/row on v5e regardless of row width <= 128 lanes; measured in
round 2/3). A Pallas kernel that keeps NBUF outstanding per-row DMAs
(HBM -> VMEM) could beat that if XLA's gather does not keep enough
fetches in flight. This decides whether a fused DMA-probe kernel (and
with it variable-width row layouts) is worth building.

Timing protocol: K gather iterations inside ONE jit with an on-device
reduction, a single scalar d2h per call (the tunnel makes any real
fetch cost seconds — NOTES_ROUND3).

Usage: python tools/profile_dma_gather.py [rows_log2] [reps_in_jit]
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

UNROLL = 8


def dma_gather(table, idx, chunk: int, nbuf: int):
    """table (N, W) i32, idx (R,) i32 -> (R, W) via per-row DMAs,
    nbuf outstanding, chunk rows per grid step."""
    n, w = table.shape
    r = idx.shape[0]
    assert r % chunk == 0 and chunk % UNROLL == 0 and nbuf % UNROLL == 0

    def kernel(idx_ref, table_ref, out_ref, sem):
        def get_dma(i):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[i]],
                out_ref.at[i],
                sem.at[jax.lax.rem(i, jnp.int32(nbuf))],
            )

        for j in range(nbuf):
            get_dma(jnp.int32(j)).start()

        def body(s, carry):
            base = s * UNROLL
            for u in range(UNROLL):
                i = base + u
                get_dma(i).wait()

                @pl.when(i + nbuf < chunk)
                def _():
                    get_dma(i + nbuf).start()

            return carry

        jax.lax.fori_loop(0, chunk // UNROLL, body, 0)

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
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, table)


def reps_sum(gather_fn, table, idx, reps: int, r: int):
    """Run `reps` gathers with shifted indices inside one jit; return a
    scalar so the d2h is one tiny fetch."""
    n = table.shape[0]

    def body(i, acc):
        rows = gather_fn(table, (idx + i) % n)
        return acc + rows.sum(dtype=jnp.int32)

    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


def bench(fn, *args, iters=4):
    np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / iters


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << n_log2
    r = 131072        # 8192 reads x 16 features
    rng = np.random.default_rng(0)

    widths = [int(x) for x in
              os.environ.get("DMA_W", "128,256,512").split(",")]
    for w in widths:
        table = jnp.asarray(
            rng.integers(0, 2**31, (n, w), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, n - reps, (r,), dtype=np.int32))

        xla = jax.jit(functools.partial(
            reps_sum, lambda t, i: t[i], reps=reps, r=r))
        dt = bench(xla, table, idx) / reps
        print(f"W={w:4d} N=2^{n_log2}  XLA gather: {dt*1e3:7.3f} ms  "
              f"{dt/r*1e9:6.1f} ns/row  "
              f"{r*w*4/dt/2**30:7.1f} GiB/s", flush=True)

        cfgs = ((512, 16), (1024, 64))
        for ci, (chunk, nbuf) in enumerate(cfgs):
            g = functools.partial(dma_gather, chunk=chunk, nbuf=nbuf)
            f = jax.jit(functools.partial(reps_sum, g, reps=reps, r=r))
            try:
                ok = True
                if ci == 0:
                    # checksum correctness (a full-result fetch costs
                    # seconds through the tunnel)
                    got = int(np.asarray(jax.jit(
                        lambda t, i: g(t, i).sum(dtype=jnp.int32))(
                            table, idx)))
                    want = int(np.asarray(jax.jit(
                        lambda t, i: t[i].sum(dtype=jnp.int32))(
                            table, idx)))
                    ok = got == want
                dt = bench(f, table, idx) / reps
            except Exception as e:
                print(f"  pallas chunk={chunk} nbuf={nbuf}: FAIL "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)
                continue
            print(f"  pallas chunk={chunk:4d} nbuf={nbuf:3d}: "
                  f"{dt*1e3:7.3f} ms  {dt/r*1e9:6.1f} ns/row  "
                  f"{r*w*4/dt/2**30:7.1f} GiB/s  ok={ok}", flush=True)
        del table


if __name__ == "__main__":
    main()
