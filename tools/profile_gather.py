#!/usr/bin/env python
"""TPU row-gather cost model microbench.

The deep-bucket query path is bounded by data-dependent row gathers
(COMPONENTS.md: ~7.7 ms/batch floor at ~20 ns/row). Before any further
structural redesign (merging the bucket-index gather into the head
gather, prefix-grouped heads, aux-array addressing) this measures what
the cost actually depends on:

  1. row WIDTH        (64..1024 lanes)   - is cost per row or per byte?
  2. table SIZE       (64K..16M rows)    - do small tables gather faster?
  3. index LOCALITY   (random/sorted/clustered)
  4. DEPENDENT chains (idx -> idx -> row) vs two independent gathers
  5. scalar gathers   (1-lane) from small aux arrays

Run serialized with other chip jobs; prints one line per config.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

from metacache_tpu.utils.platform import force_platform  # noqa: E402

force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N_IDX = 131072          # probes per batch (8192 reads x 16 features)
ITERS = 20


def timeit(fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(ITERS):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    # NOTE: a plain sum(tab[idx]) is algebraically hoisted by XLA into
    # rowsums = sum(tab, axis=1); sum(rowsums[idx]) — the row gather
    # disappears and the "measurement" reports > HBM bandwidth. XOR
    # with an output-position iota makes the reduction depend jointly
    # on (value, output row), which kills the hoist.
    def _mix(g):
        i = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
        return jnp.sum(g ^ i, dtype=jnp.int32)

    @jax.jit
    def gather_sum(tab, idx):
        return _mix(tab[idx])

    @jax.jit
    def gather2_sum(tab, idx, idx2):
        return _mix(tab[idx]) + _mix(tab[idx2])

    @jax.jit
    def chain_sum(aux, tab, idx):
        j = aux[idx]                       # scalar gather -> row id
        return _mix(tab[j])

    # --- 1: width sweep at 4M rows (2M for width >= 512 to cap memory)
    for width in (64, 128, 256, 512, 1024):
        rows = 4 * 2**20 if width < 512 else 2 * 2**20
        tab = jnp.asarray(
            rng.integers(0, 100, (rows, width), dtype=np.int32))
        idx = jnp.asarray(
            rng.integers(0, rows, N_IDX, dtype=np.int32))
        t = timeit(gather_sum, tab, idx)
        print(f"width={width:5d} rows={rows >> 20:3d}M: "
              f"{t*1e3:7.3f} ms  {t/N_IDX*1e9:6.1f} ns/row  "
              f"{N_IDX*width*4/t/2**30:7.1f} GiB/s", flush=True)
        del tab

    # --- 2: table-size sweep at width 64
    for rows in (64 * 2**10, 2**20, 4 * 2**20, 16 * 2**20):
        tab = jnp.asarray(
            rng.integers(0, 100, (rows, 64), dtype=np.int32))
        idx = jnp.asarray(
            rng.integers(0, rows, N_IDX, dtype=np.int32))
        t = timeit(gather_sum, tab, idx)
        print(f"size rows={rows:9d} w=64: {t*1e3:7.3f} ms  "
              f"{t/N_IDX*1e9:6.1f} ns/row", flush=True)
        del tab

    # --- 3: locality at 4M x 64
    rows = 4 * 2**20
    tab = jnp.asarray(rng.integers(0, 100, (rows, 64), dtype=np.int32))
    base = rng.integers(0, rows, N_IDX, dtype=np.int32)
    for name, ix in (
            ("random  ", base),
            ("sorted  ", np.sort(base)),
            # per-read-sorted: tiles of 16 ascending (the real pattern)
            ("tile16  ", np.sort(base.reshape(-1, 16), axis=1).ravel()),
            # clustered: random within a 256K-row window
            ("cluster ", (rng.integers(0, 256 * 2**10, N_IDX,
                                       dtype=np.int32)
                          + rng.integers(0, rows - 256 * 2**10))),
            ("iota    ", np.arange(N_IDX, dtype=np.int32))):
        t = timeit(gather_sum, tab, jnp.asarray(ix))
        print(f"loc {name}: {t*1e3:7.3f} ms  "
              f"{t/N_IDX*1e9:6.1f} ns/row", flush=True)

    # --- 4: two independent gathers in one jit vs one; dependent chain
    idx = jnp.asarray(base)
    idx2 = jnp.asarray(rng.integers(0, rows, N_IDX, dtype=np.int32))
    t1 = timeit(gather_sum, tab, idx)
    t2 = timeit(gather2_sum, tab, idx, idx2)
    print(f"indep 2x64-lane: one={t1*1e3:.3f} two={t2*1e3:.3f} ms "
          f"(ratio {t2/t1:.2f})", flush=True)
    for arows, name in ((rows, "16MiB-aux"), (2**20, "4MiB-aux"),
                        (2**18, "1MiB-aux")):
        aux = jnp.asarray(
            rng.integers(0, rows, arows, dtype=np.int32))
        idxa = jnp.asarray(
            rng.integers(0, arows, N_IDX, dtype=np.int32))
        tc = timeit(chain_sum, aux, tab, idxa)
        print(f"chain scalar[{name}] -> 64-lane: {tc*1e3:.3f} ms "
              f"(vs single row-gather {t1*1e3:.3f})", flush=True)

    # --- 5: scalar-gather cost alone, vs aux size
    @jax.jit
    def scalar_sum(aux, idx):
        g = aux[idx]
        i = jax.lax.iota(jnp.int32, g.shape[0])
        return jnp.sum(g ^ i, dtype=jnp.int32)

    for arows in (2**18, 2**20, 4 * 2**20, 64 * 2**20):
        aux = jnp.asarray(rng.integers(0, 100, arows, dtype=np.int32))
        idxa = jnp.asarray(
            rng.integers(0, arows, N_IDX, dtype=np.int32))
        t = timeit(scalar_sum, aux, idxa)
        print(f"scalar aux={arows*4 >> 20:5d}MiB: {t*1e3:7.3f} ms  "
              f"{t/N_IDX*1e9:6.1f} ns/el", flush=True)

    # --- 6: fewer, wider gathers moving the same bytes
    # (131072 x 64) vs (65536 x 128) vs (32768 x 256) vs (16384 x 512)
    for width in (64, 128, 256, 512):
        n = N_IDX * 64 // width
        rows2 = 4 * 2**20 * 64 // width
        tab2 = jnp.asarray(
            rng.integers(0, 100, (rows2, width), dtype=np.int32))
        ix = jnp.asarray(rng.integers(0, rows2, n, dtype=np.int32))
        t = timeit(gather_sum, tab2, ix)
        print(f"samebytes n={n:6d} w={width:4d}: {t*1e3:7.3f} ms",
              flush=True)
        del tab2


if __name__ == "__main__":
    main()
