#!/usr/bin/env python
"""Gather cost-model v2 with bandwidth calibration.

profile_gather.py v1 reported > HBM-bandwidth gather rates even after
the XOR-iota fix; this version calibrates against a full-table
streaming reduction (cannot beat HBM bandwidth) and cross-checks that
results actually depend on the index array.
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

N_IDX = 131072
ITERS = 50


def timeit(fn, *args):
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

    @jax.jit
    def stream_sum(tab):
        i = jax.lax.broadcasted_iota(jnp.int32, tab.shape, 0)
        return jnp.sum(tab ^ i, dtype=jnp.int32)

    @jax.jit
    def gather_mix(tab, idx):
        g = tab[idx]
        i = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
        return jnp.sum(g ^ i, dtype=jnp.int32)

    # --- calibration: stream the whole table (bandwidth bound)
    rows = 4 * 2**20
    tab = jnp.asarray(rng.integers(0, 1 << 30, (rows, 64),
                                   dtype=np.int32))
    tbytes = rows * 64 * 4
    t = timeit(stream_sum, tab)
    print(f"stream {tbytes >> 20} MiB: {t*1e3:.3f} ms = "
          f"{tbytes/t/2**30:.0f} GiB/s  <-- HBM calibration",
          flush=True)

    # --- sanity: result depends on idx
    i1 = jnp.asarray(rng.integers(0, rows, N_IDX, dtype=np.int32))
    i2 = jnp.asarray(rng.integers(0, rows, N_IDX, dtype=np.int32))
    r1, r2 = gather_mix(tab, i1), gather_mix(tab, i2)
    print(f"sanity: {int(r1)} vs {int(r2)} "
          f"({'DIFFER ok' if int(r1) != int(r2) else 'EQUAL — BROKEN'})",
          flush=True)

    # --- gather timings with per-iteration UNIQUE index arrays
    # (rules out any result caching across identical dispatches)
    idxs = jnp.asarray(
        rng.integers(0, rows, (ITERS, N_IDX), dtype=np.int32))

    def many(tab, idxs):
        r = gather_mix(tab, idxs[0])
        jax.block_until_ready(r)
        t0 = time.time()
        outs = [gather_mix(tab, idxs[i]) for i in range(ITERS)]
        jax.block_until_ready(outs[-1])
        return (time.time() - t0) / ITERS

    t = many(tab, idxs)
    gbytes = N_IDX * 64 * 4
    print(f"gather 131072 x 64 lanes (unique idx/iter): {t*1e3:.3f} ms"
          f" = {t/N_IDX*1e9:.2f} ns/row, {gbytes/t/2**30:.0f} GiB/s "
          f"apparent", flush=True)

    # --- same but all ITERS gathers inside ONE scan dispatch
    @jax.jit
    def scan_gathers(tab, idxs):
        def f(c, ix):
            return c + gather_mix(tab, ix), ()
        return jax.lax.scan(f, jnp.int32(0), idxs)[0]

    r = scan_gathers(tab, idxs)
    jax.block_until_ready(r)
    t0 = time.time()
    r = scan_gathers(tab, idxs)
    jax.block_until_ready(r)
    t = (time.time() - t0) / ITERS
    print(f"gather in-scan: {t*1e3:.3f} ms = {t/N_IDX*1e9:.2f} ns/row",
          flush=True)

    # --- width sweep, in-scan (the trustworthy protocol)
    for width in (64, 128, 256, 512):
        rows2 = min(4 * 2**20, (2 << 30) // (width * 4))
        tab2 = jnp.asarray(rng.integers(0, 1 << 30, (rows2, width),
                                        dtype=np.int32))
        ix2 = jnp.asarray(
            rng.integers(0, rows2, (ITERS, N_IDX), dtype=np.int32))
        r = scan_gathers(tab2, ix2)
        jax.block_until_ready(r)
        t0 = time.time()
        r = scan_gathers(tab2, ix2)
        jax.block_until_ready(r)
        t = (time.time() - t0) / ITERS
        print(f"width={width:4d} rows={rows2>>20}M in-scan: "
              f"{t*1e3:7.3f} ms  {t/N_IDX*1e9:6.2f} ns/row  "
              f"{N_IDX*width*4/t/2**30:6.0f} GiB/s", flush=True)
        del tab2, ix2


if __name__ == "__main__":
    main()
