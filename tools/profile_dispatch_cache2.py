#!/usr/bin/env python
"""Timing-protocol validation for the axon relay backend, round 2.

profile_dispatch_cache.py showed block_until_ready returning in ~60 us
for 1 GiB-stream dispatches (16 TB/s apparent — impossible), while an
identical dispatch after unrelated work stalls 400+ ms: block_until_
ready does NOT reliably wait on this backend. The only trustworthy
sync is a host FETCH (np.asarray). This validates the fetch protocol
and measures real per-iteration costs via the K-slope of an in-scan
loop (two scan lengths; the difference cancels dispatch+RTT overhead).
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


def main():
    rng = np.random.default_rng(0)

    @jax.jit
    def work(tab, x):
        i = jax.lax.broadcasted_iota(jnp.int32, tab.shape, 0)
        return jnp.sum((tab ^ i) ^ x, dtype=jnp.int32)

    tab = jnp.asarray(rng.integers(0, 1 << 30, (4 * 2**20, 64),
                                   dtype=np.int32))
    # warm compile
    np.asarray(work(tab, jnp.int32(0)))

    for name, xs in (("same", [7] * 6), ("uniq", list(range(1, 7)))):
        ts = []
        for x in xs:
            t0 = time.time()
            np.asarray(work(tab, jnp.int32(x)))
            ts.append((time.time() - t0) * 1e3)
        print(f"1GiB stream fetch {name}: "
              + " ".join(f"{t:7.2f}" for t in ts) + " ms", flush=True)

    # K-slope protocol for the gather cost (the number that matters)
    @jax.jit
    def scan_gathers(tab, idxs):
        def f(c, ix):
            g = tab[ix]
            i = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
            return c + jnp.sum(g ^ i, dtype=jnp.int32), ()
        return jax.lax.scan(f, jnp.int32(0), idxs)[0]

    N = 131072
    rowsets = {}
    for width in (64, 128, 256):
        rows = min(4 * 2**20, (1 << 30) // (width * 4))
        rowsets[width] = jnp.asarray(
            rng.integers(0, 1 << 30, (rows, width), dtype=np.int32))

    def slope(tab2, rows):
        outs = {}
        for K in (8, 64):
            idxs = jnp.asarray(
                rng.integers(0, rows, (K, N), dtype=np.int32))
            np.asarray(scan_gathers(tab2, idxs))        # warm compile
            ts = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(scan_gathers(tab2, idxs))
                ts.append(time.time() - t0)
            outs[K] = min(ts)
        return (outs[64] - outs[8]) / 56, outs

    for width, tab2 in rowsets.items():
        per, outs = slope(tab2, tab2.shape[0])
        print(f"gather w={width:4d}: {per*1e3:7.3f} ms/iter "
              f"({per/N*1e9:6.2f} ns/row)  [K8={outs[8]*1e3:.1f} "
              f"K64={outs[64]*1e3:.1f} ms]", flush=True)

    # full-stream bandwidth via the same slope protocol
    @jax.jit
    def scan_stream(tab, xs):
        def f(c, x):
            i = jax.lax.broadcasted_iota(jnp.int32, tab.shape, 0)
            return c + jnp.sum((tab ^ i) ^ x, dtype=jnp.int32), ()
        return jax.lax.scan(f, jnp.int32(0), xs)[0]

    tb = rowsets[64]
    for K in (2, 8):
        xs = jnp.arange(K, dtype=jnp.int32)
        np.asarray(scan_stream(tb, xs))
    t8 = t2 = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(scan_stream(tb, jnp.arange(2, dtype=jnp.int32)))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        np.asarray(scan_stream(tb, jnp.arange(8, dtype=jnp.int32)))
        t8 = min(t8, time.time() - t0)
    per = (t8 - t2) / 6
    gib = tb.nbytes / 2**30
    print(f"stream {gib:.1f} GiB: {per*1e3:.3f} ms/pass = "
          f"{gib/per:.0f} GiB/s  <-- HBM calibration", flush=True)


if __name__ == "__main__":
    main()
