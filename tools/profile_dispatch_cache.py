#!/usr/bin/env python
"""Characterize the axon relay's identical-dispatch result caching.

profile_gather.py v1/v2 showed repeated dispatches of the SAME
(executable, args) returning far faster than HBM bandwidth allows
(1 GiB streamed "in 27 us"). This probes where the dedupe boundary is:
per-call wall times for (a) identical args, (b) unique args, at small
and large compute sizes, plus whether interleaving other work between
identical calls evicts the cache entry.
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


def probe(name, fn, argsets, n=6):
    r = fn(*argsets[0])
    jax.block_until_ready(r)
    times = []
    for i in range(n):
        a = argsets[i % len(argsets)]
        t0 = time.time()
        r = fn(*a)
        jax.block_until_ready(r)
        times.append((time.time() - t0) * 1e3)
    print(f"{name}: " + " ".join(f"{t:8.2f}" for t in times) + " ms",
          flush=True)


def main():
    rng = np.random.default_rng(0)

    @jax.jit
    def work(tab, x):
        i = jax.lax.broadcasted_iota(jnp.int32, tab.shape, 0)
        return jnp.sum((tab ^ i) ^ x, dtype=jnp.int32)

    # ~1 GiB stream: real device time ~1.3 ms at 819 GB/s
    tab = jnp.asarray(rng.integers(0, 1 << 30, (4 * 2**20, 64),
                                   dtype=np.int32))
    same = [(tab, jnp.int32(7))]
    uniq = [(tab, jnp.int32(k)) for k in range(16)]
    probe("1GiB same-args ", work, same)
    probe("1GiB uniq-args ", work, uniq)
    probe("1GiB same again", work, same)

    # big matmul ~ (4096x4096)@(4096x4096) f32 = 137 GFLOP ~ 0.7 ms+
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32)

    @jax.jit
    def mm(a, s):
        return jnp.sum((a + s) @ a)

    probe("mm same-args   ", mm, [(a, jnp.float32(1))])
    probe("mm uniq-args   ", mm, [(a, jnp.float32(k))
                                  for k in range(16)])

    # does unrelated work between identical calls evict the entry?
    @jax.jit
    def other(x):
        return jnp.sum(x * 2)

    ox = jnp.arange(1024, dtype=jnp.int32)
    r = work(tab, jnp.int32(7))
    jax.block_until_ready(r)
    t0 = time.time()
    r2 = other(ox)
    jax.block_until_ready(r2)
    r = work(tab, jnp.int32(7))
    jax.block_until_ready(r)
    print(f"interleaved identical: {(time.time()-t0)*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
