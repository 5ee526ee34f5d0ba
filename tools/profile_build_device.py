#!/usr/bin/env python
"""Device primitives for on-chip table construction at RefSeq scale:
  1. 133M-element 3-operand stable sort (feature + location payload)
  2. 133M cumsum (group ids), cummax (first-position propagation)
  3. scatter of 133M values into a (20M, 64) row matrix (sorted unique
     destination indices) — the fused/two-tier/bucket-row fills
"""
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.abspath(__file__)) + "/..")

from metacache_tpu.utils.platform import force_platform  # noqa: E402

force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 133_000_000
F = 20_000_000
W = 64


def _fetch(r):
    """block_until_ready is unreliable through the axon tunnel — fetch a
    checksum to force completion."""
    leaves = jax.tree_util.tree_leaves(r)
    return [np.asarray(x[:1] if x.ndim else x) for x in leaves]


def timed(name, fn, *args, it=3):
    r = fn(*args)
    _fetch(jax.tree_util.tree_map(lambda x: jnp.sum(x[:100]), r))
    t0 = time.time()
    for _ in range(it):
        r = fn(*args)
        _fetch(jax.tree_util.tree_map(lambda x: jnp.sum(x), r))
    print(f"{name}: {(time.time()-t0)/it:.3f}s", flush=True)
    return r


def main():
    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(key):
        k1, k2, k3 = jax.random.split(key, 3)
        f = jax.random.randint(k1, (N,), 0, F, jnp.int32)
        t = jax.random.randint(k2, (N,), 0, 1000, jnp.int32)
        w = jax.random.randint(k3, (N,), 0, 9000, jnp.int32)
        return f, t, w

    f, t, w = jax.block_until_ready(gen(key))

    @jax.jit
    def sort3(f, t, w):
        return jax.lax.sort((f, t, w), dimension=0, num_keys=1,
                            is_stable=True)

    fs, ts, ws = timed("sort 133M x3 stable", sort3, f, t, w)

    @jax.jit
    def sort3u(f, t, w):
        return jax.lax.sort((f, t, w), dimension=0, num_keys=3)

    timed("sort 133M x3 3keys", sort3u, f, t, w)

    @jax.jit
    def scan_ops(fs):
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), fs[:-1]])
        newf = fs != prev
        r = jnp.cumsum(newf.astype(jnp.int32)) - 1
        i = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
        first = jax.lax.cummax(jnp.where(newf, i, -1))
        col = i - first
        return r, col

    r, col = timed("cumsum+cummax 133M", scan_ops, fs)

    @jax.jit
    def scatter_rows(r, col, ts):
        out = jnp.zeros((F, W), jnp.int32)
        keep = col < 30
        rr = jnp.where(keep, r, F)       # drop out-of-range
        return out.at[rr, jnp.minimum(col, W - 1)].set(
            ts, mode="drop", unique_indices=True)

    timed("scatter 133M -> (20M,64) rows", scatter_rows, r, col, ts, it=2)

    @jax.jit
    def scatter_flat(r, col, ts):
        out = jnp.zeros((F * W,), jnp.int32)
        keep = col < 30
        dest = jnp.where(keep, r * W + col, F * W)
        return out.at[dest].set(ts, mode="drop", unique_indices=True)

    timed("scatter 133M -> flat 1.28G", scatter_flat, r, col, ts, it=2)

    # compaction: unique features + offsets via scatter
    @jax.jit
    def compact(fs, r):
        i = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), fs[:-1]])
        newf = fs != prev
        uniq = jnp.zeros((F,), jnp.int32).at[jnp.where(
            newf, r, F)].set(fs, mode="drop", unique_indices=True)
        starts = jnp.zeros((F,), jnp.int32).at[jnp.where(
            newf, r, F)].set(i, mode="drop", unique_indices=True)
        return uniq, starts

    timed("compact uniq+starts", compact, fs, r, it=2)


if __name__ == "__main__":
    main()
