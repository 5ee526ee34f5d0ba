#!/usr/bin/env python
"""Round-3 deep-DB cost decomposition on the real chip.

Questions this answers (shapes = bigdb_944mbp bench: B=8192, F=16,
spf=254 -> L=4096, nf=15.2M two-tier head=30):
  1. gather cost vs row WIDTH at 131k fetches (64/128/256/512 lanes)
  2. bucket-row + head + overflow gather costs at production sizes
  3. fused candidates kernel: sort-only vs +sweep vs full, presorted=256
  4. packed single-i32 key sort vs (t, w) two-array sort
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.abspath(__file__)) + "/..")

from metacache_tpu.utils.platform import force_platform  # noqa: E402

force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SCAN_K = 8
BF = 8192 * 16          # probes per batch
B = 8192
L = 4096


def timed(fn, *args, it=4):
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    prev = None
    for _ in range(it):
        r = fn(*args)
        if prev is not None:
            np.asarray(jax.tree_util.tree_leaves(prev)[0])
        prev = r
    np.asarray(jax.tree_util.tree_leaves(prev)[0])
    return (time.time() - t0) / (it * SCAN_K) * 1000


def gather_scan(rows, idxk):
    @jax.jit
    def fn(rows, idxk):
        def body(c, idx):
            g = rows[idx]
            return c + g[:, :8].sum(), 0
        c, _ = jax.lax.scan(body, jnp.int32(0), idxk)
        return c
    return fn(rows, idxk)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # ---- 1. gather width scaling -----------------------------------
    print("== gather width scaling (131k fetches/batch) ==")
    for nrows, width in ((4_000_000, 64), (4_000_000, 128),
                         (1_600_000, 256), (1_600_000, 512),
                         (8_000_000, 128), (16_000_000, 64)):
        rows = jax.jit(lambda k: jax.random.randint(
            k, (nrows, width), 0, 100, jnp.int32))(key)
        idxk = jax.jit(lambda k: jax.random.randint(
            k, (SCAN_K, BF), 0, nrows, jnp.int32))(jax.random.PRNGKey(1))
        np.asarray(rows[:2, :2])
        ms = timed(gather_scan, rows, idxk)
        print(f"  ({nrows:>9}, {width:>3}) rows: {ms:6.3f} ms/batch")
        del rows, idxk

    # ---- 3/4. candidates kernel decomposition ----------------------
    from metacache_tpu.ops.candidates_pallas import candidates_pallas

    # synthetic alternating presorted runs of 256, ~occupancy like bench
    def make_runs(occ_frac):
        t = np.full((B, L), 2**31 - 1, np.int32)
        w = np.full((B, L), 2**31 - 1, np.int32)
        for r in range(16):
            cnt = int(256 * occ_frac)
            tt = np.sort(rng.integers(0, 900, (B, cnt)), axis=1)
            ww = rng.integers(0, 8900, (B, cnt))
            # sort (t,w) lexicographically per row
            o = np.lexsort((ww, tt), axis=1)
            tt = np.take_along_axis(tt, o, axis=1)
            ww = np.take_along_axis(ww, o, axis=1)
            s = slice(r * 256, r * 256 + cnt)
            if r & 1:
                t[:, r * 256 + 256 - cnt:r * 256 + 256] = tt[:, ::-1]
                w[:, r * 256 + 256 - cnt:r * 256 + 256] = ww[:, ::-1]
            else:
                t[:, s] = tt
                w[:, s] = ww
        return t, w

    t_h, w_h = make_runs(0.5)
    tk = jnp.asarray(np.broadcast_to(t_h, (SCAN_K, B, L)).copy())
    wk = jnp.asarray(np.broadcast_to(w_h, (SCAN_K, B, L)).copy())
    mk = jnp.full((SCAN_K, B), 2, jnp.int32)

    @jax.jit
    def cand_scan(tk, wk, mk):
        def body(c, xs):
            t, w, m = xs
            ct, ch, cb, ce = candidates_pallas(
                t, w, m, walk_elems=32, max_candidates=2, presorted=256)
            return c, ct
        return jax.lax.scan(body, 0, (tk, wk, mk))[1]

    ms = timed(cand_scan, tk, wk, mk)
    print(f"== fused candidates kernel (L=4096, presorted=256): "
          f"{ms:6.3f} ms/batch ==")

    # sort-only variant via a stripped pallas call
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from metacache_tpu.ops.candidates_pallas import _sort2_lanes

    def sort_kernel(t_ref, w_ref, o_ref, *, presorted):
        t, w = _sort2_lanes(t_ref[:], w_ref[:], presorted)
        o_ref[:] = t[:, :128] + w[:, :128]

    def sort_only(tk, wk, presorted, tile=16):
        @jax.jit
        def fn(tk, wk):
            def body(c, xs):
                t, w = xs
                out = pl.pallas_call(
                    functools.partial(sort_kernel, presorted=presorted),
                    out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
                    grid=(B // tile,),
                    in_specs=[pl.BlockSpec((tile, L), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                              pl.BlockSpec((tile, L), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                )(t, w)
                return c, out
            return jax.lax.scan(body, 0, (tk, wk))[1]
        return fn

    ms = timed(sort_only(tk, wk, 256), tk, wk)
    print(f"  sort-only (t,w) 2-array presorted=256:  {ms:6.3f}")
    ms = timed(sort_only(tk, wk, 0), tk, wk)
    print(f"  sort-only (t,w) 2-array full:           {ms:6.3f}")

    # packed single-key variant
    def psort_kernel(p_ref, o_ref, *, presorted):
        p = p_ref[:]
        n, l = p.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, l), 1)
        k = 2 * presorted if presorted else 2
        while k <= l:
            j = k // 2
            while j >= 1:
                pu = pltpu.roll(p, (-j) % l, 1)
                pd = pltpu.roll(p, j % l, 1)
                has_bit = (lane & j) != 0
                pp = jnp.where(has_bit, pd, pu)
                ascending = (lane & k) == 0
                keep_min = ascending ^ has_bit
                lo = jnp.minimum(p, pp)
                hi = jnp.maximum(p, pp)
                p = jnp.where(keep_min, lo, hi)
                j //= 2
            k *= 2
        o_ref[:] = p[:, :128]

    pk_h = (t_h.astype(np.int64) * 16384 +
            np.minimum(w_h, 16383)).astype(np.int64)
    pk_h = np.minimum(pk_h, 2**31 - 1).astype(np.int32)
    pkk = jnp.asarray(np.broadcast_to(pk_h, (SCAN_K, B, L)).copy())

    def packed_sort(pkk, presorted, tile=16):
        @jax.jit
        def fn(pkk):
            def body(c, p):
                out = pl.pallas_call(
                    functools.partial(psort_kernel, presorted=presorted),
                    out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
                    grid=(B // tile,),
                    in_specs=[pl.BlockSpec((tile, L), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                )(p)
                return c, out
            return jax.lax.scan(body, 0, pkk)[1]
        return fn

    ms = timed(packed_sort(pkk, 256), pkk)
    print(f"  sort-only packed 1-array presorted=256: {ms:6.3f}")
    ms = timed(packed_sort(pkk, 256, tile=32), pkk)
    print(f"  sort-only packed 1-array presorted=256 tile=32: {ms:6.3f}")
    ms = timed(packed_sort(pkk, 0), pkk)
    print(f"  sort-only packed 1-array full:          {ms:6.3f}")


if __name__ == "__main__":
    main()
