#!/usr/bin/env python
"""Pin down the sort-only anomaly + tile sweep for the fused kernel."""
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

SCAN_K = 8
B = 8192
L = 4096


def timed(fn, *args, it=3):
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


def main():
    rng = np.random.default_rng(0)
    t_h = np.sort(rng.integers(0, 900, (B, L)), axis=1).astype(np.int32)
    w_h = rng.integers(0, 8900, (B, L)).astype(np.int32)
    # shuffle within rows for unsorted input
    perm = rng.permuted(np.broadcast_to(np.arange(L), (B, L)), axis=1)
    t_h = np.take_along_axis(t_h, perm, axis=1)
    tk = jnp.asarray(np.broadcast_to(t_h, (SCAN_K, B, L)).copy())
    wk = jnp.asarray(np.broadcast_to(w_h, (SCAN_K, B, L)).copy())
    mk = jnp.full((SCAN_K, B), 2, jnp.int32)

    from metacache_tpu.ops.candidates_pallas import (candidates_pallas,
                                                     _sort2_lanes)

    # full candidates kernel at several tiles
    for tile in (8, 16, 32):
        @jax.jit
        def cand_scan(tk, wk, mk, tile=tile):
            def body(c, xs):
                t, w, m = xs
                ct, ch, cb, ce = candidates_pallas(
                    t, w, m, walk_elems=32, max_candidates=2,
                    presorted=0, tile=tile)
                return c, ct
            return jax.lax.scan(body, 0, (tk, wk, mk))[1]
        ms = timed(cand_scan, tk, wk, mk)
        print(f"full candidates kernel tile={tile}: {ms:7.3f} ms/batch",
              flush=True)

    # sort-only, writing full sorted output (no lane slice)
    def sort_kernel_full(t_ref, w_ref, ot_ref, ow_ref):
        t, w = _sort2_lanes(t_ref[:], w_ref[:], 0)
        ot_ref[:] = t
        ow_ref[:] = w

    def sort_kernel_sum(t_ref, w_ref, o_ref):
        t, w = _sort2_lanes(t_ref[:], w_ref[:], 0)
        o_ref[:] = t[:, :128] + w[:, :128]

    for name, kern, oshapes in (
        ("sort-only out=sum128", sort_kernel_sum,
         jax.ShapeDtypeStruct((B, 128), jnp.int32)),
        ("sort-only out=full", sort_kernel_full,
         (jax.ShapeDtypeStruct((B, L), jnp.int32),
          jax.ShapeDtypeStruct((B, L), jnp.int32))),
    ):
        for tile in (16, 32):
            multi = isinstance(oshapes, tuple)
            if multi:
                ospec = (pl.BlockSpec((tile, L), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM),) * 2
            else:
                ospec = pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)

            @jax.jit
            def sort_scan(tk, wk, kern=kern, oshapes=oshapes,
                          ospec=ospec, tile=tile):
                def body(c, xs):
                    t, w = xs
                    out = pl.pallas_call(
                        kern,
                        out_shape=oshapes,
                        grid=(B // tile,),
                        in_specs=[pl.BlockSpec((tile, L),
                                               lambda i: (i, 0),
                                               memory_space=pltpu.VMEM)] * 2,
                        out_specs=ospec,
                    )(t, w)
                    return c, (out[0] if isinstance(out, (tuple, list))
                               else out)
                return jax.lax.scan(body, 0, (tk, wk))[1]

            ms = timed(sort_scan, tk, wk)
            print(f"{name} tile={tile}: {ms:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
