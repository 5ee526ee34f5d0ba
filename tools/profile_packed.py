#!/usr/bin/env python
"""Packed vs two-array fused candidates kernel at the deep-DB shape."""
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
B = 8192
F, R = 16, 256
L = F * R
WBITS = 15


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


def main():
    from metacache_tpu.ops.candidates_pallas import (
        candidates_pallas, candidates_pallas_packed)
    rng = np.random.default_rng(0)
    # alternating presorted runs, ~50% occupancy
    tgt = np.full((B, F, R), 2**31 - 1, np.int32)
    win = np.full((B, F, R), 2**31 - 1, np.int32)
    occ = R // 2
    t = np.sort(rng.integers(0, 900, (B, F, occ)), axis=2)
    w = rng.integers(0, 8900, (B, F, occ))
    pk_s = np.sort((t.astype(np.int64) << WBITS) | w, axis=2)
    pk = np.full((B, F, R), 2**31 - 1, np.int64)
    for j in range(F):
        if j & 1:
            pk[:, j, R - occ:] = pk_s[:, j, ::-1]
        else:
            pk[:, j, :occ] = pk_s[:, j]
    pk = pk.reshape(B, L).astype(np.int32)
    tt = (pk >> WBITS).astype(np.int32)
    ww = (pk & ((1 << WBITS) - 1)).astype(np.int32)
    pad = pk == 2**31 - 1
    tt = np.where(pad, 2**31 - 1, tt)
    ww = np.where(pad, 2**31 - 1, ww)

    tk = jnp.asarray(np.broadcast_to(tt, (SCAN_K, B, L)).copy())
    wk = jnp.asarray(np.broadcast_to(ww, (SCAN_K, B, L)).copy())
    pkk = jnp.asarray(np.broadcast_to(pk, (SCAN_K, B, L)).copy())
    mk = jnp.full((SCAN_K, B), 2, jnp.int32)

    def two_arr(presorted, tile=0):
        @jax.jit
        def fn(tk, wk, mk):
            def body(c, xs):
                t, w, m = xs
                out = candidates_pallas(t, w, m, walk_elems=32,
                                        max_candidates=2,
                                        presorted=presorted, tile=tile)
                return c, out[0]
            return jax.lax.scan(body, 0, (tk, wk, mk))[1]
        return fn

    def packed(presorted, tile=0, walk=32):
        @jax.jit
        def fn(pkk, mk):
            def body(c, xs):
                p, m = xs
                out = candidates_pallas_packed(
                    p, m, WBITS, walk_elems=walk, max_candidates=2,
                    presorted=presorted, tile=tile)
                return c, out[0]
            return jax.lax.scan(body, 0, (pkk, mk))[1]
        return fn

    print(f"two-array presorted=256:        "
          f"{timed(two_arr(R), tk, wk, mk):7.3f} ms/batch", flush=True)
    print(f"packed    presorted=256:        "
          f"{timed(packed(R), pkk, mk):7.3f} ms/batch", flush=True)
    for tile in (16, 32):
        try:
            print(f"packed    presorted=256 t={tile}:   "
                  f"{timed(packed(R, tile), pkk, mk):7.3f} ms/batch",
                  flush=True)
        except Exception as e:
            print(f"packed tile={tile}: {type(e).__name__}", flush=True)
    print(f"packed    full sort:            "
          f"{timed(packed(0), pkk, mk):7.3f} ms/batch", flush=True)
    # parity spot check
    a = candidates_pallas(tk[0], wk[0], mk[0], walk_elems=32,
                          max_candidates=2, presorted=R)
    b = candidates_pallas_packed(pkk[0], mk[0], WBITS, walk_elems=32,
                                 max_candidates=2, presorted=R)
    for x, y, nm in zip(a, b, ("tgt", "hits", "beg", "end")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=nm)
    print("parity OK", flush=True)


if __name__ == "__main__":
    main()
