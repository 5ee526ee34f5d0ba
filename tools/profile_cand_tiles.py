#!/usr/bin/env python
"""Time the production packed candidates kernel at deep-DB shapes,
scan-amortized (compare against profile_cand_stages' ablation).

Usage: python tools/profile_cand_new.py [L] [K]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metacache_tpu.utils.platform import force_platform  # noqa: E402

force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from metacache_tpu.ops.candidates_pallas import (  # noqa: E402
    candidates_pallas_packed)

B = 8192
L = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
RUN = 256 if L >= 256 else L
WBITS = 19
I32_MAX = np.int32(2**31 - 1)


@functools.partial(jax.jit, static_argnames=("walk", "presorted", "tile"))
def run_scan(pk_k, mwir, walk, presorted, tile=0):
    def body(c, pk):
        t, h, bg, en = candidates_pallas_packed(
            pk, mwir, WBITS, walk_elems=walk, max_candidates=2,
            presorted=presorted, tile=tile)
        return c + t[:, 0].sum() + h[:, 0].sum(), None
    r, _ = jax.lax.scan(body, jnp.int32(0), pk_k)
    return r


def main():
    rng = np.random.default_rng(0)
    nf = L // RUN
    ntgt = 254
    pks = np.empty((B, L), np.int32)
    tg = rng.integers(0, 900, (B, ntgt), dtype=np.int32)
    wn = rng.integers(0, 8000, (B, ntgt), dtype=np.int32)
    base = (tg << WBITS) | wn
    for f in range(nf):
        depth = min(RUN, 254)
        seg = np.sort(base[:, :depth], axis=1)
        if depth < RUN:
            seg = np.concatenate(
                [seg, np.full((B, RUN - depth), I32_MAX, np.int32)],
                axis=1)
        if f & 1:
            seg = seg[:, ::-1]
        pks[:, f * RUN:(f + 1) * RUN] = seg
    pk_k = jnp.broadcast_to(jnp.asarray(pks)[None], (K, B, L))
    mwir = jnp.full((B,), 2, jnp.int32)

    for tile in (16, 32, 64):
        np.asarray(run_scan(pk_k, mwir, 32, RUN, tile))
        t0 = time.time()
        it = 6
        out = None
        for _ in range(it):
            r = run_scan(pk_k, mwir, 32, RUN, tile)
            if out is not None:
                np.asarray(out)
            out = r
        np.asarray(out)
        ms = (time.time() - t0) / it / K * 1000
        print(f"L={L} tile={tile} full {ms:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
