#!/usr/bin/env python
"""Stage ablation of the packed candidates kernel at the deep-DB shape.

Times kernel variants truncated after each stage (sort / walk / group /
suffix / full), scan-amortized inside ONE jit so the ~130 ms tunnel
dispatch cost divides across K iterations. Shapes mirror the 944 Mbp
escalation redo: B=8192 rows, 16 presorted alternating runs of 256
(L=4096), packed keys with the bench's duplicate structure (each
distinct (tgt,win) appears ~16x across runs), mwir=2, walk_elems=32.

Usage: python tools/profile_cand_stages.py [L] [K]
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from metacache_tpu.ops import candidates_pallas as cp  # noqa: E402

B = 8192
L = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
RUN = 256 if L >= 256 else L
WBITS = 19
WALK = 32
I32_MAX = np.int32(2**31 - 1)


def make_kernel(stage):
    def kernel(p_ref, mwir_ref, out_ref):
        p = p_ref[:]
        n, l = p.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, l), 1)
        mwir = mwir_ref[:]
        p = cp._sort1_lanes(p, presorted=RUN)
        if stage == "sort":
            out_ref[:] = p[:, :128]
            return
        is_match = p != I32_MAX
        lo_p = p - (mwir - 1)
        hits = jnp.ones((n, l), jnp.int32)
        beg = p
        for e in range(1, WALK):
            pe = cp._roll(p, e, l)
            ok = (lane >= e) & (pe >= lo_p)
            hits = hits + ok.astype(jnp.int32)
            beg = jnp.where(ok, pe, beg)
        if stage == "walk":
            out_ref[:] = (hits + beg)[:, :128]
            return
        tq = jax.lax.shift_right_logical(p, WBITS)
        newt = (lane == 0) | (tq != cp._roll(tq, 1, l))
        g = newt.astype(jnp.int32)
        d = 1
        while d < l:
            g = g + jnp.where(lane >= d, cp._roll(g, d, l), 0)
            d *= 2
        if stage == "group":
            out_ref[:] = (g + hits + beg)[:, :128]
            return
        key = hits * l + (l - 1 - lane)
        v = jnp.where(is_match, key, -1)
        d = 1
        while d < l:
            vn = cp._roll(v, -d, l)
            gn = cp._roll(g, -d, l)
            ok = (lane < l - d) & (gn == g)
            v = jnp.maximum(v, jnp.where(ok, vn, -1))
            d *= 2
        repkey = jnp.where(newt & is_match, v, -1)
        if stage == "suffix":
            out_ref[:] = (repkey + beg)[:, :128]
            return
        shift = int(l).bit_length() - 1
        wmask = (1 << WBITS) - 1
        cols = []
        for _ in range(2):
            best = jnp.max(repkey, axis=1, keepdims=True)
            ok = best > 0
            bestcol = jnp.where(ok, (l - 1) - (best & (l - 1)), 0)
            sel = lane == bestcol
            pick = lambda x, d_: jnp.where(
                ok[:, 0], jnp.max(jnp.where(sel, x, jnp.int32(-2**31)),
                                  axis=1), d_)
            cols.append(jnp.stack([
                pick(tq, -1),
                jnp.where(ok[:, 0], best[:, 0] >> shift, 0),
                pick(beg, 0) & wmask,
                pick(p, 0) & wmask,
            ], axis=1))
            repkey = jnp.where(repkey == best, -1, repkey)
        res = jnp.concatenate(cols, axis=1)
        out_ref[:] = jnp.concatenate(
            [res, jnp.zeros((n, 128 - res.shape[1]), jnp.int32)], axis=1)
    return kernel


@functools.partial(jax.jit, static_argnames=("stage", "tile"))
def run_scan(pk_k, mwir, stage="full", tile=0):
    if tile <= 0:
        tile = max(8, min(256, (1 << 18) // (L * 4)))
    while B % tile:
        tile //= 2

    def body(c, pk):
        out = pl.pallas_call(
            make_kernel(stage),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
            grid=(B // tile,),
            in_specs=[pl.BlockSpec((tile, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(pk, mwir.reshape(B, 1))
        return c + out[:, 0].sum(dtype=jnp.int32), None

    r, _ = jax.lax.scan(body, jnp.int32(0), pk_k)
    return r


def main():
    rng = np.random.default_rng(0)
    nf = L // RUN
    # deep-DB-like rows: ~254 distinct (tgt, win) pks repeated across
    # the nf feature runs, each run sorted, odd runs reversed
    ntgt = 254
    pks = np.empty((B, L), np.int32)
    tg = rng.integers(0, 900, (B, ntgt), dtype=np.int32)
    wn = rng.integers(0, 8000, (B, ntgt), dtype=np.int32)
    base = (tg << WBITS) | wn
    for f in range(nf):
        depth = RUN if RUN < 256 else 254
        seg = np.sort(base[:, :depth], axis=1)
        if depth < RUN:
            seg = np.concatenate(
                [seg, np.full((B, RUN - depth), I32_MAX, np.int32)],
                axis=1)
        if f & 1:
            seg = seg[:, ::-1]
        pks[:, f * RUN:(f + 1) * RUN] = seg
    pk = jnp.asarray(pks)
    pk_k = jnp.broadcast_to(pk[None], (K, B, L))
    mwir = jnp.full((B,), 2, jnp.int32)

    for tile in (16, 32, 64, 128):
        try:
            np.asarray(run_scan(pk_k, mwir, stage="sort", tile=tile))
        except Exception as e:
            print(f"L={L} sort tile={tile}: {type(e).__name__}",
                  flush=True)
            continue
        t0 = time.time()
        it = 6
        out = None
        for _ in range(it):
            r = run_scan(pk_k, mwir, stage="sort", tile=tile)
            if out is not None:
                np.asarray(out)
            out = r
        np.asarray(out)
        ms = (time.time() - t0) / it / K * 1000
        print(f"L={L} sort tile={tile} {ms:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
