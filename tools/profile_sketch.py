#!/usr/bin/env python
"""Micro-profile of the Pallas sketch kernel: time kernel variants that
stop after each stage (decode / kmerize / hash / sort / compact /
extract) to locate where the cycles actually go on the real chip."""
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

from metacache_tpu.ops import sketch_pallas as sp  # noqa: E402

N, L, K, S = 65536, 128, 16, 16


def make_kernel(stage, tile):
    def kernel(codes_ref, valid_ref, out_ref):
        codes = codes_ref[:].astype(jnp.uint32)
        n, l = codes.shape
        valid = valid_ref[:]
        ambig_char = (codes >= 4).astype(jnp.uint32)
        two_bit = jnp.where(ambig_char != 0, 0, codes)
        if stage == "decode":
            out_ref[:] = two_bit[:, :S]
            return
        kmer, ambig = sp._kmerize(two_bit, ambig_char, K, l)
        if stage == "kmerize":
            out_ref[:] = (kmer + ambig)[:, :S]
            return
        s = kmer
        s = ((s >> 2) & jnp.uint32(0x33333333)) | ((s & jnp.uint32(0x33333333)) << 2)
        s = ((s >> 4) & jnp.uint32(0x0F0F0F0F)) | ((s & jnp.uint32(0x0F0F0F0F)) << 4)
        s = ((s >> 8) & jnp.uint32(0x00FF00FF)) | ((s & jnp.uint32(0x00FF00FF)) << 8)
        s = ((s >> 16) & jnp.uint32(0x0000FFFF)) | ((s & jnp.uint32(0x0000FFFF)) << 16)
        rc = (jnp.uint32(0xFFFFFFFF) - s) >> (32 - (K << 1))
        canon = jnp.where(kmer <= rc, kmer, rc)
        h = canon
        h = ((h >> 16) ^ h) * jnp.uint32(0x45D9F3B)
        h = ((h >> 16) ^ h) * jnp.uint32(0x45D9F3B)
        h = (h >> 16) ^ h
        lane = sp._lane_ids((n, l))
        nvalid = jnp.maximum(valid - (K - 1), 0)
        feats = jnp.where((ambig != 0) | (lane >= nvalid), sp.SENT, h)
        if stage == "hash":
            out_ref[:] = feats[:, :S]
            return
        if stage == "extract":
            v = pltpu.bitcast(feats ^ jnp.uint32(0x80000000), jnp.int32)
            cols = []
            for _ in range(S):
                m = jnp.min(v, axis=1, keepdims=True)
                cols.append(m)
                v = jnp.where(v == m, jnp.int32(0x7FFFFFFF), v)
            out = jnp.concatenate(cols, axis=1)
            out = pltpu.bitcast(out, jnp.uint32) ^ jnp.uint32(0x80000000)
            col = jax.lax.broadcasted_iota(jnp.int32, (n, S), 1)
            out_ref[:] = jnp.where(col >= nvalid, sp.SENT, out)
            return
        feats = sp._bitonic_sort_lanes(feats)
        if stage == "sort":
            out_ref[:] = feats[:, :S]
            return
        feats = sp._compact_unique(feats, lane)
        out = jnp.where(lane >= nvalid, sp.SENT, feats)
        out_ref[:] = out[:, :S]
    return kernel


@functools.partial(jax.jit, static_argnames=("stage", "tile"))
def run(codes, valid, stage="full", tile=512):
    return pl.pallas_call(
        make_kernel(stage, tile),
        out_shape=jax.ShapeDtypeStruct((N, S), jnp.uint32),
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((tile, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(codes, valid.reshape(N, 1))


def main():
    rng = np.random.default_rng(0)
    wm = jnp.asarray(rng.integers(0, 5, (N, L), dtype=np.uint8))
    vl = jnp.asarray(rng.integers(16, L + 1, N).astype(np.int32))
    for tile in (512, 2048):
        prev = 0.0
        for stage in ("decode", "kmerize", "hash", "sort", "full",
                      "extract"):
            r = run(wm, vl, stage=stage, tile=tile)
            np.asarray(r)
            t0 = time.time()
            it = 10
            prevr = None
            for _ in range(it):
                r = run(wm, vl, stage=stage, tile=tile)
                if prevr is not None:
                    np.asarray(prevr)
                prevr = r
            np.asarray(prevr)
            ms = (time.time() - t0) / it * 1000
            print(f"tile={tile} {stage:8s} {ms:8.3f} ms/65536w "
                  f"(marginal {ms - prev:+8.3f})", flush=True)
            if stage != "full":
                prev = ms
    # correctness of extract variant vs oracle
    from metacache_tpu.ops.sketch_jax import sketch_windows
    r0 = np.asarray(sketch_windows(wm, vl, k=K, sketchlen=S))
    re = np.asarray(run(wm, vl, stage="extract", tile=512))
    print("extract bit-exact:", np.array_equal(r0, re))


if __name__ == "__main__":
    main()
