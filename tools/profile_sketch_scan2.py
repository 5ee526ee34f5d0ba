#!/usr/bin/env python
"""Scan-amortized stage profile of the Pallas sketch kernel: kernels that
stop after decode / kmerize / hash / sort / compact, run under lax.scan
so tunnel dispatch latency amortizes."""
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

SCAN_K, B, L, K, S = 128, 8192, 128, 16, 16


def make_kernel(stage):
    def kernel(codes_ref, valid_ref, out_ref):
        codes = codes_ref[:].astype(jnp.uint32)
        n, l = codes.shape
        valid = valid_ref[:]
        if stage == "io":
            out_ref[:] = codes[:, :S] + valid
            return
        ambig_char = (codes >= 4).astype(jnp.uint32)
        two_bit = jnp.where(ambig_char != 0, 0, codes)
        if stage == "decode":
            out_ref[:] = (two_bit + ambig_char)[:, :S]
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
        feats = sp._bitonic_sort_lanes(feats)
        if stage == "sort":
            out_ref[:] = feats[:, :S]
            return
        feats = sp._compact_unique(feats, lane)
        out = jnp.where(lane >= nvalid, sp.SENT, feats)
        out_ref[:] = out[:, :S]
    return kernel


@functools.partial(jax.jit, static_argnames=("stage", "tile"))
def run_scan(wk, vk, stage, tile):
    def body(c, xs):
        w, v = xs
        f = pl.pallas_call(
            make_kernel(stage),
            out_shape=jax.ShapeDtypeStruct((B, S), jnp.uint32),
            grid=(B // tile,),
            in_specs=[pl.BlockSpec((tile, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, S), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(w, v.reshape(B, 1))
        return c, f.sum(axis=1).astype(jnp.int32)
    _, out = jax.lax.scan(body, 0, (wk, vk))
    return out


def main():
    rng = np.random.default_rng(0)
    wk = jnp.asarray(rng.integers(0, 5, (SCAN_K, B, L), dtype=np.uint8))
    vk = jnp.asarray(
        rng.integers(16, L + 1, (SCAN_K, B)).astype(np.int32))
    for tile in (1024,):
        prev = 0.0
        for stage in ("io", "decode", "kmerize", "hash", "sort", "full"):
            r = run_scan(wk, vk, stage, tile)
            np.asarray(r)
            t0 = time.time()
            it = 2
            prevr = None
            for _ in range(it):
                r = run_scan(wk, vk, stage, tile)
                if prevr is not None:
                    np.asarray(prevr)
                prevr = r
            np.asarray(prevr)
            ms = (time.time() - t0) / (it * SCAN_K) * 1000
            print(f"tile={tile:5d} {stage:8s} {ms:7.3f} ms/8192w "
                  f"(marginal {ms - prev:+7.3f})", flush=True)
            prev = ms


if __name__ == "__main__":
    main()
