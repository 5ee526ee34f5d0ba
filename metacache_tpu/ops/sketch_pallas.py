"""Pallas TPU kernel: fused window sketcher.

Hand-written analog of the reference GPU's warp kernels
(warp_kmerize + warp_sort_128 + unique_sketch,
src/gpu_hashmap_operations.cuh:47-366): each 128-char window is k-merized,
canonicalized, hashed, bitonic-sorted *across vector lanes*, deduplicated,
and reduced to the s smallest unique features — entirely in VMEM/registers.

The lane-exchange primitive is `pltpu.roll`: for a power-of-two distance d,
the bitonic partner lane (lane XOR d) is obtained by combining roll(-d)
and roll(+d) under the lane's d-bit. 28 compare-exchange stages sort the
128 lanes, mirroring the reference's in-register bitonic network
(src/gpu_hashmap_operations.cuh:178-308).

Bit-exact with ops.sketch_jax.sketch_windows / the NumPy oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FEATURE_SENTINEL

SENT = np.uint32(FEATURE_SENTINEL)
LANES = 128


def _lane_ids(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _roll(x, shift, l=LANES):
    # pltpu.roll requires a non-negative shift; negatives wrap cyclically
    return pltpu.roll(x, shift % l, 1)


def _bitonic_sort_lanes(x):
    """Ascending bitonic sort of the 128 lanes of each row of x (u32)."""
    n, l = x.shape
    lane = _lane_ids((n, l))
    k = 2
    while k <= l:
        j = k // 2
        while j >= 1:
            up = _roll(x, -j)            # value from lane + j
            down = _roll(x, j)           # value from lane - j
            has_bit = (lane & j) != 0
            partner = jnp.where(has_bit, down, up)
            ascending = (lane & k) == 0
            keep_min = ascending ^ has_bit
            # Mosaic has no unsigned min/max — compare + select
            x_le = x <= partner
            lo = jnp.where(x_le, x, partner)
            hi = jnp.where(x_le, partner, x)
            x = jnp.where(keep_min, lo, hi)
            j //= 2
        k *= 2
    return x


def _sketch_kernel(codes_ref, valid_ref, out_ref, *, k, sketchlen):
    codes = codes_ref[:].astype(jnp.uint32)
    n, l = codes.shape
    valid = valid_ref[:]                    # (n, 1) i32

    # Mosaic only rotates 32-bit lanes — keep flags as u32, not bool
    ambig_char = (codes >= 4).astype(jnp.uint32)
    two_bit = jnp.where(ambig_char != 0, 0, codes)

    kmer = jnp.zeros((n, l), jnp.uint32)
    ambig = jnp.zeros((n, l), jnp.uint32)
    for j in range(k):
        kmer = (kmer << 2) | _roll(two_bit, -j)
        ambig = ambig | _roll(ambig_char, -j)

    # reverse complement + canonical (src/dna_encoding.hpp:169-177)
    s = kmer
    s = ((s >> 2) & jnp.uint32(0x33333333)) | ((s & jnp.uint32(0x33333333)) << 2)
    s = ((s >> 4) & jnp.uint32(0x0F0F0F0F)) | ((s & jnp.uint32(0x0F0F0F0F)) << 4)
    s = ((s >> 8) & jnp.uint32(0x00FF00FF)) | ((s & jnp.uint32(0x00FF00FF)) << 8)
    s = ((s >> 16) & jnp.uint32(0x0000FFFF)) | ((s & jnp.uint32(0x0000FFFF)) << 16)
    rc = (jnp.uint32(0xFFFFFFFF) - s) >> (32 - (k << 1))
    canon = jnp.where(kmer <= rc, kmer, rc)

    # thomas_mueller hash (src/hash_int.hpp:41-48)
    h = canon
    h = ((h >> 16) ^ h) * jnp.uint32(0x45D9F3B)
    h = ((h >> 16) ^ h) * jnp.uint32(0x45D9F3B)
    h = (h >> 16) ^ h

    lane = _lane_ids((n, l))
    nvalid = jnp.maximum(valid - (k - 1), 0)      # (n, 1)
    feats = jnp.where((ambig != 0) | (lane >= nvalid), SENT, h)

    feats = _bitonic_sort_lanes(feats)
    dup = (feats == _roll(feats, 1)) & (lane > 0)
    feats = jnp.where(dup, SENT, feats)
    feats = _bitonic_sort_lanes(feats)

    # s = min(sketchlen, n - k + 1) features per window
    out = jnp.where(lane >= nvalid, SENT, feats)
    out_ref[:] = out[:, :sketchlen]


@functools.partial(jax.jit, static_argnames=("k", "sketchlen", "tile"))
def sketch_windows_pallas(codes: jax.Array, valid_lens: jax.Array,
                          k: int = 16, sketchlen: int = 16,
                          tile: int = 512) -> jax.Array:
    """Pallas window sketcher.

    codes: (N, 128) u8 window codes (winlen <= 128, padded with >= 4);
    valid_lens: (N,) i32. Returns (N, sketchlen) u32, sentinel-padded.
    N must be a multiple of `tile` (callers pad).
    """
    n, l = codes.shape
    assert l == LANES, f"pallas sketcher expects {LANES}-char windows"
    assert n % tile == 0
    grid = (n // tile,)
    return pl.pallas_call(
        functools.partial(_sketch_kernel, k=k, sketchlen=sketchlen),
        out_shape=jax.ShapeDtypeStruct((n, sketchlen), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, sketchlen), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(codes, valid_lens.reshape(n, 1))
