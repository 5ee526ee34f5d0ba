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
    s = shift % l
    if jax.config.jax_enable_x64:
        # x64 mode lowers python-int shifts to i64 constants, which
        # tpu.dynamic_rotate rejects
        s = jnp.int32(s)
    return pltpu.roll(x, s, 1)


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


def _compact_unique(feats, lane):
    """Left-compact the distinct values of each ascending-sorted row.

    Duplicate slots are vacated (become SENT); every element at lane i
    with d = (#dups at lanes < i) moves to lane i - d. The move distances
    are bit-decomposed: because d is monotone in i and destinations are
    strictly increasing, processing one bit at a time never collides
    (positions stay pairwise distinct at every step). 7 prefix-sum steps
    + 7 move steps replace a second full 28-stage bitonic sort.
    """
    n, l = feats.shape
    is_dup = ((feats == _roll(feats, 1)) & (lane > 0)).astype(jnp.int32)
    # inclusive prefix sum of dup counts (Hillis-Steele over lanes)
    p = is_dup
    d = 1
    while d < l:
        p = p + jnp.where(lane >= d, _roll(p, d), 0)
        d *= 2
    shift = jnp.where(is_dup != 0, 0, p - is_dup)   # dups never move
    v = jnp.where(is_dup != 0, SENT, feats)
    b = 1
    while b < l:
        vr = _roll(v, -b)
        sr = _roll(shift, -b)
        arrive = (sr & b) != 0
        depart = (shift & b) != 0
        v = jnp.where(arrive, vr, jnp.where(depart, SENT, v))
        shift = jnp.where(arrive, sr, jnp.where(depart, 0, shift))
        b *= 2
    return v


def _kmerize(two_bit, ambig_char, k, l):
    """All k-char kmers (2 bits/char, first char highest) + ambiguity
    flags by doubling: K_{2m}(i) = (K_m(i) << 2m) | K_m(i+m) — ceil(log2 k)
    + popcount(k) rolls instead of k (src/hash_dna.hpp kmerization
    semantics; the reference slides a 2-bit window per char)."""
    n = two_bit.shape[0]
    pows = {1: (two_bit, ambig_char)}
    m = 1
    while 2 * m <= k:
        km, am = pows[m]
        pows[2 * m] = ((km << (2 * m)) | _roll(km, -m),
                       am | _roll(am, -m))
        m *= 2
    kmer = None
    ambig = None
    done = 0
    for m in sorted(pows, reverse=True):
        if k & m:
            km, am = pows[m]
            kp = _roll(km, -done) if done else km
            ap = _roll(am, -done) if done else am
            if kmer is None:
                kmer, ambig = kp, ap
            else:
                kmer = (kmer << (2 * m)) | kp
                ambig = ambig | ap
            done += m
    return kmer, ambig


def _extract_sketch(feats, nvalid, sketchlen):
    """The s smallest distinct features by iterative min-extraction.

    sketchlen min-reductions over the lanes, each followed by masking
    ALL copies of the minimum (deduplication for free) — replaces the
    full 28-stage bitonic sort + compaction when only the sketch is
    needed. Unsigned order via the sign-flip trick (Mosaic has no
    unsigned min): SENT maps to INT32_MAX, so exhausted rows pad with
    SENT automatically.
    """
    n, l = feats.shape
    v = pltpu.bitcast(feats ^ jnp.uint32(0x80000000), jnp.int32)
    cols = []
    for _ in range(sketchlen):
        m = jnp.min(v, axis=1, keepdims=True)
        cols.append(m)
        v = jnp.where(v == m, jnp.int32(0x7FFFFFFF), v)
    out = jnp.concatenate(cols, axis=1)
    out = pltpu.bitcast(out, jnp.uint32) ^ jnp.uint32(0x80000000)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, sketchlen), 1)
    return jnp.where(col >= nvalid, SENT, out)


def _sketch_kernel(codes_ref, valid_ref, out_ref, *, k, sketchlen,
                   mode="sort"):
    codes = codes_ref[:].astype(jnp.uint32)
    n, l = codes.shape
    valid = valid_ref[:]                    # (n, 1) i32

    # Mosaic only rotates 32-bit lanes — keep flags as u32, not bool
    ambig_char = (codes >= 4).astype(jnp.uint32)
    two_bit = jnp.where(ambig_char != 0, 0, codes)

    kmer, ambig = _kmerize(two_bit, ambig_char, k, l)

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

    if mode == "extract":
        out_ref[:] = _extract_sketch(feats, nvalid, sketchlen)
        return
    feats = _bitonic_sort_lanes(feats)
    feats = _compact_unique(feats, lane)

    # s = min(sketchlen, n - k + 1) features per window
    out = jnp.where(lane >= nvalid, SENT, feats)
    out_ref[:] = out[:, :sketchlen]


@functools.partial(jax.jit,
                   static_argnames=("k", "sketchlen", "tile", "mode"))
def sketch_windows_pallas_long(codes: jax.Array, valid_lens: jax.Array,
                               k: int = 16, sketchlen: int = 16,
                               tile: int = 512,
                               mode: str = "sort") -> jax.Array:
    """Pallas sketcher for windows LONGER than 128 chars (the
    reference's "standard"/"small" presets use winlen 255/511).

    Mirrors the reference GPU's strided-chunk loop carrying the running
    sketch (warp_make_sketch, src/gpu_hashmap_operations.cuh:385-453):
    the window is cut into overlapping 128-char chunks at stride
    128-(k-1), so consecutive chunks PARTITION the k-mer start
    positions; each chunk runs the 128-lane kernel, and the per-chunk
    s-sketches merge by sort + dedup + take-s (a value in the global
    s smallest distinct is necessarily in its own chunk's s smallest
    distinct, so the union of chunk sketches suffices).

    codes: (N, W) u8, W > 128; valid_lens: (N,) i32.
    Returns (N, sketchlen) u32, sentinel-padded. Bit-exact vs the XLA
    sketcher (tests/test_pallas.py)."""
    n, w = codes.shape
    stride = LANES - (k - 1)
    nch = max(1, -(-max(w - (k - 1), 1) // stride))
    chunks = []
    vals = []
    for c in range(nch):
        lo = c * stride
        sl = codes[:, lo:lo + LANES]
        if sl.shape[1] < LANES:
            sl = jnp.pad(sl, ((0, 0), (0, LANES - sl.shape[1])),
                         constant_values=4)
        chunks.append(sl)
        vals.append(jnp.clip(valid_lens - lo, 0, LANES))
    big = jnp.stack(chunks, 1).reshape(n * nch, LANES)
    bval = jnp.stack(vals, 1).reshape(n * nch)
    t = tile if (n * nch) % tile == 0 else n * nch
    sk = sketch_windows_pallas(big, bval, k=k, sketchlen=sketchlen,
                               tile=t, mode=mode)
    sk = sk.reshape(n, nch * sketchlen)
    srt = jnp.sort(sk, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((n, 1), bool), srt[:, 1:] == srt[:, :-1]], axis=1)
    srt = jnp.sort(jnp.where(dup, SENT, srt), axis=1)
    return srt[:, :sketchlen]


@functools.partial(jax.jit,
                   static_argnames=("k", "sketchlen", "tile", "mode"))
def sketch_windows_pallas(codes: jax.Array, valid_lens: jax.Array,
                          k: int = 16, sketchlen: int = 16,
                          tile: int = 512, mode: str = "sort") -> jax.Array:
    """Pallas window sketcher.

    codes: (N, 128) u8 window codes (winlen <= 128, padded with >= 4);
    valid_lens: (N,) i32. Returns (N, sketchlen) u32, sentinel-padded.
    N must be a multiple of `tile` (callers pad).
    """
    n, l = codes.shape
    assert l == LANES, f"pallas sketcher expects {LANES}-char windows"
    assert n % tile == 0
    grid = (n // tile,)
    import contextlib
    x32 = jax.enable_x64(False) if jax.config.jax_enable_x64 \
        else contextlib.nullcontext()
    with x32:
        return _sketch_call(codes, valid_lens, k, sketchlen, tile,
                            mode, n, grid)


def _sketch_call(codes, valid_lens, k, sketchlen, tile, mode, n, grid):
    return pl.pallas_call(
        functools.partial(_sketch_kernel, k=k, sketchlen=sketchlen,
                          mode=mode),
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
