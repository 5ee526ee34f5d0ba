"""On-device feature-table construction (RefSeq-scale builds).

The host path (ops.table.FeatureTable + fused_rows/fused_rows_two_tier)
sorts and fills rows in NumPy and ships multi-GB layouts over the
host->device link — minutes at 100M+ locations through this
environment's TPU tunnel. Here the (feature, target, window) stream
stays on the TPU from the sketch kernel onward, and — unlike a single
global sort, whose 2-3x-stream transients exhausted HBM at ~400M
locations — the build is BOUNDED-MEMORY by construction:

  1. the sketch chunks are radix-placed into G = 2^gbits feature-range
     group buffers by their hash's top bits (each source chunk frees
     right after placement; (tgt, win) packs to one pk lane here)
  2. each group is stably sorted IN PLACE (transients ~ group size,
     not stream size) and contributes its distinct-feature metadata to
     global uniq/sizes arrays at a running row offset
  3. segment scans (cumsum/cummax/cummin) per group derive bucket ids,
     in-bucket columns and overflow ids — all gather-free
  4. HBM-chunked unique-destination scatters fill the globally
     allocated probe layouts group by group (head/overflow fused rows;
     the bucket-row index builds from the small global uniq array)

mirroring the reference's GPU-side bulk insert (gpu_hashmap.cu:190-230,
warpcore insert + bb_segsort) and its free-VRAM-bounded sizing
(gpu_hashmap.cu:1114-1133). A handful of tiny host syncs (per-group
distinct counts + bucket-size histograms) size the static shapes.

Layout parity: rows are bit-identical to ops.table.FeatureTable's
fused_rows / fused_rows_two_tier / ops.probe.make_bucket_index for the
same input stream regardless of gbits (tests/test_table_device.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

IMAX = jnp.iinfo(jnp.int32).max
SENT = np.uint32(0xFFFFFFFF)   # sentinel feature (empty sketch slots)


class DeviceTable(NamedTuple):
    """Probe-ready device arrays (single part)."""
    uniq: jax.Array          # (F,) u32 sorted distinct features
    offsets: jax.Array       # (F+1,) i32 capped CSR offsets
    head: jax.Array          # (F, 64+) i32 fused head rows
    ovf: jax.Array           # (NOVF+1, ...) i32 overflow rows (row 0 dummy)
    brows: jax.Array         # (2^bits, 64) i32 bucket-row probe index
    bbits: int
    nf: int                  # distinct features
    spf: int                 # slots per feature (= min(max bucket, cap))
    head_slots: int          # H (== spf when dense)
    num_locations: int       # total capped locations
    dense: bool = False      # head rows are the 1-gather dense layout
    layout_bytes: int = 0    # device bytes of head+ovf rows
    packed: bool = False     # head: two 64-lane rows per 128-lane row
    ovf_packed: bool = False # overflow rows likewise
    max_win: int = 0         # max window index over all locations
    slot_bits: int = 0       # >0: rows store pk = (tgt << bits) | win
                             # in ONE lane per slot (half the bytes)
    classed: bool = False    # head = size-classed unified cell array
                             # (16/32/64-lane cells, CLASS_LADDER)


def _chunked_scatter(out, rows, cols, vals, nch: int):
    """out.at[rows, cols].set(vals) in nch sequential chunks (bounds the
    scatter's index/update temporaries to chunk size; destinations are
    unique so chunk order is irrelevant). Out-of-range rows/cols drop."""
    n = rows.shape[0]
    ch = -(-n // nch)
    pad = ch * nch - n
    if pad:
        rows = jnp.concatenate([rows, jnp.full((pad,), out.shape[0],
                                               rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros((pad,), cols.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])

    def body(i, out):
        r = jax.lax.dynamic_slice(rows, (i * ch,), (ch,))
        c = jax.lax.dynamic_slice(cols, (i * ch,), (ch,))
        v = jax.lax.dynamic_slice(vals, (i * ch,), (ch,))
        return out.at[r, c].set(v, mode="drop", unique_indices=True)

    return jax.lax.fori_loop(0, nch, body, out)


def _segments(fs):
    """Per-element segment scans over the feature-sorted stream:
    -> (newf, r bucket id, col in-bucket position, size_el bucket size)."""
    n = fs.shape[0]
    prev = jnp.concatenate([fs[:1] ^ jnp.uint32(1), fs[:-1]])
    newf = fs != prev
    i = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    r = jnp.cumsum(newf.astype(jnp.int32)) - 1
    first = jax.lax.cummax(jnp.where(newf, i, -1))
    col = i - first
    # next bucket's start (this bucket's end), via reverse cummin
    nxt = jnp.concatenate(
        [jnp.where(newf, i, IMAX)[1:], jnp.full((1,), n, jnp.int32)])
    nxt = jax.lax.cummin(nxt[::-1])[::-1]
    size_el = nxt - first
    return newf, r, col, size_el


HIST_BITS = 12       # top-bits histogram resolution for boundary picks


@functools.partial(jax.jit, donate_argnums=(0,))
def _chunk_stats(acc, f, t, w):
    """Per-chunk pass accumulating into `acc` (donated:
    [hist(2^HIST_BITS) | nsent | maxw | maxt] i64) — device-side
    accumulation means ONE d2h fetch for the whole phase instead of
    per-chunk syncs (each small fetch costs ~40 ms on this link).

    Min-hash features skew heavily toward SMALL hash values (every
    sketch keeps its window's minima), so fixed-width top-bit radix
    groups are pathologically unbalanced (~84% of a real stream lands
    in group 0); the histogram lets the host pick QUANTILE group
    boundaries instead."""
    f = f.astype(jnp.uint32)
    valid = f != SENT
    nb = 1 << HIST_BITS
    bins = jnp.where(valid,
                     (f >> np.uint32(32 - HIST_BITS)).astype(jnp.int32),
                     nb)
    hist = jnp.bincount(bins, length=nb + 1).astype(acc.dtype)
    maxw = jnp.max(jnp.where(valid, w, 0)).astype(acc.dtype)
    maxt = jnp.max(jnp.where(valid, t, 0)).astype(acc.dtype)
    acc = acc.at[:nb + 1].add(hist)
    acc = acc.at[nb + 1].max(maxw)
    acc = acc.at[nb + 2].max(maxt)
    return acc


def _group_bounds(hist: np.ndarray, nsent: int, G: int):
    """Quantile group boundaries (G-1 ascending u32 values, bin-
    aligned, < SENT) over the REAL feature mass; group g = features in
    [bounds[g-1], bounds[g]); sentinels always land in the last group.
    -> (bounds (G-1,) u32, per-group element counts (G,))."""
    nb = len(hist)
    csum = np.cumsum(hist)
    total = int(csum[-1])
    edges = [0]
    for g in range(1, G):
        b = int(np.searchsorted(csum, g * total / G)) + 1
        edges.append(max(min(b, nb - 1), edges[-1]))
    edges.append(nb)
    bnds = (np.asarray(edges[1:G], np.uint64)
            << np.uint64(32 - HIST_BITS)).astype(np.uint32)
    counts = np.asarray(
        [int(hist[edges[g]:edges[g + 1]].sum()) for g in range(G)],
        np.int64)
    counts[G - 1] += int(nsent)
    return bnds, counts


def _grp_of(f, bnds):
    """Group id per element: #boundaries <= f (bnds ascending u32)."""
    if bnds.shape[0] == 0:
        return jnp.zeros(f.shape, jnp.int32)
    return (f[:, None] >= bnds[None, :]).sum(axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("G", "slot_bits"),
                   donate_argnums=(0, 1))
def _place_chunk(bufF, bufV, offs, f, t, w, bnds, G: int,
                 slot_bits: int):
    """Scatter one chunk's elements into the (G, S) group buffers at
    the running per-group offsets (donated: updated in place); group =
    quantile range of the feature value (bnds from _group_bounds).

    ``slot_bits > 0``: (tgt, win) packs to pk = (tgt << bits) | win in
    bufV[0] right here — the stream carries 8 B/element from this point
    on. Otherwise bufV[0] = tgt, bufV[1] = win."""
    S = bufF.shape[1]
    f = f.astype(jnp.uint32)
    t = t.astype(jnp.int32)
    w = w.astype(jnp.int32)
    if slot_bits:
        vals = [(t << slot_bits) | w]
    else:
        vals = [t, w]
    grp = _grp_of(f, bnds)
    for g in range(G):
        m = grp == g
        rank = jnp.cumsum(m.astype(jnp.int32)) - 1
        dest = jnp.where(m, offs[g] + rank, S)
        bufF = bufF.at[g, dest].set(f, mode="drop",
                                    unique_indices=True)
        for v, vv in enumerate(vals):
            bufV = bufV.at[v, g, dest].set(vv, mode="drop",
                                           unique_indices=True)
    return bufF, bufV, offs + jnp.bincount(grp, length=G)


@functools.partial(jax.jit, static_argnames=("presorted", "nkeys"),
                   donate_argnums=(0, 1))
def _sort_group(bufF, bufV, g, presorted: bool, nkeys: int):
    """Stably sort group row g by feature in place; -> (bufF, bufV,
    nf_g distinct real features, maxb_g max bucket size).

    When not presorted, the value lanes join the sort key (pk sorts
    identically to lexicographic (tgt, win))."""
    S = bufF.shape[1]
    V = bufV.shape[0]
    fr = jax.lax.dynamic_slice(bufF, (g, jnp.int32(0)), (1, S)).reshape(S)
    vr = [jax.lax.dynamic_slice(bufV, (jnp.int32(v), g, jnp.int32(0)),
                            (1, 1, S)).reshape(S)
          for v in range(V)]
    if presorted:
        srt = jax.lax.sort((fr, *vr), dimension=0, num_keys=1,
                           is_stable=True)
    else:
        srt = jax.lax.sort((fr, *vr), dimension=0,
                           num_keys=min(1 + nkeys, 1 + V))
    fs = srt[0]
    newf, r, col, _ = _segments(fs)
    valid = fs != SENT
    nf_g = jnp.sum((newf & valid).astype(jnp.int32))
    maxb_g = jnp.max(jnp.where(valid, col, -1)) + 1
    bufF = jax.lax.dynamic_update_slice(bufF, fs.reshape(1, S),
                                        (g, jnp.int32(0)))
    for v in range(V):
        bufV = jax.lax.dynamic_update_slice(
            bufV, srt[1 + v].reshape(1, 1, S),
            (jnp.int32(v), g, jnp.int32(0)))
    return bufF, bufV, nf_g, maxb_g


@functools.partial(jax.jit, static_argnames=("cap", "nch"),
                   donate_argnums=(0, 1))
def _group_meta(uniq, sizes, bufF, g, nf_off, cap: int, nch: int):
    """Scatter group g's distinct features + capped bucket sizes into
    the global uniq/sizes arrays (donated) at row offset nf_off;
    -> (uniq, sizes, hist (cap+2,) group bucket-size histogram)."""
    S = bufF.shape[1]
    nf_pad = uniq.shape[0]
    fs = jax.lax.dynamic_slice(bufF, (g, jnp.int32(0)), (1, S)).reshape(S)
    newf, r, col, size_el = _segments(fs)
    valid = fs != SENT
    capped = jnp.minimum(size_el, cap)
    start_rows = jnp.where(newf & valid, nf_off + r, nf_pad)
    zcol = jnp.zeros((S,), jnp.int32)
    sizes = _chunked_scatter(sizes.reshape(nf_pad, 1), start_rows, zcol,
                             capped, nch).reshape(nf_pad)
    uniq = _chunked_scatter(uniq.reshape(nf_pad, 1), start_rows, zcol,
                            fs, nch).reshape(nf_pad)
    hist = jnp.bincount(jnp.where(newf & valid, capped, cap + 1),
                        length=cap + 2)
    return uniq, sizes, hist


def _marks_segments(marks):
    """_segments from either a sorted feature stream (u32, sentinel-
    aware) or precomputed bucket-start flags (bool, CSR path)."""
    if marks.dtype == jnp.uint32:
        return _segments(marks)
    start = marks
    n = start.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    r = jnp.cumsum(start.astype(jnp.int32)) - 1
    first = jax.lax.cummax(jnp.where(start, i, -1))
    col = i - first
    nxt = jnp.concatenate(
        [jnp.where(start, i, IMAX)[1:], jnp.full((1,), n, jnp.int32)])
    nxt = jax.lax.cummin(nxt[::-1])[::-1]
    size_el = nxt - first
    return start, r, col, size_el


def _slice_marks_vals(marks, vals, g, vsel: int):
    """Resolve the (marks, vals) element streams for one fill pass:
    device path passes the (G, S) feature matrix + (V, G, S) value
    stack and a group index; the CSR staging path passes flat arrays
    (bool bucket-start marks) with g ignored."""
    if marks.ndim == 2:
        S = marks.shape[1]
        marks = jax.lax.dynamic_slice(marks, (g, jnp.int32(0)), (1, S)).reshape(S)
    if vals.ndim == 3:
        S = vals.shape[2]
        vals = jax.lax.dynamic_slice(vals, (jnp.int32(vsel), g, jnp.int32(0)),
                                     (1, 1, S)).reshape(S)
    return marks, vals


@functools.partial(jax.jit, static_argnames=("kind", "colbase", "head",
                                             "cap", "nch", "nrows",
                                             "pack", "vsel"),
                   donate_argnums=(0,))
def _fill_span_g(rows, marks, vals, g, nf_off, novf_off, nf_g, *,
                 kind: str, colbase: int, head: int, cap: int,
                 nch: int, nrows: int, pack: bool = False,
                 vsel: int = 0):
    """One scatter pass writing group g's `vals` into `rows` (donated:
    updated in place). kind="head": bucket columns [0, head) at
    colbase+col of global row nf_off+r; kind="ovf": columns [head, cap)
    of oversized buckets at colbase+(col-head) of global overflow row
    novf_off+ovfid. Each pass is its own jit so only ONE group's
    segment-scan working set is resident at a time — RefSeq-scale fills
    would exceed HBM in a single fused stage.

    Buckets at local r >= nf_g (sentinel features and group-buffer
    padding, which sort last) are dropped — their global rows would
    collide with the next group's.

    `pack=True`: two logical 64-lane rows share one physical 128-lane
    row (logical row r -> physical (r >> 1, (r & 1) * 64 + col)); the
    TPU's (8, 128) int32 tiling would otherwise pad 64-lane rows 2x.
    `nrows` is the LOGICAL row count (must be even when packing)."""
    marks, vals = _slice_marks_vals(marks, vals, g, vsel)
    newf, r, col, size_el = _marks_segments(marks)
    ok_r = r < nf_g
    if kind == "head":
        rr = jnp.where((col < head) & ok_r, nf_off + r, nrows)
        cc = colbase + jnp.minimum(col, max(head - 1, 0))
    else:
        over_el = jnp.minimum(size_el, cap) > head
        ovfid_el = jnp.cumsum((newf & over_el).astype(jnp.int32))
        in_ovf = (col >= head) & (col < cap) & over_el & ok_r
        rr = jnp.where(in_ovf, novf_off + ovfid_el, nrows)
        cc = colbase + jnp.clip(col - head, 0, max(cap - head - 1, 0))
    if pack:
        rr, cc = rr >> 1, (rr & 1) * 64 + cc
    return _chunked_scatter(rows, rr, cc, vals, nch)


@functools.partial(jax.jit, static_argnames=("hw", "dense", "head",
                                             "pack"))
def _head_init(sizes, uniq, hw: int, dense: bool, head: int,
               pack: bool = False):
    """Feature-row headers: [f, count(, ovfid)] + zeroed location lanes.

    With u64 features (uniq.dtype == uint64) the feature takes TWO meta
    lanes [flo, fhi, count(, ovfid)] — the probe verifies both after
    the row gather (the bucket index only compares the low 32 bits)."""
    nf = sizes.shape[0]
    wide = uniq.dtype == jnp.uint64
    fi = jax.lax.broadcasted_iota(jnp.int32, (nf,), 0)
    shape = (nf // 2, 128) if pack else (nf, hw)
    headrows = jnp.zeros(shape, jnp.int32)
    ri = fi >> 1 if pack else fi
    cb = (fi & 1) * 64 if pack else jnp.zeros((nf,), jnp.int32)
    if wide:
        lo = jax.lax.bitcast_convert_type(
            (uniq & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            jnp.int32)
        hi = jax.lax.bitcast_convert_type(
            (uniq >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32)
        headrows = headrows.at[ri, cb].set(lo)
        headrows = headrows.at[ri, cb + 1].set(hi)
        nx = 2
    else:
        headrows = headrows.at[ri, cb].set(
            jax.lax.bitcast_convert_type(uniq, jnp.int32))
        nx = 1
    headrows = headrows.at[ri, cb + nx].set(sizes)
    if not dense:
        over_f = sizes > head
        ovfid_f = jnp.where(over_f,
                            jnp.cumsum(over_f.astype(jnp.int32)), 0)
        headrows = headrows.at[ri, cb + nx + 1].set(ovfid_f)
    return headrows


def slot_pack_bits(maxwin: int, maxtgt: int) -> int:
    """wbits for the packed slot encoding, or 0 when it cannot fit i32.

    One extra bit of window headroom keeps the inter-target gap larger
    than any clamped mwir (see ops.candidates_pallas._packed_kernel)."""
    import os
    if os.environ.get("MC_PACK_STORE", "1") == "0":
        return 0
    wbits = max(1, (2 * maxwin).bit_length())
    pkmax = (maxtgt << wbits) | maxwin
    return wbits if pkmax < 2**31 - 1 else 0


@functools.partial(jax.jit, static_argnames=("bits", "nch"))
def _brows_build(uniq, bits: int, nch: int):
    """Bucket-row probe index (ops.probe.make_bucket_index layout:
    row h = [start, features...], width 64) + max span check value."""
    nf = uniq.shape[0]
    fi = jax.lax.broadcasted_iota(jnp.int32, (nf,), 0)
    nb = 1 << bits
    h = (uniq >> np.uint32(32 - bits)).astype(jnp.int32)
    prev_h = jnp.concatenate([jnp.full((1,), -1, jnp.int32), h[:-1]])
    newh = h != prev_h
    firsth = jax.lax.cummax(jnp.where(newh, fi, -1))
    local = fi - firsth
    bstart = jnp.full((nb, 1), IMAX, jnp.int32)
    bstart = _chunked_scatter(
        bstart, jnp.where(newh, h, nb),
        jnp.zeros((nf,), jnp.int32), fi, nch).reshape(nb)
    # empty buckets point at the next nonempty one (== searchsorted);
    # sentinel padding rows land in the last bucket, whose scattered
    # value (-1) equals the empty-lane fill
    nreal = jnp.sum((uniq != SENT).astype(jnp.int32))
    bstart = jnp.minimum(jnp.concatenate(
        [bstart, jnp.full((1,), IMAX, jnp.int32)]), IMAX)
    bstart = jax.lax.cummin(bstart[::-1])[::-1][:nb]
    bstart = jnp.minimum(bstart, nreal)
    # packed: bucket rows 2p / 2p+1 share physical row p (lanes 0-63 /
    # 64-127) — nb is a power of two, always even
    brows = jnp.full((nb // 2, 128), -1, jnp.int32)
    brows = brows.at[:, 0].set(bstart[0::2])
    brows = brows.at[:, 64].set(bstart[1::2])
    rr = jnp.where(local < 63, h, nb)
    brows = _chunked_scatter(
        brows, rr >> 1, (rr & 1) * 64 + 1 + local,
        jax.lax.bitcast_convert_type(uniq, jnp.int32), nch)
    maxspan = jnp.max(jnp.where(uniq != SENT, local, 0)) + 1
    return brows, maxspan




CLASS_LADDER = (13, 29, 61)       # slots per cell class (16/32/64 lanes)


def _want_classed(head: int, spf: int, dense: bool, slot_bits: int):
    """Layout policy for the size-classed head array.

    MC_CLASSED=0 never, =1 always (budget permitting). Unset -> auto:
    the uniform two-tier layout probes ~12% faster (measured: fused
    escalation 11.5 vs 13.1 ms/batch at the 944 Mbp bench), so prefer
    it whenever the budget lets it keep a full 61-slot head; switch to
    classed only when the budget pinched the two-tier head below the
    ladder's top class — there classed buys head DEPTH (fewer
    escalations) and ~2.4x capacity for the same bytes.
    """
    import os as _os
    mc = _os.environ.get("MC_CLASSED", "")
    if mc == "0" or dense or not slot_bits:
        return False
    if mc == "1":
        return True
    # unrecognized values fall through to the auto heuristic
    # (help.py documents 0|1|unset only)
    return head < min(CLASS_LADDER[2], spf)


def _classed_total16(nA: int, nB: int, nC: int):
    """16-lane-unit extent of the unified classed head array; classes
    are grouped (A then B then C) with 8-unit (one physical row)
    aligned bases so no cell crosses a 128-lane row."""
    baseA = 0
    baseB = -(-(baseA + nA) // 8) * 8
    baseC = -(-(baseB + 2 * nB) // 8) * 8
    return baseA, baseB, baseC, baseC + 4 * nC


@functools.partial(jax.jit, static_argnames=("spf",))
def _classed_addr(sizes, spf: int):
    """Per-feature classed-cell addresses.

    -> (addr16 (nf,) i32 cell offset in 16-lane units,
        cls (nf,) i32 class 0/1/2, ovfid (nf,) i32)."""
    hA, hB, hC = CLASS_LADDER
    cls = jnp.where(sizes <= hA, 0, jnp.where(sizes <= hB, 1, 2))
    isA, isB, isC = cls == 0, cls == 1, cls == 2
    nA = jnp.cumsum(isA.astype(jnp.int32))
    nB = jnp.cumsum(isB.astype(jnp.int32))
    nC = jnp.cumsum(isC.astype(jnp.int32))
    baseB = ((nA[-1] + 7) // 8) * 8
    baseC = ((baseB + 2 * nB[-1] + 7) // 8) * 8
    rank = jnp.where(isA, nA - 1, jnp.where(isB, nB - 1, nC - 1))
    w16 = jnp.where(isA, 1, jnp.where(isB, 2, 4))
    base = jnp.where(isA, 0, jnp.where(isB, baseB, baseC))
    addr16 = base + rank * w16
    over_f = sizes > min(hC, spf)
    ovfid = jnp.where(over_f, jnp.cumsum(over_f.astype(jnp.int32)), 0)
    return addr16, cls, ovfid


@functools.partial(jax.jit, static_argnames=("P", "nch"),
                   donate_argnums=(0,))
def _classed_meta_fill(rows, uniq, sizes, addr16, cls, ovfid,
                       P: int, nch: int):
    """Write per-cell meta lanes [feat, cnt(, ovfid for class C)]."""
    pos = addr16 * 16
    fi = jax.lax.bitcast_convert_type(uniq, jnp.int32)
    rr, cc = pos >> 7, pos & 127
    rows = _chunked_scatter(rows, rr, cc, fi, nch)
    rows = _chunked_scatter(rows, rr, cc + 1, sizes, nch)
    rr2 = jnp.where(cls == 2, rr, P)
    rows = _chunked_scatter(rows, rr2, cc + 2, ovfid, nch)
    return rows


@functools.partial(jax.jit, static_argnames=("spf", "P", "nch", "vsel"),
                   donate_argnums=(0,))
def _classed_slot_fill_g(rows, marks, vals, g, nf_off, nf_g,
                         addr16_f, cls_f, spf: int, P: int, nch: int,
                         vsel: int = 0):
    """Scatter group g's in-head slots into classed cells (slot lanes
    start at meta+col; class C head = 61 slots). addr16_f/cls_f are the
    GLOBAL per-feature arrays, indexed at the global row nf_off+r."""
    marks, vals = _slice_marks_vals(marks, vals, g, vsel)
    newf, r, col, _ = _marks_segments(marks)
    ok_r = r < nf_g
    rg = jnp.minimum(nf_off + r, addr16_f.shape[0] - 1)
    a16 = addr16_f[rg]
    cl = cls_f[rg]
    meta = jnp.where(cl == 2, 3, 2)
    cap = jnp.where(cl == 2, min(61, spf),
                    jnp.where(cl == 1, CLASS_LADDER[1], CLASS_LADDER[0]))
    pos = a16 * 16 + meta + col
    ok = (col < cap) & ok_r
    rr = jnp.where(ok, pos >> 7, P)
    cc = jnp.where(ok, pos & 127, 0)
    return _chunked_scatter(rows, rr, cc, vals, nch)


@functools.partial(jax.jit, static_argnames=("bits", "nch"))
def _brows_build_classed(uniq, cls_f, bits: int, nch: int):
    """Classed bucket-row index: logical 64-lane row h =
    [a16_A, a16_B, a16_C, 61 x packed-entry lanes] pair-packed two per
    128-lane physical row.

    A packed-entry lane holds TWO features' entries (low/high 16 bits),
    each e + 1 with e = (class << 14) | (feature & low_mask) — 0 means
    empty, and class 3 never occurs, so empties can't collide with
    data. a16_X = the classed-cell address the bucket's first class-X
    feature would get (base + start-rank * width), so the probe
    computes addr16 = a16_X + (#earlier same-class entries) * w16
    without any per-database static bases."""
    nf = uniq.shape[0]
    fi = jax.lax.broadcasted_iota(jnp.int32, (nf,), 0)
    nb = 1 << bits
    h = (uniq >> np.uint32(32 - bits)).astype(jnp.int32)
    prev_h = jnp.concatenate([jnp.full((1,), -1, jnp.int32), h[:-1]])
    newh = h != prev_h
    firsth = jax.lax.cummax(jnp.where(newh, fi, -1))
    local = fi - firsth
    # class-start ranks at each feature: number of same-class features
    # BEFORE it, converted to that class's cell address
    ccum = [jnp.cumsum((cls_f == c).astype(jnp.int32)) - (cls_f == c)
            for c in range(3)]
    # base addresses from total counts (same formula as _classed_addr)
    totA = jnp.sum((cls_f == 0).astype(jnp.int32))
    totB = jnp.sum((cls_f == 1).astype(jnp.int32))
    baseB = ((totA + 7) // 8) * 8
    baseC = ((baseB + 2 * totB + 7) // 8) * 8
    bases = [jnp.int32(0), baseB, baseC]
    brows = jnp.zeros((nb // 2, 128), jnp.int32)
    for c, w in ((0, 1), (1, 2), (2, 4)):
        a16_c = bases[c] + ccum[c] * w
        rr = jnp.where(newh, h, nb)
        brows = _chunked_scatter(
            brows, rr >> 1, (rr & 1) * 64 + c, a16_c,
            max(nch // 8, 1))
    low_mask = jnp.uint32((1 << (32 - bits)) - 1)
    e1 = ((cls_f << 14) |
          (uniq & low_mask).astype(jnp.int32)) + 1
    e1 = jnp.where(uniq != SENT, e1, 0)
    # two entries share a lane (halves): combine the odd-local entry
    # into its even-local predecessor BEFORE the (unique-index) scatter
    nxt_e1 = jnp.concatenate([e1[1:], jnp.zeros((1,), jnp.int32)])
    nxt_h = jnp.concatenate([h[1:], jnp.full((1,), -1, jnp.int32)])
    pair = (nxt_h == h) & ((local & 1) == 0)
    val = e1 | jnp.where(pair, nxt_e1 << 16, 0)
    lane = 3 + (local >> 1)
    rr = jnp.where((lane < 64) & ((local & 1) == 0), h, nb)
    brows = _chunked_scatter(
        brows, rr >> 1, (rr & 1) * 64 + lane, val, max(nch // 8, 1))
    maxspan = jnp.max(jnp.where(uniq != SENT, local, 0)) + 1
    return brows, maxspan


@functools.partial(jax.jit, static_argnames=("bits",))
def _max_span(uniq, bits: int):
    """Widest same-hash-prefix feature run (sentinel rows excluded)."""
    nf = uniq.shape[0]
    h = (uniq >> np.uint32(32 - bits)).astype(jnp.int32)
    fi = jax.lax.broadcasted_iota(jnp.int32, (nf,), 0)
    newh = h != jnp.concatenate([jnp.full((1,), -1, jnp.int32), h[:-1]])
    firsth = jax.lax.cummax(jnp.where(newh, fi, -1))
    local = fi - firsth
    return jnp.max(jnp.where(uniq != SENT, local, 0)) + 1


def _choose_bits(uniq, bits: int, span_cap: int = 63,
                 min_bits: int = 0) -> int:
    """Smallest hash-prefix width whose widest span fits the bucket
    row (63 features, or 122 packed 16-bit entries for the classed
    index). Min-hash feature sets are skewed toward SMALL hash values
    (the sketch keeps each window's minima), so spans run ~4x the
    uniform estimate — measure instead of assuming."""
    bits = max(bits, min_bits)
    while bits < 26 and int(np.asarray(_max_span(uniq, bits))) > span_cap:
        bits += 1
    if bits >= 26 and int(np.asarray(_max_span(uniq, bits))) > span_cap:
        # entries beyond the row width would be silently dropped (the
        # probe could then miss stored features) — fail loudly instead
        raise MemoryError(
            f"bucket-row span exceeds {span_cap} even at 2^{bits} "
            "prefix buckets; split the database (-parts/-table-shards)")
    return bits

def _pack_auto(nf_rows: int) -> bool:
    """Pair-pack 64-lane rows only when the tiling padding would waste
    real memory (> ~0.5 GiB): the packed probe pays an extra half-select
    per gather (~0.6 ms/batch measured on a toy DB), so small tables
    stay unpacked. MC_PACK_ROWS=0/1 overrides."""
    import os
    env = os.environ.get("MC_PACK_ROWS")
    if env in ("0", "1"):
        return env == "1"
    # unpacked 64-lane rows physically occupy 512 B each (tiling pads to
    # 128 lanes); pack when that padding costs > ~3 GiB
    return nf_rows * 512 > (3 << 30)


def _vsel(vals, v: int):
    """Value stream for fill pass v: the 3-D (V, G, S) device stack
    itself (vsel selects inside the jit) or element v of a flat list."""
    return vals if hasattr(vals, "ndim") else vals[v]


def _fill_layouts(get_mv, G: int, nf_offs, nf_gs, novf_offs, sizes,
                  uniq, *, nf_pad: int, novf: int, cap: int, head: int,
                  bits: int, nch: int, dense: bool,
                  pack_rows: bool = True, slot_bits: int = 0,
                  brows_ready=None):
    """Head rows, overflow rows and the bucket index, filled group by
    group via per-fill jits — concurrent HBM residency is the group
    buffers + the two layout arrays + ONE fill's working set.

    get_mv(g) -> (marks, vals) for group g: the shared (G, S)/(V, G, S)
    device matrices, or freshly-staged flat arrays (CSR path — freed
    when the loop iteration drops them).

    ``slot_bits > 0``: rows store packed pk = (tgt << slot_bits) | win
    in ONE lane per slot — half the layout bytes, half the fills.

    u64 features (uniq.dtype == uint64) take an extra meta lane; the
    bucket index is then host-built (``brows_ready``)."""
    wide = uniq.dtype == jnp.uint64
    base = (2 if dense else 3) + (1 if wide else 0)
    spl = 1 if slot_bits else 2        # lanes per slot
    hw = _pad64(base + spl * head)
    pack = pack_rows and hw == 64 and nf_pad % 2 == 0
    ow = cap - head
    ocols = _pad64(spl * ow) if ow > 0 else 64
    novf_pad = _quantize(novf, 10) if novf else 0
    novf_rows = novf_pad + 2 if novf_pad % 2 else novf_pad + 1
    opack = ocols == 64 and novf_rows % 2 == 0
    ovfrows = jnp.zeros((novf_rows // 2, 128) if opack else
                        (novf_rows, ocols), jnp.int32)
    headrows = _head_init(sizes, uniq, hw=hw, dense=dense, head=head,
                          pack=pack)
    for g in range(G):
        if nf_gs[g] == 0:
            continue
        marks, vals = get_mv(g)
        gi, fo = np.int32(g), np.int32(nf_offs[g])
        no, ng = np.int32(novf_offs[g]), np.int32(nf_gs[g])
        if ow > 0 and novf > 0:
            ovfrows = _fill_span_g(
                ovfrows, marks, _vsel(vals, 0), gi, fo, no, ng,
                kind="ovf", colbase=0, head=head, cap=cap, nch=nch,
                nrows=novf_rows, pack=opack, vsel=0)
            if not slot_bits:
                ovfrows = _fill_span_g(
                    ovfrows, marks, _vsel(vals, 1), gi, fo, no, ng,
                    kind="ovf", colbase=ow, head=head, cap=cap,
                    nch=nch, nrows=novf_rows, pack=opack, vsel=1)
        headrows = _fill_span_g(
            headrows, marks, _vsel(vals, 0), gi, fo, no, ng,
            kind="head", colbase=base, head=head, cap=cap, nch=nch,
            nrows=nf_pad, pack=pack, vsel=0)
        if not slot_bits:
            headrows = _fill_span_g(
                headrows, marks, _vsel(vals, 1), gi, fo, no, ng,
                kind="head", colbase=base + head, head=head, cap=cap,
                nch=nch, nrows=nf_pad, pack=pack, vsel=1)
    if brows_ready is not None:
        brows = brows_ready
    else:
        brows, _maxspan = _brows_build(uniq, bits=bits,
                                       nch=max(nch // 8, 1))
    return headrows, ovfrows, brows, pack, opack


def _pad64(c: int) -> int:
    return max(64, ((c + 7) // 8) * 8)


def _classed_counts(hist: np.ndarray, nf_pad: int):
    """(nA, nB, nC) class populations incl. sentinel padding rows
    (size 0 -> class A) from the REAL bucket-size histogram."""
    hA, hB = CLASS_LADDER[0], CLASS_LADDER[1]
    real = int(hist.sum())
    nA = int(hist[:hA + 1].sum()) + (nf_pad - real)
    nB = int(hist[hA + 1:hB + 1].sum())
    nC = nf_pad - nA - nB
    return nA, nB, nC


def _classed_bytes(hist: np.ndarray, nf_pad: int, spf: int,
                   cum_over: np.ndarray):
    """Physical bytes of the classed head array + overflow rows."""
    nA, nB, nC = _classed_counts(hist, nf_pad)
    *_b, total16 = _classed_total16(nA, nB, nC)
    P = -(-_quantize(max(total16, 8), 10) // 8)
    hC = min(CLASS_LADDER[2], spf)
    b = P * 512
    if spf > hC:
        novf = int(cum_over[hC + 1])
        ow = _pad64(spf - hC)
        rowb = max(-(-ow // 128) * 128, 128) * 4 // (2 if ow <= 64 else 1)
        b += (_quantize(novf, 10) + 1) * rowb
    return b


def _fill_layouts_classed(get_mv, G: int, nf_offs, nf_gs, novf_offs,
                          sizes, uniq, *, novf: int, cap: int,
                          bits: int, nch: int, slot_bits: int,
                          P16: int):
    """Classed unified head cells + overflow rows + classed bucket
    index, filled group by group (HBM residency bounded like
    _fill_layouts). Requires slot_bits > 0 (enforced by
    _want_classed)."""
    hC = min(CLASS_LADDER[2], cap)
    ow = cap - hC
    ocols = _pad64(ow) if ow > 0 else 64
    novf_pad = _quantize(novf, 10) if novf else 0
    novf_rows = novf_pad + 2 if novf_pad % 2 else novf_pad + 1
    opack = ocols == 64 and novf_rows % 2 == 0
    P = -(-P16 // 8)
    addr16_f, cls_f, ovfid_f = _classed_addr(sizes, spf=cap)
    ovfrows = jnp.zeros((novf_rows // 2, 128) if opack else
                        (novf_rows, ocols), jnp.int32)
    headrows = jnp.zeros((P, 128), jnp.int32)
    headrows = _classed_meta_fill(headrows, uniq, sizes, addr16_f,
                                  cls_f, ovfid_f, P=P, nch=nch)
    for g in range(G):
        if nf_gs[g] == 0:
            continue
        marks, vals = get_mv(g)
        gi, fo = np.int32(g), np.int32(nf_offs[g])
        no, ng = np.int32(novf_offs[g]), np.int32(nf_gs[g])
        if ow > 0 and novf > 0:
            ovfrows = _fill_span_g(
                ovfrows, marks, _vsel(vals, 0), gi, fo, no, ng,
                kind="ovf", colbase=0, head=hC, cap=cap, nch=nch,
                nrows=novf_rows, pack=opack, vsel=0)
        headrows = _classed_slot_fill_g(
            headrows, marks, _vsel(vals, 0), gi, fo, ng,
            addr16_f, cls_f, spf=cap, P=P, nch=nch, vsel=0)
    brows, _maxspan = _brows_build_classed(uniq, cls_f, bits=bits,
                                           nch=max(nch // 8, 1))
    return headrows, ovfrows, brows, opack


def _choose_head(spf, cum_over, bytes_for, budget_bytes, what,
                 slot_packed: bool = False):
    """Smallest-footprint two-tier head width that fits the budget.

    Sweeps narrow heads as well as a row-width ladder (61 + 32k slots
    when slot-packed: 3 meta lanes + H slots fill 64-lane rows exactly;
    30 + 16k otherwise) so a tight HBM budget can still fit a layout
    instead of erroring."""
    if slot_packed:
        cands = [h for h in (13, 29, 45) if 0 < h < spf]
        hcand, step = min(61, spf - 1), 32
    else:
        cands = [h for h in (6, 14, 22) if 0 < h < spf]
        hcand, step = min(30, spf - 1), 16
    while 0 < hcand < spf:
        cands.append(hcand)
        hcand += step
    best = None
    for hcand in cands:
        n_over = int(cum_over[hcand + 1])
        b = bytes_for(hcand, n_over)
        if b <= budget_bytes and (best is None or b < best[0]):
            best = (b, hcand)
    if best is None:
        raise MemoryError(
            f"device {what} needs more HBM than the "
            f"{budget_bytes/2**30:.1f} GiB budget at any head "
            "width; use -table-shards / -parts or cull features")
    return best[1]


def _quantize(n: int, min_bits: int) -> int:
    """Round n up to ~3 significant bits so static shapes (and their
    multi-minute remote compiles) are shared across database sizes;
    padding elements/rows are sentinels that never match a probe."""
    if n <= 0:
        return 1 << min_bits
    q = 1 << max(min_bits, n.bit_length() - 4)
    return -(-n // q) * q



def _bytes_for_fn(nf_pad, spf, spl, wide: bool = False):
    """Physical layout bytes for head width hd + n_over overflow rows;
    spl = lanes per slot (1 when slot-packed, 2 otherwise); wide = u64
    features (two meta lanes for the feature value)."""
    ex = 1 if wide else 0

    def row_b(c):
        return max(-(-c // 128) * 128, 128) * 4 // (2 if c <= 64 else 1)

    def bytes_for(hd, n_over):
        if hd == spf:                              # dense layout
            return nf_pad * row_b(_pad64(2 + ex + spl * spf)) + 512
        return (nf_pad * row_b(_pad64(3 + ex + spl * hd)) +
                (_quantize(n_over, 10) + 1) *
                row_b(_pad64(spl * (spf - hd))))
    return bytes_for

def _choose_gbits(total_elems: int) -> int:
    """Feature-range group count (2^gbits) for the bounded-memory
    build: target <= ~48M elements per group so per-group sort + fill
    transients stay a few hundred MB regardless of database size.
    MC_BUILD_GBITS overrides (0 = single group, the round-4 layout)."""
    import os
    env = os.environ.get("MC_BUILD_GBITS")
    if env is not None:
        try:
            return max(0, min(4, int(env)))
        except ValueError:
            pass
    g = 0
    while (total_elems >> g) > (48 << 20) and g < 4:
        g += 1
    return g


def build_device_table(f, t, w, *, cap: int = 254,
                       budget_bytes: int | None = None,
                       presorted: bool = True,
                       nch: int = 16) -> DeviceTable:
    """(feature, tgt, win) device arrays -> probe-ready DeviceTable
    (single-chunk convenience wrapper over the grouped builder)."""
    return build_device_table_chunked([(f, t, w)], cap=cap,
                                      budget_bytes=budget_bytes,
                                      presorted=presorted, nch=nch)


def build_device_table_chunked(chunks, *, cap: int = 254,
                               budget_bytes: int | None = None,
                               presorted: bool = True, nch: int = 16,
                               gbits: int | None = None) -> DeviceTable:
    """List of (feature, tgt, win) device chunk triples -> probe-ready
    DeviceTable, with transient HBM bounded to ~1/G of the stream (see
    module docstring). CONSUMES the list (chunks free as they are
    radix-placed into the group buffers).

    A handful of tiny host syncs size the static shapes (per-group
    distinct-feature counts, bucket-size histograms); everything else
    stays on device. The head width is chosen against `budget_bytes`
    like FeatureTable.choose_layout: dense (head == spf, dummy overflow
    row) when it fits, else the smallest fitting two-tier split (or the
    size-classed cells, _want_classed).

    `presorted=True` asserts the concatenated stream is ascending in
    (tgt, win) within each feature (true for any sequential build
    accumulation) — the stable per-group feature sort preserves it."""
    from ..utils.platform import hbm_budget_bytes
    if budget_bytes is None:
        budget_bytes = hbm_budget_bytes()
    if not isinstance(chunks, list):
        chunks = list(chunks)
    chunks = [c for c in chunks if int(c[0].shape[0]) > 0]
    if not chunks:           # empty stream: one all-sentinel element
        chunks = [(jnp.full((1,), SENT, jnp.uint32),
                   jnp.zeros((1,), jnp.int32),
                   jnp.zeros((1,), jnp.int32))]
    total = sum(int(c[0].shape[0]) for c in chunks)
    if gbits is None:
        gbits = _choose_gbits(total)
    G = 1 << gbits

    import os as _os
    import time as _time
    dbg = _os.environ.get("MC_BUILD_DEBUG") == "1"

    def _note(msg):
        if dbg:
            print(f"[build {_time.strftime('%H:%M:%S')}] {msg}",
                  flush=True)

    _note(f"phase1 stats: {len(chunks)} chunks, G={G}")
    # phase 1: value histogram (for quantile group boundaries) + max
    # window/target
    acc = jnp.zeros((1 << HIST_BITS) + 3, jnp.int32)
    for (cf, ct, cw) in chunks:
        acc = _chunk_stats(acc, cf, ct, cw)
    acc_h = np.asarray(acc)
    hist0 = acc_h[:1 << HIST_BITS].astype(np.int64)
    nsent = int(acc_h[(1 << HIST_BITS)])
    maxw = int(acc_h[(1 << HIST_BITS) + 1])
    maxt = int(acc_h[(1 << HIST_BITS) + 2])
    del acc
    bnds_np, counts = _group_bounds(hist0, nsent, G)
    bnds = jnp.asarray(bnds_np)
    _note(f"phase1 done: counts={counts.tolist()}")
    slot_bits = slot_pack_bits(maxw, maxt)
    V = 1 if slot_bits else 2

    # phase 2: place chunks into the (G, S) group buffers; each source
    # chunk frees right after its placement scatter
    S = _quantize(int(max(counts.max(), 1)), 14)
    _note(f"phase2 place: S={S} slot_bits={slot_bits}")
    bufF = jnp.full((G, S), SENT, jnp.uint32)
    bufV = jnp.zeros((V, G, S), jnp.int32)
    offs = jnp.zeros((G,), jnp.int32)
    nplaced = 0
    while chunks:
        cf, ct, cw = chunks.pop(0)
        bufF, bufV, offs = _place_chunk(bufF, bufV, offs, cf, ct, cw,
                                        bnds, G=G,
                                        slot_bits=slot_bits)
        del cf, ct, cw
        nplaced += 1
        if dbg and nplaced % 64 == 0:
            offs.block_until_ready()
            _note(f"placed {nplaced}")
    del offs
    _note("phase2 done")

    # phase 3: in-place per-group sorts
    nf_gs = []
    maxb = 0
    for g in range(G):
        bufF, bufV, nf_g_d, maxb_d = _sort_group(
            bufF, bufV, np.int32(g), presorted=presorted, nkeys=2)
        nf_gs.append(int(np.asarray(nf_g_d)))
        maxb = max(maxb, int(np.asarray(maxb_d)))
        _note(f"sorted group {g}: nf_g={nf_gs[-1]}")
    nf = sum(nf_gs)
    nf_offs = np.concatenate([[0], np.cumsum(nf_gs)]).astype(np.int64)
    spf = max(min(maxb, cap), 1)
    nf_pad = _quantize(nf, 12)

    # phase 4: global distinct-feature metadata + per-group histograms
    uniq = jnp.full((nf_pad,), SENT, jnp.uint32)
    sizes = jnp.zeros((nf_pad,), jnp.int32)
    hists = []
    for g in range(G):
        uniq, sizes, hist_d = _group_meta(uniq, sizes, bufF,
                                          np.int32(g),
                                          np.int32(nf_offs[g]),
                                          cap=spf, nch=nch)
        hists.append(hist_d)
    hists = [np.asarray(h)[:spf + 1] for h in hists]  # drop junk bin
    hist = np.sum(hists, axis=0)
    _note(f"meta done: nf={nf} spf={spf}; filling layouts")

    dt = _layout_and_fill(
        lambda g: (bufF, bufV), G, nf_offs, nf_gs, hists,
        sizes, uniq, nf=nf, nf_pad=nf_pad, spf=spf, hist=hist,
        slot_bits=slot_bits, maxw=maxw, budget_bytes=budget_bytes,
        nch=nch, what="table")
    return dt


def _layout_and_fill(get_mv, G, nf_offs, nf_gs, hists, sizes, uniq, *,
                     nf, nf_pad, spf, hist, slot_bits, maxw,
                     budget_bytes, nch, what, allow_dense=True,
                     brows_ready=None, bits_ready=0):
    """Shared tail of the grouped builders: choose the layout against
    the HBM budget, run the grouped fills, assemble the DeviceTable.

    u64 features: pass the host-built low-32-lane bucket index via
    ``brows_ready``/``bits_ready`` (classed layouts are 32-bit-only)."""
    wide = uniq.dtype == jnp.uint64
    bytes_for = _bytes_for_fn(nf_pad, spf, 1 if slot_bits else 2,
                              wide=wide)
    cum_over = np.cumsum(hist[::-1])[::-1]        # #buckets size >= idx
    if allow_dense and bytes_for(spf, 0) <= budget_bytes:
        head = spf                                 # dense: no overflow
    else:
        head = _choose_head(spf, cum_over, bytes_for, budget_bytes,
                            what, slot_packed=bool(slot_bits))
    dense = head == spf

    use_classed = not wide and _want_classed(head, spf, dense,
                                             slot_bits)
    if use_classed:
        cb = _classed_bytes(hist, nf_pad, spf, cum_over)
        use_classed = cb <= budget_bytes and \
            cb < bytes_for(head, int(cum_over[head + 1]))
    base_bits = min(24, max(12, int(max(nf_pad, 1)).bit_length() - 4))

    def novf_offsets(h):
        """Per-group overflow-row offsets for head width h (cumulative
        count of earlier groups' oversized buckets)."""
        per_g = [int(hg[h + 1:].sum()) for hg in hists]
        return np.concatenate([[0], np.cumsum(per_g)]).astype(np.int64)

    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(sizes)])
    num_loc = int(np.asarray(offsets[-1]))

    if use_classed:
        hC = min(CLASS_LADDER[2], spf)
        novf = int(cum_over[hC + 1]) if hC < spf else 0
        bits = _choose_bits(uniq, base_bits, span_cap=122, min_bits=18)
        nA, nB, nC = _classed_counts(hist, nf_pad)
        *_bases, total16 = _classed_total16(nA, nB, nC)
        P16 = _quantize(max(total16, 8), 10)
        headrows, ovfrows, brows, opack = _fill_layouts_classed(
            get_mv, G, nf_offs, nf_gs, novf_offsets(hC), sizes, uniq,
            novf=novf, cap=spf, bits=bits, nch=nch,
            slot_bits=slot_bits, P16=P16)
        return DeviceTable(uniq=uniq, offsets=offsets,
                           head=headrows, ovf=ovfrows, brows=brows,
                           bbits=bits, nf=nf, spf=spf, head_slots=hC,
                           num_locations=num_loc, dense=False,
                           layout_bytes=_classed_bytes(hist, nf_pad,
                                                       spf, cum_over),
                           packed=False, ovf_packed=opack,
                           max_win=maxw, slot_bits=slot_bits,
                           classed=True)

    novf = int(cum_over[head + 1]) if head < spf else 0
    bits = bits_ready if brows_ready is not None else \
        _choose_bits(uniq, base_bits)
    headrows, ovfrows, brows, pack, opack = _fill_layouts(
        get_mv, G, nf_offs, nf_gs, novf_offsets(head), sizes, uniq,
        nf_pad=nf_pad, novf=novf, cap=spf, head=head, bits=bits,
        nch=nch, dense=dense, pack_rows=_pack_auto(nf_pad),
        slot_bits=slot_bits, brows_ready=brows_ready)
    return DeviceTable(uniq=uniq, offsets=offsets,
                       head=headrows, ovf=ovfrows, brows=brows,
                       bbits=bits, nf=nf, spf=spf, head_slots=head,
                       num_locations=num_loc, dense=dense,
                       layout_bytes=bytes_for(head, novf),
                       packed=pack, ovf_packed=opack, max_win=maxw,
                       slot_bits=slot_bits)


def export_csr(dt: DeviceTable, chunk: int = 1 << 25):
    """DeviceTable -> host CSR arrays (uniq u32, offsets i64,
    locations u64 packed (tgt << 32 | win)).

    The build consumed its (feature, tgt, win) stream (fills donate), so
    the location stream is reconstructed from the probe rows: element j
    of bucket r reads head slot col(j) or overflow slot col(j) - H. The
    per-element gathers are the slow near-serial kind, but this runs
    once per `build ... ` save (reference: hash_multimap::serialize,
    src/hash_multimap.hpp:1037-1082 writes from its buckets the same
    way). Chunked so scratch stays bounded.
    """
    import jax

    assert dt.uniq.dtype != jnp.uint64, \
        "u64 tables are query-staging only (built FROM a CSR save)"
    uniq = np.asarray(dt.uniq[:dt.nf])
    offs = np.asarray(dt.offsets[:dt.nf + 1]).astype(np.int64)
    n = dt.num_locations
    hsl = dt.head_slots
    base = 2 if dt.dense else 3

    hw_lanes = dt.head.shape[1]
    ow_lanes = dt.ovf.shape[1]
    ow = dt.spf - hsl

    if getattr(dt, "classed", False):
        # classed cells: per-feature addresses are deterministic from
        # the bucket sizes (same formula as the build)
        sizes_d = dt.offsets[1:] - dt.offsets[:-1]
        addr16_f, cls_f, _ovf = _classed_addr(sizes_d, spf=dt.spf)

        def head_lane(r, lane):
            # `lane` counts from the two_tier convention (meta base 3):
            # classes A/B have no ovfid lane, so their slots shift -1
            a16 = addr16_f[r]
            isC = cls_f[r] == 2
            ln = jnp.where((lane >= 3) & ~isC, lane - 1, lane)
            return dt.head.reshape(-1)[a16 * 16 + ln]
    else:
        def head_lane(r, lane):
            hr = r >> 1 if dt.packed else r
            hc = (r & 1) * 64 + lane if dt.packed else lane
            return dt.head.reshape(-1)[hr * hw_lanes + hc]

    def ovf_lane(orow, lane):
        orr = orow >> 1 if dt.ovf_packed else orow
        oc = (orow & 1) * 64 + lane if dt.ovf_packed else lane
        return dt.ovf.reshape(-1)[orr * ow_lanes + oc]

    @functools.partial(jax.jit, static_argnames=("m",))
    def chunk_vals(j0, m):
        j = j0 + jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
        j = jnp.minimum(j, max(n - 1, 0))
        r = jnp.searchsorted(dt.offsets[1:dt.nf + 1], j,
                             side="right").astype(jnp.int32)
        col = j - dt.offsets[r]
        hcol = jnp.minimum(col, hsl - 1)
        hv = head_lane(r, base + hcol)
        hw = head_lane(r, base + hsl + hcol) \
            if not dt.slot_bits else hv
        if not dt.dense and ow > 0:
            ovfid = head_lane(r, 2)
            oc = jnp.clip(col - hsl, 0, ow - 1)
            ov = ovf_lane(ovfid, oc)
            ovw = ovf_lane(ovfid, oc + ow) if not dt.slot_bits else ov
            use_head = col < hsl
            v = jnp.where(use_head, hv, ov)
            vw = jnp.where(use_head, hw, ovw)
        else:
            v, vw = hv, hw
        if dt.slot_bits:
            tgt = jax.lax.shift_right_logical(v, jnp.int32(dt.slot_bits))
            win = v & ((1 << dt.slot_bits) - 1)
        else:
            tgt, win = v, vw
        return tgt, win

    locs = np.empty(n, np.uint64)
    for j0 in range(0, n, chunk):
        m = min(chunk, n - j0)
        mq = 1 << max(int(m - 1).bit_length(), 10)
        tgt, win = chunk_vals(jnp.int32(j0), mq)
        tgt = np.asarray(tgt)[:m].astype(np.uint64)
        win = np.asarray(win)[:m].astype(np.uint64)
        locs[j0:j0 + m] = (tgt << np.uint64(32)) | win
    return uniq, offs, locs


def device_layout_from_csr(uniq_host: np.ndarray, offsets_host,
                           ltgt: np.ndarray, lwin: np.ndarray, *,
                           cap: int = 254,
                           budget_bytes: int | None = None,
                           allow_dense: bool = True,
                           nch: int = 16,
                           gbits: int | None = None) -> DeviceTable:
    """Stage a saved/loaded CSR table as device probe rows.

    Uploads the CSR stream feature-range group by group (8 bytes/
    location slot-packed) and builds the fused-row layouts on device —
    the staged rows (up to ~8x the CSR bytes after padding) never cross
    the host->device link, and at most ONE group's stream is device-
    resident beyond the layouts themselves (each group's upload frees
    after its fills). This is how `query` stages multi-GB databases
    after load."""
    from ..utils.platform import hbm_budget_bytes
    if budget_bytes is None:
        budget_bytes = hbm_budget_bytes()
    nf = len(uniq_host)
    n = len(ltgt)
    nf_pad = _quantize(nf, 12)
    if gbits is None:
        gbits = _choose_gbits(n)
    G = 1 << gbits
    sizes_h = np.diff(offsets_host).astype(np.int64)
    maxb = int(sizes_h.max()) if nf else 1
    spf = max(min(maxb, cap), 1)
    sizes_capped = np.minimum(sizes_h, spf).astype(np.int32)
    maxw = int(lwin.max()) if n else 0
    maxt = int(ltgt.max()) if n else 0
    slot_bits = slot_pack_bits(maxw, maxt)

    wide = uniq_host.dtype == np.uint64
    brows_ready = None
    bits_ready = 0
    if wide:
        # u64 features: fused rows carry [flo, fhi, ...] meta; the
        # bucket index matches low-32 in-lane (exactness guaranteed by
        # make_bucket_index64's collision check — None means fall back
        # to the searchsorted CSR probe)
        from .probe import make_bucket_index64
        if not slot_bits:
            raise MemoryError("u64 device layout needs slot-packable "
                              "locations")
        bi = make_bucket_index64(uniq_host)
        if bi is None:
            raise MemoryError("u64 bucket index: low-32 collision "
                              "within a bucket; using CSR probe")
        brows_np, bits_ready = bi
        brows_ready = jnp.asarray(brows_np)
        fsent = np.uint64(0xFFFFFFFFFFFFFFFF)
    else:
        fsent = np.uint32(0xFFFFFFFF)

    # feature-range group boundaries: equal-ELEMENT quantile cuts over
    # the CSR (min-hash feature values skew small, so top-bit cuts
    # would be pathologically unbalanced)
    offs64 = np.asarray(offsets_host, np.int64)
    if gbits:
        targets = np.asarray([n * g // G for g in range(1, G)],
                             np.int64)
        fb = np.searchsorted(offs64[1:], targets, side="left") + 1
        lo_f = np.concatenate([[0], np.minimum(fb, nf),
                               [nf]]).astype(np.int64)
        lo_f = np.maximum.accumulate(lo_f)
    else:
        lo_f = np.asarray([0, nf], np.int64)
    nf_gs = np.diff(lo_f)
    nf_offs = lo_f
    hists = [np.bincount(sizes_capped[lo_f[g]:lo_f[g + 1]],
                         minlength=spf + 1) for g in range(G)]
    hist = np.sum(hists, axis=0) if G > 1 else hists[0]

    uniq = jnp.asarray(np.pad(uniq_host, (0, nf_pad - nf),
                              constant_values=fsent))
    sizes = jnp.asarray(np.pad(sizes_capped, (0, nf_pad - nf)))

    def get_mv(g):
        """Stage group g's stream: bool bucket-start marks + values
        (slot-packed pk, or tgt/win lanes); padded tail elements are
        singleton buckets at local r >= nf_g (dropped by the fills)."""
        e0, e1 = int(offs64[lo_f[g]]), int(offs64[lo_f[g + 1]])
        m = e1 - e0
        Sg = _quantize(max(m, 1), 14)
        start = np.ones(Sg, bool)
        start[:m] = False
        st = offs64[lo_f[g]:lo_f[g + 1]][
            sizes_h[lo_f[g]:lo_f[g + 1]] > 0] - e0
        start[st] = True
        tg = ltgt[e0:e1].astype(np.int64, copy=False)
        wg = lwin[e0:e1].astype(np.int64, copy=False)
        if slot_bits:
            pk = np.zeros(Sg, np.int32)
            pk[:m] = (tg << slot_bits) | wg
            vals = [jnp.asarray(pk)]
        else:
            t32 = np.zeros(Sg, np.int32)
            t32[:m] = tg
            w32 = np.zeros(Sg, np.int32)
            w32[:m] = wg
            vals = [jnp.asarray(t32), jnp.asarray(w32)]
        return jnp.asarray(start), vals

    return _layout_and_fill(
        get_mv, G, nf_offs, nf_gs, hists, sizes, uniq,
        nf=nf, nf_pad=nf_pad, spf=spf, hist=hist,
        slot_bits=slot_bits, maxw=maxw, budget_bytes=budget_bytes,
        nch=nch, what="layout", allow_dense=allow_dense,
        brows_ready=brows_ready, bits_ready=bits_ready)
