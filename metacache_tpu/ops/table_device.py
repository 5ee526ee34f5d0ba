"""On-device feature-table construction (RefSeq-scale builds).

The host path (ops.table.FeatureTable + fused_rows/fused_rows_two_tier)
sorts and fills rows in NumPy and ships multi-GB layouts over the
host->device link — minutes at 100M+ locations through this
environment's TPU tunnel. Here the (feature, target, window) stream
stays on the TPU from the sketch kernel onward:

  1. one stable device sort by feature (~1 s for 133M pairs)
  2. segment scans (cumsum/cummax/cummin) for bucket ids, in-bucket
     columns, bucket sizes and overflow ids — all gather-free
  3. HBM-chunked unique-destination scatters build the probe layouts in
     place (head/overflow fused rows + bucket-row index)

mirroring the reference's GPU-side bulk insert (gpu_hashmap.cu:190-230,
warpcore insert + bb_segsort) rather than its host hashmap. Two tiny
host syncs (distinct-feature count + bucket-size histogram) size the
static output shapes.

Layout parity: rows are bit-identical to ops.table.FeatureTable's
fused_rows / fused_rows_two_tier / ops.probe.make_bucket_index for the
same input stream (tests/test_table_device.py).
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


@functools.partial(jax.jit, static_argnames=("presorted",),
                   donate_argnums=(0, 1, 2))
def _stage_sort(f, t, w, presorted: bool):
    """Stable sort by feature; returns sorted triplet + (nf, maxb)."""
    if presorted:
        fs, ts, ws = jax.lax.sort((f, t, w), dimension=0, num_keys=1,
                                  is_stable=True)
    else:
        fs, ts, ws = jax.lax.sort((f, t, w), dimension=0, num_keys=3)
    newf, r, col, _ = _segments(fs)
    valid = fs != SENT           # sentinel slots sort last; dropped
    nf = jnp.sum((newf & valid).astype(jnp.int32))
    maxb = jnp.max(jnp.where(valid, col, -1)) + 1
    maxw = jnp.max(jnp.where(valid, ws, 0))
    maxt = jnp.max(jnp.where(valid, ts, 0))
    return fs, ts, ws, nf, maxb, maxw, maxt


@functools.partial(jax.jit, static_argnames=("nf", "cap", "nch"))
def _stage_sizes(fs, nf: int, cap: int, nch: int):
    """-> (sizes (nf,) capped bucket sizes, uniq (nf,) u32 features,
    hist (cap+2,) bucket-size histogram)."""
    n = fs.shape[0]
    newf, r, col, size_el = _segments(fs)
    capped = jnp.minimum(size_el, cap)
    # the sentinel bucket (padding elements + empty sketch slots) must
    # not write its size into the first padding feature row
    start_rows = jnp.where(newf & (fs != SENT), r, nf)
    zcol = jnp.zeros((n,), jnp.int32)
    sizes = _chunked_scatter(jnp.zeros((nf, 1), jnp.int32),
                             start_rows, zcol, capped, nch).reshape(nf)
    # padding feature rows (beyond the real distinct count) stay SENT so
    # they sort-order consistently and never match a probe
    uniq = _chunked_scatter(jnp.full((nf, 1), SENT, jnp.uint32),
                            start_rows, zcol, fs, nch).reshape(nf)
    hist = jnp.bincount(jnp.where(newf & (fs != SENT), capped, cap + 1),
                        length=cap + 2)
    return sizes, uniq, hist


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


@functools.partial(jax.jit, static_argnames=("kind", "colbase", "head",
                                             "cap", "nch", "nrows",
                                             "pack"),
                   donate_argnums=(0,))
def _fill_span(rows, marks, vals, *, kind: str, colbase: int,
               head: int, cap: int, nch: int, nrows: int,
               pack: bool = False):
    """One scatter pass writing `vals` into `rows` (donated: updated in
    place). kind="head": bucket columns [0, head) at colbase+col of row
    r; kind="ovf": columns [head, cap) of oversized buckets at
    colbase+(col-head) of overflow row ovfid. Each pass is its own jit
    so only ONE (rows, marks, vals) triple is resident at a time —
    RefSeq-scale fills would exceed HBM in a single fused stage.

    `pack=True`: two logical 64-lane rows share one physical 128-lane
    row (logical row r -> physical (r >> 1, (r & 1) * 64 + col)); the
    TPU's (8, 128) int32 tiling would otherwise pad 64-lane rows 2x.
    `nrows` is the LOGICAL row count (must be even when packing)."""
    newf, r, col, size_el = _marks_segments(marks)
    if kind == "head":
        rr = jnp.where(col < head, r, nrows)
        cc = colbase + col
    else:
        over_el = jnp.minimum(size_el, cap) > head
        ovfid_el = jnp.cumsum((newf & over_el).astype(jnp.int32))
        in_ovf = (col >= head) & (col < cap) & over_el
        rr = jnp.where(in_ovf, ovfid_el, nrows)
        cc = colbase + jnp.clip(col - head, 0, max(cap - head - 1, 0))
    if pack:
        rr, cc = rr >> 1, (rr & 1) * 64 + cc
    return _chunked_scatter(rows, rr, cc, vals, nch)


@functools.partial(jax.jit, static_argnames=("hw", "dense", "head",
                                             "pack"))
def _head_init(sizes, uniq, hw: int, dense: bool, head: int,
               pack: bool = False):
    """Feature-row headers: [f, count(, ovfid)] + zeroed location lanes."""
    nf = sizes.shape[0]
    fi = jax.lax.broadcasted_iota(jnp.int32, (nf,), 0)
    shape = (nf // 2, 128) if pack else (nf, hw)
    headrows = jnp.zeros(shape, jnp.int32)
    ri = fi >> 1 if pack else fi
    cb = (fi & 1) * 64 if pack else jnp.zeros((nf,), jnp.int32)
    headrows = headrows.at[ri, cb].set(
        jax.lax.bitcast_convert_type(uniq, jnp.int32))
    headrows = headrows.at[ri, cb + 1].set(sizes)
    if not dense:
        over_f = sizes > head
        ovfid_f = jnp.where(over_f,
                            jnp.cumsum(over_f.astype(jnp.int32)), 0)
        headrows = headrows.at[ri, cb + 2].set(ovfid_f)
    return headrows


@functools.partial(jax.jit, static_argnames=("wbits",),
                   donate_argnums=(0, 1))
def _pack_stream(ts, ws, wbits: int):
    """(tgt, win) location stream -> packed pk stream (donates both)."""
    return (ts << wbits) | ws


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
    if mc:
        return True
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


@functools.partial(jax.jit, static_argnames=("spf", "P", "nch"),
                   donate_argnums=(0, 1, 2))
def _classed_slot_fill(rows, marks, vals, addr16_f, cls_f,
                       spf: int, P: int, nch: int):
    """Scatter in-head slots of the feature-sorted stream into classed
    cells (slot lanes start at meta+col; class C head = 61 slots)."""
    newf, r, col, _ = _marks_segments(marks)
    a16 = addr16_f[r]
    cl = cls_f[r]
    meta = jnp.where(cl == 2, 3, 2)
    cap = jnp.where(cl == 2, min(61, spf),
                    jnp.where(cl == 1, CLASS_LADDER[1], CLASS_LADDER[0]))
    pos = a16 * 16 + meta + col
    ok = col < cap
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


def _build_rows(owned, sizes, uniq, *, nf: int, novf: int,
                cap: int, head: int, bits: int, nch: int, dense: bool,
                pack_rows: bool = True, slot_bits: int = 0):
    """Head rows, overflow rows and the bucket index via per-fill jits,
    bounding concurrent HBM residency to one fill's working set.

    `owned` is a [marks, ts, ws] list whose refs this function consumes
    (callers must not keep their own) so each array frees right after
    its last fill.

    ``slot_bits > 0``: rows store packed pk = (tgt << slot_bits) | win
    in ONE lane per slot — half the layout bytes, half the fills."""
    marks, ts, ws = owned
    owned.clear()
    base = 2 if dense else 3
    spl = 1 if slot_bits else 2        # lanes per slot
    hw = _pad64(base + spl * head)
    pack = pack_rows and hw == 64 and nf % 2 == 0
    ow = cap - head
    ocols = _pad64(spl * ow) if ow > 0 else 64
    novf_rows = novf + 2 if novf % 2 else novf + 1   # even when packing
    opack = ocols == 64 and novf_rows % 2 == 0
    if slot_bits:
        ts = _pack_stream(ts, ws, slot_bits)
        ws = None
    # overflow rows first — while the (larger) head rows don't exist
    # yet, keeping peak residency = max(head, ovf) + fill working set
    ovfrows = jnp.zeros((novf_rows // 2, 128) if opack else
                        (novf_rows, ocols), jnp.int32)
    if ow > 0 and novf > 0:
        ovfrows = _fill_span(ovfrows, marks, ts, kind="ovf", colbase=0,
                             head=head, cap=cap, nch=nch,
                             nrows=novf_rows, pack=opack)
        if not slot_bits:
            ovfrows = _fill_span(ovfrows, marks, ws, kind="ovf",
                                 colbase=ow, head=head, cap=cap,
                                 nch=nch, nrows=novf_rows, pack=opack)
    headrows = _head_init(sizes, uniq, hw=hw, dense=dense, head=head,
                          pack=pack)
    headrows = _fill_span(headrows, marks, ts, kind="head",
                          colbase=base, head=head, cap=cap, nch=nch,
                          nrows=nf, pack=pack)
    ts = None
    if not slot_bits:
        headrows = _fill_span(headrows, marks, ws, kind="head",
                              colbase=base + head, head=head, cap=cap,
                              nch=nch, nrows=nf, pack=pack)
    ws = marks = None
    brows, maxspan = _brows_build(uniq, bits=bits,
                                  nch=max(nch // 8, 1))
    return headrows, ovfrows, brows, maxspan, pack, opack


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


def _build_rows_classed(owned, sizes, uniq, *, nf: int, novf: int,
                        cap: int, bits: int, nch: int, slot_bits: int,
                        P16: int):
    """Classed unified head cells + overflow rows + classed bucket
    index (per-fill jits bound HBM residency like _build_rows)."""
    marks, ts, ws = owned
    owned.clear()
    hC = min(CLASS_LADDER[2], cap)
    ow = cap - hC
    ocols = _pad64(ow) if ow > 0 else 64
    novf_rows = novf + 2 if novf % 2 else novf + 1
    opack = ocols == 64 and novf_rows % 2 == 0
    ts = _pack_stream(ts, ws, slot_bits)
    ws = None
    P = -(-P16 // 8)
    addr16_f, cls_f, ovfid_f = _classed_addr(sizes, spf=cap)
    ovfrows = jnp.zeros((novf_rows // 2, 128) if opack else
                        (novf_rows, ocols), jnp.int32)
    if ow > 0 and novf > 0:
        ovfrows = _fill_span(ovfrows, marks, ts, kind="ovf", colbase=0,
                             head=hC, cap=cap, nch=nch,
                             nrows=novf_rows, pack=opack)
    headrows = jnp.zeros((P, 128), jnp.int32)
    headrows = _classed_meta_fill(headrows, uniq, sizes, addr16_f,
                                  cls_f, ovfid_f, P=P, nch=nch)
    headrows = _classed_slot_fill(headrows, marks, ts, addr16_f, cls_f,
                                  spf=cap, P=P, nch=nch)
    ts = marks = None
    brows, maxspan = _brows_build_classed(uniq, cls_f, bits=bits,
                                          nch=max(nch // 8, 1))
    return headrows, ovfrows, brows, maxspan, opack


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



def _bytes_for_fn(nf_pad, spf, spl):
    """Physical layout bytes for head width hd + n_over overflow rows;
    spl = lanes per slot (1 when slot-packed, 2 otherwise)."""
    def row_b(c):
        return max(-(-c // 128) * 128, 128) * 4 // (2 if c <= 64 else 1)

    def bytes_for(hd, n_over):
        if hd == spf:                              # dense layout
            return nf_pad * row_b(_pad64(2 + spl * spf)) + 512
        return (nf_pad * row_b(_pad64(3 + spl * hd)) +
                (_quantize(n_over, 10) + 1) *
                row_b(_pad64(spl * (spf - hd))))
    return bytes_for

def build_device_table(f, t, w, *, cap: int = 254,
                       budget_bytes: int | None = None,
                       presorted: bool = True,
                       nch: int = 16) -> DeviceTable:
    """(feature, tgt, win) device arrays -> probe-ready DeviceTable.

    Two tiny host syncs size the static shapes (distinct-feature count,
    bucket-size histogram); everything else stays on device. The head
    width is chosen against `budget_bytes` like
    FeatureTable.choose_layout: dense (head == spf, dummy overflow row)
    when it fits, else the smallest fitting two-tier split.

    `presorted=True` asserts the input stream is already ascending in
    (tgt, win) within each feature (true for any sequential build
    accumulation) — the stable feature sort then preserves it.
    """
    from ..utils.platform import hbm_budget_bytes
    if budget_bytes is None:
        budget_bytes = hbm_budget_bytes()
    n = f.shape[0]
    n_pad = _quantize(n, 14)
    if n_pad != n:
        import jax.numpy as _jnp
        f = _jnp.concatenate(
            [f, _jnp.full((n_pad - n,), SENT, _jnp.uint32)])
        t = _jnp.concatenate([t, _jnp.zeros((n_pad - n,), _jnp.int32)])
        w = _jnp.concatenate([w, _jnp.zeros((n_pad - n,), _jnp.int32)])
    fs, ts, ws, nf_d, maxb_d, maxw_d, maxt_d = _stage_sort(
        f, t, w, presorted)
    del f, t, w
    nf = int(np.asarray(nf_d))
    maxb = int(np.asarray(maxb_d))
    maxw = int(np.asarray(maxw_d))
    maxt = int(np.asarray(maxt_d))
    spf = max(min(maxb, cap), 1)
    nf_pad = _quantize(nf, 12)
    slot_bits = slot_pack_bits(maxw, maxt)

    sizes, uniq, hist_d = _stage_sizes(fs, nf=nf_pad, cap=spf, nch=nch)
    hist = np.asarray(hist_d)[:spf + 1]   # drop the non-start junk bin

    bytes_for = _bytes_for_fn(nf_pad, spf, 1 if slot_bits else 2)

    cum_over = np.cumsum(hist[::-1])[::-1]        # #buckets size >= idx
    if bytes_for(spf, 0) <= budget_bytes:
        head = spf                                 # dense: no overflow
    else:
        head = _choose_head(spf, cum_over, bytes_for, budget_bytes,
                            "table", slot_packed=bool(slot_bits))
    dense = head == spf

    use_classed = _want_classed(head, spf, dense, slot_bits)
    if use_classed:
        cb = _classed_bytes(hist, nf_pad, spf, cum_over)
        use_classed = cb <= budget_bytes and \
            cb < bytes_for(head, int(cum_over[head + 1]))
    base_bits = min(24, max(12, int(max(nf_pad, 1)).bit_length() - 4))
    offsets_src = sizes
    if use_classed:
        hC = min(CLASS_LADDER[2], spf)
        novf = int(cum_over[hC + 1]) if hC < spf else 0
        novf_pad = _quantize(novf, 10) if novf else 0
        bits = _choose_bits(uniq, base_bits, span_cap=122, min_bits=18)
        nA, nB, nC = _classed_counts(hist, nf_pad)
        *_bases, total16 = _classed_total16(nA, nB, nC)
        P16 = _quantize(max(total16, 8), 10)
        owned = [fs, ts, ws]
        del fs, ts, ws
        headrows, ovfrows, brows, maxspan_d, opack = _build_rows_classed(
            owned, sizes, uniq, nf=nf_pad, novf=novf_pad, cap=spf,
            bits=bits, nch=nch, slot_bits=slot_bits, P16=P16)
        del maxspan_d
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(offsets_src)])
        num_loc = int(np.asarray(offsets[-1]))
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
    novf_pad = _quantize(novf, 10) if novf else 0
    bits = _choose_bits(uniq, base_bits)
    owned = [fs, ts, ws]
    del fs, ts, ws
    headrows, ovfrows, brows, maxspan_d, pack, opack = _build_rows(
        owned, sizes, uniq, nf=nf_pad, novf=novf_pad, cap=spf,
        head=head, bits=bits, nch=nch, dense=dense,
        pack_rows=_pack_auto(nf_pad), slot_bits=slot_bits)
    del maxspan_d
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(sizes)])
    num_loc = int(np.asarray(offsets[-1]))
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
                           nch: int = 16) -> DeviceTable:
    """Stage a saved/loaded CSR table as device probe rows.

    Uploads only the CSR stream (12 bytes/location) and builds the
    fused-row layouts on device — the staged rows (up to ~8x the CSR
    bytes after padding) never cross the host->device link. This is how
    `query` stages multi-GB databases after load.
    """
    from ..utils.platform import hbm_budget_bytes
    if budget_bytes is None:
        budget_bytes = hbm_budget_bytes()
    nf = len(uniq_host)
    n = len(ltgt)
    nf_pad = _quantize(nf, 12)
    n_pad = _quantize(n, 14)
    sizes_h = np.diff(offsets_host).astype(np.int32)
    maxb = int(sizes_h.max()) if nf else 1
    spf = max(min(maxb, cap), 1)
    sizes_capped = np.minimum(sizes_h, spf).astype(np.int32)
    maxw = int(lwin.max()) if n else 0
    maxt = int(ltgt.max()) if n else 0
    slot_bits = slot_pack_bits(maxw, maxt)

    bytes_for = _bytes_for_fn(nf_pad, spf, 1 if slot_bits else 2)

    hist = np.bincount(sizes_capped, minlength=spf + 1)
    cum_over = np.cumsum(hist[::-1])[::-1]
    if allow_dense and bytes_for(spf, 0) <= budget_bytes:
        head = spf
    else:
        head = _choose_head(spf, cum_over, bytes_for, budget_bytes,
                            "layout", slot_packed=bool(slot_bits))
    novf = int(cum_over[head + 1]) if head < spf else 0
    novf_pad = _quantize(novf, 10) if novf else 0
    dense = head == spf

    use_classed = _want_classed(head, spf, dense, slot_bits)
    if use_classed:
        cb = _classed_bytes(hist, nf_pad, spf, cum_over)
        use_classed = cb <= budget_bytes and cb < bytes_for(head, novf)

    import jax.numpy as jnp
    # pad stream: extra elements are singleton buckets landing in the
    # sentinel feature rows (harmless; see build_device_table)
    start = np.ones(max(n_pad, 1), bool)
    start[:n] = False
    start[offsets_host[:-1][sizes_h > 0]] = True
    uniq = jnp.asarray(np.pad(uniq_host, (0, nf_pad - nf),
                              constant_values=0xFFFFFFFF))
    sizes = jnp.asarray(np.pad(sizes_capped, (0, nf_pad - nf)))
    ltgt32 = np.zeros(n_pad, np.int32)
    ltgt32[:n] = ltgt
    lwin32 = np.zeros(n_pad, np.int32)
    lwin32[:n] = lwin
    base_bits = min(24, max(12, int(max(nf_pad, 1)).bit_length() - 4))
    owned = [jnp.asarray(start), jnp.asarray(ltgt32),
             jnp.asarray(lwin32)]
    del start, ltgt32, lwin32
    offsets = jnp.asarray(np.concatenate(
        [[0], np.cumsum(sizes_capped),
         np.full(nf_pad - nf, sizes_capped.sum())]).astype(np.int32))
    if use_classed:
        hC = min(CLASS_LADDER[2], spf)
        novf = int(cum_over[hC + 1]) if hC < spf else 0
        novf_pad = _quantize(novf, 10) if novf else 0
        bits = _choose_bits(uniq, base_bits, span_cap=122, min_bits=18)
        nA, nB, nC = _classed_counts(hist, nf_pad)
        *_bases, total16 = _classed_total16(nA, nB, nC)
        P16 = _quantize(max(total16, 8), 10)
        headrows, ovfrows, brows, maxspan_d, opack = _build_rows_classed(
            owned, sizes, uniq, nf=nf_pad, novf=novf_pad, cap=spf,
            bits=bits, nch=nch, slot_bits=slot_bits, P16=P16)
        del maxspan_d
        return DeviceTable(uniq=uniq, offsets=offsets, head=headrows,
                           ovf=ovfrows, brows=brows, bbits=bits, nf=nf,
                           spf=spf, head_slots=hC,
                           num_locations=int(sizes_capped.sum()),
                           dense=False,
                           layout_bytes=_classed_bytes(hist, nf_pad,
                                                       spf, cum_over),
                           packed=False, ovf_packed=opack,
                           max_win=maxw, slot_bits=slot_bits,
                           classed=True)
    bits = _choose_bits(uniq, base_bits)
    headrows, ovfrows, brows, maxspan_d, pack, opack = _build_rows(
        owned, sizes, uniq, nf=nf_pad, novf=novf_pad, cap=spf,
        head=head, bits=bits, nch=nch, dense=dense,
        pack_rows=_pack_auto(nf_pad), slot_bits=slot_bits)
    del maxspan_d
    return DeviceTable(uniq=uniq, offsets=offsets, head=headrows,
                       ovf=ovfrows, brows=brows, bbits=bits, nf=nf,
                       spf=spf, head_slots=head,
                       num_locations=int(sizes_capped.sum()),
                       dense=dense, layout_bytes=bytes_for(head, novf),
                       packed=pack, ovf_packed=opack, max_win=maxw,
                       slot_bits=slot_bits)
