"""Pallas TPU kernel: fused per-row candidate generation.

One VMEM-resident pass replaces the XLA chain
  lax.sort (bitonic over HBM) -> walk-sweep shifts -> packed-key
  suffix cummax -> top-k extraction
of ops.rows.rows_to_result's walk + fast_top2 path. XLA's row sort
round-trips HBM on every bitonic stage (measured ~10 GB/s effective at
L=4064 — ~40 passes over the slot matrix), while this kernel keeps each
row tile in VMEM for the whole sort network, the sweep and the scans;
HBM traffic drops to one read of the slots plus a (rows, 128) result.

Counterpart of the reference GPU's per-query match sorting + candidate
sweep (bb_segsort + for_all_contiguous_window_ranges,
src/gpu_result_processing.cuh:99-155); the algorithm mirrors
ops.rows.rows_to_result exactly (same tie-breaking) and is parity-tested
against it in tests/test_candidates_pallas.py.

Top-k selection needs NO segmented scan at all: a target group's
representative key is its in-group max, so the global row max of the
per-lane key (hits * l2 + (l2-1-col), always i32) is the best group's
representative; masking the winner's whole target group between picks
reproduces rows.py's group ordering and tie-breaking exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32_MAX = np.int32(2**31 - 1)


def _roll(x, shift, l):
    s = shift % l
    if jax.config.jax_enable_x64:
        # under x64 the python-int shift lowers to an i64 constant,
        # which tpu.dynamic_rotate rejects — pin i32 (k>16 u64 DBs
        # enable x64 process-wide)
        s = jnp.int32(s)
    return pltpu.roll(x, s, 1)


def _sort2_lanes(t, w, presorted: int = 0):
    """Ascending bitonic sort of each row's lanes by (t, w) lexicographic
    (both i32; padding (I32_MAX, I32_MAX) ends up last).

    ``presorted=r`` (power of two) asserts the input arrives as r-lane
    blocks already sorted in ALTERNATING directions (even block index
    ascending, odd descending — the bitonic invariant after phase r), so
    the network starts at phase 2r: probe slots are emitted this way
    per feature bucket, skipping log2(r)*(log2(r)+1)/2 of the
    compare-exchange stages (36 of 78 at L=4096, r=256)."""
    n, l = t.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, l), 1)
    k = 2 * presorted if presorted else 2
    while k <= l:
        j = k // 2
        while j >= 1:
            pt_u, pw_u = _roll(t, -j, l), _roll(w, -j, l)
            pt_d, pw_d = _roll(t, j, l), _roll(w, j, l)
            has_bit = (lane & j) != 0
            pt = jnp.where(has_bit, pt_d, pt_u)
            pw = jnp.where(has_bit, pw_d, pw_u)
            ascending = (lane & k) == 0
            keep_min = ascending ^ has_bit
            le = (t < pt) | ((t == pt) & (w <= pw))
            lo_t = jnp.where(le, t, pt)
            lo_w = jnp.where(le, w, pw)
            hi_t = jnp.where(le, pt, t)
            hi_w = jnp.where(le, pw, w)
            t = jnp.where(keep_min, lo_t, hi_t)
            w = jnp.where(keep_min, lo_w, hi_w)
            j //= 2
        k *= 2
    return t, w


def _sort1_lanes(p, presorted: int = 0):
    """Ascending bitonic sort of each row's lanes by a single i32 key
    (padding I32_MAX ends up last). Half the rolls/selects of
    _sort2_lanes — used with the packed (tgt << wbits | win) slot
    encoding, whose order equals the (tgt, win) lexicographic order."""
    n, l = p.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, l), 1)
    k = 2 * presorted if presorted else 2
    while k <= l:
        j = k // 2
        while j >= 1:
            pu = _roll(p, -j, l)
            pd = _roll(p, j, l)
            pp = jnp.where((lane & j) != 0, pd, pu)
            keep_min = ((lane & k) == 0) ^ ((lane & j) != 0)
            p = jnp.where(keep_min, jnp.minimum(p, pp),
                          jnp.maximum(p, pp))
            j //= 2
        k *= 2
    return p


def _compact_runs_packed(p, lane, l):
    """Left-compact distinct packed-key runs of each sorted row,
    returning (p, cnt) with vacated lanes (I32_MAX, 0). Single-key
    variant of _compact_runs."""
    n, _ = p.shape
    start = (lane == 0) | (p != _roll(p, 1, l))
    s_pos = jnp.where(start, lane, l)
    nxt = s_pos
    d = 1
    while d < l:
        vn = _roll(nxt, -d, l)
        nxt = jnp.minimum(nxt, jnp.where(lane < l - d, vn, l))
        d *= 2
    nxt = jnp.where(lane < l - 1, _roll(nxt, -1, l), l)  # exclusive
    cnt = jnp.where(start, nxt - lane, 0)
    pc = start.astype(jnp.int32)
    d = 1
    while d < l:
        pc = pc + jnp.where(lane >= d, _roll(pc, d, l), 0)
        d *= 2
    shift = jnp.where(start, lane - (pc - 1), 0)
    vp = jnp.where(start, p, I32_MAX)
    vc = cnt
    b = 1
    while b < l:
        sr = _roll(shift, -b, l)
        arrive = (sr & b) != 0
        depart = (shift & b) != 0
        vp = jnp.where(arrive, _roll(vp, -b, l),
                       jnp.where(depart, I32_MAX, vp))
        vc = jnp.where(arrive, _roll(vc, -b, l),
                       jnp.where(depart, 0, vc))
        shift = jnp.where(arrive, sr, jnp.where(depart, 0, shift))
        b *= 2
    return vp, vc


def _compact_runs(t, w, lane, l):
    """Left-compact distinct (t, w) runs of each sorted row, returning
    (t, w, cnt) with vacated lanes (I32_MAX, I32_MAX, 0).

    Same bit-decomposed move scheme as the sketch kernel's
    _compact_unique: each run start at lane i moves left by the number
    of non-start lanes before i; destinations are strictly increasing,
    so moving one shift-bit at a time never collides."""
    n, _ = t.shape
    prev_t = _roll(t, 1, l)
    prev_w = _roll(w, 1, l)
    start = (lane == 0) | (t != prev_t) | (w != prev_w)
    # run length = next start - my lane (valid at starts): suffix min
    s_pos = jnp.where(start, lane, l)
    nxt = s_pos
    d = 1
    while d < l:
        vn = _roll(nxt, -d, l)
        nxt = jnp.minimum(nxt, jnp.where(lane < l - d, vn, l))
        d *= 2
    nxt = jnp.where(lane < l - 1, _roll(nxt, -1, l), l)  # exclusive
    cnt = jnp.where(start, nxt - lane, 0)
    # inclusive prefix count of starts -> destination lane
    pc = start.astype(jnp.int32)
    d = 1
    while d < l:
        pc = pc + jnp.where(lane >= d, _roll(pc, d, l), 0)
        d *= 2
    shift = jnp.where(start, lane - (pc - 1), 0)
    vt = jnp.where(start, t, I32_MAX)
    vw = jnp.where(start, w, I32_MAX)
    vc = cnt
    b = 1
    while b < l:
        sr = _roll(shift, -b, l)
        arrive = (sr & b) != 0
        depart = (shift & b) != 0
        vt = jnp.where(arrive, _roll(vt, -b, l),
                       jnp.where(depart, I32_MAX, vt))
        vw = jnp.where(arrive, _roll(vw, -b, l),
                       jnp.where(depart, I32_MAX, vw))
        vc = jnp.where(arrive, _roll(vc, -b, l),
                       jnp.where(depart, 0, vc))
        shift = jnp.where(arrive, sr, jnp.where(depart, 0, shift))
        b *= 2
    return vt, vw, vc


def _candidates_kernel(t_ref, w_ref, mwir_ref, out_ref, *,
                       walk_elems, kk, l2, dedup_walk=0, presorted=0):
    t = t_ref[:]
    w = w_ref[:]
    n, l = t.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, l), 1)
    mwir = mwir_ref[:]                                # (n, 1)

    t, w = _sort2_lanes(t, w, presorted)

    if dedup_walk:
        # long-read path: compact duplicate (t, w) runs, then sweep at
        # most max(mwir) DISTINCT entries per range (rows.py dedup path)
        t, w, cnt = _compact_runs(t, w, lane, l)
        is_match = t != I32_MAX
        w_lo = w - (mwir - 1)
        hits = jnp.where(is_match, cnt, 0)
        beg = w
        for e in range(1, dedup_walk):
            te = _roll(t, e, l)
            we = _roll(w, e, l)
            ce = _roll(cnt, e, l)
            ok = (lane >= e) & is_match & (te == t) & (we >= w_lo)
            hits = hits + jnp.where(ok, ce, 0)
            beg = jnp.where(ok, we, beg)
    else:
        is_match = t != I32_MAX
        # walk sweep: hits + carried begin window (rows.py walk path)
        w_lo = w - (mwir - 1)
        hits = jnp.ones((n, l), jnp.int32)
        beg = w
        for e in range(1, walk_elems):
            te = _roll(t, e, l)
            we = _roll(w, e, l)
            ok = (lane >= e) & (te == t) & (we >= w_lo)
            hits = hits + ok.astype(jnp.int32)
            beg = jnp.where(ok, we, beg)  # last ok shift = smallest win

    # top-k target groups by (hits desc, earliest best slot). A group's
    # representative key is its in-group MAX, so the global row max of
    # the per-lane key IS the best group's representative — no group-id
    # prefix sum or segmented suffix scan needed (the segmented scan
    # measured ~40% of the whole kernel at L=4096). After each pick the
    # winner's ENTIRE target group is masked, which is exactly the old
    # remove-the-representative semantics.
    key = hits * l2 + (l2 - 1 - lane)
    v = jnp.where(is_match, key, -1)
    shift = int(l2).bit_length() - 1
    cols = []
    for _ in range(kk):
        best = jnp.max(v, axis=1, keepdims=True)         # (n, 1)
        ok = best > 0
        bestcol = jnp.where(ok, (l2 - 1) - (best & (l2 - 1)), 0)
        sel = lane == bestcol
        pick = lambda x, d_: jnp.where(
            ok[:, 0], jnp.max(jnp.where(sel, x, jnp.int32(-2**31)),
                              axis=1), d_)
        tbest = pick(t, -1)
        cols.append(jnp.stack([
            tbest,
            jnp.where(ok[:, 0], best[:, 0] >> shift, 0),
            pick(beg, 0),
            pick(w, 0),
        ], axis=1))
        v = jnp.where(t == tbest[:, None], -1, v)

    res = jnp.concatenate(cols, axis=1)                  # (n, 4*kk)
    pad = out_ref.shape[1] - res.shape[1]
    out_ref[:] = jnp.concatenate(
        [res, jnp.zeros((n, pad), jnp.int32)], axis=1)


@functools.partial(jax.jit, static_argnames=("walk_elems",
                                             "max_candidates", "tile",
                                             "dedup_walk", "presorted"))
def candidates_pallas(tgt: jax.Array, win: jax.Array, mwir: jax.Array,
                      walk_elems: int = 0, max_candidates: int = 2,
                      tile: int = 0, dedup_walk: int = 0,
                      presorted: int = 0):
    """(B, L) unsorted match slots -> per-row top-k candidates.

    Returns (cand_tgt, cand_hits, cand_beg, cand_end), each (B, K) i32;
    cand_tgt == -1 marks empty slots. L is padded to a power of two
    internally (extra lanes hold the (I32_MAX, I32_MAX) padding the
    sort sends last).
    """
    b, l = tgt.shape
    kk = max_candidates
    l2 = 1 << max(int(l - 1).bit_length(), 7)
    if l2 != l:
        padc = jnp.full((b, l2 - l), I32_MAX, jnp.int32)
        tgt = jnp.concatenate([tgt, padc], axis=1)
        win = jnp.concatenate([win, padc], axis=1)
    if tile <= 0:
        # keep the working set (~10 live arrays of (tile, l2) i32 plus
        # Mosaic roll temporaries) well under the 16 MB VMEM scope:
        # tile * l2 * 4B <= 256 KB => total stack ~5-8 MB
        tile = max(8, min(256, (1 << 18) // (l2 * 4)))
    while b % tile:
        tile //= 2
    grid = (b // tile,)
    import contextlib
    ctx = pltpu.force_tpu_interpret_mode() \
        if jax.default_backend() == "cpu" else contextlib.nullcontext()
    x32 = jax.enable_x64(False) if jax.config.jax_enable_x64 \
        else contextlib.nullcontext()
    if presorted:
        assert l % presorted == 0 and l == l2, \
            "presorted runs must tile the padded row exactly"
    with ctx, x32:
        out = _call(tgt, win, mwir, walk_elems, kk, l2, tile, grid, b,
                    dedup_walk, presorted)
    k4 = 4 * kk
    res = out[:, :k4].reshape(b, kk, 4)
    return res[:, :, 0], res[:, :, 1], res[:, :, 2], res[:, :, 3]


def _packed_kernel(p_ref, mwir_ref, out_ref, *, walk_elems, kk, l2,
                   wbits, dedup_walk=0, presorted=0):
    """Packed-slot variant: one i32 key pk = (tgt << wbits) | win.

    The caller guarantees 2^wbits > 2 * maxwin (and clamps mwir to
    maxwin + 1, which is semantically identity), so the sweep's
    same-target + window-range test collapses to ONE compare:
    pe >= pk - (mwir - 1) — a previous-target slot can never reach that
    bound because the inter-target gap 2^wbits - maxwin exceeds any
    clamped mwir. Half the sort traffic and ~half the sweep ops of the
    two-array kernel."""
    p = p_ref[:]
    n, l = p.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, l), 1)
    mwir = mwir_ref[:]                                # (n, 1)

    p = _sort1_lanes(p, presorted)

    if dedup_walk:
        p, cnt = _compact_runs_packed(p, lane, l)
        is_match = p != I32_MAX
        lo_p = p - (mwir - 1)
        hits = jnp.where(is_match, cnt, 0)
        beg = p
        for e in range(1, dedup_walk):
            pe = _roll(p, e, l)
            ce = _roll(cnt, e, l)
            ok = (lane >= e) & is_match & (pe >= lo_p)
            hits = hits + jnp.where(ok, ce, 0)
            beg = jnp.where(ok, pe, beg)
    else:
        is_match = p != I32_MAX
        lo_p = p - (mwir - 1)
        hits = jnp.ones((n, l), jnp.int32)
        beg = p
        for e in range(1, walk_elems):
            pe = _roll(p, e, l)
            ok = (lane >= e) & (pe >= lo_p)
            hits = hits + ok.astype(jnp.int32)
            beg = jnp.where(ok, pe, beg)  # last ok shift = smallest win

    # top-k target groups by (hits desc, earliest best slot): global
    # row max of the per-lane key == best group's representative (a
    # group's rep was its in-group max); mask the winner's whole target
    # group after each pick. Replaces the group-id prefix sum + the
    # segmented suffix max, which measured ~40% of the kernel at L=4096.
    key = hits * l2 + (l2 - 1 - lane)
    v = jnp.where(is_match, key, -1)
    tq = jax.lax.shift_right_logical(p, jnp.int32(wbits))
    shift = int(l2).bit_length() - 1
    wmask = (1 << wbits) - 1
    cols = []
    for _ in range(kk):
        best = jnp.max(v, axis=1, keepdims=True)         # (n, 1)
        ok = best > 0
        bestcol = jnp.where(ok, (l2 - 1) - (best & (l2 - 1)), 0)
        sel = lane == bestcol
        pick = lambda x: jnp.max(
            jnp.where(sel, x, jnp.int32(-2**31)), axis=1)
        # ONE pick of p yields both tgt (high bits) and end window (low
        # bits) — 2 reductions per round instead of 4
        pbest = pick(p)
        tbest = jnp.where(ok[:, 0],
                          jax.lax.shift_right_logical(pbest,
                                      jnp.int32(wbits)),
                          -1)
        cols.append(jnp.stack([
            tbest,
            jnp.where(ok[:, 0], best[:, 0] >> shift, 0),
            jnp.where(ok[:, 0], pick(beg) & wmask, 0),
            jnp.where(ok[:, 0], pbest & wmask, 0),
        ], axis=1))
        # mask the winner's whole target group
        v = jnp.where(tq == tbest[:, None], -1, v)

    res = jnp.concatenate(cols, axis=1)                  # (n, 4*kk)
    pad = out_ref.shape[1] - res.shape[1]
    out_ref[:] = jnp.concatenate(
        [res, jnp.zeros((n, pad), jnp.int32)], axis=1)


def _sort_kernel(p_ref, out_ref, *, presorted):
    """Standalone lane sort (split pipeline stage 1): with only 2 live
    row arrays the VMEM scope admits a 4-8x larger row tile than the
    fused kernel, which measured 21% faster on the sort portion."""
    out_ref[:] = _sort1_lanes(p_ref[:], presorted)


@functools.partial(jax.jit, static_argnames=("tile", "presorted"))
def sort_pallas_packed(pk: jax.Array, tile: int = 0,
                       presorted: int = 0) -> jax.Array:
    """(B, L2) packed slots -> lane-sorted rows (Pallas, own tile)."""
    import os
    b, l2 = pk.shape
    if tile <= 0:
        try:
            budget = int(os.environ.get("MC_SORT_TILE_B", 1 << 20))
        except ValueError:
            budget = 1 << 20
        tile = max(8, min(256, budget // (l2 * 4)))
    while b % tile:
        tile //= 2
    import contextlib
    ctx = pltpu.force_tpu_interpret_mode() \
        if jax.default_backend() == "cpu" else contextlib.nullcontext()
    x32 = jax.enable_x64(False) if jax.config.jax_enable_x64 \
        else contextlib.nullcontext()
    with ctx, x32:
        return pl.pallas_call(
            functools.partial(_sort_kernel, presorted=presorted),
            out_shape=jax.ShapeDtypeStruct((b, l2), jnp.int32),
            grid=(b // tile,),
            in_specs=[pl.BlockSpec((tile, l2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, l2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(pk)


@functools.partial(jax.jit, static_argnames=("walk_elems", "pack_bits",
                                             "max_candidates", "tile",
                                             "dedup_walk", "presorted",
                                             "split"))
def candidates_pallas_packed(pk: jax.Array, mwir: jax.Array,
                             pack_bits: int,
                             walk_elems: int = 0,
                             max_candidates: int = 2,
                             tile: int = 0, dedup_walk: int = 0,
                             presorted: int = 0, split: bool = False):
    """(B, L) packed match slots pk = (tgt << pack_bits) | win ->
    per-row top-k candidates (cand_tgt, cand_hits, cand_beg, cand_end).

    Caller contract: 2^pack_bits > 2 * max_window AND mwir clamped to
    max_window + 1; padding slots hold I32_MAX.

    ``split=True``: run the lane sort as its OWN pallas_call at a
    larger row tile (fewer live VMEM arrays), then the sweep+top-k
    kernel with the sort skipped — one extra HBM round-trip of the slot
    matrix buys the sort stage a better tile (MC_SPLIT_CAND knob).
    """
    b, l = pk.shape
    kk = max_candidates
    l2 = 1 << max(int(l - 1).bit_length(), 7)
    if l2 != l:
        pk = jnp.concatenate(
            [pk, jnp.full((b, l2 - l), I32_MAX, jnp.int32)], axis=1)
    if tile <= 0:
        tile = max(8, min(256, (1 << 18) // (l2 * 4)))
    while b % tile:
        tile //= 2
    grid = (b // tile,)
    import contextlib
    ctx = pltpu.force_tpu_interpret_mode() \
        if jax.default_backend() == "cpu" else contextlib.nullcontext()
    # the kernel is a pure-i32 program: trace it with x64 semantics off
    # (k>16 u64 DBs enable x64 process-wide, which makes in-kernel weak
    # literals i64 and breaks the Mosaic lowering)
    x32 = jax.enable_x64(False) if jax.config.jax_enable_x64 \
        else contextlib.nullcontext()
    if presorted:
        assert l % presorted == 0 and l == l2, \
            "presorted runs must tile the padded row exactly"
    if split:
        pk = sort_pallas_packed(pk, presorted=presorted)
        presorted = l2     # phase start 2*l2 > l2: sort becomes a no-op
    with ctx, x32:
        out = pl.pallas_call(
            functools.partial(_packed_kernel, walk_elems=walk_elems,
                              kk=kk, l2=l2, wbits=pack_bits,
                              dedup_walk=dedup_walk,
                              presorted=presorted),
            out_shape=jax.ShapeDtypeStruct((b, 128), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, l2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(pk, mwir.reshape(b, 1))
    k4 = 4 * kk
    res = out[:, :k4].reshape(b, kk, 4)
    return res[:, :, 0], res[:, :, 1], res[:, :, 2], res[:, :, 3]


def _call(tgt, win, mwir, walk_elems, kk, l2, tile, grid, b,
          dedup_walk=0, presorted=0):
    return pl.pallas_call(
        functools.partial(_candidates_kernel, walk_elems=walk_elems,
                          kk=kk, l2=l2, dedup_walk=dedup_walk,
                          presorted=presorted),
        out_shape=jax.ShapeDtypeStruct((b, 128), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, l2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, l2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(tgt, win, mwir.reshape(b, 1))
