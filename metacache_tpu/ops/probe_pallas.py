"""Pallas probe-decode kernels (deep-bucket hot path).

The two-tier probe is three XLA row gathers (bucket index, head rows,
overflow rows) each followed by decode compute: half-select of
pair-packed rows, feature match, in-bucket rank, count masking and the
alternating-run reversal. Measured on chip (tools/profile_deep_decomp):
the decode costs MORE than the gathers themselves — XLA lowers the odd
61/63-lane slices as lane-rotate relayouts, several full passes over
33-134 MB intermediates per batch:

    bucket probe   2.10 ms = 1.13 gather + 0.97 decode
    head probe     2.75 ms = 1.29 gather + 1.46 decode
    full probe     6.43 ms = ~2.6 gathers + ~3.8 decode

These kernels replace each decode with ONE VMEM pass over the gathered
rows (mask instead of slice, so no relayouts). The gathers stay XLA
ops — a per-row DMA from Pallas cannot beat XLA's batched gather.

Parity contracts (bit-exact vs the XLA decode in ops.rows/ops.probe):
  bucket_decode   == probe_bucket's post-gather math (128-wide packed)
  head_decode     == probe_rows_head's two-tier slot-packed branch
  full_decode     == probe_rows' two-tier slot-packed branch (u32)

Reference analog: the single-kernel probe chain of the GPU hashmap
(/root/reference/src/gpu_hashmap_operations.cuh:841-1043) — one warp
probes, verifies and emits sorted locations without round-tripping
through global memory; here one Pallas pass decodes what XLA gathered.
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32_MAX = 2**31 - 1     # python int: a jnp scalar would be
                        # captured as a kernel constant


def probe_pallas_enabled(stage: str = "full") -> bool:
    """Per-stage kernel gate. MC_PROBE_PALLAS: 0 = never, 1 = all
    stages (interpret on CPU), or a comma list of stage names
    ("bucket,head,full"). Unset = device-backend default: head+full on,
    bucket OFF — the chip A/B (tools/profile_probe_ab.py) measured the
    bucket kernel as a net loss in composed steps (~+0.6 ms/batch; its
    (T,128) row load cannot overlap the next scan iteration's gather
    the way the XLA decode does) while full_decode wins −0.95 ms on the
    redo step and head_decode −0.26 on the head probe. The CPU golden
    lane keeps the XLA decode; parity tests cover the kernels."""
    import os
    v = os.environ.get("MC_PROBE_PALLAS", "")
    if v == "0":
        return False
    if v == "1":
        return True
    if v:
        return stage in {s.strip() for s in v.split(",")}
    return jax.default_backend() != "cpu" and stage in ("head", "full")


def _roll(x, shift, l):
    # pltpu.roll wants a non-negative i32 shift; negatives wrap
    s = shift % l
    if jax.config.jax_enable_x64:
        s = jnp.int32(s)
    return pltpu.roll(x, s, 1)


def _odd_rows(t, rl, f):
    """Mask of probe rows with an ODD feature index (rows are
    feature-major within a query; fidx = global_row % f, and the tile
    height is a multiple of 2f so tile-local row parity matches)."""
    rid = jax.lax.broadcasted_iota(jnp.int32, (t, rl), 0)
    if f % 2 == 0:
        return (rid & 1) == 1
    return ((rid % f) & 1) == 1


def _ctx():
    ctx = pltpu.force_tpu_interpret_mode() \
        if jax.default_backend() == "cpu" else contextlib.nullcontext()
    x32 = jax.enable_x64(False) if jax.config.jax_enable_x64 \
        else contextlib.nullcontext()
    return ctx, x32


def _rev_lanes(x, l: int):
    """Reverse the minor (lane) dimension (l = power-of-two width).

    Mosaic has no `rev` lowering; exchange lanes bit by bit instead —
    after swapping across every index bit, each lane holds the value
    from lane ^ (l-1) = l-1-lane. log2(l) roll-pairs."""
    assert x.shape[1] == l and l & (l - 1) == 0
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < l:
        from_below = _roll(x, s, l)      # value from lane - s
        from_above = _roll(x, -s, l)     # value from lane + s
        x = jnp.where((lane & s) != 0, from_below, from_above)
        s *= 2
    return x


def _half_select(row2, par):
    """(T, 128) pair-packed physical rows -> (T, 64) logical half."""
    return jnp.where(par == 1, row2[:, 64:], row2[:, :64])


def _bucket_kernel(row2_ref, par_ref, f32_ref, sent_ref, idx_ref,
                   fnd_ref):
    row2 = row2_ref[:]                       # (T, 128)
    par = par_ref[:]                         # (T, 1)
    f32 = f32_ref[:]                         # (T, 1)
    sent = sent_ref[:]                       # (T, 1) bool as i32
    t = row2.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
    inhalf = (lane >> 6) == (par & 1)
    l6 = lane & 63
    start = jnp.sum(jnp.where(inhalf & (l6 == 0), row2, 0), axis=1,
                    keepdims=True)
    match = inhalf & (l6 >= 1) & (row2 == f32)
    local = jnp.sum(jnp.where(match, l6 - 1, 0), axis=1,
                    keepdims=True)
    any_m = jnp.max(match.astype(jnp.int32), axis=1, keepdims=True)
    idx_ref[:] = start + local
    fnd_ref[:] = any_m * (1 - sent)


@functools.partial(jax.jit, static_argnames=("tile",))
def _bucket_call(row2, par, f32, sent, tile):
    n = row2.shape[0]
    grid = (n // tile,)
    spec1 = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _bucket_kernel,
        out_shape=(jax.ShapeDtypeStruct((n, 1), jnp.int32),
                   jax.ShapeDtypeStruct((n, 1), jnp.int32)),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  spec1, spec1, spec1],
        out_specs=(spec1, spec1),
    )(row2, par, f32, sent)
    return out


def bucket_decode(row2: jax.Array, par: jax.Array, flat: jax.Array,
                  tile: int = 512):
    """Bucket-index decode: gathered physical rows -> feature row ids.

    row2: (N, 128) i32 = brows[h >> 1]; par: (N,) i32 = h & 1;
    flat: (N,) u32 features. Returns (idx (N,) i32, found (N,) bool),
    bit-identical to ops.probe.probe_bucket's post-gather math.
    """
    n = row2.shape[0]
    f32 = jax.lax.bitcast_convert_type(flat, jnp.int32)
    sent = (flat == jnp.uint32(0xFFFFFFFF)).astype(jnp.int32)
    pad = (-n) % tile
    if pad:
        row2 = jnp.pad(row2, ((0, pad), (0, 0)))
        par = jnp.pad(par, (0, pad))
        f32 = jnp.pad(f32, (0, pad))
        sent = jnp.pad(sent, (0, pad), constant_values=1)
    ctx, x32 = _ctx()
    with ctx, x32:
        idx, fnd = _bucket_call(row2, par.reshape(-1, 1),
                                f32.reshape(-1, 1),
                                sent.reshape(-1, 1), tile)
    return idx[:n, 0], fnd[:n, 0] != 0


def _oidx_kernel(row2_ref, par_ref, f32_ref, oidx_ref):
    row2 = row2_ref[:]                       # (T, 128)
    par = par_ref[:]                         # (T, 1)
    f32 = f32_ref[:]                         # (T, 1)
    t = row2.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
    inhalf = (lane >> 6) == (par & 1)
    l6 = lane & 63
    meta_f = jnp.sum(jnp.where(inhalf & (l6 == 0), row2, 0), axis=1,
                     keepdims=True)
    ov = jnp.sum(jnp.where(inhalf & (l6 == 2), row2, 0), axis=1,
                 keepdims=True)
    found = (meta_f == f32) & (f32 != -1)
    oidx_ref[:] = jnp.where(found, ov, 0)


@functools.partial(jax.jit, static_argnames=("tile",))
def _oidx_call(row2, par, f32, tile):
    n = row2.shape[0]
    grid = (n // tile,)
    spec1 = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _oidx_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  spec1, spec1],
        out_specs=spec1,
    )(row2, par, f32)


def oidx_decode(row2: jax.Array, par: jax.Array, flat: jax.Array,
                tile: int = 512):
    """Overflow-row-id extraction for the two-tier full-depth probe
    (slot-packed u32 rows: meta = [feat, cnt, ovf_idx]).

    row2: (N, 128) i32 gathered pair-packed head rows; par: (N,) i32;
    flat: (N,) u32 features. Returns oidx (N,) i32 = ovf_idx where the
    row's feature matches, else 0 — bit-identical to the XLA
    half-select + _meta_match + lane-3 pick in probe_rows. The XLA
    lowering of that sequence is another lane-rotate relayout over the
    134 MB gathered-rows buffer; this is one VMEM pass that must
    PRECEDE the overflow gather (full_decode then re-reads row2)."""
    n = row2.shape[0]
    f32 = jax.lax.bitcast_convert_type(flat, jnp.int32)
    pad = (-n) % tile
    if pad:
        row2 = jnp.pad(row2, ((0, pad), (0, 0)))
        par = jnp.pad(par, (0, pad))
        f32 = jnp.pad(f32, (0, pad), constant_values=-1)
    ctx, x32 = _ctx()
    with ctx, x32:
        oidx = _oidx_call(row2, par.reshape(-1, 1),
                          f32.reshape(-1, 1), tile)
    return oidx[:n, 0]


def _head_kernel(row2_ref, par_ref, f32_ref, pk_ref, cnt_ref, *,
                 hsl, rl, f):
    row2 = row2_ref[:]                       # (T, 128)
    par = par_ref[:]                         # (T, 1)
    f32 = f32_ref[:]                         # (T, 1)
    t = row2.shape[0]
    half = _half_select(row2, par)           # (T, 64)
    meta_f = half[:, 0:1]
    found = (meta_f == f32) & (f32 != -1)
    cnt = jnp.where(found, half[:, 1:2], 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, 64), 1)
    # pk lane j <- slot lane 3 + j for j < hsl, I32_MAX beyond
    slots = _roll(half, -3, 64)
    hit = lane < jnp.minimum(cnt, hsl)
    pk = jnp.where(hit, slots, I32_MAX)
    if rl > 64:
        pk = jnp.concatenate(
            [pk, jnp.full((t, rl - 64), I32_MAX, jnp.int32)], axis=1)
    # alternating-run reversal: odd feature rows descend
    odd = _odd_rows(t, rl, f)
    pk_ref[:] = jnp.where(odd, _rev_lanes(pk, rl), pk)
    cnt_ref[:] = cnt


@functools.partial(jax.jit,
                   static_argnames=("hsl", "rl", "f", "tile"))
def _head_call(row2, par, f32, hsl, rl, f, tile):
    n = row2.shape[0]
    grid = (n // tile,)
    spec1 = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_head_kernel, hsl=hsl, rl=rl, f=f),
        out_shape=(jax.ShapeDtypeStruct((n, rl), jnp.int32),
                   jax.ShapeDtypeStruct((n, 1), jnp.int32)),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  spec1, spec1],
        out_specs=(pl.BlockSpec((tile, rl), lambda i: (i, 0),
                                memory_space=pltpu.VMEM), spec1),
    )(row2, par, f32)


def head_decode(row2: jax.Array, par: jax.Array, flat: jax.Array,
                hsl: int, rl: int, f: int, tile: int = 512):
    """Two-tier head-only decode (escalation phase 1), slot-packed.

    row2: (N, 128) i32 gathered head physical rows (pair-packed);
    par: (N,) i32 row parity; flat: (N,) u32 features; hsl head slots;
    rl alternating-run length (>= 64); f features per query (N % f
    == 0, rows feature-major within a query).

    Returns (pk (N, rl) i32 masked + odd-run-reversed, cnt (N,) i32) —
    bit-identical to probe_rows_head's hpack branch incl. the
    jax.lax.rev of odd feature segments.
    """
    assert rl >= 64 and hsl <= 61
    n = row2.shape[0]
    f32 = jax.lax.bitcast_convert_type(flat, jnp.int32)
    # tile must hold whole queries so the odd/even pattern is static
    while tile % (2 * f):
        tile //= 2
    tile = max(tile, 2 * f)
    pad = (-n) % tile
    if pad:
        row2 = jnp.pad(row2, ((0, pad), (0, 0)))
        par = jnp.pad(par, (0, pad))
        f32 = jnp.pad(f32, (0, pad), constant_values=-1)
    ctx, x32 = _ctx()
    with ctx, x32:
        pk, cnt = _head_call(row2, par.reshape(-1, 1),
                             f32.reshape(-1, 1), hsl, rl, f, tile)
    return pk[:n], cnt[:n, 0]


def _full_kernel(row2_ref, orow_ref, par_ref, f32_ref, pk_ref, *,
                 hsl, c, rl, f, ow_cols):
    row2 = row2_ref[:]                       # (T, 128)
    orow = orow_ref[:]                       # (T, ow_cols)
    par = par_ref[:]
    f32 = f32_ref[:]
    t = row2.shape[0]
    half = _half_select(row2, par)           # (T, 64)
    found = (half[:, 0:1] == f32) & (f32 != -1)
    cnt = jnp.where(found, half[:, 1:2], 0)
    slots = _roll(half, -3, 64)              # head slots at lanes 0..
    ow = c - hsl
    parts = [slots[:, :hsl], orow[:, :ow]]
    if rl > c:
        parts.append(jnp.full((t, rl - c), I32_MAX, jnp.int32))
    pk = jnp.concatenate(parts, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, rl), 1)
    pk = jnp.where(lane < cnt, pk, I32_MAX)
    odd = _odd_rows(t, rl, f)
    pk_ref[:] = jnp.where(odd, _rev_lanes(pk, rl), pk)


@functools.partial(jax.jit,
                   static_argnames=("hsl", "c", "rl", "f", "tile"))
def _full_call(row2, orow, par, f32, hsl, c, rl, f, tile):
    n = row2.shape[0]
    grid = (n // tile,)
    spec1 = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    ow_cols = orow.shape[1]
    return pl.pallas_call(
        functools.partial(_full_kernel, hsl=hsl, c=c, rl=rl, f=f,
                          ow_cols=ow_cols),
        out_shape=jax.ShapeDtypeStruct((n, rl), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, ow_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  spec1, spec1],
        out_specs=pl.BlockSpec((tile, rl), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(row2, orow, par, f32)


def full_decode(row2: jax.Array, orow: jax.Array, par: jax.Array,
                flat: jax.Array, hsl: int, c: int, rl: int, f: int,
                tile: int = 256):
    """Two-tier full-depth decode (escalation redo), slot-packed u32.

    row2: (N, 128) gathered head physical rows; orow: (N, OW) gathered
    overflow rows (OW >= c - hsl); par/flat as head_decode; c slots
    per feature; rl run length (>= c). Returns pk (N, rl) masked +
    odd-run-reversed — bit-identical to probe_rows' two-tier
    slot-packed branch with alt_runs=rl.
    """
    assert rl >= c and hsl <= 61
    n = row2.shape[0]
    f32 = jax.lax.bitcast_convert_type(flat, jnp.int32)
    while tile % (2 * f):
        tile //= 2
    tile = max(tile, 2 * f)
    pad = (-n) % tile
    if pad:
        row2 = jnp.pad(row2, ((0, pad), (0, 0)))
        orow = jnp.pad(orow, ((0, pad), (0, 0)))
        par = jnp.pad(par, (0, pad))
        f32 = jnp.pad(f32, (0, pad), constant_values=-1)
    ctx, x32 = _ctx()
    with ctx, x32:
        pk = _full_call(row2, orow, par.reshape(-1, 1),
                        f32.reshape(-1, 1), hsl, c, rl, f, tile)
    return pk[:n]
