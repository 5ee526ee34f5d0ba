#!/usr/bin/env python
"""Deep-bucket (944 Mbp, spf 254) stage decomposition.

Times each stage of the escalation pipeline SEPARATELY, each inside a
lax.scan over K iterations (amortizing dispatch like the production
SCAN_K loop), consuming every gathered value through an XOR-iota
reduction so XLA can neither hoist the gather into per-row sums nor
dead-code it. This replaces the back-of-envelope "~20 ns/row gather
floor" in COMPONENTS.md with per-stage numbers.

Stages:
  sketch        Pallas sketcher only
  bucket        bucket-row index probe (1 gather/probe)
  headgather    head-row gather at probed indices (1 gather/probe)
  probe_head    sketch+bucket+head+mask (phase 1 without candidates)
  cand_head     candidates kernel alone at L = f*64 (phase-1 width)
  head_step     the real query_step_rows_scan_head
  redo_gather   full-depth probe gathers (head+overflow) at B=8192
  cand_redo     candidates kernel alone at L = f*256 (redo width)
  redo_step     the real query_step_rows_redo_scan
  fused_step    the real query_step_rows_scan_head_fused

Run serialized with other chip jobs.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

from metacache_tpu.utils.platform import force_platform  # noqa: E402

force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metacache_tpu.config import SketchingOptions  # noqa: E402
from metacache_tpu.db.sketch_exec import DeviceSketchAccumulator  # noqa: E402
from metacache_tpu.ops import windows as W  # noqa: E402
from metacache_tpu.ops.table_device import (  # noqa: E402
    build_device_table_chunked)

GLEN = 1_000_000
B = 8192
RLEN = 100
K = 32


def mix(g):
    g = jax.lax.bitcast_convert_type(g.astype(jnp.int32), jnp.int32) \
        if g.dtype != jnp.int32 else g
    if g.ndim == 1:
        g = g[:, None]
    i = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    return jnp.sum(g ^ i, dtype=jnp.int32)


KSUB = 8


def scan_timed(name, body, xs, consts=(), iters=3):
    """body(x, consts) -> i32 scalar; xs pytree with leading dim K.

    Timing protocol for this relay backend (tools/
    profile_dispatch_cache*.py): block_until_ready does NOT reliably
    wait, so every timed call ends in a host FETCH, and the ~50 ms
    per-dispatch tunnel overhead is cancelled by differencing two scan
    lengths (K-slope). Big tables MUST ride in `consts` (jit args) —
    closing over them embeds them as constants in the remote-compile
    payload (HTTP 413 at 1 GiB)."""
    @jax.jit
    def run(xs, consts):
        def f(c, x):
            return c + body(x, consts), ()
        return jax.lax.scan(f, jnp.int32(0), xs)[0]

    sub = jax.tree_util.tree_map(lambda a: a[:KSUB], xs)
    np.asarray(run(sub, consts))
    np.asarray(run(xs, consts))
    t8 = tk = 1e9
    for _ in range(iters):
        t0 = time.time()
        np.asarray(run(sub, consts))
        t8 = min(t8, time.time() - t0)
        t0 = time.time()
        np.asarray(run(xs, consts))
        tk = min(tk, time.time() - t0)
    t = (tk - t8) / (K - KSUB)
    print(f"{name:12s}: {t*1e3:7.3f} ms/batch "
          f"({B/t*60/1e6:7.1f}M reads/min-equiv) "
          f"[K{KSUB}={t8*1e3:.1f} K{K}={tk*1e3:.1f}]", flush=True)
    return t


def main():
    rng = np.random.default_rng(42)
    opt = SketchingOptions().resolved()
    genomes, species = [], []
    sp = 0
    for bases, strains, mut in ((64, 1, 0.0), (12, 52, 0.003),
                                (1, 256, 0.003)):
        for b in range(bases):
            base = rng.integers(0, 4, GLEN, dtype=np.uint8)
            for s in range(strains):
                g = base if s == 0 else base.copy()
                if s and mut:
                    pos = rng.integers(0, GLEN, int(GLEN * mut))
                    g[pos] = rng.integers(0, 4, len(pos),
                                          dtype=np.uint8)
                genomes.append(g)
                species.append(sp)
            sp += 1
    ntgt = len(genomes)
    t0 = time.time()
    acc = DeviceSketchAccumulator(opt.kmerlen, opt.sketchlen)
    for tid, g in enumerate(genomes):
        wm, vl = W.sequence_windows(g, opt)
        acc.add_target(wm, vl, tid)
    dt = build_device_table_chunked(acc.finish_chunks(), cap=254)
    print(f"build {time.time()-t0:.1f}s F={dt.nf/1e6:.2f}M "
          f"spf={dt.spf} head={dt.head_slots} classed={dt.classed} "
          f"packed={dt.packed} ovf_packed={dt.ovf_packed} "
          f"bbits={dt.bbits} brows={dt.brows.shape} "
          f"head_rows={dt.head.shape} ovf={dt.ovf.shape}", flush=True)

    lineages = np.zeros((ntgt, 21), np.int32)
    lineages[:, 0] = -np.arange(ntgt) - 1
    lineages[:, 4] = np.asarray(species) + 100
    lineages[:, 20] = 1
    mt = jnp.asarray(lineages[:, 0].copy())
    lg = jnp.asarray(lineages)
    rng2 = np.random.default_rng(7)
    wins = np.full((K, B, 1, opt.winlen), 4, np.uint8)
    for kk in range(K):
        gsel = rng2.integers(0, ntgt, B)
        pos = rng2.integers(0, GLEN - RLEN, B)
        for i in range(B):
            rd = genomes[gsel[i]][pos[i]:pos[i] + RLEN].copy()
            nm = rng2.poisson(1)
            if nm:
                mp = rng2.integers(0, RLEN, nm)
                rd[mp] = rng2.integers(0, 4, nm, dtype=np.uint8)
            wins[kk, i, 0, :RLEN] = rd
    del genomes
    valid = np.full((K, B, 1), RLEN, np.int32)
    mwir = np.full((K, B), 2, np.int32)
    wk = jnp.asarray(wins)
    vk = jnp.asarray(valid)
    mk = jnp.asarray(mwir)

    dense = ("two_tier", dt.head_slots, dt.packed, dt.ovf_packed,
             dt.slot_bits)
    if dt.classed:
        dense = ("classed", dt.head_slots, False, dt.ovf_packed,
                 dt.slot_bits)
    F = opt.sketchlen
    hsl = dt.head_slots
    rl_head = 1 << max(int(hsl - 1).bit_length(), 0)
    rl_redo = 1 << max(int(dt.spf - 1).bit_length(), 0)

    from metacache_tpu.ops.rows import (  # noqa: E402
        _sketch_dispatch, probe_rows, probe_rows_head, rows_to_result,
        query_step_rows_scan_head, query_step_rows_redo_scan,
        query_step_rows_scan_head_fused)
    from metacache_tpu.ops.probe import probe_bucket  # noqa: E402

    # --- precompute per-iteration feats and bucket indices
    @jax.jit
    def feats_of(w, v):
        f = _sketch_dispatch(w.reshape(B, -1), v.reshape(B),
                             opt.kmerlen, F, True)
        return f.reshape(B, F)

    fk = jnp.stack([feats_of(wk[i], vk[i]) for i in range(K)])
    jax.block_until_ready(fk)

    @jax.jit
    def bidx_of(f, brows):
        i, _ = probe_bucket(f.reshape(-1), brows, dt.bbits)
        return jnp.clip(i, 0, None).reshape(B, F)

    ik = jnp.stack([bidx_of(fk[i], dt.brows) for i in range(K)])
    jax.block_until_ready(ik)

    # --- stage timings (MC_DECOMP_TAIL=1 skips the already-measured
    # early stages and goes straight to the step/redo timings)
    tail_only = os.environ.get("MC_DECOMP_TAIL") == "1"
    if not tail_only:
        scan_timed("sketch", lambda x, c: mix(feats_of(x[0], x[1])),
                   (wk, vk))
        scan_timed("bucket", lambda f, c: mix(bidx_of(f, c[0])), fk,
                   (dt.brows,))

    hpack = dt.packed

    def headgather(i, c):
        head, = c
        flat = i.reshape(-1)
        if hpack:
            r2 = head[flat >> 1]
            rows = jnp.where((flat & 1)[:, None] == 1, r2[:, 64:],
                             r2[:, :64])
        else:
            rows = head[flat]
        return mix(rows)

    if not tail_only:
        scan_timed("headgather", headgather, ik, (dt.head,))

    def probe_head_full(x, c):
        head, brows = c
        f, i = x
        pk, over = probe_rows_head(
            f, head, brows, dt.bbits, dense,
            alt_runs=rl_head, pack_bits=dt.slot_bits,
            idx_pre=i.reshape(-1))
        return mix(pk) + mix(over.astype(jnp.int32))

    if not tail_only:
        scan_timed("probe_head", probe_head_full, (fk, ik),
                   (dt.head, dt.brows))

    # candidates kernel alone at phase-1 width
    pk1, _ = probe_rows_head(
        fk[0], dt.head, dt.brows, dt.bbits, dense,
        alt_runs=rl_head, pack_bits=dt.slot_bits,
        idx_pre=ik[0].reshape(-1))
    pk1 = jax.block_until_ready(pk1)
    pkk1 = jnp.stack([jnp.roll(pk1, i, axis=0) for i in range(K)])
    mk1 = mk[0]

    def cand_head(pk, c):
        mk1_, mt_, lg_ = c
        res = rows_to_result(
            pk, pk, mk1_, mt_, lg_, jnp.int32(5), jnp.float32(1.0),
            jnp.int32(19), jnp.int32(0), max_candidates=2,
            walk_elems=2 * F, fast_top2=True, fused_candidates=True,
            emit_hits=False, presorted_runs=rl_head,
            pack_bits=dt.slot_bits)
        return mix(res.cls_tax)

    if not tail_only:
        scan_timed("cand_head", cand_head, pkk1, (mk1, mt, lg))

    common = dict(k=opt.kmerlen, sketchlen=F, slots_per_feature=dt.spf,
                  max_candidates=2, prefix_bits=dt.bbits, dense=dense,
                  walk_elems=2 * F, fused_candidates=True,
                  pack_bits=dt.slot_bits)

    def timeit_raw(name, fn, first, iters=3):
        """fn(kslice) runs the step over kslice scan iterations;
        K-slope protocol as in scan_timed. The step output is reduced
        to ONE scalar on device before fetching — fetching the (K, B)
        result itself would add K-dependent tunnel d2h time to the
        slope."""
        def red(r):
            return np.asarray(jnp.sum(first(r).astype(jnp.int32)))
        red(fn(KSUB))
        red(fn(K))
        t8 = tk = 1e9
        for _ in range(iters):
            t0 = time.time()
            red(fn(KSUB))
            t8 = min(t8, time.time() - t0)
            t0 = time.time()
            red(fn(K))
            tk = min(tk, time.time() - t0)
        t = (tk - t8) / (K - KSUB)
        print(f"{name:12s}: {t*1e3:7.3f} ms/batch "
              f"({B/t*60/1e6:7.1f}M reads/min-equiv) "
              f"[K{KSUB}={t8*1e3:.1f} K{K}={tk*1e3:.1f}]", flush=True)
        return t

    def composed(x, c):
        head, brows = c
        w, v, mw = x
        f = feats_of(w, v)
        i = bidx_of(f, brows)
        pk, over = probe_rows_head(
            f, head, brows, dt.bbits, dense, alt_runs=rl_head,
            pack_bits=dt.slot_bits, idx_pre=i.reshape(-1))
        res = rows_to_result(
            pk, pk, mw, mt, lg, jnp.int32(5), jnp.float32(1.0),
            jnp.int32(19), jnp.int32(0), max_candidates=2,
            walk_elems=2 * F, fast_top2=True, fused_candidates=True,
            emit_hits=False, presorted_runs=rl_head,
            pack_bits=dt.slot_bits)
        return mix(res.cls_tax) + mix(over.astype(jnp.int32))

    scan_timed("composed", composed, (wk, vk, mk),
               (dt.head, dt.brows))

    def head_step(kk):
        return query_step_rows_scan_head(
            wk[:kk], vk[:kk], mk[:kk], dt.uniq, dt.offsets, dt.head,
            dt.ovf, mt, lg, jnp.int32(5), jnp.float32(1.0),
            jnp.int32(19), jnp.int32(0), dt.brows,
            use_pallas_sketch=True, fast_top2=True,
            prefetch=True, return_feats=True, **common)

    timeit_raw("head_step", head_step, lambda r: r[0])

    # redo stages (full batch = per-batch cost of an all-escalated set)
    def redo_gather(x, c):
        uniq, offsets, head, ovf = c
        f, i = x
        pk, _ = probe_rows(
            f, uniq, offsets, head, ovf, dt.spf,
            prefix_starts=None, prefix_bits=dt.bbits,
            dense=dense, alt_runs=rl_redo, pack_bits=dt.slot_bits,
            idx_pre=i.reshape(-1))
        return mix(pk)

    scan_timed("redo_gather", redo_gather, (fk, ik),
               (dt.uniq, dt.offsets, dt.head, dt.ovf))

    pk2, _ = probe_rows(
        fk[0], dt.uniq, dt.offsets, dt.head, dt.ovf, dt.spf,
        prefix_starts=dt.brows, prefix_bits=dt.bbits, dense=dense,
        alt_runs=rl_redo, pack_bits=dt.slot_bits,
        idx_pre=ik[0].reshape(-1))
    pk2 = jax.block_until_ready(pk2[:2048])
    pkk2 = jnp.stack([jnp.roll(pk2, i, axis=0) for i in range(K)])
    mk_red = mk1[:2048]

    def cand_redo(pk, c):
        # B=2048 rows; ms/batch printed is 1/4 of the 8192-read cost
        mk1_, mt_, lg_ = c
        res = rows_to_result(
            pk, pk, mk1_, mt_, lg_, jnp.int32(5), jnp.float32(1.0),
            jnp.int32(19), jnp.int32(0), max_candidates=2,
            walk_elems=2 * F, fast_top2=True, fused_candidates=True,
            emit_hits=False, presorted_runs=rl_redo,
            pack_bits=dt.slot_bits)
        return mix(res.cls_tax)

    scan_timed("cand_redo", cand_redo, pkk2, (mk_red, mt, lg))

    def redo_step(kk):
        return query_step_rows_redo_scan(
            fk[:kk], ik[:kk], mk[:kk], dt.uniq, dt.offsets, dt.head,
            dt.ovf, mt, lg, jnp.int32(5), jnp.float32(1.0),
            jnp.int32(19), jnp.int32(0), sketchlen=F,
            slots_per_feature=dt.spf, max_candidates=2,
            prefix_bits=dt.bbits, dense=dense, walk_elems=2 * F,
            fused_candidates=True, pack_bits=dt.slot_bits)

    timeit_raw("redo_step", redo_step, lambda r: r)

    # fused step at the production redo width (31% -> b2 = 2560)
    b2 = 2560
    rfs = fk[:, :b2]
    ris = ik[:, :b2]
    rms = mk[:, :b2]

    def fused_step(kk):
        return query_step_rows_scan_head_fused(
            wk[:kk], vk[:kk], mk[:kk], rfs[:kk], ris[:kk], rms[:kk],
            dt.uniq, dt.offsets, dt.head, dt.ovf, mt, lg,
            jnp.int32(5), jnp.float32(1.0), jnp.int32(19),
            jnp.int32(0), dt.brows, use_pallas_sketch=True, **common)

    timeit_raw("fused_step", fused_step, lambda r: r[0])


if __name__ == "__main__":
    main()
