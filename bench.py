#!/usr/bin/env python
"""Benchmark: short-read classification throughput on one TPU chip.

Builds a synthetic strain-redundant reference database (16 base genomes x 4
mutated strains x 1 Mbp = 64 Mbp, mimicking RefSeq strain redundancy so
feature buckets have realistic depth), then measures steady-state device
classification throughput for 100 bp reads (sketch -> probe -> gather ->
sort -> candidate sweep -> LCA), reads/min.

Baseline: reference MetaCache-GPU ~300 M reads/min on 4x V100
(README.md:7). vs_baseline = ours / 300e6 (single chip vs 4 GPUs).

Prints ONE JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

NUM_BASE = 16
STRAINS = 4
GENOME_LEN = 1_000_000
READ_LEN = 100
BATCH_READS = 8192
SCAN_K = 64         # batches fused per device dispatch (lax.scan) —
                    # measured sweep (tools/profile_query.py): 16 -> 64
                    # amortizes the ~1 ms fixed per-iteration cost
                    # (5.28 -> 4.79 ms/batch); B=32768 regresses (probe
                    # gathers lose locality), so 8192 stays the batch
WARMUP = 2
ITERS = 8


def make_genomes(rng):
    genomes = []
    for b in range(NUM_BASE):
        base = rng.integers(0, 4, GENOME_LEN, dtype=np.uint8)
        for s in range(STRAINS):
            g = base.copy()
            if s:
                nmut = GENOME_LEN // 100
                pos = rng.integers(0, GENOME_LEN, nmut)
                g[pos] = rng.integers(0, 4, nmut, dtype=np.uint8)
            genomes.append(g)
    return genomes


def main():
    from metacache_tpu.utils.platform import force_platform
    force_platform()
    import jax
    import jax.numpy as jnp
    from metacache_tpu.config import SketchingOptions
    from metacache_tpu.db.sketch_exec import SketchAccumulator
    from metacache_tpu.ops import windows as W
    from metacache_tpu.ops.table import FeatureTable, unpack_locations

    rng = np.random.default_rng(42)
    opt = SketchingOptions().resolved()

    genomes = make_genomes(rng)
    t_start = time.time()

    # --- build DB on device (sketch) + sort-based table construction ----
    # (same path the CLI build uses: cross-target batched device sketch,
    # presorted radix table construction)
    acc = SketchAccumulator(opt.kmerlen, opt.sketchlen)
    for tid, g in enumerate(genomes):
        wm, vl = W.sequence_windows(g, opt)
        acc.add_target(wm, vl, tid)
    bf, bl = acc.finish()
    ft = FeatureTable.build(bf, bl, presorted_within_feature=True)
    build_s = time.time() - t_start

    ltgt, lwin = unpack_locations(ft.locations)
    spf = min(ft.max_bucket_size, 255)
    ntgt = len(genomes)
    num_ranks = 21
    lineages = np.zeros((ntgt, num_ranks), np.int32)
    lineages[:, 0] = -np.arange(ntgt) - 1
    lineages[:, 4] = np.arange(ntgt) // STRAINS + 100   # species per base
    lineages[:, 20] = 1
    merge_tax = lineages[:, 0].copy()

    # --- sample reads, pre-stage batches (row layout: 1 window/read) ----
    from metacache_tpu.ops.rows import query_step_rows as query_step
    B = BATCH_READS
    gsel = rng.integers(0, ntgt, B)
    pos = rng.integers(0, GENOME_LEN - READ_LEN, B)
    wins = np.full((B, 1, opt.winlen), 4, np.uint8)
    for i in range(B):
        rd = genomes[gsel[i]][pos[i]:pos[i] + READ_LEN].copy()
        nm = rng.poisson(READ_LEN / 100)      # ~1% sequencing errors
        if nm:
            mp = rng.integers(0, READ_LEN, nm)
            rd[mp] = rng.integers(0, 4, nm, dtype=np.uint8)
        wins[i, 0, :READ_LEN] = rd
    valid = np.full((B, 1), READ_LEN, np.int32)
    mwir = np.full(B, 2, np.int32)

    from metacache_tpu.ops.probe import make_bucket_index
    brows, bbits = make_bucket_index(ft.unique_features)
    fused = ft.fused_rows(spf)
    lt2, lw2 = fused, np.zeros((1,), np.int32)

    # Stack SCAN_K batches and process them inside ONE jitted lax.scan —
    # one dispatch + one small fetch per SCAN_K * BATCH_READS reads. This
    # is the production infeed shape and it amortizes host<->device
    # round-trip latency (the dominant cost through this environment's
    # TPU tunnel, whose block_until_ready is also unreliable — fetching
    # result bytes is the only trustworthy timing protocol).
    import functools
    from metacache_tpu.ops.rows import (probe_rows, rows_to_result,
                                        _sketch_dispatch)
    from metacache_tpu.ops.sketch_jax import sketch_windows
    use_pallas = jax.devices()[0].platform not in ("cpu",)

    @functools.partial(jax.jit, static_argnames=())
    def query_scan(wins_k, valid_k, mwir_k, tf, to, la, lb, ps, mt, lg):
        def body(carry, xs):
            w, v, m = xs
            f = _sketch_dispatch(w.reshape(B, opt.winlen),
                                 v.reshape(B), opt.kmerlen,
                                 opt.sketchlen, use_pallas)
            t, wn = probe_rows(f.reshape(B, opt.sketchlen), tf, to,
                               la, lb, spf, ps, bbits, 0,
                               dense=True)
            res = rows_to_result(
                t, wn, m, mt, lg, jnp.int32(5), jnp.float32(1.0),
                jnp.int32(19), jnp.int32(0), max_candidates=2,
                walk_elems=2 * opt.sketchlen, fast_top2=True,
                fused_candidates=use_pallas, emit_hits=False)
            return carry, res.cls_tax
        _, cls_k = jax.lax.scan(body, 0, (wins_k, valid_k, mwir_k))
        return cls_k

    wins_k = jnp.asarray(np.broadcast_to(
        wins[None], (SCAN_K,) + wins.shape).copy())
    valid_k = jnp.asarray(np.broadcast_to(
        valid[None], (SCAN_K,) + valid.shape).copy())
    mwir_k = jnp.asarray(np.broadcast_to(
        mwir[None], (SCAN_K,) + mwir.shape).copy())
    targs = (jnp.asarray(ft.unique_features),
             jnp.asarray(ft.offsets.astype(np.int32)),
             jnp.asarray(lt2), jnp.asarray(lw2),
             jnp.asarray(brows),
             jnp.asarray(merge_tax), jnp.asarray(lineages))

    cls_k = query_scan(wins_k, valid_k, mwir_k, *targs)
    np.asarray(cls_k)
    for _ in range(WARMUP):
        np.asarray(query_scan(wins_k, valid_k, mwir_k, *targs))

    t0 = time.time()
    prev = None
    for _ in range(ITERS):
        r = query_scan(wins_k, valid_k, mwir_k, *targs)
        if prev is not None:
            np.asarray(prev)
        prev = r
    cls = np.asarray(prev)[0]
    dt = (time.time() - t0) / (ITERS * SCAN_K)

    # sanity: most reads should classify
    ok_any = np.mean(cls != 0)

    reads_per_min = B / dt * 60

    # --- long-read throughput (optional: never blocks the main metric) (reference CPU baseline: ~20M/min for
    # 200bp-19kb reads, median 480bp; README.md:5) ---------------------
    long_reads_per_min = 0.0
    lcls = np.zeros((1, 1), np.int32)
    LB, LLEN, WQ = 2048, 480, 5
    try:
        lsel = rng.integers(0, ntgt, LB)
        lpos = rng.integers(0, GENOME_LEN - LLEN, LB)
        lwins = np.full((LB, WQ, opt.winlen), 4, np.uint8)
        lvalid = np.zeros((LB, WQ), np.int32)
        from metacache_tpu.ops.windows import sequence_windows
        for i in range(LB):
            wm, vl = sequence_windows(
                genomes[lsel[i]][lpos[i]:lpos[i] + LLEN], opt)
            lwins[i, :len(wm)] = wm
            lvalid[i, :len(vl)] = vl
        lmwir = np.full(LB, 2 + LLEN // opt.winstride, np.int32)

        @jax.jit
        def query_scan_long(wins_k, valid_k, mwir_k, tf, to, la, lb, ps,
                            mt, lg):
            def body(carry, xs):
                w, v, m = xs
                f = _sketch_dispatch(w.reshape(LB * WQ, opt.winlen),
                                     v.reshape(LB * WQ), opt.kmerlen,
                                     opt.sketchlen, use_pallas)
                f = f.reshape(LB, WQ * opt.sketchlen)
                t, wn = probe_rows(f, tf, to, la, lb, spf, ps, bbits,
                                   0, dense=True)
                res = rows_to_result(
                    t, wn, m, mt, lg, jnp.int32(5), jnp.float32(1.0),
                    jnp.int32(19), jnp.int32(0), max_candidates=2,
                    dedup_walk=2 + LLEN // opt.winstride, fast_top2=True)
                return carry, res.cls_tax
            _, cls_k = jax.lax.scan(body, 0, (wins_k, valid_k, mwir_k))
            return cls_k

        lwk = jnp.asarray(np.broadcast_to(lwins[None],
                                          (SCAN_K,) + lwins.shape).copy())
        lvk = jnp.asarray(np.broadcast_to(lvalid[None],
                                          (SCAN_K,) + lvalid.shape).copy())
        lmk = jnp.asarray(np.broadcast_to(lmwir[None],
                                          (SCAN_K,) + lmwir.shape).copy())
        lcls = query_scan_long(lwk, lvk, lmk, *targs)
        np.asarray(lcls)
        t0 = time.time()
        prev = None
        for _ in range(max(ITERS // 2, 2)):
            r = query_scan_long(lwk, lvk, lmk, *targs)
            if prev is not None:
                np.asarray(prev)
            prev = r
        lcls = np.asarray(prev)
        ldt = (time.time() - t0) / (max(ITERS // 2, 2) * SCAN_K)
        long_reads_per_min = LB / ldt * 60

    except Exception as e:
        print(f'long-read bench skipped: {e}', file=sys.stderr)

    out = {
        "metric": "100bp read classification throughput (1 chip, "
                  f"64x1Mbp strain-redundant DB, max bucket {spf})",
        "value": round(reads_per_min),
        "unit": "reads/min",
        "vs_baseline": round(reads_per_min / 300e6, 4),
        "detail": {
            "ms_per_batch": round(dt * 1000, 3),
            "batch_reads": B,
            "scan_batches_per_dispatch": SCAN_K,
            "db_features": int(ft.num_features),
            "db_locations": int(ft.num_locations),
            "build_seconds": round(build_s, 1),
            "classified_fraction": round(float(ok_any), 4),
            "long_reads_480bp_per_min": round(long_reads_per_min),
            "long_read_classified_fraction": round(
                float((lcls[0] != 0).mean()), 4),
            "devices": [str(d) for d in jax.devices()],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
