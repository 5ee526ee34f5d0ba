#!/usr/bin/env python
"""Toy-DB A/B matrix: find the round-4 5.6% regression (107.9M -> 101.9M
reads/min) and the fastest configuration of the dense-path scan step.

Axes (each measured on the real chip, same DB/reads):
  - fused candidates Pallas kernel ON (r4 global-max top-k) vs OFF
    (XLA sort + fast_top2 scan, the r3-and-earlier inner path)
  - MC_SKETCH_MODE sort vs extract
  - prefetch (software-pipelined scan) on/off
  - candidates kernel tile override (MC_CAND_TILE)
  - SCAN_K 32/64/128

Prints one line per combination; run AFTER any other chip job finishes
(the chip is single-tenant).
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


def main():
    rng = np.random.default_rng(42)
    opt = SketchingOptions().resolved()
    genomes = []
    species = []
    for bse in range(16):
        base = rng.integers(0, 4, GLEN, dtype=np.uint8)
        for s in range(4):
            g = base if s == 0 else base.copy()
            if s:
                pos = rng.integers(0, GLEN, GLEN // 100)
                g[pos] = rng.integers(0, 4, len(pos), dtype=np.uint8)
            genomes.append(g)
            species.append(bse)
    ntgt = len(genomes)
    t0 = time.time()
    acc = DeviceSketchAccumulator(opt.kmerlen, opt.sketchlen)
    for tid, g in enumerate(genomes):
        wm, vl = W.sequence_windows(g, opt)
        acc.add_target(wm, vl, tid)
    dt = build_device_table_chunked(acc.finish_chunks(), cap=254)
    print(f"build {time.time()-t0:.1f}s F={dt.nf/1e6:.2f}M spf={dt.spf} "
          f"dense={dt.dense}", flush=True)

    lineages = np.zeros((ntgt, 21), np.int32)
    lineages[:, 0] = -np.arange(ntgt) - 1
    lineages[:, 4] = np.asarray(species) + 100
    lineages[:, 20] = 1
    mt = jnp.asarray(lineages[:, 0].copy())
    lg = jnp.asarray(lineages)
    rng2 = np.random.default_rng(7)
    gsel = rng2.integers(0, ntgt, B)
    pos = rng2.integers(0, GLEN - RLEN, B)
    wins = np.full((B, 1, opt.winlen), 4, np.uint8)
    for i in range(B):
        rd = genomes[gsel[i]][pos[i]:pos[i] + RLEN].copy()
        nm = rng2.poisson(1)
        if nm:
            mp = rng2.integers(0, RLEN, nm)
            rd[mp] = rng2.integers(0, 4, nm, dtype=np.uint8)
        wins[i, 0, :RLEN] = rd
    valid = np.full((B, 1), RLEN, np.int32)
    mwir = np.full(B, 2, np.int32)
    if dt.dense:
        dense = (f"pk{dt.slot_bits}" + ("p" if dt.packed else "")) \
            if dt.slot_bits else True
    else:
        dense = ("two_tier", dt.head_slots, dt.packed, dt.ovf_packed,
                 dt.slot_bits)

    from metacache_tpu.ops.rows import query_step_rows_scan

    def measure(scan_k, fused, prefetch, iters=6):
        def qscan(wk, vk, mk):
            return query_step_rows_scan(
                wk, vk, mk, dt.uniq, dt.offsets, dt.head, dt.ovf,
                mt, lg, jnp.int32(5), jnp.float32(1.0), jnp.int32(19),
                jnp.int32(0), dt.brows,
                k=opt.kmerlen, sketchlen=opt.sketchlen,
                slots_per_feature=dt.spf, windows_per_query=1,
                max_candidates=2, prefix_bits=dt.bbits, prefix_steps=0,
                dense=dense, use_pallas_sketch=True,
                walk_elems=2 * opt.sketchlen, fast_top2=True,
                fused_candidates=fused, pack_bits=dt.slot_bits,
                prefetch=prefetch)
        wk = jnp.asarray(np.broadcast_to(
            wins[None], (scan_k,) + wins.shape).copy())
        vk = jnp.asarray(np.broadcast_to(
            valid[None], (scan_k,) + valid.shape).copy())
        mk = jnp.asarray(np.broadcast_to(
            mwir[None], (scan_k,) + mwir.shape).copy())
        np.asarray(qscan(wk, vk, mk))
        np.asarray(qscan(wk, vk, mk))
        t0 = time.time()
        prev = None
        for _ in range(iters):
            r = qscan(wk, vk, mk)
            if prev is not None:
                np.asarray(prev)
            prev = r
        np.asarray(prev)
        d = (time.time() - t0) / (iters * scan_k)
        return d

    combos = []
    for fused in (True, False):
        for prefetch in (True, False):
            combos.append((64, fused, prefetch, "sort", ""))
    combos.append((64, True, True, "extract", ""))
    combos.append((64, True, True, "sort", "split"))
    combos.append((32, True, True, "sort", ""))
    combos.append((128, True, True, "sort", ""))
    for scan_k, fused, prefetch, smode, extra in combos:
        os.environ["MC_SKETCH_MODE"] = smode
        if extra == "split":
            os.environ["MC_SPLIT_CAND"] = "1"
        else:
            os.environ.pop("MC_SPLIT_CAND", None)
        # env knobs are baked at trace time — force a retrace so each
        # combo really runs its configuration
        jax.clear_caches()
        d = measure(scan_k, fused, prefetch)
        print(f"scan_k={scan_k} fused={int(fused)} "
              f"prefetch={int(prefetch)} sketch={smode} {extra}: "
              f"{d*1000:.3f} ms/batch = {B/d*60/1e6:.1f}M reads/min",
              flush=True)


if __name__ == "__main__":
    main()
