#!/usr/bin/env python
"""End-to-end RefSeq-scale benchmark rehearsal: ~932 Mbp strain-skewed
database (>=1 GB of locations, buckets saturating the 254 cap), built
and staged ENTIRELY ON DEVICE (ops.table_device), two-tier probe layout
chosen against the measured HBM budget, deep-bucket query step (fused
Pallas candidates kernel) — all on the real chip.

DB shape (mimics RefSeq skew):
  - 64 unique 1 Mbp genomes                 (buckets ~1)
  - 12 species x 52 strains x 1 Mbp        (buckets ~52)
  -  1 species x 256 strains x 1 Mbp       (buckets ~256 -> capped 254)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(
    os.path.abspath(__file__)) + "/..")

from metacache_tpu.utils.platform import force_platform  # noqa: E402

force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metacache_tpu.config import SketchingOptions  # noqa: E402
from metacache_tpu.db.sketch_exec import DeviceSketchAccumulator  # noqa: E402
from metacache_tpu.ops import windows as W  # noqa: E402
from metacache_tpu.ops.rows import (_sketch_dispatch, probe_rows,  # noqa: E402
                                    rows_to_result)
from metacache_tpu.ops.table_device import build_device_table  # noqa: E402

GLEN = 1_000_000
UNIQUE = 64
CLUSTERS = [(12, 52), (1, 256)]   # (bases, strains)
MUT = 0.003
RLEN = 100
B = 8192
SCAN_K = int(os.environ.get("MC_PROF_SCANK", "16"))


def gen_genomes(rng):
    out = []
    for u in range(UNIQUE):
        out.append(rng.integers(0, 4, GLEN, dtype=np.uint8))
    for ci, (bases, strains) in enumerate(CLUSTERS):
        for b in range(bases):
            base = rng.integers(0, 4, GLEN, dtype=np.uint8)
            for s in range(strains):
                g = base if s == 0 else base.copy()
                if s:
                    nmut = int(GLEN * MUT)
                    pos = rng.integers(0, GLEN, nmut)
                    g[pos] = rng.integers(0, 4, nmut, dtype=np.uint8)
                out.append(g)
    return out


def main():
    rng = np.random.default_rng(123)
    opt = SketchingOptions().resolved()
    t0 = time.time()
    genomes = gen_genomes(rng)
    ntgt = len(genomes)
    print(f"genomes: {ntgt} x 1 Mbp = {ntgt:.0f} Mbp "
          f"({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    acc = DeviceSketchAccumulator(opt.kmerlen, opt.sketchlen)
    for tid, g in enumerate(genomes):
        wm, vl = W.sequence_windows(g, opt)
        acc.add_target(wm, vl, tid)
    f, t, w = acc.finish_device()
    sketch_s = time.time() - t0
    print(f"device sketch: {f.shape[0]/1e6:.1f}M slots "
          f"({sketch_s:.1f}s)", flush=True)

    t0 = time.time()
    dt = build_device_table(f, t, w, cap=254)
    del f, t, w
    build_s = time.time() - t0
    print(f"device table: F={dt.nf/1e6:.2f}M "
          f"L={dt.num_locations/1e6:.1f}M "
          f"({dt.num_locations*8/2**30:.2f} GiB of locations) "
          f"spf={dt.spf} head={dt.head_slots} bits={dt.bbits} "
          f"({build_s:.1f}s)", flush=True)

    lineages = np.zeros((ntgt, 21), np.int32)
    lineages[:, 0] = -np.arange(ntgt) - 1
    lineages[:, 4] = np.arange(ntgt) + 100
    lineages[:, 20] = 1
    merge_tax = lineages[:, 0].copy()
    mt = jnp.asarray(merge_tax)
    lg = jnp.asarray(lineages)

    gsel = rng.integers(0, ntgt, B)
    pos = rng.integers(0, GLEN - RLEN, B)
    wins = np.full((B, 1, opt.winlen), 4, np.uint8)
    for i in range(B):
        rd = genomes[gsel[i]][pos[i]:pos[i] + RLEN].copy()
        nm = rng.poisson(RLEN / 100)
        if nm:
            mp = rng.integers(0, RLEN, nm)
            rd[mp] = rng.integers(0, 4, nm, dtype=np.uint8)
        wins[i, 0, :RLEN] = rd
    valid = np.full((B, 1), RLEN, np.int32)
    mwir = np.full(B, 2, np.int32)
    use_pallas = jax.devices()[0].platform not in ("cpu",)
    if dt.dense:
        dense = (f"pk{dt.slot_bits}" + ("p" if dt.packed else "")) \
            if dt.slot_bits else ("packed" if dt.packed else True)
    elif getattr(dt, "classed", False):
        dense = ("classed", dt.head_slots, False, dt.ovf_packed,
                 dt.slot_bits)
    else:
        dense = ("two_tier", dt.head_slots, dt.packed, dt.ovf_packed,
                 dt.slot_bits)
    spf, bbits = dt.spf, dt.bbits
    from metacache_tpu.ops.rows import query_step_rows_scan

    def query_scan(wk, vk, mk, tf, to, la, lb, ps, mt, lg):
        return query_step_rows_scan(
            wk, vk, mk, tf, to, la, lb, mt, lg,
            jnp.int32(5), jnp.float32(1.0), jnp.int32(19),
            jnp.int32(0), ps,
            k=opt.kmerlen, sketchlen=opt.sketchlen,
            slots_per_feature=spf, windows_per_query=1,
            max_candidates=2, prefix_bits=bbits, prefix_steps=0,
            dense=dense, use_pallas_sketch=use_pallas,
            walk_elems=2 * opt.sketchlen, fast_top2=True,
            fused_candidates=use_pallas, pack_bits=dt.slot_bits,
            prefetch=bool(dt.dense))

    wk = jnp.asarray(np.broadcast_to(
        wins[None], (SCAN_K,) + wins.shape).copy())
    vk = jnp.asarray(np.broadcast_to(
        valid[None], (SCAN_K,) + valid.shape).copy())
    mk = jnp.asarray(np.broadcast_to(
        mwir[None], (SCAN_K,) + mwir.shape).copy())
    targs = (dt.uniq, dt.offsets, dt.head, dt.ovf, dt.brows, mt, lg)

    t0 = time.time()
    cls = np.asarray(query_scan(wk, vk, mk, *targs))
    print(f"compile+first run {time.time()-t0:.1f}s", flush=True)
    frac = float((cls[0] != 0).mean())
    correct = float((cls[0] == merge_tax[gsel]).mean())
    print(f"classified={frac:.4f} correct-target={correct:.4f}",
          flush=True)

    it = 4
    t0 = time.time()
    prev = None
    for _ in range(it):
        r = query_scan(wk, vk, mk, *targs)
        if prev is not None:
            np.asarray(prev)
        prev = r
    np.asarray(prev)
    dt_s = (time.time() - t0) / (it * SCAN_K)
    print(f"query: {dt_s*1000:.2f} ms/batch -> "
          f"{B/dt_s*60/1e6:.1f}M reads/min", flush=True)


if __name__ == "__main__":
    main()
