#!/usr/bin/env python
"""Deep-bucket (944 Mbp, spf 254) A/B matrix toward the 60M goal:
fused-vs-separate escalation, split candidates kernel at L=4096,
SCAN_K. Reuses the bench DB spec; prints one line per combo.
Run serialized with other chip jobs."""
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
    print(f"build {time.time()-t0:.1f}s F={dt.nf/1e6:.2f}M spf={dt.spf}"
          f" head={dt.head_slots} classed={dt.classed}", flush=True)

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
    del genomes
    if dt.dense:
        dense = f"pk{dt.slot_bits}" + ("p" if dt.packed else "")
    elif dt.classed:
        dense = ("classed", dt.head_slots, False, dt.ovf_packed,
                 dt.slot_bits)
    else:
        dense = ("two_tier", dt.head_slots, dt.packed, dt.ovf_packed,
                 dt.slot_bits)

    from metacache_tpu.ops.rows import (query_step_rows_scan,
                                        query_step_rows_scan_head,
                                        query_step_rows_redo_scan,
                                        query_step_rows_scan_head_fused)

    def stacks(scan_k):
        wk = jnp.asarray(np.broadcast_to(
            wins[None], (scan_k,) + wins.shape).copy())
        vk = jnp.asarray(np.broadcast_to(
            valid[None], (scan_k,) + valid.shape).copy())
        mk = jnp.asarray(np.broadcast_to(
            mwir[None], (scan_k,) + mwir.shape).copy())
        return wk, vk, mk

    def timeit(fn, first, scan_k, iters=4):
        np.asarray(first(fn()))
        np.asarray(first(fn()))
        t0 = time.time()
        prev = None
        for _ in range(iters):
            r = fn()
            if prev is not None:
                np.asarray(first(prev))
            prev = r
        np.asarray(first(prev))
        return (time.time() - t0) / (iters * scan_k)

    common = dict(k=opt.kmerlen, sketchlen=opt.sketchlen,
                  slots_per_feature=dt.spf, max_candidates=2,
                  prefix_bits=dt.bbits, dense=dense,
                  walk_elems=2 * opt.sketchlen,
                  fused_candidates=True, pack_bits=dt.slot_bits)

    if os.environ.get("MC_DEEP_AB_QUICK") == "1":
        matrix = [(128, "1")]
    else:
        matrix = [(sk_, sp_) for sk_ in (64, 128)
                  for sp_ in ("0", "1")]
    for scan_k, split in matrix:
        if True:
            os.environ["MC_SPLIT_CAND"] = split
            jax.clear_caches()
            wk, vk, mk = stacks(scan_k)

            def full():
                return query_step_rows_scan(
                    wk, vk, mk, dt.uniq, dt.offsets, dt.head, dt.ovf,
                    mt, lg, jnp.int32(5), jnp.float32(1.0),
                    jnp.int32(19), jnp.int32(0), dt.brows,
                    windows_per_query=1, prefix_steps=0,
                    use_pallas_sketch=True, fast_top2=True,
                    prefetch=False, **common)
            tf_ = timeit(full, lambda r: r, scan_k)
            print(f"full scan_k={scan_k} split={split}: "
                  f"{tf_*1000:.3f} ms/batch = "
                  f"{B/tf_*60/1e6:.1f}M reads/min", flush=True)

            def head():
                return query_step_rows_scan_head(
                    wk, vk, mk, dt.uniq, dt.offsets, dt.head, dt.ovf,
                    mt, lg, jnp.int32(5), jnp.float32(1.0),
                    jnp.int32(19), jnp.int32(0), dt.brows,
                    use_pallas_sketch=True, prefetch=True,
                    return_feats=True, **common)
            th = timeit(head, lambda r: r[0], scan_k)
            cls1, over, fk, ik = head()
            nb = np.asarray(over).view(np.uint32)
            mask = np.unpackbits(nb.view(np.uint8),
                                 bitorder="little").astype(bool)
            frac = float(mask.sum() / (scan_k * B))
            idxs = np.nonzero(mask)[0]
            if len(idxs) == 0:
                idxs = np.arange(B)
            sel = np.resize(idxs, scan_k * B).astype(np.int32)
            F = fk.shape[-1]
            fsel = fk.reshape(-1, F)[sel].reshape(scan_k, B, F)
            isel = ik.reshape(-1, F)[sel].reshape(scan_k, B, F)
            msel = mk.reshape(-1)[sel].reshape(scan_k, B)

            def redo():
                return query_step_rows_redo_scan(
                    fsel, isel, msel, dt.uniq, dt.offsets, dt.head,
                    dt.ovf, mt, lg, jnp.int32(5), jnp.float32(1.0),
                    jnp.int32(19), jnp.int32(0),
                    sketchlen=opt.sketchlen,
                    slots_per_feature=dt.spf, max_candidates=2,
                    prefix_bits=dt.bbits, dense=dense,
                    walk_elems=2 * opt.sketchlen,
                    fused_candidates=True, pack_bits=dt.slot_bits)
            tr = timeit(redo, lambda r: r, scan_k)
            eff = th + frac * tr
            print(f"esc scan_k={scan_k} split={split}: phase1 "
                  f"{th*1000:.3f} redo {tr*1000:.3f} frac {frac:.3f} "
                  f"eff {eff*1000:.3f} ms = {B/eff*60/1e6:.1f}M",
                  flush=True)
            b2 = max(256, -(-int(np.ceil(frac * B)) // 256) * 256)
            sel2 = np.resize(idxs, scan_k * b2).astype(np.int32)
            rfs = fk.reshape(-1, F)[sel2].reshape(scan_k, b2, F)
            ris = ik.reshape(-1, F)[sel2].reshape(scan_k, b2, F)
            rms = mk.reshape(-1)[sel2].reshape(scan_k, b2)

            def fused():
                return query_step_rows_scan_head_fused(
                    wk, vk, mk, rfs, ris, rms, dt.uniq, dt.offsets,
                    dt.head, dt.ovf, mt, lg, jnp.int32(5),
                    jnp.float32(1.0), jnp.int32(19), jnp.int32(0),
                    dt.brows, use_pallas_sketch=True, **common)
            tfu = timeit(fused, lambda r: r[0], scan_k)
            print(f"fused scan_k={scan_k} split={split}: "
                  f"{tfu*1000:.3f} ms = {B/tfu*60/1e6:.1f}M",
                  flush=True)


if __name__ == "__main__":
    main()
