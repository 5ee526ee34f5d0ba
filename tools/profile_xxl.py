#!/usr/bin/env python
"""XXL single-chip capacity proof rehearsal: ~2.7 Gbp strain-skewed
database (~3 GiB of locations) built with the bounded-memory grouped
device build (ops.table_device.build_device_table_chunked) under the
size-classed head layout, then the deep-bucket query step — all on the
real chip. Prints per-stage timings and the device's peak-bytes-in-use
after each stage so the build's transient memory is a measured number.

Spec (MC_XXL_SPEC picks): 0 = round-4 primary XXL spec, 1 = fallback.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

from metacache_tpu.utils.platform import force_platform  # noqa: E402

os.environ.setdefault("MC_CLASSED", "1")
force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metacache_tpu.config import SketchingOptions  # noqa: E402
from metacache_tpu.db.sketch_exec import DeviceSketchAccumulator  # noqa: E402
from metacache_tpu.ops import windows as W  # noqa: E402
from metacache_tpu.ops.table_device import (  # noqa: E402
    build_device_table_chunked)

GLEN = 1_000_000
SPECS = [
    [(96, 1, 0.0), (36, 52, 0.003), (3, 256, 0.003)],
    [(76, 1, 0.0), (22, 52, 0.003), (2, 256, 0.003)],
]
RLEN = 100
B = 8192
SCAN_K = int(os.environ.get("MC_PROF_SCANK", "16"))


def mem(tag):
    try:
        st = jax.devices()[0].memory_stats()
        print(f"  [mem {tag}] in_use={st.get('bytes_in_use', 0)/2**30:.2f} "
              f"GiB peak={st.get('peak_bytes_in_use', 0)/2**30:.2f} GiB",
              flush=True)
    except Exception as e:
        print(f"  [mem {tag}] unavailable: {e}", flush=True)


def gen_genomes(rng, spec):
    out, species = [], []
    sp = 0
    for bases, strains, mut in spec:
        for b in range(bases):
            base = rng.integers(0, 4, GLEN, dtype=np.uint8)
            for s in range(strains):
                g = base if s == 0 else base.copy()
                if s and mut:
                    nmut = int(GLEN * mut)
                    pos = rng.integers(0, GLEN, nmut)
                    g[pos] = rng.integers(0, 4, nmut, dtype=np.uint8)
                out.append(g)
                species.append(sp)
            sp += 1
    return out, np.asarray(species, np.int32)


def main():
    spec = SPECS[int(os.environ.get("MC_XXL_SPEC", "0"))]
    rng = np.random.default_rng(42)
    opt = SketchingOptions().resolved()
    t0 = time.time()
    genomes, species = gen_genomes(rng, spec)
    ntgt = len(genomes)
    print(f"genomes: {ntgt} x 1 Mbp ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    acc = DeviceSketchAccumulator(opt.kmerlen, opt.sketchlen)
    for tid, g in enumerate(genomes):
        wm, vl = W.sequence_windows(g, opt)
        acc.add_target(wm, vl, tid)
    chunks = acc.finish_chunks()
    nel = sum(int(c[0].shape[0]) for c in chunks)
    print(f"device sketch: {nel/1e6:.1f}M stream elements in "
          f"{len(chunks)} chunks ({time.time()-t0:.1f}s)", flush=True)
    mem("sketch")

    t0 = time.time()
    dt = build_device_table_chunked(chunks, cap=254)
    del chunks
    print(f"device table: F={dt.nf/1e6:.2f}M "
          f"L={dt.num_locations/1e6:.1f}M "
          f"({dt.num_locations*8/2**30:.2f} GiB of locations) "
          f"spf={dt.spf} head={dt.head_slots} bits={dt.bbits} "
          f"classed={dt.classed} layout={dt.layout_bytes/2**30:.2f} GiB "
          f"B/B={dt.layout_bytes/(dt.num_locations*8):.2f} "
          f"({time.time()-t0:.1f}s)", flush=True)
    mem("build")

    # query loop (the production scan step)
    from metacache_tpu.ops.rows import query_step_rows_scan
    lineages = np.zeros((ntgt, 21), np.int32)
    lineages[:, 0] = -np.arange(ntgt) - 1
    lineages[:, 4] = species + 100
    lineages[:, 20] = 1
    mt = jnp.asarray(lineages[:, 0].copy())
    lg = jnp.asarray(lineages)
    gsel = rng.integers(0, ntgt, B)
    pos = rng.integers(0, GLEN - RLEN, B)
    wins = np.full((B, 1, opt.winlen), 4, np.uint8)
    for i in range(B):
        wins[i, 0, :RLEN] = genomes[gsel[i]][pos[i]:pos[i] + RLEN]
    valid = np.full((B, 1), RLEN, np.int32)
    mwir = np.full(B, 2, np.int32)
    del genomes

    dense = (("classed", dt.head_slots, False, dt.ovf_packed,
              dt.slot_bits) if dt.classed else
             ("two_tier", dt.head_slots, dt.packed, dt.ovf_packed,
              dt.slot_bits))
    if dt.dense:
        dense = True

    def query_scan(wk, vk, mk):
        return query_step_rows_scan(
            wk, vk, mk, dt.uniq, dt.offsets, dt.head, dt.ovf, mt, lg,
            jnp.int32(5), jnp.float32(1.0), jnp.int32(19),
            jnp.int32(0), dt.brows,
            k=opt.kmerlen, sketchlen=opt.sketchlen,
            slots_per_feature=dt.spf, windows_per_query=1,
            max_candidates=2, prefix_bits=dt.bbits, prefix_steps=0,
            dense=dense, use_pallas_sketch=True,
            walk_elems=2 * opt.sketchlen, fast_top2=True,
            fused_candidates=True, pack_bits=dt.slot_bits,
            prefetch=False)

    wk = jnp.asarray(np.broadcast_to(
        wins[None], (SCAN_K,) + wins.shape).copy())
    vk = jnp.asarray(np.broadcast_to(
        valid[None], (SCAN_K,) + valid.shape).copy())
    mk = jnp.asarray(np.broadcast_to(
        mwir[None], (SCAN_K,) + mwir.shape).copy())
    t0 = time.time()
    cls = np.asarray(query_scan(wk, vk, mk))
    print(f"query compile+first: {time.time()-t0:.1f}s "
          f"classified={float((cls[0] != 0).mean()):.4f}", flush=True)
    mem("query")
    np.asarray(query_scan(wk, vk, mk))
    t0 = time.time()
    it = 3
    prev = None
    for _ in range(it):
        r = query_scan(wk, vk, mk)
        if prev is not None:
            np.asarray(prev)
        prev = r
    np.asarray(prev)
    dt_s = (time.time() - t0) / (it * SCAN_K)
    print(f"query: {dt_s*1000:.3f} ms/batch = "
          f"{B/dt_s*60/1e6:.1f}M reads/min", flush=True)
    mem("final")


if __name__ == "__main__":
    main()
