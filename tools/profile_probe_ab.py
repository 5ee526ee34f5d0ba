#!/usr/bin/env python
"""A/B the Pallas probe-decode kernels (MC_PROBE_PALLAS) on the
deep-bucket DB (944 Mbp, spf 254). Builds the DB once, then toggles
the env var with jax.clear_caches() between passes — the gate is read
at trace time (ops/rows.py, ops/probe.py), so a retrace flips the
decode implementation while the gathered-row layouts stay identical.

Stages per pass (K-slope protocol, device-side reduction before every
fetch — see tools/profile_deep_decomp.py):
  probe_head   phase-1 probe (bucket + head gather + decode)
  redo_gather  full-depth probe (bucket + head + overflow + decode)
  head_step    production phase-1 step
  redo_step    production redo step
  fused_step   production fused escalation step (b2=2560)

Run serialized with other chip jobs; never kill mid-claim.
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
KSUB = 8


def mix(g):
    g = jax.lax.bitcast_convert_type(g.astype(jnp.int32), jnp.int32) \
        if g.dtype != jnp.int32 else g
    if g.ndim == 1:
        g = g[:, None]
    i = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    return jnp.sum(g ^ i, dtype=jnp.int32)


def scan_timed(name, body, xs, consts=(), iters=3):
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
    print(f"  {name:12s}: {t*1e3:7.3f} ms/batch "
          f"({B/t*60/1e6:7.1f}M reads/min-equiv)", flush=True)
    return t


def timeit_raw(name, fn, first, iters=3):
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
    print(f"  {name:12s}: {t*1e3:7.3f} ms/batch "
          f"({B/t*60/1e6:7.1f}M reads/min-equiv)", flush=True)
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
          f"spf={dt.spf} head={dt.head_slots} packed={dt.packed}",
          flush=True)

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
        _sketch_dispatch, probe_rows, probe_rows_head,
        query_step_rows_scan_head, query_step_rows_redo_scan,
        query_step_rows_scan_head_fused)
    from metacache_tpu.ops.probe import probe_bucket  # noqa: E402

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

    common = dict(k=opt.kmerlen, sketchlen=F, slots_per_feature=dt.spf,
                  max_candidates=2, prefix_bits=dt.bbits, dense=dense,
                  walk_elems=2 * F, fused_candidates=True,
                  pack_bits=dt.slot_bits)
    b2 = 2560
    rfs = fk[:, :b2]
    ris = ik[:, :b2]
    rms = mk[:, :b2]

    # semicolon-separated sweep, e.g. "0;head,full;1"
    modes = os.environ.get("MC_PROBE_AB_MODES", "0;head,full").split(";")
    quick = os.environ.get("MC_PROBE_AB_QUICK") == "1"
    for pp in modes:
        os.environ["MC_PROBE_PALLAS"] = pp
        jax.clear_caches()
        print(f"MC_PROBE_PALLAS={pp}", flush=True)

        def probe_head_full(x, c):
            head, brows = c
            f, i = x
            pk, over = probe_rows_head(
                f, head, brows, dt.bbits, dense,
                alt_runs=rl_head, pack_bits=dt.slot_bits,
                idx_pre=i.reshape(-1))
            return mix(pk) + mix(over.astype(jnp.int32))

        if not quick:
            scan_timed("probe_head", probe_head_full, (fk, ik),
                       (dt.head, dt.brows))

        def redo_gather(x, c):
            uniq, offsets, head, ovf = c
            f, i = x
            pk, _ = probe_rows(
                f, uniq, offsets, head, ovf, dt.spf,
                prefix_starts=None, prefix_bits=dt.bbits,
                dense=dense, alt_runs=rl_redo,
                pack_bits=dt.slot_bits, idx_pre=i.reshape(-1))
            return mix(pk)

        if not quick:
            scan_timed("redo_gather", redo_gather, (fk, ik),
                       (dt.uniq, dt.offsets, dt.head, dt.ovf))

        def head_step(kk):
            return query_step_rows_scan_head(
                wk[:kk], vk[:kk], mk[:kk], dt.uniq, dt.offsets,
                dt.head, dt.ovf, mt, lg, jnp.int32(5),
                jnp.float32(1.0), jnp.int32(19), jnp.int32(0),
                dt.brows, use_pallas_sketch=True, fast_top2=True,
                prefetch=True, return_feats=True, **common)

        th = timeit_raw("head_step", head_step, lambda r: r[0])

        def redo_step(kk):
            return query_step_rows_redo_scan(
                fk[:kk], ik[:kk], mk[:kk], dt.uniq, dt.offsets,
                dt.head, dt.ovf, mt, lg, jnp.int32(5),
                jnp.float32(1.0), jnp.int32(19), jnp.int32(0),
                sketchlen=F, slots_per_feature=dt.spf,
                max_candidates=2, prefix_bits=dt.bbits, dense=dense,
                walk_elems=2 * F, fused_candidates=True,
                pack_bits=dt.slot_bits)

        tr = timeit_raw("redo_step", redo_step, lambda r: r)

        def fused_step(kk):
            return query_step_rows_scan_head_fused(
                wk[:kk], vk[:kk], mk[:kk], rfs[:kk], ris[:kk],
                rms[:kk], dt.uniq, dt.offsets, dt.head, dt.ovf, mt,
                lg, jnp.int32(5), jnp.float32(1.0), jnp.int32(19),
                jnp.int32(0), dt.brows, use_pallas_sketch=True,
                **common)

        tf = timeit_raw("fused_step", fused_step, lambda r: r[0])
        frac = 0.31
        eff = th + frac * tr
        print(f"  eff(sep, frac=.31): {eff*1e3:.3f} ms = "
              f"{B/eff*60/1e6:.1f}M ; fused {tf*1e3:.3f} ms = "
              f"{B/tf*60/1e6:.1f}M", flush=True)


if __name__ == "__main__":
    main()
