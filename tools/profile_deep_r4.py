#!/usr/bin/env python
"""Round-4 deep-DB profile: escalation phases, redo reuse, classed
layout A/B, and the gather/VPU overlap question.

Sections (each prints one line; run on the real chip):
  1. build the 944 Mbp RefSeq-skew DB twice (MC_CLASSED=0/1) — layout
     bytes + phase timings for each
  2. phase1 / redo / full step timings -> effective reads/min
  3. gather-vs-VPU overlap microbenchmark (decides whether the in-scan
     fused escalation is worth building: if gathers overlap VPU work,
     interleaving phase-2 sorts under phase-1 gathers hides them)

Usage: python tools/profile_deep_r4.py [small|big] [classed01]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SMALL = len(sys.argv) > 1 and sys.argv[1] == "small"


def main():
    from metacache_tpu.utils.platform import force_platform
    force_platform()
    import jax
    import jax.numpy as jnp
    import bench as BM
    from metacache_tpu.config import SketchingOptions

    opt = SketchingOptions().resolved()
    use_pallas = jax.devices()[0].platform not in ("cpu",)
    rng = np.random.default_rng(42)
    spec = [(8, 1, 0.0), (2, 52, 0.003), (1, 64, 0.003)] if SMALL else \
        [(64, 1, 0.0), (12, 52, 0.003), (1, 256, 0.003)]
    glen = 200_000 if SMALL else 1_000_000
    genomes, species = BM.make_strain_genomes(rng, spec, glen)

    which = sys.argv[2] if len(sys.argv) > 2 else "01"
    for classed in ([False, True] if which == "01" else
                    [which == "1"]):
        os.environ["MC_CLASSED"] = "1" if classed else "0"
        t0 = time.time()
        dt, build_s = BM.build_db(genomes, opt)
        print(f"classed={classed}: layout="
              f"{'classed' if dt.classed else f'two_tier({dt.head_slots})'}"
              f" layout_gib={dt.layout_bytes / 2**30:.2f}"
              f" brows_gib={int(np.prod(dt.brows.shape)) * 4 / 2**30:.2f}"
              f" build_s={build_s:.1f}", flush=True)
        BM.ITERS = 4
        res = None
        try:
            # reuse bench.measure via its module-level main()? measure is
            # a closure — re-time the scan steps directly instead
            res = measure_steps(dt, genomes, species, glen, opt,
                                use_pallas)
        finally:
            del dt
        print(f"classed={classed}: {res}", flush=True)

    overlap_test()


def measure_steps(dt, genomes, species, glen, opt, use_pallas):
    import jax.numpy as jnp
    import bench as BM
    from metacache_tpu.ops.rows import (query_step_rows_scan,
                                        query_step_rows_scan_head,
                                        query_step_rows_redo_scan)
    B, K = BM.BATCH_READS, 16
    rng2 = np.random.default_rng(7)
    ntgt = len(genomes)
    lineages = np.zeros((ntgt, 21), np.int32)
    lineages[:, 0] = -np.arange(ntgt) - 1
    lineages[:, 4] = species + 100
    lineages[:, 20] = 1
    mt, lg = jnp.asarray(lineages[:, 0].copy()), jnp.asarray(lineages)
    gsel = rng2.integers(0, ntgt, B)
    pos = rng2.integers(0, glen - 100, B)
    wins = np.full((B, 1, opt.winlen), 4, np.uint8)
    for i in range(B):
        wins[i, 0, :100] = genomes[gsel[i]][pos[i]:pos[i] + 100]
    wk = jnp.asarray(np.broadcast_to(
        wins[None], (K,) + wins.shape).copy())
    vk = jnp.asarray(np.broadcast_to(
        np.full((B, 1), 100, np.int32)[None], (K, B, 1)).copy())
    mk = jnp.asarray(np.full((K, B), 2, np.int32))
    dense = BM.dense_tag(dt)
    spf, bbits, pkb = dt.spf, dt.bbits, dt.slot_bits
    targs = (dt.uniq, dt.offsets, dt.head, dt.ovf, dt.brows, mt, lg)
    kw = dict(k=opt.kmerlen, sketchlen=opt.sketchlen,
              slots_per_feature=spf, max_candidates=2,
              prefix_bits=bbits, dense=dense,
              walk_elems=2 * opt.sketchlen,
              fused_candidates=use_pallas, pack_bits=pkb)

    def t(fn, *args, iters=4, barrier=lambda r: r):
        np.asarray(barrier(fn(*args)))
        t0 = time.time()
        prev = None
        for _ in range(iters):
            r = fn(*args)
            if prev is not None:
                np.asarray(barrier(prev))
            prev = r
        np.asarray(barrier(prev))
        return (time.time() - t0) / (iters * K) * 1000

    def full(wk, vk, mk, *ta):
        return query_step_rows_scan(
            wk, vk, mk, *ta[:4], ta[5], ta[6],
            jnp.int32(5), jnp.float32(1.0), jnp.int32(19), jnp.int32(0),
            ta[4], windows_per_query=1, prefix_steps=0,
            use_pallas_sketch=use_pallas, fast_top2=True,
            prefetch=True, **kw)

    def head(wk, vk, mk, *ta):
        return query_step_rows_scan_head(
            wk, vk, mk, *ta[:4], ta[5], ta[6],
            jnp.int32(5), jnp.float32(1.0), jnp.int32(19), jnp.int32(0),
            ta[4], use_pallas_sketch=use_pallas, fast_top2=True,
            prefetch=True, return_feats=True, **kw)

    full_ms = t(full, wk, vk, mk, *targs)
    if not isinstance(dense, tuple):
        return f"full={full_ms:.2f}ms (dense layout; no escalation)"
    cls1, over, fk, ik = head(wk, vk, mk, *targs)
    nb = np.asarray(over).view(np.uint32)
    mask = np.unpackbits(nb.view(np.uint8), bitorder="little") \
        .astype(bool)
    frac = float(mask.mean())
    head_ms = t(head, wk, vk, mk, *targs, barrier=lambda r: r[0])

    idxs = np.nonzero(mask)[0]
    if len(idxs) == 0:
        idxs = np.arange(B)
    sel = jnp.asarray(np.resize(idxs, K * B).astype(np.int32))
    F = fk.shape[-1]
    fsel = fk.reshape(-1, F)[sel].reshape(K, B, F)
    isel = ik.reshape(-1, F)[sel].reshape(K, B, F)
    msel = mk.reshape(-1)[sel].reshape(K, B)
    kw_redo = {k: v for k, v in kw.items() if k != "k"}

    def redo(fs, is_, ms, *ta):
        return query_step_rows_redo_scan(
            fs, is_, ms, *ta[:4], ta[5], ta[6],
            jnp.int32(5), jnp.float32(1.0), jnp.int32(19), jnp.int32(0),
            **kw_redo)

    redo_ms = t(redo, fsel, isel, msel, *targs)
    eff = head_ms + frac * redo_ms

    # fused dispatch: phase 1 of batch i + redo of a frac*B slice in
    # ONE scan iteration (can the scheduler hide the redo's VPU sort
    # under phase 1's gathers?)
    from metacache_tpu.ops.rows import query_step_rows_scan_head_fused
    b2 = max(256, -(-int(np.ceil(frac * B)) // 256) * 256)
    sel2 = jnp.asarray(np.resize(idxs, K * b2).astype(np.int32))
    rfs = fk.reshape(-1, F)[sel2].reshape(K, b2, F)
    ris = ik.reshape(-1, F)[sel2].reshape(K, b2, F)
    rms = mk.reshape(-1)[sel2].reshape(K, b2)
    kw_f = {kk2: v for kk2, v in kw.items()
            if kk2 not in ("prefix_steps",)}

    def fused(wk, vk, mk_, rf, ri, rm, *ta):
        return query_step_rows_scan_head_fused(
            wk, vk, mk_, rf, ri, rm, *ta[:4], ta[5], ta[6],
            jnp.int32(5), jnp.float32(1.0), jnp.int32(19), jnp.int32(0),
            ta[4], use_pallas_sketch=use_pallas, fast_top2=True,
            **kw_f)

    fused_ms = t(fused, wk, vk, mk, rfs, ris, rms, *targs,
                 barrier=lambda r: r[0])
    # the fused step handles B fresh + b2 redo reads per iteration; in
    # steady state that covers B reads' full pipeline when b2>=frac*B
    return (f"full={full_ms:.2f}ms head={head_ms:.2f}ms "
            f"redo={redo_ms:.2f}ms frac={frac:.3f} "
            f"eff={eff:.2f}ms -> {8192 / eff * 1000 * 60 / 1e6:.1f}M | "
            f"fused(b2={b2})={fused_ms:.2f}ms -> "
            f"{8192 / fused_ms * 1000 * 60 / 1e6:.1f}M reads/min")


def overlap_test():
    import jax
    import jax.numpy as jnp
    R, N, W = 131072, 1 << 21, 128
    SB, SL, K = 8192, 1024, 16
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**31, (N, W), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, N, (R,), dtype=np.int32))
    mat = jnp.asarray(rng.integers(0, 2**31, (SB, SL), dtype=np.int32))

    def gw(t, ix, i):
        return t[(ix + i) % N].sum(dtype=jnp.int32)

    def vw(m, i):
        return jax.lax.sort(m ^ i, dimension=1)[:, 0].sum(dtype=jnp.int32)

    @jax.jit
    def g_only(t, ix):
        return jax.lax.fori_loop(
            0, K, lambda i, a: a + gw(t, ix, i), jnp.int32(0))

    @jax.jit
    def v_only(m):
        return jax.lax.fori_loop(
            0, K, lambda i, a: a + vw(m, i), jnp.int32(0))

    @jax.jit
    def both(t, ix, m):
        return jax.lax.fori_loop(
            0, K, lambda i, a: a + gw(t, ix, i) + vw(m, i), jnp.int32(0))

    def bench_fn(fn, *args, iters=6):
        np.asarray(fn(*args))
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out)
        return (time.time() - t0) / iters / K * 1000

    g = bench_fn(g_only, table, idx)
    v = bench_fn(v_only, mat)
    b = bench_fn(both, table, idx, mat)
    print(f"overlap: gather={g:.3f} vpu={v:.3f} both={b:.3f} "
          f"(sum={g + v:.3f}, max={max(g, v):.3f}) "
          f"overlap_frac={(g + v - b) / min(g, v) * 100:.0f}%",
          flush=True)


if __name__ == "__main__":
    main()
