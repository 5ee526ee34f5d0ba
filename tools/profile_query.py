#!/usr/bin/env python
"""Stage-by-stage device timing of the short-read query step on the real
chip. Builds the bench DB (64x1Mbp strains), then times jitted prefixes
of the pipeline: sketch | +probe | +sort | +sweep | full, each under the
same lax.scan infeed shape bench.py uses. Marginal deltas locate the
bottleneck honestly (every variant fetches its result bytes)."""
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.abspath(__file__)) + "/..")

from metacache_tpu.utils.platform import force_platform  # noqa: E402

force_platform()
import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metacache_tpu.config import SketchingOptions  # noqa: E402
from metacache_tpu.db.sketch_exec import SketchAccumulator  # noqa: E402
from metacache_tpu.ops import windows as W  # noqa: E402
from metacache_tpu.ops.probe import make_bucket_index  # noqa: E402
from metacache_tpu.ops.rows import (_sketch_dispatch, probe_rows,  # noqa: E402
                                    rows_to_result)
from metacache_tpu.ops.table import FeatureTable  # noqa: E402

import os  # noqa: E402

SCAN_K = int(os.environ.get("MC_PROF_SCANK", "16"))
B = int(os.environ.get("MC_PROF_B", "8192"))
UNROLL = int(os.environ.get("MC_PROF_UNROLL", "1"))
NUM_BASE, STRAINS, GLEN, RLEN = 16, 4, 1_000_000, 100


def main():
    rng = np.random.default_rng(42)
    opt = SketchingOptions().resolved()
    genomes = []
    for b in range(NUM_BASE):
        base = rng.integers(0, 4, GLEN, dtype=np.uint8)
        for s in range(STRAINS):
            g = base.copy()
            if s:
                pos = rng.integers(0, GLEN, GLEN // 100)
                g[pos] = rng.integers(0, 4, GLEN // 100, dtype=np.uint8)
            genomes.append(g)
    t0 = time.time()
    cache = "/tmp/mc_prof_db.npz"
    if __import__("os").path.exists(cache):
        z = np.load(cache)
        bf, bl = z["bf"], z["bl"]
    else:
        acc = SketchAccumulator(opt.kmerlen, opt.sketchlen)
        for tid, g in enumerate(genomes):
            wm, vl = W.sequence_windows(g, opt)
            acc.add_target(wm, vl, tid)
        bf, bl = acc.finish()
        np.savez(cache, bf=bf, bl=bl)
    ft = FeatureTable.build(bf, bl, presorted_within_feature=True)
    print(f"build {time.time()-t0:.1f}s  F={ft.num_features} "
          f"L={ft.num_locations} maxb={ft.max_bucket_size}", flush=True)

    spf = min(ft.max_bucket_size, 255)
    ntgt = len(genomes)
    lineages = np.zeros((ntgt, 21), np.int32)
    lineages[:, 0] = -np.arange(ntgt) - 1
    lineages[:, 4] = np.arange(ntgt) // STRAINS + 100
    lineages[:, 20] = 1
    merge_tax = lineages[:, 0].copy()

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

    brows, bbits = make_bucket_index(ft.unique_features)
    fused = ft.fused_rows(spf)
    use_pallas = jax.devices()[0].platform not in ("cpu",)

    tf = jnp.asarray(ft.unique_features)
    to = jnp.asarray(ft.offsets.astype(np.int32))
    la = jnp.asarray(fused)
    lb = jnp.asarray(np.zeros((1,), np.int32))
    ps = jnp.asarray(brows)
    mt = jnp.asarray(merge_tax)
    lg = jnp.asarray(lineages)

    def stage_fn(stage):
        @functools.partial(jax.jit, static_argnames=())
        def f(wk, vk, mk, tf, to, la, lb, ps, mt, lg):
            def body(c, xs):
                w, v, m = xs
                feats = _sketch_dispatch(w.reshape(B, opt.winlen),
                                         v.reshape(B), opt.kmerlen,
                                         opt.sketchlen, use_pallas)
                if stage == "sketch":
                    return c, feats.sum(axis=1).astype(jnp.int32)
                t, wn = probe_rows(feats.reshape(B, opt.sketchlen), tf, to,
                                   la, lb, spf, ps, bbits, 0, dense=True)
                if stage == "probe":
                    return c, (t.min(axis=1) + wn.min(axis=1))
                res = rows_to_result(
                    t, wn, m, mt, lg, jnp.int32(5), jnp.float32(1.0),
                    jnp.int32(19), jnp.int32(0), max_candidates=2,
                    walk_elems=2 * opt.sketchlen,
                    fast_top2=(stage == "full_fast"))
                return c, res.cls_tax
            _, out = jax.lax.scan(body, 0, (wk, vk, mk),
                                  unroll=UNROLL)
            return out
        return lambda wk, vk, mk: f(wk, vk, mk, tf, to, la, lb, ps,
                                    mt, lg)

    wk = jnp.asarray(np.broadcast_to(wins[None],
                                     (SCAN_K,) + wins.shape).copy())
    vk = jnp.asarray(np.broadcast_to(valid[None],
                                     (SCAN_K,) + valid.shape).copy())
    mk = jnp.asarray(np.broadcast_to(mwir[None],
                                     (SCAN_K,) + mwir.shape).copy())

    prev_ms = 0.0
    for stage in ("sketch", "probe", "full", "full_fast"):
        f = stage_fn(stage)
        np.asarray(f(wk, vk, mk))          # compile + warm
        np.asarray(f(wk, vk, mk))
        t0 = time.time()
        it = 6
        prev = None
        for _ in range(it):
            r = f(wk, vk, mk)
            if prev is not None:
                np.asarray(prev)
            prev = r
        np.asarray(prev)
        ms = (time.time() - t0) / (it * SCAN_K) * 1000
        print(f"{stage:10s} {ms:7.3f} ms/batch  (marginal "
              f"{ms - prev_ms:+7.3f})", flush=True)
        if stage != "full":
            prev_ms = ms


if __name__ == "__main__":
    main()
