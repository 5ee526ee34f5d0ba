#!/usr/bin/env python
"""In-situ deep-DB (944 Mbp) component decomposition on the real chip.

Builds the bench's RefSeq-skew DB on device, then times the production
query path and ablations:
  full / no-kernel (probe only) / head-only probe / bucket-rows only /
  sketch only — each as the same lax.scan protocol as bench.py.
"""
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.abspath(__file__)) + "/..")

from metacache_tpu.utils.platform import force_platform  # noqa: E402

force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SCAN_K = 16
B = 8192
READ_LEN = 100


def timed(fn, *args, it=3):
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    prev = None
    for _ in range(it):
        r = fn(*args)
        if prev is not None:
            np.asarray(jax.tree_util.tree_leaves(prev)[0])
        prev = r
    np.asarray(jax.tree_util.tree_leaves(prev)[0])
    return (time.time() - t0) / (it * SCAN_K) * 1000


def main():
    sys.path.insert(0, "/root/repo")
    from bench import make_strain_genomes, build_db, dense_tag
    from metacache_tpu.config import SketchingOptions
    from metacache_tpu.ops.rows import (_sketch_dispatch, probe_rows,
                                        rows_to_result, _alt_runs)

    rng = np.random.default_rng(42)
    opt = SketchingOptions().resolved()
    GLEN = 1_000_000
    genomes, species = make_strain_genomes(
        rng, [(64, 1, 0.0), (12, 52, 0.003), (1, 256, 0.003)], GLEN)
    t0 = time.time()
    dt, _ = build_db(genomes, opt)
    print(f"build: {time.time()-t0:.1f}s nf={dt.nf} spf={dt.spf} "
          f"head={dt.head_slots} max_win={dt.max_win} "
          f"layout={dt.layout_bytes/2**30:.2f}GiB", flush=True)
    ntgt = len(genomes)
    spf, bbits = dt.spf, dt.bbits
    dense = dense_tag(dt)
    maxwin = int(dt.max_win)
    wbits = max(1, (2 * maxwin).bit_length())
    print(f"wbits={wbits} pkmax={((ntgt-1)<<wbits)|maxwin}", flush=True)

    lin = np.zeros((ntgt, 21), np.int32)
    lin[:, 0] = -np.arange(ntgt) - 1
    lin[:, 4] = species + 100
    lin[:, 20] = 1
    mt, lg = jnp.asarray(lin[:, 0].copy()), jnp.asarray(lin)

    rng2 = np.random.default_rng(7)
    gsel = rng2.integers(0, ntgt, B)
    pos = rng2.integers(0, GLEN - READ_LEN, B)
    wins = np.full((B, 1, opt.winlen), 4, np.uint8)
    for i in range(B):
        rd = genomes[gsel[i]][pos[i]:pos[i] + READ_LEN].copy()
        wins[i, 0, :READ_LEN] = rd
    valid = np.full((B, 1), READ_LEN, np.int32)
    mwir = np.full(B, 2, np.int32)
    del genomes

    wk = jnp.asarray(np.broadcast_to(
        wins[None], (SCAN_K,) + wins.shape).copy())
    vk = jnp.asarray(np.broadcast_to(
        valid[None], (SCAN_K,) + valid.shape).copy())
    mk = jnp.asarray(np.broadcast_to(
        mwir[None], (SCAN_K,) + mwir.shape).copy())
    targs = (dt.uniq, dt.offsets, dt.head, dt.ovf, dt.brows)

    def make(mode, pack):
        @jax.jit
        def fn(wk, vk, mk, tf, to, la, lb, ps):
            def body(c, xs):
                w, v, m = xs
                fx = _sketch_dispatch(w.reshape(B, opt.winlen),
                                      v.reshape(B), opt.kmerlen,
                                      opt.sketchlen, True)
                if mode == "sketch":
                    return c, fx.sum(axis=1).astype(jnp.int32)
                feats = fx.reshape(B, opt.sketchlen)
                if mode == "brows":
                    from metacache_tpu.ops.probe import probe_bucket
                    idx, found = probe_bucket(feats.reshape(-1), ps,
                                              bbits)
                    return c, (idx.reshape(B, -1).sum(axis=1) +
                               found.reshape(B, -1).sum(axis=1))
                alt = _alt_runs(True, True, 2 * opt.sketchlen, 0,
                                opt.sketchlen, spf)
                if mode == "headonly":
                    d2 = ("two_tier", dt.head_slots, dense[2],
                          dense[3])
                    # replace overflow with a 1-row dummy: same code,
                    # no big-table gather
                    tt, wn = probe_rows(feats, tf, to, la,
                                        lb[:1], spf, ps, bbits, 0,
                                        dense=d2, alt_runs=alt,
                                        pack_bits=pack)
                    return c, tt.sum(axis=1)
                tt, wn = probe_rows(feats, tf, to, la, lb, spf, ps,
                                    bbits, 0, dense=dense,
                                    alt_runs=alt, pack_bits=pack)
                if mode == "probe":
                    return c, tt.sum(axis=1)
                res = rows_to_result(
                    tt, wn, m, mt, lg, jnp.int32(5), jnp.float32(1.0),
                    jnp.int32(19), jnp.int32(0), max_candidates=2,
                    walk_elems=2 * opt.sketchlen, fast_top2=True,
                    fused_candidates=True, emit_hits=False,
                    presorted_runs=alt, pack_bits=pack)
                return c, res.cls_tax
            return jax.lax.scan(body, 0, (wk, vk, mk))[1]
        return fn

    for mode, pack in (("full", wbits), ("full", 0), ("probe", wbits),
                       ("headonly", wbits), ("brows", 0),
                       ("sketch", 0)):
        ms = timed(make(mode, pack), wk, vk, mk, *targs)
        print(f"{mode:9s} pack={pack:2d}: {ms:7.3f} ms/batch",
              flush=True)


if __name__ == "__main__":
    main()
