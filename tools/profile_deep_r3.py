#!/usr/bin/env python
"""Round-3 deep-DB decomposition + escalation prototype on the chip.

Builds the bench's 944 Mbp RefSeq-skew DB on device, then times:
  full        — the production scan (probe + fused candidates)
  sketch      — sketch only
  probe       — sketch + both probe gathers (no candidates kernel)
  head        — sketch + HEAD-ONLY probe + candidates at L = f*64
                (escalation phase 1) and reports the overflow fraction
The escalation estimate = head + overflow_fraction * full.
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

SCAN_K = 64
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
    from bench import make_strain_genomes, build_db, dense_tag
    from metacache_tpu.config import SketchingOptions
    from metacache_tpu.ops.rows import (_sketch_dispatch, _alt_runs,
                                        probe_rows, rows_to_result)

    opt = SketchingOptions().resolved()
    rng = np.random.default_rng(42)
    GLEN = 1_000_000
    genomes, species = make_strain_genomes(
        rng, [(64, 1, 0.0), (12, 52, 0.003), (1, 256, 0.003)], GLEN)
    dt, secs = build_db(genomes, opt)
    print(f"build {secs:.0f}s layout={dense_tag(dt)} spf={dt.spf} "
          f"head={dt.head_slots} slot_bits={dt.slot_bits}", flush=True)

    ntgt = len(genomes)
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
        wins[i, 0, :READ_LEN] = genomes[gsel[i]][pos[i]:pos[i] + READ_LEN]
    valid = np.full((B, 1), READ_LEN, np.int32)
    mwir = np.full(B, 2, np.int32)
    wk = jnp.asarray(np.broadcast_to(wins[None],
                                     (SCAN_K,) + wins.shape).copy())
    vk = jnp.asarray(np.broadcast_to(valid[None],
                                     (SCAN_K,) + valid.shape).copy())
    mk = jnp.asarray(np.broadcast_to(mwir[None],
                                     (SCAN_K,) + mwir.shape).copy())

    spf, bbits = dt.spf, dt.bbits
    dense = dense_tag(dt)
    pkb = dt.slot_bits
    s = opt.sketchlen
    hsl = dt.head_slots

    def scan(body):
        @jax.jit
        def fn(wk, vk, mk, tf, to, la, lb, ps):
            return jax.lax.scan(
                lambda c, xs: (c, body(*xs, tf, to, la, lb, ps)),
                0, (wk, vk, mk))[1]
        return fn

    targs = (dt.uniq, dt.offsets, dt.head, dt.ovf, dt.brows)

    def full_body(w, v, m, tf, to, la, lb, ps):
        fx = _sketch_dispatch(w.reshape(B, opt.winlen), v.reshape(B),
                              opt.kmerlen, s, True)
        alt = _alt_runs(True, True, 2 * s, 0, s, spf)
        tt, wn = probe_rows(fx.reshape(B, s), tf, to, la, lb, spf, ps,
                            bbits, 0, dense=dense, alt_runs=alt,
                            pack_bits=pkb)
        res = rows_to_result(tt, wn, m, mt, lg, jnp.int32(5),
                             jnp.float32(1.0), jnp.int32(19),
                             jnp.int32(0), max_candidates=2,
                             walk_elems=2 * s, fast_top2=True,
                             fused_candidates=True, emit_hits=False,
                             presorted_runs=alt, pack_bits=pkb)
        return res.cls_tax

    def sketch_body(w, v, m, tf, to, la, lb, ps):
        fx = _sketch_dispatch(w.reshape(B, opt.winlen), v.reshape(B),
                              opt.kmerlen, s, True)
        return fx.reshape(B, s).sum(axis=1)

    def probe_body(w, v, m, tf, to, la, lb, ps):
        fx = _sketch_dispatch(w.reshape(B, opt.winlen), v.reshape(B),
                              opt.kmerlen, s, True)
        alt = _alt_runs(True, True, 2 * s, 0, s, spf)
        tt, wn = probe_rows(fx.reshape(B, s), tf, to, la, lb, spf, ps,
                            bbits, 0, dense=dense, alt_runs=alt,
                            pack_bits=pkb)
        return tt.sum(axis=1)

    def head_body(w, v, m, tf, to, la, lb, ps):
        # escalation phase 1: head-only probe (one head gather, no
        # overflow gather) + candidates over f*64 lanes; overflow flag
        fx = _sketch_dispatch(w.reshape(B, opt.winlen), v.reshape(B),
                              opt.kmerlen, s, True)
        flat = fx.reshape(B * s)
        from metacache_tpu.ops.probe import probe_bucket
        idx_c, found = probe_bucket(flat, ps, bbits)
        idx_c = jnp.clip(idx_c, 0, tf.shape[0] - 1)
        r2 = la[idx_c >> 1]
        rows = jnp.where((idx_c & 1)[:, None] == 1, r2[:, 64:],
                         r2[:, :64])
        flat_i32 = jax.lax.bitcast_convert_type(flat, jnp.int32)
        found = (rows[:, 0] == flat_i32) & \
            (flat != jnp.uint32(0xFFFFFFFF))
        cnt = jnp.where(found, rows[:, 1], 0)
        over = jnp.any((cnt > hsl).reshape(B, s), axis=1)
        j = jax.lax.broadcasted_iota(jnp.int32, (B * s, hsl), 1)
        hit = j < jnp.minimum(cnt, hsl)[:, None]
        pks = jnp.where(hit, rows[:, 3:3 + hsl], np.int32(2**31 - 1))
        rl = 64
        pks = jnp.concatenate(
            [pks, jnp.full((B * s, rl - hsl), np.int32(2**31 - 1),
                           jnp.int32)], axis=1)
        fidx = jax.lax.broadcasted_iota(jnp.int32, (B * s, 1), 0) % s
        pks = jnp.where((fidx & 1) == 1, jax.lax.rev(pks, (1,)), pks)
        pk = pks.reshape(B, s * rl)
        res = rows_to_result(pk, pk, m, mt, lg, jnp.int32(5),
                             jnp.float32(1.0), jnp.int32(19),
                             jnp.int32(0), max_candidates=2,
                             walk_elems=2 * s, fast_top2=True,
                             fused_candidates=True, emit_hits=False,
                             presorted_runs=rl, pack_bits=pkb)
        return res.cls_tax, over

    full = timed(scan(full_body), wk, vk, mk, *targs)
    sk_ms = timed(scan(sketch_body), wk, vk, mk, *targs)
    pr_ms = timed(scan(probe_body), wk, vk, mk, *targs)
    hd = scan(head_body)(wk, vk, mk, *targs)
    over_frac = float(np.asarray(hd[1]).mean())
    hd_ms = timed(scan(head_body), wk, vk, mk, *targs)
    est = hd_ms + over_frac * full
    print(f"full          {full:7.2f} ms/batch "
          f"({B / full * 1000 * 60 / 1e6:.1f}M reads/min)")
    print(f"sketch        {sk_ms:7.2f}")
    print(f"sketch+probe  {pr_ms:7.2f}  (kernel = {full - pr_ms:.2f})")
    print(f"head-only     {hd_ms:7.2f}  overflow_frac {over_frac:.3f}")
    print(f"escalation    {est:7.2f} est "
          f"({B / est * 1000 * 60 / 1e6:.1f}M reads/min)")


if __name__ == "__main__":
    main()
