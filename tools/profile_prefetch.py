#!/usr/bin/env python
"""Software-pipelined scan experiment at the deep-DB shape: iteration i
classifies batch i using probe state (sketch + bucket-row gather)
prefetched in iteration i-1, so the brows gather and sketch of batch
i+1 overlap the head/overflow gathers and candidates kernel of batch i.
Measures full and head-only (escalation phase 1) variants vs the plain
scan."""
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
I32_MAX = np.int32(2**31 - 1)


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
    from metacache_tpu.ops.probe import probe_bucket
    from metacache_tpu.ops.rows import (_sketch_dispatch, _alt_runs,
                                        rows_to_result)

    opt = SketchingOptions().resolved()
    rng = np.random.default_rng(42)
    GLEN = 1_000_000
    genomes, species = make_strain_genomes(
        rng, [(64, 1, 0.0), (12, 52, 0.003), (1, 256, 0.003)], GLEN)
    dt, secs = build_db(genomes, opt)
    print(f"build {secs:.0f}s layout={dense_tag(dt)}", flush=True)

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
    pkb = dt.slot_bits
    s = opt.sketchlen
    hsl = dt.head_slots
    alt = _alt_runs(True, True, 2 * s, 0, s, spf)

    def sketch_and_brows(w, v, brows, nf2):
        fx = _sketch_dispatch(w.reshape(B, opt.winlen), v.reshape(B),
                              opt.kmerlen, s, True)
        flat = fx.reshape(B * s)
        idx_c, _ = probe_bucket(flat, brows, bbits)
        idx_c = jnp.clip(idx_c, 0, nf2 - 1)
        return flat, idx_c

    def finish(flat, idx_c, m, head, ovf, head_only):
        r2 = head[idx_c >> 1]
        rows = jnp.where((idx_c & 1)[:, None] == 1, r2[:, 64:],
                         r2[:, :64])
        flat_i32 = jax.lax.bitcast_convert_type(flat, jnp.int32)
        found = (rows[:, 0] == flat_i32) & \
            (flat != jnp.uint32(0xFFFFFFFF))
        cnt = jnp.where(found, rows[:, 1], 0)
        if head_only:
            over = jnp.any((cnt > hsl).reshape(B, s), axis=1)
            j = jax.lax.broadcasted_iota(jnp.int32, (B * s, hsl), 1)
            hit = j < jnp.minimum(cnt, hsl)[:, None]
            pk = jnp.where(hit, rows[:, 3:3 + hsl], I32_MAX)
            rl = 64
        else:
            over = None
            j = jax.lax.broadcasted_iota(jnp.int32, (B * s, spf), 1)
            hit = j < cnt[:, None]
            oidx = jnp.where(found, rows[:, 2], 0)
            orow = ovf[oidx]
            ow = spf - hsl
            pk = jnp.concatenate(
                [rows[:, 3:3 + hsl], orow[:, :ow]], axis=1)
            pk = jnp.where(hit, pk, I32_MAX)
            rl = alt
        if rl > pk.shape[1]:
            pk = jnp.concatenate(
                [pk, jnp.full((B * s, rl - pk.shape[1]), I32_MAX,
                              jnp.int32)], axis=1)
        fidx = jax.lax.broadcasted_iota(jnp.int32, (B * s, 1), 0) % s
        pk = jnp.where((fidx & 1) == 1, jax.lax.rev(pk, (1,)), pk)
        pk = pk.reshape(B, s * rl)
        res = rows_to_result(
            pk, pk, m, mt, lg, jnp.int32(5), jnp.float32(1.0),
            jnp.int32(19), jnp.int32(0), max_candidates=2,
            walk_elems=2 * s, fast_top2=True, fused_candidates=True,
            emit_hits=False, presorted_runs=rl, pack_bits=pkb)
        return res.cls_tax, over

    nf2 = dt.head.shape[0] * 2

    def make_plain(head_only):
        @jax.jit
        def fn(wk, vk, mk, brows, head, ovf):
            def body(c, xs):
                w, v, m = xs
                flat, idx_c = sketch_and_brows(w, v, brows, nf2)
                cls, over = finish(flat, idx_c, m, head, ovf, head_only)
                return c, cls
            return jax.lax.scan(body, 0, (wk, vk, mk))[1]
        return fn

    def make_prefetch(head_only):
        @jax.jit
        def fn(wk, vk, mk, brows, head, ovf):
            # iteration i finishes batch i-1 with state prefetched in
            # iteration i-1 and prefetches batch i; one extra iteration
            # drains the pipeline
            flat0, idx0 = sketch_and_brows(wk[0], vk[0], brows, nf2)

            def body(carry, xs):
                flat, idx_c, m_prev = carry
                w, v, m = xs
                cls, _ = finish(flat, idx_c, m_prev, head, ovf,
                                head_only)
                flat2, idx2 = sketch_and_brows(w, v, brows, nf2)
                return (flat2, idx2, m), cls
            wk1 = jnp.concatenate([wk[1:], wk[:1]])
            vk1 = jnp.concatenate([vk[1:], vk[:1]])
            mk1 = jnp.concatenate([mk[1:], mk[:1]])
            _, cls = jax.lax.scan(body, (flat0, idx0, mk[0]),
                                  (wk1, vk1, mk1))
            return cls
        return fn

    targs = (dt.brows, dt.head, dt.ovf)
    pf = timed(make_plain(False), wk, vk, mk, *targs)
    print(f"plain full      {pf:7.2f} ms/batch", flush=True)
    xf = timed(make_prefetch(False), wk, vk, mk, *targs)
    print(f"prefetch full   {xf:7.2f} ms/batch", flush=True)
    ph = timed(make_plain(True), wk, vk, mk, *targs)
    print(f"plain head      {ph:7.2f} ms/batch", flush=True)
    xh = timed(make_prefetch(True), wk, vk, mk, *targs)
    print(f"prefetch head   {xh:7.2f} ms/batch", flush=True)
    frac = 0.304
    print(f"escalation plain    {ph + frac * pf:7.2f} "
          f"({B / (ph + frac * pf) * 60000 / 1e6:.1f}M)")
    print(f"escalation prefetch {xh + frac * xf:7.2f} "
          f"({B / (xh + frac * xf) * 60000 / 1e6:.1f}M)")


if __name__ == "__main__":
    main()
