#!/usr/bin/env python
"""Software-pipelined scan at the TOY shape (dense slot-packed layout,
fast_top2 XLA candidates): does prefetching sketch+brows of batch i+1
behind the head gather + candidates of batch i beat the plain scan?"""
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


def timed(fn, *args, it=4):
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
    from metacache_tpu.ops.rows import _sketch_dispatch, rows_to_result

    opt = SketchingOptions().resolved()
    rng = np.random.default_rng(42)
    GLEN = 1_000_000
    genomes, species = make_strain_genomes(rng, [(16, 4, 0.01)], GLEN)
    dt, secs = build_db(genomes, opt)
    tag = dense_tag(dt)
    print(f"build {secs:.0f}s layout={tag} spf={dt.spf}", flush=True)
    assert dt.dense and dt.slot_bits, tag

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

    spf, bbits, pkb = dt.spf, dt.bbits, dt.slot_bits
    s = opt.sketchlen
    hpack = dt.packed
    nf2 = dt.head.shape[0] * (2 if hpack else 1)

    def sketch_and_brows(w, v, brows):
        fx = _sketch_dispatch(w.reshape(B, opt.winlen), v.reshape(B),
                              opt.kmerlen, s, True)
        flat = fx.reshape(B * s)
        idx_c, _ = probe_bucket(flat, brows, bbits)
        idx_c = jnp.clip(idx_c, 0, nf2 - 1)
        return flat, idx_c

    def finish(flat, idx_c, m, head):
        if hpack:
            r2 = head[idx_c >> 1]
            rows = jnp.where((idx_c & 1)[:, None] == 1, r2[:, 64:],
                             r2[:, :64])
        else:
            rows = head[idx_c]
        flat_i32 = jax.lax.bitcast_convert_type(flat, jnp.int32)
        found = (rows[:, 0] == flat_i32) & \
            (flat != jnp.uint32(0xFFFFFFFF))
        cnt = jnp.where(found, rows[:, 1], 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (B * s, spf), 1)
        hit = j < cnt[:, None]
        pk = jnp.where(hit, rows[:, 2:2 + spf], I32_MAX)
        pk = pk.reshape(B, s * spf)
        res = rows_to_result(
            pk, pk, m, mt, lg, jnp.int32(5), jnp.float32(1.0),
            jnp.int32(19), jnp.int32(0), max_candidates=2,
            walk_elems=2 * s, fast_top2=True, emit_hits=False,
            pack_bits=pkb)
        return res.cls_tax

    @jax.jit
    def plain(wk, vk, mk, brows, head):
        def body(c, xs):
            w, v, m = xs
            flat, idx_c = sketch_and_brows(w, v, brows)
            return c, finish(flat, idx_c, m, head)
        return jax.lax.scan(body, 0, (wk, vk, mk))[1]

    @jax.jit
    def prefetch(wk, vk, mk, brows, head):
        flat0, idx0 = sketch_and_brows(wk[0], vk[0], brows)

        def body(carry, xs):
            flat, idx_c, m_prev = carry
            w, v, m = xs
            cls = finish(flat, idx_c, m_prev, head)
            flat2, idx2 = sketch_and_brows(w, v, brows)
            return (flat2, idx2, m), cls
        wk1 = jnp.concatenate([wk[1:], wk[:1]])
        vk1 = jnp.concatenate([vk[1:], vk[:1]])
        mk1 = jnp.concatenate([mk[1:], mk[:1]])
        return jax.lax.scan(body, (flat0, idx0, mk[0]),
                            (wk1, vk1, mk1))[1]

    p = timed(plain, wk, vk, mk, dt.brows, dt.head)
    print(f"plain    {p:6.2f} ms/batch ({B / p * 60000 / 1e6:.1f}M)",
          flush=True)
    x = timed(prefetch, wk, vk, mk, dt.brows, dt.head)
    print(f"prefetch {x:6.2f} ms/batch ({B / x * 60000 / 1e6:.1f}M)",
          flush=True)


if __name__ == "__main__":
    main()
