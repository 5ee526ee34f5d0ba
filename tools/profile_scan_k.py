#!/usr/bin/env python
"""Per-batch cost of the fused scan step vs SCAN_K (batches per device
dispatch) on the small strain DB — quantifies the per-dispatch fixed
cost that SCAN_K amortizes (through the tunnel this is large; on a
production host it is PCIe-dispatch small).

Usage: python tools/profile_scan_k.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metacache_tpu.utils.platform import force_platform  # noqa: E402

force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    import bench as BM
    from metacache_tpu.config import SketchingOptions
    from metacache_tpu.ops.rows import query_step_rows_scan

    opt = SketchingOptions().resolved()
    use_pallas = jax.devices()[0].platform not in ("cpu",)
    rng = np.random.default_rng(42)
    spec = [(8, 1, 0.0), (2, 52, 0.003), (1, 64, 0.003)]
    glen = 200_000
    genomes, species = BM.make_strain_genomes(rng, spec, glen)
    dt, _ = BM.build_db(genomes, opt)
    B = BM.BATCH_READS
    ntgt = len(genomes)
    lineages = np.zeros((ntgt, 21), np.int32)
    lineages[:, 0] = -np.arange(ntgt) - 1
    lineages[:, 4] = species + 100
    lineages[:, 20] = 1
    mt, lg = jnp.asarray(lineages[:, 0].copy()), jnp.asarray(lineages)
    rng2 = np.random.default_rng(7)
    gsel = rng2.integers(0, ntgt, B)
    pos = rng2.integers(0, glen - 100, B)
    wins = np.full((B, 1, opt.winlen), 4, np.uint8)
    for i in range(B):
        wins[i, 0, :100] = genomes[gsel[i]][pos[i]:pos[i] + 100]
    dense = BM.dense_tag(dt)
    targs = (dt.uniq, dt.offsets, dt.head, dt.ovf, dt.brows, mt, lg)
    kw = dict(k=opt.kmerlen, sketchlen=opt.sketchlen,
              slots_per_feature=dt.spf, max_candidates=2,
              prefix_bits=dt.bbits, dense=dense,
              walk_elems=2 * opt.sketchlen,
              fused_candidates=use_pallas, pack_bits=dt.slot_bits)

    def full(wk, vk, mk, *ta):
        return query_step_rows_scan(
            wk, vk, mk, *ta[:4], ta[5], ta[6],
            jnp.int32(5), jnp.float32(1.0), jnp.int32(19), jnp.int32(0),
            ta[4], windows_per_query=1, prefix_steps=0,
            use_pallas_sketch=use_pallas, fast_top2=True,
            prefetch=True, **kw)

    for K in (16, 32, 64, 128):
        wk = jnp.asarray(np.broadcast_to(
            wins[None], (K,) + wins.shape).copy())
        vk = jnp.asarray(np.broadcast_to(
            np.full((B, 1), 100, np.int32)[None], (K, B, 1)).copy())
        mk = jnp.asarray(np.full((K, B), 2, np.int32))
        np.asarray(full(wk, vk, mk, *targs))
        t0 = time.time()
        it = 6
        prev = None
        for _ in range(it):
            r = full(wk, vk, mk, *targs)
            if prev is not None:
                np.asarray(prev)
            prev = r
        np.asarray(prev)
        ms = (time.time() - t0) / it / K * 1000
        print(f"K={K:4d} full {ms:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
