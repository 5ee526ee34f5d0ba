#!/usr/bin/env python
"""Raw device costs that govern deep-bucket (spf~254) databases:
  1. per-row (tgt, win) sort at L = sketchlen * spf lanes
  2. two-tier probe gathers (head row + overflow row) for B*F probes
  3. walk-sweep + fast-top2 at that L
All inside a lax.scan like production, on the real chip."""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.abspath(__file__)) + "/..")

from metacache_tpu.utils.platform import force_platform  # noqa: E402

force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SCAN_K = 4
B = 8192
F = 16


def timed(fn, *args, it=4):
    r = fn(*args)
    np.asarray(r)
    t0 = time.time()
    prev = None
    for _ in range(it):
        r = fn(*args)
        if prev is not None:
            np.asarray(prev)
        prev = r
    np.asarray(prev)
    return (time.time() - t0) / (it * SCAN_K) * 1000


def main():
    rng = np.random.default_rng(0)

    for spf in (64, 254):
        l = F * spf
        key = jax.random.PRNGKey(0)
        tk = jax.jit(lambda k: jax.random.randint(
            k, (SCAN_K, B, l), 0, 500, jnp.int32))(key)
        wk = jax.jit(lambda k: jax.random.randint(
            k, (SCAN_K, B, l), 0, 9000, jnp.int32))(jax.random.PRNGKey(1))

        @jax.jit
        def sort_scan(tk, wk):
            def body(c, xs):
                t, w = xs
                t, w = jax.lax.sort((t, w), dimension=1, num_keys=2)
                return c, t[:, 0] + w[:, -1]
            _, out = jax.lax.scan(body, 0, (tk, wk))
            return out

        ms = timed(sort_scan, tk, wk)
        print(f"spf={spf:4d} L={l:5d} row-sort    {ms:8.3f} ms/batch",
              flush=True)

        # walk sweep (32 shifts) on sorted rows
        @jax.jit
        def sweep_scan(tk, wk):
            def body(c, xs):
                t, w = xs
                t, w = jax.lax.sort((t, w), dimension=1, num_keys=2)
                w_lo = w - 1
                hits = jnp.ones_like(t)
                for e in range(1, 32):
                    te = jnp.concatenate(
                        [jnp.full((B, e), -1, jnp.int32), t[:, :-e]],
                        axis=1)
                    we = jnp.concatenate(
                        [jnp.full((B, e), -1, jnp.int32), w[:, :-e]],
                        axis=1)
                    hits = hits + ((te == t) & (we >= w_lo)).astype(
                        jnp.int32)
                return c, hits.max(axis=1)
            _, out = jax.lax.scan(body, 0, (tk, wk))
            return out

        ms2 = timed(sweep_scan, tk, wk)
        print(f"spf={spf:4d} L={l:5d} +sweep32    {ms2:8.3f} ms/batch "
              f"(marginal {ms2-ms:+.3f})", flush=True)
        del tk, wk

    # --- two-tier probe gathers at big-DB scale -------------------------
    NF = 16_000_000
    HEAD = 16
    headw = 3 + 2 * HEAD          # feat, count, ovfidx, tgt*H, win*H
    ovfw = 2 * (254 - HEAD)
    NOVF = 2_000_000
    head_rows = jax.jit(lambda k: jax.random.randint(
        k, (NF, headw), 0, 2**31 - 1, jnp.int32))(jax.random.PRNGKey(2))
    ovf_rows = jax.jit(lambda k: jax.random.randint(
        k, (NOVF, ovfw), 0, 2**31 - 1, jnp.int32))(jax.random.PRNGKey(3))
    idxk = jax.jit(lambda k: jax.random.randint(
        k, (SCAN_K, B * F), 0, NF, jnp.int32))(jax.random.PRNGKey(4))

    @jax.jit
    def probe2(idxk, head_rows, ovf_rows):
        def body(c, idx):
            rows = head_rows[idx]
            oi = jnp.abs(rows[:, 2]) % NOVF
            orow = ovf_rows[oi]
            return c, rows[:, 1].reshape(B, F).max(axis=1) + \
                orow[:, 0].reshape(B, F).max(axis=1)
        _, out = jax.lax.scan(body, 0, idxk)
        return out

    ms = timed(probe2, idxk, head_rows, ovf_rows)
    print(f"two-tier probe (head {headw} + ovf {ovfw} lanes, "
          f"{B*F} probes) {ms:8.3f} ms/batch", flush=True)

    @jax.jit
    def probe_head(idxk, head_rows):
        def body(c, idx):
            rows = head_rows[idx]
            return c, rows[:, 1].reshape(B, F).max(axis=1)
        _, out = jax.lax.scan(body, 0, idxk)
        return out

    ms = timed(probe_head, idxk, head_rows)
    print(f"head-only probe ({headw} lanes, {B*F} probes) "
          f"{ms:8.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
