#!/usr/bin/env python
"""Scan-amortized A/B of the Pallas sketcher's sort vs extract modes
at the pipeline shape (B windows of 128 chars per batch).

Usage: python tools/profile_sketch_mode.py [B] [K]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metacache_tpu.utils.platform import force_platform  # noqa: E402

force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from metacache_tpu.ops.sketch_pallas import sketch_windows_pallas  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
K = int(sys.argv[2]) if len(sys.argv) > 2 else 32


@functools.partial(jax.jit, static_argnames=("mode",))
def run_scan(wk, vk, mode):
    def body(c, xs):
        w, v = xs
        s = sketch_windows_pallas(w, v, k=16, sketchlen=16, mode=mode)
        return c + s[:, 0].sum(dtype=jnp.uint32), None
    r, _ = jax.lax.scan(body, jnp.uint32(0), (wk, vk))
    return r


def main():
    rng = np.random.default_rng(0)
    w = rng.integers(0, 4, (B, 128), dtype=np.uint8)
    w[rng.random((B, 128)) < 0.01] = 4          # sparse ambiguity
    v = np.full((B,), 100, np.int32)
    wk = jnp.broadcast_to(jnp.asarray(w)[None], (K, B, 128))
    vk = jnp.broadcast_to(jnp.asarray(v)[None], (K, B))
    for mode in ("sort", "extract"):
        np.asarray(run_scan(wk, vk, mode))
        t0 = time.time()
        it = 6
        out = None
        for _ in range(it):
            r = run_scan(wk, vk, mode)
            if out is not None:
                np.asarray(out)
            out = r
        np.asarray(out)
        ms = (time.time() - t0) / it / K * 1000
        print(f"B={B} {mode:8s} {ms:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
