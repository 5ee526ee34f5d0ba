#!/usr/bin/env python
"""A/B the Pallas sketch kernel variants (bitonic sort+compact vs
iterative min-extraction) under the production lax.scan infeed shape —
single dispatches through this environment's tunnel cost ~300 ms flat,
so only scan-amortized timings resolve kernel compute."""
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

from metacache_tpu.ops import sketch_pallas as sp  # noqa: E402

SCAN_K, B, L, K, S = 16, 8192, 128, 16, 16


@functools.partial(jax.jit, static_argnames=("mode",))
def run_scan(wk, vk, mode):
    def body(c, xs):
        w, v = xs
        f = sp.sketch_windows_pallas(w, v, k=K, sketchlen=S, tile=512,
                                     mode=mode)
        return c, f.sum(axis=1).astype(jnp.int32)
    _, out = jax.lax.scan(body, 0, (wk, vk))
    return out


def main():
    rng = np.random.default_rng(0)
    wk = jnp.asarray(rng.integers(0, 5, (SCAN_K, B, L), dtype=np.uint8))
    vk = jnp.asarray(
        rng.integers(16, L + 1, (SCAN_K, B)).astype(np.int32))
    for mode in ("sort", "extract", "sort", "extract"):
        r = run_scan(wk, vk, mode)
        np.asarray(r)
        t0 = time.time()
        it = 8
        prev = None
        for _ in range(it):
            r = run_scan(wk, vk, mode)
            if prev is not None:
                np.asarray(prev)
            prev = r
        np.asarray(prev)
        ms = (time.time() - t0) / (it * SCAN_K) * 1000
        print(f"{mode:8s} {ms:7.3f} ms/8192w", flush=True)


if __name__ == "__main__":
    main()
