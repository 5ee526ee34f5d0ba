#!/usr/bin/env python
"""Isolate pallas launch overhead vs compute: scan over K batches where
the body is (a) pure-jnp trivial op, (b) pallas io kernel, (c) pallas
full sketch kernel — at several batch sizes B."""
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from metacache_tpu.ops import sketch_pallas as sp  # noqa: E402

L, K, S = 128, 16, 16
SCAN_K = 64


def make_kernel(stage):
    def kernel(codes_ref, valid_ref, out_ref):
        codes = codes_ref[:].astype(jnp.uint32)
        valid = valid_ref[:]
        if stage == "io":
            out_ref[:] = codes[:, :S] + valid.astype(jnp.uint32)
            return
    return kernel


@functools.partial(jax.jit, static_argnames=("stage", "tile", "b"))
def run_scan(wk, vk, stage, tile, b):
    def body(c, xs):
        w, v = xs
        if stage == "jnp":
            f = w[:, :S].astype(jnp.uint32) + v.reshape(b, 1).astype(
                jnp.uint32)
        elif stage == "full":
            f = sp.sketch_windows_pallas(w, v, k=K, sketchlen=S,
                                         tile=tile)
        else:
            f = pl.pallas_call(
                make_kernel(stage),
                out_shape=jax.ShapeDtypeStruct((b, S), jnp.uint32),
                grid=(b // tile,),
                in_specs=[pl.BlockSpec((tile, L), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((tile, S), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(w, v.reshape(b, 1))
        return c, f.sum(axis=1).astype(jnp.int32)
    _, out = jax.lax.scan(body, 0, (wk, vk))
    return out


def main():
    rng = np.random.default_rng(0)
    for b in (2048, 8192, 32768):
        wk = jnp.asarray(rng.integers(0, 5, (SCAN_K, b, L),
                                      dtype=np.uint8))
        vk = jnp.asarray(
            rng.integers(16, L + 1, (SCAN_K, b)).astype(np.int32))
        for stage in ("jnp", "io", "full"):
            tile = min(b, 1024)
            r = run_scan(wk, vk, stage, tile, b)
            np.asarray(r)
            t0 = time.time()
            it = 4
            for _ in range(it):
                r = run_scan(wk, vk, stage, tile, b)
            np.asarray(r)
            dt = (time.time() - t0) / (it * SCAN_K)
            print(f"B={b:6d} {stage:5s} {dt*1000:7.3f} ms/batch "
                  f"{dt*1e9/b:7.1f} ns/window", flush=True)


if __name__ == "__main__":
    main()
