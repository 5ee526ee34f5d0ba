#!/usr/bin/env python
"""Cost of a full-row max reduction inside a Pallas kernel at the
candidates-kernel shape: jnp.max(axis=1) vs hierarchical (static
128-lane chunk maxes + one 128-wide reduce). Decides how the top-k
extraction should reduce.

Usage: python tools/profile_rowmax.py [L] [K]
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B = 8192
L = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
R = 6   # reductions per kernel call (the top-k loop does ~6)


def make_kernel(mode):
    def kernel(p_ref, out_ref):
        p = p_ref[:]
        n, l = p.shape
        acc = jnp.zeros((n, 128), jnp.int32)
        x = p
        for i in range(R):
            if mode == "plain":
                m = jnp.max(x, axis=1, keepdims=True)      # (n, 1)
                acc = acc + m                               # bcast
            elif mode == "chunk":
                m = x[:, :128]
                for j in range(1, l // 128):
                    m = jnp.maximum(m, x[:, j * 128:(j + 1) * 128])
                m1 = jnp.max(m, axis=1, keepdims=True)      # (n, 1)
                acc = acc + m1
            elif mode == "roll":
                # never materialize (n, 1): chunk maxes -> (n, 128),
                # then a 7-step roll tree leaves the max in EVERY lane
                m = x[:, :128]
                for j in range(1, l // 128):
                    m = jnp.maximum(m, x[:, j * 128:(j + 1) * 128])
                d = 1
                while d < 128:
                    m = jnp.maximum(m, pltpu.roll(m, d, 1))
                    d *= 2
                acc = acc + m
            x = x ^ acc[:, :1]    # serialize the reductions
        out_ref[:] = acc
    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def run_scan(pk_k, mode):
    tile = max(8, min(256, (1 << 18) // (L * 4)))

    def body(c, pk):
        out = pl.pallas_call(
            make_kernel(mode),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
            grid=(B // tile,),
            in_specs=[pl.BlockSpec((tile, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(pk)
        return c + out[:, 0].sum(dtype=jnp.int32), None

    r, _ = jax.lax.scan(body, jnp.int32(0), pk_k)
    return r


def main():
    rng = np.random.default_rng(0)
    pk = jnp.asarray(rng.integers(0, 2**30, (B, L), dtype=np.int32))
    pk_k = jnp.broadcast_to(pk[None], (K, B, L))
    for mode in ("plain", "chunk", "roll"):
        np.asarray(run_scan(pk_k, mode))
        t0 = time.time()
        it = 6
        out = None
        for _ in range(it):
            r = run_scan(pk_k, mode)
            if out is not None:
                np.asarray(out)
            out = r
        np.asarray(out)
        ms = (time.time() - t0) / it / K * 1000
        print(f"L={L} R={R} {mode:5s} {ms:7.3f} ms/batch "
              f"({ms / R:6.3f} per reduction incl. serialization)",
              flush=True)


if __name__ == "__main__":
    main()
