#!/usr/bin/env python
"""Do TPU dynamic gathers overlap VPU (Pallas) compute?

Software-pipelined lax.scan: iteration i runs the fused candidates
kernel on iteration i-1's gathered slots, so the gathers and the kernel
have no data dependence inside one XLA loop body. If total <
gathers + kernel, the scheduler overlaps them.
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
F = 16
L = 4096
WBITS = 15


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
    from metacache_tpu.ops.candidates_pallas import \
        candidates_pallas_packed
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    NH = 4_000_000     # physical head rows (128 lanes)
    NO = 800_000       # overflow rows (512 lanes)
    NB = 1_000_000     # bucket rows (128 lanes)
    head = jax.jit(lambda k: jax.random.randint(
        k, (NH, 128), 0, 1 << 20, jnp.int32))(key)
    ovf = jax.jit(lambda k: jax.random.randint(
        k, (NO, 512), 0, 1 << 20, jnp.int32))(jax.random.PRNGKey(1))
    brows = jax.jit(lambda k: jax.random.randint(
        k, (NB, 128), 0, 1 << 20, jnp.int32))(jax.random.PRNGKey(2))
    fk = jax.jit(lambda k: jax.random.randint(
        k, (SCAN_K, B * F), 0, NB * 2, jnp.int32))(jax.random.PRNGKey(3))
    mk = jnp.full((SCAN_K, B), 2, jnp.int32)

    def gathers(h):
        """3 chained gathers -> (B, L) pseudo slot rows."""
        bidx = (h >> 1) % NB
        br = brows[bidx]
        hidx = (jnp.abs(br[:, 0] + h) % (NH * 2))
        hr = jnp.where((hidx & 1)[:, None] == 1,
                       head[hidx >> 1][:, 64:], head[hidx >> 1][:, :64])
        oidx = jnp.abs(hr[:, 1]) % NO
        orow = ovf[oidx]
        slots = jnp.concatenate([hr[:, 3:35],
                                 orow[:, :224]], axis=1)  # 256/feat
        pk = jnp.abs(slots) % ((900 << WBITS) | 8900)
        return pk.reshape(B, L)

    def kernel(slots, m):
        out = candidates_pallas_packed(slots, m, WBITS, walk_elems=32,
                                       max_candidates=2)
        return out[0]

    @jax.jit
    def seq(fk, mk):
        def body(c, xs):
            h, m = xs
            return c, kernel(gathers(h), m)
        return jax.lax.scan(body, 0, (fk, mk))[1]

    @jax.jit
    def pipelined(fk, mk):
        def body(carry, xs):
            h, m = xs
            prev_slots = carry
            out = kernel(prev_slots, m)          # uses LAST iter's slots
            slots = gathers(h)                   # independent of kernel
            return slots, out
        init = jnp.full((B, L), 2**31 - 1, jnp.int32)
        return jax.lax.scan(body, init, (fk, mk))[1]

    @jax.jit
    def gathers_only(fk, mk):
        def body(c, xs):
            h, m = xs
            return c, gathers(h)[:, ::512].sum(axis=1)
        return jax.lax.scan(body, 0, (fk, mk))[1]

    @jax.jit
    def kernel_only(fk, mk):
        slots0 = jnp.full((B, L), 2**31 - 1, jnp.int32)

        def body(c, xs):
            h, m = xs
            return c, kernel(slots0 + h[0], m)
        return jax.lax.scan(body, 0, (fk, mk))[1]

    print(f"gathers only : {timed(gathers_only, fk, mk, it=2):7.3f}",
          flush=True)
    print(f"sequential   : {timed(seq, fk, mk, it=2):7.3f}", flush=True)
    print(f"pipelined    : {timed(pipelined, fk, mk, it=2):7.3f}",
          flush=True)


if __name__ == "__main__":
    main()
