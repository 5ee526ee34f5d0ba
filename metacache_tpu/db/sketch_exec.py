"""Batched device execution of the sketcher for database builds.

Windows stream through fixed-size device batches (static shapes, one XLA
compilation) — the TPU equivalent of the reference GPU's double-buffered
sequence_batch insert pipeline (src/gpu_hashmap.cu:190-230).
"""
from __future__ import annotations

import numpy as np

from ..ops.windows import PAD_CODE

_BATCH = 65536  # windows per device dispatch


def sketch_windows_batched(wm: np.ndarray, vl: np.ndarray,
                           k: int, sketchlen: int) -> np.ndarray:
    import jax.numpy as jnp
    from ..ops.sketch_jax import sketch_windows

    n, w = wm.shape
    out = np.empty((n, sketchlen), dtype=np.uint32)
    for beg in range(0, n, _BATCH):
        end = min(beg + _BATCH, n)
        cur = end - beg
        if cur < _BATCH and n > _BATCH:
            wpad = np.full((_BATCH, w), PAD_CODE, np.uint8)
            wpad[:cur] = wm[beg:end]
            vpad = np.zeros(_BATCH, np.int32)
            vpad[:cur] = vl[beg:end]
            res = sketch_windows(jnp.asarray(wpad), jnp.asarray(vpad),
                                 k=k, sketchlen=sketchlen)
            out[beg:end] = np.asarray(res)[:cur]
        else:
            res = sketch_windows(jnp.asarray(wm[beg:end]),
                                 jnp.asarray(vl[beg:end]),
                                 k=k, sketchlen=sketchlen)
            out[beg:end] = np.asarray(res)
    return out
