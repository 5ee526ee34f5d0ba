"""Sharded build-side mesh step on the virtual 8-device CPU mesh.

The query-side sharded path (all_to_all over the "table" axis) is
covered by tests/test_rows_mesh.py; the earlier flat-pipeline sharded
query step (all_gather of full match matrices) was retired.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metacache_tpu.config import SketchingOptions
from metacache_tpu.ops import windows as W
from metacache_tpu.ops.sketch_jax import sketch_windows
from metacache_tpu.parallel import mesh as M

OPT = SketchingOptions().resolved()

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.mark.parametrize("num_data,num_table", [(4, 2), (8, 1)])
def test_sharded_build_step_equals_single(num_data, num_table):
    rng = np.random.default_rng(5)
    n = 64
    wins = np.full((n, OPT.winlen), 4, np.uint8)
    wins[:, :100] = rng.integers(0, 4, (n, 100), dtype=np.uint8)
    valid = np.full(n, 100, np.int32)
    tgt = np.repeat(np.arange(n // 8, dtype=np.int32), 8)
    wid = np.tile(np.arange(8, dtype=np.int32), n // 8)

    mesh = M.make_mesh(num_data, num_table)
    f, t, w = M.sharded_build_step(
        jnp.asarray(wins), jnp.asarray(valid), jnp.asarray(tgt),
        jnp.asarray(wid), mesh, k=16, sketchlen=16)

    ref = np.asarray(sketch_windows(jnp.asarray(wins), jnp.asarray(valid),
                                    k=16, sketchlen=16))
    np.testing.assert_array_equal(np.asarray(f), ref.reshape(-1))
    np.testing.assert_array_equal(
        np.asarray(t), np.repeat(tgt, 16))
    np.testing.assert_array_equal(
        np.asarray(w), np.repeat(wid, 16))
