"""Sharded multi-chip path on the virtual 8-device CPU mesh: the sharded
query step must classify identically to the single-chip step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metacache_tpu.config import SketchingOptions
from metacache_tpu.core import sketch as osketch
from metacache_tpu.ops import windows as W
from metacache_tpu.ops.pipeline import query_step
from metacache_tpu.ops.table import (FeatureTable, pack_locations,
                                     unpack_locations)
from metacache_tpu.parallel import mesh as M

OPT = SketchingOptions().resolved()
NR = 21

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [alpha[rng.integers(0, 4, 8000)].tobytes()
               for _ in range(6)]
    feats, locs = [], []
    for tid, g in enumerate(genomes):
        for win, sk in osketch.for_each_sketch(g, OPT):
            feats.append(np.asarray(sk, np.uint32))
            locs.append(pack_locations(
                np.full(len(sk), tid, np.uint32),
                np.full(len(sk), win, np.uint32)))
    ft = FeatureTable.build(np.concatenate(feats), np.concatenate(locs))
    lineages = np.zeros((6, NR), np.int32)
    lineages[:, 0] = -np.arange(6) - 1
    lineages[:, 4] = np.arange(6) // 2 + 100
    lineages[:, 20] = 1
    return rng, genomes, ft, lineages


@pytest.mark.parametrize("num_data,num_table", [(2, 4), (4, 2), (8, 1),
                                                (1, 8)])
def test_sharded_equals_single_chip(setup, num_data, num_table):
    rng, genomes, ft, lineages = setup
    mesh = M.make_mesh(num_data, num_table)
    st = M.shard_table(ft, num_table, 255)
    merge_tax = lineages[:, 0].copy()

    B = 16  # queries per data group; all 100bp -> 1 window each
    reads = []
    for _ in range(B * num_data):
        g = genomes[rng.integers(0, 6)]
        p = int(rng.integers(0, len(g) - 100))
        reads.append(g[p:p + 100])

    wins_l, valid_l, qid_l = [], [], []
    for d in range(num_data):
        w, v, q = W.batch_windows(reads[d * B:(d + 1) * B], OPT, pad_to=B)
        wins_l.append(w)
        valid_l.append(v)
        qid_l.append(q)
    wins = np.concatenate(wins_l)
    valid = np.concatenate(valid_l)
    qid = np.concatenate(qid_l)
    mwir = np.full(B, 2, np.int32)

    res = M.sharded_query_step(
        jnp.asarray(wins), jnp.asarray(valid), jnp.asarray(qid),
        jnp.asarray(mwir),
        jnp.asarray(st.features), jnp.asarray(st.offsets),
        jnp.asarray(st.loc_tgt), jnp.asarray(st.loc_win),
        jnp.asarray(merge_tax), jnp.asarray(lineages),
        jnp.int32(5), jnp.float32(1.0), jnp.int32(19), jnp.int32(0),
        mesh=mesh, k=16, sketchlen=16,
        slots_per_feature=st.slots_per_feature,
        num_queries=B, max_candidates=2)
    cls_sharded = np.asarray(res.cls_tax)

    # single-chip reference
    ltgt, lwin = unpack_locations(ft.locations)
    w_all, v_all, q_all = W.batch_windows(reads, OPT, pad_to=None)
    mwir_all = np.full(len(reads), 2, np.int32)
    ref = query_step(
        jnp.asarray(w_all), jnp.asarray(v_all), jnp.asarray(q_all),
        jnp.asarray(mwir_all),
        jnp.asarray(ft.unique_features),
        jnp.asarray(ft.offsets.astype(np.int32)),
        jnp.asarray(ltgt.astype(np.int32)),
        jnp.asarray(lwin.astype(np.int32)),
        jnp.asarray(merge_tax), jnp.asarray(lineages),
        jnp.int32(5), jnp.float32(1.0), jnp.int32(19), jnp.int32(0),
        k=16, sketchlen=16, slots_per_feature=ft.max_bucket_size,
        num_queries=len(reads), max_candidates=2)
    cls_ref = np.asarray(ref.cls_tax)

    # reorder sharded output (data-major, table sub-ranges of bsub)
    bsub = (B + num_table - 1) // num_table
    got = np.empty(len(reads), np.int32)
    idx = 0
    for d in range(num_data):
        for p in range(num_table):
            lo = p * bsub
            n = min(bsub, B - lo) if lo < B else 0
            chunk = cls_sharded[(d * num_table + p) * bsub:
                                (d * num_table + p) * bsub + n]
            got[d * B + lo:d * B + lo + n] = chunk
    np.testing.assert_array_equal(got, cls_ref)
