"""Sharded row-layout step equals single-chip on the virtual mesh."""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metacache_tpu.classify.runner import QueryOptions, QueryRunner
from metacache_tpu.db.build import BuildOptions, build_database
from metacache_tpu.ops import windows as W
from metacache_tpu.ops.rows import query_step_rows
from metacache_tpu.parallel import mesh as M
from metacache_tpu.parallel.rows_mesh import (shard_row_table,
                                              sharded_query_step_rows)
from metacache_tpu.seqio.reader import PairingMode, read_queries

import os
DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    db = build_database(BuildOptions(
        infiles=[f"{DATA}/genomes.fa"], taxonomy_dir=f"{DATA}/taxonomy"))
    runner = QueryRunner(db, QueryOptions())
    qs = list(itertools.islice(
        read_queries([f"{DATA}/reads_single.fa"], PairingMode.NONE), 64))
    sk = db.sketching
    wins = np.stack([W.sequence_windows(W.encode_ascii(q.seq1), sk)[0][0]
                     for q in qs])[:, None, :]
    valid = np.full((64, 1), 100, np.int32)
    mwir = np.full(64, 2, np.int32)
    return db, runner, wins, valid, mwir


@pytest.mark.parametrize("nd,nt", [(2, 4), (4, 2), (1, 8)])
def test_sharded_rows_equals_single(setup, nd, nt):
    db, r, wins, valid, mwir = setup
    B = len(mwir)
    mesh = M.make_mesh(nd, nt)
    st = shard_row_table(db.parts[0], nt, db.max_locations_per_feature)
    res = sharded_query_step_rows(
        jnp.asarray(wins), jnp.asarray(valid), jnp.asarray(mwir),
        jnp.asarray(st.features), jnp.asarray(st.offsets),
        jnp.asarray(st.loc_tgt2d), jnp.asarray(st.loc_win2d),
        jnp.asarray(st.prefix),
        r._merge_tax_dev, r._lineages_dev,
        jnp.int32(5), jnp.float32(1.0), jnp.int32(19), jnp.int32(0),
        mesh=mesh, k=16, sketchlen=16,
        slots_per_feature=st.slots_per_feature, windows_per_query=1,
        max_candidates=2, prefix_bits=st.prefix_bits,
        prefix_steps=st.prefix_steps)
    cls = np.asarray(res.cls_tax)
    b_loc = B // nd
    bsub = b_loc // nt
    got = np.empty(B, np.int32)
    pos = 0
    for d in range(nd):
        for p in range(nt):
            got[d * b_loc + p * bsub:d * b_loc + (p + 1) * bsub] = \
                cls[pos:pos + bsub]
            pos += bsub

    tf, to, lt, lw, spf = r._tables[0]
    ps, steps = r._prefix[0]
    ref = query_step_rows(
        jnp.asarray(wins), jnp.asarray(valid), jnp.asarray(mwir),
        tf, to, lt, lw, r._merge_tax_dev, r._lineages_dev,
        jnp.int32(5), jnp.float32(1.0), jnp.int32(19), jnp.int32(0), ps,
        k=16, sketchlen=16, slots_per_feature=spf, windows_per_query=1,
        max_candidates=2, prefix_bits=r._prefix_bits[0], prefix_steps=steps,
        dense=r._dense[0])
    np.testing.assert_array_equal(got, np.asarray(ref.cls_tax))
