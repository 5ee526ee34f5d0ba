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


def test_sharded_two_tier_deep_buckets():
    """Two-tier slot-packed shards (deep-bucket layout; single-pk
    all_to_all) classify exactly like the unsharded dense step."""
    from metacache_tpu.ops.probe import make_bucket_index
    from metacache_tpu.ops.sketch_jax import sketch_windows
    from metacache_tpu.ops.table import FeatureTable, pack_locations

    rng = np.random.default_rng(13)
    B, WL, NTGT = 64, 128, 48
    codes = rng.integers(0, 4, (B, 1, WL), dtype=np.uint8)
    lens = np.full((B, 1), 100, np.int32)
    mwir = np.full(B, 2, np.int32)
    feats_all = np.asarray(sketch_windows(
        jnp.asarray(codes.reshape(B, WL)),
        jnp.asarray(lens.reshape(B)), k=16,
        sketchlen=16)).reshape(B, 16)
    uf = np.unique(feats_all.reshape(-1))
    uf = uf[uf != 0xFFFFFFFF]
    fs, ts, ws = [], [], []
    for i, fv in enumerate(uf):
        depth = 100 if i % 3 == 0 else 5     # deep buckets > 61
        for j in range(depth):
            fs.append(fv)
            ts.append((i + j) % NTGT)
            ws.append(j % 40)
    f = np.asarray(fs, np.uint32)
    t = np.asarray(ts, np.int32)
    w = np.asarray(ws, np.int32)
    order = np.lexsort((w, t, f))
    ft = FeatureTable.build(f[order].copy(),
                            pack_locations(t[order], w[order]),
                            max_locations_per_feature=254)
    spf = min(ft.max_bucket_size, 254)
    assert spf > 61
    lin = np.zeros((NTGT, 21), np.int32)
    lin[:, 0] = -np.arange(NTGT) - 1
    lin[:, 4] = np.arange(NTGT) // 2 + 100
    lin[:, 20] = 1
    mt, lg = jnp.asarray(lin[:, 0].copy()), jnp.asarray(lin)

    # unsharded reference: dense fused rows
    fused = ft.fused_rows(spf)
    brows, bits = make_bucket_index(ft.unique_features)
    ref = query_step_rows(
        jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(mwir),
        jnp.asarray(ft.unique_features),
        jnp.asarray(ft.offsets.astype(np.int32)),
        jnp.asarray(fused), jnp.zeros((1,), jnp.int32), mt, lg,
        jnp.int32(1), jnp.float32(0.5), jnp.int32(19), jnp.int32(0),
        jnp.asarray(brows),
        k=16, sketchlen=16, slots_per_feature=spf, windows_per_query=1,
        max_candidates=2, prefix_bits=bits, prefix_steps=0, dense=True)

    for nd, nt in ((1, 4), (2, 2)):
        mesh = M.make_mesh(nd, nt)
        st = shard_row_table(ft, nt, 254)
        assert st.slot_bits > 0 and st.head_slots == 61
        res = sharded_query_step_rows(
            jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(mwir),
            jnp.asarray(st.features), jnp.asarray(st.offsets),
            jnp.asarray(st.loc_tgt2d), jnp.asarray(st.loc_win2d),
            jnp.asarray(st.prefix), mt, lg,
            jnp.int32(1), jnp.float32(0.5), jnp.int32(19), jnp.int32(0),
            mesh=mesh, k=16, sketchlen=16,
            slots_per_feature=st.slots_per_feature, windows_per_query=1,
            max_candidates=2, prefix_bits=st.prefix_bits,
            prefix_steps=st.prefix_steps, pack_bits=st.slot_bits,
            head_slots=st.head_slots)
        # undo the data-major/table-subset row reordering
        b_loc = B // nd
        bsub = b_loc // nt
        # rows of data-shard d, table-device t hold subset t of d's rows
        got = np.concatenate([
            np.asarray(res.cls_tax).reshape(nd, nt, bsub)[d, t_]
            for d in range(nd) for t_ in range(nt)])
        np.testing.assert_array_equal(got, np.asarray(ref.cls_tax))
        ctgt = np.concatenate([
            np.asarray(res.cand_tgt).reshape(nd, nt, bsub, -1)[d, t_]
            for d in range(nd) for t_ in range(nt)])
        np.testing.assert_array_equal(ctgt, np.asarray(ref.cand_tgt))


def test_sharded_escalation_head_plus_redo():
    """Sharded escalation: head-only phase 1 is exact for reads whose
    probed buckets all fit the 61-slot heads (over=False), the OR of
    per-shard over flags rides the same all_to_all, and re-running the
    flagged reads through the full-depth sharded step reproduces the
    full-step answer for every read."""
    from metacache_tpu.ops.sketch_jax import sketch_windows
    from metacache_tpu.ops.table import FeatureTable, pack_locations
    from metacache_tpu.parallel.rows_mesh import (
        sharded_query_step_rows_head)

    rng = np.random.default_rng(21)
    B, WL, NTGT = 64, 128, 48
    codes = rng.integers(0, 4, (B, 1, WL), dtype=np.uint8)
    lens = np.full((B, 1), 100, np.int32)
    mwir = np.full(B, 2, np.int32)
    feats_all = np.asarray(sketch_windows(
        jnp.asarray(codes.reshape(B, WL)),
        jnp.asarray(lens.reshape(B)), k=16,
        sketchlen=16)).reshape(B, 16)
    uf = np.unique(feats_all.reshape(-1))
    uf = uf[uf != 0xFFFFFFFF]
    fs, ts, ws = [], [], []
    for i, fv in enumerate(uf):
        depth = 100 if i % 37 == 0 else 5    # a few buckets > 61
        for j in range(depth):
            fs.append(fv)
            ts.append((i + j) % NTGT)
            ws.append(j % 40)
    f = np.asarray(fs, np.uint32)
    t = np.asarray(ts, np.int32)
    w = np.asarray(ws, np.int32)
    order = np.lexsort((w, t, f))
    ft = FeatureTable.build(f[order].copy(),
                            pack_locations(t[order], w[order]),
                            max_locations_per_feature=254)
    lin = np.zeros((NTGT, 21), np.int32)
    lin[:, 0] = -np.arange(NTGT) - 1
    lin[:, 4] = np.arange(NTGT) // 2 + 100
    lin[:, 20] = 1
    mt, lg = jnp.asarray(lin[:, 0].copy()), jnp.asarray(lin)

    for nd, nt in ((1, 4), (2, 2)):
        mesh = M.make_mesh(nd, nt)
        st = shard_row_table(ft, nt, 254, layout="two_tier")
        assert st.slot_bits > 0
        args = (jnp.asarray(codes), jnp.asarray(lens),
                jnp.asarray(mwir),
                jnp.asarray(st.features), jnp.asarray(st.offsets),
                jnp.asarray(st.loc_tgt2d), jnp.asarray(st.loc_win2d),
                jnp.asarray(st.prefix), mt, lg,
                jnp.int32(1), jnp.float32(0.5), jnp.int32(19),
                jnp.int32(0))
        kw = dict(mesh=mesh, k=16, sketchlen=16,
                  slots_per_feature=st.slots_per_feature,
                  windows_per_query=1, max_candidates=2,
                  prefix_bits=st.prefix_bits,
                  prefix_steps=st.prefix_steps,
                  pack_bits=st.slot_bits, head_slots=st.head_slots)
        full = sharded_query_step_rows(*args, **kw)
        res1, over = sharded_query_step_rows_head(*args, **kw)
        b_loc = B // nd
        bsub = b_loc // nt

        def unshuffle(x):
            x = np.asarray(x)
            return np.concatenate([
                x.reshape((nd, nt, bsub) + x.shape[1:])[d, t_]
                for d in range(nd) for t_ in range(nt)])

        cls_full = unshuffle(full.cls_tax)
        cls_head = unshuffle(res1.cls_tax)
        ov = unshuffle(over)
        # some reads must escalate, some must not, or the test is vacuous
        assert ov.any() and not ov.all()
        # phase 1 is exact for non-escalated reads
        np.testing.assert_array_equal(cls_head[~ov], cls_full[~ov])
        # phase 2: re-dispatch the flagged reads through the full step
        idx = np.nonzero(ov)[0]
        sel = np.resize(idx, B)              # pad to the full batch
        redo = sharded_query_step_rows(
            jnp.asarray(codes[sel]), jnp.asarray(lens[sel]),
            jnp.asarray(mwir[sel]), *args[3:], **kw)
        cls_redo = unshuffle(redo.cls_tax)
        merged = cls_head.copy()
        merged[idx] = cls_redo[:len(idx)]
        np.testing.assert_array_equal(merged, cls_full)


def test_runner_sharded_escalation_summary(monkeypatch):
    """-table-shards summary run with forced two-tier shards (the
    escalation path: head-only phase 1 + full-depth redo inside the
    runner) == the unsharded summary output."""
    import io

    from metacache_tpu.classify.runner import (ClassificationResults,
                                               map_queries_to_targets)
    from metacache_tpu.cli.main import Args, parse_query_options
    from metacache_tpu.db.build import BuildOptions, build_database
    db = build_database(BuildOptions(
        infiles=[f"{DATA}/genomes.fa"], taxonomy_dir=f"{DATA}/taxonomy"))

    # count head-step launches to prove the escalation path engaged
    from metacache_tpu.parallel import rows_mesh as RM
    calls = {"head": 0}
    orig_head = RM.sharded_query_step_rows_head

    def counting_head(*a, **kw):
        calls["head"] += 1
        return orig_head(*a, **kw)

    monkeypatch.setattr(RM, "sharded_query_step_rows_head",
                        counting_head)

    def run(extra, env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        opt, _, _ = parse_query_options(Args(
            ["-no-map", "-no-query-params"] + extra))
        out = io.StringIO()
        map_queries_to_targets([f"{DATA}/reads_single.fa"], db, opt,
                               ClassificationResults(out))
        for k in env:
            monkeypatch.delenv(k, raising=False)
        return out.getvalue()

    plain = run([], {})
    sharded = run(["-table-shards", "4"],
                  {"MC_SHARD_LAYOUT": "two_tier"})
    assert sharded == plain
    assert calls["head"] > 0, "escalation head step never launched"
