"""On-device table construction vs the host FeatureTable: exact parity.

build_device_table must reproduce FeatureTable's fused_rows_two_tier /
make_bucket_index layouts bit-for-bit for the same (feature, tgt, win)
stream, including bucket capping and head/overflow splits.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from metacache_tpu.ops.probe import make_bucket_index
from metacache_tpu.ops.table import FeatureTable, pack_locations
from metacache_tpu.ops.table_device import build_device_table


def _unpack(arr, n=None, packed=None):
    """Undo pair-packing: (R, 128) -> (2R, 64); wider arrays unchanged.
    `packed` overrides the width heuristic (slot-packed layouts can
    have genuine 128-lane rows)."""
    a = np.asarray(arr)
    if packed is None:
        packed = a.ndim == 2 and a.shape[1] == 128
    if packed:
        a = a.reshape(-1, 64)
    return a if n is None else a[:n]


def _stream(rng, n, nf_hint, ntgt, deep_every=7):
    """Build-order (feature, tgt, win) stream: ascending (tgt, win),
    some features very deep (strain-sharing), some singletons."""
    feats = []
    tgts = []
    wins = []
    pool = rng.integers(0, 2**32, nf_hint, dtype=np.uint32)
    deep = pool[::deep_every]
    w = 0
    for t in range(ntgt):
        for w in range(n // ntgt):
            if rng.random() < 0.5:
                f = deep[rng.integers(0, len(deep))]
            else:
                f = pool[rng.integers(0, len(pool))]
            feats.append(f)
            tgts.append(t)
            wins.append(w)
    return (np.asarray(feats, np.uint32), np.asarray(tgts, np.int32),
            np.asarray(wins, np.int32))


@pytest.mark.parametrize("cap,budget", [
    (254, None),            # dense fits -> head == spf
    (254, 4 << 20),         # force a two-tier split
    (6, None),              # tight cap -> heavy truncation
])
def test_device_table_parity(cap, budget):
    rng = np.random.default_rng(5)
    f, t, w = _stream(rng, 6000, 300, 8)
    ft = FeatureTable.build(f.copy(), pack_locations(t, w),
                            max_locations_per_feature=cap,
                            presorted_within_feature=True)
    spf = max(min(ft.max_bucket_size, cap), 1)
    if budget is None:
        budget = 1 << 40
    dt = build_device_table(jnp.asarray(f), jnp.asarray(t),
                            jnp.asarray(w), cap=cap,
                            budget_bytes=budget, nch=4)
    nf = ft.num_features
    assert dt.nf == nf
    assert dt.spf == spf
    assert dt.num_locations == ft.num_locations
    np.testing.assert_array_equal(np.asarray(dt.uniq)[:nf],
                                  ft.unique_features)
    assert (np.asarray(dt.uniq)[nf:] == 0xFFFFFFFF).all()
    np.testing.assert_array_equal(np.asarray(dt.offsets)[:nf + 1],
                                  ft.offsets.astype(np.int32))
    if dt.dense:
        assert dt.head_slots == spf
        np.testing.assert_array_equal(
            _unpack(dt.head, nf, dt.packed),
            ft.fused_rows(spf, dt.slot_bits))
    else:
        head, ovf = ft.fused_rows_two_tier(spf, dt.head_slots,
                                           dt.slot_bits)
        np.testing.assert_array_equal(
            _unpack(dt.head, nf, dt.packed), head)
        novf_used = head[:, 2].max() + 1
        got_ovf = _unpack(dt.ovf, packed=dt.ovf_packed)
        np.testing.assert_array_equal(got_ovf[:novf_used, :ovf.shape[1]],
                                      ovf)
    brows, bits = make_bucket_index(ft.unique_features, dt.bbits)
    got = _unpack(dt.brows)
    assert bits == dt.bbits
    # host rows may be wider than 64 only when spans exceed it (the
    # device builder asserts they don't); the last bucket row also
    # holds the sentinel padding features, whose value (-1) equals the
    # empty-lane fill, so it still compares equal
    np.testing.assert_array_equal(got[:, 0], brows[:, 0])
    np.testing.assert_array_equal(got[:, 1:64], brows[:, 1:64])


def test_device_table_empty_and_tiny():
    f = np.asarray([7, 7, 7], np.uint32)
    t = np.asarray([0, 1, 2], np.int32)
    w = np.asarray([3, 4, 5], np.int32)
    dt = build_device_table(jnp.asarray(f), jnp.asarray(t),
                            jnp.asarray(w), cap=2,
                            budget_bytes=1 << 30, nch=2)
    assert dt.nf == 1 and dt.spf == 2 and dt.num_locations == 2
    row = _unpack(dt.head)[0]
    assert row[0] == 7 and row[1] == 2


def test_device_accumulator_end_to_end():
    """DeviceSketchAccumulator + build_device_table == host
    SketchAccumulator + FeatureTable over real sketched genomes."""
    from metacache_tpu.config import SketchingOptions
    from metacache_tpu.db.sketch_exec import (DeviceSketchAccumulator,
                                              SketchAccumulator)
    from metacache_tpu.ops import windows as W

    rng = np.random.default_rng(9)
    opt = SketchingOptions().resolved()
    genomes = [rng.integers(0, 4, 40_000, dtype=np.uint8)
               for _ in range(3)]
    genomes.append(genomes[0].copy())          # a duplicate "strain"

    hacc = SketchAccumulator(opt.kmerlen, opt.sketchlen)
    dacc = DeviceSketchAccumulator(opt.kmerlen, opt.sketchlen)
    for tid, g in enumerate(genomes):
        wm, vl = W.sequence_windows(g, opt)
        hacc.add_target(wm, vl, tid)
        dacc.add_target(wm, vl, tid)
    bf, bl = hacc.finish()
    ft = FeatureTable.build(bf, bl, presorted_within_feature=True,
                            max_locations_per_feature=3)
    f, t, w = dacc.finish_device()
    dt = build_device_table(f, t, w, cap=3, budget_bytes=1 << 40, nch=4)
    nf = ft.num_features
    assert dt.nf == nf
    assert dt.num_locations == ft.num_locations
    np.testing.assert_array_equal(np.asarray(dt.uniq)[:nf],
                                  ft.unique_features)
    spf = max(min(ft.max_bucket_size, 3), 1)
    want = ft.fused_rows(spf, dt.slot_bits) if dt.dense else \
        ft.fused_rows_two_tier(spf, dt.head_slots, dt.slot_bits)[0]
    np.testing.assert_array_equal(_unpack(dt.head, nf, dt.packed),
                                  want)


def test_device_layout_from_csr_parity():
    """CSR -> device rows == host fused rows, dense and two-tier."""
    from metacache_tpu.ops.table import unpack_locations
    from metacache_tpu.ops.table_device import device_layout_from_csr

    rng = np.random.default_rng(3)
    f, t, w = _stream(rng, 5000, 200, 6)
    ft = FeatureTable.build(f.copy(), pack_locations(t, w),
                            max_locations_per_feature=254,
                            presorted_within_feature=True)
    ltgt, lwin = unpack_locations(ft.locations)
    spf = max(min(ft.max_bucket_size, 254), 1)
    for budget in (1 << 40, 4 << 20):
        dt = device_layout_from_csr(ft.unique_features, ft.offsets,
                                    ltgt, lwin, cap=254,
                                    budget_bytes=budget, nch=4)
        nf = ft.num_features
        assert dt.nf == nf
        if dt.dense:
            np.testing.assert_array_equal(
                _unpack(dt.head, nf, dt.packed),
                ft.fused_rows(spf, dt.slot_bits))
        else:
            head, ovf = ft.fused_rows_two_tier(spf, dt.head_slots,
                                               dt.slot_bits)
            np.testing.assert_array_equal(
                _unpack(dt.head, nf, dt.packed), head)
            got_ovf = _unpack(dt.ovf, packed=dt.ovf_packed)
            np.testing.assert_array_equal(
                got_ovf[:head[:, 2].max() + 1, :ovf.shape[1]], ovf)
        brows, bits = make_bucket_index(ft.unique_features, dt.bbits)
        got = _unpack(dt.brows)
        np.testing.assert_array_equal(got[:, 0], brows[:, 0])
        np.testing.assert_array_equal(got[:, 1:64], brows[:, 1:64])


@pytest.mark.parametrize("budget", [None, 4 << 20])
def test_export_csr_roundtrip(budget):
    """export_csr reconstructs the exact CSR stream the device table was
    built from (dense and two-tier, slot-packed layouts) — the `build`
    mode's save path."""
    from metacache_tpu.ops.table_device import export_csr
    rng = np.random.default_rng(23)
    f, t, w = _stream(rng, 60_000, 4000, 16)
    ft = FeatureTable.build(
        f.copy(), pack_locations(t.astype(np.uint32),
                                 w.astype(np.uint32)),
        max_locations_per_feature=254,
        presorted_within_feature=True)
    dt = build_device_table(jnp.asarray(f), jnp.asarray(t),
                            jnp.asarray(w), cap=254,
                            budget_bytes=budget, nch=4)
    uniq, offs, locs = export_csr(dt)
    np.testing.assert_array_equal(uniq, ft.unique_features)
    np.testing.assert_array_equal(offs, ft.offsets)
    np.testing.assert_array_equal(locs, ft.locations)


@pytest.mark.parametrize("cap,budget", [
    (254, None),            # dense
    (254, 4 << 20),         # two-tier split
    (6, None),              # tight cap
])
def test_grouped_build_parity(cap, budget):
    """The bounded-memory grouped build (gbits > 0, multiple input
    chunks) must produce the exact same DeviceTable as the single-group
    path — global row/overflow/bucket-index layouts are invariant to
    the feature-range grouping."""
    from metacache_tpu.ops.table_device import build_device_table_chunked
    rng = np.random.default_rng(17)
    f, t, w = _stream(rng, 8000, 400, 8)
    if budget is None:
        budget = 1 << 40

    def chunked(lst, k):
        out = []
        for i in range(0, len(lst[0]), k):
            out.append(tuple(jnp.asarray(a[i:i + k]) for a in lst))
        return out

    dt1 = build_device_table_chunked(chunked((f, t, w), len(f)),
                                     cap=cap, budget_bytes=budget,
                                     nch=4, gbits=0)
    dt4 = build_device_table_chunked(chunked((f, t, w), 1111),
                                     cap=cap, budget_bytes=budget,
                                     nch=4, gbits=2)
    assert dt1.nf == dt4.nf
    assert dt1.spf == dt4.spf
    assert dt1.num_locations == dt4.num_locations
    assert dt1.dense == dt4.dense and dt1.head_slots == dt4.head_slots
    for name in ("uniq", "offsets", "head", "ovf", "brows"):
        np.testing.assert_array_equal(
            np.asarray(getattr(dt1, name)),
            np.asarray(getattr(dt4, name)), err_msg=name)


def test_grouped_csr_parity():
    """device_layout_from_csr grouped staging (gbits=2) == single-group
    staging, dense and two-tier."""
    from metacache_tpu.ops.table import unpack_locations
    from metacache_tpu.ops.table_device import device_layout_from_csr
    rng = np.random.default_rng(29)
    f, t, w = _stream(rng, 7000, 300, 6)
    ft = FeatureTable.build(f.copy(), pack_locations(t, w),
                            max_locations_per_feature=254,
                            presorted_within_feature=True)
    ltgt, lwin = unpack_locations(ft.locations)
    for budget in (1 << 40, 4 << 20):
        dt1 = device_layout_from_csr(ft.unique_features, ft.offsets,
                                     ltgt, lwin, cap=254,
                                     budget_bytes=budget, nch=4,
                                     gbits=0)
        dt4 = device_layout_from_csr(ft.unique_features, ft.offsets,
                                     ltgt, lwin, cap=254,
                                     budget_bytes=budget, nch=4,
                                     gbits=2)
        for name in ("uniq", "offsets", "head", "ovf", "brows"):
            np.testing.assert_array_equal(
                np.asarray(getattr(dt1, name)),
                np.asarray(getattr(dt4, name)), err_msg=name)


def test_grouped_classed_parity(monkeypatch):
    """Grouped fills reproduce the size-classed layout bit-for-bit."""
    from metacache_tpu.ops.table import unpack_locations
    from metacache_tpu.ops.table_device import device_layout_from_csr
    monkeypatch.setenv("MC_CLASSED", "1")
    rng = np.random.default_rng(31)
    f, t, w = _stream(rng, 9000, 250, 6, deep_every=3)
    ft = FeatureTable.build(f.copy(), pack_locations(t, w),
                            max_locations_per_feature=254,
                            presorted_within_feature=True)
    ltgt, lwin = unpack_locations(ft.locations)
    dts = [device_layout_from_csr(ft.unique_features, ft.offsets,
                                  ltgt, lwin, cap=254,
                                  budget_bytes=6 << 20, nch=4,
                                  gbits=gb, allow_dense=False)
           for gb in (0, 2)]
    assert dts[0].classed and dts[1].classed
    for name in ("uniq", "offsets", "head", "ovf", "brows"):
        np.testing.assert_array_equal(
            np.asarray(getattr(dts[0], name)),
            np.asarray(getattr(dts[1], name)), err_msg=name)
