"""u64-feature device probe layout (k > 16): fused rows with two-lane
feature meta + low-32 bucket index vs the searchsorted CSR probe."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metacache_tpu.utils.platform import ensure_feature_width

ensure_feature_width(18)

from metacache_tpu.ops.probe import make_bucket_index64  # noqa: E402
from metacache_tpu.ops.rows import query_step_rows  # noqa: E402
from metacache_tpu.ops.table import (FeatureTable,  # noqa: E402
                                     pack_locations, unpack_locations)
from metacache_tpu.ops.table_device import (  # noqa: E402
    device_layout_from_csr)


def _u64_table(rng, nfeat=3000, ntgt=48, deep_every=9, cap=254):
    pool = rng.integers(0, 2**63, nfeat).astype(np.uint64) * 2 + 1
    pool = np.unique(pool)
    fs, ts, ws = [], [], []
    for i, fv in enumerate(pool):
        depth = 100 if i % deep_every == 0 else 4
        for j in range(depth):
            fs.append(fv)
            ts.append((i + j) % ntgt)
            ws.append(j % 40)
    f = np.asarray(fs, np.uint64)
    t = np.asarray(ts, np.uint32)
    w = np.asarray(ws, np.uint32)
    order = np.lexsort((w, t, f))
    return FeatureTable.build(f[order].copy(),
                              pack_locations(t[order], w[order]),
                              max_locations_per_feature=cap)


@pytest.mark.parametrize("budget", [1 << 40, 6 << 20])
def test_u64_device_layout_matches_csr(budget):
    """Dense and two-tier u64 layouts classify exactly like the
    searchsorted CSR probe over the same synthetic queries."""
    rng = np.random.default_rng(71)
    ft = _u64_table(rng)
    ltgt, lwin = unpack_locations(ft.locations)
    dt = device_layout_from_csr(ft.unique_features, ft.offsets,
                                ltgt, lwin, cap=254,
                                budget_bytes=budget, nch=4)
    assert dt.uniq.dtype == jnp.uint64 and dt.slot_bits > 0
    spf = dt.spf
    ntgt = 48
    lin = np.zeros((ntgt, 21), np.int32)
    lin[:, 0] = -np.arange(ntgt) - 1
    lin[:, 4] = np.arange(ntgt) // 2 + 100
    lin[:, 20] = 1
    mt, lg = jnp.asarray(lin[:, 0].copy()), jnp.asarray(lin)

    # queries whose sketches are stored features (+ some misses)
    B, s = 32, 16
    feats = np.full((B, s), 0xFFFFFFFFFFFFFFFF, np.uint64)
    for i in range(B):
        n = int(rng.integers(1, s + 1))
        sel = rng.integers(0, len(ft.unique_features), n)
        feats[i, :n] = ft.unique_features[sel]
        if i % 3 == 0:      # sprinkle misses
            feats[i, 0] = np.uint64(2 * i + 2)
    feats = jnp.asarray(np.sort(feats, axis=1))
    mwir = jnp.asarray(np.full(B, 3, np.int32))

    from metacache_tpu.ops.rows import probe_rows, rows_to_result

    def classify(tag, tf, to, la, lb, ps, bits, steps):
        tgt, win = probe_rows(
            feats, tf, to, la, lb, spf, ps, bits, steps, dense=tag)
        return rows_to_result(
            tgt, win, mwir, mt, lg, jnp.int32(1), jnp.float32(0.5),
            jnp.int32(19), jnp.int32(0), max_candidates=2,
            walk_elems=2 * s, fast_top2=True)

    got = classify(
        ("u64pk%d%s" % (dt.slot_bits, "p" if dt.packed else ""))
        if dt.dense else
        ("u64_two_tier", dt.head_slots, dt.packed, dt.ovf_packed,
         dt.slot_bits),
        dt.uniq, dt.offsets, dt.head, dt.ovf, dt.brows, dt.bbits, 0)

    ref = classify(
        False, jnp.asarray(ft.unique_features),
        jnp.asarray(ft.offsets.astype(np.int32)),
        jnp.asarray(ltgt.astype(np.int32)),
        jnp.asarray(lwin.astype(np.int32)), None, 0, 0)
    np.testing.assert_array_equal(np.asarray(ref.cls_tax),
                                  np.asarray(got.cls_tax))
    np.testing.assert_array_equal(np.asarray(ref.cand_tgt),
                                  np.asarray(got.cand_tgt))
    np.testing.assert_array_equal(np.asarray(ref.cand_hits),
                                  np.asarray(got.cand_hits))


def test_bucket_index64_collision_detection():
    """Two features sharing (hash bucket, low-32) must be detected."""
    f = np.sort(np.asarray(
        [0x1234567800000001, 0x123456F800000001], np.uint64))
    # same top bits for small `bits`? force bits where they collide:
    # top 12 bits of both = 0x123 -> same bucket; low32 equal
    out = make_bucket_index64(f, bits=12)
    assert out is None
    # distinct low-32: fine
    f2 = np.sort(np.asarray(
        [0x1234567800000001, 0x123456F800000002], np.uint64))
    out2 = make_bucket_index64(f2, bits=12)
    assert out2 is not None
