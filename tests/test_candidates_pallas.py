"""Fused Pallas candidate kernel vs rows_to_result (exact parity).

The kernel replaces the sort + walk-sweep + fast_top2 chain of
ops.rows.rows_to_result; these tests drive both over randomized slot
rows (interpret mode on CPU) and assert identical candidates at small
(toy, L=192) and deep-bucket (L=1536, i64-scan regime) widths.
"""
import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from metacache_tpu.ops.candidates_pallas import candidates_pallas
from metacache_tpu.ops.rows import I32_MAX, rows_to_result

NR = 21


def _random_slots(rng, b, l, ntgt, nwin, fill=0.6):
    tgt = np.full((b, l), I32_MAX, np.int32)
    win = np.full((b, l), I32_MAX, np.int32)
    for i in range(b):
        n = int(rng.integers(0, int(l * fill) + 1))
        t = rng.integers(0, ntgt, n).astype(np.int32)
        w = rng.integers(0, nwin, n).astype(np.int32)
        tgt[i, :n] = t
        win[i, :n] = w
    return tgt, win


def _lineages(ntgt):
    lin = np.zeros((ntgt, NR), np.int32)
    lin[:, 0] = -np.arange(ntgt) - 1
    lin[:, 4] = np.arange(ntgt) // 2 + 100
    lin[:, 20] = 1
    return lin


@pytest.mark.parametrize("b,l,ntgt,nwin,walk", [
    (64, 192, 12, 40, 12),       # toy-bench shape
    (16, 1536, 40, 500, 8),      # deep-bucket shape (i64 regime in XLA)
])
def test_candidates_pallas_parity(b, l, ntgt, nwin, walk):
    rng = np.random.default_rng(11)
    lin = _lineages(ntgt)
    merge_tax = lin[:, 0].copy()
    for trial in range(3):
        tgt, win = _random_slots(rng, b, l, ntgt, nwin)
        mwir = np.full(b, 3, np.int32)
        ref = rows_to_result(
            jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
            jnp.asarray(merge_tax), jnp.asarray(lin),
            jnp.int32(1), jnp.float32(0.5), jnp.int32(19), jnp.int32(0),
            max_candidates=2, walk_elems=walk, fast_top2=True)
        with pltpu.force_tpu_interpret_mode():
            ct, ch, cb, ce = candidates_pallas(
                jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
                walk_elems=walk, max_candidates=2)
        np.testing.assert_array_equal(np.asarray(ref.cand_tgt),
                                      np.asarray(ct), err_msg="tgt")
        np.testing.assert_array_equal(np.asarray(ref.cand_hits),
                                      np.asarray(ch), err_msg="hits")
        np.testing.assert_array_equal(np.asarray(ref.cand_beg),
                                      np.asarray(cb), err_msg="beg")
        np.testing.assert_array_equal(np.asarray(ref.cand_end),
                                      np.asarray(ce), err_msg="end")


def test_candidates_pallas_empty():
    tgt = np.full((8, 192), I32_MAX, np.int32)
    win = np.full((8, 192), I32_MAX, np.int32)
    mwir = np.full(8, 3, np.int32)
    with pltpu.force_tpu_interpret_mode():
        ct, ch, cb, ce = candidates_pallas(
            jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
            walk_elems=12, max_candidates=2)
    assert (np.asarray(ct) == -1).all()
    assert (np.asarray(ch) == 0).all()


@pytest.mark.parametrize("b,l,ntgt,nwin,dwalk", [
    (64, 192, 12, 18, 6),        # short windows, heavy duplicates
    (16, 960, 40, 60, 8),        # long-read shape (5 windows x 16 x 12)
])
def test_candidates_pallas_dedup_parity(b, l, ntgt, nwin, dwalk):
    """Dedup-walk mode (long reads) vs rows_to_result(dedup_walk=...)."""
    rng = np.random.default_rng(23)
    lin = _lineages(ntgt)
    merge_tax = lin[:, 0].copy()
    for trial in range(3):
        tgt, win = _random_slots(rng, b, l, ntgt, nwin, fill=0.7)
        # force duplicate (t, w) runs like overlapping window sketches
        dup = rng.random((b, l)) < 0.5
        tgt2 = np.where(dup, np.roll(tgt, 1, axis=1), tgt)
        win2 = np.where(dup, np.roll(win, 1, axis=1), win)
        mask = tgt == np.int32(2**31 - 1)
        tgt = np.where(mask, tgt, tgt2)
        win = np.where(mask, win, win2)
        mwir = np.full(b, dwalk, np.int32)
        ref = rows_to_result(
            jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
            jnp.asarray(merge_tax), jnp.asarray(lin),
            jnp.int32(1), jnp.float32(0.5), jnp.int32(19), jnp.int32(0),
            max_candidates=2, dedup_walk=dwalk, fast_top2=True)
        with pltpu.force_tpu_interpret_mode():
            ct, ch, cb, ce = candidates_pallas(
                jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
                dedup_walk=dwalk, max_candidates=2)
        np.testing.assert_array_equal(np.asarray(ref.cand_tgt),
                                      np.asarray(ct), err_msg="tgt")
        np.testing.assert_array_equal(np.asarray(ref.cand_hits),
                                      np.asarray(ch), err_msg="hits")
        np.testing.assert_array_equal(np.asarray(ref.cand_beg),
                                      np.asarray(cb), err_msg="beg")
        np.testing.assert_array_equal(np.asarray(ref.cand_end),
                                      np.asarray(ce), err_msg="end")


def test_candidates_pallas_presorted_runs_parity():
    """presorted=r (alternating asc/desc r-lane runs, the probe's
    alt_runs emission) must equal the full sort over the same slots."""
    rng = np.random.default_rng(31)
    b, f, r, ntgt = 32, 16, 64, 30
    l = f * r
    lin = _lineages(ntgt)
    merge_tax = lin[:, 0].copy()
    for trial in range(3):
        tgt = np.full((b, f, r), I32_MAX, np.int64)
        win = np.full((b, f, r), I32_MAX, np.int64)
        for i in range(b):
            for j in range(f):
                n = int(rng.integers(0, r))
                t = np.sort(rng.integers(0, ntgt, n))
                w = rng.integers(0, 200, n)
                # sort each run ascending by (t, w)
                order = np.lexsort((w, t))
                tgt[i, j, :n] = t[order]
                win[i, j, :n] = w[order]
        plain_t = tgt.reshape(b, l).astype(np.int32)
        plain_w = win.reshape(b, l).astype(np.int32)
        alt_t = tgt.copy()
        alt_w = win.copy()
        alt_t[:, 1::2] = alt_t[:, 1::2, ::-1]
        alt_w[:, 1::2] = alt_w[:, 1::2, ::-1]
        alt_t = alt_t.reshape(b, l).astype(np.int32)
        alt_w = alt_w.reshape(b, l).astype(np.int32)
        mwir = np.full(b, 3, np.int32)
        ref = rows_to_result(
            jnp.asarray(plain_t), jnp.asarray(plain_w),
            jnp.asarray(mwir), jnp.asarray(merge_tax), jnp.asarray(lin),
            jnp.int32(1), jnp.float32(0.5), jnp.int32(19), jnp.int32(0),
            max_candidates=2, walk_elems=10, fast_top2=True)
        with pltpu.force_tpu_interpret_mode():
            ct, ch, cb, ce = candidates_pallas(
                jnp.asarray(alt_t), jnp.asarray(alt_w),
                jnp.asarray(mwir), walk_elems=10, max_candidates=2,
                presorted=r)
        np.testing.assert_array_equal(np.asarray(ref.cand_tgt),
                                      np.asarray(ct), err_msg="tgt")
        np.testing.assert_array_equal(np.asarray(ref.cand_hits),
                                      np.asarray(ch), err_msg="hits")
        np.testing.assert_array_equal(np.asarray(ref.cand_beg),
                                      np.asarray(cb), err_msg="beg")
        np.testing.assert_array_equal(np.asarray(ref.cand_end),
                                      np.asarray(ce), err_msg="end")


def _pack(tgt, win, wbits):
    pk = (tgt.astype(np.int64) << wbits) | win
    pk = np.where(tgt == np.int32(2**31 - 1), 2**31 - 1, pk)
    return pk.astype(np.int32)


@pytest.mark.parametrize("b,l,ntgt,nwin,walk", [
    (64, 192, 12, 40, 12),
    (16, 1536, 40, 500, 8),
])
def test_candidates_pallas_packed_walk_parity(b, l, ntgt, nwin, walk):
    """Packed single-key kernel == two-array kernel (walk mode)."""
    from metacache_tpu.ops.candidates_pallas import \
        candidates_pallas_packed
    rng = np.random.default_rng(47)
    wbits = max(1, (2 * (nwin - 1)).bit_length())
    for trial in range(3):
        tgt, win = _random_slots(rng, b, l, ntgt, nwin)
        mwir = np.full(b, 3, np.int32)
        with pltpu.force_tpu_interpret_mode():
            ref = candidates_pallas(
                jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
                walk_elems=walk, max_candidates=2)
            got = candidates_pallas_packed(
                jnp.asarray(_pack(tgt, win, wbits)), jnp.asarray(mwir),
                wbits, walk_elems=walk, max_candidates=2)
        for a, g, nm in zip(ref, got, ("tgt", "hits", "beg", "end")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(g),
                                          err_msg=nm)


@pytest.mark.parametrize("b,l,ntgt,nwin,dwalk", [
    (64, 192, 12, 18, 6),
    (16, 960, 40, 60, 8),
])
def test_candidates_pallas_packed_dedup_parity(b, l, ntgt, nwin, dwalk):
    from metacache_tpu.ops.candidates_pallas import \
        candidates_pallas_packed
    rng = np.random.default_rng(53)
    wbits = max(1, (2 * (nwin - 1)).bit_length())
    for trial in range(3):
        tgt, win = _random_slots(rng, b, l, ntgt, nwin, fill=0.7)
        dup = rng.random((b, l)) < 0.5
        tgt2 = np.where(dup, np.roll(tgt, 1, axis=1), tgt)
        win2 = np.where(dup, np.roll(win, 1, axis=1), win)
        mask = tgt == np.int32(2**31 - 1)
        tgt = np.where(mask, tgt, tgt2)
        win = np.where(mask, win, win2)
        mwir = np.full(b, dwalk, np.int32)
        with pltpu.force_tpu_interpret_mode():
            ref = candidates_pallas(
                jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
                dedup_walk=dwalk, max_candidates=2)
            got = candidates_pallas_packed(
                jnp.asarray(_pack(tgt, win, wbits)), jnp.asarray(mwir),
                wbits, dedup_walk=dwalk, max_candidates=2)
        for a, g, nm in zip(ref, got, ("tgt", "hits", "beg", "end")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(g),
                                          err_msg=nm)


def test_candidates_pallas_packed_presorted_parity():
    """Packed kernel with alternating presorted runs == full sort."""
    from metacache_tpu.ops.candidates_pallas import \
        candidates_pallas_packed
    rng = np.random.default_rng(59)
    b, f, r, ntgt, nwin = 32, 16, 64, 30, 400
    l = f * r
    wbits = max(1, (2 * (nwin - 1)).bit_length())
    for trial in range(2):
        pk = np.full((b, f, r), 2**31 - 1, np.int32)
        for i in range(b):
            for j in range(f):
                n = int(rng.integers(0, r + 1))
                t = rng.integers(0, ntgt, n).astype(np.int64)
                w = rng.integers(0, nwin, n).astype(np.int64)
                v = np.sort((t << wbits) | w)
                if j & 1:
                    pk[i, j, r - n:] = v[::-1]
                else:
                    pk[i, j, :n] = v
        pk = pk.reshape(b, l)
        mwir = np.full(b, 3, np.int32)
        with pltpu.force_tpu_interpret_mode():
            ref = candidates_pallas_packed(
                jnp.asarray(pk), jnp.asarray(mwir), wbits,
                walk_elems=10, max_candidates=2)
            got = candidates_pallas_packed(
                jnp.asarray(pk), jnp.asarray(mwir), wbits,
                walk_elems=10, max_candidates=2, presorted=r)
        for a, g, nm in zip(ref, got, ("tgt", "hits", "beg", "end")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(g),
                                          err_msg=nm)


def test_candidates_pallas_topk_tie_stress():
    """Adversarial ties for the global-max top-k: many target groups
    with IDENTICAL best hit counts (winner must be the group whose best
    window range sorts earliest), exact-duplicate slots, rows with a
    single group, and rows where every group ties at hits=1."""
    ntgt, l, walk = 16, 192, 12
    lin = _lineages(ntgt)
    merge_tax = lin[:, 0].copy()
    rows_t, rows_w = [], []
    # 8 groups x 6 identical-hit slots each (all same window => 6 hits)
    t = np.full(l, I32_MAX, np.int32)
    w = np.full(l, I32_MAX, np.int32)
    for g in range(8):
        t[g * 6:(g + 1) * 6] = g
        w[g * 6:(g + 1) * 6] = 50
    rows_t.append(t.copy()); rows_w.append(w.copy())
    # every group ties at hits=1 (one slot each, distinct windows)
    t = np.full(l, I32_MAX, np.int32)
    w = np.full(l, I32_MAX, np.int32)
    t[:ntgt] = np.arange(ntgt)
    w[:ntgt] = np.arange(ntgt) * 7
    rows_t.append(t.copy()); rows_w.append(w.copy())
    # single group only
    t = np.full(l, I32_MAX, np.int32)
    w = np.full(l, I32_MAX, np.int32)
    t[:10] = 3
    w[:10] = np.arange(10)
    rows_t.append(t.copy()); rows_w.append(w.copy())
    # two groups, second has more hits (order inversion)
    t = np.full(l, I32_MAX, np.int32)
    w = np.full(l, I32_MAX, np.int32)
    t[:4] = 1; w[:4] = 9
    t[4:12] = 14; w[4:12] = 9
    rows_t.append(t.copy()); rows_w.append(w.copy())
    tgt = np.stack(rows_t); win = np.stack(rows_w)
    mwir = np.full(len(rows_t), 3, np.int32)
    ref = rows_to_result(
        jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
        jnp.asarray(merge_tax), jnp.asarray(lin),
        jnp.int32(1), jnp.float32(0.5), jnp.int32(19), jnp.int32(0),
        max_candidates=2, walk_elems=walk, fast_top2=True)
    wbits = max(1, int(2 * win[win != I32_MAX].max()).bit_length())
    from metacache_tpu.ops.candidates_pallas import \
        candidates_pallas_packed
    with pltpu.force_tpu_interpret_mode():
        ct, ch, cb, ce = candidates_pallas(
            jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
            walk_elems=walk, max_candidates=2)
        # the packed kernel received the same global-max top-k rewrite
        # plus a single-pbest (tgt, end) reduction — mirror the
        # adversarial tie rows through it as well (ADVICE round 4)
        pt, ph, pb, pe = candidates_pallas_packed(
            jnp.asarray(_pack(tgt, win, wbits)), jnp.asarray(mwir),
            wbits, walk_elems=walk, max_candidates=2)
    for got in ((ct, ch, cb, ce), (pt, ph, pb, pe)):
        np.testing.assert_array_equal(np.asarray(ref.cand_tgt),
                                      np.asarray(got[0]), err_msg="tgt")
        np.testing.assert_array_equal(np.asarray(ref.cand_hits),
                                      np.asarray(got[1]),
                                      err_msg="hits")
        np.testing.assert_array_equal(np.asarray(ref.cand_beg),
                                      np.asarray(got[2]), err_msg="beg")
        np.testing.assert_array_equal(np.asarray(ref.cand_end),
                                      np.asarray(got[3]), err_msg="end")


def test_candidates_pallas_packed_split_parity():
    """split=True (standalone sort kernel + sort-skipping sweep kernel)
    == the fused single-kernel path."""
    from metacache_tpu.ops.candidates_pallas import \
        candidates_pallas_packed
    rng = np.random.default_rng(67)
    b, l, ntgt, nwin = 32, 384, 24, 200
    wbits = max(1, (2 * (nwin - 1)).bit_length())
    tgt, win = _random_slots(rng, b, l, ntgt, nwin)
    pk = _pack(tgt, win, wbits)
    mwir = np.full(b, 3, np.int32)
    with pltpu.force_tpu_interpret_mode():
        ref = candidates_pallas_packed(
            jnp.asarray(pk), jnp.asarray(mwir), wbits,
            walk_elems=10, max_candidates=2)
        got = candidates_pallas_packed(
            jnp.asarray(pk), jnp.asarray(mwir), wbits,
            walk_elems=10, max_candidates=2, split=True)
    for a, g, nm in zip(ref, got, ("tgt", "hits", "beg", "end")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(g),
                                      err_msg=nm)
