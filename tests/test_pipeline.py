"""Device pipeline vs NumPy oracle: randomized candidate/classification
parity, plus FeatureTable semantics."""
import numpy as np
import pytest

import jax.numpy as jnp

from metacache_tpu.config import SketchingOptions, max_windows_in_range
from metacache_tpu.core import sketch as osketch
from metacache_tpu.core.candidates import (CandidateGenerationRules,
                                           generate_candidates)
from metacache_tpu.ops import windows as W
from metacache_tpu.ops.pipeline import query_step
from metacache_tpu.ops.table import (FeatureTable, pack_locations,
                                     unpack_locations)

OPT = SketchingOptions().resolved()
NR = 21


def _random_genomes(rng, n, length):
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    return [alpha[rng.integers(0, 4, length)].tobytes() for _ in range(n)]


def _build_table(genomes):
    feats, locs = [], []
    for tid, g in enumerate(genomes):
        for win, sk in osketch.for_each_sketch(g, OPT):
            feats.append(np.asarray(sk, np.uint32))
            locs.append(pack_locations(np.full(len(sk), tid, np.uint32),
                                       np.full(len(sk), win, np.uint32)))
    return FeatureTable.build(np.concatenate(feats), np.concatenate(locs))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    genomes = _random_genomes(rng, 8, 12000)
    ft = _build_table(genomes)
    lineages = np.zeros((8, NR), np.int32)
    lineages[:, 0] = -np.arange(8) - 1
    lineages[:, 4] = np.arange(8) // 2 + 100  # two targets per species
    lineages[:, 6] = np.arange(8) // 4 + 200
    lineages[:, 20] = 1
    return rng, genomes, ft, lineages


def _run_device(reads, ft, lineages, merge_rank=0, hits_min=5,
                max_candidates=2, hits_diff=1.0):
    ltgt, lwin = unpack_locations(ft.locations)
    merge_tax = np.zeros(lineages.shape[0], np.int32)
    for r in range(merge_rank, NR):
        fill = (merge_tax == 0) & (lineages[:, r] != 0)
        merge_tax[fill] = lineages[:, r][fill]
    wins, valid, qid = W.batch_windows(reads, OPT, pad_to=None)
    t = len(wins)
    b = len(reads)
    mwir = np.array([max_windows_in_range(len(r), 0, OPT.winstride)
                     for r in reads], np.int32)
    return query_step(
        jnp.asarray(wins), jnp.asarray(valid), jnp.asarray(qid),
        jnp.asarray(mwir),
        jnp.asarray(ft.unique_features),
        jnp.asarray(ft.offsets.astype(np.int32)),
        jnp.asarray(ltgt.astype(np.int32)),
        jnp.asarray(lwin.astype(np.int32)),
        jnp.asarray(merge_tax), jnp.asarray(lineages),
        jnp.int32(hits_min), jnp.float32(hits_diff), jnp.int32(19),
        jnp.int32(merge_rank),
        k=OPT.kmerlen, sketchlen=OPT.sketchlen,
        slots_per_feature=max(ft.max_bucket_size, 1),
        num_queries=b, max_candidates=max_candidates)


def _oracle_candidates(read, ft, lineages, merge_rank, max_candidates):
    feats = osketch.all_query_features(read, None, OPT)
    matches = []
    fl = ft.unique_features
    for f in feats:
        i = np.searchsorted(fl, f)
        if i < len(fl) and fl[i] == f:
            for l in ft.locations[ft.offsets[i]:ft.offsets[i + 1]]:
                matches.append((int(l >> np.uint64(32)),
                                int(l & np.uint64(0xFFFFFFFF))))
    matches.sort()

    def tax_of(tgt):
        for r in range(merge_rank, NR):
            if lineages[tgt, r] != 0:
                return int(lineages[tgt, r])
        return None

    rules = CandidateGenerationRules(
        max_windows_in_range=max_windows_in_range(len(read), 0,
                                                  OPT.winstride),
        max_candidates=max_candidates,
        merge_below_is_sequence=(merge_rank == 0),
        taxon_of_target=tax_of,
        lowest_ranked_ancestor=tax_of)
    return generate_candidates(matches, rules)


@pytest.mark.parametrize("merge_rank", [0, 4, 6])
@pytest.mark.parametrize("maxcand", [2, 4])
def test_candidates_match_oracle(setup, merge_rank, maxcand):
    rng, genomes, ft, lineages = setup
    reads = []
    for _ in range(40):
        g = genomes[rng.integers(0, len(genomes))]
        ln = int(rng.choice([100, 150, 300, 500]))
        p = int(rng.integers(0, len(g) - ln))
        reads.append(g[p:p + ln])
    res = _run_device(reads, ft, lineages, merge_rank=merge_rank,
                      max_candidates=maxcand)
    cand_tax = np.asarray(res.cand_tax)
    cand_hits = np.asarray(res.cand_hits)
    for i, read in enumerate(reads):
        oc = _oracle_candidates(read, ft, lineages, merge_rank, maxcand)
        dev = [(int(cand_tax[i, j]), int(cand_hits[i, j]))
               for j in range(maxcand) if cand_tax[i, j] != 0]
        want = [(int(c.tax), int(c.hits)) for c in oc]
        assert dev == want, f"read {i}: {dev} != {want}"


def test_window_ranges_match_oracle(setup):
    rng, genomes, ft, lineages = setup
    reads = []
    for _ in range(20):
        g = genomes[rng.integers(0, len(genomes))]
        ln = int(rng.choice([300, 800, 2000]))
        p = int(rng.integers(0, len(g) - ln))
        reads.append(g[p:p + ln])
    res = _run_device(reads, ft, lineages)
    for i, read in enumerate(reads):
        oc = _oracle_candidates(read, ft, lineages, 0, 2)
        for j, c in enumerate(oc):
            assert int(res.cand_beg[i, j]) == c.pos.beg
            assert int(res.cand_end[i, j]) == c.pos.end


def test_table_cap_and_culls():
    rng = np.random.default_rng(1)
    feats = rng.integers(0, 100, 5000).astype(np.uint32)
    locs = pack_locations(rng.integers(0, 10, 5000).astype(np.uint32),
                          rng.integers(0, 1000, 5000).astype(np.uint32))
    ft = FeatureTable.build(feats, locs, max_locations_per_feature=30)
    assert ft.max_bucket_size <= 30
    # per-bucket locations ascending
    for i in range(ft.num_features):
        seg = ft.locations[ft.offsets[i]:ft.offsets[i + 1]]
        assert np.all(seg[:-1] <= seg[1:])
    n0 = ft.num_features
    removed = ft.remove_features_with_more_locations_than(25)
    assert ft.num_features == n0 - removed
    assert ft.max_bucket_size <= 25

    taxa = np.arange(10, dtype=np.int64) % 3 + 1
    removed2 = ft.remove_ambiguous_features(2, taxa)
    sizes = ft.bucket_sizes()
    assert np.all(sizes > 0)
    assert removed2 >= 0


def test_table_merge_matches_combined_build():
    rng = np.random.default_rng(3)
    f1 = rng.integers(0, 500, 2000).astype(np.uint32)
    l1 = pack_locations(rng.integers(0, 5, 2000).astype(np.uint32),
                        rng.integers(0, 100, 2000).astype(np.uint32))
    f2 = rng.integers(0, 500, 2000).astype(np.uint32)
    l2 = pack_locations(rng.integers(5, 9, 2000).astype(np.uint32),
                        rng.integers(0, 100, 2000).astype(np.uint32))
    a = FeatureTable.build(f1, l1)
    b = FeatureTable.build(f2, l2)
    m = a.merge(b)
    c = FeatureTable.build(np.concatenate([f1, f2]),
                           np.concatenate([l1, l2]))
    np.testing.assert_array_equal(m.unique_features, c.unique_features)
    np.testing.assert_array_equal(m.locations, c.locations)


def test_prefix_index_probe_consistency():
    """prefix_index() and probe_features must agree on the bit width
    (regression: a 16/20-bit mismatch made every probe miss)."""
    from metacache_tpu.ops.probe import probe_features, DEFAULT_BITS
    rng = np.random.default_rng(9)
    feats = np.unique(rng.integers(0, 2**32, 50000,
                                   dtype=np.uint64).astype(np.uint32))
    ft = FeatureTable(feats, np.arange(len(feats) + 1, dtype=np.int64),
                      np.zeros(len(feats), np.uint64))
    ps, steps = ft.prefix_index()
    q = feats[rng.integers(0, len(feats), 500)]
    idx, found = probe_features(jnp.asarray(q), jnp.asarray(feats),
                                jnp.asarray(ps), DEFAULT_BITS, steps)
    assert np.asarray(found).all()
    np.testing.assert_array_equal(feats[np.asarray(idx)], q)
    # absent features must miss
    absent = np.setdiff1d(
        rng.integers(0, 2**32, 1000, dtype=np.uint64).astype(np.uint32),
        feats)[:100]
    _, found2 = probe_features(jnp.asarray(absent), jnp.asarray(feats),
                               jnp.asarray(ps), DEFAULT_BITS, steps)
    assert not np.asarray(found2).any()


@pytest.mark.parametrize("span", [2, 4, 8, 16, 64])
def test_prefix_probe_power_of_two_spans(span):
    """Regression: exact power-of-two prefix spans need one extra search
    step or probes silently miss."""
    from metacache_tpu.ops.probe import make_prefix_index, probe_features
    bits = 20
    # craft features so one prefix bucket holds exactly `span` entries
    base = np.uint32(7 << (32 - bits))
    feats = np.sort((base + np.arange(span, dtype=np.uint32) * 7)
                    .astype(np.uint32))
    ps, steps = make_prefix_index(feats, bits)
    idx, found = probe_features(jnp.asarray(feats), jnp.asarray(feats),
                                jnp.asarray(ps), bits, steps)
    assert np.asarray(found).all()
    np.testing.assert_array_equal(np.asarray(idx), np.arange(span))


def test_walk_hits_matches_rank_join():
    """rows_to_result walk_elems path (masked lane shifts) must equal the
    rank-join sort path bit-for-bit: candidates, hits, ranges, taxa."""
    from metacache_tpu.ops.rows import rows_to_result
    rng = np.random.default_rng(7)
    b, l = 64, 96
    ntgt = 12
    lineages = np.zeros((ntgt, 21), np.int32)
    lineages[:, 0] = -np.arange(ntgt) - 1
    lineages[:, 4] = np.arange(ntgt) // 3 + 50
    lineages[:, 20] = 1
    merge_tax = lineages[:, 0].copy()
    for trial in range(4):
        # clustered duplicates: few targets, few windows -> long runs
        tgt = rng.integers(0, ntgt, (b, l)).astype(np.int32)
        win = rng.integers(0, 6, (b, l)).astype(np.int32)
        pad = rng.random((b, l)) < 0.3
        tgt[pad] = 2**31 - 1
        win[pad] = 2**31 - 1
        mwir = rng.integers(2, 5, b).astype(np.int32)
        args = (jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
                jnp.asarray(merge_tax), jnp.asarray(lineages),
                jnp.int32(2), jnp.float32(0.5), jnp.int32(19),
                jnp.int32(0))
        a = rows_to_result(*args, max_candidates=3, walk_elems=0)
        # worst case: every slot of a range can collide -> walk l slots
        wk = rows_to_result(*args, max_candidates=3, walk_elems=l - 1)
        for fld in ("cand_tgt", "cand_tax", "cand_hits", "cand_beg",
                    "cand_end", "cls_tax"):
            assert np.array_equal(np.asarray(getattr(a, fld)),
                                  np.asarray(getattr(wk, fld))), \
                (trial, fld)


def test_bucket_index_probe_matches_searchsorted():
    from metacache_tpu.ops.probe import make_bucket_index, probe_bucket
    rng = np.random.default_rng(3)
    for nf in (0, 1, 1000, 100000):
        feats = np.unique(rng.integers(
            0, 2**32, nf, dtype=np.uint64).astype(np.uint32))
        probes = np.concatenate([
            rng.choice(feats, 300) if len(feats) else
            np.zeros(0, np.uint32),
            rng.integers(0, 2**32, 300, dtype=np.uint64).astype(
                np.uint32),
            np.full(8, 0xFFFFFFFF, np.uint32)])
        br, bits = make_bucket_index(feats)
        idx_b, found_b = probe_bucket(jnp.asarray(probes),
                                      jnp.asarray(br), bits)
        idx_b = np.clip(np.asarray(idx_b), 0, max(len(feats) - 1, 0))
        found_b = np.asarray(found_b)
        if len(feats):
            idx_r = np.searchsorted(feats, probes)
            found_r = (idx_r < len(feats)) & \
                (feats[np.minimum(idx_r, len(feats) - 1)] == probes) & \
                (probes != np.uint32(0xFFFFFFFF))
            assert np.array_equal(found_b, found_r)
            assert np.array_equal(idx_b[found_r], idx_r[found_r])
        else:
            assert not found_b.any()


def test_dedup_walk_matches_rank_join():
    """dedup_walk path (compact duplicate runs, then walk distinct
    entries) must equal the rank-join sort path bit-for-bit."""
    from metacache_tpu.ops.rows import rows_to_result
    rng = np.random.default_rng(11)
    b, l = 48, 160
    ntgt = 10
    lineages = np.zeros((ntgt, 21), np.int32)
    lineages[:, 0] = -np.arange(ntgt) - 1
    lineages[:, 4] = np.arange(ntgt) // 2 + 70
    lineages[:, 20] = 1
    merge_tax = lineages[:, 0].copy()
    for trial in range(4):
        # long-read-like: many windows, heavy duplication, larger mwir
        tgt = rng.integers(0, ntgt, (b, l)).astype(np.int32)
        win = rng.integers(0, 12, (b, l)).astype(np.int32)
        pad = rng.random((b, l)) < 0.25
        tgt[pad] = 2**31 - 1
        win[pad] = 2**31 - 1
        mwir = rng.integers(2, 9, b).astype(np.int32)
        args = (jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
                jnp.asarray(merge_tax), jnp.asarray(lineages),
                jnp.int32(2), jnp.float32(0.5), jnp.int32(19),
                jnp.int32(0))
        a = rows_to_result(*args, max_candidates=3)
        d = rows_to_result(*args, max_candidates=3,
                           dedup_walk=int(mwir.max()))
        for fld in ("cand_tgt", "cand_tax", "cand_hits", "cand_beg",
                    "cand_end", "cls_tax", "hit_qid", "hit_tgt",
                    "hit_win"):
            assert np.array_equal(np.asarray(getattr(a, fld)),
                                  np.asarray(getattr(d, fld))), \
                (trial, fld)


def test_two_tier_probe_matches_dense():
    """Two-tier head+overflow rows must yield identical match slots to
    the single dense fused-row layout on a skewed bucket distribution."""
    from metacache_tpu.ops.probe import make_bucket_index
    from metacache_tpu.ops.rows import probe_rows
    rng = np.random.default_rng(5)
    nf = 4000
    feats = np.unique(rng.integers(
        0, 2**32, nf * 2, dtype=np.uint64).astype(np.uint32))[:nf]
    sizes = rng.integers(1, 4, nf)
    deep = rng.choice(nf, 40, replace=False)
    sizes[deep] = rng.integers(100, 254, len(deep))
    f_rep = np.repeat(feats, sizes)
    tgts = rng.integers(0, 500, len(f_rep)).astype(np.uint32)
    wins = rng.integers(0, 10000, len(f_rep)).astype(np.uint32)
    ft = FeatureTable.build(f_rep, pack_locations(tgts, wins))
    spf = min(ft.max_bucket_size, 254)
    brows, bits = make_bucket_index(ft.unique_features)

    probes = np.concatenate([
        rng.choice(ft.unique_features, 100),
        rng.choice(ft.unique_features[deep % len(ft.unique_features)], 20),
        rng.integers(0, 2**32, 40, dtype=np.uint64).astype(np.uint32),
        np.full(32, 0xFFFFFFFF, np.uint32)]).reshape(4, 48)

    fused = ft.fused_rows(spf)
    hsl = 16
    head, ovf = ft.fused_rows_two_tier(spf, hsl)
    common = (jnp.asarray(ft.unique_features),
              jnp.asarray(ft.offsets.astype(np.int32)))
    t1, w1 = probe_rows(jnp.asarray(probes), *common,
                        jnp.asarray(fused), jnp.zeros((1,), jnp.int32),
                        spf, jnp.asarray(brows), bits, 0, dense=True)
    t2, w2 = probe_rows(jnp.asarray(probes), *common,
                        jnp.asarray(head), jnp.asarray(ovf),
                        spf, jnp.asarray(brows), bits, 0,
                        dense=("two_tier", hsl))
    assert np.array_equal(np.asarray(t1), np.asarray(t2))
    assert np.array_equal(np.asarray(w1), np.asarray(w2))
    # memory: two-tier must be far smaller than full dense
    assert head.nbytes + ovf.nbytes < 0.3 * fused.nbytes


def test_topk_selection_matches_sort():
    """kk<=4 masked-min top-k selection must equal the sort path's
    first kk candidates (kk>4 forces the sort path)."""
    from metacache_tpu.ops.rows import rows_to_result
    rng = np.random.default_rng(13)
    b, l = 64, 96
    ntgt = 12
    lineages = np.zeros((ntgt, 21), np.int32)
    lineages[:, 0] = -np.arange(ntgt) - 1
    lineages[:, 4] = np.arange(ntgt) // 3 + 50
    lineages[:, 20] = 1
    merge_tax = lineages[:, 0].copy()
    for trial in range(3):
        tgt = rng.integers(0, ntgt, (b, l)).astype(np.int32)
        win = rng.integers(0, 6, (b, l)).astype(np.int32)
        pad = rng.random((b, l)) < 0.3
        tgt[pad] = 2**31 - 1
        win[pad] = 2**31 - 1
        mwir = rng.integers(2, 5, b).astype(np.int32)
        args = (jnp.asarray(tgt), jnp.asarray(win), jnp.asarray(mwir),
                jnp.asarray(merge_tax), jnp.asarray(lineages),
                jnp.int32(2), jnp.float32(0.5), jnp.int32(19),
                jnp.int32(0))
        srt = rows_to_result(*args, max_candidates=5)   # sort path
        sel = rows_to_result(*args, max_candidates=3)   # selection path
        for fld in ("cand_tgt", "cand_tax", "cand_hits", "cand_beg",
                    "cand_end"):
            a = np.asarray(getattr(srt, fld))[:, :3]
            d = np.asarray(getattr(sel, fld))
            assert np.array_equal(a, d), (trial, fld)


def test_choose_layout_budgets():
    """Layout selection against a device-memory budget: dense when it
    fits, two-tier (auto head) for skewed tables, CSR as last resort,
    MemoryError below CSR size."""
    rng = np.random.default_rng(8)
    nf = 5000
    feats = np.unique(rng.integers(
        0, 2**32, nf * 2, dtype=np.uint64).astype(np.uint32))[:nf]
    sizes = rng.integers(1, 4, nf)
    deep = rng.choice(nf, 50, replace=False)
    sizes[deep] = 254
    f_rep = np.repeat(feats, sizes)
    ft = FeatureTable.build(
        f_rep, pack_locations(
            rng.integers(0, 500, len(f_rep)).astype(np.uint32),
            rng.integers(0, 10000, len(f_rep)).astype(np.uint32)))
    spf = ft.max_bucket_size
    dense_b = ft.layout_bytes("dense", 0, spf)
    csr_b = ft.layout_bytes("csr", 0, spf)

    assert ft.choose_layout(spf, dense_b) == ("dense", 0)
    kind, head = ft.choose_layout(spf, dense_b // 4)
    assert kind == "two_tier" and 30 <= head < spf
    assert ft.layout_bytes("two_tier", head, spf) <= dense_b // 4
    tt_min = min(ft.layout_bytes("two_tier", h, spf)
                 for h in range(30, spf, 16))
    assert ft.choose_layout(spf, max(csr_b, tt_min - 1))[0] == "csr"
    with pytest.raises(MemoryError):
        ft.choose_layout(spf, min(csr_b, tt_min) - 1)
    # MC_DENSE_LIMIT hook: dense disallowed even with a huge budget
    assert ft.choose_layout(spf, dense_b, allow_dense=False)[0] == \
        "two_tier"
