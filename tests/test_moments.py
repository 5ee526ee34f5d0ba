"""Accumulator suite parity (reference: src/stat_moments.hpp,
src/stat_combined.hpp) — formulas, merge/pop algebra, degenerate IEEE
behavior, and the bucket-size statistics consumer."""
import math

import numpy as np
import pytest

from metacache_tpu.utils import moments as M


RNG = np.random.default_rng(42)


def _ref_formulas(xs):
    """Direct power-sum evaluation of the reference's formulas."""
    xs = np.asarray(xs, np.float64)
    n = float(len(xs))
    s = xs.sum()
    s2 = (xs * xs).sum()
    s3 = (xs ** 3).sum()
    s4 = (xs ** 4).sum()
    mean = s / n
    cm2 = (s2 - s * s / n) / (n - 1)
    cm3 = (n * n * s3 - 3 * n * s * s2 + 2 * s ** 3) / (n ** 3)
    cm4 = (n ** 3 * s4 - 4 * n * n * s * s3 + 6 * n * s * s * s2
           - 3 * s ** 4) / (n ** 4)
    return mean, cm2, cm3, cm4


def test_moments_basic():
    xs = RNG.normal(3.0, 2.0, 1000)
    acc = M.MomentsAccumulator(4)
    for x in xs:
        acc.push(x)
    mean, cm2, cm3, cm4 = _ref_formulas(xs)
    assert acc.size() == 1000
    assert acc.mean() == pytest.approx(mean)
    assert acc.variance() == pytest.approx(cm2)
    assert acc.stddev() == pytest.approx(math.sqrt(cm2))
    assert acc.central_moment_3() == pytest.approx(cm3, rel=1e-9)
    assert acc.skewness() == pytest.approx(cm3 / cm2 ** 1.5, rel=1e-9)
    assert acc.central_moment_4() == pytest.approx(cm4, rel=1e-9)
    assert acc.kurtosis() == pytest.approx(cm4 / cm2 ** 2, rel=1e-9)
    assert acc.kurtosis_excess() == pytest.approx(
        cm4 / cm2 ** 2 - 3, rel=1e-6)


def test_push_array_equals_push_loop():
    xs = RNG.exponential(5.0, 257)
    a = M.MomentsAccumulator(4)
    b = M.MomentsAccumulator(4)
    for x in xs:
        a.push(x)
    b.push_array(xs)
    for f in ("size", "sum", "sum_2", "sum_3", "sum_4"):
        assert getattr(a, f)() == pytest.approx(getattr(b, f)(), rel=1e-12)


def test_merge_and_pop():
    xs = RNG.normal(0, 1, 400)
    whole = M.MomentsAccumulator(3)
    whole.push_array(xs)
    p1 = M.MomentsAccumulator(3)
    p2 = M.MomentsAccumulator(3)
    p1.push_array(xs[:150])
    p2.push_array(xs[150:])
    p1.merge(p2)
    assert p1.size() == whole.size()
    assert p1.mean() == pytest.approx(whole.mean(), rel=1e-12)
    assert p1.skewness() == pytest.approx(whole.skewness(), rel=1e-9)
    # pop removes a pushed value exactly
    acc = M.MomentsAccumulator(3)
    acc.push_array(xs)
    acc.push(7.5)
    acc.pop(7.5)
    assert acc.size() == whole.size()
    assert acc.variance() == pytest.approx(whole.variance(), rel=1e-9)


def test_degenerate_matches_reference_ieee():
    # all-equal values: skewness is 0/0 -> the reference prints "-nan"
    acc = M.MomentsAccumulator(3)
    acc.push_array(np.ones(100))
    assert acc.stddev() == 0.0
    assert math.isnan(acc.skewness())
    assert math.copysign(1.0, acc.skewness()) < 0
    # n < 2 guards return 0 (reference: central_moment_3, skewness)
    one = M.MomentsAccumulator(4)
    one.push(3.0)
    assert one.skewness() == 0.0
    assert one.central_moment_3() == 0.0
    assert one.kurtosis() == 0.0
    # empty accumulator: raw moments return the raw sums
    empty = M.MomentsAccumulator(2)
    assert empty.mean() == 0.0
    assert empty.empty()


def test_statistics_accumulator():
    xs = RNG.integers(1, 254, 5000).astype(np.float64)
    acc = M.StatisticsAccumulator()
    acc.push_array(xs)
    assert acc.max() == xs.max()
    assert acc.mean() == pytest.approx(xs.mean())
    n = len(xs)
    assert acc.variance() == pytest.approx(xs.var() * n / (n - 1), rel=1e-9)
    other = M.StatisticsAccumulator()
    other.push(10_000.0)
    acc.merge(other)
    assert acc.max() == 10_000.0
    assert acc.size() == n + 1


def test_free_functions():
    xs = RNG.normal(2, 3, 333)
    mean, cm2, cm3, cm4 = _ref_formulas(xs)
    assert M.mean(xs) == pytest.approx(mean)
    assert M.variance(xs) == pytest.approx(cm2)
    assert M.stddev(xs) == pytest.approx(math.sqrt(cm2))
    assert M.skewness(xs) == pytest.approx(cm3 / cm2 ** 1.5, rel=1e-9)
    assert M.kurtosis(xs) == pytest.approx(cm4 / cm2 ** 2, rel=1e-9)
    assert M.central_moment_4(xs) == pytest.approx(cm4, rel=1e-9)


def test_bucket_size_statistics_uses_reference_divisor():
    from metacache_tpu.ops.table import FeatureTable, pack_locations
    feats = np.array([1, 1, 2, 3, 3, 3, 9], np.uint32)
    tgts = np.zeros(7, np.uint32)
    wins = np.arange(7, dtype=np.uint32)
    t = FeatureTable.build(feats, pack_locations(tgts, wins))
    mean, std, skew, mx = t.location_list_size_statistics()
    sizes = np.array([2.0, 1.0, 3.0, 1.0])
    assert mx == 3
    assert mean == pytest.approx(sizes.mean())
    n = len(sizes)
    assert std == pytest.approx(
        math.sqrt(sizes.var() * n / (n - 1)))  # n-1 divisor
