"""Batch-57 op: two-group log-rank test."""

import pytest

from pdal_spark.operators import temporal as ops_temporal


def test_logrank_hand_computed(spark):
    rows = [("a", 1, 1), ("a", 2, 1), ("b", 3, 1), ("b", 4, 1)]
    df = spark.createDataFrame(rows, ["grp", "dur", "event"])
    r = ops_temporal.logrank_test(df).collect()[0]
    O, E, V = 2, 0.5 + 1 / 3, 0.25 + 2 / 9
    assert r.chi2 == pytest.approx((O - E) ** 2 / V, abs=1e-6)
    assert (r.n1, r.n2, r.o1) == (2, 2, 2)


def test_logrank_identical_curves_near_zero(spark):
    rows = []
    for g in ("a", "b"):
        rows += [(g, t, 1) for t in (2, 5, 9)] + [(g, 12, 0)]
    df = spark.createDataFrame(rows, ["grp", "dur", "event"])
    r = ops_temporal.logrank_test(df).collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)


def test_logrank_censoring_counts_in_risk_only(spark):
    # a censored subject should shrink later risk sets but add no
    # death: removing censoring changes the statistic
    base = [("a", 1, 1), ("a", 5, 1), ("b", 4, 1), ("b", 6, 1)]
    with_cens = base + [("a", 3, 0)]
    r1 = ops_temporal.logrank_test(
        spark.createDataFrame(base, ["grp", "dur", "event"])
    ).collect()[0]
    r2 = ops_temporal.logrank_test(
        spark.createDataFrame(with_cens, ["grp", "dur", "event"])
    ).collect()[0]
    assert r2.o1 == r1.o1  # same deaths
    assert r2.chi2 != r1.chi2  # different risk sets


def test_logrank_three_groups_raises(spark):
    rows = [("a", 1, 1), ("b", 2, 1), ("c", 3, 1)]
    df = spark.createDataFrame(rows, ["grp", "dur", "event"])
    with pytest.raises(ValueError):
        ops_temporal.logrank_test(df)
