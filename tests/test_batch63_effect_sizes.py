"""Batch-63 ops: Mantel-Haenszel OR, Cohen's d."""

import math

import pytest

from pdal_spark.operators import stats as ops_stats


def test_mh_collapses_simpson_paradox(spark):
    # within each stratum the exposure has NO effect (OR = 1), but
    # the crude pooled table shows an association because exposure
    # and outcome both concentrate in stratum s2
    rows = []
    # s1: exposed 10% of 100, unexposed 10% of 900 -> OR 1
    rows += [("s1", 1, 1)] * 10 + [("s1", 1, 0)] * 90
    rows += [("s1", 0, 1)] * 90 + [("s1", 0, 0)] * 810
    # s2: exposed 50% of 900, unexposed 50% of 100 -> OR 1
    rows += [("s2", 1, 1)] * 450 + [("s2", 1, 0)] * 450
    rows += [("s2", 0, 1)] * 50 + [("s2", 0, 0)] * 50
    df = spark.createDataFrame(
        rows, ["stratum", "exposed", "is_case"]
    )
    r = ops_stats.mantel_haenszel(df).collect()[0]
    assert r.or_mh == pytest.approx(1.0, abs=1e-6)
    # crude OR is NOT 1 (the confounded readout)
    crude = ops_stats.odds_ratio(
        df.select("exposed", "is_case")).collect()[0]
    assert abs(crude.or_est - 1.0) > 0.5


def test_mh_matches_single_stratum_or(spark):
    rows = ([("s", 1, 1)] * 20 + [("s", 1, 0)] * 10
            + [("s", 0, 1)] * 5 + [("s", 0, 0)] * 40)
    df = spark.createDataFrame(
        rows, ["stratum", "exposed", "is_case"]
    )
    r = ops_stats.mantel_haenszel(df).collect()[0]
    assert r.or_mh == pytest.approx(20 * 40 / (10 * 5), rel=1e-6)


def test_cohens_d_reference(spark):
    g0 = [10, 12, 14, 11, 13]
    g1 = [15, 17, 19, 16, 18]
    rows = [(0, v) for v in g0] + [(1, v) for v in g1]
    df = spark.createDataFrame(rows, ["grp", "y"])
    r = ops_stats.cohens_d(df).collect()[0]
    m0, m1 = sum(g0) / 5, sum(g1) / 5
    v0 = sum((x - m0) ** 2 for x in g0) / 4
    v1 = sum((x - m1) ** 2 for x in g1) / 4
    sp = math.sqrt((4 * v0 + 4 * v1) / 8)
    assert r.d == pytest.approx((m1 - m0) / sp, abs=1e-9)


def test_cohens_d_missing_group_null(spark):
    df = spark.createDataFrame([(0, 5), (0, 7)], ["grp", "y"])
    r = ops_stats.cohens_d(df).collect()[0]
    assert r.d is None
