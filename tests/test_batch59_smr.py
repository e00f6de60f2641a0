"""Batch-59 op: indirectly standardized ratio (SMR)."""

import pytest

from pdal_spark.operators import stats as ops_stats

Q = ops_stats.STD_Q


def test_smr_vs_reference(spark):
    # reference rates: s1 10%, s2 50%; pop A doubles both -> SMR 2
    data = spark.createDataFrame(
        [("A", "s1", 20, 100), ("A", "s2", 100, 100)],
        ["pop", "stratum", "hits", "exposure"],
    )
    ref = spark.createDataFrame(
        [("s1", Q // 10), ("s2", Q // 2)], ["stratum", "rate_q"]
    )
    r = ops_stats.smr(data, ref).collect()[0]
    # E = 100*0.1 + 100*0.5 = 60; O = 120
    assert r.observed == 120
    assert r.smr == pytest.approx(2.0, abs=1e-6)


def test_smr_matching_reference_is_one(spark):
    data = spark.createDataFrame(
        [("A", "s1", 10, 100), ("A", "s2", 50, 100)],
        ["pop", "stratum", "hits", "exposure"],
    )
    ref = spark.createDataFrame(
        [("s1", Q // 10), ("s2", Q // 2)], ["stratum", "rate_q"]
    )
    r = ops_stats.smr(data, ref).collect()[0]
    assert r.smr == pytest.approx(1.0, abs=1e-6)


def test_smr_zero_expected_null(spark):
    data = spark.createDataFrame(
        [("A", "s1", 5, 100)], ["pop", "stratum", "hits", "exposure"]
    )
    ref = spark.createDataFrame(
        [("s1", 0)], ["stratum", "rate_q"]
    )
    r = ops_stats.smr(data, ref).collect()[0]
    assert r.smr is None
