"""Batch-58 op: directly standardized rates."""

import pytest

from pdal_spark.operators import stats as ops_stats


def _data(spark, rows):
    return spark.createDataFrame(
        rows, ["pop", "stratum", "hits", "exposure"]
    )


def test_standardization_removes_mix_confounding(spark):
    # both pops have IDENTICAL per-stratum rates (10% young, 50%
    # old) but opposite mixes: crude rates differ wildly, the
    # standardized rates are equal
    rows = [
        ("A", "young", 90, 900), ("A", "old", 50, 100),
        ("B", "young", 10, 100), ("B", "old", 450, 900),
    ]
    ref = spark.createDataFrame(
        [("young", 1), ("old", 1)], ["stratum", "w"]
    )
    out = {r.pop: r.std_rate for r in ops_stats.standardized_rate(
        _data(spark, rows), ref).collect()}
    assert out["A"] == pytest.approx(out["B"], abs=1e-9)
    assert out["A"] == pytest.approx(0.3, abs=1e-6)


def test_standardization_weights_matter(spark):
    rows = [("A", "s1", 10, 100), ("A", "s2", 50, 100)]
    ref_even = spark.createDataFrame(
        [("s1", 1), ("s2", 1)], ["stratum", "w"]
    )
    ref_s1 = spark.createDataFrame(
        [("s1", 3), ("s2", 1)], ["stratum", "w"]
    )
    even = ops_stats.standardized_rate(
        _data(spark, rows), ref_even).collect()[0].std_rate
    tilted = ops_stats.standardized_rate(
        _data(spark, rows), ref_s1).collect()[0].std_rate
    assert even == pytest.approx(0.3, abs=1e-6)
    assert tilted == pytest.approx((3 * 0.1 + 1 * 0.5) / 4, abs=1e-6)


def test_standardization_missing_stratum_counts_zero(spark):
    rows = [("A", "s1", 20, 100)]  # no s2 data
    ref = spark.createDataFrame(
        [("s1", 1), ("s2", 1)], ["stratum", "w"]
    )
    r = ops_stats.standardized_rate(_data(spark, rows), ref
                                    ).collect()[0]
    assert r.std_rate == pytest.approx(0.1, abs=1e-6)
