"""Batch-42 ops: split conformal intervals, fairness gaps."""

import pytest

from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# conformal_interval
# ---------------------------------------------------------------------------


def test_conformal_qhat_is_order_statistic(spark):
    # residuals 1..10, alpha 10% -> k = ceil(11 * 0.9) = 10 -> qhat 10
    calib = spark.createDataFrame(
        [(0, r) for r in range(1, 11)], ["pred", "y"]
    )
    test = spark.createDataFrame([(1, 100)], ["id", "pred"])
    r = ops_stats.conformal_interval(
        calib, test, alpha_pct=10).collect()[0]
    assert (r.lo, r.hi) == (90, 110)


def test_conformal_coverage_on_exchangeable_data(spark):
    # residuals drawn from the same deterministic pool: coverage on
    # a held-out set must be >= 1 - alpha (finite-sample guarantee)
    pool = [(i * 7919 + 13) % 100 for i in range(400)]
    calib = spark.createDataFrame(
        [(0, pool[i]) for i in range(200)], ["pred", "y"]
    )
    test = spark.createDataFrame(
        [(i, 0) for i in range(200, 400)], ["id", "pred"]
    )
    out = {r.id: (r.lo, r.hi) for r in ops_stats.conformal_interval(
        calib, test, alpha_pct=20).collect()}
    covered = sum(
        1 for i in range(200, 400)
        if out[i][0] <= pool[i] <= out[i][1]
    )
    assert covered / 200 >= 0.8


def test_conformal_tiny_calibration_null(spark):
    calib = spark.createDataFrame([(0, 5)], ["pred", "y"])
    test = spark.createDataFrame([(1, 7)], ["id", "pred"])
    r = ops_stats.conformal_interval(
        calib, test, alpha_pct=10).collect()[0]
    # k = ceil(2 * 0.9) = 2 > n = 1 -> undefined
    assert r.lo is None and r.hi is None


# ---------------------------------------------------------------------------
# fairness_gaps
# ---------------------------------------------------------------------------


def test_fairness_identical_groups_zero_gaps(spark):
    rows = []
    for g in ("a", "b"):
        rows += [(g, 1, 1), (g, 1, 0), (g, 0, 1), (g, 0, 0)]
    df = spark.createDataFrame(rows, ["grp", "label", "pred"])
    out = ops_stats.fairness_gaps(df).collect()
    for r in out:
        assert r.dp_gap == 0.0 and r.tpr_gap == 0.0
        assert r.fpr_gap == 0.0
        assert r.sel_rate == 0.5 and r.tpr == 0.5 and r.fpr == 0.5


def test_fairness_detects_selection_gap(spark):
    rows = [("a", 1, 1)] * 8 + [("a", 0, 0)] * 2
    rows += [("b", 1, 0)] * 8 + [("b", 0, 0)] * 2
    df = spark.createDataFrame(rows, ["grp", "label", "pred"])
    out = {r.grp: r for r in ops_stats.fairness_gaps(df).collect()}
    assert out["a"].sel_rate == 0.8 and out["b"].sel_rate == 0.0
    assert out["a"].dp_gap == pytest.approx(0.8)
    assert out["a"].tpr == 1.0 and out["b"].tpr == 0.0
    assert out["a"].tpr_gap == pytest.approx(1.0)


def test_fairness_no_positives_null_tpr(spark):
    rows = [("a", 0, 1), ("a", 0, 0)]
    df = spark.createDataFrame(rows, ["grp", "label", "pred"])
    r = ops_stats.fairness_gaps(df).collect()[0]
    assert r.tpr is None and r.fpr == 0.5
