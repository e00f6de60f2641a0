"""Batch-41 ops: Brier decomposition, trimmed mean, quantile
normalization."""

import pytest

from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# brier_score
# ---------------------------------------------------------------------------


def test_brier_perfect_forecaster(spark):
    q = ops_stats.BRIER_Q
    rows = [(q, 1)] * 5 + [(0, 0)] * 5
    df = spark.createDataFrame(rows, ["prob_q", "label"])
    r = ops_stats.brier_score(df).collect()[0]
    assert r.bs == 0.0
    assert r.reliability == pytest.approx(0.0, abs=1e-9)
    # perfectly sharp: resolution == uncertainty == 0.25
    assert r.resolution == pytest.approx(0.25, abs=1e-9)
    assert r.uncertainty == 0.25


def test_brier_constant_base_rate_forecaster(spark):
    # always predicting the base rate: BS = uncertainty,
    # reliability = resolution = 0
    q = ops_stats.BRIER_Q
    rows = [(q // 2, 1)] * 5 + [(q // 2, 0)] * 5
    df = spark.createDataFrame(rows, ["prob_q", "label"])
    r = ops_stats.brier_score(df).collect()[0]
    assert r.bs == pytest.approx(0.25, abs=1e-9)
    assert r.reliability == pytest.approx(0.0, abs=1e-6)
    assert r.resolution == pytest.approx(0.0, abs=1e-9)


def test_brier_decomposition_identity(spark):
    q = ops_stats.BRIER_Q
    rows = [(200, 0), (200, 0), (200, 1), (700, 1), (700, 1),
            (700, 0), (900, 1), (900, 1), (100, 0), (400, 1)]
    df = spark.createDataFrame(rows, ["prob_q", "label"])
    r = ops_stats.brier_score(df).collect()[0]
    # Murphy identity holds to quantization error
    assert r.bs == pytest.approx(
        r.uncertainty - r.resolution + r.reliability, abs=1e-3
    )


# ---------------------------------------------------------------------------
# trimmed_mean
# ---------------------------------------------------------------------------


def test_trimmed_mean_cuts_outliers(spark):
    vals = [5] * 8 + [0, 1000]
    rows = [(1, v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "v", "id"])
    r = ops_stats.trimmed_mean(
        df, key="k", value="v", id_col="id", trim_pct=10
    ).collect()[0]
    # n=10 -> cut 1 each side (the 0 and the 1000)
    assert r.n_kept == 8 and r.tmean == 5.0


def test_trimmed_mean_no_trim_small_n(spark):
    rows = [(1, v, i) for i, v in enumerate([1, 2, 3])]
    df = spark.createDataFrame(rows, ["k", "v", "id"])
    r = ops_stats.trimmed_mean(
        df, key="k", value="v", id_col="id", trim_pct=10
    ).collect()[0]
    # (3*10) div 100 = 0 -> nothing cut
    assert r.n_kept == 3 and r.tmean == 2.0


# ---------------------------------------------------------------------------
# quantile_normalize
# ---------------------------------------------------------------------------


def test_quantile_normalize_identical_distributions(spark):
    rows = [("a", 10, 1), ("a", 20, 2), ("a", 30, 3),
            ("b", 100, 4), ("b", 200, 5), ("b", 300, 6)]
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    out = ops_stats.quantile_normalize(
        df, group="g", value="v", id_col="id"
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.g, set()).add(r.qn_q)
    # after QN both groups hold the identical value set
    assert by_group["a"] == by_group["b"]
    q = ops_stats.QN_Q
    # rank-1 reference = mean(10, 100) = 55
    assert min(by_group["a"]) == 55 * q


def test_quantile_normalize_unequal_sizes_raises(spark):
    rows = [("a", 1, 1), ("a", 2, 2), ("b", 3, 3)]
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    with pytest.raises(ValueError):
        ops_stats.quantile_normalize(
            df, group="g", value="v", id_col="id"
        )
