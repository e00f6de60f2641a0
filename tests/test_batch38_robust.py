"""Batch-38 ops: Spearman correlation, Simpson diversity, RANSAC
line fit."""

import pytest

from pdal_spark.operators import features as ops_features
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# spearman_corr
# ---------------------------------------------------------------------------


def test_spearman_monotone_is_one(spark):
    rows = [(1, i, i * i) for i in range(10)]  # nonlinear monotone
    df = spark.createDataFrame(rows, ["k", "a", "b"])
    r = ops_stats.spearman_corr(df, "k", "a", "b").collect()[0]
    assert r.rho == pytest.approx(1.0, abs=1e-12)


def test_spearman_reversed_is_minus_one(spark):
    rows = [(1, i, -i) for i in range(8)]
    df = spark.createDataFrame(rows, ["k", "a", "b"])
    r = ops_stats.spearman_corr(df, "k", "a", "b").collect()[0]
    assert r.rho == pytest.approx(-1.0, abs=1e-12)


def test_spearman_ties_average_ranks(spark):
    # tie case: a = [1,2,2,3] -> average ranks [1, 2.5, 2.5, 4];
    # Pearson on ranks vs b = [1,2,3,4] is 3/sqrt(10) (exact-
    # Fraction cross-check)
    rows = [(1, 1, 1), (1, 2, 2), (1, 2, 3), (1, 3, 4)]
    df = spark.createDataFrame(rows, ["k", "a", "b"])
    r = ops_stats.spearman_corr(df, "k", "a", "b").collect()[0]
    assert r.rho == pytest.approx(3.0 / 10.0 ** 0.5, abs=1e-12)


def test_spearman_constant_column_null(spark):
    rows = [(1, 5, i) for i in range(5)]
    df = spark.createDataFrame(rows, ["k", "a", "b"])
    r = ops_stats.spearman_corr(df, "k", "a", "b").collect()[0]
    assert r.rho is None


# ---------------------------------------------------------------------------
# simpson_diversity
# ---------------------------------------------------------------------------


def test_simpson_single_category_zero(spark):
    df = spark.createDataFrame([(1, "a")] * 6, ["k", "cat"])
    r = ops_stats.simpson_diversity(df, "k", "cat").collect()[0]
    assert r.simpson == 0.0 and r.hill2 == pytest.approx(1.0)


def test_simpson_uniform_hill_equals_categories(spark):
    rows = [(1, c) for c in "abcd" for _ in range(3)]
    df = spark.createDataFrame(rows, ["k", "cat"])
    r = ops_stats.simpson_diversity(df, "k", "cat").collect()[0]
    # hill2 = n(n-1)/sum c(c-1) = 12*11 / (4*6) = 5.5 (finite-
    # sample corrected effective count, > raw 4)
    assert r.hill2 == pytest.approx(5.5, abs=1e-12)
    assert 0 < r.simpson < 1


def test_simpson_all_singletons(spark):
    rows = [(1, f"c{i}") for i in range(5)]
    df = spark.createDataFrame(rows, ["k", "cat"])
    r = ops_stats.simpson_diversity(df, "k", "cat").collect()[0]
    assert r.simpson == 1.0 and r.hill2 is None


# ---------------------------------------------------------------------------
# ransac_line
# ---------------------------------------------------------------------------


def test_ransac_recovers_dominant_line(spark):
    # 80 points on y = 2x + 5 exactly, 20 wild outliers
    rows = [(i, i * 13 % 997, 2 * (i * 13 % 997) + 5)
            for i in range(80)]
    rows += [(100 + i, i * 37 % 997, 90000 + i * 53 % 997)
             for i in range(20)]
    df = spark.createDataFrame(rows, ["pid", "mx", "my"])
    out = ops_features.ransac_line(df, tol=0).collect()
    best = [r for r in out if r.best]
    assert len(best) == 1
    b = best[0]
    # the winning pair lies on the line: slope 2, intercept 5
    assert (b.y2 - b.y1) == 2 * (b.x2 - b.x1)
    assert b.y1 == 2 * b.x1 + 5
    assert b.n_inliers >= 80


def test_ransac_degenerate_pairs_dropped(spark):
    # two distinct points only -> anchors may coincide for many
    # candidates; all emitted candidates must have distinct anchors
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 5, 5)], ["pid", "mx", "my"]
    )
    out = ops_features.ransac_line(df, n_cand=8, tol=1).collect()
    for r in out:
        assert (r.x1, r.y1) != (r.x2, r.y2)
