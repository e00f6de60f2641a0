"""Batch-31 ops: GWR local regression, stay-point detection, flock
(co-movement) pairs, Fleiss' kappa."""

import pytest

from pdal_spark.operators import pointpattern as ops_pp
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# gwr_local
# ---------------------------------------------------------------------------


def test_gwr_recovers_exact_local_lines(spark):
    # two clusters with different true slopes; bandwidth separates
    # them, so each target's weighted fit is exact
    rows = []
    for i in range(5):
        rows.append((0 + i, 0, i, 2 * i + 1))        # y = 2x + 1
    for i in range(5):
        rows.append((10_000 + i, 0, i, 7 * i + 3))   # y = 7x + 3
    samples = spark.createDataFrame(rows, ["mx", "my", "x", "y"])
    targets = spark.createDataFrame(
        [(1, 2, 0), (2, 10_002, 0)], ["tid", "mx", "my"]
    )
    out = {r.tid: r for r in
           ops_pp.gwr_local(samples, targets, h=100).collect()}
    assert out[1].beta1 == pytest.approx(2.0, abs=1e-9)
    assert out[1].beta0 == pytest.approx(1.0, abs=1e-9)
    assert out[2].beta1 == pytest.approx(7.0, abs=1e-9)
    assert out[2].beta0 == pytest.approx(3.0, abs=1e-9)
    assert out[1].n_in == 5


def test_gwr_drops_degenerate_targets(spark):
    # all in-range samples share one x -> zero variance -> dropped
    samples = spark.createDataFrame(
        [(0, 0, 5, 1), (1, 0, 5, 2)], ["mx", "my", "x", "y"]
    )
    targets = spark.createDataFrame([(1, 0, 0)], ["tid", "mx", "my"])
    assert ops_pp.gwr_local(samples, targets, h=10).count() == 0


# ---------------------------------------------------------------------------
# stay_points
# ---------------------------------------------------------------------------


def test_stay_points_splits_on_jump(spark):
    df = spark.createDataFrame(
        [(1, 1, 0, 0), (1, 2, 3, 0), (1, 3, 1000, 0),
         (1, 4, 1002, 0), (1, 5, 1004, 0)],
        ["key", "ts", "mx", "my"],
    )
    out = sorted(
        ops_temporal.stay_points(df, t2=100, min_n=2).collect(),
        key=lambda r: r.seg,
    )
    assert [(r.n, r.cx) for r in out] == [(2, 1), (3, 1002)]
    assert out[0].t_start == 1 and out[0].t_end == 2
    assert out[1].t_start == 3 and out[1].t_end == 5


def test_stay_points_min_n_filters_singletons(spark):
    df = spark.createDataFrame(
        [(1, 1, 0, 0), (1, 2, 10_000, 0), (1, 3, 20_000, 0)],
        ["key", "ts", "mx", "my"],
    )
    assert ops_temporal.stay_points(df, t2=100, min_n=2).count() == 0


def test_stay_points_drops_null_coords(spark):
    df = spark.createDataFrame(
        [(1, 1, 0, 0), (1, 2, None, None), (1, 3, 1, 0)],
        "key long, ts long, mx long, my long",
    )
    out = ops_temporal.stay_points(df, t2=100, min_n=2).collect()
    assert len(out) == 1 and out[0].n == 2


# ---------------------------------------------------------------------------
# flock_pairs
# ---------------------------------------------------------------------------


def test_flock_requires_consecutive_bins(spark):
    rows = [
        # a & b share cell 9 in bins 1,2,3 (run 3)
        (1, 1, 9), (2, 1, 9), (1, 2, 9), (2, 2, 9),
        (1, 3, 9), (2, 3, 9),
        # a & c share cell 9 only in bins 1 and 3 (runs of 1)
        (3, 1, 9), (3, 3, 9),
    ]
    df = spark.createDataFrame(rows, ["key", "tbin", "cell"])
    out = ops_temporal.flock_pairs(df, min_run=2).collect()
    assert [(r.ka, r.kb, r.max_run) for r in out] == [(1, 2, 3)]


def test_flock_different_cells_dont_pair(spark):
    rows = [(1, 1, 9), (2, 1, 8), (1, 2, 9), (2, 2, 8)]
    df = spark.createDataFrame(rows, ["key", "tbin", "cell"])
    assert ops_temporal.flock_pairs(df, min_run=2).count() == 0


def test_flock_multi_cell_bin_counted_once(spark):
    # pair co-located in TWO cells of the same bin: one bin credit
    rows = [(1, 1, 9), (2, 1, 9), (1, 1, 8), (2, 1, 8),
            (1, 2, 9), (2, 2, 9)]
    df = spark.createDataFrame(rows, ["key", "tbin", "cell"])
    out = ops_temporal.flock_pairs(df, min_run=2).collect()
    assert [(r.max_run, r.n_bins) for r in out] == [(2, 2)]


# ---------------------------------------------------------------------------
# fleiss_kappa
# ---------------------------------------------------------------------------


def test_fleiss_perfect_agreement_is_one(spark):
    rows = [(i, "a" if i % 2 else "b")
            for i in range(10) for _ in range(3)]
    df = spark.createDataFrame(rows, ["item", "cat"])
    r = ops_stats.fleiss_kappa(df).collect()[0]
    assert r.po == 1.0 and r.kappa == 1.0
    assert r.n_raters == 3 and r.n_items == 10


def test_fleiss_textbook_value(spark):
    # Wikipedia's canonical Fleiss example: 10 items, 14 raters,
    # 5 categories -> kappa ~ 0.20993
    table = [
        (0, 0, 0, 0, 14), (0, 2, 6, 4, 2), (0, 0, 3, 5, 6),
        (0, 3, 9, 2, 0), (2, 2, 8, 1, 1), (7, 7, 0, 0, 0),
        (3, 2, 6, 3, 0), (2, 5, 3, 2, 2), (6, 5, 2, 1, 0),
        (0, 2, 2, 3, 7),
    ]
    rows = []
    for item, counts in enumerate(table):
        for cat, n in enumerate(counts):
            rows.extend([(item, cat)] * n)
    df = spark.createDataFrame(rows, ["item", "cat"])
    r = ops_stats.fleiss_kappa(df).collect()[0]
    assert abs(r.kappa - 0.20993) < 5e-5


def test_fleiss_uneven_raters_raises(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], ["item", "cat"]
    )
    with pytest.raises(ValueError):
        ops_stats.fleiss_kappa(df)


def test_fleiss_single_category_kappa_null(spark):
    # pe = 1 -> kappa undefined -> NULL, po still 1
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "a")], ["item", "cat"]
    )
    r = ops_stats.fleiss_kappa(df).collect()[0]
    assert r.po == 1.0 and r.kappa is None
