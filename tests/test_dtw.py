"""dtw_distance behavior: alignment, banding, blocking."""

from pdal_spark.operators.temporal import dtw_distance


def _series(spark, data):
    # data: {key: [v0, v1, ...]} -> long-form rows
    rows = [(k, i, int(v)) for k, vs in data.items()
            for i, v in enumerate(vs)]
    return spark.createDataFrame(rows, ["k", "o", "v"])


def test_identical_series_distance_zero(spark):
    df = _series(spark, {1: [5, 7, 9], 2: [5, 7, 9]})
    (r,) = dtw_distance(df, "k", "o", "v").collect()
    assert (r.key_a, r.key_b, r.dtw) == (1, 2, 0)


def test_time_stretch_is_free(spark):
    # DTW aligns [1,2,3] with [1,1,2,2,3,3] at zero cost.
    df = _series(spark, {1: [1, 2, 3], 2: [1, 1, 2, 2, 3, 3]})
    (r,) = dtw_distance(df, "k", "o", "v").collect()
    assert r.dtw == 0


def test_band_zero_is_pointwise_l1(spark):
    # band=0 on equal lengths forces the diagonal: sum |x_i - y_i|.
    df = _series(spark, {1: [0, 10, 0], 2: [1, 7, 2]})
    (r,) = dtw_distance(df, "k", "o", "v", band=0).collect()
    assert r.dtw == 1 + 3 + 2
    # full DTW can do better (e.g. warp around the 10).
    (rf,) = dtw_distance(df, "k", "o", "v").collect()
    assert rf.dtw <= r.dtw


def test_block_restricts_pairs(spark):
    rows = [(k, blk, i, v) for k, blk, vs in
            [(1, "a", [1, 2]), (2, "a", [1, 2]),
             (3, "b", [1, 2]), (4, "b", [9, 9])]
            for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, ["k", "blk", "o", "v"])
    out = dtw_distance(df, "k", "o", "v", block="blk").collect()
    got = {(r.key_a, r.key_b): r.dtw for r in out}
    assert set(got) == {(1, 2), (3, 4)}
    assert got[(1, 2)] == 0 and got[(3, 4)] == 15


def test_unsorted_input_rows_are_ordered_by_order_col(spark):
    df = spark.createDataFrame(
        [(1, 2, 9), (1, 0, 1), (1, 1, 5),
         (2, 0, 1), (2, 1, 5), (2, 2, 9)],
        ["k", "o", "v"],
    )
    (r,) = dtw_distance(df, "k", "o", "v").collect()
    assert r.dtw == 0
