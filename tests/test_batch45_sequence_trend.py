"""Batch-45 ops: LCS pairs, rolling OLS slope."""

import pytest

from pdal_spark.operators import temporal as ops_temporal


def _series(spark, data):
    rows = [(k, i, v) for k, vs in data.items()
            for i, v in enumerate(vs)]
    return spark.createDataFrame(rows, ["k", "o", "v"])


def test_lcs_known_values(spark):
    df = _series(spark, {
        1: [1, 2, 3, 9],
        2: [1, 5, 2, 3],
        3: [9, 9, 9, 9],
    })
    out = {(r.key_a, r.key_b): r.lcs for r in
           ops_temporal.lcs_pairs(df, "k", "o", "v").collect()}
    assert out == {(1, 2): 3, (1, 3): 1, (2, 3): 0}


def test_lcs_identical_is_length(spark):
    df = _series(spark, {1: [4, 7, 7, 2], 2: [4, 7, 7, 2]})
    out = ops_temporal.lcs_pairs(df, "k", "o", "v").collect()
    assert out[0].lcs == 4


def test_lcs_python_reference(spark):
    a = [1, 3, 2, 4, 1, 5, 2, 3]
    b = [3, 1, 2, 1, 4, 5, 3, 2]
    df = _series(spark, {1: a, 2: b})

    def ref(x, y):
        dp = [[0] * (len(y) + 1) for _ in range(len(x) + 1)]
        for i in range(1, len(x) + 1):
            for j in range(1, len(y) + 1):
                dp[i][j] = (dp[i - 1][j - 1] + 1
                            if x[i - 1] == y[j - 1]
                            else max(dp[i - 1][j], dp[i][j - 1]))
        return dp[-1][-1]

    out = ops_temporal.lcs_pairs(df, "k", "o", "v").collect()
    assert out[0].lcs == ref(a, b)


def test_rolling_slope_linear_series(spark):
    df = _series(spark, {1: [3 * t + 7 for t in range(10)]})
    out = sorted(
        ops_temporal.rolling_slope(df, "k", "o", "v", 4).collect(),
        key=lambda r: r.o,
    )
    assert out[0].slope is None  # frame of 1
    for r in out[1:]:
        assert r.slope == pytest.approx(3.0, abs=1e-12)


def test_rolling_slope_turns_with_series(spark):
    vals = list(range(6)) + list(range(6, -1, -1))
    df = _series(spark, {1: vals})
    out = {r.o: r.slope for r in ops_temporal.rolling_slope(
        df, "k", "o", "v", 3).collect()}
    assert out[5] == pytest.approx(1.0)
    assert out[len(vals) - 1] == pytest.approx(-1.0)
