"""Data-mixing planner: integer targets with largest-remainder
rounding and loader geometry (epochs/residual/rate)."""

from pdal_spark.operators.textops import MIX_Q, mixing_plan


def test_mixing_plan_targets_and_geometry(spark):
    srcs = spark.createDataFrame(
        [("wiki", 100, 3), ("web", 1000, 6), ("code", 50, 1)],
        "source string, n_tokens long, weight_q long",
    )
    out = {r.source: r for r in mixing_plan(srcs, budget=1000)
           .collect()}
    # weights 3/6/1 of 1000 -> 300 / 600 / 100 exactly
    assert out["wiki"].target == 300
    assert out["web"].target == 600
    assert out["code"].target == 100
    assert sum(r.target for r in out.values()) == 1000
    # wiki: 100 avail, 300 target -> 3 full epochs, 0 residual
    assert (out["wiki"].epochs, out["wiki"].residual) == (3, 0)
    # web: undersampled, rate_q < 2^20
    assert out["web"].epochs == 0 and out["web"].residual == 600
    assert out["web"].rate_q == (600 * MIX_Q) // 1000
    # code: exactly 2x upsampled
    assert out["code"].rate_q == 2 * MIX_Q


def test_mixing_plan_largest_remainder_sums_to_budget(spark):
    srcs = spark.createDataFrame(
        [("a", 10, 1), ("b", 10, 1), ("c", 10, 1)],
        "source string, n_tokens long, weight_q long",
    )
    rows = mixing_plan(srcs, budget=100).collect()
    # 100/3 -> 34/33/33, +1s to the lexicographically-first ties
    assert sorted(r.target for r in rows) == [33, 33, 34]
    assert sum(r.target for r in rows) == 100
    first = {r.source: r.target for r in rows}
    assert first["a"] == 34  # tie-break by source asc
