"""Invariant tests for batch 135: g-chart, Jarque-Bera."""

from __future__ import annotations

from pdal_spark.operators.stats import jarque_bera
from pdal_spark.operators.temporal import g_chart


def test_g_chart_gaps_and_flag(spark):
    # events at positions 1, 4, 6, 27 -> gaps 2, 1, 20
    ev_pos = {1, 4, 6, 27}
    rows = [(i, 1 if i in ev_pos else 0) for i in range(30)]
    df = spark.createDataFrame(rows, "o long, ev int")
    out = sorted(g_chart(df, "o", "ev").collect(),
                 key=lambda r: r["o"])
    assert [r["gap"] for r in out] == [2, 1, 20]
    # gbar = 23/3 ~ 7.67; ucl ~ 7.67 + 3*sqrt(7.67*8.67) ~ 32.1
    assert all(r["flag"] == 0 for r in out)
    # a much larger gap flags
    # enough baseline events that the big gap cannot mask itself
    rows2 = [(i, 1 if (i <= 10 or i == 100) else 0)
             for i in range(101)]
    df2 = spark.createDataFrame(rows2, "o long, ev int")
    out2 = {r["o"]: r for r in g_chart(df2, "o", "ev").collect()}
    assert out2[100]["flag"] == 1


def test_jarque_bera_symmetric_vs_skewed(spark):
    sym = spark.createDataFrame(
        [(v,) for v in list(range(-50, 51))], "v long"
    )
    r1 = jarque_bera(sym, "v").collect()[0]
    assert abs(r1["skew"]) < 1e-9       # perfectly symmetric
    skewed = spark.createDataFrame(
        [(0,)] * 90 + [(100,)] * 10, "v long"
    )
    r2 = jarque_bera(skewed, "v").collect()[0]
    assert r2["skew"] > 1
    assert r2["jb"] > r1["jb"]
