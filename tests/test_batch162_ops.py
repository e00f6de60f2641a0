"""Invariant tests for batch 162: stickiness, new/returning."""

from __future__ import annotations

from pdal_spark.operators.temporal import new_returning, stickiness


def test_stickiness_daily_regulars_are_one(spark):
    # 3 users active in EVERY small period -> stickiness 1
    rows = [(u, ps, 0) for u in range(3) for ps in range(5)]
    df = spark.createDataFrame(rows, "u long, ps long, pb long")
    r = stickiness(df, "u", "ps", "pb").collect()[0]
    assert r["stickiness"] == 1.0


def test_stickiness_one_shot_users(spark):
    # 5 users, each active in exactly one of 5 small periods:
    # avg daily distinct = 1, monthly distinct = 5 -> 0.2
    rows = [(u, u, 0) for u in range(5)]
    df = spark.createDataFrame(rows, "u long, ps long, pb long")
    r = stickiness(df, "u", "ps", "pb").collect()[0]
    assert abs(r["stickiness"] - 0.2) < 1e-12


def test_new_returning_split(spark):
    rows = [(1, 0), (2, 0), (1, 1), (3, 1), (1, 2), (2, 2)]
    df = spark.createDataFrame(rows, "u long, p long")
    out = {r["p"]: r for r in
           new_returning(df, "u", "p").collect()}
    assert out[0]["n_new"] == 2 and out[0]["n_returning"] == 0
    assert out[1]["n_new"] == 1 and out[1]["n_returning"] == 1
    assert out[2]["n_new"] == 0 and out[2]["n_returning"] == 2
