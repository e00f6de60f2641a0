"""Invariant tests for batch 169: migration effectiveness, rank
footrule."""

from __future__ import annotations

from pdal_spark.operators.stats import (
    migration_effectiveness,
    rank_footrule,
)


def test_migration_effectiveness(spark):
    # zone 1 -> 2: 10; 2 -> 1: 10 (pure churn); 1 -> 3: 5
    rows = [(1, 2, 10), (2, 1, 10), (1, 3, 5), (3, 3, 99)]
    df = spark.createDataFrame(rows, "o long, d long, c long")
    out = {r["zone"]: r for r in migration_effectiveness(
        df, "o", "d", "c").collect()}
    assert out[2]["mei"] == 0.0               # balanced exchange
    assert out[3]["inflow"] == 5 and out[3]["mei"] == 1.0
    assert out[1]["net"] == -5                # self-flow dropped


def test_rank_footrule_frozen_and_swap(spark):
    rows = [(e, 0, 100 - e) for e in range(4)] \
        + [(e, 1, 100 - e) for e in range(4)]
    df = spark.createDataFrame(rows, "e long, p long, v long")
    r = rank_footrule(df, "e", "p", "v", 0, 1).collect()[0]
    assert r["footrule"] == 0 and r["n_shared"] == 4
    rows2 = [(0, 0, 10), (1, 0, 5), (0, 1, 5), (1, 1, 10)]
    df2 = spark.createDataFrame(rows2, "e long, p long, v long")
    r2 = rank_footrule(df2, "e", "p", "v", 0, 1).collect()[0]
    assert r2["footrule"] == 2  # full swap of two entities
