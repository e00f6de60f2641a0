"""Batch-19: asof_join forward/nearest directions."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from pdal_spark.operators.temporal import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10"), (1, "2024-01-01 00:01:00"),
         (2, "2024-01-01 00:00:00")],
        ["user_id", "ts"],
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 100.0),
         (1, "2024-01-01 00:00:55", 200.0),
         (1, "2024-01-01 00:02:00", 300.0)],
        ["user_id", "ts", "v"],
    ).withColumn("ts", F.to_timestamp("ts"))
    return left, right


def test_asof_directions_match_pandas(spark):
    left, right = _frames(spark)
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    for direction in ("backward", "forward", "nearest"):
        got = {
            (r.user_id, r.ts): r.v_r
            for r in asof_join(
                left, right, on="user_id", direction=direction
            ).collect()
        }
        exp = pd.merge_asof(
            lp, rp, on="ts", by="user_id", direction=direction,
            suffixes=("", "_r"),
        )
        for _, row in exp.iterrows():
            want = None if pd.isna(row["v"]) else row["v"]
            assert got[(row["user_id"], row["ts"])] == want, direction


def test_asof_forward_tolerance(spark):
    left, right = _frames(spark)
    out = {
        (r.user_id, r.ts.second): r.v_r
        for r in asof_join(
            left, right, on="user_id", direction="forward",
            tolerance_us=50_000_000,
        ).collect()
    }
    # click at :10 -> view at :55 is 45 s away (within 50 s)
    assert out[(1, 10)] == 200.0
    # click at 1:00 -> next view at 2:00 is 60 s away -> NULL
    assert out[(1, 0)] is None
    # user 2 has no views at all -> NULL
    assert out[(2, 0)] is None
