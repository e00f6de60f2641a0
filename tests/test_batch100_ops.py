"""Invariant tests for batch 100: Knox test, JL projection,
small-group suppression."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pdal_spark.operators.pointpattern import knox_test
from pdal_spark.operators.similarity import jl_projection, jl_sign
from pdal_spark.operators.textops import suppress_small_groups


def test_knox_interaction_detected(spark):
    # cluster A: same place, same day; cluster B: same place as A,
    # 100 days later; far lone points pad the total. Space-close
    # pairs within A+B, time-close pairs within A or B -> st pairs
    # only inside each cluster => knox ratio > 1
    rows = []
    pid = 0
    for i in range(10):
        rows.append((pid, 10.0, 10.0, f"2024-01-01 0{i}:00:00")); pid += 1
    for i in range(10):
        rows.append((pid, 10.001, 10.0, f"2024-04-10 0{i}:00:00")); pid += 1
    for i in range(20):
        rows.append((pid, -100.0 + i * 7, -50.0 + i,
                     f"2024-0{1 + i % 3}-15 12:00:00")); pid += 1
    df = spark.createDataFrame(
        rows, "pid long, lon double, lat double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = knox_test(df, space_md=2000, time_us=86_400_000_000,
                  id_col="pid").collect()[0]
    assert r["n"] == 40
    assert r["st_pairs"] == 90  # 2 * C(10,2): within-cluster pairs
    assert r["knox_ratio"] > 1.0


def test_jl_projection_preserves_identity_and_scale(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [2.0] * 64), (3, [0.0] * 64)],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in
           jl_projection(df, out_dim=4, dims=64).collect()}
    # linear: doubling the vector doubles every projection
    for k in range(4):
        assert abs(out[2][f"j{k}"] - 2 * out[1][f"j{k}"]) < 1e-12
        assert out[3][f"j{k}"] == 0.0
    # projection of all-ones = sum of signs / sqrt(k)
    s0 = sum(jl_sign(d, 0) for d in range(64)) / math.sqrt(4.0)
    assert abs(out[1]["j0"] - s0) < 1e-9


def test_jl_sign_balance():
    # signs should be roughly balanced per output dim
    for k in range(8):
        s = sum(jl_sign(d, k) for d in range(64))
        assert abs(s) < 32


def test_suppress_small_groups_totals_preserved(spark):
    rows = [("a", i) for i in range(20)] + [("b", 0)] * 3 \
        + [("c", 1)] * 2
    df = spark.createDataFrame(rows, "g string, u long")
    out = {r["g"]: r["n"] for r in
           suppress_small_groups(df, ["g"], k=5).collect()}
    assert out["a"] == 20
    assert "b" not in out and "c" not in out
    assert out["__other__"] == 5          # 3 + 2 folded, not dropped
    assert sum(out.values()) == 25        # totals exact


def test_gates_smoke_sf0001(spark):
    from pdal_spark.gate import GATES

    for name in ["knox_test", "jl_projection",
                 "suppress_small_groups"]:
        df = GATES[name].spark_fn(spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name
