"""Invariant tests for batch 189: prefix fanout, collision
audit."""

from __future__ import annotations

from pdal_spark.operators.textops import collision_audit, prefix_fanout


def test_prefix_fanout(spark):
    words = ["car", "cat", "cart", "dog"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    out = {r["plen"]: r for r in prefix_fanout(
        df, "w", max_len=2).collect()}
    # len 1: prefixes c(3), d(1)
    assert out[1]["n_prefixes"] == 2
    assert out[1]["max_fanout"] == 3
    assert abs(out[1]["avg_fanout"] - 2.0) < 1e-12
    # len 2: ca(3), do(1)
    assert out[2]["n_prefixes"] == 2 and out[2]["max_fanout"] == 3


def test_collision_audit_counts(spark):
    df = spark.createDataFrame([(k,) for k in range(200)],
                               "k0 long")
    r = collision_audit(df, "k0", n_buckets=64).collect()[0]
    assert r["n"] == 200 and r["m"] == 64
    assert r["collisions"] == 200 - r["used_buckets"]
    # expectation is in a sane band around n - m(1-(63/64)^n)
    assert 130 < r["expected_r"] < 145
    assert r["used_buckets"] <= 64
