"""Invariant tests for batch 98: discrete Frechet pairs,
k-anonymity audit, spatial k-anonymity geo-masking."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdal_spark.operators.h3 import geo_k_anonymize
from pdal_spark.operators.temporal import frechet_pairs
from pdal_spark.operators.textops import k_anonymity


def _traj(spark, rows):
    return spark.createDataFrame(
        rows, "k long, o long, xq long, yq long, blk long"
    )


def test_frechet_identical_and_shifted(spark):
    a = [(1, i, i * 10, 0, 0) for i in range(5)]
    b = [(2, i, i * 10, 0, 0) for i in range(5)]      # identical
    c = [(3, i, i * 10, 7, 0) for i in range(5)]      # shifted up 7
    out = frechet_pairs(_traj(spark, a + b + c), key="k", order="o",
                        x="xq", y="yq", block="blk").collect()
    f = {(r["key_a"], r["key_b"]): r["f2"] for r in out}
    assert f[(1, 2)] == 0
    assert f[(1, 3)] == 49  # constant offset: frechet = offset
    assert f[(2, 3)] == 49


def test_frechet_exceeds_hausdorff_on_reversed(spark):
    # a line walked forward vs backward: Hausdorff 0, Frechet = span
    fwd = [(1, i, i * 100, 0, 0) for i in range(5)]
    rev = [(2, i, (4 - i) * 100, 0, 0) for i in range(5)]
    out = frechet_pairs(_traj(spark, fwd + rev), key="k", order="o",
                        x="xq", y="yq", block="blk").collect()
    assert out[0]["f2"] == 400 ** 2


def test_k_anonymity_flags(spark):
    rows = [("a", 1, f"s{i}") for i in range(10)]       # big, diverse
    rows += [("b", 2, "same")] * 3                       # small, uniform
    df = spark.createDataFrame(rows, "qi string, u long, sens string")
    out = {r["qi"]: r for r in
           k_anonymity(df, ["qi"], k=5, sensitive="sens",
                       l_div=2).collect()}
    assert out["a"]["n"] == 10 and out["a"]["k_risky"] == 0
    assert out["a"]["n_sensitive"] == 10 and out["a"]["l_risky"] == 0
    assert out["b"]["n"] == 3 and out["b"]["k_risky"] == 1
    assert out["b"]["n_sensitive"] == 1 and out["b"]["l_risky"] == 1


def test_geo_k_anonymize_dense_vs_sparse(spark):
    # 20 points in one tight clump -> fine res; 1 isolated point ->
    # must coarsen until it shares a cell with the clump
    pts = [(i, 10.0 + i * 1e-6, 10.0) for i in range(20)]
    pts.append((99, 10.4, 10.0))  # ~0.4 deg away
    df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    out = {r["pid"]: r for r in
           geo_k_anonymize(df, id_col="pid", k=10,
                           max_res=12).collect()}
    assert out[0]["res_used"] == 12          # clump: finest res holds
    assert out[99]["res_used"] < 12          # outlier coarsens
    assert out[99]["res_used"] >= 0
    # every published cell at its res_used contains >= k points:
    # verify for the outlier by recomputing membership
    r = out[99]["res_used"]
    cix, ciy = out[99]["cix"], out[99]["ciy"]
    n_in = sum(
        1 for p in out.values()
        if (p["cix"] if p["res_used"] == r else None) is not None
    )
    # structural check: outlier shares its coarse cell with the clump
    clump_cix = out[0]["cix"] >> (out[0]["res_used"] - r)
    clump_ciy = out[0]["ciy"] >> (out[0]["res_used"] - r)
    assert (cix, ciy) == (clump_cix, clump_ciy)


def test_geo_k_anonymize_total_below_k(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 50.0, 20.0)],
        "pid long, lon double, lat double",
    )
    out = geo_k_anonymize(df, id_col="pid", k=10, max_res=6).collect()
    assert all(r["res_used"] == -1 and r["cix"] is None for r in out)


def test_gates_smoke_sf0001(spark):
    from pdal_spark.gate import GATES

    for name in ["frechet_pairs", "k_anonymity", "geo_k_anonymize"]:
        df = GATES[name].spark_fn(spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name
