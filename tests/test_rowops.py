"""M1 unit tests: expression compiler, DimRange, order-dependent ops,
voxel variants, stats — semantics not covered by the hash gates."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.functions.dimrange import DimRange, compile_ranges
from pdal_spark.functions.expr import ExpressionError, compile_expression
from pdal_spark.operators import rowops as R
from pdal_spark.operators import voxel as V
from pdal_spark.operators import stats as S
from pdal_spark.operators.base import apply_where


# --- expression compiler ---------------------------------------------------


def test_expr_precedence_and_funcs(spark):
    df = spark.range(1).select(
        F.lit(2.0).alias("a"), F.lit(3.0).alias("b")
    )
    sql = compile_expression("a + b * 2 == 8 && !(a > b)")
    assert df.selectExpr(f"{sql} as r").collect()[0]["r"] is True
    sql2 = compile_expression("floor(sqrt(b * b)) + exp2(a)")
    assert df.selectExpr(f"{sql2} as r").collect()[0]["r"] == 7.0


def test_expr_consts_and_boolfuncs(spark):
    df = spark.range(1).select(F.lit(1.5).alias("v"))
    assert (
        spark.range(1)
        .selectExpr(compile_expression("isnan(nan())") + " as r")
        .collect()[0]["r"]
        is True
    )
    assert (
        df.selectExpr(compile_expression("ismax(highest())") + " as r")
        .collect()[0]["r"]
        is True
    )


def test_expr_errors():
    with pytest.raises(ExpressionError):
        compile_expression("foo(")
    with pytest.raises(ExpressionError):
        compile_expression("nosuchfunc(1)")
    with pytest.raises(ExpressionError):
        compile_expression("a ++ b")


def test_dimrange_parse_negate():
    r = DimRange.parse("Classification![2:7)")
    assert r.negate and r.inc_lo and not r.inc_hi
    r2 = DimRange.parse("Z[:100]")
    assert r2.lo is None and r2.hi == 100.0
    sql = compile_ranges(["a[1:2]", "a[5:6]", "b(0:)"])
    assert " OR " in sql and " AND " in sql


# --- order-dependent ops ---------------------------------------------------


@pytest.fixture(scope="module")
def seq(spark):
    return spark.range(100).withColumn("v", (F.col("id") * 7) % 13)


def test_head_tail_invert(seq):
    assert R.head(seq, 10, "id").count() == 10
    assert R.head(seq, 10, "id", invert=True).count() == 90
    t = R.tail(seq, 5, "id").select("id").toPandas()["id"].tolist()
    assert sorted(t) == [95, 96, 97, 98, 99]


def test_decimation_limit(seq):
    out = R.decimation(seq, step=10, order="id", offset=2, limit=50)
    ids = sorted(out.toPandas()["id"])
    assert ids == [2, 12, 22, 32, 42]


def test_sort_last_dim_primary(spark):
    # SortFilter.cpp:80-120 — PDAL stable-sorts later dims, making the
    # LAST listed dim the primary key; mirror check.
    df = spark.createDataFrame(
        pd.DataFrame({"a": [2, 1, 2, 1], "b": [1, 1, 0, 0]})
    )
    rows = R.sort(df, [("a", "asc"), ("b", "asc")]).collect()
    assert [(r["a"], r["b"]) for r in rows] == [
        (1, 0), (2, 0), (1, 1), (2, 1)
    ]


def test_merge_mixed_schema(spark):
    d1 = spark.range(3).withColumn("x", F.lit(1.0))
    d2 = spark.range(2).withColumn("y", F.lit(2.0))
    m = R.merge([d1, d2])
    assert m.count() == 5
    assert set(m.columns) == {"id", "x", "y"}


def test_apply_where_merge(spark):
    df = spark.range(10).withColumn("v", F.col("id") * 1.0)
    out = apply_where(
        df,
        lambda d: d.withColumn("v", F.col("v") + 100),
        where=F.col("id") < 3,
    )
    pdf = out.toPandas().sort_values("id")
    assert pdf["v"].tolist() == [100.0, 101.0, 102.0] + [
        float(i) for i in range(3, 10)
    ]
    out2 = apply_where(
        df, lambda d: d, where=F.col("id") < 3, where_merge=False
    )
    assert out2.count() == 3


# --- voxel family ----------------------------------------------------------


@pytest.fixture(scope="module")
def cloud(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(500),
            "x": rng.uniform(0, 10, 500),
            "y": rng.uniform(0, 10, 500),
            "z": rng.uniform(0, 10, 500),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_voxel_downsize_first(cloud):
    sdf, pdf = cloud
    out = V.voxel_downsize(sdf, cell=2.0, order="pid").toPandas()
    vox = (pdf[["x", "y", "z"]] // 2.0).astype(int)
    exp = pdf.assign(vx=vox.x, vy=vox.y, vz=vox.z).sort_values("pid")
    exp = exp.groupby(["vx", "vy", "vz"]).first().reset_index()
    assert sorted(out["pid"]) == sorted(exp["pid"])


def test_voxel_center_mode_snaps(cloud):
    sdf, _ = cloud
    out = V.voxel_downsize(sdf, cell=2.0, order="pid", mode="center")
    xs = out.select("x").toPandas()["x"]
    assert all(abs((v - 1.0) % 2.0) < 1e-9 for v in xs)


def test_voxel_centroid_nn(cloud):
    sdf, pdf = cloud
    out = V.voxel_centroid_nn(
        sdf, cell=5.0, order="pid"
    ).toPandas()
    # oracle
    g = pdf.assign(
        vx=(pdf.x // 5).astype(int),
        vy=(pdf.y // 5).astype(int),
        vz=(pdf.z // 5).astype(int),
    )
    keep = []
    for _, grp in g.groupby(["vx", "vy", "vz"]):
        c = grp[["x", "y", "z"]].mean()
        d2 = ((grp[["x", "y", "z"]] - c) ** 2).sum(axis=1)
        grp = grp.assign(d2=d2).sort_values(["d2", "pid"])
        keep.append(grp.iloc[0]["pid"])
    assert sorted(out["pid"]) == sorted(keep)


# --- stats -----------------------------------------------------------------


def test_stats_moments_vs_numpy(spark, cloud):
    sdf, pdf = cloud
    out = S.stats(sdf, ["x"], advanced=True).toPandas().iloc[0]
    assert out["cnt"] == 500
    assert math.isclose(out["average"], pdf.x.mean(), rel_tol=1e-9)
    assert math.isclose(out["variance"], pdf.x.var(ddof=1), rel_tol=1e-9)
    # spark skewness/kurtosis are population-style; just check finite
    assert np.isfinite(out["skewness"]) and np.isfinite(out["kurtosis"])


def test_mad_iqr_cull(spark):
    pdf = pd.DataFrame({"v": list(np.linspace(0, 1, 99)) + [100.0]})
    df = spark.createDataFrame(pdf)
    assert S.mad_filter(df, "v", k=3).count() == 99  # outlier culled
    assert S.iqr_filter(df, "v", k=1.5).count() == 99


def test_elm_flags_local_minimum(spark):
    pdf = pd.DataFrame(
        {
            "pid": range(4),
            "x": [1.0, 2.0, 3.0, 4.0],
            "y": [1.0, 2.0, 3.0, 4.0],
            "z": [0.0, 5.0, 5.1, 5.2],
            "classification": [1, 1, 1, 1],
        }
    )
    out = V.elm(
        spark.createDataFrame(pdf), cell=10.0, threshold=1.0
    ).toPandas().sort_values("pid")
    assert out["classification"].tolist() == [7, 1, 1, 1]
