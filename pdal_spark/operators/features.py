"""Neighborhood geometry features (SURVEY.md §2.7 bottom row).

The reference ships a family of per-point features computed from the
k/radius-neighborhood covariance matrix: filters.eigenvalues
(EigenvaluesFilter.cpp), filters.covariancefeatures
(CovarianceFeaturesFilter.cpp: linearity/planarity/...),
filters.normal, filters.estimaterank, filters.approximatecoplanar.
All of them share one kernel: neighborhood -> covariance ->
eigendecomposition.

Distributed shape: ONE radius join (cell-bucketed, operators.knn),
then per-source sufficient statistics (n, Σx, Σy, Σxx, Σyy, Σxy) as
a map-side-combinable agg, then the CLOSED-FORM 2x2 symmetric
eigenvalues — pure Catalyst (+,-,*,/,sqrt: IEEE-exact, so the DuckDB
oracle matches bit-for-bit). PDAL's 3D variants need a cubic solve;
the engine's point model is 2D (lon/lat web points), where the
closed form is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark.operators.knn import radius_join


def neighborhood_features(
    df: DataFrame,
    radius: float,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    include_self: bool = True,
) -> DataFrame:
    """Per-point 2D covariance eigen-features of the radius
    neighborhood: eigenvalue_1 >= eigenvalue_2 (population
    covariance, like the reference's Eigen::computeCovarianceMatrix),
    linearity (l1-l2)/l1, sum_eigen, and n_neighbors."""
    pairs = radius_join(
        df, df, radius, x=x, y=y, id_left=id_col, id_right=id_col,
        right_cols=[x, y], include_self=include_self,
    )
    nx, ny = F.col(f"nb_{x}"), F.col(f"nb_{y}")
    # sums routed through decimal: float sums are partial-agg-order
    # dependent (nondeterministic across runs/partitionings); decimal
    # addition is exact and associative, then one cast back.
    dec = "decimal(30,10)"

    def dsum(col):
        return F.sum(col.cast(dec)).cast("double")

    s = pairs.groupBy("src_id").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(nx).alias("sx"), dsum(ny).alias("sy"),
        dsum(nx * nx).alias("sxx"),
        dsum(ny * ny).alias("syy"),
        dsum(nx * ny).alias("sxy"),
    )
    n = F.col("n")
    # population covariance entries
    cxx = F.col("sxx") / n - (F.col("sx") / n) * (F.col("sx") / n)
    cyy = F.col("syy") / n - (F.col("sy") / n) * (F.col("sy") / n)
    cxy = F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n)
    s = (
        s.withColumn("cxx", cxx)
        .withColumn("cyy", cyy)
        .withColumn("cxy", cxy)
    )
    # closed-form symmetric 2x2 eigenvalues
    mean = (F.col("cxx") + F.col("cyy")) / F.lit(2.0)
    half = (F.col("cxx") - F.col("cyy")) / F.lit(2.0)
    root = F.sqrt(half * half + F.col("cxy") * F.col("cxy"))
    s = (
        s.withColumn("eigenvalue_1", mean + root)
        .withColumn("eigenvalue_2", mean - root)
        .withColumn(
            "linearity",
            (F.col("eigenvalue_1") - F.col("eigenvalue_2"))
            / F.col("eigenvalue_1"),
        )
        .withColumn(
            "sum_eigen", F.col("eigenvalue_1") + F.col("eigenvalue_2")
        )
        .withColumnRenamed("n", "n_neighbors")
    )
    # filters.normal analog: the unit eigenvector of the SMALLER
    # eigenvalue, direction (cxy, lambda2 - cxx); degenerate
    # (isotropic, cxy == 0) neighborhoods take the axis of smaller
    # variance — same CASE logic the oracle mirrors.
    nx_raw = F.col("cxy")
    ny_raw = F.col("eigenvalue_2") - F.col("cxx")
    nrm = F.sqrt(nx_raw * nx_raw + ny_raw * ny_raw)
    s = s.withColumn(
        "normal_x",
        F.when(nrm > 0, nx_raw / nrm)
        .when(F.col("cxx") <= F.col("cyy"), F.lit(1.0))
        .otherwise(F.lit(0.0)),
    ).withColumn(
        "normal_y",
        F.when(nrm > 0, ny_raw / nrm)
        .when(F.col("cxx") <= F.col("cyy"), F.lit(0.0))
        .otherwise(F.lit(1.0)),
    )
    keep = ["src_id", "n_neighbors", "cxx", "cyy", "cxy",
            "eigenvalue_1", "eigenvalue_2", "linearity", "sum_eigen",
            "normal_x", "normal_y"]
    out = s.select(*keep).withColumnRenamed("src_id", id_col)
    return df.join(out, on=id_col, how="left")
