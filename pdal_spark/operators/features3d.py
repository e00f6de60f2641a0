"""3D neighborhood geometry features — the reference's NATIVE
dimensionality for filters.normal / eigenvalues / covariancefeatures
(the 2D closed-form family in operators.features covers the web-point
model; this module closes the 3D parity gap).

Reference: filters/CovarianceFeaturesFilter.cpp:215-360 (3x3
neighborhood covariance -> SelfAdjointEigenSolver -> Linearity,
Planarity, Scattering, Verticality, Omnivariance, Anisotropy,
Eigenentropy, EigenvalueSum, SurfaceVariation, Density; eigenvalue
modes raw/normalized/sqrt), filters/NormalFilter.cpp:116-160 (normal
= eigenvector of the smallest eigenvalue, +Z orientation by
default).

Distributed shape: candidate pairs ride the SAME 2D cell-bucketed
radius join as the planar family (a 3D ball is contained in the 2D
cylinder of equal radius, so the xy join is a lossless prefilter; z
is re-checked exactly) -> per-source 3x3 sufficient statistics as
ONE map-side-combined aggregate with exact decimal sums (the fold is
associative, partitioning-invariant) -> covariance entries and their
POLYNOMIAL invariants (trace, I2, det) in pure Catalyst doubles
(IEEE-exact: oracle-able bit-for-bit) -> ONE vectorized pandas_udf
batching np.linalg.eigh over the stacked (n, 3, 3) matrices for the
eigendecomposition itself (the only non-polynomial step; Eigen's
solver analog, no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark.operators.knn import radius_join


def radius_join_3d(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    id_left: str = "pid",
    id_right: str = "pid",
    include_self: bool = True,
) -> DataFrame:
    """All pairs (src_id, nb_id, dist3, nb_x, nb_y, nb_z) with
    EUCLIDEAN 3D distance <= radius. The xy cell join yields the
    cylinder candidates; the exact ball test re-derives all three
    component differences fresh (bit-identical expression shape to a
    SQL oracle — never dist2d^2 + dz^2, whose inner sqrt rounds)."""
    pairs = radius_join(
        left, right, radius, x=x, y=y, id_left=id_left,
        id_right=id_right, right_cols=[x, y, z],
        include_self=include_self,
    ).drop("dist")
    lcoords = left.select(
        F.col(id_left).alias("src_id"),
        F.col(x).cast("double").alias("__lx"),
        F.col(y).cast("double").alias("__ly"),
        F.col(z).cast("double").alias("__lz"),
    )
    j = pairs.join(lcoords, on="src_id")
    d3 = F.sqrt(
        (F.col(f"nb_{x}") - F.col("__lx"))
        * (F.col(f"nb_{x}") - F.col("__lx"))
        + (F.col(f"nb_{y}") - F.col("__ly"))
        * (F.col(f"nb_{y}") - F.col("__ly"))
        + (F.col(f"nb_{z}") - F.col("__lz"))
        * (F.col(f"nb_{z}") - F.col("__lz"))
    )
    return (
        j.withColumn("dist3", d3)
        .where(F.col("dist3") <= float(radius))
        .drop("__lx", "__ly", "__lz")
    )


def covariance3d(
    df: DataFrame,
    radius: float,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    id_col: str = "pid",
) -> DataFrame:
    """Per-point 3x3 neighborhood covariance (population, matching
    Eigen::computeCovarianceMatrix) + its polynomial invariants:
    (id, n_neighbors, cxx, cyy, czz, cxy, cxz, cyz, trace3, i2, det3).
    trace/I2/det are symmetric functions of the eigenvalues computed
    WITHOUT any eigen step — pure double polynomials, oracle-exact."""
    pairs = radius_join_3d(
        df, df, radius, x=x, y=y, z=z, id_left=id_col,
        id_right=id_col, include_self=True,
    )
    nx = F.col(f"nb_{x}")
    ny = F.col(f"nb_{y}")
    nz = F.col(f"nb_{z}")
    dec = "decimal(30,10)"

    def dsum(col):
        return F.sum(col.cast(dec)).cast("double")

    s = pairs.groupBy("src_id").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        dsum(nx).alias("sx"), dsum(ny).alias("sy"),
        dsum(nz).alias("sz"),
        dsum(nx * nx).alias("sxx"), dsum(ny * ny).alias("syy"),
        dsum(nz * nz).alias("szz"),
        dsum(nx * ny).alias("sxy"), dsum(nx * nz).alias("sxz"),
        dsum(ny * nz).alias("syz"),
    )
    n = F.col("n_neighbors")

    def cov(sab, sa, sb):
        return (F.col(sab) / n
                - (F.col(sa) / n) * (F.col(sb) / n))

    s = (
        s.withColumn("cxx", cov("sxx", "sx", "sx"))
        .withColumn("cyy", cov("syy", "sy", "sy"))
        .withColumn("czz", cov("szz", "sz", "sz"))
        .withColumn("cxy", cov("sxy", "sx", "sy"))
        .withColumn("cxz", cov("sxz", "sx", "sz"))
        .withColumn("cyz", cov("syz", "sy", "sz"))
    )
    cxx, cyy, czz = F.col("cxx"), F.col("cyy"), F.col("czz")
    cxy, cxz, cyz = F.col("cxy"), F.col("cxz"), F.col("cyz")
    s = (
        s.withColumn("trace3", cxx + cyy + czz)
        .withColumn(
            "i2",
            (cxx * cyy - cxy * cxy) + (cxx * czz - cxz * cxz)
            + (cyy * czz - cyz * cyz),
        )
        .withColumn(
            "det3",
            cxx * (cyy * czz - cyz * cyz)
            - cxy * (cxy * czz - cyz * cxz)
            + cxz * (cxy * cyz - cyy * cxz),
        )
    )
    return s.select(
        F.col("src_id").alias(id_col), "n_neighbors",
        "cxx", "cyy", "czz", "cxy", "cxz", "cyz",
        "trace3", "i2", "det3",
    )


def neighborhood_features_3d(
    df: DataFrame,
    radius: float,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    id_col: str = "pid",
    mode: str = "raw",
) -> DataFrame:
    """filters.covariancefeatures + filters.normal in 3D.

    Adds: eigenvalue_1 >= eigenvalue_2 >= eigenvalue_3 (clamped >= 0
    like the reference, :252-254), linearity, planarity, scattering,
    verticality (the Demantke unary-vector form, :306-320),
    omnivariance, anisotropy, eigenentropy, sum_eigen,
    surface_variation, normal_x/y/z (smallest-eigenvalue eigenvector
    oriented nz >= 0, NormalFilter.cpp:116-160).

    ``mode``: eigenvalues used for the FEATURES are raw, "sqrt"
    (Gressin 2012) or "normalized" (/ sum) — :260-274.

    One radius join + one hash aggregate + one Arrow-batched eigh.
    """
    import numpy as np
    import pandas as pd

    if mode not in ("raw", "sqrt", "normalized"):
        raise ValueError(f"unknown mode {mode!r}")
    cov = covariance3d(df, radius, x, y, z, id_col)

    @F.pandas_udf(
        "struct<l1:double,l2:double,l3:double,"
        "nx:double,ny:double,nz:double,vert:double>"
    )
    def eig(cxx, cyy, czz, cxy, cxz, cyz):
        m = len(cxx)
        A = np.zeros((m, 3, 3))
        A[:, 0, 0] = cxx
        A[:, 1, 1] = cyy
        A[:, 2, 2] = czz
        A[:, 0, 1] = A[:, 1, 0] = cxy
        A[:, 0, 2] = A[:, 2, 0] = cxz
        A[:, 1, 2] = A[:, 2, 1] = cyz
        w, v = np.linalg.eigh(A)  # ascending eigenvalues
        l1 = np.maximum(w[:, 2], 0.0)
        l2 = np.maximum(w[:, 1], 0.0)
        l3 = np.maximum(w[:, 0], 0.0)
        # verticality: unary vector over |eigenvector| weighted by
        # RAW lambdas (CovarianceFeaturesFilter.cpp:306-320)
        u = (l1[:, None] * np.abs(v[:, :, 2])
             + l2[:, None] * np.abs(v[:, :, 1])
             + l3[:, None] * np.abs(v[:, :, 0]))
        un = np.sqrt((u * u).sum(axis=1))
        vert = np.where(un > 0, u[:, 2] / np.where(un > 0, un, 1.0),
                        0.0)
        # normal: smallest-eigenvalue eigenvector, oriented nz >= 0
        nrm = v[:, :, 0]
        flip = np.where(nrm[:, 2] < 0, -1.0, 1.0)
        nrm = nrm * flip[:, None]
        return pd.DataFrame({
            "l1": l1, "l2": l2, "l3": l3,
            "nx": nrm[:, 0], "ny": nrm[:, 1], "nz": nrm[:, 2],
            "vert": vert,
        })

    e = cov.withColumn(
        "__e", eig(F.col("cxx"), F.col("cyy"), F.col("czz"),
                   F.col("cxy"), F.col("cxz"), F.col("cyz"))
    )
    raw1, raw2, raw3 = (F.col("__e.l1"), F.col("__e.l2"),
                        F.col("__e.l3"))
    ssum = raw1 + raw2 + raw3
    # isolated/degenerate neighborhoods (all eigenvalues 0): the
    # reference THROWS (:257-258); the distributed analog emits NULL
    # features for those rows and keeps the job alive
    ok = raw1 > 0
    if mode == "sqrt":
        l1, l2, l3 = (F.sqrt(raw1), F.sqrt(raw2), F.sqrt(raw3))
    elif mode == "normalized":
        l1 = F.when(ok, raw1 / ssum)
        l2 = F.when(ok, raw2 / ssum)
        l3 = F.when(ok, raw3 / ssum)
    else:
        l1, l2, l3 = raw1, raw2, raw3
    feats = (
        e.withColumn("eigenvalue_1", raw1)
        .withColumn("eigenvalue_2", raw2)
        .withColumn("eigenvalue_3", raw3)
        .withColumn("linearity", F.when(ok, (l1 - l2) / l1))
        .withColumn("planarity", F.when(ok, (l2 - l3) / l1))
        .withColumn("scattering", F.when(ok, l3 / l1))
        .withColumn("verticality", F.when(ok, F.col("__e.vert")))
        .withColumn("omnivariance", F.when(ok, F.cbrt(l1 * l2 * l3)))
        .withColumn("anisotropy", F.when(ok, (l1 - l3) / l1))
        .withColumn(
            "eigenentropy",
            F.when(
                ok,
                -(F.when(l1 > 0, l1 * F.log(l1)).otherwise(0.0)
                  + F.when(l2 > 0, l2 * F.log(l2)).otherwise(0.0)
                  + F.when(l3 > 0, l3 * F.log(l3)).otherwise(0.0)),
            ),
        )
        .withColumn("sum_eigen", l1 + l2 + l3)
        .withColumn("surface_variation",
                    F.when(ok, l3 / (l1 + l2 + l3)))
        .withColumn("normal_x", F.col("__e.nx"))
        .withColumn("normal_y", F.col("__e.ny"))
        .withColumn("normal_z", F.col("__e.nz"))
        .drop("__e")
    )
    return df.join(feats, on=id_col, how="left")
