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


def _knn_cov3(
    df: DataFrame,
    knn: int,
    radius0: float,
    x: str,
    y: str,
    z: str,
    id_col: str,
) -> DataFrame:
    """Per-point 3x3 population covariance over the kNN neighborhood
    (self included, matching KD3Index::neighbors which returns the
    query point at distance 0): (id, n_neighbors, cxx..cyz).
    Decimal-exact sums — the covariance3d discipline on the kNN
    neighborhood instead of the ball."""
    from pdal_spark.operators.knn import knn_join_3d

    pairs = knn_join_3d(
        df, df, k=int(knn), radius0=float(radius0), x=x, y=y, z=z,
        id_left=id_col, id_right=id_col, include_self=True,
    )
    nx, ny, nz = F.col(f"nb_{x}"), F.col(f"nb_{y}"), F.col(f"nb_{z}")
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
        return F.col(sab) / n - (F.col(sa) / n) * (F.col(sb) / n)

    return (
        s.withColumn("cxx", cov("sxx", "sx", "sx"))
        .withColumn("cyy", cov("syy", "sy", "sy"))
        .withColumn("czz", cov("szz", "sz", "sz"))
        .withColumn("cxy", cov("sxy", "sx", "sy"))
        .withColumn("cxz", cov("sxz", "sx", "sz"))
        .withColumn("cyz", cov("syz", "sy", "sz"))
        .select(F.col("src_id").alias(id_col), "n_neighbors",
                "cxx", "cyy", "czz", "cxy", "cxz", "cyz")
    )


def _eig3_closed_form(s: DataFrame) -> DataFrame:
    """Ascending eigenvalues (ev0 <= ev1 <= ev2) of the symmetric 3x3
    (cxx,cyy,czz,cxy,cxz,cyz) via the trigonometric closed form — no
    eigh, pure Catalyst, so a DuckDB oracle can mirror it textually
    (the comparisons the named ops emit are integer-robust; the raw
    eigenvalues stay internal).

        q  = tr/3;  p2 = sum((diag - q)^2) + 2(cxy^2+cxz^2+cyz^2)
        p  = sqrt(p2/6);  B = (A - qI)/p;  r = clamp(det(B)/2, ±1)
        phi = acos(r)/3
        ev2 = q + 2p cos(phi); ev0 = q + 2p cos(phi + 2pi/3)
        ev1 = 3q - ev0 - ev2
    """
    import math

    cxx, cyy, czz = F.col("cxx"), F.col("cyy"), F.col("czz")
    cxy, cxz, cyz = F.col("cxy"), F.col("cxz"), F.col("cyz")
    q = (cxx + cyy + czz) / F.lit(3.0)
    p1 = cxy * cxy + cxz * cxz + cyz * cyz
    p2 = (
        (cxx - q) * (cxx - q) + (cyy - q) * (cyy - q)
        + (czz - q) * (czz - q) + F.lit(2.0) * p1
    )
    s = s.withColumn("__q", q).withColumn("__p2", p2)
    q, p2 = F.col("__q"), F.col("__p2")
    p = F.sqrt(p2 / F.lit(6.0))
    # det((A - qI)/p) via cofactor expansion on shifted diagonals
    bxx, byy, bzz = (cxx - q) / p, (cyy - q) / p, (czz - q) / p
    bxy, bxz, byz = cxy / p, cxz / p, cyz / p
    detb = (
        bxx * (byy * bzz - byz * byz)
        - bxy * (bxy * bzz - byz * bxz)
        + bxz * (bxy * byz - byy * bxz)
    )
    r = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), detb / F.lit(2.0)))
    phi = F.acos(r) / F.lit(3.0)
    two_thirds_pi = F.lit(2.0 * math.pi / 3.0)
    ev2 = q + F.lit(2.0) * p * F.cos(phi)
    ev0 = q + F.lit(2.0) * p * F.cos(phi + two_thirds_pi)
    iso = p2 <= F.lit(0.0)
    s = (
        s.withColumn("ev2", F.when(iso, q).otherwise(ev2))
        .withColumn("ev0", F.when(iso, q).otherwise(ev0))
    )
    s = s.withColumn(
        "ev1",
        F.lit(3.0) * q - F.col("ev0") - F.col("ev2"),
    )
    return s.drop("__q", "__p2")


def estimate_rank(
    df: DataFrame,
    knn: int = 8,
    thresh: float = 0.01,
    radius0: float = 4.0,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    id_col: str = "pid",
) -> DataFrame:
    """filters.estimaterank (EstimateRankFilter.cpp:86 ->
    math::computeRank, pdal/private/MathUtils.cpp:195): per-point
    rank of the kNN-neighborhood covariance — JacobiSVD.rank() with
    setThreshold(thresh) counts singular values strictly greater than
    thresh * sigma_max; on a symmetric PSD covariance the singular
    values ARE the eigenvalues, so rank = #(ev_i > thresh * ev_max)
    from the closed-form eigenvalues. Output: (id, n_neighbors,
    rank) — integer, oracle-exact.

    Scale: one exact kNN join + one hash agg + row-local arithmetic.
    """
    s = _eig3_closed_form(
        _knn_cov3(df, knn, radius0, x, y, z, id_col)
    )
    evmax = F.col("ev2")
    t = F.lit(float(thresh)) * evmax

    def cnt(ev):
        return F.when(ev > t, 1).otherwise(0)

    rank = F.when(evmax <= F.lit(0.0), F.lit(0)).otherwise(
        cnt(F.col("ev0")) + cnt(F.col("ev1")) + cnt(F.col("ev2"))
    )
    return s.select(
        id_col, "n_neighbors",
        rank.cast("int").alias("rank"),
    )


def approximate_coplanar(
    df: DataFrame,
    knn: int = 8,
    thresh1: float = 25.0,
    thresh2: float = 6.0,
    radius0: float = 4.0,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    id_col: str = "pid",
) -> DataFrame:
    """filters.approximatecoplanar (ApproximateCoplanarFilter.cpp:117,
    Limberger & Oliveira 2015 pre-test): with ascending eigenvalues
    ev0 <= ev1 <= ev2 of the kNN covariance, a point is approximately
    coplanar iff ev1 > thresh1 * ev0 AND thresh2 * ev1 > ev2
    (defaults 25/6 per :69-70). Output: (id, n_neighbors, coplanar)
    — 0/1 integer, oracle-exact."""
    s = _eig3_closed_form(
        _knn_cov3(df, knn, radius0, x, y, z, id_col)
    )
    flag = (
        (F.col("ev1") > F.lit(float(thresh1)) * F.col("ev0"))
        & (F.lit(float(thresh2)) * F.col("ev1") > F.col("ev2"))
    )
    return s.select(
        id_col, "n_neighbors",
        F.when(flag, 1).otherwise(0).cast("int").alias("coplanar"),
    )
