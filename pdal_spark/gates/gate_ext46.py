"""Gate registry extension 46 — native-3D neighborhood family:
filters.covariancefeatures / filters.normal in their reference
dimensionality (CovarianceFeaturesFilter.cpp:215-360,
NormalFilter.cpp:116-160).

Oracle strategy: the 3x3 covariance entries and their POLYNOMIAL
invariants (trace, second invariant, determinant) are symmetric
functions of the eigenvalues computable without any eigen step —
decimal-exact sums then plain double arithmetic, mirrored term for
term in SQL (the eigen_features pattern, one dimension up). The
eigendecomposition itself (np.linalg.eigh) is float-path — rows-only
gate + numpy-pinned pytest (tests/test_features3d.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import features3d as f3
from pdal_spark.operators import h3 as ops_h3

_F3_R = 8.0
_F3_Z = "(CAST((c_custkey * 7) % 500 AS DOUBLE) / 25.0e0)"


def _pts3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    pts = ops_h3.geocode(cust, "c_custkey")
    return pts.select(
        "c_custkey", "lat", "lon", F.expr(_F3_Z).alias("z")
    )


def _cov3_sql() -> str:
    d = "decimal(30,10)"

    def dsum(e):
        return f"cast(sum(cast({e} as {d})) as double)"

    p3 = (
        f"(SELECT c_custkey, {G.geo_lat('c_custkey')} AS lat,"
        f" {G.geo_lon('c_custkey')} AS lon,"
        f" {_F3_Z} AS z"
        " FROM customer)"
    )
    return f"""
    WITH pairs AS (
      SELECT a.c_custkey AS src_id,
             b.lon AS nx, b.lat AS ny, b.z AS nz
      FROM {p3} a JOIN {p3} b
        ON sqrt((b.lon - a.lon) * (b.lon - a.lon)
              + (b.lat - a.lat) * (b.lat - a.lat)
              + (b.z - a.z) * (b.z - a.z)) <= {G.fnum(_F3_R)}
    ), s AS (
      SELECT src_id, count(*) AS n,
             {dsum('nx')} AS sx, {dsum('ny')} AS sy,
             {dsum('nz')} AS sz,
             {dsum('nx * nx')} AS sxx, {dsum('ny * ny')} AS syy,
             {dsum('nz * nz')} AS szz,
             {dsum('nx * ny')} AS sxy, {dsum('nx * nz')} AS sxz,
             {dsum('ny * nz')} AS syz
      FROM pairs GROUP BY src_id
    ), c AS (
      SELECT src_id, n,
             sxx / n - (sx / n) * (sx / n) AS cxx,
             syy / n - (sy / n) * (sy / n) AS cyy,
             szz / n - (sz / n) * (sz / n) AS czz,
             sxy / n - (sx / n) * (sy / n) AS cxy,
             sxz / n - (sx / n) * (sz / n) AS cxz,
             syz / n - (sy / n) * (sz / n) AS cyz
      FROM s
    )
    SELECT src_id AS c_custkey, n AS n_neighbors,
           cxx + cyy + czz AS trace3,
           (cxx * cyy - cxy * cxy) + (cxx * czz - cxz * cxz)
             + (cyy * czz - cyz * cyz) AS i2,
           cxx * (cyy * czz - cyz * cyz)
             - cxy * (cxy * czz - cyz * cxz)
             + cxz * (cxy * cyz - cyy * cxz) AS det3
    FROM c
    """


@gate("covariance3d_invariants", _cov3_sql())
def q_cov3(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts3(spark, sf_dir)
    out = f3.covariance3d(pts, _F3_R, x="lon", y="lat", z="z",
                          id_col="c_custkey")
    return out.select(
        "c_custkey", "n_neighbors", "trace3", "i2", "det3"
    )


@gate("features3d_planarity", None)
def q_features3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full feature set incl. the eigh path — rows-only (float
    eigendecomposition); plane-fixture exactness pinned in pytest."""
    pts = _pts3(spark, sf_dir).limit(3000)
    out = f3.neighborhood_features_3d(
        pts, _F3_R, x="lon", y="lat", z="z", id_col="c_custkey",
        mode="normalized",
    )
    return out.select(
        "c_custkey", "n_neighbors", "linearity", "planarity",
        "scattering", "verticality", "normal_x", "normal_y",
        "normal_z",
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# knn_join_3d — exact 3D kNN (KD3Index analog). Oracle: pairwise 3D
# sqrt ranking (the house "rank like the kernel" convention — sqrt is
# correctly rounded so both engines rank identically).
# ---------------------------------------------------------------------------
_K3_K = 3


def _knn3_sql() -> str:
    p3 = (
        f"(SELECT c_custkey, {G.geo_lat('c_custkey')} AS lat,"
        f" {G.geo_lon('c_custkey')} AS lon, {_F3_Z} AS z"
        " FROM customer)"
    )
    d3 = ("sqrt((b.lon - a.lon) * (b.lon - a.lon)"
          " + (b.lat - a.lat) * (b.lat - a.lat)"
          " + (b.z - a.z) * (b.z - a.z))")
    return f"""
    WITH ranked AS (
      SELECT a.c_custkey AS src_id, b.c_custkey AS nb_id,
             row_number() OVER (
               PARTITION BY a.c_custkey
               ORDER BY {d3} ASC, b.c_custkey ASC
             ) AS nn_rank
      FROM {p3} a JOIN {p3} b ON a.c_custkey <> b.c_custkey
    )
    SELECT src_id, nb_id, nn_rank FROM ranked
    WHERE nn_rank <= {_K3_K}
    """


@gate("knn_join_3d", _knn3_sql())
def q_knn3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.knn import knn_join_3d

    pts = _pts3(spark, sf_dir)
    out = knn_join_3d(
        pts, pts, k=_K3_K, radius0=4.0, x="lon", y="lat", z="z",
        id_left="c_custkey", id_right="c_custkey",
        include_self=False,
    )
    return out.select("src_id", "nb_id", "nn_rank")


# ---------------------------------------------------------------------------
# boilerplate_strip — jusText-style content-line extraction. Integer
# cross-multiplied stopword share: no float ratio, oracle-exact.
# ---------------------------------------------------------------------------


def _boiler_sql() -> str:
    from pdal_spark.operators.textops import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    words = "list_filter(string_split(l, ' '), w -> w <> '')"
    nstop = (
        "len(list_filter(string_split(l, ' '), w -> w <> '' AND "
        f"list_contains([{stops}], lower(w))))"
    )
    pred = (f"len({words}) >= 5 AND {nstop} * 100"
            f" >= len({words}) * 10")
    return f"""
    SELECT doc_id,
           len(string_split(text, chr(10))) AS n_lines_total,
           len(kept) AS n_lines_kept,
           coalesce(array_to_string(kept, chr(10)), '') AS clean_text
    FROM (
      SELECT doc_id, text,
             list_filter(string_split(text, chr(10)),
                         l -> {pred}) AS kept
      FROM documents
    ) _b
    """


@gate("boilerplate_strip", _boiler_sql())
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import boilerplate_strip

    docs = _t(spark, sf_dir, "documents")
    out = boilerplate_strip(docs, min_words=5, stop_pct=10)
    return out.select(
        "doc_id", "n_lines_total", "n_lines_kept", "clean_text"
    )


# ---------------------------------------------------------------------------
# filters.straighten (StraightenFilter.cpp, planar polyline form):
# curvilinear (s, t) along a corridor. Shared dual-dialect formula —
# +,-,*,/,sqrt/least/greatest/CASE only, raw doubles hash-exact.
# ---------------------------------------------------------------------------
_ST_LINE = [(-60.0, -20.0), (-10.0, 0.0), (30.0, 25.0), (70.0, 10.0)]


def _straighten_sql() -> str:
    s, t = G.straighten_st("lon", "lat", _ST_LINE)
    return f"""
    SELECT event_id, {s} AS s, {t} AS t
    FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                 {G.geo_lon('event_id')} AS lon
          FROM events) _p
    """


@gate("straighten_corridor", _straighten_sql())
def q_straighten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.transform import straighten

    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    out = straighten(pts, _ST_LINE)
    return out.select("event_id", "s", "t")


# ---------------------------------------------------------------------------
# reproject_utm_auto — per-row zone UTM for global tables, mm
# quantized on both sides (same Karney series as reproject_utm).
# ---------------------------------------------------------------------------


def _utm_auto_sql() -> str:
    e, n = G.utm_xy_auto("lat", "lon", G.DUCKDB)
    q, h = G.fnum(1000.0), G.fnum(0.5)
    return f"""
    SELECT event_id, {G.utm_zone_expr('lon')} AS utm_zone,
           CAST(floor({e} * {q} + {h}) AS BIGINT) AS e_mm,
           CAST(floor({n} * {q} + {h}) AS BIGINT) AS n_mm
    FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                 {G.geo_lon('event_id')} AS lon
          FROM events) _p
    WHERE lat >= {G.fnum(-80.0)} AND lat <= {G.fnum(84.0)}
    """


@gate("utm_auto_zone", _utm_auto_sql())
def q_utm_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.transform import reproject_utm_auto

    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id").where(
        (F.col("lat") >= -80.0) & (F.col("lat") <= 84.0)
    )
    out = reproject_utm_auto(pts)
    q, h = G.fnum(1000.0), G.fnum(0.5)
    return out.select(
        "event_id", "utm_zone",
        F.expr(f"CAST(floor(easting * {q} + {h}) AS BIGINT)")
        .alias("e_mm"),
        F.expr(f"CAST(floor(northing * {q} + {h}) AS BIGINT)")
        .alias("n_mm"),
    )
