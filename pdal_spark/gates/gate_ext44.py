"""Gate registry extension 44 — round-2 reprojection & HAG batch:
closed-form UTM (the most-used projected CRS family, Karney/Krueger
series without PROJ) and filters.hag_nn (height above ground from
k nearest ground-classified neighbors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import transform as ops_transform

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# reproject_utm — EPSG:32631 (zone 31 north, CM 3E) forward, mm
# quantized on both sides (ReprojectionFilter.cpp:199-220 semantics).
# ---------------------------------------------------------------------------

_UTM_ZONE = 31
_ULAT = G.geo_lat("event_id")
_ULON = G.geo_lon("event_id")
_UE, _UN = G.utm_xy_mm("lat", "lon", _UTM_ZONE, DK)

_UTM_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT event_id, {_ULAT} AS lat, {_ULON} AS lon FROM events
    )
    SELECT event_id, {_UE} AS easting_mm, {_UN} AS northing_mm
    FROM pts
    WHERE lon >= {G.fnum(0.0)} AND lon < {G.fnum(6.0)}
      AND lat >= {G.fnum(0.5)} AND lat <= {G.fnum(83.0)}
"""


@gate("reproject_utm", _UTM_SQL)
def q_reproject_utm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id").where(
        (F.col("lon") >= 0.0) & (F.col("lon") < 6.0)
        & (F.col("lat") >= 0.5) & (F.col("lat") <= 83.0)
    )
    out = ops_transform.reproject_utm(pts, zone=_UTM_ZONE)
    q = G.fnum(1000.0)
    h = G.fnum(0.5)
    return out.select(
        "event_id",
        F.expr(f"cast(floor(easting * {q} + {h}) as bigint)")
        .alias("easting_mm"),
        F.expr(f"cast(floor(northing * {q} + {h}) as bigint)")
        .alias("northing_mm"),
    )


# ---------------------------------------------------------------------------
# hag_nn — HAG from k=3 nearest ground points, fixed-point IDW
# (HagNnFilter.cpp:49-71,127-205). Oracle = pairwise exact kNN with
# the same capped integer weights.
# ---------------------------------------------------------------------------

_HG_K = 3
_HG_Z = "(CAST(c_custkey % 1000 AS DOUBLE) / 10.0e0)"
_HG_ZQ = (
    f"CAST(floor({_HG_Z} * {G.fnum(1000.0)} + {G.fnum(0.5)}) AS BIGINT)"
)
_HG_DIST = (
    "sqrt((a.lon - b.lon) * (a.lon - b.lon)"
    " + (a.lat - b.lat) * (a.lat - b.lat))"
)
_HG_WQ = (
    f"CASE WHEN dist = 0.0e0 THEN CAST({ops_raster.IDW_W_CAP} AS BIGINT)"
    f" ELSE least(CAST({ops_raster.IDW_W_CAP} AS BIGINT),"
    f" CAST(floor({G.fnum(float(ops_raster.IDW_W_Q))} / (dist * dist))"
    " AS BIGINT)) END"
)

_HG_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT c_custkey, {G.geo_lat('c_custkey')} AS lat,
             {G.geo_lon('c_custkey')} AS lon,
             c_nationkey % 5 AS cls, {_HG_ZQ} AS zq
      FROM customer
    ),
    ranked AS (
      SELECT a.c_custkey AS pid, a.zq AS z0q, b.zq AS nzq,
             {_HG_DIST} AS dist,
             row_number() OVER (
               PARTITION BY a.c_custkey
               ORDER BY {_HG_DIST} ASC, b.c_custkey ASC
             ) AS rn
      FROM (SELECT * FROM pts WHERE cls <> 0) a,
           (SELECT * FROM pts WHERE cls = 0) b
    ),
    agg AS (
      SELECT pid, min(z0q) AS z0q,
             min(CASE WHEN rn = 1 THEN dist END) AS d1,
             min(CASE WHEN rn = 1 THEN nzq END) AS z1q,
             sum(({_HG_WQ}) * nzq) AS num,
             sum({_HG_WQ}) AS den
      FROM ranked WHERE rn <= {_HG_K}
      GROUP BY pid
    )
    SELECT pid AS c_custkey,
           CAST(z0q - (CASE WHEN d1 = 0.0e0 THEN z1q
                            WHEN den > 0 THEN num // den
                            ELSE z0q END) AS BIGINT) AS hag_mm
    FROM agg
    UNION ALL
    SELECT c_custkey, CAST(0 AS BIGINT) AS hag_mm
    FROM pts WHERE cls = 0
"""


@gate("hag_nn", _HG_SQL)
def q_hag_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    pts = ops_h3.geocode(cust, "c_custkey").select(
        "c_custkey", "lat", "lon",
        (F.col("c_nationkey") % 5).alias("cls"),
        F.expr(_HG_Z).alias("z"),
    )
    out = ops_raster.hag_nn(
        pts, count=_HG_K, cell=8.0, ground_class=0,
        x="lon", y="lat", z="z", cls="cls", id_col="c_custkey",
    )
    return out.select("c_custkey", "hag_mm")


# ---------------------------------------------------------------------------
# fps_approx — distributed approximate farthest-point sampling
# (FarthestPointSamplingFilter.cpp semantics at scale; the exact fps
# gate stays driver-sequential). Deterministic but applyInPandas-
# greedy — not SQL-expressible: rows-only gate; pytest pins the
# spread bound vs exact fps (tests/test_batch29_ops.py).
# ---------------------------------------------------------------------------


@gate("fps_approx", None)
def q_fps_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import sampling as ops_sampling

    ev = _t(spark, sf_dir, "events").limit(20000)
    pts = ops_h3.geocode(ev, "event_id").select(
        F.col("event_id").alias("pid"), "lon", "lat"
    )
    return ops_sampling.fps_approx(pts, count=64).orderBy("pid")
