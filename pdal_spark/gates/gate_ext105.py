"""Gate registry extension 105 — directional/projection batch:
circular statistics, directional semivariogram, Albers equal-area
reprojection, spherical polygon perimeter."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.operators import features as ops_features
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import pointpattern as ops_pp
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import transform as ops_transform

_LAT = G.geo_lat("event_id")
_LON = G.geo_lon("event_id")


# ---------------------------------------------------------------------------
# circular_stats — mean heading per user cohort over synthetic
# bearings (event_id * 37 mod 360)
# ---------------------------------------------------------------------------
_CS_RAD = G.fnum(3.141592653589793 / 180.0)
_CS_DEG = G.fnum(180.0 / 3.141592653589793)
_CS_QF = G.fnum(float(ops_pp.CIRC_Q))
_CS_B = "(cast(event_id * 37 % 360 as double))"
_CS_CQ = (
    f"cast(floor(round(cos({_CS_B} * {_CS_RAD}), 9) * {_CS_QF}"
    f" + {G.fnum(0.5)}) as bigint)"
)
_CS_SQ = (
    f"cast(floor(round(sin({_CS_B} * {_CS_RAD}), 9) * {_CS_QF}"
    f" + {G.fnum(0.5)}) as bigint)"
)
_CS_R = (
    "sqrt(cast(sc as double) * cast(sc as double)"
    " + cast(ss as double) * cast(ss as double))"
    f" / (cast(n as double) * {_CS_QF})"
)
_CS_MEAN = (
    f"(atan2(cast(ss as double), cast(sc as double)) * {_CS_DEG})"
)
_CS_WRAP = (
    f"({_CS_MEAN} - {G.fnum(360.0)}"
    f" * floor({_CS_MEAN} / {G.fnum(360.0)}))"
)
_CIRC_SQL = f"""
    WITH agg AS MATERIALIZED (
      SELECT user_id % 31 AS k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_CS_CQ}) AS BIGINT) AS sc,
             CAST(sum({_CS_SQ}) AS BIGINT) AS ss
      FROM events GROUP BY 1
    )
    SELECT k, n, sc, ss,
           round({_CS_WRAP}, 6) AS mean_dir,
           {_CS_R} AS r_len,
           1.0e0 - {_CS_R} AS circ_var
    FROM agg
"""


@gate("circular_stats", _CIRC_SQL)
def q_circular_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        (F.col("user_id") % 31).alias("k"),
        F.expr(_CS_B).alias("bearing"),
    )
    return ops_pp.circular_stats(b, key="k", bearing="bearing")


# ---------------------------------------------------------------------------
# semivariogram_directional — the ripleys_k fixture with axial
# sectors; brute-force oracle proves the bucketed pair join +
# rational-slope sector rule lossless
# ---------------------------------------------------------------------------
_SD_MOD = 7
_SD_Q = 1 << 10
_SD_BINS = 8
_SD_BIN_Q = 1 << 10

_SD_SECTOR = (
    "CASE"
    " WHEN abs(cya - cyb) * 99 <= abs(cxa - cxb) * 41 THEN 0"
    " WHEN abs(cxa - cxb) * 99 <= abs(cya - cyb) * 41 THEN 2"
    " WHEN (cxa - cxb) * (cya - cyb) > 0 THEN 1"
    " ELSE 3 END"
)
_SD_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT event_id AS pid,
             CAST(floor(({G.geo_lon('event_id')}) * {_SD_Q})
                  AS BIGINT) AS xq,
             CAST(floor(({G.geo_lat('event_id')}) * {_SD_Q})
                  AS BIGINT) AS yq,
             CAST(floor(value * {_SD_Q}) AS BIGINT) AS zq
      FROM events WHERE event_id % {_SD_MOD} = 0
    ),
    pr AS MATERIALIZED (
      SELECT a.xq AS cxa, b.xq AS cxb, a.yq AS cya, b.yq AS cyb,
             (a.xq - b.xq) * (a.xq - b.xq)
             + (a.yq - b.yq) * (a.yq - b.yq) AS d2,
             (a.zq - b.zq) * (a.zq - b.zq) AS dz2
      FROM pts a JOIN pts b ON a.pid < b.pid
    )
    SELECT {_SD_SECTOR} AS sector, CAST(b.b AS BIGINT) AS bin,
           count(*) AS n_pairs, CAST(sum(dz2) AS BIGINT) AS sum_sq_dz
    FROM pr, (SELECT unnest(range({_SD_BINS})) AS b) b
    WHERE pr.d2 > 0
      AND pr.d2 >= b.b * b.b * {_SD_BIN_Q * _SD_BIN_Q}
      AND pr.d2 < (b.b + 1) * (b.b + 1) * {_SD_BIN_Q * _SD_BIN_Q}
    GROUP BY 1, 2
"""


@gate("semivariogram_directional", _SD_SQL)
def q_semivariogram_directional(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _SD_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id")
    out = ops_stats.semivariogram_directional(
        pts, value="value", id_col="event_id",
        bin_q=_SD_BIN_Q, n_bins=_SD_BINS, coord_q=_SD_Q,
        value_q=_SD_Q,
    )
    return out.select(
        F.col("sector").cast("long").alias("sector"),
        F.col("bin").cast("long").alias("bin"),
        "n_pairs", "sum_sq_dz",
    )


# ---------------------------------------------------------------------------
# reproject_albers — CONUS-style parallels over the global point set
# ---------------------------------------------------------------------------
_AL_X, _AL_Y = ops_transform.albers_sql(
    "lat", "lon", 29.5, 45.5, 23.0, -96.0
)
_ALBERS_SQL = f"""
    SELECT event_id, {_AL_X} AS x_aea, {_AL_Y} AS y_aea
    FROM (SELECT event_id, {_LAT} AS lat, {_LON} AS lon
          FROM events) p
"""


@gate("reproject_albers", _ALBERS_SQL)
def q_reproject_albers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_transform.reproject_albers(pts).select(
        "event_id", "x_aea", "y_aea"
    )


# ---------------------------------------------------------------------------
# spherical_perimeter — the spherical_area polygon fixture
# ---------------------------------------------------------------------------
_SP_MOD = 23
_SP_RAD = G.fnum(3.141592653589793 / 180.0)
_SP_HAV = (
    f"(sin((y1 - y0) * {_SP_RAD} / 2) * sin((y1 - y0) * {_SP_RAD} / 2)"
    f" + cos(y0 * {_SP_RAD}) * cos(y1 * {_SP_RAD})"
    f" * sin((x1 - x0) * {_SP_RAD} / 2)"
    f" * sin((x1 - x0) * {_SP_RAD} / 2))"
)
_SP_DKM = (
    f"({G.fnum(2.0 * 6371.0088)}"
    f" * asin(sqrt(greatest(least({_SP_HAV}, {G.fnum(1.0)}),"
    f" {G.fnum(0.0)}))))"
)
_SPER_SQL = f"""
    WITH verts AS MATERIALIZED (
      SELECT user_id % 5 AS p, event_id AS s,
             {_LON} AS x0, {_LAT} AS y0
      FROM events WHERE event_id % {_SP_MOD} = 0
    ),
    e AS (
      SELECT p, x0, y0,
             coalesce(lead(x0) OVER w, first_value(x0) OVER w) AS x1,
             coalesce(lead(y0) OVER w, first_value(y0) OVER w) AS y1
      FROM verts
      WINDOW w AS (PARTITION BY p ORDER BY s)
    )
    SELECT p AS poly_id, CAST(count(*) AS BIGINT) AS n_verts,
           CAST(sum(CAST(floor(round({_SP_DKM}, 9) * {G.fnum(1.0e9)}
                + {G.fnum(0.5)}) AS BIGINT)) AS BIGINT) AS perim_q,
           round(CAST(sum(CAST(floor(round({_SP_DKM}, 9)
                * {G.fnum(1.0e9)} + {G.fnum(0.5)}) AS BIGINT))
                AS DOUBLE) / {G.fnum(1.0e9)}, 6) AS perim_km
    FROM e GROUP BY p
"""


@gate("spherical_perimeter", _SPER_SQL)
def q_spherical_perimeter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _SP_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id")
    verts = pts.select(
        (F.col("user_id") % 5).alias("poly_id"),
        F.col("event_id").alias("seq"), "lon", "lat",
    )
    return ops_features.spherical_perimeter(verts)
