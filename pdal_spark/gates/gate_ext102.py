"""Gate registry extension 102 — regional-analysis batch: location
quotient, relative-risk surface, Huff spatial-interaction model,
two-step floating catchment area accessibility, spherical
cross-track / along-track distance."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import pointpattern as ops_pp
from pdal_spark.operators import transform as ops_transform

_LAT = G.geo_lat("event_id")
_LON = G.geo_lon("event_id")
_MX = f"CAST(floor(({_LON}) * 1000.0 + 0.5) AS BIGINT)"
_MY = f"CAST(floor(({_LAT}) * 1000.0 + 0.5) AS BIGINT)"
# coarse analysis zones off the exact millidegree grid (20-degree
# cells; div/`//` BOTH truncate toward zero — verify SKILL notes)
_CELL_SQL = f"(({_MX}) // 20000) * 1000 + (({_MY}) // 20000)"
_CELL_SPARK = (
    "(mx div 20000) * 1000 + (my div 20000)"
)


def _pts_mdeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3

    pts = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    return pts.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr(
            "cast(floor(lon * 1000.0e0 + 0.5e0) as bigint)"
        ).alias("mx"),
        F.expr(
            "cast(floor(lat * 1000.0e0 + 0.5e0) as bigint)"
        ).alias("my"),
    )


# ---------------------------------------------------------------------------
# location_quotient — which zones over-index on which event types
# ---------------------------------------------------------------------------
_LQ_SQL = f"""
    WITH c AS MATERIALIZED (
      SELECT {_CELL_SQL} AS cell, event_type AS cat,
             CAST(count(*) AS BIGINT) AS n_cc
      FROM events GROUP BY 1, 2
    )
    SELECT cell, cat, n_cc,
           (CAST(n_cc AS DOUBLE)
            / CAST(sum(n_cc) OVER (PARTITION BY cell) AS DOUBLE))
           / (CAST(sum(n_cc) OVER (PARTITION BY cat) AS DOUBLE)
              / CAST(sum(n_cc) OVER () AS DOUBLE)) AS lq
    FROM c
"""


@gate("location_quotient", _LQ_SQL)
def q_location_quotient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = _pts_mdeg(spark, sf_dir).select(
        F.expr(_CELL_SPARK).alias("cell"),
        F.col("event_type").alias("cat"),
    )
    return ops_pp.location_quotient(pts, cell="cell", cat="cat")


# ---------------------------------------------------------------------------
# relative_risk — error-event concentration beyond overall density
# ---------------------------------------------------------------------------
_RR_K = G.fnum(1.0)
_RR_SQL = f"""
    WITH per AS MATERIALIZED (
      SELECT {_CELL_SQL} AS cell,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1
                      ELSE 0 END) AS BIGINT) AS cases,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(cases) AS BIGINT) AS ct,
             CAST(sum(n) AS BIGINT) AS nt
      FROM per
    )
    SELECT cell, cases, n,
           cast(cases as double)
             / (cast(ct as double) * cast(n as double)
                / cast(nt as double)) AS rr,
           (cast(cases as double) + {_RR_K})
             / ((cast(ct as double) * cast(n as double)
                 / cast(nt as double)) + {_RR_K}) AS rr_eb
    FROM per, tot
    WHERE ct > 0
"""


@gate("relative_risk", _RR_SQL)
def q_relative_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts_mdeg(spark, sf_dir).select(
        F.expr(_CELL_SPARK).alias("cell"),
        (F.col("event_type") == "error").cast("int").alias("is_case"),
    )
    return ops_pp.relative_risk(pts, cell="cell", case="is_case")


# ---------------------------------------------------------------------------
# huff_model — distance-discounted facility choice probabilities
# (facilities = the small broadcast dimension: user_id % 23 sites)
# ---------------------------------------------------------------------------
_HF_LON = G.geo_lon("fid * 31 + 5")
_HF_LAT = G.geo_lat("fid * 31 + 5")
_HUFF_SQL = f"""
    WITH o AS MATERIALIZED (
      SELECT event_id AS oid, {_MX} AS mx, {_MY} AS my
      FROM events WHERE event_id % 7 = 0
    ),
    f AS MATERIALIZED (
      SELECT fid,
             CAST(floor(({_HF_LON}) * 1000.0 + 0.5) AS BIGINT)
               AS fmx,
             CAST(floor(({_HF_LAT}) * 1000.0 + 0.5) AS BIGINT)
               AS fmy,
             fid % 9 + 1 AS w
      FROM (SELECT DISTINCT user_id % 23 AS fid FROM events) t
    ),
    s AS (
      SELECT oid, fid,
             (w * CAST({ops_pp.HUFF_Q} AS BIGINT))
               // ((mx - fmx) * (mx - fmx)
                   + (my - fmy) * (my - fmy) + 1) AS score_q
      FROM o, f
    )
    SELECT oid, fid, score_q,
           CAST(score_q AS DOUBLE)
             / CAST(sum(score_q) OVER (PARTITION BY oid) AS DOUBLE)
             AS p
    FROM s
"""


@gate("huff_model", _HUFF_SQL)
def q_huff_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts_mdeg(spark, sf_dir)
    origins = pts.where("event_id % 7 = 0").select(
        F.col("event_id").alias("oid"), "mx", "my"
    )
    fac = (
        pts.select((F.col("user_id") % 23).alias("fid"))
        .distinct()
        .select(
            "fid",
            F.expr(
                f"cast(floor(({_HF_LON}) * 1000.0e0 + 0.5e0)"
                " as bigint)"
            ).alias("mx"),
            F.expr(
                f"cast(floor(({_HF_LAT}) * 1000.0e0 + 0.5e0)"
                " as bigint)"
            ).alias("my"),
            (F.col("fid") % 9 + 1).alias("w"),
        )
    )
    return ops_pp.huff_model(origins, fac, oid="oid", fid="fid")


# ---------------------------------------------------------------------------
# two_sfca — catchment-area accessibility (supply = user_id % 31
# sites with small capacities; 30-degree catchment radius)
# ---------------------------------------------------------------------------
_SF_LON = G.geo_lon("sid * 37 + 3")
_SF_LAT = G.geo_lat("sid * 37 + 3")
_SFCA_R2 = 30000 * 30000
_SFCA_SQL = f"""
    WITH d AS MATERIALIZED (
      SELECT event_id AS did, {_MX} AS mx, {_MY} AS my,
             event_id % 50 + 1 AS pop
      FROM events
    ),
    s AS MATERIALIZED (
      SELECT sid,
             CAST(floor(({_SF_LON}) * 1000.0 + 0.5) AS BIGINT)
               AS smx,
             CAST(floor(({_SF_LAT}) * 1000.0 + 0.5) AS BIGINT)
               AS smy,
             sid % 11 + 1 AS cap
      FROM (SELECT DISTINCT user_id % 31 AS sid FROM events) t
    ),
    pairs AS MATERIALIZED (
      SELECT did, pop, sid, cap
      FROM d, s
      WHERE (mx - smx) * (mx - smx) + (my - smy) * (my - smy)
            <= {_SFCA_R2}
    ),
    ratios AS (
      SELECT sid,
             (cap * CAST({ops_pp.TWOSFCA_Q} AS BIGINT))
               // CAST(sum(pop) AS BIGINT) AS r_q
      FROM pairs GROUP BY sid, cap
    ),
    acc AS (
      SELECT p.did, CAST(count(*) AS BIGINT) AS n_fac,
             CAST(sum(r.r_q) AS BIGINT) AS a_q
      FROM pairs p JOIN ratios r USING (sid)
      GROUP BY p.did
    )
    SELECT d.did,
           coalesce(acc.n_fac, 0) AS n_fac,
           coalesce(acc.a_q, 0) AS a_q
    FROM (SELECT DISTINCT did FROM d) d LEFT JOIN acc USING (did)
"""


@gate("two_sfca", _SFCA_SQL)
def q_two_sfca(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts_mdeg(spark, sf_dir)
    demand = pts.select(
        F.col("event_id").alias("did"),
        "mx",
        "my",
        (F.col("event_id") % 50 + 1).alias("pop"),
    )
    supply = (
        pts.select((F.col("user_id") % 31).alias("sid"))
        .distinct()
        .select(
            "sid",
            F.expr(
                f"cast(floor(({_SF_LON}) * 1000.0e0 + 0.5e0)"
                " as bigint)"
            ).alias("mx"),
            F.expr(
                f"cast(floor(({_SF_LAT}) * 1000.0e0 + 0.5e0)"
                " as bigint)"
            ).alias("my"),
            (F.col("sid") % 11 + 1).alias("cap"),
        )
    )
    return ops_pp.two_sfca(
        demand, supply, radius=30000, did="did", sid="sid"
    )


# ---------------------------------------------------------------------------
# cross_track — distance off a fixed great-circle route
# ---------------------------------------------------------------------------
_XT_ROUTE = (10.0, -20.0, 45.0, 60.0)
_XT_DXT, _XT_DAT = ops_transform.cross_track_sql(
    "lat", "lon", *_XT_ROUTE
)
_XT_SQL = f"""
    SELECT event_id, {_XT_DXT} AS dxt_km, {_XT_DAT} AS dat_km
    FROM (SELECT event_id, {_LAT} AS lat, {_LON} AS lon
          FROM events) p
"""


@gate("cross_track", _XT_SQL)
def q_cross_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3

    pts = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    return ops_transform.cross_track_distance(
        pts, "lat", "lon", *_XT_ROUTE
    ).select("event_id", "dxt_km", "dat_km")
