"""Gate registry extension 109 — navigation/randomness/segregation
batch: great-circle route waypoints, Wald-Wolfowitz runs test,
Duncan dissimilarity + isolation, zlib compression ratio
(rows-only — not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import textops as ops_text
from pdal_spark.operators import transform as ops_transform

# ---------------------------------------------------------------------------
# route_waypoints — 7 slerp points along event-derived routes
# ---------------------------------------------------------------------------
_RW_MOD = 41
_RW_N = 6
_RW_F = f"(cast(i as double) / cast({_RW_N} as double))"
_RW_LAT, _RW_LON = ops_transform.slerp_sql(
    "lat1", "lon1", "lat2", "lon2", _RW_F
)
_RW_SQL = f"""
    WITH routes AS MATERIALIZED (
      SELECT event_id,
             {G.geo_lat('event_id')} AS lat1,
             {G.geo_lon('event_id')} AS lon1,
             {G.geo_lat('event_id * 7 + 1')} AS lat2,
             {G.geo_lon('event_id * 7 + 1')} AS lon2
      FROM events WHERE event_id % {_RW_MOD} = 0
    ),
    stepped AS (
      SELECT event_id, lat1, lon1, lat2, lon2,
             unnest(range(0, {_RW_N + 1})) AS i
      FROM routes
    )
    SELECT event_id, CAST(i AS BIGINT) AS i,
           {_RW_LAT} AS wlat, {_RW_LON} AS wlon
    FROM stepped
"""


@gate("route_waypoints", _RW_SQL)
def q_route_waypoints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _RW_MOD == 0
    )
    routes = ev.select(
        "event_id",
        F.expr(G.geo_lat("event_id")).alias("lat1"),
        F.expr(G.geo_lon("event_id")).alias("lon1"),
        F.expr(G.geo_lat("event_id * 7 + 1")).alias("lat2"),
        F.expr(G.geo_lon("event_id * 7 + 1")).alias("lon2"),
    )
    out = ops_transform.route_waypoints(routes, n=_RW_N)
    return out.select(
        "event_id", F.col("i").cast("long").alias("i"),
        "wlat", "wlon",
    )


# ---------------------------------------------------------------------------
# runs_test — per-cohort randomness of a residue sequence
# ---------------------------------------------------------------------------
_RT_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 31 AS k, event_id AS o,
             CASE WHEN event_id % 7 - 3 > 0 THEN 1 ELSE 0 END AS up
      FROM events
    ),
    lagged AS (
      SELECT k, up, lag(up) OVER (PARTITION BY k ORDER BY o) AS pup
      FROM s
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(up) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN pup IS NULL OR up <> pup
                      THEN 1 ELSE 0 END) AS BIGINT) AS runs
      FROM lagged GROUP BY k
    )
    SELECT k AS user_id, n, n1, n - n1 AS n2, runs,
           case when n1 > 0 and n - n1 > 0 and n > 1 then
             (cast(runs as double)
              - (2.0e0 * cast(n1 as double)
                 * cast(n - n1 as double)
                 / cast(n as double) + 1.0e0))
             / sqrt((2.0e0 * cast(n1 as double)
                     * cast(n - n1 as double)
                     * (2.0e0 * cast(n1 as double)
                        * cast(n - n1 as double)
                        - cast(n as double))
                     / (cast(n as double) * cast(n as double)
                        * (cast(n as double) - 1.0e0)))) end AS z
    FROM agg
"""


@gate("runs_test", _RT_SQL)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 31).alias("k"),
        F.col("event_id").alias("o"),
        (F.col("event_id") % 7 - 3).alias("v"),
    )
    return ops_stats.runs_test(
        ev, key="k", order="o", value="v", threshold=0
    ).select(
        F.col("k").alias("user_id"), "n", "n1", "n2", "runs", "z"
    )


# ---------------------------------------------------------------------------
# segregation_indices — even/odd user cohorts over the res-4 lattice
# ---------------------------------------------------------------------------
_SG_RES = 4
_SG_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _SG_RES)} AS c,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS a,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS b
      FROM (SELECT event_id, user_id, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) p
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(a) AS BIGINT) AS ga,
                   CAST(sum(b) AS BIGINT) AS gb FROM cellv)
    SELECT ga, gb,
           CAST(sum(abs(a * gb - b * ga)) AS BIGINT) AS sum_abs,
           CAST(sum(CASE WHEN a + b > 0 THEN
             (a * a * CAST({ops_stats.SEG_Q} AS BIGINT)) // (a + b)
             ELSE 0 END) AS BIGINT) AS iso_q,
           cast(sum(abs(a * gb - b * ga)) as double)
             / (2.0e0 * cast(ga as double) * cast(gb as double))
             AS d_index,
           cast(sum(CASE WHEN a + b > 0 THEN
             (a * a * CAST({ops_stats.SEG_Q} AS BIGINT)) // (a + b)
             ELSE 0 END) as double)
             / (cast({ops_stats.SEG_Q} as double)
                * cast(ga as double)) AS isolation
    FROM cellv, tot GROUP BY ga, gb
"""


@gate("segregation_indices", _SG_SQL)
def q_segregation_indices(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pdal_spark.gate import _points

    pts = _points(spark, sf_dir)
    cells = (
        ops_h3.h3_encode(pts, "lat", "lon", res=_SG_RES, out="cell")
        .groupBy("cell")
        .agg(
            F.sum(
                F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)
            ).alias("g1"),
            F.sum(
                F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)
            ).alias("g2"),
        )
    )
    return ops_stats.segregation_indices(cells, g1="g1", g2="g2")


# ---------------------------------------------------------------------------
# compression_ratio — zlib is not SQL-expressible: rows-only gate
# (deterministic within an environment; pytest pins the semantics)
# ---------------------------------------------------------------------------
@gate("compression_ratio", None)
def q_compression_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.compression_ratio(docs).select(
        "doc_id", "ratio_q"
    )
