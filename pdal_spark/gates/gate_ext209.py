"""Gate registry extension 209 — distance correlation (exact
double-centered small-n path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_DC_PRED = "event_id % 83 = 0"
_DC_X = "(CAST(floor(value) AS BIGINT))"
_DC_Y = (
    f"((CAST(floor(value) AS BIGINT) - 245)"
    f" * (CAST(floor(value) AS BIGINT) - 245) // 100"
    f" + CAST({G.lehmer2('event_id')} % 5 AS BIGINT))"
)
_DC_Y_SP = (
    f"((cast(floor(value) as bigint) - 245)"
    f" * (cast(floor(value) as bigint) - 245) div 100"
    f" + cast({G.lehmer2('event_id')} % 5 as bigint))"
)
_DC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS i, {_DC_X} AS xv, {_DC_Y} AS yv
      FROM events WHERE {_DC_PRED}
    ),
    pairs AS MATERIALIZED (
      SELECT a.i AS ia, b.i AS ib,
             abs(a.xv - b.xv) AS da, abs(a.yv - b.yv) AS db
      FROM s a CROSS JOIN s b
    ),
    rows_m AS (
      SELECT ia, CAST(sum(da) AS BIGINT) AS ra,
             CAST(sum(db) AS BIGINT) AS rb
      FROM pairs GROUP BY ia
    ),
    cols_m AS (
      SELECT ib, CAST(sum(da) AS BIGINT) AS ca,
             CAST(sum(db) AS BIGINT) AS cb
      FROM pairs GROUP BY ib
    ),
    tot AS (
      SELECT CAST(sum(da) AS BIGINT) AS sa,
             CAST(sum(db) AS BIGINT) AS sb,
             CAST(count(DISTINCT ia) AS BIGINT) AS n
      FROM pairs
    ),
    cent AS (
      SELECT n,
             CAST(n * n * da - n * ra - n * ca + sa AS BIGINT)
               AS aa,
             CAST(n * n * db - n * rb - n * cb + sb AS BIGINT)
               AS bb
      FROM pairs
      JOIN rows_m USING (ia) JOIN cols_m USING (ib), tot
    ),
    agg AS (
      SELECT n, CAST(sum(aa * bb) AS BIGINT) AS sab,
             CAST(sum(aa * aa) AS BIGINT) AS saa,
             CAST(sum(bb * bb) AS BIGINT) AS sbb
      FROM cent GROUP BY n
    )
    SELECT n, sab, saa, sbb,
           CASE WHEN saa > 0 AND sbb > 0 AND sab > 0 THEN
             sqrt(cast(sab as double)
             / sqrt(cast(saa as double) * cast(sbb as double)))
             WHEN saa > 0 AND sbb > 0 THEN 0.0e0 END AS dcor
    FROM agg
"""


@gate("distance_correlation", _DC_SQL)
def q_distance_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_DC_PRED).select(
        F.col("event_id").alias("i"),
        F.expr("cast(floor(value) as bigint)").alias("xv"),
        F.expr(_DC_Y_SP).alias("yv"),
    )
    return ops_stats.distance_correlation(
        ev, x="xv", y="yv", id_col="i"
    )
