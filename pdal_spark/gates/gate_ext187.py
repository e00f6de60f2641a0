"""Gate registry extension 187 — robust-scale batch: Qn estimator
and shorth location."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_QN_PRED = "event_id % 37 = 0"
_QN_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS i, CAST(floor(value) AS BIGINT) AS v
      FROM events WHERE {_QN_PRED}
    ),
    pairs AS MATERIALIZED (
      SELECT abs(a.v - b.v) AS d
      FROM s a JOIN s b ON a.i < b.i
    ),
    ranked AS (
      SELECT d,
             CAST(row_number() OVER (ORDER BY d ASC) AS BIGINT)
               AS rn
      FROM pairs
    ),
    kd AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST((((count(*) // 2 + 1) * (count(*) // 2)) // 2)
               AS BIGINT) AS k_pick
      FROM s
    )
    SELECT n, k_pick, d AS qn_raw
    FROM ranked, kd WHERE rn = k_pick
"""


@gate("qn_scale", _QN_SQL)
def q_qn_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_QN_PRED).select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    return ops_stats.qn_scale(ev, value="v")


_SH_PRED = "event_id % 23 = 0"
_SH_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS v
      FROM events WHERE {_SH_PRED}
    ),
    base AS MATERIALIZED (
      SELECT v,
             CAST(row_number() OVER (ORDER BY v ASC) AS BIGINT)
               AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM s
    ),
    lead_j AS (
      SELECT a.rn, a.n, a.n // 2 + 1 AS h,
             CAST(b.v - a.v AS BIGINT) AS width,
             CAST(b.v + a.v AS BIGINT) AS mid2
      FROM base a JOIN base b
        ON b.rn = a.rn + (a.n // 2 + 1) - 1
    ),
    mn AS (SELECT CAST(min(width) AS BIGINT) AS w_min
           FROM lead_j),
    best AS (
      SELECT n, h, w_min, CAST(min(rn) AS BIGINT) AS i_star
      FROM lead_j, mn WHERE lead_j.width = mn.w_min
      GROUP BY n, h, w_min
    )
    SELECT best.n, CAST(best.h AS BIGINT) AS h, i_star,
           w_min AS width, lead_j.mid2 AS shorth2
    FROM best JOIN lead_j ON lead_j.rn = best.i_star
"""


@gate("shorth_location", _SH_SQL)
def q_shorth_location(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_SH_PRED).select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    return ops_stats.shorth_location(ev, value="v")
