"""Gate registry extension 167 — randomness batch: Cox-Stuart sign
trend and turning-point test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_CS_SQL = """
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT v,
             CAST(row_number() OVER (ORDER BY o ASC) AS BIGINT)
               AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM s
    ),
    h AS (SELECT rn, v, n, n - n // 2 AS h FROM base),
    first_half AS (
      SELECT rn AS i, v AS va, n FROM h WHERE rn <= n // 2
    ),
    second_half AS (
      SELECT rn - h AS i, v AS vb FROM h WHERE rn > h
    ),
    pairs AS (
      SELECT first_half.n, va, vb
      FROM first_half JOIN second_half USING (i)
    ),
    agg AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(CASE WHEN vb > va THEN 1 ELSE 0 END)
               AS BIGINT) AS s_plus,
             CAST(sum(CASE WHEN vb < va THEN 1 ELSE 0 END)
               AS BIGINT) AS s_minus
      FROM pairs
    )
    SELECT n, CAST(s_plus + s_minus AS BIGINT) AS m_pairs,
           s_plus, s_minus,
           CASE WHEN s_plus + s_minus > 0 THEN
             (2.0e0 * cast(s_plus as double)
             - cast(s_plus + s_minus as double))
             / sqrt(cast(s_plus + s_minus as double)) END AS z
    FROM agg
"""


@gate("cox_stuart", _CS_SQL)
def q_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.cox_stuart(ev, order="o", value="v")


_TP_SQL = """
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    lagged AS (
      SELECT v,
             lag(v, 1) OVER (ORDER BY o ASC) AS pv,
             lead(v, 1) OVER (ORDER BY o ASC) AS nv
      FROM s
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN pv IS NOT NULL
               AND nv IS NOT NULL AND
               ((v > pv AND v > nv) OR (v < pv AND v < nv))
               THEN 1 ELSE 0 END) AS BIGINT) AS n_turns
      FROM lagged
    )
    SELECT n, n_turns,
           CASE WHEN n > 3 THEN (cast(n_turns as double)
             - (2.0e0 * (cast(n as double) - 2.0e0) / 3.0e0))
             / sqrt((16.0e0 * cast(n as double) - 29.0e0)
             / 90.0e0) END AS z
    FROM agg
"""


@gate("turning_points", _TP_SQL)
def q_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.turning_points(ev, order="o", value="v")
