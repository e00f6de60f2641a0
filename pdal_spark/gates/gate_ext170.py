"""Gate registry extension 170 — drift/risk batch: Page-Hinkley
detector and maximum drawdown."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_PH_Q = ops_temporal.PH_Q
_PH_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT o, v,
             CAST(row_number() OVER (ORDER BY o ASC) AS BIGINT)
               AS t,
             CAST(sum(v) OVER (ORDER BY o ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sm
      FROM s
    ),
    inc AS (
      SELECT o,
             ((t * v - sm) * CAST({_PH_Q} AS BIGINT)) // t AS inc_q
      FROM base
    ),
    m AS (
      SELECT o,
             CAST(sum(inc_q) OVER (ORDER BY o ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS m_q
      FROM inc
    )
    SELECT o, m_q,
           CAST(m_q - min(m_q) OVER (ORDER BY o ASC
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ph_q
    FROM m
"""


@gate("page_hinkley", _PH_SQL)
def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.page_hinkley(ev, order="o", value="v")


_MD_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 8 AS k, event_id AS o,
             CAST(floor(value) AS BIGINT) - 245 AS v
      FROM events
    ),
    base AS (
      SELECT k, o,
             CAST(sum(v) OVER (PARTITION BY k ORDER BY o ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS eq
      FROM s
    ),
    dd AS (
      SELECT k, o, eq,
             CAST(max(eq) OVER (PARTITION BY k ORDER BY o ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pk
      FROM base
    )
    SELECT k, CAST(count(*) AS BIGINT) AS n,
           CAST(arg_max(eq, o) AS BIGINT) AS final,
           CAST(max(pk) AS BIGINT) AS peak,
           CAST(max(pk - eq) AS BIGINT) AS mdd
    FROM dd GROUP BY k
"""


@gate("max_drawdown", _MD_SQL)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 8).alias("k"),
        F.col("event_id").alias("o"),
        (F.expr("cast(floor(value) as bigint)") - 245).alias("v"),
    )
    return ops_temporal.max_drawdown(
        ev, key="k", order="o", value="v"
    )
