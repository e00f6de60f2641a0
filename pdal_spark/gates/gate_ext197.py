"""Gate registry extension 197 — growth batch: growth accounting
and engagement histogram."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_GA_SQL = """
    WITH s AS MATERIALIZED (
      SELECT DISTINCT user_id AS u,
             CAST(event_id % 12 AS BIGINT) AS p
      FROM events
    ),
    first AS (
      SELECT u, CAST(min(p) AS BIGINT) AS p0 FROM s GROUP BY u
    ),
    prev AS (
      SELECT u, p + 1 AS p, 1 AS was_prev FROM s
    ),
    cur AS (
      SELECT s.u, s.p, first.p0, prev.was_prev
      FROM s JOIN first ON s.u = first.u
      LEFT JOIN prev ON s.u = prev.u AND s.p = prev.p
    ),
    act AS (
      SELECT p,
             CAST(sum(CASE WHEN p = p0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN p <> p0 AND was_prev = 1 THEN 1
               ELSE 0 END) AS BIGINT) AS n_retained,
             CAST(sum(CASE WHEN p <> p0 AND was_prev IS NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM cur GROUP BY p
    ),
    nxt AS (SELECT u, p, 1 AS now FROM s),
    churn AS (
      SELECT sp.p, CAST(count(*) AS BIGINT) AS n_churned
      FROM (SELECT u, p + 1 AS p FROM s) sp
      LEFT JOIN nxt ON sp.u = nxt.u AND sp.p = nxt.p
      WHERE nxt.now IS NULL GROUP BY sp.p
    )
    SELECT coalesce(act.p, churn.p) AS p,
           coalesce(n_new, 0) AS n_new,
           coalesce(n_retained, 0) AS n_retained,
           coalesce(n_resurrected, 0) AS n_resurrected,
           coalesce(n_churned, 0) AS n_churned,
           CASE WHEN coalesce(n_churned, 0) > 0 THEN
             cast(coalesce(n_new, 0) + coalesce(n_resurrected, 0)
               as double) / cast(n_churned as double) END
             AS quick_ratio
    FROM act FULL OUTER JOIN churn ON act.p = churn.p
"""


@gate("growth_accounting", _GA_SQL)
def q_growth_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        F.expr("cast(event_id % 12 as bigint)").alias("p"),
    )
    return ops_temporal.growth_accounting(ev, user="u",
                                          period="p")


_EH_SQL = """
    WITH s AS MATERIALIZED (
      SELECT DISTINCT user_id AS u, event_id % 12 AS p
      FROM events
    ),
    per_u AS (
      SELECT u, CAST(count(*) AS BIGINT) AS k_active
      FROM s GROUP BY u
    ),
    hist AS (
      SELECT k_active, CAST(count(*) AS BIGINT) AS n_users
      FROM per_u GROUP BY k_active
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per_u)
    SELECT k_active, n_users,
           cast(n_users as double) / cast(n as double) AS share
    FROM hist, tot
"""


@gate("engagement_histogram", _EH_SQL)
def q_engagement_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        (F.col("event_id") % 12).alias("p"),
    )
    return ops_temporal.engagement_histogram(
        ev, user="u", period="p"
    )
