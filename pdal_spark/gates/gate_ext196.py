"""Gate registry extension 196 — engagement batch: stickiness and
new-vs-returning splits."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_SK_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id AS u, event_id % 30 AS ps,
             event_id % 30 // 10 AS pb
      FROM events
    ),
    small AS (
      SELECT pb, ps, CAST(count(DISTINCT u) AS BIGINT) AS d
      FROM s GROUP BY pb, ps
    ),
    pbs AS (
      SELECT pb, CAST(count(*) AS BIGINT) AS n_small,
             CAST(sum(d) AS BIGINT) AS sum_small_distinct
      FROM small GROUP BY pb
    ),
    big AS (
      SELECT pb, CAST(count(DISTINCT u) AS BIGINT)
               AS big_distinct
      FROM s GROUP BY pb
    )
    SELECT pbs.pb, n_small, sum_small_distinct, big_distinct,
           CASE WHEN n_small > 0 AND big_distinct > 0 THEN
             cast(sum_small_distinct as double)
             / (cast(n_small as double)
             * cast(big_distinct as double)) END AS stickiness
    FROM pbs JOIN big ON pbs.pb = big.pb
"""


@gate("stickiness", _SK_SQL)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        (F.col("event_id") % 30).alias("ps"),
        F.expr("event_id % 30 div 10").alias("pb"),
    )
    return ops_temporal.stickiness(
        ev, user="u", period_small="ps", period_big="pb"
    )


_NR_SQL = """
    WITH s AS MATERIALIZED (
      SELECT DISTINCT user_id AS u, event_id % 12 AS p
      FROM events
    ),
    first AS (
      SELECT u, CAST(min(p) AS BIGINT) AS p0 FROM s GROUP BY u
    ),
    agg AS (
      SELECT p, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN p = p0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new
      FROM s JOIN first USING (u) GROUP BY p
    )
    SELECT p, n_users, n_new,
           CAST(n_users - n_new AS BIGINT) AS n_returning,
           CASE WHEN n_users > 0 THEN cast(n_new as double)
             / cast(n_users as double) END AS new_share
    FROM agg
"""


@gate("new_returning", _NR_SQL)
def q_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        (F.col("event_id") % 12).alias("p"),
    )
    return ops_temporal.new_returning(ev, user="u", period="p")
