"""Gate registry extension 199 — pricing/retention batch: arc
elasticity and retention half-life."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_AE_P = "(10 + event_id % 6)"
_AE_Q = f"(1 + CAST({G.lehmer2('event_id')} % 8 AS BIGINT))"
_AE_NUM = (
    "(cast(q - q_prev as double) * cast(pr + pr_prev as double))"
)
_AE_DEN = (
    "(cast(pr - pr_prev as double) * cast(q + q_prev as double))"
)
_AE_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(event_id % 8 AS BIGINT) AS p,
             CAST({_AE_P} AS BIGINT) AS pr0,
             {_AE_Q} AS q0
      FROM events
    ),
    per AS (
      SELECT p, CAST(sum(q0) AS BIGINT) AS q,
             CAST(sum(pr0) AS BIGINT) AS pr
      FROM s GROUP BY p
    ),
    lagged AS (
      SELECT p, q, pr,
             lag(p, 1) OVER (ORDER BY p ASC) AS p_prev,
             lag(q, 1) OVER (ORDER BY p ASC) AS q_prev,
             lag(pr, 1) OVER (ORDER BY p ASC) AS pr_prev
      FROM per
      QUALIFY lag(p, 1) OVER (ORDER BY p ASC) IS NOT NULL
    )
    SELECT p_prev AS p_from, p AS p_to,
           q_prev AS q1, q AS q2, pr_prev AS pr1, pr AS pr2,
           CASE WHEN pr <> pr_prev AND q + q_prev > 0 THEN
             {_AE_NUM} / {_AE_DEN} END AS elasticity
    FROM lagged
"""


@gate("arc_elasticity", _AE_SQL)
def q_arc_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(event_id % 8 as bigint)").alias("p"),
        F.expr(_AE_P).cast("long").alias("pr0"),
        F.expr(
            f"1 + cast({G.lehmer2('event_id')} % 8 as bigint)"
        ).alias("q0"),
    )
    return ops_temporal.arc_elasticity(
        ev, period="p", price="pr0", quantity="q0"
    )


_RH_SQL = """
    WITH s AS MATERIALIZED (
      SELECT DISTINCT user_id AS u,
             CAST(event_id % 15 AS BIGINT) AS p
      FROM events WHERE event_id % 2 = 0
    ),
    first AS (
      SELECT u, CAST(min(p) AS BIGINT) AS c FROM s GROUP BY u
    ),
    act AS (
      SELECT first.c, s.p - first.c AS off
      FROM s JOIN first ON s.u = first.u
    ),
    ret AS (
      SELECT c, off, CAST(count(*) AS BIGINT) AS retained
      FROM act GROUP BY c, off
    ),
    size_t AS (
      SELECT c, retained AS cohort_size FROM ret WHERE off = 0
    ),
    drops AS (
      SELECT ret.c, CAST(min(off) AS BIGINT) AS half_life
      FROM ret JOIN size_t ON ret.c = size_t.c
      WHERE 2 * retained < cohort_size
      GROUP BY ret.c
    )
    SELECT size_t.c AS cohort, cohort_size, half_life
    FROM size_t LEFT JOIN drops ON size_t.c = drops.c
"""


@gate("retention_half_life", _RH_SQL)
def q_retention_half_life(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where("event_id % 2 = 0") \
        .select(
            F.col("user_id").alias("u"),
            F.expr("cast(event_id % 15 as bigint)").alias("p"),
        )
    return ops_temporal.retention_half_life(
        ev, user="u", period="p"
    )
