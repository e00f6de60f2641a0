"""Gate registry extension 131 — indirect standardization: SMR
against the pooled reference rates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_SM_Q = ops_stats.STD_Q
_SMR_SQL = f"""
    WITH per AS MATERIALIZED (
      SELECT user_id % 3 AS p, event_id % 5 AS s,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1
                      ELSE 0 END) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    ref AS (
      SELECT s, (CAST(sum(x) AS BIGINT)
                 * CAST({_SM_Q} AS BIGINT))
               // CAST(sum(n) AS BIGINT) AS rq
      FROM per GROUP BY s HAVING sum(n) > 0
    ),
    agg AS (
      SELECT p, CAST(sum(x) AS BIGINT) AS observed,
             CAST(sum(n * rq) AS BIGINT) AS e_q
      FROM per JOIN ref USING (s) GROUP BY p
    )
    SELECT p, observed, e_q,
           case when e_q > 0 then
             cast(observed as double) * cast({_SM_Q} as double)
             / cast(e_q as double) end AS smr
    FROM agg
"""


@gate("smr", _SMR_SQL)
def q_smr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 3).alias("p"),
        (F.col("event_id") % 5).alias("s"),
        F.when(F.col("event_type") == "error", 1).otherwise(0)
        .alias("hit"),
        F.lit(1).alias("expo"),
    )
    pooled = ev.groupBy("s").agg(
        F.sum("hit").alias("x"), F.sum("expo").alias("n")
    ).where(F.col("n") > 0).select(
        "s",
        F.expr(
            f"(cast(x as bigint) * cast({_SM_Q} as bigint))"
            " div cast(n as bigint)"
        ).alias("rate_q"),
    )
    return ops_stats.smr(
        ev, pooled, pop="p", stratum="s", hits="hit",
        exposure="expo",
    )
