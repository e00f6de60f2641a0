"""Gate registry extension 128 — shrinkage batch: empirical-Bayes
beta-binomial rate ranking."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_EB_Q = ops_stats.EB_Q
_EB_QF = G.fnum(float(_EB_Q))
_EB_M = f"(cast(sp as double) / cast(g as double) / {_EB_QF})"
_EB_V = (
    "((cast(g as double) * cast(spp as double)"
    " - cast(sp as double) * cast(sp as double))"
    " / (cast(g as double) * cast(g as double))"
    f" / {_EB_QF} / {_EB_QF})"
)
_EB_K0 = f"({_EB_M} * (1.0e0 - {_EB_M}) / {_EB_V} - 1.0e0)"
_EB_A = f"({_EB_M} * {_EB_K0})"
_EB_B = f"((1.0e0 - {_EB_M}) * {_EB_K0})"
_EB_OK = f"({_EB_V} > 0.0e0 and {_EB_K0} > 0.0e0)"

_EB_SQL = f"""
    WITH per AS MATERIALIZED (
      SELECT user_id % 31 AS k,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1
                      ELSE 0 END) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1 HAVING count(*) > 0
    ),
    pq AS (
      SELECT k, x, n,
             (x * CAST({_EB_Q} AS BIGINT)) // n AS p_q
      FROM per
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS g,
             CAST(sum(p_q) AS BIGINT) AS sp,
             CAST(sum(p_q * p_q) AS BIGINT) AS spp
      FROM pq
    )
    SELECT k AS user_id, x, n, p_q,
           case when {_EB_OK} then round({_EB_A}, 9) end AS alpha,
           case when {_EB_OK} then round({_EB_B}, 9) end AS beta,
           round(case when {_EB_OK} then
             (cast(x as double) + {_EB_A})
             / (cast(n as double) + {_EB_A} + {_EB_B})
             else cast(x as double) / cast(n as double) end, 9)
             AS shrunk
    FROM pq, mom
"""


@gate("empirical_bayes_rates", _EB_SQL)
def q_empirical_bayes_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 31).alias("k"),
        F.when(F.col("event_type") == "error", 1).otherwise(0)
        .alias("hit"),
        F.lit(1).alias("trial"),
    )
    return ops_stats.empirical_bayes_rates(
        ev, key="k", hits="hit", trials="trial"
    ).select(F.col("k").alias("user_id"), "x", "n", "p_q",
             "alpha", "beta", "shrunk")
