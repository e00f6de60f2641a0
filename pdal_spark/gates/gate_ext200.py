"""Gate registry extension 200 — survey/robust batch: NPS with CI
and the interquartile mean."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_NP_V = f"(CAST({G.lehmer2('event_id')} % 11 AS BIGINT))"
_NP_NPS = (
    "(cast(promoters - detractors as double) / cast(n as double))"
)
_NP_SE = (
    "sqrt((cast(promoters as double) / cast(n as double)"
    " + cast(detractors as double) / cast(n as double)"
    f" - {_NP_NPS} * {_NP_NPS}) / cast(n as double))"
)
_NP_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_NP_V} AS v FROM events
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN v >= 9 THEN 1 ELSE 0 END)
               AS BIGINT) AS promoters,
             CAST(sum(CASE WHEN v >= 7 AND v <= 8 THEN 1
               ELSE 0 END) AS BIGINT) AS passives,
             CAST(sum(CASE WHEN v <= 6 THEN 1 ELSE 0 END)
               AS BIGINT) AS detractors
      FROM s
    )
    SELECT n, promoters, passives, detractors,
           CASE WHEN n > 0 THEN {_NP_NPS} END AS nps,
           CASE WHEN n > 1 THEN {_NP_NPS} - 1.96e0 * {_NP_SE} END
             AS lo,
           CASE WHEN n > 1 THEN {_NP_NPS} + 1.96e0 * {_NP_SE} END
             AS hi
    FROM agg
"""


@gate("nps_score", _NP_SQL)
def q_nps_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(
            f"cast({G.lehmer2('event_id')} % 11 as bigint)"
        ).alias("v")
    )
    return ops_stats.nps_score(ev, score="v")


_IQ_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 6 AS k, CAST(floor(value) AS BIGINT) AS v,
             event_id
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT k, v,
             CAST(row_number() OVER (PARTITION BY k
               ORDER BY v ASC, event_id ASC) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
      FROM s
    ),
    kept AS (
      SELECT k, n, v FROM base
      WHERE rn > n // 4 AND rn <= 3 * (n // 4)
    )
    SELECT k, CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(v) AS BIGINT) AS sum_kept,
           CASE WHEN count(*) > 0 THEN cast(sum(v) as double)
             / cast(count(*) as double) END AS iqm
    FROM kept GROUP BY k
"""


@gate("interquartile_mean", _IQ_SQL)
def q_interquartile_mean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 6).alias("k"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.interquartile_mean(ev, key="k", value="v")
