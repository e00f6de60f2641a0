"""Gate registry extension 211 — inequality batch: Gini mean
difference and Atkinson index."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_GM_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 6 AS k, CAST(floor(value) AS BIGINT) AS v,
             event_id
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT k, v,
             CAST(row_number() OVER (PARTITION BY k
               ORDER BY v ASC, event_id ASC) AS BIGINT) AS i,
             CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
      FROM s
    ),
    agg AS (
      SELECT k, CAST(max(n) AS BIGINT) AS n,
             CAST(sum((2 * i - n - 1) * v) AS BIGINT) AS w_sum
      FROM base GROUP BY k
    )
    SELECT k, n, w_sum,
           CASE WHEN n > 1 THEN 2.0e0 * cast(w_sum as double)
             / (cast(n as double) * (cast(n as double) - 1.0e0))
             END AS gmd
    FROM agg
"""


@gate("gini_mean_diff", _GM_SQL)
def q_gini_mean_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 6).alias("k"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.gini_mean_diff(ev, key="k", value="v")


_AT_Q = float(ops_stats.GEO_Q)
_AT_GM = (
    f"exp(cast(lq as double) / (cast(n as double) * {_AT_Q!r}e0))"
)
_AT_MEAN = "(cast(s as double) / cast(n as double))"
_AT_SQL = f"""
    WITH s0 AS MATERIALIZED (
      SELECT user_id % 6 AS k,
             CAST(floor(value) AS BIGINT) + 1 AS v
      FROM events
    ),
    kept AS (SELECT * FROM s0 WHERE v >= 1),
    dropped AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_dropped
      FROM s0 WHERE v < 1 GROUP BY k
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s,
             CAST(sum(cast(floor(ln(cast(v as double))
               * {_AT_Q!r}e0 + 0.5e0) as bigint)) AS BIGINT)
               AS lq
      FROM kept GROUP BY k
    )
    SELECT agg.k, n, coalesce(dropped.n_dropped, 0) AS n_dropped,
           CASE WHEN n > 0 AND {_AT_MEAN} > 0.0e0 THEN
             round(1.0e0 - {_AT_GM} / {_AT_MEAN}, 9) END AS a_r
    FROM agg LEFT JOIN dropped ON agg.k = dropped.k
"""


@gate("atkinson_index", _AT_SQL)
def q_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 6).alias("k"),
        (F.expr("cast(floor(value) as bigint)") + 1).alias("v"),
    )
    return ops_stats.atkinson_index(ev, key="k", value="v")
