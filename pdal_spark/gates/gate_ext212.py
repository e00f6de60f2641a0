"""Gate registry extension 212 — income share ratios (Palma,
S80/S20)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_IS_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 5 AS k, CAST(floor(value) AS BIGINT) AS v,
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
    agg AS (
      SELECT k, CAST(max(n) AS BIGINT) AS n,
             CAST(sum(CASE WHEN rn * 10 <= 4 * n THEN v
               ELSE 0 END) AS BIGINT) AS bot40,
             CAST(sum(CASE WHEN rn * 5 <= n THEN v ELSE 0 END)
               AS BIGINT) AS bot20,
             CAST(sum(CASE WHEN rn * 5 > 4 * n THEN v ELSE 0 END)
               AS BIGINT) AS top20,
             CAST(sum(CASE WHEN rn * 10 > 9 * n THEN v
               ELSE 0 END) AS BIGINT) AS top10
      FROM base GROUP BY k
    )
    SELECT k, n, bot40, bot20, top20, top10,
           CASE WHEN bot40 > 0 THEN cast(top10 as double)
             / cast(bot40 as double) END AS palma,
           CASE WHEN bot20 > 0 THEN cast(top20 as double)
             / cast(bot20 as double) END AS s80s20
    FROM agg
"""


@gate("income_shares", _IS_SQL)
def q_income_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("k"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.income_share_ratios(ev, key="k", value="v")
