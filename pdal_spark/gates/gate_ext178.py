"""Gate registry extension 178 — hydrology-trend batch: seasonal
Mann-Kendall and Pettitt changepoint."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

# seasonal MK: 12 "months" x ~26-point per-season series (bounded
# pairs: the mann_kendall blocking contract)
_SMK_PRED = "event_id % 31 = 0"
_SMK_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id % 12 AS k, event_id AS o,
             CAST(floor(value) AS BIGINT) AS v
      FROM events WHERE {_SMK_PRED}
    ),
    pair AS (
      SELECT a.k,
             CAST(sum(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT)
               AS s_stat
      FROM s a JOIN s b ON a.k = b.k AND a.o < b.o
      GROUP BY a.k
    ),
    nn AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY k
    ),
    ties AS (
      SELECT k, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
               AS tie_corr
      FROM (SELECT k, v, count(*) AS t FROM s GROUP BY k, v) g
      WHERE t > 1 GROUP BY k
    ),
    per AS (
      SELECT pair.k, s_stat, nn.n,
             CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
               - coalesce(ties.tie_corr, 0) AS BIGINT) AS var18
      FROM pair JOIN nn ON pair.k = nn.k
      LEFT JOIN ties ON pair.k = ties.k
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_seasons,
             CAST(sum(s_stat) AS BIGINT) AS s,
             CAST(sum(var18) AS BIGINT) AS var18
      FROM per
    )
    SELECT n_seasons, s, var18,
           CASE WHEN var18 > 0 THEN
             (cast(s as double) - cast(sign(s) as double))
             / sqrt(cast(var18 as double) / 18.0e0) END AS z
    FROM agg
"""


@gate("seasonal_mann_kendall", _SMK_SQL)
def q_seasonal_mann_kendall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_SMK_PRED).select(
        (F.col("event_id") % 12).alias("k"),
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.seasonal_mann_kendall(
        ev, season="k", order="o", value="v"
    )


_PT_SQL = """
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    per AS (
      SELECT v, CAST(count(*) AS BIGINT) AS t
      FROM s GROUP BY v
    ),
    ranked AS (
      SELECT v,
             CAST(2 * (sum(t) OVER (ORDER BY v ASC
               ROWS UNBOUNDED PRECEDING) - t) + t + 1 AS BIGINT)
               AS r2
      FROM per
    ),
    seq AS MATERIALIZED (
      SELECT tt, n, CAST(pr - tt * (n + 1) AS BIGINT) AS u_t
      FROM (
        SELECT CAST(row_number() OVER (ORDER BY s.o ASC)
                 AS BIGINT) AS tt,
               CAST(sum(ranked.r2) OVER (ORDER BY s.o ASC
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pr,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM s JOIN ranked ON s.v = ranked.v
      ) t WHERE tt < n
    ),
    mx AS (SELECT CAST(max(abs(u_t)) AS BIGINT) AS k_stat
           FROM seq),
    best AS (
      SELECT n, k_stat, CAST(min(tt) AS BIGINT) AS t_star
      FROM seq, mx WHERE abs(seq.u_t) = mx.k_stat
      GROUP BY n, k_stat
    )
    SELECT best.n, t_star, seq.u_t AS u_at, k_stat
    FROM best JOIN seq ON seq.tt = best.t_star
"""


@gate("pettitt_test", _PT_SQL)
def q_pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.pettitt_test(ev, order="o", value="v")
