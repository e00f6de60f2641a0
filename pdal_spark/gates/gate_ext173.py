"""Gate registry extension 173 — concentration batch: ABC/Pareto
classes and Lorenz curve points."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_ABC_SQL = """
    WITH base AS MATERIALIZED (
      SELECT user_id % 60 AS e,
             CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT)
               AS v
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT e, v,
             CAST(sum(v) OVER (ORDER BY v DESC, e ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(v) OVER () AS BIGINT) AS total
      FROM base
    )
    SELECT e, v, cum,
           CASE WHEN cum * 100 <= 80 * total THEN 'A'
             WHEN cum * 100 <= 95 * total THEN 'B'
             ELSE 'C' END AS cls
    FROM cum
"""


@gate("abc_analysis", _ABC_SQL)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 60).alias("e"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.abc_analysis(
        ev, entity="e", value="v", a_pct=80, b_pct=95
    )


_LZ_SQL = """
    WITH base AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS v,
             CAST(row_number() OVER (ORDER BY floor(value) ASC)
               AS BIGINT) - 1 AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM events
    ),
    bins AS (
      SELECT (rn * 10) // n AS pt,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(v) AS BIGINT) AS v_b
      FROM base GROUP BY (rn * 10) // n
    )
    SELECT CAST(pt AS BIGINT) AS pt,
           CAST(sum(n_b) OVER (ORDER BY pt ASC
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cum,
           CAST(sum(v_b) OVER (ORDER BY pt ASC
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v_cum,
           sum(v_b) OVER (ORDER BY pt ASC
             ROWS UNBOUNDED PRECEDING)
           / sum(v_b) OVER () AS share
    FROM bins
"""


@gate("lorenz_points", _LZ_SQL)
def q_lorenz_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    return ops_stats.lorenz_points(ev, value="v", n_points=10)
