"""Gate registry extension 157 — extreme-value batch: Gumbel
L-moments fit with return levels, mean-excess ladder."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# block maxima: per-user max of floored values (annual-maximum
# series shape)
_GB_SRC = """
      SELECT CAST(max(CAST(floor(value) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY user_id
"""

_GB_LN2 = G.fnum(math.log(2.0))
_GB_GAM = G.fnum(0.5772156649015329)
_GB_K10 = G.fnum(-math.log(-math.log(1.0 - 1.0 / 10.0)))
_GB_K100 = G.fnum(-math.log(-math.log(1.0 - 1.0 / 100.0)))
_GB_B0 = "(cast(sum_v as double) / cast(n as double))"
_GB_L2 = (
    "((2.0e0 * cast(sum_iv as double)"
    " - (cast(n as double) - 1.0e0) * cast(sum_v as double))"
    " / (cast(n as double) * (cast(n as double) - 1.0e0)))"
)
_GB_BETA = f"({_GB_L2} / {_GB_LN2})"
_GB_MU = f"({_GB_B0} - {_GB_GAM} * {_GB_BETA})"
_GB_SQL = f"""
    WITH s AS MATERIALIZED ({_GB_SRC}),
    ranked AS (
      SELECT v,
             CAST(row_number() OVER (ORDER BY v ASC) AS BIGINT)
               AS i
      FROM s
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS sum_v,
             CAST(sum((i - 1) * v) AS BIGINT) AS sum_iv
      FROM ranked
    )
    SELECT n, sum_v, sum_iv,
           CASE WHEN n > 1 THEN {_GB_MU} END AS mu,
           CASE WHEN n > 1 THEN {_GB_BETA} END AS beta,
           CASE WHEN n > 1 THEN {_GB_MU} + {_GB_BETA} * {_GB_K10}
             END AS rl10,
           CASE WHEN n > 1 THEN {_GB_MU} + {_GB_BETA} * {_GB_K100}
             END AS rl100
    FROM mom
"""


@gate("gumbel_lmoments", _GB_SQL)
def q_gumbel_lmoments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.expr("max(cast(floor(value) as bigint))").alias("v")
    )
    return ops_stats.gumbel_lmoments(ev, value="v")


# ---------------------------------------------------------------------------
# mean_excess — threshold ladder over the floored values
# ---------------------------------------------------------------------------
_ME_TS = [300, 400, 450, 480]
_ME_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS v FROM events
    ),
    ladder AS (
      SELECT v, CAST(t.u AS BIGINT) AS u
      FROM s, (SELECT unnest([{", ".join(map(str, _ME_TS))}]) AS u)
             t
      WHERE v > t.u
    )
    SELECT u, CAST(count(*) AS BIGINT) AS n_exc,
           CAST(sum(v - u) AS BIGINT) AS sum_exc,
           cast(sum(v - u) as double) / cast(count(*) as double)
             AS me
    FROM ladder GROUP BY u
"""


@gate("mean_excess", _ME_SQL)
def q_mean_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    return ops_stats.mean_excess(ev, value="v", thresholds=_ME_TS)
