"""Gate registry extension 186 — paired-category batch: Bowker
symmetry and Yule's Q."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_BW_Q = ops_stats.BWK_Q
_BW_I = "(event_id % 4)"
_BW_J = f"(CAST({G.lehmer2('event_id')} % 4 AS BIGINT))"
_BW_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_BW_I} AS i, {_BW_J} AS j FROM events
    ),
    cells AS (
      SELECT i, j, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY i, j
    ),
    pairs AS (
      SELECT coalesce(a.c, 0) AS nij, coalesce(b.c, 0) AS nji
      FROM (SELECT i AS x, j AS y, c FROM cells) a
      FULL OUTER JOIN (SELECT j AS x, i AS y, c FROM cells) b
        ON a.x = b.x AND a.y = b.y
      WHERE coalesce(a.x, b.x) < coalesce(a.y, b.y)
        AND coalesce(a.c, 0) + coalesce(b.c, 0) > 0
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum((((nij - nji) * (nij - nji))
               // (nij + nji)) * CAST({_BW_Q} AS BIGINT)
               + ((((nij - nji) * (nij - nji)) % (nij + nji))
               * CAST({_BW_Q} AS BIGINT)) // (nij + nji))
               AS BIGINT) AS chi2_q
      FROM pairs
    ),
    n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s)
    SELECT n, n_pairs, chi2_q,
           cast(chi2_q as double) / {float(_BW_Q)!r}e0 AS chi2
    FROM n_t, agg
"""


@gate("bowker_test", _BW_SQL)
def q_bowker_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_BW_I).alias("i"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 4 as bigint)"
        ).alias("j"),
    )
    return ops_stats.bowker_test(ev, before="i", after="j")


_YQ_X = "(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)"
_YQ_Y = (
    f"(CASE WHEN {G.lehmer2('event_id')} % 100"
    " < 30 + 40 * (user_id % 2) THEN 0 ELSE 1 END)"
)
_YQ_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_YQ_X} AS xv, {_YQ_Y} AS yv FROM events
    ),
    agg AS (
      SELECT
        CAST(sum(CASE WHEN xv = 1 AND yv = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS a,
        CAST(sum(CASE WHEN xv = 1 AND yv = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS b,
        CAST(sum(CASE WHEN xv = 0 AND yv = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS c,
        CAST(sum(CASE WHEN xv = 0 AND yv = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS d
      FROM s
    )
    SELECT a, b, c, d,
           CASE WHEN a * d + b * c > 0 THEN
             cast(a * d - b * c as double)
             / cast(a * d + b * c as double) END AS q
    FROM agg
"""


@gate("yules_q", _YQ_SQL)
def q_yules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_YQ_X).alias("xv"), F.expr(_YQ_Y).alias("yv")
    )
    return ops_stats.yules_q(ev, x="xv", y="yv")
