"""Gate registry extension 177 — post-ANOVA batch: pairwise mean
differences and polynomial trend contrasts."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_PM_Q = ops_stats.BF_Q


def _pm_qdiv(d: str, nn: str) -> str:
    return (
        f"(({d}) // ({nn})) * CAST({_PM_Q} AS BIGINT)"
        f" + ((({d}) % ({nn})) * CAST({_PM_Q} AS BIGINT))"
        f" // ({nn})"
    )


_PM_S2P = (
    f"(cast(ssw_q as double) / {float(_PM_Q)!r}e0"
    " / (cast(n as double) - cast(k as double)))"
)
_PM_DIFF = (
    "(cast(s_i as double) / cast(n_i as double)"
    " - cast(s_j as double) / cast(n_j as double))"
)
_PM_SE = (
    f"sqrt({_PM_S2P} * (1.0e0 / cast(n_i as double)"
    " + 1.0e0 / cast(n_j as double)))"
)
_PM_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 5 AS g, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(v) AS BIGINT) AS s_g,
             CAST(sum(v * v) AS BIGINT) AS ss_g
      FROM s GROUP BY g
    ),
    pooled AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum({_pm_qdiv('(n_g * ss_g - s_g * s_g)',
                                'n_g')}) AS BIGINT) AS ssw_q
      FROM grp
    )
    SELECT a.g AS gi, b.g AS gj, a.n_g AS n_i, b.n_g AS n_j,
           (cast(a.s_g as double) / cast(a.n_g as double)
           - cast(b.s_g as double) / cast(b.n_g as double))
             AS diff,
           CASE WHEN n > k AND
             (cast(ssw_q as double) / {float(_PM_Q)!r}e0
             / (cast(n as double) - cast(k as double))) > 0.0e0
             THEN (cast(a.s_g as double) / cast(a.n_g as double)
             - cast(b.s_g as double) / cast(b.n_g as double))
             / sqrt((cast(ssw_q as double) / {float(_PM_Q)!r}e0
             / (cast(n as double) - cast(k as double)))
             * (1.0e0 / cast(a.n_g as double)
             + 1.0e0 / cast(b.n_g as double))) END AS q_stat
    FROM grp a JOIN grp b ON a.g < b.g, pooled
"""


@gate("pairwise_mean_diffs", _PM_SQL)
def q_pairwise_mean_diffs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("g"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.pairwise_mean_diffs(ev, group="g", value="v")


_TC_QQ = float(ops_stats.JS_Q)
_TC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 5 AS g,
             CAST(floor(value) AS BIGINT)
               + (user_id % 5) * 3 AS v
      FROM events
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(v) AS BIGINT) AS s_g
      FROM s GROUP BY g
    ),
    grp2 AS (
      SELECT g,
             CAST(floor(cast(s_g as double)
               / cast(n_g as double)
               * {_TC_QQ!r}e0 + 0.5e0) AS BIGINT) AS m_q
      FROM grp
    ),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM grp2),
    agg AS (
      SELECT k,
             CAST(sum((2 * g - (k - 1)) * m_q) AS BIGINT)
               AS lin_q,
             CAST(sum((3 * (2 * g - (k - 1)) * (2 * g - (k - 1))
               - (k * k - 1)) * m_q) AS BIGINT) AS quad_q
      FROM grp2, kk GROUP BY k
    )
    SELECT k, lin_q, quad_q,
           cast(lin_q as double) / {_TC_QQ!r}e0 AS lin,
           cast(quad_q as double) / {_TC_QQ!r}e0 AS quad
    FROM agg
"""


@gate("trend_contrasts", _TC_SQL)
def q_trend_contrasts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("g"),
        (F.expr("cast(floor(value) as bigint)")
         + (F.col("user_id") % 5) * 3).alias("v"),
    )
    return ops_stats.trend_contrasts(ev, group="g", value="v")
