"""Gate registry extension 168 — rate-surveillance batch: Poisson
rate test with IRR CI, funnel-plot limits."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# poisson_rate_test — event counts with exposure, two hashed arms
# ---------------------------------------------------------------------------
_PR_G = "user_id % 2"
_PR_O = f"(CAST({G.lehmer2('event_id')} % 4 AS BIGINT))"
_PR_T = "(1 + event_id % 5)"
_PR_RA = "(cast(o_a as double) / cast(t_a as double))"
_PR_RB = "(cast(o_b as double) / cast(t_b as double))"
_PR_SE = (
    "sqrt(cast(o_a as double)"
    " / (cast(t_a as double) * cast(t_a as double))"
    " + cast(o_b as double)"
    " / (cast(t_b as double) * cast(t_b as double)))"
)
_PR_LNW = (
    "(1.96e0 * sqrt(1.0e0 / cast(o_a as double)"
    " + 1.0e0 / cast(o_b as double)))"
)
_PR_IRR = f"({_PR_RA} / {_PR_RB})"
_PR_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_PR_G} AS g, {_PR_O} AS o,
             CAST({_PR_T} AS BIGINT) AS t
      FROM events
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN g = 0 THEN o ELSE 0 END)
               AS BIGINT) AS o_a,
             CAST(sum(CASE WHEN g = 0 THEN t ELSE 0 END)
               AS BIGINT) AS t_a,
             CAST(sum(CASE WHEN g = 1 THEN o ELSE 0 END)
               AS BIGINT) AS o_b,
             CAST(sum(CASE WHEN g = 1 THEN t ELSE 0 END)
               AS BIGINT) AS t_b
      FROM s
    )
    SELECT o_a, t_a, o_b, t_b,
           CASE WHEN t_a > 0 AND t_b > 0 AND o_a + o_b > 0
             THEN ({_PR_RA} - {_PR_RB}) / {_PR_SE} END AS z,
           CASE WHEN t_a > 0 AND t_b > 0 AND o_a > 0 AND o_b > 0
             THEN {_PR_IRR} END AS irr,
           CASE WHEN t_a > 0 AND t_b > 0 AND o_a > 0 AND o_b > 0
             THEN round(exp(ln({_PR_IRR}) - {_PR_LNW}), 6)
             + 0.0e0 END AS irr_lo_r,
           CASE WHEN t_a > 0 AND t_b > 0 AND o_a > 0 AND o_b > 0
             THEN round(exp(ln({_PR_IRR}) + {_PR_LNW}), 6)
             + 0.0e0 END AS irr_hi_r
    FROM agg
"""


@gate("poisson_rate_test", _PR_SQL)
def q_poisson_rate_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_PR_G).alias("g"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 4 as bigint)"
        ).alias("o"),
        F.expr(_PR_T).cast("long").alias("t"),
    )
    return ops_stats.poisson_rate_test(
        ev, group="g", events_col="o", exposure="t", g_a=0, g_b=1
    )


# ---------------------------------------------------------------------------
# funnel_limits — per-domain-bucket success rates vs pooled band
# ---------------------------------------------------------------------------
_FL_X = f"(CASE WHEN {G.lehmer2('event_id')} % 5 = 0 THEN 1 ELSE 0 END)"
_FL_P = "(cast(xs as double) / cast(ns as double))"
_FL_W = (
    f"(1.96e0 * sqrt({_FL_P} * (1.0e0 - {_FL_P})"
    " / cast(n_i as double)))"
)
_FL_RATE = "(cast(x_i as double) / cast(n_i as double))"
_FL_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 40 AS e, {_FL_X} AS x,
             CAST(1 AS BIGINT) AS t
      FROM events
    ),
    per AS (
      SELECT e, CAST(sum(x) AS BIGINT) AS x_i,
             CAST(sum(t) AS BIGINT) AS n_i
      FROM s GROUP BY e
    ),
    pool AS (
      SELECT CAST(sum(x_i) AS BIGINT) AS xs,
             CAST(sum(n_i) AS BIGINT) AS ns
      FROM per
    )
    SELECT e, x_i, n_i,
           CASE WHEN n_i > 0 THEN {_FL_RATE} END AS rate,
           CASE WHEN n_i > 0 AND ns > 0 THEN {_FL_P} - {_FL_W} END
             AS lo,
           CASE WHEN n_i > 0 AND ns > 0 THEN {_FL_P} + {_FL_W} END
             AS hi,
           CAST(CASE WHEN n_i > 0 AND ns > 0 THEN
             CASE WHEN {_FL_RATE} < {_FL_P} - {_FL_W}
               OR {_FL_RATE} > {_FL_P} + {_FL_W} THEN 1 ELSE 0 END
             END AS INT) AS flag
    FROM per, pool
"""


@gate("funnel_limits", _FL_SQL)
def q_funnel_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 40).alias("e"),
        F.expr(_FL_X).alias("x"),
        F.lit(1).cast("long").alias("t"),
    )
    return ops_stats.funnel_limits(
        ev, entity="e", successes="x", trials="t"
    )
