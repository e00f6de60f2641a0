"""Gate registry extension 184 — trial-readout batch: restricted
mean survival time and Pocock win ratio."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

# the competing_risks duration fixture, binarized
_RM_DUR = "(CAST(floor(value / 25) AS BIGINT))"
_RM_EV = f"(CASE WHEN {G.lehmer2('event_id')} % 3 = 0 THEN 1 ELSE 0 END)"
_RM_TAU = 15
_RM_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_RM_DUR} AS t, {_RM_EV} AS e FROM events
    ),
    per_t AS (
      SELECT t, CAST(count(*) AS BIGINT) AS leave,
             CAST(sum(e) AS BIGINT) AS d
      FROM s GROUP BY t
    ),
    risk AS (
      SELECT *, CAST(sum(leave) OVER (ORDER BY t DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
      FROM per_t
    ),
    ev AS (
      SELECT * FROM risk WHERE d > 0 AND d < n_risk
    ),
    km AS (
      SELECT t,
             round(exp(cast(sum(cast(floor(round(ln(1.0e0
               - cast(d as double) / cast(n_risk as double)), 9)
               * 1.0e9 + 0.5e0) as bigint))
               OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING)
               as double) / 1.0e9), 6) AS s_r
      FROM ev
    ),
    steps AS (
      SELECT t, s_r,
             least(coalesce(lead(t, 1) OVER (ORDER BY t ASC),
               {_RM_TAU}), {_RM_TAU}) AS t_next_c
      FROM km WHERE t < {_RM_TAU}
    ),
    first AS (
      SELECT CAST(least(coalesce(min(t), {_RM_TAU}), {_RM_TAU})
               * 1000000000 AS BIGINT) AS head_q
      FROM steps
    ),
    seg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_steps,
             CAST(sum(cast(floor(s_r * 1.0e9 + 0.5e0) as bigint)
               * (t_next_c - t)) AS BIGINT) AS tail_q
      FROM steps
    )
    SELECT CAST({_RM_TAU} AS BIGINT) AS tau, n_steps,
           CAST(coalesce(head_q, 0) + coalesce(tail_q, 0) AS BIGINT) AS rmst_q,
           round(cast(coalesce(head_q, 0) + coalesce(tail_q, 0) as double)
             / 1.0e9, 6) AS rmst_r
    FROM seg, first
"""


@gate("rmst", _RM_SQL)
def q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value / 25) as bigint)").alias("t"),
        F.expr(_RM_EV).cast("int").alias("e"),
    )
    return ops_temporal.rmst(ev, duration="t", event="e",
                             tau=_RM_TAU)


_WR_A = "user_id % 2 = 0"
_WR_B = "user_id % 2 = 1"
_WR_SQL = f"""
    WITH a AS MATERIALIZED (
      SELECT {_RM_DUR} AS ta, {_RM_EV} AS ea
      FROM events WHERE {_WR_A} AND event_id % 11 = 0
    ),
    b AS MATERIALIZED (
      SELECT {_RM_DUR} AS tb, {_RM_EV} AS eb
      FROM events WHERE {_WR_B} AND event_id % 11 = 0
    ),
    pairs AS (
      SELECT CASE WHEN eb = 1 AND tb < ta THEN 1
               WHEN ea = 1 AND ta < tb THEN 2 ELSE 0 END AS res
      FROM a CROSS JOIN b
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN res = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS wins_a,
             CAST(sum(CASE WHEN res = 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS wins_b,
             CAST(sum(CASE WHEN res = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS ties
      FROM pairs
    ),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM a),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b)
    SELECT n_a, n_b, wins_a, wins_b, ties,
           CASE WHEN wins_b > 0 THEN cast(wins_a as double)
             / cast(wins_b as double) END AS wr
    FROM agg, na, nb
"""


@gate("win_ratio", _WR_SQL)
def q_win_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where("event_id % 11 = 0")
    a = ev.where(_WR_A).select(
        F.expr("cast(floor(value / 25) as bigint)").alias("t"),
        F.expr(_RM_EV).cast("int").alias("e"),
    )
    b = ev.where(_WR_B).select(
        F.expr("cast(floor(value / 25) as bigint)").alias("t"),
        F.expr(_RM_EV).cast("int").alias("e"),
    )
    return ops_temporal.win_ratio(a, b, duration="t", event="e")
