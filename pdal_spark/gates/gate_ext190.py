"""Gate registry extension 190 — rate/ratio batch: Poisson funnel
limits and geometric statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_PF_O = f"(CAST({G.lehmer2('event_id')} % 3 AS BIGINT))"
_PF_T = "(1 + event_id % 4)"
_PF_RP = "(cast(os as double) / cast(ts as double))"
_PF_W = f"(1.96e0 * sqrt({_PF_RP} / cast(t_i as double)))"
_PF_RATE = "(cast(o_i as double) / cast(t_i as double))"
_PF_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 35 AS e, {_PF_O} AS o,
             CAST({_PF_T} AS BIGINT) AS t
      FROM events
    ),
    per AS (
      SELECT e, CAST(sum(o) AS BIGINT) AS o_i,
             CAST(sum(t) AS BIGINT) AS t_i
      FROM s GROUP BY e
    ),
    pool AS (
      SELECT CAST(sum(o_i) AS BIGINT) AS os,
             CAST(sum(t_i) AS BIGINT) AS ts
      FROM per
    )
    SELECT e, o_i, t_i,
           CASE WHEN t_i > 0 THEN {_PF_RATE} END AS rate,
           CASE WHEN t_i > 0 AND ts > 0 THEN {_PF_RP} - {_PF_W}
             END AS lo,
           CASE WHEN t_i > 0 AND ts > 0 THEN {_PF_RP} + {_PF_W}
             END AS hi,
           CAST(CASE WHEN t_i > 0 AND ts > 0 THEN
             CASE WHEN {_PF_RATE} < {_PF_RP} - {_PF_W}
               OR {_PF_RATE} > {_PF_RP} + {_PF_W} THEN 1
               ELSE 0 END END AS INT) AS flag
    FROM per, pool
"""


@gate("poisson_funnel", _PF_SQL)
def q_poisson_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 35).alias("e"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 3 as bigint)"
        ).alias("o"),
        F.expr(_PF_T).cast("long").alias("t"),
    )
    return ops_stats.poisson_funnel(
        ev, entity="e", events_col="o", exposure="t"
    )


_GS_Q = float(ops_stats.GEO_Q)
_GS_MEAN = (
    f"(cast(ln_q_sum as double) / (cast(n as double) * {_GS_Q!r}e0))"
)
_GS_VAR = (
    "((cast(n as double) * cast(ln2_q_sum as double)"
    " - cast(ln_q_sum as double) * cast(ln_q_sum as double))"
    " / (cast(n as double) * (cast(n as double) - 1.0e0)"
    f" * {_GS_Q!r}e0 * {_GS_Q!r}e0))"
)
_GS_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 9 AS k,
             CAST(floor(value) AS BIGINT) + 1 AS v
      FROM events
    ),
    kept AS (
      SELECT k,
             CAST(floor(ln(cast(v as double))
               * {_GS_Q!r}e0 + 0.5e0) AS BIGINT) AS lq
      FROM s WHERE v >= 1
    ),
    dropped AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_dropped
      FROM s WHERE v < 1 GROUP BY k
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lq) AS BIGINT) AS ln_q_sum,
             CAST(sum(lq * lq) AS BIGINT) AS ln2_q_sum
      FROM kept GROUP BY k
    )
    SELECT agg.k, n, coalesce(dropped.n_dropped, 0) AS n_dropped,
           ln_q_sum,
           CASE WHEN n > 0 THEN round(exp({_GS_MEAN}), 6)
             + 0.0e0 END AS gm_r,
           CASE WHEN n > 1 AND {_GS_VAR} >= 0.0e0 THEN
             round(exp(sqrt({_GS_VAR})), 6) + 0.0e0 END AS gsd_r
    FROM agg LEFT JOIN dropped ON agg.k = dropped.k
"""


@gate("geometric_stats", _GS_SQL)
def q_geometric_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 9).alias("k"),
        (F.expr("cast(floor(value) as bigint)") + 1).alias("v"),
    )
    return ops_stats.geometric_stats(ev, key="k", value="v")
