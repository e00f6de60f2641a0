"""Gate registry extension 158 — shape/projection batch: L-moment
ratios with GEV shape, bipartite RA projection."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# lmoment_ratios — per-user maxima series (the gumbel fixture)
# ---------------------------------------------------------------------------
_LM_NF = "cast(n as double)"
_LM_B0 = f"(cast(b0n as double) / {_LM_NF})"
_LM_B1 = f"(cast(b1n as double) / ({_LM_NF} * ({_LM_NF} - 1.0e0)))"
_LM_B2 = (
    f"(cast(b2n as double) / ({_LM_NF} * ({_LM_NF} - 1.0e0)"
    f" * ({_LM_NF} - 2.0e0)))"
)
_LM_B3 = (
    f"(cast(b3n as double) / ({_LM_NF} * ({_LM_NF} - 1.0e0)"
    f" * ({_LM_NF} - 2.0e0) * ({_LM_NF} - 3.0e0)))"
)
_LM_L2 = f"(2.0e0 * {_LM_B1} - {_LM_B0})"
_LM_L3 = f"(6.0e0 * {_LM_B2} - 6.0e0 * {_LM_B1} + {_LM_B0})"
_LM_L4 = (
    f"(2.0e1 * {_LM_B3} - 3.0e1 * {_LM_B2} + 1.2e1 * {_LM_B1}"
    f" - {_LM_B0})"
)
_LM_T3 = f"({_LM_L3} / {_LM_L2})"
_LM_LN23 = G.fnum(math.log(2.0) / math.log(3.0))
_LM_C = f"(2.0e0 / (3.0e0 + {_LM_T3}) - {_LM_LN23})"
_LM_KAP = (
    f"({G.fnum(7.8590)} * {_LM_C}"
    f" + {G.fnum(2.9554)} * {_LM_C} * {_LM_C})"
)
_LM_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(max(CAST(floor(value) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT v,
             CAST(row_number() OVER (ORDER BY v ASC) AS BIGINT)
               AS i
      FROM s
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS b0n,
             CAST(sum((i - 1) * v) AS BIGINT) AS b1n,
             CAST(sum((i - 1) * (i - 2) * v) AS BIGINT) AS b2n,
             CAST(sum((i - 1) * (i - 2) * (i - 3) * v) AS BIGINT)
               AS b3n
      FROM ranked
    )
    SELECT n, b0n, b1n, b2n, b3n,
           CASE WHEN n > 1 AND {_LM_B0} <> 0.0e0 THEN
             {_LM_L2} / {_LM_B0} END AS l_cv,
           CASE WHEN n > 3 AND {_LM_L2} <> 0.0e0 THEN
             {_LM_T3} END AS tau3,
           CASE WHEN n > 3 AND {_LM_L2} <> 0.0e0 THEN
             {_LM_L4} / {_LM_L2} END AS tau4,
           CASE WHEN n > 3 AND {_LM_L2} <> 0.0e0 THEN
             {_LM_KAP} END AS gev_kappa
    FROM mom
"""


@gate("lmoment_ratios", _LM_SQL)
def q_lmoment_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.expr("max(cast(floor(value) as bigint))").alias("v")
    )
    return ops_stats.lmoment_ratios(ev, value="v")


# ---------------------------------------------------------------------------
# bipartite_project — user-item wedges from hashed items
# ---------------------------------------------------------------------------
_BP_ITEM = f"(CAST({G.lehmer2('event_id')} % 60 AS BIGINT))"
_BP_USER = "(user_id % 80)"
_BP_RAQ = ops_graph.RA_Q
_BP_SQL = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT {_BP_USER} AS u, {_BP_ITEM} AS r
      FROM events
    ),
    deg AS (
      SELECT r, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY r
    ),
    ed AS (SELECT e.u, e.r, deg.d FROM e JOIN deg USING (r)),
    pairs AS (
      SELECT a.u AS u, b.u AS v, a.d
      FROM ed a JOIN ed b ON a.r = b.r AND a.u < b.u
    )
    SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
           CAST(sum({_BP_RAQ} // d) AS BIGINT) AS w_q
    FROM pairs GROUP BY u, v
"""


@gate("bipartite_project", _BP_SQL)
def q_bipartite_project(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_BP_USER).alias("u"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 60 as bigint)"
        ).alias("r"),
    )
    return ops_graph.bipartite_project(ev, left="u", right="r")
