"""Gate registry extension 193 — diversity batch: Pielou evenness
and Berger-Parker dominance."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import textops as ops_text

_DV_SP = f"(CAST({G.lehmer2('event_id')} % 50 AS BIGINT))"
_PJ_Q = float(ops_text.PIE_Q)
_PJ_LNS = (
    "cast(floor(ln(cast(s_richness as double))"
    f" * {_PJ_Q!r}e0 + 0.5e0) as bigint)"
)
_PJ_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 8 AS p, {_DV_SP} AS sp FROM events
    ),
    per AS (
      SELECT p, sp, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY p, sp
    ),
    parts AS (
      SELECT p, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS s_richness
      FROM per GROUP BY p
    ),
    hq AS (
      SELECT per.p,
             CAST(sum(c * cast(floor(ln(cast(parts.n as double)
               / cast(c as double)) * {_PJ_Q!r}e0 + 0.5e0)
               as bigint)) AS BIGINT) AS h_q_sum
      FROM per JOIN parts ON per.p = parts.p
      GROUP BY per.p
    )
    SELECT parts.p, n, s_richness, h_q_sum,
           CASE WHEN s_richness > 1 THEN
             cast(h_q_sum as double)
             / (cast(n as double) * cast({_PJ_LNS} as double))
             END AS j
    FROM parts JOIN hq ON parts.p = hq.p
"""


@gate("pielou_evenness", _PJ_SQL)
def q_pielou_evenness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 8).alias("p"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 50 as bigint)"
        ).alias("sp"),
    )
    return ops_text.pielou_evenness(ev, part="p", species="sp")


_BP_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 8 AS p, {_DV_SP} AS sp FROM events
    ),
    per AS (
      SELECT p, sp, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY p, sp
    ),
    agg AS (
      SELECT p, CAST(sum(c) AS BIGINT) AS n,
             CAST(max(c) AS BIGINT) AS n_max
      FROM per GROUP BY p
    )
    SELECT p, n, n_max,
           CASE WHEN n > 0 THEN cast(n_max as double)
             / cast(n as double) END AS d
    FROM agg
"""


@gate("berger_parker", _BP_SQL)
def q_berger_parker(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 8).alias("p"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 50 as bigint)"
        ).alias("sp"),
    )
    return ops_text.berger_parker(ev, part="p", species="sp")
