"""Gate registry extension 183 — econ batch: price indices and
HHI concentration."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_PI_PRED = "event_id % 41 = 0"
_PI_P0 = "(10 + event_id % 50)"
_PI_Q0 = "(1 + user_id % 9)"
_PI_P1 = f"(12 + event_id % 50 + CAST({G.lehmer2('event_id')} % 7 AS BIGINT))"
_PI_Q1 = f"(1 + CAST({G.lehmer2('event_id * 3 + 1')} % 9 AS BIGINT))"
_PI_L = "(cast(s10 as double) / cast(s00 as double))"
_PI_P = "(cast(s11 as double) / cast(s01 as double))"
_PI_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST({_PI_P0} AS BIGINT) AS p0,
             CAST({_PI_Q0} AS BIGINT) AS q0,
             CAST({_PI_P1} AS BIGINT) AS p1,
             CAST({_PI_Q1} AS BIGINT) AS q1
      FROM events WHERE {_PI_PRED}
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(p1 * q0) AS BIGINT) AS s10,
             CAST(sum(p0 * q0) AS BIGINT) AS s00,
             CAST(sum(p1 * q1) AS BIGINT) AS s11,
             CAST(sum(p0 * q1) AS BIGINT) AS s01
      FROM s
    )
    SELECT n_items, s10, s00, s11, s01,
           CASE WHEN s00 > 0 AND s01 > 0 THEN {_PI_L} END
             AS laspeyres,
           CASE WHEN s00 > 0 AND s01 > 0 THEN {_PI_P} END
             AS paasche,
           CASE WHEN s00 > 0 AND s01 > 0 THEN
             sqrt({_PI_L} * {_PI_P}) END AS fisher
    FROM agg
"""


@gate("price_indices", _PI_SQL)
def q_price_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_PI_PRED).select(
        F.expr(_PI_P0).cast("long").alias("p0"),
        F.expr(_PI_Q0).cast("long").alias("q0"),
        F.expr(
            f"12 + event_id % 50"
            f" + cast({G.lehmer2('event_id')} % 7 as bigint)"
        ).alias("p1"),
        F.expr(
            f"1 + cast({G.lehmer2('event_id * 3 + 1')} % 9"
            " as bigint)"
        ).alias("q1"),
    )
    return ops_stats.price_indices(
        ev, p0="p0", q0="q0", p1="p1", q1="q1"
    )


_HH_Q = ops_stats.HHI_Q
_HH_SQL = f"""
    WITH per AS MATERIALIZED (
      SELECT user_id % 30 AS e,
             CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT)
               AS v
      FROM events GROUP BY 1
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS total,
             CAST(sum(v * v) AS BIGINT) AS sum_sq
      FROM per
    )
    SELECT n, total, sum_sq,
           CAST(CASE WHEN total > 0 THEN
             (sum_sq * CAST({_HH_Q} AS BIGINT))
             // (total * total) ELSE 0 END AS BIGINT) AS hhi_q,
           CASE WHEN total > 0 THEN cast(sum_sq as double)
             / (cast(total as double) * cast(total as double))
             END AS hhi
    FROM agg
"""


@gate("hhi_index", _HH_SQL)
def q_hhi_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 30).alias("e"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.hhi_index(ev, entity="e", value="v")
