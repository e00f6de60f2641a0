"""Gate registry extension 181 — curve/event batch: trapezoidal
AUC and POT event declustering."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_TA_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 6 AS k, CAST(event_id AS BIGINT) AS o,
             CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    lagged AS (
      SELECT k, o, v,
             lag(o, 1) OVER (PARTITION BY k ORDER BY o ASC) AS po,
             lag(v, 1) OVER (PARTITION BY k ORDER BY o ASC) AS pv
      FROM s
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(max(o) - min(o) AS BIGINT) AS span,
             CAST(sum(CASE WHEN po IS NOT NULL
               THEN (o - po) * (v + pv) END) AS BIGINT) AS auc2
      FROM lagged GROUP BY k
    )
    SELECT k, n, span, auc2,
           CASE WHEN auc2 IS NOT NULL THEN
             cast(auc2 as double) / 2.0e0 END AS auc
    FROM agg
"""


@gate("trapezoid_auc", _TA_SQL)
def q_trapezoid_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 6).alias("k"),
        F.col("event_id").cast("long").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.trapezoid_auc(
        ev, key="k", order="o", value="v"
    )


# 200 sits below max(floor(value)) at every committed scale
# (sf0.001 max=327, sf0.01 max=490, sf0.1 max=560) yet above the
# ~p97 of the distribution, so the declustering logic is exercised
# (non-empty clusters) at the sf0.001 pytest smoke scale too —
# round-2 verdict flagged 450 returning 0 rows there.
_POT_TH = 200
_POT_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(event_id AS BIGINT) AS o,
             CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    flagged AS (
      SELECT o, v,
             CASE WHEN v > {_POT_TH} THEN 1 ELSE 0 END AS exc,
             lag(CASE WHEN v > {_POT_TH} THEN 1 ELSE 0 END, 1)
               OVER (ORDER BY o ASC) AS pexc
      FROM s
    ),
    numbered AS (
      SELECT o, v, exc,
             CAST(sum(CASE WHEN exc = 1
               AND (pexc IS NULL OR pexc = 0) THEN 1 ELSE 0 END)
               OVER (ORDER BY o ASC ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS ev_id
      FROM flagged
    )
    SELECT ev_id AS event_id,
           CAST(min(o) AS BIGINT) AS start_o,
           CAST(max(o) AS BIGINT) AS end_o,
           CAST(count(*) AS BIGINT) AS duration,
           CAST(max(v) AS BIGINT) AS peak,
           CAST(sum(v - {_POT_TH}) AS BIGINT) AS volume
    FROM numbered WHERE exc = 1 GROUP BY ev_id
"""


@gate("pot_events", _POT_SQL)
def q_pot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").cast("long").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.pot_events(
        ev, order="o", value="v", threshold=_POT_TH
    )
