"""Gate registry extension 114 — uncertainty/fairness batch: split
conformal intervals, group-fairness gaps."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# conformal_interval — calibration = even event ids, test = odd
# ---------------------------------------------------------------------------
_CF_PRED = f"({G.lehmer2('event_id')} % 1000)"
_CF_Y = (
    f"({_CF_PRED} + ({G.lehmer2('event_id * 7 + 3')} % 101) - 50)"
)
_CF_ALPHA = 10
_CF_SQL = f"""
    WITH calib AS MATERIALIZED (
      SELECT abs(({_CF_Y}) - ({_CF_PRED})) AS r
      FROM events WHERE event_id % 2 = 0
    ),
    ranked AS (
      SELECT r, row_number() OVER (ORDER BY r) AS rn,
             count(*) OVER () AS n
      FROM calib
    ),
    qhat AS (
      SELECT r AS qhat FROM ranked
      WHERE rn = ((n + 1) * (100 - {_CF_ALPHA}) + 99) // 100
    )
    SELECT event_id AS id, {_CF_PRED} AS pred,
           ({_CF_PRED}) - qhat AS lo, ({_CF_PRED}) + qhat AS hi
    FROM events LEFT JOIN qhat ON true
    WHERE event_id % 2 = 1
"""


@gate("conformal_interval", _CF_SQL)
def q_conformal_interval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    calib = ev.where("event_id % 2 = 0").select(
        F.expr(_CF_PRED).alias("pred"), F.expr(_CF_Y).alias("y")
    )
    test = ev.where("event_id % 2 = 1").select(
        F.col("event_id").alias("id"),
        F.expr(_CF_PRED).alias("pred"),
    )
    return ops_stats.conformal_interval(
        calib, test, alpha_pct=_CF_ALPHA
    )


# ---------------------------------------------------------------------------
# fairness_gaps — cohort audit of a hash classifier vs hash labels
# ---------------------------------------------------------------------------
_FG_LABEL = f"(CASE WHEN {G.lehmer2('event_id')} % 5 < 2 THEN 1 ELSE 0 END)"
_FG_PRED = (
    f"(CASE WHEN {G.lehmer2('event_id * 3 + 1')} % 5"
    f" + 2 * ({_FG_LABEL}) >= 4 THEN 1 ELSE 0 END)"
)
_FG_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 5 AS g, {_FG_LABEL} AS label,
             {_FG_PRED} AS pred
      FROM events
    ),
    agg AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pred) AS BIGINT) AS n_sel,
             CAST(sum(label * pred) AS BIGINT) AS tp,
             CAST(sum(label) AS BIGINT) AS n_pos,
             CAST(sum((1 - label) * pred) AS BIGINT) AS fp
      FROM s GROUP BY g
    ),
    rates AS (
      SELECT g, n,
             cast(n_sel as double) / cast(n as double) AS sel_rate,
             case when n_pos > 0 then
               cast(tp as double) / cast(n_pos as double) end AS tpr,
             case when n - n_pos > 0 then
               cast(fp as double) / cast(n - n_pos as double) end
               AS fpr
      FROM agg
    )
    SELECT g, n, sel_rate, tpr, fpr,
           max(sel_rate) OVER () - min(sel_rate) OVER () AS dp_gap,
           max(tpr) OVER () - min(tpr) OVER () AS tpr_gap,
           max(fpr) OVER () - min(fpr) OVER () AS fpr_gap
    FROM rates
"""


@gate("fairness_gaps", _FG_SQL)
def q_fairness_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("g"),
        F.expr(_FG_LABEL).alias("label"),
        F.expr(_FG_PRED).alias("pred"),
    )
    return ops_stats.fairness_gaps(
        ev, group="g", label="label", pred="pred"
    )
