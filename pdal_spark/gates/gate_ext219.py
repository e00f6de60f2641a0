"""Gate registry extension 219 — MCC and confusion-derived
summaries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_MC_Y = (
    f"(CASE WHEN {G.lehmer2('event_id')} % 10 < 4 THEN 1"
    " ELSE 0 END)"
)
_MC_P = (
    f"(CASE WHEN {G.lehmer2('event_id * 3 + 1')} % 10"
    f" < 2 + 5 * ({_MC_Y}) THEN 1 ELSE 0 END)"
)
_MC_DEN = (
    "sqrt(cast(tp + fp as double) * cast(tp + fn as double)"
    " * cast(tn + fp as double) * cast(tn + fn as double))"
)
_MC_TPR = "(cast(tp as double) / cast(tp + fn as double))"
_MC_TNR = "(cast(tn as double) / cast(tn + fp as double))"
_MC_PPV = "(cast(tp as double) / cast(tp + fp as double))"
_MC_NPV = "(cast(tn as double) / cast(tn + fn as double))"
_MC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_MC_Y} AS y, {_MC_P} AS p FROM events
    ),
    agg AS (
      SELECT
        CAST(sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS tp,
        CAST(sum(CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS fp,
        CAST(sum(CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS fn,
        CAST(sum(CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS tn
      FROM s
    )
    SELECT tp, fp, fn, tn,
           CASE WHEN {_MC_DEN} > 0.0e0 THEN
             (cast(tp as double) * cast(tn as double)
             - cast(fp as double) * cast(fn as double))
             / {_MC_DEN} END AS mcc,
           CASE WHEN tp + fn > 0 AND tn + fp > 0 THEN
             ({_MC_TPR} + {_MC_TNR}) / 2.0e0 END AS bal_acc,
           CASE WHEN tp + fn > 0 AND tn + fp > 0 THEN
             {_MC_TPR} + {_MC_TNR} - 1.0e0 END AS informedness,
           CASE WHEN tp + fp > 0 AND tn + fn > 0 THEN
             {_MC_PPV} + {_MC_NPV} - 1.0e0 END AS markedness
    FROM agg
"""


@gate("mcc_score", _MC_SQL)
def q_mcc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_MC_Y).alias("y"), F.expr(_MC_P).alias("p")
    )
    return ops_stats.mcc_score(ev, truth="y", pred="p")
