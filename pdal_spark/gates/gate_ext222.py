"""Gate registry extension 222 — F-beta threshold ladder."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext144 import _EV_LABEL, _EV_LABEL_SP, _EV_SCORE
from pdal_spark.operators import stats as ops_stats

_FB_TS = [250, 500, 750]
_FB_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_EV_SCORE} AS v, {_EV_LABEL} AS y FROM events
    ),
    ladder AS (
      SELECT v, y, CAST(t.t AS BIGINT) AS t
      FROM s, (SELECT unnest([{", ".join(map(str, _FB_TS))}])
                 AS t) t
    ),
    agg AS (
      SELECT t,
             CAST(sum(CASE WHEN v >= t AND y = 1 THEN 1
               ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN v >= t AND y = 0 THEN 1
               ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN v < t AND y = 1 THEN 1
               ELSE 0 END) AS BIGINT) AS fn
      FROM ladder GROUP BY t
    )
    SELECT t, tp, fp, fn,
           CASE WHEN tp + fp > 0 THEN cast(tp as double)
             / cast(tp + fp as double) END AS prec,
           CASE WHEN tp + fn > 0 THEN cast(tp as double)
             / cast(tp + fn as double) END AS rec,
           CASE WHEN 2 * tp + fp + fn > 0 THEN
             cast(2 * tp as double)
             / cast(2 * tp + fp + fn as double) END AS fbeta
    FROM agg
"""


@gate("fbeta_ladder", _FB_SQL)
def q_fbeta_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_EV_SCORE).alias("v"),
        F.expr(_EV_LABEL_SP).alias("y"),
    )
    return ops_stats.fbeta_ladder(
        ev, score="v", label="y", thresholds=_FB_TS
    )
