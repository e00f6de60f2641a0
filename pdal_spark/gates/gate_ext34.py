"""Gate registry extension 34 — robust per-row anomaly scoring:
per-group robust z-scores (median/MAD — the outlier score the
outliers cannot drag). The streaming geofence detector added
alongside is pytest-gated (stateful streaming is non-SQL-expressible
by the driver's own carve-out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_RZ_K = G.fnum(1.4826)

_RZ_SQL = f"""
    WITH med AS MATERIALIZED (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY 1
    ),
    j AS (
      SELECT e.event_type, e.event_id, e.value, med.med
      FROM events e JOIN med USING (event_type)
    ),
    mad AS MATERIALIZED (
      SELECT event_type, median(abs(value - med)) AS mad
      FROM j GROUP BY 1
    )
    SELECT j.event_type, j.event_id, j.value,
           CASE WHEN mad.mad > 0.0e0 THEN
             (CAST(j.value AS DOUBLE) - j.med)
               / ({_RZ_K} * mad.mad) END AS z
    FROM j JOIN mad USING (event_type)
"""


@gate("robust_zscore", _RZ_SQL)
def q_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_stats.robust_zscore(ev, "event_type", "value")

