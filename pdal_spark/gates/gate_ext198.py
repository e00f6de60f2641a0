"""Gate registry extension 198 — dispersion-summary batch: CV/SNR
and midhinge/IQR."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_CV_SD = (
    "sqrt((cast(n as double) * cast(ss as double)"
    " - cast(s as double) * cast(s as double))"
    " / (cast(n as double) * (cast(n as double) - 1.0e0)))"
)
_CV_MEAN = "(cast(s as double) / cast(n as double))"
_CV_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 7 AS k, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s,
             CAST(sum(v * v) AS BIGINT) AS ss
      FROM s GROUP BY k
    )
    SELECT k, n, s, ss,
           CASE WHEN n > 1 AND {_CV_MEAN} <> 0.0e0 THEN
             {_CV_SD} / {_CV_MEAN} END AS cv,
           CASE WHEN n > 1 AND {_CV_SD} > 0.0e0 THEN
             {_CV_MEAN} / {_CV_SD} END AS snr
    FROM agg
"""


@gate("cv_snr", _CV_SQL)
def q_cv_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 7).alias("k"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.cv_mean_ratio(ev, key="k", value="v")


_MH_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 7 AS k, CAST(floor(value) AS BIGINT) AS v,
             event_id
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT k, v,
             CAST(row_number() OVER (PARTITION BY k
               ORDER BY v ASC, event_id ASC) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
      FROM s
    ),
    agg AS (
      SELECT k, n,
             CAST(min(CASE WHEN rn = (n + 3) // 4 THEN v END)
               AS BIGINT) AS q1,
             CAST(min(CASE WHEN rn = (3 * n + 3) // 4 THEN v END)
               AS BIGINT) AS q3
      FROM base
      WHERE rn = (n + 3) // 4 OR rn = (3 * n + 3) // 4
      GROUP BY k, n
    )
    SELECT k, n, q1,
           coalesce(q3, q1) AS q3,
           CAST(q1 + coalesce(q3, q1) AS BIGINT) AS midhinge2,
           CAST(coalesce(q3, q1) - q1 AS BIGINT) AS iqr
    FROM agg
"""


@gate("midhinge_iqr", _MH_SQL)
def q_midhinge_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 7).alias("k"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.midhinge_iqr(ev, key="k", value="v")
