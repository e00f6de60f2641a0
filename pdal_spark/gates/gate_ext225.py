"""Gate registry extension 225 — telemetry batch: debounce audit
and gap statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_DB_D = 3
_DB_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 15 AS k, CAST(event_id AS BIGINT) AS o
      FROM events
    ),
    lagged AS (
      SELECT k, o,
             lag(o, 1) OVER (PARTITION BY k ORDER BY o ASC) AS po
      FROM s
    )
    SELECT k, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN po IS NOT NULL AND o - po <= {_DB_D}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
           CASE WHEN count(*) > 1 THEN
             cast(sum(CASE WHEN po IS NOT NULL
               AND o - po <= {_DB_D} THEN 1 ELSE 0 END) as double)
             / (cast(count(*) as double) - 1.0e0) END
             AS bounce_share,
           CAST(min(CASE WHEN po IS NOT NULL THEN o - po END)
             AS BIGINT) AS min_gap
    FROM lagged GROUP BY k
"""


@gate("debounce_audit", _DB_SQL)
def q_debounce_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 15).alias("k"),
        F.col("event_id").cast("long").alias("o"),
    )
    return ops_temporal.debounce_audit(
        ev, key="k", order="o", delta=_DB_D
    )


_GS_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 15 AS k, CAST(event_id AS BIGINT) AS o
      FROM events
    ),
    gaps AS (
      SELECT k, o - lag(o, 1) OVER (PARTITION BY k
               ORDER BY o ASC) AS g
      FROM s
      QUALIFY lag(o, 1) OVER (PARTITION BY k ORDER BY o ASC)
        IS NOT NULL
    ),
    r AS (
      SELECT k, g,
             CAST(row_number() OVER (PARTITION BY k
               ORDER BY g ASC) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS m
      FROM gaps
    ),
    agg AS (
      SELECT k, m,
             CAST(sum(CASE WHEN rn = (m + 1) // 2
               OR rn = (m + 2) // 2 THEN g END) AS BIGINT)
               AS med_raw,
             CAST(sum(CASE WHEN rn = (m + 1) // 2
               AND (m + 1) // 2 = (m + 2) // 2 THEN g END)
               AS BIGINT) AS med_single,
             CAST(min(CASE WHEN rn = (m + 3) // 4 THEN g END)
               AS BIGINT) AS q1,
             CAST(min(CASE WHEN rn = (3 * m + 3) // 4 THEN g END)
               AS BIGINT) AS q3
      FROM r GROUP BY k, m
    )
    SELECT k, m AS n_gaps,
           CAST(CASE WHEN med_single IS NOT NULL
             THEN 2 * med_single ELSE med_raw END AS BIGINT)
             AS gap_med2,
           q1, coalesce(q3, q1) AS q3,
           CAST(coalesce(q3, q1) - q1 AS BIGINT) AS iqr
    FROM agg
"""


@gate("gap_stats", _GS_SQL)
def q_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 15).alias("k"),
        F.col("event_id").cast("long").alias("o"),
    )
    return ops_temporal.gap_stats(ev, key="k", order="o")
