"""Gate registry extension 130 — standardization batch: directly
standardized rates (fixed-mix comparison across populations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_SR_Q = ops_stats.STD_Q
_SR_SQL = f"""
    WITH per AS MATERIALIZED (
      SELECT user_id % 3 AS p, event_id % 5 AS s,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1
                      ELSE 0 END) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2 HAVING count(*) > 0
    ),
    rq AS (
      SELECT p, s, (x * CAST({_SR_Q} AS BIGINT)) // n AS r_q
      FROM per
    ),
    ref AS (SELECT s, s + 1 AS w
            FROM (SELECT DISTINCT event_id % 5 AS s FROM events) t),
    pops AS (SELECT DISTINCT p FROM rq),
    lattice AS (
      SELECT pops.p, ref.s, ref.w FROM pops CROSS JOIN ref
    ),
    j AS (
      SELECT lattice.p, w,
             CAST(coalesce(rq.r_q, 0) AS BIGINT) AS r_q
      FROM lattice LEFT JOIN rq
        ON rq.p = lattice.p AND rq.s = lattice.s
    ),
    agg AS (
      SELECT p, CAST(sum(w) AS BIGINT) AS w_tot,
             CAST(sum(w * r_q) AS BIGINT) AS wr_q
      FROM j GROUP BY p
    )
    SELECT p, w_tot, wr_q,
           cast(wr_q as double)
             / (cast(w_tot as double) * cast({_SR_Q} as double))
             AS std_rate
    FROM agg
"""


@gate("standardized_rate", _SR_SQL)
def q_standardized_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 3).alias("p"),
        (F.col("event_id") % 5).alias("s"),
        F.when(F.col("event_type") == "error", 1).otherwise(0)
        .alias("hit"),
        F.lit(1).alias("expo"),
    )
    ref = ev.select("s").distinct().select(
        "s", (F.col("s") + 1).alias("w")
    )
    return ops_stats.standardized_rate(
        ev, ref, pop="p", stratum="s", hits="hit", exposure="expo"
    )
