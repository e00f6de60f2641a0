"""Gate registry extension 179 — hydrograph batch: double-mass
consistency and flow-duration order statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_DM_X = "CAST(floor(value) AS BIGINT)"
_DM_R = f"(CAST(floor(value) AS BIGINT) + CAST({G.lehmer2('event_id')} % 9 AS BIGINT))"
_DM_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, {_DM_X} AS x, {_DM_R} AS r
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY o ASC) AS BIGINT)
               AS tt,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(sum(x) OVER () AS BIGINT) AS sx,
             CAST(sum(r) OVER () AS BIGINT) AS sr,
             CAST(sum(x) OVER (ORDER BY o ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cx,
             CAST(sum(r) OVER (ORDER BY o ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cr
      FROM s
    ),
    dev AS MATERIALIZED (
      SELECT tt, n, sx, sr,
             CAST(cx * sr - cr * sx AS BIGINT) AS dev
      FROM base
    ),
    mx AS (SELECT CAST(max(abs(dev)) AS BIGINT) AS max_abs_dev
           FROM dev)
    SELECT n, sx AS s_x, sr AS s_ref,
           CAST(min(tt) AS BIGINT) AS t_star, max_abs_dev
    FROM dev, mx WHERE abs(dev.dev) = mx.max_abs_dev
    GROUP BY n, sx, sr, max_abs_dev
"""


@gate("double_mass", _DM_SQL)
def q_double_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("x"),
        F.expr(
            f"cast(floor(value) as bigint)"
            f" + cast({G.lehmer2('event_id')} % 9 as bigint)"
        ).alias("r"),
    )
    return ops_temporal.double_mass(
        ev, order="o", value="x", ref="r"
    )


_FD_PCTS = [5, 50, 95]
_FD_SQL = f"""
    WITH base AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS v,
             CAST(row_number() OVER (ORDER BY floor(value) DESC,
               event_id ASC) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM events
    ),
    ladder AS (
      SELECT v, rn, CAST(t.p AS BIGINT) AS p
      FROM base,
           (SELECT unnest([{", ".join(map(str, _FD_PCTS))}]) AS p)
             t
      WHERE rn = (t.p * n + 99) // 100
    )
    SELECT p, rn AS rank_pick, v AS q_value FROM ladder
"""


@gate("flow_duration", _FD_SQL)
def q_flow_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    return ops_temporal.flow_duration(
        ev, value="v", exceed_pcts=_FD_PCTS
    )
