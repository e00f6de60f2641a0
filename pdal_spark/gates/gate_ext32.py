"""Gate registry extension 32 — as-of direction completion: forward
and nearest matches (merge_asof's full direction set; backward is the
long-standing `asof_join` gate). Oracles run the identical union-
trick windows in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate

_ASOF_U = """
    r AS MATERIALIZED (
      SELECT user_id, ts AS rts, max(event_id) AS view_id,
             max(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    l AS (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'click'),
    u AS (
      SELECT user_id, epoch_us(ts) AS tus, 1 AS side,
             CAST(NULL AS BIGINT) AS rtus, event_id, ts
      FROM l
      UNION ALL
      SELECT user_id, epoch_us(rts), 0, epoch_us(rts), NULL, NULL
      FROM r
    )
"""

_ASOF_TAIL = """
    SELECT m.user_id, m.event_id, m.ts, r.rts AS ts_r,
           r.view_id AS view_id_r, r.view_value AS view_value_r
    FROM m LEFT JOIN r
      ON m.user_id = r.user_id AND m.mts = epoch_us(r.rts)
    WHERE m.side = 1
"""


def _clicks_views(spark: SparkSession, sf_dir: str):
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts"),
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
    )
    return clicks, views


# ---------------------------------------------------------------------------
# asof_forward — earliest view at or after each click.
# ---------------------------------------------------------------------------

_AF_SQL = f"""
    WITH {_ASOF_U},
    m AS (
      SELECT *, min(rtus) OVER (
        PARTITION BY user_id ORDER BY tus DESC, side ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mts
      FROM u
    )
    {_ASOF_TAIL}
"""


@gate("asof_forward", _AF_SQL)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.temporal import asof_join

    clicks, views = _clicks_views(spark, sf_dir)
    return asof_join(
        clicks, views, on="user_id", ts="ts", direction="forward"
    )


# ---------------------------------------------------------------------------
# asof_nearest — closer of the two, ties to backward.
# ---------------------------------------------------------------------------

_AN_SQL = f"""
    WITH {_ASOF_U},
    m0 AS (
      SELECT *,
        max(rtus) OVER (
          PARTITION BY user_id ORDER BY tus ASC, side ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mb,
        min(rtus) OVER (
          PARTITION BY user_id ORDER BY tus DESC, side ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mf
      FROM u
    ),
    m AS (
      SELECT * EXCLUDE (mb, mf),
        CASE WHEN mb IS NULL THEN mf
             WHEN mf IS NULL THEN mb
             WHEN mf - tus < tus - mb THEN mf
             ELSE mb END AS mts
      FROM m0
    )
    {_ASOF_TAIL}
"""


@gate("asof_nearest", _AN_SQL)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.temporal import asof_join

    clicks, views = _clicks_views(spark, sf_dir)
    return asof_join(
        clicks, views, on="user_id", ts="ts", direction="nearest"
    )

