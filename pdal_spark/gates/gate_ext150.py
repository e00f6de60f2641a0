"""Gate registry extension 150 — interval/box batch: IoU join
(brute-force oracle proves the grid candidate join lossless) and
merged-interval coverage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import overlay as ops_overlay
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# iou_join — two box sets hashed from events (coords mod 300 so
# the SMALLEST sf still yields overlapping pairs — the 0-rows trap)
# ---------------------------------------------------------------------------
_IOU_Q = ops_overlay.IOU_Q


def _box_sql(pred: str) -> str:
    x0 = f"CAST({G.lehmer2('event_id')} % 300 AS BIGINT)"
    y0 = f"CAST({G.lehmer2('event_id * 7 + 2')} % 300 AS BIGINT)"
    return f"""
      SELECT event_id AS bid,
             {x0} AS x0, {x0} + 5 + event_id % 20 AS x1,
             {y0} AS y0, {y0} + 5 + user_id % 15 AS y1
      FROM events WHERE {pred}
    """


def _box_df(spark, sf_dir, pred, idc) -> DataFrame:
    x0 = f"cast({G.lehmer2('event_id')} % 300 as bigint)"
    y0 = f"cast({G.lehmer2('event_id * 7 + 2')} % 300 as bigint)"
    return _t(spark, sf_dir, "events").where(pred).select(
        F.col("event_id").alias(idc),
        F.expr(x0).alias("x0"),
        F.expr(f"{x0} + 5 + event_id % 20").alias("x1"),
        F.expr(y0).alias("y0"),
        F.expr(f"{y0} + 5 + user_id % 15").alias("y1"),
    )


_IOU_MIN = 1 << 14  # ~0.016
_IOU_SQL = f"""
    WITH a AS MATERIALIZED ({_box_sql('event_id % 9 = 0')}),
    b AS MATERIALIZED ({_box_sql('event_id % 9 = 4')}),
    j AS (
      SELECT a.bid AS lid, b.bid AS rid,
             greatest(CAST(0 AS BIGINT),
               least(a.x1, b.x1) - greatest(a.x0, b.x0))
             * greatest(CAST(0 AS BIGINT),
               least(a.y1, b.y1) - greatest(a.y0, b.y0)) AS inter,
             (a.x1 - a.x0) * (a.y1 - a.y0)
             + (b.x1 - b.x0) * (b.y1 - b.y0) AS sum_areas
      FROM a JOIN b
        ON a.x0 <= b.x1 AND b.x0 <= a.x1
       AND a.y0 <= b.y1 AND b.y0 <= a.y1
    ),
    scored AS (
      SELECT lid, rid, inter,
             CAST(sum_areas - inter AS BIGINT) AS union_a,
             CAST(CASE WHEN sum_areas - inter > 0 THEN
               (inter * CAST({_IOU_Q} AS BIGINT))
               // (sum_areas - inter)
               ELSE 0 END AS BIGINT) AS iou_q
      FROM j
    )
    SELECT lid, rid, CAST(inter AS BIGINT) AS inter, union_a, iou_q
    FROM scored WHERE iou_q >= {_IOU_MIN}
"""


@gate("iou_join", _IOU_SQL)
def q_iou_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _box_df(spark, sf_dir, "event_id % 9 = 0", "lid")
    b = _box_df(spark, sf_dir, "event_id % 9 = 4", "rid")
    return ops_overlay.iou_join(
        a, b, cell=32.0, min_iou_q=_IOU_MIN
    )


# ---------------------------------------------------------------------------
# interval_coverage — per-user merged event intervals
# ---------------------------------------------------------------------------
_IC_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 20 AS k,
             CAST(event_id % 500 AS BIGINT) AS s,
             CAST(event_id % 500 + 1
               + CAST(floor(value / 50) AS BIGINT) AS BIGINT) AS e
      FROM events
    ),
    prev AS (
      SELECT k, s, e,
             max(e) OVER (PARTITION BY k ORDER BY s ASC, e ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pmax
      FROM s
    ),
    flagged AS (
      SELECT k, s, e,
             CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
               AS new_island
      FROM prev
    ),
    numbered AS (
      SELECT k, s, e,
             sum(new_island) OVER (PARTITION BY k
               ORDER BY s ASC, e ASC
               ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    islands AS (
      SELECT k, island, CAST(min(s) AS BIGINT) AS is_s,
             CAST(max(e) AS BIGINT) AS is_e,
             CAST(count(*) AS BIGINT) AS n_iv
      FROM numbered GROUP BY k, island
    )
    SELECT k, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(is_e - is_s) AS BIGINT) AS covered,
           CAST(max(is_e) - min(is_s) AS BIGINT) AS span
    FROM islands GROUP BY k
"""


@gate("interval_coverage", _IC_SQL)
def q_interval_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 20).alias("k"),
        F.expr("cast(event_id % 500 as bigint)").alias("s"),
        F.expr(
            "cast(event_id % 500 + 1"
            " + cast(floor(value / 50) as bigint) as bigint)"
        ).alias("e"),
    )
    return ops_temporal.interval_coverage(
        ev, key="k", start="s", end="e"
    )
