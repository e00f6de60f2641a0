"""Gate registry extension 151 — serial-greedy batch: box NMS and
greedy set cover, both with unrolled-step oracles (the mmr_rerank
discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import overlay as ops_overlay
from pdal_spark.operators import sampling as ops_sampling

_IOU_Q = ops_overlay.IOU_Q

# ---------------------------------------------------------------------------
# nms_boxes — k unrolled suppress rounds over hashed boxes
# ---------------------------------------------------------------------------
_NMS_K = 6
_NMS_T = _IOU_Q // 5
_NMS_PRED = "event_id % 9 = 0"
_NMS_X0 = f"CAST({G.lehmer2('event_id')} % 300 AS BIGINT)"
_NMS_Y0 = f"CAST({G.lehmer2('event_id * 7 + 2')} % 300 AS BIGINT)"
_NMS_S = f"CAST({G.lehmer2('event_id * 3 + 1')} % 1000 AS BIGINT)"


def _nms_sql(k: int) -> str:
    parts = [f"""
    WITH r0 AS MATERIALIZED (
      SELECT event_id AS bid, {_NMS_S} AS s,
             {_NMS_X0} AS x0, {_NMS_X0} + 20 + event_id % 30 AS x1,
             {_NMS_Y0} AS y0, {_NMS_Y0} + 20 + user_id % 25 AS y1
      FROM events WHERE {_NMS_PRED}
    )"""]
    for i in range(1, k + 1):
        pv = f"r{i - 1}"
        inter = (
            f"greatest(CAST(0 AS BIGINT), least(r.x1, p{i}.x1)"
            f" - greatest(r.x0, p{i}.x0))"
            f" * greatest(CAST(0 AS BIGINT), least(r.y1, p{i}.y1)"
            f" - greatest(r.y0, p{i}.y0))"
        )
        uni = (
            f"((r.x1 - r.x0) * (r.y1 - r.y0)"
            f" + (p{i}.x1 - p{i}.x0) * (p{i}.y1 - p{i}.y0)"
            f" - ({inter}))"
        )
        parts.append(f""",
    p{i} AS MATERIALIZED (
      SELECT * FROM {pv} ORDER BY s DESC, bid ASC LIMIT 1
    ),
    r{i} AS MATERIALIZED (
      SELECT r.* FROM {pv} r, p{i}
      WHERE r.bid <> p{i}.bid AND NOT (({uni}) > 0
        AND ({inter}) * CAST({_IOU_Q} AS BIGINT) // ({uni})
          > {_NMS_T})
    )""")
    sels = [
        f"SELECT bid, CAST({i} AS BIGINT) AS sel_rank,"
        f" s AS score FROM p{i}"
        for i in range(1, k + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(sels))
    return "".join(parts)


@gate("nms_boxes", _nms_sql(_NMS_K))
def q_nms_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    x0 = f"cast({G.lehmer2('event_id')} % 300 as bigint)"
    y0 = f"cast({G.lehmer2('event_id * 7 + 2')} % 300 as bigint)"
    s = f"cast({G.lehmer2('event_id * 3 + 1')} % 1000 as bigint)"
    boxes = _t(spark, sf_dir, "events").where(_NMS_PRED).select(
        F.col("event_id").alias("bid"),
        F.expr(s).alias("score"),
        F.expr(x0).alias("x0"),
        F.expr(f"{x0} + 20 + event_id % 30").alias("x1"),
        F.expr(y0).alias("y0"),
        F.expr(f"{y0} + 20 + user_id % 25").alias("y1"),
    )
    return ops_overlay.nms_boxes(
        boxes, k=_NMS_K, iou_thresh_q=_NMS_T
    )


# ---------------------------------------------------------------------------
# greedy_set_cover — k unrolled max-coverage rounds
# ---------------------------------------------------------------------------
_GSC_K = 5
_GSC_SET = "event_id % 40"
_GSC_ELEM = f"CAST({G.lehmer2('event_id * 5 + 3')} % 500 AS BIGINT)"


def _gsc_sql(k: int) -> str:
    parts = [f"""
    WITH base AS MATERIALIZED (
      SELECT DISTINCT {_GSC_SET} AS s, {_GSC_ELEM} AS e
      FROM events
    ),
    cur0 AS MATERIALIZED (SELECT * FROM base)"""]
    for i in range(1, k + 1):
        pv = f"cur{i - 1}"
        cov_parts = " UNION ".join(
            f"SELECT base.e FROM base, p{j}"
            f" WHERE base.s = p{j}.s"
            for j in range(1, i + 1)
        )
        parts.append(f""",
    p{i} AS MATERIALIZED (
      SELECT s, CAST(count(*) AS BIGINT) AS gain
      FROM {pv} GROUP BY s HAVING count(*) >= 1
      ORDER BY count(*) DESC, s ASC LIMIT 1
    ),
    cov{i} AS MATERIALIZED ({cov_parts}),
    cur{i} AS MATERIALIZED (
      SELECT base.* FROM base
      ANTI JOIN cov{i} ON base.e = cov{i}.e
    )""")
    sels = [
        f"SELECT CAST(s AS BIGINT) AS sid,"
        f" CAST({i} AS BIGINT) AS sel_rank, gain FROM p{i}"
        for i in range(1, k + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(sels))
    return "".join(parts)


@gate("greedy_set_cover", _gsc_sql(_GSC_K))
def q_greedy_set_cover(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    elem = f"cast({G.lehmer2('event_id * 5 + 3')} % 500 as bigint)"
    pairs = _t(spark, sf_dir, "events").select(
        F.expr(_GSC_SET).alias("s"), F.expr(elem).alias("e")
    )
    return ops_sampling.greedy_set_cover(
        pairs, k=_GSC_K, set_col="s", elem_col="e"
    )
