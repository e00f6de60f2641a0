"""filters.overlay — first-match polygon attribute join.

Reference: filters/OverlayFilter.cpp:172-185 assigns to an existing
dimension the attribute of the FIRST polygon (in input order) that
contains the point (`break` on first hit); polygons are loaded once in
ready() (:94-156). Points in no polygon keep their prior value.

Spark shape: broadcast left join expressed as a vectorized pandas UDF
returning the first-match attribute + coalesce. The polygon table is
the small side; points never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdal_spark.functions import pip as _pip
from pdal_spark.functions import wkt as _wkt


def overlay(
    df: DataFrame,
    polygons: list[tuple[str, int]],
    column: str,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """polygons: [(wkt, attr_value), ...] in priority order.

    Sets ``column`` to the first containing polygon's value, else
    keeps the existing value (column must exist, as in PDAL; create
    it with ferry/assign first if needed).
    """
    parsed = [
        (_wkt.parse_polygon(w), int(v)) for w, v in polygons
    ]

    # Convex single-ring polygons take the pure-Catalyst half-plane
    # path (same predicate text as crop's fast path and the oracle —
    # whole-stage codegen, no Python); general polygons fall back to
    # the numpy ray-cast kernel. The when-chain preserves PDAL's
    # first-match priority across both kinds.
    from pdal_spark.operators.crop import (
        RAYCAST_MAX_EDGES, _ccw, _convex_pred, _raycast_expr,
    )

    def _poly_pred(rings):
        ring = _ccw(rings[0])
        if len(rings) == 1 and _wkt.is_convex_ccw(ring):
            return _convex_pred(ring, x, y)
        if sum(len(r) for r in rings) <= RAYCAST_MAX_EDGES:
            # concave/holed but bounded: the division-free Catalyst
            # ray cast (JVM, oracle-mirrorable) — same tiering as crop
            return F.expr(_raycast_expr(rings, x, y))

        @F.pandas_udf(T.BooleanType())
        def inside(xs: pd.Series, ys: pd.Series) -> pd.Series:
            return pd.Series(
                _pip.polygon_contains(
                    xs.to_numpy(np.float64), ys.to_numpy(np.float64),
                    rings,
                )
            )

        return inside(F.col(x), F.col(y))

    chain = None
    for rings, val in parsed:
        pred = _poly_pred(rings)
        chain = (
            F.when(pred, F.lit(val)) if chain is None
            else chain.when(pred, F.lit(val))
        )
    out = chain.otherwise(F.col(column).cast(T.LongType()))
    return df.withColumn(column, out)


def bbox_join(
    left: DataFrame,
    right: DataFrame,
    cell: float,
    id_left: str = "lid",
    id_right: str = "rid",
) -> DataFrame:
    """Rectangle-intersection join: all (lid, rid) whose CLOSED boxes
    (x0..x1, y0..y1) overlap — the bbox pre-join every vector-overlay
    pipeline runs before exact geometry tests (the 2-D generalization
    of temporal.interval_join; filters.overlay's bounds() pre-reject
    as a JOIN instead of a broadcast loop).

    Physical shape: each box explodes over the grid cells it covers
    (fan-out = box area in cells — pick ``cell`` near the median box
    size, from the metrics table's extent histogram); candidates meet
    by hash equi-join on the cell; the closed-interval predicate
    filters. Duplicate suppression WITHOUT a distinct: a pair reports
    only in the cell containing the intersection's min corner
    (responsibility assignment — the MapReduce spatial-join
    standard), so the join output is exactly the answer, no
    post-shuffle dedup.
    """
    c = float(cell)

    def cells(df: DataFrame, pre: str, idc: str) -> DataFrame:
        return (
            df.select(
                F.col(idc),
                F.col("x0").alias(f"{pre}x0"),
                F.col("x1").alias(f"{pre}x1"),
                F.col("y0").alias(f"{pre}y0"),
                F.col("y1").alias(f"{pre}y1"),
            )
            .withColumn(
                "jx",
                F.explode(
                    F.sequence(
                        F.floor(F.col(f"{pre}x0") / c).cast("long"),
                        F.floor(F.col(f"{pre}x1") / c).cast("long"),
                    )
                ),
            )
            .withColumn(
                "jy",
                F.explode(
                    F.sequence(
                        F.floor(F.col(f"{pre}y0") / c).cast("long"),
                        F.floor(F.col(f"{pre}y1") / c).cast("long"),
                    )
                ),
            )
        )
    lc = cells(left, "a", id_left)
    rc = cells(right, "b", id_right)
    j = lc.join(rc, on=["jx", "jy"])
    inter = (
        "ax0 <= bx1 AND bx0 <= ax1 AND ay0 <= by1 AND by0 <= ay1"
    )
    from pdal_spark.sqlgen import fnum

    resp = (
        f"jx = cast(floor(greatest(ax0, bx0) / {fnum(c)}) as bigint)"
        f" AND jy = cast(floor(greatest(ay0, by0) / {fnum(c)}) as bigint)"
    )
    return j.where(F.expr(inter)).where(F.expr(resp)).select(
        id_left, id_right
    )


def areal_interpolate(
    src: DataFrame,
    tgt: DataFrame,
    cell: float,
    value: str = "value_q",
    id_src: str = "sid",
    id_tgt: str = "tid",
) -> DataFrame:
    """Areal-weighted interpolation between two zone systems
    (Goodchild & Lam 1980 — THE zone-transfer primitive: redistribute
    counts published on one polygon system onto another): each source
    zone's integer value reallocates to target zones proportionally
    to rectangle overlap area. Zones are integer-quantized bboxes
    (id, x0, x1, y0, y1); source zones additionally carry an integer
    ``value``.

    allocated = (value * overlap_area) intdiv src_area per pair with
    POSITIVE overlap — exact int64 (conservative: truncation leaves
    a sub-unit remainder in the source zone, documented); output per
    target zone: n_src contributing zones + the allocated sum.

    Scale: rides :func:`bbox_join` (grid-cell responsibility join —
    pair volume tracks true overlaps); everything after is two hash
    joins on zone ids + one aggregate.
    """
    pairs = bbox_join(
        src.select(id_src, "x0", "x1", "y0", "y1"),
        tgt.select(id_tgt, "x0", "x1", "y0", "y1"),
        cell=cell, id_left=id_src, id_right=id_tgt,
    )
    sv = src.select(
        F.col(id_src),
        F.col("x0").alias("sx0"), F.col("x1").alias("sx1"),
        F.col("y0").alias("sy0"), F.col("y1").alias("sy1"),
        ((F.col("x1") - F.col("x0"))
         * (F.col("y1") - F.col("y0"))).alias("s_area"),
        F.col(value).alias("v"),
    ).where(F.col("s_area") > 0)
    tv = tgt.select(
        F.col(id_tgt),
        F.col("x0").alias("tx0"), F.col("x1").alias("tx1"),
        F.col("y0").alias("ty0"), F.col("y1").alias("ty1"),
    )
    j = pairs.join(sv, on=id_src).join(tv, on=id_tgt)
    ov = (
        F.least(F.col("sx1"), F.col("tx1"))
        - F.greatest(F.col("sx0"), F.col("tx0"))
    ) * (
        F.least(F.col("sy1"), F.col("ty1"))
        - F.greatest(F.col("sy0"), F.col("ty0"))
    )
    alloc = (
        j.withColumn("ov", ov)
        .where(F.col("ov") > 0)
        .select(
            id_tgt,
            F.expr("(v * ov) div s_area").alias("alloc"),
        )
    )
    return alloc.groupBy(id_tgt).agg(
        F.count(F.lit(1)).alias("n_src"),
        F.sum("alloc").alias("allocated_q"),
    )


IOU_Q = 1 << 20


def iou_join(
    left: DataFrame,
    right: DataFrame,
    cell: float,
    min_iou_q: int = 0,
    id_left: str = "lid",
    id_right: str = "rid",
) -> DataFrame:
    """Intersection-over-union join between two rectangle sets (the
    object-detection / label-dedup matcher; bbox_join's scored
    refinement): for every overlapping pair,

        iou_q = (inter_area * 2^20) div (area_a + area_b - inter)

    on integer coordinates (continuous area semantics — touching
    boxes score 0), keeping pairs with iou_q >= min_iou_q. Exact
    int64 throughout. Output: (lid, rid, inter, union_a, iou_q).

    Scale: candidate pairs ride :func:`bbox_join` (grid-cell
    responsibility join); two hash joins fetch the coordinates
    back; scoring is row-local. Bound: inter * 2^20 < 2^63 — keep
    box areas under ~8e12 cells.
    """
    pairs = bbox_join(left, right, cell, id_left, id_right)
    lcoords = left.select(
        F.col(id_left),
        F.col("x0").alias("ax0"), F.col("x1").alias("ax1"),
        F.col("y0").alias("ay0"), F.col("y1").alias("ay1"),
    )
    rcoords = right.select(
        F.col(id_right),
        F.col("x0").alias("bx0"), F.col("x1").alias("bx1"),
        F.col("y0").alias("by0"), F.col("y1").alias("by1"),
    )
    j = pairs.join(lcoords, on=id_left).join(rcoords, on=id_right)
    scored = j.select(
        id_left, id_right,
        F.expr(
            "greatest(cast(0 as bigint),"
            " least(ax1, bx1) - greatest(ax0, bx0))"
            " * greatest(cast(0 as bigint),"
            " least(ay1, by1) - greatest(ay0, by0))"
        ).alias("inter"),
        F.expr(
            "(ax1 - ax0) * (ay1 - ay0)"
            " + (bx1 - bx0) * (by1 - by0)"
        ).alias("sum_areas"),
    ).select(
        id_left, id_right, "inter",
        F.expr("sum_areas - inter").alias("union_a"),
        F.expr(
            f"case when sum_areas - inter > 0 then"
            f" (inter * cast({IOU_Q} as bigint))"
            " div (sum_areas - inter)"
            " else cast(0 as bigint) end"
        ).alias("iou_q"),
    )
    return scored.where(F.col("iou_q") >= int(min_iou_q))


def nms_boxes(
    boxes: DataFrame,
    k: int = 8,
    iou_thresh_q: int = IOU_Q // 5,
    id_col: str = "bid",
    score: str = "score",
) -> DataFrame:
    """Greedy non-maximum suppression over scored boxes (the
    detection-output deduplicator; iou_join's sequential consumer):
    repeatedly keep the highest-score box (ties to the smaller id)
    and drop every remaining box whose IoU with it EXCEEDS
    iou_thresh_q on the 2^20 grid. Integer coordinates and scores
    keep every comparison exact, so the selection order is
    bit-reproducible (the mmr_rerank discipline — the oracle
    carries the same k unrolled steps).

    Scale: NMS inputs must be BOUNDED (a detector's per-image /
    per-tile candidates, dozens-to-thousands) — bound first, or run
    per-cell via the tiling ops and NMS within cells. Each greedy
    step is one tiny argmax job with the picked box baked as plan
    literals. Output: (bid, sel_rank, score).
    """
    q = int(iou_thresh_q)
    base = boxes.select(
        F.col(id_col).alias("__id"),
        F.col(score).cast("long").alias("__s"),
        F.col("x0").cast("long").alias("x0"),
        F.col("x1").cast("long").alias("x1"),
        F.col("y0").cast("long").alias("y0"),
        F.col("y1").cast("long").alias("y1"),
    ).localCheckpoint(eager=True)
    out_rows: list[tuple] = []
    cur = base
    for rank in range(1, int(k) + 1):
        top = cur.orderBy(
            F.col("__s").desc(), F.col("__id").asc()
        ).limit(1).collect()
        if not top:
            break
        p = top[0]
        out_rows.append((int(p["__id"]), rank, int(p["__s"])))
        inter = (
            f"greatest(cast(0 as bigint),"
            f" least(x1, {int(p['x1'])})"
            f" - greatest(x0, {int(p['x0'])}))"
            f" * greatest(cast(0 as bigint),"
            f" least(y1, {int(p['y1'])})"
            f" - greatest(y0, {int(p['y0'])}))"
        )
        area_p = int(
            (p["x1"] - p["x0"]) * (p["y1"] - p["y0"])
        )
        uni = (
            f"((x1 - x0) * (y1 - y0) + {area_p} - ({inter}))"
        )
        cur = cur.where(
            F.expr(
                f"__id <> {int(p['__id'])} and not"
                f" (({uni}) > 0 and ({inter})"
                f" * cast({IOU_Q} as bigint) div ({uni}) > {q})"
            )
        ).localCheckpoint(eager=True)
    spark = boxes.sparkSession
    return spark.createDataFrame(
        out_rows, "bid long, sel_rank long, score long"
    )
