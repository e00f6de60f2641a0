"""Gate registry extension 61 — gdal_contour analog: marching-
squares iso-segments over the res-4 per-cell count lattice, oracled
with the SAME shared case/interpolation expressions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _points, _t, gate
from pdal_spark.gates.gate_ext37 import _FO_CELLS, _FO_RES
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster

_CT_ISO = 2.5


def _contour_sql() -> str:
    case_id, coords = ops_raster.contour_case_exprs(_CT_ISO)
    ixe, iye = G.qcell_deconstruct("c", G.DUCKDB)

    def cxy(s, ep, ax):
        return coords[(s, ep, ax)]

    def seg_col(ep, ax, name):
        return (
            f"round(CASE WHEN seg.seg_idx = 0"
            f" THEN ({cxy(0, ep, ax)})"
            f" ELSE ({cxy(1, ep, ax)}) END, 9) AS {name}"
        )

    return f"""
    WITH {_FO_CELLS},
    b AS MATERIALIZED (
      SELECT CAST(({ixe}) AS BIGINT) AS ix,
             CAST(({iye}) AS BIGINT) AS iy,
             xv % 7 AS v
      FROM cellv
    ),
    j AS (
      SELECT b.ix, b.iy, b.v AS v00, e.v AS v10, n.v AS v01,
             ne.v AS v11
      FROM b
      JOIN b e ON e.ix = b.ix + 1 AND e.iy = b.iy
      JOIN b n ON n.ix = b.ix AND n.iy = b.iy + 1
      JOIN b ne ON ne.ix = b.ix + 1 AND ne.iy = b.iy + 1
    ),
    cased AS (SELECT *, {case_id} AS case_id FROM j),
    seg AS (SELECT unnest([0, 1]) AS seg_idx)
    SELECT ix, iy, CAST(seg.seg_idx AS INT) AS seg_idx,
           {seg_col(1, 0, 'x1')}, {seg_col(1, 1, 'y1')},
           {seg_col(2, 0, 'x2')}, {seg_col(2, 1, 'y2')}
    FROM cased CROSS JOIN seg
    WHERE (CASE WHEN seg.seg_idx = 0 THEN ({cxy(0, 1, 0)})
           ELSE ({cxy(1, 1, 0)}) END) IS NOT NULL
    """


@gate("contour_segments", _contour_sql())
def q_contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    # height field = count % 7: SF-invariant straddling of the iso
    # (raw counts scale with SF and would leave iso outside range)
    cellv = (
        ops_h3.h3_encode(pts, "lat", "lon", res=_FO_RES, out="cell")
        .groupBy("cell")
        .agg((F.count(F.lit(1)) % 7).alias("x"))
    )
    return ops_raster.contour_segments(
        cellv, res=_FO_RES, iso=_CT_ISO
    )


# ---------------------------------------------------------------------------
# segment_radius_join — corridor query; brute-force oracle with the
# SAME integer predicate (candidate generation proven lossless).
# ---------------------------------------------------------------------------

from pdal_spark.gates.gate_ext54 import _SEG_X1, _SEG_Y1, _seg_src_sql  # noqa: E402

_SRJ_R = 8


def _srj_sql() -> str:
    return f"""
    WITH p AS MATERIALIZED (
      SELECT o_orderkey AS p_id,
             CAST({_SEG_X1} AS BIGINT) AS px,
             CAST({_SEG_Y1} AS BIGINT) AS py
      FROM orders WHERE o_orderkey % 10 = 1
    ),
    s AS MATERIALIZED ({_seg_src_sql(0, 'seg_id')})
    SELECT p.p_id, s.seg_id FROM p, s
    WHERE {G.point_segment_within_pred('p', 's', _SRJ_R)}
    """


@gate("segment_radius_join", _srj_sql())
def q_srj(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.gates.gate_ext54 import _seg_df
    from pdal_spark.operators.transform import segment_radius_join

    pts = _t(spark, sf_dir, "orders").where(
        "o_orderkey % 10 = 1"
    ).select(
        F.col("o_orderkey").alias("p_id"),
        F.expr(_SEG_X1).cast("long").alias("px"),
        F.expr(_SEG_Y1).cast("long").alias("py"),
    )
    return segment_radius_join(
        pts, _seg_df(spark, sf_dir, 0, "seg_id"),
        radius=_SRJ_R, cell=64,
    )
