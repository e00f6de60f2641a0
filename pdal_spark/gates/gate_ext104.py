"""Gate registry extension 104 — agreement/raster batch:
Krippendorff's alpha (missing-tolerant agreement), bilinear raster
sampling at points, focal curvature, zonal majority."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.operators import crop as ops_crop
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import stats as ops_stats

DK = G.DUCKDB


# ---------------------------------------------------------------------------
# krippendorff_alpha — 1..5 pseudo-raters per document (singleton
# items excluded by definition), 5 categories
# ---------------------------------------------------------------------------
_KA_CAT = f"({G.mix_hash('doc_id * 7 + r')} % 5)"
_KA_SQL = f"""
    WITH ratings AS MATERIALIZED (
      SELECT doc_id AS item, {_KA_CAT} AS cat
      FROM documents, (SELECT unnest(range(0, 5)) AS r) t
      WHERE r < doc_id % 5 + 1
    ),
    nij AS (
      SELECT item, cat, CAST(count(*) AS BIGINT) AS n_ij
      FROM ratings GROUP BY item, cat
    ),
    per AS (
      SELECT item, CAST(sum(n_ij) AS BIGINT) AS n_i,
             CAST(sum(n_ij * n_ij) AS BIGINT) AS sq_i
      FROM nij GROUP BY item HAVING sum(n_ij) >= 2
    ),
    do_t AS (
      SELECT CAST(sum(n_i) AS BIGINT) AS n_pairable,
             CAST(sum(((n_i * n_i - sq_i)
                       * CAST({ops_stats.KRIPP_Q} AS BIGINT))
                      // (n_i - 1)) AS BIGINT) AS do_q
      FROM per
    ),
    de_t AS (
      SELECT CAST(sum(n_c * (n_pairable - n_c)) AS BIGINT) AS de_sum
      FROM (
        SELECT cat, CAST(sum(n_ij) AS BIGINT) AS n_c
        FROM nij JOIN per USING (item) GROUP BY cat
      ) c, do_t
    )
    SELECT n_pairable, do_q, de_sum,
           1.0e0 - (cast(n_pairable as double) - 1.0e0)
             * cast(do_q as double)
             / (cast({ops_stats.KRIPP_Q} as double)
                * cast(de_sum as double)) AS alpha
    FROM do_t, de_t
"""


@gate("krippendorff_alpha", _KA_SQL)
def q_krippendorff_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ratings = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("r"),
    ).where("r < doc_id % 5 + 1").select(
        F.col("doc_id").alias("item"), F.expr(_KA_CAT).alias("cat")
    )
    return ops_stats.krippendorff_alpha(
        ratings, item="item", cat="cat"
    )


# ---------------------------------------------------------------------------
# bilinear_interp — sample a complete 50-wide integer lattice of
# hash values at lehmer-scattered subcell points
# ---------------------------------------------------------------------------
_BI_SUB = 1000
_BI_Z = f"({G.mix_hash('gx * 100 + gy')} % 1000)"
_BI_PX = f"({G.lehmer2('event_id')} % {49 * _BI_SUB})"
_BI_PY = f"({G.lehmer2('event_id * 3 + 1')} % {18 * _BI_SUB})"
_BI_SQL = f"""
    WITH cells AS MATERIALIZED (
      SELECT gx, gy, {_BI_Z} AS z
      FROM (SELECT DISTINCT event_id % 50 AS gx,
                   (event_id // 50) % 40 AS gy
            FROM events) g
    ),
    pts AS MATERIALIZED (
      SELECT event_id, {_BI_PX} AS px, {_BI_PY} AS py
      FROM events
    ),
    four AS (
      SELECT event_id, px, py,
             px // {_BI_SUB} + o.ox AS cx,
             py // {_BI_SUB} + o.oy AS cy,
             (CASE WHEN o.ox = 0 THEN {_BI_SUB} - px % {_BI_SUB}
                   ELSE px % {_BI_SUB} END)
             * (CASE WHEN o.oy = 0 THEN {_BI_SUB} - py % {_BI_SUB}
                     ELSE py % {_BI_SUB} END) AS w
      FROM pts, (VALUES (0, 0), (1, 0), (0, 1), (1, 1)) o(ox, oy)
    )
    SELECT event_id, px, py,
           CAST(sum(w * z) AS BIGINT) AS v_q,
           cast(sum(w * z) as double)
             / cast({_BI_SUB * _BI_SUB} as double) AS v
    FROM four JOIN cells ON cells.gx = four.cx AND cells.gy = four.cy
    GROUP BY event_id, px, py HAVING count(*) = 4
"""


@gate("bilinear_interp", _BI_SQL)
def q_bilinear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("gx"),
            ((F.col("event_id") / 50).cast("long") % 40).alias("gy"),
        )
        .distinct()
        .select("gx", "gy", F.expr(_BI_Z).alias("z"))
    )
    pts = ev.select(
        "event_id",
        F.expr(_BI_PX).alias("px"),
        F.expr(_BI_PY).alias("py"),
    )
    return ops_raster.bilinear_at_points(
        cells, pts, sub=_BI_SUB, cell_x="gx", cell_y="gy", value="z"
    )


# ---------------------------------------------------------------------------
# focal_curvature — second-derivative terms over res-4 cell counts
# (the focal_mean fixture)
# ---------------------------------------------------------------------------
_FC_RES = 4
_FC_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FC_RES)} AS c,
             CAST(count(*) AS BIGINT) AS xv
      FROM {_PTS} GROUP BY 1
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx),
           (VALUES (-1), (0), (1)) dy(dy)
    ),
    nbrs AS (
      SELECT cellv.c, offs.dx, offs.dy,
             {G.qcell_neighbor('cellv.c', 'offs.dx', 'offs.dy',
                               _FC_RES, DK)} AS nc
      FROM cellv, offs
      WHERE {G.qcell_neighbor_valid('cellv.c', 'offs.dy',
                                    _FC_RES, DK)}
    )
    SELECT nbrs.c AS cell,
           CAST(sum(CASE WHEN dx = 0 AND dy = 0 THEN -4 * v.xv
                    WHEN dx * dy = 0 THEN v.xv ELSE 0 END)
             AS BIGINT) AS lap4,
           CAST(sum(CASE WHEN dy = 0 AND dx <> 0 THEN v.xv
                    WHEN dx = 0 AND dy = 0 THEN -2 * v.xv
                    ELSE 0 END) AS BIGINT) AS dxx,
           CAST(sum(CASE WHEN dx = 0 AND dy <> 0 THEN v.xv
                    WHEN dx = 0 AND dy = 0 THEN -2 * v.xv
                    ELSE 0 END) AS BIGINT) AS dyy,
           CAST(sum(CASE WHEN dx * dy = 1 THEN v.xv
                    WHEN dx * dy = -1 THEN -v.xv ELSE 0 END)
             AS BIGINT) AS dxy4
    FROM nbrs JOIN cellv v ON v.c = nbrs.nc
    GROUP BY nbrs.c HAVING count(*) = 9
"""


@gate("focal_curvature", _FC_SQL)
def q_focal_curvature(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    cellv = (
        ops_h3.h3_encode(pts, "lat", "lon", res=_FC_RES, out="cell")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return ops_raster.focal_curvature(
        cellv, res=_FC_RES, cell="cell", value="x"
    )


# ---------------------------------------------------------------------------
# zonal_majority — dominant user cohort per 20-degree zone
# ---------------------------------------------------------------------------
_ZLAT = G.geo_lat("event_id")
_ZLON = G.geo_lon("event_id")
_ZMX = f"CAST(floor(({_ZLON}) * 1000.0 + 0.5) AS BIGINT)"
_ZMY = f"CAST(floor(({_ZLAT}) * 1000.0 + 0.5) AS BIGINT)"
_ZM_M = 1 << 20
_ZM_SQL = f"""
    WITH counts AS MATERIALIZED (
      SELECT (({_ZMX}) // 20000) * 1000 + (({_ZMY}) // 20000)
               AS zone,
             user_id % 7 AS cat,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    best AS (
      SELECT zone,
             CAST(max(n * CAST({_ZM_M} AS BIGINT)
                      + ({_ZM_M} - 1 - cat)) AS BIGINT) AS b,
             CAST(sum(n) AS BIGINT) AS n_zone
      FROM counts GROUP BY zone
    )
    SELECT zone, {_ZM_M} - 1 - (b % {_ZM_M}) AS majority,
           b // {_ZM_M} AS n_major, n_zone
    FROM best
"""


@gate("zonal_majority", _ZM_SQL)
def q_zonal_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    zoned = ev.select(
        F.expr(
            f"(({_ZMX.replace('//', 'div')}) div 20000) * 1000"
            f" + (({_ZMY.replace('//', 'div')}) div 20000)"
        ).alias("zone"),
        (F.col("user_id") % 7).alias("cat"),
    )
    return ops_crop.zonal_majority(zoned, zone="zone", cat="cat")
