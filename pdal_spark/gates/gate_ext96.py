"""Gate registry extension 96 — point-pattern statistics: standard
deviational ellipse, quadrat VMR, Clark-Evans NN index, hull
diameter, Geary's C, join-count statistics (operators.pointpattern).

All coordinates ride the deterministic millidegree grid, so every
moment / count / squared difference is exact int64 on both engines;
float outputs are fixed IEEE chains; theta rounds(6) (trig).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import pointpattern as ops_pp

_LAT = G.geo_lat("event_id")
_LON = G.geo_lon("event_id")

# exact integer millidegrees (coords are k/1000 on the synth grid)
_MD = "CAST(floor(({v}) * 1000.0 + 0.5) AS BIGINT)"

_PTS_MD = f"""
  (SELECT event_id,
          {_MD.format(v=_LON)} AS mx,
          {_MD.format(v=_LAT)} AS my
   FROM events)
"""

# ---------------------------------------------------------------------------
# sd_ellipse — standard deviational ellipse (one-row moment summary)
# ---------------------------------------------------------------------------
_ND = "CAST(n AS DOUBLE)"
_CXX = (
    f"(CAST(sxx AS DOUBLE) / {_ND}"
    f" - (CAST(sx AS DOUBLE) / {_ND}) * (CAST(sx AS DOUBLE) / {_ND}))"
)
_CYY = (
    f"(CAST(syy AS DOUBLE) / {_ND}"
    f" - (CAST(sy AS DOUBLE) / {_ND}) * (CAST(sy AS DOUBLE) / {_ND}))"
)
_CXY = (
    f"(CAST(sxy AS DOUBLE) / {_ND}"
    f" - (CAST(sx AS DOUBLE) / {_ND}) * (CAST(sy AS DOUBLE) / {_ND}))"
)
_TR = f"({_CXX} + {_CYY})"
_DD = (
    f"sqrt(({_CXX} - {_CYY}) * ({_CXX} - {_CYY})"
    f" + 4.0 * {_CXY} * {_CXY})"
)

_SDE_SQL = f"""
    WITH agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(mx) AS BIGINT) AS sx,
             CAST(sum(my) AS BIGINT) AS sy,
             CAST(sum(mx * mx) AS BIGINT) AS sxx,
             CAST(sum(my * my) AS BIGINT) AS syy,
             CAST(sum(mx * my) AS BIGINT) AS sxy
      FROM {_PTS_MD} p
    )
    SELECT n, sx, sy, sxx, syy, sxy,
           sqrt(({_TR} + {_DD}) / 2.0) AS sig1,
           sqrt(greatest(({_TR} - {_DD}) / 2.0, 0.0)) AS sig2,
           round(0.5 * atan2(2.0 * {_CXY}, {_CXX} - {_CYY}), 6)
             AS theta_r
    FROM agg
"""


@gate("sd_ellipse", _SDE_SQL)
def q_sd_ellipse(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    return ops_pp.sd_ellipse(pts, x="lon", y="lat")


# ---------------------------------------------------------------------------
# quadrat_vmr — variance-to-mean dispersion over the bbox grid
# ---------------------------------------------------------------------------
_QD_RES = 5

_QD_SQL = f"""
    WITH cells AS (
      SELECT {G.qcell_ix(_LON, _QD_RES)} AS ix,
             {G.qcell_iy(_LAT, _QD_RES)} AS iy,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_points,
             CAST(sum(c * c) AS BIGINT) AS sum_c2,
             CAST(count(*) AS BIGINT) AS n_occupied,
             CAST(max(ix) - min(ix) + 1 AS BIGINT) AS span_x,
             CAST(max(iy) - min(iy) + 1 AS BIGINT) AS span_y
      FROM cells
    )
    SELECT CAST(span_x * span_y AS BIGINT) AS n_cells,
           n_points, n_occupied, sum_c2,
           (CAST(sum_c2 AS DOUBLE) / CAST(span_x * span_y AS DOUBLE)
            - (CAST(n_points AS DOUBLE)
               / CAST(span_x * span_y AS DOUBLE))
              * (CAST(n_points AS DOUBLE)
                 / CAST(span_x * span_y AS DOUBLE)))
           / (CAST(n_points AS DOUBLE)
              / CAST(span_x * span_y AS DOUBLE)) AS vmr
    FROM agg
"""


@gate("quadrat_vmr", _QD_SQL)
def q_quadrat_vmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    return ops_pp.quadrat_stats(pts, x="lon", y="lat", res=_QD_RES)


# ---------------------------------------------------------------------------
# clark_evans — NN index on the mod-53 subset (brute-force oracle;
# the engine path is the exact supercell knn_join kernel)
# ---------------------------------------------------------------------------
_CE_MOD = 53

_CE_SQL = f"""
    WITH sub AS MATERIALIZED (
      SELECT event_id, mx, my FROM {_PTS_MD} p
      WHERE event_id % {_CE_MOD} = 0
    ),
    nn AS (
      SELECT a.event_id,
             min((a.mx - b.mx) * (a.mx - b.mx)
                 + (a.my - b.my) * (a.my - b.my)) AS d2
      FROM sub a JOIN sub b ON a.event_id <> b.event_id
      GROUP BY a.event_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(sqrt(CAST(d2 AS DOUBLE)) * 1000000.0
                                 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_nnd_um
      FROM nn
    ),
    bb AS (
      SELECT CAST((max(mx) - min(mx)) * (max(my) - min(my)) AS BIGINT)
               AS area_md2
      FROM sub
    )
    SELECT n, sum_nnd_um, area_md2,
           (CAST(sum_nnd_um AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE))
           / (0.5 * sqrt(CAST(area_md2 AS DOUBLE) / CAST(n AS DOUBLE)))
             AS ce_index
    FROM s, bb
"""


@gate("clark_evans", _CE_SQL)
def q_clark_evans(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _CE_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id")
    return ops_pp.clark_evans(
        pts, x="lon", y="lat", id_col="event_id", cell=10000.0
    )


# ---------------------------------------------------------------------------
# hull_diameter — farthest hull-vertex pair (rotating-calipers
# quantity), exact on the 2^-20-degree grid; hull CTE = the strict
# left-edge test (same construction the convex_hull gate pins)
# ---------------------------------------------------------------------------
_HD_MOD = 53
_HD_Q = 1 << 20

_HD_SQL = f"""
    WITH sub AS MATERIALIZED (
      SELECT DISTINCT
        CAST(floor(lon * {_HD_Q}) AS BIGINT) AS qx,
        CAST(floor(lat * {_HD_Q}) AS BIGINT) AS qy
      FROM (SELECT {_LAT} AS lat, {_LON} AS lon
            FROM events WHERE event_id % {_HD_MOD} = 0) g
    ),
    chk AS (
      SELECT p.qx AS px, p.qy AS py, q.qx AS ex, q.qy AS ey,
             min(CASE WHEN (q.qx - p.qx) * (r.qy - p.qy)
                 - (q.qy - p.qy) * (r.qx - p.qx) > 0
                 OR ((q.qx - p.qx) * (r.qy - p.qy)
                     - (q.qy - p.qy) * (r.qx - p.qx) = 0
                     AND (q.qx - p.qx) * (r.qx - p.qx)
                         + (q.qy - p.qy) * (r.qy - p.qy) > 0)
                 THEN 1 ELSE 0 END) AS mc
      FROM sub p
      JOIN sub q ON NOT (q.qx = p.qx AND q.qy = p.qy)
      JOIN sub r ON NOT (r.qx = p.qx AND r.qy = p.qy)
               AND NOT (r.qx = q.qx AND r.qy = q.qy)
      GROUP BY 1, 2, 3, 4
    ),
    hull AS (SELECT DISTINCT px AS qx, py AS qy FROM chk WHERE mc = 1)
    SELECT a.qx AS ax, a.qy AS ay, b.qx AS bx, b.qy AS by,
           (a.qx - b.qx) * (a.qx - b.qx)
           + (a.qy - b.qy) * (a.qy - b.qy) AS diam2
    FROM hull a JOIN hull b
      ON (a.qx < b.qx) OR (a.qx = b.qx AND a.qy < b.qy)
    ORDER BY diam2 DESC, ax, ay, bx, by
    LIMIT 1
"""


@gate("hull_diameter", _HD_SQL)
def q_hull_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _HD_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id")
    return ops_pp.hull_diameter(pts, x="lon", y="lat", quant=_HD_Q)


# ---------------------------------------------------------------------------
# join_counts — binary-mark lattice autocorrelation over occupied
# rook-adjacent qcells (adjacency = UNION ALL of right + up joins;
# the count-valued Geary/Moran forms live in operators.stats)
# ---------------------------------------------------------------------------
_GC_RES = 5

_CELLS = f"""
  (SELECT {G.qcell_ix(_LON, _GC_RES)} AS ix,
          {G.qcell_iy(_LAT, _GC_RES)} AS iy,
          count(*) AS c
   FROM events GROUP BY 1, 2)
"""

_JC_T = 2

_JC_CELLS = f"""
  (SELECT ix, iy, CASE WHEN c >= {_JC_T} THEN 1 ELSE 0 END AS c
   FROM {_CELLS} raw)
"""

_JC_ADJ = f"""
  (SELECT a.c AS ca, b.c AS cb
   FROM {_JC_CELLS} a JOIN {_JC_CELLS} b
     ON b.ix = a.ix + 1 AND b.iy = a.iy
   UNION ALL
   SELECT a.c AS ca, b.c AS cb
   FROM {_JC_CELLS} a JOIN {_JC_CELLS} b
     ON b.ix = a.ix AND b.iy = a.iy + 1)
"""

_JC_SQL = f"""
    WITH base AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_black,
             CAST(sum(1 - c) AS BIGINT) AS n_white
      FROM {_JC_CELLS} cells
    ),
    pr AS (
      SELECT CAST(sum(ca * cb) AS BIGINT) AS bb,
             CAST(sum((1 - ca) * (1 - cb)) AS BIGINT) AS ww,
             CAST(sum(ca * (1 - cb) + (1 - ca) * cb) AS BIGINT) AS bw
      FROM {_JC_ADJ} adj
    )
    SELECT n_black, n_white, bb, ww, bw FROM base, pr
"""


@gate("join_counts", _JC_SQL)
def q_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    return ops_pp.join_counts(
        pts, x="lon", y="lat", res=_GC_RES, threshold=_JC_T
    )
