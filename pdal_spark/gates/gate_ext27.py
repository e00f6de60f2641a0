"""Gate registry extension 27 — spatial-statistics & layout-audit
batch: global Moran's I over the cell lattice (queen adjacency,
integer-exact moments), nearest-polyline snapping (map-matching
primitive), and the zone-map pruning simulator (min-max row-group
scan fractions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import transform as ops_transform
from pdal_spark.plans import bucketing as ops_bucketing

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# morans_i — per-cell event counts at res 4, queen adjacency.
# ---------------------------------------------------------------------------

_MI_RES = 4

_MI_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _MI_RES)} AS c,
             count(*) AS xv
      FROM {_PTS} GROUP BY 1
    ),
    mom AS (SELECT count(*) AS n, sum(xv) AS s FROM cellv),
    d AS MATERIALIZED (
      SELECT c, mom.n * xv - mom.s AS d, mom.n FROM cellv, mom
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)
      WHERE NOT (dx.dx = 0 AND dy.dy = 0)
    ),
    nbrs AS (
      SELECT d.c,
             {G.qcell_neighbor('d.c', 'offs.dx', 'offs.dy', _MI_RES, DK)}
               AS nc
      FROM d, offs
      WHERE {G.qcell_neighbor_valid('d.c', 'offs.dy', _MI_RES, DK)}
    ),
    pairs AS (
      SELECT di.d AS di, dj.d AS dj
      FROM nbrs
      JOIN d dj ON dj.c = nbrs.nc
      JOIN d di ON di.c = nbrs.c
    ),
    numc AS (
      SELECT count(*) AS w_pairs, sum(di * dj) AS num FROM pairs
    ),
    denc AS (SELECT max(n) AS n, sum(d * d) AS den FROM d)
    SELECT n, w_pairs, num, den,
           CASE WHEN w_pairs > 0 AND den <> 0 THEN
             (CAST(n AS DOUBLE) * CAST(num AS DOUBLE))
               / (CAST(w_pairs AS DOUBLE) * CAST(den AS DOUBLE)) END
             AS morans_i
    FROM denc, numc
"""


@gate("morans_i", _MI_SQL)
def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    cellv = (
        ops_h3.h3_encode(pts, "lat", "lon", res=_MI_RES, out="cell")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return ops_stats.morans_i(cellv, res=_MI_RES, cell="cell", value="x")


# ---------------------------------------------------------------------------
# snap_lines — three deterministic polylines, argmin snap.
# ---------------------------------------------------------------------------

_SNAP_MOD = 17
_SNAP_LINES = [
    (0, [(-120.0, -40.0), (-60.0, 10.0), (-20.0, -20.0)]),
    (1, [(0.0, 60.0), (40.0, 20.0), (80.0, 40.0), (120.0, 0.0)]),
    (2, [(140.0, -60.0), (170.0, -10.0)]),
]

_SNAP_D = {
    lid: G.polyline_segdist("lon", "lat", pts)
    for lid, pts in _SNAP_LINES
}
_SNAP_BEST = "least(" + ", ".join(
    _SNAP_D[i] for i in sorted(_SNAP_D)
) + ")"
_SNAP_ARG = "CASE" + "".join(
    f" WHEN {_SNAP_D[i]} = snap_dist THEN {i}" for i in sorted(_SNAP_D)
) + " END"

_SNAP_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT event_id, {G.geo_lat('event_id')} AS lat,
             {G.geo_lon('event_id')} AS lon
      FROM events WHERE event_id % {_SNAP_MOD} = 0
    ),
    s AS (
      SELECT event_id, lat, lon, {_SNAP_BEST} AS snap_dist FROM pts
    )
    SELECT event_id, {_SNAP_ARG} AS line_id, snap_dist
    FROM s
"""


@gate("snap_lines", _SNAP_SQL)
def q_snap_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _SNAP_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id")
    out = ops_transform.snap_to_lines(pts, _SNAP_LINES)
    return out.select("event_id", "line_id", "snap_dist")


# ---------------------------------------------------------------------------
# zonemap_prune — value-sorted layout, 256-row groups, range scan.
# ---------------------------------------------------------------------------

_ZP_G = 256
_ZP_LO, _ZP_HI = 100.0, 150.0

_ZP_SQL = f"""
    WITH ranked AS (
      SELECT value AS v,
             (row_number() OVER (ORDER BY value ASC, event_id ASC)
              - 1) // {_ZP_G} AS grp
      FROM events
    ),
    g AS (
      SELECT grp, min(v) AS mn, max(v) AS mx, count(*) AS rows
      FROM ranked GROUP BY grp
    ),
    agg AS (
      SELECT count(*) AS n_groups,
             sum(CASE WHEN NOT (mx < {G.fnum(_ZP_LO)}
                       OR mn > {G.fnum(_ZP_HI)})
                 THEN 1 ELSE 0 END) AS n_scanned,
             sum(CASE WHEN NOT (mx < {G.fnum(_ZP_LO)}
                       OR mn > {G.fnum(_ZP_HI)})
                 THEN rows ELSE 0 END) AS n_rows_scanned
      FROM g
    )
    SELECT n_groups, n_scanned, n_rows_scanned,
           ((n_groups - n_scanned) * {1 << 20}) // n_groups
             AS prune_frac_q
    FROM agg
"""


@gate("zonemap_prune", _ZP_SQL)
def q_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_bucketing.zonemap_prune_stats(
        ev, "value", "event_id", _ZP_G, _ZP_LO, _ZP_HI
    )

