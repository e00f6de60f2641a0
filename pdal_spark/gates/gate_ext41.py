"""Gate registry extension 41 — weighted authority & join-planning
batch: edge-weighted integer PageRank (multi-link domains pass more
authority) and the radius-join cardinality estimator (the planner
query that prices a spatial join before paying it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext12 import _GM, _GN
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import knn as ops_knn

# ---------------------------------------------------------------------------
# weighted_pagerank — multiplicity-weighted edges over the graph
# fixture; oracle unrolls the identical truncating iterations.
# ---------------------------------------------------------------------------

_WP_ITERS = 3
_WP_SCALE = 10**12


def _wedges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.where(F.col("event_id") % _GM == 0).select(
        (F.col("event_id") % _GN).alias("src"),
        (F.expr(G.lehmer2("event_id")) % _GN).alias("dst"),
        ((F.col("event_id") % 5) + 1).alias("w"),
    )


def _wpr_sql(iters: int, scale: int) -> str:
    tele = (scale * 15) // 100
    parts = [f"""
    WITH raw AS MATERIALIZED (
      SELECT (event_id % {_GN}) AS src,
             ({G.lehmer2('event_id')} % {_GN}) AS dst,
             (event_id % 5) + 1 AS w
      FROM events WHERE event_id % {_GM} = 0
    ),
    e AS MATERIALIZED (
      SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM raw
      WHERE src <> dst GROUP BY src, dst
    ),
    tw AS MATERIALIZED (
      SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM e GROUP BY src
    ),
    n AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION SELECT dst FROM e
      ) u
    ),
    r0 AS MATERIALIZED (
      SELECT node, CAST({scale} AS BIGINT) AS r FROM n
    )"""]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(f""",
    r{i} AS MATERIALIZED (
      SELECT n.node,
             CAST({tele} AS BIGINT) + coalesce(s.in_r, 0) AS r
      FROM n LEFT JOIN (
        SELECT e.dst AS node,
               CAST(sum((p.r * 85 * e.w)
                 // (CAST(100 AS BIGINT) * tw.tw)) AS BIGINT) AS in_r
        FROM e JOIN tw ON tw.src = e.src
               JOIN {prev} p ON p.node = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )""")
        prev = f"r{i}"
    parts.append(f"""
    SELECT node, r AS wpr FROM {prev}
    """)
    return "".join(parts)


@gate("weighted_pagerank", _wpr_sql(_WP_ITERS, _WP_SCALE))
def q_weighted_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.weighted_pagerank(
        _wedges(spark, sf_dir), iters=_WP_ITERS, scale=_WP_SCALE
    )


# ---------------------------------------------------------------------------
# spatial_join_estimate — price the radius join between two subsets.
# ---------------------------------------------------------------------------

_SJ_LM, _SJ_RM = 3, 7
_SJ_R = 5.0


def _sj_hist(mod: int, tag: str) -> str:
    lat, lon = G.geo_lat("event_id"), G.geo_lon("event_id")
    return f"""
      SELECT CAST(floor({lon} / {G.fnum(_SJ_R)}) AS BIGINT) AS cx,
             CAST(floor({lat} / {G.fnum(_SJ_R)}) AS BIGINT) AS cy,
             count(*) AS n_{tag}
      FROM events WHERE event_id % {mod} = 0 GROUP BY 1, 2
    """


_SJ_SQL = f"""
    WITH hl AS MATERIALIZED ({_sj_hist(_SJ_LM, 'l')}),
    hr0 AS MATERIALIZED ({_sj_hist(_SJ_RM, 'r')}),
    hr AS (
      SELECT hr0.cx + dx.dx AS cx, hr0.cy + dy.dy AS cy,
             CAST(sum(n_r) AS BIGINT) AS nbr_r
      FROM hr0, (VALUES (-1), (0), (1)) dx(dx),
                (VALUES (-1), (0), (1)) dy(dy)
      GROUP BY 1, 2
    ),
    per AS (
      SELECT hl.cx, hl.cy, hl.n_l * hr.nbr_r AS pairs
      FROM hl JOIN hr ON hr.cx = hl.cx AND hr.cy = hl.cy
    )
    SELECT count(*) AS n_cells_l,
           CAST(sum(pairs) AS BIGINT) AS candidates,
           CAST(max(pairs) AS BIGINT) AS hot_cell_pairs
    FROM per
"""


@gate("spatial_join_estimate", _SJ_SQL)
def q_spatial_join_estimate(spark: SparkSession, sf_dir: str
                            ) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    l = ops_h3.geocode(ev.where(F.col("event_id") % _SJ_LM == 0),
                       "event_id")
    r = ops_h3.geocode(ev.where(F.col("event_id") % _SJ_RM == 0),
                       "event_id")
    return ops_knn.spatial_join_estimate(l, r, _SJ_R)


# ---------------------------------------------------------------------------
# focal_minmax — erosion/dilation over res-4 per-cell counts.
# ---------------------------------------------------------------------------

_FX_RES = 4

from pdal_spark.gate import _PTS  # noqa: E402

_FX_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FX_RES)} AS c, count(*) AS xv
      FROM {_PTS} GROUP BY 1
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)
    ),
    nbrs AS (
      SELECT cellv.c,
             {G.qcell_neighbor('cellv.c', 'offs.dx', 'offs.dy',
                               _FX_RES, G.DUCKDB)} AS nc
      FROM cellv, offs
      WHERE {G.qcell_neighbor_valid('cellv.c', 'offs.dy', _FX_RES,
                                    G.DUCKDB)}
    )
    SELECT nbrs.c AS cell, min(v.xv) AS eroded, max(v.xv) AS dilated
    FROM nbrs JOIN cellv v ON v.c = nbrs.nc
    GROUP BY nbrs.c
"""


@gate("focal_minmax", _FX_SQL)
def q_focal_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.gate import _points
    from pdal_spark.operators import raster as ops_raster

    pts = _points(spark, sf_dir)
    cellv = (
        ops_h3.h3_encode(pts, "lat", "lon", res=_FX_RES, out="cell")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("x"))
    )
    return ops_raster.focal_minmax(cellv, res=_FX_RES, cell="cell",
                                   value="x")

