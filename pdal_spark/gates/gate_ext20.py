"""Gate registry extension 20 — layout-planning & model-quality batch:
Morton scan-range planner (bbox -> minimal contiguous key ranges, the
read side of the Z-order clustering story), Newman degree
assortativity (integer-moment graph diagnostic), and the simplified
(centroid) silhouette over kmeans_exact labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark import sqlgen as G
from pdal_spark.gate import _CPTS, _cust_points, gate
from pdal_spark.gates.gate_ext4 import _KM_IT, _KM_K, _kmeans_sql
from pdal_spark.gates.gate_ext12 import _EDGES_SQL, _edges
from pdal_spark.operators import cluster as ops_cluster
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import h3 as ops_h3

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# degree_assortativity — integer moments over both edge orientations.
# ---------------------------------------------------------------------------

_DA_SQL = f"""
    WITH {_EDGES_SQL},
    both_e AS (SELECT lo, hi FROM e UNION ALL SELECT hi, lo FROM e),
    mom AS (
      SELECT count(*) AS m2, sum(du.degree) AS sx,
             sum(du.degree * dv.degree) AS sxy,
             sum(du.degree * du.degree) AS sxx
      FROM both_e
      JOIN deg du ON du.node = both_e.lo
      JOIN deg dv ON dv.node = both_e.hi
    )
    SELECT m2, sx, sxy, sxx,
           CASE WHEN m2 * sxx - sx * sx <> 0 THEN
             CAST(m2 * sxy - sx * sx AS DOUBLE)
               / CAST(m2 * sxx - sx * sx AS DOUBLE) END AS r
    FROM mom
"""


@gate("degree_assortativity", _DA_SQL)
def q_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return ops_graph.degree_assortativity(_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# morton_ranges — pure planner arithmetic, no table scan: both
# engines enumerate the same bbox cell grid and fold consecutive
# Morton keys with the same islands-and-gaps window.
# ---------------------------------------------------------------------------

_MR_BBOX = (-10.0, 25.0, 40.0, 61.0)  # lon0, lon1, lat0, lat1
_MR_RES = 7

_mr_ix0 = ops_h3._py_grid_index(_MR_BBOX[0], -180.0, 360.0, _MR_RES)
_mr_ix1 = ops_h3._py_grid_index(_MR_BBOX[1], -180.0, 360.0, _MR_RES)
_mr_iy0 = ops_h3._py_grid_index(_MR_BBOX[2], -90.0, 180.0, _MR_RES)
_mr_iy1 = ops_h3._py_grid_index(_MR_BBOX[3], -90.0, 180.0, _MR_RES)
_mr_nx = _mr_ix1 - _mr_ix0 + 1
_mr_n = _mr_nx * (_mr_iy1 - _mr_iy0 + 1)

_MR_SQL = f"""
    WITH grid AS (
      SELECT {_mr_ix0} + t.i % {_mr_nx} AS ix,
             {_mr_iy0} + t.i // {_mr_nx} AS iy
      FROM unnest(range({_mr_n})) AS t(i)
    ),
    coded AS (
      SELECT {G.morton_key('ix', 'iy', DK)} AS code FROM grid
    ),
    isl AS (
      SELECT code,
             code - row_number() OVER (ORDER BY code) AS g
      FROM coded
    )
    SELECT min(code) AS range_start, max(code) AS range_end,
           count(*) AS n_cells
    FROM isl GROUP BY g
"""


@gate("morton_ranges", _MR_SQL)
def q_morton_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    lon0, lon1, lat0, lat1 = _MR_BBOX
    return ops_h3.morton_ranges(
        spark, lon0, lon1, lat0, lat1, res=_MR_RES
    )


# ---------------------------------------------------------------------------
# silhouette — centroid silhouette over kmeans_exact labels; the
# oracle nests the full unrolled-kmeans SQL and recomputes the
# decimal-exact centroids from the labels, exactly like the engine.
# ---------------------------------------------------------------------------

_DEC = "decimal(38,15)"

_SIL_SQL = f"""
    WITH km AS MATERIALIZED (
      SELECT * FROM ({_kmeans_sql()}) t
    ),
    pts AS MATERIALIZED (
      SELECT c_custkey AS pid, lon AS px, lat AS py FROM {_CPTS} c
    ),
    lab AS MATERIALIZED (
      SELECT p.pid, p.px, p.py, km.cluster_id
      FROM pts p JOIN km ON km.c_custkey = p.pid
    ),
    cf AS MATERIALIZED (
      SELECT cluster_id,
             CAST(sum(CAST(px AS {_DEC})) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS cx,
             CAST(sum(CAST(py AS {_DEC})) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS cy
      FROM lab GROUP BY cluster_id
    ),
    av AS (
      SELECT l.pid, l.cluster_id,
             sqrt((l.px - c.cx) * (l.px - c.cx)
                  + (l.py - c.cy) * (l.py - c.cy)) AS a
      FROM lab l JOIN cf c ON c.cluster_id = l.cluster_id
    ),
    bv AS (
      SELECT l.pid,
             min(sqrt((l.px - c.cx) * (l.px - c.cx)
                      + (l.py - c.cy) * (l.py - c.cy))) AS b
      FROM lab l JOIN cf c ON c.cluster_id <> l.cluster_id
      GROUP BY l.pid
    )
    SELECT av.pid AS c_custkey, av.cluster_id,
           round((bv.b - av.a) / greatest(av.a, bv.b), 9) AS sil
    FROM av JOIN bv ON bv.pid = av.pid
"""
# round(9): the centroid means pass through double->decimal(38,15)
# casts, which Spark (shortest-repr) and DuckDB (exact binary) round
# differently in the 15th decimal on non-integer doubles (see verify
# notes) — a 1-ulp centroid wiggle that the LABELS (kmeans_exact
# gate) absorb but a float ratio output exposes.


@gate("silhouette", _SIL_SQL)
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.cluster import kmeans_exact

    pts = _cust_points(spark, sf_dir)
    labeled = kmeans_exact(
        pts, k=_KM_K, iters=_KM_IT, x="lon", y="lat",
        id_col="c_custkey",
    )
    out = ops_cluster.silhouette_simplified(
        labeled, x="lon", y="lat", label="cluster_id",
        id_col="c_custkey",
    )
    from pyspark.sql import functions as F

    return out.select(
        "c_custkey", "cluster_id", F.round("sil", 9).alias("sil")
    )

