"""Gate registry extension 66 — cohesive-subgraph + spatial-
autocorrelation batch: k-truss peeling (the triangle-support
analogue of kcore — link-farm detection on the crawl graph) and
global Geary's C (the pairwise-difference complement of morans_i).

Oracles: k_truss unrolls the same fixed number of peel rounds the
Spark loop runs (peeling is monotone, so early Spark convergence is
a no-op for the remaining SQL rounds — identical edge sets either
way, the kcore gate's convention); geary_c reuses morans_i's
integer-exact n-scaled deviations over the same queen-adjacency
lattice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, gate
from pdal_spark.gates.gate_ext12 import _KC_EDGES_SQL, _kc_edges
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import stats as ops_stats

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# k_truss — fixed-round edge peeling on the dense kcore fixture.
# Each SQL round recomputes per-edge triangle support (common
# neighbors via the shared-w adjacency self-join) and deletes
# under-supported edges, exactly the Spark loop's plan.
# ---------------------------------------------------------------------------

_KT_K = 4
_KT_ROUNDS = 6


def _ktruss_sql(k: int, rounds: int) -> str:
    need = k - 2
    parts = [f"WITH {_KC_EDGES_SQL}"]
    prev = "e"
    for i in range(1, rounds + 1):
        parts.append(f""",
    a{i} AS MATERIALIZED (
      SELECT lo AS u, hi AS w FROM {prev}
      UNION ALL SELECT hi, lo FROM {prev}
    ),
    s{i} AS MATERIALIZED (
      SELECT a1.u AS x, a2.u AS y, count(*) AS sup
      FROM a{i} a1 JOIN a{i} a2 ON a1.w = a2.w AND a1.u < a2.u
      GROUP BY 1, 2
    ),
    e{i} AS MATERIALIZED (
      SELECT p.lo, p.hi FROM {prev} p
      LEFT JOIN s{i} s ON s.x = p.lo AND s.y = p.hi
      WHERE coalesce(s.sup, 0) >= {need}
    )""")
        prev = f"e{i}"
    parts.append(f"""
    SELECT lo AS u, hi AS v FROM {prev}
    """)
    return "".join(parts)


@gate("ktruss", _ktruss_sql(_KT_K, _KT_ROUNDS))
def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.k_truss(
        _kc_edges(spark, sf_dir), k=_KT_K, max_rounds=_KT_ROUNDS
    )


# ---------------------------------------------------------------------------
# geary_c — per-cell event counts at res 4 (the morans_i lattice),
# queen adjacency, integer-exact (d_i - d_j)^2 numerator.
# ---------------------------------------------------------------------------

_GC_RES = 4

_GC_SQL = f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _GC_RES)} AS c,
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
             {G.qcell_neighbor('d.c', 'offs.dx', 'offs.dy', _GC_RES, DK)}
               AS nc
      FROM d, offs
      WHERE {G.qcell_neighbor_valid('d.c', 'offs.dy', _GC_RES, DK)}
    ),
    pairs AS (
      SELECT di.d AS di, dj.d AS dj
      FROM nbrs
      JOIN d dj ON dj.c = nbrs.nc
      JOIN d di ON di.c = nbrs.c
    ),
    numc AS (
      SELECT count(*) AS w_pairs,
             CAST(sum((di - dj) * (di - dj)) AS BIGINT) AS num2
      FROM pairs
    ),
    denc AS (
      SELECT max(n) AS n, CAST(sum(d * d) AS BIGINT) AS den FROM d
    )
    SELECT n, w_pairs, num2, den,
           CASE WHEN w_pairs > 0 AND den <> 0 THEN
             (CAST(n - 1 AS DOUBLE) * CAST(num2 AS DOUBLE))
               / (2.0 * CAST(w_pairs AS DOUBLE) * CAST(den AS DOUBLE)) END
             AS geary_c
    FROM denc, numc
"""


@gate("geary_c", _GC_SQL)
def q_geary_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    cellv = (
        ops_h3.h3_encode(pts, "lat", "lon", res=_GC_RES, out="cell")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return ops_stats.geary_c(cellv, res=_GC_RES, cell="cell", value="x")

