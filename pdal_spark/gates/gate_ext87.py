"""Gate registry extension 87 — pattern-detection + routing-artifact
batch: Hough line voting (shared Python-computed trig literals — no
engine trig compared), the least-cost predecessor tree (optimality-
equation re-check over the unrolled-relaxation distances), and the
dHash gradient perceptual hash (the aHash pixel-path oracle with a
9-wide thumbnail and left<right bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_cells
from pdal_spark.gates.gate_ext85 import _cd_sql
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import multimodal as ops_mm
from pdal_spark.operators import raster as ops_raster

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# hough_lines — over the geocoded points.
# ---------------------------------------------------------------------------

_HG_K = 16
_HG_RBIN = 1 << 21
_HG_Q = 1 << 10
_HG_TOP = 25


def _hg_sql() -> str:
    rows = ", ".join(
        f"({k}, {c}, {s})" for k, c, s in
        ops_h3.hough_theta_table(_HG_K)
    )
    sh = ops_h3.HOUGH_RSHIFT
    return f"""
    WITH th(k, cq, sq) AS (VALUES {rows}),
    pts AS MATERIALIZED (
      SELECT CAST(floor(({G.geo_lon('event_id')}) * {_HG_Q})
                  AS BIGINT) AS xq,
             CAST(floor(({G.geo_lat('event_id')}) * {_HG_Q})
                  AS BIGINT) AS yq
      FROM events
    ),
    votes AS (
      SELECT th.k AS theta_k,
             (pts.xq * th.cq + pts.yq * th.sq + {sh})
               // {_HG_RBIN} AS rho_bin
      FROM pts, th
    )
    SELECT CAST(theta_k AS INT) AS theta_k,
           CAST(rho_bin AS BIGINT) AS rho_bin,
           count(*) AS votes
    FROM votes GROUP BY 1, 2
    ORDER BY votes DESC, theta_k ASC, rho_bin ASC
    LIMIT {_HG_TOP}
"""


@gate("hough_lines", _hg_sql())
def q_hough_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_h3.hough_lines(
        pts, n_thetas=_HG_K, rho_bin_q=_HG_RBIN, coord_q=_HG_Q,
        top_n=_HG_TOP,
    )


# ---------------------------------------------------------------------------
# cost_path_tree — single source, pred re-derived from the unrolled
# relaxation distances by the optimality equation.
# ---------------------------------------------------------------------------

_CP_ROUNDS = 24
_CP_SOURCE = int(eval(G.qcell_pack("8", "8", _FD_RES)))


def _cp_sql() -> str:
    # reuse the cost_distance CTE chain with ONE source, then append
    # the predecessor stage (cellv/e CTEs are in scope).
    base = _cd_sql(_CP_ROUNDS)
    head, _, tail = base.rpartition("SELECT seed, node AS cell, dist")
    assert tail is not None
    srcs_single = f"({_CP_SOURCE})"
    # swap the two-source VALUES for the single source
    import re

    head = re.sub(r"FROM \(VALUES \([0-9]+\), \([0-9]+\)\) s\(s\)",
                  f"FROM (VALUES {srcs_single}) s(s)", head)
    return head + f"""
    , dfin AS MATERIALIZED (
      SELECT node AS c, dist FROM d{_CP_ROUNDS}
    ),
    cand AS (
      SELECT e.v, e.u, row_number() OVER (
               PARTITION BY e.v ORDER BY e.u ASC
             ) AS rn
      FROM e
      JOIN dfin du ON du.c = e.u
      JOIN dfin dv ON dv.c = e.v
      WHERE du.dist + e.w = dv.dist
    )
    SELECT d.c AS cell, d.dist, cand.u AS pred
    FROM dfin d LEFT JOIN cand ON cand.v = d.c AND cand.rn = 1
    """


@gate("cost_path_tree", _cp_sql())
def q_cost_path_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.cost_path_tree(
        _fd_cells(spark, sf_dir), res=_FD_RES, source=_CP_SOURCE,
        cell="cell", value="x", rounds=_CP_ROUNDS,
    )


# ---------------------------------------------------------------------------
# image_dhash — 9x8 thumbnail, left<right gradient bits.
# ---------------------------------------------------------------------------

_DH_SQL = """
    WITH g8 AS (SELECT unnest(range(8)) AS i),
    g9 AS (SELECT unnest(range(9)) AS j),
    docs AS (SELECT doc_id, text, len(text) AS n,
                    len(text) % 640 + 1 AS w, len(text) % 480 + 1 AS h
             FROM documents),
    samp AS (
      SELECT doc_id, i, j,
             ascii(substr(text,
               CAST(((((i * h) // 8) * w + ((j * w) // 9)) * 3) % n
                    AS BIGINT) + 1, 1)) AS v
      FROM docs, g8, g9
    ),
    bits AS (
      SELECT a.doc_id, a.i * 8 + a.j AS k,
             CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS b
      FROM samp a JOIN samp b
        ON b.doc_id = a.doc_id AND b.i = a.i AND b.j = a.j + 1
      WHERE a.j < 8
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN k < 32 THEN b << (31 - k)
                    ELSE 0 END) AS BIGINT) AS dhash_hi,
           CAST(sum(CASE WHEN k >= 32 THEN b << (63 - k)
                    ELSE 0 END) AS BIGINT) AS dhash_lo
    FROM bits GROUP BY doc_id
"""


@gate("image_dhash", _DH_SQL)
def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_mm.image_dhash(ops_mm.attach_binary(docs), codec="fake")


# ---------------------------------------------------------------------------
# fill_depressions — Priority-Flood fixpoint; unrolled rounds with
# the identical update (equal budgets => equal outputs even before
# convergence; monotone => convergence makes extras no-ops).
# ---------------------------------------------------------------------------

_FP_ROUNDS = 20


def _fp_sql(rounds: int) -> str:
    inf = ops_raster.FILL_INF
    parts = [f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c, count(*) AS zv
      FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) pts
      GROUP BY 1
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)
      WHERE NOT (dx.dx = 0 AND dy.dy = 0)
    ),
    nb AS MATERIALIZED (
      SELECT a.c, b.c AS nc
      FROM cellv a, offs
      JOIN cellv b
        ON b.c = {G.qcell_neighbor('a.c', 'offs.dx', 'offs.dy',
                                   _FD_RES, DK)}
      WHERE {G.qcell_neighbor_valid('a.c', 'offs.dy', _FD_RES, DK)}
    ),
    deg AS (SELECT c, count(*) AS n FROM nb GROUP BY c),
    f0 AS MATERIALIZED (
      SELECT v.c, v.zv,
             CAST(CASE WHEN coalesce(deg.n, 0) < 8 THEN v.zv
                  ELSE {inf} END AS BIGINT) AS f
      FROM cellv v LEFT JOIN deg ON deg.c = v.c
    )"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
    nm{t} AS MATERIALIZED (
      SELECT nb.c, min(f.f) AS nm
      FROM nb JOIN f{t - 1} f ON f.c = nb.nc GROUP BY nb.c
    ),
    f{t} AS MATERIALIZED (
      SELECT f.c, f.zv,
             greatest(f.zv, least(f.f, coalesce(nm.nm, f.f))) AS f
      FROM f{t - 1} f LEFT JOIN nm{t} nm ON nm.c = f.c
    )""")
    parts.append(f"""
    SELECT c AS cell, zv AS z, f AS fill FROM f{rounds}
    """)
    return "".join(parts)


@gate("fill_depressions", _fp_sql(_FP_ROUNDS))
def q_fill_depressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.fill_depressions(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell",
        value="x", max_rounds=_FP_ROUNDS,
    )

