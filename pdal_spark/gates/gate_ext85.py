"""Gate registry extension 85 — image near-dup + lattice routing
batch: perceptual average-hash over the fake-codec pixel grid (the
ASCII-fixture convention makes the whole pixel path SQL-oracle-able,
the scene_cuts precedent), pigeonhole-banded aHash hamming pairs,
multi-source least-cost distance over the friction lattice
(unrolled-relaxation oracle, the weighted_sssp convention), and the
origin-destination cell flow matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_cells
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import multimodal as ops_mm
from pdal_spark.operators import raster as ops_raster

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# image_ahash / ahash_pairs — over attach_binary(documents.text)
# (pure-ASCII fixture: UTF-8 bytes == char codes, mm_features
# precedent; the engine op handles arbitrary bytes).
# ---------------------------------------------------------------------------

_AH_CTE = """
    g AS (SELECT unnest(range(8)) AS i),
    grid AS (SELECT gi.i AS i, gj.i AS j FROM g gi, g gj(i)),
    docs AS (SELECT doc_id, text, len(text) AS n,
                    len(text) % 640 + 1 AS w, len(text) % 480 + 1 AS h
             FROM documents),
    samp AS (
      SELECT doc_id, i * 8 + j AS k,
             ascii(substr(text,
               CAST(((((i * h) // 8) * w + ((j * w) // 8)) * 3) % n
                    AS BIGINT) + 1, 1)) AS v
      FROM docs, grid
    ),
    tot AS (SELECT doc_id, sum(v) AS s FROM samp GROUP BY 1),
    bits AS (SELECT samp.doc_id, k,
                    CASE WHEN v * 64 >= s THEN 1 ELSE 0 END AS b
             FROM samp JOIN tot USING (doc_id)),
    ah AS MATERIALIZED (
      SELECT doc_id,
             CAST(sum(CASE WHEN k < 32 THEN b << (31 - k)
                      ELSE 0 END) AS BIGINT) AS ahash_hi,
             CAST(sum(CASE WHEN k >= 32 THEN b << (63 - k)
                      ELSE 0 END) AS BIGINT) AS ahash_lo
      FROM bits GROUP BY doc_id
    )
"""

_AH_SQL = f"""
    WITH {_AH_CTE}
    SELECT doc_id, ahash_hi, ahash_lo FROM ah
"""


def _mm_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_mm.image_ahash(ops_mm.attach_binary(docs), codec="fake")


@gate("image_ahash", _AH_SQL)
def q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mm_hashes(spark, sf_dir)


_AHP_MAXHAM = 3

_AHP_SQL = f"""
    WITH {_AH_CTE}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))
                + bit_count(xor(a.ahash_lo, b.ahash_lo))
                AS BIGINT) AS hamming
    FROM ah a JOIN ah b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ahash_hi, b.ahash_hi))
          + bit_count(xor(a.ahash_lo, b.ahash_lo)) <= {_AHP_MAXHAM}
"""


@gate("ahash_pairs", _AHP_SQL)
def q_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _mm_hashes(spark, sf_dir)
    out = ops_mm.ahash_pairs(h, max_hamming=_AHP_MAXHAM)
    return out.select("id_a", "id_b",
                      F.col("hamming").cast("long").alias("hamming"))


# ---------------------------------------------------------------------------
# cost_distance — friction = res-4 per-cell counts; fixed-round
# Bellman-Ford, oracle = identical relaxations unrolled fully
# (monotone => frontier form computes the same distances).
# ---------------------------------------------------------------------------

_CD_ROUNDS = 24
_CD_SOURCES = [
    int(eval(G.qcell_pack("8", "8", _FD_RES))),
    int(eval(G.qcell_pack("24", "12", _FD_RES))),
]


def _cd_sql(rounds: int) -> str:
    n = 1 << _FD_RES
    ix_c, iy_c = G.qcell_deconstruct("a.c", DK)
    srcs = ", ".join(f"({s})" for s in _CD_SOURCES)
    parts = [f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c, count(*) AS fv
      FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) pts
      GROUP BY 1
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)
      WHERE NOT (dx.dx = 0 AND dy.dy = 0)
    ),
    e AS MATERIALIZED (
      SELECT a.c AS u, b.c AS v,
             (a.fv + b.fv) * (CASE WHEN offs.dx = 0 OR offs.dy = 0
                              THEN {ops_raster.FOCAL_Q}
                              ELSE {ops_raster.D8_RT2_Q} END) AS w
      FROM cellv a, offs
      JOIN cellv b
        ON b.c = {G.qcell_neighbor('a.c', 'offs.dx', 'offs.dy',
                                   _FD_RES, DK)}
      WHERE {G.qcell_neighbor_valid('a.c', 'offs.dy', _FD_RES, DK)}
    ),
    d0 AS MATERIALIZED (
      SELECT CAST(s.s AS BIGINT) AS seed, CAST(s.s AS BIGINT) AS node,
             CAST(0 AS BIGINT) AS dist
      FROM (VALUES {srcs}) s(s)
    )"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
    d{t} AS MATERIALIZED (
      SELECT seed, node, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT seed, node, dist FROM d{t - 1}
        UNION ALL
        SELECT d.seed, e.v AS node, d.dist + e.w AS dist
        FROM d{t - 1} d JOIN e ON e.u = d.node
      ) u GROUP BY 1, 2
    )""")
    parts.append(f"""
    SELECT seed, node AS cell, dist FROM d{rounds}
    """)
    return "".join(parts)


@gate("cost_distance", _cd_sql(_CD_ROUNDS))
def q_cost_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.cost_distance(
        _fd_cells(spark, sf_dir), res=_FD_RES, sources=_CD_SOURCES,
        cell="cell", value="x", rounds=_CD_ROUNDS,
    )


# ---------------------------------------------------------------------------
# od_flows — per-user first/last event cell (order = event_id,
# unique => deterministic min_by/max_by), res 6.
# ---------------------------------------------------------------------------

_OD_RES = 6

_OD_SQL = f"""
    WITH pts AS (
      SELECT user_id, event_id,
             {G.qcell(G.geo_lat('event_id'), G.geo_lon('event_id'),
                      _OD_RES)} AS cell
      FROM events
    ),
    ends AS (
      SELECT user_id, arg_min(cell, event_id) AS o_cell,
             arg_max(cell, event_id) AS d_cell
      FROM pts GROUP BY user_id
    )
    SELECT o_cell, d_cell, count(*) AS n_trips
    FROM ends GROUP BY o_cell, d_cell
"""


@gate("od_flows", _OD_SQL)
def q_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_h3.od_flows(
        pts, key="user_id", order="event_id", res=_OD_RES
    )

