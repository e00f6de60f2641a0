"""Gate registry extension 6 — S2-analog cell encoding (the second
half of the north star's "H3/S2 cell encoding" pair) and the Hilbert
clustering key. All integer/IEEE-exact arithmetic (sqlgen's
linear-projection S2 flavor), so every gate is a full value-hash
oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _points, _t, gate
from pdal_spark.operators import s2 as ops_s2

DK = G.DUCKDB

_L = 10  # gate encode level (engine supports up to 29)


def _s2_base_sql(level: int) -> str:
    """DuckDB mirror of s2_encode over the geocoded events points:
    nested selects for face -> (i, j) -> hilbert steps -> packed id,
    built from the same sqlgen formulas the Spark side evaluates."""
    lat_e, lon_e = G.geo_lat("event_id"), G.geo_lon("event_id")
    face_e = G.s2_face("lat", "lon")
    i_e, j_e = G.s2_ij("lat", "lon", "face", level)
    base = (
        f"SELECT event_id, face, {i_e} AS ii, {j_e} AS jj FROM "
        f"(SELECT event_id, lat, lon, {face_e} AS face FROM "
        f"(SELECT event_id, {lat_e} AS lat, {lon_e} AS lon"
        f" FROM events) b0) b1"
    )
    steps = G.hilbert_steps("h", "ii", "jj", level, DK)
    return G.nested_steps_sql(
        base, steps,
        f"event_id, {G.s2_pack('face', 'h_d', level)} AS s2_cell",
    )


# ---------------------------------------------------------------------------
# S2 cell encode (filters.h3 stage pattern, S2 id scheme)
# ---------------------------------------------------------------------------
@gate("s2_encode", _s2_base_sql(_L))
def q_s2_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_s2.s2_encode(pts, "lat", "lon", level=_L).select(
        "event_id", "s2_cell"
    )


# ---------------------------------------------------------------------------
# S2 rollup: parent at level 4 + face decode + per-cell count
# (hexbin/h3bin rollup pattern on the S2 hierarchy)
# ---------------------------------------------------------------------------
@gate(
    "s2_rollup",
    f"""
    SELECT {G.s2_parent('s2_cell', _L, 4, DK)} AS parent_cell,
           {G.s2_face_of('s2_cell', DK)} AS face,
           count(*) AS n_points
    FROM ({_s2_base_sql(_L)}) enc
    GROUP BY 1, 2
    """,
)
def q_s2_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    enc = ops_s2.s2_encode(pts, "lat", "lon", level=_L)
    enc = ops_s2.s2_parent(enc, "s2_cell", _L, 4, out="parent_cell")
    enc = ops_s2.s2_face_col(enc, "s2_cell", out="face")
    return enc.groupBy("parent_cell", "face").agg(
        F.count("*").alias("n_points")
    )


# ---------------------------------------------------------------------------
# S2 subtree range query: the sentinel BETWEEN trick. Ancestor cell is
# a build-time constant (level-2 cell containing lat=10, lon=20),
# computed by the Python mirror below; the oracle re-encodes every
# point and applies the same literal range, so the gate proves
# ancestor-range == subtree membership across engines.
# ---------------------------------------------------------------------------
def _s2_py(lat: float, lon: float, level: int) -> int:
    if lat >= 45.0:
        face = 4
    elif lat < -45.0:
        face = 5
    else:
        face = min(int(math.floor((lon + 180.0) / 90.0)), 3)
    s = (lon + 180.0) / 360.0 if face >= 4 else (lon - (face * 90.0 - 180.0)) / 90.0
    t = {4: (lat - 45.0) / 45.0, 5: (lat + 90.0) / 45.0}.get(
        face, (lat + 45.0) / 90.0
    )
    n = 1 << level
    i = min(max(int(math.floor(s * n)), 0), n - 1)
    j = min(max(int(math.floor(t * n)), 0), n - 1)
    d, x, y = 0, i, j
    for k in range(level - 1, -1, -1):
        sz = 1 << k
        rx, ry = x // sz, y // sz
        d += sz * sz * (3 * rx + ry - 2 * rx * ry)
        xl, yl = x % sz, y % sz
        if ry == 1:
            x, y = xl, yl
        elif rx == 1:
            x, y = sz - 1 - yl, sz - 1 - xl
        else:
            x, y = yl, xl
    return (
        face * (1 << G.S2_FACE_SHIFT)
        + d * (1 << (G.S2_FACE_SHIFT - 2 * level))
        + (1 << (G.S2_FACE_SHIFT - 1 - 2 * level))
    )


_ANC = _s2_py(10.0, 20.0, 2)
_ANC_SENT = 1 << (G.S2_FACE_SHIFT - 1 - 2 * 2)


@gate(
    "s2_range_query",
    # AS MATERIALIZED: stops DuckDB pushing the BETWEEN through the
    # 28-level step chain (expression substitution explodes otherwise)
    f"""
    WITH enc AS MATERIALIZED ({_s2_base_sql(_L)})
    SELECT event_id, s2_cell FROM enc
    WHERE s2_cell BETWEEN {_ANC - _ANC_SENT + 1} AND {_ANC + _ANC_SENT - 1}
    """,
)
def q_s2_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    enc = ops_s2.s2_encode(pts, "lat", "lon", level=_L)
    return enc.where(
        F.expr(ops_s2.s2_range_contains("s2_cell", _ANC, 2))
    ).select("event_id", "s2_cell")


# ---------------------------------------------------------------------------
# Hilbert clustering key (filters.mortonorder alternative; no
# quadrant-seam jumps -> tighter min/max ranges on sorted layouts)
# ---------------------------------------------------------------------------
_HRES = 12


def _hilbert_sql(res: int) -> str:
    base = (
        f"SELECT event_id, {G.qcell_ix(G.geo_lon('event_id'), res)} AS ii,"
        f" {G.qcell_iy(G.geo_lat('event_id'), res)} AS jj FROM events"
    )
    steps = G.hilbert_steps("h", "ii", "jj", res, DK)
    return G.nested_steps_sql(base, steps, "event_id, h_d AS hilbert_key")


@gate("hilbert_key", _hilbert_sql(_HRES))
def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_s2.hilbert_encode(pts, "lat", "lon", res=_HRES).select(
        "event_id", "hilbert_key"
    )


# ---------------------------------------------------------------------------
# ExactSubstr-style duplicated-span coverage (Lee et al. 2021) — the
# distributed form of suffix-array span dedup (COVERAGE.md webtext)
# ---------------------------------------------------------------------------
from pdal_spark.gate import _TIDS, _t  # noqa: E402
from pdal_spark.operators import dedup as ops_dedup  # noqa: E402
from pdal_spark.operators import textops as ops_text  # noqa: E402

_SPAN_W = 10


def _span_hash_sql(width: int) -> str:
    h = "word_id"
    for i in range(1, width):
        lead = (
            f"lead(word_id, {i}) OVER (PARTITION BY doc_id ORDER BY pos)"
        )
        h = f"((({h}) * 8191 + {lead}) % {G.M31})"
    return h


@gate(
    "duplicated_spans",
    f"""
    WITH starts AS MATERIALIZED (
      SELECT doc_id, pos, {_span_hash_sql(_SPAN_W)} AS shingle
      FROM {_TIDS} tt
    ),
    st AS (SELECT * FROM starts WHERE shingle IS NOT NULL),
    dup AS (
      SELECT shingle FROM st GROUP BY shingle HAVING count(*) >= 2
    ),
    cov AS (
      SELECT DISTINCT s.doc_id, s.pos + g.range AS cpos
      FROM st s JOIN dup USING (shingle), range({_SPAN_W}) g
    ),
    nt AS (SELECT doc_id, count(*) AS n_tokens FROM {_TIDS} t2
           GROUP BY doc_id),
    dt AS (SELECT doc_id, count(*) AS dup_tokens FROM cov GROUP BY doc_id)
    SELECT nt.doc_id, nt.n_tokens,
           coalesce(dt.dup_tokens, 0) AS dup_tokens,
           cast(coalesce(dt.dup_tokens, 0) as double)
             / cast(nt.n_tokens as double) AS dup_frac
    FROM nt LEFT JOIN dt USING (doc_id)
    """,
)
def q_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_dedup.duplicated_span_stats(
        docs, width=_SPAN_W, vocab_df=v
    )


# ---------------------------------------------------------------------------
# S2 cell-center decode (h3_center analog): inverse Hilbert + inverse
# face parameterization, IEEE-exact in both engines
# ---------------------------------------------------------------------------
def _s2_center_sql(level: int) -> str:
    base = (
        f"SELECT event_id, s2_cell, {G.s2_face_of('s2_cell', DK)} AS face,"
        f" {G.s2_pos_of('s2_cell', level, DK)} AS pos FROM enc"
    )
    steps = G.hilbert_inv_steps("g", "pos", level, DK)
    inner = G.nested_steps_sql(
        base, steps,
        f"event_id, s2_cell, {G.s2_center_lon('face', 'g_x', level)}"
        f" AS cell_lon, {G.s2_center_lat('face', 'g_y', level)} AS cell_lat",
    )
    return f"WITH enc AS MATERIALIZED ({_s2_base_sql(level)})\n{inner}"


@gate("s2_cell_center", _s2_center_sql(_L))
def q_s2_cell_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    enc = ops_s2.s2_encode(pts, "lat", "lon", level=_L)
    return ops_s2.s2_center(enc, "s2_cell", level=_L).select(
        "event_id", "s2_cell", "cell_lon", "cell_lat"
    )

# chain continues: corpus-governance gates
