"""Gate registry extension 8 — round-1 continuation batch:
SemDeDup embedding-cluster dedup, C4 span-level corpus dedup,
zonal statistics (crop x stats composition), and Epanechnikov KDE
rasterization. All integer/IEEE-exact, full value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _LAT, _LON, _PENTA, _PENTA_WKT, _t, gate
from pdal_spark.operators import crop as ops_crop
from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import similarity as ops_sim

# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023): IVF-clustered embedding dedup
# ---------------------------------------------------------------------------
_SEM_NLIST = 8
_SEM_TAU = 0.3  # synthetic embeddings are near-orthogonal; 0.3 splits
#                 the sf0.01 corpus ~1/3 removed, 2/3 kept (production
#                 default in the operator is 0.97 per the paper)


def _sem_cos(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}.qv, {b}.qv)"
        f" / (sqrt(list_dot_product({a}.qv, {a}.qv))"
        f" * sqrt(list_dot_product({b}.qv, {b}.qv))))"
    )


def _semdedup_sql(nlist: int, tau: float) -> str:
    ccos = (
        "(list_dot_product(c.qv, kk.cv)"
        " / (sqrt(list_dot_product(c.qv, c.qv))"
        " * sqrt(list_dot_product(kk.cv, kk.cv))))"
    )
    return f"""
    WITH cents AS MATERIALIZED (
      SELECT vec_id AS cid, cast(embedding as double[]) AS cv
      FROM embeddings
      ORDER BY {G.lehmer2_wide('vec_id')}, vec_id LIMIT {nlist}
    ),
    corp AS MATERIALIZED (
      SELECT vec_id, cast(embedding as double[]) AS qv FROM embeddings
    ),
    asg AS MATERIALIZED (
      SELECT vec_id, cell, qv FROM (
        SELECT c.vec_id, kk.cid AS cell, c.qv,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {ccos} DESC, kk.cid ASC
               ) AS rn
        FROM corp c, cents kk
      ) x WHERE rn = 1
    ),
    removed AS (
      SELECT DISTINCT a.vec_id
      FROM asg a JOIN asg b ON a.cell = b.cell
      WHERE b.vec_id < a.vec_id AND {_sem_cos('a', 'b')} >= {G.fnum(tau)}
    )
    SELECT a.vec_id, a.cell,
           CASE WHEN r.vec_id IS NULL THEN 1 ELSE 0 END AS kept
    FROM asg a LEFT JOIN removed r ON r.vec_id = a.vec_id
    """


@gate("semdedup", _semdedup_sql(_SEM_NLIST, _SEM_TAU))
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return ops_sim.semdedup(emb, threshold=_SEM_TAU, nlist=_SEM_NLIST)


# ---------------------------------------------------------------------------
# C4 span-level corpus dedup (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------
_SPAN_W = 8


def _span_dedup_sql(n: int) -> str:
    return f"""
    WITH sp AS MATERIALIZED (
      SELECT doc_id, unnest(spans) AS span,
             unnest(range(0, len(spans))) AS pos
      FROM (
        SELECT doc_id,
               list_transform(
                 range(0, cast(ceil(len(ws) / {G.fnum(float(n))})
                       as bigint)),
                 i -> array_to_string(
                   list_slice(ws, i * {n} + 1, i * {n} + {n}), ' ')
               ) AS spans
        FROM (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents) d
      ) s
    ),
    kept AS (
      SELECT doc_id, pos, span FROM (
        SELECT doc_id, pos, span,
               row_number() OVER (
                 PARTITION BY span ORDER BY doc_id ASC, pos ASC
               ) AS occ
        FROM sp
      ) t WHERE occ = 1
    ),
    totals AS (
      SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id
    )
    SELECT k.doc_id,
           string_agg(k.span, ' ' ORDER BY k.pos) AS text,
           any_value(t.n_spans) AS n_spans,
           count(*) AS n_kept
    FROM kept k JOIN totals t ON t.doc_id = k.doc_id
    GROUP BY k.doc_id
    """


@gate("span_corpus_dedup", _span_dedup_sql(_SPAN_W))
def q_span_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_dedup.span_corpus_dedup(docs, span_words=_SPAN_W)


# ---------------------------------------------------------------------------
# Zonal statistics: crop (one view per geometry) x stats
# ---------------------------------------------------------------------------
_QUAD = [(-60.0, -30.0), (40.0, -40.0), (55.0, 25.0), (-45.0, 35.0)]
_QUAD_WKT = (
    "POLYGON(("
    + ", ".join(f"{x} {y}" for x, y in _QUAD + [_QUAD[0]])
    + "))"
)
_ZPTS = (
    f"(SELECT event_id, value, {_LAT} AS lat, {_LON} AS lon"
    f" FROM events) zp"
)


def _zonal_sql() -> str:
    q = G.fnum(1048576.0)
    return f"""
    WITH pts AS MATERIALIZED (SELECT value, lat, lon FROM {_ZPTS}),
    hits AS (
      SELECT 0 AS geom_id, value FROM pts
      WHERE {G.convex_pip('lon', 'lat', _PENTA)}
      UNION ALL
      SELECT 1 AS geom_id, value FROM pts
      WHERE {G.convex_pip('lon', 'lat', _QUAD)}
    )
    SELECT geom_id, count(*) AS n_points,
           min(value) AS vmin, max(value) AS vmax,
           (cast(sum(cast(round(value * {q}) as bigint)) as double)
              / {q}) / cast(count(*) as double) AS vmean
    FROM hits GROUP BY geom_id
    """


@gate("zonal_stats", _zonal_sql())
def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id").select(
        "event_id", "lat", "lon", "value"
    )
    return ops_crop.zonal_stats(
        pts, [(0, _PENTA_WKT), (1, _QUAD_WKT)], value="value"
    )


# ---------------------------------------------------------------------------
# Epanechnikov KDE rasterization (writers.gdal radius-update pattern)
# ---------------------------------------------------------------------------
_KRES, _KOX, _KOY = 10.0, -180.0, -90.0
_KW, _KH = 36, 18
_KBW = 12.0  # bandwidth -> k = ceil(12/10) = 2 candidate rings


def _kde_cells_sql() -> str:
    q = G.fnum(1048576.0)
    hh = G.fnum(_KBW * _KBW)
    cxe = f"({G.fnum(_KOX)} + ((bi + di + {G.fnum(0.5)}) * {G.fnum(_KRES)}))"
    cye = f"({G.fnum(_KOY)} + ((bj + dj + {G.fnum(0.5)}) * {G.fnum(_KRES)}))"
    return f"""
    SELECT cell_i, cell_j, count(*) AS n_points,
           cast(sum(cast(round(({G.fnum(1.0)} - d2 / {hh}) * {q})
                         as bigint)) as double) / {q} AS density
    FROM (
      SELECT bi + di AS cell_i, bj + dj AS cell_j,
             ({cxe} - px) * ({cxe} - px)
               + ({cye} - py) * ({cye} - py) AS d2
      FROM (
        SELECT lon AS px, lat AS py,
               cast(floor((lon - {G.fnum(_KOX)}) / {G.fnum(_KRES)})
                    as bigint) AS bi,
               cast(floor((lat - {G.fnum(_KOY)}) / {G.fnum(_KRES)})
                    as bigint) AS bj
        FROM (SELECT {_LAT} AS lat, {_LON} AS lon FROM events) e
      ) p
      CROSS JOIN (SELECT a.range AS di, b.range AS dj
                  FROM range(-2, 3) a, range(-2, 3) b) o
    ) c
    WHERE d2 < {hh}
      AND cell_i >= 0 AND cell_i < {_KW}
      AND cell_j >= 0 AND cell_j < {_KH}
    GROUP BY cell_i, cell_j
    """


@gate("kde_raster", _kde_cells_sql())
def q_kde_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_raster.kde_rasterize(
        pts, resolution=_KRES, origin_x=_KOX, origin_y=_KOY,
        width=_KW, height=_KH, bandwidth=_KBW,
    )


# chain continues: polygon->cell covering gates
