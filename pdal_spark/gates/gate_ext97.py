"""Gate registry extension 97 — readability (Flesch/fog), Yule's K,
IDW leave-one-out cross-validation, polygon compactness, and
emerging-hot-spot classification."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import features as ops_features
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.operators import textops as ops_text

_LAT = G.geo_lat("event_id")
_LON = G.geo_lon("event_id")

# ---------------------------------------------------------------------------
# readability — Flesch reading ease + Gunning fog from regex-group
# tallies (group counts are length DIFFERENCES, so UTF-16 vs
# codepoint length conventions cancel)
# ---------------------------------------------------------------------------


def _groups(expr: str, cls: str) -> str:
    return (
        f"(length(regexp_replace({expr}, '{cls}', '#', 'g'))"
        f" - length(regexp_replace({expr}, '{cls}', '', 'g')))"
    )


_RD_SYL = _groups("lower(text)", "[aeiouy]+")
_RD_SENT = f"greatest({_groups('text', '[.!?]+')}, 1)"
_RD_POLY = (
    "len(list_filter(string_split(text, ' '), w ->"
    + _groups("lower(w)", "[aeiouy]+")
    + " >= 3))"
)
_RD_WPS = "(CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))"
_RD_SPW = "(CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))"
_RD_PPW = "(CAST(n_poly AS DOUBLE) / CAST(n_words AS DOUBLE))"

_RD_SQL = f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST({_RD_SENT} AS BIGINT) AS n_sents,
             CAST({_RD_SYL} AS BIGINT) AS n_syll,
             CAST({_RD_POLY} AS BIGINT) AS n_poly
      FROM documents
    )
    SELECT doc_id, n_words, n_sents, n_syll, n_poly,
           {G.fnum(206.835)} - {G.fnum(1.015)} * {_RD_WPS}
             - {G.fnum(84.6)} * {_RD_SPW} AS flesch,
           {G.fnum(0.4)} * ({_RD_WPS} + {G.fnum(100.0)} * {_RD_PPW})
             AS fog
    FROM base
"""


@gate("readability", _RD_SQL)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.readability_scores(docs)


# ---------------------------------------------------------------------------
# yules_k — vocabulary-richness characteristic over the split-word
# frequency spectrum
# ---------------------------------------------------------------------------
_YK_SQL = f"""
    WITH freq AS (
      SELECT doc_id, word, count(*) AS f
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents) t
      GROUP BY doc_id, word
    ),
    agg AS (
      SELECT doc_id,
             CAST(sum(f) AS BIGINT) AS n_tokens,
             CAST(sum(f * f) AS BIGINT) AS sum_f2
      FROM freq GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, sum_f2,
           {G.fnum(10000.0)}
           * (CAST(sum_f2 AS DOUBLE) - CAST(n_tokens AS DOUBLE))
           / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
             AS yules_k
    FROM agg
"""


@gate("yules_k", _YK_SQL)
def q_yules_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.yules_k(docs)


# ---------------------------------------------------------------------------
# idw_loocv — leave-one-out IDW error per sample (self excluded)
# ---------------------------------------------------------------------------
_LOO_M = 3
_LOO_R = 5.0

_LOO_D = (
    "sqrt((a.lon - b.lon) * (a.lon - b.lon)"
    " + (a.lat - b.lat) * (a.lat - b.lat))"
)
_LOO_WQ = (
    f"CASE WHEN {_LOO_D} = 0.0e0"
    f" THEN CAST({ops_raster.IDW_W_CAP} AS BIGINT)"
    f" ELSE least(CAST({ops_raster.IDW_W_CAP} AS BIGINT),"
    f" CAST(floor({G.fnum(float(ops_raster.IDW_W_Q))}"
    f" / (({_LOO_D}) * ({_LOO_D}))) AS BIGINT)) END"
)

_LOO_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS sid, {_LAT} AS lat, {_LON} AS lon,
             CAST(floor(CAST(value AS DOUBLE) * {G.fnum(1000.0)}
                  + {G.fnum(0.5)}) AS BIGINT) AS vq
      FROM events WHERE event_id % {_LOO_M} = 0
    ),
    agg AS (
      SELECT a.sid, CAST(count(*) AS BIGINT) AS n_nbrs,
             sum(({_LOO_WQ}) * b.vq) AS num,
             sum({_LOO_WQ}) AS den,
             any_value(a.vq) AS vq
      FROM s a JOIN s b
        ON a.sid <> b.sid AND {_LOO_D} <= {G.fnum(_LOO_R)}
      GROUP BY a.sid
    )
    SELECT sid, n_nbrs, CAST(num // den AS BIGINT) AS loo_q, vq,
           CAST(abs(num // den - vq) AS BIGINT) AS err_q
    FROM agg WHERE den > 0
"""


@gate("idw_loocv", _LOO_SQL)
def q_idw_loocv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ops_h3.geocode(
        ev.where(F.col("event_id") % _LOO_M == 0), "event_id"
    ).select(F.col("event_id").alias("sid"), "lat", "lon", "value")
    return ops_raster.idw_loocv(s, _LOO_R, value="value",
                                id_col="sid")


# ---------------------------------------------------------------------------
# polygon_compactness — Polsby-Popper over the same vertex-table
# fixture the polygon_centroid gate pins
# ---------------------------------------------------------------------------
_CP_Q = 1 << 10
_CP_MOD = 23

_CP_SQL = f"""
    WITH verts AS MATERIALIZED (
      SELECT user_id % 5 AS p,
             event_id AS s,
             CAST(floor(({_LON}) * {_CP_Q}) AS BIGINT) AS vx,
             CAST(floor(({_LAT}) * {_CP_Q}) AS BIGINT) AS vy
      FROM events WHERE event_id % {_CP_MOD} = 0
    ),
    e AS (
      SELECT p, vx, vy,
             coalesce(lead(vx) OVER w, first_value(vx) OVER w) AS nx,
             coalesce(lead(vy) OVER w, first_value(vy) OVER w) AS ny
      FROM verts
      WINDOW w AS (PARTITION BY p ORDER BY s)
    ),
    agg AS (
      SELECT p,
             CAST(sum(vx * ny - nx * vy) AS BIGINT) AS a2,
             CAST(sum(CAST(floor(sqrt(CAST((nx - vx) * (nx - vx)
                  + (ny - vy) * (ny - vy) AS DOUBLE))
                  * {G.fnum(1000.0)} + {G.fnum(0.5)}) AS BIGINT))
               AS BIGINT) AS perim_q
      FROM e GROUP BY p
    )
    SELECT p AS poly_id, a2, perim_q,
           CASE WHEN perim_q > 0 THEN
             {G.fnum(6.283185307179586)} * CAST(abs(a2) AS DOUBLE)
             * {G.fnum(1000000.0)}
             / (CAST(perim_q AS DOUBLE) * CAST(perim_q AS DOUBLE))
           END AS pp
    FROM agg
"""


@gate("polygon_compactness", _CP_SQL)
def q_polygon_compactness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _CP_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id")
    verts = pts.select(
        (F.col("user_id") % 5).alias("poly_id"),
        F.col("event_id").alias("seq"),
        F.floor(F.col("lon") * _CP_Q).cast("long").alias("xq"),
        F.floor(F.col("lat") * _CP_Q).cast("long").alias("yq"),
    )
    return ops_features.polygon_compactness(verts)


# ---------------------------------------------------------------------------
# emerging_hotspots — per-cell Mann-Kendall trend classification of
# daily count series (the space-time-cube readout)
# ---------------------------------------------------------------------------
_EH_RES = 3
_EH_US = 86_400_000_000
_EH_MIN = 150

_EH_SQL = f"""
    WITH counts AS MATERIALIZED (
      SELECT ({G.qcell_ix(_LON, _EH_RES)}) * {1 << 27}
             + ({G.qcell_iy(_LAT, _EH_RES)}) AS cell,
             epoch_us(ts) // {_EH_US} AS tbin,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT a.cell, CAST(sum(sign(b.c - a.c)) AS BIGINT) AS s_stat
      FROM counts a JOIN counts b
        ON b.cell = a.cell AND a.tbin < b.tbin
      GROUP BY a.cell
    ),
    nn AS (SELECT cell, count(*) AS n FROM counts GROUP BY cell),
    ties AS (
      SELECT cell, sum(t * (t - 1) * (2 * t + 5)) AS tie_corr FROM (
        SELECT cell, c, count(*) AS t FROM counts GROUP BY cell, c
      ) g WHERE t > 1 GROUP BY cell
    ),
    tot AS (
      SELECT cell, CAST(sum(c) AS BIGINT) AS total
      FROM counts GROUP BY cell
    )
    SELECT s.cell, tot.total, s.s_stat,
           CAST(nn.n AS BIGINT) AS n,
           CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                - coalesce(tie_corr, 0) AS BIGINT) AS var18,
           CASE
             WHEN tot.total >= {_EH_MIN} AND s.s_stat > 0
               THEN 'rising-hot'
             WHEN tot.total >= {_EH_MIN} AND s.s_stat < 0
               THEN 'fading-hot'
             WHEN tot.total >= {_EH_MIN} THEN 'steady-hot'
             WHEN s.s_stat > 0 THEN 'rising-cold'
             ELSE 'cold'
           END AS label
    FROM s
    JOIN nn ON nn.cell = s.cell
    JOIN tot ON tot.cell = s.cell
    LEFT JOIN ties ON ties.cell = s.cell
"""


@gate("emerging_hotspots", _EH_SQL)
def q_emerging_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id").select("lat", "lon", "ts")
    return ops_temporal.emerging_hotspots(
        pts, x="lon", y="lat", ts="ts", res=_EH_RES,
        us_per_bin=_EH_US, min_total=_EH_MIN,
    )
