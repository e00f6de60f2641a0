"""Gate registry extension 25 — index-layout & field-estimation
batch: posting-list varint statistics (inverted-index storage
planning, pure-comparison byte sizes), IDW interpolation at arbitrary
probe points (writers.gdal's kernel off the grid), and Cohen's kappa
(chance-corrected agreement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import textops as ops_text

# ---------------------------------------------------------------------------
# postings_varint — delta-gap varint profile per term.
# ---------------------------------------------------------------------------

_PV_SQL = f"""
    WITH post AS MATERIALIZED (
      SELECT DISTINCT word, doc_id AS doc FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
      ) t
    ),
    gaps AS (
      SELECT word, doc,
             lag(doc) OVER (PARTITION BY word ORDER BY doc) AS lag_doc
      FROM post
    ),
    g AS (
      SELECT word, lag_doc,
             CASE WHEN lag_doc IS NULL THEN doc
                  ELSE doc - lag_doc END AS g
      FROM gaps
    ),
    v AS (
      SELECT word, lag_doc, g,
             CAST(1 + CASE WHEN g >= 128 THEN 1 ELSE 0 END
                  + CASE WHEN g >= 16384 THEN 1 ELSE 0 END
                  + CASE WHEN g >= 2097152 THEN 1 ELSE 0 END
                  + CASE WHEN g >= 268435456 THEN 1 ELSE 0 END
               AS BIGINT) AS vb
      FROM g
    )
    SELECT word, count(*) AS df_docs,
           max(CASE WHEN lag_doc IS NOT NULL THEN g END) AS max_gap,
           sum(vb) AS varint_bytes,
           (sum(vb) * {1 << 20}) // (count(*) * 8) AS ratio_q
    FROM v GROUP BY word
"""


@gate("postings_varint", _PV_SQL)
def q_postings_varint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.postings_varint_stats(docs)


# ---------------------------------------------------------------------------
# idw_at_points — integer fixed-point IDW over the exact radius join.
# ---------------------------------------------------------------------------

_IDW_QM, _IDW_SM = 101, 3
_IDW_R = 5.0

_IDW_D = (
    "sqrt((q.lon - s.lon) * (q.lon - s.lon)"
    " + (q.lat - s.lat) * (q.lat - s.lat))"
)
_IDW_WQ = (
    f"CASE WHEN {_IDW_D} = 0.0e0"
    f" THEN CAST({ops_raster.IDW_W_CAP} AS BIGINT)"
    f" ELSE least(CAST({ops_raster.IDW_W_CAP} AS BIGINT),"
    f" CAST(floor({G.fnum(float(ops_raster.IDW_W_Q))}"
    f" / (({_IDW_D}) * ({_IDW_D}))) AS BIGINT)) END"
)

_IDW_SQL = f"""
    WITH q AS MATERIALIZED (
      SELECT event_id AS qid, {G.geo_lat('event_id')} AS lat,
             {G.geo_lon('event_id')} AS lon
      FROM events WHERE event_id % {_IDW_QM} = 0
    ),
    s AS MATERIALIZED (
      SELECT event_id AS sid, {G.geo_lat('event_id')} AS lat,
             {G.geo_lon('event_id')} AS lon,
             CAST(floor(CAST(value AS DOUBLE) * {G.fnum(1000.0)}
                  + {G.fnum(0.5)}) AS BIGINT) AS vq
      FROM events WHERE event_id % {_IDW_SM} = 0
    ),
    agg AS (
      SELECT q.qid, count(*) AS n_samples,
             sum(({_IDW_WQ}) * s.vq) AS num,
             sum({_IDW_WQ}) AS den
      FROM q JOIN s ON {_IDW_D} <= {G.fnum(_IDW_R)}
      GROUP BY q.qid
    )
    SELECT qid, n_samples, num // den AS idw_q,
           CAST(num // den AS DOUBLE) / {G.fnum(1000.0)} AS idw
    FROM agg WHERE den > 0
"""


@gate("idw_at_points", _IDW_SQL)
def q_idw_at_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    q = ops_h3.geocode(
        ev.where(F.col("event_id") % _IDW_QM == 0), "event_id"
    ).select(F.col("event_id").alias("qid"), "lat", "lon")
    s = ops_h3.geocode(
        ev.where(F.col("event_id") % _IDW_SM == 0), "event_id"
    ).select(F.col("event_id").alias("sid"), "lat", "lon", "value")
    return ops_raster.idw_at_points(
        q, s, _IDW_R, value="value", id_query="qid", id_sample="sid"
    )


# ---------------------------------------------------------------------------
# cohen_kappa — agreement between an event's type and its key's next
# type (the transition-diagonal rater pair; deterministic fixture).
# ---------------------------------------------------------------------------

_CK_SQL = """
    WITH pairs AS MATERIALIZED (
      SELECT event_type AS a,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ) AS b
      FROM events
    ),
    conf AS (
      SELECT a, b, count(*) AS c FROM pairs
      WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY a, b
    ),
    m AS (
      SELECT sum(c) AS n,
             sum(CASE WHEN a = b THEN c ELSE 0 END) AS po
      FROM conf
    ),
    pe AS (
      SELECT sum(ra.ra * cb.cb) AS pe FROM
        (SELECT a, sum(c) AS ra FROM conf GROUP BY a) ra
      JOIN (SELECT b, sum(c) AS cb FROM conf GROUP BY b) cb
        ON cb.b = ra.a
    )
    SELECT m.n, coalesce(m.po, 0) AS po, coalesce(pe.pe, 0) AS pe,
           CASE WHEN m.n * m.n - pe.pe <> 0 THEN
             CAST(m.n * m.po - pe.pe AS DOUBLE)
               / CAST(m.n * m.n - pe.pe AS DOUBLE) END AS kappa
    FROM m, pe
"""


@gate("cohen_kappa", _CK_SQL)
def q_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    pairs = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    )
    return ops_stats.cohen_kappa(pairs, "a", "b")

