"""Gate registry extension 16 — lexical retrieval + physical layout:
Okapi BM25 top-k (integer fixed-point: rank AND score hash-compare)
and the generic N-column Z-order clustering key (the layout primitive
behind multi-attribute min-max pruning). Both formula-shared via
sqlgen so the DuckDB oracle runs the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import textops as ops_text

# ---------------------------------------------------------------------------
# bm25_topk
# ---------------------------------------------------------------------------

_BM_TERMS = ["join", "spark", "window"]
_BM_K = 10
_Q = ops_text.BM25_Q
_DQ = ops_text.BM25_DQ

_BM_SQL = f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    dl AS MATERIALIZED (
      SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id
    ),
    tot AS (SELECT count(*) AS n_docs, sum(dl) AS sl FROM dl),
    post AS MATERIALIZED (
      SELECT doc_id, word, count(*) AS tf FROM t
      WHERE word IN ({", ".join(repr(w) for w in _BM_TERMS)})
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT word, count(*) AS df_t FROM post GROUP BY word),
    sc AS MATERIALIZED (
      SELECT p.doc_id,
             sum(
               (CAST(floor(
                  ln(CAST(2 * tot.n_docs + 2 AS DOUBLE)
                     / CAST(2 * d.df_t + 1 AS DOUBLE))
                  * {G.fnum(float(_Q))} + {G.fnum(0.5)}) AS BIGINT)
                * 44 * {_DQ} * p.tf)
               // (20 * CAST({_DQ} AS BIGINT) * p.tf + 6 * {_DQ}
                   + 18 * ((dl.dl * tot.n_docs * {_DQ}) // tot.sl))
             ) AS score_q
      FROM post p
      JOIN dfreq d ON d.word = p.word
      JOIN dl ON dl.doc_id = p.doc_id, tot
      GROUP BY p.doc_id
    )
    SELECT doc_id, score_q,
           CAST(row_number() OVER (
             ORDER BY score_q DESC, doc_id ASC
           ) AS INT) AS rank
    FROM sc ORDER BY score_q DESC, doc_id ASC LIMIT {_BM_K}
"""


@gate("bm25_topk", _BM_SQL)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.bm25_topk(docs, terms=_BM_TERMS, k=_BM_K)


# ---------------------------------------------------------------------------
# zorder_key — 3-column interleave over events (value, user, a
# synthetic catalog slice); the key is the full physical-layout
# formula, so hash equality pins every bucket AND bit position.
# ---------------------------------------------------------------------------

_Z_BITS = 4
_Z_COLS = [("value", 0.0, 500.0), ("user_id", 0.0, 150.0),
           ("item", 0.0, 256.0)]

_Z_SQL = f"""
    SELECT event_id,
           {G.zorder_key(
               [("value", 0.0, 500.0), ("user_id", 0.0, 150.0),
                ("(event_id % 256)", 0.0, 256.0)],
               _Z_BITS, G.DUCKDB)} AS z_key
    FROM events
"""


@gate("zorder_key", _Z_SQL)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "value", "user_id",
        (F.col("event_id") % 256).alias("item"),
    )
    return ops_h3.zorder_key_col(ev, _Z_COLS, bits=_Z_BITS).select(
        "event_id", "z_key"
    )

