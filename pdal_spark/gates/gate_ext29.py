"""Gate registry extension 29 — featurizer & multimodal-planning
batch: hashing-trick sparse features (signed-hash fold over vocab
ids), per-document OOV rate vs a reference vocabulary, and the
decode-free image patchification manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import multimodal as ops_mm
from pdal_spark.operators import textops as ops_text

_TOKS = """
  (SELECT doc_id, unnest(ws) AS word
   FROM (SELECT doc_id, string_split(text, ' ') AS ws
         FROM documents) d)
"""
_VOCAB = """
  (SELECT word, row_number() OVER (ORDER BY word) AS word_id
   FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
         FROM documents) w)
"""

# ---------------------------------------------------------------------------
# hashed_features — signed-hash fold into 64 buckets.
# ---------------------------------------------------------------------------

_FH_DIM = 64
_FH_H = G.mix_hash("v.word_id")

_FH_SQL = f"""
    SELECT doc_id, idx, sum(sgn) AS val FROM (
      SELECT t.doc_id, ({_FH_H}) % {_FH_DIM} AS idx,
             CASE WHEN (({_FH_H}) // {_FH_DIM}) % 2 = 0
               THEN 1 ELSE -1 END AS sgn
      FROM {_TOKS} t JOIN {_VOCAB} v USING (word)
    ) s
    GROUP BY doc_id, idx HAVING sum(sgn) <> 0
"""


@gate("hashed_features", _FH_SQL)
def q_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.hashed_features(docs, dim=_FH_DIM)


# ---------------------------------------------------------------------------
# oov_rate — score the odd-doc slice against the even-doc vocab.
# ---------------------------------------------------------------------------

_OOV_SQL = f"""
    WITH vocab_t AS MATERIALIZED (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id % 2 = 0
    ),
    probe AS (
      SELECT t.doc_id, CASE WHEN v.word IS NULL THEN 1 ELSE 0 END
               AS oov
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents WHERE doc_id % 2 = 1) t
      LEFT JOIN vocab_t v ON v.word = t.word
    )
    SELECT doc_id, count(*) AS n_tokens, sum(oov) AS n_oov,
           (sum(oov) * {1 << 20}) // count(*) AS oov_q
    FROM probe GROUP BY doc_id
"""


@gate("oov_rate", _OOV_SQL)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.oov_rate(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
    )


# ---------------------------------------------------------------------------
# image_tile_manifest — patch grid from the deterministic-fake
# metadata (the multimodal_meta contract).
# ---------------------------------------------------------------------------

_TM_P = 48

_TM_SQL = f"""
    WITH meta AS MATERIALIZED (
      SELECT doc_id,
             CAST(length(text) % 640 + 1 AS INT) AS w,
             CAST(length(text) % 480 + 1 AS INT) AS h
      FROM documents
    )
    SELECT doc_id,
           CAST(tx.i AS INT) AS tile_x, CAST(ty.i AS INT) AS tile_y,
           CAST(tx.i * {_TM_P} AS INT) AS px,
           CAST(ty.i * {_TM_P} AS INT) AS py,
           CAST(least({_TM_P}, w - tx.i * {_TM_P}) AS INT) AS pw,
           CAST(least({_TM_P}, h - ty.i * {_TM_P}) AS INT) AS ph
    FROM meta,
         unnest(range((w + {_TM_P} - 1) // {_TM_P})) AS tx(i),
         unnest(range((h + {_TM_P} - 1) // {_TM_P})) AS ty(i)
"""


@gate("image_tiles", _TM_SQL)
def q_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    meta = ops_mm.decode_image_meta(ops_mm.attach_binary(docs), codec="fake")
    return ops_mm.image_tile_manifest(meta, patch=_TM_P)

