"""Gate registry extension 65 — retrieval feedback: RM3-lite query
expansion over bm25_topk's pseudo-relevant set (oracle nests the
bm25 gate SQL as the feedback subquery)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext16 import _BM_SQL, _BM_TERMS
from pdal_spark.operators import textops as ops_text

_PRF_M = 10


def _prf_sql() -> str:
    excl = sorted(set(_BM_TERMS) | set(ops_text.STOPWORDS))
    excl_sql = ", ".join(repr(w) for w in excl)
    return f"""
    WITH topk AS MATERIALIZED (
      SELECT doc_id, score_q FROM ({_BM_SQL}) x
    ),
    toks AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
      WHERE doc_id IN (SELECT doc_id FROM topk)
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, word, count(*) AS tf
      FROM toks GROUP BY 1, 2
    ),
    sc AS (
      SELECT tf.word,
             CAST(sum(topk.score_q * tf.tf) AS BIGINT) AS weight_q
      FROM tf JOIN topk ON topk.doc_id = tf.doc_id
      WHERE tf.word NOT IN ({excl_sql})
      GROUP BY 1
    )
    SELECT word, weight_q,
           CAST(row_number() OVER (
             ORDER BY weight_q DESC, word ASC) AS INT) AS rank
    FROM sc ORDER BY weight_q DESC, word ASC LIMIT {_PRF_M}
    """


@gate("prf_expansion", _prf_sql())
def q_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import prf_expansion

    return prf_expansion(
        _t(spark, sf_dir, "documents"),
        terms=list(_BM_TERMS), m=_PRF_M,
    )

