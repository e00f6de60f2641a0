"""Gate registry extension 71 — Count-Min sketch word-frequency
estimation over the documents token stream (Cormode & Muthukrishnan
2005): the bounded-memory frequency table that completes the sketch
family (HLL distinct / KMV overlap / AMS F2 / CMS point counts).
Counters are exact integers and the estimate is a min over exact
integers, so the oracle hash-matches; the overestimate guarantee is
pinned by pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _TOKS, _VOCAB, _t, gate
from pdal_spark.operators.sketch import _cms_col, cms_estimate, cms_sketch

_CMS_W = 64
_CMS_D = 4


def _cms_sql() -> str:
    stream_cols = "\n        UNION ALL ".join(
        f"SELECT {j} AS j, {_cms_col('word_id', j, _CMS_W)} AS col"
        " FROM s"
        for j in range(_CMS_D)
    )
    probe_cols = "\n        UNION ALL ".join(
        f"SELECT word_id, {j} AS j,"
        f" {_cms_col('word_id', j, _CMS_W)} AS col FROM tc"
        for j in range(_CMS_D)
    )
    return f"""
    WITH v AS MATERIALIZED ({_VOCAB}),
    s AS MATERIALIZED (
      SELECT v.word_id FROM {_TOKS} t JOIN v USING (word)
    ),
    cells AS MATERIALIZED (
      SELECT j, col, count(*) AS cnt FROM (
        {stream_cols}
      ) u GROUP BY 1, 2
    ),
    tc AS MATERIALIZED (
      SELECT word_id, count(*) AS true_cnt FROM s GROUP BY 1
    ),
    est AS (
      SELECT word_id,
             CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS cms_est
      FROM ({probe_cols}) p
      LEFT JOIN cells USING (j, col)
      GROUP BY 1
    )
    SELECT v.word, tc.true_cnt, est.cms_est
    FROM tc JOIN est USING (word_id) JOIN v USING (word_id)
    """


@gate("cms_counts", _cms_sql())
def q_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import tokens, vocab

    docs = _t(spark, sf_dir, "documents")
    v = vocab(docs)
    stream = tokens(docs).join(F.broadcast(v), on="word").select(
        "word_id"
    )
    sk = cms_sketch(stream, "word_id", width=_CMS_W, depth=_CMS_D)
    tc = stream.groupBy("word_id").agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    est = cms_estimate(sk, tc, "word_id",
                       width=_CMS_W, depth=_CMS_D)
    return (
        tc.join(est, on="word_id")
        .join(F.broadcast(v), on="word_id")
        .select("word", "true_cnt", "cms_est")
    )


from pdal_spark import gate_ext72  # noqa: E402,F401
