"""Gate registry extension 40 — curation refinement: near-dup dedup
keeping the BEST copy per duplicate cluster (argmax quality, not
min-id) — survivors by document length like FineWeb-style pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _lsh_pairs_sql, _t, gate
from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import textops as ops_text

_NB_J = 0.5

_NB_SQL = f"""
    WITH RECURSIVE
    jpairs AS (
      SELECT a, b FROM ({_lsh_pairs_sql()}) p
      WHERE jaccard >= {G.fnum(_NB_J)}
    ),
    edges AS (
      SELECT a AS ea, b AS eb FROM jpairs
      UNION ALL SELECT b, a FROM jpairs
    ),
    reach(pid, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.eb, r.lbl FROM reach r JOIN edges e ON e.ea = r.pid
    ),
    comp AS (SELECT pid, min(lbl) AS canonical_id FROM reach GROUP BY 1),
    sizes AS (
      SELECT canonical_id, count(*) AS comp_size FROM comp GROUP BY 1
    ),
    scored AS (
      SELECT c.pid, c.canonical_id, s.comp_size, d.n_chars AS score
      FROM comp c
      JOIN sizes s USING (canonical_id)
      JOIN documents d ON d.doc_id = c.pid
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY canonical_id ORDER BY score DESC, pid ASC
      ) AS rn FROM scored
    ),
    best AS (
      SELECT canonical_id, pid AS survivor_id FROM ranked WHERE rn = 1
    )
    SELECT r.pid AS doc_id, b.survivor_id, r.comp_size,
           r.pid = b.survivor_id AS is_survivor
    FROM ranked r JOIN best b USING (canonical_id)
"""


@gate("near_dup_keep_best", _NB_SQL)
def q_near_dup_keep_best(spark: SparkSession, sf_dir: str
                         ) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_dedup.near_dup_keep_best(
        docs, score_col="n_chars", jaccard_threshold=_NB_J,
        vocab_df=v,
    )

