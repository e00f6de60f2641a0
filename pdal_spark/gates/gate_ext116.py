"""Gate registry extension 116 — string-similarity join batch:
q-gram-pruned edit-distance self join (brute-force oracle proves
the pruning lossless)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import dedup as ops_dedup

# Variant-form strings: docs in cohorts of 4 share a stem, each
# member mutates the tail — within-cohort pairs sit at ed 1-2,
# plus whatever accidental cross-cohort near-misses the stems
# produce (the brute-force oracle is ground truth either way).
_EJ_MOD = 3
_EJ_S = (
    "concat('g', CAST(doc_id // 4 AS VARCHAR), 'q',"
    " CASE doc_id % 4 WHEN 0 THEN 'aa' WHEN 1 THEN 'ab'"
    " WHEN 2 THEN 'ba' ELSE 'ca' END)"
)
_EJ_S_SPARK = (
    "concat('g', cast(doc_id div 4 as string), 'q',"
    " case doc_id % 4 when 0 then 'aa' when 1 then 'ab'"
    " when 2 then 'ba' else 'ca' end)"
)
_EJ_D = 2
_EJ_Q = 2
_EJ_MINLEN = _EJ_Q * (_EJ_D + 1)

_EJ_SQL = f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id AS id, {_EJ_S} AS s
      FROM documents WHERE doc_id % {_EJ_MOD} = 0
    ),
    lf AS (SELECT id, s FROM base WHERE length(s) >= {_EJ_MINLEN})
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    FROM lf a JOIN lf b ON a.id < b.id
    WHERE levenshtein(a.s, b.s) <= {_EJ_D}
"""


@gate("edit_join", _EJ_SQL)
def q_edit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").where(
        F.col("doc_id") % _EJ_MOD == 0
    ).select(
        F.col("doc_id").alias("id"),
        F.expr(_EJ_S_SPARK).alias("s"),
    )
    return ops_dedup.edit_join(docs, d=_EJ_D, q=_EJ_Q)
