"""Gate registry extension 221 — IR-eval batch 2: average
precision and recall@k (the ext218 fixtures)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import gate
from pdal_spark.gates.gate_ext218 import _IR_K, _IR_RUNS, _ir_dfs
from pdal_spark.operators import similarity as ops_sim

_AP_Q = ops_sim.AP_Q
_AP_SQL = f"""
    WITH {_IR_RUNS},
    j AS (
      SELECT runs.qid, runs.r,
             CASE WHEN qrels.rl IS NOT NULL AND qrels.rl > 0
               THEN 1 ELSE 0 END AS b
      FROM runs LEFT JOIN qrels
        ON runs.qid = qrels.qid AND runs.did = qrels.did
      WHERE runs.r <= {_IR_K}
    ),
    tp_t AS (
      SELECT qid, r, b,
             CAST(sum(b) OVER (PARTITION BY qid ORDER BY r ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp
      FROM j
    ),
    n_rel AS (
      SELECT qid, CAST(count(DISTINCT did) AS BIGINT) AS n_rel
      FROM qrels WHERE rl > 0 GROUP BY qid
    ),
    agg AS (
      SELECT qid, CAST(sum(b) AS BIGINT) AS n_hits,
             CAST(sum(CASE WHEN b = 1 THEN
               (tp * CAST({_AP_Q} AS BIGINT)) // r
               ELSE 0 END) AS BIGINT) AS ap_q
      FROM tp_t GROUP BY qid
    )
    SELECT agg.qid AS query_id,
           coalesce(n_rel.n_rel, 0) AS n_rel, n_hits, ap_q,
           CASE WHEN coalesce(n_rel.n_rel, 0) > 0 THEN
             cast(ap_q as double)
             / ({float(_AP_Q)!r}e0 * cast(n_rel.n_rel as double))
             END AS ap
    FROM agg LEFT JOIN n_rel ON agg.qid = n_rel.qid
"""


@gate("average_precision", _AP_SQL)
def q_average_precision(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    runs, qrels = _ir_dfs(spark, sf_dir)
    return ops_sim.average_precision(
        runs, qrels, k=_IR_K, query_id="qid", doc_id="did",
        rank="r", rel="rl",
    ).withColumnRenamed("qid", "query_id")


_RC_KS = [1, 5, 10]
_RC_SQL = f"""
    WITH {_IR_RUNS},
    rel_j AS (
      SELECT runs.qid, runs.r
      FROM runs JOIN (SELECT DISTINCT qid, did FROM qrels
                      WHERE rl > 0) g
        ON runs.qid = g.qid AND runs.did = g.did
    ),
    ladder AS (
      SELECT qid, CAST(t.k AS BIGINT) AS k
      FROM rel_j,
           (SELECT unnest([{", ".join(map(str, _RC_KS))}]) AS k) t
      WHERE r <= t.k
    ),
    hits AS (
      SELECT qid, k, CAST(count(*) AS BIGINT) AS n_hits
      FROM ladder GROUP BY qid, k
    ),
    n_rel AS (
      SELECT qid, CAST(count(DISTINCT did) AS BIGINT) AS n_rel
      FROM qrels WHERE rl > 0 GROUP BY qid
    )
    SELECT hits.qid AS query_id, k, n_rel, n_hits,
           CASE WHEN n_rel > 0 THEN cast(n_hits as double)
             / cast(n_rel as double) END AS recall
    FROM hits JOIN n_rel ON hits.qid = n_rel.qid
"""


@gate("recall_at_k", _RC_SQL)
def q_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs, qrels = _ir_dfs(spark, sf_dir)
    return ops_sim.recall_at_k(
        runs, qrels, ks=_RC_KS, query_id="qid", doc_id="did",
        rank="r", rel="rl",
    ).withColumnRenamed("qid", "query_id")
