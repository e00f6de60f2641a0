"""Gate registry extension 78 — ANN quality evaluation: recall@k of
the trained-IVF index against the exact cosine top-k on the same 20
queries (THE metric an index must report before it replaces brute
force at corpus scale). Oracle nests the two existing gate bodies
and intersects the id sets; recall is an exact integer ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext7 import (
    _IVF_K,
    _IVF_NL,
    _IVF_NP,
    _cos_sql,
    _ivf_trained_sql,
)

RECALL_Q = 1 << 20


def _ann_recall_sql() -> str:
    ivf = _ivf_trained_sql(_IVF_NL, _IVF_NP, _IVF_K)
    return f"""
    WITH exact AS MATERIALIZED (
      SELECT query_id, nb_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS nb_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_cos_sql('q.qv', 'c.cv')} DESC,
                          c.vec_id ASC
               ) AS rn
        FROM (SELECT vec_id, cast(embedding as double[]) AS qv
              FROM embeddings WHERE vec_id < 20) q,
             (SELECT vec_id, cast(embedding as double[]) AS cv
              FROM embeddings) c
        WHERE q.vec_id <> c.vec_id
      ) t WHERE rn <= {_IVF_K}
    ),
    approx AS MATERIALIZED (
      SELECT query_id, nb_id FROM ({ivf}) v
    ),
    hits AS (
      SELECT e.query_id, count(*) AS n_hit
      FROM exact e JOIN approx a
        ON a.query_id = e.query_id AND a.nb_id = e.nb_id
      GROUP BY 1
    )
    SELECT e.query_id,
           count(*) AS n_exact,
           CAST(coalesce(any_value(h.n_hit), 0) AS BIGINT) AS n_hit,
           (CAST(coalesce(any_value(h.n_hit), 0) AS BIGINT)
            * {RECALL_Q}) // {_IVF_K} AS recall_q
    FROM exact e LEFT JOIN hits h ON h.query_id = e.query_id
    GROUP BY 1
    """


@gate("ann_recall", _ann_recall_sql())
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import similarity as ops_sim

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 20)
    exact = ops_sim.cosine_topk(qs, emb, k=_IVF_K).select(
        "query_id", "nb_id"
    )
    approx = ops_sim.ivf_trained_topk(
        qs, emb, k=_IVF_K, nlist=_IVF_NL, nprobe=_IVF_NP,
    ).select("query_id", "nb_id")
    hits = exact.join(approx, on=["query_id", "nb_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(hits, on="query_id", how="left")
        .select(
            "query_id", "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint")
            .alias("n_hit"),
            F.expr(
                f"(coalesce(n_hit, 0) * {RECALL_Q}) div {_IVF_K}"
            ).alias("recall_q"),
        )
    )

