"""Gate registry extension 218 — IR-eval batch: rank-biased
precision and judged@k coverage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import similarity as ops_sim

_IR_K = 10
_IR_Q = ops_sim.RBP_Q
_IR_PRED = "event_id % 17 = 0"
# runs: per query (user bucket) ranked docs; ranks via row_number
_IR_RUNS = f"""
    runs AS MATERIALIZED (
      SELECT qid, did,
             CAST(row_number() OVER (PARTITION BY qid
               ORDER BY eid ASC) AS BIGINT) AS r
      FROM (
        SELECT user_id % 12 AS qid,
               CAST({G.lehmer2('event_id')} % 200 AS BIGINT)
                 AS did,
               event_id AS eid
        FROM events WHERE {_IR_PRED}
      ) t
    ),
    qrels AS MATERIALIZED (
      SELECT DISTINCT user_id % 12 AS qid,
             CAST({G.lehmer2('event_id * 3 + 1')} % 200 AS BIGINT)
               AS did,
             CAST(1 AS BIGINT) AS rl
      FROM events WHERE event_id % 5 = 0
    )
"""


def _rbp_cases() -> str:
    return " ".join(
        f"WHEN r = {r} THEN CAST(b AS BIGINT)"
        f" * CAST({4 ** (r - 1)} AS BIGINT)"
        f" * CAST({_IR_Q} AS BIGINT)"
        f" // CAST({5 ** (r - 1)} AS BIGINT)"
        for r in range(1, _IR_K + 1)
    )


_RBP_SQL = f"""
    WITH {_IR_RUNS},
    j AS (
      SELECT runs.qid, runs.r,
             CASE WHEN qrels.rl IS NOT NULL AND qrels.rl > 0
               THEN 1 ELSE 0 END AS b
      FROM runs LEFT JOIN qrels
        ON runs.qid = qrels.qid AND runs.did = qrels.did
      WHERE runs.r <= {_IR_K}
    ),
    agg AS (
      SELECT qid, CAST(count(*) AS BIGINT) AS n_ranked,
             CAST(sum(CASE {_rbp_cases()} ELSE 0 END) AS BIGINT)
               AS w_q
      FROM j GROUP BY qid
    )
    SELECT qid AS query_id, n_ranked, w_q AS rbp_q,
           cast(w_q as double) / {float(_IR_Q)!r}e0
             * {float(1 - 4 / 5)!r}e0 AS rbp
    FROM agg
"""


def _ir_dfs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("eid").asc())
    runs = (
        ev.where(_IR_PRED)
        .select(
            (F.col("user_id") % 12).alias("qid"),
            F.expr(
                f"cast({G.lehmer2('event_id')} % 200 as bigint)"
            ).alias("did"),
            F.col("event_id").alias("eid"),
        )
        .withColumn("r", F.row_number().over(w).cast("long"))
        .select("qid", "did", "r")
    )
    qrels = ev.where("event_id % 5 = 0").select(
        (F.col("user_id") % 12).alias("qid"),
        F.expr(
            f"cast({G.lehmer2('event_id * 3 + 1')} % 200"
            " as bigint)"
        ).alias("did"),
        F.lit(1).cast("long").alias("rl"),
    ).distinct()
    return runs, qrels


@gate("rbp_eval", _RBP_SQL)
def q_rbp_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs, qrels = _ir_dfs(spark, sf_dir)
    return ops_sim.rbp_eval(
        runs, qrels, k=_IR_K, query_id="qid", doc_id="did",
        rank="r", rel="rl",
    ).withColumnRenamed("qid", "query_id")


_JK_SQL = f"""
    WITH {_IR_RUNS},
    j AS (
      SELECT runs.qid,
             CASE WHEN qrels.rl IS NOT NULL THEN 1 ELSE 0 END
               AS jd
      FROM runs LEFT JOIN (SELECT DISTINCT qid, did, rl
                           FROM qrels) qrels
        ON runs.qid = qrels.qid AND runs.did = qrels.did
      WHERE runs.r <= {_IR_K}
    )
    SELECT qid AS query_id,
           CAST(count(*) AS BIGINT) AS n_ranked,
           CAST(sum(jd) AS BIGINT) AS n_judged,
           CASE WHEN count(*) > 0 THEN cast(sum(jd) as double)
             / cast(count(*) as double) END AS coverage
    FROM j GROUP BY qid
"""


@gate("judged_at_k", _JK_SQL)
def q_judged_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs, qrels = _ir_dfs(spark, sf_dir)
    return ops_sim.judged_at_k(
        runs, qrels, k=_IR_K, query_id="qid", doc_id="did",
        rank="r",
    ).withColumnRenamed("qid", "query_id")
