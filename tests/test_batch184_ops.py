"""Invariant tests for batch 184: RBP, judged@k."""

from __future__ import annotations

from pdal_spark.operators.similarity import judged_at_k, rbp_eval


def _dfs(spark, run_rows, qrel_rows):
    runs = spark.createDataFrame(run_rows,
                                 "qid long, did long, r long")
    qrels = spark.createDataFrame(qrel_rows,
                                  "qid long, did long, rl long")
    return runs, qrels


def test_rbp_known_values(spark):
    # relevant at ranks 1 and 2 with p=0.8:
    # RBP = 0.2 * (1 + 0.8) = 0.36
    runs, qrels = _dfs(
        spark,
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        [(1, 10, 1), (1, 11, 1)],
    )
    r = rbp_eval(runs, qrels, k=10, query_id="qid",
                 doc_id="did", rank="r", rel="rl").collect()[0]
    assert abs(r["rbp"] - 0.36) < 1e-6


def test_rbp_top_heavier_than_tail(spark):
    runs, qr_top = _dfs(spark, [(1, d, d) for d in range(1, 6)],
                        [(1, 1, 1)])
    _, qr_tail = _dfs(spark, [], [(1, 5, 1)])
    top = rbp_eval(runs, qr_top, query_id="qid", doc_id="did",
                   rank="r", rel="rl").collect()[0]["rbp"]
    tail = rbp_eval(runs, qr_tail, query_id="qid", doc_id="did",
                    rank="r", rel="rl").collect()[0]["rbp"]
    assert top > 2 * tail


def test_judged_at_k(spark):
    runs, qrels = _dfs(
        spark,
        [(1, d, d) for d in range(1, 5)],
        [(1, 1, 1), (1, 3, 0)],
    )
    r = judged_at_k(runs, qrels, k=10, query_id="qid",
                    doc_id="did", rank="r").collect()[0]
    # docs 1 and 3 judged (rel value irrelevant) -> 2/4
    assert r["n_judged"] == 2 and abs(r["coverage"] - 0.5) < 1e-12
