"""Invariant tests for batch 187: AP, recall@k."""

from __future__ import annotations

from pdal_spark.operators.similarity import (
    average_precision,
    recall_at_k,
)


def _dfs(spark, run_rows, qrel_rows):
    runs = spark.createDataFrame(run_rows,
                                 "qid long, did long, r long")
    qrels = spark.createDataFrame(qrel_rows,
                                  "qid long, did long, rl long")
    return runs, qrels


def test_ap_textbook(spark):
    # hits at ranks 1 and 3 of 2 relevant:
    # AP = (1/1 + 2/3)/2 = 5/6
    runs, qrels = _dfs(
        spark,
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        [(1, 10, 1), (1, 12, 1)],
    )
    r = average_precision(runs, qrels, query_id="qid",
                          doc_id="did", rank="r",
                          rel="rl").collect()[0]
    assert abs(r["ap"] - 5 / 6) < 1e-5


def test_recall_ladder(spark):
    runs, qrels = _dfs(
        spark,
        [(1, d, d) for d in range(1, 11)],
        [(1, 2, 1), (1, 7, 1), (1, 99, 1)],
    )
    out = {r["k"]: r for r in recall_at_k(
        runs, qrels, ks=[1, 5, 10], query_id="qid",
        doc_id="did", rank="r", rel="rl").collect()}
    assert out[5]["n_hits"] == 1 and abs(out[5]["recall"] - 1 / 3) < 1e-12
    assert out[10]["n_hits"] == 2
