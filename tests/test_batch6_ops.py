"""Batch-6 ops: neighbor_jaccard, textrank_keywords."""

import pyspark.sql.functions as F

from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import textops as ops_text


def test_neighbor_jaccard_path_graph(spark):
    # Path 1-2-3-4: open pairs (1,3) and (2,4) share exactly one
    # neighbor; Jaccard = 1 / (deg+deg-1).
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["src", "dst"]
    )
    out = {(r.u, r.w): (r.cn, r.jacc_q)
           for r in ops_graph.neighbor_jaccard(e).collect()}
    q = ops_graph.JACC_Q
    # deg(1)=1, deg(3)=2 -> union = 1+2-1 = 2
    assert out[(1, 3)] == (1, q // 2)
    assert out[(2, 4)] == (1, q // 2)
    assert set(out) == {(1, 3), (2, 4)}


def test_neighbor_jaccard_include_adjacent_and_cap(spark):
    # Triangle + pendant: adjacent pair (1,2) shares neighbor 3.
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"]
    )
    adj = ops_graph.neighbor_jaccard(e, include_adjacent=True)
    got = {(r.u, r.w): r.cn for r in adj.collect()}
    assert got[(1, 2)] == 1  # common neighbor 3
    # cap drops the hub (node 3, degree 3) as a wedge CENTER:
    capped = ops_graph.neighbor_jaccard(e, max_degree=2)
    pairs = {(r.u, r.w) for r in capped.collect()}
    assert (1, 4) not in pairs and (2, 4) not in pairs
    assert (1, 2) not in pairs  # adjacent excluded by default


def test_textrank_prefers_connected_hub_word(spark):
    # "core" co-occurs with many distinct words; "fringe" with one.
    rows = [
        (1, "core alpha"), (2, "core beta"), (3, "core gamma"),
        (4, "core delta"), (5, "fringe epsilon"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = ops_text.textrank_keywords(df, iters=2, top_k=10).collect()
    ranks = {r.word: r.rank_q for r in out}
    assert ranks["core"] > ranks["fringe"]
    assert out[0].word == "core"


def test_textrank_stopwords_never_nodes(spark):
    df = spark.createDataFrame(
        [(1, "the alpha of beta the alpha")], ["doc_id", "text"]
    )
    words = {r.word for r in
             ops_text.textrank_keywords(df, top_k=10).collect()}
    assert "the" not in words and "of" not in words
    # stopword removal makes alpha/beta adjacent twice -> one edge
    assert words == {"alpha", "beta"}
