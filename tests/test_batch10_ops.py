"""Batch-10 ops: bbox_join, trigram_logprob, kwic_snippets."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import overlay as ops_overlay
from pdal_spark.operators import textops as ops_text


def test_bbox_join_no_duplicates_across_cells(spark):
    # A big box spanning many cells overlaps a small box: exactly ONE
    # output row despite both exploding over shared cells.
    lb = spark.createDataFrame(
        [(1, 0.0, 30.0, 0.0, 30.0)], ["lid", "x0", "x1", "y0", "y1"]
    )
    rb = spark.createDataFrame(
        [
            (10, 5.0, 6.0, 5.0, 6.0),      # inside
            (11, 29.5, 35.0, 29.5, 35.0),  # corner overlap
            (12, 31.0, 33.0, 0.0, 1.0),    # disjoint (x)
            (13, 30.0, 40.0, 30.0, 40.0),  # touching corner (closed)
        ],
        ["rid", "x0", "x1", "y0", "y1"],
    )
    out = ops_overlay.bbox_join(lb, rb, cell=4.0).collect()
    got = sorted((r.lid, r.rid) for r in out)
    assert got == [(1, 10), (1, 11), (1, 13)]
    assert len(out) == 3  # responsibility dedup: no repeats


def test_trigram_backoff_orders(spark):
    # train has "a b c"; score "a b c" (trigram hit), "x b c"
    # (bigram backoff via (b,c)), "x y z" (unigram backoff).
    train = spark.createDataFrame(
        [(0, "a b c a b c")], ["doc_id", "text"]
    )
    score = spark.createDataFrame(
        [(1, "a b c"), (3, "x b c"), (5, "x y z")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in
           ops_text.trigram_logprob(score, train_df=train).collect()}
    assert out[1].n_trigrams == 1
    # exact trigram hit scores higher than bigram backoff, which
    # scores higher than unseen-everything
    assert out[1].lm3_q > out[3].lm3_q > out[5].lm3_q


def test_kwic_snippet_window_and_count(spark):
    df = spark.createDataFrame(
        [(1, "aaa needle bbb needle ccc"), (2, "no match here")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in
           ops_text.kwic_snippets(df, "needle", width=4).collect()}
    assert set(out) == {1}
    r = out[1]
    assert r.first_pos == 5
    assert r.n_matches == 2
    assert r.snippet == "aaa needle bbb"[: 4 * 2 + 6]
