"""Batch-5 ops: rake_keywords, phrase_search, zipf_fit."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import textops as ops_text


def test_rake_scores_multiword_runs_over_stopword_bound(spark):
    # "alpha beta" is a recurring 2-word run -> each word deg=2
    # freq=1 -> phrase_q = 2*(2Q). "gamma" always sits alone between
    # stopwords -> deg=freq -> score Q.
    q = ops_text.RAKE_Q
    df = spark.createDataFrame(
        [
            (1, "alpha beta the gamma"),
            (2, "alpha beta of gamma"),
        ],
        ["doc_id", "text"],
    )
    out = {r.phrase: r for r in ops_text.rake_keywords(df).collect()}
    assert out["alpha beta"].phrase_q == 4 * q
    assert out["alpha beta"].n_occ == 2
    assert out["gamma"].phrase_q == 1 * q
    # ranking: multiword phrase first
    top = ops_text.rake_keywords(df, top_k=1).collect()[0]
    assert top.phrase == "alpha beta"


def test_rake_stopword_only_doc_yields_nothing(spark):
    df = spark.createDataFrame(
        [(1, "the of and"), (2, "solo")], ["doc_id", "text"]
    )
    phrases = {r.phrase for r in ops_text.rake_keywords(df).collect()}
    assert phrases == {"solo"}


def test_phrase_search_overlap_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "b b b x"),       # "b b" matches at pos 0 and 1
            (2, "a b c b b"),     # one match
            (3, "b x b"),         # none
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.n_matches
        for r in ops_text.phrase_search(df, ["b", "b"]).collect()
    }
    assert out == {1: 2, 2: 1}

    tri = {
        r.doc_id: r.n_matches
        for r in ops_text.phrase_search(df, ["a", "b", "c"]).collect()
    }
    assert tri == {2: 1}


def test_zipf_slope_of_exact_power_law(spark):
    # freq(rank) = C / rank exactly -> slope == -1 up to ln
    # quantization error.
    rows = []
    doc = 0
    for rank, word in enumerate(["w%d" % i for i in range(8)], start=1):
        n = 840 // rank  # 840 divisible by 1..8
        for _ in range(n):
            rows.append((doc, word))
            doc += 1
    df = (
        spark.createDataFrame(rows, ["doc_id", "text"])
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("text")).alias("text"))
    )
    out = ops_text.zipf_fit(df, top_n=8).collect()[0]
    assert out.n_terms == 8
    assert out.den > 0
    assert abs(out.slope + 1.0) < 0.02
