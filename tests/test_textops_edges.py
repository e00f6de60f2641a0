"""Degenerate-input edge cases for the curation ops added late in
round 1: empty text, single token, punctuation-only, whitespace runs.
At corpus scale these rows WILL occur; ops must not crash and must
keep their documented semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import dedup as D
from pdal_spark.operators import textops as T


@pytest.fixture(scope="module")
def edge_docs(spark):
    rows = [
        (0, ""),
        (1, "solo"),
        (2, "!!! ,,, ..."),
        (3, "a  b   c"),          # whitespace runs
        (4, "the and of to in a is it for on the and"),  # stopwordy
        (5, "normal words appear here with the usual shape"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_normalize_text_edges(edge_docs):
    out = {r.doc_id: r.norm_text
           for r in T.normalize_text(edge_docs).collect()}
    assert out[0] == ""
    assert out[2] == ""            # punct-only collapses to empty
    assert out[3] == "a b c"       # runs collapse
    assert out[1] == "solo"


def test_bpe_pair_counts_edges(spark, edge_docs):
    # must not crash on empty/single-token docs (sequence guard)
    out = T.bpe_pair_counts(edge_docs, min_count=1).toPandas()
    assert (out.n_pairs >= 1).all()
    assert set(out.columns) == {"left_tok", "right_tok", "n_pairs"}


def test_winnow_edges(edge_docs):
    # docs shorter than n + w - 1 tokens yield no fingerprints,
    # never an error (doc 3 qualifies: single-space split keeps
    # empty tokens, the family's shared semantics)
    out = D.winnow_fingerprints(edge_docs, w=4).toPandas()
    assert set(out.doc_id) <= {3, 4, 5}
    assert {4, 5} <= set(out.doc_id)


def test_gopher_rules_edges(edge_docs):
    out = T.gopher_rules(edge_docs.where(F.col("doc_id") > 0))
    pdf = out.toPandas().set_index("doc_id")
    assert pdf.loc[1, "r_word_count"] == 0   # 1 word < 5
    assert pdf.loc[4, "r_top_bigram"] == 0   # "the and" dominates
    assert set(pdf.keep.unique()) <= {0, 1}


def test_corpus_split_edges(edge_docs):
    out = T.corpus_split(edge_docs).toPandas()
    assert set(out.split) <= {"train", "val", "test"}
    assert len(out) == 6            # exhaustive: no row lost


def test_redact_pii_no_pii_is_identity(edge_docs):
    out = T.redact_pii(edge_docs).toPandas().set_index("doc_id")
    assert (out[["n_emails", "n_phones", "n_ips"]].sum(axis=1) == 0).all()
    src = {r.doc_id: r.text for r in edge_docs.collect()}
    assert all(out.loc[i, "clean_text"] == src[i] for i in src)


def test_canonical_url_no_scheme_passthrough(spark):
    df = spark.createDataFrame(
        [("no-scheme/path?q=1",), ("HTTP://A.B/c#f",)], "url string"
    )
    out = {r.url: r.canon_url for r in T.canonical_url(df).collect()}
    assert out["HTTP://A.B/c#f"] == "http://a.b/c"
    # schemeless input: query stripped, rest untouched
    assert out["no-scheme/path?q=1"] == "no-scheme/path"


def test_normalize_text_idempotent(spark):
    """normalize(normalize(x)) == normalize(x): the canonical form is
    a fixpoint, so re-running the stage can never change hash keys."""
    cases = [
        "", " ", "  a  ", "A!B@C#D", "ümlaut ÅNGSTRÖM ß",
        "tabs\tand\nnewlines", "123  456!!789", "a" * 500,
        "mixed CASE with   runs,,,and---dashes", "🙂 emoji 🙂",
        "'quotes' \"double\" `back`", "trailing punct...",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "doc_id long, text string"
    )
    once = T.normalize_text(df).withColumnRenamed("norm_text", "text")
    twice = T.normalize_text(once).toPandas().set_index("doc_id")
    first = T.normalize_text(df).toPandas().set_index("doc_id")
    assert (twice["norm_text"] == first["norm_text"]).all()
    # charset invariant: only [a-z0-9 ] survives, no double spaces
    import re
    for v in first["norm_text"]:
        assert re.fullmatch(r"[a-z0-9]+( [a-z0-9]+)*", v) or v == ""
