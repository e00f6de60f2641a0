"""Corpus-hygiene batch: line_dedup (C4 boilerplate removal),
luhn_flags (payment-card checksum), url_path_rollup (path-subtree
counts)."""

from pyspark.sql import functions as F

from pdal_spark.operators.textops import (
    line_dedup,
    luhn_flags,
    url_path_rollup,
)


def test_line_dedup_drops_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, "subscribe now\nunique alpha\nshort"),
            (2, "subscribe now\nunique beta"),
            (3, "subscribe now\nunique gamma\nshort"),
            (4, "all boilerplate\nsubscribe now"),
            (5, "all boilerplate\nunique delta"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.text, r.n_kept, r.n_dropped)
        for r in line_dedup(docs, min_docs=2, min_len=6).collect()
    }
    # 'subscribe now' in 4 docs, 'all boilerplate' in 2 -> dropped;
    # 'short' (5 chars < min_len) kept though it repeats
    assert out[1] == ("unique alpha\nshort", 2, 1)
    assert out[2] == ("unique beta", 1, 1)
    assert out[3] == ("unique gamma\nshort", 2, 1)
    assert out[4] == ("", 0, 2)  # fully-boilerplate doc survives empty
    assert out[5] == ("unique delta", 1, 1)


def test_line_dedup_keep_first(spark):
    docs = spark.createDataFrame(
        [(1, "dup line\nown a"), (2, "own b\ndup line"),
         (3, "dup line\nown c")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in line_dedup(
            docs, min_docs=2, min_len=3, keep_first=True
        ).collect()
    }
    # globally-first occurrence (doc 1, pos 0) kept, others dropped
    assert out[1] == "dup line\nown a"
    assert out[2] == "own b"
    assert out[3] == "own c"


def test_luhn_flags_known_cards(spark):
    docs = spark.createDataFrame(
        [
            # 4532015112830366 is Luhn-valid; 1234567890123456 is not
            (1, "pay 4532015112830366 or 1234567890123456 ok"),
            (2, "id 123456789012 too short, none here"),
            (3, "packed:79927398713zzz"),  # 11 digits -> filtered
        ],
        "doc_id long, text string",
    )
    rows = luhn_flags(docs).collect()
    got = {(r.doc_id, r.cand_idx): (r.cand, r.n_digits, r.luhn_valid)
           for r in rows}
    assert got[(1, 0)] == ("4532015112830366", 16, 1)
    assert got[(1, 1)] == ("1234567890123456", 16, 0)
    assert not [k for k in got if k[0] in (2, 3)]


def test_url_path_rollup_subtrees(spark):
    urls = [
        "https://a.com/x/y/p1",
        "https://a.com/x/y/p2",
        "https://a.com/x/z?q=1",
        "https://a.com/",
        "https://a.com/x/y/p1",  # dup page -> n_urls < n_pages
        "http://B.com/only#frag",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = {
        (r.host, r.depth, r.prefix): (r.n_pages, r.n_urls)
        for r in url_path_rollup(df, max_depth=3).collect()
    }
    assert out[("a.com", 0, "/")] == (5, 4)
    assert out[("a.com", 1, "/x")] == (4, 3)
    assert out[("a.com", 2, "/x/y")] == (3, 2)
    assert out[("a.com", 3, "/x/y/p1")] == (2, 1)
    assert out[("a.com", 2, "/x/z")] == (1, 1)
    assert out[("b.com", 1, "/only")] == (1, 1)
    # fragment/query never leak into prefixes
    assert not [p for (_, _, p) in out if "#" in p or "?" in p]


def test_line_dedup_plan_has_no_window(spark):
    """The corpus-wide count must be a hash aggregate, never a
    global window sort."""
    docs = spark.createDataFrame(
        [(1, "a\nb")], "doc_id long, text string"
    )
    plan = line_dedup(docs, min_docs=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in plan
