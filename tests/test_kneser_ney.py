"""Kneser-Ney bigram LM: exact equality with a brute-force python
replication, and the continuation-count pathology fix (a frequent
word glued to one context must get LESS backoff mass than a rarer
word seen after many contexts)."""

from collections import Counter

from pdal_spark.operators.textops import KN_Q, kneser_ney_bigram


def _brute_kn(docs):
    bg = Counter()
    for d in docs:
        ws = d.split(" ")
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] += 1
    c1 = Counter()
    n1w1 = Counter()
    ncont = Counter()
    for (a, b), c in bg.items():
        c1[a] += c
        n1w1[a] += 1
        ncont[b] += 1
    ntot = len(bg)
    out = {}
    for (a, b), c in bg.items():
        num = KN_Q * (4 * c - 3) * ntot \
            + KN_Q * 3 * n1w1[a] * ncont[b]
        out[(a, b)] = num // (4 * c1[a] * ntot)
    return out


def test_matches_brute_force_exactly(spark):
    docs = [
        "san francisco is in california",
        "san francisco fog rolls in",
        "new york is in new york state",
        "the bay near san francisco is cold",
        "york minster is in york",
    ]
    want = _brute_kn(docs)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    got = {(r.w1, r.w2): r.pkn_q
           for r in kneser_ney_bigram(df).collect()}
    assert got == want


def test_continuation_counts_beat_raw_frequency(spark):
    # "francisco" occurs 3x but ONLY after "san"; "is" occurs 4x
    # after 3 different words. Raw-frequency backoff would rank
    # P(francisco | unseen-ish context) ~ P(is | ...); KN's
    # continuation count crushes francisco's backoff share.
    docs = [
        "san francisco is big",
        "san francisco is old",
        "san francisco here",
        "york is cold",
        "fog is thick",
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    rows = {(r.w1, r.w2): r for r in
            kneser_ney_bigram(df).collect()}
    assert rows[("san", "francisco")].ncont == 1
    assert rows[("york", "is")].ncont == 3
    # both ("san","francisco") c12=3 and "is" bigrams share counts;
    # sum-to-one sanity within truncation: sum over observed w2 of
    # P(w2|san) <= 1 (discount mass reserved for unseen)
    p_san = sum(r.pkn_q for (a, _), r in rows.items() if a == "san")
    assert p_san <= KN_Q


def test_min_count_filters_output_not_stats(spark):
    docs = ["a b a b a c", "a b d"]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    full = {(r.w1, r.w2): r for r in kneser_ney_bigram(df).collect()}
    filt = {(r.w1, r.w2): r for r in
            kneser_ney_bigram(df, min_count=2).collect()}
    assert set(filt) == {k for k, r in full.items() if r.c12 >= 2}
    for k, r in filt.items():
        assert r.pkn_q == full[k].pkn_q  # stats unchanged by filter
