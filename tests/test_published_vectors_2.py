"""Second batch of reference-independent pins (VERDICT r2 #7,
beyond the PageRank/BM25/UTM starters): hand-derivable literal
results for the rank-correlation, entropy, Zipf, ACF, Benford and
edit-distance families — independent of the sqlgen formula strings
both engines share."""

from __future__ import annotations

import math


def test_kendall_tau_hand_example(spark):
    """x=(1..5), y=(2,1,4,3,5): nc=8, nd=2 (hand-enumerated),
    no ties -> tau_b = (8-2)/10 = 0.6."""
    from pdal_spark.operators.stats import kendall_tau

    rows = [(1, 1, 2), (2, 2, 1), (3, 3, 4), (4, 4, 3), (5, 5, 5)]
    df = spark.createDataFrame(rows, "pid long, x long, y long")
    r = kendall_tau(df, "x", "y", "pid").collect()[0]
    assert abs(r["tau_b"] - 0.6) < 1e-12


def test_kendall_tau_perfect_and_reversed(spark):
    from pdal_spark.operators.stats import kendall_tau

    inc = [(i, i, i) for i in range(1, 8)]
    dec = [(i, i, 8 - i) for i in range(1, 8)]
    df1 = spark.createDataFrame(inc, "pid long, x long, y long")
    df2 = spark.createDataFrame(dec, "pid long, x long, y long")
    assert abs(kendall_tau(df1, "x", "y", "pid")
               .collect()[0]["tau_b"] - 1.0) < 1e-12
    assert abs(kendall_tau(df2, "x", "y", "pid")
               .collect()[0]["tau_b"] + 1.0) < 1e-12


def test_levenshtein_textbook_pair(spark):
    """saturday -> sunday = 3, the classic dynamic-programming
    textbook vector (both share prefix 's', so blocking keeps it)."""
    from pdal_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "saturday"), (2, "sunday")], "doc_id long, key string"
    )
    out = edit_distance_pairs(df, "key", k=3, prefix=1).collect()
    assert len(out) == 1
    assert out[0]["dist"] == 3


def test_char_entropy_uniform_and_degenerate(spark):
    """8 distinct chars -> H = ln 8 nats; a single repeated char
    -> H = 0 exactly."""
    from pdal_spark.operators.textops import char_entropy

    df = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "aaaaaaaa")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert abs(got[1]["entropy"] - math.log(8.0)) < 1e-5
    assert got[2]["entropy"] == 0.0


def test_zipf_slope_exact_power_law(spark):
    """Frequencies 12/6/4/3 = 12/rank: ln f = ln 12 - ln r, so the
    OLS slope over (ln r, ln f) is -1 up to the 2^-10 ln grid."""
    from pdal_spark.operators.textops import zipf_fit

    text = " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = zipf_fit(df, top_n=4).collect()[0]
    assert r["n_terms"] == 4
    assert abs(r["slope"] + 1.0) < 0.01


def test_acf_alternating_series_exact(spark):
    """x alternates 1,3 over n=10 (mean 2): scaled deviations are
    +-10, so r1 = -9*100/1000 = -0.9 = -(n-1)/n and
    r2 = 8*100/1000 = 0.8, both exact."""
    from pdal_spark.operators.temporal import acf

    rows = [(0, t, 1 if t % 2 == 0 else 3) for t in range(10)]
    df = spark.createDataFrame(rows, "k long, o long, v long")
    got = {r["lag"]: r["r"] for r in
           acf(df, key="k", order="o", value="v", max_lag=2).collect()}
    assert got[1] == -0.9
    assert got[2] == 0.8


def test_benford_expected_constants(spark):
    """One value per leading digit 1..9: obs = 1 each, n = 9, and
    expected_d = 9 * log10(1 + 1/d) — the published Benford
    probabilities."""
    from pdal_spark.operators.stats import benford_deviation

    df = spark.createDataFrame(
        [(float(d),) for d in range(1, 10)], "v double"
    )
    rows = benford_deviation(df, "v").collect()
    assert len(rows) == 9
    for r in rows:
        assert r["obs"] == 1
        want = 9.0 * math.log10(1.0 + 1.0 / r["digit"])
        assert abs(r["expected"] - want) < 1e-9
        chi = (1.0 - want) ** 2 / want
        assert abs(r["contrib"] - chi) < 1e-9
