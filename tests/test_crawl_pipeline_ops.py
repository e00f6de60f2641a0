"""Semantics pins for the crawl/retrieval batch: politeness
scheduling vs the sequential recurrence, robots longest-match/tie
rules, anchor-text top-k, PMI sign sanity, MaxSim vs brute force,
calibration-bin ECE math."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators.graph import anchor_text_agg
from pdal_spark.operators.similarity import maxsim_topk
from pdal_spark.operators.stats import calibration_bins
from pdal_spark.operators.temporal import politeness_schedule
from pdal_spark.operators.textops import pmi_collocations, \
    robots_rules


def test_politeness_matches_sequential_recurrence(spark):
    rng = np.random.RandomState(3)
    n = 500
    pdf = pd.DataFrame({
        "rid": np.arange(n),
        "host": rng.randint(0, 5, n),
        "arrival_us": rng.randint(0, 10**7, n).astype("i8"),
    })
    d = 250_000
    out = (politeness_schedule(
        spark.createDataFrame(pdf).repartition(7),
        "host", "arrival_us", d, "rid")
        .toPandas().sort_values(["host", "seq"]))
    for h, grp in out.groupby("host"):
        fetch = None
        for _, row in grp.iterrows():
            want = (row["arrival_us"] if fetch is None
                    else max(row["arrival_us"], fetch + d))
            assert row["fetch_us"] == want
            assert row["wait_us"] == want - row["arrival_us"]
            fetch = want


def test_robots_longest_match_and_ties(spark):
    rules = spark.createDataFrame(pd.DataFrame({
        "host": ["a", "a", "a", "a", "b"],
        "path_prefix": ["/", "/private", "/private/ok", "/private",
                        "/x"],
        "allow": [True, False, True, True, False],
    }))
    urls = spark.createDataFrame(pd.DataFrame({
        "url_id": [1, 2, 3, 4, 5],
        "host": ["a", "a", "a", "b", "c"],
        "path": ["/public/page", "/private/secret",
                 "/private/ok/page", "/y", "/anything"],
    }))
    out = robots_rules(urls, rules).toPandas() \
        .set_index("url_id").sort_index()
    assert out.loc[1, "allowed"]            # only '/' matches
    # '/private' matches twice (allow+disallow) -> tie -> allow wins
    assert out.loc[2, "allowed"]
    assert out.loc[2, "rule_prefix"] == "/private"
    # longest match '/private/ok' (allow) beats '/private'
    assert out.loc[3, "allowed"]
    assert out.loc[3, "rule_prefix"] == "/private/ok"
    # host with rules but no matching prefix -> default allowed
    assert out.loc[4, "allowed"] and out.loc[4, "rule_len"] == 0
    # host with no rules at all -> default allowed
    assert out.loc[5, "allowed"] and out.loc[5, "rule_prefix"] == ""


def test_anchor_topk_and_source_counts(spark):
    edges = spark.createDataFrame(pd.DataFrame({
        "src": [1, 1, 2, 3, 4, 5, 1],
        "dst": [9, 9, 9, 9, 9, 9, 8],
        "anchor": ["home", "home", "home", "news", "news", "blog",
                   "x"],
    }))
    out = anchor_text_agg(edges, top_k=2).toPandas()
    d9 = out[out["dst"] == 9].sort_values("rank")
    assert list(d9["anchor"]) == ["home", "news"]
    assert list(d9["c_anchor"]) == [3, 2]
    assert d9["n_anchors"].iloc[0] == 6
    assert d9["n_srcs"].iloc[0] == 5
    assert len(out[out["dst"] == 8]) == 1


def test_pmi_prefers_exclusive_pairs(spark):
    # "aa bb" always adjacent and exclusive; "cc" everywhere
    docs = spark.createDataFrame(pd.DataFrame({
        "text": ["aa bb cc dd", "aa bb cc ee", "cc dd cc ee",
                 "dd cc ee cc", "aa bb dd ee"],
    }))
    out = pmi_collocations(docs, min_count=2, top_k=5).toPandas()
    assert out.iloc[0]["a"] == "aa" and out.iloc[0]["b"] == "bb"
    assert out.iloc[0]["rank"] == 1
    assert (out["pmi_q"].values[:-1] >= out["pmi_q"].values[1:]).all()


def test_maxsim_matches_bruteforce(spark):
    rng = np.random.RandomState(11)
    qt = pd.DataFrame({
        "query_id": [0, 0, 1, 1],
        "qtok_id": [0, 1, 2, 3],
        "embedding": [rng.uniform(-1, 1, 8).astype("f4").tolist()
                      for _ in range(4)],
    })
    dt = pd.DataFrame({
        "doc_id": np.repeat(np.arange(6), 3),
        "embedding": [rng.uniform(-1, 1, 8).astype("f4").tolist()
                      for _ in range(18)],
    })
    out = maxsim_topk(spark.createDataFrame(qt),
                      spark.createDataFrame(dt), k=6).toPandas()

    def quant(v):
        return np.floor(np.asarray(v, dtype="f8") * 1e6 + 0.5) \
            .astype("i8")

    for q in (0, 1):
        qs = [quant(v) for v in
              qt[qt["query_id"] == q]["embedding"]]
        for d in range(6):
            ds = [quant(v) for v in
                  dt[dt["doc_id"] == d]["embedding"]]
            want = sum(max(int(np.dot(qv, dv)) for dv in ds)
                       for qv in qs)
            got = out[(out["query_id"] == q)
                      & (out["doc_id"] == d)]["score_q"].iloc[0]
            assert got == want, (q, d)
    r = out[out["query_id"] == 0].sort_values("sim_rank")
    assert (r["score_q"].values[:-1] >= r["score_q"].values[1:]) \
        .all()


def test_calibration_bins_ece(spark):
    # perfectly calibrated synthetic scores: label ~ Bernoulli(s)
    rng = np.random.RandomState(5)
    n = 20000
    s = rng.randint(0, 1000, n) / 1000.0
    y = (rng.uniform(size=n) < s).astype("i8")
    df = spark.createDataFrame(
        pd.DataFrame({"score": s, "label": y}))
    out = calibration_bins(df, "score", "label").toPandas() \
        .sort_values("bin")
    assert out["n"].sum() == n
    assert len(out) == 10
    acc = out["sum_label"] / out["n"]
    conf = out["sum_score_q"] / (out["n"] * 1000.0)
    ece = float((out["n"] * (acc - conf).abs()).sum() / n)
    assert ece < 0.02  # calibrated data -> tiny ECE
    # bin boundary: score quantization uses round-half-up millis
    one = calibration_bins(
        spark.createDataFrame(
            pd.DataFrame({"score": [0.0994, 0.1, 0.95, 1.0],
                          "label": [0, 1, 1, 1]})),
        "score", "label").toPandas().sort_values("bin")
    assert list(one["bin"]) == [0, 1, 9]
    assert list(one["n"]) == [1, 1, 2]
