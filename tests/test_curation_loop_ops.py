"""Semantics pins for the curation-loop batch: perplexity buckets,
systematic resampling invariants, retrieval-eval vs hand-computed
MRR/nDCG, change-rate monotonicity, embedding-drift ground truth."""

import math

import numpy as np
import pandas as pd
import pytest

from pdal_spark.operators.sampling import systematic_resample
from pdal_spark.operators.similarity import (EVAL_Q, embedding_drift,
                                             retrieval_eval)
from pdal_spark.operators.temporal import change_rate
from pdal_spark.operators.textops import perplexity_buckets


def test_perplexity_buckets_order_and_sizes(spark):
    # repetitive common-token docs are "fluent" (head); rare-token
    # docs are tail
    docs = []
    for i in range(30):
        docs.append((i, "the cat sat on the mat " * 5))
    for i in range(30, 60):
        docs.append((i, f"zq{i}x wvu{i} jk{i}l mn{i}op qr{i}st"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = perplexity_buckets(df).toPandas()
    assert len(out) == 60
    common = out[out["doc_id"] < 30]
    rare = out[out["doc_id"] >= 30]
    # every common doc outranks every rare doc; buckets are exact
    # rank thirds, so head is all-common and tail is all-rare
    assert (common["bucket"] <= 1).all()
    assert (rare["bucket"] >= 1).all()
    assert (out[out["bucket"] == 0]["doc_id"] < 30).all()
    assert (out[out["bucket"] == 2]["doc_id"] >= 30).all()
    # thirds: 20 docs per bucket
    assert out.groupby("bucket").size().tolist() == [20, 20, 20]


def test_systematic_resample_invariants(spark):
    rng = np.random.RandomState(9)
    pdf = pd.DataFrame({
        "id": np.arange(400),
        "w": rng.randint(1, 100, 400).astype("i8"),
    })
    n = 150
    out = systematic_resample(
        spark.createDataFrame(pdf).repartition(5), "id", "w", n
    ).toPandas()
    assert out["copies"].sum() == n
    # every row with w >= W/n gets at least one copy
    W = int(pdf["w"].sum())
    big = pdf[pdf["w"] * n >= W]["id"]
    got = set(out["id"])
    assert set(big).issubset(got)
    # expectation bound: copies within 1 of w*n/W
    m = out.set_index("id")["copies"]
    for _, r in pdf.iterrows():
        exp = r["w"] * n / W
        assert abs(m.get(r["id"], 0) - exp) <= 1.0


def test_retrieval_eval_hand_example(spark):
    runs = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2)],
        "query_id long, doc_id long, rank long")
    qrels = spark.createDataFrame(
        [(1, 11, 2), (1, 12, 1), (1, 13, 3),
         (2, 99, 1)],
        "query_id long, doc_id long, rel long")
    out = retrieval_eval(runs, qrels, k=10).toPandas() \
        .set_index("query_id")
    # q1: first relevant at rank 2 -> rr = Q/2
    assert out.loc[1, "rr_q"] == EVAL_Q // 2
    disc = lambda r: math.floor(
        EVAL_Q * math.log(2) / math.log(r + 1) + 0.5)
    dcg = (2**2 - 1) * disc(2) + (2**1 - 1) * disc(3)
    idcg = (2**3 - 1) * disc(1) + (2**2 - 1) * disc(2) \
        + (2**1 - 1) * disc(3)
    assert out.loc[1, "dcg_q"] == dcg
    assert out.loc[1, "idcg_q"] == idcg
    assert out.loc[1, "n_rel"] == 3
    # q2: relevant doc never retrieved
    assert out.loc[2, "rr_q"] == 0 and out.loc[2, "dcg_q"] == 0
    assert out.loc[2, "idcg_q"] > 0


def test_change_rate_monotone_in_changes(spark):
    rows = []
    for page, (n, c) in enumerate([(10, 0), (10, 2), (10, 5),
                                   (10, 9)]):
        rows += [(page, 1)] * c + [(page, 0)] * (n - c)
    df = spark.createDataFrame(rows, "page long, changed int")
    out = change_rate(df, "page", "changed").toPandas() \
        .sort_values("page")
    lam = out["lambda_q"].tolist()
    assert lam[0] == 0
    assert lam == sorted(lam)
    # exact value: lnq(11) - lnq(11 - c)
    from pdal_spark.operators.temporal import CR_Q
    want = (math.floor(math.log(11) * CR_Q + 0.5)
            - math.floor(math.log(6) * CR_Q + 0.5))
    assert out[out["page"] == 2]["lambda_q"].iloc[0] == want


def test_embedding_drift_ground_truth(spark):
    # group 0: identical snapshots -> zero drift;
    # group 1: b shifted by +0.5 in dim 0 -> drift2 ~ (0.5e6)^2
    a_rows = [(0, [1.0, 2.0]), (0, [3.0, 4.0]),
              (1, [0.0, 1.0]), (1, [1.0, 0.0])]
    b_rows = [(0, [1.0, 2.0]), (0, [3.0, 4.0]),
              (1, [0.5, 1.0]), (1, [1.5, 0.0])]
    a = spark.createDataFrame(a_rows, "g long, embedding array<float>")
    b = spark.createDataFrame(b_rows, "g long, embedding array<float>")
    out = embedding_drift(a, b, "g").toPandas().set_index("g")
    assert out.loc[0, "drift2_q"] == 0
    assert out.loc[1, "drift2_q"] == 500_000 ** 2
    assert out.loc[1, "n_a"] == 2 and out.loc[1, "n_b"] == 2
