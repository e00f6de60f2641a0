"""ppmi_cooc: brute-force equality on a tiny corpus + windowing
semantics; cuped_adjust: exact moments and the variance-reduction
direction on a planted covariate."""

import math
from collections import Counter

from pyspark.sql import functions as F

from pdal_spark.operators.stats import cuped_adjust
from pdal_spark.operators.textops import PMI_Q, ppmi_cooc


def _brute_ppmi(docs, window, min_count):
    cab = Counter()
    for d in docs:
        ws = d.split(" ")
        for i, w in enumerate(ws):
            for k in range(1, window + 1):
                if i + k < len(ws):
                    a, b = sorted((w, ws[i + k]))
                    cab[(a, b)] += 1
    cw = Counter()
    for (a, b), c in cab.items():
        cw[a] += c
        cw[b] += c
    n_t = sum(cab.values())
    out = {}
    for (a, b), c in cab.items():
        if c < min_count:
            continue
        lq = int(math.floor(math.log(c * n_t) * PMI_Q + 0.5)) \
            - int(math.floor(math.log(cw[a] * cw[b]) * PMI_Q + 0.5))
        out[(a, b)] = (c, max(0, lq))
    return out


def test_ppmi_matches_brute_force(spark):
    docs = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "cat and dog and cat",
        "the cat the dog the cat",
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    want = _brute_ppmi(docs, window=2, min_count=2)
    got = {(r.a, r.b): (r.c_ab, r.ppmi_q) for r in ppmi_cooc(
        df, window=2, min_count=2, top_k=1000).collect()}
    assert got == want
    # window=1 is a strict subset of the pair mass of window=2
    n1 = sum(r.c_ab for r in ppmi_cooc(
        df, window=1, min_count=1, top_k=10**6).collect())
    n2 = sum(r.c_ab for r in ppmi_cooc(
        df, window=2, min_count=1, top_k=10**6).collect())
    assert n1 < n2


def test_cuped_reduces_arm_gap_from_covariate_imbalance(spark):
    # y = x + arm-independent noise; arms differ ONLY through x
    # imbalance -> raw arm means differ, CUPED-adjusted means agree
    rows = []
    for i in range(400):
        arm = i % 2
        x = 100 + (i % 37) + 50 * arm  # arm-imbalanced covariate
        y = 2 * x + (i * 7) % 5        # metric driven by x
        rows.append((arm, y, x))
    df = spark.createDataFrame(rows, ["arm", "y_q", "x_q"])
    out = {r.arm: r for r in
           cuped_adjust(df, "arm", "y_q", "x_q").collect()}
    raw_gap = abs(out[0].arm_sy / out[0].n - out[1].arm_sy / out[1].n)
    adj_gap = abs(out[0].mean_adj - out[1].mean_adj)
    assert raw_gap > 90  # ~2*50 from the planted imbalance
    assert adj_gap < raw_gap / 10
    # moments are exact integers
    n = 400
    assert out[0].n_all == n and out[0].sxx == sum(
        (100 + (i % 37) + 50 * (i % 2)) ** 2 for i in range(n)
    )


def test_cuped_zero_variance_covariate_theta_zero(spark):
    df = spark.createDataFrame(
        [(i % 2, 10 + i % 3, 7) for i in range(20)],
        ["arm", "y_q", "x_q"],
    )
    out = cuped_adjust(df, "arm", "y_q", "x_q").collect()
    for r in out:
        assert r.theta == 0.0
        assert r.mean_adj == r.arm_sy / r.n
