"""Nonparametric two-sample tests on known fixtures."""

from pdal_spark.operators.stats import ks_test, mann_whitney_u


def _two(spark, a_vals, b_vals):
    a = spark.createDataFrame([(float(v),) for v in a_vals],
                              "v double")
    b = spark.createDataFrame([(float(v),) for v in b_vals],
                              "v double")
    return a, b


def test_ks_identical_zero_and_disjoint_one(spark):
    a, b = _two(spark, [1, 2, 3, 4], [1, 2, 3, 4])
    r = ks_test(a, b, "v").collect()[0]
    assert r.d_num == 0
    # fully separated samples: D = 1 -> d_num = n_a * n_b
    a, b = _two(spark, [1, 2, 3], [10, 11, 12])
    r = ks_test(a, b, "v").collect()[0]
    assert (r.n_a, r.n_b, r.d_num) == (3, 3, 9)
    assert r.d_at == 3.0  # max gap closes at A's last value


def test_ks_known_statistic(spark):
    # F_a jumps at 1,2 (n=2); F_b at 2,4 (n=2): D = 1/2 at v=1
    a, b = _two(spark, [1, 2], [2, 4])
    r = ks_test(a, b, "v").collect()[0]
    assert (r.d_num, r.d_at) == (2, 1.0)  # |1*2 - 0*2| = 2 -> D=0.5


def test_mann_whitney_exact_with_ties(spark):
    # A = [1, 2], B = [2, 3]: pooled ranks 1, (2.5, 2.5), 4
    # R_a = 1 + 2.5 = 3.5 -> two_r_a = 7
    a, b = _two(spark, [1, 2], [2, 3])
    r = mann_whitney_u(a, b, "v").collect()[0]
    assert (r.n_a, r.n_b, r.two_r_a) == (2, 2, 7)
    # 2U_a = 2*4 + 2*3 - 7 = 7
    assert r.two_u_a == 7
    # stochastic dominance: all of B above A -> U_a = n_a*n_b
    a, b = _two(spark, [1, 2], [5, 6])
    r = mann_whitney_u(a, b, "v").collect()[0]
    assert r.two_u_a == 2 * 2 * 2  # U_a = 4 = n_a*n_b


def test_blocking_eval_counts(spark):
    from pdal_spark.operators.dedup import blocking_eval

    cand = spark.createDataFrame(
        [(1, 2), (3, 1), (4, 5), (2, 1)],  # (2,1)/(1,2) dedupe
        "a long, b long",
    )
    gold = spark.createDataFrame(
        [(1, 2), (5, 4), (6, 7)], "a long, b long"
    )
    r = blocking_eval(cand, gold, n_records=10).collect()[0]
    assert (r.n_cand, r.n_gold, r.n_hit, r.n_pairs) == (3, 3, 2, 45)
    # reduction ratio / pair completeness follow by one division
    assert 1 - r.n_cand / r.n_pairs > 0.9
    assert r.n_hit / r.n_gold == 2 / 3


def test_prf_expansion_surfaces_cooccurring_terms(spark):
    from pdal_spark.operators.textops import prf_expansion

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle exchange partition shuffle"),
            (2, "spark shuffle codegen partition"),
            (3, "unrelated words about cooking pasta dinner"),
            (4, "spark window shuffle exchange"),
        ],
        "doc_id long, text string",
    )
    out = prf_expansion(docs, terms=["spark"], k=3, m=3).collect()
    words = [r.word for r in out]
    # terms co-occurring with 'spark' in the feedback docs win;
    # the query term itself and cooking noise never appear
    assert "shuffle" in words and words[0] == "shuffle"
    assert "spark" not in words
    assert not {"pasta", "cooking"} & set(words)
    # ranks are 1..m and weights non-increasing
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    ws = [r.weight_q for r in out]
    assert ws == sorted(ws, reverse=True)
