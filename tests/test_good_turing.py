"""Good-Turing: hand-computed count-of-counts, smoothed counts and
unseen mass on a tiny corpus."""

from pdal_spark.operators.textops import GT_Q, good_turing


def test_matches_hand_computation(spark):
    # counts: a:4 b:2 c:2 d:1 e:1 f:1 -> N_1=3, N_2=2, N_4=1; N=11
    docs = [(0, "a a b c d"), (1, "a a b c e f")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {r.r: r for r in good_turing(df).collect()}
    assert {r: rows[r].n_r for r in rows} == {1: 3, 2: 2, 4: 1}
    # r*=1: (1+1)*N_2/N_1 = 2*2/3
    assert rows[1].r_star_q == (2 * 2 * GT_Q) // 3
    # N_3 = 0 -> r* undefined for r=2 (gap), and for the max count
    assert rows[2].r_star_q is None and rows[4].r_star_q is None
    for r in rows.values():
        assert r.n_tokens == 11
        assert r.p0_q == (3 * GT_Q) // 11
