"""Feature-evaluation batch: gini_split argmax picks the separating
threshold; woe_bins sign tracks class imbalance per bin."""

from pdal_spark.operators.stats import gini_split, woe_bins


def test_gini_split_finds_separating_threshold(spark):
    # feature perfectly separates at 5: values <= 5 are positive
    rows = [(float(v), v <= 5) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "f double, y boolean")
    scored = gini_split(df, feature="f", label_pred="y").collect()
    best = max(scored, key=lambda r: (r.score_q, -r.threshold))
    assert best.threshold == 5.0
    assert (best.n_l, best.pos_l, best.n_r, best.pos_r) \
        == (5, 5, 5, 0)
    # the pure split scores the q*(n_l + n_r) maximum
    assert best.score_q == max(r.score_q for r in scored)
    # thresholds with an empty right side are excluded
    assert all(r.n_r > 0 for r in scored)


def test_woe_bins_sign_and_counts(spark):
    # bin 0 (values < 10) all positive; bin 9 (>= 90) all negative
    rows = [(float(v), True) for v in [1, 2, 3]] + [
        (float(v), False) for v in [95, 96, 97, 98]
    ]
    df = spark.createDataFrame(rows, "v double, y boolean")
    out = {r.bin: r for r in woe_bins(
        df, "v", "y", lo=0.0, hi=100.0, n_bins=10).collect()}
    assert (out[0].n_pos, out[0].n_neg) == (3, 0)
    assert (out[9].n_pos, out[9].n_neg) == (0, 4)
    # positive-heavy bin has positive WoE, negative-heavy negative
    assert out[0].woe_q > 0 > out[9].woe_q
