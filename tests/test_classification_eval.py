"""`pdal eval` analog: per-label confusion statistics on a hand
fixture with known tp/fp/fn, including ids present in only one
cloud (dropped, like the kernel's common-id iteration)."""

from pdal_spark.operators.stats import classification_eval


def test_classification_eval_confusion(spark):
    # id: 1..6 common; 7 predicted-only, 8 truth-only (dropped)
    pred = spark.createDataFrame(
        [(1, 2), (2, 2), (3, 5), (4, 5), (5, 2), (6, 6), (7, 2)],
        "pid long, Classification long",
    )
    truth = spark.createDataFrame(
        [(1, 2), (2, 5), (3, 5), (4, 2), (5, 2), (6, 6), (8, 2)],
        "pid long, Classification long",
    )
    out = {
        int(r.label): (int(r.tp), int(r.fp), int(r.fn),
                       int(r.support), int(r.n))
        for r in classification_eval(pred, truth, [2, 5, 9]).collect()
    }
    # label 2: common ids predicted 2 = {1,2,5}; truth 2 = {1,4,5}
    assert out[2] == (2, 1, 1, 3, 6)
    # label 5: predicted {3,4}; truth {2,3}
    assert out[5] == (1, 1, 1, 2, 6)
    # label with no occurrences still emits a zero row
    assert out[9] == (0, 0, 0, 0, 6)
    # derived metrics follow by one division each (EvalKernel):
    tp, fp, fn, sup, _ = out[2]
    assert tp / (tp + fp) == 2 / 3          # precision
    assert tp / (tp + fn) == 2 / 3          # recall
    assert tp / (tp + fp + fn) == 0.5       # IoU
