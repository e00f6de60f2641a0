"""Invariant tests for batch 188: F-beta ladder."""

from __future__ import annotations

from pdal_spark.operators.stats import fbeta_ladder


def test_fbeta_ladder_known(spark):
    rows = [(s, 1 if s >= 50 else 0) for s in range(100)]
    df = spark.createDataFrame(rows, "v long, y long")
    out = {r["t"]: r for r in fbeta_ladder(
        df, "v", "y", thresholds=[25, 50, 75]).collect()}
    # t=50: exact split -> P = R = F = 1
    assert out[50]["prec"] == 1.0 and out[50]["fbeta"] == 1.0
    # t=25: recall 1, precision 50/75
    assert out[25]["rec"] == 1.0
    assert abs(out[25]["prec"] - 50 / 75) < 1e-12
    # t=75: precision 1, recall 25/50
    assert out[75]["prec"] == 1.0 and out[75]["rec"] == 0.5


def test_fbeta_weights_recall(spark):
    rows = [(s, 1 if s >= 50 else 0) for s in range(100)]
    df = spark.createDataFrame(rows, "v long, y long")
    f2 = fbeta_ladder(df, "v", "y", thresholds=[75],
                      beta2_num=4, beta2_den=1).collect()[0]
    f1 = fbeta_ladder(df, "v", "y",
                      thresholds=[75]).collect()[0]
    # recall-heavy beta^2=4 punishes the low-recall point harder
    assert f2["fbeta"] < f1["fbeta"]
