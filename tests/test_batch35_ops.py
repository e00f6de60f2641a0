"""Label propagation + robust prep: knn_predict degenerate pools,
winsorize edge groups."""

from pdal_spark.operators.similarity import knn_predict
from pdal_spark.operators.stats import winsorize


def test_knn_predict_mean_of_neighbors(spark):
    # three corpus points on one axis with labels 0/10/20; the query
    # sits at the 0-label point's direction -> neighbors ranked by
    # cosine, mean of k=2 nearest labels
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0], 0),
            (11, [0.9, 0.1], 10),
            (12, [0.0, 1.0], 20),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    q = spark.createDataFrame(
        [(1, [1.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    r = knn_predict(q, corpus, k=2).collect()[0]
    assert (r.n_nb, r.sum_label, r.pred) == (2, 10, 5.0)


def test_winsorize_edges(spark):
    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in
         enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
        + [("solo", 99, 42.0)],
        "grp string, id long, v double",
    )
    out = {(r.grp, r.id): (r.lo, r.hi, r.clipped)
           for r in winsorize(df, "v", "grp", "id",
                              lo_frac=0.1, hi_frac=0.9).collect()}
    # n=10: lo rank ceil(1)=1 -> 1.0; hi rank ceil(9)=9 -> 9.0;
    # the 1000 outlier clips to 9
    assert out[("g", 9)] == (1.0, 9.0, 9.0)
    assert out[("g", 4)] == (1.0, 9.0, 5.0)
    # single-row group: lo = hi = value, clipped = value
    assert out[("solo", 99)] == (42.0, 42.0, 42.0)
