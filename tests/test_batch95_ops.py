"""cell_jaccard_pairs behavior."""

from pdal_spark.operators.h3 import cell_jaccard_pairs


def test_cell_jaccard_known_overlap(spark):
    # users 1 and 2 in one block: 1 visits cells around two spots,
    # 2 shares one of them; user 3 in another block never pairs.
    rows = [
        (1, 0, 10.0, 10.0), (1, 0, 50.0, 50.0),
        (2, 0, 10.0, 10.0), (2, 0, -40.0, -90.0),
        (3, 1, 10.0, 10.0),
    ]
    df = spark.createDataFrame(rows, ["k", "b", "lat", "lon"])
    out = cell_jaccard_pairs(df, key="k", block="b", res=5).collect()
    assert len(out) == 1
    (r,) = out
    assert (r.key_a, r.key_b) == (1, 2)
    assert r.n_inter == 1 and r.n_a == 2 and r.n_b == 2
    assert abs(r.jaccard - 1 / 3) < 1e-12


def test_cell_jaccard_duplicate_visits_collapse(spark):
    rows = [(1, 0, 10.0, 10.0)] * 5 + [(2, 0, 10.0, 10.0)] * 3
    df = spark.createDataFrame(rows, ["k", "b", "lat", "lon"])
    (r,) = cell_jaccard_pairs(df, key="k", block="b", res=5).collect()
    assert r.n_inter == 1 and r.jaccard == 1.0
