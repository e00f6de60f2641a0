"""colocation_ratio / mann_kendall behavior."""

from pdal_spark.operators.stats import colocation_ratio
from pdal_spark.operators.temporal import mann_kendall


def test_colocation_pairs_and_ratio(spark):
    # coord_q=2 grid: A at xq=0,2; B at xq=3; C far away. r=2:
    # pairs: (A@0,A@2) d=2; (A@2,B@3) d=1; (A@0,B@3) d=3 excluded.
    rows = [(1, "A", 0.0, 0.0), (2, "A", 1.0, 0.0),
            (3, "B", 1.5, 0.0), (4, "C", 99.0, 0.0)]
    df = spark.createDataFrame(rows, ["pid", "cat", "lon", "lat"])
    out = {(r.cat_a, r.cat_b): (r.n_pairs, r.n_a) for r in
           colocation_ratio(df, category="cat", id_col="pid",
                            max_d_q=2, coord_q=2).collect()}
    assert out[("A", "A")] == (1, 2)
    assert out[("A", "B")] == (1, 2)
    assert out[("B", "A")] == (1, 1)
    assert ("C", "C") not in out and ("A", "C") not in out


def test_mann_kendall_monotone_and_flat(spark):
    rows = ([(1, t, t) for t in range(10)]          # increasing
            + [(2, t, 5) for t in range(10)]        # constant
            + [(3, t, 10 - t) for t in range(10)])  # decreasing
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = {r.k: r for r in
           mann_kendall(df, key="k", order="o", value="v").collect()}
    assert out[1].s_stat == 45 and out[3].s_stat == -45
    assert out[2].s_stat == 0
    # constant series: all ties -> var18 fully corrected to 0
    n = 10
    full = n * (n - 1) * (2 * n + 5)
    assert out[1].var18 == full
    assert out[2].var18 == full - 10 * 9 * 25
