"""frequent_itemsets / sax_words behavior."""

from pdal_spark.operators.temporal import sax_words
from pdal_spark.operators.textops import frequent_itemsets


def test_frequent_itemsets_ladder(spark):
    # 4 baskets: {1,2,3} x3 and {1,2} x1. min_support=3:
    # L1: 1(4), 2(4), 3(3); pairs: (1,2)=4, (1,3)=3, (2,3)=3;
    # triple (1,2,3)=3.
    rows = [(b, i) for b in (10, 20, 30) for i in (1, 2, 3)]
    rows += [(40, 1), (40, 2)]
    df = spark.createDataFrame(rows, ["b", "i"])
    out = {(r.size, r.item_a, r.item_b, r.item_c): r.support
           for r in frequent_itemsets(df, "b", "i",
                                      min_support=3).collect()}
    assert out[(1, 1, None, None)] == 4
    assert out[(2, 1, 2, None)] == 4
    assert out[(2, 2, 3, None)] == 3
    assert out[(3, 1, 2, 3)] == 3
    assert len(out) == 7


def test_frequent_itemsets_apriori_prune(spark):
    # (1,2) and (1,3) frequent but (2,3) NEVER co-occurs: the
    # triple candidate (1,2,3) must be pruned before counting.
    rows = ([(b, 1) for b in range(6)]
            + [(b, 2) for b in range(3)]
            + [(b, 3) for b in range(3, 6)])
    df = spark.createDataFrame(rows, ["b", "i"])
    out = frequent_itemsets(df, "b", "i", min_support=3).collect()
    assert all(r.size < 3 for r in out)


def test_frequent_itemsets_duplicates_collapse(spark):
    rows = [(1, 7), (1, 7), (1, 7), (2, 7)]
    df = spark.createDataFrame(rows, ["b", "i"])
    out = {r.item_a: r.support for r in
           frequent_itemsets(df, "b", "i", min_support=2).collect()}
    assert out == {7: 2}  # support counts BASKETS, not rows


def test_sax_identical_shapes_share_words(spark):
    # two keys with the same shape at different offsets: the
    # deviation grid normalizes the level, so words match.
    rows = ([(1, t, v) for t, v in
             enumerate([0, 0, 0, 0, 10, 10, 10, 10])]
            + [(2, t, v + 100) for t, v in
               enumerate([0, 0, 0, 0, 10, 10, 10, 10])]
            + [(3, t, v) for t, v in
               enumerate([10, 10, 10, 10, 0, 0, 0, 0])])
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = {r.k: r.word for r in
           sax_words(df, "k", "o", "v", n_segments=4,
                     breakpoints_q=(0,)).collect()}
    assert out[1] == out[2] == "aabb"
    assert out[3] == "bbaa"
