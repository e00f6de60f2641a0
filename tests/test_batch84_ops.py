"""text_tiling / multi_pattern_counts / hausdorff_pairs behavior."""

from pdal_spark.operators.knn import hausdorff_pairs
from pdal_spark.operators.textops import multi_pattern_counts, text_tiling


def test_text_tiling_topic_shift_has_max_depth(spark):
    # Two topics of 20 tokens each (B=10): gap 0 (within topic A)
    # cohesive, gap 1 (the topic boundary) zero overlap, gap 2
    # (within topic B) cohesive -> depth peaks at gap 1.
    a = "cat dog fox owl bee ant elk hen ram sow"
    b = "sql joins spark rows scans disks pages locks nodes keys"
    df = spark.createDataFrame(
        [(1, f"{a} {a} {b} {b}")], ["doc_id", "text"]
    )
    rows = {r.gap: r for r in text_tiling(df).collect()}
    assert rows[0].sim == 10 and rows[2].sim == 10
    assert rows[1].sim == 0
    assert rows[1].depth == 20  # 10 from each side
    assert rows[0].depth == 0 and rows[2].depth == 0


def test_text_tiling_short_doc_emits_nothing(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    assert text_tiling(df).count() == 0  # single block, no gap


def test_multi_pattern_counts_nonoverlapping(spark):
    df = spark.createDataFrame(
        [(1, "aba abab aa"), (2, "zzz")], ["doc_id", "text"]
    )
    out = {(r.doc_id, r.pattern): r.n_hits for r in
           multi_pattern_counts(df, ["ab", "aa", "q"]).collect()}
    assert out[(1, "ab")] == 3  # aba + abab's two
    assert out[(1, "aa")] == 1
    assert (2, "ab") not in out and (1, "q") not in out


def test_hausdorff_pairs_known_sets(spark):
    # A = {(0,0),(1,0)}, B = {(0,0),(3,0)} (same block):
    # h(A->B)^2 = max(0, min(4,...)) -> a=(1,0): min(1, 4)=1 -> 1
    # h(B->A)^2 = b=(3,0): min(9, 4) = 4 -> symmetric h2 = 4.
    rows = [(1, 0, 0.0, 0.0), (1, 0, 1.0, 0.0),
            (2, 0, 0.0, 0.0), (2, 0, 3.0, 0.0)]
    df = spark.createDataFrame(rows, ["k", "b", "px", "py"])
    (r,) = hausdorff_pairs(df, key="k", block="b", x="px", y="py",
                           coord_q=1).collect()
    assert (r.key_a, r.key_b) == (1, 2)
    assert r.h_ab2 == 1 and r.h_ba2 == 4 and r.h2 == 4


def test_hausdorff_pairs_blocking(spark):
    rows = [(1, 0, 0.0, 0.0), (2, 0, 1.0, 0.0),
            (3, 1, 0.0, 0.0), (4, 1, 0.0, 5.0)]
    df = spark.createDataFrame(rows, ["k", "b", "px", "py"])
    out = hausdorff_pairs(df, key="k", block="b", x="px", y="py",
                          coord_q=1).collect()
    got = {(r.key_a, r.key_b): r.h2 for r in out}
    assert set(got) == {(1, 2), (3, 4)}
    assert got[(1, 2)] == 1 and got[(3, 4)] == 25
