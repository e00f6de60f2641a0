"""cms_build shard-merge invariant: counters summed across shard
sketches equal the whole-stream sketch (the mergeable-state property
streaming_heavy_hitters relies on); weighted build folds mass."""

from pyspark.sql import functions as F

from pdal_spark.operators.sketch import cms_build, cms_estimate


def _stream(spark, counts):
    rows = [(e,) for e, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, ["e"])


def test_shard_merge_equals_whole(spark):
    counts_a = {1: 5, 2: 7, 3: 1}
    counts_b = {2: 4, 3: 9, 4: 6}
    whole = _stream(spark, {k: counts_a.get(k, 0) + counts_b.get(k, 0)
                            for k in {*counts_a, *counts_b}})
    sk_whole = cms_build(whole, "e", d=4, w=32)
    merged = (
        cms_build(_stream(spark, counts_a), "e", d=4, w=32)
        .unionByName(cms_build(_stream(spark, counts_b), "e",
                               d=4, w=32))
        .groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r.row, r.col): r.cnt for r in sk_whole.collect()}
    b = {(r.row, r.col): r.cnt for r in merged.collect()}
    assert a == b


def test_weighted_build_counts_mass_not_hits(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 5)], ["e", "wt"]
    )
    sk = cms_build(df, "e", d=3, w=512, weight_col="wt")
    est = {r.e: r.cms_est for r in cms_estimate(
        df.select("e").distinct(), sk, "e", d=3, w=512).collect()}
    assert est == {1: 20, 2: 5}
