"""Count-Min sketch invariants: never underestimates, exact when
width is collision-free, merge-by-addition equals whole-stream
sketch, and the error bound holds on a skewed stream."""

from pyspark.sql import functions as F

from pdal_spark.operators.sketch import cms_estimate, cms_sketch


def _stream(spark, counts):
    rows = [(e,) for e, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, ["e"])


def test_never_underestimates_and_bound(spark):
    counts = {i: (100 if i < 3 else 2) for i in range(40)}
    n = sum(counts.values())
    w, d = 16, 4  # tight width -> real collisions
    st = _stream(spark, counts)
    sk = cms_sketch(st, "e", width=w, depth=d)
    est = {r.e: r.cms_est for r in
           cms_estimate(sk, st, "e", width=w, depth=d).collect()}
    assert set(est) == set(counts)
    for e, c in counts.items():
        assert est[e] >= c, e
        assert est[e] <= c + 2 * n // w + n // 4  # loose sanity cap


def test_exact_when_wide_enough(spark):
    counts = {i: i + 1 for i in range(10)}
    st = _stream(spark, counts)
    sk = cms_sketch(st, "e", width=4096, depth=4)
    est = {r.e: r.cms_est for r in
           cms_estimate(sk, st, "e", width=4096, depth=4).collect()}
    assert est == counts


def test_shard_merge_equals_whole(spark):
    counts_a = {1: 5, 2: 7, 3: 1}
    counts_b = {2: 4, 3: 9, 4: 6}
    w, d = 32, 4
    whole = _stream(spark, {k: counts_a.get(k, 0) + counts_b.get(k, 0)
                            for k in {*counts_a, *counts_b}})
    sk_whole = cms_sketch(whole, "e", width=w, depth=d)
    merged = (
        cms_sketch(_stream(spark, counts_a), "e", width=w, depth=d)
        .unionByName(
            cms_sketch(_stream(spark, counts_b), "e",
                       width=w, depth=d))
        .groupBy("j", "col").agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r.j, r.col): r.cnt for r in sk_whole.collect()}
    b = {(r.j, r.col): r.cnt for r in merged.collect()}
    assert a == b
