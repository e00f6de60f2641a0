"""LSH per-bucket cap (VERDICT r2 #9): an adversarial corpus of
identical signatures must yield a BOUNDED candidate-pair count, with
the overflow observable via lsh_bucket_stats."""

from __future__ import annotations

from pdal_spark.operators.dedup import (
    lsh_bucket_stats,
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signatures,
    shingles,
)


def _adversarial_docs(spark, n=200):
    # identical text -> identical shingle set -> identical MinHash
    # signature -> every doc lands in the SAME bucket of every band
    rows = [(i, "the same adversarial page text repeated verbatim "
                "across the whole crawl segment") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucket_cap_bounds_pairs(spark):
    docs = _adversarial_docs(spark, 200)
    sigs = minhash_signatures(shingles(docs))
    cap = 16
    pairs = lsh_candidate_pairs(sigs, bucket_cap=cap)
    n = pairs.count()
    # uncapped would be 200*199/2 = 19900; capped keeps the cap
    # lowest ids fully connected: 16*15/2
    assert n == cap * (cap - 1) // 2
    uncapped = lsh_candidate_pairs(sigs, bucket_cap=None).count()
    assert uncapped == 200 * 199 // 2


def test_bucket_cap_survivors_are_lowest_ids(spark):
    docs = _adversarial_docs(spark, 50)
    sigs = minhash_signatures(shingles(docs))
    pairs = lsh_candidate_pairs(sigs, bucket_cap=8).toPandas()
    touched = set(pairs["a"]) | set(pairs["b"])
    # deterministic survivors: the 8 lowest doc ids
    assert touched == set(range(8))


def test_bucket_stats_reports_overflow(spark):
    docs = _adversarial_docs(spark, 100)
    sigs = minhash_signatures(shingles(docs))
    stats = lsh_bucket_stats(sigs, bucket_cap=16).toPandas()
    assert (stats["max_bucket"] == 100).all()
    assert (stats["n_capped"] >= 1).all()
    # a benign corpus reports zero capped buckets
    benign = spark.createDataFrame(
        [(i, f"unique page number {i} with words {i * 7} and {i * 13}")
         for i in range(100)],
        "doc_id long, text string",
    )
    bs = lsh_bucket_stats(
        minhash_signatures(shingles(benign)), bucket_cap=16
    ).toPandas()
    assert (bs["n_capped"] == 0).all()


def test_default_cap_does_not_change_benign_result(spark):
    benign = spark.createDataFrame(
        [(i, f"page {i} body with shared phrase alpha beta gamma "
             f"delta and tail {i % 5}") for i in range(60)],
        "doc_id long, text string",
    )
    capped = minhash_lsh_dedup(benign, threshold=0.0).toPandas()
    sh = shingles(benign)
    from pdal_spark.operators.dedup import jaccard_verify

    uncapped = jaccard_verify(
        lsh_candidate_pairs(minhash_signatures(sh), bucket_cap=None),
        sh, threshold=0.0, assume_distinct=True,
    ).toPandas()
    key = lambda p: sorted(map(tuple, p[["a", "b"]].values.tolist()))
    assert key(capped) == key(uncapped)
