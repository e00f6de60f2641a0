"""Invariant tests for batch 115: deletion join, sort-key
clusters."""

from __future__ import annotations

from pdal_spark.operators.dedup import deletion_join, sortkey_clusters


def test_deletion_join_finds_all_edit1_kinds(spark):
    words = ["cat", "cats", "bat", "cart", "dog"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    pairs = {(r["a"], r["b"]) for r in
             deletion_join(df, "w").collect()}
    # delete (cats->cat), substitute (cat->bat), insert (cat->cart)
    assert ("cat", "cats") in pairs
    assert ("bat", "cat") in pairs
    assert ("cart", "cat") in pairs   # "cart" sorts before "cat"
    assert ("cart", "cats") not in pairs  # distance 2
    assert all("dog" not in p for pair in pairs for p in pair)


def test_deletion_join_matches_bruteforce(spark):
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1,
                    prev + (ca != cb),
                )
        return dp[-1]

    words = [f"t{i}" for i in range(25)] + ["alpha", "alphb",
                                            "beta", "betas"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {(r["a"], r["b"]) for r in
           deletion_join(df, "w").collect()}
    want = {(a, b) for a, b in itertools.combinations(sorted(words), 2)
            if lev(a, b) <= 1}
    assert got == want


def test_sortkey_clusters_order_invariant(spark):
    rows = [(1, "alpha beta"), (2, "beta alpha"),
            (3, "beta beta alpha"), (4, "gamma only")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sortkey_clusters(df).collect()
    assert len(out) == 1
    r = out[0]
    # repetition-invariant too: doc 3 joins the cluster
    assert r["n_docs"] == 3 and r["min_id"] == 1 and r["max_id"] == 3
