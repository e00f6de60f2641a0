"""Batch-44 op: q-gram-pruned edit-distance self join."""

from pdal_spark.operators import dedup as ops_dedup


def _df(spark, strings):
    return spark.createDataFrame(
        list(enumerate(strings)), ["id", "s"]
    )


def test_edit_join_finds_typo_pairs(spark):
    df = _df(spark, ["abcdef", "abcdeg", "abXdef", "zzzzzz"])
    out = {(r.id_a, r.id_b): r.dist for r in
           ops_dedup.edit_join(df, d=2).collect()}
    assert out[(0, 1)] == 1 and out[(0, 2)] == 1
    assert out[(1, 2)] == 2
    assert not any(3 in p for p in out)


def test_edit_join_matches_brute_force(spark):
    strings = [f"g{i // 3}word{'xyz'[i % 3]}tail" for i in range(30)]
    df = _df(spark, strings)
    got = {(r.id_a, r.id_b, r.dist) for r in
           ops_dedup.edit_join(df, d=2).collect()}

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

    expect = {
        (i, j, lev(strings[i], strings[j]))
        for i in range(30) for j in range(i + 1, 30)
        if lev(strings[i], strings[j]) <= 2
    }
    assert got == expect


def test_edit_join_short_strings_filtered(spark):
    # below q*(d+1) the filter is unsound, so inputs are dropped
    df = _df(spark, ["abc", "abd", "abcdefgh"])
    out = ops_dedup.edit_join(df, d=2, q=2).collect()
    assert out == []
