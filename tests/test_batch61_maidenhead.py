"""Batch-61 op: Maidenhead grid locator."""

from pdal_spark.operators import h3 as ops_h3


def test_maidenhead_known_locators(spark):
    # Munich -> JN58td; ARRL HQ (W1AW) -> FN31pr
    df = spark.createDataFrame(
        [(48.14666, 11.60833), (41.714775, -72.727260)],
        ["lat", "lon"],
    )
    got = sorted(r.maidenhead
                 for r in ops_h3.maidenhead_encode(df).collect())
    assert got == ["FN31pr", "JN58td"]


def test_maidenhead_casing_and_length(spark):
    df = spark.createDataFrame([(0.0, 0.0)], ["lat", "lon"])
    r = ops_h3.maidenhead_encode(df).collect()[0]
    assert len(r.maidenhead) == 6
    assert r.maidenhead[:2].isupper()
    assert r.maidenhead[4:].islower()
    assert r.maidenhead == "JJ00aa"


def test_maidenhead_pole_clamps(spark):
    df = spark.createDataFrame([(90.0, 180.0)], ["lat", "lon"])
    r = ops_h3.maidenhead_encode(df).collect()[0]
    assert r.maidenhead == "AR09ax"
