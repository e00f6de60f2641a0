"""Batch-60 op: Open Location Code encode — pinned to the official
OLC test vectors."""

from pdal_spark.operators import h3 as ops_h3


def test_olc_official_vectors(spark):
    # from google/open-location-code encoding test data
    cases = [
        (47.365590, 8.524997, "8FVC9G8F+6X"),
        (20.3701135, 2.78223535156, "7FG49QCJ+2V"),
        (-41.2730625, 174.7859875, "4VCPPQGP+Q9"),
    ]
    df = spark.createDataFrame(
        [(lat, lon) for lat, lon, _ in cases], ["lat", "lon"]
    )
    got = [r.olc for r in ops_h3.olc_encode(df).collect()]
    assert sorted(got) == sorted(c for _, _, c in cases)


def test_olc_antimeridian_wraps(spark):
    df = spark.createDataFrame(
        [(0.0, 180.0), (0.0, -180.0)], ["lat", "lon"]
    )
    a, b = [r.olc for r in ops_h3.olc_encode(df).collect()]
    assert a == b  # 180 == -180 after wrap


def test_olc_pole_clamps(spark):
    df = spark.createDataFrame([(90.0, 0.0)], ["lat", "lon"])
    r = ops_h3.olc_encode(df).collect()[0]
    assert len(r.olc) == 11 and r.olc[8] == "+"
