"""filters.projpipeline analog: mini PROJ-pipeline grammar over the
closed-form step library (ProjPipelineFilter.cpp:70-120)."""

import math

import pytest

from pdal_spark.operators import transform as ops_transform


def _pts(spark):
    return spark.createDataFrame(
        [(1, 3.7, 48.85), (2, 4.2, 47.1), (3, 2.9, 49.3)],
        ["pid", "x", "y"])   # x=lon deg, y=lat deg (zone 31)


def test_projpipeline_utm_matches_reproject_utm(spark):
    out = {r.pid: (r.x, r.y) for r in ops_transform.projpipeline(
        _pts(spark), "+proj=utm +zone=31").collect()}
    ref = {r.pid: (r.easting, r.northing)
           for r in ops_transform.reproject_utm(
               _pts(spark).withColumnRenamed("x", "lon")
               .withColumnRenamed("y", "lat"), zone=31).collect()}
    for pid in (1, 2, 3):
        assert out[pid][0] == pytest.approx(ref[pid][0], abs=1e-9)
        assert out[pid][1] == pytest.approx(ref[pid][1], abs=1e-9)


def test_projpipeline_chain_and_reverse_roundtrip(spark):
    op = ("+proj=pipeline"
          " +step +proj=unitconvert +xy_in=rad +xy_out=deg"
          " +step +proj=axisswap +order=2,1"
          " +step +proj=webmerc"
          " +step +proj=affine +s11=2.0 +xoff=100.0")
    # input: x = lat RADIANS, y = lon RADIANS (axisswap flips after
    # unitconvert)
    src = spark.createDataFrame(
        [(1, math.radians(48.85), math.radians(3.7))],
        ["pid", "x", "y"])
    fwd = ops_transform.projpipeline(src, op).collect()[0]
    # manual: webmerc of (lon=3.7, lat=48.85), then affine
    mx = 3.7 * 20037508.342789244 / 180.0
    my = (math.log(math.tan(math.radians(45 + 48.85 / 2)))
          * 20037508.342789244 / math.pi)
    assert fwd.x == pytest.approx(2 * mx + 100.0, rel=1e-12)
    assert fwd.y == pytest.approx(my, rel=1e-12)
    # reverse pipeline returns the original radians
    back = ops_transform.projpipeline(
        spark.createDataFrame([(1, fwd.x, fwd.y)], ["pid", "x", "y"]),
        op, reverse=True).collect()[0]
    assert back.x == pytest.approx(math.radians(48.85), abs=1e-9)
    assert back.y == pytest.approx(math.radians(3.7), abs=1e-9)


def test_projpipeline_inv_steps_and_noop(spark):
    op = ("+proj=pipeline +step +proj=utm +zone=31"
          " +step +proj=utm +zone=31 +inv +step +proj=longlat")
    out = ops_transform.projpipeline(_pts(spark), op).collect()
    got = {r.pid: (r.x, r.y) for r in out}
    assert got[1][0] == pytest.approx(3.7, abs=1e-7)
    assert got[1][1] == pytest.approx(48.85, abs=1e-7)


def test_projpipeline_rejects_unsupported(spark):
    # tmerc joined the closed-form subset in r4; robinson has no
    # closed inverse-free form and stays out
    with pytest.raises(ValueError, match="unsupported"):
        ops_transform.projpipeline(_pts(spark), "+proj=robin")
    with pytest.raises(ValueError, match="order"):
        ops_transform.projpipeline(
            _pts(spark),
            "+proj=pipeline +step +proj=axisswap +order=1,2")
    with pytest.raises(ValueError, match="malformed"):
        ops_transform.projpipeline(_pts(spark), "proj=utm zone=31")


def test_projpipeline_lcc_snyder_point(spark):
    """+proj=lcc via the pipeline grammar reproduces the Snyder
    PP-1395 worked example (Clarke 1866, 33/45, origin 23/-96)."""
    df = spark.createDataFrame([(-75.0, 35.0)], "x double, y double")
    from pdal_spark.operators.transform import projpipeline

    out = projpipeline(
        df,
        "+proj=pipeline +step +proj=lcc +lat_1=33 +lat_2=45"
        " +lat_0=23 +lon_0=-96 +ellps=clrk66",
    ).collect()[0]
    assert abs(out["x"] - 1894410.9) < 0.1
    assert abs(out["y"] - 1564649.5) < 0.1


def test_projpipeline_aea_inverse_raises(spark):
    import pytest

    from pdal_spark.operators.transform import projpipeline

    df = spark.createDataFrame([(0.0, 0.0)], "x double, y double")
    with pytest.raises(ValueError, match="forward only"):
        projpipeline(
            df,
            "+proj=pipeline +step +proj=aea +inv +lat_1=29.5"
            " +lat_2=45.5",
        )
