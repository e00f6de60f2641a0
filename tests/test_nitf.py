"""readers.nitf analog: the reference's own fixture
test/data/nitf/autzen-utm10.ntf must decode point-for-point equal
to its .las twin in the same directory (the strongest available
ground truth — the twin is read by the proven uncompressed LAS
path)."""

from __future__ import annotations

import os

import pytest

from pdal_spark.sources.nitf import (
    nitf_las_extent,
    nitf_quickinfo,
    read_nitf,
)

_R = "/root/reference/test/data/nitf"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(_R),
    reason="reference test data not present",
)


@needs_ref
def test_extent_points_at_las():
    off, length = nitf_las_extent(f"{_R}/autzen-utm10.ntf")
    with open(f"{_R}/autzen-utm10.ntf", "rb") as fh:
        fh.seek(off)
        assert fh.read(4) == b"LASF"
    # the embedded stream IS the whole .las twin
    assert length == os.path.getsize(f"{_R}/autzen-utm10.las")


@needs_ref
def test_quickinfo():
    qi = nitf_quickinfo(f"{_R}/autzen-utm10.ntf")
    assert qi["point_count"] > 0
    assert qi["compressed"] is False


@needs_ref
def test_read_matches_las_twin(spark):
    from pdal_spark.sources.las import read_las

    ntf = read_nitf(spark, f"{_R}/autzen-utm10.ntf").toPandas()
    las = read_las(spark, f"{_R}/autzen-utm10.las").toPandas()
    assert len(ntf) == len(las)
    key = ["X", "Y", "Z", "GpsTime"] if "GpsTime" in ntf.columns \
        else ["X", "Y", "Z"]
    a = ntf.sort_values(key).reset_index(drop=True)
    b = las.sort_values(key).reset_index(drop=True)
    assert (a == b).all().all()


@needs_ref
def test_non_nitf_rejected(tmp_path):
    fp = str(tmp_path / "x.ntf")
    open(fp, "wb").write(b"NOTNITF---" + b"\x00" * 500)
    with pytest.raises(ValueError, match="not NITF"):
        nitf_las_extent(fp)
