"""readers.e57 analog validated against the reference's OWN
E57ReaderTest pins (plugins/e57/test/E57ReaderTest.cpp): exact
first-point fields of A4.e57 (:92-110), the A_B preview (7 dims / 6
points, :57-70), multi-scan union equal to the parts (:128-167),
and the pose transform via A_moved_B == B2 + A4_moved (:169-210) —
plus CRC-32C corruption detection (libE57 CheckedFile semantics).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from pdal_spark.sources.e57 import e57_quickinfo, read_e57

_R = "/root/reference/test/data/e57"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(_R),
    reason="reference test data not present",
)


@needs_ref
def test_preview_pins():
    qi = e57_quickinfo(f"{_R}/A_B.e57")
    assert len(qi["dimensions"]) == 7  # E57ReaderTest.cpp:66
    assert qi["point_count"] == 6      # :67
    assert qi["num_scans"] == 2


@needs_ref
def test_read_exact_point_pins(spark):
    pdf = read_e57(spark, f"{_R}/A4.e57").toPandas()
    assert len(pdf) == 4  # E57ReaderTest.cpp:103
    p0 = pdf.iloc[0]
    assert np.float32(p0.X) == np.float32(-44.300098)
    assert np.float32(p0.Y) == np.float32(-1.132100)
    assert np.float32(p0.Z) == np.float32(0.335800)
    assert p0.Red == 0 and p0.Green == 65535 and p0.Blue == 0
    assert p0.Intensity == 0
    p1 = pdf.iloc[1]
    assert np.float32(p1.X) == np.float32(-44.506901)
    assert np.float32(p1.Y) == np.float32(-0.886000)
    assert np.float32(p1.Z) == np.float32(0.328600)


def _vals(pdf):
    return pdf[["X", "Y", "Z", "Red", "Green", "Blue"]] \
        .to_numpy(dtype="float32")


@needs_ref
def test_multi_scan_union_equals_parts(spark):
    ab = _vals(read_e57(spark, f"{_R}/A_B.e57").toPandas())
    a = _vals(read_e57(spark, f"{_R}/A4.e57").toPandas())
    b = _vals(read_e57(spark, f"{_R}/B2.e57").toPandas())
    assert len(ab) == 6
    # scan order: B's 2 points first, then A's 4
    np.testing.assert_array_equal(ab[:2], b[:2])
    np.testing.assert_array_equal(ab[2:], a)


@needs_ref
def test_pose_transform_merge(spark):
    # A_moved_B carries scan A with a pose; transformed it must
    # equal the baked-in A4_moved capture (E57ReaderTest.cpp:169)
    amb = _vals(read_e57(spark, f"{_R}/A_moved_B.e57").toPandas())
    am = _vals(read_e57(spark, f"{_R}/A4_moved.e57").toPandas())
    b = _vals(read_e57(spark, f"{_R}/B2.e57").toPandas())
    assert len(amb) == 6
    np.testing.assert_array_equal(amb[:2], b[:2])
    np.testing.assert_allclose(amb[2:], am, rtol=1e-6)


@needs_ref
def test_different_dims_scans(spark):
    pdf = read_e57(spark, f"{_R}/A_B_different_dims.e57").toPandas()
    assert len(pdf) == 2
    assert {"X", "Y", "Z", "Intensity", "Red"} <= set(pdf.columns)


def test_writer_round_trip(spark, tmp_path):
    from pdal_spark.sources.e57 import write_e57

    rng = np.random.default_rng(9)
    n = 20000  # >1 packet per scan (multi-packet framing covered)
    import pandas as pd

    pdf = pd.DataFrame({
        "X": rng.uniform(-100, 100, n),
        "Y": rng.uniform(-50, 50, n),
        "Z": rng.uniform(0, 30, n),
        "Intensity": rng.integers(0, 65536, n).astype("int64"),
        "Red": rng.integers(0, 65536, n).astype("int64"),
        "Green": rng.integers(0, 65536, n).astype("int64"),
        "Blue": rng.integers(0, 65536, n).astype("int64"),
        "part": (np.arange(n) % 3).astype("int64"),
    })
    out = str(tmp_path / "e57out")
    files = write_e57(
        spark.createDataFrame(pdf).repartition(3, "part")
        .drop("part"), out)
    assert files >= 2
    back = read_e57(spark, out + "/*.e57").toPandas()
    assert len(back) == n
    key = ["X", "Y", "Z"]
    a = back.sort_values(key).reset_index(drop=True)
    b = pdf.drop(columns=["part"]).sort_values(key) \
        .reset_index(drop=True)
    for c in ("X", "Y", "Z", "Intensity", "Red", "Green", "Blue"):
        np.testing.assert_array_equal(a[c].to_numpy(),
                                      b[c].to_numpy())
    # files verify CRC and preview correctly
    import glob

    fp = sorted(glob.glob(out + "/*.e57"))[0]
    assert e57_quickinfo(fp)["point_count"] > 0


def test_spherical_scan_pass_through(spark, tmp_path):
    """Spherical scans surface raw PDAL-named double columns
    (Utils.cpp:53-58 — no conversion, same as the reference)."""
    import struct as _s

    from pdal_spark.sources.e57 import _paginate, _phys

    rng = np.random.default_rng(4)
    n = 64
    rr = rng.uniform(1, 50, n)
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(-1.0, 1.0, n)
    streams = [rr.astype("<f8").tobytes(),
               az.astype("<f8").tobytes(),
               el.astype("<f8").tobytes()]
    counts = [len(s) for s in streams]
    body = 6 + 2 * 3 + sum(counts)
    pad = (4 - body % 4) % 4
    pkt = _s.pack("<BBHH", 1, 0, body + pad - 1, 3) \
        + _s.pack("<3H", *counts) + b"".join(streams) \
        + b"\x00" * pad
    section = _s.pack("<B7xQQQ", 1, 32 + len(pkt),
                      _phys(48 + 32), 0) + pkt
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<e57Root type="Structure" '
        'xmlns="http://www.astm.org/COMMIT/E57/2010-e57-v1.0">'
        '<data3D type="Vector"><vectorChild type="Structure">'
        f'<points type="CompressedVector" fileOffset="{_phys(48)}"'
        f' recordCount="{n}"><prototype type="Structure">'
        '<sphericalRange type="Float" precision="double"/>'
        '<sphericalAzimuth type="Float" precision="double"/>'
        '<sphericalElevation type="Float" precision="double"/>'
        '</prototype></points></vectorChild></data3D></e57Root>'
    ).encode()
    logical = bytearray(48) + section + xml
    phys_total = len(_paginate(bytes(logical)))
    _s.pack_into("<8sIIQQQQ", logical, 0, b"ASTM-E57", 1, 0,
                 phys_total, _phys(48 + len(section)), len(xml),
                 1024)
    fp = str(tmp_path / "sph.e57")
    open(fp, "wb").write(_paginate(bytes(logical)))

    pdf = read_e57(spark, fp).toPandas()
    assert len(pdf) == n
    np.testing.assert_array_equal(
        pdf.SphericalRange.to_numpy(), rr)
    np.testing.assert_array_equal(
        pdf.SphericalAzimuth.to_numpy(), az)


@needs_ref
def test_crc_corruption_detected(spark, tmp_path):
    raw = bytearray(open(f"{_R}/A4.e57", "rb").read())
    raw[100] ^= 0x01  # flip a bit in the binary point section
    # (the XML must stay parseable so planning succeeds and the
    # task-side CRC verification is what trips)
    fp = str(tmp_path / "bad.e57")
    open(fp, "wb").write(bytes(raw))
    with pytest.raises(Exception, match="CRC"):
        read_e57(spark, fp).collect()
