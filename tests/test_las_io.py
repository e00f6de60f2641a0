"""readers.las / writers.las round-trips (io/LasReader.cpp,
io/LasWriter.cpp; layout io/private/las/Header.hpp:57-160)."""

import struct

import numpy as np
import pandas as pd
import pytest

import pdal_spark.sources.las as las


def _frame(n=200, seed=7, color=True, time=True, nir=False,
           channel=False):
    rng = np.random.RandomState(seed)
    d = {
        "X": np.round(rng.uniform(-100, 100, n), 2),
        "Y": np.round(rng.uniform(-50, 50, n), 2),
        "Z": np.round(rng.uniform(0, 30, n), 2),
        "Intensity": rng.randint(0, 65536, n),
        "ReturnNumber": rng.randint(1, 6, n),
        "NumberOfReturns": rng.randint(1, 6, n),
        "ScanDirectionFlag": rng.randint(0, 2, n),
        "EdgeOfFlightLine": rng.randint(0, 2, n),
        "Classification": rng.randint(0, 20, n),
        "Synthetic": rng.randint(0, 2, n),
        "KeyPoint": rng.randint(0, 2, n),
        "Withheld": rng.randint(0, 2, n),
        "ScanAngleRank": rng.randint(-90, 91, n).astype("f8"),
        "UserData": rng.randint(0, 256, n),
        "PointSourceId": rng.randint(0, 65536, n),
    }
    if time:
        d["GpsTime"] = np.round(rng.uniform(0, 1e6, n), 6)
    if color:
        d["Red"] = rng.randint(0, 65536, n)
        d["Green"] = rng.randint(0, 65536, n)
        d["Blue"] = rng.randint(0, 65536, n)
    if nir:
        d["Infrared"] = rng.randint(0, 65536, n)
    if channel:
        d["Overlap"] = rng.randint(0, 2, n)
        d["ScanChannel"] = rng.randint(0, 4, n)
    return pd.DataFrame(d)


def _roundtrip(spark, tmp_path, pdf, expect_fmt, **kw):
    df = spark.createDataFrame(pdf)
    out = tmp_path / f"las{expect_fmt}"
    nfiles = las.write_las(df.repartition(3), str(out), **kw)
    assert nfiles >= 1
    hdr = las._parse_las_header(
        next(out.glob("*.las")).read_bytes())
    assert hdr["fmt"] == expect_fmt
    back = (las.read_las(spark, str(out)).toPandas()
            .sort_values(["X", "Y", "Z"]).reset_index(drop=True))
    want = pdf.sort_values(["X", "Y", "Z"]).reset_index(drop=True)
    assert len(back) == len(want)
    return back, want


def test_las12_pdrf3_roundtrip(spark, tmp_path):
    pdf = _frame()
    back, want = _roundtrip(spark, tmp_path, pdf, 3)
    for c in ("X", "Y", "Z"):
        np.testing.assert_allclose(back[c], want[c], atol=0.0051)
    for c in ("Intensity", "ReturnNumber", "NumberOfReturns",
              "ScanDirectionFlag", "EdgeOfFlightLine",
              "Classification", "Synthetic", "KeyPoint", "Withheld",
              "UserData", "PointSourceId", "Red", "Green", "Blue"):
        np.testing.assert_array_equal(back[c], want[c], err_msg=c)
    np.testing.assert_array_equal(back["ScanAngleRank"],
                                  want["ScanAngleRank"])
    np.testing.assert_array_equal(back["GpsTime"], want["GpsTime"])


def test_las14_pdrf8_roundtrip(spark, tmp_path):
    pdf = _frame(nir=True, channel=True)
    back, want = _roundtrip(spark, tmp_path, pdf, 8)
    for c in ("Overlap", "ScanChannel", "Infrared",
              "Classification", "ReturnNumber", "NumberOfReturns"):
        np.testing.assert_array_equal(back[c], want[c], err_msg=c)
    # 1.4 scan angle is int16 * .006 deg (Utils.cpp:729)
    np.testing.assert_allclose(back["ScanAngleRank"],
                               want["ScanAngleRank"], atol=0.0031)


def test_pdrf_inference(spark, tmp_path):
    pdf = _frame(color=False, time=False)
    back, want = _roundtrip(spark, tmp_path, pdf, 0)
    assert "GpsTime" not in back.columns
    pdf2 = _frame(color=False, time=True)
    back2, _ = _roundtrip(spark, tmp_path, pdf2, 1)
    assert "Red" not in back2.columns


def test_header_metadata_carries_partition_bounds(spark, tmp_path):
    pdf = _frame(50)
    df = spark.createDataFrame(pdf)
    out = tmp_path / "meta"
    las.write_las(df.coalesce(1), str(out))
    raw = next(out.glob("*.las")).read_bytes()
    bounds = struct.unpack_from("<6d", raw, 179)
    assert bounds[0] == pytest.approx(pdf["X"].max(), abs=0.0051)
    assert bounds[1] == pytest.approx(pdf["X"].min(), abs=0.0051)
    (count,) = struct.unpack_from("<I", raw, 107)
    assert count == 50
    by_ret = struct.unpack_from("<5I", raw, 111)
    assert sum(by_ret) == 50


def test_laz_and_waveform_rejected(spark, tmp_path):
    pdf = _frame(10)
    df = spark.createDataFrame(pdf)
    out = tmp_path / "rej"
    las.write_las(df.coalesce(1), str(out))
    fp = next(out.glob("*.las"))
    raw = bytearray(fp.read_bytes())
    raw[104] |= 0x80  # compression bit -> LAZ (no laszip VLR)
    # r3: a pure-Python decoder is registered by default; the bare
    # rejection path only applies when it is unregistered
    default = las._LAZ_DECODER
    las.register_laz_decoder(None)
    try:
        with pytest.raises(ValueError, match="LAZ"):
            las._parse_las_header(bytes(raw))
    finally:
        las.register_laz_decoder(default)
    # with the default decoder a VLR-less LAZ shell still fails
    # loudly at decode time (no laszip VLR to describe the stream)
    hdr = las._parse_las_header(bytes(raw))
    with pytest.raises(ValueError, match="laszip VLR"):
        las._decode_las(bytes(raw), hdr)
    # r5: waveform formats 4/5/9/10 are now READABLE uncompressed
    # (documented superset; the reference rejects them) — the
    # negative example is an out-of-range format instead
    raw[104] = 11
    with pytest.raises(ValueError, match="point format 11"):
        las._parse_las_header(bytes(raw))
    # a waveform format with a too-small point size still rejects
    raw[104] = 4      # base 57 > this file's record size
    with pytest.raises(ValueError, match="pointSize"):
        las._parse_las_header(bytes(raw))


def test_extra_bytes_skipped(spark, tmp_path):
    """pointSize > baseCount: trailing extra bytes per record are
    skipped in place (Header.hpp ebCount)."""
    pdf = _frame(20, color=False, time=False)
    df = spark.createDataFrame(pdf)
    out = tmp_path / "eb"
    las.write_las(df.coalesce(1), str(out))
    fp = next(out.glob("*.las"))
    raw = bytearray(fp.read_bytes())
    (hdr_size,) = struct.unpack_from("<H", raw, 94)
    base = las._BASE[0]
    body = bytes(raw[hdr_size:])
    recs = [body[i * base:(i + 1) * base] + b"\xAB\xCD"
            for i in range(20)]
    struct.pack_into("<H", raw, 105, base + 2)
    fat = bytes(raw[:hdr_size]) + b"".join(recs)
    fat_fp = tmp_path / "eb2" / "p.las"
    fat_fp.parent.mkdir()
    fat_fp.write_bytes(fat)
    back = las.read_las(spark, str(fat_fp)).toPandas()
    assert len(back) == 20
    np.testing.assert_array_equal(
        np.sort(back["Intensity"].to_numpy()),
        np.sort(pdf["Intensity"].to_numpy()))


def test_mixed_formats_error(spark, tmp_path):
    d1 = tmp_path / "mix"
    d1.mkdir()
    las.write_las(spark.createDataFrame(_frame(10)).coalesce(1),
                  str(d1 / "a"))
    las.write_las(
        spark.createDataFrame(_frame(10, color=False)).coalesce(1),
        str(d1 / "b"))
    with pytest.raises(Exception, match="format"):
        las.read_las(spark, str(d1) + "/*/*.las").toPandas()


def test_extra_dims_option(spark, tmp_path):
    """readers.las `extra_dims` (LasReader.cpp:188): trailing
    record bytes surface as typed columns; spec exceeding the
    record's extra bytes rejects loudly."""
    import struct

    import numpy as np

    import pdal_spark.sources.las as L

    n = 100
    fmt, base = 1, 28
    eb = 6  # uint16 + float
    size = base + eb
    buf = bytearray(L._pack_las(
        __import__("pandas").DataFrame({
            "X": np.arange(n, dtype="f8"),
            "Y": np.zeros(n), "Z": np.zeros(n),
            "GpsTime": np.arange(n, dtype="f8")}),
        fmt, (1, 1, 1), (0, 0, 0), 2))
    # rebuild with extra bytes appended per record
    hdr = bytes(buf[:227])
    recs = bytes(buf[227:])
    out = bytearray(hdr)
    struct.pack_into("<H", out, 105, size)
    for i in range(n):
        out += recs[i * base:(i + 1) * base]
        out += struct.pack("<Hf", i * 3, i * 0.5)
    fp = tmp_path / "eb" / "a.las"
    fp.parent.mkdir()
    fp.write_bytes(bytes(out))

    df = L.read_las(spark, str(fp.parent),
                    extra_dims="counter=uint16,weight=float")
    pdf = df.toPandas().sort_values("X").reset_index(drop=True)
    assert pdf.counter.tolist() == [i * 3 for i in range(n)]
    assert np.allclose(pdf.weight, np.arange(n) * 0.5)

    import pytest as _pt

    with _pt.raises(Exception, match="extra"):
        L.read_las(spark, str(fp.parent),
                   extra_dims="a=double,b=double").collect()


def test_ept_surfaces_schema_extra_dims(spark):
    """EPT laszip nodes: non-standard schema entries (OriginId)
    decode from the LAS extra bytes as typed columns (this fixture
    stores origin 0 throughout — verified against the raw stream
    bytes)."""
    import os

    import pytest as _pt

    if not os.path.isdir("/root/reference/test/data"):
        _pt.skip("reference test data not present")
    from pdal_spark.sources.ept import read_ept

    df = read_ept(spark,
                  "/root/reference/test/data/ept/lone-star-laszip")
    assert "OriginId" in df.columns
    vals = df.groupBy("OriginId").count().collect()
    assert {r.OriginId for r in vals} == {0}
    assert sum(r["count"] for r in vals) == 518862
