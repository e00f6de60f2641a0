"""readers.qfit / readers.terrasolid / readers.ptx fixtures built
byte-for-byte from the reference layouts (io/QfitReader.cpp:296-385,
io/TerrasolidReader.cpp:60-185, io/PtxReader.cpp:61-360)."""

import struct

import numpy as np
import pytest

import pdal_spark.sources.scanners as sc


def _qfit_bytes(words=14, endo="<", n=50, seed=3):
    rng = np.random.RandomState(seed)
    size = words * 4
    hdr = struct.pack(endo + "i", size) + b" " * (size - 4)
    # second header record: first word negative (history record),
    # second word = data offset
    off = 2 * size
    rec2 = struct.pack(endo + "ii", -1, off) + b" " * (size - 8)
    rows = rng.randint(-10**6, 10**6, (n, words)).astype(endo + "i4")
    rows[:, 1] = rng.randint(0, 90 * 10**6, n)       # lat microdeg
    rows[:, 2] = rng.randint(0, 359 * 10**6, n)      # lon microdeg
    return hdr + rec2 + rows.tobytes(), rows


def test_qfit_le_and_be(spark, tmp_path):
    for endo, name in (("<", "le"), (">", "be")):
        raw, rows = _qfit_bytes(endo=endo)
        fp = tmp_path / name / "f.qi"
        fp.parent.mkdir()
        fp.write_bytes(raw)
        df = sc.read_qfit(spark, str(fp)).toPandas()
        assert len(df) == 50
        host = rows.astype("i4")
        np.testing.assert_allclose(df["Y"], host[:, 1] / 1e6)
        np.testing.assert_allclose(df["Z"], host[:, 3] * 0.001)
        np.testing.assert_array_equal(df["StartPulse"], host[:, 4])
        np.testing.assert_allclose(df["Pitch"], host[:, 7] / 1000.0)
        assert "PassiveX" in df.columns  # 14-word format


def test_qfit_flip_and_12word(spark, tmp_path):
    raw, rows = _qfit_bytes(words=12)
    fp = tmp_path / "f12.qi"
    fp.write_bytes(raw)
    df = sc.read_qfit(spark, str(fp), flip_coordinates=True) \
        .toPandas()
    assert "Pdop" in df.columns and "PassiveX" not in df.columns
    x = rows[:, 2].astype("i4") / 1e6
    np.testing.assert_allclose(df["X"], np.where(x > 180, x - 360, x))
    np.testing.assert_allclose(df["Pdop"], rows[:, 9] / 10.0)


def _terra_bytes(fmt=2, time=True, color=True, n=40, seed=5,
                 units=100, org=(100.0, 200.0, 10.0)):
    rng = np.random.RandomState(seed)
    version = 20010712 if fmt == 1 else 20020715
    hdr = struct.pack("<3i4s2i3d2i", 56, version, 970401, b"BIN0",
                      n, units, *org, int(time), int(color))
    parts = []
    truth = []
    t0 = 123450
    for i in range(n):
        if fmt == 2:
            x, y, z = rng.randint(-10**6, 10**6, 3)
            cls, echo = rng.randint(0, 32), rng.randint(0, 4)
            rec = struct.pack("<3i4B2H", x, y, z, cls, echo,
                              rng.randint(0, 2), rng.randint(0, 2),
                              rng.randint(0, 100),
                              rng.randint(0, 1000))
        else:
            x, y, z = rng.randint(0, 256, 3)
            cls, echo = rng.randint(0, 32), rng.randint(0, 4)
            rec = struct.pack("<6B", cls, rng.randint(0, 100), echo,
                              x, y, z)
        if time:
            rec += struct.pack("<I", t0 + i * 25)
        if color:
            rec += struct.pack("<4B", *rng.randint(0, 256, 4))
        parts.append(rec)
        truth.append((x, y, z, cls, echo))
    return hdr + b"".join(parts), truth


def test_terrasolid_format2(spark, tmp_path):
    raw, truth = _terra_bytes()
    fp = tmp_path / "t2.bin"
    fp.write_bytes(raw)
    df = sc.read_terrasolid(spark, str(fp)).toPandas()
    assert len(df) == 40
    xs = np.array([t[0] for t in truth], dtype="f8")
    np.testing.assert_allclose(df["X"], (xs - 100.0) / 100.0)
    echo = np.array([t[4] for t in truth])
    np.testing.assert_array_equal(df["ReturnNumber"],
                                  (echo <= 1).astype("i2"))
    np.testing.assert_array_equal(df["NumberOfReturns"],
                                  (echo == 0).astype("i2"))
    # 1/5000ths of a second -> ms, offset from first point
    assert df["OffsetTime"].iloc[0] == 0
    assert df["OffsetTime"].iloc[1] == 5
    assert {"Red", "Green", "Blue", "Alpha"} <= set(df.columns)


def test_terrasolid_format1_minimal(spark, tmp_path):
    raw, truth = _terra_bytes(fmt=1, time=False, color=False)
    fp = tmp_path / "t1.bin"
    fp.write_bytes(raw)
    df = sc.read_terrasolid(spark, str(fp)).toPandas()
    assert "OffsetTime" not in df.columns
    assert "Intensity" not in df.columns
    zs = np.array([t[2] for t in truth], dtype="f8")
    np.testing.assert_allclose(df["Z"], (zs - 10.0) / 100.0)


def test_terrasolid_bad_magic(spark, tmp_path):
    with pytest.raises(ValueError, match="970401"):
        sc._terra_header(struct.pack("<3i4s2i3d2i", 56, 20020715,
                                     999, b"x\0\0\0", 1, 1,
                                     0.0, 0.0, 0.0, 0, 0))


def _ptx_text(two_clouds=True):
    # 2x2 grid, identity transform; second cloud translated +10 in X
    def cloud(tx, pts):
        head = ["2", "2", "0 0 0", "1 0 0", "0 1 0", "0 0 1",
                "1 0 0 0", "0 1 0 0", "0 0 1 0", f"{tx} 0 0 1"]
        return "\n".join(head + pts)
    pts1 = ["1 2 3 0.5", "0 0 0 0.5", "4 5 6 1.0", "7 8 9 0.25"]
    s = cloud(0, pts1)
    if two_clouds:
        s += "\n" + cloud(10, ["1 1 1 0.5", "2 2 2 0.5",
                               "3 3 3 0.5", "0 0 0 0"])
    return s + "\n"


def test_ptx_multi_cloud_transform_and_missing(spark, tmp_path):
    fp = tmp_path / "a.ptx"
    fp.write_text(_ptx_text())
    df = (sc.read_ptx(spark, str(fp)).toPandas()
          .sort_values(["cloud", "X"]).reset_index(drop=True))
    # 8 rows minus two "0 0 0" missing points
    assert len(df) == 6
    assert set(df["cloud"]) == {0, 1}
    c1 = df[df["cloud"] == 1]
    np.testing.assert_allclose(sorted(c1["X"]), [11.0, 12.0, 13.0])
    np.testing.assert_allclose(
        df[df["cloud"] == 0]["Intensity"].sort_values(),
        [0.25 * 4096, 0.5 * 4096, 1.0 * 4096])
    keep = sc.read_ptx(spark, str(fp), discard_missing=False) \
        .toPandas()
    assert len(keep) == 8


def test_ptx_rgb_arity(spark, tmp_path):
    head = ["1", "2", "0 0 0", "1 0 0", "0 1 0", "0 0 1",
            "1 0 0 0", "0 1 0 0", "0 0 1 0", "0 0 0 1"]
    pts = ["1 2 3 0.5 255 128 0", "4 5 6 0.1 1 2 3"]
    fp = tmp_path / "rgb.ptx"
    fp.write_text("\n".join(head + pts) + "\n")
    df = sc.read_ptx(spark, str(fp)).toPandas()
    assert list(df["Red"].sort_values()) == [1, 255]
