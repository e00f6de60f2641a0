"""readers.fbi / writers.fbi round-trips (io/FbiReader.cpp,
io/FbiWriter.cpp; packed 1808-byte header FbiWriter.cpp:66)."""

import numpy as np
import pandas as pd
import pytest

import pdal_spark.sources.fbi as fbi


def _frame(n=250, seed=13, color=True, normal=True):
    rng = np.random.RandomState(seed)
    d = {
        "X": 25000.0 + rng.randint(0, 10**6, n) / 100.0,
        "Y": 6700000.0 + rng.randint(0, 10**6, n) / 100.0,
        "Z": rng.randint(0, 30000, n) / 100.0,
        "Intensity": rng.randint(0, 65536, n),
        "Classification": rng.randint(0, 32, n),
        "ReturnNumber": rng.randint(1, 6, n),
        "PointSourceId": rng.randint(0, 200, n),
        "OffsetTime": rng.randint(0, 2**31, n),
        "Amplitude": rng.randint(0, 65536, n),
    }
    if color:
        d["Red"] = rng.randint(0, 65536, n)
        d["Green"] = rng.randint(0, 65536, n)
        d["Blue"] = rng.randint(0, 65536, n)
        d["Infrared"] = rng.randint(0, 65536, n)
    if normal:
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1)[:, None]
        d["NormalX"], d["NormalY"], d["NormalZ"] = v.T
        d["Dimension"] = rng.randint(0, 4, n)
    return pd.DataFrame(d)


def test_fbi_roundtrip(spark, tmp_path):
    pdf = _frame()
    df = spark.createDataFrame(pdf)
    out = tmp_path / "rt"
    nfiles = fbi.write_fbi(df.repartition(3), str(out))
    assert nfiles >= 1
    back = (fbi.read_fbi(spark, str(out)).toPandas()
            .sort_values(["X", "Y", "Z"]).reset_index(drop=True))
    want = pdf.sort_values(["X", "Y", "Z"]).reset_index(drop=True)
    assert len(back) == len(want)
    for c in ("X", "Y", "Z"):
        np.testing.assert_allclose(back[c], want[c], atol=0.0051)
    for c in ("Intensity", "Classification", "ReturnNumber",
              "PointSourceId", "OffsetTime", "Amplitude",
              "Red", "Green", "Blue", "Infrared", "Dimension"):
        np.testing.assert_array_equal(back[c], want[c], err_msg=c)
    # normals survive the 15-bit spherical quantization
    for c in ("NormalX", "NormalY", "NormalZ"):
        np.testing.assert_allclose(back[c], want[c], atol=3e-4,
                                   err_msg=c)


def test_fbi_minimal_xyz_only(spark, tmp_path):
    pdf = _frame(30, color=False, normal=False)[["X", "Y", "Z"]]
    out = tmp_path / "xyz"
    fbi.write_fbi(spark.createDataFrame(pdf).coalesce(1), str(out))
    hdr = fbi._parse_fbi_header(next(out.glob("*.fbi")).read_bytes())
    assert hdr["count"] == 30
    assert hdr["bits"]["Color"] == 0
    assert hdr["bits"]["Normal"] == 0
    assert hdr["org"][0] == pytest.approx(pdf["X"].min())
    back = fbi.read_fbi(spark, str(out)).toPandas()
    assert list(back.columns) == ["X", "Y", "Z"]
    np.testing.assert_allclose(
        np.sort(back["Z"].to_numpy()),
        np.sort(pdf["Z"].to_numpy()), atol=0.0051)


def test_fbi_rgb_without_ir_is_48bit(spark, tmp_path):
    pdf = _frame(20, normal=False).drop(columns=["Infrared"])
    out = tmp_path / "rgb48"
    fbi.write_fbi(spark.createDataFrame(pdf).coalesce(1), str(out))
    hdr = fbi._parse_fbi_header(next(out.glob("*.fbi")).read_bytes())
    assert hdr["bits"]["Color"] == 48
    back = fbi.read_fbi(spark, str(out)).toPandas()
    assert "Infrared" not in back.columns
    np.testing.assert_array_equal(
        np.sort(back["Red"]), np.sort(pdf["Red"]))


def test_fbi_bad_signature():
    with pytest.raises(ValueError, match="FASTBIN"):
        fbi._parse_fbi_header(b"\x00" * 2000)
