"""readers.bpf / writers.bpf round-trips (io/BpfReader.cpp,
io/BpfWriter.cpp; header layout io/BpfHeader.cpp:92-160)."""

import numpy as np
import pandas as pd
import pytest

import pdal_spark.sources.bpf as bpf


def _frame(n=300, seed=11):
    rng = np.random.RandomState(seed)
    # quarters are exact in float32 after the min-offset subtraction
    return pd.DataFrame({
        "X": 500000.0 + rng.randint(0, 4000, n) * 0.25,
        "Y": 4100000.0 + rng.randint(0, 4000, n) * 0.25,
        "Z": rng.randint(0, 1200, n) * 0.25,
        "Intensity": rng.randint(0, 1024, n).astype("f8"),
        "GpsTime": rng.randint(0, 10**6, n) * 0.25,
    })


@pytest.mark.parametrize("interleave", ["dim", "point", "byte"])
@pytest.mark.parametrize("compression", [False, True])
def test_bpf_roundtrip(spark, tmp_path, interleave, compression):
    pdf = _frame()
    df = spark.createDataFrame(pdf)
    out = tmp_path / f"{interleave}-{compression}"
    nfiles = bpf.write_bpf(df.repartition(3), str(out),
                           interleave=interleave,
                           compression=compression)
    assert nfiles >= 1
    back = (bpf.read_bpf(spark, str(out)).toPandas()
            .sort_values(["X", "Y", "Z"]).reset_index(drop=True))
    want = pdf.sort_values(["X", "Y", "Z"]).reset_index(drop=True)
    assert list(back.columns) == list(pdf.columns)
    for c in pdf.columns:
        np.testing.assert_allclose(back[c], want[c], rtol=0,
                                   atol=1e-9, err_msg=c)


def test_bpf_header_fields(spark, tmp_path):
    pdf = _frame(40)
    df = spark.createDataFrame(pdf)
    out = tmp_path / "hdr"
    bpf.write_bpf(df.coalesce(1), str(out), coord_id=18)
    hdr = bpf._parse_bpf_header(next(out.glob("*.bpf")).read_bytes())
    assert hdr["npts"] == 40
    assert hdr["coord_id"] == 18
    assert hdr["coord_type"] == 1  # UTM
    assert hdr["labels"] == list(pdf.columns)
    # auto-offset: XYZ offsets equal the partition minimum
    assert hdr["offsets"][0] == pytest.approx(pdf["X"].min())
    assert hdr["offsets"][3] == 0.0  # non-XYZ dims keep offset 0
    np.testing.assert_allclose(hdr["mins"][2], pdf["Z"].min())
    np.testing.assert_allclose(hdr["maxs"][2], pdf["Z"].max())


def test_bpf_rejects_bad_input(spark, tmp_path):
    with pytest.raises(ValueError, match="magic"):
        bpf._parse_bpf_header(b"\x00" * 200)
    pdf = _frame(10)
    out = tmp_path / "rej"
    bpf.write_bpf(spark.createDataFrame(pdf).coalesce(1), str(out))
    raw = bytearray(next(out.glob("*.bpf")).read_bytes())
    raw[4:8] = b"0001"
    with pytest.raises(ValueError, match="version 1"):
        bpf._parse_bpf_header(bytes(raw))


def test_bpf_mixed_dims_error(spark, tmp_path):
    d = tmp_path / "mix"
    d.mkdir()
    bpf.write_bpf(spark.createDataFrame(_frame(10)).coalesce(1),
                  str(d / "a"))
    bpf.write_bpf(
        spark.createDataFrame(_frame(10).drop(columns=["GpsTime"]))
        .coalesce(1), str(d / "b"))
    with pytest.raises(Exception, match="differ"):
        bpf.read_bpf(spark, str(d) + "/*/*.bpf").toPandas()
