"""Pure-Python LASzip decoder validated against INDEPENDENT ground
truth: the reference's own .las/.laz twin fixtures (the .las side is
read by the proven uncompressed reader; the .laz side was produced
by laszip/liblas, not by this repo)."""

from __future__ import annotations

import os

import pytest

import pdal_spark.sources.las as L
import pdal_spark.sources.lazdec as D

_REF = "/root/reference/test/data"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(_REF),
    reason="reference test data not present",
)


def _decode_pair(plaz: str, plas: str):
    laz = open(plaz, "rb").read()
    las = open(plas, "rb").read()
    df_laz = L._decode_las(laz, L._parse_las_header(laz))
    df_las = L._decode_las(las, L._parse_las_header(las))
    return df_laz, df_las


def _assert_identical(df_laz, df_las):
    assert list(df_laz.columns) == list(df_las.columns)
    assert len(df_laz) == len(df_las)
    for c in df_las.columns:
        a = df_las[c].to_numpy()
        b = df_laz[c].to_numpy()
        assert (a == b).all(), f"column {c} differs"


@needs_ref
def test_laszip_generated_matches_basefile():
    df_laz, df_las = _decode_pair(
        f"{_REF}/laszip/laszip-generated.laz",
        f"{_REF}/laszip/basefile.las",
    )
    assert len(df_laz) == 1065
    _assert_identical(df_laz, df_las)


@needs_ref
def test_liblas_generated_matches_basefile():
    df_laz, df_las = _decode_pair(
        f"{_REF}/laszip/liblas-generated.laz",
        f"{_REF}/laszip/basefile.las",
    )
    _assert_identical(df_laz, df_las)


@needs_ref
def test_autzen_multichunk_matches_las_twin():
    """110k points = 3 chunks of 50k: exercises the arithmetic-coded
    chunk table and the per-chunk model/decoder reset."""
    df_laz, df_las = _decode_pair(
        f"{_REF}/laz/autzen_trim.laz",
        f"{_REF}/las/autzen_trim.las",
    )
    assert len(df_laz) == 110000
    _assert_identical(df_laz, df_las)


@needs_ref
def test_compressor1_rejected_with_diagnostics():
    laz = open(
        f"{_REF}/laz/simple-laszip-compressor-version-1.2r0.laz",
        "rb").read()
    hdr = L._parse_las_header(laz)
    with pytest.raises(ValueError, match="pointwise"):
        D.decompress_points(laz, hdr)


@needs_ref
def test_layered_now_decodes():
    """Layered (compressor 3) used to be the rejection fixture;
    since lazdec14 landed it decodes — rejection coverage moved to
    the compressor-1 fixture above. Full layered validation lives
    in tests/test_lazdec14.py."""
    laz = open(
        f"{_REF}/laz/las_with_several_extra_byte_bloc.laz",
        "rb").read()
    hdr = L._parse_las_header(laz)
    info = hdr["laz"]["laszip_vlr"]
    assert info["compressor"] == "layered_chunked"
    D._check_stream(info)  # no raise


@needs_ref
def test_read_las_handles_laz_through_spark(spark, tmp_path):
    """read_las on a .laz path: binaryFile scan -> worker-side
    decode, identical result to the .las twin."""
    import shutil

    d1 = tmp_path / "laz"
    d1.mkdir()
    shutil.copy(f"{_REF}/laszip/laszip-generated.laz",
                d1 / "a.laz")
    got = L.read_las(spark, str(d1)).toPandas()
    las = open(f"{_REF}/laszip/basefile.las", "rb").read()
    want = L._decode_las(las, L._parse_las_header(las))
    assert len(got) == len(want)
    import numpy as np

    g = got.sort_values(["X", "Y", "Z"]).reset_index(drop=True)
    w = want.sort_values(["X", "Y", "Z"]).reset_index(drop=True)
    for c in want.columns:
        assert (g[c].to_numpy() == w[c].to_numpy()).all(), c


@needs_ref
def test_read_las_chunked_matches_serial(spark, tmp_path):
    """Chunk-parallel decode of the 3-chunk autzen file equals the
    serial read_las result row-for-row."""
    import shutil

    d = tmp_path / "chunked"
    d.mkdir()
    shutil.copy(f"{_REF}/laz/autzen_trim.laz", d / "a.laz")
    par = (L.read_las_chunked(spark, str(d)).toPandas()
           .sort_values(["GpsTime", "X", "Y"]).reset_index(drop=True))
    ser = (L.read_las(spark, str(d)).toPandas()
           .sort_values(["GpsTime", "X", "Y"]).reset_index(drop=True))
    assert len(par) == 110000
    for c in ser.columns:
        assert (par[c].to_numpy() == ser[c].to_numpy()).all(), c


def test_read_las_chunked_plain_las(spark, tmp_path):
    """Uncompressed .las files ride the same planner (one task per
    file)."""
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame({
        "X": np.arange(20) * 0.5, "Y": np.arange(20) * 0.25,
        "Z": np.full(20, 3.0),
    })
    df = spark.createDataFrame(pdf)
    out = tmp_path / "plain"
    L.write_las(df.coalesce(1), str(out))
    got = (L.read_las_chunked(spark, str(out)).toPandas()
           .sort_values("X").reset_index(drop=True))
    assert len(got) == 20
    assert (got["X"].to_numpy() == pdf["X"].to_numpy()).all()
