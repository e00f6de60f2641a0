"""Waveform point formats 4/5/9/10 (uncompressed) — a documented
SUPERSET of the reference, which rejects these formats outright
(io/private/las/Utils.hpp:93-108 pointFormatSupported; lazperf
readers.cpp:247-251 likewise rejects their LAZ). Old LAS 1.3
waveform archives carry real point data plus per-point wave-packet
fields; we read/write the points and surface the wave-packet fields
as typed columns, dropping waveform EVLR data exactly as even
wave-aware readers commonly do.

Ground truth is the LAS 1.4 spec field layout (§2.5/2.6/2.11/2.12),
pinned here by hand-packing records byte-by-byte at the spec
offsets — independent of our writer — and additionally round-trip
through Spark write_las/read_las.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from pdal_spark.sources.las import (
    _BASE,
    _record_dtype,
    read_las,
    write_las,
)


def test_base_sizes_match_spec():
    # twin + 29-byte wave block
    assert _BASE[4] == 28 + 29
    assert _BASE[5] == 34 + 29
    assert _BASE[9] == 30 + 29
    assert _BASE[10] == 38 + 29


def test_pdrf4_field_layout_hand_packed():
    # LAS spec PDRF 4 = PDRF 1 (28 bytes) + wave packet (29 bytes)
    rec = bytearray(57)
    struct.pack_into("<iii", rec, 0, 1234, -567, 89)     # XYZ
    struct.pack_into("<H", rec, 12, 777)                 # Intensity
    rec[14] = (2 << 3) | 1                               # ret 1 of 2
    rec[15] = 3                                          # class
    struct.pack_into("<b", rec, 16, -21)                 # scan angle
    rec[17] = 9                                          # user
    struct.pack_into("<H", rec, 18, 42)                  # psid
    struct.pack_into("<d", rec, 20, 123456.789)          # gps
    rec[28] = 2                                          # wave desc
    struct.pack_into("<Q", rec, 29, 1000)                # wave off
    struct.pack_into("<I", rec, 37, 256)                 # wave size
    struct.pack_into("<f", rec, 41, 1.5)                 # return loc
    struct.pack_into("<3f", rec, 45, 0.1, 0.2, 0.3)      # dx dy dz

    arr = np.frombuffer(bytes(rec), dtype=_record_dtype(4, 57))
    assert arr["X"][0] == 1234 and arr["Y"][0] == -567
    assert arr["Intensity"][0] == 777
    assert arr["flags"][0] == ((2 << 3) | 1)
    assert arr["gps"][0] == 123456.789
    assert arr["wave_desc"][0] == 2
    assert arr["wave_off"][0] == 1000
    assert arr["wave_size"][0] == 256
    assert arr["wave_ret"][0] == np.float32(1.5)
    assert arr["wave_zt"][0] == np.float32(0.3)


def test_pdrf10_field_layout_hand_packed():
    # PDRF 10 = PDRF 6 (30) + RGB (6) + NIR (2) + wave (29) = 67
    rec = bytearray(67)
    struct.pack_into("<iii", rec, 0, 10, 20, 30)
    struct.pack_into("<3H", rec, 30, 111, 222, 333)      # RGB
    struct.pack_into("<H", rec, 36, 444)                 # NIR
    rec[38] = 7                                          # wave desc
    struct.pack_into("<f", rec, 51, 2.5)                 # return loc
    arr = np.frombuffer(bytes(rec), dtype=_record_dtype(10, 67))
    assert arr["red"][0] == 111 and arr["nir"][0] == 444
    assert arr["wave_desc"][0] == 7
    assert arr["wave_ret"][0] == np.float32(2.5)


def _wave_pdf(n=500, fmt=4, seed=9):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "X": np.round(rng.uniform(0, 100, n), 2),
        "Y": np.round(rng.uniform(0, 100, n), 2),
        "Z": np.round(rng.uniform(0, 50, n), 2),
        "Intensity": rng.integers(0, 60000, n).astype("int32"),
        "ReturnNumber": rng.integers(1, 6, n).astype("int16"),
        "NumberOfReturns": np.full(n, 5, dtype="int16"),
        "Classification": rng.integers(0, 20, n).astype("int16"),
        "GpsTime": np.sort(rng.uniform(1e5, 2e5, n)),
        "WavePacketDescriptorIndex":
            rng.integers(0, 4, n).astype("int16"),
        "WaveformDataOffset":
            rng.integers(0, 2**40, n).astype("int64"),
        "WaveformPacketSize":
            rng.integers(0, 2**20, n).astype("int64"),
        "ReturnPointWaveformLocation":
            rng.uniform(0, 10, n).astype("float32"),
        "ParametricDx": rng.uniform(-1, 1, n).astype("float32"),
        "ParametricDy": rng.uniform(-1, 1, n).astype("float32"),
        "ParametricDz": rng.uniform(-1, 1, n).astype("float32"),
    })
    if fmt in (5, 10):
        pdf["Red"] = rng.integers(0, 65536, n).astype("int32")
        pdf["Green"] = rng.integers(0, 65536, n).astype("int32")
        pdf["Blue"] = rng.integers(0, 65536, n).astype("int32")
    if fmt == 10:
        pdf["Infrared"] = rng.integers(0, 65536, n).astype("int32")
    return pdf


@pytest.mark.parametrize("fmt", [4, 5, 9, 10])
def test_wave_round_trip(spark, tmp_path, fmt):
    pdf = _wave_pdf(fmt=fmt)
    df = spark.createDataFrame(pdf).repartition(1)
    out = str(tmp_path / f"wave{fmt}")
    assert write_las(df, out, pdrf=fmt) == 1
    back = read_las(spark, out + "/*.las").toPandas() \
        .sort_values("GpsTime").reset_index(drop=True)
    src = pdf.sort_values("GpsTime").reset_index(drop=True)
    assert len(back) == len(src)
    for c in ("Intensity", "ReturnNumber", "Classification",
              "WavePacketDescriptorIndex", "WaveformDataOffset",
              "WaveformPacketSize"):
        assert (back[c].to_numpy()
                == src[c].to_numpy()).all(), c
    np.testing.assert_allclose(back.X, src.X, atol=0.005)
    np.testing.assert_array_equal(
        back.ReturnPointWaveformLocation.to_numpy("float32"),
        src.ReturnPointWaveformLocation.to_numpy("float32"))
    if fmt == 10:
        assert (back.Infrared.to_numpy()
                == src.Infrared.to_numpy()).all()


def test_wave_laz_rejected(spark, tmp_path):
    df = spark.createDataFrame(_wave_pdf(n=10)).repartition(1)
    with pytest.raises(ValueError, match="WAVEPACKET"):
        write_las(df, str(tmp_path / "x"), pdrf=4, laz=True)


def test_wave_header_version(spark, tmp_path):
    # formats 4/5 need the LAS 1.3 header, 9/10 the 1.4 header
    import glob

    for fmt, want_vmin in ((4, 3), (9, 4)):
        out = str(tmp_path / f"v{fmt}")
        write_las(spark.createDataFrame(
            _wave_pdf(n=20, fmt=fmt)).repartition(1), out, pdrf=fmt)
        fp = glob.glob(out + "/*.las")[0]
        head = open(fp, "rb").read(120)
        assert head[25] == want_vmin
