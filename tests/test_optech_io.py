"""readers.optech fixture + independent per-row georeference oracle
(io/OptechReader.cpp:160-240, pdal/util/Georeference.cpp:50-90,
io/OptechCommon.hpp:81-99)."""

import math
import struct

import numpy as np
import pytest

import pdal_spark.sources.optech as op


def _csd_bytes(pulses, mis=(0.001, -0.002, 0.0005),
               imu=(0.0002, 0.0001, -0.0003)):
    hdr = bytearray(2048)
    hdr[0:4] = b"CSD\0"
    struct.pack_into("<2H", hdr, 104, 2048, 1234)
    struct.pack_into("<2d", hdr, 108, 0.0, 1.0)
    struct.pack_into("<I", hdr, 124, len(pulses))
    struct.pack_into("<3d", hdr, 1154, *mis)
    struct.pack_into("<3d", hdr, 1178, *imu)
    recs = b""
    for p in pulses:
        recs += struct.pack("<dB4f4H4f2df", p["gps"], p["nret"],
                            *p["range"], *p["inten"], p["angle"],
                            p["roll"], p["pitch"], p["head"],
                            p["lat"], p["lon"], p["elev"])
    return bytes(hdr) + recs


def _rot(roll, pitch, head):
    cr, sr = math.cos(roll), math.sin(roll)
    cp, sp = math.cos(pitch), math.sin(pitch)
    ch, sh = math.cos(head), math.sin(head)
    return [[cr * ch + sp * sr * sh, cp * sh,
             ch * sr - cr * sp * sh],
            [ch * sp * sr - cr * sh, cp * ch,
             -sr * sh - cr * ch * sp],
            [-cp * sr, sp, cp * cr]]


def _apply(m, v):
    return [sum(m[i][j] * v[j] for j in range(3)) for i in range(3)]


def _oracle_point(p, ridx, mis, imu):
    a, f = 6378137.0, 1 / 298.257223563
    e2 = 2 * f - f * f
    rng = np.float32(p["range"][ridx])
    ang = np.float32(p["angle"])
    socs = [rng * math.sin(ang), 0.0, -rng * math.cos(ang)]
    bore = _rot(*(m + o for m, o in zip(mis, imu)))
    imu_m = _rot(np.float32(p["roll"]), np.float32(p["pitch"]),
                 np.float32(p["head"]))
    ll = _apply(imu_m, _apply(bore, socs))
    lat = p["lat"]
    w = math.sqrt(1 - e2 * math.sin(lat) ** 2)
    n = a / w
    mrad = a * (1 - e2) / w ** 3
    lon = p["lon"]
    if lon < -2 * math.pi:
        lon += 2 * math.pi
    deg = 180 / math.pi
    return ((lon + ll[0] / (n * math.cos(lat))) * deg,
            (lat + ll[1] / mrad) * deg,
            np.float32(p["elev"]) + ll[2])


def test_optech_georeference_matches_oracle(spark, tmp_path):
    rng = np.random.RandomState(17)
    pulses = []
    for i in range(30):
        pulses.append({
            "gps": 1000.0 + i, "nret": int(rng.randint(1, 5)),
            "range": [float(r) for r in rng.uniform(500, 1500, 4)],
            "inten": [int(v) for v in rng.randint(0, 4096, 4)],
            "angle": float(rng.uniform(-0.3, 0.3)),
            "roll": float(rng.uniform(-0.05, 0.05)),
            "pitch": float(rng.uniform(-0.05, 0.05)),
            "head": float(rng.uniform(0, 6.2)),
            "lat": math.radians(44.0) + float(rng.uniform(0, 1e-3)),
            "lon": math.radians(-76.0) - 2 * math.pi,  # wrap case
            "elev": float(rng.uniform(800, 1200)),
        })
    mis = (0.001, -0.002, 0.0005)
    imu = (0.0002, 0.0001, -0.0003)
    fp = tmp_path / "a.csd"
    fp.write_bytes(_csd_bytes(pulses, mis, imu))
    df = (op.read_optech(spark, str(fp)).toPandas()
          .sort_values(["GpsTime", "ReturnNumber"])
          .reset_index(drop=True))
    assert len(df) == sum(p["nret"] for p in pulses)
    i = 0
    for p in pulses:
        for r in range(p["nret"]):
            row = df.iloc[i]
            ox, oy, oz = _oracle_point(p, r, mis, imu)
            assert row["X"] == pytest.approx(ox, abs=1e-9)
            assert row["Y"] == pytest.approx(oy, abs=1e-9)
            assert row["Z"] == pytest.approx(oz, abs=1e-6)
            want_rn = p["nret"] if r == 3 else r + 1
            assert row["ReturnNumber"] == want_rn
            assert row["NumberOfReturns"] == p["nret"]
            assert row["Intensity"] == p["inten"][r]
            i += 1


def test_optech_zero_return_pulses_drop(spark, tmp_path):
    pulses = [{"gps": 1.0, "nret": 0,
               "range": [0, 0, 0, 0], "inten": [0, 0, 0, 0],
               "angle": 0.0, "roll": 0.0, "pitch": 0.0, "head": 0.0,
               "lat": 0.7, "lon": 0.1, "elev": 100.0},
              {"gps": 2.0, "nret": 2,
               "range": [900.0, 905.0, 0, 0],
               "inten": [10, 20, 0, 0],
               "angle": 0.1, "roll": 0.0, "pitch": 0.0, "head": 0.0,
               "lat": 0.7, "lon": 0.1, "elev": 100.0}]
    fp = tmp_path / "z.csd"
    fp.write_bytes(_csd_bytes(pulses))
    df = op.read_optech(spark, str(fp)).toPandas()
    assert len(df) == 2
    assert set(df["GpsTime"]) == {2.0}


def test_optech_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        op._parse_csd_header(b"\x00" * 2048)
