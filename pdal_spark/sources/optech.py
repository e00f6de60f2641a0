"""readers.optech analog — Optech Corrected Sensor Data (.csd)
(io/OptechReader.cpp, io/OptechCommon.hpp:42-99,
pdal/util/Georeference.cpp:50-90).

A CSD file carries raw pulse records (gps time, up to 4 return
ranges + intensities, scan angle, IMU roll/pitch/heading, platform
lat/lon/elevation — all angles in radians) plus boresight
misalignment angles in the header; point coordinates are DERIVED by
georeferencing each return on read:

    pSocs       = (range*sin(scanAngle), 0, -range*cos(scanAngle))
    pAligned    = boresightMatrix  @ pSocs      (header angles)
    pLocalLevel = imuMatrix(r,p,h) @ pAligned   (per-pulse angles)
    dLon = X / (N(lat)*cos(lat)); dLat = Y / M(lat); dZ = Z
    out  = (lon + dLon, lat + dLat, elev + dZ)  -> degrees

with N/M the WGS84 prime-vertical/meridian curvature radii
(Georeference.cpp:66-72) and the rotation matrix the reference's
roll/pitch/heading form (OptechCommon.hpp:81-99). Longitudes
outside +-2pi wrap first (OptechReader.cpp:169-177). One output row
per return: ReturnNumber = index+1 except the 4th slot, which
carries the pulse's full returnCount (OptechReader.cpp:213-222);
EchoRange/Intensity are the per-return values; pulses with
returnCount 0 drop.

Spark-first shape as the other scanner formats: binaryFile one row
per file, one vectorized mapInPandas kernel — the 69-byte packed
pulse records decode with a single np.frombuffer, and the whole
rotation/georeference chain is numpy array math, never per-row
Python.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_REC = np.dtype([("gps", "<f8"), ("nret", "u1"),
                 ("range", "<f4", 4), ("inten", "<u2", 4),
                 ("angle", "<f4"), ("roll", "<f4"),
                 ("pitch", "<f4"), ("head", "<f4"),
                 ("lat", "<f8"), ("lon", "<f8"),
                 ("elev", "<f4")])
assert _REC.itemsize == 69  # NumBytesInRecord, OptechReader.hpp:57

_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = 2 * _F - _F * _F

_COLS = [("X", "double"), ("Y", "double"), ("Z", "double"),
         ("GpsTime", "double"), ("ReturnNumber", "smallint"),
         ("NumberOfReturns", "smallint"), ("EchoRange", "double"),
         ("Intensity", "int"), ("ScanAngleRank", "double")]


def _rotmat(roll, pitch, head):
    """createOptechRotationMatrix (OptechCommon.hpp:81-99); inputs
    are numpy arrays or scalars, returns 9 arrays m00..m22."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    ch, sh = np.cos(head), np.sin(head)
    return (cr * ch + sp * sr * sh, cp * sh, ch * sr - cr * sp * sh,
            ch * sp * sr - cr * sh, cp * ch, -sr * sh - cr * ch * sp,
            -cp * sr, sp, cp * cr)


def _parse_csd_header(data: bytes) -> dict:
    if data[:3] != b"CSD":
        raise ValueError("readers.optech: invalid CSD signature")
    (hdr_size, gps_week) = struct.unpack_from("<2H", data, 104)
    (min_t, max_t) = struct.unpack_from("<2d", data, 108)
    (nrec,) = struct.unpack_from("<I", data, 124)
    mis = struct.unpack_from("<3d", data, 1154)
    imu = struct.unpack_from("<3d", data, 1178)
    return {"hdr_size": hdr_size, "gps_week": gps_week,
            "count": nrec,
            "boresight": tuple(m + o for m, o in zip(mis, imu))}


def _decode_csd(data: bytes, h: dict) -> pd.DataFrame:
    rec = np.frombuffer(data, _REC, h["count"], h["hdr_size"])
    nret = np.minimum(rec["nret"], 4).astype("i8")
    keep = nret > 0
    rec, nret = rec[keep], nret[keep]
    n = len(rec)
    if n == 0:
        return pd.DataFrame({c: pd.Series([], dtype="f8")
                             for c, _ in _COLS})
    # explode pulses -> one row per return
    pulse = np.repeat(np.arange(n), nret)
    ridx = np.concatenate([np.arange(k) for k in nret]) \
        if n else np.array([], "i8")
    rng = rec["range"][pulse, ridx].astype("f8")
    inten = rec["inten"][pulse, ridx].astype("i4")

    lon = rec["lon"].astype("f8")
    lon = np.where(lon < -2 * np.pi, lon + 2 * np.pi,
                   np.where(lon > 2 * np.pi, lon - 2 * np.pi, lon))
    lat = rec["lat"].astype("f8")
    elev = rec["elev"].astype("f8")
    ang = rec["angle"].astype("f8")

    # scanner frame -> boresight -> IMU local level (per pulse,
    # then indexed per return)
    b = _rotmat(*h["boresight"])
    sx = rng * np.sin(ang[pulse])
    sz = -rng * np.cos(ang[pulse])
    ax = b[0] * sx + b[2] * sz
    ay = b[3] * sx + b[5] * sz
    az = b[6] * sx + b[8] * sz
    m = _rotmat(rec["roll"].astype("f8")[pulse],
                rec["pitch"].astype("f8")[pulse],
                rec["head"].astype("f8")[pulse])
    lx = m[0] * ax + m[1] * ay + m[2] * az
    ly = m[3] * ax + m[4] * ay + m[5] * az
    lz = m[6] * ax + m[7] * ay + m[8] * az
    # cartesian -> curvilinear deltas (Georeference.cpp:66-72)
    latp = lat[pulse]
    w = np.sqrt(1 - _E2 * np.sin(latp) ** 2)
    nrad = _A / w
    mrad = _A * (1 - _E2) / (w ** 3)
    deg = 180.0 / np.pi
    out_x = (lon[pulse] + lx / (nrad * np.cos(latp))) * deg
    out_y = (latp + ly / mrad) * deg
    out_z = elev[pulse] + lz

    retnum = np.where(ridx == 3, nret[pulse], ridx + 1).astype("i2")
    return pd.DataFrame({
        "X": out_x, "Y": out_y, "Z": out_z,
        "GpsTime": rec["gps"].astype("f8")[pulse],
        "ReturnNumber": retnum,
        "NumberOfReturns": nret[pulse].astype("i2"),
        "EchoRange": rng, "Intensity": inten,
        "ScanAngleRank": ang[pulse] * deg})


def read_optech(spark: SparkSession, path: str,
                with_path: bool = False) -> DataFrame:
    """readers.optech analog (io/OptechReader.cpp). Parallel across
    files; each file georeferences independently from its own
    boresight header."""
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"readers.optech: no files match {path!r}")
    _parse_csd_header(bytes(first[0]["content"]))  # validate early
    cols = ", ".join(f"`{c}` {t}" for c, t in _COLS)
    schema = (cols + ", file_path string") if with_path else cols

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                h = _parse_csd_header(bytes(content))
                out = _decode_csd(bytes(content), h)
                if with_path:
                    out["file_path"] = fpath
                yield out

    return files.select("path", "content").mapInPandas(parse, schema)
