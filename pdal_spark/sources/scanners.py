"""readers.qfit / readers.terrasolid / readers.ptx analogs — the
remaining pure-binary/ascii scanner exchange formats in the
reference's io/ (QfitReader.cpp, TerrasolidReader.cpp,
PtxReader.cpp).

Same Spark-first shape as readers.las/bpf: `binaryFile` ships one
(path, content) row per file, parallel across files; a mapInPandas
kernel decodes each file with np.frombuffer / pandas C csv —
vectorized, never per-row Python. Schema is pinned by the FIRST
file; mismatching files error loudly.

Format facts mirrored:
- QFIT (NASA ATM; QfitReader.cpp:296-310): fixed records of 10/12/14
  32-bit words; first word of the file = record byte length, and its
  plausibility (< 100 when read LE) decides endianness
  (:306-330 — pre-fall-2010 campaigns are big-endian); the data
  offset is the second word of the second record (:337-340). Values
  scale as in :326-383: lat/lon microdegrees -> degrees, Z
  millimetres -> scale_z, angles millidegrees -> degrees, PDOP /10;
  the trailing GPS-time word is discarded like the reference.
- TerraSolid .bin (TerrasolidReader.cpp:60-175): 56-byte LE header
  (HdrSize, HdrVersion = format 20010712|20020715, RecogVal 970401,
  RecogStr, PntCnt, Units, OrgX/Y/Z doubles, Time, Color flags);
  XYZ decode (v - Org)/Units; echo code 0 -> return 1 of 1, 1 ->
  first of many; OffsetTime = (t - t_first)/5 ms (:152-162); RGBA
  bytes when Color.
- PTX (PtxReader.cpp:61-130, 310-360): per-cloud 10-line header
  (cols, rows, 4 skipped scanner lines, 4 matrix rows); points are
  "X Y Z I [R G B]" ascii rows, intensity 0-1 scaled to 0-4096
  (:333); missing points are exact "0 0 0" (discarded when
  `discard_missing`); the 4x4 transform applies as row-vector *
  matrix (PtxHeader::applyTransform).
"""

from __future__ import annotations

import io
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_QFIT_BASE = ["OffsetTime", "Y", "X", "Z", "StartPulse",
              "ReflectedPulse", "Azimuth", "Pitch", "Roll"]
_QFIT_12 = _QFIT_BASE + ["Pdop", "PulseWidth"]
_QFIT_14 = _QFIT_BASE + ["PassiveSignal", "PassiveY", "PassiveX",
                         "PassiveZ"]


def _qfit_layout(data: bytes) -> dict:
    (w_le,) = struct.unpack_from("<i", data, 0)
    little = 0 < w_le < 100
    endo = "<" if little else ">"
    (size,) = struct.unpack_from(endo + "i", data, 0)
    if size % 4 != 0 or size // 4 not in (10, 12, 14):
        raise ValueError(f"readers.qfit: record size {size} is not "
                         "10/12/14 words")
    (off,) = struct.unpack_from(endo + "i", data, size + 4)
    names = {10: _QFIT_BASE, 12: _QFIT_12, 14: _QFIT_14}[size // 4]
    return {"size": size, "off": off, "endo": endo, "names": names}


def _decode_qfit(data: bytes, lay: dict, flip: bool,
                 scale_z: float) -> pd.DataFrame:
    words = lay["size"] // 4
    n = (len(data) - lay["off"]) // lay["size"]
    arr = (np.frombuffer(data, lay["endo"] + "i4", n * words,
                         lay["off"]).reshape(n, words))
    names = lay["names"]
    out = {}
    micro = 1.0 / 1000000.0
    for i, c in enumerate(names):
        v = arr[:, i]
        if c in ("Y", "PassiveY"):
            out[c] = v * micro
        elif c in ("X", "PassiveX"):
            x = v * micro
            out[c] = np.where(x > 180, x - 360, x) if flip else x
        elif c in ("Z", "PassiveZ"):
            out[c] = v * scale_z
        elif c in ("Azimuth", "Pitch", "Roll"):
            out[c] = v / 1000.0
        elif c == "Pdop":
            out[c] = v / 10.0
        else:
            out[c] = v.astype("i4")
    # last word = GPS day time, discarded (QfitReader.cpp:385)
    return pd.DataFrame(out)


def read_qfit(spark: SparkSession, path: str,
              flip_coordinates: bool = False,
              scale_z: float = 0.001,
              with_path: bool = False) -> DataFrame:
    """readers.qfit analog (io/QfitReader.cpp). Handles both
    endiannesses per file; schema pinned by the first file's word
    count."""
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"readers.qfit: no files match {path!r}")
    names = _qfit_layout(bytes(first[0]["content"]))["names"]
    types = {c: ("int" if c in ("OffsetTime", "StartPulse",
                                "ReflectedPulse", "PulseWidth",
                                "PassiveSignal") else "double")
             for c in names}
    cols = ", ".join(f"`{c}` {types[c]}" for c in names)
    schema = (cols + ", file_path string") if with_path else cols

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                lay = _qfit_layout(bytes(content))
                if lay["names"] != names:
                    raise ValueError(
                        f"{fpath}: word count differs from the "
                        "first file")
                out = _decode_qfit(bytes(content), lay,
                                   flip_coordinates, scale_z)
                if with_path:
                    out["file_path"] = fpath
                yield out

    return files.select("path", "content").mapInPandas(parse, schema)


def _terra_header(data: bytes) -> dict:
    (hdr_size, version, recog) = struct.unpack_from("<3i", data, 0)
    if recog != 970401:
        raise ValueError("readers.terrasolid: header identifier is "
                         "not 970401 — not a TerraSolid .bin file")
    (cnt, units) = struct.unpack_from("<2i", data, 16)
    org = struct.unpack_from("<3d", data, 24)
    (time_f, color_f) = struct.unpack_from("<2i", data, 48)
    if version not in (20010712, 20020715):
        raise ValueError(
            f"readers.terrasolid: version {version} is neither "
            "format 1 (20010712) nor 2 (20020715)")
    return {"fmt": 1 if version == 20010712 else 2, "count": cnt,
            "units": units, "org": org, "time": bool(time_f),
            "color": bool(color_f)}


def _terra_dtype(h: dict) -> np.dtype:
    if h["fmt"] == 1:
        fields = [("cls", "u1"), ("line", "u1"), ("echo", "u1"),
                  ("x", "u1"), ("y", "u1"), ("z", "u1")]
    else:
        fields = [("x", "<i4"), ("y", "<i4"), ("z", "<i4"),
                  ("cls", "u1"), ("echo", "u1"), ("flag", "u1"),
                  ("mark", "u1"), ("line", "<u2"),
                  ("intensity", "<u2")]
    if h["time"]:
        fields.append(("t", "<u4"))
    if h["color"]:
        fields += [("red", "u1"), ("green", "u1"), ("blue", "u1"),
                   ("alpha", "u1")]
    return np.dtype(fields)


def _terra_cols(h: dict) -> list[tuple[str, str]]:
    d = [("X", "double"), ("Y", "double"), ("Z", "double"),
         ("Classification", "smallint"),
         ("PointSourceId", "int"),
         ("ReturnNumber", "smallint"),
         ("NumberOfReturns", "smallint")]
    if h["fmt"] == 2:
        d += [("Flag", "smallint"), ("Mark", "smallint"),
              ("Intensity", "int")]
    if h["time"]:
        d.append(("OffsetTime", "bigint"))
    if h["color"]:
        d += [("Red", "smallint"), ("Green", "smallint"),
              ("Blue", "smallint"), ("Alpha", "smallint")]
    return d


def _decode_terra(data: bytes, h: dict) -> pd.DataFrame:
    arr = np.frombuffer(data, _terra_dtype(h), h["count"], 56)
    u = float(h["units"]) if h["units"] else 1.0
    ox, oy, oz = h["org"]
    echo = arr["echo"]
    out = {"X": (arr["x"] - ox) / u,
           "Y": (arr["y"] - oy) / u,
           "Z": (arr["z"] - oz) / u,
           "Classification": arr["cls"].astype("i2"),
           "PointSourceId": arr["line"].astype("i4"),
           "ReturnNumber": (echo <= 1).astype("i2"),
           "NumberOfReturns": (echo == 0).astype("i2")}
    if h["fmt"] == 2:
        out["Flag"] = arr["flag"].astype("i2")
        out["Mark"] = arr["mark"].astype("i2")
        out["Intensity"] = arr["intensity"].astype("i4")
    if h["time"]:
        t = arr["t"].astype("i8")
        base = t[0] if len(t) else 0
        out["OffsetTime"] = (t - base) // 5  # 1/5000 s -> ms
    if h["color"]:
        for c in ("red", "green", "blue", "alpha"):
            out[c.capitalize()] = arr[c].astype("i2")
    cols = [c for c, _ in _terra_cols(h)]
    return pd.DataFrame({c: out[c] for c in cols})


def read_terrasolid(spark: SparkSession, path: str,
                    with_path: bool = False) -> DataFrame:
    """readers.terrasolid analog (io/TerrasolidReader.cpp):
    format 1 + 2, optional time/color blocks."""
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise ValueError(
            f"readers.terrasolid: no files match {path!r}")
    h0 = _terra_header(bytes(first[0]["content"]))
    shape = (h0["fmt"], h0["time"], h0["color"])
    cols = ", ".join(f"`{c}` {t}" for c, t in _terra_cols(h0))
    schema = (cols + ", file_path string") if with_path else cols

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                h = _terra_header(bytes(content))
                if (h["fmt"], h["time"], h["color"]) != shape:
                    raise ValueError(
                        f"{fpath}: format/flags differ from the "
                        "first file")
                out = _decode_terra(bytes(content), h)
                if with_path:
                    out["file_path"] = fpath
                yield out

    return files.select("path", "content").mapInPandas(parse, schema)


def _decode_ptx(data: bytes, want_arity: int,
                discard_missing: bool) -> pd.DataFrame:
    text = data.decode("ascii", "replace")
    lines = text.splitlines()
    frames = []
    pos = 0
    cloud = 0
    while pos < len(lines):
        if not lines[pos].strip():
            pos += 1
            continue
        cols_n = int(lines[pos].strip())
        rows_n = int(lines[pos + 1].strip())
        mat = np.array(
            [[float(v) for v in lines[pos + 6 + r].split()]
             for r in range(4)])
        pos += 10
        n = cols_n * rows_n
        chunk = "\n".join(lines[pos:pos + n])
        pos += n
        pdf = pd.read_csv(io.StringIO(chunk), sep=r"\s+",
                          header=None, engine="c")
        if pdf.shape[1] != want_arity:
            raise ValueError(
                f"ptx cloud has {pdf.shape[1]} fields, expected "
                f"{want_arity}")
        pdf.columns = (["X", "Y", "Z", "Intensity"]
                       + (["Red", "Green", "Blue"]
                          if want_arity == 7 else []))
        if discard_missing:
            keep = ~((pdf["X"] == 0.0) & (pdf["Y"] == 0.0)
                     & (pdf["Z"] == 0.0))
            pdf = pdf[keep]
        xyz = pdf[["X", "Y", "Z"]].to_numpy("f8")
        # row-vector * matrix, PtxHeader::applyTransform
        t = xyz @ mat[:3, :3] + mat[3, :3]
        pdf = pdf.assign(X=t[:, 0], Y=t[:, 1], Z=t[:, 2],
                         Intensity=pdf["Intensity"] * 4096.0,
                         cloud=cloud)
        if want_arity == 7:
            for c in ("Red", "Green", "Blue"):
                pdf[c] = pdf[c].astype("i4")
        frames.append(pdf)
        cloud += 1
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def read_ptx(spark: SparkSession, path: str,
             discard_missing: bool = True,
             with_path: bool = False) -> DataFrame:
    """readers.ptx analog (io/PtxReader.cpp): multi-cloud ascii
    scans; adds a `cloud` index column (one per in-file header) so
    per-scan grouping survives the merge."""
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"readers.ptx: no files match {path!r}")
    txt = bytes(first[0]["content"]).decode("ascii", "replace")
    lines = [ln for ln in txt.splitlines() if ln.strip()]
    arity = len(lines[10].split()) if len(lines) > 10 else 4
    if arity not in (4, 7):
        raise ValueError(f"readers.ptx: {arity} point fields "
                         "(expected 4 or 7)")
    cols = ("X double, Y double, Z double, Intensity double"
            + (", Red int, Green int, Blue int" if arity == 7
               else "") + ", cloud int")
    schema = (cols + ", file_path string") if with_path else cols

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                out = _decode_ptx(bytes(content), arity,
                                  discard_missing)
                if with_path:
                    out["file_path"] = fpath
                yield out

    return files.select("path", "content").mapInPandas(parse, schema)
