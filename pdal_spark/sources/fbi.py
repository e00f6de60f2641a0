"""readers.fbi / writers.fbi analogs — TerraScan FastBinary
(io/FbiReader.cpp, io/FbiWriter.cpp, io/FbiHeader.hpp:65-146).

FastBinary is column-oriented on disk: a packed 1808-byte header
("by construction", FbiWriter.cpp:66) holds a Bits<dim> width and a
Pos<dim> file offset per dimension stream, and each stream is a
contiguous per-point array — the best possible case for numpy: one
np.frombuffer per dimension, zero per-row work. XYZ is an
interleaved (x,y,z) uint32 triple stream scaled by
`raw / UnitsXyz + Org` (FbiReader.cpp:288-300).

Dimension mapping mirrors FbiReader::addDimensions/read
(:178-540): Time->OffsetTime (truncated to uint32 like the
reference's `uint32_t(timeGPS)` cast), Distance->NNDistance,
Group->ClusterID, Line->PointSourceId, Scanner->UserData,
Echo->ReturnNumber, Angle->ScanAngleRank (int8), EchoLen->
PulseWidth, EchoNorm/EchoPos/Amplitude/Deviation/Reflectance/
Reliability kept under their own names, Class->Classification.
Color streams support all four widths (24/32/48/64 bits =
RGB/RGBI x 1/2 bytes, FbiReader.cpp:209-218). Normal vectors are
the 2+15+15-bit (Dim, HorzAng, VertAng) packing decoded through
the reference's spherical lookup (NrmVecGetVector:271-283):
nx = cos(V*pi/32767 - pi/2)*cos(H*2pi/32767), etc.

Image-index streams (BitsImage/PosImgNbr) and VLRs are skipped —
they reference external image files the engine doesn't manage.

Spark-first shape as readers.las/bpf: binaryFile one row per file,
mapInPandas decode, schema pinned by the first file's stream set.
The writer emits one valid FastBinary file per non-empty partition
(tiled-output convention) with per-file true min/max and
min-origin auto-offset.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_HDR = 1808
# (name, spark type, bytes per point, column name) in header order
_BITS_FIELDS = ["X", "Y", "Z", "Time", "Distance", "Group",
                "Normal", "Color", "Intensity", "Line", "EchoLen",
                "Amplitude", "Scanner", "Echo", "Angle", "EchoNorm",
                "Class", "EchoPos", "Image", "Reflect", "Deviation",
                "Reliab"]
_POS_FIELDS = ["Vlr", "Xyz", "Time", "Distance", "Group", "Normal",
               "Color", "Intensity", "Line", "EchoLen", "Amplitude",
               "Scanner", "Echo", "Angle", "EchoNorm", "Class",
               "Record", "EchoPos", "Image", "Reflect", "Deviation",
               "Reliab", "ImgNbr"]
# stream -> (np dtype, output column, spark type)
_SIMPLE = {
    "Time": ("<u8", "OffsetTime", "bigint"),
    "Distance": ("<u4", "NNDistance", "bigint"),
    "Group": ("<u4", "ClusterID", "bigint"),
    "Intensity": ("<u2", "Intensity", "int"),
    "Line": ("<u2", "PointSourceId", "smallint"),
    "EchoLen": ("<u2", "PulseWidth", "smallint"),
    "Amplitude": ("<u2", "Amplitude", "int"),
    "Scanner": ("u1", "UserData", "smallint"),
    "Echo": ("u1", "ReturnNumber", "smallint"),
    "Angle": ("u1", "ScanAngleRank", "smallint"),
    "EchoNorm": ("u1", "EchoNorm", "smallint"),
    "Class": ("u1", "Classification", "smallint"),
    "EchoPos": ("<u2", "EchoPos", "int"),
    "Reflect": ("<u2", "Reflectance", "int"),
    "Deviation": ("<u2", "Deviation", "int"),
    "Reliab": ("u1", "Reliability", "smallint"),
}
_PI = 3.1415926535897932384626433
_HML = 2.0 * _PI / 32767.0
_VML = _PI / 32767.0


def _parse_fbi_header(data: bytes) -> dict:
    if data[:7] != b"FASTBIN":
        raise ValueError("readers.fbi: bad signature (not FASTBIN)")
    (version, hdr_size) = struct.unpack_from("<2I", data, 8)
    (fast_cnt,) = struct.unpack_from("<Q", data, 40)
    (units_xyz, units_dist) = struct.unpack_from("<2I", data, 56)
    org = struct.unpack_from("<3d", data, 64)
    bits = dict(zip(_BITS_FIELDS,
                    struct.unpack_from("<22I", data, 264)))
    pos = dict(zip(_POS_FIELDS,
                   struct.unpack_from("<23Q", data, 360)))
    if bits["X"] != 32 or bits["Y"] != 32 or bits["Z"] != 32:
        raise ValueError("readers.fbi: only 32-bit XYZ supported "
                         f"(got {bits['X']}/{bits['Y']}/{bits['Z']})")
    return {"count": fast_cnt, "units": units_xyz, "org": org,
            "bits": bits, "pos": pos, "hdr_size": hdr_size}


def _fbi_cols(h: dict) -> list[tuple[str, str]]:
    d = [("X", "double"), ("Y", "double"), ("Z", "double")]
    b = h["bits"]
    if b["Normal"]:
        d += [("Dimension", "smallint"), ("NormalX", "double"),
              ("NormalY", "double"), ("NormalZ", "double")]
    if b["Color"]:
        d += [("Red", "int"), ("Green", "int"), ("Blue", "int")]
        if b["Color"] in (32, 64):
            d.append(("Infrared", "int"))
    for stream, (_, col, typ) in _SIMPLE.items():
        if b[stream]:
            d.append((col, typ))
    return d


def _decode_fbi(data: bytes, h: dict) -> pd.DataFrame:
    n = h["count"]
    mul = 1.0 / h["units"]
    xyz = np.frombuffer(data, "<u4", 3 * n,
                        h["pos"]["Xyz"]).reshape(n, 3)
    out = {"X": xyz[:, 0] * mul + h["org"][0],
           "Y": xyz[:, 1] * mul + h["org"][1],
           "Z": xyz[:, 2] * mul + h["org"][2]}
    b, p = h["bits"], h["pos"]
    if b["Normal"]:
        nv = np.frombuffer(data, "<u4", n, p["Normal"])
        dim = (nv & 3).astype("i2")
        hang = ((nv >> 2) & 0x7FFF).astype("f8")
        vang = ((nv >> 17) & 0x7FFF).astype("f8")
        vr = vang * _VML - _PI / 2.0
        xml = np.cos(vr)
        out["Dimension"] = dim
        out["NormalX"] = xml * np.cos(hang * _HML)
        out["NormalY"] = xml * np.sin(hang * _HML)
        out["NormalZ"] = np.sin(vr)
    if b["Color"]:
        per = "u1" if b["Color"] in (24, 32) else "<u2"
        ch = 4 if b["Color"] in (32, 64) else 3
        c = np.frombuffer(data, per, ch * n,
                          p["Color"]).reshape(n, ch)
        out["Red"] = c[:, 0].astype("i4")
        out["Green"] = c[:, 1].astype("i4")
        out["Blue"] = c[:, 2].astype("i4")
        if ch == 4:
            out["Infrared"] = c[:, 3].astype("i4")
    for stream, (dt, col, typ) in _SIMPLE.items():
        if not b[stream]:
            continue
        v = np.frombuffer(data, dt, n, p[stream])
        if stream == "Time":
            # reference truncates: uint32_t(timeGPS)
            out[col] = (v & 0xFFFFFFFF).astype("i8")
        elif stream == "Angle":
            out[col] = v.view("i1").astype("i2")  # int8_t cast
        elif typ == "bigint":
            out[col] = v.astype("i8")
        elif typ == "int":
            out[col] = v.astype("i4")
        else:
            out[col] = v.astype("i2")
    cols = [c for c, _ in _fbi_cols(h)]
    return pd.DataFrame({c: out[c] for c in cols})


def read_fbi(spark: SparkSession, path: str,
             with_path: bool = False) -> DataFrame:
    """readers.fbi analog (io/FbiReader.cpp). Schema pinned by the
    first file's stream set; parallel across files."""
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"readers.fbi: no files match {path!r}")
    h0 = _parse_fbi_header(bytes(first[0]["content"]))
    want = _fbi_cols(h0)
    cols = ", ".join(f"`{c}` {t}" for c, t in want)
    schema = (cols + ", file_path string") if with_path else cols

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                h = _parse_fbi_header(bytes(content))
                if _fbi_cols(h) != want:
                    raise ValueError(
                        f"{fpath}: stream set differs from the "
                        "first file")
                out = _decode_fbi(bytes(content), h)
                if with_path:
                    out["file_path"] = fpath
                yield out

    return files.select("path", "content").mapInPandas(parse, schema)


def write_fbi(df: DataFrame, out_dir: str,
              units_xyz: int = 100) -> int:
    """writers.fbi analog (io/FbiWriter.cpp): one FastBinary file
    per non-empty partition; streams emitted for every recognized
    column present. Origin auto-set to the partition minimum;
    UnitsXyz defaults to the reference writer's 100 steps/unit
    (FbiWriter.cpp:90)."""
    import os

    cols = set(df.columns)
    for c in ("X", "Y", "Z"):
        if c not in cols:
            raise ValueError(f"writers.fbi: missing column {c}")
    os.makedirs(out_dir, exist_ok=True)
    has_normal = {"NormalX", "NormalY", "NormalZ"} <= cols
    has_color = {"Red", "Green", "Blue"} <= cols
    has_ir = has_color and "Infrared" in cols
    col2stream = {v[1]: (k, v[0]) for k, v in _SIMPLE.items()}

    def dump(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = [pdf for pdf in it if len(pdf)]
        if not chunks:
            yield pd.DataFrame({"file": pd.Series([], dtype=str),
                                "rows": pd.Series([], dtype="int64")})
            return
        pdf = pd.concat(chunks, ignore_index=True)
        n = len(pdf)
        xyz = pdf[["X", "Y", "Z"]].to_numpy("f8")
        org = xyz.min(axis=0)
        quant = np.round((xyz - org) * units_xyz).astype("<u4")

        bits = {k: 0 for k in _BITS_FIELDS}
        pos = {k: 0 for k in _POS_FIELDS}
        bits["X"] = bits["Y"] = bits["Z"] = 32
        streams = [("Xyz", quant.tobytes())]
        if has_normal:
            nx = pdf["NormalX"].to_numpy("f8")
            ny = pdf["NormalY"].to_numpy("f8")
            nz = pdf["NormalZ"].to_numpy("f8")
            v = np.round((np.arcsin(np.clip(nz, -1, 1)) + _PI / 2)
                         / _VML).astype("u4") & 0x7FFF
            hh = np.round(np.mod(np.arctan2(ny, nx), 2 * _PI)
                          / _HML).astype("u4") & 0x7FFF
            dim = (pdf["Dimension"].to_numpy("u4") & 3
                   if "Dimension" in pdf.columns
                   else np.zeros(n, "u4"))
            packed = (dim | (hh << 2) | (v << 17)).astype("<u4")
            bits["Normal"] = 32
            streams.append(("Normal", packed.tobytes()))
        if has_color:
            ch = 4 if has_ir else 3
            c = np.empty((n, ch), dtype="<u2")
            c[:, 0] = pdf["Red"].to_numpy("u2")
            c[:, 1] = pdf["Green"].to_numpy("u2")
            c[:, 2] = pdf["Blue"].to_numpy("u2")
            if has_ir:
                c[:, 3] = pdf["Infrared"].to_numpy("u2")
            bits["Color"] = 64 if has_ir else 48
            streams.append(("Color", c.tobytes()))
        for col in pdf.columns:
            if col in col2stream:
                stream, dt = col2stream[col]
                bits[stream] = np.dtype(dt).itemsize * 8
                streams.append(
                    (stream, pdf[col].to_numpy()
                     .astype(dt).tobytes()))

        off = _HDR
        for name, payload in streams:
            pos[name] = off
            off += len(payload)

        hdr = bytearray(_HDR)
        struct.pack_into("<8s", hdr, 0, b"FASTBIN")
        struct.pack_into("<2I", hdr, 8, 1, _HDR)
        struct.pack_into("<Q", hdr, 40, n)
        struct.pack_into("<2I", hdr, 56, units_xyz, units_xyz)
        struct.pack_into("<9d", hdr, 64, *org,
                         xyz[:, 0].min(), xyz[:, 0].max(),
                         xyz[:, 1].min(), xyz[:, 1].max(),
                         xyz[:, 2].min(), xyz[:, 2].max())
        struct.pack_into("<32s", hdr, 168, b"pdal_spark")
        struct.pack_into("<22I", hdr, 264,
                         *(bits[k] for k in _BITS_FIELDS))
        struct.pack_into("<23Q", hdr, 360,
                         *(pos[k] for k in _POS_FIELDS))
        fp = os.path.join(out_dir, f"part-{pid:05d}.fbi")
        with open(fp, "wb") as fh:
            fh.write(bytes(hdr))
            for _, payload in streams:
                fh.write(payload)
        yield pd.DataFrame({"file": [fp], "rows": [n]})

    return int(df.mapInPandas(
        dump, "file string, rows long").where("rows > 0").count())
