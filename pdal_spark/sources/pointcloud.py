"""readers.pcd / readers.ply analogs — the two point-cloud exchange
formats worth having outside LAS (io/PcdReader.cpp, io/PcdHeader.cpp
:180-280; io/PlyReader.cpp:100-230), plus directory writers.

Spark-first shape: `spark.read.format("binaryFile")` lists and ships
(path, content) pairs — one row per file, parallel ACROSS files (the
reference reads one file per process too; these formats have no
intra-file split points) — then a `mapInPandas` kernel decodes each
file with vectorized pandas/numpy (C csv parser for ascii,
`np.frombuffer` for binary), never per-row Python. The schema is
fixed by the FIRST file's header (driver-side peek of one header,
kilobytes); files disagreeing with it error loudly.

Writers emit one complete, valid .pcd/.ply file per partition into a
directory (the TileJob tiled-output convention) — single-file export
at 100 TB is an anti-goal.

Type mapping (SURVEY §1.2 convention): unsigned widens one step
(u1->short, u2->int, u4->long); u8 maps to long with a documented
wrap for values >= 2^63 (PDAL stores the same bits).
"""

from __future__ import annotations

import io
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_PCD_NP = {("F", 4): "f4", ("F", 8): "f8",
           ("I", 1): "i1", ("I", 2): "i2", ("I", 4): "i4",
           ("I", 8): "i8",
           ("U", 1): "u1", ("U", 2): "u2", ("U", 4): "u4",
           ("U", 8): "u8"}
_NP_SPARK = {"f4": "float", "f8": "double",
             "i1": "tinyint", "i2": "smallint", "i4": "int",
             "i8": "bigint",
             "u1": "smallint", "u2": "int", "u4": "bigint",
             "u8": "bigint"}
_NP_WIDEN = {"u1": "i2", "u2": "i4", "u4": "i8", "u8": "i8"}

_PLY_NP = {"char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
           "short": "i2", "int16": "i2", "ushort": "u2",
           "uint16": "u2", "int": "i4", "int32": "i4",
           "uint": "u4", "uint32": "u4", "float": "f4",
           "float32": "f4", "double": "f8", "float64": "f8"}


def _parse_pcd_header(data: bytes) -> dict:
    """PCD header grammar per io/PcdHeader.cpp:180-280."""
    fields, sizes, types, counts = [], [], [], []
    points, mode, off = None, None, 0
    view = data[:65536].split(b"\n")
    for line in view:
        off += len(line) + 1
        s = line.decode("ascii", "replace").strip()
        if not s or s.startswith("#"):
            continue
        key, _, rest = s.partition(" ")
        vals = rest.split()
        if key in ("FIELDS", "COLUMNS"):
            fields = vals
        elif key == "SIZE":
            sizes = [int(v) for v in vals]
        elif key == "TYPE":
            types = vals
        elif key == "COUNT":
            counts = [int(v) for v in vals]
        elif key == "POINTS":
            points = int(vals[0])
        elif key == "WIDTH" and points is None:
            points = int(vals[0])
        elif key == "HEIGHT" and points is not None and not counts:
            pass
        elif key == "DATA":
            mode = vals[0].lower()
            break
    if mode is None or not fields:
        raise ValueError("not a PCD file: missing DATA or FIELDS")
    if counts and any(c != 1 for c in counts):
        raise ValueError("readers.pcd: COUNT > 1 fields unsupported")
    if len(sizes) != len(fields) or len(types) != len(fields):
        raise ValueError("PCD SIZE/TYPE arity != FIELDS")
    np_t = [_PCD_NP[(t.upper(), z)] for t, z in zip(types, sizes)]
    return {"fields": fields, "np": np_t, "points": points,
            "mode": mode, "off": off}


def _parse_ply_header(data: bytes) -> dict:
    """PLY header per io/PlyReader.cpp:100-230 — vertex element only;
    the vertex element must come first (faces follow it in practice;
    trailing elements are skipped)."""
    if not data.startswith(b"ply"):
        raise ValueError("not a PLY file")
    end = data.find(b"end_header")
    if end < 0:
        raise ValueError("PLY: no end_header")
    off = data.find(b"\n", end) + 1
    fmt, n_vertex, fields, np_t = None, None, [], []
    in_vertex, vertex_first = False, None
    for raw in data[:end].decode("ascii", "replace").split("\n"):
        toks = raw.strip().split()
        if not toks:
            continue
        if toks[0] == "format":
            fmt = toks[1]
        elif toks[0] == "element":
            if toks[1] == "vertex":
                n_vertex = int(toks[2])
                in_vertex = True
                if vertex_first is None:
                    vertex_first = True
            else:
                in_vertex = False
                if vertex_first is None:
                    vertex_first = False
        elif toks[0] == "property" and in_vertex:
            if toks[1] == "list":
                raise ValueError(
                    "PLY: list property on vertex unsupported")
            fields.append(toks[2])
            np_t.append(_PLY_NP[toks[1]])
    if fmt not in ("ascii", "binary_little_endian"):
        raise ValueError(f"PLY format {fmt!r} unsupported"
                         " (ascii / binary_little_endian)")
    if n_vertex is None:
        raise ValueError("PLY: no vertex element")
    if fmt == "binary_little_endian" and not vertex_first:
        raise ValueError("PLY binary: vertex element must be first")
    return {"fields": fields, "np": np_t, "points": n_vertex,
            "mode": "ascii" if fmt == "ascii" else "binary", "off": off}


def _decode(data: bytes, hdr: dict) -> pd.DataFrame:
    names, np_t, n = hdr["fields"], hdr["np"], hdr["points"]
    body = data[hdr["off"]:]
    if hdr["mode"] == "ascii":
        pdf = pd.read_csv(
            io.BytesIO(body), sep=r"\s+", header=None,
            names=names, nrows=n, comment="#", engine="c",
            dtype={c: t for c, t in zip(names, np_t)},
        )
    elif hdr["mode"] == "binary":
        dt = np.dtype([(c, "<" + t) for c, t in zip(names, np_t)])
        arr = np.frombuffer(body, dtype=dt, count=n)
        pdf = pd.DataFrame({c: arr[c] for c in names})
    else:
        raise ValueError(
            f"readers.pcd: DATA {hdr['mode']!r} unsupported"
            " (ascii / binary)")
    if len(pdf) != n:
        raise ValueError(
            f"point count mismatch: header {n}, parsed {len(pdf)}")
    for c, t in zip(names, np_t):
        if t in _NP_WIDEN:
            pdf[c] = pdf[c].astype(_NP_WIDEN[t])
    return pdf


def _read_cloud(spark: SparkSession, path: str, parse_hdr,
                with_path: bool) -> DataFrame:
    files = spark.read.format("binaryFile").load(path)
    first = files.select("path", "content").limit(1).collect()
    if not first:
        raise ValueError(f"no files match {path!r}")
    hdr = parse_hdr(bytes(first[0]["content"]))
    cols = ", ".join(
        f"`{c}` {_NP_SPARK[t]}"
        for c, t in zip(hdr["fields"], hdr["np"]))
    schema = (cols + ", file_path string") if with_path else cols
    want = list(zip(hdr["fields"], hdr["np"]))

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                h = parse_hdr(bytes(content))
                if list(zip(h["fields"], h["np"])) != want:
                    raise ValueError(
                        f"{fpath}: schema differs from the first "
                        f"file ({h['fields']} vs "
                        f"{[c for c, _ in want]})")
                out = _decode(bytes(content), h)
                if with_path:
                    out["file_path"] = fpath
                yield out

    return files.select("path", "content").mapInPandas(parse, schema)


def read_pcd(spark: SparkSession, path: str,
             with_path: bool = False) -> DataFrame:
    """readers.pcd (io/PcdReader.cpp): DATA ascii + binary, COUNT=1
    fields. `path` may be a file, directory, or glob; parallel across
    files."""
    return _read_cloud(spark, path, _parse_pcd_header, with_path)


def read_ply(spark: SparkSession, path: str,
             with_path: bool = False) -> DataFrame:
    """readers.ply (io/PlyReader.cpp): ascii +
    binary_little_endian vertex element (list properties / faces are
    skipped, like reading only the point table)."""
    return _read_cloud(spark, path, _parse_ply_header, with_path)


_SPARK_PCD = {"float": ("F", 4, "f4"), "double": ("F", 8, "f8"),
              "tinyint": ("I", 1, "i1"), "smallint": ("I", 2, "i2"),
              "int": ("I", 4, "i4"), "bigint": ("I", 8, "i8")}
_SPARK_PLY = {"float": "float", "double": "double",
              "tinyint": "char", "smallint": "short", "int": "int",
              "bigint": "double"}  # PLY has no 64-bit int type


def write_pcd(df: DataFrame, out_dir: str) -> int:
    """writers.pcd analog (io/PcdWriter.cpp): one complete ascii .pcd
    per non-empty partition under `out_dir` (tiled-output
    convention). Returns the number of files written."""
    import os

    names = df.columns
    kinds = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t not in _SPARK_PCD:
            raise ValueError(f"writers.pcd: column {f.name} type {t} "
                             "unsupported")
        kinds.append(_SPARK_PCD[t])
    os.makedirs(out_dir, exist_ok=True)

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
        fp = os.path.join(out_dir, f"part-{pid:05d}.pcd")
        with open(fp, "w") as fh:
            fh.write("# .PCD v0.7 - Point Cloud Data file format\n")
            fh.write("VERSION 0.7\n")
            fh.write("FIELDS " + " ".join(names) + "\n")
            fh.write("SIZE " + " ".join(str(k[1]) for k in kinds)
                     + "\n")
            fh.write("TYPE " + " ".join(k[0] for k in kinds) + "\n")
            fh.write("COUNT " + " ".join("1" for _ in kinds) + "\n")
            fh.write(f"WIDTH {n}\nHEIGHT 1\n")
            fh.write("VIEWPOINT 0 0 0 1 0 0 0\n")
            fh.write(f"POINTS {n}\nDATA ascii\n")
            pdf.to_csv(fh, sep=" ", header=False, index=False)
        yield pd.DataFrame({"file": [fp], "rows": [n]})

    manifest = df.mapInPandas(dump, "file string, rows long")
    return int(manifest.count())


def write_ply(df: DataFrame, out_dir: str) -> int:
    """writers.ply analog (io/PlyWriter.cpp): one ascii .ply per
    non-empty partition under `out_dir`."""
    import os

    names = df.columns
    kinds = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t not in _SPARK_PLY:
            raise ValueError(f"writers.ply: column {f.name} type {t} "
                             "unsupported")
        kinds.append(_SPARK_PLY[t])
    os.makedirs(out_dir, exist_ok=True)

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
        fp = os.path.join(out_dir, f"part-{pid:05d}.ply")
        with open(fp, "w") as fh:
            fh.write("ply\nformat ascii 1.0\n")
            fh.write(f"element vertex {n}\n")
            for c, k in zip(names, kinds):
                fh.write(f"property {k} {c}\n")
            fh.write("end_header\n")
            pdf.to_csv(fh, sep=" ", header=False, index=False)
        yield pd.DataFrame({"file": [fp], "rows": [n]})

    manifest = df.mapInPandas(dump, "file string, rows long")
    return int(manifest.count())


# ---------------------------------------------------------------------------
# readers.sbet / readers.pts / readers.obj — the rest of the cheap
# text/fixed-record zoo (io/SbetReader.cpp + SbetCommon.hpp:46-59,
# io/PtsReader.cpp:60-105, io/ObjReader.cpp:60-140). Same shape:
# binaryFile scan, vectorized per-file decode.
# ---------------------------------------------------------------------------

SBET_DIMS = [
    "gps_time", "y", "x", "z", "x_velocity", "y_velocity",
    "z_velocity", "roll", "pitch", "azimuth", "wander_angle",
    "x_body_accel", "y_body_accel", "z_body_accel",
    "x_body_ang_rate", "y_body_ang_rate", "z_body_ang_rate",
]
_SBET_ANGULAR = {"x", "y", "roll", "pitch", "azimuth",
                 "wander_angle", "x_body_ang_rate",
                 "y_body_ang_rate", "z_body_ang_rate"}
_RAD2DEG = 57.29577951308232


def read_sbet(spark: SparkSession, path: str,
              angles_as_degrees: bool = True) -> DataFrame:
    """readers.sbet (io/SbetReader.cpp, SbetCommon.hpp:46-59): the
    Applanix trajectory format — fixed 17-double little-endian
    records (GpsTime, lat/lon RAD as y/x, z, velocities, attitude,
    body accel/rates). ``angles_as_degrees`` mirrors the reference
    default (True); pass False to keep radians — the form
    `transform.georeference` consumes directly."""
    files = spark.read.format("binaryFile").load(path)
    schema = ", ".join(f"{c} double" for c in SBET_DIMS)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                buf = bytes(content)
                if len(buf) % (17 * 8):
                    raise ValueError(
                        f"{fpath}: size {len(buf)} is not a whole "
                        "number of 17-double SBET records")
                arr = np.frombuffer(buf, dtype="<f8").reshape(-1, 17)
                out = pd.DataFrame(
                    {c: arr[:, i] for i, c in enumerate(SBET_DIMS)})
                if angles_as_degrees:
                    for c in _SBET_ANGULAR:
                        out[c] = out[c] * _RAD2DEG
                yield out

    return files.select("path", "content").mapInPandas(parse, schema)


def read_pts(spark: SparkSession, path: str,
             separator: str = " ") -> DataFrame:
    """readers.pts (io/PtsReader.cpp:60-105): first line = point
    count, then `X Y Z [Intensity [R G B]]` rows; the arity of the
    first data row fixes the schema."""
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"no files match {path!r}")
    head = bytes(first[0]["content"])[:4096].split(b"\n")
    arity = len(head[1].decode("ascii", "replace").strip()
                .split(separator)) if len(head) > 1 else 0
    names = {3: ["x", "y", "z"],
             4: ["x", "y", "z", "intensity"],
             7: ["x", "y", "z", "intensity", "red", "green",
                 "blue"]}.get(arity)
    if names is None:
        raise ValueError(
            f"readers.pts: invalid field count {arity} (3, 4 or 7)")
    types = (["double"] * 3 + ["int"] * (len(names) - 3))
    schema = ", ".join(f"{c} {t}" for c, t in zip(names, types))
    np_t = ["f8"] * 3 + ["i4"] * (len(names) - 3)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                buf = bytes(content)
                nl = buf.find(b"\n")
                n = int(buf[:nl].strip())
                out = pd.read_csv(
                    io.BytesIO(buf[nl + 1:]), sep=separator,
                    header=None, names=names, nrows=n, engine="c",
                    dtype={c: t for c, t in zip(names, np_t)})
                if len(out) != n:
                    raise ValueError(
                        f"{fpath}: header says {n} points, "
                        f"parsed {len(out)}")
                yield out

    return files.select("path", "content").mapInPandas(parse, schema)


def read_obj(spark: SparkSession, path: str) -> DataFrame:
    """readers.obj (io/ObjReader.cpp): the vertex table of a
    Wavefront OBJ — `v x y z [w]` lines (texture/normal/face records
    are mesh structure, skipped like PLY faces)."""
    files = spark.read.format("binaryFile").load(path)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for content in pdf["content"]:
                lines = bytes(content).decode(
                    "utf-8", "replace").split("\n")
                rows = [ln.split()[1:4] for ln in lines
                        if ln.startswith("v ")]
                arr = (np.array(rows, dtype="f8")
                       if rows else np.empty((0, 3)))
                yield pd.DataFrame(
                    {"x": arr[:, 0], "y": arr[:, 1], "z": arr[:, 2]})

    return files.select("content").mapInPandas(
        parse, "x double, y double, z double")


SMRMSG_DIMS = [
    "gps_time", "north_position_rms", "east_position_rms",
    "down_position_rms", "north_velocity_rms", "east_velocity_rms",
    "down_velocity_rms", "roll_rms", "pitch_rms", "heading_rms",
]


def read_smrmsg(spark: SparkSession, path: str) -> DataFrame:
    """readers.smrmsg (io/SbetSmrmsgReader.cpp, SbetCommon.hpp:61-67):
    the SBET accuracy companion — fixed 10-double little-endian RMS
    records."""
    files = spark.read.format("binaryFile").load(path)
    schema = ", ".join(f"{c} double" for c in SMRMSG_DIMS)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                buf = bytes(content)
                if len(buf) % (10 * 8):
                    raise ValueError(
                        f"{fpath}: size {len(buf)} is not a whole "
                        "number of 10-double smrmsg records")
                arr = np.frombuffer(buf, dtype="<f8").reshape(-1, 10)
                yield pd.DataFrame(
                    {c: arr[:, i]
                     for i, c in enumerate(SMRMSG_DIMS)})

    return files.select("path", "content").mapInPandas(parse, schema)


def write_gltf(tris: DataFrame, points: DataFrame, out_dir: str,
               x: str = "lon", y: str = "lat", z: str = "z",
               id_col: str = "pid") -> int:
    """writers.gltf analog (io/GltfWriter.cpp:240-310): export a
    triangle mesh (delaunay_tin / greedy_projection output: a/b/c
    vertex-id triples) as glTF 2.0 BINARY (.glb) — one complete,
    valid file per partition under `out_dir` (the tiled convention;
    GLB caps one buffer at 4 GiB anyway, so single-file export does
    not scale past that by spec). Indices are uint32 (componentType
    5125), positions float32 VEC3 with min/max, mode 4 triangles —
    the same accessor layout the reference emits.

    Plan: three hash joins stamp each triangle with its corner
    coordinates, then one mapInPandas packs each partition's local
    vertex table + index buffer into a GLB. Returns files written.
    """
    import json as _json
    import os
    import struct as _struct

    from pyspark.sql import functions as F

    def side(n):
        return points.select(
            F.col(id_col).alias(n),
            F.col(x).cast("double").alias(f"{n}x"),
            F.col(y).cast("double").alias(f"{n}y"),
            F.col(z).cast("double").alias(f"{n}z"))

    t = (tris.join(side("a"), "a").join(side("b"), "b")
         .join(side("c"), "c"))
    os.makedirs(out_dir, exist_ok=True)

    def dump(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = [pdf for pdf in it if len(pdf)]
        if not chunks:
            yield pd.DataFrame({"file": pd.Series([], dtype=str),
                                "tris": pd.Series([], dtype="int64")})
            return
        pdf = pd.concat(chunks, ignore_index=True)
        corners = pd.concat([
            pdf[[k, f"{k}x", f"{k}y", f"{k}z"]].set_axis(
                ["vid", "vx", "vy", "vz"], axis=1)
            for k in ("a", "b", "c")], ignore_index=True)
        verts = corners.drop_duplicates("vid").sort_values(
            "vid").reset_index(drop=True)
        local = {v: i for i, v in enumerate(verts["vid"])}
        idx = np.array(
            [[local[v] for v in pdf[k]] for k in ("a", "b", "c")],
            dtype="<u4").T.ravel()
        pos = verts[["vx", "vy", "vz"]].to_numpy(dtype="<f4")
        ib, pb = idx.tobytes(), pos.tobytes()
        ib += b"\0" * (-len(ib) % 4)
        gltf = {
            "asset": {"version": "2.0"},
            "buffers": [{"byteLength": len(ib) + len(pb)}],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": len(ib),
                 "target": 34963},
                {"buffer": 0, "byteOffset": len(ib),
                 "byteLength": len(pb), "target": 34962},
            ],
            "accessors": [
                {"bufferView": 0, "componentType": 5125,
                 "count": int(idx.size), "type": "SCALAR"},
                {"bufferView": 1, "componentType": 5126,
                 "count": int(len(pos)), "type": "VEC3",
                 "min": [float(v) for v in pos.min(axis=0)],
                 "max": [float(v) for v in pos.max(axis=0)]},
            ],
            "meshes": [{"primitives": [
                {"attributes": {"POSITION": 1}, "indices": 0,
                 "mode": 4}]}],
            "nodes": [{"mesh": 0}],
            "scenes": [{"nodes": [0]}],
            "scene": 0,
        }
        js = _json.dumps(gltf, separators=(",", ":")).encode()
        js += b" " * (-len(js) % 4)
        bin_chunk = ib + pb
        total = 12 + 8 + len(js) + 8 + len(bin_chunk)
        fp = os.path.join(out_dir, f"part-{pid:05d}.glb")
        with open(fp, "wb") as fh:
            fh.write(_struct.pack("<III", 0x46546C67, 2, total))
            fh.write(_struct.pack("<II", len(js), 0x4E4F534A))
            fh.write(js)
            fh.write(_struct.pack("<II", len(bin_chunk), 0x004E4942))
            fh.write(bin_chunk)
        yield pd.DataFrame({"file": [fp], "tris": [len(pdf)]})

    manifest = t.mapInPandas(dump, "file string, tris long")
    return int(manifest.where("tris > 0").count())


_ILVIS2_COLS = [
    ("lvis_lfid", "bigint"), ("shotnumber", "bigint"),
    ("gps_time", "double"),
    ("longitude_centroid", "double"), ("latitude_centroid", "double"),
    ("elevation_centroid", "double"),
    ("longitude_low", "double"), ("latitude_low", "double"),
    ("elevation_low", "double"),
    ("longitude_high", "double"), ("latitude_high", "double"),
    ("elevation_high", "double"),
]


def read_ilvis2(spark: SparkSession, path: str,
                mapping: str = "ALL") -> DataFrame:
    """readers.ilvis2 (io/Ilvis2Reader.cpp:144-266): NASA LVIS
    12-field whitespace text. mapping=LOW/HIGH emits one point per
    record with x/y/z from that return; ALL (reference default)
    emits LOW plus a second HIGH point when the two elevations
    differ. Longitudes normalize to [-180, 180). Pure Catalyst — the
    text scan is splittable, so this one parallelizes WITHIN files
    too."""
    from pyspark.sql import functions as F

    m = mapping.upper()
    if m not in ("LOW", "HIGH", "ALL"):
        raise ValueError(f"ilvis2 mapping must be LOW/HIGH/ALL, "
                         f"got {mapping!r}")
    toks = F.split(F.trim(F.col("value")), r"\s+")
    base = (
        spark.read.text(path)
        .where(F.size(toks) == 12)
        .where(F.element_at(toks, 1).cast("double").isNotNull())
        .select(*[
            F.element_at(toks, i + 1).cast(t).alias(c)
            for i, (c, t) in enumerate(_ILVIS2_COLS)])
    )
    for c in ("longitude_centroid", "longitude_low",
              "longitude_high"):
        v = F.col(c)
        base = base.withColumn(
            c, v - F.floor((v + 180.0) / 360.0) * 360.0)

    def with_xyz(df, tag):
        return df.select(
            "*",
            F.col(f"longitude_{tag}").alias("x"),
            F.col(f"latitude_{tag}").alias("y"),
            F.col(f"elevation_{tag}").alias("z"))

    if m == "LOW":
        return with_xyz(base, "low")
    if m == "HIGH":
        return with_xyz(base, "high")
    low = with_xyz(base, "low")
    high = with_xyz(
        base.where(F.col("elevation_low") != F.col("elevation_high")),
        "high")
    return low.unionByName(high)


def write_sbet(df: DataFrame, out_dir: str,
               angles_as_degrees: bool = True) -> int:
    """writers.sbet analog (io/SbetWriter.cpp): pack the 17 SBET
    dimensions back into fixed little-endian double records — one
    .sbet per non-empty partition (sort within partitions by
    gps_time upstream if record order matters). ``angles_as_degrees``
    says whether the INPUT carries degrees (the reader's default
    output), converting back to the radians the format stores."""
    import os

    missing = [c for c in SBET_DIMS if c not in df.columns]
    if missing:
        raise ValueError(f"writers.sbet: missing columns {missing}")
    os.makedirs(out_dir, exist_ok=True)

    def dump(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = [pdf for pdf in it if len(pdf)]
        if not chunks:
            yield pd.DataFrame({"file": pd.Series([], dtype=str),
                                "rows": pd.Series([], dtype="int64")})
            return
        pdf = pd.concat(chunks, ignore_index=True)
        arr = np.empty((len(pdf), 17), dtype="<f8")
        for i, c in enumerate(SBET_DIMS):
            v = pdf[c].to_numpy(dtype="f8")
            if angles_as_degrees and c in _SBET_ANGULAR:
                v = v / _RAD2DEG
            arr[:, i] = v
        fp = os.path.join(out_dir, f"part-{pid:05d}.sbet")
        with open(fp, "wb") as fh:
            fh.write(arr.tobytes())
        yield pd.DataFrame({"file": [fp], "rows": [len(pdf)]})

    return int(df.select(SBET_DIMS).mapInPandas(
        dump, "file string, rows long").where("rows > 0").count())
