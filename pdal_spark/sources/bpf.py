"""readers.bpf / writers.bpf analogs — the US Army GRiD Binary Point
Format v3 (io/BpfReader.cpp, io/BpfWriter.cpp, io/BpfHeader.cpp
:92-160, io/BpfHeader.hpp:51-180).

Format facts mirrored from the reference:
- 176-byte v3 header: "BPF!" + "0003", then LE i4 len, u1 numDim,
  u1 interleave (0 dim-major / 1 point-major / 2 byte-major),
  u1 compression (0 none / 3 zlib), u1 pad, i4 numPts, i4 coordType,
  i4 coordId (UTM zone), f4 spacing, 16xf8 Mueller matrix (diag =
  XYZ scale, col 3 = translation), f8 start/end time
  (BpfHeader.cpp:111-160, BpfHeader.hpp:140-167).
- Dimension table is struct-of-arrays: all f8 offsets, all f8 mins,
  all f8 maxes, all 32-byte labels (BpfDimension::read,
  BpfHeader.cpp:294-306).
- Point data at byte `len`: float32 of (value/scale - offset) for
  X/Y/Z, (value - offset) otherwise (BpfWriter getAdjustedValue
  :379-392); reading adds the offset back and applies the Mueller
  transform to XYZ (BpfReader::readPointMajor:391-417).
- Compressed data is a sequence of [u4 finalBytes][u4 compressBytes]
  [zlib stream] blocks (BpfReader::readBlock:402-417).
- Byte-major segregates float bytes: dim -> byte index (LSB first)
  -> point (BpfReader::seekByteMajor, BpfWriter::writeByteMajor).

Spark-first shape, same as readers.las: binaryFile one row per file,
parallel across files; a mapInPandas kernel decodes each file with
np.frombuffer + reshape — all three interleaves are pure vectorized
transposes, never per-row Python. v1/v2 headers are rejected loudly
(legacy pre-2010 format; readV1 in the reference exists for
archival files only).

Writer: one complete v3 .bpf per non-empty partition (tiled-output
convention). XYZ offsets default to the partition minimum exactly
like the reference's auto-offset (BpfWriter.cpp:141-151 — "allowing
the default offset of 0 can lead to precision loss"), so float32
mantissas are spent on the local extent, not the absolute UTM
coordinate.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_HDR = 176
_V3_FMT = "<iBBBBiiif"  # len..spacing after the 8-byte magic


def _parse_bpf_header(data: bytes) -> dict:
    if data[:4] != b"BPF!":
        raise ValueError(
            "readers.bpf: bad magic (v1/v2 BPF without 'BPF!' is the "
            "pre-2010 legacy layout, not supported)")
    ver = int(data[4:8].decode("ascii"))
    if ver != 3:
        raise ValueError(f"readers.bpf: version {ver} unsupported")
    (length, ndim, interleave, comp, _pad, npts, coord_type,
     coord_id, spacing) = struct.unpack_from(_V3_FMT, data, 8)
    xform = struct.unpack_from("<16d", data, 31)
    t0, t1 = struct.unpack_from("<2d", data, 159)
    if interleave not in (0, 1, 2):
        raise ValueError("readers.bpf: unknown interleave "
                         f"{interleave}")
    if comp not in (0, 3):
        raise ValueError(
            f"readers.bpf: compression {comp} unsupported (0=none, "
            "3=zlib; QuickLZ/FastLZ codecs absent)")
    off = _HDR
    offsets = np.frombuffer(data, "<f8", ndim, off); off += 8 * ndim
    mins = np.frombuffer(data, "<f8", ndim, off); off += 8 * ndim
    maxs = np.frombuffer(data, "<f8", ndim, off); off += 8 * ndim
    labels = []
    for _ in range(ndim):
        labels.append(data[off:off + 32].split(b"\0")[0]
                      .decode("ascii", "replace").strip())
        off += 32
    return {"len": length, "ndim": ndim, "interleave": interleave,
            "comp": comp, "npts": npts, "coord_type": coord_type,
            "coord_id": coord_id, "spacing": spacing,
            "xform": xform, "t0": t0, "t1": t1,
            "offsets": offsets, "mins": mins, "maxs": maxs,
            "labels": labels}


def _inflate_blocks(data: bytes, want: int) -> bytes:
    """[u4 finalBytes][u4 compressBytes][zlib] blocks,
    BpfReader::readBlock."""
    out, pos = [], 0
    got = 0
    while got < want and pos + 8 <= len(data):
        final_b, comp_b = struct.unpack_from("<II", data, pos)
        pos += 8
        out.append(zlib.decompress(data[pos:pos + comp_b]))
        if len(out[-1]) != final_b:
            raise ValueError("readers.bpf: corrupt zlib block")
        pos += comp_b
        got += final_b
    if got < want:
        raise ValueError(
            f"readers.bpf: truncated data ({got} of {want} bytes)")
    return b"".join(out)


def _decode_bpf(data: bytes, hdr: dict) -> pd.DataFrame:
    n, ndim = hdr["npts"], hdr["ndim"]
    body = data[hdr["len"]:]
    if hdr["comp"]:
        body = _inflate_blocks(body, n * ndim * 4)
    if hdr["interleave"] == 1:        # point-major
        vals = np.frombuffer(body, "<f4", n * ndim).reshape(n, ndim)
        cols = vals.T
    elif hdr["interleave"] == 0:      # dim-major
        cols = np.frombuffer(body, "<f4", n * ndim).reshape(ndim, n)
    else:                             # byte-major: dim, byte, point
        raw = np.frombuffer(body, "u1", n * ndim * 4)
        # (ndim, 4, n) -> per dim little-endian reassembly
        b = raw.reshape(ndim, 4, n)
        u32 = (b[:, 0].astype("u4") | (b[:, 1].astype("u4") << 8)
               | (b[:, 2].astype("u4") << 16)
               | (b[:, 3].astype("u4") << 24))
        cols = u32.view("<f4") if u32.flags.c_contiguous else \
            np.ascontiguousarray(u32).view("<f4")
    out = {}
    for i, lab in enumerate(hdr["labels"]):
        out[lab] = cols[i].astype("f8") + hdr["offsets"][i]
    # Mueller transform on XYZ (diag scale + col-3 translation;
    # BpfReader::readPointMajor:412). Uses the ORIGINAL x,y,z — for
    # the diagonal matrices the writer produces this is identical to
    # the reference's sequential apply().
    v = hdr["xform"]
    if any(lab in out for lab in ("X", "Y", "Z")):
        x = out.get("X", 0.0); y = out.get("Y", 0.0)
        z = out.get("Z", 0.0)
        if "X" in out:
            out["X"] = x * v[0] + y * v[1] + z * v[2] + v[3]
        if "Y" in out:
            out["Y"] = x * v[4] + y * v[5] + z * v[6] + v[7]
        if "Z" in out:
            out["Z"] = x * v[8] + y * v[9] + z * v[10] + v[11]
    return pd.DataFrame(out)


def read_bpf(spark: SparkSession, path: str,
             with_path: bool = False) -> DataFrame:
    """readers.bpf analog (io/BpfReader.cpp): BPF v3, all three
    interleaves, zlib or uncompressed. Schema fixed by the first
    file's dimension labels; parallel across files."""
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"readers.bpf: no files match {path!r}")
    labels = _parse_bpf_header(bytes(first[0]["content"]))["labels"]
    cols = ", ".join(f"`{c}` double" for c in labels)
    schema = (cols + ", file_path string") if with_path else cols

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                h = _parse_bpf_header(bytes(content))
                if h["labels"] != labels:
                    raise ValueError(
                        f"{fpath}: dimensions {h['labels']} differ "
                        f"from the first file's {labels}")
                out = _decode_bpf(bytes(content), h)
                if with_path:
                    out["file_path"] = fpath
                yield out

    return files.select("path", "content").mapInPandas(parse, schema)


def write_bpf(df: DataFrame, out_dir: str, interleave: str = "dim",
              compression: bool = False,
              coord_id: int = 0) -> int:
    """writers.bpf analog (io/BpfWriter.cpp): BPF v3, one file per
    non-empty partition. `interleave` in dim|point|byte. XYZ offsets
    auto-set to the partition minimum (the reference's auto-offset,
    BpfWriter.cpp:141) so float32 precision covers the local extent.
    All columns must be numeric; they are stored as float32 like the
    format mandates."""
    import os

    inter = {"dim": 0, "point": 1, "byte": 2}.get(interleave)
    if inter is None:
        raise ValueError(f"writers.bpf: interleave {interleave!r}")
    names = list(df.columns)
    if len(names) > 255:
        raise ValueError("writers.bpf: more than 255 dimensions")
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
        ndim = len(names)
        vals = np.empty((ndim, n), dtype="<f4")
        offs = np.zeros(ndim, dtype="f8")
        mins = np.empty(ndim, dtype="f8")
        maxs = np.empty(ndim, dtype="f8")
        for i, c in enumerate(names):
            col = pdf[c].to_numpy(dtype="f8")
            mins[i], maxs[i] = col.min(), col.max()
            if c in ("X", "Y", "Z"):
                offs[i] = mins[i]
            vals[i] = (col - offs[i]).astype("<f4")
        dim_block = (offs.astype("<f8").tobytes()
                     + mins.astype("<f8").tobytes()
                     + maxs.astype("<f8").tobytes()
                     + b"".join(c.encode("ascii").ljust(32, b"\0")
                                for c in names))
        length = _HDR + len(dim_block)
        hdr = bytearray(_HDR)
        hdr[0:8] = b"BPF!0003"
        struct.pack_into(_V3_FMT, hdr, 8, length, ndim, inter,
                         3 if compression else 0, 0, n,
                         1 if coord_id else 0,  # UTM iff zone given
                         coord_id, 0.0)
        eye = [1.0, 0, 0, 0, 0, 1.0, 0, 0,
               0, 0, 1.0, 0, 0, 0, 0, 1.0]
        struct.pack_into("<16d", hdr, 31, *eye)
        struct.pack_into("<2d", hdr, 159, 0.0, 0.0)
        if inter == 0:
            body = vals.tobytes()
        elif inter == 1:
            body = np.ascontiguousarray(vals.T).tobytes()
        else:
            u32 = vals.view("<u4")
            parts = []
            for b in range(4):
                parts.append(((u32 >> (8 * b)) & 0xFF)
                             .astype("u1").tobytes())
            # per-dim byte planes: dim -> byte -> point
            planes = [np.frombuffer(p, "u1").reshape(ndim, n)
                      for p in parts]
            body = np.stack(planes, axis=1).tobytes()
        if compression:
            comp = zlib.compress(body)
            body = struct.pack("<II", len(body), len(comp)) + comp
        fp = os.path.join(out_dir, f"part-{pid:05d}.bpf")
        with open(fp, "wb") as fh:
            fh.write(bytes(hdr) + dim_block + body)
        yield pd.DataFrame({"file": [fp], "rows": [n]})

    return int(df.mapInPandas(
        dump, "file string, rows long").where("rows > 0").count())
