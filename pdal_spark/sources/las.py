"""readers.las / writers.las analogs — the native LAS 1.2/1.4 point
format (io/LasReader.cpp, io/LasHeader.cpp, io/private/las/Header.hpp
:57-160, io/private/las/Utils.cpp:350-760).

Scope: uncompressed LAS, point formats 0-3 (legacy) and 6-8 (1.4);
LAZ (compression bit 0x80 in the format byte, Header.hpp:77) for
point formats 0-3 via the pure-Python `sources.lazdec` decompressor
(compressor 2, v2 items) AND for point formats 6-8 via
`sources.lazdec14` (compressor 3 layered, v3 items — the modern
LAS 1.4 / COPC stream) — auto-registered below, validated against
the reference's own .las/.laz twin fixtures and COPC test pins.
Waveform formats 4/5/9/10 are rejected loudly with per-file
diagnostics (laz_info).

Spark-first shape, same as readers.pcd: `binaryFile` lists and ships
(path, content) one row per file — parallel ACROSS files (a .las file
has no intra-file split points either; the reference streams one
file per stage instance too) — and a `mapInPandas` kernel decodes
each file with one `np.frombuffer` over a structured dtype whose
itemsize is the header's pointSize (so extra bytes, Header.hpp
ebCount, are skipped without a copy), then vectorized bit unpacking.
Never per-row Python.

Dimension names/semantics match las::Utils::loadPoint
(Utils.cpp:559-745): X/Y/Z are scale*raw+offset doubles; legacy
flag byte splits into ReturnNumber/NumberOfReturns(3b each)/
ScanDirectionFlag/EdgeOfFlightLine; the legacy classification byte
into Classification(5b)/Synthetic/KeyPoint/Withheld; 1.4 formats add
Overlap + ScanChannel and store ScanAngle as int16 scaled by .006
degrees (Utils.cpp:729). Unsigned widens one step (house convention,
SURVEY §1.2).

writers.las mirrors io/LasWriter.cpp as a directory writer: one
complete, valid .las per non-empty partition (tiled-output
convention — single-file export at 100 TB is an anti-goal); each
file's header carries that partition's true bounds, point count and
points-by-return histogram, so a tile index can be built from
headers alone, like the reference's writers.las forward metadata.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# point-record base sizes per format (las::baseCount, Utils.cpp;
# waveform formats 4/5/9/10 = their non-wave twin + the 29-byte
# wave-packet block — LAS 1.4 spec §2.5/2.6/2.11/2.12. NOTE: the
# reference REJECTS these four formats outright
# (io/private/las/Utils.hpp:93-108 pointFormatSupported), so
# uncompressed read/write support here is a documented superset for
# old LAS 1.3 waveform archives; waveform DATA (the EVLR payload) is
# not read — only the per-point wave-packet fields.)
_BASE = {0: 20, 1: 28, 2: 26, 3: 34, 6: 30, 7: 36, 8: 38,
         4: 57, 5: 63, 9: 59, 10: 67}
_HDRSIZE = {2: 227, 3: 235, 4: 375}  # versionMinor -> header size


def _has_time(f: int) -> bool:
    return f == 1 or f >= 3


def _has_color(f: int) -> bool:
    return f in (2, 3, 5, 7, 8, 10)


def _has_nir(f: int) -> bool:
    return f in (8, 10)


def _has_wave(f: int) -> bool:
    """Header.hpp:147-151 hasWave()."""
    return f in (4, 5, 9, 10)


# on-disk wave-packet block: (column, numpy, spark) in spec order
_WAVE_FIELDS = (
    ("WavePacketDescriptorIndex", "u1", "smallint"),
    ("WaveformDataOffset", "<u8", "bigint"),
    ("WaveformPacketSize", "<u4", "bigint"),
    ("ReturnPointWaveformLocation", "<f4", "float"),
    ("ParametricDx", "<f4", "float"),
    ("ParametricDy", "<f4", "float"),
    ("ParametricDz", "<f4", "float"),
)


def _dims(f: int) -> list[tuple[str, str]]:
    """(name, spark_type) in on-disk order, per pdrfDims
    (Utils.cpp:350)."""
    d = [("X", "double"), ("Y", "double"), ("Z", "double"),
         ("Intensity", "int"),
         ("ReturnNumber", "smallint"), ("NumberOfReturns", "smallint"),
         ("ScanDirectionFlag", "smallint"),
         ("EdgeOfFlightLine", "smallint"),
         ("Classification", "smallint"),
         ("Synthetic", "smallint"), ("KeyPoint", "smallint"),
         ("Withheld", "smallint")]
    if f >= 6:
        d += [("Overlap", "smallint"), ("ScanChannel", "smallint")]
    d += [("ScanAngleRank", "double"), ("UserData", "smallint"),
          ("PointSourceId", "int")]
    if _has_time(f):
        d.append(("GpsTime", "double"))
    if _has_color(f):
        d += [("Red", "int"), ("Green", "int"), ("Blue", "int")]
    if _has_nir(f):
        d.append(("Infrared", "int"))
    if _has_wave(f):
        d += [(c, st) for c, _dt, st in _WAVE_FIELDS]
    return d


def _read_plan_head(fh) -> bytes:
    """Read exactly the header + VLR block of an open LAS/LAZ/COPC
    file: first the fixed public header (the point-data offset at
    byte 96 bounds the VLR region), then the remainder. Robust to
    files whose header+VLR block exceeds 64 KiB (many VLRs / large
    extra-bytes VLRs), unlike a fixed-size head read."""
    fh.seek(0)
    head = fh.read(375)
    if len(head) < 100 or head[:4] != b"LASF":
        raise ValueError("readers.las: bad magic (not 'LASF')")
    (point_off,) = struct.unpack_from("<I", head, 96)
    need = max(int(point_off), 375)
    if need > len(head):
        head += fh.read(need - len(head))
    return head


def _parse_las_header(data: bytes) -> dict:
    """LAS public header block, io/private/las/Header.hpp:57-105
    field order (little-endian)."""
    if data[:4] != b"LASF":
        raise ValueError("readers.las: bad magic (not 'LASF')")
    (vmaj, vmin) = struct.unpack_from("<BB", data, 24)
    if vmaj != 1 or vmin not in _HDRSIZE:
        raise ValueError(f"readers.las: LAS {vmaj}.{vmin} unsupported"
                         " (1.2-1.4)")
    (hdr_size,) = struct.unpack_from("<H", data, 94)
    (point_off, vlr_count) = struct.unpack_from("<II", data, 96)
    (fmt_bits,) = struct.unpack_from("<B", data, 104)
    (point_size,) = struct.unpack_from("<H", data, 105)
    (legacy_count,) = struct.unpack_from("<I", data, 107)
    scale = struct.unpack_from("<3d", data, 131)
    offset = struct.unpack_from("<3d", data, 155)
    laz = None
    if fmt_bits & 0x80:
        # LAZ: parse the laszip VLR for loud per-file diagnostics
        # (a tindex sweep over a mixed las/laz tree should say WHAT
        # each laz file contains, not just "compressed")
        try:
            laz = laz_info(data)
        except Exception as e:  # noqa: BLE001 - diagnostics only
            laz = {"error": str(e)}
        if _LAZ_DECODER is None:
            raise ValueError(
                "readers.las: file is LAZ-compressed (format bit "
                f"0x80); laszip stream diagnostics: {laz}. "
                "Decompression needs a laszip codec — decompress to "
                ".las first, or register_laz_decoder() (the "
                "documented swap-in point, see the LAZ ADR in "
                "COVERAGE.md)")
    fmt = fmt_bits & 0x0F
    if fmt not in _BASE:
        raise ValueError(f"readers.las: point format {fmt} "
                         "unsupported (0-10 defined by LAS 1.4)")
    count = legacy_count
    if vmin >= 4:
        (ecount,) = struct.unpack_from("<Q", data, 247)
        if ecount:
            count = ecount
    if point_size < _BASE[fmt]:
        raise ValueError(
            f"readers.las: pointSize {point_size} < base "
            f"{_BASE[fmt]} for format {fmt}")
    return {"vmin": vmin, "fmt": fmt, "off": point_off,
            "size": point_size, "count": count,
            "scale": scale, "offset": offset,
            "eb": point_size - _BASE[fmt], "laz": laz}


# ---------------------------------------------------------------------------
# LAZ stream introspection + decoder registry (LAZ ADR, r3 — REVISED
# same round).
#
# The initial r3 decision kept the LASzip codec OUT on the grounds
# that a from-memory reimplementation could only be validated
# against itself. That premise turned out false: the reference tree
# ships INDEPENDENT .las/.laz twin fixtures
# (test/data/laszip/basefile.las <-> laszip-generated.laz /
# liblas-generated.laz, test/data/las/autzen_trim.las <->
# test/data/laz/autzen_trim.laz), so a decoder can be proven
# point-for-point against ground truth it did not produce. The repo
# therefore ships `sources.lazdec` — a pure-Python LASzip
# decompressor for the legacy mainstream of the format (compressor
# 2, POINT10/GPSTIME11/RGB12/BYTE item version 2, point formats
# 0-3) — auto-registered below, so read_las handles .laz
# transparently. Out of scope, rejected with named diagnostics:
# compressor 1 (v1 item codecs) and compressor 3 (layered,
# point formats 6+).
#
#   1. laz_info(): laszip-VLR + chunk-table introspection from the
#      public stream layout — tindex sweeps over mixed las/laz trees
#      get per-file diagnostics, and unsupported-stream errors name
#      exactly what the file contains;
#   2. register_laz_decoder(fn): the decoder slot. The pure-Python
#      decoder is the default; a laspy/lazrs deployment can swap in
#      a faster native adapter with one call.
# ---------------------------------------------------------------------------

_LAZ_DECODER = None

_LAZ_ITEM_NAMES = {
    0: "BYTE", 6: "POINT10", 7: "GPSTIME11", 8: "RGB12",
    9: "WAVEPACKET13", 10: "POINT14", 11: "RGB14", 12: "RGBNIR14",
    13: "WAVEPACKET14", 14: "BYTE14",
}

_LAZ_COMPRESSORS = {
    0: "none", 1: "pointwise", 2: "pointwise_chunked",
    3: "layered_chunked",
}


def register_laz_decoder(fn) -> None:
    """Install a LAZ point-data decoder: ``fn(data: bytes, hdr:
    dict) -> pandas.DataFrame`` with the `_dims(hdr['fmt'])`
    columns (hdr carries the parsed header + hdr['laz'] stream
    info). Pass None to uninstall."""
    global _LAZ_DECODER
    _LAZ_DECODER = fn


def parse_laszip_vlr(data: bytes, hdr_size: int,
                     vlr_count: int) -> dict | None:
    """Scan the VLR block for the 'laszip encoded' record (user_id
    "laszip encoded", record_id 22204) and parse its payload per the
    public LASzip stream spec."""
    pos = int(hdr_size)
    for _ in range(int(vlr_count)):
        if pos + 54 > len(data):
            return None
        user_id = data[pos + 2:pos + 18].rstrip(b"\x00")
        (record_id,) = struct.unpack_from("<H", data, pos + 18)
        (rec_len,) = struct.unpack_from("<H", data, pos + 20)
        payload = data[pos + 54:pos + 54 + rec_len]
        pos += 54 + rec_len
        if user_id != b"laszip encoded" or record_id != 22204:
            continue
        (compressor, coder, vmaj, vmin, rev, options,
         chunk_size) = struct.unpack_from("<HHBBHII", payload, 0)
        (n_special, off_special) = struct.unpack_from(
            "<qq", payload, 16)
        (num_items,) = struct.unpack_from("<H", payload, 32)
        items = []
        for i in range(num_items):
            t, sz, ver = struct.unpack_from("<HHH", payload,
                                            34 + 6 * i)
            items.append({
                "type": _LAZ_ITEM_NAMES.get(t, f"UNKNOWN({t})"),
                "size": sz, "version": ver,
            })
        return {
            "compressor": _LAZ_COMPRESSORS.get(
                compressor, f"unknown({compressor})"),
            "coder": "arithmetic" if coder == 0 else f"({coder})",
            "version": f"{vmaj}.{vmin}r{rev}",
            "options": options,
            "chunk_size": chunk_size,
            "num_special_evlrs": n_special,
            "offset_special_evlrs": off_special,
            "items": items,
        }
    return None


def laz_info(data: bytes) -> dict:
    """Introspect a .laz byte stream WITHOUT decompressing: laszip
    VLR contents + chunk-table offset (the plain int64 preceding the
    first chunk for chunked compressors) + expected chunk count."""
    if data[:4] != b"LASF":
        raise ValueError("laz_info: bad magic (not 'LASF')")
    (hdr_size,) = struct.unpack_from("<H", data, 94)
    (point_off, vlr_count) = struct.unpack_from("<II", data, 96)
    (fmt_bits,) = struct.unpack_from("<B", data, 104)
    (legacy_count,) = struct.unpack_from("<I", data, 107)
    count = legacy_count
    (vmaj, vmin) = struct.unpack_from("<BB", data, 24)
    if vmin >= 4:
        (ecount,) = struct.unpack_from("<Q", data, 247)
        if ecount:
            count = ecount
    vlr = parse_laszip_vlr(data, hdr_size, vlr_count)
    out = {
        "compressed_bit": bool(fmt_bits & 0x80),
        "base_format": fmt_bits & 0x0F,
        "point_count": count,
        "laszip_vlr": vlr,
    }
    if vlr and vlr["compressor"] in ("pointwise_chunked",
                                     "layered_chunked"):
        if point_off + 8 <= len(data):
            (cto,) = struct.unpack_from("<q", data, point_off)
            out["chunk_table_offset"] = cto
        cs = vlr["chunk_size"]
        if cs:
            out["n_chunks"] = -(-count // cs)
    return out


def _record_dtype(fmt: int, point_size: int) -> np.dtype:
    """Structured dtype over the on-disk record; itemsize =
    pointSize so trailing extra bytes are skipped in-place."""
    if fmt < 6:
        names = ["X", "Y", "Z", "Intensity", "flags", "cls",
                 "scan_angle", "user", "psid"]
        formats = ["<i4", "<i4", "<i4", "<u2", "u1", "u1", "i1",
                   "u1", "<u2"]
        if _has_time(fmt):
            names.append("gps"); formats.append("<f8")
        if _has_color(fmt):
            names += ["red", "green", "blue"]
            formats += ["<u2"] * 3
    else:
        names = ["X", "Y", "Z", "Intensity", "returns", "flags",
                 "cls", "user", "scan_angle", "psid", "gps"]
        formats = ["<i4", "<i4", "<i4", "<u2", "u1", "u1", "u1",
                   "u1", "<i2", "<u2", "<f8"]
        if _has_color(fmt):
            names += ["red", "green", "blue"]
            formats += ["<u2"] * 3
        if _has_nir(fmt):
            names.append("nir"); formats.append("<u2")
    if _has_wave(fmt):
        names += ["wave_desc", "wave_off", "wave_size", "wave_ret",
                  "wave_xt", "wave_yt", "wave_zt"]
        formats += ["u1", "<u8", "<u4", "<f4", "<f4", "<f4", "<f4"]
    offsets = []
    off = 0
    for f in formats:
        offsets.append(off)
        off += np.dtype(f).itemsize
    return np.dtype({"names": names, "formats": formats,
                     "offsets": offsets, "itemsize": point_size})


def _decode_las(data: bytes, hdr: dict) -> pd.DataFrame:
    if hdr.get("laz") is not None:
        if _LAZ_DECODER is None:  # pragma: no cover - header raises
            raise ValueError("readers.las: LAZ without a decoder")
        return _LAZ_DECODER(data, hdr)
    arr = np.frombuffer(data, dtype=_record_dtype(hdr["fmt"],
                                                  hdr["size"]),
                        count=hdr["count"], offset=hdr["off"])
    return _arr_to_frame(arr, hdr)


def _arr_to_frame(arr: np.ndarray, hdr: dict) -> pd.DataFrame:
    """Record array -> typed DataFrame (shared by the uncompressed
    reader and the LAZ decompressor so both paths have identical
    column semantics)."""
    fmt = hdr["fmt"]
    sx, sy, sz = hdr["scale"]
    ox, oy, oz = hdr["offset"]
    out = {"X": arr["X"] * sx + ox,
           "Y": arr["Y"] * sy + oy,
           "Z": arr["Z"] * sz + oz,
           "Intensity": arr["Intensity"].astype("i4")}
    if fmt < 6:
        fl = arr["flags"]
        cl = arr["cls"]
        out["ReturnNumber"] = (fl & 7).astype("i2")
        out["NumberOfReturns"] = ((fl >> 3) & 7).astype("i2")
        out["ScanDirectionFlag"] = ((fl >> 6) & 1).astype("i2")
        out["EdgeOfFlightLine"] = ((fl >> 7) & 1).astype("i2")
        out["Classification"] = (cl & 31).astype("i2")
        out["Synthetic"] = ((cl >> 5) & 1).astype("i2")
        out["KeyPoint"] = ((cl >> 6) & 1).astype("i2")
        out["Withheld"] = ((cl >> 7) & 1).astype("i2")
        out["ScanAngleRank"] = arr["scan_angle"].astype("f8")
    else:
        rt = arr["returns"]
        fl = arr["flags"]
        out["ReturnNumber"] = (rt & 15).astype("i2")
        out["NumberOfReturns"] = ((rt >> 4) & 15).astype("i2")
        out["Synthetic"] = (fl & 1).astype("i2")
        out["KeyPoint"] = ((fl >> 1) & 1).astype("i2")
        out["Withheld"] = ((fl >> 2) & 1).astype("i2")
        out["Overlap"] = ((fl >> 3) & 1).astype("i2")
        out["ScanChannel"] = ((fl >> 4) & 3).astype("i2")
        out["ScanDirectionFlag"] = ((fl >> 6) & 1).astype("i2")
        out["EdgeOfFlightLine"] = ((fl >> 7) & 1).astype("i2")
        out["Classification"] = arr["cls"].astype("i2")
        # Utils.cpp:729 — 1.4 scan angle is int16 * .006 degrees
        out["ScanAngleRank"] = arr["scan_angle"] * 0.006
    out["UserData"] = arr["user"].astype("i2")
    out["PointSourceId"] = arr["psid"].astype("i4")
    if _has_time(fmt):
        out["GpsTime"] = arr["gps"]
    if _has_color(fmt):
        out["Red"] = arr["red"].astype("i4")
        out["Green"] = arr["green"].astype("i4")
        out["Blue"] = arr["blue"].astype("i4")
    if _has_nir(fmt):
        out["Infrared"] = arr["nir"].astype("i4")
    if _has_wave(fmt):
        out["WavePacketDescriptorIndex"] = \
            arr["wave_desc"].astype("i2")
        out["WaveformDataOffset"] = arr["wave_off"].astype("i8")
        out["WaveformPacketSize"] = arr["wave_size"].astype("i8")
        out["ReturnPointWaveformLocation"] = arr["wave_ret"]
        out["ParametricDx"] = arr["wave_xt"]
        out["ParametricDy"] = arr["wave_yt"]
        out["ParametricDz"] = arr["wave_zt"]
    cols = [c for c, _ in _dims(fmt)]
    return pd.DataFrame({c: out[c] for c in cols})


# PDAL extra-dims type spellings (las::Utils parse; Utils.cpp:395+)
_EXTRA_TYPES = {
    "int8": ("i1", 1, "smallint"), "uint8": ("u1", 1, "smallint"),
    "int16": ("<i2", 2, "smallint"), "uint16": ("<u2", 2, "int"),
    "int32": ("<i4", 4, "int"), "uint32": ("<u4", 4, "bigint"),
    "int64": ("<i8", 8, "bigint"), "uint64": ("<u8", 8, "bigint"),
    "float": ("<f4", 4, "float"), "double": ("<f8", 8, "double"),
}


def parse_extra_dims(spec) -> list[tuple[str, str, int, str]]:
    """PDAL `extra_dims` spec — "name=type,name2=type2" or a list
    of (name, type) pairs — to [(name, np_dtype, size,
    spark_type)]. Unsigned widens one step (house convention);
    uint64 stays bigint (reinterpreted, documented)."""
    if isinstance(spec, str):
        pairs = [p.split("=") for p in spec.split(",") if p.strip()]
    else:
        pairs = [tuple(p) for p in spec]
    out = []
    for name, typ in pairs:
        name = name.strip()
        typ = typ.strip().lower()
        if typ not in _EXTRA_TYPES:
            raise ValueError(
                f"readers.las: extra_dims type {typ!r} unknown "
                f"(one of {sorted(_EXTRA_TYPES)})")
        np_t, size, spark_t = _EXTRA_TYPES[typ]
        out.append((name, np_t, size, spark_t))
    return out


def _decode_las_arr(data: bytes, hdr: dict) -> np.ndarray:
    """Record ARRAY for a .las/.laz byte blob (extra bytes
    preserved in the trailing region)."""
    if hdr.get("laz") is not None:
        from pdal_spark.sources.lazdec import decompress_points

        return decompress_points(data, hdr)
    return np.frombuffer(data, dtype=_record_dtype(hdr["fmt"],
                                                   hdr["size"]),
                         count=hdr["count"], offset=hdr["off"])


def _append_extra_dims(out: pd.DataFrame, arr: np.ndarray,
                       hdr: dict, specs) -> pd.DataFrame:
    eb = hdr["eb"]
    need = sum(s[2] for s in specs)
    if need > eb:
        raise ValueError(
            f"readers.las: extra_dims spec needs {need} bytes but "
            f"records carry {eb} extra bytes")
    base = arr.dtype.itemsize - eb
    raw = np.ascontiguousarray(arr).view("u1").reshape(
        len(arr), arr.dtype.itemsize)
    off = base
    for name, np_t, size, _ in specs:
        col = np.ascontiguousarray(
            raw[:, off:off + size]).view(np_t).ravel()
        if np_t == "<u8":
            col = col.view("<i8")  # reinterpret (no int128)
        out[name] = col
        off += size
    return out


def read_las(spark: SparkSession, path: str,
             with_path: bool = False,
             extra_dims=None) -> DataFrame:
    """readers.las analog (io/LasReader.cpp). `path` may be a file,
    directory, or glob; schema is fixed by the FIRST file's point
    format; files with a different format error loudly. Parallel
    across files. `extra_dims` ("name=type,..." or [(name, type)])
    surfaces the record's extra bytes as typed columns
    (LasReader.cpp:188 option)."""
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"readers.las: no files match {path!r}")
    fmt = _parse_las_header(bytes(first[0]["content"]))["fmt"]
    specs = parse_extra_dims(extra_dims) if extra_dims else None
    cols = ", ".join(f"`{c}` {t}" for c, t in _dims(fmt))
    if specs:
        cols += "".join(f", `{n}` {st}" for n, _, _, st in specs)
    schema = (cols + ", file_path string") if with_path else cols

    # capture the decoder BY VALUE: workers re-import the module
    # from PYTHONPATH, where module state (register_laz_decoder on
    # the driver) does not exist
    laz_dec = _LAZ_DECODER

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pdal_spark.sources.las as _las_mod

        # the DRIVER's decoder wins: workers auto-register the
        # default pure-Python decoder at import, but a custom
        # register_laz_decoder() on the driver must override it
        _las_mod._LAZ_DECODER = laz_dec
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                h = _parse_las_header(bytes(content))
                if h["fmt"] != fmt:
                    raise ValueError(
                        f"{fpath}: point format {h['fmt']} differs "
                        f"from the first file's {fmt}")
                if specs:
                    arr = _decode_las_arr(bytes(content), h)
                    out = _arr_to_frame(arr, h)
                    out = _append_extra_dims(out, arr, h, specs)
                else:
                    out = _decode_las(bytes(content), h)
                if with_path:
                    out["file_path"] = fpath
                yield out

    return files.select("path", "content").mapInPandas(parse, schema)


def _infer_pdrf(cols: set) -> int:
    if "Infrared" in cols:
        return 8
    if "ScanChannel" in cols or "Overlap" in cols:
        return 7 if "Red" in cols else 6
    if "Red" in cols:
        return 3 if "GpsTime" in cols else 2
    return 1 if "GpsTime" in cols else 0


def _pack_las(pdf: pd.DataFrame, fmt: int, scale, offset,
              vmin: int) -> bytes:
    """One complete .las file (header + records) for one partition.
    Header field order per io/private/las/Header.hpp:57-105."""
    n = len(pdf)
    sx, sy, sz = scale
    ox, oy, oz = offset

    def col(name, dtype, default=0):
        if name in pdf.columns:
            return pdf[name].to_numpy().astype(dtype)
        return np.full(n, default, dtype=dtype)

    xi = np.round((pdf["X"].to_numpy("f8") - ox) / sx).astype("<i4")
    yi = np.round((pdf["Y"].to_numpy("f8") - oy) / sy).astype("<i4")
    zi = np.round((pdf["Z"].to_numpy("f8") - oz) / sz).astype("<i4")
    ret = col("ReturnNumber", "u1", 1)
    nret = col("NumberOfReturns", "u1", 1)
    sdir = col("ScanDirectionFlag", "u1")
    edge = col("EdgeOfFlightLine", "u1")
    cls = col("Classification", "u1")
    syn = col("Synthetic", "u1")
    key = col("KeyPoint", "u1")
    wit = col("Withheld", "u1")

    rec = np.zeros(n, dtype=_record_dtype(fmt, _BASE[fmt]))
    rec["X"], rec["Y"], rec["Z"] = xi, yi, zi
    rec["Intensity"] = col("Intensity", "<u2")
    if fmt < 6:
        rec["flags"] = ((ret & 7) | ((nret & 7) << 3)
                        | ((sdir & 1) << 6) | ((edge & 1) << 7))
        rec["cls"] = ((cls & 31) | ((syn & 1) << 5)
                      | ((key & 1) << 6) | ((wit & 1) << 7))
        rec["scan_angle"] = np.round(
            col("ScanAngleRank", "f8")).astype("i1")
    else:
        ovl = col("Overlap", "u1")
        chan = col("ScanChannel", "u1")
        rec["returns"] = (ret & 15) | ((nret & 15) << 4)
        rec["flags"] = ((syn & 1) | ((key & 1) << 1)
                        | ((wit & 1) << 2) | ((ovl & 1) << 3)
                        | ((chan & 3) << 4) | ((sdir & 1) << 6)
                        | ((edge & 1) << 7))
        rec["cls"] = cls
        rec["scan_angle"] = np.round(
            col("ScanAngleRank", "f8") / 0.006).astype("<i2")
    rec["user"] = col("UserData", "u1")
    rec["psid"] = col("PointSourceId", "<u2")
    if _has_time(fmt):
        rec["gps"] = col("GpsTime", "<f8")
    if _has_color(fmt):
        rec["red"] = col("Red", "<u2")
        rec["green"] = col("Green", "<u2")
        rec["blue"] = col("Blue", "<u2")
    if _has_nir(fmt):
        rec["nir"] = col("Infrared", "<u2")
    if _has_wave(fmt):
        rec["wave_desc"] = col("WavePacketDescriptorIndex", "u1")
        rec["wave_off"] = col("WaveformDataOffset", "<u8")
        rec["wave_size"] = col("WaveformPacketSize", "<u4")
        rec["wave_ret"] = col("ReturnPointWaveformLocation", "<f4")
        rec["wave_xt"] = col("ParametricDx", "<f4")
        rec["wave_yt"] = col("ParametricDy", "<f4")
        rec["wave_zt"] = col("ParametricDz", "<f4")

    hdr_size = _HDRSIZE[vmin]
    by_return = np.bincount(
        np.clip(ret, 0, 15).astype("i8"), minlength=16)
    legacy_by_return = [int(by_return[i]) for i in range(1, 6)]
    x, y, z = pdf["X"].to_numpy("f8"), pdf["Y"].to_numpy("f8"), \
        pdf["Z"].to_numpy("f8")

    buf = bytearray(hdr_size)
    struct.pack_into("<4s", buf, 0, b"LASF")
    struct.pack_into("<HH", buf, 4, 0, 0x10 if vmin >= 4 else 0)
    struct.pack_into("<BB", buf, 24, 1, vmin)
    struct.pack_into("<32s32s", buf, 26, b"PDAL", b"pdal_spark")
    struct.pack_into("<HH", buf, 90, 1, 2026)
    struct.pack_into("<H", buf, 94, hdr_size)
    struct.pack_into("<II", buf, 96, hdr_size, 0)
    struct.pack_into("<BH", buf, 104, fmt, _BASE[fmt])
    struct.pack_into("<I", buf, 107, n if vmin < 4 else 0)
    if vmin < 4:
        struct.pack_into("<5I", buf, 111, *legacy_by_return)
    struct.pack_into("<3d", buf, 131, sx, sy, sz)
    struct.pack_into("<3d", buf, 155, ox, oy, oz)
    struct.pack_into("<6d", buf, 179,
                     float(x.max()), float(x.min()),
                     float(y.max()), float(y.min()),
                     float(z.max()), float(z.min()))
    if vmin >= 3:
        struct.pack_into("<Q", buf, 227, 0)          # waveOffset
    if vmin >= 4:
        struct.pack_into("<QI", buf, 235, 0, 0)      # evlr off/count
        struct.pack_into("<Q", buf, 247, n)
        struct.pack_into("<15Q", buf, 255,
                         *(int(by_return[i]) for i in range(1, 16)))
    return bytes(buf) + rec.tobytes()


def write_las(df: DataFrame, out_dir: str, pdrf: int | None = None,
              scale=(0.01, 0.01, 0.01),
              offset=(0.0, 0.0, 0.0),
              laz: bool = False) -> int:
    """writers.las analog (io/LasWriter.cpp): one complete .las per
    non-empty partition under `out_dir`; LAS 1.2 for formats 0-3,
    LAS 1.4 for 6-8. Scale/offset are explicit (auto-deriving them
    would force a global min/max pass -- at 100 TB the caller knows
    the CRS grid). ``laz=True`` emits LASzip-compressed .laz:
    compressor 2 for formats 0-3 (sources.lazenc, byte-identical
    streams to laszip's own output on the reference fixtures) and
    layered compressor 3 for formats 6-8 (sources.copcwriter.
    compress_las_bytes14, chunk streams byte-identical to
    lazperf's). Returns files written."""
    import os

    cols = set(df.columns)
    for c in ("X", "Y", "Z"):
        if c not in cols:
            raise ValueError(f"writers.las: missing column {c}")
    fmt = _infer_pdrf(cols) if pdrf is None else int(pdrf)
    if fmt not in _BASE:
        raise ValueError(f"writers.las: point format {fmt} "
                         "unsupported (0-10)")
    if laz and _has_wave(fmt):
        raise ValueError(
            "writers.las: laz=True with waveform point format "
            f"{fmt} — LASzip WAVEPACKET item codecs are not "
            "implemented (the reference rejects these formats "
            "entirely, io/private/las/Utils.hpp:93-108); write "
            "uncompressed or use the non-wave twin format")
    # waveform formats 4/5 need the LAS 1.3 header (wave data start
    # field); 9/10 and all 1.4-native formats use the 1.4 header
    vmin = 4 if fmt >= 6 else (3 if _has_wave(fmt) else 2)
    os.makedirs(out_dir, exist_ok=True)
    keep = [c for c, _ in _dims(fmt) if c in cols]

    def dump(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = [pdf for pdf in it if len(pdf)]
        if not chunks:
            yield pd.DataFrame({"file": pd.Series([], dtype=str),
                                "rows": pd.Series([], dtype="int64")})
            return
        pdf = pd.concat(chunks, ignore_index=True)
        ext = "laz" if laz else "las"
        fp = os.path.join(out_dir, f"part-{pid:05d}.{ext}")
        data = _pack_las(pdf, fmt, scale, offset, vmin)
        if laz and fmt >= 6:
            from pdal_spark.sources.copcwriter import (
                compress_las_bytes14,
            )

            data = compress_las_bytes14(data)
        elif laz:
            from pdal_spark.sources.lazenc import compress_las_bytes

            data = compress_las_bytes(data)
        with open(fp, "wb") as fh:
            fh.write(data)
        yield pd.DataFrame({"file": [fp], "rows": [len(pdf)]})

    return int(df.select(keep).mapInPandas(
        dump, "file string, rows long").where("rows > 0").count())


# auto-register the pure-Python LASzip decoder (see the LAZ ADR
# above; validated against the reference's .las/.laz twin fixtures
# in tests/test_lazdec.py)
try:  # pragma: no cover - import cycle guard only
    from pdal_spark.sources import lazdec as _lazdec

    register_laz_decoder(_lazdec.decode_to_frame)
except ImportError:  # pragma: no cover
    pass


def read_las_chunked(spark: SparkSession, path: str,
                     with_path: bool = False) -> DataFrame:
    """Chunk-parallel .laz reader: LASzip chunks are independent by
    design (fresh models + raw first point per chunk), so one big
    .laz file fans out to one TASK PER CHUNK instead of one per
    file — the scale path for the pure-Python decoder (a 50k-point
    chunk decodes in ~1 s; a 100M-point file becomes 2000 parallel
    units). Planning mirrors parquet's footer reads: the driver
    reads each file's header + arithmetic-coded chunk table (a few
    KB), then workers fetch and decode only their chunk's byte
    range. Uncompressed .las files fall back to one task per file.

    Schema is fixed by the first file's point format, like read_las.
    """
    import glob as _glob
    import os

    from pdal_spark.sources.lazdec import (
        _check_stream,
        decompress_chunk,
        read_chunk_table_file,
    )

    if os.path.isdir(path):
        files = sorted(
            _glob.glob(os.path.join(path, "*.las"))
            + _glob.glob(os.path.join(path, "*.laz")))
    else:
        files = sorted(_glob.glob(path))
    if not files:
        raise ValueError(f"read_las_chunked: no files match {path!r}")

    # driver-side planning: header + chunk table per file
    tasks = []  # (path, start, end, n_pts, fmt, eb, size, sx..oz)
    fmt0 = None
    for fp in files:
        with open(fp, "rb") as fh:
            head = _read_plan_head(fh)
            hdr = _parse_las_header(head)
            if fmt0 is None:
                fmt0 = hdr["fmt"]
            elif hdr["fmt"] != fmt0:
                raise ValueError(
                    f"{fp}: point format {hdr['fmt']} differs from "
                    f"the first file's {fmt0}")
            if hdr["laz"] is None:
                size = os.path.getsize(fp)
                tasks.append((fp, hdr["off"], size, hdr["count"],
                              hdr["fmt"], hdr["eb"], hdr["size"],
                              *hdr["scale"], *hdr["offset"], 0))
                continue
            vlr = hdr["laz"].get("laszip_vlr")
            _check_stream(vlr)
            # planning read: 8-byte table offset + the table region
            # only (parquet-footer style) — never the point data
            chunks, table_off = read_chunk_table_file(
                fh, hdr["off"], hdr["count"], vlr["chunk_size"])
        laz_kind = (2 if vlr["compressor"] == "layered_chunked"
                    else 1)
        for ci, (start, n_pts) in enumerate(chunks):
            end = (chunks[ci + 1][0] if ci + 1 < len(chunks)
                   else table_off)
            tasks.append((fp, start, end, n_pts, hdr["fmt"],
                          hdr["eb"], hdr["size"],
                          *hdr["scale"], *hdr["offset"], laz_kind))

    cols = ", ".join(f"`{c}` {t}" for c, t in _dims(fmt0))
    schema = (cols + ", file_path string") if with_path else cols
    plan = spark.createDataFrame(
        tasks,
        "path string, start long, end long, n_pts long, fmt int, "
        "eb int, psize int, sx double, sy double, sz double, "
        "ox double, oy double, oz double, laz int",
    ).repartition(max(len(tasks), 1))

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for row in pdf.itertuples(index=False):
                hdr_like = {
                    "fmt": int(row.fmt), "eb": int(row.eb),
                    "size": int(row.psize),
                    "scale": (row.sx, row.sy, row.sz),
                    "offset": (row.ox, row.oy, row.oz),
                }
                with open(row.path, "rb") as fh:
                    fh.seek(int(row.start))
                    blob = fh.read(int(row.end) - int(row.start))
                if int(row.laz) == 2:
                    from pdal_spark.sources.lazdec14 import (
                        decompress_chunk14,
                    )

                    rec = decompress_chunk14(
                        blob, 0, int(row.n_pts), int(row.fmt),
                        int(row.eb), int(row.psize))
                elif int(row.laz):
                    rec = decompress_chunk(
                        blob, 0, int(row.n_pts), int(row.fmt),
                        int(row.eb), int(row.psize))
                else:
                    rec = np.frombuffer(
                        blob, dtype=_record_dtype(int(row.fmt),
                                                  int(row.psize)),
                        count=int(row.n_pts))
                out = _arr_to_frame(rec, hdr_like)
                if with_path:
                    out["file_path"] = row.path
                yield out

    return plan.mapInPandas(decode, schema)
