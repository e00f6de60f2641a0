"""readers.e57 analog — ASTM E57 3D imaging files (core subset),
read natively with no external codec.

Derivation: the ASTM E2807 container layout as exercised by the
reference's libE57Format-written fixtures (plugins/e57/io/*,
vendor libE57Format) — behavior, not code:

- physical->logical layer: 1024-byte pages, last 4 bytes per page
  are a CRC-32C checksum (verified here, Castagnoli polynomial,
  table-driven numpy);
- 48-byte header (``ASTM-E57`` signature, versions, physical
  length, XML physical offset/length, page size);
- XML section (xml.etree) describing ``data3D`` scans: prototype
  fields, cartesianBounds, color/intensityLimits, pose, and the
  points CompressedVector (fileOffset + recordCount);
- CompressedVector binary section: 32-byte section header
  (sectionId 1, section length, data/index physical offsets), then
  data packets (type 1): u8 type, u8 flags, u16 logicalLength-1,
  u16 bytestreamCount, per-stream u16 byte counts, streams. Field
  streams concatenate across packets in prototype order;
- per-field decode: Float single/double = raw IEEE LE;
  Integer / ScaledInteger = LSB-first bitfields of
  ceil(log2(max-min+1)) bits, value = min + raw (× scale + offset
  for ScaledInteger).

Reader parity follows plugins/e57/io/Scan.cpp + E57Reader.cpp:
color/intensity/classification rescaled to the PDAL u16/u8 range by
65535/(limitMax-limitMin) from the scan's color/intensityLimits
(factor 1 when limits are absent or degenerate), pose applied as
quaternion rotation + translation (Scan.cpp:168-227), multiple
scans unioned into one view; spherical coordinates and normals
surface as raw pass-through double columns with PDAL's dim names
(Utils.cpp:53-64 — the reference does no conversion either).

Validation: the reference's own E57ReaderTest pins — A4.e57 first
points' exact coordinates/colors, A_B.e57 6-point multi-scan union,
preview dims — plus CRC corruption detection.

Scale shape: one Spark task per scan; planning reads header + XML
only. E57 files pack many scans per file; a glob fans out as
(file, scan) tasks like COPC nodes.
"""

from __future__ import annotations

import struct
import xml.etree.ElementTree as ET
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_NS = "{http://www.astm.org/COMMIT/E57/2010-e57-v1.0}"

# CRC-32C (Castagnoli), table-driven
_CRC32C_POLY = 0x82F63B78


def _crc32c_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, (t >> 1) ^ _CRC32C_POLY, t >> 1)
    return t


_CRC_TAB = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = np.uint32(0xFFFFFFFF)
    tab = _CRC_TAB
    b = np.frombuffer(data, dtype=np.uint8)
    crc_val = int(crc)
    for by in b.tolist():
        crc_val = (crc_val >> 8) ^ int(
            tab[(crc_val ^ by) & 0xFF])
    return crc_val ^ 0xFFFFFFFF


def _check_pages(data: bytes, page: int = 1024) -> None:
    """Verify every complete page's trailing CRC-32C."""
    for start in range(0, len(data) - page + 1, page):
        payload = data[start:start + page - 4]
        # libE57 stores the CRC byte-swapped (CheckedFile.cpp:120
        # "I don't understand why we need to swap bytes here")
        (want,) = struct.unpack_from(">I", data, start + page - 4)
        if crc32c(payload) != want:
            raise ValueError(
                f"readers.e57: page CRC mismatch at offset {start}")


def _logical(data: bytes, phys_off: int, n: int,
             page: int = 1024) -> bytes:
    """Physical offset -> n logical bytes (CRC bytes stripped)."""
    out = bytearray()
    pos = phys_off
    while len(out) < n:
        ps = (pos // page) * page
        ip = pos - ps
        take = min(page - 4 - ip, n - len(out))
        out += data[pos:pos + take]
        pos += take
        if pos - ps >= page - 4:
            pos = ps + page
    return bytes(out)


def _parse_header(data: bytes) -> dict:
    if data[:8] != b"ASTM-E57":
        raise ValueError("readers.e57: bad signature")
    major, minor, phys_len, xml_off, xml_len, page = \
        struct.unpack_from("<IIQQQQ", data, 8)
    if major != 1:
        raise ValueError(f"readers.e57: version {major}.{minor} "
                         "unsupported")
    return {"phys_len": phys_len, "xml_off": xml_off,
            "xml_len": xml_len, "page": page}


def _tag(el) -> str:
    return el.tag.replace(_NS, "")


def _child(el, name):
    c = el.find(_NS + name)
    if c is None:
        c = el.find(name)
    return c


def _fval(el, default=0.0) -> float:
    return float(el.text) if el is not None and el.text else default


def _parse_proto_field(el) -> dict:
    t = el.get("type")
    f = {"name": _tag(el), "type": t}
    if t == "Float":
        f["precision"] = el.get("precision", "double")
    elif t in ("Integer", "ScaledInteger"):
        f["min"] = int(el.get("minimum", "0") or 0)
        f["max"] = int(el.get("maximum", "0") or 0)
        if t == "ScaledInteger":
            f["scale"] = float(el.get("scale", "1") or 1)
            f["offset"] = float(el.get("offset", "0") or 0)
    else:
        raise ValueError(
            f"readers.e57: prototype field {f['name']!r} has "
            f"unsupported type {t!r}")
    return f


def _parse_scan(scan_el) -> dict:
    pts = _child(scan_el, "points")
    if pts is None:
        raise ValueError("readers.e57: scan without points")
    proto = _child(pts, "prototype")
    fields = [_parse_proto_field(c) for c in proto]
    out = {
        "fields": fields,
        "file_offset": int(pts.get("fileOffset")),
        "count": int(pts.get("recordCount")),
        "limits": {},
        "pose": None,
    }
    for lim_name, keys in (
            ("intensityLimits", ("intensity",)),
            ("colorLimits", ("colorRed", "colorGreen", "colorBlue"))):
        lim = _child(scan_el, lim_name)
        if lim is None:
            continue
        for k in keys:
            base = k if k.startswith("color") else k
            mn = _fval(_child(lim, f"{base}Minimum"))
            mx = _fval(_child(lim, f"{base}Maximum"))
            out["limits"][k] = (mn, mx)
    pose = _child(scan_el, "pose")
    if pose is not None:
        rot = _child(pose, "rotation")
        tr = _child(pose, "translation")
        q = ((_fval(_child(rot, "w"), 1.0), _fval(_child(rot, "x")),
              _fval(_child(rot, "y")), _fval(_child(rot, "z")))
             if rot is not None else (1.0, 0.0, 0.0, 0.0))
        t = ((_fval(_child(tr, "x")), _fval(_child(tr, "y")),
              _fval(_child(tr, "z")))
             if tr is not None else (0.0, 0.0, 0.0))
        out["pose"] = {"q": q, "t": t}
    return out


def _parse_xml(data: bytes, hdr: dict) -> list[dict]:
    xml = _logical(data, hdr["xml_off"], hdr["xml_len"],
                   hdr["page"])
    root = ET.fromstring(xml)
    d3 = _child(root, "data3D")
    if d3 is None:
        return []
    return [_parse_scan(s) for s in d3]


def _rot_matrix(q) -> np.ndarray:
    """Scan.cpp:198-216 quaternion -> rotation matrix."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
         2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
         2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x),
         1 - 2 * (x * x + y * y)],
    ])


def _bit_unpack(buf: bytes, num: int, bits: int) -> np.ndarray:
    """num LSB-first bit fields of `bits` width -> uint64 values."""
    if bits == 0:
        return np.zeros(num, dtype=np.uint64)
    if bits > 56:
        raise ValueError(
            f"readers.e57: integer fields wider than 56 bits "
            f"unsupported ({bits})")
    b = np.zeros(((num * bits + 7) // 8) + 8, dtype=np.uint8)
    src = np.frombuffer(buf, dtype=np.uint8)
    b[:min(len(src), len(b))] = src[:len(b)]
    starts = np.arange(num, dtype=np.uint64) * np.uint64(bits)
    byte0 = (starts >> np.uint64(3)).astype(np.int64)
    sh = starts & np.uint64(7)
    acc = np.zeros(num, dtype=np.uint64)
    for k in range(8):
        acc |= b[byte0 + k].astype(np.uint64) << np.uint64(8 * k)
    return (acc >> sh) & np.uint64((1 << bits) - 1)


def _read_section_streams(data: bytes, hdr: dict, scan: dict):
    """All data packets of the scan's CompressedVector section ->
    one concatenated byte stream per prototype field."""
    page = hdr["page"]
    sh = _logical(data, scan["file_offset"], 32, page)
    if sh[0] != 1:
        raise ValueError(
            f"readers.e57: section id {sh[0]} (expected 1 = "
            "compressed vector)")
    (sec_len, data_off, _idx_off) = struct.unpack_from("<QQQ", sh, 8)
    nf = len(scan["fields"])
    streams = [bytearray() for _ in range(nf)]
    pos = data_off
    read_logical = 32  # section header counts toward sectionLength
    while read_logical < sec_len:
        head = _logical(data, pos, 6, page)
        ptype, _flags, plen_m1, nstreams = struct.unpack(
            "<BBHH", head)
        plen = plen_m1 + 1
        pkt = _logical(data, pos, plen, page)
        if ptype == 1:  # data packet
            if nstreams != nf:
                raise ValueError(
                    f"readers.e57: packet has {nstreams} streams, "
                    f"prototype has {nf}")
            counts = struct.unpack_from(f"<{nstreams}H", pkt, 6)
            # streams start right after the counts (Packet.cpp:460
            # streamBase = &bsbLength[bytestreamCount]); padding is
            # only at the END of a packet
            p = 6 + 2 * nstreams
            for i, c in enumerate(counts):
                streams[i] += pkt[p:p + c]
                p += c
        elif ptype == 0:  # index packet: ignored (seek aid only)
            pass
        elif ptype == 2:  # empty packet
            pass
        else:
            raise ValueError(
                f"readers.e57: unknown packet type {ptype}")
        # advance in PHYSICAL space by the logical packet length,
        # accounting for CRC bytes the logical bytes straddle
        adv = 0
        taken = 0
        while taken < plen:
            ps = ((pos + adv) // page) * page
            ip = (pos + adv) - ps
            chunk = min(page - 4 - ip, plen - taken)
            taken += chunk
            adv += chunk
            if (pos + adv) - ps >= page - 4:
                adv += 4
        pos += adv
        read_logical += plen
    return streams


def _decode_scan(data: bytes, hdr: dict, scan: dict) -> dict:
    streams = _read_section_streams(data, hdr, scan)
    n = scan["count"]
    cols = {}
    for f, s in zip(scan["fields"], streams):
        name = f["name"]
        if f["type"] == "Float":
            dt = "<f4" if f.get("precision") == "single" else "<f8"
            v = np.frombuffer(bytes(s), dtype=dt,
                              count=n).astype("f8")
        else:
            bits = max((f["max"] - f["min"]), 0).bit_length()
            raw = _bit_unpack(bytes(s), n, bits).astype("i8")
            v = raw + f["min"]
            if f["type"] == "ScaledInteger":
                v = v * f["scale"] + f["offset"]
        cols[name] = v
    return cols


_PDAL_MAX = {"colorRed": 65535.0, "colorGreen": 65535.0,
             "colorBlue": 65535.0, "intensity": 65535.0,
             "classification": 255.0}
_COLMAP = {"cartesianX": "X", "cartesianY": "Y", "cartesianZ": "Z",
           "intensity": "Intensity", "colorRed": "Red",
           "colorGreen": "Green", "colorBlue": "Blue",
           "classification": "Classification",
           "cartesianInvalidState": "CartesianInvalidState"}
# raw pass-through doubles, PDAL dim names (Utils.cpp:53-64)
_FLOAT_COLS = {"sphericalRange": "SphericalRange",
               "sphericalAzimuth": "SphericalAzimuth",
               "sphericalElevation": "SphericalElevation",
               "normalX": "NormalX", "normalY": "NormalY",
               "normalZ": "NormalZ"}


def _scan_to_frame(cols: dict, scan: dict) -> pd.DataFrame:
    has_cart = all(f"cartesian{a}" in cols for a in "XYZ")
    has_sph = "sphericalRange" in cols
    if not has_cart and not has_sph:
        raise ValueError(
            "readers.e57: scan has neither Cartesian nor spherical "
            "coordinates")
    out = {}
    if has_cart:
        x, y, z = (cols["cartesianX"], cols["cartesianY"],
                   cols["cartesianZ"])
        if scan["pose"] is not None:
            rot = _rot_matrix(scan["pose"]["q"])
            t = scan["pose"]["t"]
            pts = np.stack([x, y, z], axis=1) @ rot.T
            x = pts[:, 0] + t[0]
            y = pts[:, 1] + t[1]
            z = pts[:, 2] + t[2]
        out.update({"X": x, "Y": y, "Z": z})
    for name, v in cols.items():
        # nor:normalX arrives namespaced; match on the local name
        local = name.split(":")[-1].split("}")[-1]
        if local in _FLOAT_COLS:
            out[_FLOAT_COLS[local]] = v.astype("f8")
    for name, v in cols.items():
        if name.startswith("cartesian") and name != \
                "cartesianInvalidState":
            continue
        col = _COLMAP.get(name)
        if col is None:
            continue
        if name in _PDAL_MAX:
            mn, mx = scan["limits"].get(
                name, (None, None))
            if mn is None and name in ("colorRed", "colorGreen",
                                       "colorBlue", "intensity"):
                # limits may come from the prototype field instead
                pass
            factor = 1.0
            if mn is not None and mx is not None and mx > mn:
                factor = _PDAL_MAX[name] / (mx - mn)
            out[col] = np.rint(v * factor).astype("i8")
        else:
            out[col] = v.astype("i8")
    return pd.DataFrame(out)


def e57_quickinfo(path: str) -> dict:
    """Preview analog (E57Reader::preview): dim names, total point
    count, bounds — header + XML reads only."""
    data = open(path, "rb").read()
    hdr = _parse_header(data)
    scans = _parse_xml(data, hdr)
    dims = []
    for s in scans:
        for f in s["fields"]:
            if f["name"] not in dims:
                dims.append(f["name"])
    return {
        "num_scans": len(scans),
        "point_count": sum(s["count"] for s in scans),
        "dimensions": dims,
    }


def _paginate(logical: bytes, page: int = 1024) -> bytes:
    """Logical stream -> physical pages with trailing byte-swapped
    CRC-32C per page (libE57 CheckedFile layout); zero-pad to a
    whole number of pages."""
    pay = page - 4
    n_pages = (len(logical) + pay - 1) // pay
    buf = bytearray(logical) + b"\x00" * (n_pages * pay
                                          - len(logical))
    out = bytearray()
    for i in range(n_pages):
        chunk = bytes(buf[i * pay:(i + 1) * pay])
        out += chunk + struct.pack(">I", crc32c(chunk))
    return bytes(out)


def _phys(logical_off: int, page: int = 1024) -> int:
    """Physical offset of a logical position."""
    return logical_off + (logical_off // (page - 4)) * 4


_W_FIELDS = (  # (column, e57 name, kind)
    ("X", "cartesianX", "double"),
    ("Y", "cartesianY", "double"),
    ("Z", "cartesianZ", "double"),
    ("Intensity", "intensity", "u16"),
    ("Red", "colorRed", "u16"),
    ("Green", "colorGreen", "u16"),
    ("Blue", "colorBlue", "u16"),
    ("Classification", "classification", "u8"),
)


def e57_bytes(pdf: pd.DataFrame, guid: str = "pdal-spark") -> bytes:
    """One complete single-scan E57 file from a DataFrame partition
    (columns: X/Y/Z + optional Intensity/Red/Green/Blue/
    Classification). Doubles raw, integers as full-range Integer
    fields (factor-1 rescale on read)."""
    n = len(pdf)
    if n == 0:
        raise ValueError("writers.e57: empty point set")
    fields = [(c, e, k) for c, e, k in _W_FIELDS
              if c in pdf.columns]
    # encode streams
    streams = []
    for col, _e, kind in fields:
        v = pdf[col].to_numpy()
        if kind == "double":
            streams.append(v.astype("<f8").tobytes())
        elif kind == "u16":
            streams.append(v.astype("<u2").tobytes())
        else:
            streams.append(v.astype("u1").tobytes())
    nf = len(fields)
    rec_bytes = sum(len(s) // n for s in streams)
    per_pkt = max(1, (65520 - 6 - 2 * nf) // rec_bytes)

    packets = bytearray()
    i = 0
    while i < n:
        m = min(per_pkt, n - i)
        parts = []
        counts = []
        for s in streams:
            isz = len(s) // n
            parts.append(s[i * isz:(i + m) * isz])
            counts.append(m * isz)
        body_len = 6 + 2 * nf + sum(counts)
        pad = (4 - body_len % 4) % 4
        packets += struct.pack("<BBHH", 1, 0, body_len + pad - 1,
                               nf)
        packets += struct.pack(f"<{nf}H", *counts)
        for p in parts:
            packets += p
        packets += b"\x00" * pad
        i += m

    sec_len = 32 + len(packets)
    # logical layout: header(48) | section | xml
    sec_log_off = 48
    data_log_off = sec_log_off + 32
    xml_log_off = sec_log_off + sec_len
    section = struct.pack("<B7xQQQ", 1, sec_len,
                          _phys(data_log_off), 0) + bytes(packets)

    def flim(col):
        v = pdf[col].to_numpy(dtype="f8")
        return float(v.min()), float(v.max())

    xb, yb, zb = flim("X"), flim("Y"), flim("Z")
    proto = []
    for col, e57n, kind in fields:
        if kind == "double":
            mn, mx = flim(col)
            proto.append(
                f'<{e57n} type="Float" precision="double" '
                f'minimum="{mn!r}" maximum="{mx!r}"/>')
        else:
            hi = 65535 if kind == "u16" else 255
            proto.append(f'<{e57n} type="Integer" minimum="0" '
                         f'maximum="{hi}"/>')
    lim = ""
    if "Intensity" in pdf.columns:
        lim += ("<intensityLimits type=\"Structure\">"
                "<intensityMinimum type=\"Integer\">0"
                "</intensityMinimum>"
                "<intensityMaximum type=\"Integer\">65535"
                "</intensityMaximum></intensityLimits>")
    if "Red" in pdf.columns:
        lim += "<colorLimits type=\"Structure\">"
        for c in ("Red", "Green", "Blue"):
            lim += (f"<color{c}Minimum type=\"Integer\">0"
                    f"</color{c}Minimum>"
                    f"<color{c}Maximum type=\"Integer\">65535"
                    f"</color{c}Maximum>")
        lim += "</colorLimits>"
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<e57Root type="Structure" '
        'xmlns="http://www.astm.org/COMMIT/E57/2010-e57-v1.0">'
        '<formatName type="String"><![CDATA[ASTM E57 3D Imaging '
        'Data File]]></formatName>'
        f'<guid type="String"><![CDATA[{{{guid}}}]]></guid>'
        '<versionMajor type="Integer">1</versionMajor>'
        '<versionMinor type="Integer"/>'
        '<data3D type="Vector" allowHeterogeneousChildren="1">'
        '<vectorChild type="Structure">'
        f'<guid type="String"><![CDATA[{{{guid}-0}}]]></guid>'
        '<cartesianBounds type="Structure">'
        f'<xMinimum type="Float">{xb[0]!r}</xMinimum>'
        f'<xMaximum type="Float">{xb[1]!r}</xMaximum>'
        f'<yMinimum type="Float">{yb[0]!r}</yMinimum>'
        f'<yMaximum type="Float">{yb[1]!r}</yMaximum>'
        f'<zMinimum type="Float">{zb[0]!r}</zMinimum>'
        f'<zMaximum type="Float">{zb[1]!r}</zMaximum>'
        '</cartesianBounds>' + lim +
        f'<points type="CompressedVector" '
        f'fileOffset="{_phys(sec_log_off)}" recordCount="{n}">'
        '<prototype type="Structure">' + "".join(proto)
        + '</prototype>'
        '<codecs type="Vector" allowHeterogeneousChildren="1"/>'
        '</points></vectorChild></data3D>'
        '<images2D type="Vector" allowHeterogeneousChildren="1"/>'
        '</e57Root>'
    ).encode()

    logical = bytearray(48) + section + xml
    phys_total = len(_paginate(bytes(logical)))
    struct.pack_into("<8sIIQQQQ", logical, 0, b"ASTM-E57", 1, 0,
                     phys_total, _phys(xml_log_off), len(xml), 1024)
    return _paginate(bytes(logical))


def write_e57(df: DataFrame, out_dir: str) -> int:
    """writers.e57 analog: one single-scan .e57 per non-empty
    partition under out_dir (per-partition-file convention).
    Returns files written."""
    import os

    for c in ("X", "Y", "Z"):
        if c not in df.columns:
            raise ValueError(f"writers.e57: missing column {c}")
    os.makedirs(out_dir, exist_ok=True)

    def dump(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = [p for p in it if len(p)]
        if not parts:
            yield pd.DataFrame({
                "file": pd.Series([], dtype=str),
                "rows": pd.Series([], dtype="int64")})
            return
        pdf = pd.concat(parts, ignore_index=True)
        fp = os.path.join(out_dir, f"part-{pid:05d}.e57")
        with open(fp, "wb") as fh:
            fh.write(e57_bytes(pdf, guid=f"pdal-spark-{pid}"))
        yield pd.DataFrame({"file": [fp], "rows": [len(pdf)]})

    res = df.mapInPandas(dump, "file string, rows long").collect()
    return sum(1 for r in res if r["rows"] > 0)


def read_e57(spark: SparkSession, path: str,
             verify_crc: bool = True) -> DataFrame:
    """Read E57 file(s) (file or glob), one Spark task per scan;
    multiple scans union into one frame like the reference's single
    output view."""
    import glob as _glob
    import os

    files = sorted(_glob.glob(path)) if not os.path.isfile(path) \
        else [path]
    if not files:
        raise ValueError(f"readers.e57: no files match {path!r}")

    tasks = []
    all_cols: list[str] = []
    for fp in files:
        data = open(fp, "rb").read()
        hdr = _parse_header(data)
        for si, scan in enumerate(_parse_xml(data, hdr)):
            tasks.append((fp, si))
            probe = _scan_to_frame(
                {f["name"]: np.zeros(0) for f in scan["fields"]},
                {**scan, "pose": None})
            for c in probe.columns:
                if c not in all_cols:
                    all_cols.append(c)
    float_cols = {"X", "Y", "Z"} | set(_FLOAT_COLS.values())
    schema = ", ".join(
        f"`{c}` double" if c in float_cols else f"`{c}` long"
        for c in all_cols)
    if not tasks:
        return spark.createDataFrame([], schema)
    plan = spark.createDataFrame(
        tasks, "path string, scan_idx int").repartition(len(tasks))
    cols_order = list(all_cols)

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for row in pdf.itertuples(index=False):
                data = open(row.path, "rb").read()
                hdr = _parse_header(data)
                if verify_crc:
                    _check_pages(data, hdr["page"])
                scan = _parse_xml(data, hdr)[int(row.scan_idx)]
                frame = _scan_to_frame(
                    _decode_scan(data, hdr, scan), scan)
                for c in cols_order:
                    if c not in frame.columns:
                        frame[c] = np.zeros(
                            len(frame),
                            dtype="f8" if c in float_cols
                            else "i8")
                yield frame[cols_order]

    return plan.mapInPandas(decode, schema)
