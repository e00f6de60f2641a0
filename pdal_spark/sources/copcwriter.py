"""writers.copc analog — emit Cloud-Optimized Point Cloud files.

Reference semantics: io/CopcWriter.cpp:200-520 (octree cube from
the data bounds, per-node layered LAZ chunks, copc info VLR first,
hierarchy EVLR) and the public copc.io spec. Spark-first shape:
follows the repo's per-partition-file writer convention (one
complete .copc.laz per non-empty partition, like writers.las) — a
COPC *dataset* is a directory of tiles plus a tindex, which is how
a 100 TB export actually ships; pre-partition by a spatial key
(qcell/h3) so each tile is spatially tight.

Octree build (driver-free, inside each task, pure numpy): the root
cube is the bounds cube; each node keeps a voxel-grid sample
(128^3 cells per node, first point per cell — spacing halves per
level exactly as the spec describes) and routes the remainder to
its 8 children until a node fits `capacity` whole. Every node's
points become ONE layered LAZ chunk (sources.lazenc14 — encoder
proven byte-identical to lazperf streams on the reference COPC
fixtures), so our own readers.copc (sources.copc) can prune and
decode the output, as can any conforming COPC reader.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from pdal_spark.sources.las import (
    _BASE,
    _dims,
    _infer_pdrf,
    _record_dtype,
)
from pdal_spark.sources.lazenc import _Encoder, _IntCompressor
from pdal_spark.sources.lazenc14 import compress_chunk14

_GRID = 128  # per-node sampling grid (spacing = cube/128 at root)


def _laszip_vlr14(fmt: int, eb: int,
                  chunk_size: int = 0xFFFFFFFF) -> bytes:
    """laszip VLR for compressor 3 (layered); chunk_size 0xFFFFFFFF
    = variable (COPC), else fixed-size chunks."""
    items = [(10, 30, 3)]  # POINT14 v3
    if fmt == 7:
        items.append((11, 6, 3))   # RGB14 v3
    if fmt == 8:
        items.append((12, 8, 3))   # RGBNIR14 v3
    if eb:
        items.append((14, eb, 3))  # BYTE14 v3
    payload = struct.pack(
        "<HHBBHIIqqH", 3, 0, 3, 4, 3, 0, chunk_size, -1, -1,
        len(items))
    for t, sz, ver in items:
        payload += struct.pack("<HHH", t, sz, ver)
    return struct.pack(
        "<H16sHH32s", 0, b"laszip encoded", 22204, len(payload),
        b"pdal_spark lazenc14") + payload


def compress_las_bytes14(las: bytes,
                         chunk_size: int = 50000) -> bytes:
    """Uncompressed LAS 1.4 (formats 6-8) byte blob -> its layered
    .laz twin (compressor 3, v3 items, fixed-size chunks) — the
    1.4 counterpart of sources.lazenc.compress_las_bytes."""
    from pdal_spark.sources.las import _parse_las_header

    hdr = _parse_las_header(las)
    fmt = hdr["fmt"]
    if fmt < 6:
        raise ValueError(
            f"lazenc14: point format {fmt} uses the pointwise "
            "compressor (sources.lazenc), not the layered one")
    count = hdr["count"]
    eb = hdr["eb"]
    rec = np.frombuffer(las, dtype=_record_dtype(fmt, hdr["size"]),
                        count=count, offset=hdr["off"])

    chunks = []
    i = 0
    while i < count:
        n_pts = min(chunk_size, count - i)
        chunks.append(compress_chunk14(
            np.ascontiguousarray(rec[i:i + n_pts]), fmt, eb))
        i += n_pts

    vlr = _laszip_vlr14(fmt, eb, chunk_size)
    (hdr_size,) = struct.unpack_from("<H", las, 94)
    (point_off, vlr_count) = struct.unpack_from("<II", las, 96)
    head = bytearray(las[:hdr_size])
    head[104] |= 0x80
    between = las[hdr_size:point_off]
    new_point_off = hdr_size + len(vlr) + len(between)
    struct.pack_into("<II", head, 96, new_point_off, vlr_count + 1)

    body = b"".join(chunks)
    chunk_table_off = new_point_off + 8 + len(body)
    enc = _Encoder()
    ic = _IntCompressor(32, 2)
    prev = 0
    for ch in chunks:
        ic.compress(enc, prev, len(ch), 1)
        prev = len(ch)
    table = struct.pack("<II", 0, len(chunks)) + enc.done()
    return (bytes(head) + vlr + between
            + struct.pack("<q", chunk_table_off) + body + table)


def _copc_info_vlr(center, halfsize, spacing, hier_off,
                   hier_size, gps_min, gps_max) -> bytes:
    payload = struct.pack(
        "<5dQQdd", center[0], center[1], center[2], halfsize,
        spacing, hier_off, hier_size, gps_min, gps_max)
    payload += b"\x00" * (11 * 8)  # reserved
    return struct.pack(
        "<H16sHH32s", 0, b"copc", 1, len(payload),
        b"pdal_spark copc info") + payload


def build_octree(xi: np.ndarray, yi: np.ndarray, zi: np.ndarray,
                 capacity: int = 65536, max_depth: int = 20):
    """Assign points to octree nodes: node keeps a voxel-grid
    sample, children get the remainder. Input: integer (scaled)
    coordinates. Returns ([(key, idx_array)], cube_min, cube_size)
    with keys (d, x, y, z) in traversal order."""
    n = len(xi)
    mn = np.array([xi.min(), yi.min(), zi.min()], dtype=np.float64)
    mx = np.array([xi.max(), yi.max(), zi.max()], dtype=np.float64)
    size = float(max(mx - mn)) or 1.0
    nodes = []
    stack = [((0, 0, 0, 0), np.arange(n))]
    while stack:
        key, idx = stack.pop()
        d, kx, ky, kz = key
        if len(idx) <= capacity or d >= max_depth:
            nodes.append((key, idx))
            continue
        cw = size / (1 << d)
        ox = mn[0] + kx * cw
        oy = mn[1] + ky * cw
        oz = mn[2] + kz * cw
        # voxel-grid sample: first point per 128^3 cell
        vs = cw / _GRID
        vx = np.minimum(((xi[idx] - ox) / vs).astype(np.int64),
                        _GRID - 1)
        vy = np.minimum(((yi[idx] - oy) / vs).astype(np.int64),
                        _GRID - 1)
        vz = np.minimum(((zi[idx] - oz) / vs).astype(np.int64),
                        _GRID - 1)
        vid = (vx * _GRID + vy) * _GRID + vz
        _, first = np.unique(vid, return_index=True)
        keep = np.zeros(len(idx), dtype=bool)
        keep[first] = True
        nodes.append((key, idx[keep]))
        rest = idx[~keep]
        if len(rest) == 0:
            continue
        half = cw / 2.0
        ocx = ((xi[rest] - ox) >= half).astype(np.int64)
        ocy = ((yi[rest] - oy) >= half).astype(np.int64)
        ocz = ((zi[rest] - oz) >= half).astype(np.int64)
        oct_id = ocx | (ocy << 1) | (ocz << 2)
        for o in range(8):
            sub = rest[oct_id == o]
            if len(sub):
                stack.append(((d + 1, (kx << 1) | (o & 1),
                               (ky << 1) | ((o >> 1) & 1),
                               (kz << 1) | ((o >> 2) & 1)), sub))
    return nodes, mn, size


def copc_bytes(rec: np.ndarray, fmt: int, scale, offset,
               capacity: int = 65536) -> bytes:
    """One complete COPC file from a record array in the
    _record_dtype(fmt) layout (fmt 6-8). Layout: LAS 1.4 header,
    copc info VLR (first, per spec), laszip VLR, chunk-table offset
    + per-node layered chunks, chunk table, hierarchy EVLR."""
    if fmt < 6:
        raise ValueError("writers.copc: COPC requires point "
                         "formats 6-8 (LAS 1.4)")
    eb = rec.dtype.itemsize - _BASE[fmt]
    n = len(rec)
    if n == 0:
        raise ValueError("writers.copc: empty point set")
    sx, sy, sz = scale
    ox, oy, oz = offset

    xi = rec["X"].astype(np.float64)
    yi = rec["Y"].astype(np.float64)
    zi = rec["Z"].astype(np.float64)
    # Build the octree in WORLD units so the declared root cube is
    # a true cube on every axis even with anisotropic scale (e.g.
    # (0.01, 0.01, 0.001)); with isotropic scale the cell
    # assignment is identical (pure affine rescale of all ratios).
    nodes, mn, size = build_octree(
        xi * sx + ox, yi * sy + oy, zi * sz + oz,
        capacity=capacity)

    # compress each node's points as one layered chunk
    chunks = []
    entries = []  # (key, size, count) — offsets assigned later
    for key, idx in nodes:
        sub = np.ascontiguousarray(rec[np.sort(idx)])
        blob = compress_chunk14(sub, fmt, eb)
        chunks.append(blob)
        entries.append((key, len(blob), len(idx)))

    hdr_size = 375
    info_vlr_len = 54 + 160
    laszip_vlr = _laszip_vlr14(fmt, eb)
    point_off = hdr_size + info_vlr_len + len(laszip_vlr)
    first_chunk = point_off + 8
    body = b"".join(chunks)
    chunk_table_off = first_chunk + len(body)

    # variable-size chunk table: counts (ctx 0) + sizes (ctx 1)
    enc = _Encoder()
    ic = _IntCompressor(32, 2)
    prev_count = 0
    prev_size = 0
    for _, csize, ccount in entries:
        ic.compress(enc, prev_count, ccount, 0)
        prev_count = ccount
        ic.compress(enc, prev_size, csize, 1)
        prev_size = csize
    table = struct.pack("<II", 0, len(chunks)) + enc.done()

    evlr_start = chunk_table_off + len(table)
    # hierarchy payload: one page, 32-byte entries, absolute chunk
    # offsets
    off = first_chunk
    page = bytearray()
    for (key, csize, ccount), blob in zip(entries, chunks):
        d, kx, ky, kz = key
        page += struct.pack("<iiiiQii", d, kx, ky, kz, off, csize,
                            ccount)
        off += csize
    evlr = struct.pack(
        "<H16sHQ32s", 0, b"copc", 1000, len(page),
        b"EPT hierarchy") + bytes(page)
    root_hier_off = evlr_start + 60

    gps = rec["gps"]
    # mn/size are already in world units (octree built above in
    # world space), so halfsize/spacing are scale-consistent on
    # all axes.
    info = _copc_info_vlr(
        (mn[0] + size / 2, mn[1] + size / 2, mn[2] + size / 2),
        size / 2, size / _GRID,
        root_hier_off, len(page),
        float(gps.min()), float(gps.max()))

    # LAS 1.4 header
    ret = (rec["returns"] & 15).astype("i8")
    by_return = np.bincount(np.clip(ret, 0, 15), minlength=16)
    buf = bytearray(hdr_size)
    struct.pack_into("<4s", buf, 0, b"LASF")
    struct.pack_into("<HH", buf, 4, 0, 0x10)
    struct.pack_into("<BB", buf, 24, 1, 4)
    struct.pack_into("<32s32s", buf, 26, b"PDAL", b"pdal_spark")
    struct.pack_into("<HH", buf, 90, 1, 2026)
    struct.pack_into("<H", buf, 94, hdr_size)
    struct.pack_into("<II", buf, 96, point_off, 2)
    struct.pack_into("<BH", buf, 104, fmt | 0x80,
                     _BASE[fmt] + eb)
    struct.pack_into("<I", buf, 107, 0)  # legacy count (1.4)
    struct.pack_into("<3d", buf, 131, sx, sy, sz)
    struct.pack_into("<3d", buf, 155, ox, oy, oz)
    struct.pack_into("<6d", buf, 179,
                     float(xi.max()) * sx + ox,
                     float(xi.min()) * sx + ox,
                     float(yi.max()) * sy + oy,
                     float(yi.min()) * sy + oy,
                     float(zi.max()) * sz + oz,
                     float(zi.min()) * sz + oz)
    struct.pack_into("<Q", buf, 227, 0)
    struct.pack_into("<QI", buf, 235, evlr_start, 1)
    struct.pack_into("<Q", buf, 247, n)
    struct.pack_into("<15Q", buf, 255,
                     *(int(by_return[i]) for i in range(1, 16)))

    return (bytes(buf) + info + laszip_vlr
            + struct.pack("<q", chunk_table_off) + body + table
            + evlr)


def write_copc(df: DataFrame, out_dir: str, pdrf: int | None = None,
               scale=(0.01, 0.01, 0.01), offset=(0.0, 0.0, 0.0),
               capacity: int = 65536) -> int:
    """writers.copc analog: one complete .copc.laz per non-empty
    partition under `out_dir` (per-partition-file convention; see
    module docstring). Returns files written."""
    import os

    cols = set(df.columns)
    for c in ("X", "Y", "Z"):
        if c not in cols:
            raise ValueError(f"writers.copc: missing column {c}")
    fmt = _infer_pdrf(cols) if pdrf is None else int(pdrf)
    if fmt < 6:
        fmt = {0: 6, 1: 6, 2: 7, 3: 7}.get(fmt, 6)
    os.makedirs(out_dir, exist_ok=True)
    keep = [c for c, _ in _dims(fmt) if c in cols]
    cap = int(capacity)

    def dump(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        from pdal_spark.sources.las import _pack_las

        pid = TaskContext.get().partitionId()
        parts = [pdf for pdf in it if len(pdf)]
        if not parts:
            yield pd.DataFrame({"file": pd.Series([], dtype=str),
                                "rows": pd.Series([], dtype="int64")})
            return
        pdf = pd.concat(parts, ignore_index=True)
        # reuse the proven record packer: header + records, then
        # take the record array back out
        blob = _pack_las(pdf, fmt, scale, offset, 4)
        rec = np.frombuffer(
            blob, dtype=_record_dtype(fmt, _BASE[fmt]),
            count=len(pdf), offset=375)
        data = copc_bytes(rec, fmt, scale, offset, capacity=cap)
        fp = os.path.join(out_dir, f"part-{pid:05d}.copc.laz")
        with open(fp, "wb") as fh:
            fh.write(data)
        yield pd.DataFrame({"file": [fp], "rows": [len(pdf)]})

    return int(df.select(keep).mapInPandas(
        dump, "file string, rows long").where("rows > 0").count())
