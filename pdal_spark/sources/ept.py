"""readers.ept analog — Entwine Point Tile datasets over Spark.

An EPT dataset (entwine.io/entwine-point-tile.html) is a directory:
`ept.json` (cube bounds, point schema, dataType, span),
`ept-hierarchy/<key>.json` pages mapping "d-x-y-z" keys to point
counts (-1 = subtree lives in its own page file), and
`ept-data/<key>.laz|.bin` — one complete file per octree node.

Reference semantics studied at io/EptReader.cpp:186-420 (overlaps
traversal with bounds pruning + resolution -> depth limit) — the
same cube-subdivision pruning as readers.copc, so this module
shares sources.copc's planning shape: the driver walks the JSON
hierarchy (tiny), prunes by query bounds/resolution, and fans out
ONE SPARK TASK PER NODE FILE; node .laz files decode through the
proven LASzip codec (v2 or layered, whatever each file contains)
and `binary` nodes through a schema-driven numpy dtype. zstandard
nodes are rejected loudly (no zstd in this container).

Validation: the reference ships EPT twins of fixtures we already
pin — 1.2-with-color (1065 pts, multiset vs the .las twin) and
lone-star (518862 pts, same data as the COPC fixture, cross-checked
reader-vs-reader).
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pdal_spark.sources.copc import (
    _normalize_polys,
    _rect_intersects_polygon,
    normalize_bounds,
)
from pdal_spark.sources.las import _dims


def read_ept_info(root: str) -> dict:
    with open(os.path.join(root, "ept.json")) as fh:
        info = json.load(fh)
    if info.get("hierarchyType", "json") != "json":
        raise ValueError("readers.ept: only json hierarchyType")
    dt = info.get("dataType")
    if dt not in ("laszip", "binary"):
        raise ValueError(
            f"readers.ept: dataType {dt!r} unsupported (laszip/"
            "binary; zstandard needs the zstd codec)")
    return info


def _key(s: str) -> tuple:
    d, x, y, z = (int(v) for v in s.split("-"))
    return (d, x, y, z)


def _key_bounds(key: tuple, root: list) -> tuple:
    d, x, y, z = key
    minx, miny, minz, maxx, maxy, maxz = root
    cw = (maxx - minx) / (1 << d)
    return (minx + cw * x, miny + cw * y, minz + cw * z,
            minx + cw * (x + 1), miny + cw * (y + 1),
            minz + cw * (z + 1))


def _passes(key: tuple, root: list, depth_end: int,
            bounds: tuple | None) -> bool:
    if depth_end and key[0] >= depth_end:
        return False
    if bounds is None:
        return True
    nb = _key_bounds(key, root)
    qminx, qminy, qminz, qmaxx, qmaxy, qmaxz = bounds
    if nb[3] < qminx or nb[0] > qmaxx:
        return False
    if nb[4] < qminy or nb[1] > qmaxy:
        return False
    if qminz is not None and (nb[5] < qminz or nb[2] > qmaxz):
        return False
    return True


def ept_hierarchy(root_dir: str, info: dict, bounds=None,
                  resolution: float | None = None,
                  polygon=None) -> dict:
    """Walk ept-hierarchy JSON pages with pruning (bounds,
    resolution->depth, and WKT polygon disjoint tests — the
    EptReader.cpp:186-420 overlaps semantics). Returns
    {"nodes": [(key, count)], "visited", "pruned", "depth_end"}."""
    bounds = normalize_bounds(bounds)
    polys = _normalize_polys(polygon)
    cube = info["bounds"]
    span = int(info.get("span", 128))
    # root spacing analog: one cell of the span-grid at depth 0
    spacing = (cube[3] - cube[0]) / span
    depth_end = 0
    if resolution:
        if resolution < 0:
            raise ValueError("readers.ept: resolution < 0")
        depth_end = max(
            1, int(math.ceil(math.log2(spacing / resolution))) + 1)

    hier_dir = os.path.join(root_dir, "ept-hierarchy")

    def load_page(key: tuple) -> dict:
        fp = os.path.join(hier_dir,
                          "-".join(map(str, key)) + ".json")
        with open(fp) as fh:
            return {_key(k): v for k, v in json.load(fh).items()}

    stats = {"visited": 0, "pruned": 0}
    nodes: list = []

    def _passes_all(key: tuple) -> bool:
        if not _passes(key, cube, depth_end, bounds):
            return False
        if polys is None:
            return True
        nb = _key_bounds(key, cube)
        rect = (nb[0], nb[1], nb[3], nb[4])
        return any(_rect_intersects_polygon(rect, rings)
                   for _, rings in polys)

    def walk(page: dict, key: tuple):
        count = page.get(key)
        if count is None:
            return
        stats["visited"] += 1
        if count == -1:
            walk(load_page(key), key)
            return
        if count:
            nodes.append((key, count))
        d, x, y, z = key
        for i in range(8):
            ck = (d + 1, (x << 1) | (i & 1),
                  (y << 1) | ((i >> 1) & 1),
                  (z << 1) | ((i >> 2) & 1))
            if _passes_all(ck):
                walk(page, ck)
            elif ck in page:
                stats["pruned"] += 1

    rootkey = (0, 0, 0, 0)
    if _passes_all(rootkey):
        walk(load_page(rootkey), rootkey)
    return {"nodes": nodes, "visited": stats["visited"],
            "pruned": stats["pruned"], "depth_end": depth_end}


def _schema_dtype(schema: list) -> np.dtype:
    """EPT binary node layout: packed fields in schema order."""
    names, formats = [], []
    for f in schema:
        kind = {"signed": "i", "unsigned": "u", "float": "f"}[
            f["type"]]
        names.append(f["name"])
        formats.append(f"<{kind}{f['size']}")
    return np.dtype({"names": names, "formats": formats})


def _addon_dtype(meta: dict) -> np.dtype:
    kind = {"signed": "i", "unsigned": "u", "float": "f"}[
        meta["type"]]
    return np.dtype(f"<{kind}{meta['size']}")


def read_ept_addon_info(addon_root: str) -> dict:
    """Parse <addon>/ept-addon.json (EptAddonWriter.cpp:264-270:
    type/size/version/dataType)."""
    with open(os.path.join(addon_root, "ept-addon.json")) as fh:
        meta = json.load(fh)
    if meta.get("dataType", "binary") != "binary":
        raise ValueError(
            f"ept-addon: dataType {meta.get('dataType')!r} "
            "unsupported (binary only)")
    return meta


def read_ept(spark: SparkSession, root_dir: str,
             bounds=None, resolution: float | None = None,
             polygon=None,
             with_node_key: bool = False,
             with_point_id: bool = False,
             addons: dict | None = None) -> DataFrame:
    """Read an EPT dataset with node-level pushdown, one task per
    node file. For `laszip` nodes the schema is the node .laz
    header's point format; `bounds` adds the point-level Catalyst
    filter like the reference.

    `with_point_id` adds `node_key` + `point_id` columns (the
    reference EPT reader's nodeId/pointId special dims — the
    coordinates of a point inside the tree, needed to write
    addons). `addons` maps column names to EPT-addon directory
    roots (readers.ept `addons` option, EptReader.cpp:210): each
    node's `<root>/ept-data/<key>.bin` is appended as a typed
    column."""
    info = read_ept_info(root_dir)
    hier = ept_hierarchy(root_dir, info, bounds=bounds,
                         resolution=resolution, polygon=polygon)
    dt = info["dataType"]
    data_dir = os.path.join(root_dir, "ept-data")
    ext = "laz" if dt == "laszip" else "bin"
    tasks = [("-".join(map(str, key)), count)
             for key, count in hier["nodes"]]

    if dt == "laszip":
        import pdal_spark.sources.las as L

        # schema from the first node's LAS header; when pruning
        # removed every node, the root node file still exists on
        # disk — use it so an empty plan returns an empty frame
        # with the correct schema instead of raising (the
        # reference's EptReader returns zero points).
        first_key = tasks[0][0] if tasks else "0-0-0-0"
        first = os.path.join(data_dir, f"{first_key}.{ext}")
        with open(first, "rb") as fh:
            fmt0 = L._parse_las_header(fh.read(65536))["fmt"]
        cols = ", ".join(f"`{c}` {t}" for c, t in _dims(fmt0))
        # EPT appends non-standard schema entries (e.g. OriginId)
        # as LAS extra bytes, in schema order — surface them as
        # typed columns (EptReader registers them the same way)
        std = {c for c, _ in _dims(fmt0)}
        kindmap = {"signed": "int", "unsigned": "uint",
                   "float": ""}
        extra_pairs = []
        for fdef in info["schema"]:
            if fdef["name"] in std:
                continue
            if fdef["type"] == "float":
                t = "float" if fdef["size"] == 4 else "double"
            else:
                t = f"{kindmap[fdef['type']]}{8 * fdef['size']}"
            extra_pairs.append((fdef["name"], t))
        extra_specs = (L.parse_extra_dims(extra_pairs)
                       if extra_pairs else None)
        if extra_specs:
            cols += "".join(f", `{n}` {st}"
                            for n, _, _, st in extra_specs)
    else:
        dtype = _schema_dtype(info["schema"])
        spark_t = {"i": "long", "u": "long", "f": "double"}
        cols = ", ".join(
            f"`{f['name']}` "
            + ("double" if f["name"] in ("X", "Y", "Z")
               else spark_t[{"signed": "i", "unsigned": "u",
                             "float": "f"}[f["type"]]])
            for f in info["schema"])
    if with_point_id and not with_node_key:
        with_node_key = True
    if with_node_key:
        cols += ", node_key string"
    if with_point_id:
        cols += ", point_id long"
    addon_metas = {}
    if addons:
        spark_t2 = {"i": "long", "u": "long", "f": "double"}
        for col_name, aroot in addons.items():
            meta = read_ept_addon_info(aroot)
            addon_metas[col_name] = (aroot, meta)
            kind = {"signed": "i", "unsigned": "u",
                    "float": "f"}[meta["type"]]
            cols += f", `{col_name}` {spark_t2[kind]}"
    schema_str = cols
    if not tasks:
        return spark.createDataFrame([], schema_str)

    if dt != "laszip":
        extra_specs = None
    plan = spark.createDataFrame(
        tasks, "node_key string, n_pts long").repartition(len(tasks))
    scales = {f["name"]: (f.get("scale", 1.0), f.get("offset", 0.0))
              for f in info["schema"]}
    ept_schema = info["schema"]

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pdal_spark.sources.las as L

        for pdf in it:
            for row in pdf.itertuples(index=False):
                fp = os.path.join(data_dir, f"{row.node_key}.{ext}")
                with open(fp, "rb") as fh:
                    blob = fh.read()
                if dt == "laszip":
                    hdr = L._parse_las_header(blob)
                    if extra_specs:
                        arr = L._decode_las_arr(blob, hdr)
                        out = L._arr_to_frame(arr, hdr)
                        out = L._append_extra_dims(
                            out, arr, hdr, extra_specs)
                    else:
                        out = L._decode_las(blob, hdr)
                else:
                    dtype = _schema_dtype(ept_schema)
                    arr = np.frombuffer(blob, dtype=dtype,
                                        count=int(row.n_pts))
                    data = {}
                    for f in ept_schema:
                        name = f["name"]
                        v = arr[name]
                        if name in ("X", "Y", "Z"):
                            s, o = scales[name]
                            data[name] = v * s + o
                        else:
                            data[name] = v.astype(
                                "f8" if f["type"] == "float"
                                else "i8")
                    out = pd.DataFrame(data)
                if with_node_key:
                    out["node_key"] = row.node_key
                if with_point_id:
                    out["point_id"] = np.arange(len(out),
                                                dtype="int64")
                for col_name, (aroot, meta) in addon_metas.items():
                    ap = os.path.join(aroot, "ept-data",
                                      f"{row.node_key}.bin")
                    av = np.frombuffer(
                        open(ap, "rb").read(),
                        dtype=_addon_dtype(meta),
                        count=len(out))
                    out[col_name] = av.astype(
                        "f8" if meta["type"] == "float" else "i8")
                yield out

    df = plan.mapInPandas(decode, schema_str)
    nb = normalize_bounds(bounds)
    if nb is not None:
        df = df.filter(
            (df.X >= nb[0]) & (df.X <= nb[3])
            & (df.Y >= nb[1]) & (df.Y <= nb[4]))
        if nb[2] is not None:
            df = df.filter((df.Z >= nb[2]) & (df.Z <= nb[5]))
    if polygon is not None:
        from pdal_spark.operators.crop import crop_polygons

        polys2 = ([polygon] if isinstance(polygon, str)
                  else list(polygon))
        df = crop_polygons(df, polys2, x="X", y="Y",
                           emit_geom_id=False)
    return df


_EPT_TYPES = {  # spark simple type name -> (ept type, size)
    "long": ("signed", 8), "bigint": ("signed", 8),
    "int": ("signed", 4), "integer": ("signed", 4),
    "smallint": ("signed", 2), "double": ("float", 8),
    "float": ("float", 4),
}


def write_ept_addon(df: DataFrame, root_dir: str, addon_root: str,
                    column: str, ept_type: str | None = None,
                    size: int | None = None) -> int:
    """writers.ept_addon analog (io/EptAddonWriter.cpp): write one
    dimension as an EPT addon over an existing EPT dataset —
    per-node `<addon>/ept-data/<key>.bin` values in node point
    order, an addon hierarchy page, and `ept-addon.json` metadata
    (type/size/version/dataType, EptAddonWriter.cpp:264-270).

    `df` must carry `node_key` + `point_id` columns (read the
    source with ``read_ept(..., with_point_id=True)`` — the analog
    of the reference's "Cannot use writers.ept_addon without
    reading using readers.ept" requirement) plus `column`. Points
    absent from `df` (filtered out upstream) are written as zeros,
    exactly like the reference's pre-zeroed per-node buffers
    (EptAddonWriter.cpp:198-206). Returns nodes written.

    Scale shape: one shuffle on node_key, then one task per node
    writing its own .bin — no driver data movement."""
    for c in ("node_key", "point_id", column):
        if c not in df.columns:
            raise ValueError(
                "writers.ept_addon: df needs node_key/point_id "
                f"(read_ept(with_point_id=True)) and {column!r}; "
                f"missing {c!r}")
    if ept_type is None:
        stype = dict(df.dtypes)[column]
        ept_type, size = _EPT_TYPES.get(stype, ("float", 8))
    elif size is None:
        size = 8
    np_dt = np.dtype(
        "<" + {"signed": "i", "unsigned": "u",
               "float": "f"}[ept_type] + str(size))

    info = read_ept_info(root_dir)
    hier = ept_hierarchy(root_dir, info)  # full tree, no pruning
    counts = {"-".join(map(str, k)): int(c)
              for k, c in hier["nodes"]}

    data_dir = os.path.join(addon_root, "ept-data")
    hier_dir = os.path.join(addon_root, "ept-hierarchy")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(hier_dir, exist_ok=True)

    sub = df.select("node_key", "point_id", column) \
        .repartition("node_key")

    def dump(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({"node_key": pd.Series([], str),
                                 "written": pd.Series([], "int64")})
        key = pdf["node_key"].iloc[0]
        n = counts.get(key)
        if n is None:
            raise ValueError(
                f"writers.ept_addon: node {key} not in the EPT "
                "hierarchy")
        buf = np.zeros(n, dtype=np_dt)
        pid = pdf["point_id"].to_numpy("int64")
        buf[pid] = pdf[column].to_numpy()
        with open(os.path.join(data_dir, f"{key}.bin"), "wb") as fh:
            fh.write(buf.tobytes())
        return pd.DataFrame({"node_key": [key],
                             "written": [len(pdf)]})

    done = sub.groupBy("node_key").applyInPandas(
        dump, "node_key string, written long").collect()
    written_keys = {r["node_key"] for r in done}
    # nodes the frame never touched still get (all-zero) files so
    # any conforming reader finds every node
    for key, n in counts.items():
        if key not in written_keys:
            with open(os.path.join(data_dir, f"{key}.bin"),
                      "wb") as fh:
                fh.write(np.zeros(n, dtype=np_dt).tobytes())

    # single-page addon hierarchy + top-level metadata
    with open(os.path.join(hier_dir, "0-0-0-0.json"), "w") as fh:
        json.dump(counts, fh)
    with open(os.path.join(addon_root, "ept-addon.json"),
              "w") as fh:
        json.dump({"type": ept_type, "size": size,
                   "version": "1.0.0", "dataType": "binary"}, fh)
    return len(counts)
