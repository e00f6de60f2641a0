"""NTv2 horizontal datum-shift grids (+proj=hgridshift /
+nadgrids=...) — the missing piece of filters.reprojection for
real-world datum changes (NAD27<->NAD83, OSGB36<->ETRS89 via OSTN,
AGD66->GDA94, ...). ReprojectionFilter.cpp:199 gets this from PROJ;
this module implements the same grid semantics natively:

- `.gsb` (National Transformation v2) binary format: 11-record
  overview header, per-subgrid headers (S_LAT/N_LAT/E_LONG/W_LONG/
  LAT_INC/LONG_INC/GS_COUNT, seconds of arc, longitudes positive
  WEST), nodes as 4x float32 (lat shift, lon shift, accuracies) in
  row-major order south->north and east->west (increasing
  positive-west longitude). The format is public (Natural Resources
  Canada, "NTv2 Developer's Guide"); PROJ reads the same layout.
- Bilinear interpolation inside the densest subgrid containing the
  point (NTv2 parent/child selection), shifts in arcseconds:
  forward applies lat += dlat/3600, lon -= dlon/3600 (dlon stored
  positive west, east-positive output); inverse is the standard
  fixed-point iteration (PROJ applies 4 rounds).
- Points outside every subgrid pass through unchanged (PROJ's
  behavior for optional `@grid` references).

Execution shape: the grid arrays are a Spark broadcast; the lookup
is a vectorized numpy kernel inside mapInPandas — identical to the
colorization raster-lookup layout (operators/raster.py), so a
100 TB table pays one broadcast + an embarrassingly parallel
per-batch interpolation, no shuffle.

Validation (tests/test_datumshift.py): bilinear reproduces LINEAR
analytic shift fields exactly at off-node points (writer-independent
algebraic pin), sign conventions pinned by single-cell grids,
forward∘inverse identity <1e-12 deg, densest-subgrid selection, and
a round-trip through the .gsb writer/parser byte layout.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def write_ntv2(path: str, subgrids: list[dict]) -> None:
    """Write a .gsb file. Each subgrid dict: {name, parent,
    s_lat, n_lat, e_long, w_long, lat_inc, long_inc (arcsec,
    longitudes positive WEST), dlat, dlon (2-D arrays [row=lat from
    south][col=lon from east], arcseconds)}."""
    def rec(name: str, value: bytes) -> bytes:
        return name.encode().ljust(8)[:8] + value

    def srec(name: str, s: str) -> bytes:
        return rec(name, s.encode().ljust(8)[:8])

    def irec(name: str, v: int) -> bytes:
        return rec(name, struct.pack("<i", v) + b"\x00" * 4)

    def drec(name: str, v: float) -> bytes:
        return rec(name, struct.pack("<d", v))

    out = bytearray()
    out += irec("NUM_OREC", 11)
    out += irec("NUM_SREC", 11)
    out += irec("NUM_FILE", len(subgrids))
    out += srec("GS_TYPE", "SECONDS")
    out += srec("VERSION", "NTv2.0")
    out += srec("SYSTEM_F", "NAD27")
    out += srec("SYSTEM_T", "NAD83")
    out += drec("MAJOR_F", 6378206.4)
    out += drec("MINOR_F", 6356583.8)
    out += drec("MAJOR_T", 6378137.0)
    out += drec("MINOR_T", 6356752.314)
    for g in subgrids:
        dlat = np.asarray(g["dlat"], dtype="<f4")
        dlon = np.asarray(g["dlon"], dtype="<f4")
        nrow, ncol = dlat.shape
        out += srec("SUB_NAME", g["name"])
        out += srec("PARENT", g.get("parent", "NONE"))
        out += srec("CREATED", "pdal_spk")
        out += srec("UPDATED", "pdal_spk")
        out += drec("S_LAT", g["s_lat"])
        out += drec("N_LAT", g["n_lat"])
        out += drec("E_LONG", g["e_long"])
        out += drec("W_LONG", g["w_long"])
        out += drec("LAT_INC", g["lat_inc"])
        out += drec("LONG_INC", g["long_inc"])
        out += irec("GS_COUNT", nrow * ncol)
        node = np.zeros((nrow * ncol, 4), dtype="<f4")
        node[:, 0] = dlat.reshape(-1)
        node[:, 1] = dlon.reshape(-1)
        out += node.tobytes()
    out += "END".encode().ljust(8) + b"\x00" * 8
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def read_ntv2(path: str) -> list[dict]:
    """Parse a .gsb into subgrid dicts (shifts as float64 arrays,
    arcseconds; geometry in arcseconds, longitudes positive west)."""
    data = open(path, "rb").read()

    def sval(pos):
        return data[pos + 8:pos + 16].decode("latin1").strip()

    def ival(pos):
        return struct.unpack_from("<i", data, pos + 8)[0]

    def dval(pos):
        return struct.unpack_from("<d", data, pos + 8)[0]

    if data[:8].decode("latin1").strip() != "NUM_OREC":
        raise ValueError("ntv2: not a .gsb file (missing NUM_OREC)")
    num_orec = ival(0)
    num_file = None
    pos = 0
    for i in range(num_orec):
        name = data[pos:pos + 8].decode("latin1").strip()
        if name == "NUM_FILE":
            num_file = ival(pos)
        pos += 16
    if num_file is None:
        raise ValueError("ntv2: missing NUM_FILE record")
    grids = []
    for _ in range(num_file):
        hdr = {}
        for _ in range(11):
            name = data[pos:pos + 8].decode("latin1").strip()
            if name in ("S_LAT", "N_LAT", "E_LONG", "W_LONG",
                        "LAT_INC", "LONG_INC"):
                hdr[name] = dval(pos)
            elif name == "GS_COUNT":
                hdr[name] = ival(pos)
            elif name in ("SUB_NAME", "PARENT"):
                hdr[name] = sval(pos)
            pos += 16
        count = hdr["GS_COUNT"]
        nodes = np.frombuffer(data, dtype="<f4", count=4 * count,
                              offset=pos).reshape(count, 4)
        pos += 16 * count
        ncol = int(round(
            (hdr["W_LONG"] - hdr["E_LONG"]) / hdr["LONG_INC"])) + 1
        nrow = int(round(
            (hdr["N_LAT"] - hdr["S_LAT"]) / hdr["LAT_INC"])) + 1
        if nrow * ncol != count:
            raise ValueError(
                f"ntv2: subgrid {hdr.get('SUB_NAME')}: GS_COUNT "
                f"{count} != {nrow}x{ncol}")
        grids.append({
            "name": hdr.get("SUB_NAME", ""),
            "parent": hdr.get("PARENT", "NONE"),
            "s_lat": hdr["S_LAT"], "n_lat": hdr["N_LAT"],
            "e_long": hdr["E_LONG"], "w_long": hdr["W_LONG"],
            "lat_inc": hdr["LAT_INC"], "long_inc": hdr["LONG_INC"],
            "dlat": nodes[:, 0].astype("f8").reshape(nrow, ncol),
            "dlon": nodes[:, 1].astype("f8").reshape(nrow, ncol),
        })
    return grids


def _interp_shifts(grids: list[dict], lon_deg: np.ndarray,
                   lat_deg: np.ndarray) -> tuple:
    """Bilinear (dlat, dlon) arcsec at east-positive lon / lat
    degrees; NaN outside every subgrid. Densest containing subgrid
    wins (NTv2 child-over-parent rule)."""
    lat_s = lat_deg * 3600.0
    lon_w = -lon_deg * 3600.0  # NTv2 longitudes positive WEST
    dlat = np.full(lat_s.shape, np.nan)
    dlon = np.full(lat_s.shape, np.nan)
    density = np.full(lat_s.shape, np.inf)
    for g in grids:
        inside = ((lat_s >= g["s_lat"]) & (lat_s <= g["n_lat"])
                  & (lon_w >= g["e_long"]) & (lon_w <= g["w_long"])
                  & (g["lat_inc"] < density))
        if not inside.any():
            continue
        la = lat_s[inside]
        lo = lon_w[inside]
        fi = (la - g["s_lat"]) / g["lat_inc"]
        fj = (lo - g["e_long"]) / g["long_inc"]
        nrow, ncol = g["dlat"].shape
        i0 = np.clip(np.floor(fi).astype(np.int64), 0, nrow - 2)
        j0 = np.clip(np.floor(fj).astype(np.int64), 0, ncol - 2)
        wi = fi - i0
        wj = fj - j0
        for tgt, arr in ((dlat, g["dlat"]), (dlon, g["dlon"])):
            v = (arr[i0, j0] * (1 - wi) * (1 - wj)
                 + arr[i0, j0 + 1] * (1 - wi) * wj
                 + arr[i0 + 1, j0] * wi * (1 - wj)
                 + arr[i0 + 1, j0 + 1] * wi * wj)
            tgt[inside] = v
        density[inside] = g["lat_inc"]
    return dlat, dlon


def apply_shift_arrays(grids: list[dict], lon: np.ndarray,
                       lat: np.ndarray,
                       inverse: bool = False) -> tuple:
    """Pure-numpy kernel: returns shifted (lon, lat) degrees.
    Forward = source->target (lat += dlat/3600, lon -= dlon/3600,
    dlon positive west); inverse = 4 fixed-point rounds like PROJ.
    Points outside every subgrid pass through unchanged."""
    if not inverse:
        dlat, dlon = _interp_shifts(grids, lon, lat)
        ok = ~np.isnan(dlat)
        lon2 = lon.copy()
        lat2 = lat.copy()
        lon2[ok] = lon[ok] - dlon[ok] / 3600.0
        lat2[ok] = lat[ok] + dlat[ok] / 3600.0
        return lon2, lat2
    cl, ca = lon.copy(), lat.copy()
    for _ in range(4):
        dlat, dlon = _interp_shifts(grids, cl, ca)
        bad = np.isnan(dlat)
        dlat[bad] = 0.0
        dlon[bad] = 0.0
        cl = lon + dlon / 3600.0
        ca = lat - dlat / 3600.0
    return cl, ca


def hgridshift(df: DataFrame, grid_path: str, inverse: bool = False,
               lon: str = "lon", lat: str = "lat") -> DataFrame:
    """+proj=hgridshift +grids=<file.gsb> over DataFrame columns.
    The parsed grid is closed over and shipped once per executor
    with the task closure (broadcast shape); per batch the kernel is
    vectorized numpy — no shuffle, no per-row Python."""
    grids = read_ntv2(grid_path)
    schema = df.schema
    names = [f.name for f in schema.fields]

    def shift(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lo = pdf[lon].to_numpy("f8")
            la = pdf[lat].to_numpy("f8")
            lo2, la2 = apply_shift_arrays(grids, lo, la,
                                          inverse=inverse)
            out = pdf.copy()
            out[lon] = lo2
            out[lat] = la2
            yield out[names]

    return df.mapInPandas(shift, schema)
