"""Minimal WKT parsing/formatting (POINT / POLYGON, 2D/3D).

The reference links GEOS/GDAL for geometry IO; this engine only needs
polygon vertex rings and points for its crop/overlay/geomdistance
operators, so a dependency-free parser is used. Ring orientation is
preserved; holes (additional rings) are supported.
"""

from __future__ import annotations

import re

import numpy as np

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def parse_point(wkt: str) -> tuple[float, ...]:
    m = re.match(rf"\s*POINT\s*\(\s*({_NUM})\s+({_NUM})(?:\s+({_NUM}))?\s*\)",
                 wkt, re.I)
    if not m:
        raise ValueError(f"bad POINT wkt: {wkt!r}")
    g = [float(v) for v in m.groups() if v is not None]
    return tuple(g)


def parse_polygon(wkt: str) -> list[np.ndarray]:
    """Return list of rings; each ring is an (n, 2) float64 array.

    First ring = shell, rest = holes. Closing vertex is dropped if it
    repeats the first.
    """
    m = re.match(r"\s*POLYGON\s*\((.*)\)\s*$", wkt.strip(), re.I | re.S)
    if not m:
        raise ValueError(f"bad POLYGON wkt: {wkt!r}")
    rings = []
    for ring_txt in re.findall(r"\(([^()]*)\)", m.group(1)):
        pts = []
        for pair in ring_txt.split(","):
            nums = pair.split()
            pts.append((float(nums[0]), float(nums[1])))
        arr = np.asarray(pts, dtype=np.float64)
        if len(arr) > 1 and np.array_equal(arr[0], arr[-1]):
            arr = arr[:-1]
        rings.append(arr)
    if not rings:
        raise ValueError(f"empty POLYGON wkt: {wkt!r}")
    return rings


def polygon_wkt(rings: list[np.ndarray]) -> str:
    parts = []
    for r in rings:
        pts = ", ".join(f"{x:.9f} {y:.9f}" for x, y in r)
        first = f"{r[0][0]:.9f} {r[0][1]:.9f}"
        parts.append(f"({pts}, {first})")
    return "POLYGON (" + ", ".join(parts) + ")"


def is_convex_ccw(ring: np.ndarray) -> bool:
    """True if the single ring is convex and counter-clockwise."""
    n = len(ring)
    if n < 3:
        return False
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    x3, y3 = np.roll(x, -2), np.roll(y, -2)
    cross = (x2 - x) * (y3 - y2) - (y2 - y) * (x3 - x2)
    return bool(np.all(cross >= 0) and np.any(cross > 0))
