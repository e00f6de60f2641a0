"""Spec-derived geographic H3 (operators/h3geo.py) pinned against
REFERENCE-INDEPENDENT published values:

- the H3 docs' canonical example cell (latLngToCell /
  cellToLatLng / cellToParent walkthrough values);
- the published H3 per-resolution cell counts (122 / 842 / 5882)
  and the 12 pentagons;
- encode -> center -> re-encode round-trip stability over global
  random samples at every resolution 0-15 (exercises icosahedron
  edge overage and pentagon distortion paths);
- consistency with the ORACLED r3 bit algebra (validity,
  resolution, base cell, pentagon flags of every emitted id).
"""

from __future__ import annotations

import numpy as np
import pytest

from pdal_spark.operators.h3geo import cell_to_latlng, latlng_to_cell
from pdal_spark.operators.h3tables import BASE_CELL_DATA

# H3 docs quickstart anchors (docs.h3geo.org: "Point to cell"):
_SF_LAT = 37.7752702151959257
_SF_LNG = -122.418307270836565
_SF_RES9 = int("8928308280fffff", 16)
_SF_RES8 = int("8828308281fffff", 16)  # cellToParent example
_SF_CENTER = (37.77670234943567, -122.41845932318311)


def test_docs_anchor_cell():
    c = latlng_to_cell([_SF_LAT], [_SF_LNG], 9)
    assert int(c[0]) == _SF_RES9
    c8 = latlng_to_cell([_SF_LAT], [_SF_LNG], 8)
    assert int(c8[0]) == _SF_RES8


def test_docs_anchor_center():
    la, lo = cell_to_latlng(np.array([_SF_RES9], dtype=np.uint64))
    assert la[0] == pytest.approx(_SF_CENTER[0], abs=1e-12)
    assert lo[0] == pytest.approx(_SF_CENTER[1], abs=1e-12)


def _global_sample(n, seed):
    rng = np.random.default_rng(seed)
    z = rng.uniform(-1, 1, n)
    lng = rng.uniform(-180, 180, n)
    return np.degrees(np.arcsin(z)), lng


def test_published_cell_counts():
    """res0=122 cells (12 pentagons), res1=842, res2=5882 — the
    published H3 grid sizes; a dense global sample must hit every
    cell."""
    lat, lng = _global_sample(400000, 3)
    c0 = np.unique(latlng_to_cell(lat, lng, 0))
    assert len(c0) == 122
    bc = ((c0 >> np.uint64(45)) & np.uint64(127)).astype(int)
    assert sum(1 for b in bc if BASE_CELL_DATA[b][4]) == 12
    assert len(np.unique(latlng_to_cell(lat, lng, 1))) == 842
    assert len(np.unique(latlng_to_cell(lat, lng, 2))) == 5882


@pytest.mark.parametrize("res", list(range(0, 16)))
def test_roundtrip_stability(res):
    """encode -> cell center -> encode must be a fixpoint; global
    sample includes ~6% pentagon-base rows per draw."""
    lat, lng = _global_sample(8000, 7 + res)
    c = latlng_to_cell(lat, lng, res)
    assert (c != 0).all()
    la2, lo2 = cell_to_latlng(c)
    c2 = latlng_to_cell(la2, lo2, res)
    assert (c == c2).all()


def test_bit_layout_matches_algebra():
    """Every emitted id satisfies the independently-oracled bit
    rules: mode 1, requested res, valid digits (no 7 above res, all
    7 below), pentagon deleted-subsequence rule."""
    lat, lng = _global_sample(20000, 13)
    res = 7
    c = latlng_to_cell(lat, lng, res)
    mode = (c >> np.uint64(59)) & np.uint64(15)
    assert (mode == 1).all()
    assert (((c >> np.uint64(52)) & np.uint64(15)) == res).all()
    # digits above res in 0..6; below res all 7
    for r in range(1, 16):
        d = ((c >> np.uint64((15 - r) * 3)) & np.uint64(7)).astype(int)
        if r <= res:
            assert (d <= 6).all(), r
        else:
            assert (d == 7).all(), r
    # pentagon cells: leading non-zero digit is never K (1)
    bc = ((c >> np.uint64(45)) & np.uint64(127)).astype(int)
    pent = np.array([BASE_CELL_DATA[b][4] for b in bc], dtype=bool)
    digs = np.stack([((c >> np.uint64((15 - r) * 3))
                      & np.uint64(7)).astype(int)
                     for r in range(1, res + 1)], axis=1)
    nz = digs != 0
    lead = np.where(nz.any(axis=1),
                    digs[np.arange(len(digs)), np.argmax(nz, axis=1)],
                    0)
    assert not (pent & (lead == 1)).any()


def test_pentagon_centers_roundtrip():
    """All 12 res-0 pentagons: center -> encode returns the same
    cell (pentagon gnomonic distortion handled)."""
    cells = []
    for b, row in enumerate(BASE_CELL_DATA):
        if row[4]:
            cells.append((np.uint64(1) << np.uint64(59))
                         | (np.uint64(b) << np.uint64(45))
                         | ((np.uint64(1) << np.uint64(45))
                            - np.uint64(1)))
    cells = np.array(cells, dtype=np.uint64)
    assert len(cells) == 12
    la, lo = cell_to_latlng(cells)
    back = latlng_to_cell(la, lo, 0)
    assert (back == cells).all()


def test_poles_and_dateline():
    """Degenerate geometry: poles, dateline, equator/prime meridian
    all encode to valid cells and round-trip."""
    lat = np.array([90.0, -90.0, 0.0, 0.0, 45.0, -45.0])
    lng = np.array([0.0, 0.0, 180.0, -180.0, 179.99999, -179.99999])
    for res in (0, 5, 9, 15):
        c = latlng_to_cell(lat, lng, res)
        assert (c != 0).all()
        la2, lo2 = cell_to_latlng(c)
        c2 = latlng_to_cell(la2, lo2, res)
        assert (c == c2).all()
    # +/-180 longitude is the same meridian -> same cell
    c = latlng_to_cell(lat[2:4], lng[2:4], 9)
    assert c[0] == c[1]


def test_docs_anchor_boundary():
    """cellToBoundary of the docs anchor cell — the documented
    vertex ring (docs.h3geo.org quickstart, 9-decimal match)."""
    from pdal_spark.operators.h3geo import cell_to_boundary

    b = cell_to_boundary(np.array([_SF_RES9], dtype=np.uint64))[0]
    assert len(b) == 6
    assert b[0][0] == pytest.approx(37.775197782893386, abs=1e-11)
    assert b[0][1] == pytest.approx(-122.41719971841658, abs=1e-11)
    assert b[1][0] == pytest.approx(37.77688044840226, abs=1e-11)
    assert b[1][1] == pytest.approx(-122.41612835779264, abs=1e-11)


def test_boundary_containment_all_resolutions():
    """Every boundary vertex pulled 0.5% toward the cell center
    (3D slerp-ish) re-encodes to the SAME cell; vertex counts: 6
    for Class II hexes, up to 8 for Class III (icosa-edge
    distortion), 10 for Class III pentagons."""
    from pdal_spark.operators.h3geo import cell_to_boundary

    def to3d(lat, lng):
        la, lo = np.radians(lat), np.radians(lng)
        return np.stack([np.cos(la) * np.cos(lo),
                         np.cos(la) * np.sin(lo), np.sin(la)], -1)

    lat, lng = _global_sample(500, 23)
    for res in (1, 4, 9):
        cells = np.unique(latlng_to_cell(lat, lng, res))
        bnds = cell_to_boundary(cells)
        cla, clo = cell_to_latlng(cells)
        c3 = to3d(cla, clo)
        for idx, b in enumerate(bnds):
            assert 5 <= len(b) <= 10
            v3 = to3d(np.array([v[0] for v in b]),
                      np.array([v[1] for v in b]))
            m = 0.995 * c3[idx] + 0.005 * v3
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            mla = np.degrees(np.arcsin(np.clip(m[:, 2], -1, 1)))
            mlo = np.degrees(np.arctan2(m[:, 1], m[:, 0]))
            assert (latlng_to_cell(mla, mlo, res)
                    == cells[idx]).all()


def test_pentagon_boundary_vertex_counts():
    """All 12 res-1 pentagons (Class III): 5 topological + 5
    icosa-edge distortion vertices = 10 (the published pentagon
    boundary shape); res-2 (Class II) pentagons: exactly 5."""
    from pdal_spark.operators.h3geo import cell_to_boundary

    for res, want in ((1, 10), (2, 5)):
        cells = []
        for b, row in enumerate(BASE_CELL_DATA):
            if row[4]:
                fill = (np.uint64(1) << np.uint64((15 - res) * 3)) \
                    - np.uint64(1)
                cells.append(
                    (np.uint64(1) << np.uint64(59))
                    | (np.uint64(res) << np.uint64(52))
                    | (np.uint64(b) << np.uint64(45)) | fill)
        bnds = cell_to_boundary(np.array(cells, dtype=np.uint64))
        assert [len(b) for b in bnds] == [want] * 12


def test_grid_disk_docs_ring():
    """gridDisk(k=1) of the docs anchor: the documented 7-cell ring
    (docs.h3geo.org grid traversal example)."""
    from pdal_spark.operators.h3geo import grid_disk_real

    d = grid_disk_real(_SF_RES9, 1)
    want = {
        0x8928308280fffff: 0,
        0x8928308280bffff: 1, 0x89283082807ffff: 1,
        0x89283082877ffff: 1, 0x89283082803ffff: 1,
        0x89283082873ffff: 1, 0x8928308283bffff: 1,
    }
    assert d == want


def test_grid_disk_size_law():
    """|disk(k)| = 3k^2+3k+1 away from pentagons; pentagon disks
    are smaller (deleted subsequence); symmetry a in disk(b) <->
    b in disk(a) for k=1."""
    from pdal_spark.operators.h3geo import grid_disk_real

    lat, lng = _global_sample(40, 31)
    cells = latlng_to_cell(lat, lng, 6)
    for c in cells[:20]:
        c = int(c)
        for k in (1, 2, 3):
            d = grid_disk_real(c, k)
            assert len(d) <= 3 * k * k + 3 * k + 1
            if k == 1 and len(d) == 7:
                for nb in d:
                    if nb != c:
                        back = grid_disk_real(nb, 1)
                        assert c in back
    # distance ring counts on a known non-pentagon cell
    d3 = grid_disk_real(_SF_RES9, 3)
    from collections import Counter

    rings = Counter(d3.values())
    assert rings == {0: 1, 1: 6, 2: 12, 3: 18}


def test_grid_disk_pentagon():
    """A pentagon's k=1 disk has 6 cells (5 neighbors, no K
    direction); k=2 has 16 (vs 19 for hexagons)."""
    from pdal_spark.operators.h3geo import grid_disk_real

    pent = None
    for b, row in enumerate(BASE_CELL_DATA):
        if row[4]:
            pent = ((np.uint64(1) << np.uint64(59))
                    | (np.uint64(2) << np.uint64(52))
                    | (np.uint64(b) << np.uint64(45))
                    | ((np.uint64(1) << np.uint64(39))
                       - np.uint64(1)))
            break
    d1 = grid_disk_real(int(pent), 1)
    assert len(d1) == 6
    d2 = grid_disk_real(int(pent), 2)
    assert len(d2) == 16


def test_grid_disk_centers_are_adjacent():
    """Every k=1 neighbor's center lies within ~2.2 average edge
    lengths of the origin center (geographic consistency of the
    traversal with the gnomonic inverse)."""
    import math

    from pdal_spark.operators.h3geo import grid_disk_real

    lat, lng = _global_sample(25, 41)
    for res in (3, 7):
        cells = latlng_to_cell(lat, lng, res)
        for c in cells:
            c = int(c)
            d = grid_disk_real(c, 1)
            ids = np.array(sorted(d), dtype=np.uint64)
            la, lo = cell_to_latlng(ids)
            la0, lo0 = cell_to_latlng(
                np.array([c], dtype=np.uint64))
            # great-circle distances to origin center
            p = np.radians([la0[0], lo0[0]])
            q = np.radians(np.stack([la, lo], axis=1))
            dlat = q[:, 0] - p[0]
            dlng = q[:, 1] - p[1]
            h = (np.sin(dlat / 2) ** 2
                 + np.cos(p[0]) * np.cos(q[:, 0])
                 * np.sin(dlng / 2) ** 2)
            dist = 2 * np.arcsin(np.sqrt(h))
            nz = dist[dist > 0]
            assert len(nz) >= 5
            assert nz.max() / nz.min() < 1.8  # ring, not scattered


def test_polyfill_real_exact_membership():
    """polygonToCells on real ids: exactly the cells whose center
    is inside (H3's polyfill rule) — verified by closure: no
    1-ring neighbor of a member has an inside center yet is
    missing, and every member's center is inside."""
    from pdal_spark.operators.h3geo import (
        grid_disk_real,
        polyfill_real,
    )

    ring = [(37.78, -122.43), (37.78, -122.40), (37.75, -122.415)]

    def inside(py, px):
        r = ring + [ring[0]]
        c = False
        for a in range(len(ring)):
            ya, xa = r[a]
            yb, xb = r[a + 1]
            if (ya > py) != (yb > py):
                xint = xa + (py - ya) * (xb - xa) / (yb - ya)
                if px < xint:
                    c = not c
        return c

    for res in (7, 8, 9):
        cells = polyfill_real(ring, res)
        assert len(cells) > 0
        got = set(int(c) for c in cells)
        la, lo = cell_to_latlng(cells)
        for idx in range(len(cells)):
            assert inside(la[idx], lo[idx])
        halo = set()
        for c in got:
            halo.update(grid_disk_real(c, 1))
        halo -= got
        hids = np.array(sorted(halo), dtype=np.uint64)
        hla, hlo = cell_to_latlng(hids)
        for idx in range(len(hids)):
            assert not inside(hla[idx], hlo[idx]), hex(hids[idx])
    # resolutions nest in count roughly 7x
    n8 = len(polyfill_real(ring, 8))
    n9 = len(polyfill_real(ring, 9))
    assert 4 < n9 / max(n8, 1) < 10
