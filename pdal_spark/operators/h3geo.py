"""Spec-derived geographic H3: latLngToCell / cellToLatLng with NO
h3-py dependency — the icosahedral gnomonic forward/inverse over
the published H3 grid definition, complementing the round-3 index
algebra (h3lib.py) which operates on already-encoded ids.

Derivation: implemented from the published H3 cell indexing spec
(h3geo.org/docs/core-library/coordsystems + the Apache-2.0 H3
library as the normative reference). Reference behavior studied at
vendor/h3/lib/faceijk.c:371-470 (_geoToFaceIjk/_geoToHex2d/
_hex2dToGeo), coordijk.c:56-540 (hex rounding, aperture-7 up/down,
ijk rotations), h3Index.c:678-800 (_faceIjkToH3/_h3ToFaceIjk),
faceijk.c:850-910 (_adjustOverageClassII) — behavior, not code:
this module is an independent numpy-VECTORIZED implementation (the
reference is scalar per point); constant tables are the grid spec
(operators/h3tables.py, attributed there).

Everything is batch numpy: face selection is one argmax over the 20
face-center dot products, the aperture-7 digit walk is a loop over
at most 15 resolutions of whole-array integer ops, and the rare
icosahedron-edge overage/pentagon branches are masked updates — no
per-row Python anywhere, so this slots directly into Arrow-batched
pandas UDFs.

Validation: tests pin the H3 docs' canonical example cell
(8928308280fffff for (37.7752702151959, -122.418307270836) at res
9), cross-check parent chains against the independent h3lib bit
algebra, and verify encode/decode round-trip stability over global
random samples at every resolution including pentagon cells.
"""

from __future__ import annotations

import math

import numpy as np

from pdal_spark.operators.h3tables import (
    BASE_CELL_DATA,
    FACE_AXES_AZ,
    FACE_CENTER_GEO,
    FACE_CENTER_XYZ,
    FACE_IJK_BASE_CELLS,
    FACE_NEIGHBORS,
)

_SQRT7 = 2.6457513110645905905016157536392604257102
_RES0_U_GNOMONIC = 0.38196601125010500003
_AP7_ROT = 0.333473172251832115336090755351601070065900389
_SIN60 = 0.8660254037844386467637231707529361834714
_EPS = 1.0e-16
_MAX_RES = 15

# numpy views of the spec tables
_BCD = np.array(BASE_CELL_DATA, dtype=np.int64)  # (122, 7)
_BC_HOME_FACE = _BCD[:, 0]
_BC_HOME_IJK = _BCD[:, 1:4]
_BC_IS_PENT = _BCD[:, 4].astype(bool)
_BC_CW_OFF = _BCD[:, 5:7]
_FIBC = np.array(FACE_IJK_BASE_CELLS, dtype=np.int64)  # (540, 2)
_FC_GEO = np.array(FACE_CENTER_GEO)  # (20, 2) lat,lng rad
_FC_XYZ = np.array(FACE_CENTER_XYZ)  # (20, 3)
_FC_AZ = np.array(FACE_AXES_AZ)  # (20, 3)
_FN = np.array(
    [[e for e in f] for f in FACE_NEIGHBORS], dtype=np.int64
)  # (20, 4, 5): face, ti, tj, tk, ccwRot60

# maxDimByCIIres / unitScaleByCIIres (faceijk.c:307-361), indexed by
# the CLASS-II resolution (even)
_MAX_DIM = np.full(17, -1, dtype=np.int64)
_UNIT_SCALE = np.full(17, -1, dtype=np.int64)
for _r in range(0, 17, 2):
    _MAX_DIM[_r] = 2 * 7 ** (_r // 2)
    _UNIT_SCALE[_r] = 7 ** (_r // 2)

# digit rotation lookups (coordijk.c:549-590): ccw K->IK->I->IJ->J->
# JK->K, cw is the inverse; 0 and 7 map to themselves
_ROT_CCW = np.array([0, 5, 3, 1, 6, 4, 2, 7], dtype=np.int64)
_ROT_CW = np.array([0, 3, 6, 2, 5, 1, 4, 7], dtype=np.int64)
# UNIT_VECS digit -> ijk (coordijk.h:50-58): digit = 4i + 2j + k
_DIGIT_IJK = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0]], dtype=np.int64)

_MODE_CELL = np.uint64(1) << np.uint64(59)


def _pos_angle(a):
    tau = 2.0 * np.pi
    return np.where(a < 0, a + tau, np.where(a >= tau, a - tau, a))


def _normalize(i, j, k):
    """_ijkNormalize (coordijk.c:259-288): shift negatives out, then
    subtract the common minimum — same sequential order."""
    neg = i < 0
    j = np.where(neg, j - i, j)
    k = np.where(neg, k - i, k)
    i = np.where(neg, 0, i)
    neg = j < 0
    i = np.where(neg, i - j, i)
    k = np.where(neg, k - j, k)
    j = np.where(neg, 0, j)
    neg = k < 0
    i = np.where(neg, i - k, i)
    j = np.where(neg, j - k, j)
    k = np.where(neg, 0, k)
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


def _round_half_up(x):
    # lround semantics; exact .5 cannot arise from the /7 forms
    return np.floor(x + 0.5).astype(np.int64)


def _up_ap7(i, j, k):
    ii = i - k
    jj = j - k
    ni = _round_half_up((3 * ii - jj) / 7.0)
    nj = _round_half_up((ii + 2 * jj) / 7.0)
    return _normalize(ni, nj, np.zeros_like(ni))


def _up_ap7r(i, j, k):
    ii = i - k
    jj = j - k
    ni = _round_half_up((2 * ii + jj) / 7.0)
    nj = _round_half_up((3 * jj - ii) / 7.0)
    return _normalize(ni, nj, np.zeros_like(ni))


def _down_ap7(i, j, k):
    return _normalize(3 * i + j, 3 * j + k, i + 3 * k)


def _down_ap7r(i, j, k):
    return _normalize(3 * i + k, i + 3 * j, j + 3 * k)


def _rot60ccw_ijk(i, j, k):
    return _normalize(i + k, i + j, j + k)


def _rot60cw_ijk(i, j, k):
    return _normalize(i + j, j + k, i + k)


def _hex2d_to_ijk(x, y):
    """_hex2dToCoordIJK (coordijk.c:56-146, from DGGRID): quantize a
    face-plane point to the containing hex in ijk+ coords."""
    a1 = np.abs(x)
    a2 = np.abs(y)
    x2 = a2 / _SIN60
    x1 = a1 + x2 / 2.0
    m1 = x1.astype(np.int64)
    m2 = x2.astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2

    # branch tree -> vectorized selects for the i/j increments
    lo = r1 < 0.5
    i = np.where(
        lo,
        np.where(r1 < 1.0 / 3.0, m1,
                 np.where((1.0 - r1 <= r2) & (r2 < 2.0 * r1),
                          m1 + 1, m1)),
        np.where(r1 < 2.0 / 3.0,
                 np.where((2.0 * r1 - 1.0 < r2) & (r2 < 1.0 - r1),
                          m1, m1 + 1),
                 m1 + 1))
    j = np.where(
        lo,
        np.where(r1 < 1.0 / 3.0,
                 np.where(r2 < (1.0 + r1) / 2.0, m2, m2 + 1),
                 np.where(r2 < 1.0 - r1, m2, m2 + 1)),
        np.where(r1 < 2.0 / 3.0,
                 np.where(r2 < 1.0 - r1, m2, m2 + 1),
                 np.where(r2 < r1 / 2.0, m2, m2 + 1)))

    # fold across axes for negative x/y
    jeven = (j % 2) == 0
    axisi = np.where(jeven, j // 2, (j + 1) // 2)
    diff = i - axisi
    i = np.where(x < 0.0,
                 np.where(jeven, i - 2 * diff, i - (2 * diff + 1)), i)
    yneg = y < 0.0
    i = np.where(yneg, i - (2 * j + 1) // 2, i)
    j = np.where(yneg, -j, j)
    k = np.zeros_like(i)
    return _normalize(i, j, k)


def _ijk_to_hex2d(i, j, k):
    ii = i - k
    jj = j - k
    return ii - 0.5 * jj, jj * _SIN60


def _geo_azimuth(lat1, lng1, lat2, lng2):
    return np.arctan2(
        np.cos(lat2) * np.sin(lng2 - lng1),
        np.cos(lat1) * np.sin(lat2)
        - np.sin(lat1) * np.cos(lat2) * np.cos(lng2 - lng1))


def _leading_digit(digits, res):
    """First non-zero digit along the res axis (0 if none).
    digits: (n, MAX_RES) with digit r at column r-1; columns >= res
    hold 0 during construction."""
    nz = digits != 0
    any_nz = nz.any(axis=1)
    first = np.argmax(nz, axis=1)
    lead = np.where(any_nz, digits[np.arange(len(digits)), first], 0)
    return lead


def _rotate_digits(digits, table, mask):
    out = digits.copy()
    out[mask] = table[digits[mask]]
    return out


def _pent_rotate_ccw(digits, res, mask):
    """_h3RotatePent60ccw vectorized: rotate all digits; if the
    leading non-zero digit lands on K, rotate the whole index once
    more (h3Index.c:600-620 net effect — leading zeros are fixed
    points of rotation)."""
    rot = _rotate_digits(digits, _ROT_CCW, mask)
    lead = _leading_digit(rot, res)
    again = mask & (lead == 1)
    rot = _rotate_digits(rot, _ROT_CCW, again)
    return rot


def latlng_to_cell(lat, lng, res: int, degrees: bool = True):
    """Vectorized latLngToCell: (lat[], lng[]) -> uint64 H3 cell ids
    at `res`. Mirrors _geoToFaceIjk + _faceIjkToH3."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    if degrees:
        lat = np.radians(lat)
        lng = np.radians(lng)
    if not 0 <= res <= _MAX_RES:
        raise ValueError(f"h3: resolution {res} out of range 0-15")
    n = lat.shape[0]

    # closest icosahedron face (faceijk.c:936-952): max dot product
    coslat = np.cos(lat)
    v = np.stack([coslat * np.cos(lng), coslat * np.sin(lng),
                  np.sin(lat)], axis=1)
    dots = v @ _FC_XYZ.T
    face = np.argmax(dots, axis=1)
    sqd = np.maximum(2.0 - 2.0 * dots[np.arange(n), face], 0.0)
    r = np.arccos(np.clip(1.0 - sqd / 2.0, -1.0, 1.0))

    fc_lat = _FC_GEO[face, 0]
    fc_lng = _FC_GEO[face, 1]
    theta = _pos_angle(
        _FC_AZ[face, 0]
        - _pos_angle(_geo_azimuth(fc_lat, fc_lng, lat, lng)))
    if res % 2:  # Class III
        theta = _pos_angle(theta - _AP7_ROT)
    r = np.tan(r) / _RES0_U_GNOMONIC * (_SQRT7 ** res)
    small = r < _EPS
    x = np.where(small, 0.0, r * np.cos(theta))
    y = np.where(small, 0.0, r * np.sin(theta))
    i, j, k = _hex2d_to_ijk(x, y)

    # digit walk res -> 1 (h3Index.c:700-727)
    digits = np.zeros((n, _MAX_RES), dtype=np.int64)
    for rr in range(res, 0, -1):
        li, lj, lk = i, j, k
        if rr % 2:  # Class III
            i, j, k = _up_ap7(i, j, k)
            ci, cj, ck = _down_ap7(i, j, k)
        else:
            i, j, k = _up_ap7r(i, j, k)
            ci, cj, ck = _down_ap7r(i, j, k)
        di, dj, dk = _normalize(li - ci, lj - cj, lk - ck)
        digits[:, rr - 1] = 4 * di + 2 * dj + dk

    # base cell + canonical rotation (h3Index.c:733-760)
    oob = (i > 2) | (j > 2) | (k > 2)
    ii = np.where(oob, 0, i)
    jj = np.where(oob, 0, j)
    kk = np.where(oob, 0, k)
    idx = face * 27 + ii * 9 + jj * 3 + kk
    bc = _FIBC[idx, 0]
    rots = _FIBC[idx, 1]
    pent = _BC_IS_PENT[bc]

    lead = _leading_digit(digits, res)
    fix = pent & (lead == 1)
    cw_off = fix & ((_BC_CW_OFF[bc, 0] == face)
                    | (_BC_CW_OFF[bc, 1] == face))
    digits = _rotate_digits(digits, _ROT_CW, cw_off)
    digits = _rotate_digits(digits, _ROT_CCW, fix & ~cw_off)

    for it in range(5):  # numRots <= 5
        m = rots > it
        if not m.any():
            break
        digits = np.where(
            pent[:, None],
            _pent_rotate_ccw(digits, res, m & pent),
            _rotate_digits(digits, _ROT_CCW, m & ~pent))

    # assemble the 64-bit index: mode 1, res, base cell, digits
    # (unused digits set to 7)
    h = np.full(n, _MODE_CELL, dtype=np.uint64)
    h |= np.uint64(res) << np.uint64(52)
    h |= bc.astype(np.uint64) << np.uint64(45)
    for rr in range(1, _MAX_RES + 1):
        d = (digits[:, rr - 1] if rr <= res
             else np.full(n, 7, dtype=np.int64))
        h |= d.astype(np.uint64) << np.uint64((_MAX_RES - rr) * 3)
    if oob.any():
        h = np.where(oob, np.uint64(0), h)
    return h


def _adjust_overage(face, i, j, k, res2, pent_l4, substrate=False):
    """_adjustOverageClassII (faceijk.c:850-910), vectorized with
    masks; returns (face, i, j, k, had_overage)."""
    res2 = np.asarray(res2)
    maxd = _MAX_DIM[res2]
    if substrate:
        maxd = maxd * 3
    s = i + j + k
    over = s > maxd
    if not over.any():
        return face, i, j, k, over

    # quadrant selection: k>0 & j>0 -> JK(3); k>0 & j==0 -> KI(2);
    # k==0 -> IJ(1)
    quad = np.where(k > 0, np.where(j > 0, 3, 2), 1)

    # pentagon leading-4 fix within the KI quadrant: rotate cw about
    # the pentagon center (maxDim, 0, 0) before the face translation
    pfix = over & pent_l4 & (quad == 2)
    if pfix.any():
        i = i.copy(); j = j.copy(); k = k.copy()
        md = maxd[pfix]
        ri, rj, rk = _rot60cw_ijk(i[pfix] - md, j[pfix], k[pfix])
        i[pfix] = ri + md
        j[pfix] = rj
        k[pfix] = rk

    nf = _FN[face, quad, 0]
    rot = _FN[face, quad, 4]
    unit = _UNIT_SCALE[res2]
    if substrate:
        unit = unit * 3
    t = _FN[face, quad, 1:4] * unit[:, None]

    # apply on overage rows: rotate ccw `rot` times, translate,
    # normalize
    io, jo, ko = i.copy(), j.copy(), k.copy()
    for it in range(5):
        m = over & (rot > it)
        if not m.any():
            break
        ri, rj, rk = _rot60ccw_ijk(io[m], jo[m], ko[m])
        io[m], jo[m], ko[m] = ri, rj, rk
    io = np.where(over, io + t[:, 0], io)
    jo = np.where(over, jo + t[:, 1], jo)
    ko = np.where(over, ko + t[:, 2], ko)
    io, jo, ko = _normalize(io, jo, ko)
    i = np.where(over, io, i)
    j = np.where(over, jo, j)
    k = np.where(over, ko, k)
    face = np.where(over, nf, face)
    return face, i, j, k, over


def cells_to_fijk(cells):
    """Vectorized _h3ToFaceIjk: uint64 ids -> (face, i, j, k, res)
    arrays — the overage-adjusted FaceIJK address of each cell in
    its own resolution grid (shared by cellToLatLng and
    cellToBoundary)."""
    h = np.asarray(cells, dtype=np.uint64)
    n = h.shape[0]
    res = ((h >> np.uint64(52)) & np.uint64(15)).astype(np.int64)
    bc = ((h >> np.uint64(45)) & np.uint64(127)).astype(np.int64)
    if (bc >= 122).any():
        raise ValueError("h3: invalid base cell in input")
    digits = np.zeros((n, _MAX_RES), dtype=np.int64)
    for rr in range(1, _MAX_RES + 1):
        d = ((h >> np.uint64((_MAX_RES - rr) * 3))
             & np.uint64(7)).astype(np.int64)
        digits[:, rr - 1] = np.where(rr <= res, d, 0)

    pent = _BC_IS_PENT[bc]
    lead = _leading_digit(digits, res)
    digits = _rotate_digits(digits, _ROT_CW, pent & (lead == 5))
    lead = _leading_digit(digits, res)  # pentLeading4 uses the
    # post-rotation index (h3Index.c:639-641 then 658)

    face = _BC_HOME_FACE[bc].copy()
    i = _BC_HOME_IJK[bc, 0].copy()
    j = _BC_HOME_IJK[bc, 1].copy()
    k = _BC_HOME_IJK[bc, 2].copy()

    possible_overage = pent | ~((res == 0)
                                | ((i == 0) & (j == 0) & (k == 0)))

    max_res = int(res.max()) if n else 0
    for rr in range(1, max_res + 1):
        act = rr <= res
        if rr % 2:
            ni, nj, nk = _down_ap7(i, j, k)
        else:
            ni, nj, nk = _down_ap7r(i, j, k)
        d = digits[:, rr - 1]
        ni = ni + _DIGIT_IJK[d, 0]
        nj = nj + _DIGIT_IJK[d, 1]
        nk = nk + _DIGIT_IJK[d, 2]
        ni, nj, nk = _normalize(ni, nj, nk)
        i = np.where(act, ni, i)
        j = np.where(act, nj, j)
        k = np.where(act, nk, k)

    # overage adjustment (h3Index.c:640-676)
    oi, oj, ok_ = i.copy(), j.copy(), k.copy()
    odd = (res % 2) == 1
    res2 = res + odd
    di, dj, dk = _down_ap7r(i, j, k)
    i = np.where(odd, di, i)
    j = np.where(odd, dj, j)
    k = np.where(odd, dk, k)

    pent_l4 = pent & (lead == 4)
    face, i, j, k, over = _adjust_overage(
        face, i, j, k, res2, pent_l4 & possible_overage)
    over = over & possible_overage
    # secondary overages for pentagons
    sec = over & pent
    while sec.any():
        f2, i2, j2, k2, o2 = _adjust_overage(
            face[sec], i[sec], j[sec], k[sec], res2[sec],
            np.zeros(int(sec.sum()), dtype=bool))
        face[sec], i[sec], j[sec], k[sec] = f2, i2, j2, k2
        nxt = sec.copy()
        nxt[sec] = o2
        sec = nxt
    # had overage + dropped a class: back up; no overage: restore
    up_m = over & odd
    if up_m.any():
        ui, uj, uk = _up_ap7r(i[up_m], j[up_m], k[up_m])
        i[up_m], j[up_m], k[up_m] = ui, uj, uk
    rest = ~over & odd
    i = np.where(rest, oi, i)
    j = np.where(rest, oj, j)
    k = np.where(rest, ok_, k)
    return face, i, j, k, res


def cell_to_latlng(cells, degrees: bool = True):
    """Vectorized cellToLatLng: uint64 ids -> (lat[], lng[]) cell
    centers. Mirrors _h3ToFaceIjk + _faceIjkToGeo."""
    face, i, j, k, res = cells_to_fijk(cells)
    odd = (res % 2) == 1

    # _faceIjkToGeo: ijk -> hex2d -> (r, theta) -> sphere
    x, y = _ijk_to_hex2d(i, j, k)
    r = np.hypot(x, y)
    center = r < _EPS
    theta = np.arctan2(y, x)
    r = r / (_SQRT7 ** res.astype(np.float64))
    r = np.arctan(r * _RES0_U_GNOMONIC)
    theta = np.where(odd, _pos_angle(theta + _AP7_ROT), theta)
    az = _pos_angle(_FC_AZ[face, 0] - theta)

    # _geoAzDistanceRads (latLng.c:217-275)
    p1lat = _FC_GEO[face, 0]
    p1lng = _FC_GEO[face, 1]
    sinlat = np.clip(
        np.sin(p1lat) * np.cos(r)
        + np.cos(p1lat) * np.sin(r) * np.cos(az), -1.0, 1.0)
    lat2 = np.arcsin(sinlat)
    sinlng = np.clip(np.sin(az) * np.sin(r) / np.cos(lat2), -1, 1)
    coslng = np.clip(
        (np.cos(r) - np.sin(p1lat) * sinlat)
        / np.cos(p1lat) / np.cos(lat2), -1.0, 1.0)
    lng2 = p1lng + np.arctan2(sinlng, coslng)
    # due north/south special cases
    due_n = az < _EPS
    due_s = np.abs(az - np.pi) < _EPS
    lat2 = np.where(due_n, p1lat + r, np.where(due_s, p1lat - r,
                                               lat2))
    lng2 = np.where(due_n | due_s, p1lng, lng2)
    pole = np.abs(np.abs(lat2) - np.pi / 2) < _EPS
    lat2 = np.where(pole, np.sign(lat2) * np.pi / 2, lat2)
    lng2 = np.where(pole, 0.0, lng2)
    # wrap lng into (-pi, pi]
    lng2 = np.where(lng2 > np.pi, lng2 - 2 * np.pi, lng2)
    lng2 = np.where(lng2 < -np.pi, lng2 + 2 * np.pi, lng2)

    lat2 = np.where(center, p1lat, lat2)
    lng2 = np.where(center, p1lng, lng2)
    if degrees:
        return np.degrees(lat2), np.degrees(lng2)
    return lat2, lng2


# ---------------------------------------------------------------------------
# cellToBoundary (faceijk.c:562-775): cell vertices on the aperture
# 33r (Class II) / 33r7r (Class III) SUBSTRATE grid, with
# icosahedron-edge distortion vertices for Class III cells and the
# pentagon variant. Boundary output is a post-aggregation surface
# (thousands of cells, not billions of points), so the per-cell
# variable-length loop is the appropriate shape here.
# ---------------------------------------------------------------------------

# origin-centered cell vertices on the substrate grids
# (faceijk.c:567-592 hexagons, :612-630 pentagons)
_HEX_VERTS_CII = ((2, 1, 0), (1, 2, 0), (0, 2, 1),
                  (0, 1, 2), (1, 0, 2), (2, 0, 1))
_HEX_VERTS_CIII = ((5, 4, 0), (1, 5, 0), (0, 5, 4),
                   (0, 1, 5), (4, 0, 5), (5, 0, 1))
_PENT_VERTS_CII = ((2, 1, 0), (1, 2, 0), (0, 2, 1),
                   (0, 1, 2), (1, 0, 2))
_PENT_VERTS_CIII = ((5, 4, 0), (1, 5, 0), (0, 5, 4),
                    (0, 1, 5), (4, 0, 5))

# adjacentFaceDir[f][g] (faceijk.c:273-305) is derivable from the
# faceNeighbors table: the quadrant index d whose neighbor is g
_ADJ_DIR = np.full((20, 20), -1, dtype=np.int64)
for _f in range(20):
    _ADJ_DIR[_f, _f] = 0
    for _d in (1, 2, 3):
        _ADJ_DIR[_f, _FN[_f, _d, 0]] = _d

_SQRT3_2 = 0.8660254037844386467637231707529361834714


def _norm1(i, j, k):
    """Scalar _ijkNormalize."""
    if i < 0:
        j -= i
        k -= i
        i = 0
    if j < 0:
        i -= j
        k -= j
        j = 0
    if k < 0:
        i -= k
        j -= k
        k = 0
    m = min(i, j, k)
    return i - m, j - m, k - m


def _down_ap3_1(i, j, k):
    return _norm1(2 * i + j, j * 2 + k, i + 2 * k)


def _down_ap3r_1(i, j, k):
    return _norm1(2 * i + k, i + 2 * j, j + 2 * k)


def _down_ap7r_1(i, j, k):
    return _norm1(3 * i + k, i + 3 * j, j + 3 * k)


def _rot60ccw_1(i, j, k):
    return _norm1(i + k, i + j, j + k)


def _adjust_overage_1(face, i, j, k, res2, substrate):
    """Scalar _adjustOverageClassII with the tri-state result:
    0 = none, 1 = face edge, 2 = new face. Substrate grids scale
    maxDim/unitScale by 3 (faceijk.c:856-858, 898-900)."""
    maxd = int(_MAX_DIM[res2]) * (3 if substrate else 1)
    s = i + j + k
    if substrate and s == maxd:
        return face, i, j, k, 1
    if s <= maxd:
        return face, i, j, k, 0
    quad = 3 if (k > 0 and j > 0) else (2 if k > 0 else 1)
    nf, ti, tj, tk, rot = (int(v) for v in _FN[face, quad])
    for _ in range(rot):
        i, j, k = _rot60ccw_1(i, j, k)
    unit = int(_UNIT_SCALE[res2]) * (3 if substrate else 1)
    i, j, k = _norm1(i + ti * unit, j + tj * unit, k + tk * unit)
    if substrate and i + j + k == maxd:
        return nf, i, j, k, 1
    return nf, i, j, k, 2


def _hex2d_to_geo_substrate(x, y, face, res, degrees):
    """Scalar _hex2dToGeo with substrate=1 (faceijk.c:436-470):
    substrate r scales down by 3 (and sqrt7 for Class III), and the
    Class III theta rotation is already folded in."""
    r = math.hypot(x, y)
    if r < _EPS:
        la, lo = _FC_GEO[face]
        return (math.degrees(la), math.degrees(lo)) if degrees \
            else (la, lo)
    theta = math.atan2(y, x)
    r /= _SQRT7 ** res
    r /= 3.0
    if res % 2:
        r /= _SQRT7
    r = math.atan(r * _RES0_U_GNOMONIC)
    az = (_FC_AZ[face][0] - theta) % (2.0 * math.pi)
    p1lat, p1lng = _FC_GEO[face]
    if az < _EPS or abs(az - math.pi) < _EPS:
        lat2 = p1lat + r if az < _EPS else p1lat - r
        lng2 = p1lng
    else:
        sinlat = max(-1.0, min(1.0, math.sin(p1lat) * math.cos(r)
                               + math.cos(p1lat) * math.sin(r)
                               * math.cos(az)))
        lat2 = math.asin(sinlat)
        sinlng = max(-1.0, min(1.0, math.sin(az) * math.sin(r)
                               / math.cos(lat2)))
        coslng = max(-1.0, min(1.0,
                               (math.cos(r) - math.sin(p1lat)
                                * sinlat)
                               / math.cos(p1lat) / math.cos(lat2)))
        lng2 = p1lng + math.atan2(sinlng, coslng)
    if lng2 > math.pi:
        lng2 -= 2 * math.pi
    if lng2 < -math.pi:
        lng2 += 2 * math.pi
    return (math.degrees(lat2), math.degrees(lng2)) if degrees \
        else (lat2, lng2)


def _ijk_to_hex2d_1(i, j, k):
    ii = i - k
    jj = j - k
    return ii - 0.5 * jj, jj * _SQRT3_2


def _face_edges(maxd):
    v0 = (3.0 * maxd, 0.0)
    v1 = (-1.5 * maxd, 3.0 * _SQRT3_2 * maxd)
    v2 = (-1.5 * maxd, -3.0 * _SQRT3_2 * maxd)
    return {1: (v0, v1), 3: (v1, v2), 2: (v2, v0)}  # IJ, JK, KI


def _intersect(p0, p1, p2, p3):
    s1 = (p1[0] - p0[0], p1[1] - p0[1])
    s2 = (p3[0] - p2[0], p3[1] - p2[1])
    t = (s2[0] * (p0[1] - p2[1]) - s2[1] * (p0[0] - p2[0])) / (
        -s2[0] * s1[1] + s1[0] * s2[1])
    return (p0[0] + t * s1[0], p0[1] + t * s1[1])


_FLT_EPS = 1.1920928955078125e-07  # FLT_EPSILON


def _boundary_hex(face, i, j, k, res, degrees):
    adj = res
    ci, cj, ck = _down_ap3_1(i, j, k)
    ci, cj, ck = _down_ap3r_1(ci, cj, ck)
    if res % 2:
        ci, cj, ck = _down_ap7r_1(ci, cj, ck)
        adj += 1
        verts = _HEX_VERTS_CIII
    else:
        verts = _HEX_VERTS_CII
    fverts = []
    for vi, vj, vk in verts:
        fverts.append((face, *_norm1(ci + vi, cj + vj, ck + vk)))

    out = []
    last_face = -1
    last_over = 0
    center_face = face
    maxd = int(_MAX_DIM[adj])
    edges = _face_edges(maxd)
    extra = 1  # probe the last edge for a crossing
    for vert in range(6 + extra):
        v = vert % 6
        vf, vi, vj, vk = fverts[v]
        vf, vi, vj, vk, over = _adjust_overage_1(
            vf, vi, vj, vk, adj, True)
        if (res % 2 and vert > 0 and vf != last_face
                and last_over != 1):
            last_v = (v + 5) % 6
            o0 = _ijk_to_hex2d_1(*fverts[last_v][1:])
            o1 = _ijk_to_hex2d_1(*fverts[v][1:])
            face2 = vf if last_face == center_face else last_face
            e0, e1 = edges[int(_ADJ_DIR[center_face, face2])]
            inter = _intersect(o0, o1, e0, e1)
            at_vertex = (
                (abs(o0[0] - inter[0]) < _FLT_EPS
                 and abs(o0[1] - inter[1]) < _FLT_EPS)
                or (abs(o1[0] - inter[0]) < _FLT_EPS
                    and abs(o1[1] - inter[1]) < _FLT_EPS))
            if not at_vertex:
                out.append(_hex2d_to_geo_substrate(
                    inter[0], inter[1], center_face, adj, degrees))
        if vert < 6:
            x, y = _ijk_to_hex2d_1(vi, vj, vk)
            out.append(_hex2d_to_geo_substrate(
                x, y, vf, adj, degrees))
        last_face = vf
        last_over = over
    return out


def _boundary_pent(face, i, j, k, res, degrees):
    adj = res
    ci, cj, ck = _down_ap3_1(i, j, k)
    ci, cj, ck = _down_ap3r_1(ci, cj, ck)
    if res % 2:
        ci, cj, ck = _down_ap7r_1(ci, cj, ck)
        adj += 1
        verts = _PENT_VERTS_CIII
    else:
        verts = _PENT_VERTS_CII
    fverts = []
    for vi, vj, vk in verts:
        f2, i2, j2, k2 = face, *_norm1(ci + vi, cj + vj, ck + vk)
        while True:  # _adjustPentVertOverage: repeat while new-face
            f2, i2, j2, k2, over = _adjust_overage_1(
                f2, i2, j2, k2, adj, True)
            if over != 2:
                break
        fverts.append((f2, i2, j2, k2))

    out = []
    last = None
    maxd = int(_MAX_DIM[adj])
    unit3 = int(_UNIT_SCALE[adj]) * 3
    edges = _face_edges(maxd)
    for vert in range(5 + 1):
        v = vert % 5
        vf, vi, vj, vk = fverts[v]
        if res % 2 and vert > 0:
            lf, li, lj, lk = last
            o0 = _ijk_to_hex2d_1(li, lj, lk)
            d = int(_ADJ_DIR[vf, lf])
            nf, ti, tj, tk, rot = (int(x) for x in _FN[vf, d])
            ti2, tj2, tk2 = vi, vj, vk
            for _ in range(rot):
                ti2, tj2, tk2 = _rot60ccw_1(ti2, tj2, tk2)
            ti2, tj2, tk2 = _norm1(ti2 + ti * unit3,
                                   tj2 + tj * unit3,
                                   tk2 + tk * unit3)
            o1 = _ijk_to_hex2d_1(ti2, tj2, tk2)
            e0, e1 = edges[int(_ADJ_DIR[nf, vf])]
            inter = _intersect(o0, o1, e0, e1)
            out.append(_hex2d_to_geo_substrate(
                inter[0], inter[1], nf, adj, degrees))
        if vert < 5:
            x, y = _ijk_to_hex2d_1(vi, vj, vk)
            out.append(_hex2d_to_geo_substrate(
                x, y, vf, adj, degrees))
        last = (vf, vi, vj, vk)
    return out


def cell_to_boundary(cells, degrees: bool = True) -> list:
    """cellToBoundary for a batch of uint64 ids: list of vertex
    lists [(lat, lng), ...] — 6-10 vertices for hexagons (extra
    distortion vertices where Class III edges cross icosahedron
    edges), 5-10 for pentagons."""
    h = np.asarray(cells, dtype=np.uint64)
    face, i, j, k, res = cells_to_fijk(h)
    bc = ((h >> np.uint64(45)) & np.uint64(127)).astype(np.int64)
    # a cell IS a pentagon only on the all-center-digit chain of a
    # pentagonal base cell (isPentagon, h3Index.c:578-580)
    digits = np.zeros((len(h), _MAX_RES), dtype=np.int64)
    for rr in range(1, _MAX_RES + 1):
        d = ((h >> np.uint64((_MAX_RES - rr) * 3))
             & np.uint64(7)).astype(np.int64)
        digits[:, rr - 1] = np.where(rr <= res, d, 0)
    pent = _BC_IS_PENT[bc] & (_leading_digit(digits, res) == 0)
    out = []
    for n in range(len(h)):
        fn = _boundary_pent if pent[n] else _boundary_hex
        out.append(fn(int(face[n]), int(i[n]), int(j[n]),
                      int(k[n]), int(res[n]), degrees))
    return out


# ---------------------------------------------------------------------------
# Grid traversal (algos.c:60-500): cell neighbors and gridDisk on
# real ids — the last lib-gated piece of the geographic surface.
# Scalar per origin (disk sizes are small: 3k^2+3k+1 cells); the
# layout-scale ring op remains the Catalyst qcell grid_disk.
# ---------------------------------------------------------------------------

from pdal_spark.operators.h3tables import (  # noqa: E402
    BASE_CELL_NEIGHBOR_60CCW_ROTS,
    BASE_CELL_NEIGHBORS,
)

_BC_NB = np.array(BASE_CELL_NEIGHBORS, dtype=np.int64)
_BC_NB_ROT = np.array(BASE_CELL_NEIGHBOR_60CCW_ROTS, dtype=np.int64)
_POLAR_PENT = (4, 117)  # baseCells.c:834-836

# traversal digit remaps (algos.c:76-152): current digit x move dir
_NEW_DIGIT_II = (
    (0, 1, 2, 3, 4, 5, 6), (1, 4, 3, 6, 5, 2, 0),
    (2, 3, 1, 4, 6, 0, 5), (3, 6, 4, 5, 0, 1, 2),
    (4, 5, 6, 0, 2, 3, 1), (5, 2, 0, 1, 3, 6, 4),
    (6, 0, 5, 2, 1, 4, 3))
_NEW_ADJ_II = (
    (0, 0, 0, 0, 0, 0, 0), (0, 1, 0, 1, 0, 5, 0),
    (0, 0, 2, 3, 0, 0, 2), (0, 1, 3, 3, 0, 0, 0),
    (0, 0, 0, 0, 4, 4, 6), (0, 5, 0, 0, 4, 5, 0),
    (0, 0, 2, 0, 6, 0, 6))
_NEW_DIGIT_III = (
    (0, 1, 2, 3, 4, 5, 6), (1, 2, 3, 4, 5, 6, 0),
    (2, 3, 4, 5, 6, 0, 1), (3, 4, 5, 6, 0, 1, 2),
    (4, 5, 6, 0, 1, 2, 3), (5, 6, 0, 1, 2, 3, 4),
    (6, 0, 1, 2, 3, 4, 5))
_NEW_ADJ_III = (
    (0, 0, 0, 0, 0, 0, 0), (0, 1, 0, 3, 0, 1, 0),
    (0, 0, 2, 2, 0, 0, 6), (0, 3, 2, 3, 0, 0, 0),
    (0, 0, 0, 0, 4, 5, 4), (0, 1, 0, 0, 5, 5, 0),
    (0, 0, 6, 0, 4, 0, 6))
# neighbor probe order (algos.c:62-64): J, JK, K, IK, I, IJ
_DISK_DIRECTIONS = (2, 3, 1, 5, 4, 6)

_ROT_CCW_T = tuple(int(v) for v in _ROT_CCW)
_ROT_CW_T = tuple(int(v) for v in _ROT_CW)


def _get_digit(h: int, r: int) -> int:
    return (h >> ((_MAX_RES - r) * 3)) & 7


def _set_digit(h: int, r: int, d: int) -> int:
    sh = (_MAX_RES - r) * 3
    return (h & ~(7 << sh)) | (d << sh)


def _get_res(h: int) -> int:
    return (h >> 52) & 15


def _lead_digit_1(h: int) -> int:
    for r in range(1, _get_res(h) + 1):
        d = _get_digit(h, r)
        if d:
            return d
    return 0


def _rot60_1(h: int, table) -> int:
    for r in range(1, _get_res(h) + 1):
        h = _set_digit(h, r, table[_get_digit(h, r)])
    return h


def _rot_pent60ccw_1(h: int) -> int:
    h = _rot60_1(h, _ROT_CCW_T)
    if _lead_digit_1(h) == 1:
        h = _rot60_1(h, _ROT_CCW_T)
    return h


def cell_neighbor(origin: int, direction: int,
                  rotations: int = 0):
    """h3NeighborRotations (algos.c:352-500): the neighbor of
    `origin` in ijk `direction` (1-6), handling base-cell edges and
    the pentagon deleted-k subsequence. Returns (neighbor,
    rotations) or (None, rotations) when the move falls into a
    pentagon's deleted direction (E_PENTAGON)."""
    cur = int(origin)
    d = direction
    rotations %= 6
    for _ in range(rotations):
        d = _ROT_CCW_T[d]
    old_bc = (cur >> 45) & 127
    old_lead = _lead_digit_1(cur)
    new_rots = 0
    r = _get_res(cur) - 1
    while True:
        if r == -1:
            nb = int(_BC_NB[old_bc, d])
            new_rots = int(_BC_NB_ROT[old_bc, d])
            if nb == 127:  # deleted k vertex at base-cell level
                nb = int(_BC_NB[old_bc, 5])  # IK
                new_rots = int(_BC_NB_ROT[old_bc, 5])
                cur = _rot60_1(cur, _ROT_CCW_T)
                rotations += 1
            cur = (cur & ~(127 << 45)) | (nb << 45)
            break
        old_digit = _get_digit(cur, r + 1)
        if old_digit == 7:
            raise ValueError("h3: invalid digit in cell")
        if (r + 1) % 2:  # Class III level
            cur = _set_digit(cur, r + 1, _NEW_DIGIT_II[old_digit][d])
            next_dir = _NEW_ADJ_II[old_digit][d]
        else:
            cur = _set_digit(cur, r + 1,
                             _NEW_DIGIT_III[old_digit][d])
            next_dir = _NEW_ADJ_III[old_digit][d]
        if next_dir != 0:
            d = next_dir
            r -= 1
        else:
            break

    new_bc = (cur >> 45) & 127
    if _BC_IS_PENT[new_bc]:
        adjusted_k = False
        if _lead_digit_1(cur) == 1:
            if old_bc != new_bc:
                # traversed INTO a pentagon's deleted subsequence
                if (BASE_CELL_DATA[new_bc][5]
                        == BASE_CELL_DATA[old_bc][0]
                        or BASE_CELL_DATA[new_bc][6]
                        == BASE_CELL_DATA[old_bc][0]):
                    cur = _rot60_1(cur, _ROT_CW_T)
                else:  # pragma: no cover - unreachable per H3
                    cur = _rot60_1(cur, _ROT_CCW_T)
                adjusted_k = True
            else:
                if old_lead == 0:
                    return None, rotations  # E_PENTAGON
                if old_lead == 3:  # JK
                    cur = _rot60_1(cur, _ROT_CCW_T)
                    rotations += 1
                elif old_lead == 5:  # IK
                    cur = _rot60_1(cur, _ROT_CW_T)
                    rotations += 5
                else:  # pragma: no cover - fuzzer-only per H3
                    raise ValueError("h3: bad pentagon traversal")
        for _ in range(new_rots):
            cur = _rot_pent60ccw_1(cur)
        if old_bc != new_bc:
            if new_bc in _POLAR_PENT:
                if old_bc != 118 and old_bc != 8 \
                        and _lead_digit_1(cur) != 3:
                    rotations += 1
            elif _lead_digit_1(cur) == 5 and not adjusted_k:
                rotations += 1
    else:
        for _ in range(new_rots):
            cur = _rot60_1(cur, _ROT_CCW_T)
    return cur, (rotations + new_rots) % 6


def grid_disk_real(origin: int, k: int) -> dict:
    """gridDiskDistancesSafe (algos.c BFS): {cell: distance} for
    all cells within grid distance k of origin — pentagon-safe."""
    origin = int(origin)
    best = {origin: 0}
    frontier = [origin]
    for dist in range(1, k + 1):
        nxt = []
        for cell in frontier:
            for d in _DISK_DIRECTIONS:
                nb, _ = cell_neighbor(cell, d)
                if nb is None:
                    continue
                if nb not in best or best[nb] > dist:
                    best[nb] = dist
                    nxt.append(nb)
        frontier = nxt
    return best


def polyfill_real(ring: list, res: int) -> np.ndarray:
    """polygonToCells on real ids (H3 semantics: a cell belongs to
    the polygon iff its CENTER is inside). Construction: seed cells
    by encoding a lat/lng grid over the ring's bbox at a step below
    the cell inradius, expand each seed by one grid ring (coverage
    guarantee: any polygon-center cell is within one ring of a
    sampled cell), then keep exactly the cells whose center passes
    an even-odd ray cast — the same membership rule as
    polyfill.c's pointInside, so the result is exact, not
    approximate. `ring`: [(lat, lng), ...]."""
    la = np.array([p[0] for p in ring], dtype=np.float64)
    lo = np.array([p[1] for p in ring], dtype=np.float64)
    if (lo.max() - lo.min()) > 180.0:
        raise ValueError(
            "h3 polyfill_real: antimeridian-crossing rings are not "
            "supported (split the polygon first)")
    # average hex edge shrinks by sqrt(7) per res; res-0 mean edge
    # ~0.18 rad of arc -> degrees, conservatively halved
    edge_deg = 20.0 / (_SQRT7 ** res)
    step = max(edge_deg / 2.0, 1e-7)
    glat = np.arange(la.min() - step, la.max() + step, step)
    glng = np.arange(lo.min() - step, lo.max() + step, step)
    mg = np.meshgrid(glat, glng, indexing="ij")
    seeds = np.unique(latlng_to_cell(
        mg[0].ravel(), mg[1].ravel(), res))
    cand = set(int(s) for s in seeds)
    for s in seeds:
        cand.update(grid_disk_real(int(s), 1))
    ids = np.array(sorted(cand), dtype=np.uint64)
    cla, clo = cell_to_latlng(ids)

    # even-odd ray cast on the ring (lat/lng plane, the polyfill.c
    # membership rule)
    inside = np.zeros(len(ids), dtype=bool)
    nvert = len(la)
    for a in range(nvert):
        b = (a + 1) % nvert
        ya, xa = la[a], lo[a]
        yb, xb = la[b], lo[b]
        crosses = ((ya > cla) != (yb > cla))
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = xa + (cla - ya) * (xb - xa) / (yb - ya)
        inside ^= crosses & (clo < xint)
    return ids[inside]
