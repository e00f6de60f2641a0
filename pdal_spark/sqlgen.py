"""Dialect-aware SQL formula library.

Every closed-form spatial primitive of the engine (deterministic
geocode, quadtree cell index, Morton key, hex binning, mercator,
haversine) is defined ONCE here as a SQL expression generator that
renders for two dialects:

- SPARK  -> used by the engine itself via ``F.expr(...)`` (pure
  Catalyst expressions, whole-stage codegen, no Python in the hot
  path);
- DUCKDB -> used by ``__spark_entry__.oracle_sql()`` so the driver's
  correctness gate checks the exact same arithmetic.

This replaces the vendored h3 / GridPnp / hexer libraries of the
reference (PDAL builds cell indexes in C++: filters/H3Filter.cpp:96-130,
filters/private/hexer/HexGrid.cpp) with closed-form integer/IEEE math
that is reproducible in any engine.

Determinism notes:
- integer arithmetic is int64-safe by construction (bounds documented
  per function);
- float constants are rendered via :func:`fnum` (scientific notation)
  because Spark parses plain decimal literals as DECIMAL while DuckDB
  parses them as DOUBLE;
- +,-,*,/ on doubles are IEEE-correctly-rounded in both engines, so
  identical expression trees give bit-identical results; transcendental
  functions (sin/cos/ln/tan) may differ in the last ulps between the
  JVM and libm — formulas using them are flagged ``INEXACT`` and
  consumers must round before hash-comparison.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Dialect:
    name: str

    def shl(self, e: str, n: int) -> str:
        if self.name == "spark":
            return f"shiftleft({e}, {n})"
        return f"(({e}) << {n})"

    def shr(self, e: str, n: int) -> str:
        if self.name == "spark":
            return f"shiftright({e}, {n})"
        return f"(({e}) >> {n})"

    def arr_lookup(self, values: list[int], idx: str) -> str:
        """1-based literal-array lookup; the array literal constant-
        folds in both engines (Spark CreateArray of literals folds to
        a Literal; DuckDB folds bracket lists), so codegen references
        one constant, not a per-row construction."""
        csv = ",".join(str(v) for v in values)
        one = f"cast(({idx}) as int) + 1"
        if self.name == "spark":
            return f"element_at(array({csv}), {one})"
        return f"list_extract([{csv}], {one})"

    def idiv(self, a: str, b: int) -> str:
        if self.name == "spark":
            return f"(({a}) div {b})"
        return f"(({a}) // {b})"

    def ln(self, e: str) -> str:
        return f"ln({e})"


def fnum(v: float) -> str:
    """Render a float constant so BOTH dialects parse it as DOUBLE.

    Spark SQL parses plain decimal literals (e.g. ``1000.0``) as
    DECIMAL, which silently switches arithmetic to decimal math and
    breaks bit-parity with DuckDB's double math. Scientific notation
    is DOUBLE in both. Python repr is the shortest exact round-trip
    (a fixed %.17e rendering of DBL_MAX overflows Spark's literal
    range check); an exponent suffix is forced when missing.
    """
    s = repr(float(v))
    return s if ("e" in s or "E" in s) else s + "e0"


SPARK = Dialect("spark")
DUCKDB = Dialect("duckdb")

# ---------------------------------------------------------------------------
# Deterministic geocode (FIXTURES.md F1): two-round Lehmer LCG over a
# non-negative int64 id. All intermediates < 1.04e14, int64-safe.
# ---------------------------------------------------------------------------

M31 = 2147483647  # 2^31 - 1 (prime)


def lehmer2(id_expr: str) -> str:
    """Two Lehmer rounds; returns an int expr in [0, 2^31-1)."""
    h1 = f"(((({id_expr}) + 7) * 48271) % {M31})"
    return f"(({h1} * 48271) % {M31})"


def lehmer2_wide(id_expr: str) -> str:
    """lehmer2 safe for FULL-range int64 ids (e.g. xxhash64-derived):
    a dialect-neutral non-negative reduction into [0, 2^31-1) first,
    so the multiply never exceeds ~2^47 (no ANSI long overflow)."""
    red = f"((({id_expr}) % {M31} + {M31}) % {M31})"
    return lehmer2(red)


def mix_hash(id_expr: str) -> str:
    """Non-linear integer hash into [0, 2^31-1): lehmer2 -> modular
    SQUARE -> lehmer round. lehmer2 alone is affine in the id, so
    sequential ids map to an arithmetic progression whose low-bit
    statistics are pathological (e.g. HyperLogLog trailing-zero ranks
    bias the estimate ~2x); the quadratic step breaks linearity.
    Dialect-neutral: +, *, % on int64 only (square < 2^62); input may
    be ANY int64 (lehmer2_wide-style non-negative reduction first)."""
    h = lehmer2_wide(id_expr)
    g = f"((({h}) * ({h})) % {M31})"
    return f"(((({g}) + 7) * 48271) % {M31})"


def geo_lon(id_expr: str) -> str:
    """Deterministic longitude in [-180, 180) (millidegree grid)."""
    return f"(({lehmer2(id_expr)} % 360000) / {fnum(1000.0)} - {fnum(180.0)})"


def geo_lat(id_expr: str) -> str:
    """Deterministic latitude in [-85, 85) (millidegree grid)."""
    h = f"(({lehmer2(id_expr)} * 69621) % {M31})"
    return f"(({h} % 170000) / {fnum(1000.0)} - {fnum(85.0)})"


# ---------------------------------------------------------------------------
# Quadtree cell index ("qcell") — the engine's H3 analog
# (reference: filters/H3Filter.cpp latLngToCell; H3 is uint64 in
# pdal/Dimension.json). A qcell packs (res, ix, iy) into one int64:
#     cell = res * 2^54 + ix * 2^27 + iy,  res in [0, 26]
# Hierarchical: parent at res-k has ix>>k, iy>>k. Fits int64 for
# res <= 26 (26 * 2^54 ≈ 4.7e17 < 9.2e18).
# ---------------------------------------------------------------------------

QCELL_RES_SHIFT = 54
QCELL_IX_SHIFT = 27
MAX_RES = 26


def _grid_index(coord: str, lo: float, span: float, res: int) -> str:
    n = 1 << res
    raw = (
        f"cast(floor(((({coord}) - {fnum(lo)}) / {fnum(span)})"
        f" * {fnum(float(n))}) as bigint)"
    )
    return f"least(greatest({raw}, 0), {n - 1})"


def qcell_ix(lon: str, res: int) -> str:
    return _grid_index(lon, -180.0, 360.0, res)


def qcell_iy(lat: str, res: int) -> str:
    return _grid_index(lat, -90.0, 180.0, res)


def qcell(lat: str, lon: str, res: int) -> str:
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    ix = qcell_ix(lon, res)
    iy = qcell_iy(lat, res)
    return (
        f"({res} * {1 << QCELL_RES_SHIFT} + ({ix}) * {1 << QCELL_IX_SHIFT}"
        f" + ({iy}))"
    )


def qcell_res(cell: str, d: Dialect) -> str:
    return d.idiv(cell, 1 << QCELL_RES_SHIFT)


def qcell_deconstruct(cell: str, d: Dialect) -> tuple[str, str]:
    """Return (ix, iy) exprs of a qcell (resolution-agnostic)."""
    rest = f"(({cell}) % {1 << QCELL_RES_SHIFT})"
    ix = d.idiv(rest, 1 << QCELL_IX_SHIFT)
    iy = f"(({cell}) % {1 << QCELL_IX_SHIFT})"
    return ix, iy


def qcell_parent(cell: str, res: int, parent_res: int, d: Dialect) -> str:
    """Parent cell at a coarser resolution (H3 cellToParent analog)."""
    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    k = res - parent_res
    ix, iy = qcell_deconstruct(cell, d)
    pix = d.idiv(ix, 1 << k)
    piy = d.idiv(iy, 1 << k)
    return (
        f"({parent_res} * {1 << QCELL_RES_SHIFT}"
        f" + ({pix}) * {1 << QCELL_IX_SHIFT} + ({piy}))"
    )


def qcell_pack(ix: str, iy: str, res: int) -> str:
    """Pack grid indexes into a qcell id (inverse of
    qcell_deconstruct; same layout as :func:`qcell`)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    return (
        f"({res} * {1 << QCELL_RES_SHIFT} + ({ix}) * {1 << QCELL_IX_SHIFT}"
        f" + ({iy}))"
    )


def ix_center_lon(ix: str, res: int) -> str:
    """Center longitude of grid column ``ix`` at ``res``."""
    return (
        f"((({ix}) + {fnum(0.5)}) * {fnum(360.0 / (1 << res))}"
        f" - {fnum(180.0)})"
    )


def iy_center_lat(iy: str, res: int) -> str:
    """Center latitude of grid row ``iy`` at ``res``."""
    return (
        f"((({iy}) + {fnum(0.5)}) * {fnum(180.0 / (1 << res))}"
        f" - {fnum(90.0)})"
    )


def qcell_center_lon(cell: str, res: int, d: Dialect) -> str:
    ix, _ = qcell_deconstruct(cell, d)
    return ix_center_lon(ix, res)


def qcell_center_lat(cell: str, res: int, d: Dialect) -> str:
    _, iy = qcell_deconstruct(cell, d)
    return iy_center_lat(iy, res)


# ---------------------------------------------------------------------------
# Morton (Z-order) key — physical clustering key for tile layout
# (reference capability: filters/MortonOrderFilter.cpp:217). Bit
# interleave of two <=26-bit grid indexes via magic-mask spreading.
# ---------------------------------------------------------------------------

_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _part1by1(e: str, d: Dialect) -> str:
    x = f"(({e}) & 67108863)"  # 26 bits
    for n, mask in _SPREAD:
        x = f"((({x}) | {d.shl(x, n)}) & {mask})"
    return x


def morton_key(ix: str, iy: str, d: Dialect) -> str:
    return f"({_part1by1(ix, d)} | {d.shl(_part1by1(iy, d), 1)})"


def morton_from_lonlat(lat: str, lon: str, res: int, d: Dialect) -> str:
    return morton_key(qcell_ix(lon, res), qcell_iy(lat, res), d)


# ---------------------------------------------------------------------------
# Hex binning (pointy-top axial coords + cube rounding) — the hexbin
# tessellation of filters/HexBinFilter.cpp re-done as closed-form math
# instead of the vendored hexer grid walk. `size` = hex circumradius
# (PDAL's edge_length). Returns axial (q, r) packed into one int64:
#     hexid = (q + 2^25) * 2^27 + (r + 2^25)
# ---------------------------------------------------------------------------

SQRT3_3 = 0.5773502691896258
THIRD = 0.3333333333333333
TWO_THIRD = 0.6666666666666666
HEX_OFF = 1 << 25
HEX_SHIFT = 1 << 27


def hex_qr_frac(x: str, y: str, size: float) -> tuple[str, str]:
    qf = (
        f"(({fnum(SQRT3_3)} * ({x}) - {fnum(THIRD)} * ({y}))"
        f" / {fnum(size)})"
    )
    rf = f"(({fnum(TWO_THIRD)} * ({y})) / {fnum(size)})"
    return qf, rf


def hexcell(x: str, y: str, size: float) -> str:
    qf, rf = hex_qr_frac(x, y, size)
    # cube coords: xf=qf, zf=rf, yf=-qf-rf; round each, then push the
    # largest rounding error back onto the axis it came from.
    yf = f"(-({qf}) - ({rf}))"
    rx, ry, rz = f"round({qf})", f"round({yf})", f"round({rf})"
    dx = f"abs({rx} - ({qf}))"
    dy = f"abs({ry} - ({yf}))"
    dz = f"abs({rz} - ({rf}))"
    fix_x = f"(({dx}) > ({dy}) AND ({dx}) > ({dz}))"
    fix_y = f"(NOT (({dx}) > ({dy}) AND ({dx}) > ({dz})) AND ({dy}) > ({dz}))"
    q = f"(CASE WHEN {fix_x} THEN -({ry}) - ({rz}) ELSE {rx} END)"
    r = (
        f"(CASE WHEN NOT {fix_x} AND NOT {fix_y}"
        f" THEN -({rx}) - ({ry}) ELSE {rz} END)"
    )
    qi = f"cast({q} as bigint)"
    ri = f"cast({r} as bigint)"
    return f"((({qi}) + {HEX_OFF}) * {HEX_SHIFT} + (({ri}) + {HEX_OFF}))"


def hexcell_q(cell: str, d: Dialect) -> str:
    return f"({d.idiv(cell, HEX_SHIFT)} - {HEX_OFF})"


def hexcell_r(cell: str, d: Dialect) -> str:
    return f"((({cell}) % {HEX_SHIFT}) - {HEX_OFF})"


def hexcell_center_x(cell: str, size: float, d: Dialect) -> str:
    q, r = hexcell_q(cell, d), hexcell_r(cell, d)
    return (
        f"({fnum(size)} * ({fnum(1.7320508075688772)} * ({q})"
        f" + {fnum(0.8660254037844386)} * ({r})))"
    )


def hexcell_center_y(cell: str, size: float, d: Dialect) -> str:
    r = hexcell_r(cell, d)
    return f"({fnum(size)} * {fnum(1.5)} * ({r}))"


# Hexagon area for density = count / area
# (filters/HexBinFilter.cpp:224-301): 3*sqrt(3)/2 * size^2.
def hex_area(size: float) -> float:
    return 2.598076211353316 * size * size


# ---------------------------------------------------------------------------
# Square tiling (filters/SplitterFilter.cpp:218-227: squareContains
# uses floor((coord - origin) / length)).
# ---------------------------------------------------------------------------


def tile_pos(coord: str, origin: float, length: float) -> str:
    return (
        f"cast(floor((({coord}) - {fnum(origin)}) / {fnum(length)})"
        f" as bigint)"
    )


def tile_id(x: str, y: str, ox: float, oy: float, length: float) -> str:
    """Pack (xpos, ypos) into one int64 (offset by 2^25 for negatives)."""
    tx = tile_pos(x, ox, length)
    ty = tile_pos(y, oy, length)
    return f"((({tx}) + {HEX_OFF}) * {HEX_SHIFT} + (({ty}) + {HEX_OFF}))"


def tile_x(tid: str, d: Dialect) -> str:
    return f"({d.idiv(tid, HEX_SHIFT)} - {HEX_OFF})"


def tile_y(tid: str, d: Dialect) -> str:
    return f"((({tid}) % {HEX_SHIFT}) - {HEX_OFF})"


def _tile_pack(tx: str, ty: str) -> str:
    return f"((({tx}) + {HEX_OFF}) * {HEX_SHIFT} + (({ty}) + {HEX_OFF}))"


def splitter_parts(
    x: str, y: str, ox: float, oy: float, length: float, buffer: float
) -> tuple[str, list[tuple[str, str]]]:
    """Buffered-splitter membership expressions shared by engine and
    oracle (filters/SplitterFilter.cpp:195-214 squareContains logic).

    Returns (base_tile_expr, [(condition, neighbor_tile_expr), ...]):
    a point belongs to its base tile always, and to each neighbor
    tile whose buffer-expanded square strictly contains it (<= 3
    extras for buffer <= length/2).
    """
    tx = tile_pos(x, ox, length)
    ty = tile_pos(y, oy, length)
    lx = f"({fnum(ox)} + ({tx}) * {fnum(length)})"
    ly = f"({fnum(oy)} + ({ty}) * {fnum(length)})"
    sx = (
        f"(CASE WHEN ({x}) < {lx} + {fnum(buffer)} THEN -1"
        f" WHEN ({x}) > {lx} + {fnum(length - buffer)} THEN 1"
        f" ELSE 0 END)"
    )
    sy = (
        f"(CASE WHEN ({y}) < {ly} + {fnum(buffer)} THEN -1"
        f" WHEN ({y}) > {ly} + {fnum(length - buffer)} THEN 1"
        f" ELSE 0 END)"
    )
    base = _tile_pack(tx, ty)
    branches = [
        (f"{sx} <> 0", _tile_pack(f"({tx}) + {sx}", ty)),
        (f"{sy} <> 0", _tile_pack(tx, f"({ty}) + {sy}")),
        (
            f"{sx} <> 0 AND {sy} <> 0",
            _tile_pack(f"({tx}) + {sx}", f"({ty}) + {sy}"),
        ),
    ]
    return base, branches


# ---------------------------------------------------------------------------
# Geodesy — INEXACT (trig): round before hash-comparison.
# haversine distance (m) and Web-Mercator (EPSG:3857), the closed-form
# core of filters/reprojection (ReprojectionFilter.cpp) for the one
# projection pair the engine ships built-in.
# ---------------------------------------------------------------------------

EARTH_R = 6371008.8
MERC_K = 20037508.342789244
RAD = 0.017453292519943295  # pi/180
DEG = 57.29577951308232  # 180/pi
PI = 3.141592653589793


def haversine_m(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    dlat = f"((({lat2}) - ({lat1})) * {fnum(RAD)} / {fnum(2.0)})"
    dlon = f"((({lon2}) - ({lon1})) * {fnum(RAD)} / {fnum(2.0)})"
    a = (
        f"(sin({dlat}) * sin({dlat}) + cos(({lat1}) * {fnum(RAD)}) *"
        f" cos(({lat2}) * {fnum(RAD)}) * sin({dlon}) * sin({dlon}))"
    )
    return f"({fnum(2.0 * EARTH_R)} * asin(sqrt({a})))"


def mercator_x(lon: str) -> str:
    return f"(({lon}) * {fnum(MERC_K / 180.0)})"


def mercator_y(lat: str, d: Dialect) -> str:
    t = f"tan(({fnum(90.0)} + ({lat})) * {fnum(PI / 360.0)})"
    return f"({d.ln(t)} * {fnum(MERC_K / PI)})"


def inv_mercator_lon(mx: str) -> str:
    return f"(({mx}) / {fnum(MERC_K / 180.0)})"


def inv_mercator_lat(my: str) -> str:
    e = f"exp(({my}) * {fnum(PI / MERC_K)})"
    return f"({fnum(2.0)} * atan({e}) * {fnum(DEG)} - {fnum(90.0)})"


# ---------------------------------------------------------------------------
# UTM (EPSG:326xx north / 327xx south) — transverse Mercator via the
# Karney/Krueger series (3 alpha/beta terms: sub-mm inside a zone).
# Reference semantics: filters/ReprojectionFilter.cpp:199-220 (PDAL
# delegates to PROJ; this is the closed-form for the most-used
# projected family, oracle-able without pyproj). INEXACT (trig/exp):
# quantize before hash-comparison (utm_xy_mm does, to integer mm).
# Series per Karney 2011 "Transverse Mercator with an accuracy of a
# few nanometers" (public derivation; same coefficients PROJ uses).
# ---------------------------------------------------------------------------

UTM_A = 6378137.0  # WGS84 semi-major
UTM_F = 1.0 / 298.257223563
UTM_K0 = 0.9996
UTM_E0 = 500000.0
UTM_N0_SOUTH = 10000000.0
_N3 = UTM_F / (2.0 - UTM_F)
UTM_AA = UTM_A / (1.0 + _N3) * (1.0 + _N3 * _N3 / 4.0
                                + _N3 ** 4 / 64.0)
UTM_ALPHA = (
    _N3 / 2.0 - 2.0 * _N3 ** 2 / 3.0 + 5.0 * _N3 ** 3 / 16.0,
    13.0 * _N3 ** 2 / 48.0 - 3.0 * _N3 ** 3 / 5.0,
    61.0 * _N3 ** 3 / 240.0,
)
UTM_BETA = (
    _N3 / 2.0 - 2.0 * _N3 ** 2 / 3.0 + 37.0 * _N3 ** 3 / 96.0,
    _N3 ** 2 / 48.0 + _N3 ** 3 / 15.0,
    17.0 * _N3 ** 3 / 480.0,
)
UTM_DELTA = (
    2.0 * _N3 - 2.0 * _N3 ** 2 / 3.0 - 2.0 * _N3 ** 3,
    7.0 * _N3 ** 2 / 3.0 - 8.0 * _N3 ** 3 / 5.0,
    56.0 * _N3 ** 3 / 15.0,
)
UTM_C = 2.0 * (_N3 ** 0.5) / (1.0 + _N3)


def _sinh(e: str) -> str:
    # spelled via exp in BOTH dialects (DuckDB lacks hyperbolics;
    # identical expression trees keep engines in last-ulp lockstep)
    return f"((exp({e}) - exp(-({e}))) / {fnum(2.0)})"


def _cosh(e: str) -> str:
    return f"((exp({e}) + exp(-({e}))) / {fnum(2.0)})"


def _atanh(e: str, d: Dialect) -> str:
    x = f"({e})"
    return (f"({fnum(0.5)} * "
            f"{d.ln(f'(({fnum(1.0)} + {x}) / ({fnum(1.0)} - {x}))')})")


def _asinh(e: str, d: Dialect) -> str:
    x = f"({e})"
    return d.ln(f"({x} + sqrt({x} * {x} + {fnum(1.0)}))")


def utm_lon0(zone: int) -> float:
    return float(zone) * 6.0 - 183.0


def utm_xy(lat: str, lon: str, zone: int, d: Dialect,
           south: bool = False) -> tuple[str, str]:
    """(easting_m, northing_m) DOUBLE expressions — INEXACT, round
    before hashing (see utm_xy_mm)."""
    phi = f"(({lat}) * {fnum(RAD)})"
    lam = f"((({lon}) - {fnum(utm_lon0(zone))}) * {fnum(RAD)})"
    sphi = f"sin({phi})"
    t = _sinh(
        f"{_atanh(sphi, d)} - {fnum(UTM_C)}"
        f" * {_atanh(f'{fnum(UTM_C)} * {sphi}', d)}"
    )
    xi = f"atan2({t}, cos({lam}))"
    eta = _asinh(
        f"sin({lam}) / sqrt({t} * {t} + cos({lam}) * cos({lam}))", d
    )
    e_sum = f"({eta})"
    n_sum = f"({xi})"
    for j, aj in enumerate(UTM_ALPHA, start=1):
        k = fnum(2.0 * j)
        e_sum += (f" + {fnum(aj)} * cos({k} * {xi})"
                  f" * {_sinh(f'{k} * {eta}')}")
        n_sum += (f" + {fnum(aj)} * sin({k} * {xi})"
                  f" * {_cosh(f'{k} * {eta}')}")
    east = f"({fnum(UTM_E0)} + {fnum(UTM_K0 * UTM_AA)} * ({e_sum}))"
    n0 = UTM_N0_SOUTH if south else 0.0
    north = f"({fnum(n0)} + {fnum(UTM_K0 * UTM_AA)} * ({n_sum}))"
    return east, north


def utm_xy_mm(lat: str, lon: str, zone: int, d: Dialect,
              south: bool = False) -> tuple[str, str]:
    """Integer-mm quantized UTM coordinates — the hash-safe form."""
    e, n = utm_xy(lat, lon, zone, d, south)
    q = fnum(1000.0)
    h = fnum(0.5)
    return (
        f"cast(floor({e} * {q} + {h}) as bigint)",
        f"cast(floor({n} * {q} + {h}) as bigint)",
    )


def utm_inverse(east: str, north: str, zone: int, d: Dialect,
                south: bool = False) -> tuple[str, str]:
    """(lat_deg, lon_deg) DOUBLE expressions from UTM — INEXACT."""
    n0 = UTM_N0_SOUTH if south else 0.0
    ka = fnum(UTM_K0 * UTM_AA)
    xi = f"((({north}) - {fnum(n0)}) / {ka})"
    eta = f"((({east}) - {fnum(UTM_E0)}) / {ka})"
    xi_p = f"({xi})"
    eta_p = f"({eta})"
    for j, bj in enumerate(UTM_BETA, start=1):
        k = fnum(2.0 * j)
        xi_p += (f" - {fnum(bj)} * sin({k} * {xi})"
                 f" * {_cosh(f'{k} * {eta}')}")
        eta_p += (f" - {fnum(bj)} * cos({k} * {xi})"
                  f" * {_sinh(f'{k} * {eta}')}")
    xi_p, eta_p = f"({xi_p})", f"({eta_p})"
    chi = f"asin(sin({xi_p}) / {_cosh(eta_p)})"
    phi = f"({chi})"
    for j, dj in enumerate(UTM_DELTA, start=1):
        k = fnum(2.0 * j)
        phi += f" + {fnum(dj)} * sin({k} * {chi})"
    lon = (f"({fnum(utm_lon0(zone))} + atan2({_sinh(eta_p)},"
           f" cos({xi_p})) * {fnum(DEG)})")
    return f"(({phi}) * {fnum(DEG)})", lon


# Planar euclidean distance — EXACT only under sqrt's correct rounding
# (IEEE-guaranteed in both engines), safe for hash comparison.
def euclid2(x1: str, y1: str, x2: str, y2: str) -> str:
    dx = f"(({x2}) - ({x1}))"
    dy = f"(({y2}) - ({y1}))"
    return f"sqrt({dx} * {dx} + {dy} * {dy})"


# ---------------------------------------------------------------------------
# Convex-polygon point-in-polygon as a pure SQL predicate (used by the
# oracle and by the engine's fast path for convex geometries; general
# polygons go through the numpy ray-cast kernel in operators/crop.py).
# Reference semantics: filters/CropFilter.cpp:316-321 (point inside or
# on boundary).
# ---------------------------------------------------------------------------


def convex_pip(x: str, y: str, vertices: list[tuple[float, float]]) -> str:
    """CCW convex polygon: inside iff every edge cross product >= 0."""
    terms = []
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        cross = (
            f"(({fnum(x2)} - {fnum(x1)}) * (({y}) - {fnum(y1)})"
            f" - ({fnum(y2)} - {fnum(y1)}) * (({x}) - {fnum(x1)}))"
        )
        terms.append(f"{cross} >= {fnum(0.0)}")
    return "(" + " AND ".join(terms) + ")"


def raycast_pip(
    x: str, y: str, rings: list[list[tuple[float, float]]]
) -> str:
    """General (possibly concave, possibly holed) polygon even-odd
    ray cast, DIVISION-FREE: edge (x1,y1)-(x2,y2) crosses the +x ray
    from the test point iff the edge straddles its y and the point
    lies left of the edge at that height — the divided intersection
    test multiplied through by (y2-y1), with the inequality
    direction folded into a boolean equality against the sign of
    (y2-y1) computed at build time. Horizontal edges never cross.
    Identical text in both dialects; no division, so ANSI mode and
    IEEE bit-equality are both safe. Odd crossing parity = inside
    (holes fall out of the parity automatically).
    """
    terms = []
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = (float(v) for v in ring[i])
            x2, y2 = (float(v) for v in ring[(i + 1) % n])
            if y1 == y2:
                continue
            lhs = f"((({x}) - {fnum(x1)}) * {fnum(y2 - y1)})"
            rhs = f"((({y}) - {fnum(y1)}) * {fnum(x2 - x1)})"
            up = "TRUE" if y2 > y1 else "FALSE"
            terms.append(
                f"(CASE WHEN (({fnum(y1)} > ({y})) <> "
                f"({fnum(y2)} > ({y})))"
                f" AND (({lhs} < {rhs}) = {up})"
                f" THEN 1 ELSE 0 END)"
            )
    if not terms:
        return "FALSE"
    return f"((({' + '.join(terms)}) % 2) = 1)"


def segdist(
    px: str, py: str, rings: list[list[tuple[float, float]]]
) -> str:
    """Min distance from a point to any polygon edge: per edge, the
    clamped-projection point-to-segment closed form (mirror of
    functions.pip.dist_to_segments), unrolled and reduced with
    least(). Pure +,-,*,/,sqrt with build-time edge constants —
    identical in both dialects."""
    terms = []
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = (float(v) for v in ring[i])
            x2, y2 = (float(v) for v in ring[(i + 1) % n])
            dx, dy = x2 - x1, y2 - y1
            L2 = dx * dx + dy * dy
            if L2 == 0.0:
                ax = f"((({px}) - {fnum(x1)}))"
                ay = f"((({py}) - {fnum(y1)}))"
                terms.append(f"({ax} * {ax} + {ay} * {ay})")
                continue
            t = (
                f"least(greatest(((({px}) - {fnum(x1)}) * {fnum(dx)}"
                f" + (({py}) - {fnum(y1)}) * {fnum(dy)})"
                f" / {fnum(L2)}, {fnum(0.0)}), {fnum(1.0)})"
            )
            ax = f"((({px}) - ({fnum(x1)} + {t} * {fnum(dx)})))"
            ay = f"((({py}) - ({fnum(y1)} + {t} * {fnum(dy)})))"
            terms.append(f"({ax} * {ax} + {ay} * {ay})")
    return f"sqrt(least({', '.join(terms)}))"


# ---------------------------------------------------------------------------
# S2-analog cell index ("scell") — cube-face + Hilbert curve.
#
# The north_star pairs the H3 analog (qcell above) with S2-style cell
# encoding. Real S2 (s2geometry) maps a unit-sphere point to one of 6
# cube faces, projects to face (s,t), quantizes to (i,j), and orders
# cells along a per-face Hilbert curve; the 64-bit id is
#     face ‖ hilbert_position ‖ 1000…0   (lsb sentinel encodes level).
# We keep every structural property — 6-face decomposition (4
# equatorial + 2 polar caps, so no qcell-style polar degeneracy),
# Hilbert locality, fixed-width id with lsb sentinel, parent =
# prefix — but parameterize faces linearly in lat/lon (the
# S2_LINEAR_PROJECTION flavor) instead of via unit-vector trig:
# +,-,*,/ on doubles are IEEE-exact in both dialects, so cell ids
# hash-match the DuckDB oracle bit-for-bit, per this module's
# determinism policy (sin/cos would not).
#
# Id layout (signed-int64-safe):  face*2^60 + pos*2^(60-2L) + 2^(59-2L)
# for level L in [0, 29]; face in [0,5] so face*2^60 <= 5.8e18 < 2^63.
# Parent-prefix exactness: hilbert position of the parent cell equals
# pos >> 2 (validated property of the step recurrence; see
# tests/test_s2.py), so s2_parent is pure integer arithmetic.
# ---------------------------------------------------------------------------

S2_FACE_SHIFT = 60
S2_MAX_LEVEL = 29


def s2_face(lat: str, lon: str) -> str:
    """Face 0-3 = equatorial quadrants (|lat| < 45), 4 = north cap,
    5 = south cap. lon must lie in [-180, 180)."""
    feq = f"least(cast(floor((({lon}) + {fnum(180.0)}) / {fnum(90.0)}) as bigint), 3)"
    return (
        f"(CASE WHEN ({lat}) >= {fnum(45.0)} THEN 4 "
        f"WHEN ({lat}) < {fnum(-45.0)} THEN 5 "
        f"ELSE {feq} END)"
    )


def _s2_st(lat: str, lon: str, face: str) -> tuple[str, str]:
    """Face-local (s, t) in [0, 1) — linear projection per face."""
    feq_lon0 = f"(cast(({face}) as double) * {fnum(90.0)} - {fnum(180.0)})"
    s = (
        f"(CASE WHEN ({face}) >= 4"
        f" THEN (({lon}) + {fnum(180.0)}) / {fnum(360.0)}"
        f" ELSE (({lon}) - {feq_lon0}) / {fnum(90.0)} END)"
    )
    t = (
        f"(CASE WHEN ({face}) = 4 THEN (({lat}) - {fnum(45.0)}) / {fnum(45.0)}"
        f" WHEN ({face}) = 5 THEN (({lat}) + {fnum(90.0)}) / {fnum(45.0)}"
        f" ELSE (({lat}) + {fnum(45.0)}) / {fnum(90.0)} END)"
    )
    return s, t


def _clamp_ij(frac: str, level: int) -> str:
    n = 1 << level
    raw = f"cast(floor(({frac}) * {fnum(float(n))}) as bigint)"
    return f"least(greatest({raw}, 0), {n - 1})"


def s2_ij(lat: str, lon: str, face: str, level: int) -> tuple[str, str]:
    s, t = _s2_st(lat, lon, face)
    return _clamp_ij(s, level), _clamp_ij(t, level)


def _build_hilbert_tables() -> tuple[list[int], list[int]]:
    """3-bits-per-step Hilbert lookup tables (the table-driven form
    real s2geometry uses, 4 bits there). State = (swap, invert) in
    Z2 x Z2 over the bit pair; entry packs pos(6b)*4 + next_state.
    Generated from the validated 1-bit recurrence
    (tests/test_s2.py::xy2d) at import; ~256 entries each."""
    tbl = []
    for state in range(4):
        for ib in range(8):
            for jb in range(8):
                sw, inv = state & 1, state >> 1
                pos = 0
                for k in (2, 1, 0):
                    bi, bj = (ib >> k) & 1, (jb >> k) & 1
                    if sw:
                        bi, bj = bj, bi
                    if inv:
                        bi, bj = 1 - bi, 1 - bj
                    rx, ry = bi, bj
                    pos = pos * 4 + (3 * rx + ry - 2 * rx * ry)
                    if ry == 1:
                        u = (0, 0)
                    elif rx == 1:
                        u = (1, 1)
                    else:
                        u = (1, 0)
                    sw, inv = sw ^ u[0], inv ^ u[1]
                tbl.append(pos * 4 + (sw + 2 * inv))
    inv_tbl = [0] * 256
    for state in range(4):
        for ib in range(8):
            for jb in range(8):
                v = tbl[state * 64 + ib * 8 + jb]
                inv_tbl[state * 64 + v // 4] = (ib * 8 + jb) * 4 + v % 4
    return tbl, inv_tbl


HILBERT_TBL, HILBERT_INV_TBL = _build_hilbert_tables()


def _ifloor(e: str, div: int) -> str:
    """Dialect-free non-negative integer floor division."""
    return f"cast(floor(({e}) / {div}) as bigint)"


def hilbert_steps(
    prefix: str, ix: str, iy: str, level: int, d: Dialect
) -> list[tuple[str, str]]:
    """Hilbert xy2d as a named-column step chain, 3 bits per step via
    a 256-entry folded literal-array lookup. The 1-bit form needed
    3*level chained projections, whose generated method blew past
    HotSpot's JIT huge-method limit around level 10 (measured 20x
    slowdown: 18 -> 1 M rows/s); the table form is ceil(level/3)
    small steps and stays JIT-compiled to level 29. State is
    inherently sequential (each group's orientation depends on the
    prefix), hence a chain of named columns, linear plan size.

    Levels not divisible by 3 zero-pad the low bits (parent-prefix
    property: the padded curve position >> 2p is the level-`level`
    position). Ends with f"{prefix}_d".
    """
    if not 1 <= level <= S2_MAX_LEVEL:
        raise ValueError(f"level must be in [1, {S2_MAX_LEVEL}]")
    p = (3 - level % 3) % 3
    groups = (level + p) // 3
    steps: list[tuple[str, str]] = []
    ii, jj = f"{prefix}_ii", f"{prefix}_jj"
    steps.append((ii, f"(({ix}) * {1 << p})"))
    steps.append((jj, f"(({iy}) * {1 << p})"))
    dacc, state = "0", "0"
    for n, g in enumerate(range(groups - 1, -1, -1)):
        sh = 1 << (3 * g)
        vc, dc, sc = f"{prefix}_v{n}", f"{prefix}_dd{n}", f"{prefix}_s{n}"
        idx = (
            f"(({state}) * 64 + ({_ifloor(ii, sh)} % 8) * 8"
            f" + ({_ifloor(jj, sh)} % 8))"
        )
        steps.append((vc, d.arr_lookup(HILBERT_TBL, idx)))
        steps.append((dc, f"(({dacc}) * 64 + {_ifloor(vc, 4)})"))
        steps.append((sc, f"(({vc}) % 4)"))
        dacc, state = dc, sc
    steps.append((f"{prefix}_d", _ifloor(dacc, 1 << (2 * p))))
    return steps


def s2_pack(face: str, pos: str, level: int) -> str:
    """face ‖ hilbert pos ‖ sentinel — fixed-width signed-int64 id."""
    pshift = 1 << (S2_FACE_SHIFT - 2 * level)
    sentinel = 1 << (S2_FACE_SHIFT - 1 - 2 * level)
    return (
        f"(({face}) * {1 << S2_FACE_SHIFT}"
        f" + ({pos}) * {pshift} + {sentinel})"
    )


def s2_parent(cell: str, level: int, parent_level: int, d: Dialect) -> str:
    """Coarsen: keep face + top 2*parent_level position bits, re-set
    the sentinel. Pure integer arithmetic (parent-prefix property)."""
    if not 0 <= parent_level <= level <= S2_MAX_LEVEL:
        raise ValueError("need 0 <= parent_level <= level <= 29")
    w = 1 << (S2_FACE_SHIFT - 2 * parent_level)
    stripped = f"({d.idiv(cell, w)} * {w})"
    return f"({stripped} + {1 << (S2_FACE_SHIFT - 1 - 2 * parent_level)})"


def s2_face_of(cell: str, d: Dialect) -> str:
    return d.idiv(cell, 1 << S2_FACE_SHIFT)


def s2_pos_of(cell: str, level: int, d: Dialect) -> str:
    """Hilbert position of a level-`level` cell id."""
    w = 1 << (S2_FACE_SHIFT - 2 * level)
    return f"({d.idiv(cell, w)} % {1 << (2 * level)})"


def nested_steps_sql(base_sql: str, steps: list[tuple[str, str]], final_select: str) -> str:
    """Wrap a step chain into nested SELECTs for the DuckDB oracle
    (the SQL twin of the engine's withColumn chain)."""
    sql = base_sql
    for name, expr in steps:
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return f"SELECT {final_select} FROM ({sql}) fin"


def hilbert_inv_steps(
    prefix: str, d_expr: str, level: int, d: Dialect
) -> list[tuple[str, str]]:
    """Inverse Hilbert (d -> (i, j)), table-driven like
    hilbert_steps (6 curve bits per step, 256-entry inverse table).
    Ends with {prefix}_x / {prefix}_y."""
    if not 1 <= level <= S2_MAX_LEVEL:
        raise ValueError(f"level must be in [1, {S2_MAX_LEVEL}]")
    p = (3 - level % 3) % 3
    groups = (level + p) // 3
    steps: list[tuple[str, str]] = []
    dd = f"{prefix}_dd"
    steps.append((dd, f"(({d_expr}) * {1 << (2 * p)})"))
    x, y, state = "0", "0", "0"
    for n, g in enumerate(range(groups - 1, -1, -1)):
        sh = 1 << (6 * g)
        vc, xc, yc, sc = (
            f"{prefix}_v{n}", f"{prefix}_px{n}",
            f"{prefix}_py{n}", f"{prefix}_s{n}",
        )
        idx = f"(({state}) * 64 + ({_ifloor(dd, sh)} % 64))"
        steps.append((vc, d.arr_lookup(HILBERT_INV_TBL, idx)))
        ij = _ifloor(vc, 4)
        steps.append((xc, f"(({x}) * 8 + {_ifloor(f'({ij})', 8)})"))
        steps.append((yc, f"(({y}) * 8 + (({ij}) % 8))"))
        steps.append((sc, f"(({vc}) % 4)"))
        x, y, state = xc, yc, sc
    steps.append((f"{prefix}_x", _ifloor(x, 1 << p)))
    steps.append((f"{prefix}_y", _ifloor(y, 1 << p)))
    return steps


def s2_center_lon(face: str, i: str, level: int) -> str:
    """Cell-center longitude from (face, i) — inverse of _s2_st."""
    n = float(1 << level)
    s = f"((({i}) + {fnum(0.5)}) / {fnum(n)})"
    return (
        f"(CASE WHEN ({face}) >= 4 THEN ({s}) * {fnum(360.0)} - {fnum(180.0)}"
        f" ELSE ({s}) * {fnum(90.0)}"
        f" + cast(({face}) as double) * {fnum(90.0)} - {fnum(180.0)} END)"
    )


def s2_center_lat(face: str, j: str, level: int) -> str:
    n = float(1 << level)
    t = f"((({j}) + {fnum(0.5)}) / {fnum(n)})"
    return (
        f"(CASE WHEN ({face}) = 4 THEN ({t}) * {fnum(45.0)} + {fnum(45.0)}"
        f" WHEN ({face}) = 5 THEN ({t}) * {fnum(45.0)} - {fnum(90.0)}"
        f" ELSE ({t}) * {fnum(90.0)} - {fnum(45.0)} END)"
    )


# ---------------------------------------------------------------------------
# Web-mercator slippy tiles (z/x/y) + Bing quadkey — the XYZ layout
# rasterized output (writers.gdal analog) is served as. tile_y
# derives from a centimetre-quantized mercator y so both engines
# floor the SAME double (the round-on-both-sides policy above for
# transcendental ln/tan); tile_x is pure linear arithmetic.
# ---------------------------------------------------------------------------


def slippy_tx(lon: str, zoom: int) -> str:
    return _grid_index(lon, -180.0, 360.0, zoom)


def slippy_ty(lat: str, zoom: int, d: Dialect, quantize: int = 2) -> str:
    n = 1 << zoom
    myq = f"round({mercator_y(lat, d)}, {quantize})"
    raw = (
        f"cast(floor(({fnum(0.5)} - ({myq}) / {fnum(2.0 * MERC_K)})"
        f" * {fnum(float(n))}) as bigint)"
    )
    return f"least(greatest({raw}, 0), {n - 1})"


def quadkey_from_morton(m: str, zoom: int, d: Dialect) -> str:
    """Bing quadkey string: base-4 digits of the (tx, ty) morton
    interleave, most-significant level first (ty carries weight 2 —
    morton_key puts iy at odd bits)."""
    digits = [
        f"cast((({d.shr(m, 2 * i)}) % 4) as string)"
        for i in range(zoom - 1, -1, -1)
    ]
    return f"concat({', '.join(digits)})"


# ---------------------------------------------------------------------------
# Geohash — the third classic cell-index family next to qcell/H3 and
# S2/Hilbert (filters.h3's stage pattern on the base-32 public grid).
# Canonical geohash: interleave lon/lat bisection bits starting with
# LONGITUDE at the most significant bit, then render 5-bit groups in
# the base-32 alphabet. The bit string is exactly a Morton interleave
# of the two grid indexes, so it reuses the magic-mask spreader:
#   even precision p: 5p/2 lon bits + 5p/2 lat bits, MSB is an odd
#     Morton position -> lon rides iy (morton_key puts iy at odd bits);
#   odd precision p: (5p+1)/2 lon + (5p-1)/2 lat, MSB is an even
#     position -> lon rides ix.
# floor nesting (floor(f*2^a) >> k == floor(f*2^(a-k))) makes the code
# a PREFIX CODE: truncating chars (or taking the int prefix bits)
# yields the coarser cell, so prefix rollups / range scans need no
# re-encode. Integer-exact; max p=10 (50 bits) fits int64.
# ---------------------------------------------------------------------------

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_MAX_P = 10


def geohash_bits(precision: int) -> tuple[int, int]:
    """(lon_bits, lat_bits) of a p-char geohash."""
    total = 5 * precision
    return (total + 1) // 2, total // 2


def geohash_int(lat: str, lon: str, precision: int, d: Dialect) -> str:
    """The 5p-bit geohash as an int64 (the clustering/join key form)."""
    if not 1 <= precision <= GEOHASH_MAX_P:
        raise ValueError(f"precision must be in [1, {GEOHASH_MAX_P}]")
    nlon, nlat = geohash_bits(precision)
    ixlon = _grid_index(lon, -180.0, 360.0, nlon)
    ixlat = _grid_index(lat, -90.0, 180.0, nlat)
    if precision % 2 == 0:
        return morton_key(ixlat, ixlon, d)  # lon at odd bits (MSB)
    return morton_key(ixlon, ixlat, d)  # lon at even bits (MSB)


def geohash_str(gh_int: str, precision: int, d: Dialect) -> str:
    """Render the int form as the public base-32 string."""
    chars = [
        f"substring('{GEOHASH32}',"
        f" cast((({d.shr(gh_int, 5 * i)}) % 32) as int) + 1, 1)"
        for i in range(precision - 1, -1, -1)
    ]
    return f"concat({', '.join(chars)})"


def geohash_center_lon(lat: str, lon: str, precision: int) -> str:
    """Cell-center longitude — from the grid index directly (same
    floor as the encode), so no inverse interleave is ever needed."""
    nlon, _ = geohash_bits(precision)
    ix = _grid_index(lon, -180.0, 360.0, nlon)
    return (
        f"((({ix}) + {fnum(0.5)}) * {fnum(360.0 / (1 << nlon))}"
        f" - {fnum(180.0)})"
    )


def geohash_center_lat(lat: str, lon: str, precision: int) -> str:
    _, nlat = geohash_bits(precision)
    iy = _grid_index(lat, -90.0, 180.0, nlat)
    return (
        f"((({iy}) + {fnum(0.5)}) * {fnum(180.0 / (1 << nlat))}"
        f" - {fnum(90.0)})"
    )


def py_mix_hash(x: int) -> int:
    """Python twin of mix_hash (identical arithmetic): lets the
    driver bake hash-derived constants (e.g. random-projection signs)
    into plans as literals while oracles recompute them with the SQL
    formula."""
    red = ((int(x) % M31) + M31) % M31
    h1 = ((red + 7) * 48271) % M31
    h = (h1 * 48271) % M31
    g = (h * h) % M31
    return ((g + 7) * 48271) % M31


def zorder_key(
    cols: list[tuple[str, float, float]],
    bits: int,
    d: Dialect,
) -> str:
    """Generic N-column Z-order (Morton) interleave: each column is
    equi-width bucketed into 2^bits cells over its EXPLICIT (lo, hi)
    bounds (clamped), then bit b of column c lands at key bit
    b*m + c. The multi-dimensional generalization of
    morton_from_lonlat: the physical clustering key that makes
    parquet/Iceberg min-max stats prune range predicates on EVERY
    participating column at once. Bucket arithmetic is one double
    multiply + floor per column — identical IEEE ops both engines."""
    m = len(cols)
    scale = float(1 << bits)
    ixs = []
    for expr, lo, hi in cols:
        frac = f"((CAST({expr} AS DOUBLE) - {fnum(lo)}) / {fnum(hi - lo)})"
        ix = (f"least(CAST({(1 << bits) - 1} AS BIGINT), "
              f"greatest(CAST(0 AS BIGINT), "
              f"CAST(floor({frac} * {fnum(scale)}) AS BIGINT)))")
        ixs.append(ix)
    terms = []
    for b in range(bits):
        for c, ix in enumerate(ixs):
            bit = f"({d.shr(ix, b)} % 2)"
            terms.append(d.shl(bit, b * m + c))
    return "(" + " + ".join(terms) + ")"


def qcell_neighbor(cell: str, dx: str, dy: str, res: int, d: Dialect) -> str:
    """Neighbor qcell at integer grid offset (dx, dy): ix wraps around
    the antimeridian (mod 2^res), iy clamps by PREDICATE — callers
    must filter rows where :func:`qcell_neighbor_valid` is false
    (rows past the poles have no neighbor, exactly like H3 gridDisk
    returning fewer cells near a pentagon/pole). Pure int64: ix+dx
    <= 2^27, pack bound unchanged."""
    n = 1 << res
    ix, iy = qcell_deconstruct(cell, d)
    wrapped = f"(((({ix}) + ({dx})) % {n} + {n}) % {n})"
    return qcell_pack(wrapped, f"(({iy}) + ({dy}))", res)


def qcell_neighbor_valid(cell: str, dy: str, res: int, d: Dialect) -> str:
    """Predicate: the (_, dy) offset stays on the grid (iy in range)."""
    n = 1 << res
    _, iy = qcell_deconstruct(cell, d)
    return f"((({iy}) + ({dy})) >= 0 AND (({iy}) + ({dy})) <= {n - 1})"


def polyline_segdist2(
    px: str, py: str, pts: list[tuple[float, float]]
) -> str:
    """SQUARED min distance from a point to an OPEN polyline — the
    sqrt-free form (map_match emission costs quantize this, keeping
    the whole chain +,-,*,/,least/greatest). Identical text in both
    dialects."""
    terms = _polyline_d2_terms(px, py, pts)
    if len(terms) == 1:
        return terms[0]
    return f"least({', '.join(terms)})"


def polyline_segdist(
    px: str, py: str, pts: list[tuple[float, float]]
) -> str:
    """Min distance from a point to an OPEN polyline (no closing
    edge — the segdist sibling for line features: roads, tracks).
    Pure +,-,*,/,sqrt with build-time constants; identical text in
    both dialects."""
    terms = _polyline_d2_terms(px, py, pts)
    if len(terms) == 1:
        return f"sqrt({terms[0]})"
    return f"sqrt(least({', '.join(terms)}))"


def _polyline_d2_terms(
    px: str, py: str, pts: list[tuple[float, float]]
) -> list[str]:
    """Per-segment squared clamped point-to-segment distances."""
    terms = []
    for i in range(len(pts) - 1):
        x1, y1 = (float(v) for v in pts[i])
        x2, y2 = (float(v) for v in pts[i + 1])
        dx, dy = x2 - x1, y2 - y1
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            ax = f"((({px}) - {fnum(x1)}))"
            ay = f"((({py}) - {fnum(y1)}))"
            terms.append(f"({ax} * {ax} + {ay} * {ay})")
            continue
        t = (
            f"least(greatest(((({px}) - {fnum(x1)}) * {fnum(dx)}"
            f" + (({py}) - {fnum(y1)}) * {fnum(dy)})"
            f" / {fnum(l2)}, {fnum(0.0)}), {fnum(1.0)})"
        )
        ax = f"((({px}) - ({fnum(x1)} + {t} * {fnum(dx)})))"
        ay = f"((({py}) - ({fnum(y1)} + {t} * {fnum(dy)})))"
        terms.append(f"({ax} * {ax} + {ay} * {ay})")
    if not terms:
        raise ValueError("polyline needs >= 2 vertices")
    return terms


def _polyline_seg_exprs(
    px: str, py: str, pts: list[tuple[float, float]]
) -> list[tuple[str, str, str]]:
    """Per-segment (d2, s, t) expressions for a point against an open
    polyline: squared distance to the CLAMPED projection, arc-length
    coordinate (cumulative + u * seg_len), signed lateral offset
    (cross / seg_len; left of travel direction positive). Common SQL
    in both dialects (+,-,*,/,least/greatest only). Zero-length
    segments are skipped."""
    out = []
    cum = 0.0
    for i in range(len(pts) - 1):
        x1, y1 = (float(v) for v in pts[i])
        x2, y2 = (float(v) for v in pts[i + 1])
        dx, dy = x2 - x1, y2 - y1
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            continue
        ln = l2 ** 0.5
        u = (
            f"least(greatest(((({px}) - {fnum(x1)}) * {fnum(dx)}"
            f" + (({py}) - {fnum(y1)}) * {fnum(dy)})"
            f" / {fnum(l2)}, {fnum(0.0)}), {fnum(1.0)})"
        )
        ax = f"((({px}) - ({fnum(x1)} + {u} * {fnum(dx)})))"
        ay = f"((({py}) - ({fnum(y1)} + {u} * {fnum(dy)})))"
        d2 = f"({ax} * {ax} + {ay} * {ay})"
        s = f"({fnum(cum)} + {u} * {fnum(ln)})"
        t = (
            f"(({fnum(dx)} * (({py}) - {fnum(y1)})"
            f" - {fnum(dy)} * (({px}) - {fnum(x1)})) / {fnum(ln)})"
        )
        out.append((d2, s, t))
        cum += ln
    if not out:
        raise ValueError("polyline needs >= 2 distinct vertices")
    return out


def straighten_st(
    px: str, py: str, pts: list[tuple[float, float]]
) -> tuple[str, str]:
    """(s, t) curvilinear coordinates along the polyline — the
    filters.straighten core (StraightenFilter.cpp; roll/spline
    interpolation absent: planar polyline form). Nearest segment
    wins, ties to the SMALLER segment index (<= chain). O(n^2)
    comparison text — for plan-literal polylines (the overlay/crop
    broadcast convention, <= ~32 segments)."""
    segs = _polyline_seg_exprs(px, py, pts)

    def pick(vals: list[str]) -> str:
        if len(segs) == 1:
            return vals[0]
        branches = []
        for i in range(len(segs) - 1):
            cond = " AND ".join(
                f"{segs[i][0]} <= {segs[j][0]}"
                for j in range(len(segs)) if j != i
            )
            branches.append(f"WHEN {cond} THEN {vals[i]}")
        return (f"(CASE {' '.join(branches)}"
                f" ELSE {vals[-1]} END)")

    s = pick([e[1] for e in segs])
    t = pick([e[2] for e in segs])
    return s, t


def unstraighten_xy(
    s: str, t: str, pts: list[tuple[float, float]]
) -> tuple[str, str]:
    """Inverse of straighten_st: (x, y) from curvilinear (s, t) —
    locate the segment containing s (clamped to the last), offset
    laterally by t along the left normal."""
    xs, cum = [], 0.0
    segs = []
    for i in range(len(pts) - 1):
        x1, y1 = (float(v) for v in pts[i])
        x2, y2 = (float(v) for v in pts[i + 1])
        dx, dy = x2 - x1, y2 - y1
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            continue
        ln = l2 ** 0.5
        segs.append((x1, y1, dx, dy, ln, cum))
        cum += ln
    if not segs:
        raise ValueError("polyline needs >= 2 distinct vertices")
    bx, by = [], []
    for k, (x1, y1, dx, dy, ln, c0) in enumerate(segs):
        u = f"((({s}) - {fnum(c0)}) / {fnum(ln)})"
        if k == len(segs) - 1:
            cond = "ELSE"
        else:
            cond = f"WHEN ({s}) < {fnum(c0 + ln)} THEN"
        px = (f"({fnum(x1)} + {u} * {fnum(dx)}"
              f" - ({t}) * {fnum(dy / ln)})")
        py = (f"({fnum(y1)} + {u} * {fnum(dy)}"
              f" + ({t}) * {fnum(dx / ln)})")
        bx.append((cond, px))
        by.append((cond, py))

    def chain(br):
        if len(br) == 1:
            return br[0][1]
        parts = [f"{c} {v}" for c, v in br[:-1]]
        return (f"(CASE {' '.join(parts)}"
                f" ELSE {br[-1][1]} END)")

    return chain(bx), chain(by)


def utm_zone_expr(lon: str) -> str:
    """UTM zone 1..60 of a longitude (zone = floor((lon+180)/6)+1,
    clamped — lon exactly 180 folds into zone 60)."""
    z = f"(cast(floor((({lon}) + {fnum(180.0)}) / {fnum(6.0)}) as int) + 1)"
    return f"least(greatest({z}, 1), 60)"


def utm_xy_auto(lat: str, lon: str, d: Dialect) -> tuple[str, str]:
    """Auto-zone transverse Mercator: like utm_xy but the central
    meridian is each ROW's own zone CM (global tables span many
    zones; one fixed zone only serves regional extracts). The series
    constants are zone-independent — only lam references the
    per-row lon0 = zone*6 - 183. INEXACT like utm_xy."""
    lon0 = (f"(cast({utm_zone_expr(lon)} as double)"
            f" * {fnum(6.0)} - {fnum(183.0)})")
    phi = f"(({lat}) * {fnum(RAD)})"
    lam = f"((({lon}) - {lon0}) * {fnum(RAD)})"
    sphi = f"sin({phi})"
    t = _sinh(
        f"{_atanh(sphi, d)} - {fnum(UTM_C)}"
        f" * {_atanh(f'{fnum(UTM_C)} * {sphi}', d)}"
    )
    xi = f"atan2({t}, cos({lam}))"
    eta = _asinh(
        f"sin({lam}) / sqrt({t} * {t} + cos({lam}) * cos({lam}))", d
    )
    e_sum = f"({eta})"
    n_sum = f"({xi})"
    for j, aj in enumerate(UTM_ALPHA, start=1):
        k = fnum(2.0 * j)
        e_sum += (f" + {fnum(aj)} * cos({k} * {xi})"
                  f" * {_sinh(f'{k} * {eta}')}")
        n_sum += (f" + {fnum(aj)} * sin({k} * {xi})"
                  f" * {_cosh(f'{k} * {eta}')}")
    east = f"({fnum(UTM_E0)} + {fnum(UTM_K0 * UTM_AA)} * ({e_sum}))"
    north = (f"(CASE WHEN ({lat}) < {fnum(0.0)}"
             f" THEN {fnum(UTM_N0_SOUTH)} ELSE {fnum(0.0)} END"
             f" + {fnum(UTM_K0 * UTM_AA)} * ({n_sum}))")
    return east, north


# ---------------------------------------------------------------------------
# Georeferencing (filters.georeference): trajectory interpolation,
# roll/pitch/yaw rotation, local-ENU -> ECEF (EPSG:4978).
# Reference: filters/GeoreferenceFilter.cpp:154-241,
# filters/private/georeference/Utils.hpp:112-137 (rotation),
# Trajectory.cpp:109-146 (bracketing + angular interpolation),
# LocalCartesian.cpp:58-86 (+proj=topocentric inverse == local ENU
# at the interpolated trajectory origin -> ECEF, closed form below).
# INEXACT (trig): quantize to integer mm before hash-comparison.
# ---------------------------------------------------------------------------

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)


def interp_angle(a1: str, a2: str, frac: str) -> str:
    """Angular interpolation on the circle (Utils.hpp getAngle):
    atan2(f*sin(a2)+(1-f)*sin(a1), f*cos(a2)+(1-f)*cos(a1))."""
    f = f"({frac})"
    g = f"({fnum(1.0)} - {f})"
    return (f"atan2({f} * sin({a2}) + {g} * sin({a1}),"
            f" {f} * cos({a2}) + {g} * cos({a1}))")


def interp_linear(v1: str, v2: str, frac: str) -> str:
    """Linear interpolation weighted toward v2 as frac -> 1.

    NOTE a deliberate reference deviation: Trajectory.cpp:138-141
    calls getValue(z1, z2, frac) whose scalar overload
    (Utils.hpp:89-93) weights the EARLIER sample by frac — inverted
    vs its PointView overload and vs getAngle. We interpolate
    correctly (z(t1)=z1, z(t2)=z2)."""
    f = f"({frac})"
    return f"(({v1}) * ({fnum(1.0)} - {f}) + ({v2}) * {f})"


def rot_rpy(roll: str, pitch: str, yaw: str) -> tuple[str, ...]:
    """Row-major 3x3 rotation entries (Utils.hpp:112-137): yaw about
    z, pitch about y, roll about x — R = Rz(yaw)Ry(pitch)Rx(roll)."""
    A, B = f"cos({yaw})", f"sin({yaw})"
    C, D = f"cos({pitch})", f"sin({pitch})"
    E, Fr = f"cos({roll})", f"sin({roll})"
    return (
        f"({A} * {C})",
        f"({A} * {D} * {Fr} - {B} * {E})",
        f"({B} * {Fr} + {A} * {D} * {E})",
        f"({B} * {C})",
        f"({A} * {E} + {B} * {D} * {Fr})",
        f"({B} * {D} * {E} - {A} * {Fr})",
        f"(-{D})",
        f"({C} * {Fr})",
        f"({C} * {E})",
    )


def ecef_from_enu(e: str, n: str, u: str, lat_rad: str, lon_rad: str,
                  h: str) -> tuple[str, str, str]:
    """Local ENU at geodetic origin (lat_rad, lon_rad, h) -> ECEF
    meters (the closed form of PROJ +proj=topocentric inverse on
    WGS84, LocalCartesian.cpp:58-86)."""
    sla, cla = f"sin({lat_rad})", f"cos({lat_rad})"
    slo, clo = f"sin({lon_rad})", f"cos({lon_rad})"
    nrad = (f"({fnum(WGS84_A)} / sqrt({fnum(1.0)} - {fnum(WGS84_E2)}"
            f" * {sla} * {sla}))")
    x0 = f"(({nrad} + ({h})) * {cla} * {clo})"
    y0 = f"(({nrad} + ({h})) * {cla} * {slo})"
    z0 = (f"(({nrad} * {fnum(1.0 - WGS84_E2)} + ({h})) * {sla})")
    X = (f"({x0} - {slo} * ({e}) - {sla} * {clo} * ({n})"
         f" + {cla} * {clo} * ({u}))")
    Y = (f"({y0} + {clo} * ({e}) - {sla} * {slo} * ({n})"
         f" + {cla} * {slo} * ({u}))")
    Z = f"({z0} + {cla} * ({n}) + {sla} * ({u}))"
    return X, Y, Z


def mm_q(expr: str) -> str:
    """Integer-mm quantization of a meters expression (hash-safe)."""
    return (f"cast(floor(({expr}) * {fnum(1000.0)} + {fnum(0.5)})"
            " as bigint)")


# ---------------------------------------------------------------------------
# Exact 2D segment intersection (CLRS 33.1) over INTEGER coordinates:
# orientation tests + collinear on-segment checks, all int64 algebra
# (identical in Spark and DuckDB; |coords| < 2^20 keeps every product
# < 2^41). Shared by operators.transform.segment_intersection_join
# and its oracle.
# ---------------------------------------------------------------------------


def _ccw(ax: str, ay: str, bx: str, by: str, cx: str, cy: str) -> str:
    return (
        f"(({bx} - {ax}) * ({cy} - {ay})"
        f" - ({by} - {ay}) * ({cx} - {ax}))"
    )


def _on_seg(ax: str, ay: str, bx: str, by: str,
            cx: str, cy: str) -> str:
    """Given collinearity, is c within [a,b]'s bbox?"""
    return (
        f"({cx} BETWEEN least({ax}, {bx}) AND greatest({ax}, {bx})"
        f" AND {cy} BETWEEN least({ay}, {by}) AND greatest({ay}, {by}))"
    )


def seg_intersect_pred(a: str = "a", b: str = "b") -> str:
    """SQL boolean: does segment (a.x1,a.y1)-(a.x2,a.y2) intersect
    (b.x1,b.y1)-(b.x2,b.y2), endpoints and collinear overlap
    included. `a`/`b` are table aliases exposing integer x1,y1,x2,y2.
    """
    d1 = _ccw(f"{b}.x1", f"{b}.y1", f"{b}.x2", f"{b}.y2",
              f"{a}.x1", f"{a}.y1")
    d2 = _ccw(f"{b}.x1", f"{b}.y1", f"{b}.x2", f"{b}.y2",
              f"{a}.x2", f"{a}.y2")
    d3 = _ccw(f"{a}.x1", f"{a}.y1", f"{a}.x2", f"{a}.y2",
              f"{b}.x1", f"{b}.y1")
    d4 = _ccw(f"{a}.x1", f"{a}.y1", f"{a}.x2", f"{a}.y2",
              f"{b}.x2", f"{b}.y2")
    proper = (
        f"((({d1} > 0 AND {d2} < 0) OR ({d1} < 0 AND {d2} > 0))"
        f" AND (({d3} > 0 AND {d4} < 0) OR ({d3} < 0 AND {d4} > 0)))"
    )
    touch = (
        f"(({d1} = 0 AND {_on_seg(f'{b}.x1', f'{b}.y1', f'{b}.x2', f'{b}.y2', f'{a}.x1', f'{a}.y1')})"
        f" OR ({d2} = 0 AND {_on_seg(f'{b}.x1', f'{b}.y1', f'{b}.x2', f'{b}.y2', f'{a}.x2', f'{a}.y2')})"
        f" OR ({d3} = 0 AND {_on_seg(f'{a}.x1', f'{a}.y1', f'{a}.x2', f'{a}.y2', f'{b}.x1', f'{b}.y1')})"
        f" OR ({d4} = 0 AND {_on_seg(f'{a}.x1', f'{a}.y1', f'{a}.x2', f'{a}.y2', f'{b}.x2', f'{b}.y2')}))"
    )
    return f"({proper} OR {touch})"


def point_segment_within_pred(
    p: str, s: str, r: int
) -> str:
    """SQL boolean: is point ({p}.px, {p}.py) within distance `r` of
    segment ({s}.x1,{s}.y1)-({s}.x2,{s}.y2)? INTEGER-exact: the
    perpendicular case compares cross^2 <= r^2 * len2 (cross-
    multiplied rationals, no sqrt/division), endpoint cases compare
    squared distances. |coords| < 2^20 keeps every product < 2^62.
    """
    rr = int(r) * int(r)
    abx = f"({s}.x2 - {s}.x1)"
    aby = f"({s}.y2 - {s}.y1)"
    apx = f"({p}.px - {s}.x1)"
    apy = f"({p}.py - {s}.y1)"
    bpx = f"({p}.px - {s}.x2)"
    bpy = f"({p}.py - {s}.y2)"
    len2 = f"({abx} * {abx} + {aby} * {aby})"
    dot = f"({apx} * {abx} + {apy} * {aby})"
    cross = f"({apx} * {aby} - {apy} * {abx})"
    d2a = f"({apx} * {apx} + {apy} * {apy})"
    d2b = f"({bpx} * {bpx} + {bpy} * {bpy})"
    return (
        f"(CASE WHEN {len2} = 0 OR {dot} <= 0 THEN {d2a} <= {rr}"
        f" WHEN {dot} >= {len2} THEN {d2b} <= {rr}"
        f" ELSE {cross} * {cross} <= {rr} * {len2} END)"
    )


def tmerc_xy(lat: str, lon: str, lat0: float, lon0: float,
             k0: float, x0: float, y0: float, a: float, f: float,
             d: Dialect) -> tuple[str, str]:
    """GENERAL transverse Mercator (PROJ `tmerc`; national grids
    like OSGB/NZTM/Gauss-Krueger): the same Karney 2011 series as
    utm_xy but with arbitrary ellipsoid, scale, origin and false
    offsets. The latitude-of-origin folds in as the meridian-arc
    constant M0 = k0*A*xi(lat0), computed driver-side with the
    identical series so the row expression stays the UTM shape."""
    import math

    n = f / (2.0 - f)
    aa = a / (1.0 + n) * (1.0 + n * n / 4.0 + n ** 4 / 64.0)
    alpha = (
        n / 2.0 - 2.0 * n ** 2 / 3.0 + 5.0 * n ** 3 / 16.0,
        13.0 * n ** 2 / 48.0 - 3.0 * n ** 3 / 5.0,
        61.0 * n ** 3 / 240.0,
    )
    c = 2.0 * (n ** 0.5) / (1.0 + n)

    def xi_of(phi_rad: float) -> float:
        sphi = math.sin(phi_rad)
        t = math.sinh(math.atanh(sphi) - c * math.atanh(c * sphi))
        xi0 = math.atan2(t, 1.0)  # lam = 0 on the central meridian
        s = xi0
        for j, aj in enumerate(alpha, start=1):
            s += aj * math.sin(2.0 * j * xi0)  # eta = 0
        return s

    m0 = k0 * aa * xi_of(math.radians(lat0))

    phi = f"(({lat}) * {fnum(RAD)})"
    lam = f"((({lon}) - {fnum(float(lon0))}) * {fnum(RAD)})"
    sphi = f"sin({phi})"
    t = _sinh(
        f"{_atanh(sphi, d)} - {fnum(c)}"
        f" * {_atanh(f'{fnum(c)} * {sphi}', d)}"
    )
    xi = f"atan2({t}, cos({lam}))"
    eta = _asinh(
        f"sin({lam}) / sqrt({t} * {t} + cos({lam}) * cos({lam}))", d
    )
    e_sum = f"({eta})"
    n_sum = f"({xi})"
    for j, aj in enumerate(alpha, start=1):
        kj = fnum(2.0 * j)
        e_sum += (f" + {fnum(aj)} * cos({kj} * {xi})"
                  f" * {_sinh(f'{kj} * {eta}')}")
        n_sum += (f" + {fnum(aj)} * sin({kj} * {xi})"
                  f" * {_cosh(f'{kj} * {eta}')}")
    east = f"({fnum(float(x0))} + {fnum(k0 * aa)} * ({e_sum}))"
    north = (f"({fnum(float(y0) - m0)} + {fnum(k0 * aa)}"
             f" * ({n_sum}))")
    return east, north
