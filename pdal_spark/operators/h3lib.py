"""Genuine-H3 backend for the cell API — used when the `h3` library
is importable, keeping the closed-form qcell as the oracle-able
default (VERDICT r1 #2).

Reference semantics: filters/H3Filter.cpp:96-130 (``H3:uint64`` =
latLngToCell(lat, lng, res), EPSG:4326 input required) and the hexer
H3 grid (filters/private/hexer/H3grid.cpp). The h3 C library is not
baked into this container, so every entry point degrades loudly:
``HAS_H3`` is False and callers raise a clear error instead of
silently emitting qcells when the user asked for real H3.

All kernels are Arrow-batched ``pandas_udf``s. The h3 python API is
scalar-per-cell (a C call per row inside the batch loop — no
row-at-a-time Python *serialization*); h3-py's vectorized entry
points are used when present.

Supports both h3-py v4 (latlng_to_cell/grid_disk/cell_to_parent/
polygon_to_cells) and v3 (geo_to_h3/k_ring/h3_to_parent/polyfill)
spellings.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

try:  # pragma: no cover - lib absent in this container
    import h3 as _h3

    HAS_H3 = True
except ImportError:
    _h3 = None
    HAS_H3 = False


def _require() -> None:
    if not HAS_H3:
        raise ImportError(
            "backend='h3' requires the `h3` package (not installed); "
            "use backend='qcell' (default) or install h3-py"
        )


def _api() -> dict[str, Any]:  # pragma: no cover - needs h3 lib
    """Version-tolerant name resolution (h3-py v4 first, then v3)."""
    v4 = hasattr(_h3, "latlng_to_cell")
    ints = getattr(_h3, "str_to_int", None) or (lambda s: int(s, 16))
    return {
        "to_cell": (_h3.latlng_to_cell if v4 else _h3.geo_to_h3),
        "to_parent": (_h3.cell_to_parent if v4 else _h3.h3_to_parent),
        "to_latlng": (_h3.cell_to_latlng if v4 else _h3.h3_to_geo),
        "disk": (_h3.grid_disk if v4 else _h3.k_ring),
        "poly": (_h3.polygon_to_cells if v4 else _h3.polyfill),
        "v4": v4,
        "to_int": ints,
        "to_str": (getattr(_h3, "int_to_str", None)
                   or (lambda i: f"{i:x}")),
    }


def h3_encode_spec(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 12,
    out: str = "h3_cell",
) -> DataFrame:
    """filters.h3 with REAL H3 ids from the SPEC-DERIVED gnomonic
    forward (operators.h3geo latlng_to_cell) — no h3-py needed.
    Ids are uint64 reinterpreted as int64 (H3Filter.cpp:126
    convention; mode/res/bc bits keep the value < 2^60 so the sign
    bit is never set). Vectorized numpy inside an Arrow batch."""
    r = int(res)

    @pandas_udf("long")
    def enc(la, lo):
        import numpy as np
        import pandas as pd

        from pdal_spark.operators.h3geo import latlng_to_cell

        a = la.to_numpy(dtype="float64")
        b = lo.to_numpy(dtype="float64")
        ok = ~(np.isnan(a) | np.isnan(b))
        out_ids = np.zeros(len(a), dtype=np.int64)
        if ok.any():
            out_ids[ok] = latlng_to_cell(
                a[ok], b[ok], r).view(np.int64)
        s = pd.Series(out_ids, dtype="Int64")
        s[~ok] = None
        return s

    return df.withColumn(out, enc(F.col(lat), F.col(lon)))


def h3_center_spec(
    df: DataFrame, cell: str, lat_out: str = "cell_lat",
    lon_out: str = "cell_lon",
) -> DataFrame:
    """cellToLatLng via the spec-derived inverse (h3geo)."""

    @pandas_udf("struct<lat:double,lng:double>")
    def ctr(c):
        import numpy as np
        import pandas as pd

        from pdal_spark.operators.h3geo import cell_to_latlng

        v = c.to_numpy(dtype="float64")
        ok = ~np.isnan(v)
        la = np.full(len(v), np.nan)
        lo = np.full(len(v), np.nan)
        if ok.any():
            ids = c[ok].to_numpy(dtype="int64").view(np.uint64)
            la[ok], lo[ok] = cell_to_latlng(ids)
        return pd.DataFrame({"lat": la, "lng": lo})

    tmp = df.withColumn("__ll", ctr(F.col(cell)))
    return (
        tmp.withColumn(lat_out, F.col("__ll.lat"))
        .withColumn(lon_out, F.col("__ll.lng"))
        .drop("__ll")
    )


def h3_boundary_spec(
    df: DataFrame, cell: str, out: str = "boundary_wkt",
) -> DataFrame:
    """cellToBoundary via the spec-derived kernel (h3geo) as WKT
    POLYGON (lng lat ring, closed) — the hexbin `h3_grid` boundary
    output (HexBinFilter.cpp:224-301) on REAL H3 cells. Boundary
    emission is a post-aggregation surface (cells, not points)."""

    @pandas_udf("string")
    def bnd(c):
        import numpy as np
        import pandas as pd

        from pdal_spark.operators.h3geo import cell_to_boundary

        v = c.to_numpy(dtype="float64")
        ok = ~np.isnan(v)
        outv = [None] * len(v)
        if ok.any():
            ids = c[ok].to_numpy(dtype="int64").view(np.uint64)
            rings = cell_to_boundary(ids)
            pos = np.nonzero(ok)[0]
            for p, ring in zip(pos, rings):
                pts = ", ".join(f"{lng:.9f} {lat:.9f}"
                                for lat, lng in ring)
                first = f"{ring[0][1]:.9f} {ring[0][0]:.9f}"
                outv[p] = f"POLYGON (({pts}, {first}))"
        return pd.Series(outv, dtype="string")

    return df.withColumn(out, bnd(F.col(cell)))


def grid_disk_spec(
    df: DataFrame, cell: str, k: int = 1, out: str = "nb_cell",
) -> DataFrame:
    """gridDisk on REAL H3 ids via the spec-derived traversal
    (h3geo.grid_disk_real — pentagon-safe BFS): one output row per
    (row, disk member). Disk computation is cached per distinct
    cell inside the batch, so point-heavy inputs pay once per
    cell."""
    kk = int(k)

    @pandas_udf("array<long>")
    def disk(c):
        import numpy as np
        import pandas as pd

        from pdal_spark.operators.h3geo import grid_disk_real

        cache: dict = {}
        outv = []
        for v in c:
            if v != v:
                outv.append(None)
                continue
            key = int(v)
            got = cache.get(key)
            if got is None:
                got = sorted(
                    np.int64(np.uint64(x)).item()
                    for x in grid_disk_real(
                        np.uint64(np.int64(key)), kk))
                cache[key] = got
            outv.append(got)
        return pd.Series(outv)

    return (df.withColumn("__disk", disk(F.col(cell)))
            .withColumn(out, F.explode("__disk"))
            .drop("__disk"))


def h3_encode_lib(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 12,
    out: str = "h3_cell",
) -> DataFrame:  # pragma: no cover - needs h3 lib
    """filters.h3 with REAL H3 ids (uint64 reinterpreted as int64,
    the H3Filter.cpp:126 convention)."""
    _require()
    r = int(res)

    @pandas_udf("long")
    def enc(la, lo):
        import pandas as pd

        a = _api()
        f, conv = a["to_cell"], a["to_int"]
        if a["v4"]:
            return pd.Series(
                [conv(f(x, y, r)) if x == x and y == y else None
                 for x, y in zip(la, lo)], dtype="Int64")
        return pd.Series(
            [int(f(x, y, r), 16) if x == x and y == y else None
             for x, y in zip(la, lo)], dtype="Int64")

    return df.withColumn(out, enc(F.col(lat), F.col(lon)))


def h3_parent_lib(
    df: DataFrame, cell: str, parent_res: int, out: str | None = None
) -> DataFrame:  # pragma: no cover - needs h3 lib
    _require()
    out = out or f"{cell}_r{parent_res}"
    r = int(parent_res)

    @pandas_udf("long")
    def par(c):
        import pandas as pd

        a = _api()
        f, conv, ts = a["to_parent"], a["to_int"], a["to_str"]
        return pd.Series(
            [conv(f(ts(int(v)), r)) if v == v else None for v in c],
            dtype="Int64")

    return df.withColumn(out, par(F.col(cell)))


def h3_center_lib(
    df: DataFrame, cell: str, lat_out: str = "cell_lat",
    lon_out: str = "cell_lon",
) -> DataFrame:  # pragma: no cover - needs h3 lib
    _require()

    @pandas_udf("struct<lat:double,lng:double>")
    def ctr(c):
        import pandas as pd

        a = _api()
        f, ts = a["to_latlng"], a["to_str"]
        vals = [f(ts(int(v))) if v == v else (None, None) for v in c]
        return pd.DataFrame(vals, columns=["lat", "lng"])

    tmp = df.withColumn("__ll", ctr(F.col(cell)))
    return (
        tmp.withColumn(lat_out, F.col("__ll.lat"))
        .withColumn(lon_out, F.col("__ll.lng"))
        .drop("__ll")
    )


def grid_disk_lib(
    df: DataFrame, cell: str, k: int = 1, out: str = "nb_cell"
) -> DataFrame:  # pragma: no cover - needs h3 lib
    """Explode each cell to its H3 grid_disk(k) neighborhood — the
    real-hexagon analog of operators.h3.grid_disk."""
    _require()
    kk = int(k)

    @pandas_udf("array<long>")
    def disk(c):
        import pandas as pd

        a = _api()
        f, conv, ts = a["disk"], a["to_int"], a["to_str"]
        return pd.Series(
            [[conv(n) if a["v4"] else int(n, 16)
              for n in f(ts(int(v)), kk)] if v == v else []
             for v in c])

    return df.withColumn(out, F.explode(disk(F.col(cell))))


def polyfill_lib(
    spark, polygon: list[tuple[float, float]], res: int
) -> DataFrame:  # pragma: no cover - needs h3 lib
    """All H3 cells covering a (lon, lat) ring — driver-side (the
    polygon is small; the CELL SET may be large, returned as a
    DataFrame so downstream joins distribute)."""
    _require()
    a = _api()
    if a["v4"]:
        poly = _h3.LatLngPoly([(la, lo) for lo, la in polygon])
        cells = [a["to_int"](c) for c in a["poly"](poly, int(res))]
    else:
        gj = {"type": "Polygon",
              "coordinates": [[[la, lo] for lo, la in polygon]]}
        cells = [int(c, 16) for c in a["poly"](gj, int(res))]
    return spark.createDataFrame(
        [(c,) for c in sorted(cells)], "h3_cell long"
    )


# ---------------------------------------------------------------------------
# Pure spec-derived H3 INDEX ALGEBRA (VERDICT r2 #3, adapted: h3-py
# is absent in this container, so everything that is pure bit math
# on REAL H3 ids — resolution/base-cell/digit extraction, validity,
# pentagon test, parent, children, compact, uncompact — ships as
# Catalyst int64 expressions derived from the public H3 index bit
# layout (h3geo.org/docs/core-library/h3Indexing):
#
#   bit 63          reserved (0)
#   bits 59..62     mode (1 = cell)
#   bits 56..58     reserved (0)
#   bits 52..55     resolution r in 0..15
#   bits 45..51     base cell in 0..121
#   bits 3(15-i)..  digit_i (3 bits each), i = 1..15; digits finer
#                   than r are 7
#
# The geographic functions (latLngToCell, cellToLatLng, polyfill)
# require the icosahedral base-cell orientation tables and stay
# behind the h3-py gate above. The algebra below needs only the bit
# layout plus the published list of the 12 pentagon base cells.
# ---------------------------------------------------------------------------

# the 12 res-0 pentagon base cells (public H3 constant, baseCells.c)
H3_PENTAGON_BASE_CELLS = (
    4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117,
)

_H3_MODE_CELL = 1
_H3_RES_SHIFT = 52
_H3_BC_SHIFT = 45


def _res_e(c: str) -> str:
    return f"(shiftright({c}, {_H3_RES_SHIFT}) & 15)"


def _bc_e(c: str) -> str:
    return f"(shiftright({c}, {_H3_BC_SHIFT}) & 127)"


def _digit_e(c: str, i: int) -> str:
    """digit_i, i in 1..15 (3 bits at offset 3*(15-i))."""
    return f"(shiftright({c}, {3 * (15 - int(i))}) & 7)"


def _low_ones(pres: int) -> int:
    """All-7 fill for digits pres+1..15 (the 3*(15-pres) low bits)."""
    return (1 << (3 * (15 - int(pres)))) - 1


def h3_cell_build(res: int, base_cell: str, digits: str) -> str:
    """Assemble a cell id expression from resolution, a base-cell
    expression and a 45-bit digit-field expression (digits finer
    than res must already be 7s)."""
    r = int(res)
    return (
        f"(cast({_H3_MODE_CELL} as bigint) * cast({1 << 59} as bigint)"
        f" + cast({r} as bigint) * cast({1 << _H3_RES_SHIFT} as bigint)"
        f" + cast(({base_cell}) as bigint)"
        f" * cast({1 << _H3_BC_SHIFT} as bigint)"
        f" + cast(({digits}) as bigint))"
    )


def h3_resolution(df: DataFrame, cell: str,
                  out: str = "res") -> DataFrame:
    return df.withColumn(
        out, F.expr(_res_e(f"`{cell}`")).cast("int")
    )


def h3_base_cell(df: DataFrame, cell: str,
                 out: str = "base_cell") -> DataFrame:
    return df.withColumn(
        out, F.expr(_bc_e(f"`{cell}`")).cast("int")
    )


def _low_ones_e(c: str) -> str:
    """The all-7 fill mask below the cell's OWN resolution, derived
    by shift from the res field (no 16-branch CASE — the branchy
    form overflowed whole-stage codegen's 64KB method limit)."""
    return (
        f"(shiftleft(cast(1 as bigint),"
        f" 3 * (15 - {_res_e(c)})) - 1)"
    )


def _pent_e(c: str) -> str:
    """isPentagon: pentagon base cell AND every digit above the
    cell's own resolution fill is 0 (mask derived by shift)."""
    bc_in = " OR ".join(
        f"{_bc_e(c)} = {b}" for b in H3_PENTAGON_BASE_CELLS
    )
    hi = f"(cast({_low_ones(0)} as bigint) - {_low_ones_e(c)})"
    return f"(({bc_in}) AND (({c} & {hi}) = 0))"


def h3_is_pentagon(df: DataFrame, cell: str,
                   out: str = "is_pentagon") -> DataFrame:
    return df.withColumn(out, F.expr(_pent_e(f"`{cell}`")))


def _valid_e(c: str) -> str:
    """isValidCell per the spec: high bit 0, mode 1, reserved bits
    0, base cell < 122, digits 1..res in 0..6, digits res+1..15
    all 7, and a pentagon's first offset digit may not be 1 (the
    deleted subsequence).

    LINEAR expression forms throughout (shift-derived masks, flat
    per-digit disjunctions, one flat first-nonzero CASE) — the
    original res-branched CASE was O(res^2) terms and overflowed
    whole-stage codegen's 64KB method limit under CODEGEN_ONLY."""
    low = _low_ones_e(c)
    checks = [
        f"(shiftright({c}, 63) & 1) = 0",
        f"(shiftright({c}, 59) & 15) = {_H3_MODE_CELL}",
        f"(shiftright({c}, 56) & 7) = 0",
        f"{_bc_e(c)} <= 121",
        # digits res+1..15 are exactly 7s
        f"({c} & {low}) = {low}",
    ]
    # digits 1..res each != 7: digit i is either in the 7-fill
    # (i > res) or a real digit that must not be 7
    digit_ok = " AND ".join(
        f"({i} > {_res_e(c)} OR {_digit_e(c, i)} <> 7)"
        for i in range(1, 16)
    )
    checks.append(f"({digit_ok})")
    # pentagon deleted subsequence: the first nonzero digit
    # (scanning 1..15; the 7-fill is nonzero so an all-zero prefix
    # harmlessly resolves to 7) may not be 1 on pentagon base cells
    bc_pent = " OR ".join(
        f"{_bc_e(c)} = {b}" for b in H3_PENTAGON_BASE_CELLS
    )
    first_nz = (
        "CASE "
        + " ".join(
            f"WHEN {_digit_e(c, i)} <> 0 THEN {_digit_e(c, i)}"
            for i in range(1, 16)
        )
        + " ELSE 0 END"
    )
    checks.append(f"((NOT ({bc_pent})) OR ({first_nz}) <> 1)")
    return "(" + " AND ".join(f"({ch})" for ch in checks) + ")"


def h3_is_valid(df: DataFrame, cell: str,
                out: str = "is_valid") -> DataFrame:
    return df.withColumn(out, F.expr(_valid_e(f"`{cell}`")))


def h3_parent_id(df: DataFrame, cell: str, parent_res: int,
                 out: str | None = None) -> DataFrame:
    """cellToParent on raw ids: keep digits 1..parent_res, 7-fill
    the rest, rewrite the resolution field. NULL when parent_res
    exceeds the cell's own resolution (matching the library's error
    contract)."""
    pres = int(parent_res)
    out = out or f"{cell}_r{pres}"
    c = f"`{cell}`"
    low = _low_ones(pres)
    newc = (
        f"((({c} | cast({low} as bigint))"
        f" & cast({~(15 << _H3_RES_SHIFT) & ((1 << 64) - 1) - (1 << 63)} as bigint))"
        f" | cast({pres << _H3_RES_SHIFT} as bigint))"
    )
    return df.withColumn(
        out,
        F.expr(
            f"CASE WHEN {_res_e(c)} >= {pres} THEN {newc} END"
        ),
    )


def h3_children_ids(df: DataFrame, cell: str, child_res: int,
                    out: str = "child") -> DataFrame:
    """cellToChildren on raw ids: explode one resolution step at a
    time. A pentagon cell has 6 children (the deleted digit-1
    subsequence is skipped); its digit-0 child remains a pentagon.
    Row-local explode — no shuffle; fan-out is 7^steps (6·7^(s-1)
    for pentagons), the caller controls depth."""
    cres = int(child_res)
    cur = df.select("*").withColumn("__c", F.col(cell))
    cur = cur.withColumn("__pent", F.expr(_pent_e("__c")))
    # iterate: res r -> r+1
    res_col = F.expr(_res_e("__c")).cast("int")
    cur = cur.withColumn("__r", res_col)
    max_steps = 16
    for _ in range(max_steps):
        step = (
            cur.where(F.col("__r") < cres)
            .withColumn(
                "__d",
                F.explode(F.expr("sequence(0, 6)")),
            )
            # pentagons skip child digit 1
            .where(~(F.col("__pent") & (F.col("__d") == 1)))
        )
        done = cur.where(F.col("__r") >= cres)
        # write digit (r+1) = d, clear its 7-fill, bump res
        stepped = step.withColumn(
            "__c",
            F.expr(
                "(( __c "
                "  & ~shiftleft(cast(7 as bigint), 3 * (15 - (__r + 1)))"
                f" & cast({~(15 << _H3_RES_SHIFT) & ((1 << 63) - 1)} as bigint)"
                f" | shiftleft(cast(__r + 1 as bigint), {_H3_RES_SHIFT})"
                ") | shiftleft(cast(__d as bigint), 3 * (15 - (__r + 1))))"
            ),
        ).withColumn(
            "__pent", F.col("__pent") & (F.col("__d") == 0)
        ).withColumn("__r", F.col("__r") + 1).drop("__d")
        cur = done.unionByName(stepped)
        # all rows settled? (driver check per level keeps the loop
        # bounded by requested depth, not 16)
        if cur.where(F.col("__r") < cres).isEmpty():
            break
    return cur.withColumn(out, F.col("__c")).drop(
        "__c", "__pent", "__r"
    )


def h3_compact_ids(df: DataFrame, cell: str = "h3_cell") -> DataFrame:
    """compactCells on raw ids: repeatedly replace complete sibling
    families (all 7 children present — 6 for a pentagon parent) with
    their parent. Distributed: per round one groupBy on the parent
    id + one join back; rounds <= max resolution present. Input must
    be a duplicate-free cell SET (library precondition)."""
    cur = df.select(F.col(cell).alias("c")).distinct()
    for _ in range(15):
        res = F.expr(_res_e("c")).cast("int")
        cur = cur.withColumn("__r", res)
        finest = cur.agg(F.max("__r")).collect()[0][0]
        if finest is None or finest == 0:
            break
        childs = cur.where(F.col("__r") == finest)
        if childs.isEmpty():
            break
        pres = finest - 1
        low = _low_ones(pres)
        parent_e = (
            f"(((c | cast({low} as bigint))"
            f" & cast({~(15 << _H3_RES_SHIFT) & ((1 << 63) - 1)} as bigint))"
            f" | cast({pres << _H3_RES_SHIFT} as bigint))"
        )
        fam = childs.withColumn("__p", F.expr(parent_e))
        counts = fam.groupBy("__p").agg(
            F.count(F.lit(1)).alias("__n")
        ).withColumn(
            "__need",
            F.when(F.expr(_pent_e("__p")), 6).otherwise(7),
        )
        full = counts.where(F.col("__n") == F.col("__need"))
        if full.isEmpty():
            break
        merged = full.select(F.col("__p").alias("c"))
        keep_children = fam.join(
            full.select("__p"), on="__p", how="left_anti"
        ).select("c")
        cur = (
            cur.where(F.col("__r") != finest).select("c")
            .unionByName(keep_children)
            .unionByName(merged)
            .localCheckpoint(eager=True)
        )
    return cur.select(F.col("c").alias(cell)).distinct()


def h3_uncompact_ids(df: DataFrame, res: int,
                     cell: str = "h3_cell") -> DataFrame:
    """uncompactCells: every cell expands to its res-`res` children
    (cells already at `res` pass through; finer cells are an error
    -> NULL-free contract, they are dropped loudly via a filter the
    caller can audit with h3_resolution first)."""
    ok = h3_children_ids(
        df.where(F.expr(f"{_res_e(f'`{cell}`')} <= {int(res)}")),
        cell, int(res), out="__child",
    )
    return ok.select(F.col("__child").alias(cell)).distinct()


def h3_to_string(df: DataFrame, cell: str,
                 out: str = "h3_str") -> DataFrame:
    """Canonical lowercase-hex H3 string (no leading zeros)."""
    return df.withColumn(
        out, F.lower(F.expr(f"hex(`{cell}`)")).cast("string")
    ).withColumn(out, F.expr(f"regexp_replace({out}, '^0+', '')"))


def h3_from_string(df: DataFrame, col: str,
                   out: str = "h3_cell") -> DataFrame:
    return df.withColumn(
        out, F.expr(f"conv(`{col}`, 16, 10)").cast("long")
    )
