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
