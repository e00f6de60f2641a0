"""filters.overlay — first-match polygon attribute join.

Reference: filters/OverlayFilter.cpp:172-185 assigns to an existing
dimension the attribute of the FIRST polygon (in input order) that
contains the point (`break` on first hit); polygons are loaded once in
ready() (:94-156). Points in no polygon keep their prior value.

Spark shape: broadcast left join expressed as a vectorized pandas UDF
returning the first-match attribute + coalesce. The polygon table is
the small side; points never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdal_spark.functions import pip as _pip
from pdal_spark.functions import wkt as _wkt


def overlay(
    df: DataFrame,
    polygons: list[tuple[str, int]],
    column: str,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """polygons: [(wkt, attr_value), ...] in priority order.

    Sets ``column`` to the first containing polygon's value, else
    keeps the existing value (column must exist, as in PDAL; create
    it with ferry/assign first if needed).
    """
    parsed = [
        (_wkt.parse_polygon(w), int(v)) for w, v in polygons
    ]

    @F.pandas_udf(T.LongType())
    def first_match(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xv = xs.to_numpy(dtype=np.float64)
        yv = ys.to_numpy(dtype=np.float64)
        out = np.full(len(xv), np.nan)
        todo = np.ones(len(xv), dtype=bool)
        for rings, val in parsed:
            if not todo.any():
                break
            m = _pip.polygon_contains(xv, yv, rings) & todo
            out[m] = val
            todo &= ~m
        return pd.Series(out).astype("Int64")

    matched = first_match(F.col(x), F.col(y))
    return df.withColumn(
        column, F.coalesce(matched, F.col(column).cast(T.LongType()))
    )
