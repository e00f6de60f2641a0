"""Driver contract for the spark-graft builder (PySpark target).

All gates live in pdal_spark.gate (paired Spark query + DuckDB oracle
built from the same sqlgen formula strings). This file only adapts
that registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship M0 slice on sf0.001: web events -> deterministic
    geocode -> H3-analog cell encode -> hexbin density tessellation
    (readers -> filters.h3 -> filters.hexbin -> writer lifecycle)."""
    from pdal_spark.operators import h3 as ops_h3
    from pdal_spark.operators import hexbin as ops_hexbin

    events = spark.read.parquet(f"{SF0001}/events.parquet")
    pts = ops_h3.geocode(events, "event_id")
    enc = ops_h3.h3_encode(pts, "lat", "lon", res=4)
    return ops_hexbin.h3bin(enc, "lat", "lon", res=4, threshold=2)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdal_spark.gate import GATES

    return {name: g.spark_fn for name, g in GATES.items()}


def oracle_sql() -> dict[str, str]:
    from pdal_spark.gate import oracle_sql_map

    return oracle_sql_map()
