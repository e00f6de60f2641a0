"""pdal_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the *capabilities* of PDAL/PDAL
(reference at /root/reference, C++): stage pipelines (readers ->
filters -> writers) re-expressed as declarative DataFrame
transformations over web-page/point tables, with H3-style cell
indexing, point-in-polygon joins, kNN neighborhoods, tiling and
raster<->vector conversion.

Design stance (SURVEY.md §7):
- DataFrame-first: every operator is a function DataFrame -> DataFrame
  built from pyspark.sql.functions; Catalyst owns optimization.
- The only Python compute: vectorized pandas/Arrow UDF kernels
  (point-in-polygon ray-cast, per-cell KD queries). Never per-row
  Python.
- Distribution concerns (partitioning, salting, broadcast, buffering)
  live in pdal_spark.plans.layout, explicitly.
"""

__version__ = "0.1.0"

from pdal_spark.session import get_spark  # noqa: F401


def __getattr__(name: str):
    # lazy re-export of the JSON pipeline compiler: `from pdal_spark
    # import Pipeline` without paying the plans import at package load
    if name == "Pipeline":
        from pdal_spark.plans import Pipeline

        return Pipeline
    raise AttributeError(name)
