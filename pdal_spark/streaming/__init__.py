from pdal_spark.streaming.ingest import incremental_ingest

__all__ = ["incremental_ingest"]
