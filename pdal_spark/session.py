"""SparkSession builder with the engine's scale-oriented defaults.

Tuned for correctness-comparison against DuckDB (UTC timestamps) and
for 100 TB-scale habits even in local mode: AQE on, skew-join
splitting on, Arrow on with PDAL-sized batches (10k rows — the same
chunk size PDAL's stream mode uses, /root/reference/pdal/
PipelineManager.hpp:87).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size mirrors PDAL's stream-mode FixedPointTable capacity
# (10,000 points) — reference: pdal/PipelineManager.hpp:87.
ARROW_BATCH_ROWS = 10_000


def get_spark(
    app_name: str = "pdal_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # make the package importable in Python workers regardless of the
    # driver's cwd (kernels reference module-level helpers; on a real
    # cluster this is `spark-submit --py-files pdal_spark.zip`).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local mode: ~cores; on a real cluster this should be
        # 2-3x total executor cores (set via extra_conf/spark-submit).
        n = master.split("[")[-1].rstrip("]") if "[" in master else "32"
        shuffle_partitions = cpus if n == "*" else max(int(n), 4)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_BATCH_ROWS),
        )
        # 128 MB scan splits — sane default for wide parquet at scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
