"""Bucketed table layout — the co-located-join strategy for keys that
are joined REPEATEDLY at corpus scale (doc_id across curation stages,
cell ids across tiling passes).

A shuffle moves the full table across the network every time a join
or aggregation needs co-location. Writing the table BUCKETED on the
key (hash(key) % n_buckets decides the file, each bucket sorted)
pays that shuffle ONCE at write time; every later equi-join or
groupBy on the key reads matching buckets side-by-side and the plan
contains NO Exchange — verified by tests/test_plans.py. This is the
Iceberg/Hive bucketing pattern: at 100 TB the difference is a full
network pass per query vs zero.

Bucket count sizing: ~2-4x total executor cores, and such that one
bucket of the LARGER table fits in executor memory (the same rule as
shuffle partitions — a bucket is a shuffle partition you keep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    path: str,
    n_buckets: int = 16,
) -> None:
    """Write `df` as a bucketed external parquet table (bucketed and
    sorted by `key`), replacing any previous registration."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two tables bucketed on `key`. With equal bucket
    counts the plan is exchange-free (bucket i joins bucket i in
    place); Spark also drops the per-task Sort when the buckets are
    sortBy'd on the key."""
    return spark.table(left_table).join(
        spark.table(right_table), on=key, how=how
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "partition",
    id_col: str = "file_id",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Small-file compaction planner (the Iceberg/Delta OPTIMIZE
    bin-pack, deterministically): within each partition, order files
    by (size DESC, id) and cut the running total into groups of
    ~target_bytes — group = floor(cumulative_size_before / target).
    Output (partition, file_id, group, group_seq): every group except
    a partition's last holds >= target/2 (size-desc order bounds the
    overshoot), and the plan is a pure function of the file listing —
    rerunning it on an unchanged listing rewrites nothing.

    Scale: the INPUT is file metadata (one row per file — millions of
    rows at petabyte scale, not billions); one shuffle on the
    partition key, one window sort. The actual rewrite job consumes
    (group) as its task key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(part_col).orderBy(
        F.col(size_col).desc(), F.col(id_col).asc()
    )
    t = int(target_bytes)
    return (
        files.withColumn(
            "__cum", F.sum(size_col).over(w) - F.col(size_col)
        )
        .withColumn("group", F.expr(f"cast(__cum div {t} as int)"))
        .withColumn("group_seq", F.row_number().over(w))
        .select(part_col, id_col, size_col, "group", "group_seq")
    )
