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


def zonemap_prune_stats(
    df: DataFrame,
    sort_col: str,
    id_col: str,
    rows_per_group: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Zone-map (min-max statistics) pruning simulator: lay the table
    out sorted by `sort_col` in row groups of `rows_per_group`, build
    each group's min/max, and report how many groups a range
    predicate [lo, hi] must scan — the quantitative "is this sort
    order worth it" answer behind morton_encode/zorder_key layout
    choices (parquet row-group stats and Iceberg file metrics prune
    exactly this way). Run it once per candidate layout and compare
    scan fractions.

    Output one row: n_groups, n_scanned, n_rows_scanned,
    prune_frac_q = pruned/total in 2^20 fixed point (integer-exact).

    Scale: the ranking is ONE repartition-free window at plan level —
    at real scale you'd sample; this operator is the PLANNER (run on
    a sample or a partition), not the rewrite itself.
    """
    g = (
        df.select(
            F.col(sort_col).alias("v"), F.col(id_col).alias("i")
        )
        .withColumn(
            "grp",
            F.expr(
                f"(row_number() OVER (ORDER BY v ASC, i ASC) - 1)"
                f" div {int(rows_per_group)}"
            ),
        )
        .groupBy("grp")
        .agg(
            F.min("v").alias("mn"), F.max("v").alias("mx"),
            F.count(F.lit(1)).alias("rows"),
        )
    )
    from pdal_spark.sqlgen import fnum

    scanned = (
        f"CASE WHEN NOT (mx < {fnum(lo)} OR mn > {fnum(hi)})"
        " THEN 1 ELSE 0 END"
    )
    agg = g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.expr(scanned)).alias("n_scanned"),
        F.sum(F.expr(f"CASE WHEN {scanned} = 1 THEN rows ELSE 0 END"))
        .alias("n_rows_scanned"),
    )
    return agg.select(
        "n_groups", "n_scanned", "n_rows_scanned",
        F.expr(
            f"((n_groups - n_scanned) * {1 << 20}) div n_groups"
        ).alias("prune_frac_q"),
    )
