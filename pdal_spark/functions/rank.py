"""Scalable global ordering primitives.

`row_number() OVER (ORDER BY ...)` with no PARTITION BY drags the
whole table through ONE partition (Spark's WindowExec warning) — at
10^12 rows that is a non-starter. These helpers compute the same
values distributively: range-repartition on the order columns, do
the work within each sorted partition, then add per-partition
offsets derived from a tiny driver-side pass over partition totals
(|partitions| rows, not data). The sampled range boundaries are
nondeterministic, but the OUTPUT is deterministic because ranks and
prefix sums depend only on the total order, not where it was cut —
as long as `order_cols` is a total order (include a unique id).

First used for vocabulary ranking (operators/textops.py); reused by
chipper_exact and skewness_balancing.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def scalable_row_number(
    df: DataFrame, order_cols: list, out: str = "__rn"
) -> DataFrame:
    """Global 1-based row number over `order_cols` (names or Column
    sort expressions, e.g. F.col(x).desc()), distributed."""
    order_cols = [
        F.col(c) if isinstance(c, str) else c for c in order_cols
    ]
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    ordered = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__local", F.row_number().over(w).cast("long"))
        .localCheckpoint(eager=True)
    )
    counts = (
        ordered.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("__pid")
        .collect()
    )
    rows, acc = [], 0
    for r in counts:
        rows.append((int(r["__pid"]), acc))
        acc += int(r["n"])
    off = df.sparkSession.createDataFrame(
        rows, "__pid int, __off long"
    )
    return (
        ordered.join(F.broadcast(off), on="__pid")
        .withColumn(out, F.col("__local") + F.col("__off"))
        .drop("__pid", "__local", "__off")
    )


def scalable_prefix_sums(
    df: DataFrame,
    order_cols: list[str],
    sums: dict[str, "F.Column"],
    dec: str = "decimal(38,15)",
    rn: str = "__rn",
) -> DataFrame:
    """Global rank + running (inclusive-prefix) DECIMAL sums of the
    given expressions over the `order_cols` order, distributed the
    same way: local cumulative sums per sorted range-partition, plus
    exact per-partition decimal offsets accumulated driver-side with
    Python Decimal (decimal addition is associative, so the result
    is bit-identical to a single global window — oracle-safe).

    Returns df + `rn` (long) + one decimal column per `sums` key.
    """
    prec, scale = (
        int(v) for v in dec[len("decimal("):-1].split(",")
    )
    dt = T.DecimalType(prec, scale)
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    cw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__local", F.row_number().over(w).cast("long"))
    )
    for name, expr in sums.items():
        t = t.withColumn(
            f"__l_{name}", F.sum(expr.cast(dec)).over(cw)
        )
    t = t.localCheckpoint(eager=True)
    tot = (
        t.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # the partition TOTAL is the last row's cumulative value
            # (max_by local rank — plain max would be wrong for
            # signed inputs whose cumsum is not monotone)
            *[
                F.max_by(f"__l_{name}", "__local").alias(f"t_{name}")
                for name in sums
            ],
        )
        .orderBy("__pid")
        .collect()
    )
    rows, acc_n = [], 0
    acc = {name: Decimal(0) for name in sums}
    for r in tot:
        rows.append(
            (int(r["__pid"]), acc_n)
            + tuple(acc[name] for name in sums)
        )
        acc_n += int(r["n"])
        for name in sums:
            v = r[f"t_{name}"]
            acc[name] += Decimal(v) if v is not None else Decimal(0)
    schema = T.StructType(
        [
            T.StructField("__pid", T.IntegerType()),
            T.StructField("__off", T.LongType()),
        ]
        + [T.StructField(f"__o_{name}", dt) for name in sums]
    )
    off = df.sparkSession.createDataFrame(rows, schema)
    t = t.join(F.broadcast(off), on="__pid").withColumn(
        rn, F.col("__local") + F.col("__off")
    )
    for name in sums:
        t = t.withColumn(
            name,
            (F.col(f"__l_{name}") + F.col(f"__o_{name}")).cast(dec),
        ).drop(f"__l_{name}", f"__o_{name}")
    return t.drop("__pid", "__local", "__off")
