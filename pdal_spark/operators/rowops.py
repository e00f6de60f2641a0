"""Row-wise + ordering + limit ops (SURVEY.md §2.2/2.3/2.5): the
filters.range / expression / assign / ferry / head / tail /
decimation / randomize / locate / sort / mortonorder / groupby /
divider / merge / returns / label_duplicates family.

All pure Catalyst. Ops that depend on "view order" (head/tail/
decimation/locate tie-breaks, label_duplicates' previous-point) take
an explicit ``order`` column — Spark has no implicit row order, and
the reference's order-dependence is pinned by ordering columns in all
fixtures (SURVEY.md §7 risks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdal_spark.functions.dimrange import compile_ranges
from pdal_spark.functions.expr import compile_expression
from pdal_spark.sqlgen import SPARK
from pdal_spark import sqlgen as G


# --- predicates -----------------------------------------------------------


def range_filter(df: DataFrame, ranges: list[str]) -> DataFrame:
    """filters.range (RangeFilter.cpp:97): OR within a dimension,
    AND across dimensions; bounds/negation per DimRange."""
    return df.where(F.expr(compile_ranges(ranges, SPARK)))


def expression_filter(df: DataFrame, expression: str) -> DataFrame:
    """filters.expression (ExpressionFilter.cpp:110): keep rows where
    the PDAL expression evaluates true. Compiled to Catalyst."""
    return df.where(F.expr(compile_expression(expression, SPARK)))


# --- mutation -------------------------------------------------------------


def assign(df: DataFrame, statements: list[str]) -> DataFrame:
    """filters.assign value= statements (AssignFilter.cpp:172-197):
    ``"Dim = expr [WHERE cond]"`` applied in order; unmatched rows
    keep their previous value."""
    for stmt in statements:
        parts = stmt.split(" WHERE ", 1)
        lhs, rhs = parts[0].split("=", 1)
        dim = lhs.strip()
        value = F.expr(compile_expression(rhs.strip(), SPARK))
        if len(parts) == 2:
            cond = F.expr(compile_expression(parts[1].strip(), SPARK))
            old = F.col(dim) if dim in df.columns else F.lit(None)
            df = df.withColumn(dim, F.when(cond, value).otherwise(old))
        else:
            df = df.withColumn(dim, value)
    return df


def assign_range(df: DataFrame, assignments: list[str]) -> DataFrame:
    """filters.assign legacy ``assignment`` option:
    ``"Dim[lo:hi]=value"`` (AssignFilter.cpp args)."""
    for a in assignments:
        spec, value = a.rsplit("=", 1)
        pred = F.expr(compile_ranges([spec.strip()], SPARK))
        dim = spec.strip().split("[")[0].split("(")[0].rstrip("!").strip()
        df = df.withColumn(
            dim, F.when(pred, float(value)).otherwise(F.col(dim))
        )
    return df


def ferry(df: DataFrame, copies: list[str]) -> DataFrame:
    """filters.ferry (FerryFilter.cpp:116-128): ``"Src => Dst"``
    copies creating the target dimension."""
    for c in copies:
        src, dst = (s.strip() for s in c.split("=>"))
        df = df.withColumn(dst, F.col(src))
    return df


# --- limits / sampling ----------------------------------------------------


def head(df: DataFrame, count: int, order: str, invert: bool = False
         ) -> DataFrame:
    """filters.head (HeadFilter.cpp:82): first `count` rows in
    `order`. invert drops them instead. Ranks are distributed
    (functions.rank) — no single-partition window."""
    from pdal_spark.functions.rank import scalable_row_number

    ranked = scalable_row_number(df, [order])
    keep = ranked["__rn"] > count if invert else ranked["__rn"] <= count
    return ranked.where(keep).drop("__rn")


def tail(df: DataFrame, count: int, order: str, invert: bool = False
         ) -> DataFrame:
    """filters.tail: last `count` rows in `order` (distributed
    descending rank)."""
    from pdal_spark.functions.rank import scalable_row_number

    ranked = scalable_row_number(df, [F.col(order).desc()])
    keep = ranked["__rn"] > count if invert else ranked["__rn"] <= count
    return ranked.where(keep).drop("__rn")


def decimation(
    df: DataFrame, step: int, order: str, offset: int = 0,
    limit: int | None = None,
) -> DataFrame:
    """filters.decimation (DecimationFilter.cpp:94-103): keep every
    step-th row starting at offset (0-based over the order);
    distributed rank."""
    from pdal_spark.functions.rank import scalable_row_number

    ranked = scalable_row_number(df, [order]).withColumn(
        "__idx", F.col("__rn") - 1
    ).drop("__rn")
    cond = (ranked["__idx"] >= offset) & (
        ((ranked["__idx"] - offset) % step) == 0
    )
    if limit is not None:
        cond = cond & (ranked["__idx"] < limit)
    return ranked.where(cond).drop("__idx")


def randomize(df: DataFrame, seed: int = 42) -> DataFrame:
    """filters.randomize (RandomizeFilter.cpp): seeded shuffle order."""
    return df.orderBy(F.rand(seed))


def locate(df: DataFrame, dimension: str, minmax: str = "max") -> DataFrame:
    """filters.locate (LocateFilter.cpp:72-103): the single row with
    min/max of `dimension` (top-1; ties broken arbitrarily as in the
    reference's first-scan-hit)."""
    c = F.col(dimension)
    return df.orderBy(c.desc() if minmax == "max" else c.asc()).limit(1)


# --- ordering -------------------------------------------------------------


def sort(df: DataFrame, dims: list[tuple[str, str]],
         within_partitions: bool = False) -> DataFrame:
    """filters.sort (SortFilter.cpp:80-120). PDAL sorts by dims[0],
    then STABLE-sorts by dims[1], etc. — making the LAST dim the
    primary key. We mirror that: orderBy(reversed(dims)).
    within_partitions=True keeps the PDAL per-view semantics after
    tiling (sortWithinPartitions, no global shuffle)."""
    cols = [
        F.col(d).desc() if o.lower().startswith("desc") else F.col(d).asc()
        for d, o in reversed(dims)
    ]
    if within_partitions:
        return df.sortWithinPartitions(*cols)
    return df.orderBy(*cols)


def morton_order(df: DataFrame, lat: str = "lat", lon: str = "lon",
                 res: int = 26) -> DataFrame:
    """filters.mortonorder (MortonOrderFilter.cpp:217)."""
    return df.orderBy(
        F.expr(G.morton_from_lonlat(f"`{lat}`", f"`{lon}`", res, G.SPARK))
    )


# --- grouping / splitting / merging ---------------------------------------


def groupby_views(df: DataFrame, dimension: str) -> DataFrame:
    """filters.groupby (GroupByFilter.cpp:72-90): one output view per
    distinct value — modeled as the value column itself (consumers
    partition on it; writers partitionBy it)."""
    return df.repartition(F.col(dimension))


def divider(df: DataFrame, count: int | None = None,
            capacity: int | None = None, order: str | None = None,
            mode: str = "round_robin") -> DataFrame:
    """filters.divider (DividerFilter.cpp:112-190): split into
    `count` groups (round_robin or contiguous `partition` mode) or
    groups of `capacity` rows. Emits a ``group_id`` column."""
    if count is not None and mode == "round_robin":
        if order is None:
            return df.repartition(count).withColumn(
                "group_id", F.spark_partition_id()
            )
        from pdal_spark.functions.rank import scalable_row_number

        return scalable_row_number(df, [order]).withColumn(
            "group_id", (F.col("__rn") - 1) % count
        ).drop("__rn")
    if order is None:
        raise ValueError("partition/capacity modes need an order column")
    from pdal_spark.functions.rank import scalable_row_number

    ranked = scalable_row_number(df, [order]).withColumn(
        "__idx", F.col("__rn") - 1
    ).drop("__rn")
    if count is not None:  # contiguous partition mode
        total = df.count()
        per = -(-total // count)
        return ranked.withColumn(
            "group_id", (F.col("__idx") / per).cast("int")
        ).drop("__idx")
    if capacity is None:
        raise ValueError("need count or capacity")
    return ranked.withColumn(
        "group_id", (F.col("__idx") / capacity).cast("int")
    ).drop("__idx")


def merge(dfs: list[DataFrame]) -> DataFrame:
    """filters.merge (MergeFilter.cpp:51-76): concatenate views."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def returns_split(df: DataFrame, return_num: str = "return_number",
                  num_returns: str = "number_of_returns") -> DataFrame:
    """filters.returns (ReturnsFilter.cpp:73): label rows
    first/last/intermediate/only for grouped writes."""
    r, n = F.col(return_num), F.col(num_returns)
    return df.withColumn(
        "return_class",
        F.when(n == 1, "only")
        .when(r == 1, "first")
        .when(r == n, "last")
        .otherwise("intermediate"),
    )


def label_duplicates(df: DataFrame, dims: list[str], order: str,
                     out: str = "is_duplicate") -> DataFrame:
    """filters.label_duplicates (LabelDuplicatesFilter.cpp): mark rows
    whose listed dims all equal the previous row's (in `order`).
    The global lag becomes a distributed rank + rn-1 self-join (same
    null semantics: a missing previous row compares like lag's
    NULL)."""
    from pdal_spark.functions.rank import scalable_row_number

    ranked = scalable_row_number(df, [order])
    prev = ranked.select(
        (F.col("__rn") + 1).alias("__rn"),
        *[F.col(d).alias(f"__p_{d}") for d in dims],
    )
    j = ranked.join(prev, on="__rn", how="left")
    pred = F.lit(True)
    for d in dims:
        pred = pred & F.col(d).eqNullSafe(F.col(f"__p_{d}"))
    return j.withColumn(out, pred).drop(
        "__rn", *[f"__p_{d}" for d in dims]
    )


def divider_expression(
    df: DataFrame,
    expression: str,
    capacity: int,
    order: str,
) -> DataFrame:
    """filters.divider expression mode (DividerFilter.cpp:85-124):
    start a new output view every time `capacity` points matching
    `expression` have been visited in `order`. group_id =
    floor((running matches before this row, plus this row if it is
    the capacity-th's successor) / capacity) — i.e. the boundary
    falls AFTER the capacity-th matching point; non-matching rows
    stay with the view current at their position.

    Distributed as an exclusive prefix sum of the match indicator
    (functions.rank.scalable_prefix_sums — no global window)."""
    from pdal_spark.functions.expr import compile_expression
    from pdal_spark.functions.rank import scalable_prefix_sums

    match = F.expr(compile_expression(expression)).cast("int")
    t = scalable_prefix_sums(
        df.withColumn("__m", match), [order],
        {"__cum": F.col("__m")},
    )
    excl = (F.col("__cum").cast("long") - F.col("__m"))
    return (
        t.withColumn(
            "group_id", F.floor(excl / F.lit(capacity)).cast("int")
        )
        .drop("__m", "__cum", "__rn")
    )
