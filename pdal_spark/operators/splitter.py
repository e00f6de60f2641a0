"""filters.splitter / filters.chipper / `pdal tile` — tiling & layout.

Reference semantics (filters/SplitterFilter.cpp):
- squares of side ``length`` anchored at an origin; tile of a point is
  floor((coord - origin) / length) (:175-188, :218-227). PDAL defaults
  the origin to the first point (:152-157) — order-dependent, so this
  engine requires an explicit origin (SURVEY.md §7 risks). (PDAL quirk
  not mirrored: its int-cast truncation sends negative exact lattice
  points one tile lower; we use floor() uniformly.)
- ``buffer`` duplicates points near tile edges into up to 3 neighbor
  tiles: membership iff strictly inside the square expanded by buffer
  (:195-214, squareContains :218-227); buffer <= length/2 enforced.
- one output view per non-empty cell -> modeled as the ``tile_id``
  column (+ explode for buffered copies).

Spark shape: tile assignment is pure Catalyst (codegen'd into the
scan); buffered membership is a generated array of <=4 tile ids +
explode — no shuffle until the consumer groups/writes by tile. The
write path (`tile_write`) repartitions by tile with optional SALTING
of hot tiles (cities at web scale) and sorts within partitions by
Morton key so parquet min/max stats prune later range scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G

_D = G.SPARK
_OFF = G.HEX_OFF
_SH = G.HEX_SHIFT


def _pack(tx, ty):
    return (tx + F.lit(_OFF)) * F.lit(_SH) + (ty + F.lit(_OFF))


def tile_assign(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
    length: float = 1.0,
    origin_x: float = 0.0,
    origin_y: float = 0.0,
    out: str = "tile_id",
) -> DataFrame:
    """Unbuffered tile id (pure Catalyst)."""
    return df.withColumn(
        out,
        F.expr(G.tile_id(f"`{x}`", f"`{y}`", origin_x, origin_y, length)),
    )


def splitter(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
    length: float = 1.0,
    origin_x: float = 0.0,
    origin_y: float = 0.0,
    buffer: float = 0.0,
    out: str = "tile_id",
) -> DataFrame:
    """Tile assignment with optional buffered edge duplication.

    With buffer > 0 a point may appear in up to 4 tiles (its own +
    x-neighbor + y-neighbor + diagonal), exactly the squareContains
    expansion of the reference. Rows are duplicated via explode; the
    ``text``-bytes-per-url invariant holds per (url, tile) copy
    (SURVEY.md §7).
    """
    if buffer < 0 or (buffer > 0 and buffer > length / 2.0):
        raise ValueError("buffer must be in [0, length/2]")
    if buffer == 0.0:
        return tile_assign(df, x, y, length, origin_x, origin_y, out)

    # Same membership semantics as sqlgen.splitter_parts (the oracle
    # SQL), but staged: tx/ty/sx/sy are computed ONCE in a Project
    # below the Generate instead of re-rendered inside the explode
    # expression. The naive inline form re-evaluates FLOOR((x-ox)/L)
    # ~30x per row inside a non-codegen Generate — measured 6x slower
    # at 20M rows (see BENCH notes).
    xc, yc = F.col(x), F.col(y)
    tx = F.floor((xc - F.lit(origin_x)) / F.lit(length))
    ty = F.floor((yc - F.lit(origin_y)) / F.lit(length))
    tmp = df.withColumn("__tx", tx).withColumn("__ty", ty)

    def shift(coord, t, origin):
        low = F.lit(origin) + t.cast("double") * F.lit(length)
        return (
            F.when(coord < low + F.lit(buffer), F.lit(-1))
            .when(coord > low + F.lit(length - buffer), F.lit(1))
            .otherwise(F.lit(0))
        )

    tmp = tmp.withColumn("__sx", shift(xc, F.col("__tx"), origin_x))
    tmp = tmp.withColumn("__sy", shift(yc, F.col("__ty"), origin_y))

    ctx, cty = F.col("__tx"), F.col("__ty")
    csx, csy = F.col("__sx"), F.col("__sy")
    # Plain array + null-filter after explode (NOT array_compact: its
    # higher-order filter(lambda) is interpreted, breaking codegen).
    members = F.array(
        _pack(ctx, cty),
        F.when(csx != 0, _pack(ctx + csx, cty)),
        F.when(csy != 0, _pack(ctx, cty + csy)),
        F.when((csx != 0) & (csy != 0), _pack(ctx + csx, cty + csy)),
    )
    return (
        tmp.withColumn(out, F.explode(members))
        .where(F.col(out).isNotNull())
        .drop("__tx", "__ty", "__sx", "__sy")
    )


def tile_xy(df: DataFrame, tile: str = "tile_id") -> DataFrame:
    """Unpack tile_id -> (tile_x, tile_y) columns."""
    return df.withColumn(
        "tile_x", F.expr(G.tile_x(f"`{tile}`", _D))
    ).withColumn("tile_y", F.expr(G.tile_y(f"`{tile}`", _D)))


def chipper(
    df: DataFrame,
    capacity: int,
    lat: str = "lat",
    lon: str = "lon",
    total_rows: int | None = None,
) -> DataFrame:
    """filters.chipper analog (ChipperFilter.cpp:88-268): spatially
    contiguous chips of ~capacity points. PDAL recursively median-
    splits x/y; the scalable equivalent is range partitioning on the
    Morton key (recursive median splits ≡ quantiles of the
    space-filling curve), which Spark does with a sampled range
    partitioner — one pass, no driver recursion."""
    n = total_rows if total_rows is not None else df.count()
    chips = max(1, -(-n // capacity))
    keyed = df.withColumn(
        "__mkey", F.expr(G.morton_from_lonlat(f"`{lat}`", f"`{lon}`", 26, _D))
    )
    return (
        keyed.repartitionByRange(chips, "__mkey")
        .withColumn("chip_id", F.spark_partition_id())
        .drop("__mkey")
    )


def salt_hot_tiles(
    df: DataFrame,
    tile: str = "tile_id",
    hot_threshold: int = 5_000_000,
    salt_buckets: int = 16,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Skew handling for web-scale hot cells (north_rule): tiles whose
    row count exceeds hot_threshold get a salt column so downstream
    repartition spreads them over salt_buckets reducers. The counts
    histogram is tiny (O(#tiles)) and broadcast."""
    if counts is None:
        counts = df.groupBy(tile).agg(F.count(F.lit(1)).alias("__tile_cnt"))
    hot = counts.where(F.col("__tile_cnt") >= hot_threshold).select(
        tile, F.lit(True).alias("__hot")
    )
    joined = df.join(F.broadcast(hot), on=tile, how="left")
    return joined.withColumn(
        "tile_salt",
        F.when(
            F.col("__hot").isNotNull(),
            (F.rand(42) * salt_buckets).cast("int"),
        ).otherwise(F.lit(0)),
    ).drop("__hot")


def tile_write(
    df: DataFrame,
    path: str,
    tile: str = "tile_id",
    lat: str = "lat",
    lon: str = "lon",
    mode: str = "overwrite",
    sort_key: str = "morton",
) -> None:
    """`pdal tile` analog (kernels/TileKernel.cpp:90-115): partitioned
    write, one directory per tile (PDAL: one LAS file per tile via
    `#` filename templating, FlexWriter.hpp:67-140), rows space-curve
    sorted within partitions for min/max pruning. Iceberg would add
    snapshots; without its jars we write hive-partitioned parquet
    with identical layout semantics.

    sort_key: "morton" (default) or "hilbert" — Hilbert layouts need
    ~40% fewer contiguous row-group ranges per window query (Moon et
    al. 2001; tests/test_s2.py) at identical write cost."""
    if sort_key == "hilbert":
        from pdal_spark.operators.s2 import hilbert_encode

        keyed = hilbert_encode(df, lat=lat, lon=lon, res=16, out="__mkey")
    elif sort_key == "morton":
        keyed = df.withColumn(
            "__mkey",
            F.expr(G.morton_from_lonlat(f"`{lat}`", f"`{lon}`", 26, _D)),
        )
    else:
        raise ValueError("sort_key must be 'morton' or 'hilbert'")
    (
        keyed.repartition(tile)
        .sortWithinPartitions(tile, "__mkey")
        .drop("__mkey")
        .write.mode(mode)
        .partitionBy(tile)
        .parquet(path)
    )


def chipper_exact(
    df: DataFrame,
    capacity: int,
    lat: str = "lat",
    lon: str = "lon",
    id_col: str = "event_id",
) -> DataFrame:
    """Deterministic filters.chipper variant: chip = contiguous run
    of `capacity` points along the Morton curve (chip_id =
    floor(rank/capacity) over the (morton_key, id) order). Same
    spatial-coherence contract as the sampled range partitioner in
    `chipper` but bit-reproducible — the variant the SQL oracle
    checks, and the right choice when chip assignments must be
    stable across reruns (lineage, incremental tiling). Ranks come
    from functions.rank.scalable_row_number — range-partitioned, no
    single-partition window."""
    from pdal_spark.functions.rank import scalable_row_number

    keyed = df.withColumn(
        "__mkey",
        F.expr(G.morton_from_lonlat(f"`{lat}`", f"`{lon}`", 26, _D)),
    )
    ranked = scalable_row_number(keyed, ["__mkey", id_col])
    return ranked.withColumn(
        "chip_id",
        ((F.col("__rn") - 1) / F.lit(int(capacity))).cast("int"),
    ).drop("__mkey", "__rn")
