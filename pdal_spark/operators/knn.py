"""Neighborhood / kNN / radius joins (SURVEY.md §2.7).

The reference builds a nanoflann KD-tree per view
(pdal/KDIndex.hpp:55-124) and runs per-point neighbors()/radius()
queries. The distributed re-design is the classic cell-bucketed
spatial join:

- bucket both sides on a grid of ``cell`` (>= radius for radius
  joins), duplicate the RIGHT side into its 3x3 neighbor cells
  (explode — PDAL's buffered-tile trick from SplitterFilter applied
  to joins), equi-join on the cell key, post-filter on true distance.
  One shuffle per side, AQE-skew-splittable, no Python.
- kNN exactness across cell borders (SURVEY.md §7 risk): a point's
  kNN from the 3x3 block is provably complete iff its kth-neighbor
  distance <= its distance to the block border; points failing the
  bound are retried with a wider ring (driver loop over the usually
  tiny unsettled remainder).

Everything downstream (neighborclassifier, outlier, nndistance,
radialdensity, radiusassign, lof, zsmooth, reciprocity) is a
composition of these two joins with window/agg logic — all Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdal_spark.functions.dimrange import compile_ranges
from pdal_spark.sqlgen import SPARK


def _bucket(df: DataFrame, x: str, y: str, cell: float, prefix: str
            ) -> DataFrame:
    return df.withColumn(
        f"{prefix}cx", F.floor(F.col(x) / F.lit(float(cell))).cast("long")
    ).withColumn(
        f"{prefix}cy", F.floor(F.col(y) / F.lit(float(cell))).cast("long")
    )


_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _explode_ring(df: DataFrame, prefix: str, ring: int = 1) -> DataFrame:
    """Duplicate rows into all cells within Chebyshev distance `ring`."""
    offs = [
        (dx, dy)
        for dx in range(-ring, ring + 1)
        for dy in range(-ring, ring + 1)
    ]
    pairs = F.array(
        *[
            F.struct(
                (F.col(f"{prefix}cx") + dx).alias("jx"),
                (F.col(f"{prefix}cy") + dy).alias("jy"),
            )
            for dx, dy in offs
        ]
    )
    out = df.withColumn("__j", F.explode(pairs))
    return (
        out.withColumn("jx", F.col("__j.jx"))
        .withColumn("jy", F.col("__j.jy"))
        .drop("__j", f"{prefix}cx", f"{prefix}cy")
    )


def _prep_sides(
    left: DataFrame, right: DataFrame,
    x: str, y: str, id_left: str, id_right: str,
    cell: float, ring: int,
    right_cols: list[str] | None,
):
    lf = _bucket(
        left.select(F.col(id_left).alias("src_id"),
                    F.col(x).alias("lx"), F.col(y).alias("ly")),
        "lx", "ly", cell, "l",
    ).withColumnRenamed("lcx", "jx").withColumnRenamed("lcy", "jy")
    rsel = [F.col(id_right).alias("nb_id"),
            F.col(x).alias("rx"), F.col(y).alias("ry")]
    for c in right_cols or []:
        rsel.append(F.col(c).alias(f"nb_{c}"))
    rf = _bucket(right.select(*rsel), "rx", "ry", cell, "r")
    rf = _explode_ring(rf, "r", ring)
    return lf, rf


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    x: str = "lon",
    y: str = "lat",
    id_left: str = "pid",
    id_right: str = "pid",
    right_cols: list[str] | None = None,
    cell: float | None = None,
    include_self: bool = True,
) -> DataFrame:
    """All pairs (src_id, nb_id, dist) with planar dist <= radius.

    cell defaults to radius so one neighbor ring is provably
    sufficient (KDIndex radius() parity). Pure Catalyst: two narrow
    shuffles + codegen'd distance filter.
    """
    cell = float(cell or radius)
    ring = max(1, int(-(-radius // cell)))
    lf, rf = _prep_sides(
        left, right, x, y, id_left, id_right, cell, ring, right_cols
    )
    j = lf.join(rf, on=["jx", "jy"])
    # explicit multiplies (not pow) — bit-identical to the SQL oracle
    d2 = (j["lx"] - j["rx"]) * (j["lx"] - j["rx"]) + (
        j["ly"] - j["ry"]
    ) * (j["ly"] - j["ry"])
    out = j.withColumn("dist", F.sqrt(d2)).where(
        F.col("dist") <= float(radius)
    )
    if not include_self:
        out = out.where(F.col("src_id") != F.col("nb_id"))
    return out.drop("jx", "jy", "lx", "ly", "rx", "ry")


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    cell: float,
    x: str = "lon",
    y: str = "lat",
    id_left: str = "pid",
    id_right: str = "pid",
    right_cols: list[str] | None = None,
    include_self: bool = True,
    max_ring: int = 64,
) -> DataFrame:
    """Exact k nearest neighbors of every left row among right rows.

    Output: (src_id, nb_id, dist, nn_rank) with deterministic
    tie-break (dist, nb_id). Iterative ring expansion: points whose
    kth distance exceeds the guaranteed-complete bound re-run with a
    wider ring; each round touches only the unsettled remainder.
    """
    rounds = []
    pending = left
    ring = 1
    while True:
        lf, rf = _prep_sides(
            pending, right, x, y, id_left, id_right, cell, ring, right_cols
        )
        j = lf.join(rf, on=["jx", "jy"])
        if not include_self:
            j = j.where(F.col("src_id") != F.col("nb_id"))
        d2 = (j["lx"] - j["rx"]) * (j["lx"] - j["rx"]) + (
            j["ly"] - j["ry"]
        ) * (j["ly"] - j["ry"])
        j = j.withColumn("dist", F.sqrt(d2))
        # completeness bound: kth dist <= distance from the point to
        # the border of the (2*ring+1)^2 candidate block.
        blk = float(cell)
        bound = F.least(
            j["lx"] - (F.floor(j["lx"] / blk) - ring) * blk,
            (F.floor(j["lx"] / blk) + ring + 1) * blk - j["lx"],
            j["ly"] - (F.floor(j["ly"] / blk) - ring) * blk,
            (F.floor(j["ly"] / blk) + ring + 1) * blk - j["ly"],
        )
        w = Window.partitionBy("src_id").orderBy(
            F.col("dist").asc(), F.col("nb_id").asc()
        )
        # one materialization per round (localCheckpoint) so the
        # settled/unsettled split doesn't recompute the join.
        topk = (
            j.withColumn("__bound", bound)
            .withColumn("nn_rank", F.row_number().over(w))
            .where(F.col("nn_rank") <= k)
            .drop("jx", "jy", "rx", "ry")
            .localCheckpoint(eager=True)
        )
        if ring >= max_ring:
            rounds.append(topk.drop("lx", "ly", "__bound"))
            break
        # settled = has k hits AND kth within the completeness bound.
        # Anything else — including points with ZERO candidates in
        # this ring (absent from topk entirely) — stays pending.
        settled_ids = (
            topk.groupBy("src_id")
            .agg(
                F.max("dist").alias("__kth"),
                F.count(F.lit(1)).alias("__n"),
                F.min("__bound").alias("__b"),
            )
            .where((F.col("__n") >= k) & (F.col("__kth") <= F.col("__b")))
            .select("src_id")
            .localCheckpoint(eager=True)
        )
        rounds.append(
            topk.join(settled_ids, on="src_id", how="left_semi").drop(
                "lx", "ly", "__bound"
            )
        )
        pending = pending.join(
            settled_ids.withColumnRenamed("src_id", id_left),
            on=id_left,
            how="left_anti",
        ).localCheckpoint(eager=True)
        if pending.count() == 0:
            break
        ring *= 4
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Derived operators
# ---------------------------------------------------------------------------


def nn_distance(
    df: DataFrame, k: int, mode: str = "avg",
    x: str = "lon", y: str = "lat", id_col: str = "pid",
    cell: float = 1.0,
) -> DataFrame:
    """filters.nndistance (NNDistanceFilter.cpp): per-point kth or
    average distance to its k nearest (self excluded)."""
    nn = knn_join(
        df, df, k, cell, x=x, y=y, id_left=id_col, id_right=id_col,
        include_self=False,
    )
    agg = (
        F.max("dist") if mode == "kth" else F.avg("dist")
    ).alias("nn_distance")
    per = nn.groupBy("src_id").agg(agg).withColumnRenamed("src_id", id_col)
    return df.join(per, on=id_col, how="left")


def neighbor_classifier(
    df: DataFrame,
    k: int,
    dimension: str = "classification",
    candidate: DataFrame | None = None,
    domain: list[str] | None = None,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    cell: float = 1.0,
) -> DataFrame:
    """filters.neighborclassifier (NeighborClassifierFilter.cpp:114-139):
    kNN majority vote on an int dimension; reassign iff winner count
    strictly > k/2 AND differs from current; ties -> smallest class
    (std::map iteration order); votes read ORIGINAL classes (deferred
    update, :160-200); self included when voting against self
    (KD3Index::neighbors returns the query point)."""
    cand = candidate if candidate is not None else df
    include_self = candidate is None
    nn = knn_join(
        df, cand, k, cell, x=x, y=y,
        id_left=id_col, id_right=id_col,
        right_cols=[dimension], include_self=include_self,
    )
    votes = nn.groupBy("src_id", f"nb_{dimension}").agg(
        F.count(F.lit(1)).alias("votes")
    )
    tot = nn.groupBy("src_id").agg(F.count(F.lit(1)).alias("n_votes"))
    w = Window.partitionBy("src_id").orderBy(
        F.col("votes").desc(), F.col(f"nb_{dimension}").asc()
    )
    winner = (
        votes.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .join(tot, on="src_id")
        .where(F.col("votes") * 2 > F.col("n_votes"))
        .select(
            F.col("src_id").alias(id_col),
            F.col(f"nb_{dimension}").alias("__newclass"),
        )
    )
    # winner is one row per reassigned point — small; AQE broadcasts.
    out = df.join(winner, on=id_col, how="left")
    new_val = F.when(
        F.col("__newclass").isNotNull()
        & (F.col("__newclass") != F.col(dimension)),
        F.col("__newclass"),
    ).otherwise(F.col(dimension))
    if domain:
        in_domain = F.expr(compile_ranges(domain, SPARK))
        new_val = F.when(in_domain, new_val).otherwise(F.col(dimension))
    return out.withColumn(dimension, new_val).drop("__newclass")


def radial_density(
    df: DataFrame, radius: float,
    x: str = "lon", y: str = "lat", id_col: str = "pid",
) -> DataFrame:
    """filters.radialdensity (RadialDensityFilter.cpp): neighbor count
    within radius / sphere volume (2D here: circle area)."""
    pairs = radius_join(
        df, df, radius, x=x, y=y, id_left=id_col, id_right=id_col
    )
    area = 3.141592653589793 * radius * radius
    cnt = pairs.groupBy("src_id").agg(
        (F.count(F.lit(1)) / F.lit(area)).alias("radial_density")
    )
    return df.join(
        cnt.withColumnRenamed("src_id", id_col), on=id_col, how="left"
    )


def outlier_radius(
    df: DataFrame, radius: float, min_k: int,
    x: str = "lon", y: str = "lat", id_col: str = "pid",
    noise_class: int = 7, cls: str = "classification",
) -> DataFrame:
    """filters.outlier method=radius (OutlierFilter.cpp): flag points
    with fewer than min_k neighbors (self excluded) within radius."""
    pairs = radius_join(
        df, df, radius, x=x, y=y, id_left=id_col, id_right=id_col,
        include_self=False,
    )
    cnt = pairs.groupBy("src_id").agg(F.count(F.lit(1)).alias("__nb"))
    out = df.join(
        cnt.withColumnRenamed("src_id", id_col), on=id_col, how="left"
    )
    return out.withColumn(
        cls,
        F.when(
            F.coalesce(F.col("__nb"), F.lit(0)) < min_k, noise_class
        ).otherwise(F.col(cls)),
    ).drop("__nb")


def outlier_statistical(
    df: DataFrame, mean_k: int, multiplier: float,
    x: str = "lon", y: str = "lat", id_col: str = "pid",
    cell: float = 1.0, noise_class: int = 7,
    cls: str = "classification",
) -> DataFrame:
    """filters.outlier method=statistical: per-point mean distance to
    mean_k NN; flag points whose mean distance > global mean +
    multiplier * stddev. Two-phase global agg, broadcast threshold."""
    nn = knn_join(
        df, df, mean_k, cell, x=x, y=y,
        id_left=id_col, id_right=id_col, include_self=False,
    )
    per = nn.groupBy("src_id").agg(F.avg("dist").alias("__md"))
    g = per.agg(
        F.avg("__md").alias("m"), F.stddev_samp("__md").alias("s")
    ).collect()[0]
    thresh = float(g["m"]) + multiplier * float(g["s"])
    out = df.join(
        per.withColumnRenamed("src_id", id_col), on=id_col, how="left"
    )
    return out.withColumn(
        cls,
        F.when(F.col("__md") > thresh, noise_class).otherwise(F.col(cls)),
    ).drop("__md")


def zsmooth(
    df: DataFrame, radius: float, dim: str = "z",
    percentile: float = 0.5, out: str = "z_smooth",
    x: str = "lon", y: str = "lat", id_col: str = "pid",
) -> DataFrame:
    """filters.zsmooth (ZsmoothFilter.cpp): new dim = percentile of
    neighbors' `dim` within 2D radius."""
    pairs = radius_join(
        df, df, radius, x=x, y=y, id_left=id_col, id_right=id_col,
        right_cols=[dim],
    )
    sm = pairs.groupBy("src_id").agg(
        F.percentile_approx(f"nb_{dim}", percentile, 10000).alias(out)
    )
    return df.join(
        sm.withColumnRenamed("src_id", id_col), on=id_col, how="left"
    )


def reciprocity(
    df: DataFrame, k: int,
    x: str = "lon", y: str = "lat", id_col: str = "pid",
    cell: float = 1.0,
) -> DataFrame:
    """filters.reciprocity (ReciprocityFilter.cpp): % of a point's k
    NN that do NOT list the point among their own k NN (two-hop)."""
    nn = knn_join(
        df, df, k, cell, x=x, y=y, id_left=id_col, id_right=id_col,
        include_self=False,
    ).select("src_id", "nb_id")
    rev = nn.select(
        F.col("nb_id").alias("src_id"), F.col("src_id").alias("nb_id")
    ).withColumn("__mutual", F.lit(1))
    j = nn.join(rev, on=["src_id", "nb_id"], how="left")
    rec = j.groupBy("src_id").agg(
        (
            100.0
            * F.sum(F.when(F.col("__mutual").isNull(), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("reciprocity")
    )
    return df.join(
        rec.withColumnRenamed("src_id", id_col), on=id_col, how="left"
    )
