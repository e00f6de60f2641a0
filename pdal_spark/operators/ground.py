"""Ground classification — filters.smrf / filters.pmf (SURVEY §2.7).

Reference: filters/SMRFilter.cpp:255-400 (progressiveFilter at
669-731, classifyGround at 295-392), filters/PMFFilter.cpp:219-366,
morphology primitives pdal/private/MathUtils.cpp erodeDiamond /
dilateDiamond (diamond = 4-connected structuring element, iterated).

Semantics here run on a SPARSE occupied-cell grid: a cell exists iff
at least one point fell in it, and erosion/dilation aggregate over
whichever of the 5 diamond neighbors exist (absent neighbors
contribute nothing — the sparse analog of the reference's NaN cells,
which its min/max comparisons also skip). The reference additionally
inpaints empty cells (knnfill); at web scale the grid is mostly
empty, so the engine evaluates the surface only at occupied cells —
every point lives in an occupied cell by construction, so
classification is total. SMRF's provisional DEM at object cells uses
the final opened surface instead of the reference's kNN inpaint
(same role: a morphologically smoothed terrain estimate).

Spark shape: the dense-raster morphology loop becomes, per unit
step, "scatter each cell value to its 4 neighbors + self -> hash
aggregate min/max -> semi-join back to the occupied domain". Every
step is one shuffle over the CELL table only (|cells| << |points|);
the point table is scanned twice total (grid build, final classify
join). Opening by radius r costs r unit dilations, so SMRF's
progressive loop is O(R^2) cell-table steps with
R = ceil(window/cell) (18 at PDAL defaults). All comparisons and
thresholds are computed driver-side as float literals, and surface
arithmetic is min/max/sub/abs/sqrt only — IEEE-deterministic, so a
SQL oracle can mirror results exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OFFS = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]


def _offs_col():
    return F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _OFFS
        ]
    )


def _morph1(g: DataFrame, dom: DataFrame, how: str) -> DataFrame:
    """One unit diamond erosion ('min') / dilation ('max') over the
    occupied domain `dom`; `g` is (cx, cy, v)."""
    scat = g.select(
        "cx", "cy", "v", F.explode(_offs_col()).alias("o")
    ).select(
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
        "v",
    )
    agg = scat.groupBy("cx", "cy").agg(
        (F.min("v") if how == "min" else F.max("v")).alias("v")
    )
    # scatter reaches never-occupied cells; drop them (the agg's hash
    # partitioning on (cx, cy) is reused by this join — no re-shuffle
    # of the aggregated side)
    return agg.join(dom, on=["cx", "cy"], how="left_semi")


def _grid(df: DataFrame, cell: float, x: str, y: str, z: str) -> DataFrame:
    """Per-cell minimum-Z surface (SMRFilter.cpp createZImin /
    PMFFilter.cpp:235-245). Translation-invariant cell ids
    floor(coord/cell) — morphology doesn't care about the reference's
    bounds offset, which spares a full pre-pass over the points."""
    return (
        df.select(
            F.floor(F.col(x) / cell).cast("long").alias("cx"),
            F.floor(F.col(y) / cell).cast("long").alias("cy"),
            F.col(z).alias("v"),
        )
        .groupBy("cx", "cy")
        .agg(F.min("v").alias("v"))
    )


def smrf(
    df: DataFrame,
    cell: float = 1.0,
    slope: float = 0.15,
    window: float | None = None,
    scalar: float = 1.25,
    threshold: float = 0.5,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    id_col: str = "pid",
    cls: str = "cls",
    ground_class: int = 2,
    other_class: int = 1,
) -> DataFrame:
    """Simple Morphological Filter (Pingel 2013; SMRFilter.cpp).

    Progressive opening radius 1..R (R = ceil(window/cell),
    default window = 18*cell per SMRFilter.cpp:174-175): each round
    adds one erosion to a running erosion chain then dilates it back
    by `radius`; cells whose surface dropped more than
    slope*cell*radius vs the previous round's opening are object
    cells (progressiveFilter loop). Provisional DEM = ZImin at
    ground cells, final opened surface at object cells. Points are
    ground iff |DEM(cell) - z| <= threshold + scalar*gsurf(cell)
    where gsurf is the gradient magnitude of DEM/cell (central
    difference, one-sided at missing neighbors — classifyGround).

    Returns `df` + `cls` column (ground_class / other_class).
    """
    if window is None:
        window = 18.0 * cell
    radii = max(1, int(math.ceil(window / cell)))

    g0 = _grid(df, cell, x, y, z).localCheckpoint(eager=True)
    dom = g0.select("cx", "cy").localCheckpoint(eager=True)

    acc = g0.withColumnRenamed("v", "s0")
    erosion = g0
    for r in range(1, radii + 1):
        erosion = _morph1(erosion, dom, "min").localCheckpoint(
            eager=True
        )
        opened = erosion
        for _ in range(r):
            opened = _morph1(opened, dom, "max")
        opened = opened.localCheckpoint(eager=True)
        acc = acc.join(
            opened.withColumnRenamed("v", f"s{r}"), on=["cx", "cy"]
        )

    obj = None
    for r in range(1, radii + 1):
        c = F.abs(F.col(f"s{r-1}") - F.col(f"s{r}")) > F.lit(
            slope * cell * r
        )
        obj = c if obj is None else (obj | c)
    cells = acc.select(
        "cx",
        "cy",
        F.when(obj, F.col(f"s{radii}")).otherwise(F.col("s0"))
        .alias("zipro"),
    ).withColumn("s", F.col("zipro") / F.lit(cell))
    cells = cells.localCheckpoint(eager=True)

    nb = cells.select("cx", "cy", "s")
    for tag, (dx, dy) in {
        "xp": (1, 0), "xm": (-1, 0), "yp": (0, 1), "ym": (0, -1)
    }.items():
        cells = cells.join(
            nb.select(
                (F.col("cx") - dx).alias("cx"),
                (F.col("cy") - dy).alias("cy"),
                F.col("s").alias(tag),
            ),
            on=["cx", "cy"],
            how="left",
        )

    def _g1(p: str, m: str):
        return (
            F.when(
                F.col(p).isNotNull() & F.col(m).isNotNull(),
                (F.col(p) - F.col(m)) / F.lit(2.0),
            )
            .when(F.col(p).isNotNull(), F.col(p) - F.col("s"))
            .when(F.col(m).isNotNull(), F.col("s") - F.col(m))
            .otherwise(F.lit(0.0))
        )

    gx, gy = _g1("xp", "xm"), _g1("yp", "ym")
    cells = cells.select(
        "cx",
        "cy",
        "zipro",
        (F.lit(threshold) + F.lit(scalar) * F.sqrt(gx * gx + gy * gy))
        .alias("cthr"),
    )

    pts = df.withColumn(
        "__cx", F.floor(F.col(x) / cell).cast("long")
    ).withColumn("__cy", F.floor(F.col(y) / cell).cast("long"))
    out = pts.join(
        cells.withColumnRenamed("cx", "__cx")
        .withColumnRenamed("cy", "__cy"),
        on=["__cx", "__cy"],
    )
    return out.withColumn(
        cls,
        F.when(
            F.abs(F.col("zipro") - F.col(z)) <= F.col("cthr"),
            F.lit(ground_class),
        ).otherwise(F.lit(other_class)),
    ).drop("__cx", "__cy", "zipro", "cthr")


def pmf_windows(
    cell_size: float,
    max_window: float,
    slope: float,
    initial_distance: float,
    max_distance: float,
    exponential: bool = True,
) -> list[tuple[float, float, int]]:
    """(window, height-threshold, unit-iterations) series exactly as
    PMFFilter.cpp:297-326, except iterations are window/cell PIXELS
    (the reference's 0.5*(ws-1) silently assumes cell_size=1)."""
    out: list[tuple[float, float, int]] = []
    it, ws = 0, 0.0
    while ws < max_window:
        if exponential:
            ws = cell_size * (2.0 * (2.0 ** it) + 1.0)
        else:
            ws = cell_size * (2.0 * (it + 1) * 2 + 1.0)
        if it == 0:
            ht = initial_distance
        else:
            ht = (
                slope * (ws - out[-1][0]) * cell_size
                + initial_distance
            )
        ht = min(ht, max_distance)
        iters = max(1, int(0.5 * (ws / cell_size - 1)))
        out.append((ws, ht, iters))
        it += 1
    return out


def pmf(
    df: DataFrame,
    cell_size: float = 1.0,
    max_window: float = 33.0,
    slope: float = 1.0,
    initial_distance: float = 0.15,
    max_distance: float = 2.5,
    exponential: bool = True,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    id_col: str = "pid",
    cls: str = "cls",
    ground_class: int = 2,
    other_class: int = 1,
) -> DataFrame:
    """Progressive Morphological Filter (Zhang 2003; PMFFilter.cpp
    processGround): the min-Z surface is opened CUMULATIVELY with
    growing windows; a point stays ground only if
    z - surface_j(cell) < ht_j at EVERY stage j (the reference's
    progressive groundIdx intersection, PMFFilter.cpp:339-355).
    """
    series = pmf_windows(
        cell_size, max_window, slope, initial_distance,
        max_distance, exponential,
    )
    g = _grid(df, cell_size, x, y, z).localCheckpoint(eager=True)
    dom = g.select("cx", "cy").localCheckpoint(eager=True)

    acc = dom
    surf = g
    for j, (_ws, _ht, iters) in enumerate(series):
        for _ in range(iters):
            surf = _morph1(surf, dom, "min")
        for _ in range(iters):
            surf = _morph1(surf, dom, "max")
        surf = surf.localCheckpoint(eager=True)
        acc = acc.join(
            surf.withColumnRenamed("v", f"z{j}"), on=["cx", "cy"]
        )

    pts = df.withColumn(
        "__cx", F.floor(F.col(x) / cell_size).cast("long")
    ).withColumn("__cy", F.floor(F.col(y) / cell_size).cast("long"))
    out = pts.join(
        acc.withColumnRenamed("cx", "__cx")
        .withColumnRenamed("cy", "__cy"),
        on=["__cx", "__cy"],
    )
    ground = None
    for j, (_ws, ht, _iters) in enumerate(series):
        c = (F.col(z) - F.col(f"z{j}")) < F.lit(ht)
        ground = c if ground is None else (ground & c)
    out = out.withColumn(
        cls,
        F.when(ground, F.lit(ground_class))
        .otherwise(F.lit(other_class)),
    )
    return out.drop(
        "__cx", "__cy", *[f"z{j}" for j in range(len(series))]
    )


def csf(
    df: DataFrame,
    resolution: float = 1.0,
    time_step: float = 0.65,
    class_threshold: float = 0.5,
    rigidness: int = 3,
    iterations: int = 24,
    gravity: float = 2.0,
    damping: float = 0.01,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    id_col: str = "pid",
    cls: str = "cls",
    ground_class: int = 2,
    other_class: int = 1,
) -> DataFrame:
    """filters.csf — Cloth Simulation Filter (Zhang 2016;
    CSFilter.cpp:185-280, filters/private/csf/Cloth.cpp:103-146,
    Particle.cpp). The cloud is inverted (z' = -z), a cloth grid at
    `resolution` starts above the inverted surface and falls: per
    iteration (1) Verlet gravity step for movable particles
    h += (h - h_prev)*(1 - damping) + gravity_displacement,
    (2) spring relaxation toward the 4-neighbor mean with the
    rigidness displacement fraction (1 - 2^-rigidness — the
    reference's pairwise constraint passes collapsed to one
    mean-field update; documented deviation), (3) terrain collision
    pinning h at the inverted surface. Ground = points whose
    inverted height is within class_threshold of the settled cloth.

    All arithmetic is +,-,*,/ on doubles with driver-side literal
    coefficients — deterministic and exactly mirrorable in SQL.
    Distributed shape: the cloth lives on the occupied CELL grid;
    each iteration is one scatter-mean over 4 neighbors (cell-table
    shuffle) + a pure projection; the point table is touched twice.
    """
    g0 = (
        df.select(
            F.floor(F.col(x) / resolution).cast("long").alias("cx"),
            F.floor(F.col(y) / resolution).cast("long").alias("cy"),
            (-F.col(z)).alias("v"),
        )
        .groupBy("cx", "cy")
        .agg(F.max("v").alias("terr"))
        .localCheckpoint(eager=True)
    )
    h0_row = g0.agg(F.max("terr")).collect()[0][0]
    if h0_row is None:  # empty input: nothing to classify
        return df.withColumn(cls, F.lit(other_class))
    h0 = float(h0_row)
    relax = 1.0 - 2.0 ** (-int(rigidness))
    gdisp = -float(gravity) * float(time_step) * float(time_step)
    keep = 1.0 - float(damping)

    p = g0.select(
        "cx", "cy", "terr",
        F.lit(h0).alias("h"), F.lit(h0).alias("hp"),
        F.lit(True).alias("mv"),
    )
    for _ in range(int(iterations)):
        # 1. gravity (Verlet, movable only)
        p = p.select(
            "cx", "cy", "terr", "mv",
            F.when(
                F.col("mv"),
                F.col("h")
                + (F.col("h") - F.col("hp")) * F.lit(keep)
                + F.lit(gdisp),
            ).otherwise(F.col("h")).alias("h"),
            F.col("h").alias("hp"),
        )
        # 2. spring: mean of 4-neighbor heights (decimal sum of <=4
        # terms for partial-agg-order determinism)
        scat = p.select(
            "h",
            F.explode(
                F.array(*[
                    F.struct(
                        (F.col("cx") + dx).alias("cx"),
                        (F.col("cy") + dy).alias("cy"),
                    )
                    for dx, dy in [(1, 0), (-1, 0), (0, 1), (0, -1)]
                ])
            ).alias("o"),
        ).select("o.cx", "o.cy", "h")
        avg = scat.groupBy("cx", "cy").agg(
            (
                F.sum(F.col("h").cast("decimal(38,15)"))
                .cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("nbavg")
        )
        p = p.join(avg, on=["cx", "cy"], how="left").select(
            "cx", "cy", "terr", "mv", "hp",
            F.when(
                F.col("mv") & F.col("nbavg").isNotNull(),
                F.col("h")
                + F.lit(relax) * (F.col("nbavg") - F.col("h")),
            ).otherwise(F.col("h")).alias("h"),
        )
        # 3. terrain collision: pin
        hit = F.col("mv") & (F.col("h") <= F.col("terr"))
        p = p.select(
            "cx", "cy", "terr",
            F.when(hit, F.col("terr")).otherwise(F.col("h"))
            .alias("h"),
            F.when(hit, F.col("terr")).otherwise(F.col("hp"))
            .alias("hp"),
            (F.col("mv") & ~hit).alias("mv"),
        ).localCheckpoint(eager=True)

    pts = df.withColumn(
        "__cx", F.floor(F.col(x) / resolution).cast("long")
    ).withColumn("__cy", F.floor(F.col(y) / resolution).cast("long"))
    out = pts.join(
        p.select(
            F.col("cx").alias("__cx"), F.col("cy").alias("__cy"), "h"
        ),
        on=["__cx", "__cy"],
    )
    return out.withColumn(
        cls,
        F.when(
            F.abs((-F.col(z)) - F.col("h"))
            < F.lit(float(class_threshold)),
            F.lit(ground_class),
        ).otherwise(F.lit(other_class)),
    ).drop("__cx", "__cy", "h")


def skewness_balancing(
    df: DataFrame,
    z: str = "z",
    id_col: str = "pid",
    cls: str = "cls",
    ground_class: int = 2,
    other_class: int = 1,
) -> DataFrame:
    """filters.skewnessbalancing (SkewnessBalancingFilter.cpp:
    79-125, Bartels & Wei): sort by elevation, track the running
    skewness of the prefix, and every time it crosses from <= 0 to
    > 0 mark everything before the crossing as ground; the suffix
    after the LAST crossing is non-ground (all points are ground if
    the skewness never ends positive without crossing).

    The reference's online Welford recurrence becomes cumulative
    decimal power sums (s1, s2, s3) over the (z, id) order with the
    closed forms M2 = s2 - s1^2/n, M3 = s3 - 3*mean*s2 + 2*n*mean^3.
    Only skewness SIGNS drive the output, and sign(skew) ==
    sign(M3), so pow/sqrt rounding cannot flip a class. The prefix
    sums are DISTRIBUTED (functions.rank.scalable_prefix_sums:
    range-partitioned local cumsums + exact decimal offsets) — no
    single-partition global window; decimal addition is associative,
    so the values match a global window bit-for-bit.
    """
    from pyspark.sql import Window

    from pdal_spark.functions.rank import scalable_prefix_sums

    zc = F.col("__z")
    t = scalable_prefix_sums(
        df.select(F.col(id_col).alias("__id"), F.col(z).alias("__z")),
        ["__z", "__id"],
        {"s1": zc, "s2": zc * zc, "s3": zc * zc * zc},
        rn="r",
    ).select(
        "__id", F.col("r").cast("int").alias("r"),
        F.col("s1").cast("double").alias("s1"),
        F.col("s2").cast("double").alias("s2"),
        F.col("s3").cast("double").alias("s3"),
    )
    n = F.col("r").cast("double")
    mean = F.col("s1") / n
    m2 = F.col("s2") - F.col("s1") * F.col("s1") / n
    m3 = (
        F.col("s3") - F.lit(3.0) * mean * F.col("s2")
        + F.lit(2.0) * n * mean * mean * mean
    )
    # guard: m2 == 0 (n=1 or constant-z prefix) -> skew undefined.
    # NULL on BOTH engines (Spark ANSI raises on /0; DuckDB yields
    # NaN which compares GREATER than 0 — a semantic trap): NULL
    # comparisons are uniformly false, matching the reference's
    # NaN-never-crosses behavior.
    skew = F.when(
        m2 > 0, F.sqrt(n) * m3 / F.pow(m2, F.lit(1.5))
    )
    t = t.withColumn("skew", skew)
    # the lag over the global rank order as an r-1 equi-join — same
    # null-at-first-row semantics, no single-partition window
    t = t.join(
        t.select(
            (F.col("r") + 1).alias("r"), F.col("skew").alias("lskew")
        ),
        on="r",
        how="left",
    )
    t = t.withColumn(
        "crossing",
        (F.col("skew") > 0) & (F.col("lskew") <= 0),
    ).localCheckpoint(eager=True)
    agg = t.agg(
        F.max(F.when(F.col("crossing"), F.col("r"))).alias("b"),
        F.max_by("skew", "r").alias("fskew"),
    ).collect()[0]
    b, fskew = agg["b"], agg["fskew"]
    if b is None:
        all_ground = fskew is not None and fskew <= 0
        lab = F.lit(ground_class if all_ground else other_class)
    else:
        lab = F.when(
            F.col("r") < F.lit(int(b)), F.lit(ground_class)
        ).otherwise(F.lit(other_class))
    out = t.select(F.col("__id").alias(id_col), lab.alias(cls))
    return df.join(out, on=id_col)


def sparse_surface(
    df: DataFrame,
    radius: float = 1.0,
    ground_class: int = 2,
    low_point_class: int = 7,
    x: str = "lon",
    y: str = "lat",
    z: str = "z",
    id_col: str = "pid",
) -> DataFrame:
    """filters.sparsesurface (SparseSurfaceFilter.cpp:74-119): scan
    points in ascending-Z order; an unlabeled point becomes GROUND
    and its unlabeled 2D neighbors within `radius` become LOW NOISE.

    That scan IS the serial-greedy Poisson-disk with order = (z, id)
    — a point is kept (ground) iff no earlier-in-z kept point lies
    within radius — so the op is a thin wrapper over the
    `sample_poisson_exact` dependency-depth fixpoint kernel (exact,
    distributed; the reference's std::sort on z alone is
    tie-unstable, so id breaks z ties deterministically). Every
    non-ground point has a kept earlier neighbor by construction,
    matching the reference's two-class output."""
    from pdal_spark.operators.sampling import sample_poisson_exact

    work = df.withColumn("__ssord", F.struct(F.col(z), F.col(id_col)))
    kept = sample_poisson_exact(
        work, radius, x=x, y=y, id_col=id_col, order="__ssord"
    ).select(F.col(id_col), F.lit(1).alias("__ground"))
    return (
        df.join(kept, on=id_col, how="left")
        .withColumn(
            "classification",
            F.when(F.col("__ground") == 1, F.lit(ground_class))
            .otherwise(F.lit(low_point_class)).cast("int"),
        )
        .drop("__ground")
    )
