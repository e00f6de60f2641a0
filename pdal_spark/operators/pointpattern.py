"""Point-pattern statistics — the classical spatial-analysis toolbox
over geocoded page/point tables: standard deviational ellipse,
quadrat variance-mean dispersion, Clark-Evans nearest-neighbour
index, convex-hull diameter, and join-count statistics for binary
lattice marks (count-valued lattice autocorrelation — Moran's I /
Geary's C — lives in operators.stats).

These are the summary statistics PDAL exposes through filters.stats /
filters.hexbin-style density products (reference: filters/
StatsFilter.cpp:346-420 for moment accumulation, filters/
HexbinFilter.cpp:140-220 for density tessellation summaries); the
ellipse / quadrat / Clark-Evans / Geary / join-count forms are the
standard point-pattern extensions a web-page-geocoding pipeline
needs (where are pages concentrated, is the pattern clustered or
dispersed, is density spatially autocorrelated).

Exactness conventions (the repo's oracle rules):
- coordinates ride the deterministic millidegree grid, so
  ``floor(v * 1000 + 0.5)`` reconstructs EXACT integers; every sum /
  squared difference below is int64 arithmetic, identical across
  engines;
- hash-compared float outputs are fixed IEEE chains (+,-,*,/,sqrt)
  over those exact integers; trig-derived outputs round(6) on both
  sides (sqlgen.py docstring).

Scale notes: every statistic here is ONE map-side-combined hash
aggregate after a row-local cell/quantize projection — no shuffle
beyond the aggregate. Lattice adjacency is two hash equi-joins
(right + up neighbour) over the CELL table (|cells| << |points|);
Clark-Evans rides the exact knn_join ring kernel; hull diameter
rides the distributed monotone-chain hull (O(partitions) shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pdal_spark import sqlgen as G

# exact integer millidegrees off the deterministic coordinate grid
_MDEG = "cast(floor(`{c}` * 1000.0e0 + 0.5e0) as bigint)"


def _mdeg(df: DataFrame, x: str, y: str) -> DataFrame:
    return df.select(
        F.expr(_MDEG.format(c=x)).alias("mx"),
        F.expr(_MDEG.format(c=y)).alias("my"),
    )


def sd_ellipse(df: DataFrame, x: str = "lon", y: str = "lat") -> DataFrame:
    """Standard deviational ellipse (Yuill 1971) of a point set: mean
    centre, the two principal axis lengths (sqrt of the covariance
    eigenvalues), and the orientation angle.

    One hash aggregate accumulates exact int64 moment sums over the
    millidegree grid (n, Sx, Sy, Sxx, Syy, Sxy); the closed-form
    eigen decomposition of the 2x2 covariance runs driver-free in the
    projection. sig1/sig2 are pure +,-,*,/,sqrt chains (hash-exact);
    theta_r = 0.5*atan2(2 Cxy, Cxx - Cyy) rounds to 6 decimals (trig).

    Scale: single pass, map-side combined, O(1) output.
    """
    q = _mdeg(df, x, y)
    agg = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mx").alias("sx"),
        F.sum("my").alias("sy"),
        F.sum(F.col("mx") * F.col("mx")).alias("sxx"),
        F.sum(F.col("my") * F.col("my")).alias("syy"),
        F.sum(F.col("mx") * F.col("my")).alias("sxy"),
    )
    nd = "cast(n as double)"
    cxx = f"(cast(sxx as double) / {nd} - (cast(sx as double) / {nd}) * (cast(sx as double) / {nd}))"
    cyy = f"(cast(syy as double) / {nd} - (cast(sy as double) / {nd}) * (cast(sy as double) / {nd}))"
    cxy = f"(cast(sxy as double) / {nd} - (cast(sx as double) / {nd}) * (cast(sy as double) / {nd}))"
    tr = f"({cxx} + {cyy})"
    dd = f"sqrt(({cxx} - {cyy}) * ({cxx} - {cyy}) + 4.0e0 * {cxy} * {cxy})"
    lam1 = f"(({tr} + {dd}) / 2.0e0)"
    lam2 = f"greatest(({tr} - {dd}) / 2.0e0, 0.0e0)"
    return agg.select(
        "n", "sx", "sy", "sxx", "syy", "sxy",
        F.expr(f"sqrt({lam1})").alias("sig1"),
        F.expr(f"sqrt({lam2})").alias("sig2"),
        F.expr(
            f"round(0.5e0 * atan2(2.0e0 * {cxy}, {cxx} - {cyy}), 6)"
        ).alias("theta_r"),
    )


def quadrat_stats(
    df: DataFrame, x: str = "lon", y: str = "lat", res: int = 6
) -> DataFrame:
    """Quadrat analysis: variance-to-mean ratio of per-cell counts
    over the FULL bbox-aligned grid at qcell resolution ``res``
    (empty quadrats inside the pattern's integer bounding box count
    as zeros — they contribute nothing to sum(c^2), so only the cell
    COUNT needs the bbox, never an empty-cell enumeration).

    VMR > 1 = clustered, < 1 = dispersed, = 1 = Poisson/CSR. All
    inputs to the float chain are exact int64 (counts, bbox extents).

    Scale: one groupBy(cell) count + one global aggregate.
    """
    q = df.select(
        F.expr(G.qcell_ix(f"`{x}`", res)).alias("ix"),
        F.expr(G.qcell_iy(f"`{y}`", res)).alias("iy"),
    )
    cells = q.groupBy("ix", "iy").agg(F.count(F.lit(1)).alias("c"))
    agg = cells.agg(
        F.sum("c").alias("n_points"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        F.count(F.lit(1)).alias("n_occupied"),
        (F.max("ix") - F.min("ix") + 1).alias("span_x"),
        (F.max("iy") - F.min("iy") + 1).alias("span_y"),
    )
    ncells = "cast(span_x * span_y as double)"
    mean = f"(cast(n_points as double) / {ncells})"
    var = f"(cast(sum_c2 as double) / {ncells} - {mean} * {mean})"
    return agg.select(
        (F.col("span_x") * F.col("span_y")).alias("n_cells"),
        "n_points", "n_occupied", "sum_c2",
        F.expr(f"{var} / {mean}").alias("vmr"),
    )


def clark_evans(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    cell: float = 10000.0,
) -> DataFrame:
    """Clark-Evans nearest-neighbour index R = observed mean NN
    distance / expected under CSR (0.5 * sqrt(area / n), area = the
    integer bounding box). R < 1 = clustered, R ~ 1 = random,
    R -> 2.15 = maximally dispersed.

    Exactness: NN search runs on the exact millidegree integer grid
    (cast to double — values < 2^26, every difference/square/sum
    below 2^53, so the kernel's distance is sqrt(exact int) and
    floor(d * 1e6 + 0.5) is engine-invariant); distances accumulate
    as integer micro-millidegrees.

    Scale: exact kNN (k=1) via the supercell cogroup kernel + ring
    expansion — the knn_join plan; everything else is one aggregate.
    """
    from pdal_spark.operators.knn import knn_join

    q = df.select(
        F.col(id_col).alias("pid"),
        F.expr(_MDEG.format(c=x)).cast("double").alias("qmx"),
        F.expr(_MDEG.format(c=y)).cast("double").alias("qmy"),
    )
    nn = knn_join(
        q, q, k=1, cell=cell, x="qmx", y="qmy",
        id_left="pid", id_right="pid", include_self=False,
    )
    nnd = nn.select(
        F.expr(
            "cast(floor(dist * 1000000.0e0 + 0.5e0) as bigint)"
        ).alias("nnd_um")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nnd_um").alias("sum_nnd_um"),
    )
    bbox = q.agg(
        (
            (F.max("qmx") - F.min("qmx"))
            * (F.max("qmy") - F.min("qmy"))
        ).cast("long").alias("area_md2")
    )
    out = nnd.crossJoin(bbox)
    obs = "(cast(sum_nnd_um as double) / 1000000.0e0 / cast(n as double))"
    exp_ = "(0.5e0 * sqrt(cast(area_md2 as double) / cast(n as double)))"
    return out.select(
        "n", "sum_nnd_um", "area_md2",
        F.expr(f"{obs} / {exp_}").alias("ce_index"),
    )


def hull_diameter(
    df: DataFrame, x: str = "lon", y: str = "lat", quant: int = 1 << 20
) -> DataFrame:
    """Diameter of the point set = the farthest pair of convex-hull
    vertices (the rotating-calipers quantity, computed by exact
    pairwise max over the hull — hull size is tiny, so the pair step
    is O(h^2) driver-free rows).

    Output: one row (ax, ay, bx, by, diam2) on the quantized integer
    grid, argmax tie-broken lexicographically — fully exact.

    Scale: rides :func:`pdal_spark.operators.features.convex_hull`
    (per-partition monotone chain, O(partitions) shuffle); the final
    argmax sorts O(h^2) rows.
    """
    from pdal_spark.operators.features import convex_hull

    hull = convex_hull(df, x=x, y=y, quant=quant)
    a = hull.select(F.col("qx").alias("ax"), F.col("qy").alias("ay"))
    b = hull.select(F.col("qx").alias("bx"), F.col("qy").alias("by"))
    pairs = a.crossJoin(b).where(
        "(ax < bx) OR (ax = bx AND ay < by)"
    )
    d2 = (
        (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
        + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
    )
    return (
        pairs.select("ax", "ay", "bx", "by", d2.alias("diam2"))
        .orderBy(
            F.col("diam2").desc(), "ax", "ay", "bx", "by"
        )
        .limit(1)
    )


def _lattice_counts(
    df: DataFrame, x: str, y: str, res: int
) -> DataFrame:
    return (
        df.select(
            F.expr(G.qcell_ix(f"`{x}`", res)).alias("ix"),
            F.expr(G.qcell_iy(f"`{y}`", res)).alias("iy"),
        )
        .groupBy("ix", "iy")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _rook_pairs(cells: DataFrame) -> DataFrame:
    """Unordered rook-adjacent pairs among OCCUPIED cells, each once:
    two hash equi-joins (right neighbour, up neighbour) — never an
    OR-join (which would nested-loop)."""
    a = cells.select(
        F.col("ix").alias("axi"), F.col("iy").alias("ayi"),
        F.col("c").alias("ca"),
    )
    right = a.withColumn("bxi", F.col("axi") + 1).withColumn(
        "byi", F.col("ayi")
    )
    up = a.withColumn("bxi", F.col("axi")).withColumn(
        "byi", F.col("ayi") + 1
    )
    b = cells.select(
        F.col("ix").alias("bxi"), F.col("iy").alias("byi"),
        F.col("c").alias("cb"),
    )
    return right.unionByName(up).join(b, on=["bxi", "byi"]).select(
        "ca", "cb"
    )


def join_counts(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
    res: int = 6,
    threshold: int = 2,
) -> DataFrame:
    """Join-count statistics for the binary mark "cell count >=
    threshold" (Black) over rook-adjacent OCCUPIED lattice cells:
    the categorical-mark spatial autocorrelation screen (BB inflated
    vs chance = hot cells clump). Output: n_black, n_white, and the
    unordered adjacent-pair tallies bb / ww / bw — all exact int64.

    Scale: identical plan shape to :func:`gearys_c`.
    """
    cells = _lattice_counts(df, x, y, res).withColumn(
        "blk", (F.col("c") >= int(threshold)).cast("int")
    )
    base = cells.agg(
        F.sum("blk").alias("n_black"),
        F.sum(1 - F.col("blk")).alias("n_white"),
    )
    pr = _rook_pairs(
        cells.select("ix", "iy", F.col("blk").alias("c"))
    ).agg(
        F.sum(F.col("ca") * F.col("cb")).alias("bb"),
        F.sum((1 - F.col("ca")) * (1 - F.col("cb"))).alias("ww"),
        F.sum(
            F.col("ca") * (1 - F.col("cb"))
            + (1 - F.col("ca")) * F.col("cb")
        ).alias("bw"),
    )
    return base.crossJoin(pr).select(
        "n_black", "n_white", "bb", "ww", "bw"
    )


def knox_test(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
    ts: str = "ts",
    id_col: str = "pid",
    space_md: int = 2000,
    time_us: int = 86_400_000_000,
) -> DataFrame:
    """Knox space-time interaction statistic (Knox 1964): do events
    close in SPACE also cluster in TIME (outbreak detection, bot
    campaigns, coordinated crawl bursts)? Counts unordered pairs
    close in space (planar millidegree distance <= space_md), close
    in time (|dt| <= time_us), and close in BOTH; the Knox ratio
    st_pairs * total / (s_pairs * t_pairs) > 1 signals interaction.

    All counts exact int64. Scale: space pairs ride a grid-bucket
    3x3 join (pair volume = local density), time pairs a 1-d
    bucket+next join on floor(ts / time_us) — never n^2; total =
    n(n-1)/2 from one count.
    """
    from pdal_spark.operators.stats import _bounded_pairs

    q = df.select(
        F.col(id_col).alias("pid"),
        F.expr(_MDEG.format(c=x)).cast("double").alias("qx"),
        F.expr(_MDEG.format(c=y)).cast("double").alias("qy"),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("tus"),
    )
    sp = _bounded_pairs(
        q, "pid", "qx", "qy", max_d_q=int(space_md), coord_q=1,
        extra=["tus"],
    )
    dt = int(time_us)
    sagg = sp.agg(
        F.count(F.lit(1)).alias("s_pairs"),
        F.sum(
            (F.abs(F.col("tus_a") - F.col("tus_b")) <= dt)
            .cast("long")
        ).alias("st_pairs"),
    )
    tb = q.select("pid", "tus", F.expr(f"tus div {dt}").alias("jb"))
    ta = tb.select(F.col("pid").alias("id_a"),
                   F.col("tus").alias("ta"),
                   F.explode(F.array(F.col("jb"),
                                     F.col("jb") + 1)).alias("jb"))
    tpairs = (
        ta.join(tb.select(F.col("pid").alias("id_b"),
                          F.col("tus").alias("tb2"), "jb"), on="jb")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("ta") - F.col("tb2")) <= dt)
        )
        .select("id_a", "id_b").distinct()
        .agg(F.count(F.lit(1)).alias("t_pairs"))
    )
    n = q.agg(F.count(F.lit(1)).alias("n"))
    out = sagg.crossJoin(tpairs).crossJoin(n)
    total = "(cast(n as double) * cast(n - 1 as double) / 2.0e0)"
    knox = (
        f"cast(st_pairs as double) * {total}"
        " / (cast(s_pairs as double) * cast(t_pairs as double))"
    )
    return out.select(
        "n", "s_pairs", "t_pairs", "st_pairs",
        F.when(
            (F.col("s_pairs") > 0) & (F.col("t_pairs") > 0),
            F.expr(knox),
        ).alias("knox_ratio"),
    )


def location_quotient(
    df: DataFrame, cell: str = "cell", cat: str = "cat"
) -> DataFrame:
    """Location quotient (Haig 1928; the regional-science staple):
    how over/under-represented category `cat` is in zone `cell`
    relative to the corpus mix —

        LQ = (n_cell_cat / n_cell) / (n_cat / n_total).

    The per-cell detector behind "which regions over-index on error
    events / which domains over-index on a language" screens; raw
    counts compare ONLY within a cell, LQ compares across cells.

    All four counts are exact int64; lq is a fixed IEEE chain of two
    exactly-rounded divisions over them — hash-identical cross-engine.

    Scale: ONE map-side-combined groupBy(cell, cat); the three total
    tables derive from THAT grouped result (|cells x cats| rows, not
    points). Category totals and the grand total are broadcast; the
    cell-total join shuffles only the grouped table.
    """
    counts = df.groupBy(cell, cat).agg(
        F.count(F.lit(1)).cast("long").alias("n_cc")
    )
    cell_tot = counts.groupBy(cell).agg(
        F.sum("n_cc").alias("n_cell")
    )
    cat_tot = counts.groupBy(cat).agg(F.sum("n_cc").alias("n_cat"))
    tot = counts.agg(F.sum("n_cc").alias("n_tot"))
    return (
        counts.join(cell_tot, on=cell)
        .join(F.broadcast(cat_tot), on=cat)
        .crossJoin(F.broadcast(tot))
        .select(
            cell,
            cat,
            "n_cc",
            (
                (F.col("n_cc").cast("double")
                 / F.col("n_cell").cast("double"))
                / (F.col("n_cat").cast("double")
                   / F.col("n_tot").cast("double"))
            ).alias("lq"),
        )
    )


def relative_risk(
    df: DataFrame,
    cell: str = "cell",
    case: str = "is_case",
    k: float = 1.0,
) -> DataFrame:
    """Per-cell relative-risk surface for case/control point sets
    (disease mapping's standard readout, here over geocoded pages:
    where do error events / flagged documents concentrate BEYOND
    what overall density predicts):

        expected_c = total_cases * n_c / n_total
        rr         = cases_c / expected_c
        rr_eb      = (cases_c + k) / (expected_c + k)

    rr_eb is the empirical-Bayes-style shrunk form — cells with tiny
    expected counts stop producing infinite-looking risks (k pseudo-
    counts pull them to 1). Counts exact int64; expected/rr/rr_eb are
    fixed IEEE chains (exactly-rounded *, /) — hash-exact.

    Scale: ONE map-side-combined groupBy(cell) + a broadcast of the
    one-row totals; zero additional shuffle.
    """
    per = df.groupBy(cell).agg(
        F.sum(F.col(case).cast("long")).alias("cases"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    tot = per.agg(
        F.sum("cases").alias("ct"), F.sum("n").alias("nt")
    )
    kf = G.fnum(float(k))
    exp_d = (
        "(cast(ct as double) * cast(n as double)"
        " / cast(nt as double))"
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .where(F.col("ct") > 0)
        .select(
            cell,
            "cases",
            "n",
            F.expr(f"cast(cases as double) / {exp_d}").alias("rr"),
            F.expr(
                f"(cast(cases as double) + {kf})"
                f" / ({exp_d} + {kf})"
            ).alias("rr_eb"),
        )
    )


HUFF_Q = 1 << 40


def huff_model(
    origins: DataFrame,
    facilities: DataFrame,
    oid: str = "oid",
    fid: str = "fid",
    w: str = "w",
    q: int = HUFF_Q,
) -> DataFrame:
    """Huff (1963) spatial-interaction model: the probability an
    origin patronizes facility j is its distance-discounted
    attractiveness share,

        P(o, j) = (w_j / d2_oj) / sum_j' (w_j' / d2_oj').

    Both frames carry exact integer grid coordinates (mx, my). Each
    term quantizes to score_q = (w * q) div (d2 + 1) — an exact int64
    (the +1 regularizer handles co-located pairs and keeps the
    discount integral), so the per-origin denominator is an exact
    integer SUM (order-invariant, unlike summing float terms) and the
    probability is ONE exactly-rounded division. Choose q LARGER than
    the maximum possible d2 (the default 2^40 covers the full
    millidegree grid, max d2 ~ 1.6e11) so every term is >= 1 and the
    denominator is positive by construction — with a too-small q a
    far-from-everything origin floors every term to 0 and the
    probability divides by zero.

    Scale: facilities are the classic small dimension (stores,
    service sites) — broadcast; the o x f fan-out is |F| rows per
    origin and the denominator is one window over the origin key
    (a single shuffle on oid). For very large F, pre-filter with a
    radius cutoff (bounded-pairs cell join) before calling.
    """
    from pyspark.sql import Window

    f2 = facilities.select(
        F.col(fid).alias("__fid"),
        F.col("mx").alias("fmx"),
        F.col("my").alias("fmy"),
        F.col(w).cast("long").alias("__w"),
    )
    d2 = (
        "(mx - fmx) * (mx - fmx) + (my - fmy) * (my - fmy)"
    )
    scored = origins.crossJoin(F.broadcast(f2)).select(
        F.col(oid).alias("__oid"),
        "__fid",
        F.expr(f"(__w * cast({int(q)} as bigint)) div ({d2} + 1)")
        .alias("score_q"),
    )
    win = Window.partitionBy("__oid")
    return scored.select(
        F.col("__oid").alias(oid),
        F.col("__fid").alias(fid),
        "score_q",
        (
            F.col("score_q").cast("double")
            / F.sum("score_q").over(win).cast("double")
        ).alias("p"),
    )


TWOSFCA_Q = 1 << 30


def two_sfca(
    demand: DataFrame,
    supply: DataFrame,
    radius: int,
    did: str = "did",
    sid: str = "sid",
    pop: str = "pop",
    cap: str = "cap",
    q: int = TWOSFCA_Q,
) -> DataFrame:
    """Two-step floating catchment area accessibility (Luo & Wang
    2003 — THE spatial-accessibility measure: how much service
    capacity is reachable per head, accounting for everyone else
    competing for it):

        step 1 (per supply j):  R_j = cap_j / sum_{d(i,j)<=r} pop_i
        step 2 (per demand i):  A_i = sum_{d(i,j)<=r} R_j

    Both frames carry exact integer grid coordinates (mx, my);
    "within r" compares exact squared int64 grid distance to r^2.
    R_j quantizes to r_q = (cap * q) div pop_within (exact int64), so
    A_i = sum(r_q) is an exact integer sum — order-invariant where a
    float R_j sum is not. Demand points with NO supply in radius get
    a_q = 0 / n_fac = 0 (kept, not dropped).

    Scale: supply is the small dimension — broadcast BOTH joins; the
    pair space is radius-bounded, never |D| x |S| materialized rows
    beyond matches. Shuffles: one groupBy(sid) over matches (tiny),
    one groupBy(did).
    """
    r2 = int(radius) * int(radius)
    s2 = supply.select(
        F.col(sid).alias("__sid"),
        F.col("mx").alias("smx"),
        F.col("my").alias("smy"),
        F.col(cap).cast("long").alias("__cap"),
    )
    near = (
        "(mx - smx) * (mx - smx) + (my - smy) * (my - smy)"
        f" <= {r2}"
    )
    pairs = demand.join(F.broadcast(s2), F.expr(near))
    ratios = (
        pairs.groupBy("__sid", "__cap")
        .agg(F.sum(F.col(pop).cast("long")).alias("pop_in"))
        .select(
            "__sid",
            F.expr(
                f"(__cap * cast({int(q)} as bigint)) div pop_in"
            ).alias("r_q"),
        )
    )
    acc = (
        pairs.select(F.col(did).alias("__did"), "__sid")
        .join(F.broadcast(ratios), on="__sid")
        .groupBy("__did")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fac"),
            F.sum("r_q").alias("a_q"),
        )
    )
    return (
        demand.select(F.col(did).alias("__did"))
        .distinct()
        .join(acc, on="__did", how="left")
        .select(
            F.col("__did").alias(did),
            F.coalesce(F.col("n_fac"), F.lit(0).cast("long"))
            .alias("n_fac"),
            F.coalesce(F.col("a_q"), F.lit(0).cast("long"))
            .alias("a_q"),
        )
    )


def gwr_local(
    samples: DataFrame,
    targets: DataFrame,
    h: int,
    tid: str = "tid",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Geographically weighted regression (Fotheringham et al. 2002)
    — THE local-relationship mapper: at each target location, a
    weighted simple regression y ~ x over the samples within
    bandwidth h, weights decaying with distance. Where grouped_ols
    fits one slope per discrete group, GWR fits one per LOCATION and
    lets it drift across space ("does quality predict engagement
    differently in different regions").

    Kernel: integer Epanechnikov — w = h2 - d2 for d2 < h2 (h2 =
    h^2 on the exact integer grid), 0 outside. Regression estimates
    are invariant to weight scaling, so the unnormalized integer
    kernel gives EXACT int64 moment sums (sw, swx, swy, swxx, swxy);
    x and y must be integer-valued columns. The closed-form solve

        beta1 = (sw*swxy - swx*swy) / (sw*swxx - swx*swx)
        beta0 = (swy - beta1*swx) / sw

    runs in DOUBLE over the exact sums (int64 -> double rounds
    half-even IDENTICALLY in both engines, so the chain stays
    hash-exact even when a sum exceeds 2^53). Targets whose local
    determinant is zero (no x variance in range) are dropped.

    Overflow bound: each moment term w*x*y must stay under 2^63 /
    n_matches — with the default grids (w <= h2 ~ 1e9, |x|,|y| <=
    1e3) that holds to ~1e6 in-range samples per target; rescale x/y
    first if yours are wider.

    Scale: targets are the small analysis dimension — broadcast; the
    pair space is bandwidth-bounded; ONE map-side-combined groupBy
    per target. For huge target sets route through a bounded-pairs
    cell join instead of the broadcast.
    """
    h2 = int(h) * int(h)
    t2 = targets.select(
        F.col(tid).alias("__tid"),
        F.col("mx").alias("tmx"),
        F.col("my").alias("tmy"),
    )
    d2 = "(mx - tmx) * (mx - tmx) + (my - tmy) * (my - tmy)"
    pairs = samples.join(
        F.broadcast(t2), F.expr(f"{d2} < {h2}")
    ).select(
        "__tid",
        F.expr(f"{h2} - ({d2})").alias("w"),
        F.col(x).cast("long").alias("__x"),
        F.col(y).cast("long").alias("__y"),
    )
    mom = pairs.groupBy("__tid").agg(
        F.count(F.lit(1)).cast("long").alias("n_in"),
        F.sum("w").alias("sw"),
        F.sum(F.expr("w * __x")).alias("swx"),
        F.sum(F.expr("w * __y")).alias("swy"),
        F.sum(F.expr("w * __x * __x")).alias("swxx"),
        F.sum(F.expr("w * __x * __y")).alias("swxy"),
    )
    det = (
        "(cast(sw as double) * cast(swxx as double)"
        " - cast(swx as double) * cast(swx as double))"
    )
    b1 = (
        "(cast(sw as double) * cast(swxy as double)"
        " - cast(swx as double) * cast(swy as double))"
        f" / {det}"
    )
    return (
        mom.where(F.expr(f"{det} <> 0.0e0"))
        .select(
            F.col("__tid").alias(tid),
            "n_in",
            "sw",
            F.expr(b1).alias("beta1"),
            F.expr(
                f"(cast(swy as double) - ({b1})"
                " * cast(swx as double)) / cast(sw as double)"
            ).alias("beta0"),
        )
    )


CIRC_Q = 1_000_000_000


def circular_stats(
    df: DataFrame, key: str = "key", bearing: str = "bearing"
) -> DataFrame:
    """Circular (directional) statistics per key (Mardia & Jupp
    2000): mean direction, mean resultant length R, and circular
    variance 1 - R of a bearing column in degrees — the correct
    average of headings/bearings, where the arithmetic mean of 359
    and 1 is nonsense. Summarizes trajectory_bearings output per
    vehicle/user/flow.

    Each sin/cos term quantizes to integer nano-units BEFORE the sum
    (floor(round(trig, 9) * 1e9 + 0.5) — the spherical_polygon_area
    convention: float addition is order-dependent, integer
    accumulation is partitioning-invariant; round(9) first absorbs
    JVM-vs-libm trig ulps). R and the variance are fixed IEEE
    chains; the mean direction is trig-derived -> round(6), in
    [0, 360).

    Scale: ONE map-side-combined hash aggregate.
    """
    import math

    rad = G.fnum(math.pi / 180.0)
    deg = G.fnum(180.0 / math.pi)
    qf = G.fnum(float(CIRC_Q))
    cq = (
        f"cast(floor(round(cos(`{bearing}` * {rad}), 9) * {qf}"
        f" + {G.fnum(0.5)}) as bigint)"
    )
    sq = (
        f"cast(floor(round(sin(`{bearing}` * {rad}), 9) * {qf}"
        f" + {G.fnum(0.5)}) as bigint)"
    )
    agg = df.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr(cq)).alias("sc"),
        F.sum(F.expr(sq)).alias("ss"),
    )
    r_expr = (
        "sqrt(cast(sc as double) * cast(sc as double)"
        " + cast(ss as double) * cast(ss as double))"
        f" / (cast(n as double) * {qf})"
    )
    mean_raw = (
        f"(atan2(cast(ss as double), cast(sc as double)) * {deg})"
    )
    mean_wrapped = (
        f"({mean_raw} - {G.fnum(360.0)}"
        f" * floor({mean_raw} / {G.fnum(360.0)}))"
    )
    return agg.select(
        key,
        "n",
        "sc",
        "ss",
        F.expr(f"round({mean_wrapped}, 6)").alias("mean_dir"),
        F.expr(f"{r_expr}").alias("r_len"),
        F.expr(f"1.0e0 - {r_expr}").alias("circ_var"),
    )


def spacetime_scan(
    counts: DataFrame,
    res: int,
    max_k: int = 2,
    max_len: int = 2,
    min_n: int = 3,
    cell: str = "cell",
    tbin: str = "tbin",
    n: str = "n",
) -> DataFrame:
    """Kulldorff space-time scan statistic, permutation-indicator
    form (Kulldorff 1997; Kulldorff et al. 2005) — THE outbreak /
    emerging-event detector: over every candidate cylinder (disk of
    Chebyshev radius k around a center cell x a window of max_len
    consecutive time bins), the Poisson log-likelihood ratio of the
    observed count n against its space-time expectation

        E  = n_zone * n_window / N
        LLR = n ln(n/E) + (N-n) ln((N-n)/(N-E)),   n > E

    Input is the (cell, tbin) count aggregate. Candidates with n >=
    min_n and n > E emit (center, k, win_start, win_len, n, e, llr);
    llr rounds(6) (ln is INEXACT), so the TOP cylinder is a plain
    max over the output. n/n_zone/n_window/N are exact int64.

    Scale: the candidate enumeration is bounded — one grid_disk
    explode ((2k+1)^2 row-local) + window/k explodes (max_len *
    (max_k+1) copies) + hash aggregates on (center, k, start, len);
    the three totals tables join back by key (day totals tiny,
    grand total broadcast). Never a space x time cross join.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = counts.select(
        F.col(cell).alias("c"),
        F.col(tbin).cast("long").alias("d"),
        F.col(n).cast("long").alias("cnt"),
    )
    centers = base.select("c").distinct()
    disk = grid_disk(
        centers, "c", res=res, k=int(max_k), out="nc",
        ring_out="ring",
    )
    # per (center, k, day): disk count, cumulative over rings <= k
    zd = (
        disk.join(
            base.select(F.col("c").alias("nc"), "d", "cnt"),
            on="nc",
        )
        .select(
            "c", "ring", "d", "cnt",
            F.explode(
                F.array(*[F.lit(kk) for kk in range(int(max_k) + 1)])
            ).alias("k"),
        )
        .where(F.col("ring") <= F.col("k"))
        .groupBy("c", "k", "d")
        .agg(F.sum("cnt").alias("n_ckd"))
    )
    # candidate windows: contribute day d to starts d-j, len L > j
    wins = F.array(*[
        F.struct(F.lit(j).alias("j"), F.lit(L).alias("len"))
        for L in range(1, int(max_len) + 1) for j in range(L)
    ])
    cand = (
        zd.select(
            "c", "k", "n_ckd", F.explode(wins).alias("w"),
            F.col("d").alias("dd"),
        )
        .select(
            "c", "k", "n_ckd",
            (F.col("dd") - F.col("w.j")).alias("start"),
            F.col("w.len").alias("len"),
        )
        .groupBy("c", "k", "start", "len")
        .agg(F.sum("n_ckd").alias("n_obs"))
    )
    # zone totals (all time), window totals (all space), grand total
    nz = zd.groupBy("c", "k").agg(F.sum("n_ckd").alias("n_zone"))
    dt = base.groupBy("d").agg(F.sum("cnt").alias("n_day"))
    nt = (
        dt.select(
            "n_day", F.explode(wins).alias("w"),
            F.col("d").alias("dd"),
        )
        .select(
            (F.col("dd") - F.col("w.j")).alias("start"),
            F.col("w.len").alias("len"),
            "n_day",
        )
        .groupBy("start", "len")
        .agg(F.sum("n_day").alias("n_win"))
    )
    tot = base.agg(F.sum("cnt").alias("big_n"))
    e_expr = (
        "(cast(n_zone as double) * cast(n_win as double)"
        " / cast(big_n as double))"
    )
    llr = (
        f"round(cast(n_obs as double) * ln(cast(n_obs as double)"
        f" / {e_expr})"
        " + case when n_obs < big_n then"
        " (cast(big_n as double) - cast(n_obs as double))"
        " * ln((cast(big_n as double) - cast(n_obs as double))"
        f" / (cast(big_n as double) - {e_expr})) else 0.0e0 end, 6)"
    )
    return (
        cand.join(nz, on=["c", "k"])
        .join(nt, on=["start", "len"])
        .crossJoin(F.broadcast(tot))
        .where(
            (F.col("n_obs") >= int(min_n))
            & F.expr(f"cast(n_obs as double) > {e_expr}")
        )
        .select(
            F.col("c").alias("center"),
            F.col("k").cast("long").alias("k"),
            "start",
            F.col("len").cast("long").alias("win_len"),
            F.col("n_obs"),
            F.expr(f"round({e_expr}, 6)").alias("e_obs"),
            F.expr(llr).alias("llr"),
        )
    )


CLC_Q = 1_000_000


def circ_linear_corr(
    df: DataFrame,
    bearing: str,
    value: str,
) -> DataFrame:
    """Circular-linear correlation (Mardia 1976): association
    between a LINEAR variable and a DIRECTION (does wind speed
    depend on wind direction; does speed depend on heading) — the
    correlational member of the circular family next to
    circular_stats:

        R2 = (r_xc^2 + r_xs^2 - 2 r_xc r_xs r_cs) / (1 - r_cs^2)

    with r_xc = corr(x, cos t), r_xs = corr(x, sin t), r_cs =
    corr(cos t, sin t). cos/sin quantize to integer micro-units
    (round(9) first — the circular_stats convention at a coarser
    grid so every cross-moment product stays int64); each r is a
    fixed IEEE chain over the integer moments. Output: (n, r_xc,
    r_xs, r_cs, r2).

    Scale: ONE map-side-combined moment aggregation.
    """
    import math

    rad = G.fnum(math.pi / 180.0)
    qf = G.fnum(float(CLC_Q))
    cq = (
        f"cast(floor(round(cos(({bearing}) * {rad}), 9)"
        f" * {qf} + 0.5e0) as bigint)"
    )
    sq = (
        f"cast(floor(round(sin(({bearing}) * {rad}), 9)"
        f" * {qf} + 0.5e0) as bigint)"
    )
    base = df.select(
        F.col(value).cast("long").alias("x"),
        F.expr(cq).alias("c"),
        F.expr(sq).alias("s"),
    )
    m = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"), F.sum("c").alias("sc"),
        F.sum("s").alias("ss"),
        F.sum(F.expr("x * c")).alias("sxc"),
        F.sum(F.expr("x * s")).alias("sxs"),
        F.sum(F.expr("c * s")).alias("scs"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("c * c")).alias("scc"),
        F.sum(F.expr("s * s")).alias("sss"),
    )

    def _corr(sab: str, sa: str, sb: str,
              saa: str, sbb: str) -> str:
        num = (
            f"(cast(n as double) * cast({sab} as double)"
            f" - cast({sa} as double) * cast({sb} as double))"
        )
        da = (
            f"(cast(n as double) * cast({saa} as double)"
            f" - cast({sa} as double) * cast({sa} as double))"
        )
        db = (
            f"(cast(n as double) * cast({sbb} as double)"
            f" - cast({sb} as double) * cast({sb} as double))"
        )
        return f"({num} / sqrt({da} * {db}))"

    rxc = _corr("sxc", "sx", "sc", "sxx", "scc")
    rxs = _corr("sxs", "sx", "ss", "sxx", "sss")
    rcs = _corr("scs", "sc", "ss", "scc", "sss")
    r2 = (
        f"(({rxc} * {rxc} + {rxs} * {rxs}"
        f" - 2.0e0 * {rxc} * {rxs} * {rcs})"
        f" / (1.0e0 - {rcs} * {rcs}))"
    )
    g = "case when n > 2 then "
    return m.select(
        "n",
        F.expr(f"{g}{rxc} end").alias("r_xc"),
        F.expr(f"{g}{rxs} end").alias("r_xs"),
        F.expr(f"{g}{rcs} end").alias("r_cs"),
        F.expr(f"{g}{r2} end").alias("r2"),
    )


def vonmises_kappa(
    df: DataFrame,
    key: str,
    bearing: str,
) -> DataFrame:
    """Von Mises concentration estimate per key (the circular
    sigma-inverse: how TIGHT are these headings?) via the standard
    A-inverse(R) piecewise approximation (Fisher 1993 eq. 4.40):

        R < 0.53:   kappa = 2R + R^3 + 5R^5/6
        R < 0.85:   kappa = -0.4 + 1.39R + 0.43/(1-R)
        else:       kappa = 1/(R^3 - 4R^2 + 3R)

    R comes from circular_stats' integer nano-unit resultant; every
    branch is a fixed IEEE chain (same branch taken in both engines
    — R is bit-identical). Output per key: (key, n, r_res, kappa).

    Scale: ONE hash aggregate + row-local closing chain.
    """
    import math

    rad = G.fnum(math.pi / 180.0)
    qf = G.fnum(float(CIRC_Q))
    cq = (
        f"cast(floor(round(cos(({bearing}) * {rad}), 9)"
        f" * {qf} + 0.5e0) as bigint)"
    )
    sq = (
        f"cast(floor(round(sin(({bearing}) * {rad}), 9)"
        f" * {qf} + 0.5e0) as bigint)"
    )
    agg = df.select(
        F.col(key).alias("k"),
        F.expr(cq).alias("c"), F.expr(sq).alias("s"),
    ).groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").alias("sc"), F.sum("s").alias("ss"),
    )
    r = (
        "(sqrt(cast(sc as double) * cast(sc as double)"
        " + cast(ss as double) * cast(ss as double))"
        f" / (cast(n as double) * {qf}))"
    )
    kappa = (
        # saturation guard: R -> 1 sends the last branch's
        # denominator to 0 (ANSI divide-by-zero) — report NULL
        f"case when {r} > 0.99999e0 then null"
        f" when {r} < 0.53e0 then"
        f" 2.0e0 * {r} + {r} * {r} * {r}"
        f" + 5.0e0 * {r} * {r} * {r} * {r} * {r} / 6.0e0"
        f" when {r} < 0.85e0 then"
        f" -0.4e0 + 1.39e0 * {r} + 0.43e0 / (1.0e0 - {r})"
        f" else 1.0e0 / ({r} * {r} * {r}"
        f" - 4.0e0 * {r} * {r} + 3.0e0 * {r}) end"
    )
    return agg.select(
        "k", "n",
        F.expr(f"round({r}, 9)").alias("r_res"),
        F.expr(
            f"case when n > 0 then round({kappa}, 9) end"
        ).alias("kappa"),
    )


def watson_williams(
    df: DataFrame,
    group: str,
    bearing: str,
) -> DataFrame:
    """Watson-Williams test for equal mean DIRECTIONS across k
    groups (the circular one-way ANOVA — do the two fleets head
    the same way?):

        F = ((N - k)(sum_g R_g - R)) / ((k - 1)(N - sum_g R_g))

    with R_g each group's resultant length and R the pooled one —
    all built from the circular_stats nano-unit integer sums, so
    every resultant is one identical sqrt chain and F closes it
    out (round 9). Valid for concentrated data (kappa > 1 — the
    caller's check via vonmises_kappa). Output: (n, k, f_r).

    Scale: one (group) trig agg + one pooled fold.
    """
    import math

    rad = G.fnum(math.pi / 180.0)
    qf = G.fnum(float(CIRC_Q))
    cq = (
        f"cast(floor(round(cos(({bearing}) * {rad}), 9)"
        f" * {qf} + 0.5e0) as bigint)"
    )
    sq = (
        f"cast(floor(round(sin(({bearing}) * {rad}), 9)"
        f" * {qf} + 0.5e0) as bigint)"
    )
    per = df.select(
        F.col(group).alias("g"),
        F.expr(cq).alias("c"), F.expr(sq).alias("s"),
    ).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("c").alias("sc"), F.sum("s").alias("ss"),
    )
    rg = (
        "sqrt(cast(sc as double) * cast(sc as double)"
        " + cast(ss as double) * cast(ss as double))"
    )
    agg = per.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.expr(
                f"cast(floor({rg} + 0.5e0) as bigint)"
            )
        ).alias("sum_rg_q"),
        F.sum("sc").alias("tc"), F.sum("ss").alias("ts"),
    )
    r_all = (
        "sqrt(cast(tc as double) * cast(tc as double)"
        " + cast(ts as double) * cast(ts as double))"
    )
    f = (
        "((cast(n as double) - cast(k as double))"
        f" * (cast(sum_rg_q as double) - {r_all}))"
        " / ((cast(k as double) - 1.0e0)"
        f" * (cast(n as double) * {qf}"
        " - cast(sum_rg_q as double)))"
    )
    return agg.select(
        "n", "k",
        F.expr(
            f"case when k > 1 and cast(n as double) * {qf}"
            f" - cast(sum_rg_q as double) > 0.0e0 then"
            f" round({f}, 9) end"
        ).alias("f_r"),
    )
