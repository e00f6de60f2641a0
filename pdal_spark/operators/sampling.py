"""Spatial thinning samplers (SURVEY.md §2.3): filters.sample
(Poisson-disk) and filters.fps (farthest-point sampling).

Both reference implementations are order-sequential greedy scans over
the whole view (SampleFilter.cpp voxel-hash greedy;
FarthestPointSamplingFilter.cpp). A faithful global greedy cannot be
parallelized, so:

- `sample_poisson` runs the PARALLEL 4-color variant: cells of size
  `radius` are 2x2-colored; colors are processed in 4 sequential
  passes, and within a pass every cell runs an independent greedy
  (same-color cells are provably >= radius apart edge-to-edge, so
  their decisions cannot conflict). Each cell sees already-kept
  points from earlier passes via a 1-cell halo. The result satisfies
  the same INVARIANTS as the reference (kept points pairwise >=
  radius; every dropped point within radius of a kept one) but may
  keep a different maximal set — the documented deviation
  (SURVEY.md §7 order-dependence risk).
- `fps` is EXACT: each iteration picks the argmax of the running
  min-distance column — a full scan per sample, fine for the typical
  small `count`, distributed in the scan dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sample_poisson(
    df: DataFrame,
    radius: float,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    order: str | None = None,
    pinned: DataFrame | None = None,
) -> DataFrame:
    """Keep a subset with pairwise distance >= radius, greedy per
    cell in `order` (default: id order).

    `pinned` (id_col, x, y rows): points pre-accepted before any
    candidate — they enter every color pass's halo and are never
    rejected, and their ids are part of the result. This is the
    monotonicity hook relaxation dart throwing needs: the 4-color
    pass order alone cannot guarantee that previously kept points
    survive a re-run at a smaller radius."""
    import numpy as np
    import pandas as pd

    order = order or id_col
    r = float(radius)
    base = df.select(
        F.col(id_col).alias("pid"),
        F.col(x).alias("px"), F.col(y).alias("py"),
        F.col(order).alias("ord"),
    ).withColumn(
        "cx", F.floor(F.col("px") / r).cast("long")
    ).withColumn(
        "cy", F.floor(F.col("py") / r).cast("long")
    ).localCheckpoint(eager=True)

    id_type = base.schema["pid"].dataType
    schema = T.StructType([
        T.StructField("pid", id_type),
        T.StructField("px", T.DoubleType()),
        T.StructField("py", T.DoubleType()),
        T.StructField("cx", T.LongType()),
        T.StructField("cy", T.LongType()),
    ])

    def greedy(key, cand: pd.DataFrame, halo: pd.DataFrame
               ) -> pd.DataFrame:
        if len(cand) == 0:
            return pd.DataFrame(
                {f.name: [] for f in schema.fields}
            )
        cand = cand.sort_values("ord", kind="stable")
        kx = list(halo["px"]) if len(halo) else []
        ky = list(halo["py"]) if len(halo) else []
        keep = []
        for row in cand.itertuples(index=False):
            if kx:
                dx = np.asarray(kx) - row.px
                dy = np.asarray(ky) - row.py
                if float((dx * dx + dy * dy).min()) < r * r:
                    continue
            kx.append(row.px)
            ky.append(row.py)
            keep.append(row)
        out = pd.DataFrame(keep, columns=cand.columns)
        return out[["pid", "px", "py", "cx", "cy"]]

    kept: DataFrame | None = None
    if pinned is not None:
        pin = pinned.select(
            F.col(id_col).alias("pid"),
            F.col(x).alias("px"), F.col(y).alias("py"),
        ).withColumn(
            "cx", F.floor(F.col("px") / r).cast("long")
        ).withColumn(
            "cy", F.floor(F.col("py") / r).cast("long")
        ).localCheckpoint(eager=True)
        base = base.join(
            pin.select("pid"), on="pid", how="left_anti"
        )
        kept = pin.select("pid", "px", "py", "cx", "cy")
    for color_x in (0, 1):
        for color_y in (0, 1):
            cand = base.where(
                (F.pmod(F.col("cx"), F.lit(2)) == color_x)
                & (F.pmod(F.col("cy"), F.lit(2)) == color_y)
            )
            if kept is not None:
                # kept points duplicated into their 3x3 neighbor
                # cells = the halo each candidate cell must respect
                offs = [(dx, dy) for dx in (-1, 0, 1)
                        for dy in (-1, 0, 1)]
                halo = kept.withColumn(
                    "__o",
                    F.explode(F.array(*[
                        F.struct(
                            (F.col("cx") + dx).alias("hx"),
                            (F.col("cy") + dy).alias("hy"),
                        )
                        for dx, dy in offs
                    ])),
                ).select(
                    F.col("__o.hx").alias("cx"),
                    F.col("__o.hy").alias("cy"),
                    "px", "py", "pid",
                )
            else:
                halo = base.limit(0).select(
                    "cx", "cy", "px", "py", "pid"
                )
            new = (
                cand.groupBy("cx", "cy")
                .cogroup(halo.groupBy("cx", "cy"))
                .applyInPandas(greedy, schema)
            )
            kept = (
                new if kept is None else kept.unionByName(new)
            ).localCheckpoint(eager=True)
    assert kept is not None
    return df.join(
        kept.select(F.col("pid").alias(id_col)), on=id_col,
        how="left_semi",
    )


def fps(
    df: DataFrame,
    count: int,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
) -> DataFrame:
    """Exact farthest-point sampling of `count` rows, seeded at the
    smallest id (deterministic; ties broken by id). Selected rows are
    removed from the pool each round (duplicate coordinates can zero
    out every remaining min-distance; without removal the argmax
    would re-pick an already-selected point)."""
    from pyspark.sql import types as T

    if count <= 0:
        return df.limit(0)
    work = df.select(
        F.col(id_col).alias("pid"),
        F.col(x).alias("px"), F.col(y).alias("py"),
    )
    head = work.orderBy("pid").limit(1).collect()
    if not head:
        return df.limit(0)
    first = head[0]
    sel_ids = [first["pid"]]
    fx, fy = float(first["px"]), float(first["py"])
    d2 = (F.col("px") - fx) * (F.col("px") - fx) + (
        F.col("py") - fy
    ) * (F.col("py") - fy)
    work = (
        work.where(F.col("pid") != first["pid"])
        .withColumn("mind", d2)
        .localCheckpoint(eager=True)
    )
    for _ in range(count - 1):
        head = work.orderBy(
            F.col("mind").desc(), F.col("pid").asc()
        ).limit(1).collect()
        if not head:  # count > #rows: return everything selected
            break
        top = head[0]
        sel_ids.append(top["pid"])
        nx, ny = float(top["px"]), float(top["py"])
        nd2 = (F.col("px") - nx) * (F.col("px") - nx) + (
            F.col("py") - ny
        ) * (F.col("py") - ny)
        work = (
            work.where(F.col("pid") != top["pid"])
            .withColumn("mind", F.least(F.col("mind"), nd2))
            .localCheckpoint(eager=True)
        )
    sel = df.sparkSession.createDataFrame(
        [(i,) for i in sel_ids],
        T.StructType([T.StructField(
            id_col, df.schema[id_col].dataType
        )]),
    )
    return df.join(sel, on=id_col, how="left_semi")


def fps_approx(
    df: DataFrame,
    count: int,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    oversample: int = 4,
    grid: int = 16,
) -> DataFrame:
    """Approximate distributed farthest-point sampling — the scale
    path next to the exact :func:`fps` (which runs one Spark job per
    selected point: fine for count <= ~100, quadratic wall-clock
    beyond; FarthestPointSamplingFilter.cpp is the sequential
    reference).

    Two phases:
    1. per-cell local FPS (``applyInPandas`` over a grid x grid
       bbox lattice, vectorized numpy greedy): each occupied cell
       emits ceil(oversample * count * n_cell / n_total) + 1
       candidates, seeded at the cell's smallest id — so each cell
       contributes its best-spread representatives, and the GLOBAL
       smallest id is always among the candidates;
    2. one exact numpy FPS over the ~oversample*count candidates on
       the driver, seeded at the global smallest id (the same seed
       rule as :func:`fps`).

    Deterministic for fixed inputs/params. Coverage guarantee is
    heuristic (pytest pins the objective within a factor of exact on
    a fixture); the heavy O(n * m) scan distributes, the driver pass
    is O(count * oversample * count).

    Scale: ONE shuffle on the cell key + one candidate collect of
    O(oversample * count) rows — independent of |df|.
    """
    import numpy as np
    import pandas as pd

    if count <= 0:
        return df.limit(0)
    bounds = df.agg(
        F.min(x).alias("x0"), F.max(x).alias("x1"),
        F.min(y).alias("y0"), F.max(y).alias("y1"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n_total = bounds["n"]
    if n_total == 0:
        return df.limit(0)
    if n_total <= count:
        return df
    x0, y0 = float(bounds["x0"]), float(bounds["y0"])
    sx = (float(bounds["x1"]) - x0) / grid or 1.0
    sy = (float(bounds["y1"]) - y0) / grid or 1.0
    g = int(grid)
    work = df.select(
        F.col(id_col).alias("pid"),
        F.col(x).alias("px").cast("double"),
        F.col(y).alias("py").cast("double"),
        F.least(
            F.lit(g - 1),
            F.floor((F.col(x) - x0) / sx).cast("int")
        ).alias("cx"),
        F.least(
            F.lit(g - 1),
            F.floor((F.col(y) - y0) / sy).cast("int")
        ).alias("cy"),
    )

    def _greedy(ids, xs, ys, m):
        """Vectorized numpy FPS: seed = smallest id, then argmax of
        running min-distance (ties by smallest id)."""
        order = np.argsort(ids, kind="stable")
        ids, xs, ys = ids[order], xs[order], ys[order]
        n = len(ids)
        m = min(m, n)
        sel = np.empty(m, dtype=np.int64)
        sel[0] = 0
        mind = (xs - xs[0]) ** 2 + (ys - ys[0]) ** 2
        mind[0] = -np.inf
        for i in range(1, m):
            # ids ascending => first argmax IS the smallest-id tie
            j = int(np.argmax(mind))
            sel[i] = j
            mind = np.minimum(
                mind, (xs - xs[j]) ** 2 + (ys - ys[j]) ** 2
            )
            mind[j] = -np.inf
        return ids[sel[:m]]

    quota_num = int(oversample) * int(count)

    def local_fps(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["pid"].to_numpy()
        xs = pdf["px"].to_numpy()
        ys = pdf["py"].to_numpy()
        m = int(np.ceil(quota_num * len(ids) / n_total)) + 1
        keep = _greedy(ids, xs, ys, m)
        mask = pd.Series(ids).isin(keep).to_numpy()
        return pdf.loc[mask, ["pid", "px", "py"]]

    cand = work.groupBy("cx", "cy").applyInPandas(
        local_fps,
        schema=(
            f"pid {df.schema[id_col].dataType.simpleString()},"
            " px double, py double"
        ),
    )
    cpdf = cand.toPandas()
    final = _greedy(
        cpdf["pid"].to_numpy(), cpdf["px"].to_numpy(),
        cpdf["py"].to_numpy(), int(count),
    )
    sel = df.sparkSession.createDataFrame(
        pd.DataFrame({id_col: final}),
        schema=T.StructType(
            [T.StructField(id_col, df.schema[id_col].dataType)]
        ),
    )
    return df.join(sel, on=id_col, how="left_semi")


def relaxation_dart_throwing(
    df: DataFrame,
    count: int,
    radius: float = 1.0,
    decay: float = 0.9,
    terminal_radius: float = 0.001,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    order: str | None = None,
) -> DataFrame:
    """filters.relaxationdartthrowing
    (RelaxationDartThrowing.cpp:62-160): Poisson-disk selection whose
    radius DECAYS until the kept set reaches `count` — kept points
    from earlier (larger-radius) rounds are never dropped (they ride
    into each re-run as `sample_poisson(pinned=...)` obstacles), so
    every pair in the result is separated by at least the final
    radius. When a round overshoots `count`, the newly added points
    are truncated by id order (the reference truncates in its
    shuffled greedy order mid-round; deterministic id order is the
    distributed analog). Returns the kept rows plus `rdt_radius`, the
    final radius (the reference logs it).

    Each round is one distributed Poisson pass; the driver holds only
    the loop counter and the kept-count scalar.
    """
    total = df.count()
    if total <= count:
        return df.withColumn("rdt_radius", F.lit(float(radius)))
    kept: DataFrame | None = None
    n_kept = 0
    r = float(radius)
    sq_term = float(terminal_radius) * float(terminal_radius)
    while r * r >= sq_term:
        sel = sample_poisson(
            df, r, x=x, y=y, id_col=id_col, order=order, pinned=kept
        )
        new_kept = sel.select(
            id_col, F.col(x).alias("__px"), F.col(y).alias("__py")
        )
        k = new_kept.count()
        if k >= count:
            prev = (
                kept.select(id_col) if kept is not None
                else df.limit(0).select(id_col)
            )
            newly = (
                new_kept.join(prev, on=id_col, how="left_anti")
                .orderBy(id_col)
                .limit(count - n_kept)
                .select(id_col)
            )
            final = prev.unionByName(newly)
            return df.join(final, on=id_col, how="left_semi") \
                .withColumn("rdt_radius", F.lit(r))
        kept = new_kept.select(
            id_col, F.col("__px").alias(x), F.col("__py").alias(y)
        ).localCheckpoint(eager=True)
        n_kept = k
        r *= float(decay)
    # terminal radius reached before count: ship what we have
    # (the reference warns and returns the partial set)
    out = kept if kept is not None else df.limit(0)
    return df.join(out.select(id_col), on=id_col, how="left_semi") \
        .withColumn("rdt_radius", F.lit(r / float(decay)))


def sample_poisson_exact(
    df: DataFrame,
    radius: float,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
    order: str | None = None,
    max_rounds: int = 200,
    pinned: DataFrame | None = None,
) -> DataFrame:
    """EXACT serial-greedy Poisson-disk thinning (SampleFilter.cpp
    view-order greedy), distributed as a dependency-depth fixpoint.

    `pinned` (id_col, x, y): pre-accepted obstacles, as in
    `sample_poisson` — they precede every candidate in the scan
    order, are never rejected, and their ids are part of the result
    (the relaxation-dart hook).

    The serial semantics — keep a point iff no already-kept earlier
    point lies within `radius` — depend only on EARLIER points, so
    they admit a parallel schedule: each round decides every still-
    undecided point whose earlier in-radius neighbors are all
    decided (kept neighbor => reject; all rejected/none => keep).
    After d rounds every point whose earlier-neighbor dependency
    chain has depth <= d is decided; the fixpoint equals the serial
    scan result point-for-point (induction on order rank), unlike
    `sample_poisson`'s 4-color variant which is invariant-equal only.

    Scale shape: the directed neighbor-pair list is built ONCE with
    the cell-grid join (cell = radius, 3x3 halo, d2 < r^2 — the same
    codegen'd arithmetic as the oracle) and checkpointed; each round
    is then two hash joins on ids + a map-side-combined groupBy over
    that static pair list. Round count = chain depth: O(log n)-ish
    for scattered points, degenerate (O(n)) only when the data is one
    dense radius-connected run in order — the documented reason the
    scale path stays `sample_poisson`."""
    r = float(radius)
    order = order or id_col

    def _grid(sdf, cols):
        return sdf.select(*cols).withColumn(
            "cx", F.floor(F.col("px") / r).cast("long")
        ).withColumn(
            "cy", F.floor(F.col("py") / r).cast("long")
        ).localCheckpoint(eager=True)

    src = df
    pin = None
    if pinned is not None:
        pin = _grid(pinned, [
            F.col(id_col).alias("pid"),
            F.col(x).alias("px").cast("double"),
            F.col(y).alias("py").cast("double"),
        ])
        src = df.join(
            pin.select(F.col("pid").alias(id_col)),
            on=id_col, how="left_anti",
        )
    pts = _grid(src, [
        F.col(id_col).alias("pid"),
        F.col(x).alias("px").cast("double"),
        F.col(y).alias("py").cast("double"),
        F.col(order).alias("ord"),
    ])

    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    lhs = pts.select(
        F.col("pid").alias("p_pid"), F.col("px").alias("p_x"),
        F.col("py").alias("p_y"), F.col("ord").alias("p_ord"),
        F.col("cx").alias("jx"), F.col("cy").alias("jy"),
    )
    rhs = pts.select(
        "pid", "px", "py", "ord", "cx", "cy", F.lit(0).alias("pin")
    )
    if pin is not None:
        # pinned obstacles precede every candidate in scan order
        rhs = rhs.unionByName(
            pin.select(
                "pid", "px", "py",
                F.lit(None).cast(
                    pts.schema["ord"].dataType
                ).alias("ord"),  # never compared: pin=1 short-circuits
                "cx", "cy", F.lit(1).alias("pin"),
            )
        )
    rhs = (
        rhs.withColumn("o", F.explode(offs))
        .select(
            F.col("pid").alias("q_pid"), F.col("px").alias("q_x"),
            F.col("py").alias("q_y"), F.col("ord").alias("q_ord"),
            F.col("pin").alias("q_pin"),
            (F.col("cx") + F.col("o.dx")).alias("jx"),
            (F.col("cy") + F.col("o.dy")).alias("jy"),
        )
    )
    d2 = (F.col("p_x") - F.col("q_x")) * (F.col("p_x") - F.col("q_x")) + (
        F.col("p_y") - F.col("q_y")
    ) * (F.col("p_y") - F.col("q_y"))
    pairs = (
        lhs.join(rhs, on=["jx", "jy"])
        .where(
            ((F.col("q_pin") == 1) | (F.col("q_ord") < F.col("p_ord")))
            & (d2 < F.lit(r * r))
        )
        .select("p_pid", "q_pid")
        .localCheckpoint(eager=True)
    )

    # status: K kept / R rejected / U undecided
    status = pts.select("pid", F.lit("U").alias("st"))
    if pin is not None:
        status = status.unionByName(
            pin.select("pid", F.lit("K").alias("st"))
        )
    for _ in range(max_rounds):
        agg = (
            pairs.join(
                status.select(
                    F.col("pid").alias("q_pid"), F.col("st").alias("q_st")
                ),
                on="q_pid",
            )
            .groupBy("p_pid")
            .agg(
                F.max((F.col("q_st") == "K").cast("int")).alias("any_k"),
                F.max((F.col("q_st") == "U").cast("int")).alias("any_u"),
            )
        )
        status = (
            status.join(
                agg, status["pid"] == agg["p_pid"], "left"
            )
            .select(
                "pid",
                F.when(F.col("st") != "U", F.col("st"))
                .when(F.coalesce(F.col("any_k"), F.lit(0)) == 1, F.lit("R"))
                .when(F.coalesce(F.col("any_u"), F.lit(0)) == 0, F.lit("K"))
                .otherwise(F.lit("U"))
                .alias("st"),
            )
            .localCheckpoint(eager=True)
        )
        if status.where(F.col("st") == "U").limit(1).count() == 0:
            break
    else:
        raise RuntimeError(
            f"sample_poisson_exact: no fixpoint in {max_rounds} rounds"
        )
    coords = pts.select("pid", "px", "py")
    if pin is not None:
        coords = coords.unionByName(pin.select("pid", "px", "py"))
    return (
        coords.join(
            status.where(F.col("st") == "K").select("pid"), on="pid"
        )
        .select(F.col("pid").alias(id_col),
                F.col("px").alias(x), F.col("py").alias(y))
    )


def relaxation_dart_exact(
    df: DataFrame,
    count: int,
    radius: float = 1.0,
    decay: float = 0.9,
    terminal_radius: float = 0.001,
    x: str = "lon",
    y: str = "lat",
    id_col: str = "pid",
) -> DataFrame:
    """EXACT relaxation dart throwing
    (RelaxationDartThrowing.cpp:62-160 with shuffle=false, i.e. id
    scan order): decaying-radius rounds of the SERIAL greedy, each
    round's keeps pinned into the next, truncated to `count`.

    Each round calls `sample_poisson_exact(pinned=...)`; because the
    serial greedy adds points in id order, "complete the round then
    truncate the newly added by id order" equals the reference's
    "stop scanning once count is reached" (later keeps never affect
    earlier decisions). Round count is bounded by the radius
    schedule (log(terminal/radius)/log(decay)), so the driver loop
    is O(log) regardless of data."""
    total = df.count()
    if total <= count:
        return df.withColumn("rdt_radius", F.lit(float(radius)))
    kept: DataFrame | None = None
    n_kept = 0
    r = float(radius)
    sq_term = float(terminal_radius) * float(terminal_radius)
    while r * r >= sq_term:
        sel = sample_poisson_exact(
            df, r, x=x, y=y, id_col=id_col, pinned=kept
        )
        new_kept = sel.select(
            id_col, F.col(x).alias("__px"), F.col(y).alias("__py")
        )
        k = new_kept.count()
        if k >= count:
            prev = (
                kept.select(id_col) if kept is not None
                else df.limit(0).select(id_col)
            )
            newly = (
                new_kept.join(prev, on=id_col, how="left_anti")
                .orderBy(id_col)
                .limit(count - n_kept)
                .select(id_col)
            )
            final = prev.unionByName(newly)
            return df.join(final, on=id_col, how="left_semi") \
                .withColumn("rdt_radius", F.lit(r))
        kept = new_kept.select(
            id_col, F.col("__px").alias(x), F.col("__py").alias(y)
        ).localCheckpoint(eager=True)
        n_kept = k
        r *= float(decay)
    out = kept if kept is not None else df.limit(0)
    return df.join(out.select(id_col), on=id_col, how="left_semi") \
        .withColumn("rdt_radius", F.lit(r / float(decay)))


def consistent_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: int = 0,
    buckets: int = 100_000,
) -> DataFrame:
    """Deterministic hash-Bernoulli sampling: keep a row iff its
    Lehmer-hashed id lands in the first `round(rate * buckets)` of
    `buckets` buckets. Unlike `df.sample` (partition-order-dependent
    RNG), membership is a pure function of the id — reproducible
    across runs, engines, cluster sizes and re-partitioning, and
    consistent across tables sharing the id (sampling two tables at
    the same rate keeps the SAME entities, the property importance-
    sampling / DSIR-style corpus mixing relies on). `salt` yields
    independent samples; disjoint salt draws compose into train/
    held-out splits with no bookkeeping.

    Scale: one codegen'd predicate on the scan — no shuffle, no RNG
    state, prunes before anything downstream.
    """
    from pdal_spark import sqlgen as G

    k = int(round(float(rate) * buckets))
    h = G.lehmer2_wide(f"(`{id_col}` + {int(salt)})")
    return df.where(F.expr(f"({h} % {int(buckets)}) < {k}"))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Weighted random sampling without replacement (Efraimidis &
    Spirakis 2006, the A-ES one-pass scheme): each row draws a
    deterministic uniform u from its hashed id and competes on key =
    -ln(u)/w — the k smallest keys are a weight-proportional sample.
    Deterministic: same ids + weights -> same sample, across runs,
    engines and partitionings (the distributed-sampling property
    df.sample lacks).

    key is quantized to the 2^-20 grid (integer column ``wkey_q``) so
    rank comparisons are integer-exact; ties break on id. Scale: one
    codegen'd key projection + a global bottom-k (TakeOrdered — per-
    partition heaps + a k-row driver merge, no full sort).
    """
    from pdal_spark import sqlgen as G

    h = G.mix_hash(f"(`{id_col}` + {int(salt)})")
    # u in (0, 1]: (h + 1) / 2^31-1 — h in [0, M31)
    u = f"((cast({h} as double) + {G.fnum(1.0)}) / {G.fnum(float(G.M31))})"
    key_q = (
        f"cast(floor((-ln({u}) / cast(`{weight_col}` as double))"
        f" * {G.fnum(float(1 << 20))} + {G.fnum(0.5)}) as bigint)"
    )
    return (
        df.withColumn("wkey_q", F.expr(key_q))
        .orderBy("wkey_q", id_col)
        .limit(int(k))
    )


def stratified_sample(
    df: DataFrame,
    k_per_group: int,
    group_col: str,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Exactly k rows per group, chosen by deterministic hash rank
    (the per-stratum fixed-quota sampler; df.sampleBy only gives
    per-stratum FRACTIONS and is RNG/partition-order dependent).

    Scale: one shuffle on the group key; WindowGroupLimit pushes the
    rank<=k filter below the per-group sort, so each task keeps a
    k-row heap per group instead of sorting whole strata.
    """
    from pyspark.sql import Window

    from pdal_spark import sqlgen as G

    h = F.expr(G.mix_hash(f"(`{id_col}` + {int(salt)})"))
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(k_per_group))
        .drop("__rk")
    )


def morton_sample(
    df: DataFrame,
    keep_num: int,
    keep_den: int,
    x: str = "lon",
    y: str = "lat",
    res: int = 26,
) -> DataFrame:
    """Spatially-stratified systematic sample: keep rows whose Morton
    key falls in keep_num/keep_den of the key space (key % den <
    num). Because the Z-order curve interleaves coordinate bits, the
    kept set is spread uniformly IN SPACE — the cartographic
    thinning / map-decimation property a uniform-random sample lacks
    (random leaves clumps and holes at any fixed zoom). The spatial
    twin of consistent_sample's hash-Bernoulli rule: deterministic,
    entity-consistent (a point is in or out at EVERY sample rate
    nest: rate r1 < r2 implies kept(r1) subset kept(r2)).

    ZERO shuffle: one codegen'd predicate on the interleave
    arithmetic — the sample rides the scan like any pushed filter.
    """
    from pdal_spark import sqlgen as G

    key = G.morton_from_lonlat(f"`{y}`", f"`{x}`", res, G.SPARK)
    return df.where(
        F.expr(f"({key}) % {int(keep_den)} < {int(keep_num)}")
    )


def systematic_resample(
    df: DataFrame,
    id_col: str,
    weight: str,
    n_out: int,
) -> DataFrame:
    """Deterministic systematic (low-variance) resampling with
    replacement — the particle-filter / data-mixing resampler
    (Douc & Cappé 2005): lay a grid of `n_out` equally spaced
    positions u0 + j*W/n over the cumulative INTEGER weight axis
    (u0 = W div 2n, the deterministic mid-offset) and give row i
    one copy per grid point inside its weight interval:

        copies_i = ceil((hi_i - u0)*n/W) - ceil((lo_i - u0)*n/W)

    with lo/hi the exclusive/inclusive prefix sums SHIFTED by +W so
    every ceil argument is non-negative (Spark div truncates toward
    zero vs DuckDB's floor — they agree only there; the grid is
    W/n-periodic so the +W shift is exact). Copies sum to n_out
    exactly; every row with w_i >= W/n is guaranteed >= 1 copy.
    Output: (id, weight, copies) for rows with copies > 0.

    Scale: ONE distributed prefix-sum pass
    (functions.rank.scalable_prefix_sums — no one-partition
    window), then row-local integer arithmetic.
    """
    from pdal_spark.functions.rank import scalable_prefix_sums

    n = int(n_out)
    t = scalable_prefix_sums(
        df.select(id_col, weight),
        [id_col],
        {"__cum": F.col(weight).cast("long")},
        dec="decimal(38,0)",
    )
    t = t.withColumn("__hi", F.col("__cum").cast("long")) \
         .withColumn("__lo",
                     F.col("__hi") - F.col(weight).cast("long"))
    total = t.agg(F.max("__hi").alias("w")).collect()[0]["w"]
    u0 = total // (2 * n)

    def ceil_grid(a: str) -> str:
        # ceil(a*n/W) over non-negative a, truncation-safe
        return f"(({a}) * {n}L + {total}L - 1L) div {total}L"

    return (
        t.withColumn(
            "copies",
            F.expr(
                ceil_grid(f"__hi + {total}L - {u0}L")
                + " - " + ceil_grid(f"__lo + {total}L - {u0}L")
            ).cast("long"),
        )
        .where(F.col("copies") > 0)
        .select(id_col, weight, "copies")
    )


def negative_sample(
    anchors: DataFrame,
    pool: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    label: str = "label",
) -> DataFrame:
    """Consistent negative sampling for contrastive training: each
    anchor draws the k pool items of a DIFFERENT label that minimize
    a seeded Lehmer hash of the (anchor, candidate) id pair — a
    deterministic pseudo-random draw (same convention as
    consistent_sample: pure function of the ids, reproducible under
    any partitioning/retry, no RNG state to checkpoint).

    Output: (anchor_id, neg_id, neg_rank 1-based).

    Scale: the pool is BROADCAST — contrastive negative pools are
    downsampled in practice (10^4-10^6 rows), so the label-mismatch
    theta join is a nested-loop over a broadcast table (anchors
    never shuffle) and the per-anchor top-k collapses in
    WindowGroupLimit before any exchange. A corpus-sized pool
    should be pre-sampled with consistent_sample first.
    """
    from pdal_spark.sqlgen import M31

    a = anchors.select(
        F.col(id_col).alias("anchor_id"), F.col(label).alias("__al")
    )
    p = pool.select(
        F.col(id_col).alias("neg_id"), F.col(label).alias("__pl")
    )
    j = a.join(F.broadcast(p), F.col("__al") != F.col("__pl"))
    h = (
        (F.col("anchor_id") * 1000003 + F.col("neg_id") + 12345)
        * 48271
    ) % M31
    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy(
        F.col("__h").asc(), F.col("neg_id").asc()
    )
    return (
        j.select("anchor_id", "neg_id", h.alias("__h"))
        .withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= int(k))
        .select("anchor_id", "neg_id", "neg_rank")
    )


def greedy_set_cover(
    pairs: DataFrame,
    k: int = 5,
    set_col: str = "sid",
    elem_col: str = "elem",
) -> DataFrame:
    """Greedy maximum-coverage selection (the classic (1 - 1/e)
    approximation; facility-location data selection — pick the k
    documents/sources that together cover the most distinct
    elements: topics, n-grams, queries): each round picks the set
    with the most NOT-YET-COVERED elements (ties to the smaller
    id), stopping early when no set adds anything. Counts are exact
    integers, so the pick sequence is engine-invariant (the
    mmr_rerank serial-greedy discipline). Output: (sid, sel_rank,
    gain).

    Scale: each round is one anti-join against the covered-element
    set + one hash agg + a 1-row argmax; covered grows by at most
    the picked set. k is small by construction. For corpus-scale
    runs swap the exact anti-join for a bloom_dedup-style filter
    (documented tradeoff).
    """
    base = pairs.select(
        F.col(set_col).alias("s"), F.col(elem_col).alias("e")
    ).distinct().localCheckpoint(eager=True)
    spark = pairs.sparkSession
    covered = None
    out_rows: list[tuple] = []
    cur = base
    for rank in range(1, int(k) + 1):
        gains = (
            cur.groupBy("s")
            .agg(F.count(F.lit(1)).cast("long").alias("gain"))
            .orderBy(F.col("gain").desc(), F.col("s").asc())
            .limit(1)
            .collect()
        )
        if not gains or gains[0]["gain"] < 1:
            break
        pick = gains[0]
        out_rows.append((int(pick["s"]), rank, int(pick["gain"])))
        new_cov = base.where(F.col("s") == int(pick["s"])) \
            .select("e")
        covered = new_cov if covered is None else \
            covered.unionByName(new_cov).distinct()
        cur = base.join(covered, on="e", how="left_anti") \
            .localCheckpoint(eager=True)
    return spark.createDataFrame(
        out_rows, "sid long, sel_rank long, gain long"
    )
