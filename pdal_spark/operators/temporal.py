"""Temporal joins — the as-of join Spark lacks as a built-in.

The reference's nearest-point matching is spatial (kernels/
DeltaKernel.cpp 1-NN between two clouds); this is the event-time
1-NN: match each left row to the LATEST right row of the same key at
or before its timestamp (backward as-of; the attribution/"state at
time t" join of event pipelines).

Physical strategy — the union trick, NOT a range join: tag both
sides, union, ONE window over (key, time) computes the running
latest right timestamp, then a narrow equi-join back to the
(deduplicated) right side. Cost = one shuffle on the key (the same
shuffle any per-key op pays) + a running max — no per-row range
probe, no interval explosion, no broadcast of either side; skewed
keys split fine because the final match is a plain hash equi-join
(AQE skew-join eligible).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts: str = "ts",
    right_ts: str | None = None,
    tolerance_us: int | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join with merge_asof's three directions: every left row,
    plus the columns of the matched right row with the same key —
    direction="backward" (default): the LATEST right at or before
    left.ts; "forward": the EARLIEST right at or after; "nearest":
    whichever of the two is closer in time, ties to the backward
    match (pandas semantics). NULL-filled when none. Right rows
    sharing (key, ts) are collapsed first, keeping the max of each
    payload column — the documented deterministic tie rule.

    tolerance_us: optional maximum |lag| (microseconds); farther
    matches become NULL (merge_asof ``tolerance``).

    Physical strategy (all directions): the union trick — ONE window
    per direction over (key, time) computes the running latest/
    earliest right timestamp (backward: running max ascending;
    forward: running min DESCENDING — same sort, opposite prefix),
    then a narrow equi-join back. nearest pays both windows over the
    same shuffled partitioning, still no range explosion.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or ts
    extra = [c for c in right.columns if c not in keys + [rts]]
    l_payload = [c for c in left.columns if c not in keys]

    # window/join directly on the timestamp values (works for both
    # TIMESTAMP and TIMESTAMP_NTZ parquet columns — no epoch cast)
    rded = (
        right.groupBy(*keys, F.col(rts).alias("__rts"))
        .agg(*[F.max(c).alias(c) for c in extra])
        .withColumn("__rtus", F.col("__rts"))
    )

    lt = left.withColumn("__tus", F.col(ts))
    l_types = dict(lt.dtypes)
    ts_type = l_types["__tus"]
    l_tag = lt.select(
        *keys,
        "__tus",
        F.lit(1).alias("__side"),
        F.lit(None).cast(ts_type).alias("__rtus"),
        *[F.col(c) for c in l_payload],
    )
    r_tag = rded.select(
        *keys,
        F.col("__rtus").alias("__tus"),
        F.lit(0).alias("__side"),
        "__rtus",
        *[F.lit(None).cast(l_types[c]).alias(c) for c in l_payload],
    )

    wb = (
        Window.partitionBy(*keys)
        .orderBy("__tus", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward prefix: later-or-equal rows, rights before lefts at a
    # tied timestamp (side 0 first when descending too)
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__tus").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l_tag.unionByName(r_tag)
    if direction == "backward":
        u = u.withColumn("__mts", F.max("__rtus").over(wb))
    elif direction == "forward":
        u = u.withColumn("__mts", F.min("__rtus").over(wf))
    else:  # nearest
        u = (
            u.withColumn("__mb", F.max("__rtus").over(wb))
            .withColumn("__mf", F.min("__rtus").over(wf))
        )
        db = F.unix_micros(
            F.col("__tus").cast("timestamp")
        ) - F.unix_micros(F.col("__mb").cast("timestamp"))
        df_ = F.unix_micros(
            F.col("__mf").cast("timestamp")
        ) - F.unix_micros(F.col("__tus").cast("timestamp"))
        u = u.withColumn(
            "__mts",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(df_ < db, F.col("__mf"))  # ties -> backward
            .otherwise(F.col("__mb")),
        ).drop("__mb", "__mf")
    matched = u.where(F.col("__side") == 1)
    if tolerance_us is not None:
        lag = F.unix_micros(
            F.col("__tus").cast("timestamp")
        ) - F.unix_micros(F.col("__mts").cast("timestamp"))
        alag = F.abs(lag)
        matched = matched.withColumn(
            "__mts",
            F.when(alag <= F.lit(tolerance_us), F.col("__mts")),
        )

    r_side = rded.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        F.col("__rtus").alias("__r_tus"),
        F.col("__rts").alias(f"{ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in extra],
    )
    cond = [matched[k] == r_side[f"__rk_{k}"] for k in keys] + [
        matched["__mts"] == r_side["__r_tus"]
    ]
    out = matched.join(r_side, on=cond, how="left")
    return out.select(
        *keys,
        *l_payload,
        f"{ts}{suffix}",
        *[f"{c}{suffix}" for c in extra],
    )


def sliding_window_counts(
    df: DataFrame,
    size_s: int,
    step_s: int,
    ts: str = "ts",
    group_col: str | None = "event_type",
) -> DataFrame:
    """Batch sliding-window aggregation (the F.window(ts, size, step)
    semantics, in the engine's oracle-exact integer form): every
    event lands in exactly size/step overlapping windows; output one
    (window_start_s, [group], n) row per non-empty window. step must
    divide size (the same constraint Spark's window() slide has in
    its efficient path).

    Derivation: q = floor(epoch/step); the j-th containing window is
    ws = (q - j)*step for j in 0..size/step-1, and EVERY j qualifies
    (ts < (q+1)*step <= (q-j)*step + size  <=>  (j+1)*step <= size).
    Pure integer arithmetic, one row-local explode of size/step
    copies, ONE map-side-combined groupBy — the exact plan F.window
    generates, minus its struct column (a bigint key partitions and
    prunes better as an Iceberg layout column).
    """
    size_s, step_s = int(size_s), int(step_s)
    if size_s % step_s:
        raise ValueError("step must divide size")
    k = size_s // step_s
    q = F.expr(f"(unix_timestamp(`{ts}`) div {step_s})")
    exploded = df.withColumn(
        "__ws",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda j: (q - j) * step_s,
            )
        ),
    )
    keys = ["__ws"] + ([group_col] if group_col else [])
    return (
        exploded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumnRenamed("__ws", "window_start_s")
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of per-key event streams:
    (from_state, to_state, n, p) over consecutive-event pairs ordered
    by (ts, id) within each key — the behavioural-sequence statistic
    (funnel analysis, bot detection, next-event models). p is the
    row-normalized IEEE-exact ratio n / n_from.

    Scale: one shuffle on the key for the per-key lead() window
    (bounded by per-key stream length), then ONE map-side-combined
    groupBy on the (from, to) pair; normalization joins the tiny
    per-from totals back broadcast.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    pairs = (
        df.select(
            F.col(key_col),
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
    )
    cnt = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cnt.groupBy("from_state").agg(F.sum("n").alias("__nf"))
    return (
        cnt.join(F.broadcast(tot), on="from_state")
        .withColumn(
            "p", F.expr("cast(n as double) / cast(__nf as double)")
        )
        .drop("__nf")
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis: for each key, the earliest timestamp
    at which each step completes, where step i counts only STRICTLY
    AFTER step i-1's completion (the product-analytics "did A then B
    then C" query). Output: one row per key with t_0..t_{k-1}
    (NULL = funnel stalled there) and depth = steps completed.

    Scale: k conditional min-aggregations, each a map-side-combined
    groupBy; step i filters on ts > t_{i-1} via a key-to-key join of
    the previous column back onto the events. k is tiny and fixed;
    events shuffle once per step on the key — at web scale pre-bucket
    the events table by key (plans.bucketing) and every step's
    groupBy and join is exchange-free.
    """
    ev = df.select(
        F.col(key_col).alias("k"), F.col(state_col).alias("s"),
        F.col(ts).alias("t"),
    )
    acc = None
    for i, step in enumerate(steps):
        cand = ev.where(F.col("s") == step)
        if acc is not None:
            cand = cand.join(
                acc.select("k", F.col(f"t_{i - 1}").alias("__prev")),
                on="k",
            ).where(F.col("t") > F.col("__prev"))
        cur = cand.groupBy("k").agg(F.min("t").alias(f"t_{i}"))
        acc = (
            cur if acc is None
            else acc.join(cur, on="k", how="left")
        )
    depth = None
    for i in range(len(steps)):
        d = F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
        depth = d if depth is None else depth + d
    return acc.withColumn("depth", depth).withColumnRenamed("k", key_col)


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts: str = "ts",
    bucket_s: int = 86400 * 7,
) -> DataFrame:
    """Cohort retention matrix: cohort = the key's first-activity
    bucket (floored epoch / bucket_s); for every later bucket the
    number of cohort keys active in it. Output (cohort_b, age, n_act)
    with age = activity bucket - cohort bucket in buckets; age 0 row
    = cohort size.

    Scale: first-activity is one map-side-combined groupBy(key);
    activity buckets dedupe per (key, bucket); the cohort join is
    key-to-key (broadcastable while cohorts fit, hash join beyond).
    Integer bucket arithmetic end to end.
    """
    b = int(bucket_s)
    ev = df.select(
        F.col(key_col).alias("k"),
        F.expr(f"(unix_timestamp(`{ts}`) div {b})").alias("__b"),
    )
    first = ev.groupBy("k").agg(F.min("__b").alias("cohort_b"))
    act = ev.distinct()
    return (
        act.join(first, on="k")
        .select("k", "cohort_b", (F.col("__b") - F.col("cohort_b"))
                .alias("age"))
        .groupBy("cohort_b", "age")
        .agg(F.count(F.lit(1)).alias("n_act"))
    )


def sessionize(
    df: DataFrame,
    gap_s: int = 1800,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch gap-based sessionization: a new session starts when the
    gap to the key's previous event exceeds gap_s. session_n is the
    per-key running count of session starts (1-based); session_id is
    the (key, session_n) pair the downstream groupBy keys on. The
    batch twin of streaming.sessions.sessionize_stream (same gap
    rule), for backfills over the historical corpus.

    Scale: one shuffle on the key; both the lag and the running sum
    ride the SAME per-key window sort (one exchange, one sort —
    check .explain: a single Window node chain).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    gap = F.unix_timestamp(F.col(ts)) - F.unix_timestamp(
        F.lag(ts).over(w)
    )
    is_start = F.when(
        gap.isNull() | (gap > int(gap_s)), 1
    ).otherwise(0)
    return df.withColumn(
        "session_n",
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    gap_s: int = 1800,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session rollup over sessionize(): event count and duration
    (seconds, last - first event). One additional map-side-combined
    groupBy on (key, session_n)."""
    s = sessionize(df, gap_s, key_col, ts, id_col)
    return s.groupBy(key_col, "session_n").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.unix_timestamp(F.col(ts)))
         - F.min(F.unix_timestamp(F.col(ts)))).alias("duration_s"),
    )

def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start_us: str = "start_us",
    end_us: str = "end_us",
    cell_s: int = 3600,
) -> DataFrame:
    """1-D range join: every (event, interval) pair with
    start_us <= event.ts < end_us (half-open, microsecond domain) —
    the temporal twin of the spatial point-in-polygon join
    (filters.crop semantics over time instead of space; what SQL
    writes as a non-equi `ON e.ts >= i.start AND e.ts < i.end`).

    Physical strategy — time-cell bucketing, NOT a theta join: Spark
    executes a raw range predicate as BroadcastNestedLoopJoin (or a
    cartesian), which is O(|events| x |intervals|) and dies at scale.
    Instead both sides are keyed by time cells of width `cell_s`:
    an interval explodes into the cells it covers (fan-out bounded by
    interval_length/cell_s + 1, row-local sequence), an event maps to
    exactly ONE cell, and the match becomes a plain hash equi-join on
    the cell followed by the exact containment predicate. Because the
    event's cell is unique, a qualifying pair meets in exactly one
    cell — no post-join dedup. Hot cells (flash-crowd hours) are
    ordinary skewed hash-join keys: AQE skew split applies; `cell_s`
    is the granularity dial (pick ~ median interval length).

    Inputs: `intervals` carries bigint microsecond bounds (callers
    derive them; keeps the kernel integer-exact). Output: all event
    columns + all interval columns, inner-joined.
    """
    cell_us = int(cell_s) * 1_000_000
    ev = events.withColumn(
        "__tus", F.expr(f"unix_micros(cast(`{ts}` as timestamp))")
    )
    ev = ev.withColumn("__cell", F.expr(f"__tus div {cell_us}"))
    iv = intervals.where(F.col(end_us) > F.col(start_us)).withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.expr(f"`{start_us}` div {cell_us}"),
                F.expr(f"(`{end_us}` - 1) div {cell_us}"),
            )
        ),
    )
    return (
        ev.join(iv, on="__cell")
        .where(
            (F.col("__tus") >= F.col(start_us))
            & (F.col("__tus") < F.col(end_us))
        )
        .drop("__cell", "__tus")
    )


def time_rollup(
    df: DataFrame,
    widths_s: list[int] | None = None,
    ts: str = "ts",
    value: str = "value",
    group_col: str | None = None,
    q_bits: int = 20,
) -> DataFrame:
    """Hypertable-style continuous-aggregate pyramid: per-bucket
    (count, quantized value sum) at EVERY resolution in `widths_s`
    (seconds, each must divide the next — minute/hour/day ladder).
    Output: (width_s, bucket_start_s, [group], n, value_q_sum) —
    value_q_sum is sum(round(value * 2^q_bits)) as int64, exact and
    partitioning-invariant (mergeable across shards / micro-batches,
    the TimescaleDB continuous-aggregate contract).

    Physical strategy: raw rows aggregate ONCE at the finest width
    (one map-side-combined groupBy — the only shuffle proportional to
    the data); then every finest bucket explodes over the width
    ladder (row-local, n_levels copies of COUNTER rows, not data
    rows) and ONE second groupBy on (width, parent bucket) folds all
    coarser levels — the cells->parent fold of `slippy_pyramid` in
    the time domain. One scan, one raw-sized shuffle, one
    bucket-sized shuffle; a per-level union would instead rescan the
    raw table once per level (no exchange reuse across union
    branches under AQE — measured, plan-pinned in tests).
    """
    widths = [int(w) for w in (widths_s or [60, 3600, 86400])]
    for a, b in zip(widths, widths[1:]):
        if b % a:
            raise ValueError("each width must divide the next")
    keys = [group_col] if group_col else []
    scale = 1 << q_bits
    finest = (
        df.withColumn(
            "__bucket",
            F.expr(
                f"(unix_micros(cast(`{ts}` as timestamp))"
                f" div {widths[0] * 1_000_000})"
                f" * {widths[0]}"
            ),
        )
        .groupBy("__bucket", *keys)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(
                F.expr(
                    f"cast(round(`{value}` * {scale}.0) as bigint)"
                )
            ).alias("__q"),
        )
    )
    ladder = finest.withColumn(
        "width_s",
        F.explode(
            F.array(*[F.lit(w).cast("int") for w in widths])
        ),
    )
    return (
        ladder.groupBy(
            "width_s",
            F.expr("(__bucket div width_s) * width_s").alias(
                "bucket_start_s"
            ),
            *keys,
        )
        .agg(
            F.sum("__n").alias("n"),
            F.sum("__q").alias("value_q_sum"),
        )
        .select(
            "width_s", "bucket_start_s", *keys, "n", "value_q_sum"
        )
    )


DECAY_W_BITS = 30  # base weight 2^30: 30 halflives of headroom


def decayed_counts(
    df: DataFrame,
    key: str,
    ref_ts: str,
    halflife_s: int,
    ts: str = "ts",
    value: str | None = None,
    w_bits: int = DECAY_W_BITS,
) -> DataFrame:
    """Per-key exponentially time-decayed counters (the freshness-
    weighted frequency behind trending/hotness ranking): each event
    contributes 2^w_bits halved once per full halflife of age —
    weight = (1 << w_bits) >> (age_s div halflife_s) — so the decay
    is INTEGER-EXACT (shift, not pow): reproducible under any plan
    and mergeable across shards/micro-batches (it is a plain sum).
    Stepped rather than smooth decay: within one halflife weights
    are equal — the rank-stable tradeoff for exactness. With
    `value`, weights multiply the (integer) value column. Events
    after ref_ts (age < 0) clamp to full weight; ages beyond 62
    halflives floor to 0. Output: (key, n_events, decayed_q).

    Scale: one row-local weight expression + one map-side-combined
    groupBy — the same profile as a plain count, no window, no join.
    """
    hl_us = int(halflife_s) * 1_000_000
    age = (
        f"(unix_micros(cast(`{ref_ts}` as timestamp))"
        f" - unix_micros(cast(`{ts}` as timestamp)))"
    )
    steps = f"cast(greatest(0, least({age} div {hl_us}, 62)) as int)"
    w = F.expr(
        f"shiftright(cast({1 << int(w_bits)} as bigint), {steps})"
    )
    if value is not None:
        w = w * F.col(value).cast("long")
    return (
        df.select(F.col(key), w.alias("__w"))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__w").alias("decayed_q"),
        )
    )


def trajectory_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    quant_mm: int = 1000,
    straight_q: int = 1 << 20,
) -> DataFrame:
    """Per-entity trajectory rollup over time-ordered geocoded points
    (the filters.georeference/straighten family's statistic, recast
    for web-session movement traces): leg = haversine distance between
    consecutive points of a key (ordered by ts, id-tiebroken), each
    leg quantized to integer millimeters BEFORE summing so the path
    total is int64-exact under any partitioning (the haversine itself
    is trig — INEXACT — hence per-leg quantization, the same pattern
    as colorinterp/unigram_logprob). Output per key:

      n_points, path_mm (sum of quantized legs), net_mm (first->last
      point distance, quantized), straightness_q = net*Q // path
      (1.0 = beeline; 0 for a closed loop; NULL when path = 0).

    Scale: ONE shuffle on the key; the lag and the first/last
    selection ride the same per-key window sort. int64-safe: earth
    circumference in mm ~ 4e10; 2^63/4e10 ~ 2.3e8 legs/key before
    overflow — cap or re-quantize beyond that.
    """
    from pdal_spark import sqlgen as G

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    legged = (
        df.withColumn("__plat", F.lag(lat).over(w))
        .withColumn("__plon", F.lag(lon).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__rnd",
            F.row_number().over(
                Window.partitionBy(key_col).orderBy(
                    F.col(ts).desc(), F.col(id_col).desc()
                )
            ),
        )
        .withColumn(
            "__leg_mm",
            F.expr(
                "cast(floor("
                + G.haversine_m("`__plat`", "`__plon`", f"`{lat}`", f"`{lon}`")
                + f" * {G.fnum(float(quant_mm))} + {G.fnum(0.5)}) as bigint)"
            ),
        )
    )
    agg = legged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.coalesce(F.sum("__leg_mm"), F.lit(0)).alias("path_mm"),
        F.max(F.when(F.col("__rn") == 1, F.col(lat))).alias("__flat"),
        F.max(F.when(F.col("__rn") == 1, F.col(lon))).alias("__flon"),
        F.max(F.when(F.col("__rnd") == 1, F.col(lat))).alias("__llat"),
        F.max(F.when(F.col("__rnd") == 1, F.col(lon))).alias("__llon"),
    )
    net = (
        "cast(floor("
        + G.haversine_m("`__flat`", "`__flon`", "`__llat`", "`__llon`")
        + f" * {G.fnum(float(quant_mm))} + {G.fnum(0.5)}) as bigint)"
    )
    return agg.select(
        key_col,
        "n_points",
        "path_mm",
        F.expr(net).alias("net_mm"),
        F.expr(
            f"CASE WHEN path_mm > 0 THEN ({net} * {int(straight_q)})"
            " div path_mm END"
        ).alias("straightness_q"),
    )


CUSUM_Q = 1 << 20


def cusum_changepoint(
    df: DataFrame,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    quant: int = CUSUM_Q,
) -> DataFrame:
    """Single change-point detection per key — the CUSUM statistic
    (Page 1954) in pure-integer form: order the key's series by
    (ts, id), quantize values to the 2^-20 grid, and score every
    split position k by |n * S_k - k * S_n| (the cumulative-sum
    deviation scaled by n, so no division ever happens); the change
    point is the argmax (ties to the EARLIEST k). The level-shift
    detector behind traffic-anomaly / crawl-behavior-change triage
    next to event_transitions.

    All int64: S <= n * max|v_q|; n * S must stay < 2^63 — at
    quant=2^20 and |v| <= 512 that is ~2.9e8 rows per key, far past
    any per-entity series. Output per key: n, split_k (1..n-1; the
    change starts at ordinal split_k + 1), split ts, score.

    Scale: ONE shuffle on the key; prefix sums, totals and the
    argmax all ride per-key window sorts; the 1-row-per-key argmax
    is a WindowGroupLimit heap, not a global sort.
    """
    from pdal_spark import sqlgen as G

    vq = (
        f"cast(floor(cast(`{value}` as double) * {G.fnum(float(quant))}"
        f" + {G.fnum(0.5)}) as bigint)"
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    wall = Window.partitionBy(key_col)
    scored = (
        df.withColumn("__vq", F.expr(vq))
        .withColumn("__k", F.row_number().over(w))
        .withColumn("__sk", F.sum("__vq").over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wall))
        .withColumn("__sn", F.sum("__vq").over(wall))
        .where(F.col("__k") < F.col("__n"))
        .withColumn(
            "score", F.expr("abs(__n * __sk - __k * __sn)")
        )
    )
    pick = Window.partitionBy(key_col).orderBy(
        F.col("score").desc(), F.col("__k").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(pick))
        .where(F.col("__rn") == 1)
        .select(
            key_col,
            F.col("__n").alias("n"),
            F.col("__k").alias("split_k"),
            F.col(ts).alias("split_ts"),
            "score",
        )
    )


def trajectory_resample(
    df: DataFrame,
    step: float,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    max_points_per_leg: int = 64,
) -> DataFrame:
    """Resample each entity's time-ordered trajectory at a fixed
    planar step: every leg (consecutive point pair) emits interior
    points every `step` degrees of straight-line length plus its own
    start vertex; the key's final vertex closes the polyline. The
    densification step before rasterizing tracks / per-cell dwell
    counts (a polyline scored by cells needs samples, not vertices).

    Linear interpolation is +,-,*,/ on doubles — IEEE-exact, so the
    sampled coordinates hash-match cross-engine. Per-leg fan-out is
    floor(len/step) capped at max_points_per_leg (a teleporting
    outlier leg would otherwise explode; capped legs keep their
    ENDPOINTS so the polyline never breaks).

    Scale: ONE key shuffle for the lead() window, then a row-local
    bounded explode — the same shape as grid_disk/uncompact.
    """
    from pdal_spark import sqlgen as G

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    legs = (
        df.select(
            F.col(key_col),
            F.col(lat).alias("__y0"), F.col(lon).alias("__x0"),
            F.lead(lat).over(w).alias("__y1"),
            F.lead(lon).over(w).alias("__x1"),
            F.row_number().over(w).alias("__seq"),
        )
    )
    st = G.fnum(float(step))
    ln = (
        "sqrt((__x1 - __x0) * (__x1 - __x0)"
        " + (__y1 - __y0) * (__y1 - __y0))"
    )
    n_mid = (
        f"CASE WHEN __y1 IS NULL THEN 0 ELSE"
        f" least(cast({int(max_points_per_leg)} as int),"
        f" cast(floor({ln} / {st}) as int)) END"
    )
    sampled = (
        legs.withColumn("__n", F.expr(n_mid))
        .withColumn("__i", F.explode(F.expr("sequence(0, __n)")))
        .where("__y1 IS NOT NULL OR __i = 0")
        .select(
            key_col,
            "__seq",
            F.col("__i").alias("sub"),
            F.expr(
                f"CASE WHEN __i = 0 THEN __x0 ELSE"
                f" __x0 + (__x1 - __x0) * ((cast(__i as double) * {st})"
                f" / {ln}) END"
            ).alias("sx"),
            F.expr(
                f"CASE WHEN __i = 0 THEN __y0 ELSE"
                f" __y0 + (__y1 - __y0) * ((cast(__i as double) * {st})"
                f" / {ln}) END"
            ).alias("sy"),
        )
    )
    return sampled.withColumnRenamed("__seq", "seq")


def burstiness(
    df: DataFrame,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-entity burstiness of inter-event times (Goh & Barabasi
    2008): B = (sigma - mu) / (sigma + mu) over the key's gap
    distribution — B -> -1 periodic (metronome bots), ~0 Poisson
    (organic), -> +1 bursty (humans, incident traffic). The
    bot-vs-human timing signature next to event_transitions.

    Gaps are integer SECONDS (exact in both engines); mu and sigma
    derive from exact int64 moment sums (population variance, the
    closed form n*ss - s*s over n^2), so the only float steps are one
    sqrt and one division chain — IEEE, hash-exact. int64 bound:
    sum of gap^2 <= n * (max gap)^2 — fine through year-long spans at
    millions of events per key. Keys with < 2 gaps yield NULL b.

    Scale: ONE key shuffle for the lag window; the moment fold is
    map-side-combined.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    gaps = (
        df.withColumn(
            "__g",
            F.unix_timestamp(F.col(ts).cast("timestamp"))
            - F.unix_timestamp(F.lag(ts).over(w).cast("timestamp")),
        )
        .where(F.col("__g").isNotNull())
    )
    mom = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("__g").alias("s"),
        F.sum(F.expr("__g * __g")).alias("ss"),
    )
    mu = "(cast(s as double) / cast(n_gaps as double))"
    var = (
        "(cast(n_gaps as double) * cast(ss as double)"
        " - cast(s as double) * cast(s as double))"
        " / (cast(n_gaps as double) * cast(n_gaps as double))"
    )
    sd = f"sqrt({var})"
    return mom.select(
        key_col, "n_gaps", "s", "ss",
        F.expr(
            f"CASE WHEN n_gaps >= 2 AND {sd} + {mu} > 0.0e0 THEN"
            f" ({sd} - {mu}) / ({sd} + {mu}) END"
        ).alias("b"),
    )


def trajectory_bearings(
    df: DataFrame,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Initial great-circle bearing of every trajectory leg (the
    navigation complement of trajectory_stats' distances): theta =
    atan2(sin dl cos phi2, cos phi1 sin phi2 - sin phi1 cos phi2
    cos dl), normalized to [0, 360). Heading-change statistics feed
    the same bot/vehicle-vs-pedestrian classifiers as burstiness.

    Trig-derived -> INEXACT: output rounds to 6 decimals on both
    sides (the haversine-gate convention). One key shuffle (lead
    window); everything else row-local codegen.
    """
    from pdal_spark import sqlgen as G

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    legs = (
        df.select(
            F.col(key_col),
            F.col(id_col),
            F.col(lat).alias("y0"), F.col(lon).alias("x0"),
            F.lead(lat).over(w).alias("y1"),
            F.lead(lon).over(w).alias("x1"),
        )
        .where(F.col("y1").isNotNull())
    )
    rad = G.fnum(G.RAD)
    deg = G.fnum(G.DEG)
    dl = f"((x1 - x0) * {rad})"
    p1, p2 = f"(y0 * {rad})", f"(y1 * {rad})"
    theta = (
        f"atan2(sin({dl}) * cos({p2}),"
        f" cos({p1}) * sin({p2})"
        f" - sin({p1}) * cos({p2}) * cos({dl}))"
    )
    bearing = (
        f"round(((({theta}) * {deg}) + {G.fnum(360.0)})"
        f" % {G.fnum(360.0)}, 6)"
    )
    return legs.select(
        key_col, id_col, F.expr(bearing).alias("bearing")
    )


HAAR_Q = 1 << 20


def haar_downsample(
    df: DataFrame,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
) -> DataFrame:
    """One Haar wavelet level over each key's time-ordered series:
    consecutive pairs (by rank) fold to approx = (a+b)/2 and detail =
    (a-b)/2 in 2^-21 fixed point — the series-compression /
    multi-resolution primitive (keep approx for trend queries,
    threshold details for anomaly spikes; chain the op for deeper
    levels). Odd tails emit approx = the value, detail = 0.

    All integer: values quantize once to the 2^-20 grid; pair sums
    are exact; approx_q/detail_q carry the extra factor 2 instead of
    dividing (so nothing truncates) — hash-exact.

    Scale: ONE key shuffle; the pairing rides the same window sort
    ((rank-1) div 2 is the pair id), then a map-side-combined
    groupBy.
    """
    from pdal_spark import sqlgen as G

    vq = (
        f"cast(floor(cast(`{value}` as double)"
        f" * {G.fnum(float(HAAR_Q))} + {G.fnum(0.5)}) as bigint)"
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    ranked = df.select(
        F.col(key_col),
        F.expr(vq).alias("__vq"),
        ((F.row_number().over(w) - 1)).alias("__r"),
    ).withColumn("__pair", F.expr("__r div 2"))
    return (
        ranked.groupBy(key_col, "__pair")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__vq").alias("__s"),
            F.max(F.when(F.col("__r") % 2 == 0, F.col("__vq")))
            .alias("__a"),
            F.max(F.when(F.col("__r") % 2 == 1, F.col("__vq")))
            .alias("__b"),
        )
        .select(
            key_col,
            F.col("__pair").alias("pair"),
            "n",
            # x2 fixed point: approx2 = a+b (or 2a for odd tails)
            F.expr(
                "CASE WHEN n = 2 THEN __s ELSE 2 * __s END"
            ).alias("approx2_q"),
            F.expr(
                "CASE WHEN n = 2 THEN __a - __b"
                " ELSE cast(0 as bigint) END"
            ).alias("detail2_q"),
        )
    )


def trajectory_progress(
    df: DataFrame,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-point odometer along each entity's trajectory: cumulative
    path distance (integer mm, the trajectory_stats leg quantization)
    and progress fraction of the key's total — the "how far along the
    route" attribute that joins movement traces to anything
    positional (ETA features, route-segment attribution).

    frac_q = (cum_mm * 2^20) div total_mm (NULL for zero-length
    tracks). ONE key shuffle: the lag legs, the running sum and the
    total all ride the same window sort.
    """
    from pdal_spark import sqlgen as G

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    wall = Window.partitionBy(key_col)
    leg = (
        "cast(floor("
        + G.haversine_m("`__plat`", "`__plon`", f"`{lat}`", f"`{lon}`")
        + f" * {G.fnum(1000.0)} + {G.fnum(0.5)}) as bigint)"
    )
    stepped = (
        df.withColumn("__plat", F.lag(lat).over(w))
        .withColumn("__plon", F.lag(lon).over(w))
        .withColumn(
            "__leg",
            F.coalesce(F.expr(leg), F.lit(0).cast("bigint")),
        )
        .withColumn("cum_mm", F.sum("__leg").over(w))
        .withColumn("total_mm", F.sum("__leg").over(wall))
    )
    return stepped.select(
        key_col, id_col, "cum_mm", "total_mm",
        F.expr(
            "CASE WHEN total_mm > 0 THEN"
            f" (cum_mm * {1 << 20}) div total_mm END"
        ).alias("frac_q"),
    )


def rfm_scores(
    df: DataFrame,
    asof_ts: str,
    key_col: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """RFM segmentation inputs per entity — Recency (seconds from the
    key's last event to the explicit `asof_ts`; an explicit anchor,
    never now(), so the result is a pure function of the data),
    Frequency (event count) and Monetary (mill-quantized value sum) —
    the classic activity-scoring triple (user value tiers, churn
    screens). Compose with equi_depth_bins / score_percentile for
    quintile labels.

    Exact integers end to end; ONE map-side-combined groupBy.
    """
    from pdal_spark import sqlgen as G

    vq = (
        f"cast(floor(cast(`{value}` as double) * {G.fnum(1000.0)}"
        f" + {G.fnum(0.5)}) as bigint)"
    )
    return df.groupBy(key_col).agg(
        F.expr(
            f"unix_timestamp(timestamp '{asof_ts}')"
            f" - max(unix_timestamp(cast(`{ts}` as timestamp)))"
        ).alias("recency_s"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.expr(vq)).alias("monetary_q"),
    )


def top_session_paths(
    df: DataFrame,
    k: int = 10,
    depth: int = 3,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k opening paths: the first `depth` event types of each
    key's stream, joined into a path string, counted across keys —
    the product-analytics "how do journeys begin" query (and a bot
    fingerprint: automated traffic concentrates on very few paths).
    Keys with fewer than `depth` events emit their full (shorter)
    path. Ties break on the path string.

    Scale: one key shuffle (row_number window) + one map-side-
    combined path count + a top-k heap.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    first = (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(depth))
    )
    paths = first.groupBy(key_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("__rn"), F.col(state_col))
                    )
                ),
                lambda s: s[state_col],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy(F.col("n_keys").desc(), F.col("path").asc())
        .limit(int(k))
    )


def peak_hour(
    df: DataFrame,
    key_col: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Per-entity diurnal profile summary: the UTC hour with the most
    events (ties to the earlier hour) and its share of the key's
    activity in 2^20 fixed point — humans peak (share >> 1/24), naive
    bots run flat (share ~ 1/24); the timing fingerprint next to
    burstiness. One (key, hour) count + a 1-row heap per key.
    """
    from pyspark.sql import Window

    cnt = df.groupBy(
        key_col,
        F.expr(f"hour(cast(`{ts}` as timestamp))").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = Window.partitionBy(key_col)
    pick = Window.partitionBy(key_col).orderBy(
        F.col("c").desc(), F.col("hr").asc()
    )
    return (
        cnt.withColumn("__n", F.sum("c").over(tot))
        .withColumn("__rn", F.row_number().over(pick))
        .where("__rn = 1")
        .select(
            key_col,
            F.col("hr").alias("peak_hr"),
            F.col("c").alias("peak_n"),
            F.expr(f"(c * {1 << 20}) div __n").alias("share_q"),
        )
    )


def politeness_schedule(
    df: DataFrame,
    host: str,
    arrival_us: str,
    delay_us: int,
    id_col: str,
) -> DataFrame:
    """Per-host crawl politeness scheduling (the fetch-queue analog
    of RFC 9309 crawl-delay): requests are served in arrival order
    and each fetch starts no earlier than `delay_us` after the
    previous fetch of the same host —

        fetch_i = max(arrival_i, fetch_{i-1} + delay).

    The recurrence is max-plus, so it has the closed distributed
    form fetch_i = i*delay + running_max_j<=i(arrival_j - j*delay)
    (i = 0-based rank): ONE window per host, no iteration, all
    integer microseconds — exact under any partitioning. Output:
    (id, host, arrival_us, seq, fetch_us, wait_us).

    Scale: a single hash-partitioned window keyed by host; hot hosts
    are inherently sequential in THIS problem (the schedule itself
    serializes them), so the per-host sort is the honest cost. No
    join, no explode.
    """
    d = int(delay_us)
    w = Window.partitionBy(host).orderBy(
        F.col(arrival_us).asc(), F.col(id_col).asc()
    )
    run = Window.partitionBy(host).orderBy(
        F.col(arrival_us).asc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        df.select(id_col, host, arrival_us)
        .withColumn("seq", F.row_number().over(w) - F.lit(1))
        .withColumn(
            "__adj",
            F.col(arrival_us).cast("long") - F.col("seq") * F.lit(d),
        )
        .withColumn("__run", F.max("__adj").over(run))
        .withColumn(
            "fetch_us", F.col("__run") + F.col("seq") * F.lit(d)
        )
        .withColumn(
            "wait_us", F.col("fetch_us") - F.col(arrival_us)
        )
    )
    return out.drop("__adj", "__run")


CR_Q = 1 << 20


def change_rate(
    df: DataFrame,
    page: str,
    changed: str,
    q: int = CR_Q,
) -> DataFrame:
    """Page change-rate estimation for recrawl scheduling (Cho &
    Garcia-Molina 2003: pages change as a Poisson process; the
    freshness-optimal revisit interval is inversely tied to the
    rate). From n visits of which c observed a change, the
    smoothed rate estimate is

        lambda = -ln(1 - c/(n+1)) = ln(n+1) - ln(n+1-c)

    per visit interval — emitted as the INTEGER difference of two
    lnq terms on exact-integer doubles (house fixed-point-ln
    discipline), so the recrawl priority order is bit-reproducible.
    Output: (page, n_visits, n_changes, lambda_q).

    Scale: one map-side-combined groupBy; nothing else.
    """
    qs = G.fnum(float(int(q)))
    agg = df.groupBy(page).agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum(F.col(changed).cast("long")).alias("n_changes"),
    )
    return agg.withColumn(
        "lambda_q",
        F.expr(
            f"cast(floor(ln(cast(n_visits + 1 as double)) * {qs}"
            f" + {G.fnum(0.5)}) as bigint)"
            f" - cast(floor(ln(cast(n_visits + 1 - n_changes"
            f" as double)) * {qs} + {G.fnum(0.5)}) as bigint)"
        ),
    )


EWMA_Q = 1 << 20


def ewma_smooth(
    df: DataFrame,
    key: str,
    order_col: str,
    value: str,
    num: int = 2,
    den: int = 10,
    q: int = EWMA_Q,
) -> DataFrame:
    """Per-key exponentially-weighted moving average with alpha =
    num/den, in EXACT integer fixed point — the trend smoother for
    per-host rates / per-source quality drift where the answer must
    be bit-reproducible across engines and retries:

        v_q = floor(v * q + 0.5)          (input quantization)
        s_1 = v_q(1)
        s_t = (num * v_q(t) + (den - num) * s_{t-1}) div den

    Values must be NON-NEGATIVE (integer div truncation only agrees
    across engines on non-negative operands — the house div trap).
    Output: (key, order, value_q, ewma_q); ewma = ewma_q / q.

    Scale: the recurrence is inherently sequential PER KEY, so the
    kernel is applyInPandas over the key — parallelism = key
    cardinality, the honest cost (same shape as the reference's
    per-stream scanline pass). Nothing is quadratic; each group
    sorts its own rows only.
    """
    import numpy as np
    import pandas as pd

    nm, dn, qq = int(num), int(den), int(q)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__o")
        v = np.floor(
            pdf["__v"].to_numpy(dtype=np.float64) * qq + 0.5
        ).astype(np.int64)
        out = np.empty_like(v)
        s = 0
        for i, x in enumerate(v):
            s = int(x) if i == 0 else (
                (nm * int(x) + (dn - nm) * s) // dn
            )
            out[i] = s
        return pd.DataFrame({
            "key": pdf["__k"].to_numpy(),
            "ord": pdf["__o"].to_numpy(),
            "value_q": v,
            "ewma_q": out,
        })

    base = df.select(
        F.col(key).alias("__k"),
        F.col(order_col).cast("long").alias("__o"),
        F.col(value).cast("double").alias("__v"),
    )
    return base.groupBy("__k").applyInPandas(
        fn, "key long, ord long, value_q long, ewma_q long"
    )


def rolling_median(
    df: DataFrame,
    key: str,
    order_col: str,
    value: str,
    width: int = 7,
) -> DataFrame:
    """Per-key rolling LOWER median over the trailing `width` rows —
    the robust trend line (median absorbs spikes the mean chases).
    The median is an actual data value (rank ceil(n/2) of the
    window, no interpolation), so the output is float-exact on any
    engine. Output: (key, order, value, med).

    Scale: one per-key window; the collected window array is bounded
    by `width` (constant memory per row). No join, no global sort.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(-(int(width) - 1), 0)
    )
    arr = F.array_sort(
        F.collect_list(F.col(value).cast("double")).over(w)
    )
    med = F.element_at(
        arr, ((F.size(arr) + 1) / 2).cast("int")
    )
    return df.select(
        F.col(key),
        F.col(order_col),
        F.col(value).cast("double").alias(value),
        med.alias("med"),
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    ts_us: str,
    value: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 assembly from a change
    stream: per key, consecutive DUPLICATE values collapse (a no-op
    change does not open a new version), every surviving change
    opens a version valid [its ts, next change's ts), and the last
    version is current (valid_to NULL) — the dimension-table
    maintenance op behind url_latest-style snapshots when HISTORY
    must be queryable (as-of joins against past states).

    Output: (key, value, valid_from, valid_to, is_current int).
    Timestamps are integer microseconds (unix_micros/epoch_us — the
    house cross-engine convention; never seconds-truncating
    unix_timestamp).

    Scale: two per-key window passes (lag to collapse no-ops, lead
    to close intervals) — hash-partitioned by key, no join.
    """
    w = Window.partitionBy("__k").orderBy(F.col("__t").asc())
    base = df.select(
        F.col(key).alias("__k"),
        F.col(ts_us).cast("long").alias("__t"),
        F.col(value).alias("__v"),
    )
    changes = (
        base.withColumn("__prev", F.lag("__v").over(w))
        .where(
            F.col("__prev").isNull()
            | (F.col("__v") != F.col("__prev"))
        )
        .drop("__prev")
    )
    out = changes.withColumn("__to", F.lead("__t").over(w))
    return out.select(
        F.col("__k").alias(key),
        F.col("__v").alias(value),
        F.col("__t").alias("valid_from"),
        F.col("__to").alias("valid_to"),
        F.col("__to").isNull().cast("int").alias("is_current"),
    )


SD_Q = 1 << 20  # seasonal-decompose value quantizer


def seasonal_decompose(
    df: DataFrame,
    key: str,
    order_col: str,
    value: str,
    period: int = 24,
) -> DataFrame:
    """Additive seasonal decomposition (the classical
    moving-average form behind STL, Cleveland 1990):
    value = trend + seasonal + remainder, with an EVEN period —
    crawl-traffic / event-rate monitoring (is Tuesday's drop
    seasonal or a regression?).

    Exact integer fixed point on the shared 2*period*SD_Q scale:
    v_q = floor(v*Q + 0.5); the even-period centered MA is
    trend2p_q = 2*S - v[-h] - v[h] over the (period+1)-row window
    (the half-weight endpoint convention), NULL until the window is
    complete; detrended = v_q*2p - trend2p_q; per-phase seasonal =
    truncating mean of detrended, centered by the truncating mean
    across phases. Integer sums commute — partitioning-invariant.
    Phase = (rank-1) % period (count-based seasonality; calendar
    phases are a column swap).

    Scale: ONE per-key ordered window pass (bounded period+1 frame)
    + one <= period-row phase agg broadcast back. Output: (key,
    order, phase, v_q, trend2p_q, seas2p_q, rem2p_q).
    """
    p = int(period)
    if p % 2 != 0 or p < 2:
        raise ValueError("period must be even and >= 2")
    h = p // 2
    w = Window.partitionBy(key).orderBy(order_col)
    wf = w.rowsBetween(-h, h)
    base = df.select(
        F.col(key).alias("__k"),
        F.col(order_col).alias("__o"),
        F.expr(
            f"cast(floor(`{value}` * {SD_Q} + 0.5e0) as bigint)"
        ).alias("v_q"),
    )
    t = (
        base.withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("__k").orderBy("__o")
            ),
        )
        .withColumn("phase", (F.col("__r") - 1) % p)
        .withColumn("__s", F.sum("v_q").over(
            Window.partitionBy("__k").orderBy("__o")
            .rowsBetween(-h, h)))
        .withColumn("__n", F.count(F.lit(1)).over(
            Window.partitionBy("__k").orderBy("__o")
            .rowsBetween(-h, h)))
        .withColumn("__lo", F.lag("v_q", h).over(
            Window.partitionBy("__k").orderBy("__o")))
        .withColumn("__hi", F.lead("v_q", h).over(
            Window.partitionBy("__k").orderBy("__o")))
        .withColumn(
            "trend2p_q",
            F.when(
                F.col("__n") == p + 1,
                2 * F.col("__s") - F.col("__lo") - F.col("__hi"),
            ),
        )
        .withColumn(
            "__detr",
            F.when(
                F.col("trend2p_q").isNotNull(),
                F.col("v_q") * (2 * p) - F.col("trend2p_q"),
            ),
        )
    )
    ph = (
        t.where(F.col("__detr").isNotNull())
        .groupBy("__k", "phase")
        .agg(
            F.expr("sum(__detr) div count(1)").alias("__s_raw")
        )
    )
    ctr = ph.groupBy("__k").agg(
        F.expr("sum(__s_raw) div count(1)").alias("__ctr")
    )
    seas = ph.join(ctr, on="__k").select(
        "__k", "phase",
        (F.col("__s_raw") - F.col("__ctr")).alias("seas2p_q"),
    )
    out = t.join(seas, on=["__k", "phase"], how="left").select(
        F.col("__k").alias(key),
        F.col("__o").alias(order_col),
        "phase", "v_q", "trend2p_q", "seas2p_q",
        F.when(
            F.col("__detr").isNotNull()
            & F.col("seas2p_q").isNotNull(),
            F.col("__detr") - F.col("seas2p_q"),
        ).alias("rem2p_q"),
    )
    return out


BURST_Q = 1 << 20


def burst_detect(
    df: DataFrame,
    key: str,
    ts_us: str,
    s_num: int = 3,
    s_den: int = 1,
    penalty_q: int = 2 * BURST_Q,
) -> DataFrame:
    """Kleinberg burst detection (Kleinberg 2002), two-state integer
    form: label every inter-arrival GAP of a per-key event stream as
    base-rate or burst-rate via the globally optimal Viterbi decode
    — crawl-rate anomaly / topic-burst segmentation that per-gap
    thresholds get wrong (one long gap inside a burst should not
    split it; the switch penalty enforces that).

    States: base mean gap g0 = span div n_gaps (per key), burst
    mean gap g1 = (g0 * s_den) div s_num (rate s times higher).
    Emission cost of gap x in state g — the exponential
    negative-log-likelihood on the 2^-20 grid, exact:

        cost_q(x; g) = (x * Q) div g + floor(ln(g) * Q + 0.5)

    Switch penalty `penalty_q` plays gamma * ln n. All int64 —
    bit-reproducible under any partitioning (the map_match kernel).
    Bound: per-key gaps must stay under ~2^43 us (~3 months) at
    Q = 2^20.

    Output per gap: (key, ts_us of the gap-closing event, gap_us,
    state, is_burst).

    Scale: one per-key lag window + one per-key 2-number aggregate
    joined back; the sequential DP runs per key in ONE applyInPandas
    pass (the map_match shape) — parallelism = keys, state = 2 ints.
    """
    from pdal_spark.operators.transform import viterbi_path

    base = df.select(
        F.col(key).alias("__k"), F.col(ts_us).cast("long").alias("__t")
    )
    w = Window.partitionBy("__k").orderBy("__t")
    gaps = (
        base.withColumn("__prev", F.lag("__t").over(w))
        .where(F.col("__prev").isNotNull())
        .withColumn("__x", F.col("__t") - F.col("__prev"))
    )
    stats = gaps.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__ng"),
        F.sum("__x").alias("__span"),
    ).select(
        "__k",
        F.expr("greatest(1, __span div __ng)").alias("__g0"),
    ).withColumn(
        "__g1",
        F.expr(f"greatest(1, (__g0 * {int(s_den)}) div {int(s_num)})"),
    )
    q = int(BURST_Q)
    em = (
        gaps.join(stats, on="__k")
        .withColumn("__e0", F.expr(
            f"(__x * {q}) div __g0"
            f" + cast(floor(ln(cast(__g0 as double)) * {q}"
            " + 0.5e0) as bigint)"))
        .withColumn("__e1", F.expr(
            f"(__x * {q}) div __g1"
            f" + cast(floor(ln(cast(__g1 as double)) * {q}"
            " + 0.5e0) as bigint)"))
    )
    import numpy as np
    import pandas as pd

    key_t = df.schema[key].dataType.simpleString()
    schema = (
        f"`{key}` {key_t}, ts_us long, gap_us long, "
        "state int, is_burst boolean"
    )
    pen = int(penalty_q)

    def _decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__t", kind="mergesort")
        E = pdf[["__e0", "__e1"]].to_numpy(dtype=np.int64)
        path = viterbi_path(E, pen)
        return pd.DataFrame({
            key: pdf["__k"].to_numpy(),
            "ts_us": pdf["__t"].to_numpy(),
            "gap_us": pdf["__x"].to_numpy(),
            "state": path.astype(np.int32),
            "is_burst": path == 1,
        })

    return (
        em.select("__k", "__t", "__x", "__e0", "__e1")
        .groupBy("__k")
        .applyInPandas(_decode, schema=schema)
    )


def dtw_distance(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    block: str | None = None,
    band: int | None = None,
) -> DataFrame:
    """Pairwise dynamic-time-warping distance between per-key series
    (Sakoe & Chiba 1978; Berndt & Clifford 1994) — the alignment-
    tolerant series distance under trajectory clustering, traffic-
    profile matching, and crawl-rate similarity, where Euclidean
    breaks on any phase shift.

    dp[i][j] = |x_i - y_j| + min(dp[i-1][j], dp[i][j-1],
    dp[i-1][j-1]) over int64 costs — exact, no floats anywhere.
    `band` (Sakoe-Chiba radius) restricts |i - j| <= band; None =
    full matrix.

    Pair space: keys sharing `block` (a.key < b.key); block=None
    compares ALL key pairs — only for small key counts (the
    cosine_topk-style guard is the caller's blocking choice).

    Scale: series assemble in ONE map-side-combined collect per key
    (bounded length — the per-key series must fit an executor row;
    document/enforce upstream), pairs are a hash self-join on block,
    and the DP runs in an Arrow-batched pandas_udf — O(n*m) per pair
    (O(n*band) banded), never per-row Python.
    """
    import numpy as np

    from pyspark.sql import types as T

    gcols = [F.col(key).alias("k")]
    if block is not None:
        gcols.append(F.col(block).alias("b"))
    ser = (
        df.groupBy(*gcols)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col(order).alias("o"),
                    F.col(value).cast("long").alias("v"),
                ))),
                lambda s: s["v"],
            ).alias("vals")
        )
    )
    a = ser.select(F.col("k").alias("key_a"),
                   F.col("vals").alias("va"),
                   *([F.col("b")] if block is not None else []))
    b = ser.select(F.col("k").alias("key_b"),
                   F.col("vals").alias("vb"),
                   *([F.col("b")] if block is not None else []))
    pairs = a.join(b, on=(["b"] if block is not None else []) or None,
                   how="inner" if block is not None else "cross")
    pairs = pairs.where(F.col("key_a") < F.col("key_b"))

    bnd = None if band is None else int(band)

    @F.pandas_udf(T.LongType())
    def _dtw(xa: pd.Series, xb: pd.Series) -> pd.Series:
        INF = np.int64(1 << 62)
        out = np.empty(len(xa), dtype=np.int64)
        for r, (av, bv) in enumerate(zip(xa, xb)):
            x = np.asarray(av, dtype=np.int64)
            y = np.asarray(bv, dtype=np.int64)
            n, m = len(x), len(y)
            if n == 0 or m == 0:
                out[r] = -1
                continue
            w = max(bnd, abs(n - m)) if bnd is not None else max(n, m)
            row = np.full(m, INF)
            lo0, hi0 = 0, min(m, w + 1)
            row[lo0:hi0] = np.abs(x[0] - y[lo0:hi0]).cumsum()
            for i in range(1, n):
                new = np.full(m, INF)
                lo, hi = max(0, i - w), min(m, i + w + 1)
                for j in range(lo, hi):
                    best = row[j]
                    if j > 0:
                        if row[j - 1] < best:
                            best = row[j - 1]
                        if new[j - 1] < best:
                            best = new[j - 1]
                    if best < INF:
                        new[j] = abs(x[i] - y[j]) + best
                row = new
            out[r] = row[m - 1]
        return pd.Series(out)

    return pairs.select(
        "key_a", "key_b",
        *([F.col("b").alias(block)] if block is not None else []),
        _dtw("va", "vb").alias("dtw"),
    )


HOLT_Q = 1 << 10
HOLT_SCALE = 1 << 10


def holt_linear(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    alpha_q: int = 307,   # ~0.3 on the 2^-10 grid
    beta_q: int = 102,    # ~0.1
) -> DataFrame:
    """Holt linear (double exponential) smoothing (Holt 1957) —
    level + trend tracking and one-step-ahead forecasting for crawl
    rates / traffic profiles, where single EWMA lags any trend.

    Integer fixed-point form on the 2^-10 grid (xs = x * HOLT_SCALE):

        l_t = (alpha*xs_t + (Q-alpha) * (l_{t-1} + b_{t-1})) tdiv Q
        b_t = (beta*(l_t - l_{t-1}) + (Q-beta) * b_{t-1})    tdiv Q

    seeded l_0 = xs_0, b_0 = xs_1 - xs_0 (0 for length-1 series);
    tdiv TRUNCATES TOWARD ZERO — level/trend go negative, and
    that is the one integer division Spark ``div`` and DuckDB ``//``
    BOTH implement (numpy ``//`` floors, so the kernel adjusts —
    the inverse of the geometric_median sign trap). Exact int64,
    bit-reproducible under any partitioning. Bound:
    |x| * HOLT_SCALE * Q < 2^62.

    Output per step: (key, order, level_q, trend_q, forecast_q =
    previous level + trend — the one-step-ahead prediction; NULL at
    the first step).

    Scale: the sequential recurrence runs per key in ONE
    applyInPandas pass (the burst_detect shape) — parallelism =
    keys, state = 2 ints.
    """
    import numpy as np

    a_q, b_q, q, sc = (int(alpha_q), int(beta_q), int(HOLT_Q),
                       int(HOLT_SCALE))
    key_t = df.schema[key].dataType.simpleString()
    order_t = df.schema[order].dataType.simpleString()
    schema = (
        f"`{key}` {key_t}, `{order}` {order_t}, level_q long, "
        "trend_q long, forecast_q long"
    )
    base = df.select(
        F.col(key).alias("__k"), F.col(order).alias("__o"),
        (F.col(value).cast("long") * sc).alias("__xs"),
    )

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np

        pdf = pdf.sort_values("__o", kind="mergesort")
        xs = pdf["__xs"].to_numpy(dtype=_np.int64)
        n = len(xs)
        lv = _np.empty(n, dtype=_np.int64)
        tr = _np.empty(n, dtype=_np.int64)
        fc = _np.zeros(n, dtype=_np.int64)
        def tdiv(v: int) -> int:  # truncate toward zero by q
            return v // q if v >= 0 else -((-v) // q)

        lv[0] = xs[0]
        tr[0] = (xs[1] - xs[0]) if n > 1 else 0
        for t in range(1, n):
            fc[t] = lv[t - 1] + tr[t - 1]
            lt = tdiv(int(a_q * xs[t] + (q - a_q) * fc[t]))
            tr[t] = tdiv(int(b_q * (lt - lv[t - 1])
                             + (q - b_q) * tr[t - 1]))
            lv[t] = lt
        fc_n = pd.array(fc, dtype="Int64")
        fc_n[0] = pd.NA  # no one-step forecast for the first point
        return pd.DataFrame({
            key: pdf["__k"].to_numpy(),
            order: pdf["__o"].to_numpy(),
            "level_q": lv, "trend_q": tr,
            "forecast_q": fc_n,
        })

    _ = np
    return base.groupBy("__k").applyInPandas(_run, schema=schema)


def mann_kendall(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
) -> DataFrame:
    """Mann-Kendall trend test statistic per key (Mann 1945; Kendall
    1975) — the nonparametric monotone-trend detector under
    "emerging hot spot" analysis (per-cell count series), robust to
    outliers and any monotone transform where OLS slope is not:

        S = sum over i < j of sign(x_j - x_i)

    plus the exact tie-corrected variance NUMERATOR (var(S) * 18 =
    n(n-1)(2n+5) - sum over tie groups t(t-1)(2t+5)) and n — all
    int64, so z = (S -+ 1) / sqrt(var) is one caller expression.
    Positive S = increasing trend.

    Scale: ONE per-key self hash-join over the (key, order, value)
    rows (O(n^2) per key — keys are short series: 24 hours / 52
    weeks; the blocking contract of dtw_distance) + one tie
    aggregate. No window, no driver state.
    """
    base = df.select(
        F.col(key).alias("k"), F.col(order).alias("o"),
        F.col(value).cast("long").alias("v"),
    )
    a = base.alias("a")
    b = base.select(F.col("k"), F.col("o").alias("o2"),
                    F.col("v").alias("v2")).alias("b")
    s = (
        a.join(b, on="k")
        .where(F.col("o") < F.col("o2"))
        .groupBy("k")
        .agg(
            F.sum(F.signum(F.col("v2") - F.col("v")).cast("long"))
            .alias("s_stat"),
            (F.count(F.lit(1))).alias("n_pairs"),
        )
    )
    n_df = base.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        base.groupBy("k", "v").agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .groupBy("k")
        .agg(F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
             .alias("tie_corr"))
    )
    return (
        s.join(n_df, on="k")
        .join(ties, on="k", how="left")
        .select(
            F.col("k").alias(key), "s_stat", "n",
            (F.expr("n * (n - 1) * (2 * n + 5)")
             - F.coalesce("tie_corr", F.lit(0))).alias("var18"),
        )
    )


def acf(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    max_lag: int = 6,
) -> DataFrame:
    """Autocorrelation function terms per key (Box & Jenkins):
    for each lag 1..max_lag over the per-key series, the EXACT
    integer sufficient statistics on the n-scaled deviation grid
    d_t = n*x_t - sum(x):

        num(k) = sum over t of d_t * d_{t+k}
        den    = sum d_t^2            (lag 0)

    r_k = num/den is the caller's one division; alongside
    seasonal_decompose this is the period DETECTOR (the lag with
    max r_k) and the white-noise check under monitoring.

    Scale: one 2-number agg joined back + max_lag lead() columns on
    ONE ordered window pass (the ppmi_cooc discipline — never a
    positions self-join) + ONE hash agg. Bound: n * |dev| products
    under 2^63 (n-scaled devs < n * n * xmax).
    """
    base = df.select(
        F.col(key).alias("k"), F.col(order).alias("o"),
        F.col(value).cast("long").alias("v"),
    )
    mom = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sx")
    )
    dev = base.join(mom, on="k").select(
        "k", "o", "n", (F.col("n") * F.col("v") - F.col("sx"))
        .alias("d"),
    )
    w = Window.partitionBy("k").orderBy("o")
    leads = dev.select(
        "k", "d",
        *[F.lead("d", lag).over(w).alias(f"__l{lag}")
          for lag in range(1, int(max_lag) + 1)],
    )
    agg = leads.groupBy("k").agg(
        F.sum(F.expr("d * d")).alias("den"),
        *[F.sum(F.col("d") * F.col(f"__l{lag}")).alias(f"__n{lag}")
          for lag in range(1, int(max_lag) + 1)],
    )
    lagged = agg.select(
        "k", "den",
        F.explode(F.array(*[
            F.struct(F.lit(lag).alias("lag"),
                     F.coalesce(F.col(f"__n{lag}"), F.lit(0))
                     .alias("num"))
            for lag in range(1, int(max_lag) + 1)
        ])).alias("t"),
    ).select(
        F.col("k").alias(key), F.col("t.lag").alias("lag"),
        F.col("t.num").alias("num"), "den",
        F.expr("cast(t.num as double) / cast(den as double)")
        .alias("r"),
    )
    return lagged


def sax_words(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    n_segments: int = 8,
    breakpoints_q: tuple[int, ...] = (-431, 0, 431),
) -> DataFrame:
    """SAX symbolic series approximation (Lin et al. 2003): each
    per-key series is PAA-averaged into `n_segments` equal-count
    segments, each segment mean mapped to a letter by fixed
    breakpoints — identical series shapes get identical WORDS, so
    motif discovery / series dedup becomes a plain groupBy on the
    word (the minhash trick for time series).

    Integer-exact contract: breakpoints are integers in n-SCALED
    DEVIATION units (the local_morans_i grid: d = n*x - sum(x) per
    key), and a segment's letter = #{bp : bp * seg_n <
    n * seg_sum - seg_n * sx} — every comparison a cross-multiplied
    int64, no division, no float. Callers wanting the classic
    N(0,1) breakpoints pre-scale them by n * sigma.

    Output: (key, word, n_points) — word = letters 'a'.. joined in
    segment order.

    Scale: ONE rank window + ONE segment aggregate + ONE ordered
    collect per key (n_segments values); no self-join.
    """
    ns = int(n_segments)
    base = df.select(
        F.col(key).alias("k"), F.col(order).alias("o"),
        F.col(value).cast("long").alias("v"),
    )
    w = Window.partitionBy("k").orderBy("o")
    ranked = base.select(
        "k", "v", (F.row_number().over(w) - 1).alias("r"),
    )
    mom = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sx")
    )
    seg = (
        ranked.join(mom, on="k")
        .select("k", "v", "n", "sx",
                F.expr(f"(r * {ns}) div n").alias("seg"))
        .groupBy("k", "seg")
        .agg(F.first("n").alias("n"), F.first("sx").alias("sx"),
             F.count(F.lit(1)).alias("seg_n"),
             F.sum("v").alias("seg_sum"))
    )
    # deviation of the segment mean on the n-scaled grid:
    # dmean_num = n * seg_sum - seg_n * sx  (seg_n * n x the mean dev)
    dnum = (F.col("n") * F.col("seg_sum")
            - F.col("seg_n") * F.col("sx"))
    letter_idx = sum(
        F.when(dnum > F.lit(int(bp)) * F.col("seg_n"), 1)
        .otherwise(0)
        for bp in sorted(breakpoints_q)
    )
    lettered = seg.select(
        "k", "seg", letter_idx.alias("li"), "seg_n"
    )
    agg = (
        lettered
        .select("k", "seg", F.char(F.lit(97) + F.col("li")).alias("ch"),
                "seg_n")
        .groupBy("k")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("seg"), F.col("ch")))),
                    lambda s: s["ch"],
                ),
            ).alias("word"),
            F.sum("seg_n").alias("n_points"),
        )
    )
    return agg.select(F.col("k").alias(key), "word", "n_points")


def emerging_hotspots(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
    ts: str = "ts",
    res: int = 3,
    us_per_bin: int = 86_400_000_000,
    min_total: int = 50,
) -> DataFrame:
    """Emerging-hot-spot classification per lattice cell (the
    space-time-cube readout popularized by ArcGIS EHSA, built from
    this repo's primitives): bin events into (qcell, time-bin)
    counts, run the Mann-Kendall monotone-trend test down each
    cell's count series, and label every cell by (is it hot?, which
    way is it trending?).

    Labels: 'rising-hot' (total >= min_total, S > 0), 'fading-hot'
    (hot, S < 0), 'steady-hot' (hot, S = 0), 'rising-cold' (cold but
    S > 0 — the EMERGING case worth watching), 'cold'. All decisions
    compare exact int64s (total, the MK S statistic), so the
    classification is engine-invariant.

    Scale: ONE groupBy(cell, bin) count, mann_kendall's per-key self
    hash-join over SHORT series (bins per cell, not points), one
    totals agg joined back. Never points^2.
    """
    cells = df.select(
        F.expr(G.qcell_ix(f"`{x}`", res)).alias("cix"),
        F.expr(G.qcell_iy(f"`{y}`", res)).alias("ciy"),
        (F.unix_micros(F.col(ts).cast("timestamp"))
         / F.lit(int(us_per_bin))).cast("long").alias("tbin"),
    )
    counts = (
        cells.groupBy("cix", "ciy", "tbin")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "cell",
            F.col("cix") * F.lit(1 << 27) + F.col("ciy"),
        )
    )
    mk = mann_kendall(counts, key="cell", order="tbin", value="c")
    totals = counts.groupBy("cell").agg(F.sum("c").alias("total"))
    j = mk.join(totals, on="cell").select(
        "cell", "total", "s_stat", "n", "var18"
    )
    t = int(min_total)
    label = (
        F.when((F.col("total") >= t) & (F.col("s_stat") > 0),
               F.lit("rising-hot"))
        .when((F.col("total") >= t) & (F.col("s_stat") < 0),
              F.lit("fading-hot"))
        .when(F.col("total") >= t, F.lit("steady-hot"))
        .when(F.col("s_stat") > 0, F.lit("rising-cold"))
        .otherwise(F.lit("cold"))
    )
    return j.select("cell", "total", "s_stat", "n", "var18",
                    label.alias("label"))


def frechet_pairs(
    df: DataFrame,
    key: str,
    order: str,
    x: str = "xq",
    y: str = "yq",
    block: str | None = None,
) -> DataFrame:
    """Discrete Frechet distance (squared) between per-key
    trajectories (Eiter & Mannila 1994) — the ORDER-AWARE companion
    of hausdorff_pairs (a dog-and-owner walking both curves forward;
    Hausdorff ignores direction, DTW ignores geometry): the standard
    trajectory-similarity measure for route matching and convoy
    detection.

    dp[i][j] = max(d2(a_i, b_j), min(dp[i-1][j], dp[i][j-1],
    dp[i-1][j-1])) over exact int64 SQUARED distances on the
    quantized grid — max/min of a monotone transform, so f2 =
    (discrete Frechet)^2 exactly, no floats anywhere.

    Pair space: keys sharing `block` (a.key < b.key), the
    dtw_distance/hausdorff blocking contract. Series assemble in ONE
    map-side-combined collect per key (bounded length enforced
    upstream); the DP runs in an Arrow-batched pandas_udf.
    """
    import numpy as np

    from pyspark.sql import types as T

    gcols = [F.col(key).alias("k")]
    if block is not None:
        gcols.append(F.col(block).alias("b"))
    ser = (
        df.groupBy(*gcols)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col(order).alias("o"),
                    F.col(x).cast("long").alias("vx"),
                    F.col(y).cast("long").alias("vy"),
                ))),
                lambda s: s["vx"],
            ).alias("xs"),
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col(order).alias("o"),
                    F.col(x).cast("long").alias("vx"),
                    F.col(y).cast("long").alias("vy"),
                ))),
                lambda s: s["vy"],
            ).alias("ys"),
        )
    )
    a = ser.select(F.col("k").alias("key_a"),
                   F.col("xs").alias("xa"), F.col("ys").alias("ya"),
                   *([F.col("b")] if block is not None else []))
    b = ser.select(F.col("k").alias("key_b"),
                   F.col("xs").alias("xb"), F.col("ys").alias("yb"),
                   *([F.col("b")] if block is not None else []))
    pairs = a.join(b, on=(["b"] if block is not None else []) or None,
                   how="inner" if block is not None else "cross")
    pairs = pairs.where(F.col("key_a") < F.col("key_b"))

    @F.pandas_udf(T.LongType())
    def _frechet(xa: pd.Series, ya: pd.Series,
                 xb: pd.Series, yb: pd.Series) -> pd.Series:
        out = np.empty(len(xa), dtype=np.int64)
        for r in range(len(xa)):
            ax = np.asarray(xa[r], dtype=np.int64)
            ay = np.asarray(ya[r], dtype=np.int64)
            bx = np.asarray(xb[r], dtype=np.int64)
            by = np.asarray(yb[r], dtype=np.int64)
            n, m = len(ax), len(bx)
            if n == 0 or m == 0:
                out[r] = -1
                continue
            dx = ax[:, None] - bx[None, :]
            dy = ay[:, None] - by[None, :]
            c = dx * dx + dy * dy
            row = np.maximum.accumulate(c[0])
            for i in range(1, n):
                new = np.empty(m, dtype=np.int64)
                new[0] = max(c[i, 0], row[0])
                for j in range(1, m):
                    best = row[j]
                    if row[j - 1] < best:
                        best = row[j - 1]
                    if new[j - 1] < best:
                        best = new[j - 1]
                    new[j] = c[i, j] if c[i, j] > best else best
                row = new
            out[r] = row[m - 1]
        return pd.Series(out)

    return pairs.select(
        "key_a", "key_b",
        *([F.col("b").alias(block)] if block is not None else []),
        _frechet("xa", "ya", "xb", "yb").alias("f2"),
    )


def kaplan_meier(
    df: DataFrame,
    duration: str,
    event: str,
) -> DataFrame:
    """Kaplan-Meier survival curve (Kaplan & Meier 1958) with right
    censoring — content half-life, session persistence, link rot:
    at each distinct event time t, S(t) = prod_{t' <= t}
    (1 - d_t' / n_t') with d = events AT t and n = subjects still at
    risk (duration >= t; censored rows leave the risk set without
    an event).

    Exactness: n and d are exact int64 (risk set via one descending
    cumulative sum — no per-t scan); the product runs as a
    cumulative sum of ln terms each pre-rounded to 9 decimals and
    quantized to integer nano-units (ln is transcendental — the
    repo's round-on-both-sides rule), so the running sum is
    partitioning-invariant; s_r = round(exp(sum), 6).

    Output per distinct duration with >= 1 event: (t, n_risk,
    d_events, s_r) ordered by t.

    Scale: ONE groupBy(duration) + ONE global-window cumulative pass
    over the DISTINCT durations (tiny), never over rows.
    """
    base = df.select(
        F.col(duration).cast("long").alias("t"),
        F.col(event).cast("int").alias("e"),
    )
    per_t = base.groupBy("t").agg(
        F.count(F.lit(1)).alias("leave"),
        F.sum("e").alias("d"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.withColumn("n_risk", F.sum("leave").over(w_desc))
    ev = risk.where(F.col("d") > 0)
    term = (
        "cast(floor(round(ln(1.0e0 - cast(d as double)"
        " / cast(n_risk as double)), 9)"
        " * 1.0e9 + 0.5e0) as bigint)"
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        ev.where(F.col("d") < F.col("n_risk"))
        .withColumn("lt", F.expr(term))
        .withColumn("cum", F.sum("lt").over(w_asc))
    )
    return out.select(
        "t", "n_risk", F.col("d").alias("d_events"),
        F.expr(
            "round(exp(cast(cum as double) / 1.0e9), 6)"
        ).alias("s_r"),
    ).orderBy("t")


def stay_points(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    order: str | None = None,
    t2: int = 1,
    min_n: int = 2,
) -> DataFrame:
    """Stay-point detection (Li et al. 2008's GPS-log staple): per
    key, maximal runs of CONSECUTIVE pings whose step displacement
    stays within a threshold — where did this device/crawler/user
    dwell, as opposed to transit. Input carries exact integer grid
    coordinates (mx, my); a new segment starts whenever the squared
    step distance to the previous ping exceeds ``t2`` (strictly
    greater; first ping always starts one).

    Classic gaps-and-islands: ONE lag window over (key, ts[, order])
    flags the breaks, a running sum numbers the segments, ONE hash
    aggregate summarizes them. Centroid = integer-div mean on the
    grid (div truncates toward zero in BOTH engines — verify SKILL
    notes); all outputs exact int64. Rows with NULL coordinates are
    dropped up front (they would break every step distance).

    Ties in ``ts`` make "previous ping" ambiguous — pass ``order``
    (a unique tiebreak column) whenever ts can repeat; determinism
    is on the (ts, order) total order.

    Scale: one shuffle on the key (the window) + one map-side
    combined aggregate. No self-join, no per-row Python.
    """
    ob = [F.col("__ts")] + ([F.col("__o")] if order else [])
    w = Window.partitionBy("__k").orderBy(*ob)
    d2 = (
        "(mx - pmx) * (mx - pmx) + (my - pmy) * (my - pmy)"
    )
    stepped = (
        df.where(F.col("mx").isNotNull() & F.col("my").isNotNull())
        .select(
            *(
                [F.col(key).alias("__k"), F.col(ts).alias("__ts")]
                + ([F.col(order).alias("__o")] if order else [])
                + [F.col("mx"), F.col("my")]
            ),
        )
        .select(
            "*",
            F.lag("mx").over(w).alias("pmx"),
            F.lag("my").over(w).alias("pmy"),
        )
        .select(
            *(
                ["__k", "__ts"]
                + (["__o"] if order else [])
                + ["mx", "my"]
            ),
            F.when(
                F.col("pmx").isNull() | F.expr(f"{d2} > {int(t2)}"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("brk"),
        )
    )
    w2 = (
        Window.partitionBy("__k")
        .orderBy(*ob)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    segs = stepped.select(
        "__k", "__ts", "mx", "my",
        F.sum("brk").over(w2).alias("seg"),
    )
    return (
        segs.groupBy("__k", "seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__ts").alias("t_start"),
            F.max("__ts").alias("t_end"),
            F.expr("sum(mx) div count(*)").alias("cx"),
            F.expr("sum(my) div count(*)").alias("cy"),
        )
        .where(F.col("n") >= int(min_n))
        .select(
            F.col("__k").alias(key),
            "seg", "n", "t_start", "t_end", "cx", "cy",
        )
    )


def flock_pairs(
    df: DataFrame,
    key: str = "key",
    tbin: str = "tbin",
    cell: str = "cell",
    min_run: int = 2,
) -> DataFrame:
    """Co-movement (flock/convoy-lite) detection: pairs of keys that
    occupy the SAME cell in >= ``min_run`` CONSECUTIVE time bins —
    sustained togetherness, which one-off co-occurrence counts
    (cell_jaccard_pairs) and space-time pair tests (knox_test) don't
    capture. The contact-tracing / bot-convoy screen.

    Plan: dedupe to distinct (key, tbin, cell), self-join per
    (tbin, cell) with key_a < key_b — pair volume tracks CELL
    OCCUPANCY (sum over (tbin,cell) of n^2), never |keys|^2 — then
    per pair the classic islands trick: consecutive tbins share
    (tbin - row_number()), one aggregate per island, keep pairs whose
    longest island reaches min_run. All values exact int64.

    Scale: the self-join shuffles on (tbin, cell) — a hot cell-hour
    is the skew unit (AQE skew-join eligible; pre-cap occupancy with
    a sampler if a cell-hour can exceed memory). The islands window
    shuffles on the pair key once.
    """
    pres = df.select(
        F.col(key).alias("k"),
        F.col(tbin).cast("long").alias("tb"),
        F.col(cell).alias("c"),
    ).distinct()
    a = pres.select(F.col("k").alias("ka"), "tb", "c")
    b = pres.select(F.col("k").alias("kb"), "tb", "c")
    both = a.join(b, on=["tb", "c"]).where(F.col("ka") < F.col("kb"))
    # a pair can share SEVERAL cells in one tbin; islands run over
    # distinct tbins
    pt = both.select("ka", "kb", "tb").distinct()
    w = Window.partitionBy("ka", "kb").orderBy("tb")
    isl = pt.select(
        "ka", "kb", "tb",
        (F.col("tb") - F.row_number().over(w)).alias("grp"),
    )
    runs = isl.groupBy("ka", "kb", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("run")
    )
    return (
        runs.groupBy("ka", "kb")
        .agg(
            F.max("run").alias("max_run"),
            F.sum("run").alias("n_bins"),
        )
        .where(F.col("max_run") >= int(min_run))
    )


def radius_of_gyration(
    df: DataFrame, key: str = "key"
) -> DataFrame:
    """Radius of gyration per key (Gonzalez, Hidalgo & Barabasi
    2008) — THE human-mobility range statistic: RMS distance of a
    key's pings from its own centroid, on the exact integer grid
    (mx, my). Commuters score small, travelers large; for crawl
    infrastructure, how geographically spread a host/user's activity
    is.

        rg = sqrt(n*(sxx + syy) - sx^2 - sy^2) / n

    — the all-integer expansion of sqrt(mean |p - centroid|^2), so
    the moment sums are exact int64 and rg is one IEEE sqrt +
    division. Bound: sx^2 <= (n * max|m|)^2 — keep n * max|m| under
    ~3e9 (10^4 pings on the millidegree grid is ~2e9).

    Scale: ONE map-side-combined hash aggregate.
    """
    agg = df.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").alias("sx"),
        F.sum("my").alias("sy"),
        F.sum(F.expr("mx * mx")).alias("sxx"),
        F.sum(F.expr("my * my")).alias("syy"),
    )
    return agg.select(
        key, "n", "sx", "sy",
        F.expr("n * (sxx + syy) - sx * sx - sy * sy").alias("rg2_n2"),
        F.expr(
            "sqrt(cast(n * (sxx + syy) - sx * sx - sy * sy"
            " as double)) / cast(n as double)"
        ).alias("rg"),
    )


def trajectory_entropy(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    zone: str = "zone",
) -> DataFrame:
    """Per-key transition (bigram) entropy of the zone sequence —
    the mobility-predictability screen of Song et al. 2010's
    entropy family, in its computable first-order form: a key
    cycling home<->work scores near 0, a key hopping uniformly over
    z zones scores ~ln(z^2-ish). Bot detection's "too regular /
    too random" dial.

    H = ln(m) - (1/m) sum_b c_b ln(c_b) over bigram counts c_b
    (m = total transitions) — the category_entropy convention:
    each ln(c) quantizes once to the 2^-20 grid so the sum is exact
    int64; the closing chain rounds(9) (ln is INEXACT). Keys with
    zero transitions (single ping) drop. Ties in ``ts`` make the
    sequence ambiguous — feed a unique timestamp or tiebroken order
    column.

    Scale: one lag window on the key + TWO map-side-combined hash
    aggregates ((key, bigram) then key).
    """
    from pdal_spark import sqlgen as G
    from pdal_spark.operators.stats import ENTROPY_Q

    w = Window.partitionBy("__k").orderBy("__ts")
    hops = df.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.col(zone).alias("__z"),
    ).select(
        "__k", "__z",
        F.lag("__z").over(w).alias("__pz"),
    ).where(F.col("__pz").isNotNull())
    cnt = hops.groupBy("__k", "__pz", "__z").agg(
        F.count(F.lit(1)).alias("c")
    )
    lnq = (
        f"cast(floor(ln(cast(c as double))"
        f" * {G.fnum(float(ENTROPY_Q))}"
        f" + {G.fnum(0.5)}) as bigint)"
    )
    mom = cnt.groupBy("__k").agg(
        F.sum("c").alias("m"),
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.expr(f"c * ({lnq})")).alias("clnq"),
    )
    return mom.select(
        F.col("__k").alias(key), "m", "n_bigrams",
        F.expr(
            "round(ln(cast(m as double))"
            " - (cast(clnq as double)"
            f" / {G.fnum(float(ENTROPY_Q))}) / cast(m as double), 9)"
        ).alias("entropy"),
    )


NA_Q = 1 << 30


def nelson_aalen(
    df: DataFrame, duration: str = "dur", event: str = "event"
) -> DataFrame:
    """Nelson-Aalen cumulative hazard with right censoring (Nelson
    1972; Aalen 1978) — kaplan_meier's additive sibling (the hazard
    view: how fast do links rot / sessions die at each age, summed):

        H(t) = sum_{t_i <= t} d_i / n_i

    Risk sets come from ONE descending cumulative window over
    distinct durations (the kaplan_meier plan); each step's rational
    d/n quantizes to (d * q) div n — exact int64, so the cumulative
    sum is order-invariant and H is one closing division. Output one
    row per event time: (t, n_risk, d_events, h_q, h).

    Scale: one groupBy(duration) + two windows over the DISTINCT
    duration table (tiny), never the subject rows.
    """
    per = df.groupBy(F.col(duration).alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("leave"),
        F.sum(F.col(event).cast("long")).alias("d"),
    )
    w_risk = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per.select(
        "t", "d", F.sum("leave").over(w_risk).alias("n_risk")
    )
    stepped = risk.where(F.col("d") > 0).select(
        "t", "n_risk", F.col("d").alias("d_events"),
        F.expr(
            f"(d * cast({NA_Q} as bigint)) div n_risk"
        ).alias("step_q"),
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return stepped.select(
        "t", "n_risk", "d_events",
        F.sum("step_q").over(w_cum).alias("h_q"),
    ).withColumn(
        "h",
        F.expr(f"cast(h_q as double) / cast({NA_Q} as double)"),
    )


def ccf(
    df: DataFrame,
    key: str,
    order: str,
    x: str,
    y: str,
    max_lag: int = 6,
) -> DataFrame:
    """Cross-correlation function terms per key (Box & Jenkins) —
    does x LEAD y by k steps: the lead-lag detector between two
    per-key series (traffic leading errors, crawl volume leading
    discovery), completing :func:`acf`'s auto form.

    The acf discipline exactly: deviations ride the n-scaled
    integer grid (dx_t = n*x_t - sum x), lags come from max_lag
    lead() columns on ONE ordered window pass (never a positions
    self-join):

        num(k) = sum_t dx_t * dy_{t+k}
        den    = sqrt(sum dx^2) * sqrt(sum dy^2)

    num/den integers are exact int64; r_k is one IEEE chain.
    Output: (key, lag in 0..max_lag, num, den_x, den_y, r).

    Scale: one 2-number agg joined back + one window pass + ONE
    hash agg. Bound: n-scaled products under 2^63.
    """
    base = df.select(
        F.col(key).alias("k"), F.col(order).alias("o"),
        F.col(x).cast("long").alias("vx"),
        F.col(y).cast("long").alias("vy"),
    )
    mom = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vx").alias("sx"),
        F.sum("vy").alias("sy"),
    )
    dev = base.join(mom, on="k").select(
        "k", "o",
        (F.col("n") * F.col("vx") - F.col("sx")).alias("dx"),
        (F.col("n") * F.col("vy") - F.col("sy")).alias("dy"),
    )
    w = Window.partitionBy("k").orderBy("o")
    leads = dev.select(
        "k", "dx", "dy",
        *[F.lead("dy", lag).over(w).alias(f"__l{lag}")
          for lag in range(1, int(max_lag) + 1)],
    )
    agg = leads.groupBy("k").agg(
        F.sum(F.expr("dx * dx")).alias("den_x"),
        F.sum(F.expr("dy * dy")).alias("den_y"),
        F.sum(F.expr("dx * dy")).alias("__n0"),
        *[F.sum(F.col("dx") * F.col(f"__l{lag}")).alias(f"__n{lag}")
          for lag in range(1, int(max_lag) + 1)],
    )
    return agg.select(
        F.col("k").alias(key), "den_x", "den_y",
        F.explode(F.array(*[
            F.struct(F.lit(lag).alias("lag"),
                     F.coalesce(F.col(f"__n{lag}"), F.lit(0))
                     .alias("num"))
            for lag in range(0, int(max_lag) + 1)
        ])).alias("t"),
    ).select(
        key, F.col("t.lag").alias("lag"), F.col("t.num").alias("num"),
        "den_x", "den_y",
        F.expr(
            "case when den_x > 0 and den_y > 0 then"
            " cast(num as double)"
            " / (sqrt(cast(den_x as double))"
            " * sqrt(cast(den_y as double))) end"
        ).alias("r"),
    )


def granger_lag1(
    df: DataFrame,
    key: str,
    order: str,
    x: str,
    y: str,
) -> DataFrame:
    """Granger causality test, lag-1 form (Granger 1969) — does
    knowing x_{t-1} improve the prediction of y_t beyond y_{t-1}
    alone: the lead-lag CAUSALITY screen (ccf finds correlation at
    lag; this conditions it on y's own history).

        restricted:   y_t ~ a + b * y_{t-1}          (RSS_r)
        unrestricted: y_t ~ a + b * y_{t-1} + c * x_{t-1}  (RSS_u)
        F = (RSS_r - RSS_u) / (RSS_u / (n - 3))

    All sufficient statistics (n and the 9 cross-moments of
    (y, y1, x1)) are exact int64 off ONE lag window + ONE hash agg;
    the closed-form RSS algebra (centered Gram determinants) runs in
    double over those exact sums — a fixed IEEE chain, hash-exact.
    Keys with n <= 3 or a singular unrestricted Gram emit NULL f.

    Scale: one shuffle on the key (the window) + one hash agg;
    nothing iterates.
    """
    w = Window.partitionBy("k").orderBy("o")
    base = df.select(
        F.col(key).alias("k"), F.col(order).alias("o"),
        F.col(x).cast("long").alias("vx"),
        F.col(y).cast("long").alias("vy"),
    ).select(
        "k", F.col("vy").alias("yt"),
        F.lag("vy").over(w).alias("y1"),
        F.lag("vx").over(w).alias("x1"),
    ).where(F.col("y1").isNotNull() & F.col("x1").isNotNull())
    m = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yt").alias("sy"),
        F.sum("y1").alias("s1"),
        F.sum("x1").alias("s2"),
        F.sum(F.expr("yt * yt")).alias("syy"),
        F.sum(F.expr("y1 * y1")).alias("s11"),
        F.sum(F.expr("x1 * x1")).alias("s22"),
        F.sum(F.expr("yt * y1")).alias("sy1"),
        F.sum(F.expr("yt * x1")).alias("sy2"),
        F.sum(F.expr("y1 * x1")).alias("s12"),
    )
    # centered (n-scaled) second moments: C_ab = n*S_ab - S_a*S_b
    c = (
        "cast(n as double) * cast(s{a}{b} as double)"
        " - cast(s{sa} as double) * cast(s{sb} as double)"
    )
    cyy = c.format(a="y", b="y", sa="y", sb="y")
    c11 = c.format(a="1", b="1", sa="1", sb="1")
    c22 = c.format(a="2", b="2", sa="2", sb="2")
    cy1 = c.format(a="y", b="1", sa="y", sb="1")
    cy2 = c.format(a="y", b="2", sa="y", sb="2")
    c12 = c.format(a="1", b="2", sa="1", sb="2")
    det = f"(({c11}) * ({c22}) - ({c12}) * ({c12}))"
    # restricted RSS (x n^2 scale factors cancel in the F ratio)
    rss_r = (
        f"(({cyy}) - case when ({c11}) > 0 then"
        f" ({cy1}) * ({cy1}) / ({c11}) else 0.0e0 end)"
    )
    # unrestricted via Cramer: b = (C22*Cy1 - C12*Cy2)/det,
    # cc = (C11*Cy2 - C12*Cy1)/det; RSS_u = Cyy - b*Cy1 - cc*Cy2
    rss_u = (
        f"(({cyy})"
        f" - (({c22}) * ({cy1}) - ({c12}) * ({cy2})) / {det}"
        f" * ({cy1})"
        f" - (({c11}) * ({cy2}) - ({c12}) * ({cy1})) / {det}"
        f" * ({cy2}))"
    )
    return m.select(
        F.col("k").alias(key), "n",
        F.expr(
            f"case when n > 3 and {det} <> 0.0e0"
            f" and {rss_u} > 0.0e0 then"
            f" ({rss_r} - {rss_u})"
            f" / ({rss_u} / (cast(n as double) - 3.0e0)) end"
        ).alias("f_stat"),
    )


def lcs_pairs(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    block: str | None = None,
) -> DataFrame:
    """Pairwise longest-common-subsequence length between per-key
    symbol series — the ORDER-PRESERVING overlap measure completing
    the DTW (elastic distance) / Hausdorff (set distance) / edit
    (string) family: template-reuse and rewrite detection where
    shared subsequence, not alignment cost, is the signal.

        dp[i][j] = x_i == y_j ? dp[i-1][j-1] + 1
                              : max(dp[i-1][j], dp[i][j-1])

    over exact int64 symbols — no floats anywhere. Pair space: keys
    sharing ``block`` (a.key < b.key); block=None compares all pairs
    (small key counts only — dtw_distance's guard note).

    Scale: dtw_distance's exact plan — bounded per-key series
    assembled in ONE collect, hash self-join on block, Arrow-batched
    numpy DP per pair.
    """
    import numpy as np

    from pyspark.sql import types as T

    gcols = [F.col(key).alias("k")]
    if block is not None:
        gcols.append(F.col(block).alias("b"))
    ser = (
        df.groupBy(*gcols)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col(order).alias("o"),
                    F.col(value).cast("long").alias("v"),
                ))),
                lambda s: s["v"],
            ).alias("vals")
        )
    )
    a = ser.select(F.col("k").alias("key_a"),
                   F.col("vals").alias("va"),
                   *([F.col("b")] if block is not None else []))
    b = ser.select(F.col("k").alias("key_b"),
                   F.col("vals").alias("vb"),
                   *([F.col("b")] if block is not None else []))
    pairs = a.join(b, on=(["b"] if block is not None else []) or None,
                   how="inner" if block is not None else "cross")
    pairs = pairs.where(F.col("key_a") < F.col("key_b"))

    @F.pandas_udf(T.LongType())
    def _lcs(xa: pd.Series, xb: pd.Series) -> pd.Series:
        import numpy as _np

        out = _np.empty(len(xa), dtype=_np.int64)
        for r, (av, bv) in enumerate(zip(xa, xb)):
            x = _np.asarray(av, dtype=_np.int64)
            y = _np.asarray(bv, dtype=_np.int64)
            m = len(y)
            row = _np.zeros(m + 1, dtype=_np.int64)
            for xi in x:
                prev_diag = 0
                for j in range(1, m + 1):
                    tmp = row[j]
                    if xi == y[j - 1]:
                        row[j] = prev_diag + 1
                    elif row[j - 1] > row[j]:
                        row[j] = row[j - 1]
                    prev_diag = tmp
            out[r] = row[m]
        return pd.Series(out)

    return pairs.select(
        "key_a", "key_b",
        *([F.col("b").alias(block)] if block is not None else []),
        _lcs("va", "vb").alias("lcs"),
    )


def rolling_slope(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    window: int = 8,
) -> DataFrame:
    """Per-row rolling OLS slope over the trailing ``window``
    observations of each key's series — the local-trend monitor
    between ewma_smooth (level) and theil_sen (global robust slope):
    regression of value on the WITHIN-WINDOW position index.

    The five moments accumulate exactly over the frame (order values
    themselves never enter — position is the regressor, so only the
    window COUNT matters):

        slope = (n * Sxy - Sx * Sy) / (n * Sxx - Sx * Sx)

    with x = 0..n-1 inside the frame: Sx = n(n-1)/2 and Sxx =
    n(n-1)(2n-1)/6 are closed-form in the actual frame size; Sxy
    folds as sum of (position-weighted values) via TWO window sums
    (sum of v and sum of running-index * v computed from a
    row_number anchor). Slope is one IEEE chain; frames shorter than
    2 emit NULL.

    Scale: one shuffle on the key + windowed sums, zero joins.
    """
    w_rn = Window.partitionBy("__k").orderBy("__o")
    wf = (
        Window.partitionBy("__k")
        .orderBy("__o")
        .rowsBetween(-(int(window) - 1), Window.currentRow)
    )
    r = df.select(
        F.col(key).alias("__k"),
        F.col(order).alias("__o"),
        F.col(value).cast("long").alias("__v"),
    ).select(
        "__k", "__o", "__v",
        F.row_number().over(w_rn).alias("rn"),
    )
    agg = r.select(
        "__k", "__o", "__v",
        F.count(F.lit(1)).over(wf).alias("n"),
        F.sum("__v").over(wf).alias("sv"),
        F.sum(F.expr("rn * __v")).over(wf).alias("srv"),
        F.max("rn").over(wf).alias("rmax"),
    )
    # positions inside the frame: p = rn - (rmax - n + 1), 0-based;
    # Sxy = srv - (rmax - n + 1) * sv  (exact int64)
    return agg.select(
        F.col("__k").alias(key),
        F.col("__o").alias(order),
        F.col("__v").alias(value),
        "n",
        F.expr("srv - (rmax - n + 1) * sv").alias("sxy"),
        F.expr(
            "case when n >= 2 then"
            " (cast(n as double)"
            " * cast(srv - (rmax - n + 1) * sv as double)"
            " - (cast(n as double) * (cast(n as double) - 1.0e0)"
            " / 2.0e0) * cast(sv as double))"
            " / (cast(n as double)"
            " * (cast(n as double) * (cast(n as double) - 1.0e0)"
            " * (2.0e0 * cast(n as double) - 1.0e0) / 6.0e0)"
            " - (cast(n as double) * (cast(n as double) - 1.0e0)"
            " / 2.0e0) * (cast(n as double)"
            " * (cast(n as double) - 1.0e0) / 2.0e0)) end"
        ).alias("slope"),
    )


def time_weighted_avg(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
) -> DataFrame:
    """Time-weighted average of a step series per key — each
    observation holds until the NEXT one, so the mean weights values
    by how long they persisted (the correct average for sampled
    gauges: queue depth, price, sensor state; the arithmetic mean
    over-counts bursts of updates):

        twa = sum_i v_i * (t_{i+1} - t_i) / (t_last - t_first)

    Durations come from ONE lead window in exact integer
    MICROSECONDS (unix_micros — the epoch_us twin, the repo's
    timestamp convention); the weighted sum is exact int64 and twa
    one IEEE division. The last observation carries no duration
    (nothing to hold until); keys with a single distinct timestamp
    drop. Ties in ts make "next" ambiguous — feed unique timestamps
    or pre-aggregate.

    Scale: one shuffle on the key + ONE hash agg. Bound:
    |v| * span_us < 2^63 per step.
    """
    w = Window.partitionBy("__k").orderBy("__t")
    stepped = df.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("__t"),
        F.col(value).cast("long").alias("__v"),
    ).select(
        "__k", "__t", "__v",
        F.lead("__t").over(w).alias("__tn"),
    )
    agg = stepped.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(
            F.expr("case when __tn is not null"
                   " then __v * (__tn - __t) else 0 end")
        ).alias("vt_sum"),
        F.expr("max(__t) - min(__t)").alias("span_us"),
    ).where(F.col("span_us") > 0)
    return agg.select(
        F.col("__k").alias(key), "n_obs", "vt_sum", "span_us",
        F.expr(
            "cast(vt_sum as double) / cast(span_us as double)"
        ).alias("twa"),
    )


def state_durations(
    df: DataFrame,
    key: str,
    ts: str,
    state: str,
) -> DataFrame:
    """Per-key time-in-state shares over a step series — how long
    each key spent in each state between its transitions (uptime
    ratios, session-phase budgets, crawler status mix); the
    categorical twin of :func:`time_weighted_avg`, and the duration
    view of event_transitions' count view.

    Each observation's state holds until the NEXT observation (exact
    integer microseconds off ONE lead window); the final observation
    is open-ended and carries no duration. share = dur_us / span_us
    is one IEEE division against the key's observed span. Ties in
    ts are ambiguous — feed unique timestamps.

    Scale: one shuffle on the key + ONE (key, state) hash agg + a
    span join-back.
    """
    w = Window.partitionBy("__k").orderBy("__t")
    stepped = df.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("__t"),
        F.col(state).alias("__s"),
    ).select(
        "__k", "__t", "__s",
        F.lead("__t").over(w).alias("__tn"),
    )
    spans = stepped.groupBy("__k").agg(
        F.expr("max(__t) - min(__t)").alias("span_us")
    ).where(F.col("span_us") > 0)
    durs = (
        stepped.where(F.col("__tn").isNotNull())
        .groupBy("__k", "__s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_holds"),
            F.sum(F.expr("__tn - __t")).alias("dur_us"),
        )
    )
    return durs.join(spans, on="__k").select(
        F.col("__k").alias(key),
        F.col("__s").alias(state),
        "n_holds", "dur_us", "span_us",
        F.expr(
            "cast(dur_us as double) / cast(span_us as double)"
        ).alias("share"),
    )


PGRAM_Q = 1_000_000_000


def periodogram(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    freqs: list[int],
    period_n: int,
) -> DataFrame:
    """Discrete-Fourier periodogram power at chosen harmonics per
    key — the frequency-domain period detector next to acf's
    lag-domain view (acf finds "similar k steps apart"; this ranks
    WHICH cycle lengths carry the energy — daily/weekly crawl
    rhythms, bot duty cycles):

        P(k) = (sum_t v_t cos(2 pi k t / N))^2
             + (sum_t v_t sin(2 pi k t / N))^2

    with t = the 0-based position (row_number - 1) over the per-key
    series and N = ``period_n``. Each cos/sin factor quantizes to
    integer nano-units BEFORE the product-sum (the circular_stats /
    spherical_area convention: round(9) first absorbs JVM-vs-libm
    trig ulps, integer accumulation is partitioning-invariant), so
    cq/sq sums are exact int64 and the power is one IEEE chain.

    Output: (key, k, cq_sum, sq_sum, power) with power in
    (value * N)-scaled units — COMPARE ACROSS k, not across keys of
    different lengths. The harmonic column is named ``k`` — pick a
    key column name that does not collide.

    Scale: one rank window on the key + a |freqs| row-local explode
    + ONE hash agg. Bound: |v| * 1e9 * n < 2^63 per key — |v| * n
    under ~9e9.
    """
    import math

    from pdal_spark import sqlgen as G

    qf = G.fnum(float(PGRAM_Q))
    two_pi = G.fnum(2.0 * math.pi)
    w = Window.partitionBy("__k").orderBy("__o")
    base = df.select(
        F.col(key).alias("__k"),
        F.col(order).alias("__o"),
        F.col(value).cast("long").alias("__v"),
    ).select(
        "__k", "__v",
        (F.row_number().over(w) - 1).alias("t"),
    )
    karr = F.array(*[F.lit(int(k)) for k in freqs])
    ang = (
        f"({two_pi} * cast(k as double) * cast(t as double)"
        f" / cast({int(period_n)} as double))"
    )
    cq = (
        f"cast(floor(round(cos({ang}), 9) * {qf}"
        f" + {G.fnum(0.5)}) as bigint)"
    )
    sq = (
        f"cast(floor(round(sin({ang}), 9) * {qf}"
        f" + {G.fnum(0.5)}) as bigint)"
    )
    e = base.select(
        "__k", "__v", "t", F.explode(karr).alias("k")
    )
    agg = e.groupBy("__k", "k").agg(
        F.sum(F.expr(f"__v * ({cq})")).alias("cq_sum"),
        F.sum(F.expr(f"__v * ({sq})")).alias("sq_sum"),
    )
    return agg.select(
        F.col("__k").alias(key),
        F.col("k").cast("long").alias("k"),
        "cq_sum", "sq_sum",
        F.expr(
            f"(cast(cq_sum as double) / {qf})"
            f" * (cast(cq_sum as double) / {qf})"
            f" + (cast(sq_sum as double) / {qf})"
            f" * (cast(sq_sum as double) / {qf})"
        ).alias("power"),
    )


def xmr_chart(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
) -> DataFrame:
    """Individuals / moving-range (XmR) control chart (Shewhart;
    Wheeler's process-behavior chart) — the SPC screen for per-key
    metric streams (crawl latency, error counts): natural process
    limits from the average moving range,

        mR̄  = mean |v_t - v_{t-1}|,  center = mean v
        UNPL/LNPL = center ± 2.66 mR̄

    (2.66 = 3/d2 for n=2). Sums are exact int64 off one lag window
    + one agg; limits and the out-of-limits flag are IEEE chains
    over them. Output: one row per observation with (center_num =
    n-scaled sums carried exact, flag). Keys with < 2 observations
    drop (no moving range).

    Scale: one shuffle on the key (window) + one agg joined back.
    """
    w = Window.partitionBy("__k").orderBy("__o")
    base = df.select(
        F.col(key).alias("__k"),
        F.col(order).alias("__o"),
        F.col(value).cast("long").alias("__v"),
    ).select(
        "__k", "__o", "__v",
        F.abs(F.col("__v") - F.lag("__v").over(w)).alias("mr"),
    )
    agg = base.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__v").alias("sv"),
        F.sum("mr").alias("smr"),
        F.count("mr").cast("long").alias("n_mr"),
    ).where(F.col("n_mr") > 0)
    center = "(cast(sv as double) / cast(n as double))"
    width = (
        "(2.66e0 * cast(smr as double) / cast(n_mr as double))"
    )
    return base.join(agg, on="__k").select(
        F.col("__k").alias(key),
        F.col("__o").alias(order),
        F.col("__v").alias(value),
        "n",
        F.expr(f"{center}").alias("center"),
        F.expr(f"{center} + {width}").alias("unpl"),
        F.expr(f"{center} - {width}").alias("lnpl"),
        F.expr(
            f"cast(__v as double) > {center} + {width}"
            f" or cast(__v as double) < {center} - {width}"
        ).alias("out_of_limits"),
    )


LOGRANK_Q = 1 << 30


def logrank_test(
    df: DataFrame,
    group: str = "grp",
    duration: str = "dur",
    event: str = "event",
) -> DataFrame:
    """Two-group log-rank test (Mantel 1966; Peto) — do two survival
    curves differ: the inference companion of kaplan_meier /
    nelson_aalen (does cohort A's content rot faster than B's,
    censoring-aware where a t-test on durations is not). Groups must
    be exactly two (enforced loudly).

    At each distinct event time t (pooled deaths d_t, group-1 deaths
    d1_t, at-risk n1_t / n_t):

        O - E = sum d1_t - sum d_t n1_t / n_t
        V     = sum d_t (n1/n)(n2/n)(n - d)/(n - 1)
        chi2  = (O - E)^2 / V

    At-risk sets come from per-group descending cumulative windows
    over the DENSE (time x group) lattice (a group absent at a time
    still has a risk count). E terms quantize exactly ((d * n1 * q)
    div n); each V term is a deterministic <= d/4-bounded IEEE
    double quantized 2^-30 before the sum (the brier-resolution
    convention); chi2 is one closing chain, NULL when V = 0.

    Output: one row (n1, n2, o1, e1_q, v_q, chi2).

    Scale: one groupBy(duration, group) + two windows over the
    distinct-time lattice (tiny) + one fold — subjects never join.
    """
    q = LOGRANK_Q
    base = df.select(
        F.col(group).alias("__g"),
        F.col(duration).cast("long").alias("t"),
        F.col(event).cast("long").alias("e"),
    )
    gs = [r[0] for r in base.select("__g").distinct().collect()]
    if len(gs) != 2:
        raise ValueError(
            f"logrank_test requires exactly 2 groups (saw {len(gs)})"
        )
    g1 = sorted(gs, key=str)[0]
    per = base.groupBy("t", "__g").agg(
        F.count(F.lit(1)).cast("long").alias("leave"),
        F.sum("e").alias("d"),
    )
    times = per.select("t").distinct()
    groups = per.sparkSession.createDataFrame(
        [(g,) for g in gs],
        f"__g {per.schema['__g'].dataType.simpleString()}",
    )
    dense = (
        times.crossJoin(groups)
        .join(per, on=["t", "__g"], how="left")
        .select(
            "t", "__g",
            F.coalesce("leave", F.lit(0)).alias("leave"),
            F.coalesce("d", F.lit(0)).alias("d"),
        )
    )
    w_risk = (
        Window.partitionBy("__g")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risked = dense.select(
        "t", "__g", "d",
        F.sum("leave").over(w_risk).alias("n_g"),
    )
    piv = risked.groupBy("t").agg(
        F.sum(
            F.when(F.col("__g") == g1, F.col("n_g")).otherwise(0)
        ).alias("n1"),
        F.sum(
            F.when(F.col("__g") != g1, F.col("n_g")).otherwise(0)
        ).alias("n2"),
        F.sum(
            F.when(F.col("__g") == g1, F.col("d")).otherwise(0)
        ).alias("d1"),
        F.sum("d").alias("dt"),
    ).where(F.col("dt") > 0)
    vterm = (
        "(cast(dt as double) * cast(n1 as double)"
        " * cast(n2 as double)"
        " * (cast(n1 + n2 as double) - cast(dt as double))"
        " / (cast(n1 + n2 as double) * cast(n1 + n2 as double)"
        " * (cast(n1 + n2 as double) - 1.0e0)))"
    )
    agg = piv.agg(
        F.sum("d1").alias("o1"),
        F.sum(
            F.expr(f"(dt * n1 * cast({q} as bigint)) div (n1 + n2)")
        ).alias("e1_q"),
        F.sum(
            F.expr(
                "case when n1 + n2 > 1 then"
                f" cast(floor({vterm} * cast({q} as double)"
                " + 0.5e0) as bigint) else 0 end"
            )
        ).alias("v_q"),
    )
    tot = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    n1t = tot.where(F.col("__g") == g1).select(
        F.col("n").alias("n1")
    )
    n2t = tot.where(F.col("__g") != g1).select(
        F.col("n").alias("n2")
    )
    return (
        n1t.crossJoin(n2t)
        .crossJoin(F.broadcast(agg))
        .select(
            "n1", "n2", "o1", "e1_q", "v_q",
            F.expr(
                "case when v_q > 0 then"
                f" (cast(o1 as double)"
                f" - cast(e1_q as double) / cast({q} as double))"
                f" * (cast(o1 as double)"
                f" - cast(e1_q as double) / cast({q} as double))"
                f" / (cast(v_q as double) / cast({q} as double))"
                " end"
            ).alias("chi2"),
        )
    )


def durbin_watson(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
) -> DataFrame:
    """Durbin-Watson first-order autocorrelation diagnostic per key
    (Durbin & Watson 1950) on the mean-centered series — acf's
    residual-whiteness companion (DW ~ 2(1 - r1); < 2 positive, > 2
    negative serial correlation). Same n-scaled integer deviation
    grid d_t = n*x_t - sum(x) (the n^2 factors cancel):

        dw = sum_{t>=2} (d_t - d_{t-1})^2 / sum d_t^2

    Exact int64 folds + ONE IEEE division. Bound: (2 n xmax)^2 * n
    < 2^63 — keep n * xmax under ~1e9 per key.

    Scale: one per-key ordered window (lag 1) + ONE hash agg —
    identical plan family to acf.
    """
    base = df.select(
        F.col(key).alias("k"), F.col(order).alias("o"),
        F.col(value).cast("long").alias("v"),
    )
    mom = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sx")
    )
    dev = base.join(mom, on="k").select(
        "k", "o", "n",
        (F.col("n") * F.col("v") - F.col("sx")).alias("d"),
    )
    w = Window.partitionBy("k").orderBy("o")
    lagd = dev.select(
        "k", "n", "d", F.lag("d", 1).over(w).alias("__p")
    )
    agg = lagd.groupBy("k").agg(
        F.max("n").alias("n"),
        F.sum(F.expr("d * d")).alias("den"),
        F.sum(
            F.expr(
                "case when __p is not null"
                " then (d - __p) * (d - __p) end"
            )
        ).alias("num"),
    )
    return agg.select(
        "k", "n", "num", "den",
        F.expr(
            "case when den > 0 then"
            " cast(num as double) / cast(den as double) end"
        ).alias("dw"),
    )


def ljung_box(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
) -> DataFrame:
    """Ljung-Box portmanteau white-noise statistic per key (Ljung &
    Box 1978) at fixed lag h = 3 — the aggregate form of acf's
    per-lag terms (the monitoring gate: is the residual stream
    autocorrelated AT ALL?):

        Q = n (n+2) * sum_{j=1..3} (c_j/c_0)^2 / (n - j)

    c_j = sum d_t d_{t-j} on the n-scaled integer deviation grid
    (scale factors cancel in every ratio). The c_j are exact int64;
    Q is one fixed IEEE chain (NULL when n <= 3 or c_0 = 0).

    Scale: one per-key ordered window pass (3 lag columns) + ONE
    hash agg — the acf plan with a folded final expression.
    """
    base = df.select(
        F.col(key).alias("k"), F.col(order).alias("o"),
        F.col(value).cast("long").alias("v"),
    )
    mom = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sx")
    )
    dev = base.join(mom, on="k").select(
        "k", "o", "n",
        (F.col("n") * F.col("v") - F.col("sx")).alias("d"),
    )
    w = Window.partitionBy("k").orderBy("o")
    lags = dev.select(
        "k", "n", "d",
        *[F.lag("d", j).over(w).alias(f"__p{j}") for j in (1, 2, 3)],
    )
    agg = lags.groupBy("k").agg(
        F.max("n").alias("n"),
        F.sum(F.expr("d * d")).alias("c0"),
        *[
            F.sum(
                F.expr(
                    f"case when __p{j} is not null"
                    f" then d * __p{j} end"
                )
            ).alias(f"c{j}")
            for j in (1, 2, 3)
        ],
    )
    nf = "cast(n as double)"
    term = (
        "(cast(c{j} as double) / cast(c0 as double))"
        " * (cast(c{j} as double) / cast(c0 as double))"
        " / ({nf} - {jf})"
    )
    q = (
        f"({nf} * ({nf} + 2.0e0) * ("
        + " + ".join(
            term.format(j=j, nf=nf, jf=f"{float(j)!r}e0")
            for j in (1, 2, 3)
        )
        + "))"
    )
    return agg.select(
        "k", "n", "c0", "c1", "c2", "c3",
        F.expr(
            f"case when n > 3 and c0 > 0 then {q} end"
        ).alias("q_lb"),
    )


def pacf2(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
) -> DataFrame:
    """Partial autocorrelation at lags 1-2 per key via the level-2
    Durbin-Levinson recursion closed form — acf's conditional
    counterpart (phi22 is the lag-2 effect AFTER removing the lag-1
    channel; the AR-order selector):

        phi11 = r1 = c1/c0
        phi22 = (r2 - r1^2) / (1 - r1^2)

    c_j exact int64 on the shared n-scaled deviation grid; both
    outputs are fixed IEEE chains (phi22 NULL when |r1| = 1).

    Scale: identical single-window plan to ljung_box.
    """
    base = df.select(
        F.col(key).alias("k"), F.col(order).alias("o"),
        F.col(value).cast("long").alias("v"),
    )
    mom = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sx")
    )
    dev = base.join(mom, on="k").select(
        "k", "o", "n",
        (F.col("n") * F.col("v") - F.col("sx")).alias("d"),
    )
    w = Window.partitionBy("k").orderBy("o")
    lags = dev.select(
        "k", "n", "d",
        *[F.lag("d", j).over(w).alias(f"__p{j}") for j in (1, 2)],
    )
    agg = lags.groupBy("k").agg(
        F.max("n").alias("n"),
        F.sum(F.expr("d * d")).alias("c0"),
        *[
            F.sum(
                F.expr(
                    f"case when __p{j} is not null"
                    f" then d * __p{j} end"
                )
            ).alias(f"c{j}")
            for j in (1, 2)
        ],
    )
    r1 = "(cast(c1 as double) / cast(c0 as double))"
    r2 = "(cast(c2 as double) / cast(c0 as double))"
    return agg.select(
        "k", "n", "c0", "c1", "c2",
        F.expr(
            f"case when c0 > 0 then {r1} end"
        ).alias("phi11"),
        F.expr(
            f"case when c0 > 0 and 1.0e0 - {r1} * {r1} <> 0.0e0"
            f" then ({r2} - {r1} * {r1})"
            f" / (1.0e0 - {r1} * {r1}) end"
        ).alias("phi22"),
    )


MER_Q = 1 << 10


def markov_entropy_rate(
    df: DataFrame,
    key: str,
    order: str,
    state: str,
) -> DataFrame:
    """Empirical first-order Markov entropy rate of a state stream
    (Shannon): over per-key consecutive transitions s -> t,

        H = sum_st (c_st / N) * ln(c_s / c_st)    [nats]

    — the predictability ceiling of the sequence (event_transitions'
    information-theoretic summary; trajectory_entropy's sequence
    sibling). Each transition's ln(c_s/c_st) quantizes to the 2^-10
    grid (the zipf_fit convention — ln of an IEEE-exact ratio of
    counts), so the accumulation sum(c_st * lnq) is exact int64 and
    H is one division by N * Q. Output one row: (n_transitions,
    n_states, h_q_sum, h).

    Scale: one per-key ordered window (lead) + TWO hash aggs —
    never materializes the chain matrix wider than observed pairs.
    """
    w = Window.partitionBy("k").orderBy("o")
    tr = (
        df.select(
            F.col(key).alias("k"), F.col(order).alias("o"),
            F.col(state).alias("s"),
        )
        .withColumn("t", F.lead("s", 1).over(w))
        .where(F.col("t").isNotNull())
    )
    cst = tr.groupBy("s", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c_st")
    )
    cs = cst.groupBy("s").agg(F.sum("c_st").alias("c_s"))
    q = float(MER_Q)
    terms = cst.join(cs, on="s").select(
        "c_st",
        F.expr(
            "cast(floor(ln(cast(c_s as double)"
            " / cast(c_st as double))"
            f" * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("lnq"),
    )
    agg = terms.agg(
        F.sum("c_st").alias("n_transitions"),
        F.sum(F.expr("c_st * lnq")).alias("h_q_sum"),
    )
    ns = cst.select("s").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_states")
    )
    return agg.crossJoin(F.broadcast(ns)).select(
        "n_transitions", "n_states", "h_q_sum",
        F.expr(
            "case when n_transitions > 0 then"
            " cast(h_q_sum as double)"
            f" / (cast(n_transitions as double) * {q!r}e0) end"
        ).alias("h"),
    )


def allan_variance(
    df: DataFrame,
    order: str,
    value: str,
    taus: list[int] | None = None,
) -> DataFrame:
    """Non-overlapped Allan variance ladder (Allan 1966) — the
    clock/sensor-stability profile (which averaging window minimizes
    drift?), xmr_chart's multi-scale sibling. Per averaging window
    tau: bin the ordered series into complete tau-sized bins with
    integer sums S_i, then

        avar(tau) = sum_i (S_{i+1} - S_i)^2 / (2 (m-1) tau^2)

    (bin MEANS differenced — the tau^2 clears the /tau exactly).
    Integer throughout except the one final division. Output per
    tau: (tau, m_bins, sum_sq, avar). Bound: (2 tau xmax)^2 * m
    < 2^63.

    Scale: ONE global sort-window for positions, then per-tau work
    is a hash agg + a tau-partitioned lag — the ladder explodes
    len(taus) rows per input row, nothing quadratic.
    """
    tl = [int(t) for t in (taus or [4, 16, 64])]
    w = Window.orderBy(F.col("o").asc())
    base = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long") - 1)
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
    )
    ladder = base.select(
        "v", "rn", "n",
        F.explode(F.array(*[F.lit(t) for t in tl])).alias("tau"),
    ).where(
        # keep only complete bins
        F.expr("rn < (n div tau) * tau")
    )
    bins = ladder.groupBy("tau", F.expr("rn div tau").alias("b")) \
        .agg(F.sum("v").alias("s_i"))
    wt = Window.partitionBy("tau").orderBy("b")
    diffs = bins.withColumn("prev", F.lag("s_i", 1).over(wt)) \
        .where(F.col("prev").isNotNull())
    agg = diffs.groupBy("tau").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("m_bins"),
        F.sum(
            F.expr("(s_i - prev) * (s_i - prev)")
        ).alias("sum_sq"),
    )
    return agg.select(
        F.col("tau").cast("long").alias("tau"),
        "m_bins", "sum_sq",
        F.expr(
            "case when m_bins > 1 then cast(sum_sq as double)"
            " / (2.0e0 * (cast(m_bins as double) - 1.0e0)"
            " * cast(tau as double) * cast(tau as double)) end"
        ).alias("avar"),
    )


HURST_Q = 1 << 20


def hurst_rs(
    df: DataFrame,
    order: str,
    value: str,
    sizes: list[int] | None = None,
) -> DataFrame:
    """Rescaled-range (R/S) statistics ladder (Hurst 1951;
    Mandelbrot & Wallis 1969) — the long-memory profile: per block
    size m, split the ordered series into complete m-blocks and
    compute each block's range-of-cumulative-deviations over its
    standard deviation. ln(mean R/S) vs ln(m) slopes at the Hurst
    exponent (H > 0.5 persistent, < 0.5 anti-persistent).

    Exactness: with block sums S, SS and within-block prefix P_j,
    the m-scaled cumulative deviation m*P_j - j*S is exact int64,
    R_int = max - min of it, and

        R/S = R_int / sqrt(m*SS - S^2)

    — one IEEE division over one correctly-rounded sqrt, so
    floor(R/S * 2^20 + 0.5) is engine-invariant; per-m sums of that
    quantized ratio are exact int64 (order-invariant). Zero-variance
    blocks are skipped (counted out of n_blocks). Output per m:
    (m, n_blocks, sum_rs_q, mean_rs).

    Scale: one global sort-window for positions, then all work is
    (m, block)-partitioned windows + hash aggs — block count, not
    pair count.
    """
    sz = [int(s) for s in (sizes or [125, 625])]
    q = float(HURST_Q)
    w = Window.orderBy(F.col("o").asc())
    base = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long") - 1)
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
    )
    ladder = base.select(
        "v", "rn",
        F.explode(F.array(*[F.lit(s) for s in sz])).alias("m"),
        "n",
    ).where(F.expr("rn < (n div m) * m")).select(
        "v", "m",
        F.expr("rn div m").alias("b"),
        F.expr("rn % m + 1").alias("j"),
        "rn",
    )
    wb = Window.partitionBy("m", "b")
    wo = wb.orderBy(F.col("rn").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dev = (
        ladder.withColumn("p", F.sum("v").over(wo))
        .withColumn("s_b", F.sum("v").over(wb))
        .withColumn("ss_b", F.sum(F.expr("v * v")).over(wb))
        .select(
            "m", "b",
            F.expr("m * p - j * s_b").alias("cum"),
            F.expr("m * ss_b - s_b * s_b").alias("den"),
        )
    )
    blocks = dev.groupBy("m", "b").agg(
        (F.max("cum") - F.min("cum")).alias("r_int"),
        F.max("den").alias("den"),
    ).where(F.col("den") > 0)
    agg = blocks.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(
            F.expr(
                "cast(floor(cast(r_int as double)"
                " / sqrt(cast(den as double))"
                f" * {q!r}e0 + 0.5e0) as bigint)"
            )
        ).alias("sum_rs_q"),
    )
    return agg.select(
        F.col("m").cast("long").alias("m"), "n_blocks", "sum_rs_q",
        F.expr(
            "cast(sum_rs_q as double)"
            f" / (cast(n_blocks as double) * {q!r}e0)"
        ).alias("mean_rs"),
    )


ATTR_Q = 1 << 20


def attribution_shares(
    df: DataFrame,
    user: str,
    order: str,
    channel: str,
) -> DataFrame:
    """Multi-touch attribution under the three classical position
    models at once (the marketing-science counterpart of funnel /
    top_session_paths): per user journey (events ordered by
    `order`), credit each touch's channel with

      first_touch:  1 to the first touch
      last_touch:   1 to the last touch
      linear:       ATTR_Q div len to every touch (fixed-point)
      position:     40/20/40 U-shape — len 1: Q; len 2: Q div 2
                    each; else (2Q) div 5 to first and last,
                    (Q div 5) div (len-2) to each middle

    Truncating integer division keeps every credit exact int64
    (order-invariant channel folds). Output per channel:
    (channel, n_first, n_last, linear_q, position_q).

    Scale: one per-user ordered window + ONE channel hash agg.
    """
    q = ATTR_Q
    w = Window.partitionBy("u").orderBy(F.col("o").asc())
    wall = Window.partitionBy("u")
    t = (
        df.select(
            F.col(user).alias("u"), F.col(order).alias("o"),
            F.col(channel).alias("ch"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("len", F.count(F.lit(1)).over(wall))
    )
    pos = (
        f"case when len = 1 then cast({q} as bigint)"
        f" when len = 2 then cast({q} as bigint) div 2"
        f" when rn = 1 or rn = len then (2 * cast({q} as bigint))"
        " div 5"
        f" else (cast({q} as bigint) div 5) div (len - 2) end"
    )
    credited = t.select(
        "ch",
        F.expr("case when rn = 1 then 1 else 0 end")
        .alias("is_first"),
        F.expr("case when rn = len then 1 else 0 end")
        .alias("is_last"),
        F.expr(f"cast({q} as bigint) div len").alias("lin_q"),
        F.expr(pos).alias("pos_q"),
    )
    return credited.groupBy("ch").agg(
        F.sum("is_first").cast("long").alias("n_first"),
        F.sum("is_last").cast("long").alias("n_last"),
        F.sum("lin_q").alias("linear_q"),
        F.sum("pos_q").alias("position_q"),
    )


def time_decay_attribution(
    df: DataFrame,
    user: str,
    order: str,
    channel: str,
    halflife: int,
) -> DataFrame:
    """Time-decay multi-touch attribution: a touch's weight halves
    every `halflife` units of distance from the journey's LAST
    touch — w_i = ATTR_Q >> min((t_last - t_i) div halflife, 40),
    exact int64 (power-of-two decay instead of a float exponential:
    same shape, engine-invariant). Per-journey normalized credit
    quantizes as (w_i * ATTR_Q) div W_path, then folds per channel.
    Output per channel: (channel, w_raw, share_q).

    Scale: one per-user window pair (max-t + sum-w) + ONE channel
    agg.
    """
    q = ATTR_Q
    wall = Window.partitionBy("u")
    t = (
        df.select(
            F.col(user).alias("u"),
            F.col(order).cast("long").alias("o"),
            F.col(channel).alias("ch"),
        )
        .withColumn("t_last", F.max("o").over(wall))
        .withColumn(
            "wgt",
            F.expr(
                f"shiftright(cast({q} as bigint),"
                f" cast(least((t_last - o) div {int(halflife)},"
                " 40) as int))"
            ),
        )
        .withColumn("w_path", F.sum("wgt").over(wall))
    )
    return (
        t.select(
            "ch", "wgt",
            F.expr(
                f"(wgt * cast({q} as bigint)) div w_path"
            ).alias("sh"),
        )
        .groupBy("ch")
        .agg(
            F.sum("wgt").alias("w_raw"),
            F.sum("sh").alias("share_q"),
        )
    )


def competing_risks(
    df: DataFrame,
    duration: str,
    event: str,
) -> DataFrame:
    """Aalen-Johansen cumulative incidence under two competing
    risks (event = 0 censored, 1 or 2 = cause) — kaplan_meier's
    multi-cause refinement (1 - KM overstates each cause's
    incidence when the other competes):

        CIF_k(t) = sum_{s <= t} S(s-) * d_k(s) / n(s)

    with S(s-) the all-cause KM survival just before s, carried in
    kaplan_meier's ln-quantized integer form (cum sums of
    floor(round(ln(1 - d/n), 9) * 1e9 + 0.5)); each increment
    re-quantizes to the same 1e-9 grid so the cumulative CIF is an
    exact int64 window sum, rounded to 6dp at the end. Times where
    d = n_risk (terminal all-fail) are dropped, matching
    kaplan_meier. Output per event time: (t, n_risk, d1, d2,
    cif1_r, cif2_r).

    Scale: ONE groupBy(duration) + two ordered windows over the
    DISTINCT event times — never over rows.
    """
    base = df.select(
        F.col(duration).cast("long").alias("t"),
        F.col(event).cast("int").alias("e"),
    )
    per_t = base.groupBy("t").agg(
        F.count(F.lit(1)).alias("leave"),
        F.sum(F.expr("case when e = 1 then 1 else 0 end"))
        .alias("d1"),
        F.sum(F.expr("case when e = 2 then 1 else 0 end"))
        .alias("d2"),
    ).withColumn("d", F.col("d1") + F.col("d2"))
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.withColumn("n_risk", F.sum("leave").over(w_desc))
    ev = risk.where(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk"))
    )
    term = (
        "cast(floor(round(ln(1.0e0 - cast(d as double)"
        " / cast(n_risk as double)), 9)"
        " * 1.0e9 + 0.5e0) as bigint)"
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        ev.withColumn("lt", F.expr(term))
        .withColumn("cum", F.sum("lt").over(w_asc))
        .withColumn("cum_prev", F.col("cum") - F.col("lt"))
    )

    def inc(dk: str) -> str:
        return (
            "cast(floor(round("
            "exp(cast(cum_prev as double) / 1.0e9)"
            f" * cast({dk} as double) / cast(n_risk as double), 9)"
            " * 1.0e9 + 0.5e0) as bigint)"
        )

    stepped = (
        cum.withColumn("i1", F.expr(inc("d1")))
        .withColumn("i2", F.expr(inc("d2")))
        .withColumn("c1", F.sum("i1").over(w_asc))
        .withColumn("c2", F.sum("i2").over(w_asc))
    )
    return stepped.select(
        "t", "n_risk", "d1", "d2",
        F.expr("round(cast(c1 as double) / 1.0e9, 6)")
        .alias("cif1_r"),
        F.expr("round(cast(c2 as double) / 1.0e9, 6)")
        .alias("cif2_r"),
    ).orderBy("t")


def interval_coverage(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
) -> DataFrame:
    """Merged-interval coverage per key (the union-of-intervals
    summary behind uptime/SLA math, sensor-coverage QA, and
    scan-range planning — interval_join's aggregating sibling):
    overlapping or touching [start, end] intervals merge into
    islands; per key report

        n_intervals, n_islands, covered = sum island lengths,
        span = max(end) - min(start)

    Classic gaps-and-islands: one ordered lag-max window flags
    island starts (start > running max of PRIOR ends), a running
    sum numbers islands, two hash aggs fold. Exact int64.
    """
    base = df.select(
        F.col(key).alias("k"),
        F.col(start).cast("long").alias("s"),
        F.col(end).cast("long").alias("e"),
    )
    w = Window.partitionBy("k").orderBy(
        F.col("s").asc(), F.col("e").asc()
    )
    prev = base.withColumn(
        "pmax",
        F.max("e").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).withColumn(
        "new_island",
        F.expr(
            "case when pmax is null or s > pmax then 1 else 0 end"
        ),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding,
                          Window.currentRow)
        ),
    )
    islands = prev.groupBy("k", "island").agg(
        F.min("s").alias("is_s"),
        F.max("e").alias("is_e"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return islands.groupBy("k").agg(
        F.sum("n_iv").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.expr("is_e - is_s")).alias("covered"),
        (F.max("is_e") - F.min("is_s")).alias("span"),
    )


MP_ENC = 1 << 20


def matrix_profile(
    df: DataFrame,
    order: str,
    value: str,
    w: int = 8,
) -> DataFrame:
    """Matrix profile (Yeh et al. 2016) under the exact squared
    Euclidean distance: for every length-w subsequence, the
    distance to its nearest NON-TRIVIAL match (gap >= w — the
    standard exclusion zone) and that match's position. THE motif /
    discord detector: low profile = repeated pattern, high =
    anomaly. Integer values keep every d2 exact; the argmin encodes
    as d2 * 2^20 + j so one min() resolves (nearest, smallest-j
    tie) at once. Output: (i, mp_d2, mp_j).

    O(n^2) subsequence pairs — the ORACLE-EXACT small-n path
    (filter first, like kendall_tau); production-scale series
    should window per key/day first. Bound: d2 < 2^43 (w * dv^2).
    """
    ww = int(w)
    wo = Window.orderBy(F.col("o").asc())
    sub = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("i", F.row_number().over(wo).cast("long"))
        .withColumn(
            "vec",
            F.collect_list("v").over(
                wo.rowsBetween(Window.currentRow, ww - 1)
            ),
        )
        .where(F.size("vec") == ww)
        .select("i", "vec")
    )
    a = sub.select(F.col("i").alias("ia"), F.col("vec").alias("va"))
    b = sub.select(F.col("i").alias("ib"), F.col("vec").alias("vb"))
    pairs = a.join(b, F.col("ib") >= F.col("ia") + ww).select(
        "ia", "ib",
        F.expr(
            "aggregate(zip_with(va, vb, (x, y) ->"
            " (x - y) * (x - y)), cast(0 as bigint),"
            " (acc, d) -> acc + d)"
        ).alias("d2"),
    )
    both = pairs.select(
        F.col("ia").alias("i"),
        F.expr(f"d2 * cast({MP_ENC} as bigint) + ib").alias("enc"),
    ).unionByName(
        pairs.select(
            F.col("ib").alias("i"),
            F.expr(f"d2 * cast({MP_ENC} as bigint) + ia")
            .alias("enc"),
        )
    )
    prof = both.groupBy("i").agg(F.min("enc").alias("mn"))
    return prof.select(
        "i",
        F.expr(f"mn div cast({MP_ENC} as bigint)").alias("mp_d2"),
        F.expr(f"mn % cast({MP_ENC} as bigint)").alias("mp_j"),
    )


BS_Q = 1 << 16


def binseg_split(
    df: DataFrame,
    order: str,
    value: str,
) -> DataFrame:
    """Single best variance-reducing split (one step of binary
    segmentation — cusum_changepoint's least-squares sibling):
    choose t minimizing within-segment sum of squares

        cost(t) = [SS_l - S_l^2/t] + [SS_r - S_r^2/(n-t)]

    Each side's rational quantizes by the split-division trick
    (Q = 2^16, exact int64), the argmin resolves in two
    deterministic folds (min cost, then min t at that cost).
    Output one row: (n, t_star, cost_q, mean_l, mean_r).

    Scale: one ordered prefix window + TWO tiny folds — the ks_test
    plan shape; nothing quadratic.
    """
    q = BS_Q
    wo = Window.orderBy(F.col("o").asc())
    run = wo.rowsBetween(Window.unboundedPreceding,
                         Window.currentRow)
    base = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("t", F.row_number().over(wo).cast("long"))
        .withColumn("p", F.sum("v").over(run))
        .withColumn("pp", F.sum(F.expr("v * v")).over(run))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
        .withColumn("s_all", F.sum("v").over(
            Window.partitionBy()))
        .withColumn("ss_all", F.sum(F.expr("v * v")).over(
            Window.partitionBy()))
    )

    def _qdiv(d: str, nn: str) -> str:
        return (
            f"(({d}) div ({nn})) * cast({q} as bigint)"
            f" + ((({d}) % ({nn})) * cast({q} as bigint))"
            f" div ({nn})"
        )

    cand = base.where(F.col("t") < F.col("n")).select(
        "t", "p", "n", "s_all",
        (
            F.expr(f"pp * cast({q} as bigint)")
            - F.expr(_qdiv("p * p", "t"))
            + F.expr(f"(ss_all - pp) * cast({q} as bigint)")
            - F.expr(_qdiv("(s_all - p) * (s_all - p)", "n - t"))
        ).alias("cost_q"),
    )
    mn = cand.agg(F.min("cost_q").alias("mc"))
    best = (
        cand.crossJoin(F.broadcast(mn))
        .where(F.col("cost_q") == F.col("mc"))
        .groupBy("n", "mc")
        .agg(F.min("t").alias("t_star"))
    )
    at = cand.select(
        F.col("t").alias("t_star"), "p",
        F.col("s_all").alias("s2"),
    )
    return best.join(at, on="t_star").select(
        "n", "t_star", F.col("mc").alias("cost_q"),
        F.expr(
            "cast(p as double) / cast(t_star as double)"
        ).alias("mean_l"),
        F.expr(
            "cast(s2 - p as double)"
            " / cast(n - t_star as double)"
        ).alias("mean_r"),
    )


def cox_stuart(
    df: DataFrame,
    order: str,
    value: str,
) -> DataFrame:
    """Cox-Stuart sign trend test (1955) — mann_kendall's cheap
    sibling (pairs each point with its half-series partner instead
    of all later points; O(n) vs O(n^2) information tradeoff):
    drop the middle element when n is odd, pair x_i with
    x_{i + n/2}, and count sign(x_{i+h} - x_i):

        s_plus (rises), s_minus (falls); ties dropped.

    Under no trend s_plus ~ Binomial(m, 1/2); the z-score with
    continuity correction is the caller's readout — emitted here
    as one IEEE chain. Output: (n, m_pairs, s_plus, s_minus, z).

    Scale: one rank window + ONE self-join on the offset rank +
    one fold.
    """
    w = Window.orderBy(F.col("o").asc())
    base = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
    )
    # offset = ceil(n/2): n odd drops the middle element
    h = base.select(
        "rn", "v", "n", F.expr("n - n div 2").alias("h")
    )
    first = h.where(F.col("rn") <= F.expr("n div 2")).select(
        F.col("rn").alias("i"), F.col("v").alias("va"), "n"
    )
    second = h.select(
        (F.col("rn") - F.col("h")).alias("i"),
        F.col("v").alias("vb"),
        F.col("rn").alias("rb"), F.col("h").alias("h2"),
    ).where(F.col("rb") > F.col("h"))
    pairs = first.join(second, on="i")
    agg = pairs.agg(
        F.max("n").alias("n"),
        F.sum(F.expr("case when vb > va then 1 else 0 end"))
        .cast("long").alias("s_plus"),
        F.sum(F.expr("case when vb < va then 1 else 0 end"))
        .cast("long").alias("s_minus"),
    ).withColumn("m_pairs", F.expr("s_plus + s_minus"))
    return agg.select(
        "n", "m_pairs", "s_plus", "s_minus",
        F.expr(
            "case when m_pairs > 0 then"
            " (2.0e0 * cast(s_plus as double)"
            " - cast(m_pairs as double))"
            " / sqrt(cast(m_pairs as double)) end"
        ).alias("z"),
    )


def turning_points(
    df: DataFrame,
    order: str,
    value: str,
) -> DataFrame:
    """Turning-point test of randomness (Kendall 1976) — runs_test's
    local-extremum twin: count interior points that are strict
    local maxima or minima; an i.i.d. series expects 2(n-2)/3 with
    variance (16n - 29)/90. Tied neighbors yield no turning point
    (strict inequalities — deterministic). Output: (n, n_turns, z).

    Scale: one lag/lead window + ONE fold.
    """
    w = Window.orderBy(F.col("o").asc())
    base = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("pv", F.lag("v", 1).over(w))
        .withColumn("nv", F.lead("v", 1).over(w))
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr(
                "case when pv is not null and nv is not null and"
                " ((v > pv and v > nv) or (v < pv and v < nv))"
                " then 1 else 0 end"
            )
        ).cast("long").alias("n_turns"),
    )
    mean = "(2.0e0 * (cast(n as double) - 2.0e0) / 3.0e0)"
    var = "((16.0e0 * cast(n as double) - 29.0e0) / 90.0e0)"
    return agg.select(
        "n", "n_turns",
        F.expr(
            f"case when n > 3 then (cast(n_turns as double)"
            f" - {mean}) / sqrt({var}) end"
        ).alias("z"),
    )


def g_chart(
    df: DataFrame,
    order: str,
    event: str,
) -> DataFrame:
    """g-chart: geometric control of counts BETWEEN rare events
    (Benneyan 2001 — infections between surgeries, crashes between
    releases; the rare-event complement of xmr_chart): the ordered
    stream's event positions define gaps g_i = opportunities since
    the previous event; with mean gap gbar the geometric 3-sigma
    upper limit is

        ucl = gbar + 3 sqrt(gbar (gbar + 1))

    Output per event (except the first): (o, gap) plus the chart
    constants on every row (n_events, sum_gap, ucl, flag) — exact
    integer gaps, IEEE chains for the limits.

    Scale: one filter + one rank window over EVENTS only + one
    broadcast fold.
    """
    w = Window.orderBy(F.col("o").asc())
    pos = (
        df.select(
            F.col(order).alias("o"),
            F.col(event).cast("int").alias("ev"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("ev") == 1)
    )
    we = Window.orderBy(F.col("rn").asc())
    gaps = (
        pos.withColumn("prev", F.lag("rn", 1).over(we))
        .where(F.col("prev").isNotNull())
        .select("o", (F.col("rn") - F.col("prev") - 1).alias("gap"))
    )
    mom = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("gap").alias("sum_gap"),
    )
    gbar = "(cast(sum_gap as double) / cast(n_events as double))"
    ucl = f"({gbar} + 3.0e0 * sqrt({gbar} * ({gbar} + 1.0e0)))"
    j = gaps.crossJoin(F.broadcast(mom))
    return j.select(
        "o", "gap", "n_events", "sum_gap",
        F.expr(
            f"case when n_events > 0 then {ucl} end"
        ).alias("ucl"),
        F.expr(
            f"cast(case when n_events > 0 and"
            f" cast(gap as double) > {ucl} then 1 else 0 end"
            " as int)"
        ).alias("flag"),
    )


PH_Q = 1 << 20


def page_hinkley(
    df: DataFrame,
    order: str,
    value: str,
    delta_q: int = 0,
) -> DataFrame:
    """Page-Hinkley mean-drift detector (Page 1954; the streaming-
    ML drift monitor next to cusum_changepoint's offline split):
    with the RUNNING mean xbar_t = S_t / t,

        m_T  = sum_{t<=T} (x_t - xbar_t - delta)
        PH_T = m_T - min_{t<=T} m_t     [alarm when > lambda]

    Each increment's rational x_t - S_t/t quantizes to the 2^-20
    grid ((t*x - S) * Q div t — exact int64, deterministic), so
    m and its running min are integer window chains. Output per
    position: (o, m_q, ph_q) — thresholding is the caller's
    lambda. delta_q is the drift dead-band in the SAME 2^-20 units.

    Scale: one ordered window pass (prefix sum, prefix min) —
    row-local arithmetic between.
    """
    q = PH_Q
    w = Window.orderBy(F.col("o").asc())
    run = w.rowsBetween(Window.unboundedPreceding,
                        Window.currentRow)
    base = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("t", F.row_number().over(w).cast("long"))
        .withColumn("s", F.sum("v").over(run))
    )
    inc = base.withColumn(
        "inc_q",
        F.expr(
            f"((t * v - s) * cast({q} as bigint)) div t"
            f" - {int(delta_q)}"
        ),
    )
    m = inc.withColumn("m_q", F.sum("inc_q").over(run))
    return m.withColumn(
        "ph_q", F.col("m_q") - F.min("m_q").over(run)
    ).select("o", "m_q", "ph_q")


def max_drawdown(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
) -> DataFrame:
    """Maximum drawdown of a cumulative series per key (the
    worst peak-to-trough fall — the risk summary for any running
    metric: cumulative reward, balance, quality score):

        equity_t = cumsum(v),  dd_t = max_{s<=t} equity_s - equity_t
        mdd = max_t dd_t

    Exact int64 window chains. Output per key: (key, n, final,
    peak, mdd).

    Scale: one per-key ordered window pass + ONE agg.
    """
    w = Window.partitionBy("k").orderBy(F.col("o").asc())
    run = w.rowsBetween(Window.unboundedPreceding,
                        Window.currentRow)
    base = (
        df.select(
            F.col(key).alias("k"), F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("eq", F.sum("v").over(run))
        .withColumn("pk", F.max("eq").over(run))
        .withColumn("dd", F.col("pk") - F.col("eq"))
    )
    return base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max_by("eq", "o").alias("final"),
        F.max("pk").alias("peak"),
        F.max("dd").alias("mdd"),
    )


def seasonal_mann_kendall(
    df: DataFrame,
    season: str,
    order: str,
    value: str,
) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch & Slack 1984) — the
    environmental-monitoring standard: compute Mann-Kendall S and
    its tie-corrected variance WITHIN each season (month, hour,
    weekday) so the seasonal cycle cannot masquerade as trend, then
    sum across seasons:

        S = sum_s S_s ,   var18 = sum_s var18_s
        z = (S -+ 1) / sqrt(var18 / 18)

    Pure composition of the per-key :func:`mann_kendall` kernel +
    ONE fold — all int64 until the closing z chain. Output:
    (n_seasons, s, var18, z).
    """
    per = mann_kendall(df, key=season, order=order, value=value)
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_seasons"),
        F.sum("s_stat").alias("s"),
        F.sum("var18").alias("var18"),
    )
    return agg.select(
        "n_seasons", "s", "var18",
        F.expr(
            "case when var18 > 0 then"
            " (cast(s as double) - cast(sign(s) as double))"
            " / sqrt(cast(var18 as double) / 18.0e0) end"
        ).alias("z"),
    )


def pettitt_test(
    df: DataFrame,
    order: str,
    value: str,
) -> DataFrame:
    """Pettitt rank changepoint test (Pettitt 1979) — the
    nonparametric sibling of binseg_split (detects a distribution
    shift with no normality assumption; the hydrology standard):
    with doubled mid-ranks R2_i (tie-exact, the mann_whitney
    algebra),

        U_t = sum_{i<=t} R2_i - t (n + 1)
        K = max_t |U_t| over t = 1..n-1, t* its earliest argmax

    Exact int64 prefix sums; the argmax resolves by two
    deterministic folds. Output: (n, t_star, u_at, k_stat).

    Scale: one distinct-value tie window + one time-order prefix
    window + two tiny folds — the ks_test plan family.
    """
    base = df.select(
        F.col(order).alias("o"), F.col(value).alias("v")
    )
    per = base.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    wv = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per.withColumn(
        "cprev", F.sum("t").over(wv) - F.col("t")
    ).select(
        "v", (2 * F.col("cprev") + F.col("t") + 1).alias("r2")
    )
    wo = Window.orderBy(F.col("o").asc())
    run = wo.rowsBetween(Window.unboundedPreceding,
                         Window.currentRow)
    seq = (
        base.join(ranked, on="v")
        .withColumn("tt", F.row_number().over(wo).cast("long"))
        .withColumn("pr", F.sum("r2").over(run))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
        .where(F.col("tt") < F.col("n"))
        .select(
            "tt", "n",
            F.expr("pr - tt * (n + 1)").alias("u_t"),
        )
    )
    mx = seq.agg(F.max(F.expr("abs(u_t)")).alias("k_stat"))
    best = (
        seq.crossJoin(F.broadcast(mx))
        .where(F.expr("abs(u_t) = k_stat"))
        .groupBy("n", "k_stat")
        .agg(F.min("tt").alias("t_star"))
    )
    at = seq.select(F.col("tt").alias("t_star"),
                    F.col("u_t").alias("u_at"))
    return best.join(at, on="t_star").select(
        "n", "t_star", "u_at", "k_stat"
    )


def double_mass(
    df: DataFrame,
    order: str,
    value: str,
    ref: str,
) -> DataFrame:
    """Double-mass curve consistency check (the classic gauge-QA
    plot: cumulative station total vs cumulative reference total —
    a straight line means consistent recording; a slope break marks
    an instrument/site change): per position,

        dev_t = cum_x(t) * S_ref - cum_ref(t) * S_x

    (the exact integer cross-multiplied distance from perfect
    proportionality). Output one row: (n, s_x, s_ref, t_star,
    max_abs_dev) with t_star the EARLIEST argmax — feed to
    binseg/pettitt for the formal break. Bound: cum * S < 2^63.

    Scale: one ordered prefix window + two tiny folds (the
    binseg_split plan).
    """
    w = Window.orderBy(F.col("o").asc())
    run = w.rowsBetween(Window.unboundedPreceding,
                        Window.currentRow)
    tot = Window.partitionBy()
    base = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("x"),
            F.col(ref).cast("long").alias("r"),
        )
        .withColumn("cx", F.sum("x").over(run))
        .withColumn("cr", F.sum("r").over(run))
        .withColumn("sx", F.sum("x").over(tot))
        .withColumn("sr", F.sum("r").over(tot))
        .withColumn("tt", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(tot))
        .select(
            "tt", "n", "sx", "sr",
            F.expr("cx * sr - cr * sx").alias("dev"),
        )
    )
    mx = base.agg(F.max(F.expr("abs(dev)")).alias("max_abs_dev"))
    best = (
        base.crossJoin(F.broadcast(mx))
        .where(F.expr("abs(dev) = max_abs_dev"))
        .groupBy("n", "sx", "sr", "max_abs_dev")
        .agg(F.min("tt").alias("t_star"))
    )
    return best.select(
        "n", F.col("sx").alias("s_x"), F.col("sr").alias("s_ref"),
        "t_star", "max_abs_dev",
    )


def flow_duration(
    df: DataFrame,
    value: str,
    exceed_pcts: list[int] | None = None,
) -> DataFrame:
    """Flow-duration curve at standard exceedance points (the
    hydrograph summary: Q5 = high-flow, Q50 = median, Q95 =
    dependable low-flow): value EXCEEDED p% of the time = the
    order statistic at DESC rank ceil(p*n/100) (deterministic
    (value, tiebreak) order — tie order cannot change the picked
    VALUE). Exact integers. Output per p: (p, rank_pick, q_value).

    Scale: one sort-window + one rank-filter (rows = |pcts|).
    """
    pcts = sorted(int(p) for p in (exceed_pcts or [5, 50, 95]))
    w = Window.orderBy(F.col("v").desc(), F.col("__tb").asc())
    base = (
        df.select(
            F.col(value).cast("long").alias("v"),
            F.monotonically_increasing_id().alias("__tb"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
        .drop("__tb")
    )
    ladder = base.select(
        "v", "rn", "n",
        F.explode(F.array(*[F.lit(p) for p in pcts])).alias("p"),
    ).where(
        # ceil(p n / 100) = (p n + 99) div 100
        F.expr("rn = (p * n + 99) div 100")
    )
    return ladder.select(
        F.col("p").cast("long").alias("p"),
        F.col("rn").alias("rank_pick"),
        F.col("v").alias("q_value"),
    )


def seasonal_anomaly(
    df: DataFrame,
    season: str,
    order: str,
    value: str,
) -> DataFrame:
    """Seasonal standardized anomalies (the SPI/climate-index
    shape: z-score each observation against ITS OWN season's
    climatology, so January cold doesn't read as anomaly):

        z = (x - mean_s) / sd_s     [sample sd]

    Group moments exact int64; each row's z a fixed IEEE chain
    (round 9). Degenerate seasons (constant) yield NULL. Output:
    (season, order, v, z_r).

    Scale: one (season) agg broadcast back — row-local scoring
    (the mahalanobis_2d discipline, grouped).
    """
    base = df.select(
        F.col(season).alias("s"), F.col(order).alias("o"),
        F.col(value).cast("long").alias("v"),
    )
    mom = base.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum("v").alias("sum_s"),
        F.sum(F.expr("v * v")).alias("ss_s"),
    )
    j = base.join(F.broadcast(mom), on="s")
    mean = "(cast(sum_s as double) / cast(n_s as double))"
    sd = (
        "sqrt((cast(n_s as double) * cast(ss_s as double)"
        " - cast(sum_s as double) * cast(sum_s as double))"
        " / (cast(n_s as double)"
        " * (cast(n_s as double) - 1.0e0)))"
    )
    return j.select(
        "s", "o", "v",
        F.expr(
            f"case when n_s > 1 and {sd} > 0.0e0 then"
            f" round((cast(v as double) - {mean}) / {sd}, 9) end"
        ).alias("z_r"),
    )


def degree_days(
    df: DataFrame,
    key: str,
    value: str,
    base_temp: int = 180,
) -> DataFrame:
    """Heating/cooling degree-day totals per key (the energy-
    demand integral: how far and how long temperature sat below /
    above the base):

        hdd = sum max(0, base - t),  cdd = sum max(0, t - base)

    Exact int64 conditional sums. Output per key: (key, n, hdd,
    cdd).

    Scale: ONE hash agg.
    """
    b = int(base_temp)
    base = df.select(
        F.col(key).alias("k"),
        F.col(value).cast("long").alias("t"),
    )
    return base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr(f"greatest(cast(0 as bigint), {b} - t)")
        ).alias("hdd"),
        F.sum(
            F.expr(f"greatest(cast(0 as bigint), t - {b})")
        ).alias("cdd"),
    )


def trapezoid_auc(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
) -> DataFrame:
    """Trapezoidal area under an unevenly-sampled curve per key
    (the linear-interpolation integral — time_weighted_avg's
    step-function sibling, and the generic AUC for any sampled
    curve):

        2 * AUC = sum (t_{i+1} - t_i) * (v_i + v_{i+1})

    carried DOUBLED so it stays exact int64; auc is the one
    closing division. Output per key: (key, n, span, auc2, auc).

    Scale: one per-key lag window + ONE agg.
    """
    w = Window.partitionBy("k").orderBy(F.col("o").asc())
    base = (
        df.select(
            F.col(key).alias("k"),
            F.col(order).cast("long").alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("po", F.lag("o", 1).over(w))
        .withColumn("pv", F.lag("v", 1).over(w))
    )
    agg = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.max("o") - F.min("o")).alias("span"),
        F.sum(
            F.expr(
                "case when po is not null"
                " then (o - po) * (v + pv) end"
            )
        ).alias("auc2"),
    )
    return agg.select(
        "k", "n", "span", "auc2",
        F.expr(
            "case when auc2 is not null then"
            " cast(auc2 as double) / 2.0e0 end"
        ).alias("auc"),
    )


def pot_events(
    df: DataFrame,
    order: str,
    value: str,
    threshold: int,
) -> DataFrame:
    """Peaks-over-threshold event declustering (the storm/flood
    event extractor feeding mean_excess/GPD fitting — consecutive
    exceedances are ONE event, not independent samples): maximal
    runs of v > threshold become events with

        (event_id, start_o, end_o, duration, peak, volume)

    where volume = sum (v - threshold) over the run. Classic
    gaps-and-islands on the exceedance flag; all exact int64.

    Scale: one ordered lag window + one island agg.
    """
    th = int(threshold)
    w = Window.orderBy(F.col("o").asc())
    run = w.rowsBetween(Window.unboundedPreceding,
                        Window.currentRow)
    base = (
        df.select(
            F.col(order).cast("long").alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("exc", F.expr(f"case when v > {th} then 1"
                                  " else 0 end"))
        .withColumn("pexc", F.lag("exc", 1).over(w))
        .withColumn(
            "new_ev",
            F.expr(
                "case when exc = 1 and (pexc is null or pexc = 0)"
                " then 1 else 0 end"
            ),
        )
        .withColumn("ev_id", F.sum("new_ev").over(run))
        .where(F.col("exc") == 1)
    )
    return base.groupBy(
        F.col("ev_id").cast("long").alias("event_id")
    ).agg(
        F.min("o").alias("start_o"),
        F.max("o").alias("end_o"),
        F.count(F.lit(1)).cast("long").alias("duration"),
        F.max("v").alias("peak"),
        F.sum(F.expr(f"v - {th}")).alias("volume"),
    )


def concurrency_stats(
    df: DataFrame,
    start: str,
    end: str,
) -> DataFrame:
    """Peak and average concurrency of interval sessions (capacity
    planning's first question: how many were in the system AT
    ONCE?): sweep +1 at each start and -1 at each end (half-open
    [start, end) — an end and a start at the same instant do NOT
    overlap: ends sort first), running-sum for the live count:

        peak = max running count
        avg  = sum durations / span    [time-weighted, exact]

    Output one row: (n, span, sum_dur, peak, avg). All int64 until
    the closing division.

    Scale: one 2n-row explode + one ordered window + ONE fold —
    the interval_coverage family.
    """
    base = df.select(
        F.col(start).cast("long").alias("s"),
        F.col(end).cast("long").alias("e"),
    ).where(F.col("e") > F.col("s"))
    sweep = base.select(
        F.col("s").alias("t"), F.lit(1).cast("long").alias("d")
    ).unionByName(
        base.select(F.col("e").alias("t"),
                    F.lit(-1).cast("long").alias("d"))
    )
    w = Window.orderBy(F.col("t").asc(), F.col("d").asc())
    run = sweep.withColumn(
        "live",
        F.sum("d").over(
            w.rowsBetween(Window.unboundedPreceding,
                          Window.currentRow)
        ),
    )
    peak = run.agg(F.max("live").alias("peak"))
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.max("e") - F.min("s")).alias("span"),
        F.sum(F.expr("e - s")).alias("sum_dur"),
    )
    return mom.crossJoin(F.broadcast(peak)).select(
        "n", "span", "sum_dur", "peak",
        F.expr(
            "case when span > 0 then cast(sum_dur as double)"
            " / cast(span as double) end"
        ).alias("avg_live"),
    )


def rmst(
    df: DataFrame,
    duration: str,
    event: str,
    tau: int,
) -> DataFrame:
    """Restricted mean survival time up to horizon tau (Royston &
    Parmar 2013) — the area under the Kaplan-Meier curve, the
    trial-readout that stays meaningful when hazards aren't
    proportional (pairs with logrank_test / kaplan_meier):

        RMST = sum over KM steps of S(t_i) * (min(t_{i+1}, tau)
                                              - t_i)   [+ first
               segment at S = 1 from 0 to the first event]

    S carries in kaplan_meier's ln-quantized integer form; each
    segment's S * dt quantizes to 1e-9 * dt exactness and folds as
    an exact int64 window sum. Output: (tau, n_steps, rmst_q,
    rmst_r round 6).

    Scale: the kaplan_meier plan + one ordered window over the
    DISTINCT event times.
    """
    km = kaplan_meier(df, duration, event)
    w = Window.orderBy(F.col("t").asc())
    steps = (
        km.where(F.col("t") < int(tau))
        .withColumn(
            "t_next",
            F.coalesce(
                F.lead("t", 1).over(w), F.lit(int(tau))
            ),
        )
        .withColumn(
            "t_next_c", F.least("t_next", F.lit(int(tau)))
        )
        .withColumn("prev_t", F.lag("t", 1).over(w))
    )
    # segment BEFORE the first event runs at S = 1
    # no events before tau -> S = 1 on the whole horizon
    first = steps.agg(
        F.min("t").alias("t_first")
    ).select(
        F.expr(
            f"cast(least(coalesce(t_first, {int(tau)}),"
            f" {int(tau)}) * 1000000000 as bigint)"
        ).alias("head_q")
    )
    seg = steps.select(
        F.expr(
            "cast(floor(s_r * 1.0e9 + 0.5e0) as bigint)"
            " * (t_next_c - t)"
        ).alias("seg_q")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_steps"),
        F.sum("seg_q").alias("tail_q"),
    )
    out = seg.crossJoin(F.broadcast(first))
    return out.select(
        F.lit(int(tau)).cast("long").alias("tau"),
        "n_steps",
        F.expr(
            "coalesce(head_q, cast(0 as bigint))"
            " + coalesce(tail_q, cast(0 as bigint))"
        ).alias("rmst_q"),
        F.expr(
            "round(cast(coalesce(head_q, cast(0 as bigint))"
            " + coalesce(tail_q, cast(0 as bigint))"
            " as double) / 1.0e9, 6)"
        ).alias("rmst_r"),
    )


def win_ratio(
    arm_a: DataFrame,
    arm_b: DataFrame,
    duration: str,
    event: str,
) -> DataFrame:
    """Pocock win ratio for time-to-event outcomes (Pocock et al.
    2012): every (A, B) patient pair compares on survival — the
    one who DEMONSTRABLY fails first loses (their event time is
    earlier than the other's FOLLOW-UP time); otherwise the pair
    is a tie (censoring hides the order):

        A wins the pair iff B's event precedes A's follow-up;
        WR = wins_a / wins_b.

    Exact integer tallies; one division (NULL when arm B never
    loses). Output: (n_a, n_b, wins_a, wins_b, ties, wr).

    O(n_a * n_b) pairs — the oracle-exact small-n path (trial arms
    are small; at corpus scale stratify first).
    """
    a = arm_a.select(
        F.col(duration).cast("long").alias("ta"),
        F.col(event).cast("int").alias("ea"),
    )
    b = arm_b.select(
        F.col(duration).cast("long").alias("tb"),
        F.col(event).cast("int").alias("eb"),
    )
    pairs = a.crossJoin(b).select(
        F.expr(
            "case when eb = 1 and tb < ta then 1"
            " when ea = 1 and ta < tb then 2 else 0 end"
        ).alias("res")
    )
    agg = pairs.agg(
        F.sum(F.expr("case when res = 1 then 1 else 0 end"))
        .cast("long").alias("wins_a"),
        F.sum(F.expr("case when res = 2 then 1 else 0 end"))
        .cast("long").alias("wins_b"),
        F.sum(F.expr("case when res = 0 then 1 else 0 end"))
        .cast("long").alias("ties"),
    )
    na = arm_a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = arm_b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    return (
        agg.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_a", "n_b", "wins_a", "wins_b", "ties",
            F.expr(
                "case when wins_b > 0 then"
                " cast(wins_a as double)"
                " / cast(wins_b as double) end"
            ).alias("wr"),
        )
    )


def exp_gof(
    df: DataFrame,
    order: str,
    event: str,
) -> DataFrame:
    """Exponential goodness-of-fit for inter-event gaps (the "is
    this process Poisson?" check behind every queueing/failure
    model; g_chart's distributional companion): with gap rate
    lambda = n_gaps / sum_gaps, the KS-style statistic

        D = max over distinct gaps g of
            | F_emp(g) - (1 - exp(-lambda * g)) |

    F_emp from exact integer cumulative counts; the exponential
    term is one identical IEEE chain (exp of exact rationals), so
    the max over rows is deterministic; D rounds to 9dp. Output:
    (n_gaps, sum_gaps, d_stat_r).

    Scale: event-rank lag for gaps + distinct-gap prefix window +
    one fold.
    """
    w = Window.orderBy(F.col("o").asc())
    pos = (
        df.select(
            F.col(order).alias("o"),
            F.col(event).cast("int").alias("ev"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("ev") == 1)
    )
    we = Window.orderBy(F.col("rn").asc())
    gaps = (
        pos.withColumn("prev", F.lag("rn", 1).over(we))
        .where(F.col("prev").isNotNull())
        .select((F.col("rn") - F.col("prev")).alias("g"))
    )
    per = gaps.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wg = Window.orderBy(F.col("g").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.orderBy(F.col("g").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "g",
        F.sum("c").over(wg).alias("cf"),
        F.sum("c").over(tot).alias("n_gaps"),
        F.sum(F.expr("g * c")).over(tot).alias("sum_gaps"),
    )
    femp = "(cast(cf as double) / cast(n_gaps as double))"
    fexp = (
        "(1.0e0 - exp(-(cast(n_gaps as double)"
        " / cast(sum_gaps as double)) * cast(g as double)))"
    )
    d = cum.select(
        "n_gaps", "sum_gaps",
        F.expr(f"abs({femp} - {fexp})").alias("dv"),
    )
    return d.groupBy("n_gaps", "sum_gaps").agg(
        F.expr("round(max(dv), 9)").alias("d_stat_r")
    )


def fano_factor(
    df: DataFrame,
    order: str,
    window_w: int = 50,
) -> DataFrame:
    """Temporal Fano factor (index of dispersion for counts): bin
    the event positions into fixed windows and take var/mean of
    per-window counts — 1 under Poisson, > 1 bursty, < 1 regular
    (quadrat_vmr's time-axis twin, burstiness' windowed sibling).
    Empty windows inside the span COUNT (they carry the
    regularity signal): the bin count comes from the span, not
    from observed bins.

        F = (n_bins * sum c^2 - T^2) / (n_bins * T)   [factored]

    Exact integers; one IEEE chain. Output: (n_bins, n_events,
    sum_c2, fano).

    Scale: one row-local binning + ONE agg (empty bins enter via
    the closed form, never enumerated).
    """
    ww = int(window_w)
    base = df.select(
        F.col(order).cast("long").alias("o")
    )
    ext = base.agg(
        F.min("o").alias("o0"), F.max("o").alias("o1"),
        F.count(F.lit(1)).cast("long").alias("t"),
    )
    bins = (
        base.crossJoin(F.broadcast(ext))
        .groupBy(F.expr(f"(o - o0) div {ww}").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    mom = bins.agg(
        F.sum("c").alias("t"),
        F.sum(F.expr("c * c")).alias("sum_c2"),
    )
    nb = ext.select(
        F.expr(f"(o1 - o0) div {ww} + 1").alias("n_bins")
    )
    j = mom.crossJoin(F.broadcast(nb))
    fano = (
        "((cast(n_bins as double) * cast(sum_c2 as double)"
        " - cast(t as double) * cast(t as double))"
        " / (cast(n_bins as double) * cast(t as double)))"
    )
    return j.select(
        "n_bins", F.col("t").alias("n_events"), "sum_c2",
        F.expr(
            f"case when t > 0 then {fano} end"
        ).alias("fano"),
    )


def stickiness(
    df: DataFrame,
    user: str,
    period_small: str,
    period_big: str,
) -> DataFrame:
    """DAU/MAU-style stickiness per big period (the product-
    engagement ratio: of the users active this month, what share
    shows up on an average day):

        stickiness = avg_small_distinct / big_distinct
                   = (sum over small periods of distinct users)
                     / (n_small * big_distinct)

    Exact distinct tallies; one IEEE chain. Output per big period:
    (pb, n_small, sum_small_distinct, big_distinct, stickiness).

    Scale: two distinct-aggs keyed on (period, user) — the
    hll_grouped exact-small sibling.
    """
    base = df.select(
        F.col(user).alias("u"),
        F.col(period_small).alias("ps"),
        F.col(period_big).alias("pb"),
    )
    small = base.groupBy("pb", "ps").agg(
        F.countDistinct("u").cast("long").alias("d")
    )
    per_big_small = small.groupBy("pb").agg(
        F.count(F.lit(1)).cast("long").alias("n_small"),
        F.sum("d").alias("sum_small_distinct"),
    )
    big = base.groupBy("pb").agg(
        F.countDistinct("u").cast("long").alias("big_distinct")
    )
    j = per_big_small.join(big, on="pb")
    return j.select(
        "pb", "n_small", "sum_small_distinct", "big_distinct",
        F.expr(
            "case when n_small > 0 and big_distinct > 0 then"
            " cast(sum_small_distinct as double)"
            " / (cast(n_small as double)"
            " * cast(big_distinct as double)) end"
        ).alias("stickiness"),
    )


def new_returning(
    df: DataFrame,
    user: str,
    period: str,
) -> DataFrame:
    """New-vs-returning user split per period (the growth-
    accounting readout cohort_retention expands into a matrix;
    this is its one-line margin): a user is NEW in their first-
    ever period, RETURNING otherwise. Exact integer tallies.
    Output per period: (p, n_users, n_new, n_returning,
    new_share).

    Scale: one (user) min-agg + a broadcast-eligible join + one
    period agg.
    """
    base = df.select(
        F.col(user).alias("u"), F.col(period).alias("p")
    ).distinct()
    first = base.groupBy("u").agg(F.min("p").alias("p0"))
    j = base.join(first, on="u")
    agg = j.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(
            F.expr("case when p = p0 then 1 else 0 end")
        ).cast("long").alias("n_new"),
    )
    return agg.select(
        "p", "n_users", "n_new",
        (F.col("n_users") - F.col("n_new")).alias("n_returning"),
        F.expr(
            "case when n_users > 0 then cast(n_new as double)"
            " / cast(n_users as double) end"
        ).alias("new_share"),
    )


def growth_accounting(
    df: DataFrame,
    user: str,
    period: str,
) -> DataFrame:
    """Growth accounting per period (the SaaS standard: every
    active user is NEW, RETAINED or RESURRECTED; every previously-
    active absentee is CHURNED; quick ratio = (new + resurrected)
    / churned):

        new         = first-ever period
        retained    = active in p-1 too
        resurrected = active before, but not in p-1
        churned(p)  = active in p-1, absent in p

    Exact integer tallies (periods must be consecutive integers).
    Output per period: (p, n_new, n_retained, n_resurrected,
    n_churned, quick_ratio).

    Scale: distinct (u, p) + one self-join on (u, p-1) + one
    first-seen join + period aggs.
    """
    base = df.select(
        F.col(user).alias("u"),
        F.col(period).cast("long").alias("p"),
    ).distinct()
    first = base.groupBy("u").agg(F.min("p").alias("p0"))
    prev = base.select("u", (F.col("p") + 1).alias("p")) \
        .withColumn("was_prev", F.lit(1))
    cur = (
        base.join(first, on="u")
        .join(prev, on=["u", "p"], how="left")
    )
    act = cur.groupBy("p").agg(
        F.sum(F.expr("case when p = p0 then 1 else 0 end"))
        .cast("long").alias("n_new"),
        F.sum(
            F.expr(
                "case when p <> p0 and was_prev = 1 then 1"
                " else 0 end"
            )
        ).cast("long").alias("n_retained"),
        F.sum(
            F.expr(
                "case when p <> p0 and was_prev is null then 1"
                " else 0 end"
            )
        ).cast("long").alias("n_resurrected"),
    )
    nxt = base.select("u", "p").withColumn("now", F.lit(1))
    churn = (
        base.select("u", (F.col("p") + 1).alias("p"))
        .join(nxt, on=["u", "p"], how="left")
        .where(F.col("now").isNull())
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    j = act.join(churn, on="p", how="full_outer").select(
        "p",
        *[F.expr(f"coalesce({c}, cast(0 as bigint))").alias(c)
          for c in ("n_new", "n_retained", "n_resurrected",
                    "n_churned")],
    )
    return j.select(
        "p", "n_new", "n_retained", "n_resurrected", "n_churned",
        F.expr(
            "case when n_churned > 0 then"
            " cast(n_new + n_resurrected as double)"
            " / cast(n_churned as double) end"
        ).alias("quick_ratio"),
    )


def engagement_histogram(
    df: DataFrame,
    user: str,
    period: str,
) -> DataFrame:
    """Days-active (Lx) engagement histogram: how many users were
    active in exactly k periods — the engagement-depth curve whose
    right mass is your core user base (stickiness' distributional
    parent). Output per k: (k_active, n_users, share).

    Scale: distinct (u, p) + per-user count + ONE histogram agg.
    """
    base = df.select(
        F.col(user).alias("u"), F.col(period).alias("p")
    ).distinct()
    per_u = base.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("k_active")
    )
    hist = per_u.groupBy("k_active").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    tot = per_u.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "k_active", "n_users",
        F.expr(
            "cast(n_users as double) / cast(n as double)"
        ).alias("share"),
    )


def arc_elasticity(
    df: DataFrame,
    period: str,
    price: str,
    quantity: str,
) -> DataFrame:
    """Midpoint (arc) price elasticity between consecutive periods
    (the pricing-analytics standard — symmetric in direction,
    unlike point elasticity):

        e = ((q2 - q1)/(q2 + q1)) / ((p2 - p1)/(p2 + p1))

    Exact integer period aggregates (sum quantity, sum price);
    elasticity one cross-multiplied IEEE chain (NULL when the
    price leg is flat). Output per period pair: (p_from, p_to,
    q1, q2, pr1, pr2, elasticity).

    Scale: one period agg + one lag window over periods.
    """
    per = df.groupBy(
        F.col(period).cast("long").alias("p")
    ).agg(
        F.sum(F.col(quantity).cast("long")).alias("q"),
        F.sum(F.col(price).cast("long")).alias("pr"),
    )
    w = Window.orderBy(F.col("p").asc())
    lag = (
        per.withColumn("p_prev", F.lag("p", 1).over(w))
        .withColumn("q_prev", F.lag("q", 1).over(w))
        .withColumn("pr_prev", F.lag("pr", 1).over(w))
        .where(F.col("p_prev").isNotNull())
    )
    num = "(cast(q - q_prev as double) * cast(pr + pr_prev as double))"
    den = "(cast(pr - pr_prev as double) * cast(q + q_prev as double))"
    return lag.select(
        F.col("p_prev").alias("p_from"),
        F.col("p").alias("p_to"),
        F.col("q_prev").alias("q1"), F.col("q").alias("q2"),
        F.col("pr_prev").alias("pr1"), F.col("pr").alias("pr2"),
        F.expr(
            f"case when pr <> pr_prev and q + q_prev > 0 then"
            f" {num} / {den} end"
        ).alias("elasticity"),
    )


def retention_half_life(
    df: DataFrame,
    user: str,
    period: str,
) -> DataFrame:
    """Cohort retention half-life: for each signup cohort, the
    first period OFFSET at which retention drops below 50% of the
    cohort (the single number the full cohort_retention matrix
    collapses to). Exact integer cross-multiplied comparison
    (2 * retained < cohort_size); cohorts that never drop report
    NULL. Output per cohort: (cohort, cohort_size, half_life).

    Scale: first-seen join + (cohort, offset) agg + one
    deterministic min-pick.
    """
    base = df.select(
        F.col(user).alias("u"),
        F.col(period).cast("long").alias("p"),
    ).distinct()
    first = base.groupBy("u").agg(F.min("p").alias("c"))
    act = base.join(first, on="u").select(
        "c", (F.col("p") - F.col("c")).alias("off")
    )
    ret = act.groupBy("c", "off").agg(
        F.count(F.lit(1)).cast("long").alias("retained")
    )
    size = ret.where(F.col("off") == 0).select(
        "c", F.col("retained").alias("cohort_size")
    )
    j = ret.join(size, on="c")
    drops = j.where(
        F.expr("2 * retained < cohort_size")
    ).groupBy("c", "cohort_size").agg(
        F.min("off").alias("half_life")
    )
    return size.join(
        drops.select("c", "half_life"), on="c", how="left"
    ).select(
        F.col("c").alias("cohort"), "cohort_size", "half_life"
    )


def robust_seasonal_anomaly(
    df: DataFrame,
    season: str,
    order: str,
    value: str,
) -> DataFrame:
    """Robust seasonal anomaly score (the S-H-ESD-flavored
    screen: z-score each observation against ITS season's MEDIAN
    and MAD, so heavy-tailed seasons don't mask their own
    outliers — seasonal_anomaly's 50%-breakdown upgrade):

        score = (x - med_s) / mad_s

    Both medians are exact DOUBLED order statistics (the
    brown_forsythe convention): 2*med_s from the season's sorted
    values, 2*mad_s from the sorted |2x - 2med| deviations — so
    score = (2x - 2med) / (2mad) is a ratio of exact int64
    (round 9; NULL when mad = 0). Output: (season, order, v,
    score_r).

    Scale: two season-partitioned sort-windows + broadcast
    join-backs — row-local scoring.
    """
    base = df.select(
        F.col(season).alias("s"), F.col(order).alias("o"),
        F.col(value).cast("long").alias("v"),
    )

    def _med2(d: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("s").orderBy(F.col(col).asc())
        r = (
            d.withColumn("rn", F.row_number().over(w))
            .withColumn(
                "nn",
                F.count(F.lit(1)).over(Window.partitionBy("s")),
            )
            .where(
                (F.col("rn") == F.expr("(nn + 1) div 2"))
                | (F.col("rn") == F.expr("(nn + 2) div 2"))
            )
            .groupBy("s")
            .agg(F.sum(col).alias("raw"),
                 F.count(F.lit(1)).alias("m"))
        )
        return r.select(
            "s",
            F.expr(
                "case when m = 1 then 2 * raw else raw end"
            ).alias(out),
        )

    med = _med2(base, "v", "med2")
    dev = base.join(F.broadcast(med), on="s").select(
        "s", F.expr("abs(2 * v - med2)").alias("d2v")
    )
    mad = _med2(dev, "d2v", "mad2x2")
    j = (
        base.join(F.broadcast(med), on="s")
        .join(F.broadcast(mad), on="s")
    )
    return j.select(
        "s", "o", "v",
        F.expr(
            # 4(v - med) over mad2x2 = 4*mad -> exactly
            # (v - med)/mad
            "case when mad2x2 > 0 then"
            " round(cast(2 * (2 * v) - 2 * med2 as double)"
            " / cast(mad2x2 as double), 9) end"
        ).alias("score_r"),
    )


def rolling_corr(
    df: DataFrame,
    key: str,
    order: str,
    x: str,
    y: str,
    window_n: int = 20,
) -> DataFrame:
    """Rolling Pearson correlation of two aligned series per key
    (the co-movement monitor next to rolling_slope): within each
    trailing window of `window_n` rows the five moment sums are
    exact int64 window aggregates, and

        r = (n sxy - sx sy) / sqrt((n sxx - sx^2)(n syy - sy^2))

    is one row-local IEEE chain (round 9; NULL on short or
    degenerate frames). Output: (key, order, r_roll).

    Scale: one per-key ordered window with five sum frames.
    """
    ww = int(window_n)
    w = Window.partitionBy("k").orderBy(F.col("o").asc()) \
        .rowsBetween(-(ww - 1), Window.currentRow)
    base = df.select(
        F.col(key).alias("k"), F.col(order).alias("o"),
        F.col(x).cast("long").alias("xv"),
        F.col(y).cast("long").alias("yv"),
    )
    m = (
        base.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("sx", F.sum("xv").over(w))
        .withColumn("sy", F.sum("yv").over(w))
        .withColumn("sxy", F.sum(F.expr("xv * yv")).over(w))
        .withColumn("sxx", F.sum(F.expr("xv * xv")).over(w))
        .withColumn("syy", F.sum(F.expr("yv * yv")).over(w))
    )
    num = "(cast(n as double) * cast(sxy as double)" \
          " - cast(sx as double) * cast(sy as double))"
    dx = "(cast(n as double) * cast(sxx as double)" \
         " - cast(sx as double) * cast(sx as double))"
    dy = "(cast(n as double) * cast(syy as double)" \
         " - cast(sy as double) * cast(sy as double))"
    return m.select(
        "k", "o",
        F.expr(
            f"case when n >= {ww} and {dx} > 0.0e0"
            f" and {dy} > 0.0e0 then"
            f" round({num} / sqrt({dx} * {dy}), 9) end"
        ).alias("r_roll"),
    )


def residual_dw(
    df: DataFrame,
    order: str,
    x: str,
    y: str,
) -> DataFrame:
    """Durbin-Watson statistic of GLOBAL OLS residuals — the
    Engle-Granger step-2 screen (regress y on x, then ask whether
    the residual series is stationary-ish; DW -> 0 says the
    "relationship" is a spurious random-walk pairing):

        e_t ~ n*den*y_t - n*num*x_t - (den*sy - num*sx)  [the
        exact INTEGER residual numerator at common denominator
        n*den, with num/den the n-scaled OLS slope moments]

    dw = sum diff^2 / sum e^2 on those integers (denominators
    cancel). Bound: n * den * max|y| < 2^63 — quantize inputs
    coarsely (the gate uses small grids). Output: (n, num, den,
    dw).

    Scale: ONE moment pass + one ordered lag window over the
    integer residuals.
    """
    base = df.select(
        F.col(order).alias("o"),
        F.col(x).cast("long").alias("xv"),
        F.col(y).cast("long").alias("yv"),
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xv").alias("sx"), F.sum("yv").alias("sy"),
        F.sum(F.expr("xv * yv")).alias("sxy"),
        F.sum(F.expr("xv * xv")).alias("sxx"),
    ).select(
        "n", "sx", "sy",
        F.expr("n * sxy - sx * sy").alias("num"),
        F.expr("n * sxx - sx * sx").alias("den"),
    )
    j = base.crossJoin(F.broadcast(mom)).select(
        "o", "num", "den", "n",
        F.expr(
            "n * den * yv - n * num * xv - (den * sy - num * sx)"
        ).alias("e"),
    )
    w = Window.orderBy(F.col("o").asc())
    lag = j.withColumn("pe", F.lag("e", 1).over(w))
    agg = lag.agg(
        F.max("n").alias("n"),
        F.max("num").alias("num"),
        F.max("den").alias("den"),
        F.sum(F.expr("e * e")).alias("dsum"),
        F.sum(
            F.expr(
                "case when pe is not null"
                " then (e - pe) * (e - pe) end"
            )
        ).alias("nsum"),
    )
    return agg.select(
        "n", "num", "den",
        F.expr(
            "case when dsum > 0 then cast(nsum as double)"
            " / cast(dsum as double) end"
        ).alias("dw"),
    )


def autocorr_time(
    df: DataFrame,
    order: str,
    value: str,
    max_lag: int = 5,
) -> DataFrame:
    """Integrated autocorrelation time (the MCMC/monitoring
    effective-sample-size divisor: tau = 1 + 2 sum r_k over the
    first max_lag lags; ess = n / tau): lag moments on the
    n-scaled integer deviation grid (the acf algebra), tau and
    ess one IEEE chain. Output: (n, c0, tau, ess).

    Scale: one ordered window with max_lag lag columns + ONE agg.
    """
    ml = int(max_lag)
    w = Window.orderBy(F.col("o").asc())
    base = df.select(
        F.col(order).alias("o"),
        F.col(value).cast("long").alias("v"),
    )
    mom = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sx")
    )
    dev = base.crossJoin(F.broadcast(mom)).select(
        "o", "n", (F.col("n") * F.col("v") - F.col("sx"))
        .alias("d"),
    )
    lags = dev.select(
        "n", "d",
        *[F.lag("d", k).over(w).alias(f"p{k}")
          for k in range(1, ml + 1)],
    )
    agg = lags.groupBy("n").agg(
        F.sum(F.expr("d * d")).alias("c0"),
        *[
            F.sum(
                F.expr(f"case when p{k} is not null"
                       f" then d * p{k} end")
            ).alias(f"c{k}")
            for k in range(1, ml + 1)
        ],
    )
    terms = " + ".join(
        f"cast(c{k} as double) / cast(c0 as double)"
        for k in range(1, ml + 1)
    )
    tau = f"(1.0e0 + 2.0e0 * ({terms}))"
    return agg.select(
        F.col("n").cast("long").alias("n"), "c0",
        F.expr(
            f"case when c0 > 0 then {tau} end"
        ).alias("tau"),
        F.expr(
            f"case when c0 > 0 and {tau} > 0.0e0 then"
            f" cast(n as double) / {tau} end"
        ).alias("ess"),
    )


def geweke_z(
    df: DataFrame,
    order: str,
    value: str,
    head_pct: int = 10,
    tail_pct: int = 50,
) -> DataFrame:
    """Geweke convergence diagnostic (1992) — has the chain's early
    segment the same mean as its late segment?

        z = (m_head - m_tail)
            / sqrt(v_head/n_head + v_tail/n_tail)

    Segments are rank slices (first head_pct%, last tail_pct%);
    moments exact int64, z one IEEE chain (pairs with
    autocorr_time's ESS). Output: (n, n_head, n_tail, z).

    Scale: one rank window + TWO conditional aggs.
    """
    hp, tp = int(head_pct), int(tail_pct)
    w = Window.orderBy(F.col("o").asc())
    base = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
    )
    seg = base.select(
        "v", "n",
        F.expr(f"case when rn * 100 <= {hp} * n then 1"
               f" when (n - rn) * 100 < {tp} * n then 2"
               " else 0 end").alias("seg"),
    ).where(F.col("seg") > 0)
    agg = seg.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("v").alias("s"),
        F.sum(F.expr("v * v")).alias("ss"),
        F.max("n").alias("n"),
    )
    piv = agg.groupBy("n").agg(
        *[f
          for k in (1, 2)
          for f in (
              F.max(F.expr(f"case when seg = {k} then m end"))
              .alias(f"m{k}"),
              F.max(F.expr(f"case when seg = {k} then s end"))
              .alias(f"s{k}"),
              F.max(F.expr(f"case when seg = {k} then ss end"))
              .alias(f"ss{k}"),
          )]
    )

    def mv(k: int) -> tuple[str, str]:
        m = f"(cast(s{k} as double) / cast(m{k} as double))"
        v = (
            f"((cast(m{k} as double) * cast(ss{k} as double)"
            f" - cast(s{k} as double) * cast(s{k} as double))"
            f" / (cast(m{k} as double)"
            f" * (cast(m{k} as double) - 1.0e0)))"
        )
        return m, v

    m1, v1 = mv(1)
    m2, v2 = mv(2)
    se = (
        f"sqrt({v1} / cast(m1 as double)"
        f" + {v2} / cast(m2 as double))"
    )
    return piv.select(
        F.col("n").cast("long").alias("n"),
        F.col("m1").alias("n_head"),
        F.col("m2").alias("n_tail"),
        F.expr(
            f"case when m1 > 1 and m2 > 1 and {se} > 0.0e0 then"
            f" ({m1} - {m2}) / {se} end"
        ).alias("z"),
    )


def split_rhat(
    df: DataFrame,
    order: str,
    value: str,
) -> DataFrame:
    """Split-chain Gelman-Rubin R-hat (the two-half form — the
    stationarity screen next to geweke_z; R-hat near 1 means the
    halves agree in both mean and variance):

        W = mean of the two halves' variances,
        B = n_h * var of the two halves' means,
        rhat = sqrt(((n_h - 1)/n_h * W + B/n_h) / W)

    All from exact half moments; one IEEE chain. Output: (n, n_h,
    rhat).

    Scale: one rank window + one conditional agg.
    """
    w = Window.orderBy(F.col("o").asc())
    base = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
    )
    halves = base.where(F.expr("rn <= 2 * (n div 2)")).select(
        "v",
        F.expr("case when rn <= n div 2 then 1 else 2 end")
        .alias("h"),
    )
    agg = halves.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("v").alias("s"),
        F.sum(F.expr("v * v")).alias("ss"),
    )
    piv = agg.agg(
        F.max(F.expr("case when h = 1 then m end")).alias("nh"),
        F.max(F.expr("case when h = 1 then s end")).alias("s1"),
        F.max(F.expr("case when h = 1 then ss end")).alias("ss1"),
        F.max(F.expr("case when h = 2 then s end")).alias("s2"),
        F.max(F.expr("case when h = 2 then ss end")).alias("ss2"),
    )
    nh = "cast(nh as double)"

    def var(s: str, ss: str) -> str:
        return (
            f"(({nh} * cast({ss} as double)"
            f" - cast({s} as double) * cast({s} as double))"
            f" / ({nh} * ({nh} - 1.0e0)))"
        )

    w_ = f"(({var('s1', 'ss1')} + {var('s2', 'ss2')}) / 2.0e0)"
    mdiff = (
        f"(cast(s1 as double) / {nh}"
        f" - cast(s2 as double) / {nh})"
    )
    b = f"({nh} * {mdiff} * {mdiff} / 2.0e0)"
    rhat = (
        f"sqrt((({nh} - 1.0e0) / {nh} * {w_} + {b} / {nh})"
        f" / {w_})"
    )
    return piv.select(
        (F.col("nh") * 2).cast("long").alias("n"),
        F.col("nh").alias("n_h"),
        F.expr(
            f"case when nh > 1 and {w_} > 0.0e0 then {rhat} end"
        ).alias("rhat"),
    )


def debounce_audit(
    df: DataFrame,
    key: str,
    order: str,
    delta: int,
) -> DataFrame:
    """Debounce audit per key (double-fire telemetry QA: how many
    events land within `delta` of the PREVIOUS event on the same
    key — retry storms, double-clicks, duplicate webhooks):

        bounce_t iff t - t_prev <= delta

    Exact integer gaps off one lag window. Output per key: (key,
    n, n_bounce, bounce_share, min_gap).

    Scale: one per-key lag window + ONE agg.
    """
    d = int(delta)
    w = Window.partitionBy("k").orderBy(F.col("o").asc())
    base = (
        df.select(
            F.col(key).alias("k"),
            F.col(order).cast("long").alias("o"),
        )
        .withColumn("po", F.lag("o", 1).over(w))
    )
    agg = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr(
                f"case when po is not null and o - po <= {d}"
                " then 1 else 0 end"
            )
        ).cast("long").alias("n_bounce"),
        F.min(
            F.expr("case when po is not null then o - po end")
        ).alias("min_gap"),
    )
    return agg.select(
        "k", "n", "n_bounce",
        F.expr(
            "case when n > 1 then cast(n_bounce as double)"
            " / (cast(n as double) - 1.0e0) end"
        ).alias("bounce_share"),
        "min_gap",
    )


def gap_stats(
    df: DataFrame,
    key: str,
    order: str,
) -> DataFrame:
    """Inter-event gap summary per key with EXACT order statistics
    (median and quartiles of the gaps — the cadence fingerprint
    g_chart monitors globally, here per key): doubled median (the
    brown_forsythe convention) plus Q1/Q3 rank picks. Output per
    key: (key, n_gaps, gap_med2, q1, q3, iqr).

    Scale: one lag window for gaps + one per-key sort-window.
    """
    w = Window.partitionBy("k").orderBy(F.col("o").asc())
    gaps = (
        df.select(
            F.col(key).alias("k"),
            F.col(order).cast("long").alias("o"),
        )
        .withColumn("po", F.lag("o", 1).over(w))
        .where(F.col("po").isNotNull())
        .select("k", (F.col("o") - F.col("po")).alias("g"))
    )
    wg = Window.partitionBy("k").orderBy(F.col("g").asc())
    r = (
        gaps.withColumn("rn", F.row_number().over(wg)
                        .cast("long"))
        .withColumn(
            "m",
            F.count(F.lit(1)).over(Window.partitionBy("k")),
        )
    )
    agg = r.groupBy("k", "m").agg(
        F.sum(
            F.expr(
                "case when rn = (m + 1) div 2"
                " or rn = (m + 2) div 2 then g end"
            )
        ).alias("med_raw"),
        F.sum(
            F.expr(
                "case when rn = (m + 1) div 2"
                " and (m + 1) div 2 = (m + 2) div 2 then g end"
            )
        ).alias("med_single"),
        F.min(
            F.expr("case when rn = (m + 3) div 4 then g end")
        ).alias("q1"),
        F.min(
            F.expr("case when rn = (3 * m + 3) div 4 then g end")
        ).alias("q3"),
    )
    return agg.select(
        "k", F.col("m").alias("n_gaps"),
        F.expr(
            "case when med_single is not null then 2 * med_single"
            " else med_raw end"
        ).alias("gap_med2"),
        "q1",
        F.expr("coalesce(q3, q1)").alias("q3"),
        F.expr("coalesce(q3, q1) - q1").alias("iqr"),
    )


def threshold_crossing(
    df: DataFrame,
    order: str,
    value: str,
    threshold: int,
) -> DataFrame:
    """Linear-trend threshold-crossing forecast (the capacity-
    planning one-liner: at the current OLS trend, WHEN does the
    metric hit the limit?):

        slope/intercept from exact integer moments (position as
        regressor), t_cross = (threshold - a) / b in positions
        PAST the last observation (negative/NULL when the trend
        runs away from the limit or is flat).

    Output: (n, num, den, slope, t_cross).

    Scale: one rank window + ONE moment agg.
    """
    th = int(threshold)
    w = Window.orderBy(F.col("o").asc())
    base = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn("t", F.row_number().over(w).cast("long"))
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").alias("sx"), F.sum("v").alias("sy"),
        F.sum(F.expr("t * v")).alias("sxy"),
        F.sum(F.expr("t * t")).alias("sxx"),
    ).select(
        "n", "sx", "sy",
        F.expr("n * sxy - sx * sy").alias("num"),
        F.expr("n * sxx - sx * sx").alias("den"),
    )
    b = "(cast(num as double) / cast(den as double))"
    a = (
        "(cast(sy as double) / cast(n as double)"
        f" - {b} * cast(sx as double) / cast(n as double))"
    )
    tc = f"(({float(th)!r}e0 - {a}) / {b} - cast(n as double))"
    return mom.select(
        "n", "num", "den",
        F.expr(
            f"case when den <> 0 then {b} end"
        ).alias("slope"),
        F.expr(
            f"case when den <> 0 and num <> 0 and {tc} > 0.0e0"
            f" then {tc} end"
        ).alias("t_cross"),
    )


def burn_rate(
    df: DataFrame,
    order: str,
    is_error: str,
    budget_num: int,
    budget_den: int,
    windows: list[int] | None = None,
) -> DataFrame:
    """Multi-window error-budget burn rate (the SRE paging rule:
    how fast is the SLO budget burning over the last w events?):

        burn(w) = error_rate(w) / budget
                = errors_w * den / (w * num)

    Exact integer cross-multiplied; burn one division. Windows
    are trailing event counts. Output per window: (w, n_errors,
    burn).

    Scale: one rank window + |windows| conditional sums.
    """
    bn, bd = int(budget_num), int(budget_den)
    ws = sorted(int(x) for x in (windows or [100, 1000]))
    w = Window.orderBy(F.col("o").desc())
    base = (
        df.select(
            F.col(order).alias("o"),
            F.col(is_error).cast("long").alias("e"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
    )
    ladder = base.select(
        "e", "rn",
        F.explode(F.array(*[F.lit(x) for x in ws])).alias("w"),
    ).where(F.col("rn") <= F.col("w"))
    agg = ladder.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_in"),
        F.sum("e").alias("n_errors"),
    )
    return agg.select(
        F.col("w").cast("long").alias("w"), "n_errors",
        F.expr(
            f"case when n_in > 0 then cast(n_errors as double)"
            f" * {float(bd)!r}e0"
            f" / (cast(n_in as double) * {float(bn)!r}e0) end"
        ).alias("burn"),
    )
