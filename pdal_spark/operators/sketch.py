"""Distributed cardinality / overlap sketches — the memory-bounded
scale path for counting at corpus scale (exact distinct counts need a
full shuffle of the key universe; a sketch is a few KB of mergeable
state per partition).

Two classics, both deterministic-integer so they hash-match a DuckDB
oracle bit-for-bit:

- HyperLogLog (Flajolet et al. 2007): per-bucket max of the
  trailing-zero rank of an integer hash. The per-bucket ``max`` is a
  map-side-combinable aggregate — registers merge associatively, the
  defining property that lets 1000 executors sketch 100 TB and merge
  64 numbers at the driver.
- KMV / bottom-k (Bar-Yossef et al. 2002): the k smallest distinct
  hash values; union/intersection of two corpora estimated from the
  merged bottom-k — the "how much does crawl B overlap crawl A"
  estimator that never joins the corpora.

Reference analog: PDAL's stats/hexbin aggregate per-cell summaries in
one pass (filters/StatsFilter.hpp:60-210 merge support); these are
the sublinear-state versions of the same merge-at-done pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G

HLL_P = 6  # 2^6 = 64 buckets
HLL_M = 1 << HLL_P
# alpha_m for m = 64 (Flajolet et al., Fig. 3): 0.7213/(1+1.079/m)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_RHO_K = 30  # fixed-point exponent: sum(2^(K - rho)) stays integer


def _hll_rho_sql(suffix: str) -> str:
    """rho = 1 + trailing zeros of the 25-bit hash suffix (0 suffix
    -> max rank 26). bit_count((s & -s) - 1) counts trailing zeros —
    pure integer ops, identical in both dialects."""
    tz = f"bit_count((({suffix}) & -({suffix})) - 1)"
    return f"(CASE WHEN ({suffix}) = 0 THEN 26 ELSE {tz} + 1 END)"


def hll_rho_sql(suffix: str) -> str:
    """Public dialect-neutral alias of the rank expression."""
    return _hll_rho_sql(suffix)


def hll_est_sql() -> str:
    """Dialect-neutral estimate expression over (n_used, sum_q)
    columns: raw HLL estimate with the standard linear-counting
    small-range correction, rounded to 4 decimals (the single ln is
    the only INEXACT term; see sqlgen determinism policy)."""
    raw = (
        f"({G.fnum(HLL_ALPHA * HLL_M * HLL_M)}"
        f" * {G.fnum(float(1 << _RHO_K))}) / cast(sum_q as double)"
    )
    v = f"cast({HLL_M} - n_used as double)"
    est = (
        f"CASE WHEN ({raw}) <= {G.fnum(2.5 * HLL_M)}"
        f" AND n_used < {HLL_M}"
        f" THEN {G.fnum(float(HLL_M))} * ln({G.fnum(float(HLL_M))} / {v})"
        f" ELSE ({raw}) END"
    )
    return f"round({est}, 4)"


def hll_estimate(df: DataFrame, elem_col: str) -> DataFrame:
    """One-row DataFrame: HyperLogLog distinct-count estimate of
    ``elem_col`` (integer column). Columns: n_used (non-empty
    buckets), sum_q (exact integer register sum at the 2^-30 grid),
    hll_est (rounded; with the standard small-range linear-counting
    correction).

    Scale: ONE map-side-combined groupBy to <= 64 rows, then a
    64-row final fold — the shuffle carries registers, never
    elements.
    """
    h = G.mix_hash(f"`{elem_col}`")
    bucket = F.expr(f"({h} % {HLL_M})")
    suffix = F.expr(f"(({h}) div {HLL_M})")
    regs = (
        df.select(bucket.alias("__bkt"), suffix.alias("__sfx"))
        .withColumn("__rho", F.expr(_hll_rho_sql("`__sfx`")))
        .groupBy("__bkt")
        .agg(F.max("__rho").alias("rho"))
    )
    folded = regs.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {_RHO_K} - rho)")
        ).alias("__used_q"),
    )
    # empty buckets contribute 2^(K-0) each
    sum_q = F.expr(
        f"__used_q + cast({HLL_M} - n_used as bigint)"
        f" * shiftleft(cast(1 as bigint), {_RHO_K})"
    )
    out = folded.withColumn("sum_q", sum_q).select("n_used", "sum_q")
    return out.withColumn("hll_est", F.expr(hll_est_sql()))


def kmv_bottom_k(
    df: DataFrame, elem_col: str, k: int, out: str = "h"
) -> DataFrame:
    """The k smallest distinct hash values of an integer element
    column (the KMV synopsis). Distinct first (hash ties impossible
    after), then a global bottom-k — Spark executes orderBy+limit as
    per-partition TakeOrdered + a k-row driver merge, so no full
    sort/shuffle of the distinct set."""
    h = G.mix_hash(f"`{elem_col}`")
    return (
        df.select(F.expr(h).alias(out))
        .distinct()
        .orderBy(out)
        .limit(k)
    )


def kmv_overlap(
    a: DataFrame, b: DataFrame, elem_col: str, k: int = 32
) -> DataFrame:
    """One-row corpus-overlap estimate from two KMV synopses: the
    bottom-k of A UNION B is an unbiased k-sample of the union, and
    the fraction of it present in both synopses estimates Jaccard
    (Bar-Yossef et al. 2002). Columns: k_used, n_both, jaccard_est
    (exact integer ratio). Never joins the corpora — only three
    k-row synopses meet."""
    ka = kmv_bottom_k(a, elem_col, k)
    kb = kmv_bottom_k(b, elem_col, k)
    ku = ka.unionByName(kb).distinct().orderBy("h").limit(k)
    both = (
        ku.join(ka.withColumnRenamed("h", "ha"),
                F.col("h") == F.col("ha"), "left")
        .join(kb.withColumnRenamed("h", "hb"),
              F.col("h") == F.col("hb"), "left")
        .select(
            "h",
            (F.col("ha").isNotNull() & F.col("hb").isNotNull())
            .alias("__in_both"),
        )
    )
    return both.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.sum(F.when(F.col("__in_both"), 1).otherwise(0)).alias("n_both"),
    ).withColumn(
        "jaccard_est",
        F.expr("round(cast(n_both as double) / k_used, 6)"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): fixed d x w count
# table; est(x) = min over rows of counts[i][h_i(x)] — always >= the
# true count, with bounded overestimate. The heavy-hitter / frequency
# primitive when the key universe is too large to groupBy exactly.
# ---------------------------------------------------------------------------

CMS_D = 3
CMS_W = 256


def _cms_col(elem: str, i: int, w: int) -> str:
    """Row-i column index of an integer element (independent rows via
    the i-salted non-linear hash)."""
    return f"({G.mix_hash(f'(({elem}) * 31 + {i})')} % {w})"


def cms_build(
    df: DataFrame, elem_col: str, d: int = CMS_D, w: int = CMS_W,
    weight_col: str | None = None,
) -> DataFrame:
    """Fold element occurrences into the d x w count table
    (row, col, cnt). ONE map-side-combined groupBy to <= d*w rows;
    rows merge by addition across partitions/batches (mergeable
    sketch state, like the HLL registers)."""
    cells = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    F.expr(_cms_col(f"`{elem_col}`", i, w)).alias("col"),
                )
                for i in range(d)
            ])
        ).alias("rc"),
        *(
            [F.col(weight_col).alias("__wt")]
            if weight_col
            else [F.lit(1).cast("long").alias("__wt")]
        ),
    )
    return (
        cells.select("rc.row", "rc.col", "__wt")
        .groupBy("row", "col")
        .agg(F.sum("__wt").alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame, cms: DataFrame, elem_col: str,
    d: int = CMS_D, w: int = CMS_W, out: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch for each probe row: min over the d
    cells the element hashes to. Broadcast join (the sketch is <= d*w
    rows); probes never shuffle."""
    cells = probes.select(
        f"`{elem_col}`",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    F.expr(_cms_col(f"`{elem_col}`", i, w)).alias("col"),
                )
                for i in range(d)
            ])
        ).alias("rc"),
    ).select(elem_col, "rc.row", "rc.col")
    joined = cells.join(F.broadcast(cms), on=["row", "col"], how="left")
    return (
        joined.groupBy(elem_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out)
        )
    )


# ---------------------------------------------------------------------------
# HDR histogram quantile sketch (hdrhistogram.org: exponent buckets +
# linear mantissa sub-buckets — the integer-exact, mergeable quantile
# sketch; bounded relative error 2^-sub_bits, fixed state size)
# ---------------------------------------------------------------------------

HDR_SUB_BITS = 3  # 8 sub-buckets/octave -> <= 12.5% relative error


def _msb_sql(v: str, max_bits: int = 62) -> str:
    """floor(log2(v)) for v >= 1 as a pure-comparison CASE ladder —
    no libm, bit-identical across engines, constant-folded branches
    inside whole-stage codegen."""
    whens = " ".join(
        f"WHEN ({v}) >= {1 << b} THEN {b}"
        for b in range(max_bits, 0, -1)
    )
    return f"(CASE {whens} ELSE 0 END)"


def hdr_bucket_sql(v: str, sub_bits: int, d: G.Dialect) -> str:
    """Monotone bucket id of integer v >= 1: values below 2^sub_bits
    are exact singleton buckets (id = v); above, id =
    ((e - S + 1) << S) + mantissa-top-S-bits, e = floor(log2 v).
    Pure integer compare/shift arithmetic in both dialects."""
    s = int(sub_bits)
    e = _msb_sql(v)
    if d.name == "spark":
        m = f"(shiftright({v}, ({e}) - {s}) - {1 << s})"
        big = f"(shiftleft(({e}) - {s} + 1, {s}) + {m})"
    else:
        m = f"((({v}) >> (({e}) - {s})) - {1 << s})"
        big = f"((((({e}) - {s} + 1) << {s})) + {m})"
    return f"(CASE WHEN ({e}) < {s} THEN ({v}) ELSE {big} END)"


def hdr_lb_sql(v: str, sub_bits: int, d: G.Dialect) -> str:
    """Bucket lower bound (the quantile estimate the bucket reports):
    exact v for singletons, (2^S + m) << (e - S) above."""
    s = int(sub_bits)
    e = _msb_sql(v)
    if d.name == "spark":
        m = f"(shiftright({v}, ({e}) - {s}) - {1 << s})"
        big = f"shiftleft({1 << s} + {m}, ({e}) - {s})"
    else:
        m = f"((({v}) >> (({e}) - {s})) - {1 << s})"
        big = f"((({1 << s} + {m})) << (({e}) - {s}))"
    return f"(CASE WHEN ({e}) < {s} THEN ({v}) ELSE {big} END)"


def hdr_histogram(
    df: DataFrame, value_col: str, sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """(bucket, lb, cnt) HDR histogram of a positive integer column.
    Bucket ids are monotone in value, so bucket order == value order;
    state is <= 63 * 2^sub_bits rows regardless of input size, and
    histograms MERGE by summing cnt per bucket (the same
    partial/final shape as StatsFilter.hpp:64's moment merge).

    Scale: ONE map-side-combined groupBy; the shuffle carries bucket
    counters, never values. 2^-sub_bits bounded relative error:
    lb <= v < lb * (1 + 2^-sub_bits) for every v in the bucket.
    """
    d = G.SPARK
    v = f"cast(`{value_col}` as bigint)"
    return (
        df.where(F.expr(f"{v} >= 1"))
        .select(
            F.expr(hdr_bucket_sql(v, sub_bits, d)).alias("bucket"),
            F.expr(hdr_lb_sql(v, sub_bits, d)).alias("lb"),
        )
        .groupBy("bucket")
        .agg(
            F.max("lb").alias("lb"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def hdr_quantile(
    df: DataFrame,
    value_col: str,
    quantiles: list[tuple[int, int]] = ((1, 4), (1, 2), (3, 4),
                                        (9, 10), (99, 100)),
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """(q_num, q_den, est) — the bucket lower bound at each rank
    ceil(q * n): a deterministic, integer-exact quantile estimate
    with relative error < 2^-sub_bits. Rank arithmetic is integer
    (ceil(a*n/b) = (a*n + b - 1) div b), so the answer is identical
    under any partitioning or merge order — the property
    percentile_approx (GK sketch, order-dependent) does not have.

    Scale: the histogram reduces the data to <= 63 * 2^sub_bits
    counter rows; the cumulative window runs on that tiny aggregate
    (single-partition by design — it is post-aggregation state, not
    data)."""
    from pyspark.sql import Window

    hist = hdr_histogram(df, value_col, sub_bits)
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
    )
    qdf = cum.sparkSession.createDataFrame(
        [(int(a), int(b)) for a, b in quantiles], "q_num int, q_den int"
    )
    ranked = cum.crossJoin(F.broadcast(qdf)).where(
        F.expr("cum >= ((q_num * total + q_den - 1) div q_den)")
    )
    return (
        ranked.groupBy("q_num", "q_den")
        .agg(F.min("lb").alias("est"))
    )


def hll_by_group(
    df: DataFrame, elem_col: str, group_col: str,
) -> DataFrame:
    """Per-group HyperLogLog distinct count: (group, n_used, sum_q,
    hll_est). Same register pipeline as hll_estimate with the group
    key carried through — the GROUP BY form every approx-distinct
    dashboard query takes (Spark's approx_count_distinct is the same
    shape but its HLL++ bias tables are not oracle-mirrorable).

    Scale: one map-side-combined groupBy to <= 64 rows PER GROUP,
    then a per-group 64-row fold; elements never shuffle."""
    h = G.mix_hash(f"`{elem_col}`")
    regs = (
        df.select(
            F.col(group_col),
            F.expr(f"({h} % {HLL_M})").alias("__bkt"),
            F.expr(f"(({h}) div {HLL_M})").alias("__sfx"),
        )
        .withColumn("__rho", F.expr(_hll_rho_sql("`__sfx`")))
        .groupBy(group_col, "__bkt")
        .agg(F.max("__rho").alias("rho"))
    )
    folded = regs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {_RHO_K} - rho)")
        ).alias("__used_q"),
    )
    sum_q = F.expr(
        f"__used_q + cast({HLL_M} - n_used as bigint)"
        f" * shiftleft(cast(1 as bigint), {_RHO_K})"
    )
    return (
        folded.withColumn("sum_q", sum_q)
        .select(group_col, "n_used", "sum_q")
        .withColumn("hll_est", F.expr(hll_est_sql()))
    )


def kmv_sketch(
    df: DataFrame,
    group: str,
    elem: str,
    k: int = 32,
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group (Bar-Yossef
    2002; the Theta-sketch family's deterministic core): hash every
    element with mix_hash (uniform over [0, M31)), keep the k
    smallest DISTINCT hashes per group; if a group has >= k distinct
    values, estimate distinct = (k-1) * M31 div h_k (h_k = kth
    smallest), else the exact count. The GROUPED, estimating sibling
    of kmv_bottom_k (which builds one whole-DataFrame synopsis). Output: (group, n_kept,
    kth_hash, est_q) — all integers, bit-reproducible, and MERGEABLE
    (the k smallest of a union is computable from per-shard k
    smallest; see kmv_jaccard for the set-operation use).

    Scale: distinct-hash reduction then a k-row heap per group
    (WindowGroupLimit pushes rank <= k below the sort) — the shuffle
    carries (group, hash) pairs only; the estimate is exact integer
    division, so unlike approx_count_distinct's HLL it value-hashes
    against an oracle.
    """
    from pyspark.sql import Window

    h = F.expr(G.mix_hash(f"`{elem}`"))
    hashes = (
        df.select(F.col(group).alias("grp"), h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy(F.col("h").asc())
    kept = (
        hashes.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= int(k))
    )
    return kept.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_hash"),
    ).select(
        F.col("grp").alias(group),
        "n_kept",
        "kth_hash",
        F.when(
            F.col("n_kept") >= int(k),
            F.expr(f"(cast({int(k) - 1} as bigint) * {G.M31})"
                   " div kth_hash"),
        ).otherwise(F.col("n_kept").cast("long")).alias("est_q"),
    )


def kmv_jaccard(
    df: DataFrame,
    group: str,
    elem: str,
    ga,
    gb,
    k: int = 32,
) -> DataFrame:
    """KMV set-operation estimate between two groups' element sets:
    build the UNION sketch (k smallest distinct hashes of A union B),
    count how many of those k are in both A and B (matches), then
    jaccard_q = matches * JACC_Q div n_union_kept and
    inter_est_q = matches * union_est div n_union_kept
    (Beyer 2007 — the unbiased KMV Jaccard/intersection estimator).
    Output: one row (n_union_kept, union_kth, union_est_q, matches,
    jaccard_q, inter_est_q), all integer-exact. Complements
    kmv_overlap (two-DataFrame float form): this is the single-table
    grouped form and adds the union/intersection CARDINALITY
    estimates, with integer outputs that value-hash.

    Scale: two filtered scans reduced to distinct (group, hash)
    pairs; the union heap is a single k-row TakeOrderedAndProject
    (orderBy + limit — per-partition heaps merged on the driver,
    NEVER a global one-partition window); membership flags ride the
    same rows (max of per-side flags under the distinct), so no
    extra join against the full sets.
    """
    h = F.expr(G.mix_hash(f"`{elem}`"))
    sides = (
        df.where(F.col(group).isin([ga, gb]))
        .select(
            h.alias("h"),
            F.when(F.col(group) == ga, 1).otherwise(0).alias("in_a"),
            F.when(F.col(group) == gb, 1).otherwise(0).alias("in_b"),
        )
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    kept = sides.orderBy(F.col("h").asc()).limit(int(k))
    return kept.agg(
        F.count(F.lit(1)).alias("n_union_kept"),
        F.max("h").alias("union_kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("matches"),
    ).select(
        "n_union_kept",
        "union_kth",
        F.when(
            F.col("n_union_kept") >= int(k),
            F.expr(f"(cast({int(k) - 1} as bigint) * {G.M31})"
                   " div union_kth"),
        ).otherwise(F.col("n_union_kept").cast("long"))
        .alias("union_est_q"),
        F.col("matches").cast("long").alias("matches"),
        F.expr(f"(matches * {KMV_JACC_Q}) div n_union_kept")
        .cast("long").alias("jaccard_q"),
    ).withColumn(
        "inter_est_q",
        F.expr("(matches * union_est_q) div n_union_kept"),
    )


KMV_JACC_Q = 10**6  # fixed-point scale for the KMV Jaccard estimate


AMS_T = 16  # default estimator count for the F2 sketch


def ams_f2(
    df: DataFrame,
    elem: str,
    t: int = AMS_T,
) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996):
    per estimator i, z_i = sum over rows of sign_i(element) with
    sign_i(e) = 1 - 2*(mix_hash(e*53 + i) % 2); E[z_i^2] = F2 =
    sum of freq^2 — the self-join size / skew estimator that decides
    salting factors before a join runs. Output: one row
    (f2_med, f2_mean, t) — median and mean of the t estimates, all
    integer (lower median by rank: deterministic).

    Scale: one row-local explode to t sign rows + one map-side-
    combined groupBy(i) — the shuffle carries t rows per partition;
    the median is a t-row sort on the driver-sized estimator table.
    Every intermediate is int64 (|z_i| <= n_rows), so the estimate
    value-hashes cross-engine, unlike sampling-based F2 guesses.
    """
    from pyspark.sql import Window

    ti = int(t)
    signs = df.select(
        F.col(elem).alias("e"),
        F.explode(F.sequence(F.lit(0), F.lit(ti - 1))).alias("i"),
    ).select(
        "i",
        F.expr(
            f"1 - 2 * ({G.mix_hash('(e * 53 + i)')} % 2)"
        ).alias("s"),
    )
    est = signs.groupBy("i").agg(F.sum("s").alias("z")).select(
        "i", (F.col("z") * F.col("z")).cast("long").alias("f2")
    )
    w = Window.orderBy(F.col("f2").asc(), F.col("i").asc())
    return (
        est.withColumn("rk", F.row_number().over(w))
        .agg(
            F.max(F.when(F.col("rk") == (ti + 1) // 2, F.col("f2")))
            .alias("f2_med"),
            F.expr(f"sum(f2) div {ti}").alias("f2_mean"),
            F.lit(ti).alias("t"),
        )
    )


def hll_intersect(
    df: DataFrame, group_col: str, elem_col: str,
    g_a, g_b,
) -> DataFrame:
    """HLL set-operation estimates between two groups WITHOUT joining
    their elements: per-group 64-register sketches, a union sketch =
    per-bucket max (the HLL merge), and the inclusion-exclusion
    intersection est_a + est_b - est_union — the crawl-overlap /
    audience-overlap question answered from mergeable register state
    (the KMV twin kmv_jaccard trades accuracy differently: KMV gives
    Jaccard directly, HLL composes with any pre-aggregated sketch).

    Output one row: n_used/sum_q per sketch (exact integers) +
    est_a, est_b, est_union, est_intersect (rounded — ln is the one
    INEXACT term). Inclusion-exclusion can go negative on small
    overlaps (standard HLL caveat) — floor at 0.

    Scale: ONE map-side-combined groupBy to <= 2*64 register rows;
    everything after is a constant-size fold.
    """
    h = G.mix_hash(f"`{elem_col}`")
    regs = (
        df.where(F.col(group_col).isin([g_a, g_b]))
        .select(
            F.when(F.col(group_col) == g_a, F.lit(0))
            .otherwise(F.lit(1)).alias("__g"),
            F.expr(f"({h} % {HLL_M})").alias("__bkt"),
            F.expr(f"(({h}) div {HLL_M})").alias("__sfx"),
        )
        .withColumn("__rho", F.expr(_hll_rho_sql("`__sfx`")))
        .groupBy("__g", "__bkt")
        .agg(F.max("__rho").alias("rho"))
    )

    def fold(r: DataFrame, tag: str) -> DataFrame:
        f = r.agg(
            F.count(F.lit(1)).alias("n_used"),
            F.sum(
                F.expr(f"shiftleft(cast(1 as bigint), {_RHO_K} - rho)")
            ).alias("__uq"),
        ).select(
            F.col("n_used").alias(f"n_used_{tag}"),
            F.expr(
                f"__uq + cast({HLL_M} - n_used as bigint)"
                f" * shiftleft(cast(1 as bigint), {_RHO_K})"
            ).alias(f"sum_q_{tag}"),
        )
        return f

    a = fold(regs.where("__g = 0"), "a")
    b = fold(regs.where("__g = 1"), "b")
    u = fold(
        regs.groupBy("__bkt").agg(F.max("rho").alias("rho")), "u"
    )
    one = a.crossJoin(b).crossJoin(u)

    def est(tag: str) -> str:
        return (
            hll_est_sql()
            .replace("n_used", f"n_used_{tag}")
            .replace("sum_q", f"sum_q_{tag}")
        )

    return one.select(
        "n_used_a", "sum_q_a", "n_used_b", "sum_q_b",
        "n_used_u", "sum_q_u",
        F.expr(est("a")).alias("est_a"),
        F.expr(est("b")).alias("est_b"),
        F.expr(est("u")).alias("est_union"),
        F.expr(
            f"round(greatest(0.0e0, {est('a')} + {est('b')}"
            f" - {est('u')}), 4)"
        ).alias("est_intersect"),
    )


def hdr_quantile_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[tuple[int, int]] = ((1, 2), (9, 10), (99, 100)),
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Per-group HDR quantiles — the GROUP BY form of hdr_quantile
    (per-domain latency/length percentiles on one dashboard pass):
    (group, q_num, q_den, est) with the same deterministic integer
    rank rule, relative error < 2^-sub_bits.

    Scale: ONE map-side-combined groupBy to <= 63*2^sub_bits counter
    rows PER GROUP; the cumulative window partitions by group over
    those counters (post-aggregation state, not data).
    """
    from pyspark.sql import Window

    d = G.SPARK
    v = f"cast(`{value_col}` as bigint)"
    hist = (
        df.where(F.expr(f"{v} >= 1"))
        .select(
            F.col(group_col).alias("g"),
            F.expr(hdr_bucket_sql(v, sub_bits, d)).alias("bucket"),
            F.expr(hdr_lb_sql(v, sub_bits, d)).alias("lb"),
        )
        .groupBy("g", "bucket")
        .agg(F.min("lb").alias("lb"), F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("g").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("g")
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(wt)
    )
    qdf = cum.sparkSession.createDataFrame(
        [(int(a), int(b)) for a, b in quantiles], "q_num int, q_den int"
    )
    ranked = cum.crossJoin(F.broadcast(qdf)).where(
        F.expr("cum >= ((q_num * total + q_den - 1) div q_den)")
    )
    return (
        ranked.groupBy(F.col("g").alias(group_col), "q_num", "q_den")
        .agg(F.min("lb").alias("est"))
    )



def capture_recapture(
    snap_a: DataFrame, snap_b: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Lincoln-Petersen / Chapman capture-recapture population
    estimate — how big is the UNSEEN whole, from two independent
    samples' overlap: the classic "how many pages does the web
    host / how many entities exist" estimator over two crawl
    snapshots (snapshot_diff counts the churn; this infers the
    total).

        LP      = n1 * n2 / m
        Chapman = (n1 + 1)(n2 + 1) / (m + 1) - 1   (bias-corrected,
                  defined even at m = 0)

    n1/n2/m are exact int64 (m from ONE hash semi-join on distinct
    ids); both estimators are single IEEE chains; LP is NULL at
    m = 0.

    Scale: two distinct-aggregates + one equi-join on the id —
    nothing quadratic, AQE-eligible.
    """
    a = snap_a.select(F.col(id_col).alias("__id")).distinct()
    b = snap_b.select(F.col(id_col).alias("__id")).distinct()
    n1 = a.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2 = b.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    m = a.join(b, on="__id").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .select(
            "n1", "n2", "m",
            F.expr(
                "case when m > 0 then"
                " cast(n1 as double) * cast(n2 as double)"
                " / cast(m as double) end"
            ).alias("lincoln_petersen"),
            F.expr(
                "(cast(n1 as double) + 1.0e0)"
                " * (cast(n2 as double) + 1.0e0)"
                " / (cast(m as double) + 1.0e0) - 1.0e0"
            ).alias("chapman"),
        )
    )


def chao1_richness(
    df: DataFrame, elem: str = "elem"
) -> DataFrame:
    """Chao1 species-richness estimator (Chao 1984) — how many
    DISTINCT elements exist including the never-seen ones, from the
    singleton/doubleton profile: total vocabulary, total unique
    URLs, total entities a longer crawl would find (the unseen-mass
    sibling of good_turing's probability discounts).

        Chao1 = S + f1 (f1 - 1) / (2 (f2 + 1))   (bias-corrected
                form — defined even when f2 = 0)

    S (observed distinct), f1 (seen once), f2 (seen twice) are exact
    int64 off TWO map-side-combined aggregates (element counts, then
    the frequency-of-frequencies fold); the estimate is one IEEE
    chain.

    Scale: groupBy(elem) + a 3-number fold — the good_turing plan.
    """
    cnt = df.groupBy(F.col(elem).alias("__e")).agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = cnt.agg(
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.sum(F.expr("case when c = 1 then 1 else 0 end"))
        .cast("long").alias("f1"),
        F.sum(F.expr("case when c = 2 then 1 else 0 end"))
        .cast("long").alias("f2"),
    )
    return agg.select(
        "s_obs", "f1", "f2",
        F.expr(
            "cast(s_obs as double)"
            " + cast(f1 as double) * (cast(f1 as double) - 1.0e0)"
            " / (2.0e0 * (cast(f2 as double) + 1.0e0))"
        ).alias("chao1"),
    )
