"""Aggregation / statistics ops (SURVEY.md §2.6).

filters.stats (StatsFilter.hpp:60-210) computes per-dimension
streaming moments with partial/final merge — which is exactly Spark's
hash-aggregate; every moment maps to a built-in Catalyst aggregate
with map-side partial aggregation. filters.expressionstats, iqr, mad
and elm are thin compositions on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdal_spark.functions.expr import compile_expression
from pdal_spark.sqlgen import SPARK


def stats(
    df: DataFrame,
    dimensions: list[str],
    advanced: bool = False,
    enumerate_dims: list[str] | None = None,
) -> DataFrame:
    """filters.stats: one row per dimension with count/min/max/avg/
    variance/stddev (+ skewness/kurtosis when advanced — PDAL computes
    M3/M4 only if requested). `enumerate` -> distinct values
    (StatsFilter.cpp:198-220)."""
    frames = []
    enumerate_dims = enumerate_dims or []
    for d in dimensions:
        c = F.col(d).cast("double")
        aggs = [
            F.count(c).alias("cnt"),
            F.min(c).alias("minimum"),
            F.max(c).alias("maximum"),
            F.avg(c).alias("average"),
            F.var_samp(c).alias("variance"),
            F.stddev_samp(c).alias("stddev"),
        ]
        if advanced:
            aggs += [
                F.skewness(c).alias("skewness"),
                F.kurtosis(c).alias("kurtosis"),
            ]
        row = df.agg(*aggs).withColumn("dimension", F.lit(d))
        if d in enumerate_dims:
            vals = df.agg(
                F.sort_array(F.collect_set(F.col(d))).alias("values")
            )
            row = row.crossJoin(vals)
        frames.append(row)
    out = frames[0]
    for fme in frames[1:]:
        out = out.unionByName(fme, allowMissingColumns=True)
    return out


def expression_stats(
    df: DataFrame, dimension: str, expressions: list[str]
) -> DataFrame:
    """filters.expressionstats (ExpressionStatsFilter.cpp): per value
    of `dimension`, count of rows passing each expression."""
    aggs = [F.count(F.lit(1)).alias("total")]
    for i, e in enumerate(expressions):
        pred = F.expr(compile_expression(e, SPARK))
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).alias(f"pass_{i}")
        )
    return df.groupBy(dimension).agg(*aggs)


def iqr_filter(df: DataFrame, dimension: str, k: float = 1.5) -> DataFrame:
    """filters.iqr (IQRFilter.cpp): cull rows outside
    [Q1 - k*IQR, Q3 + k*IQR]. Two-phase: tiny percentile agg
    broadcast back as a predicate — no second shuffle of the data."""
    # exact interpolated percentiles (not approx): deterministic, and
    # the DuckDB oracle's quantile_cont matches them exactly
    q = df.agg(
        F.percentile(dimension, F.array(F.lit(0.25), F.lit(0.75)))
        .alias("q")
    ).collect()[0]["q"]
    q1, q3 = float(q[0]), float(q[1])
    lo, hi = q1 - k * (q3 - q1), q3 + k * (q3 - q1)
    return df.where(F.col(dimension).between(lo, hi))


def mad_filter(df: DataFrame, dimension: str, k: float = 2.0) -> DataFrame:
    """filters.mad (MADFilter.cpp): cull rows with
    |v - median| > k * MAD (MAD scaled as in the reference)."""
    med = df.agg(F.median(dimension).alias("m")).collect()[0]["m"]
    mad = (
        df.select(F.abs(F.col(dimension) - float(med)).alias("ad"))
        .agg(F.median("ad").alias("mad"))
        .collect()[0]["mad"]
    )
    scaled = 1.4826 * float(mad)
    return df.where(
        F.abs(F.col(dimension) - float(med)) <= k * scaled
    )


def info(df: DataFrame) -> DataFrame:
    """filters.info (InfoFilter.cpp:255): bbox + schema summary of the
    numeric columns, one row per column."""
    num_cols = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in
        ("double", "float", "long", "integer", "short", "byte")
    ]
    return stats(df, num_cols)


def eval_classification(
    df, predicted: str = "cls", truth: str = "truth"
):
    """kernels.eval (`pdal eval`; EvalKernel.cpp:120-176): score a
    predicted classification against ground truth. Returns one row
    per label: (label, tp, fp, fn, tn, precision, recall, f1,
    accuracy) — the reference's per-label metrics; its
    overall_accuracy = sum(tp) / sum(tp+fp+fn+tn grouped) is
    derivable by the caller from the counts.

    Distributed shape: ONE shuffle builds the (truth, predicted)
    confusion matrix — everything after operates on the tiny matrix
    (|labels|^2 rows), never the data again. Ratios are int/int IEEE
    divisions, deterministic in any engine; empty denominators score
    0.0 like the reference's guarded divisions.
    """
    from pyspark.sql import functions as F

    cm = (
        df.select(
            F.col(truth).alias("t"), F.col(predicted).alias("p")
        )
        .groupBy("t", "p")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    total = cm.agg(F.sum("n")).collect()[0][0]
    if not total:  # empty input: empty scorecard, stable schema
        return cm.select(
            F.col("t").alias("label"),
            F.lit(0).cast("long").alias("tp"),
            F.lit(0).cast("long").alias("fp"),
            F.lit(0).cast("long").alias("fn"),
            F.lit(0).cast("long").alias("tn"),
            F.lit(0.0).alias("precision"),
            F.lit(0.0).alias("recall"),
            F.lit(0.0).alias("f1"),
            F.lit(0.0).alias("accuracy"),
        )
    labels = (
        cm.select(F.col("t").alias("label"))
        .unionByName(cm.select(F.col("p").alias("label")))
        .distinct()
    )
    tp = cm.where(F.col("t") == F.col("p")).select(
        F.col("t").alias("label"), F.col("n").alias("tp")
    )
    by_p = cm.groupBy(F.col("p").alias("label")).agg(
        F.sum("n").alias("pred_n")
    )
    by_t = cm.groupBy(F.col("t").alias("label")).agg(
        F.sum("n").alias("truth_n")
    )
    j = (
        labels.join(tp, on="label", how="left")
        .join(by_p, on="label", how="left")
        .join(by_t, on="label", how="left")
        .fillna(0, subset=["tp", "pred_n", "truth_n"])
    )
    tpc = F.col("tp").cast("double")
    fp = (F.col("pred_n") - F.col("tp")).cast("double")
    fn = (F.col("truth_n") - F.col("tp")).cast("double")
    tn = F.lit(float(total)) - tpc - fp - fn
    prec = F.when(tpc + fp > 0, tpc / (tpc + fp)).otherwise(
        F.lit(0.0)
    )
    rec = F.when(tpc + fn > 0, tpc / (tpc + fn)).otherwise(
        F.lit(0.0)
    )
    f1 = F.when(
        prec + rec > 0, F.lit(2.0) * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return j.select(
        "label",
        F.col("tp").cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
        ((tpc + tn) / F.lit(float(total))).alias("accuracy"),
    )


def stats_global(
    df: DataFrame,
    dimensions: list[str],
) -> DataFrame:
    """filters.stats `global` option (StatsFilter.cpp: the optional
    median / MAD block): one row per dimension with count, min, max,
    median and MAD (median absolute deviation, unscaled — the
    reference applies no multiplier here).

    Median/MAD are exact order statistics (no float accumulation), so
    unlike avg/variance these hash-compare bit-for-bit with the
    oracle. Two aggregations per dimension; the median scalar rides
    driver-side between them (O(1) data)."""
    frames = []
    for d in dimensions:
        c = F.col(d).cast("double")
        base = df.agg(
            F.count(c).alias("cnt"),
            F.min(c).alias("minimum"),
            F.max(c).alias("maximum"),
            F.median(c).alias("median"),
        ).collect()[0]
        med = float(base["median"])
        mad = df.agg(
            F.median(F.abs(c - F.lit(med))).alias("mad")
        ).collect()[0]["mad"]
        frames.append(
            df.sparkSession.createDataFrame(
                [(d, int(base["cnt"]), float(base["minimum"]),
                  float(base["maximum"]), med, float(mad))],
                "dimension string, cnt long, minimum double, "
                "maximum double, median double, mad double",
            )
        )
    out = frames[0]
    for fme in frames[1:]:
        out = out.unionByName(fme)
    return out


def score_percentile(
    df: DataFrame, score_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide percentile calibration of an integer score column
    WITHOUT a global sort: pct = count(score' < score) / (n - 1) —
    exactly SQL percent_rank() (min-rank tie semantics), but computed
    from the score HISTOGRAM: one map-side-combined groupBy to one
    row per distinct score, a cumulative window over that tiny
    aggregate, and a broadcast join back. percent_rank() itself needs
    a single-partition global sort of ALL rows — the thing that dies
    first at 100 TB; this form shuffles counters only.
    """
    from pyspark.sql import Window

    hist = df.groupBy(score_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w = (
        Window.orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        hist.withColumn("__cum", F.sum("__cnt").over(w))
        .withColumn(
            "__total",
            F.sum("__cnt").over(
                Window.orderBy(score_col).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .select(
            score_col,
            (F.col("__cum") - F.col("__cnt")).alias("__less"),
            "__total",
        )
    )
    return df.join(F.broadcast(cum), on=score_col).withColumn(
        "pct_rank",
        F.expr(
            "CASE WHEN __total = 1 THEN cast(0.0 as double)"
            " ELSE cast(__less as double)"
            " / cast(__total - 1 as double) END"
        ),
    ).drop("__less", "__total")


def _poisson1_thresholds(max_w: int = 7) -> list[int]:
    """Cumulative Poisson(1) CDF on the M31 integer grid — literal
    constants, so engine and oracle share the exact same ladder."""
    import math

    from pdal_spark import sqlgen as G

    cdf, p, acc = [], math.exp(-1.0), 0.0
    for k in range(max_w):
        acc += p
        cdf.append(min(int(acc * G.M31), G.M31 - 1))
        p /= (k + 1)
    return cdf


def bootstrap_replicas(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicas: int = 16,
    salt: int = 0,
) -> DataFrame:
    """Poisson bootstrap (Chamandy et al. 2012, "Estimating
    uncertainty for massive data streams" — Google's web-scale
    bootstrap): every row enters replica b with weight ~ Poisson(1),
    drawn DETERMINISTICALLY by inverting the Poisson CDF on a hashed
    (id, b) uniform. Unlike the classic resample-n-rows bootstrap it
    needs no global count, no sampling pass per replica, and no RNG
    state: ONE scan computes all B replicas as conditional sums.

    Output: B rows (replica, sum_w, sum_wx, mean_b). value_col must
    be integer-valued (quantize first) so the sums are exact under
    any partitioning; mean_b is the IEEE-exact ratio. Bootstrap SE =
    stddev of mean_b over replicas (see pytest).

    Scale: zero shuffle before the single map-side-combined global
    agg; the agg state is 2B counters.
    """
    from pdal_spark import sqlgen as G

    thr = _poisson1_thresholds()
    aggs = []
    for b in range(int(n_replicas)):
        h = G.mix_hash(f"(`{id_col}` * {int(n_replicas)} + {b + int(salt)})")
        w = " + ".join(
            f"(CASE WHEN ({h}) >= {t} THEN 1 ELSE 0 END)" for t in thr
        )
        aggs.append(F.expr(f"sum({w})").alias(f"__w_{b}"))
        aggs.append(
            F.expr(f"sum(({w}) * cast(`{value_col}` as bigint))")
            .alias(f"__wx_{b}")
        )
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"{b}, `__w_{b}`, `__wx_{b}`" for b in range(int(n_replicas))
    )
    return wide.selectExpr(
        f"stack({int(n_replicas)}, {stack})"
        " as (replica, sum_w, sum_wx)"
    ).withColumn(
        "mean_b",
        F.expr("cast(sum_wx as double) / cast(sum_w as double)"),
    )


def skew_report(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Heavy-key diagnosis for shuffle planning: the top-k hottest
    keys with count, corpus share, and the suggested salt factor
    ceil(cnt * n_keys / n_rows) — i.e. how many times hotter than a
    uniform key, which is exactly how many salt buckets flatten it.
    This is the metrics-table input the north rule's salted
    repartition reads (SCALING.md); AQE skew-join handles joins, but
    groupBy/applyInPandas hot cells need this measured.

    Scale: one map-side-combined groupBy + a global bottom-k
    (TakeOrdered heaps); totals ride a broadcast single row.
    """
    cnt = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnt.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .withColumn(
            "share",
            F.expr("round(cast(cnt as double)"
                   " / cast(n_rows as double), 6)"),
        )
        .withColumn(
            "suggested_salt",
            F.expr("cast((cnt * n_keys + n_rows - 1)"
                   " div n_rows as bigint)"),
        )
        .orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        .limit(int(top_k))
        .select(key_col, "cnt", "n_rows", "n_keys", "share",
                "suggested_salt")
    )


def equi_depth_bins(
    df: DataFrame, value_col: str, n_bins: int, id_col: str
) -> DataFrame:
    """EXACT equi-depth binning (SQL ntile semantics) without a
    global sort: bin = ((rank - 1) * n) div total + 1, where rank is
    the (value, id)-ordered row number computed distributively as
    count(value' < value)  [histogram + cumulative window over the
    tiny aggregate]  +  row_number within the equal-value group
    [bounded per-value windows]. pyspark.ml's QuantileDiscretizer is
    approximate and RNG-free but sketch-based; this is the
    bit-reproducible form. The piecewise tile map reproduces ntile's
    split exactly: with q = total div n and r = total mod n, the
    first r tiles hold q+1 rows and the rest q.

    Scale: one map-side-combined histogram groupBy, a cumulative
    window over <= distinct-values rows, a broadcast join back, and
    per-value (not global) row_number windows.
    """
    from pyspark.sql import Window

    hist = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        hist.withColumn("__cum", F.sum("__cnt").over(w))
        .withColumn(
            "__total",
            F.sum("__cnt").over(
                Window.orderBy(value_col).rowsBetween(
                    Window.unboundedPreceding,
                    Window.unboundedFollowing,
                )
            ),
        )
        .select(
            value_col,
            (F.col("__cum") - F.col("__cnt")).alias("__less"),
            "__total",
        )
    )
    tie = Window.partitionBy(value_col).orderBy(id_col)
    return (
        df.join(F.broadcast(cum), on=value_col)
        .withColumn("__rk", F.col("__less") + F.row_number().over(tie))
        .withColumn("__q", F.expr(f"__total div {int(n_bins)}"))
        .withColumn("__r", F.expr(f"__total % {int(n_bins)}"))
        .withColumn(
            "bin",
            F.expr(
                "cast(CASE WHEN __rk <= __r * (__q + 1)"
                " THEN (__rk + __q) div (__q + 1)"
                " ELSE __r + ((__rk - __r * (__q + 1) + __q - 1)"
                " div __q) END as int)"
            ),
        )
        .drop("__less", "__total", "__rk", "__q", "__r")
    )


def grouped_ols(
    df: DataFrame, x_col: str, y_col: str, group_col: str
) -> DataFrame:
    """Per-group ordinary-least-squares fit from exact integer moment
    sums: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept =
    (Sy - slope*Sx)/n — the regr_slope/regr_intercept pair, but with
    int64 moment accumulation (x, y must be integer-valued; quantize
    first) so the fit is identical under any partitioning, unlike
    float-accumulated regr_* whose shuffle-order sums drift.

    Scale: ONE map-side-combined groupBy; agg state is 5 counters
    per group. Output: group, n, slope, intercept (IEEE-exact
    ratios of int64 moments; NULL slope for degenerate groups).
    """
    xs = F.expr(f"cast(`{x_col}` as bigint)")
    ys = F.expr(f"cast(`{y_col}` as bigint)")
    m = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xs).alias("__sx"),
        F.sum(ys).alias("__sy"),
        F.sum(xs * xs).alias("__sxx"),
        F.sum(xs * ys).alias("__sxy"),
    )
    den = F.expr("n * __sxx - __sx * __sx")
    slope = F.expr(
        "CASE WHEN (n * __sxx - __sx * __sx) <> 0 THEN"
        " cast(n * __sxy - __sx * __sy as double)"
        " / cast(n * __sxx - __sx * __sx as double) END"
    )
    return (
        m.withColumn("slope", slope)
        .withColumn(
            "intercept",
            F.expr(
                "(cast(__sy as double) - slope * cast(__sx as double))"
                " / cast(n as double)"
            ),
        )
        .select(group_col, "n", "slope", "intercept")
    )


def grouped_corr(
    df: DataFrame, x_col: str, y_col: str, group_col: str
) -> DataFrame:
    """Per-group Pearson correlation from exact int64 moment sums:
    r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)) —
    corr()'s partitioning-invariant integer-moment sibling (x, y must
    be integer-valued; quantize first). NULL for degenerate groups.

    Scale: ONE map-side-combined groupBy, 6 counters per group.
    """
    xs = F.expr(f"cast(`{x_col}` as bigint)")
    ys = F.expr(f"cast(`{y_col}` as bigint)")
    m = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xs).alias("__sx"),
        F.sum(ys).alias("__sy"),
        F.sum(xs * xs).alias("__sxx"),
        F.sum(ys * ys).alias("__syy"),
        F.sum(xs * ys).alias("__sxy"),
    )
    return m.withColumn(
        "corr",
        F.expr(
            "CASE WHEN (n * __sxx - __sx * __sx) > 0"
            " AND (n * __syy - __sy * __sy) > 0 THEN"
            " cast(n * __sxy - __sx * __sy as double)"
            " / sqrt(cast(n * __sxx - __sx * __sx as double)"
            " * cast(n * __syy - __sy * __sy as double)) END"
        ),
    ).select(group_col, "n", "corr")


LIFT_Q = 10**6  # fixed-point scale for association lift


def cooccurrence(
    df: DataFrame,
    key: str,
    item: str,
    min_count: int = 1,
    max_items_per_key: int | None = None,
) -> DataFrame:
    """Market-basket co-occurrence with association lift (Agrawal
    1993 family): for every unordered item pair appearing together
    under >= min_count distinct keys,
      lift = P(ab) / (P(a) P(b)) = (c_ab * N) / (c_a * c_b)
    in LIFT_Q fixed point (truncating div, all int64 — value-hashes
    cross-engine). Output: (item_a, item_b, pair_keys, lift_q) with
    item_a < item_b. The recommender / query-suggestion statistic a
    web corpus pipeline derives from sessions or co-citations.

    Scale: the pair self-join is per-key — fan-out m^2 for a basket
    of m distinct items, the op's inherent cost. The explicit lever
    is `max_items_per_key`: baskets above the cap are DROPPED
    (standard practice — mega-baskets are bots/crawlers and their
    pairs are noise), bounding fan-out at cap^2 per key. Everything
    else is map-side-combined counts; the per-item count table joins
    un-hinted (AQE broadcasts it when it fits — forcing broadcast of
    an unbounded item universe is an OOM foot-gun), and only the
    1-row key total is hint-broadcast.
    """
    base = df.select(F.col(key).alias("k"),
                     F.col(item).alias("it")).distinct()
    if max_items_per_key is not None:
        sizes = base.groupBy("k").agg(
            F.count(F.lit(1)).alias("__m")
        ).where(F.col("__m") <= int(max_items_per_key)).select("k")
        base = base.join(sizes, on="k", how="leftsemi")
    n_keys = base.select("k").distinct().agg(
        F.count(F.lit(1)).alias("n_keys")
    )
    item_keys = base.groupBy("it").agg(
        F.count(F.lit(1)).alias("c")
    )
    l = base.select("k", F.col("it").alias("item_a"))
    r = base.select("k", F.col("it").alias("item_b"))
    pairs = (
        l.join(r, on="k")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_keys"))
        .where(F.col("pair_keys") >= int(min_count))
    )
    return (
        pairs.join(
            item_keys.select(F.col("it").alias("item_a"),
                             F.col("c").alias("c_a")), on="item_a")
        .join(
            item_keys.select(F.col("it").alias("item_b"),
                             F.col("c").alias("c_b")), on="item_b")
        .crossJoin(F.broadcast(n_keys))
        .select(
            "item_a", "item_b",
            F.col("pair_keys").cast("long").alias("pair_keys"),
            F.expr(
                f"(pair_keys * n_keys * {LIFT_Q}) div (c_a * c_b)"
            ).cast("long").alias("lift_q"),
        )
    )


def theil_sen(
    df: DataFrame,
    key_col: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
) -> DataFrame:
    """Per-group Theil-Sen robust slope (Sen 1968): the MEDIAN of all
    pairwise slopes (y_j - y_i)/(x_j - x_i) over time-ordered points
    — 29% breakdown point, so a burst of outliers that wrecks
    grouped_ols barely moves it. Median = lower median by
    (slope, i, j) order: every slope is ONE IEEE division of exact
    deltas, so ordering and the picked row are bit-identical
    cross-engine. Equal-timestamp pairs are skipped (undefined
    slope). x is MICROSECONDS since epoch (integer on both
    engines — second-level epochs truncate in Spark but keep
    fractions in DuckDB). Output per key: n_pairs, slope (/us).

    Scale: the pair self-join is per-key O(n_k^2) — the exact
    estimator's inherent cost; bound per-key series first (cap/
    sample) beyond ~10^4 rows per key, or use grouped_ols where
    robustness is not needed. The join keys on the GROUP, so skew
    mitigation is the usual salting of hot keys.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts).asc(), F.col(id_col).asc()
    )
    pts = df.select(
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("__x"),
        F.col(value).cast("double").alias("__y"),
        F.row_number().over(w).alias("__i"),
    )
    a = pts.select("__k", F.col("__x").alias("x1"),
                   F.col("__y").alias("y1"), F.col("__i").alias("i"))
    b = pts.select("__k", F.col("__x").alias("x2"),
                   F.col("__y").alias("y2"), F.col("__i").alias("j"))
    pairs = (
        a.join(b, on="__k")
        .where(F.expr("j > i AND x2 <> x1"))
        .select(
            "__k", "i", "j",
            F.expr(
                "(y2 - y1) / cast(x2 - x1 as double)"
            ).alias("__s"),
        )
    )
    pick = Window.partitionBy("__k").orderBy(
        F.col("__s").asc(), F.col("i").asc(), F.col("j").asc()
    )
    cnt = Window.partitionBy("__k")
    return (
        pairs.withColumn("__rn", F.row_number().over(pick))
        .withColumn("__n", F.count(F.lit(1)).over(cnt))
        .where(F.expr("__rn = (__n + 1) div 2"))
        .select(
            F.col("__k").alias(key_col),
            F.col("__n").alias("n_pairs"),
            F.col("__s").alias("slope"),
        )
    )


def cohen_kappa(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Cohen's kappa between two label columns — chance-corrected
    agreement (the inter-annotator / model-vs-model metric next to
    eval_classification's precision/recall): kappa = (n*po - pe) /
    (n*n - pe) with po = agreement count and pe = sum over labels of
    row_marginal * col_marginal. All moments are exact int64; the
    final kappa is one IEEE division (operands < 2^53 through ~10^8
    rows — beyond that, sample). NULL labels drop (unrated items).

    Scale: one map-side-combined groupBy on the (a, b) pair — the
    confusion matrix is |labels|^2 rows; marginals fold from it.
    """
    pairs = df.select(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).where("a IS NOT NULL AND b IS NOT NULL")
    conf = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    ra = conf.groupBy("a").agg(F.sum("c").alias("ra"))
    cb = conf.groupBy("b").agg(F.sum("c").alias("cb"))
    pe = (
        ra.join(cb, ra["a"] == cb["b"])
        .agg(F.sum(F.expr("ra * cb")).alias("pe"))
    )
    po = conf.where("a = b").agg(F.sum("c").alias("po"))
    n = conf.agg(F.sum("c").alias("n"))
    one = n.crossJoin(po).crossJoin(pe).select(
        "n",
        F.coalesce(F.col("po"), F.lit(0)).alias("po"),
        F.coalesce(F.col("pe"), F.lit(0)).alias("pe"),
    )
    return one.select(
        "n", "po", "pe",
        F.expr(
            "CASE WHEN n * n - pe <> 0 THEN"
            " cast(n * po - pe as double)"
            " / cast(n * n - pe as double) END"
        ).alias("kappa"),
    )


BENFORD_Q = 1 << 20
# log10(1 + 1/d) for d = 1..9, the Benford first-digit law
BENFORD_P = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


def benford_deviation(
    df: DataFrame, value_col: str, quant: int = 1000
) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column —
    the classic fabricated-data / synthetic-traffic detector: organic
    heavy-tailed quantities follow P(d) = log10(1+1/d); generated or
    capped data does not. Output one row per digit (digit, obs,
    expected, contrib = (obs - e)^2 / e) plus the caller sums contrib
    for the chi-square statistic.

    First digit extraction is STRING-based on the mill-quantized
    integer (cast bigint -> string is identical in both engines) —
    no log10, so the only floats are the Benford constants (shared
    literals) and the final IEEE ratio.

    Scale: one row-local digit projection + ONE 9-row groupBy.
    """
    from pdal_spark import sqlgen as G

    vq = (
        f"cast(floor(cast(`{value_col}` as double)"
        f" * {G.fnum(float(quant))} + {G.fnum(0.5)}) as bigint)"
    )
    digit = f"cast(substr(cast({vq} as string), 1, 1) as int)"
    obs = (
        df.where(F.expr(f"{vq} >= 1"))
        .select(F.expr(digit).alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    n = obs.agg(F.sum("obs").alias("n"))
    e_case = " ".join(
        f"WHEN {d} THEN {G.fnum(p * 1.0)}"
        for d, p in enumerate(BENFORD_P, start=1)
    )
    return (
        obs.crossJoin(F.broadcast(n))
        .select(
            "digit", "obs",
            F.expr(
                f"(CASE digit {e_case} END)"
                " * cast(n as double)"
            ).alias("expected"),
        )
        .withColumn(
            "contrib",
            F.expr(
                "(cast(obs as double) - expected)"
                " * (cast(obs as double) - expected) / expected"
            ),
        )
    )


def morans_i(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Global Moran's I spatial autocorrelation over a cell-aggregate
    lattice (Moran 1950) — THE geospatial clustering-vs-dispersion
    statistic: I > 0 means neighboring cells have similar values
    (hotspots), I < 0 checkerboard dispersion, ~ -1/(n-1) random.
    Weights are queen adjacency (the 8 touching cells) restricted to
    OBSERVED cells, w_ij = 1.

    Integer-exact moments: deviations are scaled by n (d_i = n*x_i -
    S — the n factors cancel in the ratio), so num = sum over
    adjacent pairs of d_i*d_j and den = sum of d_i^2 are int64-exact;
    I = (n * num) / (W * den) is one IEEE division. Bound: |d| <=
    n*max(x); keep n*max(x) under ~3e9 (res and value scale) or
    pre-scale.

    Scale: adjacency = grid_disk ring-1 explode (row-local) + one
    hash self-join on the cell key; the moment folds are map-side-
    combined. Input is the CELL AGGREGATE (post-rollup), not points.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("xv")
    )
    mom = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("xv").alias("s")
    )
    d = base.crossJoin(F.broadcast(mom)).select(
        "c", F.expr("n * xv - s").alias("d"), "n"
    )
    nbrs = (
        grid_disk(d.select("c"), "c", res=res, k=1,
                  out="nc", ring_out="ring")
        .where(F.col("ring") == 1)
        .select("c", "nc")
    )
    pairs = (
        nbrs.join(d.select(F.col("c").alias("nc"),
                           F.col("d").alias("dj")), on="nc")
        .join(d.select("c", F.col("d").alias("di")), on="c")
    )
    num = pairs.agg(
        F.count(F.lit(1)).alias("w_pairs"),
        F.sum(F.expr("di * dj")).alias("num"),
    )
    den = d.agg(
        F.max("n").alias("n"), F.sum(F.expr("d * d")).alias("den")
    )
    return den.crossJoin(num).select(
        "n", "w_pairs", "num", "den",
        F.expr(
            "CASE WHEN w_pairs > 0 AND den <> 0 THEN"
            " (cast(n as double) * cast(num as double))"
            " / (cast(w_pairs as double) * cast(den as double)) END"
        ).alias("morans_i"),
    )


def getis_ord_gi(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Getis-Ord Gi* hotspot score per cell (Getis & Ord 1992; the
    LOCAL complement of morans_i's global statistic): with binary
    queen weights INCLUDING self, z_i = (sum_{j in N_i} x_j -
    mean * n_i) / (S * sqrt((n*n_i - n_i^2) / (n-1))). |z| > ~2 flags
    hot/cold spots — the per-cell anomaly map (bot farms, event
    bursts) layered on the tile rollup.

    Global moments (n, sum, sum of squares) are exact int64; per-cell
    neighbor sums are exact ints; the z expression is a FIXED chain
    of IEEE ops (+,-,*,/,sqrt — no trig), so values hash-match
    cross-engine without rounding.

    Scale: grid_disk ring<=1 explode (row-local, self included) + ONE
    hash join on the cell key over the cell AGGREGATE + a broadcast
    1-row moment table.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("xv")
    )
    mom = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xv").alias("sx"),
        F.sum(F.expr("xv * xv")).alias("ss"),
    )
    nbrs = grid_disk(
        base.select("c"), "c", res=res, k=1, out="nc", ring_out="ring"
    ).select("c", "nc")  # ring 0 kept: Gi* includes self
    per = (
        nbrs.join(
            base.select(F.col("c").alias("nc"),
                        F.col("xv").alias("xj")),
            on="nc",
        )
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum("xj").alias("nbr_sum"),
        )
    )
    z = (
        "(cast(nbr_sum as double)"
        " - (cast(sx as double) / cast(n as double))"
        " * cast(n_i as double))"
        " / (sqrt(cast(ss as double) / cast(n as double)"
        " - (cast(sx as double) / cast(n as double))"
        " * (cast(sx as double) / cast(n as double)))"
        " * sqrt((cast(n as double) * cast(n_i as double)"
        " - cast(n_i as double) * cast(n_i as double))"
        " / (cast(n as double) - 1.0e0)))"
    )
    return per.crossJoin(F.broadcast(mom)).select(
        F.col("c").alias(cell), "n_i", "nbr_sum",
        F.expr(
            f"CASE WHEN n > n_i AND ss * n > sx * sx THEN {z} END"
        ).alias("gi_z"),
    )


def robust_zscore(
    df: DataFrame,
    group_col: str,
    value: str,
    id_col: str = "event_id",
    k: float = 1.4826,
) -> DataFrame:
    """Per-group robust z-scores: z = (x - median_g) / (k * MAD_g) —
    the outlier score that survives the outliers themselves (mean/
    stddev z-scores are dragged by the very anomalies they should
    flag; filters.mad's per-group, per-row form). k = 1.4826 makes
    MAD consistent with sigma under normality (the reference's
    MADFilter scaling). Groups with MAD = 0 yield NULL z.

    Exact order statistics both engines share (the stats_global
    convention: interpolated median); the final ratio is IEEE.

    Scale: two grouped exact-median aggregations (group-keyed
    shuffles over values) + one broadcast-able join back; no windows
    over the data.
    """
    from pdal_spark import sqlgen as G

    med = df.groupBy(group_col).agg(
        F.expr(f"median(`{value}`)").alias("__med")
    )
    j = df.join(F.broadcast(med), on=group_col)
    mad = (
        j.withColumn("__ad", F.expr(f"abs(`{value}` - __med)"))
        .groupBy(group_col)
        .agg(F.expr("median(__ad)").alias("__mad"))
    )
    out = j.join(F.broadcast(mad), on=group_col)
    z = (
        f"(cast(`{value}` as double) - __med)"
        f" / ({G.fnum(float(k))} * __mad)"
    )
    return out.select(
        group_col, id_col, F.col(value),
        F.expr(
            f"CASE WHEN __mad > 0.0e0 THEN {z} END"
        ).alias("z"),
    )


def ab_test(
    df: DataFrame,
    group_col: str,
    success_pred: str,
    g_a,
    g_b,
) -> DataFrame:
    """Two-proportion z-test between groups A and B: the experiment-
    readout primitive (conversion-rate deltas on event streams).
    success_pred is a SQL boolean over the row. Output one row:
    n_a, x_a, n_b, x_b, and z = (p_a - p_b) / sqrt(p(1-p)(1/n_a +
    1/n_b)) with the pooled p — all from exact integer counts, the z
    a fixed IEEE chain (hash-exact, no rounding). Degenerate pooled
    p in {0, 1} yields NULL z.

    Scale: ONE conditional-aggregation pass (map-side combined) —
    the same single-scan shape as nb_classifier's training.
    """
    # group labels are compared via typed literals (never interpolated
    # into SQL text): quote-bearing / non-string labels are safe.
    is_a = F.col(group_col) == F.lit(g_a)
    is_b = F.col(group_col) == F.lit(g_b)
    ok = F.expr(success_pred)
    one = F.lit(1)
    zero = F.lit(0)
    agg = df.agg(
        F.sum(F.when(is_a, one).otherwise(zero)).alias("n_a"),
        F.sum(F.when(is_a & ok, one).otherwise(zero)).alias("x_a"),
        F.sum(F.when(is_b, one).otherwise(zero)).alias("n_b"),
        F.sum(F.when(is_b & ok, one).otherwise(zero)).alias("x_b"),
    )
    pa = "(cast(x_a as double) / cast(n_a as double))"
    pb = "(cast(x_b as double) / cast(n_b as double))"
    pp = "(cast(x_a + x_b as double) / cast(n_a + n_b as double))"
    z = (
        f"({pa} - {pb}) / sqrt({pp} * (1.0e0 - {pp})"
        " * (1.0e0 / cast(n_a as double)"
        " + 1.0e0 / cast(n_b as double)))"
    )
    return agg.select(
        "n_a", "x_a", "n_b", "x_b",
        F.expr(
            "CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0"
            f" AND x_a + x_b < n_a + n_b THEN {z} END"
        ).alias("z"),
    )


PSI_Q = 1 << 20


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two slices of a numeric
    column (THE production drift monitor: PSI < 0.1 stable, > 0.25
    investigate): equi-width bins over explicit [lo, hi] (clamped —
    the zonemap/zorder explicit-bounds convention), PSI = sum over
    bins of (p_a - p_b) * ln(p_a / p_b) with add-one smoothing on
    the counts (empty bins otherwise blow up the log).

    Per-bin output (bin, n_a, n_b, contrib_q) plus exact integer
    contrib accumulation: contrib = (pa - pb) * ln(pa/pb) where
    pa/pb reduce to integer ratios ((ca+1)*(tb+nb)) / ((cb+1)*
    (ta+na)) — the ln is quantized to the 2^-20 grid and multiplied
    by the exact rational (pa - pb) via integer cross-products, so
    the per-bin contribution is one truncating integer expression:
    hash-exact. Sum contrib_q / PSI_Q^2-ish scaling documented in
    the column (caller folds).

    Scale: two ONE-pass binned counts (map-side combined) + a 
    broadcast join of <= n_bins rows.
    """
    from pdal_spark import sqlgen as G

    span = float(hi) - float(lo)
    b = (
        f"least({int(n_bins) - 1}, greatest(0,"
        f" cast(floor((cast(`{value}` as double) - {G.fnum(lo)})"
        f" / {G.fnum(span)} * {G.fnum(float(n_bins))}) as int)))"
    )

    def counts(d: DataFrame, tag: str) -> DataFrame:
        return d.select(F.expr(b).alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(f"c_{tag}")
        )

    ca = counts(df_a, "a")
    cb = counts(df_b, "b")
    spark = df_a.sparkSession
    bins = spark.range(int(n_bins)).select(
        F.col("id").cast("int").alias("bin")
    )
    j = (
        bins.join(ca, on="bin", how="left")
        .join(cb, on="bin", how="left")
        .select(
            "bin",
            F.coalesce("c_a", F.lit(0)).alias("n_a"),
            F.coalesce("c_b", F.lit(0)).alias("n_b"),
        )
    )
    tot = j.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    w = j.crossJoin(F.broadcast(tot))
    # smoothed pa = (n_a+1)/(ta+n_bins); ratio pa/pb cross-multiplied
    ratio = (
        "(cast((n_a + 1) as double)"
        f" * cast(tb + {int(n_bins)} as double))"
        " / (cast((n_b + 1) as double)"
        f" * cast(ta + {int(n_bins)} as double))"
    )
    lnq = (
        f"cast(floor(ln({ratio}) * {G.fnum(float(PSI_Q))}"
        f" + {G.fnum(0.5)}) as bigint)"
    )
    # (pa - pb) in the common denominator (ta+K)(tb+K):
    # num = (n_a+1)(tb+K) - (n_b+1)(ta+K)
    dnum = (
        f"((n_a + 1) * (tb + {int(n_bins)})"
        f" - (n_b + 1) * (ta + {int(n_bins)}))"
    )
    return w.select(
        "bin", "n_a", "n_b",
        F.expr(f"{dnum} * {lnq}").alias("contrib_q"),
        F.expr(
            f"(cast({dnum} as double)"
            f" / (cast(ta + {int(n_bins)} as double)"
            f" * cast(tb + {int(n_bins)} as double)))"
            f" * (cast({lnq} as double) / {G.fnum(float(PSI_Q))})"
        ).alias("contrib"),
    )


def gini(
    df: DataFrame,
    group_col: str,
    value: str,
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative quantity (traffic
    concentration: is a domain's volume spread across users or
    captured by a few? the inequality lens on skew_report's hot
    keys): with x sorted ascending within the group,
    G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x)).

    x quantizes to integer mills so every moment (sum, rank-weighted
    sum) is exact int64; the final G is one IEEE ratio. Zero-sum
    groups yield NULL.

    Scale: one shuffle on the group key; the rank rides the per-key
    window sort; moments fold map-side.
    """
    from pyspark.sql import Window

    from pdal_spark import sqlgen as G

    vq = (
        f"cast(floor(cast(`{value}` as double) * {G.fnum(1000.0)}"
        f" + {G.fnum(0.5)}) as bigint)"
    )
    w = Window.partitionBy(group_col).orderBy(
        F.expr(vq).asc(), F.col(value).asc()
    )
    ranked = df.withColumn("__vq", F.expr(vq)).withColumn(
        "__i", F.row_number().over(w)
    )
    mom = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__vq").alias("s"),
        F.sum(F.expr("__i * __vq")).alias("iw"),
    )
    return mom.select(
        group_col, "n", "s", "iw",
        F.expr(
            "CASE WHEN s > 0 THEN"
            " cast(2 * iw - (n + 1) * s as double)"
            " / cast(n * s as double) END"
        ).alias("gini"),
    )


ENTROPY_Q = 1 << 20


def category_entropy(
    df: DataFrame,
    group_col: str,
    cat_col: str,
) -> DataFrame:
    """Shannon entropy of each group's categorical mix (nats) — the
    behavioral-diversity fingerprint (a user hammering ONE event type
    scores 0; bots often do): H = ln(n) - (1/n) * sum_c c_i ln(c_i),
    computed from counts so each ln term quantizes once to the 2^-20
    grid and the sum is exact int64; the closing division and ln(n)
    are one IEEE chain, rounded(9) both sides (ln is INEXACT).

    Scale: ONE map-side-combined (group, category) count + a per-
    group fold over |categories| rows.
    """
    from pdal_spark import sqlgen as G

    cnt = df.groupBy(group_col, cat_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    lnq = (
        f"cast(floor(ln(cast(c as double)) * {G.fnum(float(ENTROPY_Q))}"
        f" + {G.fnum(0.5)}) as bigint)"
    )
    mom = cnt.groupBy(group_col).agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_cats"),
        F.sum(F.expr(f"c * ({lnq})")).alias("clnq"),
    )
    return mom.select(
        group_col, "n", "n_cats",
        F.expr(
            "round(ln(cast(n as double))"
            " - (cast(clnq as double)"
            f" / {G.fnum(float(ENTROPY_Q))}) / cast(n as double), 9)"
        ).alias("entropy"),
    )


def calibration_bins(
    df: DataFrame,
    score: str,
    label: str,
    bins: int = 10,
    q: int = 1000,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier (the
    per-bin sufficient statistics of Expected Calibration Error,
    Naeini 2015 — the standard QA gate on quality-classifier scores
    before they drive corpus filtering). Scores quantize to
    integer q-ths (floor(s*q + 0.5)), bin = min(s_q*bins div q,
    bins-1); per bin the output carries ONLY exact integers —
    (bin, n, sum_label, sum_score_q) — from which acc = sum_label/n,
    conf = sum_score_q/(n*q) and ECE = sum n_b*|acc_b-conf_b| / N
    follow in one driver-side line.

    Scale: one codegen'd row-local quantize + one map-side-combined
    groupBy on <= `bins` keys. Nothing else.
    """
    b = int(bins)
    qi = int(q)
    s_q = f"cast(floor(`{score}` * {qi}.0e0 + 0.5e0) as bigint)"
    return (
        df.select(
            F.expr(
                f"cast(least(({s_q} * {b}) div {qi}, {b - 1}) as int)"
            ).alias("bin"),
            F.expr(s_q).alias("__sq"),
            F.col(label).cast("long").alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").alias("sum_label"),
            F.sum("__sq").alias("sum_score_q"),
        )
    )


def classification_eval(
    predicted: DataFrame,
    truth: DataFrame,
    labels: list[int],
    id_col: str = "pid",
    label_col: str = "Classification",
) -> DataFrame:
    """`pdal eval` analog (kernels/EvalKernel.cpp: per-label
    confusion statistics between a predicted and a truth cloud
    joined point-for-point). For each requested label L the output
    row carries the exact integer sufficient statistics — tp, fp,
    fn, support (truth count) and n (total scored points) — from
    which EvalKernel's accuracy/precision/recall/F1/IoU all follow
    by one division each (precision = tp/(tp+fp), IoU =
    tp/(tp+fp+fn), ...). Points present in only one cloud drop,
    like the kernel's common-id iteration.

    Scale: ONE hash join on the point id + one conditional
    aggregation per label over a literal label array — the
    confusion matrix never materializes beyond len(labels) rows.
    """
    p = predicted.select(F.col(id_col).alias("__id"),
                         F.col(label_col).cast("long").alias("__p"))
    t = truth.select(F.col(id_col).alias("__id"),
                     F.col(label_col).cast("long").alias("__t"))
    j = p.join(t, on="__id")
    lab = F.explode(
        F.array(*[F.lit(int(v)) for v in labels])).alias("label")
    return (
        j.select("__p", "__t", lab)
        .groupBy("label")
        .agg(
            F.sum(F.when((F.col("__p") == F.col("label"))
                         & (F.col("__t") == F.col("label")), 1)
                  .otherwise(0)).alias("tp"),
            F.sum(F.when((F.col("__p") == F.col("label"))
                         & (F.col("__t") != F.col("label")), 1)
                  .otherwise(0)).alias("fp"),
            F.sum(F.when((F.col("__p") != F.col("label"))
                         & (F.col("__t") == F.col("label")), 1)
                  .otherwise(0)).alias("fn"),
            F.sum(F.when(F.col("__t") == F.col("label"), 1)
                  .otherwise(0)).alias("support"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def winsorize(
    df: DataFrame,
    value: str,
    group_col: str,
    id_col: str,
    lo_frac: float = 0.05,
    hi_frac: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: clip `value` to the group's exact
    [lo_frac, hi_frac] order statistics (rank ceil(frac*n), 1-based
    — the EXACT quantile convention iqr/mad use, not an interpolated
    percentile, so the clip bounds are actual data values and the
    output is engine-exact with no float rounding). The robust-prep
    companion to robust_zscore: that flags outliers, this caps them.

    Output: (group, id, value, lo, hi, clipped).

    Scale: one per-group window rank (partitioned hash sort — the
    group cardinality is the parallelism) + one broadcast-size join
    of the 2-row-per-group bounds back to the rows. Values pass
    through untouched unless clipped.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__i"),
        F.col(value).cast("double").alias("__v"),
    )
    w = Window.partitionBy("__g").orderBy(F.col("__v").asc())
    ranked = base.withColumn(
        "__r", F.row_number().over(w)
    ).withColumn(
        "__n",
        F.count(F.lit(1)).over(
            Window.partitionBy("__g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    lo_r = F.greatest(
        F.lit(1), F.ceil(F.lit(float(lo_frac)) * F.col("__n"))
    )
    hi_r = F.greatest(
        F.lit(1), F.ceil(F.lit(float(hi_frac)) * F.col("__n"))
    )
    bounds = (
        ranked.select(
            "__g",
            F.when(F.col("__r") == lo_r, F.col("__v")).alias("__lo"),
            F.when(F.col("__r") == hi_r, F.col("__v")).alias("__hi"),
        )
        .groupBy("__g")
        .agg(
            F.min("__lo").alias("lo"), F.min("__hi").alias("hi")
        )
    )
    return (
        base.join(bounds, on="__g")
        .select(
            F.col("__g").alias(group_col),
            F.col("__i").alias(id_col),
            F.col("__v").alias(value),
            "lo",
            "hi",
            F.least(F.greatest(F.col("__v"), F.col("lo")),
                    F.col("hi")).alias("clipped"),
        )
    )


WILSON_Z = "1.96e0"


def wilson_exprs() -> tuple[str, str]:
    """The (center, half-width) SQL chains over integer columns x, n
    — ONE shared string for the operator and its oracle (the house
    dual-dialect discipline: identical IEEE chain in both engines).
    """
    z = WILSON_Z
    ph = "(cast(x as double) / cast(n as double))"
    denom = f"(1.0e0 + {z} * {z} / cast(n as double))"
    center = f"(({ph} + {z} * {z} / (2.0e0 * cast(n as double))) / {denom})"
    half = (
        f"({z} * sqrt({ph} * (1.0e0 - {ph}) / cast(n as double)"
        f" + {z} * {z} / (4.0e0 * cast(n as double)"
        f" * cast(n as double))) / {denom})"
    )
    return center, half


def wilson_interval(
    df: DataFrame,
    group_col: str,
    success_pred: str,
) -> DataFrame:
    """Wilson score interval per group — the A/B readout companion
    to ab_test: a confidence interval for a rate that behaves at
    small n and extreme p (unlike the normal approximation). With
    z = 1.96 (95%), p_hat = x/n:

        center = (p + z^2/2n) / (1 + z^2/n)
        half   = z * sqrt(p(1-p)/n + z^2/4n^2) / (1 + z^2/n)

    Output: (group, x, n, round(lo,9), round(hi,9)) — x, n exact
    integers; the interval is one fixed IEEE chain over them
    (+,-,*,/,sqrt only), rounded 9dp per house float discipline.

    Scale: ONE conditional aggregation, map-side combined.
    """
    ok = F.expr(success_pred)
    agg = df.groupBy(group_col).agg(
        F.sum(F.when(ok, 1).otherwise(0)).alias("x"),
        F.count(F.lit(1)).alias("n"),
    )
    center, half = wilson_exprs()
    return agg.select(
        group_col, "x", "n",
        F.expr(f"round({center} - {half}, 9)").alias("lo"),
        F.expr(f"round({center} + {half}, 9)").alias("hi"),
    )


SPLIT_Q = 1 << 20


def gini_split(
    df: DataFrame,
    feature: str,
    label_pred: str,
    q: int = SPLIT_Q,
) -> DataFrame:
    """Decision-stump split scoring — train a weak learner on the
    cluster (the quality-classifier primitive: which threshold of a
    numeric feature best separates positives?). Every distinct
    feature value t is a candidate split (left = rows <= t); its
    score is the Gini purity gain numerator in exact fixed point:

        score_q = (q * (pos_l^2 + neg_l^2)) div n_l
                + (q * (pos_r^2 + neg_r^2)) div n_r

    (maximizing score_q == minimizing weighted Gini impurity; all
    integer products < 2^63 for n < 2^21 with q = 2^20 — pre-bin
    with equi_depth_bins above that, which also bounds the
    candidate-threshold table). Output one row per threshold:
    (threshold, n_l, pos_l, n_r, pos_r, score_q); the best split is
    the caller's argmax (score_q DESC, threshold ASC).

    Scale: ONE hash agg to (distinct value, count, pos-count), one
    window prefix-sum over that DISTINCT-VALUE table (bounded by
    cardinality, not rows), pure integer codegen after.
    """
    y = F.expr(label_pred)
    per = (
        df.groupBy(F.col(feature).alias("threshold"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.when(y, 1).otherwise(0)).alias("__p"),
        )
    )
    w_run = Window.orderBy(F.col("threshold").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.col("threshold").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = (
        per.withColumn("n_l", F.sum("__n").over(w_run))
        .withColumn("pos_l", F.sum("__p").over(w_run))
        .withColumn("__nt", F.sum("__n").over(w_all))
        .withColumn("__pt", F.sum("__p").over(w_all))
        .withColumn("n_r", F.col("__nt") - F.col("n_l"))
        .withColumn("pos_r", F.col("__pt") - F.col("pos_l"))
        .where(F.col("n_r") > 0)
    )
    qq = int(q)
    score = F.expr(
        f"({qq}L * (pos_l * pos_l"
        f" + (n_l - pos_l) * (n_l - pos_l))) div n_l"
        f" + ({qq}L * (pos_r * pos_r"
        f" + (n_r - pos_r) * (n_r - pos_r))) div n_r"
    )
    return c.select(
        "threshold", "n_l", "pos_l", "n_r", "pos_r",
        score.alias("score_q"),
    )


WOE_Q = 1 << 20


def woe_bins(
    df: DataFrame,
    value: str,
    label_pred: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    q: int = WOE_Q,
) -> DataFrame:
    """Weight-of-evidence binning (the credit-scoring / quality-
    feature diagnostic next to psi_drift): equi-width bins over the
    explicit [lo, hi] (clamped, psi_drift's convention), per bin the
    smoothed log-odds ratio vs the global class balance:

        woe_q = lnq((pos_i+1) * (neg_tot+nb))
              - lnq((neg_i+1) * (pos_tot+nb))

    with lnq(x) = floor(ln(x)*q + 0.5) on exact-integer doubles
    (house fixed-point-ln). Information value follows from the
    emitted exact counts: IV = sum (pos_i/pos - neg_i/neg) * woe.
    Output: (bin, n_pos, n_neg, woe_q).

    Scale: ONE conditional hash agg on the bin id; totals ride as
    two collected scalars (two-phase aggregate).
    """
    nb = int(n_bins)
    y = F.expr(label_pred)
    span = float(hi) - float(lo)
    b = F.least(
        F.lit(nb - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (F.col(value) - F.lit(float(lo)))
                / F.lit(span) * nb
            ).cast("int"),
        ),
    )
    agg = (
        df.select(b.alias("bin"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("__y"), 1).otherwise(0))
            .alias("n_pos"),
            F.sum(F.when(F.col("__y"), 0).otherwise(1))
            .alias("n_neg"),
        )
    )
    from pdal_spark import sqlgen as G

    tot = agg.agg(
        F.sum("n_pos").alias("p"), F.sum("n_neg").alias("n")
    ).collect()[0]
    pt, nt = int(tot["p"]) + nb, int(tot["n"]) + nb
    qs = G.fnum(float(int(q)))
    return agg.withColumn(
        "woe_q",
        F.expr(
            f"cast(floor(ln(cast((n_pos + 1L) * {nt}L as double))"
            f" * {qs} + 0.5e0) as bigint)"
            f" - cast(floor(ln(cast((n_neg + 1L) * {pt}L as double))"
            f" * {qs} + 0.5e0) as bigint)"
        ),
    )


def ks_test(
    df_a: DataFrame,
    df_b: DataFrame,
    value: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic, EXACT: D = max over
    values of |F_a - F_b| compared via the cross-multiplied integer
    |c_a * n_b - c_b * n_a| (no float CDFs — the house rational-
    comparison discipline), so the argmax and the statistic are
    engine-identical. The distribution-shape drift test next to
    psi_drift (binned) and embedding_drift (vector): KS needs no
    bins and catches shape changes equal means hide.

    Output one row: (d_at, n_a, n_b, d_num); D = d_num/(n_a*n_b).
    Ties in the argmax resolve to the smallest value.

    Scale: one hash agg to the distinct-value table, one prefix-sum
    window over THAT table, TakeOrdered(1) — the gini_split shape.
    """
    a = df_a.select(F.col(value).alias("v")).withColumn(
        "__a", F.lit(1)).withColumn("__b", F.lit(0))
    b = df_b.select(F.col(value).alias("v")).withColumn(
        "__a", F.lit(0)).withColumn("__b", F.lit(1))
    per = (
        a.unionByName(b)
        .groupBy("v")
        .agg(F.sum("__a").alias("ca"), F.sum("__b").alias("cb"))
    )
    w_run = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = (
        per.withColumn("__fa", F.sum("ca").over(w_run))
        .withColumn("__fb", F.sum("cb").over(w_run))
        .withColumn("__na", F.sum("ca").over(w_all))
        .withColumn("__nb", F.sum("cb").over(w_all))
        .withColumn(
            "__d",
            F.abs(
                F.col("__fa") * F.col("__nb")
                - F.col("__fb") * F.col("__na")
            ),
        )
    )
    return (
        c.orderBy(F.col("__d").desc(), F.col("v").asc())
        .limit(1)
        .select(
            F.col("v").alias("d_at"),
            F.col("__na").alias("n_a"),
            F.col("__nb").alias("n_b"),
            F.col("__d").alias("d_num"),
        )
    )


def mann_whitney_u(
    df_a: DataFrame,
    df_b: DataFrame,
    value: str,
) -> DataFrame:
    """Two-sample Mann-Whitney U, EXACT with ties: rank sums use
    average ranks, kept integer by working with DOUBLED sums — a
    value block spanning ranks [c+1, c+t] contributes
    a_v * (2c + t + 1) to 2*R_a. The nonparametric twin of ab_test
    (medians/stochastic dominance instead of proportions); the
    normal approximation (mean, variance) is the caller's float.

    Output one row: (n_a, n_b, two_r_a, two_u_a) with
    2*U_a = 2*n_a*n_b + n_a*(n_a+1) - 2*R_a.

    Scale: same distinct-value agg + prefix window as ks_test.
    """
    a = df_a.select(F.col(value).alias("v")).withColumn(
        "__a", F.lit(1)).withColumn("__b", F.lit(0))
    b = df_b.select(F.col(value).alias("v")).withColumn(
        "__a", F.lit(0)).withColumn("__b", F.lit(1))
    per = (
        a.unionByName(b)
        .groupBy("v")
        .agg(F.sum("__a").alias("ca"), F.sum("__b").alias("cb"))
        .withColumn("t", F.col("ca") + F.col("cb"))
    )
    w_run = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = per.withColumn(
        "__cprev", F.sum("t").over(w_run) - F.col("t")
    ).withColumn(
        "__contrib",
        F.col("ca") * (2 * F.col("__cprev") + F.col("t") + 1),
    )
    out = c.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum("__contrib").alias("two_r_a"),
    )
    return out.select(
        "n_a", "n_b", "two_r_a",
        (
            2 * F.col("n_a") * F.col("n_b")
            + F.col("n_a") * (F.col("n_a") + 1)
            - F.col("two_r_a")
        ).alias("two_u_a"),
    )


def geary_c(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Global Geary's C spatial autocorrelation (Geary 1954) — the
    pairwise-difference complement of morans_i (C is more sensitive
    to LOCAL dissimilarity; C < 1 clustered, C > 1 dispersed, 1
    random). Queen adjacency over observed cells, w_ij = 1, and the
    same n-scaled integer deviations d_i = n*x_i - S:

        C = (n-1) * sum_ij (d_i - d_j)^2 / (2 * W * sum_i d_i^2)

    (the n^2 scale factors cancel). Emits the exact integer moments
    (n, w_pairs, num2, den) + the one-division double.

    Bound: (d_i - d_j)^2 <= 4*(n*max(x))^2 — keep n*max(x) under
    ~1.5e9 or pre-scale (tighter than morans_i by 2x).

    Scale: identical plan to morans_i — ring-1 explode + one hash
    self-join + map-side-combined folds over the CELL AGGREGATE.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("xv")
    )
    mom = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("xv").alias("s")
    )
    d = base.crossJoin(F.broadcast(mom)).select(
        "c", F.expr("n * xv - s").alias("d"), "n"
    )
    nbrs = (
        grid_disk(d.select("c"), "c", res=res, k=1,
                  out="nc", ring_out="ring")
        .where(F.col("ring") == 1)
        .select("c", "nc")
    )
    pairs = (
        nbrs.join(d.select(F.col("c").alias("nc"),
                           F.col("d").alias("dj")), on="nc")
        .join(d.select("c", F.col("d").alias("di")), on="c")
    )
    num = pairs.agg(
        F.count(F.lit(1)).alias("w_pairs"),
        F.sum(F.expr("(di - dj) * (di - dj)")).alias("num2"),
    )
    den = d.agg(
        F.max("n").alias("n"), F.sum(F.expr("d * d")).alias("den")
    )
    return den.crossJoin(num).select(
        "n", "w_pairs", "num2", "den",
        F.expr(
            "CASE WHEN w_pairs > 0 AND den <> 0 THEN"
            " (cast(n - 1 as double) * cast(num2 as double))"
            " / (2.0e0 * cast(w_pairs as double)"
            " * cast(den as double)) END"
        ).alias("geary_c"),
    )


CUPED_Q = 1 << 20


def cuped_exprs() -> dict[str, str]:
    """Shared IEEE expression strings over the exact integer moment
    columns (n_all, sx, sy, sxx, sxy, n, arm_sy, arm_sx) — fed to
    BOTH the Spark op and the DuckDB oracle so the float chain is
    textually identical (the wilson_exprs convention).

    theta = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2); the adjusted arm mean
    subtracts theta * (arm covariate mean - pooled covariate mean).
    """
    from pdal_spark import sqlgen as G

    theta_num = "cast(n_all * sxy - sx * sy as double)"
    theta_den = "cast(n_all * sxx - sx * sx as double)"
    theta = (
        f"(CASE WHEN (n_all * sxx - sx * sx) <> 0"
        f" THEN {theta_num} / {theta_den} ELSE {G.fnum(0.0)} END)"
    )
    mean_adj = (
        f"(cast(arm_sy as double) / cast(n as double))"
        f" - {theta} * ((cast(arm_sx as double) / cast(n as double))"
        f" - (cast(sx as double) / cast(n_all as double)))"
    )
    return {"theta": theta, "mean_adj": mean_adj}


def cuped_adjust(
    df: DataFrame,
    group_col: str,
    metric_q: str,
    covariate_q: str,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013
    — the industry-standard A/B variance reduction): regress the
    metric on a pre-experiment covariate ONCE (pooled theta), then
    compare arms on the adjusted metric y - theta*(x - mean(x)).
    Both metric and covariate arrive as exact integer columns
    (quantize upstream); every sufficient statistic is an exact
    int64 sum, and the only floats are the final shared-expression
    theta / adjusted means — identical text in both engines.

    Output one row per arm: arm, n, arm_sy, arm_sx, pooled moments,
    theta, mean_adj.

    Scale: ONE map-side-combined groupBy for the arm moments + one
    5-number pooled aggregate broadcast back. Bound:
    n * Sxx must stay < 2^63 — pre-scale the covariate grid for
    corpora beyond ~10^9 quantized units.
    """
    base = df.select(
        F.col(group_col).alias("arm"),
        F.col(metric_q).cast("long").alias("__y"),
        F.col(covariate_q).cast("long").alias("__x"),
    )
    pooled = base.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.expr("__x * __x")).alias("sxx"),
        F.sum(F.expr("__x * __y")).alias("sxy"),
    )
    arms = base.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("arm_sy"),
        F.sum("__x").alias("arm_sx"),
    )
    ex = cuped_exprs()
    return (
        arms.crossJoin(F.broadcast(pooled))
        .select(
            "arm", "n", "arm_sy", "arm_sx",
            "n_all", "sx", "sy", "sxx", "sxy",
            F.expr(ex["theta"]).alias("theta"),
            F.expr(ex["mean_adj"]).alias("mean_adj"),
        )
    )


def wasserstein_1d(
    df_a: DataFrame,
    df_b: DataFrame,
    value: str,
) -> DataFrame:
    """Two-sample 1-d Wasserstein (earth-mover) distance, EXACT on
    an integer-valued column: W1 = integral |F_a - F_b| dx, computed
    over the distinct-value table as

        w1_num = sum over consecutive values of
                 (v_next - v) * |c_a*n_b - c_b*n_a|

    so W1 = w1_num / (n_a * n_b) in value units. Where ks_test
    reports the WORST CDF gap, W1 reports the total transport mass
    — the drift MAGNITUDE (a tiny shift of the whole distribution
    has small W1 but can have large KS). Quantize float inputs
    upstream.

    Output one row: (n_a, n_b, w1_num, w1); w1 is ONE division.

    Scale: the ks_test shape — one hash agg to the distinct-value
    table, one prefix window + one lead over THAT table, then a
    one-row fold. Bound: (v_max - v_min) * n_a * n_b < 2^63.
    """
    a = df_a.select(F.col(value).alias("v")).withColumn(
        "__a", F.lit(1)).withColumn("__b", F.lit(0))
    b = df_b.select(F.col(value).alias("v")).withColumn(
        "__a", F.lit(0)).withColumn("__b", F.lit(1))
    per = (
        a.unionByName(b)
        .groupBy("v")
        .agg(F.sum("__a").alias("ca"), F.sum("__b").alias("cb"))
    )
    w_ord = Window.orderBy(F.col("v").asc())
    w_run = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = (
        per.withColumn("__fa", F.sum("ca").over(w_run))
        .withColumn("__fb", F.sum("cb").over(w_run))
        .withColumn("__na", F.sum("ca").over(w_all))
        .withColumn("__nb", F.sum("cb").over(w_all))
        .withColumn("__nx", F.lead("v").over(w_ord))
        .withColumn(
            "__seg",
            F.when(
                F.col("__nx").isNotNull(),
                (F.col("__nx") - F.col("v"))
                * F.abs(
                    F.col("__fa") * F.col("__nb")
                    - F.col("__fb") * F.col("__na")
                ),
            ).otherwise(F.lit(0)),
        )
    )
    return c.agg(
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
        F.sum("__seg").alias("w1_num"),
    ).select(
        "n_a", "n_b", "w1_num",
        F.expr(
            "cast(w1_num as double)"
            " / cast(n_a * n_b as double)"
        ).alias("w1"),
    )


def local_morans_i(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Local Moran's I (Anselin 1995 LISA) per cell — WHERE the
    clustering is, where morans_i says only THAT it clusters:
    positive I_i = a high-high / low-low cluster member, negative =
    a spatial outlier (high in a low neighborhood or vice versa).
    Binary queen weights, self excluded, unstandardized rows.

    Exact integer sufficient statistics on the n-scaled deviation
    grid d_i = n*x_i - sum(x):

        I_i = n * d_i * S_i / sum(d^2),  S_i = sum_{j in N_i} d_j

    (the morans_i/geary_c discipline: every compared int exact, the
    final ratio ONE IEEE division, hash-exact cross-engine). Bound:
    n * |d|_max * 8|d|_max < 2^63.

    Scale: ring-1 disk explode + ONE hash join over the cell
    AGGREGATE + one broadcast 3-number moment row.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"), F.col(value).cast("long").alias("xv")
    )
    mom = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("xv").alias("sx")
    )
    dev = base.crossJoin(F.broadcast(mom)).select(
        "c", "n", (F.col("n") * F.col("xv") - F.col("sx")).alias("d")
    )
    sd2 = dev.agg(F.sum(F.expr("d * d")).alias("sum_d2"))
    nbrs = (
        grid_disk(dev.select("c"), "c", res=res, k=1,
                  out="nc", ring_out="ring")
        .where(F.col("ring") == 1)
        .select("c", "nc")
    )
    s_i = (
        nbrs.join(dev.select(F.col("c").alias("nc"),
                             F.col("d").alias("dj")), on="nc")
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n_i"), F.sum("dj").alias("s_i"))
    )
    return (
        dev.join(s_i, on="c", how="inner")
        .crossJoin(F.broadcast(sd2))
        .select(
            F.col("c").alias(cell), "n_i", "d", "s_i",
            F.expr(
                "cast(n * d * s_i as double)"
                " / cast(sum_d2 as double)"
            ).alias("lisa"),
        )
    )


PAIR_SHIFT = 1 << 21  # shifts quantized lon/lat non-negative so the
#                       grid-cell floor-div agrees across engines


def _bounded_pairs(
    df: DataFrame,
    id_col: str,
    x: str,
    y: str,
    max_d_q: int,
    coord_q: int,
    extra: list[str] | None = None,
) -> DataFrame:
    """All UNORDERED point pairs with planar quantized distance^2
    <= max_d_q^2: quantize to the SHIFTED integer grid (floor(v *
    coord_q) + PAIR_SHIFT — non-negative, so div == // across
    engines), bucket into max_d_q-sized grid cells, join each cell
    against its 3x3 neighborhood (provably sufficient for one-ring
    at cell size = max_d_q), filter by exact integer d2, dedup by
    id_a < id_b. The radius_join plan with integer-exact output —
    pair volume is O(points x local density), never O(n^2).
    """
    extra = extra or []
    m = int(max_d_q)
    pts = df.select(
        F.col(id_col).alias("pid"),
        (F.floor(F.col(x) * float(coord_q)).cast("long")
         + PAIR_SHIFT).alias("xq"),
        (F.floor(F.col(y) * float(coord_q)).cast("long")
         + PAIR_SHIFT).alias("yq"),
        *[F.col(e) for e in extra],
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    left = pts.select(
        F.col("pid").alias("id_a"), F.col("xq").alias("xa"),
        F.col("yq").alias("ya"),
        *[F.col(e).alias(f"{e}_a") for e in extra],
        F.explode(offs).alias("o"),
    ).select(
        "id_a", "xa", "ya",
        *[f"{e}_a" for e in extra],
        (F.expr(f"xa div {m}") + F.col("o.dx")).alias("jx"),
        (F.expr(f"ya div {m}") + F.col("o.dy")).alias("jy"),
    )
    right = pts.select(
        F.col("pid").alias("id_b"), F.col("xq").alias("xb"),
        F.col("yq").alias("yb"),
        *[F.col(e).alias(f"{e}_b") for e in extra],
        F.expr(f"xq div {m}").alias("jx"),
        F.expr(f"yq div {m}").alias("jy"),
    )
    j = left.join(right, on=["jx", "jy"]).where(
        F.col("id_a") < F.col("id_b")
    )
    d2 = (
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    )
    return j.select(
        "id_a", "id_b", d2.alias("d2"),
        *[f"{e}_a" for e in extra], *[f"{e}_b" for e in extra],
    ).where(F.col("d2") <= m * m)


def ripleys_k(
    df: DataFrame,
    radii_q: list[int],
    id_col: str,
    x: str = "lon",
    y: str = "lat",
    coord_q: int = 1 << 10,
) -> DataFrame:
    """Ripley's K pair counts (Ripley 1977) — the multi-scale
    clustered-vs-dispersed diagnostic: for each radius r in the
    ladder, the number of UNORDERED point pairs within r on the
    floor(coord * coord_q) grid. The caller normalizes
    (K(r) = area * 2 * n_pairs / n^2); the counts are the exact,
    hash-comparable essence.

    Scale: ONE bounded-pair generation at max(radii) (grid-bucketed
    3x3 join — O(points x local density)) + one conditional-count
    aggregate over the ladder.
    """
    rq = sorted(int(r) for r in radii_q)
    pairs = _bounded_pairs(df, id_col, x, y, max_d_q=rq[-1],
                           coord_q=coord_q)
    ladder = pairs.select(
        "d2",
        F.explode(F.array(*[F.lit(r) for r in rq])).alias("r_q"),
    ).where(F.col("d2") <= F.col("r_q") * F.col("r_q"))
    return (
        ladder.groupBy("r_q")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def semivariogram(
    df: DataFrame,
    value: str,
    id_col: str,
    x: str = "lon",
    y: str = "lat",
    bin_q: int = 1 << 10,
    n_bins: int = 8,
    coord_q: int = 1 << 10,
    value_q: int = 1 << 10,
) -> DataFrame:
    """Empirical semivariogram (Matheron 1963) — the geostatistical
    spatial-correlation-range profile under kriging and sensor QA:
    per distance bin b (bin edges b*bin_q on the quantized grid),
    the pair count and the exact integer sum of squared value
    differences; gamma(b) = sum_sq_dz / (2 * n_pairs) is the
    caller's ONE division.

    Bin membership is decided on d2 against SQUARED edges — no
    sqrt, no float: bin b holds (b*bin_q)^2 <= d2 < ((b+1)*bin_q)^2.

    Scale: the ripleys_k pair generation at n_bins*bin_q + one
    explode(n_bins)-and-filter (exactly one bin survives per pair)
    + ONE hash aggregate.
    """
    bq, nb = int(bin_q), int(n_bins)
    pairs = _bounded_pairs(
        df.withColumn("__zq",
                      F.floor(F.col(value) * float(value_q))
                      .cast("long")),
        id_col, x, y, max_d_q=nb * bq, coord_q=coord_q,
        extra=["__zq"],
    )
    binned = pairs.select(
        "d2",
        ((F.col("__zq_a") - F.col("__zq_b"))
         * (F.col("__zq_a") - F.col("__zq_b"))).alias("dz2"),
        F.explode(F.array(*[F.lit(b) for b in range(nb)])).alias("bin"),
    ).where(
        (F.col("d2") >= F.col("bin") * F.col("bin") * (bq * bq))
        & (F.col("d2") < (F.col("bin") + 1) * (F.col("bin") + 1)
           * (bq * bq))
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("dz2").alias("sum_sq_dz"),
    )


def colocation_ratio(
    df: DataFrame,
    category: str,
    id_col: str,
    max_d_q: int,
    x: str = "lon",
    y: str = "lat",
    coord_q: int = 1 << 10,
) -> DataFrame:
    """Spatial colocation pattern mining (Shekhar & Huang 2001),
    pair-count form: for every ORDERED category pair (a, b), the
    number of a-points with at least... — here the exact
    neighbor-pair count n_pairs(a, b) = |{(i, j): cat_i = a, cat_j
    = b, d(i, j) <= r}| plus the per-category point totals, from
    which participation index / colocation ratio = one caller
    division. Which event types co-occur in space (store-competitor
    analysis; crawl topics sharing hosting neighborhoods).

    Unordered input pairs are emitted BOTH ways for (a != b) so the
    ratio denominator (points of category a) is directly usable;
    same-category pairs count once with a < b id ordering.

    Scale: the ripleys_k `_bounded_pairs` generation (grid-bucketed
    3x3 join, O(points x local density)) + ONE hash aggregate.
    """
    pairs = _bounded_pairs(
        df.withColumn("__cat", F.col(category)),
        id_col, x, y, max_d_q=max_d_q, coord_q=coord_q,
        extra=["__cat"],
    )
    both = pairs.select(
        F.col("__cat_a").alias("cat_a"),
        F.col("__cat_b").alias("cat_b"),
    ).unionByName(
        pairs.where(F.col("__cat_a") != F.col("__cat_b")).select(
            F.col("__cat_b").alias("cat_a"),
            F.col("__cat_a").alias("cat_b"),
        )
    )
    counts = both.groupBy("cat_a", "cat_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    totals = df.groupBy(F.col(category).alias("cat_a")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    return counts.join(totals, on="cat_a").select(
        "cat_a", "cat_b", "n_pairs", "n_a",
        F.expr("cast(n_pairs as double) / cast(n_a as double)")
        .alias("pairs_per_point"),
    )


def skyline_2d(
    df: DataFrame,
    a: str,
    b: str,
    id_col: str | None = None,
) -> DataFrame:
    """2-d skyline / Pareto frontier (Borzsony et al. 2001), both
    criteria MINIMIZED: rows not dominated by any other row (some
    row with a' <= a and b' <= b, strict in at least one). The
    classic multi-criteria shortlist (cheapest-and-closest; best
    quality-vs-length documents).

    Sort-free distributed form: a row survives iff
        b < min(b) over rows with strictly smaller a     (or no
        such row), AND it is the group minimum of b among ties of a
    — ONE window over a (range-partitionable; Catalyst's WindowExec
    on a range-sorted column) + one tie aggregate. No self-join, no
    driver state; output is the frontier only.
    """
    cols = [F.col(a).alias("va"), F.col(b).alias("vb")]
    if id_col is not None:
        cols.append(F.col(id_col))
    base = df.select(*cols)
    w = (
        Window.orderBy("va")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wtie = Window.partitionBy("va")
    scored = base.select(
        *([F.col(id_col)] if id_col is not None else []),
        "va", "vb",
        F.min("vb").over(w).alias("__pm"),
        F.min("vb").over(wtie).alias("__tm"),
    )
    out = scored.where(
        (F.col("__pm").isNull() | (F.col("vb") < F.col("__pm")))
        & (F.col("vb") == F.col("__tm"))
    )
    return out.select(
        *([F.col(id_col)] if id_col is not None else []),
        F.col("va").alias(a), F.col("vb").alias(b),
    ).distinct()


def fleiss_kappa(
    df: DataFrame, item: str = "item", cat: str = "cat"
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — chance-corrected agreement for
    MANY raters per item (the annotation-QA metric when a labeling
    pass uses >2 annotators or model voters; cohen_kappa is the
    2-rater special case). Input: one row per (item, rating); every
    item must carry the same number of ratings n (the classical
    formula's assumption — enforced loudly).

        P_i  = (sum_j n_ij^2 - n) / (n (n - 1))
        P̄    = mean_i P_i,   P̄_e = sum_j p_j^2
        kappa = (P̄ - P̄_e) / (1 - P̄_e)

    All tallies are exact int64 (sum over items of sum_j n_ij^2, the
    global category counts); the three ratios are fixed IEEE chains —
    hash-exact cross-engine. Output: ONE row
    (n_items, n_raters, sum_sq, po_num, pe_num) + po/pe/kappa.

    Scale: one groupBy(item, cat) + one groupBy(item) + two global
    aggregates, all map-side combined; nothing joins the raw rows.
    """
    nij = df.groupBy(item, cat).agg(
        F.count(F.lit(1)).cast("long").alias("n_ij")
    )
    per_item = nij.groupBy(item).agg(
        F.sum("n_ij").alias("n_i"),
        F.sum(F.col("n_ij") * F.col("n_ij")).alias("sq_i"),
    )
    n_check = per_item.select(
        F.min("n_i").alias("lo"), F.max("n_i").alias("hi")
    ).collect()[0]
    if n_check.lo != n_check.hi:
        raise ValueError(
            "fleiss_kappa requires a constant rating count per item"
            f" (saw {n_check.lo}..{n_check.hi})"
        )
    n = int(n_check.lo)
    if n < 2:
        raise ValueError("fleiss_kappa needs >= 2 ratings per item")
    tot = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("sq_i").alias("sum_sq"),
    )
    cat_tot = nij.groupBy(cat).agg(F.sum("n_ij").alias("c_j")).agg(
        F.sum(F.col("c_j") * F.col("c_j")).alias("sum_cj_sq")
    )
    # po = (sum_sq - N*n) / (N*n*(n-1)); pe = sum_cj_sq / (N*n)^2
    return (
        tot.crossJoin(F.broadcast(cat_tot))
        .select(
            "n_items",
            F.lit(n).cast("long").alias("n_raters"),
            "sum_sq",
            F.expr(
                f"(cast(sum_sq as double)"
                f" - cast(n_items as double) * cast({n} as double))"
                f" / (cast(n_items as double) * cast({n} as double)"
                f" * cast({n - 1} as double))"
            ).alias("po"),
            F.expr(
                "cast(sum_cj_sq as double)"
                f" / ((cast(n_items as double) * cast({n} as double))"
                f" * (cast(n_items as double) * cast({n} as double)))"
            ).alias("pe"),
        )
        .withColumn(
            # pe = 1 (every rating in one category) leaves kappa
            # undefined -> NULL via nullif, not a div-by-zero
            "kappa",
            F.expr("(po - pe) / nullif(1.0e0 - pe, 0.0e0)"),
        )
    )


KRIPP_Q = 1 << 30


def krippendorff_alpha(
    df: DataFrame,
    item: str = "item",
    cat: str = "cat",
    q: int = KRIPP_Q,
) -> DataFrame:
    """Krippendorff's alpha, nominal metric (Krippendorff 2011) —
    the agreement coefficient that tolerates MISSING ratings: items
    may carry any number of ratings >= 2 (fleiss_kappa's constant-n
    assumption dropped; items with a single rating are unpairable
    and excluded, per the definition).

        D_o ∝ sum_i [ sum_c n_ic (n_i - n_ic) ] / (n_i - 1)
        D_e ∝ sum_c n_c (n - n_c)
        alpha = 1 - (n - 1) * D_o_sum / D_e_sum

    The per-item term divides by (n_i - 1), so it is rational — each
    term quantizes to an exact int64 ``(sum_c n_ic (n_i - n_ic)) * q
    div (n_i - 1)`` (identical truncation in both engines), making
    the global sum ORDER-INVARIANT; alpha is then one fixed IEEE
    chain. q=2^30 puts the quantization error at ~1e-9 per item —
    far below any reporting precision (and deterministic anyway).

    Output: one row (n_pairable, do_q, de_sum, alpha).

    Scale: two map-side-combined hash aggregates over (item, cat)
    counts — rating rows never join.
    """
    nij = df.groupBy(item, cat).agg(
        F.count(F.lit(1)).cast("long").alias("n_ij")
    )
    per = (
        nij.groupBy(item)
        .agg(
            F.sum("n_ij").alias("n_i"),
            F.sum(F.col("n_ij") * F.col("n_ij")).alias("sq_i"),
        )
        .where(F.col("n_i") >= 2)
    )
    # sum_c n_ic (n_i - n_ic) = n_i^2 - sum_c n_ic^2
    do = per.agg(
        F.sum("n_i").alias("n_pairable"),
        F.sum(
            F.expr(
                f"((n_i * n_i - sq_i) * cast({int(q)} as bigint))"
                " div (n_i - 1)"
            )
        ).alias("do_q"),
    )
    # category totals restricted to pairable items (plain hash
    # equi-join — the pairable-item set scales with the corpus, so
    # no broadcast hint; AQE may still choose one when it is small)
    de = (
        nij.join(per.select(item), on=item)
        .groupBy(cat)
        .agg(F.sum("n_ij").alias("n_c"))
        .crossJoin(F.broadcast(do.select("n_pairable")))
        .agg(
            F.sum(
                F.expr("n_c * (n_pairable - n_c)")
            ).alias("de_sum")
        )
    )
    return (
        do.crossJoin(F.broadcast(de))
        .select(
            "n_pairable",
            "do_q",
            "de_sum",
            F.expr(
                "1.0e0 - (cast(n_pairable as double) - 1.0e0)"
                " * cast(do_q as double)"
                f" / (cast({int(q)} as double)"
                " * cast(de_sum as double))"
            ).alias("alpha"),
        )
    )


def semivariogram_directional(
    df: DataFrame,
    value: str,
    id_col: str,
    x: str = "lon",
    y: str = "lat",
    bin_q: int = 1 << 10,
    n_bins: int = 8,
    coord_q: int = 1 << 10,
    value_q: int = 1 << 10,
) -> DataFrame:
    """Directional (anisotropic) empirical semivariogram — the
    variogram per AXIAL SECTOR as well as distance bin, the standard
    anisotropy diagnostic before kriging (does correlation decay
    faster across the coast than along it). Four 45-degree axial
    sectors centered on E-W (0), NE-SW (1), N-S (2), NW-SE (3);
    sector boundaries at +-22.5 degrees are decided by the exact
    integer cross-multiplication |dy| * 99 <=> |dx| * 41 (41/99 ~
    tan 22.5 to 2e-4 — a DOCUMENTED rational-slope convention, so
    membership is engine-exact with no trig). Zero-distance pairs
    (same quantized point) are excluded — they have no direction.

    Same exact-integer outputs as :func:`semivariogram`:
    (sector, bin, n_pairs, sum_sq_dz).

    Scale: ONE bounded-pair generation (grid-bucketed 3x3 join) +
    row-local sector CASE + bin explode + ONE hash aggregate.
    """
    bq, nb = int(bin_q), int(n_bins)
    pre = df.select(
        F.col(id_col).alias("__pid"),
        F.col(x).alias("__x"),
        F.col(y).alias("__y"),
        (F.floor(F.col(x) * float(coord_q)).cast("long"))
        .alias("__cx"),
        (F.floor(F.col(y) * float(coord_q)).cast("long"))
        .alias("__cy"),
        (F.floor(F.col(value) * float(value_q)).cast("long"))
        .alias("__zq"),
    )
    pairs = _bounded_pairs(
        pre, "__pid", "__x", "__y", max_d_q=nb * bq,
        coord_q=coord_q, extra=["__cx", "__cy", "__zq"],
    ).where(F.col("d2") > 0)
    sector = (
        "case"
        " when abs(__cy_a - __cy_b) * 99 <= abs(__cx_a - __cx_b) * 41"
        " then 0"
        " when abs(__cx_a - __cx_b) * 99 <= abs(__cy_a - __cy_b) * 41"
        " then 2"
        " when (__cx_a - __cx_b) * (__cy_a - __cy_b) > 0 then 1"
        " else 3 end"
    )
    binned = pairs.select(
        F.expr(sector).alias("sector"),
        "d2",
        ((F.col("__zq_a") - F.col("__zq_b"))
         * (F.col("__zq_a") - F.col("__zq_b"))).alias("dz2"),
        F.explode(F.array(*[F.lit(b) for b in range(nb)]))
        .alias("bin"),
    ).where(
        (F.col("d2") >= F.col("bin") * F.col("bin") * (bq * bq))
        & (F.col("d2") < (F.col("bin") + 1) * (F.col("bin") + 1)
           * (bq * bq))
    )
    return binned.groupBy("sector", "bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("dz2").alias("sum_sq_dz"),
    )


def bivariate_morans_i(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Bivariate Moran's I (Wartenberg 1985) — does variable x here
    predict variable y NEXT DOOR: the cross-variable sibling of
    morans_i ("do error-heavy cells neighbor slow-response cells",
    "does crawl density neighbor spam density"). Queen adjacency
    over observed cells, w_ij = 1:

        I_xy = n * sum_pairs dx_i * dy_j
               / (W * sqrt(sum dx^2) * sqrt(sum dy^2))

    Integer-exact moments via the n-scaled deviation trick (d_i =
    n*v_i - S, the n factors cancel); num and both denominator sums
    are int64-exact, the closing expression is one IEEE chain.
    Bound: |d| <= n*max(v) — keep under ~3e9 or pre-scale.

    Scale: morans_i's exact plan — ring-1 adjacency + two joins on
    the cell key + map-side-combined folds over the CELL table.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"),
        F.col(x).cast("long").alias("xv"),
        F.col(y).cast("long").alias("yv"),
    )
    mom = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xv").alias("sx"),
        F.sum("yv").alias("sy"),
    )
    d = base.crossJoin(F.broadcast(mom)).select(
        "c",
        F.expr("n * xv - sx").alias("dx"),
        F.expr("n * yv - sy").alias("dy"),
        "n",
    )
    nbrs = (
        grid_disk(d.select("c"), "c", res=res, k=1,
                  out="nc", ring_out="ring")
        .where(F.col("ring") == 1)
        .select("c", "nc")
    )
    pairs = (
        nbrs.join(d.select(F.col("c").alias("nc"),
                           F.col("dy").alias("dyj")), on="nc")
        .join(d.select("c", F.col("dx").alias("dxi")), on="c")
    )
    num = pairs.agg(
        F.count(F.lit(1)).alias("w_pairs"),
        F.sum(F.expr("dxi * dyj")).alias("num"),
    )
    den = d.agg(
        F.max("n").alias("n"),
        F.sum(F.expr("dx * dx")).alias("den_x"),
        F.sum(F.expr("dy * dy")).alias("den_y"),
    )
    return den.crossJoin(num).select(
        "n", "w_pairs", "num", "den_x", "den_y",
        F.expr(
            "CASE WHEN w_pairs > 0 AND den_x <> 0 AND den_y <> 0"
            " THEN (cast(n as double) * cast(num as double))"
            " / (cast(w_pairs as double)"
            " * sqrt(cast(den_x as double))"
            " * sqrt(cast(den_y as double))) END"
        ).alias("bv_morans_i"),
    )


def spatial_markov(
    t0: DataFrame,
    t1: DataFrame,
    res: int,
    n_classes: int = 3,
    class_div: int = 2,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Spatial Markov transition tally (Rey 2001) — do cells move
    up/down the value ladder DEPENDING on their neighborhood: the
    regional-convergence diagnostic ("poor cells surrounded by rich
    neighbors climb; poor-among-poor stay"), here over any two cell
    aggregates of the same lattice (two crawl snapshots, two time
    halves).

    Classing is the deterministic count ladder ``least(n_classes-1,
    v div class_div)`` (fixed integer thresholds — rank-based
    terciles would be order-dependent under ties); the neighbor
    context is the class of the ROOK+diagonal (queen ring-1) mean of
    t0 values, mean = integer div (truncation identical across
    engines on non-negative counts). Output: (nbr_class, c0, c1,
    n_cells) — the conditioned transition table; row-normalizing to
    probabilities is the caller's division.

    Only cells present in BOTH snapshots AND having >= 1 observed
    queen neighbor enter the tally (no-neighbor cells have no
    context; documented).

    Scale: one ring-1 explode + one join on the cell key + ONE hash
    aggregate over the CELL table.
    """
    from pdal_spark.operators.h3 import grid_disk

    k = int(n_classes) - 1
    cd = int(class_div)

    def cls(e: str) -> str:
        return f"least({k}, ({e}) div {cd})"

    b0 = t0.select(
        F.col(cell).alias("c"),
        F.col(value).cast("long").alias("v0"),
    )
    b1 = t1.select(
        F.col(cell).alias("c"),
        F.col(value).cast("long").alias("v1"),
    )
    both = b0.join(b1, on="c")
    nbrs = (
        grid_disk(b0.select("c"), "c", res=res, k=1,
                  out="nc", ring_out="ring")
        .where(F.col("ring") == 1)
        .select("c", "nc")
    )
    ctx = (
        nbrs.join(
            b0.select(F.col("c").alias("nc"),
                      F.col("v0").alias("vn")),
            on="nc",
        )
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.sum("vn").alias("sv"),
        )
        .select(
            "c",
            F.expr(cls("sv div n_nbrs")).alias("nbr_class"),
        )
    )
    return (
        both.join(ctx, on="c")
        .select(
            "nbr_class",
            F.expr(cls("v0")).alias("c0"),
            F.expr(cls("v1")).alias("c1"),
        )
        .groupBy("nbr_class", "c0", "c1")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
    )


def hoover_index(
    cells: DataFrame, value: str = "x"
) -> DataFrame:
    """Hoover (Robin Hood) concentration index over a cell aggregate
    — the share of mass that would have to MOVE for a uniform
    spatial distribution (0 = uniform over observed cells, -> 1 =
    all in one cell); the one-number spatial-concentration summary
    next to gini's rank-based form:

        H = sum_i |x_i / N - 1 / n| / 2
          = sum_i |n*x_i - N| / (2 n N)

    The absolute-deviation sum is exact int64 (n-scaled — no
    division inside the fold); H is one IEEE chain. Bound: |n*x| <
    2^63 / n.

    Scale: one count+sum fold, one broadcast-back, ONE abs fold.
    """
    base = cells.select(F.col(value).cast("long").alias("xv"))
    mom = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("xv").alias("tot")
    )
    return (
        base.crossJoin(F.broadcast(mom))
        .agg(
            F.max("n").alias("n"),
            F.max("tot").alias("tot"),
            F.sum(F.expr("abs(n * xv - tot)")).alias("sum_abs"),
        )
        .select(
            "n", "tot", "sum_abs",
            F.expr(
                "cast(sum_abs as double)"
                " / (2.0e0 * cast(n as double)"
                " * cast(tot as double))"
            ).alias("hoover"),
        )
    )


THEIL_Q = 1 << 20


def theil_inequality(
    cells: DataFrame, value: str = "x"
) -> DataFrame:
    """Theil's T inequality index over a cell aggregate (Theil 1967)
    — the entropy-based concentration measure that DECOMPOSES
    (between-region + within-region), unlike gini/hoover:

        T = (1/n) * sum_i (x_i / mu) ln(x_i / mu),
        x_i / mu = n * x_i / N

    Zero-valued cells contribute 0 (the x ln x limit). Each cell's
    term quantizes once to the 2^-20 grid (the category_entropy ln
    convention) so the fold is exact int64; T is one IEEE chain,
    rounded(9) (ln is INEXACT).

    Scale: one count+sum fold, one broadcast-back, ONE quantized
    fold.
    """
    from pdal_spark import sqlgen as G

    base = cells.select(F.col(value).cast("long").alias("xv"))
    mom = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("xv").alias("tot")
    )
    ratio = (
        "(cast(n as double) * cast(xv as double)"
        " / cast(tot as double))"
    )
    termq = (
        f"case when xv > 0 then cast(floor({ratio} * ln({ratio})"
        f" * {G.fnum(float(THEIL_Q))} + {G.fnum(0.5)}) as bigint)"
        " else 0 end"
    )
    return (
        base.crossJoin(F.broadcast(mom))
        .agg(
            F.max("n").alias("n"),
            F.max("tot").alias("tot"),
            F.sum(F.expr(termq)).alias("sum_q"),
        )
        .select(
            "n", "tot", "sum_q",
            F.expr(
                "round((cast(sum_q as double)"
                f" / {G.fnum(float(THEIL_Q))})"
                " / cast(n as double), 9)"
            ).alias("theil_t"),
        )
    )


HTB_Q = 1 << 20


def head_tail_breaks(
    cells: DataFrame,
    value: str = "x",
    max_levels: int = 6,
    head_max_frac: float = 0.4,
) -> DataFrame:
    """Head/tail breaks classification (Jiang 2013) — the natural
    classing scheme FOR heavy-tailed distributions (city sizes, web
    traffic, crawl host counts; Jenks/quantiles misrepresent power
    laws): split at the mean, keep the head, repeat while the head
    stays a minority.

    Level k's break = mean of the level's members, in 2^-20 fixed
    point ((sum * q) div n — exact int64, engine-identical); the
    head is STRICTLY above the mean. Iteration stops when the head
    fraction exceeds ``head_max_frac``, the head has < 2 members, or
    ``max_levels`` is reached. Output one row per level: (level, n,
    n_head, mean_q).

    Scale: one aggregate per level over a shrinking frontier —
    levels are O(log n) on heavy tails (~6 in practice); the
    per-level driver fetch is a two-value row (the repo's tiny
    two-phase convention, like quantile thresholds).
    """
    rows = []
    cur = cells.select(F.col(value).cast("long").alias("__v"))
    frac_num = int(round(float(head_max_frac) * 1000))
    for level in range(int(max_levels)):
        agg = cur.agg(
            F.count(F.lit(1)).alias("n"), F.sum("__v").alias("s")
        ).collect()[0]
        n = int(agg.n or 0)
        if n < 2:
            break
        mean_q = (int(agg.s) * HTB_Q) // n
        head = cur.where(
            F.expr(f"__v * cast({HTB_Q} as bigint) > {mean_q}")
        )
        n_head = head.count()
        rows.append((level, n, n_head, mean_q))
        # continue only while the head is a minority
        if n_head < 2 or n_head * 1000 > frac_num * n:
            break
        cur = head
    spark = cells.sparkSession
    return spark.createDataFrame(
        rows, "level int, n long, n_head long, mean_q long"
    )


def runs_test(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    threshold: int = 0,
) -> DataFrame:
    """Wald-Wolfowitz runs test per key — the randomness screen
    for sequences (bot cadence, sensor stuck-at faults, synthetic
    text detection over token-length series): too FEW runs of
    above/below-threshold values means streaky, too MANY means
    alternating.

        R  = number of runs, n1/n2 = above/at-or-below counts
        z  = (R - mu) / sigma,
        mu = 2 n1 n2 / n + 1
        sigma^2 = 2 n1 n2 (2 n1 n2 - n) / (n^2 (n - 1))

    R/n1/n2 are exact int64 off one lag window; z is a pure IEEE
    chain (+,-,*,/,sqrt — no trig, hash-exact unrounded). Keys with
    n1 = 0 or n2 = 0 (one-sided sequences, sigma undefined) emit
    NULL z. `order` must be a total order per key.

    Scale: one shuffle on the key (the window) + ONE hash agg.
    """
    w = Window.partitionBy("__k").orderBy("__o")
    s = df.select(
        F.col(key).alias("__k"),
        F.col(order).alias("__o"),
        (F.col(value) > F.lit(int(threshold)))
        .cast("int").alias("up"),
    ).select(
        "__k", "up",
        F.lag("up").over(w).alias("pup"),
    )
    agg = s.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("up").cast("long").alias("n1"),
        F.sum(
            F.when(
                F.col("pup").isNull()
                | (F.col("up") != F.col("pup")),
                1,
            ).otherwise(0)
        ).cast("long").alias("runs"),
    )
    mu = (
        "(2.0e0 * cast(n1 as double) * cast(n2 as double)"
        " / cast(n as double) + 1.0e0)"
    )
    sg2 = (
        "(2.0e0 * cast(n1 as double) * cast(n2 as double)"
        " * (2.0e0 * cast(n1 as double) * cast(n2 as double)"
        " - cast(n as double))"
        " / (cast(n as double) * cast(n as double)"
        " * (cast(n as double) - 1.0e0)))"
    )
    return agg.select(
        F.col("__k").alias(key),
        "n", "n1",
        F.expr("n - n1").alias("n2"),
        "runs",
    ).withColumn(
        "z",
        F.expr(
            f"case when n1 > 0 and n2 > 0 and n > 1 then"
            f" (cast(runs as double) - {mu}) / sqrt({sg2}) end"
        ),
    )


SEG_Q = 1 << 30


def segregation_indices(
    cells: DataFrame, g1: str = "g1", g2: str = "g2"
) -> DataFrame:
    """Duncan dissimilarity D + isolation index xP*x over a
    (cell, group1_count, group2_count) table (Duncan & Duncan 1955;
    Massey & Denton 1988) — THE two-group segregation pair: D = the
    share of group 1 that would have to move to match group 2's
    spatial distribution; isolation = the group-1 share the average
    group-1 member sees in their own cell.

        D   = sum_i |g1_i * G2 - g2_i * G1| / (2 G1 G2)
        P*  = sum_i g1_i^2 / (t_i * G1),  t_i = g1_i + g2_i

    D's fold is exact int64 (cross-multiplied — no per-cell
    division); P*'s per-cell rational quantizes to (g1^2 * q) div t
    (exact, engine-identical), so both folds are order-invariant
    and the closing expressions are single IEEE chains. Bound:
    |g1 * G2| < 2^63.

    Scale: one totals fold, one broadcast-back, ONE combined fold.
    """
    base = cells.select(
        F.col(g1).cast("long").alias("a"),
        F.col(g2).cast("long").alias("b"),
    )
    tot = base.agg(
        F.sum("a").alias("ga"), F.sum("b").alias("gb")
    )
    return (
        base.crossJoin(F.broadcast(tot))
        .agg(
            F.max("ga").alias("ga"),
            F.max("gb").alias("gb"),
            F.sum(F.expr("abs(a * gb - b * ga)")).alias("sum_abs"),
            F.sum(
                F.expr(
                    "case when a + b > 0 then"
                    f" (a * a * cast({SEG_Q} as bigint))"
                    " div (a + b) else 0 end"
                )
            ).alias("iso_q"),
        )
        .select(
            "ga", "gb", "sum_abs", "iso_q",
            F.expr(
                "cast(sum_abs as double)"
                " / (2.0e0 * cast(ga as double)"
                " * cast(gb as double))"
            ).alias("d_index"),
            F.expr(
                "cast(iso_q as double)"
                f" / (cast({SEG_Q} as double) * cast(ga as double))"
            ).alias("isolation"),
        )
    )


def spearman_corr(
    df: DataFrame, key: str, a: str, b: str
) -> DataFrame:
    """Spearman rank correlation per key — the monotone-association
    complement of grouped_corr's Pearson (robust to outliers and
    nonlinear-but-monotone relationships; the standard screen before
    trusting a linear fit). Ties get average ranks, carried DOUBLED
    so they stay integers:

        ra2 = 2 * avg_rank = 2 * rank() + count(ties) - 1

    (1-based rank; the doubled form keeps tie averages integral)

    All five moments over (ra2, rb2) are exact int64; rho is one
    IEEE chain. Bound: sums of ra2^2 ~ 4 n^3 per key — keys up to
    ~1e6 rows are exact.

    Scale: two rank windows + one tie-count window per column (all
    on the same key shuffle) + ONE hash aggregate.
    """
    wa = Window.partitionBy("__k").orderBy("__a")
    wb = Window.partitionBy("__k").orderBy("__b")
    ta = Window.partitionBy("__k", "__a")
    tb = Window.partitionBy("__k", "__b")
    r = df.select(
        F.col(key).alias("__k"),
        F.col(a).cast("long").alias("__a"),
        F.col(b).cast("long").alias("__b"),
    ).select(
        "__k",
        (2 * F.rank().over(wa) + F.count(F.lit(1)).over(ta) - 1)
        .cast("long").alias("ra2"),
        (2 * F.rank().over(wb) + F.count(F.lit(1)).over(tb) - 1)
        .cast("long").alias("rb2"),
    )
    agg = r.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ra2").alias("sa"),
        F.sum("rb2").alias("sb"),
        F.sum(F.expr("ra2 * ra2")).alias("saa"),
        F.sum(F.expr("rb2 * rb2")).alias("sbb"),
        F.sum(F.expr("ra2 * rb2")).alias("sab"),
    )
    return agg.select(
        F.col("__k").alias(key), "n",
        F.expr(
            "case when n * saa - sa * sa > 0"
            " and n * sbb - sb * sb > 0 then"
            " (cast(n as double) * cast(sab as double)"
            " - cast(sa as double) * cast(sb as double))"
            " / (sqrt(cast(n as double) * cast(saa as double)"
            " - cast(sa as double) * cast(sa as double))"
            " * sqrt(cast(n as double) * cast(sbb as double)"
            " - cast(sb as double) * cast(sb as double))) end"
        ).alias("rho"),
    )


def simpson_diversity(
    df: DataFrame, group_col: str, cat_col: str
) -> DataFrame:
    """Simpson diversity per group (Simpson 1949) — the probability
    two draws differ, and its Hill-number inverse (effective
    category count): the concentration dial next to
    category_entropy's Shannon form (Simpson weights dominance,
    entropy weights richness).

        D = sum_c c(c-1) / (n(n-1));  simpson = 1 - D
        hill2 = n(n-1) / sum_c c(c-1)   (NULL when one category
                dominates completely is impossible — NULL only when
                every category is a singleton, D = 0)

    Exact int64 folds; both outputs single IEEE divisions. Groups
    with n < 2 drop (no pair to draw).

    Scale: ONE (group, cat) count + ONE group fold, all map-side
    combined.
    """
    cnt = df.groupBy(group_col, cat_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = cnt.groupBy(group_col).agg(
        F.sum("c").alias("n"),
        F.sum(F.expr("c * (c - 1)")).alias("pairs_same"),
    ).where(F.col("n") >= 2)
    return agg.select(
        group_col, "n", "pairs_same",
        F.expr(
            "1.0e0 - cast(pairs_same as double)"
            " / (cast(n as double) * (cast(n as double) - 1.0e0))"
        ).alias("simpson"),
        F.expr(
            "case when pairs_same > 0 then"
            " cast(n as double) * (cast(n as double) - 1.0e0)"
            " / cast(pairs_same as double) end"
        ).alias("hill2"),
    )


def diff_in_diff(
    df: DataFrame,
    group: str = "treated",
    period: str = "post",
    y: str = "y",
) -> DataFrame:
    """Difference-in-differences estimator (Card & Krueger 1994's
    workhorse) — the causal-effect readout for a treatment rolled
    out to one cohort between two periods (feature launches, crawler
    policy changes):

        DiD = (y̅_treated,post - y̅_treated,pre)
            - (y̅_control,post - y̅_control,pre)

    `group`/`period` are 0/1 integer flags; y must be integer-
    valued (quantize upstream). The four cell (n, sum) pairs are
    exact int64 off ONE hash aggregate; every mean and the DiD are
    one IEEE chain. Missing cells (no rows) make the estimate
    undefined -> NULL.

    Scale: ONE map-side-combined groupBy over 4 groups + a 4-row
    pivot; nothing shuffles but the aggregate.
    """
    cells = df.groupBy(
        F.col(group).cast("int").alias("g"),
        F.col(period).cast("int").alias("p"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(y).cast("long")).alias("s"),
    )
    piv = cells.groupBy().pivot("g", [0, 1]).agg(
        F.max(F.when(F.col("p") == 0, F.col("s"))).alias("s_pre"),
        F.max(F.when(F.col("p") == 0, F.col("n"))).alias("n_pre"),
        F.max(F.when(F.col("p") == 1, F.col("s"))).alias("s_post"),
        F.max(F.when(F.col("p") == 1, F.col("n"))).alias("n_post"),
    )
    return piv.select(
        F.col("0_s_pre").alias("c_pre_s"),
        F.col("0_n_pre").alias("c_pre_n"),
        F.col("0_s_post").alias("c_post_s"),
        F.col("0_n_post").alias("c_post_n"),
        F.col("1_s_pre").alias("t_pre_s"),
        F.col("1_n_pre").alias("t_pre_n"),
        F.col("1_s_post").alias("t_post_s"),
        F.col("1_n_post").alias("t_post_n"),
    ).select(
        "*",
        F.expr(
            "(cast(t_post_s as double) / cast(t_post_n as double)"
            " - cast(t_pre_s as double) / cast(t_pre_n as double))"
            " - (cast(c_post_s as double) / cast(c_post_n as double)"
            " - cast(c_pre_s as double) / cast(c_pre_n as double))"
        ).alias("did"),
    )


def partial_correlation(
    df: DataFrame, key: str, x: str, y: str, z: str
) -> DataFrame:
    """Partial correlation r_xy.z per key — the x-y association
    with the confounder z held constant (the "is the correlation
    just geography/volume" screen over grouped_corr's raw Pearson):

        r_xy.z = (r_xy - r_xz r_yz)
                 / sqrt((1 - r_xz^2)(1 - r_yz^2))

    All nine cross-moments are exact int64 off ONE hash aggregate;
    every r and the closing expression are one fixed IEEE chain.
    Degenerate variance in any column, or |r_xz| = 1 or |r_yz| = 1,
    emits NULL.

    Scale: ONE map-side-combined hash aggregate.
    """
    m = df.select(
        F.col(key).alias("k"),
        F.col(x).cast("long").alias("vx"),
        F.col(y).cast("long").alias("vy"),
        F.col(z).cast("long").alias("vz"),
    ).groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vx").alias("sx"),
        F.sum("vy").alias("sy"),
        F.sum("vz").alias("sz"),
        F.sum(F.expr("vx * vx")).alias("sxx"),
        F.sum(F.expr("vy * vy")).alias("syy"),
        F.sum(F.expr("vz * vz")).alias("szz"),
        F.sum(F.expr("vx * vy")).alias("sxy"),
        F.sum(F.expr("vx * vz")).alias("sxz"),
        F.sum(F.expr("vy * vz")).alias("syz"),
    )
    c = (
        "(cast(n as double) * cast(s{ab} as double)"
        " - cast(s{a} as double) * cast(s{b} as double))"
    )
    cxx = c.format(ab="xx", a="x", b="x")
    cyy = c.format(ab="yy", a="y", b="y")
    czz = c.format(ab="zz", a="z", b="z")
    cxy = c.format(ab="xy", a="x", b="y")
    cxz = c.format(ab="xz", a="x", b="z")
    cyz = c.format(ab="yz", a="y", b="z")
    rxy = f"({cxy} / (sqrt({cxx}) * sqrt({cyy})))"
    rxz = f"({cxz} / (sqrt({cxx}) * sqrt({czz})))"
    ryz = f"({cyz} / (sqrt({cyy}) * sqrt({czz})))"
    return m.select(
        F.col("k").alias(key), "n",
        F.expr(
            f"case when {cxx} > 0 and {cyy} > 0 and {czz} > 0"
            f" and (1.0e0 - {rxz} * {rxz}) > 0.0e0"
            f" and (1.0e0 - {ryz} * {ryz}) > 0.0e0 then"
            f" ({rxy} - {rxz} * {ryz})"
            f" / sqrt((1.0e0 - {rxz} * {rxz})"
            f" * (1.0e0 - {ryz} * {ryz})) end"
        ).alias("r_xy_z"),
    )


BRIER_Q = 1000


def brier_score(
    df: DataFrame,
    prob_q: str = "prob_q",
    label: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Brier score with the Murphy (1973) reliability / resolution /
    uncertainty decomposition — the probability-forecast quality
    readout for quality classifiers and dedup-confidence models
    (calibration_bins shows the curve; this is the one-number family
    over it). Probabilities arrive in BRIER_Q=1000 fixed point
    (0..1000).

        BS = mean (p - y)^2
           = uncertainty - resolution + reliability

    Folds are exact int64: the global squared-error sum and the
    per-bin reliability terms (sp - Q*sy)^2 div n_k. The resolution
    term's integer form overflows ((n*Q*sy)^2 blows past 2^63 at
    10^4 rows), so each bin's a^2/(n_k n^2) <= 1 computes as a
    DETERMINISTIC IEEE double and quantizes to the 2^-40 grid before
    the sum (the ln-quantization convention) — order-invariant.
    Closing values are IEEE chains over exact ints.

    Output: one row (n, n_pos, bs, reliability, resolution,
    uncertainty).

    Scale: one global fold + ONE (bin) fold over the grouped table.
    Bound: (n_k * Q)^2 per bin < 2^63 — ~3e6 rows per bin at Q=1e3.
    """
    q = BRIER_Q
    w = max(1, q // int(n_bins))
    base = df.select(
        F.col(prob_q).cast("long").alias("p"),
        F.col(label).cast("long").alias("y"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum(
            F.expr(f"(p - {q} * y) * (p - {q} * y)")
        ).alias("se_sum"),
    )
    bins = base.groupBy(
        F.expr(f"p div {w}").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.sum("p").alias("sp"),
        F.sum("y").alias("sy"),
    )
    dec = bins.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.expr(
                f"((sp - {q} * sy) * (sp - {q} * sy)) div n_k"
            )
        ).alias("rel_q"),
        # resolution: n_k * (ybar_k - ybar)^2 = a^2/(n_k n^2) with
        # a = n*sy - n_k*n_pos; the term is <= 1, quantized 2^-40
        F.sum(
            F.expr(
                "cast(floor((cast(n * sy - n_k * n_pos as double)"
                " * cast(n * sy - n_k * n_pos as double)"
                " / (cast(n_k as double) * cast(n as double)"
                " * cast(n as double)))"
                f" * cast({1 << 40} as double) + 0.5e0) as bigint)"
            )
        ).alias("res_q"),
    )
    return tot.crossJoin(F.broadcast(dec)).select(
        "n", "n_pos",
        F.expr(
            "cast(se_sum as double)"
            f" / (cast(n as double) * {float(q)}e0 * {float(q)}e0)"
        ).alias("bs"),
        F.expr(
            "cast(rel_q as double)"
            f" / (cast(n as double) * {float(q)}e0 * {float(q)}e0)"
        ).alias("reliability"),
        F.expr(
            "cast(res_q as double)"
            f" / (cast({1 << 40} as double) * cast(n as double))"
        ).alias("resolution"),
        F.expr(
            "(cast(n_pos as double) / cast(n as double))"
            " * (1.0e0 - cast(n_pos as double) / cast(n as double))"
        ).alias("uncertainty"),
    )


def trimmed_mean(
    df: DataFrame,
    key: str,
    value: str,
    id_col: str,
    trim_pct: int = 10,
) -> DataFrame:
    """Per-key trimmed mean — drop the lowest and highest
    ``trim_pct`` percent (by value, ties broken on the unique id so
    the cut is DETERMINISTIC) and average the middle: the
    outlier-robust location estimate between mean and median
    (winsorize clamps; this removes).

        k  = (n * trim_pct) div 100  rows cut from EACH side
        tm = sum(middle) / (n - 2k)

    The kept-sum is exact int64 off one row_number window; tm is one
    IEEE division. Keys with n - 2k <= 0 drop.

    Scale: one shuffle on the key (the window) + ONE hash agg.
    """
    w = Window.partitionBy("__k").orderBy("__v", "__id")
    r = df.select(
        F.col(key).alias("__k"),
        F.col(value).cast("long").alias("__v"),
        F.col(id_col).alias("__id"),
    ).select(
        "__k", "__v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("__k")
        ).alias("n"),
    )
    pct = int(trim_pct)
    kept = r.where(
        F.expr(f"rn > (n * {pct}) div 100")
        & F.expr(f"rn <= n - (n * {pct}) div 100")
    )
    agg = kept.groupBy("__k").agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("__v").alias("kept_sum"),
    ).where(F.col("n_kept") > 0)
    return agg.select(
        F.col("__k").alias(key), "n", "n_kept", "kept_sum",
        F.expr(
            "cast(kept_sum as double) / cast(n_kept as double)"
        ).alias("tmean"),
    )


QN_Q = 1 << 20


def quantile_normalize(
    df: DataFrame,
    group: str,
    value: str,
    id_col: str,
) -> DataFrame:
    """Quantile normalization across groups (the batch-effect
    remover of bioinformatics, equally at home harmonizing per-crawl
    score distributions): rank within each group (ties broken on the
    unique id — deterministic), then replace each value with the
    ACROSS-GROUP mean of the values holding that rank. After it,
    every group has the identical distribution.

    Requires equal group sizes (the classical form — enforced
    loudly, like fleiss_kappa's constant-n). The reference value per
    rank is (sum over groups * q) div G — exact int64 fixed point.

    Output: (group, id, rank, qn_q) with qn_q on the 2^-20 grid.

    Scale: one rank window per group + ONE hash agg on rank (G rows
    per rank) + one join back on rank.
    """
    w = Window.partitionBy("__g").orderBy("__v", "__id")
    r = df.select(
        F.col(group).alias("__g"),
        F.col(value).cast("long").alias("__v"),
        F.col(id_col).alias("__id"),
    ).select(
        "__g", "__v", "__id",
        F.row_number().over(w).alias("rank"),
    )
    sizes = r.groupBy("__g").agg(F.max("rank").alias("sz"))
    chk = sizes.agg(
        F.min("sz").alias("lo"), F.max("sz").alias("hi"),
        F.count(F.lit(1)).alias("g"),
    ).collect()[0]
    if chk.lo != chk.hi:
        raise ValueError(
            "quantile_normalize requires equal group sizes"
            f" (saw {chk.lo}..{chk.hi})"
        )
    n_groups = int(chk.g)
    ref = r.groupBy("rank").agg(
        F.expr(
            f"(sum(__v) * cast({QN_Q} as bigint))"
            f" div {n_groups}"
        ).alias("qn_q")
    )
    return r.join(ref, on="rank").select(
        F.col("__g").alias(group),
        F.col("__id").alias(id_col),
        "rank",
        "qn_q",
    )


def conformal_interval(
    calib: DataFrame,
    test: DataFrame,
    alpha_pct: int = 10,
    pred: str = "pred",
    y: str = "y",
    id_col: str = "id",
) -> DataFrame:
    """Split conformal prediction intervals (Vovk et al.; Lei et al.
    2018) — distribution-free 1-alpha coverage for ANY point
    predictor: qhat = the ceil((n+1)(1-alpha))-th smallest absolute
    calibration residual, and every test prediction gets
    [pred - qhat, pred + qhat]. The modern uncertainty wrapper for
    quality-score / regression models feeding curation thresholds.

    Residuals and the order statistic are exact int64 (the k-th
    VALUE is tie-order-independent); k = ((n+1) * (100 - alpha_pct)
    + 99) div 100 in integer arithmetic. If k > n (tiny calibration
    sets) the interval is undefined — rows emit NULL bounds.

    Scale: one window over the CALIBRATION set only (assumed
    moderate — it is a held-out sample); qhat broadcasts to the test
    frame, which never shuffles.
    """
    res = calib.select(
        F.expr(
            f"abs(cast(`{y}` as bigint) - cast(`{pred}` as bigint))"
        ).alias("r")
    )
    n_w = Window.partitionBy()
    w = Window.orderBy("r")
    ranked = res.select(
        "r",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    )
    qhat = ranked.where(
        F.expr(
            f"rn = ((n + 1) * (100 - {int(alpha_pct)}) + 99)"
            " div 100"
        )
    ).select(F.col("r").alias("qhat"))
    return (
        test.select(
            F.col(id_col), F.col(pred).cast("long").alias("__p")
        )
        .join(F.broadcast(qhat), how="left")
        .select(
            id_col,
            F.col("__p").alias(pred),
            F.expr("__p - qhat").alias("lo"),
            F.expr("__p + qhat").alias("hi"),
        )
    )


def fairness_gaps(
    df: DataFrame,
    group: str = "grp",
    label: str = "label",
    pred: str = "pred",
) -> DataFrame:
    """Group-fairness audit: per group the selection rate
    (demographic parity), TPR and FPR (equalized odds), plus the
    across-group max-min gaps — the standard pre-deployment screen
    for classifiers gating content or users (Hardt et al. 2016).

    All tallies are exact int64 off ONE hash aggregate; each rate is
    one IEEE division (NULL when its denominator is 0 — a group with
    no positives has no TPR); gaps are window max-min over the
    GROUPS table (tiny).

    Output per group: (group, n, sel_rate, tpr, fpr, dp_gap,
    tpr_gap, fpr_gap) — the gap columns repeat on every row.
    """
    agg = df.groupBy(F.col(group).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(pred).cast("long")).alias("n_sel"),
        F.sum(
            (F.col(label).cast("int") * F.col(pred).cast("int"))
            .cast("long")
        ).alias("tp"),
        F.sum(F.col(label).cast("long")).alias("n_pos"),
        F.sum(
            ((1 - F.col(label).cast("int"))
             * F.col(pred).cast("int")).cast("long")
        ).alias("fp"),
    )
    rates = agg.select(
        F.col("g").alias(group), "n",
        F.expr(
            "cast(n_sel as double) / cast(n as double)"
        ).alias("sel_rate"),
        F.expr(
            "case when n_pos > 0 then"
            " cast(tp as double) / cast(n_pos as double) end"
        ).alias("tpr"),
        F.expr(
            "case when n - n_pos > 0 then"
            " cast(fp as double) / cast(n - n_pos as double) end"
        ).alias("fpr"),
    )
    w = Window.partitionBy()
    return rates.select(
        "*",
        (F.max("sel_rate").over(w) - F.min("sel_rate").over(w))
        .alias("dp_gap"),
        (F.max("tpr").over(w) - F.min("tpr").over(w)).alias("tpr_gap"),
        (F.max("fpr").over(w) - F.min("fpr").over(w)).alias("fpr_gap"),
    )


def weighted_median(
    df: DataFrame,
    key: str,
    value: str,
    weight: str,
    id_col: str,
) -> DataFrame:
    """Exact weighted median per key — the robust location under
    importance weights (domain caps, temperature resampling weights,
    population weights): the smallest value whose cumulative weight
    reaches half the total, ties in value broken on the unique id so
    the pick is DETERMINISTIC.

    Cumulative and total weights are exact int64 off one ordered
    window + one partition total; the pick is the first row with
    2 * cumw >= total (the lower weighted median convention —
    documented; no averaging of straddling values). Zero-total keys
    drop.

    Scale: one shuffle on the key (the window) + ONE min-pick
    aggregate (the pick encodes as a SCALAR (flag, value-rank) the
    same way golden_record's oracle does).
    """
    w_cum = (
        Window.partitionBy("__k")
        .orderBy("__v", "__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("__k")
    r = df.select(
        F.col(key).alias("__k"),
        F.col(value).cast("long").alias("__v"),
        F.col(weight).cast("long").alias("__w"),
        F.col(id_col).alias("__id"),
    ).where(F.col("__w") > 0).select(
        "__k", "__v",
        F.sum("__w").over(w_cum).alias("cumw"),
        F.sum("__w").over(w_tot).alias("total"),
    )
    hit = r.where(F.expr("2 * cumw >= total"))
    return (
        hit.groupBy("__k")
        .agg(
            F.max("total").alias("w_total"),
            F.min("__v").alias("wmedian"),
        )
        .select(F.col("__k").alias(key), "w_total", "wmedian")
    )


def chi_square_independence(
    df: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Pearson chi-square test of independence between two
    categorical columns, with Cramér's V effect size — the
    contingency-table screen next to cohen_kappa (agreement) and
    log_odds_keywords (per-cell direction): is event type
    independent of region, is language independent of source.

        chi2 = sum_ij (n O_ij - R_i C_j)^2 / (n R_i C_j)
        V    = sqrt(chi2 / (n * (min(r, c) - 1)))

    Observed counts and both marginals are exact int64; each cell's
    term is one IEEE chain over them and the sum quantizes per cell
    to the 2^-20 grid first (float addition is order-dependent) —
    so chi2 is partitioning-invariant. Degenerate tables (r < 2 or
    c < 2) emit NULL V.

    Scale: ONE (a, b) hash agg; marginals derive from the grouped
    table and join back on their keys (broadcast-eligible).
    Overflow note: the cell term computes in double (n R C exceeds
    int64 at ~1e6 rows x wide margins; int64->double rounding is
    engine-identical).
    """
    from pdal_spark import sqlgen as G

    obs = df.groupBy(
        F.col(a).alias("__a"), F.col(b).alias("__b")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    ra = obs.groupBy("__a").agg(F.sum("o").alias("r_i"))
    cb = obs.groupBy("__b").agg(F.sum("o").alias("c_j"))
    tot = obs.agg(
        F.sum("o").alias("n"),
        F.countDistinct("__a").alias("r"),
        F.countDistinct("__b").alias("c"),
    )
    term = (
        "((cast(n as double) * cast(o as double)"
        " - cast(r_i as double) * cast(c_j as double))"
        " * (cast(n as double) * cast(o as double)"
        " - cast(r_i as double) * cast(c_j as double)))"
        " / (cast(n as double) * cast(r_i as double)"
        " * cast(c_j as double))"
    )
    # absent cells (O = 0) still contribute E = R C / n: add the
    # zero-cell mass via the identity sum_present + sum_absent,
    # where sum over ALL cells of E = n -> absent mass = n minus
    # the present cells' E. Each present term quantizes 2^-20.
    cells = (
        obs.join(ra, on="__a")
        .join(F.broadcast(cb), on="__b")
        .crossJoin(F.broadcast(tot))
    )
    agg = cells.agg(
        F.max("n").alias("n"),
        F.max("r").alias("r"),
        F.max("c").alias("c"),
        F.sum(
            F.expr(
                f"cast(floor(({term}) * cast({ENTROPY_Q} as double)"
                " + 0.5e0) as bigint)"
            )
        ).alias("chi_pres_q"),
        F.sum(
            F.expr(
                "cast(floor((cast(r_i as double)"
                " * cast(c_j as double) / cast(n as double))"
                f" * cast({ENTROPY_Q} as double)"
                " + 0.5e0) as bigint)"
            )
        ).alias("e_pres_q"),
    )
    qf = G.fnum(float(ENTROPY_Q))
    return agg.select(
        "n",
        F.col("r").cast("long").alias("r"),
        F.col("c").cast("long").alias("c"),
        F.expr(
            f"(cast(chi_pres_q as double)"
            f" + cast(n as double) * {qf}"
            f" - cast(e_pres_q as double)) / {qf}"
        ).alias("chi2"),
        F.expr(
            "case when least(r, c) >= 2 then"
            f" sqrt(((cast(chi_pres_q as double)"
            f" + cast(n as double) * {qf}"
            f" - cast(e_pres_q as double)) / {qf})"
            " / (cast(n as double)"
            " * (cast(least(r, c) as double) - 1.0e0))) end"
        ).alias("cramers_v"),
    )


def g_test(
    df: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """G-test (likelihood-ratio) of independence — chi-square's
    information-theoretic twin (G = 2 * n * mutual information in
    nats; additive across table partitions, which Pearson chi2 is
    not):

        G = 2 * sum_ij O_ij ln( n O_ij / (R_i C_j) )

    Counts/marginals exact int64; each present cell's ln term
    quantizes once to the 2^-20 grid (absent cells contribute 0 —
    the x ln x limit), so the fold is order-invariant; G is one
    closing IEEE chain rounded(9) (ln is INEXACT).

    Scale: chi_square_independence's exact plan — ONE (a,b) agg +
    marginal join-backs.
    """
    from pdal_spark import sqlgen as G

    obs = df.groupBy(
        F.col(a).alias("__a"), F.col(b).alias("__b")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    ra = obs.groupBy("__a").agg(F.sum("o").alias("r_i"))
    cb = obs.groupBy("__b").agg(F.sum("o").alias("c_j"))
    tot = obs.agg(F.sum("o").alias("n"))
    qf = G.fnum(float(ENTROPY_Q))
    termq = (
        "cast(floor(cast(o as double)"
        " * ln(cast(n as double) * cast(o as double)"
        " / (cast(r_i as double) * cast(c_j as double)))"
        f" * {qf} + {G.fnum(0.5)}) as bigint)"
    )
    agg = (
        obs.join(ra, on="__a")
        .join(F.broadcast(cb), on="__b")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").alias("n"),
            F.sum(F.expr(termq)).alias("g_q"),
        )
    )
    return agg.select(
        "n", "g_q",
        F.expr(
            f"round(2.0e0 * cast(g_q as double) / {qf}, 9)"
        ).alias("g_stat"),
    )


def odds_ratio(
    df: DataFrame, exposed: str = "exposed", case: str = "is_case"
) -> DataFrame:
    """2x2 odds ratio with the Woolf log-interval half-width — the
    epidemiology/AB-screen effect size for binary exposure vs binary
    outcome (does a domain flag predict spam, does a feature flag
    predict errors):

        OR = (a d) / (b c),  se = sqrt(1/a + 1/b + 1/c + 1/d)

    (a = exposed cases, b = exposed controls, c = unexposed cases,
    d = unexposed controls). Cells are exact int64 off ONE hash agg;
    OR and se are single IEEE chains; any zero cell makes both
    undefined -> NULL (use the Haldane +0.5 upstream if needed).
    """
    cells = df.agg(
        F.sum(
            F.expr(
                f"cast(`{exposed}` as int) * cast(`{case}` as int)"
            ).cast("long")
        ).alias("a"),
        F.sum(
            F.expr(
                f"cast(`{exposed}` as int)"
                f" * (1 - cast(`{case}` as int))"
            ).cast("long")
        ).alias("b"),
        F.sum(
            F.expr(
                f"(1 - cast(`{exposed}` as int))"
                f" * cast(`{case}` as int)"
            ).cast("long")
        ).alias("c"),
        F.sum(
            F.expr(
                f"(1 - cast(`{exposed}` as int))"
                f" * (1 - cast(`{case}` as int))"
            ).cast("long")
        ).alias("d"),
    )
    ok = "a > 0 and b > 0 and c > 0 and d > 0"
    return cells.select(
        "a", "b", "c", "d",
        F.expr(
            f"case when {ok} then"
            " (cast(a as double) * cast(d as double))"
            " / (cast(b as double) * cast(c as double)) end"
        ).alias("or_est"),
        F.expr(
            f"case when {ok} then"
            " sqrt(1.0e0 / cast(a as double)"
            " + 1.0e0 / cast(b as double)"
            " + 1.0e0 / cast(c as double)"
            " + 1.0e0 / cast(d as double)) end"
        ).alias("log_se"),
    )


def mcnemar_test(
    df: DataFrame, x: str = "x", y: str = "y"
) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes (McNemar 1947) —
    did the new classifier/filter change decisions beyond noise:
    only the discordant pairs matter,

        chi2 = (b - c)^2 / (b + c)

    (b = x-only positives, c = y-only positives). Exact int64
    tallies off ONE agg; the statistic is one IEEE division; b + c
    = 0 (no disagreements) -> NULL.
    """
    cells = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr(
                f"cast(`{x}` as int) * (1 - cast(`{y}` as int))"
            ).cast("long")
        ).alias("b"),
        F.sum(
            F.expr(
                f"(1 - cast(`{x}` as int)) * cast(`{y}` as int)"
            ).cast("long")
        ).alias("c"),
    )
    return cells.select(
        "n", "b", "c",
        F.expr(
            "case when b + c > 0 then"
            " cast((b - c) * (b - c) as double)"
            " / cast(b + c as double) end"
        ).alias("mcnemar_chi2"),
    )


def weighted_kappa(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_levels: int,
) -> DataFrame:
    """Quadratic-weighted Cohen's kappa for ORDINAL labels (Cohen
    1968) — the agreement metric when ratings are graded (quality
    scores 0..k-1): near-misses cost (i-j)^2, so it punishes a
    2-vs-4 disagreement more than 2-vs-3, which plain cohen_kappa
    treats identically.

        wk = 1 - n * sum_ij w_ij O_ij / sum_ij w_ij R_i C_j,
        w_ij = (i - j)^2

    O/R/C tallies are exact int64; both weighted sums fold exactly
    (w <= (k-1)^2 is a small constant); wk is one IEEE chain. A
    degenerate expected sum (all mass on one diagonal cell) -> NULL.

    Scale: ONE (a, b) hash agg; the weighted-expected sum folds over
    the R x C marginal cross (k^2 rows — tiny).
    """
    obs = df.groupBy(
        F.col(col_a).cast("long").alias("i"),
        F.col(col_b).cast("long").alias("j"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    tot = obs.agg(F.sum("o").alias("n"))
    ra = obs.groupBy("i").agg(F.sum("o").alias("r_i"))
    cb = obs.groupBy("j").agg(F.sum("o").alias("c_j"))
    num = obs.agg(
        F.sum(F.expr("(i - j) * (i - j) * o")).alias("wo")
    )
    den = (
        ra.crossJoin(F.broadcast(cb))
        .agg(
            F.sum(
                F.expr("(i - j) * (i - j) * r_i * c_j")
            ).alias("we")
        )
    )
    return (
        tot.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .select(
            "n", "wo", "we",
            F.expr(
                "case when we > 0 then"
                " 1.0e0 - cast(n as double) * cast(wo as double)"
                " / cast(we as double) end"
            ).alias("wkappa"),
        )
    )


def icc_oneway(
    df: DataFrame, item: str = "item", value: str = "y"
) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1)
    (Shrout & Fleiss 1979) — how much of rating variance is BETWEEN
    items rather than rater noise: the continuous-score reliability
    next to fleiss_kappa's categorical form. Requires the classical
    balanced design (equal ratings k per item — enforced loudly).

        MSB = k * sum_i (m_i - m)^2 / (g - 1)
        MSW = sum_ij (y_ij - m_i)^2 / (g (k - 1))
        ICC = (MSB - MSW) / (MSB + (k - 1) MSW)

    All sums of squares expand to exact int64 moments (n-scaled
    deviations); the closing algebra is one IEEE chain. Output one
    row: (g items, k raters, ssb_q, ssw_q scale-carrying exact ints,
    icc).

    Scale: ONE (item) hash agg + one global fold.
    """
    per = df.groupBy(F.col(item).alias("__i")).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col(value).cast("long")).alias("s"),
        F.sum(
            F.expr(f"cast(`{value}` as bigint)"
                   f" * cast(`{value}` as bigint)")
        ).alias("ss"),
    )
    chk = per.agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    ).collect()[0]
    if chk.lo != chk.hi:
        raise ValueError(
            "icc_oneway requires equal ratings per item"
            f" (saw {chk.lo}..{chk.hi})"
        )
    k = int(chk.lo)
    if k < 2:
        raise ValueError("icc_oneway needs >= 2 ratings per item")
    g = per.agg(
        F.count(F.lit(1)).cast("long").alias("g"),
        F.sum("s").alias("st"),
        F.sum("ss").alias("sst"),
        # k-scaled between-item sum of squares: sum_i (k*m_i - k*m)^2
        # = sum_i s_i^2 * k^2 / k^2 ... carried as sum s_i^2
        F.sum(F.expr("s * s")).alias("s2"),
    )
    # SSB * k = sum s_i^2 - (sum s)^2 / g  (x k scale); SSW = sst -
    # sum s_i^2 / k. Carry exact g*k-scaled forms:
    #   ssb_q = g * sum s_i^2 - st^2          (= g k^2 SSB... ) and
    #   ssw_q = k * sst - s2                  (= k SSW)
    return g.select(
        "g",
        F.lit(k).cast("long").alias("k"),
        F.expr("g * s2 - st * st").alias("ssb_q"),
        F.expr(f"{k} * sst - s2").alias("ssw_q"),
        F.expr(
            # MSB = ssb_q / (g k (g-1)); MSW = ssw_q / (g k (k-1))
            # ICC = (MSB - MSW)/(MSB + (k-1) MSW): scale g*k cancels
            "case when"
            " cast(g * s2 - st * st as double)"
            " / (cast(g as double) - 1.0e0)"
            f" + (cast({k} as double) - 1.0e0)"
            f" * cast({k} * sst - s2 as double)"
            f" / (cast({k} as double) - 1.0e0) <> 0.0e0 then"
            " (cast(g * s2 - st * st as double)"
            " / (cast(g as double) - 1.0e0)"
            f" - cast({k} * sst - s2 as double)"
            f" / (cast({k} as double) - 1.0e0))"
            " / (cast(g * s2 - st * st as double)"
            " / (cast(g as double) - 1.0e0)"
            f" + (cast({k} as double) - 1.0e0)"
            f" * cast({k} * sst - s2 as double)"
            f" / (cast({k} as double) - 1.0e0)) end"
        ).alias("icc"),
    )


def cronbach_alpha(
    df: DataFrame, items: list[str]
) -> DataFrame:
    """Cronbach's alpha internal-consistency reliability (Cronbach
    1951) — do the k item scores measure one underlying thing (the
    multi-signal quality-score sanity check: if alpha is low, the
    composite "quality" number is averaging unrelated signals):

        alpha = k/(k-1) * (1 - sum_i var(item_i) / var(total))

    Every variance expands to exact int64 moments off ONE hash
    aggregate over the respondent rows (items are COLUMNS); alpha is
    one IEEE chain. Zero total variance -> NULL.
    """
    k = len(items)
    if k < 2:
        raise ValueError("cronbach_alpha needs >= 2 items")
    tot_expr = " + ".join(f"cast(`{c}` as bigint)" for c in items)
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for idx, c in enumerate(items):
        aggs.append(
            F.sum(F.expr(f"cast(`{c}` as bigint)")).alias(f"s{idx}")
        )
        aggs.append(
            F.sum(
                F.expr(f"cast(`{c}` as bigint)"
                       f" * cast(`{c}` as bigint)")
            ).alias(f"ss{idx}")
        )
    aggs.append(F.sum(F.expr(f"({tot_expr})")).alias("st"))
    aggs.append(
        F.sum(F.expr(f"({tot_expr}) * ({tot_expr})")).alias("sst")
    )
    m = df.agg(*aggs)
    item_var = " + ".join(
        f"(cast(n as double) * cast(ss{i} as double)"
        f" - cast(s{i} as double) * cast(s{i} as double))"
        for i in range(k)
    )
    tot_var = (
        "(cast(n as double) * cast(sst as double)"
        " - cast(st as double) * cast(st as double))"
    )
    return m.select(
        "n",
        F.lit(k).alias("k"),
        F.expr(
            f"case when {tot_var} > 0 then"
            f" (cast({k} as double) / (cast({k} as double) - 1.0e0))"
            f" * (1.0e0 - ({item_var}) / {tot_var}) end"
        ).alias("alpha"),
    )


def mark_correlation(
    df: DataFrame,
    mark: str,
    id_col: str,
    x: str = "lon",
    y: str = "lat",
    bin_q: int = 1 << 10,
    n_bins: int = 8,
    coord_q: int = 1 << 10,
) -> DataFrame:
    """Mark correlation function (Stoyan 1984) — do nearby points
    carry similar MARK VALUES beyond what the point pattern itself
    explains: per distance bin, the pair count and the exact sum of
    mark PRODUCTS (the semivariogram tracks squared differences;
    this tracks products, the geostatistics-vs-point-process
    complement). kmm(r) = (pair-product mean) / (global mark mean)^2
    is the caller's one chain over the emitted exact ints plus
    :func:`stats_global`-style mark moments.

    Marks must be non-negative integers (quantize upstream).

    Scale: the semivariogram plan — ONE `_bounded_pairs` grid-bucket
    join + bin explode + ONE hash agg; brute-force oracle territory.
    """
    bq, nb = int(bin_q), int(n_bins)
    pre = df.select(
        F.col(id_col).alias("__pid"),
        F.col(x).alias("__x"),
        F.col(y).alias("__y"),
        F.col(mark).cast("long").alias("__m"),
    )
    pairs = _bounded_pairs(
        pre, "__pid", "__x", "__y", max_d_q=nb * bq,
        coord_q=coord_q, extra=["__m"],
    ).where(F.col("d2") > 0)
    binned = pairs.select(
        "d2",
        (F.col("__m_a") * F.col("__m_b")).alias("mm"),
        F.explode(F.array(*[F.lit(b) for b in range(nb)]))
        .alias("bin"),
    ).where(
        (F.col("d2") >= F.col("bin") * F.col("bin") * (bq * bq))
        & (F.col("d2") < (F.col("bin") + 1) * (F.col("bin") + 1)
           * (bq * bq))
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("mm").alias("sum_mm"),
    )


BH_Q = 1_000_000


def bh_fdr(
    df: DataFrame,
    p_q: str = "p_q",
    id_col: str = "id",
    q_pct: int = 5,
) -> DataFrame:
    """Benjamini-Hochberg FDR control (Benjamini & Hochberg 1995) —
    the multiple-testing correction every screen battery needs once
    it fires thousands of per-cell/per-keyword tests (Getis-Ord
    grids, keyword log-odds, A/B batteries): find the largest rank k
    with p_(k) <= k*q/m and reject the k smallest p-values.

    P-values arrive quantized on the BH_Q=1e6 grid (p_q = floor(p *
    1e6)); the step-up comparison is the EXACT integer cross-
    multiplication p_q * m * 100 <= rank * q_pct * BH_Q — no float
    anywhere in the decision. Ranks tie-break on the id, but the
    selected SET is tie-order-independent (equal p either all pass
    or all fail the inequality at their max rank... the step-up rule
    rejects everything up to k_max, which is determined by the
    multiset of p-values alone).

    Output: one row per input test (id, p_q, rank, reject) plus the
    threshold rank carried on every row (k_sel; 0 = nothing
    rejected).

    Scale: one global rank window over the TEST table (tests are the
    small battery output, not the raw data) + one max + one flag
    pass. Bound: p_q * m * 100 < 2^63 -> m up to ~9e10 tests.
    """
    w = Window.orderBy(F.col("__p"), F.col("__id"))
    wall = Window.partitionBy()
    r = df.select(
        F.col(id_col).alias("__id"),
        F.col(p_q).cast("long").alias("__p"),
    ).select(
        "__id", "__p",
        F.row_number().over(w).alias("rank"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    flagged = r.select(
        "__id", "__p", "rank", "m",
        # rank/m are 32-bit ints from the window functions: cast
        # BEFORE multiplying or rank * q * 1e6 overflows int32
        F.expr(
            "case when __p * cast(m as bigint) * 100"
            f" <= cast(rank as bigint) * {int(q_pct)}"
            f" * {BH_Q} then cast(rank as bigint) else 0 end"
        ).alias("__hit"),
    )
    k = flagged.select(
        F.max("__hit").over(wall).alias("k_sel"), "__id", "__p",
        "rank",
    )
    return k.select(
        F.col("__id").alias(id_col),
        F.col("__p").alias(p_q),
        F.col("rank").cast("long").alias("rank"),
        F.col("k_sel").cast("long").alias("k_sel"),
        (F.col("rank") <= F.col("k_sel")).alias("reject"),
    )


def knee_point(
    df: DataFrame,
    key: str,
    x: str,
    y: str,
) -> DataFrame:
    """Knee/elbow detection on a per-key curve (the Kneedle
    max-chord-distance form, integer-exact): the point of a
    monotone tradeoff curve farthest from the first-to-last chord —
    where to cut k in clustering, a distance threshold in dedup, a
    rank cutoff in retrieval.

    For chord (x1,y1)->(xn,yn), the UNNORMALIZED distance of point
    p is |cross| = |(y_p - y1)(xn - x1) - (x_p - x1)(yn - y1)| — an
    exact int64; the divisor |chord| is key-constant, so the ARGMAX
    is taken on |cross| directly (ties to the smaller x, then the
    pick encodes as one bounded scalar). Endpoints score 0.

    Output per key: (key, knee_x, knee_y, cross_abs, n).

    Scale: a 4-value endpoint fold (min/max by x via the scalar-
    encode convention) joined back + ONE max-pick agg. Bound:
    |cross| < 2^63 -> |x|,|y| spans under ~3e9 each.
    """
    base = df.select(
        F.col(key).alias("__k"),
        F.col(x).cast("long").alias("__x"),
        F.col(y).cast("long").alias("__y"),
    )
    # endpoints by x (ties to smaller/larger y — encode (x, y) as
    # ordered pair via min/max of struct... struct min has no DuckDB
    # twin; use two-pass: extreme x then the min-y at that x)
    ex = base.groupBy("__k").agg(
        F.min("__x").alias("x1"), F.max("__x").alias("xn"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    y1 = (
        base.join(ex.select("__k", F.col("x1").alias("__x")),
                  on=["__k", "__x"])
        .groupBy("__k").agg(F.min("__y").alias("y1"))
    )
    yn = (
        base.join(ex.select("__k", F.col("xn").alias("__x")),
                  on=["__k", "__x"])
        .groupBy("__k").agg(F.min("__y").alias("yn"))
    )
    j = base.join(ex, on="__k").join(y1, on="__k").join(yn, on="__k")
    cross = (
        "abs((__y - y1) * (xn - x1) - (__x - x1) * (yn - y1))"
    )
    # argmax on cross, tie -> smaller x then smaller y: encode as
    # cross * S^2 + (S - 1 - xr) * S + (S - 1 - yr) is overflow-
    # prone; instead carry a struct-free two-stage max: max cross,
    # then min (x, y) among rows achieving it
    mx = j.groupBy("__k").agg(
        F.max(F.expr(cross)).alias("cross_abs")
    )
    hit = (
        j.join(mx, on="__k")
        .where(F.expr(f"{cross} = cross_abs"))
        .groupBy("__k", "cross_abs")
        .agg(
            F.min("__x").alias("knee_x"),
            F.max("n").alias("n"),
        )
    )
    ky = (
        j.join(mx, on="__k")
        .where(F.expr(f"{cross} = cross_abs"))
        .join(hit.select("__k", F.col("knee_x").alias("__x")),
              on=["__k", "__x"])
        .groupBy("__k")
        .agg(F.min("__y").alias("knee_y"))
    )
    return hit.join(ky, on="__k").select(
        F.col("__k").alias(key), "knee_x", "knee_y", "cross_abs",
        "n",
    )


def anova_f(
    df: DataFrame, group: str, value: str
) -> DataFrame:
    """One-way ANOVA F statistic (Fisher) — do g group means
    differ beyond within-group noise: the many-group generalization
    of ab_test's two-sample comparison, over UNBALANCED groups
    (icc_oneway requires the balanced reliability design; this does
    not).

        SSB = sum_i n_i (m_i - m)^2,  SSW = SST - SSB
        F   = (SSB / (g - 1)) / (SSW / (N - g))

    All sufficient statistics (per-group n, sum, sum-of-squares)
    are exact int64 off ONE hash agg; the sums of squares assemble
    in double as fixed IEEE chains over them (SSB = sum s_i^2/n_i -
    st^2/N via exact ints; per-group rational quantized 2^-20 so the
    fold stays order-invariant). Degenerate cases (g < 2, N <= g,
    SSW = 0) emit NULL.

    Output: one row (g, n_total, ssb ~, ssw ~ as 2^-20-quantized
    exact ints, f_stat).
    """
    from pdal_spark import sqlgen as G

    per = df.groupBy(F.col(group).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum(F.col(value).cast("long")).alias("s_i"),
        F.sum(
            F.expr(f"cast(`{value}` as bigint)"
                   f" * cast(`{value}` as bigint)")
        ).alias("ss_i"),
    )
    qf = G.fnum(float(ENTROPY_Q))
    # per-group s_i^2 / n_i quantized 2^-20 (exact integer div)
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("g"),
        F.sum("n_i").alias("n_tot"),
        F.sum("s_i").alias("st"),
        F.sum("ss_i").alias("sst"),
        F.sum(
            F.expr(
                f"(s_i * s_i * cast({ENTROPY_Q} as bigint))"
                " div n_i"
            )
        ).alias("grp_q"),
    )
    ssb = (
        f"(cast(grp_q as double) / {qf}"
        " - cast(st as double) * cast(st as double)"
        " / cast(n_tot as double))"
    )
    ssw = (
        f"(cast(sst as double) - cast(grp_q as double) / {qf})"
    )
    return agg.select(
        "g", "n_tot", "grp_q", "st", "sst",
        F.expr(
            f"case when g >= 2 and n_tot > g and {ssw} > 0 then"
            f" ({ssb} / (cast(g as double) - 1.0e0))"
            f" / ({ssw} / (cast(n_tot as double)"
            " - cast(g as double))) end"
        ).alias("f_stat"),
    )


EB_Q = 1 << 20


def empirical_bayes_rates(
    df: DataFrame,
    key: str,
    hits: str,
    trials: str,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial) rate shrinkage — rank
    entities by their TRUE success rate when trial counts vary
    wildly (domain quality rates, host error rates, near-dup
    precision per source): a 2/2 domain must not outrank a 980/1000
    one. Method-of-moments beta prior from the observed per-key
    rates, then the posterior mean

        alpha = m (m(1-m)/v - 1),  beta = (1-m)(m(1-m)/v - 1)
        shrunk_i = (x_i + alpha) / (n_i + alpha + beta)

    Per-key raw rates quantize once to the 2^-20 grid (p_q = (x*q)
    div n — exact, engine-identical), so the prior's mean/variance
    fold over exact int64; alpha/beta and each posterior are fixed
    IEEE chains, rounded(9). Degenerate priors (v = 0 or the
    moment expression non-positive) emit the RAW rate (no prior
    information to shrink toward — documented).

    Scale: ONE hash agg per key + a 3-number broadcast fold; every
    posterior is row-local.
    """
    from pdal_spark import sqlgen as G

    q = EB_Q
    qf = G.fnum(float(q))
    per = df.groupBy(F.col(key).alias("__k")).agg(
        F.sum(F.col(hits).cast("long")).alias("x"),
        F.sum(F.col(trials).cast("long")).alias("n"),
    ).where(F.col("n") > 0).select(
        "__k", "x", "n",
        F.expr(f"(x * cast({q} as bigint)) div n").alias("p_q"),
    )
    mom = per.agg(
        F.count(F.lit(1)).cast("long").alias("g"),
        F.sum("p_q").alias("sp"),
        F.sum(F.expr("p_q * p_q")).alias("spp"),
    )
    m = f"(cast(sp as double) / cast(g as double) / {qf})"
    v = (
        "((cast(g as double) * cast(spp as double)"
        " - cast(sp as double) * cast(sp as double))"
        " / (cast(g as double) * cast(g as double))"
        f" / {qf} / {qf})"
    )
    k0 = f"({m} * (1.0e0 - {m}) / {v} - 1.0e0)"
    alpha = f"({m} * {k0})"
    beta = f"((1.0e0 - {m}) * {k0})"
    ok = f"({v} > 0.0e0 and {k0} > 0.0e0)"
    return per.crossJoin(F.broadcast(mom)).select(
        F.col("__k").alias(key), "x", "n", "p_q",
        F.expr(
            f"case when {ok} then round({alpha}, 9) end"
        ).alias("alpha"),
        F.expr(
            f"case when {ok} then round({beta}, 9) end"
        ).alias("beta"),
        F.expr(
            f"round(case when {ok} then"
            f" (cast(x as double) + {alpha})"
            f" / (cast(n as double) + {alpha} + {beta})"
            " else cast(x as double) / cast(n as double) end, 9)"
        ).alias("shrunk"),
    )


STD_Q = 1 << 30


def standardized_rate(
    df: DataFrame,
    ref: DataFrame,
    pop: str = "pop",
    stratum: str = "stratum",
    hits: str = "hits",
    exposure: str = "exposure",
    weight: str = "w",
) -> DataFrame:
    """Directly standardized rates (the epidemiology / reporting
    classic): compare populations' rates with the STRATUM MIX held
    fixed at a reference (crude error rates across crawls lie when
    their content mixes differ — Simpson's-paradox insurance for
    every "is cohort A worse" readout):

        std_rate = sum_s w_s * (hits_s / exposure_s) / sum_s w_s

    Per-(pop, stratum) rates quantize to exact int64 ((hits * q)
    div exposure); with integer reference weights the weighted fold
    is exact and order-invariant; the closing division is one IEEE
    chain. Strata MISSING in a population contribute rate 0 with
    their weight still in the denominator (the conservative
    fixed-mix convention — documented; filter the reference first
    for the drop-missing variant).

    Scale: ONE (pop, stratum) agg + a broadcast reference join +
    ONE pop fold.
    """
    q = STD_Q
    per = df.groupBy(
        F.col(pop).alias("__p"), F.col(stratum).alias("__s")
    ).agg(
        F.sum(F.col(hits).cast("long")).alias("x"),
        F.sum(F.col(exposure).cast("long")).alias("n"),
    ).where(F.col("n") > 0).select(
        "__p", "__s",
        F.expr(f"(x * cast({q} as bigint)) div n").alias("r_q"),
    )
    r = ref.select(
        F.col(stratum).alias("__s"),
        F.col(weight).cast("long").alias("__w"),
    )
    pops = per.select("__p").distinct()
    lattice = pops.crossJoin(F.broadcast(r))
    j = lattice.join(per, on=["__p", "__s"], how="left").select(
        "__p", "__w",
        F.coalesce("r_q", F.lit(0)).alias("r_q"),
    )
    agg = j.groupBy("__p").agg(
        F.sum("__w").alias("w_tot"),
        F.sum(F.expr("__w * r_q")).alias("wr_q"),
    )
    return agg.select(
        F.col("__p").alias(pop), "w_tot", "wr_q",
        F.expr(
            "cast(wr_q as double)"
            f" / (cast(w_tot as double) * cast({q} as double))"
        ).alias("std_rate"),
    )


def smr(
    df: DataFrame,
    ref_rates: DataFrame,
    pop: str = "pop",
    stratum: str = "stratum",
    hits: str = "hits",
    exposure: str = "exposure",
    rate_q: str = "rate_q",
) -> DataFrame:
    """Indirectly standardized ratio (SMR — standardized
    mortality/morbidity ratio): observed events over the events
    EXPECTED if the population experienced the reference's
    per-stratum rates — the right comparison when a population's
    strata are too thin for direct standardization:

        SMR = O / E,  E = sum_s exposure_s * ref_rate_s

    Reference rates arrive pre-quantized on the 2^-30 grid
    (``rate_q`` — e.g. (hits*q) div exposure of the pooled
    reference), so E's fold is exact int64; SMR is one IEEE
    division, NULL when E = 0. SMR > 1 = worse than reference at
    its own mix.

    Scale: ONE (pop, stratum) agg + broadcast reference join + ONE
    pop fold. Bound: exposure * rate_q < 2^63 per stratum.
    """
    per = df.groupBy(
        F.col(pop).alias("__p"), F.col(stratum).alias("__s")
    ).agg(
        F.sum(F.col(hits).cast("long")).alias("x"),
        F.sum(F.col(exposure).cast("long")).alias("n"),
    )
    r = ref_rates.select(
        F.col(stratum).alias("__s"),
        F.col(rate_q).cast("long").alias("__rq"),
    )
    agg = per.join(F.broadcast(r), on="__s").groupBy("__p").agg(
        F.sum("x").alias("observed"),
        F.sum(F.expr("n * __rq")).alias("e_q"),
    )
    return agg.select(
        F.col("__p").alias(pop), "observed", "e_q",
        F.expr(
            "case when e_q > 0 then"
            f" cast(observed as double) * cast({STD_Q} as double)"
            " / cast(e_q as double) end"
        ).alias("smr"),
    )


MH_Q = 1 << 30


def mantel_haenszel(
    df: DataFrame,
    stratum: str = "stratum",
    exposed: str = "exposed",
    case: str = "is_case",
) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio across strata (Mantel &
    Haenszel 1959) — the confounding-adjusted effect size: pool the
    2x2 association WITHIN each stratum so a mix difference can't
    manufacture it (odds_ratio's stratified big sibling; the OR
    analog of standardized_rate's fixed-mix rates):

        OR_MH = sum_s (a_s d_s / n_s) / sum_s (b_s c_s / n_s)

    Each stratum's rational quantizes to (a*d*q) div n — exact
    int64, order-invariant folds; OR_MH is one IEEE division (NULL
    when the denominator sum is 0). Bound: a*d*q < 2^63 — strata up
    to ~2e3 x 2e3 cells at q = 2^30.

    Scale: ONE (stratum) hash agg + ONE fold.
    """
    q = MH_Q
    per = df.groupBy(F.col(stratum).alias("__s")).agg(
        F.sum(
            F.expr(
                f"cast(`{exposed}` as int) * cast(`{case}` as int)"
            ).cast("long")
        ).alias("a"),
        F.sum(
            F.expr(
                f"cast(`{exposed}` as int)"
                f" * (1 - cast(`{case}` as int))"
            ).cast("long")
        ).alias("b"),
        F.sum(
            F.expr(
                f"(1 - cast(`{exposed}` as int))"
                f" * cast(`{case}` as int)"
            ).cast("long")
        ).alias("c"),
        F.sum(
            F.expr(
                f"(1 - cast(`{exposed}` as int))"
                f" * (1 - cast(`{case}` as int))"
            ).cast("long")
        ).alias("d"),
    ).withColumn("n", F.expr("a + b + c + d"))
    agg = per.where(F.col("n") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum(
            F.expr(f"(a * d * cast({q} as bigint)) div n")
        ).alias("num_q"),
        F.sum(
            F.expr(f"(b * c * cast({q} as bigint)) div n")
        ).alias("den_q"),
    )
    return agg.select(
        "n_strata", "num_q", "den_q",
        F.expr(
            "case when den_q > 0 then"
            " cast(num_q as double) / cast(den_q as double) end"
        ).alias("or_mh"),
    )


def cohens_d(
    df: DataFrame, group: str = "grp", value: str = "y"
) -> DataFrame:
    """Cohen's d standardized mean difference (pooled-SD form) —
    the EFFECT SIZE companion of ab_test/anova's significance (a
    p-value says "real", d says "how big": 0.2 small / 0.5 medium /
    0.8 large). Exactly two groups (enforced via NULL when not).

        d = (m1 - m0) / s_p,
        s_p^2 = ((n0-1)s0^2 + (n1-1)s1^2) / (n0 + n1 - 2)

    All moments exact int64 off ONE hash agg (group flag must be
    0/1 integer, values integer); d is one IEEE chain, NULL for
    degenerate inputs (a missing group, n <= 2, zero pooled
    variance).
    """
    per = df.groupBy(
        F.col(group).cast("int").alias("__g")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value).cast("long")).alias("s"),
        F.sum(
            F.expr(f"cast(`{value}` as bigint)"
                   f" * cast(`{value}` as bigint)")
        ).alias("ss"),
    )
    piv = per.groupBy().agg(
        F.max(F.when(F.col("__g") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("__g") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("__g") == 0, F.col("ss"))).alias("ss0"),
        F.max(F.when(F.col("__g") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("__g") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("__g") == 1, F.col("ss"))).alias("ss1"),
    )
    # (n-1) s^2 = ss - s^2/n, carried n-scaled: n*ss - s*s over n
    sp2 = (
        "(((cast(n0 as double) * cast(ss0 as double)"
        " - cast(s0 as double) * cast(s0 as double))"
        " / cast(n0 as double)"
        " + (cast(n1 as double) * cast(ss1 as double)"
        " - cast(s1 as double) * cast(s1 as double))"
        " / cast(n1 as double))"
        " / (cast(n0 as double) + cast(n1 as double) - 2.0e0))"
    )
    return piv.select(
        "n0", "n1",
        F.expr(
            "case when n0 is not null and n1 is not null"
            f" and n0 + n1 > 2 and {sp2} > 0 then"
            " (cast(s1 as double) / cast(n1 as double)"
            " - cast(s0 as double) / cast(n0 as double))"
            f" / sqrt({sp2}) end"
        ).alias("d"),
    )


def kendall_tau(
    df: DataFrame,
    x: str,
    y: str,
    id_col: str,
) -> DataFrame:
    """Kendall tau-b rank correlation, EXACT with ties — the
    concordance complement of spearman_corr (tau weights every pair
    equally; Spearman squares rank gaps). Pairs (i < j by id) are
    classified by the sign product of (x_i-x_j, y_i-y_j):

        tau_b = (nc - nd) / sqrt((nc + nd + ty) * (nc + nd + tx))

    where tx = pairs tied in x ONLY, ty = tied in y ONLY (the
    standard (n0-n1)(n0-n2) denominator re-expressed in pair
    classes). All five pair counts are exact int64; tau_b is one
    IEEE sqrt + division. NULL when either x or y is constant.

    O(n^2) pairwise — the ORACLE-EXACT small-n path (filter first,
    like :func:`convex_hull_exact` / theil_sen): n = 10^4 is 5e7
    pairs. At corpus scale compute per-cell/group taus on bounded
    groups, or sample.
    """
    a = df.select(
        F.col(id_col).alias("__i"),
        F.col(x).alias("xi"), F.col(y).alias("yi"),
    )
    b = df.select(
        F.col(id_col).alias("__j"),
        F.col(x).alias("xj"), F.col(y).alias("yj"),
    )
    pairs = a.join(b, F.col("__i") < F.col("__j"))
    cls = pairs.select(
        F.expr(
            "case when (xi < xj and yi < yj)"
            " or (xi > xj and yi > yj) then 0"
            " when (xi < xj and yi > yj)"
            " or (xi > xj and yi < yj) then 1"
            " when xi = xj and yi = yj then 4"
            " when xi = xj then 2 else 3 end"
        ).alias("k")
    )
    agg = cls.agg(
        F.sum(F.expr("case when k = 0 then 1 else 0 end"))
        .cast("long").alias("nc"),
        F.sum(F.expr("case when k = 1 then 1 else 0 end"))
        .cast("long").alias("nd"),
        F.sum(F.expr("case when k = 2 then 1 else 0 end"))
        .cast("long").alias("tx"),
        F.sum(F.expr("case when k = 3 then 1 else 0 end"))
        .cast("long").alias("ty"),
        F.sum(F.expr("case when k = 4 then 1 else 0 end"))
        .cast("long").alias("txy"),
    )
    return agg.select(
        "nc", "nd", "tx", "ty", "txy",
        F.expr(
            "case when nc + nd + ty > 0 and nc + nd + tx > 0 then"
            " cast(nc - nd as double)"
            " / sqrt(cast(nc + nd + ty as double)"
            " * cast(nc + nd + tx as double)) end"
        ).alias("tau_b"),
    )


KW_Q = 1 << 16


def kruskal_wallis(
    df: DataFrame,
    group: str,
    value: str,
) -> DataFrame:
    """Kruskal-Wallis H (k-group rank ANOVA), EXACT with ties — the
    k-sample generalization of mann_whitney_u, sharing its doubled
    mid-rank algebra: a value block spanning ranks [c+1, c+t]
    contributes c_gv * (2c + t + 1) to 2*R_g.

        H = 3 * sum_g (2R_g)^2 / n_g / (N (N+1)) - 3 (N+1)
        H_c = H / (1 - sum_t (t^3 - t) / (N^3 - N))

    sum_g (2R_g)^2 / n_g quantizes per group to
    (d div n)*Q + ((d mod n)*Q) div n with Q = 2^16 — exact int64,
    order-invariant fold (bound: (2R_g)^2 < 2^63 needs N <= ~5e4).
    Output one row: n, k, tie3 = sum(t^3 - t), s_q, and the two IEEE
    doubles h / h_c (h_c NULL when every value ties, i.e. the
    correction hits 0).

    Scale: ONE distinct-value hash agg + ONE ordered prefix window
    over DISTINCT values (same plan family as ks_test) + ONE
    (group) agg — never touches row pairs.
    """
    q = KW_Q
    per = (
        df.select(
            F.col(group).alias("g"), F.col(value).alias("v")
        )
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = per.groupBy("v").agg(F.sum("c").alias("t"))
    w_run = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = tot.withColumn(
        "cprev", F.sum("t").over(w_run) - F.col("t")
    )
    contrib = per.join(ranked, on="v")
    grp = contrib.groupBy("g").agg(
        F.sum("c").alias("n_g"),
        F.sum(
            F.col("c") * (2 * F.col("cprev") + F.col("t") + 1)
        ).alias("two_r_g"),
    )
    sq = (
        "(two_r_g * two_r_g div n_g) * cast({q} as bigint)"
        " + ((two_r_g * two_r_g % n_g) * cast({q} as bigint))"
        " div n_g"
    ).format(q=q)
    ties = tot.agg(
        F.sum(F.expr("t * t * t - t")).alias("tie3"),
        F.sum("t").alias("n"),
    )
    agg = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.expr(sq)).alias("s_q"),
    )
    out = agg.crossJoin(F.broadcast(ties))
    nf = "cast(n as double)"
    h = (
        f"(3.0e0 * (cast(s_q as double) / {float(q)!r}e0)"
        f" / ({nf} * ({nf} + 1.0e0)) - 3.0e0 * ({nf} + 1.0e0))"
    ).replace("'", "")
    corr = (
        f"(1.0e0 - cast(tie3 as double)"
        f" / ({nf} * {nf} * {nf} - {nf}))"
    )
    return out.select(
        "n", "k", "tie3", "s_q",
        F.expr(f"case when n > 1 then {h} end").alias("h"),
        F.expr(
            f"case when n > 1 and {corr} > 0"
            f" then {h} / {corr} end"
        ).alias("h_c"),
    )


BF_Q = 1 << 16


def brown_forsythe(
    df: DataFrame,
    group: str,
    value: str,
) -> DataFrame:
    """Brown-Forsythe test of equal variances (Levene's W with the
    MEDIAN center — the robust default): z_ij = |x_ij - med_j|, then
    one-way ANOVA on z. The variance-homogeneity gate in front of
    anova_f / cohens_d.

        W = (N - k)/(k - 1) * sum_j n_j (zbar_j - zbar)^2
                            / sum_ij (z_ij - zbar_j)^2

    Exactness: per-group 2*med_j = x(floor((n+1)/2)) + x(ceil((n+1)/2))
    from order statistics, so 2z = |2x - 2med_j| is exact int64 when
    x is integral. With S_j = sum 2z, SS_j = sum (2z)^2, T = sum S_j:

        num = sum_j (N S_j - n_j T)^2 / n_j / (4 N^2)   [quantized]
        den = sum_j (n_j SS_j - S_j^2) / n_j / 4        [quantized]

    both per-group rationals quantize via the same split-division
    trick as kruskal_wallis (Q = 2^16, order-invariant int64 folds);
    W is one IEEE chain. Bound: |N S_j - n_j T| < ~3e9 — keep
    N * max|2z| under that (pre-quantize x coarsely on big inputs).

    Scale: one per-group sort-window for the median (same shape as
    weighted_median), then TWO hash aggs. Never row pairs.
    """
    q = BF_Q
    base = df.select(
        F.col(group).alias("g"),
        F.col(value).cast("long").alias("xv"),
    )
    w_rn = Window.partitionBy("g").orderBy(F.col("xv").asc())
    cnt = Window.partitionBy("g")
    med = (
        base.withColumn("rn", F.row_number().over(w_rn))
        .withColumn("nn", F.count(F.lit(1)).over(cnt))
        .where(
            (F.col("rn") == F.expr("(nn + 1) div 2"))
            | (F.col("rn") == F.expr("(nn + 2) div 2"))
        )
        .groupBy("g")
        .agg(F.sum("xv").alias("med2_raw"),
             F.count(F.lit(1)).alias("m_cnt"))
        # odd n keeps a single middle row ((n+1)/2 == (n+2)/2):
        # double it so med2 is always 2*median
        .select(
            "g",
            F.expr(
                "case when m_cnt = 1 then 2 * med2_raw"
                " else med2_raw end"
            ).alias("med2"),
        )
    )
    z = base.join(med, on="g").select(
        "g", F.expr("abs(2 * xv - med2)").alias("z2")
    )
    grp = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("z2").alias("s_g"),
        F.sum(F.expr("z2 * z2")).alias("ss_g"),
    )
    tot = grp.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("s_g").alias("t_all"),
    )
    jj = grp.crossJoin(F.broadcast(tot))
    def _qdiv(d: str, n: str) -> str:
        return (
            f"(({d}) div ({n})) * cast({q} as bigint)"
            f" + ((({d}) % ({n})) * cast({q} as bigint)) div ({n})"
        )
    numd = "(n * s_g - n_g * t_all) * (n * s_g - n_g * t_all)"
    dend = "(n_g * ss_g - s_g * s_g)"
    agg = jj.groupBy("n", "k").agg(
        F.sum(F.expr(_qdiv(numd, "n_g"))).alias("num_q"),
        F.sum(F.expr(_qdiv(dend, "n_g"))).alias("den_q"),
    )
    nf = "cast(n as double)"
    kf = "cast(k as double)"
    w = (
        f"(({nf} - {kf}) / ({kf} - 1.0e0))"
        f" * (cast(num_q as double) / ({nf} * {nf}))"
        " / cast(den_q as double)"
    )
    return agg.select(
        "n", "k", "num_q", "den_q",
        F.expr(
            f"case when k > 1 and den_q > 0 then {w} end"
        ).alias("w"),
    )


def cochran_q(
    df: DataFrame,
    subject: str,
    treatment: str,
    success: str,
) -> DataFrame:
    """Cochran's Q test for k related binary treatments (Cochran
    1950) — mcnemar's k-sample generalization (and the binary twin
    of a Friedman test): do the k treatments have equal success
    rates across subjects?

        Q = (k-1) * (k * sum_j G_j^2 - T^2) / (k * T - sum_i L_i^2)

    with G_j = treatment column sums, L_i = subject row sums,
    T = grand total. Input is LONG format (subject, treatment,
    0/1 success); an absent (i, j) cell counts 0 — callers wanting
    the classical complete-block design densify first. All moments
    are exact int64; Q is one IEEE chain (NULL when the denominator
    is 0, i.e. every subject all-0 or all-1).

    Scale: TWO hash aggs (per-treatment, per-subject) + one fold —
    never a pivot wider than k.
    """
    base = df.select(
        F.col(subject).alias("i"), F.col(treatment).alias("j"),
        F.col(success).cast("long").alias("x"),
    )
    k_df = base.agg(
        F.countDistinct("j").cast("long").alias("k")
    )
    gj = base.groupBy("j").agg(F.sum("x").alias("g"))
    li = base.groupBy("i").agg(F.sum("x").alias("l"))
    g_mom = gj.agg(
        F.sum("g").alias("t"),
        F.sum(F.expr("g * g")).alias("sg2"),
    )
    l_mom = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum(F.expr("l * l")).alias("sl2"),
    )
    out = (
        k_df.crossJoin(F.broadcast(g_mom))
        .crossJoin(F.broadcast(l_mom))
    )
    return out.select(
        "k", "n_subjects", "t", "sg2", "sl2",
        F.expr(
            "case when k * t - sl2 > 0 then"
            " (cast(k as double) - 1.0e0)"
            " * (cast(k as double) * cast(sg2 as double)"
            " - cast(t as double) * cast(t as double))"
            " / (cast(k as double) * cast(t as double)"
            " - cast(sl2 as double)) end"
        ).alias("q"),
    )


def iv_wald(
    df: DataFrame,
    z: str,
    x: str,
    y: str,
) -> DataFrame:
    """Instrumental-variable (Wald / just-identified 2SLS) estimator
    with a single instrument — the causal-inference sibling of
    diff_in_diff / cuped_adjust for when treatment x is endogenous
    but an instrument z shifts it exogenously:

        beta_iv = cov(z, y) / cov(z, x)
        pi      = cov(z, x) / var(z)     (first-stage strength)

    carried on n-scaled integer cross-moments (n*sum(zy) -
    sum(z)*sum(y) etc.) — exact int64 folds, two IEEE divisions.
    beta_iv NULL when cov(z, x) = 0 (irrelevant instrument); pi
    NULL when z is constant. Bound: n * sum|zy| < 2^63 — quantize
    inputs so n * max|z| * max|y| stays under ~1e14.

    Scale: ONE map-side-combined aggregation pass — the
    grouped_ols moment discipline.
    """
    base = df.select(
        F.col(z).cast("long").alias("zv"),
        F.col(x).cast("long").alias("xv"),
        F.col(y).cast("long").alias("yv"),
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("zv").alias("sz"),
        F.sum("xv").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.expr("zv * yv")).alias("szy"),
        F.sum(F.expr("zv * xv")).alias("szx"),
        F.sum(F.expr("zv * zv")).alias("szz"),
    )
    scaled = mom.select(
        "n",
        F.expr("n * szy - sz * sy").alias("czy_n"),
        F.expr("n * szx - sz * sx").alias("czx_n"),
        F.expr("n * szz - sz * sz").alias("czz_n"),
    )
    return scaled.select(
        "n", "czy_n", "czx_n", "czz_n",
        F.expr(
            "case when czx_n <> 0 then"
            " cast(czy_n as double) / cast(czx_n as double) end"
        ).alias("beta_iv"),
        F.expr(
            "case when czz_n > 0 then"
            " cast(czx_n as double) / cast(czz_n as double) end"
        ).alias("pi"),
    )


def _block_doubled_ranks(
    df: DataFrame, block: str, treatment: str, value: str
) -> DataFrame:
    """Doubled mid-ranks of `value` WITHIN each block — the shared
    kernel of friedman_test / page_trend (same tie algebra as
    kruskal_wallis, partitioned per block): returns
    (i, j, two_r) with two_r = 2*cprev + t + 1 for the row's
    within-block tie group."""
    base = df.select(
        F.col(block).alias("i"), F.col(treatment).alias("j"),
        F.col(value).alias("v"),
    )
    per = base.groupBy("i", "v").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    w_run = Window.partitionBy("i").orderBy(F.col("v").asc())
    ranked = per.withColumn(
        "cprev",
        F.sum("t").over(
            w_run.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)
        ) - F.col("t"),
    )
    return base.join(ranked, on=["i", "v"]).select(
        "i", "j",
        (2 * F.col("cprev") + F.col("t") + 1).alias("two_r"),
    )


def friedman_test(
    df: DataFrame,
    block: str,
    treatment: str,
    value: str,
) -> DataFrame:
    """Friedman rank test for k related samples (Friedman 1937),
    tie-corrected — kruskal_wallis's repeated-measures sibling and
    cochran_q's ordinal big brother. Values rank WITHIN each block
    (doubled mid-ranks); with 2R_j = sum_i 2r_ij:

        chi2 = (k-1) * sum_j (2R_j - n(k+1))^2
                     / (sum_ij (2r_ij)^2 - n k (k+1)^2)

    (the textbook A - C denominator with every term doubled-squared
    — exact int64 throughout; one IEEE division). Input must be a
    COMPLETE block design (each block all k treatments; filter
    first — the gate does). NULL when every block is internally
    tied (denominator 0). Bound: (2R_j)^2 < 2^63 needs n*k under
    ~1.5e9.

    Scale: one per-block tie agg + per-block prefix window (block-
    partitioned — parallel, unlike kruskal's global window) + TWO
    hash aggs.
    """
    tr = _block_doubled_ranks(df, block, treatment, value)
    nb = tr.select("i").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    kk = tr.select("j").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    rj = tr.groupBy("j").agg(F.sum("two_r").alias("two_rj"))
    a4 = tr.agg(
        F.sum(F.expr("two_r * two_r")).alias("a4")
    )
    num = (
        rj.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(kk))
        .select(
            F.expr(
                "(two_rj - n * (k + 1)) * (two_rj - n * (k + 1))"
            ).alias("sq"),
        )
        .agg(F.sum("sq").alias("snum"))
    )
    out = (
        num.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(kk))
        .crossJoin(F.broadcast(a4))
    )
    return out.select(
        "n", "k", "snum", "a4",
        F.expr(
            "case when a4 - n * k * (k + 1) * (k + 1) > 0 then"
            " (cast(k as double) - 1.0e0) * cast(snum as double)"
            " / (cast(a4 as double)"
            " - cast(n as double) * cast(k as double)"
            " * (cast(k as double) + 1.0e0)"
            " * (cast(k as double) + 1.0e0)) end"
        ).alias("chi2"),
    )


def page_trend(
    df: DataFrame,
    block: str,
    treatment: str,
    value: str,
) -> DataFrame:
    """Page's L trend test (Page 1963) — friedman_test's ORDERED
    alternative: treatments are ordinal (dose levels, time points)
    and the question is a monotone trend, not any difference.
    Treatment labels must be integers 1..k (or any integers — they
    enter as weights):

        2L = sum_j j * 2R_j

    on the same doubled within-block mid-ranks. Output n, k, two_l
    (exact int64) and l = 2L / 2 as the one IEEE division.

    Scale: identical plan to friedman_test.
    """
    tr = _block_doubled_ranks(df, block, treatment, value)
    nb = tr.select("i").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    kk = tr.select("j").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    two_l = tr.agg(
        F.sum(F.expr("j * two_r")).alias("two_l")
    )
    return (
        two_l.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(kk))
        .select(
            "n", "k", "two_l",
            F.expr("cast(two_l as double) / 2.0e0").alias("l"),
        )
    )


ISO_Q = 1 << 20


def isotonic_fit(
    df: DataFrame,
    order: str,
    value: str,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression via the minimax
    closed form (Robertson-Wright-Dykstra):

        fit_i = max_{j<=i} min_{k>=i} mean(y_j..y_k)

    — identical to the PAVA solution, point for point, with no
    sequential pooling loop: every block mean is the rational
    (P_k - P_{j-1}) / (k - j + 1), quantized to the 2^-20 grid
    ((num * Q) div den, exact int64), so the nested min/max is a
    plain grouped aggregation. Output: (i, y, fit_q) with fit_q
    monotone in i. The monotone-calibration primitive
    (calibration_bins' shape-constrained sibling).

    O(n^3) block-membership fan-out — the ORACLE-EXACT small-n path
    (filter first, like :func:`kendall_tau`): n = 500 is ~2e7 rows.
    At scale run per-key on bounded groups, or bin first
    (equi_depth_bins -> isotonic on the bin means).
    """
    w = Window.orderBy(F.col("o").asc())
    idx = (
        df.select(
            F.col(order).alias("o"),
            F.col(value).cast("long").alias("y"),
        )
        .withColumn("i", F.row_number().over(w).cast("long"))
        .withColumn("p", F.sum("y").over(
            w.rowsBetween(Window.unboundedPreceding,
                          Window.currentRow)))
        .select("i", "y", "p",
                (F.col("p") - F.col("y")).alias("p_prev"))
    )
    a = idx.select(F.col("i").alias("j"),
                   F.col("p_prev").alias("pj"))
    b = idx.select(F.col("i").alias("kk"), F.col("p").alias("pk"))
    pairs = a.join(b, F.col("j") <= F.col("kk")).select(
        "j", "kk",
        F.expr(
            f"((pk - pj) * cast({ISO_Q} as bigint))"
            " div (kk - j + 1)"
        ).alias("avg_q"),
    )
    mids = pairs.join(
        idx.select("i"),
        (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("kk")),
    )
    inner = mids.groupBy("i", "j").agg(
        F.min("avg_q").alias("mn")
    )
    fit = inner.groupBy("i").agg(F.max("mn").alias("fit_q"))
    return idx.select("i", "y").join(fit, on="i")


WEIB_Q = 1 << 10


def weibull_fit(
    df: DataFrame,
    value: str,
) -> DataFrame:
    """Weibull shape/scale fit by median-rank regression (the
    classical probability-plot method): sort v ascending, Bernard
    plotting position F_i = (i - 0.3)/(n + 0.4), then OLS of
    y = ln(-ln(1 - F_i)) on x = ln(v) — slope is the shape k_hat,
    exp(xbar - ybar/k) the scale. The reliability/survival-analysis
    companion of kaplan_meier (parametric instead of product-limit).

    Both ln terms quantize to the 2^-10 grid (the zipf_fit
    convention), so the OLS moments are exact int64 and shape is one
    IEEE division; scale_r passes through exp() and is ROUNDED to
    6dp on both sides (libm-vs-JVM ulps). Requires v >= 1 (shift
    first). NULL shape when x is constant.

    Scale: one sort-window for ranks + ONE moment agg.
    """
    w = Window.orderBy(F.col("v").asc(), F.col("__tb").asc())
    base = (
        df.select(
            F.col(value).cast("long").alias("v"),
            F.monotonically_increasing_id().alias("__tb"),
        )
        .withColumn("i", F.row_number().over(w).cast("long"))
        .drop("__tb")
    )
    n_df = base.agg(F.max("i").alias("n"))
    q = float(WEIB_Q)
    ranked = base.crossJoin(F.broadcast(n_df)).select(
        F.expr(
            "cast(floor(ln(cast(v as double))"
            f" * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("x_q"),
        F.expr(
            "cast(floor(ln(-ln(1.0e0"
            " - (cast(i as double) - 0.3e0)"
            " / (cast(n as double) + 0.4e0)))"
            f" * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("y_q"),
    )
    mom = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x_q").alias("sx"),
        F.sum("y_q").alias("sy"),
        F.sum(F.expr("x_q * y_q")).alias("sxy"),
        F.sum(F.expr("x_q * x_q")).alias("sxx"),
    )
    num = "cast(n * sxy - sx * sy as double)"
    den = "cast(n * sxx - sx * sx as double)"
    shape = f"({num} / {den})"
    # xbar - ybar/k on the SAME quantized grid (the Q cancels in
    # ybar/k; xbar carries 1/Q)
    scale = (
        "exp((cast(sx as double) / cast(n as double)"
        f" - (cast(sy as double) / cast(n as double)) / {shape})"
        f" / {q!r}e0)"
    )
    return mom.select(
        "n",
        F.expr("n * sxy - sx * sy").alias("num"),
        F.expr("n * sxx - sx * sx").alias("den"),
        F.expr(
            f"case when n * sxx - sx * sx <> 0 then {shape} end"
        ).alias("shape"),
        F.expr(
            f"case when n * sxx - sx * sx <> 0 and {num} <> 0.0e0"
            f" then round({scale}, 6) + 0.0e0 end"
        ).alias("scale_r"),
    )


def grubbs_stat(
    df: DataFrame,
    value: str,
) -> DataFrame:
    """Grubbs' maximum-studentized-deviate statistic (Grubbs 1950)
    — the single-outlier test behind outlier_statistical's z-score
    screen: G = max|x - xbar| / s with the sample s. On the
    n-scaled integer grid d = n*x - S:

        G = (max|d| / n) / sqrt((n*SS - S^2) / (n (n-1)))

    All moments exact int64; G one IEEE chain (NULL when s = 0).
    Bound: n * SS < 2^63.

    Scale: ONE aggregation pass (the iv_wald moment discipline) —
    max|d| folds alongside the sums.
    """
    base = df.select(F.col(value).cast("long").alias("x"))
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.expr("x * x")).alias("ss"),
    )
    d = base.crossJoin(F.broadcast(mom)).agg(
        F.max(F.expr("abs(n * x - s)")).alias("maxd"),
        F.max("n").alias("n"),
        F.max(F.expr("n * ss - s * s")).alias("nss_s2"),
    )
    return d.select(
        "n", "maxd", "nss_s2",
        F.expr(
            "case when nss_s2 > 0 and n > 1 then"
            " (cast(maxd as double) / cast(n as double))"
            " / sqrt(cast(nss_s2 as double)"
            " / (cast(n as double) * (cast(n as double) - 1.0e0)))"
            " end"
        ).alias("g"),
    )


def _bounded_cross_pairs(
    left: DataFrame,
    right: DataFrame,
    id_left: str,
    id_right: str,
    x: str,
    y: str,
    max_d_q: int,
    coord_q: int,
) -> DataFrame:
    """ORDERED cross pairs (a in left, b in right) with quantized
    planar d2 <= max_d_q^2 — the two-table sibling of
    :func:`_bounded_pairs` (same shifted grid, same 3x3 bucket
    join; no a<b dedup since the sets are distinct)."""
    m = int(max_d_q)

    def _pts(df, idc, suffix):
        return df.select(
            F.col(idc).alias(f"id_{suffix}"),
            (F.floor(F.col(x) * float(coord_q)).cast("long")
             + PAIR_SHIFT).alias(f"x{suffix}"),
            (F.floor(F.col(y) * float(coord_q)).cast("long")
             + PAIR_SHIFT).alias(f"y{suffix}"),
        )

    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    la = _pts(left, id_left, "a").select(
        "id_a", "xa", "ya", F.explode(offs).alias("o")
    ).select(
        "id_a", "xa", "ya",
        (F.expr(f"xa div {m}") + F.col("o.dx")).alias("jx"),
        (F.expr(f"ya div {m}") + F.col("o.dy")).alias("jy"),
    )
    rb = _pts(right, id_right, "b").select(
        "id_b", "xb", "yb",
        F.expr(f"xb div {m}").alias("jx"),
        F.expr(f"yb div {m}").alias("jy"),
    )
    j = la.join(rb, on=["jx", "jy"])
    d2 = (
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    )
    return j.select("id_a", "id_b", d2.alias("d2")).where(
        F.col("d2") <= m * m
    )


def g_function(
    df: DataFrame,
    radii_q: list[int],
    id_col: str,
    x: str = "lon",
    y: str = "lat",
    coord_q: int = 1 << 10,
) -> DataFrame:
    """Nearest-neighbour distance CDF G(r) (the spatstat G / Diggle
    1983) — ripleys_k's first-neighbour marginal and clark_evans'
    full-distribution refinement: per radius r in the ladder, how
    many points have their NEAREST neighbour within r.

        g_hat(r) = #{i : nnd_i <= r} / n

    Counts compare on exact integer d2 <= r^2 (no sqrt anywhere);
    points whose NN lies beyond max(radii) simply never enter the
    counts — G is right-censored at the ladder top by definition.
    Output per r: (r_q, n, n_le, g_hat).

    Scale: ONE bounded-pair generation at max(radii) (3x3 grid
    buckets, O(points x local density)), a per-point min, and one
    ladder aggregate — never O(n^2).
    """
    rq = sorted(int(r) for r in radii_q)
    pairs = _bounded_pairs(df, id_col, x, y, max_d_q=rq[-1],
                           coord_q=coord_q)
    both = pairs.select(F.col("id_a").alias("pid"), "d2").unionByName(
        pairs.select(F.col("id_b").alias("pid"), "d2")
    )
    nnd = both.groupBy("pid").agg(F.min("d2").alias("nnd2"))
    n_df = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ladder = nnd.select(
        "nnd2",
        F.explode(F.array(*[F.lit(r) for r in rq])).alias("r_q"),
    ).where(F.col("nnd2") <= F.col("r_q") * F.col("r_q"))
    counts = ladder.groupBy("r_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_le")
    )
    return counts.crossJoin(F.broadcast(n_df)).select(
        F.col("r_q").cast("long").alias("r_q"), "n", "n_le",
        F.expr(
            "cast(n_le as double) / cast(n as double)"
        ).alias("g_hat"),
    )


def cross_g(
    left: DataFrame,
    right: DataFrame,
    radii_q: list[int],
    id_left: str,
    id_right: str,
    x: str = "lon",
    y: str = "lat",
    coord_q: int = 1 << 10,
) -> DataFrame:
    """Bivariate nearest-neighbour CDF G12(r) (spatstat Gcross):
    per radius r, how many TYPE-1 points have their nearest TYPE-2
    point within r — the attraction/repulsion diagnostic between
    two marked point sets (stores vs depots, cases vs sources).
    Output per r: (r_q, n1, n_le, g12_hat). Same exact-integer-d2
    ladder semantics as :func:`g_function`.

    Scale: one bounded CROSS-pair generation + per-left-point min
    + ladder aggregate.
    """
    rq = sorted(int(r) for r in radii_q)
    pairs = _bounded_cross_pairs(
        left, right, id_left, id_right, x, y,
        max_d_q=rq[-1], coord_q=coord_q,
    )
    nnd = pairs.groupBy("id_a").agg(F.min("d2").alias("nnd2"))
    n_df = left.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    ladder = nnd.select(
        "nnd2",
        F.explode(F.array(*[F.lit(r) for r in rq])).alias("r_q"),
    ).where(F.col("nnd2") <= F.col("r_q") * F.col("r_q"))
    counts = ladder.groupBy("r_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_le")
    )
    return counts.crossJoin(F.broadcast(n_df)).select(
        F.col("r_q").cast("long").alias("r_q"), "n1", "n_le",
        F.expr(
            "cast(n_le as double) / cast(n1 as double)"
        ).alias("g12_hat"),
    )


def cross_k(
    left: DataFrame,
    right: DataFrame,
    radii_q: list[int],
    id_left: str,
    id_right: str,
    x: str = "lon",
    y: str = "lat",
    coord_q: int = 1 << 10,
) -> DataFrame:
    """Bivariate Ripley's K pair counts (spatstat Kcross): per
    radius r, the number of ORDERED (type-1, type-2) pairs within r
    — the multi-scale companion of :func:`cross_g` (K sees ALL
    neighbours, G only the first). The caller normalizes
    (K12(r) = area * n_pairs / (n1 * n2)); the counts are the
    hash-comparable essence. Output per r: (r_q, n_pairs).

    Scale: identical plan to ripleys_k with the cross-pair
    generator.
    """
    rq = sorted(int(r) for r in radii_q)
    pairs = _bounded_cross_pairs(
        left, right, id_left, id_right, x, y,
        max_d_q=rq[-1], coord_q=coord_q,
    )
    ladder = pairs.select(
        "d2",
        F.explode(F.array(*[F.lit(r) for r in rq])).alias("r_q"),
    ).where(F.col("d2") <= F.col("r_q") * F.col("r_q"))
    return (
        ladder.groupBy("r_q")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select(F.col("r_q").cast("long").alias("r_q"), "n_pairs")
    )


def auc_exact(
    df: DataFrame,
    score: str,
    label: str,
) -> DataFrame:
    """Exact ROC AUC with ties (the rank / Mann-Whitney identity:
    AUC = P(score_pos > score_neg) + 0.5 * P(=)) — the threshold-
    free discrimination metric missing from the thresholded
    eval_classification family:

        AUC = (2R_pos - n_pos (n_pos + 1)) / (2 n_pos n_neg)

    with 2R_pos the DOUBLED mid-rank sum of positives (the
    mann_whitney_u tie algebra verbatim — AUC IS U/n1n0). Integer
    moments exact; one IEEE division. NULL when a class is empty.
    Output: (n_pos, n_neg, two_r_pos, auc).

    Scale: one distinct-score agg + one ordered prefix window over
    DISTINCT scores + one fold — never row pairs.
    """
    per = (
        df.select(
            F.col(score).alias("v"),
            F.col(label).cast("long").alias("y"),
        )
        .groupBy("v")
        .agg(
            F.sum("y").alias("cp"),
            F.sum(F.expr("1 - y")).alias("cn"),
        )
        .withColumn("t", F.col("cp") + F.col("cn"))
    )
    w_run = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = per.withColumn(
        "cprev", F.sum("t").over(w_run) - F.col("t")
    )
    agg = c.agg(
        F.sum("cp").alias("n_pos"),
        F.sum("cn").alias("n_neg"),
        F.sum(
            F.expr("cp * (2 * cprev + t + 1)")
        ).alias("two_r_pos"),
    )
    return agg.select(
        "n_pos", "n_neg", "two_r_pos",
        F.expr(
            "case when n_pos > 0 and n_neg > 0 then"
            " cast(two_r_pos - n_pos * (n_pos + 1) as double)"
            " / (2.0e0 * cast(n_pos as double)"
            " * cast(n_neg as double)) end"
        ).alias("auc"),
    )


LL_Q = 1 << 10


def log_loss(
    df: DataFrame,
    label: str,
    p_num: str,
    p_den: str,
) -> DataFrame:
    """Exact-moment binary log loss (cross-entropy) for RATIONAL
    predicted probabilities p = p_num / p_den (the natural form when
    predictions come from empirical bucket rates — nb_classifier /
    calibration_bins outputs):

        LL = (1/N) sum_i [ y ln(den/num) + (1-y) ln(den/(den-num)) ]

    Each row's ln term quantizes to the 2^-10 grid (zipf_fit
    convention — ln of an IEEE-exact ratio of int64 counts), the
    accumulation is an exact int64 sum, LL is one division by N*Q.
    Rows with num = 0 or num = den get the infinite-surprise term
    CLIPPED at ln(den) (the +1-smoothing convention; documented,
    deterministic). Output: (n, ll_q_sum, ll).

    Scale: ONE aggregation pass, no per-class pivot.
    """
    q = float(LL_Q)
    base = df.select(
        F.col(label).cast("long").alias("y"),
        F.col(p_num).cast("long").alias("num"),
        F.col(p_den).cast("long").alias("den"),
    )
    # clip: num' = greatest(1, least(num, den - 1)) keeps both logs
    # finite while preserving ordering (den >= 2 assumed)
    t = base.select(
        "y",
        F.expr("greatest(cast(1 as bigint),"
               " least(num, den - 1))").alias("nm"),
        "den",
    ).select(
        "y",
        F.expr(
            "cast(floor(ln(cast(den as double)"
            f" / cast(nm as double)) * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("l_pos"),
        F.expr(
            "cast(floor(ln(cast(den as double)"
            " / cast(den - nm as double))"
            f" * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("l_neg"),
    )
    agg = t.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr("y * l_pos + (1 - y) * l_neg")
        ).alias("ll_q_sum"),
    )
    return agg.select(
        "n", "ll_q_sum",
        F.expr(
            "case when n > 0 then cast(ll_q_sum as double)"
            f" / (cast(n as double) * {q!r}e0) end"
        ).alias("ll"),
    )


def lift_curve(
    df: DataFrame,
    score: str,
    label: str,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table (the campaign-targeting
    readout next to auc_exact): rank by score DESC (id ASC
    tie-break), split into n_bins equal-depth bins, and per bin
    report the cumulative capture rate and lift:

        lift_b = (cum_pos_b / cum_n_b) / (P / N)
               = cum_pos_b * N / (cum_n_b * P)

    Integer counts throughout; lift and gain are single IEEE
    chains. Output per bin: (bin, n_b, pos_b, cum_n, cum_pos,
    gain, lift).

    Scale: one global sort-window for ranks (equi-depth binning —
    the equi_depth_bins plan) + one bin agg + one tiny ordered
    window over n_bins rows.
    """
    nb = int(n_bins)
    w = Window.orderBy(F.col("s").desc(), F.col("i").asc())
    base = (
        df.select(
            F.col(score).alias("s"),
            F.col(id_col).alias("i"),
            F.col(label).cast("long").alias("y"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long") - 1)
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
    )
    bins = base.groupBy(
        F.expr(f"rn * {nb} div n").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("y").alias("pos_b"),
        F.max("n").alias("n"),
    )
    wc = Window.orderBy(F.col("bin").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.orderBy(F.col("bin").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = bins.select(
        "bin", "n_b", "pos_b",
        F.sum("n_b").over(wc).alias("cum_n"),
        F.sum("pos_b").over(wc).alias("cum_pos"),
        F.max("n").over(tot).alias("n"),
        F.sum("pos_b").over(tot).alias("p_all"),
    )
    return cum.select(
        "bin", "n_b", "pos_b", "cum_n", "cum_pos",
        F.expr(
            "case when p_all > 0 then cast(cum_pos as double)"
            " / cast(p_all as double) end"
        ).alias("gain"),
        F.expr(
            "case when p_all > 0 and cum_n > 0 then"
            " cast(cum_pos * n as double)"
            " / cast(cum_n * p_all as double) end"
        ).alias("lift"),
    )


def ece_score(
    df: DataFrame,
    label: str,
    conf_num: str,
    conf_den: int,
    n_bins: int = 10,
) -> DataFrame:
    """Expected calibration error (Naeini et al. 2015) for RATIONAL
    confidences p = conf_num / conf_den (shared denominator — the
    calibration_bins / log_loss prediction form):

        ECE = sum_b (n_b / N) * | acc_b - conf_bar_b |
            = sum_b | pos_b * den - sum_num_b |  /  (den * N)

    — the per-bin terms collapse onto the common denominator den *
    n_b, so the whole score is ONE integer sum of absolute
    differences over bins and one final IEEE division. Bins are
    equal-width on p: bin = min((num * n_bins) div den, n_bins - 1).
    Output: (n, bins_used, ece_num, ece).

    Scale: ONE (bin) hash agg + one fold. Bound: pos_b * den < 2^63.
    """
    nb, den = int(n_bins), int(conf_den)
    base = df.select(
        F.col(label).cast("long").alias("y"),
        F.col(conf_num).cast("long").alias("num"),
    )
    bins = base.groupBy(
        F.expr(f"least((num * {nb}) div {den}, {nb - 1})")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("y").alias("pos_b"),
        F.sum("num").alias("snum_b"),
    )
    agg = bins.agg(
        F.sum("n_b").alias("n"),
        F.count(F.lit(1)).cast("long").alias("bins_used"),
        F.sum(
            F.expr(f"abs(pos_b * {den} - snum_b)")
        ).alias("ece_num"),
    )
    return agg.select(
        "n", "bins_used", "ece_num",
        F.expr(
            "case when n > 0 then cast(ece_num as double)"
            f" / (cast({den} as double) * cast(n as double)) end"
        ).alias("ece"),
    )


def youden_cutoff(
    df: DataFrame,
    score: str,
    label: str,
) -> DataFrame:
    """Optimal classification threshold by Youden's J (J = TPR -
    FPR; the ROC point farthest from chance — auc_exact tells you
    IF the score discriminates, this tells you WHERE to cut):
    thresholds are the distinct scores (predict positive at
    v >= t), and the comparison is the exact integer cross-
    multiplication

        j_num(t) = tp(t) * n_neg - fp(t) * n_pos

    (argmax of j_num IS argmax of J — the common denominator
    n_pos * n_neg is constant). Ties break to the SMALLEST
    threshold. Output one row: (n_pos, n_neg, t_star, tp, fp, j).

    Scale: distinct-score agg + one desc prefix window + two tiny
    folds (max, then min-t at max) — the ks_test plan.
    """
    per = (
        df.select(
            F.col(score).alias("v"),
            F.col(label).cast("long").alias("y"),
        )
        .groupBy("v")
        .agg(
            F.sum("y").alias("cp"),
            F.sum(F.expr("1 - y")).alias("cn"),
        )
    )
    w_desc = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    c = per.select(
        "v",
        F.sum("cp").over(w_desc).alias("tp"),
        F.sum("cn").over(w_desc).alias("fp"),
        F.sum("cp").over(tot).alias("n_pos"),
        F.sum("cn").over(tot).alias("n_neg"),
    ).withColumn(
        "j_num",
        F.expr("tp * n_neg - fp * n_pos"),
    )
    mx = c.agg(F.max("j_num").alias("mj"))
    best = (
        c.crossJoin(F.broadcast(mx))
        .where(F.col("j_num") == F.col("mj"))
        .groupBy("n_pos", "n_neg", "mj")
        .agg(F.min("v").alias("t_star"))
    )
    at = c.select(F.col("v").alias("t_star"), "tp", "fp")
    return best.join(at, on="t_star").select(
        "n_pos", "n_neg",
        F.col("t_star").cast("long").alias("t_star"),
        "tp", "fp",
        F.expr(
            "case when n_pos > 0 and n_neg > 0 then"
            " cast(mj as double)"
            " / (cast(n_pos as double) * cast(n_neg as double))"
            " end"
        ).alias("j"),
    )


JS_Q = 1 << 20


def james_stein_means(
    df: DataFrame,
    group: str,
    value: str,
) -> DataFrame:
    """James-Stein shrinkage of per-group means toward the grand
    mean (Stein 1956/Efron-Morris 1975 — dominate the raw means
    whenever k >= 4; empirical_bayes_rates' Gaussian-mean sibling).
    Group means quantize to the 2^-20 grid (m_q exact int64), the
    shrink factor

        c = max(0, 1 - (k-3) * s2_within_mean / sum (m - mbar)^2)

    evaluates as one fixed IEEE chain from integer sums (positive-
    part rule), and each shrunk mean is row-local. Assumes roughly
    equal group sizes (s2/n uses the mean size; documented). Output
    per group: (g, n_g, m_q, shrunk_r round 9).

    Scale: TWO hash aggs (per-group, global) + a broadcast join.
    """
    q = float(JS_Q)
    grp = df.select(
        F.col(group).alias("g"),
        F.col(value).cast("long").alias("v"),
    ).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("v").alias("s_g"),
        F.sum(F.expr("v * v")).alias("ss_g"),
    ).withColumn(
        "m_q",
        F.expr(
            "cast(floor(cast(s_g as double)"
            f" / cast(n_g as double) * {q!r}e0 + 0.5e0) as bigint)"
        ),
    )
    tot = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("m_q").alias("sm_q"),
        F.sum(F.expr("m_q * m_q")).alias("smm_q"),
        F.sum("n_g").alias("n_all"),
        # pooled within-group SSE in n_g-scaled exact pieces is
        # group-size-dependent; carry the quantized per-group
        # variance-of-mean sum instead
        F.sum(
            F.expr(
                "cast(floor((cast(n_g as double)"
                " * cast(ss_g as double)"
                " - cast(s_g as double) * cast(s_g as double))"
                " / (cast(n_g as double) * cast(n_g as double)"
                " * (cast(n_g as double) - 1.0e0))"
                f" * {q!r}e0 + 0.5e0) as bigint)"
            )
        ).alias("sv_q"),
    )
    j = grp.crossJoin(F.broadcast(tot))
    # sum (m - mbar)^2 on the quantized grid: (k*smm - sm^2)/k^2,
    # carried as the exact integer k*smm_q - sm_q^2 over k
    ssb = "(cast(k as double) * cast(smm_q as double)" \
          " - cast(sm_q as double) * cast(sm_q as double))"
    s2m = f"(cast(sv_q as double) / cast(k as double))"
    # unit audit: ssb is in Q^2-units times k, s2m in Q-units —
    # the missing Q re-scales s2m onto ssb's grid
    cfac = (
        f"greatest(0.0e0, 1.0e0 - (cast(k as double) - 3.0e0)"
        f" * {s2m} * cast(k as double) * {q!r}e0 / {ssb})"
    )
    mbar = "(cast(sm_q as double) / cast(k as double))"
    return j.select(
        "g", "n_g", "m_q",
        F.expr(
            f"case when k > 3 and {ssb} > 0.0e0 then"
            f" round(({mbar} + {cfac}"
            f" * (cast(m_q as double) - {mbar})) / {q!r}e0, 9)"
            " end"
        ).alias("shrunk_r"),
    )


def mahalanobis_2d(
    df: DataFrame,
    x: str,
    y: str,
    id_col: str,
) -> DataFrame:
    """Squared Mahalanobis distance of 2-D points from their own
    cloud (the correlation-aware outlier score completing
    grubbs_stat's univariate screen and sd_ellipse's summary):
    with n-scaled deviations dx = n*x - Sx and the centered
    moments a = n*Sxx - Sx^2 etc.,

        md2 = (c dx^2 - 2 b dx dy + a dy^2) / (a c - b^2)

    (the n^2 factors cancel) — every term an exact int64 cast to
    double, md2 one fixed IEEE chain rounded to 9dp. Degenerate
    (collinear) clouds yield NULL. Output: (id, md2_r).

    Scale: ONE moment pass broadcast back over the rows — fully
    row-local scoring.
    """
    base = df.select(
        F.col(id_col).alias("i"),
        F.col(x).cast("long").alias("px"),
        F.col(y).cast("long").alias("py"),
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("px").alias("sx"), F.sum("py").alias("sy"),
        F.sum(F.expr("px * px")).alias("sxx"),
        F.sum(F.expr("px * py")).alias("sxy"),
        F.sum(F.expr("py * py")).alias("syy"),
    ).select(
        "n", "sx", "sy",
        F.expr("n * sxx - sx * sx").alias("a"),
        F.expr("n * sxy - sx * sy").alias("b"),
        F.expr("n * syy - sy * sy").alias("c"),
    )
    j = base.crossJoin(F.broadcast(mom))
    dx = "(cast(n as double) * cast(px as double)" \
         " - cast(sx as double))"
    dy = "(cast(n as double) * cast(py as double)" \
         " - cast(sy as double))"
    det = "(cast(a as double) * cast(c as double)" \
          " - cast(b as double) * cast(b as double))"
    num = (
        f"(cast(c as double) * {dx} * {dx}"
        f" - 2.0e0 * cast(b as double) * {dx} * {dy}"
        f" + cast(a as double) * {dy} * {dy})"
    )
    return j.select(
        "i",
        F.expr(
            f"case when {det} > 0.0e0 then"
            f" round({num} / {det}, 9) end"
        ).alias("md2_r"),
    )


SIEGEL_Q = 1 << 20


def siegel_slope(
    df: DataFrame,
    x: str,
    y: str,
    id_col: str,
) -> DataFrame:
    """Siegel repeated-median slope (Siegel 1982) — theil_sen's
    50%-breakdown upgrade (median-of-medians survives HALF the
    points being corrupted; Theil-Sen only 29%):

        slope = median_i ( median_{j != i} (y_i - y_j)/(x_i - x_j) )

    Pair slopes quantize to the 2^-20 grid ((dy * Q) div dx —
    truncation toward zero matches across engines, verify SKILL
    notes); both median stages use the LOWER-median convention
    (position (m+1) div 2 by (value, partner-id) order) so the
    result is one exact int64. Output: (n, slope_q, slope).

    O(n^2) pairs — the oracle-exact small-n path (filter first,
    like kendall_tau); at scale run per-key on bounded groups.
    """
    q = SIEGEL_Q
    a = df.select(
        F.col(id_col).alias("i"),
        F.col(x).cast("long").alias("xi"),
        F.col(y).cast("long").alias("yi"),
    )
    b = df.select(
        F.col(id_col).alias("j"),
        F.col(x).cast("long").alias("xj"),
        F.col(y).cast("long").alias("yj"),
    )
    pairs = a.join(
        b, (F.col("i") != F.col("j")) & (F.col("xi") != F.col("xj"))
    ).select(
        "i", "j",
        F.expr(
            f"((yi - yj) * cast({q} as bigint)) div (xi - xj)"
        ).alias("s_q"),
    )
    wi = Window.partitionBy("i").orderBy(
        F.col("s_q").asc(), F.col("j").asc()
    )
    ci = Window.partitionBy("i")
    med_i = (
        pairs.withColumn("rn", F.row_number().over(wi))
        .withColumn("m", F.count(F.lit(1)).over(ci))
        .where(F.col("rn") == F.expr("(m + 1) div 2"))
        .select("i", F.col("s_q").alias("mi_q"))
    )
    wo = Window.orderBy(F.col("mi_q").asc(), F.col("i").asc())
    out = (
        med_i.withColumn("rn", F.row_number().over(wo))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
    )
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("mi_q").alias("slope_q"),
        F.expr(
            f"cast(mi_q as double) / {float(q)!r}e0"
        ).alias("slope"),
    )


def general_g(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Getis-Ord General G global hot-spot statistic (1992) — the
    GLOBAL companion of getis_ord_gi (are HIGH values clustered
    near other high values, which Moran's I cannot distinguish
    from low-near-low):

        G = sum_{j in ring1(i)} x_i x_j / sum_{i != j} x_i x_j

    Numerator over directed ring-1 neighbor pairs (the morans_i
    adjacency), denominator (S^2 - SS) over ALL ordered pairs —
    both exact int64, G one IEEE division. Requires non-negative
    x (the statistic's own precondition). Output: (n, w_pairs,
    num, den, g).

    Scale: the morans_i plan — ring-1 explode + one hash join +
    map-side folds.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"),
        F.col(value).cast("long").alias("xv"),
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xv").alias("s"),
        F.sum(F.expr("xv * xv")).alias("ss"),
    )
    nbrs = (
        grid_disk(base.select("c"), "c", res=res, k=1,
                  out="nc", ring_out="ring")
        .where(F.col("ring") == 1)
        .select("c", "nc")
    )
    num = (
        nbrs.join(
            base.select(F.col("c").alias("nc"),
                        F.col("xv").alias("xj")),
            on="nc",
        )
        .join(base.select("c", F.col("xv").alias("xi")), on="c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("w_pairs"),
            F.sum(F.expr("xi * xj")).alias("num"),
        )
    )
    j = num.crossJoin(F.broadcast(mom))
    return j.select(
        "n", "w_pairs", "num",
        F.expr("s * s - ss").alias("den"),
        F.expr(
            "case when s * s - ss > 0 then cast(num as double)"
            " / cast(s * s - ss as double) end"
        ).alias("g"),
    )


def gumbel_lmoments(
    df: DataFrame,
    value: str,
) -> DataFrame:
    """Gumbel (EV-I) fit by L-moments (Hosking 1990) with return
    levels — THE flood-frequency / design-storm primitive over
    annual-maximum series (the extreme-value companion of
    weibull_fit's failure analysis):

        b0 = mean,  b1 = sum (i-1) x_(i) / (n (n-1)),
        lambda2 = 2 b1 - b0,
        beta = lambda2 / ln 2,   mu = b0 - gamma * beta,
        x_T = mu + beta * k_T,  k_T = -ln(-ln(1 - 1/T))

    Rank-weighted sums are exact int64 (ties among equal values
    cannot change them); ln 2, Euler's gamma and the k_T factors
    fold to literals at plan-build time, so every output is one
    fixed IEEE chain. Output: (n, sum_v, sum_iv, mu, beta, rl10,
    rl100).

    Scale: one sort-window for ranks + ONE moment agg.
    """
    import math

    from pdal_spark import sqlgen as G

    w = Window.orderBy(F.col("v").asc(), F.col("__tb").asc())
    base = (
        df.select(
            F.col(value).cast("long").alias("v"),
            F.monotonically_increasing_id().alias("__tb"),
        )
        .withColumn("i", F.row_number().over(w).cast("long"))
        .drop("__tb")
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("sum_v"),
        F.sum(F.expr("(i - 1) * v")).alias("sum_iv"),
    )
    ln2 = G.fnum(math.log(2.0))
    gam = G.fnum(0.5772156649015329)
    b0 = "(cast(sum_v as double) / cast(n as double))"
    lam2 = (
        "((2.0e0 * cast(sum_iv as double)"
        " - (cast(n as double) - 1.0e0) * cast(sum_v as double))"
        " / (cast(n as double) * (cast(n as double) - 1.0e0)))"
    )
    beta = f"({lam2} / {ln2})"
    mu = f"({b0} - {gam} * {beta})"
    k10 = G.fnum(-math.log(-math.log(1.0 - 1.0 / 10.0)))
    k100 = G.fnum(-math.log(-math.log(1.0 - 1.0 / 100.0)))
    g = "case when n > 1 then "
    return mom.select(
        "n", "sum_v", "sum_iv",
        F.expr(f"{g}{mu} end").alias("mu"),
        F.expr(f"{g}{beta} end").alias("beta"),
        F.expr(f"{g}{mu} + {beta} * {k10} end").alias("rl10"),
        F.expr(f"{g}{mu} + {beta} * {k100} end").alias("rl100"),
    )


def mean_excess(
    df: DataFrame,
    value: str,
    thresholds: list[int],
) -> DataFrame:
    """Mean-excess (mean residual life) ladder — the
    peaks-over-threshold diagnostic that picks the GPD threshold
    (linear-in-u region => generalized Pareto tail; pairs with
    gumbel_lmoments' block-maxima view):

        me(u) = sum_{v > u} (v - u) / #{v > u}

    Exact integer exceedance sums per threshold; me one IEEE
    division. Output per u: (u, n_exc, sum_exc, me).

    Scale: one |thresholds|-explode + ONE hash agg.
    """
    ts = sorted(int(t) for t in thresholds)
    base = df.select(F.col(value).cast("long").alias("v"))
    ladder = base.select(
        "v",
        F.explode(F.array(*[F.lit(t) for t in ts])).alias("u"),
    ).where(F.col("v") > F.col("u"))
    agg = ladder.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("n_exc"),
        F.sum(F.expr("v - u")).alias("sum_exc"),
    )
    return agg.select(
        F.col("u").cast("long").alias("u"), "n_exc", "sum_exc",
        F.expr(
            "cast(sum_exc as double) / cast(n_exc as double)"
        ).alias("me"),
    )


def lmoment_ratios(
    df: DataFrame,
    value: str,
) -> DataFrame:
    """Sample L-moment ratios (Hosking 1990) — the distribution-
    shape fingerprint regional frequency analysis screens with
    (L-CV / L-skewness / L-kurtosis are nearly unbiased and
    outlier-robust, unlike classical skew/kurtosis), plus the
    Hosking GEV shape estimate from tau3:

        b_r weighted by falling factorials of the ascending rank;
        lambda2 = 2b1 - b0, lambda3 = 6b2 - 6b1 + b0,
        lambda4 = 20b3 - 30b2 + 12b1 - b0
        c = 2/(3 + tau3) - ln2/ln3,
        kappa = 7.8590 c + 2.9554 c^2

    Rank-weighted sums are exact int64 (rank ties among equal
    values cancel); every ratio is a fixed IEEE chain over them.
    Output: (n, b0n, b1n, b2n, b3n, l_cv, tau3, tau4, gev_kappa).

    Scale: one sort-window + ONE moment agg (the gumbel_lmoments
    plan extended two weights deeper). Bound: n^3 * max(v) < 2^63.
    """
    import math

    from pdal_spark import sqlgen as G

    w = Window.orderBy(F.col("v").asc(), F.col("__tb").asc())
    base = (
        df.select(
            F.col(value).cast("long").alias("v"),
            F.monotonically_increasing_id().alias("__tb"),
        )
        .withColumn("i", F.row_number().over(w).cast("long"))
        .drop("__tb")
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("b0n"),
        F.sum(F.expr("(i - 1) * v")).alias("b1n"),
        F.sum(F.expr("(i - 1) * (i - 2) * v")).alias("b2n"),
        F.sum(F.expr("(i - 1) * (i - 2) * (i - 3) * v"))
        .alias("b3n"),
    )
    nf = "cast(n as double)"
    b0 = f"(cast(b0n as double) / {nf})"
    b1 = f"(cast(b1n as double) / ({nf} * ({nf} - 1.0e0)))"
    b2 = (
        f"(cast(b2n as double) / ({nf} * ({nf} - 1.0e0)"
        f" * ({nf} - 2.0e0)))"
    )
    b3 = (
        f"(cast(b3n as double) / ({nf} * ({nf} - 1.0e0)"
        f" * ({nf} - 2.0e0) * ({nf} - 3.0e0)))"
    )
    l2 = f"(2.0e0 * {b1} - {b0})"
    l3 = f"(6.0e0 * {b2} - 6.0e0 * {b1} + {b0})"
    l4 = (
        f"(2.0e1 * {b3} - 3.0e1 * {b2} + 1.2e1 * {b1} - {b0})"
    )
    tau3 = f"({l3} / {l2})"
    ln23 = G.fnum(math.log(2.0) / math.log(3.0))
    c = f"(2.0e0 / (3.0e0 + {tau3}) - {ln23})"
    kappa = (
        f"({G.fnum(7.8590)} * {c}"
        f" + {G.fnum(2.9554)} * {c} * {c})"
    )
    g2 = f"case when n > 3 and {l2} <> 0.0e0 then "
    return mom.select(
        "n", "b0n", "b1n", "b2n", "b3n",
        F.expr(
            f"case when n > 1 and {b0} <> 0.0e0 then"
            f" {l2} / {b0} end"
        ).alias("l_cv"),
        F.expr(f"{g2}{tau3} end").alias("tau3"),
        F.expr(f"{g2}{l4} / {l2} end").alias("tau4"),
        F.expr(f"{g2}{kappa} end").alias("gev_kappa"),
    )


def moran_correlogram(
    cells: DataFrame,
    res: int,
    max_ring: int = 3,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Spatial correlogram: Moran's I per neighborhood RING 1..
    max_ring (the distance-decay profile of autocorrelation —
    morans_i gives one point, this gives the curve the
    semivariogram draws for variance):

        I(k) = n * sum_{ring-k pairs} d_i d_j
                 / (w_pairs(k) * sum d^2)

    on the shared n-scaled integer deviation grid — all moments
    exact int64 per ring, I one IEEE chain. Output per ring:
    (ring, n, w_pairs, num, den, morans_i).

    Scale: ONE grid_disk(k = max_ring) explode (ring labels come
    free) + one hash join + a (ring) agg — the morans_i plan with
    the ring kept as a group key.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"),
        F.col(value).cast("long").alias("xv"),
    )
    mom = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("xv").alias("s")
    )
    d = base.crossJoin(F.broadcast(mom)).select(
        "c", F.expr("n * xv - s").alias("d"), "n"
    )
    nbrs = (
        grid_disk(d.select("c"), "c", res=res, k=int(max_ring),
                  out="nc", ring_out="ring")
        .where(F.col("ring") >= 1)
        .select("c", "nc", "ring")
    )
    pairs = (
        nbrs.join(d.select(F.col("c").alias("nc"),
                           F.col("d").alias("dj")), on="nc")
        .join(d.select("c", F.col("d").alias("di")), on="c")
    )
    num = pairs.groupBy("ring").agg(
        F.count(F.lit(1)).cast("long").alias("w_pairs"),
        F.sum(F.expr("di * dj")).alias("num"),
    )
    den = d.agg(
        F.max("n").alias("n"), F.sum(F.expr("d * d")).alias("den")
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("ring").cast("long").alias("ring"),
        "n", "w_pairs", "num", "den",
        F.expr(
            "CASE WHEN w_pairs > 0 AND den <> 0 THEN"
            " (cast(n as double) * cast(num as double))"
            " / (cast(w_pairs as double) * cast(den as double))"
            " END"
        ).alias("morans_i"),
    )


def lacunarity(
    cells: DataFrame,
    res: int,
    coarser: list[int],
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Gliding-box lacunarity ladder (Allain & Cloitre 1991, the
    aggregated-box form): texture/gappiness of a density raster
    across scales — two patterns with identical fractal dimension
    can have very different lacunarity (clumped vs even):

        L(r) = n_r * sum m^2 / (sum m)^2

    over box masses m at each coarser resolution r (boxes =
    parent cells from the cell pyramid — the compute is ONE parent
    rollup per scale). Exact int64 moments; L one IEEE chain.
    Output per r: (r, n_boxes, sum_m, sum_m2, lac).

    Scale: |coarser| map-side-combined rollups of the cell table
    (cell_pyramid's plan), nothing pairwise.
    """
    from pdal_spark import sqlgen as G_
    from pdal_spark.sqlgen import SPARK

    base = cells.select(
        F.col(cell).alias("c"),
        F.col(value).cast("long").alias("xv"),
    )
    outs = []
    for r in sorted(int(r) for r in coarser):
        parent = base.select(
            F.expr(
                G_.qcell_parent("c", int(res), r, SPARK)
            ).alias("p"),
            "xv",
        )
        boxes = parent.groupBy("p").agg(F.sum("xv").alias("m"))
        agg = boxes.agg(
            F.count(F.lit(1)).cast("long").alias("n_boxes"),
            F.sum("m").alias("sum_m"),
            F.sum(F.expr("m * m")).alias("sum_m2"),
        ).select(
            F.lit(r).cast("long").alias("r"),
            "n_boxes", "sum_m", "sum_m2",
            F.expr(
                "case when sum_m <> 0 then"
                " cast(n_boxes as double) * cast(sum_m2 as double)"
                " / (cast(sum_m as double)"
                " * cast(sum_m as double)) end"
            ).alias("lac"),
        )
        outs.append(agg)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def kendalls_w(
    df: DataFrame,
    rater: str,
    item: str,
    value: str,
) -> DataFrame:
    """Kendall's coefficient of concordance W (Kendall & Babington
    Smith 1939), tie-corrected — friedman_test's EFFECT SIZE (how
    strongly do the m raters agree on the item ordering, 0..1):

        W = (S - correction terms) re-expressed on doubled
        within-rater mid-ranks:
        W = (12 * sum_j (2R_j)^2 - 3 m^2 n (n+1)^2 * 4) /
            (4 * (m^2 n (n^2 - 1) - m * sum_ties))

    carried exactly: with 2R_j the doubled rank sum per item,

        num4 = 12 * sum_j (2R_j - m(n+1))^2        [int64]
        den4 = 4 * (m^2 (n^3 - n) - m * sum(t^3 - t))

    and W = num4/den4 one IEEE division (NULL when every rater
    ties everything). Output: (m, n, num4, den4, w).

    Scale: the friedman block-rank kernel verbatim (raters are the
    blocks) + one item agg + one fold.
    """
    tr = _block_doubled_ranks(df, rater, item, value)
    m_df = tr.select("i").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    n_df = tr.select("j").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rj = tr.groupBy("j").agg(F.sum("two_r").alias("two_rj"))
    # tie correction: per (rater, tied-value block) t^3 - t over
    # the ORIGINAL values
    per = df.select(
        F.col(rater).alias("i"), F.col(value).alias("v")
    ).groupBy("i", "v").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    ties = per.agg(
        F.sum(F.expr("t * t * t - t")).alias("sum_ties")
    )
    num = (
        rj.crossJoin(F.broadcast(m_df))
        .crossJoin(F.broadcast(n_df))
        .select(
            F.expr(
                "(two_rj - m * (n + 1))"
                " * (two_rj - m * (n + 1))"
            ).alias("sq")
        )
        .agg(F.sum("sq").alias("s4"))
    )
    out = (
        num.crossJoin(F.broadcast(m_df))
        .crossJoin(F.broadcast(n_df))
        .crossJoin(F.broadcast(ties))
    )
    return out.select(
        "m", "n",
        F.expr("12 * s4").alias("num4"),
        F.expr(
            "4 * (m * m * (n * n * n - n) - m * sum_ties)"
        ).alias("den4"),
        F.expr(
            "case when m * m * (n * n * n - n) - m * sum_ties > 0"
            " then cast(12 * s4 as double)"
            " / cast(4 * (m * m * (n * n * n - n)"
            " - m * sum_ties) as double) end"
        ).alias("w"),
    )


def lins_ccc(
    df: DataFrame,
    x: str,
    y: str,
) -> DataFrame:
    """Lin's concordance correlation coefficient (Lin 1989) — the
    agreement metric for two CONTINUOUS measurements of the same
    thing (new scorer vs reference scorer): penalizes both scatter
    AND location/scale shift, unlike Pearson:

        CCC = 2 cov(x,y) / (var(x) + var(y) + (xbar - ybar)^2)

    carried on n-scaled integer moments (n*sxy - sx*sy etc., the
    iv_wald discipline — the n^2 factors cancel including in the
    mean-shift term n^2(xbar-ybar)^2 = (n... (sx - sy))^2 / 1).
    Output: (n, cxy_n, vx_n, vy_n, shift2, ccc).

    Scale: ONE moment aggregation pass.
    """
    base = df.select(
        F.col(x).cast("long").alias("xv"),
        F.col(y).cast("long").alias("yv"),
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xv").alias("sx"), F.sum("yv").alias("sy"),
        F.sum(F.expr("xv * yv")).alias("sxy"),
        F.sum(F.expr("xv * xv")).alias("sxx"),
        F.sum(F.expr("yv * yv")).alias("syy"),
    )
    scaled = mom.select(
        "n",
        F.expr("n * sxy - sx * sy").alias("cxy_n"),
        F.expr("n * sxx - sx * sx").alias("vx_n"),
        F.expr("n * syy - sy * sy").alias("vy_n"),
        F.expr("(sx - sy) * (sx - sy)").alias("shift2"),
    )
    return scaled.select(
        "n", "cxy_n", "vx_n", "vy_n", "shift2",
        F.expr(
            "case when vx_n + vy_n + shift2 > 0 then"
            " 2.0e0 * cast(cxy_n as double)"
            " / (cast(vx_n as double) + cast(vy_n as double)"
            " + cast(shift2 as double)) end"
        ).alias("ccc"),
    )


HL_Q = 2  # doubled differences keep the pair MEAN convention exact


def hodges_lehmann(
    df_a: DataFrame,
    df_b: DataFrame,
    value: str,
) -> DataFrame:
    """Two-sample Hodges-Lehmann location-shift estimator (1963) —
    the robust effect SIZE to mann_whitney_u's test: the median of
    all pairwise differences x_i - y_j (breakdown 29%, efficiency
    0.955 vs the mean under normality). Lower-median convention by
    (difference, i, j) order — one exact int64. Output:
    (n_a, n_b, n_pairs, hl_shift).

    O(n_a * n_b) pairs — the oracle-exact small-n path (filter
    first, like kendall_tau); at scale sample or bucket first.
    """
    a = df_a.select(F.col(value).cast("long").alias("xa")) \
        .withColumn("ia", F.monotonically_increasing_id())
    b = df_b.select(F.col(value).cast("long").alias("xb")) \
        .withColumn("ib", F.monotonically_increasing_id())
    pairs = a.crossJoin(b).select(
        (F.col("xa") - F.col("xb")).alias("d")
    )
    w = Window.orderBy(F.col("d").asc())
    ranked = pairs.withColumn(
        "rn", F.row_number().over(w).cast("long")
    ).withColumn(
        "np", F.count(F.lit(1)).over(Window.partitionBy())
    )
    med = ranked.where(F.col("rn") == F.expr("(np + 1) div 2"))
    na = df_a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = df_b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    return (
        med.select(F.col("np").cast("long").alias("n_pairs"),
                   F.col("d").alias("hl_shift"))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select("n_a", "n_b", "n_pairs", "hl_shift")
    )


def bland_altman(
    df: DataFrame,
    x: str,
    y: str,
) -> DataFrame:
    """Bland-Altman limits of agreement (1986) — the method-
    comparison companion of lins_ccc (CCC scores agreement, this
    BOUNDS it): over paired measurements,

        bias = mean(d),  loa = bias -+ 1.96 * sd(d),   d = x - y

    Exact integer moments (sum d, sum d^2); bias/sd/limits are
    fixed IEEE chains (sample sd, n-1). Also emits the count
    outside the limits — the actionable number. Output: (n, sd_n
    [=n*sum d2 - (sum d)^2], bias, loa_lo, loa_hi, n_outside).

    Scale: ONE moment pass + one broadcast-back filter count.
    """
    base = df.select(
        (F.col(x).cast("long") - F.col(y).cast("long")).alias("d")
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").alias("sd_sum"),
        F.sum(F.expr("d * d")).alias("sd2"),
    ).withColumn("sd_n", F.expr("n * sd2 - sd_sum * sd_sum"))
    bias = "(cast(sd_sum as double) / cast(n as double))"
    sd = (
        "sqrt(cast(sd_n as double)"
        " / (cast(n as double) * (cast(n as double) - 1.0e0)))"
    )
    lo = f"({bias} - 1.96e0 * {sd})"
    hi = f"({bias} + 1.96e0 * {sd})"
    outside = base.crossJoin(F.broadcast(mom)).where(
        F.expr(
            f"n > 1 and (cast(d as double) < {lo}"
            f" or cast(d as double) > {hi})"
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("n_outside"))
    return mom.crossJoin(F.broadcast(outside)).select(
        "n", "sd_n",
        F.expr(f"case when n > 1 then {bias} end").alias("bias"),
        F.expr(f"case when n > 1 then {lo} end").alias("loa_lo"),
        F.expr(f"case when n > 1 then {hi} end").alias("loa_hi"),
        "n_outside",
    )


def poisson_rate_test(
    df: DataFrame,
    group: str,
    events_col: str,
    exposure: str,
    g_a,
    g_b,
) -> DataFrame:
    """Two-sample Poisson rate comparison (the incidence-rate
    analog of ab_test's two-proportion z): exact integer event and
    exposure totals per arm, then

        z   = (r_a - r_b) / sqrt(o_a/t_a^2 + o_b/t_b^2)
        irr = r_a / r_b,  ln-CI: ln(irr) -+ 1.96 sqrt(1/o_a + 1/o_b)

    (the standard normal approximation on the rate difference and
    the log-IRR). IRR CI bounds pass through exp/ln -> round(6).
    Degenerate arms (no exposure / no events) yield NULLs. Output:
    (o_a, t_a, o_b, t_b, z, irr, irr_lo_r, irr_hi_r).

    Scale: ONE conditional-aggregation pass (the ab_test plan).
    """
    is_a = F.col(group) == F.lit(g_a)
    is_b = F.col(group) == F.lit(g_b)
    agg = df.agg(
        F.sum(F.when(is_a, F.col(events_col)).otherwise(F.lit(0)))
        .cast("long").alias("o_a"),
        F.sum(F.when(is_a, F.col(exposure)).otherwise(F.lit(0)))
        .cast("long").alias("t_a"),
        F.sum(F.when(is_b, F.col(events_col)).otherwise(F.lit(0)))
        .cast("long").alias("o_b"),
        F.sum(F.when(is_b, F.col(exposure)).otherwise(F.lit(0)))
        .cast("long").alias("t_b"),
    )
    ra = "(cast(o_a as double) / cast(t_a as double))"
    rb = "(cast(o_b as double) / cast(t_b as double))"
    se = (
        "sqrt(cast(o_a as double)"
        " / (cast(t_a as double) * cast(t_a as double))"
        " + cast(o_b as double)"
        " / (cast(t_b as double) * cast(t_b as double)))"
    )
    lnw = "(1.96e0 * sqrt(1.0e0 / cast(o_a as double)"
    lnw += " + 1.0e0 / cast(o_b as double)))"
    irr = f"({ra} / {rb})"
    g2 = "case when t_a > 0 and t_b > 0 and o_a > 0 and o_b > 0"
    return agg.select(
        "o_a", "t_a", "o_b", "t_b",
        F.expr(
            f"case when t_a > 0 and t_b > 0"
            f" and o_a + o_b > 0 then ({ra} - {rb}) / {se} end"
        ).alias("z"),
        F.expr(f"{g2} then {irr} end").alias("irr"),
        F.expr(
            f"{g2} then round(exp(ln({irr}) - {lnw}), 6)"
            " + 0.0e0 end"
        ).alias("irr_lo_r"),
        F.expr(
            f"{g2} then round(exp(ln({irr}) + {lnw}), 6)"
            " + 0.0e0 end"
        ).alias("irr_hi_r"),
    )


def funnel_limits(
    df: DataFrame,
    entity: str,
    successes: str,
    trials: str,
) -> DataFrame:
    """Funnel-plot control limits for proportions (Spiegelhalter
    2005) — the league-table honesty check empirical_bayes_rates
    ranks by: each entity's rate vs the 95% binomial band around
    the POOLED rate at its own volume:

        limit_i = p_pool -+ 1.96 sqrt(p_pool (1 - p_pool) / n_i)

    flagging entities outside. Exact integer tallies; per-entity
    limits and flags are row-local IEEE chains. Output per entity:
    (entity, x_i, n_i, rate, lo, hi, flag).

    Scale: ONE entity agg + broadcast pooled totals + row-local
    scoring.
    """
    base = df.select(
        F.col(entity).alias("e"),
        F.col(successes).cast("long").alias("x"),
        F.col(trials).cast("long").alias("t"),
    )
    per = base.groupBy("e").agg(
        F.sum("x").alias("x_i"), F.sum("t").alias("n_i")
    )
    pool = per.agg(
        F.sum("x_i").alias("xs"), F.sum("n_i").alias("ns")
    )
    j = per.crossJoin(F.broadcast(pool))
    p = "(cast(xs as double) / cast(ns as double))"
    w = (
        f"(1.96e0 * sqrt({p} * (1.0e0 - {p})"
        " / cast(n_i as double)))"
    )
    rate = "(cast(x_i as double) / cast(n_i as double))"
    return j.select(
        "e", "x_i", "n_i",
        F.expr(
            f"case when n_i > 0 then {rate} end"
        ).alias("rate"),
        F.expr(
            f"case when n_i > 0 and ns > 0 then {p} - {w} end"
        ).alias("lo"),
        F.expr(
            f"case when n_i > 0 and ns > 0 then {p} + {w} end"
        ).alias("hi"),
        F.expr(
            f"case when n_i > 0 and ns > 0 then"
            f" case when {rate} < {p} - {w}"
            f" or {rate} > {p} + {w} then 1 else 0 end end"
        ).cast("int").alias("flag"),
    )


def jarque_bera(
    df: DataFrame,
    value: str,
) -> DataFrame:
    """Jarque-Bera normality test (1980) — the moment-based screen
    (skewness + excess kurtosis jointly zero under normality; the
    named-test form of stats' skew/kurt outputs):

        JB = n/6 * (S^2 + K^2/4)

    with S and K the sample skewness and excess kurtosis computed
    from exact integer raw moments (sums of v, v^2, v^3, v^4 — the
    central moments expand exactly on the n-scaled grid, evaluated
    as one fixed IEEE chain). Bound: n * max|v|^4 < 2^63 — keep
    |v| under ~150 at n = 1e4 (pre-quantize wider inputs). Output:
    (n, s1, s2, s3, s4, skew, kurt_ex, jb).

    Scale: ONE moment aggregation pass.
    """
    base = df.select(F.col(value).cast("long").alias("v"))
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.expr("v * v")).alias("s2"),
        F.sum(F.expr("v * v * v")).alias("s3"),
        F.sum(F.expr("v * v * v * v")).alias("s4"),
    )
    nf = "cast(n as double)"
    m1 = f"(cast(s1 as double) / {nf})"
    m2 = f"(cast(s2 as double) / {nf} - {m1} * {m1})"
    m3 = (
        f"(cast(s3 as double) / {nf}"
        f" - 3.0e0 * {m1} * cast(s2 as double) / {nf}"
        f" + 2.0e0 * {m1} * {m1} * {m1})"
    )
    m4 = (
        f"(cast(s4 as double) / {nf}"
        f" - 4.0e0 * {m1} * cast(s3 as double) / {nf}"
        f" + 6.0e0 * {m1} * {m1} * cast(s2 as double) / {nf}"
        f" - 3.0e0 * {m1} * {m1} * {m1} * {m1})"
    )
    skew = f"({m3} / sqrt({m2} * {m2} * {m2}))"
    kurt = f"({m4} / ({m2} * {m2}) - 3.0e0)"
    jb = (
        f"({nf} / 6.0e0 * ({skew} * {skew}"
        f" + {kurt} * {kurt} / 4.0e0))"
    )
    g = f"case when n > 3 and {m2} > 0.0e0 then "
    return mom.select(
        "n", "s1", "s2", "s3", "s4",
        F.expr(f"{g}{skew} end").alias("skew"),
        F.expr(f"{g}{kurt} end").alias("kurt_ex"),
        F.expr(f"{g}{jb} end").alias("jb"),
    )


HELL_Q = 1 << 20


def hellinger_distance(
    df_a: DataFrame,
    df_b: DataFrame,
    category: str,
) -> DataFrame:
    """Hellinger distance between two discrete distributions (the
    bounded, symmetric drift metric next to psi_drift / KL /
    wasserstein_1d — well-defined even when supports differ):

        BC = sum_c sqrt(p_c q_c),   H = sqrt(1 - BC)

    Each category's sqrt(a_c * b_c) / sqrt(n_a * n_b) term is one
    IEEE chain over exact counts, quantized to the 2^-20 grid
    before the order-invariant integer fold; BC and H close it
    out. Output: (n_a, n_b, bc_q_sum, bc, hellinger_r round 9).

    Scale: two histogram aggs + ONE full-outer category join +
    one fold.
    """
    q = float(HELL_Q)
    a = df_a.groupBy(F.col(category).alias("c")).agg(
        F.count(F.lit(1)).cast("long").alias("ca")
    )
    b = df_b.groupBy(F.col(category).alias("c")).agg(
        F.count(F.lit(1)).cast("long").alias("cb")
    )
    na = df_a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = df_b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    j = (
        a.join(b, on="c", how="full_outer")
        .select(
            F.expr("coalesce(ca, cast(0 as bigint))").alias("ca"),
            F.expr("coalesce(cb, cast(0 as bigint))").alias("cb"),
        )
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    term = (
        "sqrt(cast(ca as double) * cast(cb as double))"
        " / sqrt(cast(n_a as double) * cast(n_b as double))"
    )
    agg = j.groupBy("n_a", "n_b").agg(
        F.sum(
            F.expr(
                f"cast(floor({term} * {q!r}e0 + 0.5e0) as bigint)"
            )
        ).alias("bc_q_sum")
    )
    bc = f"(cast(bc_q_sum as double) / {q!r}e0)"
    return agg.select(
        "n_a", "n_b", "bc_q_sum",
        F.expr(bc).alias("bc"),
        F.expr(
            f"round(sqrt(greatest(1.0e0 - {bc}, 0.0e0)), 9)"
        ).alias("hellinger_r"),
    )


JS_LN_Q = 1 << 10


def jensen_shannon(
    df_a: DataFrame,
    df_b: DataFrame,
    category: str,
) -> DataFrame:
    """Jensen-Shannon divergence between two discrete distributions
    (the symmetric, always-finite KL — THE corpus-drift number when
    supports differ; bounded by ln 2):

        JS = 1/2 KL(p || m) + 1/2 KL(q || m),  m = (p + q)/2

    Per category the two ln terms are ln of EXACT count ratios
    (2 a n_b' ... carried as 2*ca*n_b over (ca*n_b + cb*n_a) — the
    common-denominator trick keeps every argument a ratio of
    int64), quantized to the 2^-10 grid and folded as exact
    integer sums weighted by the counts. Output: (n_a, n_b,
    js_q_num, js).

    Scale: same plan as hellinger_distance.
    """
    q = float(JS_LN_Q)
    a = df_a.groupBy(F.col(category).alias("c")).agg(
        F.count(F.lit(1)).cast("long").alias("ca")
    )
    b = df_b.groupBy(F.col(category).alias("c")).agg(
        F.count(F.lit(1)).cast("long").alias("cb")
    )
    na = df_a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = df_b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    j = (
        a.join(b, on="c", how="full_outer")
        .select(
            F.expr("coalesce(ca, cast(0 as bigint))").alias("ca"),
            F.expr("coalesce(cb, cast(0 as bigint))").alias("cb"),
        )
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    # p_c/m_c = 2 ca n_b / (ca n_b + cb n_a); q_c/m_c symmetric
    lp = (
        "cast(floor(ln(2.0e0 * cast(ca as double)"
        " * cast(n_b as double)"
        " / (cast(ca as double) * cast(n_b as double)"
        " + cast(cb as double) * cast(n_a as double)))"
        f" * {q!r}e0 + 0.5e0) as bigint)"
    )
    lq = (
        "cast(floor(ln(2.0e0 * cast(cb as double)"
        " * cast(n_a as double)"
        " / (cast(ca as double) * cast(n_b as double)"
        " + cast(cb as double) * cast(n_a as double)))"
        f" * {q!r}e0 + 0.5e0) as bigint)"
    )
    # weight each ln by its own count; zero-count side contributes 0
    terms = j.select(
        "n_a", "n_b",
        F.expr(
            f"case when ca > 0 then ca * ({lp})"
            " else cast(0 as bigint) end"
        ).alias("ta"),
        F.expr(
            f"case when cb > 0 then cb * ({lq})"
            " else cast(0 as bigint) end"
        ).alias("tb"),
    )
    agg = terms.groupBy("n_a", "n_b").agg(
        F.sum("ta").alias("sa"), F.sum("tb").alias("sb")
    )
    js = (
        "(0.5e0 * cast(sa as double)"
        f" / (cast(n_a as double) * {q!r}e0)"
        " + 0.5e0 * cast(sb as double)"
        f" / (cast(n_b as double) * {q!r}e0))"
    )
    return agg.select(
        "n_a", "n_b",
        F.expr("sa").alias("sa"), F.expr("sb").alias("sb"),
        F.expr(
            f"case when n_a > 0 and n_b > 0 then {js} end"
        ).alias("js"),
    )


def abc_analysis(
    df: DataFrame,
    entity: str,
    value: str,
    a_pct: int = 80,
    b_pct: int = 95,
) -> DataFrame:
    """ABC / Pareto classification (the 80-15-5 inventory rule —
    which domains/users/SKUs carry the value): entities sort by
    value DESC (entity ASC ties) and class by CUMULATIVE share:
    A while cum <= a_pct%, B while <= b_pct%, else C. The share
    comparison is the exact integer cross-multiplication
    cum * 100 <= pct * total — no float anywhere. Output per
    entity: (entity, v, cum, cls).

    Scale: one value agg + one sort-window prefix sum — the
    equi_depth_bins plan with a class CASE.
    """
    base = df.groupBy(F.col(entity).alias("e")).agg(
        F.sum(F.col(value).cast("long")).alias("v")
    )
    w = Window.orderBy(F.col("v").desc(), F.col("e").asc())
    run = w.rowsBetween(Window.unboundedPreceding,
                        Window.currentRow)
    tot = Window.partitionBy()
    cum = base.withColumn("cum", F.sum("v").over(run)) \
        .withColumn("total", F.sum("v").over(tot))
    return cum.select(
        "e", "v", "cum",
        F.expr(
            f"case when cum * 100 <= {int(a_pct)} * total"
            f" then 'A' when cum * 100 <= {int(b_pct)} * total"
            " then 'B' else 'C' end"
        ).alias("cls"),
    )


def lorenz_points(
    df: DataFrame,
    value: str,
    n_points: int = 10,
) -> DataFrame:
    """Lorenz curve at equi-depth population points (the curve the
    gini coefficient integrates — who holds how much, read bottom-
    up): sort values ASCENDING, split into n_points equal-depth
    bins, and report each prefix's share of the total. Exact
    integer cumulative sums; shares one division. Output per
    point: (pt, n_cum, v_cum, share).

    Scale: one sort-window + one bin agg + one ordered prefix over
    n_points rows.
    """
    npts = int(n_points)
    w = Window.orderBy(F.col("v").asc(), F.col("__tb").asc())
    base = (
        df.select(
            F.col(value).cast("long").alias("v"),
            F.monotonically_increasing_id().alias("__tb"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long") - 1)
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
        .drop("__tb")
    )
    bins = base.groupBy(
        F.expr(f"rn * {npts} div n").alias("pt")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("v").alias("v_b"),
    )
    wc = Window.orderBy(F.col("pt").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.orderBy(F.col("pt").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return bins.select(
        F.col("pt").cast("long").alias("pt"),
        F.sum("n_b").over(wc).alias("n_cum"),
        F.sum("v_b").over(wc).alias("v_cum"),
        (F.sum("v_b").over(wc)
         / F.sum("v_b").over(tot)).alias("share"),
    )


def pairwise_mean_diffs(
    df: DataFrame,
    group: str,
    value: str,
) -> DataFrame:
    """All pairwise group mean differences with the pooled-variance
    standard error (the Tukey-HSD workhorse table after anova_f
    says SOMETHING differs — which pairs?):

        q_ij = (mean_i - mean_j) / sqrt(s2_p (1/n_i + 1/n_j))

    Pooled within-group variance carries as the exact integer sum
    of (n_g * ss_g - s_g^2) / n_g (split-division quantized, the
    brown_forsythe discipline); means and the studentized diff are
    fixed IEEE chains. Output per pair (gi < gj): (gi, gj, n_i,
    n_j, diff, q).

    Scale: ONE group agg + a k^2 broadcast self-join (k small).
    """
    q = BF_Q
    grp = df.select(
        F.col(group).alias("g"),
        F.col(value).cast("long").alias("v"),
    ).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("v").alias("s_g"),
        F.sum(F.expr("v * v")).alias("ss_g"),
    )

    def _qdiv(d: str, nn: str) -> str:
        return (
            f"(({d}) div ({nn})) * cast({q} as bigint)"
            f" + ((({d}) % ({nn})) * cast({q} as bigint))"
            f" div ({nn})"
        )

    pooled = grp.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.expr(_qdiv("(n_g * ss_g - s_g * s_g)", "n_g"))
        ).alias("ssw_q"),
    )
    a = grp.select(F.col("g").alias("gi"),
                   F.col("n_g").alias("n_i"),
                   F.col("s_g").alias("s_i"))
    b = grp.select(F.col("g").alias("gj"),
                   F.col("n_g").alias("n_j"),
                   F.col("s_g").alias("s_j"))
    pairs = a.join(b, F.col("gi") < F.col("gj")) \
        .crossJoin(F.broadcast(pooled))
    s2p = (
        f"(cast(ssw_q as double) / {float(q)!r}e0"
        " / (cast(n as double) - cast(k as double)))"
    )
    diff = (
        "(cast(s_i as double) / cast(n_i as double)"
        " - cast(s_j as double) / cast(n_j as double))"
    )
    se = (
        f"sqrt({s2p} * (1.0e0 / cast(n_i as double)"
        " + 1.0e0 / cast(n_j as double)))"
    )
    return pairs.select(
        "gi", "gj", "n_i", "n_j",
        F.expr(diff).alias("diff"),
        F.expr(
            f"case when n > k and {s2p} > 0.0e0 then"
            f" {diff} / {se} end"
        ).alias("q_stat"),
    )


def trend_contrasts(
    df: DataFrame,
    group: str,
    value: str,
) -> DataFrame:
    """Linear + quadratic orthogonal-polynomial trend contrasts
    over ORDERED integer groups 0..k-1 (the dose-response reading
    of an ANOVA — is the response rising, and is it curving?):

        L_lin  = sum_g (2g - (k-1)) * mean_g      [x2 to stay int]
        L_quad = sum_g ((2g - (k-1))^2 - (k^2-1)/3) * mean_g
                 [x3 denominator folded: coefficient
                  3(2g-(k-1))^2 - (k^2-1)]

    Means enter on the common denominator prod-free form: each
    contrast accumulates c_g * s_g * (N_prod / n_g)... kept simple
    and exact by quantizing each mean to the 2^-20 grid first
    (integer folds, the james_stein discipline). Output: (k,
    lin_q, quad_q, lin, quad).

    Scale: ONE group agg + one fold.
    """
    qq = float(JS_Q)
    grp = df.select(
        F.col(group).cast("long").alias("g"),
        F.col(value).cast("long").alias("v"),
    ).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("v").alias("s_g"),
    ).withColumn(
        "m_q",
        F.expr(
            "cast(floor(cast(s_g as double) / cast(n_g as double)"
            f" * {qq!r}e0 + 0.5e0) as bigint)"
        ),
    )
    kk = grp.agg(F.count(F.lit(1)).cast("long").alias("k"))
    j = grp.crossJoin(F.broadcast(kk))
    lin_c = "(2 * g - (k - 1))"
    quad_c = f"(3 * {lin_c} * {lin_c} - (k * k - 1))"
    agg = j.groupBy("k").agg(
        F.sum(F.expr(f"{lin_c} * m_q")).alias("lin_q"),
        F.sum(F.expr(f"{quad_c} * m_q")).alias("quad_q"),
    )
    return agg.select(
        "k", "lin_q", "quad_q",
        F.expr(f"cast(lin_q as double) / {qq!r}e0").alias("lin"),
        F.expr(f"cast(quad_q as double) / {qq!r}e0").alias("quad"),
    )


def erlang_c(
    df: DataFrame,
    arrivals: str,
    service_rate: str,
    servers: str,
    max_c: int = 12,
) -> DataFrame:
    """Erlang-C probability of waiting per row (the M/M/c staffing
    formula behind every call-center / worker-pool sizing
    decision): with offered load a = lambda / mu and c servers,

        P(wait) = (a^c / c!) * c/(c-a)  /  (sum_{k<c} a^k/k! +
                                            a^c/c! * c/(c-a))

    The k! sums unroll to a FIXED polynomial chain (c <= max_c —
    loud error beyond), so the whole expression is deterministic
    IEEE arithmetic over the exact integer inputs; unstable rows
    (a >= c) report probability 1. Output adds (load_r, p_wait_r)
    round 9.

    Scale: fully row-local codegen, zero shuffle.
    """
    import math

    from pdal_spark import sqlgen as G

    a = (
        f"(cast(`{arrivals}` as double)"
        f" / cast(`{service_rate}` as double))"
    )
    c = f"cast(`{servers}` as int)"
    # per-c CASE with the polynomial unrolled at plan-build time
    branches = []
    for cc in range(1, int(max_c) + 1):
        s_terms = " + ".join(
            f"power({a}, {G.fnum(float(k))})"
            f" / {G.fnum(float(math.factorial(k)))}"
            for k in range(cc)
        )
        top = (
            f"(power({a}, {G.fnum(float(cc))})"
            f" / {G.fnum(float(math.factorial(cc)))})"
            f" * ({G.fnum(float(cc))} / ({G.fnum(float(cc))}"
            f" - {a}))"
        )
        branches.append(
            f"when {c} = {cc} then {top}"
            f" / (({s_terms}) + {top})"
        )
    pw = (
        f"case when {a} >= cast({c} as double) then 1.0e0 "
        + " ".join(branches)
        + " end"
    )
    return df.withColumn(
        "load_r", F.expr(f"round({a}, 9)")
    ).withColumn(
        "p_wait_r", F.expr(f"round({pw}, 9)")
    )


def price_indices(
    df: DataFrame,
    p0: str,
    q0: str,
    p1: str,
    q1: str,
) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices over a basket
    (the inflation-measurement classics — how much did the same
    consumption get more expensive between two periods):

        L = sum p1 q0 / sum p0 q0      [base-period basket]
        P = sum p1 q1 / sum p0 q1      [current basket]
        F = sqrt(L * P)                [Fisher ideal]

    All four cross sums exact int64; the indices fixed IEEE
    chains. Output: (n_items, s10, s00, s11, s01, laspeyres,
    paasche, fisher).

    Scale: ONE aggregation pass.
    """
    base = df.select(
        F.col(p0).cast("long").alias("p0"),
        F.col(q0).cast("long").alias("q0"),
        F.col(p1).cast("long").alias("p1"),
        F.col(q1).cast("long").alias("q1"),
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.expr("p1 * q0")).alias("s10"),
        F.sum(F.expr("p0 * q0")).alias("s00"),
        F.sum(F.expr("p1 * q1")).alias("s11"),
        F.sum(F.expr("p0 * q1")).alias("s01"),
    )
    l = "(cast(s10 as double) / cast(s00 as double))"
    p = "(cast(s11 as double) / cast(s01 as double))"
    g = "case when s00 > 0 and s01 > 0 then "
    return agg.select(
        "n_items", "s10", "s00", "s11", "s01",
        F.expr(f"{g}{l} end").alias("laspeyres"),
        F.expr(f"{g}{p} end").alias("paasche"),
        F.expr(f"{g}sqrt({l} * {p}) end").alias("fisher"),
    )


HHI_Q = 1 << 20


def hhi_index(
    df: DataFrame,
    entity: str,
    value: str,
) -> DataFrame:
    """Herfindahl-Hirschman concentration index (the antitrust /
    market-share number next to gini/hoover_index — sum of squared
    shares, 1/n diffuse .. 1 monopoly):

        HHI = sum_i (v_i / V)^2 = sum v_i^2 / V^2

    Exact integer sums; one IEEE division; also quantized to the
    2^-20 grid for exact thresholding. Output: (n, total, sum_sq,
    hhi_q, hhi).

    Scale: ONE entity agg + ONE fold. Bound: v_i^2 < 2^63.
    """
    q = HHI_Q
    per = df.groupBy(F.col(entity).alias("e")).agg(
        F.sum(F.col(value).cast("long")).alias("v")
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("total"),
        F.sum(F.expr("v * v")).alias("sum_sq"),
    )
    return agg.select(
        "n", "total", "sum_sq",
        F.expr(
            f"case when total > 0 then (sum_sq"
            f" * cast({q} as bigint)) div (total * total)"
            " else cast(0 as bigint) end"
        ).alias("hhi_q"),
        F.expr(
            "case when total > 0 then cast(sum_sq as double)"
            " / (cast(total as double) * cast(total as double))"
            " end"
        ).alias("hhi"),
    )


TWA_Q = 1 << 16


def two_way_anova(
    df: DataFrame,
    factor_a: str,
    factor_b: str,
    value: str,
) -> DataFrame:
    """Balanced two-way ANOVA decomposition (main effects +
    interaction + error sums of squares — the designed-experiment
    reading anova_f's one-way cannot give): with r replicates per
    (a, b) cell (balance enforced loudly),

        SSA = sum_a (T_a)^2/(b r) - T^2/N     [and SSB symmetric]
        SSAB = sum_cells (T_ab)^2/r - T^2/N - SSA - SSB
        SSE = sum x^2 - sum_cells (T_ab)^2/r

    Every squared-total-over-count rational quantizes by the
    split-division trick (exact int64 folds, Q = 2^16); the F
    ratios close as IEEE chains. Output: (a_levels, b_levels, r,
    ssa_q, ssb_q, ssab_q, sse_q, f_a, f_b, f_ab).

    Scale: ONE cell agg + two marginal rollups + folds.
    """
    q = TWA_Q
    base = df.select(
        F.col(factor_a).alias("fa"), F.col(factor_b).alias("fb"),
        F.col(value).cast("long").alias("v"),
    )
    cells = base.groupBy("fa", "fb").agg(
        F.count(F.lit(1)).cast("long").alias("r"),
        F.sum("v").alias("t_ab"),
        F.sum(F.expr("v * v")).alias("ss_ab"),
    )
    bal = cells.agg(
        F.countDistinct("r").alias("n_r"),
        F.max("r").alias("r"),
    ).collect()[0]
    if bal["n_r"] != 1:
        raise ValueError(
            "two_way_anova requires a BALANCED design (equal "
            "replicates per cell); densify or subsample first"
        )
    r = int(bal["r"])

    def _qdiv(d: str, nn: str) -> str:
        return (
            f"(({d}) div ({nn})) * cast({q} as bigint)"
            f" + ((({d}) % ({nn})) * cast({q} as bigint))"
            f" div ({nn})"
        )

    ta = cells.groupBy("fa").agg(F.sum("t_ab").alias("t_a"))
    tb = cells.groupBy("fb").agg(F.sum("t_ab").alias("t_b"))
    na = ta.agg(F.count(F.lit(1)).cast("long").alias("a_levels"))
    nb = tb.agg(F.count(F.lit(1)).cast("long").alias("b_levels"))
    tot = cells.agg(
        F.sum("t_ab").alias("t"), F.sum("ss_ab").alias("ssx"),
        F.sum("r").alias("n"),
    )
    j = (
        na.crossJoin(nb).crossJoin(F.broadcast(tot))
    )
    sa = (
        ta.crossJoin(F.broadcast(nb)).crossJoin(F.broadcast(tot))
        .agg(F.sum(F.expr(_qdiv("t_a * t_a",
                                f"b_levels * {r}"))).alias("sa_q"))
    )
    sb = (
        tb.crossJoin(F.broadcast(na)).crossJoin(F.broadcast(tot))
        .agg(F.sum(F.expr(_qdiv("t_b * t_b",
                                f"a_levels * {r}"))).alias("sb_q"))
    )
    sc = cells.agg(
        F.sum(F.expr(_qdiv("t_ab * t_ab", str(r)))).alias("sc_q")
    )
    out = (
        j.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(sc))
        .withColumn("ct_q", F.expr(_qdiv("t * t", "n")))
    )
    ssa = "(sa_q - ct_q)"
    ssb = "(sb_q - ct_q)"
    ssab = f"(sc_q - ct_q - {ssa} - {ssb})"
    sse = f"(ssx * cast({q} as bigint) - sc_q)"
    dfa = "(cast(a_levels as double) - 1.0e0)"
    dfb = "(cast(b_levels as double) - 1.0e0)"
    dfab = f"({dfa} * {dfb})"
    dfe = (
        "(cast(a_levels as double) * cast(b_levels as double)"
        f" * ({float(r)!r}e0 - 1.0e0))"
    )
    mse = f"(cast({sse} as double) / {dfe})"
    g = f"case when {mse} > 0.0e0 then "
    return out.select(
        "a_levels", "b_levels",
        F.lit(r).cast("long").alias("r"),
        F.expr(ssa).alias("ssa_q"),
        F.expr(ssb).alias("ssb_q"),
        F.expr(ssab).alias("ssab_q"),
        F.expr(sse).alias("sse_q"),
        F.expr(
            f"{g}(cast({ssa} as double) / {dfa}) / {mse} end"
        ).alias("f_a"),
        F.expr(
            f"{g}(cast({ssb} as double) / {dfb}) / {mse} end"
        ).alias("f_b"),
        F.expr(
            f"{g}(cast({ssab} as double) / {dfab}) / {mse} end"
        ).alias("f_ab"),
    )


def dixon_q(
    df: DataFrame,
    value: str,
) -> DataFrame:
    """Dixon's Q ratio for the extreme values (Dixon 1950 — the
    small-sample single-outlier screen grubbs_stat approximates
    with moments; this one uses pure order statistics):

        Q_low  = (x(2) - x(1)) / range
        Q_high = (x(n) - x(n-1)) / range

    Exact integer gaps/range; the two ratios one division each
    (NULL when range 0). Output: (n, gap_low, gap_high, range,
    q_low, q_high).

    Scale: one sort-window picking 4 order statistics.
    """
    w = Window.orderBy(F.col("v").asc(), F.col("__tb").asc())
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
    picks = base.where(
        F.expr("rn in (1, 2) or rn in (n - 1, n)")
    )
    agg = picks.groupBy("n").agg(
        F.min(F.expr("case when rn = 1 then v end")).alias("x1"),
        F.min(F.expr("case when rn = 2 then v end")).alias("x2"),
        F.min(F.expr("case when rn = n - 1 then v end"))
        .alias("xn1"),
        F.min(F.expr("case when rn = n then v end")).alias("xn"),
    )
    return agg.select(
        "n",
        F.expr("x2 - x1").alias("gap_low"),
        F.expr("xn - xn1").alias("gap_high"),
        F.expr("xn - x1").alias("range"),
        F.expr(
            "case when xn - x1 > 0 then"
            " cast(x2 - x1 as double)"
            " / cast(xn - x1 as double) end"
        ).alias("q_low"),
        F.expr(
            "case when xn - x1 > 0 then"
            " cast(xn - xn1 as double)"
            " / cast(xn - x1 as double) end"
        ).alias("q_high"),
    )


BWK_Q = 1 << 16


def bowker_test(
    df: DataFrame,
    before: str,
    after: str,
) -> DataFrame:
    """Bowker symmetry test (1948) — mcnemar's k-category
    generalization: did the before/after label DISTRIBUTION shift,
    judged only on the discordant cell pairs:

        chi2 = sum_{i<j} (n_ij - n_ji)^2 / (n_ij + n_ji)

    Each pair's rational quantizes by the split-division trick
    (exact order-invariant int64 fold, Q = 2^16); df = number of
    discordant pairs. Output: (n, n_pairs, chi2_q, chi2).

    Scale: ONE (i, j) contingency agg + a canonical-pair self-join
    over the tiny k^2 table.
    """
    q = BWK_Q
    base = df.select(
        F.col(before).alias("i"), F.col(after).alias("j")
    )
    cells = base.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = cells.select(F.col("i").alias("x"), F.col("j").alias("y"),
                     F.col("c").alias("n_xy"))
    b = cells.select(F.col("j").alias("x"), F.col("i").alias("y"),
                     F.col("c").alias("n_yx"))
    pairs = (
        a.join(b, on=["x", "y"], how="full_outer")
        .where(F.col("x") < F.col("y"))
        .select(
            F.expr("coalesce(n_xy, cast(0 as bigint))")
            .alias("nij"),
            F.expr("coalesce(n_yx, cast(0 as bigint))")
            .alias("nji"),
        )
        .where(F.col("nij") + F.col("nji") > 0)
    )
    term = "((nij - nji) * (nij - nji))"
    den = "(nij + nji)"
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.expr(
                f"(({term}) div ({den})) * cast({q} as bigint)"
                f" + ((({term}) % ({den}))"
                f" * cast({q} as bigint)) div ({den})"
            )
        ).alias("chi2_q"),
    )
    n_df = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return n_df.crossJoin(F.broadcast(agg)).select(
        "n", "n_pairs", "chi2_q",
        F.expr(
            f"cast(chi2_q as double) / {float(q)!r}e0"
        ).alias("chi2"),
    )


def yules_q(
    df: DataFrame,
    x: str,
    y: str,
) -> DataFrame:
    """Yule's Q association for two binary indicators (1900) — the
    odds-ratio rescaled to [-1, 1] (the 2x2 counterpart of
    kendall_tau's gamma; NOT the vocabulary yules_k):

        Q = (ad - bc) / (ad + bc)

    Exact integer cell products; one division (NULL when ad + bc =
    0). Output: (a, b, c, d, q).

    Scale: ONE conditional agg.
    """
    base = df.select(
        F.col(x).cast("int").alias("xv"),
        F.col(y).cast("int").alias("yv"),
    )
    agg = base.agg(
        F.sum(F.expr("case when xv = 1 and yv = 1 then 1"
                     " else 0 end")).cast("long").alias("a"),
        F.sum(F.expr("case when xv = 1 and yv = 0 then 1"
                     " else 0 end")).cast("long").alias("b"),
        F.sum(F.expr("case when xv = 0 and yv = 1 then 1"
                     " else 0 end")).cast("long").alias("c"),
        F.sum(F.expr("case when xv = 0 and yv = 0 then 1"
                     " else 0 end")).cast("long").alias("d"),
    )
    return agg.select(
        "a", "b", "c", "d",
        F.expr(
            "case when a * d + b * c > 0 then"
            " cast(a * d - b * c as double)"
            " / cast(a * d + b * c as double) end"
        ).alias("q"),
    )


def qn_scale(
    df: DataFrame,
    value: str,
) -> DataFrame:
    """Rousseeuw-Croux Qn robust scale (1993) — the 50%-breakdown
    scale estimator that, unlike MAD, needs no location and stays
    efficient (82%) at the normal: the k-th ORDER STATISTIC of all
    pairwise distances,

        Qn_raw = {|x_i - x_j| : i < j}_(k),  k = C(h, 2),
        h = n div 2 + 1

    (the 2.2219 normal-consistency factor is the caller's
    multiply). Exact integer distances and rank pick (ties
    value-identical). Output: (n, k_pick, qn_raw).

    O(n^2) pairs — the oracle-exact small-n path (filter first,
    like kendall_tau / siegel_slope).
    """
    a = df.select(F.col(value).cast("long").alias("xa")) \
        .withColumn("ia", F.monotonically_increasing_id())
    b = df.select(F.col(value).cast("long").alias("xb")) \
        .withColumn("ib", F.monotonically_increasing_id())
    pairs = a.join(b, F.col("ia") < F.col("ib")).select(
        F.expr("abs(xa - xb)").alias("d")
    )
    w = Window.orderBy(F.col("d").asc())
    ranked = pairs.withColumn(
        "rn", F.row_number().over(w).cast("long")
    )
    n_df = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    k_df = n_df.select(
        "n",
        F.expr(
            "((n div 2 + 1) * (n div 2)) div 2"
        ).alias("k_pick"),
    )
    return (
        ranked.crossJoin(F.broadcast(k_df))
        .where(F.col("rn") == F.col("k_pick"))
        .select("n", "k_pick", F.col("d").alias("qn_raw"))
    )


def shorth_location(
    df: DataFrame,
    value: str,
) -> DataFrame:
    """Shorth (shortest-half) location (Andrews et al. 1972; the
    LMS-flavored mode-seeking center): the midpoint of the
    SHORTEST interval containing h = n div 2 + 1 sorted points —
    immune to half the data being garbage, and it finds the bulk
    where mean/median drift:

        width_i = x(i + h - 1) - x(i),  pick min width
        (ties: smallest i), 2 * shorth = x(i*) + x(i* + h - 1)

    Exact integers (doubled midpoint). Output: (n, h, i_star,
    width, shorth2).

    Scale: one sort-window + a lead(h-1) pass + two deterministic
    folds.
    """
    w = Window.orderBy(F.col("v").asc(), F.col("__tb").asc())
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
    # the window offset depends on n, so pair ranks by JOIN
    # (rn_hi = rn + h - 1) instead of a lead()
    hi = base.select(F.col("rn").alias("rn_hi"),
                     F.col("v").alias("v_hi"))
    lead = base.withColumn("h", F.expr("n div 2 + 1")).join(
        hi,
        F.col("rn_hi") == F.col("rn") + F.col("h") - 1,
    ).select(
        "rn", "n", "h",
        (F.col("v_hi") - F.col("v")).alias("width"),
        (F.col("v_hi") + F.col("v")).alias("mid2"),
    )
    mn = lead.agg(F.min("width").alias("w_min"))
    best = (
        lead.crossJoin(F.broadcast(mn))
        .where(F.col("width") == F.col("w_min"))
        .groupBy("n", "h", "w_min")
        .agg(F.min("rn").alias("i_star"))
    )
    at = lead.select(F.col("rn").alias("i_star"),
                     F.col("mid2").alias("shorth2"))
    return best.join(at, on="i_star").select(
        "n", "h", "i_star", F.col("w_min").alias("width"),
        "shorth2",
    )


def mood_median(
    df: DataFrame,
    group: str,
    value: str,
) -> DataFrame:
    """Mood's median test across k groups (the bluntest but most
    assumption-free location test: does each group straddle the
    GRAND median the same way?): counts above/at-or-below the
    pooled lower median per group, then the chi-square over the
    2xk table:

        chi2 = sum_cells (O - E)^2 / E,  E from the margins

    The grand median is the exact order statistic (n+1) div 2 by
    (value, tiebreak) order; counts are exact; per-cell terms
    quantize 2^-16 before the order-invariant fold. Output per
    run: (n, k, grand_med, chi2_q, chi2).

    Scale: one sort-window for the median + ONE (group) agg +
    tiny folds.
    """
    q = 1 << 16
    w = Window.orderBy(F.col("v").asc(), F.col("__tb").asc())
    base = (
        df.select(
            F.col(group).alias("g"),
            F.col(value).cast("long").alias("v"),
            F.monotonically_increasing_id().alias("__tb"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy()))
        .drop("__tb")
    )
    med = base.where(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select(F.col("v").alias("gm"))
    j = base.crossJoin(F.broadcast(med))
    per = j.groupBy("g").agg(
        F.sum(F.expr("case when v > gm then 1 else 0 end"))
        .cast("long").alias("above"),
        F.sum(F.expr("case when v <= gm then 1 else 0 end"))
        .cast("long").alias("below"),
    )
    tot = per.agg(
        F.sum("above").alias("ta"), F.sum("below").alias("tb"),
        F.sum(F.expr("above + below")).alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    cells = per.crossJoin(F.broadcast(tot))

    def _term(o: str, m: str) -> str:
        # (O - E)^2/E with E = m * n_g / n, folded exactly:
        # (O n - m n_g)^2 / (m n_g n) quantized by split division
        d = f"(({o}) * n - ({m}) * (above + below))"
        den = f"(({m}) * (above + below) * n)"
        return (
            f"(({d} * {d}) div {den}) * cast({q} as bigint)"
            f" + ((({d} * {d}) % {den})"
            f" * cast({q} as bigint)) div {den}"
        )

    agg = cells.groupBy("n", "k").agg(
        F.sum(
            F.expr(_term("above", "ta"))
        ).alias("qa"),
        F.sum(
            F.expr(_term("below", "tb"))
        ).alias("qb"),
    )
    out = agg.crossJoin(F.broadcast(med))
    return out.select(
        "n", "k", F.col("gm").alias("grand_med"),
        F.expr("qa + qb").alias("chi2_q"),
        F.expr(
            f"cast(qa + qb as double) / {float(q)!r}e0"
        ).alias("chi2"),
    )


IG_Q = 1 << 10


def info_gain(
    df: DataFrame,
    feature: str,
    label: str,
) -> DataFrame:
    """Information gain + symmetric uncertainty of a categorical
    feature about a label (the decision-tree / feature-selection
    score; gini_split's entropy sibling):

        IG = H(y) - sum_v p(v) H(y | v),
        SU = 2 IG / (H(x) + H(y))

    Every entropy term is ln of an exact integer count ratio
    quantized to the 2^-10 grid (the markov_entropy_rate
    convention), accumulated as count-weighted int64 sums; the
    closing chains are single divisions. Output: (n, hx_q, hy_q,
    hxy_q, ig, su).

    Scale: ONE (feature, label) agg + two marginal rollups.
    """
    q = float(IG_Q)
    base = df.select(
        F.col(feature).alias("x"), F.col(label).alias("y")
    )
    nxy = base.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    nx = nxy.groupBy("x").agg(F.sum("c").alias("cx"))
    ny = nxy.groupBy("y").agg(F.sum("c").alias("cy"))
    n_df = nxy.agg(F.sum("c").alias("n"))

    def _hsum(cnts: DataFrame, col: str) -> DataFrame:
        return (
            cnts.crossJoin(F.broadcast(n_df))
            .select(
                F.expr(
                    f"{col} * cast(floor(ln(cast(n as double)"
                    f" / cast({col} as double))"
                    f" * {q!r}e0 + 0.5e0) as bigint)"
                ).alias("t")
            )
            .agg(F.sum("t").alias("hq"))
        )

    hx = _hsum(nx, "cx").withColumnRenamed("hq", "hx_q")
    hy = _hsum(ny, "cy").withColumnRenamed("hq", "hy_q")
    hxy = _hsum(nxy, "c").withColumnRenamed("hq", "hxy_q")
    out = (
        n_df.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(hxy))
    )
    nf = "cast(n as double)"
    # IG = H(x) + H(y) - H(x,y)  (mutual information identity)
    ig = (
        f"((cast(hx_q as double) + cast(hy_q as double)"
        f" - cast(hxy_q as double)) / ({nf} * {q!r}e0))"
    )
    su = (
        f"(2.0e0 * (cast(hx_q as double) + cast(hy_q as double)"
        " - cast(hxy_q as double))"
        " / (cast(hx_q as double) + cast(hy_q as double)))"
    )
    return out.select(
        "n", "hx_q", "hy_q", "hxy_q",
        F.expr(f"case when n > 0 then {ig} end").alias("ig"),
        F.expr(
            f"case when hx_q + hy_q > 0 then {su} end"
        ).alias("su"),
    )


def attributable_fraction(
    df: DataFrame,
    exposed: str,
    case: str,
) -> DataFrame:
    """Population attributable fraction (Levin 1953) — the public-
    health "how much disease would vanish if the exposure did"
    number, straight from the 2x2 (odds_ratio's policy-facing
    sibling):

        PAF = (p_case_total - p_case_unexposed) / p_case_total
            = 1 - (c/(c+d)) / ((a+c)/n)

    carried as the exact integer cross-multiplication
    1 - c*n / ((c+d)(a+c)). Output: (a, b, c, d, paf).

    Scale: ONE conditional agg.
    """
    base = df.select(
        F.col(exposed).cast("int").alias("e"),
        F.col(case).cast("int").alias("y"),
    )
    agg = base.agg(
        F.sum(F.expr("case when e = 1 and y = 1 then 1"
                     " else 0 end")).cast("long").alias("a"),
        F.sum(F.expr("case when e = 1 and y = 0 then 1"
                     " else 0 end")).cast("long").alias("b"),
        F.sum(F.expr("case when e = 0 and y = 1 then 1"
                     " else 0 end")).cast("long").alias("c"),
        F.sum(F.expr("case when e = 0 and y = 0 then 1"
                     " else 0 end")).cast("long").alias("d"),
    )
    return agg.select(
        "a", "b", "c", "d",
        F.expr(
            "case when c + d > 0 and a + c > 0 then"
            " 1.0e0 - (cast(c as double)"
            " * cast(a + b + c + d as double))"
            " / (cast(c + d as double) * cast(a + c as double))"
            " end"
        ).alias("paf"),
    )


def poisson_funnel(
    df: DataFrame,
    entity: str,
    events_col: str,
    exposure: str,
) -> DataFrame:
    """Poisson funnel-plot limits for RATES with exposure (the
    count-data sibling of funnel_limits — incident counts over
    person-time / crawl-hours per entity):

        limit_i = r_pool -+ 1.96 sqrt(r_pool / t_i)

    Exact pooled tallies; per-entity limits and the outside flag
    are row-local IEEE chains. Output per entity: (entity, o_i,
    t_i, rate, lo, hi, flag).

    Scale: ONE entity agg + broadcast pooled totals.
    """
    base = df.select(
        F.col(entity).alias("e"),
        F.col(events_col).cast("long").alias("o"),
        F.col(exposure).cast("long").alias("t"),
    )
    per = base.groupBy("e").agg(
        F.sum("o").alias("o_i"), F.sum("t").alias("t_i")
    )
    pool = per.agg(
        F.sum("o_i").alias("os"), F.sum("t_i").alias("ts")
    )
    j = per.crossJoin(F.broadcast(pool))
    rp = "(cast(os as double) / cast(ts as double))"
    w = f"(1.96e0 * sqrt({rp} / cast(t_i as double)))"
    rate = "(cast(o_i as double) / cast(t_i as double))"
    return j.select(
        "e", "o_i", "t_i",
        F.expr(f"case when t_i > 0 then {rate} end").alias("rate"),
        F.expr(
            f"case when t_i > 0 and ts > 0 then {rp} - {w} end"
        ).alias("lo"),
        F.expr(
            f"case when t_i > 0 and ts > 0 then {rp} + {w} end"
        ).alias("hi"),
        F.expr(
            f"cast(case when t_i > 0 and ts > 0 then"
            f" case when {rate} < {rp} - {w}"
            f" or {rate} > {rp} + {w} then 1 else 0 end end"
            " as int)"
        ).alias("flag"),
    )


GEO_Q = 1 << 10


def geometric_stats(
    df: DataFrame,
    key: str,
    value: str,
) -> DataFrame:
    """Geometric mean and geometric standard deviation per key
    (the RIGHT average for ratios, durations and multiplicative
    metrics — latency percent changes, growth factors; arithmetic
    means overstate them):

        gm  = exp(mean ln v),  gsd = exp(sd ln v)

    Each ln v quantizes to the 2^-10 grid (zipf convention), so
    the log moments are exact int64; gm/gsd round(6) through exp.
    Requires v >= 1 (shift or filter first; rows with v < 1 are
    dropped and counted). Output per key: (key, n, n_dropped,
    ln_q_sum, gm_r, gsd_r).

    Scale: ONE hash agg.
    """
    q = float(GEO_Q)
    base = df.select(
        F.col(key).alias("k"),
        F.col(value).cast("long").alias("v"),
    )
    kept = base.where(F.col("v") >= 1).select(
        "k",
        F.expr(
            "cast(floor(ln(cast(v as double))"
            f" * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("lq"),
    )
    dropped = base.where(F.col("v") < 1).groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_dropped")
    )
    agg = kept.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lq").alias("ln_q_sum"),
        F.sum(F.expr("lq * lq")).alias("ln2_q_sum"),
    )
    j = agg.join(dropped, on="k", how="left").select(
        "k", "n",
        F.expr("coalesce(n_dropped, cast(0 as bigint))")
        .alias("n_dropped"),
        "ln_q_sum", "ln2_q_sum",
    )
    mean = f"(cast(ln_q_sum as double) / (cast(n as double) * {q!r}e0))"
    var = (
        "((cast(n as double) * cast(ln2_q_sum as double)"
        " - cast(ln_q_sum as double) * cast(ln_q_sum as double))"
        " / (cast(n as double) * (cast(n as double) - 1.0e0)"
        f" * {q!r}e0 * {q!r}e0))"
    )
    return j.select(
        "k", "n", "n_dropped", "ln_q_sum",
        F.expr(
            f"case when n > 0 then round(exp({mean}), 6)"
            " + 0.0e0 end"
        ).alias("gm_r"),
        F.expr(
            f"case when n > 1 and {var} >= 0.0e0 then"
            f" round(exp(sqrt({var})), 6) + 0.0e0 end"
        ).alias("gsd_r"),
    )


def local_geary(
    cells: DataFrame,
    res: int,
    cell: str = "cell",
    value: str = "x",
) -> DataFrame:
    """Local Geary's c per cell (Anselin 1995) — the LISA family's
    dissimilarity member (local_morans_i flags clusters of similar
    DEVIATION; this flags cells UNLIKE their neighbors — edges,
    lone hotspots):

        c_i = n * sum_{j in ring1(i)} (d_i - d_j)^2 / sum d^2

    on the shared n-scaled integer deviation grid (the geary_c /
    local_morans_i algebra localized). Output per cell: (cell,
    n_i, num_i, c_local).

    Scale: the morans_i ring-1 plan with a per-cell group key.
    """
    from pdal_spark.operators.h3 import grid_disk

    base = cells.select(
        F.col(cell).alias("c"),
        F.col(value).cast("long").alias("xv"),
    )
    mom = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("xv").alias("s")
    )
    d = base.crossJoin(F.broadcast(mom)).select(
        "c", F.expr("n * xv - s").alias("d"), "n"
    )
    sd2 = d.agg(F.sum(F.expr("d * d")).alias("sum_d2"))
    nbrs = (
        grid_disk(d.select("c"), "c", res=res, k=1,
                  out="nc", ring_out="ring")
        .where(F.col("ring") == 1)
        .select("c", "nc")
    )
    pairs = (
        nbrs.join(d.select(F.col("c").alias("nc"),
                           F.col("d").alias("dj")), on="nc")
        .join(d.select("c", F.col("d").alias("di"), "n"), on="c")
    )
    per = pairs.groupBy("c", "n").agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum(
            F.expr("(di - dj) * (di - dj)")
        ).alias("num_i"),
    )
    return per.crossJoin(F.broadcast(sd2)).select(
        "c", "n_i", "num_i",
        F.expr(
            "case when sum_d2 > 0 then"
            " cast(n as double) * cast(num_i as double)"
            " / cast(sum_d2 as double) end"
        ).alias("c_local"),
    )


def primacy_index(
    df: DataFrame,
    entity: str,
    value: str,
) -> DataFrame:
    """Urban primacy index (Jefferson 1939 law-of-the-primate-city
    form): the largest entity's share of the top-4 total —
    rank-size structure in one number (pairs with zipf_fit's slope
    and hhi_index's overall concentration):

        primacy = v(1) / (v(1) + v(2) + v(3) + v(4))

    Exact order statistics by (value DESC, entity ASC). Output:
    (n, v1, top4_sum, primacy).

    Scale: one entity agg + one sort-window rank filter.
    """
    per = df.groupBy(F.col(entity).alias("e")).agg(
        F.sum(F.col(value).cast("long")).alias("v")
    )
    w = Window.orderBy(F.col("v").desc(), F.col("e").asc())
    ranked = per.withColumn(
        "rn", F.row_number().over(w).cast("long")
    ).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    top = ranked.where(F.col("rn") <= 4)
    agg = top.agg(
        F.max("n").alias("n"),
        F.max(F.expr("case when rn = 1 then v end")).alias("v1"),
        F.sum("v").alias("top4_sum"),
    )
    return agg.select(
        "n", "v1", "top4_sum",
        F.expr(
            "case when top4_sum > 0 then cast(v1 as double)"
            " / cast(top4_sum as double) end"
        ).alias("primacy"),
    )


def shift_function(
    df_a: DataFrame,
    df_b: DataFrame,
    value: str,
    pcts: list[int] | None = None,
) -> DataFrame:
    """Doksum shift function at fixed quantile points (1974): the
    per-quantile difference q_b(p) - q_a(p) — WHERE along the
    distribution group B exceeds A (a mean shift is one number;
    the shift function is the whole story: tails vs middle).
    Quantiles are exact lower order statistics at rank
    ceil(p n / 100) by (value, tiebreak) order. Output per p:
    (p, q_a, q_b, shift).

    Scale: two sort-windows + rank filters + an equi-join on p.
    """
    pp = sorted(int(p) for p in (pcts or [10, 25, 50, 75, 90]))

    def _q(d: DataFrame, out: str) -> DataFrame:
        w = Window.orderBy(F.col("v").asc(), F.col("__tb").asc())
        base = (
            d.select(
                F.col(value).cast("long").alias("v"),
                F.monotonically_increasing_id().alias("__tb"),
            )
            .withColumn("rn", F.row_number().over(w).cast("long"))
            .withColumn("n", F.count(F.lit(1)).over(
                Window.partitionBy()))
            .drop("__tb")
        )
        return base.select(
            "v", "rn", "n",
            F.explode(F.array(*[F.lit(p) for p in pp]))
            .alias("p"),
        ).where(
            F.expr("rn = (p * n + 99) div 100")
        ).select(F.col("p").cast("long").alias("p"),
                 F.col("v").alias(out))

    qa = _q(df_a, "q_a")
    qb = _q(df_b, "q_b")
    return qa.join(qb, on="p").select(
        "p", "q_a", "q_b",
        (F.col("q_b") - F.col("q_a")).alias("shift"),
    )


def sign_test(
    df: DataFrame,
    x: str,
    y: str,
) -> DataFrame:
    """Paired sign test (the assumption-free paired comparison —
    wilcoxon without even the symmetry assumption): count pairs
    where x > y vs x < y (ties dropped), and the normal-
    approximation z with continuity correction:

        z = (|n_pos - n_neg| - 1) / sqrt(n_pos + n_neg)

    Exact tallies; one IEEE chain (NULL when no untied pairs).
    Output: (n, n_pos, n_neg, n_tie, z).

    Scale: ONE conditional agg.
    """
    base = df.select(
        (F.col(x).cast("long") - F.col(y).cast("long")).alias("d")
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("case when d > 0 then 1 else 0 end"))
        .cast("long").alias("n_pos"),
        F.sum(F.expr("case when d < 0 then 1 else 0 end"))
        .cast("long").alias("n_neg"),
        F.sum(F.expr("case when d = 0 then 1 else 0 end"))
        .cast("long").alias("n_tie"),
    )
    return agg.select(
        "n", "n_pos", "n_neg", "n_tie",
        F.expr(
            "case when n_pos + n_neg > 0 then"
            " (cast(abs(n_pos - n_neg) as double) - 1.0e0)"
            " / sqrt(cast(n_pos + n_neg as double)) end"
        ).alias("z"),
    )


def cv_mean_ratio(
    df: DataFrame,
    key: str,
    value: str,
) -> DataFrame:
    """Coefficient of variation + signal-to-noise per key (the
    relative-dispersion pair every metric dashboard wants next to
    the mean):

        cv = sd / mean,  snr = mean / sd    [sample sd]

    Exact integer moments; both one IEEE chain (NULL when mean or
    sd is 0). Output per key: (key, n, s, ss, cv, snr).

    Scale: ONE hash agg.
    """
    base = df.select(
        F.col(key).alias("k"),
        F.col(value).cast("long").alias("v"),
    )
    agg = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.expr("v * v")).alias("ss"),
    )
    sd = (
        "sqrt((cast(n as double) * cast(ss as double)"
        " - cast(s as double) * cast(s as double))"
        " / (cast(n as double) * (cast(n as double) - 1.0e0)))"
    )
    mean = "(cast(s as double) / cast(n as double))"
    return agg.select(
        "k", "n", "s", "ss",
        F.expr(
            f"case when n > 1 and {mean} <> 0.0e0 then"
            f" {sd} / {mean} end"
        ).alias("cv"),
        F.expr(
            f"case when n > 1 and {sd} > 0.0e0 then"
            f" {mean} / {sd} end"
        ).alias("snr"),
    )


def midhinge_iqr(
    df: DataFrame,
    key: str,
    value: str,
) -> DataFrame:
    """Quartile location/scale summary per key: midhinge
    ((Q1 + Q3)/2 — the outlier-proof center Tukey preferred to the
    mean) and the IQR, from exact lower order statistics at ranks
    ceil(n/4) and ceil(3n/4) by (value, tiebreak) order — doubled
    so everything stays int64. Output per key: (key, n, q1, q3,
    midhinge2, iqr).

    Scale: one per-key sort-window + rank filters.
    """
    w = Window.partitionBy("k").orderBy(
        F.col("v").asc(), F.col("__tb").asc()
    )
    base = (
        df.select(
            F.col(key).alias("k"),
            F.col(value).cast("long").alias("v"),
            F.monotonically_increasing_id().alias("__tb"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn(
            "n",
            F.count(F.lit(1)).over(Window.partitionBy("k")),
        )
        .drop("__tb")
    )
    picks = base.where(
        F.expr("rn = (n + 3) div 4 or rn = (3 * n + 3) div 4")
    )
    agg = picks.groupBy("k", "n").agg(
        F.min(
            F.expr("case when rn = (n + 3) div 4 then v end")
        ).alias("q1"),
        F.min(
            F.expr("case when rn = (3 * n + 3) div 4 then v end")
        ).alias("q3"),
    )
    return agg.select(
        "k", "n", "q1",
        F.expr("coalesce(q3, q1)").alias("q3"),
        F.expr("q1 + coalesce(q3, q1)").alias("midhinge2"),
        F.expr("coalesce(q3, q1) - q1").alias("iqr"),
    )


def nps_score(
    df: DataFrame,
    score: str,
) -> DataFrame:
    """Net Promoter Score with a Wald interval (the survey-metric
    staple: promoters 9-10, passives 7-8, detractors 0-6):

        nps = (P - D) / n
        se  = sqrt((P/n + D/n - nps^2) / n)

    Exact tallies; one IEEE chain each (the variance is of the
    +1/0/-1 scoring). Output: (n, promoters, passives,
    detractors, nps, lo, hi).

    Scale: ONE conditional agg.
    """
    base = df.select(F.col(score).cast("long").alias("v"))
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("case when v >= 9 then 1 else 0 end"))
        .cast("long").alias("promoters"),
        F.sum(F.expr("case when v >= 7 and v <= 8 then 1"
                     " else 0 end"))
        .cast("long").alias("passives"),
        F.sum(F.expr("case when v <= 6 then 1 else 0 end"))
        .cast("long").alias("detractors"),
    )
    nps = (
        "(cast(promoters - detractors as double)"
        " / cast(n as double))"
    )
    se = (
        "sqrt((cast(promoters as double) / cast(n as double)"
        " + cast(detractors as double) / cast(n as double)"
        f" - {nps} * {nps}) / cast(n as double))"
    )
    return agg.select(
        "n", "promoters", "passives", "detractors",
        F.expr(f"case when n > 0 then {nps} end").alias("nps"),
        F.expr(
            f"case when n > 1 then {nps} - 1.96e0 * {se} end"
        ).alias("lo"),
        F.expr(
            f"case when n > 1 then {nps} + 1.96e0 * {se} end"
        ).alias("hi"),
    )


def interquartile_mean(
    df: DataFrame,
    key: str,
    value: str,
) -> DataFrame:
    """Interquartile mean per key (the olympic-scoring robust
    location: the mean of the middle 50% by rank — trimmed_mean's
    fixed-25% sibling on EXACT rank bounds):

        IQM = sum of v at ranks (floor(n/4), 3*floor(n/4)] / count

    Exact integer sums over the deterministic (value, tiebreak)
    rank range. Output per key: (key, n, n_kept, sum_kept, iqm).

    Scale: one per-key sort-window + one agg.
    """
    w = Window.partitionBy("k").orderBy(
        F.col("v").asc(), F.col("__tb").asc()
    )
    base = (
        df.select(
            F.col(key).alias("k"),
            F.col(value).cast("long").alias("v"),
            F.monotonically_increasing_id().alias("__tb"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn(
            "n",
            F.count(F.lit(1)).over(Window.partitionBy("k")),
        )
        .drop("__tb")
    )
    kept = base.where(
        F.expr("rn > n div 4 and rn <= 3 * (n div 4)")
    )
    agg = kept.groupBy("k").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("v").alias("sum_kept"),
    )
    return agg.select(
        "k", "n", "n_kept", "sum_kept",
        F.expr(
            "case when n_kept > 0 then cast(sum_kept as double)"
            " / cast(n_kept as double) end"
        ).alias("iqm"),
    )


BCD_Q = 1 << 10


def box_counting_dimension(
    cells: DataFrame,
    res: int,
    coarser: list[int],
    cell: str = "cell",
) -> DataFrame:
    """Box-counting (Minkowski) fractal dimension of an occupied-
    cell pattern: occupied-box counts N(r) across the resolution
    ladder, and the log-log OLS slope

        D = - d ln N / d ln s      [s = box size; slope against
                                    resolution level is +D ln 2]

    Counts come from cell-pyramid parent rollups (exact); each
    ln N(r) quantizes to the 2^-10 grid so the tiny OLS over the
    ladder is exact int64 (the zipf_fit discipline; x = res level,
    already integer). Output: one row (n_levels, num, den,
    dimension) with dimension = num/den/ln2 folded as literals.

    Scale: |ladder| parent rollups + a |ladder|-row OLS.
    """
    import math

    from pdal_spark import sqlgen as G
    from pdal_spark.sqlgen import SPARK

    q = float(BCD_Q)
    levels = sorted({int(res), *(int(r) for r in coarser)})
    outs = []
    for r in levels:
        if r == res:
            cnt = cells.select(F.col(cell).alias("c")).distinct() \
                .agg(F.count(F.lit(1)).cast("long").alias("nb"))
        else:
            cnt = cells.select(
                F.expr(
                    G.qcell_parent(cell, int(res), r, SPARK)
                ).alias("p")
            ).distinct().agg(
                F.count(F.lit(1)).cast("long").alias("nb")
            )
        outs.append(cnt.select(
            F.lit(r).cast("long").alias("lvl"), "nb"
        ))
    ladder = outs[0]
    for o in outs[1:]:
        ladder = ladder.unionByName(o)
    pts = ladder.select(
        "lvl",
        F.expr(
            "cast(floor(ln(cast(nb as double))"
            f" * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("y_q"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_levels"),
        F.sum("lvl").alias("sx"),
        F.sum("y_q").alias("sy"),
        F.sum(F.expr("lvl * y_q")).alias("sxy"),
        F.sum(F.expr("lvl * lvl")).alias("sxx"),
    )
    ln2q = G.fnum(math.log(2.0) * q)
    return mom.select(
        "n_levels",
        F.expr("n_levels * sxy - sx * sy").alias("num"),
        F.expr("n_levels * sxx - sx * sx").alias("den"),
        F.expr(
            "case when n_levels * sxx - sx * sx <> 0 then"
            " cast(n_levels * sxy - sx * sy as double)"
            " / cast(n_levels * sxx - sx * sx as double)"
            f" / {ln2q} end"
        ).alias("dimension"),
    )


def radial_profile(
    df: DataFrame,
    x: str,
    y: str,
    band_q: int,
    n_bands: int = 6,
) -> DataFrame:
    """Radial density profile around the integer mean center (the
    urban-density-gradient / blast-radius readout: counts per
    concentric distance band). Band membership compares the
    n-scaled integer squared distance against squared band edges —
    no sqrt, no float (the semivariogram discipline around a
    CENTER instead of pairs). Output per band: (band, n_points).

    Scale: ONE moment pass + one row-local band explode + agg.
    """
    bq, nb = int(band_q), int(n_bands)
    base = df.select(
        F.col(x).cast("long").alias("px"),
        F.col(y).cast("long").alias("py"),
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("px").alias("sx"), F.sum("py").alias("sy"),
    )
    j = base.crossJoin(F.broadcast(mom)).select(
        F.expr(
            "(n * px - sx) * (n * px - sx)"
            " + (n * py - sy) * (n * py - sy)"
        ).alias("d2n"),
        "n",
    )
    banded = j.select(
        "d2n", "n",
        F.explode(F.array(*[F.lit(b) for b in range(nb)]))
        .alias("band"),
    ).where(
        # band b: b*bq <= d/n < (b+1)*bq  (n-scaled squared edges)
        F.expr(
            f"d2n >= band * band * cast({bq * bq} as bigint)"
            " * n * n"
        )
        & F.expr(
            f"d2n < (band + 1) * (band + 1)"
            f" * cast({bq * bq} as bigint) * n * n"
        )
    )
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    ).select(F.col("band").cast("long").alias("band"), "n_points")


DD_Q = 1 << 10


def distance_decay(
    flows: DataFrame,
    flow: str,
    d2: str,
) -> DataFrame:
    """Distance-decay exponent of spatial interaction (the gravity
    model's beta: ln flow = a - beta ln d): OLS of ln(flow) on
    ln(d) over observed OD pairs, both logs quantized to the
    2^-10 grid (zipf_fit discipline; d enters as SQUARED distance
    so beta doubles — folded back at the end). Output: (n_pairs,
    num, den, beta).

    Scale: row-local quantization + ONE moment agg.
    """
    q = float(DD_Q)
    base = flows.select(
        F.col(flow).cast("long").alias("f"),
        F.col(d2).cast("long").alias("dd"),
    ).where((F.col("f") >= 1) & (F.col("dd") >= 1))
    pts = base.select(
        F.expr(
            "cast(floor(ln(cast(dd as double))"
            f" * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("x_q"),
        F.expr(
            "cast(floor(ln(cast(f as double))"
            f" * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("y_q"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x_q").alias("sx"), F.sum("y_q").alias("sy"),
        F.sum(F.expr("x_q * y_q")).alias("sxy"),
        F.sum(F.expr("x_q * x_q")).alias("sxx"),
    )
    return mom.select(
        "n_pairs",
        F.expr("n_pairs * sxy - sx * sy").alias("num"),
        F.expr("n_pairs * sxx - sx * sx").alias("den"),
        # slope against ln d2 = ln d^2 -> beta = -2 * slope
        F.expr(
            "case when n_pairs * sxx - sx * sx <> 0 then"
            " -2.0e0 * cast(n_pairs * sxy - sx * sy as double)"
            " / cast(n_pairs * sxx - sx * sx as double) end"
        ).alias("beta"),
    )


HAN_Q = 1 << 20


def hansen_access(
    demand: DataFrame,
    supply: DataFrame,
    id_demand: str,
    x: str,
    y: str,
    weight: str,
) -> DataFrame:
    """Hansen accessibility index (1959) with inverse-square decay
    — per demand point, the distance-discounted opportunity mass
    (two_sfca's unconstrained ancestor; THE access-to-jobs/
    services measure):

        A_i = sum_j O_j / d2_ij       [d2 >= 1 clamped]

    Each term quantizes exactly as (O_j * 2^20) div max(d2, 1) —
    order-invariant int64 folds. Output per demand point: (i,
    n_supply, a_q, access).

    O(n_d * n_s) pairs — bounded sets by construction (the
    p_median_greedy contract); at scale pre-filter by radius with
    the bounded-pair generators.
    """
    q = HAN_Q
    d = demand.select(
        F.col(id_demand).alias("i"),
        F.col(x).cast("long").alias("dx"),
        F.col(y).cast("long").alias("dy"),
    )
    s = supply.select(
        F.col(x).cast("long").alias("sx2"),
        F.col(y).cast("long").alias("sy2"),
        F.col(weight).cast("long").alias("o"),
    )
    pairs = d.crossJoin(F.broadcast(s)).select(
        "i",
        F.expr(
            f"(o * cast({q} as bigint))"
            " div greatest((dx - sx2) * (dx - sx2)"
            " + (dy - sy2) * (dy - sy2), cast(1 as bigint))"
        ).alias("t"),
    )
    agg = pairs.groupBy("i").agg(
        F.count(F.lit(1)).cast("long").alias("n_supply"),
        F.sum("t").alias("a_q"),
    )
    return agg.select(
        "i", "n_supply", "a_q",
        F.expr(
            f"cast(a_q as double) / {float(q)!r}e0"
        ).alias("access"),
    )


def migration_effectiveness(
    flows: DataFrame,
    origin: str,
    dest: str,
    count: str,
) -> DataFrame:
    """Migration effectiveness index per zone (the demography
    standard: how one-directional is a zone's exchange —
    |net| / gross, 0 churn .. 1 pure gain/loss; od_flows'
    analytical readout):

        mei_z = |in_z - out_z| / (in_z + out_z)

    Exact integer flow sums (self-flows excluded). Output per
    zone: (zone, inflow, outflow, net, gross, mei).

    Scale: two keyed aggs + one full-outer join.
    """
    base = flows.select(
        F.col(origin).alias("o"), F.col(dest).alias("d"),
        F.col(count).cast("long").alias("c"),
    ).where(F.col("o") != F.col("d"))
    outf = base.groupBy(F.col("o").alias("zone")).agg(
        F.sum("c").alias("outflow")
    )
    inf = base.groupBy(F.col("d").alias("zone")).agg(
        F.sum("c").alias("inflow")
    )
    j = outf.join(inf, on="zone", how="full_outer").select(
        "zone",
        F.expr("coalesce(inflow, cast(0 as bigint))")
        .alias("inflow"),
        F.expr("coalesce(outflow, cast(0 as bigint))")
        .alias("outflow"),
    )
    return j.select(
        "zone", "inflow", "outflow",
        (F.col("inflow") - F.col("outflow")).alias("net"),
        (F.col("inflow") + F.col("outflow")).alias("gross"),
        F.expr(
            "case when inflow + outflow > 0 then"
            " cast(abs(inflow - outflow) as double)"
            " / cast(inflow + outflow as double) end"
        ).alias("mei"),
    )


def rank_footrule(
    df: DataFrame,
    entity: str,
    period: str,
    value: str,
    p_a,
    p_b,
) -> DataFrame:
    """Spearman footrule rank mobility between two periods (the
    chart-churn number: how far did entities move in the ranking,
    sum of |rank shift|; 0 frozen, max n^2/2-ish fully shuffled):

        F = sum over shared entities of |r_a - r_b|

    Ranks by (period total DESC, entity ASC) — deterministic.
    Entities present in only one period are counted separately
    (the honest churn note). Output: (n_shared, n_only_a,
    n_only_b, footrule).

    Scale: two period aggs + rank windows + one join.
    """
    base = df.select(
        F.col(entity).alias("e"), F.col(period).alias("p"),
        F.col(value).cast("long").alias("v"),
    )

    def _ranks(pv):
        per = base.where(F.col("p") == F.lit(pv)) \
            .groupBy("e").agg(F.sum("v").alias("t"))
        w = Window.orderBy(F.col("t").desc(), F.col("e").asc())
        return per.select(
            "e", F.row_number().over(w).cast("long").alias("r")
        )
    ra = _ranks(p_a).withColumnRenamed("r", "ra")
    rb = _ranks(p_b).withColumnRenamed("r", "rb")
    j = ra.join(rb, on="e", how="full_outer")
    agg = j.agg(
        F.sum(
            F.expr(
                "case when ra is not null and rb is not null"
                " then 1 else 0 end"
            )
        ).cast("long").alias("n_shared"),
        F.sum(
            F.expr(
                "case when rb is null then 1 else 0 end"
            )
        ).cast("long").alias("n_only_a"),
        F.sum(
            F.expr(
                "case when ra is null then 1 else 0 end"
            )
        ).cast("long").alias("n_only_b"),
        F.sum(
            F.expr(
                "case when ra is not null and rb is not null"
                " then abs(ra - rb) else 0 end"
            )
        ).cast("long").alias("footrule"),
    )
    return agg


def var_es(
    df: DataFrame,
    value: str,
    pct: int = 5,
) -> DataFrame:
    """Historical Value-at-Risk and Expected Shortfall at the p%
    tail (the loss-distribution pair max_drawdown summarizes along
    time; this summarizes across the distribution): VaR = the
    exact lower order statistic at rank ceil(p n / 100) of the
    ASCENDING values (losses negative), ES = the exact mean of
    the values at-or-below that rank. Output: (n, k_tail, var_q,
    es_num, es).

    Scale: one sort-window + one rank-bounded agg.
    """
    p = int(pct)
    w = Window.orderBy(F.col("v").asc(), F.col("__tb").asc())
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
    tail = base.where(
        F.expr(f"rn <= ({p} * n + 99) div 100")
    )
    agg = tail.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k_tail"),
        F.max("v").alias("var_q"),
        F.sum("v").alias("es_num"),
    )
    return agg.select(
        "n", "k_tail", "var_q", "es_num",
        F.expr(
            "case when k_tail > 0 then cast(es_num as double)"
            " / cast(k_tail as double) end"
        ).alias("es"),
    )


def omega_ratio(
    df: DataFrame,
    value: str,
    threshold: int = 0,
) -> DataFrame:
    """Omega ratio at a return threshold (Keating & Shadwick
    2002) — the whole-distribution gain/loss ratio (uses EVERY
    moment, unlike Sharpe's first two):

        omega = sum max(0, r - tau) / sum max(0, tau - r)

    Exact integer partial sums; one division (NULL when the loss
    leg is empty). Output: (n, gain_sum, loss_sum, omega).

    Scale: ONE conditional agg.
    """
    t = int(threshold)
    base = df.select(F.col(value).cast("long").alias("v"))
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr(f"greatest(v - {t}, cast(0 as bigint))")
        ).alias("gain_sum"),
        F.sum(
            F.expr(f"greatest({t} - v, cast(0 as bigint))")
        ).alias("loss_sum"),
    )
    return agg.select(
        "n", "gain_sum", "loss_sum",
        F.expr(
            "case when loss_sum > 0 then"
            " cast(gain_sum as double)"
            " / cast(loss_sum as double) end"
        ).alias("omega"),
    )


def sharpe_sortino(
    df: DataFrame,
    key: str,
    value: str,
) -> DataFrame:
    """Sharpe and Sortino ratios per key (risk-adjusted return at
    zero benchmark — Sortino penalizes only DOWNSIDE deviation):

        sharpe  = mean / sd           [sample sd]
        sortino = mean / sqrt(sum min(0, r)^2 / (n - 1))

    Exact integer moments (sum, sumsq, downside sumsq); both one
    IEEE chain. Output per key: (key, n, s, ss, dss, sharpe,
    sortino).

    Scale: ONE conditional agg.
    """
    base = df.select(
        F.col(key).alias("k"),
        F.col(value).cast("long").alias("v"),
    )
    agg = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.expr("v * v")).alias("ss"),
        F.sum(
            F.expr("case when v < 0 then v * v"
                   " else cast(0 as bigint) end")
        ).alias("dss"),
    )
    mean = "(cast(s as double) / cast(n as double))"
    sd = (
        "sqrt((cast(n as double) * cast(ss as double)"
        " - cast(s as double) * cast(s as double))"
        " / (cast(n as double) * (cast(n as double) - 1.0e0)))"
    )
    dsd = (
        "sqrt(cast(dss as double)"
        " / (cast(n as double) - 1.0e0))"
    )
    return agg.select(
        "k", "n", "s", "ss", "dss",
        F.expr(
            f"case when n > 1 and {sd} > 0.0e0 then"
            f" {mean} / {sd} end"
        ).alias("sharpe"),
        F.expr(
            f"case when n > 1 and dss > 0 then"
            f" {mean} / {dsd} end"
        ).alias("sortino"),
    )


def streak_stats(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
) -> DataFrame:
    """Win/loss streak statistics per key (the hot-hand /
    reliability readout runs_test TESTS; this DESCRIBES): runs of
    same-sign values (zeros break streaks), longest winning and
    losing streaks and run counts. Classic gaps-and-islands on the
    sign change. Output per key: (key, n, n_runs, max_win_streak,
    max_loss_streak).

    Scale: one per-key lag window + two aggs.
    """
    w = Window.partitionBy("k").orderBy(F.col("o").asc())
    run = w.rowsBetween(Window.unboundedPreceding,
                        Window.currentRow)
    base = (
        df.select(
            F.col(key).alias("k"), F.col(order).alias("o"),
            F.col(value).cast("long").alias("v"),
        )
        .withColumn(
            "sgn",
            F.expr("case when v > 0 then 1 when v < 0 then -1"
                   " else 0 end"),
        )
        .withColumn("psgn", F.lag("sgn", 1).over(w))
        .withColumn(
            "brk",
            F.expr(
                "case when psgn is null or sgn <> psgn then 1"
                " else 0 end"
            ),
        )
        .withColumn("run_id", F.sum("brk").over(run))
    )
    runs = base.groupBy("k", "run_id").agg(
        F.max("sgn").alias("sgn"),
        F.count(F.lit(1)).cast("long").alias("len"),
    )
    return runs.groupBy("k").agg(
        F.sum("len").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.max(
            F.expr("case when sgn = 1 then len"
                   " else cast(0 as bigint) end")
        ).alias("max_win_streak"),
        F.max(
            F.expr("case when sgn = -1 then len"
                   " else cast(0 as bigint) end")
        ).alias("max_loss_streak"),
    )


def chatterjee_xi(
    df: DataFrame,
    x: str,
    y: str,
    id_col: str,
) -> DataFrame:
    """Chatterjee's xi rank correlation (2020) — the dependence
    measure that catches NON-monotone relationships kendall/
    spearman score 0 (xi -> 1 iff y is a measurable function of
    x, ~0 under independence):

        xi = 1 - 3 * sum |r_{i+1} - r_i| / (n^2 - 1)

    with rows ordered by (x, id) and r_i = #{j : y_j <= y_i} (the
    max-rank tie convention, exact via the cumulative tie count).
    All integer window sums; one IEEE chain. Output: (n, s_abs,
    xi).

    Scale: one distinct-y prefix window + one x-ordered lag
    window — the ks_test plan family.
    """
    base = df.select(
        F.col(id_col).alias("i"),
        F.col(x).alias("xv"), F.col(y).alias("yv"),
    )
    ycnt = base.groupBy("yv").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    wy = Window.orderBy(F.col("yv").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    yr = ycnt.withColumn("r", F.sum("t").over(wy)) \
        .select("yv", "r")
    seq = base.join(yr, on="yv")
    wx = Window.orderBy(F.col("xv").asc(), F.col("i").asc())
    lag = seq.withColumn("pr", F.lag("r", 1).over(wx))
    agg = lag.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr("case when pr is not null"
                   " then abs(r - pr) end")
        ).alias("s_abs"),
    )
    return agg.select(
        "n", "s_abs",
        F.expr(
            "case when n > 1 then 1.0e0"
            " - 3.0e0 * cast(s_abs as double)"
            " / (cast(n as double) * cast(n as double) - 1.0e0)"
            " end"
        ).alias("xi"),
    )


def quadrant_assoc(
    df: DataFrame,
    x: str,
    y: str,
) -> DataFrame:
    """Quadrant count ratio (Holmes 2001 teaching classic; the
    median-centered sign correlation — a 50%-breakdown dependence
    screen):

        qcr = (n_concordant - n_discordant) / n

    Quadrants split at the EXACT doubled medians of x and y
    (points ON a median line are neutral). Output: (n, n_conc,
    n_disc, n_axis, qcr).

    Scale: two sort-windows for the medians + ONE conditional agg.
    """
    base = df.select(
        F.col(x).cast("long").alias("xv"),
        F.col(y).cast("long").alias("yv"),
    )

    def _med2(col: str) -> DataFrame:
        w = Window.orderBy(F.col(col).asc())
        r = (
            base.withColumn("rn", F.row_number().over(w))
            .withColumn("nn", F.count(F.lit(1)).over(
                Window.partitionBy()))
            .where(
                (F.col("rn") == F.expr("(nn + 1) div 2"))
                | (F.col("rn") == F.expr("(nn + 2) div 2"))
            )
            .agg(F.sum(col).alias("raw"),
                 F.count(F.lit(1)).alias("m"))
        )
        return r.select(
            F.expr(
                "case when m = 1 then 2 * raw else raw end"
            ).alias(f"med2_{col}")
        )

    mx = _med2("xv")
    my = _med2("yv")
    j = base.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(my))
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr(
                "case when (2 * xv - med2_xv)"
                " * (2 * yv - med2_yv) > 0 then 1 else 0 end"
            )
        ).cast("long").alias("n_conc"),
        F.sum(
            F.expr(
                "case when (2 * xv - med2_xv)"
                " * (2 * yv - med2_yv) < 0 then 1 else 0 end"
            )
        ).cast("long").alias("n_disc"),
    )
    return agg.select(
        "n", "n_conc", "n_disc",
        (F.col("n") - F.col("n_conc") - F.col("n_disc"))
        .alias("n_axis"),
        F.expr(
            "case when n > 0 then"
            " cast(n_conc - n_disc as double)"
            " / cast(n as double) end"
        ).alias("qcr"),
    )


def distance_correlation(
    df: DataFrame,
    x: str,
    y: str,
    id_col: str,
) -> DataFrame:
    """Distance correlation (Szekely, Rizzo & Bakirov 2007) — the
    dependence measure that is ZERO iff X and Y are independent
    (catches every functional or stochastic relationship; the
    heavyweight member of the xi/kendall family): with pairwise
    distance matrices a, b double-centered,

        dCor^2 = sum A_ij B_ij
                 / sqrt(sum A_ij^2 * sum B_ij^2)

    Centering carries EXACTLY at the n^2 scale (n^2 a_ij - n r_i
    - n c_j + S is int64), so all three folds are exact and dCor
    is one sqrt chain. Output: (n, sab, saa, sbb, dcor).

    O(n^2) pairs with per-row marginals — the oracle-exact
    small-n path (filter first, like kendall_tau); bound
    n^2 * max|dx| products under 2^63 (n ~ 150 at |v| <= 500).
    """
    base = df.select(
        F.col(id_col).alias("i"),
        F.col(x).cast("long").alias("xv"),
        F.col(y).cast("long").alias("yv"),
    )
    a = base.select(F.col("i").alias("ia"),
                    F.col("xv").alias("xa"),
                    F.col("yv").alias("ya"))
    b = base.select(F.col("i").alias("ib"),
                    F.col("xv").alias("xb"),
                    F.col("yv").alias("yb"))
    pairs = a.crossJoin(b).select(
        "ia", "ib",
        F.expr("abs(xa - xb)").alias("da"),
        F.expr("abs(ya - yb)").alias("db"),
    )
    rows = pairs.groupBy("ia").agg(
        F.sum("da").alias("ra"), F.sum("db").alias("rb")
    )
    cols = pairs.groupBy("ib").agg(
        F.sum("da").alias("ca"), F.sum("db").alias("cb")
    )
    tot = pairs.agg(
        F.sum("da").alias("sa"), F.sum("db").alias("sb"),
        F.countDistinct("ia").cast("long").alias("n"),
    )
    cent = (
        pairs.join(rows, on="ia").join(cols, on="ib")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "n * n * da - n * ra - n * ca + sa"
            ).alias("aa"),
            F.expr(
                "n * n * db - n * rb - n * cb + sb"
            ).alias("bb"),
            "n",
        )
    )
    agg = cent.groupBy("n").agg(
        F.sum(F.expr("aa * bb")).alias("sab"),
        F.sum(F.expr("aa * aa")).alias("saa"),
        F.sum(F.expr("bb * bb")).alias("sbb"),
    )
    return agg.select(
        "n", "sab", "saa", "sbb",
        F.expr(
            "case when saa > 0 and sbb > 0 and sab > 0 then"
            " sqrt(cast(sab as double)"
            " / sqrt(cast(saa as double) * cast(sbb as double)))"
            " when saa > 0 and sbb > 0 then 0.0e0 end"
        ).alias("dcor"),
    )


def energy_distance(
    df_a: DataFrame,
    df_b: DataFrame,
    value: str,
) -> DataFrame:
    """Energy distance between two samples (Szekely & Rizzo 2004)
    — the metric two-sample statistic of the distance-correlation
    family (zero iff equal distributions; sensitive to ANY
    difference, not just location like mann_whitney):

        E = 2 mean|X - Y| - mean|X - X'| - mean|Y - Y'|

    carried on the common denominator n_a^2 n_b^2... folded as
    exact integer pair sums with their own counts; E is one fixed
    IEEE chain. Output: (n_a, n_b, sxy, sxx, syy, e_dist).

    O(pairs) — the oracle-exact small-n path (filter first).
    """
    a = df_a.select(F.col(value).cast("long").alias("xa")) \
        .withColumn("ia", F.monotonically_increasing_id())
    b = df_b.select(F.col(value).cast("long").alias("xb")) \
        .withColumn("ib", F.monotonically_increasing_id())
    sxy = a.crossJoin(b).agg(
        F.sum(F.expr("abs(xa - xb)")).alias("sxy")
    )
    sxx = a.crossJoin(
        a.select(F.col("xa").alias("xa2"),
                 F.col("ia").alias("ia2"))
    ).agg(F.sum(F.expr("abs(xa - xa2)")).alias("sxx"))
    syy = b.crossJoin(
        b.select(F.col("xb").alias("xb2"),
                 F.col("ib").alias("ib2"))
    ).agg(F.sum(F.expr("abs(xb - xb2)")).alias("syy"))
    na = df_a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = df_b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    j = (
        sxy.crossJoin(F.broadcast(sxx))
        .crossJoin(F.broadcast(syy))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    e = (
        "(2.0e0 * cast(sxy as double)"
        " / (cast(n_a as double) * cast(n_b as double))"
        " - cast(sxx as double)"
        " / (cast(n_a as double) * cast(n_a as double))"
        " - cast(syy as double)"
        " / (cast(n_b as double) * cast(n_b as double)))"
    )
    return j.select(
        "n_a", "n_b", "sxy", "sxx", "syy",
        F.expr(
            f"case when n_a > 0 and n_b > 0 then {e} end"
        ).alias("e_dist"),
    )


def cramer_von_mises(
    df_a: DataFrame,
    df_b: DataFrame,
    value: str,
) -> DataFrame:
    """Two-sample Cramér-von Mises statistic (Anderson 1962) — the
    integrated-CDF-difference complement of ks_test's supremum
    (CvM sees persistent small gaps KS misses). With combined
    doubled mid-ranks R2 (the mann_whitney tie algebra) and
    within-sample positions i:

        4 n m (n+m) T = n * sum_i (R2_i - 2i)^2
                      + m * sum_j (S2_j - 2j)^2 terms folded,
        T = U / (n m (n+m)) - (4 n m - 1) / (6 (n + m))

    with U exact int64 (the doubled forms clear every half).
    Output: (n_a, n_b, u4, t_stat).

    Scale: one distinct-value prefix window + per-sample rank
    windows — the ks_test plan.
    """
    a = df_a.select(F.col(value).alias("v")) \
        .withColumn("g", F.lit(0))
    b = df_b.select(F.col(value).alias("v")) \
        .withColumn("g", F.lit(1))
    u = a.unionByName(b)
    per = u.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum(F.expr("case when g = 0 then 1 else 0 end"))
        .cast("long").alias("ca"),
    )
    wv = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per.withColumn(
        "cprev", F.sum("t").over(wv) - F.col("t")
    ).select(
        "v", "t", "ca",
        (2 * F.col("cprev") + F.col("t") + 1).alias("r2"),
    )
    # within-sample positions: prefix of own counts
    wa = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pos = ranked.withColumn(
        "pa_prev", F.sum("ca").over(wa) - F.col("ca")
    ).withColumn(
        "pb_prev",
        F.sum(F.expr("t - ca")).over(wa) - (F.col("t")
                                            - F.col("ca")),
    )
    # each tied block contributes ca terms (R2 - 2i)^2 for i =
    # pa_prev+1..pa_prev+ca (and symmetrically for b): expand via
    # the closed form sum (R2 - 2i)^2 = ca*R2^2 - 4 R2 * S_i
    # + 4 * S_i2 with S_i, S_i2 the integer range sums
    def _blk(cnt: str, prev: str) -> str:
        si = f"(({cnt}) * ({prev}) + (({cnt}) * (({cnt}) + 1)) div 2)"
        si2 = (
            f"(({cnt}) * ({prev}) * ({prev})"
            f" + 2 * ({prev}) * ((({cnt}) * (({cnt}) + 1)) div 2)"
            f" + ((({cnt}) * (({cnt}) + 1) * (2 * ({cnt}) + 1))"
            " div 6))"
        )
        return (
            f"(({cnt}) * r2 * r2 - 4 * r2 * {si} + 4 * {si2})"
        )

    terms = pos.select(
        F.expr(_blk("ca", "pa_prev")).alias("ta"),
        F.expr(_blk("(t - ca)", "pb_prev")).alias("tb"),
    )
    na = df_a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = df_b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    agg = terms.agg(
        F.sum("ta").alias("sa4"), F.sum("tb").alias("sb4")
    ).crossJoin(F.broadcast(na)).crossJoin(F.broadcast(nb))
    # U (doubled-squared scale /4): sa4/4 etc fold into the final
    # double once
    t_stat = (
        "((cast(n_a as double) * cast(sa4 as double)"
        " + cast(n_b as double) * cast(sb4 as double)) / 4.0e0"
        " / (cast(n_a as double) * cast(n_b as double)"
        " * (cast(n_a as double) + cast(n_b as double)))"
        " - (4.0e0 * cast(n_a as double) * cast(n_b as double)"
        " - 1.0e0)"
        " / (6.0e0 * (cast(n_a as double)"
        " + cast(n_b as double))))"
    )
    return agg.select(
        "n_a", "n_b",
        F.expr("n_a * sa4 + n_b * sb4").alias("u4"),
        F.expr(
            f"case when n_a > 0 and n_b > 0 then {t_stat} end"
        ).alias("t_stat"),
    )


def gini_mean_diff(
    df: DataFrame,
    key: str,
    value: str,
) -> DataFrame:
    """Gini mean difference per key (the pairwise-|diff| scale
    estimator, computed WITHOUT pairs via the rank closed form —
    the scalable member of the robust-scale family next to
    qn_scale's small-n order statistic):

        GMD = 2 * sum_i (2i - n - 1) x_(i) / (n (n - 1))

    Rank-weighted sums are exact int64 (ties interchangeable);
    GMD one IEEE chain. Output per key: (key, n, w_sum, gmd).

    Scale: one per-key sort-window + ONE agg — O(n log n), never
    pairs.
    """
    w = Window.partitionBy("k").orderBy(
        F.col("v").asc(), F.col("__tb").asc()
    )
    base = (
        df.select(
            F.col(key).alias("k"),
            F.col(value).cast("long").alias("v"),
            F.monotonically_increasing_id().alias("__tb"),
        )
        .withColumn("i", F.row_number().over(w).cast("long"))
        .withColumn(
            "n",
            F.count(F.lit(1)).over(Window.partitionBy("k")),
        )
        .drop("__tb")
    )
    agg = base.groupBy("k").agg(
        F.max("n").alias("n"),
        F.sum(F.expr("(2 * i - n - 1) * v")).alias("w_sum"),
    )
    return agg.select(
        "k", "n", "w_sum",
        F.expr(
            "case when n > 1 then 2.0e0 * cast(w_sum as double)"
            " / (cast(n as double) * (cast(n as double)"
            " - 1.0e0)) end"
        ).alias("gmd"),
    )


def atkinson_index(
    df: DataFrame,
    key: str,
    value: str,
) -> DataFrame:
    """Atkinson inequality index at epsilon = 1 per key (the
    welfare-economics member of the inequality family next to
    gini/hoover/theil — how much total income could society give
    up under equal distribution for the same welfare):

        A = 1 - geomean / mean

    geomean via the quantized-ln fold (the geometric_stats
    convention; requires v >= 1, sub-1 rows dropped + counted),
    mean exact. Output per key: (key, n, n_dropped, a_r round 9).

    Scale: ONE hash agg.
    """
    q = float(GEO_Q)
    base = df.select(
        F.col(key).alias("k"),
        F.col(value).cast("long").alias("v"),
    )
    kept = base.where(F.col("v") >= 1)
    dropped = base.where(F.col("v") < 1).groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_dropped")
    )
    agg = kept.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("s"),
        F.sum(
            F.expr(
                "cast(floor(ln(cast(v as double))"
                f" * {q!r}e0 + 0.5e0) as bigint)"
            )
        ).alias("lq"),
    )
    j = agg.join(dropped, on="k", how="left")
    gm = (
        f"exp(cast(lq as double) / (cast(n as double) * {q!r}e0))"
    )
    mean = "(cast(s as double) / cast(n as double))"
    return j.select(
        "k", "n",
        F.expr("coalesce(n_dropped, cast(0 as bigint))")
        .alias("n_dropped"),
        F.expr(
            f"case when n > 0 and {mean} > 0.0e0 then"
            f" round(1.0e0 - {gm} / {mean}, 9) end"
        ).alias("a_r"),
    )


def income_share_ratios(
    df: DataFrame,
    key: str,
    value: str,
) -> DataFrame:
    """Palma and quintile share ratios per key (the policy-facing
    inequality pair next to gini/atkinson — shares of the total
    held by rank bands):

        palma = top-10% share / bottom-40% share
        s80s20 = top-20% share / bottom-20% share

    Band membership is the exact integer cross-multiplication
    rank * 10 <= n (etc.) on the ascending (value, tiebreak)
    ranks; the four band sums are exact int64. Output per key:
    (key, n, bot40, bot20, top20, top10, palma, s80s20).

    Scale: one per-key sort-window + ONE conditional agg.
    """
    w = Window.partitionBy("k").orderBy(
        F.col("v").asc(), F.col("__tb").asc()
    )
    base = (
        df.select(
            F.col(key).alias("k"),
            F.col(value).cast("long").alias("v"),
            F.monotonically_increasing_id().alias("__tb"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn(
            "n",
            F.count(F.lit(1)).over(Window.partitionBy("k")),
        )
        .drop("__tb")
    )
    agg = base.groupBy("k").agg(
        F.max("n").alias("n"),
        F.sum(
            F.expr("case when rn * 10 <= 4 * n then v"
                   " else cast(0 as bigint) end")
        ).alias("bot40"),
        F.sum(
            F.expr("case when rn * 5 <= n then v"
                   " else cast(0 as bigint) end")
        ).alias("bot20"),
        F.sum(
            F.expr("case when rn * 5 > 4 * n then v"
                   " else cast(0 as bigint) end")
        ).alias("top20"),
        F.sum(
            F.expr("case when rn * 10 > 9 * n then v"
                   " else cast(0 as bigint) end")
        ).alias("top10"),
    )
    return agg.select(
        "k", "n", "bot40", "bot20", "top20", "top10",
        F.expr(
            "case when bot40 > 0 then cast(top10 as double)"
            " / cast(bot40 as double) end"
        ).alias("palma"),
        F.expr(
            "case when bot20 > 0 then cast(top20 as double)"
            " / cast(bot20 as double) end"
        ).alias("s80s20"),
    )


HT_Q = 1 << 20


def horvitz_thompson(
    df: DataFrame,
    value: str,
    pi_num: str,
    pi_den: str,
) -> DataFrame:
    """Horvitz-Thompson total estimator for unequal-probability
    samples (THE design-unbiased estimator every weighted crawl /
    survey pipeline needs; temperature_resample's analytical dual):

        T_hat = sum_i v_i / pi_i = sum_i v_i * den_i / num_i

    with rational inclusion probabilities pi = num/den. Each term
    quantizes exactly as (v * den * Q) div num (order-invariant
    int64 fold). Output: (n, t_q, t_hat). Bound: v * den * Q <
    2^63.

    Scale: ONE fold.
    """
    q = HT_Q
    base = df.select(
        F.col(value).cast("long").alias("v"),
        F.col(pi_num).cast("long").alias("num"),
        F.col(pi_den).cast("long").alias("den"),
    ).where(F.col("num") > 0)
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr(
                f"(v * den * cast({q} as bigint)) div num"
            )
        ).alias("t_q"),
    )
    return agg.select(
        "n", "t_q",
        F.expr(f"cast(t_q as double) / {float(q)!r}e0")
        .alias("t_hat"),
    )


def design_effect(
    df: DataFrame,
    cluster: str,
    value: str,
) -> DataFrame:
    """Design effect (Kish DEFF) of a cluster sample — how much
    variance the clustering costs vs simple random sampling
    (the survey-precision companion of icc_oneway):

        deff = 1 + (m_bar - 1) * rho,
        rho = (msb - msw) / (msb + (m_bar - 1) msw)   [ANOVA ICC]

    with m_bar the mean cluster size and MSB/MSW from exact
    integer sums (the icc algebra, unbalanced-tolerant via the
    size-weighted forms evaluated as fixed chains). Output: (k,
    n, deff).

    Scale: ONE cluster agg + one fold.
    """
    base = df.select(
        F.col(cluster).alias("c"),
        F.col(value).cast("long").alias("v"),
    )
    grp = base.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("v").alias("s"),
        F.sum(F.expr("v * v")).alias("ss"),
    )
    tot = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("m").alias("n"),
        F.sum("s").alias("st"),
        F.sum("ss").alias("sst"),
        # between-cluster squared-total term sum s^2/m quantized
        F.sum(
            F.expr(
                "((s * s) div m) * cast(1048576 as bigint)"
                " + ((s * s) % m) * cast(1048576 as bigint)"
                " div m"
            )
        ).alias("b_q"),
    )
    nf = "cast(n as double)"
    kf = "cast(k as double)"
    bq = "(cast(b_q as double) / 1048576.0e0)"
    ssb = f"({bq} - cast(st as double) * cast(st as double) / {nf})"
    ssw = f"(cast(sst as double) - {bq})"
    msb = f"({ssb} / ({kf} - 1.0e0))"
    msw = f"({ssw} / ({nf} - {kf}))"
    mbar = f"({nf} / {kf})"
    rho = (
        f"(({msb} - {msw})"
        f" / ({msb} + ({mbar} - 1.0e0) * {msw}))"
    )
    return tot.select(
        "k", "n",
        F.expr(
            f"case when k > 1 and n > k and {msw} > 0.0e0"
            f" and {msb} + ({mbar} - 1.0e0) * {msw} > 0.0e0 then"
            f" 1.0e0 + ({mbar} - 1.0e0) * {rho} end"
        ).alias("deff"),
    )


def mcc_score(
    df: DataFrame,
    truth: str,
    pred: str,
) -> DataFrame:
    """Matthews correlation coefficient + balanced accuracy +
    informedness (Youden) + markedness from the binary confusion
    matrix (the single-number summaries eval_classification's
    per-label table feeds):

        mcc = (tp*tn - fp*fn)
              / sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn))

    Exact integer cells (the sqrt argument can exceed int64 —
    evaluated as a double chain, deterministic). Output: (tp, fp,
    fn, tn, mcc, bal_acc, informedness, markedness).

    Scale: ONE conditional agg.
    """
    base = df.select(
        F.col(truth).cast("int").alias("y"),
        F.col(pred).cast("int").alias("p"),
    )
    agg = base.agg(
        F.sum(F.expr("case when y = 1 and p = 1 then 1"
                     " else 0 end")).cast("long").alias("tp"),
        F.sum(F.expr("case when y = 0 and p = 1 then 1"
                     " else 0 end")).cast("long").alias("fp"),
        F.sum(F.expr("case when y = 1 and p = 0 then 1"
                     " else 0 end")).cast("long").alias("fn"),
        F.sum(F.expr("case when y = 0 and p = 0 then 1"
                     " else 0 end")).cast("long").alias("tn"),
    )
    den = (
        "sqrt(cast(tp + fp as double) * cast(tp + fn as double)"
        " * cast(tn + fp as double) * cast(tn + fn as double))"
    )
    tpr = "(cast(tp as double) / cast(tp + fn as double))"
    tnr = "(cast(tn as double) / cast(tn + fp as double))"
    ppv = "(cast(tp as double) / cast(tp + fp as double))"
    npv = "(cast(tn as double) / cast(tn + fn as double))"
    return agg.select(
        "tp", "fp", "fn", "tn",
        F.expr(
            f"case when {den} > 0.0e0 then"
            " (cast(tp as double) * cast(tn as double)"
            " - cast(fp as double) * cast(fn as double))"
            f" / {den} end"
        ).alias("mcc"),
        F.expr(
            f"case when tp + fn > 0 and tn + fp > 0 then"
            f" ({tpr} + {tnr}) / 2.0e0 end"
        ).alias("bal_acc"),
        F.expr(
            f"case when tp + fn > 0 and tn + fp > 0 then"
            f" {tpr} + {tnr} - 1.0e0 end"
        ).alias("informedness"),
        F.expr(
            f"case when tp + fp > 0 and tn + fn > 0 then"
            f" {ppv} + {npv} - 1.0e0 end"
        ).alias("markedness"),
    )


def fbeta_ladder(
    df: DataFrame,
    score: str,
    label: str,
    thresholds: list[int] | None = None,
    beta2_num: int = 1,
    beta2_den: int = 1,
) -> DataFrame:
    """Precision/recall/F-beta at a fixed threshold ladder (the
    operating-point table between auc_exact's summary and
    youden_cutoff's single pick); beta^2 enters as the rational
    beta2_num/beta2_den so F stays one exact-input chain:

        F_beta = (1 + b2) P R / (b2 P + R)

    Exact integer confusion tallies per threshold (predict
    positive at score >= t). Output per t: (t, tp, fp, fn, prec,
    rec, fbeta).

    Scale: one |thresholds| explode + ONE conditional agg.
    """
    ts = sorted(int(t) for t in (thresholds or [250, 500, 750]))
    bn, bd = int(beta2_num), int(beta2_den)
    base = df.select(
        F.col(score).cast("long").alias("v"),
        F.col(label).cast("long").alias("y"),
    )
    ladder = base.select(
        "v", "y",
        F.explode(F.array(*[F.lit(t) for t in ts])).alias("t"),
    )
    agg = ladder.groupBy("t").agg(
        F.sum(F.expr("case when v >= t and y = 1 then 1"
                     " else 0 end")).cast("long").alias("tp"),
        F.sum(F.expr("case when v >= t and y = 0 then 1"
                     " else 0 end")).cast("long").alias("fp"),
        F.sum(F.expr("case when v < t and y = 1 then 1"
                     " else 0 end")).cast("long").alias("fn"),
    )
    # F_beta on the common integer denominator:
    # (1+b2) tp / ((1+b2) tp + fp + b2 fn)  [beta2 = bn/bd]
    fnum = f"(({bd} + {bn}) * tp)"
    fden = f"(({bd} + {bn}) * tp + {bd} * fp + {bn} * fn)"
    return agg.select(
        F.col("t").cast("long").alias("t"), "tp", "fp", "fn",
        F.expr(
            "case when tp + fp > 0 then cast(tp as double)"
            " / cast(tp + fp as double) end"
        ).alias("prec"),
        F.expr(
            "case when tp + fn > 0 then cast(tp as double)"
            " / cast(tp + fn as double) end"
        ).alias("rec"),
        F.expr(
            f"case when {fden} > 0 then cast({fnum} as double)"
            f" / cast({fden} as double) end"
        ).alias("fbeta"),
    )


SRM_Q = 1 << 16


def srm_check(
    df: DataFrame,
    arm: str,
    expected_num: list[int] | None = None,
) -> DataFrame:
    """Sample-ratio-mismatch check (the first experiment-health
    gate: do the arm counts match the intended allocation?):
    chi-square of observed arm counts against expected integer
    ratio weights (default equal):

        chi2 = sum (O_a - E_a)^2 / E_a,
        E_a = n * w_a / sum w

    Each term folds exactly on the common denominator by the
    split-division trick (Q = 2^16). Output: (n, k, chi2_q,
    chi2).

    Scale: ONE arm agg + one fold.
    """
    q = SRM_Q
    per = df.groupBy(F.col(arm).alias("a")).agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    if expected_num is None:
        per = per.withColumn("w", F.lit(1).cast("long"))
    else:
        ws = [int(x) for x in expected_num]
        mapping = "case " + " ".join(
            f"when a = {i} then cast({w} as bigint)"
            for i, w in enumerate(ws)
        ) + " else cast(1 as bigint) end"
        per = per.withColumn("w", F.expr(mapping))
    tot = per.agg(
        F.sum("o").alias("n"), F.sum("w").alias("sw"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    j = per.crossJoin(F.broadcast(tot))
    # (O sw - n w)^2 / (n w sw) on the split-division grid
    d = "(o * sw - n * w)"
    den = "(n * w * sw)"
    term = (
        f"(({d} * {d}) div {den}) * cast({q} as bigint)"
        f" + ((({d} * {d}) % {den}) * cast({q} as bigint))"
        f" div {den}"
    )
    agg = j.groupBy("n", "k").agg(
        F.sum(F.expr(term)).alias("chi2_q")
    )
    return agg.select(
        "n", "k", "chi2_q",
        F.expr(
            f"cast(chi2_q as double) / {float(q)!r}e0"
        ).alias("chi2"),
    )


def smd_balance(
    df: DataFrame,
    arm: str,
    covariate: str,
) -> DataFrame:
    """Standardized mean difference between two arms on a
    covariate (the pre-period balance screen before any causal
    readout; |SMD| < 0.1 is the usual "balanced" bar):

        smd = (m1 - m0) / sqrt((v1 + v0) / 2)

    Exact per-arm moments; one IEEE chain. Arms are 0/1. Output:
    (n0, n1, smd).

    Scale: ONE conditional agg.
    """
    base = df.select(
        F.col(arm).cast("int").alias("g"),
        F.col(covariate).cast("long").alias("v"),
    )
    agg = base.agg(
        *[f
          for k in (0, 1)
          for f in (
              F.sum(F.expr(f"case when g = {k} then 1"
                           " else 0 end"))
              .cast("long").alias(f"n{k}"),
              F.sum(F.expr(f"case when g = {k} then v"
                           " else cast(0 as bigint) end"))
              .alias(f"s{k}"),
              F.sum(F.expr(f"case when g = {k} then v * v"
                           " else cast(0 as bigint) end"))
              .alias(f"ss{k}"),
          )]
    )

    def mv(k: int) -> tuple[str, str]:
        m = f"(cast(s{k} as double) / cast(n{k} as double))"
        v = (
            f"((cast(n{k} as double) * cast(ss{k} as double)"
            f" - cast(s{k} as double) * cast(s{k} as double))"
            f" / (cast(n{k} as double)"
            f" * (cast(n{k} as double) - 1.0e0)))"
        )
        return m, v

    m0, v0 = mv(0)
    m1, v1 = mv(1)
    pooled = f"sqrt(({v1} + {v0}) / 2.0e0)"
    return agg.select(
        "n0", "n1",
        F.expr(
            f"case when n0 > 1 and n1 > 1 and {pooled} > 0.0e0"
            f" then ({m1} - {m0}) / {pooled} end"
        ).alias("smd"),
    )


def interaction_contrast(
    df: DataFrame,
    segment: str,
    arm: str,
    success: str,
) -> DataFrame:
    """Two-segment treatment-effect interaction (the heterogeneity
    readout after ab_test's overall lift: does the effect DIFFER
    between segments A and B?):

        delta_s = p1_s - p0_s  per segment,
        z = (delta_A - delta_B) / sqrt(sum of 4 binomial
                                       variance terms)

    Exact 2x2x2 tallies; one IEEE chain. Segments and arms are
    0/1. Output: (n, d_a, d_b, z).

    Scale: ONE conditional agg.
    """
    base = df.select(
        F.col(segment).cast("int").alias("s"),
        F.col(arm).cast("int").alias("g"),
        F.col(success).cast("long").alias("y"),
    )
    cells = []
    for s in (0, 1):
        for g in (0, 1):
            cells.append(
                F.sum(F.expr(
                    f"case when s = {s} and g = {g} then 1"
                    " else 0 end"
                )).cast("long").alias(f"n{s}{g}")
            )
            cells.append(
                F.sum(F.expr(
                    f"case when s = {s} and g = {g} then y"
                    " else cast(0 as bigint) end"
                )).alias(f"x{s}{g}")
            )
    agg = base.agg(*cells)

    def p(s: int, g: int) -> str:
        return (
            f"(cast(x{s}{g} as double) / cast(n{s}{g} as double))"
        )

    def var(s: int, g: int) -> str:
        pp = p(s, g)
        return f"({pp} * (1.0e0 - {pp}) / cast(n{s}{g} as double))"

    d_a = f"({p(0, 1)} - {p(0, 0)})"
    d_b = f"({p(1, 1)} - {p(1, 0)})"
    se = (
        f"sqrt({var(0, 1)} + {var(0, 0)}"
        f" + {var(1, 1)} + {var(1, 0)})"
    )
    guard = " and ".join(
        f"n{s}{g} > 0" for s in (0, 1) for g in (0, 1)
    )
    return agg.select(
        F.expr("n00 + n01 + n10 + n11").alias("n"),
        F.expr(
            f"case when {guard} then {d_a} end"
        ).alias("d_a"),
        F.expr(
            f"case when {guard} then {d_b} end"
        ).alias("d_b"),
        F.expr(
            f"case when {guard} and {se} > 0.0e0 then"
            f" ({d_a} - {d_b}) / {se} end"
        ).alias("z"),
    )


def cap_sensitivity(
    df: DataFrame,
    value: str,
    caps: list[int] | None = None,
) -> DataFrame:
    """Metric capping sensitivity ladder (how much does the mean
    move as outliers are capped — the winsorization-level picker
    for heavy-tailed experiment metrics): per cap c,

        capped_mean = sum min(v, c) / n,
        capped_share = #(v > c) / n

    Exact integer sums. Output per cap: (cap, n, n_capped,
    capped_mean, capped_share).

    Scale: one |caps| explode + ONE agg.
    """
    cs = sorted(int(c) for c in (caps or [100, 250, 400]))
    base = df.select(F.col(value).cast("long").alias("v"))
    ladder = base.select(
        "v",
        F.explode(F.array(*[F.lit(c) for c in cs])).alias("cap"),
    )
    agg = ladder.groupBy("cap").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("least(v, cap)")).alias("s_cap"),
        F.sum(
            F.expr("case when v > cap then 1 else 0 end")
        ).cast("long").alias("n_capped"),
    )
    return agg.select(
        F.col("cap").cast("long").alias("cap"), "n", "n_capped",
        F.expr(
            "cast(s_cap as double) / cast(n as double)"
        ).alias("capped_mean"),
        F.expr(
            "cast(n_capped as double) / cast(n as double)"
        ).alias("capped_share"),
    )


def erlang_b(
    df: DataFrame,
    arrivals: str,
    service_rate: str,
    servers: str,
    max_c: int = 12,
) -> DataFrame:
    """Erlang-B blocking probability per row (the loss-system
    sibling of erlang_c — calls that find all c servers busy are
    DROPPED): computed by the stable recursion unrolled at plan
    build,

        B_0 = 1;  B_k = a B_{k-1} / (k + a B_{k-1})

    — a fixed IEEE chain per c <= max_c (loud error beyond).
    Output adds (load_r, p_block_r) round 9.

    Scale: fully row-local codegen, zero shuffle.
    """
    from pdal_spark import sqlgen as G

    a = (
        f"(cast(`{arrivals}` as double)"
        f" / cast(`{service_rate}` as double))"
    )
    c = f"cast(`{servers}` as int)"
    # textual recursion must reference the previous level ONCE or
    # the expression doubles per step (2^c terms froze codegen):
    # use the inverse form I_k = 1 + (k/a) I_{k-1}, B = 1/I_c
    branches = []
    for cc in range(1, int(max_c) + 1):
        inv = "1.0e0"
        for k in range(1, cc + 1):
            inv = (
                f"(1.0e0 + ({G.fnum(float(k))} / {a}) * {inv})"
            )
        branches.append(f"when {c} = {cc} then (1.0e0 / {inv})")
    # servers outside 1..max_c is the promised LOUD error (round-2
    # ADVICE: a bare CASE end yielded silent NULLs instead)
    err = (
        "raise_error(concat('erlang_b: servers out of range 1.."
        f"{int(max_c)}: ', cast({c} as string)))"
    )
    pb = (
        "case " + " ".join(branches)
        + f" else cast({err} as double) end"
    )
    return df.withColumn(
        "load_r", F.expr(f"round({a}, 9)")
    ).withColumn(
        "p_block_r", F.expr(f"round({pb}, 9)")
    )


def mg1_wait(
    df: DataFrame,
    key: str,
    service: str,
    arrival_rate_num: int,
    arrival_rate_den: int,
) -> DataFrame:
    """Pollaczek-Khinchine mean waiting time for an M/G/1 queue
    per key (the service-time-VARIANCE-aware queueing readout —
    same utilization, bursty service doubles the wait):

        W_q = lambda * E[S^2] / (2 (1 - rho)),  rho = lambda E[S]

    with lambda the rational arrival rate and the service moments
    exact integer sums from observed service times. Unstable keys
    (rho >= 1) report NULL. Output per key: (key, n, s_sum, ss_sum,
    rho, wq).

    Scale: ONE hash agg + row-local chains.
    """
    ln, ld = int(arrival_rate_num), int(arrival_rate_den)
    base = df.select(
        F.col(key).alias("k"),
        F.col(service).cast("long").alias("s"),
    )
    agg = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").alias("s_sum"),
        F.sum(F.expr("s * s")).alias("ss_sum"),
    )
    lam = f"({float(ln)!r}e0 / {float(ld)!r}e0)"
    es = "(cast(s_sum as double) / cast(n as double))"
    es2 = "(cast(ss_sum as double) / cast(n as double))"
    rho = f"({lam} * {es})"
    wq = f"({lam} * {es2} / (2.0e0 * (1.0e0 - {rho})))"
    return agg.select(
        "k", "n", "s_sum", "ss_sum",
        F.expr(f"case when n > 0 then {rho} end").alias("rho"),
        F.expr(
            f"case when n > 0 and {rho} < 1.0e0 then {wq} end"
        ).alias("wq"),
    )


def apdex(
    df: DataFrame,
    key: str,
    latency: str,
    t_ms: int,
) -> DataFrame:
    """Apdex application-performance score per key (the industry
    latency-satisfaction index): satisfied <= T, tolerating <= 4T,
    frustrated beyond:

        apdex = (satisfied + tolerating / 2) / n

    Exact tallies; one chain (x2 numerator keeps it integer).
    Output per key: (key, n, n_sat, n_tol, apdex).

    Scale: ONE conditional agg.
    """
    t = int(t_ms)
    base = df.select(
        F.col(key).alias("k"),
        F.col(latency).cast("long").alias("l"),
    )
    agg = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr(f"case when l <= {t} then 1 else 0 end"))
        .cast("long").alias("n_sat"),
        F.sum(
            F.expr(f"case when l > {t} and l <= {4 * t} then 1"
                   " else 0 end")
        ).cast("long").alias("n_tol"),
    )
    return agg.select(
        "k", "n", "n_sat", "n_tol",
        F.expr(
            "case when n > 0 then"
            " cast(2 * n_sat + n_tol as double)"
            " / (2.0e0 * cast(n as double)) end"
        ).alias("apdex"),
    )


USL_Q = 1 << 10


def usl_fit(
    df: DataFrame,
    concurrency: str,
    throughput: str,
) -> DataFrame:
    """Universal Scalability Law fit (Gunther) — THE model behind
    this repo's own N -> 4N scaling story: linearize X(N) =
    lam N / (1 + sigma(N-1) + kappa N(N-1)) as the quadratic

        N / X = c0 + c1 N + c2 N^2

    and solve the 3x3 normal equations by Cramer determinants
    (the affine_from_gcps discipline) over EXACT moments of
    (N, y_q) with y = N/X quantized to the 2^-10 grid. Back out
    lam = 1/(c0+c1+c2)|_{N=1}-ish is the caller's algebra; the
    gate-compared essence is (c0, c1, c2). Output: (n_pts, c0,
    c1, c2).

    Scale: ONE moment agg + fixed chains.
    """
    q = float(USL_Q)
    base = df.select(
        F.col(concurrency).cast("long").alias("nn"),
        F.col(throughput).cast("long").alias("x"),
    ).where((F.col("nn") >= 1) & (F.col("x") >= 1))
    pts = base.select(
        "nn",
        F.expr(
            "cast(floor(cast(nn as double) / cast(x as double)"
            f" * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("y_q"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("nn").alias("s1"),
        F.sum(F.expr("nn * nn")).alias("s2"),
        F.sum(F.expr("nn * nn * nn")).alias("s3"),
        F.sum(F.expr("nn * nn * nn * nn")).alias("s4"),
        F.sum("y_q").alias("t0"),
        F.sum(F.expr("nn * y_q")).alias("t1"),
        F.sum(F.expr("nn * nn * y_q")).alias("t2"),
    )

    def d(v: str) -> str:
        return f"cast({v} as double)"

    det = (
        f"({d('m')} * ({d('s2')} * {d('s4')}"
        f" - {d('s3')} * {d('s3')})"
        f" - {d('s1')} * ({d('s1')} * {d('s4')}"
        f" - {d('s3')} * {d('s2')})"
        f" + {d('s2')} * ({d('s1')} * {d('s3')}"
        f" - {d('s2')} * {d('s2')}))"
    )

    def cramer(r0: str, r1: str, r2: str, col: int) -> str:
        rows = [["m", "s1", "s2"], ["s1", "s2", "s3"],
                ["s2", "s3", "s4"]]
        mat = [row[:] for row in rows]
        for i, rv in enumerate((r0, r1, r2)):
            mat[i][col] = rv
        a, b, c = mat[0]
        p, qq, r = mat[1]
        u, v, w = mat[2]
        return (
            f"({d(a)} * ({d(qq)} * {d(w)} - {d(r)} * {d(v)})"
            f" - {d(b)} * ({d(p)} * {d(w)} - {d(r)} * {d(u)})"
            f" + {d(c)} * ({d(p)} * {d(v)} - {d(qq)} * {d(u)}))"
        )

    g = f"case when {det} <> 0.0e0 then "
    qf = f"{q!r}e0"
    outs = []
    for i, name in enumerate(("c0", "c1", "c2")):
        expr = cramer("t0", "t1", "t2", i)
        outs.append(
            F.expr(
                f"{g}({expr} / {det}) / {qf} end"
            ).alias(name)
        )
    return mom.select(
        F.col("m").alias("n_pts"), *outs
    )
