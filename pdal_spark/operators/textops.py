"""Text-analysis ops for the web-pages table (BASELINE.json payload:
webtext). These extend the reference's per-point dimension-derivation
pattern (filters.assign/ferry computing new dims) to the `text`
column of Common-Crawl-style documents: token counting, quality
scoring, language-ID and document fingerprinting — the ops a 100 TB
training-data pipeline runs before dedup/filtering.

All token-level work is explode -> aggregate (Catalyst; map-side
partial aggregation keeps the shuffle at O(#docs), not O(#tokens)).
Word identity uses either xxhash64 (production: no joins, no vocab
build) or a broadcast vocabulary with dense ids (oracle-checkable —
word_id = row_number over sorted distinct words).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G

TOKEN_SEP = " "


def tokens(df: DataFrame, text: str = "text", id_col: str = "doc_id"
           ) -> DataFrame:
    """Explode to (id, pos, word); pos is 0-based document order."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text), TOKEN_SEP)).alias("pos", "word"),
    )


def vocab(df: DataFrame, text: str = "text") -> DataFrame:
    """Deterministic vocabulary: word_id = rank of word in sorted
    order (1-based), 64-bit (Spark row_number is int32; DuckDB's is
    bigint).

    NOT a global window (`row_number over (order by word)` drags the
    whole vocab through ONE partition — the classic WindowExec
    warning). Scalable dense rank instead: range-repartition by word,
    rank within each sorted partition, then add per-partition offsets
    (one tiny driver-side cumsum over partition counts)."""
    words = (
        df.select(F.explode(F.split(F.col(text), TOKEN_SEP)).alias("word"))
        .distinct()
        .repartitionByRange("word")
        .sortWithinPartitions("word")
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__local",
            F.row_number().over(
                Window.partitionBy("__pid").orderBy("word")
            ).cast("long"),
        )
        .localCheckpoint(eager=True)
    )
    counts = (
        words.groupBy("__pid").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("__pid")
        .collect()
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["n"]
    off_df = words.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "__pid int, __off long",
    )
    return (
        words.join(F.broadcast(off_df), on="__pid")
        .withColumn("word_id", F.col("__local") + F.col("__off"))
        .select("word", "word_id")
    )


def token_ids(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """(id, pos, word_id). With a vocab (oracle mode) ids are dense
    ranks; otherwise xxhash64 (scale mode, no shuffle on the docs)."""
    t = tokens(df, text, id_col)
    if vocab_df is None:
        return t.withColumn(
            "word_id", F.abs(F.xxhash64("word")) % F.lit(G.M31)
        ).drop("word")
    return t.join(F.broadcast(vocab_df), on="word").drop("word")


def token_quality(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc quality metrics: token count, char len, avg token
    length, unique-token ratio (all exact integer arithmetic)."""
    t = tokens(df, text, id_col)
    return t.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (
            F.sum(F.length("word")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_token_len"),
        (
            F.count_distinct("word").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("uniq_ratio"),
    ).join(
        df.select(id_col, F.length(text).alias("n_chars_calc")), on=id_col
    )


def lang_groups_sql(n_groups: int, d: G.Dialect) -> str:
    """Synthetic language profiles: the corpus vocabulary partitioned
    round-robin by sorted rank — group = (word_id - 1) % n (stand-in
    for per-language stopword lists; deterministic in both engines)."""
    return f"((word_id - 1) % {n_groups})"


def lang_id(
    df: DataFrame,
    vocab_df: DataFrame,
    n_groups: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
    out: str = "pred_lang",
) -> DataFrame:
    """Language-ID heuristic: score each language group by its hit
    count in the doc; argmax with smallest-group tie-break."""
    t = token_ids(df, text, id_col, vocab_df)
    grp = t.withColumn("grp", F.expr(lang_groups_sql(n_groups, G.SPARK)))
    counts = grp.groupBy(id_col, "grp").agg(
        F.count(F.lit(1)).alias("hits")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("hits").desc(), F.col("grp").asc()
    )
    return (
        counts.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select(id_col, F.col("grp").alias(out))
    )


FP_MOD = 1000000007


def fingerprint(
    df: DataFrame,
    vocab_df: DataFrame | None = None,
    text: str = "text",
    id_col: str = "doc_id",
    out: str = "fingerprint",
) -> DataFrame:
    """Order-sensitive rolling document fingerprint:
    sum((pos + 1) * word_id) % p — permutation-sensitive (catches
    reordered docs exact-dedup misses), exact int64 arithmetic.

    Scale mode (no vocab) folds the whole sum row-locally over the
    hashed token array (zip_with positions + aggregate): zero
    shuffle, computed inside the scan stage. Vocab/oracle mode keeps
    the token explode + groupBy the DuckDB SQL mirrors."""
    if vocab_df is None:
        ids = F.transform(
            F.split(F.col(text), TOKEN_SEP),
            lambda w: F.abs(F.xxhash64(w)) % F.lit(G.M31),
        )
        terms = F.zip_with(
            ids,
            F.sequence(F.lit(1), F.size(ids)),
            lambda w, p: (w * p) % FP_MOD,
        )
        fp = (
            F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x)
            % FP_MOD
        )
        return df.select(F.col(id_col), fp.alias(out))
    t = token_ids(df, text, id_col, vocab_df)
    return t.groupBy(id_col).agg(
        (
            F.sum((F.col("pos") + 1) * F.col("word_id")) % F.lit(FP_MOD)
        ).alias(out)
    )


# a small English-ish stopword set, shared with the oracle via the
# module constant (quality-scoring heuristic, not linguistics)
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is",
             "it", "on", "for", "with", "as", "at", "by")

# BPE-ish subword splitter: alternating letter runs / digit runs /
# single punctuation marks (the whitespace tokenizer's complement for
# token counting; regexp shared with the DuckDB oracle)
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def quality_score(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Web-page quality heuristics (training-data filtering): doc
    length, punctuation ratio, digit ratio, stopword ratio, mean word
    length — one pass, exact integer/char arithmetic (no floats until
    the final divisions, identical on both engines)."""
    n_chars = F.length(text)
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text), "[^A-Za-z0-9 ]", "")
    )
    n_digit = n_chars - F.length(
        F.regexp_replace(F.col(text), "[0-9]", "")
    )
    words = F.split(F.col(text), " ")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(words, stop_arr))
    # n_stop counts DISTINCT stopwords present (array_intersect is
    # set-like) — a deterministic proxy ratio; the oracle mirrors it
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (n_punct.cast("double") / n_chars.cast("double")).alias(
            "punct_ratio"
        ),
        (n_digit.cast("double") / n_chars.cast("double")).alias(
            "digit_ratio"
        ),
        (n_stop.cast("double") / n_words.cast("double")).alias(
            "stopword_ratio"
        ),
    )


def bpe_token_count(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Subword token counting with the BPE-ish regexp (letter runs,
    digit runs, single punctuation) — the scale-friendly form: one
    regexp_extract_all + size per row, no explode/shuffle."""
    toks = F.regexp_extract_all(F.col(text), F.lit(BPE_REGEX), 0)
    return df.select(
        id_col,
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_bpe_distinct"),
    )


def repetition_stats(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021
    quality rules; the reference's per-point derived-dimension pattern
    applied to text): duplicate-word fraction and the fraction of
    word characters covered by the single most frequent word bigram.

    Plan shape: one explode -> two aggregations, both map-side
    combined on (doc, key); the per-doc argmax is a window over the
    tiny (doc, bigram, cnt) aggregate, partitioned by doc (never a
    global window). All counts are integers; the two output ratios
    are each a single IEEE division, so the oracle hash-compares
    exactly."""
    t = tokens(df, text, id_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    big = (
        t.withColumn("w2", F.lead("word").over(w))
        .where(F.col("w2").isNotNull())
        .groupBy(id_col, "word", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "covered", F.col("cnt") * (F.length("word") + F.length("w2"))
        )
    )
    top = (
        big.withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("covered").desc(),
                    F.col("cnt").desc(),
                    F.col("word").asc(),
                    F.col("w2").asc(),
                )
            ),
        )
        .where(F.col("__r") == 1)
        .select(id_col, F.col("covered").alias("top_covered"))
    )
    per_doc = t.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("word").alias("n_distinct"),
        F.sum(F.length("word")).alias("word_chars"),
    )
    return (
        per_doc.join(top, on=id_col, how="left")
        .select(
            id_col,
            "n_tokens",
            (
                (F.col("n_tokens") - F.col("n_distinct")).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_word_frac"),
            (
                F.coalesce(F.col("top_covered"), F.lit(0)).cast("double")
                / F.col("word_chars").cast("double")
            ).alias("top_bigram_frac"),
        )
    )


def doc_frequency(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(word, df): number of distinct documents containing each word.
    distinct-per-doc then count — one shuffle on word, map-side
    combined; output is vocabulary-sized (small, broadcastable)."""
    return (
        tokens(df, text, id_col)
        .select(id_col, "word")
        .distinct()
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def keyword_topk(
    df: DataFrame, k: int = 3, text: str = "text", id_col: str = "doc_id",
    broadcast_df: bool = True,
) -> DataFrame:
    """tf-idf-flavored keyword extraction: per doc, the top-k terms
    ranked by (tf DESC, df ASC, word ASC) — term frequency first,
    corpus document-frequency as the informativeness tie-break. The
    integer sort key avoids float idf entirely, so ranking is
    deterministic and oracle-exact.

    `broadcast_df=True` broadcasts the (word, df) table — right for
    bounded vocabularies (<~10M words). At open-web scale the token
    vocabulary's long tail (URLs, hashes) makes it shuffle-sized:
    pass False and the tf⋈df join hash-partitions on word, where it
    co-partitions with the df aggregation's own shuffle (no extra
    exchange on that side). The per-doc ranking windows over the
    small (doc, word, tf) aggregate partitioned by doc."""
    tf = (
        tokens(df, text, id_col)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = doc_frequency(df, text, id_col)
    if broadcast_df:
        dfreq = F.broadcast(dfreq)
    ranked = tf.join(dfreq, on="word").withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(
                F.col("tf").desc(), F.col("df").asc(), F.col("word").asc()
            )
        ),
    )
    return ranked.where(F.col("rank") <= k).select(
        id_col, "rank", "word", "tf", "df"
    )


def commonness_score(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
    broadcast_df: bool = True,
) -> DataFrame:
    """Corpus-frequency commonness per doc: mean document-frequency
    of its tokens (sum over token occurrences of df(word) / n_tokens)
    — a unigram-LM surprisal proxy without transcendentals (no log,
    so the ratio is one exact IEEE division). Low commonness flags
    gibberish/rare-vocab pages; high flags boilerplate.

    Same vocab-size caveat as `keyword_topk`: broadcast_df=False at
    open-web scale shuffles tokens on word instead (co-partitioned
    with the df table's grouping)."""
    t = tokens(df, text, id_col)
    dfreq = doc_frequency(df, text, id_col)
    if broadcast_df:
        dfreq = F.broadcast(dfreq)
    return (
        t.join(dfreq, on="word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("df").alias("df_sum"),
        )
        .select(
            id_col,
            "n_tokens",
            (
                F.col("df_sum").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("mean_df"),
        )
    )


DOMAIN_RE = "^[a-z]+://([^/]+)"


def domain_stats(
    df: DataFrame, url: str = "url", id_col: str | None = None
) -> DataFrame:
    """Per-domain corpus share (C4/CCNet-style provenance stats, the
    input to per-domain quotas and domain-level dedup): extract the
    host from `url`, count pages per domain, and attach each domain's
    fraction of the corpus.

    Scale: one map-side-combined groupBy on the domain key; the
    corpus total is an agg-of-agg single row cross-joined back
    (broadcast) — no global window, so nothing funnels through one
    partition. Hot domains are exactly the hexbin hot-cell problem;
    AQE skew handling applies to the groupBy the same way.
    """
    per = (
        df.select(
            F.regexp_extract(F.col(url), DOMAIN_RE, 1).alias("domain")
        )
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    tot = per.agg(F.sum("n_pages").alias("__tot"))
    return per.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_pages",
        (
            F.col("n_pages").cast("double") / F.col("__tot").cast("double")
        ).alias("share"),
    )


def domain_cap(
    df: DataFrame,
    url: str = "url",
    cap: int = 2,
    order_col: str | None = None,
) -> DataFrame:
    """C4-style per-domain page cap: keep at most `cap` pages per
    domain, chosen by a deterministic order (`order_col`, default the
    url itself) — the anti-boilerplate quota that stops one template
    site from dominating the corpus.

    Scale: one window shuffle keyed on domain. Hot domains are the
    point of the op (they are exactly the rows it trims), and the cap
    bounds every partition's OUTPUT at `cap` rows; AQE skew-split
    handles the input side. For caps small enough to hold per-key
    state, Spark's WindowGroupLimit pushes rank<=k below the sort.
    """
    order_col = order_col or url
    dom = F.regexp_extract(F.col(url), DOMAIN_RE, 1)
    w = Window.partitionBy(dom).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(cap))
        .drop("__rn")
    )


def domain_authority(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Link-graph domain authority — the centrality quality signal
    corpus pipelines weight domains by (CommonCrawl harmonic/PageRank
    ranks) — as INTEGER PageRank: ranks start at `scale` per node;
    each iteration every node receives
    sum over in-edges of (r_src * 85) div (100 * outdeg_src), plus
    the teleport share scale * 15 div 100. All arithmetic is int64
    (max term ~ scale * 85 << 2^63), `div` truncation included, so
    ranks are EXACT — reproducible across engines, partitionings and
    runs, unlike float PageRank whose shuffle-order sums drift.
    Dangling-node mass is dropped, not redistributed (this is a
    relative quality signal, not a probability distribution).

    Scale: the classic PageRank join pattern — per iteration one
    edges-to-ranks join shuffling on src and one groupBy on dst.
    Degrees are computed once; `iters` is small and fixed (authority
    signals converge in rank ORDER long before value convergence).
    """
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    teleport = (scale * (damping_den - damping_num)) // damping_den
    ranks = nodes.withColumn("r", F.lit(int(scale)).cast("long"))
    ed = e.join(deg, on="src")
    for _ in range(int(iters)):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(r * {int(damping_num)})"
                    f" div (cast({int(damping_den)} as bigint) * d)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_r"))
        )
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(int(teleport)).cast("long")
                    + F.coalesce(F.col("in_r"), F.lit(0).cast("long"))
                ).alias("r"),
            )
        )
    return ranks.select(F.col("node"), F.col("r").alias("authority"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-snapshot diff (the audit step between two curation
    runs): per-doc status `added` / `removed` / `modified`, comparing
    content by md5 so the join carries a 32-byte digest instead of
    document bodies. Unchanged docs are EXCLUDED — output is
    proportional to churn, never corpus size.

    Scale: one full outer join on the id over (id, digest) pairs —
    text never shuffles; digests compute map-side at the scan.
    """
    o = old.select(
        F.col(id_col), F.md5(F.col(text)).alias("__oh")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text)).alias("__nh")
    )
    j = o.join(n, on=id_col, how="full_outer")
    status = (
        F.when(F.col("__oh").isNull(), F.lit("added"))
        .when(F.col("__nh").isNull(), F.lit("removed"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("modified"))
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(id_col, "status")
    )


def gopher_rules(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_distinct_stopwords: int = 2,
    max_punct_ratio: float = 0.2,
    max_dup_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, table A1
    shape) as one composite verdict: per-rule 0/1 flags plus the
    AND of all — the form a curation pipeline actually filters on,
    with the per-rule flags kept for ablation stats. Thresholds are
    constants compared against exactly-computed ratios (single IEEE
    divisions of integer counts), so the verdict is engine-exact.

    Mean word length assumes single-space tokenization (true for
    the whitespace-token corpus: word chars = n_chars - (n_words-1)).

    Scale: quality_score is row-local; repetition_stats is two
    map-side-combined aggregations; the final join is id-to-id on
    co-sized aggregates.
    """
    q = quality_score(df, text, id_col)
    r = repetition_stats(df, text, id_col)
    words = F.split(F.col(text), TOKEN_SEP)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    nstop = df.select(
        F.col(id_col),
        F.size(F.array_intersect(words, stop_arr)).alias("n_stop"),
    )
    j = (
        q.join(
            r.select(id_col, "dup_word_frac", "top_bigram_frac"),
            on=id_col,
        ).join(nstop, on=id_col)
    )
    mean_wl = (
        F.col("n_chars") - F.col("n_words") + 1
    ).cast("double") / F.col("n_words").cast("double")
    flags = {
        "r_word_count": (F.col("n_words") >= int(min_words))
        & (F.col("n_words") <= int(max_words)),
        "r_mean_word_len": (mean_wl >= float(min_mean_word_len))
        & (mean_wl <= float(max_mean_word_len)),
        "r_stopwords": F.col("n_stop") >= int(min_distinct_stopwords),
        "r_punct": F.col("punct_ratio") <= float(max_punct_ratio),
        "r_dup_words": F.col("dup_word_frac")
        <= float(max_dup_word_frac),
        "r_top_bigram": F.col("top_bigram_frac")
        <= float(max_top_bigram_frac),
    }
    keep = None
    cols = [F.col(id_col)]
    for name, cond in flags.items():
        cols.append(cond.cast("int").alias(name))
        keep = cond if keep is None else (keep & cond)
    cols.append(keep.cast("int").alias("keep"))
    return j.select(*cols)


def corpus_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: int = 0,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: one Lehmer hash of
    the id picks a bucket; cumulative weight thresholds slice the
    bucket range into labeled splits. Disjoint and exhaustive BY
    CONSTRUCTION (one hash, contiguous ranges) — unlike
    df.randomSplit, assignment is a pure function of the id:
    reproducible across runs/engines/cluster sizes, and stable under
    corpus growth (existing docs never change split).

    Scale: a codegen'd CASE on the scan — no shuffle, no RNG state.
    """
    from pdal_spark import sqlgen as G

    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    tot = sum(weights.values())
    h = G.lehmer2_wide(f"(`{id_col}` + {int(salt)})")
    bucket = F.expr(f"({h} % {int(buckets)})")
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / tot
        thr = int(round(acc * buckets))
        expr = (
            F.when(bucket < thr, F.lit(name))
            if expr is None
            else expr.when(bucket < thr, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def normalize_text(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
    out: str = "norm_text", append: bool = False,
) -> DataFrame:
    """CCNet-style canonical form for hashing/dedup: lowercase,
    strip non-alphanumerics to spaces, collapse whitespace runs,
    trim. Two documents that differ only in case/punct/spacing
    normalize to the same bytes — run exact/minhash dedup over
    `norm_text` to catch them.

    Scale: row-local regexp chain inside codegen, zero shuffle.
    """
    c = F.lower(F.col(text))
    c = F.regexp_replace(c, "[^a-z0-9 ]+", " ")
    c = F.regexp_replace(c, "  +", " ")
    c = F.trim(c)
    if append:
        return df.withColumn(out, c)
    return df.select(F.col(id_col), c.alias(out))


def canonical_url(
    df: DataFrame, url: str = "url", out: str = "canon_url"
) -> DataFrame:
    """URL canonicalization for provenance joins and URL-level dedup:
    lowercase scheme+host, drop the query string and fragment, strip
    a trailing slash. Same pattern subset caveat as redact_pii.

    Scale: row-local, zero shuffle.
    """
    c = F.col(url)
    # split off query/fragment
    c = F.regexp_replace(c, "[?#].*$", "")
    # lowercase scheme://host, keep path case
    scheme_host = F.lower(
        F.regexp_extract(c, "^([a-zA-Z0-9+.-]*://[^/]*)", 1)
    )
    path = F.regexp_replace(c, "^[a-zA-Z0-9+.-]*://[^/]*", "")
    c = F.concat(scheme_host, path)
    c = F.regexp_replace(c, "/$", "")
    return df.withColumn(out, c)


EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"
IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"


def extract_text(
    df: DataFrame,
    html: str = "html",
    out: str = "text",
) -> DataFrame:
    """Deterministic HTML -> text extraction (the step that turns a
    WARC `response` payload into the pages table's `text` column):
    drop script/style blocks, strip tags to spaces, unescape the
    five core entities, collapse whitespace. A regexp-chain
    extractor — trafilatura-class readability is a swappable Pandas
    UDF, but THIS form is reproducible byte-for-byte across engines
    and runs, which is what the per-url invariant needs.

    Accepts binary or string input (binary is UTF-8 decoded).
    Scale: row-local codegen chain, zero shuffle.
    """
    c = F.col(html).cast("string")
    c = F.regexp_replace(c, "(?s)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, "(?s)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, "<[^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.trim(F.regexp_replace(c, "\\s+", " "))
    return df.withColumn(out, c)


def redact_pii(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing (the pre-release redaction pass every public
    corpus ships with): replace emails / phone numbers / IPv4
    addresses with typed placeholder tokens and count each kind.
    Patterns stay in the RE2-compatible common subset (classes,
    bounded repeats, \\b) so JVM regex and other engines agree.

    Scale: pure row-local regexp work inside whole-stage codegen —
    no shuffle, no UDF; redaction cost is linear in bytes scanned.
    """
    col = F.col(text)
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return df.select(
        F.col(id_col),
        F.regexp_count(col, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(col, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count(col, F.lit(IPV4_RE)).alias("n_ips"),
        out.alias("clean_text"),
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    word_col: str = "word",
) -> DataFrame:
    """C4-style bad-words document filter: drop every document that
    contains ANY blocklisted token.

    Scale: the blocklist is tiny and broadcast, so flagging is a
    map-side semi-join on the exploded tokens; only the (small) set
    of flagged doc ids shuffles into the anti-join against the
    corpus — the full text never moves.
    """
    t = tokens(df, text=text, id_col=id_col)
    bad = (
        t.join(F.broadcast(blocklist.select(word_col)), on=word_col)
        .select(id_col)
        .distinct()
    )
    return df.join(bad, on=id_col, how="left_anti")


def bpe_pair_counts(
    df: DataFrame, text: str = "text", min_count: int = 1
) -> DataFrame:
    """Adjacent-token-pair frequencies — the inner statistic of BPE
    tokenizer training (each merge round promotes the argmax pair).
    Pairs are built ROW-LOCALLY (slide a 2-window over the token
    array inside the row, no posexplode self-join), so the only
    shuffle is the final map-side-combined count on the pair key —
    the op that must survive a 100 TB corpus.
    """
    ws = F.split(F.col(text), TOKEN_SEP)
    n = F.size(ws)
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at(ws, i).alias("left_tok"),
            F.element_at(ws, i + 1).alias("right_tok"),
        ),
    )
    return (
        df.where(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.left_tok").alias("left_tok"),
            F.col("p.right_tok").alias("right_tok"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .where(F.col("n_pairs") >= int(min_count))
    )


def temperature_resample(
    df: DataFrame,
    alpha: float = 0.5,
    url: str = "url",
    id_col: str = "page_id",
    buckets: int = 100_000,
    salt: int = 0,
) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-LM data-
    balancing op: sample domain d with probability proportional to
    share^alpha, alpha < 1 upweights rare domains). Realized as a
    per-domain downsampling rate relative to the natural mix:
    rate_d = (n_min / n_d)^(1 - alpha), so the rarest domain is kept
    in full and head domains are thinned toward the flattened mix.
    Membership is the consistent Lehmer-hash bucket test (same
    machinery as `consistent_sample`) — reproducible across runs,
    engines and cluster sizes.

    alpha = 0.5 keeps the rate IEEE-exact cross-engine (one divide +
    one sqrt); other alphas go through pow(), which can differ from
    another engine's libm in the last ulp.

    Scale: one map-side-combined groupBy over domains for counts,
    then the (tiny) rate table broadcast back onto the scan — the
    keep test is a codegen'd predicate, no shuffle of the corpus.
    """
    dom = F.regexp_extract(F.col(url), DOMAIN_RE, 1)
    d = df.withColumn("domain", dom)
    per = d.groupBy("domain").agg(F.count(F.lit(1)).alias("__n"))
    mn = per.agg(F.min("__n").alias("__nmin"))
    ratio = F.col("__nmin").cast("double") / F.col("__n").cast("double")
    if abs(alpha - 0.5) < 1e-12:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - float(alpha)))
    rates = per.crossJoin(F.broadcast(mn)).select(
        "domain",
        F.col("__n").alias("domain_pages"),
        rate.alias("sample_rate"),
    )
    h = G.lehmer2_wide(f"(`{id_col}` + {int(salt)})")
    thr = F.floor(
        F.col("sample_rate") * float(buckets) + F.lit(0.5)
    ).cast("bigint")
    return (
        d.join(F.broadcast(rates), "domain")
        .where(F.expr(f"({h} % {int(buckets)})") < thr)
    )


def sequence_pack(
    df: DataFrame,
    seq_len: int,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: tokenize every
    document, concatenate the token streams in `id_col` order, and
    split every `seq_len` tokens into one training sequence ("pack").
    Documents span pack boundaries (the standard causal-LM data
    layout). Per-doc manifest out:

      n_tokens   — document token count
      start_tok  — global offset of the doc's first token
      pack_first / off_first — pack and in-pack offset of that token
      pack_last  — pack holding the doc's last token
      n_spans    — number of packs the doc touches

    The global offset is an exclusive prefix sum of token counts —
    distributed via functions.rank.scalable_prefix_sums (local
    cumsums per sorted range-partition + exact driver-side decimal
    offsets), NOT a single global window, so it scales to corpus
    size. Token counting is one `size(split(...))` per doc (no
    explode).
    """
    from pdal_spark.functions.rank import scalable_prefix_sums

    n_tok = F.size(F.split(F.col(text), TOKEN_SEP)).cast("long")
    t = scalable_prefix_sums(
        df.withColumn("__nt", n_tok), [id_col], {"__cum": F.col("__nt")}
    )
    start = F.col("__cum").cast("long") - F.col("__nt")
    last = F.col("__cum").cast("long") - 1  # global idx of last token
    return (
        t.withColumn("start_tok", start)
        .withColumn("n_tokens", F.col("__nt"))
        .withColumn("pack_first", (F.col("start_tok") / seq_len)
                    .cast("long"))
        .withColumn("off_first", F.col("start_tok") % seq_len)
        .withColumn("pack_last", (last / seq_len).cast("long"))
        .withColumn(
            "n_spans", F.col("pack_last") - F.col("pack_first") + 1
        )
        .select(
            id_col, "n_tokens", "start_tok", "pack_first",
            "off_first", "pack_last", "n_spans",
        )
    )


def pack_manifest(
    df: DataFrame,
    seq_len: int,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-pack rollup of sequence_pack: for each training sequence,
    how many documents contribute tokens, how many documents start
    in it, and the tokens it holds (= seq_len except the tail pack).
    One explode of the per-doc span range (bounded by n_spans, which
    is <= n_tokens/seq_len + 1) + one map-side-combined groupBy.
    """
    per_doc = sequence_pack(df, seq_len, text=text, id_col=id_col)
    spans = per_doc.select(
        id_col, "start_tok", "n_tokens", "pack_first",
        F.explode(
            F.sequence(F.col("pack_first"), F.col("pack_last"))
        ).alias("pack_id"),
    )
    lo = F.greatest(F.col("start_tok"), F.col("pack_id") * seq_len)
    hi = F.least(
        F.col("start_tok") + F.col("n_tokens"),
        (F.col("pack_id") + 1) * seq_len,
    )
    return (
        spans.withColumn("tok_here", hi - lo)
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("pack_first") == F.col("pack_id"), 1)
                .otherwise(0)
            ).cast("long").alias("n_doc_starts"),
            F.sum("tok_here").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram language-model scoring (the CCNet/Gopher perplexity-filter
# capability re-based on an in-corpus unigram LM: no external model
# files exist in this sandbox, so the LM is trained on the corpus
# itself — same plumbing, deterministic everywhere).
# ---------------------------------------------------------------------------

LM_Q = 1 << 20  # fixed-point grid for log terms: integer sums are
#                 order-independent (float sums are not associative)


def unigram_logprob(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram log-likelihood under the corpus
    unigram LM with add-one smoothing: the perplexity-proxy quality
    filter (CCNet keeps low-perplexity docs). Columns: n_tokens,
    lm_q (exact integer fixed-point sum of ln p(w) terms), lm_mean
    (rounded mean log-prob; more negative = rarer tokens).

    Scale: token counts are ONE map-side-combined groupBy; scoring is
    a broadcast join of the (small) vocabulary onto the exploded
    tokens; each ln term is quantized to the 2^-20 grid BEFORE the
    per-doc sum, so the aggregate is integer-exact under any
    partitioning / AQE re-plan.
    """
    t = tokens(df, text, id_col).select(id_col, "word")
    cnt = t.groupBy("word").agg(F.count(F.lit(1)).alias("w_cnt"))
    tot = cnt.agg(
        F.sum("w_cnt").alias("n_total"),
        F.count(F.lit(1)).alias("n_vocab"),
    )
    scored = (
        t.join(F.broadcast(cnt), on="word")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "__term_q",
            F.expr(
                "cast(floor(ln(cast(w_cnt + 1 as double)"
                " / cast(n_total + n_vocab as double))"
                f" * {G.fnum(float(LM_Q))} + {G.fnum(0.5)}) as bigint)"
            ),
        )
    )
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("__term_q").alias("lm_q"),
    )
    return out.withColumn(
        "lm_mean",
        F.expr(
            f"round((cast(lm_q as double) / {G.fnum(float(LM_Q))})"
            " / n_tokens, 6)"
        ),
    )


def nb_classifier(
    df: DataFrame,
    label_value: str = "en",
    label_col: str = "lang",
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial Naive Bayes text classifier (the fastText-style
    quality/domain classifier of GPT-3/LLaMA-era curation, trained
    and applied in one job): per-token log-odds from corpus counts
    with add-one smoothing + class prior; predict by score sign.
    Columns: score_q (exact integer fixed-point log-odds sum), pred.

    Scale: training is ONE conditional-aggregation groupBy over the
    exploded tokens (positive and negative counts in the same pass —
    no second scan, no full-outer join); scoring broadcasts the
    (small) per-token log-odds table back onto the tokens. Log terms
    quantized to the 2^-20 grid before summing (order-independent).
    """
    lab = F.col(label_col) == F.lit(label_value)
    t = df.select(
        F.col(id_col),
        lab.alias("__pos"),
        F.explode(F.split(F.col(text), TOKEN_SEP)).alias("word"),
    )
    cnt = t.groupBy("word").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("p_cnt"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("n_cnt"),
    )
    tot = cnt.agg(
        F.sum("p_cnt").alias("p_tot"),
        F.sum("n_cnt").alias("n_tot"),
        F.count(F.lit(1)).alias("n_vocab"),
    )
    q = G.fnum(float(LM_Q))
    half = G.fnum(0.5)
    lo = (
        cnt.crossJoin(F.broadcast(tot))
        .withColumn(
            "__lo_q",
            F.expr(
                f"cast(floor(ln(cast(p_cnt + 1 as double)"
                f" / cast(p_tot + n_vocab as double)) * {q} + {half})"
                " as bigint)"
                f" - cast(floor(ln(cast(n_cnt + 1 as double)"
                f" / cast(n_tot + n_vocab as double)) * {q} + {half})"
                " as bigint)"
            ),
        )
        .select("word", "__lo_q")
    )
    priors = df.agg(
        F.sum(F.when(lab, 1).otherwise(0)).alias("p_docs"),
        F.sum(F.when(lab, 0).otherwise(1)).alias("n_docs"),
    )
    scored = (
        t.join(F.broadcast(lo), on="word")
        .groupBy(id_col)
        .agg(F.sum("__lo_q").alias("__tok_q"))
        .crossJoin(F.broadcast(priors))
        .withColumn(
            "score_q",
            F.expr(
                "__tok_q + cast(floor(ln(cast(p_docs as double)"
                f" / cast(n_docs as double)) * {q} + {half}) as bigint)"
            ),
        )
    )
    return scored.select(
        id_col, "score_q", (F.col("score_q") > 0).alias("pred")
    )


def dsir_label_weights(
    df: DataFrame,
    target_value: str = "en",
    label_col: str = "lang",
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document
    log-importance log(p_target(doc)/p_raw(doc)) under hashed-unigram
    bag-of-words models of the target slice vs the whole raw corpus,
    with add-one smoothing. Docs with high weight look like the
    target distribution; resample proportionally (compose with
    consistent_sample / temperature_resample) to shift the mixture.

    Columns: n_tokens, dsir_q (exact integer fixed-point sum),
    dsir_w (rounded mean log-ratio per token).

    Scale: one conditional-agg groupBy trains BOTH models in a single
    pass; scoring broadcasts the per-token log-ratio table onto the
    exploded tokens. Terms quantized to the 2^-20 grid before the
    per-doc sum (order-independent under any partitioning).
    """
    lab = F.col(label_col) == F.lit(target_value)
    t = df.select(
        F.col(id_col),
        lab.alias("__tgt"),
        F.explode(F.split(F.col(text), TOKEN_SEP)).alias("word"),
    )
    cnt = t.groupBy("word").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("t_cnt"),
        F.count(F.lit(1)).alias("a_cnt"),
    )
    tot = cnt.agg(
        F.sum("t_cnt").alias("t_tot"),
        F.sum("a_cnt").alias("a_tot"),
        F.count(F.lit(1)).alias("n_vocab"),
    )
    q = G.fnum(float(LM_Q))
    half = G.fnum(0.5)
    ratio = (
        cnt.crossJoin(F.broadcast(tot))
        .withColumn(
            "__w_q",
            F.expr(
                f"cast(floor(ln(cast(t_cnt + 1 as double)"
                f" / cast(t_tot + n_vocab as double)) * {q} + {half})"
                " as bigint)"
                f" - cast(floor(ln(cast(a_cnt + 1 as double)"
                f" / cast(a_tot + n_vocab as double)) * {q} + {half})"
                " as bigint)"
            ),
        )
        .select("word", "__w_q")
    )
    out = (
        t.join(F.broadcast(ratio), on="word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__w_q").alias("dsir_q"),
        )
    )
    return out.withColumn(
        "dsir_w",
        F.expr(
            f"round((cast(dsir_q as double) / {q}) / n_tokens, 6)"
        ),
    )


BPE_PASSES = 5  # merges adjacency chains up to 2^5 pairs per rule


def _bpe_replace(s_col):
    pat = F.concat(F.lit(","), F.col("__a"), F.lit(","),
                   F.col("__b"), F.lit(","))
    rep = F.concat(F.lit(","), F.col("__a"), F.col("__b"), F.lit(","))
    out = s_col
    for _ in range(BPE_PASSES):
        out = F.replace(out, pat, rep)
    return out



def bpe_train(
    df: DataFrame,
    n_merges: int = 6,
    text: str = "text",
    emit_segmentation: bool = False,
) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016): learn the top-N
    merge rules from the corpus word-frequency table. Returns the
    merge table (rank, lhs, rhs, total) — the artifact a tokenizer
    ships.

    Classic formulation: train on (distinct word, count), not the
    token stream — at web scale the word table is millions of rows
    where the corpus is trillions, so every iteration is an agg over
    the (shrinking-alphabet) word table only.

    Determinism: each word is held as a comma-delimited symbol string
    (',h,e,l,l,o,'); one merge = ONE ``replace(s, ',a,b,', ',ab,')``
    — anchored commas can only match whole symbols, and Spark and
    DuckDB share identical left-to-right replace semantics, so merge
    results (and therefore every later pair count) are bit-identical
    across engines. Argmax pair ties break on (count desc, lhs, rhs).

    Scale: per iteration, one row-local pair explode + one
    map-side-combined groupBy + a 1-row argmax crossJoined back
    (broadcast); N iterations = N narrow aggs, no iterative driver
    collect.
    """
    words = (
        tokens(df, text, "doc_id" if "doc_id" in df.columns else df.columns[0])
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # comma is the symbol delimiter: strip it from data defensively
        .withColumn("word", F.replace(F.col("word"), F.lit(","), F.lit("")))
        .where(F.length("word") > 0)
    )
    cur = words.select(
        "word",
        F.concat(
            F.lit(","),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.substring(F.col("word"), i, F.lit(1)),
                ),
                ",",
            ),
            F.lit(","),
        ).alias("s"),
        "cnt",
    )
    merge_frames = []
    # one replace() scan cannot match occurrences sharing a delimiter
    # comma (',a,b,a,b,' consumes the middle comma); BPE_PASSES
    # repeated scans merge adjacency chains up to 2^passes pairs —
    # canonical BPE behavior, still exact replace() semantics in both
    # engines
    for r in range(1, n_merges + 1):
        syms = F.filter(F.split(F.col("s"), ","), lambda x: x != "")
        pairs = (
            cur.select(
                F.explode(
                    F.when(
                        F.size(syms) > 1,
                        F.transform(
                            F.sequence(F.lit(1), F.size(syms) - 1),
                            lambda i: F.struct(
                                F.element_at(syms, i).alias("lhs"),
                                F.element_at(syms, i + 1).alias("rhs"),
                            ),
                        ),
                    ).otherwise(
                        F.array().cast(
                            "array<struct<lhs:string,rhs:string>>"
                        )
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("cnt").alias("total"))
        )
        best = pairs.orderBy(
            F.desc("total"), F.asc("lhs"), F.asc("rhs")
        ).limit(1)
        merge_frames.append(best.withColumn("rank", F.lit(r)))
        cur = (
            cur.crossJoin(F.broadcast(
                best.select(
                    F.col("lhs").alias("__a"), F.col("rhs").alias("__b")
                )
            ))
            .withColumn("s", _bpe_replace(F.col("s")))
            .drop("__a", "__b")
        )
    if emit_segmentation:
        syms = F.filter(F.split(F.col("s"), ","), lambda x: x != "")
        return cur.select(
            "word", "cnt", "s",
            F.size(syms).alias("n_symbols"),
        )
    out = merge_frames[0]
    for m in merge_frames[1:]:
        out = out.unionByName(m)
    return out.select("rank", "lhs", "rhs", "total")


def bpe_segment(
    df: DataFrame, n_merges: int = 6, text: str = "text"
) -> DataFrame:
    """Per-word BPE segmentation after training n_merges rules on the
    same corpus (train + encode in one lazy plan — no driver collect
    of the merge table): (word, cnt, s = delimited symbol string,
    n_symbols). The corpus token stream encodes by joining this table
    (broadcast: it is the word-frequency table's size)."""
    return bpe_train(df, n_merges, text, emit_segmentation=True)


def bigram_logprob(
    df: DataFrame,
    train_df: DataFrame | None = None,
    text: str = "text",
    id_col: str = "doc_id",
    backoff: float = 0.4,
) -> DataFrame:
    """Per-document mean bigram log-likelihood with STUPID BACKOFF
    (Brants et al. 2007 "Large Language Models in Machine
    Translation"): score(w2|w1) = c2(w1,w2)/c1(w1) when the bigram
    was seen in the training corpus, else backoff * add-one unigram
    p(w2) — the KenLM-style perplexity filter one order up from
    unigram_logprob. Train on ``train_df`` (defaults to ``df``
    itself, where backoff never fires); the held-out form is the real
    use: train on the trusted corpus, score the incoming crawl.

    Columns: n_bigrams, lm2_q (integer fixed-point sum), lm2_mean.

    Scale: both count tables are map-side-combined groupBys; scoring
    joins them onto the row-locally exploded bigrams (broadcast while
    vocab^2 fits, hash join beyond); every ln term is quantized to
    the 2^-20 grid BEFORE the per-doc sum, so the aggregate is
    integer-exact under any partitioning.
    """
    src = train_df if train_df is not None else df
    tt = tokens(src, text, id_col).select("word")
    c1 = tt.groupBy("word").agg(F.count(F.lit(1)).alias("c1"))
    tot = tt.agg(
        F.sum(F.lit(1)).alias("n_total"),
        F.count_distinct("word").alias("n_vocab"),
    )

    def bigrams(d: DataFrame) -> DataFrame:
        arr = F.split(F.col(text), TOKEN_SEP)
        pairs = F.when(
            F.size(arr) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - 2),
                lambda i: F.struct(
                    F.element_at(arr, i + 1).alias("w1"),
                    F.element_at(arr, i + 2).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast(
            "array<struct<w1:string,w2:string>>"
        ))
        return d.select(
            F.col(id_col), F.explode(pairs).alias("bg")
        ).select(id_col, "bg.w1", "bg.w2")

    c2 = bigrams(src).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2")
    )
    bg = bigrams(df)
    scored = (
        bg.join(F.broadcast(c2), on=["w1", "w2"], how="left")
        .join(
            F.broadcast(c1.withColumnRenamed("word", "w1")
                        .withColumnRenamed("c1", "c1a")),
            on="w1", how="left",
        )
        .join(
            F.broadcast(c1.withColumnRenamed("word", "w2")
                        .withColumnRenamed("c1", "c1b")),
            on="w2", how="left",
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "__term_q",
            F.expr(
                "CASE WHEN c2 IS NOT NULL THEN"
                " cast(floor(ln(cast(c2 as double)"
                " / cast(c1a as double))"
                f" * {G.fnum(float(LM_Q))} + {G.fnum(0.5)}) as bigint)"
                " ELSE"
                f" cast(floor(ln({G.fnum(float(backoff))}"
                " * cast(coalesce(c1b, 0) + 1 as double)"
                " / cast(n_total + n_vocab as double))"
                f" * {G.fnum(float(LM_Q))} + {G.fnum(0.5)}) as bigint)"
                " END"
            ),
        )
    )
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("__term_q").alias("lm2_q"),
    )
    return out.withColumn(
        "lm2_mean",
        F.expr(
            f"round((cast(lm2_q as double) / {G.fnum(float(LM_Q))})"
            " / n_bigrams, 6)"
        ),
    )


def extract_links(
    df: DataFrame, html: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, href, link_domain): anchor hrefs pulled from raw page
    payloads (binary or string) — the edge-extraction step that
    feeds `domain_authority`'s link graph straight from WARC HTML.
    link_domain is the lowercased host of absolute http(s) hrefs
    (NULL for relative links, which stay in `href` for resolution
    against the page url).

    Scale: regexp_extract_all + explode, all row-local inside
    whole-stage codegen — zero shuffle; the RE stays in the
    RE2/Java common subset like redact_pii's patterns.
    """
    c = F.col(html).cast("string")
    hrefs = F.regexp_extract_all(c, F.lit('href="([^"]*)"'), 1)
    out = df.select(
        F.col(id_col), F.explode(hrefs).alias("href")
    )
    dom = F.lower(
        F.regexp_extract(F.col("href"), "^https?://([^/]+)", 1)
    )
    return out.withColumn(
        "link_domain", F.when(dom != "", dom)
    )


def char_entropy(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution —
    the classic gibberish/binary-noise detector (low entropy =
    repeated filler, implausibly high = random bytes). Columns:
    n_chars_e (chars counted), ent_q (integer fixed-point sum),
    entropy (rounded nats).

    H = sum over chars c of (n_c/N) * ln(N/n_c); each term is
    quantized to the 2^-20 grid BEFORE the per-doc sum, so the
    aggregate is integer-exact under any partitioning.
    Scale: one row-local char explode + ONE map-side-combined
    groupBy per doc/char, then a per-doc fold.
    """
    ch = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text), "")).alias("__c"),
    ).where(F.col("__c") != "")
    per = ch.groupBy(id_col, "__c").agg(F.count(F.lit(1)).alias("cnt"))
    tot = per.groupBy(id_col).agg(F.sum("cnt").alias("n_chars_e"))
    terms = per.join(tot, on=id_col).withColumn(
        "__t_q",
        F.expr(
            "cast(floor((cast(cnt as double) / cast(n_chars_e as double))"
            " * ln(cast(n_chars_e as double) / cast(cnt as double))"
            f" * {G.fnum(float(LM_Q))} + {G.fnum(0.5)}) as bigint)"
        ),
    )
    out = terms.groupBy(id_col, "n_chars_e").agg(
        F.sum("__t_q").alias("ent_q")
    )
    return out.withColumn(
        "entropy",
        F.expr(f"round(cast(ent_q as double) / {G.fnum(float(LM_Q))}, 6)"),
    )


def latest_by_url(
    df: DataFrame,
    url: str = "url",
    ts: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Recrawl dedup: exactly one row per CANONICAL url — the most
    recent capture (ties on capture time break on highest id = last
    in crawl order). The Common-Crawl "keep the newest snapshot of
    every page" step, composed from canonical_url + one per-url
    group limit.

    Scale: canonicalization is row-local; the shuffle keys on
    canon_url; WindowGroupLimit keeps a 1-row heap per url instead
    of sorting capture histories.
    """
    from pyspark.sql import Window

    c = canonical_url(df, url=url)
    w = Window.partitionBy("canon_url").orderBy(
        F.col(ts).desc(), F.col(id_col).desc()
    )
    return (
        c.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk")
    )


def collocations(
    df: DataFrame,
    min_count: int = 5,
    top_k: int = 50,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information:
    PMI(w1,w2) = ln(N * c(w1,w2) / (c(w1) * c(w2))) over adjacent
    token pairs — the corpus-linguistics statistic behind multi-word
    tokenizer seeds and phrase mining. min_count suppresses the
    rare-pair PMI explosion (the standard fix).

    pmi_q is the 2^-20-quantized integer (sort key — exact across
    engines); ranking breaks ties on (w1, w2). N = total bigrams.

    Scale: bigrams explode row-locally (no window); both count
    tables are map-side-combined groupBys; the PMI projection joins
    unigram counts broadcast. Top-k is a global bottom-k heap.
    """
    arr = F.split(F.col(text), TOKEN_SEP)
    pairs = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - 2),
            lambda i: F.struct(
                F.element_at(arr, i + 1).alias("w1"),
                F.element_at(arr, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = df.select(F.explode(pairs).alias("bg")).select("bg.w1", "bg.w2")
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    uni = (
        bg.select(F.col("w1").alias("w"))
        .unionByName(bg.select(F.col("w2").alias("w")))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    )
    tot = c2.agg(F.sum("c2").alias("n_bg"))
    scored = (
        c2.where(F.col("c2") >= int(min_count))
        .join(F.broadcast(uni.withColumnRenamed("w", "w1")
                          .withColumnRenamed("cu", "c1a")), on="w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2")
                          .withColumnRenamed("cu", "c1b")), on="w2")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "pmi_q",
            F.expr(
                "cast(floor(ln(cast(n_bg as double)"
                " * cast(c2 as double)"
                " / (cast(c1a as double) * cast(c1b as double)))"
                f" * {G.fnum(float(LM_Q))} + {G.fnum(0.5)}) as bigint)"
            ),
        )
    )
    return (
        scored.orderBy(F.col("pmi_q").desc(), F.col("w1").asc(),
                       F.col("w2").asc())
        .limit(int(top_k))
        .select("w1", "w2", "c2", "pmi_q")
    )


def anchor_stats(
    df: DataFrame,
    html: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-target-domain anchor-text profile from raw page payloads:
    (link_domain, n_links, n_docs, top_anchor, top_anchor_n) — how
    often a domain is linked, from how many distinct source pages,
    and the most common anchor text pointing at it (count desc,
    lexical tie-break). Anchor text is the classic off-page
    relevance/quality signal (it describes the TARGET, written by a
    third party); the profile table feeds rankers and link-spam
    screens next to `domain_authority`.

    Scale: anchor snippets explode row-local inside codegen (the
    regexps stay in the RE2/Java common subset, like extract_links);
    the per-(domain, anchor) and per-domain aggregates are map-side-
    combined groupBys on the domain key — hot domains are ordinary
    skewed agg keys (AQE). The final stitch joins two domain-keyed
    counter tables, never the pages.
    """
    c = F.col(html).cast("string")
    snips = F.regexp_extract_all(
        c, F.lit('(<[aA][^>]*href="[^"]*"[^>]*>[^<]*<)'), 1
    )
    pairs = (
        df.select(F.col(id_col), F.explode(snips).alias("__s"))
        .select(
            id_col,
            F.regexp_extract(F.col("__s"), 'href="([^"]*)"', 1)
            .alias("href"),
            F.regexp_extract(F.col("__s"), ">([^<]*)<", 1)
            .alias("anchor"),
        )
        .withColumn(
            "link_domain",
            F.lower(
                F.regexp_extract(F.col("href"), "^https?://([^/]+)", 1)
            ),
        )
        .where(F.col("link_domain") != "")
    )
    per_dom = pairs.groupBy("link_domain").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    per_da = pairs.groupBy("link_domain", "anchor").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = Window.partitionBy("link_domain").orderBy(
        F.col("__n").desc(), F.col("anchor").asc()
    )
    top = (
        per_da.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select(
            "link_domain",
            F.col("anchor").alias("top_anchor"),
            F.col("__n").alias("top_anchor_n"),
        )
    )
    return per_dom.join(top, on="link_domain")


def url_rules_filter(
    df: DataFrame,
    rules: DataFrame,
    url: str = "url",
    id_col: str = "doc_id",
    default_allow: bool = True,
) -> DataFrame:
    """Robots-style longest-prefix URL policy: each row's `url` is
    checked against a small (prefix, allow) rule table; the LONGEST
    matching prefix decides (Google robots.txt semantics — most
    specific rule wins; on equal length allow beats deny; no match ->
    `default_allow`). Adds `allowed:boolean` and `rule_prefix` (the
    deciding rule, NULL when default applied); callers drop or keep.

    Scale: the rule table is a crawl policy — thousands of rows at
    most — so it BROADCASTS and the match is a row-local
    startswith probe per (url, rule) inside codegen; the longest-
    match pick is a per-url window over at most |rules| matched rows.
    The corpus never shuffles.
    """
    r = rules.select(
        F.col("prefix").alias("__pfx"),
        F.col("allow").cast("boolean").alias("__allow"),
    )
    j = df.join(
        F.broadcast(r),
        F.col(url).startswith(F.col("__pfx")),
        "left",
    )
    w = Window.partitionBy(id_col).orderBy(
        F.length("__pfx").desc_nulls_last(),
        F.col("__allow").desc_nulls_last(),
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .withColumn(
            "allowed",
            F.coalesce(F.col("__allow"), F.lit(default_allow)),
        )
        .withColumn("rule_prefix", F.col("__pfx"))
        .drop("__pfx", "__allow", "__rn")
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    vnodes: int = 8,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Consistent-hash shard assignment (Karger ring with `vnodes`
    virtual nodes per shard): each row goes to the shard owning the
    first ring position at or after its hash (wrapping past the top).
    THE property that matters for 100 TB serving/export layouts:
    growing n_shards -> n_shards+1 moves ONLY the keys the new shard
    captures (~1/(n+1) of them) — a plain `hash % n` remap moves
    almost everything, invalidating every cache/local file. Adds
    `shard:int`.

    Scale: the ring is n_shards * vnodes integers — built by ONE
    tiny Spark job from the shared mix_hash formula, collected, and
    folded into a LITERAL sorted-array expression, so assignment is
    a pure row-local codegen'd comparison chain: zero shuffle, zero
    join, the corpus never moves. Ties (two vnodes hashing equal)
    break to the smaller shard id on both engines.
    """
    ring = sorted(
        (int(p), int(s))
        for s in range(int(n_shards))
        for v in range(int(vnodes))
        for p in [_ring_pos(s, v, vnodes, salt)]
    )
    pos_arr = ", ".join(f"struct({p}L, {s})" for p, s in ring)
    h = G.mix_hash(f"(`{id_col}` * 2 + 1 + {int(salt)})")
    # first ring entry with pos >= h, else wrap to the global first
    expr = (
        f"coalesce(array_min(filter(array({pos_arr}),"
        f" x -> x.col1 >= {h})),"
        f" struct({ring[0][0]}L, {ring[0][1]}))"
    )
    return df.withColumn(
        "shard", F.expr(expr).getField("col2").cast("int")
    )


def _ring_pos(shard: int, vnode: int, vnodes: int, salt: int) -> int:
    """Ring position of (shard, vnode) — the same mix_hash formula
    both engines share, evaluated in Python on plain ints (the
    formula is +, *, % on int64, so this is exact)."""
    x = shard * 100003 + vnode * 1009 + salt
    m31 = 2147483647
    red = (x % m31 + m31) % m31
    h1 = ((red + 7) * 48271) % m31
    h2 = (h1 * 48271) % m31
    g = (h2 * h2) % m31
    return ((g + 7) * 48271) % m31


DSIR_Q = 1 << 20  # fixed-point grid for DSIR log-ratio terms


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    buckets: int = 64,
    vocab_df: DataFrame | None = None,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023 "Data Selection for
    Language Models via Importance Resampling"): score every raw-
    corpus document by how target-like its hashed unigram features
    are. Per token in bucket b the contribution is the add-one-
    smoothed log-likelihood ratio
        ln( (t_b + 1)(N_raw + B) / ((r_b + 1)(N_tgt + B)) )
    in DSIR_Q fixed point, each ln term quantized SEPARATELY
    (lnq(x) = floor(ln(x)*Q + 0.5) on an exact-integer double — the
    repo's cross-engine-exact convention, and overflow-free: no
    integer products ever form); the document weight is the sum over
    its token occurrences. Output:
    (doc_id, n_tokens, dsir_q). Resample by dsir_q (e.g. via
    sampling.weighted_sample) to tilt the corpus toward the target.

    Scale: two token-level passes build a B-row bucket table
    (map-side-combined counts — the shuffle carries <= B rows per
    partition); scoring is the token explode joined to the BROADCAST
    bucket table + one per-doc map-side-combined sum. Documents
    never shuffle by content; only (doc_id, bucket) pairs move.
    Bucket ids: dense-rank vocab + mix_hash in oracle mode
    (cross-engine mirrorable), xxhash64 row-local in scale mode.
    """
    B = int(buckets)

    def bucketed(d: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if with_id else []
        if vocab_df is None:
            t = tokens(d, text, id_col)
            return t.select(
                *cols,
                (F.abs(F.xxhash64("word")) % B).alias("b"),
            )
        t = token_ids(d, text, id_col, vocab_df)
        return t.select(
            *cols,
            F.expr(f"({G.mix_hash('word_id')}) % {B}").alias("b"),
        )

    r_cnt = bucketed(df, False).groupBy("b").agg(
        F.count(F.lit(1)).alias("r_cnt")
    )
    t_cnt = bucketed(target, False).groupBy("b").agg(
        F.count(F.lit(1)).alias("t_cnt")
    )
    grid = df.sparkSession.range(B).select(F.col("id").alias("b"))
    w = (
        grid.join(r_cnt, on="b", how="left")
        .join(t_cnt, on="b", how="left")
        .select(
            "b",
            F.coalesce("r_cnt", F.lit(0)).cast("long").alias("r_cnt"),
            F.coalesce("t_cnt", F.lit(0)).cast("long").alias("t_cnt"),
        )
        .crossJoin(
            F.broadcast(
                r_cnt.agg(F.sum("r_cnt").alias("n_raw")).crossJoin(
                    t_cnt.agg(F.sum("t_cnt").alias("n_tgt"))
                )
            )
        )
        .select(
            "b",
            F.expr(
                " + ".join(
                    f"cast(floor(ln(cast({x} as double))"
                    f" * {G.fnum(float(DSIR_Q))} + {G.fnum(0.5)})"
                    " as bigint)" if sgn > 0 else
                    f"- cast(floor(ln(cast({x} as double))"
                    f" * {G.fnum(float(DSIR_Q))} + {G.fnum(0.5)})"
                    " as bigint)"
                    for sgn, x in [
                        (1, "t_cnt + 1"), (1, f"n_raw + {B}"),
                        (-1, "r_cnt + 1"), (-1, f"n_tgt + {B}"),
                    ]
                )
            ).alias("w_q"),
        )
    )
    return (
        bucketed(df, True)
        .join(F.broadcast(w.select("b", "w_q")), on="b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_q").alias("dsir_q"),
        )
    )


BM25_Q = 1 << 20   # idf fixed-point grid
BM25_DQ = 1 << 20  # doc-length-ratio fixed-point grid


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 lexical retrieval (Robertson-Sparck Jones / Okapi,
    k1 = 1.2, b = 0.75 fixed as the exact rationals 6/5 and 3/4):
    top-k documents for a bag of query terms. Integer fixed-point
    throughout so rank AND score value-hash cross-engine:
      idf_q  = floor(ln((2N + 2)/(2df + 1)) * Q + 0.5)
               (the Lucene ln(1 + (N-df+.5)/(df+.5)) form — always
               positive, so common terms never invert length
               normalization the way raw RSJ idf does when df > N/2)
      dlq    = (dl * N * DQ) div SL            (dl/avgdl ratio)
      w_q    = (idf_q * 44 * DQ * tf) div
               (20 * DQ * tf + 6 * DQ + 18 * dlq)
    score_q = sum of w_q over matched query terms. Output:
    (doc_id, score_q, rank), rank by (score desc, doc asc).

    Scale: term stats (df) and corpus totals (N, SL) are one
    map-side-combined agg each over rows FILTERED to the query terms
    (the inverted-index access pattern — the corpus never shuffles;
    only (doc, term, tf) postings for queried terms move, the
    standard Spark form of a postings fetch). Top-k is
    TakeOrderedAndProject. int64 headroom: idf_q*44*DQ*tf needs
    tf * N-ratio products < ~2^63/2^47 — at extreme corpus sizes
    lower BM25_DQ one notch per 10x corpus growth.
    """
    tset = sorted({str(t) for t in terms})
    t = tokens(df, text, id_col)
    dl = t.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sl"),
    )
    post = (
        t.where(F.col("word").isin(tset))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = post.groupBy("word").agg(
        F.count(F.lit(1)).alias("df_t")
    )
    scored = (
        post.join(dfreq, on="word")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.expr(
                "cast(floor(ln(cast(2 * n_docs + 2 as double)"
                " / cast(2 * df_t + 1 as double))"
                f" * {G.fnum(float(BM25_Q))} + {G.fnum(0.5)}) as bigint)"
            ).alias("idf_q"),
            F.expr(
                f"(dl * n_docs * {BM25_DQ}) div sl"
            ).alias("dlq"),
            F.col("tf").cast("long").alias("tf"),
        )
        .select(
            F.col(id_col),
            F.expr(
                f"(idf_q * 44 * {BM25_DQ} * tf)"
                f" div (20 * cast({BM25_DQ} as bigint) * tf"
                f" + 6 * {BM25_DQ} + 18 * dlq)"
            ).alias("w_q"),
        )
        .groupBy(id_col)
        .agg(F.sum("w_q").alias("score_q"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score_q").desc(), F.col(id_col).asc())
    return (
        scored.orderBy(F.col("score_q").desc(), F.col(id_col).asc())
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w))
    )


RAKE_Q = 1 << 20  # fixed-point grid for the deg/freq word score


def rake_keywords(
    df: DataFrame,
    top_k: int = 20,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010 "Automatic Keyword
    Extraction from Individual Documents"): candidate phrases are the
    maximal stopword-free token runs; each word scores deg(w)/freq(w)
    where deg(w) = sum of the lengths of the phrases containing it
    (within-phrase co-occurrence, self included) and freq(w) = its
    occurrence count in candidates; a phrase scores the sum of its
    word scores. Corpus-level form: word statistics are corpus-global,
    so equal phrases score equally — output is the distinct top-k by
    (score DESC, phrase ASC) with occurrence counts.

    Everything is INTEGER: word score = (deg * RAKE_Q) div freq,
    phrase score = sum of integer word scores — no floats anywhere,
    so the DuckDB oracle hash-matches exactly.

    Scale: the stopword-run split is one per-doc window (cumulative
    stop count — the sessionize pattern over token position); the
    word-stat and phrase-score steps are map-side-combined groupBys;
    word scores broadcast back onto phrase members.
    """
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    toks = tokens(df, text, id_col).withColumn(
        "__stop", F.array_contains(stop_arr, F.col("word"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("pos").asc())
    runs = toks.withColumn(
        "__run",
        F.sum(F.when(F.col("__stop"), 1).otherwise(0)).over(w),
    ).where(~F.col("__stop"))
    phrases = runs.groupBy(id_col, "__run").agg(
        F.count(F.lit(1)).alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("word")))
                ),
                lambda s: s["word"],
            ),
            " ",
        ).alias("phrase"),
    )
    members = phrases.select(
        id_col, "__run", "plen", "phrase",
        F.explode(F.split(F.col("phrase"), TOKEN_SEP)).alias("word"),
    )
    wstats = members.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    ).withColumn(
        "score_q", F.expr(f"(deg * {RAKE_Q}) div freq")
    )
    pscore = (
        members.join(F.broadcast(wstats.select("word", "score_q")),
                     on="word")
        .groupBy(id_col, "__run", "phrase")
        .agg(F.sum("score_q").alias("phrase_q"))
    )
    return (
        pscore.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.max("phrase_q").alias("phrase_q"),
        )
        .orderBy(F.col("phrase_q").desc(), F.col("phrase").asc())
        .limit(int(top_k))
        .select("phrase", "phrase_q", "n_occ")
    )


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase query over a positional inverted index: docs
    where the tokens of `phrase` occur consecutively, with the match
    count (overlaps counted — "b b b" matches "b b" twice). The
    positional complement of bm25_topk's bag-of-words ranking; the
    postings are filtered to the query terms BEFORE any shuffle, so
    the corpus text never moves (same discipline as bm25_topk).

    Scale: len(phrase)-way self-equi-join on (doc, pos+i) over the
    filtered postings — hash joins on composite keys, AQE-splittable;
    candidate volume is bounded by the rarest term's postings.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    toks = tokens(df, text, id_col)
    base = (
        toks.where(F.col("word") == phrase[0])
        .select(F.col(id_col), F.col("pos").alias("p0"))
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = (
            toks.where(F.col("word") == term)
            .select(F.col(id_col), (F.col("pos") - i).alias("p0"))
        )
        base = base.join(nxt, on=[id_col, "p0"])
    return base.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matches")
    )


ZIPF_Q = 1 << 10  # coarse ln grid: keeps the OLS moment sums and the
#                  final num/den both < 2^53 (exact in double)


def zipf_fit(
    df: DataFrame,
    top_n: int = 20,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Zipf's-law fit of the term rank-frequency curve: OLS slope of
    ln(freq) on ln(rank) over the top_n terms (rank by freq DESC,
    word ASC). Healthy natural-language corpora fit slope ~ -1;
    machine-generated or template spam bends the curve — a corpus-
    level quality diagnostic next to the per-doc gopher_rules.

    ln terms quantize to the 2^-10 grid; the OLS numerator and
    denominator are then EXACT int64 sums, and the final slope is one
    IEEE division num/den (both < 2^53) — hash-exact cross-engine.
    Output: one row (n_terms, num, den, slope).

    Scale: term counts are one map-side-combined groupBy; the top-n
    heap is a TakeOrdered; the n-row OLS is a single tiny agg.
    """
    counts = (
        tokens(df, text, id_col)
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(int(top_n))
    )
    ranked = counts.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("word").asc())
        ),
    ).select(
        F.expr(
            "cast(floor(ln(cast(rank as double))"
            f" * {G.fnum(float(ZIPF_Q))} + {G.fnum(0.5)}) as bigint)"
        ).alias("x_q"),
        F.expr(
            "cast(floor(ln(cast(freq as double))"
            f" * {G.fnum(float(ZIPF_Q))} + {G.fnum(0.5)}) as bigint)"
        ).alias("y_q"),
    )
    mom = ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("x_q").alias("sx"),
        F.sum("y_q").alias("sy"),
        F.sum(F.expr("x_q * y_q")).alias("sxy"),
        F.sum(F.expr("x_q * x_q")).alias("sxx"),
    )
    return mom.select(
        "n_terms",
        F.expr("n_terms * sxy - sx * sy").alias("num"),
        F.expr("n_terms * sxx - sx * sx").alias("den"),
        F.expr(
            "cast(n_terms * sxy - sx * sy as double)"
            " / cast(n_terms * sxx - sx * sx as double)"
        ).alias("slope"),
    )


def textrank_keywords(
    df: DataFrame,
    iters: int = 3,
    top_k: int = 20,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph — nodes are non-stopword
    tokens, undirected edges join words ADJACENT after stopword
    removal (window = 2 on the filtered sequence, the paper's
    default). Runs the engine's integer truncating PageRank scheme
    (same arithmetic as graph.personalized_pagerank / domain
    authority, teleport to ALL nodes): bit-reproducible under any
    partitioning, so the unrolled-iteration DuckDB oracle matches
    hash-exactly. Output: the top_k words by (rank DESC, word ASC).

    Scale: the vocabulary graph is tiny relative to the corpus (node
    count = distinct content words), so each iteration's rank⋈edge
    join broadcasts; the corpus-sized work is one tokenize pass.
    """
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    kept = tokens(df, text, id_col).where(
        ~F.array_contains(stop_arr, F.col("word"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("pos").asc())
    seq = kept.withColumn("k", F.row_number().over(w))
    a = seq.select(id_col, "k", F.col("word").alias("w1"))
    b = seq.select(
        id_col, (F.col("k") - 1).alias("k"), F.col("word").alias("w2")
    )
    pairs = a.join(b, on=[id_col, "k"]).where(F.col("w1") != F.col("w2"))
    e = pairs.select(
        F.least("w1", "w2").alias("lo"),
        F.greatest("w1", "w2").alias("hi"),
    ).distinct()
    adj = e.select(F.col("lo").alias("u"), F.col("hi").alias("v")).unionByName(
        e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    nodes = adj.select(F.col("u").alias("node")).distinct().localCheckpoint(
        eager=False
    )
    tele = (int(scale) * (damping_den - damping_num)) // damping_den
    ranks = nodes.select("node", F.lit(int(scale)).cast("long").alias("r"))
    ed = adj.join(deg, on="u")
    for _ in range(int(iters)):
        contrib = (
            ed.join(ranks.select(F.col("node").alias("u"), "r"), on="u")
            .select(
                F.col("v").alias("node"),
                F.expr(
                    f"(r * {int(damping_num)})"
                    f" div (cast({int(damping_den)} as bigint) * d)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_r"))
        )
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(int(tele)).cast("long")
                    + F.coalesce(F.col("in_r"), F.lit(0).cast("long"))
                ).alias("r"),
            )
        ).localCheckpoint(eager=False)
    return (
        ranks.orderBy(F.col("r").desc(), F.col("node").asc())
        .limit(int(top_k))
        .select(F.col("node").alias("word"), F.col("r").alias("rank_q"))
    )


def trigram_logprob(
    df: DataFrame,
    train_df: DataFrame | None = None,
    text: str = "text",
    id_col: str = "doc_id",
    backoff: float = 0.4,
) -> DataFrame:
    """Per-document mean TRIGRAM log-likelihood with two-level stupid
    backoff (Brants et al. 2007) — the next order up the KenLM ladder
    from bigram_logprob: score(w3|w1 w2) = c3/c2 when the trigram was
    seen in training, else 0.4 * c2(w2,w3)/c1(w2), else 0.4^2 *
    add-one unigram p(w3). Train on ``train_df`` (defaults to df);
    the held-out form — train trusted, score crawl — is the filter.

    Columns: n_trigrams, lm3_q (integer fixed-point sum), lm3_mean.

    Scale: three map-side-combined count tables; scoring joins them
    onto row-locally exploded trigrams (broadcast while the n-gram
    tables fit — beyond that the joins hash-partition on the n-gram
    key, co-partitioned with the count aggregation's own shuffle);
    per-term ln quantized to the 2^-20 grid before the per-doc sum.
    """
    src = train_df if train_df is not None else df
    tt = tokens(src, text, id_col).select("word")
    c1 = tt.groupBy("word").agg(F.count(F.lit(1)).alias("c1"))
    tot = tt.agg(
        F.sum(F.lit(1)).alias("n_total"),
        F.count_distinct("word").alias("n_vocab"),
    )

    def ngrams(d: DataFrame, n: int, names: list[str]) -> DataFrame:
        arr = F.split(F.col(text), TOKEN_SEP)
        schema = ",".join(f"{c}:string" for c in names)
        grams = F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - n),
                lambda i: F.struct(
                    *[
                        F.element_at(arr, i + j + 1).alias(names[j])
                        for j in range(n)
                    ]
                ),
            ),
        ).otherwise(F.array().cast(f"array<struct<{schema}>>"))
        return d.select(
            F.col(id_col), F.explode(grams).alias("g")
        ).select(id_col, *[f"g.{c}" for c in names])

    c2 = ngrams(src, 2, ["w1", "w2"]).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2")
    )
    c3 = ngrams(src, 3, ["w1", "w2", "w3"]).groupBy(
        "w1", "w2", "w3"
    ).agg(F.count(F.lit(1)).alias("c3"))
    tg = ngrams(df, 3, ["w1", "w2", "w3"])
    lnq = G.fnum(float(LM_Q))
    bo = G.fnum(float(backoff))
    bo2 = G.fnum(float(backoff) * float(backoff))
    scored = (
        tg.join(F.broadcast(c3), on=["w1", "w2", "w3"], how="left")
        .join(F.broadcast(c2), on=["w1", "w2"], how="left")
        .join(
            F.broadcast(
                c2.select(F.col("w1").alias("w2"),
                          F.col("w2").alias("w3"),
                          F.col("c2").alias("c2b"))
            ),
            on=["w2", "w3"], how="left",
        )
        .join(
            F.broadcast(c1.select(F.col("word").alias("w2"),
                                  F.col("c1").alias("c1b"))),
            on="w2", how="left",
        )
        .join(
            F.broadcast(c1.select(F.col("word").alias("w3"),
                                  F.col("c1").alias("c1c"))),
            on="w3", how="left",
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "__term_q",
            F.expr(
                "CASE WHEN c3 IS NOT NULL THEN"
                " cast(floor(ln(cast(c3 as double) / cast(c2 as double))"
                f" * {lnq} + {G.fnum(0.5)}) as bigint)"
                " WHEN c2b IS NOT NULL THEN"
                f" cast(floor(ln({bo} * cast(c2b as double)"
                " / cast(c1b as double))"
                f" * {lnq} + {G.fnum(0.5)}) as bigint)"
                " ELSE"
                f" cast(floor(ln({bo2}"
                " * cast(coalesce(c1c, 0) + 1 as double)"
                " / cast(n_total + n_vocab as double))"
                f" * {lnq} + {G.fnum(0.5)}) as bigint)"
                " END"
            ),
        )
    )
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum("__term_q").alias("lm3_q"),
    )
    return out.withColumn(
        "lm3_mean",
        F.expr(
            f"round((cast(lm3_q as double) / {lnq})"
            " / n_trigrams, 6)"
        ),
    )


def kwic_snippets(
    df: DataFrame,
    term: str,
    width: int = 30,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keyword-in-context snippets: for every document containing
    `term` as a SUBSTRING, the first match position (1-based), the
    total occurrence count, and a snippet of `width` characters of
    context on each side — the retrieval-result display / corpus-QA
    op next to phrase_search's exact matching. Pure row-local string
    ops inside codegen; the corpus never shuffles.
    """
    t = term.replace("\\", "\\\\").replace("'", "''")
    pos = f"instr(`{text}`, '{t}')"
    start = f"greatest(1, {pos} - {int(width)})"
    ln = f"({int(width)} * 2 + {len(term)})"
    cnt = (
        f"cast((length(`{text}`) -"
        f" length(replace(`{text}`, '{t}', '')))"
        f" div {len(term)} as int)"
    )
    return (
        df.where(F.expr(f"{pos} > 0"))
        .select(
            F.col(id_col),
            F.expr(pos).cast("int").alias("first_pos"),
            F.expr(cnt).alias("n_matches"),
            F.expr(f"substr(`{text}`, {start}, {ln})").alias("snippet"),
        )
    )


def postings_varint_stats(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted-index layout statistics: per term, the sorted distinct
    posting list's delta-gap profile under Lucene-style varint (vInt)
    encoding — df_docs, max_gap, varint_bytes (total encoded size;
    the first posting stores its absolute id), and the fixed-point
    ratio vs raw 8-byte postings. The storage-planning op behind
    bm25_topk's postings: rare terms compress near 8x worse than
    dense ones, which is what decides posting-list tiering.

    varint size is PURE COMPARISONS (1 + [v>=2^7] + [v>=2^14] +
    [v>=2^21] + [v>=2^28] bytes) — no log, so every sum is
    int64-exact. One shuffle on the term (the posting aggregation
    itself); the delta window rides that same partitioning.
    """
    from pdal_spark import sqlgen as G

    post = (
        tokens(df, text, id_col)
        .select("word", F.col(id_col).alias("doc"))
        .distinct()
    )
    w = Window.partitionBy("word").orderBy(F.col("doc").asc())
    gap = (
        "CASE WHEN lag_doc IS NULL THEN doc ELSE doc - lag_doc END"
    )
    vbytes = (
        "cast(1 + CASE WHEN g >= 128 THEN 1 ELSE 0 END"
        " + CASE WHEN g >= 16384 THEN 1 ELSE 0 END"
        " + CASE WHEN g >= 2097152 THEN 1 ELSE 0 END"
        " + CASE WHEN g >= 268435456 THEN 1 ELSE 0 END as bigint)"
    )
    gaps = (
        post.withColumn("lag_doc", F.lag("doc").over(w))
        .withColumn("g", F.expr(gap))
        .withColumn("vb", F.expr(vbytes))
    )
    agg = gaps.groupBy("word").agg(
        F.count(F.lit(1)).alias("df_docs"),
        F.max(F.when(F.col("lag_doc").isNotNull(), F.col("g"))).alias(
            "max_gap"
        ),
        F.sum("vb").alias("varint_bytes"),
    )
    return agg.select(
        "word", "df_docs", "max_gap", "varint_bytes",
        F.expr(
            f"(varint_bytes * {1 << 20}) div (df_docs * 8)"
        ).alias("ratio_q"),
    )


FH_DIM_DEFAULT = 256


def hashed_features(
    df: DataFrame,
    dim: int = FH_DIM_DEFAULT,
    text: str = "text",
    id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """Hashing-trick text vectorizer (Weinberger et al. 2009): sparse
    per-document term counts folded into a fixed `dim`-bucket index
    via mix_hash over the deterministic word_id, with a signed hash
    bit canceling collision bias (the same hashed-unigram convention
    as dsir_weights — word ids rather than raw-string hashes keep the
    arithmetic dialect-neutral). Output: (doc, idx, val) sparse
    triplets, val = signed count (exact integers) — the featurizer in
    front of nb_classifier / similarity ops.

    Scale: row-local token explode + the word_id join (broadcast
    while the vocab fits, hash-partitioned co-located with the vocab
    build beyond) + ONE map-side-combined groupBy on (doc, idx).
    """
    from pdal_spark import sqlgen as G

    v = vocab_df if vocab_df is not None else vocab(df, text)
    h = G.mix_hash("word_id")
    toks = tokens(df, text, id_col).join(
        F.broadcast(v), on="word"
    ).select(
        F.col(id_col),
        F.expr(f"({h}) % {int(dim)}").alias("idx"),
        F.expr(
            f"CASE WHEN (({h}) div {int(dim)}) % 2 = 0"
            " THEN 1 ELSE -1 END"
        ).alias("sgn"),
    )
    return (
        toks.groupBy(id_col, "idx")
        .agg(F.sum("sgn").alias("val"))
        .where(F.col("val") != 0)
    )


def oov_rate(
    df: DataFrame,
    train_df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Out-of-vocabulary rate per document against a reference
    corpus's vocabulary — the tokenizer/domain-shift QA stat (a crawl
    slice whose OOV rate spikes is a new domain, a new language, or
    garbage): n_tokens, n_oov, oov_q = (n_oov * 2^20) div n_tokens.

    Scale: the vocab is a distinct-word table (broadcast-able while
    it fits; beyond that the probe is a hash left-join co-partitioned
    with the vocab build); integer ratio, partitioning-invariant.
    """
    vocab_t = (
        tokens(train_df, text, id_col).select("word").distinct()
        .withColumn("__in", F.lit(1))
    )
    probe = tokens(df, text, id_col).join(
        F.broadcast(vocab_t), on="word", how="left"
    )
    return probe.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias(
            "n_oov"
        ),
    ).withColumn(
        "oov_q", F.expr(f"(n_oov * {1 << 20}) div n_tokens")
    )


def crawl_schedule(
    df: DataFrame,
    delay_ms: int = 1000,
    url: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Politeness-aware crawl schedule: within each host, order URLs
    deterministically (url, id) and assign fetch slot k and time
    offset k * delay_ms — the per-domain rate budget every polite
    crawler enforces (one fetch per delay per host; robots.txt
    crawl-delay semantics). Hosts parallelize freely; the schedule
    is a pure function of the frontier, so a re-run resumes
    idempotently. Output: (id, host, slot, t_offset_ms).

    Scale: ONE shuffle on the host key; hot hosts are inherently
    serialized by politeness (that is the point), so skew here is a
    schedule-length fact, not a compute problem — the skew_report's
    host histogram tells you the makespan before you run.
    """
    host = (
        f"lower(regexp_extract(`{url}`,"
        " '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1))"
    )
    w = Window.partitionBy(F.expr(host)).orderBy(
        F.col(url).asc(), F.col(id_col).asc()
    )
    return df.select(
        F.col(id_col),
        F.expr(host).alias("host"),
        (F.row_number().over(w) - 1).alias("slot"),
    ).withColumn(
        "t_offset_ms", F.expr(f"slot * cast({int(delay_ms)} as bigint)")
    )


def url_features(
    df: DataFrame, url: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Row-local URL structure features — the crawl-prioritization /
    spam-triage vector (homepage-ness, depth, query noise are strong
    priors before any content is fetched): host, path_depth (non-
    empty segments), n_query_params, path_len, is_homepage, is_https,
    has_fragment. Pure codegen string ops; no shuffle.
    """
    host = (
        f"lower(regexp_extract(`{url}`,"
        " '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1))"
    )
    path = (
        f"regexp_extract(`{url}`,"
        " '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
    )
    query = f"regexp_extract(`{url}`, '\\\\?([^#]*)', 1)"
    depth = (
        f"cast(length(regexp_replace({path}, '[^/]', ''))"
        f" - CASE WHEN {path} LIKE '%/' THEN 1 ELSE 0 END as int)"
    )
    nq = (
        f"CASE WHEN length({query}) = 0 THEN 0 ELSE"
        f" cast(length(regexp_replace({query}, '[^&]', ''))"
        " + 1 as int) END"
    )
    return df.select(
        F.col(id_col),
        F.expr(host).alias("host"),
        F.expr(f"length({path})").cast("int").alias("path_len"),
        F.expr(depth).alias("path_depth"),
        F.expr(nq).alias("n_query_params"),
        F.expr(
            f"({path} = '' OR {path} = '/')"
        ).alias("is_homepage"),
        F.expr(f"`{url}` LIKE 'https://%'").alias("is_https"),
        F.expr(f"`{url}` LIKE '%#%'").alias("has_fragment"),
    )


LOGODDS_Q = 1 << 20


def log_odds_keywords(
    df_a: DataFrame,
    df_b: DataFrame,
    top_k: int = 20,
    prior: int = 1,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Discriminating keywords between two corpus slices by smoothed
    log-odds (the Monroe et al. 2008 "Fightin' Words" family with a
    flat Dirichlet prior): delta(w) = ln((ca+p)/(Ta+P-ca-p)) -
    ln((cb+p)/(Tb+P-cb-p)) over the shared vocabulary — what words
    distinguish slice A from B (domain drift, community lingo, spam
    signatures), where raw frequency ratios explode on rare words and
    tf-idf ignores the contrast entirely. Output: top_k by delta_q
    DESC (A-flavored) — run with the slices swapped for B's words.

    Every ln argument is a ratio of exact integers; terms quantize to
    the 2^-20 grid so delta_q is a hash-exact int64.

    Scale: two map-side-combined count tables joined on word (full
    outer — vocabulary union) + a top-k heap.
    """
    from pdal_spark import sqlgen as G

    ca = tokens(df_a, text, id_col).groupBy("word").agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = tokens(df_b, text, id_col).groupBy("word").agg(
        F.count(F.lit(1)).alias("cb")
    )
    j = ca.join(cb, on="word", how="outer").select(
        "word",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = j.agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb"),
        F.count(F.lit(1)).alias("v"),
    )
    p = int(prior)
    lnq = G.fnum(float(LOGODDS_Q))

    def term(c: str, t: str) -> str:
        num = f"cast({c} + {p} as double)"
        den = f"cast({t} + {p} * v - {c} - {p} as double)"
        return (
            f"cast(floor(ln({num} / {den}) * {lnq}"
            f" + {G.fnum(0.5)}) as bigint)"
        )

    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "word", "ca", "cb",
            F.expr(
                f"({term('ca', 'ta')}) - ({term('cb', 'tb')})"
            ).alias("delta_q"),
        )
        .orderBy(F.col("delta_q").desc(), F.col("word").asc())
        .limit(int(top_k))
    )


def boilerplate_strip(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    stop_pct: int = 10,
    out: str = "clean_text",
) -> DataFrame:
    """jusText/trafilatura-style boilerplate LINE removal — the
    content-extraction pass between extract_text and quality
    filtering in a web-corpus pipeline (nav bars, cookie banners,
    footers come out as short / stopword-free lines).

    A line is CONTENT iff it has >= ``min_words`` words AND its
    stopword share clears ``stop_pct`` percent (integer
    cross-multiplication — no float ratio, oracle-exact):
    n_stop * 100 >= n_words * stop_pct. Adds ``out`` (kept lines
    re-joined), n_lines_total, n_lines_kept.

    Pure Catalyst array lambdas over split lines — row-local, zero
    shuffle, rides the scan. The stopword list is the module's
    STOPWORDS (shared with every oracle).
    """
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])

    def words_of(line):
        return F.filter(F.split(line, " "), lambda w: w != "")

    def is_content(line):
        ws = words_of(line)
        n = F.size(ws)
        n_stop = F.size(F.filter(
            ws, lambda w: F.array_contains(stop_arr, F.lower(w))
        ))
        return (n >= int(min_words)) & (
            n_stop * 100 >= n * int(stop_pct)
        )

    lines = F.split(F.col(text), "\n")
    kept = F.filter(lines, is_content)
    return (
        df.withColumn("n_lines_total", F.size(lines))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn(out, F.array_join(kept, "\n"))
    )


def robots_rules(
    urls: DataFrame,
    rules: DataFrame,
    host: str = "host",
    path: str = "path",
    url_id: str = "url_id",
    prefix: str = "path_prefix",
    allow: str = "allow",
) -> DataFrame:
    """Longest-match robots.txt rule evaluation (RFC 9309 / Google
    semantics): among the host's rules whose path-prefix matches the
    URL path, the LONGEST prefix wins; an allow/disallow tie at
    equal length resolves to allow; a URL with no matching rule is
    allowed. Output: (url_id, host, path, allowed, rule_prefix,
    rule_len) with rule_prefix = '' / rule_len = 0 for the
    no-match default.

    Scale: robots tables are tiny next to the URL corpus, so the
    rules side is broadcast — the corpus never shuffles; the prefix
    test is a codegen'd startswith, and the winner is one
    WindowGroupLimit (rank 1) per URL.
    """
    r = rules.select(
        F.col(host).alias("__rh"),
        F.col(prefix).alias("rule_prefix"),
        F.col(allow).cast("boolean").alias("__allow"),
        F.length(prefix).alias("rule_len"),
    )
    j = urls.select(url_id, host, path).join(
        F.broadcast(r),
        (F.col(host) == F.col("__rh"))
        & F.col(path).startswith(F.col("rule_prefix")),
        "left",
    )
    w = Window.partitionBy(url_id).orderBy(
        F.col("rule_len").desc_nulls_last(),
        F.col("__allow").desc_nulls_last(),
        F.col("rule_prefix").asc_nulls_last(),
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .select(
            url_id, host, path,
            F.coalesce("__allow", F.lit(True)).alias("allowed"),
            F.coalesce("rule_prefix", F.lit("")).alias("rule_prefix"),
            F.coalesce("rule_len", F.lit(0)).alias("rule_len"),
        )
    )


PMI_Q = 1 << 24


def pmi_collocations(
    df: DataFrame,
    text: str = "text",
    min_count: int = 3,
    top_k: int = 50,
    q: int = PMI_Q,
) -> DataFrame:
    """Corpus collocations by pointwise mutual information
    (Church & Hanks 1990): for each adjacent bigram (a,b),

        pmi = ln( (c_ab/N_b) / ((c_a/N_t)(c_b/N_t)) )

    computed as the INTEGER difference lnq(c_ab*N_t*N_t) -
    lnq(c_a*c_b*N_b) with lnq(x) = floor(ln(x)*q + 0.5) on exact-
    integer doubles — the house fixed-point-ln discipline, so the
    ranking is bit-reproducible (products must stay < 2^53; at
    web scale feed pre-aggregated shard counts, not raw tokens).
    Output: top_k rows (a, b, c_ab, pmi_q) by (pmi_q DESC, a, b)
    among bigrams with c_ab >= min_count.

    Scale: bigrams explode ROW-LOCALLY from the token array (no
    window, no self-join); both count aggs are map-side combined;
    the unigram joins hash on the token. N_t/N_b ride as broadcast
    1-row literals.
    """
    # house tokenization (single-space split, gate.py _TOKS)
    base = df.select(F.split(F.col(text), " ").alias("__t"))
    big = base.select(
        F.explode(
            F.expr(
                "transform(slice(__t, 1, greatest(size(__t)-1, 0)),"
                " (w, i) -> struct(w AS a, __t[i+1] AS b))"
            )
        ).alias("__bg")
    ).select("__bg.a", "__bg.b")
    uni = (
        base.select(F.explode("__t").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    )
    bg = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    n_t = uni.agg(F.sum("c_w").alias("n")).collect()[0]["n"]
    n_b = bg.agg(F.sum("c_ab").alias("n")).collect()[0]["n"]
    qs = G.fnum(float(int(q)))
    scored = (
        bg.where(F.col("c_ab") >= int(min_count))
        .join(uni.withColumnRenamed("c_w", "c_a"),
              F.col("a") == F.col("w")).drop("w")
        .join(uni.withColumnRenamed("c_w", "c_b"),
              F.col("b") == F.col("w")).drop("w")
        .withColumn(
            "pmi_q",
            F.expr(
                f"cast(floor(ln(cast(c_ab * {n_t}L * {n_t}L"
                f" as double)) * {qs} + 0.5e0) as bigint)"
                f" - cast(floor(ln(cast(c_a * c_b * {n_b}L"
                f" as double)) * {qs} + 0.5e0) as bigint)"
            ),
        )
    )
    # TakeOrderedAndProject top-k (per-partition heaps), THEN rank
    # the <=k survivors — never a one-partition window over the
    # full bigram table.
    top = scored.orderBy(
        F.col("pmi_q").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(int(top_k))
    w = Window.orderBy(
        F.col("pmi_q").desc(), F.col("a").asc(), F.col("b").asc()
    )
    return top.select(
        "a", "b", "c_ab", "pmi_q",
        F.row_number().over(w).alias("rank"),
    )


PPL_SHIFT_STEPS = 64  # > -ln p_min for any corpus < e^64 tokens


def perplexity_buckets(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    buckets: int = 3,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek 2020: score every
    document under a reference LM, split the corpus into
    head/middle/tail thirds; train preferentially on the head).
    The LM is the corpus unigram model of `unigram_logprob`; docs
    rank by the integer mean key

        mean_key = (lm_q + n_tokens * 64 * LM_Q) * 1000
                   div n_tokens

    (the shift makes the numerator non-negative — Spark `div`
    truncates toward zero vs DuckDB floor, they agree only there;
    monotone in mean logprob, so the order is exact). bucket =
    ((rank-1) * buckets) div n_docs with rank DESC: bucket 0 =
    head (most fluent), buckets-1 = tail. Output: (id, n_tokens,
    lm_q, mean_key, bucket).

    Scale: unigram_logprob's one groupBy + broadcast-vocab join,
    then functions.rank.scalable_row_number for the global rank —
    never a one-partition window.
    """
    from pdal_spark.functions.rank import scalable_row_number

    off = PPL_SHIFT_STEPS * LM_Q
    scored = unigram_logprob(df, text, id_col).withColumn(
        "mean_key",
        F.expr(f"((lm_q + n_tokens * {off}L) * 1000L)"
               " div n_tokens"),
    )
    n_docs = scored.count()
    b = int(buckets)
    ranked = scalable_row_number(
        scored,
        [F.col("mean_key").desc(), F.col(id_col).asc()],
        out="__rn",
    )
    return ranked.select(
        id_col, "n_tokens", "lm_q", "mean_key",
        F.expr(f"cast(((__rn - 1) * {b}) div {n_docs} as int)")
        .alias("bucket"),
    )


def ngram_novelty(
    scored: DataFrame,
    reference: DataFrame,
    n: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram novelty against a reference corpus (the
    memorization/diversity readout of Lee et al. 2022's dedup
    analyses: what fraction of a candidate doc's word n-grams never
    occur in the corpus you already have?). Output: (id, n_grams,
    n_novel) — exact integer counts; novelty = n_novel/n_grams is
    the caller's one division.

    Scale: n-grams explode ROW-LOCALLY from the token array; the
    reference side reduces to DISTINCT n-grams before the join
    (bounded by reference vocabulary, not size); the membership
    test is one hash left-anti-style join with map-side-combined
    counts on both ends.
    """
    nn = int(n)

    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(slice(__t, 1, greatest(size(__t)"
                    f" - {nn - 1}, 0)), (w, i) -> "
                    + "concat_ws(' ', "
                    + ", ".join(
                        ("w" if j == 0 else f"__t[i + {j}]")
                        for j in range(nn)
                    )
                    + "))"
                )
            ).alias("g"),
        )

    sc = scored.withColumn("__t", F.split(F.col(text), " "))
    rf = reference.withColumn("__t", F.split(F.col(text), " "))
    ref_set = grams(rf).select("g").distinct() \
        .withColumn("__seen", F.lit(1))
    j = grams(sc).join(ref_set, on="g", how="left")
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0))
        .alias("n_novel"),
    )


def oov_curve(
    df: DataFrame,
    vocab_sizes: list[int],
    text: str = "text",
) -> DataFrame:
    """Out-of-vocabulary rate as a function of vocabulary size (the
    tokenizer-budget curve: how much of the corpus does a top-k
    word vocabulary cover?). Vocabulary ranks by (count DESC, word
    ASC); for each requested k the output row carries exact integer
    (vocab_k, n_tokens, n_oov).

    Scale: one token count agg; the rank comes from
    functions.rank.scalable_row_number over the VOCABULARY (not the
    corpus), then one broadcast-size conditional aggregation —
    tokens themselves are counted once, never exploded per k.
    """
    from pdal_spark.functions.rank import scalable_row_number

    ks = sorted(int(k) for k in vocab_sizes)
    cnt = (
        df.select(F.explode(F.split(F.col(text), " ")).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = scalable_row_number(
        cnt, [F.col("c").desc(), F.col("w").asc()], out="__rank"
    )
    total = ranked.agg(
        F.sum("c").alias("n_tokens")).collect()[0]["n_tokens"]
    per_k = ranked.select(
        F.explode(
            F.array(*[F.lit(k) for k in ks])).alias("vocab_k"),
        "c", "__rank",
    ).groupBy("vocab_k").agg(
        F.sum(F.when(F.col("__rank") > F.col("vocab_k"),
                     F.col("c")).otherwise(0)).alias("n_oov"),
    )
    return per_k.select(
        "vocab_k",
        F.lit(int(total)).cast("long").alias("n_tokens"),
        "n_oov",
    )


def line_dedup(
    df: DataFrame,
    text: str = "text",
    doc_id: str = "doc_id",
    min_docs: int = 2,
    min_len: int = 1,
    sep: str = "\n",
    keep_first: bool = False,
) -> DataFrame:
    """C4-style corpus-wide line deduplication (Raffel et al. 2020
    §2.2 / CCNet paragraph dedup): a line whose trimmed form is at
    least `min_len` chars and occurs in >= `min_docs` DISTINCT
    documents is boilerplate — dropped from every document (or from
    all but its globally first (doc_id, pos) occurrence when
    `keep_first=True`, the CCNet convention). Shorter lines are
    structural (headings, blanks) and always kept. Documents are
    reassembled in original line order; a fully-boilerplate document
    survives as an empty string (count-stable — the caller decides
    whether to drop empties).

    Output: (doc_id, text, n_kept, n_dropped).

    Scale: explode to lines (linear), ONE map-side-combined groupBy
    on the line string for corpus counts (count distinct docs is the
    only expensive agg — it is exact here; swap for approx_count
    _distinct at 100 TB where min_docs >> error), one hash join back
    on the line, one reassembly agg keyed by doc. No window over the
    corpus; the per-doc sort happens inside array_sort on collected
    (pos, line) structs, bounded by document size.
    """
    lines = df.select(
        F.col(doc_id).alias("__doc"),
        F.posexplode(F.split(F.col(text), sep)).alias("__pos", "__line"),
    )
    elig = F.length(F.trim(F.col("__line"))) >= int(min_len)
    counts = (
        lines.where(elig)
        .groupBy("__line")
        .agg(
            F.countDistinct("__doc").alias("__nd"),
            F.min(F.struct("__doc", "__pos")).alias("__first"),
        )
        .where(F.col("__nd") >= int(min_docs))
    )
    j = lines.join(counts, on="__line", how="left")
    is_dup = F.col("__nd").isNotNull()
    if keep_first:
        is_first = (F.col("__first.__doc") == F.col("__doc")) & (
            F.col("__first.__pos") == F.col("__pos")
        )
        keep = (~is_dup) | is_first
    else:
        keep = ~is_dup
    tagged = j.select(
        "__doc", "__pos", "__line", keep.alias("__keep")
    )
    return (
        tagged.groupBy("__doc")
        .agg(
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(
                                F.struct("__pos", "__line", "__keep")
                            )
                        ),
                        lambda s: s["__keep"],
                    ),
                    lambda s: s["__line"],
                ),
                sep,
            ).alias("text"),
            F.sum(F.when(F.col("__keep"), 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.sum(F.when(F.col("__keep"), 0).otherwise(1)).alias(
                "n_dropped"
            ),
        )
        .withColumnRenamed("__doc", doc_id)
    )


def luhn_flags(
    df: DataFrame,
    text: str = "text",
    doc_id: str = "doc_id",
    min_digits: int = 13,
    max_digits: int = 19,
) -> DataFrame:
    """Payment-card candidate detection for PII auditing: every
    maximal digit run of `min_digits`..`max_digits` chars (the
    PAN length range) is checked against the Luhn mod-10 checksum
    (ISO/IEC 7812) — the validity bit that separates card numbers
    from ids/timestamps and keeps redact_pii's recall measurable.

    Output: (doc_id, cand_idx, cand, n_digits, luhn_valid) — one row
    per candidate run, cand_idx = 0-based order of the run in the
    document.

    Scale: pure Catalyst — regex split to digit runs, one explode
    bounded by candidates-per-doc, checksum via transform/aggregate
    on the char array (whole-stage codegen, no UDF, no shuffle at
    all: the op is embarrassingly row-local).
    """
    runs = F.filter(
        F.split(F.col(text), "[^0-9]+"),
        lambda s: (F.length(s) >= int(min_digits))
        & (F.length(s) <= int(max_digits)),
    )
    cand = df.select(
        F.col(doc_id),
        F.posexplode(runs).alias("cand_idx", "cand"),
    )
    # Luhn over the REVERSED digit string: odd 1-based positions
    # from the right add d, even positions add 2d (minus 9 when
    # 2d > 9). transform's index arg i is 0-based = position-1.
    # filter() guards the engine-version-dependent trailing '' that
    # split-on-empty-pattern can emit
    rev = F.filter(
        F.split(F.reverse(F.col("cand")), ""),
        lambda s: s != F.lit(""),
    )
    terms = F.transform(
        rev,
        lambda ch, i: F.when(
            i % 2 == F.lit(0), ch.cast("int")
        ).otherwise(
            ch.cast("int") * 2
            - F.when(ch.cast("int") >= 5, 9).otherwise(0)
        ),
    )
    total = F.aggregate(
        terms, F.lit(0), lambda acc, x: acc + x
    )
    return cand.select(
        doc_id,
        "cand_idx",
        "cand",
        F.length("cand").alias("n_digits"),
        (total % 10 == 0).cast("int").alias("luhn_valid"),
    )


def url_path_rollup(
    df: DataFrame,
    url: str = "url",
    max_depth: int = 8,
) -> DataFrame:
    """Hierarchical URL path-prefix rollup (the sitemap-mining /
    crawl-frontier shape: how many pages live under each path
    subtree of each host). Every page contributes its cumulative
    path prefixes up to `max_depth` — depth 0 is the host root '/',
    depth k the first k path segments — and the rollup is ONE
    aggregation over the exploded prefixes: (host, depth, prefix,
    n_pages, n_urls).

    Query/fragment parts are excluded from the path; empty segments
    (double slashes, trailing slash) collapse, matching the
    canonical_url convention.

    Scale: fan-out is bounded by max_depth+1 rows per page (explode
    of a sequence, linear), then one map-side-combined hash agg.
    n_urls is exact count(distinct) — swap for approx_count_distinct
    at 100 TB. Host skew (one giant site) is ordinary groupBy skew:
    AQE splits it; no join anywhere.
    """
    host = F.lower(
        F.regexp_extract(
            F.col(url), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1
        )
    )
    path = F.regexp_extract(
        F.col(url), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    segs = F.filter(
        F.split(path, "/"), lambda s: s != F.lit("")
    )
    base = df.select(
        F.col(url).alias("__url"),
        host.alias("host"),
        segs.alias("__segs"),
    )
    depth = F.explode(
        F.sequence(
            F.lit(0), F.least(F.size("__segs"), F.lit(int(max_depth)))
        )
    ).alias("depth")
    pre = base.select("__url", "host", "__segs", depth).select(
        "__url",
        "host",
        "depth",
        F.concat(
            F.lit("/"),
            F.array_join(F.slice("__segs", 1, F.col("depth")), "/"),
        ).alias("prefix"),
    )
    return pre.groupBy("host", "depth", "prefix").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("__url").alias("n_urls"),
    )


KL_Q = 1 << 20


def unigram_kl(
    df_a: DataFrame,
    df_b: DataFrame,
    text: str = "text",
    q: int = KL_Q,
) -> DataFrame:
    """Smoothed unigram KL divergence KL(A || B) between two corpus
    slices — the domain-shift / contamination-drift diagnostic that
    complements dsir_weights (which reweights docs; this MEASURES
    the shift). With add-one smoothing over the union vocabulary V,

        p_a(w) = (c_a+1)/(N_a+V),  p_b(w) = (c_b+1)/(N_b+V),
        KL = sum_w p_a(w) * ln(p_a(w)/p_b(w)).

    Emitted per word as the exact integer

        contrib_q = (c_a+1) * (lnq((c_a+1)*(N_b+V))
                               - lnq((c_b+1)*(N_a+V)))

    (house fixed-point-ln: lnq(x) = floor(ln(x)*q + 0.5) on
    exact-integer doubles; KL in nats = sum(contrib_q)/q/(N_a+V)).
    Output: (word, c_a, c_b, contrib_q). Products must stay < 2^53
    — at web scale feed pre-aggregated shard counts.

    Scale: two map-side-combined token-count aggs, one full-outer
    hash join on the word, three scalar totals collected once
    (two-phase aggregate); the per-word math is pure codegen.
    """
    def counts(df, out):
        return (
            df.select(F.explode(F.split(F.col(text), " ")).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias(out))
        )

    ca = counts(df_a, "c_a")
    cb = counts(df_b, "c_b")
    j = (
        ca.join(cb, on="w", how="full_outer")
        .select(
            F.col("w").alias("word"),
            F.coalesce("c_a", F.lit(0)).alias("c_a"),
            F.coalesce("c_b", F.lit(0)).alias("c_b"),
        )
    )
    tot = j.agg(
        F.sum("c_a").alias("na"),
        F.sum("c_b").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    na_v = int(tot["na"]) + int(tot["v"])
    nb_v = int(tot["nb"]) + int(tot["v"])
    qs = G.fnum(float(int(q)))
    return j.withColumn(
        "contrib_q",
        F.expr(
            f"(c_a + 1L) * ("
            f"cast(floor(ln(cast((c_a + 1L) * {nb_v}L as double))"
            f" * {qs} + 0.5e0) as bigint)"
            f" - cast(floor(ln(cast((c_b + 1L) * {na_v}L as double))"
            f" * {qs} + 0.5e0) as bigint))"
        ),
    )


def fair_budget(
    df: DataFrame,
    group: str = "host",
    demand: str = "demand",
    budget: int = 0,
) -> DataFrame:
    """Max-min fair (water-filling) allocation of an integer budget
    across groups — crawl-slot budgeting per host, token budgets per
    source in a data-mixing recipe: every group with demand below
    the water level is fully satisfied; the rest split the remainder
    equally (integer base + largest-remainder +1s, deterministic by
    the (demand, group) sort). Exact integer algebra end to end.

        satisfied_r  iff  d_r * (n - r + 1) <= B - P_{r-1}
        (ranks r by demand asc; P = prefix demand sum)
        alloc = d (satisfied) | base [+1 for the first `rem`
        unsatisfied ranks],  base = (B - P_S) div m,
        rem = (B - P_S) mod m,  m = #unsatisfied.

    Output: (group, demand, alloc). When B >= total demand everyone
    gets d (leftover stays unallocated — the caller's loop re-bids).

    Scale: operates on the per-group AGGREGATE (hosts/sources —
    orders of magnitude below the corpus); the global sort window is
    over that small table, the corpus itself never enters. Integer
    div/mod on non-negative operands — engine-agnostic.
    """
    b = int(budget)
    w_ord = Window.orderBy(F.col("__d").asc(), F.col("__g").asc())
    w_run = w_ord.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)
    w_all = w_ord.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    base = df.select(
        F.col(group).alias("__g"),
        F.col(demand).cast("long").alias("__d"),
    )
    ranked = (
        base.withColumn("__r", F.row_number().over(w_ord))
        .withColumn("__p", F.sum("__d").over(w_run))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
    )
    sat = (
        F.col("__d") * (F.col("__n") - F.col("__r") + 1)
        <= F.lit(b) - (F.col("__p") - F.col("__d"))
    )
    flagged = (
        ranked.withColumn("__sat", sat)
        .withColumn(
            "__ns",
            F.sum(F.when(F.col("__sat"), 1).otherwise(0)).over(w_all),
        )
        .withColumn(
            "__ps",
            F.sum(F.when(F.col("__sat"), F.col("__d"))
                  .otherwise(0)).over(w_all),
        )
    )
    # the otherwise-branch only evaluates on unsatisfied rows, whose
    # existence implies m = __n - __ns >= 1 (no div-by-zero in ANSI)
    alloc = F.when(F.col("__sat"), F.col("__d")).otherwise(
        F.expr(f"({b}L - __ps) div (__n - __ns)")
        + F.when(
            F.col("__r") - F.col("__ns")
            <= F.expr(f"({b}L - __ps) % (__n - __ns)"),
            1,
        ).otherwise(0)
    )
    return flagged.select(
        F.col("__g").alias(group),
        F.col("__d").alias("demand"),
        alloc.cast("long").alias("alloc"),
    )


MIX_Q = 1 << 20


def mixing_plan(
    df: DataFrame,
    source: str = "source",
    avail: str = "n_tokens",
    weight: str = "weight_q",
    budget: int = 0,
) -> DataFrame:
    """Data-mixing planner: given per-source available token counts
    and integer mixture weights, split a token budget T into
    per-source targets target_i = T * w_i / sum(w) with
    largest-remainder rounding (sum(target) == T exactly), and emit
    the sampling geometry a loader needs: full passes over the
    source (epochs = target div avail) plus the residual token count
    of the final partial pass, and the upsampling factor in fixed
    point (rate_q = target * 2^20 div avail; > 2^20 means the
    source repeats).

    Output: (source, avail, weight_q, target, epochs, residual,
    rate_q) — all exact integers; products stay < 2^63 for
    T, w < 2^31.

    Scale: windows over the per-source table only (a handful to
    thousands of rows); the corpus never enters.
    """
    b = int(budget)
    w_all = Window.orderBy(F.col("__s").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_rem = Window.orderBy(
        F.col("__rem").desc(), F.col("__s").asc()
    )
    base = df.select(
        F.col(source).alias("__s"),
        F.col(avail).cast("long").alias("__a"),
        F.col(weight).cast("long").alias("__w"),
    )
    t = (
        base.withColumn("__wsum", F.sum("__w").over(w_all))
        .withColumn(
            "__floor", F.expr(f"({b}L * __w) div __wsum")
        )
        .withColumn("__rem", F.expr(f"({b}L * __w) % __wsum"))
        .withColumn("__fsum", F.sum("__floor").over(w_all))
        .withColumn("__rrank", F.row_number().over(w_rem))
        .withColumn(
            "target",
            F.col("__floor")
            + F.when(
                F.col("__rrank") <= F.lit(b) - F.col("__fsum"), 1
            ).otherwise(0),
        )
    )
    return t.select(
        F.col("__s").alias(source),
        F.col("__a").alias("avail"),
        F.col("__w").alias("weight_q"),
        F.col("target").cast("long").alias("target"),
        F.expr("target div __a").cast("long").alias("epochs"),
        F.expr("target % __a").cast("long").alias("residual"),
        F.expr(f"(target * {MIX_Q}L) div __a").cast("long")
        .alias("rate_q"),
    )


def anonymize_urls(
    df: DataFrame,
    url: str = "url",
) -> DataFrame:
    """Prefix-preserving URL anonymization (the privacy sibling of
    redact_pii for LOG release: equal hosts/path-prefixes stay equal
    after anonymization — hierarchy analytics like url_path_rollup
    still work — but nothing is reversible without the corpus).
    host -> md5-token.anon, each path segment -> its md5 token,
    query/fragment DROPPED (the high-entropy PII carrier). md5 is
    the cross-engine-identical token function (house convention).

    Output: (url, anon_url). Row-local codegen; zero shuffle.
    """
    host = F.regexp_extract(
        F.col(url), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1
    )
    path = F.regexp_extract(
        F.col(url), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    toks = F.transform(
        segs, lambda s: F.substring(F.md5(s), 1, 8)
    )
    anon = F.concat(
        F.lit("https://"),
        F.substring(F.md5(F.lower(host)), 1, 8),
        F.lit(".anon"),
        F.when(F.size(toks) > 0,
               F.concat(F.lit("/"), F.array_join(toks, "/")))
        .otherwise(F.lit("/")),
    )
    return df.select(F.col(url), anon.alias("anon_url"))


def prf_expansion(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    m: int = 10,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM3-lite / Rocchio
    positive arm): run the BM25 query, take the top-k documents as
    pseudo-relevant, and score every candidate term by the exact
    integer

        weight_q = sum over top docs of score_q(doc) * tf(term, doc)

    — BM25-weighted term frequency in the feedback set. Original
    query terms and stopwords are excluded; output the top-m
    expansion terms (weight_q DESC, word ASC) with a 1-based rank.
    The caller appends them to the query and re-runs bm25_topk —
    the standard two-pass expansion retrieval.

    Scale: one bm25_topk pass; then tf comes from tokenizing ONLY
    the k feedback documents (semi-join pushes the filter before
    the explode); TakeOrderedAndProject collapses the top-m.
    """
    top = bm25_topk(
        df, terms, k=k, text=text, id_col=id_col
    ).select(id_col, "score_q")
    fb = df.join(top, on=id_col, how="semi")
    tf = (
        fb.select(
            F.col(id_col),
            F.explode(F.split(F.col(text), " ")).alias("word"),
        )
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    excl = {w for w in terms} | set(STOPWORDS)
    scored = (
        tf.where(~F.col("word").isin(*sorted(excl)))
        .join(top, on=id_col)
        .groupBy("word")
        .agg(F.sum(F.col("score_q") * F.col("__tf"))
             .alias("weight_q"))
    )
    topm = scored.orderBy(
        F.col("weight_q").desc(), F.col("word").asc()
    ).limit(int(m))
    w = Window.orderBy(
        F.col("weight_q").desc(), F.col("word").asc()
    )
    return topm.select(
        "word", "weight_q",
        F.row_number().over(w).alias("rank"),
    )


KN_Q = 1 << 20  # Kneser-Ney fixed-point probability grid


def kneser_ney_bigram(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the
    modified form of Chen & Goodman 1998 with a single discount) —
    the LM behind KenLM-style corpus-fluency scoring, one notch
    above the stupid-backoff bigram_backoff: probability mass freed
    by discounting observed bigrams is redistributed by CONTINUATION
    counts (how many distinct left-contexts a word follows), which
    fixes the "san Francisco" pathology of raw-frequency backoff.

        P(w2|w1) = max(c12 - D, 0)/c1 + D*N1+(w1,.)/c1 * Pcont(w2)
        Pcont(w2) = N1+(.,w2) / N1+(..)            with D = 3/4

    Fixed point: D = 3/4 is exact in quarters, so with every count
    an integer the whole value is ONE truncating division of
    non-negative int64 products:

        pkn_q = (Q*(4*c12 - 3)*ntot + Q*3*n1w1*ncont)
                  div (4*c1*ntot)

    Bound: Q*(4*c12)*ntot must stay < 2^63 — at Q = 2^20 that is
    c12 * ntot < 2^41, comfortable for ~10^6 bigram types; shrink Q
    for larger corpora.

    Scale: bigrams via ONE per-doc lead() window over positions,
    then every statistic is a map-side-combined agg over the BIGRAM
    TYPE table (not the token stream); the three stat joins key on
    w1/w2 of that same table. min_count filters the OUTPUT only —
    statistics always use the full table.
    """
    tk = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text), TOKEN_SEP))
        .alias("pos", "word"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bg = (
        tk.select(
            F.col("word").alias("w1"),
            F.lead("word").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    left = bg.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1w1")
    )
    cont = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("ncont"))
    tot = bg.agg(F.count(F.lit(1)).alias("ntot"))
    out = (
        bg.join(left, on="w1")
        .join(cont, on="w2")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "pkn_q",
            F.expr(
                f"(cast({KN_Q} as bigint) * (4 * c12 - 3) * ntot"
                f" + cast({KN_Q} as bigint) * 3 * n1w1 * ncont)"
                " div (4 * c1 * ntot)"
            ),
        )
    )
    if min_count > 1:
        out = out.where(F.col("c12") >= int(min_count))
    return out.select(
        "w1", "w2", "c12", "c1", "n1w1", "ncont", "ntot", "pkn_q"
    )


def ppmi_cooc(
    df: DataFrame,
    window: int = 3,
    min_count: int = 3,
    top_k: int = 60,
    text: str = "text",
    id_col: str = "doc_id",
    q: int = PMI_Q,
) -> DataFrame:
    """Windowed skip-gram co-occurrence with positive PMI weighting
    (Levy & Goldberg 2014: the count matrix whose PPMI
    factorization IS word2vec-SGNS) — the embedding-prep /
    distributional-similarity generalization of pmi_collocations'
    adjacent bigrams to a +-window context.

    Pairs: for k in 1..window, (word, lead(word, k)) per document —
    `window` row-local lead() columns on ONE ordered pass, never a
    positions self-join; pairs are symmetrized to (least, greatest).
    Marginals c_a = sum_b c_ab and N = sum c_ab come from the pair
    table itself (the standard PPMI convention), so every input to

        ppmi_q = max(0, lnq(c_ab * N) - lnq(c_a * c_b))

    is an exact integer and the lnq args are exact-integer doubles
    (< 2^53 — the house lnq discipline). Output: top_k rows by
    (ppmi_q DESC, a, b) with c_ab >= min_count.

    Scale: tokens scanned once; the pair stream is window * tokens
    rows into ONE map-side-combined groupBy; marginals are two
    reaggregations of the (far smaller) pair-type table;
    TakeOrderedAndProject for top_k, never a one-partition window.
    """
    tk = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text), TOKEN_SEP))
        .alias("pos", "word"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    cols = [
        F.lead("word", k).over(w).alias(f"__n{k}")
        for k in range(1, int(window) + 1)
    ]
    ctx = tk.select("word", *cols)
    pairs = None
    for k in range(1, int(window) + 1):
        p = ctx.where(F.col(f"__n{k}").isNotNull()).select(
            F.least(F.col("word"), F.col(f"__n{k}")).alias("a"),
            F.greatest(F.col("word"), F.col(f"__n{k}")).alias("b"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    cab = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("c_ab")
    )
    ca = (
        cab.select(F.col("a").alias("w"), "c_ab")
        .unionByName(cab.select(F.col("b").alias("w"), "c_ab"))
        .groupBy("w")
        .agg(F.sum("c_ab").alias("c_w"))
    )
    nt = cab.agg(F.sum("c_ab").alias("n_t"))
    qf = G.fnum(float(q))
    half = G.fnum(0.5)
    scored = (
        cab.where(F.col("c_ab") >= int(min_count))
        .join(ca.select(F.col("w").alias("a"),
                        F.col("c_w").alias("c_a")), on="a")
        .join(ca.select(F.col("w").alias("b"),
                        F.col("c_w").alias("c_b")), on="b")
        .crossJoin(F.broadcast(nt))
        .withColumn(
            "ppmi_q",
            F.expr(
                f"greatest(cast(0 as bigint),"
                f" cast(floor(ln(cast(c_ab * n_t as double))"
                f" * {qf} + {half}) as bigint)"
                f" - cast(floor(ln(cast(c_a * c_b as double))"
                f" * {qf} + {half}) as bigint))"
            ),
        )
    )
    # TakeOrderedAndProject top-k first, THEN rank the <=k
    # survivors (the pmi_collocations convention — never a
    # one-partition window over the full pair table)
    top = scored.orderBy(
        F.col("ppmi_q").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(int(top_k))
    w_rank = Window.orderBy(
        F.col("ppmi_q").desc(), F.col("a").asc(), F.col("b").asc()
    )
    return top.select(
        "a", "b", "c_ab", "ppmi_q",
        F.row_number().over(w_rank).cast("int").alias("rank"),
    )


GT_Q = 1 << 20


def good_turing(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    q: int = GT_Q,
) -> DataFrame:
    """Good-Turing frequency smoothing (Good 1953) over the corpus
    unigram counts — the count-of-counts table N_r and the smoothed
    count r* = (r+1) * N_{r+1} / N_r, THE classical estimate of how
    much probability mass belongs to UNSEEN words (p0 = N_1 / N;
    the held-out novelty rate a crawl slice should be budgeted
    for). Exact fixed point: r_star_q = ((r+1) * N_{r+1} * Q) div
    N_r — integer inputs, one truncating division per row; NULL
    where N_{r+1} = 0 (the classical estimator is undefined there —
    smoothing fills gaps, documented).

    Output per observed count r: (r, n_r, r_star_q, p0_q on every
    row for convenience).

    Scale: token explode -> word counts (ONE map-side-combined
    agg) -> count-of-counts (a SECOND tiny agg over the word
    table) -> one lead() over the <= few-hundred-row N_r table.
    """
    wc = (
        df.select(
            F.explode(F.split(F.col(text), TOKEN_SEP)).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    nr = wc.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    tot = wc.agg(F.sum("r").alias("n_tokens"))
    w = Window.orderBy(F.col("r").asc())
    out = (
        nr.withColumn("__rn", F.lead("r").over(w))
        .withColumn("__nn", F.lead("n_r").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "r", "n_r",
            F.expr(
                "CASE WHEN __rn = r + 1 THEN"
                f" ((r + 1) * __nn * cast({int(q)} as bigint))"
                " div n_r END"
            ).alias("r_star_q"),
            F.expr(
                f"(CASE WHEN r = 1 THEN n_r ELSE 0 END)"
            ).alias("__n1"),
            "n_tokens",
        )
    )
    n1 = out.agg(F.sum("__n1").alias("n1"))
    return (
        out.drop("__n1")
        .crossJoin(F.broadcast(n1))
        .withColumn(
            "p0_q",
            F.expr(
                f"(n1 * cast({int(q)} as bigint)) div n_tokens"
            ),
        )
        .drop("n1")
    )


def text_tiling(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    block_tokens: int = 10,
    peak_window: int = 2,
) -> DataFrame:
    """TextTiling topic segmentation (Hearst 1997), integer form:
    score every BLOCK GAP of a document by lexical-cohesion depth —
    the chunking primitive for RAG/segment-level dedup that fixed-
    size splitting gets wrong (it cuts mid-topic).

    Blocks = consecutive runs of `block_tokens` tokens. Gap g sits
    between block g and g+1; its cohesion sim(g) = |distinct tokens
    shared by the two blocks| (integer set overlap — Hearst's cosine
    replaced by the exact count, monotone in the same signal). Depth
    = (peakL - sim) + (peakR - sim), peaks = max sim within
    `peak_window` gaps on each side, each side clamped at >= 0;
    boundaries are the high-depth gaps (caller thresholds).

    Output: (id, gap, sim, depth) for EVERY gap 0..nblocks-2,
    including zero-overlap gaps.

    Scale: explode -> distinct -> ONE self hash-join on (id, word)
    restricted to adjacent blocks + per-doc dense-gap window; shuffle
    O(token types), parallelism = docs. Pure Catalyst.
    """
    B = int(block_tokens)
    toks = tokens(df, text, id_col).select(
        F.col(id_col).alias("id"),
        F.expr(f"pos div {B}").alias("blk"),
        "word",
    ).distinct()
    sim = (
        toks.alias("a")
        .join(
            toks.select(F.col("id"), (F.col("blk") - 1).alias("blk"),
                        "word").alias("b"),
            on=["id", "blk", "word"],
        )
        .groupBy("id", "blk")
        .agg(F.count(F.lit(1)).alias("sim"))
        .withColumnRenamed("blk", "gap")
    )
    ngaps = (
        tokens(df, text, id_col)
        .groupBy(F.col(id_col).alias("id"))
        .agg((F.max(F.expr(f"pos div {B}"))).alias("maxblk"))
        .where(F.col("maxblk") >= 1)
        .select("id", F.explode(
            F.sequence(F.lit(0), F.col("maxblk") - 1)).alias("gap"))
    )
    dense = ngaps.join(sim, on=["id", "gap"], how="left").select(
        "id", "gap", F.coalesce("sim", F.lit(0)).cast("long").alias("sim")
    )
    K = int(peak_window)
    wl = (Window.partitionBy("id").orderBy("gap")
          .rowsBetween(-K, -1))
    wr = (Window.partitionBy("id").orderBy("gap")
          .rowsBetween(1, K))
    out = dense.select(
        F.col("id").alias(id_col), "gap", "sim",
        (
            F.greatest(F.lit(0),
                       F.coalesce(F.max("sim").over(wl), F.col("sim"))
                       - F.col("sim"))
            + F.greatest(F.lit(0),
                         F.coalesce(F.max("sim").over(wr), F.col("sim"))
                         - F.col("sim"))
        ).alias("depth"),
    )
    return out


def multi_pattern_counts(
    df: DataFrame,
    patterns: list[str],
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document occurrence counts of a literal pattern set
    (blocklist auditing / taxonomy tagging): for each (doc, pattern)
    with >= 1 hit, the NON-OVERLAPPING occurrence count
    (len(t) - len(replace(t, p))) / len(p) — the same counting both
    engines implement natively, so it is exact.

    The pattern set rides as a broadcast literal array exploded
    against each document — ONE projection, no join, no UDF; at
    1000s of patterns switch to an Aho-Corasick mapInPandas (the
    filters.python extension point).
    """
    pats = [p for p in patterns if p]
    arr = F.array(*[F.lit(p) for p in pats])
    ex = df.select(
        F.col(id_col), F.col(text).alias("__t"),
        F.explode(arr).alias("pattern"),
    )
    cnt = (
        (F.length("__t")
         - F.length(F.replace(F.col("__t"), F.col("pattern"))))
        / F.length("pattern")
    ).cast("long")
    return (
        ex.select(F.col(id_col), "pattern", cnt.alias("n_hits"))
        .where(F.col("n_hits") > 0)
    )


def hrw_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment (Thaler &
    Ravishankar 1998) — shard_assign's ring sibling with an even
    stronger property: on ANY shard-set change, every key either
    stays put or moves to the changed shard; no vnode tuning, and
    weights are per-(key, shard) so heterogeneous capacities are a
    weight multiply away. Adds `shard:int`.

        shard(k) = argmax over s of mix_hash(k * P1 + s * P2 + salt)

    Ties break to the smaller shard id (deterministic both engines).

    Scale: n_shards literal weight expressions folded into ONE
    row-local greatest()/argmax chain — zero shuffle, zero join, the
    corpus never moves (the shard_assign economics). For thousands
    of shards switch to the ring (O(log n) vs O(n) per row).
    """
    n = int(n_shards)
    key = f"(`{id_col}` * 100003 + {int(salt)})"
    hs = [G.mix_hash(f"({key} + {s} * 1009)") for s in range(n)]
    # argmax with smaller-id tie-break: pack (hash, n-1-s) and take
    # greatest, then recover s = n-1 - packed % 2^31... simpler:
    # pairwise CASE chain is O(n^2); use array + array_position on
    # the max instead (first occurrence = smallest shard id).
    arr = "array(" + ", ".join(hs) + ")"
    return df.withColumn(
        "shard",
        F.expr(
            f"cast(array_position({arr}, array_max({arr})) - 1"
            " as int)"
        ),
    )


def extract_headings(
    df: DataFrame, html: str = "html", id_col: str = "doc_id",
    max_level: int = 3,
) -> DataFrame:
    """(id, level, heading): h1..h{max_level} texts pulled from raw
    page payloads — the document-outline signal under title
    boosting, section chunking, and clickbait/quality features
    (extract_links' sibling on the same WARC HTML path).

    Scale: one regexp_extract_all + explode per level, unioned —
    row-local codegen, zero shuffle; REs stay in the RE2/Java
    common subset.
    """
    c = F.col(html).cast("string")
    outs = []
    for lvl in range(1, int(max_level) + 1):
        pat = f"<h{lvl}[^>]*>([^<]*)</h{lvl}>"
        outs.append(
            df.select(
                F.col(id_col), F.lit(lvl).alias("level"),
                F.explode(
                    F.regexp_extract_all(c, F.lit(pat), 1)
                ).alias("heading"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def frequent_itemsets(
    df: DataFrame,
    basket: str,
    item: str,
    min_support: int,
    max_size: int = 3,
) -> DataFrame:
    """Apriori frequent itemsets up to size 3 (Agrawal & Srikant
    1994): items / pairs / triples contained in at least
    `min_support` distinct baskets — market-basket affinity, crawl
    co-tag mining, feature co-occurrence. Support counts DISTINCT
    baskets (duplicate (basket, item) rows collapse first).

    Output: (size, item_a, item_b, item_c, support) with NULLs in
    the unused slots and items ordered a < b < c (canonical form).

    Scale: the apriori ladder — L1 prunes to frequent items BEFORE
    the per-basket self-join builds pairs (candidate volume is
    sum over baskets of |frequent items in basket|^2, never
    |items|^2); triples join frequent PAIRS sharing a leading item
    and apriori-prune on the third edge, then count support with
    ONE three-way per-basket join. All hash joins + aggregates.
    """
    bi = df.select(
        F.col(basket).alias("b"), F.col(item).alias("i")
    ).distinct()
    s = int(min_support)
    l1 = (
        bi.groupBy("i").agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= s)
    )
    bi1 = bi.join(l1.select("i"), on="i", how="left_semi")
    pairs = (
        bi1.alias("x")
        .join(bi1.select(F.col("b"), F.col("i").alias("j")).alias("y"),
              on="b")
        .where(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= s)
    )
    out = l1.select(
        F.lit(1).alias("size"), F.col("i").alias("item_a"),
        F.lit(None).cast(bi.schema["i"].dataType).alias("item_b"),
        F.lit(None).cast(bi.schema["i"].dataType).alias("item_c"),
        "support",
    ).unionByName(pairs.select(
        F.lit(2).alias("size"), F.col("i").alias("item_a"),
        F.col("j").alias("item_b"),
        F.lit(None).cast(bi.schema["i"].dataType).alias("item_c"),
        "support",
    ))
    if int(max_size) >= 3:
        p = pairs.select("i", "j")
        cand = (
            p.alias("ab")
            .join(p.select(F.col("i"), F.col("j").alias("k"))
                  .alias("ac"), on="i")
            .where(F.col("j") < F.col("k"))
            # apriori prune: (j, k) must itself be frequent
            .join(p.select(F.col("i").alias("j"),
                           F.col("j").alias("k")),
                  on=["j", "k"], how="left_semi")
        )
        t = (
            cand
            .join(bi1.select(F.col("b"), F.col("i")), on="i")
            .join(bi1.select(F.col("b"), F.col("i").alias("j")),
                  on=["b", "j"])
            .join(bi1.select(F.col("b"), F.col("i").alias("k")),
                  on=["b", "k"])
            .groupBy("i", "j", "k")
            .agg(F.count(F.lit(1)).alias("support"))
            .where(F.col("support") >= s)
        )
        out = out.unionByName(t.select(
            F.lit(3).alias("size"), F.col("i").alias("item_a"),
            F.col("j").alias("item_b"), F.col("k").alias("item_c"),
            "support",
        ))
    return out


def readability_scores(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classic readability screens per document: Flesch reading ease
    and the Gunning fog index, from deterministic surface counts —
    the grade-level complement of quality_score/gopher_rules in a
    curation stack (too-hard and too-trivial pages both correlate
    with low training value).

    Counts are regex-group tallies identical across engines:
    syllables = vowel-group ([aeiouy]+) runs (the standard heuristic
    — no dictionary), sentences = [.!?]+ runs (>= 1), words = the
    repo's single-space split convention, polysyllables = words with
    >= 3 vowel groups (a higher-order filter over the split array —
    row-local, no explode). A group count is length(replace each run
    with '#') - length(strip runs) — two regexp_replace passes, no
    extract-all materialization.

    flesch = 206.835 - 1.015*(W/S) - 84.6*(Syll/W);
    fog = 0.4*((W/S) + 100*(Poly/W)). Pure IEEE chains over exact
    ints — hash-exact.

    Scale: fully row-local projection (one codegen stage, zero
    shuffle).
    """
    t = F.lower(F.col(text))
    syll = (
        F.length(F.regexp_replace(t, "[aeiouy]+", "#"))
        - F.length(F.regexp_replace(t, "[aeiouy]+", ""))
    )
    sents = F.greatest(
        F.length(F.regexp_replace(F.col(text), "[.!?]+", "#"))
        - F.length(F.regexp_replace(F.col(text), "[.!?]+", "")),
        F.lit(1),
    )
    words = F.split(F.col(text), " ")
    n_words = F.size(words)
    n_poly = F.size(
        F.filter(
            words,
            lambda w: (
                F.length(F.regexp_replace(F.lower(w), "[aeiouy]+", "#"))
                - F.length(F.regexp_replace(F.lower(w), "[aeiouy]+", ""))
            )
            >= F.lit(3),
        )
    )
    base = docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sents"),
        syll.cast("long").alias("n_syll"),
        n_poly.cast("long").alias("n_poly"),
    )
    wps = "(cast(n_words as double) / cast(n_sents as double))"
    spw = "(cast(n_syll as double) / cast(n_words as double))"
    ppw = "(cast(n_poly as double) / cast(n_words as double))"
    return base.select(
        id_col, "n_words", "n_sents", "n_syll", "n_poly",
        F.expr(
            f"{G.fnum(206.835)} - {G.fnum(1.015)} * {wps}"
            f" - {G.fnum(84.6)} * {spw}"
        ).alias("flesch"),
        F.expr(
            f"{G.fnum(0.4)} * ({wps} + {G.fnum(100.0)} * {ppw})"
        ).alias("fog"),
    )


def yules_k(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Yule's K vocabulary-richness characteristic per document
    (Yule 1944): K = 1e4 * (sum_m m^2 V(m) - N) / N^2 over the word
    frequency spectrum — equivalently 1e4 * (sum_w f_w^2 - N) / N^2.
    Low K = rich vocabulary, high K = repetitive text (K is length-
    invariant where a raw type/token ratio is not) — the repetition
    screen next to repetition_stats' ngram form.

    Exact int64 sufficient statistics (N, sum f^2); K is one IEEE
    chain. Scale: groupBy(doc, word) + groupBy(doc) — both
    map-side-combined hash aggregates over the exploded split.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text), " ")).alias("w")
    )
    freq = toks.groupBy(id_col, "w").agg(
        F.count(F.lit(1)).alias("f")
    )
    agg = freq.groupBy(id_col).agg(
        F.sum("f").alias("n_tokens"),
        F.sum(F.col("f") * F.col("f")).alias("sum_f2"),
    )
    return agg.select(
        id_col, "n_tokens", "sum_f2",
        F.expr(
            f"{G.fnum(10000.0)}"
            " * (cast(sum_f2 as double) - cast(n_tokens as double))"
            " / (cast(n_tokens as double) * cast(n_tokens as double))"
        ).alias("yules_k"),
    )


def k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    sensitive: str | None = None,
    l_div: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifier columns
    (Sweeney 2002; Machanavajjhala et al. 2007) — the privacy
    companion of redact_pii: BEFORE publishing a curated corpus with
    per-row metadata, measure which quasi-identifier combinations
    are re-identifying (group size < k) and, when a sensitive column
    is named, which groups leak it (distinct sensitive values <
    l_div — everyone in the group shares the secret).

    Output one row per QI equivalence class: the QI columns, n
    (group size), k_risky (1 if n < k), and with `sensitive`:
    n_sensitive (distinct values) + l_risky. All exact int64.

    Scale: ONE map-side-combined hash aggregate (count-distinct adds
    the standard two-phase expansion); never a self-join.
    """
    aggs = [
        F.count(F.lit(1)).alias("n"),
    ]
    if sensitive is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive)).alias("n_sensitive")
        )
    g = df.groupBy(*[F.col(c) for c in qi_cols]).agg(*aggs)
    out = g.withColumn(
        "k_risky", (F.col("n") < int(k)).cast("int")
    )
    if sensitive is not None:
        out = out.withColumn(
            "l_risky", (F.col("n_sensitive") < int(l_div)).cast("int")
        )
    return out


def burrows_delta(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    top_m: int = 32,
    block_mod: int = 8,
    fq: int = 1 << 20,
    zq: int = 1 << 10,
) -> DataFrame:
    """Burrows' Delta stylometric distance between document pairs
    (Burrows 2002) — authorship attribution / bot-farm twin
    detection: mean z-score distance over the corpus's top-M
    function words (THE classic stylometry measure; topical
    similarity ops like minhash can't see style).

    delta(a, b) = sum_w |z_a(w) - z_b(w)| with z(w) = (f(w) -
    mu_w) / sigma_w. The mean mu CANCELS in the difference, so the
    engine computes u(doc, w) = floor(f_q(w) / sigma_w * zq) — an
    exact int64 per (doc, word) — and uses the decomposition

        delta = S_a + S_b + sum_shared(|u_a - u_b| - u_a - u_b)

    with S_doc = sum_w u(doc, w): the pair join touches only words
    PRESENT IN BOTH docs (absent words contribute u of the present
    side, folded into S) — pair volume tracks shared vocabulary,
    never M x pairs. f_q = (cnt * fq) intdiv len is exact; sigma_w
    derives from integer moment sums over ALL docs (absent = 0);
    words with sigma = 0 carry no style signal and drop.

    Output per same-block pair: (doc_a, doc_b, n_shared, delta_q).

    Scale: token agg + ONE tiny top-M broadcast + per-doc fold +
    ONE hash self-join on (block, word).
    """
    toks = docs.select(
        F.col(id_col).alias("d"),
        F.explode(F.split(F.col(text), " ")).alias("w"),
    )
    cnt = toks.groupBy("d", "w").agg(F.count(F.lit(1)).alias("c"))
    lens = toks.groupBy("d").agg(F.count(F.lit(1)).alias("len"))
    n_docs = lens.select(
        F.count(F.lit(1)).alias("nd")
    )
    top = (
        cnt.groupBy("w").agg(F.sum("c").alias("tc"))
        .orderBy(F.col("tc").desc(), "w")
        .limit(int(top_m))
        .select("w")
    )
    f = (
        cnt.join(F.broadcast(top), on="w")
        .join(lens, on="d")
        .select(
            "d", "w",
            F.expr(f"(c * {int(fq)}) div len").alias("f_q"),
        )
    )
    mom = f.groupBy("w").agg(
        F.sum("f_q").alias("s1"),
        F.sum(F.col("f_q") * F.col("f_q")).alias("s2"),
    ).crossJoin(n_docs)
    sig = mom.select(
        "w",
        F.expr(
            "sqrt(cast(s2 as double) / cast(nd as double)"
            " - (cast(s1 as double) / cast(nd as double))"
            " * (cast(s1 as double) / cast(nd as double)))"
        ).alias("sigma"),
    ).where(F.col("sigma") > 0)
    u = f.join(sig, on="w").select(
        "d", "w",
        F.expr(
            f"cast(floor(cast(f_q as double) / sigma"
            f" * {float(int(zq))!r}e0) as bigint)"
        ).alias("u"),
    )
    s_doc = u.groupBy("d").agg(F.sum("u").alias("s_u"))
    bm = int(block_mod)
    ua = u.select(
        F.col("d").alias("da"), (F.col("d") % bm).alias("b"),
        "w", F.col("u").alias("u_a"),
    )
    ub = u.select(
        F.col("d").alias("db"), (F.col("d") % bm).alias("b"),
        "w", F.col("u").alias("u_b"),
    )
    shared = (
        ua.join(ub, on=["b", "w"])
        .where(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum(
                F.abs(F.col("u_a") - F.col("u_b"))
                - F.col("u_a") - F.col("u_b")
            ).alias("corr"),
        )
    )
    sa = s_doc.select(F.col("d").alias("da"), F.col("s_u").alias("sa"))
    sb = s_doc.select(F.col("d").alias("db"), F.col("s_u").alias("sb"))
    return (
        shared.join(sa, on="da").join(sb, on="db")
        .select(
            F.col("da").alias("doc_a"), F.col("db").alias("doc_b"),
            "n_shared",
            (F.col("sa") + F.col("sb") + F.col("corr"))
            .alias("delta_q"),
        )
    )


def suppress_small_groups(
    df: DataFrame,
    group_cols: list[str],
    k: int = 5,
    other_label: str = "__other__",
) -> DataFrame:
    """Small-count suppression for publishable group statistics (the
    action k_anonymity's audit calls for): groups with fewer than k
    rows collapse into ONE ``other_label`` row (their counts summed,
    never dropped — totals stay exact), so no published row
    re-identifies a small population. The standard statistical-
    disclosure-control primitive for per-domain / per-region count
    releases.

    Output: (group_cols..., n) with string-cast group columns (the
    suppressed row needs a label in every column). All counts exact.

    Scale: ONE hash agg + ONE row-local relabel + ONE re-agg of the
    (tiny) suppressed remainder.
    """
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n")
    )
    small = F.col("n") < int(k)
    relabeled = g.select(
        *[
            F.when(small, F.lit(other_label))
            .otherwise(F.col(c).cast("string")).alias(c)
            for c in group_cols
        ],
        "n",
    )
    return relabeled.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.sum("n").alias("n")
    )


COMPRESS_Q = 1 << 20


def compression_ratio(
    docs: DataFrame, text: str = "text", level: int = 6
) -> DataFrame:
    """Per-document zlib compression ratio — the production
    boilerplate/repetition quality signal (CCNet-family pipelines
    gate on it: highly compressible text is repetitive or templated,
    incompressible text is often binary junk or gibberish). The
    byte-level complement of repetition_stats' token-level ratios.

        ratio_q = floor(compressed_bytes * 2^20 / raw_bytes)

    zlib at a FIXED level is deterministic for a given zlib build,
    so results are stable within an environment — but NOT
    SQL-expressible, so this op is pytest/rows-only territory (no
    DuckDB oracle; documented, like the multimodal decode family).
    Empty documents emit ratio_q = NULL.

    Scale: Arrow-batched pandas_udf (one zlib call per doc inside
    the batch loop — no per-row serialization), zero shuffle.
    """
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    lvl = int(level)

    # bare signature: textops has `from __future__ import
    # annotations`, which turns hints into strings pandas_udf
    # cannot resolve
    @pandas_udf("long")
    def _ratio(s):
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            raw = t.encode("utf-8")
            if not raw:
                out.append(None)
                continue
            comp = zlib.compress(raw, lvl)
            out.append(len(comp) * COMPRESS_Q // len(raw))
        return pd.Series(out, dtype="object")

    return docs.withColumn("ratio_q", _ratio(F.col(text)))


RR_Q = 1 << 30


def randomized_response_estimate(
    df: DataFrame,
    answer: str = "answer",
    p_honest_q: int = (3 * (1 << 30)) // 4,
) -> DataFrame:
    """Warner randomized-response prevalence estimator (Warner
    1965) — the privacy family's MEASUREMENT side (k_anonymity
    audits what leaks; suppression withholds; this RECOVERS an
    aggregate from deliberately noised individual answers):
    respondents answer truthfully with probability p and flipped
    with 1-p, and the unbiased prevalence estimate is

        pi_hat = (p_hat + p - 1) / (2p - 1),
        var    = p_hat (1 - p_hat) / (n (2p - 1)^2)

    ``p_honest_q`` carries p in 2^-30 fixed point (DOCUMENTED
    protocol constant, p != 1/2). Counts are exact int64; the
    estimate and variance are single IEEE chains. Estimates outside
    [0, 1] (sampling noise at small n) are reported as-is — clamp
    downstream if needed.

    Scale: ONE 2-number fold.
    """
    from pdal_spark import sqlgen as G

    q = RR_Q
    pf = f"(cast({int(p_honest_q)} as double) / cast({q} as double))"
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(answer).cast("long")).alias("yes"),
    )
    phat = "(cast(yes as double) / cast(n as double))"
    denom = f"(2.0e0 * {pf} - 1.0e0)"
    return agg.select(
        "n", "yes",
        F.expr(
            f"({phat} + {pf} - 1.0e0) / {denom}"
        ).alias("pi_hat"),
        F.expr(
            f"{phat} * (1.0e0 - {phat})"
            f" / (cast(n as double) * {denom} * {denom})"
        ).alias("var_hat"),
    )


HEAPS_Q = 1 << 20


def heaps_law(
    df: DataFrame,
    doc_id: str = "doc_id",
    word: str = "word",
    checkpoints: list[int] | None = None,
) -> DataFrame:
    """Heaps' law vocabulary-growth fit V(n) = K n^beta (Heaps
    1978) — how fast new vocabulary keeps arriving as the corpus
    grows: the sublinear-growth companion of zipf_fit's frequency
    ranks and chao1's unseen-mass estimate (beta ~ 0.4-0.6 for
    natural text; beta near 1 screams boilerplate-free synthetic or
    id-like tokens).

    Vocabulary sizes V(t) at the given doc-count checkpoints come
    from ONE aggregate of conditional distinct counts (count
    DISTINCT CASE WHEN id <= t...); the log-log OLS for (ln K,
    beta) runs over per-checkpoint ln terms quantized once to the
    2^-20 grid (the repo's ln convention) so the 5 moment folds are
    exact int64; beta/lnK are closing IEEE chains rounded(9).
    Checkpoints with V = 0 drop. Needs >= 2 surviving checkpoints
    (NULL otherwise).

    Output: one row (n_checkpoints, beta, ln_k).

    Scale: one pass over the token table with |checkpoints|
    conditional distincts (an expand of ~8 — bounded) + a tiny fold.
    """
    from pdal_spark import sqlgen as G

    cps = checkpoints or [2, 4, 8, 16, 32, 64, 128, 256]
    qf = G.fnum(float(HEAPS_Q))
    aggs = []
    for i, t in enumerate(cps):
        aggs.append(
            F.countDistinct(
                F.expr(
                    f"case when `{doc_id}` <= {int(t)}"
                    f" then `{word}` end"
                )
            ).cast("long").alias(f"v{i}")
        )
    m = df.agg(*aggs)
    # unpivot to (t, v) and fit ln v = ln K + beta ln t
    pairs = m.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(int(t)).alias("t"),
                    F.col(f"v{i}").alias("v"),
                )
                for i, t in enumerate(cps)
            ])
        ).alias("p")
    ).select("p.t", "p.v").where(F.col("v") > 0)
    lnq = (
        "cast(floor(ln(cast({c} as double)) * " + qf
        + f" + {G.fnum(0.5)}) as bigint)"
    )
    r = pairs.select(
        F.expr(lnq.format(c="t")).alias("x"),
        F.expr(lnq.format(c="v")).alias("y"),
    )
    mom = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    beta = (
        "((cast(n as double) * cast(sxy as double)"
        " - cast(sx as double) * cast(sy as double))"
        " / (cast(n as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double)))"
    )
    return mom.select(
        F.col("n").alias("n_checkpoints"),
        F.expr(
            "case when n >= 2"
            " and n * sxx - sx * sx <> 0 then"
            f" round({beta}, 9) end"
        ).alias("beta"),
        F.expr(
            "case when n >= 2"
            " and n * sxx - sx * sx <> 0 then"
            f" round((cast(sy as double) - {beta}"
            " * cast(sx as double))"
            f" / cast(n as double) / {qf}, 9) end"
        ).alias("ln_k"),
    )


def juilland_d(
    df: DataFrame,
    n_parts: int = 8,
    min_freq: int = 20,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Juilland's D dispersion (Juilland & Chang-Rodriguez 1964):
    how evenly a term spreads across k corpus parts — the classic
    "is this word general vocabulary or one document shouting"
    score next to domain_stats/burstiness:

        D = 1 - CV / sqrt(k - 1),
        CV = sqrt(k * sum f_i^2 - T^2) / T

    over per-part frequencies f_i (absent parts count 0 — the k in
    the formula is the FIXED part count, not the observed one).
    Integer moments (T, sum f^2) exact; D is one IEEE chain. Only
    terms with T >= min_freq emit (dispersion of hapaxes is noise).
    Output: (word, t, sf2, d).

    Scale: ONE (word, part) hash agg + ONE word agg over the token
    stream — the domain_stats plan shape.
    """
    k = int(n_parts)
    tok = tokens(df, text, id_col).select(
        "word", (F.col(id_col) % k).alias("part")
    )
    fip = tok.groupBy("word", "part").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    mom = fip.groupBy("word").agg(
        F.sum("f").alias("t"),
        F.sum(F.expr("f * f")).alias("sf2"),
    ).where(F.col("t") >= int(min_freq))
    kf = f"{float(k)!r}e0"
    return mom.select(
        "word", "t", "sf2",
        F.expr(
            "case when t > 0 then 1.0e0"
            f" - sqrt(cast({k} * sf2 - t * t as double))"
            f" / (cast(t as double) * sqrt({kf} - 1.0e0)) end"
        ).alias("d"),
    )


def gries_dp(
    df: DataFrame,
    n_parts: int = 8,
    min_freq: int = 20,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gries' DP (deviation of proportions, Gries 2008) — the
    size-aware dispersion complement of juilland_d (parts may be
    unequal; DP = 0 perfectly proportional, -> 1 concentrated):

        DP = 0.5 * sum_i | v_i / f  -  size_i / S |

    re-expressed on the common denominator f*S so every term is
    exact int64: observed parts contribute |v_i*S - f*size_i|,
    absent parts contribute f*size_i — folded as
    f*(S - sum_observed size_i) without enumerating them.
    Output: (word, f, dp_num, dp) with dp = dp_num / (2 f S).

    Scale: token-stream aggs only — (part) sizes, (word, part)
    counts, one word-level fold. Bound: f * S < 2^63.
    """
    k = int(n_parts)
    tok = tokens(df, text, id_col).select(
        "word", (F.col(id_col) % k).alias("part")
    )
    sizes = tok.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("size_i")
    )
    tot = sizes.agg(F.sum("size_i").alias("s_all"))
    vip = tok.groupBy("word", "part").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    fw = vip.groupBy("word").agg(F.sum("v").alias("f")).where(
        F.col("f") >= int(min_freq)
    )
    obs = (
        vip.join(fw, on="word")
        .join(F.broadcast(sizes), on="part")
        .crossJoin(F.broadcast(tot))
        .groupBy("word")
        .agg(
            F.max("f").alias("f"),
            F.max("s_all").alias("s_all"),
            F.sum(
                F.expr("abs(v * s_all - f * size_i)")
            ).alias("a_obs"),
            F.sum("size_i").alias("obs_size"),
        )
    )
    return obs.select(
        "word", "f",
        F.expr("a_obs + f * (s_all - obs_size)").alias("dp_num"),
        F.expr(
            "cast(a_obs + f * (s_all - obs_size) as double)"
            " / (2.0e0 * cast(f as double)"
            " * cast(s_all as double))"
        ).alias("dp"),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: str,
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007) —
    k_anonymity's successor: group size alone doesn't protect when
    everyone in the group shares the sensitive value. Per quasi-
    identifier group: size, distinct sensitive values l, and the
    top sensitive-value share; plus the audit verdict is the
    caller's threshold on min(l). Output per group: (quasi...,
    k, l, top_count).

    Scale: TWO hash aggs ((quasi, sensitive) then quasi) — the
    k_anonymity plan with one extra rollup.
    """
    qcols = [F.col(c) for c in quasi_cols]
    per = df.groupBy(*qcols, F.col(sensitive).alias("__s")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return per.groupBy(*[c for c in quasi_cols]).agg(
        F.sum("c").alias("k"),
        F.count(F.lit(1)).cast("long").alias("l"),
        F.max("c").alias("top_count"),
    )


TCL_Q = 1 << 20


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: str,
) -> DataFrame:
    """t-closeness audit over an ORDERED sensitive attribute (Li,
    Li & Venkatasubramanian 2007) — l-diversity's distributional
    refinement: per quasi-group, the earth-mover's distance between
    the group's sensitive distribution and the global one, under
    unit ground distance between adjacent RANKS of the observed
    value ladder:

        emd_g = (1/(V-1)) * sum_v | cumF_g(v) - cumF(v) |

    carried on the common denominator n_g * n — numerators
    |cum_gv * n - cum_v * n_g| exact int64, the per-group sum
    quantized once. Output per group: (quasi..., n_g, emd_q, emd)
    with emd in [0, 1]. Bound: cum * n < 2^63.

    Scale: one distinct-value lattice (group x value via a cross
    of the two marginals' prefix windows + left join for absent
    cells) + one group fold.
    """
    q = TCL_Q
    base = df.select(
        *[F.col(c) for c in quasi_cols],
        F.col(sensitive).alias("__v"),
    )
    gcol = [F.col(c) for c in quasi_cols]
    cnt_gv = base.groupBy(*gcol, "__v").agg(
        F.count(F.lit(1)).cast("long").alias("c_gv")
    )
    cnt_v = base.groupBy("__v").agg(
        F.count(F.lit(1)).cast("long").alias("c_v")
    )
    n_all = base.agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    n_g = base.groupBy(*gcol).agg(
        F.count(F.lit(1)).cast("long").alias("n_g")
    )
    # dense lattice: every (group, observed value)
    lattice = n_g.crossJoin(
        cnt_v.select("__v")
    ).join(cnt_gv, on=[*quasi_cols, "__v"], how="left").select(
        *[F.col(c) for c in quasi_cols], "n_g", "__v",
        F.expr("coalesce(c_gv, cast(0 as bigint))").alias("c_gv"),
    )
    wv_g = Window.partitionBy(*quasi_cols).orderBy(
        F.col("__v").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wv = Window.orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_v = cnt_v.withColumn("cum_v", F.sum("c_v").over(wv)) \
        .withColumn(
            "n_vals",
            F.count(F.lit(1)).over(Window.partitionBy()),
        ).select("__v", "cum_v", "n_vals")
    cum = lattice.withColumn(
        "cum_gv", F.sum("c_gv").over(wv_g)
    ).join(F.broadcast(cum_v), on="__v") \
        .crossJoin(F.broadcast(n_all))
    per_g = cum.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.max("n_g").alias("n_g"),
        F.max("n_vals").alias("n_vals"),
        F.max("n").alias("n"),
        F.sum(
            F.expr("abs(cum_gv * n - cum_v * n_g)")
        ).alias("emd_num"),
    )
    return per_g.select(
        *[F.col(c) for c in quasi_cols], "n_g",
        F.expr(
            f"case when n_vals > 1 then (emd_num"
            f" * cast({q} as bigint))"
            " div (n_g * n * (n_vals - 1))"
            " else cast(0 as bigint) end"
        ).alias("emd_q"),
        F.expr(
            "case when n_vals > 1 then"
            " cast(emd_num as double)"
            " / (cast(n_g as double) * cast(n as double)"
            " * (cast(n_vals as double) - 1.0e0)) end"
        ).alias("emd"),
    )


def beta_diversity(
    df: DataFrame,
    part: str,
    species: str,
) -> DataFrame:
    """Whittaker beta diversity (1960): how much does composition
    TURN OVER across parts — gamma richness over mean per-part
    alpha richness (1 = every part identical, -> n_parts = all
    disjoint). The cross-partition complement of the within-part
    diversity family (simpson_diversity, category_entropy):

        beta_w = S_gamma * n_parts / sum_p S_p

    (re-expressed on the common denominator so the integers stay
    exact). Output: (n_parts, s_gamma, sum_alpha, beta_w).

    Scale: TWO distinct-aggs — nothing pairwise.
    """
    base = df.select(
        F.col(part).alias("p"), F.col(species).alias("s")
    ).distinct()
    alpha = base.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("s_p")
    )
    a_tot = alpha.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("s_p").alias("sum_alpha"),
    )
    gam = base.select("s").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("s_gamma")
    )
    j = a_tot.crossJoin(F.broadcast(gam))
    return j.select(
        "n_parts", "s_gamma", "sum_alpha",
        F.expr(
            "case when sum_alpha > 0 then"
            " cast(s_gamma * n_parts as double)"
            " / cast(sum_alpha as double) end"
        ).alias("beta_w"),
    )


PIE_Q = 1 << 10


def pielou_evenness(
    df: DataFrame,
    part: str,
    species: str,
) -> DataFrame:
    """Pielou's evenness J per part (1966): Shannon H normalized by
    its maximum ln(S) — separates "few species" from "uneven
    species" (the within-part companion of beta_diversity's
    across-part turnover):

        J = H / ln S,  H = sum (c/n) ln(n/c)

    Entropy terms ln(n/c) quantize to the 2^-10 grid (count-
    weighted exact folds); ln S quantizes the same way so J is a
    ratio of two integers over the SAME grid. Output per part:
    (part, n, s_richness, h_q_sum, j).

    Scale: one (part, species) agg + one part rollup.
    """
    q = float(PIE_Q)
    base = df.select(
        F.col(part).alias("p"), F.col(species).alias("sp")
    )
    per = base.groupBy("p", "sp").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    parts = per.groupBy("p").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("long").alias("s_richness"),
    )
    terms = per.join(parts, on="p").select(
        "p",
        F.expr(
            "c * cast(floor(ln(cast(n as double)"
            f" / cast(c as double)) * {q!r}e0 + 0.5e0) as bigint)"
        ).alias("t"),
    )
    hq = terms.groupBy("p").agg(F.sum("t").alias("h_q_sum"))
    j = parts.join(hq, on="p")
    lns = (
        "cast(floor(ln(cast(s_richness as double))"
        f" * {q!r}e0 + 0.5e0) as bigint)"
    )
    return j.select(
        "p", "n", "s_richness", "h_q_sum",
        F.expr(
            f"case when s_richness > 1 then"
            " cast(h_q_sum as double)"
            f" / (cast(n as double) * cast({lns} as double)) end"
        ).alias("j"),
    )


def berger_parker(
    df: DataFrame,
    part: str,
    species: str,
) -> DataFrame:
    """Berger-Parker dominance per part (1970): the single most
    abundant species' share — the bluntest diversity number
    (d -> 1 means one species swamps the part; 1/d is a true
    diversity index). Output per part: (part, n, n_max, d).

    Scale: one (part, species) agg + one part max/sum.
    """
    per = df.select(
        F.col(part).alias("p"), F.col(species).alias("sp")
    ).groupBy("p", "sp").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = per.groupBy("p").agg(
        F.sum("c").alias("n"), F.max("c").alias("n_max")
    )
    return agg.select(
        "p", "n", "n_max",
        F.expr(
            "case when n > 0 then cast(n_max as double)"
            " / cast(n as double) end"
        ).alias("d"),
    )


SAR_Q = 1 << 10


def sar_exponent(
    df: DataFrame,
    part_fine: str,
    species: str,
    levels: int = 3,
) -> DataFrame:
    """Species-area relationship exponent (Arrhenius S = c A^z):
    aggregate fine parts into blocks of 1, 2, 4, ... parts
    (doubling areas), count mean distinct species per block at
    each level, and fit the log-log slope — the corpus analog:
    how does vocabulary richness scale with sample size across
    PARTS (heaps_law scales within a stream; SAR across space).

        z = slope of lnq(mean richness) on level   [/ ln 2]

    Mean richness per level carries quantized (2^-10); the tiny
    OLS is exact int64. Output: (n_levels, num, den, z).

    Scale: `levels` (block, species) distinct-aggs.
    """
    import math

    from pdal_spark import sqlgen as G

    q = float(SAR_Q)
    base = df.select(
        F.col(part_fine).cast("long").alias("p"),
        F.col(species).alias("sp"),
    )
    outs = []
    for lvl in range(int(levels)):
        blk = base.select(
            F.expr(f"p div {1 << lvl}").alias("b"), "sp"
        ).distinct()
        rich = blk.groupBy("b").agg(
            F.count(F.lit(1)).cast("long").alias("s_b")
        )
        m = rich.agg(
            F.count(F.lit(1)).cast("long").alias("nb"),
            F.sum("s_b").alias("ssum"),
        ).select(
            F.lit(lvl).cast("long").alias("lvl"),
            F.expr(
                "cast(floor(ln(cast(ssum as double)"
                " / cast(nb as double))"
                f" * {q!r}e0 + 0.5e0) as bigint)"
            ).alias("y_q"),
        )
        outs.append(m)
    ladder = outs[0]
    for o in outs[1:]:
        ladder = ladder.unionByName(o)
    mom = ladder.agg(
        F.count(F.lit(1)).cast("long").alias("n_levels"),
        F.sum("lvl").alias("sx"), F.sum("y_q").alias("sy"),
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
        ).alias("z"),
    )


RAR_Q = 1 << 20


def rarefaction_expected(
    df: DataFrame,
    species: str,
    m: int = 10,
) -> DataFrame:
    """Exact rarefaction: expected distinct species in a random
    subsample of m individuals (Hurlbert 1971) — the fair richness
    comparison when sample sizes differ (chao1 extrapolates UP,
    this interpolates DOWN):

        E[S_m] = sum_sp (1 - prod_{i<m} (n - n_sp - i)/(n - i))

    The m-term product is a fixed IEEE chain per species over
    exact integers (m is small), quantized to the 2^-20 grid for
    an order-invariant integer fold. Output: (n, s_obs, e_q,
    e_sm).

    Scale: one species agg + ONE fold; the product unrolls to m
    factors at plan build.
    """
    mm = int(m)
    q = float(RAR_Q)
    cnt = df.groupBy(F.col(species).alias("sp")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cnt.agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("long").alias("s_obs"),
    )
    j = cnt.crossJoin(F.broadcast(tot))
    prod = " * ".join(
        f"(cast(greatest(n - c - {i}, cast(0 as bigint))"
        f" as double) / cast(n - {i} as double))"
        for i in range(mm)
    )
    term = (
        f"cast(floor((1.0e0 - ({prod})) * {q!r}e0 + 0.5e0)"
        " as bigint)"
    )
    agg = j.agg(
        F.max("n").alias("n"),
        F.max("s_obs").alias("s_obs"),
        F.sum(F.expr(term)).alias("e_q"),
    )
    return agg.select(
        "n", "s_obs", "e_q",
        F.expr(f"cast(e_q as double) / {q!r}e0").alias("e_sm"),
    )


RULE_Q = 1 << 20


def rule_metrics(
    df: DataFrame,
    basket: str,
    item: str,
    min_pair: int = 5,
) -> DataFrame:
    """Association-rule metrics for item PAIRS (the full
    market-basket readout over frequent_itemsets' support-only
    candidates): for every ordered rule a -> b with pair support
    >= min_pair,

        support    = n_ab / n
        confidence = n_ab / n_a
        lift       = n_ab * n / (n_a * n_b)
        leverage   = support - supp_a * supp_b
        conviction = (1 - supp_b) / (1 - confidence)

    All from exact integer counts (baskets deduplicated); each
    metric one IEEE chain (conviction NULL at confidence = 1).
    Output per rule: (a, b, n_ab, n_a, n_b, n, confidence, lift,
    leverage, conviction).

    Scale: one distinct (basket, item) projection, one item agg,
    one shared-basket pair join (the inverted-index shape), one
    broadcast of the tiny counts.
    """
    base = df.select(
        F.col(basket).alias("bk"), F.col(item).alias("it")
    ).distinct()
    n_df = base.select("bk").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    items = base.groupBy("it").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = base.select(F.col("bk"), F.col("it").alias("a"))
    b = base.select(F.col("bk"), F.col("it").alias("b"))
    pairs = (
        a.join(b, on="bk")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= int(min_pair))
    )
    j = (
        pairs.join(
            F.broadcast(items.select(F.col("it").alias("a"),
                                     F.col("c").alias("n_a"))),
            on="a",
        )
        .join(
            F.broadcast(items.select(F.col("it").alias("b"),
                                     F.col("c").alias("n_b"))),
            on="b",
        )
        .crossJoin(F.broadcast(n_df))
    )
    conf = "(cast(n_ab as double) / cast(n_a as double))"
    suppb = "(cast(n_b as double) / cast(n as double))"
    return j.select(
        "a", "b", "n_ab", "n_a", "n_b", "n",
        F.expr(conf).alias("confidence"),
        F.expr(
            "cast(n_ab as double) * cast(n as double)"
            " / (cast(n_a as double) * cast(n_b as double))"
        ).alias("lift"),
        F.expr(
            "cast(n_ab as double) / cast(n as double)"
            " - (cast(n_a as double) / cast(n as double))"
            f" * {suppb}"
        ).alias("leverage"),
        F.expr(
            f"case when {conf} < 1.0e0 then"
            f" (1.0e0 - {suppb}) / (1.0e0 - {conf}) end"
        ).alias("conviction"),
    )


def prefix_fanout(
    df: DataFrame,
    term: str,
    max_len: int = 4,
) -> DataFrame:
    """Prefix fan-out ladder over distinct terms (the autocomplete
    / trie capacity audit: at each prefix length, how many
    prefixes exist and how many completions does the busiest one
    carry). Output per length: (plen, n_prefixes, max_fanout,
    avg_fanout).

    Scale: a |max_len| explode + two hash aggs.
    """
    ml = int(max_len)
    terms = df.select(F.col(term).alias("w")).distinct() \
        .where(F.length("w") >= 1)
    ladder = terms.select(
        "w",
        F.explode(
            F.array(*[F.lit(i) for i in range(1, ml + 1)])
        ).alias("plen"),
    ).where(F.length("w") >= F.col("plen")).select(
        "plen", F.expr("substring(w, 1, plen)").alias("pfx")
    )
    per = ladder.groupBy("plen", "pfx").agg(
        F.count(F.lit(1)).cast("long").alias("fanout")
    )
    agg = per.groupBy("plen").agg(
        F.count(F.lit(1)).cast("long").alias("n_prefixes"),
        F.max("fanout").alias("max_fanout"),
        F.sum("fanout").alias("total"),
    )
    return agg.select(
        F.col("plen").cast("long").alias("plen"),
        "n_prefixes", "max_fanout",
        F.expr(
            "cast(total as double) / cast(n_prefixes as double)"
        ).alias("avg_fanout"),
    )


def collision_audit(
    df: DataFrame,
    key: str,
    n_buckets: int,
) -> DataFrame:
    """Hash-collision audit against the birthday-paradox
    expectation: hash distinct INTEGER keys into n_buckets with
    the repo's dialect-neutral mix_hash and compare observed
    collisions (n - distinct buckets) with the theoretical

        E = n - m (1 - (1 - 1/m)^n)

    (the shard/partition-sizing sanity check for hrw_assign /
    shard_assign layouts). The expectation's pow chain rounds to
    6dp (libm). Output: (n, m, used_buckets, collisions,
    expected_r).

    Scale: one distinct + one hash projection + two tiny aggs.
    """
    import math

    from pdal_spark import sqlgen as G

    m = int(n_buckets)
    keys = df.select(F.col(key).cast("long").alias("k0")) \
        .distinct()
    n_df = keys.agg(F.count(F.lit(1)).cast("long").alias("n"))
    used = keys.select(
        F.expr(f"({G.mix_hash('k0')}) % {m}").alias("b")
    ).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("used_buckets")
    )
    j = n_df.crossJoin(F.broadcast(used))
    base = G.fnum(1.0 - 1.0 / m)
    return j.select(
        "n", F.lit(m).cast("long").alias("m"), "used_buckets",
        (F.col("n") - F.col("used_buckets")).alias("collisions"),
        F.expr(
            f"round(cast(n as double) - {G.fnum(float(m))}"
            f" * (1.0e0 - power({base},"
            " cast(n as double))), 6) + 0.0e0"
        ).alias("expected_r"),
    )
