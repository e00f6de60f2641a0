"""Deduplication suite for the web-pages table (training-data
pipeline core): exact, MinHash+LSH, SimHash, n-gram Jaccard and
embedding-cosine near-dup.

Scale design:
- exact: one hash-groupBy (shuffle keyed on a 128-bit digest — never
  on raw text bytes).
- MinHash: shingle -> permuted Lehmer hashes -> per-doc min per
  permutation (one explode + one agg); LSH bands shuffle only
  (band_id, band_signature) pairs; candidate pairs verified with
  exact Jaccard computed ONLY for candidates (never all-pairs).
- SimHash: per-doc bit-majority over token hashes; near-dups =
  signature buckets (hamming-0 here; band-split for hamming-k).
- embedding near-dup: see operators/similarity.py for the ANN path.

All hashes are the dual-dialect Lehmer family from sqlgen, so every
stage has an exact DuckDB oracle in vocab mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.operators.textops import token_ids

M31 = G.M31
# Fixed MinHash permutation constants (a*h + b) % M31; generated once
# from the Lehmer generator, identical literals in engine and oracle.
_N_PERM = 16


def _perm_constants(n: int = _N_PERM) -> list[tuple[int, int]]:
    out = []
    a, b = 48271, 69621
    for _ in range(n):
        a = (a * 48271) % M31
        b = (b * 69621) % M31
        out.append((a if a > 1 else 2, b))
    return out


PERMS = _perm_constants()


def _parallel_scan(df: DataFrame, key: str | None = None) -> DataFrame:
    """Guard for the row-local (zero-shuffle) paths: a fold that never
    shuffles inherits the SCAN's partitioning, so a small input (one
    parquet file -> one partition) would run the whole corpus fold on
    one core. If the scan has fewer partitions than cores, pay one
    repartition of the raw rows — HASH on `key` when given, so the
    resulting partitioning is load-bearing downstream (a groupBy or
    join on the key reuses it with no further exchange, exactly the
    role the removed window shuffle used to play). At production
    scale the input has >> cores partitions and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if key is not None:
            return df.repartition(target, F.col(key))
        return df.repartition(target)
    return df


def exact_dedup(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """Exact dedup: one row per distinct text with the canonical id
    (min/max by id) and duplicate count. Hash-groupBy on md5(text)
    so the shuffle carries 16-byte keys, not document bodies."""
    agg_id = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.select(F.md5(F.col(text)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(agg_id.alias("canonical_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


def shingles(
    df: DataFrame, n: int = 3, text: str = "text", id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """(id, shingle_hash) for n-word shingles; hash combines word ids
    positionally: ((w1*8191 + w2)*8191 + w3) % M31.

    Two physical paths with identical output:
    - scale mode (no vocab): word ids are xxhash64 of the token, so
      the whole shingle chain is computed ROW-LOCALLY on the token
      array (transform + element_at) — no shuffle, no per-doc window
      sort; the first exchange in any consumer is its own aggregate.
      At corpus scale this removes the token-table sort that
      otherwise dominates the pipeline.
    - oracle mode (vocab_df): dense rank ids need the vocab join, so
      the original token-explode + per-doc window path remains (the
      DuckDB oracle mirrors this form literally).
    """
    from pdal_spark.operators.textops import TOKEN_SEP

    if vocab_df is None:
        df = _parallel_scan(df, id_col)
        arr = F.split(F.col(text), TOKEN_SEP)
        ids = F.transform(
            arr, lambda w: F.abs(F.xxhash64(w)) % F.lit(G.M31)
        )

        def chain(i):
            h = F.element_at(ids, i + 1)
            for k in range(1, n):
                h = (h * 8191 + F.element_at(ids, i + 1 + k)) % M31
            return h

        sh_arr = F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - n), chain
            ),
        ).otherwise(F.array().cast("array<long>"))
        # Per-doc DISTINCT row-locally (array_distinct on the shingle
        # array, zero shuffle): every consumer treats shingles as a
        # per-doc SET — MinHash minima and Jaccard |A∩B|/|A∪B| are
        # multiplicity-blind — and several paid a full-table
        # `.distinct()` shuffle to get there. Dropping duplicates at
        # the source shrinks the exploded table before it ever hits
        # an exchange (~10-20% on web text, unbounded on adversarial
        # repetition).
        return df.select(
            F.col(id_col),
            F.explode(F.array_distinct(sh_arr)).alias("shingle"),
        )

    t = token_ids(df, text, id_col, vocab_df)
    w = Window.partitionBy(id_col).orderBy("pos")
    cols = [F.col("word_id")] + [
        F.lead("word_id", i).over(w) for i in range(1, n)
    ]
    h = cols[0]
    for c in cols[1:]:
        h = (h * 8191 + c) % M31
    return (
        t.withColumn("shingle", h)
        .where(F.col("shingle").isNotNull())
        .select(id_col, "shingle")
    )


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", n_perm: int = _N_PERM
) -> DataFrame:
    """Per-doc MinHash signature: one min-agg column per permutation
    (single shuffle of shingle rows, map-side combined)."""
    aggs = []
    for i, (a, b) in enumerate(PERMS[:n_perm]):
        aggs.append(
            F.min((F.col("shingle") * a + b) % M31).alias(f"sig_{i}")
        )
    return sh.groupBy(id_col).agg(*aggs)


def _band_table(
    sigs: DataFrame, id_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 4,
) -> DataFrame:
    """(doc, band, bsig): one row per (doc, band) with the band's
    combined signature — the LSH bucket key.

    Single-pass form: the per-band signatures are computed as ONE
    array column and posexploded, so the upstream signature
    aggregation runs once. (The previous 4-way union of selects over
    the same `sigs` plan re-ran the shingle groupBy per branch unless
    exchange reuse happened to fire — measured ~0.5 s of the headline
    minhash query at sf0.1.)"""
    band_sigs = []
    for bnd in range(bands):
        sig = F.lit(0).cast("long")
        for r in range(rows_per_band):
            # modulus 2^45 keeps sig*8191 + sig_i within int64
            sig = (sig * 8191 + F.col(f"sig_{bnd * rows_per_band + r}")) % (
                1 << 45
            )
        band_sigs.append(sig)
    return sigs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.array(*band_sigs)).alias("band", "bsig"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 4,
    bucket_cap: int | None = 4096,
) -> DataFrame:
    """Banding: docs sharing any band's combined signature become a
    candidate pair (a < b). Shuffles only (band, signature) keys.

    ``bucket_cap`` (VERDICT r2 #9) bounds the per-(band, bsig)
    fan-out: a bucket of m docs generates m(m-1)/2 pairs, so one
    adversarial corpus of identical signatures turns the band join
    quadratic. Buckets larger than the cap keep only the cap LOWEST
    doc ids (deterministic; survivors stay fully connected, so
    dedup's connected components still merge them — docs beyond the
    cap in a hot bucket lose candidate edges, the documented recall
    trade). Overflow is observable via ``lsh_bucket_stats`` — run it
    next to any capped job. CorpusJob additionally runs exact-dedup
    FIRST, which removes the identical-text source of hot buckets
    entirely; the cap makes the standalone path safe too.
    None disables capping (oracle-exact mode for small inputs)."""
    all_bands = _band_table(sigs, id_col, bands, rows_per_band)
    if bucket_cap is not None:
        w = Window.partitionBy("band", "bsig").orderBy("doc")
        all_bands = (
            all_bands.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= int(bucket_cap))
            .drop("_rn")
        )
    left = all_bands.select(
        "band", "bsig", F.col("doc").alias("a")
    )
    right = all_bands.select(
        "band", "bsig", F.col("doc").alias("b")
    )
    return (
        left.join(right, on=["band", "bsig"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def lsh_bucket_stats(
    sigs: DataFrame, id_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 4,
    bucket_cap: int = 4096,
) -> DataFrame:
    """The loud-metric companion to ``lsh_candidate_pairs``: per-band
    bucket-size histogram essentials — (band, n_buckets, max_bucket,
    n_capped) where n_capped counts buckets whose size exceeds
    ``bucket_cap``. Run (and log) this next to any capped near-dup
    job; a nonzero n_capped means the cap bit and recall is bounded
    by design rather than silently quadratic."""
    bt = _band_table(sigs, id_col, bands, rows_per_band)
    per_bucket = bt.groupBy("band", "bsig").agg(
        F.count(F.lit(1)).alias("m")
    )
    return per_bucket.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("m").alias("max_bucket"),
        F.sum(
            F.when(F.col("m") > int(bucket_cap), 1).otherwise(0)
        ).alias("n_capped"),
    )


def jaccard_verify(
    pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id",
    threshold: float = 0.0,
    assume_distinct: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs only:
    |A∩B| / |A∪B| over DISTINCT shingle sets (ints -> exact).

    The intersection joins the pair's A-side shingles against the
    B-side on (b, shingle) — a hash join producing only the COMMON
    shingles, O(|A|+|B|) per pair. (The naive form — join both full
    sets then filter equality — materializes |A|x|B| rows per pair,
    which at web scale is the quadratic term LSH exists to avoid.)

    ``assume_distinct=True`` skips the per-doc distinct shuffle when
    the caller guarantees (id, shingle) rows are already unique —
    scale-mode `shingles` emits array_distinct'ed sets row-locally,
    so the full-table exchange here would be pure waste."""
    s = sh if assume_distinct else sh.distinct()
    sizes = s.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pairs.join(s.withColumnRenamed(id_col, "a"), on="a")
        .join(
            s.withColumnRenamed(id_col, "b"),
            on=["b", "shingle"],
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        pairs.join(inter, on=["a", "b"], how="left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnRenamed(id_col, "a")
              .withColumnRenamed("sz", "sz_a"), on="a")
        .join(sizes.withColumnRenamed(id_col, "b")
              .withColumnRenamed("sz", "sz_b"), on="b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast(
                "double"
            ),
        )
        .select("a", "b", "jaccard")
    )
    if threshold > 0:
        out = out.where(F.col("jaccard") >= threshold)
    return out


def minhash_lsh_dedup(
    df: DataFrame, threshold: float = 0.5, n: int = 3,
    text: str = "text", id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
    shingle_staging: str | None = None,
) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> band -> verify.

    The shingle table feeds BOTH the signature aggregation and the
    Jaccard verification joins. Two sharing strategies:

    - default (``shingle_staging=None``): persist() — no eager
      materialization barrier (a localCheckpoint measured ~13% slower
      on the headline bench; shingles are deterministic, so
      eviction-triggered recompute is safe). Right for interactive /
      single-run use at bench scale.
    - ``shingle_staging=<path>``: the 100 TB shape (VERDICT r1 #4/#8)
      — the shingle table is WRITTEN once as a parquet staging table
      (an Iceberg staging table on a real cluster) and both consumers
      read it back; a path that already exists is REUSED, so a
      crashed/resumed curation job skips the shingle recompute
      entirely (CorpusJob wires this per-stage).
    """
    sh = shingles(df, n, text, id_col, vocab_df)
    if shingle_staging is not None:
        sh = _stage_table(sh, shingle_staging)
    else:
        sh = sh.persist()
    sigs = minhash_signatures(sh, id_col)
    cand = lsh_candidate_pairs(sigs, id_col)
    # scale-mode shingles are per-doc distinct at the source
    return jaccard_verify(
        cand, sh, id_col, threshold, assume_distinct=vocab_df is None
    )


def _stage_table(df: DataFrame, path: str) -> DataFrame:
    """Write-once staging table: reuse `path` if it already holds a
    committed parquet write, else materialize df there. Parquet's
    _SUCCESS marker is the commit protocol (half-written dirs from a
    crash mid-write are ignored and rewritten)."""
    spark = df.sparkSession
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    success = spark._jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + "/_SUCCESS"
    )
    if not fs.exists(success):
        df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _shingle_starts(
    df: DataFrame, width: int, text: str, id_col: str,
    vocab_df: DataFrame | None,
) -> DataFrame:
    """(id, pos, shingle) for every width-gram start position — the
    positional form of `shingles` (same two physical paths: row-local
    posexplode of the hashed token array in scale mode, token window
    in vocab/oracle mode)."""
    from pdal_spark.operators.textops import TOKEN_SEP

    if vocab_df is None:
        df = _parallel_scan(df, id_col)
        arr = F.split(F.col(text), TOKEN_SEP)
        ids = F.transform(
            arr, lambda w: F.abs(F.xxhash64(w)) % F.lit(G.M31)
        )

        def chain(i):
            h = F.element_at(ids, i + 1)
            for k in range(1, width):
                h = (h * 8191 + F.element_at(ids, i + 1 + k)) % M31
            return h

        sh_arr = F.when(
            F.size(arr) >= width,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - width), chain
            ),
        ).otherwise(F.array().cast("array<long>"))
        return df.select(
            F.col(id_col),
            F.posexplode(sh_arr).alias("pos", "shingle"),
        )

    t = token_ids(df, text, id_col, vocab_df)
    w = Window.partitionBy(id_col).orderBy("pos")
    h = F.col("word_id")
    for i in range(1, width):
        h = (h * 8191 + F.lead("word_id", i).over(w)) % M31
    return (
        t.withColumn("shingle", h)
        .where(F.col("shingle").isNotNull())
        .select(id_col, "pos", "shingle")
    )


SIMHASH_BITS = 16


def simhash(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
    vocab_df: DataFrame | None = None, bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash over token ids: bit b of token w =
    lehmer2(w * 131 + b) % 2; doc bit = majority (+1/-1 sum > 0).

    Scale mode (no vocab): the per-doc bit sums are row-local
    `aggregate()` folds over the hashed token array — zero shuffle,
    the whole signature is computed inside the scan's codegen stage.
    Vocab/oracle mode keeps the token explode + one groupBy (the
    DuckDB mirror)."""
    if vocab_df is None:
        from pdal_spark.operators.textops import TOKEN_SEP

        df = _parallel_scan(df, id_col)
        ids = F.transform(
            F.split(F.col(text), TOKEN_SEP),
            lambda w: F.abs(F.xxhash64(w)) % F.lit(G.M31),
        )

        def bit_sum(b):
            def step(acc, w):
                h1 = ((w * 131 + b) + 7) * 48271 % M31
                h = h1 * 48271 % M31
                return acc + (h % 2) * 2 - 1

            return F.aggregate(ids, F.lit(0).cast("long"), step)

        sig = F.lit(0).cast("long")
        for b in range(bits):
            sig = sig + F.when(bit_sum(b) > 0, 1 << b).otherwise(0)
        return df.select(F.col(id_col), sig.alias("simhash"))

    t = token_ids(df, text, id_col, vocab_df)
    aggs = []
    for b in range(bits):
        bit = F.expr(
            f"({G.lehmer2(f'(word_id * 131 + {b})')} % 2)"
        )
        aggs.append(
            F.sum(bit * 2 - 1).alias(f"__s{b}")
        )
    per = t.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(F.col(f"__s{b}") > 0, 1 << b).otherwise(0)
    return per.select(id_col, sig.alias("simhash"))


def simhash_dup_buckets(sims: DataFrame, id_col: str = "doc_id"
                        ) -> DataFrame:
    """Docs sharing an identical simhash (hamming-0 near-dup set)."""
    return (
        sims.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(id_col).alias("canonical"))
        .where(F.col("cnt") > 1)
    )


def frequent_shingle_fraction(
    df: DataFrame, doc_threshold: int = 2,
    text: str = "text", id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style boilerplate detection: for each doc, the fraction
    of its DISTINCT 3-gram shingles that occur in more than
    `doc_threshold` documents. High fraction = near-boilerplate page
    assembled from corpus-common phrases (caught even when MinHash
    Jaccard to any single other doc is low).

    Shuffle profile: distinct on (doc, shingle) then one groupBy on
    shingle (map-side combined, output is shingle-vocabulary-sized);
    the doc-frequency table joins back by shingle — at web scale this
    is the one join that is NOT broadcastable (shingle vocab is huge)
    and it co-partitions with the distinct's hash partitioning, so
    AQE plans it without an extra exchange on the left side. Integer
    counts, one final IEEE division: oracle-exact."""
    sh = shingles(df, 3, text, id_col, vocab_df).distinct()
    sdf = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("sdf")
    )
    return (
        sh.join(sdf, on="shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("sdf") > doc_threshold, 1).otherwise(0)
            ).alias("n_common"),
        )
        .select(
            id_col,
            "n_shingles",
            (
                F.col("n_common").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("common_frac"),
        )
    )


def near_dup_doc_components(
    df: DataFrame,
    jaccard_threshold: float = 0.5,
    text: str = "text",
    id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
    shingle_staging: str | None = None,
) -> DataFrame:
    """MinHash near-dup DEDUP for documents: connected components
    over the verified (Jaccard >= threshold) LSH pair graph,
    canonical survivor = smallest doc id per component — the text
    counterpart of `similarity.near_dup_components`. Jaccard is an
    exact integer-count ratio, so the threshold edge set (and hence
    the components) is oracle-exact with no float risk.
    ``shingle_staging``: see minhash_lsh_dedup (resume-safe staging
    table instead of persist())."""
    pairs = minhash_lsh_dedup(
        df, threshold=0.0, text=text, id_col=id_col, vocab_df=vocab_df,
        shingle_staging=shingle_staging,
    ).where(F.col("jaccard") >= float(jaccard_threshold)).select("a", "b")
    from pdal_spark.operators.cluster import connected_components_star

    edges = pairs.select(
        F.col("a").alias("src_id"), F.col("b").alias("nb_id")
    ).unionByName(
        pairs.select(F.col("b").alias("src_id"),
                     F.col("a").alias("nb_id"))
    )
    nodes = df.select(F.col(id_col).alias("pid"))
    comp = connected_components_star(nodes, edges)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("comp_size")
    )
    return comp.join(sizes, on="component").select(
        F.col("pid").alias(id_col),
        F.col("component").alias("canonical_id"),
        "comp_size",
    )


def duplicated_span_stats(
    df: DataFrame,
    width: int = 10,
    min_count: int = 2,
    text: str = "text",
    id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """ExactSubstr-style duplicated-span coverage (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): per
    doc, the fraction of tokens covered by at least one `width`-gram
    that occurs >= min_count times corpus-wide (within-document
    repeats included). The suffix-array of the serial reference
    becomes a distributed shingle-start pipeline:

    - width-gram rolling hashes at every token position (per-doc
      window, no corpus shuffle);
    - corpus-duplicated shingles = one map-side-combined groupBy;
    - coverage = dup starts exploded onto their width offsets, then
      a distinct + per-doc count. Shuffle volume is bounded by
      width x duplicated-start rows, not the corpus.

    Span identity is the rolling hash (as in the LSH family here);
    both engines use the identical Lehmer chain so the DuckDB oracle
    is exact. Returns (id, n_tokens, dup_tokens, dup_frac) with one
    final IEEE division.
    """
    t = token_ids(df, text, id_col, vocab_df)
    starts = _shingle_starts(df, width, text, id_col, vocab_df)
    dup = (
        starts.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= int(min_count))
        .select("shingle")
    )
    covered = (
        starts.join(dup, on="shingle")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(width - 1))
            ).alias("cpos"),
        )
        .distinct()
    )
    cov = covered.groupBy(id_col).agg(F.count(F.lit(1)).alias("dup_tokens"))
    n_toks = t.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        n_toks.join(cov, on=id_col, how="left")
        .withColumn("dup_tokens", F.coalesce(F.col("dup_tokens"), F.lit(0)))
        .withColumn(
            "dup_frac",
            F.col("dup_tokens").cast("double")
            / F.col("n_tokens").cast("double"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """Eval-set n-gram decontamination: per training doc, how many of
    its distinct n-word shingles occur anywhere in a held-out
    eval/benchmark corpus (the GPT-3 appendix-C / PaLM contamination
    check, run as a corpus op before training).

    Scale: eval corpora are tiny next to a 10^12-doc training table,
    so the distinct eval shingle set is broadcast; the training side
    is one shingle pass + broadcast left join + per-doc agg — the
    corpus shuffles once on (doc_id) for the distinct/agg and never
    on shingle. Same broadcast-lookup shape as filters.overlay's
    first-match join (reference OverlayFilter.cpp:172-185): the small
    side is built once and probed per batch, JVM-side.

    Returns (id, n_shingles, contaminated, contamination_frac,
    is_contaminated).
    """
    tr = shingles(train, n, text, id_col, vocab_df).distinct()
    ev = (
        shingles(eval_df, n, text, id_col, vocab_df)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = tr.join(F.broadcast(ev), on="shingle", how="left")
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias(
            "contaminated"
        ),
    )
    return agg.select(
        id_col,
        "n_shingles",
        "contaminated",
        (
            F.col("contaminated").cast("double")
            / F.col("n_shingles").cast("double")
        ).alias("contamination_frac"),
        (F.col("contaminated") > 0).cast("int").alias("is_contaminated"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    width: int = 10,
    min_count: int = 2,
    text: str = "text",
    id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """ExactSubstr dedup CUT step (Lee et al. 2021 §3.1): rewrite each
    document with every corpus-duplicated width-token span removed —
    the step that actually shrinks the training corpus, where
    `duplicated_span_stats` only measures it.

    Scale: identical shuffle profile to duplicated_span_stats (doc-
    partitioned rolling hash, one map-side-combined groupBy on the
    shingle key, bounded explode of duplicated starts) plus ONE extra
    doc-keyed shuffle to reassemble the kept tokens in order; the
    per-doc collect_list is bounded by document length, never corpus
    size. Returns (id, n_tokens, kept_tokens, text_clean); fully
    duplicated docs come back with text_clean = ''.
    """
    from pdal_spark.operators.textops import tokens as _tokens

    t = _tokens(df, text, id_col)
    starts = _shingle_starts(df, width, text, id_col, vocab_df)
    dup = (
        starts.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= int(min_count))
        .select("shingle")
    )
    covered = (
        starts.join(dup, on="shingle")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(width - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = t.select(id_col, "pos", "word").join(
        covered, on=[id_col, "pos"], how="left_anti"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("text_clean"),
    )
    nt = t.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    return nt.join(rebuilt, on=id_col, how="left").select(
        id_col,
        "n_tokens",
        F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


def simhash_near_dup(
    sims: DataFrame,
    k: int = 2,
    bits: int = SIMHASH_BITS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hamming-distance-<=k SimHash near-dup pairs via the bit-band
    trick (Manku et al. 2007, the Google near-dup crawler design):
    split the signature into k+1 chunks — any pair within hamming k
    agrees exactly on at least one chunk (pigeonhole), so candidates
    are self-join buckets on (chunk_idx, chunk_value) and the exact
    hamming distance (bit_count of xor) verifies each candidate.

    Scale: shuffles only (chunk_idx, chunk_value, id) triples — k+1
    rows per doc, never pairs beyond bucket-mates; the verify is a
    codegen'd popcount on the joined row. Same shape as the MinHash
    LSH band join. Returns (a, b, hamming).
    """
    n_chunks = k + 1
    base = bits // n_chunks
    sizes = [base + (1 if i < bits % n_chunks else 0)
             for i in range(n_chunks)]
    offs = [sum(sizes[:i]) for i in range(n_chunks)]
    frames = []
    for i in range(n_chunks):
        chunk = F.shiftright(F.col("simhash"), offs[i]) % (1 << sizes[i])
        frames.append(
            sims.select(
                F.col(id_col).alias("doc"),
                F.col("simhash").alias("sig"),
                F.lit(i).alias("chunk_idx"),
                chunk.alias("chunk_val"),
            )
        )
    all_chunks = frames[0]
    for fme in frames[1:]:
        all_chunks = all_chunks.unionByName(fme)
    left = all_chunks.select(
        "chunk_idx", "chunk_val",
        F.col("doc").alias("a"), F.col("sig").alias("sig_a"),
    )
    right = all_chunks.select(
        "chunk_idx", "chunk_val",
        F.col("doc").alias("b"), F.col("sig").alias("sig_b"),
    )
    return (
        left.join(right, on=["chunk_idx", "chunk_val"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= int(k))
    )


def winnow_fingerprints(
    df: DataFrame,
    w: int = 4,
    n: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03
    — the MOSS local fingerprinting scheme): hash every n-gram
    shingle, slide a window of `w` consecutive shingles, keep the
    window MINIMUM, emit the distinct mins. Guarantees every match
    of length >= w + n - 1 tokens shares a fingerprint, with ~2/(w+1)
    of shingles selected. (Plain window-min variant: ties keep the
    min value once, selection is position-free after DISTINCT.)

    Same two physical paths as `shingles` (dedup.py): scale mode is
    fully ROW-LOCAL (shingle array -> sliding array_min -> explode
    -> distinct; the only shuffle is the distinct), oracle mode uses
    dense vocab ids + per-doc windows so an independent SQL engine
    reproduces the exact integers.
    """
    from pdal_spark.operators.textops import TOKEN_SEP

    if vocab_df is None:
        df = _parallel_scan(df, id_col)
        arr = F.split(F.col(text), TOKEN_SEP)
        ids = F.transform(
            arr, lambda t: F.abs(F.xxhash64(t)) % F.lit(G.M31)
        )

        def chain(i):
            h = F.element_at(ids, i + 1)
            for k in range(1, n):
                h = (h * 8191 + F.element_at(ids, i + 1 + k)) % M31
            return h

        sh_arr = F.transform(F.sequence(F.lit(0), F.size(arr) - n), chain)
        fps = F.transform(
            F.sequence(F.lit(1), F.size(arr) - n - w + 2),
            lambda i: F.array_min(F.slice(sh_arr, i, w)),
        )
        return (
            df.where(F.size(arr) >= n + w - 1)
            .select(F.col(id_col), F.explode(fps).alias("fingerprint"))
            .distinct()
        )

    t = token_ids(df, text, id_col, vocab_df)
    win = Window.partitionBy(id_col).orderBy("pos")
    cols = [F.col("word_id")] + [
        F.lead("word_id", i).over(win) for i in range(1, n)
    ]
    h = cols[0]
    for c in cols[1:]:
        h = (h * 8191 + c) % M31
    s = (
        t.withColumn("shingle", h)
        .where(F.col("shingle").isNotNull())
        .select(id_col, "pos", "shingle")
    )
    fpw = win.rowsBetween(0, w - 1)
    s = (
        s.withColumn("fp", F.min("shingle").over(fpw))
        .withColumn("rn", F.row_number().over(win))
        .withColumn("cnt", F.count(F.lit(1)).over(
            Window.partitionBy(id_col)))
    )
    return (
        s.where(F.col("rn") <= F.col("cnt") - w + 1)
        .select(F.col(id_col), F.col("fp").alias("fingerprint"))
        .distinct()
    )


def incremental_exact_dedup(
    new: DataFrame,
    existing: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup — the production shape when a NEW
    crawl lands on an EXISTING deduped corpus: drop new docs whose
    content digest is already present, then exact-dedup within the
    batch (keep min id). The existing corpus contributes only its
    digest set; its text is never read past the digest scan and it
    is never re-deduped.

    Scale: candidate work is |new| + a digest semi-join — at 100 TB
    corpus + 1 TB batch the cost tracks the BATCH, not the corpus.
    In steady state the corpus digest set is a maintained bucketed
    table (plans.bucketing), making the anti-join exchange-free on
    the batch side too.
    """
    nh = new.withColumn("__h", F.md5(F.col(text)))
    eh = existing.select(F.md5(F.col(text)).alias("__h")).distinct()
    fresh = nh.join(eh, on="__h", how="left_anti")
    keep = fresh.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return (
        fresh.join(keep, on=[id_col, "__h"], how="left_semi")
        .drop("__h")
    )


def incremental_minhash_dedup(
    new: DataFrame,
    existing: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup detection: candidate pairs are (new x
    existing) band collisions plus (new x new) — existing x existing
    is NEVER generated, so the quadratic term tracks the batch. The
    corpus side contributes signatures and shingles for verification
    only (in steady state both live as maintained bucketed tables).

    Returns (a, b, jaccard) with a = new doc, b = existing doc for
    cross pairs, a < b for intra-batch pairs.
    """
    sh_new = shingles(new, n, text, id_col, vocab_df).persist()
    sh_ex = shingles(existing, n, text, id_col, vocab_df)
    sigs_new = minhash_signatures(sh_new, id_col)
    sigs_ex = minhash_signatures(sh_ex, id_col)
    bn = _band_table(sigs_new, id_col)
    be = _band_table(sigs_ex, id_col)
    cross = (
        bn.select("band", "bsig", F.col("doc").alias("a"))
        .join(be.select("band", "bsig", F.col("doc").alias("b")),
              on=["band", "bsig"])
        .select("a", "b")
        .distinct()
    )
    intra = lsh_candidate_pairs(sigs_new, id_col)
    pairs = cross.unionByName(intra).distinct()
    sh_all = sh_new.unionByName(sh_ex)
    return jaccard_verify(pairs, sh_all, id_col, threshold)


def span_corpus_dedup(
    df: DataFrame,
    span_words: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style span-level CORPUS dedup (Raffel et al. 2020 §2.2:
    "we discarded all but one of any three-sentence span occurring
    more than once in the data set"): documents are cut into
    consecutive ``span_words``-word spans (the sentence-unit analog
    for whitespace corpora), every span occurrence except the FIRST
    in the corpus (smallest (doc_id, span position)) is discarded —
    including repeats within one document — and documents are
    reassembled from their surviving spans in order. Documents whose
    every span was discarded drop out entirely, as in C4.

    Distinct from ``remove_duplicated_spans`` (ExactSubstr, Lee et
    al. 2021): that removes any re-occurring substring wherever it
    appears; C4's rule is positional — one canonical copy survives.

    Scale shape: span cutting is ROW-LOCAL (one codegen'd transform
    over the split-word array — no token explode); the
    first-occurrence rank shuffles 8-byte span hashes + (doc, pos)
    once; reassembly shuffles only surviving (doc, pos, span) rows.
    The full text never shuffles as a whole. Output:
    (doc_id, text, n_spans, n_kept).
    """
    n = int(span_words)
    df = _parallel_scan(df, id_col)
    ws = F.split(F.col(text), " ")
    n_spans = F.ceil(F.size(ws).cast("double") / F.lit(float(n))).cast("int")
    spans_arr = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.concat_ws(
            " ", F.slice(ws, i * n + 1, F.lit(n))
        ),
    )
    sp = df.select(
        F.col(id_col),
        F.posexplode(spans_arr).alias("pos", "span"),
    )
    w = Window.partitionBy("span").orderBy(
        F.col(id_col).asc(), F.col("pos").asc()
    )
    kept = (
        sp.withColumn("__occ", F.row_number().over(w))
        .where(F.col("__occ") == 1)
        .select(id_col, "pos", "span")
    )
    totals = sp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "span"))
                ),
                lambda s: s["span"],
            ),
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return rebuilt.join(totals, on=id_col).select(
        id_col, "text", "n_spans", "n_kept"
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership dedup (FineWeb/Dolma-style): the corpus is
# folded into a fixed-size bitmap of fingerprint hash positions; a
# new batch is flagged against the bitmap without ever joining the
# corpus. No false negatives (every true member flags), deterministic
# false-positive rate set by m_bits/k vs corpus size.
# ---------------------------------------------------------------------------

BLOOM_K = 3


def _bloom_positions(fp_df: DataFrame, m_bits: int, k: int,
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, __w, __b): word index + bit index of each of the k
    hash positions of a fingerprint. Position i = lehmer2(fp*131+i)
    % m_bits — pure integer arithmetic, oracle-identical."""
    pos = fp_df.select(
        id_col,
        F.explode(
            F.array(*[
                F.expr(
                    f"({G.lehmer2(f'(`fingerprint` * 131 + {i})')}"
                    f" % {m_bits})"
                )
                for i in range(1, k + 1)
            ])
        ).alias("__p"),
    )
    return pos.select(
        id_col,
        F.expr("`__p` div 64").alias("__w"),
        F.expr("`__p` % 64").alias("__b"),
    )


def bloom_build(
    df: DataFrame,
    vocab_df: DataFrame | None = None,
    m_bits: int = 1 << 20,
    k: int = BLOOM_K,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fold a corpus into a Bloom bitmap DataFrame (__w word index,
    bits int64) keyed on the rolling document fingerprint.

    Scale: ONE map-side-combined groupBy over at most m_bits/64 rows;
    the corpus itself never shuffles (fingerprints are row-local in
    scale mode). The bitmap is millions of times smaller than the
    corpus — broadcastable state that incremental crawls test
    against, the same role as the incremental_exact_dedup baseline
    join but O(m_bits) instead of O(corpus).
    """
    from pdal_spark.operators.textops import fingerprint

    fp = fingerprint(df, vocab_df, text, id_col)
    pos = _bloom_positions(fp, m_bits, k, id_col)
    return pos.groupBy("__w").agg(
        F.bit_or(F.expr("shiftleft(cast(1 as bigint), cast(`__b` as int))"))
        .alias("bits")
    )


def bloom_member(
    df: DataFrame,
    bitmap: DataFrame,
    vocab_df: DataFrame | None = None,
    m_bits: int = 1 << 20,
    k: int = BLOOM_K,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, in_bloom): probe every document of a batch against a
    corpus bitmap from bloom_build. in_bloom = all k bits set (never
    false for a true member). Broadcast join on the word index; the
    batch text never shuffles."""
    from pdal_spark.operators.textops import fingerprint

    fp = fingerprint(df, vocab_df, text, id_col)
    pos = _bloom_positions(fp, m_bits, k, id_col)
    probed = pos.join(F.broadcast(bitmap), on="__w", how="left")
    hit = F.coalesce(
        F.expr("((`bits` >> cast(`__b` as int)) & 1) = 1"), F.lit(False)
    )
    return (
        probed.withColumn("__hit", hit)
        .groupBy(id_col)
        .agg(F.bool_and("__hit").alias("in_bloom"))
    )


def allpairs_jaccard_pairs(
    df: DataFrame,
    threshold_num: int = 1,
    threshold_den: int = 2,
    n: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join: every pair (a < b) whose
    n-gram-shingle Jaccard >= num/den, via AllPairs/PPJoin prefix
    filtering (Bayardo et al. 2007 WWW; Xiao et al. 2008) — the
    deterministic complement of minhash_lsh_dedup: completeness is a
    theorem, not an LSH probability.

    Prefix filter: order every doc's distinct shingles by ascending
    GLOBAL document frequency (rarest first, ties on shingle id) and
    keep only the first |X| - ceil(t*|X|) + 1 as the join prefix.
    Guarantee: J(A,B) >= t implies |A∩B| >= ceil(t/(1+t)*(|A|+|B|))
    = alpha, and the globally-smallest common shingle sits within the
    first |X| - alpha + 1 of BOTH docs; |B| >= t*|A| makes the
    per-doc bound |X| - ceil(t*|X|) + 1 >= |X| - alpha + 1, so the
    prefix-prefix equi-join on shingle loses no qualifying pair.

    Verify is integer-exact (den*inter >= num*(szA+szB-inter)); the
    reported jaccard is the IEEE-exact ratio of two int64s.

    Scale: frequencies are one map-side-combined groupBy; prefix
    ranks are a per-doc window (bounded by doc shingle count, no
    global sort); the candidate join is keyed on the RAREST shingles
    — the frequency ordering exists precisely to keep that key's
    fan-out minimal — and the verify join touches candidates only.
    """
    t_num, t_den = int(threshold_num), int(threshold_den)
    sh = shingles(df, n, text, id_col, vocab_df).distinct().persist()
    sz = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    freq = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("__gdf")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__gdf").asc(), F.col("shingle").asc()
    )
    pref = (
        sh.join(freq, on="shingle")
        .withColumn("__pos", F.row_number().over(w))
        .join(sz, on=id_col)
        .where(
            F.col("__pos")
            <= F.col("sz")
            - F.expr(f"(({t_num} * sz + {t_den - 1}) div {t_den})")
            + 1
        )
        .select(id_col, "shingle")
    )
    cand = (
        pref.select(F.col(id_col).alias("a"), "shingle")
        .join(pref.select(F.col(id_col).alias("b"), "shingle"),
              on="shingle")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    s = sh
    inter = (
        cand.join(s.withColumnRenamed(id_col, "a"), on="a")
        .join(s.withColumnRenamed(id_col, "b"), on=["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sza = sz.withColumnRenamed(id_col, "a").withColumnRenamed("sz", "sz_a")
    szb = sz.withColumnRenamed(id_col, "b").withColumnRenamed("sz", "sz_b")
    return (
        inter.join(sza, on="a")
        .join(szb, on="b")
        .where(
            F.lit(t_den) * F.col("n_inter")
            >= F.lit(t_num)
            * (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            .cast("double"),
        )
        .select("a", "b", "n_inter", "jaccard")
    )


def edit_distance_pairs(
    df: DataFrame,
    key: str,
    k: int = 2,
    prefix: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Blocked edit-distance near-duplicate pairs: (a < b, dist) with
    levenshtein(key_a, key_b) <= k AMONG candidates sharing the first
    `prefix` characters and |length difference| <= k — the classic
    record-linkage blocking (title/URL variants that MinHash's
    set-of-shingles view scores as distant: transposed words,
    one-character typos). Blocking is part of the CONTRACT (prefix-
    divergent twins are out of scope by definition, like LSH's recall
    band); levenshtein is a built-in on both engines with identical
    unit-cost semantics, so the gate hash-matches.

    Scale: one shuffle on the (prefix, length-band) block key;
    within-block pairing is the usual quadratic-in-block-size cost —
    the prefix length is the block-size dial. The length filter is
    a cheap pre-reject (|len diff| > k implies dist > k).
    """
    s = (
        df.select(
            F.col(id_col).alias("i"), F.col(key).alias("ka")
        )
        .where(F.length("ka") >= int(prefix))
        .withColumn("blk", F.expr(f"substr(ka, 1, {int(prefix)})"))
    )
    t = s.select(
        F.col("i").alias("j"), F.col("ka").alias("kb"), "blk"
    )
    pairs = (
        s.join(t, on="blk")
        .where(F.col("i") < F.col("j"))
        .where(F.expr(f"abs(length(ka) - length(kb)) <= {int(k)}"))
        .withColumn("dist", F.expr("levenshtein(ka, kb)"))
        .where(F.col("dist") <= int(k))
    )
    return pairs.select(
        F.col("i").alias("a"), F.col("j").alias("b"), "dist"
    )


def containment_pairs(
    df: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_df: int = 50,
    n: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """ASYMMETRIC near-duplicate pairs by shingle containment
    C(A in B) = |A ∩ B| / |A| >= num/den — the subset detector
    symmetric Jaccard misses (a page quoted inside a longer page
    scores low Jaccard but containment ~1; Broder 1997 distinguishes
    "resemblance" from "containment" for exactly this). Output both
    directions that qualify: (a, b, inter, sz_a, containment) with a
    = the contained (smaller-side) doc of the pair row.

    Candidate generation: docs sharing at least one RARE shingle
    (global df <= max_df) — the discriminative-shingle blocking rule;
    the candidate key explicitly avoids stop-shingle fan-out, and
    `max_df` is the completeness/blow-up dial (a pair sharing ONLY
    ubiquitous shingles is out of contract). Verify is integer-exact
    (den * inter >= num * sz_a).

    Scale: one shingle-df groupBy + a rare-shingle equi-join (fan-out
    bounded by max_df^2 per shingle) + one map-side-combined pair
    count; text never shuffles.
    """
    t_num, t_den = int(threshold_num), int(threshold_den)
    sh = shingles(df, n, text, id_col, vocab_df).distinct()
    sz = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    rare = sh.join(
        freq.where(F.col("__df") <= int(max_df)), on="shingle"
    )
    l = rare.select(F.col(id_col).alias("a"), "shingle")
    r = rare.select(F.col(id_col).alias("b"), "shingle")
    cand = (
        l.join(r, on="shingle")
        .where(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # exact intersection over FULL shingle sets of candidate pairs
    sa = sh.select(F.col(id_col).alias("a"), "shingle")
    sb = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        cand.join(sa, on="a")
        .join(sb, on=["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(
            sz.select(F.col(id_col).alias("a"),
                      F.col("sz").alias("sz_a")),
            on="a",
        )
        .where(F.expr(f"{t_den} * inter >= {t_num} * sz_a"))
    )
    return out.select(
        "a", "b", "inter", "sz_a",
        F.expr(
            "cast(inter as double) / cast(sz_a as double)"
        ).alias("containment"),
    )


def near_dup_keep_best(
    df: DataFrame,
    score_col: str,
    jaccard_threshold: float = 0.5,
    text: str = "text",
    id_col: str = "doc_id",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """Near-dup dedup keeping the BEST copy per duplicate cluster
    instead of the smallest id: survivor = argmax(score, ties to the
    smaller id) within each Jaccard-component — the production
    refinement of near_dup_doc_components (dedup should keep the most
    complete/highest-quality version of a page, not an arbitrary
    one; FineWeb/CCNet pipelines rank survivors by length or quality
    score exactly like this). Output per doc:
    (id, survivor_id, comp_size, is_survivor).

    Scale: the component pipeline unchanged + one score join + a
    1-row WindowGroupLimit heap per component.
    """
    from pyspark.sql import Window

    comp = near_dup_doc_components(
        df, jaccard_threshold=jaccard_threshold, text=text,
        id_col=id_col, vocab_df=vocab_df,
    )
    scored = comp.join(
        df.select(F.col(id_col), F.col(score_col).alias("__score")),
        on=id_col,
    )
    w = Window.partitionBy("canonical_id").orderBy(
        F.col("__score").desc(), F.col(id_col).asc()
    )
    ranked = scored.withColumn("__rn", F.row_number().over(w))
    best = ranked.where("__rn = 1").select(
        F.col("canonical_id"),
        F.col(id_col).alias("survivor_id"),
    )
    return (
        ranked.join(best, on="canonical_id")
        .select(
            id_col, "survivor_id", "comp_size",
            F.expr(f"`{id_col}` = survivor_id").alias("is_survivor"),
        )
    )


CDC_GEAR_K = 2654435761
CDC_WIN = 32


def cdc_chunks(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    mask_bits: int = 6,
) -> DataFrame:
    """Content-defined chunking (the Gear/FastCDC family, Xia 2016
    — the storage/transfer dedup primitive: chunk boundaries follow
    CONTENT, so an insertion shifts one chunk instead of rechunking
    the file). Rolling hash over the last 32 characters:

        h_t = (2*h_{t-1} + g(c_t)) mod 2^32,
        g(c) = ((cp(c) % 256) + 1) * 2654435761 mod 2^24

    — the mod-2^32 recurrence IS the 32-char windowed hash (the
    2^32 coefficient of the char leaving the window vanishes), so
    it has the closed form sum_{j<32} g(c_{t-j})*2^j mod 2^32 that
    a SQL oracle can evaluate with a 32-offset join. A boundary
    falls where h_t has `mask_bits` low zero bits (expected chunk
    ~2^mask_bits chars); position t ends its chunk. Output:
    (id, chunk_idx, start, length) — 0-based character offsets;
    compose with md5(substring(...)) for the chunk content hash
    (character semantics match across engines).

    Scale: the kernel is one vectorized numpy pass per Arrow batch
    (sliding-window dot, no per-char Python); docs never shuffle —
    chunking is row-local.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    win, k = CDC_WIN, int(mask_bits)
    mask = (1 << k) - 1

    def kern(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = (1 << np.arange(win, dtype="u8"))  # 2^j, j=0..31

        for pdf in it:
            ids, idxs, starts, lens = [], [], [], []
            for did, txt in zip(pdf[id_col], pdf[text]):
                s = "" if txt is None else txt
                n = len(s)
                cps = np.frombuffer(
                    s.encode("utf-32-le"), dtype="<u4"
                ).astype("u8")
                g = ((cps % 256) + 1) * CDC_GEAR_K % (1 << 24)
                if n >= win:
                    sw = np.lib.stride_tricks.sliding_window_view(
                        g, win)
                    # h at positions win-1 .. n-1 (window ENDS at t,
                    # newest char gets weight 2^0 ... oldest 2^31)
                    h = (sw @ w[::-1]) & 0xFFFFFFFF
                    bpos = np.nonzero((h & mask) == 0)[0] + win - 1
                else:
                    bpos = np.array([], dtype="i8")
                ends = np.unique(np.append(bpos, n - 1)) \
                    if n else np.array([], dtype="i8")
                st = 0
                for ci, e in enumerate(ends):
                    ids.append(did)
                    idxs.append(ci)
                    starts.append(st)
                    lens.append(int(e) - st + 1)
                    st = int(e) + 1
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "chunk_idx": pd.Series(idxs, dtype="int32"),
                "start": pd.Series(starts, dtype="int64"),
                "length": pd.Series(lens, dtype="int64"),
            })

    return df.select(id_col, text).mapInPandas(
        kern,
        f"`{id_col}` long, chunk_idx int, start long, length long",
    )


def blocking_eval(
    candidates: DataFrame,
    gold: DataFrame,
    n_records: int,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Entity-resolution blocking quality (Christen 2012): score a
    candidate-pair generator (LSH bands, simhash buckets, sort-key
    neighborhoods) against labeled gold matches. Emits the exact
    integer sufficient statistics —

        n_cand, n_gold, n_hit = |candidates ∩ gold|,
        n_pairs = n_records*(n_records-1)/2

    — from which reduction ratio (1 - n_cand/n_pairs) and pair
    completeness / recall (n_hit/n_gold) follow by one division
    each. Pairs are normalized to (min, max) id order first, so a
    generator emitting (b, a) still scores correctly.

    Scale: one hash semi-join of gold against candidates (gold is
    small — broadcast) + two counts. The quadratic n_pairs is
    arithmetic, never materialized.
    """
    def norm(df):
        return df.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        ).distinct()

    c = norm(candidates).localCheckpoint(eager=True)
    g = norm(gold).localCheckpoint(eager=True)
    hit = g.join(c, on=["a", "b"], how="semi")
    n = int(n_records)
    return (
        c.agg(F.count(F.lit(1)).alias("n_cand"))
        .crossJoin(g.agg(F.count(F.lit(1)).alias("n_gold")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .withColumn(
            "n_pairs", F.lit(n * (n - 1) // 2).cast("long")
        )
    )


def golden_record(
    df: DataFrame,
    cluster: str,
    ts: str,
    fields: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Field-level survivorship merge / golden record (the entity-
    resolution step AFTER near-dup clustering): one output row per
    cluster carrying, for every field independently, the LATEST
    NON-NULL value by `ts` (ties to the larger id — deterministic),
    plus the member count and the id of the newest member. The
    "merge the duplicate customer rows" primitive near_dup_keep_best
    (whole-row winner) cannot express.

    Scale: ONE hash aggregate — per field a max_by over a
    (non-null-rank, ts, id) struct, all map-side combinable; no
    window, no self-join.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_members"),
        F.max_by(F.col(id_col),
                 F.struct(F.col(ts), F.col(id_col))).alias("newest_id"),
    ]
    for f in fields:
        pick = F.struct(
            F.col(f).isNotNull().cast("int").alias("nn"),
            F.col(ts).alias("t"),
            F.col(id_col).alias("i"),
        )
        aggs.append(F.max_by(F.col(f), pick).alias(f))
    return df.groupBy(F.col(cluster).alias(cluster)).agg(*aggs)


FS_Q = 1 << 30


def fellegi_sunter(
    pairs: DataFrame,
    features: list[str],
    label: str = "is_match",
    q: int = FS_Q,
) -> DataFrame:
    """Fellegi-Sunter record-linkage weights (Fellegi & Sunter 1969)
    — THE probabilistic entity-resolution calibration: from labeled
    candidate pairs, estimate per comparison feature the agreement
    probabilities among matches (m) and non-matches (u), and the
    log-likelihood match weights

        w_agree    = ln(m / u),   w_disagree = ln((1-m)/(1-u))

    that a scorer sums over features (the principled replacement for
    hand-tuned near-dup thresholds; pairs come from the existing
    blocking/LSH candidate generators, labels from a review sample).

    Counts are exact int64 off ONE aggregate per feature (unpivoted
    row-locally); m/u are ratios of exact ints and each weight
    quantizes once (floor(round(ln(...), 9) * q + 0.5) — the repo's
    ln convention). Degenerate features (m or u at 0 or 1) emit NULL
    for the affected weight. Output per feature: (feature, n_match,
    n_unmatch, agree_m, agree_u, m, u, w_agree_q, w_disagree_q).

    Scale: one row-local explode over |features| + ONE map-side-
    combined hash aggregate.
    """
    from pdal_spark import sqlgen as G

    fq = G.fnum(float(int(q)))
    unpiv = pairs.select(
        F.col(label).cast("int").alias("lbl"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(f).alias("feature"),
                    F.col(f).cast("int").alias("agree"),
                )
                for f in features
            ])
        ).alias("t"),
    ).select("lbl", "t.feature", "t.agree")
    agg = unpiv.groupBy("feature").agg(
        F.sum(F.expr("lbl")).cast("long").alias("n_match"),
        F.sum(F.expr("1 - lbl")).cast("long").alias("n_unmatch"),
        F.sum(F.expr("lbl * agree")).cast("long").alias("agree_m"),
        F.sum(F.expr("(1 - lbl) * agree")).cast("long")
        .alias("agree_u"),
    )
    m = "(cast(agree_m as double) / cast(n_match as double))"
    u = "(cast(agree_u as double) / cast(n_unmatch as double))"
    return agg.select(
        "feature", "n_match", "n_unmatch", "agree_m", "agree_u",
        F.expr(
            f"case when n_match > 0 then {m} end"
        ).alias("m"),
        F.expr(
            f"case when n_unmatch > 0 then {u} end"
        ).alias("u"),
        F.expr(
            "case when agree_m > 0 and agree_u > 0"
            " and n_match > 0 and n_unmatch > 0 then"
            f" cast(floor(round(ln({m} / {u}), 9) * {fq}"
            f" + {G.fnum(0.5)}) as bigint) end"
        ).alias("w_agree_q"),
        F.expr(
            "case when agree_m < n_match and agree_u < n_unmatch"
            " and n_match > 0 and n_unmatch > 0 then"
            f" cast(floor(round(ln((1.0e0 - {m})"
            f" / (1.0e0 - {u})), 9) * {fq}"
            f" + {G.fnum(0.5)}) as bigint) end"
        ).alias("w_disagree_q"),
    )


def edit_join(
    df: DataFrame,
    d: int = 2,
    q: int = 2,
    id_col: str = "id",
    s: str = "s",
) -> DataFrame:
    """Self edit-distance similarity join with q-gram count-filter
    pruning (Gravano et al. 2001's Ed-Join family) — all UNORDERED
    string pairs within Levenshtein distance ``d``: the
    typo/variant-form near-dup detector that token-set joins
    (allpairs_jaccard) and simhash miss.

    Candidate rule (SOUND for strings of length >= q*(d+1), enforced
    by an input filter and documented): two strings within edit
    distance d and that long must share at least one q-gram, so
    candidates = pairs sharing ANY q-gram with |len diff| <= d, then
    verified with the exact engine-builtin ``levenshtein`` (unit
    costs match across Spark and DuckDB — verify SKILL notes). The
    brute-force oracle proves the pruning LOSSLESS.

    Output: (id_a, id_b, dist), id_a < id_b, dist <= d exact int.

    Scale: candidate volume tracks q-gram co-occurrence (shuffle on
    the gram key, hot grams AQE-skew-eligible), never |n|^2; verify
    touches candidates only. Shorter strings need the PassJoin chunk
    path — out of scope here, input-filtered.
    """
    qi, di = int(q), int(d)
    min_len = qi * (di + 1)
    base = df.select(
        F.col(id_col).alias("__id"), F.col(s).alias("__s")
    ).where(F.length("__s") >= min_len)
    grams = base.select(
        "__id", "__s",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(__s) - {qi} + 1),"
                f" i -> substring(__s, i, {qi}))"
            )
        ).alias("g"),
    ).distinct()
    a = grams.select(
        F.col("__id").alias("id_a"), F.col("__s").alias("sa"), "g"
    )
    b = grams.select(
        F.col("__id").alias("id_b"), F.col("__s").alias("sb"), "g"
    )
    cand = (
        a.join(b, on="g")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.expr(f"abs(length(sa) - length(sb)) <= {di}"))
        )
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    return cand.select(
        "id_a", "id_b",
        F.levenshtein("sa", "sb").cast("long").alias("dist"),
    ).where(F.col("dist") <= di)


def deletion_join(
    terms: DataFrame,
    word: str = "word",
) -> DataFrame:
    """SymSpell-style edit-distance-1 pair join (Garbe's deletion
    indexing; the spelling-variant/typo-cluster primitive next to
    edit_join's q-gram path): every term emits itself plus its
    length single-character-deletion variants as bucket keys; two
    terms within ONE edit (insert/delete/substitute) PROVABLY share
    a key (delete: b is a's variant; insert: symmetric; substitute
    at i: both delete-at-i variants coincide), so the bucket join is
    LOSSLESS — no full cross product, candidate volume tracks
    bucket occupancy. Survivors verify with levenshtein (identical
    unit-cost in both engines, verify SKILL notes). Output:
    (a, b, dist) for distinct unordered pairs with dist <= 1,
    a < b lexicographically.

    Scale: bucket fan-out = len(term)+1 keys/term, one hash
    equi-join on the key, distinct, then the cheap verify — the
    minhash-LSH shape applied to spelling space.
    """
    t = terms.select(F.col(word).alias("w")).distinct()
    keys = t.select(
        "w",
        F.explode(
            F.expr(
                "array_union(array(w),"
                " transform(sequence(1, length(w)),"
                " i -> concat(substring(w, 1, i - 1),"
                " substring(w, i + 1, length(w) - i))))"
            )
        ).alias("k"),
    )
    pairs = (
        keys.select(F.col("w").alias("a"), "k")
        .join(keys.select(F.col("w").alias("b"), "k"), on="k")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return pairs.select(
        "a", "b",
        F.levenshtein("a", "b").cast("long").alias("dist"),
    ).where(F.col("dist") <= 1)


def sortkey_clusters(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fingerprint (sort-key) collision clustering — the OpenRefine
    "key collision" method and the cheapest title/record dedup
    blocker next to minhash: normalize to lowercase, token-sort the
    DISTINCT words, and group records sharing the exact sorted key
    (word-order and repetition invariant). Output per colliding
    key: (key, n_docs, min_id, max_id) for clusters of >= 2.

    Scale: one row-local key projection + ONE hash agg — exact
    dedup's groupBy with a canonicalized key.
    """
    keyed = df.select(
        F.col(id_col).alias("i"),
        F.expr(
            f"array_join(array_sort(array_distinct("
            f"split(lower(`{text}`), ' '))), ' ')"
        ).alias("key"),
    )
    return (
        keyed.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("i").alias("min_id"),
            F.max("i").alias("max_id"),
        )
        .where(F.col("n_docs") >= 2)
    )
