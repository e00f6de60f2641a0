"""Incremental ingest — the engine's counterpart of PDAL stream mode.

PDAL's "stream mode" is chunked pipelined batch (SURVEY.md §2.10): a
10,000-point FixedPointTable is filled by the reader, every filter's
processOne runs per point with a skip-mask, repeat until exhausted
(pdal/Streamable.cpp:192-281). There are no watermarks or event-time
semantics to port. The honest Spark mapping is Structured Streaming
over a growing file directory with the `availableNow` trigger:

- each micro-batch ≙ one FixedPointTable pass (Arrow batches inside
  are even sized like PDAL's buffer — session.ARROW_BATCH_ROWS);
- the transformation chain is EXACTLY the batch operators, applied
  via foreachBatch — stream/standard equivalence by construction
  (the reference tests this equivalence in StreamingTest.cpp);
- the checkpointLocation gives exactly-once file tracking, the
  streaming analog of plans.job's snapshot manifests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def incremental_ingest(
    spark: SparkSession,
    src_path: str,
    transform: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    schema=None,
    max_files_per_batch: int = 64,
) -> None:
    """Process all files currently in src_path (and any that appeared
    since the last run) exactly once, then stop (availableNow).

    transform: batch-operator chain (DataFrame -> DataFrame).
    sink: called per micro-batch with the transformed frame + batch id
    (e.g. lambda df, i: TileJob(...).run(spark, df)).
    """
    if schema is None:
        schema = spark.read.parquet(src_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_batch)
        .parquet(src_path)
    )

    def _each(batch_df: DataFrame, batch_id: int) -> None:
        sink(transform(batch_df), batch_id)

    q = (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_exact_dedup(
    spark: SparkSession,
    src_path: str,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    key: str = "text_hash",
    text: str = "text",
    event_time: str | None = None,
    watermark: str = "10 minutes",
    schema=None,
) -> None:
    """Streaming exact dedup of incoming pages: the first page with a
    given content hash passes, later copies are dropped — ACROSS
    micro-batches and restarts (state store + checkpoint), the
    streaming form of `operators.dedup.exact_dedup`.

    With `event_time` set, uses dropDuplicatesWithinWatermark so the
    dedup state is bounded: duplicates are suppressed within the
    watermark horizon and state older than it is evicted — the only
    form that survives 10^12-row streams (unbounded dropDuplicates
    state would grow forever). Without it, state is unbounded exact
    (small/finite backfills only)."""
    from pyspark.sql import functions as F

    if schema is None:
        schema = spark.read.parquet(src_path).schema
    stream = (
        spark.readStream.schema(schema).parquet(src_path)
        .withColumn(key, F.md5(F.col(text)))
    )
    if event_time is not None:
        deduped = stream.withWatermark(
            event_time, watermark
        ).dropDuplicatesWithinWatermark([key])
    else:
        deduped = stream.dropDuplicates([key])
    q = (
        deduped.writeStream.foreachBatch(
            lambda df, i: sink(df, i)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_warc_ingest(
    spark: SparkSession,
    src_path: str,
    dest: str,
    checkpoint: str,
    max_files_per_batch: int = 16,
) -> None:
    """Exactly-once WARC ingest of a GROWING segment directory — the
    production arrival pattern (new CC segments land continuously):
    readStream over binaryFile tracks which segments were consumed in
    the checkpoint; each micro-batch parses its files row-locally
    (sources.warc pattern: one file per task) and appends extracted
    pages to `dest`. Re-running after a crash (or on a schedule, via
    availableNow) processes only NEW segments — the streaming twin of
    `scripts/warc_ingest_submit.py`.
    """
    from pyspark.sql import functions as F

    from pdal_spark.operators.textops import extract_text
    from pdal_spark.sources.warc import read_warc  # noqa: F401 (doc)
    from pdal_spark.sources.warc import WARC_SCHEMA, _parse_warc_bytes

    stream = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is fixed but streaming sources must
        # state it explicitly
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .option("maxFilesPerTrigger", max_files_per_batch)
        .load(src_path)
    )

    def _each(batch_df: DataFrame, batch_id: int) -> None:
        import pandas as pd

        def parse(batches):
            for pdf in batches:
                rows = []
                for content in pdf["content"]:
                    rows.extend(_parse_warc_bytes(bytes(content)))
                out = pd.DataFrame(
                    rows, columns=["url", "warc_ts", "record_type",
                                   "payload"],
                )
                yield out[out.record_type == "response"]

        recs = batch_df.select("content").mapInPandas(
            parse, WARC_SCHEMA
        )
        pages = extract_text(recs, html="payload", out="text").select(
            "url",
            F.col("warc_ts").cast("timestamp").alias("warc_ts"),
            F.col("payload").alias("html"),
            "text",
        )
        pages.write.mode("append").parquet(dest)

    q = (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_curate(
    spark: SparkSession,
    src_path: str,
    dest: str,
    checkpoint: str,
    text: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    schema=None,
) -> None:
    """Online C4/Gopher-style curation — the STREAMING form of
    plans.corpus.CorpusJob: each availableNow pass picks up new page
    files (exactly-once via the checkpoint), and every micro-batch

      1. scores Gopher quality rules (textops.gopher_rules) and
         routes failures to `rejected` with reason='quality',
      2. exact-dedups survivors within the batch (first doc id per
         text hash wins) AND against every PREVIOUSLY accepted
         batch's hash table, routing dups with reason='duplicate',
      3. lands accepted rows, rejected rows, accepted-text hashes
         and a one-row metrics record under `batch=<id>` partitions
         with dynamic partition overwrite.

    Replay idempotence (north-rule resumability, online): a replayed
    micro-batch OVERWRITES its own batch= partitions, and the
    cross-batch hash anti-join reads only batch < current, so a
    replayed batch never double-lands rows or suppresses itself.

    Scale: the per-batch work is batch-sized except the hash
    anti-join, which joins the batch against the accepted-hash
    staging table on the 64-bit text hash — the incremental_dedup
    shape (cost tracks the BATCH, never corpus x corpus).
    """
    import os

    from pyspark.sql import functions as F

    from pdal_spark.operators.textops import gopher_rules

    if schema is None:
        schema = spark.read.parquet(src_path).schema
    stream = spark.readStream.schema(schema).parquet(src_path)
    hashes_path = f"{dest}/hashes"
    have_hashes = os.path.isdir(hashes_path)

    def _w(df: DataFrame, sub: str) -> None:
        (
            df.write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(f"{dest}/{sub}")
        )

    def _each(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal have_hashes
        bid = int(batch_id)
        b = batch_df.withColumn("__h", F.xxhash64(F.col(text)))
        flags = gopher_rules(
            b, text=text, id_col=id_col, min_words=min_words
        ).select(id_col, "keep")
        b = b.join(flags, on=id_col)
        rej_q = b.where("keep = 0").drop("keep", "__h")
        ok = b.where("keep = 1").drop("keep")
        # within-batch: first id per hash wins (deterministic)
        from pyspark.sql import Window

        w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
        ok = ok.withColumn("__r", F.row_number().over(w))
        dup_in = ok.where("__r > 1").drop("__r", "__h")
        ok = ok.where("__r = 1").drop("__r")
        # cross-batch: anti-join against hashes of EARLIER batches
        if have_hashes:
            seen = (
                spark.read.parquet(hashes_path)
                .where(F.col("batch") < bid)
                .select("__h").distinct()
            )
            dup_x = ok.join(seen, on="__h", how="semi").drop("__h")
            ok2 = ok.join(seen, on="__h", how="anti")
        else:
            dup_x = ok.limit(0).drop("__h")
            ok2 = ok
        ok2 = ok2.localCheckpoint(eager=True)
        accepted = ok2.drop("__h").withColumn("batch", F.lit(bid))
        rejected = (
            rej_q.withColumn("reason", F.lit("quality"))
            .unionByName(
                dup_in.withColumn("reason", F.lit("duplicate")))
            .unionByName(
                dup_x.withColumn("reason", F.lit("duplicate")))
            .withColumn("batch", F.lit(bid))
        )
        _w(accepted, "accepted")
        _w(rejected, "rejected")
        _w(
            ok2.select("__h").withColumn("batch", F.lit(bid)),
            "hashes",
        )
        n_in = batch_df.count()
        n_acc = accepted.count()
        n_rej = rejected.count()
        _w(
            spark.createDataFrame(
                [(n_in, n_acc, n_rej, bid)],
                "n_in long, n_accepted long, n_rejected long,"
                " batch long",
            ),
            "metrics",
        )
        have_hashes = True

    q = (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_near_dup(
    spark: SparkSession,
    src_path: str,
    dest: str,
    checkpoint: str,
    threshold: float = 0.5,
    n: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
    schema=None,
) -> None:
    """Online MinHash-LSH near-dup gate — the STREAMING form of
    dedup.minhash_lsh_dedup. The accepted corpus is represented by
    two maintained staging tables (its SHINGLE table and its LSH
    BAND table, both batch=-partitioned), so each micro-batch costs
    O(batch + band collisions):

      - new docs shingle/sign/band locally (row-local, one min-agg),
      - cross candidates = ONE hash join of the new band table
        against the staged bands of EARLIER batches (corpus docs are
        never re-shingled, corpus x corpus never exists),
      - candidates verify by exact Jaccard against staged shingles,
      - survivors (no >= threshold match to the corpus, nor to a
        smaller-id doc in the same batch) append to `accepted`;
        their shingles/bands extend the staging tables; scored
        pairs land under `pairs` for lineage.

    Replay idempotence: every sink is a batch= partition with
    dynamic overwrite, and the staged reads take only batch <
    current — a replayed batch overwrites itself and never
    self-suppresses. This is VERDICT r1 #4's "persist() becomes the
    staging table" note, realized online.
    """
    import os

    from pyspark.sql import functions as F

    from pdal_spark.operators.dedup import (
        _band_table,
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    if schema is None:
        schema = spark.read.parquet(src_path).schema
    stream = spark.readStream.schema(schema).parquet(src_path)
    bands_p = f"{dest}/bands"
    sh_p = f"{dest}/shingles"
    have = os.path.isdir(bands_p)

    def _w(df: DataFrame, sub: str) -> None:
        (
            df.write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(f"{dest}/{sub}")
        )

    def _each(b: DataFrame, batch_id: int) -> None:
        nonlocal have
        bid = int(batch_id)
        sh_new = shingles(
            b, n=n, text=text, id_col=id_col
        ).localCheckpoint(eager=True)
        sigs = minhash_signatures(sh_new, id_col)
        bn = _band_table(sigs, id_col)
        intra = lsh_candidate_pairs(sigs, id_col)
        if have:
            be = spark.read.parquet(bands_p).where(
                F.col("batch") < bid
            )
            cross = (
                bn.select("band", "bsig", F.col("doc").alias("a"))
                .join(
                    be.select(
                        "band", "bsig", F.col("doc").alias("b")
                    ),
                    on=["band", "bsig"],
                )
                .select("a", "b")
                .distinct()
            )
            sh_ex = (
                spark.read.parquet(sh_p)
                .where(F.col("batch") < bid)
                .select(id_col, "shingle")
            )
            pairs = cross.unionByName(intra).distinct()
            sh_all = sh_new.unionByName(sh_ex)
        else:
            pairs = intra
            sh_all = sh_new
        scored = jaccard_verify(
            pairs, sh_all, id_col, threshold
        ).localCheckpoint(eager=True)
        new_ids = b.select(id_col)
        # intra pairs (a < b, both new): the smaller id survives;
        # cross pairs (a new, b corpus): the new doc drops
        intra_hits = scored.join(
            new_ids.withColumnRenamed(id_col, "b"), on="b",
            how="semi",
        )
        cross_hits = scored.join(
            new_ids.withColumnRenamed(id_col, "b"), on="b",
            how="anti",
        )
        drops = (
            intra_hits.select(F.col("b").alias(id_col))
            .unionByName(
                cross_hits.select(F.col("a").alias(id_col)))
            .distinct()
        )
        surv = b.join(drops, on=id_col, how="anti") \
            .localCheckpoint(eager=True)
        keep = surv.select(id_col)
        _w(surv.withColumn("batch", F.lit(bid)), "accepted")
        _w(
            sh_new.join(keep, on=id_col, how="semi")
            .withColumn("batch", F.lit(bid)),
            "shingles",
        )
        _w(
            bn.join(
                keep.withColumnRenamed(id_col, "doc"), on="doc",
                how="semi",
            ).withColumn("batch", F.lit(bid)),
            "bands",
        )
        _w(scored.withColumn("batch", F.lit(bid)), "pairs")
        have = True

    q = (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_scd2(
    spark: SparkSession,
    src_path: str,
    dest: str,
    checkpoint: str,
    key: str = "user_id",
    ts_us: str = "event_id",
    value: str = "event_type",
    schema=None,
) -> None:
    """CDC apply: maintain an SCD type-2 dimension ONLINE. Each
    availableNow pass appends the micro-batch's REAL changes to a
    batch=-partitioned change log — a row is a real change iff its
    value differs from the key's previous value, where "previous"
    is resolved against BOTH earlier rows of the batch and the
    latest logged change of earlier batches (one per-key lookup
    join against the log, never a rebuild). The queryable dimension
    is fold-on-read: ``read_scd2`` runs temporal.scd2_intervals over
    the log — the same log-plus-fold shape as the streaming rollup.

    Replay idempotence: the batch= partition overwrites itself and
    the previous-value lookup reads only batch < current.
    """
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if schema is None:
        schema = spark.read.parquet(src_path).schema
    stream = spark.readStream.schema(schema).parquet(src_path)
    log_p = f"{dest}/changes"
    have = os.path.isdir(log_p)

    def _each(b: DataFrame, batch_id: int) -> None:
        nonlocal have
        bid = int(batch_id)
        rows = b.select(
            F.col(key).alias("__k"),
            F.col(ts_us).cast("long").alias("__t"),
            F.col(value).alias("__v"),
        )
        w = Window.partitionBy("__k").orderBy(F.col("__t").asc())
        rows = rows.withColumn("__prev", F.lag("__v").over(w))
        if have:
            last = (
                spark.read.parquet(log_p)
                .where(F.col("batch") < bid)
                .groupBy(F.col(key).alias("__k"))
                .agg(F.max_by(value, "valid_from").alias("__last"))
            )
            rows = rows.join(last, on="__k", how="left")
        else:
            rows = rows.withColumn(
                "__last", F.lit(None).cast("string")
            )
        base = F.coalesce(F.col("__prev"), F.col("__last"))
        changes = rows.where(
            base.isNull() | (F.col("__v") != base)
        )
        (
            changes.select(
                F.col("__k").alias(key),
                F.col("__v").alias(value),
                F.col("__t").alias("valid_from"),
            )
            .withColumn("batch", F.lit(bid))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(log_p)
        )
        have = True

    q = (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_scd2(
    spark: SparkSession,
    dest: str,
    key: str = "user_id",
    value: str = "event_type",
) -> DataFrame:
    """Fold-on-read dimension view over the streaming_scd2 change
    log: validity intervals + is_current, exactly the batch
    scd2_intervals semantics."""
    from pdal_spark.operators.temporal import scd2_intervals

    log = spark.read.parquet(f"{dest}/changes")
    return scd2_intervals(
        log, key=key, ts_us="valid_from", value=value
    )


def streaming_heavy_hitters(
    spark: SparkSession,
    src_path: str,
    dest: str,
    checkpoint: str,
    elem_col: str = "elem",
    d: int = 3,
    w: int = 256,
    threshold: int = 100,
    schema=None,
) -> None:
    """Online heavy-hitter detection with a MAINTAINED Count-Min
    sketch (Cormode & Muthukrishnan 2005 in the house streaming
    shape): per micro-batch the new elements sketch locally (ONE
    map-side-combined agg to <= depth*width counters), the running
    sketch is the SUM of the staged batch= counter partitions —
    counters merge by +, so the corpus stream is never recounted —
    and the batch's distinct elements probe the merged sketch;
    probes whose estimate reaches `threshold` land in `alerts`
    (hot-URL / hot-key detection on the crawl firehose with bounded
    state no matter the key universe).

    Sinks under dest/: `sketch` (batch=, depth*width counter rows
    per batch) and `alerts` (batch=, (elem, cms_est) rows).

    Replay idempotence: each batch overwrites its own batch=
    partitions and merges only staged batches < current, so a
    replayed batch never double-counts itself (the
    streaming_near_dup convention).
    """
    import os

    from pyspark.sql import functions as F

    from pdal_spark.operators.sketch import cms_build, cms_estimate

    if schema is None:
        schema = spark.read.parquet(src_path).schema
    stream = spark.readStream.schema(schema).parquet(src_path)
    sk_p = f"{dest}/sketch"
    have = os.path.isdir(sk_p)

    def _w(df: DataFrame, sub: str) -> None:
        (
            df.write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(f"{dest}/{sub}")
        )

    def _each(b: DataFrame, batch_id: int) -> None:
        nonlocal have
        bid = int(batch_id)
        sk_new = cms_build(
            b, elem_col, d=d, w=w
        ).localCheckpoint(eager=True)
        if have:
            staged = spark.read.parquet(sk_p).where(
                F.col("batch") < bid
            ).select("row", "col", "cnt")
            merged = (
                sk_new.unionByName(staged)
                .groupBy("row", "col")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = sk_new
        probes = b.select(elem_col).distinct()
        est = cms_estimate(probes, merged, elem_col, d=d, w=w)
        alerts = est.where(F.col("cms_est") >= int(threshold))
        _w(sk_new.withColumn("batch", F.lit(bid)), "sketch")
        _w(alerts.withColumn("batch", F.lit(bid)), "alerts")
        have = True

    q = (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
