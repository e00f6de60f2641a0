"""Resumable corpus-curation job — the training-data analog of
plans.job.TileJob (north_rule: checkpoint/resume + per-partition
lineage and metrics, applied to the webtext payload).

Pipeline (C4/CCNet/Gopher-shaped, every stage an existing engine op):

    [per-domain cap] -> [blocklist filter] -> quality filter
        -> [PII redaction] -> exact dedup -> minhash near-dup dedup
        -> [eval-set decontamination] -> [temperature mix]
        -> [consistent hash sample]

(bracketed stages are optional via constructor args; the blocklist
table is passed to run() like the eval set)

Checkpoint design: STAGE-grained (vs TileJob's tile-grained). The
dedup stages are corpus-global — a shard cannot be skipped
independently without breaking canonical-survivor semantics — so the
natural resume unit is the materialized stage boundary: each stage
writes its surviving rows to parquet (hash-sharded on the id for
balanced partitions), then commits an atomic snapshot marker. A
crashed run resumes from the last committed stage's parquet instead
of recomputing the whole chain; this is exactly the "persisted
intermediate / Iceberg staging table" pattern the minhash op's
docstring plans for (swap the parquet write for
`writeTo(...).createOrReplace()` on a real catalog).

Side tables:
- metrics (`_metrics/`): one row per (stage, shard) with rows kept —
  plus a per-stage total and wall seconds in the snapshot marker;
- removed (`_removed/`): (doc_id, stage) for every dropped doc — the
  "why did my document disappear" lineage, proportional to removals,
  never to corpus size.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import textops as ops_text


class CorpusJob:
    def __init__(
        self,
        dest: str,
        text: str = "text",
        id_col: str = "doc_id",
        min_words: int | None = 5,
        max_punct_ratio: float | None = 0.3,
        jaccard_threshold: float | None = 0.5,
        decontam_ngram: int = 3,
        n_shards: int = 16,
        url_col: str | None = None,
        max_per_domain: int | None = None,
        sample_rate: float | None = None,
        redact: bool = False,
        temperature_alpha: float | None = None,
        line_dedup_min_docs: int | None = None,
        line_dedup_min_len: int = 10,
        anonymize: bool = False,
    ):
        self.dest = dest.rstrip("/")
        self.text, self.id_col = text, id_col
        self.min_words = min_words
        self.max_punct_ratio = max_punct_ratio
        self.jaccard_threshold = jaccard_threshold
        self.decontam_ngram = decontam_ngram
        self.n_shards = n_shards
        self.url_col = url_col
        self.max_per_domain = max_per_domain
        self.sample_rate = sample_rate
        self.redact = redact
        self.temperature_alpha = temperature_alpha
        self.line_dedup_min_docs = line_dedup_min_docs
        self.line_dedup_min_len = line_dedup_min_len
        self.anonymize = anonymize
        self.snap_dir = f"{self.dest}/_snapshots"
        self.metrics_path = f"{self.dest}/_metrics"
        self.removed_path = f"{self.dest}/_removed"

    # -- snapshot bookkeeping -------------------------------------------
    def _stage_path(self, stage: str) -> str:
        return f"{self.dest}/stage={stage}"

    def _marker(self, stage: str) -> str:
        return os.path.join(self.snap_dir, f"{stage}.json")

    def committed_stages(self) -> list[str]:
        if not os.path.isdir(self.snap_dir):
            return []
        return [
            f[:-5]
            for f in os.listdir(self.snap_dir)
            if f.endswith(".json")
        ]

    def _commit(self, stage: str, meta: dict) -> None:
        os.makedirs(self.snap_dir, exist_ok=True)
        tmp = os.path.join(self.snap_dir, f".{stage}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"stage": stage, **meta}, fh)
        os.replace(tmp, self._marker(stage))  # atomic commit

    # -- stage transforms ------------------------------------------------
    def _quality(self, df: DataFrame) -> DataFrame:
        q = ops_text.quality_score(df, self.text, self.id_col)
        cond = F.lit(True)
        if self.min_words is not None:
            cond = cond & (F.col("n_words") >= int(self.min_words))
        if self.max_punct_ratio is not None:
            cond = cond & (
                F.col("punct_ratio") <= float(self.max_punct_ratio)
            )
        keep = q.where(cond).select(self.id_col)
        return df.join(keep, on=self.id_col, how="left_semi")

    def _exact(self, df: DataFrame,
               baseline: DataFrame | None = None) -> DataFrame:
        if baseline is not None:
            # incremental: drop docs already in the corpus, then
            # dedup within the batch (cost tracks the batch)
            return ops_dedup.incremental_exact_dedup(
                df, baseline, text=self.text, id_col=self.id_col
            )
        canon = ops_dedup.exact_dedup(
            df, self.text, self.id_col, keep="min"
        ).select(F.col("canonical_id").alias(self.id_col))
        return df.join(canon, on=self.id_col, how="left_semi")

    def _neardup(self, df: DataFrame,
                 baseline: DataFrame | None = None) -> DataFrame:
        if baseline is not None:
            # incremental: a new doc near-dup of ANY corpus doc (or
            # of an earlier batch doc) is dropped — corpus x corpus
            # pairs never generated
            pairs = ops_dedup.incremental_minhash_dedup(
                df, baseline,
                threshold=float(self.jaccard_threshold),
                text=self.text, id_col=self.id_col,
            )
            base_ids = baseline.select(F.col(self.id_col).alias("b"))
            # cross pair (a=new, b=corpus): drop the new doc;
            # intra pair (a < b, both new): keep min -> drop b
            cross_drop = pairs.join(
                base_ids, on="b", how="left_semi"
            ).select(F.col("a").alias(self.id_col))
            intra_drop = pairs.join(
                base_ids, on="b", how="left_anti"
            ).select(F.col("b").alias(self.id_col))
            dropped = cross_drop.unionByName(intra_drop).distinct()
            return df.join(dropped, on=self.id_col, how="left_anti")
        comp = ops_dedup.near_dup_doc_components(
            df,
            jaccard_threshold=float(self.jaccard_threshold),
            text=self.text,
            id_col=self.id_col,
            # staging table under the job dest: a resumed run whose
            # neardup stage crashed mid-flight reuses the committed
            # shingle write instead of recomputing (VERDICT r1 #8)
            shingle_staging=f"{self.dest}/_staging/shingles",
        )
        keep = comp.where(
            F.col(self.id_col) == F.col("canonical_id")
        ).select(self.id_col)
        return df.join(keep, on=self.id_col, how="left_semi")

    def _redact(self, df: DataFrame) -> DataFrame:
        # same regexp chain as ops_text.redact_pii, applied in place
        # so the stage preserves the corpus schema (row-local, zero
        # shuffle; removes nothing, so the lineage table stays empty)
        c = F.col(self.text)
        for pat, tok in (
            (ops_text.EMAIL_RE, "<EMAIL>"),
            (ops_text.PHONE_RE, "<PHONE>"),
            (ops_text.IPV4_RE, "<IP>"),
        ):
            c = F.regexp_replace(c, pat, tok)
        return df.withColumn(self.text, c)

    def _line_dedup(self, df: DataFrame) -> DataFrame:
        """C4 boilerplate-line removal (textops.line_dedup) with the
        doc's OTHER columns carried through; fully-boilerplate docs
        (n_kept = 0) drop, like C4."""
        from pdal_spark.operators.textops import line_dedup

        ld = line_dedup(
            df.select(self.id_col, self.text),
            text=self.text, doc_id=self.id_col,
            min_docs=self.line_dedup_min_docs,
            min_len=self.line_dedup_min_len,
        )
        keep = ld.where(F.col("n_kept") > 0).select(
            self.id_col, F.col("text").alias("__new_text")
        )
        return (
            df.drop(self.text)
            .join(keep, on=self.id_col)
            .withColumnRenamed("__new_text", self.text)
        )

    def _anonymize(self, df: DataFrame) -> DataFrame:
        """Prefix-preserving URL anonymization as the FINAL stage
        (release hygiene): the url column is REPLACED by its anon
        form; earlier domain-keyed stages already ran on real
        hosts."""
        from pdal_spark.operators.textops import anonymize_urls

        a = anonymize_urls(
            df.select(self.url_col).distinct(), url=self.url_col
        )
        return (
            df.join(a, on=self.url_col)
            .drop(self.url_col)
            .withColumnRenamed("anon_url", self.url_col)
        )

    def _decontam(self, df: DataFrame, eval_df: DataFrame) -> DataFrame:
        d = ops_dedup.decontaminate(
            df, eval_df, n=self.decontam_ngram,
            text=self.text, id_col=self.id_col,
        )
        keep = d.where(F.col("is_contaminated") == 0).select(self.id_col)
        return df.join(keep, on=self.id_col, how="left_semi")

    # -- the job ---------------------------------------------------------
    def run(
        self,
        spark: SparkSession,
        src: DataFrame,
        eval_df: DataFrame | None = None,
        blocklist_df: DataFrame | None = None,
        baseline_df: DataFrame | None = None,
    ) -> dict:
        """Run (or resume) the curation chain over `src`. Stages with
        a committed snapshot are skipped; the first uncommitted stage
        reads its input from the previous stage's parquet."""
        stages: list[tuple[str, object]] = []
        if self.max_per_domain is not None and self.url_col:
            stages.append(
                ("domain_cap",
                 lambda d: ops_text.domain_cap(
                     d, url=self.url_col, cap=self.max_per_domain,
                     order_col=self.id_col,
                 ))
            )
        if blocklist_df is not None:
            stages.append(
                ("blocklist",
                 lambda d: ops_text.blocklist_filter(
                     d, blocklist_df, text=self.text, id_col=self.id_col
                 ))
            )
        if self.min_words is not None or self.max_punct_ratio is not None:
            stages.append(("quality", self._quality))
        if self.redact:
            stages.append(("redact_pii", self._redact))
        if self.line_dedup_min_docs is not None:
            stages.append(("line_dedup", self._line_dedup))
        stages.append(
            ("exact_dedup", lambda d: self._exact(d, baseline_df))
        )
        if self.jaccard_threshold is not None:
            stages.append(
                ("near_dedup", lambda d: self._neardup(d, baseline_df))
            )
        if eval_df is not None:
            stages.append(
                ("decontam", lambda d: self._decontam(d, eval_df))
            )
        if self.temperature_alpha is not None and self.url_col:
            stages.append(
                ("temperature_mix",
                 lambda d: ops_text.temperature_resample(
                     d, alpha=self.temperature_alpha,
                     url=self.url_col, id_col=self.id_col,
                 ).drop("domain", "domain_pages", "sample_rate"))
            )
        if self.sample_rate is not None:
            from pdal_spark.operators.sampling import consistent_sample

            stages.append(
                ("sample",
                 lambda d: consistent_sample(
                     d, rate=self.sample_rate, id_col=self.id_col
                 ))
            )
        if self.anonymize and self.url_col:
            stages.append(("anonymize", self._anonymize))

        done = set(self.committed_stages())
        shard = F.pmod(F.xxhash64(F.col(self.id_col)), self.n_shards)
        report: dict[str, dict] = {}
        cur = src
        prev_rows = None
        # dynamic partition overwrite: each stage's metrics/removed
        # write replaces only its OWN stage= partition (a crashed
        # stage retry is idempotent); static mode would truncate the
        # other stages' rows. Scoped + restored, as in TileJob.
        prev_mode = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            self._run_stages(
                spark, stages, done, shard, report, cur, prev_rows
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
        return report

    def _run_stages(
        self, spark, stages, done, shard, report, cur, prev_rows
    ) -> None:
        for i, (name, fn) in enumerate(stages):
            if name in done:
                cur = spark.read.parquet(self._stage_path(name))
                prev_rows = None  # unknown without a recount
                report[name] = {"skipped": True}
                continue
            t0 = time.time()
            out = fn(cur).withColumn("__shard", shard)
            (
                out.repartition("__shard")
                .write.mode("overwrite")
                .partitionBy("__shard")
                .parquet(self._stage_path(name))
            )
            out = spark.read.parquet(self._stage_path(name))
            per_shard = (
                out.groupBy(F.col("__shard").alias("shard"))
                .agg(F.count(F.lit(1)).alias("rows"))
                .withColumn("stage", F.lit(name))
            )
            per_shard.write.mode("overwrite").partitionBy(
                "stage"
            ).parquet(self.metrics_path)
            kept_ids = out.select(self.id_col)
            removed = cur.select(self.id_col).join(
                kept_ids, on=self.id_col, how="left_anti"
            ).withColumn("stage", F.lit(name))
            removed.write.mode("overwrite").partitionBy("stage").parquet(
                self.removed_path
            )
            rows = out.count()
            n_removed = (prev_rows - rows) if prev_rows is not None else None
            self._commit(
                name,
                {
                    "order": i,
                    "rows_out": rows,
                    "wall_s": round(time.time() - t0, 3),
                },
            )
            report[name] = {"rows_out": rows, "removed": n_removed}
            cur = out
            prev_rows = rows

    # -- readers over the products ---------------------------------------
    def output(self, spark: SparkSession) -> DataFrame:
        stages = sorted(
            self.committed_stages(),
            key=lambda s: json.load(open(self._marker(s)))["order"],
        )
        if not stages:
            raise FileNotFoundError("no committed stages")
        return spark.read.parquet(self._stage_path(stages[-1])).drop(
            "__shard"
        )

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.metrics_path)

    def removed(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.removed_path)
