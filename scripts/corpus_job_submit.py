#!/usr/bin/env python
"""Cluster entrypoint for the corpus-curation job (north_rule:
"run via spark-submit --py-files on a multi-executor cluster",
applied to the webtext payload).

Package and submit:

    cd /root/repo && zip -r /tmp/pdal_spark.zip pdal_spark
    spark-submit \
        --master <cluster-master> \
        --py-files /tmp/pdal_spark.zip \
        scripts/corpus_job_submit.py \
        --src  <documents/pages table or parquet path> \
        --dest <output root> \
        [--eval-set <benchmark parquet>] \
        [--min-words 5] [--max-punct-ratio 0.3] [--jaccard 0.5] \
        [--shards 4096]

Stages: quality filter -> exact dedup -> minhash near-dup dedup ->
optional eval-set decontamination (pdal_spark.plans.corpus.CorpusJob).
Each stage materializes to hash-sharded parquet behind an atomic
snapshot marker, so re-submitting after a crash resumes from the last
committed stage; `_metrics/` holds per-(stage, shard) row counts and
`_removed/` the (doc_id, stage) lineage of every dropped document.

Size `--shards` to ~2-3x total executor cores at the target scale.

Local smoke (this sandbox): python scripts/corpus_job_submit.py \
    --synth 20000 --dest /tmp/corpus_demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local runs from any cwd; under spark-submit --py-files the package
# is already on the path and this is a no-op
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", help="documents table name or parquet path")
    ap.add_argument("--synth", type=int, default=0,
                    help="synthesize N pages instead of reading --src")
    ap.add_argument("--dest", required=True)
    ap.add_argument("--eval-set", default=None,
                    help="benchmark parquet for n-gram decontamination")
    ap.add_argument("--baseline", default=None,
                    help="already-curated corpus parquet: dedup the new "
                         "batch against it (incremental mode)")
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--max-punct-ratio", type=float, default=0.3)
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--max-per-domain", type=int, default=None)
    ap.add_argument("--sample-rate", type=float, default=None)
    args = ap.parse_args()

    from pdal_spark.plans.corpus import CorpusJob
    from pdal_spark.session import get_spark
    from pdal_spark.sources.pages import read_pages, synth_pages

    spark = get_spark("pdal_spark-corpus-job")
    if args.synth:
        from pyspark.sql import functions as F

        docs = synth_pages(spark, args.synth).select(
            F.xxhash64("url").alias("doc_id"), "url", "text"
        )
    else:
        docs = read_pages(spark, args.src, geocode=False)
        if "doc_id" not in docs.columns:
            from pyspark.sql import functions as F

            docs = docs.withColumn("doc_id", F.xxhash64("url"))

    ev = (
        spark.read.parquet(args.eval_set) if args.eval_set else None
    )
    job = CorpusJob(
        args.dest,
        min_words=args.min_words,
        max_punct_ratio=args.max_punct_ratio,
        jaccard_threshold=args.jaccard,
        n_shards=args.shards,
        url_col="url" if "url" in docs.columns else None,
        max_per_domain=args.max_per_domain,
        sample_rate=args.sample_rate,
    )
    base = (
        spark.read.parquet(args.baseline) if args.baseline else None
    )
    result = job.run(spark, docs, eval_df=ev, baseline_df=base)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
