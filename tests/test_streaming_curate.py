"""Online curation pipeline: quality gate + cross-batch exact dedup
with batch=-partitioned idempotent sinks. Two availableNow runs; a
duplicate arriving in run 2 must be rejected against run 1's hash
table, and re-running with no new files must change nothing."""

import pandas as pd

from pdal_spark.streaming.ingest import streaming_curate

GOOD_A = (
    "the quick brown fox jumps over a lazy dog in the river valley "
    "while morning light spreads across tall grass and distant hills "
    "slowly turn golden under clear autumn skies before farmers begin "
    "their daily work"
)
GOOD_B = (
    "many large web pages carry useful long sentences about weather "
    "patterns and the open sea where fishing boats return each evening "
    "with heavy nets full of silver fish for busy village markets near "
    "the harbor"
)
GOOD_C = (
    "fresh unique content arrives in wave two with plenty of normal "
    "words about music theory and painting classes offered at the "
    "community center every winter season for students who enjoy "
    "creative afternoon projects together"
)
BAD_SHORT = "too short"


def _run(spark, tmp_path):
    streaming_curate(
        spark,
        f"{tmp_path}/src/*",
        str(tmp_path / "dest"),
        str(tmp_path / "ckpt"),
        min_words=5,
    )


def test_streaming_curate_routes_and_dedups(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()

    wave1 = [(1, GOOD_A), (2, BAD_SHORT), (3, GOOD_A), (4, GOOD_B)]
    spark.createDataFrame(
        wave1, "doc_id long, text string"
    ).write.parquet(str(src / "w1.parquet"))
    _run(spark, tmp_path)

    acc = pd.read_parquet(f"{tmp_path}/dest/accepted")
    rej = pd.read_parquet(f"{tmp_path}/dest/rejected")
    # 3 is a within-batch dup of 1 (first id wins); 2 fails quality
    assert sorted(acc.doc_id) == [1, 4]
    reasons = {int(r.doc_id): r.reason for r in rej.itertuples()}
    assert reasons == {2: "quality", 3: "duplicate"}

    # wave 2: 5 duplicates wave 1's accepted text (cross-batch
    # rejection via the hash table), 6 is genuinely new
    wave2 = [(5, GOOD_B), (6, GOOD_C)]
    spark.createDataFrame(
        wave2, "doc_id long, text string"
    ).write.parquet(str(src / "w2.parquet"))
    _run(spark, tmp_path)

    acc = pd.read_parquet(f"{tmp_path}/dest/accepted")
    rej = pd.read_parquet(f"{tmp_path}/dest/rejected")
    assert sorted(acc.doc_id) == [1, 4, 6]
    assert {int(r.doc_id): r.reason for r in rej.itertuples()}[5] \
        == "duplicate"

    # metrics: one row per batch, conservation n_in = acc + rej
    met = pd.read_parquet(f"{tmp_path}/dest/metrics")
    assert len(met) == met.batch.nunique()
    assert (met.n_in == met.n_accepted + met.n_rejected).all()

    # exactly-once: re-run with no new files -> nothing changes
    n_before = len(acc)
    _run(spark, tmp_path)
    assert len(pd.read_parquet(f"{tmp_path}/dest/accepted")) \
        == n_before
