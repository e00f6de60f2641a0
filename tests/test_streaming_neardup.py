"""Online MinHash-LSH near-dup: staged shingle/band tables make each
micro-batch cost O(batch + collisions); duplicates are rejected
within a batch AND against corpus accepted in earlier runs."""

import pandas as pd

from pdal_spark.streaming.ingest import streaming_near_dup

W = ("alpha bravo charlie delta echo foxtrot golf hotel india "
     "juliet kilo lima")
A = W  # 12 words -> 10 3-shingles
B = W.rsplit(" ", 1)[0] + " mike"        # near-dup: 9/11 jaccard
C = ("one two three four five six seven eight nine ten eleven "
     "twelve entirely different words")
D = W                                     # exact dup of A (wave 2)
E = ("zulu yankee xray whiskey victor uniform tango sierra romeo "
     "quebec papa oscar")


def _run(spark, tmp_path):
    streaming_near_dup(
        spark,
        f"{tmp_path}/src/*",
        str(tmp_path / "dest"),
        str(tmp_path / "ckpt"),
        threshold=0.5,
    )


def test_streaming_near_dup_batches_and_corpus(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()

    spark.createDataFrame(
        [(1, A), (2, B), (3, C)], "doc_id long, text string"
    ).write.parquet(str(src / "w1.parquet"))
    _run(spark, tmp_path)

    acc = pd.read_parquet(f"{tmp_path}/dest/accepted")
    pairs = pd.read_parquet(f"{tmp_path}/dest/pairs")
    # B is a within-batch near-dup of A (smaller id survives)
    assert sorted(acc.doc_id) == [1, 3]
    assert {(int(r.a), int(r.b)) for r in pairs.itertuples()} \
        == {(1, 2)}
    assert pairs.jaccard.iloc[0] == 9 / 11

    # wave 2: D duplicates corpus doc 1 exactly (cross candidate via
    # the staged band table); E is new
    spark.createDataFrame(
        [(4, D), (5, E)], "doc_id long, text string"
    ).write.parquet(str(src / "w2.parquet"))
    _run(spark, tmp_path)

    acc = pd.read_parquet(f"{tmp_path}/dest/accepted")
    assert sorted(acc.doc_id) == [1, 3, 5]
    pairs = pd.read_parquet(f"{tmp_path}/dest/pairs")
    got = {(int(r.a), int(r.b)): float(r.jaccard)
           for r in pairs.itertuples()}
    assert got[(4, 1)] == 1.0  # cross pair: new doc 4 vs corpus 1

    # staging tables only hold SURVIVORS (dropped docs never pollute
    # future batches' candidate space)
    sh = pd.read_parquet(f"{tmp_path}/dest/shingles")
    assert set(sh.doc_id) == {1, 3, 5}

    # exactly-once: rerun without new files changes nothing
    _run(spark, tmp_path)
    assert sorted(
        pd.read_parquet(f"{tmp_path}/dest/accepted").doc_id
    ) == [1, 3, 5]
