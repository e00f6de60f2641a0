"""Execute the session-3 pipeline stages end-to-end through the JSON
Pipeline (catches wrapper-argument drift, not just registration)."""

import pytest

from pdal_spark.plans.pipeline import REGISTRY, Pipeline
from pdal_spark.sqlgen import qcell_pack


def _cells_path(spark, tmp_path):
    rows = [(int(eval(qcell_pack(str(ix), "0", 4))), 30 - 10 * ix)
            for ix in range(4)]
    p = str(tmp_path / "cells.parquet")
    spark.createDataFrame(rows, ["cell", "x"]).write.parquet(p)
    return p


def test_registry_has_session3_stages():
    for name in [
        "filters.wasserstein", "filters.cuped", "filters.geary",
        "filters.localmoran", "filters.ripleysk",
        "filters.semivariogram", "filters.ktruss",
        "filters.hyperball", "filters.betweenness", "filters.sssp",
        "filters.modularity", "filters.conductance",
        "filters.lubymis", "filters.clusternmi",
        "filters.kneserney", "filters.goodturing", "filters.ppmi",
        "filters.texttiling", "filters.multipattern",
        "filters.cmsbuild", "filters.cmsestimate",
        "filters.scenecuts", "filters.ahash", "filters.ahashpairs",
        "filters.dhash", "filters.mapmatch", "filters.seasonal",
        "filters.burstdetect", "filters.dtw", "filters.holt",
        "filters.hausdorffpairs", "filters.flowdirection",
        "filters.flowaccumulation", "filters.watershed",
        "filters.terrainindices", "filters.viewshed",
        "filters.costdistance", "filters.costpathtree",
        "filters.strahler", "filters.filldepressions",
        "filters.odflows", "filters.hough",
    ]:
        assert name in REGISTRY, name


def test_flowdirection_stage_executes(spark, tmp_path):
    p = _cells_path(spark, tmp_path)
    out = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.flowdirection", "res": 4},
    ]).execute(spark)
    rows = {r.cell: r.d8 for r in out.collect()}
    assert len(rows) == 4 and 1 in rows.values()


def test_strahler_and_filldepressions_stages_execute(spark, tmp_path):
    p = _cells_path(spark, tmp_path)
    o1 = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.strahler", "res": 4, "rounds": 6},
    ]).execute(spark)
    assert {r["order"] for r in o1.collect()} == {1}
    o2 = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.filldepressions", "res": 4, "rounds": 6},
    ]).execute(spark)
    assert all(r.fill == r.z for r in o2.collect())  # monotone row


def test_dtw_and_holt_stages_execute(spark, tmp_path):
    rows = [(k, i, v) for k in (1, 2)
            for i, v in enumerate([1, 2, 3, 4])]
    p = str(tmp_path / "ser.parquet")
    spark.createDataFrame(rows, ["k", "o", "v"]).write.parquet(p)
    d = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.dtw", "key": "k", "order": "o",
         "column": "v"},
    ]).execute(spark).collect()
    assert len(d) == 1 and d[0].dtw == 0
    h = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.holt", "key": "k", "order": "o",
         "column": "v"},
    ]).execute(spark)
    assert h.count() == 8


def test_text_stages_execute(spark, tmp_path):
    rows = [(1, "aa bb cc dd ee ff gg hh ii jj aa bb cc dd ee ff "
                "gg hh ii jj zz yy xx ww vv uu tt ss rr qq")]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(p)
    t = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.texttiling", "block_tokens": 10},
    ]).execute(spark)
    assert t.count() == 2  # 3 blocks -> 2 gaps
    m = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.multipattern", "patterns": ["aa", "zz"]},
    ]).execute(spark).collect()
    assert {(r.pattern, r.n_hits) for r in m} == {("aa", 2), ("zz", 1)}


def test_image_hash_stages_execute(spark, tmp_path):
    rows = [(1, "abcdef" * 10), (2, "abcdef" * 10)]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(p)
    from pdal_spark.operators.multimodal import attach_binary
    hp = str(tmp_path / "bin.parquet")
    attach_binary(spark.read.parquet(p)).write.parquet(hp)
    a = Pipeline([
        {"type": "readers.parquet", "filename": hp},
        {"type": "filters.ahash", "codec": "fake"},
    ]).execute(spark)
    assert a.count() == 2
    pr = Pipeline([
        {"type": "readers.parquet", "filename": hp},
        {"type": "filters.ahash", "codec": "fake"},
        {"type": "filters.ahashpairs", "max_hamming": 0,
         "id": "doc_id"},
    ]).execute(spark).collect()
    assert len(pr) == 1 and pr[0].hamming == 0
