"""Pipeline JSON compiler + sources + tile job + streaming ingest.

Mirrors the reference's end-to-end pipeline goldens
(test/unit/apps/pcpipelineTestJSON.cpp over test/data/pipeline/*.json)
and its crop/splitter fixture invariants, re-expressed on synthetic
inputs (FIXTURES.md)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pdal_spark.plans import Pipeline, PipelineError
from pdal_spark.plans.job import TileJob
from pdal_spark.sources.faux import faux_reader
from pdal_spark.sources.pages import read_pages, synth_pages
from pdal_spark.sources.tindex import read_tindex
from pdal_spark.streaming.ingest import incremental_ingest

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# readers.faux + filters.crop: the reference's 333/1000 ramp invariant
# (test/unit/filters/CropFilterTest.cpp:61-119 — bbox keeps exactly
# the middle third of a ramp) and 3D 200/1000 (:122-180).
# --------------------------------------------------------------------------
def test_faux_ramp_crop_333(spark):
    p = Pipeline([
        {"type": "readers.faux", "count": 1000, "mode": "ramp",
         "bounds": "([0, 2], [0, 2], [0, 2])"},
        {"type": "filters.crop", "x": "x", "y": "y",
         "bounds": "([0.99966633329999996,1.666333],"
                    "[0.99966633329999996,1.666333])"},
    ])
    assert p.execute(spark).count() == 333


def test_faux_ramp_crop_3d_200(spark):
    p = Pipeline([
        {"type": "readers.faux", "count": 1000, "mode": "ramp",
         "bounds": "([0, 2], [0, 2], [0, 2])"},
        {"type": "filters.crop", "x": "x", "y": "y",
         "bounds": {"x": [1.2, 1.6], "y": [1.2, 1.6],
                    "z": [1.2, 1.6]}},
    ])
    assert p.execute(spark).count() == 200


# --------------------------------------------------------------------------
# JSON string + filename inference + tag/inputs DAG + where option
# --------------------------------------------------------------------------
def test_pipeline_json_string_and_inference(spark):
    js = json.dumps([
        f"{SF}/events.parquet",
        {"type": "filters.range", "limits": "value[0.5:]"},
    ])
    df = Pipeline(js).execute(spark)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert df.count() == ev.where(F.col("value") >= 0.5).count()


def test_pipeline_merge_dag(spark):
    p = Pipeline([
        {"type": "readers.faux", "count": 100, "mode": "ramp",
         "tag": "a"},
        {"type": "readers.faux", "count": 50, "mode": "constant",
         "tag": "b"},
        {"type": "filters.merge", "inputs": ["a", "b"]},
    ])
    assert p.execute(spark).count() == 150


def test_pipeline_where_merge(spark):
    # points failing `where` bypass the stage and are merged back
    # (pdal/Stage.cpp:61-76 splitView)
    base = [{"type": "readers.faux", "count": 100, "mode": "ramp",
             "bounds": "([0, 10], [0, 10], [0, 10])"}]
    assign = {"type": "filters.assign", "value": "z = 99.0 WHERE x >= 0",
              "where": "x > 5"}
    df = Pipeline(base + [assign]).execute(spark)
    assert df.count() == 100
    assert df.where("z = 99.0").count() == df.where("x > 5").count()

    nomerge = dict(assign, where_merge="false")
    df2 = Pipeline(base + [nomerge]).execute(spark)
    assert df2.count() == df.where("x > 5").count()


def test_pipeline_validate_no_side_effect(spark, tmp_path):
    out = str(tmp_path / "nope.parquet")
    p = Pipeline([
        {"type": "readers.faux", "count": 10, "mode": "ramp"},
        {"type": "writers.parquet", "filename": out},
    ])
    info = p.validate(spark)
    assert "x" in info["columns"]
    assert not os.path.exists(out)  # validate must not write
    p.execute(spark)
    assert os.path.exists(out)


def test_pipeline_unknown_stage(spark):
    with pytest.raises(PipelineError, match="unsupported"):
        Pipeline([
            {"type": "readers.faux", "count": 1},
            {"type": "filters.nonexistent"},
        ]).execute(spark)


# --------------------------------------------------------------------------
# splitter via pipeline: reference SplitterTest invariants re-based
# (24 non-overlapping tiles summing to the input count)
# --------------------------------------------------------------------------
def test_pipeline_splitter_tiles_sum(spark):
    p = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/events.parquet"},
        {"type": "filters.h3", "resolution": 6},
    ])
    # geocode happens in gate-land; here use faux grid directly
    p = Pipeline([
        {"type": "readers.faux", "count": 1065, "mode": "uniform",
         "bounds": "([0, 10000], [0, 10000], [0, 1])"},
        {"type": "filters.splitter", "x": "x", "y": "y",
         "length": 1000, "origin_x": 0, "origin_y": 0},
    ])
    tiled = p.execute(spark)
    counts = tiled.groupBy("tile_id").count().collect()
    assert sum(r["count"] for r in counts) == 1065


# --------------------------------------------------------------------------
# sources
# --------------------------------------------------------------------------
def test_synth_pages_shape_and_determinism(spark):
    a = synth_pages(spark, 200).toPandas().sort_values("url")
    b = synth_pages(spark, 200).toPandas().sort_values("url")
    assert list(a.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert (a["text"].values == b["text"].values).all()  # byte-identical
    assert (a["html"].values == b["html"].values).all()


def test_read_pages_geocode_preserves_text(spark, tmp_path):
    src = str(tmp_path / "pages.parquet")
    synth_pages(spark, 100).write.parquet(src)
    pts = read_pages(spark, src)
    assert {"lat", "lon"} <= set(pts.columns)
    # byte-identical text per url (input_hint invariant)
    orig = spark.read.parquet(src).select("url", "text")
    joined = pts.select("url", F.col("text").alias("t2")).join(
        orig, on="url"
    )
    assert joined.where(F.col("t2") != F.col("text")).count() == 0


def test_tindex_prunes_files(spark, tmp_path):
    for i, (x0, x1) in enumerate([(0, 10), (10, 20), (20, 30)]):
        faux_reader(spark, 50, "uniform",
                    ([x0, 0], [x1, 10])).write.parquet(
            str(tmp_path / f"tile{i}.parquet")
        )
    manifest = spark.createDataFrame(
        [(str(tmp_path / f"tile{i}.parquet"), float(x0), float(x1),
          0.0, 10.0)
         for i, (x0, x1) in enumerate([(0, 10), (10, 20), (20, 30)])],
        "path string, xmin double, xmax double, ymin double, ymax double",
    )
    df = read_tindex(spark, manifest, bounds=(12.0, 18.0, 0.0, 10.0))
    assert df.count() == 50  # only the middle file


# --------------------------------------------------------------------------
# TileJob: lineage/metrics + snapshot resume (north_rule)
# --------------------------------------------------------------------------
def test_tile_job_resume_and_lineage(spark, tmp_path):
    src1 = str(tmp_path / "in1.parquet")
    src2 = str(tmp_path / "in2.parquet")
    # two disjoint spatial slabs -> disjoint tile sets
    faux_reader(spark, 400, "uniform", ([0, 0], [40, 40])).write.parquet(
        src1
    )
    faux_reader(spark, 400, "uniform", ([100, 0], [140, 40])
                ).write.parquet(src2)

    job = TileJob(str(tmp_path / "out"), length=10.0,
                  origin_x=0.0, origin_y=0.0, x="x", y="y")
    r1 = job.run(spark, spark.read.parquet(src1))
    assert r1["new_tiles"] > 0

    # resume over src1 ∪ src2: only src2's tiles are new work
    both = spark.read.parquet(src1).unionByName(
        spark.read.parquet(src2)
    )
    r2 = job.run(spark, both)
    assert r2["new_tiles"] > 0
    assert r2["total_committed"] == r1["new_tiles"] + r2["new_tiles"]

    # a third run is a no-op (everything committed)
    r3 = job.run(spark, both)
    assert r3["new_tiles"] == 0

    # products: tile data complete, metrics rows sum to input rows,
    # lineage maps tiles to real input files
    assert job.tiles(spark).count() == 800
    m = job.metrics(spark)
    assert m.agg(F.sum("rows")).collect()[0][0] == 800
    lin = job.lineage(spark).select("input_file").distinct().collect()
    files = {os.path.basename(os.path.dirname(r[0].replace("file:", "")))
             or r[0] for r in lin}
    assert any("in1.parquet" in r[0] for r in lin)
    assert any("in2.parquet" in r[0] for r in lin)


# --------------------------------------------------------------------------
# streaming: availableNow incremental ingest == batch result
# --------------------------------------------------------------------------
def test_incremental_ingest_equals_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    faux_reader(spark, 300, "uniform", ([0, 0], [50, 50])
                ).write.parquet(f"{src}/part1.parquet")
    got = []

    def sink(df, batch_id):
        got.append(df.agg(F.count(F.lit(1)),
                          F.sum("x")).collect()[0])

    incremental_ingest(
        spark, f"{src}/*", lambda df: df.where(F.col("x") > 10.0),
        sink, checkpoint=str(tmp_path / "ckpt"),
    )
    batch = spark.read.parquet(f"{src}/part1.parquet").where(
        F.col("x") > 10.0
    ).agg(F.count(F.lit(1)), F.sum("x")).collect()[0]
    assert sum(r[0] for r in got) == batch[0]
    total = sum(r[1] for r in got if r[1] is not None)
    assert abs(total - batch[1]) < 1e-6


# --------------------------------------------------------------------------
# readers.stac analog: static catalog pruning (sources/stac.py)
# --------------------------------------------------------------------------
def test_stac_prunes_items(spark, tmp_path):
    import json

    for i, (x0, x1) in enumerate([(0, 10), (10, 20), (20, 30)]):
        faux_reader(spark, 40, "uniform",
                    ([x0, 0], [x1, 10])).write.parquet(
            str(tmp_path / f"asset{i}.parquet")
        )
    items = [
        {
            "type": "Feature", "id": f"item{i}",
            "collection": "tiles",
            "bbox": [float(x0), 0.0, float(x1), 10.0],
            "properties": {"datetime": f"2026-0{i+1}-01T00:00:00Z"},
            "assets": {
                "data": {"href": str(tmp_path / f"asset{i}.parquet")}
            },
        }
        for i, (x0, x1) in enumerate([(0, 10), (10, 20), (20, 30)])
    ]
    ic = {"type": "FeatureCollection", "features": items}
    cat_path = tmp_path / "collection.json"
    cat_path.write_text(json.dumps(ic))

    from pdal_spark.sources.stac import read_stac

    # bbox prune: only the middle asset
    df = read_stac(spark, str(cat_path), bounds=(12.0, 18.0, 0.0, 10.0))
    assert df.count() == 40
    # datetime prune: items 1+2
    df = read_stac(
        spark, str(cat_path),
        datetime_range=("2026-01-15T00:00:00Z", "2026-03-15T00:00:00Z"),
    )
    assert df.count() == 80
    # id prune
    df = read_stac(spark, str(cat_path), ids=["item0"])
    assert df.count() == 40
    # catalog with local child links resolves transitively
    cat2 = {
        "type": "Catalog", "id": "root",
        "links": [{"rel": "child", "href": "collection.json"}],
    }
    root = tmp_path / "root.json"
    root.write_text(json.dumps(cat2))
    assert read_stac(spark, str(root),
                     collections=["tiles"]).count() == 120
    # nothing matches -> error, no scan
    import pytest as _pt

    with _pt.raises(ValueError):
        read_stac(spark, str(cat_path), ids=["nope"])


def test_pipeline_sampling_and_grid_stages(spark):
    """The JSON surface for the late-r1 stages: filters.sample
    (exact), filters.griddecimation, filters.sparsesurface."""
    base = [
        {"type": "readers.faux", "count": 200, "mode": "uniform",
         "bounds": "([0, 50], [0, 50], [0, 10])", "seed": 7},
    ]
    kept = Pipeline(base + [
        {"type": "filters.sample", "radius": 5.0, "exact": "true",
         "x": "x", "y": "y", "id": "pid"},
    ]).execute(spark).toPandas()
    assert 0 < len(kept) < 200
    xs, ys = kept["x"].to_numpy(), kept["y"].to_numpy()
    d2 = (xs[:, None] - xs) ** 2 + (ys[:, None] - ys) ** 2
    import numpy as np

    np.fill_diagonal(d2, np.inf)
    assert d2.min() >= 25.0  # pairwise >= radius

    gd = Pipeline(base + [
        {"type": "filters.griddecimation", "resolution": 10.0,
         "x": "x", "y": "y", "z": "z", "id": "pid"},
    ]).execute(spark).toPandas()
    assert len(gd) == 200
    assert set(gd["classification"].unique()) <= {1, 2} or \
        2 in set(gd["classification"].unique())

    ss = Pipeline(base + [
        {"type": "filters.sparsesurface", "radius": 5.0,
         "x": "x", "y": "y", "z": "z", "id": "pid"},
    ]).execute(spark).toPandas()
    assert len(ss) == 200
    assert set(ss["classification"].unique()) == {2, 7}


def test_geojson_writer_roundtrip(spark, tmp_path):
    """writers.geojson emits one valid GeoJSON Feature per point
    with coordinates and pass-through properties."""
    import json

    out = str(tmp_path / "gj")
    Pipeline([
        {"type": "readers.faux", "count": 20, "mode": "ramp",
         "bounds": "([0, 10], [0, 20], [0, 5])"},
        {"type": "writers.geojson", "filename": out,
         "x": "x", "y": "y"},
    ]).execute(spark)
    feats = [json.loads(r["value"])
             for r in spark.read.text(out).collect()]
    assert len(feats) == 20
    f = feats[0]
    assert f["type"] == "Feature"
    assert f["geometry"]["type"] == "Point"
    assert len(f["geometry"]["coordinates"]) == 2
    assert "pid" in f["properties"] and "z" in f["properties"]


def test_pipeline_s2_and_hilbert_stages(spark):
    p = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/events.parquet"},
        {"type": "filters.geocode", "column": "event_id"},
        {"type": "filters.s2", "level": 6},
        {"type": "filters.hilbert", "resolution": 8},
    ])
    df = p.execute(spark)
    assert {"s2_cell", "hilbert_key"} <= set(df.columns)
    rows = df.select("s2_cell", "hilbert_key").limit(200).collect()
    assert all(0 <= r.s2_cell and (r.s2_cell >> 60) <= 5 for r in rows)
    assert all(0 <= r.hilbert_key < (1 << 16) for r in rows)


def test_corpus_job_stages_resume_and_lineage(spark, tmp_path):
    from pdal_spark.plans.corpus import CorpusJob

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (3, "the quick brown fox jumps over the lazy dog tonight"),  # near dup
        (4, "completely different text about spark and data engines"),
        (5, "x"),                                   # fails min_words
        (6, "!!! ??? ;;; ::: @@@ --- +++ === ~~~"),  # fails punct ratio
        (7, "held out benchmark question answer pair text"),
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame(
        [(99, "benchmark question answer pair")], "doc_id long, text string"
    )

    job = CorpusJob(
        str(tmp_path / "corpus"), min_words=3, max_punct_ratio=0.3,
        jaccard_threshold=0.5, n_shards=4,
    )
    r1 = job.run(spark, src, eval_df=ev)
    # quality drops 5 and 6; exact dedup drops 2; near-dup drops 3;
    # decontam drops 7 (shares the benchmark 3-grams)
    assert r1["quality"]["rows_out"] == 5
    assert r1["exact_dedup"]["rows_out"] == 4
    assert r1["near_dedup"]["rows_out"] == 3
    assert r1["decontam"]["rows_out"] == 2
    out = job.output(spark)
    assert {r.doc_id for r in out.select("doc_id").collect()} == {1, 4}
    # text survives byte-identical through the chain
    t1 = out.where(F.col("doc_id") == 1).collect()[0].text
    assert t1 == rows[0][1]

    # removed lineage names every dropped doc with its stage
    rem = job.removed(spark).toPandas()
    stage_of = dict(zip(rem["doc_id"], rem["stage"]))
    assert stage_of[2] == "exact_dedup"
    assert stage_of[3] == "near_dedup"
    assert stage_of[7] == "decontam"
    assert stage_of[5] == "quality" and stage_of[6] == "quality"

    # per-shard metrics: each stage's rows sum to its rows_out
    m = job.metrics(spark).toPandas()
    assert m.groupby("stage")["rows"].sum()["decontam"] == 2

    # resume: a second run skips every committed stage
    r2 = job.run(spark, src, eval_df=ev)
    assert all(v.get("skipped") for v in r2.values())
    assert {r.doc_id for r in job.output(spark).select("doc_id").collect()} \
        == {1, 4}


def test_corpus_job_optional_cap_and_sample_stages(spark, tmp_path):
    from pdal_spark.plans.corpus import CorpusJob

    rows = [
        (i, f"https://d{i % 2}.com/p{i}",
         f"document number {i} with several useful words inside")
        for i in range(10)
    ]
    src = spark.createDataFrame(rows, "doc_id long, url string, text string")
    job = CorpusJob(
        str(tmp_path / "c2"), min_words=3, jaccard_threshold=None,
        url_col="url", max_per_domain=3, sample_rate=1.0, n_shards=2,
    )
    r = job.run(spark, src)
    assert list(r) == ["domain_cap", "quality", "exact_dedup", "sample"]
    assert r["domain_cap"]["rows_out"] == 6  # 3 per domain, 2 domains
    assert r["sample"]["rows_out"] == 6      # rate 1.0 keeps all
    out = job.output(spark)
    assert out.count() == 6
    assert set(out.columns) == {"doc_id", "url", "text"}


def test_corpus_job_blocklist_redact_temperature_stages(spark, tmp_path):
    from pdal_spark.plans.corpus import CorpusJob

    rows = []
    # skewed domains: d0 has 8 pages, d1 has 2
    for i in range(10):
        dom = "d0" if i < 8 else "d1"
        txt = f"document number {i} mail me at u{i}@x.com sometime"
        if i == 3:
            txt += " badword"
        rows.append((i, f"https://{dom}.com/p{i}", txt))
    src = spark.createDataFrame(rows, "doc_id long, url string, text string")
    bl = spark.createDataFrame([("badword",)], "word string")

    job = CorpusJob(
        str(tmp_path / "c3"), min_words=3, jaccard_threshold=None,
        url_col="url", redact=True, temperature_alpha=0.5, n_shards=2,
    )
    r = job.run(spark, src, blocklist_df=bl)
    assert list(r) == [
        "blocklist", "quality", "redact_pii", "exact_dedup",
        "temperature_mix",
    ]
    assert r["blocklist"]["rows_out"] == 9   # doc 3 dropped
    assert r["redact_pii"]["rows_out"] == 9  # redaction removes nothing
    out = job.output(spark).toPandas()
    assert set(out.columns) == {"doc_id", "url", "text"}
    # every surviving text is scrubbed
    assert all("<EMAIL>" in t and "@x.com" not in t for t in out.text)
    # temperature mix keeps the rare domain in full, thins the head
    kept_d1 = sum(out.url.str.contains("//d1.")) if len(out) else 0
    assert kept_d1 == 2
    assert len(out) < 9

    # lineage: doc 3 removed by the blocklist stage
    rem = job.removed(spark).toPandas()
    assert dict(zip(rem.doc_id, rem.stage))[3] == "blocklist"


def test_pipeline_curation_stages(spark):
    from pdal_spark.plans import Pipeline

    rows = [
        (i, f"https://D{i % 3}.com/P{i}?q=1",
         "the quick brown fox jumps over a lazy dog and the cat "
         f"call +1-555-123-4567 now id{i}")
        for i in range(30)
    ]
    src = spark.createDataFrame(rows, "doc_id long, url string, text string")
    src.createOrReplaceTempView("curation_src")

    p = Pipeline([
        {"type": "readers.pages", "table": "curation_src"},
        {"type": "filters.canonicalurl"},
        {"type": "filters.redact"},
        {"type": "filters.gopher", "min_words": 3,
         "max_punct_ratio": 0.5, "max_top_bigram_frac": 0.5},
        {"type": "filters.normalize"},
        {"type": "filters.split"},
    ])
    df = p.execute(spark)
    assert {"canon_url", "norm_text", "split"} <= set(df.columns)
    out = df.toPandas()
    assert len(out) == 30                       # gopher keeps all here
    assert all("<PHONE>" in t for t in out.text)
    assert all(u.startswith("https://d") and "?" not in u
               for u in out.canon_url)
    assert set(out.split) <= {"train", "val", "test"}

    p2 = Pipeline([
        {"type": "readers.pages", "table": "curation_src"},
        {"type": "filters.temperature_mix"},
    ])
    out2 = p2.execute(spark)
    assert {"doc_id", "url", "text"} <= set(out2.columns)
    assert "sample_rate" not in out2.columns
    assert 0 < out2.count() <= 30


def test_warc_reader_roundtrip(spark, tmp_path):
    from pdal_spark.sources.warc import read_warc, write_warc_file

    recs = [
        ("https://a.com/1", "2026-01-01T00:00:00Z", "response",
         b"<html>alpha body</html>"),
        ("https://a.com/1", "2026-01-01T00:00:00Z", "request",
         b"GET /1"),
        ("https://b.com/2", "2026-01-02T00:00:00Z", "response",
         b"\x00\xffbinary ok\r\n\r\nwith separator inside"),
    ]
    write_warc_file(str(tmp_path / "seg-00000.warc"), recs)
    write_warc_file(
        str(tmp_path / "seg-00001.warc"),
        [("https://c.com/3", "2026-01-03T00:00:00Z", "response",
          b"third file")],
    )
    out = read_warc(spark, str(tmp_path)).toPandas()
    assert len(out) == 3                       # requests filtered out
    got = {r.url: bytes(r.payload) for r in out.itertuples()}
    assert got["https://a.com/1"] == b"<html>alpha body</html>"
    # Content-Length framing survives CRLFCRLF inside a payload
    assert got["https://b.com/2"].endswith(b"with separator inside")
    assert got["https://c.com/3"] == b"third file"


def test_jsonl_pipeline_roundtrip(spark, tmp_path):
    from pdal_spark.plans import Pipeline

    src = spark.createDataFrame(
        [(1, "one"), (2, "two")], "doc_id long, text string"
    )
    p = str(tmp_path / "docs.jsonl")
    src.write.json(p)
    df = Pipeline([
        {"type": "readers.jsonl", "filename": p,
         "columns": ["doc_id", "text"]},
        {"type": "filters.normalize"},
    ]).execute(spark)
    out = df.toPandas().sort_values("doc_id")
    assert list(out.norm_text) == ["one", "two"]


def test_warc_to_text_pipeline(spark, tmp_path):
    """End-to-end webtext ingest: WARC segment -> response payloads
    -> extracted text -> normalized hash key."""
    from pdal_spark.plans import Pipeline
    from pdal_spark.sources.warc import write_warc_file

    write_warc_file(
        str(tmp_path / "seg.warc"),
        [("https://a.com/x", "2026-01-01T00:00:00Z", "response",
          b"<html><body><h1>Hello</h1><p>brave &amp; new world</p>"
          b"</body></html>")],
    )
    df = Pipeline([
        {"type": "readers.warc", "filename": str(tmp_path)},
        {"type": "filters.extract_text", "column": "payload"},
        {"type": "filters.normalize"},
    ]).execute(spark)
    row = df.collect()[0]
    assert row.text == "Hello brave & new world"
    assert row.norm_text == "hello brave new world"
    assert row.url == "https://a.com/x"


def test_corpus_job_incremental_against_baseline(spark, tmp_path):
    """baseline_df = an already-curated corpus: new docs that are
    exact or near copies of corpus docs are dropped; batch-internal
    dups keep the min id."""
    from pdal_spark.plans.corpus import CorpusJob

    long_doc = " ".join(f"w{i % 13}x{i % 7}" for i in range(40))
    base = spark.createDataFrame(
        [(1, long_doc),
         (2, "completely different text about spark and data engines")],
        "doc_id long, text string",
    )
    nd = long_doc.split()
    nd[5] = "CHANGED"  # near-dup of corpus doc 1 (jaccard ~0.85)
    rows = [
        (10, long_doc),                   # exact copy of corpus
        (11, " ".join(nd)),               # near-dup of corpus
        (12, "a genuinely new document with many novel words inside"),
        (13, "a genuinely new document with many novel words inside"),
        (14, "another fresh document that shares nothing with corpus"),
    ]
    new = spark.createDataFrame(rows, "doc_id long, text string")
    job = CorpusJob(
        str(tmp_path / "inc"), min_words=3, jaccard_threshold=0.4,
        n_shards=2,
    )
    r = job.run(spark, new, baseline_df=base)
    out = job.output(spark)
    kept = {x.doc_id for x in out.select("doc_id").collect()}
    assert kept == {12, 14}  # 10 exact-vs-corpus, 11 near-vs-corpus,
    # one stage drops BOTH the corpus copy (10) and the intra dup (13)
    assert r["exact_dedup"]["rows_out"] == 3
    rem = job.removed(spark).toPandas()
    stage_of = dict(zip(rem.doc_id, rem.stage))
    assert stage_of[10] == "exact_dedup"
    assert stage_of[13] == "exact_dedup"
    assert stage_of[11] == "near_dedup"


def test_warc_parser_roundtrip_property(tmp_path):
    """Parser-level property: payloads containing CRLF runs, the
    record separator, and even 'WARC/1.0' strings roundtrip exactly
    (Content-Length framing, no payload scanning)."""
    from hypothesis import given, settings, strategies as st

    from pdal_spark.sources.warc import (
        _parse_warc_bytes, write_warc_file,
    )

    payload = st.binary(min_size=0, max_size=200).flatmap(
        lambda b: st.sampled_from([
            b, b + b"\r\n\r\n" + b, b"WARC/1.0\r\n" + b,
            b"\r\n" * 4 + b,
        ])
    )

    @settings(max_examples=25, deadline=None)
    @given(st.lists(payload, min_size=1, max_size=6))
    def check(payloads):
        recs = [
            (f"https://x/{i}", "2026-01-01T00:00:00Z", "response", p)
            for i, p in enumerate(payloads)
        ]
        f = str(tmp_path / "prop.warc")
        write_warc_file(f, recs)
        with open(f, "rb") as fh:
            got = list(_parse_warc_bytes(fh.read()))
        assert [(g[0], g[3]) for g in got] == [
            (r[0], r[3]) for r in recs
        ]

    check()


# --------------------------------------------------------------------------
# round-1 continuation stages: scoring filters, bloom dedup, as-of
# join (tag/inputs DAG), polyfill reader + compact chain, BPE training
# --------------------------------------------------------------------------
def test_pipeline_scoring_and_bloom_stages(spark, tmp_path):
    corpus = str(tmp_path / "corpus.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.where(F.col("doc_id") % 2 == 0).write.parquet(corpus)
    p = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/documents.parquet"},
        {"type": "filters.lm_score"},
        {"type": "filters.quality_classifier"},
        {"type": "filters.dsir_label"},
        {"type": "filters.bloom", "corpus": corpus,
         "m_bits": 16384, "keep": "new"},
    ])
    out = p.execute(spark)
    cols = set(out.columns)
    assert {"lm_mean", "pred", "dsir_w"} <= cols
    # members dropped: no even doc_ids survive keep=new
    assert out.where(F.col("doc_id") % 2 == 0).count() == 0
    assert out.count() > 0


def test_pipeline_asof_dag(spark):
    p = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/events.parquet",
         "tag": "ev"},
        {"type": "filters.expression", "expression": "value >= 0",
         "inputs": ["ev"], "tag": "left"},
        {"type": "filters.expression", "expression": "value < 0",
         "inputs": ["ev"], "tag": "right"},
        {"type": "filters.asof", "on": "user_id", "ts": "ts",
         "inputs": ["left", "right"]},
    ])
    out = p.execute(spark)
    assert "ts_r" in out.columns and out.count() > 0


def test_pipeline_polyfill_compact_chain(spark):
    wkt = "POLYGON((-40 -30, 0 40, 40 -30, 0 -5, -40 -30))"
    cov = Pipeline([
        {"type": "readers.polyfill", "polygon": wkt, "resolution": 6},
    ]).execute(spark)
    comp = Pipeline([
        {"type": "readers.polyfill", "polygon": wkt, "resolution": 6},
        {"type": "filters.compact", "resolution": 6,
         "min_resolution": 2},
        {"type": "filters.uncompact", "resolution": 6},
    ]).execute(spark)
    assert sorted(r.cell for r in comp.collect()) == sorted(
        r.cell for r in cov.collect()
    )


def test_pipeline_bpe_train_stage(spark):
    p = Pipeline([
        {"type": "readers.parquet",
         "filename": f"{SF}/documents.parquet"},
        {"type": "filters.bpe_train", "n_merges": 3},
    ])
    out = p.execute(spark).collect()
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]


def test_pipeline_batch2_stages(spark, tmp_path):
    """The batch-2 curation/analytics ops compose as JSON stages."""
    train = str(tmp_path / "train.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.where(F.col("doc_id") % 2 == 0).write.parquet(train)
    p = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/documents.parquet"},
        {"type": "filters.char_entropy"},
        {"type": "filters.bigram_score", "train": train},
        {"type": "filters.score_percentile", "column": "n_chars"},
        {"type": "filters.stratified_sample", "count": 5,
         "groupby": "lang"},
    ])
    out = p.execute(spark)
    cols = set(out.columns)
    assert {"entropy", "lm2_mean", "pct_rank"} <= cols
    per = out.groupBy("lang").count().collect()
    assert all(r["count"] <= 5 for r in per)

    p2 = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/documents.parquet"},
        {"type": "filters.weighted_sample", "count": 20,
         "weight": "n_chars"},
    ])
    assert p2.execute(spark).count() == 20

    p3 = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/events.parquet"},
        {"type": "filters.sliding_windows", "size_s": 900,
         "step_s": 300, "groupby": "event_type"},
    ])
    sw = p3.execute(spark)
    assert {"window_start_s", "event_type", "n"} == set(sw.columns)
    assert sw.count() > 0

    p4 = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/orders.parquet"},
        {"type": "filters.assign",
         "value": "v = floor(o_totalprice)"},
        {"type": "filters.hdr_quantile", "column": "v",
         "quantiles": [[1, 2], [9, 10]]},
    ])
    hq = p4.execute(spark)
    assert hq.count() == 2

    p5 = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/documents.parquet"},
        {"type": "filters.allpairs", "threshold_num": 1,
         "threshold_den": 2},
    ])
    assert {"a", "b", "n_inter", "jaccard"} == set(p5.execute(spark).columns)

    p6 = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/documents.parquet"},
        {"type": "filters.tfidf_topk", "count": 3,
         "query_where": "doc_id % 50 = 0"},
    ])
    t = p6.execute(spark)
    assert t.groupBy("query_id").count().agg(
        F.max("count")).collect()[0][0] <= 3


def test_pipeline_event_analytics_stages(spark):
    p = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/events.parquet"},
        {"type": "filters.funnel",
         "steps": ["view", "click", "purchase"]},
    ])
    out = p.execute(spark)
    assert {"user_id", "t_0", "t_1", "t_2", "depth"} == set(out.columns)

    p2 = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/events.parquet"},
        {"type": "filters.sessionize", "gap_s": 1800, "rollup": True},
    ])
    st = p2.execute(spark)
    assert {"user_id", "session_n", "n_events", "duration_s"} == set(
        st.columns)

    p3 = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/events.parquet"},
        {"type": "filters.transitions"},
    ])
    assert p3.execute(spark).count() > 0

    p4 = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/lineitem.parquet"},
        {"type": "filters.skew_report", "column": "l_suppkey",
         "count": 5},
    ])
    assert p4.execute(spark).count() == 5

    p5 = Pipeline([
        {"type": "readers.parquet", "filename": f"{SF}/events.parquet"},
        {"type": "filters.cohort_retention", "bucket_s": 604800},
    ])
    assert {"cohort_b", "age", "n_act"} == set(p5.execute(spark).columns)


def test_pipeline_url_latest_stage(spark, tmp_path):
    import pandas as pd

    pages = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "url": ["https://a.com/p", "https://A.com/p/",
                "https://b.com/q?x=1", "https://b.com/q"],
        "warc_ts": pd.to_datetime([
            "2024-01-01", "2024-02-01", "2024-03-01", "2024-01-15"]),
    })
    path = str(tmp_path / "pages.parquet")
    spark.createDataFrame(pages).write.parquet(path)
    p = Pipeline([
        {"type": "readers.parquet", "filename": path},
        {"type": "filters.url_latest"},
    ])
    out = {r.canon_url: r.doc_id for r in p.execute(spark).collect()}
    # a.com: doc 2 is newer; b.com: doc 3 (query stripped) is newest
    assert out == {"https://a.com/p": 2, "https://b.com/q": 3}


def test_stage_registry_is_complete_and_callable():
    """Every registered stage is callable and the registry covers the
    documented surface (readers/filters/writers); catches import or
    registration breakage without running Spark."""
    from pdal_spark.plans.pipeline import REGISTRY

    assert len(REGISTRY) >= 80
    assert all(callable(v) for v in REGISTRY.values())
    kinds = {k.split(".")[0] for k in REGISTRY}
    assert {"readers", "filters", "writers"} <= kinds
    for name in [
        "filters.crop", "filters.h3", "filters.splitter",
        "filters.weighted_sample", "filters.allpairs",
        "filters.funnel", "filters.url_latest",
        "filters.collocations", "filters.grouped_corr",
        "filters.triangles", "filters.kcore", "filters.hits",
        "filters.adamic_adar", "filters.personalized_pagerank",
        "filters.label_propagation", "filters.dsir",
        "filters.rp_sketch", "filters.kmv",
        "filters.decayed_counts", "filters.bfs_levels",
        "filters.ams_f2", "filters.gram_matrix",
        "filters.random_walks", "filters.cooccurrence",
        "filters.bm25", "filters.zorder",
        "filters.delaunay", "filters.hag_delaunay",
        "filters.faceraster", "filters.hag_nn", "filters.fps",
        "filters.reprojection_utm", "filters.colorinterp",
        "filters.normal_refine",
    ]:
        assert name in REGISTRY, name


def test_corpus_job_neardup_uses_shingle_staging(spark, tmp_path):
    # the neardup stage writes a resumable shingle staging table
    # under the job dest and REUSES it: a rerun of the stage against
    # a doctored staging table must reflect the staged data, proving
    # shingles are not recomputed (VERDICT r1 #8)
    import os

    from pdal_spark.plans.corpus import CorpusJob

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely different text about spark and data engines"),
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string")
    dest = str(tmp_path / "corpus")
    job = CorpusJob(dest, min_words=None, max_punct_ratio=None,
                    jaccard_threshold=0.5, n_shards=2,
                    decontam_ngram=0)
    job.run(spark, src)
    staging = f"{dest}/_staging/shingles"
    assert os.path.exists(f"{staging}/_SUCCESS")
    # near-dup dropped doc 2 (keep-min survivor of the pair)
    assert {r.doc_id for r in
            job.output(spark).select("doc_id").collect()} == {1, 3}
    # rerunning the stage fn directly with the staged table emptied
    # yields no pairs -> nothing dropped (reads staging, no recompute)
    empty = spark.read.parquet(staging).limit(0)
    empty.write.mode("overwrite").parquet(staging)
    out2 = job._neardup(src)
    assert out2.count() == 3


def double_z_callback(it):
    # module-level so filters.python can import it by path
    for pdf in it:
        pdf = pdf.copy()
        pdf["z"] = pdf["z"] * 2.0
        yield pdf


def test_pipeline_filters_python_stage(spark):
    p = Pipeline([
        {"type": "readers.faux", "count": 50, "mode": "ramp",
         "bounds": "([0, 1], [0, 1], [0, 10])"},
        {"type": "filters.python",
         "function": "tests.test_pipeline:double_z_callback"},
    ])
    base = Pipeline([
        {"type": "readers.faux", "count": 50, "mode": "ramp",
         "bounds": "([0, 1], [0, 1], [0, 10])"},
    ]).execute(spark)
    out = p.execute(spark)
    assert out.count() == 50
    a = sorted(r.z for r in out.collect())
    b = sorted(r.z * 2.0 for r in base.collect())
    assert a == b
    with pytest.raises(PipelineError, match="module:callable"):
        Pipeline([
            {"type": "readers.faux", "count": 5},
            {"type": "filters.python", "function": "no_colon"},
        ]).execute(spark)
    with pytest.raises(PipelineError, match="cannot resolve"):
        Pipeline([
            {"type": "readers.faux", "count": 5},
            {"type": "filters.python", "function": "nope.mod:f"},
        ]).execute(spark)


def test_corpus_job_line_dedup_and_anonymize_stages(spark, tmp_path):
    from pdal_spark.plans.corpus import CorpusJob

    boiler = "subscribe to our newsletter now"
    rows = [
        (1, f"{boiler}\nunique alpha content here", "https://a.com/x/p1"),
        (2, f"{boiler}\nunique beta content here", "https://a.com/x/p2"),
        (3, f"{boiler}\nunique gamma content here", "https://b.com/y"),
        (4, boiler, "https://a.com/only/boiler"),  # fully boilerplate
    ]
    src = spark.createDataFrame(
        rows, "doc_id long, text string, url string"
    )
    job = CorpusJob(
        str(tmp_path / "corpus"),
        min_words=None, max_punct_ratio=None,
        jaccard_threshold=None, n_shards=2,
        url_col="url",
        line_dedup_min_docs=3, line_dedup_min_len=5,
        anonymize=True,
    )
    r = job.run(spark, src)
    # the boilerplate line occurs in 4 docs -> dropped everywhere;
    # doc 4 becomes empty and drops out
    assert r["line_dedup"]["rows_out"] == 3
    out = {row.doc_id: row for row in job.output(spark).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].text == "unique alpha content here"
    # anonymize replaced urls but preserved the host/path hierarchy
    hosts = {d: out[d].url.split("/")[2] for d in out}
    assert hosts[1] == hosts[2] != hosts[3]
    assert out[1].url.split("/")[3] == out[2].url.split("/")[3]
    assert all(".anon" in u for u in (hosts[1], hosts[3]))
    # resume: a re-run skips every committed stage
    r2 = job.run(spark, src)
    assert all(v.get("skipped") for v in r2.values())
