"""Execute the batch-30 regional-analysis pipeline stages end-to-end
through the JSON Pipeline (catches wrapper-argument drift)."""

from pdal_spark.plans.pipeline import REGISTRY, Pipeline


def test_registry_has_batch30_stages():
    for name in [
        "filters.location_quotient", "filters.relative_risk",
        "filters.huff", "filters.two_sfca", "filters.cross_track",
    ]:
        assert name in REGISTRY, name


def _write(spark, tmp_path, name, rows, cols):
    p = str(tmp_path / f"{name}.parquet")
    spark.createDataFrame(rows, cols).write.parquet(p)
    return p


def test_location_quotient_stage_executes(spark, tmp_path):
    p = _write(spark, tmp_path, "lq",
               [("A", "x"), ("A", "x"), ("B", "y")], ["cell", "cat"])
    out = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.location_quotient"},
    ]).execute(spark)
    assert out.count() == 2


def test_relative_risk_stage_executes(spark, tmp_path):
    p = _write(spark, tmp_path, "rr",
               [("A", 1), ("A", 0), ("B", 0)], ["cell", "is_case"])
    out = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.relative_risk"},
    ]).execute(spark)
    assert {r.cell for r in out.collect()} == {"A", "B"}


def test_huff_stage_executes(spark, tmp_path):
    po = _write(spark, tmp_path, "orig", [(1, 0, 0)],
                ["oid", "mx", "my"])
    pf = _write(spark, tmp_path, "fac",
                [(7, 50, 0, 2), (8, -50, 0, 2)],
                ["fid", "mx", "my", "w"])
    out = Pipeline([
        {"type": "readers.parquet", "filename": po, "tag": "o"},
        {"type": "readers.parquet", "filename": pf, "tag": "f"},
        {"type": "filters.huff", "inputs": ["o", "f"]},
    ]).execute(spark)
    assert {r.p for r in out.collect()} == {0.5}


def test_two_sfca_stage_executes(spark, tmp_path):
    pd_ = _write(spark, tmp_path, "dem", [(1, 0, 0, 2)],
                 ["did", "mx", "my", "pop"])
    ps = _write(spark, tmp_path, "sup", [(9, 1, 0, 4)],
                ["sid", "mx", "my", "cap"])
    out = Pipeline([
        {"type": "readers.parquet", "filename": pd_, "tag": "d"},
        {"type": "readers.parquet", "filename": ps, "tag": "s"},
        {"type": "filters.two_sfca", "radius": 10,
         "inputs": ["d", "s"]},
    ]).execute(spark)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].n_fac == 1


def test_cross_track_stage_executes(spark, tmp_path):
    p = _write(spark, tmp_path, "xt", [(0.0, 10.0)], ["lat", "lon"])
    out = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.cross_track", "lat1": 0.0, "lon1": 0.0,
         "lat2": 0.0, "lon2": 90.0},
    ]).execute(spark)
    assert abs(out.collect()[0].dxt_km) < 1e-6
