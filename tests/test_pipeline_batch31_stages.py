"""Execute the batch-31 pipeline stages end-to-end through the JSON
Pipeline."""

from pdal_spark.plans.pipeline import REGISTRY, Pipeline


def test_registry_has_batch31_stages():
    for name in ["filters.gwr", "filters.stay_points",
                 "filters.flock", "filters.fleiss"]:
        assert name in REGISTRY, name


def _write(spark, tmp_path, name, rows, cols):
    p = str(tmp_path / f"{name}.parquet")
    spark.createDataFrame(rows, cols).write.parquet(p)
    return p


def test_gwr_stage_executes(spark, tmp_path):
    ps = _write(spark, tmp_path, "s",
                [(0, 0, 0, 1), (1, 0, 1, 3), (2, 0, 2, 5)],
                ["mx", "my", "x", "y"])
    pt = _write(spark, tmp_path, "t", [(1, 1, 0)],
                ["tid", "mx", "my"])
    out = Pipeline([
        {"type": "readers.parquet", "filename": ps, "tag": "s"},
        {"type": "readers.parquet", "filename": pt, "tag": "t"},
        {"type": "filters.gwr", "h": 100, "inputs": ["s", "t"]},
    ]).execute(spark)
    assert abs(out.collect()[0].beta1 - 2.0) < 1e-9


def test_stay_points_stage_executes(spark, tmp_path):
    p = _write(spark, tmp_path, "sp",
               [(1, 1, 0, 0), (1, 2, 1, 0)], ["key", "ts", "mx", "my"])
    out = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.stay_points", "t2": 100},
    ]).execute(spark)
    assert out.collect()[0].n == 2


def test_flock_stage_executes(spark, tmp_path):
    p = _write(spark, tmp_path, "fl",
               [(1, 1, 9), (2, 1, 9), (1, 2, 9), (2, 2, 9)],
               ["key", "tbin", "cell"])
    out = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.flock", "min_run": 2},
    ]).execute(spark)
    assert out.collect()[0].max_run == 2


def test_fleiss_stage_executes(spark, tmp_path):
    p = _write(spark, tmp_path, "fk",
               [(1, "a"), (1, "a"), (2, "b"), (2, "b")],
               ["item", "cat"])
    out = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.fleiss"},
    ]).execute(spark)
    assert out.collect()[0].po == 1.0


def test_registry_has_batch32_stages():
    for name in ["filters.krippendorff", "filters.bilinear",
                 "filters.focal_curvature", "filters.zonal_majority"]:
        assert name in REGISTRY, name


def test_zonal_majority_stage_executes(spark, tmp_path):
    p = _write(spark, tmp_path, "zm",
               [("A", 1), ("A", 1), ("A", 2)], ["zone", "cat"])
    out = Pipeline([
        {"type": "readers.parquet", "filename": p},
        {"type": "filters.zonal_majority"},
    ]).execute(spark)
    assert out.collect()[0].majority == 1


def test_bilinear_stage_executes(spark, tmp_path):
    pc = _write(spark, tmp_path, "bc",
                [(gx, gy, gx + gy) for gx in range(2)
                 for gy in range(2)], ["gx", "gy", "z"])
    pp = _write(spark, tmp_path, "bp", [(1, 500, 500)],
                ["pid", "px", "py"])
    out = Pipeline([
        {"type": "readers.parquet", "filename": pc, "tag": "c"},
        {"type": "readers.parquet", "filename": pp, "tag": "p"},
        {"type": "filters.bilinear", "inputs": ["c", "p"]},
    ]).execute(spark)
    assert abs(out.collect()[0].v - 1.0) < 1e-9
