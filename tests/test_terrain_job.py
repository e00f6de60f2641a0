"""TerrainJob: chain correctness, stage checkpoints, resume
semantics (a committed stage is READ, never recomputed)."""

import os

from pdal_spark.plans.terrain import TerrainJob
from pdal_spark.sqlgen import qcell_pack

RES = 4


def _cell(ix, iy):
    return int(eval(qcell_pack(str(ix), str(iy), RES)))


def _cells(spark):
    # a walled valley: rows 0 and 2 are z=50 walls, the middle row
    # is [30, 10, 15, 0]. Only middle cells ix=1,2 are INTERIOR (8
    # observed neighbors); the pit (1,1)=10 spills east over 15.
    rows = []
    for ix, v in enumerate([30, 10, 15, 0]):
        rows.append((_cell(ix, 1), v))
        rows.append((_cell(ix, 0), 50))
        rows.append((_cell(ix, 2), 50))
    return spark.createDataFrame(rows, ["cell", "x"])


def test_terrain_job_full_chain(spark, tmp_path):
    job = TerrainJob(str(tmp_path / "tj"), res=RES, fill_rounds=8,
                     acc_rounds=8, strahler_rounds=6, n_shards=2)
    out = job.run(spark, _cells(spark))
    fills = {r.cell: r.fill for r in out["fill"].collect()}
    assert fills[_cell(1, 1)] == 15  # pit raised to spill level
    assert fills[_cell(0, 1)] == 30 and fills[_cell(3, 1)] == 0
    # flowdir is resolve_flats over the filled surface: the filled
    # pit DRAINS east through its spill — the whole valley (and the
    # walls draining into it) reaches the true pit at (3,1)
    basins = {r.cell: r.basin for r in out["watershed"].collect()}
    assert set(basins.values()) == {_cell(3, 1)}
    acc = {r.cell: r.acc for r in out["flowacc"].collect()}
    assert acc[_cell(3, 1)] == 11  # all other 11 cells drain in
    assert sorted(job.committed_stages()) == sorted(
        ["cells", "fill", "flowdir", "flowacc", "strahler",
         "watershed"])
    # metrics has one row per stage
    m = spark.read.parquet(job.metrics_path)
    assert m.count() == 6


def test_terrain_job_resume_reads_committed_stage(spark, tmp_path):
    dest = str(tmp_path / "tj2")
    job = TerrainJob(dest, res=RES, fill_rounds=8, acc_rounds=8,
                     strahler_rounds=6, n_shards=2)
    job.run(spark, _cells(spark))

    # doctor the committed FILL stage: flatten everything to one
    # level; drop downstream markers + stage data
    doctored = spark.createDataFrame(
        [(c, 5, 5) for (c,) in
         spark.read.parquet(job.stage_path("cells"))
         .select("cell").collect()],
        ["cell", "z", "fill"],
    )
    doctored.write.mode("overwrite").parquet(job.stage_path("fill"))
    for st in ("flowdir", "flowacc", "strahler", "watershed"):
        os.remove(os.path.join(job.snap_dir, f"{st}.json"))

    out = job.run(spark)  # no cells needed: resumes from markers
    # a flat surface has no drainage: every cell is its own basin
    basins = {r.cell: r.basin for r in out["watershed"].collect()}
    assert all(c == b for c, b in basins.items())
    # proves fill was REUSED (not recomputed from cells): recompute
    # would have produced the valley, not the flat surface


def test_terrain_job_requires_cells_on_first_run(spark, tmp_path):
    job = TerrainJob(str(tmp_path / "tj3"), res=RES)
    try:
        job.run(spark)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
