"""MovementJob: the resumable stay-point -> OD-flow -> flock chain
(checkpoint markers, metrics lineage, stage-grained resume)."""

import os

from pdal_spark.plans.movement import STAGES, MovementJob


def _points(spark):
    # key 1: dwell at zone A (3 pings), hop to zone B (3 pings)
    # key 2: same zones, same bins -> flock partner of key 1
    rows = []
    for kid in (1, 2):
        for i in range(3):
            rows.append((kid, 100 + i, 1000 + i, 1000))
        for i in range(3):
            rows.append((kid, 200 + i, 61000 + i, 1000))
    return spark.createDataFrame(rows, ["key", "ts", "mx", "my"])


def test_movement_job_end_to_end(spark, tmp_path):
    job = MovementJob(str(tmp_path / "mv"), t2=100 * 100, min_n=2,
                      zone_q=20000, tbin_q=100, min_run=2)
    out = job.run(spark, _points(spark))
    assert set(job.committed_stages()) == set(STAGES)

    stays = out["staypoints"].collect()
    assert len(stays) == 4  # 2 keys x 2 dwell segments
    od = out["odflows"].collect()
    assert len(od) == 1 and od[0].n_trips == 2
    assert od[0].from_zone != od[0].to_zone

    flocks = out["flocks"].collect()
    assert len(flocks) == 1
    assert (flocks[0].ka, flocks[0].kb) == (1, 2)
    assert flocks[0].max_run >= 2

    # metrics lineage: one row per stage
    m = spark.read.parquet(job.metrics_path)
    assert {r.stage for r in m.collect()} == set(STAGES)


def test_movement_job_resumes_only_missing_stage(spark, tmp_path):
    dest = str(tmp_path / "mv2")
    job = MovementJob(dest, t2=100 * 100, min_n=2,
                      zone_q=20000, tbin_q=100, min_run=2)
    job.run(spark, _points(spark))

    # invalidate ONLY the last stage
    os.remove(job._marker("flocks"))
    mtime_before = {
        s: os.path.getmtime(job._marker(s))
        for s in ("points", "staypoints", "odflows")
    }
    out2 = job.run(spark)  # no points needed on resume
    assert set(job.committed_stages()) == set(STAGES)
    # earlier stages were NOT recommitted
    for s, t in mtime_before.items():
        assert os.path.getmtime(job._marker(s)) == t
    assert out2["flocks"].count() == 1


def test_movement_job_requires_points_first_run(spark, tmp_path):
    job = MovementJob(str(tmp_path / "mv3"))
    try:
        job.run(spark)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
