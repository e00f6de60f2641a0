"""Resumable terrain-analysis job — the geospatial sibling of
plans.corpus.CorpusJob (north_rule: checkpoint/resume + lineage +
metrics), composing the D8 hydrology chain over a cell-elevation
table:

    cells -> fill_depressions -> resolve_flats (flow direction
    with flat drainage) -> {flow_accumulation, strahler_order,
    watershed_label} — all three downstream stages consume the
    RESOLVED flow table, so filled flats drain to their spill exits
    instead of fragmenting into self-loop basins

Stage-grained checkpointing (the CorpusJob design): every stage
materializes its full output to parquet under the job dest and then
commits an atomic JSON snapshot marker; a crashed or re-launched run
resumes from the last committed stage's parquet instead of
recomputing the chain (each downstream op re-reads the FILLED
surface — the physically meaningful elevation — from the committed
`fill` stage). Swap the parquet writes for Iceberg
`writeTo(...).createOrReplace()` on a real catalog; markers become
snapshot ids.

Metrics side table (`_metrics/`): one row per stage with row count
and wall seconds — the per-stage lineage a 1000-executor operator
reads before anything else.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.operators import raster as ops_raster

STAGES = ("cells", "fill", "flowdir", "flowacc", "strahler",
          "watershed")


class TerrainJob:
    def __init__(
        self,
        dest: str,
        res: int,
        cell: str = "cell",
        value: str = "x",
        fill_rounds: int = 64,
        acc_rounds: int = 64,
        strahler_rounds: int = 12,
        n_shards: int = 16,
    ):
        self.dest = dest.rstrip("/")
        self.res = int(res)
        self.cell, self.value = cell, value
        self.fill_rounds = int(fill_rounds)
        self.acc_rounds = int(acc_rounds)
        self.strahler_rounds = int(strahler_rounds)
        self.n_shards = int(n_shards)
        self.snap_dir = f"{self.dest}/_snapshots"
        self.metrics_path = f"{self.dest}/_metrics"

    # -- snapshot bookkeeping (the CorpusJob mechanics) ----------------
    def stage_path(self, stage: str) -> str:
        return f"{self.dest}/stage={stage}"

    def _marker(self, stage: str) -> str:
        return os.path.join(self.snap_dir, f"{stage}.json")

    def committed_stages(self) -> list[str]:
        if not os.path.isdir(self.snap_dir):
            return []
        return [f[:-5] for f in os.listdir(self.snap_dir)
                if f.endswith(".json")]

    def _commit(self, stage: str, meta: dict) -> None:
        os.makedirs(self.snap_dir, exist_ok=True)
        tmp = os.path.join(self.snap_dir, f".{stage}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"stage": stage, **meta}, fh)
        os.replace(tmp, self._marker(stage))  # atomic commit

    def _write_stage(self, spark: SparkSession, stage: str,
                     df: DataFrame) -> DataFrame:
        t0 = time.time()
        out = df.repartition(self.n_shards, self.cell)
        out.write.mode("overwrite").parquet(self.stage_path(stage))
        back = spark.read.parquet(self.stage_path(stage))
        n = back.count()
        spark.createDataFrame(
            [(stage, n, time.time() - t0)],
            "stage string, rows long, wall_s double",
        ).write.mode("append").parquet(self.metrics_path)
        self._commit(stage, {"rows": n, "wall_s": time.time() - t0})
        return back

    # -- the chain ------------------------------------------------------
    def run(self, spark: SparkSession,
            cells: DataFrame | None = None) -> dict[str, DataFrame]:
        """Run (or resume) the chain. `cells` (the per-cell
        elevation table) is required unless the `cells` stage is
        already committed."""
        done = set(self.committed_stages())

        if "cells" in done:
            base = spark.read.parquet(self.stage_path("cells"))
        else:
            if cells is None:
                raise ValueError("cells DataFrame required on the "
                                 "first run")
            base = self._write_stage(
                spark, "cells",
                cells.select(F.col(self.cell),
                             F.col(self.value).cast("long")
                             .alias(self.value)),
            )

        if "fill" in done:
            filled = spark.read.parquet(self.stage_path("fill"))
        else:
            filled = self._write_stage(
                spark, "fill",
                ops_raster.fill_depressions(
                    base, self.res, cell=self.cell, value=self.value,
                    max_rounds=self.fill_rounds,
                ),
            )
        # downstream ops run on the FILLED surface
        surf = filled.select(self.cell, F.col("fill").alias("zf"))

        out: dict[str, DataFrame] = {"cells": base, "fill": filled}
        if "flowdir" in done:
            out["flowdir"] = spark.read.parquet(
                self.stage_path("flowdir"))
        else:
            out["flowdir"] = self._write_stage(
                spark, "flowdir",
                ops_raster.resolve_flats(surf, self.res,
                                         cell=self.cell, value="zf"),
            )
        flow = out["flowdir"]
        if "flowacc" in done:
            out["flowacc"] = spark.read.parquet(
                self.stage_path("flowacc"))
        else:
            out["flowacc"] = self._write_stage(
                spark, "flowacc",
                ops_raster.flow_accumulation(
                    surf, self.res, cell=self.cell, value="zf",
                    max_rounds=self.acc_rounds, flow=flow,
                ),
            )
        if "strahler" in done:
            out["strahler"] = spark.read.parquet(
                self.stage_path("strahler"))
        else:
            out["strahler"] = self._write_stage(
                spark, "strahler",
                ops_raster.strahler_order(
                    surf, self.res, cell=self.cell, value="zf",
                    rounds=self.strahler_rounds, flow=flow,
                ),
            )
        if "watershed" in done:
            out["watershed"] = spark.read.parquet(
                self.stage_path("watershed"))
        else:
            out["watershed"] = self._write_stage(
                spark, "watershed",
                ops_raster.watershed_label(
                    surf, self.res, cell=self.cell, value="zf",
                    flow=flow,
                ),
            )
        return out
