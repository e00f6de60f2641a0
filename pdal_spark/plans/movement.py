"""Resumable movement-analysis job — the trajectory sibling of
plans.corpus.CorpusJob / plans.terrain.TerrainJob (north_rule:
checkpoint/resume + per-stage lineage + metrics), composing this
repo's movement operators over a per-key ping table:

    points -> staypoints (dwell segmentation, temporal.stay_points)
           -> odflows  (transitions between CONSECUTIVE stays per
                        key, rolled up to zone-to-zone flows)
           -> flocks   (sustained co-location pairs over
                        (tbin, zone) presence, temporal.flock_pairs)

Stage-grained checkpointing (the CorpusJob design): every stage
materializes its output to parquet under the job dest, then commits
an atomic JSON snapshot marker; a re-launched run resumes from the
last committed stage instead of recomputing the chain. Swap the
parquet writes for Iceberg ``writeTo(...).createOrReplace()`` on a
real catalog; markers become snapshot ids.

Metrics side table (`_metrics/`): one row per stage with row count
and wall seconds.

Scale notes: staypoints is one per-key window + one agg; odflows is
one lag window over the (small) stay table + ONE hash agg; flocks'
pair space tracks zone-bin occupancy. The zone grid (``zone_q``
millidegree cells) is the skew unit — hot zones are AQE
skew-join-eligible in the flock self-join.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdal_spark.operators import temporal as ops_temporal

STAGES = ("points", "staypoints", "odflows", "flocks")


class MovementJob:
    def __init__(
        self,
        dest: str,
        key: str = "key",
        ts: str = "ts",
        t2: int = 1,
        min_n: int = 2,
        zone_q: int = 20000,
        tbin_q: int = 3600,
        min_run: int = 2,
        n_shards: int = 16,
    ):
        self.dest = dest.rstrip("/")
        self.key, self.ts = key, ts
        self.t2, self.min_n = int(t2), int(min_n)
        self.zone_q = int(zone_q)
        self.tbin_q = int(tbin_q)
        self.min_run = int(min_run)
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
                     df: DataFrame, shard_col: str) -> DataFrame:
        t0 = time.time()
        out = df.repartition(self.n_shards, shard_col)
        out.write.mode("overwrite").parquet(self.stage_path(stage))
        back = spark.read.parquet(self.stage_path(stage))
        n = back.count()
        spark.createDataFrame(
            [(stage, n, time.time() - t0)],
            "stage string, rows long, wall_s double",
        ).write.mode("append").parquet(self.metrics_path)
        self._commit(stage, {"rows": n, "wall_s": time.time() - t0})
        return back

    def _zone(self, cx: str, cy: str) -> str:
        q = self.zone_q
        return f"(({cx}) div {q}) * 100000 + (({cy}) div {q})"

    # -- the chain ------------------------------------------------------
    def run(self, spark: SparkSession,
            points: DataFrame | None = None) -> dict[str, DataFrame]:
        """Run (or resume) the chain. ``points`` carries (key, ts,
        mx, my) — exact integer grid coordinates — and is required
        unless the ``points`` stage is already committed."""
        done = set(self.committed_stages())
        k = self.key

        if "points" in done:
            base = spark.read.parquet(self.stage_path("points"))
        else:
            if points is None:
                raise ValueError("points DataFrame required on the "
                                 "first run")
            base = self._write_stage(
                spark, "points",
                points.select(
                    F.col(k), F.col(self.ts).alias("__ts"),
                    F.col("mx").cast("long"),
                    F.col("my").cast("long"),
                ),
                k,
            )

        out: dict[str, DataFrame] = {"points": base}

        if "staypoints" in done:
            stays = spark.read.parquet(self.stage_path("staypoints"))
        else:
            stays = self._write_stage(
                spark, "staypoints",
                ops_temporal.stay_points(
                    base, key=k, ts="__ts", t2=self.t2,
                    min_n=self.min_n,
                ),
                k,
            )
        out["staypoints"] = stays

        if "odflows" in done:
            out["odflows"] = spark.read.parquet(
                self.stage_path("odflows"))
        else:
            w = Window.partitionBy(k).orderBy("t_start", "seg")
            z = self._zone("cx", "cy")
            hops = stays.select(
                F.col(k),
                F.expr(z).alias("zone"),
                F.lag(F.expr(z)).over(w).alias("prev_zone"),
            ).where(F.col("prev_zone").isNotNull())
            od = (
                hops.where(F.col("zone") != F.col("prev_zone"))
                .groupBy(
                    F.col("prev_zone").alias("from_zone"),
                    F.col("zone").alias("to_zone"),
                )
                .agg(F.count(F.lit(1)).cast("long").alias("n_trips"))
            )
            out["odflows"] = self._write_stage(
                spark, "odflows", od, "from_zone")

        if "flocks" in done:
            out["flocks"] = spark.read.parquet(
                self.stage_path("flocks"))
        else:
            pres = base.select(
                F.col(k),
                (F.col("__ts").cast("long")
                 / F.lit(self.tbin_q)).cast("long").alias("tbin"),
                F.expr(self._zone("mx", "my")).alias("zone"),
            )
            out["flocks"] = self._write_stage(
                spark, "flocks",
                ops_temporal.flock_pairs(
                    pres, key=k, tbin="tbin", cell="zone",
                    min_run=self.min_run,
                ),
                "ka",
            )
        return out
