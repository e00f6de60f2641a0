"""`pdal tile` flagship job: checkpointed, resumable, with lineage
and metrics tables (the north_rule's operational contract).

Reference anatomy (kernels/TileKernel.cpp:90-115): stream-read ->
optional reproject -> splitter -> one LAS file per tile via `#`
filename templating (FlexWriter.hpp:67-140). PDAL offers no resume:
a crash restarts the whole job. At 10^12 pages that is unacceptable,
so this job adds Iceberg-style snapshot checkpointing (emulated on
plain parquet here — this sandbox ships no Iceberg jars; swap
`_write_tiles` for a `writeTo(...).overwritePartitions()` on a real
catalog and the snapshot bookkeeping comes for free):

- tiles are written with dynamic partition overwrite, so re-running
  a batch is idempotent per tile;
- a run only commits to the snapshot manifest (_snapshots/run-N.json)
  AFTER its tiles, metrics and lineage land — a crash mid-run leaves
  orphan files that the next run simply overwrites;
- resume = skip every tile already in a committed snapshot.

Side tables, both partition-grained (north_rule: "per-partition
lineage and metrics tables"):
- metrics: tile_id, rows, x/y min/max, byte-identical text check
  hash (sum of xxhash64(text) — order-free), wall fields per run;
- lineage: tile_id -> distinct input files (input_file_name()).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.operators.splitter import splitter


class TileJob:
    def __init__(
        self,
        dest: str,
        length: float,
        origin_x: float,
        origin_y: float,
        x: str = "lon",
        y: str = "lat",
        buffer: float = 0.0,
        text_col: str | None = None,
    ):
        self.dest = dest.rstrip("/")
        self.length = length
        self.origin_x = origin_x
        self.origin_y = origin_y
        self.x, self.y = x, y
        self.buffer = buffer
        self.text_col = text_col
        self.snap_dir = f"{self.dest}/_snapshots"
        self.metrics_path = f"{self.dest}/_metrics"
        self.lineage_path = f"{self.dest}/_lineage"
        self.tiles_path = f"{self.dest}/tiles"

    # -- snapshot bookkeeping -------------------------------------------
    def committed_tiles(self) -> set[int]:
        done: set[int] = set()
        if not os.path.isdir(self.snap_dir):
            return done
        for f in sorted(os.listdir(self.snap_dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.snap_dir, f)) as fh:
                    done.update(json.load(fh)["tiles"])
        return done

    def _commit(self, run_id: int, tiles: list[int], meta: dict) -> None:
        os.makedirs(self.snap_dir, exist_ok=True)
        tmp = os.path.join(self.snap_dir, f".run-{run_id}.json.tmp")
        out = os.path.join(self.snap_dir, f"run-{run_id}.json")
        with open(tmp, "w") as fh:
            json.dump({"run": run_id, "tiles": tiles, **meta}, fh)
        os.replace(tmp, out)  # atomic commit, the snapshot boundary

    # -- the job ---------------------------------------------------------
    def run(self, spark: SparkSession, src: DataFrame,
            batch_id: int | None = None) -> dict:
        """One job run over `src`.

        Two modes, chosen by `batch_id`:
        - resume mode (batch_id=None): re-running the SAME logical
          input — tiles already in a committed snapshot are skipped
          entirely (their rows in `src` are assumed unchanged).
        - append/batch mode (batch_id=N, the streaming foreachBatch
          sink): each batch holds NEW rows; nothing is skipped, and
          data partitions on (batch_id, tile_id), so re-running a
          crashed batch dynamically overwrites only ITS OWN
          partitions — exactly-once under foreachBatch's
          at-least-once delivery.
        """
        t0 = time.time()
        append = batch_id is not None
        done = set() if append else self.committed_tiles()
        run_id = int(batch_id) if append else 0
        if not append and os.path.isdir(self.snap_dir):
            run_id = len(
                [f for f in os.listdir(self.snap_dir)
                 if f.endswith(".json")]
            )

        tiled = splitter(
            src, x=self.x, y=self.y, length=self.length,
            origin_x=self.origin_x, origin_y=self.origin_y,
            buffer=self.buffer,
        ).withColumn("__file", F.input_file_name())

        if done:
            # resume: prune committed tiles BEFORE the shuffle. The
            # done-set is a small broadcast (O(#tiles)).
            done_df = spark.createDataFrame(
                [(t,) for t in sorted(done)], "tile_id long"
            )
            tiled = tiled.join(
                F.broadcast(done_df), on="tile_id", how="left_anti"
            )

        # metrics + lineage from ONE aggregation; the tile write below
        # deliberately re-scans the (lazy) source rather than
        # materializing the full row set — at the target scale a
        # second columnar scan is cheaper than persisting 10^12 rows.
        agg_cols = [
            F.count(F.lit(1)).alias("rows"),
            F.min(self.x).alias("xmin"), F.max(self.x).alias("xmax"),
            F.min(self.y).alias("ymin"), F.max(self.y).alias("ymax"),
            F.collect_set("__file").alias("input_files"),
        ]
        if self.text_col:
            # order-free content fingerprint: byte-identical text per
            # (url, tile) copy => equal sums (SURVEY.md §7 invariant).
            # each term reduced below 2^31 so the int64 sum is safe up
            # to ~4e9 rows per tile under ANSI arithmetic.
            agg_cols.append(
                F.sum(
                    F.pmod(F.xxhash64(F.col(self.text_col)),
                           F.lit(2147483647))
                ).alias("text_hash_sum")
            )
        side = tiled.groupBy("tile_id").agg(*agg_cols)
        side = side.withColumn("run_id", F.lit(run_id)).localCheckpoint(
            eager=True
        )
        new_tiles = [r["tile_id"] for r in
                     side.select("tile_id").collect()]
        if not new_tiles:
            return {"run_id": run_id, "new_tiles": 0,
                    "total_committed": len(done), "wall_s": 0.0}

        # tile data: dynamic partition overwrite => idempotent
        # re-runs. Config is scoped (restored after) so unrelated
        # writes in the same session keep full-truncate semantics.
        prev_mode = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            data = tiled.drop("__file")
            part_cols = ["tile_id"]
            if append:
                # batch mode: (run_id, tile_id) partitions — a batch
                # retry overwrites only its own partitions
                data = data.withColumn("run_id", F.lit(run_id))
                part_cols = ["run_id", "tile_id"]
            (
                data.repartition("tile_id")
                .sortWithinPartitions("tile_id", self.x, self.y)
                .write.mode("overwrite")
                .partitionBy(*part_cols)
                .parquet(self.tiles_path)
            )
            # side tables partition on run_id with dynamic overwrite:
            # a crash-then-retry of the same run replaces its own
            # rows instead of appending duplicates
            side.select(
                "tile_id", "rows", "xmin", "xmax", "ymin", "ymax",
                *(["text_hash_sum"] if self.text_col else []),
                "run_id",
            ).write.mode("overwrite").partitionBy("run_id").parquet(
                self.metrics_path
            )
            side.select(
                "tile_id", F.explode("input_files").alias("input_file"),
                "run_id",
            ).write.mode("overwrite").partitionBy("run_id").parquet(
                self.lineage_path
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )

        wall = time.time() - t0
        if not append:
            self._commit(run_id, sorted(int(t) for t in new_tiles),
                         {"wall_s": round(wall, 3)})
        return {
            "run_id": run_id,
            "new_tiles": len(new_tiles),
            "total_committed": len(done) + len(new_tiles),
            "wall_s": round(wall, 3),
        }

    # -- readers over the products ----------------------------------------
    def tiles(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.tiles_path)

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.metrics_path)

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.lineage_path)
