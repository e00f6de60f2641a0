"""readers.faux analog — deterministic synthetic point generator.

Reference: io/FauxReader.cpp:213-230 dispatches on mode: `ramp`
(linear min->max across count points), `constant` (all = min),
`uniform` / `normal` (seeded RNG in bounds), `grid` (integer
lattice). This is the backbone of the reference's unit tests (e.g.
CropFilterTest.cpp:61-119 crops a 1000-point ramp and expects 333)
and of this engine's fixtures and scale benchmarks.

Spark shape: spark.range + pure column arithmetic — distributed,
no data movement, infinitely scalable. `uniform`/`normal` use the
same Lehmer-LCG the geocode fixture rule uses so results are
reproducible cross-engine (DuckDB can mirror the arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G

_DEFAULT_BOUNDS = ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0])


def _parse_bounds(bounds) -> tuple[list[float], list[float]]:
    if bounds is None:
        return _DEFAULT_BOUNDS
    if isinstance(bounds, str):
        # PDAL syntax ([xmin, xmax], [ymin, ymax], [zmin, zmax])
        vals = [float(t) for t in bounds.replace("[", " ")
                .replace("]", " ").replace("(", " ").replace(")", " ")
                .split(",") if t.strip()]
        mins = vals[0::2]
        maxs = vals[1::2]
        return list(mins), list(maxs)
    mins, maxs = bounds
    return list(mins), list(maxs)


def faux_reader(
    spark: SparkSession,
    count: int,
    mode: str = "ramp",
    bounds=None,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate `count` points with columns (pid, x, y, z)."""
    mins, maxs = _parse_bounds(bounds)
    dims = ["x", "y", "z"][: max(len(mins), 2)]
    parts = num_partitions or spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, count, 1, numPartitions=parts).select(
        F.col("id").alias("pid")
    )
    n1 = max(count - 1, 1)
    for i, d in enumerate(dims):
        lo = mins[i] if i < len(mins) else 0.0
        hi = maxs[i] if i < len(maxs) else 1.0
        if mode == "ramp":
            # FauxReader Mode::Ramp: min + (max-min) * idx/(count-1)
            col = F.lit(lo) + (F.lit(hi - lo) * F.col("pid") / F.lit(n1))
        elif mode == "constant":
            col = F.lit(lo)
        elif mode == "uniform":
            # Lehmer LCG on (pid, dim index, seed) -> [lo, hi)
            h = F.expr(G.lehmer2(f"(pid * 3 + {i} + {seed})"))
            col = F.lit(lo) + (h % F.lit(1_000_000)) / F.lit(1e6) * F.lit(
                hi - lo
            )
        elif mode == "normal":
            # sum of 4 uniforms (Irwin-Hall) ~ normal, deterministic
            us = [
                (F.expr(G.lehmer2(f"(pid * 7 + {i * 4 + j} + {seed})"))
                 % F.lit(1_000_000)) / F.lit(1e6)
                for j in range(4)
            ]
            z = (us[0] + us[1] + us[2] + us[3] - F.lit(2.0)) / F.lit(
                0.5773502691896257
            )
            mean, sd = lo, hi  # PDAL: bounds reused as mean/stdev
            col = F.lit(mean) + z * F.lit(sd)
        elif mode == "grid":
            side = max(int(round(count ** (1.0 / len(dims)))), 1)
            if i == 0:
                col = (F.col("pid") % side).cast("double")
            elif i == 1:
                col = ((F.col("pid") / side).cast("long") % side).cast(
                    "double"
                )
            else:
                col = ((F.col("pid") / (side * side)).cast("long")
                       ).cast("double")
        else:
            raise ValueError(f"unknown faux mode '{mode}'")
        df = df.withColumn(d, col.cast("double"))
    return df
