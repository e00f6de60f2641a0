"""readers.text analog — CSV/whitespace with header-driven schema.

Reference: io/TextReader.cpp:92-127 parses the first (post-skip)
line as dimension names, infers separator, supports `skip`, `count`,
`header` override. Spark's CSV source provides the same with schema
inference; `skip` is not native, handled via an option or filtered
read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_text(
    spark: SparkSession,
    path: str,
    separator: str = ",",
    skip: int = 0,
    count: int | None = None,
    header: bool = True,
) -> DataFrame:
    r = (
        spark.read.option("header", str(header).lower())
        .option("sep", separator)
        .option("inferSchema", "true")
    )
    if skip:
        # Spark CSV has no skip-N option; use the text reader to drop
        # the first N physical lines, then re-parse.
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        lines = spark.read.text(path).withColumn(
            "__i", F.monotonically_increasing_id()
        )
        w = Window.orderBy("__i")
        lines = lines.withColumn("__rn", F.row_number().over(w))
        body = lines.where(F.col("__rn") > skip).select("value")
        df = r.csv(body.rdd.map(lambda row: row.value))
    else:
        df = r.csv(path)
    if count is not None:
        df = df.limit(count)
    return df


def geojson_features(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """writers.text GeoJSON mode / writers.ogr analog
    (io/TextWriter.cpp GeoJSON output type, io/OGRWriter.cpp): each
    point becomes one GeoJSON Feature string with a Point geometry
    from (x, y) and every other column as a property.

    Pure Catalyst (`to_json` over nested structs — no Python), one
    feature per row: the scale-friendly newline-delimited-GeoJSON
    form. `write_geojson` saves it via the text sink."""
    from pyspark.sql import functions as F

    props = [c for c in df.columns if c not in (x, y)]
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Point").alias("type"),
                F.array(F.col(x), F.col(y)).alias("coordinates"),
            ).alias("geometry"),
            F.struct(*[F.col(c) for c in props]).alias("properties"),
        )
    )
    return df.select(feature.alias("feature"))


def write_geojson(
    df: DataFrame,
    path: str,
    x: str = "lon",
    y: str = "lat",
    mode: str = "overwrite",
) -> None:
    geojson_features(df, x, y).write.mode(mode).text(path)


def ogr_features(
    df: DataFrame,
    x: str = "lon",
    y: str = "lat",
    multicount: int = 1,
    measure_dim: str | None = None,
    attrs: list[str] | None = None,
    order: str | None = None,
) -> DataFrame:
    """writers.ogr analog (io/OGRWriter.cpp:85-118 options, :254-320
    feature loop) beyond the plain point GeoJSON of
    ``geojson_features``:

    - ``multicount=n``: group n CONSECUTIVE points (by ``order``)
      into one MultiPoint feature — the reference's m_multiCount.
      Grouping by consecutive rank is inherently sequential; the
      window is a single global sort, right for writer-sized outputs
      (for corpus-scale exports group by a key column upstream and
      call with multicount=1).
    - ``measure_dim``: emit [x, y, m] coordinates (the reference's
      OGR measure field).
    - ``attrs``: explicit attribute columns (default: everything
      except the coordinate/measure columns).

    Output: one `feature` JSON string per feature — GeoJSON, the one
    vector format whose writer needs no OGR linkage (other OGR
    drivers are a driver-side format zoo, out of scope like the LAS
    codec)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    drop = {x, y, measure_dim} if measure_dim else {x, y}
    props = [c for c in (attrs if attrs is not None else df.columns)
             if c not in drop]
    coords = (
        F.array(F.col(x), F.col(y), F.col(measure_dim))
        if measure_dim else F.array(F.col(x), F.col(y))
    )
    if multicount <= 1:
        feature = F.to_json(F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Point").alias("type"),
                coords.alias("coordinates"),
            ).alias("geometry"),
            F.struct(*[F.col(c) for c in props]).alias("properties"),
        ))
        return df.select(feature.alias("feature"))
    if order is None:
        raise ValueError("multicount > 1 requires an `order` column")
    w = Window.orderBy(order)
    g = df.withColumn(
        "__grp",
        ((F.row_number().over(w) - 1) / int(multicount))
        .cast("long"),
    )
    agg = g.groupBy("__grp").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(order).alias("o"),
                                    coords.alias("c")))
        ).alias("__pts"),
        *[F.min_by(F.col(c), F.col(order)).alias(c) for c in props],
    )
    feature = F.to_json(F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("MultiPoint").alias("type"),
            F.transform(F.col("__pts"), lambda s: s["c"])
            .alias("coordinates"),
        ).alias("geometry"),
        F.struct(*[F.col(c) for c in props]).alias("properties"),
    ))
    return agg.orderBy("__grp").select(feature.alias("feature"))


def write_ogr(
    df: DataFrame,
    path: str,
    x: str = "lon",
    y: str = "lat",
    multicount: int = 1,
    measure_dim: str | None = None,
    attrs: list[str] | None = None,
    order: str | None = None,
    mode: str = "overwrite",
) -> None:
    """writers.ogr analog: newline-delimited GeoJSON features."""
    ogr_features(
        df, x, y, multicount, measure_dim, attrs, order
    ).write.mode(mode).text(path)
