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
