"""functions.rank primitives: distributed ranks / prefix sums must
equal their single-window definitions exactly, including signed
inputs (partition totals are last-row cumsums, not maxima) and
descending sort expressions."""

from decimal import Decimal

from pyspark.sql import functions as F

from pdal_spark.functions.rank import (
    scalable_prefix_sums, scalable_row_number,
)


def test_row_number_matches_global_order(spark):
    df = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(500)],
        "pid long, v double",
    ).repartition(13)
    out = scalable_row_number(df, ["v", "pid"]).collect()
    want = sorted(out, key=lambda r: (r["v"], r["pid"]))
    for rank, row in enumerate(want, start=1):
        assert row["__rn"] == rank


def test_row_number_desc_expression(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "pid long, v double"
    ).repartition(7)
    out = scalable_row_number(df, [F.col("v").desc()]).collect()
    by_rank = {r["__rn"]: r["v"] for r in out}
    assert by_rank[1] == 99.0 and by_rank[100] == 0.0


def test_prefix_sums_signed_values(spark):
    # alternating signs: per-partition cumsum is NOT monotone, so a
    # max-based partition total would be wrong
    rows = [(i, float((-1) ** i * (i % 7 + 1))) for i in range(300)]
    df = spark.createDataFrame(rows, "pid long, v double").repartition(11)
    out = scalable_prefix_sums(
        df, ["pid"], {"s": F.col("v")}, dec="decimal(38,6)"
    ).collect()
    acc = Decimal(0)
    by_rank = {r["__rn"]: r for r in out}
    for rank in range(1, 301):
        r = by_rank[rank]
        acc += Decimal(str(r["v"]))
        assert r["s"] == acc, (rank, r["s"], acc)
