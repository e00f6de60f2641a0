"""Dtype audit: DuckDB oracle result dtypes vs Spark gate schemas.

The grading driver's value-hash is dtype-sensitive: an oracle column
that DuckDB materialises as float64 while Spark emits an integer type
hash-mismatches even when every value is identical (DuckDB promotes
``sum(BIGINT)`` to HUGEINT, which pandas renders as float64), and a
DuckDB TIMESTAMP arrives as datetime64[us] while Spark's toPandas
yields datetime64[ns] — the underlying int64 ticks differ by 1000x,
so the hash differs even on equal instants.

This script builds every oracled gate's Spark plan (schema only — no
execution, except a tiny limit(5).toPandas() for gates with temporal
columns) and runs its oracle SQL with ``LIMIT 0`` through DuckDB,
then reports any hash-relevant dtype divergence. Exit code 1 if any
row exists.

Run:  python scripts/dtype_audit.py [sf_dir]
      python scripts/dtype_audit.py --emit [sf_dir]   # regenerate
                                   pdal_spark/oracle_casts.py

With ``--emit`` the audit runs against the RAW oracle SQL (casts
disabled) and writes the per-gate {column: duckdb-cast-type} map to
``pdal_spark/oracle_casts.py``; gate.py wraps those columns in
``CAST(... AS <type>)`` via DuckDB's ``SELECT * REPLACE``:
int<->float -> BIGINT, timestamp-resolution -> TIMESTAMP_NS.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SPARK_INT = {"byte", "short", "integer", "long"}
SPARK_FLOAT = {"float", "double"}


def spark_family(dt: str) -> str:
    if dt in SPARK_INT:
        return "int"
    if dt in SPARK_FLOAT:
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    return dt


def pandas_family(dtype) -> str:
    k = dtype.kind
    return {"i": "int", "u": "int", "f": "float", "O": "object",
            "b": "bool", "M": "datetime"}.get(k, str(dtype))


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--emit"]
    emit = "--emit" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    import duckdb

    import __spark_entry__ as E
    from pdal_spark import gate as gate_mod
    from pdal_spark.session import get_spark

    if emit:
        # audit the RAW registry SQL so the emitted map is complete
        gate_mod.ORACLE_CASTS = {}

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osq = E.queries(), E.oracle_sql()
    bad: list[tuple[str, str, str, str, str]] = []  # +cast type
    errs: list[tuple[str, str]] = []
    for name, sql in sorted(osq.items()):
        try:
            sdf = qs[name](spark, sf_dir)
            sschema = {
                f.name: spark_family(f.dataType.typeName())
                for f in sdf.schema.fields
            }
            temporal = [f.name for f in sdf.schema.fields
                        if f.dataType.typeName() in ("timestamp",
                                                     "timestamp_ntz",
                                                     "date")]
            spd = (sdf.limit(5).toPandas() if temporal else None)
        except Exception as e:  # pragma: no cover - diagnostics
            errs.append((name, f"spark: {e}"))
            continue
        try:
            ddf = con.execute(f"SELECT * FROM ({sql}) _q LIMIT 0").df()
        except Exception as e:  # pragma: no cover - diagnostics
            errs.append((name, f"duckdb: {e}"))
            continue
        for col in ddf.columns:
            if col not in sschema:
                continue
            dfam, sfam = pandas_family(ddf[col].dtype), sschema[col]
            if {dfam, sfam} == {"int", "float"}:
                # fix only int-on-spark / float-on-duckdb; the reverse
                # (spark float vs duckdb int) would need a DOUBLE cast
                cast = "BIGINT" if sfam == "int" else "DOUBLE"
                bad.append((name, col, sfam, dfam, cast))
            elif col in (temporal or []):
                sdt = str(spd[col].dtype)
                ddt = str(ddf[col].dtype)
                if sdt != ddt:
                    if sdt == "datetime64[ns]" and ddt.startswith(
                            "datetime64"):
                        bad.append((name, col, sdt, ddt, "TIMESTAMP_NS"))
                    else:
                        bad.append((name, col, sdt, ddt, "MANUAL"))

    for name, col, sfam, dfam, cast in bad:
        print(f"MISMATCH {name}.{col}: spark={sfam} duckdb={dfam}"
              f" -> {cast}")
    for name, msg in errs:
        print(f"ERROR {name}: {msg}")
    print(f"checked={len(osq)} mismatches={len(bad)} errors={len(errs)}")
    spark.stop()

    if emit:
        casts: dict[str, dict[str, str]] = {}
        for name, col, _s, _d, cast in bad:
            if cast != "MANUAL":
                casts.setdefault(name, {})[col] = cast
        lines = [
            '"""AUTO-GENERATED by scripts/dtype_audit.py --emit. Do not hand-edit.',
            "",
            "Per-gate oracle columns whose DuckDB pandas dtype diverges from",
            "the Spark gate's in a hash-relevant way: HUGEINT sums / float",
            "division render float64 while Spark emits int (-> CAST AS",
            "BIGINT; values exactly integral on both sides), and DuckDB",
            "TIMESTAMP arrives as datetime64[us] vs Spark's [ns] (-> CAST AS",
            "TIMESTAMP_NS). gate.py applies these via SELECT * REPLACE so",
            "the driver's dtype-sensitive value hash compares like for like.",
            '"""',
            "",
            "ORACLE_CASTS: dict[str, dict[str, str]] = {",
        ]
        for name in sorted(casts):
            inner = ", ".join(f"{c!r}: {t!r}"
                              for c, t in sorted(casts[name].items()))
            lines.append(f"    {name!r}: {{{inner}}},")
        lines.append("}")
        path = "/root/repo/pdal_spark/oracle_casts.py"
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {path}: {len(casts)} gates, "
              f"{sum(len(v) for v in casts.values())} columns")
        return 0
    return 1 if bad or errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
