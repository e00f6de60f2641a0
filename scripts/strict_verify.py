"""Driver-faithful gate verification: dtype-SENSITIVE value hash.

Mirrors the grading driver: run every `queries()` entry and its
`oracle_sql()` at sf0.01, sort columns by name, sort rows, hash with
pandas' dtype-sensitive hasher, and compare WITHOUT any astype
coercion (the verify-skill recipe coerces; the real driver does not —
that gap is exactly what bit round 1's expression_stats/fingerprint).

Run:  python scripts/strict_verify.py [sf_dir] [name_prefix...]
Exit 1 on any failure.
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")


def vhash(pdf):
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns):
        pdf = pdf.sort_values(by=sorted(pdf.columns))
    pdf = pdf.reset_index(drop=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(pdf, index=False).values.tobytes()
    ).hexdigest()


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--codegen-only"]
    codegen_only = "--codegen-only" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1:]

    import duckdb

    import __spark_entry__ as E
    from pdal_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    if codegen_only:
        # regression guard: a >64KB generated method would otherwise
        # fall back to interpreted SILENTLY (verify SKILL notes)
        spark.conf.set("spark.sql.codegen.fallback", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osq = E.queries(), E.oracle_sql()
    names = [n for n in qs
             if not only or any(n.startswith(p) for p in only)]
    n_ok = n_rows_only = 0
    fails: list[str] = []
    t0 = time.time()
    for i, name in enumerate(names):
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            fails.append(f"{name}: spark error {e}")
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in osq:
            n_rows_only += 1
            continue
        try:
            dpdf = con.execute(osq[name]).df()
        except Exception as e:
            fails.append(f"{name}: duckdb error {e}")
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if len(spdf) != len(dpdf):
            fails.append(f"{name}: rows {len(spdf)} vs {len(dpdf)}")
            print(f"FAIL {name}: rows {len(spdf)} vs {len(dpdf)}")
        elif vhash(spdf) != vhash(dpdf):
            dt = {c: (str(spdf[c].dtype), str(dpdf[c].dtype))
                  for c in sorted(spdf.columns)
                  if c in dpdf.columns
                  and str(spdf[c].dtype) != str(dpdf[c].dtype)}
            fails.append(f"{name}: hash mismatch (dtype diffs: {dt})")
            print(f"FAIL {name}: hash mismatch (dtype diffs: {dt})")
        else:
            n_ok += 1
        if (i + 1) % 50 == 0:
            print(f"  ... {i + 1}/{len(names)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print(f"strict: ok={n_ok} rows_only={n_rows_only} "
          f"fail={len(fails)} of {len(names)} "
          f"in {time.time() - t0:.0f}s")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
