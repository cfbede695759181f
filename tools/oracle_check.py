"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir on
Spark AND its ``oracle_sql()`` on DuckDB (tables pre-registered as
views), then compares row count, column names, and an order-insensitive
value hash (rows sorted, columns sorted by name, floats repr'd).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df_pdf) -> tuple[int, list[str], int]:
    import pandas as pd

    cols = sorted(df_pdf.columns)
    pdf = df_pdf[cols].copy()
    for c in cols:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    rows = []
    for tup in pdf.itertuples(index=False):
        rows.append(tuple(repr(v) for v in tup))
    rows.sort()
    return len(rows), cols, hash(tuple(rows))


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from sparkspatial.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spdf = sdf.toPandas()
        if name not in oracles:
            print(f"{name:32s} rows={len(spdf):8d}  (rows-only, no oracle)")
            continue
        opdf = con.execute(oracles[name]).df()
        sn, sc, sh = normalize(spdf)
        on, oc, oh = normalize(opdf)
        ok = (sn == on) and (sc == oc) and (sh == oh)
        status = "OK " if ok else "FAIL"
        print(f"{name:32s} {status} spark_rows={sn} duck_rows={on} "
              f"cols={'=' if sc == oc else f'{sc} vs {oc}'} "
              f"hash={'=' if sh == oh else 'MISMATCH'}")
        if not ok:
            failures += 1
            if sc == oc and sn and on:
                merged = spdf[sorted(spdf.columns)].merge(
                    opdf[sorted(opdf.columns)], how="outer", indicator=True,
                    on=sorted(spdf.columns))
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(10).to_string())
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
