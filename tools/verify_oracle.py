"""Local replica of the driver's DuckDB-oracle differential gate.

Runs every ``queries()`` entry in Spark and its ``oracle_sql()`` twin in
DuckDB on the same parquet, then compares row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted,
floats rounded to 6dp before hashing to absorb summation-order noise —
queries themselves already round displayed doubles to 2dp).

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")


def canonical_hash(df: pd.DataFrame) -> tuple[int, tuple, str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        # normalize datetimes to ISO strings (tz/precision differences)
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]").astype(str)
        df[c] = df[c].astype(str)
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(df), tuple(cols), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from bikes_data_warehouse_etl_spark.session import get_spark
    from bikes_data_warehouse_etl_spark.sources.parquet import TABLES

    spark = get_spark("verify-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only check, {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetch_df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        sn, sc, sh = canonical_hash(sdf)
        on_, oc, oh = canonical_hash(odf)
        if (sn, sc, sh) == (on_, oc, oh):
            print(f"PASS {name}: {sn} rows, hash {sh}")
        else:
            print(f"FAIL {name}: spark=({sn},{sc},{sh}) duckdb=({on_},{oc},{oh})")
            if sn == on_ and sc == oc:
                # show first differing rows for debugging
                s = sdf[sorted(sdf.columns)].astype(str)
                o = odf[sorted(odf.columns)].astype(str)
                srows = sorted(map(tuple, s.itertuples(index=False, name=None)))
                orows = sorted(map(tuple, o.itertuples(index=False, name=None)))
                for a, b in zip(srows, orows):
                    if a != b:
                        print(f"  spark : {a}\n  duckdb: {b}")
                        break
            failures.append(name)
    print(f"\n{n_run - len(failures)}/{n_run} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
