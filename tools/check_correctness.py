"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, column names, and values
(rows sorted, columns sorted by name — like the driver).  Doubles are
compared BIT-EXACTLY: if it passes here, any sane hash compare passes.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            a = sv.astype(float).to_numpy()
            b = dv.astype(float).to_numpy()
            neq = ~((a == b) | (pd.isna(a) & pd.isna(b)))
            if neq.any():
                i = int(neq.argmax())
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at {i}: "
                    f"{a[i]!r} vs {b[i]!r} (diff {abs(a[i]-b[i]) if not (math.isnan(a[i]) or math.isnan(b[i])) else 'nan'})"
                )
        else:
            neq = ~((sv == dv) | (sv.isna() & dv.isna()))
            if neq.any():
                i = int(neq.to_numpy().argmax())
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at {i}: {sv.iloc[i]!r} vs {dv.iloc[i]!r}"
                )
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as E

    if vanilla:
        # driver-style session: none of our confs, hostile timezone —
        # every query must self-pin its semantics via queries.prep()
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from hdfs_stream_processing_spark import get_spark

        spark = get_spark(cpus=16)
    con = duck_connect(sf_dir)
    qs, oracles = E.queries(), E.oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(spark_pdf) >= 0
            print(f"rows-only {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"   {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n== {n_pass} pass / {n_fail} fail / {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
