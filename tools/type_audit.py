"""Schema-type audit: every query's Spark output types vs its DuckDB
oracle's types.  A width/type mismatch (int vs BIGINT, float vs DOUBLE)
is invisible to a value-compare but can break a typed hash comparator —
this catches it before the driver does.

Usage: python tools/type_audit.py [sf_dir]   (exit 1 on any mismatch)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: (duckdb type, spark simpleString) pairs considered equivalent.
COMPATIBLE = {
    ("BIGINT", "bigint"),
    ("INTEGER", "int"),
    ("DOUBLE", "double"),
    ("VARCHAR", "string"),
    ("TIMESTAMP", "timestamp"),
    ("TIMESTAMP", "timestamp_ntz"),
    ("TIMESTAMP_NS", "timestamp"),
    ("TIMESTAMP_NS", "timestamp_ntz"),
    ("FLOAT", "float"),
    ("BOOLEAN", "boolean"),
    # NOTE: HUGEINT/UBIGINT are deliberately NOT listed as compatible with
    # bigint.  The driver's value hash is typed: DuckDB SUM(INTEGER) yields
    # HUGEINT (int128) which hash-mismatches Spark's BIGINT even when every
    # value is equal (this was the round-2 multi_join failure).  Any oracle
    # producing HUGEINT must CAST(... AS BIGINT).
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as E
    from hdfs_stream_processing_spark import get_spark

    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    issues = 0
    for name, sql in E.oracle_sql().items():
        rel = con.sql(sql)
        duck = dict(zip(rel.columns, [str(t) for t in rel.types]))
        st = {f.name: f.dataType.simpleString() for f in qs[name](spark, sf_dir).schema.fields}
        for col, dt in duck.items():
            s = st.get(col)
            if (dt, s) not in COMPATIBLE and dt.lower() != s:
                print(f"MISMATCH {name}.{col}: duck={dt} spark={s}")
                issues += 1
    print(f"type audit: {issues} mismatches across {len(E.oracle_sql())} oracled queries")
    return 1 if issues else 0


if __name__ == "__main__":
    sys.exit(main())
