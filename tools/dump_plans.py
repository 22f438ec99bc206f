"""Dump ``.explain("formatted")`` for named queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> <query> [query ...]

The round directory defaults to r15 (override with $SPARK_GRAFT_PLANS_ROUND).
Writes ``plans/<round>/<query>_<suffix>.txt`` (suffix = before|after) with
the formatted physical plan of the DataFrame the query returns, at
sf0.01 (plan SHAPE is scale-invariant; sf0.01 keeps streaming-state
queries quick).  For queries that execute a streaming job to build
their result, the dumped plan is the read over the maintained/result
table — the interesting per-batch plans are asserted in tests, same
convention as tools/plan_audit.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from hdfs_stream_processing_spark import get_spark
    from hdfs_stream_processing_spark import queries as Q

    unknown = [n for n in names if n not in Q.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = Q.QUERIES[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
