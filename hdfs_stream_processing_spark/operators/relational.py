"""Projection / filter / join / set / order operators (SURVEY §2.2-2.5).

Reference sites re-expressed Spark-first:
- exclusion projection: data_generator/dataframe_to_kafka.py:88-90
- add literal column:   utils/spark_transforming.py:114
- any-null row drop:    utils/spark_transforming.py:145
- CASE classification:  spark_streaming/convert-to-elasticsearch.py:120-134
- row limit:            data_generator/dataframe_to_kafka.py:94-95
- multi-way align join: utils/spark_transforming.py:97-113
- union of room tables: utils/spark_transforming.py:123-131
- global sort:          utils/spark_transforming.py:143
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project_exclude(df: DataFrame, exclude: list[str]) -> DataFrame:
    """Keep every column except ``exclude`` (order-preserving).

    The reference builds this list driver-side then selects
    (dataframe_to_kafka.py:84-90); ``df.drop`` is the same logical plan —
    Catalyst prunes the excluded columns out of the scan entirely
    (check ReadSchema in the explain output).
    """
    return df.drop(*exclude)


def add_lit(df: DataFrame, name: str, value) -> DataFrame:
    """Constant column (utils/spark_transforming.py:114's room tag)."""
    return df.withColumn(name, F.lit(value))


def drop_nulls(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Any-null row filter — ``df.dropna()`` semantics
    (utils/spark_transforming.py:145).  Compiles to a plain Filter of
    IsNotNull conjuncts, so it pushes down to the parquet scan.
    """
    return df.na.drop("any", subset=subset)


def case_when(
    df: DataFrame,
    name: str,
    branches: list[tuple[Column, str]],
    default: str,
) -> DataFrame:
    """Multi-branch CASE classification (the reference's ``if_movement``
    derivation, convert-to-elasticsearch.py:120-134)."""
    expr = None
    for cond, label in branches:
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return df.withColumn(name, expr.otherwise(F.lit(default)))


def limit_n(df: DataFrame, n: int) -> DataFrame:
    """Row limit (dataframe_to_kafka.py:94-95).  NOTE: LIMIT without an
    ORDER BY returns an arbitrary subset on any distributed engine;
    deterministic callers should sort first (see top_k)."""
    return df.limit(n)


def multi_join(
    dfs: list[DataFrame],
    keys: list[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Chained equi-joins — the reference's core semantic: aligning 5
    co-timestamped sensor streams with 4 inner joins on ts_min_bignt
    (utils/spark_transforming.py:97-113).

    ``keys[i]`` is (left_col_of_accumulated, right_col_of_dfs[i+1]).
    Catalyst picks broadcast-hash for small right sides (all 2-column
    sensor frames and TPC-H dims are far under the autoBroadcast
    threshold) and sort-merge otherwise; AQE re-plans at runtime from
    actual sizes, so the same code scales from 60k rows to 100 TB.
    """
    acc = dfs[0]
    for right, (lk, rk) in zip(dfs[1:], keys):
        acc = acc.join(right, on=acc[lk] == right[rk], how=how)
    return acc


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """Column-name-aligned UNION ALL over N inputs
    (utils/spark_transforming.py:123-131 normalizes column *order* by
    re-selecting; ``unionByName`` is that, without positional fragility).

    At scale prefer a single multi-path scan with a partition column over
    unioning per-directory DataFrames — Spark plans a Union of N scans
    here, which is fine for tens of inputs but not thousands.
    """
    return reduce(lambda a, b: a.unionByName(b), dfs)


def sort_by(df: DataFrame, cols: list[str], ascending: bool = True) -> DataFrame:
    """Global sort (utils/spark_transforming.py:143) — a range-partition
    shuffle.  At 100 TB a global total order is almost never the real
    requirement; prefer ``df.sortWithinPartitions`` + partitioned layout.
    Kept as an operator because the capability exists in the reference.
    """
    return df.orderBy(*[F.col(c).asc() if ascending else F.col(c).desc() for c in cols])


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k.  Spark plans TakeOrderedAndProject: each
    partition keeps a k-heap, the driver merges — no global sort shuffle,
    O(k) memory per partition.  Pass a total order (tiebreak on a unique
    key) for engine-independent determinism.
    """
    return df.orderBy(*order).limit(k)
