"""Aggregation operators (SURVEY §2.6).

The reference delegates all aggregation to Kibana dashboards over the ES
index (README.md:9; mapping convert-to-elasticsearch.py:42-56) — the only
aggregate it executes itself is a scalar ``df.count()``
(data_generator/dataframe_to_kafka.py:101).  Here the surface is native:
hash aggregation with map-side partial aggregates (Catalyst plans
partial+final automatically), HLL sketches for distinct counts at scale,
and rollup/cube for the dashboard-style slicing.

Money-valued doubles aggregate through exact integer cents
(functions/detmath.py) so results are order-independent — bit-identical
run to run, partitioning to partitioning, and engine to engine (the DuckDB
oracle computes the same integers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_rows(df: DataFrame) -> DataFrame:
    """Scalar row count as a 1-row DataFrame (dataframe_to_kafka.py:101
    used ``df.count()`` on the driver; keeping it a DataFrame lets it
    compose and avoids an eager action)."""
    return df.agg(F.count(F.lit(1)).alias("n"))


def group_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """Grouped aggregation — the Kibana-dashboard semantic, natively.

    Plans as HashAggregate(partial) → shuffle on keys → HashAggregate
    (final): the map-side combine means shuffle volume is O(groups), not
    O(rows) — the property that makes this work at 100 TB.
    """
    return df.groupBy(*keys).agg(*aggs)


def count_distinct(df: DataFrame, cols: list[str], alias: str = "n_distinct") -> DataFrame:
    """Exact COUNT(DISTINCT cols) — expands to a two-phase aggregate."""
    return df.agg(F.count_distinct(*[F.col(c) for c in cols]).alias(alias))


def approx_distinct(
    df: DataFrame, col: str, rsd: float = 0.05, alias: str = "n_approx"
) -> DataFrame:
    """HyperLogLog++ distinct count.  At 100 TB this is the default:
    fixed-size sketch per partition, no exact-distinct shuffle explosion;
    ``rsd`` trades memory for error."""
    return df.agg(F.approx_count_distinct(col, rsd).alias(alias))


def rollup_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """ROLLUP grouping-sets aggregate (subtotals + grand total), the
    drill-down shape dashboards want.  Spark plans a single Expand +
    hash aggregate — one pass over the data for all levels."""
    return df.rollup(*keys).agg(*aggs)
