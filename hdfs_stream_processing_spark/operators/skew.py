"""Skew-handling operators: salting for hot keys (SURVEY §4).

AQE's skew-join handling (on in session.py) covers joins; aggregation
skew on a pathological hot key is handled here explicitly: a two-phase
salted aggregate spreads one hot group over N reducers, then merges.
Result-identical to the direct aggregate (the oracle proves it) — only
the physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_sum(
    df: DataFrame,
    keys: list[str],
    cents_col: Column,
    alias: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """SUM by key, executed as salt → partial agg → final agg.

    Phase 1 groups by (keys, salt) — a hot key's rows split across
    ``salt_buckets`` reducers; phase 2 merges the ≤ salt_buckets partial
    rows per key.  The salt is a deterministic spread over input rows
    (monotonically_increasing_id % buckets — per-partition sequential,
    no RNG); correctness never depends on WHICH bucket a row lands in,
    only that the integer partials re-add exactly (they do: exact cents).
    """
    salted = df.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(cents_col).alias("_partial_cents"),
        F.count(F.lit(1)).alias("_partial_n"),
    )
    return partial.groupBy(*keys).agg(
        (F.sum("_partial_cents").cast("double") / F.lit(100.0)).alias(alias),
        F.sum("_partial_n").alias("n"),
    )
