"""Deterministic floating-point aggregation helpers.

Summing doubles is order-dependent; Spark accumulates per-partition then
merges in a nondeterministic order, so ``SUM(double)`` can differ between
runs (and between engines) in the last ulps.  For money-valued columns
(fixed 2-decimal inputs) we sum exactly in integer cents: the per-row
double arithmetic is IEEE-reproducible across engines, the integer sum is
associative, and the final divide is a single exact-input operation.  This
also makes results at 100 TB run-to-run stable regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact, order-independent SUM of a fixed-point-valued double column.

    Equivalent oracle SQL:
      SUM(CAST(round(x * 1eS, 0) AS BIGINT)) / 1eS
    """
    c = F.col(col) if isinstance(col, str) else col
    factor = float(10**scale)
    # decimal(38,0) accumulator: a LongType sum would wrap silently past
    # 2^63 cents (~9e16, reachable at 100 TB); decimal sums raise/NULL
    # instead of corrupting, and stay exact.
    cents = F.round(c * F.lit(factor), 0).cast("decimal(38,0)")
    return (F.sum(cents).cast("double") / F.lit(factor)).cast("double")


def money_avg(col: Column | str, scale: int = 2, out_round: int = 6) -> Column:
    """Order-independent AVG built from the exact integer sum.

    The single final division is computed from exact operands, so it is
    bit-identical across engines; ``out_round`` trims it to a comparison-
    friendly precision anyway.
    """
    c = F.col(col) if isinstance(col, str) else col
    factor = float(10**scale)
    cents = F.round(c * F.lit(factor), 0).cast("decimal(38,0)")
    return F.round(
        F.sum(cents).cast("double") / (F.count(cents) * F.lit(factor)), out_round
    ).cast("double")
