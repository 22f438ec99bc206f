"""Window-function operators (SURVEY §2.7).

Absent from the reference but required by its capability surface
(time-series analytics over the aligned sensor table that Kibana provided).
Both operators shuffle once on the partition keys and sort within
partitions — no global sort, so they scale with the number of distinct
partition keys, not total rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _win(partition_by: list[str], order_by: list[Column]):
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def window_rank(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    kinds: tuple[str, ...] = ("row_number", "rank", "dense_rank"),
) -> DataFrame:
    """Ranking functions over a partitioned, ordered window.

    Pass a total order (unique tiebreak) if row_number must be
    deterministic across engines/runs.
    """
    w = _win(partition_by, order_by)
    fns = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}
    out = df
    for kind in kinds:
        out = out.withColumn(kind, fns[kind]().over(w))
    return out


def window_running(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    value: Column,
    prefix: str = "running",
) -> DataFrame:
    """Running aggregate + lag/lead over an ordered window.

    The running frame is rowsBetween(unboundedPreceding, currentRow);
    Spark evaluates it incrementally per partition — O(rows), not
    O(rows²).
    """
    w = _win(partition_by, order_by)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn(f"{prefix}_sum", F.sum(value).over(running))
        .withColumn(f"{prefix}_count", F.count(F.lit(1)).over(running))
        .withColumn("prev_value", F.lag(value, 1).over(w))
        .withColumn("next_value", F.lead(value, 1).over(w))
    )
