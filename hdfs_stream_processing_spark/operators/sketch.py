"""Count-Min Sketch as DataFrame state (frequency estimation at scale).

A CMS summarizes item frequencies in ``depth × width`` integer cells:
cell(i, h_i(item)) accumulates every occurrence, a point estimate is
the MIN over the depth rows — always an over-estimate, within
``e/width · N`` of truth with probability ``1 - e^-depth``.  At 100 TB
the sketch (a few KB) replaces the unbounded distinct-item count table
wherever an approximate frequency is enough — and two sketches MERGE by
cell-wise addition, so it composes with the incremental-rollup
machinery (``rollup_merge`` on (row, bucket)) and per-partition
partials combine map-side.

Everything here is exact integer arithmetic over md5-derived hash
buckets — fully deterministic and engine-portable, so a sketch built
here hash-compares bit-exact against one rebuilt in ANSI SQL (the
cms_topk oracle does exactly that).  The approximation is in the
ESTIMATE's relation to truth, not in any nondeterminism.

No counterpart in the reference (its analytics are exact counts);
modeled on the standard Cormode-Muthukrishnan construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(item: Column | str, row: int, width: int) -> Column:
    """Hash row ``row``'s bucket for an item: first 8 hex chars of
    md5(row || '|' || item) as an unsigned 32-bit int, mod width —
    the same expression an oracle can write in any SQL dialect."""
    c = F.col(item) if isinstance(item, str) else item
    h = F.md5(F.concat(F.lit(f"{row}|"), c.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast("int")


def cms_bucket_sql(item_expr: str, row: int, width: int) -> str:
    """DuckDB-side mirror of :func:`cms_bucket` (same md5 prefix, same
    unsigned arithmetic) for oracle SQL construction."""
    return (
        f"CAST(('0x' || substr(md5('{row}|' || CAST({item_expr} AS VARCHAR)), 1, 8))"
        f"::UBIGINT::BIGINT % {width} AS INT)"
    )


def cms_build(
    counts: DataFrame,
    item_col: str,
    count_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build a sketch from PRE-AGGREGATED ``(item, count)`` rows →
    ``(row, bucket, total)`` cells (missing cells are zero).

    Input is the exact partial count table, not the raw stream: the
    heavy token shuffle happens once in the caller's aggregate; the
    sketch projection is one narrow explode (×depth on the already
    distinct items) plus one aggregate over at most depth × width
    groups — map-side partials make the exchange carry cells, not
    items."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                cms_bucket(item_col, i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    exploded = counts.select(
        F.explode(pairs).alias("rb"), F.col(count_col).alias("_n")
    )
    return (
        exploded.select("rb.row", "rb.bucket", "_n")
        .groupBy("row", "bucket")
        .agg(F.sum("_n").alias("total"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each item's frequency: min over the sketch's
    depth cells.  The sketch (≤ depth × width rows) broadcasts; absent
    cells count as zero via the left join's coalesce.  Adds ``est``."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                cms_bucket(item_col, i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    exploded = items.select(item_col, F.explode(pairs).alias("rb")).select(
        item_col, "rb.row", "rb.bucket"
    )
    joined = exploded.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("total"), F.lit(0))).alias("est")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of identical (depth, width): cell-wise sum —
    the property that makes CMS streamable and tree-reducible (it is
    exactly ``rollup_merge`` on the cell key)."""
    from hdfs_stream_processing_spark.operators.incremental import rollup_merge

    return rollup_merge(a, b, ["row", "bucket"], ["total"])
