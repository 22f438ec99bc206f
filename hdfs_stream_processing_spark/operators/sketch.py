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


# ------------------------------------------------------------------------
# HyperLogLog with explicit, engine-portable registers.  Spark's native
# approx_count_distinct is correct but its sketch is opaque (rows-only
# verification); building the registers from md5-derived hashes makes
# the ENTIRE construction deterministic and re-derivable in ANSI SQL —
# the estimate's only float op is one final division of exact integers.


def hll_registers(
    df: DataFrame, item_col: str, b: int = 6, rho_bits: int = 48
) -> DataFrame:
    """HLL register table for the distinct items of ``item_col`` →
    ``(bucket, max_rho)``, bucket in [0, 2^b), rho in [1, rho_bits+1].

    bucket = first 8 md5 hex chars (uint32) mod 2^b; rho = position of
    the first 1-bit in the NEXT 12 hex chars (48 bits), i.e.
    ``rho_bits + 1 - bit_length(v)`` with the all-zero word mapping to
    ``rho_bits + 1``.  bit_length is ``length(conv(v, 10, 2))`` — the
    same digits ``bin(v)`` yields in DuckDB, so an oracle rebuilds the
    registers bit-exactly.

    Scale: one exchange on the bucket key (≤ 2^b groups) after map-side
    partial max — input can be the raw column; the distinct is implicit
    in max().  Registers from disjoint partitions merge by MAX — the
    HLL mergeability property (pytest-pinned), same shape as cms_merge.
    """
    c = F.col(item_col).cast("string")
    h = F.md5(c)
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % (1 << b)).cast("int")
    v = F.conv(F.substring(h, 9, 12), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(rho_bits + 1))
        .otherwise(F.lit(rho_bits + 1) - F.length(F.conv(v, 10, 2)))
        .cast("int")
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge register tables of identical geometry: bucket-wise MAX."""
    return (
        a.unionByName(b).groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, b: int = 6, rho_bits: int = 48) -> float:
    """Cardinality estimate from a register table.

    The harmonic denominator is computed as the EXACT integer
    ``sum(2^(rho_bits+1-max_rho)) + empty·2^(rho_bits+1)`` (every term a
    power of two scaled to a common 2^(rho_bits+1) denominator — no
    float-sum order dependence), then one double division applies the
    alpha_m bias constant.  Standard HLL small-range regime applies:
    for n ≲ 2.5·m prefer linear counting (``empty > 0`` branch below,
    the Flajolet et al. correction).
    """
    m = 1 << b
    scale = 1 << (rho_bits + 1)
    row = registers.agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {rho_bits + 1} - max_rho)")
        ).alias("s"),
        F.count(F.lit(1)).alias("filled"),
    ).collect()[0]
    empty = m - row["filled"]
    denom_scaled = (row["s"] or 0) + empty * scale
    alpha = 0.7213 / (1 + 1.079 / m)  # standard alpha_m for m >= 128; ok small m
    raw = alpha * m * m * scale / denom_scaled
    if raw <= 2.5 * m and empty > 0:
        import math

        return m * math.log(m / empty)  # linear counting, small-range
    return raw


# ------------------------------------------------------------------------
# Bloom filter as a (bit-position) DataFrame — the third portable sketch
# (CMS: frequencies, HLL: cardinality, Bloom: membership).  Spark's
# runtime bloom-filter join injection is asserted elsewhere
# (tests/test_plans.py); this is the USER-level primitive for shipping a
# compact membership summary between pipeline stages — e.g. "which join
# keys exist on the other side" at 100 TB, where the exact key set is
# too big to broadcast but its bloom is a few KB.


def bloom_bits(
    keys: DataFrame, key_col: str, n_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Build the filter: the DISTINCT bit positions set by hashing each
    key ``k`` ways (md5-derived, same portable scheme as cms_bucket) →
    a single-column ``(bit)`` table, at most ``n_bits`` rows.  Exact
    integers from deterministic hashes: an oracle rebuilds it."""
    pos = F.array(*[cms_bucket(key_col, i, n_bits) for i in range(k)])
    return keys.select(F.explode(pos).alias("bit")).distinct()


def bloom_probe(
    df: DataFrame, col: str, bits: DataFrame, n_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Keep the rows of ``df`` whose ``col`` MIGHT be in the key set:
    all ``k`` bit positions present (no false negatives; false-positive
    rate ≈ (1 - e^(-k·n/m))^k).  The bit table broadcasts; the probe is
    a narrow explode + broadcast join + per-row count — no shuffle of
    ``df`` itself beyond the final group on its own row identity, which
    Spark plans as a broadcast semi-join chain when ``k`` literal
    columns are used instead (small k unrolled below)."""
    out = df
    for i in range(k):
        out = out.join(
            F.broadcast(bits.withColumnRenamed("bit", f"_b{i}")),
            cms_bucket(col, i, n_bits) == F.col(f"_b{i}"),
            "left_semi",
        )
    return out


def hll_grouped_registers(
    df: DataFrame,
    item_col: str,
    group_cols: list[str],
    b: int = 6,
    rho_bits: int = 48,
) -> DataFrame:
    """Per-group HLL registers → ``(*group_cols, bucket, max_rho)`` —
    one sketch per group in a single pass (the "distinct users per
    segment" shape).  Exchange carries at most groups × 2^b rows after
    map-side partial max; merging two loads' tables is MAX on the full
    key, exactly :func:`hll_merge` with the group in the key."""
    c = F.col(item_col).cast("string")
    h = F.md5(c)
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % (1 << b)).cast("int")
    v = F.conv(F.substring(h, 9, 12), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(rho_bits + 1))
        .otherwise(F.lit(rho_bits + 1) - F.length(F.conv(v, 10, 2)))
        .cast("int")
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )
