"""Multi-dimensional data layout: Z-order (Morton) clustering.

The reference pipeline writes its parquet in arrival order
(/root/reference/spark_streaming/convert-to-minio.py:105-111), so a scan
filtered on anything but time reads every file.  At 100 TB the fix is
interleaved-bit clustering: rows whose key TUPLE is close land in the
same file, so parquet row-group min/max stats prune scans filtered on
ANY prefix-free subset of the layout keys — the same trick Delta/Iceberg
expose as ``OPTIMIZE ... ZORDER BY``.

Everything here is pure built-in integer expressions (whole-stage
codegen, no UDF, no shuffle for the key itself; the write adds exactly
one range repartition).  The bit interleave is deterministic integer
math, so it is oracle-checkable bit-exact in DuckDB (``zorder_key``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_order_key(cols: list[str], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column.

    Bit ``i`` of column ``c`` lands at position ``i * len(cols) + c`` —
    columns must be non-negative integers; values are clamped to
    ``[0, 2^bits)`` so an outlier degrades locality instead of
    corrupting the key.  ``len(cols) * bits`` must stay < 63 (signed
    long).  Shift amounts are data-dependent, so the expression is
    built as SQL text (the Python shiftleft/shiftright API only takes
    literal ints).
    """
    n = len(cols)
    if n < 1:
        raise ValueError("z_order_key needs at least one column")
    if n * bits >= 63:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed long")
    hi = (1 << bits) - 1
    terms = []
    for c, name in enumerate(cols):
        # one clamped temp per column via a nested-select-free trick:
        # repeat the clamp expression — Catalyst CSEs it in codegen.
        clamped = f"least(greatest(CAST({name} AS BIGINT), 0L), {hi}L)"
        # UNROLLED shift-adds, not aggregate(sequence(...)): the
        # higher-order-function form materializes a per-row array and
        # runs an interpreted lambda loop — unrolling keeps the whole
        # key inside flat whole-stage codegen (~5x faster at sf0.1)
        terms.extend(
            f"shiftleft(shiftright({clamped}, {i}) & 1, {i * n + c})"
            for i in range(bits)
        )
    return F.expr(" + ".join(terms))


def sql_z_order_key(cols: list[str], bits: int = 16) -> str:
    """DuckDB mirror of :func:`z_order_key` (same clamp, same bit
    placement) for the oracle."""
    n = len(cols)
    hi = (1 << bits) - 1
    terms = []
    for c, name in enumerate(cols):
        clamped = f"least(greatest(CAST({name} AS BIGINT), 0), {hi})"
        terms.append(
            f"CAST(list_sum(list_transform(generate_series(0, {bits - 1}),"
            f" i -> (({clamped} >> i) & 1) << (i * {n} + {c}))) AS BIGINT)"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    cols: list[str],
    out_dir: str,
    n_files: int = 32,
    bits: int = 16,
    normalize: bool = True,
) -> None:
    """Write ``df`` Z-ordered on ``cols``: one range repartition on the
    Morton key (contiguous z-ranges per output file), sort within each
    file so row groups inside a file are clustered too, drop the key.

    ``normalize`` (default) min-max scales every column to the full
    ``[0, 2^bits)`` range first — without it a narrow-domain column's
    bits sit below a wide-domain column's in the interleave and never
    influence the split (the reason Delta's ZORDER range-normalizes
    too).  The min/max pass is one map-side-partial reduction; at
    100 TB you would feed cached table stats or a sample instead.

    Exactly ONE shuffle either way.  ``n_files`` is the byte-budget
    lever — size it like ``compact_parquet_dir`` does (target ~128 MB
    files at scale).  After this write, a filter on any of ``cols``
    prunes most files via parquet min/max stats instead of scanning
    the directory.
    """
    hi = (1 << bits) - 1
    if normalize:
        stats = df.agg(
            *[F.min(c).alias(f"mn{i}") for i, c in enumerate(cols)],
            *[F.max(c).alias(f"mx{i}") for i, c in enumerate(cols)],
        ).collect()[0]
        zcols = []
        for i, c in enumerate(cols):
            mn, mx = stats[f"mn{i}"], stats[f"mx{i}"]
            if mn is None or mx is None or mx == mn:
                scaled = F.lit(0).cast("long")
            else:
                scaled = F.floor(
                    (F.col(c).cast("double") - F.lit(float(mn)))
                    * F.lit(float(hi))
                    / F.lit(float(mx) - float(mn))
                ).cast("long")
            zcols.append(scaled.alias(f"_zs{i}"))
        df = df.select("*", *zcols)
        key_cols = [f"_zs{i}" for i in range(len(cols))]
    else:
        key_cols = list(cols)
    z = z_order_key(key_cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", *(key_cols if normalize else []))
        .write.mode("overwrite")
        .parquet(out_dir)
    )
