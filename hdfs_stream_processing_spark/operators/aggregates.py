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


def heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 3,
) -> DataFrame:
    """Exact top-``k`` most frequent values per group, deterministic
    rank (count DESC, value ASC tiebreak — a total order, so the same
    rows win on every engine/partitioning).

    Two-level shape: hash-aggregate counts on (group, value) — partial
    aggregation does the heavy lifting map-side — then a per-group
    window over the (much smaller) distinct-value counts.  At 100 TB
    the window input is |groups|×|distinct values per group| rows, not
    the fact table; for an unbounded value domain cap it first or use a
    sketch (this operator is the exact path).
    """
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("n").desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _suff_stats(
    df: DataFrame, keys: list[str], x: Column, y: Column, wide: bool
) -> DataFrame:
    """The shared (n, Σx, Σy, Σxy, Σx², Σy²) aggregate behind
    :func:`corr_exact` and :func:`ols_exact`.  ``wide=False`` accumulates
    in long (fastest, codegen'd); ``wide=True`` casts the operands to
    decimal(38,0) FIRST so every per-row product and every running sum is
    128-bit — exact far past the int64 range, for the sf100-per-group
    regime where y²·rows alone exceeds 2⁶³."""
    if wide:
        dec = "decimal(38,0)"
        x, y = x.cast(dec), y.cast(dec)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )


def corr_exact(
    df: DataFrame,
    keys: list[str],
    x_cents: Column,
    y_cents: Column,
    wide: bool = False,
) -> DataFrame:
    """Pearson correlation per group from EXACT integer sums.

    Spark's native ``corr`` streams Welford-style partial states whose
    float accumulation is partition-order-dependent — it can never
    hash-match an oracle.  Here the five sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) are exact integer aggregates of
    caller-provided integer operands (e.g. cents), and the final
    correlation is one double expression over exact operands —
    bit-identical on every engine and partitioning.

    Bounds: the long accumulators hold while
    max(x², y², |x·y|) · rows_per_group < 2⁶³ — at TPC-H dollar scales
    (y ≲ 10⁵, y² ≲ 10¹⁰) that is ~10⁸ rows per group, i.e. roughly
    sf100 for a 3-group split of lineitem.  Past that, pass
    ``wide=True``: the per-row accumulators switch to decimal(38,0)
    (128-bit, still exact, ~2× slower map-side) and the result is
    bit-identical to the narrow path wherever both are in range —
    asserted by tests/test_operators.py.
    """
    agg = _suff_stats(df, keys, x_cents, y_cents, wide)
    n = F.col("n").cast("double")
    cov = F.col("sxy").cast("double") / n - (
        F.col("sx").cast("double") / n
    ) * (F.col("sy").cast("double") / n)
    vx = F.col("sxx").cast("double") / n - (
        F.col("sx").cast("double") / n
    ) * (F.col("sx").cast("double") / n)
    vy = F.col("syy").cast("double") / n - (
        F.col("sy").cast("double") / n
    ) * (F.col("sy").cast("double") / n)
    denom = F.sqrt(F.greatest(vx, F.lit(0.0))) * F.sqrt(F.greatest(vy, F.lit(0.0)))
    return agg.select(
        *keys,
        F.col("n"),
        F.when(denom > F.lit(0.0), cov / denom).alias("corr"),
    )


def corr_matrix(
    df: DataFrame, cols: dict[str, Column], wide: bool = False
) -> DataFrame:
    """Every pairwise Pearson correlation of ``cols`` (name → exact
    integer Column) from ONE aggregate pass → long-format
    ``(col_a, col_b, n, corr)``.

    The single groupBy computes all sufficient statistics at once —
    n, per-column Σx and Σx², per-pair Σxy — so m columns cost one scan
    and one 1-row exchange instead of m(m-1)/2 separate corr() jobs;
    the m² pair rows then explode out of that single row.  Same
    exactness contract as :func:`corr_exact`: integer sums, one double
    expression at the end, bit-identical on any engine/partitioning;
    same ``wide`` escape hatch once sums outgrow long.
    """
    names = list(cols)
    if wide:  # 128-bit accumulators past int64 range, as _suff_stats
        cols = {k: c.cast("decimal(38,0)") for k, c in cols.items()}
    aggs = [F.count(F.lit(1)).alias("n")]
    for a in names:
        aggs.append(F.sum(cols[a]).alias(f"s_{a}"))
        aggs.append(F.sum(cols[a] * cols[a]).alias(f"ss_{a}"))
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            aggs.append(F.sum(cols[a] * cols[b]).alias(f"p_{a}_{b}"))
    agg = df.agg(*aggs)

    n = F.col("n").cast("double")

    def var(a: str) -> Column:
        mean = F.col(f"s_{a}").cast("double") / n
        return F.col(f"ss_{a}").cast("double") / n - mean * mean

    def corr(a: str, b: str) -> Column:
        cov = F.col(f"p_{a}_{b}").cast("double") / n - (
            F.col(f"s_{a}").cast("double") / n
        ) * (F.col(f"s_{b}").cast("double") / n)
        denom = F.sqrt(F.greatest(var(a), F.lit(0.0))) * F.sqrt(
            F.greatest(var(b), F.lit(0.0))
        )
        return F.when(denom > F.lit(0.0), cov / denom)

    pairs = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col("n").alias("n"),
            corr(a, b).alias("corr"),
        )
        for i, a in enumerate(names)
        for b in names[i + 1:]
    ]
    return agg.select(F.explode(F.array(*pairs)).alias("pr")).select("pr.*")


def ols_exact(
    df: DataFrame,
    keys: list[str],
    x_int: Column,
    y_int: Column,
    wide: bool = False,
) -> DataFrame:
    """Per-group simple linear regression (OLS y = a·x + b) from EXACT
    integer sufficient statistics → ``(keys…, n, slope, intercept, r2)``.

    Same engine-portability contract as :func:`corr_exact`: Spark's
    native ``regr_slope``/``regr_intercept`` accumulate float partial
    states whose merge order follows the partitioning, so they cannot
    hash-match a single-node oracle.  Here the five sums (n, Σx, Σy,
    Σxy, Σx², Σy²) are exact integer aggregates — order-independent —
    and slope/intercept/R² are each ONE double expression over those
    exact operands, bit-identical on every engine:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)     [null if x constant]
        intercept = (Σy − slope·Σx) / n
        r² = corr(x, y)²                               [null if x or y constant]

    Bounds: the per-row products and their SUMS must fit long
    (|x·y| · rows < 2⁶³ per group).  The second-order terms n·Σy² and
    Σy·Σy exceed 2⁶³ long before the sums do (at TPC-H price scale
    they overflow already at ~10⁵ rows per group), so the final
    numerators/denominators are computed in decimal(38,0) — still
    exact integers, just 128-bit — and only then rounded once to
    double.  The DuckDB oracle mirrors this with HUGEINT; both engines
    correctly round the same exact integer, so results stay
    bit-identical.

    Scale: one partial-aggregated groupBy shuffle carrying six numbers
    per group, whatever the row count; the decimal math runs on the
    handful of post-aggregate rows only.  When even the SUMS outgrow
    long (max(x², y², |x·y|) · rows_per_group ≥ 2⁶³ — roughly sf100 at
    dollar scale), pass ``wide=True`` to accumulate in decimal(38,0)
    throughout, as :func:`corr_exact`.
    """
    agg = _suff_stats(df, keys, x_int, y_int, wide)
    nL = F.col("n")
    nD = nL.cast("double")
    dec = "decimal(38,0)"
    nB, sxB, syB = nL.cast(dec), F.col("sx").cast(dec), F.col("sy").cast(dec)
    # exact 128-bit-integer numerators/denominators, ONE division each
    slope_num = (nB * F.col("sxy").cast(dec) - sxB * syB).cast("double")
    slope_den = (nB * F.col("sxx").cast(dec) - sxB * sxB).cast("double")
    slope = F.when(slope_den > F.lit(0.0), slope_num / slope_den)
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / nD
    vy_den = (nB * F.col("syy").cast(dec) - syB * syB).cast("double")
    r2 = F.when(
        (slope_den > F.lit(0.0)) & (vy_den > F.lit(0.0)),
        (slope_num * slope_num) / (slope_den * vy_den),
    )
    return agg.select(
        *keys,
        nL,
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
