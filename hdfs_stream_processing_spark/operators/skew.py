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


def _check_no_salt(df: DataFrame, side: str) -> None:
    """Salting claims the ``_salt`` column name; silently overwriting a
    user column of that name (then dropping it) would lose data."""
    if "_salt" in df.columns:
        raise ValueError(
            f"{side} input already has a '_salt' column; rename it before salting"
        )


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
    _check_no_salt(df, "salted_group_sum")
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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the BIG side has hot keys: salt the big side,
    replicate the small side once per salt value, join on (key, salt).

    A hot join key puts every one of its rows in a single reducer of a
    shuffled join; AQE's skew-join split only helps sort-merge joins
    and only splits at partition granularity AFTER the skewed exchange
    is materialized.  Salting removes the hot spot in the plan itself:
    the big side's rows for one key spread over ``salt_buckets``
    reducers, and the small side grows by exactly ``salt_buckets`` ×
    |small| rows — acceptable when small is dim-sized but above the
    broadcast threshold (below it, a plain broadcast join needs no
    salt at all).

    The big-side salt is ``monotonically_increasing_id() % buckets``
    (deterministic spread, no RNG — same policy as
    :func:`salted_group_sum`); correctness never depends on which
    bucket a row lands in because the small side carries every bucket.
    Result is row-identical to ``big.join(small, on, how)``.

    Only ``inner`` and ``left`` joins are supported: a right/full outer
    would surface each UNMATCHED small-side row once per replica.

    Caveats: both inputs must be free of a pre-existing ``_salt``
    column (raises — overwriting would drop user data), and non-key
    column names shared by both sides survive as ambiguous duplicates
    in the output, same as a plain ``df.join`` on an expression —
    rename or select before joining.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    _check_no_salt(big, "salted_join big")
    _check_no_salt(small, "salted_join small")
    b = big.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    cond = (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"])
    joined = b.join(s, cond, how)
    return joined.drop(b["_salt"]).drop(s["_salt"]).drop(s[small_key])
