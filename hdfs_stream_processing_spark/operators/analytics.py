"""Event-stream analytics: sessionization, funnels, retention cohorts.

The reference pipeline ships raw classified events to Elasticsearch and
leaves analysis to Kibana dashboards; these operators compute the three
dashboard staples natively, so the capability the reference delegated
to its sink is part of the engine (same rationale as
``operators/text.py`` replacing the ES analyzer chain).

Scale design: all three are built on per-key windows or hash
aggregates — one shuffle on ``user`` (or (user, day)), no self-joins,
no collects.  Key skew is the usual story: a bot user with millions of
events owns one partition's worth of window work; salt or cap upstream
(``operators/skew.py``) if a key exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sessionize",
    "funnel_steps",
    "funnel_conversion_lags",
    "retention_cohorts",
    "anomaly_zscore",
]


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap since the
    user's previous event STRICTLY exceeds ``gap_minutes`` (mirrors
    Spark ``session_window``'s closed boundary: an event exactly ``gap``
    after the last still extends the session).

    Adds ``session_idx`` (0-based per user, in time order) and
    ``session_id`` (``user:idx``, globally unique).  One shuffle (the
    per-user window); the running sum over the new-session flag is the
    standard gaps-and-islands construction — no self-join.  Pass
    ``tiebreak_cols`` (e.g. the event id) whenever two events can share
    a timestamp — without a total order the lag/flag assignment is
    partition-order arbitrary.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_session = (
        prev.isNull() | (F.unix_micros(F.col(ts_col)) - prev > F.lit(gap_us))
    ).cast("long")
    run = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    idx = F.sum(new_session).over(run) - F.lit(1)
    return df.select(
        "*",
        idx.alias("session_idx"),
        F.concat_ws(
            ":", F.col(user_col).cast("string"), idx.cast("string")
        ).alias("session_id"),
    )


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel: for each user, the earliest time of step 1, the
    earliest step-2 event STRICTLY AFTER that, and so on.  Returns one
    row per user with ``t_<step>`` timestamps (null once the funnel
    breaks) and ``stage`` = number of steps completed.

    Each step is one hash aggregate on ``user`` followed by a join back
    to the events of the next step — every stage keys on the SAME
    column, so the exchanges line up (co-partitioned joins, no
    broadcast needed, no self-join blowup).  Steps are sequential by
    definition; len(steps) is small and fixed (funnels are 3-5 stages),
    so the chain depth is bounded.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ts, u, ty = F.col(ts_col), F.col(user_col), F.col(type_col)
    # stage 1: earliest occurrence of the first step
    cur = (
        df.where(ty == F.lit(steps[0]))
        .groupBy(user_col)
        .agg(F.min(ts).alias(f"t_{steps[0]}"))
    )
    for prev_step, step in zip(steps, steps[1:]):
        nxt = df.where(ty == F.lit(step)).select(
            u.alias(user_col), ts.alias("_ts")
        )
        # conditional min INSIDE the aggregate (not a post-join filter):
        # a user whose next-step events are all too early must survive
        # with a null t_<step>, not vanish from the funnel table
        cur = (
            cur.join(nxt, user_col, "left")
            .groupBy(*cur.columns)
            .agg(
                F.min(
                    F.when(F.col("_ts") > F.col(f"t_{prev_step}"), F.col("_ts"))
                ).alias(f"t_{step}")
            )
        )
    # stage = deepest step reached; building forward means the LAST
    # (deepest) when() wraps outermost and wins
    stage: Column = F.lit(0)
    for i, step in enumerate(steps):
        stage = F.when(F.col(f"t_{step}").isNotNull(), F.lit(i + 1)).otherwise(stage)
    return cur.select(user_col, *[f"t_{s}" for s in steps], stage.alias("stage"))


def funnel_conversion_lags(
    funnel_df: DataFrame,
    steps: list[str],
) -> DataFrame:
    """Time-to-convert per funnel transition: over the per-user funnel
    table (:func:`funnel_steps` output), the count of users who made
    each consecutive transition and the exact p50/p90 of the time it
    took them.

    Gaps are exact integer MICROSECONDS (``unix_micros`` difference —
    the funnel guarantees strict ordering, so gaps are positive);
    percentiles use Spark ``percentile`` ((n-1)p interpolation, same as
    DuckDB ``quantile_cont``) and are divided to seconds as one double
    op — bit-portable end-to-end.

    Scale: one narrow explode of len(steps)-1 structs per user row (the
    funnel table is per-user, already small), then ONE hash aggregate on
    the transition key — len(steps)-1 groups.  The exact percentile
    materializes per-group gap arrays; at extreme user counts swap in
    approx_percentile (t-digest) per the same trade-off as
    queries.percentiles.
    """
    if len(steps) < 2:
        raise ValueError("need at least two steps to measure a transition")
    pairs = [
        F.struct(
            F.lit(f"{a}->{b}").alias("transition"),
            (
                F.unix_micros(F.col(f"t_{b}")) - F.unix_micros(F.col(f"t_{a}"))
            ).alias("gap_us"),
        )
        for a, b in zip(steps, steps[1:])
    ]
    gaps = (
        funnel_df.select(F.explode(F.array(*pairs)).alias("p"))
        .select("p.transition", "p.gap_us")
        .where(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("transition").agg(
        F.count(F.lit(1)).alias("n_converted"),
        (F.expr("percentile(gap_us, 0.5)") / F.lit(1e6)).alias("p50_s"),
        (F.expr("percentile(gap_us, 0.9)") / F.lit(1e6)).alias("p90_s"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day;
    for each (cohort_day, day_offset), how many of the cohort's users
    were active.  The day-0 cell is the cohort size.

    Two hash aggregates and one co-partitioned join on ``user`` — the
    activity branch is explicitly partitioned by ``user`` so the
    (user, day) distinct runs on that partitioning (hash(user) clusters
    every (user, day) group) AND the join to first-day needs no further
    exchange: one shuffle serves both.  The final matrix is tiny
    (days × days) regardless of input volume.
    """
    day = F.date_trunc("day", F.col(ts_col))
    first_day = df.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    active = (
        df.select(F.col(user_col), day.alias("_day"))
        .repartition(F.col(user_col))
        .distinct()
    )
    return (
        active.join(first_day, user_col)
        .groupBy(
            "cohort_day",
            F.datediff(F.col("_day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def anomaly_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_rows: int = 24,
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection: each point scored against the
    mean/std of the PRECEDING ``window_rows`` points of its key's series
    (trailing window excludes the current point — a spike must not
    inflate its own baseline).

    Determinism contract: the rolling sums are EXACT integers (the
    caller passes an integer value, e.g. cents); mean/variance/z are
    then single double expressions over exact operands, so scores are
    bit-identical across engines and partitionings.  Points with fewer
    than 2 preceding observations score null (no baseline).

    Scale: one shuffle (the per-key window); the frame is row-bounded so
    state per key is O(window_rows).
    """
    v = F.col(value_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(-window_rows, -1)
    )
    n = F.count(v).over(w)
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    mean = s1.cast("double") / n.cast("double")
    # population variance of the trailing window: E[x^2] - E[x]^2 over
    # exact integer sums
    var = s2.cast("double") / n.cast("double") - mean * mean
    # clamp: float cancellation can leave var at -1e-13 for a flat
    # window, and sqrt(negative) is NaN here but an ERROR in DuckDB
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = (v.cast("double") - mean) / std
    # a flat baseline (std == 0) yields null score, never ±inf — keeps
    # every emitted double finite and engine-portable
    scorable = (n >= 2) & (std > F.lit(0.0))
    return df.select(
        "*",
        F.when(n >= 2, mean).alias("baseline_mean"),
        F.when(scorable, z).alias("zscore"),
        # non-nullable by contract: a point with no scoreable baseline
        # is NOT an anomaly (nullable booleans also round-trip badly
        # through Arrow/pandas — None vs NaN)
        (scorable & (F.abs(z) > F.lit(threshold))).alias("is_anomaly"),
    )


def attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    value_cents: Column,
    conversion: str,
    tiebreak_cols: list[str] | None = None,
    direct_label: str = "direct",
) -> DataFrame:
    """Marketing-style revenue attribution → ``(model, channel,
    revenue_cents, n_conversions)`` for the two classic single-touch
    models in ONE pass:

    - **first_touch**: each conversion's value goes to the user's FIRST
      non-conversion event type before it;
    - **last_touch**: …to the LAST non-conversion event type before it.

    Conversions with no prior touch attribute to ``direct_label``.
    Both labels come from one window over the user's ordered events
    (``last``/``first`` with ignorenulls over rows-preceding frames), so
    the whole computation is one key shuffle + one partial-aggregated
    group-by of the conversions — never a self-join of the event log.
    ``value_cents`` must be an exact integer Column (the money
    contract); ``tiebreak_cols`` totally orders same-timestamp events.

    Scale: the window partitions on user (bounded per-user history);
    the final aggregate exchanges O(models × channels) rows.
    """
    from pyspark.sql import Window

    # reserved internal names: withColumn would silently REPLACE a
    # same-named input column, and a value_cents expression referencing
    # it would read the computed window value instead of the data —
    # refuse loudly, mirroring purge_cascade's _purge_key guard
    reserved = {"_first", "_last", "_ft", "_lt", "_cents"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with attribution's internal names: "
            f"{sorted(clash)}; rename them first"
        )
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col(type_col) != conversion, F.col(type_col))
    labeled = df.withColumn("_first", F.first(touch, ignorenulls=True).over(w)).withColumn(
        "_last", F.last(touch, ignorenulls=True).over(w)
    )
    conv = labeled.where(F.col(type_col) == conversion).select(
        F.coalesce(F.col("_first"), F.lit(direct_label)).alias("_ft"),
        F.coalesce(F.col("_last"), F.lit(direct_label)).alias("_lt"),
        value_cents.alias("_cents"),
    )
    unpivoted = conv.select(
        F.expr(
            "stack(2, 'first_touch', _ft, 'last_touch', _lt) AS (model, channel)"
        ),
        "_cents",
    )
    return unpivoted.groupBy("model", "channel").agg(
        F.sum("_cents").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_conversions"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    terms: int = 8,
) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) over the last
    ``terms`` observations of each key's series — the time-series
    smoothing staple, engineered for engine-exact determinism.

    The textbook EWMA is an infinite recursion (s_t = αx_t +
    (1−α)s_{t−1}); float recursion is partition-order-fragile and not
    SQL-portable.  This is the standard truncated form: weight 2^(K−1−k)
    on the k-th most recent point, normalized over the weights actually
    present — for α = 1/2 the truncation error is < 2^−K of the oldest
    contribution.  Numerator and denominator are EXACT integer sums of
    lag terms (the caller passes integer values, e.g. cents), unrolled
    as K lag() columns inside one window pass, so the single final
    division is bit-identical across engines and partitionings.

    Scale: one shuffle (the per-key window); K fixed columns of state,
    no per-row UDF, whole-stage codegen throughout.
    """
    if not (1 <= terms <= 62):
        raise ValueError("terms must be in [1, 62] (weights are 2^k longs)")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    # numerator accumulates in decimal(38,0) — ADVICE r7: a long
    # numerator silently overflows at |value|·2^terms ≳ 2^63 (billions
    # of cents near the terms cap); the [1,62] guard only bounds the
    # weight.  38 digits hold |value| ≤ 10^19 at terms=62 exactly, and
    # the final cast to double is correctly rounded from either type,
    # so in-range results are bit-identical to the old long path.
    v = F.col(value_col).cast("decimal(38,0)")
    num = None
    den = None
    for k in range(terms):
        weight = 1 << (terms - 1 - k)
        lagged = v if k == 0 else F.lag(v, k).over(w)
        term_n = F.coalesce(
            lagged * F.lit(weight), F.lit(0).cast("decimal(38,0)")
        )
        term_d = F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0)).cast("long")
        num = term_n if num is None else num + term_n
        den = term_d if den is None else den + term_d
    # den = 0 (every frame value null) yields null, never inf/NaN —
    # double x/0 is IEEE inf in Spark but engine-divergent elsewhere
    return df.select(
        "*",
        F.when(den > 0, num.cast("double") / den.cast("double")).alias("ewma"),
    )


def lateness_profile(
    df: DataFrame,
    arrival_col: str,
    ts_col: str,
    delays_sec: list[int],
    chunk: int = 4096,
) -> DataFrame:
    """Watermark-delay planning: for each candidate delay D, how many
    rows would a watermark of D drop?  ``lateness`` of a row is how far
    its event time lags the maximum event time that ARRIVED before it
    (``arrival_col`` is the ingest sequence — a Kafka offset, a file
    index, here the event id); a row with ``lateness > D`` arrives
    after a D-delayed watermark has passed it and is dropped by any
    watermarked stateful operator.  Output: one row per candidate
    ``(delay_sec, n_late, share)`` — read it as the completeness/
    latency trade-off curve and pick the smallest D meeting the SLA.

    The running maximum over arrival order is computed as a two-level
    prefix scan, NOT a global single-partition window: per-chunk
    running max (window PARTITIONED by chunk — parallel), plus the
    prefix max over per-chunk maxima (chunk-count-sized, one narrow
    window).  At 100 TB the wide pass stays fully parallel; the serial
    pass touches n/chunk rows.

    Exact arithmetic: lateness in integer microseconds
    (``unix_micros``), shares one final division.
    """
    mu = F.unix_micros(F.col(ts_col))
    base = df.select(
        F.col(arrival_col).alias("_seq"), mu.alias("_mu"),
        F.floor(F.col(arrival_col) / F.lit(chunk)).alias("_chunk"),
    )
    w_in = (
        Window.partitionBy("_chunk")
        .orderBy("_seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunk_max = base.groupBy("_chunk").agg(F.max("_mu").alias("_cmax"))
    w_pre = (
        Window.orderBy("_chunk").rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_chunks = chunk_max.select(
        "_chunk", F.max("_cmax").over(w_pre).alias("_pmax")
    )
    scored = (
        base.withColumn("_inmax", F.max("_mu").over(w_in))
        .join(prior_chunks, "_chunk")
        .withColumn(
            "_late_us",
            F.greatest(
                F.coalesce(F.greatest("_inmax", "_pmax"), F.col("_inmax"),
                           F.col("_pmax"), F.lit(0)) - F.col("_mu"),
                F.lit(0),
            ),
        )
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum((F.col("_late_us") > F.lit(d * 1_000_000)).cast("long")).alias(f"_d{d}")
        for d in delays_sec
    ]
    totals = scored.agg(*aggs)
    # one totals row → |delays| output rows via a single explode —
    # NOT a union of per-delay projections: each union branch re-plans
    # the entire upstream (r9; the r8 plan audit showed 8 scans and 16
    # shuffles for 4 delays — ReuseExchange papers over some of it at
    # runtime, but the honest plan is one pipeline)
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("delay_sec"),
                F.col(f"_d{d}").alias("n_late"),
            )
            for d in delays_sec
        ]
    )
    return totals.select("n", F.explode(pairs).alias("p")).select(
        F.col("p.delay_sec").alias("delay_sec"),
        F.col("p.n_late").alias("n_late"),
        (F.col("p.n_late").cast("double") / F.col("n").cast("double")).alias("share"),
    )


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_items_per_basket: int | None = None,
) -> DataFrame:
    """Market-basket co-occurrence mining: for every UNORDERED item pair
    bought together in at least ``min_pair_count`` baskets, the classic
    association measures — support, confidence (a→b), and lift — from
    exact integer counts (n_baskets, c_a, c_b, c_ab), each a single
    rounded double division so any engine reproduces the bits.

    lift > 1 means the pair co-occurs more than independence predicts —
    the "customers who bought X also bought Y" signal.

    Scale: the pair generator is a self-equi-join ON THE BASKET KEY of
    the per-basket DISTINCT item list, so cost is Σ C(k_i, 2) — bounded
    by basket width, never |items|².  ``max_items_per_basket`` drops
    mega-baskets (bots, wholesale accounts) before the join, the
    standard guard at crawl scale; when it fires, n_baskets and the
    item frequencies count the FILTERED universe, so support/
    confidence/lift stay mutually consistent (dropped baskets exist
    nowhere in the math).  Item frequencies broadcast (item vocabulary
    ≪ transactions).
    """
    b, i = F.col(basket_col), F.col(item_col)
    items = df.select(b.alias("_b"), i.alias("_i")).distinct()
    if max_items_per_basket is not None:
        width = items.groupBy("_b").agg(F.count(F.lit(1)).alias("_w"))
        items = items.join(
            width.where(F.col("_w") <= max_items_per_basket).select("_b"), "_b"
        )
    n_baskets = items.select("_b").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    freq = items.groupBy("_i").agg(F.count(F.lit(1)).alias("_c"))
    a = items.select(F.col("_b"), F.col("_i").alias("item_a"))
    c = items.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(c, "_b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= F.lit(min_pair_count))
    )
    fa = freq.select(F.col("_i").alias("item_a"), F.col("_c").alias("_ca"))
    fb = freq.select(F.col("_i").alias("item_b"), F.col("_c").alias("_cb"))
    dbl = lambda col: col.cast("double")  # noqa: E731
    return (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.col("_ca").alias("count_a"),
            F.col("_cb").alias("count_b"),
            F.round(dbl(F.col("pair_count")) / dbl(F.col("n_baskets")), 6).alias("support"),
            F.round(dbl(F.col("pair_count")) / dbl(F.col("_ca")), 6).alias("confidence"),
            F.round(
                dbl(F.col("pair_count") * F.col("n_baskets"))
                / dbl(F.col("_ca") * F.col("_cb")),
                6,
            ).alias("lift"),
        )
    )


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str | Column,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    out_col: str = "winsorized",
) -> DataFrame:
    """Per-group winsorization: clip values to the [lo_q, hi_q]
    order-statistic bounds — the standard outlier treatment before
    training statistical models on heavy-tailed business data (a fat-
    finger price shouldn't move the mean).

    Output = the input columns plus ``lo_bound`` / ``hi_bound`` /
    ``out_col`` (names reserved — a collision raises rather than
    silently overwriting caller data).  When ``value_col`` is a Column
    expression, re-derive the raw value from the input columns; the
    internal working column is not exposed.

    The bounds are DISCRETE order statistics (the ``floor(q·(n−1))+1``-th
    smallest value), not interpolated percentiles: an order statistic is
    an exact value from the data, so any engine that sorts the same
    multiset picks the identical bound — interpolation crosses engines
    only if both multiply/add in the same order, a portability trap the
    exact-integer house rules forbid.

    Scale: one rank window + one count per group (both shuffle on the
    group key, the partitioning the caller's pipeline already has), and
    the per-group bounds table — group-cardinality-sized — broadcasts
    back onto the rows.  No global sort, no collect.
    """
    if not 0.0 <= lo_q < hi_q <= 1.0:
        raise ValueError("need 0 <= lo_q < hi_q <= 1")
    for reserved in ("_v", "lo_bound", "hi_bound", out_col):
        if reserved in df.columns:
            raise ValueError(f"column name {reserved!r} is reserved")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.withColumn("_v", v)
    w = Window.partitionBy(*group_cols).orderBy(F.col("_v"))
    ranked = base.withColumn("_rn", F.row_number().over(w))
    n = base.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    k_lo = (F.floor(F.lit(lo_q) * (F.col("_n") - 1)) + 1).cast("long")
    k_hi = (F.floor(F.lit(hi_q) * (F.col("_n") - 1)) + 1).cast("long")
    bounds = (
        ranked.join(F.broadcast(n), group_cols)
        .where((F.col("_rn") == k_lo) | (F.col("_rn") == k_hi))
        .groupBy(*group_cols)
        .agg(
            F.min(F.when(F.col("_rn") == k_lo, F.col("_v"))).alias("_lo"),
            F.max(F.when(F.col("_rn") == k_hi, F.col("_v"))).alias("_hi"),
        )
    )
    return (
        base.join(F.broadcast(bounds), group_cols)
        .withColumn(
            out_col,
            F.when(F.col("_v") < F.col("_lo"), F.col("_lo"))
            .when(F.col("_v") > F.col("_hi"), F.col("_hi"))
            .otherwise(F.col("_v")),
        )
        .withColumnRenamed("_lo", "lo_bound")
        .withColumnRenamed("_hi", "hi_bound")
        # ADVICE r8: _v is internal working state — the caller's named
        # value column (still present on base) is the public surface
        .drop("_v")
    )
