"""Event-analytics queries (operators/analytics.py): the Kibana-dashboard
replacement surface.

Split out of ``queries.py`` (round 8, VERDICT r7 #7 — no file > ~3k
LoC); registration order and the ``QUERIES``/``ORACLES`` registries are
unchanged: this module registers via the shared ``@query`` decorator
when ``queries.py`` imports it at its original position.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F

from hdfs_stream_processing_spark.queries import (  # noqa: F401
    TS_FMT_DUCK,
    TS_FMT_SPARK,
    _conf_override,
    _mkdtemp,
    _stage_events,
    cents_avg,
    cents_sum,
    prep,
    query,
    sql_cents_avg,
    sql_cents_sum,
    sql_fold,
)

# §event analytics (operators/analytics.py) — the Kibana-dashboard
# staples (sessionization, funnels, retention) computed natively
# ========================================================================


@query(
    "sessionize",
    """SELECT event_id, user_id, ts,
              CAST(session_idx AS BIGINT) AS session_idx,
              CAST(user_id AS VARCHAR) || ':' || CAST(session_idx AS VARCHAR) AS session_id
       FROM (SELECT event_id, user_id, ts,
                    SUM(CASE WHEN prev IS NULL OR epoch_us(ts) - prev > 1800000000
                             THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                        AS session_idx
             FROM (SELECT event_id, user_id, ts,
                          lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id) AS prev
                   FROM events))""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a >30-min silence starts
    a new session; event_id tiebreak gives the window a total order so
    session assignment is partitioning-independent."""
    from hdfs_stream_processing_spark.operators.analytics import sessionize

    (events,) = prep(spark, sf_dir, "events")
    out = sessionize(
        events.select("event_id", "user_id", "ts"),
        "user_id",
        "ts",
        gap_minutes=30,
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "event_id", "user_id", "ts", "session_idx", "session_id"
    )


@query(
    "funnel",
    """WITH s1 AS (SELECT user_id, min(ts) AS t_view FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
       s2 AS (SELECT s1.user_id, t_view,
                     min(CASE WHEN e.ts > s1.t_view THEN e.ts END) AS t_click
              FROM s1 LEFT JOIN events e
                ON e.user_id = s1.user_id AND e.event_type = 'click'
              GROUP BY s1.user_id, t_view),
       s3 AS (SELECT s2.user_id, t_view, t_click,
                     min(CASE WHEN e.ts > s2.t_click THEN e.ts END) AS t_purchase
              FROM s2 LEFT JOIN events e
                ON e.user_id = s2.user_id AND e.event_type = 'purchase'
              GROUP BY s2.user_id, t_view, t_click)
       SELECT user_id, t_view, t_click, t_purchase,
              CASE WHEN t_purchase IS NOT NULL THEN 3
                   WHEN t_click IS NOT NULL THEN 2
                   WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS stage
       FROM s3""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: each step's
    earliest event strictly after the previous step, per user; stage =
    deepest step reached.  Chained aggregates/joins all keyed on
    user_id — co-partitioned, no self-join blowup."""
    from hdfs_stream_processing_spark.operators.analytics import funnel_steps

    (events,) = prep(spark, sf_dir, "events")
    return funnel_steps(
        events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


@query(
    "funnel_lag",
    """WITH s1 AS (SELECT user_id, min(ts) AS t_view FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
       s2 AS (SELECT s1.user_id, t_view,
                     min(CASE WHEN e.ts > s1.t_view THEN e.ts END) AS t_click
              FROM s1 LEFT JOIN events e
                ON e.user_id = s1.user_id AND e.event_type = 'click'
              GROUP BY s1.user_id, t_view),
       s3 AS (SELECT s2.user_id, t_view, t_click,
                     min(CASE WHEN e.ts > s2.t_click THEN e.ts END) AS t_purchase
              FROM s2 LEFT JOIN events e
                ON e.user_id = s2.user_id AND e.event_type = 'purchase'
              GROUP BY s2.user_id, t_view, t_click),
       lags AS (
         SELECT 'view->click' AS transition,
                epoch_us(t_click) - epoch_us(t_view) AS gap_us
         FROM s3 WHERE t_click IS NOT NULL
         UNION ALL
         SELECT 'click->purchase' AS transition,
                epoch_us(t_purchase) - epoch_us(t_click) AS gap_us
         FROM s3 WHERE t_purchase IS NOT NULL)
       SELECT transition, COUNT(*) AS n_converted,
              quantile_cont(gap_us, 0.5) / 1e6 AS p50_s,
              quantile_cont(gap_us, 0.9) / 1e6 AS p90_s
       FROM lags GROUP BY transition""",
)
def q_funnel_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per funnel transition (VERDICT r4 #7): exact
    p50/p90 of the view→click and click→purchase gaps in seconds, over
    the same per-user funnel table as `funnel`.  Gaps are exact integer
    microseconds; percentile interpolation is the engine-portable
    (n-1)p form proven by the `percentiles` query."""
    from hdfs_stream_processing_spark.operators.analytics import (
        funnel_conversion_lags,
        funnel_steps,
    )

    (events,) = prep(spark, sf_dir, "events")
    fun = funnel_steps(events, "user_id", "ts", "event_type", ["view", "click", "purchase"])
    return funnel_conversion_lags(fun, ["view", "click", "purchase"])


@query(
    "stream_sessionize",
    """WITH x AS (SELECT user_id, ts, value,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
         FROM events),
       s AS (SELECT user_id, ts, value,
                SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
             FROM x)
       SELECT user_id,
              MIN(ts) AS session_start,
              MAX(ts) + INTERVAL 10 MINUTE AS session_end,
              COUNT(*) AS n,
              CAST(SUM(CAST(round(value * 100.0, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
       FROM s GROUP BY user_id, sess""",
)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING sessionization via session_window state (VERDICT r4
    #7): the event stream arrives in multiple micro-batches
    (maxFilesPerTrigger), so sessions spanning batch boundaries MERGE in
    the streaming session-state store; complete-mode availableNow then
    emits the final session set, which must equal the batch
    gaps-and-islands derivation — proving the streaming merge loses and
    fabricates nothing.  10-minute gap (vs session_agg's 5) with the
    same closed boundary: an event exactly at last+gap still merges."""
    from hdfs_stream_processing_spark.streaming import (
        run_to_memory,
        session_window_agg,
        stream_parquet_source,
    )

    src_dir, schema = _stage_events(spark, sf_dir)
    stream = stream_parquet_source(spark, src_dir, schema, max_files_per_trigger=2)
    sessions = session_window_agg(
        stream, ts_col="ts", key_col="user_id", value_col="value",
        gap="10 minutes", watermark="10 minutes",
    )
    with _conf_override(spark, "spark.sql.shuffle.partitions", "8"):
        return run_to_memory(sessions, output_mode="complete")


@query(
    "retention",
    """WITH fd AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
                   FROM events GROUP BY user_id),
       act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
       SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
              CAST(datediff('day', cohort_day, d) AS INT) AS day_offset,
              count(DISTINCT act.user_id) AS n_users
       FROM act JOIN fd ON act.user_id = fd.user_id
       GROUP BY cohort_day, datediff('day', cohort_day, d)""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity day ×
    day offset of each active day.  Two hash aggregates + one
    co-partitioned join; the matrix is days × days no matter the input
    volume."""
    from hdfs_stream_processing_spark.operators.analytics import retention_cohorts

    (events,) = prep(spark, sf_dir, "events")
    return retention_cohorts(events, "user_id", "ts")


@query(
    "anomaly_zscore",
    """WITH obs AS (
         SELECT event_type, date_trunc('hour', ts) AS bucket,
                CAST(SUM(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events GROUP BY event_type, date_trunc('hour', ts)),
       w AS (SELECT event_type, bucket, sum_cents,
                    count(sum_cents) OVER win AS n,
                    CAST(sum(sum_cents) OVER win AS BIGINT) AS s1,
                    CAST(sum(sum_cents * sum_cents) OVER win AS BIGINT) AS s2
             FROM obs
             WINDOW win AS (PARTITION BY event_type ORDER BY bucket
                            ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
       m AS (SELECT *, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean FROM w),
       v2 AS (SELECT *,
                     sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                                   - mean * mean, 0.0)) AS std
              FROM m)
       SELECT event_type, bucket, sum_cents,
              CASE WHEN n >= 2 THEN mean END AS baseline_mean,
              CASE WHEN n >= 2 AND std > 0.0
                   THEN (CAST(sum_cents AS DOUBLE) - mean) / std END AS zscore,
              CASE WHEN n >= 2 AND std > 0.0
                   THEN abs((CAST(sum_cents AS DOUBLE) - mean) / std) > 3.0
                   ELSE false END AS is_anomaly
       FROM v2""",
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the hourly sensor series:
    each hour scored against the trailing 24 hours of its type (the
    point never inflates its own baseline).  Exact-integer rolling sums
    feed single double expressions, so scores are IEEE-bit-identical in
    the oracle."""
    from hdfs_stream_processing_spark.operators.analytics import anomaly_zscore

    (events,) = prep(spark, sf_dir, "events")
    cents = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    obs = (
        events.select(F.col("event_type"), F.date_trunc("hour", "ts").alias("bucket"), cents.alias("_c"))
        .groupBy("event_type", "bucket")
        .agg(F.sum("_c").alias("sum_cents"))
    )
    return anomaly_zscore(obs, "event_type", "bucket", "sum_cents", window_rows=24)


@query(
    "large_orders",
    """WITH big AS (
         SELECT l_orderkey,
                CAST(SUM(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) AS BIGINT) AS qty_cents
         FROM lineitem GROUP BY l_orderkey
         HAVING SUM(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) > 25000)
       SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
              CAST(qty_cents AS DOUBLE) / 100.0 AS total_qty
       FROM big
       JOIN orders   ON o_orderkey = big.l_orderkey
       JOIN customer ON c_custkey = o_custkey""",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (agg → HAVING → join back to the fact's parents):
    orders whose summed line quantity exceeds a threshold, with their
    customer.  The HAVING runs on the aggregated (small) side BEFORE the
    joins, so only qualifying orderkeys ever reach the join — at scale
    the filtered agg is broadcast against orders."""
    lineitem, orders, customer = prep(spark, sf_dir, "lineitem", "orders", "customer")
    qty_cents = F.round(F.col("l_quantity") * F.lit(100.0), 0).cast("long")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(qty_cents).alias("qty_cents"))
        .where(F.col("qty_cents") > F.lit(25000))
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            (F.col("qty_cents").cast("double") / F.lit(100.0)).alias("total_qty"),
        )
    )


@query(
    "heavy_hitters",
    """SELECT source, token, n, CAST(rank AS INT) AS rank
       FROM (SELECT source, token, count(*) AS n,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY count(*) DESC, token) AS rank
             FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS token
                   FROM documents)
             GROUP BY source, token)
       WHERE rank <= 3""",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: the 3 most frequent tokens per source with a
    deterministic total-order rank.  Map-side partial counts do the
    heavy lifting; the window only sees distinct (source, token)
    counts."""
    from hdfs_stream_processing_spark.operators.aggregates import heavy_hitters
    from hdfs_stream_processing_spark.operators.text import tokens

    (documents,) = prep(spark, sf_dir, "documents")
    toks = documents.select("source", F.explode(tokens("text")).alias("token"))
    return heavy_hitters(toks, ["source"], "token", k=3)


@query(
    "ntile_buckets",
    """SELECT event_id, event_type, value,
              CAST(ntile(10) OVER (PARTITION BY event_type
                                   ORDER BY value, event_id) AS INT) AS decile
       FROM events""",
)
def q_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile assignment per type (NTILE): equal-frequency buckets with
    an event_id tiebreak so the assignment is a total order —
    partitioning-independent and engine-exact."""
    from pyspark.sql import Window

    (events,) = prep(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value"), F.col("event_id"))
    return events.select(
        "event_id", "event_type", "value", F.ntile(10).over(w).alias("decile")
    )


@query(
    "corr_qty_price",
    """WITH s AS (
         SELECT l_returnflag,
                count(*) AS n,
                CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx,
                CAST(sum(y * y) AS BIGINT) AS syy
         FROM (SELECT l_returnflag,
                      CAST(round(l_quantity, 0) AS BIGINT) AS x,
                      CAST(round(l_extendedprice, 0) AS BIGINT) AS y
               FROM lineitem)
         GROUP BY l_returnflag)
       SELECT l_returnflag, n,
              CASE WHEN sqrt(greatest(CAST(sxx AS DOUBLE) / n
                                      - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n), 0.0))
                        * sqrt(greatest(CAST(syy AS DOUBLE) / n
                                      - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 0.0)) > 0.0
                   THEN (CAST(sxy AS DOUBLE) / n
                         - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                        / (sqrt(greatest(CAST(sxx AS DOUBLE) / n
                                      - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n), 0.0))
                           * sqrt(greatest(CAST(syy AS DOUBLE) / n
                                      - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 0.0)))
              END AS corr
       FROM s""",
)
def q_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs price per return flag from
    exact integer sufficient statistics — unlike native corr(), whose
    float partial-state accumulation is partition-order-dependent, this
    hash-matches the oracle bit-for-bit."""
    from hdfs_stream_processing_spark.operators.aggregates import corr_exact

    (lineitem,) = prep(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity"), 0).cast("long")
    y = F.round(F.col("l_extendedprice"), 0).cast("long")
    return corr_exact(lineitem, ["l_returnflag"], x, y)


# ========================================================================

# Round 8: market-basket association rules, RFM segmentation, HLL set
# intersection with an error contract
# ========================================================================


@query(
    "basket_rules",
    """WITH li AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
       nb AS (SELECT COUNT(DISTINCT b) AS n_baskets FROM li),
       f AS (SELECT i, COUNT(*) AS c FROM li GROUP BY i),
       p AS (SELECT a.i AS item_a, c.i AS item_b, COUNT(*) AS pair_count
             FROM li a JOIN li c ON a.b = c.b AND a.i < c.i
             GROUP BY 1, 2 HAVING COUNT(*) >= 2)
       SELECT item_a, item_b, pair_count,
              fa.c AS count_a, fb.c AS count_b,
              round(CAST(pair_count AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE), 6)
                  AS support,
              round(CAST(pair_count AS DOUBLE) / CAST(fa.c AS DOUBLE), 6)
                  AS confidence,
              round(CAST(pair_count * nb.n_baskets AS DOUBLE)
                    / CAST(fa.c * fb.c AS DOUBLE), 6) AS lift
       FROM p
       JOIN f fa ON fa.i = item_a
       JOIN f fb ON fb.i = item_b
       CROSS JOIN nb""",
)
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order line items
    (operators/analytics.py::basket_pairs): part pairs co-ordered in
    >= 2 orders with exact-integer support/confidence/lift.  The pair
    join is keyed on the ORDER (Σ C(k,2) work, basket-width bounded),
    item frequencies broadcast."""
    from hdfs_stream_processing_spark.operators.analytics import basket_pairs

    (lineitem,) = prep(spark, sf_dir, "lineitem")
    return basket_pairs(lineitem, "l_orderkey", "l_partkey", min_pair_count=2)


@query(
    "rfm_segments",
    """WITH m AS (SELECT o_custkey AS c_custkey,
                         date_diff('day', MAX(o_orderdate),
                                   (SELECT MAX(o_orderdate) FROM orders))
                             AS recency_days,
                         COUNT(*) AS frequency,
                         CAST(SUM(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
                              AS BIGINT) AS monetary_cents
                  FROM orders GROUP BY o_custkey),
       t AS (SELECT *,
                    ntile(4) OVER (ORDER BY recency_days ASC, c_custkey) AS r,
                    ntile(4) OVER (ORDER BY frequency DESC, c_custkey) AS f,
                    ntile(4) OVER (ORDER BY monetary_cents DESC, c_custkey) AS mq
             FROM m)
       SELECT c_custkey, recency_days, frequency, monetary_cents,
              r, f, mq,
              'r' || CAST(r AS VARCHAR) || 'f' || CAST(f AS VARCHAR)
                  || 'm' || CAST(mq AS VARCHAR) AS segment
       FROM t""",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer, recency (days since
    their last order, against the table's max date), frequency (order
    count), monetary (integer-cent revenue), each quartiled by ntile
    under a TOTAL order (metric, custkey) so the quartile assignment is
    engine- and partition-independent; the segment label concatenates
    the three quartiles.  One grouped aggregate; the three ntile
    windows run on the customer-level table (|customers| rows, not
    |orders|) — global windows over a pre-aggregated, key-bounded
    input, the same contract as token_zipf's ranking."""
    from pyspark.sql import Window

    (orders,) = prep(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0), 0).cast("long")
    maxd = orders.agg(F.max("o_orderdate").alias("_maxd"))
    m = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(cents).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "c_custkey",
            F.datediff(F.col("_maxd"), F.col("_last")).cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    r = F.ntile(4).over(Window.orderBy(F.col("recency_days").asc(), F.col("c_custkey")))
    f = F.ntile(4).over(Window.orderBy(F.col("frequency").desc(), F.col("c_custkey")))
    mq = F.ntile(4).over(Window.orderBy(F.col("monetary_cents").desc(), F.col("c_custkey")))
    # ntile is int in Spark, BIGINT in DuckDB — align the widths
    # (tools/type_audit.py flags the drift even where the value hash
    # normalizes it)
    t = m.select(
        "*",
        r.cast("long").alias("r"),
        f.cast("long").alias("f"),
        mq.cast("long").alias("mq"),
    )
    return t.select(
        "c_custkey", "recency_days", "frequency", "monetary_cents",
        "r", "f", "mq",
        F.concat(
            F.lit("r"), F.col("r").cast("string"),
            F.lit("f"), F.col("f").cast("string"),
            F.lit("m"), F.col("mq").cast("string"),
        ).alias("segment"),
    )


@query(
    "hll_intersect",
    """SELECT CAST((SELECT COUNT(DISTINCT a.user_id)
                    FROM events a
                    WHERE a.event_type = 'click'
                      AND EXISTS (SELECT 1 FROM events b
                                  WHERE b.event_type = 'purchase'
                                    AND b.user_id = a.user_id))
              AS BIGINT) AS n_exact,
              TRUE AS within_bound""",
)
def q_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set-operation contract, hash-checked (the approx_distinct_ok
    pattern): |click ∩ purchase| users estimated by HLL
    inclusion-exclusion — est(A) + est(B) − est(A∪B), three fixed-size
    sketches, no distinct shuffle — versus the exact semi-join count.
    Intersection inherits the union's error on a smaller denominator,
    so the bound is 15% (looser than the 5% single-set rsd), and the
    query emits within_bound = (|est − exact| / exact <= 0.15); the
    oracle supplies the exact side plus literal TRUE."""
    (events,) = prep(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select("user_id")
    buys = events.where(F.col("event_type") == "purchase").select("user_id")
    est = (
        clicks.agg(F.approx_count_distinct("user_id", rsd=0.05).alias("_a"))
        .crossJoin(buys.agg(F.approx_count_distinct("user_id", rsd=0.05).alias("_b")))
        .crossJoin(
            clicks.unionByName(buys).agg(
                F.approx_count_distinct("user_id", rsd=0.05).alias("_ab")
            )
        )
    )
    exact = clicks.join(buys, "user_id", "left_semi").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    out = exact.crossJoin(F.broadcast(est))
    inter = (F.col("_a") + F.col("_b") - F.col("_ab")).cast("double")
    rel_err = F.abs(inter - F.col("n_exact").cast("double")) / F.col("n_exact").cast("double")
    return out.select("n_exact", (rel_err <= F.lit(0.15)).alias("within_bound"))


@query(
    "winsorize_prices",
    """WITH x AS (SELECT l_returnflag AS g,
                         CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS v
                  FROM lineitem),
       n AS (SELECT g, COUNT(*) AS n FROM x GROUP BY g),
       r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn
             FROM x),
       b AS (SELECT r.g,
                    MIN(CASE WHEN rn = CAST(floor(0.05 * (n - 1)) AS BIGINT) + 1
                             THEN v END) AS lo,
                    MAX(CASE WHEN rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1
                             THEN v END) AS hi
             FROM r JOIN n USING (g) GROUP BY r.g),
       c AS (SELECT x.g, x.v, b.lo, b.hi,
                    CASE WHEN v < lo THEN lo WHEN v > hi THEN hi ELSE v END AS w
             FROM x JOIN b USING (g))
       SELECT g AS l_returnflag,
              COUNT(*) AS n,
              MIN(lo) AS lo_cents, MIN(hi) AS hi_cents,
              CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
              CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
              CAST(SUM(w) AS BIGINT) AS sum_winsorized_cents,
              CAST(SUM(w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0
                  AS avg_winsorized
       FROM c GROUP BY g""",
)
def q_winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization report (operators/analytics.py::
    winsorize): extended prices clipped at the exact p05/p95 ORDER
    STATISTICS per return flag (discrete k-th smallest, never
    interpolated — an order statistic is a value from the data, so any
    engine picks the identical bound), with clip counts and the
    post-clip mean.  One rank window + one count per group; the
    group-sized bounds table broadcasts back onto the rows."""
    from hdfs_stream_processing_spark.operators.analytics import winsorize

    (lineitem,) = prep(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * F.lit(100.0), 0).cast("long")
    w = winsorize(
        lineitem.select(F.col("l_returnflag"), cents.alias("cents")),
        ["l_returnflag"], "cents", lo_q=0.05, hi_q=0.95,
    )
    return w.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lo_bound").alias("lo_cents"),
        F.min("hi_bound").alias("hi_cents"),
        F.sum((F.col("cents") < F.col("lo_bound")).cast("long")).alias("n_clip_lo"),
        F.sum((F.col("cents") > F.col("hi_bound")).cast("long")).alias("n_clip_hi"),
        F.sum("winsorized").alias("sum_winsorized_cents"),
        (
            F.sum("winsorized").cast("double") / F.count(F.lit(1)).cast("double")
            / F.lit(100.0)
        ).alias("avg_winsorized"),
    )


@query(
    "attribution_linear",
    """WITH e AS (SELECT user_id, ts, event_id, event_type,
                         COALESCE(CAST(round(value * 100.0, 0) AS BIGINT), 0) AS cents
                  FROM events),
       lab AS (SELECT *,
                 SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_touch,
                 SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c_view,
                 SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c_click,
                 SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c_signup,
                 SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c_error
               FROM e),
       conv AS (SELECT * FROM lab
                WHERE event_type = 'purchase' AND COALESCE(n_touch, 0) > 0),
       unp AS (
         SELECT 'view' AS channel, (cents * 1000000 * c_view) // n_touch AS micro,
                CASE WHEN c_view > 0 THEN 1 ELSE 0 END AS touched FROM conv
         UNION ALL
         SELECT 'click', (cents * 1000000 * c_click) // n_touch,
                CASE WHEN c_click > 0 THEN 1 ELSE 0 END FROM conv
         UNION ALL
         SELECT 'signup', (cents * 1000000 * c_signup) // n_touch,
                CASE WHEN c_signup > 0 THEN 1 ELSE 0 END FROM conv
         UNION ALL
         SELECT 'error', (cents * 1000000 * c_error) // n_touch,
                CASE WHEN c_error > 0 THEN 1 ELSE 0 END FROM conv)
       SELECT channel,
              CAST(SUM(micro) AS BIGINT) AS revenue_micro_cents,
              CAST(SUM(touched) AS BIGINT) AS n_conversions_touched
       FROM unp GROUP BY channel""",
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution (completes the attribution family
    next to first/last-touch): each purchase's cents split equally
    across every prior touch EVENT, so a channel earns
    cents·(its touches)/(all touches) per conversion.  Exact integer
    contract: shares are integer micro-cents via floor division —
    identical in any engine, no float summation.  The channel
    vocabulary is enumerable (4 types), so per-channel prior counts are
    four conditional sums in ONE user-keyed window pass — never a
    touches×purchases self-join (which would grow quadratically in
    events-per-user)."""
    from pyspark.sql import Window

    (events,) = prep(spark, sf_dir, "events")
    cents = F.coalesce(
        F.round(F.col("value") * F.lit(100.0), 0).cast("long"), F.lit(0)
    )
    e = events.select("user_id", "ts", "event_id", "event_type", cents.alias("cents"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).over(w)  # noqa: E731
    lab = e.select(
        "*",
        cnt(F.col("event_type") != "purchase").alias("n_touch"),
        *[
            cnt(F.col("event_type") == ch).alias(f"c_{ch}")
            for ch in ("view", "click", "signup", "error")
        ],
    )
    conv = lab.where(
        (F.col("event_type") == "purchase") & (F.coalesce(F.col("n_touch"), F.lit(0)) > 0)
    )
    # one stack() explode instead of a 4-way self-union: the union form
    # re-evaluates the window lineage once per branch (4 extra
    # exchanges); stacking unpivots the four channel columns in a
    # single narrow pass over ONE window result
    stack = ", ".join(
        f"'{ch}', (cents * 1000000 * c_{ch}) DIV n_touch,"
        f" CASE WHEN c_{ch} > 0 THEN 1 ELSE 0 END"
        for ch in ("view", "click", "signup", "error")
    )
    unp = conv.selectExpr(
        f"stack(4, {stack}) AS (channel, micro, touched)"
    )
    return unp.groupBy("channel").agg(
        F.sum("micro").cast("long").alias("revenue_micro_cents"),
        F.sum("touched").cast("long").alias("n_conversions_touched"),
    )


@query(
    "cohort_ltv",
    """WITH o AS (SELECT o_custkey,
                         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS cents,
                         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
                  FROM orders),
       first AS (SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY o_custkey),
       sized AS (SELECT m0, COUNT(*) AS cohort_size FROM first GROUP BY m0),
       rev AS (SELECT f.m0, o.m - f.m0 AS age_months,
                      CAST(SUM(cents) AS BIGINT) AS revenue_cents
               FROM o JOIN first f USING (o_custkey)
               GROUP BY f.m0, o.m - f.m0),
       cum AS (SELECT m0, age_months, revenue_cents,
                      CAST(SUM(revenue_cents) OVER (PARTITION BY m0
                           ORDER BY age_months) AS BIGINT) AS cum_revenue_cents
               FROM rev)
       SELECT CAST(m0 // 12 AS BIGINT) AS cohort_year,
              CAST(m0 % 12 + 1 AS BIGINT) AS cohort_month,
              CAST(age_months AS BIGINT) AS age_months,
              cohort_size AS n_customers,
              revenue_cents, cum_revenue_cents,
              CAST(cum_revenue_cents AS DOUBLE) / CAST(cohort_size AS DOUBLE)
                  / 100.0 AS cum_ltv_per_customer
       FROM cum JOIN sized USING (m0)""",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers cohorted by first-order
    month, revenue accumulated by cohort age — the LTV curve every
    subscription/retention dashboard draws.  Months are exact integers
    (year·12+month, never fractional months_between), money is integer
    cents, and the cumulative window is per-cohort (calendar-bounded
    partitions).  Two grouped aggregates + one first-order broadcast
    join + one small window — the orders fact is scanned once per
    aggregate, never self-joined."""
    from pyspark.sql import Window

    (orders,) = prep(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0), 0).cast("long")
    m = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast("long")
    o = orders.select("o_custkey", cents.alias("cents"), m.alias("m"))
    first = o.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    sized = first.groupBy("m0").agg(F.count(F.lit(1)).alias("n_customers"))
    rev = (
        o.join(first, "o_custkey")
        .groupBy("m0", (F.col("m") - F.col("m0")).alias("age_months"))
        .agg(F.sum("cents").cast("long").alias("revenue_cents"))
    )
    wc = Window.partitionBy("m0").orderBy("age_months")
    cum = rev.withColumn(
        "cum_revenue_cents", F.sum("revenue_cents").over(wc).cast("long")
    )
    out = cum.join(F.broadcast(sized), "m0")
    return out.select(
        F.expr("m0 DIV 12").cast("long").alias("cohort_year"),
        (F.col("m0") % 12 + 1).cast("long").alias("cohort_month"),
        F.col("age_months").cast("long"),
        "n_customers",
        "revenue_cents",
        "cum_revenue_cents",
        (
            F.col("cum_revenue_cents").cast("double")
            / F.col("n_customers").cast("double") / F.lit(100.0)
        ).alias("cum_ltv_per_customer"),
    )
