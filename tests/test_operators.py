"""Relational / aggregate / window operators (SURVEY §2.2-2.7)."""

from pyspark.sql import functions as F

from hdfs_stream_processing_spark.operators import (
    add_lit,
    case_when,
    drop_nulls,
    multi_join,
    project_exclude,
    top_k,
    union_by_name,
    window_rank,
    window_running,
)
from hdfs_stream_processing_spark.sources.io import load_table

from tests.conftest import SF_DIR


def test_project_exclude_prunes_scan(spark):
    events = load_table(spark, SF_DIR, "events")
    out = project_exclude(events, ["props"])
    assert out.columns == ["event_id", "ts", "user_id", "event_type", "value"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "props" not in plan  # column pruned out of the parquet scan


def test_case_when_branches(spark):
    df = spark.createDataFrame([(80.0,), (50.0,), (10.0,)], "v double")
    out = case_when(df, "t", [(F.col("v") > 75, "high"), (F.col("v") > 25, "mid")], "low")
    assert [r["t"] for r in out.orderBy(F.desc("v")).collect()] == ["high", "mid", "low"]


def test_multi_join_broadcasts_small_dims(spark):
    tables = [load_table(spark, SF_DIR, t) for t in ["lineitem", "orders", "customer", "nation", "region"]]
    joined = multi_join(
        tables,
        [
            ("l_orderkey", "o_orderkey"),
            ("o_custkey", "c_custkey"),
            ("c_nationkey", "n_nationkey"),
            ("n_regionkey", "r_regionkey"),
        ],
    )
    n = joined.count()
    assert n == tables[0].count()  # FK joins preserve lineitem cardinality
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # small dims must broadcast


def test_union_and_lit(spark):
    nation = load_table(spark, SF_DIR, "nation")
    a = add_lit(nation, "room", "a")
    b = add_lit(nation, "room", "b")
    # unionByName must align by NAME, not position
    out = union_by_name([a, b.select(*reversed(b.columns))])
    assert out.count() == 2 * nation.count()
    assert out.columns == a.columns


def test_drop_nulls(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)], "id int, s string")
    assert drop_nulls(df).count() == 1
    assert drop_nulls(df, subset=["id"]).count() == 2


def test_top_k_plans_take_ordered(spark):
    events = load_table(spark, SF_DIR, "events")
    out = top_k(events, [F.col("value").desc(), F.col("event_id")], 5)
    rows = out.collect()
    assert len(rows) == 5
    assert rows[0]["value"] >= rows[4]["value"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # k-heap, not a global sort


def test_window_rank_and_running(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 4, 5.0)],
        "uid int, seq int, v double",
    )
    ranked = window_rank(df, ["uid"], [F.col("seq")])
    got = {(r["uid"], r["seq"]): r["row_number"] for r in ranked.collect()}
    assert got[(1, 3)] == 3 and got[(2, 4)] == 1

    running = window_running(df, ["uid"], [F.col("seq")], F.col("v"))
    by_seq = {r["seq"]: r for r in running.collect()}
    assert by_seq[3]["running_sum"] == 60.0
    assert by_seq[3]["prev_value"] == 20.0
    assert by_seq[1]["next_value"] == 20.0
    assert by_seq[4]["prev_value"] is None


def test_salted_agg_equals_plain_agg(spark):
    """Salting must be result-invisible under any partitioning."""
    from hdfs_stream_processing_spark.operators.skew import salted_group_sum

    events = load_table(spark, SF_DIR, "events")
    cents = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    plain = events.groupBy("event_type").agg(
        (F.sum(cents).cast("double") / F.lit(100.0)).alias("sum_value"),
        F.count(F.lit(1)).alias("n"),
    )
    for buckets in (1, 16):
        salted = salted_group_sum(
            events.repartition(7), ["event_type"], cents, "sum_value", salt_buckets=buckets
        )
        assert sorted(salted.collect()) == sorted(plain.collect())


def test_salted_join_equals_plain_join(spark):
    """Salting must be row-multiset-identical to the plain join —
    including duplicate keys on BOTH sides and, for left joins,
    unmatched big-side rows surviving exactly once."""
    from hdfs_stream_processing_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (9, "z")], "k long, payload string"
    )
    small = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "w")], "sk long, dim string"
    )
    plain_inner = sorted(
        big.join(small, big["k"] == small["sk"]).select("k", "payload", "dim").collect()
    )
    plain_left = sorted(
        big.join(small, big["k"] == small["sk"], "left")
        .select("k", "payload", "dim").collect()
    )
    for buckets in (1, 4):
        si = salted_join(big, small, "k", "sk", salt_buckets=buckets)
        assert sorted(si.select("k", "payload", "dim").collect()) == plain_inner
        sl = salted_join(big, small, "k", "sk", salt_buckets=buckets, how="left")
        assert sorted(sl.select("k", "payload", "dim").collect()) == plain_left
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(big, small, "k", "sk", how="full")


def test_salting_rejects_existing_salt_column(spark):
    """ADVICE r5: a pre-existing user `_salt` column must raise, not be
    silently overwritten and dropped."""
    import pytest as _pytest

    from hdfs_stream_processing_spark.operators.skew import (
        salted_group_sum,
        salted_join,
    )

    tainted = spark.createDataFrame([(1, 7, 1.0)], "k long, _salt int, value double")
    clean = spark.createDataFrame([(1, "x")], "sk long, dim string")
    with _pytest.raises(ValueError, match="_salt"):
        salted_group_sum(tainted, ["k"], F.col("value"), "s")
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(tainted, clean, "k", "sk")
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(clean, tainted.withColumnRenamed("k", "sk2"), "sk", "sk2")


def test_session_window_batch_semantics(spark):
    """Session boundary is CLOSED: an event exactly `gap` after the
    previous one still merges; only a gap strictly greater splits."""
    import datetime as dt

    from hdfs_stream_processing_spark.streaming.pipeline import session_window_agg

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=4), 1.0),   # same session (< 5 min)
        (1, base + dt.timedelta(minutes=9), 1.0),   # still same (4+5)
        (1, base + dt.timedelta(minutes=14), 1.0),  # exactly 5 min later → merges
        (1, base + dt.timedelta(minutes=19, seconds=1), 1.0),  # > 5 min → NEW session
        (2, base, 2.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = session_window_agg(df, gap="5 minutes", watermark=None)
    sessions = sorted(
        (r["user_id"], r["n"]) for r in out.collect()
    )
    assert sessions == [(1, 1), (1, 4), (2, 1)]


def test_asof_join_semantics(spark):
    """Latest right row at-or-BEFORE each left ts; equal ts matches;
    no prior right row → NULL."""
    import datetime as dt

    from hdfs_stream_processing_spark.operators.temporal import asof_join

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    left = spark.createDataFrame(
        [(1, t(0), 100), (1, t(10), 101), (1, t(20), 102), (2, t(5), 200)],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    right = spark.createDataFrame(
        [(1, t(10), 9.0), (1, t(15), 8.0)],  # t(10): equal-ts tie with left 101
        "user_id bigint, ts timestamp, value double",
    )
    out = asof_join(left, right, "user_id", "ts", "ts", ["value"])
    got = {r["event_id"]: r["asof_value"] for r in out.collect()}
    assert got == {100: None, 101: 9.0, 102: 8.0, 200: None}


def test_range_join_boundary_inclusive(spark):
    """Pairs exactly at the gap boundary are included; one row past is
    not; each qualifying pair appears exactly once."""
    import datetime as dt

    from hdfs_stream_processing_spark.operators.temporal import range_join_buckets

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    left = spark.createDataFrame(
        [(1, t(0), 10)], "user_id bigint, ts timestamp, event_id bigint"
    )
    right = spark.createDataFrame(
        [(1, t(60), 20), (1, t(61), 21), (1, t(-60), 22), (2, t(0), 23)],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    out = range_join_buckets(left, right, "user_id", "ts", "ts", 60)
    got = sorted(r["r_event_id"] for r in out.collect())
    assert got == [20, 22]  # ±60s inclusive; 61s out; other user out


def test_minmax_by_struct_order_survives_large_event_ids(spark):
    """ADVICE r2: the old packed-integer ordering key (cents*1e5 + id)
    silently broke once event_id >= 100000.  The struct ordering must
    pick the true arg-max regardless of id magnitude, with ties on value
    broken by the GREATEST id (max side) / SMALLEST id (min side)."""
    from pyspark.sql import functions as F

    rows = [
        # user 1: low value with a HUGE id must NOT outrank high value
        (1, 10_000_000_001, 1.00),
        (1, 7, 99.99),
        # user 2: exact value tie -> max_by takes greatest id, min_by smallest
        (2, 500_000, 5.00),
        (2, 500_001, 5.00),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_id bigint, value double")
    cents = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    ordk = F.struct(cents.alias("cents"), F.col("event_id").alias("id"))
    got = {
        r["user_id"]: (r["best"], r["worst"])
        for r in df.groupBy("user_id")
        .agg(
            F.max_by("event_id", ordk).alias("best"),
            F.min_by("event_id", ordk).alias("worst"),
        )
        .collect()
    }
    assert got == {1: (7, 10_000_000_001), 2: (500_001, 500_000)}


def test_query_construction_is_job_free_with_dims(spark):
    """VERDICT r2 item 8: building a query plan must not run Spark jobs.
    With dims= passed, lsh_bucket_topk constructs with ZERO jobs; the
    dims=None fallback (first-row probe) is the one documented exception."""
    from hdfs_stream_processing_spark.operators.similarity import lsh_bucket_topk
    from hdfs_stream_processing_spark.sources.io import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    sc = spark.sparkContext

    sc.setJobGroup("construct_with_dims", "plan-build only")
    lsh_bucket_topk(emb, num_planes=4, k=5, dims=64)
    assert list(sc.statusTracker().getJobIdsForGroup("construct_with_dims")) == []

    sc.setJobGroup("construct_probe", "dims=None fallback probes")
    lsh_bucket_topk(emb, num_planes=4, k=5)
    assert len(sc.statusTracker().getJobIdsForGroup("construct_probe")) >= 1
    sc.setJobGroup(None, None)


def test_hll_sketch_partial_merge_equals_whole(spark):
    """The property that makes sketches THE 100 TB distinct-count tool:
    per-partition partial sketches unioned together estimate exactly
    what one whole-data sketch does (merge is lossless for DataSketches
    HLL at the same lgK), so a 1000-executor fleet can aggregate
    distincts with a constant-size shuffle."""
    events = load_table(spark, SF_DIR, "events")
    whole = events.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("n")
    ).collect()[0]["n"]
    merged = (
        events.repartition(8)
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("n"))
        .collect()[0]["n"]
    )
    exact = events.select("user_id").distinct().count()
    assert whole == merged
    assert abs(whole - exact) / exact <= 0.05


def test_asof_join_forward_and_tolerance(spark):
    """merge_asof parity: forward picks the EARLIEST right at-or-after;
    tolerance nulls a match farther than the bound (whole row, never a
    blended partial)."""
    import datetime as dt

    from hdfs_stream_processing_spark.operators.temporal import asof_join

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    left = spark.createDataFrame(
        [(1, t(20), 100), (1, t(50), 101)], "user_id bigint, ts timestamp, event_id bigint"
    )
    right = spark.createDataFrame(
        [(1, t(5), 5.0), (1, t(30), 30.0), (1, t(45), 45.0)],
        "user_id bigint, ts timestamp, value double",
    )
    fwd = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["value"], direction="forward"
        ).collect()
    }
    # t(20) -> earliest at-or-after is t(30); t(50) -> nothing after -> NULL
    assert fwd == {100: 30.0, 101: None}

    tol = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["value"], tolerance=600.0
        ).collect()
    }
    # backward: t(20) matches t(5), 15 min ago > 10 min tolerance -> NULL;
    # t(50) matches t(45), 5 min ago -> kept
    assert tol == {100: None, 101: 45.0}

    # forward + tolerance composes: t(20)->t(30) is exactly 600s -> kept
    ft = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["value"],
            direction="forward", tolerance=600.0,
        ).collect()
    }
    assert ft == {100: 30.0, 101: None}


def test_gapfill_locf_densifies_and_carries(spark):
    from hdfs_stream_processing_spark.operators.temporal import gapfill_locf

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 10), ("a", "2024-01-01 03:00:00", 30),
         ("b", "2024-01-01 05:00:00", 7)],
        "k string, bucket string, v long",
    ).select("k", F.col("bucket").cast("timestamp").alias("bucket"), "v")
    out = {(r["k"], r["bucket"].hour): r for r in gapfill_locf(df, "k", "bucket", "v").collect()}
    assert len(out) == 5                                  # a: 4 dense hours, b: 1
    assert out[("a", 1)]["was_gap"] and out[("a", 1)]["v"] is None
    assert out[("a", 1)]["v_locf"] == 10                  # carried across the gap
    assert out[("a", 2)]["v_locf"] == 10
    assert out[("a", 3)]["v_locf"] == 30 and not out[("a", 3)]["was_gap"]
    assert out[("b", 5)]["v_locf"] == 7


def test_gapfill_interpolate_midpoints_and_edges(spark):
    from hdfs_stream_processing_spark.operators.temporal import gapfill_interpolate

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 10), ("a", "2024-01-01 03:00:00", 40)],
        "k string, bucket string, v long",
    ).select("k", F.col("bucket").cast("timestamp").alias("bucket"), "v")
    out = {r["bucket"].hour: r for r in gapfill_interpolate(df, "k", "bucket", "v").collect()}
    assert out[0]["v_interp"] == 10.0 and not out[0]["was_gap"]
    assert out[1]["v_interp"] == 20.0 and out[1]["was_gap"]   # 1/3 of the way
    assert out[2]["v_interp"] == 30.0
    assert out[3]["v_interp"] == 40.0


def test_sessionize_gap_boundary_and_ids(spark):
    from hdfs_stream_processing_spark.operators.analytics import sessionize

    df = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:00:00"), (2, 7, "2024-01-01 00:30:00"),
         (3, 7, "2024-01-01 01:00:01"), (4, 8, "2024-01-01 00:00:00")],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["event_id"]: r for r in
           sessionize(df, "user_id", "ts", 30, tiebreak_cols=["event_id"]).collect()}
    assert out[2]["session_idx"] == 0       # exactly 30 min still extends
    assert out[3]["session_idx"] == 1       # 30:01 gap starts a new one
    assert out[3]["session_id"] == "7:1"
    assert out[4]["session_idx"] == 0 and out[4]["session_id"] == "8:0"


def test_funnel_breaks_keep_users_and_stage_is_deepest(spark):
    from hdfs_stream_processing_spark.operators.analytics import funnel_steps

    rows = [
        (1, "view", "2024-01-01 00:00:00"), (1, "click", "2024-01-01 00:10:00"),
        (1, "purchase", "2024-01-01 00:20:00"),
        (2, "view", "2024-01-01 00:00:00"), (2, "click", "2024-01-01 00:05:00"),
        (3, "click", "2024-01-01 00:00:00"), (3, "view", "2024-01-01 00:10:00"),
        (4, "purchase", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string") \
        .select("user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["user_id"]: r for r in
           funnel_steps(df, "user_id", "ts", "event_type", ["view", "click", "purchase"]).collect()}
    assert out[1]["stage"] == 3
    assert out[2]["stage"] == 2 and out[2]["t_purchase"] is None
    # user 3's only click is BEFORE the first view: funnel breaks at 1,
    # but the user must remain in the table (regression: post-join
    # filter used to drop them)
    assert out[3]["stage"] == 1 and out[3]["t_click"] is None
    assert 4 not in out                      # never did step 1


def test_retention_day0_equals_cohort_size(spark):
    from hdfs_stream_processing_spark.operators.analytics import retention_cohorts

    rows = [(u, f"2024-01-0{d} 12:00:00") for u, days in
            [(1, [1, 2, 3]), (2, [1, 3]), (3, [2])] for d in days]
    df = spark.createDataFrame(rows, "user_id long, ts string") \
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    out = {(r["cohort_day"].day, r["day_offset"]): r["n_users"]
           for r in retention_cohorts(df, "user_id", "ts").collect()}
    assert out[(1, 0)] == 2 and out[(1, 1)] == 1 and out[(1, 2)] == 2
    assert out[(2, 0)] == 1


def test_funnel_conversion_lags_exact_percentiles(spark):
    """p50/p90 time-to-convert per transition: exact (n-1)p percentile
    interpolation over integer-microsecond gaps; broken funnels
    contribute to no transition past their break."""
    from hdfs_stream_processing_spark.operators.analytics import (
        funnel_conversion_lags,
        funnel_steps,
    )

    rows = [
        # users 1-3 convert view->click in 60s, 120s, 180s; only user 1
        # goes on to purchase (+600s)
        (1, "view", "2024-01-01 00:00:00"), (1, "click", "2024-01-01 00:01:00"),
        (1, "purchase", "2024-01-01 00:11:00"),
        (2, "view", "2024-01-01 00:00:00"), (2, "click", "2024-01-01 00:02:00"),
        (3, "view", "2024-01-01 00:00:00"), (3, "click", "2024-01-01 00:03:00"),
        (4, "view", "2024-01-01 00:00:00"),  # never clicks
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string") \
        .select("user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    fun = funnel_steps(df, "user_id", "ts", "event_type", ["view", "click", "purchase"])
    out = {r["transition"]: r for r in
           funnel_conversion_lags(fun, ["view", "click", "purchase"]).collect()}
    vc = out["view->click"]
    assert vc["n_converted"] == 3
    assert vc["p50_s"] == 120.0                 # median of 60/120/180
    assert vc["p90_s"] == 168.0                 # (n-1)p: 120 + 0.8*(180-120)
    cp = out["click->purchase"]
    assert cp["n_converted"] == 1 and cp["p50_s"] == 600.0 == cp["p90_s"]


def test_anomaly_zscore_flags_spike_not_baseline(spark):
    from hdfs_stream_processing_spark.operators.analytics import anomaly_zscore

    # stable series 100,102,...  then a 10x spike
    vals = [100, 102, 98, 101, 99, 100, 102, 1000, 101]
    df = spark.createDataFrame(
        [("a", f"2024-01-01 {h:02d}:00:00", v) for h, v in enumerate(vals)],
        "k string, bucket string, v long",
    ).select("k", F.col("bucket").cast("timestamp").alias("bucket"), "v")
    out = {r["bucket"].hour: r for r in
           anomaly_zscore(df, "k", "bucket", "v", window_rows=24).collect()}
    assert out[0]["zscore"] is None and out[0]["is_anomaly"] is False  # no baseline
    assert out[1]["zscore"] is None and out[1]["is_anomaly"] is False  # n=1
    assert out[7]["is_anomaly"] is True and out[7]["zscore"] > 3
    # the point after the spike is measured against a baseline that now
    # CONTAINS the spike - inflated std, so a normal value isn't flagged
    assert out[8]["is_anomaly"] is False
    assert all(not out[h]["is_anomaly"] for h in range(7))


def test_cms_overestimates_within_bound(spark):
    """Count-Min contract: est >= true count for EVERY item (never
    under), est - true <= N (trivial bound) and, at 4x256 over this
    vocabulary, the error stays far under N/width on the heavy tail;
    merging per-half sketches equals the one-shot sketch cell-for-cell
    (additivity)."""
    import pyspark.sql.functions as F

    from hdfs_stream_processing_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from hdfs_stream_processing_spark.sources.io import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    sketch = cms_build(counts, "token", "n")
    n_total = toks.count()

    est = cms_estimate(sketch, counts.select("token"), "token")
    both = counts.join(est, "token")
    assert both.where(F.col("est") < F.col("n")).count() == 0  # never under
    worst = both.agg(F.max(F.col("est") - F.col("n"))).collect()[0][0]
    assert worst <= n_total * 4 / 256  # e/width-style bound, generous

    # additivity: sketch(half1) + sketch(half2) == sketch(all)
    h1 = toks.where(F.crc32("token") % 2 == 0).groupBy("token").agg(
        F.count(F.lit(1)).alias("n"))
    h2 = toks.where(F.crc32("token") % 2 == 1).groupBy("token").agg(
        F.count(F.lit(1)).alias("n"))
    merged = cms_merge(cms_build(h1, "token", "n"), cms_build(h2, "token", "n"))
    assert (
        merged.alias("m")
        .join(sketch.alias("s"), ["row", "bucket"], "full")
        .where(~F.col("m.total").eqNullSafe(F.col("s.total")))
        .count()
        == 0
    )


def test_pagerank_exact_invariants(spark):
    """Integer PageRank: every rank >= the teleport floor; on a
    k-regular graph (a cycle) ranks are uniform and equal scale exactly
    (contribution = rank/2 each way, damping restores the total);
    higher-degree hubs outrank leaves on a star."""
    from hdfs_stream_processing_spark.operators.graph import pagerank_exact

    # 4-cycle: every node deg 2 both ways -> stationary at scale
    cyc = spark.createDataFrame(
        [(a, b) for a, b in [(1, 2), (2, 3), (3, 4), (4, 1)]], "src int, dst int"
    )
    edges = cyc.union(cyc.select("dst", "src"))
    got = {r["node"]: r["rank"] for r in pagerank_exact(edges, n_iters=3).collect()}
    assert set(got.values()) == {1_000_000}

    # star: hub 0 with 5 leaves
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "src int, dst int")
    sedges = star.union(star.select("dst", "src"))
    ranks = {r["node"]: r["rank"] for r in pagerank_exact(sedges, n_iters=2).collect()}
    assert ranks[0] > max(ranks[i] for i in range(1, 6))
    assert all(v >= 150_000 for v in ranks.values())


def test_hll_estimate_within_bound_and_merges(spark):
    """Open-register HLL: the estimate lands within 3 standard errors
    (1.04/sqrt(m)) of the true distinct count, and registers built on
    disjoint halves merge (bucket-wise MAX) to the whole-data table."""
    import pyspark.sql.functions as F

    from hdfs_stream_processing_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )
    from hdfs_stream_processing_spark.sources.io import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    regs = hll_registers(li, "l_partkey", b=6)
    true_n = li.select("l_partkey").distinct().count()
    est = hll_estimate(regs, b=6)
    rse = 1.04 / (64 ** 0.5)
    assert abs(est - true_n) <= 3 * rse * true_n, (est, true_n)

    h1 = hll_registers(li.where(F.col("l_orderkey") % 2 == 0), "l_partkey", b=6)
    h2 = hll_registers(li.where(F.col("l_orderkey") % 2 == 1), "l_partkey", b=6)
    merged = {
        (r["bucket"], r["max_rho"]) for r in hll_merge(h1, h2).collect()
    }
    whole = {(r["bucket"], r["max_rho"]) for r in regs.collect()}
    assert merged == whole


def test_bloom_filter_contracts(spark):
    """Bloom membership: zero false negatives (every true member
    survives the probe), and the false-positive rate on known
    non-members stays within ~2x of the analytic (1-e^(-kn/m))^k."""
    import math

    import pyspark.sql.functions as F

    from hdfs_stream_processing_spark.operators.sketch import (
        bloom_bits,
        bloom_probe,
    )
    from hdfs_stream_processing_spark.sources.io import load_table
    from tests.conftest import SF_DIR

    customer = load_table(spark, SF_DIR, "customer")
    keys = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    n = keys.count()
    m, k = 4096, 3
    bits = bloom_bits(keys, "c_custkey", n_bits=m, k=k)
    assert bits.count() <= min(n * k, m)

    probe = customer.select(F.col("c_custkey").alias("ck"))
    passed = bloom_probe(probe, "ck", bits, n_bits=m, k=k)
    survivors = {r["ck"] for r in passed.collect()}
    members = {r["c_custkey"] for r in keys.collect()}
    assert members <= survivors  # no false negatives, ever

    non_members = customer.count() - n
    fp = len(survivors - members)
    fpr_bound = (1 - math.exp(-k * n / m)) ** k
    assert fp <= max(2 * fpr_bound * non_members, 5), (fp, fpr_bound * non_members)


def test_fuzzy_pairs_symmetric_and_bounded(spark):
    """Edit-distance pairs: distance respects the length-difference
    lower bound on the prefixes and the blocking never pairs across
    sources."""
    import hdfs_stream_processing_spark.queries as Q
    from tests.conftest import SF_DIR

    rows = Q.QUERIES["fuzzy_pairs"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    assert all(r["prefix_dist"] >= 0 and r["doc_a"] < r["doc_b"] for r in rows)


def test_sample_weighted_is_biased_toward_weight(spark):
    """Priority sampling: the weighted sample's mean weight exceeds the
    population mean (PPS bias), per-stratum counts are exact, and the
    draw is reproducible."""
    import pyspark.sql.functions as F

    from hdfs_stream_processing_spark.operators.profile import sample_weighted
    from hdfs_stream_processing_spark.sources.io import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    )
    samp = sample_weighted(docs, "doc_id", "n_chars", k=5, strata=["source"])
    per_src = samp.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per_src)
    pop_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    samp_mean = samp.agg(F.avg("n_chars")).collect()[0][0]
    assert samp_mean > pop_mean
    again = sample_weighted(docs, "doc_id", "n_chars", k=5, strata=["source"])
    assert sorted(samp.collect()) == sorted(again.collect())


def test_ols_exact_matches_closed_form_and_nulls_constant_x(spark):
    import math

    rows = [("a", 1, 3), ("a", 2, 5), ("a", 3, 7), ("a", 4, 10),
            ("b", 5, 1), ("b", 5, 2), ("b", 5, 3)]  # b: constant x
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    from hdfs_stream_processing_spark.operators.aggregates import ols_exact

    out = {r["g"]: r for r in ols_exact(
        df, ["g"], F.col("x").cast("long"), F.col("y").cast("long")
    ).collect()}
    xs, ys = [1, 2, 3, 4], [3, 5, 7, 10]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    a = out["a"]
    assert math.isclose(a["slope"], slope, rel_tol=1e-12)
    assert math.isclose(a["intercept"], intercept, rel_tol=1e-12)
    assert math.isclose(a["r2"], r2, rel_tol=1e-12)
    b = out["b"]  # vertical line: undefined fit, all null
    assert b["slope"] is None and b["intercept"] is None and b["r2"] is None


def test_bfs_hops_min_distance_cycle_and_bound(spark):
    # 1→2→3→4→5 chain plus shortcut 1→4 and back-edge 3→1 (cycle)
    edges = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "4"), ("4", "5"), ("1", "4"), ("3", "1")],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([("1",)], ["node"])
    from hdfs_stream_processing_spark.operators.graph import bfs_hops

    got = {r["node"]: r["hops"] for r in bfs_hops(
        edges, seeds, max_hops=2
    ).collect()}
    # hop 2 bound: node 5 (dist 2 via 1→4→5) included, nothing at 3+
    assert got == {"1": 0, "2": 1, "4": 1, "3": 2, "5": 2}
    got3 = {r["node"]: r["hops"] for r in bfs_hops(
        edges, seeds, max_hops=3
    ).collect()}
    assert got3 == got  # graph exhausted at 2 hops; loop stops early


def test_jaccard_join_prefix_equals_brute_force(spark):
    rows = [
        (1, "a b c d e"),
        (2, "a b c d f"),   # J(1,2)=4/6
        (3, "a b c d e"),   # J(1,3)=1
        (4, "x y z"),
        (5, "x y z w"),     # J(4,5)=3/4
        (6, "q"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from hdfs_stream_processing_spark.operators.dedup import (
        jaccard_join_prefix,
        jaccard_pairs,
    )

    # t=3/5: exact rational ceil matters (0.6*5 floats to 3.0000000004;
    # a float ceil would shorten doc 1/2/3's prefix below the bound)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_join_prefix(df, "doc_id", "text", 3, 5).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(
            df, "doc_id", "text", shingle_n=1, min_jaccard=0.6
        ).collect()
    }
    assert got == want
    assert (1, 3) in got and got[(1, 3)] == 1.0
    assert (1, 2) in got and abs(got[(1, 2)] - 4 / 6) < 1e-15
    assert (4, 5) in got and got[(4, 5)] == 0.75


def test_build_vocab_ids_and_oov(spark):
    docs = spark.createDataFrame(
        [(1, "b a b c b a"), (2, "a c a")], ["doc_id", "text"]
    )
    from hdfs_stream_processing_spark.operators.text import (
        build_vocab,
        tokens_to_ids,
    )

    vocab = build_vocab(docs, "text")
    # freq: b=3, a=4, c=2 → ids by (freq desc, token asc): a=0, b=1, c=2
    assert {(r["token"], r["token_id"], r["freq"]) for r in vocab.collect()} == {
        ("a", 0, 4), ("b", 1, 3), ("c", 2, 2)
    }
    new = spark.createDataFrame([(9, "c z c")], ["doc_id", "text"])
    rows = sorted(
        (r["pos"], r["token_id"])
        for r in tokens_to_ids(new, "doc_id", "text", vocab).collect()
    )
    # order + duplicates preserved; unseen token 'z' maps to null (OOV)
    assert rows == [(0, 2), (1, None), (2, 2)]


def test_attribution_first_last_touch_and_direct(spark):
    rows = [
        # user 1: ad → email → purchase(100) → purchase(50)
        (1, 1.0, "e1", "ad", None),
        (1, 2.0, "e2", "email", None),
        (1, 3.0, "e3", "purchase", 1.00),
        (1, 4.0, "e4", "purchase", 0.50),
        # user 2: purchase with no prior touch → direct
        (2, 1.0, "e5", "purchase", 2.00),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type", "value"]
    )
    from hdfs_stream_processing_spark.operators.analytics import attribution

    cents = F.coalesce(F.round(F.col("value") * 100, 0).cast("long"), F.lit(0))
    got = {
        (r["model"], r["channel"]): (r["revenue_cents"], r["n_conversions"])
        for r in attribution(
            df, "user_id", "ts", "event_type", cents,
            conversion="purchase", tiebreak_cols=["event_id"],
        ).collect()
    }
    assert got == {
        ("first_touch", "ad"): (150, 2),      # both purchases: first touch = ad
        ("last_touch", "email"): (150, 2),    # last non-purchase before each
        ("first_touch", "direct"): (200, 1),
        ("last_touch", "direct"): (200, 1),
    }


def test_wide_accumulators_survive_int64_overflow_and_match_narrow(spark):
    """Scale-correctness contract for the exact-sufficient-statistics
    family (the sf0.1 bench caught n·Σy² overflowing int64; the SUMS
    themselves overflow ~2 decades later).  (1) On operands where a
    single y² already exceeds 2⁶³, wide=True still returns the exact
    closed-form answer while the narrow long path raises under ANSI.
    (2) Where both are in range, wide and narrow are bit-identical."""
    import math

    import pytest

    from hdfs_stream_processing_spark.operators.aggregates import (
        corr_exact, ols_exact,
    )

    # y ≈ 3.1e9 → y² ≈ 9.6e18 > 2⁶³−1: per-row product overflows long
    big = [("g", 1, 3_100_000_000), ("g", 2, 6_200_000_000),
           ("g", 3, 9_300_000_001)]
    bdf = spark.createDataFrame(big, ["g", "x", "y"])
    x, y = F.col("x").cast("long"), F.col("y").cast("long")

    import pyspark.errors

    with pytest.raises(pyspark.errors.PySparkException):
        ols_exact(bdf, ["g"], x, y).collect()

    out = ols_exact(bdf, ["g"], x, y, wide=True).collect()[0]
    xs = [r[1] for r in big]
    ys = [r[2] for r in big]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    assert math.isclose(out["slope"], slope, rel_tol=1e-12)
    r2 = float(n * sxy - sx * sy) ** 2 / (
        float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    )
    assert math.isclose(out["r2"], r2, rel_tol=1e-12)

    c = corr_exact(bdf, ["g"], x, y, wide=True).collect()[0]
    assert math.isclose(c["corr"], math.sqrt(r2), rel_tol=1e-12)

    from hdfs_stream_processing_spark.operators.aggregates import corr_matrix

    m = corr_matrix(bdf, {"x": x, "y": y}, wide=True).collect()[0]
    assert math.isclose(m["corr"], math.sqrt(r2), rel_tol=1e-12)

    # in-range operands: wide must be bit-identical to narrow
    small = [("a", i, 7 * i + 3 + (i % 5)) for i in range(1, 40)]
    sdf = spark.createDataFrame(small, ["g", "x", "y"])
    for fn in (ols_exact, corr_exact):
        narrow = fn(sdf, ["g"], x, y).collect()
        wide = fn(sdf, ["g"], x, y, wide=True).collect()
        assert [r.asDict() for r in narrow] == [r.asDict() for r in wide]


def test_bfs_hops_bigint_node_ids_no_lossy_coercion(spark):
    """ADVICE r6: bigint edge endpoints vs string seeds used to rely on
    implicit string=bigint coercion (via double, lossy above 2^53).
    Both sides now cast to string explicitly — ids above 2^53 where
    double rounding would merge distinct nodes must stay distinct."""
    big = 2**53
    # big and big+1 are indistinguishable as doubles
    edges = spark.createDataFrame(
        [(1, big), (1, big + 1), (big, 7)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(str(1),)], ["node"])
    from hdfs_stream_processing_spark.operators.graph import bfs_hops

    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=2).collect()}
    assert got == {"1": 0, str(big): 1, str(big + 1): 1, "7": 2}


def test_attribution_rejects_reserved_column_collision(spark):
    """ADVICE r6: an input column named _first/_cents etc. would be
    silently replaced by withColumn and corrupt the attribution —
    explicit ValueError instead (mirrors purge_cascade's guard)."""
    import pytest
    from pyspark.sql import functions as F

    from hdfs_stream_processing_spark.operators.analytics import attribution

    df = spark.createDataFrame(
        [(1, 1, "view", 5), (1, 2, "purchase", 7)],
        ["user_id", "ts", "event_type", "_cents"],
    )
    with pytest.raises(ValueError, match="_cents"):
        attribution(df, "user_id", "ts", "event_type", F.col("_cents"), "purchase")


def test_tokens_to_ids_shuffle_join_fallback_matches_broadcast(spark):
    """ADVICE r6: broadcast=False is the escape hatch for vocabularies
    past broadcast range — same result through the shuffle join."""
    from hdfs_stream_processing_spark.operators.text import tokens_to_ids

    docs = spark.createDataFrame([(1, "a b a c"), (2, "c d")], ["doc_id", "text"])
    vocab = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 2)], ["token", "token_id"]
    )
    want = sorted(
        tuple(r) for r in tokens_to_ids(docs, "doc_id", "text", vocab).collect()
    )
    got = sorted(
        tuple(r)
        for r in tokens_to_ids(
            docs, "doc_id", "text", vocab, broadcast=False
        ).collect()
    )
    assert got == want
    assert (2, 1, None) in got  # OOV token 'd' keeps its row, id null


def test_ewma_weights_and_partial_horizon(spark):
    """EWMA with K=3: weights 4,2,1 on the newest..oldest of the last
    three points, normalized over the weights actually present."""
    from hdfs_stream_processing_spark.operators.analytics import ewma

    rows = [(1, i, v) for i, v in enumerate([10, 20, 40, None])]
    df = spark.createDataFrame(rows, "k long, seq long, v long")
    out = {r["seq"]: r["ewma"] for r in ewma(df, "k", ["seq"], "v", terms=3).collect()}
    assert out[0] == 10.0                              # 4*10/4
    assert out[1] == (4 * 20 + 2 * 10) / 6             # two points
    assert out[2] == (4 * 40 + 2 * 20 + 1 * 10) / 7    # full horizon
    # null current value: weight 4 drops from num AND den
    assert out[3] == (2 * 40 + 1 * 20) / 3


def test_ewma_null_only_frame_yields_null_not_inf(spark):
    from hdfs_stream_processing_spark.operators.analytics import ewma

    df = spark.createDataFrame([(1, 0, None)], "k long, seq long, v long")
    [r] = ewma(df, "k", ["seq"], "v", terms=2).collect()
    assert r["ewma"] is None


def test_ewma_rejects_overflow_horizon(spark):
    import pytest

    from hdfs_stream_processing_spark.operators.analytics import ewma

    df = spark.createDataFrame([(1, 0, 1)], "k long, seq long, v long")
    with pytest.raises(ValueError, match="terms"):
        ewma(df, "k", ["seq"], "v", terms=63)


def test_tfidf_ranks_on_exact_keys(spark):
    """Rank order is rounded score DESC (ADVICE r7): a high-tf ubiquitous
    term (df=N, score 0) is excluded outright, and rank agrees with score."""
    import math
    from hdfs_stream_processing_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "x x shared rare"),   # x tf=2; shared df=2=N; rare df=1
            (2, "shared other"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(df, "doc_id", "text", k=4).collect()
    d1 = sorted(
        ((r["rank"], r["token"]) for r in out if r["doc_id"] == 1)
    )
    # 'shared' (df=N, score 0) is excluded; x: 2·ln2 beats rare: 1·ln2
    assert d1 == [(1, "x"), (2, "rare")]
    assert not [r for r in out if r["token"] == "shared"]
    by_tok = {r["token"]: r for r in out if r["doc_id"] == 1}
    assert by_tok["x"]["score"] == round(2 * math.log(2), 6)
    assert by_tok["rare"]["score"] == round(math.log(2), 6)
    # rank order and score order agree within the document
    ranked = sorted((r["rank"], r["score"]) for r in out if r["doc_id"] == 1)
    assert [s for _, s in ranked] == sorted(
        (s for _, s in ranked), reverse=True
    )


def test_tfidf_scores_clear_of_rounding_boundaries(spark):
    """ADVICE r8 (text.py): the accepted residual risk of ranking on a
    6-dp-rounded double is a score within ~1e-15 of a rounding
    boundary flipping across engines.  Verify the gate corpora stay far
    from that cliff: over EVERY scored (doc, token) pair at sf0.01 and
    sf0.1 (rank membership depends on all candidates, not just top-k),
    the unrounded score's distance to the nearest x.xxxxx5 boundary is
    ≥ 1e-10 (measured minimum 3.0e-10 at sf0.1) — ≥500× the worst-case
    cross-engine ulp of any score in the corpus."""
    from hdfs_stream_processing_spark.operators.text import tfidf_top_terms

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        docs = load_table(spark, sf_dir, "documents")
        all_pairs = tfidf_top_terms(docs, "doc_id", "text", k=1 << 40)
        n_docs = docs.select(F.countDistinct("doc_id")).collect()[0][0]
        exact = (
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
        )
        frac = (exact * 1e6) % 1.0
        [row] = (
            all_pairs.select(
                (F.abs(frac - 0.5) * 1e-6).alias("margin")
            )
            .agg(F.min("margin").alias("m"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert row["n"] > 0
        assert row["m"] >= 1e-10, f"{sf_dir}: margin {row['m']}"


def test_triangle_count_known_graph(spark):
    """K4 minus one edge has 2 triangles; duplicates/self-loops/reversed
    edges must not change the count."""
    from hdfs_stream_processing_spark.operators.graph import triangle_count

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4),  # K4 minus (3,4)
        (2, 1),  # reversed duplicate
        (3, 3),  # self-loop
        (1, 2),  # exact duplicate
        (5, 6),  # isolated edge: nodes count, no triangle
    ]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    [r] = triangle_count(df).collect()
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (6, 6, 2)


def test_clustering_coefficient_known_graph(spark):
    """Triangle 1-2-3 plus pendant 4 attached to 3: nodes 1,2 have
    coeff 1.0; node 3 has degree 3 and one triangle -> 1/3; pendant 4
    has degree 1 -> null (undefined, not zero)."""
    from hdfs_stream_processing_spark.operators.graph import clustering_coefficient

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["id_a", "id_b"]
    )
    out = {r["node"]: (r["degree"], r["n_tri"], r["coeff"])
           for r in clustering_coefficient(df).collect()}
    assert out[1] == (2, 1, 1.0)
    assert out[2] == (2, 1, 1.0)
    assert out[3][0] == 3 and out[3][1] == 1 and abs(out[3][2] - 1 / 3) < 1e-15
    assert out[4] == (1, 0, None)


def test_table_checksum_is_order_invariant_and_content_sensitive(spark):
    from pyspark.sql import functions as F

    from hdfs_stream_processing_spark.operators.quality import table_checksum

    rows = [(1, "a"), (2, "b"), (3, "c")]
    cols = lambda: [F.col("k"), F.col("s")]  # noqa: E731
    a = spark.createDataFrame(rows, "k long, s string")
    # reversed row order, different partitioning — same checksum
    b = spark.createDataFrame(rows[::-1], "k long, s string").repartition(7)
    ca = table_checksum(a, "t", cols()).collect()[0]
    cb = table_checksum(b, "t", cols()).collect()[0]
    assert (ca["n_rows"], ca["checksum"]) == (cb["n_rows"], cb["checksum"])
    # one changed byte -> different checksum, same row count
    c = spark.createDataFrame([(1, "a"), (2, "b"), (3, "d")], "k long, s string")
    cc = table_checksum(c, "t", cols()).collect()[0]
    assert cc["n_rows"] == ca["n_rows"] and cc["checksum"] != ca["checksum"]


def test_lateness_profile_two_level_prefix_equals_direct_scan(spark):
    """The chunked prefix-max must agree with a direct running max —
    including across chunk boundaries (chunk=4 forces several)."""
    import datetime as dt

    from hdfs_stream_processing_spark.operators.analytics import lateness_profile

    base = dt.datetime(2024, 1, 1)
    # arrival seq 0..9; event times deliberately out of order (minutes)
    mins = [10, 5, 20, 1, 30, 2, 25, 40, 3, 50]
    rows = [(i, base + dt.timedelta(minutes=m)) for i, m in enumerate(mins)]
    df = spark.createDataFrame(rows, "seq long, ts timestamp")
    out = {
        r["delay_sec"]: (r["n_late"], r["share"])
        for r in lateness_profile(
            df, "seq", "ts", delays_sec=[0, 600, 1800], chunk=4
        ).collect()
    }
    # direct computation: lateness_i = max(ts[<i]) - ts[i]
    late = []
    run = None
    for m in mins:
        late.append(max(0, (run or m) - m) * 60)  # seconds
        run = m if run is None else max(run, m)
    for d in (0, 600, 1800):
        n = sum(1 for s in late if s > d)
        assert out[d] == (n, n / len(mins)), (d, out[d], late)


def test_cluster_representatives_by_policy_and_bypass(spark):
    """Survivor = first under the policy order (longest, id tiebreak);
    unclustered rows pass through without entering the window."""
    from pyspark.sql import functions as F

    from hdfs_stream_processing_spark.operators.graph import (
        cluster_representatives_by,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (9, 5)], ["doc_id", "n_chars"]
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], ["id", "component"]
    )
    out = sorted(
        r["doc_id"]
        for r in cluster_representatives_by(
            docs, comp, "doc_id",
            [F.col("n_chars").desc(), F.col("doc_id").asc()],
        ).collect()
    )
    # cluster {1,2,3}: 2 and 3 tie on n_chars, id tiebreak keeps 2;
    # 9 unclustered, survives
    assert out == [2, 9]


def test_interval_peak_end_exclusive_and_first_day(spark):
    """Sweep-line semantics: an interval closing on day D does not
    overlap one opening on day D (end-exclusive); peak is the max
    concurrency; peak_day is the FIRST day the peak is reached; a
    brute-force day-by-day count agrees."""
    import datetime as dt

    from hdfs_stream_processing_spark.operators.temporal import interval_peak

    d = lambda n: dt.date(2024, 1, 1) + dt.timedelta(days=n)
    # group "a": [0,3) [1,4) [2,5) -> peak 3 on day 2; [3,6) opens the
    # day [0,3) closes -> still 3 (end-exclusive; would be 4 inclusive)
    # group "b": [0,2) [5,7) never overlap -> peak 1 on day 0
    rows = [
        ("a", d(0), d(3)), ("a", d(1), d(4)), ("a", d(2), d(5)),
        ("a", d(3), d(6)),
        ("b", d(0), d(2)), ("b", d(5), d(7)),
    ]
    df = spark.createDataFrame(rows, "g string, s date, e date")
    got = {
        r["g"]: (r["peak"], r["peak_day"])
        for r in interval_peak(df, "g", "s", "e").collect()
    }
    # brute force: count open intervals per day
    for g in ("a", "b"):
        iv = [(s, e) for gg, s, e in rows if gg == g]
        days = [d(n) for n in range(0, 8)]
        counts = [(day, sum(1 for s, e in iv if s <= day < e)) for day in days]
        peak = max(c for _, c in counts)
        first = min(day for day, c in counts if c == peak)
        assert got[g] == (peak, first), (g, got[g], counts)
    assert got["a"][0] == 3  # end-exclusive: NOT 4


def test_interval_peak_reserved_column_guard(spark):
    import datetime as dt

    from hdfs_stream_processing_spark.operators.temporal import interval_peak

    df = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), dt.date(2024, 1, 2), 1)],
        "g string, s date, e date, peak int",
    )
    import pytest

    with pytest.raises(ValueError, match="reserved"):
        interval_peak(df, "g", "s", "e")


def test_jaccard_pairs_max_doc_freq_universe_is_full_input(spark):
    """ADVICE r7 (dedup.py): combining candidates + max_doc_freq must
    count document frequency over the FULL input, not just the docs the
    candidate pre-filter keeps.  Shingle "c" lives in 3 docs (two of
    them candidates) — with max_doc_freq=2 it must be dropped even
    though its df over candidate docs alone would be 2."""
    from hdfs_stream_processing_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c z q")], ["doc_id", "text"]
    )
    cand = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    [row] = jaccard_pairs(
        df, "doc_id", "text", shingle_n=1, min_jaccard=0.0,
        candidates=cand, max_doc_freq=2,
    ).collect()
    # "c" (df=3) dropped from BOTH docs: A'=B'={a,b} → J=1.0 over the
    # filtered universe; the buggy candidate-local df would keep "c"
    assert (row["id_a"], row["id_b"]) == (1, 2)
    assert row["jaccard"] == 1.0
    assert row["n_inter"] == 2 if "n_inter" in row.asDict() else True


def test_jaccard_pairs_max_doc_freq_forwards_min_jaccard(spark):
    """ADVICE r8 (dedup.py:526): the candidates+max_doc_freq path
    recursed into jaccard_pairs WITHOUT forwarding min_jaccard, so a
    non-default threshold silently became 0.5.  Docs 1/2 share "a" of
    filtered universe {a,b,x,y} → J=0.25: min_jaccard=0.0 must emit
    it, min_jaccard=0.8 must not."""
    from hdfs_stream_processing_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [(1, "a b x s"), (2, "a y s"), (3, "s q")], ["doc_id", "text"]
    )
    cand = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    # "s" (df=3) is dropped; A'={a,b,x}, B'={a,y} → J = 1/4 = 0.25
    [row] = jaccard_pairs(
        df, "doc_id", "text", shingle_n=1, min_jaccard=0.0,
        candidates=cand, max_doc_freq=2,
    ).collect()
    assert (row["id_a"], row["id_b"]) == (1, 2)
    assert abs(row["jaccard"] - 0.25) < 1e-12
    assert not jaccard_pairs(
        df, "doc_id", "text", shingle_n=1, min_jaccard=0.8,
        candidates=cand, max_doc_freq=2,
    ).collect()


def test_ewma_large_magnitudes_do_not_overflow(spark):
    """ADVICE r7 (analytics.py): value·2^(terms−1) must not wrap a
    long.  5e18 cents with terms=8 puts the lead term at 6.4e20 —
    far past 2^63 ≈ 9.2e18 — and must still average exactly."""
    from hdfs_stream_processing_spark.operators.analytics import ewma

    big = 5_000_000_000_000_000_000  # 5e18, fits a long on its own
    df = spark.createDataFrame(
        [(1, 1, big), (1, 2, big)], ["k", "t", "v"]
    )
    out = {r["t"]: r["ewma"] for r in ewma(df, "k", ["t"], "v", terms=8).collect()}
    # every observation equals `big`, so the weighted mean is exactly
    # big regardless of weights — any overflow shows up as a wild value
    assert out[1] == float(big)
    assert out[2] == float(big)


# ---- round 8: boilerplate chunks, entropy, IVM delta join / retraction,
# ---- basket rules


def test_boilerplate_chunks_flags_cross_doc_only(spark):
    """A chunk value repeated WITHIN one document is not boilerplate;
    the same value across two documents is.  Token accounting must
    split exactly into kept + dropped."""
    from hdfs_stream_processing_spark.operators.llmdata import boilerplate_chunks

    df = spark.createDataFrame(
        [
            (1, "a b a b x y"),   # chunks (size 2): 'a b','a b','x y'
            (2, "x y q r"),       # chunks: 'x y','q r'
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           boilerplate_chunks(df, "doc_id", "text", chunk_size=2).collect()}
    # 'a b' appears twice but only in doc 1 -> NOT boilerplate;
    # 'x y' appears in both docs -> boilerplate.
    assert out[1]["n_chunks"] == 3 and out[1]["n_boiler_chunks"] == 1
    assert out[1]["n_tokens"] == 6 and out[1]["kept_tokens"] == 4
    assert out[2]["n_chunks"] == 2 and out[2]["n_boiler_chunks"] == 1
    assert out[2]["kept_tokens"] == 2
    import pytest as _pytest
    with _pytest.raises(ValueError, match="min_docs"):
        boilerplate_chunks(df, "doc_id", "text", min_docs=1)


def test_token_entropy_known_distributions(spark):
    """Constant text has zero entropy; a uniform 4-token doc has ln(4)."""
    import math
    from hdfs_stream_processing_spark.operators.text import token_entropy

    df = spark.createDataFrame(
        [(1, "w w w w"), (2, "a b c d")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in token_entropy(df, "doc_id", "text").collect()}
    assert out[1]["entropy_nats"] == 0.0
    assert out[1]["n_distinct"] == 1
    assert abs(out[2]["entropy_nats"] - math.log(4)) < 1e-5
    assert out[2]["n_tokens"] == 4


def test_delta_join_matches_full_recompute(spark):
    """V_old ∪ ΔL⋈R_old ∪ L_old⋈ΔR ∪ ΔL⋈ΔR == full L⋈R on any
    insert-only split — including delta-delta matches."""
    from hdfs_stream_processing_spark.operators.incremental import delta_join

    L = spark.createDataFrame([(k, f"l{k}") for k in range(10)], ["k", "lv"])
    R = spark.createDataFrame([(k % 5, f"r{k}") for k in range(10)], ["k", "rv"])
    dl = L.where(F.col("k") % 3 == 0)
    lo = L.where(F.col("k") % 3 != 0)
    dr = R.where(F.col("rv").isin("r7", "r8"))
    ro = R.where(~F.col("rv").isin("r7", "r8"))
    v_old = lo.join(ro, "k")
    got = sorted(
        map(tuple, delta_join(v_old, lo, dl, ro, dr, "k").collect())
    )
    want = sorted(map(tuple, L.join(R, "k").collect()))
    assert got == want and len(want) > 0


def test_agg_retract_merge_known_deltas(spark):
    """Insert adds (+1,+v); update adds (0, new−old); delete subtracts;
    a group retracted to n=0 disappears (matches a recompute)."""
    from hdfs_stream_processing_spark.operators.incremental import (
        agg_retract_merge,
    )

    existing = spark.createDataFrame(
        [("a", 2, 100), ("b", 1, 50)], ["g", "n", "s"]
    )
    cdc = spark.createDataFrame(
        [
            ("a", "I", 30, None),    # a: n 2->3, s 100->130
            ("a", "U", 25, 10),      # a: s +15
            ("b", "D", None, 50),    # b: n 1->0 -> dropped
        ],
        "g string, op string, new_val long, old_val long",
    )
    out = {r["g"]: (r["n"], r["s"]) for r in
           agg_retract_merge(existing, cdc, ["g"], "n", "s").collect()}
    assert out == {"a": (3, 145)}


def test_basket_pairs_counts_and_guard(spark):
    """Pair counts are per-basket-distinct; lift is exact; the
    max_items_per_basket guard drops mega-baskets before pairing."""
    from hdfs_stream_processing_spark.operators.analytics import basket_pairs

    rows = [
        (1, "x"), (1, "y"), (1, "x"),      # duplicate x collapses
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "m"), (4, "n"), (4, "o"),      # width-3 basket
    ]
    df = spark.createDataFrame(rows, ["b", "i"])
    out = {(r["item_a"], r["item_b"]): r for r in
           basket_pairs(df, "b", "i", min_pair_count=2).collect()}
    assert list(out) == [("x", "y")]
    r = out[("x", "y")]
    # n_baskets=4, c_x=3, c_y=2, c_xy=2: lift = 4*2/(3*2)
    assert r["pair_count"] == 2 and r["count_a"] == 3 and r["count_b"] == 2
    assert r["lift"] == round(8 / 6, 6)
    guarded = basket_pairs(
        df, "b", "i", min_pair_count=1, max_items_per_basket=2
    ).collect()
    assert not [r for r in guarded if r["item_a"] in ("m", "n")]


def test_winsorize_bounds_and_clip(spark):
    """Bounds are the exact floor(q*(n-1))+1-th order statistics; values
    outside clip TO the bound, inside pass through unchanged."""
    import pytest as _pytest
    from hdfs_stream_processing_spark.operators.analytics import winsorize

    # group g: values 0..20 -> n=21, k_lo = floor(.05*20)+1 = 2 (value 1),
    # k_hi = floor(.95*20)+1 = 20 (value 19)
    df = spark.createDataFrame([("g", v) for v in range(21)], ["g", "v"])
    out = winsorize(df, ["g"], "v", lo_q=0.05, hi_q=0.95)
    assert "_v" not in out.columns  # ADVICE r8: working column stays internal
    rows = {r["v"]: r for r in out.collect()}
    assert rows[0]["lo_bound"] == 1 and rows[0]["hi_bound"] == 19
    assert rows[0]["winsorized"] == 1      # clipped up
    assert rows[20]["winsorized"] == 19    # clipped down
    assert rows[10]["winsorized"] == 10    # untouched
    with _pytest.raises(ValueError, match="lo_q"):
        winsorize(df, ["g"], "v", lo_q=0.9, hi_q=0.1)
    with _pytest.raises(ValueError, match="reserved"):
        winsorize(df.withColumn("lo_bound", F.lit(1)), ["g"], "v")


def test_kcore_peel_cascades(spark):
    """Triangle a-b-c (deg 2 each) with pendant d-a: k=2 peels d in
    round 1 (deg 1); the triangle survives with residual degree 2.
    A second round after the cascade changes nothing (fixpoint)."""
    from hdfs_stream_processing_spark.operators.graph import kcore_peel

    und = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")]
    sym = und + [(d, s) for (s, d) in und]
    edges = spark.createDataFrame(sym, "src string, dst string")
    got = {
        r.node: r.deg for r in kcore_peel(edges, k=2, n_iters=2).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2}

    # chain cascade: path a-b-c-d-e at k=2 peels endpoints each round
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    sym2 = chain + [(d, s) for (s, d) in chain]
    e2 = spark.createDataFrame(sym2, "src string, dst string")
    assert kcore_peel(e2, k=2, n_iters=1).count() == 3  # b, c, d left
    assert kcore_peel(e2, k=2, n_iters=3).count() == 0  # fully unravels

    import pytest
    with pytest.raises(ValueError):
        kcore_peel(edges, k=0)


def test_kcore_lpa_broadcast_routes_agree(spark, monkeypatch):
    """r15 auto-route (VERDICT r14 #8): kcore_peel / label_propagation
    pick broadcast vs shuffled rounds from a bounded edge-count probe.
    Both routes must return identical results, and forcing the
    threshold to 0 must take the shuffled path without changing them."""
    from hdfs_stream_processing_spark.operators import graph
    from hdfs_stream_processing_spark.operators.graph import (
        kcore_peel,
        label_propagation,
    )

    und = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"), ("d", "e")]
    sym = und + [(d, s) for (s, d) in und]
    edges = spark.createDataFrame(sym, "src string, dst string")

    k_bcast = sorted(kcore_peel(edges, k=2, n_iters=2, broadcast_keep=True).collect())
    k_shuf = sorted(kcore_peel(edges, k=2, n_iters=2, broadcast_keep=False).collect())
    assert k_bcast == k_shuf

    l_bcast = sorted(label_propagation(edges, n_iters=2, broadcast_labels=True).collect())
    l_shuf = sorted(label_propagation(edges, n_iters=2, broadcast_labels=False).collect())
    assert l_bcast == l_shuf

    # default auto-route: tiny graph -> broadcast; threshold 0 -> shuffled
    assert sorted(kcore_peel(edges, k=2, n_iters=2).collect()) == k_bcast
    monkeypatch.setattr(graph, "BROADCAST_MAX_NODES", 0)
    assert sorted(kcore_peel(edges, k=2, n_iters=2).collect()) == k_bcast
    assert sorted(label_propagation(edges, n_iters=2).collect()) == l_bcast
