"""Incremental table maintenance (operators/incremental.py): CDC merge
semantics, SCD2 change suppression + interval closing, snapshot diff
statuses — each against hand-written expectations."""

from pyspark.sql import functions as F

from hdfs_stream_processing_spark.operators.incremental import (
    cdc_apply,
    scd2_build,
    scd2_merge,
    snapshot_diff,
)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seq long, op string, attr string"
    )


def test_cdc_apply_latest_wins_and_delete_removes(spark):
    log = _log(spark, [
        (1, 1, "I", "a"), (1, 2, "U", "b"),            # k=1 ends at b
        (2, 1, "I", "x"), (2, 2, "D", None),           # k=2 deleted
        (3, 1, "D", None), (3, 2, "I", "re"),          # k=3 re-inserted after delete
    ])
    out = {r["k"]: r["attr"]
           for r in cdc_apply(log, ["k"], ["seq"], "op").collect()}
    assert out == {1: "b", 3: "re"}


def test_cdc_apply_order_cols_break_ties(spark):
    # same seq, second order col decides the winner
    log = spark.createDataFrame(
        [(1, 5, 1, "U", "lo"), (1, 5, 2, "U", "hi")],
        "k long, seq long, sub long, op string, attr string",
    )
    out = cdc_apply(log, ["k"], ["seq", "sub"], "op").collect()
    assert len(out) == 1 and out[0]["attr"] == "hi"


def test_scd2_suppresses_repeats_and_closes_intervals(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "a"),     # repeat suppressed
         (1, 30, "b"), (1, 40, "a"),     # a again = NEW version
         (2, 10, "z")],
        "k long, t long, attr string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "attr")
    hist = scd2_build(df, ["k"], "ts", "attr").collect()
    k1 = sorted([r for r in hist if r["k"] == 1], key=lambda r: r["valid_from"])
    assert [r["attr"] for r in k1] == ["a", "b", "a"]
    assert [r["is_current"] for r in k1] == [False, False, True]
    # each version closes exactly where the next opens
    assert k1[0]["valid_to"] == k1[1]["valid_from"]
    assert k1[1]["valid_to"] == k1[2]["valid_from"]
    (k2,) = [r for r in hist if r["k"] == 2]
    assert k2["is_current"] and k2["valid_to"] is None


def test_scd2_merge_equals_rebuild(spark):
    """Merging a later batch into an existing SCD2 table must be
    row-identical to rebuilding from the unioned log.  Covers: open
    version closed by a differing change; same-attr first batch change
    suppressed across the boundary (version stays open); repeats inside
    the batch; a key new to the dimension; an untouched key."""
    rows = [
        (1, 10, "a"), (1, 20, "b"),      # k=1: open 'b' at 20
        (2, 10, "x"),                    # k=2: open 'x'
        (3, 10, "q"), (3, 20, "r"),      # k=3: untouched by the batch
    ]
    batch = [
        (1, 30, "b"), (1, 40, "c"),      # same-attr suppressed, then close
        (2, 30, "x"), (2, 35, "x"),      # all suppressed: 'x' stays open
        (4, 30, "new"), (4, 40, "new"), (4, 50, "v2"),  # brand-new key
    ]
    to_df = lambda rs: spark.createDataFrame(  # noqa: E731
        rs, "k long, t long, attr string"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "attr")
    existing = scd2_build(to_df(rows), ["k"], "ts", "attr")
    merged = scd2_merge(existing, to_df(batch), ["k"], "ts", "attr")
    rebuilt = scd2_build(to_df(rows + batch), ["k"], "ts", "attr")
    key = lambda r: (r["k"], r["valid_from"])  # noqa: E731
    assert sorted(merged.collect(), key=key) == sorted(rebuilt.collect(), key=key)


def test_scd2_multi_attribute_and_merge(spark):
    """Multi-attribute SCD2: a version opens when ANY tracked column
    changes (null-safe per column), all tracked columns ride along,
    and scd2_merge over a later batch equals the full rebuild."""
    to_df = lambda rs: spark.createDataFrame(  # noqa: E731
        rs, "k long, t long, a string, b double"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "a", "b")
    rows = [(1, 10, "x", 1.0), (1, 20, "x", 1.0),   # repeat suppressed
            (1, 30, "x", 2.0),                      # b changed -> new version
            (1, 40, None, 2.0)]                     # a -> NULL: real change
    hist = scd2_build(to_df(rows), ["k"], "ts", ["a", "b"]).collect()
    vs = sorted(hist, key=lambda r: r["valid_from"])
    assert [(r["a"], r["b"]) for r in vs] == [("x", 1.0), ("x", 2.0), (None, 2.0)]
    assert [r["is_current"] for r in vs] == [False, False, True]

    batch = [(1, 50, None, 2.0),    # both equal open version: suppressed
             (1, 60, "y", 2.0),     # a changed
             (2, 55, "new", 9.0)]   # new key
    merged = scd2_merge(
        scd2_build(to_df(rows), ["k"], "ts", ["a", "b"]),
        to_df(batch), ["k"], "ts", ["a", "b"],
    )
    rebuilt = scd2_build(to_df(rows + batch), ["k"], "ts", ["a", "b"])
    key = lambda r: (r["k"], r["valid_from"])  # noqa: E731
    assert sorted(merged.collect(), key=key) == sorted(rebuilt.collect(), key=key)


def test_scd2_null_transitions(spark):
    """ADVICE r5: value→NULL is a real change, consecutive NULLs are
    suppressed like any repeat, and a NULL-attr first row opens a
    version (positional first-row detection, not lag-IS-NULL)."""
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, None), (1, 30, None), (1, 40, "b"),
         (2, 10, None)],                   # first row per key with NULL attr
        "k long, t long, attr string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "attr")
    hist = scd2_build(df, ["k"], "ts", "attr").collect()
    k1 = sorted([r for r in hist if r["k"] == 1], key=lambda r: r["valid_from"])
    assert [r["attr"] for r in k1] == ["a", None, "b"]
    assert k1[0]["valid_to"] == k1[1]["valid_from"]      # a closes at NULL
    assert k1[1]["valid_to"] == k1[2]["valid_from"]      # NULL closes at b
    (k2,) = [r for r in hist if r["k"] == 2]
    assert k2["attr"] is None and k2["is_current"]


def test_snapshot_diff_null_key_rows(spark):
    """ADVICE r5: a NULL key never equi-joins, so the old-side row is
    'removed' and the new-side row 'added' — presence comes from the
    literal marker, not key nullness, so old/new values land on the
    correct side."""
    old = spark.createDataFrame([(None, "x", 1.0)], "k long, attr string, v double")
    new = spark.createDataFrame([(None, "y", 2.0)], "k long, attr string, v double")
    out = sorted(
        snapshot_diff(old, new, ["k"], ["attr", "v"]).collect(),
        key=lambda r: r["status"],
    )
    assert [r["status"] for r in out] == ["added", "removed"]
    added, removed = out
    assert added["new_attr"] == "y" and added["old_attr"] is None
    assert removed["old_attr"] == "x" and removed["new_attr"] is None


def test_snapshot_diff_statuses_and_nullsafe_compare(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "k long, attr string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),          # unchanged -> dropped
         (2, "b", 2.0),          # null -> value: changed (null-safe)
         (3, "CHANGED", 3.0),    # attr changed
         (5, "e", 5.0)],         # added; k=4 removed
        "k long, attr string, v double",
    )
    out = {r["k"]: r for r in
           snapshot_diff(old, new, ["k"], ["attr", "v"]).collect()}
    assert set(out) == {2, 3, 4, 5}
    assert out[2]["status"] == "changed" and out[2]["old_v"] is None
    assert out[3]["status"] == "changed" and out[3]["new_attr"] == "CHANGED"
    assert out[4]["status"] == "removed" and out[4]["new_attr"] is None
    assert out[5]["status"] == "added" and out[5]["old_attr"] is None


def test_pit_join_picks_version_valid_at_fact_time(spark):
    """Each fact matches the ONE dimension version whose interval
    contains its timestamp; facts before the key's first version (or
    with an unknown key) keep NULL attributes under how='left'."""
    from hdfs_stream_processing_spark.operators.incremental import pit_join

    dim = spark.createDataFrame(
        [(1, "bronze", 10, 30), (1, "gold", 30, None), (2, "silver", 5, None)],
        "k long, tier string, vf long, vt long",
    ).select(
        "k", "tier",
        F.timestamp_seconds("vf").alias("valid_from"),
        F.timestamp_seconds("vt").alias("valid_to"),
    )
    facts = spark.createDataFrame(
        [(100, 1, 15), (101, 1, 30),   # boundary: valid_from is inclusive
         (102, 1, 5),                  # before first version -> NULL
         (103, 2, 99), (104, 9, 50)],  # open version; unknown key
        "fid long, k long, t long",
    ).select("fid", "k", F.timestamp_seconds("t").alias("ts"))
    out = {
        r["fid"]: r["tier"]
        for r in pit_join(facts, dim, ["k"], "ts")
        .select("f.fid", "d.tier").collect()
    }
    assert out == {100: "bronze", 101: "gold", 102: None, 103: "silver", 104: None}


def test_pit_join_inner_drops_unmatched_and_never_duplicates(spark):
    from hdfs_stream_processing_spark.operators.incremental import pit_join

    dim = spark.createDataFrame(
        [(1, "a", 0, 10), (1, "b", 10, None)],
        "k long, attr string, vf long, vt long",
    ).select(
        "k", "attr",
        F.timestamp_seconds("vf").alias("valid_from"),
        F.timestamp_seconds("vt").alias("valid_to"),
    )
    facts = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 50), (3, 7, 5)], "fid long, k long, t long"
    ).select("fid", "k", F.timestamp_seconds("t").alias("ts"))
    out = pit_join(facts, dim, ["k"], "ts", how="inner").collect()
    # disjoint versions: at most one match per fact, unmatched dropped
    assert sorted((r["fid"], r["attr"]) for r in out) == [(1, "a"), (2, "b")]


def test_rollup_merge_equals_full_rebuild_and_handles_new_keys(spark):
    """Merging a batch's partial aggregate into the existing rollup must
    equal aggregating everything from scratch — including keys only in
    the batch, only in history, and present in both."""
    from hdfs_stream_processing_spark.operators.incremental import rollup_merge

    full = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 20), ("b", 1, 5), ("a", 2, 7), ("c", 2, 9)],
        "k string, day long, v long",
    )
    part = lambda df: df.groupBy("k", "day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    existing = part(full.where("day = 1"))
    merged = rollup_merge(existing, part(full.where("day = 2")), ["k", "day"], ["n", "s"])
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, part(full).collect()))
    assert got == want


def test_scd2_repair_rebuilds_time_travelers_and_merges_the_rest(spark):
    """The exact case plain merge cannot patch: a late row lands between
    a version's start and a later SUPPRESSED repeat of the same value.
    Rebuild-from-archive for that key; cheap merge for in-order keys."""
    from hdfs_stream_processing_spark.operators.incremental import (
        scd2_build,
        scd2_repair,
    )

    full = spark.createDataFrame(
        #  key 1: A@10, A@30 (suppressed repeat), late B@20 arrives in batch
        #  key 2: X@10 loaded, Y@40 arrives in order
        [(1, 10, "A"), (1, 30, "A"), (1, 20, "B"),
         (2, 10, "X"), (2, 40, "Y")],
        "k long, t long, attr string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "attr")
    late = (F.col("k") == 1) & (F.col("ts") == F.timestamp_seconds(F.lit(20)))
    in_batch = late | (F.col("ts") >= F.timestamp_seconds(F.lit(35)))
    loaded = full.where(~in_batch)
    existing = scd2_build(loaded, ["k"], "ts", "attr")
    hwm = loaded.groupBy("k").agg(F.max("ts").alias("max_ts"))
    out = scd2_repair(
        existing, full.where(in_batch), full, hwm, ["k"], "ts", "attr"
    )
    want = scd2_build(full, ["k"], "ts", "attr")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, want.collect()))
    # and the repaired key really has the 3-version A,B,A history
    k1 = sorted(
        (r["attr"] for r in out.where("k = 1").collect()),
    )
    assert k1 == ["A", "A", "B"]


def test_merge_into_clause_semantics(spark):
    """Standard MERGE: matched delete wins over update, matched rows
    update, unmatched targets pass through, unmatched sources insert
    (missing columns NULL), and without insert_values source-only rows
    are ignored."""
    from hdfs_stream_processing_spark.operators.incremental import merge_into

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, v long"
    )
    source = spark.createDataFrame(
        [(1, 5, False), (2, 99, True), (4, 7, False)], "k long, dv long, kill boolean"
    )
    out = merge_into(
        target,
        source,
        ["k"],
        update_set={"v": F.col("t.v") + F.col("s.dv")},
        insert_values={"k": F.col("s.k"), "v": F.col("s.dv")},
        delete_condition=F.col("s.kill"),
    )
    got = {r["k"]: (r["name"], r["v"]) for r in out.collect()}
    assert got == {
        1: ("a", 15),   # matched update
        3: ("c", 30),   # untouched target
        4: (None, 7),   # insert, name defaults NULL
    }  # 2 deleted

    no_ins = merge_into(
        target, source, ["k"],
        update_set={"v": F.col("t.v") + F.col("s.dv")},
        delete_condition=F.col("s.kill"),
    )
    assert sorted(r["k"] for r in no_ins.collect()) == [1, 3]


def test_purge_cascade_propagates_and_accounts_for_every_row(spark):
    from hdfs_stream_processing_spark.operators.incremental import purge_cascade

    users = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["uid", "name"]
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], ["oid", "uid"]
    )
    items = spark.createDataFrame(
        [(10, "x"), (10, "y"), (11, "z"), (12, "w"), (13, "v")],
        ["oid", "sku"],
    )
    # requests: uid 1 (fans out to 2 orders / 3 items), uid 99 (absent),
    # a duplicate, and a null (ignored)
    req = spark.createDataFrame(
        [(1,), (1,), (99,), (None,)], ["uid"]
    )
    audit, retained = purge_cascade(
        req,
        [
            ("users", users, "uid", "uid"),
            ("orders", orders, "uid", "oid"),
            ("items", items, "oid", None),
        ],
    )
    got = {r["table_name"]: (r["purged_rows"], r["retained_rows"])
           for r in audit.collect()}
    assert got == {"users": (1, 2), "orders": (2, 2), "items": (3, 2)}
    assert sorted(r["uid"] for r in retained["users"].collect()) == [2, 3]
    assert sorted(r["oid"] for r in retained["orders"].collect()) == [12, 13]
    assert sorted(set(r["oid"] for r in retained["items"].collect())) == [12, 13]
    assert retained["users"].columns == users.columns  # marker dropped

    # reserved marker column collides → explicit error, not silent loss
    bad = users.withColumnRenamed("name", "_purge_key")
    try:
        purge_cascade(req, [("users", bad, "uid", None)])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_run_purge_swaps_atomically_and_replays_as_noop(spark, tmp_path):
    """VERDICT r6 #5: purge_cascade composed with the atomic-swap sink.
    run_purge writes retained tables to staging, publishes via rename,
    and returns the POST-swap audit — which must show zero purged rows
    (the purge landed).  Replaying the same request list against the
    published tables must also be a complete no-op (idempotency), and
    untouched rows must survive byte-for-byte."""
    from hdfs_stream_processing_spark.operators.incremental import run_purge

    users_d = str(tmp_path / "users")
    orders_d = str(tmp_path / "orders")
    items_d = str(tmp_path / "items")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["uid", "name"]
    ).write.parquet(users_d)
    spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], ["oid", "uid"]
    ).write.parquet(orders_d)
    spark.createDataFrame(
        [(10, "x"), (10, "y"), (11, "z"), (12, "w"), (13, "v")],
        ["oid", "sku"],
    ).write.parquet(items_d)
    req = spark.createDataFrame([(1,), (99,)], ["uid"])
    hops = [
        ("users", users_d, "uid", "uid"),
        ("orders", orders_d, "uid", "oid"),
        ("items", items_d, "oid", None),
    ]

    post = run_purge(spark, req, hops)
    got = {r["table_name"]: (r["purged_rows"], r["retained_rows"])
           for r in post.collect()}
    assert got == {"users": (0, 2), "orders": (0, 2), "items": (0, 2)}
    # the published tables are the retained rows, marker-free
    assert sorted(r["uid"] for r in spark.read.parquet(users_d).collect()) == [2, 3]
    assert sorted(r["oid"] for r in spark.read.parquet(orders_d).collect()) == [12, 13]
    assert sorted(r["oid"] for r in spark.read.parquet(items_d).collect()) == [12, 13]
    assert spark.read.parquet(users_d).columns == ["uid", "name"]
    # no staging debris left behind
    import os
    assert not os.path.exists(users_d + "._staged")

    # replay: same requests again — nothing left to purge, tables stable
    post2 = run_purge(spark, req, hops)
    got2 = {r["table_name"]: (r["purged_rows"], r["retained_rows"])
            for r in post2.collect()}
    assert got2 == {"users": (0, 2), "orders": (0, 2), "items": (0, 2)}
    assert sorted(r["uid"] for r in spark.read.parquet(users_d).collect()) == [2, 3]


def test_subject_export_attributes_records_per_subject(spark):
    from hdfs_stream_processing_spark.operators.incremental import subject_export
    from pyspark.sql import functions as F

    cust = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "ck long, name string")
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], "ok long, ck long"
    )
    items = spark.createDataFrame(
        [(10, 1), (10, 2), (12, 1)], "ok long, ln long"
    )
    out = subject_export(
        spark.createDataFrame([(1,), (2,)], "k long").select("k"),
        [
            ("customer", cust, "ck", "ck", F.col("ck")),
            ("orders", orders, "ck", "ok", F.col("ok")),
            (
                "lineitem", items, "ok", None,
                F.concat(F.col("ok").cast("string"), F.lit("#"), F.col("ln").cast("string")),
            ),
        ],
    )
    rows = {(r.subject_key, r.table_name, r.record_key) for r in out.collect()}
    # subject 1: itself, orders 10+11, lines of order 10; subject 2:
    # itself, order 12, its line; subject 3 never requested -> absent
    assert rows == {
        (1, "customer", "1"), (1, "orders", "10"), (1, "orders", "11"),
        (1, "lineitem", "10#1"), (1, "lineitem", "10#2"),
        (2, "customer", "2"), (2, "orders", "12"), (2, "lineitem", "12#1"),
    }


def test_subject_export_rejects_reserved_columns(spark):
    import pytest
    from hdfs_stream_processing_spark.operators.incremental import subject_export
    from pyspark.sql import functions as F

    bad = spark.createDataFrame([(1, 2)], "_sar_root long, ck long")
    with pytest.raises(ValueError, match="_sar_root"):
        subject_export(
            spark.createDataFrame([(1,)], "k long"),
            [("t", bad, "ck", None, F.col("ck"))],
        )


def test_subject_export_plan_is_broadcast_only(spark):
    # zero fact-side exchange: every hop probes via broadcast join
    from hdfs_stream_processing_spark.operators.incremental import subject_export
    from hdfs_stream_processing_spark.plans.inspect import physical_plan
    from pyspark.sql import functions as F

    cust = spark.createDataFrame([(1, "a")], "ck long, name string")
    orders = spark.createDataFrame([(10, 1)], "ok long, ck long")
    out = subject_export(
        spark.createDataFrame([(1,)], "k long"),
        [
            ("customer", cust, "ck", "ck", F.col("ck")),
            ("orders", orders, "ck", None, F.col("ok")),
        ],
    )
    plan = physical_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
