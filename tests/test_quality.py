"""Data-quality rule engine (operators/quality.py): one-pass rule
counting, null-predicate semantics, FK anti-join."""

import pytest

from pyspark.sql import functions as F

from hdfs_stream_processing_spark.operators.quality import dq_check, fk_violations


def test_dq_check_counts_and_null_predicates(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "ok"), (2, -5.0, "ok"), (3, 200.0, None), (4, 50.0, "bad!")],
        "id long, v double, tag string",
    )
    out = {r["rule"]: r["n_violations"] for r in dq_check(df, [
        ("v_in_range", (F.col("v") < 0) | (F.col("v") > 100)),
        ("tag_not_null", F.col("tag").isNull()),
        # NULL tag -> NULL predicate -> counts as NOT violated here
        ("tag_shape", ~F.col("tag").rlike(r"^[a-z]+$")),
    ]).collect()}
    assert out == {"v_in_range": 2, "tag_not_null": 1, "tag_shape": 1}


def test_dq_check_rejects_empty_rules(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        dq_check(df, [])


def test_fk_violations_counts_orphans_once_each(spark):
    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "x"), (9, "y")], "k long, payload string"
    )
    parent = spark.createDataFrame([(1,), (1,), (2,)], "pk long")  # dup parents ok
    (row,) = fk_violations(child, "k", parent, "pk", "fk").collect()
    assert row["rule"] == "fk" and row["n_violations"] == 2  # both k=9 rows


def test_dq_quarantine_routes_rows_with_reasons(spark):
    from hdfs_stream_processing_spark.operators.quality import dq_quarantine

    df = spark.createDataFrame(
        [(1, 50.0, "ok"), (2, -1.0, "ok"), (3, 200.0, None)],
        "id long, v double, s string",
    )
    rules = [
        ("v_range", (F.col("v") < 0) | (F.col("v") > 95)),
        ("s_not_null", F.col("s").isNull()),
    ]
    out = {r["id"]: (r["is_valid"], sorted(r["failed_rules"]))
           for r in dq_quarantine(df, rules).collect()}
    assert out == {
        1: (True, []),
        2: (False, ["v_range"]),
        3: (False, ["s_not_null", "v_range"]),
    }
    import pytest
    with pytest.raises(ValueError):
        dq_quarantine(df, [])


def test_cap_per_group_is_partitioning_independent(spark):
    from hdfs_stream_processing_spark.operators.llmdata import cap_per_group

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), i * 10) for i in range(20)],
        "id long, g string, score long",
    )
    pick = lambda parts: sorted(
        r["id"]
        for r in cap_per_group(
            df.repartition(parts), ["g"], [F.col("score").desc(), F.col("id")], 3
        ).collect()
    )
    assert pick(1) == pick(7) == [14, 15, 16, 17, 18, 19]


def test_k_anonymity_audit_flags_small_and_uniform_classes(spark):
    from hdfs_stream_processing_spark.operators.quality import k_anonymity_audit

    rows = [
        # class ("a", 1): 3 members, 3 distinct sensitive -> fails k=4, meets l
        ("a", 1, 10), ("a", 1, 11), ("a", 1, 12),
        # class ("a", 2): 4 members but ONE sensitive value -> meets k, fails l
        ("a", 2, 99), ("a", 2, 99), ("a", 2, 99), ("a", 2, 99),
        # class ("b", 1): singleton -> fails both
        ("b", 1, 5),
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 int, sens int")
    out = {
        (r.q1, r.q2): (r.class_size, r.n_sensitive, r.meets_k, r.meets_l)
        for r in k_anonymity_audit(df, ["q1", "q2"], "sens", k=4, l_div=2).collect()
    }
    assert out == {
        ("a", 1): (3, 3, False, True),
        ("a", 2): (4, 1, True, False),
        ("b", 1): (1, 1, False, False),
    }

    import pytest
    with pytest.raises(ValueError):
        k_anonymity_audit(df, [], "sens")
    with pytest.raises(ValueError):
        k_anonymity_audit(df, ["q1"], "sens", k=1)
