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
