"""Schema registry + IO round-trip (SURVEY §1.3, S1-S3)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdfs_stream_processing_spark.schemas import DRIVER_TABLES, ddl_for, schema_for
from hdfs_stream_processing_spark.sources.io import (
    load_table,
    scan_csv_dir,
    schema_checked,
    write_parquet,
)

from tests.conftest import SF_DIR


def test_registry_covers_all_driver_tables():
    expected = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert set(DRIVER_TABLES) == expected


def test_ddl_round_trips(spark):
    # the spark fixture: _parse_datatype_string needs an active session,
    # without it this test only passed when another file ran first
    for table in DRIVER_TABLES:
        ddl = ddl_for(table)
        parsed = T._parse_datatype_string(ddl)
        assert parsed == schema_for(table), table


def test_load_table_matches_registry(spark):
    for table in ["region", "nation", "orders", "events"]:
        df = load_table(spark, SF_DIR, table)
        schema_checked(df, table)  # raises on drift


def test_load_table_events_ts_is_timestamp(spark):
    df = load_table(spark, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    row = df.orderBy("event_id").first()
    assert row["ts"].year >= 2020


def test_schema_checked_raises_on_drift(spark):
    df = load_table(spark, SF_DIR, "region").withColumnRenamed("r_name", "oops")
    with pytest.raises(ValueError, match="schema drift"):
        schema_checked(df, "region")


def test_csv_and_parquet_round_trip(tmp_path, spark):
    df = load_table(spark, SF_DIR, "nation")
    csv_dir = str(tmp_path / "nation_csv")
    df.write.option("header", "true").csv(csv_dir)
    back = scan_csv_dir(spark, csv_dir, schema_for("nation"))
    assert sorted(back.collect()) == sorted(df.collect())

    pq_dir = str(tmp_path / "nation_pq")
    write_parquet(df, pq_dir)
    back_pq = spark.read.parquet(pq_dir)
    assert sorted(back_pq.collect()) == sorted(df.collect())


def test_compaction_collapses_small_files(tmp_path, spark):
    """compact_parquet_dir: a 32-fragment directory (streaming-sink
    debris) collapses to the byte-budgeted file count with identical
    content — the periodic rewrite every HDFS streaming deployment runs."""
    from hdfs_stream_processing_spark.sources.io import compact_parquet_dir

    df = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    frag = str(tmp_path / "frag")
    df.repartition(32).write.parquet(frag)
    assert len(spark.read.parquet(frag).inputFiles()) >= 32

    out = str(tmp_path / "compact")
    n_out = compact_parquet_dir(spark, frag, out, target_file_mb=128)
    assert n_out == 1  # tiny table, one 128 MB budget file
    assert sorted(spark.read.parquet(out).collect()) == sorted(df.collect())


def test_compaction_partitioned_layout(tmp_path, spark):
    from hdfs_stream_processing_spark.sources.io import compact_parquet_dir

    df = load_table(spark, SF_DIR, "events").select("event_id", "event_type", "value")
    frag = str(tmp_path / "pfrag")
    df.repartition(16).write.parquet(frag)
    out = str(tmp_path / "pcompact")
    compact_parquet_dir(spark, frag, out, target_file_mb=128, partition_by=["event_type"])
    back = spark.read.parquet(out)
    assert sorted(back.select("event_id", "event_type", "value").collect()) == sorted(df.collect())
    # partition pruning engages on the compacted layout
    assert back.where(F.col("event_type") == "click").count() == df.where(
        F.col("event_type") == "click"
    ).count()
