"""Schema registry + IO round-trip (SURVEY §1.3, S1-S3)."""

import pytest
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


def test_ddl_round_trips():
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
