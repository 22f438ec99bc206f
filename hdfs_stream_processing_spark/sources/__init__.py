"""Batch sources and sinks."""

from hdfs_stream_processing_spark.sources.io import (  # noqa: F401
    load_table,
    load_tables,
    register_views,
    scan_csv_dir,
    write_parquet,
)
