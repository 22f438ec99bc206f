"""Structured Streaming pipelines (SURVEY §2.9) — the north star:
streaming parse → classify → HDFS/Parquet sink with checkpointing.
"""

from hdfs_stream_processing_spark.streaming.pipeline import (  # noqa: F401
    cdc_merge_batch,
    classify_movement,
    enable_rocksdb_state,
    restore_confs,
    run_foreach_batch,
    run_foreach_batch_compacting,
    read_cdc_snapshot,
    run_stream_cdc,
    run_to_memory,
    run_to_parquet,
    session_window_agg,
    stream_dedup,
    stream_parquet_source,
    stream_window_agg,
    vacuum_cdc_tombstones,
)
