"""hdfs_stream_processing_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference pipeline
``VuBacktracking/hdfs-stream-processing`` (batch sensor-stream alignment,
Kafka-wire encode/decode, streaming parse→classify→Parquet-sink), built
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured Streaming
for streams, plus LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, Arrow).
- ``schemas``    : fixed StructType registry for every table (no inferSchema).
- ``sources``    : batch/streaming scans and sinks (CSV, Parquet, wire format).
- ``operators``  : relational + dedup + similarity operators (DataFrame→DataFrame).
- ``functions``  : scalar helpers (wire codec, time, json, deterministic math).
- ``plans``      : plan inspection/assertion helpers (pushdown, broadcast checks).
- ``streaming``  : Structured Streaming pipelines with HDFS/Parquet sinks.
- ``pipelines``  : reference-equivalent end-to-end batch pipelines.
"""

from hdfs_stream_processing_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
