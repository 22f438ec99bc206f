"""Kafka source/sink builders (SURVEY S4/S7).

The reference's Kafka touchpoints, idiomatic-Spark:

- consumers subscribe with hand-rolled option blocks
  (/root/reference/spark_streaming/convert-to-elasticsearch.py:86-91,
  convert-to-minio.py:72-78) → ``kafka_stream_source``;
- the producer collect()s the whole DataFrame to the driver and sends
  row-by-row with a sleep (data_generator/dataframe_to_kafka.py:99-121)
  → ``kafka_batch_sink`` / ``kafka_stream_sink``: the executors write
  directly (``df.write.format("kafka")``), fully parallel, no driver
  round-trip; pacing is the broker's job (or maxOffsetsPerTrigger on the
  consumer, ST7).

This container has no Kafka broker or connector jar, so these builders
are exercised structurally (options configured, load deferred); the
identical downstream plan is tested through the file source
(streaming/pipeline.py) — swapping the source is a one-line change,
which is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_stream_source(
    spark: SparkSession,
    servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
):
    """Configured streaming reader for a Kafka topic.  Call ``.load()``
    then ``functions.wire.decode_df`` on CAST(value AS STRING) — the
    typed-decode path shared with every other source."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader


def kafka_batch_sink(df: DataFrame, servers: str, topic: str) -> None:
    """Distributed batch write of a (key, value) DataFrame to Kafka —
    replaces the reference's driver-side collect-and-send loop.  Prepare
    with functions.wire.encode_df."""
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .save()
    )


def kafka_stream_sink(
    df: DataFrame, servers: str, topic: str, checkpoint_dir: str
) -> None:
    """Streaming (key, value) append to Kafka with checkpointing."""
    (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
        .awaitTermination()
    )
