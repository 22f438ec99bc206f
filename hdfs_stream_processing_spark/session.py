"""SparkSession factory.

The reference hard-codes per-script session configs (local[4]/8g in
utils/spark_transforming.py:27-32, local[8]/4g in
data_generator/dataframe_to_kafka.py:31-36, shuffle.partitions=4 in
spark_streaming/convert-to-elasticsearch.py:69).  We centralize one factory:
AQE replaces magic shuffle-partition constants, UTC session timezone pins
timestamp semantics for oracle comparison, and Arrow speeds every
pandas/Python boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hdfs-stream-processing-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local mode is the test bed; the config choices (AQE, adaptive coalesce,
    skew-join handling) are the ones that matter on a real multi-executor
    cluster at 100 TB — partition counts are decided at runtime by AQE from
    actual shuffle sizes rather than hard-coded like the reference's
    ``spark.sql.shuffle.partitions=4``.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cpus = str(cpus)
    if shuffle_partitions is None:
        shuffle_partitions = os.environ.get("HSP_SHUFFLE_PARTITIONS", cpus)
    shuffle_partitions = str(shuffle_partitions)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("HSP_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Parquet TIMESTAMP(NANOS) (e.g. pandas-written events tables) is
        # otherwise an AnalysisException; read as long and convert at the
        # loader boundary (sources/io.py) with exact integer division.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
