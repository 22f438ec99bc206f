"""Wire codec round-trip + deterministic math (SURVEY F1-F5)."""

from pyspark.sql import functions as F

from hdfs_stream_processing_spark.functions.detmath import money_avg, money_sum
from hdfs_stream_processing_spark.functions.timefn import epoch_to_ts, ts_to_string
from hdfs_stream_processing_spark.functions.wire import decode_df, encode_df, to_wire
from hdfs_stream_processing_spark.schemas import schema_for
from hdfs_stream_processing_spark.sources.io import load_table

from tests.conftest import SF_DIR


def test_wire_round_trip_nation(spark):
    """encode → decode is lossless for int/string tables."""
    nation = load_table(spark, SF_DIR, "nation")
    decoded = decode_df(encode_df(nation, key_col="n_nationkey"), schema_for("nation"))
    assert sorted(decoded.collect()) == sorted(nation.collect())


def test_wire_round_trip_doubles(spark):
    """Doubles survive the wire: Spark's string cast is shortest
    round-trip repr (Java Double.toString), so parse-back is exact."""
    df = spark.createDataFrame(
        [(1, 0.1), (2, 1.0 / 3.0), (3, 1e-10), (4, 12345.678901234567)], "id int, v double"
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("v", T.DoubleType())]
    )
    decoded = decode_df(encode_df(df, key_col="id"), schema)
    assert sorted(decoded.collect()) == sorted(df.collect())


def test_money_sum_partitioning_invariant(spark):
    """The whole point of cents-sums: identical result under any
    partitioning (plain SUM(double) is not)."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_extendedprice")
    one = li.coalesce(1).agg(money_sum("l_extendedprice").alias("s")).collect()[0]["s"]
    many = li.repartition(32).agg(money_sum("l_extendedprice").alias("s")).collect()[0]["s"]
    assert one == many  # bit-identical, not approximately


def test_money_avg_matches_manual(spark):
    df = spark.createDataFrame([(1.10,), (2.20,), (3.31,)], "v double")
    got = df.agg(money_avg("v").alias("a")).collect()[0]["a"]
    assert got == round((110 + 220 + 331) / (3 * 100.0), 6)


def test_epoch_ts_round_trip(spark):
    df = spark.createDataFrame([(1700000000,)], "epoch long")
    out = df.select(
        ts_to_string(epoch_to_ts("epoch"), "yyyy-MM-dd HH:mm:ss").alias("s")
    ).collect()[0]["s"]
    assert out == "2023-11-14 22:13:20"  # UTC pinned by the session factory


def test_wire_survives_kafka_binary_schema_contract(spark):
    """VERDICT r3 #8: no broker exists in this container, so pin the one
    thing left untested besides the connector itself — the schema
    CONTRACT.  The Kafka sink requires ``key``/``value`` as STRING or
    BINARY and the source delivers them as BINARY; the wire must survive
    encode → cast to the exact ``key BINARY, value BINARY`` sink schema →
    (broker) → CAST(value AS STRING) → decode losslessly, doubles
    included."""
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(1, "x", 0.1), (2, "y", 1.0 / 3.0), (3, "z", 12345.678901234567)],
        "id int, s string, v double",
    )
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("s", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    # what kafka_batch_sink would hand the connector:
    on_wire = encode_df(df, key_col="id").select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
    )
    assert [f.dataType.simpleString() for f in on_wire.schema.fields] == ["binary", "binary"]
    # what the consumer does with a kafka source batch (CAST value AS STRING):
    received = on_wire.select(F.col("value").cast("string").alias("value"))
    decoded = decode_df(received, schema)
    assert sorted(decoded.collect()) == sorted(df.collect())


def test_to_wire_null_fields_collapse(spark):
    """concat_ws drops NULLs — documented wire-format caveat; pipelines
    drop nulls first (like the reference, dataframe_to_kafka.py:85)."""
    df = spark.createDataFrame([(1, None), (2, "x")], "id int, s string")
    wires = df.select(to_wire(["id", "s"]).alias("w")).orderBy("w").collect()
    assert [r["w"] for r in wires] == ["1", "2,x"]
