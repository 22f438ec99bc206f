"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the driver tables."""

import math
from decimal import Decimal

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from hdfs_stream_processing_spark.functions.detmath import money_sum
from hdfs_stream_processing_spark.functions.wire import decode_df, encode_df

MONEY = st.decimals(
    min_value=Decimal("-9999999.99"),
    max_value=Decimal("9999999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)

FINITE_DOUBLES = st.floats(allow_nan=False, allow_infinity=False, width=64)

WIRE_SAFE_TEXT = st.text(
    alphabet=st.characters(blacklist_characters=",\n\r\"\\", min_codepoint=32, max_codepoint=126),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(MONEY, min_size=1, max_size=50))
def test_money_sum_is_exact(spark, values):
    """money_sum over 2-decimal values equals the exact Decimal sum —
    for any values, any partitioning."""
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    got = df.repartition(5).agg(money_sum("v").alias("s")).collect()[0]["s"]
    assert got == float(sum(values))


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2**40), FINITE_DOUBLES, WIRE_SAFE_TEXT),
                min_size=1, max_size=30))
def test_wire_round_trip_any_values(spark, rows):
    """encode→decode is lossless for longs, arbitrary finite doubles
    (shortest round-trip repr), and delimiter-free strings."""
    from pyspark.sql import types as T

    rows = [(i, v, s) for i, (_, v, s) in enumerate(rows)]  # unique ids
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("s", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    back = decode_df(encode_df(df, key_col="id"), schema)
    got = sorted(back.collect())
    want = sorted(df.collect())
    for g, w in zip(got, want):
        assert g["id"] == w["id"] and g["s"] == w["s"]
        assert g["v"] == w["v"] or (math.isnan(g["v"]) and math.isnan(w["v"]))


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=30), min_size=1, max_size=10))
def test_jaccard_bounds_and_symmetry(spark, texts):
    """0 < jaccard <= 1 for every emitted pair; identical texts → 1."""
    from hdfs_stream_processing_spark.operators.dedup import jaccard_pairs

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = jaccard_pairs(df, "doc_id", "text", shingle_n=1, min_jaccard=0.0).collect()
    for r in out:
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["id_a"] < r["id_b"]
