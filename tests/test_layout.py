"""Z-order layout (operators/layout.py): key correctness, clustered-write
round-trip, and the actual point — per-file locality that lets parquet
min/max stats prune multi-dimensional filters."""

import pytest

from pyspark.sql import functions as F

from hdfs_stream_processing_spark.operators.layout import z_order_key, zorder_write
from hdfs_stream_processing_spark.sources.io import load_table

from tests.conftest import SF_DIR


def test_z_order_key_interleaves_bits(spark):
    """Hand-computed Morton values: bit i of col c lands at i*n + c."""
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", z_order_key(["x", "y"]).alias("z")).collect()
    }
    # x=3 (0b011), y=5 (0b101): interleaved -> y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 39
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (3, 5): 39}


def test_z_order_key_clamps_out_of_range(spark):
    """Negative and >2^bits values clamp instead of corrupting the key."""
    df = spark.createDataFrame([(-5, 1 << 40)], "x long, y long")
    z = df.select(z_order_key(["x", "y"], bits=16).alias("z")).collect()[0]["z"]
    # x clamps to 0, y clamps to 0xFFFF -> z = interleave(0, 0xFFFF)
    expected = sum(1 << (2 * i + 1) for i in range(16))
    assert z == expected


def test_z_order_key_rejects_overflow():
    with pytest.raises(ValueError):
        z_order_key(["a", "b", "c"], bits=21)  # 63 bits


def test_zorder_write_roundtrip_and_locality(spark, tmp_path):
    """zorder_write must (a) keep every row, and (b) actually cluster:
    the average per-file value range of EACH layout column must shrink
    versus an arrival-order write of the same data into the same number
    of files — that range is exactly what parquet min/max pruning sees."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    n_files = 8
    zdir = str(tmp_path / "zordered")
    plaindir = str(tmp_path / "plain")
    zorder_write(li, ["l_partkey", "l_suppkey"], zdir, n_files=n_files)
    li.repartition(n_files).write.parquet(plaindir)

    back = spark.read.parquet(zdir)
    assert sorted(back.collect()) == sorted(li.collect())

    def avg_spread(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("spread"))
        )
        rows = per_file.collect()
        return sum(r["spread"] for r in rows) / len(rows)

    for col in ("l_partkey", "l_suppkey"):
        z_spread = avg_spread(zdir, col)
        p_spread = avg_spread(plaindir, col)
        # arrival-order files span ~the whole domain; z-ordered files
        # cover a contiguous z-range -> much narrower on BOTH columns
        assert z_spread < 0.6 * p_spread, (col, z_spread, p_spread)
