"""Bit-parity of the Arrow/numpy IVF paths vs the literal SQL
expressions (r14 optimization, guide §4.2).

The affinity is integer-dot / (sqrt·sqrt): int64 dots are exact in both
engines, every float64 op (cast, sqrt, multiply, divide) is the same
correctly-rounded IEEE binary64 operation in numpy and the JVM, and the
tie rules coincide (np.argmax first-max == array_max struct order;
stable argsort on -aff == (aff DESC, cell ASC)).  These tests pin that
equivalence over the full embeddings corpus INCLUDING forced exact
ties, so the Arrow path can never drift from the oracle's SQL
formulation unnoticed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_stream_processing_spark import get_spark
from hdfs_stream_processing_spark.operators.similarity import (
    assign_cells,
    ivf_init_centroids,
    ivf_topk,
    quantized,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    return get_spark(app_name="test-np-assign", cpus=8)


@pytest.fixture(scope="module")
def q(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return emb.select(F.col("vec_id"), quantized("embedding").alias("qv"))


@pytest.fixture(scope="module")
def cents(q):
    return ivf_init_centroids(
        q.select(F.col("vec_id"), F.col("qv").alias("embedding")),
        "vec_id", "embedding", n_cells=16,
    )


def _cells(df):
    return {r["vec_id"]: r["cell"] for r in df.select("vec_id", "cell").collect()}


def test_arrow_assign_matches_literal_expression(q, cents):
    got_np = _cells(assign_cells(q, cents, vec_col="qv", use_arrow=True))
    got_sql = _cells(assign_cells(q, cents, vec_col="qv", use_arrow=False))
    assert got_np == got_sql


def test_arrow_assign_tie_rule_matches(q, cents):
    """Duplicate centroids force EXACT affinity ties on every row —
    both paths must break toward the lowest cell id."""
    cents_tie = [list(cents[0])] * 4 + [list(c) for c in cents[4:]]
    got_np = _cells(assign_cells(q, cents_tie, vec_col="qv", use_arrow=True))
    got_sql = _cells(assign_cells(q, cents_tie, vec_col="qv", use_arrow=False))
    assert got_np == got_sql
    assert 0 in set(got_np.values())  # the tie block resolves to cell 0
    assert not {1, 2, 3} & set(got_np.values())


def test_arrow_ivf_topk_matches_literal(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qf = F.col("vec_id") < 50
    a = ivf_topk(emb, n_cells=16, nprobe=2, k=10, n_iters=3,
                 queries_filter=qf, use_arrow=True)
    b = ivf_topk(emb, n_cells=16, nprobe=2, k=10, n_iters=3,
                 queries_filter=qf, use_arrow=False)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # ranks, ids AND cosine doubles bit-equal


def test_arrow_assign_raises_on_zero_vector(spark, cents):
    """The ANSI SQL path raises DIVIDE_BY_ZERO on a zero-norm vector;
    the Arrow path must not silently return instead."""
    deg = spark.createDataFrame(
        [(1, [0] * len(cents[0]))], "vec_id bigint, qv array<bigint>"
    )
    with pytest.raises(Exception, match="zero-norm|DIVIDE_BY_ZERO"):
        assign_cells(deg, cents, vec_col="qv", use_arrow=True).collect()


def test_arrow_assign_raises_on_zero_centroid(spark, cents, q):
    """ADVICE r14: a zero-norm CENTROID must raise in the Arrow path
    exactly like the literal SQL path (ANSI DIVIDE_BY_ZERO), not
    silently produce inf/nan affinities."""
    cents_zero = [list(c) for c in cents]
    cents_zero[2] = [0] * len(cents[0])
    with pytest.raises(Exception, match="zero-norm|DIVIDE_BY_ZERO"):
        assign_cells(q, cents_zero, vec_col="qv", use_arrow=True).collect()


def test_pq_codebook_order_independent(spark):
    """ADVICE r14: the Arrow PQ encoder maps the positional argmin index
    to the code id — codebook rows arriving in ANY order must yield the
    same codes (explicit sort), and a gapped code set must raise."""
    from hdfs_stream_processing_spark.operators.similarity import (
        _codebook_matrices,
        pq_assign_codes,
        pq_init_codebooks,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb = pq_init_codebooks(emb, "vec_id", "embedding", 4, 8)
    shuffled = list(reversed(cb))
    a = sorted(map(tuple, pq_assign_codes(emb, codebook_rows=cb, use_arrow=True).collect()))
    b = sorted(map(tuple, pq_assign_codes(emb, codebook_rows=shuffled, use_arrow=True).collect()))
    assert a == b
    gapped = [(s, c, cw) for s, c, cw in cb if not (s == 1 and c == 3)]
    with pytest.raises(ValueError, match="not contiguous"):
        _codebook_matrices(gapped, 4)


def test_arrow_pq_codes_match_sql(spark):
    """PQ encoding: the Arrow GEMM path must equal the SQL explode +
    broadcast-join + argmin shape — codes, d2, everything."""
    from hdfs_stream_processing_spark.operators.similarity import pq_assign_codes

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = sorted(map(tuple, pq_assign_codes(emb, use_arrow=True).collect()))
    b = sorted(map(tuple, pq_assign_codes(emb, use_arrow=False).collect()))
    assert a == b


def test_arrow_ivfpq_codes_match_sql(spark):
    """IVF-PQ encoding: cell argmin + integer residual + per-subspace
    code argmins in one Arrow pass must equal the two-hash-agg SQL
    shape."""
    from hdfs_stream_processing_spark.operators.similarity import (
        ivfpq_assign_codes,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = sorted(map(tuple, ivfpq_assign_codes(emb, use_arrow=True).collect()))
    b = sorted(map(tuple, ivfpq_assign_codes(emb, use_arrow=False).collect()))
    assert a == b
