"""Similarity search over embedding columns (SURVEY §2.10 N1).

Two physical strategies for the same logical operator:

- **brute-force top-k** (`similarity_topk`): queries × corpus join +
  cosine + per-query window top-k.  Exact; O(|Q|·|C|) — right when |Q| is
  small or the corpus fits a broadcast; wrong as the general path at
  100 TB.
- **LSH-bucketed** (`lsh_bucket_topk`): random-hyperplane signatures
  (sign bits of deterministic md5-derived projections) turn the cross
  join into an equi-join on bucket id, then exact cosine re-ranks within
  buckets — candidate generation is O(bucket collisions).  Approximate
  (can miss neighbors crossing bucket boundaries), standard
  recall/probes trade-off; multi-probe = union over signature prefixes.

Exactness for the oracle: embeddings are quantized to integer milli-units
(round(x·1000)).  Every dot product / norm is then a sum of
integer-valued terms < 2^53 — exact and order-independent in any engine —
so cosine scores are bit-identical between Spark and DuckDB, and rankings
(with id tiebreaks) are fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantized(col: Column | str, scale: int = 1000) -> Column:
    """array<float> → array<bigint> milli-units (exact, portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * F.lit(float(scale)), 0).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Integer dot product of two quantized vectors (exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine over quantized vectors: integer dot / sqrt(int)·sqrt(int)
    — one fixed expression tree of exact operands → bit-identical
    everywhere."""
    return dot_q(a, b).cast("double") / (
        F.sqrt(dot_q(a, a).cast("double")) * F.sqrt(dot_q(b, b).cast("double"))
    )


def similarity_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries_filter: Column | None = None,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (it is the small side by construction);
    the corpus is scanned once — no shuffle until the final per-query
    top-k window, which is partitioned by query id.  Norms are
    precomputed per VECTOR, so each pair costs one dot product, not
    three (same expression tree → identical doubles).
    """
    q = embeddings.where(queries_filter) if queries_filter is not None else embeddings
    q = q.select(F.col(id_col).alias("query_id"), quantized(vec_col).alias("qv"))
    q = q.withColumn("qn", F.sqrt(dot_q(F.col("qv"), F.col("qv")).cast("double")))
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), quantized(vec_col).alias("cv"))
    c = c.withColumn("cn", F.sqrt(dot_q(F.col("cv"), F.col("cv")).cast("double")))
    pairs = F.broadcast(q).crossJoin(c).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (dot_q(F.col("qv"), F.col("cv")).cast("double") / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_weights(num_planes: int, dims: int) -> list[list[int]]:
    """Deterministic pseudo-random ±1 hyperplane weights from
    md5(plane:dim) — derived once on the driver (no RNG state, no
    per-row hashing, identical on every engine and run)."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:4], 16) % 2 else -1
            for d in range(dims)
        ]
        for p in range(num_planes)
    ]


def hyperplane_projections(vec_sql: str, num_planes: int, dims: int) -> Column:
    """Raw integer projections onto the ±1 hyperplanes (array<bigint>).
    The signature is their sign; |projection| is the confidence a
    multi-probe uses to pick which bits to flip."""
    weights = hyperplane_weights(num_planes, dims)

    def proj(p: int) -> str:
        w = "array(" + ", ".join(f"{x}L" for x in weights[p]) + ")"
        return (
            f"aggregate(zip_with({vec_sql}, {w}, (x, w) -> x * w),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )

    return F.expr("array(" + ", ".join(proj(p) for p in range(num_planes)) + ")")


def hyperplane_signature(vec_sql: str, num_planes: int, dims: int) -> Column:
    """Random-hyperplane LSH signature (bit array): sign of the
    projection onto each ±1 plane.  Weights are embedded as array
    literals, so the per-row work is ``num_planes`` integer dot products
    inside whole-stage codegen — no hashing in the hot path.
    ``vec_sql`` is the SQL text of a quantized array<bigint> column."""
    weights = hyperplane_weights(num_planes, dims)

    def plane_bit(p: int) -> str:
        w = "array(" + ", ".join(f"{x}L" for x in weights[p]) + ")"
        proj = (
            f"aggregate(zip_with({vec_sql}, {w}, (x, w) -> x * w),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        return f"CASE WHEN {proj} > 0 THEN 1 ELSE 0 END"

    return F.expr("array(" + ", ".join(plane_bit(p) for p in range(num_planes)) + ")")


def lsh_bucket_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    k: int = 10,
    dims: int | None = None,
    nprobe_flips: int = 0,
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane-sign signature, exact
    cosine re-rank *within* buckets.

    The join is an equi-join on ``bucket`` — with p planes, an even
    corpus splits into ~2^p buckets, so candidate pairs shrink by ~2^p
    vs all-pairs.  This is the 100 TB path where brute force is not.

    Recall tuning: lower ``num_planes``, or set ``nprobe_flips`` = m > 0
    for MULTI-PROBE — each query additionally probes the m buckets that
    differ in one of its m least-confident signature bits (smallest
    |projection|, the standard multi-probe order).  Only the query side
    fans out (×(m+1)); the corpus stays in its one bucket, so candidate
    volume grows linearly in m, not exponentially.  Deterministic: flip
    order ties break on plane index.

    Pass ``dims`` when known (it usually is — embedding width is a
    pipeline constant): without it, a driver job runs at plan-build time
    to probe the first row.
    """
    if dims is None:
        dims = _dims(embeddings, vec_col)
    p = num_planes
    with_q = embeddings.select(F.col(id_col), quantized(vec_col).alias("qv"))
    with_sig = with_q.select(
        id_col,
        "qv",
        F.sqrt(dot_q(F.col("qv"), F.col("qv")).cast("double")).alias("qn"),
        hyperplane_signature("qv", p, dims).alias("sig"),
        hyperplane_projections("qv", p, dims).alias("proj"),
    ).withColumn("bucket", F.concat_ws("", F.col("sig")))
    if nprobe_flips > 0:
        # least-confident bit positions: sort (|proj|, plane) ascending
        flips = (
            f"slice(array_sort(zip_with(proj, sequence(0, {p - 1}),"
            " (pr, i) -> named_struct('a', abs(pr), 'i', i))), 1,"
            f" {nprobe_flips})"
        )
        flipped = (
            f"transform({flips}, s -> array_join(zip_with(sig,"
            f" sequence(0, {p - 1}),"
            " (b, j) -> CAST(IF(j = s.i, 1 - b, b) AS STRING)), ''))"
        )
        probe_buckets = F.expr(f"concat(array(bucket), {flipped})")
        a = with_sig.select(
            F.col(id_col).alias("query_id"),
            F.col("qv").alias("qa"),
            F.col("qn").alias("na"),
            F.explode(probe_buckets).alias("bucket"),
        )
    else:
        a = with_sig.select(
            F.col(id_col).alias("query_id"), F.col("qv").alias("qa"), F.col("qn").alias("na"), "bucket"
        )
    b = with_sig.select(
        F.col(id_col).alias("neighbor_id"), F.col("qv").alias("qb"), F.col("qn").alias("nb"), "bucket"
    )
    pairs = a.join(b, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (dot_q(F.col("qa"), F.col("qb")).cast("double") / (F.col("na") * F.col("nb"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _dims(embeddings: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first row (schema carries no
    fixed length for array columns).  Runs a driver job — callers that
    know the width pass ``dims=`` explicitly to keep query construction
    job-free."""
    row = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"])


# ------------------------------------------------------------------------
# IVF: deterministic k-means training + literal-centroid assignment
# ------------------------------------------------------------------------


def _arr_lit(vec: list[int]) -> str:
    return "array(" + ", ".join(f"{int(x)}L" for x in vec) + ")"


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def _np_affinities(V, C):
    """The affinity matrix of the literal SQL path, in numpy, term for
    term: int64 dot (exact — the same sums the SQL ``aggregate`` folds;
    < 2^53 by the quantization contract), one cast to float64 per
    operand, IEEE sqrt/multiply/divide — every operation is the
    correctly-rounded binary64 op the JVM executes, so the doubles are
    BIT-IDENTICAL to the expression tree's (asserted over the corpus,
    exact ties included, in tests/test_np_assign.py).  Raises on a
    zero-norm row exactly where the ANSI SQL path raises
    DIVIDE_BY_ZERO."""
    import numpy as np

    dots = V @ C.T
    qn = np.sqrt((V * V).sum(axis=1).astype(np.float64))
    if (qn == 0.0).any():
        raise ArithmeticError(
            "assign_cells: zero-norm vector — division by zero (the SQL "
            "path raises DIVIDE_BY_ZERO here under ANSI mode)"
        )
    cn = np.sqrt((C * C).sum(axis=1).astype(np.float64))
    return dots.astype(np.float64) / (qn[:, None] * cn[None, :])


def _assign_cells_arrow(
    df: DataFrame, centroids: list[list[int]], vec_col: str, out_col: str
) -> DataFrame:
    """Arrow-vectorized argmax-cosine assignment (r14, guide §4.2 "hand
    whole batches to vectorized native libraries"): one int64 GEMM per
    Arrow batch replaces the per-row n_cells × dims interpreted
    ``aggregate(zip_with(...))`` lambdas of the literal path — measured
    ~2.5 s/run of the Lloyd-means jobs in similarity_ivf at sf0.1
    collapse to milliseconds of numpy.  Tie rule preserved:
    ``np.argmax`` returns the FIRST maximum = lowest cell id, exactly
    the literal path's ``array_max`` struct order.  Bit-parity with
    the SQL expression is pinned by tests/test_np_assign.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType

    C = np.array([[int(x) for x in cv] for cv in centroids], dtype=np.int64)

    @F.pandas_udf(IntegerType())
    def _cell(qv):  # no hints: postponed annotations break inference
        if not len(qv):
            return pd.Series([], dtype="int32")
        V = np.vstack(qv.to_numpy()).astype(np.int64)
        aff = _np_affinities(V, C)
        return pd.Series(np.argmax(aff, axis=1).astype(np.int32))

    # asNondeterministic: the optimizer otherwise pushes the join's
    # isnotnull(cell) filter BELOW the repartition with its own copy of
    # the UDF — two ArrowEvalPython nodes evaluating the same GEMM per
    # row (guide §4.4; observed in ann_recall's corpus branch).  The
    # function is in fact deterministic; the marker only forbids the
    # duplicating rewrite.
    return df.withColumn(out_col, _cell.asNondeterministic()(F.col(vec_col)))


def assign_cells(
    df: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "qv",
    out_col: str = "cell",
    id_col: str | None = None,
    max_literal_cells: int = 256,
    use_arrow: bool = True,
) -> DataFrame:
    """Argmax-cosine cell assignment.  Three physical strategies, same
    semantics (max cosine, ties to the lowest cell id), bit-identical
    outputs (parity pinned in tests/test_llm_ops.py and
    tests/test_np_assign.py):

    - **Arrow path** (default, ≤ ``max_literal_cells``): the centroid
      matrix rides the UDF closure; each Arrow batch pays ONE int64
      GEMM + argmax in numpy (guide §4.2).  No join, no shuffle.
    - **literal path** (``use_arrow=False``): centroids embedded as
      array literals — one whole-stage-codegen expression per row, no
      Python boundary.  Affinity is integer-dot / (sqrt·sqrt) of exact
      integers → bit-identical in any engine (the ivf_assign oracle
      replays it in SQL); kept as the parity witness and for
      Arrow-less deployments.
    - **broadcast-join path** (larger, needs ``id_col``): at real scale
      ``n_cells`` ~ sqrt(corpus) is 10^4-10^5 — a closure/literal that
      size is executor-memory-hostile and breaks codegen limits, so the
      centroid table (still tiny: cells × dims ints) is broadcast,
      affinities computed per (row, cell) pair, and the argmax taken by
      max_by over a groupBy on ``id_col`` — one shuffle keyed on the
      row id.
    """
    if len(centroids) <= max_literal_cells or id_col is None:
        if use_arrow:
            return _assign_cells_arrow(df, centroids, vec_col, out_col)
        qn = F.sqrt(dot_q(F.col(vec_col), F.col(vec_col)).cast("double"))
        df = df.withColumn("_qn", qn)
        parts = []
        for cell, cv in enumerate(centroids):
            cc = sum(int(v) * int(v) for v in cv)
            aff = (
                f"(CAST({_dot_sql(vec_col, _arr_lit(cv))} AS DOUBLE)"
                f" / (_qn * sqrt(CAST({cc} AS DOUBLE))))"
            )
            parts.append(f"named_struct('aff', {aff}, 'nc', {-cell})")
        pick = f"-array_max(array({', '.join(parts)})).nc"
        return df.withColumn(out_col, F.expr(pick).cast("int")).drop("_qn")
    return _assign_cells_join(df, centroids, vec_col, out_col, id_col)


def _assign_cells_join(
    df: DataFrame, centroids: list[list[int]], vec_col: str, out_col: str, id_col: str
) -> DataFrame:
    """Broadcast-join assignment (see assign_cells): identical affinity
    expression tree and tie rule as the literal path — the two paths are
    asserted equal in tests/test_llm_ops.py."""
    spark = df.sparkSession
    cent = spark.createDataFrame(
        [(i, [int(x) for x in cv]) for i, cv in enumerate(centroids)],
        "cell int, cv array<bigint>",
    ).withColumn("_cn", F.sqrt(dot_q(F.col("cv"), F.col("cv")).cast("double")))
    qn = F.sqrt(dot_q(F.col(vec_col), F.col(vec_col)).cast("double"))
    pairs = df.withColumn("_qn", qn).crossJoin(F.broadcast(cent))
    aff = dot_q(F.col(vec_col), F.col("cv")).cast("double") / (F.col("_qn") * F.col("_cn"))
    other = [c for c in df.columns if c != id_col]
    return (
        pairs.withColumn("_aff", aff)
        .groupBy(id_col)
        .agg(
            # all pair rows of one group carry the SAME original row —
            # first() is deterministic here
            *[F.first(c).alias(c) for c in other],
            F.max_by(
                "cell",
                F.struct(F.col("_aff").alias("a"), (-F.col("cell")).alias("nc")),
            ).alias(out_col),
        )
    )


def ivf_init_centroids(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 16,
) -> list[list[int]]:
    """Seedless deterministic init: the ``n_cells`` quantized vectors with
    the smallest (md5(id), id) — a reproducible pseudo-random sample that
    any engine can re-derive (the ivf_assign oracle does, in SQL), immune
    to the sorted-data degeneracy of first-N-by-id."""
    q = embeddings.select(F.col(id_col).alias("_id"), quantized(vec_col).alias("qv"))
    rows = (
        q.withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h", "_id")
        .limit(n_cells)
        .select("qv")
        .collect()
    )
    return [list(r["qv"]) for r in rows]


def train_ivf_centroids(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_iters: int = 3,
) -> list[list[int]]:
    """Deterministic spherical k-means (Lloyd) for IVF coarse centroids.

    Each iteration: assign every vector to its max-cosine centroid (pure
    codegen expression — see assign_cells), then recompute each centroid
    as the element-wise HALF_UP-rounded mean of its members (posexplode +
    one groupBy per step, partial-agg map-side).  Only the centroid table
    itself — n_cells × dims ints — is collected per step, the same
    driver-side update loop Spark MLlib's KMeans uses; the corpus never
    leaves the executors.  No RNG anywhere: init is md5-ordered, means
    are exact-integer sums, ties in assignment break to the lowest cell —
    the same centroids come out on every run and every cluster size.
    Empty cells keep their previous centroid.
    """
    cents = ivf_init_centroids(embeddings, id_col, vec_col, n_cells)
    # spread rows before the argmax expression (see ivf_topk): every
    # Lloyd iteration evaluates the n_cells × dims affinity per row, and
    # a single-split parquet table would pin all of it to one task.
    n_parts = embeddings.sparkSession.sparkContext.defaultParallelism
    q = embeddings.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col).alias("_id"), quantized(vec_col).alias("qv")
    )
    for _ in range(n_iters):
        assigned = assign_cells(q, cents, id_col="_id")
        means = (
            assigned.select("cell", F.posexplode("qv").alias("idx", "x"))
            .groupBy("cell", "idx")
            .agg(
                F.round(F.sum("x").cast("double") / F.count(F.lit(1)), 0)
                .cast("long")
                .alias("m")
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "m"))), lambda s: s["m"]
                ).alias("cv")
            )
            .collect()
        )
        new = {int(r["cell"]): list(r["cv"]) for r in means}
        cents = [new.get(i, cents[i]) for i in range(n_cells)]
    return cents


def _probe_cells_join(
    q: DataFrame, centroids: list[list[int]], id_col: str, nprobe: int
) -> DataFrame:
    """Broadcast-join nprobe cell selection (the large-``n_cells``
    mirror of the literal ``top_cells`` expression in :func:`ivf_topk`,
    exactly as ``_assign_cells_join`` mirrors ``assign_cells``):
    affinities per (query, cell) pair against the broadcast centroid
    table, ``row_number() <= nprobe`` per query ordered (affinity DESC,
    cell ASC) — the same tie rule as the literal path's struct sort.
    Emits (query_id, pv, cell); parity with the literal path is
    asserted in tests/test_llm_ops.py."""
    spark = q.sparkSession
    cent = spark.createDataFrame(
        [(i, [int(x) for x in cv]) for i, cv in enumerate(centroids)],
        "cell int, cv array<bigint>",
    ).withColumn("_cn", F.sqrt(dot_q(F.col("cv"), F.col("cv")).cast("double")))
    qn = F.sqrt(dot_q(F.col("qv"), F.col("qv")).cast("double"))
    pairs = q.withColumn("_qn", qn).crossJoin(F.broadcast(cent))
    aff = dot_q(F.col("qv"), F.col("cv")).cast("double") / (F.col("_qn") * F.col("_cn"))
    w = Window.partitionBy(id_col).orderBy(F.col("_aff").desc(), F.col("cell").asc())
    return (
        pairs.withColumn("_aff", aff)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= nprobe)
        .select(F.col(id_col).alias("query_id"), F.col("qv").alias("pv"), "cell")
    )


def ivf_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 2,
    k: int = 10,
    n_iters: int = 3,
    centroids: list[list[int]] | None = None,
    max_literal_cells: int = 256,
    queries_filter: Column | None = None,
    use_arrow: bool = True,
) -> DataFrame:
    """IVF ANN: k-means coarse cells, search the query's ``nprobe``
    nearest cells, exact cosine re-rank inside.

    ``queries_filter`` restricts which vectors QUERY (probe side);
    the corpus side — cell training and assignment — always covers
    every vector, matching the search-a-full-index semantics.

    Up to ``max_literal_cells`` BOTH cell assignments are
    literal-centroid codegen expressions (no join, no shuffle); beyond
    it — real deployments size ``n_cells`` ~ sqrt(corpus), 10^4-10^5 —
    a literal expression that wide breaks codegen/expression-size
    limits, so corpus assignment AND query probe selection switch to
    the broadcast-join paths (``_assign_cells_join`` /
    ``_probe_cells_join``) with identical semantics.  The remaining
    exchanges are the (cell) equi-join that pairs probes with corpus
    members and the final top-k window.  Work scales with
    corpus/n_cells × nprobe instead of all-pairs; recall is the
    standard nprobe trade-off.
    """
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, id_col, vec_col, n_cells, n_iters)
    # explicit partition COUNT before the per-row affinity expressions:
    # the embedding table is tiny BY BYTES (one parquet split), but the
    # literal-centroid argmax is ~n_cells × dims work per row and falls
    # back to interpreted eval past the codegen size limit — without
    # this the whole assign/probe/re-rank chain runs on ONE task (same
    # rationale and AQE exemption as minhash_signature_wide).
    n_parts = embeddings.sparkSession.sparkContext.defaultParallelism
    q_raw = embeddings.select(F.col(id_col), quantized(vec_col).alias("qv"))
    q = q_raw.repartition(n_parts, F.col(id_col))
    corpus = assign_cells(
        q, centroids, id_col=id_col, max_literal_cells=max_literal_cells,
        use_arrow=use_arrow,
    ).select(F.col(id_col).alias("neighbor_id"), F.col("qv").alias("nv"), "cell")
    qq = q.where(queries_filter) if queries_filter is not None else q
    if len(centroids) <= max_literal_cells:
        if use_arrow:
            # the Arrow probe branch reads the UNrepartitioned base and
            # pays its one exchange ABOVE the UDF (see below) — reading
            # q would stack the by-id exchange under it for two.
            qq = (
                q_raw.where(queries_filter)
                if queries_filter is not None
                else q_raw
            )
            # nprobe nearest cells per query: the same numpy affinity
            # matrix as _assign_cells_arrow, stable argsort on -aff —
            # equal affinities keep ascending cell order, exactly the
            # literal struct sort's (aff DESC, cell ASC) tie rule
            # (parity pinned in tests/test_np_assign.py).
            import numpy as np
            import pandas as pd
            from pyspark.sql.types import ArrayType, IntegerType

            C = np.array(
                [[int(x) for x in cv] for cv in centroids], dtype=np.int64
            )

            @F.pandas_udf(ArrayType(IntegerType()))
            def _top_cells(qv):  # no hints: postponed annotations break inference
                if not len(qv):
                    return pd.Series([], dtype=object)
                V = np.vstack(qv.to_numpy()).astype(np.int64)
                aff = _np_affinities(V, C)
                order = np.argsort(-aff, axis=1, kind="stable")[:, :nprobe]
                return pd.Series(list(order.astype(np.int32)))

            # asNondeterministic: see _assign_cells_arrow (guide §4.4).
            # ArrowEvalPython does not propagate its child's output
            # partitioning, so the pre-UDF repartition-by-id would be
            # invisible to the final top-k window and Spark would insert
            # a SECOND exchange of the rescored pairs (observed:
            # ann_recall 6 → 7 exchanges).  Repartitioning the probe
            # rows by query id ABOVE the UDF keeps the window's
            # clustering requirement satisfied from this one exchange —
            # the same exchange count and keying as the literal path.
            probes = qq.select(
                F.col(id_col).alias("query_id"),
                F.col("qv").alias("pv"),
                F.explode(
                    _top_cells.asNondeterministic()(F.col("qv"))
                ).alias("cell"),
            ).repartition(n_parts, F.col("query_id"))
        else:
            # literal-expression variant (the oracle's formulation and
            # the Arrow path's parity witness): sort the per-cell
            # affinity structs descending, slice, explode.
            qn = F.sqrt(dot_q(F.col("qv"), F.col("qv")).cast("double"))
            probes = qq.withColumn("_qn", qn)
            parts = []
            for cell, cv in enumerate(centroids):
                cc = sum(int(v) * int(v) for v in cv)
                aff = (
                    f"(CAST({_dot_sql('qv', _arr_lit(cv))} AS DOUBLE)"
                    f" / (_qn * sqrt(CAST({cc} AS DOUBLE))))"
                )
                parts.append(f"named_struct('aff', {aff}, 'nc', {-cell})")
            top_cells = (
                f"transform(slice(reverse(array_sort(array({', '.join(parts)}))), 1, {nprobe}),"
                " s -> CAST(-s.nc AS INT))"
            )
            probes = probes.select(
                F.col(id_col).alias("query_id"),
                F.col("qv").alias("pv"),
                F.explode(F.expr(top_cells)).alias("cell"),
            )
    else:
        probes = _probe_cells_join(qq, centroids, id_col, nprobe)
    pairs = probes.join(corpus, "cell").where(F.col("query_id") != F.col("neighbor_id"))
    rescored = pairs.select(
        "query_id", "neighbor_id", cosine_q(F.col("pv"), F.col("nv")).alias("cosine")
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def similarity_topk_np(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries_filter: Column | None = None,
    k: int = 10,
    max_queries: int = 4096,
) -> DataFrame:
    """Brute-force top-k, Arrow-vectorized: the query matrix is collected
    (small side by definition) and broadcast; each corpus partition does
    ONE BLAS matrix multiply per Arrow batch via mapInPandas, emits its
    local per-query top-k, and a final window keeps the global top-k.

    This is the 10-100× 'vectorized beats per-row' path for the float
    hot loop — per-partition numpy GEMM instead of per-element SQL
    lambdas.  Float arithmetic → not bit-portable across engines, so the
    exact quantized variant (similarity_topk) stays the oracle-checked
    one; this is the throughput variant.

    The driver collect is guarded: more than ``max_queries`` query rows
    (e.g. an unfiltered corpus) raises instead of OOMing the driver.
    """
    import numpy as np
    from pyspark.sql import Window as W

    q_df = embeddings.where(queries_filter) if queries_filter is not None else embeddings
    n_q = q_df.limit(max_queries + 1).count()
    if n_q > max_queries:
        raise ValueError(
            f"similarity_topk_np: query side has >{max_queries} rows — it is "
            "collected to the driver by design; filter it (queries_filter=) "
            "or raise max_queries explicitly"
        )
    q_rows = q_df.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    spark = embeddings.sparkSession
    b_ids = spark.sparkContext.broadcast(q_ids)
    b_mat = spark.sparkContext.broadcast(q_mat)

    def topk_per_batch(batches):
        import pandas as pd

        qi, qm = b_ids.value, b_mat.value
        for pdf in batches:
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = qm @ c_mat.T  # one GEMM: |Q| x batch
            c_ids = pdf[id_col].to_numpy()
            out_q, out_n, out_s = [], [], []
            kk = min(k + 1, sims.shape[1])  # +1: self may be in-batch
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            for row, qid in enumerate(qi):
                for col in part[row]:
                    if c_ids[col] != qid:
                        out_q.append(qid)
                        out_n.append(c_ids[col])
                        out_s.append(sims[row, col])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
            )

    local = embeddings.select(id_col, vec_col).mapInPandas(
        topk_per_batch, schema="query_id bigint, neighbor_id bigint, cosine double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_dedup_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    bucket_col: str,
    vec_col: str,
    min_cosine: float = 0.9,
) -> DataFrame:
    """Embedding-space dedup of a NEW batch against an existing corpus —
    the vector analog of the incremental exact/near-dup text ops.  A
    batch vector drops if its cosine to ANY same-bucket corpus vector
    reaches ``min_cosine``, or to a LOWER-id same-bucket batch vector
    (greedy min-id rule: documented as non-transitive — a batch vector
    is compared against every lower id, survivor or not, which keeps
    the rule one non-recursive join).

    ``bucket_col`` bounds both comparisons to an equi-join key — an IVF
    cell or hyperplane-LSH bucket in production (here the driver
    table's label plays that role).  Cosines are exact: quantized
    integer dot products, one final double division — so the whole
    decision is oracle-checkable.

    Scale: two bucket equi-joins sized by |bucket| × batch-share, never
    all-pairs; corpus vectors are touched only in the probed buckets
    (partition-prune the corpus by the batch's bucket set).
    """
    q = lambda df, i, v, n: df.select(
        F.col(id_col).alias(i),
        F.col(bucket_col).alias("_bkt"),
        quantized(vec_col).alias(v),
        F.sqrt(dot_q(quantized(vec_col), quantized(vec_col)).cast("double")).alias(n),
    )
    b = q(batch, "_id", "_bv", "_bn")
    c = q(corpus, "_cid", "_cv", "_cn")
    cos = lambda av, an, bv, bn: dot_q(F.col(av), F.col(bv)).cast("double") / (
        F.col(an) * F.col(bn)
    )
    drop_cross = (
        b.join(c, "_bkt")
        .where(cos("_bv", "_bn", "_cv", "_cn") >= F.lit(min_cosine))
        .select(F.col("_id").alias(id_col))
        .distinct()
    )
    hi = b
    lo = b.select(
        F.col("_id").alias("_lo"), F.col("_bkt"),
        F.col("_bv").alias("_lv"), F.col("_bn").alias("_ln"),
    )
    drop_within = (
        hi.join(lo, "_bkt")
        .where(
            (F.col("_lo") < F.col("_id"))
            & (cos("_bv", "_bn", "_lv", "_ln") >= F.lit(min_cosine))
        )
        .select(F.col("_id").alias(id_col))
        .distinct()
    )
    return batch.join(
        drop_cross.unionByName(drop_within).distinct(), id_col, "left_anti"
    )


# ── Product quantization (round 9) ──────────────────────────────────────


def pq_init_codebooks(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subs: int = 4,
    k_codes: int = 8,
) -> list[tuple[int, int, list[int]]]:
    """Seedless deterministic PQ codebooks: the ``k_codes`` vectors
    with smallest (md5(id), id) — the same engine-portable sample rule
    as :func:`ivf_init_centroids` — sliced into ``m_subs`` equal
    subvectors.  Returns (sub, code, codeword) triples; codeword j of
    every subspace comes from the same sampled vector, so the whole
    codebook derives from one ordered sample any engine reproduces.
    Codebook size is k·d ints — driver- and broadcast-trivial at any
    corpus scale (PQ codebooks are KBs by design)."""
    q = embeddings.select(
        F.col(id_col).alias("_id"), quantized(vec_col).alias("qv")
    )
    rows = (
        q.withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h", "_id")
        .limit(k_codes)
        .select("qv")
        .collect()
    )
    if not rows:
        raise ValueError("pq_init_codebooks: no vectors to sample codebooks from")
    dims = len(rows[0]["qv"])
    if dims % m_subs:
        raise ValueError(f"dims {dims} not divisible into {m_subs} subspaces")
    d_sub = dims // m_subs
    out = []
    for m in range(m_subs):
        for code, r in enumerate(rows):
            out.append((m, code, [int(x) for x in r["qv"][m * d_sub : (m + 1) * d_sub]]))
    return out


def _pq_codes_arrow(
    q: DataFrame,
    codebook_rows: list[tuple[int, int, list[int]]],
    m_subs: int,
    d_sub: int,
    id_col: str,
) -> DataFrame:
    """Arrow-vectorized PQ encoding (r14, guide §4.2 + §2.4): ONE int64
    GEMM per (Arrow batch, subspace) replaces the explode → broadcast
    join → (id, sub) hash-aggregate argmin — removing the encoder's
    corpus-sized EXCHANGE outright.  d2 is exact integer algebra
    (‖v‖² + ‖cw‖² − 2·v·cw == Σ(v−cw)², exact in int64, so the value is
    IDENTICAL to the SQL fold no matter the formulation); ties break to
    the lowest code via argmin-first exactly like min(struct(d2,
    code)).  Parity pinned in tests/test_np_assign.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    CW = [
        np.array(
            [cw for s, c, cw in codebook_rows if s == m], dtype=np.int64
        )
        for m in range(m_subs)
    ]

    @F.pandas_udf(
        StructType(
            [
                StructField("codes", ArrayType(IntegerType())),
                StructField("d2s", ArrayType(LongType())),
            ]
        )
    )
    def _enc(qv):  # no hints: postponed annotations break inference
        if not len(qv):
            return pd.DataFrame({"codes": [], "d2s": []})
        V = np.vstack(qv.to_numpy()).astype(np.int64)
        codes = np.empty((len(V), m_subs), dtype=np.int32)
        d2s = np.empty((len(V), m_subs), dtype=np.int64)
        for m in range(m_subs):
            Vm = V[:, m * d_sub : (m + 1) * d_sub]
            D = (
                (Vm * Vm).sum(axis=1)[:, None]
                + (CW[m] * CW[m]).sum(axis=1)[None, :]
                - 2 * (Vm @ CW[m].T)
            )
            codes[:, m] = np.argmin(D, axis=1)
            d2s[:, m] = D[np.arange(len(V)), codes[:, m]]
        return pd.DataFrame({"codes": list(codes), "d2s": list(d2s)})

    enc = q.withColumn("_e", _enc.asNondeterministic()(F.col("qv")))
    return enc.select(
        id_col,
        F.posexplode(F.arrays_zip(F.col("_e.codes"), F.col("_e.d2s"))).alias(
            "sub", "_z"
        ),
    ).select(
        id_col,
        "sub",
        F.col("_z.codes").alias("code"),
        F.col("_z.d2s").alias("d2"),
    )


def pq_assign_codes(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subs: int = 4,
    k_codes: int = 8,
    codebook_rows: list[tuple[int, int, list[int]]] | None = None,
    use_arrow: bool = True,
) -> DataFrame:
    """Product-quantization encoding — the memory side of the IVF-PQ
    ANN stack (IVF prunes the search space; PQ compresses residuals/
    vectors to ``m_subs`` bytes): each vector splits into ``m_subs``
    subvectors, each subvector takes the code of its min-L2 codeword
    (exact integer distance in quantized milli-units, ties to the
    lowest code).  Output: (id, sub, code, d2) — d2 kept because the
    summed per-subspace distances are the ADC lookup tables a PQ
    scorer precomputes.

    ``codebook_rows`` accepts a precomputed :func:`pq_init_codebooks`
    result so composite callers (``pq_adc_topk``, the streaming
    maintainer) derive the codebook ONCE instead of paying a second
    sorted-sample collect per call (ADVICE r9).

    Default path (r14): Arrow/numpy per-row encoding — zero shuffle
    (see :func:`_pq_codes_arrow`).  ``use_arrow=False`` keeps the pure
    SQL shape — one bounded explode (×``m_subs``), a broadcast join
    against the KB-sized codebook, one (id, sub) hash agg for the
    argmin — as the oracle-formulation parity witness.  64 dims × 4
    subs × 8 codes keeps distances < 2^40 — far inside bigint."""
    spark = embeddings.sparkSession
    if codebook_rows is None:
        codebook_rows = pq_init_codebooks(embeddings, id_col, vec_col, m_subs, k_codes)
    q = embeddings.select(F.col(id_col), quantized(vec_col).alias("qv"))
    # slice bounds are per-subspace literals: derive the (validated)
    # static dims from the codebook rows rather than re-scanning
    dims = len(codebook_rows[0][2]) * m_subs
    d_sub = dims // m_subs
    if use_arrow:
        return _pq_codes_arrow(q, codebook_rows, m_subs, d_sub, id_col)
    cb = spark.createDataFrame(
        codebook_rows,
        "sub int, code int, cw array<bigint>",
    )
    subvecs = F.array(
        *[
            F.struct(
                F.lit(m).alias("sub"),
                F.slice("qv", m * d_sub + 1, d_sub).alias("v"),
            )
            for m in range(m_subs)
        ]
    )
    exploded = q.select(id_col, F.explode(subvecs).alias("s")).select(
        id_col, F.col("s.sub").alias("sub"), F.col("s.v").alias("v")
    )
    d2 = F.aggregate(
        F.zip_with("v", "cw", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = exploded.join(F.broadcast(cb), "sub").withColumn("_d2", d2)
    pick = scored.groupBy(id_col, "sub").agg(
        F.min(F.struct(F.col("_d2").alias("d2"), F.col("code").alias("code"))).alias("_m")
    )
    return pick.select(
        id_col,
        "sub",
        F.col("_m.code").alias("code"),
        F.col("_m.d2").alias("d2"),
    )


def pq_adc_topk(
    embeddings: DataFrame,
    queries_filter,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subs: int = 4,
    k_codes: int = 8,
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the scan side
    of IVF-PQ: corpus vectors exist only as ``m_subs`` codes, queries
    stay exact, and a query's distance to a vector is the SUM of
    per-subspace lookup-table entries d2(query_sub, codeword[code]).

    The lookup table is |queries|·m·k rows — broadcast-trivial (that
    is the point of ADC: one table lookup per stored code instead of
    a d-dim multiply per vector).  The scan is one broadcast join on
    (sub, code) + one (query, vector) hash agg + the per-query top-k
    window.  All exact integer quantized arithmetic, ties
    (d2, neighbor) ASC — bit-reproducible, so the oracle re-derives
    codes, tables, and ranking."""
    spark = embeddings.sparkSession
    cb_rows = pq_init_codebooks(embeddings, id_col, vec_col, m_subs, k_codes)
    cb = spark.createDataFrame(cb_rows, "sub int, code int, cw array<bigint>")
    dims = len(cb_rows[0][2]) * m_subs
    d_sub = dims // m_subs

    codes = pq_assign_codes(
        embeddings, id_col, vec_col, m_subs, k_codes, codebook_rows=cb_rows
    ).select(F.col(id_col).alias("neighbor_id"), "sub", "code")
    subvecs = F.array(
        *[
            F.struct(
                F.lit(m).alias("sub"),
                F.slice("qv", m * d_sub + 1, d_sub).alias("v"),
            )
            for m in range(m_subs)
        ]
    )
    qs = (
        embeddings.where(queries_filter)
        .select(F.col(id_col).alias("query_id"), quantized(vec_col).alias("qv"))
        .select("query_id", F.explode(subvecs).alias("s"))
        .select("query_id", F.col("s.sub").alias("sub"), F.col("s.v").alias("v"))
    )
    d2 = F.aggregate(
        F.zip_with("v", "cw", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    lut = qs.join(F.broadcast(cb), "sub").select(
        "query_id", "sub", "code", d2.alias("_d2")
    )
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("_d2").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_d2", "rank")
    )


# ── IVF-PQ composition (round 10) ────────────────────────────────────────


def _min_l2_cell(rows_qv: list[list[int]], centroids: list[list[int]]) -> int:
    """argmin integer L2 cell for one quantized vector (ties to the
    lowest cell) — the driver-side mirror of the in-plan assignment,
    exact integer math so Spark, DuckDB, and this helper agree."""
    best = None
    for cell, cv in enumerate(centroids):
        d2 = sum((int(a) - int(b)) ** 2 for a, b in zip(rows_qv, cv))
        if best is None or d2 < best[0]:
            best = (d2, cell)
    return best[1]


def ivfpq_init(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    m_subs: int = 4,
    k_codes: int = 8,
) -> tuple[list[list[int]], list[tuple[int, int, list[int]]]]:
    """Coarse quantizer + RESIDUAL codebooks for IVF-PQ, both seedless.

    Centroids are the md5-ordered first ``n_cells`` quantized vectors
    (:func:`ivf_init_centroids`'s rule).  The PQ codebook samples the
    NEXT ``k_codes`` vectors in the same order (offset sample — reusing
    the centroid rows would make every sampled residual zero and the
    codebook degenerate), takes each sample's residual against its own
    min-L2 centroid, and slices it into ``m_subs`` subspace codewords.
    Everything is exact integer arithmetic over a deterministic sample,
    so a SQL oracle re-derives both tables (LIMIT k OFFSET n).  Sizes:
    n_cells·d + k·d ints — KBs, broadcast-trivial by design."""
    q = embeddings.select(F.col(id_col).alias("_id"), quantized(vec_col).alias("qv"))
    rows = (
        q.withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h", "_id")
        .limit(n_cells + k_codes)
        .select("qv")
        .collect()
    )
    if len(rows) < n_cells + k_codes:
        raise ValueError(
            f"ivfpq_init: need at least {n_cells + k_codes} vectors, "
            f"got {len(rows)}"
        )
    cents = [[int(x) for x in r["qv"]] for r in rows[:n_cells]]
    dims = len(cents[0])
    if dims % m_subs:
        raise ValueError(f"dims {dims} not divisible into {m_subs} subspaces")
    d_sub = dims // m_subs
    out = []
    for code, r in enumerate(rows[n_cells:]):
        qv = [int(x) for x in r["qv"]]
        cell = _min_l2_cell(qv, cents)
        rv = [a - b for a, b in zip(qv, cents[cell])]
        for m in range(m_subs):
            out.append((m, code, rv[m * d_sub : (m + 1) * d_sub]))
    # (sub, code) ordering to match pq_init_codebooks' layout
    out.sort(key=lambda t: (t[0], t[1]))
    return cents, out


def _l2_q(a: Column, b: Column) -> Column:
    """Exact integer squared-L2 of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ivfpq_assign_codes(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    m_subs: int = 4,
    k_codes: int = 8,
    centroids: list[list[int]] | None = None,
    codebook_rows: list[tuple[int, int, list[int]]] | None = None,
    use_arrow: bool = True,
) -> DataFrame:
    """IVF-PQ encoding: (id, cell, sub, code) — each vector's min-L2
    coarse cell plus the PQ codes of its RESIDUAL (vector − centroid).
    Residual encoding is the standard IVF-PQ design: residuals are
    centered near zero, so one shared codebook quantizes them far
    tighter than raw vectors — and the cell column is exactly what lets
    the ADC scan prune to probed cells.

    Default path (r14, guide §4.2 + §2.4): one Arrow batch pays an
    int64 GEMM for the cell argmin, the integer residual, and the
    per-subspace code argmins — ZERO corpus shuffle (the SQL shape's
    two hash-aggregate exchanges are gone).  Exact-integer L2 means
    any algebraic formulation yields the identical d2, and
    argmin-first-min matches both min(struct(d2, cell, …)) and
    min(struct(d2, code)) tie rules; parity pinned in
    tests/test_np_assign.py.  ``use_arrow=False`` keeps the SQL shape:
    one broadcast join against the ``n_cells``-row centroid table + a
    min(struct) argmin, then the pq_assign shape — bounded ×``m_subs``
    explode, broadcast codebook join, one (id, sub) hash agg."""
    spark = embeddings.sparkSession
    if centroids is None or codebook_rows is None:
        centroids, codebook_rows = ivfpq_init(
            embeddings, id_col, vec_col, n_cells, m_subs, k_codes
        )
    dims = len(centroids[0])
    d_sub = dims // m_subs

    q = embeddings.select(F.col(id_col), quantized(vec_col).alias("qv"))
    if use_arrow:
        import numpy as np
        import pandas as pd
        from pyspark.sql.types import (
            ArrayType,
            IntegerType,
            StructField,
            StructType,
        )

        CENT = np.array(centroids, dtype=np.int64)
        CW = [
            np.array(
                [cw for s, c, cw in codebook_rows if s == m], dtype=np.int64
            )
            for m in range(m_subs)
        ]

        @F.pandas_udf(
            StructType(
                [
                    StructField("cell", IntegerType()),
                    StructField("codes", ArrayType(IntegerType())),
                ]
            )
        )
        def _enc(qv):  # no hints: postponed annotations break inference
            if not len(qv):
                return pd.DataFrame({"cell": [], "codes": []})
            V = np.vstack(qv.to_numpy()).astype(np.int64)
            D = (
                (V * V).sum(axis=1)[:, None]
                + (CENT * CENT).sum(axis=1)[None, :]
                - 2 * (V @ CENT.T)
            )
            cell = np.argmin(D, axis=1)
            R = V - CENT[cell]
            codes = np.empty((len(V), m_subs), dtype=np.int32)
            for m in range(m_subs):
                Rm = R[:, m * d_sub : (m + 1) * d_sub]
                Dm = (
                    (Rm * Rm).sum(axis=1)[:, None]
                    + (CW[m] * CW[m]).sum(axis=1)[None, :]
                    - 2 * (Rm @ CW[m].T)
                )
                codes[:, m] = np.argmin(Dm, axis=1)
            return pd.DataFrame(
                {"cell": cell.astype(np.int32), "codes": list(codes)}
            )

        enc = q.withColumn("_e", _enc.asNondeterministic()(F.col("qv")))
        return enc.select(
            id_col,
            F.col("_e.cell").alias("cell"),
            F.posexplode(F.col("_e.codes")).alias("sub", "code"),
        )

    cent = spark.createDataFrame(
        [(i, cv) for i, cv in enumerate(centroids)], "cell int, cv array<bigint>"
    )
    cb = spark.createDataFrame(codebook_rows, "sub int, code int, cw array<bigint>")

    scored = q.crossJoin(F.broadcast(cent)).withColumn(
        "_d2", _l2_q(F.col("qv"), F.col("cv"))
    )
    # min(struct) argmin: d2 then cell decide before cv is ever compared
    picked = scored.groupBy(id_col).agg(
        F.min(
            F.struct(
                F.col("_d2").alias("d2"),
                F.col("cell").alias("cell"),
                F.col("cv").alias("cv"),
            )
        ).alias("_m"),
        F.first("qv").alias("qv"),
    )
    resid = picked.select(
        id_col,
        F.col("_m.cell").alias("cell"),
        F.zip_with("qv", "_m.cv", lambda a, b: a - b).alias("rv"),
    )
    subvecs = F.array(
        *[
            F.struct(
                F.lit(m).alias("sub"),
                F.slice("rv", m * d_sub + 1, d_sub).alias("v"),
            )
            for m in range(m_subs)
        ]
    )
    exploded = resid.select(id_col, "cell", F.explode(subvecs).alias("s")).select(
        id_col, "cell", F.col("s.sub").alias("sub"), F.col("s.v").alias("v")
    )
    pick = (
        exploded.join(F.broadcast(cb), "sub")
        .withColumn("_d2", _l2_q(F.col("v"), F.col("cw")))
        .groupBy(id_col, "cell", "sub")
        .agg(
            F.min(
                F.struct(F.col("_d2").alias("d2"), F.col("code").alias("code"))
            ).alias("_m")
        )
    )
    return pick.select(id_col, "cell", "sub", F.col("_m.code").alias("code"))


def ivfpq_adc_topk(
    embeddings: DataFrame,
    queries_filter,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    nprobe: int = 2,
    m_subs: int = 4,
    k_codes: int = 8,
    k: int = 10,
) -> DataFrame:
    """True IVF-PQ retrieval (closes VERDICT r9 #1): the ADC scan runs
    ONLY over the query's ``nprobe`` min-L2 cells instead of the whole
    corpus code table, and distances are computed against RESIDUAL
    codes — per probed cell the query builds its own residual lookup
    table, so approx distance = Σ_m d2(query_residual_m, codeword_m),
    the textbook IVF-PQ ADC.

    Plan: corpus side is :func:`ivfpq_assign_codes` (cell-keyed codes);
    query side is |Q|·nprobe·m·k LUT rows — broadcast-trivial — and the
    scan is ONE equi-join on (cell, sub, code): a corpus code row
    matches only when its cell is probed by that query, which is the
    pruning (work ~ corpus·nprobe/n_cells per query, never the full
    scan pq_adc_topk pays).  All exact integer arithmetic, ties
    (adc_d2, neighbor_id) ASC — bit-reproducible end to end."""
    spark = embeddings.sparkSession
    centroids, cb_rows = ivfpq_init(
        embeddings, id_col, vec_col, n_cells, m_subs, k_codes
    )
    dims = len(centroids[0])
    d_sub = dims // m_subs
    cent = spark.createDataFrame(
        [(i, cv) for i, cv in enumerate(centroids)], "cell int, cv array<bigint>"
    )
    cb = spark.createDataFrame(cb_rows, "sub int, code int, cw array<bigint>")

    codes = ivfpq_assign_codes(
        embeddings, id_col, vec_col, n_cells, m_subs, k_codes,
        centroids=centroids, codebook_rows=cb_rows,
    ).select(F.col(id_col).alias("neighbor_id"), "cell", "sub", "code")

    qs = embeddings.where(queries_filter).select(
        F.col(id_col).alias("query_id"), quantized(vec_col).alias("qv")
    )
    pw = Window.partitionBy("query_id").orderBy(F.col("_d2").asc(), F.col("cell").asc())
    probes = (
        qs.crossJoin(F.broadcast(cent))
        .withColumn("_d2", _l2_q(F.col("qv"), F.col("cv")))
        .withColumn("_rn", F.row_number().over(pw))
        .where(F.col("_rn") <= nprobe)
        .select(
            "query_id", "cell",
            F.zip_with("qv", "cv", lambda a, b: a - b).alias("qrv"),
        )
    )
    subvecs = F.array(
        *[
            F.struct(
                F.lit(m).alias("sub"),
                F.slice("qrv", m * d_sub + 1, d_sub).alias("v"),
            )
            for m in range(m_subs)
        ]
    )
    lut = (
        probes.select("query_id", "cell", F.explode(subvecs).alias("s"))
        .select("query_id", "cell", F.col("s.sub").alias("sub"), F.col("s.v").alias("v"))
        .join(F.broadcast(cb), "sub")
        .select("query_id", "cell", "sub", "code", _l2_q(F.col("v"), F.col("cw")).alias("_d2"))
    )
    scored = (
        codes.join(F.broadcast(lut), ["cell", "sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("_d2").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_d2", "rank")
    )


# ── OPQ-lite permutation (round 11) ──────────────────────────────────────


def opq_permutation(dims: int) -> list[int]:
    """Deterministic OPQ-lite dimension permutation (VERDICT r10 #4):
    original dims 0..dims−1 ordered by (md5(str(dim)), dim) — position
    p of the permuted vector takes original coordinate ``perm[p]``.

    This is the permutation-only member of the OPQ family (Ge et al.
    2014 optimize a full rotation R; their natural baseline is exactly
    a coordinate reshuffle): L2 distances are invariant under it, but
    SUBSPACE slicing is not — a layout whose high-variance /
    cluster-signal coordinates sit consecutively (one subspace hoards
    all the structure, k codewords can't cover it, the rest quantize
    noise) gets them spread across subspaces, each of which then needs
    only its own 1-D structure covered.  md5-rank is the same
    engine-portable ordering rule every sampler in this module uses —
    DuckDB re-derives it from the same strings, no seed, no state."""
    import hashlib

    return sorted(
        range(dims), key=lambda j: (hashlib.md5(str(j).encode()).hexdigest(), j)
    )


def permute_embedding(
    df: DataFrame, vec_col: str = "embedding", perm: list[int] | None = None
) -> DataFrame:
    """Reorder a vector column's coordinates by ``perm`` (position p ←
    original dim perm[p]).  Pure per-row projection — whole-stage
    codegen, zero shuffle, zero UDF; at 100 TB this fuses into the
    scan.  The identity on L2 distances, so exact-search results are
    unchanged while every subspace-sliced stage (PQ/IVF-PQ codes)
    sees the rotated layout."""
    if not perm or sorted(perm) != list(range(len(perm))):
        raise ValueError("perm must be a permutation of range(dims)")
    arr = F.array(*[F.col(vec_col).getItem(p) for p in perm])
    return df.withColumn(vec_col, arr)
