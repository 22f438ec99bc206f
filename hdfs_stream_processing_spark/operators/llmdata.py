"""LLM training-data curation operators: chunking, PII redaction,
benchmark decontamination, source mixing, shard assignment, repetition
filters.

These are the corpus-preparation stages a 100 TB pre-training pipeline
runs between raw ingest and the tokenizer — the reference pipeline
(VuBacktracking/hdfs-stream-processing) stops at ES indexing, so this
module is part of the beyond-reference LLM surface alongside
``operators/dedup.py`` and ``operators/similarity.py``.

Scale design, shared across the module:

- Everything is deterministic and engine-portable: sampling and ordering
  decisions go through md5-derived hash buckets (never ``rand()``), so a
  task retry, a different partitioning, or a different engine produces
  the SAME sample / order / shard — and DuckDB can oracle each stage
  bit-exactly.
- Chunking and redaction are narrow (per-row) — zero shuffles, full
  whole-stage codegen; they scale linearly with input splits.
- Decontamination broadcasts the benchmark n-gram set (benchmarks are
  MBs, the corpus is TBs) so the corpus side never shuffles for the
  probe; only the per-doc hit count aggregates.
- Shard assignment is the one intentional shuffle (that's its job: a
  global training-order re-partition), sorted within shards so the
  writer emits sequentially-readable training files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hdfs_stream_processing_spark.operators.text import tokens

__all__ = [
    "boilerplate_chunks",
    "cap_per_group",
    "chunk_documents",
    "redact_pii",
    "decontaminate",
    "mix_sources",
    "pack_extend",
    "pack_sequences",
    "resample_sources",
    "shard_assign",
    "repetition_stats",
]


def _md5_bucket(col: Column, buckets: int) -> Column:
    """Deterministic bucket in [0, buckets): first 8 hex chars of md5 as
    an integer (the house portable-hash idiom — same value in DuckDB via
    ``('0x' || substr(md5(x),1,8))::UBIGINT``)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % F.lit(buckets)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping token windows (context-length
    packing for training / RAG indexing).

    Chunk ``k`` covers tokens ``[k*stride, k*stride + chunk_size)``;
    with ``stride < chunk_size`` consecutive chunks overlap by
    ``chunk_size - stride`` tokens.  Chunk starts are every multiple of
    ``stride`` below ``n_tokens``, so ``chunk_id = start / stride`` is
    dense and deterministic.

    Scale: narrow ops only (split → sequence → explode → slice) — ZERO
    shuffles; output rows ≈ input_tokens / stride regardless of
    partitioning.  The explode multiplies rows ~n/stride ×, so at 100 TB
    feed this from splits sized by ``maxPartitionBytes`` — no skew issue
    because per-doc fan-out is bounded by max doc length.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = df.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    # sequence(0, n-1, stride): all chunk starts < n (n >= 1 always —
    # split of "" yields [""]).
    starts = toks.select(
        id_col,
        "_toks",
        F.explode(
            F.sequence(F.lit(0), F.col("_n") - F.lit(1), F.lit(stride))
        ).alias("_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + F.lit(1), F.lit(chunk_size))
    return starts.select(
        F.col(id_col),
        (F.col("_start") / F.lit(stride)).cast("bigint").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


# (pattern, replacement) — applied IN ORDER; order matters: emails go
# first (their local parts can contain digit runs), IPv4 before bare
# digit runs (dots keep the octets under the {7,} run length anyway, but
# the explicit order makes the contract obvious).  Patterns restrict to
# RE2 ∩ java.util.regex syntax so Spark and the DuckDB oracle agree.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    (r"(\d{1,3}\.){3}\d{1,3}", "<IP>"),
    (r"\d{7,}", "<NUM>"),
]


def redact_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Scrub PII-shaped spans (emails, IPv4 addresses, long digit runs)
    and count what was removed, per document.

    Returns ``(id, clean_text, n_email, n_ip, n_num)`` — the counts make
    the redaction auditable (corpus release notes need "how many emails
    did we remove", not just the clean text).

    Audit contract: pattern ``i`` is counted on the text REMAINING after
    patterns ``0..i-1`` were applied — each count is exactly the number
    of spans that rule itself replaced, and the counts partition the
    redacted spans (a digit run inside an email local part is counted
    once, under ``n_email``, never double-counted under ``n_num``).

    Scale: pure ``regexp_count`` + ``regexp_replace`` chain — narrow,
    zero shuffles, whole-stage codegen; the regexes are RE2-compatible
    (no backtracking blowups on adversarial documents).
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    out = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    counts: list[Column] = []
    clean = F.col("_t")
    for i, (pat, repl) in enumerate(pats):
        # count on the text as this rule sees it (post prior replacements)
        counts.append(F.regexp_count(clean, F.lit(pat)).alias(f"_c{i}"))
        clean = F.regexp_replace(clean, pat, repl)
    named = ["n_email", "n_ip", "n_num"]
    return out.select(
        id_col,
        clean.alias("clean_text"),
        *[
            c.alias(named[i] if i < len(named) else f"n_pat{i}")
            for i, c in enumerate(counts)
        ],
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with an eval/benchmark set (the GPT-3/Pile
    procedure: 8–13-gram collision ⇒ contaminated).

    Returns every doc with ``n_hits`` (count of DISTINCT colliding
    n-grams) and ``contaminated``; callers drop or quarantine flagged
    rows.  Collision probability for honest data is ~0 at n=8, so the
    flag is high-precision.

    Scale: the benchmark n-gram set is broadcast (eval suites are MBs —
    a few 10^6 distinct n-grams — vs a TB-scale corpus), so the corpus
    side is probed map-side with NO shuffle.  Corpus n-grams stay
    multiset (no corpus-wide DISTINCT shuffle); dedup happens inside
    ``count_distinct`` AFTER the probe, so only COLLIDING grams — a tiny
    fraction — ever shuffle.  The hit table (≈ contaminated docs) is
    then broadcast back onto the corpus for the flag join; if an eval
    suite ever overlaps a large corpus fraction, drop that hint.
    """
    from hdfs_stream_processing_spark.operators.dedup import shingle_rows

    bench_grams = shingle_rows(benchmark, id_col, text_col, n=n, distinct=True).select(
        F.col("shingle").alias("_bgram")
    ).distinct()
    doc_grams = shingle_rows(docs, id_col, text_col, n=n, distinct=False)
    hits = (
        doc_grams.join(
            F.broadcast(bench_grams),
            doc_grams["shingle"] == bench_grams["_bgram"],
            "inner",
        )
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("shingle")).alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(F.broadcast(hits), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def mix_sources(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Weighted source mixing: keep each row with per-source probability
    ``weights[source]`` (1.0 = keep all, 0.25 = quarter-sample), chosen
    by a deterministic md5 bucket of ``key_col``.

    This is the "data mixture" stage (e.g. up-weight wiki, down-sample
    common-crawl).  Hash sampling — not ``rand()`` or ``sample()`` — so
    the mixture is reproducible across runs/retries/engines and
    membership is stable: a doc either is or isn't in the mixture,
    independent of partitioning.  Weights > 1.0 (true up-sampling /
    epoch duplication) are rejected here; duplication is an explode on
    ceil(w) with the same hash deciding the fractional copy.

    Scale: a narrow filter — zero shuffles, combines with the scan's
    predicate pushdown on ``source`` when weights are 0 for a source.
    """
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {s!r} must be in [0,1], got {w}")
    # int(round(...)) — the same weight→threshold map as resample_sources,
    # so w=0.35 keeps the identical deterministic sample under either
    # operator (truncation would make it 3499/10000 here, 3500 there).
    rate: Column = F.lit(int(round(default_weight * buckets)))
    for s, w in weights.items():
        rate = F.when(
            F.col(source_col) == F.lit(s), F.lit(int(round(w * buckets)))
        ).otherwise(rate)
    return df.where(_md5_bucket(F.col(key_col), buckets) < rate)


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "s0",
) -> DataFrame:
    """Global training-order shuffle + shard assignment: every row gets
    ``(shard_id, pos)`` — shard by hash, position by a second
    seed-dependent hash order within the shard.

    Changing ``seed`` reshuffles both membership order and within-shard
    order deterministically (epoch reshuffles are just seed bumps — no
    state to carry).  md5 ordering means the "random" order is
    reproducible and oracle-checkable, unlike ``rand()``.

    Scale: ONE shuffle — the point of the operator (a global re-order
    cannot be narrow).  shard_id is hash-uniform so shards are balanced;
    the within-shard ``row_number`` is a per-shard sort, which at 100 TB
    becomes ``repartition(n_shards, shard_id) .sortWithinPartitions
    (ord)`` + a partitioned write so each training file is one
    sequentially-readable shard.  A rank-based global position would
    need a total order across all shards (range exchange); per-shard
    positions are what data loaders actually consume.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    ordh = F.md5(F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string")))
    out = df.withColumn("_ord", ordh).withColumn(
        "shard_id",
        F.conv(F.substring(F.col("_ord"), 1, 8), 16, 10).cast("long")
        % F.lit(n_shards),
    )
    w = Window.partitionBy("shard_id").orderBy(F.col("_ord"), F.col(key_col))
    return out.withColumn("pos", F.row_number().over(w)).drop("_ord")


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    capacity: int,
    n_shards: int,
    seed: str = "s0",
) -> DataFrame:
    """GPT-style sequence packing: lay the corpus out as fixed-length
    training sequences.  Documents are concatenated in a deterministic
    seed-dependent order and the token stream is cut every ``capacity``
    tokens — documents cross sequence boundaries (the standard
    concat-and-split packing used for pre-training, not bin-packing
    with padding).  Each document gets the coordinates a data loader
    needs to place it: which shard, which sequence its first token
    lands in (``seq_id``), and the offset of that token within the
    sequence (``seq_off``).

    Output adds ``shard_id``, ``pos`` (document order within the
    shard), ``seq_id``, ``seq_off``.

    Scale: ONE shuffle — the same hash-shard exchange as
    :func:`shard_assign`; the running token total is a window sum over
    the identical partitioning, so Catalyst plans no second exchange.
    The cumulative sum per shard is sequential, which is exactly why
    packing shards FIRST matters: 100 TB packs as n_shards independent
    prefix sums instead of one global one (a global cumulative sum
    would need a range repartition).  Deterministic md5 ordering means
    a retry or engine change reproduces byte-identical sequence
    layouts.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    ordh = F.md5(F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string")))
    out = df.withColumn("_ord", ordh).withColumn(
        "shard_id",
        F.conv(F.substring(F.col("_ord"), 1, 8), 16, 10).cast("long")
        % F.lit(n_shards),
    )
    w = Window.partitionBy("shard_id").orderBy(F.col("_ord"), F.col(key_col))
    cum_prior = F.coalesce(
        F.sum(F.col(tokens_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("long")
    return (
        out.withColumn("pos", F.row_number().over(w))
        .withColumn("seq_id", F.floor(cum_prior / F.lit(capacity)))
        .withColumn("seq_off", cum_prior % F.lit(capacity))
        .drop("_ord")
    )


def pack_extend(
    shard_state: DataFrame,
    batch: DataFrame,
    key_col: str,
    tokens_col: str,
    capacity: int,
    n_shards: int,
    seed: str = "s0",
) -> DataFrame:
    """Extend packed training shards with a NEW batch of documents —
    the incremental form of :func:`pack_sequences`.  Already-packed
    documents keep their coordinates (a data loader may have consumed
    them); the batch appends to each shard's token stream where it left
    off.

    ``shard_state`` is the per-shard cursor the pack table maintains:
    ``(shard_id, n_docs, total_toks)`` — two additive numbers per
    shard, itself a :func:`rollup_merge`-style incremental aggregate.
    A shard with no state row starts at zero, so the initial load is
    just ``pack_extend(empty_state, corpus)``.

    Scale: identical ONE-shuffle shape as ``pack_sequences`` (shard
    exchange shared by the position window and the prefix sum); the
    cursor table is n_shards rows and broadcasts onto the batch.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    ordh = F.md5(F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string")))
    out = batch.withColumn("_ord", ordh).withColumn(
        "shard_id",
        F.conv(F.substring(F.col("_ord"), 1, 8), 16, 10).cast("long")
        % F.lit(n_shards),
    )
    st = shard_state.select(
        "shard_id",
        F.col("n_docs").alias("_st_docs"),
        F.col("total_toks").alias("_st_toks"),
    )
    out = out.join(F.broadcast(st), "shard_id", "left").na.fill(
        {"_st_docs": 0, "_st_toks": 0}
    )
    w = Window.partitionBy("shard_id").orderBy(F.col("_ord"), F.col(key_col))
    cum_prior = (
        F.col("_st_toks")
        + F.coalesce(
            F.sum(F.col(tokens_col)).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
    ).cast("long")
    return (
        out.withColumn("pos", (F.col("_st_docs") + F.row_number().over(w)).cast("int"))
        .withColumn("seq_id", F.floor(cum_prior / F.lit(capacity)))
        .withColumn("seq_off", cum_prior % F.lit(capacity))
        .drop("_ord", "_st_docs", "_st_toks")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    max_top_frac: float = 0.20,
    min_distinct_frac: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of all
    word ``n``-grams taken by the single most frequent one
    (``top_ngram_frac``), the distinct-n-gram ratio
    (``distinct_frac``), and a ``passes_repetition`` gate combining
    both (Rae et al. 2021 use exactly these shapes: "fraction of
    characters in most common n-gram" / "duplicate n-gram fraction").

    Boilerplate and template spam have a dominant repeated n-gram;
    honest prose does not.

    Scale: explode n-grams → two chained hash aggregates
    ((doc, gram) counts, then per-doc max/sum) — partial aggregation
    does most of the work map-side; one shuffle on (doc, gram), one on
    doc.  No windows, no self-joins.
    """
    from hdfs_stream_processing_spark.operators.dedup import shingle_rows

    grams = shingle_rows(df, id_col, text_col, n=n, distinct=False)
    per_gram = grams.groupBy(id_col, "shingle").agg(
        F.count(F.lit(1)).alias("_c")
    )
    agg = per_gram.groupBy(id_col).agg(
        F.max("_c").alias("_top"),
        F.sum("_c").alias("_total"),
        F.count(F.lit(1)).alias("_distinct"),
    )
    top_frac = F.col("_top") / F.col("_total")
    distinct_frac = F.col("_distinct") / F.col("_total")
    return agg.select(
        id_col,
        F.col("_total").alias("n_ngrams"),
        top_frac.alias("top_ngram_frac"),
        distinct_frac.alias("distinct_frac"),
        (
            (top_frac <= F.lit(max_top_frac))
            & (distinct_frac >= F.lit(min_distinct_frac))
        ).alias("passes_repetition"),
    )


def resample_sources(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Generalized mixture with UP-sampling: weight 2.5 emits every row
    twice plus a deterministic half of rows a third time (fractional
    epoch duplication); weight 0.5 keeps half — one formula for both:

        copies = floor(w·B)/B  +  (bucket < (w·B mod B))

    Output rows carry a dense ``copy`` index (0..copies-1) so
    downstream sharding can give each duplicate its own training
    position (shard on ``(key, copy)``, not ``key``).

    Like :func:`mix_sources`, membership of the fractional copy is an
    md5 bucket of ``key_col`` — reproducible across engines, runs,
    retries, and partitionings.  Scale: narrow (filter + bounded
    explode, fan-out ≤ ceil(max weight)); zero shuffles.
    """
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {s!r} must be >= 0, got {w}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight}")
    wb: Column = F.lit(int(round(default_weight * buckets)))
    for s, w in weights.items():
        wb = F.when(
            F.col(source_col) == F.lit(s), F.lit(int(round(w * buckets)))
        ).otherwise(wb)
    bucket = _md5_bucket(F.col(key_col), buckets)
    copies = (wb / F.lit(buckets)).cast("int") + (
        bucket < wb % F.lit(buckets)
    ).cast("int")
    # filter BEFORE the sequence: Spark's sequence(0, -1) would count
    # DOWN (step defaults to -1 when start > stop), not return empty
    return (
        df.withColumn("_copies", copies)
        .where(F.col("_copies") > 0)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.col("_copies") - F.lit(1)))
        )
        .drop("_copies")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    n: int,
) -> DataFrame:
    """Per-group cap: keep at most ``n`` rows per group under a TOTAL
    order — the per-domain document cap every crawl-curation pipeline
    applies so no single site dominates the corpus (RefinedWeb,
    Gopher/MassiveWeb all cap per domain).  ``order`` decides WHICH
    rows survive (e.g. quality desc with a unique-id tiebreak), so the
    kept set is engine- and partitioning-independent, same contract as
    dedup_exact.

    One shuffle on the group key; the window prunes map-side partials
    to n per group before the exchange when Spark plans a rank filter.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def boilerplate_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document boilerplate detection: chunk every document into
    non-overlapping ``chunk_size``-token windows, and flag a chunk VALUE
    as boilerplate when it occurs in at least ``min_docs`` DISTINCT
    documents (RefinedWeb / Falcon run exactly this pass at line
    granularity — "exact line deduplication across the corpus"; this
    corpus has no newlines, so the unit is the fixed-size token chunk).
    Returns one row per document: total chunks/tokens, boilerplate
    chunks, and the token count that survives dropping them — the
    retention report a curation run reviews before committing the drop.

    Scale: the chunk explode is narrow; the document-frequency count and
    the instance↔frequency join both hash-partition on the chunk CONTENT
    key, so the work distributes by content (no skew beyond genuinely
    viral boilerplate, which is the thing being measured) and nothing is
    ever collected or broadcast — corpus-sized both sides, exactly how
    line-dedup runs at 100 TB.
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would flag everything)")
    chunks = chunk_documents(
        df, id_col, text_col, chunk_size=chunk_size, stride=chunk_size
    ).select(id_col, "chunk_text", "n_tokens")
    docfreq = chunks.groupBy("chunk_text").agg(
        F.count_distinct(id_col).alias("_nd")
    )
    marked = chunks.join(docfreq, "chunk_text").withColumn(
        "_boiler", F.col("_nd") >= F.lit(min_docs)
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("_boiler").cast("long")).alias("n_boiler_chunks"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(
            F.when(~F.col("_boiler"), F.col("n_tokens")).otherwise(F.lit(0))
        ).alias("kept_tokens"),
    )


def token_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Stride-1 ``k``-token window table — the shared head of every
    substring-level dedup stage (batch detection, scrub, streaming
    doc-frequency maintenance): one row per (doc, offset) with the
    window CONTENT joined back into a string key.  Narrow k× explode,
    no shuffle; works unchanged on batch and streaming frames."""
    if k < 2:
        raise ValueError("window length k must be >= 2 tokens")
    from hdfs_stream_processing_spark.operators.text import tokens

    with_toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    return with_toks.select(
        id_col,
        F.size("_toks").alias("_n_toks"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(size(_toks), {k}) - {k} + 1),"
                f" i -> array_join(slice(_toks, i, {k}), ' '))"
            )
        ).alias("_off", "_sh"),
    )


def spans_from_marked(marked: DataFrame, id_col: str, k: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated window STARTS into maximal
    spans: ``marked`` is the shingle table restricted to duplicated
    window contents (however the dup set was derived — batch
    doc-frequency or a streaming-maintained rollup).  One ranking
    window per document (bounded by doc length)."""
    w = Window.partitionBy(id_col).orderBy("_off")
    islands = marked.withColumn("_isl", F.col("_off") - F.row_number().over(w))
    return (
        islands.groupBy(id_col, "_isl")
        .agg(
            F.min("_off").cast("int").alias("span_start"),
            (
                F.least(F.max("_off") + F.lit(k), F.min("_n_toks"))
                - F.min("_off")
            ).cast("int").alias("span_len"),
            F.count(F.lit(1)).cast("int").alias("n_windows"),
        )
        .select(id_col, "span_start", "span_len", "n_windows")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact substring-level duplicate detection (round 11): find the
    maximal token SPANS of each document whose content also appears in
    other documents — the production corpus-dedup pass that removes
    *repeated substrings spanning documents*, not whole docs
    (:func:`~.dedup.exact_dedup`) or aligned chunks
    (:func:`boilerplate_chunks`).  Public method (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): the
    suffix-array pass reduced to fixed window length ``k`` — every
    stride-1 ``k``-token window whose content occurs in >= ``min_docs``
    distinct documents is a duplicated window; adjacent duplicated
    window starts merge (gaps-and-islands) into maximal spans.

    Returns one row per (document, span): ``span_start`` (0-based token
    offset), ``span_len`` (tokens covered, clipped at the document
    end), ``n_windows`` (merged window count — span_len − k + 1 for
    interior spans; the redundancy witness).

    Scale: the stride-1 window explode is narrow (k× token volume, no
    shuffle); the document-frequency aggregate and the instance↔dup
    join both hash-partition on window CONTENT, so work distributes by
    content with map-side partial aggregation — the same
    corpus-scale-on-both-sides shape as :func:`boilerplate_chunks`
    (skew only on genuinely viral strings, which is the signal).  The
    island window partitions per document (bounded by doc length), and
    a 100 TB run would group on ``xxhash64(window)`` instead of the
    text to cut shuffle bytes ~6×; content is kept here so the stage
    stays bit-exactly oracle-checkable.
    """
    if k < 2:
        raise ValueError("window length k must be >= 2 tokens")
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would flag everything)")
    sh = token_shingles(df, id_col, text_col, k)
    dup = (
        sh.groupBy("_sh")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .where(F.col("_nd") >= F.lit(min_docs))
        .select("_sh")
    )
    marked = sh.join(dup, "_sh")
    return spans_from_marked(marked, id_col, k)


def scrub_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The curation ACTION behind :func:`duplicated_spans` (r11):
    rewrite each document with duplicated substrings removed, keeping
    exactly ONE occurrence corpus-wide — Lee et al. 2022's exactsubstr
    rule ("remove all but one") made deterministic: for every
    duplicated ``k``-token window content, the KEEPER occurrence is
    the lexicographically smallest (doc_id, offset); a token survives
    if it is covered by no duplicated window at all, or by at least
    one keeper window (keeper coverage wins over overlapping
    non-keeper duplicates, so the kept copy is never chewed up by a
    neighboring span).

    Returns (id, n_tokens, n_removed, clean_text) — clean_text is the
    surviving tokens in original order.

    Scale: the same content-hash-partitioned doc-frequency aggregate
    and instance↔dup join as duplicated_spans, plus a (doc, position)
    coverage aggregate (bounded ×k explode) and the per-doc
    reassembly shuffle — which is the job: the scrub output IS a
    rewritten corpus, written once.  min(struct) keeps the keeper
    choice a single map-side-partial aggregate; nothing is collected
    or broadcast."""
    if k < 2:
        raise ValueError("window length k must be >= 2 tokens")
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would flag everything)")
    sh = token_shingles(df, id_col, text_col, k)
    dup = (
        sh.groupBy("_sh")
        .agg(
            F.count_distinct(F.col(id_col)).alias("_nd"),
            F.min(F.struct(F.col(id_col).alias("d"), F.col("_off").alias("o"))).alias("_keep"),
        )
        .where(F.col("_nd") >= F.lit(min_docs))
        .select("_sh", "_keep")
    )
    return scrub_with_keepers(df, id_col, text_col, k, dup, shingles=sh)


def scrub_with_keepers(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    dup_keepers: DataFrame,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """The rewrite tail of :func:`scrub_spans`, factored out (round 12)
    so batch and streaming paths literally share the operator code:
    ``dup_keepers`` is the duplicated-window table — (_sh, _keep) with
    ``_keep`` a struct<d, o> naming the keeper (doc, offset) per
    duplicated window content — however it was derived (the one-shot
    doc-frequency aggregate in scrub_spans, or a streaming-maintained
    min-merge rollup).  Applies the keeper-coverage rule and re-emits
    (id, n_tokens, n_removed, clean_text).  Pass ``shingles`` to reuse
    an already-built shingle table for the occurrence join (scrub_spans
    does — r13, so the corpus is tokenized+posexploded ONCE per scrub,
    not twice).

    Scale: the instance↔dup join hash-partitions on window content;
    the coverage aggregate is a bounded ×k explode; the per-doc
    reassembly shuffle is the job's output."""
    if k < 2:
        raise ValueError("window length k must be >= 2 tokens")
    from hdfs_stream_processing_spark.operators.text import tokens

    with_toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    toks = with_toks.select(
        id_col,
        F.size("_toks").alias("_n_toks"),
        F.posexplode("_toks").alias("_pos", "_tok"),
    )
    sh = shingles if shingles is not None else token_shingles(df, id_col, text_col, k)
    occ = sh.join(dup_keepers, "_sh").select(
        id_col,
        "_off",
        "_n_toks",
        (
            (F.col(id_col) == F.col("_keep.d")) & (F.col("_off") == F.col("_keep.o"))
        ).alias("_is_keeper"),
    )
    cover = occ.select(
        id_col,
        F.explode(
            F.sequence(
                F.col("_off"),
                F.least(F.col("_off") + F.lit(k - 1), F.col("_n_toks") - F.lit(1)),
            )
        ).alias("_pos"),
        "_is_keeper",
    ).groupBy(id_col, "_pos").agg(F.max("_is_keeper").alias("_kept"))
    marked = toks.join(cover, [id_col, "_pos"], "left")
    # survives: uncovered (null) or covered-by-keeper (true)
    surv = marked.withColumn(
        "_drop", F.coalesce(~F.col("_kept"), F.lit(False))
    )
    return surv.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.col("_drop").cast("long")).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_drop"),
                            F.struct(F.col("_pos").alias("p"), F.col("_tok").alias("t")),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            " ",
        ).alias("clean_text"),
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, int]],
    buckets: int = 100,
) -> DataFrame:
    """Deterministic train/val/test assignment (round 11): each row's
    md5-derived hash bucket of ``key_col`` is mapped through the
    cumulative ``splits`` cuts — e.g. ``[("train", 80), ("val", 10),
    ("test", 10)]`` sends buckets [0,80) to train, [80,90) to val,
    [90,100) to test.  Hash-based (never rand()) so the assignment is
    reproducible across engines, runs, partitionings, and task
    retries, and any JOIN-adjacent table splits consistently by the
    same key — the leakage-safety property a training pipeline needs
    (group-leakage-safe when ``key_col`` is the dedup-cluster or
    source key rather than the row id).

    Adds a ``split`` string column; pure map-side, zero shuffle.
    """
    if not splits or any(w <= 0 for _, w in splits):
        raise ValueError("splits must be non-empty (name, weight>0) pairs")
    total = sum(w for _, w in splits)
    if total != buckets:
        raise ValueError(f"split weights must sum to buckets ({buckets}); got {total}")
    bucket = _md5_bucket(F.col(key_col), buckets)
    expr = None
    cum = 0
    for name, w in splits:
        cum += w
        cond = bucket < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)
