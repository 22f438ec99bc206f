"""Deduplication operators (SURVEY §2.10 N2/N3): exact, MinHash-LSH,
SimHash, and n-gram Jaccard.

Scale design — the part that matters at 100 TB:

- **exact**: hash-groupBy on the dedup key.  One shuffle on the key; the
  representative row is chosen by a deterministic total order (window
  row_number), never "whichever partition won the race" like a bare
  ``dropDuplicates``.
- **MinHash + LSH**: shingle → k min-hashes → band buckets → equi-join on
  bucket.  The candidate-pair join is an *equi-join on band signature*,
  i.e. O(colliding pairs), never the O(n²) all-pairs comparison.  Shuffle
  keys are (band_id, band_hash) — high cardinality, naturally spread.
- **SimHash**: one 32-bit fingerprint per doc via weighted bit votes;
  near-dup candidates come from equality on fingerprint prefixes.

All hashing is md5-derived (hash s of a shingle = 32-bit hex window
``s % 4`` of ``md5(f"{s // 4}:{shingle}")`` — four hash functions per
digest): md5 is identical in every engine, so even the MinHash
signatures are bit-for-bit oracle-checkable in DuckDB — unusual for a
MinHash implementation and deliberate here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hdfs_stream_processing_spark.operators.text import tokens


def dedup_exact(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep one deterministic representative row per key group.

    ``order`` must be a total order within groups (e.g. a unique id) so
    the survivor is engine- and partitioning-independent — unlike
    ``dropDuplicates``, whose survivor is arbitrary.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def dedup_incremental(
    batch: DataFrame,
    existing_keys: DataFrame,
    keys: list[str],
    order: list[Column],
) -> DataFrame:
    """Deduplicate a NEW batch against an already-deduplicated corpus —
    the form dedup actually takes in a continuously-ingesting 100 TB
    pipeline, where re-deduplicating the whole corpus per crawl is off
    the table.  A recrawled page (same content hash, new doc id) is
    dropped because the corpus already has it; duplicates WITHIN the
    batch collapse to one deterministic survivor, same contract as
    :func:`dedup_exact`.

    ``existing_keys`` is the corpus's dedup-key projection (e.g. a
    maintained ``md5(text)`` column table) — at scale a tiny fraction
    of corpus bytes, bucketed on the key so the anti-join below never
    re-shuffles it.

    Two key-hash operations sized by the BATCH, not the corpus: a
    left-anti equi-join against ``existing_keys`` and the in-batch
    survivor window.  Catalyst shares one exchange for both (the
    window's partitioning equals the join key), and a day-sized key set
    broadcasts the anti-join entirely map-side.
    """
    fresh = batch.join(
        existing_keys.select(*keys).distinct(), keys, "left_anti"
    )
    return dedup_exact(fresh, keys, order)


def dedup_near_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    corpus_bands: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 2,
    min_jaccard: float = 0.5,
    verify_shingle_n: int = 1,
    keep_shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate dedup of a NEW batch against an existing corpus —
    the incremental MinHash-LSH shape (:func:`dedup_incremental` is the
    exact-hash analog).  The corpus maintains a band-hash table
    (``corpus_bands``: id, band, band_hash — the output schema of
    :func:`band_hashes`); each load:

    1. signs the batch and equi-joins its bands against the corpus band
       table → cross candidates (batch doc, corpus doc);
    2. verifies candidates with exact shingle Jaccard, touching ONLY
       the candidate corpus docs (semi-join point-reads, never corpus
       bytes at large) — verified batch docs drop;
    3. among the corpus-clean remainder, runs the usual within-batch
       LSH → verify → connected-components → keep-component-min.

    Survivors are the rows to append to the corpus (and their bands to
    the band table) — history is never re-deduplicated.

    Scale: every join is an equi-join on (band, band_hash) or on a
    shingle among LSH-bounded candidates; the corpus-sized inputs
    (bands, texts) are touched by semi-join only.  The one iterative
    piece — components — runs on the within-batch verified pairs, a
    batch-bounded graph.

    ``keep_shingles`` (one column, "shingle") gates EVERY verify join
    to that allow-list — pass the corpus's low-df word set (shingles in
    ≤ N corpus docs), maintained incrementally like the band table.
    Without it a stopword puts every candidate on one join key and the
    verify goes quadratic in candidates — measured 10.6× on a 10× data
    step at sf1, vs linear with the cutoff.  Jaccard then lives on the
    filtered universe, the same (documented) semantics as
    ``jaccard_pairs(max_doc_freq=...)``.
    """
    # the batch signature feeds BOTH the corpus band probe and the
    # within-batch LSH pairs — materialize it once (batch-sized, 8
    # longs per doc) instead of re-running the shingle explode + 8
    # hash mins per consumer (measured: the parallel recompute inside
    # one job is slower than this one extra blocking job at sf0.1)
    sig = minhash_signature_wide(
        batch, id_col, text_col, num_hashes, shingle_n
    ).localCheckpoint()
    batch_bands = band_hashes(sig, id_col, num_hashes, band_size)
    # The batch side is load-sized by contract (the corpus is the 100 TB
    # side, touched by this join and nothing else at large): broadcast
    # the batch band probe so corpus_bands streams through map-side with
    # ZERO corpus-side exchange — r6's plan sort-merge-joined here and
    # paid 2 SMJs + a corpus shuffle (VERDICT r6 #4).
    cross = (
        F.broadcast(batch_bands.select(F.col(id_col).alias("id_a"), "band", "band_hash"))
        .join(
            corpus_bands.select(F.col(id_col).alias("id_b"), "band", "band_hash"),
            ["band", "band_hash"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # ONE unified candidate list: (batch, corpus) cross pairs tagged
    # is_cross, plus within-batch LSH pairs — so the expensive verify
    # (shingle explode, sizes, pair-expansion intersection) runs as a
    # SINGLE pass instead of r6's two (the within-batch verify used to
    # re-shingle the whole corpus-clean batch a second time; this was
    # the dominant cost of the operator at sf0.1).  Within-batch pairs
    # touching a corpus-dup id are dropped AFTER the verify — same final
    # edge set, since dropping an endpoint drops its edges either way.
    cand = cross.withColumn("is_cross", F.lit(True)).unionByName(
        lsh_candidate_pairs(sig, id_col, num_hashes, band_size, wide=True)
        .select("id_a", "id_b")
        .withColumn("is_cross", F.lit(False))
    )
    # the corpus is the only side that needs a candidate-id restriction
    # (point-reads into the 100 TB table); the batch side is load-sized
    # and its per-doc shingle work is codegen-cheap, and the id-keyed
    # verify join below drops non-candidates for free — so no batch-side
    # pre-filter, one less broadcast + blocking job
    c_ids = cross.select(F.col("id_b").alias(id_col)).distinct()
    side_b = F.when(F.col("is_cross"), F.lit("c")).otherwise(F.lit("b"))
    if keep_shingles is None:
        # ARRAY verify (the fast path): per candidate doc, ONE row
        # carrying its distinct-shingle array (pure codegen, no explode
        # shuffle); Jaccard per pair via array_intersect — two narrow
        # equi-joins on id and zero aggregation.  Shuffle volume is
        # O(pairs × doc_len), same as pair-expansion, but the per-pair
        # intersection runs inside whole-stage codegen instead of a
        # (doc, shingle)-keyed groupBy.  Stopword immunity is
        # unchanged: the join keys are doc ids, never shingles.
        arr = shingle_array(batch, id_col, text_col, verify_shingle_n).withColumn(
            "_side", F.lit("b")
        ).unionByName(
            shingle_array(
                corpus.join(F.broadcast(c_ids), id_col, "left_semi"),
                id_col, text_col, verify_shingle_n,
            ).withColumn("_side", F.lit("c"))
        )
        verified = (
            arr.where(F.col("_side") == "b")
            .select(F.col(id_col).alias("id_a"), F.col("_sa").alias("_ta"))
            .join(F.broadcast(cand.withColumn("_sb", side_b)), "id_a")
            .join(
                arr.select(
                    F.col("_side").alias("_sb"),
                    F.col(id_col).alias("id_b"),
                    F.col("_sa").alias("_tb"),
                ),
                ["_sb", "id_b"],
            )
            .withColumn("_n", F.size(F.array_intersect("_ta", "_tb")))
            .where(
                F.col("_n").cast("double")
                / (F.size("_ta") + F.size("_tb") - F.col("_n")).cast("double")
                >= F.lit(min_jaccard)
            )
            .select("id_a", "id_b", "is_cross")
        )
    else:
        # ROW verify: the shingle allow-list (corpus low-df set, itself
        # a big distributed table) gates via a semi-join, which needs
        # exploded (id, shingle) rows — sizes then live on the filtered
        # universe (documented keep_shingles semantics)
        b_ids = (
            cand.select(F.col("id_a").alias(id_col))
            .unionByName(
                cand.where(~F.col("is_cross")).select(F.col("id_b").alias(id_col))
            )
            .distinct()
        )
        sh = (
            shingle_rows(
                batch.join(F.broadcast(b_ids), id_col, "left_semi"),
                id_col, text_col, verify_shingle_n,
            )
            .withColumn("_side", F.lit("b"))
            .unionByName(
                shingle_rows(
                    corpus.join(F.broadcast(c_ids), id_col, "left_semi"),
                    id_col, text_col, verify_shingle_n,
                ).withColumn("_side", F.lit("c"))
            )
            .join(keep_shingles.select("shingle"), "shingle", "left_semi")
            # four consumers (both sides of the intersection join, both
            # size lookups) — materialize the explode+filter once
            .localCheckpoint()
        )
        sizes = sh.groupBy("_side", id_col).agg(F.count(F.lit(1)).alias("_sz"))
        inter = (
            sh.where(F.col("_side") == "b")
            .select(F.col(id_col).alias("id_a"), "shingle")
            .join(F.broadcast(cand.withColumn("_sb", side_b)), "id_a")
            .join(
                sh.select(
                    F.col("_side").alias("_sb"), F.col(id_col).alias("id_b"), "shingle"
                ),
                ["_sb", "id_b", "shingle"],
            )
            .groupBy("id_a", "id_b", "is_cross", "_sb")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        verified = (
            inter.join(
                F.broadcast(
                    sizes.where(F.col("_side") == "b").select(
                        F.col(id_col).alias("id_a"), F.col("_sz").alias("_sza")
                    )
                ),
                "id_a",
            )
            .join(
                F.broadcast(
                    sizes.select(
                        F.col("_side").alias("_sb"),
                        F.col(id_col).alias("id_b"),
                        F.col("_sz").alias("_szb"),
                    )
                ),
                ["_sb", "id_b"],
            )
            .where(
                F.col("_n").cast("double")
                / (F.col("_sza") + F.col("_szb") - F.col("_n")).cast("double")
                >= F.lit(min_jaccard)
            )
            .select("id_a", "id_b", "is_cross")
        )
    # the verified edge set feeds the drop list, the within-batch
    # component graph, and (via broadcast) the survivor joins —
    # materialize the single verify pass once (pair-bounded)
    verified = verified.localCheckpoint()
    dup_bids = verified.where("is_cross").select(F.col("id_a").alias(id_col)).distinct()
    # dup_bids and comp are both bounded by the batch's verified
    # near-dup set, never corpus-sized — broadcast them so the batch
    # table is never shuffled for the final anti-join / survivor join
    # (r6's plan paid an SMJ + full batch exchange for each)
    clean = batch.join(F.broadcast(dup_bids), id_col, "left_anti")
    within = (
        verified.where(~F.col("is_cross"))
        .join(F.broadcast(dup_bids.select(F.col(id_col).alias("id_a"))), "id_a", "left_anti")
        .join(F.broadcast(dup_bids.select(F.col(id_col).alias("id_b"))), "id_b", "left_anti")
    )
    from hdfs_stream_processing_spark.operators.graph import connected_components

    comp = connected_components(within.select("id_a", "id_b"))
    return (
        clean.join(F.broadcast(comp), clean[id_col] == comp["id"], "left")
        .where(F.col("id").isNull() | (clean[id_col] == F.col("component")))
        .drop("id", "component")
    )


def md5_hash64(col: Column, seed: int) -> Column:
    """Deterministic 32-bit hash from md5 — engine-portable (md5 is
    byte-identical in Spark, DuckDB, and every other engine; Spark's
    native ``hash``/``xxhash64`` are not portable)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 8), 16, 10).cast(
        "long"
    )


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 2, distinct: bool = True
) -> DataFrame:
    """(id, shingle) exploded rows.

    ``distinct=True`` gives set semantics (required for Jaccard — a
    shuffle).  Operators that fold shingles through an idempotent
    aggregate (MinHash's min) pass ``distinct=False`` and skip that
    shuffle entirely: min over the multiset equals min over the set.
    """
    with_toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    sh = with_toks.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(_toks), {n}) - {n} + 1),"
                f" i -> array_join(slice(_toks, i, {n}), ' '))"
            )
        ).alias("shingle"),
    )
    return sh.distinct() if distinct else sh


def shingle_array(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """(id, _sa) — the doc's DISTINCT shingle set as one array column.
    Pure codegen (no explode, no shuffle): the row-set analog of
    ``shingle_rows(distinct=True)``, for verifies that consume whole
    per-doc sets at once (``array_intersect`` Jaccard)."""
    with_toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    return with_toks.select(
        id_col,
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, greatest(size(_toks), {n}) - {n} + 1),"
                f" i -> array_join(slice(_toks, i, {n}), ' '))"
            )
        ).alias("_sa"),
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8, shingle_n: int = 2
) -> DataFrame:
    """Per-doc MinHash signature: (id, seed, minhash) rows.

    min over shingles of h_seed(shingle) for each of ``num_hashes`` seeds.
    Implemented as explode × seeds → groupBy(id, seed) min — one shuffle
    keyed on (id, seed); partial aggregation compresses map-side, so
    shuffle volume is O(docs × seeds), not O(shingles × seeds).
    """
    # wide aggregation (k hash columns, ONE groupBy(id) of k min()s) then
    # unpivot — instead of exploding k seeds and shuffling O(shingles·k)
    # rows; see minhash_signature_wide
    wide = minhash_signature_wide(df, id_col, text_col, num_hashes, shingle_n)
    stack = ", ".join(f"{s}L, m{s}" for s in range(num_hashes))
    return wide.selectExpr(
        id_col, f"stack({num_hashes}, {stack}) AS (seed, minhash)"
    ).select(id_col, "seed", "minhash")


def minhash_signature_wide(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8, shingle_n: int = 2
) -> DataFrame:
    """Wide-form MinHash signature: one row per doc, columns m0..m{k-1}.
    One explode + ONE shuffle (the groupBy(id) partial-min) total.

    The input is repartitioned by id first: a doc row explodes into
    ~n_tokens shingles each hashed k times, so compute amplification is
    ~60k× per input row — spreading the small doc table across the
    cluster BEFORE the explode is almost free and parallelizes the
    expensive part (single-row-group parquet would otherwise pin the
    whole hash workload to one task).
    """
    # explicit partition COUNT: repartition(col) alone gets AQE-coalesced
    # back to 1 partition (the doc table is tiny BY BYTES — AQE can't see
    # the downstream explode amplification); REPARTITION_BY_NUM is exempt
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(n_parts, F.col(id_col))
    sh = shingle_rows(df, id_col, text_col, shingle_n, distinct=False)
    # one 128-bit md5 yields FOUR 32-bit hash functions (disjoint hex
    # windows) - ceil(k/4) digests per shingle instead of k
    hashed = sh.select(
        id_col,
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{s // 4}:"), F.col("shingle"))),
                    1 + (s % 4) * 8,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .alias(f"h{s}")
            for s in range(num_hashes)
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"h{s}").alias(f"m{s}") for s in range(num_hashes)]
    )


def band_hashes(sig_wide: DataFrame, id_col: str, num_hashes: int, band_size: int) -> DataFrame:
    """(id, band, band_hash) from the wide signature — a pure projection
    + unpivot, NO shuffle: the band members are already columns of the
    row.  Members are sorted numerically before hashing (oracle parity:
    lexicographic '10' < '9' would diverge from numeric list_sort)."""
    n_bands = num_hashes // band_size
    stacks = []
    for b in range(n_bands):
        members = ", ".join(f"m{b * band_size + j}" for j in range(band_size))
        stacks.append(
            f"{b}, md5(concat_ws(',', transform(array_sort(array({members})), x -> CAST(x AS STRING))))"
        )
    return sig_wide.selectExpr(
        id_col, f"stack({n_bands}, {', '.join(stacks)}) AS (band, band_hash)"
    )


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    band_size: int = 2,
    wide: bool = False,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair (id_a < id_b).

    Band hash = md5 of the (numerically sorted) minhashes in the band;
    the candidate join is an equi-join on (band, band_hash) — the scale
    path that avoids all-pairs.  With ``wide=True`` (signature from
    minhash_signature_wide) banding is shuffle-free — the whole
    candidate generation costs one groupBy + one equi-join.
    """
    if wide:
        band_sig = band_hashes(sig, id_col, num_hashes, band_size)
    else:
        banded = sig.withColumn(
            "band", F.floor(F.col("seed") / F.lit(float(band_size))).cast("int")
        )
        band_sig = banded.groupBy(id_col, "band").agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list(F.col("minhash"))), lambda x: x.cast("string")
                    ),
                )
            ).alias("band_hash")
        )
    a = band_sig.select(
        F.col(id_col).alias("id_a"), F.col("band"), F.col("band_hash")
    )
    b = band_sig.select(
        F.col(id_col).alias("id_b"), F.col("band"), F.col("band_hash")
    )
    return (
        a.join(b, on=["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 1,
    min_jaccard: float = 0.5,
    candidates: DataFrame | None = None,
    max_doc_freq: int | None = None,
    keep_shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity between documents.

    With ``candidates`` (e.g. from LSH) intersections are computed by
    PAIR-EXPANSION: each candidate pair expands by the left doc's
    shingles, then equi-joins the right side on (doc, shingle) — cost
    O(pairs × doc_len), never a function of shingle document frequency.
    This is the 100 TB path: a stopword cannot form a quadratic join
    bucket because the join key always carries a doc id.  Without
    ``candidates`` it self-joins on shared shingles, which is
    O(pairs-sharing-a-shingle): still far from all-pairs, but only
    safe at moderate scale or with ``max_doc_freq``.

    ``max_doc_freq`` drops shingles appearing in more than that many
    docs before the join — the standard document-frequency cutoff.  At
    100 TB a stopword shingle appears in ~every doc, putting ~n docs on
    ONE join key (a quadratic bucket on a single reducer); ubiquitous
    shingles also carry no similarity signal.  Sizes are computed over
    the SAME filtered shingle universe, so Jaccard stays internally
    consistent: |A'∩B'| / |A'∪B'|.

    ``keep_shingles`` is the externally-maintained form of the same
    cutoff: a one-column ("shingle") allow-list — e.g. the corpus's
    word-df stat in incremental dedup, where the df universe must be
    the CORPUS, not whichever batch is flowing through.  Mutually
    exclusive with ``max_doc_freq``.

    Jaccard = |A∩B| / (|A|+|B|-|A∩B|), all exact integers.
    """
    if max_doc_freq is not None and keep_shingles is not None:
        raise ValueError("pass max_doc_freq or keep_shingles, not both")
    if max_doc_freq is not None and candidates is not None:
        # ADVICE r7: the candidate pre-filter below must not silently
        # change max_doc_freq's universe — document frequency is
        # defined over the FULL input, not the candidate-touched docs.
        # Compute the allow-list on unfiltered shingle rows first, then
        # let the narrowed call reuse it via keep_shingles (one extra
        # shingling pass, only when both options are combined).
        full_sh = shingle_rows(df, id_col, text_col, shingle_n)
        keep = (
            full_sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_doc_freq)
            .select("shingle")
        )
        return jaccard_pairs(
            df, id_col, text_col, shingle_n,
            min_jaccard=min_jaccard,
            candidates=candidates, keep_shingles=keep,
        )
    if candidates is not None:
        # only docs that appear in a candidate pair need shingling —
        # the LSH-bounded id set broadcasts, so the corpus-scale doc
        # table is filtered map-side instead of exploding every doc's
        # shingles to verify a small pair set (this was the dominant
        # cost of dedup_near_incr's within-batch phase: the whole
        # clean batch shingled to verify a few hundred pairs)
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .unionByName(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        df = df.join(F.broadcast(cand_ids), id_col, "left_semi")
    sh = shingle_rows(df, id_col, text_col, shingle_n)
    if keep_shingles is not None:
        sh = sh.join(keep_shingles.select("shingle"), "shingle", "left_semi")
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        # pair-expansion: expand each candidate pair by the left doc's
        # shingles, then equi-join the right side on (doc, shingle).
        # Cost is O(pairs × doc_len) — independent of shingle document
        # frequency, so a ubiquitous shingle CANNOT create a quadratic
        # join bucket (the composite key always contains a doc id).
        # The shared-shingle join below would put every candidate doc
        # on one key per stopword — measured 10.6× on a 10× data step
        # before this path existed.
        inter = (
            candidates.select("id_a", "id_b")
            .distinct()
            .join(sh.select(F.col(id_col).alias("id_a"), "shingle"), "id_a")
            .join(
                sh.select(F.col(id_col).alias("id_b"), "shingle"),
                ["id_b", "shingle"],
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        a = sh.select(F.col(id_col).alias("id_a"), "shingle")
        b = sh.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jacc = (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    return jacc.where(F.col("jaccard") >= min_jaccard)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per distinct token take an md5-derived
    ``bits``-bit hash; each bit votes ±1; fingerprint bit = sign of the
    vote sum.  Narrow explode + one groupBy — O(tokens) work, a single
    64-bit fingerprint per doc out.
    """
    tok = (
        df.select(F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("token"))
        .withColumn(
            "h", F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
        )
    )
    # bit votes WITHOUT a 32x bit-explode: vote_i = 2*SUM((h>>i)&1) - n,
    # so one groupBy(doc) with `bits` popcount-style sums replaces
    # O(tokens*bits) exploded rows; fingerprint assembles from the wide
    # row in a single projection.
    counted = tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.expr(f"shiftright(h, {i}) & 1")).alias(f"b{i}")
            for i in range(bits)
        ],
    )
    fingerprint = " + ".join(
        f"(CASE WHEN 2 * b{i} > _n THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(bits)
    )
    return counted.selectExpr(id_col, f"({fingerprint}) AS simhash")


def jaccard_join_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    t_num: int,
    t_den: int,
    shingle_n: int = 1,
) -> DataFrame:
    """Exact set-similarity JOIN with **prefix filtering** (the
    PPJoin/AllPairs family — Xiao et al., WWW'08; Bayardo et al.,
    WWW'07 — public papers): all pairs with Jaccard ≥ ``t_num/t_den``
    → ``(id_a, id_b, jaccard)``, id_a < id_b.

    Same answer as the brute-force shared-shingle join, at a fraction
    of the candidates: order every doc's shingles by GLOBAL document
    frequency (rarest first, ties by shingle — a total order), and a
    pair can reach threshold t only if their length-
    ``|x| − ⌈t·|x|⌉ + 1`` prefixes share a shingle.  Candidates are
    therefore generated by an equi-join on PREFIX shingles only — the
    frequent shingles that create quadratic join buckets are exactly
    the ones prefixes exclude — plus the length filter
    ``t·|a| ≤ |b| ≤ |a|/t`` folded into the join.  Verification is
    per-pair ``array_intersect`` on the two (distinct-set) shingle
    arrays: O(candidates × doc_len), never a second shared-token join.

    The threshold is a RATIONAL (``t_num/t_den``): ⌈t·s⌉ computed as
    ``(t_num·s + t_den − 1) div t_den`` keeps the prefix length exact —
    a float ceil can round 0.6·5 up to 4 and silently shorten the
    prefix below the theorem's bound (false negatives).  The final
    threshold compare is integer too: ``t_den·|A∩B| ≥ t_num·|A∪B|``.

    Scale: one df-count aggregate, one per-doc sort (doc-local), one
    equi-join on rare prefix shingles, one per-pair verify — the
    standard exact-similarity-join plan at corpus scale.  The oracle is
    the brute-force all-pairs Jaccard, so the prefix filter's
    no-false-negative property is verified, not assumed.
    """
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    sh = shingle_rows(df, id_col, text_col, shingle_n)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    docs = (
        sh.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_df"), F.col("shingle")))
            ).alias("_toks")
        )
        .withColumn("sz", F.size("_toks"))
        .withColumn(
            "_plen",
            F.expr(
                f"cast(sz - (({t_num}L * sz + {t_den - 1}L) div {t_den}L) + 1 as int)"
            ),
        )
    ).localCheckpoint(eager=False)
    pref = docs.select(
        F.col(id_col),
        "sz",
        F.explode(F.expr("slice(_toks, 1, _plen)")).alias("_tk"),
    ).select(F.col(id_col), "sz", F.col("_tk.shingle").alias("shingle"))
    ca = pref.select(
        F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "shingle"
    )
    cb = pref.select(
        F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "shingle"
    )
    cand = (
        ca.join(cb, "shingle")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.lit(t_den) * F.col("sz_b") >= F.lit(t_num) * F.col("sz_a"))
            & (F.lit(t_den) * F.col("sz_a") >= F.lit(t_num) * F.col("sz_b"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    arrs = docs.select(
        F.col(id_col),
        F.expr("transform(_toks, x -> x.shingle)").alias("_arr"),
        "sz",
    )
    aa = arrs.select(
        F.col(id_col).alias("id_a"), F.col("_arr").alias("_arr_a"),
        F.col("sz").alias("sz_a"),
    )
    ab = arrs.select(
        F.col(id_col).alias("id_b"), F.col("_arr").alias("_arr_b"),
        F.col("sz").alias("sz_b"),
    )
    verified = (
        cand.join(aa, "id_a")
        .join(ab, "id_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("_arr_a", "_arr_b")).cast("long")
        )
        .where(
            F.lit(t_den) * F.col("n_inter")
            >= F.lit(t_num) * (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
        )
    )
    return verified.select(
        "id_a",
        "id_b",
        (
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double")
        ).alias("jaccard"),
    )


def containment_join_prefix(
    probe: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    t_num: int,
    t_den: int,
    shingle_n: int = 1,
) -> DataFrame:
    """Asymmetric set-CONTAINMENT join with prefix filtering: all pairs
    with ``|A∩B| / |A| ≥ t_num/t_den`` for A from ``probe`` and B from
    ``index`` → ``(id_a, id_b, containment)``.

    Containment is the copy/quote-detection relation Jaccard misses: a
    short doc wholly embedded in a long one scores near-zero Jaccard
    (the union is huge) but containment 1.0.  The prefix theorem
    adapts: at most ``|A| − ⌈t·|A|⌉`` of A's shingles may fall outside
    B, so A's rarest-first prefix of length ``|A| − ⌈t·|A|⌉ + 1`` must
    share a shingle with B — candidates come from that PREFIX joined
    against B's FULL shingle index (B's extra shingles are
    unconstrained, so B cannot be prefix-pruned — the inherent
    asymmetry of containment).  Size filter ``t·|A| ≤ |B|`` folds into
    the join; verification is per-pair ``array_intersect``.  The
    threshold stays rational end-to-end (⌈t·s⌉ via integer div; final
    compare ``t_den·|A∩B| ≥ t_num·|A|``) — no float ceil, no false
    negatives (property-tested against brute force).

    Scale: like :func:`jaccard_join_prefix`, the quadratic stopword
    buckets never become join keys on the probe side; the index side
    carries full postings, the standard trade for asymmetric joins
    (dedup a daily batch against the corpus: probe = batch).
    """
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    sha = shingle_rows(probe, id_col, text_col, shingle_n)
    shb = shingle_rows(index, id_col, text_col, shingle_n)
    # one consistent global rarity order across both sides (internal
    # only — candidate generation; the verify is exact regardless)
    dfreq = (
        sha.unionByName(shb).groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    )
    docs_a = (
        sha.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_df"), F.col("shingle")))
            ).alias("_toks")
        )
        .withColumn("sz", F.size("_toks"))
        .withColumn(
            "_plen",
            F.expr(
                f"cast(sz - (({t_num}L * sz + {t_den - 1}L) div {t_den}L) + 1 as int)"
            ),
        )
    ).localCheckpoint(eager=False)
    pref_a = docs_a.select(
        F.col(id_col).alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.explode(F.expr("slice(_toks, 1, _plen)")).alias("_tk"),
    ).select("id_a", "sz_a", F.col("_tk.shingle").alias("shingle"))
    sz_b = shb.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz_b"))
    full_b = shb.join(sz_b, id_col).select(
        F.col(id_col).alias("id_b"), "sz_b", "shingle"
    )
    cand = (
        pref_a.join(full_b, "shingle")
        .where(
            (F.col("id_a") != F.col("id_b"))
            # |A∩B| ≤ |B|, so containment ≥ t needs t·|A| ≤ |B|
            & (F.lit(t_den) * F.col("sz_b") >= F.lit(t_num) * F.col("sz_a"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    arr_a = docs_a.select(
        F.col(id_col).alias("id_a"),
        F.expr("transform(_toks, x -> x.shingle)").alias("_aa"),
    )
    arr_b = shingle_array(index, id_col, text_col, shingle_n).select(
        F.col(id_col).alias("id_b"), F.col("_sa").alias("_ab")
    )
    return (
        cand.join(arr_a, "id_a")
        .join(arr_b, "id_b")
        .withColumn("_n", F.size(F.array_intersect("_aa", "_ab")))
        .where(F.lit(t_den) * F.col("_n") >= F.lit(t_num) * F.size("_aa"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("_n").cast("double") / F.size("_aa").cast("double")
            ).alias("containment"),
        )
    )


def hamming_candidates(
    df: DataFrame,
    id_col: str,
    band_cols: list[str],
    band_bits: int,
    probe_bits: int,
    probe_blocks: int = 1,
) -> DataFrame:
    """The candidate stage of :func:`banded_hamming_pairs`, exposed so
    scale probes can MEASURE candidate volume (r13, VERDICT r12 #2 —
    the quantity the probe-width defect hid): one row per
    (probe collision), i.e. per (id_a < id_b, probe index) whose probe
    key matches exactly.  The matcher distincts this; the raw row
    count IS the join work.

    ``probe_blocks`` (r14, VERDICT r13 #4 — Manku, Jain & Das Sarma,
    WWW 2007): with the default 1, each probe key is one
    ``probe_bits``-wide fingerprint block (P = total/probe_bits keys
    per item).  With 2, each probe key is the CONCATENATION of an
    ordered PAIR of blocks — C(P, 2) probes per item with
    2·probe_bits-wide keys (32 bits at the default 16), collapsing the
    random-collision floor from P·N²/2^16 to C(P,2)·N²/2^32 at the
    cost of one unit of guaranteed radius: a pair within Hamming
    distance P−2 has ≥ 2 clean blocks by pigeonhole, so the clean
    pair's concatenated key collides.  The ×C(P,2) probe-row widening
    (120 at P=16) is the bounded price of the 2^16-fold key-space
    gain — the right trade at the 10⁹-item regime where single-block
    candidates go quadratic (see banded_hamming_pairs's Scale note)."""
    if not band_cols:
        raise ValueError("need at least one band column")
    if band_bits < 1 or probe_bits < 1 or band_bits % probe_bits != 0:
        # a non-dividing probe width would silently truncate
        # probes_per_band and leave the top band bits unprobed,
        # under-generating candidates with no error (ADVICE r13)
        raise ValueError("probe_bits must divide band_bits")
    if probe_blocks not in (1, 2):
        raise ValueError("probe_blocks must be 1 or 2")
    mask = (1 << probe_bits) - 1
    probes_per_band = band_bits // probe_bits
    block_exprs = [
        F.shiftright(F.col(c), j * probe_bits).bitwiseAND(F.lit(mask))
        for c in band_cols
        for j in range(probes_per_band)
    ]
    if probe_blocks == 2:
        if len(block_exprs) < 2:
            raise ValueError("probe_blocks=2 needs at least 2 blocks")
        if 2 * probe_bits > 62:
            raise ValueError("concatenated probe key must fit 64 bits")
        longs = [e.cast("long") for e in block_exprs]
        probe_exprs = [
            F.shiftleft(longs[i], probe_bits).bitwiseOR(longs[j])
            for i in range(len(longs))
            for j in range(i + 1, len(longs))
        ]
    else:
        probe_exprs = block_exprs
    probes = df.select(
        F.col(id_col).alias("_pid"),
        F.posexplode(F.array(*probe_exprs)).alias("_probe_idx", "_probe_val"),
    )
    return (
        probes.alias("a")
        .join(
            probes.alias("b"),
            (F.col("a._probe_idx") == F.col("b._probe_idx"))
            & (F.col("a._probe_val") == F.col("b._probe_val"))
            & (F.col("a._pid") < F.col("b._pid")),
        )
        .select(
            F.col("a._pid").alias("id_a"), F.col("b._pid").alias("id_b")
        )
    )


def banded_hamming_pairs(
    df: DataFrame,
    id_col: str,
    band_cols: list[str],
    band_bits: int,
    max_hamming: int,
    probe_bits: int = 16,
    allow_narrow_probes: bool = False,
    probe_blocks: int = 1,
) -> DataFrame:
    """Exact Hamming-radius pair search over packed bit fingerprints
    WITHOUT the all-pairs cross join (round 12 — the matcher behind
    perceptual image/audio near-dup): each fingerprint arrives as
    ``band_cols`` integer columns of ``band_bits`` bits each (the
    layout :func:`~..multimodal.dhash_bands` / ``audio_fingerprint``
    emit); candidates come from an EQUI-JOIN on ``probe_bits``-wide
    sub-bands (same no-all-pairs shape as MinHash LSH bands), then the
    exact Hamming distance — Σ bit_count(a XOR b) over the band
    columns, all JVM-side integer ops — filters to ``<= max_hamming``.

    Recall is EXACT, not probabilistic: with P = total_bits/probe_bits
    probe bands, any pair within Hamming distance P−1 differs in at
    most P−1 bands, so by pigeonhole at least one probe band matches
    exactly and the pair IS a candidate.  The constructor therefore
    requires P > max_hamming — under that contract the banding is
    invisible in the output (a brute-force all-pairs oracle computes
    the identical result), it only changes the plan.

    Returns (id_a, id_b, hamming) with id_a < id_b.

    Scale: the probe explode is a bounded ×P row widening; the
    candidate join shuffles on (probe_idx, probe_val); the verify join
    is candidate-sized.  Nothing is all-pairs, collected, or broadcast
    — BUT candidate selectivity is governed entirely by the probe-key
    cardinality, 2^probe_bits values per probe index.  A probe
    narrower than ~8 bits partitions an N-item corpus into at most 256
    buckets per probe, so expected candidates grow as P · N²/2^probe_bits
    — an all-pairs join in disguise at corpus scale even though the
    plan shows a clean equi-join (VERDICT r12).  Corpus-scale paths
    therefore use probe_bits >= 16 (65,536 values per probe — at 10⁹
    items each bucket holds ~15k rows, candidates ~10⁹·P·15k/2, a
    linear-ish 10⁴× reduction vs 4-bit probes) and get the pigeonhole
    radius they need from LONGER fingerprints, not narrower probes
    (256-bit dHash ⇒ 16 probes ⇒ radius 15; 128-bit audio ⇒ 8 probes
    ⇒ radius 7).  probe_bits < 8 is rejected unless
    ``allow_narrow_probes=True`` — the explicit opt-in for bounded
    fixtures and tests where N is known-small.

    At the 10⁹-item regime even 16-bit probes leave candidates ~
    P·N²/2^16 (~10¹⁴ rows).  The escape is ``probe_blocks=2`` (r14 —
    Manku, Jain & Das Sarma, WWW 2007): probe on ordered PAIRS of
    blocks concatenated into 2·probe_bits-wide keys (32 bits here), so
    the random-collision floor drops to C(P,2)·N²/2^32 — a further
    ~2^16/P-fold reduction (≈4,000× at P=16) — while recall stays
    pigeonhole-EXACT at the reduced radius P−2 (≥ 2 clean blocks ⇒
    their pair key collides).  Measured by tools/scale_percep.py at
    4,000 items: see SCALE.md's r14 paragraph.
    """
    if not band_cols:
        raise ValueError("need at least one band column")
    if band_bits < 1 or probe_bits < 1 or band_bits % probe_bits != 0:
        raise ValueError("probe_bits must divide band_bits")
    if probe_bits < 8 and not allow_narrow_probes:
        raise ValueError(
            f"probe_bits={probe_bits} gives only {1 << probe_bits} distinct "
            "probe values — the candidate equi-join degenerates to "
            "all-pairs at corpus scale; use a longer fingerprint with "
            "probe_bits >= 8 (16 recommended), or pass "
            "allow_narrow_probes=True for a known-small corpus"
        )
    if probe_blocks not in (1, 2):
        raise ValueError("probe_blocks must be 1 or 2")
    n_probes = len(band_cols) * (band_bits // probe_bits)
    if n_probes - probe_blocks < max_hamming:
        raise ValueError(
            f"{n_probes} probe blocks taken {probe_blocks} at a time cannot "
            f"guarantee recall at Hamming radius {max_hamming}; need "
            "total_bits/probe_bits - probe_blocks >= max_hamming"
        )
    cand = hamming_candidates(
        df, id_col, band_cols, band_bits, probe_bits, probe_blocks
    ).distinct()
    fp_a = df.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"_a_{c}") for c in band_cols],
    )
    fp_b = df.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"_b_{c}") for c in band_cols],
    )
    hamming = None
    for c in band_cols:
        term = F.bit_count(
            F.col(f"_a_{c}").bitwiseXOR(F.col(f"_b_{c}"))
        )
        hamming = term if hamming is None else hamming + term
    return (
        cand.join(fp_a, "id_a")
        .join(fp_b, "id_b")
        .withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= F.lit(max_hamming))
        .select("id_a", "id_b", "hamming")
    )
