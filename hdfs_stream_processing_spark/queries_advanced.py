"""Similarity-join / graph-metric / text-scoring / golden-record queries
(rounds 6-8): prefix-filtered joins, OLS, BFS, kNN-graph metrics,
statistics battery, table checksums, survivorship golden records.

Split out of ``queries.py`` (round 8, VERDICT r7 #7 — no file > ~3k
LoC); registration order and the ``QUERIES``/``ORACLES`` registries are
unchanged: this module registers via the shared ``@query`` decorator
when ``queries.py`` imports it at its original position.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F

from hdfs_stream_processing_spark.queries import (  # noqa: F401
    TS_FMT_DUCK,
    TS_FMT_SPARK,
    _conf_override,
    ORACLES,
    _BM25_TERMS,
    _PAIRS_SQL,
    _QUANT_SQL,
    _STAGE_CACHE,
    _mkdtemp,
    _stage_events,
    cents_avg,
    cents_sum,
    prep,
    query,
    sql_cents_avg,
    sql_cents_sum,
    sql_fold,
)
from hdfs_stream_processing_spark.queries_llmdata import _stage_documents  # noqa: F401

# Round 6 (cont.): prefix-filtered similarity join, exact per-group OLS,
# multi-hop BFS reachability
# ========================================================================


@query(
    "jaccard_join",
    """WITH tok AS (SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS shingle
            FROM documents WHERE doc_id % 5 = 0)),
       sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                        CAST(COUNT(*) AS BIGINT) AS n_inter
                 FROM tok a JOIN tok b USING (shingle)
                 WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
       SELECT id_a, id_b,
              CAST(n_inter AS DOUBLE)
                / CAST(sza.sz + szb.sz - n_inter AS DOUBLE) AS jaccard
       FROM inter
       JOIN sz sza ON sza.doc_id = id_a
       JOIN sz szb ON szb.doc_id = id_b
       WHERE 9 * n_inter >= 8 * (sza.sz + szb.sz - n_inter)""",
)
def q_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact similarity join (N3 scale path): all doc
    pairs with unigram Jaccard ≥ 8/9, candidates generated from
    rarest-first PREFIX shingles only (PPJoin/AllPairs) instead of the
    full shared-shingle join — the frequent shingles that would form
    quadratic join buckets never become join keys.  The oracle is the
    brute-force all-pairs Jaccard, so the filter's no-false-negative
    guarantee is verified against ground truth, not assumed.  Scoped
    to a 20% doc sample: the synthetic corpus is clone-heavy, so the
    full-corpus RESULT is quadratic in dup-group size (~1M pairs at
    sf0.1) — a data property, not an algorithm one; the sample keeps
    the benchmark timing the join, not the output write."""
    from hdfs_stream_processing_spark.operators.dedup import jaccard_join_prefix

    (documents,) = prep(spark, sf_dir, "documents")
    return jaccard_join_prefix(
        documents.where(F.col("doc_id") % 5 == 0),
        "doc_id", "text", t_num=8, t_den=9, shingle_n=1
    )


@query(
    "regr_by_group",
    """WITH s AS (
         SELECT l_returnflag,
                count(*) AS n,
                CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx,
                CAST(sum(y * y) AS BIGINT) AS syy
         FROM (SELECT l_returnflag,
                      CAST(round(l_quantity, 0) AS BIGINT) AS x,
                      CAST(round(l_extendedprice, 0) AS BIGINT) AS y
               FROM lineitem)
         GROUP BY l_returnflag),
       m AS (
         SELECT l_returnflag, n, sx, sy, syy,
                CASE WHEN CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) > 0.0
                     THEN CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                          / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                END AS slope,
                CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS s_num,
                CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS s_den
         FROM s)
       SELECT l_returnflag, n, slope,
              (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                / CAST(n AS DOUBLE) AS intercept,
              CASE WHEN s_den > 0.0
                        AND CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) > 0.0
                   THEN (s_num * s_num)
                        / (s_den * CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))
              END AS r2
       FROM m""",
)
def q_regr_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS (slope/intercept/R² of price on quantity per
    return flag) from exact integer sufficient statistics — the
    portable replacement for regr_slope/regr_intercept, whose float
    partial-state merges are partition-order-dependent.  One partial-
    aggregated shuffle carrying six numbers per group."""
    from hdfs_stream_processing_spark.operators.aggregates import ols_exact

    (lineitem,) = prep(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity"), 0).cast("long")
    y = F.round(F.col("l_extendedprice"), 0).cast("long")
    return ols_exact(lineitem, ["l_returnflag"], x, y)


@query(
    "bfs_reach",
    """WITH RECURSIVE pairs AS (
         SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS s,
                         's' || CAST(l_suppkey AS VARCHAR) AS d
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       edges AS (SELECT s, d FROM pairs UNION ALL SELECT d, s FROM pairs),
       reach(node, hops) AS (
         SELECT 's' || CAST(s_suppkey AS VARCHAR), 0
         FROM supplier WHERE s_nationkey = 1
         UNION
         SELECT e.d, r.hops + 1
         FROM reach r JOIN edges e ON e.s = r.node
         WHERE r.hops < 3)
       SELECT node, MIN(hops) AS hops FROM reach GROUP BY node""",
)
def q_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop blast radius: minimum hop distance from nation 1's
    suppliers through the customer↔supplier trade graph (frontier BFS
    — supply-chain contagion / fraud-ring neighborhood).  Each round
    expands only the new frontier through one equi-join and anti-joins
    the visited set; exact integer hops, oracle = recursive CTE with
    UNION dedup + final MIN."""
    from hdfs_stream_processing_spark.operators.graph import bfs_hops

    lineitem, orders, supplier = prep(spark, sf_dir, "lineitem", "orders", "supplier")
    pairs = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("s"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("d"),
        )
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    seeds = supplier.where(F.col("s_nationkey") == 1).select(
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node")
    )
    return bfs_hops(edges, seeds, "s", "d", max_hops=3)


@query(
    "vocab_ids",
    """WITH tok AS (SELECT doc_id,
                unnest(string_split(lower(text), ' ')) AS token,
                unnest(generate_series(0, length(string_split(lower(text), ' ')) - 1)) AS pos
             FROM documents),
       vocab AS (SELECT token,
                row_number() OVER (ORDER BY count(*) DESC, token ASC) - 1 AS token_id
             FROM tok GROUP BY token)
       SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
              CAST(v.token_id AS BIGINT) AS token_id
       FROM tok t LEFT JOIN vocab v USING (token)""",
)
def q_vocab_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text → token-id sequences (the LLM-preprocessing id-mapping
    step): the corpus vocabulary is built with frequency-ordered
    contiguous ids (count DESC, token ASC — a total order, so the SAME
    id assignment in both engines), then every document maps to
    (doc_id, pos, token_id) rows, order- and duplicate-preserving.
    Corpus side never shuffles: posexplode → broadcast vocab lookup."""
    from hdfs_stream_processing_spark.operators.text import (
        build_vocab,
        tokens_to_ids,
    )

    (documents,) = prep(spark, sf_dir, "documents")
    vocab = build_vocab(documents, "text")
    return tokens_to_ids(documents, "doc_id", "text", vocab)


@query(
    "attribution",
    """WITH e AS (SELECT user_id, ts, event_id, event_type,
                COALESCE(CAST(round(value * 100.0, 0) AS BIGINT), 0) AS cents
             FROM events),
       lab AS (SELECT *,
                first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
                last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
             FROM e),
       conv AS (SELECT COALESCE(ft, 'direct') AS ft, COALESCE(lt, 'direct') AS lt, cents
             FROM lab WHERE event_type = 'purchase'),
       unp AS (SELECT 'first_touch' AS model, ft AS channel, cents FROM conv
               UNION ALL
               SELECT 'last_touch' AS model, lt AS channel, cents FROM conv)
       SELECT model, channel,
              CAST(SUM(cents) AS BIGINT) AS revenue_cents,
              COUNT(*) AS n_conversions
       FROM unp GROUP BY model, channel""",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch revenue attribution over the event log:
    each purchase's exact cents go to the user's first (resp. last)
    non-purchase event type before it, 'direct' when none.  Both models
    from ONE user-keyed window pass + one tiny aggregate — never a
    self-join of the log."""
    from hdfs_stream_processing_spark.operators.analytics import attribution

    (events,) = prep(spark, sf_dir, "events")
    cents = F.coalesce(
        F.round(F.col("value") * 100.0, 0).cast("long"), F.lit(0)
    )
    return attribution(
        events, "user_id", "ts", "event_type", cents,
        conversion="purchase", tiebreak_cols=["event_id"],
    )


@query(
    "stream_vocab",
    """WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS token
                     FROM documents),
       counts AS (SELECT token, count(*) AS freq FROM toks GROUP BY token)
       SELECT CAST(row_number() OVER (ORDER BY freq DESC, token ASC) - 1
                   AS BIGINT) AS token_id,
              token, CAST(freq AS BIGINT) AS freq""" + """
       FROM counts""",
)
def q_stream_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming vocabulary maintenance: per-token counts are additive,
    so the SAME run_stream_rollup machinery that maintains count tables
    and sketches maintains the corpus vocabulary as documents stream in
    — each micro-batch contributes its batch-local token counts, merged
    by addition behind the replay guard.  Ranking the maintained table
    (freq DESC, token ASC) must yield EXACTLY the batch-built vocab of
    the whole corpus: the tokenizer's id table stays current without
    ever re-scanning history.

    Scale: per batch the token shuffle is batch-sized; stored state is
    the vocabulary itself.  The ranking read is vocab-sized — done on
    demand, not per batch."""
    from pyspark.sql import Window

    from hdfs_stream_processing_spark.sources.io import read_table_version
    from hdfs_stream_processing_spark.streaming import stream_parquet_source
    from hdfs_stream_processing_spark.streaming.pipeline import run_stream_rollup

    src_dir, schema = _stage_documents(spark, sf_dir)
    stream = stream_parquet_source(spark, src_dir, schema, max_files_per_trigger=2)

    def partial(df: DataFrame) -> DataFrame:
        return (
            df.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("freq"))
        )

    tdir = _mkdtemp("hsp_svocab_")
    ckpt = _mkdtemp("hsp_svocab_ckpt_")
    run_stream_rollup(stream, tdir, ckpt, ["token"], ["freq"], partial)
    counts = read_table_version(spark, tdir).drop("_batch")
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return counts.select(
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("token_id"),
        "token",
        F.col("freq").cast("long").alias("freq"),
    )


@query(
    "purge_keys",
    """WITH req AS (SELECT c_custkey AS k FROM customer
                    WHERE c_custkey % 97 = 0),
       po AS (SELECT o_orderkey FROM orders
              WHERE o_custkey IN (SELECT k FROM req))
       SELECT 'customer' AS table_name,
              (SELECT count(*) FROM customer
                WHERE c_custkey IN (SELECT k FROM req)) AS purged_rows,
              (SELECT count(*) FROM customer
                WHERE c_custkey NOT IN (SELECT k FROM req)) AS retained_rows
       UNION ALL
       SELECT 'orders',
              (SELECT count(*) FROM orders
                WHERE o_custkey IN (SELECT k FROM req)),
              (SELECT count(*) FROM orders
                WHERE o_custkey NOT IN (SELECT k FROM req))
       UNION ALL
       SELECT 'lineitem',
              (SELECT count(*) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM po)),
              (SELECT count(*) FROM lineitem
                WHERE l_orderkey NOT IN (SELECT o_orderkey FROM po))""",
)
def q_purge_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten delete propagation: a deletion-request list
    (every 97th customer) cascades customer → orders → lineitem, and the
    audit reports purged/retained row counts per table — the compliance
    evidence a lake must produce for each erasure batch.  Every
    membership probe is a broadcast left join marking fact rows in one
    map-side pass; the fan-out key sets scale with the request list,
    never the fact tables."""
    from hdfs_stream_processing_spark.operators.incremental import purge_cascade

    customer, orders, lineitem = prep(spark, sf_dir, "customer", "orders", "lineitem")
    requests = customer.where(F.col("c_custkey") % 97 == 0).select("c_custkey")
    audit, _ = purge_cascade(
        requests,
        [
            ("customer", customer, "c_custkey", "c_custkey"),
            ("orders", orders, "o_custkey", "o_orderkey"),
            ("lineitem", lineitem, "l_orderkey", None),
        ],
    )
    return audit


@query(
    "purge_exec",
    """WITH req AS (SELECT c_custkey AS k FROM customer
                    WHERE c_custkey % 97 = 0),
       po AS (SELECT o_orderkey FROM orders
              WHERE o_custkey IN (SELECT k FROM req))
       SELECT 'customer' AS table_name,
              CAST(0 AS BIGINT) AS purged_rows,
              (SELECT count(*) FROM customer
                WHERE c_custkey NOT IN (SELECT k FROM req)) AS retained_rows
       UNION ALL
       SELECT 'orders', CAST(0 AS BIGINT),
              (SELECT count(*) FROM orders
                WHERE o_custkey NOT IN (SELECT k FROM req))
       UNION ALL
       SELECT 'lineitem', CAST(0 AS BIGINT),
              (SELECT count(*) FROM lineitem
                WHERE l_orderkey NOT IN (SELECT o_orderkey FROM po))""",
)
def q_purge_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purge cascade EXECUTED (r7): copies of customer/orders/lineitem
    are staged as live parquet directories, the same request list as
    `purge_keys` cascades through :func:`run_purge` — retained tables
    written to staging, published via atomic rename, audit re-run
    against the published result.  The returned POST-swap audit must
    show zero purged rows with the retained counts the oracle derives
    from the base tables: proof the deletion landed on disk and a
    replay would be a no-op.  Closes the gap the reference leaves open
    (its sink is append-only; spark_streaming/convert-to-minio.py:125
    can only ever add rows)."""
    import os
    import shutil

    from hdfs_stream_processing_spark.operators.incremental import run_purge

    customer, orders, lineitem = prep(spark, sf_dir, "customer", "orders", "lineitem")
    # Pristine staged copies are written through Spark ONCE per source
    # dir (memoized — the same staging contract as _stage_documents);
    # each run then restores the live dirs with a driver-side file copy
    # (r14, guide §1.2 "don't compute things you throw away": the three
    # Spark re-writes of unchanged inputs were half this query's cost —
    # the purge itself still plans, rewrites, swaps, and re-audits the
    # live tables from scratch every run).
    # ADVICE r14: reuse is gated on the PUBLISHED directory name, which
    # only ever appears via rename after a fully-successful Spark write
    # (write lands under .tmp first) — a first write that crashes midway
    # leaves only the .tmp debris and the next run re-stages cleanly.
    # Retention note: the pristine copies hold purge-ABLE (pre-purge)
    # rows for the process lifetime by design — they are the immutable
    # test fixture the purge runs against, same retention surface as
    # /root/testdata itself, never published as a live table.
    pristine = _mkdtemp("hsp_purge_pristine_", sf_dir)
    names = ("customer", "orders", "lineitem")
    for name, df in zip(names, (customer, orders, lineitem)):
        d = os.path.join(pristine, name)
        if not os.path.isdir(d):
            tmp = d + ".tmp"
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)  # debris from a crashed prior write
            df.write.mode("overwrite").parquet(tmp)
            os.rename(tmp, d)
    base = _mkdtemp("hsp_purge_live_")  # fresh dirs per run: re-purgeable
    dirs = {}
    for name in names:
        d = os.path.join(base, name)
        shutil.copytree(os.path.join(pristine, name), d)
        dirs[name] = d
    requests = customer.where(F.col("c_custkey") % 97 == 0).select("c_custkey")
    return run_purge(
        spark,
        requests,
        [
            ("customer", dirs["customer"], "c_custkey", "c_custkey"),
            ("orders", dirs["orders"], "o_custkey", "o_orderkey"),
            ("lineitem", dirs["lineitem"], "l_orderkey", None),
        ],
    )


# ---------------------------------------------------------------------------
# Round 7 additions: bucketed co-location, subject export (SAR), text/binary
# file sources, windowed EWMA, TF-IDF, containment join.
# ---------------------------------------------------------------------------


@query(
    "bucketed_join",
    """SELECT o_orderpriority,
              count(*) AS n_items,
              CAST(SUM(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT))
                   AS DOUBLE) / 100.0 AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority""",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (the 100 TB shuffle-elimination play):
    lineitem and orders are written ONCE as external bucketed tables —
    identically hash-bucketed and sorted by the join key — and every
    subsequent join between them plans with ZERO exchanges (asserted in
    tests/test_layout_bucketed.py with broadcast disabled: SortMergeJoin,
    no Exchange on either side).  The shuffle is paid at write time and
    amortized over every downstream join/agg on the key — vs the
    reference re-shuffling its alignment join on every run
    (utils/spark_transforming.py:96-141).  The oracle proves the
    bucketed round-trip + join is value-lossless."""
    from hdfs_stream_processing_spark.sources.io import write_bucketed

    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    tag = "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/").split("/")[-1])
    tl, to = f"hsp_bkt_lineitem_{tag}", f"hsp_bkt_orders_{tag}"
    # external tables under the repo scratch dir (the session warehouse
    # follows the host process CWD — not ours to write to); catalog
    # registration is session-scoped, so re-register per session but
    # reuse the memoized directory
    if not spark.catalog.tableExists(tl):
        write_bucketed(
            lineitem.select("l_orderkey", "l_extendedprice"),
            tl, ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"],
            path=_mkdtemp("hsp_bkt_l_", (sf_dir, "lineitem")),
        )
    if not spark.catalog.tableExists(to):
        write_bucketed(
            orders.select("o_orderkey", "o_orderpriority"),
            to, ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"],
            path=_mkdtemp("hsp_bkt_o_", (sf_dir, "orders")),
        )
    li, od = spark.table(tl), spark.table(to)
    joined = li.join(od, li["l_orderkey"] == od["o_orderkey"])
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        (
            F.sum(F.round(F.col("l_extendedprice") * F.lit(100.0), 0).cast("long"))
            .cast("double") / F.lit(100.0)
        ).alias("revenue"),
    )


@query(
    "subject_export",
    """WITH req AS (SELECT c_custkey AS root FROM customer
                    WHERE c_custkey % 97 = 0),
       cust AS (SELECT root AS subject_key, 'customer' AS table_name,
                       CAST(c_custkey AS VARCHAR) AS record_key
                FROM req JOIN customer ON c_custkey = root),
       ords AS (SELECT root, o_orderkey
                FROM req JOIN orders ON o_custkey = root),
       ordx AS (SELECT root AS subject_key, 'orders' AS table_name,
                       CAST(o_orderkey AS VARCHAR) AS record_key
                FROM ords),
       linx AS (SELECT DISTINCT root AS subject_key, 'lineitem' AS table_name,
                       CAST(l_orderkey AS VARCHAR) || '#'
                         || CAST(l_linenumber AS VARCHAR) AS record_key
                FROM ords JOIN lineitem ON l_orderkey = o_orderkey)
       SELECT * FROM cust
       UNION ALL SELECT * FROM ordx
       UNION ALL SELECT * FROM linx""",
)
def q_subject_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subject-access-request export (r7): the SAME subject list the
    purge queries forget, but read-side — every customer / orders /
    lineitem record belonging to each subject, attributed to its
    subject (GDPR Art. 15 data portability; the compliance pair to
    `purge_keys`/`purge_exec` Art. 17).  Broadcast-probe per hop, zero
    fact-side shuffle — at 100 TB the export touches each fact table in
    one map-side pass."""
    from hdfs_stream_processing_spark.operators.incremental import subject_export

    customer, orders, lineitem = prep(spark, sf_dir, "customer", "orders", "lineitem")
    requests = customer.where(F.col("c_custkey") % 97 == 0).select("c_custkey")
    return subject_export(
        requests,
        [
            ("customer", customer, "c_custkey", "c_custkey", F.col("c_custkey")),
            ("orders", orders, "o_custkey", "o_orderkey", F.col("o_orderkey")),
            (
                "lineitem", lineitem, "l_orderkey", None,
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit("#"),
                    F.col("l_linenumber").cast("string"),
                ),
            ),
        ],
    )


@query(
    "scan_text",
    "SELECT doc_id, text FROM documents",
)
def q_scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text source (S-surface): the corpus staged as raw
    ``doc_id<TAB>text`` lines (the layout a crawler or log shipper
    lands), read back with the native text source in ONE directory
    scan and parsed with a bounded split.  The identity oracle proves
    the text round-trip is lossless.  At 100 TB this is the ingest
    path for line-delimited corpora — splittable files, no per-file
    driver work, schema applied at parse time."""
    (documents,) = prep(spark, sf_dir, "documents")
    txt_dir = _mkdtemp("hsp_text_src_", sf_dir)
    key = ("hsp_text_staged_", sf_dir)
    if key not in _STAGE_CACHE:
        (
            documents.select(
                F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("text"))
            )
            .repartition(4)
            .write.mode("overwrite")
            .text(txt_dir)
        )
        _STAGE_CACHE[key] = txt_dir
    lines = spark.read.text(txt_dir)
    parts = F.split(F.col("value"), "\t", 2)
    return lines.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("text"),
    )


@query(
    "scan_binary",
    """SELECT source,
              CAST(length(blob) AS BIGINT) AS n_bytes,
              md5(blob) AS digest
       FROM (SELECT source, string_agg(text, chr(10) ORDER BY doc_id) AS blob
             FROM documents GROUP BY source)""",
)
def q_scan_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary source (the multimodal ingest path): one
    opaque ``.bin`` per source — here the source's docs concatenated,
    standing in for an image/audio shard — read back with Spark's
    ``binaryFile`` source as (path, length, content-bytes) and reduced
    to per-file length + md5.  The oracle recomputes both from the
    base table, proving the binary round-trip is byte-lossless.  This
    is how 100 TB of media shards enter the engine: binary columns +
    typed metadata, decode deferred to mapInPandas
    (operators/multimodal.py).  Staging collects per-source strings on
    the driver — bounded by the source count (20), not the corpus."""
    import os as _os

    (documents,) = prep(spark, sf_dir, "documents")
    key = ("hsp_bin_staged_", sf_dir)
    if key in _STAGE_CACHE:
        bin_dir = _STAGE_CACHE[key]
    else:
        bin_dir = _mkdtemp("hsp_bin_src_", sf_dir)
        shards = (
            documents.groupBy("source")
            .agg(
                F.concat_ws(
                    "\n", F.array_sort(F.collect_list(F.struct("doc_id", "text")))
                    .getField("text")
                ).alias("blob")
            )
            .collect()
        )
        for row in shards:
            with open(_os.path.join(bin_dir, f"{row['source']}.bin"), "wb") as f:
                f.write(row["blob"].encode("utf-8"))
        _STAGE_CACHE[key] = bin_dir
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(bin_dir)
    )
    return files.select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.bin$", 1).alias("source"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("digest"),
    )


@query(
    "ewma_smooth",
    """WITH base AS (
         SELECT event_id, user_id, ts, value,
                CAST(round(value * 100.0, 0) AS BIGINT) AS c
         FROM events),
       t AS (
         SELECT event_id, user_id, ts, value,
                COALESCE(c * 128, 0) + COALESCE(lag(c, 1) OVER w * 64, 0)
                  + COALESCE(lag(c, 2) OVER w * 32, 0)
                  + COALESCE(lag(c, 3) OVER w * 16, 0)
                  + COALESCE(lag(c, 4) OVER w * 8, 0)
                  + COALESCE(lag(c, 5) OVER w * 4, 0)
                  + COALESCE(lag(c, 6) OVER w * 2, 0)
                  + COALESCE(lag(c, 7) OVER w * 1, 0) AS num,
                CASE WHEN c IS NOT NULL THEN 128 ELSE 0 END
                  + CASE WHEN lag(c, 1) OVER w IS NOT NULL THEN 64 ELSE 0 END
                  + CASE WHEN lag(c, 2) OVER w IS NOT NULL THEN 32 ELSE 0 END
                  + CASE WHEN lag(c, 3) OVER w IS NOT NULL THEN 16 ELSE 0 END
                  + CASE WHEN lag(c, 4) OVER w IS NOT NULL THEN 8 ELSE 0 END
                  + CASE WHEN lag(c, 5) OVER w IS NOT NULL THEN 4 ELSE 0 END
                  + CASE WHEN lag(c, 6) OVER w IS NOT NULL THEN 2 ELSE 0 END
                  + CASE WHEN lag(c, 7) OVER w IS NOT NULL THEN 1 ELSE 0 END AS den
         FROM base
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT event_id, user_id, ts, value,
              CASE WHEN den > 0
                   THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS ewma
       FROM t""",
)
def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing (r7): α=1/2 exponential moving average of each
    user's value series in exact integer cents — the truncated-horizon
    form whose numerator/denominator are integer sums of K=8 unrolled
    lag terms inside ONE window pass, so the single final division is
    bit-identical across engines (native float-recursive EWMA never
    is).  One shuffle; the anomaly-scoring / trend-feature staple."""
    from hdfs_stream_processing_spark.operators.analytics import ewma

    (events,) = prep(spark, sf_dir, "events")
    base = events.select(
        "event_id", "user_id", "ts", "value",
        F.round(F.col("value") * F.lit(100.0), 0).cast("long").alias("c"),
    )
    return ewma(base, "user_id", ["ts", "event_id"], "c", terms=8).drop("c")


@query(
    "tfidf_terms",
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
         FROM documents),
       tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
       tf AS (SELECT doc_id, token, count(*) AS tf
              FROM tok2 GROUP BY doc_id, token),
       dfreq AS (SELECT token, count(*) AS df
                 FROM (SELECT DISTINCT doc_id, token FROM tok2)
                 GROUP BY token),
       n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       scored AS (
         SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
                round(CAST(tf.tf AS DOUBLE)
                  * ln(CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)), 6) AS score
         FROM tf JOIN dfreq USING (token) CROSS JOIN n
         WHERE dfreq.df < n.n_docs),
       ranked AS (
         SELECT doc_id, token, tf, df, score,
                row_number() OVER (
                  PARTITION BY doc_id
                  ORDER BY score DESC, tf DESC, df ASC, token ASC) AS rank
         FROM scored)
       SELECT doc_id, token, tf, df, rank, score
       FROM ranked WHERE rank <= 3""",
)
def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction (r7, ranking fixed r8 per ADVICE):
    the top-3 characteristic terms per document, ranked by the rounded
    score itself (so rank and score agree), with zero-score ubiquitous
    terms (df = N) excluded before ranking.  Ties break on the exact
    integer keys (tf DESC, df ASC, token ASC); the 6-dp rounding keeps
    the sort key engine-portable."""
    from hdfs_stream_processing_spark.operators.text import tfidf_top_terms

    (documents,) = prep(spark, sf_dir, "documents")
    return tfidf_top_terms(documents, "doc_id", "text", k=3)


@query(
    "containment_join",
    """WITH ta AS (SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS shingle
            FROM documents WHERE doc_id > 250 AND doc_id % 5 = 0)),
       tb AS (SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS shingle
            FROM documents WHERE doc_id <= 250)),
       sza AS (SELECT doc_id, COUNT(*) AS sz FROM ta GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                        CAST(COUNT(*) AS BIGINT) AS n
                 FROM ta a JOIN tb b USING (shingle)
                 GROUP BY 1, 2)
       SELECT id_a, id_b,
              CAST(n AS DOUBLE) / CAST(sza.sz AS DOUBLE) AS containment
       FROM inter JOIN sza ON sza.doc_id = id_a
       WHERE 5 * n >= 4 * sza.sz""",
)
def q_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (quote/copy-detection) join (r7): every new-batch
    doc whose unigram set is ≥80% contained in some corpus doc — the
    asymmetric relation Jaccard misses (a snippet embedded in a long
    doc has tiny Jaccard but containment ~1).  Candidates from the
    probe side's rarest-first PREFIX shingles against the corpus's
    full posting index; exact rational threshold end-to-end.  The
    oracle is the brute-force all-pairs containment, so the prefix
    filter's no-false-negative guarantee is verified against ground
    truth."""
    from hdfs_stream_processing_spark.operators.dedup import containment_join_prefix

    (documents,) = prep(spark, sf_dir, "documents")
    docs = documents.select("doc_id", "text")
    return containment_join_prefix(
        docs.where((F.col("doc_id") > 250) & (F.col("doc_id") % 5 == 0)),
        docs.where(F.col("doc_id") <= 250),
        "doc_id", "text", t_num=4, t_den=5, shingle_n=1,
    )


#: Shared oracle CTE: the top-5 strongest-partner (kNN) supplier graph.
#: A raw "share a part" projection of a fact table GOES DENSE as data
#: grows (at sf0.1 every supplier pair already shares a part — the
#: co-supply graph is COMPLETE, and wedge enumeration on a complete
#: graph is O(n³): measured OOM at sf1).  Production similarity graphs
#: cap density by construction: keep each node's k strongest partners
#: (shared-part count, ties by id), so max degree ≤ 2k at EVERY scale
#: and wedge volume stays linear in nodes.  Selection runs on exact
#: integer keys — engine-portable.
_KNN_EDGE_SQL = """sp AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                          FROM lineitem),
       pair AS (SELECT a.s AS u, b.s AS v, count(*) AS w
                FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
                GROUP BY 1, 2),
       sym AS (SELECT u, v, w FROM pair UNION ALL SELECT v, u, w FROM pair),
       knn AS (SELECT u, v FROM (
                 SELECT u, v,
                        row_number() OVER (PARTITION BY u
                                           ORDER BY w DESC, v ASC) AS rn
                 FROM sym) WHERE rn <= 5),
       e AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v FROM knn)"""


def _cosupply_knn_edges(lineitem: DataFrame, k: int = 5) -> DataFrame:
    """Top-``k`` strongest co-supply partner edges per supplier (the
    Spark side of ``_KNN_EDGE_SQL``): pair weights from per-part
    supplier SETS, per-node top-k on exact keys (weight DESC, partner
    ASC), then canonical dedup.  Degree ≤ 2k by construction — the
    density cap that keeps wedge enumeration linear regardless of how
    dense the underlying co-occurrence gets.

    r15 shape (VERDICT r14 #5, guide §2.4): one groupBy(part)
    ``collect_set`` + an in-partition i<j double explode replaces the
    old distinct → self-join-on-part → pair-agg chain — the sorted set
    IS the dedup and the pair generator, so the (p,s)-distinct
    exchange and the two sort-merge join sorts disappear (5 exchanges
    → 3 on the edge derivation; the pair blowup is identical — both
    formulations are quadratic in suppliers-per-part, bounded by the
    co-supply fan-out, 4 in TPC-H-shaped data)."""
    from pyspark.sql import Window

    # repartition BEFORE the set-aggregate: the projected lineitem scan
    # is 1-2 parquet splits, so a map-side ObjectHashAggregate there
    # would run at scan parallelism (measured: a 2-task 2.7 s stage on
    # 32 cores); keying the exchange on ``p`` spreads the aggregate
    # cluster-wide and the groupBy reuses the partitioning — still ONE
    # shuffle of the narrow (p, s) projection (guide §2.4).
    per_part = (
        lineitem.select(
            F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
        )
        .repartition(F.col("p"))
        .groupBy("p")
        .agg(F.sort_array(F.collect_set("s")).alias("_ss"))
    )
    pair = (
        per_part.select(F.posexplode("_ss").alias("_i", "u"), "_ss")
        .select(
            "u",
            F.explode(F.expr("slice(_ss, _i + 2, size(_ss))")).alias("v"),
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    sym = pair.unionByName(
        pair.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    wk = Window.partitionBy("u").orderBy(F.col("w").desc(), F.col("v").asc())
    knn = sym.withColumn("rn", F.row_number().over(wk)).where(F.col("rn") <= k)
    return knn.select(
        F.least("u", "v").alias("id_a"), F.greatest("u", "v").alias("id_b")
    ).distinct()


@query(
    "triangle_count",
    f"""WITH {_KNN_EDGE_SQL},
       wedge AS (SELECT e1.u, e1.v, e2.v AS w
                 FROM e e1 JOIN e e2 ON e1.v = e2.u),
       tri AS (SELECT wedge.u FROM wedge
               WHERE EXISTS (SELECT 1 FROM e
                             WHERE e.u = wedge.u AND e.v = wedge.w)),
       nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e)
       SELECT (SELECT count(*) FROM nodes) AS n_nodes,
              (SELECT count(*) FROM e) AS n_edges,
              (SELECT count(*) FROM tri) AS n_triangles""",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (r7) over the top-5 strongest-partner supplier
    graph (see ``_cosupply_knn_edges`` — the kNN density cap that keeps
    this linear where the raw co-supply projection goes complete).
    Oriented u<v<w wedge-close scheme — each triangle counted once,
    two equi-joins, no rotation enumeration; the oracle replays the
    same selection and orientation in SQL."""
    from hdfs_stream_processing_spark.operators.graph import triangle_count

    (lineitem,) = prep(spark, sf_dir, "lineitem")
    return triangle_count(_cosupply_knn_edges(lineitem, k=5))


@query(
    "wow_change",
    """WITH wk AS (
         SELECT o_orderpriority AS priority,
                CAST(date_trunc('week', o_orderdate) AS TIMESTAMP)
                  AS week_start,
                SUM(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS cents
         FROM orders GROUP BY 1, 2),
       lagged AS (
         SELECT priority, week_start, cents,
                lag(cents) OVER (PARTITION BY priority ORDER BY week_start)
                  AS prev_cents
         FROM wk)
       SELECT priority, week_start,
              CAST(cents AS DOUBLE) / 100.0 AS revenue,
              CAST(prev_cents AS DOUBLE) / 100.0 AS prev_revenue,
              CASE WHEN prev_cents > 0
                   THEN CAST(cents - prev_cents AS DOUBLE)
                        / CAST(prev_cents AS DOUBLE) END AS wow_change
       FROM lagged""",
)
def q_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue change per order priority (the BI
    period-over-period staple): calendar-aligned weekly rollup in
    exact cents, lag to the previous OBSERVED week, one final division
    of exact integers.  Two shuffles (weekly agg + per-priority
    window); at 100 TB the rollup partial-aggregates map-side and the
    window frame is one row per (priority, week)."""
    (orders,) = prep(spark, sf_dir, "orders")
    from pyspark.sql import Window

    wk = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("week", F.col("o_orderdate")).alias("week_start"),
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * F.lit(100.0), 0).cast("long")
        ).alias("cents")
    )
    w = Window.partitionBy("priority").orderBy("week_start")
    lagged = wk.withColumn("prev_cents", F.lag("cents").over(w))
    return lagged.select(
        "priority",
        "week_start",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("revenue"),
        (F.col("prev_cents").cast("double") / F.lit(100.0)).alias("prev_revenue"),
        F.when(
            F.col("prev_cents") > 0,
            (F.col("cents") - F.col("prev_cents")).cast("double")
            / F.col("prev_cents").cast("double"),
        ).alias("wow_change"),
    )


@query(
    "chisq_assoc",
    """WITH cells AS (
         SELECT event_type, value IS NOT NULL AS has_value,
                count(*) AS obs
         FROM events GROUP BY 1, 2),
       rows_ AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS row_tot
                 FROM cells GROUP BY 1),
       cols_ AS (SELECT has_value, CAST(SUM(obs) AS BIGINT) AS col_tot
                 FROM cells GROUP BY 1),
       n AS (SELECT SUM(obs) AS n FROM cells),
       j AS (SELECT c.event_type, c.has_value, c.obs, r.row_tot, co.col_tot, n.n,
                    CAST(n.n AS HUGEINT) * c.obs
                      - CAST(r.row_tot AS HUGEINT) * co.col_tot AS d
             FROM cells c
             JOIN rows_ r USING (event_type)
             JOIN cols_ co USING (has_value)
             CROSS JOIN n)
       SELECT event_type, has_value, obs, row_tot, col_tot,
              CAST(CAST(row_tot AS HUGEINT) * col_tot AS DOUBLE)
                / CAST(n AS DOUBLE) AS expected,
              CAST(d * d AS DOUBLE)
                / CAST(CAST(n AS HUGEINT) * row_tot * col_tot AS DOUBLE)
                AS contrib
       FROM j""",
)
def q_chisq_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event_type and
    value-presence (the categorical-association staple of data
    profiling): per-cell observed vs expected counts and the cell's
    χ² contribution, every operand an exact 128-bit integer until ONE
    final double division per cell — no float accumulation, no
    cross-engine summation-order hazard (the scalar χ² is the sum of
    ``contrib``, left to the reader precisely because a float sum's
    bits depend on order).  Two tiny aggregates + broadcast joins."""
    (events,) = prep(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    cells = events.groupBy(
        "event_type", F.col("value").isNotNull().alias("has_value")
    ).agg(F.count(F.lit(1)).alias("obs"))
    rows_ = cells.groupBy("event_type").agg(F.sum("obs").alias("row_tot"))
    cols_ = cells.groupBy("has_value").agg(F.sum("obs").alias("col_tot"))
    n = cells.agg(F.sum("obs").alias("n"))
    j = (
        cells.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "has_value")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "d",
            F.col("n").cast(dec) * F.col("obs")
            - F.col("row_tot").cast(dec) * F.col("col_tot"),
        )
    )
    return j.select(
        "event_type", "has_value", "obs", "row_tot", "col_tot",
        (
            (F.col("row_tot").cast(dec) * F.col("col_tot")).cast("double")
            / F.col("n").cast("double")
        ).alias("expected"),
        (
            (F.col("d") * F.col("d")).cast("double")
            / (
                F.col("n").cast(dec) * F.col("row_tot") * F.col("col_tot")
            ).cast("double")
        ).alias("contrib"),
    )


@query(
    "table_checksum",
    """WITH c AS (
         SELECT count(*) AS n_rows,
                CAST(SUM(('0x' || substr(md5(
                       CAST(c_custkey AS VARCHAR) || '|' || c_name || '|'
                       || c_mktsegment || '|'
                       || CAST(CAST(round(c_acctbal * 100.0, 0) AS BIGINT) AS VARCHAR)
                     ), 1, 15))::UBIGINT::BIGINT) AS VARCHAR) AS checksum
         FROM customer),
       o AS (
         SELECT count(*) AS n_rows,
                CAST(SUM(('0x' || substr(md5(
                       CAST(o_orderkey AS VARCHAR) || '|'
                       || CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus
                       || '|' || o_orderpriority || '|'
                       || CAST(CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS VARCHAR)
                     ), 1, 15))::UBIGINT::BIGINT) AS VARCHAR) AS checksum
         FROM orders)
       SELECT 'customer' AS table_name, n_rows, checksum FROM c
       UNION ALL
       SELECT 'orders', n_rows, checksum FROM o""",
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksums (r7): the replication/CDC
    drift detector — md5 each row's engine-exact rendering, take 60
    bits, SUM in 128-bit decimal.  Commutative addition makes the
    result independent of row order, partitioning, and file layout (a
    hash-of-sorted-rows would need a 100 TB global sort; this is one
    map pass + a scalar agg).  The oracle computes the identical sum in
    DuckDB: agreement certifies both engines see byte-identical
    content."""
    from hdfs_stream_processing_spark.operators.quality import table_checksum

    customer, orders = prep(spark, sf_dir, "customer", "orders")
    cents = lambda c: F.round(F.col(c) * F.lit(100.0), 0).cast("long")  # noqa: E731
    cs_c = table_checksum(
        customer, "customer",
        [F.col("c_custkey"), F.col("c_name"), F.col("c_mktsegment"),
         cents("c_acctbal")],
    )
    cs_o = table_checksum(
        orders, "orders",
        [F.col("o_orderkey"), F.col("o_custkey"), F.col("o_orderstatus"),
         F.col("o_orderpriority"), cents("o_totalprice")],
    )
    return cs_c.unionByName(cs_o)


@query(
    "cluster_coeff",
    f"""WITH {_KNN_EDGE_SQL},
       deg AS (SELECT node, count(*) AS degree FROM (
                 SELECT u AS node FROM e UNION ALL SELECT v FROM e)
               GROUP BY node),
       closed AS (SELECT e1.u, e1.v, e2.w
                  FROM e e1
                  JOIN (SELECT u AS v, v AS w FROM e) e2 USING (v)
                  WHERE EXISTS (SELECT 1 FROM e
                                WHERE e.u = e1.u AND e.v = e2.w)),
       tri AS (SELECT node, count(*) AS n_tri FROM (
                 SELECT u AS node FROM closed
                 UNION ALL SELECT v FROM closed
                 UNION ALL SELECT w FROM closed)
               GROUP BY node)
       SELECT deg.node, deg.degree,
              COALESCE(tri.n_tri, 0) AS n_tri,
              CASE WHEN deg.degree >= 2
                   THEN CAST(2 * COALESCE(tri.n_tri, 0) AS DOUBLE)
                        / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
              END AS coeff
       FROM deg LEFT JOIN tri USING (node)""",
)
def q_cluster_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node clustering coefficient (r7): ego-density of every
    supplier in the top-5 strongest-partner graph (the kNN density cap
    — see ``_cosupply_knn_edges``) — 2T/(d(d−1)) from the same oriented
    wedge-close join as triangle_count, with each closed triangle
    crediting its three vertices.  Exact integer counts into one double
    division; degree<2 nodes are null (undefined), not zero."""
    from hdfs_stream_processing_spark.operators.graph import clustering_coefficient

    (lineitem,) = prep(spark, sf_dir, "lineitem")
    return clustering_coefficient(_cosupply_knn_edges(lineitem, k=5))


@query(
    "mad_outliers",
    """WITH c AS (SELECT event_type,
                         CAST(round(value * 100.0, 0) AS BIGINT) AS cents
                  FROM events WHERE value IS NOT NULL),
       med AS (SELECT event_type, quantile_cont(cents, 0.5) AS med
               FROM c GROUP BY event_type),
       dev AS (SELECT c.event_type, c.cents, med.med,
                      abs(CAST(c.cents AS DOUBLE) - med.med) AS adev
               FROM c JOIN med USING (event_type)),
       mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
               FROM dev GROUP BY event_type)
       SELECT dev.event_type,
              count(*) AS n,
              any_value(dev.med) AS med,
              any_value(mad.mad) AS mad,
              CAST(SUM(CASE WHEN dev.adev > 5 * mad.mad THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_outliers
       FROM dev JOIN mad USING (event_type)
       GROUP BY dev.event_type""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation robust outlier screen (r7): per event
    type, the median of |x − median| and the count of points beyond
    5×MAD — the outlier detector a long-tailed 100 TB metric needs
    where mean/std (anomaly_zscore) are themselves dragged by the tail.
    Exact integer cents into the interpolated exact percentile (whose
    cross-engine bit-parity the `percentiles` query already proves);
    every derived double is the same expression text in both engines.
    Two percentile shuffles + one broadcast-joined count pass."""
    (events,) = prep(spark, sf_dir, "events")
    c = events.where(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * F.lit(100.0), 0).cast("long").alias("cents"),
    )
    med = c.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med")
    )
    dev = c.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents").cast("double") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.any_value(F.col("med")).alias("med"),
            F.any_value(F.col("mad")).alias("mad"),
            F.sum(
                F.when(F.col("adev") > F.lit(5) * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@query(
    "markov_transitions",
    """WITH ordered AS (
         SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type
         FROM events),
       trans AS (SELECT prev_type, event_type AS next_type, count(*) AS n
                 FROM ordered WHERE prev_type IS NOT NULL
                 GROUP BY 1, 2),
       tot AS (SELECT prev_type, SUM(n) AS n_from FROM trans GROUP BY 1)
       SELECT trans.prev_type, trans.next_type, trans.n,
              CAST(trans.n AS DOUBLE) / CAST(tot.n_from AS DOUBLE) AS p
       FROM trans JOIN tot USING (prev_type)""",
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior (r7):
    per (previous event type → next event type), the transition count
    and probability — the session-flow model behind next-action
    prediction and funnel-leak diagnosis.  One per-user window pass
    (lag), one partial-aggregated count shuffle, exact counts into one
    division."""
    from pyspark.sql import Window

    (events,) = prep(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = trans.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    return trans.join(F.broadcast(tot), "prev_type").select(
        "prev_type", "next_type", "n",
        (F.col("n").cast("double") / F.col("n_from").cast("double")).alias("p"),
    )


@query(
    "benford_digits",
    """WITH d AS (SELECT substr(CAST(CAST(round(o_totalprice * 100.0, 0)
                                      AS BIGINT) AS VARCHAR), 1, 1) AS digit
                  FROM orders WHERE o_totalprice > 0),
       cnt AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
       tot AS (SELECT SUM(n) AS total FROM cnt)
       SELECT digit, n,
              CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
              round(ln(1.0 + 1.0 / CAST(digit AS BIGINT)) / ln(10.0), 6)
                AS benford_expected
       FROM cnt CROSS JOIN tot""",
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law digit profile (r7): leading-digit distribution of
    order totals vs the log expectation — the classic fabricated-data
    / load-corruption screen a data-quality suite runs over financial
    columns.  Digit extraction via string head (engine-portable; no
    float log10 on the value side), share from exact counts, the
    expected share a rounded identical expression."""
    (orders,) = prep(spark, sf_dir, "orders")
    d = orders.where(F.col("o_totalprice") > 0).select(
        F.substring(
            F.round(F.col("o_totalprice") * F.lit(100.0), 0)
            .cast("long").cast("string"),
            1, 1,
        ).alias("digit")
    )
    cnt = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(F.sum("n").alias("total"))
    return cnt.crossJoin(F.broadcast(tot)).select(
        "digit", "n",
        (F.col("n").cast("double") / F.col("total").cast("double")).alias("share"),
        F.round(
            F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("long").cast("double"))
            / F.log(F.lit(10.0)),
            6,
        ).alias("benford_expected"),
    )


@query(
    "late_profile",
    """WITH b AS (SELECT event_id, epoch_us(ts) AS mu FROM events),
       r AS (SELECT event_id, mu,
                    max(mu) OVER (ORDER BY event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pmax
             FROM b),
       l AS (SELECT greatest(COALESCE(pmax - mu, 0), 0) AS late_us FROM r)
       SELECT CAST(d.delay_sec AS BIGINT) AS delay_sec,
              CAST(SUM(CASE WHEN late_us > CAST(d.delay_sec AS BIGINT) * 1000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
              CAST(SUM(CASE WHEN late_us > CAST(d.delay_sec AS BIGINT) * 1000000
                            THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) AS share
       FROM l CROSS JOIN (VALUES (0), (60), (600), (3600)) AS d(delay_sec)
       GROUP BY d.delay_sec""",
)
def q_late_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay planning (r7): for candidate delays 0s/1m/10m/1h,
    how many events would a D-delayed watermark drop?  Lateness = how
    far each event's time lags the max event time that ARRIVED before
    it (arrival sequence = event_id, the ingest-offset stand-in).  The
    running max is a two-level prefix scan — per-chunk windows stay
    fully parallel, the serial pass touches n/chunk rows — never a
    global single-partition window.  Exact integer microseconds; the
    oracle computes the same profile with a direct running-max window.
    Read the output as the completeness-vs-latency curve and pick the
    smallest delay meeting the SLA."""
    from hdfs_stream_processing_spark.operators.analytics import lateness_profile

    (events,) = prep(spark, sf_dir, "events")
    return lateness_profile(
        events, "event_id", "ts", delays_sec=[0, 60, 600, 3600]
    )


@query(
    "incr_checksum",
    """WITH h AS (
         SELECT ('0x' || substr(md5(
                  CAST(doc_id AS VARCHAR) || '|' || source || '|'
                  || CAST(n_chars AS VARCHAR)
                ), 1, 15))::UBIGINT::BIGINT AS v
         FROM documents)
       SELECT 'documents' AS table_name,
              count(*) AS n_rows,
              CAST(SUM(v) AS VARCHAR) AS checksum
       FROM h""",
)
def q_incr_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained table checksum (r7): the corpus
    checksum is updated from the maintained old value plus the NEW
    batch's checksum — never rescanning history — because the row-hash
    SUM is additive: checksum(corpus ∪ batch) = checksum(corpus) +
    checksum(batch) for disjoint rows.  The Spark side computes
    old + delta (128-bit decimal addition); the oracle recomputes the
    FULL checksum from scratch — hash equality proves the incremental
    maintenance converges to the ground truth, the same contract as
    incr_rollup/incr_topk.  At 100 TB the nightly integrity stamp
    costs one pass over the new batch."""
    from hdfs_stream_processing_spark.operators.quality import table_checksum

    (documents,) = prep(spark, sf_dir, "documents")
    cols = [F.col("doc_id"), F.col("source"), F.col("n_chars")]
    corpus = documents.where(F.col("doc_id") <= 250)
    batch = documents.where(F.col("doc_id") > 250)
    old = table_checksum(corpus, "documents", cols)
    delta = table_checksum(batch, "documents", cols)
    merged = (
        old.select(
            "table_name",
            F.col("n_rows").alias("_n0"),
            F.col("checksum").cast("decimal(38,0)").alias("_c0"),
        )
        .join(
            delta.select(
                "table_name",
                F.col("n_rows").alias("_n1"),
                F.col("checksum").cast("decimal(38,0)").alias("_c1"),
            ),
            "table_name",
        )
        .select(
            "table_name",
            (F.col("_n0") + F.col("_n1")).alias("n_rows"),
            (F.col("_c0") + F.col("_c1")).cast("decimal(38,0)").cast("string").alias("checksum"),
        )
    )
    return merged


@query(
    "stream_checksum",
    """WITH h AS (
         SELECT ('0x' || substr(md5(
                  CAST(doc_id AS VARCHAR) || '|' || source || '|'
                  || CAST(n_chars AS VARCHAR)
                ), 1, 15))::UBIGINT::BIGINT AS v
         FROM documents)
       SELECT 'documents' AS table_name,
              count(*) AS n_rows,
              CAST(SUM(v) AS VARCHAR) AS checksum
       FROM h""",
)
def q_stream_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-maintained table checksum (r7): the integrity stamp
    rides the SAME run_stream_rollup machinery as the exact count
    tables and the CMS sketch — each micro-batch contributes its
    row-hash sum (128-bit decimal), sums merge by addition under the
    batch-id replay guard, and the maintained value must equal the
    one-shot corpus checksum the oracle computes from scratch.  The
    replication monitor at 100 TB: per-batch cost is batch-sized, the
    state is one row per table, and a replayed batch cannot
    double-count."""
    from hdfs_stream_processing_spark.sources.io import read_table_version
    from hdfs_stream_processing_spark.streaming import stream_parquet_source
    from hdfs_stream_processing_spark.streaming.pipeline import run_stream_rollup

    src_dir, schema = _stage_documents(spark, sf_dir)
    stream = stream_parquet_source(spark, src_dir, schema, max_files_per_trigger=2)

    def partial(df: DataFrame) -> DataFrame:
        rendered = F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.col("source"),
            F.col("n_chars").cast("string"),
        )
        h = F.conv(F.substring(F.md5(rendered), 1, 15), 16, 10).cast("long")
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(h.cast("decimal(38,0)")).alias("v"),
        ).select(F.lit("documents").alias("table_name"), "n_rows", "v")

    tdir = _mkdtemp("hsp_scksum_")
    ckpt = _mkdtemp("hsp_scksum_ckpt_")
    run_stream_rollup(stream, tdir, ckpt, ["table_name"], ["n_rows", "v"], partial)
    return read_table_version(spark, tdir).select(
        "table_name", "n_rows", F.col("v").cast("string").alias("checksum")
    )


@query(
    "calendar_rollup",
    """WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0,
                         max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
       spine AS (SELECT CAST(unnest(generate_series(d0, d1,
                              INTERVAL 1 DAY)) AS DATE) AS day FROM b),
       pris AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
       daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
                        o_orderpriority AS priority,
                        SUM(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
                          AS cents
                 FROM orders GROUP BY 1, 2)
       SELECT spine.day, pris.priority,
              CAST(COALESCE(daily.cents, 0) AS BIGINT) AS cents,
              CAST(COALESCE(daily.cents, 0) AS DOUBLE) / 100.0 AS revenue
       FROM spine CROSS JOIN pris
       LEFT JOIN daily ON daily.day = spine.day
                      AND daily.priority = pris.priority""",
)
def q_calendar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar rollup (r7): daily revenue per priority on a
    COMPLETE date spine — every calendar day in the span present, zero
    where no orders landed (the BI-dashboard contract gap-charts need;
    gapfill_locf/interp carry values forward, this one materializes
    true zeros).  The spine is sequence() over the min/max bounds (one
    broadcast row), cross-joined with the tiny priority dim — spine
    size is calendar-bounded, never data-bounded, so the zero-fill
    costs the same at 100 TB as at 100 MB; the daily agg partial-
    aggregates map-side."""
    (orders,) = prep(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate")
    bounds = orders.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    pris = orders.select(
        F.col("o_orderpriority").alias("priority")
    ).distinct()
    daily = orders.groupBy(
        day.alias("day"), F.col("o_orderpriority").alias("priority")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * F.lit(100.0), 0).cast("long")
        ).alias("cents")
    )
    return (
        spine.crossJoin(F.broadcast(pris))
        .join(daily, ["day", "priority"], "left")
        .select(
            "day", "priority",
            F.coalesce(F.col("cents"), F.lit(0)).cast("long").alias("cents"),
            (
                F.coalesce(F.col("cents"), F.lit(0)).cast("double") / F.lit(100.0)
            ).alias("revenue"),
        )
    )


@query(
    "dedup_keep_quality",
    f"""{_PAIRS_SQL},
       edges(u, v) AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
       reach(id, r) AS (
         SELECT u, u FROM edges
         UNION
         SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
       comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       ranked AS (
         SELECT d.doc_id, d.lang, d.source, comp.id AS cid,
                row_number() OVER (PARTITION BY comp.component
                                   ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
         FROM documents d JOIN comp ON d.doc_id = comp.id)
       SELECT d.doc_id, d.lang, d.source FROM documents d
       LEFT JOIN comp ON d.doc_id = comp.id
       WHERE comp.id IS NULL
       UNION ALL
       SELECT doc_id, lang, source FROM ranked WHERE rk = 1""",
)
def q_dedup_keep_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-based dedup survivor selection (r7): same pairs →
    components chain as `dedup_keep`, but each cluster keeps its
    LONGEST member (n_chars DESC, doc_id tiebreak) instead of the min
    id — the curation policy an LLM corpus actually wants (min-id keeps
    whichever copy crawled first, often the truncated one).  One
    ranking window keyed by component; unclustered rows bypass the
    window entirely (the null-component skew trap)."""
    from hdfs_stream_processing_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature_wide,
    )
    from hdfs_stream_processing_spark.operators.graph import (
        cluster_representatives_by,
        connected_components,
    )

    (documents,) = prep(spark, sf_dir, "documents")
    sig = minhash_signature_wide(documents, "doc_id", "text", num_hashes=8, shingle_n=2)
    pairs = lsh_candidate_pairs(sig, "doc_id", num_hashes=8, band_size=2, wide=True)
    comp = connected_components(pairs)
    return cluster_representatives_by(
        documents.select("doc_id", "lang", "source", "n_chars"),
        comp,
        "doc_id",
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
    ).drop("n_chars")


@query(
    "lm_score",
    """WITH tok AS (SELECT doc_id,
                           unnest(string_split(lower(text), ' ')) AS token
                    FROM documents),
       tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
       corpus_tok AS (SELECT token FROM tok2 WHERE doc_id <= 250),
       cnt AS (SELECT token, count(*) AS c FROM corpus_tok GROUP BY token),
       nv AS (SELECT (SELECT count(*) FROM corpus_tok) AS total,
                     (SELECT count(*) FROM cnt) AS vocab),
       terms AS (
         SELECT t.doc_id,
                CAST(round(ln(CAST(COALESCE(cnt.c, 0) + 1 AS DOUBLE)
                              / CAST(nv.total + nv.vocab + 1 AS DOUBLE))
                           * 1000000.0, 0) AS BIGINT) AS micro_nats
         FROM tok2 t LEFT JOIN cnt USING (token) CROSS JOIN nv)
       SELECT doc_id,
              count(*) AS n_tokens,
              CAST(SUM(micro_nats) AS BIGINT) AS sum_micro_nats,
              CAST(SUM(micro_nats) AS DOUBLE)
                / (CAST(count(*) AS DOUBLE) * 1000000.0) AS avg_logprob
       FROM terms GROUP BY doc_id""",
)
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring (r7): every document's average
    token log-probability under the corpus (doc_id ≤ 250) unigram LM
    with Laplace smoothing — the perplexity-style quality filter LLM
    pipelines run at ingest (low avg_logprob = gibberish / off-corpus).
    The engine-portability trick: each token's log-prob is ROUNDED TO
    INTEGER MICRO-NATS before aggregation, so the per-doc sum is exact
    integer arithmetic — no float summation order crosses engines, and
    only the final division is a double.  One count shuffle over the
    corpus, one broadcast lookup join, one per-doc aggregate."""
    (documents,) = prep(spark, sf_dir, "documents")
    tok = documents.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).where(F.col("token") != "")
    corpus_tok = tok.where(F.col("doc_id") <= 250).select("token")
    cnt = corpus_tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    nv = corpus_tok.agg(F.count(F.lit(1)).alias("total")).crossJoin(
        cnt.agg(F.count(F.lit(1)).alias("vocab"))
    )
    terms = (
        tok.join(F.broadcast(cnt), "token", "left")
        .crossJoin(F.broadcast(nv))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("total") + F.col("vocab") + F.lit(1)).cast("double")
                )
                * F.lit(1000000.0),
                0,
            ).cast("long").alias("micro_nats"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("micro_nats").alias("sum_micro_nats"),
        (
            F.sum("micro_nats").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1000000.0))
        ).alias("avg_logprob"),
    )


@query(
    "psi_drift",
    """WITH c AS (SELECT CAST(round(value * 100.0, 0) AS BIGINT) AS cents,
                         ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref
                  FROM events WHERE value IS NOT NULL),
       b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c),
       binned AS (
         SELECT CAST(least(((c.cents - b.lo) * 10) // (b.hi - b.lo + 1), 9)
                     AS BIGINT) AS bin,
                is_ref
         FROM c CROSS JOIN b),
       cells AS (
         SELECT bin,
                CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
                CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
         FROM binned GROUP BY bin),
       tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
                      CAST(SUM(n_cur) AS BIGINT) AS t_cur,
                      CAST(count(*) AS BIGINT) AS k
               FROM cells)
       SELECT bin, n_ref, n_cur,
              round((CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + k AS DOUBLE)
                     - CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + k AS DOUBLE))
                    * ln((CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + k AS DOUBLE))
                         / (CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + k AS DOUBLE))),
                    6) AS psi_contrib
       FROM cells CROSS JOIN tot""",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift cells (r7): the value
    distribution of the first half-month (reference) vs the second
    (current), 10 equi-width bins over the exact global range, Laplace
    +1 smoothing so empty bins stay finite.  Per-bin
    (share_ref − share_cur)·ln(share_ref/share_cur) from exact integer
    counts, rounded once — the model-ops drift gate for training-data
    refreshes (PSI > 0.2 = retrain); the scalar PSI is the sum of
    ``psi_contrib``, left to the reader so no float summation order
    crosses engines (same contract as chisq_assoc).  Two aggregate
    passes + broadcast bounds."""
    (events,) = prep(spark, sf_dir, "events")
    c = events.where(F.col("value").isNotNull()).select(
        F.round(F.col("value") * F.lit(100.0), 0).cast("long").alias("cents"),
        (F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")).alias("is_ref"),
    )
    b = c.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    binned = c.crossJoin(F.broadcast(b)).select(
        F.least(
            F.expr("((cents - lo) * 10) div (hi - lo + 1)"), F.lit(9)
        ).cast("long").alias("bin"),
        "is_ref",
    )
    cells = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
    )
    tot = cells.agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).alias("k"),
    )
    p = (F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + F.col("k")).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (F.col("t_cur") + F.col("k")).cast("double")
    return cells.crossJoin(F.broadcast(tot)).select(
        "bin", "n_ref", "n_cur",
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )


@query(
    "interval_peak",
    """WITH ends AS (
         SELECT l_orderkey, CAST(max(l_shipdate) AS DATE) + 1 AS close_day
         FROM lineitem GROUP BY l_orderkey),
       iv AS (
         SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS open_day, e.close_day
         FROM orders o
         JOIN ends e ON o.o_orderkey = e.l_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey),
       deltas AS (
         SELECT n_name, open_day AS day, 1 AS net FROM iv
         UNION ALL
         SELECT n_name, close_day AS day, -1 AS net FROM iv),
       net AS (
         SELECT n_name, day, CAST(SUM(net) AS BIGINT) AS net
         FROM deltas GROUP BY n_name, day),
       run AS (
         SELECT n_name, day,
                SUM(net) OVER (PARTITION BY n_name ORDER BY day
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
         FROM net),
       peak AS (SELECT n_name, MAX(running) AS peak FROM run GROUP BY n_name)
       SELECT r.n_name, CAST(p.peak AS BIGINT) AS peak, MIN(r.day) AS peak_day
       FROM run r JOIN peak p ON r.n_name = p.n_name AND r.running = p.peak
       GROUP BY r.n_name, p.peak""",
)
def q_interval_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency (r7): per customer nation, the max
    number of simultaneously OPEN orders (open = o_orderdate, close =
    day after the order's last lineitem shipment, end-exclusive) and
    the first day that peak is reached.  The interval-overlap staple
    (max concurrent sessions / in-flight shipments / active users)
    that windowed aggregation alone can't answer.

    Plan shape: lineitem collapses to per-order close days (map-side
    partial max), one equi-join chain to tag nations (nation
    broadcast), then :func:`interval_peak` — day-level net deltas via
    grouped agg, running sum over the calendar-bounded spine.  No
    window ever sees a data-sized partition; see the operator docstring
    for the 100 TB argument."""
    from hdfs_stream_processing_spark.operators.temporal import interval_peak

    orders, lineitem, customer, nation = prep(
        spark, sf_dir, "orders", "lineitem", "customer", "nation"
    )
    ends = lineitem.groupBy("l_orderkey").agg(
        F.date_add(F.to_date(F.max("l_shipdate")), 1).alias("close_day")
    )
    iv = (
        orders.join(ends, orders.o_orderkey == ends.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name"),
            F.to_date("o_orderdate").alias("open_day"),
            F.col("close_day"),
        )
    )
    return interval_peak(iv, "n_name", "open_day", "close_day")


def _rrf_oracle(terms: list[str], list_n: int, top_n: int, k_rrf: int) -> str:
    from hdfs_stream_processing_spark.operators.text import bm25_score_expr

    tf_cols = ",\n                ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n                ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    quant = _QUANT_SQL.format(col="embedding")
    return f"""
WITH base AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
     d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                {tf_cols}
           FROM base),
     g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl,
                {df_cols}
           FROM d),
     s AS (SELECT doc_id, {bm25_score_expr(len(terms))} AS score FROM d, g),
     lex AS (SELECT doc_id, r AS lex_rank FROM (
               SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
               FROM s) WHERE r <= {list_n}),
     qs AS (SELECT {quant} AS qv FROM embeddings WHERE vec_id = 0),
     cs AS (SELECT vec_id AS doc_id, {quant} AS cv FROM embeddings WHERE vec_id <> 0),
     vsc AS (SELECT c.doc_id,
                    CAST(list_sum(list_transform(list_zip(q.qv, c.cv), p -> p[1] * p[2])) AS DOUBLE)
                    / (sqrt(CAST(list_sum(list_transform(q.qv, x -> x * x)) AS DOUBLE))
                       * sqrt(CAST(list_sum(list_transform(c.cv, x -> x * x)) AS DOUBLE))) AS cosine
             FROM cs c CROSS JOIN qs q),
     vec AS (SELECT doc_id, r AS vec_rank FROM (
               SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS r
               FROM vsc) WHERE r <= {list_n}),
     fused AS (
       SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
              COALESCE(1.0 / ({k_rrf} + l.lex_rank), 0.0)
              + COALESCE(1.0 / ({k_rrf} + v.vec_rank), 0.0) AS rrf
       FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
SELECT doc_id, lex_rank, vec_rank, round(rrf, 9) AS rrf, fused_rank FROM (
  SELECT doc_id, lex_rank, vec_rank, rrf,
         CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS fused_rank
  FROM fused)
WHERE fused_rank <= {top_n}"""


@query("hybrid_rrf", _rrf_oracle(_BM25_TERMS, list_n=50, top_n=20, k_rrf=60))
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (r7): fuse a lexical
    BM25 top-50 (3-term query over documents.text) with a vector
    top-50 (exact quantized cosine to doc 0's embedding — documents
    and embeddings are 1:1 on id) as score = Σ 1/(60 + rank), the
    standard RRF that modern hybrid search (lexical ∪ ANN) ships.
    Both input rankings are bit-exact across engines (BM25's shared
    integer-stats expression tree; the quantized-integer cosine), and
    the fused score is two IEEE doubles added in a fixed order — so
    even the FUSED ranking is engine-identical.

    Plan shape: the two branches are independent (corpus scanned once
    each, no shuffle beyond their own top-k windows); the fusion joins
    two ≤50-row lists — driver-free, broadcast-trivial at any corpus
    size.  At 100 TB the vector branch is the one you'd swap for the
    IVF probe (similarity_ivf) — the fusion layer is unchanged."""
    from pyspark.sql import Window

    from hdfs_stream_processing_spark.operators.similarity import similarity_topk
    from hdfs_stream_processing_spark.operators.text import bm25_rank

    documents, embeddings = prep(spark, sf_dir, "documents", "embeddings")
    lex = bm25_rank(documents, "doc_id", "text", _BM25_TERMS, top_n=50).select(
        "doc_id", F.col("rank").cast("long").alias("lex_rank")
    )
    vec = similarity_topk(
        embeddings, "vec_id", "embedding",
        queries_filter=F.col("vec_id") == 0, k=50,
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rank").cast("long").alias("vec_rank"))
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id", "lex_rank", "vec_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= 20)
        .select(
            "doc_id", "lex_rank", "vec_rank",
            F.round("rrf", 9).alias("rrf"), "fused_rank",
        )
    )


@query(
    "rolling_actives",
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
       b AS (SELECT max(day) AS d1 FROM du),
       contrib AS (
         SELECT du.user_id, du.day + CAST(x.x AS INTEGER) AS day
         FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS x) x)
       SELECT c.day, CAST(count(DISTINCT c.user_id) AS BIGINT) AS actives_7d
       FROM contrib c CROSS JOIN b
       WHERE c.day <= b.d1
       GROUP BY c.day""",
)
def q_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (r7) — the sliding
    COUNT DISTINCT that plain windowed aggregation cannot express
    (distinct is not decomposable across overlapping windows; a
    rows-between frame would double-count users active on two days).

    The exact distributed shape: dedup events to (day, user) FIRST
    (map-side partial distinct — the only pass over the raw table),
    then explode each daily-active pair into the 7 window days it
    contributes to and count distinct per window day.  The 7× fanout
    applies to the DAILY-DISTINCT table (|days| × |users| worst case),
    never to raw events — at 100 TB of events the exploded table is
    orders of magnitude smaller than the input.  The approximate path
    at extreme user counts is per-day HLL registers merged across the
    7-day window (operators/sketch.py::hll_registers are mergeable by
    construction); this query keeps the exact contract.  Trailing
    window days past the data's max day are clipped (one broadcast
    scalar), so every output day has a full-or-partial-leading window,
    same rule both engines."""
    (events,) = prep(spark, sf_dir, "events")
    du = events.select(F.to_date("ts").alias("day"), "user_id").distinct()
    bounds = du.agg(F.max("day").alias("d1"))
    contrib = du.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("x"),
        "day",
    ).select("user_id", F.expr("date_add(day, x)").alias("day"))
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .where(F.col("day") <= F.col("d1"))
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("actives_7d"))
    )


@query(
    "stream_actives",
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
       b AS (SELECT max(day) AS d1 FROM du),
       contrib AS (
         SELECT du.user_id, du.day + CAST(x.x AS INTEGER) AS day
         FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS x) x)
       SELECT c.day, CAST(count(DISTINCT c.user_id) AS BIGINT) AS actives_7d
       FROM contrib c CROSS JOIN b
       WHERE c.day <= b.d1
       GROUP BY c.day""",
)
def q_stream_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-maintained rolling 7-day actives: the (day, user)
    presence table is additive — each micro-batch contributes its
    batch-local daily-active counts, merged by addition behind
    run_stream_rollup's replay guard — so the sliding COUNT DISTINCT
    stays answerable without ever re-scanning event history.  The
    on-demand read does the same bounded 7-day explode as the batch
    query (`rolling_actives`) over the maintained presence table, and
    must equal the from-scratch answer over the whole corpus.

    Scale: per batch the shuffle is batch-sized; stored state is
    |days| × |active users| presence rows (grows with coverage, not
    with event volume); a replayed batch cannot double-create
    presence.  The extreme-cardinality fallback is per-day HLL
    registers (mergeable across both batches and window days)."""
    from hdfs_stream_processing_spark.sources.io import read_table_version
    from hdfs_stream_processing_spark.streaming import stream_parquet_source
    from hdfs_stream_processing_spark.streaming.pipeline import run_stream_rollup

    src_dir, schema = _stage_events(spark, sf_dir)
    stream = stream_parquet_source(spark, src_dir, schema, max_files_per_trigger=2)

    def partial(df: DataFrame) -> DataFrame:
        return (
            df.select(F.to_date("ts").alias("day"), "user_id")
            .groupBy("day", "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    tdir = _mkdtemp("hsp_sact_")
    ckpt = _mkdtemp("hsp_sact_ckpt_")
    run_stream_rollup(stream, tdir, ckpt, ["day", "user_id"], ["n"], partial)
    du = read_table_version(spark, tdir).select("day", "user_id")
    bounds = du.agg(F.max("day").alias("d1"))
    contrib = du.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("x"),
        "day",
    ).select("user_id", F.expr("date_add(day, x)").alias("day"))
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .where(F.col("day") <= F.col("d1"))
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("actives_7d"))
    )


@query(
    "golden_record",
    f"""{_PAIRS_SQL},
       edges(u, v) AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
       reach(id, r) AS (
         SELECT u, u FROM edges
         UNION
         SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
       comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       m AS (SELECT d.doc_id, d.lang, d.source, d.n_chars, comp.component
             FROM documents d JOIN comp ON d.doc_id = comp.id),
       surv AS (SELECT component, doc_id AS survivor_id, n_chars FROM (
                  SELECT component, doc_id, n_chars,
                         row_number() OVER (PARTITION BY component
                                            ORDER BY n_chars DESC, doc_id ASC) AS rk
                  FROM m) WHERE rk = 1),
       lc AS (SELECT component, lang, count(*) AS c FROM m GROUP BY component, lang),
       lp AS (SELECT component, lang FROM (
                SELECT component, lang,
                       row_number() OVER (PARTITION BY component
                                          ORDER BY c DESC, lang ASC) AS rk
                FROM lc) WHERE rk = 1),
       sc AS (SELECT component, source, count(*) AS c FROM m GROUP BY component, source),
       sp AS (SELECT component, source FROM (
                SELECT component, source,
                       row_number() OVER (PARTITION BY component
                                          ORDER BY c DESC, source ASC) AS rk
                FROM sc) WHERE rk = 1)
       SELECT s.component AS cluster_id, s.survivor_id, lp.lang, sp.source,
              CAST(s.n_chars AS BIGINT) AS n_chars
       FROM surv s JOIN lp ON s.component = lp.component
                   JOIN sp ON s.component = sp.component
       UNION ALL
       SELECT d.doc_id AS cluster_id, d.doc_id AS survivor_id, d.lang,
              d.source, CAST(d.n_chars AS BIGINT) AS n_chars
       FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
       WHERE comp.id IS NULL""",
)
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDM-style golden-record survivorship (r7): near-dup clusters
    (same MinHash-LSH pairs → connected components as dedup_clusters)
    merge to ONE record with PER-ATTRIBUTE rules — the body comes from
    the longest member (n_chars DESC, doc_id tiebreak), lang and
    source are each the cluster's most frequent value (count DESC,
    value ASC) — unlike dedup_keep_quality, which keeps one member
    wholesale.  Unclustered rows bypass every window (the
    null-component skew trap) and pass through as their own golden
    record.

    Scale: three component-keyed aggregations/windows over the
    CLUSTERED subset only (near-dup members, a small fraction of the
    corpus); attribute vote tables are |clusters| × |distinct values|.
    Nothing touches unclustered corpus rows beyond the pairs
    anti-join."""
    from pyspark.sql import Window

    from hdfs_stream_processing_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature_wide,
    )
    from hdfs_stream_processing_spark.operators.graph import connected_components

    (documents,) = prep(spark, sf_dir, "documents")
    docs = documents.select("doc_id", "lang", "source", "n_chars")
    sig = minhash_signature_wide(documents, "doc_id", "text", num_hashes=8, shingle_n=2)
    pairs = lsh_candidate_pairs(sig, "doc_id", num_hashes=8, band_size=2, wide=True)
    comp = connected_components(pairs)
    m = docs.join(comp, docs.doc_id == comp.id).select(
        "component", "doc_id", "lang", "source", "n_chars"
    ).localCheckpoint(eager=False)
    ws = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    surv = (
        m.withColumn("rk", F.row_number().over(ws))
        .where(F.col("rk") == 1)
        .select("component", F.col("doc_id").alias("survivor_id"), "n_chars")
    )

    def vote(col: str) -> DataFrame:
        cnt = m.groupBy("component", col).agg(F.count(F.lit(1)).alias("c"))
        wv = Window.partitionBy("component").orderBy(
            F.col("c").desc(), F.col(col).asc()
        )
        return (
            cnt.withColumn("rk", F.row_number().over(wv))
            .where(F.col("rk") == 1)
            .select("component", col)
        )

    golden = (
        surv.join(vote("lang"), "component")
        .join(vote("source"), "component")
        .select(
            F.col("component").alias("cluster_id"), "survivor_id",
            "lang", "source", F.col("n_chars").cast("long").alias("n_chars"),
        )
    )
    passthrough = docs.join(comp, docs.doc_id == comp.id, "left_anti").select(
        F.col("doc_id").alias("cluster_id"),
        F.col("doc_id").alias("survivor_id"),
        "lang", "source", F.col("n_chars").cast("long").alias("n_chars"),
    )
    return golden.unionByName(passthrough)


@query(
    "incr_golden",
    f"""{_PAIRS_SQL},
       edges(u, v) AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
       reach(id, r) AS (
         SELECT u, u FROM edges
         UNION
         SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
       comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       m AS (SELECT d.doc_id, d.lang, d.source, d.n_chars, comp.component
             FROM documents d JOIN comp ON d.doc_id = comp.id),
       surv AS (SELECT component, doc_id AS survivor_id, n_chars FROM (
                  SELECT component, doc_id, n_chars,
                         row_number() OVER (PARTITION BY component
                                            ORDER BY n_chars DESC, doc_id ASC) AS rk
                  FROM m) WHERE rk = 1),
       lc AS (SELECT component, lang, count(*) AS c FROM m GROUP BY component, lang),
       lp AS (SELECT component, lang FROM (
                SELECT component, lang,
                       row_number() OVER (PARTITION BY component
                                          ORDER BY c DESC, lang ASC) AS rk
                FROM lc) WHERE rk = 1),
       sc AS (SELECT component, source, count(*) AS c FROM m GROUP BY component, source),
       sp AS (SELECT component, source FROM (
                SELECT component, source,
                       row_number() OVER (PARTITION BY component
                                          ORDER BY c DESC, source ASC) AS rk
                FROM sc) WHERE rk = 1)
       SELECT s.component AS cluster_id, s.survivor_id, lp.lang, sp.source,
              CAST(s.n_chars AS BIGINT) AS n_chars
       FROM surv s JOIN lp ON s.component = lp.component
                   JOIN sp ON s.component = sp.component
       UNION ALL
       SELECT d.doc_id AS cluster_id, d.doc_id AS survivor_id, d.lang,
              d.source, CAST(d.n_chars AS BIGINT) AS n_chars
       FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
       WHERE comp.id IS NULL""",
)
def q_incr_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL golden-record maintenance (r7): the corpus
    (doc_id ≤ 250) maintains its component labels, golden table, and
    LSH band table; a new batch (doc_id > 250) arrives and the golden
    table updates by COMPONENT CONTRACTION — each old cluster is one
    contracted node, so the connectivity delta is solved on a graph of
    (batch pairs ∪ cross pairs mapped to old labels), never on corpus
    edges.  Only clusters actually touched by the batch recompute
    their survivor/votes (corpus member rows fetched by semi-join
    point-reads); every untouched golden row carries over byte-for-
    byte.  CC(contract(CC(A)) ∪ B) = CC(A ∪ B), and each old label is
    already the min of its members, so merged labels — and therefore
    the whole output — are IDENTICAL to a full recompute: the oracle
    is golden_record's full-corpus SQL, verbatim.

    Scale: per load the contracted graph, the affected member set,
    and every vote table are batch-bounded; corpus bytes are touched
    by the band equi-join and the affected-member semi-join only."""
    from pyspark.sql import Window

    from hdfs_stream_processing_spark.operators.dedup import (
        band_hashes,
        lsh_candidate_pairs,
        minhash_signature_wide,
    )
    from hdfs_stream_processing_spark.operators.graph import connected_components

    (documents,) = prep(spark, sf_dir, "documents")
    docs = documents.select("doc_id", "text", "lang", "source", "n_chars")
    corpus = docs.where(F.col("doc_id") <= 250)
    batch = docs.where(F.col("doc_id") > 250)

    # ---- maintained state (built here; maintained incrementally in
    # production exactly like dedup_near_incr's band table) ----
    corpus_sig = minhash_signature_wide(corpus, "doc_id", "text", 8, 2)
    corpus_bands = band_hashes(corpus_sig, "doc_id", 8, 2).localCheckpoint(eager=False)
    corpus_comp = connected_components(
        lsh_candidate_pairs(corpus_sig, "doc_id", 8, 2, wide=True)
    ).localCheckpoint(eager=False)
    g_old = _golden_from_members(
        corpus.join(corpus_comp, corpus.doc_id == corpus_comp.id)
        .select("component", "doc_id", "lang", "source", "n_chars"),
    ).unionByName(
        corpus.join(corpus_comp, corpus.doc_id == corpus_comp.id, "left_anti").select(
            F.col("doc_id").alias("cluster_id"),
            F.col("doc_id").alias("survivor_id"),
            "lang", "source", F.col("n_chars").cast("long").alias("n_chars"),
        )
    )

    # ---- the incremental step ----
    new_golden, _, _ = _golden_step(
        batch,
        corpus_bands,
        corpus_comp,
        corpus.select("doc_id", "lang", "source", "n_chars"),
        g_old,
    )
    return new_golden


def _golden_step(
    batch: DataFrame,
    bands_old: DataFrame,
    comp_old: DataFrame,
    attrs_old: DataFrame,
    g_old: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One golden-maintenance increment by component contraction (the
    shared engine of incr_golden and stream_golden).

    Inputs are the maintained state: the corpus LSH band table
    (doc_id, band, band_hash), component labels (id, component — only
    docs in ≥1 pair have rows), corpus attributes (doc_id, lang,
    source, n_chars), and the current golden table.  Returns
    (new_golden, new_comp, batch_bands) — callers append batch_bands
    and the batch's attrs to their state.  CC(contract(CC(A)) ∪ B) =
    CC(A ∪ B) and old labels are member minima, so iterating this step
    over any batch split of a corpus yields the exact full-recompute
    golden table at every point."""
    from hdfs_stream_processing_spark.operators.dedup import (
        band_hashes,
        lsh_candidate_pairs,
        minhash_signature_wide,
    )
    from hdfs_stream_processing_spark.operators.graph import connected_components

    sig_b = minhash_signature_wide(batch, "doc_id", "text", 8, 2).localCheckpoint(
        eager=False
    )
    bands_b = band_hashes(sig_b, "doc_id", 8, 2).localCheckpoint(eager=False)
    batch_pairs = lsh_candidate_pairs(sig_b, "doc_id", 8, 2, wide=True).select(
        "id_a", "id_b"
    )
    cross = (
        F.broadcast(bands_b.select(F.col("doc_id").alias("id_a"), "band", "band_hash"))
        .join(
            bands_old.select(F.col("doc_id").alias("id_b"), "band", "band_hash"),
            ["band", "band_hash"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # corpus side of cross edges contracts to its old label (own id if
    # the corpus doc was unclustered)
    lab = comp_old.select(F.col("id").alias("id_b"), F.col("component").alias("_lb"))
    cross_lab = cross.join(lab, "id_b", "left").select(
        "id_a", F.coalesce(F.col("_lb"), F.col("id_b")).alias("id_b")
    )
    mcomp = connected_components(
        batch_pairs.unionByName(cross_lab)
    ).localCheckpoint(eager=False)
    # affected = every contracted node in the delta graph: batch doc
    # ids and old labels (old label == corpus doc id for singletons)
    old_of = attrs_old.join(comp_old, attrs_old.doc_id == comp_old.id, "left").select(
        attrs_old.doc_id, "lang", "source", "n_chars",
        F.coalesce(F.col("component"), attrs_old.doc_id).alias("_old"),
    )
    members = (
        old_of.join(
            F.broadcast(mcomp.select(F.col("id").alias("_old"), "component")), "_old"
        )
        .select("component", "doc_id", "lang", "source", "n_chars")
        .unionByName(
            batch.join(
                F.broadcast(mcomp.select(F.col("id").alias("doc_id"), "component")),
                "doc_id",
            ).select("component", "doc_id", "lang", "source", "n_chars")
        )
        .localCheckpoint(eager=False)
    )
    recomputed = _golden_from_members(members)
    carried = g_old.join(
        F.broadcast(mcomp.select(F.col("id").alias("cluster_id"))),
        "cluster_id",
        "left_anti",
    )
    untouched_batch = batch.join(
        F.broadcast(mcomp.select(F.col("id").alias("doc_id"))), "doc_id", "left_anti"
    ).select(
        F.col("doc_id").alias("cluster_id"),
        F.col("doc_id").alias("survivor_id"),
        "lang", "source", F.col("n_chars").cast("long").alias("n_chars"),
    )
    new_golden = recomputed.unionByName(carried).unionByName(untouched_batch)
    # relabel: affected clusters' rows are replaced wholesale by the
    # member rows (same docs, merged label); untouched rows carry over
    new_comp = comp_old.join(
        F.broadcast(mcomp.select(F.col("id").alias("component"))),
        "component",
        "left_anti",
    ).select("id", "component").unionByName(
        members.select(F.col("doc_id").alias("id"), "component")
    )
    return new_golden, new_comp, bands_b


def _golden_from_members(m: DataFrame) -> DataFrame:
    """Survivor + per-attribute votes over a (component, doc_id, lang,
    source, n_chars) member table — the shared tail of golden_record
    and incr_golden.  The member table has THREE consumers (survivor
    window + two vote aggs); checkpoint it so its upstream join chain
    executes once, not per consumer."""
    from pyspark.sql import Window

    m = m.localCheckpoint(eager=False)
    ws = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    surv = (
        m.withColumn("rk", F.row_number().over(ws))
        .where(F.col("rk") == 1)
        .select("component", F.col("doc_id").alias("survivor_id"), "n_chars")
    )

    def vote(col: str) -> DataFrame:
        cnt = m.groupBy("component", col).agg(F.count(F.lit(1)).alias("c"))
        wv = Window.partitionBy("component").orderBy(F.col("c").desc(), F.col(col).asc())
        return (
            cnt.withColumn("rk", F.row_number().over(wv))
            .where(F.col("rk") == 1)
            .select("component", col)
        )

    return (
        surv.join(vote("lang"), "component")
        .join(vote("source"), "component")
        .select(
            F.col("component").alias("cluster_id"), "survivor_id",
            "lang", "source", F.col("n_chars").cast("long").alias("n_chars"),
        )
    )


@query(
    "stream_golden",
    # the oracle is the same full-recompute golden SQL as golden_record
    # / incr_golden: the streaming-maintained table must equal it
    ORACLES["golden_record"],
)
def q_stream_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming golden-record maintenance: documents stream in and
    every micro-batch folds into the maintained golden table via the
    SAME component-contraction step as `incr_golden`
    (:func:`_golden_step` — the batch/incremental/streaming triad that
    scd2_build/scd2_merge/stream_scd2 established, now for MDM
    survivorship).  Four versioned state tables (bands, component
    labels, attributes, golden) commit per batch behind a batch-id
    replay guard; because the step is exact under ANY batch split, the
    final table must equal the one-shot full-corpus golden build — the
    oracle is golden_record's SQL verbatim.

    Scale: per batch, the delta graph and vote tables are
    batch-bounded; state grows with the corpus (bands/labels/attrs),
    and history is never re-clustered."""
    from pyspark.sql import types as T

    from hdfs_stream_processing_spark.sources.io import (
        read_table_version,
        table_latest_version,
        write_table_version,
    )
    from hdfs_stream_processing_spark.streaming import stream_parquet_source
    from hdfs_stream_processing_spark.streaming.pipeline import run_foreach_batch

    src_dir, schema = _stage_documents(spark, sf_dir)
    stream = stream_parquet_source(spark, src_dir, schema, max_files_per_trigger=2)
    state = _mkdtemp("hsp_sgold_state_")
    ckpt = _mkdtemp("hsp_sgold_ckpt_")

    def step(batch_df: DataFrame, batch_id: int) -> None:
        golden_apply_batch(batch_df, state, batch_id)

    # state-maintenance plans are micro-batch-sized (KBs–MBs here): 8
    # shuffle partitions instead of the session's core count cuts pure
    # task-scheduling overhead per batch — the same right-sizing every
    # other maintained-state stream query applies (_conf_override is
    # restored after; the CC calls inside scope their own loop conf).
    with _conf_override(spark, "spark.sql.shuffle.partitions", "8"):
        run_foreach_batch(stream, step, ckpt)
    return _golden_slice(
        read_table_version(spark, state).drop("_batch"), "golden"
    )


_GOLDEN_STATE_DDL = {
    "golden": (
        "cluster_id bigint, survivor_id bigint, lang string, "
        "source string, n_chars bigint"
    ),
    "bands": "doc_id bigint, band int, band_hash string",
    "comp": "id bigint, component bigint",
    "attrs": "doc_id bigint, lang string, source string, n_chars bigint",
}

#: Column layout of the ONE combined state snapshot (r15, VERDICT r14
#: #6): the four logical tables ride one schema behind a ``_t``
#: discriminator; absent columns are typed nulls.  Shared names keep
#: shared types (lang/source/n_chars: golden+attrs; doc_id:
#: bands+attrs), so the union is loss-free.
_GOLDEN_COMBINED_COLS: dict[str, str] = {
    "cluster_id": "bigint",
    "survivor_id": "bigint",
    "lang": "string",
    "source": "string",
    "n_chars": "bigint",
    "doc_id": "bigint",
    "band": "int",
    "band_hash": "string",
    "id": "bigint",
    "component": "bigint",
}


def _golden_pack(name: str, df: DataFrame) -> DataFrame:
    """Tag one logical state table into the combined snapshot layout."""
    have = set(df.columns)
    return df.select(
        F.lit(name).alias("_t"),
        *[
            (F.col(c).cast(t) if c in have else F.lit(None).cast(t)).alias(c)
            for c, t in _GOLDEN_COMBINED_COLS.items()
        ],
    )


def _golden_slice(snap: DataFrame, name: str) -> DataFrame:
    """One logical state table back out of a combined snapshot (the
    ``_t`` predicate reaches the parquet scan — row-group pruning)."""
    cols = [f.split()[0] for f in _GOLDEN_STATE_DDL[name].split(", ")]
    return snap.where(F.col("_t") == name).select(*cols)


def golden_apply_batch(
    batch_df: DataFrame, state: str, batch_id: int
) -> bool:
    """One streaming golden-maintenance step: fold a document
    micro-batch into the maintained state (bands, component labels,
    attributes, golden) via :func:`_golden_step` and commit ALL FOUR
    logical tables as ONE immutable combined snapshot stamped with the
    batch id (r15, VERDICT r14 #6 — the r14 shape committed four
    separate versioned tables per micro-batch: 4 write jobs, 4 sidecars,
    4 pointer flips, and a resolve() that had to walk past partially
    stamped tables after a crash; one multi-schema commit per batch
    makes the batch atomic BY CONSTRUCTION — the pointer flip is the
    last step of the single commit, so replay sees either the whole
    previous state or the whole new one).

    Replay contract: a batch whose id ≤ the committed snapshot's stamp
    already landed → early-return False.  The stamp comes from the
    ``_meta.json`` sidecar (driver-side file read); sidecar-less
    snapshots (pre-r14 layout) fall back to a ``max(_batch)`` scan."""
    from hdfs_stream_processing_spark.sources.io import (
        read_table_version,
        table_latest_version,
        table_version_meta,
        write_table_version,
    )

    spark = batch_df.sparkSession
    latest = table_latest_version(spark, state)
    if latest is not None:
        m = table_version_meta(spark, state, latest)
        if m is not None and "batch" in m:
            done = m["batch"]
        else:  # sidecar-less snapshot: derive the stamp from the data
            done = (
                read_table_version(spark, state, latest)
                .select(F.max("_batch"))
                .first()[0]
            )
        if done is not None and done >= batch_id:
            return False  # this batch's snapshot already published
        snap = read_table_version(spark, state, latest).drop("_batch")
        g_old = _golden_slice(snap, "golden")
        bands_old = _golden_slice(snap, "bands")
        comp_old = _golden_slice(snap, "comp")
        attrs_old = _golden_slice(snap, "attrs")
    else:
        g_old = spark.createDataFrame([], _GOLDEN_STATE_DDL["golden"])
        bands_old = spark.createDataFrame([], _GOLDEN_STATE_DDL["bands"])
        comp_old = spark.createDataFrame([], _GOLDEN_STATE_DDL["comp"])
        attrs_old = spark.createDataFrame([], _GOLDEN_STATE_DDL["attrs"])
    batch = batch_df.select("doc_id", "text", "lang", "source", "n_chars")
    new_golden, new_comp, bands_b = _golden_step(
        batch, bands_old, comp_old, attrs_old, g_old
    )
    # The single write below IS the materialization of every output
    # (all reads pin the immutable ``v=<latest>/data`` path resolved
    # above; shared subplans — sig_b, bands_b, mcomp, members — are
    # reused through their lazy checkpoints inside _golden_step).
    new_bands = bands_old.unionByName(bands_b)
    new_attrs = attrs_old.unionByName(
        batch.select("doc_id", "lang", "source", "n_chars")
    )
    packed = (
        _golden_pack("bands", new_bands)
        .unionByName(_golden_pack("comp", new_comp))
        .unionByName(_golden_pack("attrs", new_attrs))
        .unionByName(_golden_pack("golden", new_golden))
        .withColumn("_batch", F.lit(batch_id))
    )
    # Bound the snapshot's file count: the naive union write emits one
    # file per upstream partition (measured 34–64 KB-sized files per
    # snapshot at sf0.1 — the small-files trap of guide §6, paid again
    # by every later batch's re-read).  repartition — NOT coalesce —
    # because coalesce would fold the whole narrow upstream (the batch
    # minhash included) into the few write tasks (measured +2 s/run);
    # the extra exchange moves only KB–MB of state rows here.  The
    # count is env-tunable because the right number tracks STATE BYTES
    # (a production deployment would REBALANCE to the advisory
    # partition size instead — state there is corpus-sized, here it is
    # fixture-sized).
    import os as _os

    n_files = max(1, int(_os.environ.get("HSP_GOLDEN_STATE_FILES", "8")))
    write_table_version(
        spark, packed.repartition(n_files), state, meta={"batch": batch_id}
    )
    return True

# Round 8: MinHash-LSH recall contract, winsorization
# ========================================================================


@query(
    "minhash_recall",
    """WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
       sh AS (SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS shingle
                FROM sub)),
       sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                        CAST(COUNT(*) AS BIGINT) AS n_inter
                 FROM sh a JOIN sh b USING (shingle)
                 WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       truth AS (SELECT id_a, id_b FROM inter
                 JOIN sz sa ON sa.doc_id = id_a
                 JOIN sz sb ON sb.doc_id = id_b
                 WHERE 9 * n_inter >= 8 * (sa.sz + sb.sz - n_inter)),
       hashed AS (SELECT doc_id, seed,
                         ('0x' || substr(md5(CAST(CAST(floor(seed / 4) AS INT) AS VARCHAR)
                                             || ':' || shingle),
                                         1 + CAST(seed % 4 AS INT) * 8, 8))::UBIGINT::BIGINT AS h
                  FROM sh, generate_series(0, 15) g(seed)),
       sig AS (SELECT doc_id, seed, MIN(h) AS minhash
               FROM hashed GROUP BY doc_id, seed),
       band_sig AS (SELECT doc_id, CAST(floor(seed / 2.0) AS INT) AS band,
                           md5(array_to_string(list_sort(list(minhash)), ',')) AS band_hash
                    FROM sig GROUP BY doc_id, CAST(floor(seed / 2.0) AS INT)),
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM band_sig a JOIN band_sig b USING (band, band_hash)
                WHERE a.doc_id < b.doc_id),
       hit AS (SELECT t.id_a, t.id_b FROM truth t
               WHERE EXISTS (SELECT 1 FROM cand c
                             WHERE c.id_a = t.id_a AND c.id_b = t.id_b)),
       s AS (SELECT (SELECT COUNT(*) FROM truth) AS n_true,
                    (SELECT COUNT(*) FROM hit) AS n_hit)
       SELECT CAST(n_true AS BIGINT) AS n_true_pairs,
              CAST(n_hit AS BIGINT) AS n_hit_pairs,
              round(CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE), 6) AS recall,
              CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) >= 0.9 AS within_bound
       FROM s""",
)
def q_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH recall contract, FULLY hash-checked (the text-dedup
    analog of ann_recall — and stronger: because the md5-derived hash
    family is engine-portable, the oracle recomputes the ENTIRE LSH in
    SQL, so n_hit and recall are value-checked, not just bounded):
    ground truth = exact unigram Jaccard >= 8/9 pairs on the 20% doc
    sample (brute force in the oracle, prefix-filtered join here —
    same no-false-negative answer); candidates = 16 minhashes in 8
    bands of 2.  For J >= 8/9 the per-band hit rate is J^2 ~ 0.79, so
    a true pair escapes all 8 bands with probability (1-J^2)^8 < 4e-6
    — the measured recall must clear 0.9 (it is 1.0 on this corpus)."""
    from hdfs_stream_processing_spark.operators.dedup import (
        jaccard_join_prefix,
        lsh_candidate_pairs,
        minhash_signature_wide,
    )

    (documents,) = prep(spark, sf_dir, "documents")
    sub = documents.where(F.col("doc_id") % 5 == 0)
    truth = jaccard_join_prefix(
        sub, "doc_id", "text", t_num=8, t_den=9, shingle_n=1
    ).select("id_a", "id_b")
    sig = minhash_signature_wide(sub, "doc_id", "text", num_hashes=16, shingle_n=1)
    cand = lsh_candidate_pairs(sig, "doc_id", num_hashes=16, band_size=2, wide=True)
    n_true = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true_pairs"))
    n_hit = truth.join(cand, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_pairs")
    )
    out = n_true.crossJoin(F.broadcast(n_hit))
    ratio = F.col("n_hit_pairs").cast("double") / F.col("n_true_pairs").cast("double")
    return out.select(
        "n_true_pairs",
        "n_hit_pairs",
        F.round(ratio, 6).alias("recall"),
        (ratio >= F.lit(0.9)).alias("within_bound"),
    )


# ── r14: archive-container ingest (gzip members, WARC records) ──────────


def _stage_gzip_shards(spark: SparkSession, sf_dir: str) -> str:
    """Per-source ``.txt.gz`` line shards, each a MULTI-member gzip
    stream (two members split mid-corpus — the layout parallel
    writers and `gzip -c a b` produce, which a naive single-member
    reader silently truncates at the first trailer).  Lines are
    ``doc_id<TAB>text``; driver work bounded by the source count."""
    import os as _os

    from hdfs_stream_processing_spark.sources.archive import gzip_member

    key = ("hsp_gz_staged_", sf_dir)
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    (documents,) = prep(spark, sf_dir, "documents")
    gz_dir = _mkdtemp("hsp_gz_src_", sf_dir)
    shards = (
        documents.groupBy("source")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "text"))
            ).alias("docs")
        )
        .collect()
    )
    for row in shards:
        lines = [f"{d['doc_id']}\t{d['text']}\n" for d in row["docs"]]
        half = len(lines) // 2
        blob = gzip_member("".join(lines[:half]).encode()) + gzip_member(
            "".join(lines[half:]).encode()
        )
        with open(_os.path.join(gz_dir, f"{row['source']}.txt.gz"), "wb") as f:
            f.write(blob)
    _STAGE_CACHE[key] = gz_dir
    return gz_dir


@query(
    "scan_gzip",
    "SELECT doc_id, text FROM documents",
)
def q_scan_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed line-shard ingest (r14): the corpus staged as
    multi-member ``.txt.gz`` shards — RFC 1952 parsed member by member
    (header flags, raw-deflate body, CRC32 + ISIZE verified, inflate
    bounded against deflate bombs) inside an Arrow mapInPandas stage
    over ``binaryFile`` payloads (sources/archive.py::gunzip_members /
    scan_gzip_text).  The identity oracle proves the round-trip is
    lossless INCLUDING the member boundary — a single-member reader
    drops the second half of every shard and fails the row count.  At
    100 TB this is the ingest path for gzipped crawl/log corpora."""
    from hdfs_stream_processing_spark.sources.archive import scan_gzip_text

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt.gz")
        .load(_stage_gzip_shards(spark, sf_dir))
    )
    payloads = files.select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.txt\.gz$", 1).alias("source"),
        F.col("content").alias("payload"),
    )
    return scan_gzip_text(payloads, id_col="source", payload_col="payload")


def _stage_warc_shards(spark: SparkSession, sf_dir: str) -> str:
    """Per-source ``.warc.gz`` shards in the Common Crawl layout: one
    gzip member per WARC record — a ``warcinfo`` record first, then
    one ``response`` per document (Target-URI and WARC-Date derived
    deterministically from doc_id so the oracle can recompute them).
    Driver work bounded by the source count."""
    import os as _os

    from hdfs_stream_processing_spark.sources.archive import (
        build_warc_record,
        gzip_member,
    )

    key = ("hsp_warc_staged_", sf_dir)
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    (documents,) = prep(spark, sf_dir, "documents")
    warc_dir = _mkdtemp("hsp_warc_src_", sf_dir)
    shards = (
        documents.groupBy("source")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "text"))
            ).alias("docs")
        )
        .collect()
    )
    for row in shards:
        parts = [
            gzip_member(
                build_warc_record(
                    "warcinfo",
                    {"WARC-Record-ID": f"<urn:uuid:{row['source']}>"},
                    b"software: hsp-spark fixture",
                )
            )
        ]
        for d in row["docs"]:
            did = int(d["doc_id"])
            rec = build_warc_record(
                "response",
                {
                    "WARC-Target-URI": f"http://corpus.example/{row['source']}/{did}",
                    "WARC-Date": f"2026-01-{1 + did % 28:02d}T00:00:00Z",
                    "WARC-Record-ID": f"<urn:uuid:doc-{did}>",
                },
                d["text"].encode("utf-8"),
            )
            parts.append(gzip_member(rec))
        with open(
            _os.path.join(warc_dir, f"{row['source']}.warc.gz"), "wb"
        ) as f:
            f.write(b"".join(parts))
    _STAGE_CACHE[key] = warc_dir
    return warc_dir


@query(
    "scan_warc",
    """SELECT 'http://corpus.example/' || source || '/'
              || CAST(doc_id AS VARCHAR) AS url,
              '2026-01-' || CASE WHEN 1 + doc_id % 28 < 10 THEN '0' ELSE '' END
              || CAST(1 + doc_id % 28 AS VARCHAR) || 'T00:00:00Z' AS warc_date,
              text
       FROM documents""",
)
def q_scan_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC crawl-archive ingest (r14): the corpus staged as
    ``.warc.gz`` shards in the Common Crawl layout — one gzip member
    per record, a warcinfo record leading each file, documents as
    ``response`` records — parsed by the ISO 28500 reader
    (sources/archive.py::parse_warc_records: version line, header
    block, Content-Length-delimited payload that may itself contain
    record-boundary look-alikes, CRLF CRLF terminators) inside the
    same Arrow mapInPandas shape as the media decodes.  Non-response
    records are passed over, as a crawl reader must.  The oracle
    recomputes URI, date, and text from the base table — a member-
    boundary, header-parse, or payload-slicing bug breaks the hash.
    THE ingest path for web-crawl corpora at 100 TB: splittable by
    file, linear, no driver data path."""
    from hdfs_stream_processing_spark.sources.archive import scan_warc

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(_stage_warc_shards(spark, sf_dir))
    )
    payloads = files.select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.warc\.gz$", 1).alias("source"),
        F.col("content").alias("payload"),
    )
    return scan_warc(payloads, id_col="source", payload_col="payload")


def _stage_mixed_compressed_shards(spark: SparkSession, sf_dir: str) -> str:
    """Per-source line shards cycling the compression family by source
    number — gzip (multi-member), bzip2, xz — one directory, three
    formats, exactly the mess a real landing zone accumulates."""
    import bz2 as _bz2
    import lzma as _lzma
    import os as _os

    from hdfs_stream_processing_spark.sources.archive import gzip_member

    key = ("hsp_mixedcomp_staged_", sf_dir)
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    (documents,) = prep(spark, sf_dir, "documents")
    out_dir = _mkdtemp("hsp_mixedcomp_src_", sf_dir)
    shards = (
        documents.groupBy("source")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "text"))
            ).alias("docs")
        )
        .collect()
    )
    for row in shards:
        n = int(row["source"][3:])
        raw = "".join(
            f"{d['doc_id']}\t{d['text']}\n" for d in row["docs"]
        ).encode()
        fam = n % 3
        if fam == 0:
            half = len(raw) // 2
            blob, ext = gzip_member(raw[:half]) + gzip_member(raw[half:]), "gz"
        elif fam == 1:
            blob, ext = _bz2.compress(raw), "bz2"
        else:
            blob, ext = _lzma.compress(raw), "xz"
        with open(_os.path.join(out_dir, f"{row['source']}.txt.{ext}"), "wb") as f:
            f.write(blob)
    _STAGE_CACHE[key] = out_dir
    return out_dir


@query(
    "scan_compressed",
    "SELECT doc_id, text FROM documents",
)
def q_scan_compressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-compression line-shard ingest (r14): one landing dir
    whose shards are gzip (multi-member), bzip2, or xz BY FILE,
    resolved per payload by the magic-byte dispatch
    (sources/archive.py::decompress_payload — the compression mirror
    of the image codec dispatch, every branch decompression-bomb
    bounded).  The identity oracle proves every family round-trips
    losslessly through ONE plan; a dispatch or bound bug loses rows
    or raises.  At 100 TB nobody gets to assume a single compressor."""
    from hdfs_stream_processing_spark.sources.archive import (
        scan_compressed_text,
    )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt.{gz,bz2,xz}")
        .load(_stage_mixed_compressed_shards(spark, sf_dir))
    )
    payloads = files.select(
        F.regexp_extract(
            F.col("path"), r"([^/]+)\.txt\.(?:gz|bz2|xz)$", 1
        ).alias("source"),
        F.col("content").alias("payload"),
    )
    return scan_compressed_text(payloads, id_col="source", payload_col="payload")
