"""sf1 scale probe for the slowest four queries (VERDICT r5 #8).

The driver ships sf0.001/0.01/0.1; the ≤3.8× factors SCALE.md records
at sf0.1 are still overhead-dominated, so this tool synthesizes one
more decade — sf1 = 10 disjoint copies of the sf0.1 ``events`` and
``documents`` tables — and re-times the four most expensive queries on
it.  Copies get shifted ids (disjoint users/events/docs) and a per-copy
token prefix on document text, so per-copy duplicate structure is
preserved while nothing collides across copies: key cardinality, dup
clusters, and join fan-outs all scale ×10 like real growth would.

Appends an "sf1 probe" section to SCALE.md.

Usage: python tools/scale_sf1.py [n_runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hdfs_stream_processing_spark import get_spark
from hdfs_stream_processing_spark import queries as Q

SRC = "/root/testdata/sf0.1"
SF1_DIR = "/root/repo/.tmp/scale_sf1"  # .tmp/ is gitignored
# Everything in SCALE.md below this marker is hand-written and preserved
# verbatim by the generators (scale_probe.py keeps the whole tail from the
# first "## " heading; this tool keeps the tail from this marker).
END_MARKER = (
    "<!-- scale_sf1:end — generators replace only their own section; "
    "everything below is hand-written and MUST be preserved -->"
)
SLOW = [
    "dedup_clusters", "continuous_rollup", "stream_stream_join", "curate_corpus",
    # round-6 additions whose plans have a scale story worth probing:
    # iterative/banded (dedup_near_incr), key-shuffle window merges
    # (scd2_merge, pit_join), two-sided stream state (stream_join_outer),
    # corpus anti-join (incr_dedup), shard prefix sums (seq_pack)
    "dedup_near_incr", "scd2_merge", "pit_join", "stream_join_outer",
    "incr_dedup", "seq_pack",
    # late round-6: iterative rank, sketches, DSS join shapes, streaming
    # SCD2 — all fact-table-driven, so the ×10 synthesis covers them
    "pagerank", "hll_registers", "cms_topk", "late_ship_priority",
    "waiting_suppliers", "stream_scd2", "kmeans_refine",
    # final round-6 batch: prefix-filtered similarity join, frontier
    # BFS over the ×10 trade graph, corpus-wide vocab build + id map,
    # user-window attribution
    "jaccard_join", "bfs_reach", "vocab_ids", "attribution",
    # round-7 additions (VERDICT r6 #6): broadcast-probe purge cascade,
    # single-pass correlation matrix, streaming-maintained vocab ids,
    # per-group 128-bit OLS accumulators (built for the sf100-per-group
    # regime — show one decade of it), IVF recall probe over the ×10
    # embedding corpus
    "purge_keys", "corr_matrix", "stream_vocab", "regr_by_group",
    "ann_recall",
    # round-7 capability additions with a scale story: asymmetric
    # prefix-filtered containment, the two wedge-close graph metrics on
    # the top-5-partner kNN graph (the density cap — the RAW co-supply
    # projection is complete at sf0.1 and OOMs wedge enumeration at
    # sf1; degree ≤ 2k by construction makes wedges linear in nodes),
    # corpus-wide tf-idf, the K-lag EWMA window, and the chunked
    # prefix-scan lateness profile
    "containment_join", "triangle_count", "cluster_coeff",
    "tfidf_terms", "ewma_smooth", "late_profile",
    # late round-7: sweep-line peak concurrency (day-net agg is
    # calendar-bounded — the window never sees data-sized partitions),
    # hybrid RRF (the vector branch scans the ×10 corpus; fusion layer
    # is list-sized), unigram LM scoring (×10 token explode against the
    # bounded copy-0 corpus model), PSI drift cells (×10 events into 10
    # fixed bins), policy-based dedup survivors (per-copy component
    # graphs), dense calendar rollup (spine is calendar-bounded)
    "interval_peak", "hybrid_rrf", "lm_score", "psi_drift",
    "dedup_keep_quality", "calendar_rollup",
    # incremental golden maintenance: the delta graph and vote tables
    # are batch-bounded; corpus touched by band join + member semi-join
    "incr_golden",
    # round-8 (VERDICT r7 #4): batch golden-record (band join + component
    # windows over the clustered subset), stream-maintained golden table
    # (crash-safe foreachBatch over doc micro-batches), and the executed
    # purge cascade (staged rewrite → atomic swap → re-audit; write-heavy
    # by design so the factor measures rewrite volume, not plan blowup)
    "golden_record", "stream_golden", "purge_exec",
    # round-8 additions with a scale story: cross-doc boilerplate
    # chunks (content-key join, ×10 corpus both sides), bigram LM (×10
    # bigram explode against the bounded copy-0 model), basket pairs
    # (basket-keyed self-join, Σ C(k,2) work), delta-join maintenance
    # (batch-sized deltas against a ×10 materialized view)
    "chunk_dedup", "bigram_lm", "basket_rules", "incr_join",
    # late round-8: full-LSH recall contract (truth join + 16-hash
    # banding over the ×10 sample), order-statistic winsorization
    # (rank window per group), streaming retraction rollup and
    # streaming chunk-frequency maintenance (batch-bounded per-batch
    # work against ×10 micro-batch volume)
    "minhash_recall", "winsorize_prices", "stream_retract",
    "stream_chunk_dedup",
    # round-11 second wave: k-core peel over the ×10 trade graph (per
    # round: degree agg + two semi-joins, edge list only shrinks) and
    # streaming substring-dedup maintenance (×10 window volume through
    # the replay-guarded doc-frequency rollup + per-doc island merge)
    "kcore", "stream_substring_dedup",
    # round 12: LPA over the ×10 trade graph (per round: edge↔label
    # join + vote agg + per-node rank window) and the streaming
    # substring-scrub ACTION (×10 window volume through the mixed-merge
    # sum+min rollup, then the corpus rewrite against the maintained
    # table).  The perceptual-dedup queries are SOURCE-bound fixtures
    # (one image/clip per source; sf1 keeps the same 20 sources), so a
    # document-copy probe cannot exercise them — their scale arguments
    # are the probe-band equi-join shape (PLANS: no cartesian) and the
    # per-file decode cost, both linear by construction.
    "communities", "stream_substring_scrub",
    # round 13: streaming LPA twin — the ×10 trade-edge stream through
    # the replay-guarded maintained edge list, then the same
    # bounded-round LPA read as `communities` (stream_audio_dedup and
    # the other perceptual queries stay SOURCE-bound; their scale
    # measurement is tools/scale_percep.py's candidate-volume probe)
    "stream_communities",
]
COPIES = 10

# Persistent per-query footnotes: documented output-growth causes that
# must survive regeneration (VERDICT r6 — "keep the footnote honest").
FOOTNOTES = {
    "minhash_recall": (
        "† minhash_recall's sf1 TRUE-PAIR set is ~30× the sf0.1 set (46.3k →\n"
        "~1.39M pairs — the identical sample, threshold, and shingle\n"
        "definition as jaccard_join, whose 30× output growth is documented\n"
        "above: cross-copy clones are genuine ≥8/9 near-dups, so clone\n"
        "groups merge and the truth set grows quadratically in group size).\n"
        "The LSH candidate join grows the same way (clone groups share\n"
        "bands).  31.5× time at ~30× true work is flat per-pair — the\n"
        "growth is the answer being measured, not the algorithm."
    ),
    "winsorize_prices": (
        "† winsorize_prices groups by l_returnflag (3 groups), so the rank\n"
        "window runs 3 data-sized partitions; 4.2× at ×10 rows is the\n"
        "sort's n·log n plus fixed overhead.  Real deployments winsorize\n"
        "within finer groups (or pre-aggregate value histograms); the\n"
        "operator itself shuffles only on the group key."
    ),
    "jaccard_join": (
        "† jaccard_join's sf1 OUTPUT is 30× the sf0.1 output (46.3k → 1.39M\n"
        "pairs): the single per-copy prefix token leaves unigram shingles shared\n"
        "across copies, so cross-copy clones are genuine ≥8/9 near-dups and the\n"
        "true pair count grows super-linearly with the clone-group sizes.  Time\n"
        "per emitted pair FALLS 2.8× — the prefix-filter join itself scales\n"
        "sub-linearly; the growth is the answer, not the algorithm."
    ),
    "dedup_near_incr": (
        "† dedup_near_incr's sf1 duplicate graph has 656k edges — 123× the\n"
        "sf0.1 graph (5.3k), not 10×: cross-copy clones are genuine near-dups\n"
        "(one copy-token of difference), so clone groups MERGE across copies\n"
        "and the true edge count grows super-linearly, same mechanism as\n"
        "jaccard_join's output growth.  656k > the 500k driver_max_edges\n"
        "guard, so sf1 takes the DISTRIBUTED star-contraction loop (sf0.1\n"
        "takes the driver union-find) — measured crossover: at 656k edges the\n"
        "distributed path runs the query in 20.3 s vs 33.5 s if forced onto\n"
        "the driver, i.e. the guard's fallback is graceful and the cap sits\n"
        "on the correct side of the crossover.  4.4× time at 123× edges is\n"
        "strongly sub-linear in the true work."
    ),
    "containment_join": (
        "† containment_join's sf1 OUTPUT is 9.4× the sf0.1 output (136.6k →\n"
        "1.29M pairs): the probe side (doc_id > 250, %5 = 0) grows 10.5× with\n"
        "the corpus while the index side (doc_id ≤ 250) is a FIXED 251 docs —\n"
        "so the true containment pair count scales with the probe, and each\n"
        "copy's clones against the shared copy-0 index are genuine ≥80%\n"
        "containments.  Time factor 7.7× is BELOW the 9.4× output factor:\n"
        "time per emitted pair falls; nothing in the prefix-filter plan is\n"
        "super-linear."
    ),
    "dedup_keep_quality": (
        "† dedup_keep_quality's sf1 LSH pair set is 101× the sf0.1 set\n"
        "(measured r14: 43,647 → 4,395,073 candidate pairs; clustered docs\n"
        "4,789 → 50,000) — the same cross-copy clone-group merging\n"
        "documented for dedup_near_incr/jaccard_join: the copy token is one\n"
        "shingle among many, so cross-copy clones are genuine near-dups and\n"
        "pair counts grow quadratically in clone-group size.  6.5× time at\n"
        "101× pair work is strongly sub-linear in the true work; the\n"
        "survivor windows run over the clustered subset only."
    ),
    "golden_record": (
        "† golden_record shares dedup_keep_quality's pair head — the same\n"
        "measured 101× LSH pair growth (43,647 → 4,395,073) drives it, and\n"
        "the three per-attribute vote aggregates run over the clustered\n"
        "subset (4,789 → 50,000 docs, 10.4×).  6.0× time at 101× pair work\n"
        "is strongly sub-linear in the true work."
    ),
    "kcore": (
        "† kcore's trade-edge list grows exactly ×10 (measured r14:\n"
        "586,871 → 5,868,710 distinct customer–supplier pairs; per-copy\n"
        "graph structure identical by construction, so peel rounds and\n"
        "survivor ratios are unchanged).  6.9× time at exactly 10× edges is\n"
        "sub-linear — the peel is simply compute-bound (3 rounds × degree\n"
        "aggregate + two semi-joins over a data-sized edge list) rather\n"
        "than overhead-bound like the ~1–3× rows; nothing super-linear."
    ),
}


def build_sf1(spark) -> None:
    if all(
        os.path.exists(os.path.join(SF1_DIR, f"{t}.parquet", "_SUCCESS"))
        for t in (
            "documents", "events", "lineitem", "orders", "customer",
            "supplier", "embeddings", "nation", "region",
        )
    ):
        return
    copies = spark.range(COPIES).select(F.col("id").cast("int").alias("_copy"))

    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    ev1 = ev.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") + F.col("_copy").cast("long") * 1_000_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_copy").cast("long") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    ev1.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "events.parquet")
    )

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    docs1 = docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("_copy").cast("long") * 1_000_000).alias("doc_id"),
        # the prefix token keeps each copy's shingle sets disjoint from
        # every other copy's: dup clusters replicate within copies, never
        # merge across them
        F.concat(F.lit("copytok"), F.col("_copy").cast("string"), F.lit(" "), F.col("text")).alias("text"),
        "lang",
        "source",
        (F.length(F.col("text")) + 9).alias("n_chars"),
    )
    docs1.repartition(16).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "documents.parquet")
    )

    # TPC-H facts + their dims, id-shifted per copy (orderkey/custkey/
    # suppkey/partkey all disjoint across copies — join fan-outs and the
    # trade-graph node count scale ×10 like real growth); embeddings get
    # shifted vec_ids (same vectors: ANN cost scales with corpus size).
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    li1 = li.crossJoin(F.broadcast(copies)).select(
        (F.col("l_orderkey") + F.col("_copy").cast("long") * 100_000_000).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("_copy").cast("long") * 10_000_000).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("_copy").cast("long") * 1_000_000).alias("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    )
    li1.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "lineitem.parquet")
    )
    od = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    od1 = od.crossJoin(F.broadcast(copies)).select(
        (F.col("o_orderkey") + F.col("_copy").cast("long") * 100_000_000).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("_copy").cast("long") * 1_000_000).alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    )
    od1.repartition(16).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "orders.parquet")
    )
    for t, key in (("customer", "c_custkey"), ("supplier", "s_suppkey")):
        d = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        d1 = d.crossJoin(F.broadcast(copies)).select(
            (F.col(key) + F.col("_copy").cast("long") * 1_000_000).alias(key),
            *[c for c in d.columns if c != key],
        )
        d1.repartition(4).write.mode("overwrite").parquet(
            os.path.join(SF1_DIR, f"{t}.parquet")
        )
    # nation/region are TRUE dims (customer keeps c_nationkey per copy,
    # so nations don't multiply with data volume — copy them verbatim)
    for t in ("nation", "region"):
        spark.read.parquet(os.path.join(SRC, f"{t}.parquet")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(SF1_DIR, f"{t}.parquet"))
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    emb1 = emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") + F.col("_copy").cast("long") * 1_000_000).alias("vec_id"),
        "embedding", "label",
    )
    emb1.repartition(16).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "embeddings.parquet")
    )


def _existing_rows() -> dict:
    """Parse rows already in SCALE.md's sf1 section so a partial probe
    (``--only``) merges into the table instead of truncating it."""
    out = {}
    try:
        with open("/root/repo/SCALE.md") as f:
            text = f.read()
    except OSError:
        return out
    marker = "\n## sf1 probe"
    if marker not in text:
        return out
    for line in text[text.index(marker):].splitlines():
        parts = [p.strip() for p in line.strip().strip("|").split("|")]
        if len(parts) == 4 and parts[0] in Q.QUERIES:
            try:
                out[parts[0]] = (
                    parts[0], float(parts[1]), float(parts[2]),
                    float(parts[3].rstrip("×†x")),
                )
            except ValueError:
                pass
    return out


def rewrite_scale_md(text: str, section_lines: list) -> str:
    """Replace ONLY this tool's "## sf1 probe" section in SCALE.md.

    Everything from END_MARKER (or, for pre-marker files, from the first
    "## Round-" heading after the sf1 section) to EOF is hand-written
    evidence and MUST survive regeneration — commit 3d1f4e1 clobbered it
    once (VERDICT r13 #1)."""
    marker = "\n## sf1 probe"
    tail = ""
    if END_MARKER in text:
        tail = text[text.index(END_MARKER):]
    if marker in text:
        rest = text[text.index(marker):]
        if END_MARKER not in text:
            import re as _re
            m = _re.search(r"\n## Round-", rest)
            if m:
                tail = END_MARKER + "\n" + rest[m.start():]
        text = text[: text.index(marker)]
    if not tail:
        tail = END_MARKER + "\n"
    return (
        text.rstrip("\n") + "\n" + "\n".join(section_lines) + "\n\n"
        + tail.rstrip("\n") + "\n"
    )


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--only")]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    n_runs = int(argv[0]) if argv else 3
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)

    prior = _existing_rows()
    rows = []
    for name in SLOW:
        if only is not None and name not in only:
            if name in prior:
                rows.append(prior[name])
            continue
        best = {}
        for sf_dir, label in ((SRC, "sf0.1"), (SF1_DIR, "sf1")):
            b = float("inf")
            for _ in range(n_runs):
                t0 = time.time()
                Q.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                b = min(b, time.time() - t0)
            best[label] = b
        factor = best["sf1"] / best["sf0.1"]
        rows.append((name, best["sf0.1"], best["sf1"], factor))
        print(name, {k: round(v, 2) for k, v in best.items()}, f"{factor:.1f}x", flush=True)

    lines = [
        "",
        "## sf1 probe (synthetic 10× sf0.1; tools/scale_sf1.py, best of "
        f"{n_runs})",
        "",
        "sf1 = 10 id-shifted copies of the sf0.1 events/documents tables",
        "(disjoint keys and shingles per copy — cardinalities scale ×10).",
        "Data grows 10×; a factor ≤ 10 at this size means the plan holds",
        "one more decade: nothing super-linear.",
        "",
        "| query | sf0.1 s | sf1 s | sf0.1→sf1 factor |",
        "|---|---|---|---|",
    ]
    for name, a, b, f_ in rows:
        mark = "†" if name in FOOTNOTES else ""
        lines.append(f"| {name} | {a:.3f} | {b:.3f} | {f_:.1f}×{mark} |")
    for name, note in FOOTNOTES.items():
        if any(r[0] == name for r in rows):
            lines.extend(["", note])
    out = "/root/repo/SCALE.md"
    with open(out) as f:
        text = f.read()
    with open(out, "w") as f:
        f.write(rewrite_scale_md(text, lines))
    print(f"updated {out}")


if __name__ == "__main__":
    main()
