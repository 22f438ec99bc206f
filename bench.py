"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes through the noop sink (full plan execution, no
driver-side pandas conversion) after a shared session warm-up.

Trustworthiness (VERDICT r3 #5): each query runs ``$SPARK_GRAFT_BENCH_RUNS``
times (default 7).  ``queries`` reports the per-query MEDIAN — the canonical
number from round 4 on; ``queries_min`` keeps the best run (the semantics
rounds 1-3 reported), ``spread`` carries min/max, and ``moved_vs_prev``
auto-flags queries whose best run moved >15% against the most recent
``BENCH_r*.json`` (min-vs-min, like for like) so a real regression can't
hide behind sub-second scheduling noise again.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hdfs_stream_processing_spark import get_spark
from hdfs_stream_processing_spark import queries as Q

#: The queries that represent the engine: reference semantics (join,
#: agg, window, sort, wire, streaming) + LLM-data ops (dedup, similarity,
#: text).  Trivial identity scans are left out — they time parquet IO,
#: not the engine.
HEADLINE = [
    "multi_join",
    "group_agg",
    "rollup_agg",
    "count_distinct",
    "window_rank",
    "window_running",
    "sort_by_ts",
    "top_k",
    "union_rooms",
    "parse_wire",
    "json_extract",
    "text_stats",
    "doc_fingerprint",
    "text_ngram",
    "dedup_exact",
    "dedup_near",
    "simhash",
    "similarity_topk",
    "similarity_lsh",
    "multimodal_meta",
    "stream_ingest",
    "stream_window_agg",
    "align_pipeline",
    "session_agg",
    "time_rollup",
    "salted_agg",
    "text_search",
    "similarity_topk_np",
    "asof_join",
    "range_join",
    "pivot_wide",
    "percentiles",
    "stream_wire_ingest",
    "stream_stream_join",
    "sample_hash",
    "ngram_jaccard",   # shared-shingle join behind the df-cutoff (r3)
    "ivf_assign",      # literal-centroid codegen argmax, zero shuffle (r3)
    # round 4 additions — one per newly-evidenced engine path:
    "similarity_lsh_multiprobe",  # query-side probe fan-out (r4 oracle)
    "zorder_key",                 # Morton bit-interleave, pure codegen
    "dedup_clusters",             # iterative min-label propagation
    "cube_agg",                   # Expand-based multi-grouping
    "minmax_by",                  # struct-ordered max_by/min_by
    "approx_distinct_ok",         # HLL + exact side by side
    # round 4 LLM corpus-curation suite (operators/llmdata.py):
    "doc_chunk",                  # context-window packing, zero shuffle
    "decontaminate",              # broadcast benchmark n-gram probe
    "shard_assign",               # global training-order shuffle
    "repetition_stats",           # chained hash aggs over n-grams
    "curate_corpus",              # the whole curation funnel, one plan
    "stream_curate",              # same curation ops on the stream
    "gapfill_locf",               # dense spine + IGNORE NULLS carry
    # round 5: fold in the analytics/statistics suite (VERDICT r4 #8)
    "sessionize",                 # gaps-and-islands session derivation
    "funnel",                     # ordered-step conversion funnel
    "retention",                  # cohort retention matrix (3 shuffles)
    "anomaly_zscore",             # trailing-window z-score
    "gapfill_interp",             # linear interpolation across gaps
    "continuous_rollup",          # foreachBatch additive-merge rollup
    "large_orders",               # TPC-H Q18 shape: agg→HAVING→join back
    "heavy_hitters",              # exact top-k frequent per group
    "ntile_buckets",              # per-type NTILE deciles
    "corr_qty_price",             # Pearson r from exact integer sums
    "funnel_lag",                 # p50/p90 time-to-convert per transition
    "stream_sessionize",          # session_window state across batches
]


def _latest_bench() -> tuple[str, dict] | None:
    """Most recent BENCH_r{N}.json next to this file, if any."""
    here = os.path.dirname(os.path.abspath(__file__))
    best_n, best = -1, None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best_n, best = int(m.group(1)), p
    if best is None:
        return None
    try:
        with open(best) as f:
            return os.path.basename(best), json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "7")))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="hsp-bench", cpus=cpus)
    # warm up: JVM, codegen, parquet footers/file index for every table —
    # so timings measure query execution, not first-touch IO metadata
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from hdfs_stream_processing_spark.sources.io import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    medians: dict[str, float] = {}
    mins: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        medians[name] = round(statistics.median(runs), 3)
        mins[name] = round(min(runs), 3)
        spread[name] = {"min": round(min(runs), 3), "max": round(max(runs), 3)}

    # >15% round-over-round moves, best-vs-best (rounds 1-3 reported min)
    moved: dict[str, dict[str, float]] = {}
    prev = _latest_bench()
    if prev is not None:
        prev_name, prev_data = prev
        # r4+ files carry mins under "queries_min" ("queries" moved to
        # medians); r1-r3 files reported mins under "queries".  Prefer
        # the former so the compare stays best-vs-best either way.
        prev_mins = prev_data.get("queries_min") or prev_data.get("queries", {})
        for name, now in mins.items():
            old = prev_mins.get(name)
            if old and old > 0 and abs(now - old) / old > 0.15:
                moved[name] = {
                    "prev": old,
                    "now": now,
                    "pct": round(100.0 * (now - old) / old, 1),
                }

    total = round(sum(medians.values()), 3)
    out = {
        "metric": "headline-query wall-clock (noop sink), sum of per-query medians",
        "value": total,
        "unit": "sec",
        "queries": medians,
        "sf": sf,
        "cpus": int(cpus),
        "runs": n_runs,
        "queries_min": mins,
        "spread": spread,
    }
    if prev is not None:
        out["moved_vs_prev"] = moved
        out["prev"] = prev[0]
    print(json.dumps(out))
    # The full line above can exceed the driver's tail-capture buffer as
    # the suite grows (r4 lost its headline total to truncation).  Emit a
    # short LAST line so the summary always survives: total, size, the 5
    # slowest queries, and the regression flags.
    top5 = dict(sorted(medians.items(), key=lambda kv: -kv[1])[:5])
    summary = {
        "metric": out["metric"],
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(medians),
        "runs": n_runs,
        "queries": top5,
        "queries_note": "top-5 slowest medians only; full per-query dict on the previous line",
        "moved_vs_prev": moved,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
