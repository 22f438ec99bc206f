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
# tools/check_correctness.py.  Round 8 window (VERDICT r7 #1): the 8
# registrations that landed after the r7 window froze (the driver has
# never seen them; all GATE_r07-green in both session modes) lead, so
# after this round the union of driver-green rows r2–r8 covers every
# oracled query in the registry; new round-8 registrations follow; the
# remainder is long-green §2-core padding to exactly 50.
# tests/test_registry.py pins len(_VERIFY_FIRST) == 50 so the
# off-by-one cannot recur.
_VERIFY_FIRST = [
    # the 8 never-driver-attested rows (GATE_r07-green, both modes):
    "incr_checksum", "stream_checksum", "late_profile",
    "rolling_actives", "stream_actives", "golden_record",
    "incr_golden", "stream_golden",
    # new round-8 registrations, inserted as they land:
    "chunk_dedup", "entropy_profile", "bigram_lm", "token_zipf",
    "incr_join", "incr_retract", "basket_rules", "rfm_segments",
    "hll_intersect", "minhash_recall", "winsorize_prices",
    "stream_retract", "attribution_linear", "cohort_ltv",
    "oov_rate", "stream_chunk_dedup",
    # long-green §2-core padding (driver-green r2–r5) to exactly 50:
    "multi_join", "scan_parquet", "scan_csv", "top_k", "group_agg",
    "count_rows", "count_distinct", "rollup_agg", "window_rank",
    "window_running", "parse_wire", "to_wire", "epoch_to_ts",
    "json_extract", "case_when", "limit_n", "drop_nulls", "add_lit",
    "project_exclude", "union_rooms", "sort_by_ts", "join_outer",
    "join_semi", "join_anti", "set_ops", "except_op",
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
