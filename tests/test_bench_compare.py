"""bench.py round-over-round compare (VERDICT r5 #4): the moved_vs_prev
path must provably engage.  Root cause of r5's empty dict: the driver's
BENCH_r{N}.json is a wrapper {n, rc, tail, parsed} whose tail keeps only
the last 2000 stdout chars — bench.py's full JSON line (with
queries_min) never survives, so the old top-level lookup compared
against nothing."""

import json
import os

from bench import _latest_bench, compare_to_prev, extract_prev_mins

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_mins_recovered_from_real_driver_r5_file():
    """The actual BENCH_r05.json on disk: full line truncated, but the
    spread fragments in the tail still yield real per-query mins, and
    an injected regression against them flags."""
    with open(os.path.join(HERE, "BENCH_r05.json")) as f:
        prev = json.load(f)
    mins = extract_prev_mins(prev)
    assert len(mins) >= 10, mins  # the surviving tail fragment
    assert all(v > 0 for v in mins.values())
    name = sorted(mins)[0]
    moved = compare_to_prev({name: mins[name] * 2.0}, prev)
    assert moved[name]["pct"] == 100.0 and moved[name]["prev"] == mins[name]


def test_raw_bench_shapes():
    """bench.py's own output shape (BENCH_LAST.json) and the r1-r3
    legacy shape (mins under "queries") both compare directly."""
    prev = {"queries_min": {"q": 1.0}, "queries": {"q": 5.0}}
    assert compare_to_prev({"q": 1.2}, prev) == {
        "q": {"prev": 1.0, "now": 1.2, "pct": 20.0}
    }
    assert compare_to_prev({"q": 0.5}, {"queries": {"q": 1.0}})["q"]["pct"] == -50.0
    # a 5% wiggle does not flag
    assert compare_to_prev({"q": 1.05}, prev) == {}


def test_r4_wrapper_without_fragments_yields_empty_not_medians():
    """An r4-style wrapper whose tail lost everything and whose parsed
    summary carries top-5 MEDIANS must NOT be treated as mins."""
    wrapper = {
        "tail": "no json here",
        "parsed": {"runs": 7, "queries": {"q": 9.9}},
    }
    assert extract_prev_mins(wrapper) == {}
    assert compare_to_prev({"q": 1.0}, wrapper) == {}


def test_degenerate_prev_yields_empty_not_crash():
    assert compare_to_prev({"q": 1.0}, {}) == {}
    assert compare_to_prev({"q": 1.0}, {"queries_min": {"q": 0.0}}) == {}
    assert compare_to_prev({}, {"queries_min": {"q": 1.0}}) == {}


def test_latest_bench_prefers_full_fidelity_record():
    """BENCH_LAST.json (if present) or the newest driver file must
    resolve, and its extracted mins must be non-empty so the next
    round's compare is non-degenerate."""
    name, data = _latest_bench()
    assert name.endswith(".json")
    assert extract_prev_mins(data), name


def test_sentinel_flags_contamination_and_passes_quiet():
    """VERDICT r6 #3: the machine-contention sentinel must flag a
    loaded box (ratio drift >15%) and stay quiet within noise, and be
    absent when no previous sentinel exists (first run / old shapes)."""
    from bench import sentinel_verdict

    hot = sentinel_verdict(2.0, {"sentinel_sec": 1.0})
    assert hot["machine_contended"] is True and hot["sentinel_ratio"] == 2.0
    quiet = sentinel_verdict(1.05, {"sentinel_sec": 1.0})
    assert quiet["machine_contended"] is False
    first = sentinel_verdict(1.0, {})
    assert first == {"sentinel_sec": 1.0}
