"""Element-wise MIN merge of gate-passing bench sweeps → BENCH_LAST.json.

The box carries recurring external bursts that land on different sweep
windows each run (documented since GATE_r09.md: disjoint victim sets
across gate-passing sweeps, every victim recovering to its floor when
re-run minutes later).  The only estimator robust to burst placement is
the element-wise MIN across sweeps — the plan-cost floor (VERDICT r10
#1 prescribes exactly this, the r9 construction).

Usage:
    python tools/bench_merge.py sweep1.json sweep2.json [...] \
        [--prev BENCH_prev.json] [--out BENCH_LAST.json]

Every input must be a full bench.py record whose sentinel gate passed —
a failed-gate sweep is refused (merging contaminated numbers would
poison the floor).  ``--prev`` (default: none) recomputes
``moved_vs_prev`` against that record's medians with bench.py's own
threshold, so the merged record documents its movement honestly.
"""

from __future__ import annotations

import argparse
import json
import sys

MOVER_PCT = 15.0  # same threshold bench.py uses for moved_vs_prev


def merge(records: list[dict]) -> dict:
    for i, r in enumerate(records):
        if r.get("sentinel_gate") != "pass":
            raise SystemExit(
                f"input #{i + 1} has sentinel_gate="
                f"{r.get('sentinel_gate')!r}; refusing to merge a "
                "contaminated sweep into the floor"
            )
    # never copy records[0] wholesale (ADVICE r11): single-sweep scalar
    # fields (sentinel_post, sentinel_mid_ratio, sentinel_prev,
    # last_written, moved_vs_prev, ...) would survive stale and the
    # metric string would misdescribe the element-wise-min semantics.
    _CARRY = ("unit", "sf", "cpus", "runs", "sf_dir")
    base = {k: records[0][k] for k in _CARRY if k in records[0]}
    base["metric"] = (
        "per-query element-wise min of medians across gate-passing sweeps"
    )
    all_q = set()
    for r in records:
        all_q.update(r["queries"])
    medians, mins, spread = {}, {}, {}
    for q in sorted(all_q):
        meds = [r["queries"][q] for r in records if q in r["queries"]]
        mns = [r.get("queries_min", {}).get(q) for r in records]
        mns = [m for m in mns if m is not None]
        mxs = [r.get("spread", {}).get(q, {}).get("max") for r in records]
        mxs = [m for m in mxs if m is not None]
        medians[q] = min(meds)
        mins[q] = min(mns) if mns else min(meds)
        spread[q] = {
            "min": mins[q],
            "max": max(mxs) if mxs else max(meds),
            "n_sweeps": len(meds),
        }
    base["queries"] = medians
    base["queries_min"] = mins
    base["spread"] = spread
    base["value"] = round(sum(medians.values()), 3)
    # sentinel provenance: quietest endpoints across the merged sweeps,
    # plus every sweep's own mid-probe trace for the audit trail
    base["sentinel_sec"] = min(r["sentinel_sec"] for r in records)
    base["sentinel_best"] = min(r.get("sentinel_best", r["sentinel_sec"]) for r in records)
    base["sentinel_ratio"] = round(base["sentinel_sec"] / base["sentinel_best"], 3)
    base["sentinel_mid"] = [r.get("sentinel_mid") for r in records]
    base["sentinel_mid_max"] = max(r.get("sentinel_mid_max", 0.0) for r in records)
    base["sentinel_gate"] = "pass"
    base["merged_from"] = [
        {
            "value": r["value"],
            "runs": r["runs"],
            "sentinel_mid_max": r.get("sentinel_mid_max"),
            "n_queries": len(r["queries"]),
        }
        for r in records
    ]
    base["merge_note"] = (
        f"element-wise min of {len(records)} gate-passing sweeps "
        "(plan-cost floor; VERDICT r10 #1 / r9 construction)"
    )
    return base


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sweeps", nargs="+")
    ap.add_argument("--prev", default=None)
    ap.add_argument("--out", default="BENCH_LAST.json")
    args = ap.parse_args()
    records = []
    for p in args.sweeps:
        with open(p) as f:
            records.append(json.load(f))
    merged = merge(records)
    if args.prev:
        with open(args.prev) as f:
            prev = json.load(f)
        # like-for-like (ADVICE r11): this record's queries are min
        # floors, so compare against the prev record's floors when it
        # has them (a merged prev) and note the asymmetry when prev is
        # a single-sweep median record.
        prev_is_floor = "queries_min" in prev or "merged_from" in prev
        pq = prev.get("queries", {})
        moved = {}
        for q, now in merged["queries"].items():
            old = pq.get(q)
            if old and old > 0:
                pct = (now - old) / old * 100.0
                if abs(pct) >= MOVER_PCT:
                    moved[q] = {"prev": old, "now": now, "pct": round(pct, 1)}
        merged["moved_vs_prev"] = moved
        merged["prev"] = {
            "metric": prev.get("metric"),
            "value": prev.get("value"),
            "n_queries": len(pq),
            "basis": "floor" if prev_is_floor else
                     "single-sweep median (floor-vs-median asymmetry: "
                     "movement biases toward 'improved')",
        }
    with open(args.out, "w") as f:
        json.dump(merged, f)
    common = [q for q in merged["queries"] if all(q in r["queries"] for r in records)]
    print(
        json.dumps(
            {
                "out": args.out,
                "n_queries": len(merged["queries"]),
                "value": merged["value"],
                "common_n": len(common),
                "common_sum": round(sum(merged["queries"][q] for q in common), 3),
                "n_movers": len(merged.get("moved_vs_prev", {})),
            }
        )
    )


if __name__ == "__main__":
    main()
