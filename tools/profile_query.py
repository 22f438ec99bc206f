"""Per-job wall-clock profile of one query (guide §1: measure first).

Usage: python tools/profile_query.py <query> [sf_dir] [--runs N]

Runs the query once unrecorded (codegen + fixture staging warm-up),
then ``--runs`` recorded noop-sink executions with the Spark event log
enabled, and prints per-job timings (description, duration) aggregated
across the recorded runs, slowest first — the local-mode stand-in for
the Spark UI's job/stage timeline.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
        args = [a for a in args if a != str(runs)]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    log_dir = tempfile.mkdtemp(prefix="hsp_eventlog_")
    from hdfs_stream_processing_spark import get_spark
    from hdfs_stream_processing_spark import queries as Q

    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = Q.QUERIES[name]
    # warm-up: fixture staging + codegen
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    wall = []
    for _ in range(runs):
        r0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall.append(time.time() - r0)
    t1 = time.time()
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: jobs submitted within [t0, t1]
    jobs = {}
    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        cands = [os.path.join(log_dir, f) for f in os.listdir(log_dir)]
        path = max(cands, key=os.path.getmtime)
    if os.path.isdir(path):  # Spark 4 rolling event log: a directory
        lines = []
        for f in sorted(os.listdir(path)):
            fp = os.path.join(path, f)
            if os.path.isfile(fp) and "events" in f:
                with open(fp) as fh:
                    lines.extend(fh)
    else:
        with open(path) as fh:
            lines = list(fh)
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                ts = ev["Submission Time"] / 1000.0
                if t0 <= ts <= t1:
                    props = ev.get("Properties", {})
                    desc = props.get("callSite.short", "") or props.get(
                        "spark.job.description", ""
                    )
                    jobs[ev["Job ID"]] = {"start": ts, "desc": desc[:100]}
            elif et == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["dur"] = ev["Completion Time"] / 1000.0 - j["start"]

    done = [(j.get("dur", 0.0), jid, j["desc"]) for jid, j in jobs.items()]
    total_job = sum(d for d, _, _ in done)
    print(f"query={name} runs={runs} wall={[round(w,3) for w in wall]}")
    print(f"jobs recorded: {len(done)}  sum(job dur)={total_job:.3f}s  "
          f"(wall total {t1-t0:.3f}s; gap = driver/scheduling time)")
    agg: dict[str, list[float]] = {}
    for d, _, desc in done:
        agg.setdefault(desc, []).append(d)
    rows = sorted(
        ((sum(v), len(v), k) for k, v in agg.items()), reverse=True
    )
    for tot, n, desc in rows[:40]:
        print(f"{tot:8.3f}s  n={n:<4d} {desc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
