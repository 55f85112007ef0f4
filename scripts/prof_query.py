"""Profile declared queries: per-job/per-stage wall clock from the Spark
event log, in a fresh JVM per invocation.

Usage:
    python scripts/prof_query.py <query> [reps]

Runs the query ``reps`` times (default 2) through the noop sink exactly
like bench.py, with ``spark.eventLog`` enabled, then parses the event
log and prints, for the LAST rep (steady state):

- every job: duration, #stages, #tasks, first stage-info name
- every stage: duration, #tasks, shuffle read/write bytes, input bytes

This attributes a query's seconds to scheduling units — the sf0.1 bench
is overhead-dominated (tiny data), so "how many jobs/stages/tasks does
one rep cost" is the number optimization must shrink (guide §1.1).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="dslicer_eventlog_")

    import __spark_entry__ as entrymod
    from dataslicer_spark.session import get_spark

    spark = get_spark(
        f"prof_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    fn = entrymod.queries()[name]
    rep_marks: list[tuple[float, float]] = []
    for i in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        rep_marks.append((t0, time.time()))
        print(f"rep {i}: {rep_marks[-1][1] - t0:.2f}s", flush=True)
        spark.catalog.clearCache()
    sc = spark.sparkContext
    app_id = sc.applicationId
    spark.stop()

    # parse the event log (Spark may write compressed / suffixed names)
    import glob

    cands = glob.glob(os.path.join(log_dir, app_id + "*")) or glob.glob(
        os.path.join(log_dir, "*")
    )
    if not cands:
        raise FileNotFoundError(f"no event log under {log_dir}")
    path = cands[0]
    if os.path.isdir(path):  # Spark 4 rolling event log directory
        parts = sorted(glob.glob(os.path.join(path, "events*")))
        merged = os.path.join(log_dir, "merged_events.jsonl")
        with open(merged, "w") as out:
            for p in parts:
                with open(p) as f:
                    out.write(f.read())
        path = merged
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(path) as f:
        for line in f:
            ev = json.loads(line)
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"] / 1000.0,
                    "stages": ev.get("Stage IDs", []),
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:60],
                    "callsite": (ev.get("Properties") or {}).get(
                        "callSite.short", ""
                    ),
                }
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"] / 1000.0
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                t0 = si.get("Submission Time")
                t1 = si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", "")[:70],
                    "dur": (t1 - t0) / 1000.0 if t0 and t1 else None,
                    "tasks": si.get("Number of Tasks"),
                    "t0": t0 / 1000.0 if t0 else None,
                }

    last0, last1 = rep_marks[-1]
    print(f"\n=== rep {reps - 1} ({last1 - last0:.2f}s wall) ===")
    tot = 0.0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j or j["t1"] < last0 or j["t0"] > last1:
            continue
        dur = j["t1"] - j["t0"]
        tot += dur
        jst = [stages[s] for s in j["stages"] if s in stages]
        stage_txt = "; ".join(
            f"s{sid}:{stages[sid]['dur']:.2f}s/{stages[sid]['tasks']}t"
            for sid in j["stages"]
            if sid in stages and stages[sid]["dur"] is not None
        )
        names = {s["name"] for s in jst}
        print(
            f"job {jid}: {dur:6.2f}s  stages[{len(j['stages'])}] "
            f"{stage_txt}  | {j['desc'] or j['callsite']} "
            f"| {sorted(names)[:2]}"
        )
    print(f"sum of job durations: {tot:.2f}s (gaps = driver-side work)")


if __name__ == "__main__":
    main()
