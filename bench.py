"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the ``noop`` sink — full computation,
no driver-side collection, mirroring a cluster write.

Isolation: queries run in prefix-grouped FAMILIES, one fresh JVM
subprocess per family.  A single 128-query session saturates HotSpot's
code cache and accumulates GC/broadcast state, inflating cheap queries
~4x over their isolated cost (measured round 4: p1 1.07s in-suite vs
0.26s isolated) — the number stops describing the query.  Family
subprocesses bound that state to ~a dozen plans each; session startup is
NOT counted in query timings.

Per-query timing: adaptive reps to a JIT plateau.  Every query runs
twice (caches cleared between runs, data always recomputed); queries
still improving run-to-run get extra reps (cap 6) until the last two
runs agree within 10%.  The reported number is the min — per-plan JIT
compile cost that amortizes away on a long-lived cluster executor, while
each rep still recomputes all data.  (The flagship astro DAG compiles
~25s of generated code on a cold JVM and then runs in ~6.5s; min-of-2
would report the compiler, not the query.)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_HERE = os.path.dirname(os.path.abspath(__file__))

# Family packing: queries grouped by name prefix (same module/fixture →
# shared scan + similar plan shapes), groups merged/split into chunks of
# at most MAX_FAMILY queries. The astro flagship always gets its own JVM:
# its ~40-operator DAG is the code-cache heavyweight.
MAX_FAMILY = 14


def _family_key(name: str) -> str:
    if name.startswith("astro"):
        return "astro"
    m = re.match(r"([a-z]+)", name)
    return m.group(1) if m else name


def _pack_families(names: list[str]) -> list[list[str]]:
    """Deterministic packing: registry order preserved inside groups,
    groups >MAX_FAMILY split, consecutive small groups coalesced."""
    groups: list[tuple[str, list[str]]] = []
    for n in names:
        k = _family_key(n)
        if groups and groups[-1][0] == k:
            groups[-1][1].append(n)
        else:
            groups.append((k, [n]))
    # split oversized groups
    chunks: list[list[str]] = []
    for k, g in groups:
        if k == "astro":
            chunks.append(g)
            continue
        for i in range(0, len(g), MAX_FAMILY):
            chunks.append(g[i : i + MAX_FAMILY])
    # coalesce consecutive small chunks (never across the astro chunk)
    packed: list[list[str]] = []
    for c in chunks:
        if (
            packed
            and not c[0].startswith("astro")
            and not packed[-1][0].startswith("astro")
            and len(packed[-1]) + len(c) <= MAX_FAMILY
        ):
            packed[-1].extend(c)
        else:
            packed.append(list(c))
    return packed


def _time_query(spark, fn, sf_dir: str) -> float:
    """Adaptive-rep timing of one query; returns the plateau minimum."""
    runs: list[float] = []

    def one() -> None:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        # drop DataFrames cached inside operators so runs and queries are
        # timed independently (data is recomputed every rep)
        spark.catalog.clearCache()

    one()
    one()
    # keep repping while the query is expensive AND hasn't plateaued:
    # last two runs differing >10% means JIT/GC is still settling
    cap = 6 if min(runs) > 3.0 else 3
    while (
        len(runs) < cap
        and min(runs) > 1.0
        and abs(runs[-1] - runs[-2]) / max(runs[-2], 1e-9) > 0.10
    ):
        one()
    return min(runs)


def child_main(names: list[str]) -> None:
    """Run one family in this process; print a JSON timing map."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from dataslicer_spark.session import get_spark

    spark = get_spark("bench")
    # JVM/codegen warmup so the first measured query doesn't absorb ~6s
    # of session initialization cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    registry = entrymod.queries()
    timings: dict[str, float] = {}
    for name in names:
        try:
            timings[name] = _time_query(spark, registry[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
            spark.catalog.clearCache()
    print("BENCH_CHILD_JSON:" + json.dumps(timings), flush=True)


def _write_diff(timings: dict[str, float], sf: float | None) -> None:
    """Persist this run and a regression diff vs the previous run."""
    local_path = os.path.join(_HERE, "BENCH_LOCAL.json")
    prev: dict[str, float] = {}
    try:
        with open(local_path) as f:
            prev = json.load(f).get("queries", {})
    except (OSError, json.JSONDecodeError):
        pass
    with open(local_path, "w") as f:
        json.dump({"sf": sf, "queries": timings}, f, indent=1, sort_keys=True)
    if not prev:
        return
    lines = [
        "# BENCH diff — current run vs previous BENCH_LOCAL.json",
        "",
        f"Queries: {len(timings)} now / {len(prev)} before. "
        "Flagging |log-ratio| >= 1.3x with prior >= 0.2s.",
        "",
        "| query | before (s) | now (s) | ratio |",
        "|---|---|---|---|",
    ]
    flagged = []
    for name, now in sorted(timings.items()):
        was = prev.get(name)
        if was is None or was <= 0 or now <= 0:
            continue
        ratio = now / was
        if (ratio >= 1.3 or ratio <= 1 / 1.3) and max(was, now) >= 0.2:
            flagged.append((ratio, name, was, now))
    for ratio, name, was, now in sorted(flagged, reverse=True):
        lines.append(f"| {name} | {was:.2f} | {now:.2f} | {ratio:.2f}x |")
    if not flagged:
        lines.append("| (none) | | | |")
    new = sorted(set(timings) - set(prev))
    gone = sorted(set(prev) - set(timings))
    if new:
        lines += ["", "New queries: " + ", ".join(new)]
    if gone:
        lines += ["", "Removed queries: " + ", ".join(gone)]
    with open(os.path.join(_HERE, "BENCH_diff.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    timings: dict[str, float] = {}
    for family in _pack_families(names):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--family"] + family,
            capture_output=True,
            text=True,
            env=os.environ.copy(),
        )
        got = None
        for line in proc.stdout.splitlines():
            if line.startswith("BENCH_CHILD_JSON:"):
                got = json.loads(line[len("BENCH_CHILD_JSON:") :])
        if got is None:
            print(
                f"bench: family {family[0]}.. crashed (rc={proc.returncode}):\n"
                + proc.stderr[-2000:],
                file=sys.stderr,
            )
            got = {n: -1.0 for n in family}
        timings.update(got)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    try:
        _write_diff(timings, sf)
    except OSError as e:
        print(f"bench: diff write failed: {e}", file=sys.stderr)
    print(json.dumps({
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--family":
        child_main(sys.argv[2:])
    else:
        main()
