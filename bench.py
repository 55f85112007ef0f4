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
still improving run-to-run get extra reps until stable — >3 s queries
need TWO consecutive run-pairs within 10% (cap 8), others one pair
(cap 3).  The reported number is the min — per-plan JIT compile cost
that amortizes away on a long-lived cluster executor, while each rep
still recomputes all data.  (The flagship astro DAG compiles ~25s of
generated code on a cold JVM and then runs in ~6.5s; min-of-2 would
report the compiler, not the query.)  Full per-query run vectors are
persisted in BENCH_LOCAL.json so false plateaus are visible.
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
        # each astro query is a ~40-operator code-cache heavyweight —
        # one JVM each, never share (measured round 4: sharing leaves
        # generated code interpreted once the cache saturates)
        return name
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


def _time_query(spark, fn, sf_dir: str) -> tuple[float, list[float], bool]:
    """Adaptive-rep timing of one query; returns
    (plateau_min, run_vector, contended).

    Plateau rule: cheap queries (min ≤ 1 s) stop after 2 runs; mid-range
    stop when the last two runs agree within 10% (cap 3); expensive
    queries (min > 3 s) need TWO consecutive pairs within 10% — the last
    three runs mutually stable — before stopping (cap 8).  The stricter
    rule exists because a slowly-decaying JIT curve can satisfy a single
    pair-agreement long before the floor: round 5's committed artifact
    recorded the astro flagship at 15.4 s when its true steady state was
    6.4 s.  The full run vector is persisted in BENCH_LOCAL.json so a
    false plateau is visible in the artifact."""
    runs: list[float] = []

    def one() -> None:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        # drop DataFrames cached inside operators so runs and queries are
        # timed independently (data is recomputed every rep)
        spark.catalog.clearCache()

    def close(a: float, b: float) -> bool:
        return abs(a - b) / max(b, 1e-9) <= 0.10

    one()
    one()
    while True:
        mn = min(runs)
        if mn <= 1.0:
            break
        strict = mn > 3.0
        cap = 8 if strict else 3
        if len(runs) >= cap:
            break
        if strict:
            if (
                len(runs) >= 3
                and close(runs[-1], runs[-2])
                and close(runs[-2], runs[-3])
            ):
                break
        elif close(runs[-1], runs[-2]):
            break
        one()
    # Host-steal detection (round 9): a >3× max/min rep spread on a
    # non-trivial query means another process stole CPU mid-bench (this
    # host demonstrably swings the same plan 8→150 s under load — the
    # r08 artifact published a 20.5 s astro min whose quiet floor is
    # ~6.5-9 s).  Take ONE extra rep; if the spread persists, the row is
    # tagged contended in BENCH_LOCAL.json so an inflated min is never
    # mistaken for a plan regression.
    contended = False
    if min(runs) > 1.0 and max(runs) / min(runs) > 3.0:
        one()
        contended = max(runs) / min(runs) > 3.0
    return min(runs), runs, contended


def child_main(names: list[str]) -> None:
    """Run one family in this process; print a JSON timing map."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from dataslicer_spark.session import get_spark

    spark = get_spark("bench")
    # JVM/codegen warmup so the first measured query doesn't absorb ~6s
    # of session initialization cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # calibration canary: a fixed CPU-bound aggregate, timed after
    # warmup.  Per-rep spread catches INTERMITTENT host steal, but a
    # steadily stolen host slows every rep equally and evades it — the
    # canary gives each run an absolute speed reference, so a globally
    # inflated artifact is self-describing (compare `canary_sec` across
    # runs before reading any per-query ratio as a regression).
    t0 = time.perf_counter()
    spark.range(50_000_000).selectExpr(
        "sum((id % 1000003) * (id % 997))",  # bounded terms: no ANSI overflow
        "avg(id)",
        "count(distinct id % 1000)",
    ).collect()
    canary_sec = round(time.perf_counter() - t0, 3)

    registry = entrymod.queries()
    timings: dict[str, float] = {}
    run_vectors: dict[str, list[float]] = {}
    contended: list[str] = []
    for name in names:
        try:
            timings[name], run_vectors[name], was_contended = _time_query(
                spark, registry[name], sf_dir
            )
            if was_contended:
                contended.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
            spark.catalog.clearCache()
    print(
        "BENCH_CHILD_JSON:"
        + json.dumps(
            {
                "timings": timings,
                "runs": run_vectors,
                "contended": contended,
                "canary_sec": canary_sec,
            }
        ),
        flush=True,
    )


def _write_diff(
    timings: dict[str, float],
    sf: float | None,
    run_vectors: dict[str, list[float]] | None = None,
    contended: list[str] | None = None,
    canaries: list[float] | None = None,
) -> None:
    """Persist this run and a regression diff vs the previous run."""
    local_path = os.path.join(_HERE, "BENCH_LOCAL.json")
    prev: dict[str, float] = {}
    try:
        with open(local_path) as f:
            prev = json.load(f).get("queries", {})
    except (OSError, json.JSONDecodeError):
        pass
    # a crashed query (<= 0) must not poison the baseline: keep the
    # previous good value so a recovered query still gets a comparison
    baseline = dict(timings)
    for name, t in timings.items():
        if t <= 0 and prev.get(name, -1) > 0:
            baseline[name] = prev[name]
    # the artifact must be self-describing: a retained previous timing
    # for a crashed query is indistinguishable from a fresh measurement
    # unless the failure is recorded alongside it
    failed_names = sorted(n for n, t in timings.items() if t <= 0)
    with open(local_path, "w") as f:
        json.dump(
            {
                "sf": sf,
                "queries": baseline,
                "runs": run_vectors or {},
                "failed": failed_names,
                # rows whose rep spread stayed >3x after an extra rep:
                # host CPU steal — treat their min as an upper bound,
                # not a regression signal
                "contended": sorted(contended or []),
                # fixed-workload canary per family JVM (see child_main):
                # run-level speed reference — compare to the previous
                # artifact's values before reading ratios as regressions
                "canary_sec": canaries or [],
            },
            f, indent=1, sort_keys=True,
        )
    if not prev:
        return
    failed = failed_names
    lines = [
        "# BENCH diff — current run vs previous BENCH_LOCAL.json",
        "",
        f"Queries: {len(timings)} now / {len(prev)} before. "
        "Flagging |log-ratio| >= 1.3x with prior >= 0.2s.",
        "",
        "Methodology note (round 6): expensive queries (min > 3 s) now "
        "require two consecutive run-pairs within 10% before the plateau "
        "stops (cap 8 reps) — improvements on >3 s queries vs a round-5 "
        "baseline partly reflect the fixed false-plateau, not the code.",
        "",
        *(
            ["Failed/crashed queries (baseline retained from previous "
             "run): " + ", ".join(failed), ""]
            if failed else []
        ),
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
    run_vectors: dict[str, list[float]] = {}
    contended: list[str] = []
    canaries: list[float] = []
    for family in _pack_families(names):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--family"]
                + family,
                capture_output=True,
                text=True,
                env=os.environ.copy(),
                # generous per-family ceiling: one wedged JVM must not
                # stall the whole benchmark with no partial output
                timeout=int(os.environ.get("SPARK_GRAFT_BENCH_TIMEOUT", "2400")),
            )
            stdout, stderr, rc = proc.stdout, proc.stderr, proc.returncode
        except subprocess.TimeoutExpired as e:
            out = e.stdout or ""
            stdout = out.decode() if isinstance(out, bytes) else out
            stderr = f"TIMEOUT after {e.timeout}s"
            rc = -1
        got = None
        for line in stdout.splitlines():
            if line.startswith("BENCH_CHILD_JSON:"):
                got = json.loads(line[len("BENCH_CHILD_JSON:") :])
        if got is None:
            print(
                f"bench: family {family[0]}.. crashed (rc={rc}):\n"
                + stderr[-2000:],
                file=sys.stderr,
            )
            got = {"timings": {n: -1.0 for n in family}, "runs": {}}
        timings.update(got["timings"])
        run_vectors.update(got.get("runs", {}))
        contended.extend(got.get("contended", []))
        if got.get("canary_sec") is not None:
            canaries.append(got["canary_sec"])

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    failed = sorted(n for n, t in timings.items() if t < 0)
    try:
        _write_diff(timings, sf, run_vectors, contended, canaries)
    except OSError as e:
        print(f"bench: diff write failed: {e}", file=sys.stderr)
    # the driver records only the LAST ~2000 chars of stdout; a full
    # 160+-entry per-query map (~8 KB) gets head-truncated into an
    # unparseable fragment (round 7's artifact lost ~half the vector).
    # Headline line stays under that cap: slowest 40 queries at one
    # decimal; the COMPLETE per-query vector + run traces are committed
    # in BENCH_LOCAL.json / BENCH_diff.md on every run.
    slowest = dict(
        sorted(
            ((n, round(t, 1)) for n, t in timings.items() if t >= 0),
            key=lambda kv: -kv[1],
        )[:40]
    )
    print(json.dumps({
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "sf": sf,
        "n_queries": len(timings),
        "queries_note": "slowest 40 shown; full vector in BENCH_LOCAL.json",
        # a crashed family must not read as a speedup in the headline
        # total — failures are called out explicitly
        "failed_queries": len(failed),
        **({"failed": failed} if failed else {}),
        # rows whose rep spread stayed >3x after an extra rep — host CPU
        # steal; their min is an upper bound, not a plan regression
        **({"contended": sorted(contended)} if contended else {}),
        # fixed-workload reference per family JVM: compare across runs
        # before reading any per-query ratio as a regression (steady
        # steal slows every rep equally and evades the spread check)
        **({"canary_sec": canaries} if canaries else {}),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--family":
        child_main(sys.argv[2:])
    else:
        main()
