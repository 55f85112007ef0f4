"""Time-series analytics over event streams: rolling windows, funnel
conversion, cohort retention, and linear-interpolation resampling
(north-star extensions — the reference has no temporal operators, its
time is the OBSMJD double column, SURVEY.md §1.1/§2.11).

All operators take epoch-microsecond ``long`` timestamps (see
``streaming.events._epoch_us``) so frame bounds and bucket arithmetic are
exact integers — identical across engines, no timestamp-rounding
ambiguity.

Scale design:

- :func:`rolling_window_stats` is ONE shuffle on the key + one sort; the
  trailing frame is a native RANGE window (no self-join fanout — a
  time-range self-join would pair every event with every in-window
  neighbor before aggregating).
- :func:`funnel_conversion` chains per-step window minima over the SAME
  partitioning, so Catalyst plans a single exchange followed by
  in-partition passes; the per-user collapse reuses the partitioning.
- :func:`retention_cohorts` is two shuffles (first-seen per user, then
  the cohort×offset aggregate) — both on high-cardinality keys.
- :func:`interpolate_linear` unions observations with grid ticks and
  resolves both interpolation endpoints in one window sort (the same
  union+window trick as operators/asof.py — no inequality-join fanout).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col
from .resample import time_grid

# fixed-point scale for deterministic double sums (matches
# streaming/events.py): floor(x·2^20) summed as int64.
_FP = float(2**20)


def _fp_sum(col):
    return F.sum(F.floor(col * F.lit(_FP)).cast("long")).cast("double") / _FP


def rolling_window_stats(
    df: DataFrame,
    ts_us_col: str,
    by_cols: Sequence[str],
    value_col: str,
    width_us: int,
) -> DataFrame:
    """Trailing time-range rolling aggregates: for every row, the count,
    deterministic sum, and max of ``value_col`` over the same key's rows
    in ``[ts - width_us, ts]`` (inclusive both ends — rows sharing the
    exact timestamp are frame peers and always included, so the result
    is row-order independent).

    Adds ``roll_n`` / ``roll_sum`` / ``roll_max`` / ``roll_mean`` /
    ``roll_std`` (population std from the same two fixed-point moment
    sums).  One shuffle on ``by_cols``; the RANGE frame is evaluated in
    a single in-partition sorted pass (contrast a time-range self-join,
    which explodes to all in-window pairs before aggregating).
    """
    by = list(by_cols)
    check_col(by + [ts_us_col, value_col], df)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_us_col).asc())
        .rangeBetween(-int(width_us), 0)
    )
    v = F.col(value_col)
    # fixed-point moment sums (see module docstring): order-independent
    # int64 sums make roll_sum/roll_mean/roll_std bit-identical across
    # engines and partitionings; x² at 2^14 halves the scale so the
    # squared sum still fits comfortably in int64
    s1 = F.sum(F.floor(v * F.lit(_FP)).cast("long")).over(w).cast("double") / _FP
    s2 = (
        F.sum(F.floor(v * v * F.lit(float(2**14))).cast("long"))
        .over(w)
        .cast("double")
        / float(2**14)
    )
    n = F.count(F.lit(1)).over(w)
    mean = s1 / n
    var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
    return (
        df.withColumn("roll_n", n)
        .withColumn("roll_sum", s1)
        .withColumn("roll_max", F.max(v).over(w))
        .withColumn("roll_mean", mean)
        .withColumn("roll_std", F.sqrt(var))
    )


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str],
    ts_us_col: str,
    user_col: str,
    type_col: str,
    horizon_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: how many users performed ``steps[0]``,
    then ``steps[1]`` at-or-after it, then ``steps[2]`` at-or-after that,
    … optionally all within ``horizon_us`` of the first step.

    Step k's timestamp is the *earliest* event of that type at-or-after
    the user's step-(k-1) timestamp (the canonical "unordered events,
    ordered funnel" semantics).  Because each step time is monotone
    (t1 ≤ t2 ≤ …), the horizon check ``t_k − t1 ≤ horizon`` subsumes all
    earlier steps.

    Returns one row per step: ``step_index`` (1-based), ``step``,
    ``n_users``.  Plan: the chained step minima are per-user window
    aggregates over the SAME partitioning (one exchange, k in-partition
    passes), then a per-user collapse and a single global aggregate.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    check_col([ts_us_col, user_col, type_col], events)
    w = Window.partitionBy(user_col)
    ts, typ = F.col(ts_us_col), F.col(type_col)

    out = events.select(user_col, ts_us_col, type_col)
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = typ == step
        if prev is not None:
            # at-or-after the previous step; NULL prev ⇒ condition NULL
            # ⇒ row excluded from min ⇒ t_i stays NULL (funnel broken)
            cond = cond & (ts >= F.col(prev))
        out = out.withColumn(f"__t{i}", F.min(F.when(cond, ts)).over(w))
        prev = f"__t{i}"

    # step times are constant within a user: collapse to one row per user
    per_user = out.groupBy(user_col).agg(
        *[F.max(f"__t{i}").alias(f"__t{i}") for i in range(1, len(steps) + 1)]
    )

    reached = []
    for i in range(1, len(steps) + 1):
        c = F.col(f"__t{i}").isNotNull()
        if horizon_us is not None and i > 1:
            c = c & (
                (F.col(f"__t{i}") - F.col("__t1")) <= F.lit(int(horizon_us))
            )
        reached.append(
            F.count(F.when(c, F.lit(1))).alias(f"__n{i}")
        )
    totals = per_user.agg(*reached)

    # one output row per step via stack (no driver round-trip)
    stack_args = ", ".join(
        f"{i}, '{s}', __n{i}" for i, s in enumerate(steps, start=1)
    )
    return totals.select(
        F.expr(
            f"stack({len(steps)}, {stack_args}) AS (step_index, step, n_users)"
        )
    )


def retention_cohorts(
    events: DataFrame,
    ts_us_col: str,
    user_col: str,
    period_us: int,
) -> DataFrame:
    """Cohort retention: users are cohorted by the period bucket of their
    first event; for each (cohort, offset) cell, the number of distinct
    cohort users active ``offset`` periods after their cohort period.

    Returns ``cohort_start`` (epoch µs of the cohort bucket),
    ``period_offset`` (0-based), ``n_users``.  Bucket arithmetic uses
    ``pmod`` (exact for pre-1970 negatives — see resample.time_grid).

    Two shuffles: first-seen per user (window over ``user_col``), then
    the cohort×offset distinct-count.
    """
    check_col([ts_us_col, user_col], events)
    step = F.lit(int(period_us))
    ts = F.col(ts_us_col)
    w = Window.partitionBy(user_col)
    bucket = ts - F.pmod(ts, step)
    out = (
        events.select(user_col, ts_us_col)
        .withColumn("__bucket", bucket)
        .withColumn("__cohort", F.min("__bucket").over(w))
    )
    return out.groupBy(
        F.col("__cohort").alias("cohort_start"),
        ((F.col("__bucket") - F.col("__cohort")) / step)
        .cast("long")
        .alias("period_offset"),
    ).agg(F.countDistinct(user_col).alias("n_users"))


def sessionize(
    events: DataFrame,
    ts_us_col: str,
    user_col: str,
    gap_us: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Event-level sessionization (gaps-and-islands): adds
    ``session_seq`` — the 1-based ordinal of the session each event
    belongs to within its user — where a new session starts whenever the
    gap to the previous event is ≥ ``gap_us`` (the same boundary rule as
    ``session_window``: an event exactly ``gap`` after its predecessor
    opens a new session).

    Complements ``streaming.events.session_stats``: that one aggregates
    per session; this one labels every event, enabling session-grain
    joins (funnel-by-session, nth-session cohorts, duration
    distributions).  One shuffle on ``user_col``; the lag flag and the
    running sum share the exchange and sort.
    """
    check_col([ts_us_col, user_col]
              + ([tiebreak_col] if tiebreak_col else []), events)
    order = [F.col(ts_us_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_us_col)).over(w)
    # two select stages (a window expression can't nest inside another
    # window aggregate), but both windows share one exchange + sort
    flagged = events.withColumn(
        "__new_sess",
        F.when(
            prev.isNull()
            | (F.col(ts_us_col) - prev >= F.lit(int(gap_us))),
            1,
        ).otherwise(0),
    )
    return flagged.withColumn(
        "session_seq",
        F.sum("__new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("__new_sess")


def debounce(
    df: DataFrame,
    ts_us_col: str,
    key_cols: Sequence[str],
    window_us: int,
) -> DataFrame:
    """Throttled deduplication — the deterministic batch twin of
    ``dropDuplicatesWithinWatermark`` (streaming/events.py): per key, in
    event-time order, keep an event only if it is at least ``window_us``
    after the last KEPT event ("anchor" selection — a duplicate does not
    extend the suppression window, matching the streaming operator's
    state-TTL-from-the-stored-row behavior under in-order arrival).

    Anchor selection is inherently sequential (each kept row depends on
    the previous kept row — NOT expressible with window frames, which
    would implement the different gaps-and-islands rule where bursts
    chain indefinitely), so this is a grouped stateful kernel — run
    through :func:`..utils.grouped_map_in_pandas`'s ``batch_fn`` mode:
    ``applyInPandas`` pays one Arrow round-trip + Python call PER GROUP
    (the 4× scale probe measured 5.6× wall growth from exactly that
    per-group overhead on many small keys); here one Python call
    processes a whole Arrow batch of key-sorted groups, walking each
    group's pre-sorted slice with ``searchsorted`` jumps
    (O(#anchors·log n) per key), parallel across partitions.  Rows must
    be unique per (key, ts) — pre-deduplicate with
    ``windows.largest_wins`` — so the result is engine-deterministic.

    Returns the kept rows with all input columns.
    """
    if int(window_us) <= 0:
        raise ValueError("window_us must be positive")
    by = list(key_cols)
    check_col(by + [ts_us_col], df)

    from ..utils import grouped_map_in_pandas

    def batch_kernel(pdf, bounds):
        import numpy as np

        ts_all = pdf[ts_us_col].to_numpy()
        keep = np.zeros(len(ts_all), dtype=bool)
        for s, e in zip(bounds[:-1], bounds[1:]):
            ts = ts_all[s:e]
            i = 0
            n = e - s
            while i < n:
                keep[s + i] = True
                i = int(np.searchsorted(ts, ts[i] + window_us, side="left"))
        return pdf[keep]

    return grouped_map_in_pandas(
        df,
        by,
        None,
        df.schema,
        batch_fn=batch_kernel,
        sort_cols=[ts_us_col],
    )


def interpolate_linear(
    df: DataFrame,
    ts_us_col: str,
    by_cols: Sequence[str],
    value_col: str,
    step_us: int,
) -> DataFrame:
    """Regular-grid resampling with linear interpolation (``np.interp``
    semantics): for every key and grid tick ``t``, the value linearly
    interpolated between the latest observation at-or-before ``t`` and
    the earliest one strictly after; ticks outside the observation span
    clamp to the edge value.

    Observations must be unique per (key, ts) — pre-deduplicate with
    ``windows.largest_wins`` (as-of queries do the same; ties would make
    the endpoint choice engine-dependent).  NULL-valued observations are
    ignored (dropped before the union): keeping them would mispair an
    endpoint timestamp with an older observation's value, since the two
    IGNORE-NULLS window reads resolve independently.

    Returns ``by_cols`` + ``grid_ts`` + ``<value_col>_interp``.

    Plan: grid ticks and observations are unioned and shuffled once per
    key; the backward endpoint is ``last(obs IGNORE NULLS)`` over the
    ascending growing frame, the forward endpoint the same aggregate
    over a DESCENDING growing frame that excludes the current row
    (exclusive is safe: an observation exactly at ``t`` is already the
    backward endpoint, making the fraction 0).  Two in-partition sorts,
    ONE exchange, no inequality-join fanout (asof.py design).  The
    descending pass deliberately avoids an ``(x FOLLOWING, UNBOUNDED
    FOLLOWING)`` frame: Spark's UnboundedFollowing frame processor
    re-aggregates the remaining partition for every row — O(n²) per key
    (measured 5.5 s vs 1.3 s at sf0.1) — while growing frames are
    incremental O(n).
    """
    by = list(by_cols)
    check_col(by + [ts_us_col, value_col], df)
    internal = {"__side", "__ots", "__oval", "grid_ts"}
    bad = internal & set(df.columns)
    if bad:
        raise ValueError(f"input columns collide with internals: {sorted(bad)}")

    df = df.filter(F.col(value_col).isNotNull())
    grid = time_grid(df, ts_us_col, by, int(step_us)).withColumnRenamed(
        "grid_ts", ts_us_col
    )
    obs = df.select(
        *by,
        F.col(ts_us_col),
        F.lit(0).alias("__side"),
        F.col(ts_us_col).alias("__ots"),
        F.col(value_col).cast("double").alias("__oval"),
    )
    ticks = grid.select(
        *by,
        F.col(ts_us_col),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__ots"),
        F.lit(None).cast("double").alias("__oval"),
    )
    u = obs.unionByName(ticks)

    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_us_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # descending growing frame ending one row before the current one:
    # "already-seen" rows are exactly those with (ts, side) ordered after
    # the current row ascending — i.e. observations strictly later than
    # the tick (equal-ts observations sort before the tick in this
    # direction, so they stay excluded ⇒ exclusive-forward semantics)
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_us_col).desc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # __ots/__oval are null together (grid rows), so taking last/first of
    # each separately always reads both from the same observation row
    ann = (
        u.withColumn("__pts", F.last("__ots", ignorenulls=True).over(wb))
        .withColumn("__pval", F.last("__oval", ignorenulls=True).over(wb))
        .withColumn("__nts", F.last("__ots", ignorenulls=True).over(wf))
        .withColumn("__nval", F.last("__oval", ignorenulls=True).over(wf))
        .filter(F.col("__side") == 1)
    )
    t = F.col(ts_us_col)
    pts, pval = F.col("__pts"), F.col("__pval")
    nts, nval = F.col("__nts"), F.col("__nval")
    frac = (t - pts).cast("double") / (nts - pts).cast("double")
    interp = (
        F.when(pts == t, pval)
        .when(pts.isNotNull() & nts.isNotNull(), pval + (nval - pval) * frac)
        .when(pts.isNotNull(), pval)  # clamp past the last observation
        .otherwise(nval)  # clamp before the first observation
    )
    return ann.select(
        *by,
        t.alias("grid_ts"),
        interp.alias(f"{value_col}_interp"),
    )


def detect_event_pattern(
    events: DataFrame,
    ts_col: str,
    by_cols,
    type_col: str,
    pattern: list[str],
    within,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Complex-event-pattern detection (the MATCH_RECOGNIZE shape):
    occurrences of ``pattern`` as CONSECUTIVE events in each key's
    time-ordered stream, with the whole match spanning at most
    ``within`` (same units as ``ts_col``).  Returns one row per match:
    the key columns + ``match_ts`` (first event's ts) + ``span``.

    "Consecutive" is the strict-contiguity CEP mode (no skipping —
    debounce/filter upstream to drop noise events first); matches may
    overlap (a stream A A B with pattern [A, B] yields one match at the
    second A — strict contiguity — while A B A B yields two).

    Plan: ONE key shuffle into a time-ordered window; the pattern
    becomes ``len(pattern)−1`` ``lead()`` columns over that single
    window (Catalyst evaluates all leads in one pass), then a row-local
    predicate — no joins, no explosion, no Python.  At 100 TB this is
    the same cost as any per-key window pass; pattern length adds
    columns, not passes.  Ties in ``ts_col`` make "consecutive"
    ambiguous — pass ``tiebreak_col`` (e.g. an event id) to pin the
    order deterministically.
    """
    from ..utils import check_col

    if len(pattern) < 1:
        raise ValueError("pattern must have at least one step")
    keys = list(by_cols)
    check_col(keys + [ts_col, type_col], events)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    cond = F.col(type_col) == pattern[0]
    last_ts = F.col(ts_col)
    for i, step in enumerate(pattern[1:], start=1):
        cond = cond & (F.lead(type_col, i).over(w) == F.lit(step))
        last_ts = F.lead(ts_col, i).over(w)
    span = last_ts - F.col(ts_col)
    return (
        events.withColumn("__match", cond)
        .withColumn("__span", span)
        .filter(F.col("__match") & (F.col("__span") <= within))
        .select(
            *keys,
            F.col(ts_col).alias("match_ts"),
            F.col("__span").alias("span"),
        )
    )


def ewma_smooth(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average — the standard
    online smoother ``e_t = α·x_t + (1−α)·e_{t−1}`` seeded with
    ``e_0 = x_0`` (pandas ``ewm(adjust=False)`` semantics).

    The recurrence is inherently order-dependent, so this is a grouped
    stateful kernel through :func:`..utils.grouped_map_in_pandas`'s
    ``batch_fn`` mode: ONE shuffle on the key, rows arrive key-grouped
    and time-sorted, one Python call per Arrow batch.  At scale the
    parallelism unit is the key — the best any engine can do for an
    order-dependent scan (same argument as :func:`debounce`).

    The per-step arithmetic is written as exactly ``α·x + (1−α)·e``
    (two IEEE-754 multiplies and one add, fixed order), so any engine
    replaying the same recurrence — e.g. the DuckDB recursive-CTE
    oracle twin (``ev_ewma_smooth``) — reproduces it bit-for-bit.
    NaN/NULL inputs poison the tail of their series by design; drop or
    interpolate first (:func:`interpolate_linear`).

    ``order_col`` must be unique per key (engine-deterministic order).
    """
    if not (0.0 < float(alpha) <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    by = list(key_cols)
    check_col(by + [order_col, value_col], df)

    import pyspark.sql.types as T

    from ..utils import grouped_map_in_pandas

    a = float(alpha)
    one_minus_a = 1.0 - a

    def batch_kernel(pdf, bounds):
        import numpy as np

        x = pdf[value_col].to_numpy(dtype="float64")
        out = np.empty(len(x), dtype="float64")
        for s, e in zip(bounds[:-1], bounds[1:]):
            ew = x[s]
            out[s] = ew
            for i in range(s + 1, e):
                ew = a * x[i] + one_minus_a * ew
                out[i] = ew
        res = pdf.copy()
        res[out_col] = out
        return res

    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType(), True)]
    )
    return grouped_map_in_pandas(
        df, by, None, schema, batch_fn=batch_kernel, sort_cols=[order_col]
    )


def cusum_changepoints(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    target: float,
    slack: float,
    threshold: float,
) -> DataFrame:
    """Per-key two-sided CUSUM change detection (Page 1954): in
    ``order_col`` order accumulate

    - ``s_pos = max(0, s_pos + ((x − target) − slack))`` — upward drift,
    - ``s_neg = max(0, s_neg + ((target − x) − slack))`` — downward,

    flag ``alarm`` whenever either exceeds ``threshold``, and reset BOTH
    accumulators to 0 after an alarm (restart detection).  ``target`` is
    a caller-supplied reference level (estimate it upstream with a
    separate aggregate if needed — keeping it a literal makes the scan
    single-pass and the arithmetic engine-portable).

    Same execution shape and bit-reproducibility contract as
    :func:`ewma_smooth`: one key shuffle, batched Arrow kernel, per-step
    IEEE ops in fixed order mirrored by the DuckDB recursive-CTE oracle
    (``ev_changepoint``).  Returns all input columns plus ``s_pos``,
    ``s_neg`` (pre-reset values) and ``alarm``.
    """
    by = list(key_cols)
    check_col(by + [order_col, value_col], df)
    if float(threshold) <= 0.0:
        raise ValueError("threshold must be positive")

    import pyspark.sql.types as T

    from ..utils import grouped_map_in_pandas

    tgt = float(target)
    k = float(slack)
    h = float(threshold)

    def batch_kernel(pdf, bounds):
        import numpy as np

        x = pdf[value_col].to_numpy(dtype="float64")
        sp_out = np.empty(len(x), dtype="float64")
        sn_out = np.empty(len(x), dtype="float64")
        al_out = np.empty(len(x), dtype=bool)
        for s, e in zip(bounds[:-1], bounds[1:]):
            sp = 0.0
            sn = 0.0
            for i in range(s, e):
                sp = max(0.0, sp + ((x[i] - tgt) - k))
                sn = max(0.0, sn + ((tgt - x[i]) - k))
                alarm = sp > h or sn > h
                sp_out[i] = sp
                sn_out[i] = sn
                al_out[i] = alarm
                if alarm:
                    sp = 0.0
                    sn = 0.0
        res = pdf.copy()
        res["s_pos"] = sp_out
        res["s_neg"] = sn_out
        res["alarm"] = al_out
        return res

    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("s_pos", T.DoubleType(), True),
            T.StructField("s_neg", T.DoubleType(), True),
            T.StructField("alarm", T.BooleanType(), True),
        ]
    )
    return grouped_map_in_pandas(
        df, by, None, schema, batch_fn=batch_kernel, sort_cols=[order_col]
    )


def minmax_downsample(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_us_col: str,
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """Plot-grade series downsampling: per (key, time bucket) keep the
    minimum- and maximum-value observations — the min-max decimation
    every monitoring UI renders from (preserves every spike and dip a
    mean-per-bucket resample flattens; the simpler cousin of LTTB).

    ONE aggregate keyed on (key, bucket) with map-side partials
    computing both extremes, then a 2-element explode — one scan, one
    shuffle, no window, no join (struct min/max falls back to
    SortAggregate in Spark, but the sort runs over compact per-bucket
    partials, not events).  Tie-determinism by lexicographic struct
    ordering: among equal values the EARLIEST timestamp wins for min,
    the LATEST for max (``min/max(struct(value, ts))``), so the result
    is partitioning- and engine-independent (the DuckDB twin replays it
    with ROW_NUMBER ties).

    Output: key columns + ``bucket_start`` (epoch µs) + ``kind``
    ('min'/'max') + ``ts_us`` + ``value`` — always two rows per
    non-empty bucket (a single-observation bucket emits the same point
    under both kinds, so downstream plotting code needs no special
    case).
    """
    by = list(key_cols)
    check_col(by + [ts_us_col, value_col], df)
    if int(bucket_us) <= 0:
        raise ValueError("bucket_us must be positive")
    step = F.lit(int(bucket_us))
    bucket = (F.col(ts_us_col) - F.pmod(F.col(ts_us_col), step)).alias(
        "bucket_start"
    )
    v = F.col(value_col).cast("double")
    pt = F.struct(v.alias("v"), F.col(ts_us_col).alias("t"))
    agg = df.groupBy(*by, bucket).agg(
        F.min(pt).alias("__mn"), F.max(pt).alias("__mx")
    )
    both = F.explode(
        F.array(
            F.struct(
                F.lit("min").alias("kind"),
                F.col("__mn.t").alias("ts_us"),
                F.col("__mn.v").alias("value"),
            ),
            F.struct(
                F.lit("max").alias("kind"),
                F.col("__mx.t").alias("ts_us"),
                F.col("__mx.v").alias("value"),
            ),
        )
    )
    return agg.select(*by, "bucket_start", both.alias("__e")).select(
        *by, "bucket_start", "__e.kind", "__e.ts_us", "__e.value"
    )


def holt_smooth(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float,
    beta: float,
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + trend) — the
    forecasting-grade smoother for series with drift, where plain EWMA
    (:func:`ewma_smooth`) systematically lags:

    - seed: ``level₀ = x₀``, ``trend₀ = 0``;
    - step: ``level = α·x + (1−α)·(levelₚ + trendₚ)`` then
      ``trend = β·(level − levelₚ) + (1−β)·trendₚ``.

    Same execution and bit-reproducibility contract as
    :func:`ewma_smooth` (one key shuffle, batched Arrow kernel,
    fixed-order IEEE ops mirrored by the recursive-CTE oracle twin
    ``ev_holt_smooth``).  The one-step-ahead forecast is
    ``level + trend`` of the previous row — emit it downstream with a
    ``lag`` window if needed.  Returns input columns + ``level`` +
    ``trend``.
    """
    if not (0.0 < float(alpha) <= 1.0) or not (0.0 <= float(beta) <= 1.0):
        raise ValueError("alpha must be in (0, 1], beta in [0, 1]")
    by = list(key_cols)
    check_col(by + [order_col, value_col], df)

    import pyspark.sql.types as T

    from ..utils import grouped_map_in_pandas

    a = float(alpha)
    om_a = 1.0 - a
    b = float(beta)
    om_b = 1.0 - b

    def batch_kernel(pdf, bounds):
        import numpy as np

        x = pdf[value_col].to_numpy(dtype="float64")
        lv_out = np.empty(len(x), dtype="float64")
        tr_out = np.empty(len(x), dtype="float64")
        for s, e in zip(bounds[:-1], bounds[1:]):
            lv = x[s]
            tr = 0.0
            lv_out[s] = lv
            tr_out[s] = tr
            for i in range(s + 1, e):
                lv_new = a * x[i] + om_a * (lv + tr)
                tr = b * (lv_new - lv) + om_b * tr
                lv = lv_new
                lv_out[i] = lv
                tr_out[i] = tr
        res = pdf.copy()
        res["level"] = lv_out
        res["trend"] = tr_out
        return res

    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("level", T.DoubleType(), True),
            T.StructField("trend", T.DoubleType(), True),
        ]
    )
    return grouped_map_in_pandas(
        df, by, None, schema, batch_fn=batch_kernel, sort_cols=[order_col]
    )


def seasonal_decompose_naive(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_us_col: str,
    value_col: str,
    period_us: int,
    bucket_us: int,
    trend_halfwidth_us: int,
) -> DataFrame:
    """Naive additive seasonal decomposition ``value = trend + seasonal
    + residual`` per key series — the classical-decomposition baseline
    (moving-average trend, per-phase seasonal means):

    - ``trend``: centered range-window mean over ``±trend_halfwidth_us``
      of event time (value-based frame — tie-deterministic);
    - ``phase``: ``floor((ts % period_us) / bucket_us)`` (e.g. hour of
      day for period=24 h, bucket=1 h);
    - ``seasonal``: per (key, phase) mean of the detrended series;
    - ``residual``: what remains.

    All three means use fixed-point int64 sums (floor(x·2²⁰), the
    module-wide ``_FP``) so window- and group-aggregation order cannot
    change a bit, and each mean is the same two-division expression in
    any engine — the DuckDB twin (``ev_seasonal_decompose``) matches
    bit-for-bit.  Timestamps must be non-negative epoch-us longs.

    Plan: ONE key shuffle into the range window, then one (key, phase)
    aggregate joined back on the same key — no self-joins, no Python.
    Parallelism unit is the key series (like
    :func:`rolling_window_stats`); with few, huge keys, sub-key the
    series or pre-aggregate ticks first.
    """
    by = list(key_cols)
    check_col(by + [ts_us_col, value_col], df)
    if period_us <= 0 or bucket_us <= 0 or trend_halfwidth_us < 0:
        raise ValueError("period_us/bucket_us must be positive, "
                         "trend_halfwidth_us non-negative")

    w = (
        Window.partitionBy(*by)
        .orderBy(ts_us_col)
        .rangeBetween(-int(trend_halfwidth_us), int(trend_halfwidth_us))
    )
    v = F.col(value_col).cast("double")
    fp_int = lambda e: F.floor(e * F.lit(_FP)).cast("long")  # noqa: E731
    trend = (
        F.sum(fp_int(v)).over(w).cast("double") / F.lit(_FP)
    ) / F.count(F.lit(1)).over(w)
    phase = F.floor(
        (F.col(ts_us_col) % F.lit(int(period_us))) / F.lit(int(bucket_us))
    ).cast("int")
    staged = df.withColumn("trend", trend).withColumn("phase", phase)
    detr = F.col(value_col).cast("double") - F.col("trend")
    seasonal = staged.groupBy(*by, "phase").agg(
        (
            (F.sum(fp_int(detr)).cast("double") / F.lit(_FP))
            / F.count(F.lit(1))
        ).alias("seasonal")
    )
    out = staged.join(seasonal, by + ["phase"])
    return out.withColumn(
        "residual",
        F.col(value_col).cast("double") - F.col("trend") - F.col("seasonal"),
    )


__all__ = [
    "rolling_window_stats",
    "funnel_conversion",
    "retention_cohorts",
    "sessionize",
    "debounce",
    "interpolate_linear",
    "detect_event_pattern",
    "ewma_smooth",
    "cusum_changepoints",
    "seasonal_decompose_naive",
    "holt_smooth",
    "minmax_downsample",
]
