"""Event-time window aggregations over the ``events`` table
(SURVEY.md §2.11: the reference is batch-only; this is the designated
Structured-Streaming extension surface).

The same expression API serves batch and streaming: ``window()`` /
``session_window()`` group keys work identically on a static DataFrame and
on a stream — the batch twins below are the oracle-checkable form, and
:func:`stream_tumbling_counts` shows the streaming deployment (readStream →
withWatermark → window agg) of the identical expressions.

Fixed-point value sums keep results bit-reproducible across engines (see
plans/star_queries.py).  Window starts are emitted as epoch seconds
(long) — timestamp columns round-trip differently between engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..utils import check_col

_FP = float(2**20)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table, normalizing the ``ts`` physical type.

    The driver's parquet has stored ``ts`` as TIMESTAMP(NANOS) (which
    Spark 4 rejects by default; with ``spark.sql.legacy.parquet.nanosAsLong``
    it reads as epoch-nanos long, converted here via exact integer
    division) and, in later generations, as un-adjusted TIMESTAMP(MICROS)
    (isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ.  Both
    are normalized to session-tz TIMESTAMP so epoch arithmetic
    (``unix_micros``) and event-time windows behave identically across
    data generations; the session timezone is pinned to UTC
    (session.py), so the NTZ→TIMESTAMP cast is an exact re-tag."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type in ("bigint", "long"):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _epoch_us(col):
    """``unix_micros`` tolerant of TIMESTAMP_NTZ inputs: the cast re-tags
    NTZ as session-tz TIMESTAMP (exact — session tz is pinned to UTC) and
    is a no-op on TIMESTAMP, so callers may pass frames of either type."""
    return F.unix_micros(col.cast("timestamp"))


def _fp_sum(col):
    return F.sum(F.floor(col * F.lit(_FP)).cast("long")).cast("double") / _FP


def trending_topk(
    events: DataFrame,
    width: str = "1 hour",
    k: int = 3,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Per-window trending keys: the top-``k`` keys by event count in
    each tumbling window, deterministic ties (count desc, key asc).

    Two shuffles: (window, key) counts with map-side combine, then the
    per-window ranking window over the COUNTS (window-cardinality ×
    distinct-keys rows, not events).  In Structured Streaming, a global
    per-window top-k is not incrementally emittable before the window
    closes; run this as a triggered batch over the windowed-count sink
    (the standard pattern), or accept append-mode results per watermark
    close.
    """
    from pyspark.sql import Window as W

    check_col([ts_col, key_col], events)
    counts = events.groupBy(
        F.window(F.col(ts_col), width).alias("w"), key_col
    ).agg(F.count(F.lit(1)).alias("n_events"))
    rank_w = W.partitionBy("w").orderBy(
        F.col("n_events").desc(), F.col(key_col).asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(
            _epoch_us(F.col("w.start")).alias("window_start"),
            "rank",
            key_col,
            "n_events",
        )
    )


def tumbling_window_stats(
    events: DataFrame,
    width: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time windows: count + deterministic value sum per
    (window, key).  One shuffle on (window, key)."""
    check_col([ts_col, key_col, value_col], events)
    return (
        events.groupBy(F.window(F.col(ts_col), width).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _fp_sum(F.col(value_col)).alias("sum_value"),
        )
        .select(
            _epoch_us(F.col("w.start")).alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_stats(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Sliding windows — each event lands in width/slide windows; Spark
    expands this without a UDF."""
    check_col([ts_col, key_col, value_col], events)
    return (
        events.groupBy(F.window(F.col(ts_col), width, slide).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _fp_sum(F.col(value_col)).alias("sum_value"),
        )
        .select(
            _epoch_us(F.col("w.start")).alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Session windows per user: sessions close after ``gap`` inactivity.

    ``session_window`` semantics: a session is [first_ts, last_ts + gap);
    an event exactly ``gap`` after the previous one starts a new session —
    the SQL twin (gaps-and-islands with ``diff >= gap``) matches this.
    """
    check_col([ts_col, user_col, value_col], events)
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), user_col
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _fp_sum(F.col(value_col)).alias("sum_value"),
        )
        .select(
            user_col,
            _epoch_us(F.col("w.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def stream_tumbling_counts(
    spark,
    source_dir: str,
    schema,
    width: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
):
    """Structured-Streaming deployment of the tumbling aggregation:
    file-source stream → watermark (bounds state for late data) → identical
    window expressions.  Returns the streaming DataFrame; attach a
    ``writeStream`` sink to run.  (Exercised in tests with a file source +
    memory sink.)"""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), key_col, "n_events"
        )
    )


def stream_session_stats(
    spark,
    source_dir: str,
    schema,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
):
    """Structured-Streaming deployment of :func:`session_stats` — the
    identical ``session_window`` expressions behind a watermark.  In
    append mode a session emits once the watermark passes its close
    (start of the last event + gap), so state per user is bounded by the
    watermark horizon; sessions still open at end-of-stream stay in
    state (tests advance the watermark with a sentinel event).  Returns
    the streaming DataFrame; attach a ``writeStream`` sink to run."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    # delegate to the batch operator: the streaming twin IS the same
    # expression tree, just watermarked — a copy would silently
    # desynchronize if session_stats evolves
    return session_stats(
        stream.withWatermark(ts_col, watermark),
        gap=gap, ts_col=ts_col, user_col=user_col, value_col=value_col,
    )


def stream_dedup_within_watermark(
    spark,
    source_dir: str,
    schema,
    key_cols=("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
):
    """Streaming exact deduplication — the streaming twin of
    ``dedup.exact_dedup`` for at-least-once sources (re-crawls, replayed
    queues).

    ``dropDuplicatesWithinWatermark`` keeps state only for keys younger
    than the watermark, so state is bounded by (arrival rate × watermark)
    instead of growing with the full key history — the scale-correct
    contract for an unbounded stream; duplicates farther apart than the
    watermark are the source's SLA, not the engine's.  Emits append-mode
    rows (first occurrence wins).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_running_user_totals(
    spark,
    source_dir: str,
    schema,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (total, count) maintained across micro-batches.

    This is the arbitrary-state surface the built-in windows can't express
    (reference has no streaming at all — SURVEY.md §2.11; this is the
    designated extension).  State is a single (double, long) tuple per
    user — bounded, no watermark needed for the running-total semantics.
    Emits one updated row per user per micro-batch (output mode 'update').
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("total", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf[value_col].sum())
            n += len(pdf)
        state.update((float(total), int(n)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_value": [total], "n_events": [n]}
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.groupBy(user_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_ewma(
    spark,
    source_dir: str,
    schema,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.25,
):
    """Streaming EWMA via ``applyInPandasWithState``: per key, the
    running ``e = α·x + (1−α)·e`` state folded across micro-batches —
    the online twin of ``operators/timeseries.ewma_smooth`` (pytest
    asserts the final streamed state equals the batch kernel's last row
    when batches arrive in ``order_col`` order).

    Within a micro-batch rows are sorted by ``order_col``; across
    batches the recurrence is correct when the source delivers batches
    in non-decreasing ``order_col`` per key (file-ordered ingestion —
    the same in-order contract as the batch-twin dedup stream).  State
    is one (double, long) pair per key.  Emits one row per key per
    micro-batch: the post-batch smoothed value and the last order seen
    (output mode 'update').
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    a = float(alpha)
    if not (0.0 < a <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("ewma", T.DoubleType()),
            T.StructField("last_order", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ewma", T.DoubleType()),
            T.StructField("last_order", T.LongType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        if state.exists:
            ew, last = state.get
            seeded = True
        else:
            ew, last = 0.0, -(2 ** 62)
            seeded = False
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            for x, o in zip(pdf[value_col], pdf[order_col]):
                x = float(x)
                if not seeded:
                    ew, seeded = x, True
                else:
                    ew = a * x + (1.0 - a) * ew
                last = int(o)
        state.update((float(ew), int(last)))
        yield pd.DataFrame(
            {"key": [key[0]], "ewma": [ew], "last_order": [last]}
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )


def stream_cusum(
    spark,
    source_dir: str,
    schema,
    target: float,
    slack: float,
    threshold: float,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
):
    """Streaming two-sided CUSUM change detection via
    ``applyInPandasWithState``: the online twin of
    ``operators/timeseries.cusum_changepoints`` — per key the (s_pos,
    s_neg) accumulators fold across micro-batches with the identical
    ``max(0, s + ((x − target) − slack))`` op order and post-alarm
    reset, so the streamed alarm sequence is bit-identical to the batch
    kernel under in-order ingestion (pytest-pinned).

    State is one (double, double, long) triple per key.  Emits one row
    per key per micro-batch: current accumulators, the last order seen,
    and how many alarms fired in this batch (output mode 'update');
    route the alarm count to the alerting sink.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    tgt, k, h = float(target), float(slack), float(threshold)
    if h <= 0.0:
        raise ValueError("threshold must be positive")
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("s_pos", T.DoubleType()),
            T.StructField("s_neg", T.DoubleType()),
            T.StructField("last_order", T.LongType()),
            T.StructField("n_alarms", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("sp", T.DoubleType()),
            T.StructField("sn", T.DoubleType()),
            T.StructField("last_order", T.LongType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        sp, sn, last = state.get if state.exists else (0.0, 0.0, -(2 ** 62))
        alarms = 0
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            for x, o in zip(pdf[value_col], pdf[order_col]):
                x = float(x)
                sp = max(0.0, sp + ((x - tgt) - k))
                sn = max(0.0, sn + ((tgt - x) - k))
                if sp > h or sn > h:
                    alarms += 1
                    sp, sn = 0.0, 0.0
                last = int(o)
        state.update((float(sp), float(sn), int(last)))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "s_pos": [sp],
                "s_neg": [sn],
                "last_order": [last],
                "n_alarms": [alarms],
            }
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )


def _click_purchase_frames(events, lookback: str):
    """Shared projection + join condition for the stream-stream join and
    its batch twin: each click paired with the same user's purchases in
    the preceding ``lookback`` (inclusive)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = F.expr(
        f"c_user = p_user AND p_ts >= c_ts - INTERVAL {lookback} AND p_ts <= c_ts"
    )
    return clicks, purchases, cond


def stream_click_purchase_join(
    spark,
    source_dir: str,
    schema,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked stream-stream inner join: clicks ⋈ same-user purchases
    within the trailing ``lookback`` window.

    Both sides carry watermarks and the join has a bounded time-range
    condition, so Spark can expire buffered state — the required contract
    for unbounded stream-stream joins; state per side is (rate ×
    (watermark + lookback)).  The batch twin (same projections, same
    condition on a static frame) is the correctness oracle in tests.
    """
    clicks, purchases, cond = _click_purchase_frames(
        spark.readStream.schema(schema).parquet(source_dir), lookback
    )
    return clicks.withWatermark("c_ts", watermark).join(
        purchases.withWatermark("p_ts", watermark), cond, "inner"
    )


def batch_click_purchase_join(events, lookback: str = "1 hour"):
    """The batch twin of :func:`stream_click_purchase_join`."""
    clicks, purchases, cond = _click_purchase_frames(events, lookback)
    return clicks.join(purchases, cond, "inner")


def stream_running_user_totals_tws(
    spark,
    source_dir: str,
    schema,
    user_col: str = "user_id",
    value_col: str = "value",
):
    """The ``transformWithStateInPandas`` form of
    :func:`stream_running_user_totals` — Spark 4's stateful-processor API
    (typed ValueState handles, timers, TTL) superseding
    ``applyInPandasWithState``.  Both are kept: the processor surface is
    part of the engine's UDF contract (SURVEY.md §2.10) and the two APIs
    have different state-store capabilities (this one requires the
    RocksDB provider, set here on the session).

    Import-gated: the transformWithState state-server protocol needs
    ``protobuf``, which is not installed in this container — the
    processor definition and plan wiring are real; running it needs the
    dependency (one pip install on a real deployment).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(state-server protocol); not installed in this environment — "
            "use stream_running_user_totals (applyInPandasWithState) instead"
        ) from e

    # transformWithState only runs on the RocksDB state store.  Setting
    # providerClass is SESSION-WIDE: it is deliberately NOT set here as a
    # side effect (it would silently change the state store of every
    # later-started streaming query on the session) — the caller must opt
    # in explicitly.
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    if spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    ) != rocksdb:
        raise ValueError(
            "transformWithStateInPandas requires the RocksDB state store; "
            "set spark.conf.set('spark.sql.streaming.stateStore."
            f"providerClass', '{rocksdb}') on the session first (session-"
            "wide setting — affects all streaming queries)"
        )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "total double, n bigint"
            )

        def handleInputRows(self, key, rows, timer_values):
            total, n = (
                self._totals.get() if self._totals.exists() else (0.0, 0)
            )
            for pdf in rows:
                total += float(pdf[value_col].sum())
                n += len(pdf)
            self._totals.update((float(total), int(n)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "total_value": [total], "n_events": [n]}
            )

        def close(self) -> None:
            pass

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return stream.groupBy(user_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType="user_id bigint, total_value double, n_events bigint",
        outputMode="Update",
        timeMode="None",
    )


def stream_debounce(
    spark,
    source_dir: str,
    schema,
    ts_us_col: str = "ts_us",
    key_col: str = "user_id",
    window_us: int = 3_600_000_000,
    max_files_per_trigger: int | None = None,
):
    """Streaming twin of ``operators/timeseries.debounce``: per key, emit
    an event only if it is at least ``window_us`` after the last EMITTED
    one — throttled dedup with the anchor carried across micro-batches in
    ``applyInPandasWithState`` (state = one int64 per key: the last kept
    timestamp; bounded regardless of stream length).

    Parity contract: equals the batch operator when events arrive in
    event-time order (micro-batches are sorted internally, so any
    in-batch disorder is absorbed; only CROSS-batch disorder — a late
    event older than an already-emitted anchor — diverges, the same
    arrival-order caveat ``dropDuplicatesWithinWatermark`` documents).

    Output: ``key_col, ts_us_col`` rows that survive the throttle
    (append semantics via output mode 'update' — each kept row emits
    exactly once).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    if int(window_us) <= 0:
        raise ValueError("window_us must be positive")
    # key type follows the source schema (string device ids are as valid
    # as int64 user ids); the timestamp is int64 microseconds by contract
    key_field = next(f for f in schema.fields if f.name == key_col)
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType),
            T.StructField(ts_us_col, T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("last_kept", T.LongType())])

    def update(key, pdfs, state: "GroupState"):
        last = state.get[0] if state.exists else None
        kept: list[int] = []
        ts = np.sort(
            np.concatenate(
                [pdf[ts_us_col].to_numpy(dtype=np.int64) for pdf in pdfs]
            )
        )
        i = 0
        if last is not None:
            # skip everything still inside the previous anchor's window
            i = int(np.searchsorted(ts, last + window_us, side="left"))
        while i < len(ts):
            kept.append(int(ts[i]))
            i = int(np.searchsorted(ts, ts[i] + window_us, side="left"))
        if kept:
            state.update((kept[-1],))
            yield pd.DataFrame({key_col: key[0], ts_us_col: kept})

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # a SOURCE option: bounds each micro-batch so tests can prove the
        # anchor state survives batch boundaries
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    return (
        stream.select(key_col, ts_us_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


__all__ = [
    "load_events",
    "tumbling_window_stats",
    "sliding_window_stats",
    "session_stats",
    "stream_tumbling_counts",
    "stream_session_stats",
    "stream_dedup_within_watermark",
    "stream_click_purchase_join",
    "batch_click_purchase_join",
    "stream_running_user_totals",
    "stream_running_user_totals_tws",
    "stream_debounce",
]
