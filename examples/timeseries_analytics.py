"""End-user drive of the event/time-series analytics family: the
observability questions a product team asks of an event stream, composed
from the engine's operators.

Run:  python examples/timeseries_analytics.py  [sf_dir]
      (default /root/testdata/sf0.001)

  1. sessionize          — per-user session ordinals (30-min gap)
  2. funnel              — view → click → purchase within 7 days
  3. retention           — weekly cohorts × activity offset
  4. rolling + anomaly   — trailing-7d mean/σ, >2σ outliers
  5. debounce            — throttled dedup (≥1h between kept purchases)
  6. interval join       — error events matched to their session
  7. as-of + interpolate — hourly value series per user
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataslicer_spark.operators.joins import interval_join
from dataslicer_spark.operators.timeseries import (
    debounce,
    funnel_conversion,
    interpolate_linear,
    retention_cohorts,
    rolling_window_stats,
    sessionize,
)
from dataslicer_spark.operators.windows import largest_wins
from dataslicer_spark.session import get_spark
from dataslicer_spark.streaming.events import _epoch_us, load_events

HOUR = 3_600_000_000
DAY = 24 * HOUR


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("timeseries-analytics")
    events = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value",
        _epoch_us(F.col("ts")).alias("ts_us"),
    )
    print(f"events: {events.count()}")

    # 1. sessionize + per-session rollup
    labeled = sessionize(
        events, "ts_us", "user_id", gap_us=30 * 60 * 1_000_000,
        tiebreak_col="event_id",
    )
    sessions = labeled.groupBy("user_id", "session_seq").agg(
        F.min("ts_us").alias("s_lo"), F.max("ts_us").alias("s_hi"),
        F.count(F.lit(1)).alias("n_events"),
    )
    print(f"sessions: {sessions.count()}")

    # 2. funnel
    funnel_conversion(
        events, ["view", "click", "purchase"], "ts_us", "user_id",
        "event_type", horizon_us=7 * DAY,
    ).show()

    # 3. weekly retention
    retention_cohorts(events, "ts_us", "user_id", period_us=7 * DAY).orderBy(
        "cohort_start", "period_offset"
    ).show(8)

    # 4. rolling stats + anomalies
    rolled = rolling_window_stats(
        events, "ts_us", ["user_id"], "value", width_us=7 * DAY
    )
    anomalies = rolled.filter(
        (F.col("roll_n") >= 5)
        & (F.abs(F.col("value") - F.col("roll_mean")) > 2 * F.col("roll_std"))
    )
    print(f"anomalies (>2 sigma vs trailing 7d): {anomalies.count()}")

    # 5. debounce purchases (one kept per trailing hour per user)
    purchases = largest_wins(
        events.filter(F.col("event_type") == "purchase"),
        ["user_id", "ts_us"], "event_id",
    )
    kept = debounce(purchases, "ts_us", ["user_id"], window_us=HOUR)
    print(f"purchases: {purchases.count()} -> debounced: {kept.count()}")

    # 6. errors matched to the session they occurred in
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts_us", "event_id"
    )
    in_session = interval_join(
        errors, sessions, "ts_us", "s_lo", "s_hi",
        by_cols=["user_id"], bucket_width=30 * 60 * 1_000_000,
    )
    print(f"errors inside a session: {in_session.count()} / {errors.count()}")

    # 7. hourly interpolated purchase-value series
    series = interpolate_linear(
        kept.select("user_id", "ts_us", F.col("value").alias("v")),
        "ts_us", ["user_id"], "v", step_us=HOUR,
    )
    print(f"interpolated series points: {series.count()}")
    series.orderBy("user_id", "grid_ts").show(5)


if __name__ == "__main__":
    main()
