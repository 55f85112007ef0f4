"""End-user drive: the data-quality / drift-monitoring loop a recurring
crawl or CDC feed needs — EWMA smoothing and CUSUM change alarms per
series, seasonal decomposition, two-sample KS drift across cohorts,
embedding-centroid drift between snapshots, a Benford first-digit audit
of a money column, and a VERSION-AS-OF reconstruction from the change
log.  Run: ``python examples/monitoring_pipeline.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataslicer_spark.operators.drift import (  # noqa: E402
    embedding_centroid_drift,
    ks_2sample,
)
from dataslicer_spark.operators.scd import snapshot_as_of  # noqa: E402
from dataslicer_spark.operators.stats import benford_first_digit  # noqa: E402
from dataslicer_spark.operators.timeseries import (  # noqa: E402
    cusum_changepoints,
    ewma_smooth,
    seasonal_decompose_naive,
)
from dataslicer_spark.session import get_spark  # noqa: E402
from dataslicer_spark.streaming.events import (  # noqa: E402
    _epoch_us,
    load_events,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("monitoring-pipeline")
    events = load_events(spark, SF_DIR)
    series = events.select("user_id", "event_id", "value")

    # 1. smooth each user's value series, then alarm on sustained shifts
    smoothed = ewma_smooth(series, ["user_id"], "event_id", "value", 0.25)
    alarms = cusum_changepoints(
        series, ["user_id"], "event_id", "value",
        target=50.0, slack=15.0, threshold=120.0,
    ).filter("alarm")
    print(f"ewma rows: {smoothed.count()}; cusum alarms: {alarms.count()}")

    # 2. trend/seasonal/residual split of the event stream per type
    dec = seasonal_decompose_naive(
        events.select(
            "event_type", "event_id",
            _epoch_us(F.col("ts")).alias("ts_us"), "value",
        ),
        ["event_type"], "ts_us", "value",
        period_us=86_400_000_000, bucket_us=3_600_000_000,
        trend_halfwidth_us=21_600_000_000,
    )
    worst = dec.orderBy(F.desc(F.abs("residual"))).limit(3).collect()
    print(f"decomposed {dec.count()} points; "
          f"worst residuals {[round(r.residual, 1) for r in worst]}")

    # 3. scalar drift: do 'click' and 'view' events draw the same values?
    ks = ks_2sample(
        events.select(
            F.lit("value").alias("feature"), "event_type",
            F.floor("value").alias("v"),
        ),
        "event_type", "v", ["feature"], "click", "view",
    )
    print("ks drift:", [(r.feature, round(r.ks, 4)) for r in ks.collect()])

    # 4. embedding drift between snapshot halves, per label
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    drift = embedding_centroid_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        ["label"],
    )
    top = drift.orderBy(F.desc("dist2")).limit(3).collect()
    print(f"centroid drift: {drift.count()} labels; "
          f"max dist2 {[round(r.dist2, 4) for r in top]}")

    # 5. Benford audit of the money column
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    benford = benford_first_digit(
        li.select("l_extendedprice"), "l_extendedprice"
    )
    dev = benford.agg(F.max("abs_dev").alias("d")).collect()[0]["d"]
    print(f"benford max |dev|: {dev:.4f}")

    # 6. time travel: the account table as of mid-log
    snap = spark.read.parquet(
        os.path.join(SF_DIR, "customer.parquet")
    ).select(F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("val"))
    changes = events.select(
        F.col("user_id").alias("k"), F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        F.col("value").alias("val"),
    )
    past = snapshot_as_of(snap, changes, ["k"], "seq", "op", ["val"], 5000)
    now = snapshot_as_of(snap, changes, ["k"], "seq", "op", ["val"], 10**12)
    print(f"time travel: {past.count()} rows @seq<=5000, "
          f"{now.count()} rows at head")


if __name__ == "__main__":
    main()
