"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the ``noop`` sink — full computation,
no driver-side collection, mirroring a cluster write.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    import __spark_entry__ as entrymod
    from dataslicer_spark.session import get_spark

    spark = get_spark("bench")
    # JVM/codegen warmup so the first measured query doesn't absorb ~6s of
    # session initialization cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # (A per-query warmup pass at sf0.001 was tried and rejected: the
    # accumulated JVM/codegen-cache/GC state from 47 extra executions cost
    # more than the compile time it saved — measured 118s vs 89s total.)
    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
        # drop DataFrames cached inside operators so queries are timed
        # independently (no cross-query executor-memory interference)
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
