"""Targeted timing for r12 optimization work: min-of-N noop-sink reps per
query in ONE fresh session (same methodology as bench.py's child, without
family packing).  Usage:

    python scripts/measure_r12.py <reps> <query> [query...]

Prints one line per query: name, run vector, min.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dataslicer_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure_r12")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    registry = entrymod.queries()
    for name in names:
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: runs={runs} min={min(runs)}", flush=True)


if __name__ == "__main__":
    main()
