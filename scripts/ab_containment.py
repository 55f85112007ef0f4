"""A/B: containment_pairs direct vs prefix-filtered plan, by threshold.

The Jaccard twin's prefix cutoff (t >= 0.7) was A/B-measured for the
symmetric predicate, where BOTH sides prune to rare-first prefixes.  The
asymmetric containment plan keeps the FULL outer index (no size relation
bounds the outer side), so the candidate fanout — and thus where the
prefix plan starts winning — must be measured separately.

Runs the dd_containment registry corpus shape (sf docs + 40%-token
prefix re-entries, so containment-heavy pairs exist by construction) at
$SPARK_GRAFT_SF_DIR (default sf0.1) through both plans at
t in {0.7, 0.8, 0.9, 0.95}, warmed, best-of-2 per cell, then a 4x-corpus
scale probe for both plans at the registry threshold (0.9).  Prints one
JSON line per cell; paste the table into the containment docstring when
the cutoff changes.

Usage: python scripts/ab_containment.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataslicer_spark.operators.dedup import containment_pairs  # noqa: E402
from dataslicer_spark.session import get_spark  # noqa: E402


def build_corpus(spark, sf_dir: str, salt: int = 1):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = docs.select("doc_id", "text")
    if salt > 1:
        u = base
        for i in range(1, salt):
            u = u.unionByName(
                base.select(
                    (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
                    F.concat(F.lit(f"s{i} "), F.col("text")).alias("text"),
                )
            )
        base = u
    toks = F.split(F.trim(F.col("text")), r"\s+")
    prefix = base.select(
        (F.col("doc_id") + 200_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(
                toks, 1,
                F.greatest((F.size(toks) * 2) / F.lit(5), F.lit(4))
                .cast("int"),
            ),
        ).alias("text"),
    )
    return base.unionByName(prefix)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("ab-containment")
    corpus = build_corpus(spark, sf_dir).cache()
    n = corpus.count()
    print(f"# corpus rows: {n}", flush=True)

    def timed(threshold: float, use_prefix: bool, frame=None) -> float:
        frame = corpus if frame is None else frame

        def go():
            containment_pairs(
                frame, "doc_id", n=3, threshold=threshold,
                use_prefix=use_prefix,
            ).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()

        go()  # warm the plan shape
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            go()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    for t in (0.7, 0.8, 0.9, 0.95):
        d = timed(t, use_prefix=False)
        p = timed(t, use_prefix=True)
        print(json.dumps({
            "threshold": t, "direct_sec": d, "prefix_sec": p,
            "prefix_over_direct": round(p / d, 2),
        }), flush=True)

    big = build_corpus(spark, sf_dir, salt=4).cache()
    nb = big.count()
    print(f"# 4x corpus rows: {nb}", flush=True)
    for plan, use_prefix in (("direct", False), ("prefix", True)):
        t1 = timed(0.9, use_prefix)
        t4 = timed(0.9, use_prefix, frame=big)
        print(json.dumps({
            "probe": f"containment_{plan}_t0.9", "t_1x_sec": t1,
            "t_4x_sec": t4, "scaling_factor": round(t4 / t1, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
