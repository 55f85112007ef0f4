"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``dataslicer_spark`` package; this module just
re-exports the registry (``dataslicer_spark/plans/star_queries.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the harness's working directory
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from dataslicer_spark.plans import astro_pipeline, extension_queries, star_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return star_queries.flagship(spark, "/root/testdata/sf0.001")


def _witnessed_rounds() -> dict[str, int]:
    """Map query name -> latest round whose committed driver CORRECTNESS
    artifact records it.  The driver only records the first 50 registry
    entries per round, so we rotate: keys never yet witnessed go to the
    front of the registry, and already-witnessed keys are ordered
    least-recently-witnessed first so the window sweeps the whole
    registry over successive rounds instead of re-checking the same
    early entries forever."""
    import glob
    import json
    import re

    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                for key, rec in json.load(fh).items():
                    # Only a SUCCESSFUL record counts as a witness: a
                    # query that ERRED at the driver boundary must go
                    # back to the front of the queue, not wait a full
                    # rotation lap (sk_hll_stats erred in r08 and would
                    # otherwise sit at position ~155 for three rounds
                    # after its fix).  Success = value-hash match, or a
                    # rows-only run (hash_match is None — no oracle)
                    # that actually produced rows.  hash_match=False is
                    # a FAILURE and must re-queue at the front.
                    ok = isinstance(rec, dict) and (
                        rec.get("hash_match") is True
                        or (
                            rec.get("hash_match") is None
                            and rec.get("spark_rows") is not None
                            and rec.get("err") in (None, "no_oracle")
                        )
                    )
                    if ok:
                        last[key] = max(last.get(key, 0), rnd)
        except Exception:
            continue
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + the
    north-star extensions (dedup / similarity / text / event windows)."""
    # astro first: its ~40-operator DAG must run before the other 75
    # queries fill the JVM's JIT code cache — A/B-measured both ways in
    # round 4: astro-first 16-46 s, astro-last 74 s (generated code left
    # interpreted once the code cache saturates); session.py also raises
    # ReservedCodeCacheSize for headroom
    full = {
        **astro_pipeline.QUERIES,
        **star_queries.QUERIES,
        **extension_queries.QUERIES,
    }
    witnessed = _witnessed_rounds()
    astro = [k for k in astro_pipeline.QUERIES if k in full]
    fresh = [k for k in full if k not in witnessed and k not in astro]
    rest = sorted(
        (k for k in full if k in witnessed and k not in astro),
        key=lambda k: witnessed[k],
    )
    return {k: full[k] for k in (*astro, *fresh, *rest)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys without an entry get the
    weaker rows-only check (non-SQL-expressible kernels: MinHash/SimHash/
    LSH use engine-specific hash functions — property-tested in pytest)."""
    return {**star_queries.ORACLES, **extension_queries.ORACLES}
