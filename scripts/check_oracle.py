"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
values (columns sorted by name, rows sorted, exact equality with a
reported max-abs-diff for floats).  Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def reject_nonscalar(df: pd.DataFrame, name: str) -> None:
    """Fail exactly where the driver's canonicalizer fails.

    The driver sorts cell VALUES before hashing; a top-level array/map/
    struct cell is unhashable/unsortable there and errors the whole row —
    even for rows-only queries (this killed ``sk_hll_stats`` for six
    rounds while the old ``astype(str)`` coercion here hid it).  So: no
    coercion — a list/dict/ndarray/tuple/set cell is a hard FAIL."""
    head = df.head(100)
    for c in df.columns:
        if head[c].dtype != object:
            continue
        for v in head[c]:
            if isinstance(v, (list, dict, tuple, set, np.ndarray)):
                raise TypeError(
                    f"{name}: column {c!r} holds non-scalar cells "
                    f"({type(v).__name__}) — the driver canonicalizer "
                    "rejects these; emit scalar columns instead"
                )


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    try:
        reject_nonscalar(spark_pdf, name)
    except TypeError as e:
        return [str(e)]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols = sorted(c.lower() for c in spark_pdf.columns)
    d_cols = sorted(c.lower() for c in duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv = sv.astype("float64")
            dv = dv.astype("float64")
            both_nan = np.isnan(sv) & np.isnan(dv)
            eq = (sv == dv) | both_nan
            if not eq.all():
                bad = (~eq).sum()
                with np.errstate(invalid="ignore"):
                    mad = np.nanmax(np.abs(sv - dv))
                problems.append(f"col {c}: {bad} mismatches, max_abs_diff={mad:.3e}")
        else:
            if not (sv == dv).all():
                bad = (sv != dv).sum()
                i = int(np.argmax(sv != dv))
                problems.append(
                    f"col {c}: {bad} mismatches e.g. {sv[i]!r} vs {dv[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from dataslicer_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        missing = only - set(qs)
        if missing:
            print(f"FAIL unknown query names: {sorted(missing)}")
            return 1
    requested = [n for n in qs if not only or n in only]
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            try:
                reject_nonscalar(spark_pdf, name)
            except TypeError as e:
                print(f"FAIL {name}: {e}")
                n_fail += 1
                continue
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if len(spark_pdf) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match "
                  f"({time.time()-t0:.1f}s)")
    # count the REQUESTED subset, not the whole registry: a named-subset
    # run must print e.g. "9/9 ok", never "185/185 ok"
    print(f"\n{len(requested) - n_fail}/{len(requested)} ok")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
