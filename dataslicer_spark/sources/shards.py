"""Training-shard sink: deterministic sharded export + manifest.

The last step of a curation pipeline is handing the corpus to a trainer,
which wants (a) a fixed number of similarly-sized shards it can assign
to data-loader workers, (b) assignment that is REPRODUCIBLE — the same
document lands in the same shard regardless of how the upstream job was
partitioned or ordered — and (c) a manifest it can trust without
re-scanning the data (row/token counts and an order-independent content
checksum per shard).

Design:

- shard id = ``uint32(md5(salt‖id)) % n_shards`` — content-derived, so
  re-runs, re-partitions, and re-orderings of the same corpus produce
  byte-identical shard membership (the same device as
  ``sampling.add_split``);
- ONE shuffle: ``repartition(n_shards, shard)`` co-locates each shard in
  exactly one task, so ``partitionBy("shard")`` writes one file per
  shard directory instead of files × partitions fragments;
- the manifest is ONE aggregate over the same shard-keyed frame
  (rows, token sum, and a sum-of-xhash64 checksum — integer sums are
  order-independent, so the checksum is stable under any execution
  order); written as ``_MANIFEST.json`` next to the shard directories;
- readers get shard-level partition pruning for free: shard dirs are
  hive-style ``shard=K`` partitions, so ``read_training_shards(...,
  shards=[3, 7])`` scans two directories, not the corpus.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..utils import check_col, local_df

_MANIFEST = "_MANIFEST.json"


def _manifest_aggs(id_col: str, token_col: str | None) -> list:
    """Per-shard manifest cells.  The checksum is Σ (xxhash64(id) mod
    2³⁰) — each summand is < 2³⁰ so the int64 sum is exact (no ANSI
    overflow) up to ~8·10⁹ rows per shard, and integer addition makes it
    independent of execution/partition order."""
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(2**30))
        ).alias("checksum"),
    ]
    if token_col:
        aggs.append(F.sum(F.col(token_col)).cast("long").alias("tokens"))
    return aggs


def _shard_col(id_col: str, n_shards: int, salt: str):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(n_shards)
    ).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    token_col: str | None = None,
    salt: str = "",
    compression: str = "zstd",
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` as ``n_shards`` hive-partitioned shards plus a
    ``_MANIFEST.json``; returns the manifest dict.

    ``fmt``: ``"parquet"`` (default) or ``"jsonl"`` — gzipped
    newline-delimited JSON, the other common trainer handoff format
    (Spark's json source IS JSONL: one object per line).

    The manifest records per shard: ``rows``, ``tokens`` (if
    ``token_col`` given), and ``checksum`` — Σ (xxhash64(id) mod 2³⁰),
    order-independent and partitioning-independent, so two exports of
    the same corpus can be compared without reading data files.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be parquet or jsonl, got {fmt!r}")
    check_col([id_col] + ([token_col] if token_col else []), df)

    sharded = df.withColumn("shard", _shard_col(id_col, n_shards, salt))
    writer = (
        sharded.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if fmt == "parquet":
        writer.option("compression", compression).parquet(path)
    else:
        writer.option("compression", "gzip").json(path)

    # derive the manifest from the data ACTUALLY WRITTEN, not by
    # re-evaluating `sharded`: if the input plan has nondeterministic
    # lineage (sampling, rand-derived columns), a second evaluation can
    # produce different rows and the manifest would disagree with the
    # files — verify_shards would later report phantom corruption.  The
    # re-read also certifies the files are readable end-to-end.
    spark = df.sparkSession
    if fmt == "parquet":
        written = spark.read.parquet(path)
    else:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(df.schema.jsonValue()).add(
            "shard", "integer"
        )
        written = spark.read.schema(schema).json(path)
    aggs = _manifest_aggs(id_col, token_col)
    per_shard = {
        int(r["shard"]): {k: int(r[k]) for k in r.asDict() if k != "shard"}
        for r in written.groupBy("shard").agg(*aggs).collect()
    }
    manifest = {
        "n_shards": n_shards,
        "salt": salt,
        "id_col": id_col,
        "token_col": token_col,
        "fmt": fmt,
        "schema": df.schema.jsonValue(),
        "total_rows": sum(s["rows"] for s in per_shard.values()),
        "shards": {str(k): per_shard[k] for k in sorted(per_shard)},
    }
    if token_col:
        manifest["total_tokens"] = sum(
            s["tokens"] for s in per_shard.values()
        )
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_training_shards(
    spark: SparkSession,
    path: str,
    shards: list[int] | None = None,
) -> DataFrame:
    """Read an exported shard set (format from the manifest; JSONL reads
    re-apply the manifest schema so dtypes round-trip); ``shards``
    selects a subset with directory-level partition pruning (the scan
    never opens other shards' files)."""
    m = read_manifest(path)
    if m.get("fmt", "parquet") == "jsonl":
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"]).add("shard", "integer")
        df = spark.read.schema(schema).json(path)
    else:
        df = spark.read.parquet(path)
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, _MANIFEST)) as f:
        return json.load(f)


def verify_shards(spark: SparkSession, path: str) -> DataFrame:
    """Re-derive per-shard rows/tokens/checksum from the stored files
    and join against the manifest — the trainer-side integrity check.
    Returns one row per shard with ``ok`` boolean."""
    m = read_manifest(path)
    df = read_training_shards(spark, path)
    got = df.groupBy("shard").agg(*_manifest_aggs(m["id_col"], m["token_col"]))
    rows = [
        (int(k), v["rows"], v["checksum"], v.get("tokens"))
        for k, v in m["shards"].items()
    ]
    want = local_df(
        spark, rows, "shard int, m_rows long, m_checksum long, m_tokens long"
    )
    ok = (F.col("rows") == F.col("m_rows")) & (
        F.col("checksum") == F.col("m_checksum")
    )
    if m["token_col"]:
        ok = ok & (F.col("tokens") == F.col("m_tokens"))
    return got.join(F.broadcast(want), "shard", "full").select(
        "shard", "rows", "m_rows", "checksum", "m_checksum",
        F.coalesce(ok, F.lit(False)).alias("ok"),
    )


__all__ = [
    "write_training_shards",
    "read_training_shards",
    "read_manifest",
    "verify_shards",
]
