"""Training-shard sink: deterministic membership, one file per shard,
manifest integrity, partition-pruned subset reads."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.sources.shards import (
    read_manifest,
    read_training_shards,
    verify_shards,
    write_training_shards,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("text").isNotNull())
        .withColumn("n_tokens", F.size(F.split(F.trim("text"), r"\s+")))
    )


def test_write_and_manifest(docs, tmp_path):
    path = str(tmp_path / "shards")
    m = write_training_shards(docs, path, "doc_id", 4, token_col="n_tokens")
    assert m["total_rows"] == docs.count()
    assert m["total_tokens"] == docs.agg(F.sum("n_tokens")).first()[0]
    assert set(m["shards"]) <= {"0", "1", "2", "3"}
    assert read_manifest(path) == m
    # one data file per shard directory (shard co-located by the
    # repartition before partitionBy)
    for k in m["shards"]:
        files = glob.glob(os.path.join(path, f"shard={k}", "*.parquet"))
        assert len(files) == 1, files


def test_membership_is_partitioning_invariant(docs, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ma = write_training_shards(docs, a, "doc_id", 4, token_col="n_tokens")
    mb = write_training_shards(
        docs.repartition(13).orderBy(F.rand(7)), b, "doc_id", 4,
        token_col="n_tokens",
    )
    assert ma["shards"] == mb["shards"]


def test_subset_read_prunes_partitions(docs, tmp_path, spark):
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", 4)
    sub = read_training_shards(spark, path, shards=[1, 3])
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan
    full = read_training_shards(spark, path)
    assert sub.count() == full.filter(F.col("shard").isin(1, 3)).count()
    assert sub.count() < full.count()


def test_verify_shards_detects_tamper(docs, tmp_path, spark):
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", 3, token_col="n_tokens")
    rep = verify_shards(spark, path)
    assert rep.filter(~F.col("ok")).count() == 0
    # drop one shard's data file -> that shard must fail verification
    victim = glob.glob(os.path.join(path, "shard=1", "*.parquet"))[0]
    os.remove(victim)
    # refresh: the parquet reader caches file listings per path
    spark.catalog.clearCache()
    rep2 = verify_shards(spark, path)
    bad = {r.shard for r in rep2.filter(~F.col("ok")).collect()}
    assert 1 in bad


def test_bad_args(docs, tmp_path):
    with pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "x"), "doc_id", 0)
    with pytest.raises(Exception):
        write_training_shards(docs, str(tmp_path / "y"), "nope", 2)


def test_jsonl_format_roundtrip_and_verify(docs, tmp_path, spark):
    import glob as _glob
    import os as _os

    path = str(tmp_path / "jsonl_shards")
    m = write_training_shards(
        docs.select("doc_id", "text", "n_tokens"), path, "doc_id", 3,
        token_col="n_tokens", fmt="jsonl",
    )
    assert m["fmt"] == "jsonl"
    files = _glob.glob(_os.path.join(path, "shard=*", "*.json.gz"))
    assert len(files) == len(m["shards"])  # gzipped jsonl, one per shard
    back = read_training_shards(spark, path)
    assert back.count() == m["total_rows"]
    assert dict(back.select("doc_id", "n_tokens").dtypes)["n_tokens"] == "int"
    rep = verify_shards(spark, path)
    assert rep.filter(~F.col("ok")).count() == 0

    with pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "z"), "doc_id", 2, fmt="csv")


def test_manifest_matches_files_under_nondeterministic_lineage(
    docs, tmp_path, spark
):
    """Regression (round-7 advice): the manifest is derived from the
    files actually written, not a re-evaluation of the input plan — a
    nondeterministic input (here a fractional sample without a fixed
    materialization) must still yield a manifest that verify_shards
    accepts."""
    path = str(tmp_path / "shards_nondet")
    nondet = docs.sample(0.5)  # re-evaluation can select different rows
    write_training_shards(nondet, path, "doc_id", n_shards=4)
    res = verify_shards(spark, path)
    assert res.filter(~F.col("ok")).count() == 0
    m = read_manifest(path)
    written_rows = read_training_shards(spark, path).count()
    assert m["total_rows"] == written_rows
