"""End-to-end LLM data pipeline (plans/extension_queries.llm_data_pipeline):
stage-count monotonicity, split partitioning, packing invariants.  Exact
value parity with DuckDB is covered by the query's oracle
(scripts/check_oracle.py llm_data_pipeline)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.plans.extension_queries import llm_data_pipeline

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_llm_pipeline_stage_invariants(spark):
    summary, st = llm_data_pipeline(spark, SF_DIR, return_stages=True)
    n = {k: st[k].count() for k in st}
    total = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    # each stage only removes rows
    assert total >= n["s1"] >= n["s2"] >= n["s3"] >= n["s4"] == n["s5"]
    # quality cut keeps ~half (ceil per language)
    assert n["s2"] <= n["s1"] * 0.5 + 10
    rows = {r.split: r for r in summary.collect()}
    # summary partitions s5 exactly
    assert sum(r.n_docs for r in rows.values()) == n["s5"]
    assert set(rows).issubset({"train", "val", "test"})
    assert rows["train"].n_docs > rows["val"].n_docs
    assert rows["train"].n_docs > rows["test"].n_docs
    # packing: pack count consistent with token totals (packs of 512 are
    # chunk-starts of the cumulative stream -> at least ceil(total/512)
    # when every doc is shorter than the window)
    for r in rows.values():
        assert r.n_packs >= 1
        assert r.n_packs <= r.n_docs
        assert r.total_tokens > 0


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_llm_pipeline_determinism(spark):
    a = llm_data_pipeline(spark, SF_DIR).collect()
    b = llm_data_pipeline(spark, SF_DIR).collect()
    assert a == b
