"""Split & packing operators (operators/sampling.py): determinism,
proportions, and packing invariants."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.sampling import (
    add_split,
    pack_documents,
    split_thresholds,
)


def test_split_proportions_and_determinism(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    out = add_split(df, "doc_id")
    frac = {
        r.split: r.n / 20_000
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(frac["train"] - 0.9) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01
    assert abs(frac["test"] - 0.05) < 0.01

    # row-order / partitioning independence: same assignment after a shuffle
    a = {r.doc_id: r.split for r in out.collect()}
    b = {
        r.doc_id: r.split
        for r in add_split(df.repartition(17).orderBy(F.rand(3)), "doc_id").collect()
    }
    assert a == b

    # salt re-draws
    c = {r.doc_id: r.split for r in add_split(df, "doc_id", salt="x").collect()}
    assert c != a


def test_split_weight_validation(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="align"):
        add_split(df, "doc_id", weights=(1, 2), names=("a",))


def test_pack_documents_invariants(spark):
    pdf = pd.DataFrame({"doc_id": range(100), "n": [150] * 100})
    out = (
        pack_documents(
            spark.createDataFrame(pdf), "doc_id", "n", max_tokens=1000
        )
        .toPandas()
        .sort_values("doc_id")
    )
    # pack ids are non-decreasing in order, start at 0, no gaps
    packs = out.pack_id.tolist()
    assert packs[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(packs, packs[1:]))
    # each doc starts in the chunk its cumulative offset falls in
    cum = 0
    for _, r in out.iterrows():
        assert r.pack_id == cum // 1000
        cum += r.n


def test_pack_documents_sharded(spark):
    pdf = pd.DataFrame(
        {"doc_id": range(40), "n": [100] * 40, "shard": [0, 1] * 20}
    )
    out = pack_documents(
        spark.createDataFrame(pdf), "doc_id", "n", max_tokens=500,
        partition_cols=["shard"],
    ).toPandas()
    for shard, grp in out.groupby("shard"):
        grp = grp.sort_values("doc_id")
        cum = 0
        for _, r in grp.iterrows():
            assert r.pack_id == cum // 500
            cum += r.n


def test_split_thresholds_monotone():
    t = split_thresholds((0.5, 0.25, 0.25))
    assert t == sorted(t) and len(t) == 2
    assert t[0] == int(0.5 * 2**32)


def test_split_weights_property(spark):
    # arbitrary weight vectors: partition is total and proportions track
    # weights (fixed-seed sweep; session fixture doesn't compose with @given)
    import numpy as np

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i,) for i in range(30_000)], "doc_id long"
    ).cache()
    for _ in range(3):
        raw = rng.uniform(0.05, 1.0, rng.integers(2, 5))
        weights = tuple(raw / raw.sum())
        names = tuple(f"s{i}" for i in range(len(weights)))
        got = {
            r.split: r.n
            for r in add_split(df, "doc_id", weights, names)
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert sum(got.values()) == 30_000
        for w, name in zip(weights, names):
            frac = got.get(name, 0) / 30_000
            assert abs(frac - w) < 0.02, (weights, got)


def test_pack_documents_random_property(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(9)
    for _ in range(3):
        n = int(rng.integers(5, 200))
        cap = int(rng.integers(50, 500))
        toks = rng.integers(1, 120, n)
        pdf = pd.DataFrame({"doc_id": range(n), "n": toks})
        out = (
            pack_documents(spark.createDataFrame(pdf), "doc_id", "n", cap)
            .toPandas()
            .sort_values("doc_id")
        )
        cum = 0
        for _, r in out.iterrows():
            assert r.pack_id == cum // cap
            cum += r.n


def test_split_null_ids_get_null_split(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1.0, 2.0, None]})
    )
    out = {r.doc_id: r.split for r in add_split(df, "doc_id").collect()}
    assert out[1.0] in ("train", "val", "test")
    import math

    null_rows = [v for k, v in out.items() if k is None or (isinstance(k, float) and math.isnan(k))]
    assert null_rows == [None]


def test_stratified_sample_exact_counts_and_determinism(spark):
    from dataslicer_spark.operators.sampling import stratified_sample

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )
    out = stratified_sample(df, "g", 30, key_col="k")
    counts = {r.g: r.c for r in out.groupBy("g").agg(F.count("*").alias("c")).collect()}
    assert counts == {0: 30, 1: 30, 2: 30, 3: 30}

    # partitioning-independent: same subset after a repartition
    a = {(r.g, r.k) for r in out.collect()}
    b = {
        (r.g, r.k)
        for r in stratified_sample(df.repartition(17), "g", 30, key_col="k").collect()
    }
    assert a == b

    # stratum smaller than n: keep all of it
    small = df.filter((F.col("g") != 0) | (F.col("k") < 8))
    c2 = {
        r.g: r.c
        for r in stratified_sample(small, "g", 30, key_col="k")
        .groupBy("g").agg(F.count("*").alias("c")).collect()
    }
    assert c2[0] == 2  # only k in {0,4} survive the filter for g=0
    assert c2[1] == c2[2] == c2[3] == 30

    # salt re-draws
    c = {
        (r.g, r.k)
        for r in stratified_sample(df, "g", 30, key_col="k", salt="x").collect()
    }
    assert c != a


def test_quantize_embeddings_bounds_and_reconstruction(spark):
    import numpy as np

    from dataslicer_spark.operators.similarity import quantize_embeddings

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(50)]
    vecs.append((99, [0.0] * 16))  # all-zero vector: NULL scale, no blow-up
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in quantize_embeddings(df, "vec_id").collect()}

    assert out[99].embedding_scale is None
    assert all(q is None for q in out[99].q_embedding)
    for i, v in vecs[:-1]:
        r = out[i]
        assert max(abs(q) for q in r.q_embedding) == 127  # amax maps to ±127
        for x, q in zip(v, r.q_embedding):
            assert abs(q) <= 127
            # dequantized value within half a quantization step
            assert abs(x - q / r.embedding_scale) <= 0.5 / r.embedding_scale + 1e-12


def test_materialize_packs_concatenates_in_id_order(spark):
    from dataslicer_spark.operators.sampling import materialize_packs

    pdf = pd.DataFrame(
        {
            "doc_id": [3, 1, 2, 10],
            "n": [4, 2, 3, 1],
            "text": ["cc", "aa", "bb", "dd"],
            "pack_id": [0, 0, 0, 1],
        }
    )
    out = {
        r.pack_id: r
        for r in materialize_packs(
            spark.createDataFrame(pdf).repartition(7),
            "doc_id", "n", "text",
        ).collect()
    }
    assert out[0].pack_text == "aa <eos> bb <eos> cc"
    assert (out[0].n_docs, out[0].total_tokens) == (3, 9)
    assert out[1].pack_text == "dd"
    # deterministic under reordering
    out2 = {
        r.pack_id: r.pack_text
        for r in materialize_packs(
            spark.createDataFrame(pdf.sample(frac=1.0, random_state=3)),
            "doc_id", "n", "text",
        ).collect()
    }
    assert out2 == {k: v.pack_text for k, v in out.items()}


# ---------------------------------------------------------------------------
# weighted_sample (A-ES weighted sampling without replacement)
# ---------------------------------------------------------------------------


def test_weighted_sample_size_and_determinism(spark):
    from dataslicer_spark.operators.sampling import weighted_sample

    rows = [(i, "g" if i % 2 else "h", float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    out = weighted_sample(df, "w", k=10, id_col="id", group_cols=["grp"])
    got = out.collect()
    per = {}
    for r in got:
        per.setdefault(r["grp"], set()).add(r["id"])
    assert all(len(v) == 10 for v in per.values())
    # deterministic under repartitioning
    got2 = weighted_sample(
        df.repartition(17), "w", k=10, id_col="id", group_cols=["grp"]
    ).collect()
    assert sorted((r["grp"], r["id"]) for r in got) == sorted(
        (r["grp"], r["id"]) for r in got2
    )


def test_weighted_sample_prefers_heavy_rows(spark):
    from dataslicer_spark.operators.sampling import weighted_sample

    # one row with weight 5000 among 50 rows of weight 1: over 40 salts it
    # must land in a k=5 sample nearly always
    rows = [(i, 5000.0 if i == 0 else 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, w double")
    hits = 0
    for s in range(40):
        ids = {
            r["id"]
            for r in weighted_sample(
                df, "w", k=5, id_col="id", salt=f"s{s}"
            ).collect()
        }
        assert len(ids) == 5
        hits += 0 in ids
    assert hits >= 38


def test_weighted_sample_excludes_nonpositive(spark):
    from dataslicer_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 2.0)], "id long, w double"
    )
    ids = {r["id"] for r in weighted_sample(df, "w", k=4, id_col="id").collect()}
    assert ids == {4}


def test_weighted_sample_ungrouped_no_global_window(spark):
    from dataslicer_spark.operators.sampling import weighted_sample

    df = spark.range(1000).selectExpr("id", "CAST(1 + id % 5 AS DOUBLE) AS w")
    out = weighted_sample(df, "w", k=7, id_col="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert out.count() == 7


# ---------------------------------------------------------------------------
# mixture_resample (explicit target domain mixture)
# ---------------------------------------------------------------------------


def test_mixture_resample_hits_target_shares(spark):
    from dataslicer_spark.operators.sampling import mixture_resample

    # 4000 web / 2000 books / 1000 code rows; target 50/25/25.
    # binding source: code (1000/0.25 = 4000 = T) -> expect ~2000/1000/1000
    rows = (
        [(i, "web") for i in range(4000)]
        + [(10_000 + i, "books") for i in range(2000)]
        + [(20_000 + i, "code") for i in range(1000)]
    )
    df = spark.createDataFrame(rows, "id long, src string")
    out = mixture_resample(
        df, "src", "id", {"web": 0.5, "books": 0.25, "code": 0.25}
    )
    got = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    assert got["code"] == 1000  # binding source fully kept (p=1)
    assert abs(got["web"] - 2000) < 150  # binomial tolerance ~3 sigma
    assert abs(got["books"] - 1000) < 120
    # realized share of web ~ 50%
    total = sum(got.values())
    assert abs(got["web"] / total - 0.5) < 0.04


def test_mixture_resample_deterministic_and_drops_unlisted(spark):
    from dataslicer_spark.operators.sampling import mixture_resample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, src string")
    out1 = mixture_resample(df, "src", "id", {"a": 0.5, "b": 0.5})
    out2 = mixture_resample(df.repartition(13), "src", "id", {"a": 0.5, "b": 0.5})
    ids1 = sorted(r["id"] for r in out1.collect())
    ids2 = sorted(r["id"] for r in out2.collect())
    assert ids1 == ids2
    assert not any(i % 3 == 2 for i in ids1)  # source 'c' dropped


def test_mixture_resample_empty_targets_raises(spark):
    import pytest as _pytest

    from dataslicer_spark.operators.sampling import mixture_resample

    df = spark.createDataFrame([(1, "a")], "id long, src string")
    with _pytest.raises(ValueError):
        mixture_resample(df, "src", "id", {})


def test_mixture_resample_missing_target_source_raises(spark):
    import pytest as _pytest

    from dataslicer_spark.operators.sampling import mixture_resample

    df = spark.createDataFrame(
        [(i, "web" if i % 2 else "books") for i in range(50)],
        "id long, src string",
    )
    with _pytest.raises(ValueError, match="absent from the data"):
        mixture_resample(df, "src", "id", {"web": 0.5, "code": 0.5})
