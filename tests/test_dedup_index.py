"""Persistent MinHash/LSH index (operators/dedup_index.py): the
incremental-ingestion loop — build, probe batches, append survivors —
plus parameter-contract and plan-shape checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.dedup import minhash_lsh_pairs
from dataslicer_spark.operators.dedup_index import (
    build_minhash_index,
    dedup_against_minhash_index,
)


def _mutate(df, id_shift, drop_words=3):
    """Near-duplicate copies: shift ids, drop the last few words."""
    toks = F.split(F.col("text"), r"\s+")
    return df.select(
        (F.col("doc_id") + id_shift).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.size(toks) - drop_words)
        ).alias("text"),
    )


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    import os

    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .limit(120)
        .cache()
    )


def test_incremental_ingestion_loop(spark, docs, tmp_path):
    path = str(tmp_path / "mhidx")
    seed = docs.limit(60)
    build_minhash_index(seed, path, "doc_id")

    # batch 1: 30 fresh docs + near-dup copies of 20 indexed ones
    fresh1 = docs.subtract(seed).limit(30)
    dups_of_indexed = _mutate(seed.limit(20), 500_000)
    batch1 = fresh1.unionByName(dups_of_indexed)
    surv1, matches1 = dedup_against_minhash_index(
        batch1, path, "doc_id", threshold=0.5
    )
    matched_new = {r.new_id for r in matches1.collect()}
    # high recall on planted near-dups of indexed docs
    assert len(matched_new & {r.doc_id + 500_000 for r in seed.limit(20).collect()}) >= 16
    surv_ids = {r.doc_id for r in surv1.select("doc_id").collect()}
    assert surv_ids & {r.doc_id for r in fresh1.collect()}  # fresh kept
    assert not (surv_ids & matched_new)  # matched dropped

    # batch 2: copies of batch-1 SURVIVORS must now match (survivors were
    # appended), and re-sending an already-matched dup still matches
    batch2 = _mutate(fresh1.limit(10), 700_000)
    surv2, matches2 = dedup_against_minhash_index(
        batch2, path, "doc_id", threshold=0.5
    )
    assert matches2.count() >= 8  # recall vs the newly appended docs
    assert surv2.count() <= 2


def test_within_batch_dedup_keeps_smaller_id(spark, docs, tmp_path):
    path = str(tmp_path / "mhidx2")
    build_minhash_index(docs.limit(0), path, "doc_id")  # empty index
    base = docs.limit(10)
    batch = base.unionByName(_mutate(base, 900_000, drop_words=2))
    surv, matches = dedup_against_minhash_index(
        batch, path, "doc_id", threshold=0.5
    )
    # the smaller-id originals survive; their mutated twins drop
    ids = {r.doc_id for r in surv.select("doc_id").collect()}
    assert {r.doc_id for r in base.collect()} <= ids
    assert all(i < 900_000 for i in ids)
    assert matches.count() == 0  # empty index -> no cross-index matches


def test_probe_parity_with_pairwise_lsh(spark, docs, tmp_path):
    """Index probe must find the same (indexed, new) pairs as running
    pairwise minhash_lsh_pairs over the union — same signatures, same
    bands, same estimate."""
    path = str(tmp_path / "mhidx3")
    old = docs.limit(40)
    build_minhash_index(old, path, "doc_id")
    new = _mutate(old.limit(15), 500_000)
    _surv, matches = dedup_against_minhash_index(
        new, path, "doc_id", threshold=0.5, append_survivors=False
    )
    got = {(r.index_id, r.new_id, r.est_jaccard) for r in matches.collect()}

    both = minhash_lsh_pairs(
        old.unionByName(new), "doc_id", threshold=0.5
    )
    want = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in both.collect()
        if r.id_a < 500_000 <= r.id_b  # cross old->new pairs only
    }
    assert got == want


def test_append_false_leaves_index_untouched(spark, docs, tmp_path):
    path = str(tmp_path / "mhidx4")
    build_minhash_index(docs.limit(20), path, "doc_id")
    import os

    before = sorted(os.listdir(os.path.join(path, "signatures")))
    new = _mutate(docs.limit(5), 800_000)
    dedup_against_minhash_index(
        new, path, "doc_id", append_survivors=False
    )[0].count()
    assert sorted(os.listdir(os.path.join(path, "signatures"))) == before


def test_band_table_is_scanned_not_shuffled(spark, docs, tmp_path):
    """Scale contract: candidate generation broadcast-joins the batch
    keys against the stored band table — no exchange on the stored
    side."""
    path = str(tmp_path / "mhidx5")
    build_minhash_index(docs.limit(40), path, "doc_id")
    new = _mutate(docs.limit(5), 800_000)
    _surv, matches = dedup_against_minhash_index(
        new, path, "doc_id", append_survivors=False
    )
    plan = matches._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_compact_index_reduces_files_preserves_probes(spark, docs, tmp_path):
    """After several appends the index has files ∝ batches; compaction
    collapses them and probe results are unchanged."""
    import os

    from dataslicer_spark.operators.dedup_index import compact_minhash_index

    path = str(tmp_path / "mhidx5")
    build_minhash_index(docs.limit(30), path, "doc_id")
    for i in range(1, 4):  # three daily batches
        batch = docs.limit(30 + 10 * i).subtract(docs.limit(30 + 10 * (i - 1)))
        dedup_against_minhash_index(batch, path, "doc_id", threshold=0.9)

    def n_files(table):
        d = os.path.join(path, table)
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    before_sigs = n_files("signatures")
    assert before_sigs > 1  # appends accumulated small files

    probe = _mutate(docs.limit(20), 900_000)
    _, m_before = dedup_against_minhash_index(
        probe, path, "doc_id", threshold=0.5, append_survivors=False
    )
    want = {(r.new_id, r.index_id) for r in m_before.collect()}

    out = compact_minhash_index(spark, path, target_mb=128)
    assert out["signatures"] == 1 and out["bands"] == 1
    assert n_files("signatures") == 1 and n_files("bands") == 1

    _, m_after = dedup_against_minhash_index(
        probe, path, "doc_id", threshold=0.5, append_survivors=False
    )
    assert {(r.new_id, r.index_id) for r in m_after.collect()} == want
    assert want  # the probe actually matched something


def test_returned_frames_survive_later_appends(spark, docs, tmp_path):
    """Regression (round-7 advice): with append_survivors=True the
    returned survivors/matches must be materialized BEFORE the index
    append — a lazy plan would re-list the index paths on evaluation,
    see the batch's own signatures already appended, and self-match
    every document away."""
    path = str(tmp_path / "mhidx6")
    build_minhash_index(docs.limit(0), path, "doc_id")
    batch1 = docs.limit(25)

    # expected result from a dry-run against the still-empty index
    # (within-batch near-dups may legitimately drop a few rows)
    want_surv = {
        r.doc_id
        for r in dedup_against_minhash_index(
            batch1, path, "doc_id", threshold=0.5, append_survivors=False
        )[0].select("doc_id").collect()
    }
    assert want_surv  # sanity: the batch is not empty

    surv1, matches1 = dedup_against_minhash_index(
        batch1, path, "doc_id", threshold=0.5
    )  # defaults: append_survivors=True, release_cache=False

    # mutate the index again before evaluating batch 1's results
    batch2 = docs.subtract(batch1).limit(10)
    dedup_against_minhash_index(batch2, path, "doc_id", threshold=0.5)

    # batch 1 was all-new vs an empty index: no index match may appear,
    # and survivors must equal the dry-run set, stably across repeated
    # evaluation — a lazy plan re-listing the appended index would
    # self-match everything away
    assert matches1.count() == 0
    got = {r.doc_id for r in surv1.select("doc_id").collect()}
    assert got == want_surv
    assert surv1.count() == len(want_surv)


def test_compact_rejects_non_local_path(spark):
    from dataslicer_spark.operators.dedup_index import compact_minhash_index

    with pytest.raises(ValueError, match="local filesystem"):
        compact_minhash_index(spark, "s3://bucket/index")


# ---------------------------------------------------------------------------
# b-bit storage mode (round 11): bits= in build/probe
# ---------------------------------------------------------------------------

def _tree_bytes(d):
    import os

    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _dd, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    )


def test_bbit_index_signature_table_shrinks_4x(spark, docs, tmp_path):
    """The b-bit kernel's stated payoff is a smaller PERSISTED index:
    at bits=8 the signature table stores 8 packed words/doc instead of
    64 — on-disk bytes must shrink >=4x (the 8x raw ratio minus parquet
    row/metadata overhead).  The band table is format-invariant (one
    (id, band, bucket) row per band either way)."""
    full, bb = str(tmp_path / "full"), str(tmp_path / "bb")
    corpus = docs.limit(100)
    build_minhash_index(corpus, full, "doc_id", num_perm=64, bands=32)
    build_minhash_index(
        corpus, bb, "doc_id", num_perm=64, bands=32, bits=8
    )
    import os

    full_b = _tree_bytes(os.path.join(full, "signatures"))
    bb_b = _tree_bytes(os.path.join(bb, "signatures"))
    assert bb_b > 0 and full_b >= 4 * bb_b


def test_bbit_probe_exact_verified_superset_of_full_width(spark, docs, tmp_path):
    """Equal full-width slots imply equal b-bit lanes, so the b-bit
    candidate set is a SUPERSET of full-width banding; after exact
    Jaccard verification both outputs are engine-independent and the
    b-bit one can only contain MORE true pairs (random lane collisions
    add candidates, never drop them)."""
    full, bb = str(tmp_path / "fullx"), str(tmp_path / "bbx")
    old = docs.limit(40)
    new = _mutate(old.limit(15), 500_000)
    build_minhash_index(old, full, "doc_id", num_perm=64, bands=32)
    build_minhash_index(old, bb, "doc_id", num_perm=64, bands=32, bits=8)
    kw = dict(threshold=0.5, append_survivors=False, exact_verify_with=old)
    got_full = {
        (r.index_id, r.new_id, round(r.jaccard, 9))
        for r in dedup_against_minhash_index(new, full, "doc_id", **kw)[1].collect()
    }
    got_bb = {
        (r.index_id, r.new_id, round(r.jaccard, 9))
        for r in dedup_against_minhash_index(new, bb, "doc_id", **kw)[1].collect()
    }
    assert len(got_full) >= 12  # planted near-dups found
    assert got_full <= got_bb


def test_bbit_incremental_append_loop(spark, docs, tmp_path):
    """The ingestion loop works unchanged on a b-bit index: appended
    survivors are found by the next batch's probe, with the probe
    reading ALL parameters (incl. bits) from the stored meta."""
    path = str(tmp_path / "bbloop")
    seed = docs.limit(40)
    build_minhash_index(seed, path, "doc_id", num_perm=64, bands=32, bits=8)
    fresh = docs.subtract(seed).limit(20)
    surv1, m1 = dedup_against_minhash_index(
        fresh, path, "doc_id", threshold=0.5
    )
    # the synthetic corpus contains GENUINE near-dups, so a few fresh
    # docs may legitimately match the index — but most must survive
    assert surv1.count() >= 15
    batch2 = _mutate(fresh.limit(10), 700_000)
    surv2, m2 = dedup_against_minhash_index(
        batch2, path, "doc_id", threshold=0.5
    )
    assert m2.count() >= 8  # recall vs newly appended b-bit signatures
    assert surv2.count() <= 2
    # est_jaccard comes from the collision-corrected b-bit estimator
    assert all(0.0 <= r.est_jaccard <= 1.0 for r in m2.collect())


def test_bbit_build_rejects_bad_bits(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="divide 64"):
        build_minhash_index(
            docs.limit(5), str(tmp_path / "bad"), "doc_id", bits=5
        )
