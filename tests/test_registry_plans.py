"""Registry-wide plan gate: every driver-contract query's physical plan
is linted for 100 TB scale antipatterns (plans/linter.py).

Three findings are NEVER allowed anywhere: ``cartesian-product``,
``row-wise-python-udf``, ``unbounded-following-frame``.  The other two
are allowed only where a manual audit established the pattern is
aggregate-sized or a deliberate tiny-broadcast design — each allowance
is justified inline.  A new query that introduces a global window, an
accidental cross join, or a row-at-a-time Python UDF fails this test.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from dataslicer_spark.plans.linter import explain_scale_report

SF = "/root/testdata/sf0.001"

NEVER = {"cartesian-product", "row-wise-python-udf", "unbounded-following-frame"}

# query -> allowed finding ids, each with an audited reason:
ALLOW = {
    # synthetic fixture fans 5 exposures per star via an intentional
    # crossJoin (5-row broadcast side); the count inflates because the
    # fixture lineage is printed under every downstream reuse
    "astro_flagship_pipeline": {"nested-loop-join"},
    # same fixture crossJoin (5-row exposure side) + the 1-row min/max
    # bin-range broadcast in the deterministic IQR stage
    "astro_flagship_oracle": {"nested-loop-join"},
    # dust-grain circle table is a tiny broadcast dimension (reference
    # semantics: srcdf.py:655-662) — point-in-circle needs the pair test
    "j6_tag_dust": {"nested-loop-join"},
    # global distinct-count output is ONE row — the single partition holds
    # the final scalar aggregate, not data
    "a6_distinct_stats": {"single-partition-exchange"},
    # broadcast 1-row global min/max (replaces the former global window);
    # the single partitions are the 1-row aggregate's final stages
    "m3_iqr_outliers": {"nested-loop-join", "single-partition-exchange"},
    # brute-force top-k: query side is broadcast BY DESIGN (corpus never
    # shuffles) — documented in operators/similarity.py
    "sim_topk_bruteforce": {"nested-loop-join"},
    # threshold sweep: the 5-row threshold list broadcasts against the
    # pre-mined pair table (bounded fanout len(thresholds)·|pairs|) —
    # documented in operators/dedup.dedup_threshold_sweep
    "dd_dedup_sweep": {"nested-loop-join"},
    # Benford: the grand total is a broadcast 1-row aggregate re-joined
    # to the 9-row digit histogram (the m3 pattern)
    "dq_benford": {"nested-loop-join"},
    # mutual NN: both directions are brute-force cosine_topk over small
    # id-slice subsets (query side broadcast BY DESIGN, same audit as
    # sim_topk_bruteforce) — feed ANN candidates for full-corpus use
    "emb_mutual_nn": {"nested-loop-join"},
    # theta-sketch set algebra: outputs are sketch-sized (a few rows);
    # the nested loop joins two 1-row sketch aggregates
    "sk_theta_sets": {"nested-loop-join", "single-partition-exchange"},
    # funnel summary is step-count-sized (<10 rows)
    "ev_funnel": {"single-partition-exchange"},
    "ev_funnel_by_session": {"single-partition-exchange"},
    # table profile / constraint report = global scalar aggregates
    "dq_profile": {"single-partition-exchange"},
    "dq_constraints": {"single-partition-exchange"},
    # documented broadcast 1-row totals cross-join (see
    # operators/sampling.temperature_resample docstring)
    "samp_temperature": {"nested-loop-join", "single-partition-exchange"},
    # same pattern: broadcast 1-row mixture cap (sampling.mixture_resample)
    "samp_mixture": {"nested-loop-join", "single-partition-exchange"},
    # same pattern: broadcast 1-row tercile cutpoints (the percentile
    # aggregate is the single partition; everything after is map-only)
    "samp_perplexity_buckets": {"nested-loop-join", "single-partition-exchange"},
    "llm_data_pipeline": {"nested-loop-join", "single-partition-exchange"},
    # the bloom bitmap is a deliberate 1-row broadcast relation (that is
    # the whole point: ship a bounded bitmap instead of the dim keys)
    "j10_bloom_join": {"nested-loop-join"},
    # AUC mid-ranks run over the SCORE HISTOGRAM (distinct integer
    # scores — aggregate-sized), then a 1-row scalar aggregate
    "txt_classifier_eval": {"single-partition-exchange"},
    # running sum over the DAY HISTOGRAM (calendar-sized — the event
    # rows were aggregated away two stages earlier)
    "ev_running_distinct": {"single-partition-exchange"},
    # the census output is ONE row: the nested loop joins the 1-row
    # degree summary to the 1-row triangle count; the single partitions
    # are those scalar aggregates' final stages
    "gr_triangles": {"nested-loop-join", "single-partition-exchange"},
    # the moment-cell aggregate is ONE row (15 exact cells); the single
    # partition is that scalar aggregate's final stage
    "a17_corr_matrix": {"single-partition-exchange"},
    # replicate ranking walks B=64 rows; the nested loop joins the
    # 1-row full-mean aggregate to the 1-row CI aggregate
    "samp_bootstrap_ci": {"nested-loop-join", "single-partition-exchange"},
    # composes sim_topk_bruteforce (broadcast query side BY DESIGN) and
    # ends in a 1-row scalar aggregate
    "emb_recall_eval": {"nested-loop-join", "single-partition-exchange"},
    # two exact brute-force sides (full-dim + truncated), each with the
    # broadcast-query-side nested loop BY DESIGN, joined into a 1-row
    # recall aggregate
    "emb_truncation_eval": {"nested-loop-join",
                            "single-partition-exchange"},
    # the nested loop joins the broadcast 1-ROW corpus-stats aggregate
    # (N, Σdl, per-term df); the single partitions are that scalar
    # aggregate's final stage and the rank window over the ≤k rows that
    # survive the distributed TakeOrdered (operators/retrieval.py)
    "txt_bm25_topk": {"nested-loop-join", "single-partition-exchange"},
    # same scoring kernel as txt_bm25_topk behind the persistent index:
    # the nested loop is the broadcast 1-ROW corpus-stats aggregate and
    # the single partition is the ≤k rank window
    "txt_bm25_index_search": {"nested-loop-join",
                              "single-partition-exchange"},
    # probe-only twin: identical scoring kernel, same 1-row broadcast
    # and ≤k rank window
    "txt_bm25_index_probe": {"nested-loop-join",
                             "single-partition-exchange"},
    # the cumulative-coverage window walks the ≤64-row FREQUENCY-BUCKET
    # table (the term rows were aggregated away one stage earlier) and
    # the total-token scalar is a 1-row aggregate
    "txt_freq_spectrum": {"single-partition-exchange"},
    # the single partition is the rank window over the ≤k rows that
    # survive the distributed TakeOrdered (operators/dsir.py); the
    # bucket-model join is a broadcast equi join
    "samp_dsir_select": {"single-partition-exchange"},
    # the nested loop joins the broadcast 1-ROW corpus-stats aggregate
    # (N, Σdl) onto the matched tf frame (operators/retrieval.py)
    "txt_bm25_multiquery": {"nested-loop-join"},
    # composes bm25 (1-row stats broadcast) and cosine_topk (query side
    # broadcast BY DESIGN); the single partitions are the ≤k rank
    # windows over the two TakeOrdered survivor sets + the fused top-10
    "txt_hybrid_rrf": {"nested-loop-join", "single-partition-exchange"},
    # the summary crossJoins the 1-ROW leak-counter aggregate onto the
    # ≤|splits| per-split counts — both sides aggregate-sized
    "samp_leakage_safe_split": {"nested-loop-join"},
}


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_registry_plan_is_scale_clean(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)

    # Driver-canonicalization contract: the driver sorts cell VALUES
    # before hashing, so a top-level array/map/struct output column is
    # unhashable there and errors the whole correctness row — even for
    # rows-only queries (this is exactly how sk_hll_stats stayed red for
    # six rounds).  Emit scalar columns (q25/q50/q75, not an array).
    from pyspark.sql.types import ArrayType, MapType, StructType
    nonscalar = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nonscalar, (
        f"{name}: non-scalar top-level output columns {nonscalar} — the "
        "driver canonicalizer rejects these; flatten to scalar columns"
    )

    findings = explain_scale_report(df)
    allowed = ALLOW.get(name, set())
    bad = [f for f in findings if f.check in NEVER or f.check not in allowed]
    assert not bad, f"{name}: " + "; ".join(map(str, bad))
