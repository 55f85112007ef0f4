"""E2 — the reference's canonical end-to-end analysis pipeline
(SURVEY.md §3 E2, notebook cells 2→10), re-expressed as one lazy Spark DAG.

Reference chain: load with metadata cut → ``select_objects`` filter →
``merge_metadata_to_sources`` → ``cluster_sources`` (DBSCAN) →
``match_to_PS1cal`` (crossmatch on cluster centroids) → ``select_clusters``
→ ``calmag`` → ``ps1based_outlier_rm_iqr`` → bandwise ref mag → final
``select_clusters`` → derived column + sink.  The reference materializes a
mutated pandas frame at every arrow; here the only materialization
barriers are the two driver-side steps the algorithms genuinely need
(Jenks breaks on per-cluster aggregates; DBSCAN's cluster-graph merge).

The astronomy-shaped fixture is synthesized deterministically from the
star-schema ``customer`` table (FIXTURES.md §B): each customer is a star
observed in 5 exposures with sub-arcsec jitter, so DBSCAN ground truth is
per-star; every ~97th star gets a +3 mag reference offset to exercise the
outlier pass.  Everything is integer-derived → reproducible across runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.photometry import band_conditional_color, bandwise_ref_mag, calmag
from ..operators.aggregates import cluster_centroid
from ..operators.clustering import dbscan
from ..operators.joins import merge_metadata_to_sources, select_clusters
from ..operators.outliers import ps1based_outlier_rm_iqr
from ..operators.spatial import crossmatch_sky
from ..utils import query_df


def make_astro_fixture(
    spark: SparkSession, sf_dir: str, n_exposures: int = 5
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(sources, metadata, ps1cal) synthesized from the customer table.

    Column names/dtypes follow FIXTURES.md §B (reference-shaped)."""
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    c = F.col("c_custkey")
    # position moduli are large primes so star positions stay distinct at
    # every scale factor (small moduli made stars collide beyond ~3600 ids)
    stars = cust.select(
        c.alias("star_id"),
        ((c * 9176 % 3_599_993) / 10000.0).alias("ra0"),
        ((c * 7919 % 1_199_999) / 10000.0 - 60.0).alias("dec0"),
        (15.0 + (c % 500) / 100.0).alias("mag0"),
    )

    exposures = spark.range(1, n_exposures + 1).select(
        F.col("id").alias("OBSID"),
        (25.0 + 0.1 * F.col("id")).alias("MAGZP"),
        F.lit(0.01).alias("MAGZPUNC"),
        (0.05 + 0.01 * F.col("id")).alias("CLRCOEFF"),
        F.lit(0.005).alias("CLRCOUNC"),
        (F.col("id") % 3 + 1).cast("int").alias("FILTERID"),
        (58000.0 + F.col("id")).alias("OBSMJD"),
    )

    src = stars.crossJoin(spark.range(1, n_exposures + 1).select(F.col("id").alias("e")))
    s, e = F.col("star_id"), F.col("e")
    sources = src.select(
        (s * 10 + e).alias("sourceid"),
        e.alias("OBSID"),
        (F.col("ra0") + (((s * 31 + e * 17) % 21) - 10) * 1e-5).alias("ra"),
        (F.col("dec0") + (((s * 13 + e * 23) % 21) - 10) * 1e-5).alias("dec"),
        (F.col("mag0") + 0.001 * e).alias("mag"),
        F.lit(0.01).alias("sigmag"),
        F.when((s * 7 + e) % 50 == 0, F.lit(1)).otherwise(F.lit(0)).alias("flags"),
        (5.0 + (s % 10)).alias("snr"),
    )

    # reference catalog: true star positions; ~1/97 stars get a +3 mag
    # offset (injected outliers for the IQR pass)
    outlier = F.when(F.col("star_id") % 97 == 0, F.lit(3.0)).otherwise(F.lit(0.0))
    ps1cal = stars.select(
        F.col("star_id").alias("_id"),
        F.col("ra0").alias("ra"),
        F.col("dec0").alias("dec"),
        (F.col("mag0") + 25.25 + outlier).alias("gmag"),
        (F.col("mag0") + 25.20 + outlier).alias("rmag"),
        (F.col("mag0") + 25.15 + outlier).alias("imag"),
        F.lit(0.01).alias("e_gmag"),
        F.lit(0.01).alias("e_rmag"),
        F.lit(0.01).alias("e_imag"),
    )
    return sources, exposures, ps1cal


def astro_flagship_pipeline(
    spark: SparkSession, sf_dir: str, return_stages: bool = False
) -> DataFrame:
    """The full E2 chain; returns a per-band summary (rows-only check — the
    chain includes DBSCAN and Jenks, which have no SQL oracle).

    Stage mapping (SURVEY.md §3 E2): P1 → J1 → M1 → A2+J5+J3 → J8 → F1+F2
    → M3 → F2 → J8 → summary agg.

    With ``return_stages=True`` also returns a dict of the named
    intermediate DataFrames, so tests can pin per-stage row counts
    (golden invariants per SURVEY §5.4) instead of only rows>0 at the end.
    """
    sources, metadata, ps1cal = make_astro_fixture(spark, sf_dir)

    # P1: select_objects('flags == 0 and snr > 2')  (dataset.py:249-261)
    good = query_df(sources, "flags == 0 and snr > 2")

    # J1: metadata enrich on OBSID (dataset.py:206-246)
    # Cached: DBSCAN's construction actions (merge probe) read it through
    # cells, and the labeled output re-attaches to it for the full-width
    # rows — without the cache each of those pays the fixture's long
    # projection lineage again, and (measured) the flagship's whole-stage
    # codegen recompiles per action: min-of-2 drops ~20s→~12s at sf0.1.
    # MEMORY_AND_DISK default: legitimate for a fact table reused by
    # multiple downstream actions; spills rather than OOMs at scale.
    enriched = merge_metadata_to_sources(
        good, metadata, join_on="OBSID"
    ).cache()

    # M1: cluster_sources(3", min_samples=2, purge noise) (objtable.py:116-168)
    # Cached: the IQR pass and the two group-quantified filters below each
    # run driver-side actions — without the cache every one would re-run
    # the full scan→join→DBSCAN chain.  Repartitioned by clusterID at cache
    # time: every downstream cluster-grain operator (centroid groupBy,
    # per-cluster IQR aggregate, final group-quantified window) reuses the
    # cached hash partitioning instead of shuffling the fact table again —
    # the "reuse a partitioning across stages" contract at pipeline level.
    clustered = (
        dbscan(
            enriched, eps=3.0, min_samples=2, id_col="sourceid",
            x_col="ra", y_col="dec", coord="sky", purge_noise=True,
        )
        .repartition("clusterID")
        .cache()
    )

    # A2 + J5: centroids → nearest PS1 star within 3" (use='clusters')
    centroids = cluster_centroid(clustered, "clusterID", "ra", "dec").select(
        F.col("clusterID"),
        F.col("ra_centroid").alias("ra"),
        F.col("dec_centroid").alias("dec"),
    )
    matched = crossmatch_sky(
        centroids, ps1cal, rs_arcsec=3.0, source_id="clusterID",
        catalog_id="_id",
    ).select("clusterID", "dist2ps1", "gmag", "rmag", "imag", "e_gmag", "e_rmag")

    # J3: re-attach per-cluster match to sources (cached — consumed by the
    # window filter AND the IQR pass's aggregate/collect)
    with_match = clustered.join(
        F.broadcast(matched), on="clusterID", how="inner"
    ).cache()

    # J8: select_clusters('dist2ps1 < 1.')  (_objtable_methods.py:424-488).
    # dist2ps1 is cluster-grain here (attached via the centroid crossmatch,
    # identical for every member), so "ALL members satisfy" reduces to a
    # plain row filter — no window shuffle.  The generic group-quantified
    # operator is exercised by the final stage below and the j8_* queries.
    tight = with_match.filter(F.col("dist2ps1") < 1.0)

    # F1+F2: calmag with band-conditional color (objtable.py:201-346)
    colored = band_conditional_color(tight)
    calibrated = calmag(
        colored, mag_col="mag", err_mag_col="sigmag",
        zp_col="MAGZP", zp_err_col="MAGZPUNC",
        clrcoeff_col="CLRCOEFF", clrcoeff_err_col="CLRCOUNC",
        color1_col="color1", color2_col="color2",
        color1_err_col="e_gmag", color2_err_col="e_rmag",
    )

    # F2: bandwise reference magnitude (_objtable_methods.py:158-188)
    with_ref = bandwise_ref_mag(calibrated)

    # M3: IQR outlier rejection on cal_mag vs PS1 (rejects injected stars)
    kept, _outliers = ps1based_outlier_rm_iqr(
        with_ref, "cal_mag", "ps1mag_band", norm_mag_diff_cut=2.5, n_mag_bins=10
    )

    # final J8: |cal - ps1| < 0.5 across every cluster member
    final, _ = select_clusters(
        kept.withColumn("absdiff", F.abs(F.col("cal_mag") - F.col("ps1mag_band"))),
        "absdiff < 0.5",
        "clusterID",
    )

    # summary per band (the notebook's mag_diff + to_csv step, as an agg)
    summary = (
        final.groupBy("FILTERID")
        .agg(
            F.countDistinct("clusterID").alias("n_clusters"),
            F.count(F.lit(1)).alias("n_sources"),
            F.round(F.avg(F.col("cal_mag") - F.col("ps1mag_band")), 6).alias(
                "mean_mag_diff"
            ),
            F.round(F.avg("dist2ps1"), 6).alias("mean_dist2ps1"),
        )
        .orderBy("FILTERID")
    )
    if return_stages:
        return summary, {
            "good": good,
            "enriched": enriched,
            "clustered": clustered,
            "centroids": centroids,
            "matched": matched,
            "with_match": with_match,
            "tight": tight,
            "kept": kept,
            "final": final,
        }
    return summary


QUERIES = {"astro_flagship_pipeline": astro_flagship_pipeline}
