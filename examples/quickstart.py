"""Quickstart: the reference's notebook workflow (dataslicer_example.ipynb
cells 2→10) on dataslicer_spark, plus the training-pipeline extensions.

Run:  python examples/quickstart.py  [sf_dir]  (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataslicer_spark.api import SlicerFrame
from dataslicer_spark.plans.astro_pipeline import make_astro_fixture
from dataslicer_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("quickstart")

    # --- the reference's astronomy workflow (E2), API-for-API -------------
    # The whole chain runs TRACED: the reference logs "%d rows survived"
    # after every verb (dataset_base.py:224-229) — free in eager pandas,
    # reproduced here with zero extra jobs via Spark Observations (the
    # funnel printed at the end is harvested from the same actions that
    # materialize the pipeline).
    sources, metadata, ps1cal = make_astro_fixture(spark, sf_dir)

    from dataslicer_spark.operators.joins import merge_metadata_to_sources
    from dataslicer_spark.trace import TraceLog

    trace = TraceLog()
    good = SlicerFrame(sources).traced(trace).query_df(
        "flags == 0 and snr > 2"
    )  # select_objects
    enriched = merge_metadata_to_sources(good.df, metadata, join_on="OBSID")
    sf = SlicerFrame(enriched).traced(trace).cluster_sources(
        3.0, 2, purge_df=True
    )  # DBSCAN
    matched = sf.match_to_PS1cal(ps1cal, rs_arcsec=3.0, use="clusters")
    tight, _rejected = matched.select_clusters("dist2ps1 < 1.0")
    calibrated = (
        tight.band_conditional_color()
        .calmag(
            mag_col="mag", err_mag_col="sigmag",
            zp_col="MAGZP", zp_err_col="MAGZPUNC",
            clrcoeff_col="CLRCOEFF", clrcoeff_err_col="CLRCOUNC",
            color1_col="color1", color2_col="color2",
            color1_err_col="e_gmag", color2_err_col="e_rmag",
        )
        .add_bandwise_PS1mag_for_filter()
    )
    kept, outliers = calibrated.ps1based_outlier_rm_iqr("cal_mag", 2.5)
    print("calibrated sources kept:", kept.count(), "| outliers:", outliers.count())
    kept.df.select("clusterID", "cal_mag", "ps1mag_band").show(5)

    # the survivor funnel (reference's logged invariants, E2 chain):
    # stages whose branch was never materialized report None
    print("survivor funnel:")
    for label, n in trace.rows(strict=False):
        print(f"  {label}: {'(not materialized)' if n is None else n} rows survived")

    # --- diagnostic plot sink (reference objtable.py:334-346): bounded
    # driver sample always works; rendering needs matplotlib -------------
    sample = kept.sample_pandas(["cal_mag"], max_rows=10_000)
    print("bounded diagnostic sample rows:", len(sample))
    try:
        out = kept.plot_histogram("cal_mag", plot_dir="/tmp/dslicer_plots")
        print("wrote diagnostic:", out)
    except NotImplementedError as e:
        print("plot sink gated:", e)

    # --- training-pipeline extensions on the documents table --------------
    docs = SlicerFrame(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    )
    reps, dup_stats = docs.dedup_exact("doc_id")
    print("documents:", docs.count(), "| after exact dedup:", reps.count())

    est = docs.approx_distinct(["doc_id"]).df.collect()[0]
    print("HLL distinct doc_ids ~", est.n_doc_id)

    from dataslicer_spark.operators.sampling import add_split

    split = add_split(docs.df, "doc_id")
    split.groupBy("split").count().orderBy("split").show()

    spark.stop()


if __name__ == "__main__":
    main()
