"""User-facing API: ``SlicerFrame`` / ``SlicerDataset`` — the reference's
``srcdf`` / ``dataset`` method surface over immutable Spark DataFrames.

The reference subclasses ``pd.DataFrame`` (srcdf.py:23-37) and mutates in
place, with many verbs also returning the rejected complement.  Here the
wrapper *composes* a ``pyspark.sql.DataFrame`` (subclassing is not a Spark
idiom): every verb returns a NEW ``SlicerFrame``, and complement-producing
verbs return ``(kept, rejected)`` pairs — the documented contract change
(SURVEY.md §1.3).  ``.df`` exposes the raw DataFrame at any point.

A user of the reference maps their calls 1:1:

    ds = SlicerDataset(spark, name, metadata=meta_df, objtable=src_df)
    ds.select_objects("flags == 0 and snr > 2")       # dataset.py:249-261
    ds.merge_metadata_to_sources(meta_cols, "OBSID")  # dataset.py:206-246
    ds.objtable.cluster_sources(3.0, 2)               # objtable.py:116-168
    ...
"""

from __future__ import annotations

import os
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.photometry import (
    add_obsid,
    add_srcid,
    band_conditional_color,
    bandwise_ref_mag,
    calmag,
    compute_camera_coord,
    compute_ccd_coord,
)
from .operators.aggregates import (
    cluster_centroid,
    cluster_centroid_weighted,
    group_stats,
)
from .operators.clustering import dbscan
from .operators.filters import filter_with_complement, trim_edges
from .operators.joins import (
    anti_join,
    merge_metadata_to_sources,
    select_clusters,
    union_reindex,
)
from .operators.outliers import ps1based_outlier_rm_iqr
from .operators.regression import attach_solution, photometric_solution
from .operators.spatial import crossmatch_sky, split_dust, tag_dust
from .utils import query_df, select_columns


class SlicerFrame:
    """Composition wrapper exposing the reference's source-table verbs."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- plumbing -----------------------------------------------------------
    def _wrap(self, df: DataFrame, label: str | None = None) -> "SlicerFrame":
        """``label`` names the stage for provenance-traced frames
        (ignored here); multi-output verbs pass explicit labels so the
        two stages of e.g. ``trim_edges`` don't collide."""
        return SlicerFrame(df)

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def count(self) -> int:
        return self.df.count()

    def to_pandas(self):
        return self.df.toPandas()

    # -- filters / projections (P1-P3) -------------------------------------
    def query_df(self, expr: str, params: dict[str, Any] | None = None) -> "SlicerFrame":
        """Expression filter, pandas dialect (dataset_base.py:198-230)."""
        return self._wrap(query_df(self.df, expr, params))

    def select_columns(self, patterns) -> "SlicerFrame":
        """Projection with '*' substring wildcards (df_utils.py:52-59)."""
        return self._wrap(select_columns(self.df, patterns))

    def filter_with_complement(self, expr) -> tuple["SlicerFrame", "SlicerFrame"]:
        kept, rejected = filter_with_complement(self.df, expr)
        return (self._wrap(kept, label="filter_with_complement/kept"),
                self._wrap(rejected, label="filter_with_complement/rejected"))

    def trim_edges(self, dx: float, dy: float, **kw) -> tuple["SlicerFrame", "SlicerFrame"]:
        """(srcdf.py:578-613; rejected side implemented, reference bug B4)."""
        kept, rejected = trim_edges(self.df, dx, dy, **kw)
        return (self._wrap(kept, label="trim_edges/kept"),
                self._wrap(rejected, label="trim_edges/rejected"))

    # -- keys (F8) ----------------------------------------------------------
    def add_obsid(self, **kw) -> "SlicerFrame":
        return self._wrap(add_obsid(self.df, **kw))

    def add_srcid(self, **kw) -> "SlicerFrame":
        return self._wrap(add_srcid(self.df, **kw))

    # -- archive metadata (S11/J2) -------------------------------------------
    def add_IRSA_meta(
        self,
        expid_col: str = "expid",
        meta_cols=None,
        **kw,
    ) -> "SlicerFrame":
        """Attach IRSA exposure metadata by exposure id
        (srcdf.add_IRSA_meta, srcdf.py:108-135): distinct exposure ids →
        ONE archive query → broadcast join back.  Facade over
        ``sources.archives.load_irsa_meta``; pass ``zquery=`` a recorded
        fixture/fetcher in tests."""
        from .sources.archives import load_irsa_meta

        return self._wrap(
            load_irsa_meta(self.df, expid_col=expid_col,
                           meta_cols=meta_cols, **kw)
        )

    # -- union (J9) ----------------------------------------------------------
    def add(self, other: "SlicerFrame | DataFrame", reindex: bool = True,
            srcid_key: str = "sourceid") -> "SlicerFrame":
        """Append another source table (srcdf.add, srcdf.py:64-105; the
        in-place mode was a silent no-op — bug B3 — so only the returning
        form exists here)."""
        other_df = other.df if isinstance(other, SlicerFrame) else other
        return self._wrap(union_reindex(self.df, other_df, reindex, srcid_key))

    # -- clustering (M1) -----------------------------------------------------
    def cluster_sources(
        self,
        cluster_size_arcsec: float,
        min_samples: int,
        id_col: str = "sourceid",
        xname: str = "ra",
        yname: str = "dec",
        purge_df: bool = False,
    ) -> "SlicerFrame":
        """(objtable.cluster_sources, objtable.py:116-168)."""
        return self._wrap(
            dbscan(
                self.df, eps=cluster_size_arcsec, min_samples=min_samples,
                id_col=id_col, x_col=xname, y_col=yname, coord="sky",
                purge_noise=purge_df,
            )
        )

    def compute_cluster_centroid(
        self, xname: str = "ra", yname: str = "dec",
        wav: bool = False, err_col: str | None = None,
    ) -> "SlicerFrame":
        """(objtable.py:171-198; the weighted variant the reference left
        NotImplementedError is implemented via err_col + wav=True)."""
        if wav:
            if err_col is None:
                raise ValueError("weighted centroid needs err_col")
            out = cluster_centroid_weighted(
                self.df, err_col, "clusterID", xname, yname
            )
        else:
            out = cluster_centroid(self.df, "clusterID", xname, yname)
        return self._wrap(out)

    # -- crossmatch (J5) -----------------------------------------------------
    def match_to_PS1cal(
        self,
        ps1cal: "SlicerFrame | DataFrame",
        rs_arcsec: float,
        use: str = "clusters",
        ids: str = "srcID",
        clean_unmatched: bool = True,
    ) -> "SlicerFrame":
        """(_objtable_methods.match_to_PS1cal, :25-155).

        ``use='clusters'``: match cluster centroids, attach per cluster;
        ``use='srcs'``: match every source row.  ``clean_unmatched=False``
        keeps unmatched rows with NULL dist (PS1Cal_matching.py:114-117).
        """
        cat = ps1cal.df if isinstance(ps1cal, SlicerFrame) else ps1cal
        if use == "clusters":
            centroids = cluster_centroid(self.df, "clusterID", "ra", "dec").select(
                F.col("clusterID"),
                F.col("ra_centroid").alias("ra"),
                F.col("dec_centroid").alias("dec"),
            )
            matched = crossmatch_sky(
                centroids, cat, rs_arcsec, source_id="clusterID",
                keep_unmatched=not clean_unmatched,
            ).drop("ra", "dec")
            out = self.df.join(F.broadcast(matched), on="clusterID",
                               how="inner" if clean_unmatched else "left")
        elif use == "srcs":
            out = crossmatch_sky(
                self.df, cat, rs_arcsec, source_id=ids,
                keep_unmatched=not clean_unmatched,
            )
        else:
            raise ValueError(f"use must be 'clusters' or 'srcs', got {use!r}")
        return self._wrap(out)

    # -- group-quantified filter (J8) ---------------------------------------
    def select_clusters(
        self, cond: str | Column, group_col: str = "clusterID",
        params: dict[str, Any] | None = None,
    ) -> tuple["SlicerFrame", "SlicerFrame"]:
        """(_objtable_methods.py:424-488) → (kept, rejected)."""
        kept, rejected = select_clusters(self.df, cond, group_col, params)
        return (self._wrap(kept, label="select_clusters/kept"),
                self._wrap(rejected, label="select_clusters/rejected"))

    # -- photometry (F1-F4) --------------------------------------------------
    def calmag(self, mag_col: str, err_mag_col: str | None = None, **kw) -> "SlicerFrame":
        """(srcdf.calmag, srcdf.py:366-443)."""
        return self._wrap(calmag(self.df, mag_col, err_mag_col, **kw))

    def band_conditional_color(self, **kw) -> "SlicerFrame":
        return self._wrap(band_conditional_color(self.df, **kw))

    def add_bandwise_PS1mag_for_filter(self, out_col: str = "ps1mag_band", **kw) -> "SlicerFrame":
        """(_objtable_methods.py:158-188)."""
        return self._wrap(bandwise_ref_mag(self.df, out_col=out_col, **kw))

    def compute_camera_coord(self, **kw) -> "SlicerFrame":
        """(srcdf.py:446-506; objtable facade had a NameError — bug B2)."""
        return self._wrap(compute_camera_coord(self.df, **kw))

    def compute_ccd_coord(self, **kw) -> "SlicerFrame":
        """(srcdf.py:509-575)."""
        return self._wrap(compute_ccd_coord(self.df, **kw))

    # -- outliers (M3) -------------------------------------------------------
    def ps1based_outlier_rm_iqr(
        self, cal_mag_col: str, norm_mag_diff_cut: float,
        ps1mag_name: str = "ps1mag_band", n_mag_bins: int = 10,
    ) -> tuple["SlicerFrame", "SlicerFrame"]:
        """(_objtable_methods.py:265-421) → (kept, outliers)."""
        kept, outliers = ps1based_outlier_rm_iqr(
            self.df, cal_mag_col, ps1mag_name, norm_mag_diff_cut,
            n_mag_bins=n_mag_bins,
        )
        return (self._wrap(kept, label="ps1based_outlier_rm_iqr/kept"),
                self._wrap(outliers, label="ps1based_outlier_rm_iqr/outliers"))

    # -- regression (F7) -----------------------------------------------------
    def photometric_solution(
        self, x_col: str, y_col: str, sx_col: str, sy_col: str,
        group_cols: Sequence[str] | None = None, **kw,
    ) -> "SlicerFrame":
        """(srcdf.py:220-363) — fitted scalars as a small frame; use
        ``attach_photometric_solution`` to append them as constant cols."""
        return self._wrap(
            photometric_solution(self.df, x_col, y_col, sx_col, sy_col,
                                 group_cols, **kw)
        )

    def attach_photometric_solution(
        self, solution: "SlicerFrame | DataFrame",
        group_cols: Sequence[str] | None = None,
    ) -> "SlicerFrame":
        sol = solution.df if isinstance(solution, SlicerFrame) else solution
        return self._wrap(attach_solution(self.df, sol, group_cols))

    # -- dust (J6) -----------------------------------------------------------
    def tag_dust(
        self, dust: "SlicerFrame | DataFrame", rscale: float = 1.0, **kw
    ) -> tuple["SlicerFrame", "SlicerFrame"]:
        """(srcdf.tag_dust, srcdf.py:616-694) → (clean, dusty)."""
        d = dust.df if isinstance(dust, SlicerFrame) else dust
        tagged = tag_dust(self.df, d, rscale=rscale, **kw)
        clean, dusty = split_dust(tagged)
        return (self._wrap(clean, label="tag_dust/clean"),
                self._wrap(dusty, label="tag_dust/dusty"))

    # -- extension surface (beyond the reference) ----------------------------
    def asof_join(
        self, other: "SlicerFrame | DataFrame", ts_col: str, by_cols, value_cols,
        **kw,
    ) -> "SlicerFrame":
        """Point-in-time enrich from ``other`` (operators/asof.py)."""
        from .operators.asof import asof_join

        o = other.df if isinstance(other, SlicerFrame) else other
        return self._wrap(asof_join(self.df, o, ts_col, by_cols, value_cols, **kw))

    def approx_distinct(self, cols, group_cols=()) -> "SlicerFrame":
        """HLL distinct counts (functions/sketches.py) — the sketch twin of
        the exact ``distinct_stats``."""
        from .functions.sketches import hll_distinct

        return self._wrap(hll_distinct(self.df, cols, group_cols))

    def dedup_exact(self, id_col: str, text_col: str = "text"):
        """(representatives, dup_stats) by content fingerprint
        (operators/dedup.py)."""
        from .operators.dedup import exact_dedup

        reps, stats = exact_dedup(self.df, id_col, text_col)
        return (self._wrap(reps, label="dedup_exact/reps"),
                self._wrap(stats, label="dedup_exact/stats"))

    def search(
        self,
        terms: list[str],
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 10,
    ) -> "SlicerFrame":
        """BM25 keyword top-k over a text column
        (operators/retrieval.py) — the corpus-audit question 'what did
        we keep about X?' as one call."""
        from .operators.retrieval import bm25_topk

        return self._wrap(bm25_topk(self.df, terms, id_col, text_col, k))

    def to_training_shards(
        self,
        path: str,
        id_col: str,
        n_shards: int,
        **kw,
    ) -> dict:
        """Deterministic sharded export + manifest (sources/shards.py);
        returns the manifest dict."""
        from .sources.shards import write_training_shards

        return write_training_shards(self.df, path, id_col, n_shards, **kw)

    def clean_text(self, text_col: str = "text", **kw) -> "SlicerFrame":
        """Unicode canonicalization + control/whitespace cleanup
        (functions/normalize.py); adds ``was_changed``."""
        from .functions.normalize import clean_text

        return self._wrap(clean_text(self.df, text_col, **kw))

    def dedup_spans(
        self, id_col: str, text_col: str = "text", k: int = 50
    ) -> "SlicerFrame":
        """ExactSubstr scrub (operators/span_dedup.py): remove every
        repeated ≥k-token passage corpus-wide, keeping one copy; adds
        ``n_removed_tokens``."""
        from .operators.span_dedup import remove_duplicated_spans

        return self._wrap(
            remove_duplicated_spans(self.df, id_col, text_col, k)
        )

    def to_warc(
        self, path: str, uri_col: str, payload_col: str, **kw
    ) -> None:
        """WARC shard export (sources/warc.py)."""
        from .sources.warc import write_warc

        write_warc(self.df, path, uri_col, payload_col, **kw)

    def to_bucketed_table(
        self,
        table: str,
        bucket_cols: list[str],
        n_buckets: int,
        **kw,
    ) -> None:
        """Catalog-managed bucketed table (sources/bucketed.py) — pay
        the join shuffle once at write time."""
        from .sources.bucketed import write_bucketed

        write_bucketed(self.df, table, bucket_cols, n_buckets, **kw)

    def cap_per_group(
        self, group_col: str, id_col: str, cap: int, salt: str = ""
    ) -> "SlicerFrame":
        """Per-group quota (operators/sampling.quota_sample): at most
        ``cap`` rows per group, survivors hash-deterministic."""
        from .operators.sampling import quota_sample

        return self._wrap(
            quota_sample(self.df, group_col, id_col, cap, salt)
        )

    def select_token_budget(
        self, score_col: str, token_col: str, id_col: str, budget: int, **kw
    ) -> "SlicerFrame":
        """Quality-ranked selection under a token budget
        (operators/sampling.token_budget_select); adds ``cum_tokens``."""
        from .operators.sampling import token_budget_select

        return self._wrap(
            token_budget_select(
                self.df, score_col, token_col, id_col, budget, **kw
            )
        )

    def search_phrase(
        self,
        phrase: list[str],
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "SlicerFrame":
        """Exact consecutive-phrase retrieval over a positional index
        (operators/retrieval.phrase_search)."""
        from .operators.retrieval import phrase_search

        return self._wrap(
            phrase_search(self.df, phrase, id_col, text_col)
        )

    def apply_changelog(
        self, changes, key_cols, seq_col: str, op_col: str, attr_cols
    ) -> "SlicerFrame":
        """CDC MERGE (operators/scd.apply_changelog): latest change per
        key wins — D deletes, others upsert."""
        from .operators.scd import apply_changelog

        c = changes.df if isinstance(changes, SlicerFrame) else changes
        return self._wrap(
            apply_changelog(
                self.df, c, key_cols, seq_col, op_col, attr_cols
            )
        )

    def filter_paragraphs(
        self, id_col: str, text_col: str = "text", **kw
    ) -> "SlicerFrame":
        """CCNet-shaped paragraph-granular quality filter
        (functions/text.paragraph_quality_filter)."""
        from .functions.text import paragraph_quality_filter

        return self._wrap(
            paragraph_quality_filter(self.df, id_col, text_col, **kw)
        )

    def mine_hard_negatives(
        self, queries, k: int = 10, **kw
    ) -> "SlicerFrame":
        """Hard-negative mining for contrastive training
        (operators/similarity.hard_negative_mining)."""
        from .operators.similarity import hard_negative_mining

        q = queries.df if isinstance(queries, SlicerFrame) else queries
        return self._wrap(hard_negative_mining(self.df, q, k, **kw))

    def to_bm25_index(
        self, path: str, id_col: str = "doc_id",
        text_col: str = "text", **kw,
    ) -> None:
        """Persist a BM25 inverted index (operators/retrieval_index.py)
        — later searches never re-tokenize the corpus."""
        from .operators.retrieval_index import build_bm25_index

        build_bm25_index(self.df, path, id_col, text_col, **kw)

    def mix_epochs(
        self,
        source_col: str,
        token_col: str,
        id_col: str,
        targets: dict,
        **kw,
    ) -> "SlicerFrame":
        """Token-budget mixture with epoch upsampling
        (operators/sampling.epoch_mixture); adds ``epoch``."""
        from .operators.sampling import epoch_mixture

        return self._wrap(
            epoch_mixture(
                self.df, source_col, token_col, id_col, targets, **kw
            )
        )

    def sample_neyman(
        self, strata_cols, value_col: str, total_n: int, key_col: str,
        **kw,
    ) -> "SlicerFrame":
        """Variance-optimal stratified sample
        (operators/sampling.neyman_stratified_sample)."""
        from .operators.sampling import neyman_stratified_sample

        return self._wrap(
            neyman_stratified_sample(
                self.df, strata_cols, value_col, total_n, key_col, **kw
            )
        )

    def split_leak_safe(
        self, id_col: str, pairs, **kw
    ) -> "SlicerFrame":
        """Near-dup-cluster-aware train/val/test split
        (operators/sampling.leakage_safe_split)."""
        from .operators.sampling import leakage_safe_split

        p = pairs.df if isinstance(pairs, SlicerFrame) else pairs
        return self._wrap(leakage_safe_split(self.df, id_col, p, **kw))

    # -- diagnostic plot sinks (reference dataset_base.py:72-96,
    # objtable.py:334-346) ---------------------------------------------------
    def sample_pandas(self, cols=None, max_rows: int = 100_000):
        """Bounded ``toPandas()``: at most ``max_rows`` driver rows, the
        cap enforced distributedly (plotting.bounded_sample_pandas)."""
        from .plotting import bounded_sample_pandas

        return bounded_sample_pandas(self.df, cols, max_rows)

    def plot_histogram(self, col: str, **kw) -> str:
        """Histogram diagnostic over a bounded sample (objtable.py:334-339);
        returns the written file path.  Requires matplotlib."""
        from .plotting import plot_histogram

        return plot_histogram(self.df, col, **kw)

    def plot_scatter(self, x_col: str, y_col: str, **kw) -> str:
        """Scatter diagnostic over a bounded sample (objtable.py:340-343);
        returns the written file path.  Requires matplotlib."""
        from .plotting import plot_scatter

        return plot_scatter(self.df, x_col, y_col, **kw)

    # -- sinks (S4) ----------------------------------------------------------
    def to_parquet(self, path: str, mode: str = "overwrite") -> None:
        """Engine-native sink (the reference's gzip-CSV cache, S4/S6)."""
        self.df.write.mode(mode).parquet(path)

    def to_csv(self, path: str, mode: str = "overwrite") -> None:
        """CSV sink for parity with ``_to_csv`` (dataset_base.py:98-136)."""
        self.df.write.mode(mode).option("header", True).option(
            "compression", "gzip"
        ).csv(path)

    # -- provenance ----------------------------------------------------------
    def traced(self, trace=None) -> "SlicerFrame":
        """Row-count provenance: the reference logs "… %d rows survived"
        after every operation (dataset_base.py:224-229) — free in eager
        pandas, one extra JOB per stage if naively counted in Spark.
        This wrapper keeps the contract with zero extra jobs: every verb
        on the returned frame records its surviving row count via a
        Spark Observation, harvested from the SAME action that
        materializes the pipeline.  Read back with ``frame.trace.rows()``
        / ``.to_df(spark)`` after an action."""
        from .trace import TraceLog

        return _TracedSlicerFrame(self.df, trace if trace is not None
                                  else TraceLog())


class _TracedSlicerFrame(SlicerFrame):
    """SlicerFrame whose ``_wrap`` records each verb's surviving row
    count into a :class:`~dataslicer_spark.trace.TraceLog` (stage label =
    the calling verb's name)."""

    def __init__(self, df: DataFrame, trace):
        super().__init__(df)
        self.trace = trace

    def _wrap(self, df: DataFrame, label: str | None = None) -> "SlicerFrame":
        import sys

        if label is None:
            # walk outward past synthetic frames (<listcomp>/<genexpr>/
            # <lambda>) so a verb calling _wrap from a comprehension
            # still records the verb's name, not '<listcomp>'
            depth, label = 1, "<unknown>"
            while True:
                try:
                    name = sys._getframe(depth).f_code.co_name
                except ValueError:  # ran off the stack (module-level call)
                    break
                if not name.startswith("<"):
                    label = name
                    break
                depth += 1
        return _TracedSlicerFrame(self.trace.record(label, df), self.trace)


class SlicerDataset:
    """The reference's ``dataset`` facade: a metadata table (one row per
    exposure/file) + an objtable (one row per source), joined on OBSID
    (dataset.py:26-51, 206-246)."""

    def __init__(
        self, spark: SparkSession, name: str,
        metadata: DataFrame | None = None, objtable: DataFrame | None = None,
    ):
        self.spark = spark
        self.name = name
        self.metadata = SlicerFrame(metadata) if metadata is not None else None
        self.objtable = SlicerFrame(objtable) if objtable is not None else None
        self.plot_dir: str | None = None

    def set_plot_dir(self, plot_dir: str) -> None:
        """(dataset_base.set_plot_dir, dataset_base.py:55-70)."""
        os.makedirs(plot_dir, exist_ok=True)
        self.plot_dir = plot_dir

    def save_fig(self, fig, name: str, **savefig_kwargs) -> str:
        """(dataset_base.save_fig, dataset_base.py:72-96)."""
        from .plotting import save_fig

        return save_fig(fig, name, self.plot_dir, **savefig_kwargs)

    # -- loading (S1/S5/S6) --------------------------------------------------
    @classmethod
    def from_parquet(
        cls, spark: SparkSession, name: str,
        metadata_path: str, objtable_path: str,
    ) -> "SlicerDataset":
        return cls(
            spark, name,
            metadata=spark.read.parquet(metadata_path),
            objtable=spark.read.parquet(objtable_path),
        )

    def _check_loaded(self) -> None:
        # (_check_for_metadata/_objtable, dataset.py:173-190)
        if self.metadata is None or self.objtable is None:
            raise RuntimeError(
                f"dataset {self.name!r}: load metadata and objtable first"
            )

    # -- facade verbs --------------------------------------------------------
    def select_objects(self, expr: str, params: dict[str, Any] | None = None) -> None:
        """(dataset.py:249-261) — filter the objtable in the facade.

        The ONE mutating surface kept for reference parity: rebinds
        ``self.objtable`` to the filtered frame (Spark DFs stay immutable
        underneath)."""
        self._check_loaded()
        self.objtable = self.objtable.query_df(expr, params)

    def merge_metadata_to_sources(
        self, metadata_cols: Sequence[str] | None = None, join_on: str = "OBSID"
    ) -> None:
        """(dataset.py:206-246) — broadcast-enrich sources with file-level
        attributes; rebinds ``self.objtable``."""
        self._check_loaded()
        self.objtable = SlicerFrame(
            merge_metadata_to_sources(
                self.objtable.df, self.metadata.df, metadata_cols, join_on
            )
        )

    def metadata_driven_prune(self, expr: str, params: dict[str, Any] | None = None) -> None:
        """S8 — filter metadata, then keep only matching sources: the
        reference's load-time file pruning (dataset.py:143-147 +
        objtable.py:85-88) as a semi-join (partition pruning when the lake
        is partitioned by the metadata keys)."""
        self._check_loaded()
        self.metadata = self.metadata.query_df(expr, params)
        self.objtable = SlicerFrame(
            self.objtable.df.join(
                F.broadcast(self.metadata.df.select("OBSID").distinct()),
                on="OBSID", how="left_semi",
            )
        )


__all__ = ["SlicerFrame", "SlicerDataset"]
