"""Exact binary-classification evaluation — the metrics stage that closes
the train → predict → **evaluate** loop of the quality-filter pipeline
(operators/classifier.py trains the model; this module grades it).

The centerpiece is an *exact* ROC-AUC without ever materializing the
ROC curve, via the rank-sum (Mann-Whitney U) identity:

    AUC = (R⁺ − P(P+1)/2) / (P·N)

where R⁺ is the sum of mid-ranks of the positive examples.  Ranking a
100 TB corpus sounds like a global sort, but it isn't: mid-ranks only
depend on the *score histogram*.  For a score value s with n_s rows
(p_s of them positive) and C_s rows strictly below, every row at s has
mid-rank C_s + (n_s+1)/2, so

    2·R⁺ = Σ_s p_s · (2·C_s + n_s + 1)        (pure int64)

and the whole evaluation is

    corpus scan → hash aggregate keyed by score (partial+final — the
    wire carries one row per distinct score per partition) → a window
    over the HISTOGRAM (aggregate-sized; with integer model scores the
    distinct-score count is bounded by the score range, not the corpus)
    → a 1-row final aggregate.

The confusion matrix rides the same histogram (tp = Σ_{s>0} p_s …), so
the corpus is scanned exactly once.  Every count is int64; floats enter
only in the last projection, one IEEE-754 division per metric
(f1 = 2tp/(2tp+fp+fn) is deliberately a *single* division rather than
the precision/recall composition), so the result replays bit for bit in
the DuckDB oracle.

Threshold convention matches ``classifier.perceptron_predict``:
predicted positive iff score > 0 (margin 0 ⇒ negative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col


def binary_classification_report(
    df: DataFrame,
    label_col: str = "y",
    score_col: str = "score",
    threshold: int = 0,
) -> DataFrame:
    """One-row exact evaluation of a scored binary classifier.

    ``label_col`` holds ±1 teacher labels, ``score_col`` the model
    margin (any orderable numeric; integer scores keep the whole
    computation int64-exact).  Predicted positive iff
    ``score > threshold``.

    Returns columns ``p, n, tp, fp, tn, fn`` (int64 counts),
    ``accuracy, precision, recall, f1, auc`` (each one double
    division).  Degenerate inputs (no positives or no negatives) yield
    NULL for the undefined metrics via ``try_divide`` rather than a
    crash — single-class corpora are a real failure mode of weak
    labelers and the report should *show* it.

    Scale shape (see module docstring): one corpus scan, one
    histogram-sized window, one scalar aggregate.  NULL labels/scores
    are rejected up front — an unlabeled row in an evaluation set is a
    pipeline bug, not a 0.5-credit example.
    """
    check_col([label_col, score_col], df)
    y, s = F.col(label_col), F.col(score_col)
    clean = df.filter(y.isNotNull() & s.isNotNull())

    # score histogram: the ONLY pass over the corpus
    hist = clean.groupBy(s.alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(y == 1, 1).otherwise(0)).alias("__p"),
    )

    # strictly-below cumulative count: window over DISTINCT SCORES
    # (aggregate-sized by construction — documented single partition)
    below = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    h = hist.withColumn(
        "__cless", F.coalesce(F.sum("__n").over(below), F.lit(0))
    )

    pos_pred = F.col("__s") > F.lit(threshold)
    agg = h.agg(
        F.sum("__p").cast("long").alias("p"),
        (F.sum("__n") - F.sum("__p")).cast("long").alias("n"),
        F.sum(F.when(pos_pred, F.col("__p")).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(pos_pred, F.col("__n") - F.col("__p")).otherwise(0))
        .cast("long")
        .alias("fp"),
        # 2·R⁺ — stays int64 (each term ≤ 3·rows² only if scores collide
        # heavily; p_s·(2C_s+n_s+1) ≤ rows·(2·rows+1), fine to ~2·10⁹ rows)
        F.sum(
            F.col("__p")
            * (F.lit(2) * F.col("__cless") + F.col("__n") + F.lit(1))
        )
        .cast("long")
        .alias("two_rank_pos"),
    )

    tp, fp = F.col("tp"), F.col("fp")
    p, n = F.col("p"), F.col("n")
    fn, tn = p - tp, n - fp
    return agg.select(
        p.alias("p"),
        n.alias("n"),
        tp.alias("tp"),
        fp.alias("fp"),
        tn.cast("long").alias("tn"),
        fn.cast("long").alias("fn"),
        F.try_divide((tp + tn).cast("double"), (p + n).cast("double")).alias(
            "accuracy"
        ),
        F.try_divide(tp.cast("double"), (tp + fp).cast("double")).alias(
            "precision"
        ),
        F.try_divide(tp.cast("double"), p.cast("double")).alias("recall"),
        F.try_divide(
            (F.lit(2) * tp).cast("double"), (F.lit(2) * tp + fp + fn).cast("double")
        ).alias("f1"),
        # AUC = (2R⁺ − P(P+1)) / (2PN), ties at half credit by mid-rank
        F.try_divide(
            (F.col("two_rank_pos") - p * (p + F.lit(1))).cast("double"),
            (F.lit(2) * p * n).cast("double"),
        ).alias("auc"),
    )


__all__ = ["binary_classification_report"]
