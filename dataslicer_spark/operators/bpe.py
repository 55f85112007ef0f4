"""Distributed BPE tokenizer training — learn a byte-pair-encoding merge
table over a document corpus (Sennrich et al., ACL 2016: the tokenizer
construction behind GPT-2/RoBERTa-style vocabularies).

Training an LLM tokenizer is a corpus-scale aggregation problem: each
merge step needs the frequency of every adjacent token pair across the
whole corpus.  The distributed shape here mirrors every production
implementation:

- pair counting is a ``groupBy(pair).count()`` over exploded adjacent
  pairs — map-side partial counts reduce each partition to its distinct
  pairs before the exchange (the wire carries pair frequencies, not
  token streams);
- the argmax merge (count desc, pair asc — deterministic tie-break) is
  a ``LIMIT 1`` collect: one row per iteration reaches the driver;
- applying a merge is a literal string replace — a map-only JVM
  projection, no shuffle;
- the merge table (the trained artifact) is a list of string pairs —
  microscopic driver state, like the k-means centroids.

Determinism & the oracle: every step is exact string manipulation and
integer counting, so the whole trajectory — corpus prep, n merge
rounds, final tokenization — replays bit for bit in DuckDB CTEs.

Semantics note (documented, deliberate): merges apply with standard
leftmost non-overlapping replace-all semantics, in which the token
stream is a space-separated string and the shared boundary space of two
adjacent matches is consumed by the first — on a run ``a a a a`` the
merge ``(a, a)`` yields ``aa a a``, not canonical BPE's ``aa aa``.
Java, RE2 and DuckDB all implement replace this way, which is exactly
what makes the trainer engine-exact; canonical run-collapsing differs
only on repeated-token runs.  Spaces in the input are first mapped to
``▁`` (the SentencePiece convention) so the separator is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col, materialize, spread

#: SentencePiece-style space marker — input spaces become real tokens.
SPACE_MARK = "▁"


def bpe_prepare(text: Column, max_chars: int = 512) -> Column:
    """Initial character tokenization as a space-separated string with a
    leading and trailing space sentinel: ``"ab c" → " a b ▁ c "``."""
    t = F.regexp_replace(
        F.substring(text, 1, max_chars), " ", SPACE_MARK
    )
    # (?s) so a dot crosses nothing it shouldn't — any char is a token
    spaced = F.regexp_replace(t, r"(?s)(.)", r"$1 ")
    return F.concat(F.lit(" "), spaced)


def adjacent_pairs(tokens_str: Column) -> Column:
    """Array of adjacent-pair strings (``"x y"``) of a token string.

    Built from two shifted ``slice``s zipped together rather than an
    index-lambda over ``element_at`` — the slice/zip form stays out of
    the interpreted HOF-per-index path (measured 0.37 s vs 4.1 s per
    counting pass over 500×256-token docs)."""
    toks = F.split(F.trim(tokens_str), " ")
    n = F.size(toks)
    ln = F.greatest(n - 1, F.lit(0))
    z = F.arrays_zip(
        F.slice(toks, 1, ln).alias("a"), F.slice(toks, 2, ln).alias("b")
    )
    return F.transform(z, lambda p: F.concat_ws(" ", p["a"], p["b"]))


def apply_merge(tokens_str: Column, pair: str) -> Column:
    """One merge, leftmost non-overlapping (see module docstring)."""
    a, b = pair.split(" ")
    return F.replace(
        tokens_str, F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
    )


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 4,
    max_chars: int = 512,
) -> list[str]:
    """Learn ``n_merges`` merges; returns them in order (each a
    ``"left right"`` pair string).  Raises if the corpus exhausts its
    pairs early (fewer distinct adjacent pairs than requested merges) —
    a real corpus never does at practical vocabulary sizes.

    Incremental fit: the tokenized corpus is materialized each round and
    only the NEWEST merge is applied to it — per-round cost is one
    pair-count aggregate plus one map-only replace pass, so total cost is
    O(n_merges · corpus), not the O(n_merges² · corpus) of re-applying
    the whole merge chain to the raw corpus every round (which also built
    an n_merges-deep expression tree — a codegen/analyzer killer at a
    32k-merge production vocabulary)."""
    check_col(text_col, df)
    # spread before the prepare pass (guide §2.5): every merge round's
    # pair-explode + count runs at the materialized corpus's
    # partitioning, which is the SCAN's — one task on a one-row-group
    # table, so the whole fit loop ran serially (profiled 1.0-1.6 s
    # single-task jobs per round at sf0.1); a one-time round-robin at
    # the head parallelizes all rounds.  Guarded no-op on wide scans.
    corpus = materialize(
        spread(df.filter(F.col(text_col).isNotNull())).select(
            bpe_prepare(F.col(text_col), max_chars).alias("__s")
        )
    )
    merges: list[str] = []
    for _ in range(n_merges):
        top = (
            corpus.select(
                F.explode(adjacent_pairs(F.col("__s"))).alias("__p")
            )
            .groupBy("__p")
            .count()
            .orderBy(F.col("count").desc(), F.col("__p").asc())
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(
                f"corpus exhausted after {len(merges)} merges"
            )
        merges.append(top[0]["__p"])
        if len(merges) < n_merges:
            corpus = materialize(
                corpus.select(
                    apply_merge(F.col("__s"), merges[-1]).alias("__s")
                )
            )
    return merges


def bpe_apply(
    df: DataFrame,
    merges: list[str],
    text_col: str = "text",
    max_chars: int = 512,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a trained merge table — a map-only chain of literal
    replaces (no shuffle, no Python).  Adds ``<out_col>`` (array of
    tokens) and ``n_<out_col>`` (its length)."""
    check_col(text_col, df)
    s = bpe_prepare(F.col(text_col), max_chars)
    for m in merges:
        s = apply_merge(s, m)
    toks = F.split(F.trim(s), " ")
    return df.withColumn(out_col, toks).withColumn(
        f"n_{out_col}", F.size(toks)
    )


def save_merges(merges: list[str], path: str) -> None:
    """Persist a trained merge table as JSON — the artifact a production
    pipeline trains once and applies everywhere (the merge list IS the
    tokenizer; order is the training order and must be preserved)."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"version": 1, "merges": list(merges)}, f, indent=1)


def load_merges(path: str) -> list[str]:
    import json

    with open(path) as f:
        obj = json.load(f)
    merges = obj["merges"]
    if not all(isinstance(m, str) and " " in m for m in merges):
        raise ValueError(f"{path}: malformed merge table")
    return merges


__all__ = ["SPACE_MARK", "bpe_prepare", "adjacent_pairs", "apply_merge",
           "bpe_fit", "bpe_apply", "save_merges", "load_merges"]
