"""Bloom-filter join pruning — kill non-joining fact rows BEFORE the
shuffle.

The 100 TB problem: a selective dimension (after its filters) joins a
huge fact table.  A broadcast hash join needs the whole dim in every
executor's memory; a shuffle join moves every fact row — including the
ones that will never match — across the wire.  The classic middle path
(runtime filters in Spark ≥3.3, "sideways information passing" in the
literature) builds a Bloom filter over the dim's join keys (a fixed-size
bitmap regardless of dim cardinality), broadcasts THAT, and filters the
fact scan: only probable matches reach the exchange.

Spark's own ``bloom_filter_agg`` expression is not SQL-registered, so
the filter is built with plain DataFrame aggregation — which also makes
the construction transparently scale-correct:

1. each dim key sets ``h`` bit positions (``xxhash64(key, seed_i)``
   pmod ``m``), JVM expressions only;
2. bits pack into 64-bit words via a ``bit_or`` hash aggregate —
   map-side partial ORs reduce every partition to ≤ m/64 rows before
   the exchange, so the wire cost is the bitmap, never the keys;
3. the ≤ m/64 non-zero words collect to the driver (a Bloom filter is
   by definition a bounded object — 1 MiB bitmap = 16 Ki longs) and
   ship back as a ONE-ROW broadcast relation whose array column the
   fact-side predicate probes with ``element_at`` — evaluated as data,
   once.  (An array *literal* was tried first and rejected: ``F.lit``
   on a list compiles to ``CreateArray`` with m/64 child expressions,
   which codegen re-evaluates per fact row — measured 6.5 s vs 0.5 s
   for the broadcast form on 600 k rows.)

False positives (rate ≈ ``(1 − e^{−h·n/m})^h``) are removed by the real
join that follows, so ``bloom_prune_join`` returns EXACTLY the plain
join's rows — which is what the DuckDB oracle asserts, independent of
the hash function.

When to use which:
- dim fits in executor memory → plain broadcast join (no bloom needed);
- dim too big to broadcast but its key BITMAP isn't → this;
- both sides huge and unselective → plain shuffle join (a bloom that
  passes everything is pure overhead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col, local_df

_SEEDS = (0x5EED1, 0x5EED2, 0x5EED3)


def _one_shl(bit_in_word: Column) -> Column:
    # F.shiftleft only accepts a Python-int shift; the SQL function takes
    # a column — call it directly for the variable shift
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), bit_in_word.cast("int")
    )


def _bit_pos(key: Column, seed: int, m_bits: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))


def build_bloom(
    dim: DataFrame,
    key: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> list[int]:
    """Aggregate the dim keys into an ``m_bits`` Bloom bitmap; returns
    the word array (``m_bits/64`` longs).  NULL keys are skipped (they
    never equi-join)."""
    check_col(key, dim)
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    if not 1 <= n_hashes <= len(_SEEDS):
        raise ValueError(f"n_hashes must be in 1..{len(_SEEDS)}")
    k = F.col(key)
    bits = F.array(
        *[_bit_pos(k, s, m_bits) for s in _SEEDS[:n_hashes]]
    )
    words = (
        dim.filter(k.isNotNull())
        .select(F.explode(bits).alias("__bit"))
        .select(
            F.shiftright(F.col("__bit"), 6).alias("__w"),
            _one_shl(F.col("__bit") % 64).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__word"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[r["__w"]] = int(r["__word"])
    return arr


def might_contain_expr(
    key: Column, words_col: Column, m_bits: int, n_hashes: int = 3
) -> Column:
    """Membership predicate probing a bloom word-array COLUMN (supply it
    from a 1-row broadcast relation — see module docstring for why not a
    literal)."""
    cond = F.lit(True)
    for s in _SEEDS[:n_hashes]:
        bit = _bit_pos(key, s, m_bits)
        word = F.element_at(words_col, (F.shiftright(bit, 6) + 1).cast("int"))
        mask = _one_shl(bit % 64)
        cond = cond & (word.bitwiseAND(mask) == mask)
    return cond


def bloom_prune(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """Return ``fact`` minus (most) rows whose ``key`` cannot join
    ``dim``.  Superset semantics: every joining row survives; a small
    fraction of non-joining rows leaks through and must be cleaned by
    the downstream join.  NULL keys are dropped."""
    check_col(key, fact)
    if "__bloom_words" in fact.columns:
        raise ValueError("fact already has a __bloom_words column")
    words = build_bloom(dim, key, m_bits, n_hashes)
    bloom_df = local_df(
        fact.sparkSession, [(words,)], "__bloom_words array<long>"
    )
    return (
        fact.filter(F.col(key).isNotNull())
        .join(F.broadcast(bloom_df))
        .filter(
            might_contain_expr(
                F.col(key), F.col("__bloom_words"), m_bits, n_hashes
            )
        )
        .drop("__bloom_words")
    )


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    m_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom-pruned equi-join: ``bloom_prune`` then the real join.
    Result rows are exactly ``fact.join(dim, key, how)``'s — the join
    removes the Bloom's false positives.  ``how`` is restricted to
    fact-preserving types where pruning the fact side is sound
    ('inner', 'left_semi'); an outer join must keep non-matching fact
    rows, which pruning would drop."""
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom pruning the fact side is only sound for inner/left_semi"
            f" joins, got {how!r}"
        )
    pruned = bloom_prune(fact, dim, key, m_bits, n_hashes)
    return pruned.join(dim, key, how)


__all__ = [
    "build_bloom",
    "might_contain_expr",
    "bloom_prune",
    "bloom_prune_join",
]
