"""Dataset splitting & sampling for training pipelines (north-star
extension): deterministic hash-based train/val/test assignment and
token-budget document packing.

Both are pure Catalyst expressions — no shuffle for the split (a row-local
hash), one window pass for packing — and both are deterministic functions
of the DATA (not of partitioning, sampling seeds, or row order), which is
the property a reproducible training pipeline actually needs: re-running
the split on a re-partitioned, re-ordered copy of the corpus yields the
same assignment row-for-row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col, local_df


def add_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[float] = (0.9, 0.05, 0.05),
    names: Sequence[str] = ("train", "val", "test"),
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic split assignment by content hash of the id.

    ``md5(salt || id)``'s first 8 hex digits → uniform uint32 → bucketed
    by cumulative weights (integer thresholds from
    :func:`split_thresholds` — exact boundaries, no float literal can
    drift between engines).  Stable across runs, partitionings, and
    engines (md5 is md5 everywhere — this has a DuckDB oracle, unlike
    ``randomSplit``); changing ``salt`` re-draws the assignment.  NULL
    ids get a NULL split (visible, not silently dumped into a bucket).
    """
    check_col(id_col, df)
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    expr: Column | None = None
    for t, name in zip(split_thresholds(weights), names[:-1]):
        cond = h < t
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(
        out_col,
        F.when(F.col(id_col).isNull(), F.lit(None).cast("string")).otherwise(expr),
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str] | str,
    n_per_stratum: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n, stratum size)`` rows per stratum, deterministic.

    Rows are ranked inside each stratum by ``md5(salt || key)`` — a
    content hash, so the chosen subset is pseudo-random yet identical
    across runs, partitionings, and engines (unlike ``sampleBy``, which
    is per-partition Bernoulli: approximate counts AND row-order
    dependent).  One shuffle on the strata key; each task ranks its
    strata locally — no global sort, no driver.  ``salt`` re-draws.

    Determinism requires ``key_col`` to uniquely identify rows (a
    primary key): rows sharing a key value hash identically and their
    relative order at the ``n_per_stratum`` boundary is then
    partition-dependent.  (``key_col`` itself is the secondary sort, so
    distinct keys never depend on scan order even under hash collision.)
    """
    if isinstance(strata_cols, str):
        strata_cols = [strata_cols]
    check_col([*strata_cols, key_col], df)
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def split_thresholds(
    weights: Sequence[float] = (0.9, 0.05, 0.05)
) -> list[int]:
    """The integer hash thresholds add_split uses (exported so oracles can
    embed the identical numbers)."""
    total = float(sum(weights))
    out, acc = [], 0.0
    for w in weights[:-1]:
        acc += w / total
        out.append(int(acc * (1 << 32)))
    return out


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_tokens: int,
    order_cols: Sequence[str] | None = None,
    partition_cols: Sequence[str] = (),
    out_col: str = "pack_id",
) -> DataFrame:
    """Concatenate-then-chunk sequence packing: documents in a
    deterministic order are laid end-to-end and cut every ``max_tokens``
    tokens; ``pack_id`` = the chunk a document *starts* in.

    This is the standard LLM-pretraining packing (concatenation with
    boundary straddling), not bin packing — exact greedy first-fit needs
    sequential state, while this form is one window cumsum, shuffles once
    on ``partition_cols`` (empty = single global sequence; pass a shard
    key at scale), and is SQL-expressible, so it carries a DuckDB oracle.
    """
    check_col([id_col, token_col] + list(partition_cols), df)
    order = list(order_cols) if order_cols else [id_col]
    w = (
        Window.partitionBy(*partition_cols).orderBy(*order)
        if partition_cols
        else Window.partitionBy().orderBy(*order)
    )
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    start_offset = cum - F.col(token_col)
    # integer `div` (start_offset ≥ 0, so div == floor) — a double
    # division would drift past 2^53 cumulative tokens
    return (
        df.withColumn("__start_offset", start_offset)
        .withColumn(out_col, F.expr(f"__start_offset div {int(max_tokens)}"))
        .drop("__start_offset")
    )


def materialize_packs(
    df: DataFrame,
    id_col: str,
    token_col: str,
    text_col: str,
    pack_col: str = "pack_id",
    partition_cols: Sequence[str] = (),
    separator: str = " <eos> ",
) -> DataFrame:
    """Turn :func:`pack_documents` assignments into the packed sequences a
    trainer consumes: one row per pack with its documents concatenated in
    ``id_col`` order, joined by ``separator``.

    One shuffle on the pack key; order inside a pack comes from
    ``array_sort`` over (id, text) structs — deterministic regardless of
    partitioning, no window needed.  A pack's token total can exceed the
    packing window because a document belongs to the chunk it *starts*
    in (boundary straddling — the standard pretraining layout).

    Output: ``partition_cols + [pack_col, n_docs, total_tokens,
    pack_text]``.
    """
    check_col([id_col, token_col, text_col, pack_col, *partition_cols], df)
    keys = [*partition_cols, pack_col]
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col), F.col(text_col)))
            ),
            lambda x: x[text_col],
        ),
        separator,
    )
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("total_tokens"),
        seq.alias("pack_text"),
    )


def temperature_resample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    salt: str = "",
    weight_scale: int = 1 << 20,
) -> DataFrame:
    """Temperature-based source rebalancing: keep a deterministic subset
    whose per-source share follows ``n_s**alpha`` instead of ``n_s``
    (alpha < 1 flattens the source mix — the standard multilingual /
    multi-corpus pretraining reweighting, e.g. the mBERT/XLM-R exponent).

    Math (all exact until one fixed scalar IEEE expression, identical in
    the DuckDB oracle): per-source counts ``n_s``; integer weights
    ``w_s = floor(n_s**alpha · weight_scale)``; weight total ``W = Σ w_s``
    (integer sum — exact and order-free, unlike a float Σ n_s**alpha);
    per-source keep probability ``p_s = min(1, target_total·w_s/(W·n_s))``
    where ``target_total = floor(target_fraction · N)``; a row is kept iff
    ``uint32(md5(salt‖id)) < floor(p_s · 2³²)``.

    Scale: one aggregation over the (tiny) source dimension, broadcast
    back, then a row-local hash filter — the corpus shuffles zero times.
    Deterministic in the data: re-partitioned, re-ordered input selects
    the identical rows.
    """
    import math

    check_col([source_col, id_col], df)
    # ONE aggregation scan collapses the corpus to one row per source
    # (tiny by definition) collected to the driver, where the threshold
    # arithmetic below runs the SAME IEEE double expressions as the SQL
    # oracle — bit-identical thresholds, one corpus scan instead of
    # three, no localCheckpoint/cache lifetime to manage.  Eager:
    # calling this runs the stats scan immediately.
    counts = {
        r[0]: int(r[1])
        for r in df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("__n_s"))
        .collect()
    }
    # floor to integer weights so the cross-source total is an exact
    # integer sum; sqrt is correctly rounded in IEEE 754 (bit-identical
    # across engines) — other exponents are engine-dependent and
    # excluded from the oracle query
    def wfun(n: int) -> int:
        x = math.sqrt(float(n)) if alpha == 0.5 else float(n) ** float(alpha)
        return int(math.floor(x * float(weight_scale)))

    w_s = {s: wfun(n) for s, n in counts.items()}
    w_tot = sum(w_s.values())
    n_tot = sum(counts.values())
    target_total = float(math.floor(float(target_fraction) * float(n_tot)))
    rows = []
    for s, n in counts.items():
        p = min(
            1.0, target_total * float(w_s[s]) / float(w_tot) / float(n)
        )
        rows.append((s, int(math.floor(p * 4294967296.0))))
    src_type = df.schema[source_col].dataType.simpleString()
    thresholds = local_df(
        df.sparkSession, rows, f"{source_col} {src_type}, __thr long"
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (
        df.join(F.broadcast(thresholds), source_col, "inner")
        .filter(h < F.col("__thr"))
        .drop("__thr")
    )


def quantile_filter_by_group(
    df: DataFrame,
    group_cols: Sequence[str] | str,
    score_col: str,
    keep_fraction: float,
    tiebreak_col: str,
) -> DataFrame:
    """Keep the top ``keep_fraction`` of rows per group by score —
    rank-based CDF filtering (per-language quality cuts in pretraining
    pipelines).

    Rank-based rather than value-based on purpose: a value threshold from
    ``percentile(score, q)`` depends on float interpolation (engine- and
    implementation-specific), while ``row_number`` ordered by
    ``(score DESC, tiebreak ASC)`` with an integer cutoff
    ``ceil(keep_fraction · n_g)`` is exact, deterministic, and keeps an
    exact per-group count.  One shuffle on the group key; group
    cardinality (languages, sources) is bounded, so window state per key
    is the group's row count — for very hot groups compose with
    ``stratified_sample`` first.
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    check_col([*group_cols, score_col, tiebreak_col], df)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(tiebreak_col).asc()
    )
    wn = Window.partitionBy(*group_cols)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n_g", F.count(F.lit(1)).over(wn))
        .filter(
            F.col("__rk")
            <= F.ceil(F.lit(float(keep_fraction)) * F.col("__n_g").cast("double"))
        )
        .drop("__rk", "__n_g")
    )


__all__ = [
    "add_split",
    "split_thresholds",
    "stratified_sample",
    "pack_documents",
    "materialize_packs",
    "temperature_resample",
    "quantile_filter_by_group",
]


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    group_cols: Sequence[str] = (),
    salt: str = "",
    out_col: str = "sample_rank",
) -> DataFrame:
    """Fixed-size weighted random sample without replacement (per group):
    the Efraimidis–Spirakis A-ES scheme — each row draws a deterministic
    uniform ``u`` from ``md5(salt‖id)`` and the top-``k`` rows per group
    by key ``u^(1/w)`` are the sample.  Inclusion probability is
    proportional to weight, exactly as sequential weighted sampling
    without replacement would give.

    Deterministic in the data (hash-derived ``u``, id tie-break), so the
    same corpus yields the same sample under any partitioning — and the
    construction is reproducible in ANSI SQL for the DuckDB oracle.

    Scale: with ``group_cols`` — one shuffle for the per-group top-k
    window; without — orderBy+limit, which plans as distributed
    TakeOrdered (per-partition heaps merged on the driver), never a
    single-partition window.  Rows with ``weight <= 0`` or NULL are
    excluded (zero inclusion probability).

    Output: input columns + ``out_col`` (1..k rank by sampling key).
    """
    check_col([weight_col, id_col, *group_cols], df)
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    # u in (0, 1): +0.5 keeps u strictly positive so u^(1/w) never
    # collapses to 0 for every row at once
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    pos = df.filter(F.col(weight_col).cast("double") > 0)
    if group_cols:
        w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
            key.desc(), F.col(id_col).asc()
        )
        return pos.withColumn(out_col, F.row_number().over(w)).filter(
            F.col(out_col) <= k
        )
    # ungrouped: TakeOrdered top-k, then rank the k survivors (the window
    # runs over k rows only — never the full table)
    top = (
        pos.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.partitionBy().orderBy(F.col("__key").desc(), F.col(id_col).asc())
    return top.withColumn(out_col, F.row_number().over(w)).drop("__key")


def mixture_resample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    targets: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Deterministic subsample hitting an EXPLICIT domain mixture — the
    "50% web / 30% books / 20% code" curation step (temperature_resample
    reweights relative to observed counts; this hits stated shares).

    Semantics: the output is the LARGEST subsample whose expected
    per-source share equals ``targets`` — total ``T = min_s floor(n_s /
    t_s)`` (the binding source is fully used, every other source is
    hash-thinned to ``p_s = T·t_s / n_s``).  Sources absent from
    ``targets`` are dropped.  A row is kept iff
    ``uint32(md5(salt‖id)) < floor(p_s · 2³²)`` — deterministic in the
    data, replayable in ANSI SQL, and the realized share is binomially
    close to the target (exact-count sampling would need a per-source
    top-k; use :func:`weighted_sample` when exact counts matter).

    Scale: ONE aggregation scan over the corpus collapses to one row per
    target source (tiny by definition — collected to the driver, where
    the threshold arithmetic runs the same IEEE double ops as the SQL
    oracle), then one broadcast-join hash filter — the corpus never
    shuffles.  Eager: calling this runs the stats scan immediately.
    A target source MISSING from the data raises (silently proceeding
    would emit a mixture violating the stated shares — a corrupted
    curation run, not a degenerate case).
    """
    import math

    check_col([source_col, id_col], df)
    if not targets:
        raise ValueError("targets must be non-empty")
    tot = float(sum(targets.values()))
    norm = {s: float(t) / tot for s, t in targets.items()}
    spark = df.sparkSession
    counts = {
        r[0]: r[1]
        for r in df.filter(F.col(source_col).isin(list(targets)))
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("__n_s"))
        .collect()
    }
    missing = sorted(set(targets) - set(counts))
    if missing:
        raise ValueError(
            f"mixture_resample: target sources absent from the data: "
            f"{missing} — the requested mixture is unsatisfiable"
        )
    cap = min(math.floor(counts[s] / norm[s]) for s in counts)
    rows = []
    for s, n_s in counts.items():
        # same expression order as the SQL twin: (cap · t) / n — IEEE
        # doubles, so the thresholds are bit-identical cross-engine
        p = min(1.0, cap * norm[s] / float(n_s))
        rows.append((s, int(math.floor(p * 4294967296.0))))
    src_type = df.schema[source_col].dataType.simpleString()
    thresholds = local_df(
        spark, rows, f"{source_col} {src_type}, __thr long"
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (
        df.join(F.broadcast(thresholds), source_col, "inner")
        .filter(h < F.col("__thr"))
        .drop("__thr")
    )


def quota_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    salt: str = "",
) -> DataFrame:
    """Per-group quota: keep at most ``cap`` rows per group — the
    crawl-curation "per-site cap" that stops a handful of giant domains
    from dominating the corpus (every web corpus paper applies one).

    Which rows survive an over-quota group is decided by the content
    hash ``md5(salt‖id)`` (ties broken by id), NOT by arrival order: the
    kept set is deterministic in the data — stable across runs,
    partitionings, and engines — and changing ``salt`` re-draws it.

    Scale: one shuffle on the group key into a ``row_number`` window.
    A pathologically hot group (the skew case the cap exists for) is
    bounded work per partition — the window ranks it in one task but
    emits at most ``cap`` rows; for hot-key robustness at extreme scale
    combine with a pre-aggregation count filter so only over-quota
    groups pay the full sort (not done here: the plain window is one
    stage and AQE splits skewed partitions).
    """
    check_col([group_col, id_col], df)
    if cap < 1:
        raise ValueError("cap must be >= 1")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def token_budget_select(
    df: DataFrame,
    score_col: str,
    token_col: str,
    id_col: str,
    budget: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Quality-ranked corpus selection under a token budget: walk the
    corpus in (score desc, id asc) order and keep every document while
    the running token total stays ≤ ``budget`` — the "take the best N
    billion tokens" step every pretraining data recipe ends with.

    Semantics are EXACTLY the single global window
    ``sum(tokens) over (order by score desc, id) <= budget`` — but that
    window is a single-partition global sort, the one shape that cannot
    scale.  A two-level plan produces the identical rows:

    1. bucket documents by score range (boundaries from
       ``approxQuantile`` on the driver — ≤ ``n_buckets`` values);
    2. aggregate per-bucket token sums (tiny: ``n_buckets`` rows),
       prefix-sum them in one driver pass, and drop every bucket whose
       prefix already exceeds the budget — those rows never shuffle;
    3. each surviving bucket gets its exact prefix offset via a
       broadcast join, and the running total is a window PARTITIONED BY
       BUCKET (parallel, ~1/``n_buckets`` of the corpus per partition)
       + the offset — no global sort anywhere.

    Rows whose scores tie always land in the same bucket (assignment is
    a pure function of the score value), so bucket-prefix order refines
    the (score desc, id) row order exactly and the kept set is
    deterministic in the data.  Returns the kept rows plus
    ``cum_tokens`` (running total including the row).  NULL score or
    token rows are dropped (unrankable).
    """
    check_col([score_col, token_col, id_col], df)
    if budget < 0:
        raise ValueError("budget must be >= 0")
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(token_col).isNotNull()
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(base.stat.approxQuantile(score_col, probs, 0.001)))
    # bucket 0 = best scores; score > bounds[i] ⇒ bucket ≤ i
    bucket = F.lit(len(bounds))
    for i, b in enumerate(bounds):
        bucket = F.when(
            F.col(score_col) > F.lit(b), F.lit(len(bounds) - 1 - i)
        ).otherwise(bucket)
    bucketed = base.withColumn("__bk", bucket)
    per = {
        int(r["__bk"]): int(r["toks"])
        for r in bucketed.groupBy("__bk")
        .agg(F.sum(token_col).alias("toks"))
        .collect()
    }
    offsets: list[tuple[int, int]] = []
    running = 0
    for bk in sorted(per):
        if running > budget:
            break  # this and all later buckets start past the budget
        offsets.append((bk, running))
        running += per[bk]
    if not offsets:
        return (
            bucketed.withColumn("cum_tokens", F.lit(None).cast("long"))
            .limit(0)
            .drop("__bk")
        )
    offs = local_df(
        df.sparkSession, offsets, "__bk int, __off bigint"
    )
    w = Window.partitionBy("__bk").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        bucketed.join(F.broadcast(offs), "__bk")
        .withColumn(
            "cum_tokens",
            F.sum(token_col).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            + F.col("__off"),
        )
        .filter(F.col("cum_tokens") <= budget)
        .drop("__bk", "__off")
    )


def epoch_mixture(
    df: DataFrame,
    source_col: str,
    token_col: str,
    id_col: str,
    targets: dict[str, float],
    max_epochs: float = 4.0,
    salt: str = "",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Token-budget mixture with EPOCH UPSAMPLING — the pretraining
    recipe step :func:`mixture_resample` cannot express: scarce
    high-quality sources are repeated (up to ``max_epochs`` passes)
    while abundant ones are thinned, so each source lands on its stated
    token budget.

    Per source ``s``: ``rate_s = min(max_epochs, budget_s / tokens_s)``.
    Every row is emitted ``floor(rate_s)`` times, plus one more copy iff
    ``uint32(md5(salt‖id)) < floor(frac(rate_s)·2³²)`` — expected output
    tokens ≈ ``min(budget_s, max_epochs·tokens_s)``, each copy tagged
    with an ``epoch_col`` index (0-based) so a trainer can schedule
    passes.  Deterministic in the data (hash thinning, no RNG) and
    replayable in ANSI SQL.  Sources absent from ``targets`` are
    dropped; a target source absent from the data raises, exactly as in
    :func:`mixture_resample`.

    Scale: one aggregation scan collapses to a row per target source
    (driver-side threshold arithmetic in the same IEEE order as the SQL
    twin), then a broadcast-join + ``explode(sequence(...))`` map step
    — the corpus shuffles nowhere, and the explode factor is bounded by
    ``ceil(max_epochs)``.
    """
    import math

    check_col([source_col, token_col, id_col], df)
    if not targets:
        raise ValueError("targets must be non-empty")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be positive")
    spark = df.sparkSession
    toks = {
        r[0]: (None if r[1] is None else int(r[1]))
        for r in df.filter(F.col(source_col).isin(list(targets)))
        .groupBy(source_col)
        .agg(F.sum(token_col).alias("__t"))
        .collect()
    }
    missing = sorted(set(targets) - set(toks))
    if missing:
        raise ValueError(
            f"epoch_mixture: target sources absent from the data: "
            f"{missing} — the requested mixture is unsatisfiable"
        )
    # a source whose token sum is 0 (or all-NULL) cannot reach ANY
    # positive budget by upsampling — name it instead of dividing by it
    empty = sorted(s for s, t in toks.items() if t is None or t <= 0)
    if empty:
        raise ValueError(
            f"epoch_mixture: target sources with zero/NULL total "
            f"{token_col!r}: {empty} — the requested mixture is "
            f"unsatisfiable (no tokens to upsample)"
        )
    rows = []
    for s, t_s in toks.items():
        # IEEE order mirrored by the SQL twin: budget/tokens, min, floor
        rate = min(float(max_epochs), float(targets[s]) / float(t_s))
        n_full = int(math.floor(rate))
        thr = int(math.floor((rate - math.floor(rate)) * 4294967296.0))
        rows.append((s, n_full, thr))
    src_type = df.schema[source_col].dataType.simpleString()
    plan = local_df(
        spark, rows, f"{source_col} {src_type}, __nf int, __thr long"
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    n = F.col("__nf") + (h < F.col("__thr")).cast("int")
    return (
        df.join(F.broadcast(plan), source_col, "inner")
        .withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn(
            epoch_col, F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
        .drop("__nf", "__thr", "__n")
    )


def neyman_stratified_sample(
    df: DataFrame,
    strata_cols,
    value_col: str,
    total_n: int,
    key_col: str,
    salt: str = "",
    scale_bits: int = 20,
    max_strata: int = 100_000,
) -> DataFrame:
    """Variance-optimal stratified sampling (Neyman 1934): split a total
    budget of ``total_n`` rows across strata proportionally to
    ``N_h·σ_h`` — strata that are big AND internally variable get more
    samples, constant strata get almost none.  The estimator-variance-
    minimizing allocation for a survey mean of ``value_col``, vs the
    equal (``stratified_sample``) or proportional allocations.

    Determinism/cross-engine contract: per-stratum variance comes from
    EXACT integer moment cells (``floor(v·2^bits)`` int64 sums, squares
    in decimal(38,0) — the a15_group_ols device), converted once to
    doubles in a pinned order, so the per-stratum allocation
    ``n_h = floor(total_n · N_h σ_h / Σ N_j σ_j)`` is bit-replayable in
    SQL.  Floor allocations under-spend by < #strata rows (no
    largest-remainder redistribution — deterministic and simple; raise
    ``total_n`` if exact spend matters).  Row selection inside a
    stratum is the ``md5(salt‖key)`` rank of :func:`stratified_sample`.

    Scale: one moments aggregate (map-side partials) collapses to one
    row per stratum, collected driver-side (bounded by ``max_strata``);
    allocations broadcast back; one strata-keyed ranking window.  NULL
    values are excluded from the moments AND from the sample
    (unrankable for a value-targeted design).
    """
    keys = [strata_cols] if isinstance(strata_cols, str) else list(strata_cols)
    check_col(keys + [value_col, key_col], df)
    if total_n < 0:
        raise ValueError("total_n must be >= 0")
    m = float(2**scale_bits)
    base = df.filter(F.col(value_col).isNotNull())
    q = F.floor(F.col(value_col).cast("double") * F.lit(m)).cast("long")
    cells = (
        base.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(q).alias("__s1"),
            F.sum(
                (q.cast("decimal(38,0)") * q.cast("decimal(38,0)"))
            ).alias("__s2"),
        )
        .collect()
    )
    if len(cells) > max_strata:
        raise ValueError(
            f"{len(cells)} strata exceeds max_strata={max_strata}"
        )
    import math

    weights = []
    for r in cells:
        n_h = int(r["__n"])
        s1 = int(r["__s1"])
        s2 = int(r["__s2"])
        # exact integer variance numerator/denominator, ONE double div
        var_num = n_h * s2 - s1 * s1
        var_den = n_h * n_h
        sigma = math.sqrt(max(float(var_num) / float(var_den), 0.0)) / m
        # re-quantize the weight so the TOTAL is an integer sum —
        # order-insensitive, hence bit-replayable by a SQL SUM whose
        # accumulation order is not controllable (a float Σ N_h·σ_h
        # could round differently per order and flip a floor boundary)
        w_q = int(math.floor(n_h * sigma * m))
        weights.append((tuple(r[k] for k in keys), n_h, w_q))
    w_total = sum(w_q for _, _, w_q in weights)
    rows = []
    for strat, n_h, w_q in weights:
        alloc = 0 if w_total == 0 else (total_n * w_q) // w_total
        rows.append((*strat, min(int(alloc), n_h)))
    spark = df.sparkSession
    key_schema = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
    )
    alloc_df = local_df(spark, rows, f"{key_schema}, __alloc int")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(*keys).orderBy(h.asc(), F.col(key_col).asc())
    return (
        base.join(F.broadcast(alloc_df), keys)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__alloc"))
        .drop("__rk", "__alloc")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    weights: Sequence[float] = (0.9, 0.05, 0.05),
    names: Sequence[str] = ("train", "val", "test"),
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test split that CANNOT leak near-duplicates across the
    boundary: documents connected by a near-dup pair (from any miner in
    ``operators/dedup.py``) are split as a UNIT — the whole duplicate
    cluster hashes on its canonical representative, so a test document's
    paraphrase can never sit in train.  Plain :func:`add_split` has
    exactly this leak: two near-identical docs hash independently.

    Composition: pairs → connected components
    (:func:`~..operators.dedup.resolve_duplicate_groups`, O(log
    diameter) label-propagation shuffles) → split key =
    ``coalesce(component representative, own id)`` → the integer-
    threshold md5 bucket of :func:`add_split`.  Every stage is
    deterministic in the data and SQL-replayable, components included
    (recursive-CTE oracle).  Cost beyond the pair mining: one id-keyed
    left join against the component labels (pair-participant-sized,
    usually ≪ corpus), then map-only hashing.
    """
    from .dedup import resolve_duplicate_groups

    check_col([id_col], df)
    labels = resolve_duplicate_groups(pairs).select(
        F.col("doc_id").alias(id_col), "keep_id"
    )
    keyed = df.join(labels, id_col, "left").withColumn(
        "__split_key", F.coalesce(F.col("keep_id"), F.col(id_col))
    )
    return add_split(
        keyed, "__split_key", weights, names, salt, out_col
    ).drop("__split_key", "keep_id")
