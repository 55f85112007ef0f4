"""Text-analysis column expressions for large-scale corpus pipelines
(BASELINE.json north-star extensions: language-ID, quality scoring, token
counting, fingerprinting — all pure ``pyspark.sql.functions``, no Python in
the hot path, so a 100 TB corpus scan stays inside whole-stage codegen).

These are additions beyond the reference surface (SURVEY.md §7 Phase 5);
the ``documents`` table (doc_id, text, lang, source, n_chars) is the
driver-provided fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col, spread

# ---------------------------------------------------------------------------
# tokenization & counting
# ---------------------------------------------------------------------------

WS = r"\s+"
# BPE-ish word/punct splitter: words, numbers, or single non-space symbols
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_ws(text: Column) -> Column:
    """Whitespace tokens of trimmed text; empty text → empty array."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, WS)
    )


def token_count_ws(text: Column) -> Column:
    return F.size(tokens_ws(text))


def token_count_bpe_ish(text: Column) -> Column:
    """Sub-word-ish token count via the word/number/symbol regex — a cheap
    stand-in for a BPE tokenizer's token count."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), F.lit(0)))


def word_shingles(text: Column, n: int) -> Column:
    """Array of n-gram word shingles (space-joined, lowercased).

    Built as ``zip_with`` over n shifted slices of the token array — one
    pass, no per-position array copy (the per-index ``slice + concat_ws``
    form measured 10× slower on document-scale arrays)."""
    toks = tokens_ws(F.lower(text))
    if n == 1:
        return toks
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    cur = F.slice(toks, 1, length)
    for k in range(1, n):
        cur = F.zip_with(
            cur,
            F.slice(toks, 1 + k, length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return cur


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

STOPWORDS_EN = (
    "the a an and or of to in is are was were be been it this that for on with"
).split()


def add_text_quality(
    df: DataFrame, text_col: str = "text", prefix: str = ""
) -> DataFrame:
    """Length / punctuation / stopword / digit / uppercase signals plus a
    composite [0,1] quality score (heuristics in the C4/Gopher-rule family).

    All ratios use ``try_divide`` (NULL on empty text, ANSI-safe).
    """
    check_col(text_col, df)
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_ws(t)
    punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,!?;:]"), F.lit(0)))
    digits = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), F.lit(0)))
    uppers = F.size(F.regexp_extract_all(t, F.lit(r"[A-Z]"), F.lit(0)))
    stop_patt = r"(?i)\b(" + "|".join(STOPWORDS_EN) + r")\b"
    stops = F.size(F.regexp_extract_all(t, F.lit(stop_patt), F.lit(0)))

    p = prefix
    out = (
        df.withColumn(f"{p}n_chars_m", n_chars)
        .withColumn(f"{p}n_tokens", n_tokens)
        .withColumn(f"{p}punct_ratio", F.try_divide(punct, n_chars))
        .withColumn(f"{p}digit_ratio", F.try_divide(digits, n_chars))
        .withColumn(f"{p}upper_ratio", F.try_divide(uppers, n_chars))
        .withColumn(f"{p}stopword_ratio", F.try_divide(stops, n_tokens))
        .withColumn(
            f"{p}mean_token_len",
            F.try_divide(n_chars - (n_tokens - 1), n_tokens),
        )
    )
    # composite score: reward stopword presence & sane token lengths,
    # punish digit/punct floods (clamped linear terms; deterministic).
    # NB Spark's least() SKIPS nulls (least(NULL, 1.0) = 1.0), so the score
    # is gated on n_tokens > 0 rather than relying on null propagation.
    score = (
        F.least(F.col(f"{p}stopword_ratio") * 2.5, F.lit(1.0)) * 0.4
        + F.when(
            (F.col(f"{p}mean_token_len") >= 2) & (F.col(f"{p}mean_token_len") <= 12),
            F.lit(1.0),
        ).otherwise(F.lit(0.0))
        * 0.3
        + (1 - F.least(F.col(f"{p}digit_ratio") * 5, F.lit(1.0))) * 0.15
        + (1 - F.least(F.col(f"{p}punct_ratio") * 5, F.lit(1.0))) * 0.15
    )
    return out.withColumn(
        f"{p}quality_score",
        F.when(F.col(f"{p}n_tokens") > 0, score).otherwise(F.lit(0.0)),
    )


# ---------------------------------------------------------------------------
# language identification (stopword n-gram heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "ist", "das", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "es": ["el", "de", "que", "y", "los", "es", "una", "por"],
    "zh": ["的", "是", "了", "在", "我", "有", "他", "不"],
}


def add_language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Heuristic language ID: per-language stopword-hit counts, argmax with
    deterministic tiebreak (language-code order).  Texts with no marker
    hits → 'und' (undetermined)."""
    check_col(text_col, df)
    t = F.lower(F.col(text_col))
    scores = {
        lang: F.size(
            F.regexp_extract_all(
                t, F.lit(r"\b(" + "|".join(words) + r")\b"), F.lit(0)
            )
        )
        for lang, words in LANG_MARKERS.items()
    }
    langs = sorted(scores)  # deterministic tie order
    best = F.lit("und")
    best_score = F.lit(0)
    # fold: earlier language wins ties (strictly-greater replaces)
    for lang in langs:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return df.withColumn(out_col, best)


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

def normalized_fingerprint(text: Column) -> Column:
    """MD5 of whitespace-normalized lowercased text — a cross-engine stable
    document key for exact dedup (md5 is identical in Spark and DuckDB)."""
    return F.md5(
        F.encode(F.lower(F.trim(F.regexp_replace(text, WS, " "))), "UTF-8")
    )


def rolling_hash_fingerprint(text: Column, window: int = 8) -> Column:
    """Winnowing-style fingerprint: min xxhash64 over token n-gram windows
    (Schleimer/Wilkerson/Aiken, "Winnowing: local algorithms for document
    fingerprinting", SIGMOD 2003).  Engine-specific hash (xxhash64) → no
    SQL oracle; property-tested."""
    sh = word_shingles(text, window)
    hashed = F.transform(sh, lambda s: F.xxhash64(s))
    return F.when(F.size(hashed) == 0, F.lit(None).cast("long")).otherwise(
        F.array_min(hashed)
    )


# ---------------------------------------------------------------------------
# repetition statistics (Gopher-style quality rules)
# ---------------------------------------------------------------------------

def repetition_stats(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-document repetition ratios — the Gopher/MassiveText filter
    family (Rae et al. 2021 §A1.1: "fraction of characters in the most
    common n-gram", duplicate-fraction rules), word-level:

    - ``dup_word_frac`` — fraction of word occurrences that are repeats
      of an earlier word (``1 − distinct/total``);
    - ``top_word_frac`` — most frequent word's share of all words;
    - ``top_bigram_frac`` — most frequent word-bigram's share of all
      bigrams (NULL for one-word documents).

    Highly repetitive machine-generated or boilerplate text scores high
    and gets dropped by thresholding downstream.

    Plan: explode grams → (doc, gram) count → per-doc agg; two shuffle
    stages per gram order, both keyed on the document id, and the two
    per-doc aggregates join co-partitioned.  No Python, no driver.
    Fractions are single IEEE divisions of exact integer counts —
    bit-reproducible in any engine (the DuckDB oracle replays them).
    """
    check_col([id_col, text_col], df)
    # spread before the gram explodes (guide §2.5): both per-gram-order
    # map passes run at the scan's partitioning; one exchange of
    # (id, text) here parallelizes both.  Guarded no-op on wide inputs.
    src = spread(df.select(F.col(id_col), F.col(text_col).alias("__txt")))

    def per_doc(gram_order: int, n_name: str, top_name: str) -> DataFrame:
        grams = src.select(
            F.col(id_col),
            F.explode(word_shingles(F.col("__txt"), gram_order)).alias("g"),
        )
        counts = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
        agg = [
            F.sum("c").alias(n_name),
            F.max("c").alias(top_name),
        ]
        if gram_order == 1:
            agg.append(F.count(F.lit(1)).alias("n_distinct_words"))
        return counts.groupBy(id_col).agg(*agg)

    w = per_doc(1, "n_words", "top_word_count")
    b = per_doc(2, "n_bigrams", "top_bigram_count")
    joined = w.join(b, id_col, "left")
    return joined.select(
        F.col(id_col),
        F.col("n_words"),
        F.col("n_distinct_words"),
        (
            (F.col("n_words") - F.col("n_distinct_words")) / F.col("n_words")
        ).alias("dup_word_frac"),
        (F.col("top_word_count") / F.col("n_words")).alias("top_word_frac"),
        (F.col("top_bigram_count") / F.col("n_bigrams")).alias(
            "top_bigram_frac"
        ),
    )


# ---------------------------------------------------------------------------
# document chunking (sliding token windows)
# ---------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 256,
    stride_tokens: int = 192,
) -> DataFrame:
    """Sliding-window chunking: one output row per (document, window) of
    ``chunk_tokens`` whitespace tokens advancing by ``stride_tokens`` —
    the context-window split for RAG indexing / long-document training.

    Windows start at 0, stride, 2·stride, …; the last window starts at
    the largest multiple of stride < n (so the tail is always covered,
    possibly shorter than ``chunk_tokens``).  Chunk count is exact
    integer arithmetic (``1 + ceil((n − chunk)/stride)`` via ``div``),
    never float.  Pure JVM expressions: tokenization, ``sequence`` +
    ``explode`` for window indices, ``slice`` + ``array_join`` for the
    chunk text — a map-side-only plan that composes with any downstream
    partitioning (no shuffle, no Python).  Empty documents emit no rows.

    Output: input id plus ``chunk_id`` (0-based), ``chunk_start`` (0-based
    token offset), ``n_chunk_tokens``, ``chunk_text``.
    """
    if stride_tokens <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride_tokens must be positive")
    if stride_tokens > chunk_tokens:
        # stride past the window guarantees uncovered token gaps and an
        # empty trailing chunk — never what a caller wants
        raise ValueError(
            f"stride_tokens ({stride_tokens}) must be <= chunk_tokens "
            f"({chunk_tokens}); larger strides leave tokens in no chunk"
        )
    check_col([id_col, text_col], df)
    tcol = "__toks"
    # integer ceil((n - chunk)/stride) via `div`; never float
    n_chunks = F.lit(1) + F.when(
        F.size(F.col(tcol)) <= chunk_tokens, F.lit(0)
    ).otherwise(
        F.expr(
            f"(size({tcol}) - {int(chunk_tokens)}"
            f" + {int(stride_tokens)} - 1) div {int(stride_tokens)}"
        )
    )
    out = (
        df.withColumn(tcol, tokens_ws(F.col(text_col)))
        .filter(F.size(tcol) > 0)
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn("chunk_start", F.col("chunk_id") * stride_tokens)
        .withColumn(
            "__chunk",
            F.slice(F.col(tcol), F.col("chunk_start") + 1, F.lit(chunk_tokens)),
        )
        .withColumn("n_chunk_tokens", F.size("__chunk"))
        .withColumn("chunk_text", F.array_join("__chunk", " "))
        .drop(tcol, "__chunk")
    )
    return out


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction with counts)
# ---------------------------------------------------------------------------

# RE2-compatible (no backreferences/lookahead) so the same patterns run
# in Spark (java.util.regex) and DuckDB (RE2) byte-identically
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("number", r"\b[0-9]{9,}\b", "<NUMBER>"),
]


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Redact emails, IPv4 addresses, and ≥9-digit number runs, keeping
    per-pattern match counts (the audit trail a compliance pass needs).

    Patterns apply in a fixed order (email → ip → number) so their
    replacements cannot cascade; counts are taken on the ORIGINAL text.
    Pure regexp expressions — JVM-side, no shuffle, and replayable in any
    RE2-compatible engine (the patterns avoid Java-only constructs).
    """
    check_col(text_col, df)
    out = df
    scrubbed = F.col(text_col)
    for name, patt, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(patt), F.lit(0))),
        )
        scrubbed = F.regexp_replace(scrubbed, patt, token)
    return out.withColumn(out_col, scrubbed)


__all__ = [
    "tokens_ws",
    "token_count_ws",
    "token_count_bpe_ish",
    "word_shingles",
    "add_text_quality",
    "add_language_id",
    "normalized_fingerprint",
    "rolling_hash_fingerprint",
    "repetition_stats",
    "chunk_documents",
    "scrub_pii",
    "PII_PATTERNS",
    "STOPWORDS_EN",
    "LANG_MARKERS",
]


# ---------------------------------------------------------------------------
# character-trigram LM quality scoring (CCNet-style frequency filter)
# ---------------------------------------------------------------------------


def char_trigrams(text: Column, max_chars: int | None = None) -> Column:
    """Array of character 3-grams of the normalized text (lowercased,
    whitespace collapsed to single spaces).  Pure expressions — the
    trigram explosion stays inside whole-stage codegen.

    ``max_chars`` truncates the normalized text first: quality scoring
    rarely needs more than a prefix (CCNet-style filters score a bounded
    sample), and the trigram explode is the dominant cost.

    Construction note: built as ``zip_with`` over three shifted slices of
    the char array — lambda bodies touch ONLY lambda variables.  The
    obvious ``transform(sequence(1, n-2), i -> substr(norm, i, 3))`` is
    quadratic: a higher-order-function lambda re-evaluates every captured
    child expression (the whole normalize chain) PER ELEMENT (measured
    18 s for 1.5M trigrams at sf0.1; this form is ~20×  faster).  Same
    trick as :func:`word_shingles`."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    if max_chars is not None:
        norm = F.substring(norm, 1, int(max_chars))
    cs = F.split(norm, "")
    length = F.greatest(F.length(norm) - 2, F.lit(0))
    a = F.slice(cs, 1, length)
    b = F.slice(cs, 2, length)
    c = F.slice(cs, 3, length)
    ab = F.zip_with(a, b, lambda x, y: F.concat(x, y))
    return F.zip_with(ab, c, lambda x, y: F.concat(x, y))


def trigram_model(
    df: DataFrame, text_col: str = "text", max_chars: int | None = None
) -> DataFrame:
    """Character-trigram frequency model: ``(g, c3)`` counts over the
    corpus (typically the train split — the model must not see held-out
    text).  Cardinality is alphabet-bounded (≤ |Σ|³ regardless of corpus
    size), so the model is broadcastable at any data scale."""
    check_col([text_col], df)
    # spread before the trigram explode (guide §2.5): the normalize +
    # explode map pass otherwise runs at the scan's partitioning (one
    # task on a one-row-group table); guarded no-op on wide inputs
    return (
        spread(df.select(F.col(text_col).alias("__txt")))
        .select(
            F.explode(char_trigrams(F.col("__txt"), max_chars)).alias("g")
        )
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c3"))
    )


def trigram_lm_scores(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int | None = None,
) -> DataFrame:
    """Frequency-based LM quality score per document: the mean training
    frequency of the document's character trigrams (integer division —
    exact and engine-independent, unlike a float log-perplexity whose
    last-ulp ``ln`` differences diverge across engines).

    Low score = the document is built from trigrams the training corpus
    rarely contains — gibberish, encoding noise, or wrong-language text;
    this is the frequency form of the CCNet/KenLM perplexity filter.

    Scale: one trigram explode of the scored corpus, one broadcast join
    against the alphabet-bounded model, one per-doc aggregation.
    Documents shorter than 3 normalized chars produce no trigrams and are
    absent from the output (no defined score).

    Output: ``id_col, n_tri, sum_c3, score`` (score = sum_c3 div n_tri).
    """
    check_col([id_col, text_col], df)
    # spread before the trigram explode (guide §2.5) — see trigram_model
    tri = spread(
        df.select(F.col(id_col), F.col(text_col).alias("__txt"))
    ).select(
        F.col(id_col),
        F.explode(char_trigrams(F.col("__txt"), max_chars)).alias("g"),
    )
    joined = tri.join(F.broadcast(model), "g", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.sum(F.coalesce(F.col("c3"), F.lit(0))).alias("sum_c3"),
        )
        .withColumn("score", F.expr("sum_c3 div n_tri"))
    )


def paragraph_quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    para_tokens: int = 20,
    min_distinct_ratio: float = 0.6,
    min_para_tokens: int = 3,
    out_col: str = "filtered_text",
) -> DataFrame:
    """Paragraph-granular quality filtering, the CCNet shape: score each
    paragraph of a document independently, drop the bad ones, and
    reassemble the document from the survivors — a document with one
    boilerplate block keeps its good prose instead of being kept or
    killed whole.

    "Paragraphs" are consecutive ``para_tokens``-token windows (the test
    corpus has no newline structure; on real crawls split on blank
    lines first and feed the pieces through the same scoring).  A
    paragraph survives if it has ≥ ``min_para_tokens`` tokens AND its
    distinct-token ratio ≥ ``min_distinct_ratio`` (the repetition
    heuristic: boilerplate and keyword-stuffing collapse the ratio; a
    perplexity score slots into the same predicate where an LM is
    available — cf. ``trigram_lm``).

    The whole operator is array higher-order functions on the token
    array — ``sequence`` → ``transform``/``slice`` → ``filter`` →
    ``flatten`` → ``array_join`` — a map-only plan: NO explode, NO
    groupBy-reassembly shuffle, no Python.  Per-row cost is linear in
    document length; the plan composes with any downstream partitioning.

    Output: input columns + ``n_paras``, ``n_kept_paras``,
    ``n_kept_tokens``, and ``out_col`` (kept paragraphs joined by one
    space; empty string when nothing survives).
    """
    check_col([id_col, text_col], df)
    if para_tokens < 1 or min_para_tokens < 1:
        raise ValueError("para_tokens and min_para_tokens must be >= 1")
    # materialize the token array into a column: referencing the raw
    # split expression inside the slice lambda would re-tokenize the
    # document once PER PARAGRAPH (the O(n²/para) trap measured on
    # txt_freq_spectrum)
    df = df.withColumn("__pqf_toks", tokens_ws(F.col(text_col)))
    toks = F.col("__pqf_toks")
    n = F.size(toks)
    n_paras = F.ceil(n / F.lit(para_tokens)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), F.greatest(n_paras, F.lit(1)) - 1),
        lambda i: F.slice(toks, i * para_tokens + 1, para_tokens),
    )
    # empty doc: sequence(0,0) yields one empty slice; filter drops it
    good = F.filter(
        paras,
        lambda p: (F.size(p) >= min_para_tokens)
        & (
            F.size(F.array_distinct(p)).cast("double")
            / F.size(p).cast("double")
            >= F.lit(float(min_distinct_ratio))
        ),
    )
    return (
        df.withColumn("__paras", paras)
        .withColumn("__good", good)
        .withColumn("n_paras", F.when(n == 0, F.lit(0)).otherwise(n_paras))
        .withColumn("n_kept_paras", F.size("__good"))
        .withColumn("n_kept_tokens", F.size(F.flatten("__good")))
        .withColumn(out_col, F.array_join(F.flatten("__good"), " "))
        .drop("__paras", "__good", "__pqf_toks")
    )


# ---------------------------------------------------------------------------
# line-level C4 cleaning and the composed Gopher document gate
# ---------------------------------------------------------------------------

C4_TERMINAL_PUNCT = (".", "!", "?", '"', "'")


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_words: int = 5,
    terminal_punct: tuple[str, ...] = C4_TERMINAL_PUNCT,
    line_blacklist: tuple[str, ...] = ("javascript", "cookie policy"),
    doc_blacklist: tuple[str, ...] = ("lorem ipsum", "{"),
    out_col: str = "cleaned_text",
) -> DataFrame:
    """C4-style line-granular cleaning (Raffel et al. 2020 §2.2): keep a
    line only if it has ≥ ``min_words`` whitespace words, ends in
    terminal punctuation, and contains no blacklisted substring
    (case-insensitive); drop the whole document when it contains any
    ``doc_blacklist`` substring (C4 drops "lorem ipsum" placeholders and
    pages with source code ``{``).

    Pure array HOFs over ``split(text, '\\n')`` — a map-only plan with
    no explode/regroup shuffle, same scale shape as
    :func:`paragraph_quality_filter` (C4's own pipeline is exactly this:
    a per-document pure function over 750 GB of text).

    Output: input columns + ``n_lines``, ``n_kept_lines``, ``out_col``
    (kept lines re-joined with ``\\n``; empty when nothing survives) and
    ``keep_doc`` (no blacklisted substring AND ≥1 surviving line).
    """
    check_col([id_col, text_col], df)
    if min_words < 1:
        raise ValueError("min_words must be >= 1")
    if not terminal_punct:
        raise ValueError("terminal_punct must be non-empty")

    lines = F.split(F.col(text_col), r"\n")

    def line_ok(ln: Column) -> Column:
        t = F.trim(ln)
        nw = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, WS)))
        ok = (nw >= F.lit(int(min_words))) & F.substring(t, -1, 1).isin(
            list(terminal_punct)
        )
        low = F.lower(t)
        for bad in line_blacklist:
            ok = ok & ~low.contains(bad.lower())
        return ok

    doc_bad = F.lit(False)
    low_doc = F.lower(F.col(text_col))
    for bad in doc_blacklist:
        doc_bad = doc_bad | low_doc.contains(bad.lower())

    kept = F.filter(lines, line_ok)
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn(out_col, F.array_join(kept, "\n"))
        .withColumn(
            "keep_doc", (~doc_bad) & (F.col("n_kept_lines") > F.lit(0))
        )
    )


def gopher_quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    required_words: tuple[str, ...] = (
        "the", "be", "to", "of", "and", "that", "have", "with",
    ),
    min_required_hits: int = 2,
    max_dup_word_frac: float = 0.5,
    max_top_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """The composed Gopher/MassiveText document gate (Rae et al. 2021
    §A1.1), word-level: word-count bounds, mean word length in
    [min, max], hash/ellipsis symbol-to-word ratio, fraction of words
    with an alphabetic character, ≥ ``min_required_hits`` distinct
    "stop words" present, plus the :func:`repetition_stats` thresholds
    (duplicate-word / top-word / top-bigram shares — the word-level
    adaptation of Gopher's duplicate-line and top-n-gram rules).

    Plan: the word stats are map-only array HOFs (one integer sum or
    count each, single IEEE division — engine-exact); the repetition
    shares reuse :func:`repetition_stats` (two doc-keyed shuffle stages)
    and join back co-partitioned on the id.  Documents with zero words
    fail the gate (``n_words`` bound) with NULL ratio columns.

    Output: ``id_col`` + the nine stats + boolean ``pass_gopher``.
    """
    check_col([id_col, text_col], df)

    words = tokens_ws(F.col(text_col))
    n_words = F.size(words)
    # integer character sum -> one division (bit-reproducible anywhere)
    char_sum = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_symbols = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\."), F.lit(0))
    )
    req = F.array(*[F.lit(w) for w in required_words])
    n_required = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)), req
        )
    )

    stats = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.when(n_words > 0, char_sum.cast("double") / n_words.cast("double"))
        .alias("mean_word_len"),
        F.when(n_words > 0, n_alpha.cast("double") / n_words.cast("double"))
        .alias("alpha_word_frac"),
        F.when(
            n_words > 0, n_symbols.cast("double") / n_words.cast("double")
        ).alias("symbol_word_ratio"),
        n_required.alias("n_required_hits"),
    )

    rep = repetition_stats(df, id_col, text_col).select(
        id_col, "dup_word_frac", "top_word_frac", "top_bigram_frac"
    )
    j = stats.join(rep, id_col, "left")

    passes = (
        (F.col("n_words") >= F.lit(int(min_words)))
        & (F.col("n_words") <= F.lit(int(max_words)))
        & (F.col("mean_word_len") >= F.lit(float(min_mean_word_len)))
        & (F.col("mean_word_len") <= F.lit(float(max_mean_word_len)))
        & (F.col("symbol_word_ratio") <= F.lit(float(max_symbol_word_ratio)))
        & (F.col("alpha_word_frac") >= F.lit(float(min_alpha_word_frac)))
        & (F.col("n_required_hits") >= F.lit(int(min_required_hits)))
        & (F.col("dup_word_frac") <= F.lit(float(max_dup_word_frac)))
        & (F.col("top_word_frac") <= F.lit(float(max_top_word_frac)))
        & (
            F.col("top_bigram_frac").isNull()
            | (F.col("top_bigram_frac") <= F.lit(float(max_top_bigram_frac)))
        )
    )
    return j.withColumn("pass_gopher", F.coalesce(passes, F.lit(False)))
