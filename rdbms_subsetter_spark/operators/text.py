"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Everything here is a pure column expression (no UDFs): `split`,
`regexp_*`, `md5`, `aggregate` — all JVM-side, whole-stage-codegen
friendly, and expressible in ANSI SQL for the DuckDB oracle.  At
100 TB these are embarrassingly parallel single-pass scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Small stopword lists for the n-gram/stopword language heuristic.
# Deliberately tiny and hard-coded: the operator is the scoring
# machinery, not a real langid model.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "de", "et", "un", "est", "que"],
    "zh": ["的", "是", "不", "了", "在", "人"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the GPT-2-style regex split that precedes merge rules, restricted to
# constructs RE2 (DuckDB) and java.util.regex (Spark) treat identically.
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(text: Column) -> Column:
    """array<string> of BPE-style pre-tokens (codegen regex, no UDF)."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def word_match_count(text: Column, words: list[str]) -> Column:
    """How many tokens of *text* are in *words* — via a padded
    LIKE-free containment trick that stays in codegen:
    count matches of ``(^| )word( |$)`` style regex, summed.
    Implemented as size(filter(tokens, t -> t IN words))."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(arr, t)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return word_match_count(text, STOPWORDS[lang]) / token_count(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    stripped = F.regexp_replace(text, r"[!-/:-@\[-`{-~]", "")
    return (F.length(text) - F.length(stripped)) / F.length(text)


def mean_token_len(text: Column) -> Column:
    return (F.length(F.regexp_replace(text, r"\s+", ""))) / token_count(text)


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality heuristic: favors mid-length docs,
    low punctuation, presence of common function words — the standard
    pretraining-corpus filter shape (length/punct/stopword ratios)."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(text, "en") * 5.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4.0)
    return F.round((len_score + stop_score + punct_pen) / 3.0, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio (the langid feature vector)."""
    return {
        lang: F.round(word_match_count(text, words) / token_count(text), 6)
        for lang, words in STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over ``lang_scores`` with alphabetical tiebreak — a pure
    greatest/when cascade, no UDF."""
    scores = lang_scores(text)
    langs = sorted(scores)  # alphabetical; ties go to the first
    best = langs[0]
    expr = F.lit(best)
    best_score = scores[best]
    for lang in langs[1:]:
        expr = F.when(scores[lang] > best_score, F.lit(lang)).otherwise(expr)
        best_score = F.greatest(best_score, scores[lang])
    return expr


def normalize(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip punctuation,
    collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[!-/:-@\[-`{-~]", " ")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (the reference point for exact-dedup keys)."""
    return F.md5(normalize(text))


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document stats frame used by the graded queries."""
    t = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars_measured"),
        F.round(mean_token_len(t), 6).alias("mean_token_len"),
        F.round(stopword_ratio(t, "en"), 6).alias("en_stopword_ratio"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )


def chunk_windows(
    docs: DataFrame, chunk_tokens: int = 50, stride: int = 40
) -> DataFrame:
    """Split each document into overlapping token windows — the
    training-corpus chunking step (context-window sized pieces with
    stride overlap so no boundary context is lost).

    Pure codegen: tokenize once, generate start offsets with
    ``sequence``, slice per offset, explode.  Work ∝ output tokens;
    no shuffle at all — chunking pipelines inside the scan stage.

    The token array is STAGED through a projection before the lambda:
    higher-order functions are not common-subexpression-eliminated, so
    ``slice(tokens(text), ...)`` inside the transform would re-split
    the whole text once per chunk — O(doc_len²/stride) per doc.
    """
    staged = docs.select("doc_id", tokens(F.col("text")).alias("__t"))
    toks = F.col("__t")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            F.slice(toks, s + 1, chunk_tokens).alias("ctoks"),
        ),
    )
    return (
        staged.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.size("c.ctoks").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.col("c.ctoks")).alias("chunk_text"),
        )
    )


def pack_sequences(docs: DataFrame, capacity: int = 512) -> DataFrame:
    """Sequence packing: assign documents (in deterministic doc_id
    order) to context-window bins of ~`capacity` tokens by cumulative
    token count — bin = floor(cumsum_before / capacity).

    The packing approximation every streaming packer uses (a bin can
    overflow by at most one document, never underfill by more): a
    global running sum, NOT a global single-task window.  Implemented
    as the distributed two-pass prefix sum — (1) range-partition by
    doc_id and cumsum within each partition, (2) per-partition totals
    (a handful of rows) collected, prefix-offset, and broadcast back.
    Scales to any row count; a plain ``Window.orderBy`` would funnel
    the whole table through one task.
    """
    from pyspark.sql import Window

    n_tok = token_count(F.col("text"))
    parts = docs.select("doc_id", n_tok.alias("n_tok")).repartitionByRange(
        "doc_id"
    ).withColumn("__pid", F.spark_partition_id())
    w = (
        Window.partitionBy("__pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.withColumn("__cum_local", F.sum("n_tok").over(w))
    totals = sorted(
        local.groupBy("__pid").agg(F.max("__cum_local").alias("t")).collect(),
        key=lambda r: r["__pid"],
    )
    rows, acc = [], 0
    for r in totals:  # range partitions are key-ordered → prefix is exact
        rows.append((r["__pid"], acc))
        acc += r["t"]
    off_df = docs.sparkSession.createDataFrame(
        rows or [(0, 0)], "__pid int, __off long"
    )
    cum_before = F.col("__cum_local") + F.col("__off") - F.col("n_tok")
    return local.join(F.broadcast(off_df), on="__pid", how="left").select(
        "doc_id",
        "n_tok",
        F.floor(cum_before / capacity).cast("int").alias("bin_id"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (training-data compliance pass)
# ---------------------------------------------------------------------------

#: Deliberately lookaround-free patterns: they must behave identically
#: under Java regex (Spark, JVM-side regexp_replace/regexp_count) and
#: RE2 (DuckDB oracle), and RE2 has no lookbehind at all.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[- ]\d{3}[- ]?\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (JVM-side ``regexp_count``)."""
    return {k: F.regexp_count(text, F.lit(p)) for k, p in PII_PATTERNS.items()}


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / phone numbers / IPv4s from ``text_col``: each kind
    is replaced with its ``[KIND]`` placeholder, with per-kind match
    counts kept as audit columns (the compliance report a redaction run
    must produce).

    One projection, all JVM regex — no UDFs, no extra scan: counts are
    computed on the original text, replacements chain left to right in
    ``PII_PATTERNS`` order (email first, so phone/IP fragments inside an
    address are not double-counted).  At 100 TB this is a map-only pass:
    no shuffle, safe behind any scan.
    """
    t = F.col(text_col)
    counts = pii_counts(t)
    redacted = t
    for kind, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, f"[{kind.upper()}]")
    return docs.withColumns(
        {
            **{f"n_{k}": c for k, c in counts.items()},
            f"{text_col}_redacted": redacted,
        }
    )
