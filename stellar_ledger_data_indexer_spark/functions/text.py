"""Text-analysis operators for the training-data pipeline, over a
``documents(doc_id, text, lang, source, n_chars)`` table.

Everything here is built from JVM-side ``pyspark.sql.functions`` (stays
inside whole-stage codegen — scan → project, zero shuffles, zero Python),
and each expression has an exact ANSI-SQL twin for the DuckDB oracle
(kept textually alongside in plans/queries.py). These are the
training-data analogs of the reference's derive-scalars family
(symbol extraction P6, enum normalization P5 — internal/db/
contract_data.go:32-68)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deliberately tiny, deterministic stopword sets (language-ID heuristic);
# chosen to be expressible identically in Spark and DuckDB SQL
STOPWORDS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "es": ["el", "los", "que"],
    "fr": ["le", "les", "et"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish pre-tokenization count proxy).
    SQL twin: length(string_split_regex(trim(text), '\\s+'))."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("int")


# GPT-2-style pre-tokenizer pattern, restricted to constructs both Java
# regex (Spark) and RE2 (DuckDB) evaluate identically: contraction
# suffixes, optionally-space-prefixed letter runs, digit runs, and
# punctuation runs. (The original GPT-2 pattern's trailing-space
# lookahead is omitted — RE2 has no lookahead; pure-whitespace spans
# are simply not counted as tokens.)
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|d|m|ll|ve|re)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+")


def token_count_bpe(text: Column) -> Column:
    """BPE pre-tokenizer token count (the unit a GPT-style tokenizer's
    merges operate within). SQL twin:
    length(regexp_extract_all(text, <same pattern>))."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN),
                                       F.lit(0))).cast("int")


def word_occurrences(text: Column, word: str) -> Column:
    """Occurrences of ``word`` as a whitespace-delimited token, by
    replace-length arithmetic — dialect-portable (no regex flavor
    dependency). SQL twin mirrors the same expression."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    # single left-to-right replace pass in both engines → identical
    # (adjacent repeats count once; acceptable for a scoring heuristic)
    squashed = F.regexp_replace(padded, r"\s+", " ")
    return ((F.length(squashed)
             - F.length(F.replace(squashed, F.lit(needle), F.lit(" "))))
            / F.lit(len(needle) - 1)).cast("int")


def alpha_ratio(text: Column) -> Column:
    """Share of [A-Za-z] characters — quality-score component.
    SQL twin: length(regexp_replace(text,'[^A-Za-z]','','g'))/length."""
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    return F.round(alpha / F.greatest(F.length(text), F.lit(1)), 4)


def space_ratio(text: Column) -> Column:
    sp = F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit("")))
    return F.round(sp / F.greatest(F.length(text), F.lit(1)), 4)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: alpha share + sane word length.
    Deterministic arithmetic only, so the oracle reproduces it exactly."""
    n_words = token_count(text)
    avg_word = F.length(F.trim(text)) / F.greatest(n_words, F.lit(1))
    word_ok = F.when((avg_word >= 3) & (avg_word <= 12), F.lit(1.0)) \
        .otherwise(F.lit(0.5))
    return F.round((alpha_ratio(text) * 0.6 + space_ratio(text) * 0.4)
                   * word_ok, 4)


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-occurrence score per candidate language."""
    return {lang: sum(word_occurrences(text, w) for w in ws)
            for lang, ws in STOPWORDS.items()}


LANG_ORDER = ["en", "de", "es", "fr"]  # tie-break preference, fixed


def lang_id(text: Column) -> Column:
    """Argmax language as a fixed-preference when-chain ('und' when every
    score is 0) — a stopword language-ID heuristic in pure SQL
    expressions, structured identically to its DuckDB oracle twin so the
    tie-break is equal by construction."""
    scores = lang_scores(text)
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        s = scores[lang]
        later = [scores[o] for o in LANG_ORDER[LANG_ORDER.index(lang) + 1:]]
        cond = (s > 0)
        for o in later:
            cond = cond & (s >= o)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def text_fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercased, whitespace-
    squashed text (the exact-dup key; ≙ key-hash row identity P2,
    internal/contract/utils.go:37-43)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (docs
            .withColumn("n_tokens", token_count(t))
            .withColumn("alpha_ratio", alpha_ratio(t))
            .withColumn("quality", quality_score(t))
            .withColumn("lang_pred", lang_id(t))
            .withColumn("fingerprint", text_fingerprint(t)))
