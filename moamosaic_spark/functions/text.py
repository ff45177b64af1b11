"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All operators are pure JVM-side column expressions (whole-stage
codegen'd — no Python in the hot path) and each has an exact ANSI-SQL
twin used as the DuckDB oracle (see driver_contract.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .portable import hash32

# tiny per-language stopword inventories for the n-gram/stopword
# heuristic language id (the classic fasttext-free fallback)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def stopword_count(col: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words)))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token count, mean token
    length, stopword ratio, alpha ratio — the standard cheap quality
    filters of web-scale corpus cleaning."""
    t = F.col(text_col)
    tok = tokens(t)
    n_tok = F.size(tok)
    return docs.select(
        "*",
        F.length(t).alias("n_chars_q"),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, F.length(F.concat_ws("", tok)) / n_tok)
        .otherwise(F.lit(0.0))
        .alias("mean_token_len"),
        F.when(n_tok > 0, stopword_count(t) / n_tok).otherwise(F.lit(0.0)).alias(
            "stopword_ratio"
        ),
        F.when(
            F.length(t) > 0,
            F.length(F.regexp_replace(t, r"[^a-zA-Z]", "")) / F.length(t),
        )
        .otherwise(F.lit(0.0))
        .alias("alpha_ratio"),
    )


def lang_scores(col: Column) -> list[Column]:
    """Stopword-vote score per language."""
    return [
        (F.size(F.filter(tokens(col), lambda t: t.isin(*words))).cast("int")).alias(
            f"score_{lang}"
        )
        for lang, words in STOPWORDS.items()
    ]


def predict_lang(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID by stopword vote: the language with the highest
    stopword count wins; ties broken by fixed language order; zero
    votes -> 'und' (undetermined)."""
    scored = docs.select("*", *lang_scores(F.col(text_col)))
    langs = list(STOPWORDS.keys())
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.withColumn("pred_lang", pred)


def fingerprint(col: Column) -> Column:
    """Exact-dedup fingerprint: md5 of the normalized text (lowercase,
    collapsed whitespace)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


# GPT-2-style pretokenizer, restricted to constructs RE2 (DuckDB) and
# Java regex (Spark) evaluate identically: contractions, optional-space
# letter runs, digit runs, punctuation runs, whitespace runs. (The
# original's lookahead `\s+(?!\S)` is dropped — RE2 has no lookahead.)
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-ish pretokens (the standard LLM token-count proxy when no
    tokenizer model ships with the engine)."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(bpe_ish_tokens(col))


def char_ngrams(col: Column, k: int) -> Column:
    """All k-char substrings (the rolling window); shorter docs yield
    the whole text as one gram."""
    n = F.length(col)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1), lambda i: F.substring(col, i, k)
    )
    return F.when(n >= k, grams).otherwise(F.array(col))


def rolling_min_fingerprint(col: Column, k: int = 16) -> Column:
    """Rolling-hash document fingerprint: min of the portable 32-bit
    hash over all k-char grams (winnowing with window = whole doc).
    Robust to local edits — two documents sharing their minimizing gram
    collide; pure column algebra, DuckDB-replayable."""
    return F.array_min(F.transform(char_ngrams(col, k), hash32))


def word_shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles as an array of 'w1 w2 w3' strings — the unit of
    n-gram Jaccard / MinHash dedup. Documents shorter than k words get
    their whole text as a single shingle."""
    tok = tokens(col)
    n = F.size(tok)
    joined = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(tok, i + 1, k)),
    )
    return F.when(n >= k, joined).otherwise(F.array(F.concat_ws(" ", tok)))
