"""Text-analysis operators for training-data pipelines (SURVEY.md §2.12).

All hot-path expressions are built-in pyspark.sql.functions (JVM,
whole-stage codegen) — no Python UDFs. Designed to run as a single
narrow-map stage over a 100 TB documents table: no shuffle, no state,
perfectly partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lexicons for the n-gram/stopword language-ID
# heuristic. Deliberately small and deterministic (the point is the operator
# shape, not linguistic accuracy).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "und", "die", "das", "ist"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
}

_WS = r"\s+"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), _WS)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: Column | str, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in ``words`` (JVM higher-order filter)."""
    return F.size(F.filter(tokens(text), lambda x: x.isin(*words)))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc stats: token count, char length, mean token length."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length(t).alias("n_chars_actual"),
        F.round(
            (F.length(F.regexp_replace(t, _WS, "")) * F.lit(1.0)) / n_tok, 6
        ).alias("mean_token_len"),
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, alpha ratio, stopword ratio, and a
    composite score. Mirrors classic pretraining-quality filters (C4-style
    length/punct/stopword gates)."""
    t = F.col(text_col)
    n_char = F.length(t)
    alpha = F.length(F.regexp_replace(t, "[^a-z]", ""))
    toks = tokens(t)
    n_tok = F.size(toks)
    stop = F.size(F.filter(toks, lambda x: x.isin(*LANG_STOPWORDS["en"])))
    # Round only FINAL outputs, always from the raw ratios: rounding a
    # rounded value puts the input on a systematic .5 tie where engines'
    # rounding semantics diverge (cross-engine determinism, workload.py).
    alpha_ratio = alpha * F.lit(1.0) / n_char
    stop_ratio = stop * F.lit(1.0) / n_tok
    return df.select(
        "doc_id",
        n_char.alias("n_chars_actual"),
        n_tok.alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio * F.lit(0.5) + stop_ratio * F.lit(0.5), 6).alias("quality_score"),
    )


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-lexicon language ID: count hits per language, argmax with a
    deterministic tie-break (lexicon order en > de > es > fr)."""
    toks = tokens(F.col(text_col))

    def _hits(words: tuple[str, ...]) -> Column:
        # NOTE: pyspark higher-order lambdas must take exactly the arity of
        # the HOF — a default-arg closure param would be counted as a lambda
        # variable, so bind via an outer function instead.
        return F.size(F.filter(toks, lambda x: x.isin(*words)))

    hit_cols = {lang: _hits(words) for lang, words in LANG_STOPWORDS.items()}
    langs = list(LANG_STOPWORDS)
    # argmax with first-wins tie-break: lang L wins if its hits are strictly
    # greater than every earlier lang's and >= every later lang's.
    guess = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [hit_cols[l2] for l2 in langs[langs.index(lang) + 1 :]]
        cond = None
        for h in later:
            c = hit_cols[lang] >= h
            cond = c if cond is None else (cond & c)
        guess = F.when(cond, F.lit(lang)).otherwise(guess)
    out = df.select(
        "doc_id",
        *[hit_cols[lang].alias(f"hits_{lang}") for lang in langs],
        guess.alias("lang_guess"),
    )
    return out


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercased text.

    Stable content identity for dedup joins; md5 (not xxhash) so external
    systems (and the DuckDB oracle) can reproduce it."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), _WS, " ")
    return df.select("doc_id", F.md5(norm).alias("fingerprint"))
