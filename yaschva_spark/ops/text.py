"""Text analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. Pure Catalyst expressions end to end —
each operator is a projection (no shuffle), so they compose with scans at
full codegen speed and their semantics reproduce exactly in ANSI SQL
(DuckDB oracles in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small deterministic stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"],
    "es": ["el", "la", "y", "de", "un", "una", "es", "que", "por", "para"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
}
LANG_ORDER = ["en", "fr", "es", "de"]  # deterministic tie-break order

FINGERPRINT_MOD = 1_000_000_007


def _words(text_col):
    return F.split(text_col, " ")


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_words_regex): whitespace tokens plus a BPE-ish regex
    token count (letter runs / digit runs / single other chars)."""
    words = _words(F.col(text_col))
    regex_tokens = F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(words).alias("n_tokens"),
        regex_tokens.cast("long").alias("n_words_regex"),
    )


def quality_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality metrics: length, token count, mean word length,
    alpha ratio, stopword(en) ratio, and a composite quality score in [0,1].

    The score is a deterministic blend a training-data filter would use:
    penalize very short/very long docs, reward alpha-heavy text with a sane
    stopword rate."""
    text = F.col(text_col)
    words = _words(text)
    n_tokens = F.size(words)
    n_chars = F.length(text)
    mean_word_len = (n_chars - (n_tokens - 1)) / n_tokens  # chars minus separators
    alpha_ratio = F.regexp_count(text, F.lit("[A-Za-z]")) / F.greatest(n_chars, F.lit(1))
    en_list = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(words, lambda w: F.array_contains(en_list, w)))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    len_score = F.when(n_tokens < 5, n_tokens / 5.0).when(
        n_tokens > 1000, F.lit(0.5)
    ).otherwise(F.lit(1.0))
    score = F.round(
        len_score * (0.6 * alpha_ratio + 0.4 * F.least(stop_ratio * 5, F.lit(1.0))), 6
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-hit language-ID heuristic: count hits per language list,
    argmax with deterministic tie-break (LANG_ORDER, 'und' when zero hits)."""
    words = _words(F.col(text_col))

    def _contains(lst):
        # single-arg lambda: F.filter treats a 2-arg lambda as (elem, index)
        return lambda w: F.array_contains(lst, w)

    hit_cols = []
    for lang in LANG_ORDER:
        lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hit_cols.append(F.size(F.filter(words, _contains(lst))).alias(f"hits_{lang}"))
    scored = df.select(F.col(id_col).alias("id"), *hit_cols)
    # argmax: compute the max, then the first language (LANG_ORDER) reaching it
    max_hits = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_ORDER])
    pred = F.lit("und")
    for lang in reversed(LANG_ORDER):
        pred = F.when(
            (F.col(f"hits_{lang}") == max_hits) & (max_hits > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "id", *[f"hits_{lang}" for lang in LANG_ORDER], pred.alias("pred_lang")
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Position-weighted rolling document fingerprint:
    sum_i (i+1) * length(word_i) mod 1e9+7 — order-sensitive (re-ordered
    words change it), cheap, and exactly reproducible in SQL (unnest WITH
    ORDINALITY). Computed here with an indexed transform + aggregate: no
    explode, no shuffle."""
    words = _words(F.col(text_col))
    weighted = F.transform(words, lambda w, i: (i + 1).cast("long") * F.length(w))
    fp = F.aggregate(
        weighted, F.lit(0).cast("long"), lambda acc, v: (acc + v) % FINGERPRINT_MOD
    )
    return df.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))
