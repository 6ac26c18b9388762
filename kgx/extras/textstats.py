"""Text analysis for corpus curation — all JVM built-ins (no Python in the
hot path): language id (stopword-hit heuristic), quality scoring, token
counting, and document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# minimal stopword lists for the languages in the documents table
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "pour", "que", "dans", "avec"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "人"],
}

_TOKEN_SPLIT = r"\s+"
# BPE-ish subword pieces: runs of letters, runs of digits, or single
# punctuation — a cheap stand-in for a real tokenizer's piece count
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(col):
    return F.split(F.trim(col), _TOKEN_SPLIT)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish piece count per document."""
    return df.withColumn(
        "n_ws_tokens", F.size(_tokens(F.col(text_col))).cast("long")
    ).withColumn(
        "n_bpe_pieces",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_ISH), 0)).cast("long"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``lang_pred`` = argmax over per-language stopword hit rates.

    Pure column algebra: tokens ∩ stopword-literal-array per language,
    greatest() + chained when() for the argmax — whole-stage codegen,
    no UDF, no shuffle.
    """
    toks = F.transform(_tokens(F.lower(F.col(text_col))), lambda t: F.regexp_replace(t, r"[^\p{L}]", ""))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in _STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    for lang in reversed(list(_STOPWORDS)):  # earlier langs win ties
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.withColumn("lang_pred", pred)


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach curation features: length, alpha ratio, punct ratio, mean
    word length, uppercase ratio, and a composite [0,1] quality score."""
    txt = F.col(text_col)
    n = F.length(txt).cast("double")
    n_alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", "")).cast("double")
    n_punct = F.length(F.regexp_replace(txt, r"[^.,;:!?'\"()\[\]{}]", "")).cast("double")
    n_upper = F.length(F.regexp_replace(txt, r"[^A-Z]", "")).cast("double")
    n_tok = F.size(_tokens(txt)).cast("double")
    safe = F.when(n > 0, n).otherwise(F.lit(1.0))
    alpha_ratio = n_alpha / safe
    punct_ratio = n_punct / safe
    upper_ratio = n_upper / safe
    mean_word_len = F.when(n_tok > 0, n / n_tok).otherwise(F.lit(0.0))
    score = (
        F.least(n / F.lit(2000.0), F.lit(1.0)) * 0.25
        + alpha_ratio * 0.45
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.15
        + (1.0 - F.least(upper_ratio * 5.0, F.lit(1.0))) * 0.15
    )
    return (
        df.withColumn("len_chars", n.cast("long"))
        .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("mean_word_len", F.round(mean_word_len, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach two document fingerprints: ``fp_sha`` (exact content identity,
    sha256 of whitespace-normalized lowercase text) and ``fp_sim`` (xxhash64
    of the sorted distinct token set — order-insensitive, survives
    shuffling/reformatting)."""
    normed = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    tokset = F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens(F.lower(F.col(text_col))))))
    return df.withColumn("fp_sha", F.sha2(normed, 256)).withColumn(
        "fp_sim", F.xxhash64(tokset)
    )
