"""Text-analysis operators for large-scale training-data pipelines:
language-ID (stopword-marker heuristic), quality scoring, token counting,
document fingerprinting.

All four are pure built-in-function column expressions - they run entirely
JVM-side inside whole-stage codegen (no Python UDFs), so they scale with
the scan. Each has an exact ANSI-SQL twin in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker-word lists per language; ordered dict -> deterministic
# alphabetical-language tie-break (greatest(..) picks first max via the
# explicit CASE cascade below).
LANG_MARKERS = {
    "de": ("der", "und", "die", "nicht"),
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "que", "los"),
    "fr": ("le", "les", "et", "des"),
}


def _occurrences(col, word):
    """Count of standalone `word` tokens: size(split(' '||text||' ',
    ' word ')) - 1 counts non-overlapping separators; matches the SQL twin
    len(string_split(...)) - 1. Overlapping separators (word word) are
    counted once by both engines - the same convention on both sides."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    return F.size(F.split(padded, F.lit(" " + word + " "))) - 1


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.lower(F.col(text_col))
    out = df
    for lang, words in LANG_MARKERS.items():
        score = None
        for w in words:
            occ = _occurrences(c, w)
            score = occ if score is None else score + occ
        out = out.withColumn("score_" + lang, score)
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, predicted_lang: argmax of marker scores, 'und' when all 0,
    ties broken by language code order (de < en < es < fr)."""
    scored = lang_scores(df, text_col)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col("score_" + lang) for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col("score_" + lang) == best, F.lit(lang))
    return scored.withColumn("predicted_lang", pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    heuristics, combined into a 0..1 score (all integer/decimal arithmetic
    so the SQL twin hashes identically)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(F.split(t, F.lit(" ")))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    n_stop = None
    for w in ("the", "and", "of", "is", "a", "to"):
        occ = _occurrences(F.lower(t), w)
        n_stop = occ if n_stop is None else n_stop + occ
    return (df
            .withColumn("n_chars", n_chars.cast("long"))
            .withColumn("n_tokens", n_tokens.cast("long"))
            .withColumn("n_punct", n_punct.cast("long"))
            .withColumn("n_stopwords", n_stop.cast("long"))
            .withColumn(
                "quality",
                F.round(
                    F.when(F.col("n_tokens") <= 0, F.lit(0.0)).otherwise(
                        F.least(F.lit(1.0), F.col("n_stopwords") * 6.0
                                / F.col("n_tokens"))
                        * (1.0 - F.least(F.lit(1.0), F.col("n_punct") * 4.0
                                         / F.col("n_chars")))),
                    6)))


# BPE-ish pre-tokenization classes (letter runs / digit runs / single
# non-alnum marks) - the portable core of GPT-2-style pre-tokenizers,
# written to behave identically under Java regex (Spark) and RE2 (DuckDB)
BPEISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + two BPE-ish estimates: ceil(chars/4) (the
    common 4-chars-per-token heuristic) and a regex pre-tokenizer count
    (letter runs / digit runs / punctuation marks, GPT-2-style word
    splitting without the merge table)."""
    t = F.col(text_col)
    return (df
            .withColumn("ws_tokens",
                        F.size(F.split(F.trim(t), r"\s+")).cast("long"))
            .withColumn("subword_tokens",
                        F.ceil(F.length(t) / 4.0).cast("long"))
            .withColumn("bpeish_tokens",
                        F.regexp_count(t, F.lit(BPEISH_PATTERN))
                        .cast("long")))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization fingerprint: md5 of lowercased alnum+space text with
    collapsed whitespace - the exact-dedup key."""
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", ""),
        r" +", " "))
    return df.withColumn("fingerprint", F.md5(norm))
