"""Text analysis for training-data pipelines: tokenization, quality scoring,
language identification, token counting, fingerprinting.

Everything is built-in-function based (regexp/array ops — JVM-side), and every
regex sticks to RE2-safe constructs so the same pattern runs in the DuckDB
oracle. At 100 TB these are embarrassingly parallel map stages: no shuffle,
full codegen, column-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word/number/punct splitter (RE2-safe, same string works in DuckDB)
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# tiny per-language stopword lists for the n-gram/stopword langid heuristic
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"),
    "es": ("el", "la", "los", "de", "que", "es", "una", "por", "con", "para"),
}


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace/punct tokens as an array column."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.filter(F.split(t, "[ \\t\\n]+"), lambda x: x != ""))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Count of TOKEN_REGEX matches — a crude proxy for BPE token counts."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(t, F.lit(TOKEN_REGEX))


def quality_metrics(df: DataFrame, text: str = "text") -> DataFrame:
    """Append standard quality-scoring columns:

    n_chars_m, n_tokens, avg_token_len, punct_ratio, digit_ratio,
    stopword_ratio (English), uniq_token_ratio, quality_score in [0,1].
    """
    t = F.col(text)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    stop = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS["en"]])))
    uniq = F.size(F.array_distinct(toks))
    punct = n_chars - F.length(F.regexp_replace(t, "[^A-Za-z0-9 ]", ""))
    digits = n_chars - F.length(F.regexp_replace(t, "[0-9]", ""))
    out = df.withColumns(
        {
            "n_chars_m": n_chars.cast("long"),
            "n_tokens": n_tok.cast("long"),
            "avg_token_len": F.when(
                n_tok > 0,
                (n_chars - (n_tok - 1)) / n_tok,  # chars net of single spaces
            ).otherwise(F.lit(0.0)),
            "punct_ratio": F.when(n_chars > 0, punct / n_chars).otherwise(0.0),
            "digit_ratio": F.when(n_chars > 0, digits / n_chars).otherwise(0.0),
            "stopword_hits": stop.cast("long"),
            "uniq_token_ratio": F.when(n_tok > 0, uniq / n_tok).otherwise(0.0),
        }
    )
    # simple composite score: length in range, low punct, some diversity.
    # Weights are binary-exact (0.5/0.25/0.25) so the sum is bit-identical
    # across engines — 0.4+0.3+0.3 drifts to 1.0000000000000002 in doubles.
    score = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100_000), 0.5).otherwise(0.0)
        + F.when(F.col("punct_ratio") < 0.2, 0.25).otherwise(0.0)
        + F.when(F.col("uniq_token_ratio") > 0.1, 0.25).otherwise(0.0)
    )
    return out.withColumn("quality_score", score)


def langid(df: DataFrame, text: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-overlap language guess with deterministic tie-break
    (language order as in STOPWORDS; 'und' = undetermined when no hits)."""
    toks = F.array_distinct(tokens(F.col(text)))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in words])))
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in STOPWORDS:  # fixed priority on ties
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return df.withColumn(out_col, pred)


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(F.trim(F.regexp_replace(F.lower(t), "[ \\t\\n]+", " ")))
