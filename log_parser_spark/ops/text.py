"""Text-analysis operators for large-scale training-data pipelines:
tokenization stats, quality scoring, stopword-based language ID, and
document fingerprinting.  All hot paths are built-in column expressions
(JVM/codegen); only the rolling-hash fingerprint needs a pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu",
           "den"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
}


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokens; empty text -> empty array."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(F.trim(c), r"\s+"))


def token_count_col(text: str | Column = "text") -> Column:
    return F.size(tokens_col(text))


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / uppercase ratios + a composite
    quality score, all as codegen-friendly expressions."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    punct = F.length(F.regexp_replace(t, r"[^.!?,;:]", "")).cast("double")
    digits = F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", "")).cast("double")
    nz = F.when(n > 0, n).otherwise(F.lit(1.0))
    return df.withColumns({
        "n_bytes": F.octet_length(t).cast("long"),
        "n_tokens": token_count_col(text_col).cast("long"),
        "punct_ratio": F.round(punct / nz, 6),
        "digit_ratio": F.round(digits / nz, 6),
        "upper_ratio": F.round(upper / nz, 6),
    }).withColumn(
        "quality_score",
        F.round(
            F.lit(1.0)
            - F.least(F.lit(1.0), F.col("punct_ratio") * 4)
            * F.lit(0.25)
            - F.least(F.lit(1.0), F.col("digit_ratio") * 4) * F.lit(0.25)
            - F.when(F.col("n_tokens") < 5, 0.5).otherwise(0.0), 6))


def stopword_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword hit counts (ties ->
    'und' when no stopwords hit at all)."""
    toks = F.transform(tokens_col(text_col), lambda x: F.lower(x))
    out = df.withColumn("_toks", toks)
    hits = {}
    for lang, words in STOPWORDS.items():
        hits[lang] = F.size(F.filter(
            F.col("_toks"), lambda x: x.isin(*words)))
        out = out.withColumn(f"hits_{lang}", hits[lang].cast("long"))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in STOPWORDS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in STOPWORDS:  # fixed order => deterministic tie-break
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return out.withColumn("pred_lang", pred).drop("_toks")


_FP_MOD = (1 << 61) - 1
_FP_BASE = 257


@pandas_udf(LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Deterministic polynomial rolling hash over the raw bytes
    (document fingerprint; vectorized over the Arrow batch)."""
    out = []
    for t in texts:
        h = 0
        for b in (t or "").encode("utf-8", "surrogatepass"):
            h = (h * _FP_BASE + b) % _FP_MOD
        out.append(h)
    return pd.Series(out, dtype="int64")


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint_udf(F.col(text_col)))
