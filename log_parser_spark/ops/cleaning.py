"""Corpus cleaning: the composed training-data filter pipeline
(quality score x language-ID x exact dedup) producing a per-document
keep/drop verdict with the FIRST failing reason — the standard shape of
an LLM pre-training data cleaning pass.

Every stage is pure-codegen or a hash groupBy, so the whole pipeline is
SQL-expressible and oracle-checked end-to-end; at 100 TB the only
shuffle is the dedup groupBy on the content hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_parser_spark.ops import text

MIN_TOKENS = 5
MIN_QUALITY = 0.75


def corpus_cleaning_flags(docs: DataFrame, key: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Per-document verdict: (key, kept, reason).

    reason precedence (first failing filter wins):
      duplicate    — not the minimal-key representative of its content
      too_short    — fewer than MIN_TOKENS whitespace tokens
      low_quality  — composite quality score below MIN_QUALITY
      unknown_lang — stopword language-ID returned 'und'
      kept         — passed everything (kept = true)
    """
    q = text.quality_columns(docs.select(key, text_col), text_col)
    lang = text.stopword_lang_id(docs.select(key, text_col), text_col) \
        .select(key, "pred_lang")

    reps = (docs.select(F.md5(F.col(text_col)).alias("_ch"), F.col(key))
            .groupBy("_ch").agg(F.min(key).alias("_rep")))
    with_rep = (docs.select(key, F.md5(F.col(text_col)).alias("_ch"))
                .join(reps, "_ch")
                .select(key, (F.col(key) == F.col("_rep"))
                        .alias("is_representative")))

    j = (q.select(key, "n_tokens", "quality_score")
         .join(lang, key).join(with_rep, key))
    reason = (F.when(~F.col("is_representative"), "duplicate")
              .when(F.col("n_tokens") < MIN_TOKENS, "too_short")
              .when(F.col("quality_score") < MIN_QUALITY, "low_quality")
              .when(F.col("pred_lang") == "und", "unknown_lang")
              .otherwise("kept"))
    return j.select(key, reason.alias("reason")).withColumn(
        "kept", F.col("reason") == "kept")
