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


# C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning...", §2.2 — the public C4 heuristics), line-level
# filter + document-level flags, all pure codegen.  Whitespace is the
# explicit ASCII class shared with the DuckDB mirror (text.WS_CLASS),
# never \s: Java's \s includes \x0B, RE2's does not.
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
_C4_TERMINAL = r'[.!?"”]' + text.WS_CLASS + "*$"


def c4_clean_columns(docs: DataFrame, key: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """C4's line filter + page flags in one projection:

    - keep only lines ending in terminal punctuation, with >=
      C4_MIN_LINE_WORDS words, not containing 'javascript'
    - cleaned_text = surviving lines re-joined
    - c4_keep: >= C4_MIN_SENTENCES sentences survive (approximated as
      terminal-punct count, as public reproductions do) AND the page
      has no 'lorem ipsum' and no '{'

    One lines materialization; the whole pass is a map-only projection
    (zero shuffles at 100 TB)."""
    t = F.col(text_col)
    staged = docs.withColumn(
        "_lines", F.filter(F.split(t, r"\n"),
                           lambda ln: ln.rlike(text.NON_WS_CLASS)))

    def line_ok(ln):
        # whitespace-robust: terminal punct modulo trailing whitespace,
        # word count as non-empty split pieces (Spark trim strips only
        # spaces, so trim-based variants miss tabs)
        return (ln.rlike(_C4_TERMINAL)
                & (F.size(F.filter(F.split(ln, text.WS_RUN),
                                   lambda w: w != ""))
                   >= C4_MIN_LINE_WORDS)
                & ~F.lower(ln).contains("javascript"))

    staged = staged.withColumn("_kept", F.filter("_lines", line_ok))
    # cleaned_text staged first so n_sentences reads the materialized
    # column instead of re-joining the array (same CSE rule as tokens)
    out = staged.withColumns({
        "n_lines_total": F.size("_lines").cast("long"),
        "n_lines_kept": F.size("_kept").cast("long"),
        "cleaned_text": F.array_join("_kept", "\n"),
        "has_lorem_ipsum": F.lower(t).contains("lorem ipsum"),
        "has_curly_brace": t.contains("{"),
    }).withColumn(
        "n_sentences",
        F.regexp_count("cleaned_text", F.lit(r"[.!?]")).cast("long")
    ).drop("_lines", "_kept")
    keep = ((F.col("n_sentences") >= C4_MIN_SENTENCES)
            & ~F.col("has_lorem_ipsum") & ~F.col("has_curly_brace"))
    return out.withColumn("c4_keep", keep)
