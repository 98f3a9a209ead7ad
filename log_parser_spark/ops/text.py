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

# The ASCII-whitespace contract, spelled as an EXPLICIT class: Java
# regex \s includes U+000B (vertical tab) but RE2's \s is [\t\n\f\r ]
# without it, so a bare \s in a pattern shared with the DuckDB oracle
# silently forks the engines on \x0B input.  Every whitespace-sensitive
# pattern on BOTH sides uses these classes (the SQL mirrors embed the
# same literal; test_unicode_whitespace_contract probes \x0B to pin it).
WS_CHARS = " \t\n\x0B\f\r"
WS_CLASS = r"[ \t\n\x0B\f\r]"        # one ASCII whitespace char
NON_WS_CLASS = r"[^ \t\n\x0B\f\r]"   # one non-whitespace char
WS_RUN = WS_CLASS + "+"              # token separator

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu",
           "den"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
}


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokens; empty / whitespace-only text -> empty array.

    Split then drop empty strings — NOT trim-then-split: Spark's trim
    strips only the space character, so a leading newline/tab would
    leave a phantom '' token (found by the Python differential in
    tests/test_property_curation.py; the DuckDB oracle had mirrored
    the same trim and couldn't see it).

    Separator contract: ASCII whitespace only, via the explicit
    WS_RUN class (NOT \\s — Java's \\s includes \\x0B, RE2's does not,
    so the bare escape forks Spark from the DuckDB oracle on vertical
    tab).  U+00A0/U+2003 and other Unicode spaces are TOKEN characters
    on both engines.  Python's re.\\s is Unicode-aware, so Python-side
    mirrors must use the same explicit class (pinned by
    test_unicode_whitespace_contract, which probes \\x0B)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, WS_RUN), lambda x: x != "")


def token_count_col(text: str | Column = "text") -> Column:
    return F.size(tokens_col(text))


# BPE-ish pre-tokenization (GPT-2 style piece boundaries, simplified to
# a regex both Spark's Java regex and DuckDB's RE2 accept): common
# contractions, letter runs, digit runs, punctuation runs — whitespace
# folds into the following piece and is never a token itself.  The
# whitespace exclusion is the explicit ASCII class (see WS_CLASS), not
# \s, for the same Java-vs-RE2 \x0B reason.
BPE_PIECE_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)"
                     r"| ?[A-Za-z]+| ?[0-9]+"
                     r"| ?[^ \t\n\x0B\f\rA-Za-z0-9]+")


def bpe_token_count_col(text: str | Column = "text") -> Column:
    """Approximate BPE token count as a pure-codegen regexp count (a
    cheap LLM-budget estimator: GPT-2-ish piece boundaries without the
    merges table)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_PIECE_PATTERN)).cast("long")


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / uppercase / stopword ratios + a
    composite quality score, all as codegen-friendly expressions.

    The whitespace tokenization is materialized ONCE into an
    intermediate `_toks` column and every token-derived feature
    (n_tokens, stopword hits) reads that attribute — Catalyst's
    CollapseProject keeps a non-cheap expression referenced more than
    once in its own projection, so the split() runs once per row
    instead of three times (the r2 doc_quality regression)."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    # class-char counts via regexp_count, not length(regexp_replace):
    # identical values (single-char class matches == surviving chars),
    # ~1.4x faster because no replaced string is materialized per row
    punct = F.regexp_count(t, F.lit(r"[.!?,;:]")).cast("double")
    digits = F.regexp_count(t, F.lit(r"[0-9]")).cast("double")
    upper = F.regexp_count(t, F.lit(r"[A-Z]")).cast("double")
    nz = F.when(n > 0, n).otherwise(F.lit(1.0))
    sw_all = sorted({w for ws in STOPWORDS.values() for w in ws})
    staged = df.withColumn(
        "_toks", F.transform(tokens_col(text_col), lambda x: F.lower(x)))
    sw_hits = F.size(F.filter(F.col("_toks"), lambda x: x.isin(*sw_all))) \
        .cast("double")
    n_tok = F.size("_toks")
    return staged.withColumns({
        "n_bytes": F.octet_length(t).cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_ratio": F.round(punct / nz, 6),
        "digit_ratio": F.round(digits / nz, 6),
        "upper_ratio": F.round(upper / nz, 6),
        "stopword_ratio": F.round(
            sw_hits / F.greatest(n_tok.cast("double"), F.lit(1.0)), 6),
    }).drop("_toks").withColumn(
        "quality_score",
        F.round(
            F.lit(1.0)
            - F.least(F.lit(1.0), F.col("punct_ratio") * 4)
            * F.lit(0.25)
            - F.least(F.lit(1.0), F.col("digit_ratio") * 4) * F.lit(0.25)
            - F.when(F.col("n_tokens") < 5, 0.5).otherwise(0.0), 6))


# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1) — the
# standard web-corpus document filter, as pure codegen expressions so a
# 100 TB pass stays JVM-side.  Thresholds are the published ones.
_GOPHER_REQ_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                         "with"]


def gopher_quality_columns(df: DataFrame,
                           text_col: str = "text") -> DataFrame:
    """Per-document Gopher rule metrics + pass flag:

    - n_words in [50, 100000]
    - mean_word_len in [3, 10]
    - symbol_word_ratio (# and ... per word) <= 0.1
    - bullet_line_ratio (lines starting with a bullet) <= 0.9
    - ellipsis_line_ratio (lines ending with ...) <= 0.3
    - alpha_word_ratio (words containing a letter) >= 0.8
    - n_req_stopwords (distinct hits from Gopher's 8-word list) >= 2

    Everything is array/regex codegen over ONE tokens and ONE lines
    materialization (CollapseProject keeps each split single-run, same
    staging trick as quality_columns)."""
    t = F.col(text_col)
    staged = df.withColumns({
        "_toks": tokens_col(text_col),
        # non-blank lines: rlike(non-ws), not trim-length (Spark trim
        # strips spaces only — a tab-only line is blank too)
        "_lines": F.filter(F.split(t, r"\n"),
                           lambda ln: ln.rlike(NON_WS_CLASS)),
    })
    n_words = F.size("_toks").cast("long")
    nz_words = F.greatest(n_words, F.lit(1)).cast("double")
    n_lines = F.size("_lines").cast("long")
    nz_lines = F.greatest(n_lines, F.lit(1)).cast("double")

    total_word_chars = F.aggregate(
        "_toks", F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w).cast("long"))
    mean_word_len = F.round(total_word_chars.cast("double") / nz_words, 6)

    n_symbols = (F.regexp_count(t, F.lit("#")) +
                 F.regexp_count(t, F.lit(r"\.\.\.|…"))).cast("double")
    symbol_ratio = F.round(n_symbols / nz_words, 6)

    bullet_lines = F.size(F.filter(
        "_lines", lambda ln: ln.rlike("^" + WS_CLASS + r"*[•\-\*]")))
    bullet_ratio = F.round(bullet_lines.cast("double") / nz_lines, 6)

    ellipsis_lines = F.size(F.filter(
        "_lines",
        lambda ln: ln.rlike(r"(\.\.\.|…)" + WS_CLASS + "*$")))
    ellipsis_ratio = F.round(ellipsis_lines.cast("double") / nz_lines, 6)

    alpha_words = F.size(F.filter(
        "_toks", lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = F.round(alpha_words.cast("double") / nz_words, 6)

    lowered = F.transform("_toks", lambda w: F.lower(w))
    n_req_sw = F.size(F.array_intersect(
        lowered, F.array(*[F.lit(w) for w in _GOPHER_REQ_STOPWORDS])
    )).cast("long")

    out = staged.withColumns({
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_word_ratio": symbol_ratio,
        "bullet_line_ratio": bullet_ratio,
        "ellipsis_line_ratio": ellipsis_ratio,
        "alpha_word_ratio": alpha_ratio,
        "n_req_stopwords": n_req_sw,
    }).drop("_toks", "_lines")
    gopher_pass = ((F.col("n_words") >= 50) &
                   (F.col("n_words") <= 100_000) &
                   (F.col("mean_word_len") >= 3) &
                   (F.col("mean_word_len") <= 10) &
                   (F.col("symbol_word_ratio") <= 0.1) &
                   (F.col("bullet_line_ratio") <= 0.9) &
                   (F.col("ellipsis_line_ratio") <= 0.3) &
                   (F.col("alpha_word_ratio") >= 0.8) &
                   (F.col("n_req_stopwords") >= 2))
    return out.withColumn("gopher_pass", gopher_pass)


def gopher_repetition_columns(df: DataFrame, key: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 §A1.1, repetition
    block) per document, all as array expressions over single
    materializations (no explode/groupBy — the whole pass is one
    codegen projection, no shuffle at 100 TB):

    - dup_line_ratio: fraction of (non-empty) lines that are
      duplicates of an earlier line            (Gopher drops > 0.30)
    - dup_line_char_ratio: fraction of characters in such duplicate
      lines                                    (Gopher drops > 0.20)
    - top_bigram_char_ratio: fraction of characters covered by the
      most frequent word 2-gram               (Gopher drops > 0.18)
    - repetition_pass: all three thresholds hold

    top_bigram_char_ratio picks the bigram by FREQUENCY (argmax count,
    ties broken by larger char coverage — the Rae et al. definition),
    then scores it with the standard count*ngram_chars approximation
    (as the public Gopher reproductions do): overlapping occurrences
    each contribute full char weight, so pathological single-token
    repeats can exceed 1.0 — exact char coverage would need positional
    de-overlap for no filtering benefit.
    """
    t = F.col(text_col)
    staged = df.withColumns({
        "_toks": tokens_col(text_col),
        "_lines": F.filter(F.split(t, r"\n"),
                           lambda ln: ln.rlike(NON_WS_CLASS)),
    })
    staged = staged.withColumn("_uniq_lines", F.array_distinct("_lines"))
    n_lines = F.size("_lines")
    nz_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    dup_lines = (n_lines - F.size("_uniq_lines")).cast("double")
    line_chars = F.aggregate(
        "_lines", F.lit(0).cast("long"),
        lambda acc, ln: acc + F.length(ln).cast("long"))
    uniq_line_chars = F.aggregate(
        "_uniq_lines", F.lit(0).cast("long"),
        lambda acc, ln: acc + F.length(ln).cast("long"))
    nz_line_chars = F.greatest(line_chars, F.lit(1)).cast("double")

    # most-frequent word-bigram coverage: sort the bigram array, then a
    # single linear fold finds the longest run of equal adjacent
    # elements — O(n log n) per doc and pure codegen (a per-distinct-
    # bigram count would be O(n^2) per doc: fatal on a 100k-word page).
    # Whale-document bound: the parser's MAX_DOC_BYTES cap (the Arrow
    # utf-8 cell ceiling) bounds n; at Gopher's own n_words ceiling
    # (100k words -> ~100k bigrams sorted in one task row) the whole
    # pass is sub-second per doc — measured, not asserted, by
    # tests/test_property_curation.py::test_repetition_whale_document
    from log_parser_spark.ops.dedup import shingles_from_tokens
    n_words = F.size("_toks")
    word_chars = F.aggregate(
        "_toks", F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w).cast("long"))
    staged = staged.withColumn(
        "_bg_sorted", F.array_sort(shingles_from_tokens("_toks", 2)))

    def scan_step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        # chars covered by this run's bigram: run * (len - 1 joiner).
        # A run reaches the bigram's full count at its last element, so
        # tracking (max run, coverage at that run) over the scan yields
        # the MOST FREQUENT bigram's coverage; the equal-run branch
        # breaks frequency ties toward larger coverage.
        cov = (run * (F.length(g) - 1)).cast("long")
        best_run = F.greatest(acc["best_run"], run)
        best_cov = (F.when(run > acc["best_run"], cov)
                    .when((run == acc["best_run"])
                          & (cov > acc["best_cov"]), cov)
                    .otherwise(acc["best_cov"]))
        return F.struct(
            g.alias("prev"), run.alias("run"),
            best_run.alias("best_run"), best_cov.alias("best_cov"))

    top_bigram_chars = F.aggregate(
        "_bg_sorted",
        F.struct(F.lit("").alias("prev"),
                 F.lit(0).cast("int").alias("run"),
                 F.lit(0).cast("int").alias("best_run"),
                 F.lit(0).cast("long").alias("best_cov")),
        scan_step, lambda acc: acc["best_cov"])
    nz_word_chars = F.greatest(word_chars, F.lit(1)).cast("double")

    out = staged.withColumns({
        "n_lines": n_lines.cast("long"),
        "dup_line_ratio": F.round(dup_lines / nz_lines, 6),
        "dup_line_char_ratio": F.round(
            (line_chars - uniq_line_chars).cast("double")
            / nz_line_chars, 6),
        "top_bigram_char_ratio": F.round(
            F.when(n_words >= 2,
                   top_bigram_chars.cast("double") / nz_word_chars)
            .otherwise(F.lit(0.0)), 6),
    }).drop("_toks", "_lines", "_uniq_lines", "_bg_sorted")
    rep_pass = ((F.col("dup_line_ratio") <= 0.30) &
                (F.col("dup_line_char_ratio") <= 0.20) &
                (F.col("top_bigram_char_ratio") <= 0.18))
    return out.withColumn("repetition_pass", rep_pass)


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


# PII patterns (the standard pre-training scrub set: emails, phone
# numbers, IPv4).  Kept to RE2-compatible syntax (no lookaround, no
# backreferences) so the Spark (Java regex) and DuckDB (RE2) engines
# match identically — the cross-engine oracle would catch drift.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]?\d{0,4}",
}
_PII_ORDER = ["email", "ip", "phone"]  # email first: it contains dots/digits


def redact_pii_columns(df: DataFrame, text_col: str = "text",
                       out_col: str = "redacted_text") -> DataFrame:
    """Detect + redact PII as chained codegen regexp_replace (one
    projection, no UDF): per-type match counts and the redacted text
    with `<TYPE>` placeholders.  Each type is COUNTED on the text with
    all earlier types already redacted (same _PII_ORDER as the
    replacement chain), so overlapping matches never double-count —
    n_<type>s equals the number of `<TYPE>` placeholders actually
    present in the output (e.g. 'user1.2.3.4@example.com' is one email
    and zero IPs, not one of each).

    Each intermediate redaction is staged as its own column (count of
    the NEXT type + the next replace both read it), so CollapseProject
    keeps it materialized and every regexp_replace runs once per row
    instead of being re-expanded into each downstream expression."""
    out = df
    prev: Column = F.col(text_col)
    stage_cols = []
    for name in _PII_ORDER:
        out = out.withColumn(
            f"n_{name}s",
            F.regexp_count(prev, F.lit(PII_PATTERNS[name])).cast("long"))
        stage = f"_red_after_{name}"
        out = out.withColumn(stage, F.regexp_replace(
            prev, PII_PATTERNS[name], f"<{name.upper()}>"))
        stage_cols.append(stage)
        prev = F.col(stage)
    return out.withColumn(out_col, prev).drop(*stage_cols)
# 62-bit fingerprint.  The Mersenne-31 modulus keeps every intermediate
# inside int64 (weights < 2^31, byte*weight < 2^39, a 4096-term block
# sum < 2^51, carry*base^block < 2^62), so the inner loop is pure numpy
# block arithmetic — no per-byte Python (measured ~100x the naive
# per-byte loop).
_FP_MOD = (1 << 31) - 1
_FP_BASES = (257, 263)
_FP_BLOCK = 4096


def _fp_tables():
    import numpy as np
    tables = []
    for base in _FP_BASES:
        pw = np.empty(_FP_BLOCK, dtype=np.int64)
        pw[-1] = 1
        for j in range(_FP_BLOCK - 2, -1, -1):
            pw[j] = (pw[j + 1] * base) % _FP_MOD
        tables.append((base, pw, pow(base, _FP_BLOCK, _FP_MOD)))
    return tables


_FP_TABLES = None


def _fp_one(data, tables) -> int:
    """62-bit fingerprint of one byte buffer via block-Horner."""
    n = len(data)
    hs = []
    for base, pw, p_block in tables:
        h = 0
        full = n - n % _FP_BLOCK
        for off in range(0, full, _FP_BLOCK):
            val = int((data[off:off + _FP_BLOCK] * pw).sum() % _FP_MOD)
            h = (h * p_block + val) % _FP_MOD
        rem = n - full
        if rem:
            val = int((data[full:] * pw[-rem:]).sum() % _FP_MOD)
            h = (h * pow(base, rem, _FP_MOD) + val) % _FP_MOD
        hs.append(h)
    return (hs[0] << 31) | hs[1]


@pandas_udf(LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Deterministic polynomial rolling-hash fingerprint over the raw
    utf-8 bytes; numpy-vectorized block arithmetic per document."""
    import numpy as np
    global _FP_TABLES
    if _FP_TABLES is None:
        _FP_TABLES = _fp_tables()
    out = []
    for t in texts:
        data = np.frombuffer(
            (t or "").encode("utf-8", "surrogatepass"),
            dtype=np.uint8).astype(np.int64)
        out.append(_fp_one(data, _FP_TABLES))
    return pd.Series(out, dtype="int64")


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    # spread single-partition inputs so the pandas UDF parallelizes
    n_out = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n_out, F.crc32(F.col(text_col))).withColumn(
        "fingerprint", fingerprint_udf(F.col(text_col)))
