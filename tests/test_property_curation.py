"""Seeded-random differential tests for the curation ops: the Spark
(Java-regex / array-expression) implementations must agree with plain
Python reimplementations on a few hundred adversarial ASCII documents.

The DuckDB oracle already cross-checks these queries on the sf corpus;
this adds an INDEPENDENT third implementation over nastier inputs
(runs of punctuation, empty lines, lone separators) in one Spark job.
Alphabet is ASCII-only on purpose: Java and Python regex classes agree
there, and the ops' documented contracts are byte-oriented.
"""

from __future__ import annotations

import random
import re

# \x0B (vertical tab) is deliberately in the alphabet: Java \s includes
# it, RE2 \s does not — the explicit-class contract (text.WS_CLASS)
# must keep all three implementations agreeing on it
ALPHABET = (list("abcdefgXYZ0123456789") + list(" \n\x0B.!?#@-{•*\"")
            + ["..."])


def _random_texts(n=200, seed=20260817):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        length = rng.randint(0, 120)
        out.append((i, "".join(rng.choice(ALPHABET)
                               for _ in range(length))))
    # structured extremes
    out.append((n, ""))
    out.append((n + 1, "word " * 60))
    out.append((n + 2, "• a b c d e.\n" * 10))
    out.append((n + 3, "a@b.co 1.2.3.4 +1-555-123-4567"))
    return out


def _tokens(t):
    t = t.strip()
    return re.split(r"\s+", t) if t else []


def _lines(t):
    return [ln for ln in t.split("\n") if ln.strip()]


def test_gopher_quality_matches_python(spark):
    from log_parser_spark.ops import text as T
    rows = _random_texts()
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           T.gopher_quality_columns(df).collect()}
    for doc_id, t in rows:
        toks = _tokens(t)
        lines = _lines(t)
        r = got[doc_id]
        assert r["n_words"] == len(toks), (doc_id, t)
        if toks:
            exp = round(sum(len(w) for w in toks) / len(toks), 6)
            assert abs(r["mean_word_len"] - exp) < 1e-9, (doc_id, t)
        n_sym = t.count("#") + len(re.findall(r"\.\.\.|…", t))
        exp_sym = round(n_sym / max(len(toks), 1), 6)
        assert abs(r["symbol_word_ratio"] - exp_sym) < 1e-9, (doc_id, t)
        n_bullet = sum(bool(re.match(r"^[•\-\*]", ln.strip()))
                       for ln in lines)
        assert abs(r["bullet_line_ratio"]
                   - round(n_bullet / max(len(lines), 1), 6)) < 1e-9, \
            (doc_id, t)
        n_alpha = sum(bool(re.search("[A-Za-z]", w)) for w in toks)
        assert abs(r["alpha_word_ratio"]
                   - round(n_alpha / max(len(toks), 1), 6)) < 1e-9, \
            (doc_id, t)


def test_repetition_matches_python(spark):
    from log_parser_spark.ops import text as T
    rows = _random_texts()
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           T.gopher_repetition_columns(df).collect()}
    for doc_id, t in rows:
        toks = _tokens(t)
        lines = _lines(t)
        r = got[doc_id]
        assert r["n_lines"] == len(lines)
        exp_dup = round((len(lines) - len(set(lines)))
                        / max(len(lines), 1), 6)
        assert abs(r["dup_line_ratio"] - exp_dup) < 1e-9, (doc_id, t)
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        # most FREQUENT bigram, frequency ties broken by coverage
        top = 0
        if bigrams:
            from collections import Counter
            cnt = Counter(bigrams)
            best = max(cnt.values())
            top = max(c * (len(g) - 1) for g, c in cnt.items()
                      if c == best)
        wc = max(sum(len(w) for w in toks), 1)
        exp_top = round(top / wc, 6) if len(toks) >= 2 else 0.0
        assert abs(r["top_bigram_char_ratio"] - exp_top) < 1e-9, \
            (doc_id, t)


def test_pii_matches_python(spark):
    from log_parser_spark.ops import text as T
    from log_parser_spark.ops.text import PII_PATTERNS
    rows = _random_texts()
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in T.redact_pii_columns(df).collect()}
    for doc_id, t in rows:
        r = got[doc_id]
        # counts are progressive: each type counted AFTER prior types
        # were redacted, so counts == placeholders in the output
        red = t
        for name in ("email", "ip", "phone"):
            exp = len(re.findall(PII_PATTERNS[name], red))
            assert r[f"n_{name}s"] == exp, (doc_id, name, t)
            red = re.sub(PII_PATTERNS[name], f"<{name.upper()}>", red)
        assert r["redacted_text"] == red, (doc_id, t)
        for name in ("email", "ip", "phone"):
            assert r[f"n_{name}s"] == red.count(f"<{name.upper()}>"), \
                (doc_id, name, t)


def test_c4_clean_matches_python(spark):
    from log_parser_spark.ops import cleaning
    rows = _random_texts()
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           cleaning.c4_clean_columns(df).collect()}
    for doc_id, t in rows:
        lines = _lines(t)
        kept = [ln for ln in lines
                if re.search(r'[.!?"”]$', ln.strip())
                and len(re.split(r"\s+", ln.strip())) >= 5
                and "javascript" not in ln.lower()]
        r = got[doc_id]
        assert r["n_lines_kept"] == len(kept), (doc_id, t)
        assert r["cleaned_text"] == "\n".join(kept), (doc_id, t)


def test_repetition_whale_document(spark):
    """The bigram metric at the Gopher n_words ceiling: a single
    100k-word document (the whale case — ~100k bigrams array-sorted in
    ONE task row) must still compute exactly and fast.  This measures
    the documented O(n log n)-per-doc bound instead of asserting it;
    the O(n^2) per-distinct-bigram formulation this replaced would
    need ~10^10 comparisons here and time out."""
    import time

    from log_parser_spark.ops import text as T

    n = 100_000
    # 1000 distinct words cycled -> every bigram 'w{i} w{i+1}' repeats
    # ~100x; plant a dominant bigram pair at slots 0/1 of each cycle
    words = [f"w{i % 1000}" for i in range(n)]
    t = " ".join(words)
    df = spark.createDataFrame([(1, t)], ["doc_id", "text"])
    t0 = time.time()
    row = T.gopher_repetition_columns(df).collect()[0]
    wall = time.time() - t0

    # exact expectation from the Python mirror
    from collections import Counter
    bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    cnt = Counter(bigrams)
    best = max(cnt.values())
    top = max(c * (len(g) - 1) for g, c in cnt.items() if c == best)
    wc = sum(len(w) for w in words)
    assert row["top_bigram_char_ratio"] == round(top / wc, 6)
    assert row["n_lines"] == 1
    # generous ceiling: the whale doc is one task; 60 s would mean the
    # quadratic path snuck back in (measured ~1-3 s on this host)
    assert wall < 60, f"whale document took {wall:.1f}s"


def test_unicode_whitespace_contract(spark):
    """Tokenization separators are ASCII whitespace ONLY, via the
    explicit class [ \\t\\n\\x0B\\f\\r] on BOTH engines.  A bare
    \\s would fork them on \\x0B (Java's \\s includes vertical tab,
    RE2's [\\t\\n\\f\\r ] does not); U+00A0 (nbsp) and U+2003 (em
    space) are token characters on both.  Python's Unicode-aware
    re.\\s would disagree too — pinned so a future 'fix' can't
    silently fork the two sides of the oracle."""
    import duckdb

    from pyspark.sql import functions as F

    from log_parser_spark.ops.text import tokens_col
    texts = ["a\u00a0b c", "x\u2003y", "plain text",
             "\u00a0", "", "a\x0bb", "\x0b", "x\x0b\u00a0\x0by"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "text"])
    spark_counts = {r["i"]: r["n"] for r in df.select(
        "i", F.size(tokens_col("text")).alias("n")).collect()}

    con = duckdb.connect()
    duck_counts = {}
    for i, t in enumerate(texts):
        duck_counts[i] = con.execute(
            "SELECT len(list_filter(regexp_split_to_array(?,"
            r" '[ \t\n\x0B\f\r]+'),"
            r" x -> x <> ''))", [t]).fetchone()[0]
    assert spark_counts == duck_counts
    # nbsp/em-space glue tokens together: 'a b' is ONE token
    assert spark_counts[0] == 2 and spark_counts[1] == 1
    assert spark_counts[3] == 1  # a lone nbsp IS a token
    assert spark_counts[4] == 0
    # \x0B IS a separator on both engines (the explicit-class payoff:
    # with a bare \s DuckDB/RE2 would keep 'a\x0bb' as ONE token
    # while Spark/Java split it in two)
    assert spark_counts[5] == 2
    assert spark_counts[6] == 0  # a lone vertical tab is NOT a token
    assert spark_counts[7] == 3  # x, nbsp, y — nbsp alone is a token
