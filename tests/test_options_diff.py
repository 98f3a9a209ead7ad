"""Differential tests for the baseline options diff (J6/J7/J10, P24)
against the reference's db_options/baseline_log_files_utils machinery.
"""

import pytest
from pyspark.sql import functions as F

from log_parser_spark.corpus import load_corpus_logs
from log_parser_spark.engine import branches, options_diff
from log_parser_spark.engine.parse import parse_pages
from log_parser_spark.engine.schema import PAGES_SCHEMA


@pytest.fixture(scope="module")
def sample_data(spark):
    logs = load_corpus_logs()
    pages = spark.createDataFrame(
        [("https://t/sample", None, None, logs["sample"], "en")],
        schema=PAGES_SCHEMA)
    rec = parse_pages(pages)
    rec.persist().count()
    yield rec
    rec.unpersist()


def test_closest_baseline_matches_reference(reference):
    import baseline_log_files_utils as blu  # oracle

    cases = [("SPEEDB", "6.22.1"), ("ROCKSDB", "7.2.2"),
             ("ROCKSDB", "6.0.2"), ("SPEEDB", "2.9.9"),
             ("ROCKSDB", "5.0.0")]
    for product, version in cases:
        import os
        cwd = os.getcwd()
        os.chdir("/root/reference")
        try:
            ref = blu.find_closest_baseline_info(
                "baseline_logs",
                "RocksDB" if product == "ROCKSDB" else "Speedb", version)
        finally:
            os.chdir(cwd)
        mine = options_diff.closest_baseline(product, version)
        if ref is None:
            assert mine is None, (product, version)
        else:
            assert mine is not None, (product, version)
            assert str(ref.version) == mine[1], (product, version)


def test_sanitize_matches_reference(reference, spark):
    import db_options as dbo  # oracle

    values = ["true", "True", "false", "0x7f8a9", "None", "(nil)",
              "nullptr", "0x0", "abc", "123", "1", "0",
              "something 0xDEAD1 here", ""]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    mine = {r["v"]: r["s"] for r in df.select(
        "v", options_diff.sanitize_value_col(F.col("v")).alias("s")
    ).collect()}
    for v in values:
        assert mine[v] == dbo.get_sanitized_value(v), repr(v)


def test_values_differ_matches_reference(reference, spark):
    import db_options as dbo  # oracle

    pairs = [("true", "1"), ("false", "0"), ("true", "false"),
             ("0x123", "0x456"), ("0x123", "nullptr"), ("abc", "abc"),
             ("abc", "abd"), ("None", "(nil)"), ("10", "10"), ("10", "11")]
    df = spark.createDataFrame(pairs, "a string, b string")
    mine = {(r["a"], r["b"]): r["d"] for r in df.select(
        "a", "b",
        options_diff.values_differ_col(F.col("a"), F.col("b")).alias("d")
    ).collect()}
    for a, b in pairs:
        assert mine[(a, b)] == \
            dbo.are_non_sanitized_values_different(a, b), (a, b)


def test_db_wide_diff_matches_reference(reference, sample_data, spark):
    """Full chain: LOG_sample (SpeeDB 6.22.1) vs its nearest baseline."""
    import os

    opts = branches.options(sample_data)
    meta = branches.metadata(sample_data)
    mine_rows = options_diff.options_vs_baseline_diff(
        opts, meta, spark, section="db_wide").collect()
    mine = {r["option"]: r["diff_kind"] for r in mine_rows}

    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        import baseline_log_files_utils as blu
        import db_options as dbo
        from log_file import ParsedLog
        pl = ParsedLog("test/input_files/LOG_sample",
                       open("test/input_files/LOG_sample").read().splitlines(),
                       False)
        binfo = blu.get_baseline_database_options(
            "baseline_logs", pl.get_metadata().get_product_name(),
            pl.get_metadata().get_version())
        ref_diff = dbo.DatabaseOptions.get_db_wide_options_diff(
            binfo.baseline_options.get_db_wide_options(),
            pl.get_database_options().get_db_wide_options())
    finally:
        os.chdir(cwd)

    ref = {}
    dd = ref_diff.get_diff_dict() if ref_diff else {}
    for full_name, delta in dd.items():
        if full_name == "cf names":
            continue
        opt = full_name.split(".", 1)[1]
        base_v, new_v = delta  # (sanitized_base, sanitized_new)
        if base_v == "Missing":
            ref[opt] = "in-new-only"
        elif new_v == "Missing":
            ref[opt] = "in-base-only"
        else:
            ref[opt] = "changed"

    assert ref == mine


def test_common_vs_unique(sample_data, spark):
    # LOG_sample's 4 cfs have heterogeneous option sets -> all unique
    opts = branches.options(sample_data)
    rows = options_diff.common_vs_unique_cf_options(opts).collect()
    assert rows and all(r["scope"] == "unique" for r in rows)

    # synthetic check of the 'common' rule: present in every cf with one
    # distinct value (db_options.py:626-670)
    synth = spark.createDataFrame(
        [("u", "cf", "a", "shared", "1", 0), ("u", "cf", "b", "shared", "1", 1),
         ("u", "cf", "a", "diff", "1", 2), ("u", "cf", "b", "diff", "2", 3),
         ("u", "cf", "a", "only_a", "1", 4)],
        "url string, section string, cf string, option string, "
        "value string, seq long")
    out = {r["option"]: r["scope"]
           for r in options_diff.common_vs_unique_cf_options(synth).collect()}
    assert out == {"shared": "common", "diff": "unique", "only_a": "unique"}
