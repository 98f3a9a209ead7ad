"""Options diff vs version-baseline logs (SURVEY §2.3 J6/J7/J10, §2.2 P24).

The reference parses the nearest-version baseline LOG (bisect over the
shipped baseline_logs/, baseline_log_files_utils.py:78-163) and diffs
option dicts with sanitized comparison (db_options.py:126-262,780-960).

Spark shape: baseline options are a tiny dim — parsed once driver-side
with OUR parser, broadcast — and the diff is a full-outer join keyed by
(url, option) with sanitized-compare expressions.  Works for db-wide
options (vs the baseline's db-wide) and per-cf options (vs the
baseline's default cf), mirroring get_db_wide_options_diff /
get_cfs_options_diff.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_parser_spark import grammar as g

# vendored copy of the reference's baseline logs (data, not code) —
# keeps baseline-diff runnable without the reference checkout; resolved
# through datafiles so a --py-files zip deployment works too
from log_parser_spark.datafiles import data_path

BASELINE_LOGS_DIR = data_path("baseline_logs")

_NULL_PTR_STRS = ["none", "(nil)", "nil", "nullptr", "null", "0x0"]
_SANITIZED_NO_VALUE = "Missing"
_SANITIZED_NULL_PTR = "Pointer (Uninitialised)"


# ---------------------------------------------------- column-level P24

def _is_null_ptr(c):
    return F.lower(c).isin(*_NULL_PTR_STRS)


def _is_bool(c):
    return F.lower(c).isin("true", "false")


def _ptr_extract(c):
    return F.regexp_extract(F.trim(c), f"({g.POINTER_NC})", 1)


def _is_ptr(c):
    return (~_is_null_ptr(c)) & (_ptr_extract(c) != "")


def sanitize_value_col(c):
    """db_options.py:205-222 as a column expression."""
    return (F.when(c.isNull(), _SANITIZED_NO_VALUE)
            .when(_is_bool(c),
                  F.initcap(F.lower(c)))  # "True"/"False"
            .when(_is_null_ptr(c), _SANITIZED_NULL_PTR)
            .when(_is_ptr(c), F.concat(F.lit("Pointer ("),
                                       _ptr_extract(c), F.lit(")")))
            .otherwise(c))


def _bool_norm(c):
    """check_and_sanitize_if_bool_value with include_int=True."""
    lc = F.lower(c)
    return (F.when(lc.isin("true", "1"), "True")
            .when(lc.isin("false", "0"), "False")
            .otherwise(c))


def values_differ_col(base, new):
    """are_non_sanitized_values_different (db_options.py:225-262):
    two pointers compare equal; bools coerce 0/1/true/false."""
    both_ptr = _is_ptr(base) & _is_ptr(new)
    either_bool = _is_bool(base) | _is_bool(new)
    sb, sn = sanitize_value_col(base), sanitize_value_col(new)
    return (F.when(both_ptr, F.lit(False))
            .when(either_bool, _bool_norm(sb) != _bool_norm(sn))
            .otherwise(sb != sn))


# -------------------------------------------------- baseline dim (J10/S2)

def _version_key(v: str):
    parts = [int(x) for x in v.split(".") if x != ""]
    while len(parts) < 3:
        parts.append(-1)  # Version treats absent patch as smallest
    return tuple(parts)


def list_baseline_logs(folder: str = BASELINE_LOGS_DIR):
    """[(product, version, path)] sorted by version."""
    out = []
    for path in glob.glob(os.path.join(folder, "LOG-*")):
        name = os.path.basename(path)
        m = re.findall(r"LOG-(rocksdb|speedb)-(\d+\.\d+\.?\d*)", name)
        if m:
            out.append((m[0][0].upper(), m[0][1], path))
    out.sort(key=lambda t: (t[0], _version_key(t[1])))
    return out


def closest_baseline(product: str, version: str,
                     folder: str = BASELINE_LOGS_DIR):
    """bisect_right - 1 over same-product versions
    (baseline_log_files_utils.py:100-113); None if target precedes all."""
    cands = [b for b in list_baseline_logs(folder)
             if b[0] == (product or "").upper()]
    if not cands:
        return None
    key = _version_key(version)
    chosen = None
    for prod, v, path in cands:
        if _version_key(v) <= key:
            chosen = (prod, v, path)
        else:
            break
    return chosen


def baseline_options_rows(folder: str = BASELINE_LOGS_DIR):
    """Parse every baseline log with OUR parser (driver-side; they are
    tiny) -> [(product, version, section, cf, option, value)]."""
    from log_parser_spark.parsing import parse_document
    rows = []
    for product, version, path in list_baseline_logs(folder):
        with open(path) as f:
            recs = parse_document(f.read())
        for r in recs:
            if r["kind"] == "option":
                rows.append((product, version, r["attrs"]["section"],
                             r["cf"], r["name"], r["msg"]))
    return rows


def baseline_options_dim(spark: SparkSession,
                         folder: str = BASELINE_LOGS_DIR) -> DataFrame:
    return spark.createDataFrame(
        baseline_options_rows(folder),
        "product string, bversion string, section string, cf string, "
        "option string, bvalue string")


# ----------------------------------------------------------- the diff (J6)

def url_baseline_map(metadata: DataFrame, spark: SparkSession,
                     folder: str = BASELINE_LOGS_DIR) -> DataFrame:
    """url -> (product, closest baseline version); the distinct
    (product, version) set is tiny, so nearest-version resolution is
    driver-side + broadcast join (baseline parsed lazily once in the
    reference, log_file.py:509-514)."""
    pairs = [(r["product_name"], r["version"]) for r in
             metadata.select("product_name", "version").distinct().collect()]
    mapping = []
    for product, version in pairs:
        if not product or not version:
            continue
        # utils.py:448-453: case-insensitive exact product match; other
        # products have no baseline
        low = product.lower()
        if low not in ("rocksdb", "speedb"):
            continue
        hit = closest_baseline(low.upper(), version, folder)
        if hit:
            mapping.append((product, version, hit[0], hit[1]))
    if not mapping:
        return spark.createDataFrame(
            [], "product_name string, version string, bproduct string, "
                "bversion string")
    bmap = spark.createDataFrame(
        mapping, "product_name string, version string, bproduct string, "
                 "bversion string")
    return metadata.select("url", "product_name", "version").join(
        F.broadcast(bmap), ["product_name", "version"], "inner").select(
        "url", "bproduct", "bversion")


def options_vs_baseline_diff(options: DataFrame, metadata: DataFrame,
                             spark: SparkSession,
                             section: str = "db_wide",
                             cf_name: str | None = None,
                             folder: str = BASELINE_LOGS_DIR) -> DataFrame:
    """get_cfs_options_diff semantics (db_options.py:858-908): full-outer
    on (url, option) between the url's options and its closest baseline's
    options for the given section/cf; rows only where a difference exists.

    diff_kind: 'in-base-only' | 'in-new-only' | 'changed'."""
    ub = url_baseline_map(metadata, spark, folder)
    bdim = baseline_options_dim(spark, folder)

    # reference quirk preserved: options whose NAME contains a '.'
    # (e.g. sst_file_manager.rate_bytes_per_sec) are silently dropped
    # from its diff surface — parse_full_option_name round-trips via
    # split('.')[-1] (db_options.py:66-69) and loses them
    options = options.filter(~F.col("option").contains("."))
    bdim = bdim.filter(~F.col("option").contains("."))

    if section == "db_wide":
        new_side = options.filter(F.col("section") == "db_wide")
        base_side = bdim.filter(F.col("section") == "db_wide")
    else:
        new_side = options.filter(
            (F.col("section").isin("cf", "table"))
            & ((F.col("cf") == cf_name) if cf_name is not None else F.lit(True)))
        base_side = bdim.filter(
            (F.col("section").isin("cf", "table"))
            & (F.col("cf") == "default"))

    new = new_side.select("url", "cf", "section", "option", "value")
    base_small = base_side.select(
        F.col("product").alias("bproduct"), "bversion", "section",
        "option", "bvalue")
    base = (ub.join(F.broadcast(base_small), ["bproduct", "bversion"],
                    "inner")
            .select("url", "section", "option", "bvalue"))

    # per-cf diffs compare each of the url's cfs against the baseline's
    # default cf -> replicate baseline rows per (url, cf)
    if section == "db_wide":
        keys = ["url", "section", "option"]
    else:
        cfs = new.select("url", "cf").distinct()
        base = base.join(cfs, "url")
        keys = ["url", "cf", "section", "option"]

    j = new.join(base, keys, "full_outer")
    diff = j.withColumn(
        "diff_kind",
        F.when(F.col("value").isNull() & F.col("bvalue").isNotNull(),
               "in-base-only")
        .when(F.col("bvalue").isNull() & F.col("value").isNotNull(),
              "in-new-only")
        .when(values_differ_col(F.col("bvalue"), F.col("value")), "changed")
        .otherwise(None))
    out_cols = ["url", "section", "option",
                sanitize_value_col(F.col("bvalue")).alias("baseline_value"),
                sanitize_value_col(F.col("value")).alias("new_value"),
                "diff_kind"]
    if section != "db_wide":
        out_cols.insert(1, F.col("cf"))
    return diff.filter(F.col("diff_kind").isNotNull()).select(*out_cols)


def common_vs_unique_cf_options(options: DataFrame) -> DataFrame:
    """J7 (db_options.py:626-670): per url, an option is COMMON iff it
    appears in every cf with one distinct value; otherwise unique."""
    cf_opts = options.filter(F.col("section").isin("cf", "table"))
    n_cfs = cf_opts.groupBy("url").agg(
        F.countDistinct("cf").alias("n_cfs"))
    per_opt = cf_opts.groupBy("url", "section", "option").agg(
        F.countDistinct("cf").alias("n_cfs_with_option"),
        F.countDistinct("value").alias("n_distinct_values"),
        F.first("value").alias("sample_value"))
    return per_opt.join(n_cfs, "url").withColumn(
        "scope",
        F.when((F.col("n_cfs_with_option") == F.col("n_cfs"))
               & (F.col("n_distinct_values") == 1), "common")
        .otherwise("unique"))
