"""Driver-facing query surface: one entry per operator family from
SURVEY.md §2, each over the driver-provided testdata tables, plus the
training-data-pipeline operators (dedup / similarity / text analysis /
multimodal) and rows-only log-pipeline queries over the synthesized
pages corpus.

Every float column is rounded identically in the Spark and oracle-SQL
versions so the driver's value-hash comparison is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log_parser_spark.ops import dedup, similarity, text
from log_parser_spark.ops.multimodal import binary_meta_columns


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- TPC-H-ish

def q1_pricing_summary(spark, sf_dir):
    """A7/A14-style multi-aggregate groupBy (SURVEY §2.4)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.count("*").alias("count_order")))


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)      AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6)      AS avg_qty,
       count(*)                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark, sf_dir):
    """Join + agg + deterministic top-k (SURVEY §2.6)."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (li.join(o, li.l_orderkey == o.o_orderkey)
           .join(F.broadcast(c), o.o_custkey == c.c_custkey)
           .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("revenue")))
    return (rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10))


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_nation_volume(spark, sf_dir):
    """Multi-way join through the region/nation dims (broadcast)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    return (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count("*").alias("n_items")))


Q5_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ------------------------------------------------------------ events table

def events_route_counts(spark, sf_dir):
    """A10: routed-row-count parity rollup."""
    return (_t(spark, sf_dir, "events")
            .groupBy("event_type").agg(F.count("*").alias("n")))


EVENTS_ROUTE_SQL = "SELECT event_type, count(*) AS n FROM events GROUP BY 1"


def events_interval_stats(spark, sf_dir):
    """W1/A3: previous-sample diff via lag, then per-user aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    gap = (F.unix_micros(F.col("ts").cast("timestamp"))
           - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)).alias("gap_us")
    with_gap = ev.select("user_id", gap)
    return (with_gap.filter(F.col("gap_us").isNotNull())
            .groupBy("user_id")
            .agg(F.count("*").alias("n_gaps"),
                 F.sum("gap_us").alias("sum_gap_us"),
                 F.max("gap_us").alias("max_gap_us")))


EVENTS_INTERVAL_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY event_id) AS gap_us
  FROM events)
SELECT user_id, count(*) AS n_gaps,
       CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
       max(gap_us) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
"""


def events_first_last(spark, sf_dir):
    """A1/A2/W3: first/last/min/max per group via min_by/max_by."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("user_id").agg(
        F.min_by("value", "event_id").alias("first_value"),
        F.max_by("value", "event_id").alias("last_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.count("*").alias("n_events")))


EVENTS_FIRST_LAST_SQL = """
SELECT user_id,
       arg_min(value, event_id) AS first_value,
       arg_max(value, event_id) AS last_value,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


def events_hour_pivot(spark, sf_dir):
    """S3-style pivot: unified time axis x per-type counts as
    conditional aggregation (zero-filled by construction)."""
    ev = _t(spark, sf_dir, "events")
    hour = F.date_format("ts", "yyyy-MM-dd HH").alias("hour")
    types = ["click", "view", "purchase", "signup", "error"]
    aggs = [F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .alias(f"n_{t}") for t in types]
    return ev.select(hour, "event_type").groupBy("hour").agg(*aggs)


EVENTS_HOUR_PIVOT_SQL = """
SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY 1
"""


def events_asof_signup(spark, sf_dir):
    """W4/J2: as-of pattern — for each error event, the most recent
    preceding signup of the same user."""
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    last_signup = F.last(
        F.when(F.col("event_type") == "signup", F.unix_micros(F.col("ts").cast("timestamp"))),
        ignorenulls=True).over(w)
    errs = (ev.withColumn("last_signup_us", last_signup)
            .filter(F.col("event_type") == "error"))
    return (errs.groupBy("user_id").agg(
        F.count("*").alias("n_errors"),
        F.sum(F.when(F.col("last_signup_us").isNotNull(), 1).otherwise(0))
        .alias("n_with_prior_signup"),
        F.max(F.when(F.col("last_signup_us").isNotNull(),
                     F.unix_micros(F.col("ts").cast("timestamp")) - F.col("last_signup_us")))
        .alias("max_gap_us")))


EVENTS_ASOF_SQL = """
WITH w AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         last_value(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END
                    IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_signup_us
  FROM events)
SELECT user_id, count(*) AS n_errors,
       CAST(sum(CASE WHEN last_signup_us IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_with_prior_signup,
       max(CASE WHEN last_signup_us IS NOT NULL
                THEN ts_us - last_signup_us END) AS max_gap_us
FROM w WHERE event_type = 'error' GROUP BY user_id
"""


def orders_running_sum(spark, sf_dir):
    """W5: running cumulative sum per customer."""
    o = _t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"))


ORDERS_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total
FROM orders
"""


def priority_status_diff(spark, sf_dir):
    """J6: options-diff semantics — full-outer join + null-ness CASE."""
    o = _t(spark, sf_dir, "orders")
    a = (o.filter(F.col("o_orderstatus") == "O")
         .groupBy("o_orderpriority").agg(F.count("*").alias("cnt_open")))
    b = (o.filter(F.col("o_orderstatus") == "F")
         .groupBy("o_orderpriority").agg(F.count("*").alias("cnt_done")))
    j = a.join(b, "o_orderpriority", "full_outer")
    return j.select(
        "o_orderpriority", "cnt_open", "cnt_done",
        F.when(F.col("cnt_open").isNull(), "done-only")
        .when(F.col("cnt_done").isNull(), "open-only")
        .when(F.col("cnt_open") == F.col("cnt_done"), "same")
        .otherwise("changed").alias("diff_kind"))


PRIORITY_DIFF_SQL = """
WITH a AS (SELECT o_orderpriority, count(*) AS cnt_open FROM orders
           WHERE o_orderstatus = 'O' GROUP BY 1),
     b AS (SELECT o_orderpriority, count(*) AS cnt_done FROM orders
           WHERE o_orderstatus = 'F' GROUP BY 1)
SELECT coalesce(a.o_orderpriority, b.o_orderpriority) AS o_orderpriority,
       cnt_open, cnt_done,
       CASE WHEN cnt_open IS NULL THEN 'done-only'
            WHEN cnt_done IS NULL THEN 'open-only'
            WHEN cnt_open = cnt_done THEN 'same'
            ELSE 'changed' END AS diff_kind
FROM a FULL OUTER JOIN b USING (o_orderpriority)
"""


# ----------------------------------------------------- documents pipeline

def dedup_exact_docs(spark, sf_dir):
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash, min(doc_id) AS representative,
       count(*) AS n_docs
FROM documents GROUP BY 1
"""


def token_stats_by_lang(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("lang", text.token_count_col("text").alias("n_tok"))
    return toks.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("n_tok"), 6).alias("avg_tokens"))


TOKEN_STATS_SQL = """
WITH t AS (
  SELECT lang,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(regexp_split_to_array(trim(text), '\\s+')) END
           AS n_tok
  FROM documents)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(round(avg(n_tok), 6) AS DOUBLE) AS avg_tokens
FROM t GROUP BY lang
"""


def doc_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return text.quality_columns(docs).select(
        "doc_id", "n_bytes", "n_tokens", "punct_ratio", "digit_ratio",
        "upper_ratio", "quality_score")


DOC_QUALITY_SQL = """
WITH q AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(regexp_split_to_array(trim(text), '\\s+')) END
           AS n_tokens,
         length(text)::DOUBLE AS n,
         length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE AS punct,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS digits,
         length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE AS uppr
  FROM documents),
 r AS (
  SELECT doc_id, n_bytes, n_tokens,
         CAST(round(punct / greatest(n, 1.0), 6) AS DOUBLE) AS punct_ratio,
         CAST(round(digits / greatest(n, 1.0), 6) AS DOUBLE) AS digit_ratio,
         CAST(round(uppr / greatest(n, 1.0), 6) AS DOUBLE) AS upper_ratio
  FROM q)
SELECT doc_id, n_bytes, n_tokens, punct_ratio, digit_ratio, upper_ratio,
       CAST(round(1.0 - least(1.0, punct_ratio * 4) * 0.25
                      - least(1.0, digit_ratio * 4) * 0.25
                      - CASE WHEN n_tokens < 5 THEN 0.5 ELSE 0.0 END, 6)
            AS DOUBLE) AS quality_score
FROM r
"""


def lang_id_counts(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (text.stopword_lang_id(docs)
            .groupBy("pred_lang").agg(F.count("*").alias("n_docs")))


_SW = {k: ", ".join(f"'{w}'" for w in v)
       for k, v in text.STOPWORDS.items()}
LANG_ID_SQL = f"""
WITH t AS (
  SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END
           AS toks
  FROM documents),
 h AS (
  SELECT len(list_filter(toks, x -> x IN ({_SW['en']}))) AS hits_en,
         len(list_filter(toks, x -> x IN ({_SW['de']}))) AS hits_de,
         len(list_filter(toks, x -> x IN ({_SW['fr']}))) AS hits_fr
  FROM t),
 p AS (
  SELECT CASE
           WHEN greatest(hits_en, hits_de, hits_fr) <= 0 THEN 'und'
           WHEN hits_en = greatest(hits_en, hits_de, hits_fr) THEN 'en'
           WHEN hits_de = greatest(hits_en, hits_de, hits_fr) THEN 'de'
           ELSE 'fr' END AS pred_lang
  FROM h)
SELECT pred_lang, count(*) AS n_docs FROM p GROUP BY 1
"""


def ngram_jaccard_adjacent(spark, sf_dir):
    """Near-dup scoring for bucketed candidate pairs; here the
    deterministic pair set (doc_id, doc_id+1)."""
    docs = _t(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("a"),
                    F.col("text").alias("text_a"))
    b = docs.select(F.col("doc_id").alias("b"),
                    F.col("text").alias("text_b"))
    pairs = a.join(b, F.col("b") == F.col("a") + 1)
    return dedup.ngram_jaccard(pairs, "text_a", "text_b").select(
        "a", "b", "jaccard")


NGRAM_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
  FROM documents),
 sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(t) - 2, 0)),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM toks)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(round(CASE
         WHEN len(list_distinct(list_concat(a.s, b.s))) > 0
         THEN len(list_intersect(a.s, b.s))::DOUBLE
              / len(list_distinct(list_concat(a.s, b.s)))::DOUBLE
         ELSE 0.0 END, 6) AS DOUBLE) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
"""


def binary_meta(spark, sf_dir):
    """Multimodal plumbing (JVM fast path): opaque payload -> metadata."""
    return binary_meta_columns(_t(spark, sf_dir, "documents"))


BINARY_META_SQL = """
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_hash
FROM documents
"""


# ----------------------------------------------------------- embeddings

def embedding_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.brute_force_topk(emb, queries, k=5)


EMBEDDING_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 10),
 scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         CAST(round(
           list_sum(list_transform(generate_series(1, len(qv)),
                    i -> qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
                    i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(
                    generate_series(1, len(e.embedding)),
                    i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))))
           , 6) AS DOUBLE) AS cosine
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id != q.query_id),
 ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


def embedding_label_centroids(spark, sf_dir):
    """Array aggregate: per-label centroid via posexplode + groupBy."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("dim", "v"))
    return (ex.groupBy("label", "dim")
            .agg(F.count("*").alias("n_vecs"),
                 F.round(F.avg(F.col("v").cast("double")), 6)
                 .alias("centroid"))
            .filter(F.col("dim") < 8))


EMBEDDING_CENTROID_SQL = """
SELECT label, i - 1 AS dim, count(*) AS n_vecs,
       CAST(round(avg(embedding[i]::DOUBLE), 6) AS DOUBLE) AS centroid
FROM embeddings, generate_series(1, 8) AS g(i)
GROUP BY label, dim
"""


# ------------------------------------ rows-only (non-SQL-expressible) ops

def doc_fingerprints(spark, sf_dir):
    from log_parser_spark.engine.session import ensure_workers_can_import
    ensure_workers_can_import(spark)
    return text.fingerprints(_t(spark, sf_dir, "documents")).select(
        "doc_id", "fingerprint")


def minhash_pairs(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


def simhash_docs(spark, sf_dir):
    return dedup.simhash(_t(spark, sf_dir, "documents"))


def embedding_ann_ivf(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


# ------------------------------------------- log pipeline (rows-only)

_N_LOG_PAGES = 48
_RECORDS_MEMO = {}


def _records(spark):
    """Parsed records over the synthetic pages corpus, parsed once per
    session and persisted (shared by every log_* query)."""
    key = id(spark)
    if key not in _RECORDS_MEMO:
        from log_parser_spark.corpus import build_pages_df
        from log_parser_spark.engine.parse import parse_pages
        from log_parser_spark.engine.session import ensure_workers_can_import
        ensure_workers_can_import(spark)
        rec = parse_pages(build_pages_df(spark, _N_LOG_PAGES)).persist()
        rec.count()
        _RECORDS_MEMO[key] = rec
    return _RECORDS_MEMO[key]


def log_route_counts(spark, sf_dir):
    """P3/A24: per-kind routed record counts over the pages corpus."""
    return _records(spark).groupBy("kind").agg(F.count("*").alias("n"))


def log_event_histogram(spark, sf_dir):
    """A10: events per (event_type, cf)."""
    from log_parser_spark.engine import branches
    return (branches.events(_records(spark))
            .groupBy("event_type", "cf").agg(F.count("*").alias("n")))


def log_counters_last(spark, sf_dir):
    """A1: last value per (url, counter) via max_by."""
    from log_parser_spark.engine import branches
    return (branches.counters(_records(spark))
            .groupBy("url", "name")
            .agg(F.max_by("value", "seq").alias("last_value")))


def log_flush_pairs(spark, sf_dir):
    """J3: flush start/finish pairing with durations."""
    from log_parser_spark.engine import branches, sinks
    records = _records(spark)
    return sinks.flushes_sink(
        branches.events(records), branches.cf_registry(records)).select(
        "url", "cf", "job_id", "start_ts", "finish_ts", "duration_ms")


def log_flush_stats(spark, sf_dir):
    """A9: flush stats per (url, cf, reason) with size-bucket histogram."""
    from log_parser_spark.engine import aggregates, branches
    ev = branches.events(_records(spark))
    return aggregates.flush_stats(ev).join(
        aggregates.flush_size_histogram(ev), ["url", "cf"], "left")


def log_compression_stats(spark, sf_dir):
    """A17: per-compression-type file stats."""
    from log_parser_spark.engine import aggregates, branches
    return aggregates.compression_stats(branches.events(_records(spark)))


def log_read_latency_per_cf(spark, sf_dir):
    """A19: weighted per-cf read latency."""
    from log_parser_spark.engine import aggregates, branches
    return aggregates.read_latency_per_cf(
        branches.read_latency(_records(spark)))


def log_db_size(spark, sf_dir):
    """A13/A14: db size at start/end from level stats dumps."""
    from log_parser_spark.engine import aggregates, branches
    return aggregates.db_size_start_end(branches.comp_stats(_records(spark)))


def log_warnings_enriched(spark, sf_dir):
    """J9+J11+A21: classified warnings w/ severity dim, counted."""
    from log_parser_spark.engine import branches, enrich, sinks
    records = _records(spark)
    w = sinks.warnings_sink(branches.warnings(records),
                            branches.cf_registry(records))
    return (enrich.enrich_warnings(w, spark)
            .groupBy("warn_type", "category", "severity")
            .agg(F.count(F.lit(1)).alias("n")))


def log_options_diff(spark, sf_dir):
    """J6/J7: per-url cf-options vs default-cf diff (full-outer join +
    null-ness CASE, db_options.py:801-908 semantics)."""
    from log_parser_spark.engine import branches
    opts = branches.options(_records(spark)).filter(
        F.col("section") == "cf")
    default = opts.filter(F.col("cf") == "default").select(
        "url", "option", F.col("value").alias("default_value"))
    others = opts.filter(F.col("cf") != "default").select(
        "url", "cf", "option", "value")
    j = others.join(default, ["url", "option"], "full_outer")
    diff = j.withColumn(
        "diff_kind",
        F.when(F.col("value").isNull(), "default-only")
        .when(F.col("default_value").isNull(), "cf-only")
        .when(F.col("value") == F.col("default_value"), "same")
        .otherwise("changed"))
    return diff.groupBy("diff_kind").agg(F.count(F.lit(1)).alias("n"))


def log_options_vs_baseline(spark, sf_dir):
    """J6/J10/P24: db-wide options diffed against the nearest
    version-baseline log (sanitized compare), counted per diff kind."""
    from log_parser_spark.engine import branches, options_diff
    records = _records(spark)
    diff = options_diff.options_vs_baseline_diff(
        branches.options(records), branches.metadata(records), spark,
        section="db_wide")
    return diff.groupBy("diff_kind").agg(F.count(F.lit(1)).alias("n"))


def log_options_common_unique(spark, sf_dir):
    """J7: per-url common-vs-unique cf options factoring, counted."""
    from log_parser_spark.engine import branches, options_diff
    out = options_diff.common_vs_unique_cf_options(
        branches.options(_records(spark)))
    return out.groupBy("scope").agg(F.count(F.lit(1)).alias("n"))


def log_parsed_summaries(spark, sf_dir):
    """S9: per-url parsed_json summary rows."""
    from log_parser_spark.engine.summary import parsed_json_sink
    return parsed_json_sink(_records(spark)).select(
        "url", "product_name", "version", "db_size_bytes_at_start",
        "db_size_bytes_at_end")


# ----------------------------------------------------------------- registry

ORACLE_SQL = {
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_nation_volume": Q5_SQL,
    "events_route_counts": EVENTS_ROUTE_SQL,
    "events_interval_stats": EVENTS_INTERVAL_SQL,
    "events_first_last": EVENTS_FIRST_LAST_SQL,
    "events_hour_pivot": EVENTS_HOUR_PIVOT_SQL,
    "events_asof_signup": EVENTS_ASOF_SQL,
    "orders_running_sum": ORDERS_RUNNING_SQL,
    "priority_status_diff": PRIORITY_DIFF_SQL,
    "dedup_exact_docs": DEDUP_EXACT_SQL,
    "token_stats_by_lang": TOKEN_STATS_SQL,
    "doc_quality": DOC_QUALITY_SQL,
    "lang_id_counts": LANG_ID_SQL,
    "ngram_jaccard_adjacent": NGRAM_JACCARD_SQL,
    "binary_meta": BINARY_META_SQL,
    "embedding_topk": EMBEDDING_TOPK_SQL,
    "embedding_label_centroids": EMBEDDING_CENTROID_SQL,
}

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_nation_volume": q5_nation_volume,
    "events_route_counts": events_route_counts,
    "events_interval_stats": events_interval_stats,
    "events_first_last": events_first_last,
    "events_hour_pivot": events_hour_pivot,
    "events_asof_signup": events_asof_signup,
    "orders_running_sum": orders_running_sum,
    "priority_status_diff": priority_status_diff,
    "dedup_exact_docs": dedup_exact_docs,
    "token_stats_by_lang": token_stats_by_lang,
    "doc_quality": doc_quality,
    "lang_id_counts": lang_id_counts,
    "ngram_jaccard_adjacent": ngram_jaccard_adjacent,
    "binary_meta": binary_meta,
    "embedding_topk": embedding_topk,
    "embedding_label_centroids": embedding_label_centroids,
    # rows-only (non-SQL-expressible: hash functions / LSH / log grammar)
    "doc_fingerprints": doc_fingerprints,
    "minhash_pairs": minhash_pairs,
    "simhash_docs": simhash_docs,
    "embedding_ann_ivf": embedding_ann_ivf,
    "log_route_counts": log_route_counts,
    "log_event_histogram": log_event_histogram,
    "log_counters_last": log_counters_last,
    "log_flush_pairs": log_flush_pairs,
    "log_flush_stats": log_flush_stats,
    "log_compression_stats": log_compression_stats,
    "log_read_latency_per_cf": log_read_latency_per_cf,
    "log_db_size": log_db_size,
    "log_warnings_enriched": log_warnings_enriched,
    "log_options_diff": log_options_diff,
    "log_options_vs_baseline": log_options_vs_baseline,
    "log_options_common_unique": log_options_common_unique,
    "log_parsed_summaries": log_parsed_summaries,
}
