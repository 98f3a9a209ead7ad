"""Unit tests for the training-data pipeline operators."""

import pytest
from pyspark.sql import functions as F

from log_parser_spark.ops import dedup, similarity, text
from log_parser_spark.ops.multimodal import extract_media_metadata


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and the dog sat too", "en"),
        (2, "the cat sat on the mat and the dog sat too", "en"),  # exact dup
        (3, "the cat sat on the mat and the dog ran too", "en"),  # near dup
        (4, "der Hund ist nicht mit der Katze und der Maus", "de"),
        (5, "le chat est sur le tapis et le chien est pour la vie", "fr"),
        (6, "zzz qqq xxx", "und"),
        (7, "", "und"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedup(docs):
    out = {r["content_hash"]: (r["representative"], r["n_docs"])
           for r in dedup.exact_dedup(docs).collect()}
    assert len(out) == 6  # 7 docs, one exact duplicate pair
    assert (1, 2) in out.values()


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["a"], r["b"]): r["est_jaccard"]
             for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert pairs.get((1, 2)) == 1.0  # identical docs collide in every band
    # near-dup pair should be found with high (not 1.0) similarity
    assert (1, 3) in pairs
    assert 0.3 <= pairs[(1, 3)] < 1.0
    # unrelated docs must not pair up
    assert (4, 5) not in pairs


def test_simhash_near_dups_close(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[1] == sh[2]
    ham_13 = bin((sh[1] ^ sh[3]) & ((1 << 64) - 1)).count("1")
    ham_14 = bin((sh[1] ^ sh[4]) & ((1 << 64) - 1)).count("1")
    assert ham_13 < ham_14


def test_simhash_pairs_banded_hamming(spark):
    rows = [(1, "the cat sat on the mat and the dog sat too " * 4, "en"),
            (2, "the cat sat on the mat and the dog sat too " * 4, "en"),
            (3, "the cat sat on the mat and the dog ran too " * 4, "en"),
            (4, "completely different text about gardens and rivers "
                "flowing through quiet valleys every morning", "en")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {(r["a"], r["b"]): r["hamming"]
           for r in dedup.simhash_pairs(df, max_hamming=8).collect()}
    assert got.get((1, 2)) == 0                # identical docs
    assert (1, 3) in got and got[(1, 3)] <= 8  # near dup within budget
    assert (1, 4) not in got and (2, 4) not in got
    # exactness of the hamming value vs the raw hashes
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    for (a, b), h in got.items():
        assert bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") == h


def test_ngram_jaccard(docs, spark):
    a = docs.select(F.col("doc_id").alias("a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("b"), F.col("text").alias("tb"))
    pairs = a.join(b, F.col("b") == F.col("a") + 1)
    out = {(r["a"], r["b"]): r["jaccard"]
           for r in dedup.ngram_jaccard(pairs, "ta", "tb").collect()}
    assert out[(1, 2)] == 1.0
    assert 0 < out[(2, 3)] < 1.0
    assert out[(5, 6)] == 0.0


def test_ngram_jaccard_by_id_matches_pairwise(docs, spark):
    """The by-id verify (round-7 optimization: per-doc shingle sets
    computed once, attached by id) must score every pair EXACTLY like
    the pre-paired-texts ngram_jaccard — same inner-join pair set,
    same jaccard to 6 decimals, including the empty-shingle 0.0 edge
    case."""
    a = docs.select(F.col("doc_id").alias("a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("b"), F.col("text").alias("tb"))
    tpairs = a.join(b, F.col("b") == F.col("a") + 1)
    want = {(r["a"], r["b"]): r["jaccard"]
            for r in dedup.ngram_jaccard(tpairs, "ta", "tb").collect()}
    ids = docs.select(F.col("doc_id").alias("a"),
                      (F.col("doc_id") + 1).alias("b"))
    for strategy in ("broadcast", "shuffle"):
        got = {(r["a"], r["b"]): r["jaccard"]
               for r in dedup.ngram_jaccard_by_id(
                   ids, docs, docs_join=strategy).collect()}
        assert got == want, strategy
    with pytest.raises(ValueError):
        dedup.ngram_jaccard_by_id(ids, docs, docs_join="psychic")


def test_minhash_lsh_pairs_dedup_flag(docs):
    """dedup_pairs=False emits one copy per shared band; the DISTINCT
    pair set and every est_jaccard must equal the deduped output."""
    dd = dedup.minhash_lsh_pairs(docs).collect()
    raw = dedup.minhash_lsh_pairs(docs, dedup_pairs=False).collect()
    assert len(raw) >= len(dd)
    want = {(r["a"], r["b"]): r["est_jaccard"] for r in dd}
    got = {}
    for r in raw:
        got.setdefault((r["a"], r["b"]), set()).add(r["est_jaccard"])
    assert {k: {v} for k, v in want.items()} == got


def test_connected_components_max_iters_guard(spark):
    edges = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError, match="max_iters"):
        dedup.connected_components(edges, max_iters=0)


def test_lang_id(docs):
    out = {r["doc_id"]: r["pred_lang"]
           for r in text.stopword_lang_id(docs).collect()}
    assert out[1] == "en" and out[4] == "de" and out[5] == "fr"
    assert out[6] == "und" and out[7] == "und"


def test_quality_scores(docs):
    out = {r["doc_id"]: r for r in text.quality_columns(docs).collect()}
    assert out[7]["n_tokens"] == 0
    assert out[6]["quality_score"] < out[1]["quality_score"]


def test_fingerprint_deterministic(docs, spark):
    a = {r["doc_id"]: r["fingerprint"]
         for r in text.fingerprints(docs).collect()}
    b = {r["doc_id"]: r["fingerprint"]
         for r in text.fingerprints(docs).collect()}
    assert a == b
    assert a[1] == a[2] and a[1] != a[3]


def test_brute_force_topk_self_similarity(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    rows.append((4, [1.0, 0.0, 0.0, 0.001]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0),
                                      k=1)
    row = out.collect()[0]
    assert row["neighbor_id"] == 4  # nearly parallel vector wins
    assert row["cosine"] > 0.99


def test_brute_force_arrow_equals_codegen(spark):
    """The numpy-vectorized scorer must return EXACTLY the codegen
    top-k (same cosines rounded to 6, same tie-breaks)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    a = similarity.brute_force_topk(emb, queries, k=5).collect()
    b = similarity.brute_force_topk_arrow(emb, queries, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted([tuple(r) for r in a], key=lambda t: (t[0], t[3])) == \
        sorted([tuple(r) for r in b], key=lambda t: (t[0], t[3]))


def test_ivf_topk_recall(spark):
    import math
    rows = [(i, [math.cos(i / 7.0), math.sin(i / 7.0), 1.0])
            for i in range(50)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=3)
    approx = similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=3,
        n_centroids=4, n_probe=2)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # bucketed ANN recall should be decent on smooth data
    assert len(e & a) / len(e) >= 0.5


def test_ann_recall_clustered_query(spark):
    """The driver query's contract: on a planted-cluster corpus
    (the realistic text-embedding shape, unlike the ANN-hostile
    i.i.d.-random sf embeddings) IVF recovers >= 0.5 of the exact
    top-k at moderate probes — measured 0.92 at n_probe=1 and 1.0 at
    n_probe=2/4 on this corpus."""
    from log_parser_spark.queries_ext import ann_recall_clustered
    rows = {r["n_probe"]: r for r in ann_recall_clustered(
        spark, "/root/testdata/sf0.001").collect()}
    assert rows[2]["recall_at_k"] >= 0.5
    assert rows[4]["recall_at_k"] >= rows[1]["recall_at_k"] - 1e-9
    assert rows[2]["n_truth"] == 50  # 10 queries x k=5


def test_media_metadata_stub(spark):
    rows = [(1, b"\x89PNG fake"), (2, b""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    out = {r["doc_id"]: r for r in
           extract_media_metadata(df).collect()}
    assert out[1]["n_bytes"] == 9
    assert out[2]["n_bytes"] == 0 and out[3]["n_bytes"] == 0
    assert len(out[1]["feature"]) == 8
    assert out[2]["content_hash"] == out[3]["content_hash"]


def test_media_resize_stub(spark):
    from log_parser_spark.ops.multimodal import resize_images
    rows = [(1, b"\x89PNG fake"), (2, b"other bytes")]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    out = {r["doc_id"]: r for r in
           resize_images(df, target_w=16, target_h=8).collect()}
    assert len(out) == 2
    assert all(r["width"] == 16 and r["height"] == 8
               for r in out.values())
    assert all(len(r["thumbnail"]) == 16 * 8 for r in out.values())
    # deterministic: same payload -> same thumbnail
    again = {r["doc_id"]: r for r in
             resize_images(df, target_w=16, target_h=8).collect()}
    assert bytes(again[1]["thumbnail"]) == bytes(out[1]["thumbnail"])


def test_media_frame_sampling_fans_out(spark):
    from log_parser_spark.ops.multimodal import sample_frames
    rows = [(1, b"video-ish bytes"), (2, b"other")]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    out = sample_frames(df, every_n_sec=1.0, max_frames=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    for doc, frames in by_doc.items():
        assert 1 <= len(frames) <= 4          # 1 -> N fan-out
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(frames)))
        assert all(f["ts_sec"] == f["frame_idx"] * 1.0 for f in frames)
        assert len({bytes(f["frame"]) for f in frames}) == len(frames)


def test_minhash_dup_flood_stays_linear(spark):
    """1k identical docs must NOT produce a quadratic within-bucket
    join: exact dups collapse to one representative + linear star
    pairs, and LSH runs on the distinct texts only."""
    rows = [(i, "the same boilerplate page content repeated everywhere "
                "across the crawl again and again", "en")
            for i in range(1000)]
    rows += [(2000, "a genuinely distinct document about gardens", "en"),
             (2001, "a genuinely distinct document about gardening", "en")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    pairs = dedup.minhash_lsh_pairs(df).collect()
    stars = [r for r in pairs if r["est_jaccard"] == 1.0 and r["a"] == 0]
    assert len(stars) == 999          # star to the representative
    assert len(pairs) <= 999 + 16     # no quadratic blow-up (≤ +LSH pairs)


def test_minhash_bucket_cap_drops_mega_buckets(spark):
    """Distinct docs sharing one degenerate shingle set exceed the cap
    and produce no candidate pairs (documented drop)."""
    rows = [(i, f"tok{i}", "en") for i in range(30)]  # <3 tokens: empty
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = dedup.minhash_lsh_pairs(df, max_bucket_size=8).collect()
    assert out == []  # all 30 share the empty-shingle bucket > cap


def test_hyperplane_buckets_partition(spark):
    """Non-negative embeddings must spread over multiple buckets (the
    signed-% weight bug collapsed them into one)."""
    rows = [(i, [((i * 31 + j * 17) % 97) / 97.0 for j in range(8)])
            for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    n_buckets = (dedup.hyperplane_buckets(emb)
                 .select("bucket").distinct().count())
    assert n_buckets >= 4


def test_embedding_cosine_dedup_finds_near_dups(spark):
    base = [0.1, 0.5, 0.9, 0.2, 0.7, 0.4, 0.6, 0.3]
    rows = [(1, base), (2, list(base)),                     # exact dup
            (3, [v * 1.001 + 0.0005 for v in base]),        # near dup
            (4, [0.9, 0.1, 0.2, 0.8, 0.1, 0.9, 0.05, 0.7])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r["a"], r["b"]): r["cosine"]
             for r in dedup.embedding_cosine_dedup(emb).collect()}
    assert pairs.get((1, 2)) == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.999
    assert (1, 4) not in pairs


def test_ivf_seeds_no_global_window(spark):
    """The seed-selection plan must not contain a single-partition
    global window over the corpus (TakeOrdered instead)."""
    rows = [(i, [float(i), 1.0]) for i in range(100)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    _assignments, seeds = similarity.ivf_assign(emb, n_centroids=4,
                                                n_iters=0)
    assert seeds.count() == 4
    assert sorted(r["centroid_id"] for r in seeds.collect()) == [1, 2, 3, 4]
    # TakeOrderedAndProject (distributed top-n) must drive seed
    # selection; the only Window allowed is over the n-row result
    seed_plan = seeds._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in seed_plan

    # Lloyd refinement (default path) moves centroids off the raw seeds
    _a2, refined = similarity.ivf_assign(emb, n_centroids=4, n_iters=1)
    raw = {r["centroid_id"]: list(r["centroid"]) for r in seeds.collect()}
    ref = {r["centroid_id"]: list(r["centroid"]) for r in refined.collect()}
    assert set(ref) == set(raw)
    assert any([round(x, 6) for x in ref[c]]
               != [round(float(x), 6) for x in raw[c]] for c in ref)


def test_fingerprint_throughput(spark):
    """Vectorized fingerprint must be far beyond per-byte-Python speed
    (conservative floor to stay robust on a throttled host)."""
    import time

    import numpy as np

    from log_parser_spark.ops.text import _fp_one, _fp_tables
    data = np.arange(4_000_000, dtype=np.int64) % 251
    tables = _fp_tables()
    t0 = time.perf_counter()
    _fp_one(data, tables)
    dt = time.perf_counter() - t0
    assert dt < 0.8  # 4 MB in <0.8s => >5 MB/s/core floor (typ. >100)


def test_corpus_cleaning_reasons(spark):
    from log_parser_spark.ops.cleaning import corpus_cleaning_flags
    rows = [
        (1, "the cat sat on the mat and it is a fine day for the dog"),
        (2, "the cat sat on the mat and it is a fine day for the dog"),
        (3, "too short"),
        (4, "12.34 56.78 90.12 34.56 78.90 12.34 56.78 90.12"),  # digits+punct
        (5, "zzz qqq xxx yyy www vvv uuu ttt sss"),           # no lang
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: (r["kept"], r["reason"])
           for r in corpus_cleaning_flags(df).collect()}
    assert out[1] == (True, "kept")
    assert out[2] == (False, "duplicate")
    assert out[3] == (False, "too_short")
    assert out[4] == (False, "low_quality")
    assert out[5] == (False, "unknown_lang")


def test_salted_aggregation_exact(spark):
    from log_parser_spark.ops import skew
    # Zipf-ish: one hot key with 10x the rows
    rows = [("hot", float(i)) for i in range(1000)] + \
           [(f"k{i % 10}", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "key string, v double")

    plain_counts = {r["key"]: r["count"]
                    for r in df.groupBy("key").count().collect()}
    salted_counts = {r["key"]: r["n"]
                     for r in skew.salted_count(df, ["key"]).collect()}
    assert plain_counts == salted_counts

    plain_sums = {r["key"]: round(r["sum(v)"], 6)
                  for r in df.groupBy("key").sum("v").collect()}
    salted_sums = {r["key"]: round(r["sum_v"], 6)
                   for r in skew.salted_sum(df, ["key"], "v").collect()}
    assert plain_sums == salted_sums

    rep = skew.salted_repartition(df, "key", 8)
    assert rep.count() == df.count()


def test_salt_spreads_identical_duplicate_rows(spark):
    """A hot key made of IDENTICAL rows (the crawl case) must still
    spread over many salts — content-hash salting would not."""
    from log_parser_spark.ops import skew
    df = spark.createDataFrame([("hot", 1.0)] * 640, "key string, v double")
    salted = skew.with_salt(df)
    assert salted.select("_salt").distinct().count() >= 8
    partials = skew.with_salt(df).groupBy("key", "_salt").count()
    assert partials.count() >= 8  # >1 reducer handles the hot key
    assert skew.salted_count(df, ["key"]).collect()[0]["n"] == 640


def test_minhash_drop_accounting(spark):
    """Capped buckets are NOT silent: with_drop_stats returns one row
    per dropped (band, bucket) with its size.  100 distinct texts with
    an IDENTICAL shingle set ('a b c' repeated i times) collide in every
    band, blow the cap, and must be fully accounted for."""
    rows = [(i, "a b c " * (i + 1), "en") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    pairs, drops = dedup.minhash_lsh_pairs(
        df, max_bucket_size=64, with_drop_stats=True)
    assert pairs.collect() == []          # every candidate was capped away
    d = drops.collect()
    assert {r["band"] for r in d} == set(range(8))
    # doc 0 has a single shingle, so its signature may diverge on some
    # bands — every band still reports a >=99-member dropped bucket
    assert all(r["bucket_size"] >= 99 for r in d)


def test_simhash_drop_accounting(spark):
    """Same accounting contract for the banded-Hamming simhash join."""
    rows = [(i, "a b c " * (i + 1), "en") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    pairs, drops = dedup.simhash_pairs(
        df, max_hamming=3, max_bucket_size=64, with_drop_stats=True)
    assert pairs.collect() == []
    d = drops.collect()
    assert {r["band"] for r in d} == set(range(4))
    assert all(r["bucket_size"] == 100 for r in d)


def test_simhash_packed_equals_unpacked(spark, docs):
    """The 32-bit-lane packed vote aggregation (_SIMHASH_LANE_BITS=32,
    2 counters per long) is EXACT: it must equal the unpacked 64-column
    path token for token."""
    from log_parser_spark.ops.dedup import (_simhash_packed,
                                            _simhash_unpacked)
    from log_parser_spark.ops.text import tokens_col
    toks = (docs.select("doc_id",
                        F.explode(tokens_col("text")).alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    packed = {r["doc_id"]: r["simhash"]
              for r in _simhash_packed(toks, "doc_id").collect()}
    unpacked = {r["doc_id"]: r["simhash"]
                for r in _simhash_unpacked(toks, "doc_id").collect()}
    assert packed == unpacked and len(packed) == 6  # doc 7 is empty


def test_ivf_refinement_is_sampled(spark):
    """With a refine cap below the corpus size, Lloyd refinement runs on
    a sample but the FINAL assignment still covers every vector, and the
    result is deterministic across runs (seeded sample)."""
    rows = [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(200)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a1, c1 = similarity.ivf_assign(emb, n_centroids=4, n_iters=2,
                                   refine_sample_rows=50)
    assert a1.count() == 200              # full-corpus final pass
    a2, c2 = similarity.ivf_assign(emb, n_centroids=4, n_iters=2,
                                   refine_sample_rows=50)
    cent = lambda c: sorted(  # noqa: E731
        (r["centroid_id"], [round(float(x), 9) for x in r["centroid"]])
        for r in c.collect())
    assert cent(c1) == cent(c2)


def test_simhash_packed_exact_on_random_corpus(spark):
    """Packed 32-bit-lane votes == unpacked votes on a seeded random
    corpus with unicode, repeated tokens, long docs and odd whitespace
    (the fixture test only covers 6 tiny docs)."""
    import random
    from log_parser_spark.ops.dedup import (_simhash_packed,
                                            _simhash_unpacked)
    from log_parser_spark.ops.text import tokens_col
    rng = random.Random(7)
    vocab = (["the", "cat", "Straße", "naïve", "0", "x" * 50, "日本語"]
             + [f"tok{i}" for i in range(40)])
    rows = []
    for i in range(200):
        n = rng.choice([1, 2, 3, 10, 100, 1000])
        ws = rng.choice([" ", "  ", "\t", " \n "])
        rows.append((i, ws.join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    toks = (df.select("doc_id",
                      F.explode(tokens_col("text")).alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    packed = {r["doc_id"]: r["simhash"]
              for r in _simhash_packed(toks, "doc_id").collect()}
    unpacked = {r["doc_id"]: r["simhash"]
                for r in _simhash_unpacked(toks, "doc_id").collect()}
    assert packed == unpacked and len(packed) == 200


def test_url_components_and_canonical(spark):
    from log_parser_spark.ops import web
    rows = [
        (1, "https://Example.COM:443/a/b?x=1#frag"),
        (2, "http://example.com:80/"),
        (3, "https://example.com"),
        (4, "http://example.com:8080/p?"),
        (5, "not a url"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    comp = {r["id"]: r for r in web.url_components(df).collect()}
    assert comp[1]["host"] == "example.com" and comp[1]["port"] == 443
    assert comp[1]["path"] == "/a/b" and comp[1]["query"] == "x=1"
    assert comp[1]["path_depth"] == 2
    assert comp[3]["path"] == "/" and comp[3]["port"] is None

    canon = {r["id"]: r["c"] for r in df.select(
        "id", web.canonical_url_col("url").alias("c")).collect()}
    assert canon[1] == "https://example.com/a/b?x=1"   # port+frag dropped
    assert canon[2] == "http://example.com/"           # default port
    assert canon[3] == "https://example.com/"          # empty path
    assert canon[4] == "http://example.com:8080/p"     # port kept, ? dropped
    assert canon[5] == "not a url"                     # passthrough


def test_url_dedup_groups_variants(spark):
    from log_parser_spark.ops import web
    rows = [(u,) for u in [
        "https://a.io/x", "https://A.IO/x", "https://a.io:443/x",
        "https://a.io/x#f", "https://b.io/y"]]
    df = spark.createDataFrame(rows, ["url"])
    out = {r["canonical_url"]: (r["representative"], r["n_variants"])
           for r in web.url_dedup(df).collect()}
    assert out["https://a.io/x"] == ("https://A.IO/x", 4)
    assert out["https://b.io/y"] == ("https://b.io/y", 1)


def test_url_dedup_sort_query(spark):
    """sort_query=True collapses param-permuted spellings; the default
    keeps queries verbatim (distinct canonicals)."""
    from log_parser_spark.ops import web
    rows = [(u,) for u in [
        "https://a.io/x?b=2&a=1", "https://a.io/x?a=1&b=2",
        "https://a.io/x"]]
    df = spark.createDataFrame(rows, ["url"])
    verbatim = {r["canonical_url"]: r["n_variants"]
                for r in web.url_dedup(df).collect()}
    assert verbatim == {"https://a.io/x?b=2&a=1": 1,
                        "https://a.io/x?a=1&b=2": 1,
                        "https://a.io/x": 1}
    sorted_q = {r["canonical_url"]: r["n_variants"]
                for r in web.url_dedup(df, sort_query=True).collect()}
    assert sorted_q == {"https://a.io/x?a=1&b=2": 2, "https://a.io/x": 1}


def test_cosine_dedup_bucket_cap_and_drop_accounting(spark):
    """The cosine-LSH join is bucket-capped like its minhash/simhash
    siblings (round-3 VERDICT perf-weak item): a planted degenerate
    same-direction flood (identical hyperplane sign pattern) must be
    dropped — its quadratic pair list never materializes — while a
    genuine near-dup pair in a healthy bucket is still found, and the
    drop is fully accounted, never silent."""
    # mixed-sign base: sign pattern 10111101, DISJOINT from the flood's
    # all-positive 01111111 bucket (an all-positive base would share it
    # and be capped away with the flood)
    base = [0.1, -0.5, 0.9, -0.2, 0.7, -0.4, 0.6, -0.3]
    real = [(1, base), (2, [v * 1.001 + 0.0005 for v in base])]
    ramp = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    flood = [(1000 + i, [v * (1 + i) for v in ramp]) for i in range(300)]
    emb = spark.createDataFrame(real + flood, ["vec_id", "embedding"])

    pairs, drops = dedup.embedding_cosine_dedup(
        emb, max_bucket_size=64, with_drop_stats=True)
    got = {(r["a"], r["b"]): r["cosine"] for r in pairs.collect()}
    # the genuine pair survives; no flood pair does
    assert (1, 2) in got and got[(1, 2)] > 0.999
    assert all(a < 1000 and b < 1000 for a, b in got)

    d = drops.collect()
    assert len(d) == 1 and d[0]["band"] == 0
    assert d[0]["bucket_size"] >= 300  # the whole flood, accounted

    # sanity: WITHOUT the planted flood the same cap changes nothing
    small = spark.createDataFrame(real, ["vec_id", "embedding"])
    assert {(r["a"], r["b"]) for r in
            dedup.embedding_cosine_dedup(small).collect()} == {(1, 2)}


def test_media_real_decoder_requires_pil(spark):
    """decoder='real' must raise without PIL; with PIL it must decode
    true dimensions (runs only where PIL exists)."""
    from log_parser_spark.ops import multimodal as mm
    df = spark.createDataFrame([(1, b"not an image")],
                               ["doc_id", "payload"])
    if not mm._HAS_PIL:
        with pytest.raises(NotImplementedError):
            mm.extract_media_metadata(df, decoder="real")
        # "auto" falls back to the deterministic stub
        row = mm.extract_media_metadata(df, decoder="auto").collect()[0]
        stub = mm.extract_media_metadata(df, decoder="stub").collect()[0]
        assert (row["width"], row["height"]) == (stub["width"],
                                                 stub["height"])
        return
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (20, 10)).save(buf, format="PNG")
    img = spark.createDataFrame([(1, buf.getvalue())],
                                ["doc_id", "payload"])
    row = mm.extract_media_metadata(img, decoder="real").collect()[0]
    assert (row["width"], row["height"]) == (20, 10)
    thumb = mm.resize_images(img, target_w=4, target_h=2,
                             decoder="real").collect()[0]
    assert len(thumb["thumbnail"]) == 8


def test_gopher_quality_rules(spark):
    """Gopher rule metrics on planted violations: each doc trips
    exactly the intended rule."""
    good_words = ("the quick brown fox jumps over that lazy dog and "
                  "runs off to be with all of them in have with " * 4)
    rows = [
        (1, good_words),                                   # passes all
        (2, "too short to pass the word count rule"),      # n_words < 50
        (3, "\n".join("• item the of and to be that have"
                      for _ in range(20))),                # all bullets
        (4, good_words + " " + "#### " * 40),              # symbols
        (5, " ".join(str(i) for i in range(80))
            + " the of and to be"),                        # non-alpha words
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           text.gopher_quality_columns(df).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[1]["n_req_stopwords"] >= 2
    assert out[2]["gopher_pass"] is False and out[2]["n_words"] < 50
    assert out[3]["bullet_line_ratio"] == 1.0
    assert out[3]["gopher_pass"] is False  # > 0.9 bulleted lines
    assert out[4]["gopher_pass"] is False
    assert out[4]["symbol_word_ratio"] > 0.1
    assert out[5]["gopher_pass"] is False
    assert out[5]["alpha_word_ratio"] < 0.8


def test_gopher_repetition_rules(spark):
    """Repetition metrics on planted docs: duplicate lines and a
    dominant bigram each trip their rule; clean text passes."""
    rows = [
        (1, "one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen "
            "seventeen eighteen nineteen twenty"),
        (2, "dup line\ndup line\ndup line\nunique line here"),
        (3, "spam ham spam ham spam ham spam ham spam ham"),
        (4, ""),
        # 'aa bb' x3 (most frequent, 12 chars covered) vs
        # 'longword1 longword2' x2 (less frequent but 36 chars): the
        # metric must follow FREQUENCY — 12/48, not the bigger 36/48
        (5, "aa bb aa bb aa bb longword1 longword2 "
            "longword1 longword2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           text.gopher_repetition_columns(df).collect()}
    assert out[1]["dup_line_ratio"] == 0.0
    assert out[1]["repetition_pass"] is True  # all bigrams singletons
    assert out[2]["dup_line_ratio"] == 0.5       # 2 of 4 lines repeat
    assert out[2]["dup_line_char_ratio"] == 0.4  # 16 of 40 chars
    assert out[2]["repetition_pass"] is False
    assert out[3]["top_bigram_char_ratio"] == 1.0  # 5x 'spam ham'
    assert out[3]["repetition_pass"] is False
    assert out[4]["n_lines"] == 0 and out[4]["repetition_pass"] is True
    assert out[5]["top_bigram_char_ratio"] == 0.25  # argmax by count


def test_pii_redaction(spark):
    """Progressive counts == placeholders in the redacted text; an
    email's digits are never re-matched (or double-counted) as
    phone/IP."""
    rows = [
        (1, "write to jane.doe+x@mail.example.org or call +44-207-946-0958"),
        (2, "server at 192.168.1.17 and 10.0.0.1, no contacts"),
        (3, "clean document with no identifiers at all"),
        # the overlap case from the counts contract: the dotted quad
        # inside the email is ONE email and ZERO IPs
        (4, "user1.2.3.4@example.com pinged 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in text.redact_pii_columns(df).collect()}
    assert (out[4]["n_emails"], out[4]["n_ips"]) == (1, 1)
    assert out[4]["redacted_text"] == "<EMAIL> pinged <IP>"
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) \
        == (1, 1, 0)
    assert "<EMAIL>" in out[1]["redacted_text"]
    assert "<PHONE>" in out[1]["redacted_text"]
    assert "jane.doe" not in out[1]["redacted_text"]
    assert out[2]["n_ips"] == 2 and out[2]["n_emails"] == 0
    assert out[2]["redacted_text"].count("<IP>") == 2
    assert out[3]["redacted_text"] == rows[2][1]  # untouched


def test_c4_clean_rules(spark):
    """C4 line filter: terminal punctuation + min words + javascript
    drop; page flags for lorem ipsum / curly braces."""
    from log_parser_spark.ops import cleaning
    rows = [
        (1, "This is a proper sentence with enough words.\n"
            "short line.\n"
            "no terminal punctuation on this long enough line\n"
            "Another good sentence follows right here today!\n"
            "Please enable javascript to view this page now."),
        (2, "Lorem ipsum dolor sit amet, consectetur adipiscing elit.\n"
            "A second real sentence lives right here today.\n"
            "And a third one closes out the document nicely."),
        (3, "function() { return 1; } is code not prose.\n"
            "But this line is a fine sentence with words.\n"
            "And here is another complete sentence to count.\n"
            "Plus one more full sentence for the minimum."),
        (4, "One good sentence is simply not enough here."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           cleaning.c4_clean_columns(df).collect()}
    # doc 1: 5 lines -> keep 2 (short, unterminated, javascript drop)
    assert (out[1]["n_lines_total"], out[1]["n_lines_kept"]) == (5, 2)
    assert "javascript" not in out[1]["cleaned_text"]
    assert out[1]["c4_keep"] is False  # only 2 sentences survive
    # doc 2: lorem ipsum page flag kills it despite 3 sentences
    assert out[2]["n_sentences"] >= 3
    assert out[2]["has_lorem_ipsum"] is True
    assert out[2]["c4_keep"] is False
    # doc 3: curly brace page flag
    assert out[3]["has_curly_brace"] is True and out[3]["c4_keep"] is False
    # doc 4: clean but under the sentence minimum
    assert out[4]["c4_keep"] is False and out[4]["n_lines_kept"] == 1


def test_deterministic_sampling(spark):
    """Hash-threshold sampling: per-key stable, partitioning-
    independent, stratum fractions approximately honored, and the
    decision is pure md5 (re-derivable outside Spark)."""
    import hashlib

    from log_parser_spark.ops import sampling
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept1 = {r["doc_id"] for r in sampling.deterministic_sample(
        df, "doc_id", 0.3, seed=9).collect()}
    kept2 = {r["doc_id"] for r in sampling.deterministic_sample(
        df.repartition(7), "doc_id", 0.3, seed=9).collect()}
    assert kept1 == kept2  # partitioning-independent
    assert 0.25 < len(kept1) / 2000 < 0.35
    # the keep decision is plain md5 — recompute one row by hand
    some = next(iter(kept1))
    h = hashlib.md5(f"{some}:9".encode()).hexdigest()[:8]
    assert h < sampling._threshold_hex(0.3)

    strat = sampling.stratified_sample(
        df, "lang", {"en": 0.5}, key="doc_id",
        default_fraction=0.05, seed=9).groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in strat}
    assert 400 < by_lang["en"] < 600      # ~50% of 1000
    assert 20 <= by_lang.get("de", 0) < 110  # ~5% of 1000

    # fraction=1.0 keeps the WHOLE stratum (the 9-char '100000000'
    # threshold bug kept only hashes starting with '0' — ~6.25%), and
    # fractions inside 2^-33 of 1.0 round up to full keep too
    assert sampling._threshold_hex(1.0) == "g"
    assert sampling._threshold_hex(1.0 - 2.0 ** -34) == "g"
    assert sampling._threshold_hex(0.0) == "00000000"
    full = sampling.stratified_sample(
        df, "lang", {"en": 1.0, "de": 0.25}, key="doc_id",
        default_fraction=0.0, seed=9).groupBy("lang").count().collect()
    by_lang_full = {r["lang"]: r["count"] for r in full}
    assert by_lang_full["en"] == 1000     # every en row kept
    assert 150 < by_lang_full["de"] < 350
    assert len({r for r in by_lang_full}) == 2
    # deterministic_sample at 1.0 via the threshold path (no guard)
    kept_all = sampling.stratified_sample(
        df, "lang", {}, key="doc_id", default_fraction=1.0,
        seed=9).count()
    assert kept_all == 2000

    # the DuckDB oracle shares _threshold_hex: pin that 'g' sorts
    # above every hex hash THERE too (the 9-char bug was invisible to
    # the cross-engine check precisely because both sides shared it)
    import duckdb
    con = duckdb.connect()
    n = con.execute(
        "SELECT count(*) FROM range(2000) t(i) "
        "WHERE substr(md5(i::VARCHAR || ':9'), 1, 8) < 'g'"
    ).fetchone()[0]
    assert n == 2000
    assert con.execute("SELECT 'ffffffff' < 'g'").fetchone()[0]


def test_temperature_mix_weights(spark):
    """n^alpha flattening: weights normalize to 1, the smaller stratum
    gets MORE than its proportional share, and the budgeted sampling
    fraction caps at 1.0 for strata needing upsampling."""
    from log_parser_spark.ops import sampling
    rows = ([(i, "big", 100) for i in range(900)]
            + [(i + 1000, "small", 100) for i in range(100)])
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
    out = {r["source"]: r for r in sampling.temperature_mix_weights(
        df, "source", "n_tok", alpha=0.5,
        token_budget=50_000).collect()}
    assert abs(out["big"]["weight"] + out["small"]["weight"] - 1) < 1e-6
    # proportional share would be 0.1; sqrt-temperature gives 0.25
    assert out["small"]["weight"] == 0.25
    assert out["big"]["weight"] == 0.75
    # budget 50k: small stratum needs 12500 of its 10000 tokens -> 1.0
    assert out["small"]["sample_fraction"] == 1.0
    assert abs(out["big"]["sample_fraction"]
               - round(50_000 * 0.75 / 90_000, 6)) < 1e-9


def test_connected_components(spark):
    """Min-label propagation over a mixed graph: a 4-chain, a pair,
    and a triangle resolve to their min-id components with correct
    sizes; convergence early-stops (chain diameter 3 < max_iters)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["a", "b"])
    out = {r["node"]: (r["component"], r["cluster_size"])
           for r in dedup.connected_components(edges).collect()}
    assert {out[n] for n in (1, 2, 3, 4)} == {(1, 4)}
    assert {out[n] for n in (10, 11)} == {(10, 2)}
    assert {out[n] for n in (20, 21, 22)} == {(20, 3)}
    assert len(out) == 9


def test_ngram_contamination(spark):
    """Decontamination semantics: a train doc sharing an 8-gram with
    the eval set is flagged with the exact collision count; clean docs
    and sub-8-token docs stay at zero; eval docs score 1.0 against
    themselves."""
    marker = "alpha beta gamma delta epsilon zeta eta theta iota"
    rows = [
        (1, f"some ordinary training text here today {marker}"),  # hit
        (2, "completely unrelated words that never collide with "
            "anything else in this corpus at all"),               # clean
        (3, "tiny doc"),                                          # <8 toks
        (100, marker),                                            # eval
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ev = df.filter(F.col("doc_id") >= 100)
    out = {r["doc_id"]: r for r in
           dedup.ngram_contamination(df, ev, k=8).collect()}
    # marker = 9 tokens -> 2 distinct 8-grams, both present in eval
    assert out[100]["n_shingles"] == 2
    assert out[100]["contamination_ratio"] == 1.0
    assert out[1]["n_contaminated"] == 2
    assert out[1]["is_contaminated"] is True
    assert 0 < out[1]["contamination_ratio"] < 1
    assert out[2]["n_contaminated"] == 0
    assert out[2]["is_contaminated"] is False
    assert out[3]["n_shingles"] == 0
    assert out[3]["contamination_ratio"] == 0.0


def test_boilerplate_paragraphs(spark):
    """A paragraph shared by >= min_doc_freq distinct docs is flagged;
    unique paragraphs never are, and repeats WITHIN one doc don't count
    toward the distinct-doc threshold."""
    footer = "all rights reserved"
    rows = [
        (1, f"unique one\n{footer}"),
        (2, f"unique two\n{footer}"),
        (3, f"unique three\n{footer}"),
        (4, "unique four\nrepeat me\nrepeat me\nrepeat me"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup.boilerplate_paragraphs(
        df, min_doc_freq=3).collect()}
    for d in (1, 2, 3):
        assert out[d]["n_boiler_paras"] == 1, d
        assert 0 < out[d]["boiler_char_ratio"] < 1
    # within-doc repetition is NOT inter-doc boilerplate
    assert out[4]["n_boiler_paras"] == 0
    assert out[4]["boiler_char_ratio"] == 0.0


# ----------------------------------------------------- round-6 ADVICE fixes

def test_connected_components_nonconvergence_raises(spark):
    """A component whose diameter exceeds the round budget must FAIL
    LOUDLY, not return partial labels: silently-unconverged output
    merge-splits dedup clusters (round-5 ADVICE, medium)."""
    # 6-chain: diameter 5, so max_iters=2 cannot converge
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], ["a", "b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, max_iters=2)
    # warn mode returns partial labels but emits RuntimeWarning
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = dedup.connected_components(
            edges, max_iters=2, on_nonconverged="warn")
        assert out.count() == 6
    # enough rounds: the same graph converges silently to one component
    ok = {r["component"] for r in
          dedup.connected_components(edges, max_iters=10).collect()}
    assert ok == {1}
    with pytest.raises(ValueError):
        dedup.connected_components(edges, on_nonconverged="explode")


def test_temperature_mix_empty_stratum_fraction_zero(spark):
    """A stratum with zero tokens must plan fraction 0.0 (nothing to
    draw), not the misleading 1.0 that null-skipping least() produced
    (round-5 ADVICE)."""
    from log_parser_spark.ops import sampling
    rows = ([(i, "full", 100) for i in range(100)]
            + [(i + 1000, "empty", 0) for i in range(10)])
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
    out = {r["source"]: r for r in sampling.temperature_mix_weights(
        df, "source", "n_tok", alpha=0.5, token_budget=100).collect()}
    assert out["empty"]["n_tokens"] == 0
    assert out["empty"]["weight"] == 0.0
    assert out["empty"]["sample_fraction"] == 0.0
    assert out["full"]["sample_fraction"] == 0.01
    # the DuckDB mirror shares the guard: 0-token stratum plans 0.0
    import duckdb
    con = duckdb.connect()
    got = con.execute(
        "SELECT CASE WHEN n > 0 THEN least(1.0, 100 * 0.5 / n) "
        "ELSE 0.0 END FROM (SELECT 0.0 AS n)").fetchone()[0]
    assert got == 0.0


def test_ann_recall_reports_zero_hit_probe_legs(spark):
    """Every PROBED n_probe setting must appear in the recall report —
    a leg with zero hits reports recall_at_k = 0.0 instead of silently
    dropping its row (round-5 ADVICE).  n_probe=0 probes no cells, so
    its leg is guaranteed empty."""
    from log_parser_spark.queries_ext import _recall_per_probe
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .select("vec_id", "embedding"))
    queries = emb.filter(F.col("vec_id") < 4)
    truth = similarity.brute_force_topk(emb, queries, k=3).select(
        "query_id", "neighbor_id")
    rows = {r["n_probe"]: r for r in _recall_per_probe(
        emb, queries, truth, k=3, n_centroids=8,
        probes=(0, 2)).collect()}
    assert set(rows) == {0, 2}
    assert rows[0]["n_hits"] == 0
    assert rows[0]["recall_at_k"] == 0.0
    assert rows[2]["n_hits"] > 0


def test_ngram_contamination_eval_join_guard(spark):
    """The eval-side broadcast is size-guarded: auto mode falls back to
    a shuffle semi-join above max_broadcast_eval_docs (a corpus-sized
    eval set must never be force-broadcast), and both strategies return
    identical results."""
    marker = "alpha beta gamma delta epsilon zeta eta theta iota"
    rows = [(1, f"some training text right here {marker}"),
            (2, "completely unrelated words that never collide with "
                "anything else at all today"),
            (100, marker)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ev = df.filter(F.col("doc_id") >= 100)
    want = sorted(map(tuple, dedup.ngram_contamination(
        df, ev, k=8, eval_join="broadcast").collect()))
    # auto + tiny threshold -> shuffle path; results identical
    got = sorted(map(tuple, dedup.ngram_contamination(
        df, ev, k=8, eval_join="auto",
        max_broadcast_eval_docs=0).collect()))
    assert got == want
    got2 = sorted(map(tuple, dedup.ngram_contamination(
        df, ev, k=8, eval_join="shuffle").collect()))
    assert got2 == want
    with pytest.raises(ValueError):
        dedup.ngram_contamination(df, ev, eval_join="maybe")
