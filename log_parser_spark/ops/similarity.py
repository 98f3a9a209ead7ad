"""Similarity search over embedding columns.

- brute-force cosine top-k (the correctness baseline; query side must be
  small/broadcastable)
- IVF-style bucketed ANN (the scale path: assign every vector to its
  nearest of K seed centroids, search only within the query's probe
  buckets)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y:
                                  x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


# Norm hoisting (round-7): cosine_col evaluates BOTH norms per PAIR,
# so a corpus row scored against 16 centroids folds its own norm 16x
# through the interpreted aggregate lambda.  The *_pre variants take
# norms precomputed once per row (hoisted into a projection BELOW the
# pairing join, where a projection boundary stops CollapseProject from
# re-inlining them) — numerically identical: the same fold produces
# the same double, hoisting only changes how often it runs.
def cosine_pre(a, b, na, nb):
    return _dot(a, b) / (na * nb)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     key: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side against the
    corpus, window-rank per query.  Deterministic tie-break on
    (sim desc, neighbor asc)."""
    q = (queries.select(F.col(key).alias("query_id"),
                        F.col(vec_col).alias("qv"))
         .withColumn("_qn", _norm(F.col("qv"))))
    # small parquet inputs arrive single-partition; spread the corpus so
    # the scoring crossJoin parallelizes
    c = (corpus.select(F.col(key).alias("neighbor_id"),
                       F.col(vec_col).alias("cv")).repartition(
        corpus.sparkSession.sparkContext.defaultParallelism, F.col(key))
        .withColumn("_cn", _norm(F.col("cv"))))
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine", F.round(
                  cosine_pre(F.col("qv"), F.col("cv"),
                             F.col("_qn"), F.col("_cn")), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def brute_force_topk_arrow(corpus: DataFrame, queries: DataFrame,
                           k: int = 5, key: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k with a VECTORIZED numpy scorer (mapInPandas):
    the wide-embedding alternative to brute_force_topk — codegen
    per-element lambdas (F.aggregate/zip_with) win at small dims, a
    single numpy matmul per Arrow batch wins as dims grow (~1000-d).

    The query side is collected to a (q x d) matrix and captured in the
    closure (same small-query-side contract as brute_force_topk); each
    corpus batch contributes its per-query top-k candidates, and a final
    window rank reduces them to the global top-k.  Results are
    identical to brute_force_topk (asserted in tests)."""
    import numpy as np

    q_rows = queries.select(key, vec_col).collect()
    q_ids = np.array([r[key] for r in q_rows])
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        import pandas as pd
        for pdf in batches:
            ids = np.asarray(pdf[key].values)
            mat = np.array(list(pdf[vec_col].values), dtype=np.float64)
            if len(mat) == 0:
                continue
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ q_norm.T  # (batch x q)
            top = min(k + 1, len(ids))  # +1: self-match dropped later
            # candidate emission fully vectorized: per-query column
            # argpartition, then one take_along_axis — no row loop
            if len(ids) > top:
                idx = np.argpartition(-sims, top - 1, axis=0)[:top]
            else:
                idx = np.tile(np.arange(len(ids))[:, None],
                              (1, len(q_ids)))
            cand = np.take_along_axis(sims, idx, axis=0)
            yield pd.DataFrame({
                "query_id": np.broadcast_to(q_ids[None, :],
                                            idx.shape).ravel(),
                "neighbor_id": ids[idx].ravel(),
                "cosine": np.round(cand, 6).ravel()})

    scored = corpus.select(key, vec_col).repartition(
        corpus.sparkSession.sparkContext.defaultParallelism,
        F.col(key)).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double")
    scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def _nearest_assignment(corpus, seeds, key, vec_col):
    corpus = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism,
        F.col(key)).withColumn("_vn", _norm(F.col(vec_col)))
    seeds = seeds.withColumn("_sn", _norm(F.col("centroid")))
    assigned = (corpus.crossJoin(F.broadcast(seeds))
                .withColumn("sim", cosine_pre(
                    F.col(vec_col), F.col("centroid"),
                    F.col("_vn"), F.col("_sn"))))
    # argmax as a combiner-friendly max_by instead of a sort window:
    # ordering struct (sim, -centroid_id) picks max sim with ties to
    # the SMALLEST centroid_id — exactly the old row_number orderBy
    # (sim desc, centroid_id asc) pick (struct comparison and sort use
    # the same NaN-greatest total order on doubles)
    best = assigned.groupBy(key).agg(F.max_by(
        F.struct(F.col(vec_col).alias("v"), F.col("centroid_id")),
        F.struct(F.col("sim"), (-F.col("centroid_id")).alias("nc")))
        .alias("_b"))
    return best.select(key, F.col("_b.v").alias(vec_col),
                       F.col("_b.centroid_id").alias("centroid_id"))


def ivf_assign(corpus: DataFrame, n_centroids: int = 16,
               key: str = "vec_id", vec_col: str = "embedding",
               n_iters: int = 1,
               refine_sample_rows: int = 1_000_000
               ) -> tuple[DataFrame, DataFrame]:
    """IVF bucketing: deterministic hash-seeded centroids + ``n_iters``
    Lloyd refinement rounds, all relational.  Returns
    (assignments, centroids).

    Seed selection is orderBy().limit(n) — Spark's distributed
    TakeOrdered (per-partition top-n, then a merge of n-row heaps on the
    driver side of the exchange).  A global Window.orderBy here would
    funnel the ENTIRE corpus through one task at 100 TB; the window
    below runs only over the n_centroids surviving rows.

    Lloyd refinement runs on a BOUNDED sample: centroid means are
    statistics, not assignments, so iterating over more than ~1M rows
    buys nothing — at 100 TB a full-corpus pass per iteration would
    dominate the whole build.  When the corpus exceeds
    ``refine_sample_rows``, refinement uses a seeded df.sample of about
    that many rows; the FINAL assignment is the only full-corpus pass
    regardless of n_iters.

    Each Lloyd round is one broadcast assignment + one posexplode mean
    per (centroid, dim); the recomputed centroid table (n_centroids x
    dim values) is collected driver-side — tiny by construction — and
    re-broadcast.  Centroids that lose all members keep their previous
    position."""
    spark = corpus.sparkSession
    hashed = corpus.select(
        F.col(vec_col).alias("centroid"),
        F.xxhash64(F.col(key).cast("string")).alias("_h"))
    topn = hashed.orderBy("_h").limit(n_centroids)
    w = Window.orderBy("_h")  # n_centroids rows only
    seeds = (topn.withColumn("centroid_id", F.row_number().over(w))
             .select("centroid_id", "centroid"))

    refine_src = corpus
    if n_iters > 0:
        n = corpus.count()  # one scan (parquet: footer metadata only)
        if n > refine_sample_rows:
            refine_src = corpus.sample(
                fraction=refine_sample_rows / n, seed=42)
        # keep the current centroid positions driver-side (n_centroids
        # rows — tiny) so each Lloyd round needs ONE action (the means
        # collect), not a second seeds.collect round-trip.  Collected
        # floats widen to double exactly as the previous in-plan
        # cast(float as double) did, so sims are bit-identical.
        prev = {r["centroid_id"]: [float(v) for v in r["centroid"]]
                for r in seeds.collect()}
        seeds = spark.createDataFrame(
            sorted(prev.items()), "centroid_id int, centroid array<double>")

    for _ in range(max(0, n_iters)):
        assignments = _nearest_assignment(refine_src, seeds, key, vec_col)
        means = (assignments
                 .select("centroid_id",
                         F.posexplode(vec_col).alias("dim", "v"))
                 .groupBy("centroid_id", "dim")
                 .agg(F.avg(F.col("v").cast("double")).alias("m")))
        rows = means.collect()  # n_centroids x dim values — tiny
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["centroid_id"], {})[r["dim"]] = r["m"]
        new_rows = []
        for cid, vec in prev.items():
            dims = by_cid.get(cid)
            if dims:
                vec = [float(dims[i]) for i in range(len(vec))]
            new_rows.append((cid, vec))
        prev = dict(new_rows)
        seeds = spark.createDataFrame(
            new_rows, "centroid_id int, centroid array<double>")

    assignments = _nearest_assignment(corpus, seeds, key, vec_col)
    return assignments, seeds


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4,
             key: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: search only the query's n_probe nearest centroid
    buckets.  Approximate but bucket-bounded — the 100 TB path."""
    assignments, seeds = ivf_assign(corpus, n_centroids, key, vec_col)

    q = (queries.select(F.col(key).alias("query_id"),
                        F.col(vec_col).alias("qv"))
         .withColumn("_qn", _norm(F.col("qv"))))
    q_probe = (q.crossJoin(F.broadcast(
        seeds.withColumn("_sn", _norm(F.col("centroid")))))
        .withColumn("sim", cosine_pre(F.col("qv"), F.col("centroid"),
                                      F.col("_qn"), F.col("_sn"))))
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                                F.col("centroid_id"))
    probes = (q_probe.withColumn("_r", F.row_number().over(wq))
              .filter(F.col("_r") <= n_probe)
              .select("query_id", "qv", "_qn", "centroid_id"))

    # broadcast the probe side (n_queries x n_probe rows — tiny by
    # construction): the corpus-sized assignments table then streams
    # through the join unshuffled instead of hash-partitioning on the
    # n_centroids-valued key (16 distinct values = guaranteed skew)
    cand = F.broadcast(probes).join(
        assignments.select(F.col(key).alias("neighbor_id"),
                           F.col(vec_col).alias("cv"), "centroid_id")
        .withColumn("_cn", _norm(F.col("cv"))),
        "centroid_id")
    scored = (cand.filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine", F.round(
                  cosine_pre(F.col("qv"), F.col("cv"),
                             F.col("_qn"), F.col("_cn")), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
