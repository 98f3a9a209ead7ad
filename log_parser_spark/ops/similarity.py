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


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     key: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side against the
    corpus, window-rank per query.  Deterministic tie-break on
    (sim desc, neighbor asc)."""
    q = queries.select(F.col(key).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(key).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine", F.round(cosine_col("qv", "cv"), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def ivf_assign(corpus: DataFrame, n_centroids: int = 16,
               key: str = "vec_id", vec_col: str = "embedding"
               ) -> tuple[DataFrame, DataFrame]:
    """IVF bucketing without iterative k-means: the vectors whose key
    hash is smallest serve as deterministic seed centroids; every vector
    is assigned to its nearest centroid via a broadcast join.  Returns
    (assignments, centroids).

    Seed selection is orderBy().limit(n) — Spark's distributed
    TakeOrdered (per-partition top-n, then a merge of n-row heaps on the
    driver side of the exchange).  A global Window.orderBy here would
    funnel the ENTIRE corpus through one task at 100 TB; the window
    below runs only over the n_centroids surviving rows."""
    hashed = corpus.select(
        F.col(vec_col).alias("centroid"),
        F.xxhash64(F.col(key).cast("string")).alias("_h"))
    topn = hashed.orderBy("_h").limit(n_centroids)
    w = Window.orderBy("_h")  # n_centroids rows only
    seeds = (topn.withColumn("centroid_id", F.row_number().over(w))
             .select("centroid_id", "centroid"))

    assigned = (corpus.crossJoin(F.broadcast(seeds))
                .withColumn("sim", cosine_col(vec_col, "centroid")))
    w2 = Window.partitionBy(key).orderBy(F.col("sim").desc(),
                                         F.col("centroid_id"))
    assignments = (assigned.withColumn("_r", F.row_number().over(w2))
                   .filter(F.col("_r") == 1)
                   .select(key, vec_col, "centroid_id"))
    return assignments, seeds


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4,
             key: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: search only the query's n_probe nearest centroid
    buckets.  Approximate but bucket-bounded — the 100 TB path."""
    assignments, seeds = ivf_assign(corpus, n_centroids, key, vec_col)

    q = queries.select(F.col(key).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    q_probe = (q.crossJoin(F.broadcast(seeds))
               .withColumn("sim", cosine_col("qv", "centroid")))
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                                F.col("centroid_id"))
    probes = (q_probe.withColumn("_r", F.row_number().over(wq))
              .filter(F.col("_r") <= n_probe)
              .select("query_id", "qv", "centroid_id"))

    cand = probes.join(
        assignments.select(F.col(key).alias("neighbor_id"),
                           F.col(vec_col).alias("cv"), "centroid_id"),
        "centroid_id")
    scored = (cand.filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine", F.round(cosine_col("qv", "cv"), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
