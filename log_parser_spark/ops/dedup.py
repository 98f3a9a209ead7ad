"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale posture: every variant is a shuffle-on-key groupBy/join — no
driver-side loops, no cross joins.  Candidate generation is always
bucketed (hash / LSH band / simhash prefix) so the pair space stays
linear in practice at 100 TB; only within-bucket pairs are compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from log_parser_spark.ops.text import tokens_col


def exact_dedup(df: DataFrame, key: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the
    representative (min key) and the duplicate count."""
    return (df.select(F.md5(F.col(text_col)).alias("content_hash"),
                      F.col(key))
            .groupBy("content_hash")
            .agg(F.min(key).alias("representative"),
                 F.count("*").alias("n_docs")))


def shingles_from_tokens(toks, k: int = 3):
    """Word k-gram shingles from a tokens ARRAY column (pure codegen).

    `toks` must be a MATERIALIZED column reference (stage it with
    withColumn first): the expression is referenced k+2 times per row,
    so passing a raw `split(...)` expression here would re-split the
    text on EVERY element access — measured 20x slower on the bigram
    path (higher-order functions are interpreted, not codegen'd, so
    Catalyst does not CSE the repeated child).

    Guarded for docs with < k tokens (Spark's sequence(1, 0) counts
    DOWN, so an unguarded transform would index out of bounds)."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    return F.when(
        F.size(toks) >= k,
        F.transform(idx, lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]))
    ).otherwise(F.array().cast("array<string>"))


def shingles_col(text_col: str = "text", k: int = 3):
    """Word k-gram shingles straight off a text column.  Convenience
    wrapper for single-use contexts; hot paths should stage the tokens
    array and use shingles_from_tokens (see its docstring)."""
    return shingles_from_tokens(tokens_col(text_col), k)


def ngram_contamination(docs: DataFrame, eval_docs: DataFrame,
                        key: str = "doc_id", text_col: str = "text",
                        k: int = 8, eval_join: str = "auto",
                        max_broadcast_eval_docs: int = 200_000
                        ) -> DataFrame:
    """Benchmark decontamination (the train/eval overlap check every
    pre-training pipeline runs before shipping data): per TRAIN
    document, how many of its distinct word ``k``-gram shingles also
    appear anywhere in the EVAL set, as counts and a ratio.  The
    standard published recipe is exact n-gram collision at k≈8-13
    (e.g. the GPT-3 appendix / open reproductions); any hit marks the
    training doc for audit or removal.

    Scale shape: the eval side of the join is the distinct shingle set
    of the BENCHMARK corpus — thousands of docs, not billions — so it
    broadcasts; the train side is explode -> broadcast-semi-probe ->
    groupBy(key), i.e. one map-side-combinable shuffle on the doc key
    and zero shuffles of shingle strings.  Shingles are md5-hashed
    before the join so both the broadcast set and the probe rows are
    fixed-width (and the DuckDB oracle reproduces the exact same keys;
    xxhash64 would differ between engines).

    The broadcast assumption is CHECKED, not assumed: with the default
    ``eval_join='auto'`` the eval-doc count is measured first, and an
    eval side above ``max_broadcast_eval_docs`` falls back to a plain
    (shuffle) semi-join — a silently-forced broadcast of a corpus-sized
    "eval set" would OOM the driver at 100 TB.  Pass
    ``eval_join='broadcast'`` or ``'shuffle'`` to skip the probe count
    and pin the strategy (broadcast keeps the zero-shingle-shuffle plan
    the test suite pins for benchmark-sized eval sets).

    Returns one row per train doc: (key, n_shingles, n_contaminated,
    contamination_ratio, is_contaminated)."""
    if eval_join not in ("auto", "broadcast", "shuffle"):
        raise ValueError(
            f"eval_join must be 'auto', 'broadcast' or 'shuffle', "
            f"got {eval_join!r}")
    if eval_join == "auto":
        eval_join = ("broadcast"
                     if eval_docs.count() <= max_broadcast_eval_docs
                     else "shuffle")
    # key-repartition FIRST (same rationale as minhash_signatures):
    # a small parquet input arrives single-partition and would run the
    # whole shingle explode on one task (measured 47 s -> ~2 s at
    # sf0.1), and the explicit count keeps AQE from re-coalescing this
    # small-bytes/heavy-compute stage; with the broadcast eval side the
    # groupBy(key) after the explode then needs no shingle-level
    # exchange at all
    n_out = docs.sparkSession.sparkContext.defaultParallelism
    toks = (docs.repartition(n_out, F.col(key))
            .withColumn("_toks", tokens_col(text_col)))
    ev_toks = eval_docs.withColumn("_toks", tokens_col(text_col))
    ev = (ev_toks.select(F.explode(F.array_distinct(
        shingles_from_tokens("_toks", k))).alias("_g"))
        .select(F.md5("_g").alias("h")).distinct()
        .withColumn("_hit", F.lit(1)))

    # ONE train-side pass (round 7; previously a probe pass + a
    # separate n_shingles pass + a doc-key join): explode the shingle
    # array INLINE in the same select that builds it (exploding a
    # previously-projected array column re-evaluates the HOF
    # construction per OUTPUT row — measured 47 s vs 0.8 s at sf0.1;
    # the Generate-side sibling of the HOF-no-CSE rule in PLANS.md),
    # as explode_OUTER so a zero-shingle doc keeps one NULL-shingle
    # row (null never joins, and count("h") skips it), then a LEFT
    # join against the distinct eval set and a single per-doc
    # aggregate: n_shingles = non-null shingle rows (== the distinct
    # set's size), n_contaminated = matched rows (ev is distinct, so
    # the left join cannot multiply rows).
    probe = toks.select(key, F.explode_outer(F.array_distinct(
        shingles_from_tokens("_toks", k))).alias("_g")) \
        .select(key, F.md5("_g").alias("h"))
    ev_side = F.broadcast(ev) if eval_join == "broadcast" else ev
    out = (probe.join(ev_side, "h", "left")
           .groupBy(key).agg(
               F.count("h").cast("int").alias("n_shingles"),
               F.count("_hit").cast("long").alias("n_contaminated")))
    return (out.withColumn(
        "contamination_ratio",
        F.round(F.col("n_contaminated")
                / F.greatest(F.col("n_shingles").cast("double"),
                             F.lit(1.0)), 6))
        .withColumn("is_contaminated", F.col("n_contaminated") > 0))


def connected_components(edges: DataFrame, a: str = "a", b: str = "b",
                         max_iters: int = 15,
                         on_nonconverged: str = "raise") -> DataFrame:
    """Connected components over an undirected candidate-pair graph —
    the step that turns near-dup PAIRS into dedup CLUSTERS (pick one
    representative per component; the published near-dedup pipelines
    all end with this).  Min-label propagation: every node starts as
    its own label; each round a node adopts the minimum label among
    itself and its neighbors; fixpoint = component = min node id.

    Returns (node, component, cluster_size).

    Scale posture: each round is one shuffle join on the node id plus
    one combinable groupBy-min, and the loop EARLY-STOPS on the first
    round with zero label changes (one cheap sum-aggregate action per
    round, see below — on near-dup graphs, whose components are small
    chains/cliques, convergence takes ~component-diameter rounds,
    typically 2-4).
    Labels are localCheckpoint()ed every round so the plan stays flat
    instead of growing once per iteration (lineage blowup is the
    classic iterative-Spark failure).

    Convergence is VERIFIED, not assumed: if the loop exhausts
    ``max_iters`` while labels are still changing (a component's
    diameter exceeds the round budget — adversarial long-path graphs),
    the result would silently merge-split components, so the default
    ``on_nonconverged='raise'`` raises RuntimeError; pass
    ``'warn'`` to instead get the partial labels
    plus a warnings.warn, for exploratory use only.  Raise max_iters,
    or swap in a star-contraction variant, if components with diameter
    > max_iters are expected; dedup graphs converge in a handful of
    rounds.  NOTE the bound must exceed the largest component diameter
    by ONE verification round: the loop only knows it converged when a
    round observes zero changes, so a graph that needs exactly
    max_iters productive rounds still raises (there was no budget left
    for the verifying round).

    Change detection is a cheap aggregate, not a join: every round
    takes each node's label to the MIN of itself and its neighbors, so
    labels are monotonically non-increasing and the label SUM strictly
    decreases until the fixpoint — comparing sums (exact, as
    decimal(38,0): no int64 overflow for any realistic id range)
    detects convergence with one combiner-friendly aggregation per
    round instead of a self-join + filter + count."""
    if on_nonconverged not in ("raise", "warn"):
        raise ValueError(
            f"on_nonconverged must be 'raise' or 'warn', "
            f"got {on_nonconverged!r}")
    if max_iters < 1:
        raise ValueError(
            f"max_iters must be >= 1 (a verification round is needed "
            f"even for a converged graph), got {max_iters}")
    ab = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    bidir = ab.unionByName(
        ab.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # lazy checkpoints throughout: blocks materialize inside the first
    # job that reads them (round 1's sum action), so the loop costs ONE
    # job per round and zero setup jobs, with the same lineage barriers
    bidir = bidir.distinct().localCheckpoint(eager=False)
    labels = (bidir.select(F.col("src").alias("node")).distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=False))

    def label_sum(lb):
        # exact decimal sum — the convergence certificate (docstring)
        return lb.agg(F.sum(F.col("component").cast("decimal(38,0)"))
                      .alias("s")).collect()[0]["s"]

    # no separate job for the initial sum: round 1 is always treated as
    # changed (with any a != b edge it IS — every node still holds its
    # own label; a degenerate self-loop-only graph just converges one
    # verification round later)
    prev_sum = None
    changed = 0
    for _ in range(max_iters):
        nbr = (bidir.join(labels, bidir["src"] == labels["node"])
               .select(F.col("dst").alias("node"), "component"))
        new = (labels.unionByName(nbr)
               .groupBy("node").agg(F.min("component").alias("component"))
               .localCheckpoint(eager=False))
        new_sum = label_sum(new)
        changed = 0 if new_sum == prev_sum else 1
        labels, prev_sum = new, new_sum
        if changed == 0:
            break
    if changed != 0:
        msg = (f"connected_components did not converge within "
               f"max_iters={max_iters}: labels still changing "
               f"(a component's diameter exceeds the round budget; raise "
               f"max_iters or use star contraction)")
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import warnings
        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "component").select(
        "node", "component", "cluster_size")


def minhash_signatures(df: DataFrame, key: str = "doc_id",
                       text_col: str = "text", num_perm: int = 16,
                       k: int = 3) -> DataFrame:
    """MinHash over word-k-gram shingles with `num_perm` xxhash64 seeds,
    entirely in built-in expressions: shingle -> explode -> groupBy(min).

    The input is key-repartitioned FIRST: (a) a small parquet input
    arrives as one partition and would serialize the whole shingle
    explode onto one task (the EXPLICIT partition count also keeps AQE
    from re-coalescing this small-bytes/heavy-compute shuffle to one
    partition); (b) shuffling texts by key up front means the
    groupBy(key) after the explode needs NO exchange of the (much
    larger) shingle rows — a text-level shuffle replaces a shingle-level
    one."""
    n_out = df.sparkSession.sparkContext.defaultParallelism
    sh = (df.select(key, text_col).repartition(n_out, F.col(key))
          .withColumn("_toks", tokens_col(text_col))
          .select(key, F.explode(
              F.array_distinct(shingles_from_tokens("_toks", k)))
              .alias("shingle")))
    aggs = [F.min(F.xxhash64(F.col("shingle"), F.lit(seed))).alias(
        f"mh_{seed}") for seed in range(num_perm)]
    return sh.groupBy(key).agg(*aggs)


def _drop_stats(buckets: DataFrame, max_bucket_size: int) -> DataFrame:
    """Accounting for the bucket cap: one row per DROPPED band bucket
    (band, bucket, bucket_size).  Lazy — evaluated only if the caller
    acts on it, so the default pairs path pays nothing extra."""
    return (buckets.groupBy("bb")
            .agg(F.count(F.lit(1)).alias("bucket_size"))
            .filter(F.col("bucket_size") > max_bucket_size)
            .select(F.col("bb.band").alias("band"),
                    F.col("bb.bucket").alias("bucket"), "bucket_size"))


def _cap_buckets(buckets: DataFrame, max_bucket_size: int) -> DataFrame:
    """Drop mega-buckets before the self-join (count via a
    partition-only window — one shuffle on the bucket key, which the
    self-join reuses)."""
    wb = Window.partitionBy("bb")
    return (buckets.withColumn("_bsz", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bsz") <= max_bucket_size).drop("_bsz"))


def _minhash_buckets(df: DataFrame, key: str, text_col: str,
                     num_perm: int, bands: int, k: int
                     ) -> tuple[DataFrame, DataFrame]:
    """(exact-dup star pairs, band-bucket rows) for the LSH pipeline.

    Exact duplicates are collapsed to one representative BEFORE
    signatures: identical docs share every band bucket, so leaving them
    in makes the within-bucket self-join quadratic in the duplicate
    count; instead each exact-dup member is re-attached as a linear
    star pair (representative, member, est_jaccard=1.0)."""
    rows = num_perm // bands

    hashed = df.select(key, text_col).withColumn(
        "_ch", F.md5(F.col(text_col)))
    reps = hashed.groupBy("_ch").agg(F.min(key).alias("_rep"))
    members = hashed.join(reps, "_ch")
    exact_pairs = (members.filter(F.col(key) != F.col("_rep"))
                   .select(F.col("_rep").alias("a"), F.col(key).alias("b"),
                           F.lit(1.0).alias("est_jaccard")))
    distinct_docs = members.filter(F.col(key) == F.col("_rep")).select(
        key, text_col)

    sig = minhash_signatures(distinct_docs, key, text_col, num_perm, k)

    band_cols = [F.xxhash64(*[F.col(f"mh_{b * rows + r}")
                              for r in range(rows)],
                            F.lit(b)).alias(f"band_{b}")
                 for b in range(bands)]
    sig = sig.select(key, *[F.col(f"mh_{i}") for i in range(num_perm)],
                     *band_cols)

    buckets = sig.select(
        key, F.array(*[F.col(f"mh_{i}") for i in range(num_perm)])
        .alias("sig"),
        F.explode(F.array(*[F.struct(
            F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket"))
            for b in range(bands)])).alias("bb"))
    return exact_pairs, buckets


def minhash_lsh_pairs(df: DataFrame, key: str = "doc_id",
                      text_col: str = "text", num_perm: int = 16,
                      bands: int = 8, k: int = 3,
                      max_bucket_size: int = 256,
                      with_drop_stats: bool = False,
                      dedup_pairs: bool = True):
    """LSH banding: signature -> band buckets -> within-bucket self-join.
    Returns candidate near-duplicate pairs (a < b) with the fraction of
    matching minhashes (est. Jaccard).

    Scale posture (100 TB dup-heavy crawl):
    - exact duplicates are collapsed to star pairs BEFORE signatures
      (see _minhash_buckets).
    - band buckets larger than ``max_bucket_size`` are dropped: they
      come from degenerate shingle sets (boilerplate) whose pair lists
      are inherently quadratic.  The cap bounds every within-bucket
      join at max_bucket_size^2 candidate rows.

    RECALL CONTRACT: dropping a bucket forfeits every candidate pair
    that shared ONLY that bucket — at web scale that is exactly the
    boilerplate-flood mass.  The drop is NOT silent: pass
    ``with_drop_stats=True`` to also get the accounting DataFrame
    (band, bucket, bucket_size) of every dropped bucket, and surface it
    per run (the `lsh_drop_accounting` driver query does).

    ``dedup_pairs=False`` skips the cross-band pair dedupe: a pair
    sharing several band buckets is then emitted once PER shared band
    (est_jaccard identical on every copy).  Only for consumers that
    de-duplicate downstream anyway — and usually NOT a win even then:
    true near-dup pairs share most bands (many copies each), and the
    dropDuplicates exchange doubles as the re-spread of the skewed
    bucket-join layout (measured at sf1.0: skipping it made the verify
    stage 2x SLOWER from stragglers).  Kept as an explicit knob so the
    tradeoff is documented, not rediscovered."""
    exact_pairs, raw_buckets = _minhash_buckets(
        df, key, text_col, num_perm, bands, k)
    buckets = _cap_buckets(raw_buckets, max_bucket_size)

    # true self-join (both sides the IDENTICAL plan, renamed only after
    # the join) with a SHUFFLE_HASH hint: the planner would otherwise
    # pick a broadcast join here, and a BroadcastExchange can never
    # reuse the stream side's plan — the whole shingle->minhash->band
    # pipeline then runs TWICE (build + stream).  With a shuffled join
    # both sides need the same hashpartitioning(bb) exchange that the
    # _cap_buckets window already established, so ReuseExchange
    # computes the pipeline once (A/B at sf1.0: 2.0 -> 1.7 s)
    x, y = buckets.alias("x"), buckets.alias("y").hint("shuffle_hash")
    pairs = (x.join(y, F.col("x.bb") == F.col("y.bb"))
             .filter(F.col(f"x.{key}") < F.col(f"y.{key}"))
             .select(F.col(f"x.{key}").alias("a"),
                     F.col(f"y.{key}").alias("b"),
                     F.col("x.sig").alias("sig_a"),
                     F.col("y.sig").alias("sig_b")))
    if dedup_pairs:
        pairs = pairs.dropDuplicates(["a", "b"])
    match_frac = (F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x_, y_: (x_ == y_).cast("int")),
        lambda v: v == 1)) / F.lit(num_perm)).cast("double")
    lsh_pairs = pairs.select("a", "b",
                             F.round(match_frac, 4).alias("est_jaccard"))
    out = lsh_pairs.unionByName(exact_pairs)
    if with_drop_stats:
        return out, _drop_stats(raw_buckets, max_bucket_size)
    return out


# Packed-vote SimHash: the per-bit +1/-1 vote sum only needs each bit's
# SET-count c and the token count n (vote sum = 2c - n, bit on iff
# 2c > n), so per token we pack 2 bit-indicators into each long as
# 32-bit lanes and SUM 32 packed longs instead of 64 vote columns — 2x
# narrower partial aggregates / shuffle rows, and ONE codegen branch
# (an earlier 16-bit variant union'd with an unpacked fallback compiled
# two full agg plans and lost more to compile time than it saved).
# Lanes can't carry into each other while every count < 2^32, and no
# ingestible document can reach 2^32 tokens: the parser's
# MAX_DOC_BYTES cap (1.9e9, the Arrow utf-8 cell ceiling,
# parsing/document.py) bounds tokens at < 2^31 — packing is
# unconditionally exact.
_SIMHASH_LANES = 2          # 32-bit counters per long
_SIMHASH_LANE_BITS = 32


def _simhash_from_counts(sums: DataFrame, key: str,
                         count_expr) -> DataFrame:
    """Reassemble the 64-bit simhash from per-bit set-counts.
    count_expr(i) -> Column of how many tokens had bit i set;
    column `n_tok` holds the token count."""
    sim = None
    for i in range(64):
        bit = F.when(count_expr(i) * 2 > F.col("n_tok"),
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long") if i < 63 else \
            F.when(bit == 1, F.lit(-(1 << 63)).cast("long")).otherwise(
                F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return sums.select(key, sim.alias("simhash"))


def _simhash_packed(toks: DataFrame, key: str) -> DataFrame:
    packed = []
    for j in range(64 // _SIMHASH_LANES):
        lane_sum = None
        for s in range(_SIMHASH_LANES):
            bit = _SIMHASH_LANES * j + s
            t = F.shiftleft(
                F.shiftrightunsigned(F.col("h"), bit).bitwiseAND(F.lit(1)),
                _SIMHASH_LANE_BITS * s)
            lane_sum = t if lane_sum is None else lane_sum + t
        packed.append(lane_sum.alias(f"pk_{j}"))
    votes = toks.select(key, *packed)
    sums = votes.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[F.sum(f"pk_{j}").alias(f"pk_{j}")
          for j in range(64 // _SIMHASH_LANES)])

    def count_expr(i):
        j, s = divmod(i, _SIMHASH_LANES)
        return F.shiftrightunsigned(
            F.col(f"pk_{j}"), _SIMHASH_LANE_BITS * s).bitwiseAND(
            F.lit((1 << _SIMHASH_LANE_BITS) - 1))

    return _simhash_from_counts(sums, key, count_expr)


def _simhash_unpacked(toks: DataFrame, key: str) -> DataFrame:
    votes = toks.select(
        key, *[(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)))
               .alias(f"bit_{i}") for i in range(64)])
    sums = votes.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[F.sum(f"bit_{i}").alias(f"bit_{i}") for i in range(64)])
    return _simhash_from_counts(sums, key, lambda i: F.col(f"bit_{i}"))


def simhash(df: DataFrame, key: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """SimHash(64): explode tokens, vote per bit (packed 32-bit lanes —
    unconditionally exact, see the packing note above), reassemble.
    Key-repartitioned first for the same reasons as
    minhash_signatures."""
    n_out = df.sparkSession.sparkContext.defaultParallelism
    toks = (df.select(key, text_col).repartition(n_out, F.col(key))
            .select(key, F.explode(tokens_col(text_col)).alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    return _simhash_packed(toks, key)


def simhash_pairs(df: DataFrame, key: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3,
                  max_bucket_size: int = 256,
                  with_drop_stats: bool = False):
    """SimHash near-dup pairs via banded Hamming join: split the 64-bit
    simhash into (max_hamming + 1) bands — by pigeonhole, two hashes
    within ``max_hamming`` bits share at least one band EXACTLY — bucket
    on (band, value), self-join within buckets (ReuseExchange like the
    minhash join), then filter by the true bit_count of the XOR.
    Bucket-capped for the same boilerplate-flood reason as minhash, with
    the SAME recall contract: pass ``with_drop_stats=True`` for the
    (band, bucket, bucket_size) accounting of every dropped bucket."""
    nb = max_hamming + 1
    width = 64 // nb
    sh = simhash(df, key, text_col)

    def band(i):
        shift = i * width
        w = 64 - shift if i == nb - 1 else width
        mask = -1 if w >= 64 else (1 << w) - 1
        return F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned("simhash", shift).bitwiseAND(F.lit(mask))
            .alias("bucket"))

    raw_buckets = sh.select(key, "simhash", F.explode(F.array(
        *[band(i) for i in range(nb)])).alias("bb"))
    buckets = _cap_buckets(raw_buckets, max_bucket_size)

    # shuffle-hash for the same ReuseExchange reason as minhash_lsh_pairs
    x, y = buckets.alias("x"), buckets.alias("y").hint("shuffle_hash")
    pairs = (x.join(y, F.col("x.bb") == F.col("y.bb"))
             .filter(F.col(f"x.{key}") < F.col(f"y.{key}"))
             .select(F.col(f"x.{key}").alias("a"),
                     F.col(f"y.{key}").alias("b"),
                     F.col("x.simhash").alias("sh_a"),
                     F.col("y.simhash").alias("sh_b"))
             .dropDuplicates(["a", "b"]))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    out = (pairs.withColumn("hamming", hamming.cast("int"))
           .filter(F.col("hamming") <= max_hamming)
           .select("a", "b", "hamming"))
    if with_drop_stats:
        return out, _drop_stats(raw_buckets, max_bucket_size)
    return out


def ngram_jaccard(df_pairs: DataFrame, left_text: str, right_text: str,
                  k: int = 3):
    """Jaccard similarity of word-k-gram shingle sets for pre-paired rows
    (candidate pairs come from a bucketing stage, never a cross join).
    Shingle sets are staged once per side (see shingles_from_tokens)."""
    staged = df_pairs.withColumns({
        "_ta": tokens_col(left_text),
        "_tb": tokens_col(right_text),
    }).withColumns({
        "_sa": F.array_distinct(shingles_from_tokens("_ta", k)),
        "_sb": F.array_distinct(shingles_from_tokens("_tb", k)),
    }).drop("_ta", "_tb")
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    union = F.size(F.array_union("_sa", "_sb")).cast("double")
    return staged.withColumn(
        "jaccard",
        F.round(F.when(union > 0, inter / union).otherwise(0.0), 6)
    ).drop("_sa", "_sb")


def ngram_jaccard_by_id(pairs: DataFrame, docs: DataFrame,
                        key: str = "doc_id", text_col: str = "text",
                        k: int = 3, a: str = "a", b: str = "b",
                        docs_join: str = "auto",
                        max_broadcast_docs: int = 2_000_000) -> DataFrame:
    """Exact word-k-gram Jaccard for candidate pairs that reference
    documents BY ID — the verify stage of the LSH near-dup pipelines.

    ngram_jaccard (the pre-paired-texts variant) re-tokenizes and
    re-shingles BOTH texts once per pair, which is quadratic redundancy
    when candidate generation emits many pairs per document: at sf1.0
    the pipeline query's 10.07M LSH candidates over 50k docs re-shingled
    every doc ~400x (~78 s of a 86 s query).  Here the distinct shingle
    set is computed ONCE per document (one row per doc, guide §8:
    decide with small rows), attached to each pair side by id, and the
    per-pair work drops to one array_intersect of two prebuilt sets.

    Join strategy is CHECKED, not assumed (the ngram_contamination
    pattern): with ``docs_join='auto'`` the doc count is probed first
    and the per-doc shingle table broadcasts only when it is small
    enough to hold in executor memory; above ``max_broadcast_docs`` it
    falls back to two shuffle joins on the pair-side ids, which stays
    linear at 100 TB.  Pass ``'broadcast'``/``'shuffle'`` to pin.

    Returns the pair rows + ``jaccard``, numerically IDENTICAL to
    ngram_jaccard: |sa n sb| / |sa u sb| over distinct shingle sets
    (union via |sa| + |sb| - |sa n sb| — equal because both sides are
    distinct), rounded to 6; pairs of shingle-less docs score 0.0."""
    if docs_join not in ("auto", "broadcast", "shuffle"):
        raise ValueError(
            f"docs_join must be 'auto', 'broadcast' or 'shuffle', "
            f"got {docs_join!r}")
    if docs_join == "auto":
        docs_join = ("broadcast" if docs.count() <= max_broadcast_docs
                     else "shuffle")
    n_out = docs.sparkSession.sparkContext.defaultParallelism
    # the shingle stage is deliberately NOT checkpointed between the
    # two pair sides: materializing 1 KB shingle arrays per doc costs
    # more than the second tokenize pass saves (A/B measured at sf1.0:
    # 12.9-13.3 s with a lazy checkpoint vs 11.3-12.9 s without)
    sh = (docs.select(key, text_col).repartition(n_out, F.col(key))
          .withColumn("_toks", tokens_col(text_col))
          .select(key, F.array_distinct(
              shingles_from_tokens("_toks", k)).alias("_s")))
    sa = sh.select(F.col(key).alias(a), F.col("_s").alias("_sa"))
    sb = sh.select(F.col(key).alias(b), F.col("_s").alias("_sb"))
    if docs_join == "broadcast":
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    # stage the intersection size as its own column so it is computed
    # once per pair (it feeds both the ratio and the union term)
    staged = (pairs.join(sa, a).join(sb, b)
              .withColumn("_inter", F.size(F.array_intersect("_sa", "_sb"))
                          .cast("double")))
    union = (F.size("_sa") + F.size("_sb")).cast("double") - F.col("_inter")
    return (staged.withColumn(
        "jaccard",
        F.round(F.when(union > 0, F.col("_inter") / union)
                .otherwise(0.0), 6))
        .drop("_sa", "_sb", "_inter"))


def boilerplate_paragraphs(docs: DataFrame, key: str = "doc_id",
                           text_col: str = "text",
                           min_doc_freq: int = 3) -> DataFrame:
    """Inter-document boilerplate detection (the cross-doc complement
    of the per-doc Gopher/C4 filters): a paragraph (non-blank line)
    appearing in >= ``min_doc_freq`` DISTINCT documents is boilerplate
    (navigation, footers, cookie banners).  Returns one row per doc:
    paragraph counts and the char fraction boilerplate covers.

    Scale shape (round 7: ONE explode pass, and paragraph TEXT never
    shuffles): explode paragraphs once and immediately reduce to the
    compact per-(doc, paragraph-hash) aggregate (occurrence count +
    char sum — a mega-frequent footer is a combiner group, linear).
    Everything downstream — the distinct-doc frequency, the per-doc
    rollup, the boilerplate rollup — reads that lazily-checkpointed
    compact table, so the doc->paragraph expansion is computed once
    (the old shape re-evaluated it three times and semi-joined full
    paragraph strings by hash).  Values are unchanged: doc_freq is the
    row count per hash of a per-(doc, hash) table, and the per-doc
    sums of per-(doc, hash) counts/chars equal the flat counts/sums."""
    from log_parser_spark.ops.text import NON_WS_CLASS
    paras = (docs.select(key, F.explode(
        F.filter(F.split(F.col(text_col), r"\n"),
                 lambda ln: ln.rlike(NON_WS_CLASS))).alias("para"))
        .select(key, F.md5("para").alias("ph"),
                F.length("para").alias("_len")))
    per_doc_hash = (paras.groupBy(key, "ph")
                    .agg(F.count(F.lit(1)).alias("_n"),
                         F.sum("_len").alias("_chars"))
                    .localCheckpoint(eager=False))
    boiler_phs = (per_doc_hash.groupBy("ph")
                  .agg(F.count(F.lit(1)).alias("doc_freq"))
                  .filter(F.col("doc_freq") >= min_doc_freq)
                  .select("ph"))
    per_doc = (per_doc_hash.groupBy(key).agg(
        F.sum("_n").alias("n_paras"),
        F.sum("_chars").alias("_chars")))
    per_doc_boiler = (per_doc_hash.join(boiler_phs, "ph", "left_semi")
                      .groupBy(key).agg(
                          F.sum("_n").alias("n_boiler_paras"),
                          F.sum("_chars").alias("_boiler_chars")))
    out = (per_doc.join(per_doc_boiler, key, "left")
           .select(key, "n_paras",
                   F.coalesce("n_boiler_paras", F.lit(0))
                   .alias("n_boiler_paras"),
                   F.round(F.coalesce("_boiler_chars", F.lit(0))
                           / F.greatest("_chars", F.lit(1)), 6)
                   .alias("boiler_char_ratio")))
    return out


def hyperplane_buckets(emb: DataFrame, key: str = "vec_id",
                       vec_col: str = "embedding",
                       n_bands: int = 8) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign pattern over
    n_bands pseudo-random hyperplanes).

    Weights use pmod, NOT %: Spark's % keeps the dividend's sign, so
    (h % 1000) / 500 - 1 would span (-3, 1) with mean -1 — every
    hyperplane tilted into the negative orthant, collapsing non-negative
    embeddings into ONE bucket and degenerating the within-bucket join
    into a full cross join.  pmod keeps the weights symmetric in [-1, 1).
    """
    emb = emb.withColumn("_dim", F.size(F.col(vec_col)))

    def sign_bit(b):
        prod = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(F.sequence(F.lit(1), F.col("_dim")),
                            lambda i: F.pmod(F.xxhash64(i, F.lit(b)),
                                             F.lit(1000))
                            .cast("double") / 500.0 - 1.0),
                lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, v: acc + v)
        return F.when(prod >= 0, 1).otherwise(0)

    return emb.withColumn(
        "bucket", F.concat_ws("", *[sign_bit(b).cast("string")
                                    for b in range(n_bands)])).drop("_dim")


def embedding_cosine_dedup(emb: DataFrame, key: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.95,
                           n_bands: int = 8,
                           max_bucket_size: int = 256,
                           with_drop_stats: bool = False):
    """Near-dup by embedding cosine: random-hyperplane LSH signs bucket
    candidates, exact cosine filters within buckets.

    Scale posture (same contract as minhash_lsh_pairs / simhash_pairs):
    with only 2^n_bands sign patterns, anisotropic real-world embeddings
    concentrate into FEW patterns, so a degenerate bucket would make the
    within-bucket self-join quadratic.  Buckets larger than
    ``max_bucket_size`` are therefore dropped, bounding every bucket's
    pair list at max_bucket_size^2 — and the drop is NOT silent: pass
    ``with_drop_stats=True`` for the (band, bucket, bucket_size)
    accounting of every dropped bucket (band is always 0 here — a
    hyperplane signature is ONE bucket per vector, not an OR over
    bands).  At 100 TB also scale n_bands ~ log2(n_vecs /
    max_bucket_size) so the expected bucket occupancy stays under the
    cap for isotropic mass; the cap catches the anisotropic rest."""
    sig = hyperplane_buckets(emb, key, vec_col, n_bands).select(
        key, F.col(vec_col).alias("_v"),
        F.struct(F.lit(0).alias("band"),
                 F.col("bucket").alias("bucket")).alias("bb"))
    buckets = _cap_buckets(sig, max_bucket_size)

    # true self-join (both sides the IDENTICAL plan, renamed only after
    # the join), shuffle-hash so ReuseExchange computes the signature
    # pipeline once (see minhash_lsh_pairs)
    x, y = buckets.alias("x"), buckets.alias("y").hint("shuffle_hash")
    pairs = (x.join(y, F.col("x.bb") == F.col("y.bb"))
             .filter(F.col(f"x.{key}") < F.col(f"y.{key}"))
             .select(F.col(f"x.{key}").alias("a"),
                     F.col(f"y.{key}").alias("b"),
                     F.col("x._v").alias("va"),
                     F.col("y._v").alias("vb")))

    dot = F.aggregate(F.zip_with("va", "vb",
                                 lambda x_, y_: x_.cast("double") * y_.cast("double")),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform("va", lambda x_: x_.cast("double") * x_.cast("double")),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda x_: x_.cast("double") * x_.cast("double")),
                            F.lit(0.0), lambda acc, v: acc + v))
    out = (pairs.withColumn("cosine", F.round(dot / (na * nb), 6))
           .filter(F.col("cosine") >= threshold)
           .select("a", "b", "cosine"))
    if with_drop_stats:
        return out, _drop_stats(sig, max_bucket_size)
    return out
