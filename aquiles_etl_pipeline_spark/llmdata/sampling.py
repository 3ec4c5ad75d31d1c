"""Dataset splitting and decontamination for training-data pipelines.

Both operators are content/key-stable (no RNG state): reruns, retries,
and incremental appends land every document in the same split, and the
decontamination verdict depends only on document content — the
properties a 100 TB pipeline needs for reproducible dataset releases.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..numerics import pround
from .dedup import tokens


def _sha60(col: Column) -> Column:
    """Top 60 bits of sha256 as a non-negative BIGINT — the same
    SQL-twinnable hash family simhash uses (dedup.simhash):
    DuckDB twin is ``('0x' || substr(sha256(x),1,15))::BIGINT``."""
    return F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 15), 16, 10).cast("long")


DEFAULT_SPLIT_WEIGHTS = {"train": 96, "val": 2, "test": 2}


def assign_splits(
    df: DataFrame,
    weights: dict[str, int] | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by key hash.

    ``weights`` maps split name -> integer percent (must sum to 100);
    default 96/2/2.  The assignment is a pure projection on
    hash(key) % 100 — no sampling RNG, no shuffle, stable under
    appends and reruns (the reproducible-dataset-release property
    sampleBy's Bernoulli draws do not give you)."""
    weights = weights or DEFAULT_SPLIT_WEIGHTS
    bucket = F.pmod(_sha60(F.col(key_col)), F.lit(100))
    return df.select(
        key_col,
        bucket.alias("split_bucket"),
        _split_expr(bucket, weights).alias("split"),
    )


def _split_expr(bucket: Column, weights: dict[str, int]) -> Column:
    """bucket-in-[0,100) -> split-name CASE chain shared by the
    row-keyed and group-keyed split assigners."""
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100, got {weights}")
    expr: Column | None = None
    lo = 0
    for name, pct in weights.items():
        cond = bucket < F.lit(lo + pct)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += pct
    return expr


def group_holdout_split(
    df: DataFrame,
    group_col: str,
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Split assignment with GROUP integrity: the hash key is the
    group column (source/domain/site), so every row of a group lands
    in the SAME split.  This is the leakage defense a row-keyed split
    (``assign_splits``) cannot give: near-duplicate and templated
    documents cluster within a source, and splitting rows
    independently puts one copy in train and its twin in test,
    inflating eval scores.  Holding out whole groups keeps eval
    honestly out-of-distribution.

    Same determinism contract as ``assign_splits`` (sha-hash
    projection: no RNG, append/rerun-stable) and the same pure-map
    scale shape — no shuffle; the group key needs no aggregation
    because the hash is computed per row from the group VALUE.
    Returns the input columns plus (split_bucket, split)."""
    weights = weights or DEFAULT_SPLIT_WEIGHTS
    bucket = F.pmod(_sha60(F.col(group_col)), F.lit(100))
    return df.withColumn("split_bucket", bucket).withColumn(
        "split", _split_expr(bucket, weights)
    )


def benchmark_ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decontamination: flag training documents sharing any word n-gram
    with a benchmark/eval set (the standard n-gram-collision
    contamination test; n=8 is the common choice for eval leakage).

    Physical shape: both sides explode to distinct n-gram strings; the
    benchmark side is the small one by construction, so its n-gram set
    BROADCASTS and the check is a broadcast semi/left join — the
    training side never shuffles.  The gram projection is interpreted
    HOF work (no codegen), so the TRAINING side fans out across cores
    first (a no-op on a well-partitioned scan); the benchmark side is
    small by contract, where fan_out would always trigger a pointless
    repartition shuffle ahead of its distinct.
    Output: (id, n_overlapping_grams, contaminated)."""
    from ..partitioning import fan_out

    def grams(df: DataFrame) -> DataFrame:
        toks = tokens(text_col)
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        g = F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        )
        return df.select(F.col(id_col), F.explode(g).alias("_gram"))

    bench_grams = F.broadcast(grams(benchmark).select("_gram").distinct())
    hits = (
        grams(fan_out(docs))
        .join(bench_grams, "_gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlapping_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlapping_grams", F.lit(0)).alias("n_overlapping_grams"),
            (F.coalesce("n_overlapping_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard pretraining
    layout: documents are laid end-to-end in a deterministic order and
    the stream is cut into fixed ``budget_tokens`` chunks (documents may
    straddle a cut; the trainer masks across boundaries).  This operator
    computes each document's placement: its shard, its token offset in
    the shard's stream, the chunk its first token lands in, and whether
    it straddles a chunk boundary.

    Determinism/scale shape: shard = keyhash % n_shards and the
    within-shard order is (keyhash, id) — content-independent, stable
    under reruns, no RNG.  The whole operator is ONE hash-partitioned
    window (cumulative sum per shard): at corpus scale each shard's sort
    is distributed by the window exchange, and n_shards scales with the
    cluster so no single task ever sees more than corpus/n_shards
    tokens.  Output columns: (id, shard_id, n_tokens, start_offset,
    chunk_id, spans_chunks).
    """
    from pyspark.sql.window import Window

    from .dedup import tokens

    h = _sha60(F.col(id_col))
    base = df.select(
        F.col(id_col),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard_id"),
        h.alias("_ord"),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    # integer `div`, never floor(x / y): double division is only exact
    # to 53 mantissa bits, so at large per-shard cumulative token counts
    # the quotient can drift off the oracle's exact integer '//' (same
    # hazard class as the nanos->micros conversion in relational.catalog)
    b = int(budget_tokens)
    staged = base.select(
        id_col,
        "shard_id",
        "n_tokens",
        (cum - F.col("n_tokens")).cast("long").alias("start_offset"),
        (cum - 1).cast("long").alias("_last"),
    )
    return staged.select(
        id_col,
        "shard_id",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {b}").alias("chunk_id"),
        (F.expr(f"_last div {b}") > F.expr(f"start_offset div {b}")).alias("spans_chunks"),
    )


def stratified_sample(
    df: DataFrame,
    rates_bp: dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the corpus-mixture
    primitive (e.g. keep all English, half Spanish, 2% of a bulk
    crawl).  ``rates_bp`` maps stratum value -> keep rate in basis
    points of 10_000 (exact integers, so thresholds never hit float
    rounding); strata absent from the map are dropped (rate 0).

    A row is kept iff sha256(key) % 10000 < rate[stratum] — the same
    key-hash family as assign_splits, so the sample is a pure
    filter+projection: no RNG, no shuffle, stable under appends,
    reruns, and partial re-processing, and the kept set for a stratum
    at rate r is a SUBSET of the kept set at any rate > r (nested
    samples: raising a stratum's budget only adds documents, never
    swaps them — the property that makes ablation corpora comparable).
    """
    for stratum, bp in rates_bp.items():
        if not (0 <= bp <= 10_000):
            raise ValueError(f"rate for {stratum!r} must be in [0, 10000], got {bp}")
    bucket = F.pmod(_sha60(F.col(key_col)), F.lit(10_000))
    rate: Column = F.lit(0)
    for stratum, bp in rates_bp.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(bp)).otherwise(rate)
    return df.select(
        key_col, strata_col, bucket.alias("sample_bucket")
    ).where(F.col("sample_bucket") < rate)


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group token-budget selection: rank documents inside each
    group (deterministically, by id) and keep documents until the
    group's cumulative token count reaches ``budget_tokens`` — the
    data-mixing primitive that caps each domain's contribution to a
    training mix at N tokens.

    A document is kept iff the cumulative count INCLUDING it is within
    budget, so the mix slightly under-fills rather than overshoots
    (matching how published mixes describe their caps).

    Output: (id, group, n_tokens, cum_tokens, kept).

    Scale: one hash-partitioned running-sum window per group — state
    per partition is a single counter, skew bounded by the largest
    group (salt or pre-aggregate per-shard counts if one domain
    dominates a 100 TB mix).
    """
    from pyspark.sql.window import Window

    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        F.col(id_col), F.col(group_col), n_tokens.alias("n_tokens")
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w)).withColumn(
        "kept", F.col("cum_tokens") <= F.lit(budget_tokens)
    )


def length_buckets(
    df: DataFrame,
    n_buckets: int = 8,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batch assignment: within each group, rank
    documents by token count (id as deterministic tiebreak) and cut
    into ``n_buckets`` equal-frequency buckets with NTILE.

    Training loaders batch same-length sequences together to minimize
    padding waste; this emits the bucket id each document belongs to.
    Equal-frequency (not equal-width) buckets keep batch counts
    balanced regardless of the corpus length distribution.

    Output: (id, group, n_tokens, bucket).

    Scale: one window shuffle on ``group_col``.  NTILE needs the
    per-group total (one pass) but no global sort across groups; for a
    degenerate single-group 100 TB corpus, switch the caller to
    percentile-based cutpoints (approx_percentile) and a join, which
    avoids the single-partition window.
    """
    from pyspark.sql.window import Window

    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = Window.partitionBy(group_col).orderBy("n_tokens", id_col)
    return (
        df.select(F.col(id_col), F.col(group_col), n_tokens.alias("n_tokens"))
        .withColumn("bucket", F.ntile(n_buckets).over(w))
    )


def temperature_mixture_sample(
    df: DataFrame,
    target_docs: int,
    alpha_num: int = 1,
    alpha_den: int = 2,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted mixture sampling: allocate ``target_docs``
    across groups proportionally to count^alpha (alpha = alpha_num /
    alpha_den, default 1/2), then keep each group's allocation
    deterministically by content-hash rank.

    alpha < 1 is the multilingual-training upsampling rule (XLM-R's
    alpha=0.3, mT5's 0.5 style): it flattens the head and boosts
    low-resource groups relative to proportional sampling.

    Exactness discipline: the per-group quota is computed in INTEGER
    arithmetic end-to-end — weight_i = floor(cnt_i^alpha * 1e6) as a
    BIGINT (IEEE sqrt/pow are correctly rounded, so the floor is
    engine-independent), quota_i = target * weight_i // sum(weights).
    No double sums cross groups, so Spark's aggregation order can
    never flip a quota vs a serial oracle — the same 53-bit-mantissa
    discipline the nanos conversion and pack_sequences use.

    Selection inside a group is by sha256(id) rank — reproducible
    across runs/retries/engines, and appends only ever ADD candidates
    (a kept doc can be displaced only by a new lower-hash doc, never
    by reordering).

    Output: (id, group, hash_rank, group_quota, kept).

    Scale: the group-count aggregate is tiny (one row per group,
    broadcast back); ranking is one window shuffle on ``group_col``.
    """
    from pyspark.sql.window import Window

    if alpha_den == 2 and alpha_num == 1:
        weight = F.floor(F.sqrt(F.col("cnt").cast("double")) * 1e6).cast("long")
    else:
        weight = F.floor(
            F.pow(F.col("cnt").cast("double"), F.lit(alpha_num / alpha_den)) * 1e6
        ).cast("long")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("cnt")).withColumn(
        "weight", weight
    )
    total_w = counts.agg(F.sum("weight").alias("tw"))
    quotas = counts.crossJoin(F.broadcast(total_w)).select(
        group_col,
        "cnt",
        F.least(
            F.col("cnt"),
            F.expr(f"({target_docs} * weight) div tw"),
        ).alias("group_quota"),
    )
    w = Window.partitionBy(group_col).orderBy("_h", id_col)
    ranked = (
        df.select(F.col(id_col), F.col(group_col))
        .withColumn("_h", F.sha2(F.col(id_col).cast("string"), 256))
        .withColumn("hash_rank", F.row_number().over(w))
    )
    return (
        ranked.join(F.broadcast(quotas.drop("cnt")), on=group_col)
        .select(
            id_col,
            group_col,
            "hash_rank",
            "group_quota",
            (F.col("hash_rank") <= F.col("group_quota")).alias("kept"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking: split each document into
    fixed-size token windows with overlap — the context-window
    preparation pass for RAG ingestion and long-document training
    (overlap preserves cross-boundary context; stride =
    chunk - overlap).

    Output: (id, chunk_idx, chunk_text, n_tokens) — one row per
    window; the last window may be shorter.

    Scale: a pure generate-and-explode projection (sequence of window
    starts -> slice -> concat), zero shuffles and zero UDFs; output
    rows ~ tokens/stride per document, produced streaming inside the
    scan stage.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk size")
    stride = chunk_tokens - overlap_tokens
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens)).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - s).alias("n_tokens"),
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c")
    ).select(
        id_col, "chunk_idx", F.col("_c.chunk_text").alias("chunk_text"),
        F.col("_c.n_tokens").alias("n_tokens"),
    )


def dsir_importance_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 100,
) -> DataFrame:
    """DSIR-style importance-weighted data selection (Xie et al.,
    "Data Selection for Language Models via Importance Resampling",
    NeurIPS'23 — unigram-feature variant): score each RAW-pool document
    by how target-like its token distribution is,
    log w(d) = sum_t [ ln p_target(t) - ln p_raw(t) ], with Laplace
    smoothing over the union vocabulary, then keep the top_k docs by
    length-normalized weight (the deterministic selection counterpart
    of DSIR's Gumbel resampling — reproducible across engines/runs).

    Cross-engine exactness (the q86/q166 discipline): each per-token
    log-ratio is an identical ln expression over integer-count
    rationals, scaled to INTEGER MICROS before the per-doc sum, so the
    sum is exact bigint arithmetic in any order; the single division
    by token count happens once at the end and rounds to 6dp.

    Scale: token stats are vocab-grain (two partial-agg shuffles + a
    full-outer merge); the scoring join broadcasts the vocab table
    into the exploded raw-token stream (vocab << corpus; swap for a
    shuffle join past ~100M types), and the per-doc sum is one
    hash(id) partial agg.  No doc-sized arrays shuffle.
    """
    raw_toks = raw.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
    tgt_counts = (
        target.select(F.explode(tokens(text_col)).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_ct"))
    )
    raw_counts = raw_toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_cr"))
    vocab = tgt_counts.join(raw_counts, "_t", "full_outer").select(
        "_t",
        F.coalesce("_ct", F.lit(0)).alias("_ct"),
        F.coalesce("_cr", F.lit(0)).alias("_cr"),
    )
    # single-row totals: token mass per corpus + union vocab size
    tots = vocab.agg(
        F.sum("_ct").alias("_nt"),
        F.sum("_cr").alias("_nr"),
        F.count(F.lit(1)).alias("_v"),
    )
    scored_vocab = vocab.crossJoin(F.broadcast(tots)).select(
        "_t",
        F.round(
            (
                F.log((F.col("_ct") + F.lit(1.0)) / (F.col("_nt") + F.col("_v")))
                - F.log((F.col("_cr") + F.lit(1.0)) / (F.col("_nr") + F.col("_v")))
            )
            * F.lit(1e6)
        )
        .cast("bigint")
        .alias("_micros"),
    )
    per_doc = (
        raw_toks.join(F.broadcast(scored_vocab), "_t")
        .groupBy(id_col)
        .agg(
            F.sum("_micros").alias("_w"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    return (
        per_doc.select(
            id_col,
            "n_tokens",
            pround(F.col("_w").cast("double") / F.col("n_tokens") / F.lit(1e6), 6).alias(
                "avg_logratio"
            ),
        )
        .orderBy(F.col("avg_logratio").desc(), F.col(id_col))
        .limit(top_k)
    )
