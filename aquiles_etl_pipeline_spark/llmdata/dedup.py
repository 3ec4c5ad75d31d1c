"""Deduplication operators for large-scale training-data pipelines.

All four flavors are built from native DataFrame ops (no Python UDFs in
any hot path):

  exact        — sha256 hash-groupBy (uniform shuffle keys; THE pattern
                 for exact dedup at 100 TB)
  minhash LSH  — word-shingles → k minhashes via seeded xxhash64 →
                 banded bucket join → candidates verified with exact
                 Jaccard.  Shuffle volume is O(docs × bands), never
                 O(docs²).
  simhash      — 64-bit sign-of-weighted-bit-sums fingerprint; near-dups
                 share fingerprints (or differ in few bits)
  n-gram Jaccard — exact token-set Jaccard via token-inverted-index
                 self-join (the verifiable baseline the sketches
                 approximate)

Design notes for 100 TB: joins and shuffles carry only ids and 64-bit
keys (never doc-sized arrays), hash keys are uniform so no skew salting
is needed, and the LSH band join replaces the quadratic pair
enumeration that kills naive dedup.  String/regex work stays in native
expressions; dense numeric kernels (the k-permutation minhash) run as
Arrow-batched numpy, which beats interpreted higher-order expressions
by orders of magnitude — per-row Python UDFs appear nowhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import fan_out


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One survivor per distinct text: deterministic min-id winner."""
    h = F.sha2(F.col(text_col), 256)
    keep = (
        df.groupBy(h.alias("_h"))
        .agg(F.min(id_col).alias(id_col))
        .drop("_h")
    )
    return df.join(keep, id_col, "left_semi")


def tokens(text_col: str) -> F.Column:
    """Lowercased whitespace tokens (the corpus is space-delimited word
    soup; a BPE-ish regex tokenizer lives in textstats)."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as an array<string> column."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(grams)


def _minhash_multipliers(num_hashes: int) -> np.ndarray:
    """Deterministic odd uint64 multipliers: each is a bijection on
    Z_2^64 (multiply-shift hash family, the same two-level scheme Spark
    MLlib's MinHashLSH uses over one base hash)."""
    rng = np.random.RandomState(0xA17)
    return (np.frombuffer(rng.bytes(num_hashes * 8), dtype=np.uint64) | np.uint64(1)).copy()


def shingle_codes_and_minhash(
    text_col: str, shingle_n: int = 3, num_hashes: int = 32
) -> F.Column:
    """tokenize -> distinct word n-gram shingles -> 64-bit shingle codes
    (blake2b-8) -> k minhashes, fused into ONE Arrow-batched UDF pass.

    Returns struct(codes: array<long>, mh: array<long>).  The fused
    kernel exists because the expression route evaluates higher-order
    array lambdas interpreted, per element: per-gram slice() makes
    shingling O(n^2) per doc, and hashing shingle strings k times adds
    k allocating hashes per gram.  One Python batch pass does the
    string work in C (str.split / str.join / hashlib) and the k
    permutations as a numpy broadcast multiply.  Shingle-set Jaccard
    over the codes equals Jaccard over the strings up to 64-bit
    collisions (~n^2/2^64)."""
    from hashlib import blake2b

    from pyspark.sql.functions import pandas_udf

    mult = _minhash_multipliers(num_hashes)

    @pandas_udf("codes: array<long>, mh: array<long>")
    def _f(texts: pd.Series) -> pd.DataFrame:
        codes_out, mh_out = [], []
        for t in texts:
            toks = (t or "").lower().strip().split()
            if not toks:
                toks = [""]  # parity with split('\\s+') on empty text
            grams = {
                " ".join(toks[i : i + shingle_n])
                for i in range(max(len(toks) - shingle_n + 1, 1))
            }
            codes = np.fromiter(
                (
                    int.from_bytes(blake2b(g.encode(), digest_size=8).digest(), "little")
                    for g in grams
                ),
                dtype=np.uint64,
                count=len(grams),
            )
            m = (mult[:, None] * codes[None, :]).min(axis=1)
            codes_out.append(codes.view(np.int64))
            mh_out.append(m.view(np.int64))
        return pd.DataFrame({"codes": codes_out, "mh": mh_out})

    return _f(F.col(text_col))


def _pair_shingle_jaccard(shingle_n: int):
    """Arrow-batched exact shingle-set Jaccard over candidate text
    pairs.  Shingling parity with shingle_codes_and_minhash (same
    tokenizer, same short-doc fallback) but compares shingle STRINGS,
    matching the SQL oracle exactly.  NULL when the union is empty."""
    from pyspark.sql.functions import pandas_udf

    def _grams(t: str) -> set[str]:
        toks = (t or "").lower().strip().split() or [""]
        return {
            " ".join(toks[i : i + shingle_n])
            for i in range(max(len(toks) - shingle_n + 1, 1))
        }

    @pandas_udf("double")
    def _j(ta: pd.Series, tb: pd.Series) -> pd.Series:
        # None (-> SQL NULL), never NaN: Spark orders NaN ABOVE every
        # number, so a NaN jaccard would pass >= threshold filters
        out: list[float | None] = []
        for a, b in zip(ta, tb):
            ga, gb = _grams(a), _grams(b)
            union = len(ga | gb)
            out.append(len(ga & gb) / union if union else None)
        return pd.Series(out, dtype="Float64")

    return _j


def bucket_pairs(
    buckets: DataFrame, elems_col: str = "_ids", out_a: str = "id_a", out_b: str = "id_b"
) -> DataFrame:
    """Within-bucket unordered pair expansion, expression-only.

    Replaces the classic LSH bucket SELF-JOIN: two branches of one join
    over the same sketch pipeline do NOT get their exchange reused by
    AQE when a Python UDF sits below (measured: the kernel runs once
    per branch), while a single groupBy needs the pipeline exactly
    once.  Pair output is identical — Θ(Σ bucket²) rows either way; the
    only new constraint is that one bucket's elements sit in one task,
    which is the LSH contract anyway (buckets are small by design; run
    exact_dedup first if mass-identical documents could flood a
    bucket).

    Input rows: (..., elems_col: array).  Output: one row per unordered
    element pair (a < b by sort order), columns named out_a/out_b.
    """
    s = F.array_sort(F.col(elems_col))
    combos = F.flatten(
        F.transform(
            s,
            lambda x, i: F.transform(
                F.slice(s, i + 2, F.size(s)),
                lambda y: F.struct(x.alias(out_a), y.alias(out_b)),
            ),
        )
    )
    return buckets.select(F.explode(combos).alias("_p")).select(f"_p.{out_a}", f"_p.{out_b}")


def band_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band_id, band_hash) LSH band rows — the 16-bytes-per-band
    grain that both the batch pair miner (minhash_lsh_candidates) and
    the PERSISTED near-dup index (incremental_near_dups) operate on.
    Only these three columns ever flow through the explode/joins;
    shuffling doc-sized shingle arrays x bands is the naive-LSH trap.

    fan_out: a small corpus read from one file arrives as a single
    partition, serializing the CPU-bound kernel onto one core; a
    well-partitioned production scan passes through with NO shuffle.
    """
    rows_per_band = num_hashes // bands
    minhashed = fan_out(df).select(
        F.col(id_col),
        shingle_codes_and_minhash(text_col, shingle_n, num_hashes)["mh"].alias("_mh"),
    )
    band_cols = [
        F.xxhash64(*[F.col("_mh")[b * rows_per_band + r] for r in range(rows_per_band)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = minhashed.select(id_col, *band_cols)
    return banded.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_id"), F.col(f"band_{b}").alias("band_hash"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band_id", "bb.band_hash")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) from banded minhash.

    bands=8 × rows=4 at threshold ~0.5 Jaccard.  Scale: docs are hashed
    to (band, band_hash) buckets; only same-bucket docs pair — via ONE
    uniform-key groupBy (bucket_pairs), never an O(n²) stage.

    Materialization discipline (sweep hygiene): NO persist().  The
    minhash kernel has exactly ONE consumer (the band pipeline), so it
    runs exactly once with nothing left cached when the query finishes.
    (The old formulation persisted the kernel output and joined the
    shingle-code arrays back for verification; dropping the persist
    splits consumers into differently-pruned plans that each re-run the
    kernel — Catalyst column pruning makes the exchanges canonically
    unequal, so AQE cannot reuse them.)  Verification instead joins the
    (small) candidate pair set back to the raw text — broadcast pair
    probes, text never shuffles — and computes exact STRING shingle-set
    Jaccard in one Arrow-batched kernel over candidate rows only, which
    is both faster than interpreted array expressions and exactly the
    oracle's semantics (no 64-bit shingle-code collision caveat).
    """
    stacked = band_signature(df, text_col, id_col, num_hashes, bands, shingle_n)
    buckets = (
        stacked.groupBy("band_id", "band_hash")
        .agg(F.collect_list(id_col).alias("_ids"))
        .where(F.size("_ids") >= 2)
    )
    pairs = bucket_pairs(buckets).dropDuplicates(["id_a", "id_b"])
    ta = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_text_a"))
    tb = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_text_b"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            _pair_shingle_jaccard(shingle_n)(F.col("_text_a"), F.col("_text_b")).alias(
                "jaccard"
            ),
        )
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    **kw,
) -> DataFrame:
    """Drop near-duplicates: for every verified pair above threshold the
    larger id loses.  (Greedy min-id survivorship — transitive chains
    collapse to their min member after iterating; one pass suffices for
    the pair-level contract.)"""
    pairs = minhash_lsh_candidates(df, text_col, id_col, **kw).where(
        F.col("jaccard") >= threshold
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def _bitmap_jaccard_pairs(
    toks: DataFrame, vocab: list[str], id_col: str, threshold: float
) -> DataFrame:
    """Dense-regime exact Jaccard: token sets as packed 64-bit words,
    |a ∩ b| = sum of popcount(word_a & word_b) in a broadcast
    nested-loop self-join.  Per-pair cost is a handful of AND+popcounts
    in codegen — no postings shuffle, no array compares."""
    spark = toks.sparkSession
    n_words = (len(vocab) + 63) // 64
    ids = spark.createDataFrame(
        [(t, i) for i, t in enumerate(vocab)], f"tok: string, _idx: int"
    )
    word_aggs = [
        F.bit_or(
            F.when(
                (F.col("_idx") >= w * 64) & (F.col("_idx") < (w + 1) * 64),
                F.expr(f"shiftleft(1L, _idx - {w * 64})"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias(f"_w{w}")
        for w in range(n_words)
    ]
    masks = (
        toks.join(F.broadcast(ids), "tok")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tok"), *word_aggs)
    )
    a = masks.select(
        F.col(id_col).alias("id_a"),
        F.col("n_tok").alias("n_a"),
        *[F.col(f"_w{w}").alias(f"_wa{w}") for w in range(n_words)],
    )
    b = masks.select(
        F.col(id_col).alias("id_b"),
        F.col("n_tok").alias("n_b"),
        *[F.col(f"_w{w}").alias(f"_wb{w}") for w in range(n_words)],
    )
    inter = sum(
        F.bit_count(F.col(f"_wa{w}").bitwiseAND(F.col(f"_wb{w}"))) for w in range(n_words)
    )
    j = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", j.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60) -> DataFrame:
    """SimHash fingerprints: token hash → per-bit ±1 votes weighted by
    token frequency → sign, packed into a BIGINT.

    Token hash is the top 60 bits of sha256 (first 15 hex chars parsed
    base-16) — chosen over xxhash/blake2b because it has an exact ANSI
    SQL twin (``('0x' || substr(sha256(tok),1,15))::BIGINT``), which
    puts the whole fingerprint under the DuckDB oracle gate (catalog
    q26/q35); 60 bits also stays positive in two's-complement, so
    band/xor math needs no unsigned gymnastics on either engine.

    One fused Arrow-batch kernel per doc (hashlib token codes + a numpy
    bit-matrix vote), replacing the explode-shuffle + 60 aggregate
    expressions formulation: the shuffle carried every token occurrence
    and the 60-way conditional sum dominated the profile while the
    actual math is a (tokens x 60) matmul-shaped reduction."""
    assert 1 <= bits <= 60, "bits must fit the 15-hex-digit sha256 prefix"
    from hashlib import sha256

    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(bits, dtype=np.uint64)
    weights = np.uint64(1) << shifts

    @pandas_udf("long")
    def _fp(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = (t or "").lower().strip().split() or [""]
            uniq, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            codes = np.fromiter(
                (int(sha256(g.encode()).hexdigest()[:15], 16) for g in uniq),
                dtype=np.uint64,
                count=len(uniq),
            )
            bitm = (codes[:, None] >> shifts[None, :]) & np.uint64(1)
            votes = ((2 * bitm.astype(np.int64) - 1) * cnt[:, None]).sum(axis=0)
            out[i] = (weights * (votes > 0).astype(np.uint64)).sum()
        return pd.Series(out.view(np.int64))

    return fan_out(df).select(
        F.col(id_col), _fp(F.col(text_col)).alias("simhash")
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 60,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded like LSH
    (Manku et al., WWW'07): split the fingerprint bits into
    `max_hamming + 1` blocks — by pigeonhole any pair within the radius
    shares at least one exact block → join per block, verify with
    popcount.  No O(n²) stage, and (unlike probabilistic LSH) EXACT:
    every pair within the radius is found, which is what lets the
    catalog declare a pure-SQL all-pairs oracle for it (q35).
    Scale note: selectivity is a full block's bits, so small radii
    (the production setting, ≤3 → 15-bit blocks) stay cheap; large
    radii shrink blocks and loosen the bucketing — fine for validation
    runs, not the 100 TB path."""
    num_blocks = min(bits, max_hamming + 1)
    base, extra = divmod(bits, num_blocks)
    widths = [base + 1 if b < extra else base for b in range(num_blocks)]
    starts = [sum(widths[:b]) for b in range(num_blocks)]
    # No persist and no join at all: the fingerprint is one BIGINT, so
    # it rides into the block bucket as a struct field and pairs expand
    # in-bucket (bucket_pairs) — the hashing kernel runs exactly once
    # and nothing stays cached after the query (sweep hygiene).
    fps = simhash(df, text_col, id_col, bits=bits)
    blocks = fps.select(
        id_col,
        "simhash",
        *[
            F.shiftrightunsigned("simhash", starts[b])
            .bitwiseAND(F.lit((1 << widths[b]) - 1))
            .alias(f"blk_{b}")
            for b in range(num_blocks)
        ],
    )
    stacked = blocks.select(
        F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("fp")).alias("_e"),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("blk_id"), F.col(f"blk_{b}").alias("blk_val"))
                for b in range(num_blocks)
            ])
        ).alias("bb"),
    ).select("_e", "bb.blk_id", "bb.blk_val")
    buckets = (
        stacked.groupBy("blk_id", "blk_val")
        .agg(F.collect_list("_e").alias("_es"))
        .where(F.size("_es") >= 2)
    )
    # struct sort orders by id first, so pair order is (id_a < id_b)
    p = bucket_pairs(buckets, elems_col="_es", out_a="ea", out_b="eb")
    hamming = F.bit_count(F.col("ea.fp").bitwiseXOR(F.col("eb.fp")))
    return (
        p.select(
            F.col("ea.id").alias("id_a"),
            F.col("eb.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    bitmap_vocab_limit: int = 256,
) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs — the verifiable baseline
    for the sketch methods.  SQL-expressible, so it carries a DuckDB
    oracle in the catalog.  Adaptive physical strategy:

    * tiny vocabulary (<= bitmap_vocab_limit distinct tokens): every
      token set packs into a few 64-bit words; Jaccard becomes popcount
      bit-math in a broadcast nested-loop self-join.  This is the dense
      regime — when 30 tokens generate the corpus, a large fraction of
      ALL pairs qualifies, the output is Theta(n^2), and postings joins
      only add shuffle on top of that unavoidable quadratic output.
    * general vocabulary: prefix filtering (Bayardo et al., WWW'07
      "Scaling Up All Pairs Similarity Search").  A naive postings
      self-join is quadratic in hot tokens (every pair of docs sharing
      "the" is enumerated).  Prefix filtering is EXACT, not a heuristic:
      order every doc's tokens by global rarity (doc-frequency asc); a
      pair with Jaccard >= t must overlap in >= ceil(t*n) tokens, so
      each doc need only emit its first n - ceil(t*n) + 1 rarest tokens
      into the join and no qualifying pair is missed.  Hot tokens almost
      never land in a prefix, so postings lists stay short — the
      100 TB-safe formulation.  Candidates are verified with the full
      exact intersection.

    Both plans compute jaccard with the identical double expression, so
    the strategy switch is invisible to results.
    """
    eps = 1e-9  # slack so float ceil/mul never over-prunes a boundary pair
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )
    vocab = [
        r["tok"]
        for r in toks.select("tok").distinct().limit(bitmap_vocab_limit + 1).collect()
    ]
    if len(vocab) <= bitmap_vocab_limit:
        return _bitmap_jaccard_pairs(toks, sorted(vocab), id_col, threshold)
    doc_freq = toks.groupBy("tok").agg(F.count("*").alias("_df"))
    docs = (
        toks.join(doc_freq, "tok")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct(F.col("_df"), F.col("tok")))).alias("_s"))
        .select(
            F.col(id_col),
            F.transform("_s", lambda s: s["tok"]).alias("_toks"),
            F.size("_s").alias("n_tok"),
        )
    )
    prefix_len = (
        F.col("n_tok") - F.ceil(F.col("n_tok") * threshold - eps) + 1
    ).cast("int")
    posts = docs.select(
        id_col, "n_tok", F.explode(F.slice("_toks", F.lit(1), prefix_len)).alias("tok")
    )
    a = posts.select(F.col(id_col).alias("id_a"), F.col("n_tok").alias("n_a"), "tok")
    b = posts.select(F.col(id_col).alias("id_b"), F.col("n_tok").alias("n_b"), "tok")
    # length filter: jaccard <= min/max, so qualifying pairs have
    # min >= t*max — prunes before the dedup shuffle
    cand = (
        a.join(b, "tok")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.least("n_a", "n_b") >= F.greatest("n_a", "n_b") * threshold - eps)
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ta = docs.select(F.col(id_col).alias("id_a"), F.col("_toks").alias("_ta"), F.col("n_tok").alias("n_a"))
    tb = docs.select(F.col(id_col).alias("id_b"), F.col("_toks").alias("_tb"), F.col("n_tok").alias("n_b"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    j = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", j.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def _checkpoint_helpers(spark):
    """(truncate, release) pair implementing the iterative-plan
    discipline shared by both connected-components variants: every
    round's frame is checkpointed (reliable checkpoint when the session
    has a checkpoint dir, else eager localCheckpoint) so the logical
    plan stays a leaf scan, and superseded rounds' storage blocks are
    released explicitly by RDD id."""
    sc = spark.sparkContext

    def _persistent_ids() -> set[int]:
        jmap = sc._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    def release(ids: set[int]) -> None:
        jmap = sc._jsc.getPersistentRDDs()
        for k in jmap.keySet().toArray():
            if int(k) in ids:
                jmap.get(k).unpersist(False)

    def truncate(df: DataFrame) -> tuple[DataFrame, set[int]]:
        if sc.getCheckpointDir() is not None:
            # reliable checkpoint: data lives in the checkpoint dir, not
            # block storage; file cleanup is the cleaner conf's job
            return df.checkpoint(eager=True), set()
        before = _persistent_ids()
        out = df.localCheckpoint(eager=True)
        return out, _persistent_ids() - before

    return truncate, release


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Distributed connected components by min-label propagation with
    pointer jumping: every round each node takes the minimum label over
    {itself, its neighbors} (one edge-keyed shuffle join + one node-keyed
    min agg), then follows its label's OWN label one hop (a labels⋈labels
    self-join) — so label information travels 2^round hops and the loop
    converges in O(log diameter) rounds, not O(diameter).  Stops at the
    first round that changes no label.  Returns (node id, component_id)
    where component_id is the smallest node id in the component.

    Iterative-plan discipline (the part that actually matters at any
    scale): each round's labels frame is CHECKPOINTED, not just cached.
    ``persist()`` alone truncates recomputation but NOT the logical plan —
    round N's plan nests all N-1 prior rounds, and Catalyst/AQE
    re-analysis of that growing tree turns round 8 into minutes of
    driver-side planning (measured: 1.5s/round → 268s/round by round 7
    on a 190k-edge graph).  ``localCheckpoint(eager=True)`` cuts the
    plan back to a leaf scan every round, keeping per-round cost flat.
    When the session has a reliable checkpoint dir configured
    (``sparkContext.setCheckpointDir``), the fault-tolerant
    ``checkpoint()`` is used instead — the right choice on a real
    cluster where executor loss must not kill a 20-round job.
    Driver involvement per round is ONE empty-check on the changed-label
    frame (no label data ever collects).

    Storage discipline: a superseded round's localCheckpoint blocks are
    released EXPLICITLY (tracked by RDD id and unpersisted once the next
    round is materialized and the changed-check has run) — without this
    every round's label frame stays pinned for the whole loop, the
    executor-storage growth the checkpointing was meant to avoid.  Only
    the FINAL labels frame remains materialized (the caller consumes
    it); its blocks are released by Spark's ContextCleaner when the
    frame is dropped.  On the reliable-checkpoint path the session conf
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` (set by
    session.get_spark) makes superseded checkpoint FILES GC-collectable.
    """
    spark = edges.sparkSession
    _truncate, _release = _checkpoint_helpers(spark)

    sym = edges.select(
        F.col(src_col).alias("_n"), F.col(dst_col).alias("_m")
    ).union(edges.select(F.col(dst_col).alias("_n"), F.col(src_col).alias("_m")))
    sym, sym_ids = _truncate(sym)
    labels, label_ids = _truncate(
        nodes.select(F.col(id_col).alias("_n"), F.col(id_col).alias("_comp"))
    )
    try:
        for _ in range(max_iter):
            nbr = sym.join(
                labels.select(F.col("_n").alias("_m"), "_comp"), "_m"
            ).select("_n", "_comp")
            stage1 = labels.union(nbr).groupBy("_n").agg(F.min("_comp").alias("_comp"))
            # pointer jump: follow _comp to ITS label (every label is a
            # node id, so the inner self-join never drops rows); doubles
            # the propagation distance per round
            jumped = stage1.join(
                stage1.select(F.col("_n").alias("_comp"), F.col("_comp").alias("_cc")),
                "_comp",
            ).select("_n", F.least("_comp", "_cc").alias("_comp"))
            new_labels, new_ids = _truncate(jumped)
            changed = (
                new_labels.select("_n", F.col("_comp").alias("_new"))
                .join(labels, "_n")
                .where(F.col("_new") != F.col("_comp"))
            )
            done = changed.isEmpty()
            _release(label_ids)
            labels, label_ids = new_labels, new_ids
            if done:
                break
    finally:
        _release(sym_ids)
    return labels


def connected_components_star(
    edges: DataFrame,
    nodes: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    id_col: str = "doc_id",
    max_iter: int = 25,
    driver_cc_max_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contractions (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC 2014) — the edge-CONTRACTING alternative to
    ``connected_components``'s label propagation.

    Small-graph fast path: once the (deduped, oriented) edge set is
    materialized, its size is known exactly; at or below
    ``driver_cc_max_edges`` the components come from a driver-side
    union-find (union-by-min, path compression) instead of the
    distributed rounds.  Same runtime-strategy reasoning as AQE's
    broadcast switch: each contraction round costs a fixed 2 Spark
    jobs x ~6 shuffle stages of pure scheduling — seconds of overhead
    to move kilobytes — while a million-edge union-find is
    milliseconds on the driver and its label table re-enters the plan
    as an ordinary (broadcastable) join side.  Above the bound the
    distributed contraction runs unchanged; results are identical by
    construction (union-by-min keeps each set's root at its minimum
    id) and property-tested against the distributed path.

    Why it wins on dedup graphs: near-duplicate clusters are
    near-CLIQUES (k docs from one template mine ~k^2/2 pairs).  Label
    propagation re-joins the full static edge set every round, paying
    the k^2 term each time; one large-star round collapses a clique to
    a star (every larger member re-points at the clique minimum, and
    dropDuplicates folds the k^2 emissions to ~k edges), so every
    subsequent round runs on an edge set about the size of the NODE
    set.  Convergence is O(log n) rounds in the worst case and 2-3
    rounds on clique-heavy graphs; per-round shuffles shrink
    geometrically instead of staying O(edges).

    Per round (all edges oriented larger->smaller, deduped):
      large-star: per node u, m = min(N(u) + {u}); every neighbor
        v > u re-points to m (emit (v, m)).
      small-star: per node u over its smaller neighbors, m = min;
        emit (v, m) for each smaller neighbor plus (u, m).
    Both emit only (bigger, smaller) pairs, preserve connectivity, and
    never lose the component minimum.  Terminal state: perfect
    min-rooted stars, detected exactly as [no left node has two
    distinct neighbors] AND [no left node appears as a root] — two
    tiny aggregations on the contracted set, no full-set compare.

    Same checkpoint/storage discipline and same return contract as
    ``connected_components`` ((node, component min) for every node in
    ``nodes``, singletons self-labeled); property-tested equal to it.
    The final contracted edge set stays materialized until the caller
    drops the returned frame (ContextCleaner then drains its blocks —
    the hygiene-test contract).
    """
    spark = edges.sparkSession
    _truncate, _release = _checkpoint_helpers(spark)

    raw = edges.select(
        F.col(src_col).alias("_a"), F.col(dst_col).alias("_b")
    ).where(F.col("_a") != F.col("_b"))
    e, e_ids = _truncate(
        raw.select(
            F.greatest("_a", "_b").alias("_u"), F.least("_a", "_b").alias("_v")
        ).dropDuplicates()
    )
    # the checkpoint above already materialized e, so this count reads
    # cached blocks — it replaces (and subsumes) the isEmpty probe
    n_edges = e.count()
    if 0 < n_edges <= driver_cc_max_edges:
        from pyspark.sql.types import StructField, StructType

        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for row in e.collect():
            ra, rb = find(row["_u"]), find(row["_v"])
            if ra != rb:
                # union-by-min: the smaller id stays root, so every
                # final root IS its component's minimum id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        labels = sorted((n, find(n)) for n in parent.keys() | set(parent.values()))
        dt = e.schema["_u"].dataType
        # route through pandas: createDataFrame(list-of-tuples) pickles
        # per row (seconds at ~2M labels), while the pandas path rides
        # Arrow — keeping the fast path fast near the edge bound
        import pandas as pd

        lab_df = spark.createDataFrame(
            pd.DataFrame(labels, columns=["_n", "_comp"]),
            StructType([StructField("_n", dt), StructField("_comp", dt)]),
        )
        _release(e_ids)
        return (
            nodes.select(F.col(id_col).alias("_n"))
            .join(lab_df, "_n", "left")
            .select("_n", F.coalesce("_comp", F.col("_n")).alias("_comp"))
        )
    converged = n_edges == 0  # all singletons: terminal before any round
    for _ in range(0 if converged else max_iter):
        # large star: every v > u re-points at u's neighborhood min
        sym = e.union(e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v")))
        mins = (
            sym.groupBy("_u")
            .agg(F.min("_v").alias("_mn"))
            .select("_u", F.least("_mn", "_u").alias("_m"))
        )
        ls = (
            sym.join(mins, "_u")
            .where(F.col("_v") > F.col("_u"))
            .select(F.col("_v").alias("_u"), F.col("_m").alias("_v"))
            .where(F.col("_u") != F.col("_v"))
            .dropDuplicates()
        )
        # small star: smaller-neighbor lists re-point at their min
        mins2 = ls.groupBy("_u").agg(F.min("_v").alias("_m"))
        ss = (
            ls.join(mins2, "_u")
            .select(F.col("_v").alias("_x"), F.col("_m").alias("_y"))
            .union(mins2.select(F.col("_u").alias("_x"), F.col("_m").alias("_y")))
            .where(F.col("_x") != F.col("_y"))
            .select(F.col("_x").alias("_u"), F.col("_y").alias("_v"))
            .dropDuplicates()
        )
        new_e, new_ids = _truncate(ss)
        # terminal iff perfect stars: no node with two distinct
        # neighbors (edges are deduped, so per-u edge count IS distinct
        # degree) and no node that is both a leaf and a root — ONE
        # aggregation job over the contracted set, driver sees one bool
        tagged = new_e.select(
            F.col("_u").alias("_id"), F.lit(1).alias("_l"), F.lit(0).alias("_r")
        ).union(
            new_e.select(F.col("_v").alias("_id"), F.lit(0).alias("_l"), F.lit(1).alias("_r"))
        )
        bad = (
            tagged.groupBy("_id")
            .agg(F.sum("_l").alias("_nl"), F.max("_r").alias("_anyr"))
            .where((F.col("_nl") > 1) | ((F.col("_nl") >= 1) & (F.col("_anyr") == 1)))
        )
        converged = bad.isEmpty()
        _release(e_ids)
        e, e_ids = new_e, new_ids
        if converged:
            break
    if not converged:
        # unlike label propagation (whose max_iter exit still yields one
        # — possibly suboptimal — label per node), a non-terminal star
        # state has nodes appearing as _u in MULTIPLE edges, and the
        # final left join would fan out to duplicate (node, component)
        # rows; refuse loudly rather than break the one-row-per-node
        # contract.  max_iter=25 covers any real graph (O(log n) rounds).
        raise RuntimeError(
            "connected_components_star: star contraction did not reach the"
            f" terminal state within max_iter={max_iter} rounds; raise"
            " max_iter (convergence needs O(log n) rounds)"
        )
    members = e.select(F.col("_u").alias("_n"), F.col("_v").alias("_comp"))
    roots = (
        e.select(F.col("_v").alias("_n"))
        .distinct()
        .select("_n", F.col("_n").alias("_comp"))
    )
    return (
        nodes.select(F.col(id_col).alias("_n"))
        .join(members.union(roots), "_n", "left")
        .select("_n", F.coalesce("_comp", F.col("_n")).alias("_comp"))
    )


def dedup_clusters(
    df: DataFrame,
    threshold: float = 0.95,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate cluster assignment: mine exact token-Jaccard
    pairs at ``threshold`` (ngram_jaccard_pairs — prefix-filtered, no
    all-pairs scan), then union-find them into components and elect the
    minimum id as each cluster's canonical document — the keep-one-
    per-cluster step that turns pairwise dedup verdicts into an actual
    training-set filter.  Singleton documents are their own canonical.

    Output: (id, component_id, cluster_size, is_canonical).

    Scale: EXACT-duplicate collapse runs first — docs with identical
    token SETS have identical set-Jaccard neighborhoods, so each
    identical-set group enters pair mining as ONE representative (the
    group's min id) and expands back afterwards.  This is lossless for
    the result (the group min is also each expanded component's
    candidate min, so component ids, sizes, and canonicals are
    unchanged — property-tested) and removes the k^2/2 intra-group
    pairs plus the k1*k2 cross-group pair multiplicity BEFORE they are
    ever materialized: on a dup-heavy corpus the mined edge set shrinks
    by orders of magnitude, which is the difference between a CC input
    that fits a round and one that doesn't at 100 TB.  Mining on the
    representatives stays prefix-filter-bounded; components use the
    large-star/small-star contraction (near-dup clusters are
    near-cliques, which contract to stars in one round, so the loop's
    shuffles shrink geometrically instead of re-joining the full k^2
    edge set); the size join is label-keyed and AQE-broadcastable when
    clusters are few.
    """
    # identical-token-set signature: tokens are whitespace-split so they
    # never contain the join separator; sha2 keeps the shuffled key
    # fixed-width even for long vocabularies.  NULL-text docs must NOT
    # collapse: concat_ws(NULL) is '' (never NULL), which would merge
    # them with empty-text docs and each other, while pair mining emits
    # no rows for a NULL token array — so they stay singletons with a
    # per-doc signature, matching the pre-collapse semantics exactly.
    toks = tokens(text_col)
    sig = F.when(
        toks.isNotNull(),
        F.sha2(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))), 256),
    ).otherwise(F.concat(F.lit("null-text:"), F.col(id_col).cast("string")))
    m = df.select(F.col(id_col), sig.alias("_sig"))
    reps = m.groupBy("_sig").agg(F.min(id_col).alias("_rep"))
    mapping = m.join(reps, "_sig").select(F.col(id_col).alias("_doc"), "_rep")
    rep_rows = df.join(
        reps.select(F.col("_rep").alias(id_col)), id_col, "left_semi"
    )
    edges = ngram_jaccard_pairs(
        rep_rows, text_col=text_col, id_col=id_col, threshold=threshold
    ).select("id_a", "id_b")
    rep_labels = connected_components_star(
        edges, rep_rows.select(id_col), id_col=id_col
    )
    labels = mapping.join(
        rep_labels, mapping["_rep"] == rep_labels["_n"]
    ).select(F.col("_doc").alias("_n"), "_comp")
    sizes = labels.groupBy("_comp").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "_comp").select(
        F.col("_n").alias(id_col),
        F.col("_comp").alias("component_id"),
        "cluster_size",
        (F.col("_n") == F.col("_comp")).alias("is_canonical"),
    )


def chunk_dedup(
    df: DataFrame,
    chunk_tokens: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-document exact dedup: split each document into fixed-size
    token chunks, drop every chunk whose text already appeared earlier
    in the corpus (first occurrence by (id, chunk_idx) wins), and
    reassemble the surviving text — the paragraph/chunk-granularity
    dedup step of web-scale corpus pipelines (boilerplate and quoted
    passages recur across documents that are NOT near-duplicates as a
    whole, so document-level dedup misses them).

    Output: (id, n_chunks, n_kept, clean_text).

    Scale: two shuffles — a window keyed by chunk text to rank global
    first occurrence, then a groupBy(id) to reassemble.  Both carry
    one chunk of text per row (never whole documents), so skew is
    bounded by chunk size; the reassembly state per document is its
    own chunk list.  No UDFs — whole plan is codegen'd.
    """
    from pyspark.sql.window import Window

    toks = tokens(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunk_ids = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    chunked = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                chunk_ids,
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
                ),
            )
        ).alias("chunk_idx", "chunk_text"),
    )
    w = Window.partitionBy("chunk_text").orderBy(id_col, "chunk_idx")
    ranked = chunked.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_rn") == 1,
                                F.struct("chunk_idx", "chunk_text"),
                            )
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental-crawl snapshot diff: classify every document id
    across two corpus snapshots as ``added`` / ``deleted`` /
    ``changed`` / ``unchanged`` by normalized-content fingerprint
    (the same sha256 family q23 uses for change detection).

    The recrawl-scheduling primitive: a 100 TB refresh pipeline
    processes only added+changed documents downstream, so this diff is
    the gate that turns a full-corpus pass into an incremental one.

    Output: (id, status, old_sha, new_sha).

    Scale: fingerprints reduce each side to (id, 64-byte hash) before
    the full-outer join — the shuffle carries hashes, never document
    text; the join key is the id both corpora are naturally
    partitioned by.
    """
    def fp(df: DataFrame, out: str) -> DataFrame:
        norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
        return df.select(F.col(id_col), F.sha2(norm, 256).alias(out))

    o = fp(old, "old_sha")
    n = fp(new, "new_sha")
    status = (
        F.when(F.col("old_sha").isNull(), F.lit("added"))
        .when(F.col("new_sha").isNull(), F.lit("deleted"))
        .when(F.col("old_sha") == F.col("new_sha"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, on=id_col, how="full_outer").select(
        id_col, status.alias("status"), "old_sha", "new_sha"
    )


def content_hashes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content sha256 set of a corpus/batch — the persisted
    state cross-batch dedup carries forward (store via Warehouse and
    merge.incremental-style appends)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.sha2(norm, 256).alias("content_sha")).distinct()


def incremental_dedup(
    new_batch: DataFrame,
    seen: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Cross-batch exact dedup: drop rows of ``new_batch`` whose
    normalized content was already seen in ANY earlier batch
    (``seen`` = accumulated content_hashes frame, None for the first
    batch), then dedup within the batch itself (min-id survivor).

    Returns (fresh_rows, updated_seen) — persist ``updated_seen``
    (Warehouse.append of the delta works: hashes are append-only) and
    feed it to the next batch.  This is the operator an INCREMENTAL
    ingest needs: re-deduplicating the full corpus per batch is
    O(history) per ingest; this is O(batch + index-probe).

    Scale: the anti-join probes the seen-hash index on its hash key
    (broadcast while small, shuffle-on-sha at scale — sha keys are
    uniform so no skew); within-batch dedup is exact_dedup's
    one-aggregation shape.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    hashed = new_batch.withColumn("_sha", F.sha2(norm, 256))
    if seen is not None:
        hashed = hashed.join(
            seen.select(F.col("content_sha").alias("_sha")), "_sha", "left_anti"
        )
    keep = (
        hashed.groupBy("_sha").agg(F.min(id_col).alias(id_col)).drop("_sha")
    )
    fresh = new_batch.join(keep, id_col, "left_semi")
    batch_hashes = hashed.select(F.col("_sha").alias("content_sha")).distinct()
    updated = (
        seen.unionByName(batch_hashes).distinct() if seen is not None else batch_hashes
    )
    return fresh, updated


def incremental_near_dups(
    new_batch: DataFrame,
    index_bands: DataFrame | None,
    index_texts: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Cross-batch NEAR-duplicate filter — incremental_dedup's contract
    at shingle-Jaccard grain: drop rows of ``new_batch`` whose verified
    Jaccard against any ALREADY-INDEXED document reaches ``threshold``.
    ``index_bands`` is the persisted band_signature frame accumulated
    over earlier batches (None for the first batch), ``index_texts``
    the matching (id, text) store the verify stage probes.

    Returns (fresh_rows, fresh_band_rows); append fresh_band_rows and
    the FRESH rows' (id, text) to the index (band rows are append-only
    — Warehouse.append works) and feed them to the next batch — only
    survivors index, so the index tracks the RELEASED corpus and a
    doc is never rejected for matching an already-dropped near-dup
    (no transitive chaining).  This is
    the near-dup pass an INCREMENTAL ingest needs: re-mining the full
    corpus per batch is O(history); this is O(batch x bands) probes.

    Scale: the candidate stage joins the SMALL batch band rows
    (broadcast) against the index on (band_id, band_hash) — the index
    side never reshuffles and only same-bucket ids pair; the verify
    stage joins candidate pairs (small) back to both text stores and
    computes exact shingle Jaccard over candidates only, so the answer
    is hash-family-independent exactly like minhash_lsh_candidates.
    Like all LSH at a fixed band geometry, recall at the threshold
    boundary is probabilistic — 8x4 bands catch a 0.9-Jaccard pair
    with P(miss) ~ 2e-4; raise ``bands`` for tighter thresholds.
    """
    nb = band_signature(
        new_batch, text_col, id_col, num_hashes, bands, shingle_n
    )
    if index_bands is None:
        return new_batch, nb
    cand = (
        F.broadcast(nb)
        .join(
            index_bands.select(
                F.col(id_col).alias("_old"), "band_id", "band_hash"
            ),
            ["band_id", "band_hash"],
        )
        .select(F.col(id_col).alias("_new"), "_old")
        .dropDuplicates()
    )
    verified = (
        cand.join(
            new_batch.select(
                F.col(id_col).alias("_new"), F.col(text_col).alias("_text_new")
            ),
            "_new",
        )
        .join(
            index_texts.select(
                F.col(id_col).alias("_old"), F.col(text_col).alias("_text_old")
            ),
            "_old",
        )
        .select(
            "_new",
            _pair_shingle_jaccard(shingle_n)(
                F.col("_text_new"), F.col("_text_old")
            ).alias("_j"),
        )
    )
    dups = (
        verified.where(F.col("_j") >= threshold)
        .select(F.col("_new").alias(id_col))
        .distinct()
    )
    fresh = new_batch.join(dups, id_col, "left_anti")
    # index only the SURVIVORS: indexing a dropped near-dup would grow
    # the index with duplicate mass and let a later doc C be rejected
    # for matching dropped B even when C-vs-any-released doc is below
    # threshold (transitive chaining) — the incremental_dedup contract
    # is "dedup against the RELEASED corpus", so band rows follow it
    fresh_bands = nb.join(dups, id_col, "left_anti")
    return fresh, fresh_bands


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS plagiarism detector): hash every word k-gram,
    slide a width-``window`` window over the hash sequence, keep the
    RIGHTMOST MINIMUM of each window, return DISTINCT (id, fp_hash).
    Guarantees any shared run of ``k + window - 1`` tokens yields a
    shared fingerprint while storing only ~2/(window+1) of the grams.

    Windows are taken at every gram position with virtual +infinity
    padding before the document start (so docs shorter than ``window``
    still fingerprint); a gram at position p is a rightmost-min of some
    window iff R + L >= window-1, where R = run of strictly-greater
    hashes after p (capped at window-1; a missing position caps the run
    — no window ends past the last gram) and L = run of
    greater-or-equal hashes before p (capped at window-1; positions
    before the start count as +infinity, i.e. the run continues).
    Brute-force-equivalence is property-tested.

    The hash is the 16-hex-char md5 prefix of the gram COMPARED AS A
    STRING (fixed-length lowercase hex compares like the number) so a
    SQL oracle reproduces it exactly — the q137/q117 cross-engine rule.

    Scale: the gram+md5 projection is the CPU cost and it evaluates
    interpreted (higher-order ``transform`` lambdas get no whole-stage
    codegen), so the input fans out across cores FIRST (fan_out — a
    single-file local corpus otherwise runs the whole projection in
    the one scan task: measured 2.6 s -> 0.4 s at sf0.1; a production
    scan that already arrives well-partitioned passes through
    untouched).  The rightmost-min window then only compares the
    16-char hashes — one hash(id) exchange, the only one before the
    distinct; selection density is bounded at 2/(window+1).  Nothing
    doc-sized shuffles.
    """
    from pyspark.sql.window import Window as W

    toks = tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - k, F.lit(0)) + 1)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    g = fan_out(df).select(
        F.col(id_col),
        F.posexplode(grams).alias("_pos", "_gram"),
    ).select(id_col, "_pos", F.substring(F.md5("_gram"), 1, 16).alias("_h"))

    win = W.partitionBy(id_col).orderBy("_pos")
    h = F.col("_h")
    leads = [F.lead("_h", j).over(win) for j in range(1, window)]
    lags = [F.lag("_h", j).over(win) for j in range(1, window)]
    r = F.lit(window - 1)
    l = F.lit(window - 1)
    # build the case chains outermost-first: break at the FIRST j where
    # the run stops, so later whens must nest in reverse
    for j in range(window - 1, 0, -1):
        r = F.when(leads[j - 1].isNull() | (leads[j - 1] <= h), j - 1).otherwise(r)
        l = F.when(lags[j - 1].isNotNull() & (lags[j - 1] < h), j - 1).otherwise(l)
    return (
        g.withColumn("_rl", r + l)
        .where(F.col("_rl") >= window - 1)
        .select(id_col, F.col("_h").alias("fp_hash"))
        .distinct()
    )


def winnow_shared_pairs(
    fingerprints: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    — the MOSS match report.  Postings-grain self-join on fp_hash
    (exactly the q24 inverted-index shape): each fingerprint row pairs
    only with rows holding the SAME 64-bit hash, so shuffle volume is
    sum over hashes of posting-list sizes, never |docs|^2."""
    a = fingerprints.select(F.col(id_col).alias("doc_a"), F.col("fp_hash").alias("_h"))
    b = fingerprints.select(F.col(id_col).alias("doc_b"), F.col("fp_hash").alias("_h"))
    return (
        a.join(b, "_h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fp"))
        .where(F.col("shared_fp") >= min_shared)
    )
