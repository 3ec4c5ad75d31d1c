"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.  All expression-only (codegen'd).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..numerics import pround
from ..partitioning import fan_out
from .dedup import tokens

# Tiny per-language stopword lists for the n-gram/stopword-ratio
# language heuristic.  (Real pipelines plug fastText et al. behind the
# same column contract; the heuristic keeps this container dependency-
# free and deterministic.)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "los", "para"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "les", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "von"],
}


def language_scores(text_col: str = "text") -> list[F.Column]:
    toks = F.array_distinct(tokens(text_col))
    cols = []
    for lang, words in STOPWORDS.items():
        ref = F.array(*[F.lit(w) for w in words])
        cols.append(
            (F.size(F.array_intersect(toks, ref)).cast("double") / F.lit(len(words))).alias(
                f"score_{lang}"
            )
        )
    return cols


def identify_language(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit-ratio argmax; 'und' (undetermined) when no stopword
    of any language appears."""
    scored = df.select(F.col(id_col), *language_scores(text_col))
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(id_col, pred.alias("predicted_lang"), best.alias("confidence"))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / word-shape features + a
    composite [0,1] quality score (mirrors common pretraining-data
    heuristic filters)."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    mean_word_len = (n_chars.cast("double") / F.when(n_tokens > 0, n_tokens)).alias("mean_word_len")
    punct_ratio = (
        F.regexp_count(t, F.lit(r"[^\w\s]")).cast("double") / F.when(n_chars > 0, n_chars)
    ).alias("punct_ratio")
    digit_ratio = (
        F.regexp_count(t, F.lit(r"\d")).cast("double") / F.when(n_chars > 0, n_chars)
    ).alias("digit_ratio")
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = (
        F.size(F.array_intersect(F.array_distinct(toks), en_stop)).cast("double") / F.lit(10)
    ).alias("stopword_ratio")
    uniq_ratio = (
        F.size(F.array_distinct(toks)).cast("double") / F.when(n_tokens > 0, n_tokens)
    ).alias("unique_token_ratio")
    score = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.3
        + (1 - F.least(punct_ratio, F.lit(1.0))) * 0.2
        + F.least(stop_ratio, F.lit(1.0)) * 0.2
        + F.least(uniq_ratio, F.lit(1.0)) * 0.3
    ).alias("quality_score")
    return df.select(
        id_col, n_chars.alias("n_chars"), n_tokens.alias("n_tokens"),
        mean_word_len, punct_ratio, digit_ratio, stop_ratio, uniq_ratio, score,
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (letter runs,
    digit runs, single punctuation — a cheap proxy for subword cost)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bpe_ish = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|\d|[^\w\s]"), 0))
    return df.select(
        id_col, ws.alias("ws_tokens"), bpe_ish.alias("bpeish_tokens")
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rolling-hash-style document fingerprint: xxhash64 over the
    normalized (lowercased, whitespace-collapsed) text, plus a sha256
    content id.  Used for incremental-crawl change detection."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        id_col,
        F.xxhash64(norm).alias("fingerprint64"),
        F.sha2(norm, 256).alias("content_sha256"),
    )


def top_bigrams(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Global top-k word bigrams (corpus n-gram statistics)."""
    toks = tokens(text_col)
    # zip the array with its own tail: O(n) per doc, vs per-index
    # slice() which re-copies and is O(n^2) on long documents
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    # single-file corpora arrive as one partition; fan the CPU-bound
    # tokenize+explode across cores (no-op at scale)
    return (
        fan_out(df)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("bigram"))
        .limit(k)
    )


PII_PATTERNS: dict[str, str] = {
    # conservative, high-precision patterns (pretraining-data scrubbing
    # favors precision; recall comes from stacking patterns)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrubbing for training corpora: replace email/phone/IPv4/SSN
    matches with typed sentinels and count replacements per type.
    Expression-only (chained regexp_replace + regexp_count inside one
    codegen'd projection) — at 100 TB this is a pure map, no shuffle."""
    t = F.col(text_col).cast("string")
    redacted = t
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(F.regexp_count(redacted, F.lit(pat)).alias(f"n_{kind}"))
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    return df.select(id_col, *counts, redacted.alias("redacted_text"))


def tf_idf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Per-document top-k terms by tf-idf.

    Ranking is on EXACT keys (term_freq DESC, doc_freq ASC, token ASC) —
    tf-idf ordering with integer comparisons only, so the selected row
    set is bit-reproducible across engines; the ln-based tf-idf score is
    emitted alongside as a round-6 DOUBLE (oracle-parity discipline:
    see relational.catalog.emit).

    Scale: one tokenize+explode pass shuffles (doc_id, token) once for
    the tf aggregation; doc-frequency aggregates the (already distinct)
    tf pairs on uniform token keys; the corpus doc-count joins in as a
    broadcast single-row aggregate (no driver collect).  The final
    per-doc top-k is a bounded window over each document's vocabulary.
    """
    from pyspark.sql import Window

    exploded = fan_out(df).select(
        id_col, F.explode(tokens(text_col)).alias("token")
    )
    tf = exploded.groupBy(id_col, "token").agg(F.count("*").alias("term_freq"))
    doc_freq = tf.groupBy("token").agg(F.count("*").alias("doc_freq"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("term_freq"), F.asc("doc_freq"), F.asc("token")
    )
    return (
        tf.join(doc_freq, "token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            pround(F.col("term_freq")
                * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")), 6),
        )
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(id_col, "token", "term_freq", "doc_freq", "tfidf")
    )


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition metrics — the Gopher-style repetition
    filters (Rae et al. 2021, "Scaling Language Models", Table A1):
    dominance of the most frequent token/bigram and the mass of
    duplicated n-grams.  Boilerplate, keyboard-mash, and template spam
    score high; filters threshold on these fractions.

    Output per document: token and bigram totals/distincts, the top
    token/bigram frequency, and four [0,1] fractions (top_token_frac,
    dup_token_frac, top_bigram_frac, dup_bigram_frac).

    Scale: one explode per n-gram order into a partial-aggregatable
    (id, gram) count, re-aggregated to (id,) — two uniform-key shuffle
    stages per order, map-side combined; the final token/bigram join is
    on frames both already hash-partitioned by id, so it reuses that
    distribution instead of re-shuffling.  No windows, no driver state,
    no Python.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    src = fan_out(df)

    def per_doc(gram_col: F.Column, prefix: str) -> DataFrame:
        counts = (
            src.select(F.col(id_col), F.explode(gram_col).alias("_g"))
            .groupBy(id_col, "_g")
            .agg(F.count("*").alias("_c"))
        )
        return counts.groupBy(id_col).agg(
            F.sum("_c").alias(f"n_{prefix}s"),
            F.count("*").alias(f"n_distinct_{prefix}s"),
            F.max("_c").alias(f"top_{prefix}_freq"),
        )

    t = per_doc(toks, "token")
    b = per_doc(bigrams, "bigram")

    def frac(num: F.Column, den: F.Column) -> F.Column:
        return pround(num.cast("double") / den, 6)

    return t.join(b, id_col).select(
        id_col,
        "n_tokens", "n_distinct_tokens", "top_token_freq",
        frac(F.col("top_token_freq"), F.col("n_tokens")).alias("top_token_frac"),
        frac(F.col("n_tokens") - F.col("n_distinct_tokens"), F.col("n_tokens")).alias("dup_token_frac"),
        "n_bigrams", "n_distinct_bigrams", "top_bigram_freq",
        frac(F.col("top_bigram_freq"), F.col("n_bigrams")).alias("top_bigram_frac"),
        frac(F.col("n_bigrams") - F.col("n_distinct_bigrams"), F.col("n_bigrams")).alias("dup_bigram_frac"),
    )


def c4_document_filters(
    df: DataFrame,
    min_words: int = 5,
    max_word_chars: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style document gating: the composable boolean filter bank a
    pretraining corpus pass applies before any expensive dedup — each
    gate is its own output column so downstream consumers can tune the
    conjunction without recomputing, plus the conjunction as ``keep``.

    Gates (adapted from the public C4 recipe): minimum word count,
    no pathologically long word, no code markers ({ or }), no
    'lorem ipsum', no 'javascript' boilerplate marker, mean word
    length in a sane band [2, 12].

    Expression-only projection — zero shuffles, zero UDFs; runs at
    scan speed and is the cheapest possible first pass over 100 TB.
    """
    t = F.lower(F.col(text_col))
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    max_len = F.array_max(F.transform(toks, F.length))
    mean_len = F.length(F.col(text_col)).cast("double") / F.when(n_tokens > 0, n_tokens)
    gates = {
        "enough_words": n_tokens >= min_words,
        "no_giant_word": F.coalesce(max_len <= max_word_chars, F.lit(False)),
        "no_code_marker": ~t.contains("{") & ~t.contains("}"),
        "no_lorem": ~t.contains("lorem ipsum"),
        "no_js_marker": ~t.contains("javascript"),
        "sane_word_len": F.coalesce(mean_len.between(2.0, 12.0), F.lit(False)),
    }
    keep = None
    for c in gates.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        id_col,
        *[c.alias(name) for name, c in gates.items()],
        keep.alias("keep"),
    )


def vocab_coverage(
    df: DataFrame,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary statistics: per-token total frequency and
    document frequency, frequency rank, and the cumulative fraction of
    all token occurrences a top-``rank`` vocabulary would cover — the
    measurement behind tokenizer vocab sizing and OOV-rate estimates.

    Output: (token, tf, df, rank, cum_coverage) for the top_k tokens.

    Scale: one explode + one groupBy(token) shuffle carrying (token,
    count) partials (map-side combined), then a single-partition window
    over only the top_k survivors — the full vocabulary never sorts
    globally.
    """
    from pyspark.sql.window import Window

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    counts = toks.groupBy("token").agg(
        F.count("*").alias("tf"), F.countDistinct(id_col).alias("df")
    )
    total = counts.agg(F.sum("tf").cast("double").alias("_total"))
    top = counts.orderBy(F.desc("tf"), "token").limit(top_k)
    w = Window.orderBy(F.desc("tf"), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("tf"), "token")))
        .withColumn("cum_coverage", (F.sum("tf").over(w) / F.col("_total")))
        .select("token", "tf", "df", "rank", pround("cum_coverage", 6).alias("cum_coverage"))
    )


def unigram_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality signal: score every document
    by its perplexity under a unigram LM trained on the corpus itself
    (token prob = corpus frequency / total occurrences).  Outlier
    perplexity — far from the corpus's center — is the classic filter
    signal for machine-generated or degenerate text.  (Production
    pipelines swap in a KenLM n-gram model behind the same column
    contract; the unigram estimator keeps this dependency-free and
    exactly SQL-twinnable.)

    Output: (id, n_tokens, neg_avg_logprob, perplexity) where
    perplexity = exp(-mean ln p(token)) over the doc's token stream.

    Scale: one groupBy(token) vocab count (map-side combined), one
    token-keyed join of the token stream against the vocab (AQE
    broadcasts it when the vocabulary is small), one groupBy(id)
    rollup.  No UDFs; log/exp stay in codegen.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("_tf"))
    total = counts.agg(F.sum("_tf").cast("double").alias("_T"))
    ll = (
        tok.join(counts, "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.log(F.col("_tf") / F.col("_T"))).alias("_ll"),
        )
    )
    neg_avg = -F.col("_ll") / F.col("n_tokens")
    return ll.select(
        id_col,
        "n_tokens",
        pround(neg_avg, 6).alias("neg_avg_logprob"),
        pround(F.exp(neg_avg), 4).alias("perplexity"),
    )


def html_to_text(col: Column) -> Column:
    """Boilerplate-stripping HTML -> text extraction as a pure Catalyst
    regexp chain (the main-content extraction pass every crawl
    pipeline runs before quality filtering):

      1. drop <script>/<style>/<head> blocks wholesale ((?s) DOTALL —
         their text is never content)
      2. drop HTML comments
      3. replace every remaining tag with a space (block boundaries
         must not glue words together)
      4. decode the entities that appear in running text
      5. collapse whitespace, trim

    Zero UDFs, zero shuffles — fuses into the scan's codegen span like
    redact_pii.  The regexes avoid lookarounds so Java regex and RE2
    (the DuckDB twin) agree.  This is the deterministic 80% extractor;
    a boilerplate-classifier (trafilatura-style DOM scoring) slots in
    as a mapInPandas stage where fidelity beats throughput.
    """
    # no backreferences (RE2 lacks them): one alternative per block tag
    t = F.regexp_replace(
        col,
        r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"
        r"|<head[^>]*>.*?</head>",
        " ",
    )
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    # &amp; decodes LAST: decoding it first double-decodes escaped
    # entities ('&amp;lt;' — the literal text '&lt;' — would become '<')
    for ent, ch in [
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
    ]:
        t = F.regexp_replace(t, ent, ch)
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization — the canonicalization pass that must
    run BEFORE any content-hash dedup: visually-identical text arrives
    from different sources as composed vs decomposed codepoints
    (e.g. 'é' as U+00E9 vs 'e'+U+0301), and without NFC every
    hash-based operator (exact dedup, fingerprints, snapshot diff)
    treats them as distinct documents.

    Spark has no native Unicode-normalization expression, so this is a
    deliberate Arrow-batched pandas_udf (the documented slow path —
    ~GB/s per core via CPython's unicodedata, still scan-speed);
    DuckDB's nfc_normalize implements the same Unicode standard, which
    is what makes the operator oracle-checkable.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc(col)


def vocab_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    k: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary drift between two corpus slices: per token, the
    log-ratio of Laplace-smoothed unigram probabilities
    ln(p_a / p_b), ranked by absolute drift — the dataset-shift
    monitor that catches a new crawl snapshot, scraper regression, or
    domain-mix change before it reaches training.

    Determinism: probabilities are rationals of integer counts
    ((c+1)/(N+V)); both engines evaluate the identical ln/division
    expression on identical integers, and the ranking orders on the
    ROUNDED score with token as tiebreak, so the selected row set is
    exact.

    Output: (token, count_a, count_b, log_ratio) — log_ratio > 0
    means over-represented in A.

    Scale: two token-count aggregations + a full outer join on the
    token key; the three scalar totals broadcast as single-row
    aggregates (q42's degenerate map shape).
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            fan_out(df)
            .select(F.explode(tokens(text_col)).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca = counts(df_a, "count_a")
    cb = counts(df_b, "count_b")
    joined = ca.join(cb, "token", "full_outer").select(
        "token",
        F.coalesce("count_a", F.lit(0)).alias("count_a"),
        F.coalesce("count_b", F.lit(0)).alias("count_b"),
    )
    tot_a = df_a.select(F.explode(tokens(text_col)).alias("t")).agg(
        F.count(F.lit(1)).alias("_na")
    )
    tot_b = df_b.select(F.explode(tokens(text_col)).alias("t")).agg(
        F.count(F.lit(1)).alias("_nb")
    )
    vocab = joined.agg(F.count(F.lit(1)).alias("_v"))
    ratio = F.log(
        (F.col("count_a") + 1).cast("double") / (F.col("_na") + F.col("_v"))
    ) - F.log((F.col("count_b") + 1).cast("double") / (F.col("_nb") + F.col("_v")))
    return (
        joined.crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
        .crossJoin(F.broadcast(vocab))
        .select("token", "count_a", "count_b", pround(ratio, 6).alias("log_ratio"))
        .orderBy(F.desc(F.abs(F.col("log_ratio"))), F.asc("token"))
        .limit(k)
    )


def score_calibration_matrix(
    df: DataFrame,
    group_col: str,
    score_col: str,
    deciles: int = 10,
) -> DataFrame:
    """Per-group quantile calibration of a quality score against the
    GLOBAL score distribution — the cross-source score-normalization
    step of corpus curation: a classifier/heuristic score is only
    comparable across sources after mapping each source's scores onto
    the global CDF (a "good" doc from a weak source and one from a
    strong source get different raw scores for the same global rank).

    Output, at (group, global_decile) grain: ``n_docs`` in the cell,
    ``avg_group_pct`` (mean within-group percent-rank of the cell's
    docs) and ``avg_calibration_gap`` (mean global-pct minus group-pct
    — positive when the group's docs rank higher globally than within
    their own source, i.e. the source is stronger than average).

    Scale shape: every window runs on SCORE-DISTRIBUTION grain, never
    row grain.  Raw rows collapse once to (group, score) counts and
    once to (score) counts; percent ranks are cumulative sums over
    those collapsed frames (|distinct scores| rows), and the global
    side broadcasts back onto the group side.  The naive formulation —
    ``percent_rank() OVER (ORDER BY score)`` on raw rows — is a
    single-partition sort of the whole table and dies at 100 TB.

    Exactness discipline: percent ranks are ratios of integer
    cumulative counts, and the per-cell means are computed from
    integer sums (SUM(cnt*cum) with one decimal-widened factor, so
    nothing wraps) divided ONCE — order-independent, so the DuckDB
    twin hash-matches.  Ties share a decile (min-rank semantics), so
    the bucketing is deterministic where ntile's tie-split is not.
    """
    from pyspark.sql import Window

    g = df.groupBy(score_col).agg(F.count("*").alias("_cg"))
    wg = Window.orderBy(score_col).rowsBetween(Window.unboundedPreceding, -1)
    g = g.select(
        score_col,
        F.coalesce(F.sum("_cg").over(wg), F.lit(0)).alias("_cumg"),
        F.sum("_cg").over(Window.partitionBy()).alias("_n"),
    )
    s = df.groupBy(group_col, score_col).agg(F.count("*").alias("_cs"))
    ws = (
        Window.partitionBy(group_col)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = s.select(
        group_col,
        score_col,
        "_cs",
        F.coalesce(F.sum("_cs").over(ws), F.lit(0)).alias("_cums"),
        F.sum("_cs").over(Window.partitionBy(group_col)).alias("_ns"),
    )
    j = s.join(F.broadcast(g), score_col)
    # min-rank decile in pure integer arithmetic (div, not /, which
    # would detour through double and lose exactness at large counts)
    dec = F.expr(f"least({deciles}, (_cumg * {deciles}) div _n + 1)").cast("int")
    cells = j.select(
        group_col,
        dec.alias("global_decile"),
        "_cs",
        "_cums",
        "_cumg",
        "_ns",
        "_n",
    )
    # decimal-widened products: SUM(cnt * cum) stays exact past int64
    sum_cums = F.sum(F.col("_cs").cast("decimal(19,0)") * F.col("_cums"))
    sum_cumg = F.sum(F.col("_cs").cast("decimal(19,0)") * F.col("_cumg"))
    n_docs = F.sum("_cs")
    # _ns is constant per group and _n globally, so the cell means are
    # single exact-integer divisions: mean(cum/(ns-1)) == SUM(cnt*cum)
    # / ((ns-1) * SUM(cnt)) — no float accumulation anywhere
    gp = F.when(
        F.min("_ns") > 1,
        sum_cums.cast("double")
        / ((F.min("_ns") - 1).cast("double") * n_docs.cast("double")),
    ).otherwise(F.lit(0.0))
    gl = F.when(
        F.min("_n") > 1,
        sum_cumg.cast("double")
        / ((F.min("_n") - 1).cast("double") * n_docs.cast("double")),
    ).otherwise(F.lit(0.0))
    return cells.groupBy(group_col, "global_decile").agg(
        n_docs.cast("long").alias("n_docs"),
        pround(gp, 6).alias("avg_group_pct"),
        pround(gl - gp, 6).alias("avg_calibration_gap"),
    )


def bigram_lm_nll(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Held-out negative log-likelihood under a Laplace-smoothed BIGRAM
    language model trained on ``train`` — the conditional-probability
    step up from unigram_perplexity's CCNet signal: P(w2|w1) =
    (c(w1 w2) + 1) / (c(w1 ·) + V), V = train token vocabulary.  Lower
    per-bigram NLL = more train-like text; the held-out split makes it
    an honest quality/domain-fit score rather than a memorization one.

    Cross-engine exactness (the q86/q175 discipline): every per-bigram
    log term is the SAME ln over integer-count rationals, rounded and
    scaled to INTEGER MICROS before the per-doc sum; the single
    division happens at the end.  Unseen bigrams/contexts coalesce to
    count 0 and smooth like any other.

    Scale: train-side counts are (bigram)- and (context)-grain
    aggregations; the test stream joins them at bigram grain (plain
    shuffle joins — vocab tables are unbounded at corpus scale, so no
    broadcast hint; AQE picks one when the dims fit).  Returns
    (id, n_bigrams, avg_nll).
    """
    def bigrams(df: DataFrame) -> DataFrame:
        toks = tokens(text_col)
        idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1)))
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 2))
        )
        # fan out FIRST: the gram transform is an interpreted HOF (no
        # codegen), and corpus parquet often arrives as one file — one
        # task would run the whole kernel serially otherwise.  fan_out
        # is conditional: a well-partitioned 100 TB scan passes through
        # unshuffled (the postings-kernel discipline).
        from ..partitioning import fan_out

        return fan_out(df).select(
            F.col(id_col), F.explode(grams).alias("_bg")
        )

    tr = bigrams(train)
    c2 = tr.groupBy("_bg").agg(F.count(F.lit(1)).alias("_c2"))
    # context counts c(w1 ·) re-aggregate the BIGRAM-COUNT table, not
    # the corpus: c(w1 ·) = sum of c(w1 w2) over w2, so deriving ctx
    # from c2 is exactly equal and skips a second run of the (costly,
    # interpreted-HOF) gram kernel over every train doc — the table is
    # bigram-type grain, orders of magnitude smaller than the stream
    ctx = (
        c2.select(F.split("_bg", " ")[0].alias("_w1"), "_c2")
        .groupBy("_w1")
        .agg(F.sum("_c2").cast("bigint").alias("_c1"))
    )
    v = (
        train.select(F.explode(tokens(text_col)).alias("_t"))
        .agg(F.countDistinct("_t").alias("_v"))
    )
    te = bigrams(test).select(
        id_col, "_bg", F.split("_bg", " ")[0].alias("_w1")
    )
    scored = (
        te.join(c2, "_bg", "left")
        .join(ctx, "_w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            id_col,
            F.round(
                -F.log(
                    (F.coalesce("_c2", F.lit(0)) + F.lit(1.0))
                    / (F.coalesce("_c1", F.lit(0)) + F.col("_v"))
                )
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("_micros"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        # raw integer micro sum rides along so corpus-level rollups can
        # re-aggregate EXACTLY — reconstructing it from the rounded
        # average (avg * n * 1e6) drifts by up to n/2 micros per doc
        F.sum("_micros").cast("bigint").alias("nll_micros"),
        pround(F.sum("_micros").cast("double") / F.count(F.lit(1)) / 1e6, 6).alias("avg_nll"),
    )
