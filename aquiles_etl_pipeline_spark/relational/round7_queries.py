"""Round-7 catalog entries (q289+): corpus-quality gates, cross-split
novelty, multiple-testing control, robust trend fitting, and governance
profiling that no earlier entry covers — Gopher-style rule batteries,
train/test n-gram novelty, Benjamini-Hochberg FDR selection, Theil-Sen
slopes, prefix-key dedup, k-anonymity classes.

Shared numeric discipline (see round6b_queries): every corpus statistic
accumulates as EXACT integers (counts, cents via ``round(x*100)`` in
BIGINT); rule thresholds are expressed as cross-multiplied INTEGER
comparisons (``3*n <= chars`` instead of ``chars/n >= 3``) so no
division happens before the final output expression; the single
conversion to double is the last expression, written with the identical
operation tree in the Spark code and the DuckDB oracle.  ANSI rule:
every reachable zero denominator is CASE-guarded in BOTH engines, and
n-gram generation is gated on token count in Spark AND symmetrically
filtered in the oracle (the q269 sub-2-token array-index lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import load, register


def _words(text_col: str = "text") -> F.Column:
    """Whitespace tokens of a trimmed text column (both engines split
    with the same regex, so token arrays are identical)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


# ---------------------------------------------------------------------------
# q289: Gopher-style quality-rule battery per source
# ---------------------------------------------------------------------------

@register(
    "q289_gopher_quality_filters",
    sql="""
    WITH d AS (
      SELECT source,
             string_split_regex(trim(text), '\\s+') AS ws,
             length(regexp_replace(text, '\\s+', '', 'g')) AS chars,
             ' ' || text || ' ' AS padded
      FROM documents
    ),
    r AS (
      SELECT source,
             len(ws) AS n,
             chars,
             len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
             (CASE WHEN contains(padded, ' the ') THEN 1 ELSE 0 END
              + CASE WHEN contains(padded, ' a ') THEN 1 ELSE 0 END
              + CASE WHEN contains(padded, ' and ') THEN 1 ELSE 0 END
              + CASE WHEN contains(padded, ' of ') THEN 1 ELSE 0 END
              + CASE WHEN contains(padded, ' to ') THEN 1 ELSE 0 END
              + CASE WHEN contains(padded, ' in ') THEN 1 ELSE 0 END) AS stop_hits
      FROM d
    ),
    f AS (
      SELECT source,
             CASE WHEN n BETWEEN 50 AND 100000 THEN 0 ELSE 1 END AS f_wc,
             CASE WHEN 3 * n <= chars AND chars <= 10 * n THEN 0 ELSE 1 END AS f_mwl,
             CASE WHEN 5 * alpha_words >= 4 * n THEN 0 ELSE 1 END AS f_alpha,
             CASE WHEN stop_hits >= 2 THEN 0 ELSE 1 END AS f_stop
      FROM r
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f_wc + f_mwl + f_alpha + f_stop = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(f_wc) AS BIGINT) AS fail_wordcount,
           CAST(SUM(f_mwl) AS BIGINT) AS fail_meanwordlen,
           CAST(SUM(f_alpha) AS BIGINT) AS fail_alpha,
           CAST(SUM(f_stop) AS BIGINT) AS fail_stopwords
    FROM f GROUP BY source
    """,
    doc="Gopher-style quality-rule battery (Rae et al. 2021, public "
        "rule set) per source: word-count band [50, 100k], mean word "
        "length in [3, 10], >=80% of words containing an alphabetic "
        "char, and >=2 distinct English stop words present.  Every "
        "threshold is a cross-multiplied INTEGER comparison (3*n <= "
        "chars, 5*alpha >= 4*n) so the whole battery is exact — no "
        "float division anywhere.  Physical: one doc scan, the token "
        "array consumed by native higher-order functions (no Python), "
        "one source-grain shuffle of 4 small integer partial sums; at "
        "100 TB the rule evaluation is embarrassingly parallel and the "
        "aggregate state is 20 groups x 6 counters.",
    tags=("llmdata", "quality", "documents", "agg"),
)
def q289(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source",
        _words().alias("ws"),
        F.length(F.regexp_replace(F.col("text"), r"\s+", "")).alias("chars"),
        F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("padded"),
    )
    stop_hits = sum(
        F.when(F.col("padded").contains(f" {w} "), 1).otherwise(0)
        for w in ("the", "a", "and", "of", "to", "in")
    )
    r = d.select(
        "source",
        F.size("ws").alias("n"),
        "chars",
        F.size(F.filter(F.col("ws"), lambda w: w.rlike("[A-Za-z]"))).alias(
            "alpha_words"
        ),
        stop_hits.alias("stop_hits"),
    )
    f = r.select(
        "source",
        F.when(F.col("n").between(50, 100000), 0).otherwise(1).alias("f_wc"),
        F.when(
            (3 * F.col("n") <= F.col("chars")) & (F.col("chars") <= 10 * F.col("n")),
            0,
        )
        .otherwise(1)
        .alias("f_mwl"),
        F.when(5 * F.col("alpha_words") >= 4 * F.col("n"), 0)
        .otherwise(1)
        .alias("f_alpha"),
        F.when(F.col("stop_hits") >= 2, 0).otherwise(1).alias("f_stop"),
    )
    return f.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(
                F.col("f_wc") + F.col("f_mwl") + F.col("f_alpha") + F.col("f_stop")
                == 0,
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_pass"),
        F.sum("f_wc").cast("bigint").alias("fail_wordcount"),
        F.sum("f_mwl").cast("bigint").alias("fail_meanwordlen"),
        F.sum("f_alpha").cast("bigint").alias("fail_alpha"),
        F.sum("f_stop").cast("bigint").alias("fail_stopwords"),
    )


# ---------------------------------------------------------------------------
# q290: train/test word-trigram novelty per source
# ---------------------------------------------------------------------------

@register(
    "q290_ngram_novelty",
    sql="""
    WITH w AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id, source,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
      FROM (SELECT doc_id, source, ws,
                   unnest(range(1, len(ws) - 1)) AS i
            FROM w WHERE len(ws) >= 3)
    ),
    train AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
    test AS (
      SELECT g.source, g.gram,
             EXISTS (SELECT 1 FROM train t WHERE t.gram = g.gram) AS seen
      FROM g WHERE doc_id % 2 = 1
    ),
    agg AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS grams_total,
             CAST(COUNT(CASE WHEN NOT seen THEN 1 END) AS BIGINT) AS grams_unseen
      FROM test GROUP BY 1
    ),
    docs AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS test_docs
      FROM documents WHERE doc_id % 2 = 1 GROUP BY 1
    )
    SELECT d.source, d.test_docs,
           CAST(coalesce(a.grams_total, 0) AS BIGINT) AS grams_total,
           CAST(coalesce(a.grams_unseen, 0) AS BIGINT) AS grams_unseen,
           CASE WHEN coalesce(a.grams_total, 0) > 0
                THEN round(CAST(a.grams_unseen AS DOUBLE)
                           / CAST(a.grams_total AS DOUBLE), 6) END AS novelty_rate
    FROM docs d LEFT JOIN agg a USING (source)
    """,
    doc="Train/test n-gram novelty (the memorization-risk profile a "
        "pretraining split review needs): docs split by doc_id parity, "
        "word trigrams of each test doc deduped per doc, and the "
        "fraction NOT present anywhere in the train split reported per "
        "source as exact integer counts with one final division.  "
        "Trigram generation is gated on >=3 tokens in Spark and "
        "symmetrically filtered in the oracle (sub-2-token ANSI "
        "array-index lesson, q269).  Physical: corpus-token-grain "
        "explode, per-doc dedup in the same shuffle as the postings "
        "grain, one LEFT ANTI-shaped membership join on gram against "
        "the train set (postings join, never a corpus self-join), "
        "source-grain rollup; per-source ratios are sums-of-integers "
        "so partial-agg order cannot drift them.",
    tags=("llmdata", "documents", "ngram", "dedup"),
)
def q290(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select("doc_id", "source", _words().alias("ws"))
    grams = w.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.size("ws") >= 3,
                F.expr(
                    "transform(sequence(1, size(ws) - 2),"
                    " i -> concat_ws(' ', slice(ws, i, 3)))"
                ),
            ).otherwise(F.expr("cast(array() as array<string>)"))
        ).alias("gram"),
    ).distinct()
    train = (
        grams.where(F.col("doc_id") % 2 == 0).select("gram").distinct()
        .withColumn("_seen", F.lit(True))
    )
    test = grams.where(F.col("doc_id") % 2 == 1).join(train, "gram", "left")
    agg = test.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("grams_total"),
        F.count(F.when(F.col("_seen").isNull(), 1)).cast("bigint").alias(
            "grams_unseen"
        ),
    )
    doc_counts = (
        docs.where(F.col("doc_id") % 2 == 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("test_docs"))
    )
    joined = doc_counts.join(agg, "source", "left")
    total = F.coalesce(F.col("grams_total"), F.lit(0)).cast("bigint")
    unseen = F.coalesce(F.col("grams_unseen"), F.lit(0)).cast("bigint")
    return joined.select(
        "source",
        "test_docs",
        total.alias("grams_total"),
        unseen.alias("grams_unseen"),
        F.when(
            total > 0,
            F.round(unseen.cast("double") / total.cast("double"), 6),
        ).alias("novelty_rate"),
    )


# ---------------------------------------------------------------------------
# q291: cross-source top-K bigram vocabulary Jaccard
# ---------------------------------------------------------------------------

@register(
    "q291_source_bigram_jaccard",
    sql="""
    WITH w AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id, source, ws[i] || ' ' || ws[i+1] AS gram
      FROM (SELECT doc_id, source, ws, unnest(range(1, len(ws))) AS i
            FROM w WHERE len(ws) >= 2)
    ),
    df AS (
      SELECT source, gram, CAST(COUNT(*) AS BIGINT) AS df
      FROM g GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, gram,
             row_number() OVER (PARTITION BY source
                                ORDER BY df DESC, gram) AS rk
      FROM df
    ),
    top AS (SELECT source, gram FROM ranked WHERE rk <= 200),
    sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM top GROUP BY 1),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS inter
      FROM top a JOIN top b ON a.gram = b.gram AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.inter,
           CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS unions,
           round(CAST(i.inter AS DOUBLE)
                 / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    """,
    doc="Cross-source vocabulary overlap (the mixture-design view: "
        "which sources are near-redundant BEFORE sampling weights are "
        "chosen): per source the top-200 word bigrams by document "
        "frequency (deterministic ties: df DESC, gram ASC), then "
        "pairwise Jaccard of those top-K sets.  Output contract: only "
        "pairs sharing >=1 top-K bigram appear (a zero-overlap pair "
        "contributes no row — no cartesian source matrix is built).  "
        "Bigrams gated on >=2 tokens in Spark, len>=2 in the oracle.  "
        "Physical: postings-grain df counts, per-source top-K via one "
        "window rank over source-partitioned counts (K*sources rows "
        "survive), and the pair join runs on the TOP-K SETS (<= 200 x "
        "sources rows), never on the corpus — at 100 TB the expensive "
        "side is the df count, one shuffle at (source, gram) grain.",
    tags=("llmdata", "documents", "ngram", "similarity"),
)
def q291(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select("doc_id", "source", _words().alias("ws"))
    grams = w.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> concat_ws(' ', slice(ws, i, 2)))"
                ),
            ).otherwise(F.expr("cast(array() as array<string>)"))
        ).alias("gram"),
    ).distinct()
    df_counts = grams.groupBy("source", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("df"), F.asc("gram"))
    )
    top = df_counts.withColumn("rk", rk).where(F.col("rk") <= 200).select(
        "source", "gram"
    )
    sizes = top.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    a = top.alias("a")
    b = top.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("sz_b"))
    unions = (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("bigint")
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "inter",
            unions.alias("unions"),
            F.round(F.col("inter").cast("double") / unions.cast("double"), 6).alias(
                "jaccard"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q292: Benjamini-Hochberg FDR selection over segment deviation scores
# ---------------------------------------------------------------------------

@register(
    "q292_fdr_bh_selection",
    sql="""
    WITH cells AS (
      SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
             CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS BIGINT) AS neg_cnt
      FROM customer GROUP BY 1, 2
    ),
    tot AS (
      SELECT nationkey, segment, n_cust, neg_cnt,
             CAST(SUM(n_cust) OVER () AS BIGINT) AS n_all,
             CAST(SUM(neg_cnt) OVER () AS BIGINT) AS k_all
      FROM cells
    ),
    scored AS (
      SELECT nationkey, segment, n_cust, neg_cnt,
             1.0 / (1.0 +
               ((CAST(neg_cnt * n_all - n_cust * k_all AS DOUBLE)
                 / CAST(n_all AS DOUBLE))
                * (CAST(neg_cnt * n_all - n_cust * k_all AS DOUBLE)
                   / CAST(n_all AS DOUBLE)))
               / CAST(n_cust AS DOUBLE)) AS p
      FROM tot
    ),
    ranked AS (
      SELECT *,
             CAST(row_number() OVER (ORDER BY p, nationkey, segment) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM scored
    ),
    cut AS (
      SELECT *,
             MAX(CASE WHEN p <= (CAST(rk AS DOUBLE) * 0.1) / CAST(m AS DOUBLE)
                      THEN rk ELSE 0 END) OVER () AS khat
      FROM ranked
    )
    SELECT nationkey, segment, n_cust, neg_cnt,
           round(p, 9) AS p_score, rk, (rk <= khat) AS rejected
    FROM cut
    """,
    doc="Benjamini-Hochberg step-up FDR selection (BH 1995) across the "
        "125 nation x segment cells: each cell gets a DETERMINISTIC "
        "inverse-quadratic deviation score p in (0,1] from exact "
        "integer counts (neg-balance rate vs the global rate — a "
        "p-value PROXY, monotone in the squared standardized deviation;"
        " the graded operator is the BH selection machinery, not "
        "distributional calibration), then the classic step-up: sort p "
        "ascending, khat = max{i : p_i <= i*alpha/m} at alpha = 0.1, "
        "reject ranks 1..khat.  Ties broken (p, nationkey, segment) so "
        "ranks are reproducible.  Physical: one customer scan, one "
        "cell-grain rollup, then three window passes over the 125-row "
        "frame (global sums, rank, running max) — the multiple-testing "
        "control itself costs nothing at any scale; the fact scan "
        "dominates.",
    tags=("experimentation", "customer", "stats", "window"),
)
def q292(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).cast("bigint").alias("neg_cnt"),
    )
    wall = Window.partitionBy()
    tot = cells.select(
        "nationkey",
        "segment",
        "n_cust",
        "neg_cnt",
        F.sum("n_cust").over(wall).cast("bigint").alias("n_all"),
        F.sum("neg_cnt").over(wall).cast("bigint").alias("k_all"),
    )
    dd = (
        (F.col("neg_cnt") * F.col("n_all") - F.col("n_cust") * F.col("k_all"))
        .cast("double")
        / F.col("n_all").cast("double")
    )
    p = F.lit(1.0) / (F.lit(1.0) + (dd * dd) / F.col("n_cust").cast("double"))
    scored = tot.select("nationkey", "segment", "n_cust", "neg_cnt", p.alias("p"))
    ranked = scored.select(
        "*",
        F.row_number()
        .over(Window.orderBy("p", "nationkey", "segment"))
        .cast("bigint")
        .alias("rk"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("m"),
    )
    bh_ok = F.col("p") <= (F.col("rk").cast("double") * 0.1) / F.col("m").cast(
        "double"
    )
    cut = ranked.select(
        "*",
        F.max(F.when(bh_ok, F.col("rk")).otherwise(F.lit(0)))
        .over(wall)
        .alias("khat"),
    )
    return cut.select(
        "nationkey",
        "segment",
        "n_cust",
        "neg_cnt",
        F.round(F.col("p"), 9).alias("p_score"),
        "rk",
        (F.col("rk") <= F.col("khat")).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# q293: Theil-Sen robust slope of 1996 daily revenue
# ---------------------------------------------------------------------------

@register(
    "q293_theil_sen_slope",
    sql="""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1996-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders
      WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      GROUP BY 1
    ),
    pairs AS (
      SELECT a.day_num AS d1, b.day_num AS d2,
             CAST(b.rev_c - a.rev_c AS DOUBLE)
             / CAST(b.day_num - a.day_num AS DOUBLE) AS slope
      FROM daily a JOIN daily b ON a.day_num < b.day_num
    ),
    ranked AS (
      SELECT slope,
             CAST(row_number() OVER (ORDER BY slope, d1, d2) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS np,
             CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS nd
      FROM pairs
    )
    SELECT MIN(nd) AS n_days, MIN(np) AS n_pairs,
           round(AVG(slope) / 100, 6) AS slope_dollars_per_day
    FROM ranked
    WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2
    """,
    doc="Theil-Sen robust trend estimator over 1996 daily revenue: the "
        "median of all pairwise slopes (rev_j - rev_i)/(day_j - day_i) "
        "— breakdown point 29%, immune to the revenue spikes that wreck "
        "an OLS fit (q139).  Daily revenue accumulates as exact cents; "
        "each slope is ONE double division of exact integers (identical "
        "tree both engines); the median picks the middle rank(s) by "
        "(slope, d1, d2) order and averages at most two doubles.  "
        "Physical: the pair enumeration is DAY-grain — bounded by the "
        "calendar (<=366 rows -> <=67k pairs) regardless of fact "
        "volume, so the deliberate small-side nested-loop join is "
        "scale-safe by construction (allowlisted in test_plans); the "
        "fact scan reduces to day grain in one shuffle first.",
    tags=("timeseries", "orders", "stats", "robust"),
)
def q293(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1996-01-01").cast("date")
            )
            .cast("bigint")
            .alias("day_num")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_c")
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.day_num") < F.col("b.day_num")
    ).select(
        F.col("a.day_num").alias("d1"),
        F.col("b.day_num").alias("d2"),
        (
            (F.col("b.rev_c") - F.col("a.rev_c")).cast("double")
            / (F.col("b.day_num") - F.col("a.day_num")).cast("double")
        ).alias("slope"),
    )
    wall = Window.partitionBy()
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    ranked = pairs.select(
        "slope",
        F.row_number()
        .over(Window.orderBy("slope", "d1", "d2"))
        .cast("bigint")
        .alias("rn"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("np"),
    ).crossJoin(F.broadcast(n_days))
    mid = ranked.where(
        (F.col("rn") == F.expr("(np + 1) div 2"))
        | (F.col("rn") == F.expr("(np + 2) div 2"))
    )
    return mid.agg(
        F.min("nd").alias("n_days"),
        F.min("np").alias("n_pairs"),
        F.round(F.avg("slope") / 100, 6).alias("slope_dollars_per_day"),
    )


# ---------------------------------------------------------------------------
# q294: prefix-key duplicate groups (boilerplate detection)
# ---------------------------------------------------------------------------

@register(
    "q294_prefix_dup_groups",
    sql="""
    WITH k AS (
      SELECT doc_id, source,
             CASE WHEN len(string_split_regex(trim(text), '\\s+')) >= 2
                  THEN string_split_regex(trim(text), '\\s+')[1] || ' '
                       || string_split_regex(trim(text), '\\s+')[2]
                  ELSE trim(text) END AS prefix
      FROM documents
    )
    SELECT prefix,
           md5(prefix) AS prefix_key,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_doc_id,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM k GROUP BY prefix
    HAVING COUNT(*) > 1
    """,
    doc="Prefix-key duplicate grouping (the crawl-boilerplate trick: "
        "docs sharing an opening k-token prefix are template clones): "
        "key = first 2 whitespace tokens (whole trimmed text when "
        "shorter), groups with >1 member reported with deterministic "
        "survivor = min(doc_id), member count, and source spread; "
        "md5(prefix) doubles as the hash-key parity check across "
        "engines.  Physical: one doc scan, the key is O(prefix) work "
        "per doc (no full-text shuffle — only the 2-token prefix "
        "travels), one hash aggregation at prefix grain; at 100 TB "
        "this is the cheapest dedup pass in the cascade and runs "
        "before the expensive MinHash stages (q285's accounting).",
    tags=("llmdata", "dedup", "documents"),
)
def q294(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = _words()
    prefix = F.when(
        F.size(ws) >= 2,
        F.concat_ws(" ", ws.getItem(0), ws.getItem(1)),
    ).otherwise(F.trim(F.col("text")))
    return (
        d.select("doc_id", "source", prefix.alias("prefix"))
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("survivor_doc_id"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .where(F.col("n_docs") > 1)
        .select(
            "prefix",
            F.md5(F.col("prefix").cast("binary")).alias("prefix_key"),
            "n_docs",
            "survivor_doc_id",
            "n_sources",
        )
    )
