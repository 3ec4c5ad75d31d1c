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

from .catalog import load, register, pround


def _words(text_col: str = "text") -> F.Column:
    """Whitespace tokens of a trimmed text column (both engines split
    with the same regex, so token arrays are identical)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def _cents(col: str) -> F.Column:
    """NULL-safe exact cents of a double money column."""
    return F.round(F.coalesce(F.col(col), F.lit(0.0)) * 100).cast("bigint")


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
                THEN CAST(round((CAST(a.grams_unseen AS DOUBLE)
                           / CAST(a.grams_total AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 END AS novelty_rate
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
            pround(unseen.cast("double") / total.cast("double"), 6),
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
           CAST(round((CAST(i.inter AS DOUBLE)
                 / CAST(sa.sz + sb.sz - i.inter AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 AS jaccard
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
            pround(F.col("inter").cast("double") / unions.cast("double"), 6).alias(
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
           CAST(round((p) * 1e9) AS BIGINT) / 1e9 AS p_score, rk, (rk <= khat) AS rejected
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
        pround(F.col("p"), 9).alias("p_score"),
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
           CAST(round(AVG(slope) * 10000.0) AS BIGINT) / 1000000.0
             AS slope_dollars_per_day
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
        # integer-units discipline (ORACLE_SF01.md): ONE round to
        # micro-dollar integers (cents/day * 1e4), then exact divide —
        # round(x, d>0) is not portable at half boundaries.
        (F.round(F.avg("slope") * F.lit(10000.0)).cast("bigint") / F.lit(1000000.0))
        .cast("double")
        .alias("slope_dollars_per_day"),
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


# ---------------------------------------------------------------------------
# q295: Matryoshka truncation quality per label
# ---------------------------------------------------------------------------

@register(
    "q295_matryoshka_truncation",
    sql="""
    WITH per_vec AS (
      SELECT label,
             list_dot_product(embedding, embedding) AS f,
             list_dot_product(embedding[1:32], embedding[1:32]) AS h
      FROM embeddings
    ),
    micro AS (
      SELECT label,
             CASE WHEN f > 0
                  THEN CAST(round(sqrt(h / f) * 1000000) AS BIGINT) END AS r_micro
      FROM per_vec
    )
    SELECT label,
           CAST(COUNT(r_micro) AS BIGINT) AS n_vecs,
           CASE WHEN COUNT(r_micro) > 0
                THEN CAST(round((CAST(SUM(r_micro) AS DOUBLE)
                           / CAST(COUNT(r_micro) AS DOUBLE) / 1000000) * 1e6) AS BIGINT) / 1e6
           END AS avg_retained_cos
    FROM micro GROUP BY label
    """,
    doc="Matryoshka truncation audit (Kusupati et al. 2022): for each "
        "embedding, the cosine between the full 64-dim vector and its "
        "zero-padded first-32-dim truncation equals norm(head)/norm("
        "full) — reported as the per-label average, the go/no-go "
        "metric for serving half-dimension vectors from an MRL-trained "
        "index.  Per-vector ratios are integer-micro-rounded BEFORE the "
        "cross-row average (the q271 discipline: unordered double sums "
        "never cross rows); within-vector dot products fold "
        "sequentially in both engines (q20's parity pattern).  "
        "Physical: embarrassingly parallel per-row array folds (native "
        "HOFs after a fan-out repartition — interpreted HOFs off the "
        "single-file partition), one label-grain rollup of two integer "
        "sums.",
    tags=("embeddings", "llmdata", "similarity"),
)
def q295(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    sq_sum = lambda col: F.aggregate(  # noqa: E731
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    per_vec = e.repartition(par).select(
        "label",
        sq_sum(F.col("embedding")).alias("f"),
        sq_sum(F.slice(F.col("embedding"), 1, 32)).alias("h"),
    )
    micro = per_vec.select(
        "label",
        F.when(
            F.col("f") > 0,
            F.round(F.sqrt(F.col("h") / F.col("f")) * 1000000).cast("bigint"),
        ).alias("r_micro"),
    )
    n = F.count("r_micro").cast("bigint")
    return micro.groupBy("label").agg(
        n.alias("n_vecs"),
        F.when(
            n > 0,
            pround(F.sum("r_micro").cast("double") / n.cast("double") / 1000000, 6),
        ).alias("avg_retained_cos"),
    )


# ---------------------------------------------------------------------------
# q296: k-anonymity / l-diversity profile of customer quasi-identifiers
# ---------------------------------------------------------------------------

@register(
    "q296_k_anonymity_profile",
    sql="""
    WITH qi AS (
      SELECT c_custkey,
             c_nationkey AS nationkey,
             c_mktsegment AS segment,
             (CAST(round(c_acctbal * 100) AS BIGINT) + 10000000) // 200000
               AS bal_band
      FROM customer
    ),
    sens AS (
      SELECT o_custkey, o_orderpriority FROM orders
    ),
    classes AS (
      SELECT q.nationkey, q.segment, q.bal_band,
             CAST(COUNT(DISTINCT q.c_custkey) AS BIGINT) AS k_size,
             CAST(COUNT(DISTINCT s.o_orderpriority) AS BIGINT) AS l_div
      FROM qi q LEFT JOIN sens s ON s.o_custkey = q.c_custkey
      GROUP BY 1, 2, 3
    )
    SELECT nationkey, segment, bal_band, k_size, l_div,
           (k_size < 5 OR l_div < 2) AS suppressed,
           CAST(MIN(k_size) OVER () AS BIGINT) AS k_min
    FROM classes
    """,
    doc="k-anonymity / l-diversity release audit (Sweeney 2002; "
        "Machanavajjhala 2007): quasi-identifier classes over "
        "(nation, market segment, $2000 balance band — integer band "
        "arithmetic on shifted cents so negative balances floor "
        "identically in both engines), k = members per class, l = "
        "distinct order priorities (the sensitive attribute) observed "
        "for the class via a key join to orders, and the suppression "
        "verdict (k < 5 or l < 2) a small-cell release would apply "
        "(q170's suppression rule, upgraded to class grain).  "
        "Physical: one customer scan projected to QI grain, one "
        "broadcast-sized key join to orders for the sensitive "
        "attribute, one class-grain rollup carrying two COUNT "
        "DISTINCTs, and a single-pass window for the global k_min; "
        "~1000 classes regardless of fact volume.",
    tags=("governance", "customer", "orders", "agg"),
)
def q296(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    qi = c.select(
        "c_custkey",
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 10000000) div 200000"
        ).alias("bal_band"),
    )
    sens = o.select("o_custkey", "o_orderpriority")
    classes = (
        qi.join(sens, qi["c_custkey"] == sens["o_custkey"], "left")
        .groupBy("nationkey", "segment", "bal_band")
        .agg(
            F.countDistinct("c_custkey").cast("bigint").alias("k_size"),
            F.countDistinct("o_orderpriority").cast("bigint").alias("l_div"),
        )
    )
    return classes.select(
        "nationkey",
        "segment",
        "bal_band",
        "k_size",
        "l_div",
        ((F.col("k_size") < 5) | (F.col("l_div") < 2)).alias("suppressed"),
        F.min("k_size").over(Window.partitionBy()).cast("bigint").alias("k_min"),
    )


# ---------------------------------------------------------------------------
# q297: exponentially decayed part popularity (integer half-life weights)
# ---------------------------------------------------------------------------

@register(
    "q297_decayed_part_popularity",
    sql="""
    WITH horizon AS (
      SELECT MAX(CAST(l_shipdate AS DATE)) AS maxd FROM lineitem
    ),
    weighted AS (
      SELECT l_partkey,
             CAST(round(l_quantity) AS BIGINT) AS units,
             CAST(1 << (16 - LEAST(CAST(date_diff('day', CAST(l_shipdate AS DATE),
                                                  h.maxd) AS BIGINT) // 7, 16))
                  AS BIGINT) AS w
      FROM lineitem, horizon h
    ),
    scored AS (
      SELECT l_partkey AS partkey,
             CAST(SUM(units * w) AS BIGINT) AS score_i,
             CAST(SUM(units) AS BIGINT) AS raw_units
      FROM weighted GROUP BY 1
    )
    SELECT s.partkey, p.p_name,
           CAST(round((CAST(s.score_i AS DOUBLE) / 65536) * 1e6) AS BIGINT) / 1e6 AS decayed_units,
           s.raw_units
    FROM scored s JOIN part p ON p.p_partkey = s.partkey
    ORDER BY s.score_i DESC, s.partkey LIMIT 20
    """,
    doc="Recency-decayed part popularity: each lineitem contributes "
        "units * 2^(16 - min(weeks_ago, 16)) — a one-week half-life "
        "with a weight-1 floor after 16 weeks — so the whole decay "
        "accumulates as EXACT integer arithmetic (bit-shift weights, "
        "BIGINT sums; the single /65536 to fractional units happens at "
        "output).  The classic float trap (sum of exp(-t/tau) doubles "
        "is partial-agg-order dependent) never appears.  Top 20 by "
        "(score, partkey).  Physical: the corpus horizon is a "
        "broadcast single-row aggregate (q42's shape, allowlisted), "
        "one partkey-grain rollup, TakeOrdered(20), and the name "
        "lookup joins the 20-row result against part (broadcast) — "
        "never the fact table.",
    tags=("orders", "timeseries", "topk", "agg"),
)
def q297(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    horizon = li.agg(F.max(F.col("l_shipdate").cast("date")).alias("maxd"))
    w = F.expr(
        "CAST(shiftleft(1, CAST(16 - least("
        "datediff(maxd, CAST(l_shipdate AS DATE)) div 7, 16) AS INT)) AS BIGINT)"
    )
    weighted = li.crossJoin(F.broadcast(horizon)).select(
        "l_partkey",
        F.round(F.col("l_quantity")).cast("bigint").alias("units"),
        w.alias("w"),
    )
    scored = weighted.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.col("units") * F.col("w")).cast("bigint").alias("score_i"),
        F.sum("units").cast("bigint").alias("raw_units"),
    )
    top = scored.orderBy(F.desc("score_i"), F.asc("partkey")).limit(20)
    return (
        F.broadcast(top)
        .join(p, top["partkey"] == p["p_partkey"])
        .select(
            "partkey",
            "p_name",
            pround(F.col("score_i").cast("double") / 65536, 6).alias(
                "decayed_units"
            ),
            "raw_units",
        )
    )


# ---------------------------------------------------------------------------
# q298: view -> purchase conversion latency deciles
# ---------------------------------------------------------------------------

@register(
    "q298_conversion_latency_deciles",
    sql="""
    WITH fv AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS first_view
      FROM events
    ),
    conv AS (
      SELECT user_id,
             CAST((epoch_us(MIN(ts)) - epoch_us(MIN(first_view))) // 1000000
                  AS BIGINT) AS latency_s
      FROM fv
      WHERE event_type = 'purchase' AND first_view IS NOT NULL
            AND ts > first_view
      GROUP BY user_id
    ),
    g AS (
      SELECT latency_s, CAST(COUNT(*) AS BIGINT) AS cnt FROM conv GROUP BY 1
    ),
    c AS (
      SELECT latency_s, cnt,
             CAST(SUM(cnt) OVER (ORDER BY latency_s
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS f,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM g
    ),
    t AS (
      SELECT d, CAST((d * (SELECT MIN(n) FROM c) + 9) // 10 AS BIGINT) AS r
      FROM (SELECT unnest(range(1, 10)) AS d)
    )
    SELECT t.d AS decile, CAST(MIN(c.n) AS BIGINT) AS n_users,
           CAST(MIN(c.latency_s) AS BIGINT) AS latency_s
    FROM t JOIN c ON c.f >= t.r AND c.f - c.cnt < t.r
    GROUP BY t.d
    """,
    doc="View-to-purchase conversion latency deciles: per user, the "
        "first 'view' timestamp (one window pass) and the first "
        "'purchase' strictly after it; latency in whole seconds "
        "(integer micros division).  Deciles via the distinct-value-"
        "grain rank lookup (q284's machinery without the variant "
        "split): cumulative counts over DISTINCT latency values, "
        "type-1 quantile rank r = ceil(d*N/10) selected by f_prev < r "
        "<= f — never a fact-grain sort.  Physical: one user-grain "
        "window + rollup (the only fact-sized shuffle), a distinct-"
        "value cumulative frame, and a 9-row broadcast target join "
        "with the rank range as residual.",
    tags=("events", "funnel", "distribution", "window"),
)
def q298(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    fv = e.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu).alias(
            "first_view"
        ),
    )
    conv = (
        fv.where(
            (F.col("event_type") == "purchase")
            & F.col("first_view").isNotNull()
            & (F.col("ts") > F.col("first_view"))
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST((unix_micros(MIN(ts)) - unix_micros(MIN(first_view)))"
                " div 1000000 AS BIGINT)"
            ).alias("latency_s")
        )
    )
    g = conv.groupBy("latency_s").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    c = g.select(
        "latency_s",
        "cnt",
        F.sum("cnt")
        .over(Window.orderBy("latency_s").rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("f"),
        F.sum("cnt").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    targets = (
        c.select("n")
        .limit(1)
        .select(F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d"), "n")
        .select("d", F.expr("CAST((d * n + 9) div 10 AS BIGINT)").alias("r"))
    )
    return (
        c.join(
            F.broadcast(targets),
            (F.col("f") >= F.col("r")) & (F.col("f") - F.col("cnt") < F.col("r")),
        )
        .groupBy(F.col("d").alias("decile"))
        .agg(
            F.min("n").cast("bigint").alias("n_users"),
            F.min("latency_s").cast("bigint").alias("latency_s"),
        )
    )


# ---------------------------------------------------------------------------
# q299: GDPR Art. 15 subject-access export manifest
# ---------------------------------------------------------------------------

@register(
    "q299_subject_access_export",
    sql="""
    WITH subjects AS (
      SELECT c_custkey, c_name FROM customer WHERE c_custkey % 97 = 0
    ),
    o AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_c,
             CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS first_order,
             CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS last_order
      FROM orders
      WHERE o_custkey % 97 = 0
      GROUP BY 1
    ),
    l AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_lineitems
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_custkey % 97 = 0
      GROUP BY 1
    )
    SELECT s.c_custkey AS custkey, s.c_name AS name,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(l.n_lineitems, 0) AS BIGINT) AS n_lineitems,
           CAST(round((CAST(coalesce(o.spend_c, 0) AS DOUBLE) / 100) * 1e2) AS BIGINT) / 1e2 AS total_spend,
           o.first_order, o.last_order
    FROM subjects s
    LEFT JOIN o ON o.o_custkey = s.c_custkey
    LEFT JOIN l ON l.o_custkey = s.c_custkey
    """,
    doc="GDPR Article 15 subject-access export manifest (the read-side "
        "twin of q177's erasure cascade): for each requesting subject "
        "(custkey % 97 = 0), the artifact inventory an export bundle "
        "needs — order count, lineitem count, exact total spend "
        "(cents), first/last order dates; subjects with no data still "
        "get a manifest row (LEFT joins, zero-filled).  Physical: the "
        "subject predicate pushes to both fact scans (modulo filter at "
        "the parquet reader), lineitems reach custkey grain through "
        "one orderkey join of pre-filtered orders, and the final "
        "assembly joins three subject-grain frames — at 100 TB the "
        "export never scans more than the subjects' own rows post-"
        "pushdown.",
    tags=("governance", "customer", "orders", "lineitem"),
)
def q299(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    subjects = c.where(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )
    so = o.where(F.col("o_custkey") % 97 == 0)
    o_agg = so.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("spend_c"),
        # dates emit as strings: the gate's canon renders Spark date
        # objects and DuckDB datetime64 differently (round5d q196 rule)
        F.min(F.col("o_orderdate").cast("date")).cast("string").alias(
            "first_order"
        ),
        F.max(F.col("o_orderdate").cast("date")).cast("string").alias(
            "last_order"
        ),
    )
    # no broadcast hint: `so` is fact-derived (1/97 of orders), so it
    # grows with scale — AQE picks broadcast when it fits and falls
    # back to a shuffle join when it doesn't
    l_agg = (
        li.join(
            so.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lineitems"))
    )
    return (
        subjects.join(o_agg, subjects["custkey"] == o_agg["o_custkey"], "left")
        .drop("o_custkey")
        .join(l_agg, subjects["custkey"] == l_agg["o_custkey"], "left")
        .drop("o_custkey")
        .select(
            "custkey",
            "name",
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce("n_lineitems", F.lit(0))
            .cast("bigint")
            .alias("n_lineitems"),
            pround(F.coalesce("spend_c", F.lit(0)).cast("double") / 100, 2).alias("total_spend"),
            "first_order",
            "last_order",
        )
    )


# ---------------------------------------------------------------------------
# q300: token-budget waterfilling allocation across sources
# ---------------------------------------------------------------------------

@register(
    "q300_token_budget_waterfill",
    sql="""
    WITH avail AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS tokens
      FROM documents GROUP BY 1
    ),
    ranked AS (
      SELECT source, tokens,
             CAST(row_number() OVER (ORDER BY tokens, source) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS m,
             CAST(coalesce(SUM(tokens) OVER (ORDER BY tokens, source
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING), 0) AS BIGINT)
               AS prefix_prev,
             CAST(SUM(tokens) OVER () AS BIGINT) // 2 AS budget
      FROM avail
    ),
    cand AS (
      SELECT *,
             CAST(budget - prefix_prev AS DOUBLE)
               / CAST(m - rn + 1 AS DOUBLE) AS t_cand
      FROM ranked
    ),
    pick AS (
      SELECT *,
             MIN(CASE WHEN t_cand <= CAST(tokens AS DOUBLE)
                      THEN rn END) OVER () AS rn_star
      FROM cand
    ),
    lvl AS (
      SELECT *,
             MAX(CASE WHEN rn = rn_star THEN t_cand END) OVER () AS t_star
      FROM pick
    )
    SELECT source, tokens,
           CAST(round((CASE WHEN rn < rn_star THEN CAST(tokens AS DOUBLE)
                      ELSE t_star END) * 1e4) AS BIGINT) / 1e4 AS allocation,
           (rn < rn_star) AS saturated,
           budget
    FROM lvl
    """,
    doc="Token-budget waterfilling across sources (the mixture-"
        "allocation step a pretraining data plan runs after q107's "
        "weights): given per-source token inventories and a total "
        "budget of half the corpus, find the unique water level t with "
        "sum(min(avail_s, t)) = budget — sources below t contribute "
        "everything (saturated), the rest contribute exactly t.  "
        "Closed form by sorting: with sources ordered by inventory, "
        "the level sits in the first segment where (budget - "
        "prefix)/(remaining) <= avail, so the whole solve is one sort "
        "+ prefix-sum window over the source frame — no iteration, no "
        "driver loop.  Physical: one corpus-token count (source-grain "
        "shuffle), then window passes over the ~20-row source frame; "
        "the allocation math costs nothing at any scale.",
    tags=("llmdata", "documents", "sampling", "window"),
)
def q300(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    avail = d.groupBy("source").agg(
        F.sum(F.size(_words())).cast("bigint").alias("tokens")
    )
    ws = Window.orderBy("tokens", "source")
    wall = Window.partitionBy()
    ranked = avail.select(
        "source",
        "tokens",
        F.row_number().over(ws).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("m"),
        F.coalesce(
            F.sum("tokens").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("prefix_prev"),
        F.expr("CAST(SUM(tokens) OVER () AS BIGINT) div 2").alias("budget"),
    )
    cand = ranked.withColumn(
        "t_cand",
        (F.col("budget") - F.col("prefix_prev")).cast("double")
        / (F.col("m") - F.col("rn") + 1).cast("double"),
    )
    pick = cand.withColumn(
        "rn_star",
        F.min(
            F.when(F.col("t_cand") <= F.col("tokens").cast("double"), F.col("rn"))
        ).over(wall),
    )
    lvl = pick.withColumn(
        "t_star",
        F.max(F.when(F.col("rn") == F.col("rn_star"), F.col("t_cand"))).over(wall),
    )
    return lvl.select(
        "source",
        "tokens",
        pround(F.when(F.col("rn") < F.col("rn_star"), F.col("tokens").cast("double"))
            .otherwise(F.col("t_star")), 4).alias("allocation"),
        (F.col("rn") < F.col("rn_star")).alias("saturated"),
        "budget",
    )


# ---------------------------------------------------------------------------
# q301: quantile normalization of per-source doc lengths
# ---------------------------------------------------------------------------

@register(
    "q301_quantile_normalization",
    sql="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS BIGINT) AS r,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, source, n_chars,
             ((2 * r - 1) * n + 2 * ns - 1) // (2 * ns) AS k
      FROM ranked
    ),
    pooled AS (
      SELECT CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS k,
             n_chars AS v
      FROM documents
    )
    SELECT keyed.doc_id, keyed.source, keyed.n_chars,
           CAST(pooled.v AS BIGINT) AS norm_chars
    FROM keyed JOIN pooled USING (k)
    """,
    doc="Quantile normalization of per-source document lengths onto "
        "the pooled length distribution (the distribution-alignment "
        "step that makes per-source length-bucket sampling comparable "
        "across sources): doc at within-source rank r of n_s maps to "
        "percentile (2r-1)/(2n_s), realized as the pooled order "
        "statistic at rank k = ceil(p*N) — ALL index arithmetic stays "
        "integer (k = ((2r-1)N + 2n_s - 1) div 2n_s), and the lookup "
        "is an EQUI join on k, never a range probe.  Physical: two "
        "rank windows (per-source, pooled) + one integer-key join.  "
        "The pooled global row_number is a single-partition sort "
        "locally; at 100 TB it becomes the two-phase range-partitioned "
        "rank (range-repartition by value, per-partition row_number, "
        "offset by per-partition counts — q53's numbering machinery); "
        "the operator's join shape is unchanged by that swap.",
    tags=("llmdata", "documents", "distribution", "window"),
)
def q301(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .cast("bigint")
        .alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("bigint")
        .alias("ns"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    keyed = ranked.select(
        "doc_id",
        "source",
        "n_chars",
        F.expr("((2 * r - 1) * n + 2 * ns - 1) div (2 * ns)").alias("k"),
    )
    pooled = d.select(
        F.row_number()
        .over(Window.orderBy("n_chars", "doc_id"))
        .cast("bigint")
        .alias("k"),
        F.col("n_chars").alias("v"),
    )
    return keyed.join(pooled, "k").select(
        "doc_id", "source", "n_chars", F.col("v").cast("bigint").alias("norm_chars")
    )


# ---------------------------------------------------------------------------
# q302: character-entropy compression proxy per source
# ---------------------------------------------------------------------------

@register(
    "q302_char_entropy_proxy",
    sql="""
    WITH chars AS (
      SELECT source, substr(text, i, 1) AS ch
      FROM (SELECT source, text, unnest(range(1, length(text) + 1)) AS i
            FROM documents WHERE length(text) > 0)
    ),
    counts AS (
      SELECT source, ch, CAST(COUNT(*) AS BIGINT) AS c
      FROM chars GROUP BY 1, 2
    ),
    terms AS (
      SELECT source, c,
             c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)
               AS c_ln_c_micros
      FROM counts
    ),
    agg AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_chars,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
             CAST(SUM(c_ln_c_micros) AS BIGINT) AS sum_micros
      FROM terms GROUP BY 1
    )
    SELECT source, n_chars, n_distinct_chars,
           CAST(round(((CAST(n_chars AS DOUBLE)
                  * CAST(CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000000)
                              AS BIGINT) AS DOUBLE)
                  - CAST(sum_micros AS DOUBLE))
                 / CAST(n_chars AS DOUBLE) / 1000000
                 / 0.6931471805599453) * 1e6) AS BIGINT) / 1e6 AS entropy_bits
    FROM agg
    """,
    doc="Per-source character-entropy compression proxy (low-entropy "
        "sources are template/boilerplate-heavy and compress away — a "
        "standard cheap quality screen before expensive dedup): H = "
        "(N ln N - sum c ln c)/N in bits from exact per-char counts.  "
        "Every ln term is integer-micro-rounded BEFORE the cross-row "
        "sum (the micros-ln rule: unordered double sums never cross "
        "rows) and the two final divisions are single shared-tree "
        "expressions.  Physical: a char-grain explode (corpus bytes -> "
        "rows, embarrassingly parallel), one (source, char)-grain "
        "count shuffle, one source rollup; alphabet size bounds the "
        "aggregate state at ~alphabet x sources rows.",
    tags=("llmdata", "documents", "quality", "agg"),
)
def q302(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.length("text") > 0)
    par = spark.sparkContext.defaultParallelism
    chars = d.repartition(par).select(
        "source",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        "text",
    ).select("source", F.expr("substring(text, i, 1)").alias("ch"))
    counts = chars.groupBy("source", "ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    terms = counts.select(
        "source",
        "c",
        (
            F.col("c")
            * F.round(F.log(F.col("c").cast("double")) * 1000000).cast("bigint")
        ).alias("c_ln_c_micros"),
    )
    agg = terms.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
        F.sum("c_ln_c_micros").cast("bigint").alias("sum_micros"),
    )
    n = F.col("n_chars").cast("double")
    ln_n_micros = F.round(F.log(n) * 1000000).cast("bigint").cast("double")
    return agg.select(
        "source",
        "n_chars",
        "n_distinct_chars",
        pround((n * ln_n_micros - F.col("sum_micros").cast("double"))
            / n
            / 1000000
            / F.lit(0.6931471805599453), 6).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# q303: experiment power analysis per event type
# ---------------------------------------------------------------------------

@register(
    "q303_power_analysis",
    sql="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
                  AS BIGINT) AS sx,
             CAST(SUM(CAST(CAST(round(coalesce(value, 0) * 100) AS DECIMAL(18,0))
                           * CAST(round(coalesce(value, 0) * 100) AS DECIMAL(18,0))
                           AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
      FROM events GROUP BY 1
    )
    SELECT event_type, n,
           CAST(round((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100) * 1e6) AS BIGINT) / 1e6 AS mean_value,
           CAST(round((CASE WHEN n > 1 THEN
                 (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) / 10000 END) * 1e6) AS BIGINT) / 1e6 AS variance,
           CAST(ceil(CASE WHEN n > 1 AND sx > 0 THEN
                2 * ((1.959963985 + 0.8416212336)
                     * (1.959963985 + 0.8416212336))
                  * ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                  / ((0.05 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                     * (0.05 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                END) AS BIGINT) AS n_per_arm_required
    FROM m
    """,
    doc="Experiment power analysis per event type (the planning step "
        "BEFORE q248/q279's readouts): from exact integer moments "
        "(cents sums, DECIMAL(18) squares so the 36-digit products "
        "stay exact), the two-sample-z sample size per arm to detect "
        "a 5% relative lift of the mean at alpha=0.05 / power 0.80: "
        "n = 2 (z_a + z_b)^2 sigma^2 / delta^2 with the z constants "
        "as shared literals.  Degenerate guards: variance needs n>1, "
        "the relative delta needs a positive mean — both CASE-guarded "
        "identically in BOTH engines (ANSI rule), yielding NULL for "
        "the un-plannable arm.  Physical: one fact scan, one 5-row "
        "rollup; the formula evaluates on the rollup frame for free.",
    tags=("experimentation", "events", "stats", "agg"),
)
def q303(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cents = _cents("value")
    d18 = cents.cast("decimal(18,0)")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).cast("bigint").alias("sx"),
        F.sum((d18 * d18).cast("decimal(38,0)")).cast("decimal(38,0)").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    var_c2 = (nd * sxxd - sxd * sxd) / (nd * (F.col("n") - 1).cast("double"))
    delta_c = F.lit(0.05) * sxd / nd
    zsum2 = F.lit((1.959963985 + 0.8416212336) * (1.959963985 + 0.8416212336))
    return m.select(
        "event_type",
        "n",
        pround(sxd / nd / 100, 6).alias("mean_value"),
        pround(F.when(F.col("n") > 1, var_c2 / 10000), 6).alias("variance"),
        F.ceil(
            F.when(
                (F.col("n") > 1) & (F.col("sx") > 0),
                F.lit(2) * zsum2 * var_c2 / (delta_c * delta_c),
            )
        )
        .cast("bigint")
        .alias("n_per_arm_required"),
    )


# ---------------------------------------------------------------------------
# q304: decision-stump split finder by weighted Gini impurity
# ---------------------------------------------------------------------------

@register(
    "q304_gini_split_finder",
    sql="""
    WITH g AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT) AS n_ret
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT qty,
             CAST(SUM(n_all) OVER (ORDER BY qty
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
             CAST(SUM(n_ret) OVER (ORDER BY qty
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rl,
             CAST(SUM(n_all) OVER () AS BIGINT) AS n,
             CAST(SUM(n_ret) OVER () AS BIGINT) AS r
      FROM g
    ),
    scored AS (
      SELECT qty AS threshold, nl AS n_left, n - nl AS n_right,
             CASE WHEN nl > 0 AND n - nl > 0 THEN
               (CAST(nl AS DOUBLE) / CAST(n AS DOUBLE))
                 * (1.0 - (CAST(rl AS DOUBLE) / CAST(nl AS DOUBLE))
                          * (CAST(rl AS DOUBLE) / CAST(nl AS DOUBLE))
                        - (CAST(nl - rl AS DOUBLE) / CAST(nl AS DOUBLE))
                          * (CAST(nl - rl AS DOUBLE) / CAST(nl AS DOUBLE)))
               + (CAST(n - nl AS DOUBLE) / CAST(n AS DOUBLE))
                 * (1.0 - (CAST(r - rl AS DOUBLE) / CAST(n - nl AS DOUBLE))
                          * (CAST(r - rl AS DOUBLE) / CAST(n - nl AS DOUBLE))
                        - (CAST((n - nl) - (r - rl) AS DOUBLE)
                           / CAST(n - nl AS DOUBLE))
                          * (CAST((n - nl) - (r - rl) AS DOUBLE)
                             / CAST(n - nl AS DOUBLE)))
             END AS gini
      FROM c
    ),
    flagged AS (
      SELECT *, MIN(gini) OVER () AS best FROM scored
    ),
    tied AS (
      SELECT *, MIN(CASE WHEN gini = best THEN threshold END) OVER () AS best_t
      FROM flagged
    )
    SELECT threshold, n_left, n_right, CAST(round((gini) * 1e9) AS BIGINT) / 1e9 AS gini,
           CASE WHEN gini IS NULL THEN FALSE
                ELSE gini = best AND threshold = best_t END AS is_best
    FROM tied
    """,
    doc="Decision-stump split finder (the in-database CART node "
        "primitive): for every candidate threshold t on l_quantity, "
        "the weighted Gini impurity of splitting lineitems into qty<=t "
        "vs qty>t for predicting l_returnflag='R'.  Class counts "
        "cumulate at DISTINCT-VALUE grain (50 quantity values, never a "
        "fact-grain sort); each impurity is one shared-tree double "
        "expression over those exact integers; splits with an empty "
        "side are CASE-guarded to NULL in both engines (ANSI rule) and "
        "excluded from the argmin; is_best breaks impurity ties at the "
        "smallest threshold.  Physical: one fact scan -> value-grain "
        "rollup, cumulative windows over the 50-row frame, argmin via "
        "window min — the full stump costs one shuffle.",
    tags=("stats", "lineitem", "window", "distribution"),
)
def q304(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_quantity").cast("bigint").alias("qty")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.count(F.when(F.col("l_returnflag") == "R", 1))
        .cast("bigint")
        .alias("n_ret"),
    )
    wcum = Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c = g.select(
        "qty",
        F.sum("n_all").over(wcum).cast("bigint").alias("nl"),
        F.sum("n_ret").over(wcum).cast("bigint").alias("rl"),
        F.sum("n_all").over(wall).cast("bigint").alias("n"),
        F.sum("n_ret").over(wall).cast("bigint").alias("r"),
    )
    nl, rl = F.col("nl"), F.col("rl")
    n, r = F.col("n"), F.col("r")
    nr = n - nl
    rr = r - rl
    pl = rl.cast("double") / nl.cast("double")
    ql = (nl - rl).cast("double") / nl.cast("double")
    pr = rr.cast("double") / nr.cast("double")
    qr = (nr - rr).cast("double") / nr.cast("double")
    gini = F.when(
        (nl > 0) & (nr > 0),
        (nl.cast("double") / n.cast("double")) * (F.lit(1.0) - pl * pl - ql * ql)
        + (nr.cast("double") / n.cast("double")) * (F.lit(1.0) - pr * pr - qr * qr),
    )
    scored = c.select(
        F.col("qty").alias("threshold"),
        nl.alias("n_left"),
        nr.cast("bigint").alias("n_right"),
        gini.alias("gini0"),
    )
    best = F.min("gini0").over(wall)
    best_t = F.min(F.when(F.col("gini0") == best, F.col("threshold"))).over(wall)
    return scored.select(
        "threshold",
        "n_left",
        "n_right",
        pround(F.col("gini0"), 9).alias("gini"),
        F.when(F.col("gini0").isNull(), F.lit(False))
        .otherwise((F.col("gini0") == best) & (F.col("threshold") == best_t))
        .alias("is_best"),
    )


# ---------------------------------------------------------------------------
# q305: cross-shopping brand breadth by market segment
# ---------------------------------------------------------------------------

@register(
    "q305_cross_shopping_breadth",
    sql="""
    WITH purchases AS (
      SELECT DISTINCT o.o_custkey AS custkey, p.p_brand AS brand
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
    ),
    breadth AS (
      SELECT custkey, CAST(COUNT(*) AS BIGINT) AS n_brands
      FROM purchases GROUP BY 1
    )
    SELECT c.c_mktsegment AS segment,
           LEAST(b.n_brands, 8) AS brand_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(b.n_brands) AS BIGINT) AS total_brand_links
    FROM breadth b JOIN customer c ON c.c_custkey = b.custkey
    GROUP BY 1, 2
    """,
    doc="Cross-shopping breadth: how many distinct brands each "
        "customer has purchased, histogrammed per market segment "
        "(bucket capped at 8+ so the output grain is fixed) — the "
        "assortment-penetration view a category manager reads next to "
        "q277's assortment overlap.  Physical: the only fact-sized "
        "work is lineitem -> (custkey, brand) DISTINCT, reached "
        "through one orderkey join (orders projected to two columns) "
        "and a BROADCAST part lookup for the brand; breadth and the "
        "histogram are dimension-grain rollups after that.",
    tags=("relational", "customer", "orders", "agg"),
)
def q305(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    purchases = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(F.col("o_custkey").alias("custkey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    breadth = purchases.groupBy("custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brands")
    )
    return (
        breadth.join(c, breadth["custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.least(F.col("n_brands"), F.lit(8)).alias("brand_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("n_brands").cast("bigint").alias("total_brand_links"),
        )
    )


# ---------------------------------------------------------------------------
# q306: log-normal fit of doc lengths per source
# ---------------------------------------------------------------------------

@register(
    "q306_lognormal_length_fit",
    sql="""
    WITH t AS (
      SELECT source,
             CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000000) AS BIGINT)
               AS ln_micros
      FROM documents WHERE n_chars > 0
    ),
    m AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ln_micros) AS BIGINT) AS s1,
             CAST(SUM(CAST(CAST(ln_micros AS DECIMAL(18,0))
                           * CAST(ln_micros AS DECIMAL(18,0))
                           AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
      FROM t GROUP BY 1
    )
    SELECT source, n,
           CAST(round((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000) * 1e6) AS BIGINT) / 1e6 AS mu_ln,
           CAST(round((CASE WHEN n > 1 THEN
                 sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) / 1000000
                 END) * 1e6) AS BIGINT) / 1e6 AS sigma_ln,
           CAST(round((CASE WHEN n > 1 THEN
                 exp(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000
                     + ((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                       / 2000000000000) END) * 1e6) AS BIGINT) / 1e6 AS fitted_mean_chars
    FROM m
    """,
    doc="Log-normal fit of per-source document lengths (the standard "
        "length model for sampling-budget design; mu/sigma of ln "
        "length plus the implied fitted mean exp(mu + sigma^2/2)): "
        "each ln(length) is integer-micro-rounded BEFORE the cross-row "
        "sums (micros-ln rule), second moments ride DECIMAL(18) "
        "operands so the 36-digit squares stay exact, and mu/sigma/"
        "mean are single shared-tree double expressions over those "
        "exact sums with the n>1 variance guard CASE'd in both "
        "engines.  Physical: one scan, one source-grain rollup of "
        "three integer sums.",
    tags=("llmdata", "documents", "distribution", "stats"),
)
def q306(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    ln_micros = F.round(
        F.log(F.col("n_chars").cast("double")) * 1000000
    ).cast("bigint")
    t = d.select("source", ln_micros.alias("ln_micros"))
    d18 = F.col("ln_micros").cast("decimal(18,0)")
    m = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ln_micros").cast("bigint").alias("s1"),
        F.sum((d18 * d18).cast("decimal(38,0)")).cast("decimal(38,0)").alias("s2"),
    )
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    var_micros2 = (nd * s2d - s1d * s1d) / (nd * (F.col("n") - 1).cast("double"))
    return m.select(
        "source",
        "n",
        pround(s1d / nd / 1000000, 6).alias("mu_ln"),
        pround(F.when(F.col("n") > 1, F.sqrt(var_micros2) / 1000000), 6).alias("sigma_ln"),
        pround(F.when(
                F.col("n") > 1,
                F.exp(s1d / nd / 1000000 + var_micros2 / F.lit(2000000000000.0)),
            ), 6).alias("fitted_mean_chars"),
    )


# ---------------------------------------------------------------------------
# q307: Simpson's-paradox detector over discount->quantity slopes
# ---------------------------------------------------------------------------

@register(
    "q307_simpsons_paradox",
    sql="""
    WITH f AS (
      SELECT p.p_brand AS brand, s.s_nationkey AS nationkey,
             CAST(round(l.l_discount * 100) AS BIGINT) AS x,
             CAST(round(l.l_quantity) AS BIGINT) AS y
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
    ),
    g AS (
      SELECT brand, nationkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM f GROUP BY 1, 2
    ),
    signs AS (
      SELECT brand, nationkey, n, sx, sy, sxy,
             CASE WHEN n * sxy - sx * sy > 0 THEN 1
                  WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS g_sign
      FROM g
    ),
    pooled AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN g_sign = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN g_sign = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
             CAST(SUM(n) AS BIGINT) AS np,
             CAST(SUM(sx) AS BIGINT) AS sxp,
             CAST(SUM(sy) AS BIGINT) AS syp,
             CAST(SUM(sxy) AS BIGINT) AS sxyp
      FROM signs GROUP BY 1
    )
    SELECT brand, n_groups, n_pos, n_neg,
           CASE WHEN np * sxyp - sxp * syp > 0 THEN 1
                WHEN np * sxyp - sxp * syp < 0 THEN -1 ELSE 0 END AS pooled_sign,
           ((np * sxyp - sxp * syp > 0 AND n_pos = 0 AND n_neg > 0)
            OR (np * sxyp - sxp * syp < 0 AND n_neg = 0 AND n_pos > 0))
             AS paradox
    FROM pooled
    """,
    doc="Simpson's-paradox detector: per brand, the SIGN of the "
        "discount -> quantity association pooled across supplier "
        "nations vs within each nation; a brand is flagged when the "
        "pooled slope direction strictly reverses EVERY non-flat "
        "within-nation direction — the aggregation-bias screen that "
        "must run before any q139-style pooled regression is trusted.  "
        "Association signs come from the covariance NUMERATOR "
        "n*Sxy - Sx*Sy over exact integer sums (discount cents, whole "
        "units), so the whole detector is INTEGER arithmetic end to "
        "end — no doubles anywhere, hence nothing to guard or round.  "
        "Physical: one fact scan with two broadcast dim lookups, a "
        "(brand, nation)-grain rollup, and a brand-grain re-rollup "
        "(moments of the union are sums of group moments — q248's "
        "rule), so the pooled pass is free.",
    tags=("stats", "lineitem", "experimentation", "agg"),
)
def q307(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    f = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("p_brand").alias("brand"),
            F.col("s_nationkey").alias("nationkey"),
            F.round(F.col("l_discount") * 100).cast("bigint").alias("x"),
            F.round(F.col("l_quantity")).cast("bigint").alias("y"),
        )
    )
    g = f.groupBy("brand", "nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    signs = g.select(
        "brand",
        "n",
        "sx",
        "sy",
        "sxy",
        F.when(num > 0, 1).when(num < 0, -1).otherwise(0).alias("g_sign"),
    )
    pooled = signs.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("g_sign") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("g_sign") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_neg"),
        F.sum("n").cast("bigint").alias("np"),
        F.sum("sx").cast("bigint").alias("sxp"),
        F.sum("sy").cast("bigint").alias("syp"),
        F.sum("sxy").cast("bigint").alias("sxyp"),
    )
    pnum = F.col("np") * F.col("sxyp") - F.col("sxp") * F.col("syp")
    return pooled.select(
        "brand",
        "n_groups",
        "n_pos",
        "n_neg",
        F.when(pnum > 0, 1).when(pnum < 0, -1).otherwise(0).alias("pooled_sign"),
        (
            ((pnum > 0) & (F.col("n_pos") == 0) & (F.col("n_neg") > 0))
            | ((pnum < 0) & (F.col("n_neg") == 0) & (F.col("n_pos") > 0))
        ).alias("paradox"),
    )


# ---------------------------------------------------------------------------
# q308: Burrows' delta stylometric distance between sources
# ---------------------------------------------------------------------------

@register(
    "q308_burrows_delta",
    sql="""
    WITH toks AS (
      SELECT source, UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    totals AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS t FROM toks GROUP BY 1),
    wcounts AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
    ),
    topw AS (
      SELECT tok FROM (
        SELECT tok, SUM(c) AS tc,
               row_number() OVER (ORDER BY SUM(c) DESC, tok) AS rk
        FROM wcounts GROUP BY tok
      ) WHERE rk <= 50
    ),
    scaffold AS (SELECT s.source, s.t, w.tok FROM totals s CROSS JOIN topw w),
    freqs AS (
      SELECT sc.source, sc.tok,
             (coalesce(wc.c, 0) * 1000000000) // sc.t AS f_ppb
      FROM scaffold sc
      LEFT JOIN wcounts wc ON wc.source = sc.source AND wc.tok = sc.tok
    ),
    stats AS (
      SELECT tok,
             CAST(COUNT(*) AS BIGINT) AS ns,
             CAST(SUM(f_ppb) AS BIGINT) AS s1,
             CAST(SUM(CAST(CAST(f_ppb AS DECIMAL(18,0))
                           * CAST(f_ppb AS DECIMAL(18,0))
                           AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
      FROM freqs GROUP BY 1
    ),
    z AS (
      SELECT f.source, f.tok,
             CASE WHEN st.ns * st.s2 - CAST(st.s1 AS DECIMAL(38,0))
                                       * CAST(st.s1 AS DECIMAL(38,0)) > 0
                  THEN (CAST(f.f_ppb AS DOUBLE)
                        - CAST(st.s1 AS DOUBLE) / CAST(st.ns AS DOUBLE))
                       / sqrt((CAST(st.ns AS DOUBLE) * CAST(st.s2 AS DOUBLE)
                               - CAST(st.s1 AS DOUBLE) * CAST(st.s1 AS DOUBLE))
                              / (CAST(st.ns AS DOUBLE) * CAST(st.ns AS DOUBLE)))
             END AS z
      FROM freqs f JOIN stats st USING (tok)
    ),
    pair_terms AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(round(abs(a.z - b.z) * 1000000) AS BIGINT) AS dz_micros
      FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
      WHERE a.z IS NOT NULL AND b.z IS NOT NULL
    )
    SELECT src_a, src_b,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(round((CAST(SUM(dz_micros) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1000000) * 1e6) AS BIGINT) / 1e6 AS delta
    FROM pair_terms GROUP BY 1, 2
    """,
    doc="Burrows' delta stylometric distance between sources (Burrows "
        "2002, the standard authorship-attribution measure — here the "
        "source-style drift screen): over the corpus top-50 words, "
        "each source's relative frequency integerizes to parts-per-"
        "billion via INTEGER division (truncation identical in both "
        "engines), per-word population z-scores across sources come "
        "from exact ppb moments (DECIMAL(18) squares), and delta(a,b) "
        "= mean |z_a - z_b| with each term micro-rounded BEFORE the "
        "cross-word sum (micros rule).  Zero-variance words are "
        "CASE'd to NULL and excluded symmetrically.  Physical: token-"
        "grain counts once, a deliberate |sources| x 50 scaffold cross "
        "join (dims-only, allowlisted) to densify missing words with "
        "zeros, and the pair join runs on the 1000-row z frame.",
    tags=("llmdata", "documents", "stats", "similarity"),
)
def q308(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    toks = d.repartition(par).select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    # r10: ONE corpus tokenize pass.  wcounts (source x token grain) is
    # the pass's product and every other frame derives from it — totals
    # is its per-source sum (identical to counting tokens directly),
    # topw its per-token sum.  Unpinned, the explode re-ran for totals,
    # twice more for topw/freqs, and 2x again under the z self-join
    # (12 corpus scans in plans/r10/q308_before.txt).
    wcounts = (
        toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = wcounts.groupBy("source").agg(F.sum("c").cast("bigint").alias("t"))
    topw = (
        wcounts.groupBy("tok")
        .agg(F.sum("c").alias("tc"))
        .withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("tc"), F.asc("tok")))
        )
        .where(F.col("rk") <= 50)
        .select("tok")
    )
    scaffold = totals.crossJoin(F.broadcast(topw))
    freqs = scaffold.join(wcounts, ["source", "tok"], "left").select(
        "source",
        "tok",
        F.expr("(coalesce(c, 0) * 1000000000) div t").alias("f_ppb"),
    )
    d18 = F.col("f_ppb").cast("decimal(18,0)")
    stats = freqs.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("ns"),
        F.sum("f_ppb").cast("bigint").alias("s1"),
        F.sum((d18 * d18).cast("decimal(38,0)")).cast("decimal(38,0)").alias("s2"),
    )
    nsd = F.col("ns").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    var_num = (
        F.col("ns").cast("decimal(38,0)") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1").cast("decimal(38,0)")
    )
    # tiny (50 tokens x sources) but read twice by the self-join below —
    # pin so the scaffold/stats subtree runs once
    z = freqs.join(F.broadcast(stats), "tok").select(
        "source",
        "tok",
        F.when(
            var_num > 0,
            (F.col("f_ppb").cast("double") - s1d / nsd)
            / F.sqrt((nsd * s2d - s1d * s1d) / (nsd * nsd)),
        ).alias("z"),
    ).localCheckpoint(eager=True)
    a = z.alias("a")
    b = z.alias("b")
    pair_terms = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .where(F.col("a.z").isNotNull() & F.col("b.z").isNotNull())
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            F.round(F.abs(F.col("a.z") - F.col("b.z")) * 1000000)
            .cast("bigint")
            .alias("dz_micros"),
        )
    )
    return pair_terms.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        pround(F.sum("dz_micros").cast("double") / F.count(F.lit(1)).cast("double")
            / 1000000, 6).alias("delta"),
    )


# ---------------------------------------------------------------------------
# q309: dedup threshold sensitivity sweep
# ---------------------------------------------------------------------------

@register(
    "q309_dedup_threshold_sweep",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(list_distinct(string_split_regex(lower(trim(text)),
                                                     '\\s+'))) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
    st AS (SELECT t.doc_id, t.tok, s.n_tok FROM toks t JOIN sizes s USING (doc_id)),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM st a JOIN st b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
       AND least(a.n_tok, b.n_tok) >= 0.7 * greatest(a.n_tok, b.n_tok) - 1e-9
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b,
             CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) AS j
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) >= 0.7
    ),
    sweep AS (
      SELECT t.thr, p.id_a, p.id_b
      FROM pairs p
      JOIN (SELECT UNNEST([0.7, 0.8, 0.9]) AS thr) t ON p.j >= t.thr
    ),
    docs_hit AS (
      SELECT thr, id_a AS doc_id FROM sweep
      UNION SELECT thr, id_b FROM sweep
    )
    SELECT s.thr AS threshold,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(d.nd) AS BIGINT) AS n_docs_in_pairs
    FROM sweep s
    JOIN (SELECT thr, COUNT(DISTINCT doc_id) AS nd
          FROM docs_hit GROUP BY 1) d ON d.thr = s.thr
    GROUP BY 1
    """,
    doc="Dedup threshold sensitivity sweep: exact token-set Jaccard "
        "pairs mined ONCE at the loosest threshold (0.7), then the "
        "pair counts and affected-document counts a dedup policy "
        "review needs at 0.7 / 0.8 / 0.9 — the curve that tells you "
        "how much corpus each threshold would remove BEFORE running "
        "the removal.  Physical: one prefix/size-filtered postings "
        "mining pass (q24's machinery; never re-mined per threshold), "
        "a 3-row threshold scaffold joined on the jaccard residual, "
        "and two tiny rollups; output is 3 rows regardless of scale.",
    tags=("llmdata", "dedup", "documents", "distribution"),
)
def q309(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.dedup import ngram_jaccard_pairs

    d = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.7).select(
        "id_a", "id_b", F.col("jaccard").alias("j")
    )
    thr = spark.createDataFrame([(0.7,), (0.8,), (0.9,)], "thr double")
    sweep = pairs.join(F.broadcast(thr), F.col("j") >= F.col("thr")).select(
        "thr", "id_a", "id_b"
    )
    docs_hit = (
        sweep.select("thr", F.col("id_a").alias("doc_id"))
        .union(sweep.select("thr", F.col("id_b").alias("doc_id")))
        .groupBy("thr")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("nd"))
    )
    return (
        sweep.groupBy(F.col("thr").alias("threshold"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .join(
            F.broadcast(docs_hit),
            F.col("threshold") == F.col("thr"),
        )
        .select(
            "threshold",
            "n_pairs",
            F.col("nd").alias("n_docs_in_pairs"),
        )
    )


# ---------------------------------------------------------------------------
# q310: Holm-Bonferroni step-down selection (FWER twin of q292)
# ---------------------------------------------------------------------------

@register(
    "q310_holm_bonferroni",
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
             coalesce(MIN(CASE WHEN p > 0.1 / CAST(m - rk + 1 AS DOUBLE)
                               THEN rk END) OVER (), m + 1) AS first_fail
      FROM ranked
    )
    SELECT nationkey, segment, n_cust, neg_cnt,
           CAST(round((p) * 1e9) AS BIGINT) / 1e9 AS p_score, rk, (rk < first_fail) AS rejected
    FROM cut
    """,
    doc="Holm-Bonferroni step-DOWN selection (Holm 1979) over the same "
        "deterministic cell scores as q292's BH step-up — the family-"
        "wise-error twin that stops at the FIRST failure: sort p "
        "ascending, reject while p_i <= alpha/(m - i + 1), halt at the "
        "first i violating it (everything after stays retained even if "
        "individually small).  Running q292 and q310 on the same score "
        "frame is the standard FDR-vs-FWER sensitivity read.  Ties "
        "break (p, nationkey, segment) as in q292.  Physical: one "
        "customer scan, cell rollup, three window passes over the "
        "125-row frame; the step-down halt is a window MIN over the "
        "failure ranks — no iteration.",
    tags=("experimentation", "customer", "stats", "window"),
)
def q310(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    fail = F.col("p") > F.lit(0.1) / (F.col("m") - F.col("rk") + 1).cast("double")
    cut = ranked.select(
        "*",
        F.coalesce(
            F.min(F.when(fail, F.col("rk"))).over(wall), F.col("m") + 1
        ).alias("first_fail"),
    )
    return cut.select(
        "nationkey",
        "segment",
        "n_cust",
        "neg_cnt",
        pround(F.col("p"), 9).alias("p_score"),
        "rk",
        (F.col("rk") < F.col("first_fail")).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# q311: dedup cluster-size histogram + removal accounting
# ---------------------------------------------------------------------------

@register(
    "q311_cluster_size_histogram",
    sql="""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             UNNEST(list_distinct(string_split_regex(lower(trim(text)),
                                                     '\\s+'))) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
    st AS (SELECT t.doc_id, t.tok, s.n_tok FROM toks t JOIN sizes s USING (doc_id)),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM st a JOIN st b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
       AND least(a.n_tok, b.n_tok) >= 0.95 * greatest(a.n_tok, b.n_tok) - 1e-9
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) >= 0.95
    ),
    enodes AS (SELECT DISTINCT s AS n FROM
               (SELECT id_a AS s FROM edges UNION SELECT id_b FROM edges)),
    reach(n, comp) AS (
      SELECT n, n FROM enodes
      UNION
      SELECT e.d, r.comp FROM reach r
      JOIN (SELECT greatest(id_a, id_b) AS d, least(id_a, id_b) AS s FROM edges
            UNION SELECT least(id_a, id_b), greatest(id_a, id_b) FROM edges) e
        ON e.s = r.n AND r.comp < e.d
    ),
    cc AS (
      SELECT n AS doc_id, MIN(comp) AS comp FROM reach GROUP BY n
      UNION ALL
      SELECT d.doc_id, d.doc_id FROM documents d
      WHERE d.doc_id NOT IN (SELECT n FROM enodes)
    ),
    csizes AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS k FROM cc GROUP BY 1)
    SELECT LEAST(k, 10) AS cluster_size_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(k) AS BIGINT) AS n_docs,
           CAST(SUM(k - 1) AS BIGINT) AS n_removed_if_deduped
    FROM csizes GROUP BY 1
    """,
    doc="Near-dup cluster-size histogram with removal accounting: the "
        "q52 clustering (exact 0.95 token-set Jaccard -> connected "
        "components) rolled up to the distribution a dedup policy "
        "review reads — clusters per size bucket (capped 10+), docs "
        "covered, and docs removed under keep-one-per-cluster.  The "
        "histogram quantifies the dup mass BEFORE any removal runs "
        "(q309 answers threshold choice; this answers blast radius at "
        "the chosen one).  Physical: identical machinery to q52 "
        "(collapse + mining + CC with the small-graph fast path), then "
        "two component-grain rollups; output <= 10 rows at any scale.  "
        "Oracle: DuckDB recursive-CTE min-label closure over the same "
        "symmetric edge orientation.",
    tags=("llmdata", "dedup", "documents", "distribution"),
)
def q311(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.dedup import dedup_clusters

    d = load(spark, sf_dir, "documents")
    clusters = dedup_clusters(d, threshold=0.95)
    csizes = clusters.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    return csizes.groupBy(
        F.least(F.col("k"), F.lit(10)).alias("cluster_size_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("k").cast("bigint").alias("n_docs"),
        F.sum(F.col("k") - 1).cast("bigint").alias("n_removed_if_deduped"),
    )


# ---------------------------------------------------------------------------
# q312: k-anonymity generalization ladder
# ---------------------------------------------------------------------------

@register(
    "q312_generalization_ladder",
    sql="""
    WITH widths AS (SELECT UNNEST([200000, 1000000, 5000000]) AS w),
    classes AS (
      SELECT wd.w,
             c.c_nationkey AS nationkey, c.c_mktsegment AS segment,
             (CAST(round(c.c_acctbal * 100) AS BIGINT) + 10000000) // wd.w
               AS band,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM customer c CROSS JOIN widths wd
      GROUP BY 1, 2, 3, 4
    )
    SELECT w AS band_width_cents,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN k >= 5 THEN k ELSE 0 END) AS BIGINT)
             AS n_customers_safe,
           CAST(SUM(k) AS BIGINT) AS n_customers,
           CAST(round((CAST(SUM(CASE WHEN k >= 5 THEN k ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(k) AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 AS pct_safe
    FROM classes GROUP BY 1
    """,
    doc="k-anonymity generalization ladder (the q296 profile's policy "
        "knob): the balance-band quasi-identifier is generalized "
        "through three widths ($2k / $10k / $50k, integer band "
        "arithmetic on shifted cents) and each rung reports how much "
        "of the population lands in releasable classes (k >= 5) — the "
        "utility-vs-privacy curve a release review walks DOWN until "
        "pct_safe clears policy.  One customer scan fanned out "
        "through a 3-row width scaffold (broadcast; each fact row "
        "emits 3 class rows — the grouping-sets shape, not a re-scan "
        "per rung); class and rung rollups are dimension-grain.",
    tags=("governance", "customer", "distribution", "agg"),
)
def q312(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    widths = spark.createDataFrame([(200000,), (1000000,), (5000000,)], "w long")
    classes = (
        c.crossJoin(F.broadcast(widths))
        .groupBy(
            "w",
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
            F.expr(
                "(CAST(round(c_acctbal * 100) AS BIGINT) + 10000000) div w"
            ).alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    safe = F.sum(F.when(F.col("k") >= 5, F.col("k")).otherwise(0)).cast("bigint")
    return classes.groupBy(F.col("w").alias("band_width_cents")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        safe.alias("n_customers_safe"),
        F.sum("k").cast("bigint").alias("n_customers"),
        pround(safe.cast("double") / F.sum("k").cast("double"), 6).alias("pct_safe"),
    )
