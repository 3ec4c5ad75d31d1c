"""Round-8 catalog entries (q328-q350): link analysis, corpus
governance, and experiment/eval-depth operators a training-data
platform needs that no earlier entry covers — common-neighbor /
Adamic-Adar link prediction over the co-purchase graph, multi-phrase
blocklist auditing (the safety filter pass), difference-in-differences
with cell-variance standard errors, delete-one-cluster jackknife SEs,
absorbing-chain conversion probabilities, sparse tf-idf cosine top-k
via an inverted index, rank-biased overlap between rankings,
propensity-stratified ATT, a word2vec-style negative-sampling table,
split-conformal prediction intervals, exact q-q quantile points, a
streaming additive-histogram parity drain, UMass topic coherence, RAKE
keyphrase extraction (gaps-and-islands, regex-free), MMR diversified
top-k, IPS/SNIPS off-policy evaluation, winsorized moments,
Mann-Whitney U with tie correction, McNemar's paired-classifier test,
Fisherian randomization inference, calibration ECE/MCE, sessionization
gap sensitivity, and BLEU-2 paired-document scoring.

Shared numeric discipline (see round6b/round7/round7b_queries): every
cross-row accumulation happens on EXACT integers — counts, cents, or
per-value transcendentals micro-rounded to BIGINT *before* any sum —
so Spark's partial-aggregation order vs DuckDB's single-threaded order
cannot produce last-ulp drift.  Ratios stay as cross-multiplied
integers until the final emitted expression, which is written with the
identical operation tree on both sides.  Every reachable zero
denominator is CASE-guarded in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import stream_batch_confs
from .catalog import DEC, emit, load, register


# ---------------------------------------------------------------------------
# q328: link prediction over the customer co-purchase graph
# ---------------------------------------------------------------------------

@register(
    "q328_adamic_adar_links",
    sql="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS ord, l_partkey AS part FROM lineitem
    ),
    deg AS (SELECT ord, CAST(COUNT(*) AS BIGINT) AS dc FROM op GROUP BY 1),
    kept AS (
      SELECT op.ord, op.part,
             CAST(round(1e6 / ln(CAST(dc AS DOUBLE))) AS BIGINT) AS aa_m
      FROM op JOIN deg USING (ord) WHERE dc BETWEEN 2 AND 16
    ),
    pd AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS dp FROM kept GROUP BY 1),
    pairs AS (
      SELECT a.part AS pa, b.part AS pb,
             CAST(COUNT(*) AS BIGINT) AS common,
             CAST(SUM(a.aa_m) AS BIGINT) AS aa_sum
      FROM kept a JOIN kept b ON a.ord = b.ord AND a.part < b.part
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT pa, pb, common, aa_sum,
             CAST(common AS DOUBLE) / (da.dp + db.dp - common) AS jaccard
      FROM pairs JOIN pd da ON da.part = pairs.pa
                 JOIN pd db ON db.part = pairs.pb
      WHERE common >= 2
    )
    SELECT pa AS part_a, pb AS part_b, common AS common_orders,
           jaccard, CAST(aa_sum AS DOUBLE) / 1e6 AS adamic_adar
    FROM scored
    ORDER BY aa_sum DESC, pa, pb
    LIMIT 30
    """,
    doc="Link prediction over the order-basket co-purchase graph: for "
        "part pairs sharing >= 2 order baskets, common-neighbor count, "
        "Jaccard over part degrees, and Adamic-Adar (sum over shared "
        "baskets of 1/ln(basket size) — promiscuous baskets count "
        "less, Adamic & Adar 2003), top-30 by AA.  Per-basket "
        "1/ln(deg) is micro-rounded to BIGINT before the pair sums "
        "(deg in 2..16, so no rounding boundary sits within libm's "
        "cross-engine ulp).  Scale: singleton baskets contribute no "
        "pairs and whale baskets are excluded (deg > 16, the q202 "
        "quota rationale) BEFORE pair expansion, so per-basket fanout "
        "is <= C(16,2) = 120 pairs; expansion happens in-task from "
        "each basket's sorted part array (codegen transform/slice, "
        "the fact never self-joins); degrees and Jaccard are computed "
        "on the same filtered graph so the metrics are "
        "self-consistent.  Physical: ONE distinct + ONE groupBy build "
        "the basket table (degree = size(parts), so no degree join), "
        "localCheckpointed for its two consumers (part-degree explode "
        "+ pair expansion).  TakeOrdered top-30 on a unique "
        "(aa_sum, pa, pb) key keeps the cut deterministic.",
    tags=("graph", "recsys", "lineitem"),
)
def q328(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .baskets import capped_baskets, pair_array

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # basket-direct: the degree IS size(parts), so no separate deg
    # frame and no op-deg join — the shared capped-basket kernel's ONE
    # distinct + ONE groupBy build the table, localCheckpointed because
    # both the part-degree explode and the pair expansion consume it
    # (two consumers would otherwise re-run the corpus distinct+collect
    # twice; the PERSIST_PRONE hygiene test covers the drain)
    baskets = (
        capped_baskets(li)
        .select(
            "parts",
            F.round(F.lit(1e6) / F.log(F.size("parts").cast("double")))
            .cast("bigint")
            .alias("aa_m"),
        )
        .localCheckpoint()
    )
    pd_ = (
        baskets.select(F.explode("parts").alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dp"))
    )
    pairs = (
        baskets.select(F.explode(pair_array("parts")).alias("p"), "aa_m")
        .select("p.pa", "p.pb", "aa_m")
        .groupBy("pa", "pb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common"),
            F.sum("aa_m").cast("bigint").alias("aa_sum"),
        )
        .where(F.col("common") >= 2)
    )
    da = pd_.select(F.col("part").alias("pa"), F.col("dp").alias("dpa"))
    db = pd_.select(F.col("part").alias("pb"), F.col("dp").alias("dpb"))
    scored = pairs.join(da, "pa").join(db, "pb")
    return (
        scored.orderBy(F.desc("aa_sum"), "pa", "pb")
        .limit(30)
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("common").alias("common_orders"),
            emit(
                F.col("common").cast("double")
                / (F.col("dpa") + F.col("dpb") - F.col("common"))
            ).alias("jaccard"),
            emit(F.col("aa_sum").cast("double") / F.lit(1e6)).alias("adamic_adar"),
        )
    )


# ---------------------------------------------------------------------------
# q329: multi-phrase blocklist audit (the safety-filter pass)
# ---------------------------------------------------------------------------

# the shared phrase list: baked into BOTH the Spark projection and the
# generated SQL so the two sides are literal-identical by construction.
_BLOCKLIST = (
    "fast table",
    "slow filter",
    "big vector",
    "merge batch",
    "scan slow",
    "table window",
)


def _blocklist_sql() -> str:
    cnt = "((length(lower(text)) - length(replace(lower(text), '{p}', ''))) // length('{p}'))"
    per = ",\n             ".join(
        f"CAST(SUM({cnt.format(p=p)}) AS BIGINT) AS s{i}, "
        f"CAST(SUM(CASE WHEN {cnt.format(p=p)} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d{i}"
        for i, p in enumerate(_BLOCKLIST)
    )
    arms = "\n      UNION ALL ".join(
        f"SELECT source, '{p}' AS phrase, s{i} AS n_matches, "
        f"d{i} AS n_docs_flagged, n_docs FROM agg"
        for i, p in enumerate(_BLOCKLIST)
    )
    return f"""
    WITH agg AS (
      SELECT source,
             {per},
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    long_ AS (
      {arms}
    )
    SELECT source, phrase, n_matches, n_docs_flagged,
           CAST(n_docs_flagged AS DOUBLE) / n_docs AS flag_rate
    FROM long_
    """


@register(
    "q329_blocklist_phrase_audit",
    sql=_blocklist_sql(),
    doc="Multi-phrase blocklist audit — the safety/brand filter pass a "
        "corpus release runs before training: per (source, phrase), "
        "total occurrence count, documents flagged, and flag rate for "
        "a literal phrase blocklist.  Occurrences are counted with the "
        "replace-length identity (len(t) - len(replace(t, p, ''))) / "
        "len(p) — exact integers, leftmost non-overlapping in both "
        "engines, NO regex engine in the loop (Java vs RE2 dialect "
        "drift impossible by construction).  Physical: all |blocklist| "
        "counters evaluate in ONE codegen projection over ONE corpus "
        "scan (the q137 N-rules-one-pass shape), aggregate to source "
        "grain, and only the source x phrase wide row unpivots — at "
        "100 TB the unpivot multiplies dimension rows, never the "
        "corpus.  A 10k-phrase blocklist would swap the projection for "
        "an Aho-Corasick mapInPandas kernel with the same contract.",
    tags=("llmdata", "quality", "documents", "governance"),
)
def q329(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = F.lower(F.col("text"))

    def cnt(p: str) -> F.Column:
        diff = F.length(t) - F.length(F.replace(t, F.lit(p), F.lit("")))
        return (diff / F.length(F.lit(p))).cast("bigint")

    per_doc = d.select(
        "source", *[cnt(p).alias(f"c{i}") for i, p in enumerate(_BLOCKLIST)]
    )
    agg = per_doc.groupBy("source").agg(
        *[
            x
            for i in range(len(_BLOCKLIST))
            for x in (
                F.sum(f"c{i}").cast("bigint").alias(f"s{i}"),
                F.sum(F.when(F.col(f"c{i}") > 0, 1).otherwise(0))
                .cast("bigint")
                .alias(f"d{i}"),
            )
        ],
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    stack = ", ".join(
        f"'{p}', s{i}, d{i}" for i, p in enumerate(_BLOCKLIST)
    )
    return agg.select(
        "source",
        F.expr(
            f"stack({len(_BLOCKLIST)}, {stack}) AS (phrase, n_matches, n_docs_flagged)"
        ),
        "n_docs",
    ).select(
        "source",
        "phrase",
        "n_matches",
        "n_docs_flagged",
        emit(F.col("n_docs_flagged").cast("double") / F.col("n_docs")).alias(
            "flag_rate"
        ),
    )


# ---------------------------------------------------------------------------
# q330: difference-in-differences estimator
# ---------------------------------------------------------------------------

@register(
    "q330_did_estimator",
    sql="""
    WITH f AS (
      SELECT user_id % 2 = 1 AS treat,
             ts >= TIMESTAMP '2024-01-16' AS post,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
      SELECT
        CAST(SUM(CASE WHEN treat AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
        CAST(SUM(CASE WHEN treat AND post THEN 1 ELSE 0 END) AS BIGINT)     AS n_tq,
        CAST(SUM(CASE WHEN NOT treat AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
        CAST(SUM(CASE WHEN NOT treat AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_cq,
        CAST(SUM(CASE WHEN treat AND NOT post THEN cents ELSE 0 END) AS BIGINT) AS s_tp,
        CAST(SUM(CASE WHEN treat AND post THEN cents ELSE 0 END) AS BIGINT)     AS s_tq,
        CAST(SUM(CASE WHEN NOT treat AND NOT post THEN cents ELSE 0 END) AS BIGINT) AS s_cp,
        CAST(SUM(CASE WHEN NOT treat AND post THEN cents ELSE 0 END) AS BIGINT) AS s_cq,
        SUM(CASE WHEN treat AND NOT post THEN CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)) ELSE 0 END) AS q_tp,
        SUM(CASE WHEN treat AND post THEN CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)) ELSE 0 END)     AS q_tq,
        SUM(CASE WHEN NOT treat AND NOT post THEN CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)) ELSE 0 END) AS q_cp,
        SUM(CASE WHEN NOT treat AND post THEN CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)) ELSE 0 END) AS q_cq
      FROM f
    )
    SELECT n_tp AS n_treat_pre, n_tq AS n_treat_post,
           n_cp AS n_ctrl_pre,  n_cq AS n_ctrl_post,
           CASE WHEN n_tp > 0
                THEN CAST(s_tp AS DOUBLE) / (100.0 * n_tp) END AS mean_treat_pre,
           CASE WHEN n_tq > 0
                THEN CAST(s_tq AS DOUBLE) / (100.0 * n_tq) END AS mean_treat_post,
           CASE WHEN n_cp > 0
                THEN CAST(s_cp AS DOUBLE) / (100.0 * n_cp) END AS mean_ctrl_pre,
           CASE WHEN n_cq > 0
                THEN CAST(s_cq AS DOUBLE) / (100.0 * n_cq) END AS mean_ctrl_post,
           CASE WHEN n_tp > 0 AND n_tq > 0 AND n_cp > 0 AND n_cq > 0 THEN
             (CAST(s_tq AS DOUBLE) / (100.0 * n_tq)
              - CAST(s_tp AS DOUBLE) / (100.0 * n_tp))
             - (CAST(s_cq AS DOUBLE) / (100.0 * n_cq)
                - CAST(s_cp AS DOUBLE) / (100.0 * n_cp)) END AS did,
           CASE WHEN n_tp > 1 AND n_tq > 1 AND n_cp > 1 AND n_cq > 1 THEN
             sqrt(
               (CAST(q_tp AS DOUBLE) - CAST(s_tp AS DOUBLE) * s_tp / n_tp)
                 / (n_tp - 1) / n_tp
               + (CAST(q_tq AS DOUBLE) - CAST(s_tq AS DOUBLE) * s_tq / n_tq)
                 / (n_tq - 1) / n_tq
               + (CAST(q_cp AS DOUBLE) - CAST(s_cp AS DOUBLE) * s_cp / n_cp)
                 / (n_cp - 1) / n_cp
               + (CAST(q_cq AS DOUBLE) - CAST(s_cq AS DOUBLE) * s_cq / n_cq)
                 / (n_cq - 1) / n_cq
             ) / 100.0
           END AS se_did
    FROM cells
    """,
    doc="Difference-in-differences: treat = odd user_id, post = second "
        "half of the event window, outcome = purchase value.  DiD = "
        "(post - pre) treated minus (post - pre) control, with the "
        "standard large-sample SE sqrt(sum of cell var/n) from "
        "Var = (ssq - s^2/n)/(n-1).  All four cells' sufficient "
        "statistics (n, sum cents BIGINT, sum cents^2 DECIMAL(38,0) — "
        "cents is cast to decimal BEFORE squaring, so the per-row "
        "product and the sum are exact at any value scale) come "
        "from ONE conditional-aggregate pass over the fact (the q137 "
        "shape: no joins, no second scan); the estimator and SE are "
        "single-row double expressions with the identical op tree on "
        "both sides, CASE-guarded for degenerate cells (any n <= 1 -> "
        "NULL SE; means guard per cell via their own denominators).",
    tags=("events", "experimentation", "stats", "agg"),
)
def q330(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    f = e.select(
        (F.col("user_id") % 2 == 1).alias("treat"),
        (F.col("ts") >= F.lit("2024-01-16").cast("timestamp")).alias("post"),
        (F.col("value").cast(DEC) * 100).cast("bigint").alias("cents"),
    )
    t, p = F.col("treat"), F.col("post")
    cond = {
        "tp": t & ~p, "tq": t & p, "cp": ~t & ~p, "cq": ~t & p,
    }
    aggs = []
    for k, c in cond.items():
        aggs += [
            F.sum(F.when(c, 1).otherwise(0)).cast("bigint").alias(f"n_{k}"),
            F.sum(F.when(c, F.col("cents")).otherwise(0)).cast("bigint").alias(f"s_{k}"),
            # cast to decimal BEFORE squaring (the q333 discipline) so the
            # per-row product is exact at any value scale instead of
            # silently wrapping in BIGINT past |cents| ~ 3.0e9
            F.sum(
                F.when(
                    c,
                    F.col("cents").cast("decimal(38,0)")
                    * F.col("cents").cast("decimal(38,0)"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias(f"q_{k}"),
        ]
    cells = f.agg(*aggs)

    def mean(k: str) -> F.Column:
        # lazy CASE: empty cells must yield NULL means, not an ANSI
        # divide-by-zero (property-test-found edge)
        return F.when(
            F.col(f"n_{k}") > 0,
            F.col(f"s_{k}").cast("double") / (F.lit(100.0) * F.col(f"n_{k}")),
        )

    def varterm(k: str) -> F.Column:
        n, s, q = F.col(f"n_{k}"), F.col(f"s_{k}"), F.col(f"q_{k}")
        return (
            (q.cast("double") - s.cast("double") * s / n) / (n - 1) / n
        )

    guard = (
        (F.col("n_tp") > 1) & (F.col("n_tq") > 1)
        & (F.col("n_cp") > 1) & (F.col("n_cq") > 1)
    )
    return cells.select(
        F.col("n_tp").alias("n_treat_pre"),
        F.col("n_tq").alias("n_treat_post"),
        F.col("n_cp").alias("n_ctrl_pre"),
        F.col("n_cq").alias("n_ctrl_post"),
        emit(mean("tp")).alias("mean_treat_pre"),
        emit(mean("tq")).alias("mean_treat_post"),
        emit(mean("cp")).alias("mean_ctrl_pre"),
        emit(mean("cq")).alias("mean_ctrl_post"),
        emit(
            F.when(
                (F.col("n_tp") > 0) & (F.col("n_tq") > 0)
                & (F.col("n_cp") > 0) & (F.col("n_cq") > 0),
                (mean("tq") - mean("tp")) - (mean("cq") - mean("cp")),
            )
        ).alias("did"),
        emit(
            F.when(
                guard,
                F.sqrt(
                    varterm("tp") + varterm("tq") + varterm("cp") + varterm("cq")
                )
                / F.lit(100.0),
            )
        ).alias("se_did"),
    )


# ---------------------------------------------------------------------------
# q331: delete-one-cluster jackknife SE for a cluster-sampled mean
# ---------------------------------------------------------------------------

@register(
    "q331_cluster_jackknife_se",
    sql="""
    WITH r AS (
      SELECT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % 16 AS b,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    bk AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(cents) AS BIGINT) AS s_i
      FROM r GROUP BY b
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(SUM(n_i) AS BIGINT) AS n,
             CAST(SUM(s_i) AS BIGINT) AS s
      FROM bk
    ),
    th AS (
      SELECT bk.b,
             CASE WHEN tot.n > bk.n_i THEN
               CAST(round(CAST(tot.s - bk.s_i AS DOUBLE) * 10000.0
                          / (tot.n - bk.n_i)) AS BIGINT) END AS theta_m,
             tot.nb, tot.n, tot.s
      FROM bk, tot
    ),
    ts AS (
      SELECT nb, n, s, CAST(SUM(theta_m) AS BIGINT) AS t_sum
      FROM th GROUP BY 1, 2, 3
    ),
    dev AS (
      SELECT th.nb, th.n, th.s, ts.t_sum,
             SUM(CAST(th.nb * th.theta_m - ts.t_sum AS DECIMAL(38,0))
                 * CAST(th.nb * th.theta_m - ts.t_sum AS DECIMAL(38,0)))
               AS dev2
      FROM th, ts GROUP BY 1, 2, 3, 4
    )
    SELECT n AS n_orders, nb AS n_clusters,
           CAST(s AS DOUBLE) / (100.0 * n) AS grand_mean,
           sqrt(CAST((nb - 1) AS DOUBLE) * CAST(dev2 AS DOUBLE)
                / (CAST(nb AS DOUBLE) * nb * nb)) / 1e6 AS jack_se,
           CAST(s AS DOUBLE) / (100.0 * n)
             - 1.959964 * sqrt(CAST((nb - 1) AS DOUBLE) * CAST(dev2 AS DOUBLE)
                / (CAST(nb AS DOUBLE) * nb * nb)) / 1e6 AS ci_lo,
           CAST(s AS DOUBLE) / (100.0 * n)
             + 1.959964 * sqrt(CAST((nb - 1) AS DOUBLE) * CAST(dev2 AS DOUBLE)
                / (CAST(nb AS DOUBLE) * nb * nb)) / 1e6 AS ci_hi
    FROM dev
    """,
    doc="Delete-one-cluster jackknife standard error for the mean order "
        "value under cluster sampling (customers are the clusters — "
        "orders of one customer are correlated, so the iid SE is "
        "anticonservative; the jackknife over B=16 md5-hash customer "
        "clusters is the deterministic, randomization-free alternative "
        "to a cluster bootstrap).  theta_i = mean excluding cluster i, "
        "computed from per-cluster (sum cents, n) EXACT integers and "
        "micro-rounded to BIGINT (the (S - s_i) * 1e4 double product "
        "is exact below 2^53 — cents totals to ~9e11; past that drop "
        "the 1e4 scale or widen to DECIMAL); deviations use the "
        "cross-multiplied "
        "form B*theta_i - sum(theta) so the squared sum is exact "
        "DECIMAL(38,0); SE = sqrt((B-1)/B * sum dev^2 / B^2) emerges "
        "in one final double expression, identical both engines "
        "(1.959964 normal CI literal shared).  Physical: ONE fact scan "
        "to 16-cluster grain; everything downstream is 16-row math "
        "with single-row broadcast crosses (allowlisted q42 shape).",
    tags=("orders", "experimentation", "stats", "agg"),
)
def q331(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        (
            F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 16
        ).alias("b"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("bigint").alias("cents"),
    )
    bk = o.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("cents").cast("bigint").alias("s_i"),
    )
    tot = bk.agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("s_i").cast("bigint").alias("s"),
    )
    # lazy CASE: the leave-one-out mean is undefined when a single
    # cluster holds every row (n == n_i) — ANSI would otherwise raise
    # on the division; a NULL theta propagates to a NULL jackknife SE
    # on both engines (property-test-found edge)
    th = bk.crossJoin(F.broadcast(tot)).select(
        F.when(
            F.col("n") > F.col("n_i"),
            F.round(
                (F.col("s") - F.col("s_i")).cast("double")
                * F.lit(10000.0)
                / (F.col("n") - F.col("n_i"))
            ).cast("bigint"),
        ).alias("theta_m"),
        "nb",
        "n",
        "s",
    )
    ts = th.groupBy("nb", "n", "s").agg(
        F.sum("theta_m").cast("bigint").alias("t_sum")
    )
    # square in DECIMAL, never BIGINT: devterm ~ B * theta_m reaches
    # ~4e12 micros on this data, so the int64 square would overflow
    # (ANSI error on Spark, promote on DuckDB) — the q327 lesson
    devterm = (F.col("nb") * F.col("theta_m") - F.col("t_sum")).cast(
        "decimal(38,0)"
    )
    dev = (
        th.crossJoin(F.broadcast(ts.select("t_sum")))
        .groupBy("nb", "n", "s", "t_sum")
        .agg(F.sum(devterm * devterm).alias("dev2"))
    )
    se = (
        F.sqrt(
            (F.col("nb") - 1).cast("double")
            * F.col("dev2").cast("double")
            / (F.col("nb").cast("double") * F.col("nb") * F.col("nb"))
        )
        / F.lit(1e6)
    )
    mean = F.col("s").cast("double") / (F.lit(100.0) * F.col("n"))
    return dev.select(
        F.col("n").alias("n_orders"),
        F.col("nb").alias("n_clusters"),
        emit(mean).alias("grand_mean"),
        emit(se).alias("jack_se"),
        emit(mean - F.lit(1.959964) * se).alias("ci_lo"),
        emit(mean + F.lit(1.959964) * se).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# q332: absorbing-chain conversion probability (K-step matrix powers)
# ---------------------------------------------------------------------------

@register(
    "q332_absorbing_markov_conversion",
    sql="""
    WITH states AS (SELECT DISTINCT event_type AS s FROM events),
    seq AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    c AS (
      SELECT event_type AS s, nxt AS t, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    rt AS (SELECT s, CAST(SUM(c) AS BIGINT) AS tot FROM c GROUP BY 1),
    m AS (
      SELECT c.s, c.t, CAST((c.c * 1000000) // rt.tot AS BIGINT) AS t_m
      FROM c JOIN rt USING (s)
    ),
    p0 AS (
      SELECT s, CAST(CASE WHEN s = 'purchase' THEN 1000000 ELSE 0 END
                     AS BIGINT) AS p_m
      FROM states
    ),
    p1 AS (
      SELECT st.s, CAST(CASE WHEN st.s = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS BIGINT) AS p_m
      FROM states st LEFT JOIN (
        SELECT m.s, CAST(SUM((m.t_m * p.p_m) // 1000000) AS BIGINT) AS v
        FROM m JOIN p0 p ON p.s = m.t GROUP BY 1) x ON x.s = st.s
    ),
    p2 AS (
      SELECT st.s, CAST(CASE WHEN st.s = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS BIGINT) AS p_m
      FROM states st LEFT JOIN (
        SELECT m.s, CAST(SUM((m.t_m * p.p_m) // 1000000) AS BIGINT) AS v
        FROM m JOIN p1 p ON p.s = m.t GROUP BY 1) x ON x.s = st.s
    ),
    p3 AS (
      SELECT st.s, CAST(CASE WHEN st.s = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS BIGINT) AS p_m
      FROM states st LEFT JOIN (
        SELECT m.s, CAST(SUM((m.t_m * p.p_m) // 1000000) AS BIGINT) AS v
        FROM m JOIN p2 p ON p.s = m.t GROUP BY 1) x ON x.s = st.s
    ),
    p4 AS (
      SELECT st.s, CAST(CASE WHEN st.s = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS BIGINT) AS p_m
      FROM states st LEFT JOIN (
        SELECT m.s, CAST(SUM((m.t_m * p.p_m) // 1000000) AS BIGINT) AS v
        FROM m JOIN p3 p ON p.s = m.t GROUP BY 1) x ON x.s = st.s
    )
    SELECT p4.s AS event_type,
           CAST(p2.p_m AS DOUBLE) / 1e6 AS p_convert_2,
           CAST(p4.p_m AS DOUBLE) / 1e6 AS p_convert_4
    FROM p4 JOIN p2 ON p2.s = p4.s
    """,
    doc="Absorbing-chain conversion probability: with 'purchase' as the "
        "absorbing state, the probability that a user starting from "
        "each event type reaches purchase within 2 and 4 steps — "
        "p_k = T p_{k-1} with p(purchase) pinned to 1, the matrix-power "
        "extension of q157's one-step transition matrix.  Transition "
        "probabilities are integer micros via exact floor division "
        "(c * 1e6 // row_total, the q134 PageRank recurrence recipe); "
        "each iteration's products floor-divide back to micros before "
        "the <= |states| sum, so all four unrolled iterations are "
        "integer-exact and engine-identical (// == Spark div on "
        "non-negative operands).  Physical: one fact window + one "
        "aggregate build the |states|^2 matrix, localCheckpointed — "
        "four chained iterations would otherwise re-run the corpus "
        "window four times; everything after is <= 5-row joins in one "
        "lazy plan.",
    tags=("events", "graph", "stats", "window"),
)
def q332(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("s"), F.lead("event_type").over(w).alias("t")
    ).where(F.col("t").isNotNull())
    c = seq.groupBy("s", "t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rt = c.groupBy("s").agg(F.sum("c").cast("bigint").alias("tot"))
    # the matrix and state list feed four chained iterations each —
    # localCheckpoint the <= |states|^2 frames so the corpus window
    # runs once, not four times (PERSIST_PRONE covers the drain)
    m = (
        c.join(rt, "s")
        .select("s", "t", F.expr("CAST((c * 1000000) div tot AS BIGINT)").alias("t_m"))
        .localCheckpoint()
    )
    states = (
        e.select(F.col("event_type").alias("s")).distinct().localCheckpoint()
    )
    p = states.select(
        "s",
        F.when(F.col("s") == "purchase", F.lit(1000000))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("p_m"),
    )
    snapshots = {}
    for k in (1, 2, 3, 4):
        x = (
            m.join(p.select(F.col("s").alias("t"), "p_m"), "t")
            .groupBy("s")
            .agg(
                F.sum(F.expr("CAST((t_m * p_m) div 1000000 AS BIGINT)"))
                .cast("bigint")
                .alias("v")
            )
        )
        p = states.join(x, "s", "left").select(
            "s",
            F.when(F.col("s") == "purchase", F.lit(1000000))
            .otherwise(F.coalesce(F.col("v"), F.lit(0)))
            .cast("bigint")
            .alias("p_m"),
        )
        if k in (2, 4):
            snapshots[k] = p
    p2 = snapshots[2].select(F.col("s"), F.col("p_m").alias("m2"))
    p4 = snapshots[4].select(F.col("s"), F.col("p_m").alias("m4"))
    return p4.join(p2, "s").select(
        F.col("s").alias("event_type"),
        emit(F.col("m2").cast("double") / F.lit(1e6)).alias("p_convert_2"),
        emit(F.col("m4").cast("double") / F.lit(1e6)).alias("p_convert_4"),
    )


# ---------------------------------------------------------------------------
# q333: sparse tf-idf cosine top-k via the inverted index
# ---------------------------------------------------------------------------

@register(
    "q333_tfidf_cosine_topk",
    sql="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id, tf.tok,
             tf.c * CAST(round(ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) * 1e6)
                         AS BIGINT) AS w
      FROM tf JOIN dfreq USING (tok), n
      WHERE dfreq.df BETWEEN 2 AND 50 AND dfreq.df < n.n_docs
    ),
    ss AS (
      SELECT doc_id,
             SUM(CAST(w AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))) AS ss
      FROM w GROUP BY 1
    ),
    dots AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(COUNT(*) AS BIGINT) AS n_shared,
             SUM(CAST(a.w AS DECIMAL(38,0)) * CAST(b.w AS DECIMAL(38,0))) AS dot
      FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT da, db, n_shared,
             CAST(dot AS DOUBLE)
               / (sqrt(CAST(sa.ss AS DOUBLE)) * sqrt(CAST(sb.ss AS DOUBLE)))
               AS cosine
      FROM dots JOIN ss sa ON sa.doc_id = dots.da
                JOIN ss sb ON sb.doc_id = dots.db
    )
    SELECT da AS doc_a, db AS doc_b, n_shared AS n_shared_terms, cosine
    FROM scored
    ORDER BY cosine DESC, da, db
    LIMIT 30
    """,
    doc="Sparse tf-idf cosine top-k document pairs via the inverted "
        "index — the lexical complement of the embedding-space q20/q33: "
        "tf exact integer counts, idf = ln(N/df) micro-rounded to "
        "BIGINT per TERM (before any weight product), weights "
        "w = tf * idf_m exact integers, dot products and norms "
        "accumulated as DECIMAL(38,0) (w reaches ~1.4e9, so int64 "
        "squares would overflow), ONE final double cosine with the "
        "identical op tree both engines.  Scale: the postings join "
        "never touches text — df caps (2 <= df <= 50) prune stopwords "
        "BEFORE the pair join, bounding per-token fanout at C(50,2) "
        "exactly like a prefix-filtered similarity join; norms join "
        "back at doc grain.  TakeOrdered top-30 on (cosine, da, db) — "
        "cosine doubles are bit-identical across engines because every "
        "input is exact.",
    tags=("llmdata", "text", "documents", "similarity"),
)
def q333(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.postings import weighted_postings

    d = load(spark, sf_dir, "documents")
    # the weighted postings feed THREE consumers (norms + both pair
    # sides) — localCheckpoint them so the df-cap join runs once, not
    # three times; postings are df-capped, orders smaller than the
    # corpus (PERSIST_PRONE covers the drain).  The tokenize -> tf ->
    # df-band -> micro-idf front-end is the shared postings kernel
    # (df in [2, 50], df < N — see weighted_postings for the exactness
    # and fan-out-bound arguments).
    w = weighted_postings(d, min_df=2, max_df=50).localCheckpoint()
    wd = F.col("w").cast("decimal(38,0)")
    ss = w.groupBy("doc_id").agg(F.sum(wd * wd).alias("ss"))
    a = w.select(F.col("doc_id").alias("da"), "tok", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("db"), "tok", F.col("w").alias("wb"))
    dots = (
        a.join(b, "tok")
        .where(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.sum(
                F.col("wa").cast("decimal(38,0)") * F.col("wb").cast("decimal(38,0)")
            ).alias("dot"),
        )
    )
    sa = ss.select(F.col("doc_id").alias("da"), F.col("ss").alias("ssa"))
    sb = ss.select(F.col("doc_id").alias("db"), F.col("ss").alias("ssb"))
    scored = dots.join(sa, "da").join(sb, "db").select(
        "da",
        "db",
        "n_shared",
        (
            F.col("dot").cast("double")
            / (F.sqrt(F.col("ssa").cast("double")) * F.sqrt(F.col("ssb").cast("double")))
        ).alias("cosine"),
    )
    return (
        scored.orderBy(F.desc("cosine"), "da", "db")
        .limit(30)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.col("n_shared").alias("n_shared_terms"),
            emit(F.col("cosine")).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# q334: rank-biased overlap between two part rankings
# ---------------------------------------------------------------------------

@register(
    "q334_rank_biased_overlap",
    sql="""
    WITH agg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS rev_c,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS qty_c
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT l_partkey,
             row_number() OVER (ORDER BY rev_c DESC, l_partkey) AS ra,
             row_number() OVER (ORDER BY qty_c DESC, l_partkey) AS rb
      FROM agg
    ),
    mx AS (
      SELECT greatest(ra, rb) AS maxr, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ranked WHERE ra <= 20 AND rb <= 20 GROUP BY 1
    ),
    spine AS (SELECT unnest(generate_series(1, 20)) AS d),
    ov AS (
      SELECT spine.d,
             CAST(COALESCE(SUM(mx.cnt), 0) AS BIGINT) AS overlap
      FROM spine LEFT JOIN mx ON mx.maxr <= spine.d
      GROUP BY 1
    ),
    terms AS (
      SELECT d, overlap,
             CAST(round(pow(0.9, d - 1) / d * 1e9) AS BIGINT) AS term_n
      FROM ov
    )
    SELECT 20 AS depth,
           (SELECT overlap FROM ov WHERE d = 20) AS overlap_at_k,
           0.1 * CAST(SUM(overlap * term_n) AS DOUBLE) / 1e9 AS rbo
    FROM terms
    """,
    doc="Rank-biased overlap (Webber et al. 2010) at depth 20, p = 0.9, "
        "between the revenue ranking and the quantity ranking of parts "
        "— the top-weighted rank-agreement diagnostic that, unlike "
        "Kendall/Spearman (q142/q283), weights disagreement at rank 1 "
        "more than at rank 20.  RBO = (1-p) sum_d p^(d-1) |A_d ∩ B_d|/d "
        "with the intersection-at-depth computed from greatest(ra, rb) "
        "counts (a part is inside both depth-d prefixes iff its max "
        "rank <= d) — no per-depth set intersection.  p^(d-1)/d is "
        "nano-rounded to BIGINT per depth BEFORE the overlap-weighted "
        "sum; overlaps are exact integers.  Physical: one fact "
        "aggregate to part grain, two rank windows over that grain, "
        "then 20-row spine math; at 100 TB only the first aggregate "
        "touches the fact.",
    tags=("lineitem", "ranking", "stats", "window"),
)
def q334(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(DEC) * 100).cast("bigint").alias("rev_c"),
        F.sum(F.col("l_quantity").cast(DEC) * 100).cast("bigint").alias("qty_c"),
    )
    ranked = agg.select(
        "l_partkey",
        F.row_number().over(Window.orderBy(F.desc("rev_c"), "l_partkey")).alias("ra"),
        F.row_number().over(Window.orderBy(F.desc("qty_c"), "l_partkey")).alias("rb"),
    )
    mx = (
        ranked.where((F.col("ra") <= 20) & (F.col("rb") <= 20))
        .groupBy(F.greatest("ra", "rb").alias("maxr"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    spine = spark.range(1, 21).select(F.col("id").cast("int").alias("d"))
    ov = (
        spine.join(F.broadcast(mx), F.col("maxr") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("overlap"))
    )
    terms = ov.select(
        "d",
        "overlap",
        F.round(F.pow(F.lit(0.9), F.col("d") - 1) / F.col("d") * 1e9)
        .cast("bigint")
        .alias("term_n"),
    )
    ov20 = ov.where(F.col("d") == 20).select(F.col("overlap").alias("overlap_at_k"))
    return (
        terms.agg(
            F.sum(F.col("overlap") * F.col("term_n")).cast("bigint").alias("wsum")
        )
        .crossJoin(F.broadcast(ov20))
        .select(
            F.lit(20).cast("int").alias("depth"),
            "overlap_at_k",
            emit(F.lit(0.1) * F.col("wsum").cast("double") / F.lit(1e9)).alias("rbo"),
        )
    )


# ---------------------------------------------------------------------------
# q335: propensity-stratified ATT
# ---------------------------------------------------------------------------

@register(
    "q335_propensity_strata_att",
    sql="""
    WITH f AS (
      SELECT c_mktsegment AS stratum,
             c_custkey % 3 = 0 AS treat,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM customer
    ),
    cells AS (
      SELECT stratum,
             CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(SUM(CASE WHEN treat THEN cents ELSE 0 END) AS BIGINT) AS s_t,
             CAST(SUM(CASE WHEN NOT treat THEN cents ELSE 0 END) AS BIGINT) AS s_c
      FROM f GROUP BY 1
    ),
    strata AS (
      SELECT stratum, n_t, n_c,
             CAST(s_t AS DOUBLE) / (100.0 * n_t) AS mean_t,
             CAST(s_c AS DOUBLE) / (100.0 * n_c) AS mean_c,
             CAST(n_t AS DOUBLE) / (n_t + n_c) AS propensity,
             CAST(round((CAST(s_t AS DOUBLE) / (100.0 * n_t)
                         - CAST(s_c AS DOUBLE) / (100.0 * n_c)) * 1e6)
                  AS BIGINT) AS diff_m
      FROM cells WHERE n_t > 0 AND n_c > 0
    )
    SELECT stratum,
           n_t AS n_treat, n_c AS n_ctrl,
           mean_t AS mean_treat, mean_c AS mean_ctrl,
           propensity,
           CAST(diff_m AS DOUBLE) / 1e6 AS diff,
           CAST(SUM(n_t * diff_m) OVER () AS DOUBLE)
             / (CAST(SUM(n_t) OVER () AS DOUBLE) * 1e6) AS att
    FROM strata
    """,
    doc="Propensity-stratified average treatment effect on the treated "
        "(ATT): customers stratify by market segment, treat = custkey "
        "% 3 (a deterministic synthetic assignment), outcome = account "
        "balance; within-stratum mean differences weight by treated "
        "count — the standard subclassification estimator "
        "(Rosenbaum & Rubin 1984) that removes confounding carried by "
        "the stratum.  Per-stratum diffs micro-round to BIGINT before "
        "the treated-weighted sum, so the ATT numerator is an exact "
        "integer; strata missing either arm drop (documented, both "
        "engines).  Per-stratum propensity n_t/(n_t+n_c) is the "
        "diagnostic column.  Physical: ONE customer scan to stratum "
        "grain, window totals over <= |segments| rows.",
    tags=("customer", "experimentation", "stats", "agg"),
)
def q335(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("stratum"),
        (F.col("c_custkey") % 3 == 0).alias("treat"),
        (F.col("c_acctbal").cast(DEC) * 100).cast("bigint").alias("cents"),
    )
    t = F.col("treat")
    cells = c.groupBy("stratum").agg(
        F.sum(F.when(t, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(~t, 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum(F.when(t, F.col("cents")).otherwise(0)).cast("bigint").alias("s_t"),
        F.sum(F.when(~t, F.col("cents")).otherwise(0)).cast("bigint").alias("s_c"),
    )
    mean_t = F.col("s_t").cast("double") / (F.lit(100.0) * F.col("n_t"))
    mean_c = F.col("s_c").cast("double") / (F.lit(100.0) * F.col("n_c"))
    strata = cells.where((F.col("n_t") > 0) & (F.col("n_c") > 0)).select(
        "stratum",
        "n_t",
        "n_c",
        mean_t.alias("mean_t"),
        mean_c.alias("mean_c"),
        (F.col("n_t").cast("double") / (F.col("n_t") + F.col("n_c"))).alias(
            "propensity"
        ),
        F.round((mean_t - mean_c) * 1e6).cast("bigint").alias("diff_m"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return strata.select(
        "stratum",
        F.col("n_t").alias("n_treat"),
        F.col("n_c").alias("n_ctrl"),
        emit(F.col("mean_t")).alias("mean_treat"),
        emit(F.col("mean_c")).alias("mean_ctrl"),
        emit(F.col("propensity")).alias("propensity"),
        emit(F.col("diff_m").cast("double") / F.lit(1e6)).alias("diff"),
        emit(
            F.sum(F.col("n_t") * F.col("diff_m")).over(wall).cast("double")
            / (F.sum("n_t").over(wall).cast("double") * F.lit(1e6))
        ).alias("att"),
    )


# ---------------------------------------------------------------------------
# q336: word2vec-style negative-sampling table (unigram^0.75)
# ---------------------------------------------------------------------------

@register(
    "q336_negative_sampling_table",
    sql="""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    cnt AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE tok <> '' GROUP BY 1
    ),
    pm AS (
      SELECT tok, c, CAST(round(pow(CAST(c AS DOUBLE), 0.75) * 1e6) AS BIGINT)
               AS p_m
      FROM cnt
    ),
    tot AS (SELECT CAST(SUM(p_m) AS BIGINT) AS t FROM pm),
    fl AS (
      SELECT tok, c, p_m,
             CAST((p_m * 1048576) // t AS BIGINT) AS f,
             CAST(p_m * 1048576 - ((p_m * 1048576) // t) * t AS BIGINT) AS rem,
             t
      FROM pm, tot
    ),
    lr AS (
      SELECT tok, c, f, rem,
             row_number() OVER (ORDER BY rem DESC, c DESC, tok) AS rn,
             1048576 - SUM(f) OVER () AS leftover
      FROM fl
    ),
    alloc AS (
      SELECT tok, c,
             f + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS n_buckets
      FROM lr
    ),
    cum AS (
      SELECT tok, c, n_buckets,
             CAST(COALESCE(SUM(n_buckets) OVER (
               ORDER BY c DESC, tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS bucket_start
      FROM alloc
    )
    SELECT tok AS token, c AS n_occurrences,
           CAST(n_buckets AS BIGINT) AS n_buckets, bucket_start,
           CAST(n_buckets AS DOUBLE) / 1048576 AS sample_prob
    FROM cum
    ORDER BY c DESC, tok
    LIMIT 50
    """,
    doc="word2vec-style negative-sampling table (Mikolov et al. 2013): "
        "P(w) proportional to count^0.75, materialized as exact integer "
        "bucket ranges over a 2^20-slot table via largest-remainder "
        "(Hamilton) apportionment — the q159 machinery repurposed — so "
        "the allocated buckets sum to EXACTLY 2^20 and a uniform "
        "integer draw in [0, 2^20) maps to a token by range lookup.  "
        "count^0.75 is micro-rounded to BIGINT per token BEFORE "
        "normalization; quotas use exact integer floor division with "
        "exact integer remainders (the p_m * 2^20 product is bounded "
        "by ~2e15 here; past ~8e12 micro-weight — count ~ 8e8 per "
        "token — widen to DECIMAL as q318/q320 prescribe).  Top-50 "
        "rows shown; allocation runs over the FULL vocabulary.  "
        "Physical: one corpus explode to vocab grain, then vocab-grain "
        "windows (one ordering shared by rank and prefix-sum).",
    tags=("llmdata", "text", "documents", "sampling"),
)
def q336(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..partitioning import fan_out

    d = load(spark, sf_dir, "documents")
    toks = F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    cnt = (
        fan_out(d.select("text"))
        .select(toks)
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pm = cnt.select(
        "tok",
        "c",
        F.round(F.pow(F.col("c").cast("double"), F.lit(0.75)) * 1e6)
        .cast("bigint")
        .alias("p_m"),
    )
    tot = pm.agg(F.sum("p_m").cast("bigint").alias("t"))
    fl = pm.crossJoin(F.broadcast(tot)).select(
        "tok",
        "c",
        F.expr("CAST((p_m * 1048576) div t AS BIGINT)").alias("f"),
        F.expr(
            "CAST(p_m * 1048576 - ((p_m * 1048576) div t) * t AS BIGINT)"
        ).alias("rem"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lr = fl.select(
        "tok",
        "c",
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.desc("c"), "tok"))
        .alias("rn"),
        (F.lit(1048576) - F.sum("f").over(wall)).alias("leftover"),
    )
    alloc = lr.select(
        "tok",
        "c",
        (F.col("f") + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0)).alias(
            "n_buckets"
        ),
    )
    wcum = Window.orderBy(F.desc("c"), "tok").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = alloc.select(
        "tok",
        "c",
        "n_buckets",
        F.coalesce(F.sum("n_buckets").over(wcum), F.lit(0))
        .cast("bigint")
        .alias("bucket_start"),
    )
    return (
        cum.orderBy(F.desc("c"), "tok")
        .limit(50)
        .select(
            F.col("tok").alias("token"),
            F.col("c").alias("n_occurrences"),
            F.col("n_buckets").cast("bigint").alias("n_buckets"),
            "bucket_start",
            emit(F.col("n_buckets").cast("double") / F.lit(1048576)).alias(
                "sample_prob"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q337: split-conformal prediction intervals + empirical coverage
# ---------------------------------------------------------------------------

@register(
    "q337_conformal_interval",
    sql="""
    WITH f AS (
      SELECT event_type, event_id % 2 = 0 AS calib,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    cal AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM f WHERE calib
    ),
    med AS (
      SELECT event_type, cents AS med_c, n AS n_calib
      FROM cal WHERE rn = (n + 1) // 2
    ),
    res AS (
      SELECT cal.event_type, abs(cal.cents - med.med_c) AS r,
             row_number() OVER (PARTITION BY cal.event_type
                                ORDER BY abs(cal.cents - med.med_c)) AS rn,
             med.n_calib
      FROM cal JOIN med USING (event_type)
    ),
    qh AS (
      SELECT event_type, r AS q_c, n_calib
      FROM res
      WHERE rn = least(n_calib, (9 * (n_calib + 1) + 9) // 10)
    ),
    test AS (
      SELECT f.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN abs(f.cents - med.med_c) <= qh.q_c
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM f JOIN med USING (event_type) JOIN qh USING (event_type)
      WHERE NOT calib
      GROUP BY 1
    )
    SELECT test.event_type,
           CAST(med.n_calib AS BIGINT) AS n_calib, test.n_test,
           CAST(med.med_c AS DOUBLE) / 100.0 AS median,
           CAST(qh.q_c AS DOUBLE) / 100.0 AS q_hat,
           CAST(test.n_covered AS DOUBLE) / test.n_test AS coverage
    FROM test JOIN med USING (event_type) JOIN qh USING (event_type)
    """,
    doc="Split-conformal prediction interval with empirical holdout "
        "coverage (Vovk et al.; the distribution-free uncertainty "
        "wrapper a forecast service ships): calibration split = even "
        "event_ids, point predictor = per-type lower median, conformal "
        "radius q_hat = ceil(0.9 (n+1))-th order statistic of absolute "
        "calibration residuals (guaranteeing >= 90% marginal coverage), "
        "then the EMPIRICAL coverage of median ± q_hat measured on the "
        "odd-id holdout.  Every selection is an exact integer-cents "
        "order statistic (lower median rank (n+1)//2, conformal rank "
        "via the exact identity ceil(9m/10) = (9m+9)//10, // == Spark "
        "div on non-negative) — no interpolation, no floats until the "
        "final emitted columns.  Physical: two rank windows per type "
        "grain over the calibration half, one aggregate over the "
        "holdout; type-grain tables broadcast back.",
    tags=("events", "ml-stats", "experimentation", "window"),
)
def q337(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("event_id") % 2 == 0).alias("calib"),
        (F.col("value").cast(DEC) * 100).cast("bigint").alias("cents"),
    )
    wt = Window.partitionBy("event_type")
    cal = e.where("calib").select(
        "event_type",
        "cents",
        F.row_number().over(wt.orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    med = cal.where(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "event_type", F.col("cents").alias("med_c"), F.col("n").alias("n_calib")
    )
    res = (
        cal.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.abs(F.col("cents") - F.col("med_c")).alias("r"),
            "n_calib",
        )
        .select(
            "event_type",
            "r",
            F.row_number().over(wt.orderBy("r")).alias("rn"),
            "n_calib",
        )
    )
    qh = res.where(
        F.col("rn")
        == F.least(
            F.col("n_calib"), F.expr("(9 * (n_calib + 1) + 9) div 10")
        )
    ).select("event_type", F.col("r").alias("q_c"))
    test = (
        e.where(~F.col("calib"))
        .join(F.broadcast(med), "event_type")
        .join(F.broadcast(qh), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("med_c")) <= F.col("q_c"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return (
        test.join(med, "event_type")
        .join(qh, "event_type")
        .select(
            "event_type",
            F.col("n_calib").cast("bigint").alias("n_calib"),
            "n_test",
            emit(F.col("med_c").cast("double") / F.lit(100.0)).alias("median"),
            emit(F.col("q_c").cast("double") / F.lit(100.0)).alias("q_hat"),
            emit(F.col("n_covered").cast("double") / F.col("n_test")).alias(
                "coverage"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q338: exact q-q quantile points between two customer segments
# ---------------------------------------------------------------------------

@register(
    "q338_qq_quantile_points",
    sql="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    r AS (
      SELECT seg, cents,
             row_number() OVER (PARTITION BY seg ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY seg) AS n
      FROM j
    ),
    spine AS (SELECT unnest(generate_series(1, 19)) * 5 AS prob),
    pick AS (
      SELECT spine.prob, r.seg, r.cents
      FROM spine JOIN r ON r.rn = 1 + (spine.prob * (r.n - 1)) // 100
    )
    SELECT a.prob,
           CAST(a.cents AS DOUBLE) / 100.0 AS q_building,
           CAST(b.cents AS DOUBLE) / 100.0 AS q_machinery,
           CAST(a.cents - b.cents AS DOUBLE) / 100.0 AS diff
    FROM (SELECT prob, cents FROM pick WHERE seg = 'BUILDING') a
    JOIN (SELECT prob, cents FROM pick WHERE seg = 'MACHINERY') b
      USING (prob)
    """,
    doc="Exact q-q plot points between two customer segments' order "
        "values: the 5%..95% quantiles (19 points) of each segment "
        "side by side with their differences — the distribution-shift "
        "diagnostic behind 'did MACHINERY orders get bigger or just "
        "more numerous'.  Quantiles are LOWER order statistics at the "
        "exact integer index 1 + (p*(n-1))//100 selected by rank — no "
        "interpolation, so integer-cents selection is engine-identical "
        "by construction (type-7 interpolated quantiles would put a "
        "float multiply inside the selection).  Physical: one join + "
        "one rank window per segment partition; the 19-row spine joins "
        "against rank matches (rank predicate pushes into the window "
        "output), everything after the window is spine-sized.",
    tags=("orders", "customer", "stats", "window"),
)
def q338(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = (
        o.join(
            F.broadcast(
                c.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
            ),
            o["o_custkey"] == c["c_custkey"],
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            (F.col("o_totalprice").cast(DEC) * 100).cast("bigint").alias("cents"),
        )
    )
    ws = Window.partitionBy("seg")
    r = j.select(
        "seg",
        "cents",
        F.row_number().over(ws.orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    spine = spark.range(1, 20).select((F.col("id") * 5).cast("int").alias("prob"))
    pick = spine.join(
        r,
        F.col("rn") == 1 + F.expr("CAST((prob * (n - 1)) div 100 AS BIGINT)"),
    ).select("prob", "seg", "cents")
    a = pick.where(F.col("seg") == "BUILDING").select(
        "prob", F.col("cents").alias("ca")
    )
    b = pick.where(F.col("seg") == "MACHINERY").select(
        "prob", F.col("cents").alias("cb")
    )
    return a.join(b, "prob").select(
        "prob",
        emit(F.col("ca").cast("double") / F.lit(100.0)).alias("q_building"),
        emit(F.col("cb").cast("double") / F.lit(100.0)).alias("q_machinery"),
        emit((F.col("ca") - F.col("cb")).cast("double") / F.lit(100.0)).alias(
            "diff"
        ),
    )


# ---------------------------------------------------------------------------
# q339: streaming additive-histogram parity
# ---------------------------------------------------------------------------

@register(
    "q339_stream_histogram_parity",
    sql="""
    WITH b AS (
      SELECT least(19, CAST(floor(value / 25.0) AS BIGINT)) AS bin
      FROM events
    ),
    h AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY 1)
    SELECT bin, cnt,
           CAST(cnt AS DOUBLE) / SUM(cnt) OVER () AS density
    FROM h
    """,
    doc="Streaming continuous equi-width histogram under the "
        "correctness gate: events land as parquet in two waves, two "
        "checkpointed AvailableNow drains fold each micro-batch's "
        "per-bin counts into a warehouse rollup via additive merge "
        "(refresh_additive — counts form a commutative monoid, so the "
        "streaming answer is EXACTLY the batch histogram, the oracle), "
        "with batch-id idempotence against redelivery.  Completes the "
        "continuous-aggregate parity family (q102 corpus stats, q138 "
        "bitmap distincts, q326 gram matrix) with the profile/monitor "
        "histogram every ingest pipeline maintains.  Per-trigger cost "
        "is O(batch + bins), never a history rescan; the readback is "
        "bins-sized.",
    tags=("streaming", "warehouse", "events", "sketch"),
)
def q339(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    from pathlib import Path

    from ..merge.incremental import refresh_additive
    from ..merge.warehouse import Warehouse

    root = Path(tempfile.mkdtemp(prefix="q339_hist_"))
    land = root / "land"
    land.mkdir()
    wh = Warehouse(spark, str(root / "wh"))
    e = load(spark, sf_dir, "events").select("event_id", "value")

    def land_wave(df: DataFrame, tag: str) -> None:
        wave = root / f"wave_{tag}"
        df.write.parquet(str(wave))
        for f in wave.glob("part-*.parquet"):
            shutil.copy(f, land / f"{tag}_{f.name}")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        meta = wh.write_meta("hist") or {}
        if batch_id <= meta.get("last_batch_id", -1):
            return  # redelivered after a crash-between-flip-and-commit
        if batch_df.limit(1).isEmpty():
            return
        delta = batch_df.groupBy(
            F.least(
                F.lit(19).cast("bigint"),
                F.floor(F.col("value") / F.lit(25.0)).cast("bigint"),
            ).alias("bin")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        refresh_additive(
            wh, "hist", delta, ["bin"], {"cnt": "sum"},
            meta={"last_batch_id": batch_id},
        )

    def drain() -> None:
        with stream_batch_confs(spark, land):
            (
                spark.readStream.schema(e.schema)
                .parquet(str(land))
                .writeStream.foreachBatch(merge_batch)
                .option("checkpointLocation", str(root / "ckpt"))
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )

    land_wave(e.where(F.col("event_id") % 2 == 0), "a")
    drain()
    land_wave(e.where(F.col("event_id") % 2 == 1), "b")
    drain()
    h = wh.read("hist").select("bin", F.col("cnt").cast("bigint").alias("cnt"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return h.select(
        "bin",
        "cnt",
        emit(F.col("cnt").cast("double") / F.sum("cnt").over(wall)).alias(
            "density"
        ),
    )


# ---------------------------------------------------------------------------
# q340: UMass topic coherence of each source's top terms
# ---------------------------------------------------------------------------

@register(
    "q340_umass_topic_coherence",
    sql="""
    WITH pres AS (
      SELECT DISTINCT source, doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    p2 AS (SELECT source, doc_id, tok FROM pres WHERE tok <> ''),
    dfreq AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS d
      FROM p2 GROUP BY 1, 2
    ),
    top AS (
      SELECT source, tok, d,
             row_number() OVER (PARTITION BY source
                                ORDER BY d DESC, tok) AS rnk
      FROM dfreq
    ),
    t10 AS (SELECT source, tok, d, rnk FROM top WHERE rnk <= 10),
    co AS (
      SELECT a.source, a.tok AS te, b.tok AS tl,
             CAST(COUNT(*) AS BIGINT) AS dj
      FROM (SELECT p2.source, p2.doc_id, p2.tok, t10.rnk
            FROM p2 JOIN t10 USING (source, tok)) a
      JOIN (SELECT p2.source, p2.doc_id, p2.tok, t10.rnk
            FROM p2 JOIN t10 USING (source, tok)) b
        ON a.source = b.source AND a.doc_id = b.doc_id AND a.rnk < b.rnk
      GROUP BY 1, 2, 3
    ),
    allp AS (
      SELECT e.source, e.tok AS te, l.tok AS tl, e.d AS de
      FROM t10 e JOIN t10 l ON e.source = l.source AND e.rnk < l.rnk
    ),
    terms AS (
      SELECT allp.source,
             CAST(round(ln((CAST(COALESCE(co.dj, 0) AS DOUBLE) + 1.0)
                           / allp.de) * 1e6) AS BIGINT) AS term_m
      FROM allp LEFT JOIN co ON co.source = allp.source
                            AND co.te = allp.te AND co.tl = allp.tl
    ),
    tsum AS (
      SELECT source, CAST(SUM(term_m) AS BIGINT) AS s FROM terms GROUP BY 1
    ),
    nt AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms FROM t10 GROUP BY 1
    )
    SELECT nt.source, nt.n_terms,
           CAST(COALESCE(tsum.s, 0) AS DOUBLE) / 1e6 AS coherence
    FROM nt LEFT JOIN tsum USING (source)
    """,
    doc="UMass topic coherence (Mimno et al. 2011) of each source's "
        "top-10 document-frequency terms, treating a source as a "
        "'topic': sum over rank-ordered term pairs (earlier e, later "
        "l) of ln((D(e,l) + 1) / D(e)) with D = within-source document "
        "co-occurrence counts — the intrinsic topic-quality metric "
        "that, unlike q272's adjacency PMI, scores DOCUMENT-level "
        "co-occurrence of the representative terms.  The pair set is "
        "the DENSE rank-ordered scaffold over the top terms — a pair "
        "that never co-occurs contributes ln(1/D(e)), the penalty the "
        "+1 smoothing exists for — with observed co-counts left-"
        "joined in.  Per-pair log terms micro-round to BIGINT before "
        "the <= C(10,2) per-source sum; co-occurrence counts are "
        "exact integers from a presence-grain self-join restricted to "
        "the 10 terms (fanout <= 10 presence rows per doc, never the "
        "raw token stream).  Physical: one corpus pass to presence "
        "grain, term ranks at (source, token) grain, the pair join "
        "runs on the top-term-filtered presence table only.",
    tags=("llmdata", "text", "documents", "stats"),
)
def q340(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.postings import doc_frequencies, presence_rows

    d = load(spark, sf_dir, "documents")
    # presence grain feeds the doc-frequency ranks AND both sides of
    # the co-occurrence join — checkpoint so the corpus explode runs
    # once (PERSIST_PRONE covers the drain); tokenization/presence and
    # per-source document frequencies come from the shared postings
    # kernel
    p2 = presence_rows(d, "source", "doc_id").localCheckpoint()
    dfreq = doc_frequencies(p2, group_cols=("source",), out_col="d")
    t10 = (
        dfreq.select(
            "source",
            "tok",
            "d",
            F.row_number()
            .over(Window.partitionBy("source").orderBy(F.desc("d"), "tok"))
            .alias("rnk"),
        )
        .where(F.col("rnk") <= 10)
    )
    filt = p2.join(F.broadcast(t10), ["source", "tok"])
    a = filt.select(
        "source", "doc_id",
        F.col("tok").alias("te"), F.col("rnk").alias("re"), F.col("d").alias("de"),
    )
    b = filt.select(
        "source", "doc_id", F.col("tok").alias("tl"), F.col("rnk").alias("rl")
    )
    co = (
        a.join(b, ["source", "doc_id"])
        .where(F.col("re") < F.col("rl"))
        .groupBy("source", "te", "tl")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dj"))
    )
    # DENSE pair scaffold over the top terms: a pair that never
    # co-occurs contributes ln(1/D(e)) — the +1 smoothing exists
    # precisely so D(e,l)=0 pairs PENALIZE coherence; an inner-join
    # shape silently scored maximally-incoherent topics as 0
    # (review-found metric inversion).  <= C(10,2) rows per source.
    e_ = t10.select(
        "source", F.col("tok").alias("te"), F.col("rnk").alias("re"),
        F.col("d").alias("de"),
    )
    l_ = t10.select("source", F.col("tok").alias("tl"), F.col("rnk").alias("rl"))
    allp = e_.join(l_, "source").where(F.col("re") < F.col("rl"))
    terms = allp.join(co, ["source", "te", "tl"], "left").select(
        "source",
        F.round(
            F.log(
                (F.coalesce(F.col("dj"), F.lit(0)).cast("double") + 1.0)
                / F.col("de")
            )
            * 1e6
        )
        .cast("bigint")
        .alias("term_m"),
    )
    tsum = terms.groupBy("source").agg(F.sum("term_m").cast("bigint").alias("s"))
    nt = t10.groupBy("source").agg(
        F.countDistinct("tok").cast("bigint").alias("n_terms")
    )
    return nt.join(tsum, "source", "left").select(
        "source",
        "n_terms",
        emit(F.coalesce(F.col("s"), F.lit(0)).cast("double") / F.lit(1e6)).alias(
            "coherence"
        ),
    )


# ---------------------------------------------------------------------------
# q341: RAKE keyphrase extraction via gaps-and-islands
# ---------------------------------------------------------------------------

_RAKE_STOPS = ("the", "a", "table", "data", "value", "row")


@register(
    "q341_rake_keyphrases",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, i AS pos, t[i] AS tok
      FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents),
           unnest(generate_series(1, len(t))) AS u(i)
      WHERE t[i] <> ''
    ),
    isl AS (
      SELECT doc_id, pos, tok,
             tok IN {_RAKE_STOPS} AS stop,
             SUM(CASE WHEN tok IN {_RAKE_STOPS} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM tok
    ),
    phr AS (
      SELECT doc_id, island,
             string_agg(tok, ' ' ORDER BY pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS plen
      FROM isl WHERE NOT stop
      GROUP BY 1, 2
      HAVING COUNT(*) BETWEEN 1 AND 4
    ),
    wrd AS (
      SELECT unnest(string_split(phrase, ' ')) AS w, plen
      FROM phr
    ),
    ws AS (
      SELECT w,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS degree,
             CAST(round(CAST(SUM(plen) AS DOUBLE) / COUNT(*) * 1e6)
                  AS BIGINT) AS score_m
      FROM wrd GROUP BY 1
    ),
    ps AS (
      SELECT p.phrase,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(MIN(x.s) AS BIGINT) AS score_m
      FROM phr p JOIN (
        SELECT phrase, CAST(SUM(ws.score_m) AS BIGINT) AS s
        FROM (SELECT DISTINCT phrase FROM phr) q,
             unnest(string_split(q.phrase, ' ')) AS u(w)
        JOIN ws ON ws.w = u.w
        GROUP BY phrase) x ON x.phrase = p.phrase
      GROUP BY 1
    )
    SELECT phrase, n_occurrences,
           CAST(score_m AS DOUBLE) / 1e6 AS rake_score
    FROM ps
    ORDER BY score_m DESC, phrase
    LIMIT 20
    """,
    doc="RAKE keyphrase extraction (Rose et al. 2010): candidate "
        "phrases are maximal stopword-free token runs — computed as "
        "gaps-and-islands (running stopword count per doc = island id, "
        "ONE window) rather than a regex split, so there is no "
        "Java-vs-RE2 dialect in the loop; runs of 1..4 words are "
        "scored by sum over member words of degree(w)/freq(w), where "
        "degree counts phrase-length-weighted occurrences (the "
        "co-occurrence-within-phrase definition).  Per-word scores "
        "micro-round to BIGINT before the per-phrase sums; top-20 "
        "phrases by (score, phrase) is a deterministic TakeOrdered "
        "cut.  The stoplist is a corpus-specific literal shared by "
        "both engines.  Physical: one corpus pass to positioned "
        "tokens, one per-doc window, word/phrase-grain aggregates "
        "after; the phrase table is localCheckpointed for its three "
        "consumers (word explode, score join, occurrence counts).",
    tags=("llmdata", "text", "documents", "window"),
)
def q341(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.postings import positional_token_rows

    d = load(spark, sf_dir, "documents")
    # positions come from the shared postings kernel's posexplode
    # (assigned BEFORE the empty-token drop, so the stopword-island
    # window sees the same gap structure as the SQL twin)
    tok = positional_token_rows(d, "doc_id")
    stop = F.col("tok").isin(*_RAKE_STOPS)
    isl = tok.select(
        "doc_id",
        "pos",
        "tok",
        stop.alias("stop"),
        F.sum(F.when(stop, 1).otherwise(0))
        .over(Window.partitionBy("doc_id").orderBy("pos"))
        .alias("island"),
    )
    phr = (
        isl.where(~F.col("stop"))
        .groupBy("doc_id", "island")
        .agg(
            F.array_join(F.array_sort(F.collect_list(F.struct("pos", "tok"))).tok, " ").alias("phrase"),
            F.count(F.lit(1)).cast("bigint").alias("plen"),
        )
        .where((F.col("plen") >= 1) & (F.col("plen") <= 4))
        .localCheckpoint()
    )
    wrd = phr.select(F.explode(F.split("phrase", " ")).alias("w"), "plen")
    ws = wrd.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("degree"),
        F.round(F.sum("plen").cast("double") / F.count(F.lit(1)) * 1e6)
        .cast("bigint")
        .alias("score_m"),
    )
    uniq = phr.select("phrase").distinct()
    pscore = (
        uniq.select("phrase", F.explode(F.split("phrase", " ")).alias("w"))
        .join(ws, "w")
        .groupBy("phrase")
        .agg(F.sum("score_m").cast("bigint").alias("s"))
    )
    ps = (
        phr.groupBy("phrase")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .join(pscore, "phrase")
    )
    return (
        ps.orderBy(F.desc("s"), "phrase")
        .limit(20)
        .select(
            "phrase",
            "n_occurrences",
            emit(F.col("s").cast("double") / F.lit(1e6)).alias("rake_score"),
        )
    )


# ---------------------------------------------------------------------------
# q343: IPS / SNIPS off-policy evaluation
# ---------------------------------------------------------------------------

@register(
    "q343_ips_offpolicy_eval",
    sql="""
    WITH f AS (
      SELECT user_id % 4 AS cohort, event_type AS action,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN (user_id % 4) % 2 = 0 THEN 'click' ELSE 'view' END
               AS target
      FROM events
    ),
    coh AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_c FROM f GROUP BY 1
    ),
    mat AS (
      SELECT cohort,
             CAST(COUNT(*) AS BIGINT) AS n_m,
             CAST(SUM(cents) AS BIGINT) AS s_m
      FROM f WHERE action = target GROUP BY 1
    ),
    per AS (
      SELECT coh.cohort, coh.n_c, mat.n_m, mat.s_m,
             CAST(round(CAST(mat.s_m AS DOUBLE) * coh.n_c / mat.n_m * 10000.0)
                  AS BIGINT) AS wr_m,
             CAST(round(CAST(mat.n_m AS DOUBLE) * coh.n_c / mat.n_m * 1e6)
                  AS BIGINT) AS w_m,
             CAST(round(CAST(mat.n_m AS DOUBLE) * coh.n_c * coh.n_c
                        / (CAST(mat.n_m AS DOUBLE) * mat.n_m) * 1e6)
                  AS BIGINT) AS w2_m
      FROM coh JOIN mat USING (cohort)
    ),
    tot AS (
      SELECT CAST((SELECT SUM(n_c) FROM coh) AS BIGINT) AS n,
             CAST(COALESCE(SUM(n_m), 0) AS BIGINT) AS n_matched,
             CAST(COALESCE(SUM(wr_m), 0) AS BIGINT) AS wr,
             CAST(COALESCE(SUM(w_m), 0) AS BIGINT) AS w,
             CAST(COALESCE(SUM(w2_m), 0) AS BIGINT) AS w2
      FROM per
    )
    SELECT n AS n_rows, n_matched,
           CAST(wr AS DOUBLE) / (n * 1e6) AS ips,
           CASE WHEN w > 0 THEN CAST(wr AS DOUBLE) / w END AS snips,
           CASE WHEN w2 > 0
                THEN CAST(w AS DOUBLE) * w / (w2 * 1e6) END AS ess
    FROM tot
    """,
    doc="Off-policy evaluation of a deterministic target policy from "
        "logged feedback: IPS and self-normalized IPS (SNIPS) "
        "estimates of the reward the policy pi(cohort) = click/view "
        "WOULD have collected, with behavior propensities estimated "
        "from the log itself (b(a|c) = n(c,a)/n(c)) — the standard "
        "counterfactual-evaluation harness for recommender/bandit "
        "policies (Horvitz-Thompson; SNIPS per Swaminathan & Joachims "
        "2015), plus the effective sample size (sum w)^2 / sum w^2 "
        "that tells you whether the estimate is trustworthy.  Because "
        "the weight is constant within a (cohort, matched-action) "
        "cell, all sums collapse to cohort grain: per-cohort "
        "weighted-reward / weight / weight-squared terms are "
        "micro-rounded rationals of exact integer counts and cents "
        "sums, summed over <= 4 cohorts.  Physical: ONE fact scan to "
        "cohort grain, then single-row math (q137's "
        "conditional-aggregate shape; zero joins at fact grain).  "
        "IPS is per-row-mean over ALL logged rows (unmatched rows "
        "contribute zero), SNIPS normalizes by realized weight mass.",
    tags=("events", "experimentation", "ml-stats", "agg"),
)
def q343(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    f = e.select(
        (F.col("user_id") % 4).alias("cohort"),
        F.col("event_type").alias("action"),
        (F.col("value").cast(DEC) * 100).cast("bigint").alias("cents"),
        F.when((F.col("user_id") % 4) % 2 == 0, "click")
        .otherwise("view")
        .alias("target"),
    )
    coh = f.groupBy("cohort").agg(F.count(F.lit(1)).cast("bigint").alias("n_c"))
    mat = (
        f.where(F.col("action") == F.col("target"))
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_m"),
            F.sum("cents").cast("bigint").alias("s_m"),
        )
    )
    per = coh.join(mat, "cohort").select(
        "n_c",
        "n_m",
        F.round(
            F.col("s_m").cast("double") * F.col("n_c") / F.col("n_m") * 10000.0
        )
        .cast("bigint")
        .alias("wr_m"),
        F.round(
            F.col("n_m").cast("double") * F.col("n_c") / F.col("n_m") * 1e6
        )
        .cast("bigint")
        .alias("w_m"),
        F.round(
            F.col("n_m").cast("double")
            * F.col("n_c")
            * F.col("n_c")
            / (F.col("n_m").cast("double") * F.col("n_m"))
            * 1e6
        )
        .cast("bigint")
        .alias("w2_m"),
    )
    n_total = coh.agg(F.sum("n_c").cast("bigint").alias("n"))
    # an all-unmatched log is a defined answer (n_matched 0, ips 0.0,
    # snips/ess NULL), not a NULL row — coalesce the empty-sum NULLs
    tot = per.agg(
        F.coalesce(F.sum("n_m"), F.lit(0)).cast("bigint").alias("n_matched"),
        F.coalesce(F.sum("wr_m"), F.lit(0)).cast("bigint").alias("wr"),
        F.coalesce(F.sum("w_m"), F.lit(0)).cast("bigint").alias("w"),
        F.coalesce(F.sum("w2_m"), F.lit(0)).cast("bigint").alias("w2"),
    ).crossJoin(F.broadcast(n_total))
    return tot.select(
        F.col("n").alias("n_rows"),
        "n_matched",
        emit(F.col("wr").cast("double") / (F.col("n") * F.lit(1e6))).alias("ips"),
        emit(
            F.when(F.col("w") > 0, F.col("wr").cast("double") / F.col("w"))
        ).alias("snips"),
        emit(
            F.when(
                F.col("w2") > 0,
                F.col("w").cast("double") * F.col("w") / (F.col("w2") * F.lit(1e6)),
            )
        ).alias("ess"),
    )


# ---------------------------------------------------------------------------
# q342: maximal-marginal-relevance diversified top-k selection
# ---------------------------------------------------------------------------

@register(
    "q342_mmr_diverse_topk",
    sql="""
    WITH cand AS (
      SELECT doc_id, CAST(greatest(0, n_chars) AS BIGINT) AS n_chars
      FROM documents ORDER BY greatest(0, n_chars) DESC, doc_id LIMIT 8
    ),
    mx AS (SELECT CAST(MAX(n_chars) AS BIGINT) AS maxc FROM cand),
    rel AS (
      SELECT doc_id,
             CASE WHEN maxc > 0
                  THEN CAST((n_chars * 1000000) // maxc AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS rel_m
      FROM cand, mx
    ),
    bg AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+1], ' ') AS g
      FROM (SELECT d.doc_id,
                   string_split_regex(lower(trim(d.text)), '\\s+') AS t
            FROM documents d
            WHERE d.doc_id IN (SELECT doc_id FROM cand)),
           unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nb FROM bg GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS i
      FROM bg a JOIN bg b ON a.g = b.g AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ),
    simm AS (
      SELECT x.doc_id AS da, y.doc_id AS db,
             CASE WHEN COALESCE(sa.nb, 0) + COALESCE(sb.nb, 0)
                       - COALESCE(i.i, 0) > 0
                  THEN CAST((COALESCE(i.i, 0) * 1000000)
                            // (COALESCE(sa.nb, 0) + COALESCE(sb.nb, 0)
                                - COALESCE(i.i, 0)) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS sim_m
      FROM cand x JOIN cand y ON x.doc_id <> y.doc_id
      LEFT JOIN sizes sa ON sa.doc_id = x.doc_id
      LEFT JOIN sizes sb ON sb.doc_id = y.doc_id
      LEFT JOIN inter i ON i.da = x.doc_id AND i.db = y.doc_id
    ),
    sel1 AS (
      SELECT doc_id, rel_m, CAST(0 AS BIGINT) AS ms_m
      FROM rel ORDER BY rel_m DESC, doc_id LIMIT 1
    ),
    c2 AS (
      SELECT r.doc_id, r.rel_m,
             CAST(COALESCE(MAX(sm.sim_m), 0) AS BIGINT) AS ms_m
      FROM rel r LEFT JOIN simm sm
        ON sm.da = r.doc_id AND sm.db IN (SELECT doc_id FROM sel1)
      WHERE r.doc_id NOT IN (SELECT doc_id FROM sel1)
      GROUP BY 1, 2
    ),
    sel2 AS (
      SELECT doc_id, rel_m, ms_m FROM c2
      ORDER BY 7 * rel_m - 3 * ms_m DESC, doc_id LIMIT 1
    ),
    c3 AS (
      SELECT r.doc_id, r.rel_m,
             CAST(COALESCE(MAX(sm.sim_m), 0) AS BIGINT) AS ms_m
      FROM rel r LEFT JOIN simm sm
        ON sm.da = r.doc_id AND sm.db IN (SELECT doc_id FROM sel1
                                          UNION ALL SELECT doc_id FROM sel2)
      WHERE r.doc_id NOT IN (SELECT doc_id FROM sel1
                             UNION ALL SELECT doc_id FROM sel2)
      GROUP BY 1, 2
    ),
    sel3 AS (
      SELECT doc_id, rel_m, ms_m FROM c3
      ORDER BY 7 * rel_m - 3 * ms_m DESC, doc_id LIMIT 1
    ),
    c4 AS (
      SELECT r.doc_id, r.rel_m,
             CAST(COALESCE(MAX(sm.sim_m), 0) AS BIGINT) AS ms_m
      FROM rel r LEFT JOIN simm sm
        ON sm.da = r.doc_id AND sm.db IN (SELECT doc_id FROM sel1
                                          UNION ALL SELECT doc_id FROM sel2
                                          UNION ALL SELECT doc_id FROM sel3)
      WHERE r.doc_id NOT IN (SELECT doc_id FROM sel1
                             UNION ALL SELECT doc_id FROM sel2
                             UNION ALL SELECT doc_id FROM sel3)
      GROUP BY 1, 2
    ),
    sel4 AS (
      SELECT doc_id, rel_m, ms_m FROM c4
      ORDER BY 7 * rel_m - 3 * ms_m DESC, doc_id LIMIT 1
    )
    SELECT step, doc_id,
           CAST(rel_m AS DOUBLE) / 1e6 AS relevance,
           CAST(ms_m AS DOUBLE) / 1e6 AS max_sim,
           CAST(7 * rel_m - 3 * ms_m AS DOUBLE) / 1e7 AS mmr
    FROM (
      SELECT 1 AS step, * FROM sel1
      UNION ALL SELECT 2, * FROM sel2
      UNION ALL SELECT 3, * FROM sel3
      UNION ALL SELECT 4, * FROM sel4
    )
    """,
    doc="Maximal-marginal-relevance diversified top-k (Carbonell & "
        "Goldstein 1998): from the 8 highest-relevance candidate "
        "documents (relevance = n_chars normalized to [0,1] by exact "
        "integer floor division), greedily select 4 maximizing "
        "0.7*rel - 0.3*max-similarity-to-already-selected, with "
        "similarity = exact bigram-set Jaccard (floor micros).  The "
        "argmax key 7*rel_m - 3*ms_m stays an exact integer (x10 "
        "scale), so every greedy step's winner — including ties, "
        "broken by doc_id — is engine-identical.  Physical: candidate "
        "top-k is one TakeOrdered over the documents scan "
        "(localCheckpointed — relevance, bigram build, and both "
        "matrix axes consume it); bigram building touches only the 8 "
        "candidates (semi-join pushed before the explode); the greedy "
        "rounds run DRIVER-SIDE over the collected <= 8-row relevance "
        "frame and <= 56-row similarity matrix (the q315 dimension-"
        "bounded-driver-math precedent) — constant-size exact-integer "
        "work that would otherwise cost ~10 scheduler round-trips.",
    tags=("llmdata", "ranking", "documents", "similarity"),
)
def q342(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # greatest(0, ·) clamps BEFORE the relevance floor division (the
    # q323 lesson: Spark div truncates, DuckDB // floors — they differ
    # on negatives; latent here but removed rather than relied on)
    cand = (
        d.select(
            "doc_id",
            F.greatest(F.lit(0), F.col("n_chars")).cast("bigint").alias("n_chars"),
        )
        .orderBy(F.desc("n_chars"), "doc_id")
        .limit(8)
        .localCheckpoint()
    )
    mx = cand.agg(F.max("n_chars").alias("maxc"))
    # maxc = 0 (an all-empty-text candidate pool) must yield zero
    # relevance, not an ANSI divide-by-zero (property-test-found edge)
    rel = cand.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        F.expr(
            "CASE WHEN maxc > 0 THEN CAST((n_chars * 1000000) div maxc"
            " AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        ).alias("rel_m"),
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    # the checkpointed cand keeps the parquet relation's expr IDs, so a
    # bare semi-join on "doc_id" self-conflicts — alias the probe key
    bg = (
        d.join(
            cand.select(F.col("doc_id").alias("cid")),
            F.col("doc_id") == F.col("cid"),
            "left_semi",
        )
        .select("doc_id", F.explode(grams).alias("g"))
        .distinct()
    )
    sizes = bg.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    ba = bg.select(F.col("doc_id").alias("da"), "g")
    bb = bg.select(F.col("doc_id").alias("db"), "g")
    inter = (
        ba.join(bb, "g")
        .where(F.col("da") != F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    x = cand.select(F.col("doc_id").alias("da"))
    y = cand.select(F.col("doc_id").alias("db"))
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("nb").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("nb").alias("nbb"))
    un = (
        F.coalesce(F.col("na"), F.lit(0))
        + F.coalesce(F.col("nbb"), F.lit(0))
        - F.coalesce(F.col("i"), F.lit(0))
    )
    simm = (
        x.join(y, F.col("da") != F.col("db"))
        .join(sa, "da", "left")
        .join(sb, "db", "left")
        .join(inter, ["da", "db"], "left")
        .select(
            "da",
            "db",
            F.when(
                un > 0,
                F.expr(
                    "CAST((COALESCE(i, 0) * 1000000) div "
                    "(COALESCE(na, 0) + COALESCE(nbb, 0) - COALESCE(i, 0)) "
                    "AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("sim_m"),
        )
    )
    # the greedy selection runs DRIVER-SIDE over the collected <= 8-row
    # relevance frame and <= 56-row similarity matrix — the q315
    # dimension-bounded-driver-math precedent: three rounds of
    # 8-row Spark jobs cost ~10 scheduler round-trips for work a
    # Python loop does in microseconds on constant-size exact integers.
    rel_rows = {r["doc_id"]: r["rel_m"] for r in rel.collect()}
    sim_rows = {(r["da"], r["db"]): r["sim_m"] for r in simm.collect()}
    selected: list[tuple[int, int, int, int]] = []  # (step, doc, rel_m, ms_m)
    chosen: list[int] = []
    for step in range(1, min(4, len(rel_rows)) + 1):
        best = None
        for doc, rm in rel_rows.items():
            if doc in chosen:
                continue
            ms = max((sim_rows.get((doc, s), 0) for s in chosen), default=0)
            key = (7 * rm - 3 * ms, -doc)
            if best is None or key > best[0]:
                best = (key, doc, rm, ms)
        selected.append((step, best[1], best[2], best[3]))
        chosen.append(best[1])
    out = spark.createDataFrame(
        selected, "step int, doc_id bigint, rel_m bigint, ms_m bigint"
    )
    return out.select(
        "step",
        "doc_id",
        emit(F.col("rel_m").cast("double") / F.lit(1e6)).alias("relevance"),
        emit(F.col("ms_m").cast("double") / F.lit(1e6)).alias("max_sim"),
        emit(
            (7 * F.col("rel_m") - 3 * F.col("ms_m")).cast("double") / F.lit(1e7)
        ).alias("mmr"),
    )


# ---------------------------------------------------------------------------
# q344: winsorized mean / sd per group
# ---------------------------------------------------------------------------

@register(
    "q344_winsorized_stats",
    sql="""
    WITH f AS (
      SELECT c_mktsegment AS seg,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM customer
    ),
    r AS (
      SELECT seg, cents,
             row_number() OVER (PARTITION BY seg ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY seg) AS n
      FROM f
    ),
    cuts AS (
      SELECT lo.seg, lo.cents AS lo_c, hi.cents AS hi_c, lo.n
      FROM (SELECT seg, cents, n FROM r
            WHERE rn = 1 + (10 * (n - 1)) // 100) lo
      JOIN (SELECT seg, cents FROM r
            WHERE rn = 1 + (90 * (n - 1)) // 100) hi USING (seg)
    ),
    wz AS (
      SELECT f.seg, cuts.lo_c, cuts.hi_c, cuts.n,
             least(greatest(f.cents, cuts.lo_c), cuts.hi_c) AS wc
      FROM f JOIN cuts USING (seg)
    ),
    agg AS (
      SELECT seg, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(lo_c) AS BIGINT) AS lo_c,
             CAST(MAX(hi_c) AS BIGINT) AS hi_c,
             CAST(SUM(wc) AS BIGINT) AS s,
             SUM(CAST(wc AS DECIMAL(38,0)) * CAST(wc AS DECIMAL(38,0))) AS q
      FROM wz GROUP BY seg
    )
    SELECT seg AS segment, n,
           CAST(lo_c AS DOUBLE) / 100.0 AS lo_cut,
           CAST(hi_c AS DOUBLE) / 100.0 AS hi_cut,
           CAST(s AS DOUBLE) / (100.0 * n) AS win_mean,
           CASE WHEN n > 1 THEN
             sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
               / 100.0 END AS win_sd
    FROM agg
    """,
    doc="Winsorized mean and standard deviation per customer segment: "
        "balances CLAMP to the exact p10/p90 lower order statistics "
        "(index 1 + (p(n-1)) div 100, the q338 selection — no "
        "interpolation) before the moments — the outlier-robust "
        "location/scale pair that, unlike q221's trimmed mean (which "
        "DROPS tails), keeps n constant and so composes with "
        "downstream SE math.  Clamped values are exact integer cents; "
        "the sd comes from exact BIGINT/DECIMAL(38,0) sufficient "
        "statistics with one final double expression, CASE-guarded "
        "for n = 1.  Physical: one rank window per segment, cut "
        "points join back at segment grain (broadcast), one aggregate "
        "— the fact shuffles once on the segment key.",
    tags=("customer", "stats", "agg", "window"),
)
def q344(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_acctbal").cast(DEC) * 100).cast("bigint").alias("cents"),
    )
    ws = Window.partitionBy("seg")
    r = f.select(
        "seg",
        "cents",
        F.row_number().over(ws.orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    lo = r.where(F.col("rn") == 1 + F.expr("(10 * (n - 1)) div 100")).select(
        "seg", F.col("cents").alias("lo_c"), "n"
    )
    hi = r.where(F.col("rn") == 1 + F.expr("(90 * (n - 1)) div 100")).select(
        "seg", F.col("cents").alias("hi_c")
    )
    cuts = lo.join(hi, "seg")
    wz = f.join(F.broadcast(cuts), "seg").select(
        "seg",
        "lo_c",
        "hi_c",
        "n",
        F.least(F.greatest(F.col("cents"), F.col("lo_c")), F.col("hi_c")).alias(
            "wc"
        ),
    )
    wd = F.col("wc").cast("decimal(38,0)")
    agg = wz.groupBy("seg").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("lo_c").cast("bigint").alias("lo_c"),
        F.max("hi_c").cast("bigint").alias("hi_c"),
        F.sum("wc").cast("bigint").alias("s"),
        F.sum(wd * wd).alias("q"),
    )
    return agg.select(
        F.col("seg").alias("segment"),
        "n",
        emit(F.col("lo_c").cast("double") / F.lit(100.0)).alias("lo_cut"),
        emit(F.col("hi_c").cast("double") / F.lit(100.0)).alias("hi_cut"),
        emit(F.col("s").cast("double") / (F.lit(100.0) * F.col("n"))).alias(
            "win_mean"
        ),
        emit(
            F.when(
                F.col("n") > 1,
                F.sqrt(
                    (
                        F.col("q").cast("double")
                        - F.col("s").cast("double") * F.col("s") / F.col("n")
                    )
                    / (F.col("n") - 1)
                )
                / F.lit(100.0),
            )
        ).alias("win_sd"),
    )


# ---------------------------------------------------------------------------
# q345: Mann-Whitney U with tie correction
# ---------------------------------------------------------------------------

@register(
    "q345_mann_whitney_u",
    sql="""
    WITH f AS (
      SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS grp,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT cents,
             CAST(SUM(grp) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS t
      FROM f GROUP BY cents
    ),
    cum AS (
      SELECT cents, c1, t,
             CAST(COALESCE(SUM(t) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb
      FROM v
    ),
    tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(t - c1) AS BIGINT) AS n2,
             CAST(SUM(c1 * (2 * cb + t + 1)) AS BIGINT) AS two_r1,
             SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS tie3
      FROM cum
    )
    SELECT n1, n2,
           (CAST(two_r1 AS DOUBLE) - n1 * (CAST(n1 AS DOUBLE) + 1)) / 2.0
             - CAST(n1 AS DOUBLE) * n2 / 2.0 AS u_centered,
           CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1
                     AND CAST(n1 AS DOUBLE) * n2 / 12.0
                         * ((n1 + n2 + 1)
                            - CAST(tie3 AS DOUBLE)
                              / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))) > 0
             THEN ((CAST(two_r1 AS DOUBLE) - n1 * (CAST(n1 AS DOUBLE) + 1)) / 2.0
                   - CAST(n1 AS DOUBLE) * n2 / 2.0)
                  / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                         * ((n1 + n2 + 1)
                            - CAST(tie3 AS DOUBLE)
                              / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))
             END AS z
    FROM tot
    """,
    doc="Mann-Whitney U (Wilcoxon rank-sum) with the tie-corrected "
        "normal approximation — the nonparametric two-sample location "
        "test that complements Welch's t (q162, means) and KS (q267, "
        "distributions): U compares purchase values of odd- vs "
        "even-user groups through tie-averaged ranks.  Everything "
        "reduces EXACTLY at distinct-value grain: doubled rank sums "
        "2*R1 = sum c1*(2*cum_before + t + 1) stay integers under "
        "ties (bound: 2*R1 <= N(N+1), exact int64 to N ~ 3e9 rows — "
        "past that widen to DECIMAL as q318/q320 prescribe), the "
        "tie-correction term sum(t^3 - t) accumulates in "
        "DECIMAL(38,0), and U/z emerge in one final double expression "
        "(identical op tree both engines; degenerate variance "
        "CASE-guarded).  Physical: one fact pass to distinct-value "
        "grain, one ordered prefix-sum window over that grain, one "
        "4-column reduce — the classic rank test without ever "
        "materializing per-row ranks.",
    tags=("events", "stats", "experimentation", "window"),
)
def q345(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = load(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("grp"),
        (F.col("value").cast(DEC) * 100).cast("bigint").alias("cents"),
    )
    v = f.groupBy("cents").agg(
        F.sum("grp").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    wc = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    cum = v.select(
        "cents",
        "c1",
        "t",
        F.coalesce(F.sum("t").over(wc), F.lit(0)).cast("bigint").alias("cb"),
    )
    td = F.col("t").cast("decimal(38,0)")
    tot = cum.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum(F.col("t") - F.col("c1")).cast("bigint").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cb") + F.col("t") + 1))
        .cast("bigint")
        .alias("two_r1"),
        F.sum(td * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    u_centered = (
        (F.col("two_r1").cast("double") - F.col("n1") * (n1d + 1)) / F.lit(2.0)
        - n1d * F.col("n2") / F.lit(2.0)
    )
    var = (
        n1d
        * F.col("n2")
        / F.lit(12.0)
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("tie3").cast("double")
            / ((F.col("n1") + F.col("n2")).cast("double") * (F.col("n1") + F.col("n2") - 1))
        )
    )
    return tot.select(
        "n1",
        "n2",
        emit(u_centered).alias("u_centered"),
        emit(
            F.when(
                (F.col("n1") > 0)
                & (F.col("n2") > 0)
                & (F.col("n1") + F.col("n2") > 1)
                & (var > 0),
                u_centered / F.sqrt(var),
            )
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# q346: McNemar's test for paired classifiers
# ---------------------------------------------------------------------------

@register(
    "q346_mcnemar_paired",
    sql="""
    WITH f AS (
      SELECT (CASE WHEN n_chars % 2 = 0 THEN 'en' ELSE 'zh' END = lang)
               AS a_ok,
             (CASE WHEN doc_id % 3 = 0 THEN 'en' ELSE 'zh' END = lang)
               AS b_ok
      FROM documents
    ),
    cells AS (
      SELECT CAST(SUM(CASE WHEN a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS n11,
             CAST(SUM(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS n10,
             CAST(SUM(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS n01,
             CAST(SUM(CASE WHEN NOT a_ok AND NOT b_ok THEN 1 ELSE 0 END)
                  AS BIGINT) AS n00
      FROM f
    )
    SELECT n11, n10, n01, n00,
           CASE WHEN n10 + n01 > 0
                THEN CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / (n10 + n01)
                END AS chi2,
           CASE WHEN n10 + n01 > 0
                THEN CAST((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1)
                          AS DOUBLE) / (n10 + n01) END AS chi2_cc
    FROM cells
    """,
    doc="McNemar's test for PAIRED classifier comparison: two "
        "deterministic language-ID rules score every document against "
        "the lang label, and the test asks whether their disagreement "
        "is asymmetric (one strictly better) — the right test when "
        "both models score the SAME examples, where q140's independent "
        "chi-square is wrong.  Reports the full 2x2 concordance "
        "(n11/n10/n01/n00), the McNemar statistic (n10-n01)^2/"
        "(n10+n01), and the Edwards continuity-corrected variant — "
        "all from exact integer cells in ONE conditional-aggregate "
        "fact pass (the q137 shape, zero joins), CASE-guarded for "
        "zero discordance.  The per-document squared terms are "
        "bounded by n^2 < 2^63 up to ~3e9 docs; past that widen to "
        "DECIMAL as q318/q320 prescribe.",
    tags=("documents", "ml-stats", "experimentation", "agg"),
)
def q346(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    a_ok = (
        F.when(F.col("n_chars") % 2 == 0, "en").otherwise("zh") == F.col("lang")
    )
    b_ok = F.when(F.col("doc_id") % 3 == 0, "en").otherwise("zh") == F.col("lang")
    cells = d.select(a_ok.alias("a_ok"), b_ok.alias("b_ok")).agg(
        F.sum(F.when(F.col("a_ok") & F.col("b_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n11"),
        F.sum(F.when(F.col("a_ok") & ~F.col("b_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n10"),
        F.sum(F.when(~F.col("a_ok") & F.col("b_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n01"),
        F.sum(F.when(~F.col("a_ok") & ~F.col("b_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n00"),
    )
    disc = F.col("n10") + F.col("n01")
    diff = F.col("n10") - F.col("n01")
    return cells.select(
        "n11",
        "n10",
        "n01",
        "n00",
        emit(F.when(disc > 0, (diff * diff).cast("double") / disc)).alias("chi2"),
        emit(
            F.when(
                disc > 0,
                ((F.abs(diff) - 1) * (F.abs(diff) - 1)).cast("double") / disc,
            )
        ).alias("chi2_cc"),
    )


# ---------------------------------------------------------------------------
# q347: randomization inference (Fisherian permutation p-value)
# ---------------------------------------------------------------------------

@register(
    "q347_randomization_inference",
    sql="""
    WITH f AS (
      SELECT user_id,
             CAST(user_id % 2 AS BIGINT) AS treat,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    obs AS (
      SELECT CAST(round((CAST(SUM(CASE WHEN treat = 1 THEN cents END) AS DOUBLE)
                   / SUM(CASE WHEN treat = 1 THEN 1 END)
                   - CAST(SUM(CASE WHEN treat = 0 THEN cents END) AS DOUBLE)
                     / SUM(CASE WHEN treat = 0 THEN 1 END)) * 10000.0)
                  AS BIGINT) AS obs_m
      FROM f
    ),
    fan AS (
      SELECT b.b, f.cents,
             CAST(('0x' || substr(md5(CAST(f.user_id AS VARCHAR) || ':'
                                      || CAST(b.b AS VARCHAR)), 1, 8))
                  AS BIGINT) % 2 AS pt
      FROM f, (SELECT unnest(generate_series(0, 63)) AS b) b
    ),
    per AS (
      SELECT b,
             CAST(SUM(CASE WHEN pt = 1 THEN cents END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN pt = 1 THEN 1 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN pt = 0 THEN cents END) AS BIGINT) AS s0,
             CAST(SUM(CASE WHEN pt = 0 THEN 1 END) AS BIGINT) AS c0
      FROM fan GROUP BY b
    ),
    nulls AS (
      SELECT b, CAST(round((CAST(s1 AS DOUBLE) / c1
                            - CAST(s0 AS DOUBLE) / c0) * 10000.0)
                     AS BIGINT) AS null_m
      FROM per WHERE c1 > 0 AND c0 > 0
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nulls) AS n_draws,
           CAST(obs_m AS DOUBLE) / 1000000.0 AS observed_diff,
           CAST(1 + (SELECT COUNT(*) FROM nulls
                     WHERE abs(null_m) >= abs(obs_m)) AS DOUBLE)
             / (1 + (SELECT COUNT(*) FROM nulls)) AS p_value
    FROM obs
    """,
    doc="Randomization inference (Fisher's exact approach to "
        "experiment analysis): the p-value of the observed "
        "treat-minus-control purchase-value difference against the "
        "null distribution generated by 64 DETERMINISTIC "
        "pseudo-assignments (md5(user:b) parity — rerun/partition/"
        "engine-stable, the q149/q322 recipe), p = (1 + #{|null| >= "
        "|obs|}) / (1 + B).  This is the design-based alternative to "
        "q330's model SEs: no variance formula, no normality, exact "
        "under the sharp null.  Mean diffs are rounded to ten-"
        "thousandths-of-a-cent BIGINTs BEFORE the |null| >= |obs| "
        "comparison, so the accept/reject decision per draw is "
        "engine-identical.  Physical: the fact fans out x64 against a "
        "broadcast draw spine (one conditional-aggregate pass at "
        "(draw) grain — at 100 TB sample the fact first or lower B; "
        "the fan-out is the documented cost of design-based "
        "inference), plus one single-row observed leg.",
    tags=("events", "experimentation", "stats", "agg"),
)
def q347(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate to USER grain before the x64 draw fan-out (guide §2.3
    # "aggregate before you shuffle", r11): every draw's parity is a
    # function of (user_id, b) and treat = user_id % 2 is constant per
    # user, so per-arm sums over ROWS equal per-arm sums over per-user
    # (sum cents, count) partials — identical BIGINT arithmetic, while
    # the md5 evaluations and fanned rows drop from 64x|purchases| to
    # 64x|users| (~22x fewer at sf0.1, more at scale).
    u = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            (F.col("value").cast(DEC) * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("cents").cast("bigint").alias("ucents"),
            F.count(F.lit(1)).cast("bigint").alias("un"),
        )
        .withColumn("treat", (F.col("user_id") % 2).cast("bigint"))
    )
    obs = u.agg(
        F.round(
            (
                F.sum(F.when(F.col("treat") == 1, F.col("ucents"))).cast("double")
                / F.sum(F.when(F.col("treat") == 1, F.col("un")))
                - F.sum(F.when(F.col("treat") == 0, F.col("ucents"))).cast(
                    "double"
                )
                / F.sum(F.when(F.col("treat") == 0, F.col("un")))
            )
            * F.lit(10000.0)
        )
        .cast("bigint")
        .alias("obs_m")
    )
    spine = spark.range(0, 64).select(F.col("id").cast("bigint").alias("b"))
    pt = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    fan = u.crossJoin(F.broadcast(spine)).select(
        "b", "ucents", "un", pt.alias("pt")
    )
    per = fan.groupBy("b").agg(
        F.sum(F.when(F.col("pt") == 1, F.col("ucents"))).cast("bigint").alias("s1"),
        F.sum(F.when(F.col("pt") == 1, F.col("un"))).cast("bigint").alias("c1"),
        F.sum(F.when(F.col("pt") == 0, F.col("ucents"))).cast("bigint").alias("s0"),
        F.sum(F.when(F.col("pt") == 0, F.col("un"))).cast("bigint").alias("c0"),
    )
    nulls = per.where((F.col("c1") > 0) & (F.col("c0") > 0)).select(
        F.round(
            (
                F.col("s1").cast("double") / F.col("c1")
                - F.col("s0").cast("double") / F.col("c0")
            )
            * F.lit(10000.0)
        )
        .cast("bigint")
        .alias("null_m")
    )
    # obs_m rides the same aggregate (constant within the join), so
    # the observed leg's fact scan runs once, not once per consumer.
    # LEFT join from the single-row obs onto the <=64-row broadcast
    # null-distribution: when every draw degenerates (empty nulls —
    # e.g. zero purchases, or a single-user log where each md5 parity
    # leaves an empty arm) the obs row survives with null_m NULL, so
    # count("null_m") = 0 and the NULL comparison falls to otherwise(0),
    # yielding p_value = (1+0)/(1+0) = 1.0 exactly like the SQL twin
    # (a crossJoin would emit zero rows and NULL the p-value).
    ncmp = obs.join(F.broadcast(nulls), F.lit(True), "left").agg(
        F.count("null_m").cast("bigint").alias("n_draws"),
        F.sum(
            F.when(F.abs(F.col("null_m")) >= F.abs(F.col("obs_m")), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_ge"),
        F.max("obs_m").alias("obs_m"),
    )
    return ncmp.select(
        "n_draws",
        emit(F.col("obs_m").cast("double") / F.lit(1000000.0)).alias(
            "observed_diff"
        ),
        emit(
            (1 + F.col("n_ge")).cast("double") / (1 + F.col("n_draws"))
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# q348: expected calibration error over the forecast grid
# ---------------------------------------------------------------------------

@register(
    "q348_calibration_ece",
    sql="""
    WITH f AS (
      SELECT least(19, CAST(floor(value / 30.0) AS BIGINT)) AS k,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    b AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS nk, CAST(SUM(y) AS BIGINT) AS pk
      FROM f GROUP BY k
    ),
    t AS (SELECT CAST(SUM(nk) AS BIGINT) AS n FROM b),
    terms AS (
      SELECT b.k, b.nk, b.pk, t.n,
             abs(40 * b.pk - (2 * b.k + 1) * b.nk) AS gap_num
      FROM b, t
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(CAST(SUM(gap_num) AS BIGINT) AS DOUBLE)
             / (40.0 * MAX(n)) AS ece,
           CAST(MAX(CAST(round(CAST(gap_num AS DOUBLE) / (40.0 * nk) * 1e6)
                         AS BIGINT)) AS DOUBLE) / 1e6 AS mce
    FROM terms
    """,
    doc="Expected and maximum calibration error over q327's discrete "
        "forecast grid (p_k = (2k+1)/40 over 20 value buckets "
        "predicting the purchase outcome): ECE = sum_k n_k/N * "
        "|acc_k - conf_k|, MCE = max_k |acc_k - conf_k| — the "
        "reliability-diagram summary numbers every model eval reports "
        "next to the Brier score.  The per-bin gap |acc - conf| = "
        "|40 p_k - (2k+1) n_k| / (40 n_k) has an EXACT integer "
        "numerator, and because the ECE weights are n_k/N the n_k "
        "denominators cancel: ECE = sum|40 p_k - (2k+1) n_k| / (40 N) "
        "is ONE exact integer sum over <= 20 bins with a single "
        "terminal division — zero per-bin rounding at all; MCE "
        "micro-rounds each bin's gap before the max.  Physical: one "
        "fact scan to 20-bin grain (q327's shape), single-row totals "
        "cross.",
    tags=("events", "eval", "ml-stats", "agg"),
)
def q348(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = load(spark, sf_dir, "events").select(
        F.least(
            F.lit(19).cast("bigint"),
            F.floor(F.col("value") / F.lit(30.0)).cast("bigint"),
        ).alias("k"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = f.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        F.sum("y").cast("bigint").alias("pk"),
    )
    t = b.agg(F.sum("nk").cast("bigint").alias("n"))
    terms = b.crossJoin(F.broadcast(t)).select(
        "nk",
        "n",
        F.abs(40 * F.col("pk") - (2 * F.col("k") + 1) * F.col("nk")).alias(
            "gap_num"
        ),
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n_events"),
        emit(
            F.sum("gap_num").cast("bigint").cast("double")
            / (F.lit(40.0) * F.max("n"))
        ).alias("ece"),
        emit(
            F.max(
                F.round(
                    F.col("gap_num").cast("double") / (F.lit(40.0) * F.col("nk")) * 1e6
                ).cast("bigint")
            ).cast("double")
            / F.lit(1e6)
        ).alias("mce"),
    )


# ---------------------------------------------------------------------------
# q349: sessionization gap-threshold sensitivity
# ---------------------------------------------------------------------------

@register(
    "q349_session_gap_sensitivity",
    sql="""
    WITH seq AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ),
    gaps AS (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL THEN NULL
                  ELSE CAST(epoch_us(ts) - epoch_us(prev_ts) AS BIGINT) END
               AS gap_us
      FROM seq
    ),
    thresholds AS (
      SELECT unnest([900, 1800, 3600]) AS gap_s
    ),
    per AS (
      SELECT t.gap_s,
             CAST(COUNT(DISTINCT g.user_id) AS BIGINT) AS n_users,
             CAST(SUM(CASE WHEN g.gap_us IS NULL
                            OR g.gap_us > CAST(t.gap_s AS BIGINT) * 1000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM gaps g, thresholds t
      GROUP BY 1
    )
    SELECT gap_s AS gap_seconds, n_users, n_sessions,
           CAST(n_events AS DOUBLE) / n_sessions AS events_per_session
    FROM per
    """,
    doc="Sessionization sensitivity audit: session counts and mean "
        "session length at three inactivity thresholds (15/30/60 min) "
        "in ONE pass — the parameter-sensitivity report that justifies "
        "(or indicts) the 30-minute default every funnel/retention "
        "query (q12/q32/q80/q161) inherits.  A session starts where "
        "the gap to the previous event exceeds the threshold (or at "
        "the user's first event), so n_sessions = count of "
        "session-starts — a pure conditional sum over the SAME lag "
        "window output for all three thresholds: the fact is scanned "
        "and lag-windowed ONCE, then the gap-grain rows fan out x3 "
        "against the threshold spine (integer-microsecond "
        "comparisons, no re-windowing).  events_per_session divides "
        "exact integers once per output row.",
    tags=("events", "sessions", "window", "agg"),
)
def q349(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        F.when(
            F.lag("ts").over(w).isNotNull(),
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)),
        ).alias("gap_us"),
    )
    spine = spark.createDataFrame(
        [(900,), (1800,), (3600,)], "gap_s int"
    )
    per = (
        gaps.crossJoin(F.broadcast(spine))
        .groupBy("gap_s")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(
                F.when(
                    F.col("gap_us").isNull()
                    | (F.col("gap_us") > F.col("gap_s").cast("bigint") * 1000000),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_sessions"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    return per.select(
        F.col("gap_s").alias("gap_seconds"),
        "n_users",
        "n_sessions",
        emit(F.col("n_events").cast("double") / F.col("n_sessions")).alias(
            "events_per_session"
        ),
    )


# ---------------------------------------------------------------------------
# q350: BLEU-2 scoring of paired documents
# ---------------------------------------------------------------------------

@register(
    "q350_bleu_pairs",
    sql="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id < 30
    ),
    uni AS (
      SELECT doc_id, unnest(t) AS g, 1 AS n FROM toks
      UNION ALL
      SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g, 2 AS n
      FROM (SELECT doc_id, t FROM toks WHERE len(t) >= 2),
           unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    cnt AS (
      SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS c
      FROM uni GROUP BY 1, 2, 3
    ),
    pairs AS (
      SELECT c.doc_id AS cand, c.doc_id % 10 AS ref FROM
        (SELECT DISTINCT doc_id FROM toks WHERE doc_id >= 10) c
    ),
    clip AS (
      SELECT p.cand, cc.n,
             CAST(SUM(least(cc.c, COALESCE(rc.c, 0))) AS BIGINT) AS match_c,
             CAST(SUM(cc.c) AS BIGINT) AS total_c
      FROM pairs p
      JOIN cnt cc ON cc.doc_id = p.cand
      LEFT JOIN cnt rc ON rc.doc_id = p.ref AND rc.n = cc.n AND rc.g = cc.g
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT cand,
             MAX(CASE WHEN n = 1 THEN match_c END) AS m1,
             MAX(CASE WHEN n = 1 THEN total_c END) AS t1,
             MAX(CASE WHEN n = 2 THEN match_c END) AS m2,
             MAX(CASE WHEN n = 2 THEN total_c END) AS t2
      FROM clip GROUP BY 1
    ),
    lens AS (
      SELECT doc_id, CAST(len(list_filter(t, x -> x <> '')) AS BIGINT) AS lc
      FROM toks
    ),
    scored AS (
      SELECT w.cand, w.m1, w.t1, COALESCE(w.m2, 0) AS m2,
             COALESCE(w.t2, 0) AS t2,
             cl.lc AS len_cand, rl.lc AS len_ref,
             CASE WHEN w.m1 > 0 AND COALESCE(w.m2, 0) > 0 THEN
               CAST(round(
                 exp(0.5 * (ln(CAST(w.m1 AS DOUBLE) / w.t1)
                            + ln(CAST(w.m2 AS DOUBLE) / w.t2)))
                 * CASE WHEN cl.lc >= rl.lc THEN 1.0
                        ELSE exp(1.0 - CAST(rl.lc AS DOUBLE) / cl.lc) END
                 * 1e6) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS bleu_m
      FROM wide w
      JOIN lens cl ON cl.doc_id = w.cand
      JOIN lens rl ON rl.doc_id = w.cand % 10
    )
    SELECT cand AS doc_id, len_cand, len_ref,
           CAST(m1 AS DOUBLE) / t1 AS p1,
           CASE WHEN t2 > 0 THEN CAST(m2 AS DOUBLE) / t2 END AS p2,
           CAST(bleu_m AS DOUBLE) / 1e6 AS bleu2
    FROM scored
    """,
    doc="BLEU-2 scoring of paired documents (Papineni et al. 2002): "
        "each candidate doc (10..29) scores against its reference "
        "(doc_id % 10) with CLIPPED modified n-gram precision — "
        "match = sum over candidate n-gram types of min(cand count, "
        "ref count), the clipping that stops 'the the the' gaming — "
        "geometric mean of 1-gram and 2-gram precisions times the "
        "brevity penalty exp(1 - ref_len/cand_len) when the candidate "
        "is shorter.  Counts are exact integers at (doc, n, gram) "
        "grain; the transcendental combine micro-rounds per PAIR "
        "(bounded output grain, no cross-row sum of floats).  Zero "
        "matches at either order -> BLEU 0 (log-undefined case "
        "CASE-guarded identically both sides).  Physical: one "
        "tokenize pass over the bounded eval slice builds both gram "
        "orders in one frame; the clip join runs at gram-type grain "
        "keyed (doc, n, gram).",
    tags=("llmdata", "eval", "documents", "text"),
)
def q350(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..partitioning import fan_out

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = fan_out(d.select("doc_id", toks.alias("t")))
    uni = base.select(
        "doc_id", F.explode("t").alias("g"), F.lit(1).alias("n")
    )
    bi = (
        base.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, 2)),
                )
            ).alias("g"),
            F.lit(2).alias("n"),
        )
    )
    cnt = (
        uni.unionByName(bi)
        .groupBy("doc_id", "n", "g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    cand = cnt.where(F.col("doc_id") >= 10).select(
        F.col("doc_id").alias("cand"), "n", "g", F.col("c").alias("cc")
    )
    ref = cnt.where(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("ref"), "n", "g", F.col("c").alias("rc")
    )
    clip = (
        cand.withColumn("ref", F.col("cand") % 10)
        .join(ref, ["ref", "n", "g"], "left")
        .groupBy("cand", "n")
        .agg(
            F.sum(F.least(F.col("cc"), F.coalesce(F.col("rc"), F.lit(0))))
            .cast("bigint")
            .alias("match_c"),
            F.sum("cc").cast("bigint").alias("total_c"),
        )
    )
    wide = clip.groupBy("cand").agg(
        F.max(F.when(F.col("n") == 1, F.col("match_c"))).alias("m1"),
        F.max(F.when(F.col("n") == 1, F.col("total_c"))).alias("t1"),
        F.max(F.when(F.col("n") == 2, F.col("match_c"))).alias("m2"),
        F.max(F.when(F.col("n") == 2, F.col("total_c"))).alias("t2"),
    )
    lens = base.select(
        "doc_id",
        F.size(F.filter("t", lambda x: x != "")).cast("bigint").alias("lc"),
    )
    cl = lens.select(F.col("doc_id").alias("cand"), F.col("lc").alias("len_cand"))
    rl = lens.select(F.col("doc_id").alias("_r"), F.col("lc").alias("len_ref"))
    m2z = F.coalesce(F.col("m2"), F.lit(0))
    t2z = F.coalesce(F.col("t2"), F.lit(0))
    bp = F.when(
        F.col("len_cand") >= F.col("len_ref"), F.lit(1.0)
    ).otherwise(
        F.exp(F.lit(1.0) - F.col("len_ref").cast("double") / F.col("len_cand"))
    )
    bleu_m = F.when(
        (F.col("m1") > 0) & (m2z > 0),
        F.round(
            F.exp(
                F.lit(0.5)
                * (
                    F.log(F.col("m1").cast("double") / F.col("t1"))
                    + F.log(m2z.cast("double") / t2z)
                )
            )
            * bp
            * F.lit(1e6)
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        wide.join(cl, "cand")
        .join(rl, F.col("cand") % 10 == F.col("_r"))
        .select(
            F.col("cand").alias("doc_id"),
            "len_cand",
            "len_ref",
            emit(F.col("m1").cast("double") / F.col("t1")).alias("p1"),
            emit(
                F.when(t2z > 0, m2z.cast("double") / t2z)
            ).alias("p2"),
            emit(bleu_m.cast("double") / F.lit(1e6)).alias("bleu2"),
        )
    )
