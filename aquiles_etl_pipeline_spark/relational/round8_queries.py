"""Round-8 catalog entries (q328+): link analysis, corpus governance,
and experiment-depth operators a training-data platform needs that no
earlier entry covers — common-neighbor / Adamic-Adar link prediction
over the co-purchase graph, multi-phrase blocklist auditing (the safety
filter pass), difference-in-differences with cell-variance standard
errors, delete-one-cluster jackknife SEs for cluster-sampled means,
absorbing-chain conversion probabilities, sparse tf-idf cosine top-k
via an inverted index, rank-biased overlap between rankings,
propensity-stratified ATT, a word2vec-style negative-sampling table,
split-conformal prediction intervals, exact q-q quantile points, and a
streaming additive-histogram parity drain.

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
        "self-consistent.  TakeOrdered top-30 on a unique "
        "(aa_sum, pa, pb) key keeps the cut deterministic.",
    tags=("graph", "recsys", "lineitem"),
)
def q328(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    op = li.select(
        F.col("l_orderkey").alias("ord"), F.col("l_partkey").alias("part")
    ).distinct()
    deg = op.groupBy("ord").agg(F.count(F.lit(1)).cast("bigint").alias("dc"))
    kept = (
        op.join(deg, "ord")
        .where((F.col("dc") >= 2) & (F.col("dc") <= 16))
        .select(
            "ord",
            "part",
            F.round(F.lit(1e6) / F.log(F.col("dc").cast("double")))
            .cast("bigint")
            .alias("aa_m"),
        )
    )
    pd_ = kept.groupBy("part").agg(F.count(F.lit(1)).cast("bigint").alias("dp"))
    baskets = kept.groupBy("ord").agg(
        F.sort_array(F.collect_set("part")).alias("parts"),
        F.min("aa_m").alias("aa_m"),
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + F.lit(2), F.size(F.col("parts"))),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"), "aa_m")
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
        SUM(CASE WHEN treat AND NOT post THEN CAST(cents * cents AS DECIMAL(38,0)) ELSE 0 END) AS q_tp,
        SUM(CASE WHEN treat AND post THEN CAST(cents * cents AS DECIMAL(38,0)) ELSE 0 END)     AS q_tq,
        SUM(CASE WHEN NOT treat AND NOT post THEN CAST(cents * cents AS DECIMAL(38,0)) ELSE 0 END) AS q_cp,
        SUM(CASE WHEN NOT treat AND post THEN CAST(cents * cents AS DECIMAL(38,0)) ELSE 0 END) AS q_cq
      FROM f
    )
    SELECT n_tp AS n_treat_pre, n_tq AS n_treat_post,
           n_cp AS n_ctrl_pre,  n_cq AS n_ctrl_post,
           CAST(s_tp AS DOUBLE) / (100.0 * n_tp) AS mean_treat_pre,
           CAST(s_tq AS DOUBLE) / (100.0 * n_tq) AS mean_treat_post,
           CAST(s_cp AS DOUBLE) / (100.0 * n_cp) AS mean_ctrl_pre,
           CAST(s_cq AS DOUBLE) / (100.0 * n_cq) AS mean_ctrl_post,
           (CAST(s_tq AS DOUBLE) / (100.0 * n_tq)
            - CAST(s_tp AS DOUBLE) / (100.0 * n_tp))
           - (CAST(s_cq AS DOUBLE) / (100.0 * n_cq)
              - CAST(s_cp AS DOUBLE) / (100.0 * n_cp)) AS did,
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
        "cents^2 <= 2.4e9 per row, so the per-row product is exact "
        "int64 and the sum is exact decimal at any corpus size) come "
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
            F.sum(
                F.when(c, (F.col("cents") * F.col("cents")).cast("decimal(38,0)"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias(f"q_{k}"),
        ]
    cells = f.agg(*aggs)

    def mean(k: str) -> F.Column:
        return F.col(f"s_{k}").cast("double") / (F.lit(100.0) * F.col(f"n_{k}"))

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
        emit((mean("tq") - mean("tp")) - (mean("cq") - mean("cp"))).alias("did"),
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
             CAST(round(CAST(tot.s - bk.s_i AS DOUBLE) * 10000.0
                        / (tot.n - bk.n_i)) AS BIGINT) AS theta_m,
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
        "micro-rounded to BIGINT; deviations use the cross-multiplied "
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
    th = bk.crossJoin(F.broadcast(tot)).select(
        F.round(
            (F.col("s") - F.col("s_i")).cast("double")
            * F.lit(10000.0)
            / (F.col("n") - F.col("n_i"))
        )
        .cast("bigint")
        .alias("theta_m"),
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
