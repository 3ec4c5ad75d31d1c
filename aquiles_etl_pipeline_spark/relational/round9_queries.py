"""Round-9 catalog entries (q351-q360): cluster-operations advisors and
statistics depth a training-data platform needs that no earlier entry
covers — a join-skew advisor (hot-key census with salt-bucket
recommendations, the planning side of q112's salted join), per-node
local clustering coefficients over the co-purchase graph, the
Nelson-Aalen cumulative-hazard estimator (the additive counterpart of
q231's Kaplan-Meier product), Good-Turing frequency-of-frequencies
smoothing, Chao1/coverage vocabulary-richness estimation, full
association-rule interest measures (confidence/lift/leverage/
conviction over q328's basket shape), Theil's uncertainty coefficient
(the normalized form of q250's mutual information), Wald's sequential
probability ratio test over daily conversion, Krippendorff's alpha for
paired binary coders (the chance-corrected form of q346's concordance
cells), and a deterministic Poisson-bootstrap confidence interval (the
resampling scheme that actually runs at 100 TB — one pass, no
resampled copies).

Shared numeric discipline (see round6b/round7/round8_queries): every
cross-row accumulation happens on EXACT integers — counts, cents, or
per-value transcendentals micro-rounded to BIGINT *before* any sum —
so Spark's partial-aggregation order vs DuckDB's single-threaded order
cannot produce last-ulp drift.  Ratios stay as cross-multiplied
integers until the final emitted expression, which is written with the
identical operation tree on both sides.  Fractional outputs follow the
r09 integer-units rule (ORACLE_SF01.md): one round-to-integer of an
identically-computed double, then an exact divide — never
``round(x, d)``.  Every reachable zero denominator is CASE-guarded in
BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import stream_batch_confs
from .catalog import DEC, emit, load, register


# ---------------------------------------------------------------------------
# q351: join-skew advisor (hot-key census + salt recommendation)
# ---------------------------------------------------------------------------

@register(
    "q351_join_skew_advisor",
    sql="""
    WITH k AS (
      SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(n) AS BIGINT) AS n_rows
      FROM k
    )
    SELECT k.custkey, k.n AS n_rows_key,
           CAST(CAST(round(CAST(k.n AS DOUBLE) * 1e6
                           / CAST(t.n_rows AS DOUBLE)) AS BIGINT)
                AS DOUBLE) / 1e6 AS row_share,
           (k.n * t.n_keys > 10 * t.n_rows) AS is_hot,
           CAST(CASE WHEN k.n * t.n_keys <= t.n_rows THEN 1
                     ELSE (k.n * t.n_keys + t.n_rows - 1) // t.n_rows
                END AS BIGINT) AS salt_buckets
    FROM k, t
    ORDER BY k.n DESC, k.custkey
    LIMIT 20
    """,
    doc="Join-skew advisor: the top-20 hottest o_custkey values with "
        "each key's row share, a hot flag (key rows > 10x the mean "
        "rows/key, decided by exact integer cross-multiplication), and "
        "the recommended salt-bucket count ceil(key_rows / mean) — the "
        "number q112's salted_join needs as its `salt` argument to "
        "bring the whale's per-task share back to the average.  This "
        "is the PLANNING half of skew handling: run the advisor on a "
        "sample, feed the max salt_buckets into the salted join.  "
        "row_share follows the r09 integer-units rule (one round to "
        "integer millionths, then divide).  n*n_keys rides BIGINT — "
        "exact to ~3e9 keys x 3e9 rows/key; widen to DECIMAL(38,0) "
        "past that (q318's prescription).  Physical: one fact rollup "
        "to key grain, a two-number aggregate broadcast back, top-20 "
        "TakeOrdered — no full sort.",
    tags=("scale", "orders", "skew", "advisor"),
)
def q351(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the key-grain census feeds both the two-number totals aggregate
    # and the per-key report — localCheckpoint it so the FACT scans
    # once (key grain is |customers|, orders smaller than the fact)
    k = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint()
    )
    t = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
    j = k.crossJoin(F.broadcast(t))
    need = F.col("n") * F.col("n_keys")
    return (
        j.select(
            "custkey",
            F.col("n").alias("n_rows_key"),
            (
                F.round(
                    F.col("n").cast("double")
                    * F.lit(1e6)
                    / F.col("n_rows").cast("double")
                )
                .cast("bigint")
                .cast("double")
                / F.lit(1e6)
            ).alias("row_share"),
            (need > 10 * F.col("n_rows")).alias("is_hot"),
            F.when(need <= F.col("n_rows"), F.lit(1))
            .otherwise(
                F.expr("(n * n_keys + n_rows - 1) div n_rows")
            )
            .cast("bigint")
            .alias("salt_buckets"),
        )
        .orderBy(F.desc("n_rows_key"), "custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q352: local clustering coefficient over the part co-purchase graph
# ---------------------------------------------------------------------------

@register(
    "q352_local_clustering_coefficient",
    sql="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS ord, l_partkey AS part FROM lineitem
    ),
    bs AS (SELECT ord, COUNT(*) AS sz FROM op GROUP BY 1),
    bp AS (
      SELECT op.ord, op.part FROM op JOIN bs USING (ord)
      WHERE bs.sz BETWEEN 2 AND 16
    ),
    pr AS (
      SELECT a.part AS pa, b.part AS pb, CAST(COUNT(*) AS BIGINT) AS common
      FROM bp a JOIN bp b ON a.ord = b.ord AND a.part < b.part
      GROUP BY 1, 2
    ),
    e AS (SELECT pa, pb FROM pr WHERE common >= 2),
    deg AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT pa AS part FROM e UNION ALL SELECT pb AS part FROM e
      ) GROUP BY 1
    ),
    tri AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM e e1
      JOIN e e2 ON e2.pa = e1.pb
      JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    tcnt AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS tri FROM (
        SELECT a AS part FROM tri
        UNION ALL SELECT b AS part FROM tri
        UNION ALL SELECT c AS part FROM tri
      ) GROUP BY 1
    )
    SELECT d.part, d.deg,
           CAST(COALESCE(t.tri, 0) AS BIGINT) AS n_triangles,
           2.0 * CAST(COALESCE(t.tri, 0) AS DOUBLE)
             / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1.0)) AS lcc
    FROM deg d LEFT JOIN tcnt t USING (part)
    WHERE d.deg >= 2
    ORDER BY lcc DESC, d.part
    LIMIT 20
    """,
    doc="Per-node local clustering coefficient over the part "
        "co-purchase graph (edges: part pairs sharing >= 2 baskets, "
        "q328's basket shape with the same 2..16 size cap): lcc = "
        "2*triangles / (deg*(deg-1)) — Watts-Strogatz local "
        "transitivity, the 'do my neighbors know each other' signal "
        "that separates a hub (low lcc) from a clique member (lcc 1).  "
        "q156 counts triangles GLOBALLY; this attributes them per "
        "node.  Exactness: deg and triangle counts are exact integers "
        "from ordered (a<b<c) edge-edge-edge joins; lcc is one double "
        "division of exact integers — bit-identical both engines, so "
        "the top-20 order (lcc desc, part) is deterministic.  Scale: "
        "the basket-size cap bounds pair fan-out at C(16,2) per order; "
        "the common>=2 filter prunes the edge set BEFORE the triangle "
        "join; the triangle join is edge-grain (never touches facts) "
        "with the a<b<c ordering cutting the enumeration 6x.",
    tags=("graph", "lineitem", "stats"),
)
def q352(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .baskets import capped_baskets, pair_array

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # in-row pair expansion over the shared capped-basket kernel (one
    # corpus shuffle; the SQL twin states the equivalent self-join) —
    # edges feed the degree rollup AND three triangle-join legs, so
    # localCheckpoint the edge frame
    e = (
        capped_baskets(li)
        .select(F.explode(pair_array("parts")).alias("p"))
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
        .where(F.col("common") >= 2)
        .select("pa", "pb")
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("pa").alias("part"))
        .unionAll(e.select(F.col("pb").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    e1 = e.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = e.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = e.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tcnt = (
        tri.select(F.col("a").alias("part"))
        .unionAll(tri.select(F.col("b").alias("part")))
        .unionAll(tri.select(F.col("c").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tri"))
    )
    dd = F.col("deg").cast("double")
    return (
        deg.join(tcnt, "part", "left")
        .where(F.col("deg") >= 2)
        .select(
            "part",
            "deg",
            F.coalesce(F.col("tri"), F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
            emit(
                F.lit(2.0)
                * F.coalesce(F.col("tri"), F.lit(0)).cast("double")
                / (dd * (dd - F.lit(1.0)))
            ).alias("lcc"),
        )
        .orderBy(F.desc("lcc"), "part")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q353: Nelson-Aalen cumulative hazard (signup -> first purchase)
# ---------------------------------------------------------------------------

@register(
    "q353_nelson_aalen_hazard",
    sql="""
    WITH su AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    pu AS (
      SELECT e.user_id, MIN(e.ts) AS tp
      FROM events e JOIN su ON su.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= su.t0
      GROUP BY 1
    ),
    maxd AS (SELECT MAX(ts) AS md FROM events),
    obs AS (
      SELECT su.user_id,
             CAST(date_diff('day', CAST(su.t0 AS DATE),
                            CAST(COALESCE(pu.tp, maxd.md) AS DATE))
                  AS BIGINT) AS t,
             CASE WHEN pu.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM su LEFT JOIN pu ON pu.user_id = su.user_id, maxd
    ),
    byday AS (
      SELECT t,
             CAST(COUNT(*) AS BIGINT) AS c_all,
             CAST(SUM(ev) AS BIGINT) AS c_ev
      FROM obs GROUP BY 1
    ),
    risk AS (
      SELECT t, c_all, c_ev,
             CAST(SUM(c_all) OVER () AS BIGINT)
               - CAST(SUM(c_all) OVER (ORDER BY t) AS BIGINT)
               + c_all AS n_risk
      FROM byday
    ),
    haz AS (
      SELECT t, c_ev, n_risk,
             CAST(SUM(CAST(round(CAST(c_ev AS DOUBLE) * 1e6
                                 / CAST(n_risk AS DOUBLE)) AS BIGINT))
                  OVER (ORDER BY t) AS BIGINT) AS cum_m
      FROM risk
    )
    SELECT t AS day_lag, c_ev AS n_events, n_risk,
           CAST(cum_m AS DOUBLE) / 1e6 AS cum_hazard
    FROM haz WHERE c_ev > 0
    ORDER BY day_lag
    """,
    doc="Nelson-Aalen cumulative-hazard estimator for the signup -> "
        "first-purchase lag (right-censored at the corpus horizon): "
        "H(t) = sum over event days d <= t of d_i / n_i, with n_i the "
        "at-risk count (users whose observed time >= d).  The ADDITIVE "
        "counterpart of q231's Kaplan-Meier product — preferred when "
        "hazards are the modeling target (H = -ln S asymptotically) "
        "and trivially exact in SQL: per-day hazard increments are "
        "micro-rounded to integer millionths BEFORE the running sum "
        "(the q340 discipline), so the cumulative hazard is an exact "
        "integer in both engines.  Physical: two user-grain "
        "reductions, a day-grain rollup (bounded by the lag range, "
        "~hundreds of rows), and windows over that tiny frame — the "
        "fact shuffles once per reduction, never at day grain.",
    tags=("events", "survival", "stats", "window"),
)
def q353(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .join(su.select("user_id", "t0"), "user_id")
        .where(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    maxd = ev.agg(F.max("ts").alias("md"))
    obs = (
        su.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(maxd))
        .select(
            F.datediff(
                F.coalesce(F.col("tp"), F.col("md")).cast("date"),
                F.col("t0").cast("date"),
            )
            .cast("bigint")
            .alias("t"),
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    byday = obs.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_all"),
        F.sum("ev").cast("bigint").alias("c_ev"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("t")
    risk = byday.select(
        "t",
        "c_all",
        "c_ev",
        (
            F.sum("c_all").over(w_all).cast("bigint")
            - F.sum("c_all").over(w_cum).cast("bigint")
            + F.col("c_all")
        ).alias("n_risk"),
    )
    term_m = F.round(
        F.col("c_ev").cast("double") * F.lit(1e6) / F.col("n_risk").cast("double")
    ).cast("bigint")
    haz = risk.select(
        "t",
        "c_ev",
        "n_risk",
        F.sum(term_m).over(w_cum).cast("bigint").alias("cum_m"),
    )
    return (
        haz.where(F.col("c_ev") > 0)
        .select(
            F.col("t").alias("day_lag"),
            F.col("c_ev").alias("n_events"),
            "n_risk",
            emit(F.col("cum_m").cast("double") / F.lit(1e6)).alias("cum_hazard"),
        )
        .orderBy("day_lag")
    )


# ---------------------------------------------------------------------------
# q354: Good-Turing frequency-of-frequencies smoothing
# ---------------------------------------------------------------------------

@register(
    "q354_good_turing_smoothing",
    sql="""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    cf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS r
      FROM toks WHERE tok <> '' GROUP BY 1
    ),
    fof AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM cf GROUP BY 1),
    ntok AS (SELECT CAST(SUM(r) AS BIGINT) AS n FROM cf),
    n1 AS (
      SELECT CAST(COALESCE(MAX(n_r), 0) AS BIGINT) AS f1 FROM fof WHERE r = 1
    ),
    low AS (
      SELECT r, n_r, row_number() OVER (ORDER BY r) AS rk FROM fof
    )
    SELECT f.r, f.n_r,
           CAST(COALESCE(g.n_r, 0) AS BIGINT) AS n_r_plus_1,
           CAST((f.r + 1) * COALESCE(g.n_r, 0) AS DOUBLE)
             / CAST(f.n_r AS DOUBLE) AS r_star,
           CAST(n1.f1 AS DOUBLE) / CAST(ntok.n AS DOUBLE) AS p_unseen
    FROM low f LEFT JOIN fof g ON g.r = f.r + 1, ntok, n1
    WHERE f.rk <= 10
    ORDER BY f.r
    """,
    doc="Good-Turing frequency-of-frequencies smoothing over the "
        "corpus vocabulary (Good 1953, the Katz-backoff ingredient): "
        "for the 10 smallest observed frequency classes, the class size "
        "N_r, the adjusted count r* = (r+1) N_{r+1} / N_r, and the "
        "leave-one-out missing-mass estimate P0 = N_1 / N — the "
        "number that says how much probability a language model "
        "should reserve for unseen words.  Every N_r is an exact "
        "integer from two corpus-grain rollups (token counts -> "
        "counts-of-counts); r* and P0 are single double divisions of "
        "exact integers (identical op trees).  N_{r+1} joins at "
        "EXACTLY r+1 (a gap in the frequency spectrum means r* = 0, "
        "Good-Turing's actual definition — a LEAD over present rows "
        "would silently skip gaps).  Physical: the fof table is "
        "tiny (distinct frequencies ~ O(sqrt(corpus))); everything "
        "after the vocabulary rollup is free.",
    tags=("llmdata", "text", "documents", "stats"),
)
def q354(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.postings import token_rows

    d = load(spark, sf_dir, "documents")
    cf = (
        token_rows(d, text_col="text")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    # fof feeds the grid, the r+1 self-join, and the N_1 aggregate —
    # checkpoint the tiny counts-of-counts frame so the corpus
    # tokenize runs once
    fof = (
        cf.groupBy("r")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_r"))
        .localCheckpoint()
    )
    ntok = cf.agg(F.sum("r").cast("bigint").alias("n"))
    n1 = fof.where(F.col("r") == 1).agg(
        F.coalesce(F.max("n_r"), F.lit(0)).cast("bigint").alias("f1")
    )
    g = fof.select(F.col("r").alias("r1"), F.col("n_r").alias("n_r1"))
    nr1 = F.coalesce(F.col("n_r1"), F.lit(0)).cast("bigint")
    # the 10 SMALLEST frequency classes PRESENT, not a fixed r <= 10
    # cutoff — a high-frequency word-soup corpus (or any SF large
    # enough that hapaxes vanish) would otherwise emit zero rows
    low = fof.select(
        "r", "n_r", F.row_number().over(Window.orderBy("r")).alias("rk")
    )
    return (
        low.where(F.col("rk") <= 10)
        .drop("rk")
        .join(g, F.col("r1") == F.col("r") + 1, "left")
        .crossJoin(F.broadcast(ntok))
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            "n_r",
            nr1.alias("n_r_plus_1"),
            emit(
                ((F.col("r") + 1) * nr1).cast("double")
                / F.col("n_r").cast("double")
            ).alias("r_star"),
            emit(
                F.col("f1").cast("double") / F.col("n").cast("double")
            ).alias("p_unseen"),
        )
        .orderBy("r")
    )


# ---------------------------------------------------------------------------
# q355: Chao1 vocabulary richness + Good-Turing coverage per source
# ---------------------------------------------------------------------------

@register(
    "q355_chao1_richness",
    sql="""
    WITH toks AS (
      SELECT source,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    cf AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS r
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS s_obs,
             CAST(SUM(r) AS BIGINT) AS n_tok,
             CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM cf GROUP BY 1
    )
    SELECT source, s_obs, n_tok, f1, f2,
           CAST(s_obs AS DOUBLE)
             + CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE)
               / (2.0 * CAST(f2 + 1 AS DOUBLE)) AS chao1,
           1.0 - CAST(f1 AS DOUBLE) / CAST(n_tok AS DOUBLE) AS coverage
    FROM s
    ORDER BY source
    """,
    doc="Chao1 vocabulary-richness estimate and Good-Turing sample "
        "coverage per source: chao1 = S_obs + f1(f1-1)/(2(f2+1)) (the "
        "bias-corrected form, defined even when no doubletons exist) "
        "estimates how many word TYPES the source's full population "
        "has, from the singleton/doubleton counts alone; coverage = "
        "1 - f1/n estimates what fraction of the source's token mass "
        "the crawl has already seen — the 'is more crawling worth it' "
        "number a data-acquisition team tracks per source.  All five "
        "inputs are exact integers from one (source, token) rollup; "
        "the two estimates are single double expressions with "
        "identical op trees (f1 cast to double BEFORE the f1*(f1-1) "
        "product, so the estimator never wraps however large the "
        "vocabulary grows).  Physical: one corpus tokenize, one "
        "(source, tok) rollup, one source-grain conditional "
        "aggregate — no joins.",
    tags=("llmdata", "text", "documents", "stats"),
)
def q355(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.postings import token_rows

    d = load(spark, sf_dir, "documents")
    cf = (
        token_rows(d, "source", text_col="text")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    s = cf.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_obs"),
        F.sum("r").cast("bigint").alias("n_tok"),
        F.sum(F.when(F.col("r") == 1, 1).otherwise(0)).cast("bigint").alias("f1"),
        F.sum(F.when(F.col("r") == 2, 1).otherwise(0)).cast("bigint").alias("f2"),
    )
    f1d = F.col("f1").cast("double")
    return s.select(
        "source",
        "s_obs",
        "n_tok",
        "f1",
        "f2",
        emit(
            F.col("s_obs").cast("double")
            + f1d
            * (F.col("f1") - 1).cast("double")
            / (F.lit(2.0) * (F.col("f2") + 1).cast("double"))
        ).alias("chao1"),
        emit(
            F.lit(1.0) - f1d / F.col("n_tok").cast("double")
        ).alias("coverage"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q356: association-rule interest measures over part pairs
# ---------------------------------------------------------------------------

@register(
    "q356_rule_interest_measures",
    sql="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS ord, l_partkey AS part FROM lineitem
    ),
    bs AS (SELECT ord, COUNT(*) AS sz FROM op GROUP BY 1),
    bp AS (
      SELECT op.ord, op.part FROM op JOIN bs USING (ord)
      WHERE bs.sz BETWEEN 2 AND 16
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT ord) AS BIGINT) AS n FROM bp),
    dg AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS d FROM bp GROUP BY 1),
    pr AS (
      SELECT a.part AS pa, b.part AS pb, CAST(COUNT(*) AS BIGINT) AS common
      FROM bp a JOIN bp b ON a.ord = b.ord AND a.part < b.part
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    )
    SELECT pr.pa AS part_a, pr.pb AS part_b, pr.common AS common_orders,
           da.d AS n_a, db.d AS n_b,
           CAST(pr.common AS DOUBLE) / CAST(da.d AS DOUBLE) AS confidence,
           CAST(pr.common AS DOUBLE) * CAST(nb.n AS DOUBLE)
             / (CAST(da.d AS DOUBLE) * CAST(db.d AS DOUBLE)) AS lift,
           (CAST(pr.common AS DOUBLE) * CAST(nb.n AS DOUBLE)
            - CAST(da.d AS DOUBLE) * CAST(db.d AS DOUBLE))
             / (CAST(nb.n AS DOUBLE) * CAST(nb.n AS DOUBLE)) AS leverage,
           CASE WHEN da.d > pr.common THEN
             (CAST(nb.n - db.d AS DOUBLE) * CAST(da.d AS DOUBLE))
               / (CAST(nb.n AS DOUBLE) * CAST(da.d - pr.common AS DOUBLE))
           END AS conviction
    FROM pr JOIN dg da ON da.part = pr.pa
            JOIN dg db ON db.part = pr.pb, nb
    ORDER BY leverage DESC, pr.pa, pr.pb
    LIMIT 20
    """,
    doc="Full association-rule interest measures for part pairs over "
        "the capped basket table (q328's shape, sizes 2..16): "
        "confidence P(b|a), lift P(ab)/(P(a)P(b)), leverage P(ab) - "
        "P(a)P(b), and conviction (1-P(b))/(1-conf) — the four "
        "numbers a merchandising rule miner ranks by, where q201 "
        "reports support/confidence only.  Every probability stays a "
        "ratio of exact integer counts until the emitted expression; "
        "leverage/lift/conviction are written with the identical "
        "cross-multiplied double trees in both engines (exact inputs "
        "-> bit-identical doubles -> deterministic top-20 on "
        "(leverage desc, pa, pb)).  Conviction is CASE-guarded for "
        "the conf = 1 pole (infinite conviction -> NULL).  Scale: "
        "identical fan-out bounds to q328 — the size cap bounds pair "
        "expansion, degrees come from the basket table, the three "
        "dimension joins are key-grain.",
    tags=("basket", "rules", "lineitem", "stats"),
)
def q356(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .baskets import capped_baskets, pair_array

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # the shared capped-basket kernel feeds the basket count, the
    # degree rollup, and the in-row pair expansion (one corpus shuffle;
    # the SQL twin states the equivalent self-join)
    baskets = capped_baskets(li).localCheckpoint()
    nb = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dg = (
        baskets.select(F.explode("parts").alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    pr = (
        baskets.select(F.explode(pair_array("parts")).alias("p"))
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
        .where(F.col("common") >= 2)
    )
    da = dg.select(F.col("part").alias("pa"), F.col("d").alias("d_a"))
    db = dg.select(F.col("part").alias("pb"), F.col("d").alias("d_b"))
    j = pr.join(da, "pa").join(db, "pb").crossJoin(F.broadcast(nb))
    cd = F.col("common").cast("double")
    dad, dbd, nd = (
        F.col("d_a").cast("double"),
        F.col("d_b").cast("double"),
        F.col("n").cast("double"),
    )
    return (
        j.select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("common").alias("common_orders"),
            F.col("d_a").alias("n_a"),
            F.col("d_b").alias("n_b"),
            emit(cd / dad).alias("confidence"),
            emit(cd * nd / (dad * dbd)).alias("lift"),
            emit((cd * nd - dad * dbd) / (nd * nd)).alias("leverage"),
            emit(
                F.when(
                    F.col("d_a") > F.col("common"),
                    (F.col("n") - F.col("d_b")).cast("double")
                    * dad
                    / (nd * (F.col("d_a") - F.col("common")).cast("double")),
                )
            ).alias("conviction"),
        )
        .orderBy(F.desc("leverage"), "part_a", "part_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q357: Theil's uncertainty coefficient (segment <-> priority)
# ---------------------------------------------------------------------------

@register(
    "q357_uncertainty_coefficient",
    sql="""
    WITH cells AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri,
             CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM cells),
    xm AS (SELECT seg, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY 1),
    ym AS (SELECT pri, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY 1),
    hx AS (
      SELECT CAST(SUM(CAST(n_x AS DECIMAL(19,0))
                      * CAST(round(ln(CAST(tot.n AS DOUBLE)
                                      / CAST(n_x AS DOUBLE)) * 1e6)
                             AS BIGINT)) AS DECIMAL(38,0)) AS hx_m
      FROM xm, tot
    ),
    hy AS (
      SELECT CAST(SUM(CAST(n_y AS DECIMAL(19,0))
                      * CAST(round(ln(CAST(tot.n AS DOUBLE)
                                      / CAST(n_y AS DOUBLE)) * 1e6)
                             AS BIGINT)) AS DECIMAL(38,0)) AS hy_m
      FROM ym, tot
    ),
    mi AS (
      SELECT CAST(SUM(CAST(c.n_xy AS DECIMAL(19,0))
                      * CAST(round(ln(CAST(c.n_xy AS DOUBLE)
                                      * CAST(tot.n AS DOUBLE)
                                      / (CAST(xm.n_x AS DOUBLE)
                                         * CAST(ym.n_y AS DOUBLE))) * 1e6)
                             AS BIGINT)) AS DECIMAL(38,0)) AS mi_m
      FROM cells c JOIN xm USING (seg) JOIN ym USING (pri), tot
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cells) AS n_cells,
           CAST(hx.hx_m AS DOUBLE) / (1e6 * CAST(tot.n AS DOUBLE))
             AS h_segment,
           CAST(hy.hy_m AS DOUBLE) / (1e6 * CAST(tot.n AS DOUBLE))
             AS h_priority,
           CAST(mi.mi_m AS DOUBLE) / (1e6 * CAST(tot.n AS DOUBLE)) AS mi,
           CASE WHEN hy.hy_m > 0 THEN
             CAST(mi.mi_m AS DOUBLE) / CAST(hy.hy_m AS DOUBLE)
           END AS u_priority_given_segment,
           CASE WHEN hx.hx_m > 0 THEN
             CAST(mi.mi_m AS DOUBLE) / CAST(hx.hx_m AS DOUBLE)
           END AS u_segment_given_priority,
           CASE WHEN hx.hx_m + hy.hy_m > 0 THEN
             2.0 * CAST(mi.mi_m AS DOUBLE)
               / CAST(hx.hx_m + hy.hy_m AS DOUBLE)
           END AS u_symmetric
    FROM tot, hx, hy, mi
    """,
    doc="Theil's uncertainty coefficient between customer segment and "
        "order priority: U(Y|X) = I(X;Y)/H(Y) — the NORMALIZED form "
        "of q250's mutual information ('what fraction of priority's "
        "entropy does knowing the segment remove'), asymmetric both "
        "ways plus the symmetric harmonic form; the dependence number "
        "that, unlike Cramer's V, is 0..1 with an information-theory "
        "meaning.  Cross-engine exactness via the q340 discipline: "
        "each marginal/joint ln is micro-rounded to BIGINT per CELL, "
        "weighted by exact integer counts, and accumulated as "
        "DECIMAL(38,0) (counts x micro-lns overflow int64 past ~3e11 "
        "rows), so every emitted ratio divides two exact integers.  "
        "Physical: one custkey shuffle join, one 25-cell rollup; all "
        "entropy math happens on the cell frame.",
    tags=("stats", "orders", "customer", "information"),
)
def q357(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
        .localCheckpoint()  # feeds tot/xm/ym/mi + the cell count
    )
    tot = cells.agg(F.sum("n_xy").cast("bigint").alias("n"))
    xm = cells.groupBy("seg").agg(F.sum("n_xy").cast("bigint").alias("n_x"))
    ym = cells.groupBy("pri").agg(F.sum("n_xy").cast("bigint").alias("n_y"))
    d19, d38 = "decimal(19,0)", "decimal(38,0)"

    def ent_m(marg: DataFrame, cnt: str) -> DataFrame:
        lnm = F.round(
            F.log(F.col("n").cast("double") / F.col(cnt).cast("double"))
            * F.lit(1e6)
        ).cast("bigint")
        return marg.crossJoin(F.broadcast(tot)).agg(
            F.sum(F.col(cnt).cast(d19) * lnm).cast(d38).alias("m")
        )

    hx = ent_m(xm, "n_x").select(F.col("m").alias("hx_m"))
    hy = ent_m(ym, "n_y").select(F.col("m").alias("hy_m"))
    lnm_xy = F.round(
        F.log(
            F.col("n_xy").cast("double")
            * F.col("n").cast("double")
            / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
        )
        * F.lit(1e6)
    ).cast("bigint")
    mi = (
        cells.join(xm, "seg")
        .join(ym, "pri")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(F.col("n_xy").cast(d19) * lnm_xy).cast(d38).alias("mi_m"))
    )
    ncells = cells.agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"))
    j = (
        ncells.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(mi))
    )
    scale = F.lit(1e6) * F.col("n").cast("double")
    return j.select(
        "n_cells",
        emit(F.col("hx_m").cast("double") / scale).alias("h_segment"),
        emit(F.col("hy_m").cast("double") / scale).alias("h_priority"),
        emit(F.col("mi_m").cast("double") / scale).alias("mi"),
        emit(
            F.when(
                F.col("hy_m") > 0,
                F.col("mi_m").cast("double") / F.col("hy_m").cast("double"),
            )
        ).alias("u_priority_given_segment"),
        emit(
            F.when(
                F.col("hx_m") > 0,
                F.col("mi_m").cast("double") / F.col("hx_m").cast("double"),
            )
        ).alias("u_segment_given_priority"),
        emit(
            F.when(
                (F.col("hx_m") + F.col("hy_m")) > 0,
                F.lit(2.0)
                * F.col("mi_m").cast("double")
                / (F.col("hx_m") + F.col("hy_m")).cast("double"),
            )
        ).alias("u_symmetric"),
    )


# ---------------------------------------------------------------------------
# q358: Wald sequential probability ratio test over daily conversion
# ---------------------------------------------------------------------------

@register(
    "q358_sprt_conversion",
    sql="""
    WITH daily AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS cohort,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS trials,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort, day,
             CAST(SUM(conv) OVER w AS BIGINT) AS cc,
             CAST(SUM(trials) OVER w AS BIGINT) AS ct
      FROM daily
      WINDOW w AS (PARTITION BY cohort ORDER BY day)
    ),
    llr AS (
      SELECT cohort, day,
             cc * CAST(round(ln(0.08 / 0.05) * 1e6) AS BIGINT)
               + (ct - cc) * CAST(round(ln(0.92 / 0.95) * 1e6) AS BIGINT)
               AS llr_m
      FROM cum
    ),
    dec AS (
      SELECT cohort,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             MIN(CASE WHEN llr_m >= CAST(round(ln(0.8 / 0.05) * 1e6)
                                         AS BIGINT)
                      THEN day END) AS d1,
             MIN(CASE WHEN llr_m <= CAST(round(ln(0.2 / 0.95) * 1e6)
                                         AS BIGINT)
                      THEN day END) AS d0,
             max_by(llr_m, day) AS final_m
      FROM llr GROUP BY 1
    )
    SELECT cohort, n_days,
           CAST(CASE WHEN d1 IS NOT NULL AND (d0 IS NULL OR d1 <= d0)
                     THEN d1 ELSE d0 END AS VARCHAR) AS cross_day,
           CASE WHEN d1 IS NOT NULL AND (d0 IS NULL OR d1 <= d0)
                THEN 'accept_h1'
                WHEN d0 IS NOT NULL THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           CAST(final_m AS DOUBLE) / 1e6 AS final_llr
    FROM dec ORDER BY cohort
    """,
    doc="Wald's sequential probability ratio test (SPRT 1945) on daily "
        "purchase conversion per cohort: H0 p=0.05 vs H1 p=0.08, "
        "alpha=0.05, beta=0.2.  The cumulative log-likelihood ratio "
        "conv*ln(p1/p0) + (trials-conv)*ln(q1/q0) is tracked per day; "
        "the test stops the first day it crosses ln((1-beta)/alpha) "
        "(accept H1) or ln(beta/(1-alpha)) (accept H0) — the "
        "always-valid-monitoring answer to q279's fixed-horizon SRM "
        "check, and the reason a platform can stop bad experiments "
        "early.  The two per-observation log terms AND both boundaries "
        "are micro-rounded to BIGINT via the identical expression in "
        "both engines, so the day-by-day LLR is an exact integer and "
        "the crossing day is engine-identical (no drifting double "
        "cumsum).  Physical: one fact rollup to (cohort, day) grain, "
        "windows and the decision aggregate over that tiny frame.",
    tags=("experimentation", "events", "stats", "window"),
)
def q358(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            (F.col("user_id") % 2).cast("bigint").alias("cohort"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("trials"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("conv"),
        )
    )
    # decision math shared with the streaming monitor q361 (defined
    # below) so batch and streaming SPRT stay identical by construction
    return _sprt_readback(spark, daily)


# ---------------------------------------------------------------------------
# q359: Krippendorff's alpha for two binary coders
# ---------------------------------------------------------------------------

@register(
    "q359_krippendorff_alpha",
    sql="""
    WITH j AS (
      SELECT CASE WHEN (CASE WHEN n_chars % 2 = 0 THEN 'en' ELSE 'zh' END)
                       = lang THEN 1 ELSE 0 END AS a,
             CASE WHEN (CASE WHEN doc_id % 3 = 0 THEN 'en' ELSE 'zh' END)
                       = lang THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    cells AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a * b) AS BIGINT) AS n11,
             CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
             CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
             CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
      FROM j
    )
    SELECT n, n11, n10, n01, n00,
           CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS pct_agreement,
           CASE WHEN (2 * n11 + n10 + n01) > 0
                 AND (2 * n00 + n10 + n01) > 0 THEN
             1.0 - (CAST(n10 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
               / (2.0 * (CAST(2 * n11 + n10 + n01 AS DOUBLE)
                         / (2.0 * CAST(n AS DOUBLE)))
                      * (1.0 - CAST(2 * n11 + n10 + n01 AS DOUBLE)
                               / (2.0 * CAST(n AS DOUBLE)))
                      * (CAST(2 * n AS DOUBLE)
                         / (2.0 * CAST(n AS DOUBLE) - 1.0)))
           END AS alpha
    FROM cells
    """,
    doc="Krippendorff's alpha for the two heuristic language coders of "
        "q346 (binary nominal data, two raters, no missing values): "
        "alpha = 1 - Do/De with Do the observed disagreement rate and "
        "De the disagreement expected from the POOLED value "
        "distribution with the small-sample (2n/(2n-1)) correction — "
        "the chance-corrected agreement number annotation teams "
        "report, where q346's McNemar asks only whether the coders' "
        "ERRORS are asymmetric.  All four concordance cells are exact "
        "integers from ONE conditional-aggregate scan (the q137 "
        "shape); alpha is a single double expression of those "
        "integers with the identical op tree in both engines, "
        "CASE-guarded for the degenerate all-same-value pool (De = 0 "
        "-> NULL).  Physical: one document scan, zero joins.",
    tags=("documents", "ml-stats", "agreement", "agg"),
)
def q359(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # F.when(cond, 1).otherwise(0), NOT cond.cast("int"): the equality
    # is NULL on NULL lang and a bare cast would drop the row from all
    # four concordance cells while the SQL twin's CASE ... ELSE 0
    # counts it in n00 (engine-symmetry contract; q346 does the same)
    a = F.when(
        F.when(F.col("n_chars") % 2 == 0, "en").otherwise("zh") == F.col("lang"), 1
    ).otherwise(0)
    b = F.when(
        F.when(F.col("doc_id") % 3 == 0, "en").otherwise("zh") == F.col("lang"), 1
    ).otherwise(0)
    cells = d.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint").alias("n00"),
    )
    nd = F.col("n").cast("double")
    ones = 2 * F.col("n11") + F.col("n10") + F.col("n01")
    zeros = 2 * F.col("n00") + F.col("n10") + F.col("n01")
    q = ones.cast("double") / (F.lit(2.0) * nd)
    do = (F.col("n10") + F.col("n01")).cast("double") / nd
    de = (
        F.lit(2.0)
        * q
        * (F.lit(1.0) - q)
        * ((2 * F.col("n")).cast("double") / (F.lit(2.0) * nd - F.lit(1.0)))
    )
    return cells.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        emit((F.col("n11") + F.col("n00")).cast("double") / nd).alias(
            "pct_agreement"
        ),
        emit(
            F.when((ones > 0) & (zeros > 0), F.lit(1.0) - do / de)
        ).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# q360: deterministic Poisson-bootstrap CI for the mean purchase value
# ---------------------------------------------------------------------------

@register(
    "q360_poisson_bootstrap_ci",
    sql="""
    WITH f AS (
      SELECT event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                  CAST(SUM(cents) AS BIGINT) AS s_all
           FROM f),
    fan2 AS (
      SELECT b.b,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(f.event_id AS VARCHAR)
                                             || ':' || CAST(b.b AS VARCHAR)),
                                         1, 8)) AS BIGINT) / 4294967296.0
                    < 0.36787944117144233 THEN 0
               WHEN CAST(('0x' || substr(md5(CAST(f.event_id AS VARCHAR)
                                             || ':' || CAST(b.b AS VARCHAR)),
                                         1, 8)) AS BIGINT) / 4294967296.0
                    < 0.7357588823428847 THEN 1
               WHEN CAST(('0x' || substr(md5(CAST(f.event_id AS VARCHAR)
                                             || ':' || CAST(b.b AS VARCHAR)),
                                         1, 8)) AS BIGINT) / 4294967296.0
                    < 0.9196986029286058 THEN 2
               WHEN CAST(('0x' || substr(md5(CAST(f.event_id AS VARCHAR)
                                             || ':' || CAST(b.b AS VARCHAR)),
                                         1, 8)) AS BIGINT) / 4294967296.0
                    < 0.9810118431238462 THEN 3
               ELSE 4 END AS w,
             f.cents
      FROM f, (SELECT unnest(generate_series(0, 31)) AS b) b
    ),
    per AS (
      SELECT b, CAST(SUM(w * cents) AS BIGINT) AS sw,
             CAST(SUM(w) AS BIGINT) AS nw
      FROM fan2 GROUP BY 1
    ),
    means AS (
      SELECT b, CAST(round(CAST(sw AS DOUBLE) * 1e4 / CAST(nw AS DOUBLE))
                     AS BIGINT) AS m
      FROM per WHERE nw > 0
    ),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m, b) AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS nb
      FROM means
    )
    SELECT (SELECT nb FROM ranked LIMIT 1) AS n_draws,
           (SELECT CASE WHEN pt.n_rows > 0 THEN
                     CAST(pt.s_all AS DOUBLE) / (100.0 * pt.n_rows) END
            FROM pt) AS point_mean,
           (SELECT CAST(m AS DOUBLE) / 1e6 FROM ranked
            WHERE rn = 1 + (25 * (nb - 1)) // 1000) AS ci_lo,
           (SELECT CAST(m AS DOUBLE) / 1e6 FROM ranked
            WHERE rn = 1 + (975 * (nb - 1)) // 1000) AS ci_hi
    """,
    doc="Deterministic Poisson-bootstrap 95% CI for the mean purchase "
        "value: each of 32 draws reweights every row by a Poisson(1) "
        "count drawn by inverse-CDF from a DETERMINISTIC md5(event:b) "
        "uniform (the q347/q149 recipe — rerun/partition/engine-"
        "stable), per-draw means are micro-rounded to hundredth-of-a-"
        "cent BIGINTs, and the CI endpoints are EXACT order statistics "
        "of the 32 draw means (q338's lower-order-statistic selection, "
        "index 1 + (p(B-1)) div 1000).  Poisson bootstrap (Chamandy "
        "2012) is THE resampling scheme that works at 100 TB: weights "
        "are a per-row pure function, so one fan-out scan computes all "
        "B resamples with no materialized copies and no global n "
        "needed per draw.  The inverse-CDF thresholds are e^-1 "
        "cumulative literals, byte-identical in both engines.  "
        "Physical: the fact fans out x32 against a broadcast spine "
        "into one conditional aggregate at draw grain (the documented "
        "q347 cost model: at 100 TB sample the fact or lower B), plus "
        "a single-row observed leg.",
    tags=("experimentation", "events", "stats", "bootstrap"),
)
def q360(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = load(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(
        "event_id", (F.col("value").cast(DEC) * 100).cast("bigint").alias("cents")
    )
    pt = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("s_all"),
    )
    spine = spark.range(0, 32).select(F.col("id").cast("bigint").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
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
        / F.lit(4294967296.0)
    )
    # project u, THEN derive w from the named column, THEN aggregate —
    # inlining the md5/conv subtree into both aggregate legs would
    # evaluate the hash twice per (row, draw); CollapseProject keeps
    # non-cheap duplicated expressions in their own projection
    w = (
        F.when(F.col("u") < 0.36787944117144233, 0)
        .when(F.col("u") < 0.7357588823428847, 1)
        .when(F.col("u") < 0.9196986029286058, 2)
        .when(F.col("u") < 0.9810118431238462, 3)
        .otherwise(4)
    )
    per = (
        f.crossJoin(F.broadcast(spine))
        .select("b", "cents", u.alias("u"))
        .select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("sw"),
            F.sum("w").cast("bigint").alias("nw"),
        )
    )
    means = per.where(F.col("nw") > 0).select(
        "b",
        F.round(
            F.col("sw").cast("double") * F.lit(1e4) / F.col("nw").cast("double")
        )
        .cast("bigint")
        .alias("m"),
    )
    ranked = means.select(
        "m",
        F.row_number().over(Window.orderBy("m", "b")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("nb"),
    )
    lo = ranked.where(
        F.col("rn") == 1 + F.expr("(25 * (nb - 1)) div 1000")
    ).select(F.col("m").alias("lo_m"), F.col("nb").alias("n_draws"))
    hi = ranked.where(
        F.col("rn") == 1 + F.expr("(975 * (nb - 1)) div 1000")
    ).select(F.col("m").alias("hi_m"))
    # LEFT joins from the always-one-row observed leg (the q347
    # lesson): with zero purchases the draw frame is empty and a
    # crossJoin would emit zero rows while the SQL twin's scalar
    # subqueries emit one row of NULLs
    return (
        pt.join(F.broadcast(lo), F.lit(True), "left")
        .join(F.broadcast(hi), F.lit(True), "left")
        .select(
            "n_draws",
            emit(
                F.when(
                    F.col("n_rows") > 0,
                    F.col("s_all").cast("double")
                    / (F.lit(100.0) * F.col("n_rows").cast("double")),
                )
            ).alias("point_mean"),
            emit(F.col("lo_m").cast("double") / F.lit(1e6)).alias("ci_lo"),
            emit(F.col("hi_m").cast("double") / F.lit(1e6)).alias("ci_hi"),
        )
    )


# ---------------------------------------------------------------------------
# q361: streaming SPRT monitor — additive day-grain rollup parity
# ---------------------------------------------------------------------------

_SPRT_SQL = """
    WITH daily AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS cohort,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS trials,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort, day,
             CAST(SUM(conv) OVER w AS BIGINT) AS cc,
             CAST(SUM(trials) OVER w AS BIGINT) AS ct
      FROM daily
      WINDOW w AS (PARTITION BY cohort ORDER BY day)
    ),
    llr AS (
      SELECT cohort, day,
             cc * CAST(round(ln(0.08 / 0.05) * 1e6) AS BIGINT)
               + (ct - cc) * CAST(round(ln(0.92 / 0.95) * 1e6) AS BIGINT)
               AS llr_m
      FROM cum
    ),
    dec AS (
      SELECT cohort,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             MIN(CASE WHEN llr_m >= CAST(round(ln(0.8 / 0.05) * 1e6)
                                         AS BIGINT)
                      THEN day END) AS d1,
             MIN(CASE WHEN llr_m <= CAST(round(ln(0.2 / 0.95) * 1e6)
                                         AS BIGINT)
                      THEN day END) AS d0,
             max_by(llr_m, day) AS final_m
      FROM llr GROUP BY 1
    )
    SELECT cohort, n_days,
           CAST(CASE WHEN d1 IS NOT NULL AND (d0 IS NULL OR d1 <= d0)
                     THEN d1 ELSE d0 END AS VARCHAR) AS cross_day,
           CASE WHEN d1 IS NOT NULL AND (d0 IS NULL OR d1 <= d0)
                THEN 'accept_h1'
                WHEN d0 IS NOT NULL THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           CAST(final_m AS DOUBLE) / 1e6 AS final_llr
    FROM dec ORDER BY cohort
    """


def _sprt_readback(spark: SparkSession, daily: DataFrame) -> DataFrame:
    """The SPRT decision math over a (cohort, day, trials, conv) frame
    — shared by the batch q358 and the streaming q361 readback so the
    two entries stay decision-identical by construction."""
    w = Window.partitionBy("cohort").orderBy("day")
    cum = daily.select(
        "cohort",
        "day",
        F.sum("conv").over(w).cast("bigint").alias("cc"),
        F.sum("trials").over(w).cast("bigint").alias("ct"),
    )

    def mconst(expr: str) -> F.Column:
        return F.round(F.log(F.expr(expr)) * F.lit(1e6)).cast("bigint")

    llr = cum.select(
        "cohort",
        "day",
        (
            F.col("cc") * mconst("0.08 / 0.05")
            + (F.col("ct") - F.col("cc")) * mconst("0.92 / 0.95")
        ).alias("llr_m"),
    )
    dec = llr.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.min(
            F.when(F.col("llr_m") >= mconst("0.8 / 0.05"), F.col("day"))
        ).alias("d1"),
        F.min(
            F.when(F.col("llr_m") <= mconst("0.2 / 0.95"), F.col("day"))
        ).alias("d0"),
        F.expr("max_by(llr_m, day)").alias("final_m"),
    )
    h1 = F.col("d1").isNotNull() & (
        F.col("d0").isNull() | (F.col("d1") <= F.col("d0"))
    )
    return dec.select(
        "cohort",
        "n_days",
        F.when(h1, F.col("d1")).otherwise(F.col("d0")).cast("string").alias(
            "cross_day"
        ),
        F.when(h1, F.lit("accept_h1"))
        .when(F.col("d0").isNotNull(), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
        emit(F.col("final_m").cast("double") / F.lit(1e6)).alias("final_llr"),
    ).orderBy("cohort")


@register(
    "q361_stream_sprt_monitor",
    sql=_SPRT_SQL,
    doc="Streaming SPRT experiment monitor under the correctness gate: "
        "events land as parquet in two waves; two checkpointed "
        "AvailableNow drains fold each micro-batch's (cohort, day) "
        "trial/conversion counts into a warehouse rollup via additive "
        "merge (refresh_additive, batch-id idempotent against "
        "redelivery), and the readback runs q358's exact SPRT decision "
        "math over the accumulated day frame — the always-valid "
        "monitor a platform actually operates: per-trigger cost is "
        "O(batch + cohorts x days), never a history rescan, and the "
        "decision is EXACTLY the batch SPRT (the oracle is q358's "
        "SQL verbatim; the readback shares q358's code).  Joins the "
        "continuous-aggregate parity family (q102 corpus stats, q138 "
        "bitmap DAU, q326 gram matrix, q339 histogram).",
    tags=("streaming", "experimentation", "warehouse", "events"),
)
def q361(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    from pathlib import Path

    from ..merge.incremental import refresh_additive
    from ..merge.warehouse import Warehouse

    root = Path(tempfile.mkdtemp(prefix="q361_sprt_"))
    land = root / "land"
    land.mkdir()
    wh = Warehouse(spark, str(root / "wh"))
    e = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")

    def land_wave(df: DataFrame, tag: str) -> None:
        wave = root / f"wave_{tag}"
        df.write.parquet(str(wave))
        for f in wave.glob("part-*.parquet"):
            shutil.copy(f, land / f"{tag}_{f.name}")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        meta = wh.write_meta("sprt_daily") or {}
        if batch_id <= meta.get("last_batch_id", -1):
            return
        if batch_df.limit(1).isEmpty():
            return
        delta = batch_df.groupBy(
            (F.col("user_id") % 2).cast("bigint").alias("cohort"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("trials"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("conv"),
        )
        refresh_additive(
            wh, "sprt_daily", delta, ["cohort", "day"],
            {"trials": "sum", "conv": "sum"},
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
    if wh.exists("sprt_daily"):
        daily = wh.read("sprt_daily").select(
            "cohort",
            "day",
            F.col("trials").cast("bigint").alias("trials"),
            F.col("conv").cast("bigint").alias("conv"),
        )
    else:
        # degenerate corpus: no event ever merged, so the rollup table
        # was never created — the SQL oracle returns an empty result
        # set on the same input, so mirror it with an empty frame
        daily = spark.createDataFrame(
            [], "cohort bigint, day date, trials bigint, conv bigint"
        )
    return _sprt_readback(spark, daily)


# ---------------------------------------------------------------------------
# q362: feature-hashing collision audit
# ---------------------------------------------------------------------------

@register(
    "q362_feature_hash_collisions",
    sql="""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    cf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE tok <> '' GROUP BY 1
    ),
    h AS (
      SELECT tok, c,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 1024
               AS bucket
      FROM cf
    ),
    bk AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             MIN(tok) AS example_term
      FROM h GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_types) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS used,
             CAST(SUM(CASE WHEN n_types >= 2 THEN n_types ELSE 0 END)
                  AS BIGINT) AS collided
      FROM bk
    )
    SELECT bk.bucket, bk.n_types, bk.n_tokens, bk.example_term,
           tot.v AS vocab_size, tot.used AS buckets_used,
           CAST(tot.collided AS DOUBLE) / CAST(tot.v AS DOUBLE)
             AS collision_rate
    FROM bk, tot
    ORDER BY bk.n_types DESC, bk.bucket
    LIMIT 10
    """,
    doc="Feature-hashing collision audit: the corpus vocabulary hashed "
        "into 1024 buckets (portable md5-prefix hash — Spark xxhash64 "
        "and DuckDB hash() differ, md5 is byte-identical), reporting "
        "the 10 most collided buckets (type count, token mass, example "
        "term) plus the corpus-level collision rate (share of types "
        "sharing a bucket) — the number that says whether a hashed "
        "feature space is big enough before training on it (Weinberger "
        "2009's hashing trick, audited).  Exact integer counts; one "
        "double division.  Physical: one corpus tokenize -> vocab "
        "rollup, bucket rollup at 1024-row grain, totals cross back — "
        "nothing above vocabulary grain ever shuffles.",
    tags=("llmdata", "text", "documents", "ml-ops"),
)
def q362(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.postings import token_rows

    d = load(spark, sf_dir, "documents")
    cf = (
        token_rows(d, text_col="text")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    h = cf.select(
        "tok",
        "c",
        (
            F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
            % 1024
        ).alias("bucket"),
    )
    bk = h.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.min("tok").alias("example_term"),
    )
    tot = bk.agg(
        F.sum("n_types").cast("bigint").alias("v"),
        F.count(F.lit(1)).cast("bigint").alias("used"),
        F.sum(F.when(F.col("n_types") >= 2, F.col("n_types")).otherwise(0))
        .cast("bigint")
        .alias("collided"),
    )
    return (
        bk.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_types",
            "n_tokens",
            "example_term",
            F.col("v").alias("vocab_size"),
            F.col("used").alias("buckets_used"),
            emit(
                F.col("collided").cast("double") / F.col("v").cast("double")
            ).alias("collision_rate"),
        )
        .orderBy(F.desc("n_types"), "bucket")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q363: small-file compaction planner
# ---------------------------------------------------------------------------

@register(
    "q363_compaction_planner",
    sql="""
    WITH f AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS bytes
      FROM documents
    ),
    packed AS (
      SELECT source, doc_id, bytes,
             (CAST(SUM(bytes) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
              - bytes) // 65536 AS bucket
      FROM f
    )
    SELECT source, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bytes,
           CAST(SUM(bytes) AS DOUBLE) / 65536.0 AS fill
    FROM packed
    GROUP BY 1, 2
    ORDER BY source, bucket
    LIMIT 50
    """,
    doc="Small-file compaction planner: documents stand in for data "
        "files (n_chars = bytes); within each source, files pack "
        "greedily in doc_id order into ~64 KiB output groups by "
        "START-OFFSET division (bucket = running-total-before div "
        "target — the deterministic one-pass packing every table "
        "maintenance service runs before an OPTIMIZE/rewrite; q53 "
        "packs token sequences with the same arithmetic).  Output: "
        "the first 50 (source, bucket) groups with file count, byte "
        "total, and fill ratio.  Exact integer cumulative sums; "
        "bucket ids from integer division.  Physical: one scan, one "
        "per-source running-sum window (sources partition the sort), "
        "one rollup at group grain.",
    tags=("warehouse", "ops", "documents", "window"),
)
def q363(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = load(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").cast("bigint").alias("bytes")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = f.select(
        "source",
        "bytes",
        F.expr(
            "(CAST(sum(bytes) OVER (PARTITION BY source ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
            " - bytes) div 65536"
        ).alias("bucket"),
    )
    return (
        packed.groupBy("source", F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("bytes").cast("bigint").alias("bytes"),
        )
        .select(
            "source",
            "bucket",
            "n_files",
            "bytes",
            emit(F.col("bytes").cast("double") / F.lit(65536.0)).alias("fill"),
        )
        .orderBy("source", "bucket")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q364: Kendall's W concordance across three part rankings, per brand
# ---------------------------------------------------------------------------

@register(
    "q364_kendall_w_concordance",
    sql="""
    WITH r AS (
      SELECT p_brand AS brand,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice, p_partkey) AS r1,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_size, p_partkey) AS r2,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_name, p_partkey) AS r3,
             COUNT(*) OVER (PARTITION BY p_brand) AS nb
      FROM part
    ),
    s AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(2 * (r1 + r2 + r3) - 3 * (nb + 1)
                           AS DECIMAL(19,0))
                      * CAST(2 * (r1 + r2 + r3) - 3 * (nb + 1)
                             AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS s4
      FROM r GROUP BY brand
    )
    SELECT brand, n,
           CASE WHEN n > 1 THEN
             CAST(s4 AS DOUBLE)
               / (3.0 * CAST(CAST(n AS DECIMAL(38,0)) * n * n - n AS DOUBLE))
           END AS w
    FROM s
    ORDER BY brand
    """,
    doc="Kendall's coefficient of concordance W across three judges "
        "(retailprice, size, name rankings of each brand's parts): "
        "W = 12 S / (m^2 (n^3 - n)) with S the squared deviation of "
        "rank sums — 'do the three orderings agree at all' before "
        "trusting any rank fusion of them (the diagnostic q252's RRF "
        "skips).  Ranks are tie-free by construction (partkey "
        "tiebreak), so no tie correction is owed; deviations are "
        "DOUBLED to stay integers (2R - 3(n+1)), squared in "
        "DECIMAL(19,0) and summed as DECIMAL(38,0) = exactly 4S, so "
        "W = S4 / (3 (n^3-n)) is one double division of exact "
        "integers (n^3 via decimal, exact at any dimension size).  "
        "Physical: three rank windows PER BRAND (the global-sort "
        "trap deliberately avoided — ranking partitions by the "
        "analysis grain), one brand rollup.",
    tags=("stats", "part", "window", "ranking"),
)
def q364(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    wb = Window.partitionBy("p_brand")
    r = p.select(
        F.col("p_brand").alias("brand"),
        F.row_number().over(wb.orderBy("p_retailprice", "p_partkey")).alias("r1"),
        F.row_number().over(wb.orderBy("p_size", "p_partkey")).alias("r2"),
        F.row_number().over(wb.orderBy("p_name", "p_partkey")).alias("r3"),
        F.count(F.lit(1)).over(wb).alias("nb"),
    )
    dev = (
        2 * (F.col("r1") + F.col("r2") + F.col("r3")) - 3 * (F.col("nb") + 1)
    ).cast("decimal(19,0)")
    s = r.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dev * dev).cast("decimal(38,0)").alias("s4"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    return s.select(
        "brand",
        "n",
        emit(
            F.when(
                F.col("n") > 1,
                F.col("s4").cast("double")
                / (
                    F.lit(3.0)
                    * (n38 * F.col("n") * F.col("n") - F.col("n")).cast("double")
                ),
            )
        ).alias("w"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# q365: effect sizes (Cohen's d / Hedges' g / Glass's delta)
# ---------------------------------------------------------------------------

@register(
    "q365_effect_sizes",
    sql="""
    WITH f AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS treat,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
      SELECT
        CAST(SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        CAST(SUM(CASE WHEN treat = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN treat = 0 THEN cents ELSE 0 END) AS BIGINT) AS s0,
        SUM(CASE WHEN treat = 1 THEN CAST(cents AS DECIMAL(38,0))
                                      * CAST(cents AS DECIMAL(38,0))
                 ELSE 0 END) AS q1,
        SUM(CASE WHEN treat = 0 THEN CAST(cents AS DECIMAL(38,0))
                                      * CAST(cents AS DECIMAL(38,0))
                 ELSE 0 END) AS q0
      FROM f
    ),
    m AS (
      SELECT n1, n0,
             CAST(s1 AS DOUBLE) / n1 AS m1,
             CAST(s0 AS DOUBLE) / n0 AS m0,
             (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1)
               AS v1,
             (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1)
               AS v0
      FROM cells WHERE n1 > 1 AND n0 > 1
    )
    SELECT n1 AS n_treat, n0 AS n_ctrl,
           (m1 - m0) / 100.0 AS mean_diff,
           CASE WHEN (n1 - 1) * v1 + (n0 - 1) * v0 > 0 THEN
             (m1 - m0) / sqrt(((n1 - 1) * v1 + (n0 - 1) * v0)
                              / (n1 + n0 - 2)) END AS cohens_d,
           CASE WHEN (n1 - 1) * v1 + (n0 - 1) * v0 > 0 THEN
             (m1 - m0) / sqrt(((n1 - 1) * v1 + (n0 - 1) * v0)
                              / (n1 + n0 - 2))
               * (1.0 - 3.0 / (4.0 * (n1 + n0) - 9.0)) END AS hedges_g,
           CASE WHEN v0 > 0 THEN (m1 - m0) / sqrt(v0) END AS glass_delta
    FROM m
    """,
    doc="Standardized effect sizes for the purchase-value treatment "
        "split: Cohen's d (pooled-sd), Hedges' g (small-sample "
        "bias-corrected, the meta-analysis standard), and Glass's "
        "delta (control-sd only, for heteroscedastic treatments) — "
        "the practical-significance numbers q162's Welch t-test "
        "doesn't report.  Sufficient statistics are exact (counts, "
        "cent sums BIGINT, squared cents in DECIMAL(38,0) — cast "
        "before squaring, the q330 discipline); each estimate is one "
        "double expression with the identical op tree both engines.  "
        "Emits zero rows when either arm has < 2 observations "
        "(variance undefined) — symmetric in both engines.  "
        "Physical: ONE conditional-aggregate fact pass (q137 shape).",
    tags=("experimentation", "events", "stats", "agg"),
)
def q365(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = load(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(
        (F.col("user_id") % 2).cast("bigint").alias("treat"),
        (F.col("value").cast(DEC) * 100).cast("bigint").alias("cents"),
    )
    cd = F.col("cents").cast("decimal(38,0)")
    cells = f.agg(
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("treat") == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("treat") == 1, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(F.col("treat") == 0, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("s0"),
        F.sum(F.when(F.col("treat") == 1, cd * cd).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("q1"),
        F.sum(F.when(F.col("treat") == 0, cd * cd).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("q0"),
    )
    m = cells.where((F.col("n1") > 1) & (F.col("n0") > 1)).select(
        "n1",
        "n0",
        (F.col("s1").cast("double") / F.col("n1")).alias("m1"),
        (F.col("s0").cast("double") / F.col("n0")).alias("m0"),
        (
            (F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n1"))
            / (F.col("n1") - 1)
        ).alias("v1"),
        (
            (F.col("q0").cast("double") - F.col("s0").cast("double") * F.col("s0") / F.col("n0"))
            / (F.col("n0") - 1)
        ).alias("v0"),
    )
    diff = F.col("m1") - F.col("m0")
    ssq = (F.col("n1") - 1) * F.col("v1") + (F.col("n0") - 1) * F.col("v0")
    pooled = F.sqrt(ssq / (F.col("n1") + F.col("n0") - 2))
    # lazy CASE: constant arms make the pooled/control variance exactly
    # zero — NULL, not an ANSI divide-by-zero (property-test-found edge)
    return m.select(
        F.col("n1").alias("n_treat"),
        F.col("n0").alias("n_ctrl"),
        emit(diff / F.lit(100.0)).alias("mean_diff"),
        emit(F.when(ssq > 0, diff / pooled)).alias("cohens_d"),
        emit(
            F.when(
                ssq > 0,
                diff
                / pooled
                * (
                    F.lit(1.0)
                    - F.lit(3.0)
                    / (F.lit(4.0) * (F.col("n1") + F.col("n0")) - F.lit(9.0))
                ),
            )
        ).alias("hedges_g"),
        emit(F.when(F.col("v0") > 0, diff / F.sqrt(F.col("v0")))).alias(
            "glass_delta"
        ),
    )


# ---------------------------------------------------------------------------
# q366: Page-Hinkley drift detection over daily revenue
# ---------------------------------------------------------------------------

@register(
    "q366_page_hinkley_drift",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(round(coalesce(o_totalprice, 0) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    rm AS (
      SELECT day, rev_c,
             CAST(round(CAST(SUM(rev_c) OVER w AS DOUBLE) * 1e6
                        / CAST(COUNT(*) OVER w AS DOUBLE)) AS BIGINT) AS rm_m
      FROM daily
      WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ),
    ph AS (
      SELECT day, rev_c,
             CAST(SUM(CAST(rev_c AS DECIMAL(19,0)) * 1000000 - rm_m)
                  OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(38,0)) AS m_t
      FROM rm
    ),
    stat AS (
      SELECT day, rev_c, m_t,
             CAST(MIN(m_t) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(38,0)) AS min_m
      FROM ph
    ),
    mx AS (
      SELECT day, m_t - min_m AS s,
             CAST(MAX(m_t - min_m) OVER () AS DECIMAL(38,0)) AS best
      FROM stat
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MIN(CASE WHEN s = best THEN day END) AS VARCHAR) AS drift_day,
           CAST(MAX(best) AS DOUBLE) / 1e8 AS ph_stat_dollars
    FROM mx
    """,
    doc="Page-Hinkley drift detection over the daily revenue series: "
        "the PH statistic PH_t = m_t - min_{s<=t} m_s with m_t the "
        "running sum of deviations from the RUNNING mean (delta = 0), "
        "reporting the day of maximal drift evidence and its "
        "magnitude — the sequential mean-shift detector (Page 1954, "
        "Hinkley 1971) that q268's CUSUM (global-mean) family "
        "complements for ONLINE monitoring, where only the running "
        "mean is available.  Per-day running means are micro-rounded "
        "to BIGINT before the deviation sum, so m_t, its running "
        "min, and the PH statistic are exact integers; the drift day "
        "is the EARLIEST argmax (explicit window-max + conditional "
        "min — max_by's tie choice would be engine-arbitrary).  "
        "Physical: one fact rollup to "
        "day grain, three cumulative windows over the calendar "
        "frame, a single-row summary.",
    tags=("timeseries", "orders", "drift", "window"),
)
def q366(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .round6b_queries import _cents

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_c"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rm = daily.select(
        "day",
        "rev_c",
        F.round(
            F.sum("rev_c").over(w).cast("double")
            * F.lit(1e6)
            / F.count(F.lit(1)).over(w).cast("double")
        )
        .cast("bigint")
        .alias("rm_m"),
    )
    # deviations accumulate in DECIMAL(38,0): daily micro-cents reach
    # ~1e17 at warehouse scale and a multi-year running sum of them
    # wraps int64 silently (the q330/q249 widening discipline)
    ph = rm.select(
        "day",
        "rev_c",
        F.sum(F.col("rev_c").cast("decimal(19,0)") * 1000000 - F.col("rm_m"))
        .over(w)
        .cast("decimal(38,0)")
        .alias("m_t"),
    )
    stat = ph.select(
        "day",
        "m_t",
        F.min("m_t").over(w).cast("decimal(38,0)").alias("min_m"),
    )
    # argmax with an explicit EARLIEST-day tie-break (max_by's tie
    # choice is engine-arbitrary): window max, then conditional min
    mx = stat.select(
        "day",
        (F.col("m_t") - F.col("min_m")).alias("s"),
        F.max(F.col("m_t") - F.col("min_m"))
        .over(Window.partitionBy())
        .cast("decimal(38,0)")
        .alias("best"),
    )
    return mx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.min(F.when(F.col("s") == F.col("best"), F.col("day")))
        .cast("string")
        .alias("drift_day"),
        emit(F.max("best").cast("double") / F.lit(1e8)).alias("ph_stat_dollars"),
    )
