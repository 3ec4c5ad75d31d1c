"""Round-10 catalog entries, fourth wing (q384-q389): distributed
model training / feature screening plus storage-planner and
ordinal-dynamics depth.

- q384 Naive Bayes langid: a multinomial NB classifier TRAINED inside
  the engine (even-id docs) and evaluated held-out (odd-id docs) —
  token-class counts are one map-side-combinable aggregate, scoring
  is a label-space-bounded fan-out, and every log term is micro-
  rounded to integers before the per-document sum (q209's exactness
  discipline turned from scoring into train+predict).
- q385 WOE/IV feature screening: weight-of-evidence / information-
  value of four candidate order features against the urgent label —
  the credit-scoring screen that complements q376's chi-square leak
  audit with a monotone-strength ranking.
- q386 zone-map skipping advisor: per-shard min/max zone maps (the
  parquet row-group statistic) replayed against five representative
  predicates — what fraction of shards a reader could skip, next to
  the exact row selectivity the skip would have to agree with.
- q387 rollup-MV advisor: exact group cardinality for six candidate
  GROUP BY sets over lineitem, with a materialize recommendation by
  integer compression-ratio threshold — the planner census behind
  incremental-MV placement (q189's maintenance gets a WHERE-to).
- q388 Bradley-Terry brand ranking: pairwise preferences mined from
  capped baskets (higher per-order spend wins), fitted with two
  minorize-maximize steps — the preference-ranking fit an RLHF data
  pipeline runs at corpus scale; all cross-row accumulation in exact
  integer micros.
- q389 permutation entropy: ordinal 3-patterns of the daily revenue
  series encoded by pure integer comparisons; the complexity score of
  the series' dynamics with an integer-coded argmax pattern.

Shared numeric discipline (see round10b/round10c): cross-row
accumulation on exact integers only (log terms micro-rounded per row
before every SUM); scalar double trees written identically in both
engines; pround only on final scalar outputs; degenerate inputs
CASE-guarded symmetrically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import emit, load, pround, register

# ---------------------------------------------------------------------------
# q384: Naive Bayes language classifier (train + held-out eval)
# ---------------------------------------------------------------------------


@register(
    "q384_nb_lang_classifier",
    sql="""
    WITH tr AS (
      SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL
    ),
    cls AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
      FROM tr GROUP BY 1
    ),
    trt AS (
      SELECT lang, tok FROM tr, unnest(t) AS u(tok) WHERE tok <> ''
    ),
    tc AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM trt GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS tc FROM trt GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM trt),
    te AS (
      SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id % 2 = 1 AND lang IS NOT NULL
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS m
      FROM te, unnest(t) AS u(tok) WHERE tok <> '' GROUP BY 1, 2
    ),
    scored AS (
      SELECT tf.doc_id, cls.lang,
             CAST(round(ln(CAST(cls.nd AS DOUBLE) / cls.n) * 1e6) AS BIGINT)
               AS prior_m,
             SUM(tf.m * CAST(round(ln(
                   (COALESCE(tc.c, 0) + CAST(1 AS DOUBLE))
                   / (COALESCE(tot.tc, 0) + v.v)) * 1e6) AS BIGINT))
               AS tok_m
      FROM tf CROSS JOIN cls
              LEFT JOIN tc ON tc.lang = cls.lang AND tc.tok = tf.tok
              LEFT JOIN tot ON tot.lang = cls.lang, v
      WHERE v.v > 0
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT doc_id, lang AS pred_lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY prior_m + tok_m DESC, lang) AS rk
      FROM scored
    )
    SELECT te.lang AS true_lang, pred.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred JOIN te ON te.doc_id = pred.doc_id
    WHERE pred.rk = 1
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Multinomial Naive Bayes langid TRAINED IN-ENGINE: even-id "
        "docs fit Laplace-smoothed token-class counts, odd-id docs "
        "are scored held-out, and the confusion matrix (true x "
        "predicted, both engines argmax with min-lang tie-break) is "
        "the output.  Every log term — prior ln(nd/N) and per-token "
        "ln((c+1)/(tot+V)) — is micro-rounded to an integer BEFORE "
        "the per-document sum (q209's discipline), so the argmax "
        "compares exact BIGINTs and the confusion matrix is engine-"
        "identical.  Scale: token-class counts and term frequencies "
        "are map-side-combinable aggregates at (lang, tok) / (doc, "
        "tok) grain; scoring fans each test token row out only by "
        "the LABEL-SPACE size (a broadcast class spine, q312's "
        "bounded fan-out), never by vocab; no all-pairs anything.  "
        "Docs whose text tokenizes to nothing are unscorable and "
        "excluded symmetrically; an empty or token-free training "
        "split emits an empty matrix in both engines.",
    tags=("documents", "llmdata", "ml-train", "join"),
)
def q384(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.postings import term_frequencies, token_rows

    docs = load(spark, sf_dir, "documents")
    labeled = docs.where(F.col("lang").isNotNull())
    train = labeled.where(F.col("doc_id") % 2 == 0)
    test = labeled.where(F.col("doc_id") % 2 == 1)

    wall = Window.partitionBy()
    cls = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
        .withColumn("n", F.sum("nd").over(wall).cast("bigint"))
    )
    # r10: ONE corpus tokenize pass — tc (lang x token counts) is the
    # pass's product, pinned; tot is its per-lang sum and v its
    # distinct-token count (identical values by construction), so the
    # explode no longer re-runs for each statistic.
    trt = token_rows(train, "lang")
    tc = (
        trt.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = tc.groupBy("lang").agg(F.sum("c").cast("bigint").alias("tc"))
    v = tc.select("tok").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )

    tf = term_frequencies(test, "doc_id").withColumnRenamed("c", "m")
    prior_m = F.round(
        F.log(F.col("nd").cast("double") / F.col("n")) * 1e6
    ).cast("bigint")
    term_m = F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1).cast("double"))
            / (F.coalesce(F.col("tc"), F.lit(0)) + F.col("v"))
        )
        * 1e6
    ).cast("bigint")
    scored = (
        tf.crossJoin(F.broadcast(cls))
        .crossJoin(F.broadcast(v))
        .where(F.col("v") > 0)
        .join(F.broadcast(tot), "lang", "left")
        .join(tc, ["lang", "tok"], "left")
        .groupBy("doc_id", "lang", prior_m.alias("prior_m"))
        .agg(F.sum(F.col("m") * term_m).alias("tok_m"))
    )
    pred = scored.select(
        "doc_id",
        F.col("lang").alias("pred_lang"),
        F.row_number()
        .over(
            Window.partitionBy("doc_id").orderBy(
                F.desc(F.col("prior_m") + F.col("tok_m")), F.asc("lang")
            )
        )
        .alias("rk"),
    ).where(F.col("rk") == 1)
    return (
        pred.join(test.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang").alias("true_lang"), "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# q385: WOE / information-value feature screening
# ---------------------------------------------------------------------------


@register(
    "q385_woe_iv_screening",
    sql="""
    WITH f AS (
      SELECT CASE WHEN o_orderpriority LIKE '1-%'
                    OR o_orderpriority LIKE '2-%' THEN 1 ELSE 0 END AS y,
             CAST(LEAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) // 5000000, 9) AS VARCHAR) AS price_band,
             o_orderstatus AS status,
             CAST(month(CAST(o_orderdate AS DATE)) AS VARCHAR) AS order_month,
             CAST(o_custkey % 8 AS VARCHAR) AS cust_bucket
      FROM orders
    ),
    m AS (
      SELECT 'price_band' AS feature, price_band AS bin, y FROM f
      UNION ALL SELECT 'status', status, y FROM f
      UNION ALL SELECT 'order_month', order_month, y FROM f
      UNION ALL SELECT 'cust_bucket', cust_bucket, y FROM f
    ),
    bins AS (
      SELECT feature, bin,
             CAST(SUM(y) AS BIGINT) AS g,
             CAST(SUM(1 - y) AS BIGINT) AS b
      FROM m GROUP BY 1, 2
    ),
    ft AS (
      SELECT feature, CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(SUM(g) AS BIGINT) AS gt, CAST(SUM(b) AS BIGINT) AS bt
      FROM bins GROUP BY 1
    ),
    terms AS (
      SELECT bins.feature, ft.nb, ft.gt, ft.bt,
             CAST(round((
               (CAST(bins.g + 1 AS DOUBLE) / (ft.gt + ft.nb)
                - CAST(bins.b + 1 AS DOUBLE) / (ft.bt + ft.nb))
               * ln((CAST(bins.g + 1 AS DOUBLE) / (ft.gt + ft.nb))
                    / (CAST(bins.b + 1 AS DOUBLE) / (ft.bt + ft.nb)))
             ) * 1e6) AS BIGINT) AS t_m
      FROM bins JOIN ft USING (feature)
    ),
    iv AS (
      SELECT feature, nb, gt, bt, CAST(SUM(t_m) AS BIGINT) AS iv_m
      FROM terms GROUP BY 1, 2, 3, 4
    )
    SELECT feature, nb AS n_bins, gt AS n_good, bt AS n_bad,
           CAST(iv_m AS DOUBLE) / 1e6 AS iv,
           CASE WHEN iv_m < 20000 THEN 'weak'
                WHEN iv_m < 100000 THEN 'medium'
                WHEN iv_m < 300000 THEN 'strong'
                ELSE 'suspicious' END AS strength
    FROM iv
    ORDER BY iv_m DESC, feature
    """,
    doc="Weight-of-evidence / information-value screening of four "
        "candidate order features (price band, status, order month, "
        "customer bucket) against the urgent-priority label — the "
        "credit-scoring feature screen that ranks predictive "
        "strength monotonically where q376's chi-square flags "
        "dependence.  Laplace-smoothed good/bad shares per bin "
        "((g+1)/(G+nb)) keep every WOE finite; each bin's "
        "(pg-pb)*ln(pg/pb) term is micro-rounded to an integer "
        "before the per-feature SUM, so IV is order-independent and "
        "engine-identical; the strength bands compare the integer "
        "micros.  Scale: ONE orders scan exploded x4 to (feature, "
        "bin) grain, two map-side-combinable aggregates, a join "
        "against the feature-grain (<=4-row) totals — no row-scale "
        "shuffle beyond the first groupBy.",
    tags=("orders", "ml-stats", "ops-advisor", "agg"),
)
def q385(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    y = F.when(
        F.col("o_orderpriority").like("1-%")
        | F.col("o_orderpriority").like("2-%"),
        1,
    ).otherwise(0)
    band = F.least(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " div 5000000"
        ),
        F.lit(9),
    ).cast("string")
    feat = F.array(
        F.struct(F.lit("price_band").alias("feature"), band.alias("bin")),
        F.struct(
            F.lit("status").alias("feature"),
            F.col("o_orderstatus").alias("bin"),
        ),
        F.struct(
            F.lit("order_month").alias("feature"),
            F.month(F.col("o_orderdate").cast("date")).cast("string").alias("bin"),
        ),
        F.struct(
            F.lit("cust_bucket").alias("feature"),
            (F.col("o_custkey") % 8).cast("string").alias("bin"),
        ),
    )
    m = o.select(y.alias("y"), F.explode(feat).alias("fb")).select(
        F.col("fb.feature").alias("feature"), F.col("fb.bin").alias("bin"), "y"
    )
    bins = m.groupBy("feature", "bin").agg(
        F.sum("y").cast("bigint").alias("g"),
        F.sum(1 - F.col("y")).cast("bigint").alias("b"),
    )
    ft = bins.groupBy("feature").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("g").cast("bigint").alias("gt"),
        F.sum("b").cast("bigint").alias("bt"),
    )
    pg = (F.col("g") + 1).cast("double") / (F.col("gt") + F.col("nb"))
    pb = (F.col("b") + 1).cast("double") / (F.col("bt") + F.col("nb"))
    t_m = F.round((pg - pb) * F.log(pg / pb) * 1e6).cast("bigint")
    iv = (
        bins.join(F.broadcast(ft), "feature")
        .select("feature", "nb", "gt", "bt", t_m.alias("t_m"))
        .groupBy("feature", "nb", "gt", "bt")
        .agg(F.sum("t_m").cast("bigint").alias("iv_m"))
    )
    return (
        iv.select(
            "feature",
            F.col("nb").alias("n_bins"),
            F.col("gt").alias("n_good"),
            F.col("bt").alias("n_bad"),
            emit(F.col("iv_m").cast("double") / 1e6).alias("iv"),
            F.when(F.col("iv_m") < 20000, "weak")
            .when(F.col("iv_m") < 100000, "medium")
            .when(F.col("iv_m") < 300000, "strong")
            .otherwise("suspicious")
            .alias("strength"),
        )
        .orderBy(F.desc("iv"), F.asc("feature"))
    )


# ---------------------------------------------------------------------------
# q386: zone-map skipping advisor
# ---------------------------------------------------------------------------

_Q386_SHARD = 4096  # orderkeys per shard — q372's storage-order shard


@register(
    "q386_zonemap_skip_advisor",
    sql=f"""
    WITH z AS (
      SELECT l_orderkey // {_Q386_SHARD} AS shard,
             MIN(l_shipdate) AS lo_ship, MAX(l_shipdate) AS hi_ship,
             MIN(l_quantity) AS lo_qty, MAX(l_quantity) AS hi_qty,
             MAX(l_extendedprice) AS hi_price,
             MAX(l_discount) AS hi_disc
      FROM lineitem GROUP BY 1
    ),
    zs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
        CAST(SUM(CASE WHEN hi_ship < TIMESTAMP '1997-01-01 00:00:00'
                      THEN 1 ELSE 0 END) AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN hi_qty < 45 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
        CAST(SUM(CASE WHEN hi_price < 50000 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
        CAST(SUM(CASE WHEN hi_disc < 0.09 THEN 1 ELSE 0 END) AS BIGINT) AS s4,
        CAST(SUM(CASE WHEN lo_qty > 5 THEN 1 ELSE 0 END) AS BIGINT) AS s5
      FROM z
    ),
    rs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                      THEN 1 ELSE 0 END) AS BIGINT) AS m1,
        CAST(SUM(CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
        CAST(SUM(CASE WHEN l_extendedprice >= 50000 THEN 1 ELSE 0 END)
             AS BIGINT) AS m3,
        CAST(SUM(CASE WHEN l_discount >= 0.09 THEN 1 ELSE 0 END) AS BIGINT)
          AS m4,
        CAST(SUM(CASE WHEN l_quantity <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS m5
      FROM lineitem
    ),
    j AS (SELECT * FROM zs, rs)
    SELECT predicate, n_shards, n_skippable,
           CAST(n_skippable * 100 AS DOUBLE) / n_shards AS skip_pct,
           n_rows, n_match,
           CAST(n_match * 100 AS DOUBLE) / n_rows AS match_pct
    FROM (
      SELECT 'shipdate_ge_1997' AS predicate, n_shards, s1 AS n_skippable,
             n_rows, m1 AS n_match FROM j
      UNION ALL SELECT 'quantity_ge_45', n_shards, s2, n_rows, m2 FROM j
      UNION ALL SELECT 'price_ge_50k', n_shards, s3, n_rows, m3 FROM j
      UNION ALL SELECT 'discount_ge_009', n_shards, s4, n_rows, m4 FROM j
      UNION ALL SELECT 'quantity_le_5', n_shards, s5, n_rows, m5 FROM j
    )
    ORDER BY predicate
    """,
    doc="Zone-map (min/max) skipping advisor: per-shard zone maps — "
        "the statistic a parquet row-group or ORC stripe footer "
        "carries — replayed against five representative predicates, "
        "reporting what fraction of shards a reader could PROVABLY "
        "skip next to the exact row selectivity.  A high-selectivity "
        "predicate with a low skip ratio is the signature of data "
        "scattered across storage order — the advisory that feeds "
        "q133's z-order re-clustering and q363's compaction "
        "planning.  Physical: the zone census is ONE map-side-"
        "combinable min/max aggregate at shard grain; the exact "
        "selectivities come from ONE conditional-aggregation scan; "
        "the two single-row summaries cross-assemble (q130's shape) "
        "and unfold to five literal rows — nothing after the two "
        "scans is row-scale.",
    tags=("lineitem", "ops-advisor", "storage", "agg"),
)
def q386(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cut = F.lit("1997-01-01 00:00:00").cast("timestamp")
    z = li.groupBy(
        F.expr(f"l_orderkey div {_Q386_SHARD}").alias("shard")
    ).agg(
        F.max("l_shipdate").alias("hi_ship"),
        F.min("l_quantity").alias("lo_qty"),
        F.max("l_quantity").alias("hi_qty"),
        F.max("l_extendedprice").alias("hi_price"),
        F.max("l_discount").alias("hi_disc"),
    )
    one = F.lit(1)
    zero = F.lit(0)
    zs = z.agg(
        F.count(one).cast("bigint").alias("n_shards"),
        F.sum(F.when(F.col("hi_ship") < cut, one).otherwise(zero))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(F.col("hi_qty") < 45, one).otherwise(zero))
        .cast("bigint")
        .alias("s2"),
        F.sum(F.when(F.col("hi_price") < 50000, one).otherwise(zero))
        .cast("bigint")
        .alias("s3"),
        F.sum(F.when(F.col("hi_disc") < 0.09, one).otherwise(zero))
        .cast("bigint")
        .alias("s4"),
        F.sum(F.when(F.col("lo_qty") > 5, one).otherwise(zero))
        .cast("bigint")
        .alias("s5"),
    )
    rs = li.agg(
        F.count(one).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("l_shipdate") >= cut, one).otherwise(zero))
        .cast("bigint")
        .alias("m1"),
        F.sum(F.when(F.col("l_quantity") >= 45, one).otherwise(zero))
        .cast("bigint")
        .alias("m2"),
        F.sum(F.when(F.col("l_extendedprice") >= 50000, one).otherwise(zero))
        .cast("bigint")
        .alias("m3"),
        F.sum(F.when(F.col("l_discount") >= 0.09, one).otherwise(zero))
        .cast("bigint")
        .alias("m4"),
        F.sum(F.when(F.col("l_quantity") <= 5, one).otherwise(zero))
        .cast("bigint")
        .alias("m5"),
    )
    j = zs.crossJoin(F.broadcast(rs))
    preds = [
        ("shipdate_ge_1997", "s1", "m1"),
        ("quantity_ge_45", "s2", "m2"),
        ("price_ge_50k", "s3", "m3"),
        ("discount_ge_009", "s4", "m4"),
        ("quantity_le_5", "s5", "m5"),
    ]
    parts = [
        j.select(
            F.lit(name).alias("predicate"),
            "n_shards",
            F.col(s).alias("n_skippable"),
            "n_rows",
            F.col(m).alias("n_match"),
        )
        for name, s, m in preds
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select(
        "predicate",
        "n_shards",
        "n_skippable",
        emit((F.col("n_skippable") * 100).cast("double") / F.col("n_shards"))
        .alias("skip_pct"),
        "n_rows",
        "n_match",
        emit((F.col("n_match") * 100).cast("double") / F.col("n_rows")).alias(
            "match_pct"
        ),
    ).orderBy("predicate")


# ---------------------------------------------------------------------------
# q387: rollup materialized-view advisor
# ---------------------------------------------------------------------------

_Q387_CANDIDATES = (
    ("flag_status", "l_returnflag, l_linestatus"),
    ("ship_month", "date_trunc('month', CAST(l_shipdate AS DATE))"),
    ("part", "l_partkey"),
    ("supplier", "l_suppkey"),
    ("part_supplier", "l_partkey, l_suppkey"),
    ("order", "l_orderkey"),
)


@register(
    "q387_rollup_mv_advisor",
    sql=f"""
    WITH rows_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem),
    c AS (
      {' UNION ALL '.join(
          f"SELECT '{name}' AS candidate, CAST(COUNT(*) AS BIGINT) AS n_groups"
          f" FROM (SELECT DISTINCT {keys} FROM lineitem)"
          for name, keys in _Q387_CANDIDATES
      )}
    )
    SELECT candidate, n_rows, n_groups,
           CAST(n_rows AS DOUBLE) / n_groups AS rows_per_group,
           (n_rows >= 100 * n_groups) AS materialize
    FROM c, rows_
    ORDER BY n_groups, candidate
    """,
    doc="Rollup materialized-view advisor: EXACT group cardinality "
        "for six candidate GROUP BY sets over lineitem, with a "
        "materialize recommendation by integer compression threshold "
        "(rows >= 100x groups — below that an MV saves less than it "
        "costs to maintain).  This is the WHERE-to census behind "
        "q189's incremental-MV maintenance: a (returnflag, "
        "linestatus) rollup compresses ~millionsfold and should "
        "materialize; an order-grain rollup compresses ~4x and "
        "should not.  Physical: each candidate is one two-phase "
        "distinct (map-side partial at key grain — never a global "
        "sort), the row total is one count crossed on as a single-"
        "row aggregate (q42's shape); exact BIGINTs throughout, the "
        "compression ratio one identical double division.",
    tags=("lineitem", "ops-advisor", "storage", "agg"),
)
def q387(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    rows_ = li.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    parts = []
    for name, keys in _Q387_CANDIDATES:
        kcols = [F.expr(k.strip()) for k in _split_keys(keys)]
        parts.append(
            li.select(*kcols)
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_groups"))
            .select(F.lit(name).alias("candidate"), "n_groups")
        )
    c = parts[0]
    for p in parts[1:]:
        c = c.unionAll(p)
    return (
        c.crossJoin(F.broadcast(rows_))
        .select(
            "candidate",
            "n_rows",
            "n_groups",
            emit(F.col("n_rows").cast("double") / F.col("n_groups")).alias(
                "rows_per_group"
            ),
            (F.col("n_rows") >= 100 * F.col("n_groups")).alias("materialize"),
        )
        .orderBy("n_groups", "candidate")
    )


def _split_keys(keys: str) -> list[str]:
    """Split a candidate key list on TOP-LEVEL commas only (the
    ship_month candidate carries a date_trunc('month', ...) call)."""
    out, depth, cur = [], 0, []
    for ch in keys:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


# ---------------------------------------------------------------------------
# q388: Bradley-Terry brand preference ranking
# ---------------------------------------------------------------------------


@register(
    "q388_bradley_terry_brands",
    sql="""
    WITH ob AS (
      SELECT l.l_orderkey AS ord, p.p_brand AS brand,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    bs AS (SELECT ord, COUNT(*) AS sz FROM ob GROUP BY 1),
    eb AS (
      SELECT ob.ord, ob.brand, ob.cents FROM ob JOIN bs USING (ord)
      WHERE bs.sz BETWEEN 2 AND 16
    ),
    pw AS (
      SELECT a.brand AS ba, b.brand AS bb,
             CAST(SUM(CASE WHEN a.cents <> b.cents THEN 1 ELSE 0 END)
                  AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a.cents > b.cents THEN 1 ELSE 0 END)
                  AS BIGINT) AS wa
      FROM eb a JOIN eb b ON a.ord = b.ord AND a.brand < b.brand
      GROUP BY 1, 2
    ),
    sym AS (
      SELECT ba AS bi, bb AS bj, n, wa AS w FROM pw
      UNION ALL
      SELECT bb, ba, n, n - wa FROM pw
    ),
    st AS (
      SELECT bi AS brand, CAST(SUM(n) AS BIGINT) AS g,
             CAST(SUM(w) AS BIGINT) AS w
      FROM sym GROUP BY 1
    ),
    p1 AS (
      SELECT brand, g, w,
             CAST(2 * w + 1 AS DOUBLE) / (g + 1) AS p
      FROM st
    ),
    d2 AS (
      SELECT sym.bi AS brand,
             CAST(SUM(CAST(round(sym.n / (pi.p + pj.p) * 1e6) AS BIGINT))
                  AS BIGINT) AS dm
      FROM sym JOIN p1 pi ON pi.brand = sym.bi
               JOIN p1 pj ON pj.brand = sym.bj
      GROUP BY 1
    ),
    p2 AS (
      SELECT p1.brand, p1.g, p1.w,
             CAST(round(
               CAST((2 * p1.w + 1) * 1000000 AS DOUBLE)
               / (2 * (d2.dm + CAST(round(1e6 / (p1.p + 1)) AS BIGINT)))
               * 1e6) AS BIGINT) AS p2m
      FROM p1 JOIN d2 USING (brand)
    ),
    nz AS (
      SELECT brand, g, w, p2m,
             CAST(SUM(p2m) OVER () AS BIGINT) AS totm
      FROM p2
    )
    SELECT CAST(row_number() OVER (ORDER BY p2m DESC, brand) AS BIGINT) AS rk,
           brand, g AS n_games, w AS n_wins,
           CAST(p2m AS DOUBLE) / totm AS strength
    FROM nz
    ORDER BY rk
    """,
    doc="Bradley-Terry preference ranking over part brands — the "
        "pairwise-comparison fit an RLHF preference pipeline runs, "
        "here on preferences mined in-engine: within each capped "
        "basket (2..16 distinct brands/order, q328's whale-immunity "
        "contract), the brand with higher per-order spend wins; ties "
        "are not games.  Two minorize-maximize steps from the "
        "uniform start: step 1 is the EXACT integer ratio "
        "(2W+1)/(G+1) (a half-win regularizer against a unit-"
        "strength virtual opponent keeps every strength finite and "
        "positive); step 2's denominator terms n_ij/(p_i+p_j) are "
        "micro-rounded per PAIR before the integer SUM, so the fit "
        "is order-independent and engine-identical.  Scale: pair "
        "mining is bounded at C(16,2) per order; everything after "
        "the (order, brand) aggregate runs at brand-pair grain "
        "(|brands|^2 <= 625 rows — dimension-bounded, where the MM "
        "iterations are driver-cheap by construction).",
    tags=("lineitem", "part", "ml-train", "ranking"),
)
def q388(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy(F.col("l_orderkey").alias("ord"),
                 F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    # capped-basket contract (baskets.py): in-row pair expansion from
    # the sorted per-order array — C(16,2) bound per order, no self-join
    baskets = (
        ob.groupBy("ord")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("brand", "cents"))
            ).alias("items")
        )
        .where((F.size("items") >= 2) & (F.size("items") <= 16))
    )
    items = F.col("items")
    pairs = F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + F.lit(2), F.size(items)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pw = (
        baskets.select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.a.brand").alias("ba"),
            F.col("p.b.brand").alias("bb"),
            F.col("p.a.cents").alias("ca"),
            F.col("p.b.cents").alias("cb"),
        )
        .groupBy("ba", "bb")
        .agg(
            F.sum(F.when(F.col("ca") != F.col("cb"), 1).otherwise(0))
            .cast("bigint")
            .alias("n"),
            F.sum(F.when(F.col("ca") > F.col("cb"), 1).otherwise(0))
            .cast("bigint")
            .alias("wa"),
        )
        # brand-pair grain (<= |brands|^2 rows): localCheckpoint so the
        # sym/st/d2/p2 chain — which references this frame ~8 times —
        # mines the corpus ONCE instead of once per reference (the
        # PERSIST_PRONE contract; the 10x scale stress reads 12.3x
        # without this pin, 2-3x with it)
        .localCheckpoint(eager=True)
    )
    sym = pw.select(
        F.col("ba").alias("bi"), F.col("bb").alias("bj"), "n",
        F.col("wa").alias("w"),
    ).unionAll(
        pw.select(
            F.col("bb").alias("bi"), F.col("ba").alias("bj"), "n",
            (F.col("n") - F.col("wa")).alias("w"),
        )
    )
    st = sym.groupBy(F.col("bi").alias("brand")).agg(
        F.sum("n").cast("bigint").alias("g"),
        F.sum("w").cast("bigint").alias("w"),
    )
    p1 = st.select(
        "brand", "g", "w",
        ((2 * F.col("w") + 1).cast("double") / (F.col("g") + 1)).alias("p"),
    )
    pi = p1.select(F.col("brand").alias("bi"), F.col("p").alias("p_i"))
    pj = p1.select(F.col("brand").alias("bj"), F.col("p").alias("p_j"))
    d2 = (
        sym.join(F.broadcast(pi), "bi")
        .join(F.broadcast(pj), "bj")
        .groupBy(F.col("bi").alias("brand"))
        .agg(
            F.sum(
                F.round(F.col("n") / (F.col("p_i") + F.col("p_j")) * 1e6)
                .cast("bigint")
            )
            .cast("bigint")
            .alias("dm")
        )
    )
    virt = F.round(1e6 / (F.col("p") + 1)).cast("bigint")
    p2 = p1.join(d2, "brand").select(
        "brand", "g", "w",
        F.round(
            ((2 * F.col("w") + 1) * 1000000).cast("double")
            / (2 * (F.col("dm") + virt))
            * 1e6
        )
        .cast("bigint")
        .alias("p2m"),
    )
    wall = Window.partitionBy()
    nz = p2.withColumn("totm", F.sum("p2m").over(wall).cast("bigint"))
    return nz.select(
        F.row_number()
        .over(Window.orderBy(F.desc("p2m"), F.asc("brand")))
        .cast("bigint")
        .alias("rk"),
        "brand",
        F.col("g").alias("n_games"),
        F.col("w").alias("n_wins"),
        emit(F.col("p2m").cast("double") / F.col("totm")).alias("strength"),
    ).orderBy("rk")


# ---------------------------------------------------------------------------
# q389: permutation entropy of daily revenue
# ---------------------------------------------------------------------------

_LN6 = "1.791759469228055"  # ln(6) as a shared literal — engine log()
# of the constant is not consulted, so no 1-ulp libm-vs-Java hazard


@register(
    "q389_permutation_entropy",
    sql=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT lag(rev_c, 2) OVER (ORDER BY day) AS a,
             lag(rev_c, 1) OVER (ORDER BY day) AS b,
             rev_c AS c
      FROM daily
    ),
    pat AS (
      SELECT CAST(4 * CAST(a <= b AS BIGINT) + 2 * CAST(b <= c AS BIGINT)
                  + CAST(a <= c AS BIGINT) AS BIGINT) AS code,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lagged WHERE a IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS nw FROM pat)
    SELECT COALESCE(tot.nw, 0) AS n_windows,
           CAST(COUNT(pat.code) AS BIGINT) AS n_patterns,
           CASE WHEN tot.nw > 0 THEN
             CAST(SUM(CAST(round(-(CAST(pat.cnt AS DOUBLE) / tot.nw)
                                 * ln(CAST(pat.cnt AS DOUBLE) / tot.nw)
                                 * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           END AS entropy,
           CASE WHEN tot.nw > 0 THEN
             CAST(CAST(round(
               CAST(SUM(CAST(round(-(CAST(pat.cnt AS DOUBLE) / tot.nw)
                                   * ln(CAST(pat.cnt AS DOUBLE) / tot.nw)
                                   * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
               / {_LN6} * 1e6) AS BIGINT) AS DOUBLE) / 1e6
           END AS entropy_norm,
           CASE WHEN tot.nw > 0
                THEN 7 - CAST(MAX(pat.cnt * 8 + (7 - pat.code)) AS BIGINT) % 8
           END AS top_pattern
    FROM tot LEFT JOIN pat ON TRUE
    GROUP BY tot.nw
    """,
    doc="Permutation entropy (Bandt-Pompe) of the daily-revenue "
        "series: ordinal 3-patterns over consecutive observed days, "
        "encoded 4*(a<=b) + 2*(b<=c) + (a<=c) — PURE INTEGER "
        "comparisons on exact day-grain cents, so the pattern "
        "distribution is engine-identical by construction; the "
        "entropy's -p*ln(p) terms are micro-rounded per pattern "
        "(<= 6 rows) before the SUM, and the argmax pattern is an "
        "integer-packed MAX (cnt*8 + (7-code) — no max_by tie "
        "ambiguity).  Low entropy = predictable dynamics, high = "
        "noise; the complexity score a forecasting pipeline gates "
        "on before fitting (q325's backtest gets a should-we).  "
        "Physical: one shuffle to day grain, lag windows over the "
        "tiny calendar spine, one <=6-row aggregate.",
    tags=("orders", "timeseries", "stats", "window"),
)
def q389(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(cents).cast("bigint").alias("rev_c")
    )
    wday = Window.orderBy("day")
    lagged = daily.select(
        F.lag("rev_c", 2).over(wday).alias("a"),
        F.lag("rev_c", 1).over(wday).alias("b"),
        F.col("rev_c").alias("c"),
    ).where(F.col("a").isNotNull())
    code = (
        4 * (F.col("a") <= F.col("b")).cast("bigint")
        + 2 * (F.col("b") <= F.col("c")).cast("bigint")
        + (F.col("a") <= F.col("c")).cast("bigint")
    )
    pat = lagged.groupBy(code.alias("code")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wall = Window.partitionBy()
    withnw = pat.withColumn("nw", F.sum("cnt").over(wall).cast("bigint"))
    p = F.col("cnt").cast("double") / F.col("nw")
    term_m = F.round(-p * F.log(p) * 1e6).cast("bigint")
    agg = withnw.agg(
        F.max("nw").alias("nw"),
        F.count("code").cast("bigint").alias("n_patterns"),
        F.sum(term_m).cast("bigint").alias("h_m"),
        F.max(F.col("cnt") * 8 + (7 - F.col("code"))).cast("bigint").alias("pk"),
    )
    h = F.col("h_m").cast("double") / 1e6
    return agg.select(
        F.coalesce(F.col("nw"), F.lit(0)).cast("bigint").alias("n_windows"),
        "n_patterns",
        F.when(F.col("nw") > 0, emit(h)).alias("entropy"),
        F.when(F.col("nw") > 0, pround(h / float(_LN6), 6)).alias(
            "entropy_norm"
        ),
        F.when(F.col("nw") > 0, 7 - F.col("pk") % 8)
        .cast("bigint")
        .alias("top_pattern"),
    )
