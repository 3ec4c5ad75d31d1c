"""Round-10 catalog entries, third wing (q378-q383): planner/warehouse
advisors plus classifier-eval and changepoint depth.

- q378 join-size estimator: exact |A JOIN B| prediction per candidate
  join from key-grain count histograms (sum over keys of cntA*cntB),
  with broadcast-vs-shuffle and hot-key advisories — the cardinality
  census a cost-based join planner runs before committing a plan.
- q379 order-amount reconciliation: per-order lineitem totals vs the
  order header amount, bucketed into exact / within-1% / over / under
  / missing-lines — the warehouse cross-field consistency audit.
- q380 repeated-order audit: same-customer same-amount order groups
  (exact duplicate-payment candidates) found at (custkey, cents)
  GRAIN — pair counts come from C(cnt,2) on group sizes, so there is
  no self-join to go quadratic on a whale.
- q381 Matthews correlation (MCC) for the parity langid coder vs the
  en/zh label, with precision/recall/F1 — the single-number
  imbalance-robust classifier score q318's kappa/F1 panel lacks.
- q382 Cochran-Armitage trend test: is urgent-priority share
  monotone in the price band?  Integer score weights, exact integer
  sufficient statistics, one conditional-aggregation pass.
- q383 binary-segmentation changepoint: the day split of the daily
  revenue series that maximizes the between-segment SSE reduction,
  from cumulative integer sums over the calendar-bounded day spine.

Shared numeric discipline (see round10b): cross-row accumulation on
exact integers only; scalar double expression trees written
identically in both engines; pround for fractional outputs; zero
denominators CASE-guarded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import emit, load, pround, register

# ---------------------------------------------------------------------------
# q378: join-size estimator (cost-based-planner census)
# ---------------------------------------------------------------------------

_Q378_BCAST_LIMIT = 100_000  # dim rows above which broadcast is off the table


def _q378_branch_sql(name: str, fact: str, fkey: str, dim: str, dkey: str) -> str:
    return f"""
      SELECT '{name}' AS join_name,
             CAST((SELECT COUNT(*) FROM {fact}) AS BIGINT) AS fact_rows,
             CAST((SELECT COUNT(*) FROM {dim}) AS BIGINT) AS dim_rows,
             CAST(SUM(f.cnt * d.cnt) AS BIGINT) AS est_join_rows,
             CAST(MAX(f.cnt) AS BIGINT) AS max_key_rows
      FROM (SELECT {fkey} AS k, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM {fact} GROUP BY 1) f
      JOIN (SELECT {dkey} AS k, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM {dim} GROUP BY 1) d ON d.k = f.k"""


_Q378_JOINS = (
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
)


@register(
    "q378_join_size_estimator",
    sql=f"""
    SELECT join_name, fact_rows, dim_rows, est_join_rows, max_key_rows,
           (max_key_rows * 20 > fact_rows) AS hot_key,
           CASE WHEN dim_rows <= {_Q378_BCAST_LIMIT} THEN 'broadcast'
                ELSE 'shuffle' END AS strategy
    FROM ({' UNION ALL '.join(_q378_branch_sql(*j) for j in _Q378_JOINS)})
    ORDER BY join_name
    """,
    doc="Cost-based-planner census: for each candidate star join, the "
        "EXACT join output size from key-grain count histograms — "
        "|A JOIN B| = sum over matching keys of cntA*cntB — plus the "
        "max per-key fact count (hot-key advisory, >5% of the fact in "
        "one key) and the broadcast-vs-shuffle recommendation by dim "
        "size.  This is the pre-flight a 100 TB join planner runs: "
        "the key histograms are one map-side-combinable aggregate per "
        "table (key-grain, never row-grain), the histogram join is "
        "equi-keyed, and every statistic is an exact BIGINT — no "
        "sampling error to second-guess.  The same census feeds "
        "q351's salting advisory and q112's salted-join remedy.",
    tags=("lineitem", "orders", "ops-advisor", "join"),
)
def q378(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for name, fact, fkey, dim, dkey in _Q378_JOINS:
        fdf = load(spark, sf_dir, fact)
        ddf = load(spark, sf_dir, dim)
        fcnt = fdf.groupBy(F.col(fkey).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        dcnt = ddf.groupBy(F.col(dkey).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        joined = fcnt.alias("f").join(dcnt.alias("d"), "k").agg(
            F.sum(F.col("f.cnt") * F.col("d.cnt")).cast("bigint").alias(
                "est_join_rows"
            ),
            F.max(F.col("f.cnt")).cast("bigint").alias("max_key_rows"),
        )
        ftot = fdf.agg(F.count(F.lit(1)).cast("bigint").alias("fact_rows"))
        dtot = ddf.agg(F.count(F.lit(1)).cast("bigint").alias("dim_rows"))
        parts.append(
            joined.crossJoin(F.broadcast(ftot))
            .crossJoin(F.broadcast(dtot))
            .select(
                F.lit(name).alias("join_name"),
                "fact_rows",
                "dim_rows",
                "est_join_rows",
                "max_key_rows",
                (F.col("max_key_rows") * 20 > F.col("fact_rows")).alias(
                    "hot_key"
                ),
                F.when(
                    F.col("dim_rows") <= _Q378_BCAST_LIMIT, "broadcast"
                )
                .otherwise("shuffle")
                .alias("strategy"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("join_name")


# ---------------------------------------------------------------------------
# q379: order-amount reconciliation (cross-field consistency audit)
# ---------------------------------------------------------------------------


@register(
    "q379_order_amount_reconciliation",
    sql="""
    WITH la AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 100) AS BIGINT))
                  AS BIGINT) AS line_c
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS head_c,
             la.line_c
      FROM orders o LEFT JOIN la ON la.l_orderkey = o.o_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN line_c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing_lines,
           CAST(SUM(CASE WHEN line_c = head_c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(SUM(CASE WHEN line_c IS NOT NULL AND line_c <> head_c
                          AND abs(line_c - head_c) * 100 <= head_c
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
           CAST(SUM(CASE WHEN line_c IS NOT NULL AND line_c > head_c
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
           CAST(SUM(CASE WHEN line_c IS NOT NULL AND line_c < head_c
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_under,
           CAST(SUM(CASE WHEN line_c IS NOT NULL
                         THEN abs(line_c - head_c) ELSE 0 END) AS DOUBLE)
             / 100 AS total_abs_gap
    FROM j
    """,
    doc="Warehouse cross-field consistency audit: reconcile each order "
        "header amount against the sum of its line amounts "
        "(extendedprice * (1-discount) * (1+tax), rounded to cents "
        "per line with ONE identical double expression, then summed "
        "as exact BIGINTs), and bucket the result — exact match, "
        "within 1% (integer comparison abs(diff)*100 <= header), "
        "over, under, and header-without-lines.  The reference's "
        "staging->fact integrity concern (SURVEY 2.4 J3/M2) "
        "generalized to amounts.  Physical: one lineitem aggregate at "
        "order grain (map-side combinable), one LEFT equi-join to the "
        "header scan, one conditional-aggregation pass — two "
        "shuffles total at any scale, both on the join key.",
    tags=("orders", "lineitem", "quality", "warehouse"),
)
def q379(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    la = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("line_c")
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("head_c"),
    )
    j = o.join(la, o.o_orderkey == la.l_orderkey, "left")
    lc, hc = F.col("line_c"), F.col("head_c")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(lc.isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing_lines"),
        F.sum(F.when(lc == hc, 1).otherwise(0)).cast("bigint").alias("n_exact"),
        F.sum(
            F.when(
                lc.isNotNull() & (lc != hc) & (F.abs(lc - hc) * 100 <= hc),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_within_1pct"),
        F.sum(F.when(lc.isNotNull() & (lc > hc), 1).otherwise(0))
        .cast("bigint")
        .alias("n_over"),
        F.sum(F.when(lc.isNotNull() & (lc < hc), 1).otherwise(0))
        .cast("bigint")
        .alias("n_under"),
        emit(
            F.sum(F.when(lc.isNotNull(), F.abs(lc - hc)).otherwise(0)).cast(
                "double"
            )
            / 100
        ).alias("total_abs_gap"),
    )


# ---------------------------------------------------------------------------
# q380: repeated-order audit (duplicate-payment candidates)
# ---------------------------------------------------------------------------


_Q380_BAND = 100_000  # blocking-key band width in cents ($1000)


@register(
    "q380_repeated_order_audit",
    sql=f"""
    WITH g AS (
      SELECT o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // {_Q380_BAND} AS band,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                            CAST(MAX(o_orderdate) AS DATE)) AS BIGINT)
               AS day_span
      FROM orders GROUP BY 1, 2
      HAVING COUNT(*) > 1
    )
    SELECT o_custkey AS custkey,
           CAST(band * {_Q380_BAND} AS DOUBLE) / 100 AS band_lo,
           cnt AS n_orders,
           cnt * (cnt - 1) // 2 AS n_pairs,
           day_span,
           (day_span <= 7) AS tight_window
    FROM g
    ORDER BY n_pairs DESC, day_span ASC, custkey, band_lo
    LIMIT 20
    """,
    doc="Duplicate-payment candidate audit: orders with the SAME "
        "customer in the SAME $1000 amount band are grouped at "
        "(custkey, band) grain — the standard blocking key a "
        "record-linkage pass uses before expensive pairwise "
        "comparison (q176's shape); each group reports its order "
        "count, implied pair count C(cnt,2), and the day span between "
        "its first and last order (a span <= 7 days flags the classic "
        "double-submit).  Deliberately NOT a self-join: pair counts "
        "come from the group SIZE, so a whale (customer, band) group "
        "costs one aggregate row, never a quadratic pair blow-up — "
        "the q328/q356 capped-basket lesson applied to fraud audit.  "
        "One shuffle (the groupBy), top-20 by deterministic "
        "(pairs, span, key) order.",
    tags=("orders", "quality", "ops-advisor"),
)
def q380(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    band = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        f" div {_Q380_BAND}"
    )
    g = (
        o.groupBy("o_custkey", band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.datediff(
                F.to_date(F.max("o_orderdate")), F.to_date(F.min("o_orderdate"))
            )
            .cast("bigint")
            .alias("day_span"),
        )
        .where(F.col("cnt") > 1)
    )
    return (
        g.select(
            F.col("o_custkey").alias("custkey"),
            emit((F.col("band") * _Q380_BAND).cast("double") / 100).alias(
                "band_lo"
            ),
            F.col("cnt").alias("n_orders"),
            F.expr("cnt * (cnt - 1) div 2").alias("n_pairs"),
            "day_span",
            (F.col("day_span") <= 7).alias("tight_window"),
        )
        .orderBy(
            F.desc("n_pairs"),
            F.asc("day_span"),
            F.asc("custkey"),
            F.asc("band_lo"),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q381: Matthews correlation for the parity langid coder
# ---------------------------------------------------------------------------


@register(
    "q381_langid_mcc",
    sql="""
    WITH cells AS (
      SELECT
        CAST(SUM(CASE WHEN n_chars % 2 = 0 AND lang = 'en'
                      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN n_chars % 2 = 0
                       AND (lang IS NULL OR lang <> 'en')
                      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN n_chars % 2 <> 0 AND lang = 'en'
                      THEN 1 ELSE 0 END) AS BIGINT) AS fn_,
        CAST(SUM(CASE WHEN n_chars % 2 <> 0
                       AND (lang IS NULL OR lang <> 'en')
                      THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM documents
    )
    SELECT tp, fp, fn_ AS fn, tn,
      CASE WHEN tp + fp > 0 THEN
        CAST(CAST(round(CAST(tp AS DOUBLE) / (tp + fp) * 1e6) AS BIGINT)
             AS DOUBLE) / 1e6 END AS precision_,
      CASE WHEN tp + fn_ > 0 THEN
        CAST(CAST(round(CAST(tp AS DOUBLE) / (tp + fn_) * 1e6) AS BIGINT)
             AS DOUBLE) / 1e6 END AS recall_,
      CASE WHEN 2 * tp + fp + fn_ > 0 THEN
        CAST(CAST(round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn_) * 1e6)
                  AS BIGINT) AS DOUBLE) / 1e6 END AS f1,
      CASE WHEN (tp + fp) > 0 AND (tp + fn_) > 0
            AND (tn + fp) > 0 AND (tn + fn_) > 0 THEN
        CAST(CAST(round(
          CAST(tp * tn - fp * fn_ AS DOUBLE)
          / sqrt(CAST(CAST(tp + fp AS HUGEINT) * CAST(tp + fn_ AS HUGEINT)
                      * CAST(tn + fp AS HUGEINT) * CAST(tn + fn_ AS HUGEINT)
                      AS DOUBLE)) * 1e6) AS BIGINT) AS DOUBLE) / 1e6
      END AS mcc
    FROM cells
    """,
    doc="Matthews correlation coefficient for the parity langid coder "
        "(prediction: even n_chars => 'en') against the en label — "
        "the single-number classifier score that stays honest under "
        "class imbalance, completing q318's kappa/F1 panel.  The four "
        "confusion cells are exact integers from ONE conditional-"
        "aggregate scan (NULL lang lands in the negative label in "
        "both engines — the q359 symmetry lesson); MCC's numerator is "
        "an exact integer, the denominator a sqrt of an exact "
        "HUGEINT/DECIMAL(38,0) product cast once to double, so the "
        "score is engine-identical.  Physical: one document scan, "
        "zero joins.",
    tags=("documents", "ml-stats", "agg"),
)
def q381(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pred = F.col("n_chars") % 2 == 0
    truth = F.col("lang") == "en"
    neg = F.col("lang").isNull() | (F.col("lang") != "en")
    cells = d.agg(
        F.sum(F.when(pred & truth, 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(pred & neg, 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(~pred & truth, 1).otherwise(0)).cast("bigint").alias("fn"),
        F.sum(F.when(~pred & neg, 1).otherwise(0)).cast("bigint").alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    den = F.sqrt(
        F.expr(
            "CAST(CAST(tp + fp AS DECIMAL(38,0)) * CAST(tp + fn AS DECIMAL(38,0))"
            " * CAST(tn + fp AS DECIMAL(38,0)) * CAST(tn + fn AS DECIMAL(38,0))"
            " AS DOUBLE)"
        )
    )
    return cells.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(tp + fp > 0, pround(tp.cast("double") / (tp + fp), 6)).alias(
            "precision_"
        ),
        F.when(tp + fn > 0, pround(tp.cast("double") / (tp + fn), 6)).alias(
            "recall_"
        ),
        F.when(
            2 * tp + fp + fn > 0,
            pround((2 * tp).cast("double") / (2 * tp + fp + fn), 6),
        ).alias("f1"),
        F.when(
            (tp + fp > 0) & (tp + fn > 0) & (tn + fp > 0) & (tn + fn > 0),
            pround((tp * tn - fp * fn).cast("double") / den, 6),
        ).alias("mcc"),
    )


# ---------------------------------------------------------------------------
# q382: Cochran-Armitage trend test (urgent share vs price band)
# ---------------------------------------------------------------------------


@register(
    "q382_cochran_armitage_trend",
    sql="""
    WITH f AS (
      SELECT LEAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   // 5000000, 9) AS w,
             CASE WHEN o_orderpriority LIKE '1-%'
                    OR o_orderpriority LIKE '2-%'
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS r,
             CAST(SUM(w * y) AS BIGINT) AS swr,
             CAST(SUM(w) AS BIGINT) AS sw,
             CAST(SUM(w * w) AS BIGINT) AS sww
      FROM f
    )
    SELECT n, r, swr, sw, sww,
      CASE WHEN r > 0 AND r < n
            AND CAST(n AS HUGEINT) * CAST(sww AS HUGEINT)
                - CAST(sw AS HUGEINT) * CAST(sw AS HUGEINT) > 0 THEN
        CAST(CAST(round(
          (CAST(CAST(n AS HUGEINT) * CAST(swr AS HUGEINT)
                - CAST(r AS HUGEINT) * CAST(sw AS HUGEINT) AS DOUBLE)
           * CAST(CAST(n AS HUGEINT) * CAST(swr AS HUGEINT)
                  - CAST(r AS HUGEINT) * CAST(sw AS HUGEINT) AS DOUBLE)
           * n)
          / (CAST(r AS DOUBLE) * (n - r)
             * CAST(CAST(n AS HUGEINT) * CAST(sww AS HUGEINT)
                    - CAST(sw AS HUGEINT) * CAST(sw AS HUGEINT) AS DOUBLE))
          * 1e6) AS BIGINT) AS DOUBLE) / 1e6
      END AS chi2_trend,
      CASE WHEN r > 0 AND r < n
            AND CAST(n AS HUGEINT) * CAST(sww AS HUGEINT)
                - CAST(sw AS HUGEINT) * CAST(sw AS HUGEINT) > 0 THEN
        (CAST(n AS HUGEINT) * CAST(swr AS HUGEINT)
         > CAST(r AS HUGEINT) * CAST(sw AS HUGEINT))
      END AS trend_up
    FROM s
    """,
    doc="Cochran-Armitage trend test: is the urgent-priority share "
        "monotone across ordered price bands (band index = integer "
        "score weight)?  chi2_trend = n*(n*Swr - r*Sw)^2 / "
        "(r*(n-r)*(n*Sww - Sw^2)) — every sufficient statistic an "
        "exact BIGINT from ONE conditional-aggregation pass, the "
        "products lifted to HUGEINT/DECIMAL(38,0) before squaring "
        "(the q330 lesson), the final ratio one identical double "
        "tree.  trend_up reports the direction as a pure integer "
        "comparison.  Degenerate pools (all-urgent, no-urgent, "
        "single band) emit NULL in both engines.  Physical: one "
        "orders scan, zero joins, zero windows.",
    tags=("orders", "stats", "agg"),
)
def q382(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = F.least(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " div 5000000"
        ),
        F.lit(9),
    )
    y = (
        F.when(
            F.col("o_orderpriority").like("1-%")
            | F.col("o_orderpriority").like("2-%"),
            1,
        ).otherwise(0)
    )
    s = o.select(w.alias("w"), y.alias("y")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("r"),
        F.sum(F.col("w") * F.col("y")).cast("bigint").alias("swr"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("sww"),
    )
    num_d = F.expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * CAST(swr AS DECIMAL(38,0))"
        " - CAST(r AS DECIMAL(38,0)) * CAST(sw AS DECIMAL(38,0)) AS DOUBLE)"
    )
    den_dec = F.expr(
        "CAST(n AS DECIMAL(38,0)) * CAST(sww AS DECIMAL(38,0))"
        " - CAST(sw AS DECIMAL(38,0)) * CAST(sw AS DECIMAL(38,0))"
    )
    ok = (
        (F.col("r") > 0)
        & (F.col("r") < F.col("n"))
        & (den_dec > 0)
    )
    chi2 = (
        num_d
        * num_d
        * F.col("n")
        / (
            F.col("r").cast("double")
            * (F.col("n") - F.col("r"))
            * den_dec.cast("double")
        )
    )
    up = F.expr(
        "CAST(n AS DECIMAL(38,0)) * CAST(swr AS DECIMAL(38,0))"
        " > CAST(r AS DECIMAL(38,0)) * CAST(sw AS DECIMAL(38,0))"
    )
    return s.select(
        "n",
        "r",
        "swr",
        "sw",
        "sww",
        F.when(ok, pround(chi2, 6)).alias("chi2_trend"),
        F.when(ok, up).alias("trend_up"),
    )


# ---------------------------------------------------------------------------
# q383: binary-segmentation changepoint on daily revenue
# ---------------------------------------------------------------------------


@register(
    "q383_binseg_changepoint",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT day, rev_c,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(SUM(rev_c) OVER (ORDER BY day) AS BIGINT) AS cs,
             CAST(COUNT(*) OVER () AS BIGINT) AS nd,
             CAST(SUM(rev_c) OVER () AS BIGINT) AS st
      FROM daily
    ),
    scored AS (
      SELECT day, i, nd, cs, st,
             CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / i
               + CAST(st - cs AS DOUBLE) * CAST(st - cs AS DOUBLE) / (nd - i)
               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nd AS gain
      FROM cum WHERE i < nd
    ),
    best AS (
      SELECT day, i, nd, cs, st, gain,
             row_number() OVER (ORDER BY gain DESC, day) AS rk
      FROM scored
    )
    SELECT CAST(day AS VARCHAR) AS split_day, nd AS n_days, i AS n_days_left,
           CAST(CAST(round(gain / 10000 * 1e4) AS BIGINT) AS DOUBLE) / 1e4
             AS sse_reduction,
           CAST(CAST(round(CAST(cs AS DOUBLE) / (100.0 * i) * 1e4) AS BIGINT)
                AS DOUBLE) / 1e4 AS mean_left,
           CAST(CAST(round(CAST(st - cs AS DOUBLE) / (100.0 * (nd - i)) * 1e4)
                     AS BIGINT) AS DOUBLE) / 1e4 AS mean_right
    FROM best WHERE rk = 1
    """,
    doc="Binary-segmentation changepoint: the single day split of the "
        "daily-revenue series that maximizes the between-segment SSE "
        "reduction gain(i) = CS_i^2/i + (S-CS_i)^2/(n-i) - S^2/n "
        "(equivalently the variance-reduction objective of CART / "
        "binary segmentation; level-shift detection for a revenue "
        "monitor).  Day-grain totals are exact integer cents; the "
        "cumulative sums come from one window over the "
        "calendar-bounded day spine; the gain is one identical double "
        "expression per spine row (no cross-row float accumulation), "
        "argmax tie-broken by earliest day.  Emits NULL-free single "
        "row whenever >= 2 days exist (i < nd guard).  sse_reduction "
        "is reported in dollars^2 (cents^2 / 1e4).  Physical: one "
        "shuffle to day grain, windows over the tiny spine.",
    tags=("orders", "timeseries", "changepoint", "window"),
)
def q383(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(cents).cast("bigint").alias("rev_c")
    )
    wday = Window.orderBy("day")
    wall = Window.partitionBy()
    cum = daily.select(
        "day",
        F.row_number().over(wday).cast("bigint").alias("i"),
        F.sum("rev_c").over(wday.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cs"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("nd"),
        F.sum("rev_c").over(wall).cast("bigint").alias("st"),
    )
    cs, st, i, nd = F.col("cs"), F.col("st"), F.col("i"), F.col("nd")
    gain = (
        cs.cast("double") * cs.cast("double") / i
        + (st - cs).cast("double") * (st - cs).cast("double") / (nd - i)
        - st.cast("double") * st.cast("double") / nd
    )
    scored = cum.where(i < nd).select(
        "day", "i", "nd", "cs", "st", gain.alias("gain")
    )
    best = scored.select(
        "*",
        F.row_number().over(Window.orderBy(F.desc("gain"), F.asc("day"))).alias(
            "rk"
        ),
    ).where(F.col("rk") == 1)
    # split_day emits as the ISO string: a DATE travels back as
    # datetime.date from Spark but datetime64 from DuckDB's pandas
    # bridge, so the gate would hash-mismatch on representation
    return best.select(
        F.col("day").cast("string").alias("split_day"),
        nd.alias("n_days"),
        i.alias("n_days_left"),
        pround(F.col("gain") / 10000, 4).alias("sse_reduction"),
        pround(cs.cast("double") / (F.lit(100.0) * i), 4).alias("mean_left"),
        pround(
            (st - cs).cast("double") / (F.lit(100.0) * (nd - i)), 4
        ).alias("mean_right"),
    )
