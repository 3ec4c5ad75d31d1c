"""Catalog entries for the temporal join operators (relational/joins.py)
over the events table, each with a DuckDB oracle (ASOF JOIN is native
DuckDB SQL; the interval join is a plain range predicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load, register, pround
from .joins import asof_join, interval_count_join


@register(
    "q36_asof_click_to_error",
    sql="""
    WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         errors AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error')
    SELECT c.event_id, c.user_id, c.ts,
           e.ts AS asof_error_ts,
           e.value AS asof_error_value
    FROM clicks c
    ASOF LEFT JOIN errors e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
    doc="As-of join: every click joined to the user's most recent error "
        "at-or-before it.  Union-then-window merge formulation: ONE "
        "shuffle on user_id, linear in rows — the naive theta-join "
        "formulation explodes to the per-user cross product.",
    tags=("join", "temporal", "events"),
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.where(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = asof_join(clicks, errors, on="user_id", right_cols=("ts", "value"))
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("asof_error_ts"),
        F.col("asof_value").alias("asof_error_value"),
    )


@register(
    "q38_cube_status_priority",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over (status, priority): all 4 grouping sets in one "
        "map-side expansion, one shuffle.",
    tags=("cube", "agg"),
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("total_price"),
    )


@register(
    "q40_event_value_percentiles",
    sql="""
    SELECT event_type,
           CAST(ROUND((quantile_cont(value, 0.5)) * 1e6) AS BIGINT) / 1e6 AS p50,
           CAST(ROUND((quantile_cont(value, 0.95)) * 1e6) AS BIGINT) / 1e6 AS p95,
           CAST(ROUND((quantile_cont(value, 0.99)) * 1e6) AS BIGINT) / 1e6 AS p99
    FROM events
    GROUP BY event_type
    """,
    doc="Exact percentiles per event_type: Spark `percentile` and DuckDB "
        "quantile_cont share linear-interpolation semantics.  Scale: "
        "exact percentile sorts per group; swap to approx_percentile "
        "(t-digest, mergeable) past memory-per-group limits.",
    tags=("agg", "events"),
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pct = lambda p, a: pround(F.expr(f"percentile(value, {p})"), 6).alias(a)
    return ev.groupBy("event_type").agg(
        pct(0.5, "p50"), pct(0.95, "p95"), pct(0.99, "p99")
    )


@register(
    "q39_approx_distinct_users",
    sql="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    """,
    doc="Distinct users per event_type: the exact count alongside a "
        "graded tolerance check on approx_count_distinct (HLL++, rsd "
        "0.01) — the mergeable-sketch path for distinct counts at "
        "100 TB.  The sketch value itself is engine-specific, so the "
        "oracle-checkable contract is |approx - exact| <= 5% — a TRUE "
        "column the oracle asserts as a literal; the raw estimate stays "
        "pinned in tests/test_relational_oracle.py.",
    tags=("agg", "approx", "events"),
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # two-level distinct: one uniform shuffle on (type, user) then a
    # plain agg — avoids the Expand node a mixed exact+approx distinct
    # aggregation plans, and HLL over deduped rows is the same sketch
    # (duplicates never change a distinct-count estimator)
    base = ev.select("event_type", "user_id").distinct()
    approx = F.approx_count_distinct("user_id", rsd=0.01)
    exact = F.count("user_id")
    return base.groupBy("event_type").agg(
        exact.alias("exact_users"),
        (F.abs(approx.cast("double") - exact.cast("double"))
         <= F.greatest(0.05 * exact.cast("double"), F.lit(1.0))).alias("approx_within_5pct"),
    )


@register(
    "q37_errors_followed_by_clicks",
    sql="""
    WITH errors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
         clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id, e.ts, COUNT(c.user_id) AS n_in_window
    FROM errors e
    LEFT JOIN clicks c
      ON c.user_id = e.user_id
     AND c.ts > e.ts AND c.ts <= e.ts + INTERVAL 1 HOUR
    GROUP BY e.event_id, e.user_id, e.ts
    """,
    doc="Interval join: clicks within 1h after each error, per user. "
        "Equi-join on user_id with the range as a filter — blowup "
        "bounded by rows-per-key; bucket the key by coarse time at "
        "100 TB.",
    tags=("join", "temporal", "events"),
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    return interval_count_join(
        errors, clicks, on="user_id", window_seconds=3600
    ).select("event_id", "user_id", "ts", "n_in_window")


@register(
    "q68_approx_percentile_sketch",
    sql="""
    SELECT event_type,
           CAST(ROUND((quantile_cont(value, 0.95)) * 1e6) AS BIGINT) / 1e6 AS exact_p95,
           TRUE AS approx_within_rank_band
    FROM events
    GROUP BY event_type
    """,
    doc="Quantile-sketch grading (q39's pattern for percentiles): "
        "approx_percentile (GK sketch, accuracy 10000, mergeable — the "
        "100 TB quantile path q40's exact sort-per-group cannot walk) "
        "must land inside the exact [p93.5, p96.5] value band.  The "
        "sketch's rank error is <= 1/accuracy = 0.01% of rows, so a "
        "+/-1.5%-rank band asserts the contract with huge margin while "
        "staying engine-portable; the oracle asserts the band check as "
        "a literal TRUE and pins the exact p95 alongside.",
    tags=("agg", "approx", "events"),
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pcts = F.expr("percentile(value, array(0.935D, 0.95D, 0.965D))")
    ap = F.expr("approx_percentile(value, 0.95D, 10000)")
    return ev.groupBy("event_type").agg(
        pround(F.element_at(pcts, 2), 6).alias("exact_p95"),
        (
            (ap >= F.element_at(pcts, 1)) & (ap <= F.element_at(pcts, 3))
        ).alias("approx_within_rank_band"),
    )


@register(
    "q82_referential_integrity",
    sql="""
    WITH corrupted AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN -o_custkey ELSE o_custkey END
               AS o_custkey
      FROM orders
    )
    , audits AS (
      SELECT 'lineitem.l_orderkey -> orders' AS relationship,
             (SELECT COUNT(*) FROM lineitem) AS n_child_rows,
             (SELECT COUNT(*) FROM lineitem
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
               AS n_orphans
      UNION ALL
      SELECT 'orders.o_custkey -> customer',
             (SELECT COUNT(*) FROM corrupted),
             (SELECT COUNT(*) FROM corrupted
              WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      UNION ALL
      SELECT 'customer.c_nationkey -> nation',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer
              WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
    )
    SELECT relationship,
           CAST(n_child_rows AS BIGINT) AS n_child_rows,
           CAST(n_orphans AS BIGINT) AS n_orphans,
           CAST(n_orphans AS DOUBLE) / n_child_rows AS orphan_rate
    FROM audits
    """,
    doc="Referential-integrity audit across the star schema "
        "(relational.joins.fk_audit): per FK relationship, child count "
        "+ orphan count + rate, each ONE lazy left-join-and-count pass "
        "with broadcast parents.  Every 97th order gets a planted "
        "negative custkey so the audit proves it DETECTS breakage, "
        "not just that clean data is clean.",
    tags=("join", "audit", "quality"),
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .joins import fk_audit

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    corrupted = orders.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 97 == 0, -F.col("o_custkey")
        ).otherwise(F.col("o_custkey")).alias("o_custkey"),
    )
    return (
        fk_audit(li, "l_orderkey", orders, "o_orderkey", "lineitem.l_orderkey -> orders")
        .unionByName(
            fk_audit(corrupted, "o_custkey", cust, "c_custkey",
                     "orders.o_custkey -> customer")
        )
        .unionByName(
            fk_audit(cust, "c_nationkey", nation, "n_nationkey",
                     "customer.c_nationkey -> nation")
        )
    )


@register(
    "q87_revenue_yoy",
    sql="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS VARCHAR) AS month,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           LAG(revenue, 12) OVER (ORDER BY month) AS revenue_prev_year,
           CAST(ROUND(((revenue - LAG(revenue, 12) OVER (ORDER BY month))
                 / LAG(revenue, 12) OVER (ORDER BY month) * 100) * 1e4) AS BIGINT) / 1e4 AS yoy_pct
    FROM m
    """,
    doc="Monthly revenue with year-over-year deltas: decimal-exact "
        "monthly sums (catalog.money discipline), a 12-step LAG for "
        "the prior-year comparison, growth emitted as round-4 DOUBLE.  "
        "The single-partition month window is fine — input is one row "
        "per month regardless of fact scale; the heavy lifting is the "
        "partial-aggregated month rollup.",
    tags=("agg", "window", "orders", "reporting"),
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").cast("string").alias("month")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue", 12).over(w)
    return m.select(
        "month",
        "revenue",
        prev.alias("revenue_prev_year"),
        pround((F.col("revenue") - prev) / prev * 100, 4).alias("yoy_pct"),
    )


@register(
    "q88_market_basket",
    sql="""
    WITH lp AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM lp a JOIN lp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
    doc="Market-basket co-occurrence: top part pairs ordered together "
        "in >= 2 orders.  Physical strategy: ONE groupBy collecting "
        "each order's (small, bounded) part set, then in-task pair "
        "expansion (dedup.bucket_pairs — the same kernel the LSH "
        "buckets use) and a pair-count aggregation — per-order work "
        "is O(basket^2) with baskets bounded by order size, never an "
        "order-table self-join shuffle of the raw fact rows.",
    tags=("join", "agg", "lineitem", "basket"),
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.dedup import bucket_pairs

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_list("l_partkey").alias("_ids")
    )
    pairs = bucket_pairs(baskets, out_a="part_a", out_b="part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@register(
    "q89_cheapest_supplier_per_part",
    sql="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
      SELECT l_partkey, l_suppkey, total_price, total_qty,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY total_price / total_qty, l_suppkey)
               AS rn
      FROM ps
    )
    SELECT r.l_partkey, r.l_suppkey, s.s_name,
           CAST(CAST(round(total_price / total_qty * 10000.0) AS BIGINT)
                AS DOUBLE) / 1e4 AS unit_price
    FROM ranked r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE rn = 1 AND r.l_partkey % 10 = 0
    """,
    doc="Cheapest supplier per part from shipment history (TPC-H "
        "Q2's min-cost-supplier shape over lineitem): decimal-exact "
        "per-(part, supplier) rollup, unit price as identical-operand "
        "double division, ROW_NUMBER election with supplier-id "
        "tiebreak, supplier dim broadcast back for the name.  Output "
        "sampled to every 10th part.",
    tags=("join", "window", "lineitem", "supplier"),
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("total_price"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"),
    )
    unit = F.col("total_price") / F.col("total_qty")
    w = Window.partitionBy("l_partkey").orderBy(unit, F.col("l_suppkey"))
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ps.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("l_partkey") % 10 == 0))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_partkey",
            "l_suppkey",
            "s_name",
            # round to integer 1e-4 units first (engine-identical on
            # the same double), then divide — round(x, 4) flips at
            # half boundaries between the engines (sf0.1 sweep)
            (
                F.round(unit * F.lit(10000.0)).cast("bigint").cast("double")
                / F.lit(1e4)
            ).alias("unit_price"),
        )
    )


@register(
    "q92_customer_rfm",
    sql="""
    WITH maxd AS (SELECT MAX(o_orderdate) AS md FROM orders),
    base AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate), (SELECT md FROM maxd))
               AS recency_days,
             COUNT(*) AS frequency,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           frequency, monetary,
           NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r_score,
           NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
           NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
    FROM base
    """,
    doc="Customer RFM segmentation: recency (days since last order vs "
        "corpus max date), frequency, decimal-exact monetary, each cut "
        "into quartiles with NTILE (custkey tiebreak -> deterministic "
        "buckets).  The single-partition NTILE windows are over "
        "customer-grain rows, not facts; for a 100 TB customer base "
        "switch to approx_percentile cutpoints + a broadcast join "
        "(same pattern documented on length_buckets).",
    tags=("agg", "window", "orders", "segmentation"),
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("_md"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff(F.col("_md"), F.col("_last")).cast("long").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    return base.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(Window.orderBy("recency_days", "o_custkey")).alias("r_score"),
        F.ntile(4).over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))).alias("f_score"),
        F.ntile(4).over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))).alias("m_score"),
    )


@register(
    "q96_ship_latency",
    sql="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lineitems,
           CAST(ROUND((AVG(CAST(date_diff('day', o_orderdate, l_shipdate) AS DOUBLE))) * 1e6) AS BIGINT) / 1e6
             AS avg_latency_days,
           CAST(ROUND((quantile_cont(CAST(date_diff('day', o_orderdate, l_shipdate)
                                    AS DOUBLE), 0.9)) * 1e6) AS BIGINT) / 1e6 AS p90_latency_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Order-to-ship latency by priority: integer day-deltas through "
        "exact AVG (integer-valued doubles sum exactly) and "
        "linear-interpolated p90 (q40's percentile parity).  The "
        "fact-fact join shuffles on the order key; at 100 TB "
        "co-partitioning/bucketing both tables on orderkey makes it "
        "shuffle-free (the co-partitioned plan test's pattern).",
    tags=("join", "agg", "lineitem", "orders"),
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("double")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            pround(F.avg(lat), 6).alias("avg_latency_days"),
            pround(F.expr(
                "percentile(double(datediff(l_shipdate, o_orderdate)), 0.9)"
            ), 6).alias("p90_latency_days"),
        )
    )


@register(
    "q99_nation_market_share",
    sql="""
    WITH rev AS (
      SELECT n_name,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS DOUBLE) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    ),
    tot AS (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   AS DECIMAL(18,2)) AS DOUBLE) AS t FROM orders)
    SELECT n_name, revenue,
           CAST(ROUND((revenue / t * 100) * 1e6) AS BIGINT) / 1e6 AS market_share_pct
    FROM rev, tot
    """,
    doc="Nation market share: decimal-exact revenue per nation over "
        "the broadcast-dimension join chain, share against the "
        "single-row corpus total (broadcast, q42's 1xN shape).  Both "
        "the numerator and denominator pass through the exact-decimal "
        "-> double boundary so the percentage divides identical "
        "operands in both engines.",
    tags=("join", "agg", "orders", "reporting"),
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    money_sum = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("double")
    )
    rev = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(money_sum.alias("revenue"))
    )
    tot = o.agg(money_sum.alias("_t"))
    return rev.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "revenue",
        pround(F.col("revenue") / F.col("_t") * 100, 6).alias("market_share_pct"),
    )
