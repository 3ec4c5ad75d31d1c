"""Scale-pattern catalog entries (q111+): the join/prune/compact
shapes that decide whether a plan survives a 100x scale-up, each
driver-graded against a DuckDB oracle that states the SEMANTICS (the
naive formulation) while the engine plans the scalable form:

  q111  Bloom-filter runtime row filter in front of an exact semi join
  q112  salted equi-join (hot-key skew splitting), result == plain join
  q113  distributive 2-D skyline vs the quadratic NOT EXISTS oracle
  q114  blocked edit-distance near-dup pairs on the distinct-name grain
  q115  CDC last-write-wins compaction via map-side-combinable max(struct)
  q116  gaps-and-islands activity streaks (row_number difference trick)
  q117  deterministic per-group sampling by cryptographic-hash order
  q118  dynamic partition pruning over a hive-partitioned fact layout
  q119  bucketed co-located fact-fact join (zero-exchange SortMergeJoin)
  q120  schema-evolution read (mergeSchema union + null-fill of legacy rows)
  q122  order-insensitive cross-engine table checksums
  q123  correlated scalar subquery via spark.sql (decorrelation pinned)
  q124  column-statistics profile (Expand multi-distinct, stack unpivot)
  q125  BPE-ish regex tokenizer counts (codegen projection)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import DEC, emit, load, money, register


# ---------------------------------------------------------------------------
# q111: bloom-filter semi-join reduction
# ---------------------------------------------------------------------------

@register(
    "q111_bloom_semijoin_revenue",
    sql="""
    SELECT l.l_returnflag,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DECIMAL(24,6))
                AS DOUBLE) AS urgent_revenue
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY l.l_returnflag
    """,
    doc="Explicit Bloom-filter runtime row filter (relational.joins."
        "bloom_semi_join): revenue of lineitems belonging to urgent "
        "orders.  The oracle states the plain semi-join semantics; the "
        "engine builds a 128K-bit / 5-probe bloom over the urgent "
        "order keys (one bit_or aggregation, m/64 longs broadcast as a "
        "dense array), tests it in a codegen'd expression on the fact "
        "scan, and only the survivors (matches + ~e-4 false positives) "
        "enter the EXACT semi join — so at 100 TB the wide shuffle "
        "carries the filtered sliver, not the fact table.  The "
        "explicit form of Spark's runtime.bloomFilter optimization, "
        "usable in front of any stage and exactness-preserving by "
        "construction.",
    tags=("join", "semi", "bloom", "runtime-filter"),
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .joins import bloom_semi_join

    li = load(spark, sf_dir, "lineitem")
    urgent = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    filtered = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return filtered.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        emit(
            F.sum(money("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(18,4)")))
            .cast("decimal(24,6)")
        ).alias("urgent_revenue"),
    )


# ---------------------------------------------------------------------------
# q112: salted skew join
# ---------------------------------------------------------------------------

@register(
    "q112_salted_skew_join",
    sql="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS segment_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_mktsegment
    """,
    doc="Salted equi-join (relational.joins.salted_join): event value "
        "by customer segment, joined through deterministic xxhash64 "
        "salting (salt_by=event_id, 8 buckets) — the oracle states the "
        "plain join, and the salted plan must reproduce it exactly.  "
        "The skew weapon AQE doesn't have: AQE splits oversized "
        "partitions but cannot split ONE hot key's hash bucket; "
        "salting spreads a degenerate key (every crawl corpus has a "
        "null-ish user) over `salt` tasks at the cost of replicating "
        "the modest side salt-fold.  Exactness is structural: every "
        "(key, salt) pair finds its replica.",
    tags=("join", "skew", "events"),
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .joins import salted_join

    e = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("ckey"), "event_id", "value"
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"), "c_mktsegment"
    )
    joined = salted_join(e, c, on="ckey", salt=8, salt_by="event_id")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        emit(F.sum(money("value")).cast(DEC)).alias("segment_value"),
    )


# ---------------------------------------------------------------------------
# q113: pareto frontier (skyline)
# ---------------------------------------------------------------------------

@register(
    "q113_pareto_frontier_parts",
    sql="""
    WITH pts AS (SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part),
    sky AS (
      SELECT price, size FROM pts a
      WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE b.price <= a.price AND b.size >= a.size
          AND (b.price < a.price OR b.size > a.size))
    )
    SELECT s.price, s.size, COUNT(p.p_partkey) AS n_parts
    FROM sky s JOIN part p
      ON p.p_retailprice = s.price AND p.p_size = s.size
    GROUP BY s.price, s.size
    """,
    doc="2-D pareto frontier (relational.skyline.skyline_2d): parts no "
        "other part beats on BOTH price (min) and size (max) — the "
        "sourcing question 'cheapest option at every capacity level'.  "
        "The oracle states dominance as the quadratic NOT EXISTS; the "
        "engine exploits distributivity (skyline(A∪B) = skyline(local "
        "skylines)) — distinct points, per-hash-bucket sorted frontier "
        "scans, then one scan over the tiny candidate union.  At "
        "100 TB nothing global ever sorts the data: the final stage "
        "sees only per-bucket frontiers.",
    tags=("window", "skyline", "part"),
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .skyline import skyline_2d

    p = load(spark, sf_dir, "part")
    sky = skyline_2d(
        p.select(F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")),
        x="price",
        y="size",
    )
    return (
        p.join(
            F.broadcast(sky),
            (p.p_retailprice == sky.price) & (p.p_size == sky.size),
        )
        .groupBy("price", "size")
        .agg(F.count("p_partkey").alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# q114: blocked edit-distance near-duplicate pairs
# ---------------------------------------------------------------------------

@register(
    "q114_editdist_name_pairs",
    sql="""
    WITH dn AS (SELECT DISTINCT p_name AS name FROM part)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS dist
    FROM dn a JOIN dn b ON a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 2
    """,
    doc="Edit-distance near-duplicate pairs (fuzzy entity resolution "
        "over product/provider names — the reference's synonym table "
        "is the curated output of exactly this discovery pass).  The "
        "oracle states all-pairs levenshtein<=2 over distinct names; "
        "the engine (a) collapses to the DISTINCT-NAME grain first "
        "(names repeat massively — the pair space shrinks "
        "quadratically), then (b) LENGTH-BLOCKS: dist<=2 forces "
        "|len(a)-len(b)|<=2, so each name joins only its 3 upward "
        "length bands (explode offsets 0..2, equi-join on the banded "
        "length) and the quadratic blowup is bounded per band, never "
        "all-pairs.  levenshtein itself is a JVM builtin — no UDF.",
    tags=("dedup", "fuzzy", "part"),
)
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("_len", F.length("name"))
    )
    left = names.select(
        F.col("name").alias("name_l"), F.col("_len").alias("_len_l")
    ).withColumn("_off", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))))
    right = names.select(F.col("name").alias("name_r"), F.col("_len").alias("_len_r"))
    pairs = (
        left.join(right, F.col("_len_r") == F.col("_len_l") + F.col("_off"))
        .where((F.col("_off") > 0) | (F.col("name_l") < F.col("name_r")))
        .where(F.levenshtein("name_l", "name_r") <= 2)
    )
    return pairs.select(
        F.least("name_l", "name_r").alias("name_a"),
        F.greatest("name_l", "name_r").alias("name_b"),
        F.levenshtein(F.least("name_l", "name_r"), F.greatest("name_l", "name_r"))
        .cast("int")
        .alias("dist"),
    )


# ---------------------------------------------------------------------------
# q115: CDC last-write-wins compaction
# ---------------------------------------------------------------------------

@register(
    "q115_cdc_latest_events",
    sql="""
    WITH ranked AS (
      SELECT user_id, ts, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
    )
    SELECT user_id, n_events,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           event_type AS last_event_type,
           value AS last_value
    FROM ranked WHERE rn = 1
    """,
    doc="CDC last-write-wins compaction: the newest row per key "
        "(ts, then event_id as the deterministic tiebreak) — the "
        "changelog→snapshot collapse every upsert-ingest pipeline runs. "
        " The oracle states it as the row_number window; the engine "
        "plans max(struct(ts, event_id, payload...)) — an AGGREGATION, "
        "not a window — because struct-max partially combines map-side: "
        "each input partition contributes one candidate per key before "
        "the shuffle, so a key with a million updates ships ~n_tasks "
        "rows, where the window formulation ships all million to one "
        "reducer and sorts them.",
    tags=("events", "cdc", "agg"),
)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    last = F.max(F.struct("ts", "event_id", "event_type", "value")).alias("_last")
    return (
        e.groupBy("user_id")
        .agg(last, F.count("*").alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.date_format("_last.ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
            F.col("_last.event_type").alias("last_event_type"),
            F.col("_last.value").alias("last_value"),
        )
    )


# ---------------------------------------------------------------------------
# q116: gaps-and-islands activity streaks
# ---------------------------------------------------------------------------

@register(
    "q116_activity_islands",
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    grp AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g
      FROM days
    ),
    islands AS (
      SELECT user_id, g, COUNT(*) AS len
      FROM grp GROUP BY user_id, g
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           COUNT(*) AS n_islands,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM islands GROUP BY user_id
    """,
    doc="Gaps-and-islands: per user, maximal runs of CONSECUTIVE "
        "active days (streak mining — retention features, anomaly "
        "flags).  The classic row_number-difference trick: day minus "
        "per-user rank is constant exactly within a consecutive run, "
        "so islands fall out of one window + one groupBy.  Scale: the "
        "grain collapses to (user, day) FIRST (the distinct carries "
        "two ints), and epoch day uses integer FLOOR div of micros "
        "(pmod-subtract before div, matching DuckDB's // even for "
        "pre-1970 timestamps) — exact, no timezone/double hazards; "
        "window and both aggs share the hash(user_id) distribution.",
    tags=("events", "window", "islands"),
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.expr(
            "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))"
            " div 86400000000"
        ).alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn("g", F.col("day") - F.row_number().over(w))
    islands = grp.groupBy("user_id", "g").agg(F.count("*").alias("len"))
    return islands.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count("*").alias("n_islands"),
        F.max("len").cast("long").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# q117: deterministic per-group sampling
# ---------------------------------------------------------------------------

@register(
    "q117_deterministic_doc_sample",
    sql="""
    SELECT lang, source, doc_id, sample_rank
    FROM (
      SELECT lang, source, doc_id,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
      FROM documents
    )
    WHERE sample_rank <= 3
    """,
    doc="Deterministic per-group sampling: 3 documents per (lang, "
        "source) cell, chosen by md5-of-id order — the reproducible "
        "substitute for reservoir sampling when eyeballing / golden-set "
        "extraction needs the SAME sample on every run, engine, and "
        "retry (rand()-based sampling can't promise that across "
        "engines; a cryptographic hash of the key can).  Scale: one "
        "window shuffle on the group key; rank<=3 cuts inside the "
        "window operator, and because the hash order is data-"
        "independent the sample stays unbiased under any partitioning.",
    tags=("sampling", "documents"),
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        d.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= 3)
        .select("lang", "source", "doc_id", "sample_rank")
    )


# ---------------------------------------------------------------------------
# q118: dynamic partition pruning
# ---------------------------------------------------------------------------

# partitioned-layout rewrites are pure functions of the source dir:
# cache per (session, sf_dir) so repeated catalog sweeps / bench passes
# pay the write once per process
_PART_LAYOUT_CACHE: dict = {}


@register(
    "q118_dynamic_partition_pruning",
    sql="""
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total_value
    FROM events e
    JOIN (VALUES ('click', 'a'), ('error', 'a'), ('purchase', 'b'),
                 ('signup', 'b'), ('view', 'b')) AS d(event_type, grp)
      ON d.event_type = e.event_type
    WHERE d.grp = 'a'
    GROUP BY e.event_type
    """,
    doc="Dynamic partition pruning over a hive-partitioned layout: the "
        "events table is laid out partitioned BY event_type (the "
        "warehouse pattern for a 100 TB fact), and the query joins a "
        "dimension whose filter (grp = 'a') lives on a NON-key column "
        "— so no static predicate can reach the fact scan, and the "
        "only way to avoid reading every partition is Catalyst's "
        "runtime DPP: the broadcast dim's keys become a "
        "dynamicpruningexpression in the scan's PartitionFilters, and "
        "3 of 5 partitions are never opened.  The oracle states the "
        "same join over the flat table.  Plan-tested: the scan must "
        "carry the dynamic filter.",
    tags=("join", "partition-pruning", "events"),
)
def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..session import session_key

    key = (session_key(spark), sf_dir, "events_by_type")
    part_dir = _PART_LAYOUT_CACHE.get(key)
    if part_dir is None:
        part_dir = tempfile.mkdtemp(prefix="q118_events_by_type_")
        load(spark, sf_dir, "events").write.partitionBy("event_type").mode(
            "overwrite"
        ).parquet(part_dir)
        _PART_LAYOUT_CACHE[key] = part_dir
    facts = spark.read.parquet(part_dir)
    dim = spark.createDataFrame(
        [("click", "a"), ("error", "a"), ("purchase", "b"),
         ("signup", "b"), ("view", "b")],
        ["event_type", "grp"],
    )
    return (
        facts.join(F.broadcast(dim.where(F.col("grp") == "a")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            emit(F.sum(money("value")).cast(DEC)).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# q119: bucketed co-located join (zero-exchange sort-merge join)
# ---------------------------------------------------------------------------

@register(
    "q119_bucketed_colocated_join",
    sql="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DECIMAL(24,6))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Bucketed co-located fact-fact join: orders and lineitem are "
        "written as 4-bucket tables hashed AND sorted on the order "
        "key, so the join planner proves co-location and the "
        "SortMergeJoin runs with ZERO exchanges under it — the big-"
        "fact join pattern where pre-bucketing the warehouse layout "
        "amortizes the shuffle across every future join on that key "
        "(at 100 TB the orderkey shuffle IS the query cost; bucketing "
        "pays it once at write time).  The oracle states the plain "
        "join; the plan test pins 'no Exchange below the join'.",
    tags=("join", "bucketing", "orders", "lineitem"),
)
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re
    import tempfile

    san = re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    t_orders, t_li = f"bkt_orders_{san}", f"bkt_lineitem_{san}"
    from ..session import session_key

    key = (session_key(spark), sf_dir, "bucketed_orderkey")
    if key not in _PART_LAYOUT_CACHE:
        root = tempfile.mkdtemp(prefix="q119_buckets_")
        (
            load(spark, sf_dir, "orders")
            .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
            .option("path", f"{root}/orders").mode("overwrite")
            .saveAsTable(t_orders)
        )
        (
            load(spark, sf_dir, "lineitem")
            .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
            .option("path", f"{root}/lineitem").mode("overwrite")
            .saveAsTable(t_li)
        )
        _PART_LAYOUT_CACHE[key] = root
    o = spark.table(t_orders)
    li = spark.table(t_li)
    # the merge hint pins the SortMergeJoin so the co-location proof is
    # scale-independent (at toy SF the planner would broadcast orders,
    # which also skips the shuffle but demonstrates nothing)
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            emit(
                F.sum(money("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(18,4)")))
                .cast("decimal(24,6)")
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q120: schema-evolution read (mergeSchema)
# ---------------------------------------------------------------------------

@register(
    "q120_schema_evolution_read",
    sql="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE doc_id % 2 = 0) AS n_legacy,
           CAST(COALESCE(SUM(CASE WHEN doc_id % 2 = 1
                    THEN len(string_split_regex(trim(text), '\\s+')) END), 0)
                AS BIGINT) AS tokens_new_wave
    FROM documents
    GROUP BY source
    """,
    doc="Schema-evolution read: wave 1 lands documents with the legacy "
        "schema (doc_id, text, source), wave 2 adds an n_tokens column; "
        "a mergeSchema parquet read must union the waves, null-fill the "
        "legacy rows' missing column, and aggregate across both — the "
        "live-table reality every long-running warehouse hits (columns "
        "get added; history doesn't get rewritten).  The oracle "
        "recomputes both waves from the flat table.  Scale: schema "
        "merge is a footer-only planning cost; the data path stays a "
        "plain pruned columnar scan.",
    tags=("warehouse", "schema-evolution", "documents"),
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..session import session_key

    key = (session_key(spark), sf_dir, "schema_waves")
    root = _PART_LAYOUT_CACHE.get(key)
    d = load(spark, sf_dir, "documents")
    if root is None:
        root = tempfile.mkdtemp(prefix="q120_waves_")
        d.where(F.col("doc_id") % 2 == 0).select("doc_id", "text", "source").write.parquet(
            f"{root}/wave=1"
        )
        d.where(F.col("doc_id") % 2 == 1).select(
            "doc_id", "text", "source",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        ).write.parquet(f"{root}/wave=2")
        _PART_LAYOUT_CACHE[key] = root
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    return merged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("n_tokens").isNull(), 1)).alias("n_legacy"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("tokens_new_wave"),
    )


# ---------------------------------------------------------------------------
# q122: order-insensitive table checksums
# ---------------------------------------------------------------------------

@register(
    "q122_table_checksums",
    sql="""
    SELECT 'customer' AS tbl, COUNT(*) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5(
                  COALESCE(CAST(c_custkey AS VARCHAR), '<NULL>') || '|'
                    || COALESCE(c_name, '<NULL>') || '|'
                    || COALESCE(c_mktsegment, '<NULL>')), 1, 8))
                AS BIGINT)) AS BIGINT) AS checksum
    FROM customer
    UNION ALL
    SELECT 'supplier' AS tbl, COUNT(*) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5(
                  COALESCE(CAST(s_suppkey AS VARCHAR), '<NULL>') || '|'
                    || COALESCE(s_name, '<NULL>') || '|'
                    || COALESCE(CAST(s_nationkey AS VARCHAR), '<NULL>')), 1, 8))
                AS BIGINT)) AS BIGINT) AS checksum
    FROM supplier
    UNION ALL
    SELECT 'nation' AS tbl, COUNT(*) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5(
                  COALESCE(CAST(n_nationkey AS VARCHAR), '<NULL>') || '|'
                    || COALESCE(n_name, '<NULL>')), 1, 8))
                AS BIGINT)) AS BIGINT) AS checksum
    FROM nation
    """,
    doc="Order-insensitive table checksums: per table, SUM over each "
        "row's md5-prefix rendered as a 32-bit integer — the "
        "cross-engine data-integrity fingerprint a migration runs on "
        "both systems to prove a copy is byte-faithful without moving "
        "or sorting the data (sum is commutative, so partitioning and "
        "row order never matter; md5 is identical everywhere).  This "
        "is how a reference->Spark cutover validates itself.  Scale: "
        "per table one codegen projection + a single-row aggregate; "
        "the three audits are independent branches Spark runs as "
        "parallel stages.",
    tags=("audit", "checksum", "scan"),
)
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    def checksum(df: DataFrame, tbl: str, cols: list) -> DataFrame:
        # explicit NULL sentinel per column: concat_ws silently SKIPS
        # nulls (making the checksum blind to value-shift corruption
        # and disagreeing with the oracle's ||, which nullifies the
        # row); coalescing first makes both renderings identical
        rendered = F.concat_ws(
            "|", *[F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")) for c in cols]
        )
        word = F.conv(F.substring(F.md5(rendered), 1, 8), 16, 10).cast("long")
        return df.agg(
            F.count("*").alias("n_rows"), F.sum(word).cast("long").alias("checksum")
        ).select(F.lit(tbl).alias("tbl"), "n_rows", "checksum")

    c = checksum(
        load(spark, sf_dir, "customer"), "customer",
        ["c_custkey", "c_name", "c_mktsegment"],
    )
    s = checksum(
        load(spark, sf_dir, "supplier"), "supplier",
        ["s_suppkey", "s_name", "s_nationkey"],
    )
    n = checksum(load(spark, sf_dir, "nation"), "nation", ["n_nationkey", "n_name"])
    return c.unionByName(s).unionByName(n)


# ---------------------------------------------------------------------------
# q123: correlated scalar subquery through the SQL surface
# ---------------------------------------------------------------------------

@register(
    "q123_small_quantity_revenue",
    sql="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17-style correlated scalar subquery, submitted through "
        "the engine's SQL surface (register_views + spark.sql, the "
        "same text as the oracle) — proving the declarative front door "
        "is graded, not just the DataFrame API.  Catalyst DECORRELATES "
        "the per-part average into an aggregate + join instead of "
        "re-running the subquery per row; at 100 TB that is the "
        "difference between one extra scan and |lineitem| scans.  "
        "Plan-tested: no per-row subquery remains after optimization.",
    tags=("sql", "subquery", "join"),
)
def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS DOUBLE) / 7.0 AS avg_yearly,
               COUNT(*) AS n_items
        FROM lineitem l
        WHERE l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
        """
    )


# ---------------------------------------------------------------------------
# q124: column statistics profile (ANALYZE TABLE shape)
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("l_returnflag", "l_linestatus", "l_quantity", "l_partkey")


@register(
    "q124_column_stats_profile",
    sql="WITH s AS (SELECT COUNT(*) AS n_rows, "
        + ", ".join(
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nn_{c}, "
            f"COUNT(DISTINCT {c}) AS nd_{c}, "
            f"CAST(MIN({c}) AS VARCHAR) AS mn_{c}, "
            f"CAST(MAX({c}) AS VARCHAR) AS mx_{c}"
            for c in _PROFILE_COLS
        )
        + " FROM lineitem) "
        + " UNION ALL ".join(
            f"SELECT '{c}' AS column_name, n_rows, CAST(nn_{c} AS BIGINT) AS n_nulls, "
            f"CAST(nd_{c} AS BIGINT) AS n_distinct, mn_{c} AS min_value, "
            f"mx_{c} AS max_value FROM s"
            for c in _PROFILE_COLS
        ),
    doc="Column-statistics profile over lineitem (the ANALYZE TABLE / "
        "data-quality report shape): per column, null count, EXACT "
        "distinct count, and min/max rendered as strings — the stats "
        "a cost-based optimizer and a data contract check both feed "
        "on.  Scale: all four exact count-distincts compute in ONE "
        "aggregation pass (Catalyst's Expand rewrite — one scan, one "
        "shuffle, not one job per column), and the single stats row "
        "unpivots to report rows via stack().  Plan-tested: exactly "
        "one scan of lineitem, Expand present.  mode='exact' is the "
        "oracle-parity path; the 100 TB path is mode='sketch' (q145 — "
        "no Expand, bitmap/HLL distincts).",
    tags=("audit", "profile", "agg"),
)
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketches import column_stats_profile

    return column_stats_profile(
        load(spark, sf_dir, "lineitem"), _PROFILE_COLS, mode="exact"
    )


# sketch-mode profile: integral columns only, so the bitmap path keeps
# the distincts EXACT and the DuckDB twin can still grade values
_SKETCH_PROFILE_COLS = ("l_partkey", "l_suppkey", "l_linenumber")


@register(
    "q145_sketch_column_profile",
    sql="WITH s AS (SELECT COUNT(*) AS n_rows, "
        + ", ".join(
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nn_{c}, "
            f"COUNT(DISTINCT {c}) AS nd_{c}, "
            f"CAST(MIN({c}) AS VARCHAR) AS mn_{c}, "
            f"CAST(MAX({c}) AS VARCHAR) AS mx_{c}"
            for c in _SKETCH_PROFILE_COLS
        )
        + " FROM lineitem) "
        + " UNION ALL ".join(
            f"SELECT '{c}' AS column_name, n_rows, CAST(nn_{c} AS BIGINT) AS n_nulls, "
            f"CAST(nd_{c} AS BIGINT) AS n_distinct, mn_{c} AS min_value, "
            f"mx_{c} AS max_value FROM s"
            for c in _SKETCH_PROFILE_COLS
        ),
    doc="The column profiler's SCALE path (sketches.column_stats_profile"
        " mode='sketch') under the gate: same report shape as q124 but "
        "NO Expand anywhere — each integral column's distinct count "
        "comes from bit_or bitmap words (exact, so the plain COUNT "
        "(DISTINCT) oracle still grades values), and the shuffle "
        "carries at most |domain|/64 longs per column instead of "
        "near-key-grain rows.  Two column-pruned scans (null/min/max "
        "stats pass + bitmap pass), both map-side combined.  This is "
        "the q124-at-100-TB answer the r04 verdict asked for; "
        "plan-tested Expand-free with the bitmap aggregation present.",
    tags=("audit", "profile", "sketch", "agg"),
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketches import column_stats_profile

    return column_stats_profile(
        load(spark, sf_dir, "lineitem"), _SKETCH_PROFILE_COLS, mode="sketch"
    )


# ---------------------------------------------------------------------------
# q125: BPE-ish regex tokenizer counts
# ---------------------------------------------------------------------------

@register(
    "q125_bpeish_token_counts",
    sql="""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|\\d|[^\\w\\s]')) AS bpeish_tokens
    FROM documents
    """,
    doc="Tokenizer-style counting under the gate (llmdata.textstats."
        "token_counts): whitespace tokens plus the BPE-ish regex count "
        "(letter runs, single digits, punctuation as separate tokens — "
        "the GPT-2 pretokenizer shape) that budgets corpus size in "
        "model tokens rather than words.  Both are codegen regexp "
        "projections; the alternation's branches are disjoint char "
        "classes, so Java regex and RE2 agree.  Shuffle-free map.",
    tags=("llmdata", "text", "documents"),
)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.textstats import token_counts

    return token_counts(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q133: Z-order (Morton) clustering key
# ---------------------------------------------------------------------------

from ..partitioning import zorder_sql as _zorder_sql  # single source of the
# interleave expression: the oracle below and zorder_key plan the SAME text


@register(
    "q133_zorder_clustering_key",
    sql=f"""
    WITH z AS (
      SELECT ({_zorder_sql('l_partkey', 'l_suppkey')}) AS zval
      FROM lineitem
    )
    SELECT zval // 4096 AS zbucket,
           COUNT(*) AS n_rows,
           MIN(zval) AS z_min,
           MAX(zval) AS z_max,
           CAST(SUM(zval) AS BIGINT) AS z_sum
    FROM z
    GROUP BY 1
    """,
    doc="Z-order / Morton clustering key (partitioning.zorder_key): "
        "interleave the low 16 bits of (l_partkey, l_suppkey) via the "
        "magic-mask bit spread — 5 codegen integer ops per coordinate, "
        "no UDF — and roll the keys up into 256 Z-range buckets "
        "(count + min/max envelope per bucket).  This is the sort key "
        "behind multi-dimensional file skipping (Delta OPTIMIZE ZORDER "
        "analog, pairs with Warehouse.compact(sort_by=)): a rewrite "
        "ordered by zval gives every file a tight min/max box on BOTH "
        "key columns, so predicates on EITHER dimension prune files.  "
        "The oracle evaluates the IDENTICAL bit arithmetic, so one "
        "flipped bit anywhere flips a bucket and fails the hash gate.  "
        "One scan, one #buckets-row Exchange.",
    tags=("layout", "zorder", "lineitem"),
)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..partitioning import zorder_key

    li = load(spark, sf_dir, "lineitem")
    z = li.select(zorder_key("l_partkey", "l_suppkey").alias("zval"))
    return (
        z.groupBy(F.expr("zval div 4096").alias("zbucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
            F.sum("zval").alias("z_sum"),
        )
    )
