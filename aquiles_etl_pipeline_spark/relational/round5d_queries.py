"""Round-5 catalog entries, fourth batch (q174+): winnowing/MOSS
fingerprint matching, DSIR-style importance-weighted data selection,
and record-linkage election — published-method curation operators a
training-data pipeline runs between dedup and sampling, each expressed
in postings-grain / integer-exact shapes that survive 100 TB, each
graded against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import load, register, pround


# ---------------------------------------------------------------------------
# q174: winnowing (MOSS) fingerprint match report
# ---------------------------------------------------------------------------

@register(
    "q174_winnowing_pairs",
    sql="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id, u.i AS pos,
             substr(md5(array_to_string(t[u.i:u.i+4], ' ')), 1, 16) AS h
      FROM t, unnest(generate_series(1, greatest(len(t) - 4, 1))) AS u(i)
    ),
    w AS (
      SELECT doc_id, h,
             lead(h, 1) OVER win AS n1, lead(h, 2) OVER win AS n2,
             lead(h, 3) OVER win AS n3,
             lag(h, 1) OVER win AS p1, lag(h, 2) OVER win AS p2,
             lag(h, 3) OVER win AS p3
      FROM g WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    fp AS (
      SELECT DISTINCT doc_id, h
      FROM w
      WHERE CASE WHEN n1 IS NULL OR n1 <= h THEN 0
                 WHEN n2 IS NULL OR n2 <= h THEN 1
                 WHEN n3 IS NULL OR n3 <= h THEN 2
                 ELSE 3 END
          + CASE WHEN p1 IS NOT NULL AND p1 < h THEN 0
                 WHEN p2 IS NOT NULL AND p2 < h THEN 1
                 WHEN p3 IS NOT NULL AND p3 < h THEN 2
                 ELSE 3 END >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fp
    FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
    doc="Winnowing fingerprint match report (llmdata.dedup."
        "winnow_fingerprints + winnow_shared_pairs) — the MOSS "
        "plagiarism detector (Schleimer/Wilkerson/Aiken SIGMOD'03): "
        "hash every 5-word gram (16-hex md5 prefix, string-compared — "
        "cross-engine exact), keep each width-4 window's rightmost "
        "minimum via the R+L lead/lag formulation (brute-force-"
        "equivalence property-tested), pair documents sharing >= 2 "
        "fingerprints on a postings-grain self-join.  Guarantees any "
        "shared 8-token run is caught while storing ~2/5 of grams; "
        "the only doc-grain exchange is hash(doc_id) for the position "
        "window, and the pair join shuffles postings, never docs^2.",
    tags=("llmdata", "dedup", "fingerprint", "documents"),
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import dedup

    docs = load(spark, sf_dir, "documents")
    fp = dedup.winnow_fingerprints(docs, k=5, window=4)
    return dedup.winnow_shared_pairs(fp, min_shared=2)

# ---------------------------------------------------------------------------
# q175: DSIR-style importance-weighted data selection
# ---------------------------------------------------------------------------

@register(
    "q175_dsir_importance_select",
    sql="""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents
    ),
    tgt AS (SELECT t, COUNT(*) AS ct FROM tok WHERE lang = 'en' GROUP BY t),
    rawc AS (SELECT t, COUNT(*) AS cr FROM tok WHERE lang <> 'en' GROUP BY t),
    vocab AS (
      SELECT t,
             CAST(COALESCE(ct, 0) AS BIGINT) AS ct,
             CAST(COALESCE(cr, 0) AS BIGINT) AS cr
      FROM tgt FULL OUTER JOIN rawc USING (t)
    ),
    tots AS (
      SELECT SUM(ct) AS nt, SUM(cr) AS nr, COUNT(*) AS v FROM vocab
    ),
    sv AS (
      SELECT t,
             CAST(round((ln(CAST(ct + 1 AS DOUBLE) / (nt + v))
                         - ln(CAST(cr + 1 AS DOUBLE) / (nr + v))) * 1e6)
                  AS BIGINT) AS micros
      FROM vocab, tots
    ),
    per_doc AS (
      SELECT doc_id, SUM(micros) AS w, COUNT(*) AS n_tokens
      FROM tok JOIN sv USING (t)
      WHERE tok.lang <> 'en'
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(ROUND((CAST(w AS DOUBLE) / n_tokens / 1e6) * 1e6) AS BIGINT) / 1e6 AS avg_logratio
    FROM per_doc
    ORDER BY avg_logratio DESC, doc_id
    LIMIT 100
    """,
    doc="DSIR-style importance-weighted data selection (llmdata."
        "sampling.dsir_importance_select; Xie et al. NeurIPS'23, "
        "unigram variant): score every non-English raw-pool document "
        "by sum_t[ln p_en(t) - ln p_raw(t)] with Laplace smoothing "
        "over the union vocabulary, keep the top-100 by length-"
        "normalized weight.  Per-token log-ratios scale to integer "
        "micros BEFORE the per-doc sum (order-free bigint exactness, "
        "the q86/q166 discipline); vocab table broadcasts into the "
        "exploded token stream; one hash(doc_id) partial agg.",
    tags=("llmdata", "sampling", "selection", "documents"),
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import sampling

    docs = load(spark, sf_dir, "documents")
    return sampling.dsir_importance_select(
        docs.where(F.col("lang") != "en"),
        docs.where(F.col("lang") == "en"),
        top_k=100,
    )

# ---------------------------------------------------------------------------
# q176: mutual-best-match record linkage over blocked name candidates
# ---------------------------------------------------------------------------

@register(
    "q176_record_linkage",
    sql="""
    WITH pn AS (
      SELECT p_partkey AS k,
             string_split(lower(p_name), ' ') AS w,
             lower(p_brand) AS b, lower(p_type) AS t,
             'sz' || CAST(p_size AS VARCHAR) AS z
      FROM part
    ),
    sets AS (
      SELECT k, w[2] || '|' || b AS blk,
             list_distinct([w[1], w[2], b, t, z]) AS s,
             len(list_distinct([w[1], w[2], b, t, z])) AS n
      FROM pn
    ),
    l AS (SELECT * FROM sets WHERE k % 2 = 0),
    r AS (SELECT * FROM sets WHERE k % 2 = 1),
    cand AS (
      SELECT l.k AS left_key, r.k AS right_key,
             CAST(len(list_intersect(l.s, r.s)) AS DOUBLE)
               / (l.n + r.n - len(list_intersect(l.s, r.s))) AS jac
      FROM l JOIN r ON l.blk = r.blk
    ),
    f AS (SELECT * FROM cand WHERE jac >= 0.4),
    ranked AS (
      SELECT left_key, right_key, jac,
             row_number() OVER (PARTITION BY left_key
                                ORDER BY jac DESC, right_key) AS rl,
             row_number() OVER (PARTITION BY right_key
                                ORDER BY jac DESC, left_key) AS rr
      FROM f
    )
    SELECT left_key, right_key, CAST(ROUND((jac) * 1e6) AS BIGINT) / 1e6 AS jaccard
    FROM ranked WHERE rl = 1 AND rr = 1
    """,
    doc="Mutual-best-match record linkage (relational.joins."
        "mutual_best_match): link the even-key part registry against "
        "the odd-key one.  Records are 5-token (name words + brand + "
        "type + size) sets; blocking key = (name noun, brand) — the "
        "classic multi-attribute ER blocking that keeps per-block "
        "candidates ~O(block^2 / #blocks), never corpus all-pairs "
        "(single-token blocking on THIS data yields 2.5k-row blocks "
        "and 50M pairs — measured, rejected); exact token-set "
        "Jaccard >= 0.4 scores survivors, then the one-to-one "
        "election: a pair links iff each side is the other's argmax, "
        "ties toward the smaller partner key.  Two row_number windows "
        "with rank-1 pushdown (WindowGroupLimit); the only shuffles "
        "are the block join and the two key-grain exchanges.",
    tags=("relational", "linkage", "join", "part"),
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .joins import mutual_best_match

    toks = F.split(F.lower(F.col("p_name")), " ")
    rec = F.array_distinct(
        F.array(
            toks[0],
            toks[1],
            F.lower(F.col("p_brand")),
            F.lower(F.col("p_type")),
            F.concat(F.lit("sz"), F.col("p_size").cast("string")),
        )
    )
    sets = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.concat(toks[1], F.lit("|"), F.lower(F.col("p_brand"))).alias("blk"),
        rec.alias("s"),
        F.size(rec).alias("n"),
    )
    l = sets.where(F.col("k") % 2 == 0).select(
        F.col("k").alias("left_key"), "blk",
        F.col("s").alias("_ls"), F.col("n").alias("_ln"),
    )
    r = sets.where(F.col("k") % 2 == 1).select(
        F.col("k").alias("right_key"), "blk",
        F.col("s").alias("_rs"), F.col("n").alias("_rn"),
    )
    ni = F.size(F.array_intersect(F.col("_ls"), F.col("_rs")))
    cand = (
        l.join(r, "blk")
        .select(
            "left_key",
            "right_key",
            (ni.cast("double") / (F.col("_ln") + F.col("_rn") - ni)).alias("jac"),
        )
        .where(F.col("jac") >= 0.4)
    )
    return mutual_best_match(cand, "left_key", "right_key", "jac").select(
        "left_key", "right_key", pround("jac", 6).alias("jaccard")
    )

# ---------------------------------------------------------------------------
# q177: GDPR right-to-be-forgotten cascade delete with audit report
# ---------------------------------------------------------------------------

@register(
    "q177_gdpr_cascade_delete",
    sql="""
    WITH erase AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ),
    o AS (
      SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 10 = 0
    ),
    l AS (
      SELECT l.l_orderkey FROM lineitem l
      WHERE EXISTS (SELECT 1 FROM o WHERE o.o_orderkey = l.l_orderkey)
    ),
    o_del AS (
      SELECT o_orderkey FROM o
      WHERE EXISTS (SELECT 1 FROM erase WHERE c_custkey = o_custkey)
    ),
    counts AS (
      SELECT 'pii_customer' AS table_name,
             (SELECT COUNT(*) FROM customer) AS rows_before,
             (SELECT COUNT(*) FROM erase) AS rows_deleted
      UNION ALL
      SELECT 'pii_orders',
             (SELECT COUNT(*) FROM o),
             (SELECT COUNT(*) FROM o_del)
      UNION ALL
      SELECT 'fact_lineitem',
             (SELECT COUNT(*) FROM l),
             (SELECT COUNT(*) FROM l
              WHERE EXISTS (SELECT 1 FROM o_del
                            WHERE o_orderkey = l_orderkey))
    )
    SELECT table_name,
           CAST(rows_before AS BIGINT) AS rows_before,
           CAST(rows_deleted AS BIGINT) AS rows_deleted,
           CAST(rows_before - rows_deleted AS BIGINT) AS rows_after
    FROM counts
    """,
    doc="GDPR right-to-be-forgotten cascade (merge.generic.merge_into "
        "x3): erasure requests (custkey % 97 = 0) delete the customer "
        "rows, every order they own, and every lineitem of those "
        "orders, each via a partition-scoped MERGE ... WHEN MATCHED "
        "THEN DELETE into warehouse tables BUCKETED BY THEIR ERASURE "
        "KEY (customer by custkey, orders by custkey, lineitems by "
        "orderkey — the layout that makes per-subject deletion "
        "O(touched buckets), the lakehouse GDPR pattern).  The "
        "cascade derives each stage's key set BEFORE deleting it; "
        "the audit report grades before/deleted/after per table "
        "against the oracle's set algebra.",
    tags=("merge", "warehouse", "governance", "customer"),
)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..merge import Warehouse
    from ..merge.generic import _bucket_expr, merge_into

    spark_ = spark
    wh = Warehouse(spark_, tempfile.mkdtemp(prefix="q177_gdpr_"))
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(orders.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_linenumber")
    )
    wh.overwrite(
        "pii_customer",
        cust.withColumn("_bucket", _bucket_expr(["c_custkey"])),
        partition_by=["_bucket"],
    )
    wh.overwrite(
        "pii_orders",
        orders.withColumn("_bucket", _bucket_expr(["o_custkey"])),
        partition_by=["_bucket"],
    )
    wh.overwrite(
        "fact_lineitem",
        li.withColumn("_bucket", _bucket_expr(["l_orderkey"])),
        partition_by=["_bucket"],
    )
    def _counts(tables: tuple[str, ...]) -> dict[str, int]:
        # one Spark job for all three table counts instead of three:
        # union a 1-column tag projection of each snapshot and count by
        # tag (schemas differ, so only the literal tag column rides)
        tagged = None
        for t in tables:
            part = wh.read(t).select(F.lit(t).alias("t"))
            tagged = part if tagged is None else tagged.unionByName(part)
        # seed with zeros: an empty snapshot contributes NO group row
        counts = {t: 0 for t in tables}
        for r in tagged.groupBy("t").agg(F.count(F.lit(1)).alias("n")).collect():
            counts[r["t"]] = r["n"]
        return counts

    tables = ("pii_customer", "pii_orders", "fact_lineitem")
    before = _counts(tables)
    erase = cust.where(F.col("c_custkey") % 97 == 0).select("c_custkey")
    # derive the next stage's keys BEFORE the stage deletes them —
    # wh.read pins the pre-merge generation path.  _flip always keeps
    # its pre-flip _CURRENT target (pruning only reaches OLDER
    # generations), so this pinned frame survives exactly the ONE flip
    # the pii_orders merge performs; a second flip on pii_orders
    # before the fact_lineitem merge finishes would prune it
    doomed_orders = (
        wh.read("pii_orders")
        .join(erase, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey")
        .distinct()
    )
    # the three merges touch three DIFFERENT tables with no data
    # dependency left between them (doomed_orders is derived above), so
    # they run concurrently — q41's concurrent-flip pattern; the
    # warehouse publish lock serializes only the microseconds of
    # pointer flips
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        fut_c = pool.submit(
            merge_into, wh, "pii_customer", erase, on="c_custkey",
            delete_condition=F.lit(True), insert=False, bucket_col="_bucket",
        )
        fut_o = pool.submit(
            merge_into, wh, "pii_orders",
            erase.select(F.col("c_custkey").alias("o_custkey")),
            on="o_custkey",
            delete_condition=F.lit(True), insert=False, bucket_col="_bucket",
        )
        fut_l = pool.submit(
            merge_into, wh, "fact_lineitem",
            doomed_orders.select(F.col("o_orderkey").alias("l_orderkey")),
            on="l_orderkey",
            delete_condition=F.lit(True), insert=False, bucket_col="_bucket",
        )
        stats_c, stats_o, stats_l = (
            fut_c.result(), fut_o.result(), fut_l.result()
        )
    after = _counts(tables)
    rows = [
        ("pii_customer", before["pii_customer"], stats_c["deleted"],
         after["pii_customer"]),
        ("pii_orders", before["pii_orders"], stats_o["deleted"],
         after["pii_orders"]),
        ("fact_lineitem", before["fact_lineitem"], stats_l["deleted"],
         after["fact_lineitem"]),
    ]
    return spark_.createDataFrame(
        rows,
        "table_name string, rows_before bigint, rows_deleted bigint, "
        "rows_after bigint",
    )

# ---------------------------------------------------------------------------
# q178: grid-binned spatial within-radius self-join
# ---------------------------------------------------------------------------

@register(
    "q178_spatial_neighbor_join",
    sql="""
    WITH p AS (
      SELECT event_id,
             CAST(round(value * 100) AS BIGINT) AS x,
             (event_id * 37) % 20000 AS y
      FROM events WHERE event_id % 2 = 0
    ),
    c AS (
      SELECT event_id, x, y,
             x // 150 AS cx,  -- DuckDB // floors integers: exact
             y // 150 AS cy
      FROM p
    ),
    offs AS (
      SELECT dx, dy
      FROM (VALUES (-1), (0), (1)) AS ox(dx),
           (VALUES (-1), (0), (1)) AS oy(dy)
    ),
    a9 AS (
      SELECT event_id, x, y, cx + dx AS cx, cy + dy AS cy
      FROM c, offs
    )
    SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
    FROM a9 a JOIN c b ON a.cx = b.cx AND a.cy = b.cy
    WHERE a.event_id < b.event_id
      AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 22500
    """,
    doc="Grid-binned spatial within-radius self-join (relational."
        "joins.grid_neighbor_join): events plotted at integer centi-"
        "unit planar coordinates (x = value scaled, y = deterministic "
        "spread), all pairs within 1.5 units found by binning into "
        "radius-sized cells and joining each point against its 3x3 "
        "cell neighborhood — the Sedona/ST_DWithin plan shape, never "
        "the O(n^2) cross join.  Integer squared-distance filter is "
        "exact at the boundary (no float epsilon); explicit floor "
        "division keeps negative coordinates correct; each "
        "qualifying pair emerges exactly once (single home cell + "
        "unique offset), no dedup pass.",
    tags=("relational", "spatial", "join", "events"),
)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .joins import grid_neighbor_join

    pts = (
        load(spark, sf_dir, "events")
        .where(F.col("event_id") % 2 == 0)
        .select(
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("x"),
            ((F.col("event_id") * 37) % 20000).alias("y"),
        )
    )
    return grid_neighbor_join(pts, "event_id", "x", "y", radius=150)

# ---------------------------------------------------------------------------
# q179: per-label embedding centroid cosine similarity matrix
# ---------------------------------------------------------------------------

@register(
    "q179_centroid_similarity",
    sql="""
    WITH el AS (
      SELECT label AS g, u.i AS d,
             CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1e6) AS BIGINT) AS m
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    sums AS (SELECT g, d, SUM(m) AS s FROM el GROUP BY g, d),
    norms AS (
      SELECT g, SUM(CAST(s AS HUGEINT) * s) AS n2 FROM sums GROUP BY g
    ),
    pairs AS (
      SELECT a.g AS ga, b.g AS gb,
             SUM(CAST(a.s AS HUGEINT) * b.s) AS dot
      FROM sums a JOIN sums b USING (d)
      WHERE a.g <= b.g
      GROUP BY 1, 2
    )
    SELECT ga AS label_a, gb AS label_b,
           CAST(ROUND((CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))) * 1e6) AS BIGINT) / 1e6 AS centroid_cosine
    FROM pairs
    JOIN norms na ON na.g = pairs.ga
    JOIN norms nb ON nb.g = pairs.gb
    """,
    doc="Per-label embedding centroid cosine matrix (llmdata."
        "similarity.centroid_similarity_matrix) — the dataset-"
        "similarity / cluster-drift view.  Cosine's scale invariance "
        "means the mean never materializes: cos(sum_a/n_a, sum_b/n_b) "
        "= cos(sum_a, sum_b), so per-dimension 6dp-micro INTEGER sums "
        "(order-free exact) feed decimal/hugeint dot products and ONE "
        "double division.  Explode emits (label, dim, micros) triples "
        "that partial-agg collapse map-side to |labels| x 64 rows; "
        "the matrix join broadcasts.  Never row-pair-grain.",
    tags=("llmdata", "similarity", "embeddings", "drift"),
)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import similarity

    e = load(spark, sf_dir, "embeddings")
    return similarity.centroid_similarity_matrix(e, "label")

# ---------------------------------------------------------------------------
# q180: trailing 7-day exact distinct users via re-aggregated bitmaps
# ---------------------------------------------------------------------------

@register(
    "q180_trailing_distinct",
    sql="""
    WITH e AS (SELECT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (
      SELECT DISTINCT d + CAST(u.i AS INT) AS day
      FROM e, unnest(generate_series(0, 6)) AS u(i)
      WHERE d + CAST(u.i AS INT) <= (SELECT MAX(d) FROM e)
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS trailing_users
    FROM days JOIN e ON e.d BETWEEN day - 6 AND day
    GROUP BY 1
    """,
    doc="Trailing 7-day exact distinct users per day — the rolling "
        "WAU counter (relational.sketches.trailing_distinct_bitmaps): "
        "(day, word) bit_or bitmaps collapse the raw scan 64x, explode "
        "to the 7 days they cover (gap-proof — no dense day-spine "
        "join), re-OR at (target_day, word) grain, popcount-sum.  The "
        "oracle pays the O(days x window) distinct re-scan the bitmap "
        "shape avoids; both see identical counts.  Partial-agg "
        "shuffles on uniform (day, word) keys only.",
    tags=("relational", "sketch", "bitmap", "events"),
)
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketches import trailing_distinct_bitmaps

    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    out = trailing_distinct_bitmaps(ev, "d", "user_id", window_days=7)
    return out.select(F.col("day").cast("string").alias("day"), "trailing_users")

# ---------------------------------------------------------------------------
# q181: change data feed between warehouse versions (Delta CDF analog)
# ---------------------------------------------------------------------------

@register(
    "q181_table_changes",
    sql="""
    WITH t AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    dels AS (
      SELECT o_orderkey, 'delete' AS change_type, o_orderstatus, price
      FROM t WHERE o_orderkey % 10 = 8
    ),
    upd AS (SELECT * FROM t WHERE o_orderkey % 3 = 0 AND o_orderkey % 10 <> 8),
    pre AS (
      SELECT o_orderkey, 'update_preimage', o_orderstatus, price FROM upd
    ),
    post AS (
      SELECT o_orderkey, 'update_postimage', 'X',
             CAST(price + 1 AS DECIMAL(18,2)) FROM upd
    ),
    ins AS (
      SELECT -o_orderkey - 1, 'insert', 'N', CAST(1.23 AS DECIMAL(18,2))
      FROM t WHERE o_orderkey % 10 = 4
    )
    SELECT o_orderkey, change_type, o_orderstatus AS status,
           CAST(price AS DOUBLE) AS price
    FROM (SELECT * FROM dels UNION ALL SELECT * FROM pre
          UNION ALL SELECT * FROM post UNION ALL SELECT * FROM ins)
    """,
    doc="Change data feed between warehouse versions (merge.cdf."
        "table_changes — the Delta CDF analog over retained snapshot "
        "generations): v1 = the even-key order dim, v2 = after one "
        "generic MERGE applying deletes (key%10=8), updates (key%3=0: "
        "status X, repriced) and inserts (fresh negative keys); the "
        "feed classifies every key via ONE full-outer key join and "
        "emits Delta's four row kinds — deletes/preimages carry v1 "
        "values, inserts/postimages v2 values — with unchanged keys "
        "emitting zero rows (empty typed explode), so output is "
        "O(changes) not O(table).  The oracle reconstructs the same "
        "feed from the change-set algebra.",
    tags=("merge", "warehouse", "cdf", "orders"),
)
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..merge import Warehouse
    from ..merge.cdf import table_changes
    from ..merge.generic import _bucket_expr, merge_into

    DEC2 = "decimal(18,2)"
    t = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 2 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast(DEC2).alias("price"),
        )
    )
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="q181_cdf_"))
    wh.overwrite(
        "dim_orders",
        t.withColumn("_bucket", _bucket_expr(["o_orderkey"])),
        partition_by=["_bucket"],
    )
    v1 = wh.history("dim_orders")[-1]["version"]
    deletes = t.where(F.col("o_orderkey") % 10 == 8).select(
        "o_orderkey",
        F.lit("D").alias("_op"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast(DEC2).alias("price"),
    )
    updates = t.where(
        (F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 10 != 8)
    ).select(
        "o_orderkey",
        F.lit("U").alias("_op"),
        F.lit("X").alias("o_orderstatus"),
        (F.col("price") + 1).cast(DEC2).alias("price"),
    )
    inserts = t.where(F.col("o_orderkey") % 10 == 4).select(
        (-F.col("o_orderkey") - 1).alias("o_orderkey"),
        F.lit("I").alias("_op"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.23).cast(DEC2).alias("price"),
    )
    merge_into(
        wh,
        "dim_orders",
        deletes.unionByName(updates).unionByName(inserts),
        on="o_orderkey",
        update_set={
            "o_orderstatus": F.col("_src_o_orderstatus"),
            "price": F.col("_src_price"),
        },
        update_condition=F.col("_src__op") == "U",
        delete_condition=F.col("_src__op") == "D",
        insert=True,
        bucket_col="_bucket",
        collect_stats=False,
    )
    v2 = wh.history("dim_orders")[-1]["version"]
    feed = table_changes(wh, "dim_orders", v1, v2, on="o_orderkey")
    return feed.select(
        "o_orderkey",
        F.col("_change_type").alias("change_type"),
        F.col("o_orderstatus").alias("status"),
        F.col("price").cast("double").alias("price"),
    )

# ---------------------------------------------------------------------------
# q182: semi-structured JSON column analytics
# ---------------------------------------------------------------------------

@register(
    "q182_json_properties",
    sql="""
    WITH x AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events
    ),
    n AS (
      SELECT event_type, k,
             '{"ids": [' || CAST(k AS VARCHAR) || ', '
               || CAST(k * 2 AS VARCHAR) || ']}' AS nested
      FROM x
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
           CAST(ROUND((CAST(SUM(k) AS DOUBLE) / COUNT(*)) * 1e6) AS BIGINT) / 1e6 AS avg_k,
           CAST(COUNT(*) FILTER (WHERE k >= 50) AS BIGINT) AS n_high,
           CAST(SUM(CAST(json_extract_string(nested, '$.ids[1]')
                         AS BIGINT)) AS BIGINT) AS sum_second_id
    FROM n GROUP BY event_type
    """,
    doc="Semi-structured JSON property analytics over the events "
        "props column: JSON-path extraction (get_json_object — "
        "Catalyst's codegen JSON parser, no UDF), typed casts, and a "
        "nested-array path probe ($.ids[1]) through a synthesized "
        "nested document, aggregated per event_type (exact distinct, "
        "integer-sum-derived mean).  The whole extraction is a "
        "shuffle-free projection; one partial-agg exchange on "
        "event_type.  DuckDB's json_extract_string grades byte-equal "
        "semantics.",
    tags=("relational", "json", "events"),
)
def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    nested = F.concat(
        F.lit('{"ids": ['),
        k.cast("string"),
        F.lit(", "),
        (k * 2).cast("string"),
        F.lit("]}"),
    )
    return (
        ev.select(
            "event_type",
            k.alias("k"),
            F.get_json_object(nested, "$.ids[1]").cast("bigint").alias("_id1"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("k").alias("n_distinct_k"),
            pround(F.sum("k").cast("double") / F.count(F.lit(1)), 6).alias("avg_k"),
            F.count(F.when(F.col("k") >= 50, 1)).alias("n_high"),
            F.sum("_id1").cast("bigint").alias("sum_second_id"),
        )
    )

# ---------------------------------------------------------------------------
# q183: multi-source BFS hop distances (fixed-round frontier expansion)
# ---------------------------------------------------------------------------

def _bfs_iter_sql(i: int) -> str:
    return f"""
    f{i} AS (
      SELECT DISTINCT e.dst AS id
      FROM e JOIN f{i - 1} f ON e.src = f.id
      WHERE e.dst NOT IN (SELECT id FROM v{i - 1})
    ),
    v{i} AS (SELECT id FROM v{i - 1} UNION ALL SELECT id FROM f{i})"""


def _bfs_stats_sql(i: int) -> str:
    return f"""
    SELECT {i} AS dist,
           CAST(COUNT(*) FILTER (WHERE id % 2 = 0) AS BIGINT) AS n_parts,
           CAST(COUNT(*) FILTER (WHERE id % 2 = 1) AS BIGINT) AS n_suppliers
    FROM f{i} HAVING COUNT(*) > 0"""


@register(
    "q183_bfs_hops",
    sql=f"""
    WITH e AS (
      SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
      UNION
      SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM lineitem
    ),
    f0 AS (
      SELECT DISTINCT s_suppkey * 2 + 1 AS id FROM supplier
      WHERE s_suppkey % 50 = 0
    ),
    v0 AS (SELECT id FROM f0),
    {",".join(_bfs_iter_sql(i) for i in range(1, 5))}
    {" UNION ALL ".join(_bfs_stats_sql(i) for i in range(0, 5))}
    """,
    doc="Multi-source BFS over the bipartite part<->supplier graph "
        "(relational.graph.bfs_hops; q134/q169's parity-tagged node "
        "ids): seed suppliers (suppkey % 50 = 0) expand 4 hops; the "
        "per-distance frontier census (n_parts, n_suppliers) is the "
        "blast-radius / reachability primitive.  Each round joins "
        "edges against the CURRENT FRONTIER only (frontier-grain "
        "work), anti-joins visited, and localCheckpoints so the "
        "census union never recomputes earlier rounds; fixed rounds "
        "keep the DuckDB twin an exact chained-CTE unroll.",
    tags=("graph", "bfs", "lineitem", "supplier"),
)
def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph import bfs_hops, bipartite_edges

    edges = bipartite_edges(load(spark, sf_dir, "lineitem"))
    seeds = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % 50 == 0)
        .select((F.col("s_suppkey") * 2 + 1).alias("id"))
        .distinct()
    )
    hops = bfs_hops(edges, seeds, rounds=4)
    return hops.groupBy("dist").agg(
        F.count(F.when(F.col("id") % 2 == 0, 1)).alias("n_parts"),
        F.count(F.when(F.col("id") % 2 == 1, 1)).alias("n_suppliers"),
    )

# ---------------------------------------------------------------------------
# q184: TPC-H Q7 volume shipping (bidirectional two-nation trade)
# ---------------------------------------------------------------------------

@register(
    "q184_volume_shipping",
    sql="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(SUM(volume) AS DECIMAL(24,6)) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    )
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 volume shipping: bidirectional trade revenue "
        "between two nations by ship year.  Physical shape: the two "
        "nation dims and supplier broadcast; lineitem-orders-customer "
        "chain on their natural keys; decimal-exact volume "
        "(price x (1 - discount) in decimal(18,2) x (18,4)) summed "
        "then emitted as double — the q01/q02 money discipline.  The "
        "nation-pair predicate prunes most of the fact AFTER the "
        "cheap broadcast joins attach nation names.",
    tags=("relational", "tpch", "lineitem"),
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import emit, money

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_ck"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            emit(
                F.sum(
                    money("l_extendedprice")
                    * (1 - F.col("l_discount").cast("decimal(18,4)"))
                ).cast("decimal(24,6)")
            ).alias("revenue")
        )
    )

# ---------------------------------------------------------------------------
# q185: functional-dependency profiling
# ---------------------------------------------------------------------------

@register(
    "q185_fd_profile",
    sql="""
    WITH p1 AS (
      SELECT 'source' AS determinant, 'lang' AS dependent,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(COUNT(*) FILTER (WHERE nd > 1) AS BIGINT) AS n_violating,
             CAST(CASE WHEN COUNT(*) FILTER (WHERE nd > 1) = 0
                       THEN 1 ELSE 0 END AS INT) AS fd_holds
      FROM (SELECT source, COUNT(DISTINCT lang) AS nd
            FROM documents GROUP BY source)
    ),
    p2 AS (
      SELECT 'doc_id', 'text',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE nd > 1) AS BIGINT),
             CAST(CASE WHEN COUNT(*) FILTER (WHERE nd > 1) = 0
                       THEN 1 ELSE 0 END AS INT)
      FROM (SELECT doc_id, COUNT(DISTINCT text) AS nd
            FROM documents GROUP BY doc_id)
    ),
    p3 AS (
      SELECT 'n_chars', 'lang',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE nd > 1) AS BIGINT),
             CAST(CASE WHEN COUNT(*) FILTER (WHERE nd > 1) = 0
                       THEN 1 ELSE 0 END AS INT)
      FROM (SELECT n_chars, COUNT(DISTINCT lang) AS nd
            FROM documents GROUP BY n_chars)
    )
    SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3
    """,
    doc="Functional-dependency profiling (relational.sketches."
        "fd_profile — the Metanome-style FD screen): for candidate "
        "determinant -> dependent pairs over documents (source->lang, "
        "doc_id->text, n_chars->lang), count determinant groups, "
        "violating groups (>1 distinct dependent), and whether the FD "
        "holds — the check that gates surrogate keys and safe "
        "denormalization.  Per pair: one (det, dep) distinct partial "
        "agg + a det-grain rollup; never a self-join.",
    tags=("relational", "profiling", "documents"),
)
def q185(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketches import fd_profile

    d = load(spark, sf_dir, "documents")
    return fd_profile(
        d, [("source", "lang"), ("doc_id", "text"), ("n_chars", "lang")]
    )

# ---------------------------------------------------------------------------
# q186: late-arriving dimension backfill (placeholder FK + merge update)
# ---------------------------------------------------------------------------

@register(
    "q186_late_dim_backfill",
    sql="""
    WITH f AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    d1 AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0),
    d2 AS (SELECT c_custkey FROM customer
           WHERE c_custkey % 3 = 0 AND c_custkey % 9 <> 0),
    waved AS (
      SELECT o_orderkey, price,
             CASE WHEN EXISTS (SELECT 1 FROM d1
                               WHERE c_custkey = o_custkey) THEN 1
                  WHEN EXISTS (SELECT 1 FROM d2
                               WHERE c_custkey = o_custkey) THEN 2
                  ELSE -1 END AS resolve_wave
      FROM f
    )
    SELECT resolve_wave,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(price) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM waved GROUP BY 1
    """,
    doc="Late-arriving dimension backfill — the reference's "
        "placeholder-FK pattern (P8, staging/split.py literal FKs) "
        "generalized to the lakehouse two-wave shape: wave-1 facts "
        "land with fk_cust = -1 where the customer dim row has not "
        "arrived; when the late dim batch lands, ONE merge_into "
        "updates exactly the pending rows (placeholder-gated update "
        "condition, partition-scoped rewrite), stamping resolve_wave "
        "= 2; facts whose dim never arrives stay -1.  The audit "
        "grades per-wave counts and decimal-exact totals; the oracle "
        "replays the same resolution algebra with EXISTS joins, so "
        "FK-dangling facts grade faithfully too.",
    tags=("merge", "warehouse", "etl", "orders"),
)
def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..merge import Warehouse
    from ..merge.generic import _bucket_expr, merge_into

    DEC2 = "decimal(18,2)"
    facts = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast(DEC2).alias("price"),
        )
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    d1 = cust.where(F.col("c_custkey") % 3 != 0)
    d2 = cust.where((F.col("c_custkey") % 3 == 0) & (F.col("c_custkey") % 9 != 0))
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="q186_latedim_"))
    wave1 = facts.join(
        F.broadcast(d1), facts.o_custkey == d1.c_custkey, "left"
    ).select(
        "o_orderkey",
        "o_custkey",
        "price",
        F.coalesce("c_custkey", F.lit(-1)).cast("long").alias("fk_cust"),
        F.when(F.col("c_custkey").isNotNull(), 1)
        .otherwise(-1)
        .cast("int")
        .alias("resolve_wave"),
    )
    wh.overwrite(
        "fact_orders",
        wave1.withColumn("_bucket", _bucket_expr(["o_orderkey"])),
        partition_by=["_bucket"],
    )
    # late dim batch arrives: backfill EXACTLY the pending rows
    pending = wh.read("fact_orders").where(F.col("fk_cust") == -1)
    backfill = pending.join(
        F.broadcast(d2), pending.o_custkey == d2.c_custkey
    ).select("o_orderkey", F.col("c_custkey").alias("new_fk"))
    merge_into(
        wh,
        "fact_orders",
        backfill,
        on="o_orderkey",
        update_set={
            "fk_cust": F.col("_src_new_fk"),
            "resolve_wave": F.lit(2).cast("int"),
        },
        update_condition=F.col("fk_cust") == -1,
        insert=False,
        bucket_col="_bucket",
        collect_stats=False,
    )
    return (
        wh.read("fact_orders")
        .groupBy("resolve_wave")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast(DEC2).cast("double").alias("total_price"),
        )
    )

# ---------------------------------------------------------------------------
# q187: bitemporal read (SCD2 valid time x warehouse transaction time)
# ---------------------------------------------------------------------------

@register(
    "q187_bitemporal_read",
    sql="""
    WITH base AS (
      SELECT p_partkey, CAST(p_retailprice AS DECIMAL(18,2)) AS price
      FROM part WHERE p_partkey % 100 = 0
    )
    SELECT p_partkey,
           CAST(price AS DOUBLE) AS price_as_first_known,
           CAST(CASE WHEN p_partkey % 300 = 0
                     THEN CAST(price + 1 AS DECIMAL(18,2))
                     ELSE price END AS DOUBLE) AS price_as_now_known
    FROM base
    """,
    doc="Bitemporal dimension read — SCD2 VALID time composed with "
        "warehouse TRANSACTION time (merge.scd.scd2_upsert + "
        "Warehouse version reads): two scd2_upsert batches build the "
        "price history (reprice of every 3rd retained part effective "
        "1995-01-01), each also committing a snapshot GENERATION; "
        "the query answers 'what did we BELIEVE (transaction time = "
        "first generation vs now) the price was ON 1996-06-01 (valid "
        "time)?' — the correction-audit primitive: the first "
        "generation does not yet KNOW about the reprice, while the "
        "current one resolves the same valid date to the new "
        "version.  Both reads are interval filters over a "
        "version-pinned snapshot; no join at all.",
    tags=("merge", "warehouse", "scd2", "part"),
)
def q187(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..merge import Warehouse
    from ..merge.scd import scd2_upsert

    DEC2 = "decimal(18,2)"
    base = (
        load(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 100 == 0)
        .select(
            "p_partkey", F.col("p_retailprice").cast(DEC2).alias("price")
        )
    )
    reprice = base.where(F.col("p_partkey") % 300 == 0).select(
        "p_partkey", (F.col("price") + 1).cast(DEC2).alias("price")
    )
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="q187_bitemp_"))
    scd2_upsert(wh, "part_dim", base, "p_partkey", ["price"], "1992-01-01")
    v1 = wh.history("part_dim")[-1]["version"]
    scd2_upsert(wh, "part_dim", reprice, "p_partkey", ["price"], "1995-01-01")

    def as_of(df: DataFrame, valid_date: str) -> DataFrame:
        covered = (F.col("valid_from") <= F.lit(valid_date)) & (
            F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(valid_date))
        )
        return df.where(covered).select("p_partkey", "price")

    first_known = as_of(wh.read("part_dim", version=v1), "1996-06-01")
    now_known = as_of(wh.read("part_dim"), "1996-06-01")
    return (
        first_known.withColumnRenamed("price", "_p1")
        .join(now_known.withColumnRenamed("price", "_p2"), "p_partkey")
        .select(
            "p_partkey",
            F.col("_p1").cast("double").alias("price_as_first_known"),
            F.col("_p2").cast("double").alias("price_as_now_known"),
        )
    )

# ---------------------------------------------------------------------------
# q188: Pareto 80/20 revenue concentration per nation
# ---------------------------------------------------------------------------

@register(
    "q188_pareto_concentration",
    sql="""
    WITH cust_rev AS (
      SELECT c.c_nationkey AS nationkey, c.c_custkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    w AS (
      SELECT nationkey, rev,
             COALESCE(SUM(rev) OVER (
               PARTITION BY nationkey ORDER BY rev DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS DECIMAL(18,2))) AS cum_prev,
             SUM(rev) OVER (PARTITION BY nationkey) AS total
      FROM cust_rev
    )
    SELECT nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(*) FILTER (WHERE cum_prev * 10 < total * 8)
                AS BIGINT) AS n_top80,
           CAST(CAST(MIN(total) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
    FROM w GROUP BY 1
    """,
    doc="Pareto 80/20 revenue concentration per nation: how many of a "
        "nation's customers (ranked by spend) carry the first 80% of "
        "its revenue — the concentration-risk / whale-detection "
        "report.  ALL windows run on the (nation, customer) AGGREGATE "
        "grain (q166's distribution-grain law — never a row-grain "
        "global sort), the 80% threshold compares decimal-exact "
        "integers (cum_prev*10 < total*8: no 0.8 float), and ties "
        "rank deterministically by customer key.  One fact partial "
        "agg + one nation-grain window exchange.",
    tags=("relational", "window", "orders", "customer"),
)
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    DEC2 = "decimal(18,2)"
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust_rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC2)).cast(DEC2).alias("rev"))
    )
    wo = Window.partitionBy("nationkey").orderBy(
        F.desc("rev"), F.asc("c_custkey")
    )
    w = cust_rev.select(
        "nationkey",
        "rev",
        F.coalesce(
            F.sum("rev").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast(DEC2),
        ).alias("cum_prev"),
        F.sum("rev").over(Window.partitionBy("nationkey")).alias("total"),
    )
    return w.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count(
            F.when(F.col("cum_prev") * 10 < F.col("total") * 8, 1)
        ).alias("n_top80"),
        F.min("total").cast(DEC2).cast("double").alias("revenue"),
    )

# ---------------------------------------------------------------------------
# q189: incremental materialized-view maintenance (delta merge)
# ---------------------------------------------------------------------------

@register(
    "q189_incremental_mv",
    sql="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders GROUP BY 1
    """,
    doc="Incremental materialized-view maintenance: the per-priority "
        "order rollup is kept as a warehouse table of MERGEABLE "
        "partial aggregates (count + decimal sum — a commutative "
        "monoid), and a new ingest batch updates it by aggregating "
        "ONLY THE DELTA and applying one merge_into (matched groups: "
        "n += delta_n, total += delta_total; unseen groups insert) — "
        "O(delta + |groups|) per refresh, never a full recompute.  "
        "The oracle IS the full recompute over base ∪ delta, so the "
        "gate proves the incremental path equals the from-scratch "
        "answer.",
    tags=("merge", "warehouse", "mv", "orders"),
)
def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..merge import Warehouse
    from ..merge.generic import _bucket_expr, merge_into

    DEC2 = "decimal(18,2)"
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_totalprice").cast(DEC2).alias("p")
    )

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("p").cast(DEC2).alias("total_price"),
        )

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="q189_mv_"))
    wh.overwrite(
        "mv_orders",
        rollup(o.where(F.col("o_orderkey") % 3 != 0)).withColumn(
            "_bucket", _bucket_expr(["o_orderpriority"])
        ),
        partition_by=["_bucket"],
    )
    delta = rollup(o.where(F.col("o_orderkey") % 3 == 0))
    merge_into(
        wh,
        "mv_orders",
        delta,
        on="o_orderpriority",
        update_set={
            "n_orders": F.col("n_orders") + F.col("_src_n_orders"),
            "total_price": (
                F.col("total_price") + F.col("_src_total_price")
            ).cast(DEC2),
        },
        insert=True,
        bucket_col="_bucket",
        collect_stats=False,
    )
    return wh.read("mv_orders").select(
        "o_orderpriority",
        "n_orders",
        F.col("total_price").cast("double").alias("total_price"),
    )

# ---------------------------------------------------------------------------
# q190: linear multi-touch attribution (integer-exact credit split)
# ---------------------------------------------------------------------------

@register(
    "q190_linear_attribution",
    sql="""
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type, value,
             CASE WHEN epoch_us(ts) // 1000000
                       - LAG(epoch_us(ts) // 1000000)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    p AS (SELECT user_id, sid, event_id AS pid, ts AS pts, cents
          FROM sess WHERE event_type = 'purchase'),
    t AS (SELECT user_id, sid, event_id AS tid, ts AS tts,
                 event_type AS touchpoint
          FROM sess WHERE event_type <> 'purchase'),
    pairs AS (
      SELECT p.user_id, p.sid, p.pid, p.cents, t.touchpoint, t.tts, t.tid
      FROM t JOIN p USING (user_id, sid)
      WHERE t.tts < p.pts OR (t.tts = p.pts AND t.tid < p.pid)
    ),
    ranked AS (
      SELECT touchpoint, cents,
             COUNT(*) OVER (PARTITION BY user_id, sid, pid) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id, sid, pid
                                ORDER BY tts, tid) AS rn
      FROM pairs
    ),
    att AS (
      SELECT touchpoint, CAST(COUNT(*) AS BIGINT) AS n_credits,
             SUM((cents * 10000) // n
                 + CASE WHEN rn = 1
                        THEN cents * 10000 - ((cents * 10000) // n) * n
                        ELSE 0 END) AS micros
      FROM ranked GROUP BY touchpoint
    ),
    unatt AS (
      SELECT '__unattributed__' AS touchpoint,
             CAST(COUNT(*) AS BIGINT) AS n_credits,
             SUM(cents * 10000) AS micros
      FROM p
      WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.pid = p.pid)
      HAVING COUNT(*) > 0
    )
    SELECT touchpoint, n_credits,
           CAST(ROUND((CAST(micros AS DOUBLE) / 1e6) * 1e6) AS BIGINT) / 1e6 AS attributed_value
    FROM (SELECT * FROM att UNION ALL SELECT * FROM unatt)
    """,
    doc="Linear multi-touch attribution (relational.timeseries."
        "linear_attribution): every purchase's value splits EQUALLY "
        "over its same-session preceding touchpoints — q93's "
        "last-touch counterpart on the multi-touch side.  Credits are "
        "INTEGER dollar-micros with the remainder to the earliest "
        "touch (largest-remainder), so per-goal credits sum exactly "
        "and both engines agree bit-for-bit; goals with no preceding "
        "touch report under __unattributed__ (zero-row-safe via "
        "grouped aggregation on both sides).  Touch-goal expansion "
        "joins within (user, session) only; three same-key-family "
        "shuffles.",
    tags=("timeseries", "events", "attribution"),
)
def q190(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .timeseries import linear_attribution

    return linear_attribution(load(spark, sf_dir, "events"))

# ---------------------------------------------------------------------------
# q191: floor-at-zero running balance (Skorokhod reflection)
# ---------------------------------------------------------------------------

@register(
    "q191_reflected_balance",
    sql="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type IN ('purchase', 'signup')
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
      FROM events
    ),
    x AS (
      SELECT user_id, ts, event_id, delta,
             SUM(delta) OVER w AS cum
      FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING)
    ),
    b AS (
      SELECT user_id, ts, event_id, delta,
             cum - LEAST(CAST(0 AS BIGINT), MIN(cum) OVER w) AS balance
      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_moves,
           CAST(MAX(balance) AS BIGINT) AS peak_balance,
           CAST(SUM(CASE WHEN balance = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_floor_hits,
           CAST(MAX(CASE WHEN rn = 1 THEN balance END) AS BIGINT)
             AS final_balance
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM b)
    GROUP BY user_id
    """,
    doc="Floor-at-zero running balance per user (relational."
        "timeseries.reflected_running_balance): credits from "
        "purchases/signups, debits from the rest, balance clipped at "
        "zero — the non-associative recurrence b_t = max(0, b_{t-1} + "
        "d_t) computed WITHOUT a stateful scan via the Skorokhod "
        "reflection closed form B = X - least(0, running_min(X)) "
        "(property-tested against the sequential fold).  Integer "
        "cents end-to-end; one hash(user) exchange, both windows "
        "share one sort; the per-user report (peak, floor hits, "
        "final) grades every balance through aggregates.",
    tags=("timeseries", "events", "window"),
)
def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .timeseries import reflected_running_balance

    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type").isin("purchase", "signup"), cents
        )
        .otherwise(-cents)
        .alias("delta"),
    )
    b = reflected_running_balance(d)
    w_last = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        b.withColumn("_rn", F.row_number().over(w_last))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_moves"),
            F.max("balance").alias("peak_balance"),
            F.sum(F.when(F.col("balance") == 0, 1).otherwise(0)).alias(
                "n_floor_hits"
            ),
            F.max(F.when(F.col("_rn") == 1, F.col("balance"))).alias(
                "final_balance"
            ),
        )
    )

# ---------------------------------------------------------------------------
# q192: week-over-week rank movers (trending report)
# ---------------------------------------------------------------------------

@register(
    "q192_rank_movers",
    sql="""
    WITH weekly AS (
      SELECT date_trunc('week', l_shipdate) AS wk, l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
      SELECT wk, l_partkey, rev,
             ROW_NUMBER() OVER (PARTITION BY wk
                                ORDER BY rev DESC, l_partkey) AS rnk
      FROM weekly
    )
    SELECT CAST(c.wk AS VARCHAR) AS week, c.l_partkey,
           CAST(p.rnk AS BIGINT) AS prev_rank,
           CAST(c.rnk AS BIGINT) AS rank,
           CAST(p.rnk - c.rnk AS BIGINT) AS climb
    FROM ranked c
    JOIN ranked p
      ON p.l_partkey = c.l_partkey AND p.wk = c.wk - INTERVAL 7 DAY
    WHERE p.rnk - c.rnk > 0
    ORDER BY climb DESC, week, c.l_partkey
    LIMIT 30
    """,
    doc="Week-over-week rank movers: per-week part revenue ranks "
        "(deterministic row_number ties toward the smaller key), "
        "self-joined to the previous week on (part, week-7d), top-30 "
        "climbers — the trending-items report.  Ranks live on the "
        "(week, part) AGGREGATE grain (q166's distribution-grain "
        "law); the mover join is key-grain; decimal-exact revenue "
        "feeds the rank only, never a float compare.",
    tags=("relational", "window", "lineitem", "trending"),
)
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    DEC2 = "decimal(18,2)"
    li = load(spark, sf_dir, "lineitem")
    weekly = li.groupBy(
        F.date_trunc("week", "l_shipdate").cast("date").alias("wk"),
        "l_partkey",
    ).agg(F.sum(F.col("l_extendedprice").cast(DEC2)).cast(DEC2).alias("rev"))
    ranked = weekly.select(
        "wk",
        "l_partkey",
        F.row_number()
        .over(
            Window.partitionBy("wk").orderBy(F.desc("rev"), F.asc("l_partkey"))
        )
        .alias("rnk"),
    )
    c = ranked.select(
        F.col("wk").alias("_cw"), "l_partkey", F.col("rnk").alias("rank")
    )
    p = ranked.select(
        F.col("wk").alias("_pw"),
        F.col("l_partkey").alias("_pk"),
        F.col("rnk").alias("prev_rank"),
    )
    return (
        c.join(
            p,
            (F.col("_pk") == F.col("l_partkey"))
            & (F.col("_pw") == F.date_sub(F.col("_cw"), 7)),
        )
        .where(F.col("prev_rank") - F.col("rank") > 0)
        .select(
            F.col("_cw").cast("string").alias("week"),
            "l_partkey",
            F.col("prev_rank").cast("bigint").alias("prev_rank"),
            F.col("rank").cast("bigint").alias("rank"),
            (F.col("prev_rank") - F.col("rank")).cast("bigint").alias("climb"),
        )
        .orderBy(F.desc("climb"), F.asc("week"), F.asc("l_partkey"))
        .limit(30)
    )

# ---------------------------------------------------------------------------
# q193: video frame-sampling schedule through the production seam
# ---------------------------------------------------------------------------

@register(
    "q193_frame_sampling",
    sql="""
    WITH d AS (
      SELECT doc_id, 1 + doc_id % 127 AS dur FROM documents
    )
    SELECT doc_id,
           CAST(u.i AS INT) AS frame_index,
           CAST(u.i * 10 AS INT) AS ts_offset_s
    FROM d, unnest(generate_series(0, (dur - 1) // 10)) AS u(i)
    """,
    doc="Video frame-sampling schedule through the production seam "
        "(llmdata.multimodal.sample_frames): every doc_id synthesizes "
        "a REAL ISO-BMFF container (ftyp + moov/mvhd v0, timescale "
        "1000, id-derived duration 1 + id % 127 s, one trak), the "
        "mapInPandas sampler decodes the duration with the stdlib "
        "header codec and fans out one row per 10 s frame (1->N "
        "iterator contract, bounded memory), and the oracle "
        "recomputes the schedule arithmetically — so the graded "
        "surface is the real container parse + fan-out shape, while "
        "frame bytes stay the deterministic stub behind the ffmpeg "
        "seam.  Completes the multimodal decode matrix: image "
        "headers (q97/q103), audio (q98), resize geometry (q110), "
        "and now video frame scheduling, all driver-gated.",
    tags=("llmdata", "multimodal", "video", "documents"),
)
def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..llmdata.multimodal import sample_frames

    d = load(spark, sf_dir, "documents").select("doc_id")

    def synth(it):
        import struct

        def box(t, payload):
            return struct.pack(">I", 8 + len(payload)) + t + payload

        def make_mp4(dur_s):
            mvhd = box(
                b"mvhd",
                b"\x00" * 12 + struct.pack(">I", 1000)
                + struct.pack(">I", dur_s * 1000),
            )
            return box(b"ftyp", b"isom\x00\x00\x02\x00") + box(
                b"moov", mvhd + box(b"trak", b"")
            )

        for pdf in it:
            yield pd.DataFrame(
                {
                    "path": pdf["doc_id"].astype(str),
                    "content": [
                        make_mp4(1 + int(i) % 127) for i in pdf["doc_id"]
                    ],
                }
            )

    blobs = d.mapInPandas(synth, "path string, content binary")
    frames = sample_frames(blobs, every_n_seconds=10)
    return frames.select(
        F.col("path").cast("long").alias("doc_id"),
        "frame_index",
        "ts_offset_s",
    )

# ---------------------------------------------------------------------------
# q196: timezone-aware local-time activity rollup
# ---------------------------------------------------------------------------

@register(
    "q196_local_time_rollup",
    sql="""
    WITH z AS (
      SELECT unnest(['America/New_York', 'Asia/Kathmandu']) AS tz
    ),
    loc AS (
      SELECT tz,
             CAST(timezone(tz, ts AT TIME ZONE 'UTC') AS TIMESTAMP) AS lts,
             value
      FROM events, z
    )
    SELECT tz,
           CAST(CAST(lts AS DATE) AS VARCHAR) AS local_date,
           CAST(hour(lts) AS INT) AS local_hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total_value
    FROM loc GROUP BY 1, 2, 3
    """,
    doc="Timezone-aware local-time activity rollup: UTC event "
        "timestamps rendered in IANA zones — America/New_York (DST-"
        "switching; the spring-forward gap was verified identical in "
        "both engines) and Asia/Kathmandu (+05:45, a non-whole-hour "
        "offset that catches hour-truncation shortcuts) — then "
        "aggregated per (zone, local date, local hour).  Conversion "
        "is a codegen projection (from_utc_timestamp); one partial-"
        "agg exchange over the cell grain.  The cross-engine trap "
        "this pins: both sides must treat the stored naive timestamp "
        "as a UTC INSTANT (DuckDB: ts AT TIME ZONE 'UTC' before "
        "timezone()), not as zone-local wall time.",
    tags=("relational", "timezone", "events"),
)
def q196(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    z = F.explode(F.array(F.lit("America/New_York"), F.lit("Asia/Kathmandu")))
    loc = ev.select(z.alias("tz"), "ts", "value").select(
        "tz",
        F.from_utc_timestamp(F.col("ts"), F.col("tz")).alias("lts"),
        "value",
    )
    return loc.groupBy(
        "tz",
        F.col("lts").cast("date").cast("string").alias("local_date"),
        F.hour("lts").cast("int").alias("local_hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("total_value"),
    )

# ---------------------------------------------------------------------------
# q197: time-weighted average value per user (TWAP)
# ---------------------------------------------------------------------------

@register(
    "q197_time_weighted_avg",
    sql="""
    WITH t AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) // 1000000 AS sec,
             LEAD(epoch_us(ts) // 1000000)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    g AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             SUM(CASE WHEN nxt IS NULL THEN 0 ELSE nxt - sec END) AS span_s,
             SUM(CASE WHEN nxt IS NULL THEN 0
                      ELSE cents * (nxt - sec) END) AS wsum
      FROM t GROUP BY user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(span_s AS BIGINT) AS span_s,
           CASE WHEN span_s = 0 THEN NULL
                ELSE CAST(ROUND((CAST(wsum AS DOUBLE) / span_s / 100) * 1e6) AS BIGINT) / 1e6 END
             AS twap
    FROM g
    """,
    doc="Time-weighted average value per user (TWAP — the telemetry/"
        "finance averaging that a plain mean gets wrong when samples "
        "are irregular): each event's value HOLDS until the user's "
        "next event (LOCF segments), weight = segment seconds, twap = "
        "sum(cents x dt) / total observed seconds.  Integer cents x "
        "integer seconds keep every product and sum exact bigint in "
        "any order; ONE division at the end (NULL for single-event "
        "users — zero observed span).  One hash(user) window exchange "
        "+ one partial agg on the same key.",
    tags=("timeseries", "events", "window"),
)
def q197(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    sec = F.expr("unix_micros(ts) div 1000000")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    t = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        sec.alias("sec"),
        F.lead(sec).over(w).alias("nxt"),
    )
    dt = F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(
        F.col("nxt") - F.col("sec")
    )
    g = t.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dt).cast("bigint").alias("span_s"),
        F.sum(F.col("cents") * dt).alias("wsum"),
    )
    return g.select(
        "user_id",
        "n_events",
        "span_s",
        F.when(F.col("span_s") == 0, F.lit(None).cast("double"))
        .otherwise(
            pround(F.col("wsum").cast("double") / F.col("span_s") / 100, 6)
        )
        .alias("twap"),
    )

# ---------------------------------------------------------------------------
# q198: per-key rate-limit / quota filter
# ---------------------------------------------------------------------------

@register(
    "q198_rate_limit_quota",
    sql="""
    WITH ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(COUNT(*) FILTER (WHERE rn <= 3) AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (WHERE rn > 3) AS BIGINT) AS n_dropped,
           CAST(COUNT(DISTINCT CASE WHEN rn > 3 THEN user_id END)
                AS BIGINT) AS n_throttled_users
    FROM ranked GROUP BY 1
    """,
    doc="Per-key rate-limit / quota filter: keep each user's first 3 "
        "events per day (deterministic (ts, event_id) order), report "
        "kept/dropped/throttled-users per day — the ingestion-quota "
        "and bot-damping primitive (the same shape caps per-domain "
        "pages in a crawl).  One (user, day) window exchange; the "
        "quota predicate is a row_number filter that WindowGroupLimit "
        "can push into the sort at scale.",
    tags=("relational", "quota", "events", "window"),
)
def q198(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    ranked = ev.select(
        "user_id",
        day.alias("day"),
        F.row_number().over(
            Window.partitionBy("user_id", day).orderBy(
                F.col("ts"), F.col("event_id")
            )
        ).alias("rn"),
    )
    return ranked.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.count(F.when(F.col("rn") <= 3, 1)).alias("n_kept"),
        F.count(F.when(F.col("rn") > 3, 1)).alias("n_dropped"),
        F.countDistinct(
            F.when(F.col("rn") > 3, F.col("user_id"))
        ).alias("n_throttled_users"),
    )

# ---------------------------------------------------------------------------
# q199: cross-source duplication matrix (who copies from whom)
# ---------------------------------------------------------------------------

@register(
    "q199_source_copy_matrix",
    sql="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, greatest(len(t) - 2, 1))]) AS g
      FROM toks
    ),
    sizes AS (SELECT doc_id, len(g) AS n FROM sh),
    posts AS (SELECT doc_id, len(g) AS n, unnest(g) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
      FROM posts a JOIN posts b
        ON a.s = b.s AND a.doc_id < b.doc_id
       AND least(a.n, b.n) >= 0.7 * greatest(a.n, b.n) - 1e-9
      GROUP BY 1, 2
    ),
    dup_pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.7
    )
    SELECT least(da.source, db.source) AS source_lo,
           greatest(da.source, db.source) AS source_hi,
           CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
    FROM dup_pairs
    JOIN documents da ON da.doc_id = id_a
    JOIN documents db ON db.doc_id = id_b
    GROUP BY 1, 2
    """,
    doc="Cross-source duplication matrix — which sources copy from "
        "which: verified near-dup pairs (MinHash-LSH candidates at "
        "16x2 bands, exact shingle-Jaccard >= 0.7 verify — the "
        "VERIFY stage is hash-family-independent; candidate recall "
        "misses a boundary 0.7-pair with P ~ 2e-5 at 16x2, validated "
        "equal to the all-pairs oracle at both graded SFs, the q25 "
        "contract) roll up to unordered (source, source) cells.  The "
        "crawl-governance view that decides per-source dedup "
        "priorities and licensing exposure; diagonal cells = intra-"
        "source duplication.  Pair mining stays postings/band grain "
        "(q25's machinery); the matrix is a broadcast source join "
        "over the small verified-pair set.",
    tags=("llmdata", "dedup", "governance", "documents"),
)
def q199(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import dedup

    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(docs, bands=16).where(
        F.col("jaccard") >= 0.7
    )
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa"))
    b = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb"))
    return (
        pairs.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .groupBy(
            F.least("_sa", "_sb").alias("source_lo"),
            F.greatest("_sa", "_sb").alias("source_hi"),
        )
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )

# ---------------------------------------------------------------------------
# q200: training-data curation pipeline v2 (capstone composition)
# ---------------------------------------------------------------------------

@register(
    "q200_curation_pipeline_v2",
    sql="""
    WITH pool AS (
      SELECT doc_id, source, text,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
      FROM documents
      WHERE source <> 'src0'
        AND len(string_split_regex(lower(trim(text)), '\\s+')) >= 15
    ),
    ex AS (
      SELECT * FROM pool
      WHERE doc_id IN (SELECT MIN(doc_id) FROM pool GROUP BY text)
    ),
    toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM ex
    ),
    sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, greatest(len(t) - 2, 1))]) AS g
      FROM toks
    ),
    sizes AS (SELECT doc_id, len(g) AS n FROM sh),
    posts AS (SELECT doc_id, len(g) AS n, unnest(g) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
      FROM posts a JOIN posts b
        ON a.s = b.s AND a.doc_id < b.doc_id
       AND least(a.n, b.n) >= 0.7 * greatest(a.n, b.n) - 1e-9
      GROUP BY 1, 2
    ),
    losers AS (
      SELECT DISTINCT id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.7
    ),
    nd AS (
      SELECT * FROM ex WHERE doc_id NOT IN (SELECT id_b FROM losers)
    ),
    bt AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE source = 'src0'
    ),
    bg AS (
      SELECT DISTINCT unnest([array_to_string(t[i:i+7], ' ')
                              for i in generate_series(1, greatest(len(t) - 7, 1))]) AS g8
      FROM bt
    ),
    nt AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM nd
    ),
    ng AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+7], ' ')
                     for i in generate_series(1, greatest(len(t) - 7, 1))])) AS g8
      FROM nt
    ),
    contaminated AS (SELECT DISTINCT doc_id FROM ng JOIN bg USING (g8)),
    clean AS (
      SELECT * FROM nd
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    split_assigned AS (
      SELECT *,
             ('0x' || substr(sha256(source), 1, 15))::BIGINT % 100 AS b
      FROM clean
    )
    SELECT CASE WHEN b < 96 THEN 'train'
                WHEN b < 98 THEN 'val' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM split_assigned GROUP BY 1
    """,
    doc="Training-data curation pipeline v2 — the capstone chaining "
        "the round-5 curation stack end-to-end under ONE oracle: "
        "quality gate (>= 15 tokens) -> exact dedup (min-id survivor "
        "per content hash) -> verified MinHash near-dup dedup (16x2 "
        "bands, exact-Jaccard >= 0.7 verify; candidate recall misses "
        "a boundary pair with P ~ 2e-5, validated equal to the all-"
        "pairs oracle at both graded SFs) -> 8-gram benchmark "
        "decontamination against the held-out src0 eval proxy "
        "(benchmark grams broadcast; pool never reshuffles) -> "
        "group-integrity train/val/test split (sha-hash of SOURCE so "
        "near-dup clusters cannot straddle splits) -> per-split "
        "release report (docs, exact token mass, sources).  Each "
        "stage is the already-graded operator (q22/q17/q25/q49/q168 "
        "machinery).  The near-dup survivor corpus pins ONCE "
        "(localCheckpoint) at the dedup->decontamination boundary: two "
        "downstream consumers need it (the 8-gram contamination scan "
        "and the released-rows semi-join), and without the pin the "
        "whole MinHash DAG executed twice — the release boundary is "
        "exactly where a production pipeline materializes the corpus "
        "anyway.",
    tags=("llmdata", "pipeline", "capstone", "documents"),
)
def q200(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import dedup, sampling

    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    pool = docs.where(
        (F.col("source") != "src0") & (n_tokens >= 15)
    ).select("doc_id", "source", "text", n_tokens.alias("n_tokens"))
    ex = dedup.exact_dedup(pool)
    nd = dedup.minhash_dedup(ex, threshold=0.7, bands=16).localCheckpoint(
        eager=True
    )
    bench = docs.where(F.col("source") == "src0").select("doc_id", "text")
    flags = sampling.benchmark_ngram_overlap(nd, bench, n=8)
    clean = nd.join(
        flags.where(~F.col("contaminated")).select("doc_id"), "doc_id", "left_semi"
    )
    assigned = sampling.group_holdout_split(clean, "source")
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.countDistinct("source").alias("n_sources"),
    )

# ---------------------------------------------------------------------------
# q201: association rules (support / confidence / lift)
# ---------------------------------------------------------------------------

@register(
    "q201_association_rules",
    sql="""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lp),
    item AS (SELECT l_partkey, COUNT(*) AS c FROM lp GROUP BY 1),
    pair AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS cab
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    ),
    rules AS (
      SELECT ante, cons, cab, ca, cb, n FROM (
        SELECT pa AS ante, pb AS cons, cab,
               ia.c AS ca, ib.c AS cb, tot.n
        FROM pair JOIN item ia ON ia.l_partkey = pa
                  JOIN item ib ON ib.l_partkey = pb, tot
        UNION ALL
        SELECT pb, pa, cab, ib.c, ia.c, tot.n
        FROM pair JOIN item ia ON ia.l_partkey = pa
                  JOIN item ib ON ib.l_partkey = pb, tot
      )
    )
    SELECT ante, cons,
           CAST(cab AS BIGINT) AS n_both,
           CAST(ROUND((CAST(cab AS DOUBLE) / n) * 1e6) AS BIGINT) / 1e6 AS support,
           CAST(ROUND((CAST(cab AS DOUBLE) / ca) * 1e6) AS BIGINT) / 1e6 AS confidence,
           CAST(ROUND((CAST(cab AS DOUBLE) * n / (CAST(ca AS DOUBLE) * cb)) * 1e6) AS BIGINT) / 1e6
             AS lift
    FROM rules
    ORDER BY lift DESC, ante, cons
    LIMIT 30
    """,
    doc="Association-rule mining over order baskets (the Apriori "
        "level-2 readout on q88's co-occurrence machinery): for every "
        "part pair co-ordered >= 3 times, BOTH directed rules A=>B "
        "with support, confidence, and lift from exact integer counts "
        "— each metric is ONE double expression over (cab, ca, cb, "
        "n), so engines agree bit-for-bit; deterministic top-30 by "
        "lift.  Physical shape: per-order in-task pair expansion "
        "(baskets bounded), item counts broadcast back onto the pair "
        "frame, the single-row order total joins as q42's degenerate "
        "map — the fact table never self-joins.",
    tags=("relational", "basket", "rules", "lineitem"),
)
def q201(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.dedup import bucket_pairs

    lp = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    tot = lp.agg(F.countDistinct("l_orderkey").alias("n"))
    item = lp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    baskets = lp.groupBy("l_orderkey").agg(F.collect_list("l_partkey").alias("_ids"))
    pair = (
        bucket_pairs(baskets, out_a="pa", out_b="pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("cab"))
        .where(F.col("cab") >= 3)
    )
    fwd = pair.select(F.col("pa").alias("ante"), F.col("pb").alias("cons"), "cab")
    rev = pair.select(F.col("pb").alias("ante"), F.col("pa").alias("cons"), "cab")
    rules = (
        fwd.unionByName(rev)
        .join(F.broadcast(item.select(F.col("l_partkey").alias("ante"), F.col("c").alias("ca"))), "ante")
        .join(F.broadcast(item.select(F.col("l_partkey").alias("cons"), F.col("c").alias("cb"))), "cons")
        .crossJoin(F.broadcast(tot))
    )
    return (
        rules.select(
            "ante",
            "cons",
            F.col("cab").alias("n_both"),
            pround(F.col("cab").cast("double") / F.col("n"), 6).alias("support"),
            pround(F.col("cab").cast("double") / F.col("ca"), 6).alias("confidence"),
            pround(F.col("cab").cast("double") * F.col("n")
                / (F.col("ca").cast("double") * F.col("cb")), 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("ante"), F.asc("cons"))
        .limit(30)
    )

# ---------------------------------------------------------------------------
# q202: item-item collaborative filtering (co-occurrence cosine)
# ---------------------------------------------------------------------------

@register(
    "q202_item_item_cf",
    sql="""
    WITH ui AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey % 2 = 0
    ),
    capped AS (
      SELECT u, i FROM ui
      WHERE u IN (SELECT u FROM ui GROUP BY u HAVING COUNT(*) <= 30)
    ),
    item AS (SELECT i, COUNT(*) AS n FROM capped GROUP BY 1),
    pair AS (
      SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS co
      FROM capped a JOIN capped b ON a.u = b.u AND a.i < b.i
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    )
    SELECT item_a, item_b, CAST(co AS BIGINT) AS n_co_users,
           CAST(ROUND((CAST(co AS DOUBLE)
                 / sqrt(CAST(ia.n AS DOUBLE) * ib.n)) * 1e6) AS BIGINT) / 1e6 AS cosine
    FROM pair JOIN item ia ON ia.i = item_a
              JOIN item ib ON ib.i = item_b
    ORDER BY cosine DESC, item_a, item_b
    LIMIT 30
    """,
    doc="Item-item collaborative filtering (co-occurrence cosine over "
        "the binary customer x part interaction matrix — the classic "
        "Amazon-style recommender precompute): distinct (customer, "
        "part) interactions, whale baskets capped at 30 items (the "
        "q198 quota rationale — one bot customer would otherwise "
        "contribute O(basket^2) pairs), per-customer in-task pair "
        "expansion, cosine = co / sqrt(n_a x n_b) from exact integer "
        "counts in one double expression; deterministic top-30.  The "
        "interaction matrix never self-joins — baskets are collected "
        "per customer (bounded by the cap) and expand in-task.",
    tags=("relational", "recommender", "lineitem", "basket"),
)
def q202(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata.dedup import bucket_pairs

    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") % 2 == 0)
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # r10: the user-item pair frame is read by sizes AND the cap join,
    # and the capped frame by item counts AND basket building — without
    # pins the fact join + distinct re-ran for every consumer (12 scans
    # of lineitem/orders in plans/r10/q202_before.txt).  Pin the
    # distinct-pair frame (the one heavy pass) and the capped frame
    # (cheap semi-join over it); ContextCleaner drains both when the
    # result drops.
    ui = (
        li.join(o.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = ui.groupBy("u").agg(F.count(F.lit(1)).alias("_bs"))
    capped = ui.join(
        sizes.where(F.col("_bs") <= 30).select("u"), "u", "left_semi"
    ).localCheckpoint(eager=True)
    item = capped.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    baskets = capped.groupBy("u").agg(F.collect_list("i").alias("_ids"))
    pair = (
        bucket_pairs(baskets, out_a="item_a", out_b="item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_co_users"))
        .where(F.col("n_co_users") >= 3)
    )
    return (
        pair.join(
            F.broadcast(item.select(F.col("i").alias("item_a"), F.col("n").alias("_na"))),
            "item_a",
        )
        .join(
            F.broadcast(item.select(F.col("i").alias("item_b"), F.col("n").alias("_nb"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_co_users",
            pround(F.col("n_co_users").cast("double")
                / F.sqrt(F.col("_na").cast("double") * F.col("_nb")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("item_a"), F.asc("item_b"))
        .limit(30)
    )

# ---------------------------------------------------------------------------
# q203: positional phrase search (top-bigram mining + occurrence report)
# ---------------------------------------------------------------------------

@register(
    "q203_phrase_search",
    sql="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id, u.i AS pos,
             array_to_string(t[u.i:u.i+1], ' ') AS gram
      FROM t, unnest(generate_series(1, greatest(len(t) - 1, 1))) AS u(i)
    ),
    top AS (
      SELECT gram FROM g GROUP BY gram
      ORDER BY COUNT(*) DESC, gram LIMIT 1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(pos) AS BIGINT) AS first_pos
    FROM g JOIN top USING (gram)
    GROUP BY doc_id
    """,
    doc="Positional phrase search over the word-position postings "
        "grain — the IR primitive BM25 (q104) cannot answer (bags of "
        "words lose adjacency): mine the corpus's globally most "
        "frequent adjacent bigram (deterministic count-then-lexical "
        "tiebreak), then report every document containing that exact "
        "phrase with occurrence count and first position.  The "
        "postings carry (doc, pos, gram) only; the single-row top "
        "phrase broadcasts back (q42's degenerate map shape), so "
        "phrase matching is a filter, not a join of the corpus "
        "against itself.  At scale the same postings table answers "
        "arbitrary N-word phrases by chaining pos+1 joins.",
    tags=("llmdata", "search", "phrase", "documents"),
)
def q203(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..partitioning import fan_out

    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 2)))
    # the bigram projection is interpreted HOF work — fan the doc frame
    # out across cores first (no-op on a well-partitioned scan)
    g = fan_out(docs).select(
        "doc_id", F.posexplode(grams).alias("_p0", "gram")
    ).select("doc_id", (F.col("_p0") + 1).alias("pos"), "gram")
    # Aggregate to (doc, gram) grain FIRST: both consumers — the global
    # top-phrase mine and the per-doc occurrence report — then hang off
    # the SAME hash exchange, which the planner dedupes (ReusedExchange),
    # so the expensive tokenize+posexplode pass over the corpus runs
    # ONCE (was twice: 6.0 s -> ~3 s at sf0.1).  The top mine re-aggs
    # the small (doc, gram) frame map-side; the report is a broadcast
    # filter on it.
    dg = g.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("pos").cast("bigint").alias("first_pos"),
    )
    top = (
        dg.groupBy("gram")
        .agg(F.sum("n_occurrences").alias("_c"))
        .orderBy(F.desc("_c"), F.asc("gram"))
        .limit(1)
        .select("gram")
    )
    return dg.join(F.broadcast(top), "gram").select(
        "doc_id", "n_occurrences", "first_pos"
    )

# ---------------------------------------------------------------------------
# q204: OHLC bars (open/high/low/close per time bucket)
# ---------------------------------------------------------------------------

@register(
    "q204_ohlc_bars",
    sql="""
    WITH b AS (
      SELECT event_type,
             time_bucket(INTERVAL '15 minutes', ts) AS bar_start,
             CAST(round(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type,
                                time_bucket(INTERVAL '15 minutes', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type,
                                time_bucket(INTERVAL '15 minutes', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, CAST(bar_start AS VARCHAR) AS bar_start,
           CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_c,
           CAST(MAX(cents) AS BIGINT) AS high_c,
           CAST(MIN(cents) AS BIGINT) AS low_c,
           CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_c,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM b GROUP BY 1, 2
    """,
    doc="OHLC bars per (event_type, 15-minute bucket) — the finance/"
        "telemetry candlestick rollup: open = first value in the bar, "
        "close = last (both deterministic via (ts, event_id) "
        "row_number ties — arg_min/arg_max tie arbitrarily on equal "
        "timestamps, so the first/last election goes through unique "
        "composite order keys instead), high/low = plain min/max, all "
        "in integer cents.  Two row_number frames and the final "
        "aggregation share ONE (type, bucket) hash distribution.",
    tags=("timeseries", "events", "window", "ohlc"),
)
def q204(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bar = F.window("ts", "15 minutes")["start"]
    cents = F.round(F.col("value") * 100).cast("bigint")
    base = ev.select(
        "event_type", bar.alias("bar_start"), cents.alias("cents"),
        "ts", "event_id",
    )
    wa = Window.partitionBy("event_type", "bar_start").orderBy(
        F.col("ts"), F.col("event_id")
    )
    wd = Window.partitionBy("event_type", "bar_start").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    b = base.select(
        "event_type",
        "bar_start",
        "cents",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return b.groupBy(
        "event_type", F.col("bar_start").cast("string").alias("bar_start")
    ).agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).alias("open_c"),
        F.max("cents").alias("high_c"),
        F.min("cents").alias("low_c"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("close_c"),
        F.count(F.lit(1)).alias("n_ticks"),
    )

# ---------------------------------------------------------------------------
# q205: column completeness profile across tables
# ---------------------------------------------------------------------------

@register(
    "q205_completeness_profile",
    sql="""
    WITH o AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN NULL
                  ELSE o_orderstatus END AS status,
             CASE WHEN o_custkey % 7 = 0 THEN NULL
                  ELSE o_custkey END AS custkey
      FROM orders
    ),
    d AS (
      SELECT NULLIF(lang, 'en') AS lang, text FROM documents
    ),
    po AS (
      SELECT 'orders' AS table_name, c.column_name,
             (SELECT COUNT(*) FROM o) AS n_rows,
             CASE c.column_name
               WHEN 'status' THEN (SELECT COUNT(*) FROM o WHERE status IS NULL)
               ELSE (SELECT COUNT(*) FROM o WHERE custkey IS NULL)
             END AS n_null
      FROM (SELECT unnest(['status', 'custkey']) AS column_name) c
    ),
    pd AS (
      SELECT 'documents', c.column_name,
             (SELECT COUNT(*) FROM d),
             CASE c.column_name
               WHEN 'lang' THEN (SELECT COUNT(*) FROM d WHERE lang IS NULL)
               ELSE (SELECT COUNT(*) FROM d WHERE text IS NULL)
             END
      FROM (SELECT unnest(['lang', 'text']) AS column_name) c
    ),
    u AS (SELECT * FROM po UNION ALL SELECT * FROM pd)
    SELECT table_name, column_name,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_null AS BIGINT) AS n_null,
           CAST(ROUND((CAST(n_null AS DOUBLE) / n_rows) * 1e6) AS BIGINT) / 1e6 AS pct_null
    FROM u
    """,
    doc="Column completeness profile (relational.sketches."
        "completeness_profile) — the first screen of a data-quality "
        "audit: per (table, column) row/null counts and null rate, "
        "over views with DETERMINISTICALLY PLANTED nulls (status 'F' "
        "and every 7th custkey nulled in orders; non-English lang "
        "nulled in documents) so the gate grades real non-zero "
        "counts, not an all-zeros vacuity (the fk_audit planted-"
        "breakage rule).  Scale shape: ONE scan per table computes "
        "every column's null sum in a single aggregation, then the "
        "wide row unpivots in-plan — a 500-column profile is still "
        "one job per table.",
    tags=("relational", "profiling", "quality", "orders", "documents"),
)
def q205(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketches import completeness_profile

    o = load(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderstatus") == "F", None)
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.when(F.col("o_custkey") % 7 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("custkey"),
    )
    d = load(spark, sf_dir, "documents").select(
        F.nullif(F.col("lang"), F.lit("en")).alias("lang"), "text"
    )
    return completeness_profile(o, "orders", ["status", "custkey"]).unionByName(
        completeness_profile(d, "documents", ["lang", "text"])
    )

# ---------------------------------------------------------------------------
# q206: atomic multi-table transaction with crash-recovery consistency
# ---------------------------------------------------------------------------

@register(
    "q206_multi_table_txn",
    sql="""
    WITH f AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS t
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority,
           n AS n_fact, CAST(t AS DOUBLE) AS total_fact,
           n AS n_rollup, CAST(t AS DOUBLE) AS total_rollup
    FROM f
    """,
    doc="Atomic multi-table transaction under the correctness gate "
        "(Warehouse.transaction): the order fact table and its "
        "per-priority rollup commit TOGETHER — stage both generations, "
        "atomic-rename the manifest (the commit point), flip pointers "
        "— and the harness CRASHES the second transaction between its "
        "two pointer flips (fact flipped, rollup not), then re-"
        "attaches the warehouse, whose roll-forward recovery completes "
        "the commit.  The graded output reads BOTH tables and reports "
        "fact-derived and rollup-stored aggregates side by side; they "
        "can only agree (= the oracle's single recompute) if recovery "
        "made the pair consistent — a torn commit would grade red on "
        "the rollup columns.  Crash-before-commit-point (abort) and "
        "plain-commit paths are pytest-pinned.",
    tags=("merge", "warehouse", "transaction", "orders"),
)
def q206(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import tempfile
    from pathlib import Path

    from ..merge import Warehouse

    DEC2 = "decimal(18,2)"
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_totalprice").cast(DEC2).alias("price"),
    )

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").cast(DEC2).alias("t"),
        )

    root = Path(tempfile.mkdtemp(prefix="q206_txn_"))
    wh = Warehouse(spark, root)
    first = o.where(F.col("o_orderkey") % 3 == 0)
    wh.transaction({"fact_orders": first, "rollup_orders": rollup(first)})
    # second transaction: full state — CRASH between the two flips
    g_f, old_f = wh._stage("fact_orders", o)
    g_r, old_r = wh._stage("rollup_orders", rollup(o))
    (root / "_TXN.json").write_text(
        _json.dumps(
            {
                "fact_orders": {"gen": g_f.name, "old": old_f},
                "rollup_orders": {"gen": g_r.name, "old": old_r},
            }
        )
    )
    wh._flip("fact_orders", g_f, old_f)
    # ... crash ... a fresh attach rolls the transaction forward
    wh2 = Warehouse(spark, root)
    from_fact = rollup(wh2.read("fact_orders")).select(
        "o_orderpriority",
        F.col("n").alias("n_fact"),
        F.col("t").cast("double").alias("total_fact"),
    )
    from_rollup = wh2.read("rollup_orders").select(
        "o_orderpriority",
        F.col("n").alias("n_rollup"),
        F.col("t").cast("double").alias("total_rollup"),
    )
    return from_fact.join(from_rollup, "o_orderpriority")

# ---------------------------------------------------------------------------
# q207: TPC-H Q14 promotion revenue share
# ---------------------------------------------------------------------------

@register(
    "q207_promo_revenue_share",
    sql="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END)
               AS DECIMAL(24,6)) AS DOUBLE) AS promo_revenue,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))))
               AS DECIMAL(24,6)) AS DOUBLE) AS total_revenue,
           CAST(ROUND((100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(24,6)) AS DOUBLE)
               / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))))
               AS DECIMAL(24,6)) AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY 1
    """,
    doc="TPC-H Q14 promotion revenue share per ship month: the part "
        "dim broadcasts onto the fact, promo and total revenue "
        "accumulate decimal-exact in ONE aggregation (conditional sum "
        "— no second scan, no self-join), and the percentage divides "
        "the two emitted doubles once.  Classic star-schema "
        "conditional-aggregate shape.",
    tags=("relational", "tpch", "lineitem", "part"),
)
def q207(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import money

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = money("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(18,4)"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    g = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(promo).cast("decimal(24,6)").cast("double").alias("promo_revenue"),
            F.sum(rev).cast("decimal(24,6)").cast("double").alias("total_revenue"),
        )
    )
    return g.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        pround(100.0 * F.col("promo_revenue") / F.col("total_revenue"), 6).alias("promo_pct"),
    )

# ---------------------------------------------------------------------------
# q208: TPC-H Q4-shape order priority check (EXISTS semi join)
# ---------------------------------------------------------------------------

@register(
    "q208_priority_late_ship",
    sql="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY 1
    """,
    doc="TPC-H Q4-shape order-priority check, adapted to this "
        "schema's dates (the reference columns lack commit/receipt "
        "dates): count orders per priority having AT LEAST ONE "
        "lineitem shipped more than 90 days after the order date — "
        "the correlated-EXISTS decorrelation shape: Catalyst rewrites "
        "the subquery to a left-semi join on orderkey, so the fact "
        "scans once and no duplicate-order inflation can occur "
        "(a plain join + distinct would re-shuffle order rows per "
        "matching lineitem).",
    tags=("relational", "tpch", "orders", "lineitem"),
)
def q208(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = li.join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).where(
        # + INTERVAL keeps the timestamp's time-of-day (date_add would
        # truncate to midnight and silently diverge from the oracle on
        # any non-midnight order timestamp)
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(
            late.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
            "o_orderkey",
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )

# ---------------------------------------------------------------------------
# q209: bigram-LM held-out scoring (per language)
# ---------------------------------------------------------------------------

@register(
    "q209_bigram_lm_nll",
    sql="""
    WITH tr AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id % 2 = 0
    ),
    trb AS (
      SELECT array_to_string(t[i:i+1], ' ') AS bg
      FROM tr, unnest(generate_series(1, greatest(len(t) - 1, 1))) AS u(i)
    ),
    c2 AS (SELECT bg, COUNT(*) AS c2 FROM trb GROUP BY 1),
    ctx AS (
      SELECT string_split(bg, ' ')[1] AS w1, COUNT(*) AS c1
      FROM trb GROUP BY 1
    ),
    v AS (
      SELECT COUNT(DISTINCT tok) AS v
      FROM (SELECT unnest(t) AS tok FROM tr)
    ),
    te AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id % 2 = 1
    ),
    teb AS (
      SELECT doc_id, lang,
             array_to_string(t[i:i+1], ' ') AS bg,
             string_split(array_to_string(t[i:i+1], ' '), ' ')[1] AS w1
      FROM te, unnest(generate_series(1, greatest(len(t) - 1, 1))) AS u(i)
    ),
    scored AS (
      SELECT doc_id, lang,
             CAST(round(-ln((COALESCE(c2.c2, 0) + CAST(1 AS DOUBLE))
                            / (COALESCE(ctx.c1, 0) + v.v)) * 1e6)
                  AS BIGINT) AS micros
      FROM teb LEFT JOIN c2 USING (bg)
               LEFT JOIN ctx USING (w1), v
    ),
    per_doc AS (
      SELECT doc_id, lang, COUNT(*) AS nb, SUM(micros) AS m
      FROM scored GROUP BY 1, 2
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nb) AS BIGINT) AS n_bigrams,
           CAST(ROUND((CAST(SUM(m) AS DOUBLE) / SUM(nb) / 1e6) * 1e6) AS BIGINT) / 1e6 AS avg_nll
    FROM per_doc GROUP BY 1
    """,
    doc="Held-out bigram-LM scoring per language (llmdata.textstats."
        "bigram_lm_nll): a Laplace-smoothed bigram model trains on "
        "even-id docs and scores odd-id docs — the conditional-"
        "probability step up from q59's unigram CCNet signal, and an "
        "honest domain-fit score because the scored docs never "
        "trained.  Per-bigram log terms scale to integer micros "
        "before the sums (q86/q175 exactness); train count tables "
        "join at bigram grain (no broadcast assumption — vocab is "
        "unbounded at corpus scale); the per-language rollup divides "
        "once.",
    tags=("llmdata", "lm", "quality", "documents"),
)
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import textstats

    docs = load(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 2 == 0)
    test = docs.where(F.col("doc_id") % 2 == 1)
    per_doc = textstats.bigram_lm_nll(train, test)
    joined = per_doc.join(test.select("doc_id", "lang"), "doc_id")
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
        pround(F.sum("nll_micros").cast("double") / F.sum("n_bigrams") / 1e6, 6).alias("avg_nll"),
    )

# ---------------------------------------------------------------------------
# q210: growth accounting (new / returning / cumulative uniques)
# ---------------------------------------------------------------------------

@register(
    "q210_growth_accounting",
    sql="""
    WITH act AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    first_seen AS (
      SELECT user_id, MIN(day) AS d0 FROM act GROUP BY 1
    ),
    daily AS (
      SELECT a.day,
             COUNT(*) AS active_users,
             COUNT(*) FILTER (WHERE f.d0 = a.day) AS new_users
      FROM act a JOIN first_seen f USING (user_id)
      GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(active_users AS BIGINT) AS active_users,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(active_users - new_users AS BIGINT) AS returning_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM daily
    """,
    doc="Growth accounting — the PM dashboard's new / returning / "
        "cumulative-unique curve: per day, active users split by "
        "whether it is their FIRST day, and the cumulative unique "
        "count is the running sum of new users (exact, because every "
        "user is new exactly once — the first-seen reduction replaces "
        "any day-windowed distinct scan).  Shapes: one (day, user) "
        "distinct, one user-grain min, one day-grain rollup, and a "
        "|days|-row window — O(activity) total, no O(days x users) "
        "densification.",
    tags=("relational", "growth", "events", "window"),
)
def q210(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    act = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    first_seen = act.groupBy("user_id").agg(F.min("day").alias("d0"))
    daily = (
        act.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.count(F.when(F.col("d0") == F.col("day"), 1)).alias("new_users"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).alias("returning_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )

# ---------------------------------------------------------------------------
# q211: snapshot-consistent paired read across a transaction boundary
# ---------------------------------------------------------------------------

@register(
    "q211_txn_snapshot_read",
    sql="""
    WITH f AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS t
      FROM orders WHERE o_orderkey % 3 = 0
      GROUP BY 1
    )
    SELECT o_orderpriority,
           n AS n_fact, CAST(t AS DOUBLE) AS total_fact,
           n AS n_rollup, CAST(t AS DOUBLE) AS total_rollup
    FROM f
    """,
    doc="Snapshot-consistent PAIRED time travel across a transaction "
        "boundary (Warehouse.transaction + read(version=)): two "
        "transactions commit (fact + rollup as pairs — first the "
        "%3==0 subset, then the full table); the query pins BOTH "
        "tables to their FIRST-transaction generations and grades "
        "that the historical pair is mutually consistent (fact-"
        "derived aggregates == stored rollup == the oracle's subset "
        "recompute).  Reading each table's 'latest' after unaligned "
        "writes is how rollup drift sneaks into dashboards; version-"
        "pinned paired reads are the audit tool, and because "
        "transactions stage BEFORE any flip, the paired versions "
        "always exist together.",
    tags=("merge", "warehouse", "timetravel", "orders"),
)
def q211(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..merge import Warehouse

    DEC2 = "decimal(18,2)"
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_totalprice").cast(DEC2).alias("price"),
    )

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").cast(DEC2).alias("t"),
        )

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="q211_snap_"))
    first = o.where(F.col("o_orderkey") % 3 == 0)
    wh.transaction({"fact_orders": first, "rollup_orders": rollup(first)})
    v_fact = wh.history("fact_orders")[-1]["version"]
    v_roll = wh.history("rollup_orders")[-1]["version"]
    wh.transaction({"fact_orders": o, "rollup_orders": rollup(o)})
    from_fact = rollup(wh.read("fact_orders", version=v_fact)).select(
        "o_orderpriority",
        F.col("n").alias("n_fact"),
        F.col("t").cast("double").alias("total_fact"),
    )
    from_rollup = wh.read("rollup_orders", version=v_roll).select(
        "o_orderpriority",
        F.col("n").alias("n_rollup"),
        F.col("t").cast("double").alias("total_rollup"),
    )
    return from_fact.join(from_rollup, "o_orderpriority")

# ---------------------------------------------------------------------------
# q212: TPC-H Q3 shipping-priority top orders
# ---------------------------------------------------------------------------

@register(
    "q212_shipping_priority",
    sql="""
    SELECT l_orderkey,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))))
               AS DECIMAL(24,6)) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS VARCHAR) AS order_date,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority: top-10 unshipped-revenue orders "
        "for one market segment as of a cutoff date.  Physical shape: "
        "the segment-filtered customer dim broadcasts, orders filter "
        "pushes to the scan, lineitem's shipdate predicate prunes "
        "before the join, revenue is decimal-exact, and the global "
        "top-10 is a TakeOrdered — no full sort.  Deterministic "
        "tiebreak on orderkey.",
    tags=("relational", "tpch", "lineitem", "orders"),
)
def q212(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import emit, money

    cutoff = "1995-03-15"
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    rev = money("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(18,4)"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(emit(F.sum(rev).cast("decimal(24,6)")).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )

# ---------------------------------------------------------------------------
# q213: TPC-H Q10 returned-item customer ranking
# ---------------------------------------------------------------------------

@register(
    "q213_returned_item_ranking",
    sql="""
    SELECT c_custkey, c_name, n_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))))
               AS DECIMAL(24,6)) AS DOUBLE) AS lost_revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned-item ranking: top-20 customers by revenue "
        "lost to returns (l_returnflag = 'R'), with their nation.  "
        "Return-flag predicate pushes to the lineitem scan; customer "
        "and nation dims broadcast; decimal-exact loss; TakeOrdered "
        "top-20 with a key tiebreak.",
    tags=("relational", "tpch", "lineitem", "customer"),
)
def q213(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import emit, money

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = money("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(18,4)"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(emit(F.sum(rev).cast("decimal(24,6)")).alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )

# ---------------------------------------------------------------------------
# q214: TPC-H Q5-shape local-supplier revenue per nation
# ---------------------------------------------------------------------------

@register(
    "q214_local_supplier_revenue",
    sql="""
    SELECT n_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))))
               AS DECIMAL(24,6)) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5-shape local-supplier revenue: revenue from lineitems "
        "where the supplier and the ordering customer share a nation, "
        "per nation.  The same-nation predicate rides the supplier "
        "broadcast join (c_nationkey = s_nationkey evaluated in the "
        "join condition — no post-join filter pass); decimal-exact "
        "revenue; nation-grain rollup.",
    tags=("relational", "tpch", "lineitem", "supplier"),
)
def q214(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import emit, money

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = money("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(18,4)"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(emit(F.sum(rev).cast("decimal(24,6)")).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )

# ---------------------------------------------------------------------------
# q215: TPC-H Q6 forecast revenue change
# ---------------------------------------------------------------------------

@register(
    "q215_forecast_revenue_change",
    sql="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,4)))
               AS DECIMAL(24,6)) AS DOUBLE) AS potential_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecast revenue change: the revenue that would "
        "have been earned had discounts in [5%, 7%] on sub-24-"
        "quantity lineitems been eliminated.  Pure pushed-predicate "
        "scan + one decimal-exact aggregate — the canonical "
        "'filter-dominated' query whose whole cost is the scan "
        "(PushedFilters carries both range predicates).",
    tags=("relational", "tpch", "lineitem"),
)
def q215(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import emit, money

    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24)
    )
    return li.agg(
        emit(
            F.sum(
                money("l_extendedprice") * F.col("l_discount").cast("decimal(18,4)")
            ).cast("decimal(24,6)")
        ).alias("potential_revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )

# ---------------------------------------------------------------------------
# q216: TPC-H Q19-shape disjunctive-predicate discounted revenue
# ---------------------------------------------------------------------------

@register(
    "q216_disjunctive_revenue",
    sql="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))))
               AS DECIMAL(24,6)) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 5 AND 25)
        OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30
            AND l_quantity BETWEEN 15 AND 35)
        OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 45
            AND l_quantity BETWEEN 25 AND 45))
    """,
    doc="TPC-H Q19-shape disjunctive-predicate revenue: an OR of "
        "three (brand, size-range, quantity-range) conjunctions "
        "across BOTH join sides — the classic test of disjunction "
        "handling: Catalyst extracts the common p_partkey equi-key "
        "so the join stays a broadcast hash join with the OR as a "
        "post-join filter, and pushes the derivable per-side "
        "disjunctions (brand IN (...), quantity range union) to the "
        "scans instead of degrading to a nested loop.  Decimal-exact "
        "single aggregate.",
    tags=("relational", "tpch", "lineitem", "part"),
)
def q216(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import emit, money

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arm = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    cond = (
        arm("Brand#13", 1, 15, 5, 25)
        | arm("Brand#19", 10, 30, 15, 35)
        | arm("Brand#5", 20, 45, 25, 45)
    )
    rev = money("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            emit(F.sum(rev).cast("decimal(24,6)")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
