"""Catalog entries for the LLM-data-pipeline operators (llmdata/*):
dedup, similarity search, text analysis.  SQL-expressible ones carry
DuckDB oracles; sketch-based ones (minhash, simhash, LSH) are declared
rows-only and get exactness tests against their in-engine baselines in
tests/test_llmdata.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmdata import dedup, sampling, similarity, textstats, urls
from .catalog import load, register, pround


@register(
    "q21_doc_top_bigrams",
    sql="""
    WITH t AS (SELECT string_split_regex(lower(trim(text)), '\\s+') AS toks
               FROM documents)
    SELECT toks[i] || ' ' || toks[i+1] AS bigram, COUNT(*) AS freq
    FROM t, UNNEST(generate_series(1, len(toks)-1)) AS g(i)
    GROUP BY 1 ORDER BY freq DESC, bigram LIMIT 20
    """,
    doc="Corpus n-gram statistics: global top-20 word bigrams.",
    tags=("text", "documents"),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.top_bigrams(load(spark, sf_dir, "documents"))


@register(
    "q22_doc_quality",
    sql="""
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           CAST(length(text) AS DOUBLE)
             / len(string_split_regex(trim(text), '\\s+')) AS mean_word_len,
           CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
             / length(text) AS punct_ratio,
           CAST(len(regexp_extract_all(text, '\\d')) AS DOUBLE)
             / length(text) AS digit_ratio
    FROM documents
    """,
    doc="Quality-scoring feature subset (length/punct/digit heuristics) "
        "with oracle; the full operator (stopword+uniqueness composite "
        "score) is llmdata.textstats.quality_features.",
    tags=("text", "documents"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars.cast("double") / n_tokens).alias("mean_word_len"),
        (F.regexp_count(t, F.lit(r"[^\w\s]")).cast("double") / n_chars).alias("punct_ratio"),
        (F.regexp_count(t, F.lit(r"\d")).cast("double") / n_chars).alias("digit_ratio"),
    )


@register(
    "q23_doc_fingerprints",
    sql="""
    SELECT doc_id,
           sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_sha256
    FROM documents
    """,
    doc="Normalized-content fingerprint (incremental-crawl change "
        "detection). The xxhash64 fast fingerprint is rows-only "
        "(no DuckDB twin).",
    tags=("text", "dedup", "documents"),
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return d.select("doc_id", F.sha2(norm, 256).alias("content_sha256"))


@register(
    "q24_ngram_jaccard_pairs",
    sql="""
    WITH toks AS (
      SELECT doc_id, UNNEST(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
    st AS (SELECT t.doc_id, t.tok, s.n_tok FROM toks t JOIN sizes s USING (doc_id)),
    inter AS (
      -- size-ratio prefilter (exact, not heuristic): jaccard >= t
      -- implies |A∩B| >= t*|A∪B| >= t*max and |A∩B| <= min, so
      -- min >= t*max; pruning before the GROUP BY keeps this oracle
      -- cheap inside the driver's shared grading budget (1e-9 slack so
      -- float multiply never over-prunes a boundary pair)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM st a JOIN st b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
       AND least(a.n_tok, b.n_tok) >= 0.8 * greatest(a.n_tok, b.n_tok) - 1e-9
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) >= 0.8
    """,
    doc="Exact n-gram Jaccard near-dup pairs via inverted-index "
        "self-join — the verifiable baseline the minhash sketch "
        "approximates. Scale: postings join, document-frequency cutoffs "
        "bound hot tokens.",
    tags=("dedup", "documents"),
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.8)


@register(
    "q25_minhash_dedup_survivors",
    sql="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
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
      -- size-ratio prefilter: jaccard >= 0.7 forces min >= 0.7*max
      -- (see q24) — prunes the postings join before aggregation
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
      FROM posts a JOIN posts b
        ON a.s = b.s AND a.doc_id < b.doc_id
       AND least(a.n, b.n) >= 0.7 * greatest(a.n, b.n) - 1e-9
      GROUP BY 1, 2
    ),
    losers AS (
      SELECT DISTINCT id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.7
    )
    SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id_b FROM losers)
    """,
    doc="MinHash-LSH near-dup dedup (32 hashes, 8 bands x 4 rows, "
        "3-word shingles, 0.7 Jaccard): surviving doc ids.  Oracle-"
        "gradable because the LSH candidates are VERIFIED with exact "
        "shingle-set Jaccard, so the survivor set equals the all-pairs "
        "SQL answer whenever band recall covers every qualifying pair; "
        "minhash is fully deterministic, and on the graded corpora "
        "every qualifying pair sits far above threshold (detection "
        "P = 1-(1-j^4)^8 ~ 0.9998 at j=0.9; verified equal to the "
        "oracle at sf0.001 and sf0.01).  8x4 keeps per-band collision "
        "odds for NON-dups at j^4 — the 100 TB-safe precision choice; "
        "16x2 trades that for recall and drowns the verifier in false "
        "candidates at scale.",
    tags=("dedup", "documents"),
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_dedup(load(spark, sf_dir, "documents")).select("doc_id")


_SIMHASH_SQL_CTE = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS w FROM toks GROUP BY 1, 2),
    h AS (SELECT doc_id, w, ('0x' || substr(sha256(tok), 1, 15))::BIGINT AS code FROM tf),
    votes AS (
      SELECT doc_id, b AS bit,
             SUM(CASE WHEN (code >> b) & 1 = 1 THEN w ELSE -w END) AS v
      FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b)
      GROUP BY 1, 2
    ),
    fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    )
"""


@register(
    "q26_simhash_fingerprints",
    sql=_SIMHASH_SQL_CTE + "SELECT doc_id, simhash FROM fp",
    doc="60-bit SimHash fingerprints under full oracle: the token hash "
        "is a sha256 prefix precisely so DuckDB can rebuild the exact "
        "same per-bit weighted votes and packed fingerprint in pure SQL "
        "(llmdata.dedup.simhash).",
    tags=("dedup", "documents"),
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(load(spark, sf_dir, "documents"))


@register(
    "q27_lang_id_agreement",
    sql="""
    WITH t AS (
      SELECT doc_id, lang,
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
        CAST(len(list_intersect(toks, ['the','a','of','and','to','in','is','it','that','for'])) AS DOUBLE) / 10 AS s_en,
        CAST(len(list_intersect(toks, ['el','la','de','y','que','en','un','una','los','para'])) AS DOUBLE) / 10 AS s_es,
        CAST(len(list_intersect(toks, ['le','la','de','et','que','en','un','une','les','pour'])) AS DOUBLE) / 10 AS s_fr,
        CAST(len(list_intersect(toks, ['der','die','das','und','zu','in','ist','ein','eine','von'])) AS DOUBLE) / 10 AS s_de
      FROM t
    ),
    p AS (
      SELECT doc_id, lang,
             CASE WHEN greatest(s_en, s_es, s_fr, s_de) <= 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                  WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                  WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                  ELSE 'de' END AS predicted_lang
      FROM s
    )
    SELECT lang, predicted_lang, COUNT(*) AS n FROM p GROUP BY 1, 2
    """,
    doc="Stopword-ratio language ID vs the labeled lang column: "
        "confusion counts.  The heuristic argmax (dict-order tie-break, "
        "'und' when no stopword hits) restates exactly in SQL, so the "
        "classifier itself sits under the oracle; accuracy floors stay "
        "in tests.",
    tags=("text", "documents"),
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pred = textstats.identify_language(d)
    return (
        d.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q28_embedding_near_dups",
    sql="""
    WITH aug AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, [x * 2.0 for x in CAST(embedding AS DOUBLE[])]
      FROM embeddings WHERE vec_id < 20
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(ROUND((list_cosine_similarity(a.v, b.v)) * 1e4) AS BIGINT) / 1e4 AS cosine_sim
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.9
    """,
    doc="Embedding near-duplicate pairs (cosine >= 0.9) via random-"
        "hyperplane LSH buckets + exact verification.  The base table "
        "has no pairs above 0.9 at test scale (r01 returned 0 rows), so "
        "the query plants deterministic near-dups — 2x-scaled copies of "
        "vec_id 0..19 — making the expected pair set non-empty and the "
        "LSH detection DETERMINISTIC (scaling preserves every hyperplane "
        "sign, so a planted copy collides with its source in all bands "
        "with probability 1, not 1-eps).  Probabilistic recall at lower "
        "thresholds stays covered by tests/test_llmdata.py.",
    tags=("similarity", "embeddings"),
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 2.0).alias("embedding"),
    )
    aug = e.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")).unionByName(planted)
    return similarity.embedding_near_dup_pairs(aug, threshold=0.9, dim=64).select(
        "id_a", "id_b", pround("cosine_sim", 4).alias("cosine_sim")
    )


@register(
    "q33_cosine_pairs_exact",
    sql="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(ROUND((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[]))) * 1e4) AS BIGINT) / 1e4 AS cosine_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.3
    """,
    doc="Exact all-pairs cosine >= 0.3 (blocked GEMM against a "
        "broadcast normalized matrix, mapInPandas) — the oracle-backed "
        "brute-force baseline for the LSH/IVF approximate paths.",
    tags=("similarity", "embeddings"),
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return similarity.exact_cosine_pairs(e, threshold=0.3).select(
        "id_a", "id_b", pround("cosine_sim", 4).alias("cosine_sim")
    )


@register(
    "q34_ann_ivf_topk",
    sql="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    sims AS (
      SELECT e.vec_id,
             CAST(ROUND((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)) * 1e4) AS BIGINT) / 1e4 AS cosine_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> 0
    )
    SELECT vec_id, cosine_sim FROM sims ORDER BY cosine_sim DESC, vec_id LIMIT 10
    """,
    doc="IVF top-k graded in probe-ALL mode (n_probe = n_cells), where "
        "the index machinery — kmeans quantizer, cell assignment, "
        "in-cell exact rerank — must reproduce the exact brute-force "
        "answer, making it SQL-oracle-checkable (ranking on the rounded "
        "score with vec_id tie-break, both engine-stable).  The pruned "
        "4-of-16-cell approximate mode keeps its recall floor in "
        "tests/test_llmdata.py.",
    tags=("similarity", "embeddings", "topk"),
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    qv = [float(v) for v in e.where(F.col("vec_id") == 0).first()["embedding"]]
    scored = similarity.ivf_topk(
        e.where(F.col("vec_id") != 0), qv, k=None, n_cells=16, n_probe=16
    )
    return (
        scored.select("vec_id", pround("cosine_sim", 4).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "q35_simhash_near_dup_pairs",
    sql=_SIMHASH_SQL_CTE + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash near-dup pairs within Hamming radius 3 via pigeonhole "
        "block join (Manku et al. WWW'07) — no O(n^2) stage, and EXACT "
        "(pigeonhole covers every pair in radius), so the all-pairs SQL "
        "twin over the sha256-derived fingerprints grades it fully.",
    tags=("dedup", "documents"),
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_dups(load(spark, sf_dir, "documents"), max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


@register(
    "q46_doc_pii_redaction",
    sql="""
    WITH planted AS (
      SELECT doc_id,
             text ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                  ELSE '' END ||
             CASE WHEN doc_id % 11 = 0
                  THEN ' call 555-123-4567 or host 10.0.0.' || CAST(doc_id % 255 AS VARCHAR)
                  ELSE '' END AS text
      FROM documents
    ),
    s0 AS (SELECT doc_id, text AS t0 FROM planted),
    s1 AS (SELECT doc_id,
                  len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
                  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
           FROM s0),
    s2 AS (SELECT doc_id, n_email,
                  len(regexp_extract_all(t1, '\\+?\\d{1,3}[-. ]?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}')) AS n_phone,
                  regexp_replace(t1, '\\+?\\d{1,3}[-. ]?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}', '<PHONE>', 'g') AS t2
           FROM s1),
    s3 AS (SELECT doc_id, n_email, n_phone,
                  len(regexp_extract_all(t2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4,
                  regexp_replace(t2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g') AS t3
           FROM s2)
    SELECT doc_id, n_email, n_phone, n_ipv4,
           len(regexp_extract_all(t3, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS n_ssn,
           regexp_replace(t3, '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') AS redacted_text
    FROM s3
    """,
    doc="PII scrubbing for training corpora (emails/phones/IPv4/SSN -> "
        "typed sentinels + per-type counts), planted deterministically "
        "so the expected redactions are non-empty and SQL-rebuildable. "
        "Expression-only sequential regexp chain — a pure map at "
        "100 TB, no shuffle (llmdata.textstats.redact_pii).",
    tags=("text", "documents", "pii"),
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 7 == 0,
                F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com now")),
            ).otherwise(F.lit("")),
            F.when(
                did % 11 == 0,
                F.concat(F.lit(" call 555-123-4567 or host 10.0.0."), (did % 255).cast("string")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return textstats.redact_pii(planted)


@register(
    "q47_embedding_knn_join",
    sql="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id >= 8)
    SELECT query_id, vec_id,
           CAST(ROUND((list_cosine_similarity(v, qv)) * 1e4) AS BIGINT) / 1e4 AS cosine_sim
    FROM c CROSS JOIN q
    QUALIFY row_number() OVER (
      PARTITION BY query_id
      ORDER BY CAST(ROUND((list_cosine_similarity(v, qv)) * 1e4) AS BIGINT) / 1e4 DESC, vec_id
    ) <= 5
    """,
    doc="Batched k-NN join: top-5 corpus neighbors for each of 8 query "
        "vectors (retrieval-eval / hard-negative mining primitive).  "
        "Queries broadcast; one Arrow-batched cosine pass; salted two-"
        "phase top-k so no reducer ever holds a query's full similarity "
        "column (llmdata.similarity.knn_join).",
    tags=("similarity", "embeddings", "topk"),
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.where(F.col("vec_id") >= 8)
    return similarity.knn_join(corpus, queries, k=5)


@register(
    "q48_doc_split_assignment",
    sql="""
    WITH b AS (
      SELECT doc_id,
             ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS split_bucket
      FROM documents
    )
    SELECT doc_id, split_bucket,
           CASE WHEN split_bucket < 96 THEN 'train'
                WHEN split_bucket < 98 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    doc="Deterministic 96/2/2 train/val/test assignment by sha256 key "
        "hash (llmdata.sampling.assign_splits): a pure projection, no "
        "sampling RNG — appends and reruns land every document in the "
        "same split, the reproducible-dataset-release property "
        "Bernoulli sampleBy cannot give.  Pure map at 100 TB.",
    tags=("sampling", "documents"),
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.assign_splits(load(spark, sf_dir, "documents"))


@register(
    "q49_benchmark_decontamination",
    sql="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+7], ' ')
                            for i in generate_series(1, greatest(len(t) - 7, 1))]) AS g
      FROM toks
    ),
    bench AS (SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id < 10),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_overlapping_grams
      FROM (SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id >= 10)
      JOIN bench USING (gram)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_overlapping_grams, 0) AS n_overlapping_grams,
           COALESCE(h.n_overlapping_grams, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id >= 10) d
    LEFT JOIN hits h USING (doc_id)
    """,
    doc="Eval-set decontamination: flag training docs sharing any word "
        "8-gram with the benchmark slice (doc_id < 10) — the standard "
        "n-gram-collision leakage test.  Benchmark gram set broadcasts; "
        "the training side is checked with a broadcast semi join and "
        "never shuffles (llmdata.sampling.benchmark_ngram_overlap).  "
        "Non-vacuous on the graded corpora: the planted near-dup "
        "documents share 8-gram spans across the split boundary.",
    tags=("sampling", "dedup", "documents"),
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return sampling.benchmark_ngram_overlap(
        d.where(F.col("doc_id") >= 10), d.where(F.col("doc_id") < 10), n=8
    )


@register(
    "q29_etl_wide_record",
    sql="""
    WITH tagged AS (
      SELECT p_partkey,
             p_name || ' ' || CAST(p_size AS VARCHAR) || 'g x ' ||
             CAST(p_partkey % 20 + 1 AS VARCHAR) || ' (G' ||
             CAST(p_size % 20 AS VARCHAR) || ')' AS description
      FROM part
    )
    SELECT p_partkey, description,
           NULLIF(regexp_extract(description, '(\\d+\\.?\\d*)\\s*([a-zA-Z]{1,3})', 1), '') AS measure,
           lower(NULLIF(regexp_extract(description, '(\\d+\\.?\\d*)\\s*([a-zA-Z]{1,3})', 2), '')) AS unit,
           NULLIF(regexp_extract(description, 'x\\s*(\\d+)', 1), '') AS package_units,
           CAST(NULLIF(regexp_extract(description, '\\(\\s*[Gg]\\s*(\\d+)\\s*\\)', 1), '') AS INT) AS iva
    FROM tagged
    """,
    doc="The reference's full measure/unit/package/IVA extraction chain "
        "(SURVEY.md §2.3 F8-F13) under oracle, on synthesized messy "
        "descriptions.",
    tags=("etl", "scalar"),
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import scalar

    p = load(spark, sf_dir, "part")
    desc = F.concat(
        F.col("p_name"), F.lit(" "), F.col("p_size").cast("string"), F.lit("g x "),
        (F.col("p_partkey") % 20 + 1).cast("string"), F.lit(" (G"),
        (F.col("p_size") % 20).cast("string"), F.lit(")"),
    )
    return p.select(
        "p_partkey",
        desc.alias("description"),
        scalar.extract_measure(desc).alias("measure"),
        F.lower(scalar.extract_unit(desc)).alias("unit"),
        scalar.extract_package_units(desc).alias("package_units"),
        scalar.extract_iva(desc).alias("iva"),
    )


@register(
    "q42_doc_tfidf_top_terms",
    sql="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS term_freq FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, token, term_freq, doc_freq,
           CAST(ROUND((term_freq * ln(CAST(n_docs AS DOUBLE) / doc_freq)) * 1e6) AS BIGINT) / 1e6 AS tfidf
    FROM tf JOIN dfreq USING (token), n
    QUALIFY row_number() OVER (
      PARTITION BY doc_id ORDER BY term_freq DESC, doc_freq ASC, token ASC
    ) <= 5
    """,
    doc="Per-document top-5 terms by tf-idf (exact integer ranking keys; "
        "ln-based score emitted as decimal).  Scale: one explode shuffle "
        "for tf, token-keyed doc-freq agg, broadcast single-row corpus "
        "count; per-doc window bounded by vocabulary size.",
    tags=("text", "documents", "tfidf"),
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.tf_idf_top_terms(load(spark, sf_dir, "documents"))


@register(
    "q50_doc_repetition_stats",
    sql="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
    ),
    tok AS (SELECT doc_id, unnest(t) AS g FROM toks),
    tc AS (SELECT doc_id, g, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    ts AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct_tokens, CAST(MAX(c) AS BIGINT) AS top_token_freq
      FROM tc GROUP BY 1
    ),
    bgl AS (
      SELECT doc_id, [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t) - 1)] AS b
      FROM toks
    ),
    bgx AS (SELECT doc_id, unnest(b) AS g FROM bgl),
    bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bgx GROUP BY 1, 2),
    bs AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             COUNT(*) AS n_distinct_bigrams, CAST(MAX(c) AS BIGINT) AS top_bigram_freq
      FROM bc GROUP BY 1
    )
    SELECT doc_id, n_tokens, n_distinct_tokens, top_token_freq,
           CAST(ROUND((top_token_freq / CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 AS top_token_frac,
           CAST(ROUND(((n_tokens - n_distinct_tokens) / CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 AS dup_token_frac,
           n_bigrams, n_distinct_bigrams, top_bigram_freq,
           CAST(ROUND((top_bigram_freq / CAST(n_bigrams AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 AS top_bigram_frac,
           CAST(ROUND(((n_bigrams - n_distinct_bigrams) / CAST(n_bigrams AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 AS dup_bigram_frac
    FROM ts JOIN bs USING (doc_id)
    """,
    doc="Within-document repetition metrics (Gopher repetition filters, "
        "Rae et al. 2021): top-token/top-bigram dominance and duplicate "
        "n-gram mass per document — the boilerplate/template-spam "
        "signal quality filters threshold on.  Two partial-aggregatable "
        "uniform-key shuffle stages per n-gram order, distribution-"
        "reusing final join, no Python "
        "(llmdata.textstats.repetition_stats).",
    tags=("text", "documents", "quality"),
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.repetition_stats(load(spark, sf_dir, "documents"))


@register(
    "q51_stratified_sample",
    sql="""
    WITH b AS (
      SELECT doc_id, lang,
             ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
               AS sample_bucket
      FROM documents
    )
    SELECT doc_id, lang, sample_bucket FROM b
    WHERE sample_bucket < CASE lang
      WHEN 'en' THEN 10000 WHEN 'es' THEN 5000 WHEN 'fr' THEN 2500
      WHEN 'de' THEN 1000 WHEN 'zh' THEN 200 ELSE 0 END
    """,
    doc="Deterministic stratified downsampling by language (corpus-"
        "mixture primitive: keep all English, half Spanish, ..., 2% "
        "Chinese).  Keep iff sha256(doc_id) % 10000 < stratum rate — "
        "no RNG, no shuffle, append/rerun-stable, and nested across "
        "rates (raising a budget only adds documents), the property "
        "that makes ablation corpora comparable "
        "(llmdata.sampling.stratified_sample).  Pure filter at 100 TB.",
    tags=("sampling", "documents"),
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.stratified_sample(
        load(spark, sf_dir, "documents"),
        {"en": 10_000, "es": 5_000, "fr": 2_500, "de": 1_000, "zh": 200},
    )


@register(
    "q52_dedup_clusters",
    sql="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents
    ),
    -- postings-join pair mining (q24's formulation): the naive
    -- all-pairs list_intersect was 16s of the driver's shared grading
    -- budget at sf0.01; the inverted-index join with the size-ratio
    -- prefilter (jaccard >= 0.95 forces min-size >= 0.95*max-size)
    -- computes identical pairs in ~0.3s
    dsz AS (SELECT doc_id, len(t) AS n FROM toks),
    posts AS (SELECT doc_id, len(t) AS n, unnest(t) AS tok FROM toks),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
      FROM posts a JOIN posts b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
       AND least(a.n, b.n) >= 0.95 * greatest(a.n, b.n) - 1e-9
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN dsz sa ON sa.doc_id = id_a
      JOIN dsz sb ON sb.doc_id = id_b
      WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.95
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    -- recurse ONLY over nodes that have edges: singletons (the vast
    -- majority of any deduped corpus) are their own component by
    -- definition and would otherwise bloat the recursive working set
    -- ~200x (13s -> 0.1s at sf0.01) — oracle cost counts against the
    -- driver's shared grading budget
    enodes AS (SELECT DISTINCT s AS n FROM edges),
    reach(n, comp) AS (
      SELECT n, n FROM enodes
      UNION
      -- propagate only labels SMALLER than the receiving node: the
      -- min label m of a component satisfies m < every other member,
      -- so every hop of its propagation path passes this filter, and
      -- all larger (doomed) labels stop spreading
      SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.n AND r.comp < e.d
    ),
    cc AS (
      SELECT n AS doc_id, MIN(comp) AS component_id FROM reach GROUP BY n
      UNION ALL
      SELECT d.doc_id, d.doc_id FROM documents d
      WHERE d.doc_id NOT IN (SELECT n FROM enodes)
    ),
    sizes AS (SELECT component_id, COUNT(*) AS cluster_size FROM cc GROUP BY 1)
    SELECT doc_id, component_id, cluster_size, doc_id = component_id AS is_canonical
    FROM cc JOIN sizes USING (component_id)
    """,
    doc="Near-duplicate cluster assignment: exact Jaccard pairs at 0.95 "
        "(prefix-filtered mining), distributed connected components by "
        "min-label propagation (2-3 rounds on quasi-clique dup "
        "clusters; large-star/small-star is the same label contract "
        "for adversarial diameters), min-id canonical election — the "
        "keep-one-per-cluster step that turns pairwise dedup verdicts "
        "into a training-set filter (llmdata.dedup.dedup_clusters).  "
        "Oracle: DuckDB recursive-CTE min-reachable-id closure.",
    tags=("dedup", "documents", "graph"),
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_clusters(load(spark, sf_dir, "documents"), threshold=0.95)


@register(
    "q53_sequence_packing",
    sql="""
    WITH t AS (
      SELECT doc_id,
             ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
             CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    w AS (
      SELECT doc_id, CAST(h % 8 AS INT) AS shard_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY h % 8 ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, shard_id, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start_offset,
           CAST((cum - n_tokens) // 512 AS BIGINT) AS chunk_id,
           ((cum - 1) // 512) > ((cum - n_tokens) // 512) AS spans_chunks
    FROM w
    """,
    doc="Concat-and-chunk sequence packing (llmdata.sampling."
        "pack_sequences): documents laid end-to-end per shard in "
        "deterministic keyhash order, the stream cut into 512-token "
        "chunks — each doc's shard, stream offset, landing chunk, and "
        "boundary-straddle flag.  ONE hash-partitioned window (per-"
        "shard running token sum); shard count scales with the "
        "cluster, so no task holds more than corpus/n_shards tokens.",
    tags=("sampling", "packing", "documents"),
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.pack_sequences(
        load(spark, sf_dir, "documents"), budget_tokens=512, n_shards=8
    )


@register(
    "q54_embedding_quantize_int8",
    sql="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    s AS (
      SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM v
    ),
    q AS (
      SELECT vec_id, v, scale,
             CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
                  ELSE list_transform(v, x -> CAST(round(x / scale) AS INT)) END AS qvec
      FROM s
    )
    SELECT vec_id,
           CAST(ROUND((scale) * 1e6) AS BIGINT) / 1e6 AS scale,
           CASE WHEN len(qvec) = 0 THEN '' ELSE array_to_string(qvec, ',') END AS qvec_csv,
           CASE WHEN len(v) = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(ROUND((sqrt(list_reduce(list_transform(list_zip(v, qvec),
                       p -> pow(p[1] - CAST(p[2] AS DOUBLE) * scale, 2)),
                       (a, b) -> a + b) / len(v))) * 1e6) AS BIGINT) / 1e6 END AS recon_rmse
    FROM q
    """,
    doc="Row-wise absmax int8 embedding quantization + reconstruction "
        "RMSE (llmdata.similarity.quantize_embeddings_int8): the 4x "
        "embedding-store compression step of a serving/ANN pipeline, "
        "as a shuffle-free codegen projection.  Fixed-order double "
        "math makes the rounded outputs engine-reproducible; the "
        "DuckDB twin folds with list_reduce in the same order.  The "
        "GRADED output serializes the int8 vector as a CSV string "
        "(qvec_csv) — the correctness gate's canonicalizer hashes "
        "scalars, not arrays (r02 lesson: a raw array<int> column "
        "crashed pandas sort_values with 'unhashable type: list'); "
        "the array-valued API stays on quantize_embeddings_int8.",
    tags=("similarity", "embeddings", "quantization"),
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = similarity.quantize_embeddings_int8(load(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "scale",
        F.array_join(F.col("qvec").cast("array<string>"), ",").alias("qvec_csv"),
        "recon_rmse",
    )


@register(
    "q55_chunk_dedup",
    sql="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, i AS chunk_idx,
             array_to_string(t[(i*20+1):(i*20+20)], ' ') AS chunk_text
      FROM toks,
           UNNEST(generate_series(0,
             GREATEST(CAST(ceil(len(t)/20.0) AS INT) - 1, 0))) AS g(i)
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY chunk_text ORDER BY doc_id, chunk_idx) AS rn
      FROM chunks
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
           COALESCE(array_to_string(
             list(chunk_text ORDER BY chunk_idx) FILTER (WHERE rn = 1), ' '),
             '') AS clean_text
    FROM ranked GROUP BY doc_id
    """,
    doc="Sub-document chunk-level exact dedup (llmdata.dedup.chunk_dedup): "
        "20-token chunks, global first occurrence wins, surviving text "
        "reassembled — the paragraph-granularity dedup pass that document-"
        "level dedup misses (boilerplate recurring across unrelated docs).",
    tags=("llmdata", "dedup", "documents"),
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.chunk_dedup(load(spark, sf_dir, "documents"), chunk_tokens=20)


@register(
    "q56_c4_document_filters",
    sql="""
    WITH t AS (
      SELECT doc_id, text, lower(text) AS lt,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) >= 5 AS enough_words,
           COALESCE(list_max(list_transform(toks, x -> length(x))) <= 50,
                    FALSE) AS no_giant_word,
           NOT contains(lt, '{') AND NOT contains(lt, '}') AS no_code_marker,
           NOT contains(lt, 'lorem ipsum') AS no_lorem,
           NOT contains(lt, 'javascript') AS no_js_marker,
           COALESCE(CAST(length(text) AS DOUBLE) / NULLIF(len(toks), 0)
                    BETWEEN 2.0 AND 12.0, FALSE) AS sane_word_len,
           (len(toks) >= 5)
             AND COALESCE(list_max(list_transform(toks, x -> length(x))) <= 50, FALSE)
             AND NOT contains(lt, '{') AND NOT contains(lt, '}')
             AND NOT contains(lt, 'lorem ipsum')
             AND NOT contains(lt, 'javascript')
             AND COALESCE(CAST(length(text) AS DOUBLE) / NULLIF(len(toks), 0)
                          BETWEEN 2.0 AND 12.0, FALSE) AS keep
    FROM t
    """,
    doc="C4-style boolean filter bank (llmdata.textstats."
        "c4_document_filters): word-count / word-length / code-marker / "
        "boilerplate gates, each a column plus the conjunction — the "
        "scan-speed first pass of a pretraining corpus pipeline.",
    tags=("llmdata", "text", "documents"),
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.c4_document_filters(load(spark, sf_dir, "documents"))


@register(
    "q57_token_budget_sample",
    sql="""
    SELECT doc_id, source,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             <= 700 AS kept
    FROM documents
    """,
    doc="Per-domain token-budget mixing (llmdata.sampling."
        "token_budget_sample): deterministic doc order, running token "
        "sum per source, kept while the inclusive cumulative count is "
        "within the 700-token domain cap.",
    tags=("llmdata", "sampling", "documents"),
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.token_budget_sample(
        load(spark, sf_dir, "documents"), budget_tokens=700
    )


@register(
    "q58_vocab_coverage",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY token
    ),
    total AS (SELECT CAST(SUM(tf) AS DOUBLE) AS t FROM counts),
    top AS (
      SELECT token, tf, df,
             CAST(row_number() OVER (ORDER BY tf DESC, token) AS INT) AS rank
      FROM counts ORDER BY tf DESC, token LIMIT 100
    )
    SELECT token, tf, df, rank,
           CAST(ROUND((SUM(tf) OVER (ORDER BY tf DESC, token
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t) * 1e6) AS BIGINT) / 1e6
             AS cum_coverage
    FROM top, total
    """,
    doc="Corpus vocabulary statistics (llmdata.textstats.vocab_coverage): "
        "token/document frequency, rank, and cumulative coverage of a "
        "top-100 vocabulary — the tokenizer-sizing / OOV-rate primitive.",
    tags=("llmdata", "text", "documents"),
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.vocab_coverage(load(spark, sf_dir, "documents"), top_k=100)


@register(
    "q59_unigram_perplexity",
    sql="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    counts AS (SELECT token, COUNT(*) AS tf FROM tok GROUP BY token),
    total AS (SELECT CAST(SUM(tf) AS DOUBLE) AS t FROM counts),
    ll AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             SUM(ln(tf / t)) AS s
      FROM tok JOIN counts USING (token), total
      GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(ROUND((-s / n_tokens) * 1e6) AS BIGINT) / 1e6 AS neg_avg_logprob,
           CAST(ROUND((exp(-s / n_tokens)) * 1e4) AS BIGINT) / 1e4 AS perplexity
    FROM ll
    """,
    doc="Unigram-LM perplexity quality scoring (llmdata.textstats."
        "unigram_perplexity): CCNet's filter signal with the corpus "
        "itself as the LM — outlier perplexity flags degenerate text.",
    tags=("llmdata", "text", "documents"),
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.unigram_perplexity(load(spark, sf_dir, "documents"))


@register(
    "q60_semantic_dedup",
    sql="""
    WITH RECURSIVE aug AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, [x * 2.0 for x in CAST(embedding AS DOUBLE[])]
      FROM embeddings WHERE vec_id < 20
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM aug a JOIN aug b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.9
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    enodes AS (SELECT DISTINCT s AS n FROM edges),
    reach(n, comp) AS (
      SELECT n, n FROM enodes
      UNION
      -- propagate only labels SMALLER than the receiving node: the
      -- min label m of a component satisfies m < every other member,
      -- so every hop of its propagation path passes this filter, and
      -- all larger (doomed) labels stop spreading
      SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.n AND r.comp < e.d
    ),
    cc AS (
      SELECT n AS vec_id, MIN(comp) AS component_id FROM reach GROUP BY n
      UNION ALL
      SELECT a.vec_id, a.vec_id FROM aug a
      WHERE a.vec_id NOT IN (SELECT n FROM enodes)
    ),
    sizes AS (SELECT component_id, COUNT(*) AS cluster_size FROM cc GROUP BY 1)
    SELECT vec_id, component_id, cluster_size,
           vec_id = component_id AS is_canonical
    FROM cc JOIN sizes USING (component_id)
    """,
    doc="SemDeDup-style semantic dedup (llmdata.similarity."
        "semantic_dedup): embedding near-dup pairs (LSH + exact verify) "
        "-> connected components -> min-id canonical election.  Same "
        "planted 2x-scaled copies as q28 so the expected cluster set is "
        "non-empty and deterministic (scaling preserves cosine exactly); "
        "oracle = all-pairs cosine + recursive-CTE closure.",
    tags=("llmdata", "dedup", "embeddings", "graph"),
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 2.0).alias("embedding"),
    )
    aug = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).unionByName(planted)
    return similarity.semantic_dedup(aug, threshold=0.9, dim=64)


# Messy-URL synthesis shared by q62: deterministic per-doc noise
# (uppercase scheme/host, www, default port, tracking params on every
# 3rd doc, fragment on every 5th) so the canonicalizer has real work,
# mirrored 1:1 in the oracle SQL.
def _synth_url() -> F.Column:
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".Example.COM:443/"),
        F.col("lang"),
        F.lit("/doc/"),
        did,
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("/?utm_source=feed&utm_campaign=x&id="), did),
        ).otherwise(F.lit("/")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


_SYNTH_URL_SQL = """
      SELECT doc_id,
             'HTTPS://WWW.' || source || '.Example.COM:443/' || lang
               || '/doc/' || doc_id
               || CASE WHEN doc_id % 3 = 0
                       THEN '/?utm_source=feed&utm_campaign=x&id=' || doc_id
                       ELSE '/' END
               || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
      FROM documents
"""


@register(
    "q62_url_canonicalize",
    sql=f"""
    WITH urls AS ({_SYNTH_URL_SQL}),
    c1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u FROM urls),
    c2 AS (SELECT doc_id, url, regexp_replace(
             u, '([?&])(utm_[a-z]+|fbclid|gclid|ref|mc_cid|mc_eid)=[^&#]*',
             '\\1', 'g') AS u FROM c1),
    c3 AS (SELECT doc_id, url,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               u, '\\?&+', '?'), '&&+', '&', 'g'),
               '(\\?[^#]*?)[?&]+$', '\\1'), '\\?+$', '') AS u
           FROM c2),
    canon AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(
               lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)),
               '^([a-z][a-z0-9+.-]*://)www\\.', '\\1'), ':(80|443)$', '')
             || regexp_replace(
                  regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
                  '^(/[^?#]+?)/+(\\?|$)', '\\1\\2') AS url_canonical
      FROM c3
    ),
    parts AS (
      SELECT doc_id, url, url_canonical,
             regexp_extract(url_canonical,
               '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1) AS host,
             regexp_extract(url_canonical,
               '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
             regexp_extract(url_canonical, '\\?([^#]*)$', 1) AS query
      FROM canon
    )
    SELECT doc_id, url, url_canonical, host,
           regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
           path,
           CASE WHEN path IN ('', '/') THEN 0
                ELSE len(string_split(regexp_replace(path, '^/|/$', '', 'g'), '/'))
           END AS path_depth,
           CASE WHEN query = '' THEN 0
                ELSE len(string_split(query, '&')) END AS n_query_params
    FROM parts
    """,
    doc="URL canonicalization + decomposition (llmdata.urls.parse_urls): "
        "strip fragments/tracking params/default ports/www/case noise, "
        "extract host/registered-domain/path-depth/param-count.  Pure "
        "regexp projection, zero shuffles — the normalization pass "
        "URL-level dedup and per-domain quotas key on.  Regexes avoid "
        "lookarounds so Java regex and RE2 agree byte-for-byte.",
    tags=("llmdata", "urls", "documents"),
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", _synth_url().alias("url")
    )
    return urls.parse_urls(d, "url").select(
        "doc_id", "url", "url_canonical", "host", "domain",
        "path", "path_depth", "n_query_params",
    )


@register(
    "q63_length_buckets",
    sql="""
    SELECT doc_id, lang,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           NTILE(8) OVER (PARTITION BY lang
                          ORDER BY len(string_split_regex(trim(text), '\\s+')),
                                   doc_id) AS bucket
    FROM documents
    """,
    doc="Length-bucketed batch assignment (llmdata.sampling."
        "length_buckets): equal-frequency NTILE over token count per "
        "language — the padding-waste-minimizing batching layout.  One "
        "window shuffle on lang.",
    tags=("llmdata", "sampling", "documents"),
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.length_buckets(load(spark, sf_dir, "documents"), n_buckets=8)


@register(
    "q64_temperature_mixture",
    sql="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS cnt,
             CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1e6) AS BIGINT) AS weight
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(weight) AS tw FROM counts),
    quotas AS (
      -- SUM(BIGINT) is HUGEINT in DuckDB (fetches as float): pin the
      -- whole quota expression back to BIGINT for the integer contract
      SELECT lang,
             CAST(LEAST(cnt, (300 * weight) // CAST(tw AS BIGINT)) AS BIGINT)
               AS group_quota
      FROM counts, tot
    ),
    ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id)
               AS hash_rank
      FROM documents
    )
    SELECT doc_id, lang, hash_rank, group_quota,
           hash_rank <= group_quota AS kept
    FROM ranked JOIN quotas USING (lang)
    """,
    doc="Temperature-weighted mixture sampling (llmdata.sampling."
        "temperature_mixture_sample, alpha=1/2): per-language quotas "
        "proportional to count^0.5 (the multilingual upsampling rule), "
        "selection by sha256 rank.  Quotas computed in INTEGER "
        "arithmetic end-to-end (floor(sqrt*1e6) weights, integer div) "
        "so no cross-group double sum can flip an allocation vs the "
        "oracle.",
    tags=("llmdata", "sampling", "documents"),
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.temperature_mixture_sample(
        load(spark, sf_dir, "documents"), target_docs=300, group_col="lang"
    )


@register(
    "q65_embedding_decontamination",
    sql="""
    WITH bench AS (
      SELECT vec_id AS bid, CAST(embedding AS DOUBLE[]) AS bv
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    train AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % 50 <> 0
    )
    SELECT vec_id,
           CAST(ROUND((MAX(list_dot_product(v, bv)
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(bv, bv))))) * 1e4) AS BIGINT) / 1e4 AS max_benchmark_cos,
           CAST(ROUND((MAX(list_dot_product(v, bv)
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(bv, bv))))) * 1e4) AS BIGINT) / 1e4 >= 0.95 AS contaminated
    FROM train CROSS JOIN bench
    GROUP BY vec_id
    """,
    doc="Embedding-space benchmark decontamination (llmdata.similarity."
        "embedding_decontaminate): max cosine of each training vector "
        "against a broadcast benchmark set — catches paraphrased eval "
        "leakage the 8-gram check (q49) misses.  Map-only over the "
        "training side; benchmark side broadcasts.",
    tags=("llmdata", "similarity", "embeddings"),
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    bench = e.where(F.col("vec_id") % 50 == 0)
    train = e.where(F.col("vec_id") % 50 != 0)
    return similarity.embedding_decontaminate(train, bench, threshold=0.95)


@register(
    "q66_snapshot_diff",
    sql="""
    WITH oldfp AS (
      SELECT doc_id,
             sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS old_sha
      FROM documents
    ),
    newdocs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN text || ' updated' ELSE text END AS text
      FROM documents WHERE doc_id % 17 <> 0
      UNION ALL
      SELECT doc_id + 900000, text FROM documents WHERE doc_id < 10
    ),
    newfp AS (
      SELECT doc_id,
             sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS new_sha
      FROM newdocs
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.old_sha IS NULL THEN 'added'
                WHEN n.new_sha IS NULL THEN 'deleted'
                WHEN o.old_sha = n.new_sha THEN 'unchanged'
                ELSE 'changed' END AS status,
           o.old_sha, n.new_sha
    FROM oldfp o FULL OUTER JOIN newfp n USING (doc_id)
    """,
    doc="Incremental-crawl snapshot diff (llmdata.dedup.snapshot_diff): "
        "classify ids across two corpus snapshots as added/deleted/"
        "changed/unchanged by normalized-content sha256 — the gate that "
        "turns a 100 TB refresh into an incremental pass.  Synthesized "
        "second snapshot: every 17th doc deleted, every 13th edited, 10 "
        "new ids.  Shuffle carries (id, hash) only, never text.",
    tags=("llmdata", "dedup", "documents"),
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    edited = F.when(
        F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" updated"))
    ).otherwise(F.col("text"))
    new = (
        d.where(F.col("doc_id") % 17 != 0)
        .select("doc_id", edited.alias("text"))
        .unionByName(
            d.where(F.col("doc_id") < 10).select(
                (F.col("doc_id") + 900000).alias("doc_id"), "text"
            )
        )
    )
    return dedup.snapshot_diff(d, new)


@register(
    "q69_jsonl_roundtrip",
    sql="""
    SELECT doc_id, lang,
           sha256(text) AS text_sha256,
           length(text) AS n_chars
    FROM documents
    """,
    doc="JSONL sink+source round trip (sources.jsonl.write_jsonl / "
        "read_jsonl): documents -> gzip JSONL partitioned by lang -> "
        "schema-enforced permissive read-back -> per-doc content sha.  "
        "The oracle computes the sha from the original table, so a "
        "green row proves byte-exact round-trip fidelity through the "
        "interchange format training pipelines ship (JSON escaping, "
        "unicode, partition-column reconstruction).",
    tags=("llmdata", "sources", "documents"),
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from ..sources import jsonl

    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    path = tempfile.mkdtemp(prefix="q69_jsonl_")
    jsonl.write_jsonl(d, path, partition_by=["lang"], compression="gzip", shards=8)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    back = jsonl.read_jsonl(spark, path, schema)
    return back.select(
        "doc_id",
        "lang",
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.length("text").alias("n_chars"),
    )


@register(
    "q70_html_text_extraction",
    sql="""
    WITH pages AS (
      SELECT doc_id,
             '<html><head><title>t</title><style>p{color:red}</style>'
             || '<script>var x = 1 < 2;</script></head><body><h1>'
             || lang || '</h1><!-- nav --><p>' || text
             || '</p><div class="footer">&copy; ' || source
             || ' &amp; co</div></body></html>' AS html
      FROM documents
    ),
    ex AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 regexp_replace(
                   html,
                   '(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<head[^>]*>.*?</head>',
                   ' ', 'g'),
                 '(?s)<!--.*?-->', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
               '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
               '&quot;', '"', 'g'), '&#39;', '''', 'g'), '&amp;', '&', 'g'),
               '\\s+', ' ', 'g')) AS extracted
      FROM pages
    )
    SELECT doc_id, sha256(extracted) AS extracted_sha256,
           length(extracted) AS n_chars
    FROM ex
    """,
    doc="HTML -> text main-content extraction (llmdata.textstats."
        "html_to_text): strip script/style/head blocks, comments, tags; "
        "decode entities; collapse whitespace — the deterministic "
        "pre-filter extraction pass of a crawl pipeline, as a pure "
        "codegen regexp chain (no UDF, no shuffle).  Graded on "
        "synthesized pages wrapping each document in boilerplate "
        "(script with a '<' in code, comment, entity-bearing footer).",
    tags=("llmdata", "text", "documents"),
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(
            '<html><head><title>t</title><style>p{color:red}</style>'
            "<script>var x = 1 < 2;</script></head><body><h1>"
        ),
        F.col("lang"),
        F.lit("</h1><!-- nav --><p>"),
        F.col("text"),
        F.lit('</p><div class="footer">&copy; '),
        F.col("source"),
        F.lit(" &amp; co</div></body></html>"),
    )
    extracted = textstats.html_to_text(html)
    return d.select(
        "doc_id",
        F.sha2(extracted, 256).alias("extracted_sha256"),
        F.length(extracted).alias("n_chars"),
    )


@register(
    "q71_unicode_nfc_dedup_keys",
    sql="""
    SELECT doc_id,
           sha256(nfc_normalize(text || ' nfc:cafe' || chr(769) || ' ' || chr(8491)))
             AS nfc_sha256,
           length(nfc_normalize(text || ' nfc:cafe' || chr(769) || ' ' || chr(8491)))
             AS n_chars_nfc
    FROM documents
    """,
    doc="Unicode NFC normalization (llmdata.textstats.nfc_normalize) as "
        "the dedup-key canonicalization pass: every doc gets a "
        "decomposed-accent + angstrom-sign suffix planted, and both "
        "engines must compose it identically (U+0065 U+0301 -> U+00E9, "
        "U+212B -> U+00C5) before hashing.  Spark side is a deliberate "
        "Arrow-batched pandas_udf (no native normalizer); the oracle is "
        "DuckDB's nfc_normalize — same Unicode standard, so the sha "
        "and the post-NFC codepoint count must match exactly.",
    tags=("llmdata", "text", "documents"),
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # explicitly DECOMPOSED plant (e + combining acute, angstrom sign
    # U+212B) so the Spark side genuinely composes, same as the oracle
    planted = F.concat(F.col("text"), F.lit(" nfc:cafe\u0301 \u212b"))
    norm = textstats.nfc_normalize(planted)
    return d.select(
        "doc_id",
        F.sha2(norm, 256).alias("nfc_sha256"),
        F.length(norm).alias("n_chars_nfc"),
    )


@register(
    "q72_llmdata_pipeline_e2e",
    sql="""
    WITH filt AS (
      SELECT doc_id, text FROM documents
      WHERE len(string_split_regex(trim(text), '\\s+')) >= 10
    ),
    winners AS (
      SELECT MIN(doc_id) AS doc_id FROM filt GROUP BY sha256(text)
    ),
    ex AS (SELECT f.doc_id, f.text FROM filt f JOIN winners USING (doc_id)),
    toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM ex
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
      SELECT DISTINCT id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.7
    ),
    surv AS (
      SELECT doc_id, text FROM ex
      WHERE doc_id NOT IN (SELECT id_b FROM losers)
    )
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           CASE WHEN ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 96 THEN 'train'
                WHEN ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 98 THEN 'val'
                ELSE 'test' END AS split
    FROM surv
    """,
    doc="End-to-end LLM-data pipeline (second flagship, composing the "
        "llmdata operators the way a user would): quality gate (>= 10 "
        "tokens) -> exact dedup (min-id per content sha) -> MinHash-LSH "
        "near-dedup at 0.7 Jaccard (verified, q25's contract) -> "
        "deterministic 96/2/2 split assignment.  Oracle = the composed "
        "SQL of each stage's twin.  Scale: each stage keeps its own "
        "posture (codegen filter, two id-hash shuffles, band join "
        "carrying 64-bit keys, hash-projection splits) — composition "
        "adds no new shuffle beyond the stages' own.",
    tags=("llmdata", "pipeline", "dedup", "sampling", "documents"),
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    filt = d.where(n_tok >= 10)
    ex = dedup.exact_dedup(filt)
    surv = dedup.minhash_dedup(ex)
    # split assignment is a PURE PROJECTION on hash(doc_id) — apply it
    # directly to the survivors instead of joining assign_splits(surv)
    # back in: the join form re-executed the whole minhash-dedup DAG on
    # both sides plus one extra shuffle (measured 3.1 -> ~2.3 s at
    # sf0.1; at 100 TB it would have doubled the dominant stage).
    bucket = F.pmod(sampling._sha60(F.col("doc_id")), F.lit(100))
    split = sampling._split_expr(bucket, sampling.DEFAULT_SPLIT_WEIGHTS)
    return surv.select(
        "doc_id", n_tok.alias("n_tokens"), split.alias("split")
    )


@register(
    "q74_corpus_datacard",
    sql="""
    WITH base AS (
      SELECT doc_id, text, lang, source,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS sha
      FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_doc_tokens,
           CAST(MIN(n_tokens) AS BIGINT) AS min_doc_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_doc_tokens,
           COUNT(*) - COUNT(DISTINCT sha) AS n_exact_dup_docs,
           CAST(COUNT(*) - COUNT(DISTINCT sha) AS DOUBLE) / COUNT(*) AS exact_dup_rate
    FROM base
    """,
    doc="Corpus data card: the one-row release summary (doc/token "
        "totals, language/source coverage, length stats, exact-dup "
        "rate by normalized sha) every dataset release publishes.  One "
        "full scan, partial-aggregated; distinct-sha counting is the "
        "only shuffle and carries 64-byte hashes.",
    tags=("llmdata", "agg", "documents"),
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sha = F.sha2(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), 256
    )
    base = d.select(
        "lang", "source", n_tokens.alias("n_tokens"), sha.alias("sha")
    )
    return base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("mean_doc_tokens"),
        F.min("n_tokens").cast("long").alias("min_doc_tokens"),
        F.max("n_tokens").cast("long").alias("max_doc_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("sha")).alias("n_exact_dup_docs"),
        (
            (F.count(F.lit(1)) - F.countDistinct("sha")).cast("double")
            / F.count(F.lit(1))
        ).alias("exact_dup_rate"),
    )


@register(
    "q75_orc_roundtrip",
    sql="""
    SELECT doc_id, lang,
           sha256(text) AS text_sha256
    FROM documents
    """,
    doc="ORC sink+source round trip: documents -> ORC (zlib, "
        "partitioned by lang) -> schema-enforced read-back -> content "
        "sha vs the oracle's sha of the original table.  Completes the "
        "columnar source matrix (parquet native, ORC here, JSONL q69, "
        "CSV throughout the ETL surface); ORC is the other splittable "
        "columnar format large pipelines inherit.",
    tags=("llmdata", "sources", "documents"),
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    path = tempfile.mkdtemp(prefix="q75_orc_")
    (
        d.write.mode("overwrite")
        .option("compression", "zlib")
        .partitionBy("lang")
        .orc(path)
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    back = spark.read.schema(schema).orc(path)
    return back.select(
        "doc_id", "lang", F.sha2(F.col("text"), 256).alias("text_sha256")
    )


@register(
    "q76_sliding_window_chunks",
    sql="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(generate_series(0, greatest(len(toks) - 1, 0), 24)) AS start,
             generate_subscripts(generate_series(0, greatest(len(toks) - 1, 0), 24), 1) - 1
               AS chunk_idx
      FROM t
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text,
           CAST(LEAST(32, n - start) AS INT) AS n_tokens
    FROM s
    """,
    doc="Sliding-window document chunking (llmdata.sampling."
        "chunk_documents, 32-token windows, 8-token overlap -> stride "
        "24): the RAG/long-document context-window pass.  Pure "
        "generate-and-explode projection — zero shuffles, zero UDFs; "
        "rows ~ tokens/stride per doc, produced inside the scan stage.",
    tags=("llmdata", "sampling", "documents"),
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.chunk_documents(
        load(spark, sf_dir, "documents"), chunk_tokens=32, overlap_tokens=8
    )


@register(
    "q77_url_dedup",
    sql="""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
    FROM documents
    GROUP BY doc_id // 3
    """,
    doc="URL-level dedup (llmdata.urls.url_dedup): every 3 consecutive "
        "doc ids get VARIANT urls of the same logical page (plain / "
        "uppercase-host+port+tracking-params / fragment) — the "
        "canonicalizer must collapse each triple to its min-id "
        "survivor.  The oracle is INDEPENDENT of the canonicalizer "
        "(it derives the page group arithmetically), so a canon bug "
        "that merges or splits groups is caught, not mirrored.  "
        "Shuffle-free canon projection + one hash agg on the "
        "canonical string.",
    tags=("llmdata", "urls", "dedup", "documents"),
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    page = F.expr("doc_id div 3").cast("string")
    variant = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://example.com/page/"), page),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("HTTPS://WWW.EXAMPLE.COM:443/page/"), page,
                F.lit("/?utm_source=x&utm_medium=y"),
            ),
        )
        .otherwise(
            F.concat(F.lit("https://example.com/page/"), page, F.lit("#frag"))
        )
    )
    return urls.url_dedup(d.withColumn("url", variant)).select("doc_id")


@register(
    "q79_embedding_quality_stats",
    sql="""
    WITH n AS (
      SELECT label,
             CAST(CAST(ROUND((sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))) * 1e6) AS BIGINT) / 1e6
                  AS DECIMAL(18,6)) AS n6
      FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(SUM(n6) AS DOUBLE) / COUNT(*) AS mean_norm,
           CAST(MIN(n6) AS DOUBLE) AS min_norm,
           CAST(MAX(n6) AS DOUBLE) AS max_norm,
           CAST(SUM(CASE WHEN n6 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_vectors
    FROM n GROUP BY label
    """,
    doc="Per-label embedding QA stats (llmdata.similarity."
        "embedding_quality_stats): count, mean/min/max L2 norm, "
        "zero-vector count — the post-encoding health check.  Norms "
        "are rounded to 6dp and decimal-cast BEFORE summing so the "
        "mean is aggregation-order-free (raw double sums across rows "
        "are not engine-portable).",
    tags=("llmdata", "embeddings", "agg"),
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_quality_stats(load(spark, sf_dir, "embeddings"))


@register(
    "q81_incremental_dedup",
    sql="""
    WITH b1 AS (
      SELECT doc_id,
             sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS sha
      FROM documents WHERE doc_id % 2 = 0
    ),
    b2 AS (
      SELECT doc_id,
             sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS sha
      FROM documents WHERE doc_id % 2 = 1
    ),
    unseen AS (
      SELECT doc_id, sha FROM b2
      WHERE sha NOT IN (SELECT sha FROM b1)
    )
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM unseen GROUP BY sha
    """,
    doc="Cross-batch incremental dedup (llmdata.dedup.incremental_"
        "dedup): batch 2 (odd ids) deduped against batch 1's (even "
        "ids) accumulated content-hash index, then within itself — "
        "O(batch + index probe) per ingest instead of re-deduplicating "
        "history.  Output: batch-2 survivors.",
    tags=("llmdata", "dedup", "documents"),
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    b1 = d.where(F.col("doc_id") % 2 == 0)
    b2 = d.where(F.col("doc_id") % 2 == 1)
    _, seen = dedup.incremental_dedup(b1, None)
    fresh, _ = dedup.incremental_dedup(b2, seen)
    return fresh.select("doc_id")


@register(
    "q83_scd2_dimension_history",
    sql="""
    WITH base AS (
      SELECT p_partkey, CAST(p_retailprice AS DECIMAL(18,2)) AS price
      FROM part
    ),
    changed AS (SELECT p_partkey FROM base WHERE p_partkey % 5 = 0)
    SELECT p_partkey,
           CAST(price AS DOUBLE) AS price,
           CAST(DATE '2024-01-01' AS VARCHAR) AS valid_from,
           CAST(DATE '2024-02-01' AS VARCHAR) AS valid_to,
           FALSE AS is_current
    FROM base WHERE p_partkey IN (SELECT p_partkey FROM changed)
    UNION ALL
    SELECT p_partkey,
           CAST(price + 1 AS DOUBLE),
           CAST(DATE '2024-02-01' AS VARCHAR), CAST(NULL AS VARCHAR), TRUE
    FROM base WHERE p_partkey IN (SELECT p_partkey FROM changed)
    UNION ALL
    SELECT p_partkey, CAST(price AS DOUBLE),
           CAST(DATE '2024-01-01' AS VARCHAR), CAST(NULL AS VARCHAR), TRUE
    FROM base WHERE p_partkey NOT IN (SELECT p_partkey FROM changed)
    """,
    doc="SCD Type 2 dimension maintenance (merge.scd.scd2_upsert): "
        "batch 1 loads every part's price at 2024-01-01; batch 2 "
        "raises every 5th part's price at 2024-02-01 — the graded "
        "output is the FULL versioned dimension (closed old versions "
        "with validity intervals, open current rows).  The oracle "
        "reconstructs the expected history directly from the part "
        "table, independent of the merge implementation.  Exercises "
        "the engine-native Type-2 extension of the reference's Type-1 "
        "MERGE procs (SURVEY.md §2.6).",
    tags=("merge", "scd", "warehouse", "part"),
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..merge import Warehouse
    from ..merge.scd import scd2_upsert

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="q83_scd_"))
    base = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_retailprice").cast("decimal(18,2)").alias("price")
    )
    b2 = base.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 5 == 0, F.col("price") + 1)
        .otherwise(F.col("price"))
        .alias("price"),
    )
    scd2_upsert(wh, "part_dim", base, "p_partkey", ["price"], "2024-01-01")
    scd2_upsert(wh, "part_dim", b2, "p_partkey", ["price"], "2024-02-01")
    out = wh.read("part_dim")
    # dates emit as ISO strings: pandas renders Spark DATE as
    # datetime.date but DuckDB DATE as datetime64 — a hash hazard the
    # oracle-type test bans (same family as DECIMAL outputs)
    return out.select(
        "p_partkey",
        F.col("price").cast("double").alias("price"),
        F.col("valid_from").cast("string").alias("valid_from"),
        F.col("valid_to").cast("string").alias("valid_to"),
        "is_current",
    )


@register(
    "q84_scd2_asof_enrichment",
    sql="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate
      FROM lineitem WHERE l_orderkey % 100 = 0
    ),
    base AS (
      SELECT p_partkey, CAST(p_retailprice AS DECIMAL(18,2)) AS price FROM part
    )
    SELECT l_orderkey, l_linenumber, l_partkey,
           CAST(l_shipdate AS VARCHAR) AS ship_date,
           CAST(CASE WHEN l_shipdate >= DATE '1995-01-01' AND p_partkey % 5 = 0
                     THEN price + 1 ELSE price END AS DOUBLE) AS price_at_ship,
           CASE WHEN l_shipdate >= DATE '1995-01-01' AND p_partkey % 5 = 0
                THEN '1995-01-01' ELSE '1992-01-01' END AS price_valid_from
    FROM li JOIN base ON l_partkey = p_partkey
    """,
    doc="As-of-correct fact enrichment over the SCD2 dimension "
        "(merge.scd.scd2_upsert + versioned interval join): every "
        "100th lineitem joined to the part-price VERSION valid on its "
        "ship date — the query SCD Type 2 exists to answer (what did "
        "it cost when it shipped, not what it costs now).  Dimension "
        "built in-query (price bump for every 5th part effective "
        "1995-01-01); oracle reconstructs the expected version "
        "arithmetically, independent of the merge machinery.  "
        "Physical: broadcast dim join + residual interval predicate.",
    tags=("merge", "scd", "join", "lineitem", "part"),
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..merge import Warehouse
    from ..merge.scd import scd2_upsert

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="q84_scd_"))
    base = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_retailprice").cast("decimal(18,2)").alias("price")
    )
    b2 = base.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 5 == 0, F.col("price") + 1)
        .otherwise(F.col("price"))
        .alias("price"),
    )
    scd2_upsert(wh, "part_dim", base, "p_partkey", ["price"], "1992-01-01")
    scd2_upsert(wh, "part_dim", b2, "p_partkey", ["price"], "1995-01-01")
    dim = wh.read("part_dim")
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_shipdate")
    )
    covered = (F.col("valid_from") <= F.col("l_shipdate")) & (
        F.col("valid_to").isNull() | (F.col("valid_to") > F.col("l_shipdate"))
    )
    return (
        li.join(
            F.broadcast(dim), F.col("l_partkey") == F.col("p_partkey"), "inner"
        )
        .where(covered)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            F.col("l_shipdate").cast("string").alias("ship_date"),
            F.col("price").cast("double").alias("price_at_ship"),
            F.col("valid_from").cast("string").alias("price_valid_from"),
        )
    )


@register(
    "q86_vocab_drift",
    sql="""
    WITH a AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
      WHERE CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) < 10
    ),
    b AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
      WHERE CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) >= 10
    ),
    ca AS (SELECT token, COUNT(*) AS count_a FROM a GROUP BY token),
    cb AS (SELECT token, COUNT(*) AS count_b FROM b GROUP BY token),
    j AS (
      SELECT COALESCE(ca.token, cb.token) AS token,
             CAST(COALESCE(count_a, 0) AS BIGINT) AS count_a,
             CAST(COALESCE(count_b, 0) AS BIGINT) AS count_b
      FROM ca FULL OUTER JOIN cb USING (token)
    ),
    tots AS (
      SELECT (SELECT COUNT(*) FROM a) AS na,
             (SELECT COUNT(*) FROM b) AS nb,
             (SELECT COUNT(*) FROM j) AS v
    )
    SELECT token, count_a, count_b,
           CAST(ROUND((ln(CAST(count_a + 1 AS DOUBLE) / (na + v))
                 - ln(CAST(count_b + 1 AS DOUBLE) / (nb + v))) * 1e6) AS BIGINT) / 1e6 AS log_ratio
    FROM j, tots
    ORDER BY abs(CAST(ROUND((ln(CAST(count_a + 1 AS DOUBLE) / (na + v))
                 - ln(CAST(count_b + 1 AS DOUBLE) / (nb + v))) * 1e6) AS BIGINT) / 1e6) DESC, token
    LIMIT 30
    """,
    doc="Vocabulary drift between corpus slices (llmdata.textstats."
        "vocab_drift): Laplace-smoothed unigram log-ratio of sources "
        "src0-9 vs src10-19, top-30 by absolute drift — the dataset-"
        "shift monitor for new crawl snapshots.  Integer-count "
        "rationals through identical ln expressions keep both engines "
        "exact; rounded-score + token ordering makes the top-k row "
        "set deterministic.",
    tags=("llmdata", "text", "documents", "drift"),
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    src_no = F.regexp_extract(F.col("source"), r"src(\d+)", 1).cast("int")
    return textstats.vocab_drift(
        d.where(src_no < 10), d.where(src_no >= 10), k=30
    )


@register(
    "q90_domain_stats",
    sql="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || CASE WHEN doc_id % 2 = 0 THEN 'a.' ELSE 'b.' END
               || source || '.com/' || lang || '/' || doc_id AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id,
             regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1) AS host,
             regexp_extract(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1),
                            '([^.]+\\.[^.]+)$', 1) AS domain,
             len(string_split(regexp_replace(
               regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
               '^/|/$', '', 'g'), '/')) AS path_depth
      FROM urls
    )
    SELECT domain,
           COUNT(*) AS n_pages,
           COUNT(DISTINCT host) AS n_hosts,
           CAST(ROUND((AVG(CAST(path_depth AS DOUBLE))) * 1e6) AS BIGINT) / 1e6 AS mean_path_depth
    FROM parts GROUP BY domain
    """,
    doc="Per-registered-domain corpus stats (llmdata.urls."
        "domain_stats): page count, distinct hosts, mean path depth — "
        "the grouping key for per-domain quotas and blocklists.  "
        "Synthesized urls give each source its own registrable domain "
        "with two hosts (a./b. subdomains), so host-vs-domain "
        "aggregation is actually exercised.  One partial-aggregated "
        "shuffle on domain.",
    tags=("llmdata", "urls", "documents"),
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("a.")).otherwise(F.lit("b.")),
        F.col("source"),
        F.lit(".com/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    parsed = urls.parse_urls(d.select("doc_id", url.alias("url")))
    return urls.domain_stats(parsed)


@register(
    "q94_filter_funnel_report",
    sql="""
    WITH g AS (
      SELECT len(string_split_regex(lower(trim(text)), '\\s+')) >= 5 AS enough_words,
             COALESCE(list_max([length(x) FOR x IN
               string_split_regex(lower(trim(text)), '\\s+')]) <= 50, FALSE)
               AS no_giant_word,
             NOT contains(lower(text), '{') AND NOT contains(lower(text), '}')
               AS no_code_marker,
             NOT contains(lower(text), 'lorem ipsum') AS no_lorem,
             NOT contains(lower(text), 'javascript') AS no_js_marker,
             COALESCE(CAST(length(text) AS DOUBLE)
               / len(string_split_regex(trim(text), '\\s+'))
               BETWEEN 2.0 AND 12.0, FALSE) AS sane_word_len,
             COUNT(*) OVER () AS n_docs
      FROM documents
    ),
    agg AS (
      SELECT MAX(n_docs) AS n_docs,
             SUM(CASE WHEN enough_words THEN 1 ELSE 0 END) AS c_enough_words,
             SUM(CASE WHEN no_giant_word THEN 1 ELSE 0 END) AS c_no_giant_word,
             SUM(CASE WHEN no_code_marker THEN 1 ELSE 0 END) AS c_no_code_marker,
             SUM(CASE WHEN no_lorem THEN 1 ELSE 0 END) AS c_no_lorem,
             SUM(CASE WHEN no_js_marker THEN 1 ELSE 0 END) AS c_no_js_marker,
             SUM(CASE WHEN sane_word_len THEN 1 ELSE 0 END) AS c_sane_word_len,
             SUM(CASE WHEN enough_words AND no_giant_word AND no_code_marker
                       AND no_lorem AND no_js_marker AND sane_word_len
                 THEN 1 ELSE 0 END) AS c_keep
      FROM g
    )
    SELECT gate, CAST(n_pass AS BIGINT) AS n_pass,
           CAST(n_pass AS DOUBLE) / n_docs AS pass_rate
    FROM agg UNPIVOT (n_pass FOR gate IN (
      c_enough_words AS 'enough_words', c_no_giant_word AS 'no_giant_word',
      c_no_code_marker AS 'no_code_marker', c_no_lorem AS 'no_lorem',
      c_no_js_marker AS 'no_js_marker', c_sane_word_len AS 'sane_word_len',
      c_keep AS 'keep'))
    """,
    doc="Filter-funnel report over the C4 gate bank (llmdata.textstats."
        "c4_document_filters): per gate, how many documents pass and "
        "the pass rate, plus the full conjunction — the tuning report "
        "a filtering pass publishes so each gate's bite is visible "
        "before committing a corpus cut.  One scan, conditional-count "
        "aggregation, unpivot to rows.",
    tags=("llmdata", "text", "documents", "quality"),
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = textstats.c4_document_filters(load(spark, sf_dir, "documents"))
    gates = ["enough_words", "no_giant_word", "no_code_marker",
             "no_lorem", "no_js_marker", "sane_word_len", "keep"]
    agg = g.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(F.when(F.col(c), 1).otherwise(0)).alias(f"c_{c}") for c in gates],
    )
    stacked = agg.select(
        "_n",
        F.expr(
            "stack({}, {}) as (gate, n_pass)".format(
                len(gates),
                ", ".join(f"'{c}', c_{c}" for c in gates),
            )
        ),
    )
    return stacked.select(
        "gate",
        F.col("n_pass").cast("long").alias("n_pass"),
        (F.col("n_pass").cast("double") / F.col("_n")).alias("pass_rate"),
    )


@register(
    "q97_multimodal_header_decode",
    sql="""
    SELECT doc_id,
           CAST(16 + doc_id % 240 AS INT) AS width,
           CAST(16 + (doc_id * 7) % 240 AS INT) AS height,
           3 AS channels,
           'png' AS fmt
    FROM documents
    """,
    doc="Driver-graded multimodal metadata decode: every doc_id "
        "synthesizes a REAL spec-valid PNG (stdlib zlib/struct, "
        "dimensions derived arithmetically from the id), the engine "
        "parses it back with the production header codec "
        "(llmdata.multimodal.parse_image_header, the <1KB-per-object "
        "metadata pass), and the oracle recomputes the expected "
        "dimensions from the id — grading the codec itself through "
        "the correctness gate, not just its unit tests.  Arrow-batched "
        "mapInPandas both ways (binary synthesis + parse).",
    tags=("llmdata", "multimodal", "documents"),
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..llmdata.multimodal import parse_image_header

    d = load(spark, sf_dir, "documents").select("doc_id")

    def synth_and_parse(it):
        import struct
        import zlib

        def make_png(width, height):
            def chunk(ctype, data):
                return (
                    struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
                )

            ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
            raw = b"".join(b"\x00" + bytes(width * 3) for _ in range(min(height, 4)))
            return (
                b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
            )

        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                w = 16 + int(doc_id) % 240
                h = 16 + (int(doc_id) * 7) % 240
                parsed = parse_image_header(make_png(w, h))
                pw, ph, pc = parsed if parsed else (None, None, None)
                rows.append((int(doc_id), pw, ph, pc, "png"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels", "fmt"]
            )

    return d.mapInPandas(
        synth_and_parse,
        "doc_id long, width int, height int, channels int, fmt string",
    )


@register(
    "q98_wav_header_decode",
    sql="""
    SELECT doc_id,
           CAST(1 + doc_id % 30 AS INT) AS duration_s,
           CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 16000 END AS sample_rate,
           CAST(1 + doc_id % 2 AS INT) AS channels
    FROM documents
    """,
    doc="Driver-graded WAV metadata decode (q97's pattern for audio): "
        "every doc_id synthesizes a real RIFF/WAVE header with "
        "id-derived duration/rate/channels; parse_wav_header reads it "
        "back; the oracle recomputes arithmetically.",
    tags=("llmdata", "multimodal", "documents"),
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..llmdata.multimodal import parse_wav_header

    d = load(spark, sf_dir, "documents").select("doc_id")

    def synth_and_parse(it):
        import struct

        def make_wav(duration_s, rate, channels):
            byte_rate = rate * channels * 2
            data_size = duration_s * byte_rate
            fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
            hdr = (
                b"RIFF" + struct.pack("<I", 36 + 0) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", data_size)
            )
            return hdr + b"\x00" * 64  # truncated body; header carries the size

        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                dur, rate, ch = 1 + i % 30, (44100 if i % 2 == 0 else 16000), 1 + i % 2
                parsed = parse_wav_header(make_wav(dur, rate, ch))
                pd_, pr, pc = parsed if parsed else (None, None, None)
                rows.append((i, pd_, pr, pc))
            yield pd.DataFrame(rows, columns=["doc_id", "duration_s", "sample_rate", "channels"])

    return d.mapInPandas(
        synth_and_parse, "doc_id long, duration_s int, sample_rate int, channels int"
    )
