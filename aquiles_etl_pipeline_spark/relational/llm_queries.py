"""Catalog entries for the LLM-data-pipeline operators (llmdata/*):
dedup, similarity search, text analysis.  SQL-expressible ones carry
DuckDB oracles; sketch-based ones (minhash, simhash, LSH) are declared
rows-only and get exactness tests against their in-engine baselines in
tests/test_llmdata.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmdata import dedup, similarity, textstats
from .catalog import load, register


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
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
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
    sql=None,  # sketch-based: verified against q24's exact Jaccard in tests
    doc="MinHash-LSH near-dup dedup (32 hashes, 8 bands, 3-word "
        "shingles, 0.7 Jaccard): surviving doc ids.",
    tags=("dedup", "documents"),
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_dedup(load(spark, sf_dir, "documents")).select("doc_id")


@register(
    "q26_simhash_fingerprints",
    sql=None,  # no 64-bit xxhash twin in DuckDB; determinism tested in-engine
    doc="64-bit SimHash fingerprints, expression-only.",
    tags=("dedup", "documents"),
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(load(spark, sf_dir, "documents"))


@register(
    "q27_lang_id_agreement",
    sql=None,  # heuristic classifier; accuracy asserted in tests
    doc="Stopword-ratio language ID vs the labeled lang column: "
        "confusion counts.",
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
    sql=None,  # LSH-bucketed; recall vs brute force asserted in tests
    doc="Embedding near-duplicate pairs (cosine ≥ 0.9) via random-"
        "hyperplane LSH buckets + exact verification.",
    tags=("similarity", "embeddings"),
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(e, threshold=0.9).select(
        "id_a", "id_b", F.round("cosine_sim", 4).cast("decimal(10,4)").alias("cosine_sim")
    )


@register(
    "q33_cosine_pairs_exact",
    sql="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                             CAST(b.embedding AS DOUBLE[])), 4)
                AS DECIMAL(10,4)) AS cosine_sim
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
        "id_a", "id_b", F.round("cosine_sim", 4).cast("decimal(10,4)").alias("cosine_sim")
    )


@register(
    "q34_ann_ivf_topk",
    sql=None,  # approximate (probes n_probe of n_cells); recall vs q20 in tests
    doc="IVF approximate top-k: spherical-kmeans coarse quantizer, "
        "probe 4 of 16 cells, exact rerank inside probed cells.",
    tags=("similarity", "embeddings", "topk"),
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    qv = [float(v) for v in e.where(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ivf_topk(e.where(F.col("vec_id") != 0), qv, k=10).select(
        "vec_id", F.round("cosine_sim", 4).cast("decimal(10,4)").alias("cosine_sim")
    )


@register(
    "q35_simhash_near_dup_pairs",
    sql=None,  # 64-bit xxhash fingerprints have no DuckDB twin
    doc="SimHash near-dup pairs within Hamming radius 3 via pigeonhole "
        "block join (Manku et al. WWW'07) — no O(n^2) stage.",
    tags=("dedup", "documents"),
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_dups(load(spark, sf_dir, "documents"), max_hamming=3)


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
           CAST(term_freq * ln(CAST(n_docs AS DOUBLE) / doc_freq) AS DECIMAL(18,6)) AS tfidf
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
