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

from .catalog import load, register


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
           ROUND(CAST(w AS DOUBLE) / n_tokens / 1e6, 6) AS avg_logratio
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
