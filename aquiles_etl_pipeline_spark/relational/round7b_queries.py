"""Round-7b catalog entries (q314+): model/ranking evaluation and
linear-algebra-at-scale operators a training-data platform needs that no
earlier entry covers — ranking-metric evaluation (NDCG@k / MRR),
integer-exact PCA power iteration over the embedding corpus, readability
scoring, encoding-anomaly auditing, chance-corrected classifier
agreement (Cohen's kappa), average-precision threshold sweeps,
leave-one-source-out influence on a regression fit, exact Shapley
channel attribution, deterministic A-ES weighted sampling, l-diversity/
t-closeness release audits, leave-one-out target encoding, forecast
backtest metrics (sMAPE/MASE), streaming incremental PCA (the q315
gram maintained as a checkpointed continuous aggregate), and the Brier
score with its Murphy decomposition.

Shared numeric discipline (see round6b/round7_queries): every cross-row
accumulation happens on EXACT integers — counts, cents, or per-value
transcendentals micro-rounded to BIGINT *before* any sum — so Spark's
partial-aggregation order vs DuckDB's single-threaded order cannot
produce last-ulp drift.  Ratios stay as cross-multiplied integers until
the final emitted expression, which is written with the identical
operation tree on both sides.  Every reachable zero denominator is
CASE-guarded in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import stream_batch_confs
from .catalog import DEC, emit, load, register


# ---------------------------------------------------------------------------
# q314: ranking-metric evaluation — NDCG@5 + MRR per user cohort
# ---------------------------------------------------------------------------

@register(
    "q314_ranking_metric_eval",
    sql="""
    WITH per AS (
      SELECT user_id, event_type,
             COUNT(*) AS cnt,
             CAST(round(SUM(CAST(value AS DECIMAL(18,2))) * 100) AS BIGINT) AS relc
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT user_id, relc,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY cnt DESC, event_type) AS prank,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY relc DESC, event_type) AS irank
      FROM per
    ),
    u AS (
      SELECT user_id,
             SUM(CASE WHEN prank <= 5 THEN CAST(round(
                   relc / log2(CAST(prank + 1 AS DOUBLE)) * 1000000)
                   AS BIGINT) ELSE 0 END) AS dcg_m,
             SUM(CASE WHEN irank <= 5 THEN CAST(round(
                   relc / log2(CAST(irank + 1 AS DOUBLE)) * 1000000)
                   AS BIGINT) ELSE 0 END) AS idcg_m,
             SUM(CASE WHEN irank = 1 THEN CAST(round(
                   1000000.0 / prank) AS BIGINT) ELSE 0 END) AS mrr_m
      FROM r GROUP BY user_id
    ),
    n AS (
      SELECT user_id,
             CASE WHEN idcg_m > 0 THEN CAST(round(
               CAST(dcg_m AS DOUBLE) / CAST(idcg_m AS DOUBLE) * 1000000)
               AS BIGINT) ELSE CAST(0 AS BIGINT) END AS ndcg_m,
             mrr_m
      FROM u
    )
    SELECT user_id % 8 AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(ndcg_m) AS DOUBLE) / (COUNT(*) * 1000000.0) AS avg_ndcg5,
           CAST(SUM(mrr_m) AS DOUBLE) / (COUNT(*) * 1000000.0) AS avg_mrr
    FROM n GROUP BY 1
    """,
    doc="Ranking-metric evaluation harness: each user is a 'query', the "
        "items are their event types, the model ranking is by event "
        "count (ties by type) and the gold relevance is exact value "
        "cents; NDCG@5 and MRR per 8-way user cohort.  Numeric "
        "discipline: each DCG term relc/log2(rank+1) is a per-value "
        "transcendental micro-rounded to BIGINT before the per-user "
        "sum, and per-user NDCG/MRR are micro-ints before the cohort "
        "average — no cross-row float accumulation anywhere.  Physical: "
        "one (user,type)-grain shuffle, two window ranks over <=5-row "
        "partitions, one user-grain and one cohort-grain aggregate; at "
        "100 TB every stage is key-partitioned with map-side partials "
        "and the widest state is items-per-user.",
    tags=("llmdata", "ranking", "events", "window", "agg"),
)
def q314(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum(F.col("value").cast(DEC)) * 100).cast("bigint").alias("relc"),
    )
    wp = Window.partitionBy("user_id").orderBy(F.desc("cnt"), F.asc("event_type"))
    wi = Window.partitionBy("user_id").orderBy(F.desc("relc"), F.asc("event_type"))
    r = per.select(
        "user_id",
        "relc",
        F.row_number().over(wp).alias("prank"),
        F.row_number().over(wi).alias("irank"),
    )
    micro = lambda rank: F.round(  # noqa: E731
        F.col("relc") / F.log2((rank + 1).cast("double")) * 1000000
    ).cast("bigint")
    u = r.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("prank") <= 5, micro(F.col("prank"))).otherwise(F.lit(0))
        ).alias("dcg_m"),
        F.sum(
            F.when(F.col("irank") <= 5, micro(F.col("irank"))).otherwise(F.lit(0))
        ).alias("idcg_m"),
        F.sum(
            F.when(
                F.col("irank") == 1,
                F.round(F.lit(1000000.0) / F.col("prank")).cast("bigint"),
            ).otherwise(F.lit(0))
        ).alias("mrr_m"),
    )
    n = u.select(
        "user_id",
        F.when(
            F.col("idcg_m") > 0,
            F.round(
                F.col("dcg_m").cast("double")
                / F.col("idcg_m").cast("double")
                * 1000000
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("ndcg_m"),
        "mrr_m",
    )
    return n.groupBy((F.col("user_id") % 8).alias("cohort")).agg(
        F.count("*").alias("n_users"),
        emit(
            F.sum("ndcg_m").cast("double") / (F.count("*") * F.lit(1000000.0))
        ).alias("avg_ndcg5"),
        emit(
            F.sum("mrr_m").cast("double") / (F.count("*") * F.lit(1000000.0))
        ).alias("avg_mrr"),
    )


# ---------------------------------------------------------------------------
# q315: integer-exact PCA power iteration over the embedding corpus
# ---------------------------------------------------------------------------

_Q315_ITER_SQL = """
    w{k} AS (
      SELECT g.i AS i, SUM(g.g * v{p}.v) AS w
      FROM g JOIN v{p} ON g.j = v{p}.i GROUP BY g.i
    ),
    m{k} AS (SELECT greatest(CAST(1 AS BIGINT), max(abs(w)) // 1024) AS s
             FROM w{k}),
    v{k} AS (
      SELECT i,
             CASE WHEN w < 0 THEN -((-w) // s) ELSE w // s END AS v
      FROM w{k}, m{k}
    )"""


_PCA_SQL = (
"""
    WITH ex AS (
      SELECT vec_id, CAST(u.i AS INT) AS i,
             CAST(round(CAST(u.x AS DOUBLE) * 1000) AS BIGINT) AS q
      FROM (
        SELECT vec_id,
               unnest(embedding) AS x,
               unnest(range(1, 1 + len(embedding))) AS i
        FROM embeddings
        WHERE embedding IS NOT NULL
      ) u
    ),
    g AS (
      SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS g
      FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2
    ),
    w1 AS (SELECT i, SUM(g) AS w FROM g GROUP BY i),
    m1 AS (SELECT greatest(CAST(1 AS BIGINT), max(abs(w)) // 1024) AS s
           FROM w1),
    v1 AS (
      SELECT i, CASE WHEN w < 0 THEN -((-w) // s) ELSE w // s END AS v
      FROM w1, m1
    ),""" + _Q315_ITER_SQL.format(k=2, p=1) + "," + _Q315_ITER_SQL.format(
        k=3, p=2
    ) + "," + _Q315_ITER_SQL.format(k=4, p=3) + """,
    dots AS (
      SELECT SUM(v4.v * v3.v) AS dn, SUM(v3.v * v3.v) AS dd
      FROM v3 JOIN v4 ON v3.i = v4.i
    ),
    mx AS (SELECT max(abs(v)) AS ma FROM v3)
    SELECT v3.i AS dim_idx,
           CASE WHEN mx.ma > 0
                THEN CAST(v3.v AS DOUBLE) / CAST(mx.ma AS DOUBLE)
                ELSE 0.0 END AS loading,
           CASE WHEN dots.dd > 0
                THEN CAST(dots.dn AS DOUBLE) / CAST(dots.dd AS DOUBLE)
                     * CAST(m4.s AS DOUBLE)
                ELSE 0.0 END AS eig_estimate
    FROM v3, mx, dots, m4
    """
)


def gram_of(emb: DataFrame) -> DataFrame:
    """Exact-integer gram aggregate of any frame with an ``embedding``
    array column — the shared kernel of q315 (batch) and q326
    (streaming micro-batch partials)."""
    import numpy as np
    import pandas as pd

    # The gram aggregation is the ONLY data-sized job, and it runs as a
    # vectorized Arrow-batched partial: each batch quantizes to exact
    # milli-int64 and emits its d x d outer-product sum Q.T @ Q (one
    # BLAS call), so the shuffle carries d^2 rows PER BATCH instead of
    # d^2 rows per input row (the explode+self-join formulation is 64x
    # the data volume and a full join).  Quantization is half-away-
    # from-zero on the exact fractional part — NOT floor(x+0.5), which
    # misrounds boundary doubles like 0.49999999999999994 (x+0.5
    # rounds UP to 1.0 in IEEE64) — matching round() in Spark SQL and
    # DuckDB on every representable value.
    def gram_partial(batches):
        for pdf in batches:
            vecs = [v for v in pdf["embedding"].to_numpy() if v is not None]
            if not vecs:
                continue
            x = np.stack(vecs).astype(np.float64) * 1000.0
            t = np.trunc(x)  # |x| < 2^52, so frac = x - t is EXACT
            frac = x - t
            q = (
                t
                + np.where(frac >= 0.5, 1.0, 0.0)
                - np.where(frac <= -0.5, 1.0, 0.0)
            ).astype(np.int64)
            g = q.T @ q
            d_ = g.shape[0]
            ii, jj = np.indices((d_, d_))
            yield pd.DataFrame(
                {
                    "i": (ii + 1).ravel().astype(np.int32),
                    "j": (jj + 1).ravel().astype(np.int32),
                    "g": g.ravel(),
                }
            )

    return (
        emb.select("embedding")
        .mapInPandas(gram_partial, "i int, j int, g long")
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )


def q315_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed half of q315: the d^2-row exact-integer gram
    aggregate, exposed pre-collect so plan tests can inspect the real
    job (q315 itself collects, which hides this sub-plan from any
    post-hoc explain)."""
    return gram_of(load(spark, sf_dir, "embeddings"))


def _solve_power_iteration(spark: SparkSession, gram_rows) -> DataFrame:
    """Driver-side exact-integer power iteration over collected
    (i, j, g) gram cells — DIMENSION-bounded input (d^2 rows), shared
    by q315 and q326."""
    d = max((r["i"] for r in gram_rows), default=0)
    gram = [[0] * d for _ in range(d)]
    for r in gram_rows:
        gram[r["i"] - 1][r["j"] - 1] = r["g"]

    def tdiv(a: int, s: int) -> int:  # trunc toward zero == Spark's div
        return -((-a) // s) if a < 0 else a // s

    def rescale(w: list[int]) -> tuple[list[int], int]:
        s = max(1, max(abs(x) for x in w) // 1024)
        return [tdiv(x, s) for x in w], s

    out_schema = "dim_idx int, loading double, eig_estimate double"
    if d == 0:
        return spark.createDataFrame([], out_schema)
    v = [sum(gram[i]) for i in range(d)]
    v, _ = rescale(v)
    for _ in range(2):
        v, _ = rescale(
            [sum(gram[i][j] * v[j] for j in range(d)) for i in range(d)]
        )
    v3 = v
    v4, s4 = rescale(
        [sum(gram[i][j] * v3[j] for j in range(d)) for i in range(d)]
    )
    dn = sum(a * b for a, b in zip(v4, v3))
    dd = sum(a * a for a in v3)
    ma = max(abs(x) for x in v3)
    eig = float(dn) / float(dd) * float(s4) if dd > 0 else 0.0
    rows = [
        (i + 1, float(v3[i]) / float(ma) if ma > 0 else 0.0, eig)
        for i in range(d)
    ]
    return spark.createDataFrame(rows, out_schema)



@register(
    "q315_pca_power_iteration",
    sql=_PCA_SQL,
    doc="Top principal direction of the embedding corpus via an "
        "INTEGER-EXACT power-iteration sketch: elements quantized to "
        "milli-units (BIGINT), the 64x64 gram matrix accumulated as "
        "exact integer outer-product sums (the one data-sized job — "
        "map-side partial aggregation, one 4096-key shuffle), then "
        "three unrolled matvec iterations from the all-ones vector, "
        "each rescaled by truncating integer division so every "
        "intermediate stays a BIGINT — power iteration with zero float "
        "accumulation, hence bit-identical across engines and "
        "run-to-run.  The eigenvalue is a Rayleigh estimate from two "
        "exact integer dot products times the final rescale factor.  "
        "Loadings are emitted normalized to max-abs 1.  At 100 TB the "
        "gram aggregation is the only data-sized job; the iterations "
        "run driver-side over the DIMENSION-bounded d^2 matrix (the "
        "MLlib small-d eigensolve pattern — 4096 integers, never "
        "corpus-sized), because distributing 64-row matvecs is pure "
        "scheduler overhead.  The milli quantization bounds gram "
        "cells at ~1e6 per row, so BIGINT holds to ~1e12 rows (scale "
        "the quantization step with corpus size beyond that).",
    tags=("llmdata", "embeddings", "linalg", "agg"),
)
def q315(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The collect is DIMENSION-bounded (d^2 = 4096 rows regardless of
    # corpus size), and the power iteration is O(d^2) exact-integer
    # arithmetic — driver-side by design, the small-d eigensolve
    # pattern (Spark MLlib computeSVD does the same); running 64-row
    # matvec iterates as distributed jobs is pure scheduler overhead.
    return _solve_power_iteration(spark, q315_gram(spark, sf_dir).collect())


# ---------------------------------------------------------------------------
# q316: Flesch-Kincaid readability per source
# ---------------------------------------------------------------------------

@register(
    "q316_readability_grade",
    sql="""
    WITH d AS (
      SELECT source,
             len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) AS n,
             greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS sents,
             list_sum(list_transform(
               string_split_regex(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
               w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+')))
             )) AS syl
      FROM documents WHERE length(trim(text)) > 0
    ),
    f AS (
      SELECT source, n, sents, syl,
             CAST(round((0.39 * (CAST(n AS DOUBLE) / sents)
                         + 11.8 * (CAST(syl AS DOUBLE) / n)
                         - 15.59) * 1000000) AS BIGINT) AS fk_m,
             CAST(round(CAST(n AS DOUBLE) / sents * 1000000) AS BIGINT)
               AS wps_m,
             CAST(round(CAST(syl AS DOUBLE) / n * 1000000) AS BIGINT)
               AS spw_m
      FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(fk_m) AS DOUBLE) / (COUNT(*) * 1000000.0)
             AS avg_fk_grade,
           CAST(SUM(wps_m) AS DOUBLE) / (COUNT(*) * 1000000.0)
             AS avg_words_per_sentence,
           CAST(SUM(spw_m) AS DOUBLE) / (COUNT(*) * 1000000.0)
             AS avg_syllables_per_word
    FROM f GROUP BY source
    """,
    doc="Flesch-Kincaid grade level per source with a deterministic "
        "vowel-group syllable heuristic (each word contributes "
        "max(1, count of [aeiouy]+ runs)) — the standard public "
        "readability formula 0.39*(words/sentences) + "
        "11.8*(syllables/word) - 15.59.  Counts are exact integers via "
        "native higher-order array functions (no Python); the per-doc "
        "grade is micro-rounded to BIGINT before the source average so "
        "the aggregation is order-independent.  Physical: one doc scan "
        "+ one 20-group shuffle; embarrassingly parallel at 100 TB.",
    tags=("llmdata", "quality", "documents", "agg"),
)
def q316(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .where(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "source",
            F.size(F.split(F.trim(F.col("text")), r"[ \t\n\x0b\f\r]+")).alias("n"),
            F.greatest(
                F.lit(1), F.regexp_count(F.col("text"), F.lit("[.!?]+"))
            ).alias("sents"),
            F.aggregate(
                F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\x0b\f\r]+"),
                F.lit(0).cast("bigint"),
                lambda acc, w: acc
                + F.greatest(
                    F.lit(1), F.regexp_count(w, F.lit("[aeiouy]+"))
                ).cast("bigint"),
            ).alias("syl"),
        )
    )
    f = d.select(
        "source",
        F.round(
            (
                F.lit(0.39) * (F.col("n").cast("double") / F.col("sents"))
                + F.lit(11.8) * (F.col("syl").cast("double") / F.col("n"))
                - F.lit(15.59)
            )
            * 1000000
        )
        .cast("bigint")
        .alias("fk_m"),
        F.round(F.col("n").cast("double") / F.col("sents") * 1000000)
        .cast("bigint")
        .alias("wps_m"),
        F.round(F.col("syl").cast("double") / F.col("n") * 1000000)
        .cast("bigint")
        .alias("spw_m"),
    )
    return f.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        emit(F.sum("fk_m").cast("double") / (F.count("*") * F.lit(1000000.0))).alias(
            "avg_fk_grade"
        ),
        emit(
            F.sum("wps_m").cast("double") / (F.count("*") * F.lit(1000000.0))
        ).alias("avg_words_per_sentence"),
        emit(
            F.sum("spw_m").cast("double") / (F.count("*") * F.lit(1000000.0))
        ).alias("avg_syllables_per_word"),
    )


# ---------------------------------------------------------------------------
# q317: encoding-anomaly audit per source
# ---------------------------------------------------------------------------

_REPL = "�"
_ZW = "[​‌‍﻿]"
_CTRL = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


@register(
    "q317_encoding_anomaly_audit",
    sql=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN contains(text, '{_REPL}') THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_with_replacement,
           CAST(SUM(len(regexp_extract_all(text, 'Ã|Â'))) AS BIGINT)
             AS mojibake_hits,
           CAST(SUM(len(regexp_extract_all(text, '{_CTRL}'))) AS BIGINT)
             AS control_char_hits,
           CAST(SUM(len(regexp_extract_all(text, '{_ZW}'))) AS BIGINT)
             AS zero_width_hits,
           CAST(SUM(CASE WHEN regexp_matches(text, '[^\\x00-\\x7F]')
                         THEN 1 ELSE 0 END) AS BIGINT) AS non_ascii_docs
    FROM documents GROUP BY source
    """,
    doc="Corpus-hygiene encoding audit per source: U+FFFD replacement-"
        "character docs, 'Ã'/'Â' mojibake (UTF-8 read as Latin-1) "
        "occurrences, C0 control characters, zero-width/BOM "
        "characters, and non-ASCII doc counts.  All counters are exact "
        "integers from native regexp_count — one scan, one 20-group "
        "shuffle of six BIGINT partials; trivially parallel at 100 TB "
        "(this is the filter battery run before tokenizer training).",
    tags=("llmdata", "quality", "documents", "agg"),
)
def q317(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(F.col("text").contains(_REPL), 1).otherwise(0)
        ).alias("docs_with_replacement"),
        F.sum(F.regexp_count(F.col("text"), F.lit("Ã|Â")).cast("bigint")).alias(
            "mojibake_hits"
        ),
        F.sum(F.regexp_count(F.col("text"), F.lit(_CTRL)).cast("bigint")).alias(
            "control_char_hits"
        ),
        F.sum(F.regexp_count(F.col("text"), F.lit(_ZW)).cast("bigint")).alias(
            "zero_width_hits"
        ),
        F.sum(
            F.when(F.col("text").rlike("[^\\x00-\\x7F]"), 1).otherwise(0)
        ).alias("non_ascii_docs"),
    )


# ---------------------------------------------------------------------------
# q318: Cohen's kappa + per-class F1 of the stopword language ID
# ---------------------------------------------------------------------------

_STOPS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "los", "para"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "les", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "von"],
}


def _q318_sql() -> str:
    # DuckDB list literals use ['a','b'] syntax — repr() of a Python list
    # of strings renders exactly that.
    score = ",\n        ".join(
        f"CAST(len(list_intersect(toks, {words!r})) AS DOUBLE) / 10 AS s_{c}"
        for c, words in _STOPS.items()
    )
    return f"""
    WITH t AS (
      SELECT lang,
             list_distinct(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'))
               AS toks
      FROM documents
    ),
    s AS (
      SELECT lang,
        {score}
      FROM t
    ),
    p AS (
      SELECT lang,
             CASE WHEN greatest(s_en, s_es, s_fr, s_de) <= 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                  WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                  WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                  ELSE 'de' END AS pred
      FROM s
    ),
    conf AS (SELECT lang, pred, COUNT(*) AS c FROM p GROUP BY 1, 2),
    rm AS (SELECT lang AS cls, SUM(c) AS rm FROM conf GROUP BY 1),
    cm AS (SELECT pred AS cls, SUM(c) AS cm FROM conf GROUP BY 1),
    cls AS (
      SELECT coalesce(rm.cls, cm.cls) AS cls,
             coalesce(rm.rm, 0) AS rm, coalesce(cm.cm, 0) AS cm
      FROM rm FULL OUTER JOIN cm ON rm.cls = cm.cls
    ),
    tots AS (
      SELECT SUM(rm) AS n,
             SUM(CASE WHEN cls IS NOT NULL THEN rm * cm ELSE 0 END) AS s
      FROM cls
    ),
    diag AS (
      SELECT cls.cls AS cls, cls.rm, cls.cm,
             coalesce((SELECT SUM(c) FROM conf
                       WHERE conf.lang = cls.cls
                         AND conf.pred = cls.cls), 0) AS tp
      FROM cls
    ),
    d AS (SELECT SUM(tp) AS dsum FROM diag)
    SELECT diag.cls AS cls,
           CAST(diag.tp AS BIGINT) AS tp,
           CAST(diag.cm - diag.tp AS BIGINT) AS fp,
           CAST(diag.rm - diag.tp AS BIGINT) AS fn,
           CASE WHEN diag.cm > 0
                THEN CAST(diag.tp AS DOUBLE) / CAST(diag.cm AS DOUBLE)
                ELSE 0.0 END AS precision,
           CASE WHEN diag.rm > 0
                THEN CAST(diag.tp AS DOUBLE) / CAST(diag.rm AS DOUBLE)
                ELSE 0.0 END AS recall,
           CASE WHEN 2 * diag.tp + (diag.cm - diag.tp)
                     + (diag.rm - diag.tp) > 0
                THEN CAST(2 * diag.tp AS DOUBLE)
                     / CAST(2 * diag.tp + (diag.cm - diag.tp)
                            + (diag.rm - diag.tp) AS DOUBLE)
                ELSE 0.0 END AS f1,
           CASE WHEN tots.n * tots.n - tots.s > 0
                THEN CAST(tots.n * d.dsum - tots.s AS DOUBLE)
                     / CAST(tots.n * tots.n - tots.s AS DOUBLE)
                ELSE 0.0 END AS kappa
    FROM diag, tots, d
    """


@register(
    "q318_langid_kappa_f1",
    sql=_q318_sql(),
    doc="Chance-corrected agreement of the q27 stopword language-ID "
        "classifier against the labeled lang column: Cohen's kappa "
        "computed ENTIRELY in exact integer marginals — kappa = "
        "(n*diag - sum(rowmarg*colmarg)) / (n^2 - sum(rowmarg*colmarg)) "
        "with one final double division — plus per-class TP/FP/FN and "
        "precision/recall/F1 over the union of actual and predicted "
        "classes (so the 'und' abstain class is first-class).  "
        "Physical: one doc scan to confusion grain (<=36 cells), then "
        "dim-grain arithmetic; the full-outer class union and totals "
        "are single-digit-row broadcasts at any corpus size.  BIGINT "
        "bound: the kappa denominator computes n*n, exact to n ~ 3e9 "
        "docs (DuckDB promotes to HUGEINT; Spark would wrap) — past "
        "that, compute kappa on a decimal(38,0) cast of the marginals.",
    tags=("llmdata", "quality", "eval", "documents", "agg"),
)
def q318(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\x0b\f\r]+"))
    t = d.select("lang", toks.alias("toks"))
    s = t.select(
        "lang",
        *[
            (
                F.size(
                    F.array_intersect(
                        F.col("toks"), F.array(*[F.lit(w) for w in words])
                    )
                ).cast("double")
                / 10
            ).alias(f"s_{c}")
            for c, words in _STOPS.items()
        ],
    )
    best = F.greatest("s_en", "s_es", "s_fr", "s_de")
    p = s.select(
        "lang",
        F.when(best <= 0, "und")
        .when(F.col("s_en") == best, "en")
        .when(F.col("s_es") == best, "es")
        .when(F.col("s_fr") == best, "fr")
        .otherwise("de")
        .alias("pred"),
    )
    # r10: the confusion matrix (<= |langs|^2 rows) feeds rm/cm/tp and
    # the diagonal join — unpinned, each consumer re-ran the corpus
    # tokenize+classify pass (8 scans in plans/r10/q318_before.txt).
    # One corpus pass, ContextCleaner-drained.
    conf = (
        p.groupBy("lang", "pred")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    rm = conf.groupBy(F.col("lang").alias("cls")).agg(F.sum("c").alias("rm"))
    cm = conf.groupBy(F.col("pred").alias("cls")).agg(F.sum("c").alias("cm"))
    cls = (
        rm.join(cm, "cls", "full_outer")
        .select(
            "cls",
            F.coalesce("rm", F.lit(0)).alias("rm"),
            F.coalesce("cm", F.lit(0)).alias("cm"),
        )
    )
    tots = cls.agg(
        F.sum("rm").alias("n"), F.sum(F.col("rm") * F.col("cm")).alias("s")
    )
    tp = conf.where(F.col("lang") == F.col("pred")).select(
        F.col("lang").alias("cls"), F.col("c").alias("tp")
    )
    diag = cls.join(tp, "cls", "left").select(
        "cls", "rm", "cm", F.coalesce("tp", F.lit(0)).alias("tp")
    )
    dsum = diag.agg(F.sum("tp").alias("dsum"))
    fp = F.col("cm") - F.col("tp")
    fn = F.col("rm") - F.col("tp")
    return (
        diag.crossJoin(F.broadcast(tots))
        .crossJoin(F.broadcast(dsum))
        .select(
            "cls",
            F.col("tp").cast("bigint").alias("tp"),
            fp.cast("bigint").alias("fp"),
            fn.cast("bigint").alias("fn"),
            F.when(
                F.col("cm") > 0,
                F.col("tp").cast("double") / F.col("cm").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("precision"),
            F.when(
                F.col("rm") > 0,
                F.col("tp").cast("double") / F.col("rm").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
            F.when(
                (2 * F.col("tp") + fp + fn) > 0,
                (2 * F.col("tp")).cast("double")
                / (2 * F.col("tp") + fp + fn).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("f1"),
            F.when(
                (F.col("n") * F.col("n") - F.col("s")) > 0,
                (F.col("n") * F.col("dsum") - F.col("s")).cast("double")
                / (F.col("n") * F.col("n") - F.col("s")).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("kappa"),
        )
    )


# ---------------------------------------------------------------------------
# q319: precision/recall threshold sweep + average precision
# ---------------------------------------------------------------------------

@register(
    "q319_pr_curve_average_precision",
    sql="""
    WITH scored AS (
      SELECT vec_id,
             CAST(list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                     * CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
                AS BIGINT) AS score,
             CASE WHEN label <= 1 THEN 1 ELSE 0 END AS y
      FROM embeddings
    ),
    blocks AS (
      SELECT score, CAST(SUM(y) AS BIGINT) AS pos,
             CAST(COUNT(*) AS BIGINT) AS tot
      FROM scored GROUP BY score
    ),
    cum AS (
      SELECT score, pos,
             SUM(pos) OVER (ORDER BY score DESC) AS tp,
             SUM(tot) OVER (ORDER BY score DESC) AS n_ge
      FROM blocks
    ),
    tot AS (SELECT CAST(SUM(y) AS BIGINT) AS p FROM scored),
    ap AS (
      SELECT SUM(pos * CAST(round(CAST(tp AS DOUBLE)
                                  / CAST(n_ge AS DOUBLE) * 1000000)
                            AS BIGINT)) AS ap_num
      FROM cum
    )
    SELECT cum.score AS score_milli_sq,
           CAST(cum.tp AS BIGINT) AS tp,
           CAST(cum.n_ge - cum.tp AS BIGINT) AS fp,
           CAST(tot.p - cum.tp AS BIGINT) AS fn,
           CAST(cum.tp AS DOUBLE) / CAST(cum.n_ge AS DOUBLE) AS precision,
           CASE WHEN tot.p > 0
                THEN CAST(cum.tp AS DOUBLE) / CAST(tot.p AS DOUBLE)
                ELSE 0.0 END AS recall,
           CAST(2 * cum.tp AS DOUBLE) / CAST(cum.n_ge + tot.p AS DOUBLE)
             AS f1,
           CASE WHEN tot.p > 0
                THEN CAST(ap.ap_num AS DOUBLE) / (tot.p * 1000000.0)
                ELSE 0.0 END AS average_precision
    FROM cum, tot, ap
    """,
    doc="Classifier-evaluation sweep: binary relevance (label <= 1) "
        "scored by the exact integer milli-quantized squared L2 norm "
        "of the embedding (monotone in the norm, so ranking-"
        "equivalent and BIGINT-exact).  One row per distinct score "
        "threshold with cumulative TP/FP/FN, precision, recall and F1 "
        "(F1 = 2TP/(N_ge + P), an exact integer rational), plus "
        "step-interpolated average precision (sklearn's AP definition "
        "sum(dTP * precision)/P) with each block precision micro-"
        "rounded before the exact integer sum.  Physical: one "
        "embedding scan, a distinct-score-grain aggregate, one "
        "ordered-window pass at that grain — never a fact-grain sort; "
        "the totals are broadcast single rows.",
    tags=("llmdata", "eval", "embeddings", "window", "agg"),
)
def q319(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id",
        F.aggregate(
            F.col("embedding"),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc
            + F.round(x.cast("double") * 1000).cast("bigint")
            * F.round(x.cast("double") * 1000).cast("bigint"),
        ).alias("score"),
        F.when(F.col("label") <= 1, 1).otherwise(0).alias("y"),
    )
    blocks = scored.groupBy("score").agg(
        F.sum("y").cast("bigint").alias("pos"),
        F.count("*").cast("bigint").alias("tot"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = blocks.select(
        "score",
        "pos",
        F.sum("pos").over(w).alias("tp"),
        F.sum("tot").over(w).alias("n_ge"),
    )
    tot = scored.agg(F.sum("y").cast("bigint").alias("p"))
    ap = cum.agg(
        F.sum(
            F.col("pos")
            * F.round(
                F.col("tp").cast("double") / F.col("n_ge").cast("double") * 1000000
            ).cast("bigint")
        ).alias("ap_num")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ap))
        .select(
            F.col("score").alias("score_milli_sq"),
            F.col("tp").cast("bigint").alias("tp"),
            (F.col("n_ge") - F.col("tp")).cast("bigint").alias("fp"),
            (F.col("p") - F.col("tp")).cast("bigint").alias("fn"),
            emit(F.col("tp").cast("double") / F.col("n_ge").cast("double")).alias(
                "precision"
            ),
            F.when(
                F.col("p") > 0,
                F.col("tp").cast("double") / F.col("p").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
            emit(
                (2 * F.col("tp")).cast("double")
                / (F.col("n_ge") + F.col("p")).cast("double")
            ).alias("f1"),
            F.when(
                F.col("p") > 0,
                F.col("ap_num").cast("double") / (F.col("p") * F.lit(1000000.0)),
            )
            .otherwise(F.lit(0.0))
            .alias("average_precision"),
        )
    )


# ---------------------------------------------------------------------------
# q320: leave-one-source-out influence on a regression slope
# ---------------------------------------------------------------------------

@register(
    "q320_loo_source_influence",
    sql="""
    WITH d AS (
      SELECT source,
             CAST(len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) AS BIGINT)
               AS x,
             CAST(n_chars AS BIGINT) AS y
      FROM documents WHERE length(trim(text)) > 0
    ),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM d GROUP BY source
    ),
    t AS (
      SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
             SUM(sxx) AS sxx, SUM(sxy) AS sxy
      FROM s
    )
    SELECT s.source,
           s.n AS n_docs,
           CASE WHEN t.n * t.sxx - t.sx * t.sx > 0
                THEN CAST(t.n * t.sxy - t.sx * t.sy AS DOUBLE)
                     / CAST(t.n * t.sxx - t.sx * t.sx AS DOUBLE)
                ELSE 0.0 END AS slope_all,
           CASE WHEN (t.n - s.n) * (t.sxx - s.sxx)
                     - (t.sx - s.sx) * (t.sx - s.sx) > 0
                THEN CAST((t.n - s.n) * (t.sxy - s.sxy)
                          - (t.sx - s.sx) * (t.sy - s.sy) AS DOUBLE)
                     / CAST((t.n - s.n) * (t.sxx - s.sxx)
                            - (t.sx - s.sx) * (t.sx - s.sx) AS DOUBLE)
                ELSE 0.0 END AS slope_loo
    FROM s, t
    """,
    doc="Leave-one-source-out influence analysis on the OLS slope of "
        "chars-vs-words across the corpus: the slope refit excluding "
        "each source comes for FREE from exact integer sufficient "
        "statistics (n, Sx, Sy, Sxx, Sxy at source grain; totals minus "
        "the source's block) — no per-source refit pass, the "
        "data-ablation pattern for spotting sources that distort a "
        "fitted relationship.  Physical: one doc scan to 20 source-"
        "grain rows of five BIGINT sums, one broadcast single-row "
        "total; O(sources) downstream regardless of corpus size.  "
        "Emit both slope_all (constant) and slope_loo so the consumer "
        "diffs them; the difference is deliberately NOT pre-computed "
        "as a float subtraction of two near-equal numbers here.  "
        "BIGINT bound: the n*Sxx / Sx*Sx cross products are exact "
        "while n * x_max^2 < 2^63 (~1e9 docs at 1e5-char pages; "
        "DuckDB's HUGEINT promotion would mask a Spark wrap past "
        "that) — cast the sufficient statistics to decimal(38,0) "
        "beyond it.",
    tags=("llmdata", "eval", "documents", "regression", "agg"),
)
def q320(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .where(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "source",
            F.size(F.split(F.trim(F.col("text")), r"[ \t\n\x0b\f\r]+"))
            .cast("bigint")
            .alias("x"),
            F.col("n_chars").cast("bigint").alias("y"),
        )
    )
    s = d.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    t = s.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    j = s.crossJoin(F.broadcast(t))
    den_all = F.col("tn") * F.col("tsxx") - F.col("tsx") * F.col("tsx")
    num_all = F.col("tn") * F.col("tsxy") - F.col("tsx") * F.col("tsy")
    ln = F.col("tn") - F.col("n")
    lsx = F.col("tsx") - F.col("sx")
    lsy = F.col("tsy") - F.col("sy")
    lsxx = F.col("tsxx") - F.col("sxx")
    lsxy = F.col("tsxy") - F.col("sxy")
    den_loo = ln * lsxx - lsx * lsx
    num_loo = ln * lsxy - lsx * lsy
    return j.select(
        "source",
        F.col("n").alias("n_docs"),
        F.when(den_all > 0, num_all.cast("double") / den_all.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("slope_all"),
        F.when(den_loo > 0, num_loo.cast("double") / den_loo.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("slope_loo"),
    )


# ---------------------------------------------------------------------------
# q321: exact Shapley channel attribution over the touchpoint lattice
# ---------------------------------------------------------------------------

_Q321_CHANNELS = (("click", 1), ("error", 2), ("signup", 4), ("view", 8))


def _q321_sql() -> str:
    flags = ",\n             ".join(
        f"MAX(CASE WHEN event_type = '{c}' THEN {b} ELSE 0 END) AS b_{c}"
        for c, b in _Q321_CHANNELS
    )
    chan_rows = ", ".join(f"('{c}', {b})" for c, b in _Q321_CHANNELS)
    return f"""
    WITH u AS (
      SELECT user_id,
             {flags},
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id
    ),
    mg AS (
      SELECT b_click + b_error + b_signup + b_view AS mask,
             CAST(SUM(conv) AS BIGINT) AS conv
      FROM u GROUP BY 1
    ),
    subsets AS (SELECT CAST(t.s AS BIGINT) AS s FROM range(0, 16) t(s)),
    v AS (
      SELECT subsets.s AS s, coalesce(SUM(mg.conv), 0) AS v
      FROM subsets LEFT JOIN mg
        ON (mg.mask // 1) % 2 <= (subsets.s // 1) % 2
       AND (mg.mask // 2) % 2 <= (subsets.s // 2) % 2
       AND (mg.mask // 4) % 2 <= (subsets.s // 4) % 2
       AND (mg.mask // 8) % 2 <= (subsets.s // 8) % 2
      GROUP BY subsets.s
    ),
    ch AS (SELECT * FROM (VALUES {chan_rows}) AS c(channel, bit)),
    terms AS (
      SELECT ch.channel,
             ((a.s // 1) % 2 + (a.s // 2) % 2
              + (a.s // 4) % 2 + (a.s // 8) % 2) AS k,
             b.v - a.v AS dv
      FROM ch
      JOIN v a ON (a.s // ch.bit) % 2 = 0
      JOIN v b ON b.s = a.s + ch.bit
    ),
    phi AS (
      SELECT channel,
             SUM(CASE k WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
                        ELSE 6 END * dv) AS phi24
      FROM terms GROUP BY channel
    ),
    tot AS (SELECT coalesce(SUM(conv), 0) AS total_conv FROM mg)
    SELECT phi.channel,
           CAST(phi.phi24 AS DOUBLE) / 24.0 AS shapley_conversions,
           CASE WHEN tot.total_conv > 0
                THEN CAST(phi.phi24 AS DOUBLE) / (24.0 * tot.total_conv)
                ELSE 0.0 END AS shapley_share,
           CAST(tot.total_conv AS BIGINT) AS total_conversions
    FROM phi, tot
    """


@register(
    "q321_shapley_attribution",
    sql=_q321_sql(),
    doc="EXACT Shapley-value channel attribution (Shapley 1953; the "
        "data-driven attribution model): characteristic function "
        "v(S) = conversions among users whose touched-channel set is "
        "contained in S, evaluated on the full 2^4 subset lattice, "
        "phi_c = sum over S not containing c of k!(n-1-k)!/n! * "
        "(v(S+c) - v(S)) computed as EXACT integers scaled by 4!=24 "
        "(weights {{6,2,2,6}}/24), one double division at emission.  "
        "Physical: the only data-sized jobs are the user-grain "
        "aggregate and its collapse to <=16 mask-grain rows; the "
        "lattice joins are 16-row frames (a deliberate containment "
        "theta-join, allowlisted) — at 100 TB the lattice work is "
        "constant and the fact scan is one pass.  n channels grows "
        "the lattice 2^n, so this exact form is for small channel "
        "sets (the industry norm <= ~10).",
    tags=("llmdata", "attribution", "events", "agg"),
)
def q321(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        *[
            F.max(
                F.when(F.col("event_type") == c, F.lit(b)).otherwise(0)
            ).alias(f"b_{c}")
            for c, b in _Q321_CHANNELS
        ],
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    mg = u.groupBy(
        (
            F.col("b_click") + F.col("b_error") + F.col("b_signup") + F.col("b_view")
        ).alias("mask")
    ).agg(F.sum("conv").cast("bigint").alias("conv"))
    subsets = spark.range(0, 16).select(F.col("id").alias("s"))
    contained = (
        ((F.col("mask") / 1).cast("bigint") % 2 <= (F.col("s") / 1).cast("bigint") % 2)
        & ((F.col("mask") / 2).cast("bigint") % 2 <= (F.col("s") / 2).cast("bigint") % 2)
        & ((F.col("mask") / 4).cast("bigint") % 2 <= (F.col("s") / 4).cast("bigint") % 2)
        & ((F.col("mask") / 8).cast("bigint") % 2 <= (F.col("s") / 8).cast("bigint") % 2)
    )
    v = (
        subsets.join(F.broadcast(mg), contained, "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv"), F.lit(0)).alias("v"))
    )
    ch = spark.createDataFrame(list(_Q321_CHANNELS), ["channel", "bit"])
    a = v.select(F.col("s").alias("sa"), F.col("v").alias("va"))
    b = v.select(F.col("s").alias("sb"), F.col("v").alias("vb"))
    terms = (
        ch.join(
            F.broadcast(a),
            (F.col("sa") / F.col("bit")).cast("bigint") % 2 == 0,
        )
        .join(F.broadcast(b), F.col("sb") == F.col("sa") + F.col("bit"))
        .select(
            "channel",
            (
                (F.col("sa") / 1).cast("bigint") % 2
                + (F.col("sa") / 2).cast("bigint") % 2
                + (F.col("sa") / 4).cast("bigint") % 2
                + (F.col("sa") / 8).cast("bigint") % 2
            ).alias("k"),
            (F.col("vb") - F.col("va")).alias("dv"),
        )
    )
    phi = terms.groupBy("channel").agg(
        F.sum(
            F.when(F.col("k") == 0, 6)
            .when(F.col("k") == 1, 2)
            .when(F.col("k") == 2, 2)
            .otherwise(6)
            * F.col("dv")
        ).alias("phi24")
    )
    tot = mg.agg(F.coalesce(F.sum("conv"), F.lit(0)).alias("total_conv"))
    return phi.crossJoin(F.broadcast(tot)).select(
        "channel",
        emit(F.col("phi24").cast("double") / F.lit(24.0)).alias(
            "shapley_conversions"
        ),
        F.when(
            F.col("total_conv") > 0,
            F.col("phi24").cast("double") / (F.lit(24.0) * F.col("total_conv")),
        )
        .otherwise(F.lit(0.0))
        .alias("shapley_share"),
        F.col("total_conv").cast("bigint").alias("total_conversions"),
    )


# ---------------------------------------------------------------------------
# q322: deterministic weighted priority sample (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------

@register(
    "q322_weighted_priority_sample",
    sql="""
    WITH keyed AS (
      SELECT doc_id, source,
             greatest(CAST(1 AS BIGINT), CAST(n_chars AS BIGINT)) AS w,
             ln((CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))
                      ::BIGINT AS DOUBLE) + 1.0) / 1152921504606846976.0)
               AS lnu
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, w,
             CAST(round(lnu / CAST(w AS DOUBLE) * 1000000000) AS BIGINT)
               AS priority_nano
      FROM keyed
      ORDER BY priority_nano DESC, doc_id
      LIMIT 100
    )
    SELECT doc_id, source, w, priority_nano FROM ranked
    """,
    doc="Deterministic weighted sampling WITHOUT replacement "
        "(Efraimidis-Spirakis 2006 A-ES: key = u^(1/w), equivalently "
        "ln(u)/w, top-k by key): the uniform u derives from the top 60 "
        "bits of sha256(doc_id) — the catalog's reproducible hash "
        "family — shifted by +1 so u in (0,1] and ln(u) is finite.  "
        "Every doc's priority is a pure per-row expression nano-"
        "rounded to BIGINT before ordering (libm ln() differs by an "
        "ulp between engines — measured here — so raw ln-derived "
        "doubles are NOT portable sort keys), making the selected set "
        "bit-reproducible run-to-run and engine-to-engine — the "
        "property a training-data subsample MUST have for "
        "provenance.  Physical: one scan + TakeOrdered "
        "top-100 (ORDER BY + LIMIT never global-sorts in Spark); at "
        "100 TB this is a single pass with per-partition heaps, and "
        "re-drawing with a different seed is just salting the hash "
        "input.",
    tags=("llmdata", "sampling", "documents"),
)
def q322(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 15), 16, 10
    ).cast("long")
    w = F.greatest(F.lit(1).cast("bigint"), F.col("n_chars").cast("bigint"))
    lnu = F.log(
        (h.cast("double") + F.lit(1.0)) / F.lit(1152921504606846976.0)
    )
    keyed = d.select(
        "doc_id",
        "source",
        w.alias("w"),
        F.round(lnu / w.cast("double") * 1000000000)
        .cast("bigint")
        .alias("priority_nano"),
    )
    return keyed.orderBy(F.desc("priority_nano"), F.asc("doc_id")).limit(100)


# ---------------------------------------------------------------------------
# q323: l-diversity + t-closeness release audit
# ---------------------------------------------------------------------------

@register(
    "q323_ldiversity_tcloseness",
    sql="""
    WITH rows_ AS (
      SELECT lang, source, CAST(greatest(0, n_chars) // 100 AS BIGINT) AS b
      FROM documents
    ),
    cb AS (
      SELECT lang, source, b, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(COUNT(*) AS BIGINT)
               * CAST(round(ln(CAST(COUNT(*) AS DOUBLE)) * 1000000)
                      AS BIGINT) AS clnc
      FROM rows_ GROUP BY 1, 2, 3
    ),
    gb AS (
      SELECT b, CAST(SUM(c) AS BIGINT) AS g FROM cb GROUP BY b
    ),
    gbo AS (
      SELECT b, g,
             SUM(g) OVER (ORDER BY b) AS cum_g,
             row_number() OVER (ORDER BY b) AS rn,
             COUNT(*) OVER () AS nb,
             (SELECT SUM(g) FROM gb) AS n_total
      FROM gb
    ),
    cls AS (
      SELECT lang, source, CAST(SUM(c) AS BIGINT) AS n FROM cb
      GROUP BY 1, 2
    ),
    dense AS (
      SELECT cls.lang, cls.source, cls.n,
             gbo.b, gbo.cum_g, gbo.rn, gbo.nb, gbo.n_total,
             coalesce(cb.c, 0) AS c
      FROM cls CROSS JOIN gbo
      LEFT JOIN cb ON cb.lang = cls.lang AND cb.source = cls.source
                  AND cb.b = gbo.b
    ),
    cum AS (
      SELECT lang, source, n, rn, nb, n_total,
             SUM(c) OVER (PARTITION BY lang, source ORDER BY b) AS cum_c,
             cum_g
      FROM dense
    ),
    emd AS (
      SELECT lang, source,
             SUM(CASE WHEN rn < nb
                      THEN abs(cum_c * n_total - cum_g * n) ELSE 0 END)
               AS emd_num,
             max(n) AS n, max(nb) AS nb, max(n_total) AS n_total
      FROM cum GROUP BY 1, 2
    ),
    ent AS (
      SELECT lang, source,
             CAST(COUNT(*) AS BIGINT) AS l_distinct,
             SUM(clnc) AS sum_clnc
      FROM cb GROUP BY 1, 2
    )
    SELECT emd.lang, emd.source,
           CAST(emd.n AS BIGINT) AS n_rows,
           ent.l_distinct,
           (CAST(emd.n AS DOUBLE)
              * CAST(round(ln(CAST(emd.n AS DOUBLE)) * 1000000) AS BIGINT)
            - CAST(ent.sum_clnc AS DOUBLE))
             / (CAST(emd.n AS DOUBLE) * 1000000.0) AS entropy_l,
           CASE WHEN emd.nb > 1
                THEN CAST(emd.emd_num AS DOUBLE)
                     / (CAST(emd.n AS DOUBLE) * CAST(emd.n_total AS DOUBLE)
                        * (emd.nb - 1))
                ELSE 0.0 END AS t_closeness
    FROM emd JOIN ent ON emd.lang = ent.lang AND emd.source = ent.source
    """,
    doc="Privacy release audit beyond q296's k-anonymity: for each "
        "quasi-identifier class (lang, source), l-diversity (distinct "
        "sensitive length-buckets and Shannon entropy of their "
        "distribution — the q302 exact-integer entropy kernel: each "
        "c*ln(c) micro-rounded BEFORE the sum) and t-closeness (EMD "
        "between the class's sensitive distribution and the corpus "
        "distribution over ORDERED buckets: the cumulative-difference "
        "sum, computed as exact cross-multiplied integers "
        "|cum_c*N - cum_g*n| with one terminal division).  Physical: "
        "one scan to (class, bucket) grain, a dims-only class x "
        "bucket scaffold (deliberate, allowlisted) so missing buckets "
        "densify to zero, window cums at scaffold grain; at 100 TB "
        "everything after the first aggregate is dimension-sized.",
    tags=("llmdata", "privacy", "documents", "window", "agg"),
)
def q323(spark: SparkSession, sf_dir: str) -> DataFrame:
    # greatest(0, ·) clamps BEFORE the integer division so the bucket
    # function is engine-identical for ALL inputs: Spark `div` truncates
    # toward zero while DuckDB `//` floors, and the two differ on
    # negative n_chars (latent — fixtures are non-negative, but the
    # clamp removes the divergence instead of relying on that).
    d = load(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.expr("CAST(greatest(0, n_chars) div 100 AS BIGINT)").alias("b"),
    )
    cb = d.groupBy("lang", "source", "b").agg(
        F.count("*").alias("c"),
        (
            F.count("*")
            * F.round(F.log(F.count("*").cast("double")) * 1000000).cast(
                "bigint"
            )
        ).alias("clnc"),
    )
    gb = cb.groupBy("b").agg(F.sum("c").alias("g"))
    n_total = gb.agg(F.sum("g").alias("n_total"))
    wob = Window.orderBy("b")
    gbo = (
        gb.select(
            "b",
            "g",
            F.sum("g").over(wob).alias("cum_g"),
            F.row_number().over(wob).alias("rn"),
            F.count("*").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("nb"),
        )
        .crossJoin(F.broadcast(n_total))
    )
    cls = cb.groupBy("lang", "source").agg(F.sum("c").alias("n"))
    dense = (
        cls.crossJoin(F.broadcast(gbo))
        .join(cb, ["lang", "source", "b"], "left")
        .select(
            "lang",
            "source",
            "n",
            "b",
            "cum_g",
            "rn",
            "nb",
            "n_total",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    wcls = Window.partitionBy("lang", "source").orderBy("b")
    cum = dense.select(
        "lang",
        "source",
        "n",
        "rn",
        "nb",
        "n_total",
        F.sum("c").over(wcls).alias("cum_c"),
        "cum_g",
    )
    emd = cum.groupBy("lang", "source").agg(
        F.sum(
            F.when(
                F.col("rn") < F.col("nb"),
                F.abs(
                    F.col("cum_c") * F.col("n_total")
                    - F.col("cum_g") * F.col("n")
                ),
            ).otherwise(F.lit(0))
        ).alias("emd_num"),
        F.max("n").alias("n"),
        F.max("nb").alias("nb"),
        F.max("n_total").alias("n_total"),
    )
    ent = cb.groupBy("lang", "source").agg(
        F.count("*").alias("l_distinct"), F.sum("clnc").alias("sum_clnc")
    )
    return emd.join(ent, ["lang", "source"]).select(
        "lang",
        "source",
        F.col("n").cast("bigint").alias("n_rows"),
        "l_distinct",
        emit(
            (
                F.col("n").cast("double")
                * F.round(F.log(F.col("n").cast("double")) * 1000000).cast(
                    "bigint"
                )
                - F.col("sum_clnc").cast("double")
            )
            / (F.col("n").cast("double") * F.lit(1000000.0))
        ).alias("entropy_l"),
        F.when(
            F.col("nb") > 1,
            F.col("emd_num").cast("double")
            / (
                F.col("n").cast("double")
                * F.col("n_total").cast("double")
                * (F.col("nb") - 1)
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("t_closeness"),
    )


# ---------------------------------------------------------------------------
# q324: leave-one-out target encoding audit
# ---------------------------------------------------------------------------

@register(
    "q324_loo_target_encoding",
    sql="""
    WITH f AS (
      SELECT o_orderpriority AS category,
             CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS y
      FROM orders
    ),
    cat AS (
      SELECT category, CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS s
      FROM f GROUP BY category
    ),
    g AS (SELECT SUM(n) AS gn, SUM(s) AS gs FROM cat),
    enc AS (
      SELECT f.category,
             CAST(round(
               ((CAST(cat.s - f.y AS DOUBLE)
                 + 10.0 * (CAST(g.gs AS DOUBLE) / CAST(g.gn AS DOUBLE)))
                / (CAST(cat.n AS DOUBLE) - 1.0 + 10.0)) * 1000
             ) AS BIGINT) AS loo_m
      FROM f JOIN cat ON f.category = cat.category CROSS JOIN g
    )
    SELECT cat.category,
           cat.n AS n_rows,
           CAST(cat.s AS DOUBLE) / CAST(cat.n AS DOUBLE) AS naive_enc_cents,
           CAST(SUM(enc.loo_m) AS DOUBLE) / (cat.n * 1000.0)
             AS avg_loo_enc_cents,
           CAST(MIN(enc.loo_m) AS DOUBLE) / 1000.0 AS min_loo_enc_cents,
           CAST(MAX(enc.loo_m) AS DOUBLE) / 1000.0 AS max_loo_enc_cents
    FROM enc JOIN cat ON enc.category = cat.category
    GROUP BY cat.category, cat.n, cat.s
    """,
    doc="Leave-one-out target encoding with additive smoothing (the "
        "standard leakage-safe categorical feature: enc_i = "
        "(sum_cat - y_i + m*prior)/(n_cat - 1 + m), m=10, prior = "
        "global mean) audited at category grain: naive vs average LOO "
        "encoding plus the min/max spread.  Target is exact integer "
        "cents; the per-row encoding is one double expression with "
        "the identical op tree in both engines, milli-rounded to "
        "BIGINT before the category rollup.  The smoothing term makes "
        "the denominator >= m, so no zero-division exists even for "
        "singleton categories.  Physical: category aggregates "
        "broadcast back onto the fact scan (equi-join, never NLJ), "
        "the global prior is a single broadcast row; one fact pass + "
        "one category-grain rollup at any scale.",
    tags=("llmdata", "features", "orders", "agg"),
)
def q324(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("category"),
        F.round(F.col("o_totalprice").cast(DEC) * 100)
        .cast("bigint")
        .alias("y"),
    )
    cat = f.groupBy("category").agg(
        F.count("*").alias("n"), F.sum("y").alias("s")
    )
    g = cat.agg(F.sum("n").alias("gn"), F.sum("s").alias("gs"))
    enc = (
        f.join(F.broadcast(cat), "category")
        .crossJoin(F.broadcast(g))
        .select(
            "category",
            F.round(
                (
                    (
                        (F.col("s") - F.col("y")).cast("double")
                        + F.lit(10.0)
                        * (F.col("gs").cast("double") / F.col("gn").cast("double"))
                    )
                    / (F.col("n").cast("double") - F.lit(1.0) + F.lit(10.0))
                )
                * 1000
            )
            .cast("bigint")
            .alias("loo_m"),
        )
    )
    return (
        enc.groupBy("category")
        .agg(
            F.sum("loo_m").alias("sum_loo"),
            F.min("loo_m").alias("min_loo"),
            F.max("loo_m").alias("max_loo"),
        )
        .join(F.broadcast(cat), "category")
        .select(
            "category",
            F.col("n").alias("n_rows"),
            emit(F.col("s").cast("double") / F.col("n").cast("double")).alias(
                "naive_enc_cents"
            ),
            emit(
                F.col("sum_loo").cast("double") / (F.col("n") * F.lit(1000.0))
            ).alias("avg_loo_enc_cents"),
            emit(F.col("min_loo").cast("double") / F.lit(1000.0)).alias(
                "min_loo_enc_cents"
            ),
            emit(F.col("max_loo").cast("double") / F.lit(1000.0)).alias(
                "max_loo_enc_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q325: forecast backtest metrics (sMAPE / MASE / bias)
# ---------------------------------------------------------------------------

@register(
    "q325_forecast_backtest",
    sql="""
    WITH daily AS (
      SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS d,
             CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100)
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2
    ),
    horizon AS (SELECT max(d) AS max_d FROM daily),
    pairs AS (
      SELECT a.grp, a.d, a.rev AS actual, l.rev AS fc,
             CASE WHEN a.d > max_d - 28 THEN 1 ELSE 0 END AS is_test
      FROM daily a
      JOIN daily l ON l.grp = a.grp AND l.d = a.d - 7
      CROSS JOIN horizon
    ),
    m AS (
      SELECT grp,
             CAST(SUM(CASE WHEN is_test = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test,
             SUM(CASE WHEN is_test = 1 THEN abs(actual - fc) ELSE 0 END)
               AS sae_test,
             SUM(CASE WHEN is_test = 1 THEN actual - fc ELSE 0 END)
               AS se_test,
             SUM(CASE WHEN is_test = 1 THEN CAST(round(
                   CASE WHEN actual + fc > 0
                        THEN 2.0 * CAST(abs(actual - fc) AS DOUBLE)
                             / CAST(actual + fc AS DOUBLE)
                        ELSE 0.0 END * 1000000) AS BIGINT)
                 ELSE 0 END) AS smape_m,
             CAST(SUM(CASE WHEN is_test = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_in,
             SUM(CASE WHEN is_test = 0 THEN abs(actual - fc) ELSE 0 END)
               AS sae_in
      FROM pairs GROUP BY grp
    )
    SELECT grp,
           n_test,
           CASE WHEN n_test > 0
                THEN CAST(smape_m AS DOUBLE) / (n_test * 1000000.0)
                ELSE 0.0 END AS smape,
           CASE WHEN sae_in > 0 AND n_test > 0 AND n_in > 0
                THEN (CAST(sae_test AS DOUBLE) * CAST(n_in AS DOUBLE))
                     / (CAST(n_test AS DOUBLE) * CAST(sae_in AS DOUBLE))
                ELSE 0.0 END AS mase,
           CASE WHEN n_test > 0
                THEN CAST(se_test AS DOUBLE) / CAST(n_test AS DOUBLE)
                ELSE 0.0 END AS bias_cents
    FROM m
    """,
    doc="Forecast backtest harness: a seasonal-naive weekly forecast "
        "(rev[d-7]) evaluated on the trailing 28-day holdout per order "
        "priority — sMAPE (per-day term micro-rounded before the "
        "sum; 0 when actual+forecast is 0), MASE (the scale-free "
        "Hyndman-Koehler metric: test MAE over in-sample seasonal-"
        "naive MAE, computed as ONE division of exact integer "
        "cross-products sae_test*n_in / n_test*sae_in), and signed "
        "bias in cents.  Days without a d-7 counterpart drop from "
        "both numerator and denominator symmetrically (sparse-series "
        "contract, documented).  Physical: one (grp, day)-grain "
        "rollup, an aggregate-grain self-join on the 7-day shift "
        "(never a fact self-join), the horizon as one broadcast row; "
        "at 100 TB the fact scan is the only data-sized job.",
    tags=("timeseries", "forecast", "orders", "agg"),
)
def q325(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("grp"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast(DEC)) * 100)
            .cast("bigint")
            .alias("rev")
        )
    )
    horizon = daily.agg(F.max("d").alias("max_d"))
    lag = daily.select(
        F.col("grp").alias("lgrp"),
        F.col("d").alias("ld"),
        F.col("rev").alias("fc"),
    )
    pairs = (
        daily.join(
            lag,
            (F.col("lgrp") == F.col("grp"))
            & (F.col("ld") == F.date_sub(F.col("d"), 7)),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "grp",
            F.col("rev").alias("actual"),
            "fc",
            F.when(F.col("d") > F.date_sub(F.col("max_d"), 28), 1)
            .otherwise(0)
            .alias("is_test"),
        )
    )
    smape_term = F.round(
        F.when(
            (F.col("actual") + F.col("fc")) > 0,
            F.lit(2.0)
            * F.abs(F.col("actual") - F.col("fc")).cast("double")
            / (F.col("actual") + F.col("fc")).cast("double"),
        ).otherwise(F.lit(0.0))
        * 1000000
    ).cast("bigint")
    m = pairs.groupBy("grp").agg(
        F.sum(F.when(F.col("is_test") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_test"),
        F.sum(
            F.when(
                F.col("is_test") == 1, F.abs(F.col("actual") - F.col("fc"))
            ).otherwise(F.lit(0))
        ).alias("sae_test"),
        F.sum(
            F.when(
                F.col("is_test") == 1, F.col("actual") - F.col("fc")
            ).otherwise(F.lit(0))
        ).alias("se_test"),
        F.sum(
            F.when(F.col("is_test") == 1, smape_term).otherwise(F.lit(0))
        ).alias("smape_m"),
        F.sum(F.when(F.col("is_test") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_in"),
        F.sum(
            F.when(
                F.col("is_test") == 0, F.abs(F.col("actual") - F.col("fc"))
            ).otherwise(F.lit(0))
        ).alias("sae_in"),
    )
    return m.select(
        "grp",
        "n_test",
        F.when(
            F.col("n_test") > 0,
            F.col("smape_m").cast("double") / (F.col("n_test") * F.lit(1000000.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("smape"),
        F.when(
            (F.col("sae_in") > 0) & (F.col("n_test") > 0) & (F.col("n_in") > 0),
            (F.col("sae_test").cast("double") * F.col("n_in").cast("double"))
            / (F.col("n_test").cast("double") * F.col("sae_in").cast("double")),
        )
        .otherwise(F.lit(0.0))
        .alias("mase"),
        F.when(
            F.col("n_test") > 0,
            F.col("se_test").cast("double") / F.col("n_test").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("bias_cents"),
    )


# ---------------------------------------------------------------------------
# q326: streaming incremental gram maintenance -> same PCA answer
# ---------------------------------------------------------------------------

@register(
    "q326_stream_gram_pca",
    sql=_PCA_SQL,
    doc="Streaming continuous maintenance of the q315 gram matrix: the "
        "embedding corpus lands as parquet in two waves, two "
        "checkpointed Trigger.AvailableNow drains compute each micro-"
        "batch's exact-integer gram partial (the shared gram_of "
        "kernel) and additive-merge it into a warehouse rollup keyed "
        "(i, j) with the batch-id idempotence stamp (q102's exactly-"
        "once discipline: a redelivered batch id <= the generation-"
        "stamped last id is skipped) — then the driver-side eigensolve "
        "runs on the STORED gram.  Because the gram is a sum of "
        "per-row integer outer products, streaming accumulation is "
        "EXACTLY the batch answer (integer addition is associative), "
        "so the oracle is q315's SQL verbatim — continuous PCA whose "
        "per-trigger cost is O(batch + d^2), never a corpus rescan.  "
        "At 100 TB this is how an embedding-drift monitor stays "
        "fresh: the eigensolve reads d^2 stored cells regardless of "
        "history size.",
    tags=("streaming", "llmdata", "embeddings", "linalg", "warehouse"),
)
def q326(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    from pathlib import Path

    from ..merge.incremental import refresh_additive
    from ..merge.warehouse import Warehouse

    root = Path(tempfile.mkdtemp(prefix="q326_gram_"))
    land = root / "land"
    land.mkdir()
    wh = Warehouse(spark, root / "wh")
    emb = load(spark, sf_dir, "embeddings")

    def land_wave(df: DataFrame, tag: str) -> None:
        wave = root / f"wave_{tag}"
        df.write.parquet(str(wave))
        for f in wave.glob("part-*.parquet"):
            shutil.copy(f, land / f"{tag}_{f.name}")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        meta = wh.write_meta("gram") or {}
        if batch_id <= meta.get("last_batch_id", -1):
            return  # redelivered after a crash-between-flip-and-commit
        # Emptiness is probed on the RAW micro-batch (a 1-row file-source
        # scan), not on the aggregated delta — gram_of is the data-sized
        # mapInPandas+aggregate kernel, and probing ITS emptiness ran it
        # once for the probe and again inside refresh_additive (2x the
        # batch cost per micro-batch).  gram_of(nonempty) is always
        # nonempty (every vector contributes its diagonal), so the two
        # probes are equivalent.
        if batch_df.limit(1).isEmpty():
            return  # empty batch: leave the rollup generation untouched
        delta = gram_of(batch_df)
        refresh_additive(
            wh, "gram", delta, ["i", "j"], {"g": "sum"},
            meta={"last_batch_id": batch_id},
        )

    def drain() -> None:
        with stream_batch_confs(spark, land):
            q = (
                spark.readStream.schema(emb.schema)
                .parquet(str(land))
                .writeStream.foreachBatch(merge_batch)
                .option("checkpointLocation", str(root / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    land_wave(emb.where(F.col("vec_id") % 2 == 0), "a")
    drain()
    land_wave(emb.where(F.col("vec_id") % 2 == 1), "b")
    drain()
    gram_rows = wh.read("gram").collect() if wh.exists("gram") else []
    return _solve_power_iteration(spark, gram_rows)


# ---------------------------------------------------------------------------
# q327: Brier score with Murphy decomposition
# ---------------------------------------------------------------------------

@register(
    "q327_brier_decomposition",
    sql="""
    WITH f AS (
      SELECT least(19, CAST(floor(value / 30.0) AS BIGINT)) AS k,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    b AS (
      SELECT k,
             CAST(COUNT(*) AS BIGINT) AS nk,
             CAST(SUM(y) AS BIGINT) AS pk
      FROM f GROUP BY k
    ),
    t AS (
      SELECT CAST(SUM(nk) AS BIGINT) AS n, CAST(SUM(pk) AS BIGINT) AS p,
             SUM(pk * (2*k + 1 - 40) * (2*k + 1 - 40)
                 + (nk - pk) * (2*k + 1) * (2*k + 1)) AS brier_num,
             SUM(CAST(round(
               CAST(((2*k + 1) * nk - 40 * pk) AS DOUBLE)
                    * CAST(((2*k + 1) * nk - 40 * pk) AS DOUBLE)
               / (1600.0 * nk) * 1000000) AS BIGINT)) AS rel_m
      FROM b
    ),
    r AS (
      SELECT t.n, t.p, t.brier_num, t.rel_m,
             SUM(CAST(round(
               CAST((b.pk * t.n - t.p * b.nk) AS DOUBLE)
                    * CAST((b.pk * t.n - t.p * b.nk) AS DOUBLE)
               / (CAST(b.nk AS DOUBLE) * t.n * t.n) * 1000000)
               AS BIGINT)) AS res_m
      FROM b, t GROUP BY 1, 2, 3, 4
    )
    SELECT n AS n_events,
           CAST(p AS DOUBLE) / n AS base_rate,
           CAST(brier_num AS DOUBLE) / (1600.0 * n) AS brier,
           CAST(rel_m AS DOUBLE) / (n * 1000000.0) AS reliability,
           CAST(res_m AS DOUBLE) / (n * 1000000.0) AS resolution,
           CAST(p AS DOUBLE) * (n - p) / (CAST(n AS DOUBLE) * n)
             AS uncertainty
    FROM r
    """,
    doc="Brier score with the Murphy (1973) decomposition — "
        "reliability - resolution + uncertainty — for a discrete "
        "forecast grid (p_k = (2k+1)/40 over 20 value buckets) "
        "predicting the purchase outcome.  The Brier numerator is "
        "EXACT integers (per-bin pos*(2k+1-40)^2 + neg*(2k+1)^2 over "
        "denominator 1600N — no float at all); reliability and "
        "resolution are per-BIN rationals micro-rounded to BIGINT "
        "before the <=20-row sum; uncertainty is one exact division.  "
        "Overflow bound: the rel/res linear terms are computed in "
        "exact int64 (|res_num| <= nk*n < n^2, safe to n ~ 3e9 "
        "events), then cast to double BEFORE squaring — the int64 -> "
        "double cast is exact below 2^53 and IEEE multiplication is "
        "engine-identical, so Spark and DuckDB agree at any realistic "
        "scale and nothing ever squares in BIGINT (which wrapped "
        "silently past |x| ~ 3e9 under Spark non-ANSI).  "
        "The decomposition identity brier = rel - res + unc holds "
        "exactly at this grain (forecast constant within bins) and is "
        "asserted to micro precision in tests.  Physical: one fact "
        "scan to a 20-bin aggregate; everything downstream is "
        "bin-grain with single-row totals (broadcast cross).",
    tags=("llmdata", "eval", "events", "stats", "agg"),
)
def q327(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = load(spark, sf_dir, "events").select(
        F.least(
            F.lit(19).cast("bigint"),
            F.floor(F.col("value") / F.lit(30.0)).cast("bigint"),
        ).alias("k"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = f.groupBy("k").agg(
        F.count("*").alias("nk"), F.sum("y").cast("bigint").alias("pk")
    )
    two_k1 = 2 * F.col("k") + 1
    rel_num = (two_k1 * F.col("nk") - 40 * F.col("pk"))
    t = b.agg(
        F.sum("nk").alias("n"),
        F.sum("pk").alias("p"),
        F.sum(
            F.col("pk") * (two_k1 - 40) * (two_k1 - 40)
            + (F.col("nk") - F.col("pk")) * two_k1 * two_k1
        ).alias("brier_num"),
        F.sum(
            F.round(
                (rel_num.cast("double") * rel_num.cast("double"))
                / (F.lit(1600.0) * F.col("nk"))
                * 1000000
            ).cast("bigint")
        ).alias("rel_m"),
    )
    res_num = F.col("pk") * F.col("n") - F.col("p") * F.col("nk")
    r = (
        b.crossJoin(F.broadcast(t))
        .groupBy("n", "p", "brier_num", "rel_m")
        .agg(
            F.sum(
                F.round(
                    (res_num.cast("double") * res_num.cast("double"))
                    / (F.col("nk").cast("double") * F.col("n") * F.col("n"))
                    * 1000000
                ).cast("bigint")
            ).alias("res_m")
        )
    )
    return r.select(
        F.col("n").alias("n_events"),
        emit(F.col("p").cast("double") / F.col("n")).alias("base_rate"),
        emit(F.col("brier_num").cast("double") / (F.lit(1600.0) * F.col("n"))).alias(
            "brier"
        ),
        emit(F.col("rel_m").cast("double") / (F.col("n") * F.lit(1000000.0))).alias(
            "reliability"
        ),
        emit(F.col("res_m").cast("double") / (F.col("n") * F.lit(1000000.0))).alias(
            "resolution"
        ),
        emit(
            F.col("p").cast("double")
            * (F.col("n") - F.col("p"))
            / (F.col("n").cast("double") * F.col("n"))
        ).alias("uncertainty"),
    )
