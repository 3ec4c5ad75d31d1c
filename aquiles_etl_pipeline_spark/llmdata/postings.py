"""Shared inverted-index ("postings") kernel.

The tokenize -> explode -> tf -> df -> (df-capped, micro-idf-weighted)
postings chain is the front-end of every lexical query in the catalog
(n-gram containment q106, bigram LM q209/q269, tf-idf cosine q333,
topic coherence q340, RAKE q341, BM25 q104, ...).  Each used to carry a
per-file copy of the chain; this module is the single source so the
tokenizer class, the empty-token rule, the df-cap filter, and the
micro-rounded idf stay byte-identical across consumers (the r08
verdict's consolidation ask).

Tokenizer contract (shared with ``dedup.tokens`` and every SQL oracle
twin): ``split(lower(trim(text)), '\\s+')`` — SQL ``trim`` strips
SPACES only (not Python's Unicode strip), Java's ``\\s`` is exactly
``[ \\t\\n\\x0b\\f\\r]`` (NOT Python's ``\\s``, which also eats
U+0085/U+00A0/U+2000.. that the corpus deliberately features, q317),
NULL text emits no rows, and the empty token produced by ``split('')``
is dropped by the exploding helpers.

Persistence stays with the CALLER: these helpers return lazy frames;
a query that fans one result into several consumers decides where the
``localCheckpoint`` goes (the PERSIST_PRONE hygiene contract).

Scale: every helper fans out through ``partitioning.fan_out`` first —
the explode kernels need one partition per core on a one-file toy
corpus, while a well-partitioned 100 TB scan passes through without a
shuffle.  All aggregations are plain map-side-combining groupBys on
the token key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..partitioning import fan_out
from .dedup import tokens

# Java's \s character class, verbatim.  For Arrow/pandas kernels that
# must reproduce the Spark/DuckDB split() tokenizer byte-for-byte
# (q106's vectorized n-gram builder): Python's \s additionally matches
# U+001C-001F, U+0085, U+00A0 and the U+2000 block, which Java's does
# not — using it would silently fork the tokenization.
JAVA_WS_RE = r"[ \t\n\x0b\f\r]+"


def token_rows(
    df: DataFrame, *id_cols: str, text_col: str = "text"
) -> DataFrame:
    """Token-occurrence rows ``(*id_cols, tok)``.

    fan_out -> lower/trim/split -> explode, with the empty tokens that
    ``split('')`` / edge separators produce dropped (every SQL twin
    filters ``tok <> ''`` symmetrically).
    """
    return (
        fan_out(df.select(*id_cols, text_col))
        .select(*id_cols, F.explode(tokens(text_col)).alias("tok"))
        .where(F.col("tok") != "")
    )


def positional_token_rows(
    df: DataFrame, *id_cols: str, text_col: str = "text"
) -> DataFrame:
    """Like :func:`token_rows` but with the 0-based in-document token
    position: ``(*id_cols, pos, tok)`` via posexplode.  Positions are
    assigned BEFORE the empty-token drop, so consumers that window on
    ``pos`` (RAKE's stopword islands, q341) see gaps exactly where the
    raw split emitted an empty — identical to the SQL twin's
    ``unnest .. WITH ORDINALITY``-style numbering.
    """
    return (
        fan_out(df.select(*id_cols, text_col))
        .select(
            *id_cols,
            F.posexplode(tokens(text_col)).alias("pos", "tok"),
        )
        .where(F.col("tok") != "")
    )


def term_frequencies(
    df: DataFrame, *id_cols: str, text_col: str = "text"
) -> DataFrame:
    """Document-grain term counts ``(*id_cols, tok, c)`` — the classic
    tf table, one map-side-combining groupBy over the token stream."""
    return (
        token_rows(df, *id_cols, text_col=text_col)
        .groupBy(*id_cols, "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def presence_rows(
    df: DataFrame, *id_cols: str, text_col: str = "text"
) -> DataFrame:
    """Distinct ``(*id_cols, tok)`` presence rows — the 0/1 projection
    of the tf table, feeding document-frequency ranks (q340) and
    set-overlap joins."""
    return token_rows(df, *id_cols, text_col=text_col).distinct()


def doc_frequencies(
    tok_grain: DataFrame,
    *,
    tok_col: str = "tok",
    group_cols: tuple[str, ...] = (),
    out_col: str = "df",
) -> DataFrame:
    """Document frequencies from an already-(doc, tok)-grain frame (a
    tf or presence table): ``(*group_cols, tok, df)``.  COUNT(*) ==
    COUNT(DISTINCT doc) because the input is doc-grain — re-counting
    distinct would shuffle doc ids for nothing."""
    return tok_grain.groupBy(*group_cols, tok_col).agg(
        F.count(F.lit(1)).cast("bigint").alias(out_col)
    )


def micro_idf(n_docs: Column, dfreq: Column) -> Column:
    """``round(ln(N / df) * 1e6)`` as BIGINT — the micro-rounded idf
    that keeps downstream weight sums exact integers (the q86/q175
    integer-micros discipline); one double ``ln`` per token TYPE, never
    per occurrence."""
    return F.round(
        F.log(n_docs.cast("double") / dfreq) * F.lit(1e6)
    ).cast("bigint")


def weighted_postings(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """df-capped, idf-weighted postings ``(id_col, tok, w)`` with
    ``w = c * micro_idf`` (BIGINT micros).

    The df band ``[min_df, max_df]`` drops hapax noise below and
    stopword-weight mass above — the cap is what bounds the postings
    self-join's per-token fan-out at corpus scale (a token shared by at
    most ``max_df`` docs contributes <= C(max_df, 2) candidate pairs).
    ``df < N`` additionally drops corpus-universal tokens (idf exactly
    0): standard tf-idf practice, and it guarantees every kept weight
    is > 0 so downstream norms are positive and cosines never hit the
    engine-divergent 0/0 path on degenerate corpora.

    The tf table feeds both the document-frequency aggregate and the
    weight join, so it is localCheckpoint-ed here — ONE corpus
    tokenize+explode, not two (token-grain materialization beats a
    second corpus pass; the returned postings frame stays lazy for the
    caller to persist if it fans out further).
    """
    tf = term_frequencies(df, id_col, text_col=text_col).localCheckpoint()
    dfreq = doc_frequencies(tf)
    n = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        tf.join(
            dfreq.where(
                (F.col("df") >= min_df) & (F.col("df") <= max_df)
            ),
            "tok",
        )
        .crossJoin(F.broadcast(n))
        .where(F.col("df") < F.col("n_docs"))
        .select(
            id_col,
            "tok",
            (F.col("c") * micro_idf(F.col("n_docs"), F.col("df"))).alias("w"),
        )
    )
