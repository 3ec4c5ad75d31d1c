"""Sweep hygiene: catalog queries must not leak persisted blocks.

Round-2 lesson: the sketch operators persisted band/fingerprint frames
and never released them, so a 54-query single-session sweep accumulated
cache blocks and GC exposure (the driver's contaminated bench window
amplified exactly this).  The operators are now cache-free (shuffle
reuse instead of persist) except for iterative checkpoints, which are
released explicitly per round; the only permitted residue is storage
owned by Spark's ContextCleaner (the final frame of an iterative
algorithm), which must drain once the result is dropped.
"""

from __future__ import annotations

import gc
import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aquiles_etl_pipeline_spark.relational import registry  # noqa: E402

# ~220 s of GC-polling sweeps across ~50 queries: the storage-hygiene
# net belongs to the builder's --slow certification lane, not the
# driver's time-budgeted default run (r11 suite split).
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"

# the queries that exercise every operator that EVER persisted/checkpointed:
# minhash bands, simhash blocks, embedding LSH bands, connected components,
# and the ETL pipeline's persist+unpersist pair
PERSIST_PRONE = [
    "q24_ngram_jaccard_pairs",
    "q25_minhash_dedup_survivors",
    "q28_embedding_near_dups",
    "q35_simhash_near_dup_pairs",
    "q52_dedup_clusters",
    "q41_etl_star_pipeline",
    "q60_semantic_dedup",
    "q72_llmdata_pipeline_e2e",
    "q81_incremental_dedup",
    # q41 covers the merge chain's plan/src persists (incl. the M2/M3
    # shared mapping); q102's foreachBatch caches each micro-batch delta
    "q102_streaming_rollup_parity",
    # q121 runs two checkpointed stateful drains (state store, not RDD
    # persist — pinned here to prove nothing leaks into storage anyway)
    "q121_stateful_running_totals",
    # q126 runs two stream-static enrichment drains (broadcast dim per
    # micro-batch; file sink) — same proof
    "q126_stream_static_enrichment",
    # q127 runs two watermarked-aggregation drains (state store)
    "q127_watermark_late_drop",
    # q138's foreachBatch caches each micro-batch bitmap delta
    "q138_streaming_bitmap_dau",
    # q144 runs two stream-stream interval-join drains (dual-side join
    # state store restored across the restart)
    "q144_stream_interval_join",
    # q154 runs two dedup drains (dropDuplicatesWithinWatermark state
    # store restored across the restart)
    "q154_stream_dedup_watermark",
    # q165 runs three append-mode session-window drains (merging
    # session state restored across restarts, sentinel-flushed)
    "q165_stream_session_windows",
    # q156 localCheckpoints the oriented edge frame (5 plan branches)
    "q156_triangle_count",
    # q169 localCheckpoints each peel round's survivor frame (4 rounds)
    "q169_kcore_peel",
    # q172 runs two CDC drains whose foreachBatch applies merge_into
    # (warehouse writes + broadcast source per micro-batch)
    "q172_streaming_cdc_merge",
    # q183 localCheckpoints each BFS round's frontier + visited frames
    "q183_bfs_hops",
    # q194 runs two stateful space-saving drains (array-typed state
    # store restored across the restart)
    "q194_streaming_heavy_users",
    # q200 localCheckpoints the near-dup survivor corpus at the
    # dedup->decontamination release boundary (two consumers)
    "q200_curation_pipeline_v2",
    # q269 localCheckpoints the bigram-type table (four consumers:
    # ctx/cont/n_bi derivations + the test-stream join)
    "q269_kneser_ney_bigram",
    # q332 localCheckpoints the transition matrix + state list (four
    # chained matrix-power iterations each)
    "q332_absorbing_markov_conversion",
    # q339 runs two checkpointed histogram-rollup drains (foreachBatch
    # -> refresh_additive warehouse merges)
    "q339_stream_histogram_parity",
    # q328 localCheckpoints the basket table (part-degree explode +
    # pair expansion both consume it)
    "q328_adamic_adar_links",
    # q333 localCheckpoints tf (df aggregate + weight join) and the
    # weighted postings (norms + both pair sides)
    "q333_tfidf_cosine_topk",
    # q340 localCheckpoints the presence table (term ranks + both
    # co-occurrence join sides)
    "q340_umass_topic_coherence",
    # q341 localCheckpoints the phrase table (word explode, score
    # join, occurrence counts)
    "q341_rake_keyphrases",
    # q342 localCheckpoints the candidate frame (relevance, bigram
    # build, and both similarity-matrix axes consume it); the greedy
    # rounds themselves run driver-side
    "q342_mmr_diverse_topk",
    # q350 localCheckpoints the (doc, n, gram) count table (candidate
    # and reference legs of the clip join both consume it)
    "q350_bleu_pairs",
    # q195 runs four outer-join drains (dual-side join state + the
    # sentinel watermark-flush batches)
    "q195_stream_outer_join",
    # q241 runs four stateful sessionizer drains (event-time-timeout
    # state restored across restarts + two sentinel flush batches)
    "q241_stream_timeout_sessions",
    # q326 runs two checkpointed gram-rollup drains (foreachBatch ->
    # refresh_additive warehouse merges)
    "q326_stream_gram_pca",
    # q351 localCheckpoints the key-grain census (totals + report)
    "q351_join_skew_advisor",
    # q352 localCheckpoints the edge frame (degree rollup + three
    # triangle-join legs)
    "q352_local_clustering_coefficient",
    # q354 localCheckpoints the counts-of-counts frame (grid, r+1
    # self-join, N_1 aggregate)
    "q354_good_turing_smoothing",
    # q356 localCheckpoints the eligible-basket table (basket count,
    # degree rollup, both pair legs)
    "q356_rule_interest_measures",
    # q357 localCheckpoints the 25-cell frame (tot/xm/ym/mi + count)
    "q357_uncertainty_coefficient",
    # q361 runs two checkpointed SPRT-rollup drains (foreachBatch ->
    # refresh_additive warehouse merges)
    "q361_stream_sprt_monitor",
    # q370 runs three restarted drains whose foreachBatch applies
    # merge_into (warehouse writes + broadcast source per micro-batch)
    "q370_stream_restart_redelivery",
    # q388 localCheckpoints the brand-pair frame (sym/st/d2/p2 chain
    # references it ~8 times)
    "q388_bradley_terry_brands",
    # q134 localCheckpoints the bipartite edge list + degree rollup
    # (r10: one fact scan for the 3-iteration PageRank unroll)
    "q134_supplier_pagerank",
    # q202 localCheckpoints the distinct user-item pairs + capped frame
    # (r10: item counts, baskets and pair mining all read them)
    "q202_item_item_cf",
    # q308 localCheckpoints the source-token counts + z-score frame
    # (r10: one corpus tokenize pass; the delta self-join reads z twice)
    "q308_burrows_delta",
    # q318 localCheckpoints the confusion matrix (r10: rm/cm/tp/diag
    # all read it; one corpus classify pass)
    "q318_langid_kappa_f1",
    # q384/q395 localCheckpoint the lang x token counts (r10: tot and
    # v derive from it; one corpus tokenize pass)
    "q384_nb_lang_classifier",
    "q395_nb_margin_calibration",
    # q367/q377 localCheckpoint their one-row census frames (r10: the
    # union branches each re-ran the whole subtree unpinned)
    "q367_histogram_quantile_merge",
    "q377_slo_burn_rate",
    # q372 localCheckpoints the one-row column-census aggregate (six
    # per-column report projections consume it)
    "q372_column_encoding_advisor",
]


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


@pytest.mark.parametrize("name", PERSIST_PRONE)
def test_no_persistent_rdds_after_query(spark, name):
    # delta vs a baseline snapshot: other test modules may hold
    # legitimately cached fixtures in the shared session — the contract
    # here is that running a catalog query adds NO lasting storage
    baseline = _persistent_ids(spark)
    fn = registry()[name].fn
    df = fn(spark, SF)
    df.collect()
    del df, fn
    # ContextCleaner owns any remaining storage (e.g. the final labels
    # frame of connected components): dropping the Python ref releases
    # the JVM Dataset via py4j, then a JVM GC queues the RDD for
    # cleanup.  Poll briefly — the point is that storage DRAINS, not
    # that it was never used.
    # Drain latency scales with tenured-heap size: in a fresh session the
    # final checkpoint collects in ~2 s, but late in a full-suite session
    # a System.gc round can take 10-15 s to reach it — 30 s flaked.  The
    # deadline only binds on the failure path; passing runs exit as soon
    # as the storage drains.
    # 120 s was not always enough late in a 16-minute full-suite session
    # (q60's final labels checkpoint once outlived 240 System.gc hints
    # before collecting); escalate with runFinalization and a longer
    # deadline — the assertion stays strict, only patience grows, and a
    # REAL leak (a strong reference) still fails because no amount of GC
    # releases it.
    leaked = _persistent_ids(spark) - baseline
    deadline = time.time() + 300
    while leaked and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext._jvm.System.runFinalization()
        time.sleep(0.5)
        leaked = _persistent_ids(spark) - baseline
    assert not leaked, f"{len(leaked)} persistent RDDs still pinned after {name}"
