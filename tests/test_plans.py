"""Physical-plan shape regression tests — the 100 TB posture, asserted.

Correctness tests prove the operators compute the right answer at test
scale; these prove the PLANS would survive a 1000-executor cluster:
predicates and column pruning reach the parquet scan, dimension lookups
broadcast instead of shuffling, hot ETL expression chains stay inside
whole-stage codegen (no Python evaluation nodes), and nothing
degenerates into an unintended cartesian product.  A refactor that
silently breaks one of these ships a 100x regression that a 60k-row
correctness gate would never notice.
"""

from __future__ import annotations

import re

import pytest

from aquiles_etl_pipeline_spark.relational import registry

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def plans(spark) -> dict[str, str]:
    return {name: plan_of(spec.fn(spark, SF)) for name, spec in registry().items()}


def test_q01_scan_prunes_columns_and_pushes_predicate(plans):
    p = plans["q01_pricing_summary"]
    # 4 value columns + 2 group keys + the filter column out of 16
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert read.count(":") - 1 <= 7, f"lineitem scan reads too many columns: {read}"
    assert "PushedFilters" in p
    assert "LessThanOrEqual(l_shipdate" in p, "shipdate predicate not pushed to parquet"


def test_q02_dimension_joins_broadcast(plans):
    p = plans["q02_regional_revenue"]
    assert "BroadcastHashJoin" in p, "dimension lookups must broadcast, not shuffle"
    assert "CartesianProduct" not in p


def test_etl_transform_chain_stays_in_codegen(plans):
    """The reference's regex transform chain (F2-F13) compiles to native
    expressions: no BatchEvalPython / ArrowEvalPython stage may appear."""
    for q in ("q14_etl_price_clean", "q15_etl_text_clean", "q16_etl_iva_extract",
              "q29_etl_wide_record"):
        assert "EvalPython" not in plans[q], f"{q} fell out of codegen into Python"
        assert "codegen id" in plans[q], f"{q} has no whole-stage-codegen span"


def test_no_accidental_cartesian_products(plans):
    """Every catalog query must avoid cartesian/nested-loop joins except
    the ones that are the deliberate physical strategy:
    - q24 dense-vocab bitmap Jaccard: broadcast nested-loop IS the plan
      (popcount per pair, no shuffle; see dedup._bitmap_jaccard_pairs)
    - q20 brute-force top-k: one broadcast query row x table is a
      degenerate (1 x N) nested loop, i.e. a map
    - q42 tf-idf: the corpus doc-count joins in as a broadcast
      single-row aggregate (1 x N, conditionless by construction) —
      same degenerate map shape as q20
    - q47 k-NN join: corpus x broadcast(8 query rows) is the operator's
      definition (every corpus row scored against every query) — a
      constant-factor map, not an accidental quadratic
    - q52 dedup clusters: its pair-mining stage is q24's bitmap regime
      (the test corpus's vocabulary fits one bitmap, so the miner picks
      broadcast-NLJ popcount on purpose; real vocabularies take the
      prefix-filter shuffle path with no NLJ)
    - q58 vocab coverage: the corpus token total joins in as a
      broadcast single-row aggregate over the top-k rows (k x 1,
      conditionless by construction) — q42's degenerate map shape
    - q59 unigram perplexity: the corpus token total joins in as a
      broadcast single-row aggregate (1 x N) — q42's shape again
    - q64 temperature mixture: the mixture's total weight joins in as
      a broadcast single-row aggregate (1 x N) — q42's shape again
    - q65 embedding decontamination: corpus x broadcast(benchmark
      vectors) is the operator's definition (every training vector
      scored against every benchmark row) — q47's constant-factor map
    """
    allowed = {
        "q24_ngram_jaccard_pairs",
        "q20_cosine_topk",
        "q42_doc_tfidf_top_terms",
        "q47_embedding_knn_join",
        "q52_dedup_clusters",
        "q58_vocab_coverage",
        "q59_unigram_perplexity",
        "q64_temperature_mixture",
        "q65_embedding_decontamination",
        # q86 vocab drift: three scalar totals join in as broadcast
        # single-row aggregates (1 x N) — q42's degenerate map shape
        "q86_vocab_drift",
        # q92 RFM: the corpus max-date joins in as a broadcast
        # single-row aggregate (1 x N) — q42's shape again
        "q92_customer_rfm",
        # q99 market share: the corpus revenue total joins in as a
        # broadcast single-row aggregate (1 x N) — q42's shape again
        "q99_nation_market_share",
        # q104 BM25: corpus doc-count/avgdl join in as a broadcast
        # single-row aggregate (1 x N) — q42's shape again
        "q104_bm25_search",
        # q105 quantize recall: candidates x broadcast(5 probes) is the
        # operator's definition — q47's constant-factor map shape
        "q105_quantize_recall",
        # q108 k-means assign: vectors x broadcast(8 centroids) IS the
        # E-step (every vector scored against every centroid) — q47's
        # constant-factor map shape
        "q108_kmeans_assign_stats",
        # q111 bloom semi join: the fixed-size bloom bitmap attaches to
        # the fact scan as a broadcast single-row array (1 x N,
        # conditionless by construction) — q42's degenerate map shape
        "q111_bloom_semijoin_revenue",
        # q130 heavy hitters: the corpus token total joins in as a
        # broadcast single-row aggregate (1 x N) — q42's shape again
        "q130_heavy_hitter_words",
        # q136 equi-depth buckets: the quartile-boundary row joins in
        # as a broadcast single-row aggregate (1 x N) — q42's shape
        "q136_equi_depth_buckets",
        # q147 set algebra: the |labels| x |labels| pair scaffold is a
        # deliberate tiny cross join (5x5 label sizes) so DISJOINT
        # pairs still report with n_inter = 0
        "q147_theta_sketch_set_ops",
        # q156 triangle count: the final (n_nodes x n_edges x
        # n_triangles) assembly is three deliberate 1x1 single-row
        # aggregate joins — q130's shape
        "q156_triangle_count",
        # q175 DSIR: the corpus-totals row (token masses + vocab size)
        # joins in as a broadcast single-row aggregate (1 x N) —
        # q42's degenerate map shape
        "q175_dsir_importance_select",
        # q180 trailing distinct: the max-day bound joins in as a
        # broadcast single-row aggregate (1 x N) — q42's shape again
        "q180_trailing_distinct",
        # q201 association rules: the basket-count total joins in as a
        # broadcast single-row aggregate (1 x N) — q42's shape again
        "q201_association_rules",
        # q209 bigram LM: the train-vocab size joins in as a broadcast
        # single-row aggregate (1 x N) — q42's shape again
        "q209_bigram_lm_nll",
        # q224 hard negatives: corpus x broadcast(8 anchors) under a
        # label-inequality condition IS the operator (every corpus row
        # scored against every cross-label anchor) — q47's constant-
        # factor map with a non-equi residual, hence NLJ by design
        "q224_hard_negative_mining",
        # q226 PSI: the two corpus totals join in as a broadcast
        # single-row aggregate (1 x N) — q42's degenerate map shape
        "q226_psi_length_drift",
        # q231 Kaplan-Meier: the corpus horizon (max ts) joins in as a
        # broadcast single-row aggregate (1 x N) — q42's shape again
        "q231_retention_survival",
        # q240 Q22-shape: the positive-balance total/count joins in as
        # a broadcast single-row aggregate (1 x N) — q42's shape again
        "q240_wealthy_inactive_customers",
        # q255 word2vec table: the corpus token total joins in as a
        # broadcast single-row aggregate (1 x N) — q42's shape again
        "q255_subsample_keep_probs",
        # q265 Mann-Kendall: the three scalar legs (n, S, tie
        # adjustment) assemble by 1x1 single-row cross joins — q130's
        # shape
        "q265_mann_kendall_trend",
        # q269 Kneser-Ney: the (n_bigram_types, vocab) totals row joins
        # in as a broadcast single-row aggregate (1 x N) — q42's shape
        "q269_kneser_ney_bigram",
        # q271 alignment/uniformity: the vec_id<vec_id pairing of the
        # hash-sampled subset is the operator's definition (q47's
        # constant-factor map with a non-equi residual), and the two
        # single-row metric legs cross — q130's shape
        "q271_alignment_uniformity",
        # q272 collocations: the (token total, bigram total) row joins
        # in as a broadcast single-row aggregate (1 x N) — q42's shape
        "q272_collocations_pmi",
        # q283 Kendall tau: the day<day pairing is a broadcast range
        # NLJ over the calendar-bounded day frame — q265's shape
        "q283_kendall_tau_daily",
        # q287 dormancy: the corpus horizon (max day) joins in as a
        # broadcast single-row aggregate (1 x N) — q92's shape again
        "q287_dormancy_gaps",
        # q293 Theil-Sen: the day<day slope pairing is a broadcast
        # range NLJ over the calendar-bounded day frame (<=366 rows,
        # <=67k pairs regardless of fact volume) — q283's shape; the
        # median's n_pairs scalar also crosses as a single-row
        # aggregate (q130's shape)
        "q293_theil_sen_slope",
        # q297 decayed popularity: the corpus horizon (max shipdate)
        # joins in as a broadcast single-row aggregate (1 x N) — q42's
        # shape again
        "q297_decayed_part_popularity",
        # q298 latency deciles: the 9-row decile-target frame joins the
        # distinct-value cumulative frame on a pure rank-range residual
        # (f_prev < r <= f) — a deliberate broadcast NLJ whose left
        # side is distinct-latency grain, not fact grain
        "q298_conversion_latency_deciles",
        # q308 Burrows delta: the |sources| x top-50-words scaffold is
        # a deliberate dims-only cross join (q147's shape) so missing
        # words densify to zero frequency
        "q308_burrows_delta",
        # q309 threshold sweep: the mined pair set joins a broadcast
        # 3-row threshold frame on the jaccard residual (q298's
        # shape), and the underlying tiny-vocab miner is q24's bitmap
        # popcount NLJ
        "q309_dedup_threshold_sweep",
        # q311 cluster histogram: q52's machinery (bitmap miner NLJ)
        # under a size rollup
        "q311_cluster_size_histogram",
        # q312 generalization ladder: the 3-row width scaffold fans
        # every fact row out through a broadcast cross (the
        # grouping-sets shape — deliberate)
        "q312_generalization_ladder",
        # q318 kappa: the (n, sum rm*cm) totals and diagonal-sum rows
        # cross onto the <=6-row class frame — q130's shape
        "q318_langid_kappa_f1",
        # q319 PR sweep: the positives total and the AP numerator are
        # broadcast single-row aggregates crossed onto the
        # distinct-score-grain curve — q42's shape
        "q319_pr_curve_average_precision",
        # q320 LOO influence: the global sufficient-statistics row
        # crosses onto the 20-row source frame — q130's shape
        "q320_loo_source_influence",
        # q321 Shapley: the 16-subset lattice joins the <=16 mask-grain
        # rows on a bit-containment theta condition (a deliberate
        # constant-size NLJ — the subset-lattice scaffold), and the
        # conversions total crosses as a single row
        "q321_shapley_attribution",
        # q323 l-diversity/t-closeness: the class x bucket scaffold is
        # a deliberate dims-only cross (q308's shape) so missing
        # buckets densify to zero, plus the corpus-total single row
        "q323_ldiversity_tcloseness",
        # q324 LOO encoding: the global prior joins in as a broadcast
        # single-row aggregate (1 x N) — q42's shape
        "q324_loo_target_encoding",
        # q325 forecast backtest: the horizon (max day) joins in as a
        # broadcast single-row aggregate (1 x N) — q42's shape
        "q325_forecast_backtest",
        # q327 Brier decomposition: the (n, p, brier, rel) totals row
        # crosses onto the 20-bin frame — q130's shape
        "q327_brier_decomposition",
        # q331 jackknife: the (nb, n, s) totals row crosses onto the
        # 16-cluster frame, and the theta-sum row crosses back for the
        # deviation pass — two q130-shape single-row crosses
        "q331_cluster_jackknife_se",
        # q334 RBO: the 20-row depth spine left-joins maxr counts on a
        # <= range residual (a deliberate constant-size NLJ — q298's
        # shape), and the overlap@20 row crosses as a single row
        "q334_rank_biased_overlap",
        # q336 negative sampling: the micro-weight total crosses onto
        # the vocab frame as a single-row aggregate — q42's shape
        "q336_negative_sampling_table",
        # q338 q-q points: the 19-row probability spine joins the rank
        # frame on the order-statistic index residual
        # (rn = 1 + (p(n-1)) div 100) — q298's shape
        "q338_qq_quantile_points",
        # q343 IPS: the total-rows scalar crosses onto the <= 4-cohort
        # totals row as a single-row aggregate — q42's shape
        "q343_ips_offpolicy_eval",
        # q347 randomization inference: the fact fans out against the
        # broadcast 64-row draw spine (the deliberate, documented cost
        # of design-based inference — q312's fan-out shape), and the
        # observed-diff single row crosses twice (q42's shape)
        "q347_randomization_inference",
        # q348 ECE: the event total crosses onto the 20-bin frame as a
        # single-row aggregate — q327/q130's shape
        "q348_calibration_ece",
        # q349 gap sensitivity: the lag-window output fans out against
        # the broadcast 3-row threshold spine (one window, three
        # thresholds — q312's fan-out shape at x3)
        "q349_session_gap_sensitivity",
        # q351 skew advisor: the two-number census aggregate crosses
        # onto the key-grain frame (q42's single-row-aggregate shape)
        "q351_join_skew_advisor",
        # q353 Nelson-Aalen: the corpus horizon (max ts) crosses onto
        # the user-grain frame as a single-row aggregate — q92's shape
        "q353_nelson_aalen_hazard",
        # q354 Good-Turing: token total + N_1 cross onto the <=10-row
        # grid as broadcast single-row aggregates — q42's shape
        "q354_good_turing_smoothing",
        # q356 rule measures: the basket count crosses onto the pair
        # frame as a single-row aggregate — q42's shape
        "q356_rule_interest_measures",
        # q357 uncertainty coefficient: tot/hx/hy/mi single-row
        # aggregates cross-assemble the one-row output — q42's shape
        "q357_uncertainty_coefficient",
        # q360 Poisson bootstrap: the fact fans out against the
        # broadcast 32-row draw spine (q347's documented fan-out), and
        # the lo/hi order-statistic single rows left-join onto the
        # observed leg (the q347 empty-draws lesson)
        "q360_poisson_bootstrap_ci",
        # q362 hash collisions: the vocab totals cross onto the
        # 1024-bucket frame as a single-row aggregate — q42's shape
        "q362_feature_hash_collisions",
        # q367 was allowlisted for its pre-pin cross-assembly shape;
        # since the r10 localCheckpoint pin its final plan has no
        # BroadcastNestedLoopJoin at all (the rewritten
        # test_q367_quantile_merge_two_level_aggregate asserts 'Join'
        # not in plan), so the entry was dropped to keep this guard
        # tight (r10 ADVICE item).
        # q368 HLL union: the one-row harmonic-sum/empty-count leg
        # crosses onto the one-row exact-count leg (1 x 1) — q130's
        # single-row assembly shape; the 64-row register scaffold is
        # an equi-join, not part of the NLJ
        "q368_hll_register_union",
        # q371 count-min: the corpus token total crosses onto the
        # 10-row top-token frame as a broadcast single-row aggregate
        # (1 x 10) — q42's degenerate map shape; the sketch-cell
        # lookups are broadcast equi-joins on bucket
        "q371_countmin_heavy_hitters",
        # q377 SLO burn rate: the corpus horizon (max ts) crosses onto
        # the fact scan as a broadcast single-row aggregate — q353's
        # shape; everything after is a single conditional aggregation
        "q377_slo_burn_rate",
        # q378 join-size estimator: per candidate join, the fact-total
        # and dim-total single-row aggregates cross onto the one-row
        # histogram-product aggregate (1 x 1, twice) — q130's
        # single-row assembly shape; the key-histogram join itself is
        # an equi-join on k
        "q378_join_size_estimator",
        # q384 NB scoring: test term-frequency rows fan out against
        # the broadcast class spine (bounded by LABEL-SPACE size —
        # q312's fan-out shape) plus the vocab-size single row (q42's
        # shape); token-count joins are equi-keyed on (lang, tok)
        "q384_nb_lang_classifier",
        # q386 zone-map advisor: the shard-census row crosses onto the
        # selectivity row (1 x 1 — q130's single-row assembly shape)
        # before unfolding to five literal predicate rows
        "q386_zonemap_skip_advisor",
        # q387 MV advisor: the row-total single-row aggregate crosses
        # onto the six-row candidate frame — q42's shape
        "q387_rollup_mv_advisor",
        # q391 Kaplan-Meier: the <=2-row cohort frame crosses the
        # broadcast 4-row horizon spine (dimension-bounded fan-out,
        # q312's shape) before the day-grain LEFT join
        "q391_kaplan_meier",
        # q393 CCF: the day-grain revenue frame fans out against the
        # broadcast 7-row lag spine (q312's bounded fan-out); the
        # shifted-day join itself is an equi-join
        "q393_ccf_lead_lag",
        # q395 NB calibration: q384's scoring shape — label-space
        # fan-out plus the vocab-size single row
        "q395_nb_margin_calibration",
    }
    for name, p in plans.items():
        if name in allowed:
            continue
        assert "CartesianProduct" not in p, f"{name} plans a cartesian product"
        assert "BroadcastNestedLoopJoin" not in p, f"{name} plans a nested-loop join"


def test_q315_gram_subplan(spark):
    """q315 collects its dimension-bounded gram inside fn, so the
    catalog-wide plan sweep only ever sees the final LocalRelation —
    pin the REAL distributed sub-plan here: one Arrow-batched
    MapInPandas partial feeding one d^2-key aggregate Exchange, and no
    join of any kind (the explode+self-join formulation this replaced
    would show one)."""
    import re

    from aquiles_etl_pipeline_spark.relational.round7b_queries import q315_gram

    p = plan_of(q315_gram(spark, SF))
    assert "MapInPandas" in p, "gram partial must be the Arrow-batched path"
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, (
        "gram must shuffle exactly once (the d^2-key combine)"
    )
    assert "Join" not in p and "CartesianProduct" not in p


def test_stratified_sample_is_shuffle_free(plans):
    """q51 is a pure filter+projection — a sampling primitive that
    plans ANY Exchange or Python node would not be a 'just a scan' at
    100 TB, which is its whole contract."""
    import re

    p = plans["q51_stratified_sample"]
    assert not re.search(r"\(\d+\) Exchange", p), "stratified sample plans a shuffle"
    assert "EvalPython" not in p


def test_repetition_stats_reuses_id_distribution(plans):
    """q50's final token-stats x bigram-stats join must reuse the
    hash-by-doc_id distribution the aggregations already produced: two
    n-gram orders x (explode-count + per-doc rollup) = at most 6
    Exchanges incl. the fan-out repartition, and none added by the
    join itself (a SortMergeJoin re-shuffling both sides would show 8)."""
    import re

    p = plans["q50_doc_repetition_stats"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 6
    assert "EvalPython" not in p


def test_pii_redaction_is_pure_codegen_map(plans):
    """q46 must stay a shuffle-free whole-stage-codegen projection —
    a regexp chain that plans an Exchange or a Python eval node would
    be a 100x regression at corpus scale."""
    p = plans["q46_doc_pii_redaction"]
    assert "EvalPython" not in p, "PII redaction fell out of codegen into Python"
    assert "codegen id" in p
    import re

    assert not re.search(r"\(\d+\) Exchange", p), "PII redaction plans a shuffle"


def test_quantization_is_pure_codegen_map(plans):
    """q54 must stay a shuffle-free whole-stage-codegen projection —
    int8 quantization is a scan-speed compression pass at corpus
    scale, so any Exchange or Python node is a regression."""
    import re

    p = plans["q54_embedding_quantize_int8"]
    assert "EvalPython" not in p
    assert not re.search(r"\(\d+\) Exchange", p), "quantization plans a shuffle"


def test_decontamination_broadcasts_benchmark_grams(plans):
    """q49's benchmark gram set must broadcast (semi join) — shuffling
    the training side's grams against a tiny benchmark is the trap."""
    p = plans["q49_benchmark_decontamination"]
    assert "BroadcastHashJoin" in p and "LeftSemi" in p


def test_ledger_lookups_broadcast(plans):
    """Anti-join gates (customers-without-orders) keep the probe side
    shuffle-free when the build side is small."""
    p = plans["q08_customers_without_orders"]
    assert "CartesianProduct" not in p


def test_sketch_queries_shuffle_only_ids_and_hashes(plans):
    """The minhash band self-join must not shuffle shingle arrays: no
    Exchange may carry the _sh column."""
    p = plans["q25_minhash_dedup_survivors"]
    for block in p.split("\n\n"):
        if block.startswith("(") and "Exchange" in block.splitlines()[0]:
            assert "_sh" not in block, "band join shuffles shingle arrays"


def test_copartitioned_join_reuses_distribution(spark):
    """Pre-partitioning both join sides on the key must satisfy the
    join's distribution requirement — Catalyst plans NO additional
    Exchange beyond the two explicit repartitions.  This is the
    co-located (bucketed) join pattern: at 100 TB the repartition is
    replaced by bucketed table layout and the join is shuffle-free."""
    from pyspark.sql import functions as F

    a = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(2).alias("y"))
    # hint("merge") pins sort-merge so auto-broadcast (these are tiny
    # test tables) doesn't mask the distribution question
    joined = a.repartition(32, "k").hint("merge").join(b.repartition(32, "k"), "k")
    p = plan_of(joined)
    import re

    n_exchanges = len(re.findall(r"\(\d+\) Exchange", p))
    assert "SortMergeJoin" in p
    assert n_exchanges == 2, f"expected only the 2 explicit repartitions:\n{p}"


def test_c4_filters_is_pure_codegen_map(plans):
    """q56 is the cheapest pass of the corpus pipeline: a shuffle-free
    whole-stage-codegen projection over the documents scan."""
    import re

    p = plans["q56_c4_document_filters"]
    assert not re.search(r"\(\d+\) Exchange", p), "C4 filter bank plans a shuffle"
    assert "EvalPython" not in p
    assert "codegen id" in p


def test_chunk_dedup_shuffles_chunks_not_documents(plans):
    """q55: exactly two Exchanges (rank-by-chunk-text window +
    reassembly groupBy), no Python nodes — a third Exchange would mean
    the explode output is being re-shuffled redundantly."""
    import re

    p = plans["q55_chunk_dedup"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2, "chunk dedup added a shuffle"
    assert "EvalPython" not in p


def test_token_budget_single_window_shuffle(plans):
    """q57: one hash Exchange for the per-group running-sum window and
    nothing else; the operator's 100 TB contract is 'one pass, one
    shuffle'."""
    import re

    p = plans["q57_token_budget_sample"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1, "token budget added shuffles"
    assert "EvalPython" not in p


def test_rolling_features_single_exchange(plans):
    """q61 declares six window frames over one (key, ts, id) ordering —
    Catalyst must plan exactly ONE Exchange (hash by user_id) and reuse
    it for every frame.  A second Exchange would mean the frames split
    into separately-shuffled Window operators: 6x the shuffle of the
    events table at 100 TB."""
    import re

    p = plans["q61_event_rolling_features"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, "rolling features re-shuffle"
    assert "EvalPython" not in p


def test_url_parse_is_pure_codegen_map(plans):
    """q62 is a regexp-projection chain — any Exchange or Python node
    would turn a map-only normalization pass into a shuffle at corpus
    scale."""
    import re

    p = plans["q62_url_canonicalize"]
    assert not re.search(r"\(\d+\) Exchange", p), "URL parse plans a shuffle"
    assert "EvalPython" not in p
    assert "codegen id" in p


def test_decontamination_never_shuffles_training_side(plans):
    """q65: the benchmark side broadcasts; the only Exchange allowed is
    the per-vector max aggregation's hash by vec_id (partial max first,
    so the shuffle carries one row per training vector, no vectors)."""
    import re

    p = plans["q65_embedding_decontamination"]
    assert "BroadcastExchange" in p, "benchmark side is not broadcast"
    shuffles = [l for l in p.splitlines() if re.search(r"\(\d+\) Exchange", l)]
    assert len(shuffles) <= 1, f"decontamination shuffles too much: {shuffles}"


def test_funnel_single_shuffle_no_joins(plans):
    """q67's stage cascade is array expressions over ONE groupBy — a
    per-stage join formulation would shuffle events k times."""
    import re

    p = plans["q67_conversion_funnel"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, "funnel re-shuffles"
    assert "Join" not in p, "funnel plans joins"
    assert "EvalPython" not in p


def test_fan_out_passes_through_well_partitioned_input(spark):
    """fan_out must be a no-op (identical plan object semantics: no
    added Exchange) when the input already has >= target partitions —
    the unconditional-repartition version re-shuffled a production-
    scale scan for zero gain."""
    from aquiles_etl_pipeline_spark.partitioning import fan_out

    one = spark.range(100).coalesce(1)
    assert fan_out(one, 8).rdd.getNumPartitions() == 8
    wide = spark.range(100).repartition(8)
    out = fan_out(wide, 8)
    assert out is wide, "fan_out re-shuffled an already-partitioned input"


def test_length_buckets_single_exchange(plans):
    """q63 is one NTILE window — one hash Exchange on lang, nothing
    else."""
    import re

    p = plans["q63_length_buckets"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "EvalPython" not in p


def test_temperature_mixture_broadcasts_quotas(plans):
    """q64: the per-group count and quota frames are tiny and must
    BROADCAST back onto the ranked rows — a SortMergeJoin would
    re-shuffle the full corpus against a groups-sized table."""
    import re

    p = plans["q64_temperature_mixture"]
    assert "SortMergeJoin" not in p, "quota join fell back to SMJ"
    assert "BroadcastExchange" in p
    # corpus-sized shuffles: the count agg + the rank window; plus at
    # most two groups-sized ones (quota agg, single-row total)
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 4


def test_snapshot_diff_shuffles_hashes_not_text(plans):
    """q66's full-outer join must shuffle (id, sha) pairs only — the
    fingerprint projection has to land BELOW the Exchange so document
    text never crosses the wire."""
    p = plans["q66_snapshot_diff"]
    for block in p.split("\n\n"):
        if block.startswith("(") and "Exchange" in block.splitlines()[0]:
            assert "text#" not in block, "snapshot diff shuffles raw text"


def test_gapfill_aggregates_before_densifying(plans):
    """q73: events shuffle ONCE at aggregate grain, the bounds agg adds
    one grain-sized Exchange, and the dense-spine join BROADCASTS —
    re-shuffling events against a rows-per-bucket spine would be the
    regression."""
    import re

    p = plans["q73_resample_gapfill"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 3
    assert "BroadcastHashJoin" in p
    assert "EvalPython" not in p


def test_chunking_is_shuffle_free(plans):
    """q76 is generate-and-explode inside the scan stage — ANY Exchange
    breaks its rows-stream-through contract."""
    import re

    p = plans["q76_sliding_window_chunks"]
    assert not re.search(r"\(\d+\) Exchange", p), "chunking plans a shuffle"
    assert "EvalPython" not in p


def test_zscore_single_exchange(plans):
    """q78's two window sums share one (user, ts, id) ordering —
    exactly ONE Exchange."""
    import re

    p = plans["q78_rolling_zscore_anomalies"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "EvalPython" not in p


def test_session_conversion_reuses_user_distribution(plans):
    """q80: the per-session groupBy must REUSE the session-window's
    hash-by-user distribution (grouping keys start with user_id) —
    one Exchange total, not two."""
    import re

    p = plans["q80_session_conversion"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "EvalPython" not in p


def test_fk_audit_broadcasts_parents(plans):
    """q82's three audits must broadcast their (dimension-sized)
    parent key sets — a SortMergeJoin would shuffle the fact side per
    relationship."""
    p = plans["q82_referential_integrity"]
    assert "BroadcastHashJoin" in p
    assert "EvalPython" not in p


def test_scd2_history_needs_no_join(plans):
    """q83 builds version intervals from the staged changes alone —
    pure window-over-key lineage, no join operator at all."""
    import re

    p = plans["q83_scd2_dimension_history"]
    assert not re.search(r"Join", p), "SCD2 history plans a join"
    assert "EvalPython" not in p


def test_scd2_asof_join_broadcasts_dimension(plans):
    """q84's as-of enrichment joins facts to the VERSIONED dimension —
    dimension history is dimension-sized, so it must broadcast; a
    SortMergeJoin would shuffle the fact side per enrichment."""
    p = plans["q84_scd2_asof_enrichment"]
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_market_basket_avoids_fact_self_join(plans):
    """q88 mines co-occurrence pairs by exploding per-order item sets —
    NO join operator may appear: a lineitem self-join on order key
    would shuffle the fact table twice at 100 TB."""
    import re

    p = plans["q88_market_basket"]
    assert not re.search(r"Join", p), "market basket plans a fact self-join"
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 3


def test_rfm_single_window_family(plans):
    """q92's R/F/M scores share one customer-grain aggregate and its
    NTILE windows — at most 3 Exchanges (agg + window + the single-row
    corpus-max-date broadcast), no sort-merge join."""
    import re

    p = plans["q92_customer_rfm"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 3
    assert "SortMergeJoin" not in p


def test_ship_latency_single_exchange_broadcast_dims(plans):
    """q96: one fact-grain Exchange; any dimension context broadcasts."""
    import re

    p = plans["q96_ship_latency"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1
    assert "SortMergeJoin" not in p


def test_market_share_broadcasts_nation_dims(plans):
    """q99: nation/region lookups broadcast; the revenue total joins in
    as the allowlisted single-row aggregate — no sort-merge join."""
    import re

    p = plans["q99_nation_market_share"]
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2


def test_bm25_shuffles_postings_only(plans):
    """q104: the corpus is scanned twice (postings + corpus stats) and
    NOTHING wider than query-term postings crosses the wire — 4
    Exchanges max (tf groupBy, df window, single-row stats, final
    per-doc sum), and no Exchange may carry the token array."""
    import re

    p = plans["q104_bm25_search"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 4
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) <= 2
    for block in p.split("\n\n"):
        if block.startswith("(") and "Exchange" in block.splitlines()[0]:
            assert " t#" not in block, "BM25 shuffles the token array"


def test_quantize_recall_single_exchange(plans):
    """q105: both rankings and the overlap count ride ONE hash(pid)
    Exchange — the scoring cross-product is a broadcast map, and the
    final groupBy reuses the window distribution."""
    import re

    p = plans["q105_quantize_recall"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "SortMergeJoin" not in p


def test_containment_broadcasts_benchmark_postings(plans):
    """q106: the benchmark gram postings broadcast (eval suites are
    small); only the train-grain pair counts shuffle."""
    p = plans["q106_ngram_containment_pairs"]
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_domain_mixture_windows_run_at_domain_grain(plans):
    """q107: one document-grain groupBy Exchange; the share windows run
    over the DOMAIN-grain aggregate (single-partition is fine there —
    domains number in the thousands, not billions)."""
    import re

    p = plans["q107_domain_mixture_weights"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 3
    assert "EvalPython" not in p


def test_kmeans_assign_is_broadcast_map(plans):
    """q108: the E-step is vectors x broadcast(centroids) — no
    shuffle may carry the vector column; the two Exchanges are the
    per-vector argmin window and the cluster-grain rollup."""
    import re

    p = plans["q108_kmeans_assign_stats"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2
    assert "SortMergeJoin" not in p


def test_time_travel_readback_is_two_single_row_aggs(plans):
    """q101's graded output is two snapshot aggregates — no joins, no
    Python, nothing wider than the 2 single-row agg Exchanges."""
    import re

    p = plans["q101_warehouse_time_travel"]
    assert not re.search(r"Join", p)
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2
    assert "EvalPython" not in p


def test_streaming_rollup_readback_is_rollup_grain_scan(plans):
    """q102's graded read is the stored rollup snapshot — the streaming
    work happened at build time; the readback itself must be a plain
    projection over the rollup parquet (no Exchange, no join)."""
    import re

    p = plans["q102_streaming_rollup_parity"]
    assert not re.search(r"\(\d+\) Exchange", p)
    assert not re.search(r"Join", p)


def test_image_decode_is_arrow_batched_map(plans):
    """q103: one MapInPandas over the id scan — no shuffle, no join;
    the decode seam is an Arrow-batched map, never per-row Python."""
    import re

    p = plans["q103_image_decode_stats"]
    assert "MapInPandas" in p
    assert not re.search(r"\(\d+\) Exchange", p)
    assert not re.search(r"Join", p)


def test_range_join_is_binned_not_theta(plans):
    """q109: the keyless interval-overlap join must plan a HASH join on
    the time bucket (intervals broadcast), NEVER the |facts| x
    |intervals| nested loop a raw theta join would produce."""
    import re

    p = plans["q109_interval_overlap_join"]
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # two Exchanges: the count-distinct expand + the per-window rollup
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2


def test_bloom_semijoin_probes_before_exact_join(plans):
    """q111: the bloom probe must FILTER the fact scan (a codegen'd
    bitmap test referencing the broadcast word array) before the exact
    semi join, and the whole shape stays JVM-side — the bitmap build's
    shuffles carry word indices (m/64 longs), never fact rows."""
    p = plans["q111_bloom_semijoin_revenue"]
    assert "xxhash64(cast(l_orderkey" in p, "bloom probe expression missing from fact side"
    assert "LeftSemi" in p, "exactness pass (left-semi join) missing"
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p


def test_salted_join_salts_both_sides(plans):
    """q112: the salted join must plan an equi-join whose key includes
    the salt (both sides carry _salt before the join), and the query
    stays at one real Exchange (the final segment rollup) — the
    replicated dimension broadcasts."""
    import re

    p = plans["q112_salted_skew_join"]
    assert "_salt" in p, "salt column missing from the join key"
    assert "BroadcastHashJoin" in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1
    assert "SortMergeJoin" not in p


def test_skyline_global_stage_sees_candidates_only(plans):
    """q113: the frontier is computed as distinct -> bucketed local
    scans -> ONE global scan over the candidate union; the fact join
    back for counts broadcasts the tiny frontier.  No quadratic
    anti-join may appear (the oracle's NOT EXISTS is semantics, not
    the plan)."""
    import re

    p = plans["q113_pareto_frontier_parts"]
    assert "BroadcastHashJoin" in p, "frontier join-back must broadcast"
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # distinct, bucketed window, global window, final rollup
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 4


def test_editdist_pairs_block_on_banded_length(plans):
    """q114: candidate pairs come from an EQUI-join on the banded
    length (hashable, broadcastable) — never an all-pairs product;
    levenshtein stays a JVM builtin (no Python stage)."""
    p = plans["q114_editdist_name_pairs"]
    assert "levenshtein" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p


def test_cdc_compaction_is_partial_aggregation(plans):
    """q115: last-write-wins must plan as max(struct) AGGREGATION
    (partial_max map-side combine), not a per-key window sort — one
    Exchange, no Window/Sort over the raw events."""
    import re

    p = plans["q115_cdc_latest_events"]
    assert "partial_max" in p or "partial_max".upper() in p.upper(), (
        "compaction lost its map-side combine"
    )
    assert "Window" not in p, "compaction degenerated into a window sort"
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_islands_collapse_to_day_grain_first(plans):
    """q116: the (user, day) distinct runs BEFORE the window, so the
    streak window sorts day-grain rows, not raw events; two Exchanges
    total (day-grain collapse + user re-key shared by window and both
    rollups)."""
    import re

    p = plans["q116_activity_islands"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2
    assert "Join" not in p


def test_deterministic_sample_single_window_shuffle(plans):
    """q117: one Exchange on the group key; the rank<=3 cut runs inside
    the window stage; the md5 order key is a codegen expression."""
    import re

    p = plans["q117_deterministic_doc_sample"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "EvalPython" not in p
    assert "md5" in p


def test_dpp_prunes_fact_partitions(plans):
    """q118: the partitioned fact scan must carry a runtime
    dynamicpruningexpression in its PartitionFilters — the dim filter
    lives on a non-key column, so ONLY dynamic pruning can keep the
    3 non-matching partitions unread."""
    p = plans["q118_dynamic_partition_pruning"]
    assert "dynamicpruning" in p.lower(), "dynamic partition pruning did not fire"
    assert "PartitionFilters" in p


def test_bucketed_join_is_exchange_free(plans):
    """q119: both scans read bucketed layouts and the SortMergeJoin
    runs co-located — the only Exchange in the plan is the final
    priority rollup, never a shuffle feeding the join."""
    import re

    p = plans["q119_bucketed_colocated_join"]
    assert "SortMergeJoin" in p
    assert p.count("Bucketed: true") == 2, "scans are not bucketed reads"
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1


def test_schema_evolution_read_stays_single_scan(plans):
    """q120: the mergeSchema union is a planning-time (footer) affair —
    the data path must stay one pruned scan + one rollup Exchange, with
    no join or Python stage stitching the waves together."""
    import re

    p = plans["q120_schema_evolution_read"]
    assert "Join" not in p
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_stateful_totals_readback_single_window(plans):
    """q121's graded readback is last-update-per-user over the sink
    parquet — one window Exchange; the stateful streaming work (two
    checkpointed applyInPandasWithState drains) happened at build
    time."""
    import re

    p = plans["q121_stateful_running_totals"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1
    assert "Join" not in p


def test_table_checksums_are_three_scan_branches(plans):
    """q122: three independent projection+single-row-agg branches, no
    joins, no Python — a migration fingerprint must never cost more
    than the scans themselves."""
    import re

    p = plans["q122_table_checksums"]
    assert "Join" not in p
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 3


def test_correlated_subquery_is_decorrelated(plans):
    """q123: Catalyst must rewrite the correlated scalar subquery into
    an aggregate + equi-join (one per-part agg Exchange + the final
    single-row agg) — a surviving per-row subquery node would re-scan
    lineitem per row."""
    import re

    p = plans["q123_small_quantity_revenue"]
    assert "Subquery" not in p, "correlated subquery was not decorrelated"
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 3


def test_column_profile_no_expand_pruned_scans(plans):
    """q124 exact profile: NO Expand anywhere (the former single-pass
    countDistinct formulation multiplied the scan by k+1 through one
    shuffle — the per-column two-phase distinct union measured 3.8x
    faster), one stats scan plus one column-pruned scan per profiled
    column, each distinct sub-scan reading exactly ONE column."""
    import re

    p = plans["q124_column_stats_profile"]
    assert "Expand" not in p, "exact profile regressed to the Expand rewrite"
    scans = re.findall(r"\(\d+\) Scan parquet[^\n]*", p)
    n_cols = 4  # _PROFILE_COLS
    assert len(scans) == n_cols + 1, f"expected {n_cols + 1} scans: {scans}"
    reads = [l for l in p.splitlines() if "ReadSchema" in l]
    single_col = sum(1 for l in reads if l.count(":") - 1 == 1)
    assert single_col >= n_cols, f"distinct sub-scans not column-pruned: {reads}"


def test_bpeish_tokenizer_is_pure_codegen_map(plans):
    """q125: tokenizer counting is a shuffle-free codegen projection."""
    import re

    p = plans["q125_bpeish_token_counts"]
    assert not re.search(r"\(\d+\) Exchange", p)
    assert "EvalPython" not in p
    assert "codegen id" in p


def test_bitmap_distinct_has_no_expand_two_exchanges(plans):
    """q128: exact distinct WITHOUT Spark's count-distinct machinery —
    the plan must contain NO Expand node (the signature of the Expand +
    double-shuffle rewrite the bitmap replaces), no Python nodes, and
    exactly the two word-grain/group-grain hash Exchanges."""
    import re

    p = plans["q128_bitmap_distinct_users"]
    assert "Expand" not in p, "bitmap distinct degenerated into count-distinct Expand"
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2, p


def test_price_histogram_single_exchange_codegen(plans):
    """q129: the histogram is a codegen bin projection + one partial-agg
    Exchange of #bins rows — a second Exchange or a Python node is a
    profiling pass that re-scans or re-shuffles the fact table."""
    import re

    p = plans["q129_price_histogram"]
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    # AQE wraps the un-executed plan (no codegen ids printed); the bin
    # projection staying a plain Project inside the scan stage is the check
    assert "FLOOR" in p and "HashAggregate" in p


def test_heavy_hitters_broadcasts_candidates(plans):
    """q130: the Misra-Gries candidate set must BROADCAST into the
    exact-verify join (never shuffle the token stream by token), and
    the only Python node is the bounded-memory MapInPandas summary."""
    p = plans["q130_heavy_hitter_words"]
    assert "MapInPandas" in p, "candidate pass lost its Misra-Gries summary"
    assert "BroadcastHashJoin" in p, "candidate set is not broadcast"
    assert "SortMergeJoin" not in p, "verify pass shuffles the token stream"


def test_robust_anomalies_broadcasts_group_stats(plans):
    """q131: both the median and MAD group-grain stats must come back as
    BroadcastHashJoins — the fact stream is never shuffled for a join,
    only reduced (hash-agg Exchanges at event_type/word grain)."""
    import re

    p = plans["q131_robust_value_anomalies"]
    assert len(re.findall(r"BroadcastHashJoin", p)) >= 2, "group stats not broadcast"
    assert "SortMergeJoin" not in p
    assert "EvalPython" not in p


def test_unpivot_expand_combines_before_shuffle(plans):
    """q132: unpivot plans Spark's Expand (4x row multiply) but the
    partial agg must collapse each partition to 4 rows BEFORE the
    single Exchange — so exactly one Exchange, no Python nodes."""
    import re

    p = plans["q132_unpivot_lineitem_measures"]
    assert "Expand" in p, "unpivot lost its Expand operator"
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_zorder_key_is_pure_codegen(plans):
    """q133: the Morton interleave is integer codegen arithmetic — no
    Python nodes, exactly one #buckets-row Exchange."""
    import re

    p = plans["q133_zorder_clustering_key"]
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_pagerank_iterations_have_no_cartesian(plans):
    """q134: every super-step is an equi-join + keyed aggregation —
    a CartesianProduct or Python node anywhere in the unrolled
    3-iteration plan is a scale regression."""
    p = plans["q134_supplier_pagerank"]
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "Join" in p


def test_order_count_distribution_two_agg_levels(plans):
    """q135 (TPC-H Q13 shape): left join + per-customer agg + count
    histogram — at most 3 Exchanges (join-side shuffles fold into
    broadcast at toy SF; the histogram agg is #distinct-counts rows),
    and never a Python node."""
    import re

    p = plans["q135_order_count_distribution"]
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 3, p


def test_equi_depth_buckets_broadcast_boundaries(plans):
    """q136: the quartile boundary row must broadcast back as a
    degenerate 1 x N map (BroadcastNestedLoopJoin by construction) —
    the fact table is never sorted or shuffled for the bucketing; only
    the single-row percentile agg and the 4-row final agg exchange."""
    import re

    p = plans["q136_equi_depth_buckets"]
    assert "BroadcastNestedLoopJoin" in p
    assert "Sort" not in p, "equi-depth bucketing sorted the fact table"
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2, p
    assert "EvalPython" not in p


def test_expectation_suite_single_scan(plans):
    """q137: the whole 5-rule expectation suite must evaluate in ONE
    pass — exactly one parquet scan and the single-row aggregate
    Exchange, never a job or scan per rule (the oracle's UNION ALL
    states the naive 5-scan semantics)."""
    import re

    p = plans["q137_data_quality_expectations"]
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1, p
    assert "EvalPython" not in p


def test_linear_fit_single_pass(plans):
    """q139: OLS via sufficient statistics must be ONE aggregation pass
    — one parquet scan, one #groups Exchange, closed form in the
    projection; a second scan or a Python node means the fit stopped
    being a single-pass reduction."""
    import re

    p = plans["q139_price_quantity_regression"]
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "EvalPython" not in p


def test_chi_square_marginals_avoid_second_scan(plans):
    """q140: the marginals must come from window sums over the tiny
    cell frame — exactly one parquet scan; the windows add exchanges
    over #cells rows only, and no joins appear at all."""
    import re

    p = plans["q140_chi_square_contingency"]
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "Join" not in p
    assert "EvalPython" not in p


def test_weighted_median_value_grain_window(plans):
    """q158 (r10 shape): weights aggregate to the (flag, price) grain
    BEFORE the cumulative window, so the fact shuffles partial
    aggregates and the 3-partition ordered scan walks distinct values,
    never table rows.  Lock: exactly one fact scan, no joins, and the
    first Exchange receives a partial HashAggregate, not raw rows."""
    import re

    p = plans["q158_weighted_median"]
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "Join" not in p
    # map-side partial aggregation of the weights before the shuffle
    assert "partial_sum" in p, p


def test_spearman_value_grain_ranks_join_back(plans):
    """q142 (r10 shape): average ranks compute on the distinct-VALUE
    grain (partial-aggregated counts + tiny per-flag windows) and join
    back by broadcast — the fact is never sorted or shuffled at row
    grain (the 3-value partition key made row-grain rank windows a
    3-straggler sort at any scale).  Lock: two broadcast joins, no
    Python, at most 3 fact scans (row grain + two count grains), and
    NO row-grain Window (every Window sits above a HashAggregate)."""
    import re

    p = plans["q142_spearman_rank_correlation"]
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) == 2, p
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) <= 3, p
    # every Sort+Window pair must be fed by an Exchange over an
    # aggregate (value grain), never directly by the row-grain scan
    assert "SortMergeJoin" not in p


def test_roster_string_agg_broadcasts_dim(plans):
    """q141: the region dim broadcasts; one group-grain Exchange."""
    import re

    p = plans["q141_region_nation_roster"]
    assert "BroadcastHashJoin" in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1, p


def test_sketch_profile_no_expand_bitmap_present(plans):
    """q145: the profiler's scale mode must contain NO Expand node (the
    exact multi-distinct signature q124 keeps for oracle parity) — the
    integral distincts come from bit_or bitmap words, so the plan shows
    the bitmap aggregation and only column-pruned scans with sub-linear
    (word-grain / single-row) Exchanges."""
    import re

    p = plans["q145_sketch_column_profile"]
    assert "Expand" not in p, "sketch profile degenerated into count-distinct Expand"
    assert "bit_or" in p, "bitmap distinct aggregation missing"
    assert "EvalPython" not in p
    # stats pass + bitmap pass: two column-pruned lineitem scans
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2, p
    # word-grain partial agg exchange + group-grain + the single-row
    # stats/broadcast side
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 4, p


def test_ewma_features_single_exchange(plans):
    """q167: all three window specs (asc lags, desc row_number, the
    per-user count) must ride ONE hash(user_id) Exchange — a second
    Exchange means a window spec broke the shared distribution; any
    Python node means the lag arithmetic fell out of codegen."""
    import re

    p = plans["q167_ewma_user_features"]
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "EvalPython" not in p


def test_score_calibration_windows_on_distribution_grain(plans):
    """q166: the global score-distribution side must BROADCAST back
    onto the per-source side (never a shuffled join), and the only
    SinglePartition exchange feeds the window over the score-grain
    aggregate — the raw document scan must never be globally sorted."""
    import re

    p = plans["q166_score_calibration"]
    assert "BroadcastHashJoin" in p, "global distribution side not broadcast"
    # formatted mode renders the partitioning on the Arguments: line
    assert len(re.findall(r"Arguments: SinglePartition", p)) == 1, p
    # both single-partition consumers sit above a HashAggregate of the
    # raw scan, so the global sort ingests |distinct scores| rows only
    assert "SortMergeJoin" not in p


def test_winnow_pairs_stay_in_codegen_postings_grain(plans):
    """q174: gram hashing + R+L selection are pure expressions (no
    Python nodes), and the pair join runs on the fingerprint hash —
    postings grain, never docs^2 (no NLJ; the sweep pins that)."""
    p = plans["q174_winnowing_pairs"]
    assert "EvalPython" not in p, "winnowing fell out of codegen into Python"
    assert "Window" in p, "R+L selection must run as a window, not a self-join"
    assert "CartesianProduct" not in p


def test_dsir_vocab_join_broadcasts(plans):
    """q175: the vocab score table must broadcast into the exploded
    token stream — a shuffle join there re-shuffles the whole corpus
    at token grain."""
    p = plans["q175_dsir_importance_select"]
    assert "BroadcastHashJoin" in p, "vocab scores must broadcast"


def test_centroid_matrix_aggregates_before_joining(plans):
    """q179: the matrix join runs on (group, dim)-grain SUMS (a
    broadcast join), never on row-grain vectors."""
    p = plans["q179_centroid_similarity"]
    assert "BroadcastHashJoin" in p, "dim-grain sums must broadcast"
    assert "CartesianProduct" not in p


def test_trailing_distinct_has_no_expand(plans):
    """q180: the whole point of the bitmap shape is avoiding
    count-distinct's Expand; none may appear, and bit_or must
    partial-aggregate (two-phase HashAggregate)."""
    import re

    p = plans["q180_trailing_distinct"]
    assert "Expand" not in p, "bitmap trailing distinct planned an Expand"
    assert len(re.findall(r"HashAggregate", p)) >= 4, "bit_or lost partial agg"


def test_json_extraction_stays_in_codegen(plans):
    """q182: get_json_object compiles to Catalyst's native JSON path
    evaluator — no Python evaluation node may appear."""
    p = plans["q182_json_properties"]
    assert "EvalPython" not in p, "JSON extraction fell into Python"


def test_q217_filter_stays_on_join_side_and_pushes(plans):
    """q217 (TPC-H Q13 shape): the order-priority predicate must reach
    the ORDERS parquet scan (filtering the join's right side before a
    LEFT OUTER join is the ON-clause placement) while the join stays
    OUTER — a WHERE placement would have turned it inner and dropped
    the zero-order customers."""
    p = plans["q217_filtered_order_counts"]
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in p, (
        "priority predicate not pushed to the orders scan"
    )
    assert "LeftOuter" in p, "left join collapsed to inner"
    assert "CartesianProduct" not in p


def test_q218_decorrelates_to_window_with_broadcast_dim(plans):
    """q218 (TPC-H Q17 shape): the correlated per-part average must
    plan as a PARTITION BY window over the part-filtered fact — no
    self-join re-aggregation — with the filtered part dim broadcast
    and the brand/type predicates pushed to the part scan."""
    p = plans["q218_small_order_revenue"]
    assert "Window" in p, "correlated average must decorrelate to a window"
    assert "BroadcastHashJoin" in p, "filtered part dim must broadcast"
    assert "EqualTo(p_brand,Brand#13)" in p, "brand predicate not pushed"
    assert "SortMergeJoin" not in p, (
        "Q17 decorrelation planned a self-join instead of a window"
    )


def test_q219_exists_pair_plans_semi_and_anti_joins(plans):
    """q219 (TPC-H Q21 shape): the EXISTS must plan as a LEFT SEMI
    join and the NOT EXISTS as a LEFT ANTI join on the orderkey
    family — never a cartesian/nested-loop, with the status predicate
    pushed to the orders scan."""
    p = plans["q219_sole_late_supplier"]
    assert "LeftSemi" in p, "EXISTS did not plan as a semi join"
    assert "LeftAnti" in p, "NOT EXISTS did not plan as an anti join"
    assert "EqualTo(o_orderstatus,F)" in p, "status predicate not pushed"
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p

def test_q234_min_supplier_decorrelates_to_window(plans):
    """q234 (TPC-H Q2 shape): the correlated per-part MIN must plan as
    a PARTITION BY window over the region-pruned fact — no self-join
    re-aggregation — with the region predicate pushed to its scan and
    every dim joined by broadcast (no sort-merge anywhere)."""
    p = plans["q234_cheapest_regional_supplier"]
    assert "Window" in p, "correlated MIN must decorrelate to a window"
    assert "EqualTo(r_name,ASIA)" in p, "region predicate not pushed"
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p, "Q2 decorrelation planned a self-join"


def test_q235_global_threshold_is_single_fact_pass(plans):
    """q235 (TPC-H Q11 shape): the global total must come from an
    unpartitioned window over the per-part rollup — one fact
    aggregation, ZERO joins (a second fact scan or a scalar-subquery
    join would double the 100 TB cost)."""
    p = plans["q235_important_part_values"]
    assert "Window" in p, "global total must be a window, not a join"
    assert "Join" not in p, "Q11 shape must not join — rollup + window only"
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, (
        "Q11 shape re-scanned the fact"
    )


def test_q236_max_revenue_is_window_over_rollup(plans):
    """q236 (TPC-H Q15 shape): rev = (SELECT MAX(rev)) must plan as an
    unpartitioned window max over the supplier rollup, with the
    quarter predicate pushed to the lineitem scan and the supplier
    dim broadcast."""
    p = plans["q236_top_quarter_supplier"]
    assert "Window" in p, "max-of-aggregate must decorrelate to a window"
    assert "GreaterThanOrEqual(l_shipdate" in p, "quarter start not pushed"
    assert "LessThan(l_shipdate" in p, "quarter end not pushed"
    assert "BroadcastHashJoin" in p, "supplier dim must broadcast"


def test_q237_not_in_plans_as_anti_join(plans):
    """q237 (TPC-H Q16 shape): the NOT IN blacklist must plan as a
    broadcast LEFT ANTI join with the size predicate pushed to the
    part scan."""
    p = plans["q237_supplier_diversity"]
    assert "LeftAnti" in p, "NOT IN did not plan as an anti join"
    assert "LessThanOrEqual(p_size,10)" in p, "size predicate not pushed"
    assert "CartesianProduct" not in p


def test_q239_dominant_share_is_window_over_rollup(plans):
    """q239 (TPC-H Q20 shape): the correlated per-part total must plan
    as a PARTITION BY window over the (part, supplier) rollup with the
    name prefix pushed to the part scan — never a per-row subquery or
    fact self-join."""
    p = plans["q239_dominant_part_suppliers"]
    assert "Window" in p, "correlated per-part total must be a window"
    assert "StringStartsWith(p_name,red)" in p, "name prefix not pushed"
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) <= 4, (
        "Q20 shape re-scanned a table"
    )
    assert "SortMergeJoin" not in p, "Q20 decorrelation planned a self-join"


def test_q242_date_band_pushes_and_single_agg(plans):
    """q242 (TPC-H Q12 shape): both shipdate band predicates must reach
    the lineitem scan, and the high/low CASE pair must ride ONE
    aggregation (a second pass per CASE arm doubles the fact cost)."""
    p = plans["q242_shipping_class_service"]
    assert "GreaterThanOrEqual(l_shipdate" in p, "band start not pushed"
    assert "LessThan(l_shipdate" in p, "band end not pushed"
    # one logical aggregate = exactly one partial/final HashAggregate pair
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) == 2, (
        "CASE pair split into two aggregations"
    )
    assert "CartesianProduct" not in p


def test_q243_star_dims_broadcast_single_fact_pass(plans):
    """q243 (TPC-H Q9 shape): part (name-filtered, pushed), supplier
    and nation must ALL broadcast onto a single lineitem pass — the
    classic star; any sort-merge join here shuffles the fact 3x at
    100 TB."""
    p = plans["q243_product_profit"]
    assert "StringContains(p_name,bolt)" in p, "name filter not pushed"
    assert p.count("BroadcastHashJoin") >= 3, "a star dim failed to broadcast"
    assert "SortMergeJoin" not in p, "star join fell back to sort-merge"
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 4


def test_q244_market_share_pushes_both_dim_filters(plans):
    """q244 (TPC-H Q8 shape): the region and part-type predicates must
    reach their scans, the dims must broadcast, and the whole
    seven-table star must plan without a cartesian."""
    p = plans["q244_nation_market_share"]
    assert "EqualTo(r_name,ASIA)" in p, "region predicate not pushed"
    assert "EqualTo(p_type,ECONOMY)" in p, "part-type predicate not pushed"
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q248_cuped_is_single_pass_no_joins(plans):
    """q248 CUPED: per-variant moments + pooled moments as window sums
    over the 2-row variant frame — ONE events scan, one user-grain
    shuffle, ZERO joins (a pooled re-aggregation or a theta cross-join
    would scan the facts twice at 100 TB)."""
    p = plans["q248_cuped_adjustment"]
    assert "Join" not in p, "CUPED must not join — variant rollup + window only"
    assert "Window" in p, "pooled moments must be window sums"
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, "events re-scanned"


def test_q249_acf_lags_are_range_windows_not_joins(plans):
    """q249 ACF: the seven calendar-aligned lags must come from RANGE
    windows over the day-grain frame — one orders scan, zero joins
    (the naive formulation self-joins the day frame and re-runs the
    fact aggregation)."""
    p = plans["q249_acf_daily_revenue"]
    assert "Join" not in p, "lags must be range windows, not a self-join"
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, "orders re-scanned"


def test_q251_sax_windows_run_at_day_grain(plans):
    """q251 SAX: no joins anywhere; the NTILE/islands windows run over
    the day-grain aggregate, never the facts."""
    p = plans["q251_sax_symbol_runs"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q252_rrf_is_one_fact_shuffle_two_catalog_ranks(plans):
    """q252 RRF: both metrics aggregate in ONE part-grain pass (a
    second fact scan per ranking signal would double the 100 TB
    cost); the two rank windows run at catalog grain."""
    p = plans["q252_rrf_part_fusion"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, "lineitem re-scanned"


def test_q253_gini_broadcasts_nation_dim(plans):
    """q253 Gini: the rank window partitions by nation (per-group
    sort, never global) and the 25-row nation dim broadcasts."""
    p = plans["q253_gini_acctbal_by_nation"]
    assert "BroadcastHashJoin" in p, "nation dim must broadcast"
    assert "SortMergeJoin" not in p
    assert "GreaterThanOrEqual(c_acctbal,0.0)" in p, "balance filter not pushed"


def test_q254_seasonal_residuals_join_free(plans):
    """q254 seasonal anomalies: lag-7 via RANGE window and moments via
    unpartitioned window sums — one events scan, zero joins."""
    p = plans["q254_weekly_seasonal_anomalies"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, "events re-scanned"


def test_q255_word2vec_fans_out_and_stays_jvm_side(plans):
    """q255 word2vec table: the interpreted split/explode must run
    AFTER a round-robin fan-out (the one-file-corpus lesson) and the
    whole pipeline stays out of Python evaluation."""
    p = plans["q255_subsample_keep_probs"]
    assert "RoundRobinPartitioning" in p, "corpus not fanned out before explode"
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p


def test_q256_burstiness_single_shuffle(plans):
    """q256 burstiness: the lag window and the per-user rollup share
    one user_id hash partitioning — ONE scan, one per-user sort, no
    joins (output is user-grain, fact shuffled once)."""
    p = plans["q256_interarrival_burstiness"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert len(re.findall(r"\(\d+\) Sort", p)) == 1, "expected only the lag-window sort"


def test_q257_elasticity_broadcasts_part_single_agg(plans):
    """q257 elasticity: part joins by broadcast onto one lineitem
    pass; all five regression moments ride ONE brand-grain
    aggregation (ln stays in codegen, no Python)."""
    p = plans["q257_price_elasticity"]
    assert "BroadcastHashJoin" in p, "part dim must broadcast"
    assert "SortMergeJoin" not in p
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2


def test_q258_token_burstiness_fans_out(plans):
    """q258 cf/df: round-robin fan-out before the interpreted
    split/explode; a single (tok, doc) distinct-count aggregation."""
    p = plans["q258_token_burstiness"]
    assert "RoundRobinPartitioning" in p, "corpus not fanned out before explode"
    assert "Join" not in p
    assert "EvalPython" not in p


def test_q259_weekday_profile_windows_over_7_rows(plans):
    """q259 weekday profile: one 7-row aggregation; totals come from
    windows over that frame — no join, no second scan."""
    p = plans["q259_weekday_profile"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q260_theil_is_sortless_single_agg(plans):
    """q260 Theil: unlike rank-based Gini (q253), the decomposition
    needs NO per-group sort — one nation-grain aggregation, windows
    over the 25-row frame, broadcast nation dim."""
    p = plans["q260_theil_decomposition"]
    assert "BroadcastHashJoin" in p, "nation dim must broadcast"
    assert "SortMergeJoin" not in p
    assert len(re.findall(r"\(\d+\) Sort", p)) == 0, "Theil must not sort the facts"
    assert "GreaterThan(c_acctbal,0.0)" in p, "positive-balance filter not pushed"


def test_q261_auc_runs_at_distinct_score_grain(plans):
    """q261 exact AUC: one fact shuffle to score grain, one cumulative
    window over the score frame, no joins (a per-row global rank sort
    would be the naive fact-grain plan)."""
    p = plans["q261_exact_auc"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q262_gains_table_has_no_fact_ntile(plans):
    """q262 lift/gains: deciles derive from ranks-below at DISTINCT-
    SCORE grain — no fact-grain NTILE sort, no joins."""
    p = plans["q262_lift_gains_table"]
    assert "Join" not in p
    assert "ntile" not in p.lower(), "gains table must not NTILE the facts"
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q263_hhi_is_algebraic_no_window(plans):
    """q263 HHI: sum-of-squares is algebraic — two rollups and
    broadcast dims, no per-nation window, no sort anywhere."""
    p = plans["q263_hhi_concentration"]
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Window" not in p, "HHI must not need a window"
    assert len(re.findall(r"\(\d+\) Sort", p)) == 0


def test_q264_window_funnel_is_join_free_single_sort(plans):
    """q264 windowFunnel: both stacked window passes share one
    user-grain sort; the second hop reads purchase-after-click off
    the frame (pac monotonicity) instead of a self-join."""
    p = plans["q264_window_funnel"]
    assert "Join" not in p, "funnel must not self-join for the second hop"
    assert len(re.findall(r"\(\d+\) Sort", p)) == 1, "both passes must share one sort"
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q265_mann_kendall_pairs_are_day_grain(plans):
    """q265 Mann-Kendall: the O(n^2) sign pairs run over the
    CALENDAR-bounded day frame with the right side broadcast — the
    fact table collapses to day grain before any pairing."""
    p = plans["q265_mann_kendall_trend"]
    assert "SortMergeJoin" not in p, "day-frame pairing fell back to sort-merge"
    assert "BroadcastNestedLoopJoin" in p, (
        "the day<day pairing is a broadcast range NLJ by design"
    )
    assert "HashAggregate" in p


def test_q266_decompose_range_window_and_tiny_join(plans):
    """q266 decomposition: the trend is a calendar RANGE window over
    the day frame; the only join is the broadcast 7-row seasonal
    rollup."""
    p = plans["q266_seasonal_decompose"]
    assert "Window" in p
    assert "BroadcastHashJoin" in p, "seasonal rollup must broadcast"
    assert "SortMergeJoin" not in p


def test_q267_ks_runs_at_distinct_value_grain(plans):
    """q267 KS: one fact shuffle to value counts, cumulative windows
    over the value frame, no joins; the integer gap argmax needs no
    epsilon."""
    p = plans["q267_ks_two_sample"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q268_cusum_is_join_free_day_grain(plans):
    """q268 CUSUM: one fact rollup to day grain, cumulative windows
    over the calendar frame, one ranked row — no joins anywhere."""
    p = plans["q268_cusum_changepoint"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q269_kneser_ney_joins_at_gram_grain(plans):
    """q269 Kneser-Ney: the test stream joins the three train count
    tables at bigram/w1/w2 grain with NO accidental cartesian beyond
    the allowlisted totals row; gram building fans out first."""
    p = plans["q269_kneser_ney_bigram"]
    assert "RoundRobinPartitioning" in p, "corpus not fanned out before grams"
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p


def test_q270_heaps_fit_has_no_windowed_distinct(plans):
    """q270 Heaps fit: cumulative TYPES come from the first-seen
    reduction — the plan must contain no distinct aggregation inside
    a window (the O(docs x vocab) densification trap)."""
    p = plans["q270_heaps_law_fit"]
    assert "RoundRobinPartitioning" in p, "corpus not fanned out before explode"
    assert "Window" in p
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p


def test_q271_alignment_distances_stay_jvm_side(plans):
    """q271 alignment/uniformity: the 64-dim squared distances fold
    via zip_with/aggregate expressions — no Python evaluation, no
    GEMM seam; the label-equi pair join hashes on label."""
    p = plans["q271_alignment_uniformity"]
    assert "EvalPython" not in p
    assert "zip_with" in p or "aggregate" in p.lower()


def test_q272_collocations_join_at_token_grain(plans):
    """q272 collocations: unigram tables join the surviving bigrams at
    token grain; the frequency floor filters BEFORE the joins so only
    survivors shuffle."""
    p = plans["q272_collocations_pmi"]
    assert "RoundRobinPartitioning" in p, "corpus not fanned out before grams"
    assert "EvalPython" not in p
    assert re.search(r"\(c2#\d+L? >= 5\)", p), (
        "the c2 >= 5 frequency floor must filter the bigram rollup "
        "(before the unigram joins shuffle the full vocabulary)"
    )


def test_q273_cohort_ltv_one_fact_key_family(plans):
    """q273 cohort LTV: cohort assignment, rollup, and window all ride
    the custkey/cohort key family — no global sort, no cartesian."""
    p = plans["q273_cohort_ltv"]
    assert "Window" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q274_wasserstein_runs_at_distinct_value_grain(plans):
    """q274 W1: one fact shuffle to value counts, cumulative + lead
    windows over the value frame, single-row rollup — no joins, exact
    integer integrand."""
    p = plans["q274_wasserstein_1d"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q275_dispersion_is_two_rollups(plans):
    """q275 dispersion: (type, day) rollup then type rollup — no
    joins, no windows, map-side combinable end to end."""
    p = plans["q275_dispersion_index"]
    assert "Join" not in p
    assert "Window" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q276_hill_single_rank_window(plans):
    """q276 Hill: one rank window (the documented catalog-scale
    shape), one single-row rollup, zero joins."""
    p = plans["q276_hill_tail_index"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q277_jaccard_shuffles_on_part_key_only(plans):
    """q277 assortment Jaccard: the postings self-join hashes on the
    part key; sizes and nation names broadcast — no sort-merge join,
    no cartesian."""
    p = plans["q277_nation_assortment_jaccard"]
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q278_assortativity_no_pairwise_expansion(plans):
    """q278 assortativity: degrees join back on their OWN key families
    — no pairwise edge expansion, no cartesian, no window."""
    p = plans["q278_bipartite_assortativity"]
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p


def test_q279_srm_is_one_distinct_rollup(plans):
    """q279 SRM: one distinct-user rollup, one row — no joins."""
    p = plans["q279_srm_check"]
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q280_capture_recapture_no_window_self_join(plans):
    """q280 capture-recapture: both windows' flags come from ONE
    user-grain rollup with max-flags — never a self-join of the two
    observation windows."""
    p = plans["q280_capture_recapture"]
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q281_anova_two_rollups_no_window(plans):
    """q281 ANOVA: one segment rollup + one 5-row rollup — no joins,
    no windows."""
    p = plans["q281_anova_oneway"]
    assert "Join" not in p
    assert "Window" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q282_runs_test_stacked_lags_one_sort(plans):
    """q282 runs test: both lag windows share the day ordering — one
    calendar sort, no joins."""
    p = plans["q282_runs_test"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q283_kendall_pairs_are_day_grain(plans):
    """q283 Kendall tau: the quadratic pairing runs over the
    calendar-bounded day frame with the right side broadcast."""
    p = plans["q283_kendall_tau_daily"]
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" in p, "day pairing must be a broadcast NLJ"
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2


def test_q284_qte_decile_lookup_hashes_on_variant(plans):
    """q284 QTE: the decile-target lookup is a broadcast HASH join on
    variant with the rank-range residual — never a nested loop; the
    quantile machinery runs at distinct-value grain."""
    p = plans["q284_quantile_treatment_effects"]
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p
    assert "Window" in p


def test_q285_dedup_cascade_single_scan(plans):
    """q285 dedup cascade: three key-count windows over ONE scan —
    no joins, no re-reads per stage."""
    p = plans["q285_dedup_cascade_accounting"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q286_dead_stock_single_agg_after_distinct(plans):
    """q286 dead stock: the fact collapses to distinct partkeys before
    the catalog join; kept/total ride ONE aggregation."""
    p = plans["q286_dead_stock_report"]
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2
    # the distinct-partkey reduction must exist (keys = [l_partkey]
    # alone): joining the raw fact and deduplicating after would drop
    # this aggregate and ship every order line through the join
    assert re.search(r"Keys \[1\]: \[l_partkey#\d+", p), (
        "lineitem must collapse to distinct partkeys before the join"
    )
    read = [l for l in p.splitlines() if "ReadSchema" in l and "l_partkey" in l]
    assert read and all("struct<l_partkey:bigint>" in l for l in read), (
        "the fact scan must read ONLY the part key"
    )


def test_q287_dormancy_shares_custkey_family(plans):
    """q287 dormancy: the lag window and the rollup share the custkey
    partitioning; only the single-row horizon crosses."""
    p = plans["q287_dormancy_gaps"]
    assert "Window" in p
    assert "SortMergeJoin" not in p
    assert len(re.findall(r"\(\d+\) Sort", p)) == 1, "expected only the lag sort"


def test_q288_abc_boundaries_stay_integer(plans):
    """q288 ABC: one part rollup, cumulative windows, and integer
    boundary arithmetic — no joins, no Python."""
    p = plans["q288_abc_classification"]
    assert "Join" not in p
    assert "Window" in p
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q289_gopher_rules_stay_jvm_side(plans):
    """q289 Gopher battery: the token-array rules evaluate as native
    higher-order functions — no Python stage, one doc scan, one
    source-grain aggregation."""
    p = plans["q289_gopher_quality_filters"]
    assert "EvalPython" not in p, "rule battery fell out of the JVM into Python"
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q290_novelty_is_postings_join(plans):
    """q290 novelty: the train-membership check is a hash join on gram
    (postings grain) — never a nested loop or corpus self-join."""
    p = plans["q290_ngram_novelty"]
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_q291_jaccard_pairs_top_k_sets(plans):
    """q291 bigram Jaccard: the pair join is an equi-join on gram over
    the top-K sets, and the per-source sizes broadcast in."""
    p = plans["q291_source_bigram_jaccard"]
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p, "size lookups must broadcast"


def test_q292_bh_windows_over_cell_frame(plans):
    """q292 BH selection: one customer scan, cell-grain rollup, window
    passes — no joins at all."""
    p = plans["q292_fdr_bh_selection"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q293_theil_sen_pairs_are_day_grain(plans):
    """q293 Theil-Sen: the slope pairing is a broadcast range NLJ over
    the calendar-bounded (<=366 row) day frame — q283's shape."""
    p = plans["q293_theil_sen_slope"]
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" in p, "day pairing must be a broadcast NLJ"


def test_q294_prefix_dedup_single_agg(plans):
    """q294 prefix dedup: key extraction is per-row projection work and
    the grouping is ONE hash aggregation — no joins, no Python."""
    p = plans["q294_prefix_dup_groups"]
    assert "Join" not in p
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q295_matryoshka_folds_stay_jvm_side(plans):
    """q295 Matryoshka: the per-vector dot products fold as native
    HOFs after the fan-out repartition — no Python stage, no joins."""
    p = plans["q295_matryoshka_truncation"]
    assert "EvalPython" not in p
    assert "Join" not in p
    assert "RoundRobinPartitioning" in p, (
        "interpreted HOFs must fan out off the single-file partition"
    )


def test_q296_k_anonymity_single_fact_join(plans):
    """q296 k-anonymity: one equi key join to orders for the sensitive
    attribute; the class rollup carries both COUNT DISTINCTs."""
    p = plans["q296_k_anonymity_profile"]
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2


def test_q297_decay_weights_are_integer_shifts(plans):
    """q297 decayed popularity: the horizon crosses as a single-row
    broadcast; the rollup is partkey-grain; the part-name lookup joins
    the 20-row top frame, never the fact."""
    p = plans["q297_decayed_part_popularity"]
    assert "BroadcastHashJoin" in p, "part-name lookup must broadcast the top-20"
    assert "TakeOrderedAndProject" in p, "top-20 must be TakeOrdered, not full sort"


def test_q298_deciles_run_at_distinct_value_grain(plans):
    """q298 latency deciles: Window over the distinct-latency frame,
    and the decile lookup joins a 9-row broadcast target frame."""
    p = plans["q298_conversion_latency_deciles"]
    assert "Window" in p
    assert "SortMergeJoin" not in p


def test_q299_subject_predicate_pushes_down(plans):
    """q299 SAR export: the subject modulo predicate must reach both
    fact scans as a pushed filter, and assembly joins stay equi."""
    p = plans["q299_subject_access_export"]
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert p.count("% 97") >= 2, "subject predicate not visible near the scans"


def test_q300_waterfill_is_join_free(plans):
    """q300 waterfilling: the closed-form solve is window passes over
    the source frame — no joins, no Python, one scan."""
    p = plans["q300_token_budget_waterfill"]
    assert "Join" not in p
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q301_quantile_norm_joins_on_integer_rank(plans):
    """q301 quantile normalization: the pooled lookup is an EQUI join
    on the integer rank k — never a range probe."""
    p = plans["q301_quantile_normalization"]
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" in p


def test_q302_entropy_alphabet_grain(plans):
    """q302 char entropy: char-grain explode fans out, counts collapse
    to (source, char) grain, no joins, no Python."""
    p = plans["q302_char_entropy_proxy"]
    assert "Join" not in p
    assert "EvalPython" not in p
    assert "RoundRobinPartitioning" in p, "char explode must fan out"


def test_q303_power_single_rollup(plans):
    """q303 power analysis: one fact scan, one 5-row rollup, formula
    on the rollup frame — no joins, no windows."""
    p = plans["q303_power_analysis"]
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q304_gini_runs_at_distinct_value_grain(plans):
    """q304 split finder: value-grain rollup then windows over the
    50-row frame — no joins, one scan."""
    p = plans["q304_gini_split_finder"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q305_brand_lookup_broadcasts(plans):
    """q305 cross-shopping: part lookup broadcasts; no cartesian."""
    p = plans["q305_cross_shopping_breadth"]
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q306_lognormal_single_rollup(plans):
    """q306 log-normal fit: micro-ln projection + one source rollup —
    no joins, no Python, one scan."""
    p = plans["q306_lognormal_length_fit"]
    assert "Join" not in p
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q307_simpsons_is_pure_integer_rollup(plans):
    """q307 Simpson detector: two broadcast dim lookups, then
    (brand, nation) and brand rollups — integer arithmetic end to end,
    no windows, no Python."""
    p = plans["q307_simpsons_paradox"]
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) == 2
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "Window" not in p


def test_q308_delta_pairs_on_z_frame(plans):
    """q308 Burrows delta (r10 shape): the corpus is tokenized ONCE
    into the pinned source-token counts (the before-plan re-ran the
    explode 12x across totals/topw/freqs and the self-join), and the
    |sources| x 50 z frame is pinned for its two self-join reads — so
    the final plan is the pair equi-join over checkpoint reads, with
    no parquet rescans and no cartesian."""
    p = plans["q308_burrows_delta"]
    assert "Scan ExistingRDD" in p, "pair join must read the pinned z frame"
    assert "Scan parquet" not in p, "no corpus rescan above the pins"
    assert "CartesianProduct" not in p


def test_q309_sweep_mines_once(plans):
    """q309 threshold sweep: exactly one pass of the pair miner —
    thresholds join as a scaffold, never re-mine."""
    p = plans["q309_dedup_threshold_sweep"]
    # one miner pass = a bounded number of documents scans: the miner
    # reads docs for tokens + sizes, and the pairs/docs_hit union
    # duplicates that lineage once (2x3 = 6); three separate mining
    # passes per threshold would land ~18
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) <= 8
    assert "CartesianProduct" not in p


def test_q310_holm_windows_over_cell_frame(plans):
    """q310 Holm step-down: one customer scan, cell rollup, window
    passes — no joins, mirroring q292's shape."""
    p = plans["q310_holm_bonferroni"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q312_ladder_is_one_fanout_not_three_scans(plans):
    """q312 generalization ladder: the width scaffold fans the single
    customer scan out (grouping-sets shape) — one customer scan, not
    one per rung."""
    p = plans["q312_generalization_ladder"]
    # the 3-row width scaffold is a LocalTableScan, so parquet scans = 1
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q351_advisor_broadcasts_census_and_takes_ordered(plans):
    """q351 skew advisor: one orders scan to key grain, the two-number
    census crosses back as a broadcast single-row aggregate, and the
    top-20 is a TakeOrdered — never a full sort of the key frame."""
    p = plans["q351_join_skew_advisor"]
    # the key-grain census is checkpointed, so the final plan reads the
    # materialized frame (both consumers) and the fact scan ran once at
    # checkpoint build — zero parquet scans HERE is the proof
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 0
    assert "ExistingRDD" in p
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p


def test_q352_lcc_triangles_join_edges_not_facts(plans):
    """q352 LCC: pairs come from the in-row basket expansion (no
    basket self-join), so lineitem scans exactly once into the edge
    build; the triangle joins run over the checkpointed edge frame."""
    p = plans["q352_local_clustering_coefficient"]
    # the edge frame is checkpointed: the fact scan ran once at
    # checkpoint build; the degree rollup and all three triangle legs
    # read the materialized frame — zero parquet scans in this plan
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 0
    assert "ExistingRDD" in p, (
        "edge frame must be the materialized checkpoint, not a re-derivation"
    )


def test_q353_nelson_aalen_windows_over_day_frame(plans):
    """q353 Nelson-Aalen: user-grain reductions, then windows over the
    day-lag frame — the cumulative hazard must never window the fact."""
    p = plans["q353_nelson_aalen_hazard"]
    assert "Window" in p
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p


def test_q356_rules_expand_pairs_in_row(plans):
    """q356 interest measures: pair expansion is the in-row transform
    over the checkpointed basket table — no basket self-join, one
    lineitem scan."""
    p = plans["q356_rule_interest_measures"]
    # the basket table is checkpointed: the fact scan ran once at
    # checkpoint build; count/degrees/pairs all read the materialized
    # frame — zero parquet scans in this plan
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 0
    assert "ExistingRDD" in p
    assert "SortMergeJoin" not in p


def test_q358_sprt_single_fact_rollup(plans):
    """q358 SPRT: one events scan to (cohort, day) grain; the LLR
    cumsum and decision aggregate run over that tiny frame."""
    p = plans["q358_sprt_conversion"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q359_krippendorff_is_one_scan_no_joins(plans):
    """q359 alpha: the q137 conditional-aggregate shape — one document
    scan, zero joins, pure codegen."""
    p = plans["q359_krippendorff_alpha"]
    assert "Join" not in p
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q360_bootstrap_fans_out_against_broadcast_spine(plans):
    """q360 Poisson bootstrap: the purchase leg fans out against the
    broadcast 32-row spine; the md5 uniform must be evaluated in its
    own projection (not inlined twice into the aggregate)."""
    p = plans["q360_poisson_bootstrap_ci"]
    assert "BroadcastNestedLoopJoin" in p, "draw spine must broadcast"
    assert "EvalPython" not in p
    assert p.count("md5") <= 2, (
        "md5 draw-uniform must not be duplicated per aggregate leg"
    )


def test_q363_compaction_is_one_scan_one_window(plans):
    """q363 compaction planner: one documents scan, one per-source
    running-sum window, group rollup — no joins."""
    p = plans["q363_compaction_planner"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q364_kendall_w_ranks_partition_by_brand(plans):
    """q364 Kendall W: the three rank windows partition by brand (the
    analysis grain) — never a global total-order sort of the dim."""
    p = plans["q364_kendall_w_concordance"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q365_effect_sizes_single_conditional_pass(plans):
    """q365 effect sizes: the q137 shape — one fact scan, one
    conditional aggregate, zero joins."""
    p = plans["q365_effect_sizes"]
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q366_page_hinkley_windows_day_frame(plans):
    """q366 Page-Hinkley: one fact rollup to day grain, cumulative
    windows over the calendar frame, no joins."""
    p = plans["q366_page_hinkley_drift"]
    assert "Join" not in p
    assert "Window" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_q367_quantile_merge_reads_pinned_census(plans):
    """q367 mergeable quantiles (r10 pin): the ranks/est/ex census
    collapses to ONE pinned row (localCheckpoint), so the final plan is
    three union branches projecting from the SAME materialized frame —
    zero parquet scans here (the sketch's two-level aggregate and the
    rank-target broadcast ran once, at checkpoint build), no joins, no
    Python."""
    p = plans["q367_histogram_quantile_merge"]
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 0, (
        "union branches must read the pinned census, not re-run the sketch"
    )
    assert "ExistingRDD" in p
    assert "Join" not in p
    assert "EvalPython" not in p


def test_q368_hll_registers_join_by_idx(plans):
    """q368 HLL union: the register scaffold attaches by an idx
    EQUI-join (broadcast hash), and register math stays integer —
    no Python, no sort-merge join anywhere."""
    p = plans["q368_hll_register_union"]
    assert "BroadcastHashJoin" in p, "scaffold join must broadcast on idx"
    assert "SortMergeJoin" not in p
    assert "EvalPython" not in p


def test_q369_regression_advisor_day_grain_windows(plans):
    """q369 runtime advisor: events reduce to day grain FIRST (one
    fact aggregate), then every window partitions by event_type —
    never a global total-order sort of the fact."""
    p = plans["q369_runtime_regression_advisor"]
    assert "EvalPython" not in p
    assert "Window" in p
    assert "CartesianProduct" not in p
