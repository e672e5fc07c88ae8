"""Declared query registry.

Aggregates every query module's ``QUERIES`` (name → callable(spark, sf_dir)
→ DataFrame) and ``ORACLE`` (name → DuckDB SQL) into flat dicts consumed by
``__spark_entry__.py``. Queries without an oracle entry get the driver's
weaker rows-only check (non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import behavior, cep, gelly, iot, llm, ml, pipeline, procedural, relational, temporal_q, tpch, utils_q, windows

_MODULES = (relational, tpch, iot, ml, windows, llm, pipeline, procedural, cep, gelly, utils_q, temporal_q, behavior)

#: The verification driver oracle-checks only the FIRST 50 registry
#: entries, so registration order is itself a correctness-coverage
#: decision (round-1 lesson: module order left q20-q22 and the whole LLM
#: suite unchecked). The window below holds exactly 50 names.
#:
#: ROTATION POLICY (applied each round):
#: 1. Anything that CHANGED this round — new queries, queries whose plan
#:    or predicate was edited, queries fixed after a red/weak verdict —
#:    goes INTO the window.
#: 2. Never-driver-checked queries rotate in ahead of long-green ones.
#: 3. Rotated OUT: entries driver-green in ≥2 consecutive rounds whose
#:    operator surface stays covered by other window entries and by the
#:    full 80-oracle pytest sweep at sf0.01 (test_queries_oracle.py runs
#:    every oracle regardless of the window).
#:
#: Round-4 rotation: IN — the 5 de-vacuized queries (q51's LIKE, q44's
#: anti-join cutoff, q48's revenue threshold, ngram-jaccard and
#: embedding-cosine thresholds: predicates changed, so their topologies
#: are exercised with data for the first time), the 4 new directed
#: Gelly analytics (global/average CC, 16-class triadic census, edge
#: metrics), the 3 new CEP quantifiers (oneOrMore / optional /
#: times(from,to)), adamic_adar_similarity (weight projection moved to
#: try_divide — plan changed), the full round-3 overflow backlog of 16
#: never-driver-checked queries (community detection, the undirected
#: clustering/census/metrics family, the round-3 directed trio,
#: summarization, zip/sample contracts, temporal as-of join,
#: decontamination), and 5 more never-driver-checked entries
#: (similarity_ivf, multimodal_feature_extract, q53/q55 TPC-H shapes,
#: q32 correlated subquery). OUT — everything driver-green in BOTH
#: rounds 2 and 3: q03, q19-q22 window family, the 13 LLM-suite
#: entries, the 4 kernels, CC/PageRank/logreg pipelines, and the
#: held-over q36/q29/q23/q30 (all remain under the identical DuckDB
#: differential at sf0.01 in pytest, which runs every oracle regardless
#: of the window).
#:
#: KEPT (single-round-green, per policy rule 3): kmeans/sssp, the 6
#: round-3 TPC-H extras, the 4 round-3 CEP patterns, and the 5 round-3
#: Gelly queries.
#:
#: Round-6 rotation (executes the two-rounds-overdue policy — the r5
#: window was byte-identical to r4's, so CORRECTNESS_r05 re-checked the
#: same 50 names):
#: IN — every never-driver-checked query (21: the AfterMatchSkip /
#: followedByAny / groupPattern / notNext / oneOrMore-until /
#: allowCombinations CEP family, the five round-4 text operators,
#: embedding_outlier_score, dedup_cluster_representatives, both corpus
#: datasheets, bipartite_projection_suppliers, asm_vertex_degrees,
#: generator_hypercube_degrees, q54_tpch_q20 — q49_approx_aggregates is
#: the deliberate exception, see below), plus everything CHANGED per
#: rule 1: text_quality_score + corpus_datasheet_v2 (alpha_ratio moved
#: to ANSI-safe try_divide), corpus_datasheet_v3 (new), and the whole
#: undirected Gelly clustering family re-routed through the shared
#: persisted UndirectedGraphBase (triangle_enum, local/global/average
#: CC, triadic_census_q, vertex/edge metrics — plans changed, answers
#: must be re-verified by the driver exactly as the directed family was
#: in round 5).
#: OUT — entries driver-green in BOTH rounds 4 and 5 whose surface
#: stays covered by the full-oracle pytest sweep: most of the r3 CEP
#: set, the directed Gelly family (8), community_detection/
#: summarization, zip/sample contracts, temporal_join_events,
#: text_decontaminate, similarity_ivf, multimodal_feature_extract, and
#: the 2×-green TPC-H extras beyond the kept core. jaccard/adamic stay
#: IN: their plans changed with the UndirectedGraphBase re-route.
#: Round-7 rotation (STALENESS-DRIVEN — the round-6 ledger guard in
#: tests/test_driver_ledger.py makes this mandatory: a window slot held
#: by a ≤2-round-old green entry while a ≥4-round-stale query waits is
#: now a red test). Every never-checked query got its row in round 6,
#: so the debt is now AGE: 64 queries' last driver row is from rounds
#: 1-3. IN — 16 new operators (release mechanics, passage dedup,
#: overlap matrix, quantization, BPE pair, mixture/shards, covariance)
#: and the 4 whose plans changed (the three global-window restructures
#: + the k_core cache-leak fix), then the 30 stalest by last-green
#: round: the 10 remaining r1-cohort, the 13 r2-cohort picks, and 8 of
#: the r3-cohort chosen for operator diversity (iteration pipelines,
#: dedup family, windows, interval join). OUT — the round-6 window's
#: 2×-green incumbents (CEP completion family, datasheets, undirected
#: Gelly family, TPC-H heavies) — every one stays under the
#: full-oracle pytest sweep at both SFs.
#:
#: Round-8 rotation. IN — quality_retention_curve FIRST (the one
#: registered query with zero driver rows — VERDICT r7 Next 1; its
#: threshold domain also changed to the full 0..20 grid), the 3 whose
#: plans changed this round (bpe_merge_table + bpe_encode_fertility:
#: the merge loop now batches top-M non-conflicting merges per round;
#: dedup_incremental: intra-batch min-doc_id representative), the 14
#: new round-8 operators (batch 1: sequence packing, SemDeDup, KN
#: bigram LM, char entropy, snapshot delta, hard negatives; batch 2,
#: queries/pipeline.py: PII pattern audit, CCNet perplexity buckets,
#: Zipf panel, column profile, DQ constraint suite, length buckets;
#: batch 3: containment dedup, JS token drift, principal direction;
#: batch 4: Gopher rule panel, n-gram novelty, Bradley-Terry, ABTT
#: residuals, dedup recall panel; batch 5: BM25 retrieval top-k,
#: curriculum length phases, HLL union matrix; batch 6: lang-ID
#: confusion matrix; batch 7: hypertable gapfill+LOCF, funnel
#: conversion; batch 8: WordPiece greedy fertility, unigram-LM
#: Viterbi fertility; batch 9: k-anonymity audit, retrieval eval
#: panel; batch 10, queries/behavior.py: cohort retention, Markov
#: transitions, Kaplan-Meier survival, A/B z-test, session paths,
#: RFM segments), then the remaining stale backlog: all 4 r1-cohort,
#: all 5 r2-cohort, 1 of 23 r3-cohort (batch 10's six displaced six
#: more r3 slots under rule 1 — dedup_lsh_verified [recall panel
#: cross-checks its row count and containment/incremental hold the
#: dedup slots], matmul_rows_kernel [dft_events keeps kernels],
#: q21_sliding_window [q18/q21-session green r7 keep windows],
#: similarity_lsh_bucketed [hard_negatives holds ANN],
#: text_rolling_hash + text_udtf_ngrams [the confusion-matrix and
#: novelty entries keep the text-expression surface; udtf stays
#: pinned in pytest] — all six head the r9 staleness queue).
#: OUT — the entire r7 window's 50 green entries except
#: the keep-fresh trio, all eight r5-cohort diversity picks, and
#: SIXTEEN r3 entries displaced by rule 1 with their family still
#: holding a slot (pi_estimation_weyl + vector_add_kernel — dft/matmul keep the
#: kernels family; q21_tumbling_window + q21_session_window_dynamic —
#: q21_sliding_window keeps the window family; text_fingerprint +
#: text_token_count + text_lang_id — rolling_hash/udtf_ngrams keep
#: the text r2 family; similarity_topk — similarity_lsh_bucketed
#: keeps the ANN family and is the scale path; dedup_simhash —
#: lsh_verified + the new containment/recall entries keep dedup;
#: q29_reduce_group — the grouped-reduce surface stays under
#: q02/q26/q38 and the confusion matrix re-exercises the displaced
#: text_lang_id's prediction expression verbatim; q19_iot_outliers +
#: q23_tpch_q10 — q20 keeps the iot family, q30/q36 + the r1 quartet
#: keep TPC-H, and the new events ops add fresh events-table
#: coverage; multimodal_binary_meta — its magic-byte surface is
#: re-swept by the full pytest run and multimodal_feature_extract's
#: kernels stay pinned in tests/test_multimodal.py; q36_json_extract —
#: q52's from_json struct keeps the JSON surface; q20_kmeans_assign +
#: q30_tpch_q5 — kmeans_pipeline's assignment step and the q23/q45
#: join shapes in the bench set, plus the r1 TPC-H quartet, keep both
#: families swept).
#: Rule 1's "new queries must be driver-verified" outranks both
#: diversity and the oldest tail; the displaced entries head the r9
#: staleness queue; the ≥4-round guard holds because no
#: ≤2-round-green incumbent outside WINDOW_KEEP_FRESH holds a slot —
#: all stay under the full-oracle pytest sweep at both SFs every run.
WINDOW_KEEP_FRESH: dict[str, str] = {
    # rule-1 holds: green in r7 but their PLANS changed this round, so
    # the driver must re-verify the new shapes (the staleness guard
    # exempts these from the fresh-incumbent check)
    "bpe_merge_table": "merge loop batches top-M non-conflicting merges/round",
    "bpe_encode_fertility": "encodes with the batched trainer's type table",
    "dedup_incremental": "added per-fingerprint min-doc_id representative",
}

PRIORITY_WINDOW: tuple[str, ...] = (
    # never-driver-checked (VERDICT r7 Next 1) + domain fix (1)
    "quality_retention_curve",
    # changed this round (rule 1; see WINDOW_KEEP_FRESH) (3)
    "bpe_merge_table",
    "bpe_encode_fertility",
    "dedup_incremental",
    # new this round (rule 1) (36 — batches 1-10 as itemized in the
    # rotation note above; ends at rfm_segment_panel)
    "release_sequence_packing",
    "dedup_semantic",
    "lm_kn_bigram",
    "text_char_entropy",
    "corpus_snapshot_delta",
    "similarity_hard_negatives",
    "pii_pattern_audit",
    "lm_perplexity_bucket",
    "zipf_token_panel",
    "dq_table_profile",
    "dq_referential_checks",
    "release_length_buckets",
    "dedup_containment",
    "corpus_drift_js",
    "embedding_principal_direction",
    "quality_gopher_rules",
    "text_ngram_novelty",
    "pref_bradley_terry",
    "embedding_abtt_residuals",
    "dedup_recall_panel",
    "retrieval_bm25_topk",
    "curriculum_length_phases",
    "sketch_hll_union_matrix",
    "langid_confusion_matrix",
    "hypertable_gapfill_locf",
    "funnel_conversion_events",
    "wordpiece_fertility_panel",
    "unigram_viterbi_panel",
    "dq_k_anonymity",
    "retrieval_eval_panel",
    "cohort_retention_weekly",
    "markov_event_transitions",
    "survival_km_purchase",
    "experiment_ab_ztest",
    "session_path_topk",
    "rfm_segment_panel",
    # new this round, batch 11 (rule 1) (5): Markov stationary panel,
    # SCD2 dimension build, MAD anomaly panel, CMS heavy hitters,
    # quantile-sketch registers — these displaced the five r2-cohort
    # slots (q01/q02/q10/q12/q16), whose operator surfaces (filter/
    # project, global agg, distinct, global top-k, scalar functions)
    # every window entry exercises incidentally and the full-oracle
    # pytest sweep pins at both SFs; they head the r9 staleness queue
    # with the six batch-10 displacements
    "markov_stationary_panel",
    "scd2_dimension_build",
    "anomaly_mad_events",
    "sketch_cms_heavy_hitters",
    "sketch_quantile_doc_length",
    # new this round, batch 12 (rule 1) (2): market-basket rules +
    # CUPED panel — displacing q26_count_distinct (exact-NDV surface
    # stays under dq_table_profile, in-window) and q33_window_frames
    # (bounded-frame windows are exercised by the passage-dedup /
    # curriculum / gapfill entries); both head the r9 staleness queue
    "market_basket_rules",
    "experiment_cuped_panel",
    # stalest: last green round 1 (2 of the quartet)
    "q34_explode_tokens",
    "q38_tpch_q6",
    # NOTE (r9 window leads): orders_independence_chi2 and
    # lm_good_turing_counts (batch 13), plus sample_weighted_quality,
    # funnel_lag_percentiles and revenue_concentration_panel
    # (batch 14), events_autocorrelation_panel,
    # lineitem_discount_elasticity and dp_noisy_counts (batch 15),
    # graph_assortativity, concurrent_sessions_timeline,
    # shipping_delay_panel and text_burstiness_panel (batch 16),
    # cdc_merge_upsert and text_ks_length_drift (batch 17),
    # events_peak_detection and supplier_hhi_panel (batch 18),
    # registered after this window was full at 50 — the quality_retention_curve precedent. They are
    # oracle-swept in pytest at both SFs every run; the never-checked
    # guard (tests/test_driver_ledger.py) makes scheduling them in the
    # r9 window mandatory, alongside the displaced staleness queue:
    # batch-10/12 displacements (dedup_lsh_verified,
    # matmul_rows_kernel, q21_sliding_window, similarity_lsh_bucketed,
    # text_rolling_hash, text_udtf_ngrams, q26_count_distinct,
    # q33_window_frames) and the r2 cohort (q01/q02/q10/q12/q16).
    # stalest: last green round 3 (1 of the 23-cohort; the 22
    # displaced ones are named in the rotation note above)
    "dft_events",
    # (no r5 diversity picks left: the batch-2/3 new operators
    # displaced all eight — rule 1 outranks diversity, and the r5
    # cohort is only 3 rounds stale so the staleness guard holds
    # without them; they head the r9 staleness queue)
)

_ALL: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in _ALL:
            raise ValueError(f"duplicate query name {_name!r}")
        _ALL[_name] = _fn
    ORACLE.update(_m.ORACLE)

_unknown = set(PRIORITY_WINDOW) - set(_ALL)
if _unknown:
    raise ValueError(f"priority window names not registered: {sorted(_unknown)}")
if len(PRIORITY_WINDOW) != len(set(PRIORITY_WINDOW)):
    raise ValueError("duplicate names in priority window")

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    n: _ALL[n] for n in PRIORITY_WINDOW
}
QUERIES.update((n, f) for n, f in _ALL.items() if n not in QUERIES)

_missing = set(ORACLE) - set(QUERIES)
if _missing:
    raise ValueError(f"oracle entries without queries: {sorted(_missing)}")
