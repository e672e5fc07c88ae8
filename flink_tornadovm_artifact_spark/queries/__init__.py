"""Declared query registry.

Aggregates every query module's ``QUERIES`` (name → callable(spark, sf_dir)
→ DataFrame) and ``ORACLE`` (name → DuckDB SQL) into flat dicts consumed by
``__spark_entry__.py``. Queries without an oracle entry get the driver's
weaker rows-only check (non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import cep, gelly, iot, llm, ml, procedural, relational, temporal_q, tpch, utils_q, windows

_MODULES = (relational, tpch, iot, ml, windows, llm, procedural, cep, gelly, utils_q, temporal_q)

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
#: Round-7 rotation (STALENESS-DRIVEN — the new ledger guard in
#: tests/test_driver_ledger.py makes this mandatory: a window slot held
#: by a ≤2-round-old green entry while a ≥4-round-stale query waits is
#: now a red test). Every never-checked query got its row in round 6,
#: so the debt is now AGE: 64 queries' last driver row is from rounds
#: 1-3. IN — the 5 new release-mechanics operators and the 4 whose
#: plans changed this round (rule 1; the three global-window
#: restructures + the k_core cache-leak fix), then the 41 stalest by
#: last-green round: all 14 remaining r1-cohort, all 18 r2-cohort, and
#: 9 of the r3-cohort chosen for operator diversity (iteration
#: pipelines, dedup family, windows, interval join, lang-id). OUT —
#: the round-6 window's 2×-green incumbents (CEP completion family,
#: datasheets, undirected Gelly family, TPC-H heavies) — every one
#: stays under the full 149-oracle pytest sweep at both SFs.
WINDOW_KEEP_FRESH: dict[str, str] = {
    # rule-1 holds: green in r6 but their PLANS changed this round, so
    # the driver must re-verify the new shapes (the staleness guard
    # exempts these from the fresh-incumbent check)
    "text_vocab_coverage": "global rank window -> TakeOrdered + 1-row total",
    "text_pmi_bigrams": "global total windows -> 1-row broadcast joins",
    "kcore_social": "k_core no longer builds/leaks an UndirectedGraphBase",
}

PRIORITY_WINDOW: tuple[str, ...] = (
    # new this round (rule 1): release mechanics (6)
    "corpus_train_split",
    # new this round, second batch (rule 1): the 22nd TPC-H query and
    # the passage/quantization trio (4). Displaced to make room (their
    # operator surface stays in-window via siblings and under the
    # full-oracle pytest sweep): q38_tpch_q6 (filter+agg — q01/q02
    # family), q10_distinct (q13_union_distinct), q02_global_agg
    # (q17_iot_global_reduce), q12_topk_global (q12_topk_per_group).
    "q56_tpch_q14",
    "text_duplicate_passages",
    "source_overlap_matrix",
    "embedding_quantize_int8",
    # new this round, third batch (rule 1): BPE merge training.
    # Displaced: q01_filter_project (scan+filter+project is under every
    # TPC-H entry in the window, q04/q56 directly).
    "bpe_merge_table",
    # new this round, fourth batch (rule 1): tokenizer application +
    # training-mix + release sharding (3). Displaced (surface stays
    # in-window via siblings): q26_count_distinct (the distinct-count
    # aggregate shape is dedup_exact's n_distinct, in-window),
    # q34_explode_tokens (token explode is under bpe_merge_table /
    # text_duplicate_passages directly), q16_scalar_functions (scalar
    # expression surface is under every text_* entry).
    "bpe_encode_fertility",
    "corpus_mixture_weights",
    "release_shard_manifest",
    # new this round, fifth batch (rule 1): the embedding covariance /
    # anisotropy panel. Displaced: q33_window_frames (frame-spec window
    # surface stays in-window under q15_over_windows).
    "embedding_covariance_panel",
    "text_domain_cap",
    "sample_stratified_lang",
    "dedup_incremental",
    "sketch_hyperloglog_tokens",
    "split_leakage_audit",
    # changed this round (rule 1): global-window restructures + k-core
    # cache-leak fix (4; see WINDOW_KEEP_FRESH)
    "text_vocab_coverage",
    "text_pmi_bigrams",
    "q47_tpch_q15",
    "kcore_social",
    # stalest: last green round 1 (14)
    "q25_intersect_except",
    "q27_sql_api",
    "q28_pandas_udaf",
    "q31_tpch_q18",
    "q35_percentiles",
    "q37_tpch_q4",
    "q39_tpch_q12",
    "q40_tpch_q13",
    "q50_cube_grouping_id",
    "q52_from_json_struct",
    # stalest: last green round 2 (18)
    "q04_tpch_q3",
    "q05_outer_join",
    "q06_broadcast_join",
    "q07_semi_anti",
    "q08_cogroup",
    "q09_cross",
    "q11_maxby",
    "q12_topk_per_group",
    "q13_union_distinct",
    "q14_rollup",
    "q15_over_windows",
    "q17_iot_global_reduce",
    "q18_iot_window_agg",
    # stalest: last green round 3, diversity picks (8).
    # q49_approx_aggregates stays OUT deliberately: the window must
    # stay fully oracle-backed (its sketches are rows-only by design —
    # pinned in test_queries_oracle.py), so it is the one registered
    # query without a driver-oracle row.
    "connected_components_pipeline",
    "dedup_exact",
    "dedup_minhash_lsh",
    "logreg_pipeline",
    "pagerank_pipeline",
    "q03_tpch_q1",
    "q21_session_window",
    "q22_interval_join",
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
