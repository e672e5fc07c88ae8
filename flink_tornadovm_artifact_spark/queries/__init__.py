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
#: Round-4 OVERFLOW (registered outside the window, oracle-green in
#: pytest, rotates in round 5): text_repetition_metrics, the
#: AfterMatchSkipStrategy family (cep_after_match_no_skip,
#: cep_after_match_skip_to_last), cep_one_or_more_until,
#: cep_followed_by_any, cep_group_followed_by, cep_not_next,
#: text_bigram_lm_score, text_tfidf_keywords, text_importance_sample,
#: text_boilerplate_ngrams, embedding_outlier_score,
#: dedup_cluster_representatives, corpus_datasheet,
#: bipartite_projection_suppliers, asm_vertex_degrees,
#: generator_hypercube_degrees.
PRIORITY_WINDOW: tuple[str, ...] = (
    # kept: single-round-green iterations + TPC-H extras (8)
    "kmeans_pipeline",
    "sssp_pipeline",
    "q24_promo_revenue",
    "q41_tpch_q16",
    "q42_tpch_q17",
    "q43_tpch_q19",
    "q45_tpch_q7",
    "q46_tpch_q8",
    # de-vacuized this round (5)
    "q51_tpch_q9",
    "q44_tpch_q22",
    "q48_tpch_q11",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    # kept: round-3 CEP patterns (4) + new quantifiers (3)
    "cep_followed_by",
    "cep_times",
    "cep_not_followed_by",
    "cep_next",
    "cep_one_or_more",
    "cep_optional",
    "cep_times_range",
    # kept: round-3 Gelly queries (5; adamic_adar also changed — try_divide)
    "triangle_enum",
    "label_propagation_communities",
    "hits_scores",
    "jaccard_similarity",
    "adamic_adar_similarity",
    # new directed Gelly analytics (4)
    "global_clustering_coefficient_directed_q",
    "average_clustering_coefficient_directed_q",
    "triadic_census_directed_q",
    "edge_metrics_directed_q",
    # round-3 overflow: graph library (11)
    "community_detection_labels",
    "local_clustering_coefficient",
    "global_clustering_coefficient_q",
    "average_clustering_coefficient_q",
    "triadic_census_q",
    "graph_summarization",
    "vertex_metrics_q",
    "edge_metrics_q",
    "vertex_metrics_directed_q",
    "triangle_listing_directed_q",
    "local_clustering_coefficient_directed_q",
    # round-3 overflow: utils/temporal/LLM (5)
    "zip_with_index_contract",
    "zip_with_unique_id_contract",
    "sample_with_size_contract",
    "temporal_join_events",
    "text_decontaminate",
    # never-driver-checked backlog (5)
    "similarity_ivf",
    "multimodal_feature_extract",
    "q53_tpch_q2",
    "q55_tpch_q21",
    "q32_correlated_subquery",
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
