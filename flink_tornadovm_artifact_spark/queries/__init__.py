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
PRIORITY_WINDOW: tuple[str, ...] = (
    # kept: iteration pipelines (2)
    "kmeans_pipeline",
    "sssp_pipeline",
    # new this round (rule 1): chunking, vocab coverage, length
    # histogram — registered round 6, driver-checked round 6 (3)
    "text_chunk_windows",
    "text_vocab_coverage",
    "text_length_histogram",
    # kept: TPC-H core breadth — anti/semi, correlated subquery,
    # heavy multi-join shapes (7)
    "q44_tpch_q22",
    "q48_tpch_q11",
    "q51_tpch_q9",
    "q53_tpch_q2",
    "q55_tpch_q21",
    "q32_correlated_subquery",
    "q54_tpch_q20",
    # kept: bounded all-pairs dedup demo (1; ngram twin rotates out,
    # both were 2×-green and the dedup surface stays amply in-window)
    "dedup_embedding_cosine",
    # new this round (rule 1): k-core decomposition (1)
    "kcore_social",
    # never-driver-checked: CEP completion family (7)
    "cep_after_match_no_skip",
    "cep_after_match_skip_to_last",
    "cep_one_or_more_until",
    "cep_followed_by_any",
    "cep_group_followed_by",
    "cep_not_next",
    "cep_allow_combinations",
    # never-driver-checked: text/LLM suite (6)
    "text_repetition_metrics",
    "text_bigram_lm_score",
    "text_tfidf_keywords",
    "text_importance_sample",
    "text_boilerplate_ngrams",
    "embedding_outlier_score",
    # never-driver-checked: dedup composition + datasheets (4)
    "dedup_cluster_representatives",
    "corpus_datasheet",
    "corpus_datasheet_v2",
    "corpus_datasheet_v3",
    # never-driver-checked: Gelly rest-of-tree (3)
    "bipartite_projection_suppliers",
    "asm_vertex_degrees",
    "generator_hypercube_degrees",
    # changed this round: ANSI-safe alpha_ratio; jaccard/adamic now
    # read the persisted UndirectedGraphBase (plan changed) (3).
    # q49_approx_aggregates stays OUT deliberately: the window must
    # stay fully oracle-backed (its sketches are rows-only by design —
    # pinned in test_queries_oracle.py), so it is the one registered
    # query without a driver-oracle row.
    "text_quality_score",
    "jaccard_similarity",
    "adamic_adar_similarity",
    # changed this round: UndirectedGraphBase re-routing (7)
    "triangle_enum",
    "local_clustering_coefficient",
    "global_clustering_coefficient_q",
    "average_clustering_coefficient_q",
    "triadic_census_q",
    "vertex_metrics_q",
    "edge_metrics_q",
    # kept: directed twins of the re-routed family, for differential
    # cover while the undirected base lands (2)
    "triadic_census_directed_q",
    "edge_metrics_directed_q",
    # new this round (rule 1): hypertable rollup, banded range join,
    # count-min sketch, PMI collocations (4; q24 rotates out — TPC-H
    # surface stays covered by the six kept fact-join shapes)
    "hypertable_rollup_events",
    "range_join_events",
    "sketch_count_min_tokens",
    "text_pmi_bigrams",
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
