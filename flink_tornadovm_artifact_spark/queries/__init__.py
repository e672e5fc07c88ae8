"""Declared query registry.

Aggregates every query module's ``QUERIES`` (name → callable(spark, sf_dir)
→ DataFrame) and ``ORACLE`` (name → DuckDB SQL) into flat dicts consumed by
``__spark_entry__.py``. Queries without an oracle entry get the driver's
weaker rows-only check (non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import cep, iot, llm, ml, procedural, relational, tpch, windows

_MODULES = (relational, tpch, iot, ml, windows, llm, procedural, cep)

#: The verification driver oracle-checks only the FIRST 50 registry
#: entries, so registration order is itself a correctness-coverage
#: decision (round-1 lesson: module order left q20-q22 and the whole LLM
#: suite unchecked). The window below holds exactly 50 names: the
#: declared set q01-q22 (SURVEY §2.J), the LLM-pipeline operators with
#: oracles, the procedural kernels with oracles, and a hand-picked set of
#: distinct operator classes (UDAF, reduceGroup, decorrelation, frames,
#: cube). Everything else (TPC-H extras q37-q51, rows-only pipelines,
#: modulo-bounded all-pairs demos) registers after the window and is
#: pinned by pytest instead.
PRIORITY_WINDOW: tuple[str, ...] = (
    # declared set q01-q22 (26 entries)
    "q01_filter_project",
    "q02_global_agg",
    "q03_tpch_q1",
    "q04_tpch_q3",
    "q05_outer_join",
    "q06_broadcast_join",
    "q07_semi_anti",
    "q08_cogroup",
    "q09_cross",
    "q10_distinct",
    "q11_maxby",
    "q12_topk_global",
    "q12_topk_per_group",
    "q13_union_distinct",
    "q14_rollup",
    "q15_over_windows",
    "q16_scalar_functions",
    "q17_iot_global_reduce",
    "q18_iot_window_agg",
    "q19_iot_outliers",
    "q20_kmeans_assign",
    "q21_tumbling_window",
    "q21_sliding_window",
    "q21_session_window",
    "q21_session_window_dynamic",
    "q22_interval_join",
    # LLM-pipeline operators with oracles (13)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_lsh_verified",
    "similarity_topk",
    "similarity_lsh_bucketed",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_rolling_hash",
    "text_udtf_ngrams",
    "multimodal_binary_meta",
    # procedural kernels + bulk/delta iterations with oracles (7)
    "vector_add_kernel",
    "matmul_rows_kernel",
    "pi_estimation_weyl",
    "dft_events",
    "connected_components_pipeline",
    "pagerank_pipeline",
    "logreg_pipeline",
    # fixed-this-round + distinct operator classes (4; q52/q50/q33/q32/
    # q28 rotated out — all driver-green in round 1, their surfaces still
    # covered by q36/q14/q15/plan tests; q29 stays because reduce_group's
    # sort contract changed this round, q23/q30 because their join hints
    # changed, q36 because it was round 1's only red row)
    "q36_json_extract",
    "q29_reduce_group",
    "q23_tpch_q10",
    "q30_tpch_q5",
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
