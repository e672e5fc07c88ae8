#!/usr/bin/env python
"""Generate PLAN_AUDIT.md: one row of physical-plan shape metrics per
registered query — exchanges, broadcasts, nested-loop/cartesian
fallbacks, whole-stage-codegen span count, and pushed parquet filters.

The table makes the 100 TB design reviewable without re-running every
query: a cartesian in a new query, a broadcast sneaking onto an
SF-linear table, or a lost pushdown shows up as a diff in this file.
Plans are built at sf0.01 (shape is what matters; AQE may re-plan sizes
at runtime but the static strategy — join types, exchange keys,
pushdown — is what this audits).

Usage: python tools/plan_audit.py [sf_dir] (writes PLAN_AUDIT.md).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: Queries EXPECTED to carry a CartesianProduct/BroadcastNestedLoopJoin
#: node, with the reason. Anything else with one is a regression — the
#: audit (and tests/test_plan_audit.py) flags it by name.
NESTED_LOOP_ALLOWLIST = {
    # documented bounded all-pairs demo (modulo-sampled side).
    # dedup_ngram_jaccard left this list in round 12: its crossJoin
    # form was rewritten as a shingle-key equi-join (queries/llm.py).
    "dedup_embedding_cosine": "bounded all-pairs demo",
    "q09_cross": "the cross/crossWithTiny operator itself",
    "similarity_topk": "broadcast query side (small Q by design)",
    # 1-row scalar-aggregate crossJoins (vocab size / corpus max /
    # doc count / global stats riding along as a broadcast)
    "global_clustering_coefficient_directed_q": "1-row stats join",
    "global_clustering_coefficient_q": "1-row stats join",
    "triadic_census_directed_q": "1-row stats join",
    "triadic_census_q": "1-row stats join",
    "text_bigram_lm_score": "1-row vocab-size join",
    "text_importance_sample": "1-row corpus-max join",
    "text_tfidf_keywords": "1-row doc-count join",
    # decorrelated scalar subqueries (1-row threshold broadcast)
    "q44_tpch_q22": "scalar avg-balance threshold",
    "q48_tpch_q11": "scalar value-fraction threshold",
    # set-op / semi-anti demos on bounded inputs
    "q07_semi_anti": "non-equi anti-join demo on bounded side",
    "q25_intersect_except": "EXCEPT ALL rewrite on bounded side",
    # round-7 global-window restructures: corpus totals now ride as
    # 1-row aggregate broadcasts instead of unpartitioned windows
    "text_pmi_bigrams": "1-row stats join (corpus t_total/p_total)",
    "text_vocab_coverage": "1-row corpus-total join onto the top-K head",
    # round-7 release mechanics
    "sample_stratified_lang": "1-row min-count join onto the lang table",
    "corpus_mixture_weights": "1-row corpus-total + weight-normalizer joins",
    "release_shard_manifest": "1-row token-total join onto the shard table",
    "embedding_covariance_panel": "1-row trace join onto the d^2-row table",
    # round-8 additions
    "lm_kn_bigram": "1-row bigram-type-count join (the Pcont normalizer)",
    "lm_perplexity_bucket": "inherits lm_kn_bigram's 1-row type-count broadcast (scores against that model)",
    "quality_retention_curve": "1-row corpus-token-total join onto the 21-row grid",
    "similarity_hard_negatives": "broadcast anchor side (vec_id %% 25 — small Q by design, the similarity_topk shape)",
    # round-8 batch 5
    "retrieval_bm25_topk": "1-row N/avgdl stats join onto the query-term tf slice",
    "curriculum_length_phases": "1-row exact-quartile thresholds join",
    "sketch_hll_union_matrix": "sources x 512-register dense grid (bounded by construction)",
    "funnel_conversion_events": "three 1-row step counts cross-joined into the panel",
    "retrieval_eval_panel": "inherits retrieval_bm25_topk's 1-row N/avgdl stats join",
    # round-8 batch 10 (behavior.py)
    "survival_km_purchase": "1-row n_total broadcast onto the duration grid",
    "rfm_segment_panel": "1-row ref-date + exact-quartile-thresholds broadcasts",
    # round-8 batch 11
    "sketch_cms_heavy_hitters": "1-row token-total broadcast onto the type table",
    "sketch_quantile_doc_length": "1-row stats broadcast + 9-row decile grid vs <=128-row register non-equi join (both bounded by construction)",
    # round-8 batch 12
    "market_basket_rules": "1-row basket-count broadcast onto the <=types^2 rule table",
    # round-8 batch 13
    "orders_independence_chi2": "1-row total/dof broadcasts onto the <=35-cell contingency table",
    "lm_good_turing_counts": "1-row token-total broadcast onto the count-of-counts table",
    # round-12 hits rework (batch 3/6): the final projection is LAZY —
    # the returned plan carries the two 1-row norm broadcasts
    # crossJoined onto the checkpointed h/a legs (the committed r12
    # audit predated this; caught by the round-13 regeneration)
    "hits_scores": "two 1-row sqrt-norm broadcasts onto the checkpointed h/a legs",
    # round-8 batch 14
    "revenue_concentration_panel": "1-row exact-quantile-thresholds broadcast onto the customer table",
    # round-8 batch 15
    "events_autocorrelation_panel": "6-row lag-grid broadcast fanning the dense hourly table (constant fan-out by construction)",
    # round-8 batch 16
    "text_burstiness_panel": "1-row doc-count broadcast onto the token type table",
    # round-8 batch 17
    "text_ks_length_drift": "1-row group-totals broadcast onto the length-domain ECDF grid",
    # round-10 second batch
    "ann_recall_panel": "inherits similarity_topk's broadcast query side (small Q by design)",
    # round-11
    "quality_classifier_score": "1-row feature-moments (mu/sd) broadcast onto the feature frame",
    "perplexity_decontaminate": "1-row bigram-type-count broadcast (the lm_kn_bigram Pcont normalizer shape)",
    "quality_calibration_panel": "inherits the classifier's 1-row moments broadcast + a 1-row ECE broadcast onto the 10-bin table",
    "decontaminate_verdict_panel": "inherits perplexity_decontaminate's 1-row type-count broadcast",
    # round-12
    "dq_table_profile": "1-row string-min/max aggregate crossJoined onto the 1-row NDV aggregate (keeps the Expand leg hash-aggregable)",
    "epoch_repetition_budget": "1-row corpus-total + weight-normalizer broadcasts onto the #sources-row table (the corpus_mixture_weights shape, re-derived on the deduped mass)",
    "mixture_epoch_schedule": "inherits epoch_repetition_budget's 1-row total/normalizer broadcasts (composes it, <=ceil(epochs) fan-out per source)",
}

#: Queries EXPECTED to plan a Window over a SinglePartition exchange,
#: with the reason the input frame is BOUNDED (a global window over an
#: unbounded-cardinality frame is the one plan shape that cannot
#: survive 100× — the round-6 verdict's scale-killer). Anything else
#: with one is a regression.
GLOBAL_WINDOW_ALLOWLIST: dict[str, str] = {
    "text_vocab_coverage": "cum-coverage window over the LIMIT-50 head",
    # two-phase zipWithIndex: the cumulative-offset window runs over
    # the per-PARTITION-count table (rows = #partitions, bounded by
    # cluster size, not data size — Flink DataSetUtils' own design)
    "zip_with_index_contract": "offset window over per-partition counts",
    # sorted_rank (the zip_with_index mechanism ordered by a column):
    # the cumulative-offset window again runs over the per-partition
    # COUNT table, bounded by partition count, not corpus size
    "epoch_shuffle_contract": "sorted_rank offset window over per-partition counts",
    # the KM risk-set and product windows run over the distinct-
    # DURATION grid (bounded by the observation span in minutes — a
    # TIME-bounded frame, not a corpus-bounded one; the survival curve
    # is inherently a sequential product over that grid)
    "survival_km_purchase": "risk-set/product windows over the duration grid",
    # the register table is <= QSK_BINS = 128 rows by construction
    "sketch_quantile_doc_length": "cum window over the 128-row register table",
    # the running concurrency sum runs over the hour grid (TIME-
    # bounded like the KM duration grid, never corpus-bounded)
    "concurrent_sessions_timeline": "running sum over the span-hours grid",
    # ECDF windows run over the distinct-length grid (VALUE-bounded —
    # the quantile-register discipline)
    "text_ks_length_drift": "ECDF windows over the length-domain grid",
}


def global_windows(plan: str) -> int:
    """Count Window nodes whose nearest downstream Exchange is
    SinglePartition — i.e. unpartitioned windows that funnel their
    whole input through one task. Windows over frames that are already
    single-partition without an exchange (post-LIMIT heads, 1-row
    aggregates) don't plan an Exchange and are not counted: those are
    the bounded cases."""
    lines = plan.split("\n")
    count = 0
    for i, line in enumerate(lines):
        if not re.search(r"\bWindow(GroupLimit)? \[", line):
            continue
        ind = _indent(line)
        j = i + 1
        while j < len(lines) and _indent(lines[j]) > ind:
            nxt = lines[j]
            if "Exchange" in nxt or "InMemoryTableScan" in nxt:
                if "SinglePartition" in nxt:
                    count += 1
                break
            j += 1
    return count


_REL = re.compile(r"InMemoryRelation \[")
#: cosmetic per-use-site noise: expression ids and plan ids differ
#: between prints of the SAME cache (CacheManager rewrites the
#:  substituted relation's output to the use site's attributes)
_NOISE = re.compile(r"#\d+L?|plan_id=\d+")


def _indent(line: str) -> int:
    m = re.match(r"[\s:+|*()\d-]*", line)
    return m.end()


def effective_count(plan: str, pattern: str) -> int:
    """Count ``pattern`` occurrences that will actually EXECUTE: a
    persisted frame's build plan is re-printed verbatim under every
    InMemoryTableScan that reads it, so a raw string count bills the
    cached subtree once per re-read. Here each DISTINCT InMemoryRelation
    — keyed by its build plan canonicalized over expr/plan ids, since
    the same cache prints different attribute ids at each use site —
    is counted once, with nested cached relations deduped recursively."""
    return _effective(plan.split("\n"), re.compile(pattern), set())


def _effective(lines: list[str], pat: re.Pattern, seen: set[str]) -> int:
    total = 0
    i = 0
    while i < len(lines):
        line = lines[i]
        if _REL.search(line):
            ind = _indent(line)
            j = i + 1
            while j < len(lines) and _indent(lines[j]) > ind:
                j += 1
            sub = lines[i + 1 : j]
            sig = _NOISE.sub("#", "\n".join(ln[_indent(ln):] for ln in sub))
            if sig not in seen:
                seen.add(sig)
                total += _effective(sub, pat, seen)
            i = j
        else:
            total += len(pat.findall(line))
            i += 1
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from flink_tornadovm_artifact_spark.queries import QUERIES
    from flink_tornadovm_artifact_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # AQE wraps the plan in AdaptiveSparkPlan(isFinalPlan=false), which
    # defers codegen-stage assignment to runtime — with it on, the
    # codegen-span column reads 0 for every query (it did from rounds
    # 1-6; the committed tables' column was dead). The audit is about
    # the STATIC strategy, so print plans with AQE off; the runtime
    # re-plan (skew splits, runtime broadcast) is additive on top.
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    rows = []
    for name, fn in sorted(QUERIES.items()):
        # Persisted graph/stat bases from EARLIER queries otherwise leak
        # into later plans via CacheManager substitution: the audit rows
        # become order-dependent (the round-6 f4a2abd pollution —
        # triangle_enum jumped 7→56 purely from kcore's resident base).
        # One cache-free plan per query keeps the table deterministic.
        spark.catalog.clearCache()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - report, don't die
            rows.append((name, None, str(exc)[:80]))
            continue
        rows.append(
            (
                name,
                {
                    "shuffles": effective_count(
                        plan, r"Exchange hashpartitioning"
                    ),
                    "broadcasts": effective_count(plan, r"BroadcastExchange"),
                    "nested_loop": effective_count(
                        plan, r"CartesianProduct|BroadcastNestedLoopJoin"
                    ),
                    # spans print as `*(N) Operator` prefixes in the
                    # non-adaptive executed plan (the old
                    # `WholeStageCodegen (N)` pattern never matched)
                    "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
                    "pushed": bool(
                        re.search(r"PushedFilters: \[[A-Za-z]", plan)
                    ),
                    "global_window": global_windows(plan),
                },
                None,
            )
        )

    lines = [
        "# PLAN_AUDIT — static physical-plan shape per registered query",
        "",
        "Generated by `tools/plan_audit.py` at sf0.01 (regenerate after",
        "plan-affecting changes; the cache is cleared per query, so the",
        "table is order-independent). Columns: hash-partition exchanges,",
        "broadcast exchanges, nested-loop/cartesian joins (should be 0",
        "outside the documented bounded demos), distinct",
        "whole-stage-codegen spans, whether any parquet scan carries",
        "pushed filters, and single-partition (global) Window nodes",
        "(should be 0 outside the documented bounded-frame cases).",
        "",
        "| query | shuffles | broadcasts | nested-loop | codegen spans |"
        " pushed filters | global window |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, m, err in rows:
        if m is None:
            lines.append(f"| {name} | ERROR: {err} | | | | | |")
        else:
            lines.append(
                f"| {name} | {m['shuffles']} | {m['broadcasts']} |"
                f" {m['nested_loop']} | {m['codegen_spans']} |"
                f" {'yes' if m['pushed'] else '–'} |"
                f" {m['global_window']} |"
            )
    with open("PLAN_AUDIT.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    bad = [n for n, m, e in rows if m is None]
    nl = [n for n, m, e in rows if m and m["nested_loop"]]
    unexpected = sorted(set(nl) - set(NESTED_LOOP_ALLOWLIST))
    gw = [n for n, m, e in rows if m and m["global_window"]]
    unexpected_gw = sorted(set(gw) - set(GLOBAL_WINDOW_ALLOWLIST))
    print(f"wrote PLAN_AUDIT.md: {len(rows)} queries, errors={bad}")
    print(f"nested-loop (allowlisted): {sorted(set(nl) & set(NESTED_LOOP_ALLOWLIST))}")
    print(f"UNEXPECTED nested-loop: {unexpected}")
    print(f"global-window (allowlisted): {sorted(set(gw) & set(GLOBAL_WINDOW_ALLOWLIST))}")
    print(f"UNEXPECTED global-window: {unexpected_gw}")
    if unexpected or unexpected_gw or bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
