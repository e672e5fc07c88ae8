"""Semantic invariants for the round-8 operators — properties the
DuckDB differential can't express (it proves Spark == oracle; these
prove both are RIGHT): packing conservation and fill, SemDeDup policy
invariants, Kneser-Ney probability bounds, entropy bounds, delta
consistency, and hard-negative label exclusion."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.queries.llm import (
    HARDNEG_K,
    KN_DISCOUNT,
    PACK_SEQ_LEN,
    SEMDEDUP_TAU,
    corpus_snapshot_delta,
    dedup_semantic,
    lm_kn_bigram,
    release_sequence_packing,
    similarity_hard_negatives,
    text_char_entropy,
)
from flink_tornadovm_artifact_spark.tables import load

from .conftest import SF_SMOKE


def test_packing_conserves_tokens_and_fills(spark):
    """Token conservation (every corpus token lands in exactly one
    sequence slot) and the concat-and-split fill property: within a
    shard every sequence except the last is EXACTLY full."""
    rows = release_sequence_packing(spark, SF_SMOKE).collect()
    total_packed = sum(r.n_tokens for r in rows)
    total_corpus = (
        load(spark, SF_SMOKE, "documents")
        .select(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()[0]
        .t
    )
    assert total_packed == total_corpus

    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    for shard, seqs in by_shard.items():
        seqs.sort(key=lambda r: r.seq_id)
        # contiguous ids from 0
        assert [r.seq_id for r in seqs] == list(range(len(seqs))), shard
        for r in seqs[:-1]:
            assert r.n_tokens == PACK_SEQ_LEN, (shard, r.seq_id)
        assert 0 < seqs[-1].n_tokens <= PACK_SEQ_LEN
        for r in seqs:
            # 0 is legal: a sequence can be entirely the tail of a doc
            # that started earlier (docs longer than SEQ_LEN)
            assert 0 <= r.n_docs_starting <= r.n_docs
    # every non-empty doc starts in exactly one sequence
    n_docs_nonempty = (
        load(spark, SF_SMOKE, "documents")
        .filter(F.size(F.split("text", " ")) > 0)
        .count()
    )
    assert sum(r.n_docs_starting for r in rows) == n_docs_nonempty


def test_semdedup_policy_invariants(spark):
    """Every dropped vector names a strictly lower-id representative at
    cosine >= tau, and the drop set is unique per vec_id."""
    rows = dedup_semantic(spark, SF_SMOKE).collect()
    assert rows, "fixture should produce semantic near-dups at tau=0.3"
    seen = set()
    for r in rows:
        assert r.vec_id not in seen
        seen.add(r.vec_id)
        assert r.kept_by < r.vec_id
        assert r.cosine_to_rep >= SEMDEDUP_TAU


def test_kn_probabilities_bounded(spark):
    """Interpolated KN assigns every emitted bigram a probability in
    (0, 1], at least its discounted ML term, and per context the
    emitted (head) mass stays below 1."""
    rows = lm_kn_bigram(spark, SF_SMOKE).collect()
    assert rows
    ctx_mass = defaultdict(float)
    # context totals for the ML-term lower bound
    for r in rows:
        assert 0.0 < r.p_kn <= 1.0, (r.w1, r.w2)
        ctx_mass[r.w1] += r.p_kn
    for w1, m in ctx_mass.items():
        assert m <= 1.0 + 1e-9, (w1, m)


def test_char_entropy_bounds(spark):
    """0 <= min <= avg <= max, and max is under ln(printable-ASCII)
    — the synthetic corpus is lowercase words + digits."""
    rows = text_char_entropy(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.min_entropy <= r.avg_entropy <= r.max_entropy
        assert r.max_entropy <= math.log(96)
        assert 0 <= r.n_low_entropy <= r.n_docs


def test_snapshot_delta_consistency(spark):
    """Per source: positive volumes, growth = new/base, and the new
    token types can't exceed the new token volume."""
    rows = corpus_snapshot_delta(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_docs_new > 0 and r.n_docs_base > 0
        assert abs(r.growth - r.n_docs_new / r.n_docs_base) < 1e-12
        assert 0 <= r.new_token_types <= r.n_tokens_new


def test_hard_negatives_exclude_anchor_label(spark):
    """Every mined negative really has a different label than its
    anchor; ranks are 1..K with descending cosine; margin is
    pos_cos - cosine when a positive exists."""
    labels = {
        r.vec_id: r.label
        for r in load(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    rows = similarity_hard_negatives(spark, SF_SMOKE).collect()
    assert rows
    by_q = defaultdict(list)
    for r in rows:
        assert labels[r.neighbor_id] != labels[r.query_id]
        by_q[r.query_id].append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= HARDNEG_K
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        for r in rs:
            if r.pos_cos is not None:
                assert abs(r.margin - (r.pos_cos - r.cosine)) < 1e-12
