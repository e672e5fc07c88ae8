"""Semantic invariants for the round-8 second-batch operators
(queries/pipeline.py) — properties the DuckDB differential can't
express: PII redaction accounting against the fixture's known ID
shapes, perplexity-tercile ordering and partition completeness, Zipf
slope sign and fit bounds, profile/constraint consistency, and
power-of-two bucket arithmetic."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.queries.pipeline import (
    LENGTH_BUCKET_FLOOR,
    ZIPF_TOP,
    dq_referential_checks,
    dq_table_profile,
    lm_perplexity_bucket,
    pii_pattern_audit,
    release_length_buckets,
    zipf_token_panel,
)
from flink_tornadovm_artifact_spark.tables import load

from .conftest import SF_SMOKE


def test_pii_audit_matches_fixture_shapes(spark):
    """The fixture's c_name values are 'Customer#%09d' — every value
    contains BOTH a ≥6 digit run and the word#digits ID pattern, and
    redaction removes the full 18-char value. c_mktsegment is a clean
    enum (zero hits); p_brand is 'Brand#N' (ID hit, digits too short
    for a run); no column anywhere contains an email."""
    rows = {
        (r.table_name, r.column_name): r
        for r in pii_pattern_audit(spark, SF_SMOKE).collect()
    }
    cname = rows[("customer", "c_name")]
    assert cname.digit_run_hits == cname.n_values
    assert cname.id_hits == cname.n_values
    assert cname.redacted_chars == cname.n_values * len("Customer#000000000")
    seg = rows[("customer", "c_mktsegment")]
    assert seg.digit_run_hits == seg.id_hits == seg.redacted_chars == 0
    brand = rows[("part", "p_brand")]
    assert brand.id_hits == brand.n_values
    assert brand.digit_run_hits == 0
    sname = rows[("supplier", "s_name")]
    assert sname.id_hits == sname.n_values
    assert all(r.email_hits == 0 for r in rows.values())
    assert all(r.n_values > 0 for r in rows.values())


def test_perplexity_buckets_partition_and_order(spark):
    """Buckets partition the scored docs per language; tercile labels
    come from disjoint quantized-entropy ranges, so mean cross-entropy
    must be strictly ordered head < middle < tail within a language
    (when all three buckets are populated)."""
    rows = lm_perplexity_bucket(spark, SF_SMOKE).collect()
    assert {r.bucket for r in rows} <= {"head", "middle", "tail"}
    by_lang = defaultdict(dict)
    for r in rows:
        by_lang[r.lang][r.bucket] = r
    langs = {
        r.lang
        for r in load(spark, SF_SMOKE, "documents").select("lang").distinct().collect()
    }
    assert set(by_lang) == langs
    for lang, buckets in by_lang.items():
        assert sum(r.n_docs for r in buckets.values()) > 0
        if len(buckets) == 3:
            assert (
                buckets["head"].avg_xent
                < buckets["middle"].avg_xent
                < buckets["tail"].avg_xent
            ), lang
        for r in buckets.values():
            # ppl = exp(xent) per doc; Jensen: avg_ppl >= exp(avg_xent)
            assert r.avg_ppl >= math.exp(r.avg_xent) - 1e-9, (lang, r.bucket)


def test_zipf_slope_negative_and_fit_bounded(spark):
    rows = zipf_token_panel(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 < r.n_types <= ZIPF_TOP
        assert r.zipf_slope < 0, r.source
        assert 0.0 <= r.r2 <= 1.0 + 1e-12, r.source


def test_table_profile_consistency(spark):
    rows = {r.column_name: r for r in dq_table_profile(spark, SF_SMOKE).collect()}
    n_orders = load(spark, SF_SMOKE, "orders").count()
    assert set(rows) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    for r in rows.values():
        assert r.n_rows == n_orders
        assert 0 < r.n_nonnull <= r.n_rows
        assert 0 < r.n_distinct <= r.n_nonnull
        assert r.min_value is not None and r.max_value is not None
    # PK: every order key distinct
    assert rows["o_orderkey"].n_distinct == n_orders
    # low-cardinality enum
    assert rows["o_orderstatus"].n_distinct <= 3


def test_referential_checks_pass_on_fixture(spark):
    rows = {r.check_name: r for r in dq_referential_checks(spark, SF_SMOKE).collect()}
    assert len(rows) == 7
    n_orders = load(spark, SF_SMOKE, "orders").count()
    n_li = load(spark, SF_SMOKE, "lineitem").count()
    assert rows["orders_pk_unique"].n_checked == n_orders
    assert rows["lineitem_fk_orders"].n_checked == n_li
    for r in rows.values():
        assert r.n_violations == 0 and bool(r.passed), r.check_name


def test_length_buckets_pow2_and_conservation(spark):
    rows = release_length_buckets(spark, SF_SMOKE).collect()
    docs = (
        load(spark, SF_SMOKE, "documents")
        .select(F.size(F.split("text", " ")).alias("n"))
        .collect()
    )
    assert sum(r.n_docs for r in rows) == len(docs)
    assert sum(r.total_tokens for r in rows) == sum(d.n for d in docs)
    for r in rows:
        b = r.bucket_len
        assert b >= LENGTH_BUCKET_FLOOR and (b & (b - 1)) == 0, b
        assert r.padded_tokens == b * r.n_docs
        assert r.total_tokens <= r.padded_tokens
        assert 0.0 <= r.waste_frac < 1.0
    # python recompute of bucket membership
    expect = defaultdict(lambda: [0, 0])
    for d in docs:
        b = max(LENGTH_BUCKET_FLOOR, 2 ** math.ceil(math.log2(d.n)))
        expect[b][0] += 1
        expect[b][1] += d.n
    got = {r.bucket_len: (r.n_docs, r.total_tokens) for r in rows}
    assert got == {b: tuple(v) for b, v in expect.items()}
