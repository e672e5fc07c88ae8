"""Property-based tests for the round-11 third-batch operators — the
algorithmic invariants the fixture oracles and Spark/DuckDB
differentials cannot state (the tests/test_round10b_properties.py
discipline: pure-Python twins on adversarial random inputs, small
example counts, derandomized).

- winnowing: the PAPER's guarantee (Schleimer/Wilkerson/Aiken
  SIGMOD'03 §3) on random token sequences — any two documents sharing
  a contiguous run of >= WINNOW_K + WINNOW_W - 1 tokens share at
  least one selected fingerprint hash (the property that makes the
  sketch a sound dup detector), plus the ceil(n_windows/w) coverage
  bound and selection determinism. These run against the SAME
  pure-Python twin the Spark rows are pinned to row-by-row in
  tests/test_round11b_ops.py, so the chain Spark == twin == paper
  invariant is closed without a cluster in the loop.
- PII redaction: on arbitrary adversarial strings (not just the
  fixture injections) the pattern chain leaves NO residual match of
  any pattern and is idempotent — the closure property that makes
  re-running a scrubbing pipeline safe; placeholders themselves can
  never re-match.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_tornadovm_artifact_spark.queries.llm import WINNOW_K, WINNOW_W
from flink_tornadovm_artifact_spark.queries.pipeline import (
    PII_EMAIL_PATTERN,
    PII_IP_PATTERN,
    PII_PHONE_PATTERN,
)

from .test_round11b_ops import _redact_py, _winnow_py

_T = WINNOW_K + WINNOW_W - 1  # the guarantee threshold (tokens)

# tiny vocabulary => k-gram collisions and min-ties are COMMON, which
# is exactly the regime where the rightmost tie rule has to carry the
# shared-selection argument
_tokens = st.lists(
    st.sampled_from(["a", "b", "c", "ab", "q", "zz"]),
    min_size=0,
    max_size=30,
)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(
    _tokens,
    _tokens,
    _tokens,
    _tokens,
    st.lists(
        st.sampled_from(["a", "b", "c", "ab", "q", "zz"]),
        min_size=_T,
        max_size=_T + 4,
    ),
)
def test_winnowing_shared_run_guarantee(
    prefix_a, suffix_a, prefix_b, suffix_b, shared
):
    """Both docs embed the same >= t-token run MID-document at
    different offsets (independent prefixes AND suffixes, so windows
    straddling both edges of the run are exercised) => their
    fingerprint hash sets intersect."""
    doc_a = _winnow_py(" ".join(prefix_a + shared + suffix_a))
    doc_b = _winnow_py(" ".join(prefix_b + shared + suffix_b))
    assert doc_a is not None and doc_b is not None
    assert doc_a["fph"] & doc_b["fph"], (prefix_a, prefix_b, shared)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(st.lists(st.sampled_from(["a", "b", "c", "x"]), min_size=_T, max_size=40))
def test_winnowing_coverage_bound_and_determinism(toks):
    text = " ".join(toks)
    r1 = _winnow_py(text)
    r2 = _winnow_py(text)
    assert r1 == r2  # selection is a pure function of the text
    n_windows = r1["n_kgrams"] - WINNOW_W + 1
    assert r1["n_fingerprints"] >= -(-n_windows // WINNOW_W)
    assert r1["n_fingerprints"] <= n_windows
    assert r1["n_fp_hashes"] <= r1["n_fingerprints"]


_adversarial_text = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019._%+-@() ") + ["@", ".", "-"]
    ),
    min_size=0,
    max_size=60,
)
_pii_bits = st.lists(
    st.sampled_from(
        [
            "bob.smith+spam@sub.example.co",
            "(555) 123-4567",
            "192.168.255.1",
            "10.0.0.1",
            "x@y.zw",
            "(555) 000-0000 (555) 111-1111",
        ]
    ),
    min_size=0,
    max_size=4,
)


@settings(max_examples=80, deadline=None, derandomize=True)
@given(_adversarial_text, _pii_bits, _adversarial_text)
def test_pii_redaction_closure(pre, bits, post):
    """redact() must reach a fixed point in one pass: no residual
    pattern match survives, and a second pass is the identity — on
    adversarial interleavings, not just the fixture injections."""
    s = pre + " ".join(bits) + post
    red = _redact_py(s)
    for pat in (PII_EMAIL_PATTERN, PII_PHONE_PATTERN, PII_IP_PATTERN):
        assert not re.search(pat, red), (pat, s, red)
    assert _redact_py(red) == red
