"""Property-based differential tests for the round-12 operators (the
test_round11_properties.py discipline — small example counts,
hypothesis shrinking, derandomized for driver stability).

What each property adds beyond the fixture oracles:
- exact-substring family: full Python recompute on random corpora
  drawn from a TWO-WORD alphabet, where every k-gram recurs heavily —
  same gram many times inside one doc, overlapping qualifying runs
  (< EXSUB_K - 1 apart) that MUST be interval-merged, whole docs made
  of one repeated token. The fixture's injected passages never
  overlap; these corpora are where a naive per-run token sum
  double-counts and a distinct-set marking undercounts.
- neardup verdict fold: the fold's answer must depend ONLY on the
  per-(doc, band) minimum across emissions — arbitrary redelivery
  multisets (later copies carrying equal-or-tighter bucket minima)
  fold identically to their min-reduced canonical. This is the
  algebraic fact the streaming redelivery test witnesses once on the
  fixture; here it is quantified over adversarial emission sets.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_tornadovm_artifact_spark.queries.llm import (
    exact_substring_removal,
    exact_substring_spans,
)
from flink_tornadovm_artifact_spark.streaming.neardup import (
    BAND_EMIT_SCHEMA,
    neardup_verdicts,
)

from .test_round12_ops import _exsub_py

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)

_counter = [0]


def _docs_dir(tmp_path_factory, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    _counter[0] += 1
    d = tmp_path_factory.mktemp(f"props12_{_counter[0]}")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


#: docs over a two-word alphabet: k-grams recur by construction, and a
#: doc of 20-45 tokens yields multiple qualifying (>= 20-token) runs
#: that overlap and must merge; short docs (< 8 tokens) pin the
#: no-gram trivial path
_doc = st.lists(
    st.sampled_from(["aa", "bb"]), min_size=1, max_size=45
).map(" ".join)


@given(texts=st.lists(_doc, min_size=1, max_size=4))
@settings(**SETTINGS)
def test_exact_substring_family_matches_python_reference(
    spark, tmp_path_factory, texts
):
    sf = _docs_dir(tmp_path_factory, texts)
    docs = {i: t for i, t in enumerate(texts)}
    spans_py, removal_py, _ = _exsub_py(docs)

    got_spans = defaultdict(list)
    for r in exact_substring_spans(spark, sf).collect():
        got_spans[r.doc_id].append((r.start_tok, r.span_tokens))
    assert {d: sorted(v) for d, v in got_spans.items()} == {
        d: sorted(v) for d, v in spans_py.items() if v
    }

    rows = exact_substring_removal(spark, sf).collect()
    assert len(rows) == len(docs)
    for r in rows:
        n_spans, toks = removal_py.get(r.doc_id, (0, 0))
        assert (r.n_spans_removed, r.tokens_removed) == (n_spans, toks)
        n_tok = len(docs[r.doc_id].split(" "))
        # merged-interval union can never exceed the doc, and the
        # doc's FIRST copy of any duplicated gram is never removed:
        # a doc can lose every token only if every position has a
        # strictly earlier twin elsewhere
        assert r.tokens_removed <= n_tok


_emission = st.tuples(
    st.integers(min_value=0, max_value=6),  # doc_id
    st.integers(min_value=0, max_value=2),  # band_id
    st.integers(min_value=0, max_value=6),  # first_doc (clamped below)
)


@given(
    emissions=st.lists(_emission, min_size=1, max_size=24),
    dup_idx=st.lists(
        st.integers(min_value=0, max_value=23), max_size=8
    ),
)
@settings(**SETTINGS)
def test_neardup_fold_depends_only_on_band_minima(
    spark, emissions, dup_idx
):
    # clamp: a bucket's running min can never exceed the arriving doc
    base = [
        (d, b, min(f, d)) for d, b, f in emissions
    ]
    # redelivery: duplicate some emissions with an equal-or-TIGHTER
    # first_doc (the only way a later copy can differ — the bucket min
    # is monotone non-increasing)
    redelivered = list(base)
    for i in dup_idx:
        d, b, f = base[i % len(base)]
        redelivered.append((d, b, max(0, f - 1) if f else 0))
    # canonical: one row per (doc, band) at the tightest min
    tight = {}
    for d, b, f in redelivered:
        tight[(d, b)] = min(tight.get((d, b), f), f)
    canonical = [(d, b, f) for (d, b), f in tight.items()]

    docs = spark.createDataFrame(
        [(d, "s") for d in sorted({e[0] for e in base})],
        "doc_id long, source string",
    )
    key = lambda r: (r.doc_id, r.admitted, r.evicted_by, r.n_stale_bands)
    got = sorted(
        map(
            key,
            neardup_verdicts(
                spark.createDataFrame(redelivered, BAND_EMIT_SCHEMA),
                docs,
            ).collect(),
        )
    )
    want = sorted(
        map(
            key,
            neardup_verdicts(
                spark.createDataFrame(canonical, BAND_EMIT_SCHEMA),
                docs,
            ).collect(),
        )
    )
    assert got == want
