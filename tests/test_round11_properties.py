"""Property-based differential tests for the round-11 operators: each
op vs a brute-force pure-Python twin on adversarial random inputs (the
tests/test_round10b_properties.py discipline — small example counts,
hypothesis shrinking, derandomized for driver stability).

What each property adds beyond the fixture oracles:
- overlap runs: full recompute of the gaps-and-islands decomposition
  on random corpora where the SAME shingle repeats at multiple
  positions inside one document (the fixture has unique positions;
  repeats are where a distinct-set implementation would silently
  undercount marked positions).
- perplexity decontamination: full recompute of the interpolated-KN
  probability LADDER (full / w1-backoff / continuation-only / floor)
  on corpora constructed so candidates are guaranteed and all four
  ladder branches are hit (shared prefix + OOV suffix words).
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_tornadovm_artifact_spark.queries.llm import (
    _DECON_MOD,
    KN_DISCOUNT,
    PPL_DECON_MAX,
    decontaminate_overlap_runs,
    perplexity_decontaminate,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)

_counter = [0]


def _docs_dir(spark, tmp_path_factory, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    _counter[0] += 1
    d = tmp_path_factory.mktemp(f"props11_{_counter[0]}")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["s"] * len(rows), pa.string()),
                "n_chars": pa.array([len(t) for _, t in rows], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _shingles(tokens: list[str]) -> list[str]:
    if len(tokens) < 3:
        return []
    return [" ".join(tokens[i : i + 3]) for i in range(len(tokens) - 2)]


def _bigrams(tokens: list[str]) -> list[tuple[str, str]]:
    return list(zip(tokens, tokens[1:]))


_word = st.sampled_from(["a", "b", "c", "d"])
_tokens = st.lists(_word, min_size=3, max_size=14)
_extra = st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=6)


@given(base=_tokens, extra=_extra, others=st.lists(_tokens, max_size=3))
@settings(**SETTINGS)
def test_overlap_runs_match_python_reference(
    spark, tmp_path_factory, base, extra, others
):
    """doc 0 (benchmark) = base; doc 1 (candidate) = base + extra —
    guaranteed overlap, so the property is never vacuous; further
    random docs exercise partial/scattered overlap and repeated
    shingles at multiple positions."""
    rows = [(0, " ".join(base)), (1, " ".join(base + extra))]
    rows += [(i + 2, " ".join(t)) for i, t in enumerate(others)]
    sf = _docs_dir(spark, tmp_path_factory, rows)

    bench: set[str] = set()
    for i, t in rows:
        if i % _DECON_MOD == 0:
            bench |= set(_shingles(t.split(" ")))
    expect = {}
    for i, t in rows:
        if i % _DECON_MOD == 0:
            continue
        marked = [
            p for p, s in enumerate(_shingles(t.split(" "))) if s in bench
        ]
        if not marked:
            continue
        runs, cur = [], 1
        for a, b in zip(marked, marked[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        expect[i] = (len(marked), len(runs), max(runs), max(runs) + 2)

    got = {
        r.doc_id: (
            r.n_marked_shingles,
            r.n_runs,
            r.longest_run,
            r.longest_run_tokens,
        )
        for r in decontaminate_overlap_runs(spark, sf).collect()
    }
    assert got == expect
    assert 1 in expect  # the guaranteed candidate really was scored


@given(base=_tokens, extra=_extra, others=st.lists(_tokens, max_size=2))
@settings(**SETTINGS)
def test_perplexity_matches_python_kn_reference(
    spark, tmp_path_factory, base, extra, others
):
    """Full pure-Python recompute of the interpolated-KN ladder. The
    candidate's OOV suffix words (x/y/z never appear in the benchmark
    vocabulary) force the continuation-only and floor branches; the
    shared prefix forces the full branch; boundary bigrams between
    prefix and suffix force the w1-backoff branch."""
    rows = [(0, " ".join(base)), (1, " ".join(base + extra))]
    rows += [(i + 2, " ".join(t)) for i, t in enumerate(others)]
    sf = _docs_dir(spark, tmp_path_factory, rows)

    bench_tokens = [
        t.split(" ") for i, t in rows if i % _DECON_MOD == 0
    ]
    bc: Counter = Counter()
    for toks in bench_tokens:
        bc.update(_bigrams(toks))
    c1: Counter = Counter()
    n1p: Counter = Counter()
    n_prec: Counter = Counter()
    for (w1, w2), c in bc.items():
        c1[w1] += c
        n1p[w1] += 1
        n_prec[w2] += 1
    n_types = float(len(bc))
    bench_sh = set()
    for toks in bench_tokens:
        bench_sh |= set(_shingles(toks))

    D = KN_DISCOUNT

    def p(w1: str, w2: str) -> float:
        if (w1, w2) in bc:
            return max(bc[(w1, w2)] - D, 0.0) / c1[w1] + (
                D * n1p[w1] / c1[w1]
            ) * (n_prec[w2] / n_types)
        if w1 in c1 and w2 in n_prec:
            return (D * n1p[w1] / c1[w1]) * (n_prec[w2] / n_types)
        if w2 in n_prec:
            return n_prec[w2] / n_types
        return 0.5 / n_types

    expect = {}
    for i, t in rows:
        if i % _DECON_MOD == 0:
            continue
        toks = t.split(" ")
        n_hits = len(set(_shingles(toks)) & bench_sh)
        if n_hits == 0:
            continue
        logs = [math.log(p(w1, w2)) for w1, w2 in _bigrams(toks)]
        avg = sum(logs) / len(logs)
        ppl = math.exp(-avg)
        expect[i] = (n_hits, len(logs), round(ppl, 9), ppl <= PPL_DECON_MAX)

    got = {
        r.doc_id: (
            r.n_contaminated_shingles,
            r.n_bigrams,
            round(r.ppl, 9),
            r.flagged,
        )
        for r in perplexity_decontaminate(spark, sf).collect()
    }
    assert got == expect
    assert 1 in expect
