"""Semantic pins for the round-11 operators (the driver differential
checks Spark == DuckDB; these check the operators mean what they claim):

- quality_classifier_score: the distributed GD kernel matches the
  NumPy twin bit-for-bit on the same features (the judge-mandated
  differential), and the learned soft score actually SEPARATES the
  weak classes (not the all-majority degenerate fit the unscaled
  features produced — agreement must beat the base rate).
- perplexity_decontaminate: the candidate set is EXACTLY the exact
  screen's hits (no benchmark docs, nothing extra), perplexities are
  finite and >= 1-ish sane, and a verbatim benchmark copy scores far
  lower perplexity than an overlap-only word-salad candidate (the
  reason the soft screen exists).
- multimodal_audio_window_panel: window count/stride/offset arithmetic
  verified row-by-row, and every emitted amplitude/checksum recomputed
  in plain Python from the document text (a third engine beyond the
  Spark/DuckDB differential).
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from flink_tornadovm_artifact_spark.queries.llm import (
    _DECON_MOD,
    AUDIO_WINDOW_MAX,
    _AUDIO_MIN_LEN,
    multimodal_audio_window_panel,
    perplexity_decontaminate,
    text_decontaminate,
)
from flink_tornadovm_artifact_spark.queries.pipeline import (
    QC_ITERS,
    QC_LR,
    _qc_data,
    quality_classifier_score,
)

from .conftest import SF_ORACLE, SF_SMOKE


# ---------------------------------------------------------------------------
# quality_classifier_score
# ---------------------------------------------------------------------------
def test_qc_kernel_matches_numpy_twin(spark):
    """The distributed Arrow-batched GD (functions/logreg.train) on the
    z-scored feature frame must reproduce the single-machine NumPy
    recurrence exactly (same math, same iteration count)."""
    from flink_tornadovm_artifact_spark.functions.logreg import (
        train,
        train_numpy,
    )

    data = _qc_data(spark, SF_ORACLE)
    w = train(data, dim=6, iterations=QC_ITERS, lr=QC_LR)
    rows = data.collect()
    x = np.stack([np.array(r.features) for r in rows])
    y = np.array([r.label for r in rows])
    wn = train_numpy(x, y, iterations=QC_ITERS, lr=QC_LR)
    assert np.abs(w - wn).max() < 1e-12, (w, wn)


def test_qc_scores_separate_weak_classes(spark):
    """The classifier must beat the majority-class base rate and rank
    weak-pass docs above weak-fail docs on average — the degenerate
    all-majority fit (which the unscaled features produced at exactly
    the base rate) is a red test here."""
    out = quality_classifier_score(spark, SF_ORACLE).collect()
    n = len(out)
    pos = [r.quality_score for r in out if r.weak_pass == 1]
    neg = [r.quality_score for r in out if r.weak_pass == 0]
    assert pos and neg, "fixture corpus lost one of the weak classes"
    base = max(len(pos), len(neg)) / n
    agree = sum(1 for r in out if r.pred_pass == (r.weak_pass == 1)) / n
    assert agree > base + 0.05, (agree, base)
    assert sum(pos) / len(pos) > sum(neg) / len(neg) + 0.2
    for r in out:
        assert r.pred_pass == (r.quality_score >= 0.5)


# ---------------------------------------------------------------------------
# perplexity_decontaminate
# ---------------------------------------------------------------------------
def test_ppl_candidates_are_exactly_the_exact_screen_hits(spark):
    got = perplexity_decontaminate(spark, SF_ORACLE).collect()
    screen = {
        r.doc_id: r.n_contaminated_shingles
        for r in text_decontaminate(spark, SF_ORACLE).collect()
    }
    assert {r.doc_id for r in got} == set(screen)
    for r in got:
        assert r.doc_id % _DECON_MOD != 0  # never a benchmark doc
        assert r.n_contaminated_shingles == screen[r.doc_id]
        assert r.n_bigrams >= 1
        assert math.isfinite(r.ppl) and r.ppl > 0
        assert abs(r.ppl - math.exp(-r.avg_logp)) < 1e-9


def test_ppl_verbatim_benchmark_copy_scores_low(spark, tmp_path):
    """A verbatim copy of a benchmark document must score far lower
    perplexity under the benchmark LM than a candidate that merely
    shares one shingle and is otherwise word salad — the discrimination
    the soft screen adds over the exact join (which counts both as
    contaminated)."""
    bench = (
        "the model is evaluated on held out questions and the answers "
        "are graded by exact match over the normalized answer string"
    )
    salad = (
        "the model is evaluated zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 "
        "zq10 zq11 zq12 zq13 zq14 zq15 zq16"
    )
    docs = [
        (0, bench),  # 0 % _DECON_MOD == 0 -> the benchmark split
        (1, bench),  # verbatim contamination
        (2, salad),  # one shared shingle, rest OOV
    ]
    d = tmp_path / "ppl_docs"
    d.mkdir()
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in perplexity_decontaminate(spark, str(d)).collect()}
    assert set(got) == {1, 2}, got
    assert got[1].ppl < got[2].ppl / 5, (got[1].ppl, got[2].ppl)
    assert got[1].flagged


# ---------------------------------------------------------------------------
# multimodal_audio_window_panel
# ---------------------------------------------------------------------------
def test_audio_window_arithmetic_and_python_recompute(spark):
    rows = multimodal_audio_window_panel(spark, SF_SMOKE).collect()
    assert rows
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r.doc_id].append(r)
    for doc_id, rs in per_doc.items():
        text = docs[doc_id]
        assert len(text) >= _AUDIO_MIN_LEN
        n_win = 4 + doc_id % 13
        stride = (n_win + AUDIO_WINDOW_MAX - 1) // AUDIO_WINDOW_MAX
        span = len(text) // n_win
        expect_idx = list(range(0, n_win, stride))
        assert len(rs) <= AUDIO_WINDOW_MAX
        assert sorted(r.win_idx for r in rs) == expect_idx
        for r in rs:
            assert r.n_windows == n_win
            assert r.win_samples == span
            assert r.win_offset == r.win_idx * span < len(text)
            probes = [
                ord(text[r.win_idx * span + (i * span) // 8])
                for i in range(8)
            ]
            assert r.amp_peak == max(probes)
            assert r.amp_sum == sum(probes)
            assert r.win_checksum == sum(
                x * (i + 1) for i, x in enumerate(probes)
            )


def test_audio_short_docs_are_excluded(spark):
    rows = multimodal_audio_window_panel(spark, SF_SMOKE).collect()
    short = {
        r.doc_id
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if len(r.text) < _AUDIO_MIN_LEN
    }
    assert not short & {r.doc_id for r in rows}


# ---------------------------------------------------------------------------
# quality_calibration_panel
# ---------------------------------------------------------------------------
def test_calibration_panel_recomputes_from_scores(spark):
    """The reliability table must be an exact re-binning of the
    classifier's own scored frame: bins partition the corpus, per-bin
    means match a Python recompute, and the single ECE value equals the
    count-weighted gap mean of the emitted rows."""
    from flink_tornadovm_artifact_spark.queries.pipeline import (
        QC_CAL_BINS,
        quality_calibration_panel,
    )

    scored = quality_classifier_score(spark, SF_ORACLE).collect()
    panel = quality_calibration_panel(spark, SF_ORACLE).collect()
    assert sum(r.n_docs for r in panel) == len(scored)
    by_bin = defaultdict(list)
    for r in scored:
        b = min(int(r.quality_score * QC_CAL_BINS), QC_CAL_BINS - 1)
        by_bin[b].append(r)
    assert {r.bin for r in panel} == set(by_bin)
    for r in panel:
        docs = by_bin[r.bin]
        assert r.n_docs == len(docs)
        assert abs(r.mean_confidence - sum(d.quality_score for d in docs) / len(docs)) < 1e-9
        assert abs(r.empirical_pass_rate - sum(d.weak_pass for d in docs) / len(docs)) < 1e-9
        assert abs(r.calibration_gap - abs(r.mean_confidence - r.empirical_pass_rate)) < 1e-12
    ece = sum(r.n_docs * r.calibration_gap for r in panel) / sum(
        r.n_docs for r in panel
    )
    for r in panel:
        assert abs(r.ece - ece) < 1e-9


# ---------------------------------------------------------------------------
# decontaminate_verdict_panel
# ---------------------------------------------------------------------------
def test_verdict_panel_fuses_the_three_screens(spark):
    """The fusion must preserve each screen's own rows: the doc set is
    exactly the Bloom superset, every exact hit appears with its count
    and a confirmed/overlap verdict, and Bloom-only rows are honest
    screen_fp rows (zero exact hits, NULL perplexity — nothing was
    scored)."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        PPL_DECON_MAX,
        bloom_decontaminate_screen,
        decontaminate_verdict_panel,
    )

    panel = {r.doc_id: r for r in decontaminate_verdict_panel(spark, SF_ORACLE).collect()}
    bloom = {r.doc_id for r in bloom_decontaminate_screen(spark, SF_ORACLE).collect()}
    exact = {
        r.doc_id: r.n_contaminated_shingles
        for r in text_decontaminate(spark, SF_ORACLE).collect()
    }
    ppl = {r.doc_id: r for r in perplexity_decontaminate(spark, SF_ORACLE).collect()}
    assert set(panel) == bloom
    assert set(exact) <= bloom  # the one-sided no-false-negative invariant
    for doc_id, r in panel.items():
        if doc_id in exact:
            assert r.n_exact_hits == exact[doc_id]
            assert r.ppl is not None
            want = (
                "confirmed" if ppl[doc_id].ppl <= PPL_DECON_MAX else "overlap"
            )
            assert r.verdict == want, (doc_id, r.verdict, want)
        else:
            assert r.n_exact_hits == 0
            assert r.ppl is None
            assert r.verdict == "screen_fp"
    assert any(r.verdict == "confirmed" for r in panel.values())


# ---------------------------------------------------------------------------
# decontaminate_overlap_runs
# ---------------------------------------------------------------------------
def test_overlap_runs_gaps_and_islands(spark, tmp_path):
    """Hand-built fixture: a candidate embedding one verbatim 10-token
    benchmark passage (→ an 8-shingle run) plus one isolated shared
    shingle far away must report exactly two runs with longest_run 8
    (10 tokens); a scatter-only candidate reports longest_run 1. The
    depth metric must distinguish these even though the count-based
    screen sees similar totals."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        decontaminate_overlap_runs,
    )

    bench_words = [f"b{i}" for i in range(10)]  # the benchmark passage
    bench = " ".join(bench_words + ["tail1 tail2 tail3"])
    # candidate 1: filler, the verbatim 10-token passage, filler,
    # then ONE isolated benchmark shingle (b0 b1 b2) surrounded by junk
    cand1 = (
        "x1 x2 x3 x4 "
        + " ".join(bench_words)
        + " y1 y2 y3 y4 y5 b0 b1 b2 z1 z2"
    )
    # candidate 2: the same shared shingles but all scattered
    cand2 = " ".join(
        f"{w} junk{i}a junk{i}b" for i, w in enumerate(["b0 b1 b2"] * 2)
    )
    docs = [(0, bench), (1, cand1), (2, cand2)]
    d = tmp_path / "runs_docs"
    d.mkdir()
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in decontaminate_overlap_runs(spark, str(d)).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1.longest_run == 8  # 10 verbatim tokens = 8 word-3-shingles
    assert r1.longest_run_tokens == 10
    assert r1.n_runs == 2
    assert r1.n_marked_shingles == 9
    r2 = got[2]
    assert r2.longest_run == 1
    assert r2.n_runs == r2.n_marked_shingles


def test_overlap_runs_cover_exact_screen_candidates(spark):
    """Every exact-screen candidate has a runs row (same semi-join
    universe), marked totals match the screen's counts, and the run
    decomposition is internally consistent."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        decontaminate_overlap_runs,
    )

    runs = {r.doc_id: r for r in decontaminate_overlap_runs(spark, SF_ORACLE).collect()}
    screen = {
        r.doc_id: r.n_contaminated_shingles
        for r in text_decontaminate(spark, SF_ORACLE).collect()
    }
    assert set(runs) == set(screen)
    for doc_id, r in runs.items():
        assert r.longest_run <= r.n_marked_shingles
        assert r.n_runs <= r.n_marked_shingles
        assert r.longest_run_tokens == r.longest_run + 2
