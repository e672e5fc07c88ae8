"""Quality tests for the ANN scale paths: the approximate variants must
actually recall the brute-force neighbors on the testdata (deterministic,
so thresholds are stable pins, not flaky bounds)."""

from __future__ import annotations

from flink_tornadovm_artifact_spark.queries.llm import (
    similarity_ivf,
    similarity_topk,
)

from .conftest import SF_ORACLE, SF_SMOKE


def _top5(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark):
    truth = _top5(similarity_topk(spark, SF_SMOKE))
    approx = _top5(similarity_ivf(spark, SF_SMOKE))
    assert set(approx) == set(truth)
    recalls = [len(approx[q] & truth[q]) / 5 for q in truth]
    # measured 0.8-1.0 on the deterministic testdata; 0.6 guards regressions
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_approx_aggregates_error_bound(spark):
    """q49's registered output is the tolerance-banded verdict (round 10:
    the sketch values themselves are engine-specific, the booleans and
    exact anchors are not). The sketches must actually track the exact
    answers — every within-band boolean TRUE — and the exact anchors
    must equal an independent exact recompute."""
    from pyspark.sql import functions as F

    from flink_tornadovm_artifact_spark.queries.relational import (
        q49_approx_aggregates,
    )
    from flink_tornadovm_artifact_spark.tables import load

    got = {
        r["l_returnflag"]: r for r in q49_approx_aggregates(spark, SF_SMOKE).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in load(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k in exact:
        assert got[k]["nd_within_band"], k
        assert got[k]["p50_within_band"], k
        assert got[k]["exact_nd"] == exact[k]["nd"], k
        assert abs(got[k]["exact_p50"] - exact[k]["p50"]) < 1e-9, k
    # the 100 TB flip (audit=False): sketch-only production form — same
    # sketch values, no exact legs in the plan
    prod = {
        r["l_returnflag"]: r
        for r in q49_approx_aggregates(spark, SF_SMOKE, audit=False).collect()
    }
    assert set(prod) == set(got)
    assert set(prod[next(iter(prod))].asDict()) == {
        "l_returnflag",
        "apx_nd",
        "apx_p50",
        "cnt",
    }
    for k, r in prod.items():
        assert r["cnt"] == got[k]["cnt"], k


def test_q19_outliers_fire_on_injected_spike(spark, tmp_path):
    """The round-2 verdict flagged q19 as vacuously green (0 rows from
    both engines). This pins the predicate the hard way: a fixture with a
    flat per-(user, day) series plus one injected spike must return
    exactly the spike row."""
    import datetime as dt

    from flink_tornadovm_artifact_spark.queries.iot import q19_iot_outliers

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1, one day: 20 flat readings around 50 ± 1, one 500 spike
        (i, base + dt.timedelta(minutes=30 * i), 1, "reading",
         50.0 + (i % 3) - 1.0, "{}")
        for i in range(20)
    ]
    rows.append((99, base + dt.timedelta(hours=12), 1, "reading", 500.0, "{}"))
    # user 2: too few points for a stddev (n=1 -> sd NULL, never fires)
    rows.append((200, base, 2, "reading", 9999.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = q19_iot_outliers(spark, str(tmp_path)).collect()
    assert [r["event_id"] for r in got] == [99]
    assert got[0]["value"] == 500.0


def test_q19_discriminating_at_oracle_sf(spark):
    """Guards against the vacuous-green regression: the oracle-checked
    predicate must actually fire on the driver's sf0.01 fixture."""
    from flink_tornadovm_artifact_spark.queries.iot import q19_iot_outliers

    from .conftest import SF_ORACLE

    assert q19_iot_outliers(spark, SF_ORACLE).count() > 0


def test_count_min_sketch_overestimates(spark):
    """The CMS contract: for any token, min over rows of its bucket
    count >= the exact corpus frequency (equality when no collision)."""
    from collections import Counter

    from flink_tornadovm_artifact_spark.queries.llm import (
        CMS_DEPTH,
        CMS_WIDTH,
        sketch_count_min_tokens,
    )
    from flink_tornadovm_artifact_spark.tables import load

    sketch = {
        (r.row_id, r.bucket): r.cnt
        for r in sketch_count_min_tokens(spark, SF_SMOKE).collect()
    }
    docs = load(spark, SF_SMOKE, "documents").select("text").collect()
    exact = Counter(t for r in docs for t in r.text.split(" "))
    import hashlib

    def bucket(tok, i):
        h = hashlib.md5(f"{tok}#cms{i}".encode()).hexdigest()[:8]
        return int(h, 16) % CMS_WIDTH

    sample = list(exact.items())[:20]
    checked = 0
    for tok, n in sample:
        est = min(
            sketch.get((i, bucket(tok, i)), 0) for i in range(CMS_DEPTH)
        )
        assert est >= n, (tok, est, n)
        checked += 1
    assert checked == len(sample) > 0
    # total mass per row equals the token count (sketch conservation)
    total = sum(exact.values())
    for i in range(CMS_DEPTH):
        assert sum(v for (ri, _), v in sketch.items() if ri == i) == total


def test_hll_estimate_tracks_exact_distinct(spark):
    """The HLL register table must reconstruct the true distinct token
    count: harmonic-mean estimate with the standard small-range
    linear-counting correction (Flajolet et al. 2007 §4), within the
    sketch's theoretical error (1.04/sqrt(512) ≈ 4.6%; 15% pin covers
    the small-cardinality regime of the testdata)."""
    import math

    from flink_tornadovm_artifact_spark.queries.llm import (
        HLL_BUCKETS,
        sketch_hyperloglog_tokens,
    )
    from flink_tornadovm_artifact_spark.tables import load

    regs = {
        r.bucket: r.rho_max
        for r in sketch_hyperloglog_tokens(spark, SF_SMOKE).collect()
    }
    m = HLL_BUCKETS
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    est = alpha * m * m / s
    zeros = m - len(regs)
    if est < 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    docs = load(spark, SF_SMOKE, "documents").select("text").collect()
    exact = len({t for r in docs for t in r.text.split(" ")})
    assert abs(est - exact) / exact < 0.15, (est, exact)


def test_hll_registers_insert_invariant(spark):
    """max-registers must not change when every token is inserted twice
    (the mergeability/idempotence property that lets partial sketches
    union across partitions and days)."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        sketch_hyperloglog_tokens,
    )

    once = sorted(
        (r.bucket, r.rho_max)
        for r in sketch_hyperloglog_tokens(spark, SF_SMOKE).collect()
    )
    # doubling the corpus == unioning the sketch with itself
    from flink_tornadovm_artifact_spark.tables import load
    from pyspark.sql import functions as F

    docs = load(spark, SF_SMOKE, "documents")
    doubled = docs.unionAll(docs)
    tmp = doubled.select(F.explode(F.split("text", " ")).alias("t"))
    # reuse the query's own expressions by re-running it over a view of
    # the doubled frame: register max is reached either way
    import flink_tornadovm_artifact_spark.queries.llm as llm

    bucket = llm._md5_bucket(F.col("t"), "#hllb", llm.HLL_BUCKETS).cast("int")
    whex = F.substring(F.md5(F.concat(F.col("t"), F.lit("#hllw"))), 1, 12)
    stripped = F.regexp_replace(whex, "^0+", "")
    ln = F.length(stripped)
    first = F.substring(stripped, 1, 1)
    bits_first = (
        F.when(first == "1", 1)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 3)
        .otherwise(4)
    )
    rho = F.when(ln == 0, F.lit(49)).otherwise(
        49 - (4 * (ln - 1) + bits_first)
    )
    twice = sorted(
        (r.bucket, r.rho_max)
        for r in tmp.select(
            bucket.alias("bucket"), rho.cast("int").alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("rho_max"))
        .collect()
    )
    assert once == twice


def test_domain_cap_plans_window_group_limit(spark):
    """The rank-limit filter must reach the WindowGroupLimit physical
    optimization (per-task top-N heaps BEFORE the shuffle) — without it
    a giant domain sorts its full page list on one task."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        DOMAIN_CAP_N,
        text_domain_cap,
    )

    df = text_domain_cap(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    rows = df.collect()
    per_source = {}
    for r in rows:
        per_source[r.source] = per_source.get(r.source, 0) + 1
        assert 1 <= r.rk <= DOMAIN_CAP_N
    assert per_source and max(per_source.values()) <= DOMAIN_CAP_N


def test_train_split_partitions_and_proportions(spark):
    """Splits must partition the corpus exactly (no doc lost or double
    counted) and land near 80/10/10 (hash uniformity; wide tolerance
    for the small fixture)."""
    from flink_tornadovm_artifact_spark.queries.llm import corpus_train_split
    from flink_tornadovm_artifact_spark.tables import load

    rows = corpus_train_split(spark, SF_SMOKE).collect()
    total = load(spark, SF_SMOKE, "documents").count()
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert sum(by_split.values()) == total
    assert set(by_split) == {"train", "val", "test"}
    assert 0.70 <= by_split["train"] / total <= 0.90


def test_stratified_sample_equalizes_languages(spark):
    """The smallest language is kept in full (frac = 1) and every other
    language's kept count concentrates around that same size."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        sample_stratified_lang,
    )
    from flink_tornadovm_artifact_spark.tables import load

    kept = {}
    for r in sample_stratified_lang(spark, SF_SMOKE).collect():
        kept[r.lang] = kept.get(r.lang, 0) + 1
    full = {}
    for r in load(spark, SF_SMOKE, "documents").select("lang").collect():
        full[r.lang] = full.get(r.lang, 0) + 1
    mn_lang = min(full, key=full.get)
    mn = full[mn_lang]
    assert kept[mn_lang] == mn  # frac = 1 keeps everything
    for lang, k in kept.items():
        assert abs(k - mn) <= max(3, 0.5 * mn), (lang, k, mn)


def test_dedup_incremental_is_discriminating(spark):
    """Some incoming docs must actually be dropped (prefix-fingerprint
    collision with the corpus) and every kept doc is from the incoming
    batch — guards against the filter quietly matching nothing."""
    from flink_tornadovm_artifact_spark.queries.llm import dedup_incremental
    from flink_tornadovm_artifact_spark.tables import load

    kept = dedup_incremental(spark, SF_ORACLE).collect()
    incoming_n = (
        load(spark, SF_ORACLE, "documents").filter("doc_id % 10 = 0").count()
    )
    assert 0 < len(kept) < incoming_n
    assert all(r.doc_id % 10 == 0 for r in kept)


def _py_dup_passages(texts, k):
    """Pure-Python reference for the passage machinery: returns
    {doc_idx: (n_spans, dup_tokens)} plus the duplicated-hash → sources
    map, independently of any SQL engine."""
    import hashlib
    from collections import Counter

    win = {}  # (doc, pos) -> digest
    counts = Counter()
    for d, text in enumerate(texts):
        toks = text.split(" ")
        for i in range(len(toks) - k + 1):
            h = hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
            win[(d, i)] = h
            counts[h] += 1
    per_doc = {}
    for d in range(len(texts)):
        poss = sorted(
            p for (dd, p), h in win.items() if dd == d and counts[h] >= 2
        )
        spans = []
        for p in poss:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            else:
                spans.append([p, p + k - 1])
        if spans:
            per_doc[d] = (
                len(spans),
                sum(e - s + 1 for s, e in spans),
            )
    return per_doc, win, counts


def test_duplicate_passages_matches_python_reference(spark):
    """Differential against a from-scratch Python implementation of
    window-hash → count>=2 → interval-merge at the smoke SF: the
    (source, lang) dup_tokens totals must agree exactly."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        PASSAGE_K,
        text_duplicate_passages,
    )
    from flink_tornadovm_artifact_spark.tables import load

    docs = sorted(
        load(spark, SF_SMOKE, "documents")
        .select("doc_id", "source", "lang", "text")
        .collect(),
        key=lambda r: r.doc_id,
    )
    per_doc, _, _ = _py_dup_passages([r.text for r in docs], PASSAGE_K)
    expected = {}
    for i, r in enumerate(docs):
        key = (r.source, r.lang)
        got = per_doc.get(i)
        e = expected.setdefault(key, [0, 0, 0])
        if got:
            e[0] += 1
            e[1] += got[0]
            e[2] += got[1]
    rows = text_duplicate_passages(spark, SF_SMOKE).collect()
    assert any(r.dup_tokens > 0 for r in rows)  # discriminating
    for r in rows:
        exp = expected.get((r.source, r.lang), [0, 0, 0])
        assert (r.docs_with_dup, r.dup_spans, r.dup_tokens) == tuple(exp), (
            r.source,
            r.lang,
        )
        assert 0.0 <= r.dup_token_frac <= 1.0


def test_source_overlap_matches_python_reference(spark):
    """The overlap matrix equals the Python-reference pairwise count of
    shared duplicated window hashes under the same hub cap."""
    from collections import Counter

    from flink_tornadovm_artifact_spark.queries.llm import (
        OVERLAP_MAX_SOURCES,
        PASSAGE_K,
        source_overlap_matrix,
    )
    from flink_tornadovm_artifact_spark.tables import load

    docs = (
        load(spark, SF_SMOKE, "documents")
        .select("source", "text")
        .collect()
    )
    _, win, counts = _py_dup_passages([r.text for r in docs], PASSAGE_K)
    srcs_of = {}
    for (d, _), h in win.items():
        srcs_of.setdefault(h, set()).add(docs[d].source)
    expected = Counter()
    for h, srcs in srcs_of.items():
        if counts[h] >= 2 and 2 <= len(srcs) <= OVERLAP_MAX_SOURCES:
            ss = sorted(srcs)
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    expected[(ss[i], ss[j])] += 1
    got = {
        (r.source_a, r.source_b): r.shared_passages
        for r in source_overlap_matrix(spark, SF_SMOKE).collect()
    }
    assert got == dict(expected)
    for a, b in got:
        assert a < b


def test_quantize_int8_error_bound(spark):
    """Round-to-nearest scalar quantization can never miss by more than
    half a step: max_abs_err <= scale/2 (+ float slack); every dimension
    of every vector is covered."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        embedding_quantize_int8,
    )
    from flink_tornadovm_artifact_spark.tables import load

    rows = embedding_quantize_int8(spark, SF_SMOKE).collect()
    n_vecs = load(spark, SF_SMOKE, "embeddings").count()
    assert len(rows) == 64
    for r in rows:
        assert r.n_values == n_vecs
        assert r.hi > r.lo and r.scale > 0
        assert r.max_abs_err <= r.scale / 2 + 1e-12, r.dim
        assert 0 <= r.mean_abs_err <= r.max_abs_err


def test_bpe_merge_fold_greedy_semantics(spark):
    """The F.aggregate fold must implement greedy left-to-right
    NON-OVERLAPPING replacement — the classic 'aaa' + (a,a) case keeps
    the third symbol unmerged."""
    from pyspark.sql import functions as F

    from flink_tornadovm_artifact_spark.queries.llm import _bpe_merge_fold

    df = spark.createDataFrame(
        [
            (1, ["a", "a", "a"]),
            (2, ["b", "a", "a", "b"]),
            (3, ["a", "a", "a", "a"]),
            (4, ["x"]),
            (5, []),
        ],
        "id int, syms array<string>",
    )
    got = {
        r.id: r.m
        for r in df.select(
            "id", _bpe_merge_fold(F.col("syms"), "a", "a").alias("m")
        ).collect()
    }
    assert got == {
        1: ["aa", "a"],
        2: ["b", "aa", "b"],
        3: ["aa", "aa"],
        4: ["x"],
        5: [],
    }
    df2 = spark.createDataFrame(
        [(1, ["a", "a", "b", "b"])], "id int, syms array<string>"
    )
    assert df2.select(_bpe_merge_fold(F.col("syms"), "a", "b").alias("m")).collect()[
        0
    ].m == ["a", "ab", "b"]


def test_bpe_matches_python_reference(spark):
    """Third independent implementation: plain-Python BPE (dict loop,
    while-scan greedy merge) must produce the identical merge table at
    the smoke SF."""
    from collections import Counter

    from flink_tornadovm_artifact_spark.queries.llm import (
        BPE_N_MERGES,
        bpe_merge_table,
    )
    from flink_tornadovm_artifact_spark.tables import load

    freqs = Counter()
    for r in load(spark, SF_SMOKE, "documents").select("text").collect():
        for w in r.text.split(" "):
            if w:
                freqs[w] += 1
    words = {w: list(w) for w in freqs}
    expected = []
    for k in range(BPE_N_MERGES):
        counts = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += freqs[w]
        if not counts:
            break
        (a, b), c = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expected.append((k, a, b, c))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    got = [
        (r.step, r.lhs, r.rhs, r.pair_count)
        for r in sorted(
            bpe_merge_table(spark, SF_SMOKE).collect(), key=lambda r: r.step
        )
    ]
    assert got == expected


def test_mixture_weights_contract(spark):
    """Temperature weights must normalize to 1 and upsample
    low-resource sources relative to their raw share (alpha < 1)."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        MIX_BUDGET_EPOCHS,
        corpus_mixture_weights,
    )

    rows = corpus_mixture_weights(spark, SF_SMOKE).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-9
    mean_share = 1.0 / len(rows)
    for r in rows:
        # alpha=0.7 compresses toward uniform: below-mean sources gain
        # weight, above-mean sources lose it
        if r.raw_share < mean_share - 1e-12:
            assert r.weight > r.raw_share, r.source
        if r.raw_share > mean_share + 1e-12:
            assert r.weight < r.raw_share, r.source
        # epochs = budget x weight / raw_share
        assert abs(r.expected_epochs - MIX_BUDGET_EPOCHS * r.weight / r.raw_share) < 1e-9


def test_shard_manifest_contract(spark):
    """Shards must partition the exact-dedup keep-set: doc totals equal
    the distinct-digest count, shares sum to 1, skew = share x N."""
    from pyspark.sql import functions as F

    from flink_tornadovm_artifact_spark.queries.llm import (
        N_SHARDS,
        release_shard_manifest,
    )
    from flink_tornadovm_artifact_spark.tables import load

    rows = release_shard_manifest(spark, SF_SMOKE).collect()
    assert {r.shard for r in rows} <= set(range(N_SHARDS))
    n_keep = (
        load(spark, SF_SMOKE, "documents")
        .select(F.md5("text").alias("h"))
        .distinct()
        .count()
    )
    assert sum(r.n_docs for r in rows) == n_keep
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs(r.skew - r.token_share * N_SHARDS) < 1e-9


def test_bpe_fertility_contract(spark):
    """Fertility panel invariants: every corpus word is covered by the
    trained vocabulary (it was built FROM this corpus), fertility >= 1
    (a word is at least one subword) and <= avg word length (merges
    only shrink the character split)."""
    from flink_tornadovm_artifact_spark.queries.llm import bpe_encode_fertility

    rows = bpe_encode_fertility(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_subwords >= r.n_words >= 1, r.source
        assert 1.0 <= r.fertility, r.source
        assert r.chars_per_token >= 1.0, r.source


def test_covariance_panel_matches_numpy(spark):
    """Differential vs numpy's own covariance (population, ddof=0) at
    the smoke SF, plus the Cauchy-Schwarz bound on off-diagonals."""
    import numpy as np

    from flink_tornadovm_artifact_spark.queries.llm import (
        embedding_covariance_panel,
    )
    from flink_tornadovm_artifact_spark.tables import load

    X = np.array(
        [
            r.embedding
            for r in load(spark, SF_SMOKE, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    C = np.cov(X, rowvar=False, ddof=0)
    rows = embedding_covariance_panel(spark, SF_SMOKE).collect()
    d = X.shape[1]
    assert len(rows) == d * (d + 1) // 2
    tr = float(np.trace(C))
    for r in rows:
        assert r.j >= r.i
        got, want = r.cov, C[r.i - 1, r.j - 1]
        assert abs(got - want) < 1e-9, (r.i, r.j)
        if r.i == r.j:
            assert got > 0
            assert abs(r.var_share - want / tr) < 1e-9
        else:
            assert r.var_share is None
            bound = np.sqrt(C[r.i - 1, r.i - 1] * C[r.j - 1, r.j - 1])
            assert abs(got) <= bound + 1e-12


def test_hard_negatives_ivf_mode_recall_and_plan(spark):
    """The candidates='ivf' scale path (round 9): mining quality is
    HARDNESS, not argmax recall — a contrastive trainer needs negatives
    nearly as hard as the true top-K, not the exact top-K (DPR-style
    mining runs off approximate indexes for this reason, and different-
    label top-K sit far out where cells discriminate weakly: measured
    top-K recall here is 0.50 at 4 probes). Pins: per-anchor mean
    top-K cosine of the IVF negatives >= 0.7 of brute force (mean
    >= 0.85 across anchors; measured 0.81 min / 0.91 mean), every
    returned pair carries the EXACT brute-force cosine (candidate
    pruning, not score approximation), every anchor is answered, and
    the plan has no cartesian / broadcast-nested-loop node — the
    equi-join on cell_id IS the point."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        HARDNEG_K,
        similarity_hard_negatives,
    )

    exact = similarity_hard_negatives(spark, SF_SMOKE).collect()
    ivf_df = similarity_hard_negatives(spark, SF_SMOKE, candidates="ivf")
    plan = ivf_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    ivf = ivf_df.collect()
    exact_pairs = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    ivf_pairs = {(r.query_id, r.neighbor_id): r.cosine for r in ivf}
    # exactness: IVF never invents pairs with different scores
    for k, cos in ivf_pairs.items():
        if k in exact_pairs:
            assert abs(cos - exact_pairs[k]) < 1e-12
    # per-anchor recall of the brute-force top-K
    from collections import defaultdict

    by_q_exact, by_q_ivf = defaultdict(set), defaultdict(set)
    for (qid, nid) in exact_pairs:
        by_q_exact[qid].add(nid)
    for (qid, nid) in ivf_pairs:
        by_q_ivf[qid].add(nid)
    assert set(by_q_ivf) == set(by_q_exact)  # every anchor answered
    # hardness ratio: per anchor, mean of the top-K mined cosines vs
    # the brute-force top-K's
    def mean_topk(pairs, qid):
        cs = sorted(
            (c for (q, _), c in pairs.items() if q == qid), reverse=True
        )[:HARDNEG_K]
        return sum(cs) / len(cs)

    ratios = [
        mean_topk(ivf_pairs, qid) / mean_topk(exact_pairs, qid)
        for qid in by_q_exact
    ]
    assert min(ratios) >= 0.7, f"weakest anchor hardness ratio {min(ratios)}"
    assert sum(ratios) / len(ratios) >= 0.85
    # margins still carry the positive ceiling where a same-label
    # candidate exists in the probed cells
    assert any(r.pos_cos is not None for r in ivf)
