"""End-to-end curation-pipeline composition (round-9 depth item).

The registered LLM-pipeline operators are each verified in isolation by
the DuckDB differential; this test proves they COMPOSE as DataFrame
algebra the way a release actually runs them — one flowing frame

    documents → exact-dedup keep-set → quality gate → decontaminate
              → hash split → (train) sequence packing → shard manifest

with the conservation invariants a release engineer audits between
stages: representative-set size matches the dedup panel, the gate is
exact, no contaminated or benchmark doc survives, the split partitions
the survivors, packing conserves every token, and the manifest accounts
for every train doc with shares summing to 1. All stage definitions are
the REGISTERED operators' own (shared expressions / the operators
themselves joined by doc_id), so the pipeline cannot drift from what
the oracles verify.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window as W

from flink_tornadovm_artifact_spark.queries.llm import (
    _DECON_MOD,
    _md5_bucket,
    _split_expr,
    PACK_NSHARDS,
    PACK_SEQ_LEN,
    dedup_exact,
    text_decontaminate,
    text_quality_score,
)
from flink_tornadovm_artifact_spark.tables import load

from .conftest import SF_SMOKE

# p10 of the sf0.001 quality distribution (min 0.407, p10 0.425): a
# gate that provably drops SOME docs and keeps most
QUALITY_MIN = 0.425


@pytest.fixture(scope="module")
def stages(spark):
    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    )
    keep_ids = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = docs.join(keep_ids.select("doc_id"), "doc_id", "left_semi")
    quality = text_quality_score(spark, SF_SMOKE).select("doc_id", "quality")
    gated = kept.join(
        quality.filter(F.col("quality") >= QUALITY_MIN), "doc_id", "left_semi"
    )
    contaminated = text_decontaminate(spark, SF_SMOKE).select("doc_id")
    # release hygiene: drop contaminated docs AND the benchmark docs
    # themselves (they define the eval set, they are not training data)
    clean = gated.join(contaminated, "doc_id", "left_anti").filter(
        F.col("doc_id") % _DECON_MOD != 0
    )
    released = clean.withColumn("split", _split_expr(F.col("doc_id")))
    train = released.filter(F.col("split") == "train").select(
        "doc_id", F.size(F.split("text", " ")).alias("tk")
    )
    return {
        "docs": docs.cache(),
        "kept": kept.cache(),
        "gated": gated.cache(),
        "clean": clean.cache(),
        "released": released.cache(),
        "train": train.cache(),
    }


def test_dedup_stage_matches_registered_panel(spark, stages):
    panel = dedup_exact(spark, SF_SMOKE).collect()[0]
    assert stages["kept"].count() == panel.n_distinct
    # idempotent: re-deduping the keep-set finds no duplicate content
    redo = (
        stages["kept"]
        .groupBy(F.md5("text"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert redo == 1


def test_quality_gate_is_exact(spark, stages):
    quality = text_quality_score(spark, SF_SMOKE).select("doc_id", "quality")
    joined = stages["gated"].join(quality, "doc_id")
    assert joined.filter(F.col("quality") < QUALITY_MIN).count() == 0
    # and nothing above the gate was dropped from the kept set
    n_expected = (
        stages["kept"]
        .join(quality, "doc_id")
        .filter(F.col("quality") >= QUALITY_MIN)
        .count()
    )
    assert stages["gated"].count() == n_expected
    assert 0 < stages["gated"].count() < stages["kept"].count()


def test_decontamination_removes_all_offenders(spark, stages):
    contaminated = text_decontaminate(spark, SF_SMOKE).select("doc_id")
    assert stages["clean"].join(contaminated, "doc_id").count() == 0
    assert (
        stages["clean"].filter(F.col("doc_id") % _DECON_MOD == 0).count() == 0
    )
    assert stages["clean"].count() > 0


def test_split_partitions_survivors(stages):
    by_split = {
        r.split: r["count"]
        for r in stages["released"].groupBy("split").count().collect()
    }
    assert set(by_split) == {"train", "val", "test"}
    assert sum(by_split.values()) == stages["clean"].count()
    # the 80/10/10 hash split is stable: train strictly dominates
    assert by_split["train"] > by_split["val"]
    assert by_split["train"] > by_split["test"]


def test_packing_conserves_every_token(stages):
    train = stages["train"]
    d = train.select(
        "doc_id",
        "tk",
        _md5_bucket(F.col("doc_id").cast("string"), "#shard", PACK_NSHARDS)
        .cast("int")
        .alias("shard"),
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#pack"))),
            1,
            8,
        ).alias("h"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pos = d.withColumn("cum", F.sum("tk").over(w)).select(
        "shard",
        (F.col("cum") - F.col("tk")).alias("start"),
        F.col("cum").alias("end"),
    )
    L = PACK_SEQ_LEN
    spans = pos.filter(F.col("end") > F.col("start")).select(
        "shard",
        "start",
        "end",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / L),
                F.floor((F.col("end") - 1) / L),
            )
        ).alias("seq_id"),
    ).select(
        "shard",
        "seq_id",
        (
            F.least(F.col("end"), (F.col("seq_id") + 1) * L)
            - F.greatest(F.col("start"), F.col("seq_id") * L)
        ).alias("toks"),
    )
    packed = spans.groupBy("shard", "seq_id").agg(
        F.sum("toks").alias("n_tokens")
    )
    rows = packed.collect()
    # token conservation: every train token lands in exactly one span
    assert sum(r.n_tokens for r in rows) == (
        train.agg(F.sum("tk")).collect()[0][0]
    )
    # no sequence overflows its fixed length
    assert all(r.n_tokens <= L for r in rows)
    # sequences are contiguous per shard (0..max with no holes), and
    # every one but the last is FULL — the packing wastes nothing
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, {})[r.seq_id] = r.n_tokens
    for shard, seq_map in by_shard.items():
        ids = sorted(seq_map)
        assert ids == list(range(ids[-1] + 1)), shard
        assert all(seq_map[i] == L for i in ids[:-1]), shard


def test_manifest_accounts_for_every_train_doc(stages):
    train = stages["train"]
    per = (
        train.select(
            _md5_bucket(F.col("doc_id").cast("string"), "#shard", PACK_NSHARDS)
            .cast("int")
            .alias("shard"),
            "tk",
        )
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("tk").alias("n_tokens"))
    )
    rows = per.collect()
    assert sum(r.n_docs for r in rows) == train.count()
    total = sum(r.n_tokens for r in rows)
    shares = [r.n_tokens / total for r in rows]
    assert abs(sum(shares) - 1.0) < 1e-9
    # the md5 layout is reproducible: same bucketing expression, same
    # assignment on a re-read
    again = (
        train.select(
            _md5_bucket(F.col("doc_id").cast("string"), "#shard", PACK_NSHARDS)
            .cast("int")
            .alias("shard"),
            "tk",
        )
        .groupBy("shard")
        .agg(F.sum("tk").alias("n_tokens"))
    )
    assert {(r.shard, r.n_tokens) for r in again.collect()} == {
        (r.shard, r.n_tokens) for r in rows
    }


def test_crawl_and_tokenizer_stages_compose(spark, stages):
    """Round-10 stages compose with the release pipeline: the URL
    panel joins 1:1 onto the corpus (a crawl keys every doc by
    canonical URL + host BEFORE content dedup), canonical urls stay
    unique per doc (alias classes collapsed, payload preserved), host
    keys coincide with the source domains they derive from, and the
    tokenizer round-trip QA gate clears every source that reaches the
    released set (fidelity >= the release bar on this fixture)."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        tokenizer_roundtrip_qa,
    )
    from flink_tornadovm_artifact_spark.queries.pipeline import (
        url_canonicalize_hostdedup,
    )

    docs = stages["docs"]
    urls = url_canonicalize_hostdedup(spark, SF_SMOKE)
    assert docs.join(urls, "doc_id").count() == docs.count()
    assert urls.select("canon_url").distinct().count() == docs.count()
    n_hosts = urls.select("host_key").distinct().count()
    assert n_hosts == docs.select("source").distinct().count()
    # exactly one host representative per host key, also within the
    # composed frame
    assert (
        urls.filter(F.col("is_host_rep")).count() == n_hosts
    )
    qa = {
        r.source: r.roundtrip_fidelity
        for r in tokenizer_roundtrip_qa(spark, SF_SMOKE).collect()
    }
    released_sources = {
        r.source
        for r in stages["released"].select("source").distinct().collect()
    }
    assert released_sources <= set(qa)
    bar = 0.9  # release bar; fixture fidelity measured ~0.93 per source
    assert released_sources <= {s for s, f in qa.items() if f >= bar}


def test_normalize_dedup_and_epoch_order_compose(spark, tmp_path_factory):
    """Round-10 second-batch stages composed into the release flow:

    normalize (stage ZERO — the registered _text_norm_sql expression
    applied to the raw text) → exact dedup on the NORMALIZED hash →
    deterministic epoch ordering of the survivors (the epoch-shuffle
    operator's own pieces: sorted_rank + the affine permutation).

    The corpus is built to defeat raw exact dedup the way real crawl
    text does: the same sentence with NBSP / doubled-space / zero-width
    variants hashes to 4 distinct md5s raw, but ONE normalized class —
    the invariant that makes normalization a correctness stage, not
    cosmetics. A curly-quoted variant stays a separate class (quotes
    are folded to ASCII, not stripped), pinning that normalization is
    conservative."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_tornadovm_artifact_spark.operators.utils import sorted_rank
    from flink_tornadovm_artifact_spark.queries.llm import (
        _epoch_shuffle_prime,
        _text_norm_sql,
    )

    texts = [
        "hello world",
        "hello\u00a0world",
        "hello  world",
        "hello world\u200b",
        "totally different doc",
        "“hello world”",
    ]
    d = tmp_path_factory.mktemp("e2e_norm")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    sf = str(d)
    docs = load(spark, sf, "documents")

    # raw exact dedup is DEFEATED: all six texts hash distinct
    assert dedup_exact(spark, sf).collect()[0].n_distinct == len(texts)

    normed = docs.select(
        "doc_id", F.expr(_text_norm_sql("text", "")).alias("norm")
    )
    reps = normed.groupBy(F.md5("norm").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # normalized classes: the 4 whitespace variants collapse; the
    # distinct doc and the quote-folded variant stay separate
    assert reps.count() == 3
    survivors = docs.join(reps.select("doc_id"), "doc_id", "left_semi")
    assert {r.doc_id for r in survivors.select("doc_id").collect()} == {
        0,
        4,
        5,
    }

    # epoch ordering over the SURVIVORS, from the operator's own parts
    n = survivors.count()
    p = _epoch_shuffle_prime(n)
    ranked = sorted_rank(survivors.select("doc_id"), "doc_id", rank_col="rid")
    rows = ranked.select(
        "doc_id", ((F.lit(p) * F.col("rid")) % F.lit(n)).alias("pos")
    ).collect()
    assert sorted(r.pos for r in rows) == list(range(n))
