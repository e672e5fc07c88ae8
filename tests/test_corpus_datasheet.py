"""Dedicated datasheet tests (corpus_datasheet v1/v2/v3).

v2 landed in a round-5 snapshot commit with only the generic oracle
sweep covering it; these tests pin its SEMANTICS on a hand-built corpus
where every signal value is known by construction — lang-ID drift, the
exact-dup rate, the ANSI division edges (empty text, single-token doc),
and v3's near-dup rate against a known clustering.
"""

from __future__ import annotations

import math

import pytest

from flink_tornadovm_artifact_spark.queries.llm import (
    _datasheet_per_doc,
    corpus_datasheet_v2,
    corpus_datasheet_v3,
)

from .conftest import SF_ORACLE


def _write_docs(spark, tmp_path, rows):
    """Materialize a documents.parquet with the production schema so
    queries can load it via their normal sf_dir path."""
    df = spark.createDataFrame(
        [(i, src, lang, t, len(t)) for i, (src, lang, t) in enumerate(rows)],
        "doc_id long, source string, lang string, text string, n_chars long",
    )
    d = str(tmp_path / "ds")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_datasheet_v2_known_corpus(spark, tmp_path):
    # web/en: 3 docs — two byte-identical (exact dups), one clean;
    # all genuinely English so lang-ID agrees.
    # web/de: 2 docs — one real German, one ENGLISH text mislabeled
    #         "de" (the drift case: pred_lang=en != lang).
    rows = [
        ("web", "en", "the cat and the dog of a king"),
        ("web", "en", "the cat and the dog of a king"),
        ("web", "en", "a quiet morning in the old town"),
        ("web", "de", "der hund und die katze und das haus"),
        ("web", "de", "the mislabeled english text of a crawl"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        (r["source"], r["lang"]): r.asDict()
        for r in corpus_datasheet_v2(spark, sf).collect()
    }
    en, de = out[("web", "en")], out[("web", "de")]
    assert en["n_docs"] == 3 and de["n_docs"] == 2
    # exact-dup rate: 2 of the 3 en docs share a digest; no de dups
    assert en["exact_dup_frac"] == pytest.approx(2 / 3)
    assert de["exact_dup_frac"] == 0.0
    # lang-ID drift: all en docs agree; only 1 of 2 "de" docs is German
    assert en["lang_id_match_frac"] == 1.0
    assert de["lang_id_match_frac"] == pytest.approx(0.5)
    assert en["n_pred_und"] == 0 and de["n_pred_und"] == 0
    # token accounting: whitespace split, exact by construction
    assert en["total_tokens"] == 8 + 8 + 7
    assert de["total_tokens"] == 8 + 7
    # repetition: "the ... the" duplicate token in doc 0/1; doc 2 clean
    assert en["avg_dup_token_frac"] == pytest.approx((1 / 8 + 1 / 8 + 0) / 3)


def test_datasheet_division_edges(spark, tmp_path):
    """Empty text (length 0 -> alpha division by zero) must yield a NULL
    quality, not an ANSI DIVIDE_BY_ZERO crash, and single-token docs
    must produce dup_2gram_frac = 0.0 (the n-1 = 0 branch)."""
    rows = [
        ("edge", "en", ""),            # len(text)=0: try_divide -> NULL
        ("edge", "en", "solitary"),    # 1 token: no bigrams
        ("edge", "en", "the the"),     # all-duplicate tokens
    ]
    sf = _write_docs(spark, tmp_path, rows)
    per_doc = {r["doc_id"]: r.asDict() for r in _datasheet_per_doc(spark, sf).collect()}
    assert per_doc[0]["quality"] is None            # NULL, no crash
    assert per_doc[1]["dup_2gram_frac"] == 0.0
    assert per_doc[2]["dup_token_frac"] == pytest.approx(0.5)
    # the rollup AVG skips the NULL quality (2 non-null of 3 docs)
    row = corpus_datasheet_v2(spark, sf).collect()[0]
    q1 = per_doc[1]["quality"]
    q2 = per_doc[2]["quality"]
    assert row["avg_quality"] == pytest.approx((q1 + q2) / 2)
    assert not math.isnan(row["avg_quality"])


def test_datasheet_v3_near_dup_rate(spark):
    """v3 = v2 + near-dup columns; on the shared sf0.01 corpus the new
    columns must agree with dedup_cluster_representatives' keep-set and
    the v2 columns must be byte-identical to v2's own output."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        dedup_cluster_representatives,
    )

    v2 = {
        (r["source"], r["lang"]): r.asDict()
        for r in corpus_datasheet_v2(spark, SF_ORACLE).collect()
    }
    v3 = {
        (r["source"], r["lang"]): r.asDict()
        for r in corpus_datasheet_v3(spark, SF_ORACLE).collect()
    }
    assert set(v2) == set(v3)
    for k, row2 in v2.items():
        row3 = v3[k]
        for c, val in row2.items():
            assert row3[c] == pytest.approx(val), (k, c)
        # rate and count are two views of the same keep-set
        assert row3["n_representatives"] == pytest.approx(
            row3["n_docs"] * (1.0 - row3["near_dup_frac"])
        )
    total_reps = sum(r["n_representatives"] for r in v3.values())
    keep = (
        dedup_cluster_representatives(spark, SF_ORACLE)
        .filter("is_representative")
        .count()
    )
    assert total_reps == keep


def test_datasheet_stream_matches_batch(spark, tmp_path):
    """The streaming datasheet's cumulative rows after draining two
    micro-batches must equal the batch v2 datasheet on the same rows
    (for the columns the stream maintains — the shared
    datasheet_signals definition makes drift structurally impossible)."""
    from flink_tornadovm_artifact_spark.queries.llm import (
        corpus_datasheet_stream,
    )

    rows = [
        ("web", "en", "the cat and the dog of a king"),
        ("web", "en", "a quiet morning in the old town"),
        ("web", "de", "der hund und die katze und das haus"),
        ("web", "de", "the mislabeled english text of a crawl"),
        ("web", "en", "the cat and the dog of a king"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    batch = {
        (r["source"], r["lang"]): r.asDict()
        for r in corpus_datasheet_v2(spark, sf).collect()
    }

    src = tmp_path / "ds_stream"
    src.mkdir()
    full = spark.read.parquet(sf + "/documents.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    collected = full.orderBy("doc_id").collect()
    for name, part in (("b0", collected[:2]), ("b1", collected[2:])):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r.doc_id for r in part], pa.int64()),
                    "source": pa.array([r.source for r in part], pa.string()),
                    "lang": pa.array([r.lang for r in part], pa.string()),
                    "text": pa.array([r.text for r in part], pa.string()),
                }
            ),
            str(src / f"{name}.parquet"),
        )
    stream = (
        spark.readStream.schema(
            "doc_id long, source string, lang string, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        corpus_datasheet_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ds_stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["source"], r["lang"]): r.asDict()
        for r in spark.sql("SELECT * FROM ds_stream_out").collect()
    }
    assert set(got) == set(batch)
    for k, srow in got.items():
        for c, v in srow.items():
            if c in ("source", "lang"):
                continue
            assert batch[k][c] == pytest.approx(v), (k, c)


def test_streaming_datasheet_with_exact_dup_matches_batch(spark, tmp_path):
    """Round-7 gap closure: the two-store StreamingDatasheet must equal
    the batch v2 datasheet on EVERY column — including exact_dup_frac,
    which the single-query stream twin cannot maintain. The fixture's
    duplicate pair is split across micro-batches, so the cumulative
    digest counts must merge across batches for the rate to be right."""
    from flink_tornadovm_artifact_spark.queries.llm import StreamingDatasheet

    rows = [
        ("web", "en", "the cat and the dog of a king"),
        ("web", "en", "a quiet morning in the old town"),
        ("web", "de", "der hund und die katze und das haus"),
        ("web", "de", "the mislabeled english text of a crawl"),
        ("web", "en", "the cat and the dog of a king"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    batch = {
        (r["source"], r["lang"]): r.asDict()
        for r in corpus_datasheet_v2(spark, sf).collect()
    }
    # the en group has a dup pair, the de group none — the column is
    # discriminating, not constant
    assert batch[("web", "en")]["exact_dup_frac"] == pytest.approx(2 / 3)
    assert batch[("web", "de")]["exact_dup_frac"] == 0.0

    src = tmp_path / "ds2_stream"
    src.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    collected = spark.read.parquet(sf + "/documents.parquet").orderBy(
        "doc_id"
    ).collect()
    for name, part in (("b0", collected[:3]), ("b1", collected[3:])):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r.doc_id for r in part], pa.int64()),
                    "source": pa.array([r.source for r in part], pa.string()),
                    "lang": pa.array([r.lang for r in part], pa.string()),
                    "text": pa.array([r.text for r in part], pa.string()),
                }
            ),
            str(src / f"{name}.parquet"),
        )
    stream = (
        spark.readStream.schema(
            "doc_id long, source string, lang string, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ds = StreamingDatasheet(str(tmp_path / "ds2_store"))
    q1, q2 = ds.attach(stream, checkpoint_base=str(tmp_path / "ds2_ckpt"))
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
    finally:
        q1.stop()
        q2.stop()
    got = {
        (r["source"], r["lang"]): r.asDict()
        for r in ds.card(spark).collect()
    }
    assert set(got) == set(batch)
    for k, srow in got.items():
        for c in batch[k]:
            if c in ("source", "lang"):
                continue
            assert batch[k][c] == pytest.approx(srow[c]), (k, c)
