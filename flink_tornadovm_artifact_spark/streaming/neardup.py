"""Streaming near-dup ingest leg (round 12) — incremental MinHash-LSH
band state over a document file stream.

The batch twin is ``queries.llm.stream_neardup_ingest`` (first-writer-
wins on LSH band buckets: a doc is admitted iff it owns the minimum
doc_id on every one of its band keys). This module is the leg a crawl
ingest actually runs: the signature/band pipeline is pure built-in
expressions (stateless, streaming-safe), and the bucket state is an
``applyInPandasWithState`` keyed on (band_id, band_key) holding ONE
bigint — the bucket's running min doc_id (the analog of Flink keyed
ValueState dedup, FT/flink-streaming-java/.../KeyedStream.java; state
is corpus-sublinear: one row per distinct band bucket).

Because the state update is a monotone MIN, the emitted verdicts
converge to the batch twin's answer whenever the feed replays docs in
doc_id order (the ordered_events_stream contract of the other stateful
twins); the tests in tests/test_round12_ops.py pin replay across
micro-batch boundaries, kill-restart checkpoint recovery, and the
RocksDB state-store provider.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: one emission per arriving (doc, band): the bucket's min doc_id as of
#: that arrival (== the global bucket min under a doc_id-ordered feed)
BAND_EMIT_SCHEMA = "doc_id long, band_id int, first_doc long"
BAND_STATE_SCHEMA = "min_id long"


def neardup_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) band rows from a (doc_id, text)
    frame — batch or streaming; the EXACT expressions of the batch
    twin (queries.llm._lsh_bands over _minhash_sig over _shingled), so
    the two legs cannot drift."""
    from ..queries.llm import _lsh_bands, _minhash_sig, _shingled

    return _lsh_bands(_minhash_sig(_shingled(None, "", docs)))


def _band_state_fn(key, pdfs, state: GroupState):
    import pandas as pd

    parts = [p for p in pdfs if len(p)]
    if not parts:
        return
    pdf = (parts[0] if len(parts) == 1 else pd.concat(parts)).sort_values(
        "doc_id", kind="mergesort"
    )
    prev = int(state.get[0]) if state.exists else None
    cm = pdf["doc_id"].cummin()
    if prev is not None:
        cm = cm.clip(upper=prev)
    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "band_id": pdf["band_id"].astype("int32"),
            "first_doc": cm.astype("int64"),
        }
    )
    state.update((int(cm.iloc[-1]),))
    yield out


def neardup_band_state_stream(bands: DataFrame) -> DataFrame:
    """The stateful stage: per (band_id, band_key) bucket, emit each
    arriving band row tagged with the bucket's running min doc_id.
    NoTimeout: band buckets are content-addressed, not time-addressed —
    a production ingest with a freshness horizon would TTL them by
    processing time exactly like the event-dedup leg's watermark."""
    return bands.groupBy("band_id", "band_key").applyInPandasWithState(
        _band_state_fn,
        outputStructType=BAND_EMIT_SCHEMA,
        stateStructType=BAND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def neardup_verdicts(emissions: DataFrame, docs: DataFrame) -> DataFrame:
    """Fold drained band emissions into per-doc admission verdicts with
    the batch twin's exact output shape (doc_id, source, admitted,
    evicted_by, n_stale_bands). ``emissions`` is a BATCH frame of
    drained BAND_EMIT_SCHEMA rows; ``docs`` the (doc_id, source) corpus
    (docs too short to shingle carry no emissions and are admitted
    trivially, as in the twin).

    Replay-safe as a MECHANISM: an at-least-once feed re-delivers a
    doc, producing a second emission per (doc_id, band_id) — possibly
    with a smaller first_doc if an earlier doc reached the bucket in
    between — so the fold first min-reduces per band (idempotent under
    redelivery; a no-op on an exactly-once feed) before applying the
    shared admission rule, exactly as the event-dedup leg's
    exactly-once view absorbs its injected duplicates."""
    return fold_verdicts(
        emissions.groupBy("doc_id", "band_id").agg(
            F.min("first_doc").alias("first_doc")
        ),
        docs,
    )


def fold_verdicts(per_band: DataFrame, docs: DataFrame) -> DataFrame:
    """The admission rule's ONE home (the `_lsh_bands` discipline —
    the batch twin ``queries.llm.stream_neardup_ingest`` and the
    streaming drain fold above both call this, so the rule cannot
    drift between the legs): ``per_band`` carries (doc_id, first_doc)
    with ONE row per band the doc occupies, ``docs`` the (doc_id,
    source) corpus row set. A doc is ADMITTED iff no band's bucket min
    is a strictly earlier doc; otherwise it is evicted by the earliest
    colliding document, with the stale-band count kept for audit."""
    stale = F.col("first_doc") < F.col("doc_id")
    coll = per_band.groupBy("doc_id").agg(
        F.min(F.when(stale, F.col("first_doc"))).alias("evicted_by"),
        F.sum(stale.cast("int")).cast("int").alias("n_stale_bands"),
    )
    return docs.join(coll, "doc_id", "left").select(
        "doc_id",
        "source",
        F.col("evicted_by").isNull().alias("admitted"),
        "evicted_by",
        F.coalesce("n_stale_bands", F.lit(0)).cast("int").alias(
            "n_stale_bands"
        ),
    )
