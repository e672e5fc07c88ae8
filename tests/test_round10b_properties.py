"""Property-based differential tests for the round-10 second-batch
operators: each op vs a brute-force pure-Python twin on adversarial
random inputs (the tests/test_properties.py discipline — small example
counts, hypothesis shrinking, derandomized for driver stability).

What each property adds beyond the fixture oracles:
- normalization: full recompute equality on text DRAWN from the nasty
  alphabet itself (controls, typographic punctuation, zero-width,
  NBSP), plus IDEMPOTENCE — normalize(normalize(x)) == normalize(x),
  the property that makes re-running a curation pipeline safe.
- phrase search: tie-adversarial tiny vocabularies where many bigrams
  share counts, pinning both tie-break chains (phrase asc at the
  query-selection boundary, doc_id asc at the rank boundary).
- epoch shuffle: bijectivity and the affine formula on NON-DENSE,
  randomly-gapped doc_id sets (the fixture's ids are dense 0..n-1, so
  rank==doc_id there — these inputs are the ones where sorted_rank
  actually has to work).
- frame sampling: full recompute of grid/offsets/checksums including
  the beyond-end-of-blob substring guard (ascii('') == 0).
- entity resolution: full recompute of mess-derivation -> blocking ->
  levenshtein verify -> argmin on collision-heavy name vocabularies
  (many names within edit distance 2 of each other).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.queries import llm as _llm
from flink_tornadovm_artifact_spark.queries.llm import (
    EPOCH_SHUFFLE_OFFSET,
    FRAME_SAMPLE_MAX,
    _epoch_shuffle_prime,
    epoch_shuffle_contract,
    multimodal_frame_sample,
)
from flink_tornadovm_artifact_spark.queries.pipeline import (
    ER_LEV_MAX,
    PHRASE_TOP_DOCS,
    PHRASE_TOP_QUERIES,
    entity_resolution_blocking,
    phrase_search_topk,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)

_counter = [0]


def _docs_dir(spark, tmp_path_factory, rows):
    """documents.parquet from (doc_id, text) pairs (arbitrary ids)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _counter[0] += 1
    d = tmp_path_factory.mktemp(f"props10b_{_counter[0]}")
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


# ---------------------------------------------------------------------------
# text normalization: recompute equality + idempotence
# ---------------------------------------------------------------------------
_PY_TRANSLATE = {
    0x2018: "'",
    0x2019: "'",
    0x201C: '"',
    0x201D: '"',
    0x2014: "-",
    0x2013: "-",
    0xA0: " ",
    0x200B: None,
}


def _py_norm(s: str) -> str:
    s = s.translate(_PY_TRANSLATE)
    s = re.sub("[\x01-\x1f\x7f]", " ", s)
    return re.sub(" +", " ", s).strip(" ")


_nasty = st.text(
    alphabet="ab Zé漢\t\r\n\x01\x1f\x7f‘’“”—–\xa0​'\"-",
    min_size=0,
    max_size=60,
)


@given(st.lists(_nasty, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_normalize_expression_matches_python_and_is_idempotent(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "messy string")
    norm = F.expr(_llm._text_norm_sql("messy", ""))
    out = df.select("messy", norm.alias("norm")).collect()
    assert len(out) == len(texts)
    for r in out:
        want = _py_norm(r["messy"])
        assert r["norm"] == want
        assert _py_norm(r["norm"]) == r["norm"], "must be idempotent"
    # idempotence through the engine itself, not just the Python twin
    again = (
        spark.createDataFrame(
            [(r["norm"],) for r in out], "messy string"
        )
        .select(norm.alias("norm2"))
        .collect()
    )
    assert [r["norm2"] for r in again] == [r["norm"] for r in out]


# ---------------------------------------------------------------------------
# phrase search: tie-adversarial recompute
# ---------------------------------------------------------------------------
_phrase_texts = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "ab"]), min_size=1, max_size=30
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(_phrase_texts)
@settings(**SETTINGS)
def test_phrase_search_matches_bruteforce(spark, tmp_path_factory, texts):
    sf = _docs_dir(spark, tmp_path_factory, list(enumerate(texts)))
    got = {
        (r["phrase"], r["doc_id"]): (r["n_occurrences"], r["doc_rank"])
        for r in phrase_search_topk(spark, sf).collect()
    }
    # brute force
    per_doc: dict[tuple[str, int], int] = {}
    corpus: dict[str, int] = {}
    for doc_id, t in enumerate(texts):
        toks = t.split(" ")
        for i in range(len(toks) - 1):
            ph = f"{toks[i]} {toks[i + 1]}"
            corpus[ph] = corpus.get(ph, 0) + 1
            per_doc[(ph, doc_id)] = per_doc.get((ph, doc_id), 0) + 1
    top_q = [
        ph
        for ph, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[
            :PHRASE_TOP_QUERIES
        ]
    ]
    want = {}
    for ph in top_q:
        docs = sorted(
            (
                (doc_id, n)
                for (p, doc_id), n in per_doc.items()
                if p == ph
            ),
            key=lambda dn: (-dn[1], dn[0]),
        )[:PHRASE_TOP_DOCS]
        for rank, (doc_id, n) in enumerate(docs, 1):
            want[(ph, doc_id)] = (n, rank)
    assert got == want


# ---------------------------------------------------------------------------
# epoch shuffle: bijection + affine formula on gapped id sets
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**9),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_epoch_shuffle_on_non_dense_ids(spark, tmp_path_factory, ids):
    sf = _docs_dir(spark, tmp_path_factory, [(i, "w x y z") for i in ids])
    rows = epoch_shuffle_contract(spark, sf).collect()
    n = len(ids)
    p = _epoch_shuffle_prime(n)
    rank = {doc: r for r, doc in enumerate(sorted(ids))}
    by_epoch: dict[int, dict[int, int]] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["pos"]
    for epoch, mapping in by_epoch.items():
        assert sorted(mapping.values()) == list(range(n))
        for doc, pos in mapping.items():
            assert pos == (p * rank[doc] + EPOCH_SHUFFLE_OFFSET * epoch) % n


# ---------------------------------------------------------------------------
# frame sampling: full recompute incl. end-of-blob guard
# ---------------------------------------------------------------------------
_frame_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),
        st.text(alphabet="abcdefgh ", min_size=0, max_size=120),
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda r: r[0],
)


def _py_frames(doc_id: int, text: str):
    if len(text) < 32:
        return {}
    n_frames = 8 + doc_id % 25
    stride = (n_frames + FRAME_SAMPLE_MAX - 1) // FRAME_SAMPLE_MAX
    span = len(text) // n_frames
    out = {}
    for idx in range(0, n_frames, stride):
        ck = 0
        for i in range(8):
            pos = idx * span + (i * span) // 8
            ck += (ord(text[pos]) if pos < len(text) else 0) * (i + 1)
        out[idx] = (n_frames, idx * span, ck)
    return out


@given(_frame_rows)
@settings(**SETTINGS)
def test_frame_sample_matches_bruteforce(spark, tmp_path_factory, rows):
    sf = _docs_dir(spark, tmp_path_factory, rows)
    got: dict[int, dict[int, tuple]] = {}
    for r in multimodal_frame_sample(spark, sf).collect():
        got.setdefault(r["doc_id"], {})[r["frame_idx"]] = (
            r["n_frames"],
            r["frame_offset"],
            r["frame_checksum"],
        )
    want = {
        doc_id: frames
        for doc_id, text in rows
        if (frames := _py_frames(doc_id, text))
    }
    assert got == want


# ---------------------------------------------------------------------------
# entity resolution: full pipeline recompute on collision-heavy names
# ---------------------------------------------------------------------------
def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _ss(s: str, a: int, ln: int | None = None) -> str:
    """SQL substr twin (1-based, beyond-end -> '')."""
    return s[a - 1 :] if ln is None else s[a - 1 : a - 1 + ln]


def _py_messy(partkey: int, name: str) -> str:
    m = partkey % 4
    if m == 0:
        return name
    if m == 1:
        return _ss(name, 1, 3) + _ss(name, 3)
    if m == 2:
        return _ss(name, 1, 1) + _ss(name, 3)
    return _ss(name, 1, 1) + _ss(name, 3, 1) + _ss(name, 2, 1) + _ss(name, 4)


_names = st.lists(
    st.lists(
        st.sampled_from(["ab", "ac", "ba", "bb", "a", "b"]),
        min_size=1,
        max_size=2,
    ).map(" ".join),
    min_size=1,
    max_size=12,
)


@given(_names)
@settings(**SETTINGS)
def test_er_matches_full_pipeline_recompute(spark, tmp_path_factory, names):
    import pyarrow as pa
    import pyarrow.parquet as pq

    _counter[0] += 1
    d = tmp_path_factory.mktemp(f"er10b_{_counter[0]}")
    n = len(names)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n), pa.int64()),
                "p_name": pa.array(names, pa.string()),
                "p_brand": pa.array(["B"] * n, pa.string()),
                "p_type": pa.array(["t"] * n, pa.string()),
                "p_size": pa.array([1] * n, pa.int32()),
                "p_retailprice": pa.array([1.0] * n, pa.float64()),
            }
        ),
        str(d / "part.parquet"),
    )
    got = {
        r["p_partkey"]: (
            r["messy_name"],
            r["matched_name"],
            r["lev_dist"],
            r["is_correct"],
        )
        for r in entity_resolution_blocking(spark, str(d)).collect()
    }
    dictionary = sorted(set(names))
    want = {}
    for pk, name in enumerate(names):
        messy = _py_messy(pk, name)
        cands = [
            (c, _lev(messy, c))
            for c in dictionary
            if _ss(c, 1, 1) == _ss(messy, 1, 1)
            and abs(len(messy) - len(c)) <= 1
            and _lev(messy, c) <= ER_LEV_MAX
        ]
        assert cands, "the true name always survives its own blocking"
        best, lev = min(cands, key=lambda cl: (cl[1], cl[0]))
        want[pk] = (messy, best, lev, best == name)
    assert got == want
