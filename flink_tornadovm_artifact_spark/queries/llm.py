"""LLM-training-data pipeline operators (beyond the reference surface).

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting) and
multimodal binary-column plumbing — all over the ``documents`` /
``embeddings`` testdata tables.

Design rules for 100 TB:
- everything is expression-level (JVM, whole-stage codegen): ``split`` /
  ``transform`` / ``filter`` / ``aggregate`` higher-order functions, no
  Python UDFs in any hot path;
- hashes are md5-based so Spark and DuckDB agree bit-for-bit (both emit
  lowercase hex) — this is what makes MinHash/SimHash fully oracle-checkable;
- candidate generation is always band/bucket-join shaped (shuffle on a
  small join key), never all-pairs; the demo all-pairs variants bound one
  side with a modulo sample and say so. The oracle-checked production
  path is ``dedup_lsh_verified`` (LSH candidates → exact Jaccard verify);
  the two crossJoin forms are demos registered below the driver's
  correctness window and pinned by pytest.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.sizing import spread_scan
from ..tables import load
from ._util import evict_stale_session_entries as _evict_stale_session_entries
from ._util import plan_memo as _plan_memo

ORACLE: dict[str, str] = {}
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def _register(fn: Callable, sql: str | None) -> Callable:
    QUERIES[fn.__name__] = fn
    if sql is not None:
        ORACLE[fn.__name__] = sql
    return fn


# ---------------------------------------------------------------------------
# Exact deduplication: hash-groupBy on content digest.
# ---------------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    by_hash = docs.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("copies")
    )
    return by_hash.agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("copies").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("copies") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_groups"),
    )


_register(
    dedup_exact,
    """
SELECT COUNT(*) AS n_distinct,
       CAST(SUM(copies) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
FROM (SELECT md5(text) AS h, COUNT(*) AS copies FROM documents GROUP BY 1)
""",
)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup.
# tokens → word 3-shingles → k=8 md5 minhashes → 4 bands × 2 rows →
# group doc ids per band bucket → emit i<j pairs from each bucket array.
# The band key is the only shuffle and the signature pipeline runs once
# — this is the scale path (no all-pairs, no self-join double-compute).
# ---------------------------------------------------------------------------
_MINHASH_K = 8
_BANDS = 4  # rows per band = _MINHASH_K // _BANDS = 2


def _shingled(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    if docs is None:
        docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # NB (round 12): a spread_scan here was tried and REVERTED — it
    # parallelized the md5-heavy consumers (bloom probe −27%) but taxed
    # every cheap consumer of the family's tiny persisted frames with
    # 32-task scheduling per stage (text_decontaminate 0.33→0.83 s,
    # overlap_runs 0.52→1.18 s); net negative across the 12-query
    # family. Heavy consumers spread their OWN probe branch instead
    # (see bloom_decontaminate_screen).
    df = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 3)
    shingle = lambda i: F.concat_ws(
        " ", F.get("toks", i), F.get("toks", i + 1), F.get("toks", i + 2)
    )
    return df.select(
        "doc_id",
        F.transform(F.sequence(F.lit(0), F.size("toks") - 3), shingle).alias(
            "shingles"
        ),
    )


def _decon_sset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted distinct-shingle frame ``(doc_id, sset)`` — ONE
    plan shared (via CacheManager plan-dedup) by text_decontaminate,
    bloom_decontaminate_screen, dedup_containment, dedup_recall_panel
    and dedup_ngram_jaccard, so a session builds the shingle transform
    once for the whole family (round 12; previously each re-declared
    the identical frame and the non-persisting consumers re-ran it per
    reference). Counts against the documented decontaminate memo
    inventory (tests/test_memo_occupancy.py)."""
    from pyspark import StorageLevel

    return (
        _shingled(spark, sf_dir)
        .select("doc_id", F.array_distinct("shingles").alias("sset"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def _word_counts_sw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted whitespace-token count table ``(source, w, c)`` —
    ONE corpus explode + one keyed shuffle shared (via CacheManager
    plan-dedup, the ``_decon_sset`` idiom) by the tokenizer/sketch
    family: wordpiece_fertility_panel, tokenizer_roundtrip_qa,
    unigram_viterbi_panel, the BPE pair (train + fertility), the
    count-min pair, and sketch_hll_union_matrix (whose distinct
    (source, token) table is this frame's key set). Empty-string
    tokens are KEPT — each consumer applies its own filter (only the
    BPE word table drops them), so every derived table is identical to
    the explode it replaces. Type-level derivations (per-token totals,
    distinct types) are one cheap aggregate over this Heaps-law-bounded
    table instead of a fresh corpus pass. Counts against the documented
    memo inventory (tests/test_memo_occupancy.py)."""
    from pyspark import StorageLevel

    return (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def _chunk(j: int):
    # NB: higher-order-function lambdas must take exactly one argument —
    # PySpark passes the array index to 2-ary lambdas, so closing over j
    # via a default parameter would silently break.
    return lambda h: F.substring(h, 4 * j + 1, 4)


def _minhash_sig(df: DataFrame) -> DataFrame:
    """k=8 minhash rows from ONE md5 per shingle: the 128-bit digest is
    split into 8 16-bit hex chunks and each chunk min-ed independently —
    8× less hashing than salted md5 per row, identical LSH semantics."""
    hashed = df.select(
        "doc_id", F.transform("shingles", lambda s: F.md5(s)).alias("hs")
    )
    mh = [
        F.array_min(F.transform("hs", _chunk(j))).alias(f"mh{j}")
        for j in range(_MINHASH_K)
    ]
    return hashed.select("doc_id", *mh)


def _lsh_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) — one row per LSH band per doc; the
    shared band-explosion consumed by the batch pair-emitter
    (dedup_minhash_lsh) and the streaming ingest gate
    (stream_neardup_ingest)."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat(f"mh{2 * b}", f"mh{2 * b + 1}").alias(
                            "band_key"
                        ),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")


def _mh_sig_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted (doc_id, mh0..mh7) MinHash signature table — ONE
    shingle → md5 → chunk-min pass shared (via CacheManager
    plan-dedup, the ``_decon_sset`` idiom) by dedup_minhash_lsh, the
    estimator-error panel, and the streaming near-dup batch twin
    (round 12; each previously re-ran the full signature pipeline).
    Counts against the documented memo inventory
    (tests/test_memo_occupancy.py)."""
    from pyspark import StorageLevel

    return _minhash_sig(_shingled(spark, sf_dir)).persist(
        StorageLevel.MEMORY_AND_DISK
    )


def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    # the shared persisted signature frame serves the corpus path; an
    # explicit docs frame (differential callers) gets its own pipeline
    sig = (
        _mh_sig_frame(spark, sf_dir)
        if docs is None
        else _minhash_sig(_shingled(spark, sf_dir, docs))
    )
    bands = _lsh_bands(sig)
    # Group docs per (band_id, band_key) bucket and emit i<j pairs from
    # each bucket array — ONE pass over the signatures (a band self-join
    # would compute the md5 pipeline twice; Catalyst does not reuse the
    # subtree across self-join sides) and one shuffle on the band key.
    # Bucket arrays are bounded by the LSH collision rate; a degenerate
    # all-identical corpus degrades quadratically in either formulation.
    buckets = (
        bands.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # NB: the outer transform lambda is deliberately 2-ary — PySpark
    # passes the element index as the second argument.
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


_mh_sql = ",\n         ".join(
    f"list_min(list_transform(hs, h -> substr(h, {4 * j + 1}, 4))) AS mh{j}"
    for j in range(_MINHASH_K)
)
_band_sql = "\n    UNION ALL\n".join(
    f"    SELECT doc_id, {b} AS band_id, mh{2 * b} || mh{2 * b + 1} AS band_key FROM sig"
    for b in range(_BANDS)
)

#: the shingle -> md5 signature -> band-explosion CTE chain, shared by
#: the dedup_minhash_lsh oracle and the stream_neardup_ingest oracle
#: (one home for the LSH signature definition — a band-width or
#: shingle-size change cannot diverge the two).
_LSH_BANDS_CTE = f"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), shingled AS (
  SELECT doc_id,
         list_transform(range(0, len(t) - 2),
                        i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]) AS shingles
  FROM toks
), hashed AS (
  SELECT doc_id, list_transform(shingles, s -> md5(s)) AS hs FROM shingled
), sig AS (
  SELECT doc_id,
         {_mh_sql}
  FROM hashed
), bands AS (
{_band_sql}
)"""

_register(
    dedup_minhash_lsh,
    f"""
{_LSH_BANDS_CTE}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
""",
)


# ---------------------------------------------------------------------------
# SimHash fingerprint (16-bit, md5-per-bit): per-doc bit = majority vote of
# token hash bits. Near-dup candidates share fingerprints.
# ---------------------------------------------------------------------------
_SIMHASH_BITS = 16


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 12 (guide §2.3 "shuffle keys/metadata instead of payloads",
    # §1.2): each bit's predicate substring(md5(token || '#k'), 1, 1)
    # >= '8' depends on the TOKEN alone, yet the r1-r11 array form
    # evaluated it per OCCURRENCE — 16 salted md5s x Σ|doc| tokens
    # (sf0.1: 16 x 270k = 4.3M md5s, all inside the single-split scan
    # task). Computing the 16-bit vote vector once per DISTINCT token
    # (Heaps' law: types ≪ occurrences at any scale) and broadcast-
    # joining it back onto the exploded token stream turns the md5 cost
    # corpus-size-independent; the majority votes become one map-side-
    # combined per-doc SUM of 16 small ints. Bit definition unchanged ⇒
    # identical simhash strings.
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    # localCheckpoint PINS the per-type evaluation: without it Catalyst
    # collapses the bit projection back ABOVE the join (it may even
    # broadcast the token stream and probe with the type table), and
    # the md5s run per joined row again — the exact pessimization this
    # rewrite removes. The materialized table is the distinct-token
    # vocabulary, the thing this algorithm is built around being small
    # relative to the corpus.
    bits = (
        tok.select("t")
        .distinct()
        .select(
            "t",
            *[
                (
                    F.substring(F.md5(F.concat("t", F.lit(f"#{k}"))), 1, 1)
                    >= "8"
                )
                .cast("int")
                .alias(f"b{k}")
                for k in range(_SIMHASH_BITS)
            ],
        )
        .localCheckpoint(eager=True)
    )
    # NB: no pinned broadcast hint — the type table is corpus-dependent
    # (SMALL_DIMS discipline); AQE broadcasts it when it fits and falls
    # back to a token-keyed shuffle join when it does not.
    votes = (
        tok.join(bits, "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(f"b{k}").alias(f"s{k}") for k in range(_SIMHASH_BITS)],
        )
    )
    bit = lambda k: F.when(
        2 * F.col(f"s{k}") - F.col("n") >= 0, "1"
    ).otherwise("0")
    sim = votes.select(
        "doc_id",
        F.concat(*[bit(k) for k in range(_SIMHASH_BITS)]).alias("simhash"),
    )
    # split() never yields an empty array (an empty text still gives
    # [""]), so every doc_id survives the explode+join — same row set
    # as the array form.
    return sim


_bit_sql = " ||\n       ".join(
    "CASE WHEN 2 * len(list_filter(toks, t -> substr(md5(t || '#%d'), 1, 1) >= '8'))"
    " - len(toks) >= 0 THEN '1' ELSE '0' END" % k
    for k in range(_SIMHASH_BITS)
)

_register(
    dedup_simhash,
    f"""
SELECT doc_id,
       {_bit_sql} AS simhash
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
""",
)


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup scoring. Demo bounds the left side with a modulo
# sample (doc_id % 97 = 0); the production path is minhash-LSH candidates →
# exact Jaccard verify on candidates only.
# ---------------------------------------------------------------------------
# Fixture documents are independent random token strings — cross-doc
# trigram Jaccard tops out at ~0.029 on the %97 sample, so the original
# 0.1 threshold selected nothing. 0.02 keeps the scoring discriminating
# (8 pairs at sf0.01; see tests/test_vacuity.py).
_JACCARD_THRESHOLD = 0.02


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 12 (guide §2.4/§3): the r1-r11 form was a crossJoin of the
    # %97 sample against the corpus with an array_intersect per pair —
    # N/97 x N array intersections (sf0.1: ~52 x 5000 pairs over ~100-
    # element shingle sets; measured 5.58 s, the registry's #1). A pair
    # with ZERO shared shingles has jaccard 0 < threshold, so the exact
    # same result set falls out of a shingle-key equi-join: explode the
    # distinct-shingle sets once, join sample x corpus on the shingle
    # string, count shared shingles per (doc_a, doc_b), and attach the
    # two set sizes for the union term. Pairs are candidate-sparse
    # (random-token fixture: almost no cross-doc trigram collisions),
    # so the join output is orders of magnitude below the cross
    # product, and every shuffle is on an equi-key. The nested-loop
    # allowlist row for this query is retired.
    sh = _decon_sset(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("sset").alias("nsh"))
    ex = sh.select("doc_id", F.explode("sset").alias("s"))
    a = ex.filter(F.col("doc_id") % 97 == 0).alias("a")
    b = ex.alias("b")
    inter_counts = (
        a.join(b, "s")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter_counts.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


_register(
    dedup_ngram_jaccard,
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, len(t) - 2),
                       i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS sset
  FROM toks
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       len(list_intersect(a.sset, b.sset))
         / (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))) AS jaccard
FROM sh a CROSS JOIN sh b
WHERE a.doc_id % 97 = 0 AND a.doc_id != b.doc_id
  AND len(list_intersect(a.sset, b.sset))
        / (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)))
      >= {_JACCARD_THRESHOLD}
""",
)


# ---------------------------------------------------------------------------
# Composed production dedup pipeline: MinHash-LSH candidate generation →
# exact n-gram-Jaccard verify on the candidates ONLY. This is the 100 TB
# path the module docstring promises: candidate pairs shrink the verify
# step from all-pairs N² to the LSH collision set, and the two joins back
# to the shingle table shuffle on doc_id (an equi-key), never cross.
# The all-pairs forms above stay as modulo-bounded demos.
# ---------------------------------------------------------------------------
_VERIFY_THRESHOLD = 0.8


def dedup_lsh_verified(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    pairs = dedup_minhash_lsh(spark, sf_dir, docs)
    # round 12: the corpus path's sset table IS the shared persisted
    # _decon_sset frame; differential callers keep their own build
    sh = (
        _decon_sset(spark, sf_dir)
        if docs is None
        else _shingled(spark, sf_dir, docs).select(
            "doc_id", F.array_distinct("shingles").alias("sset")
        )
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sset"), F.col("b.sset")))
    union = F.size(F.col("a.sset")) + F.size(F.col("b.sset")) - inter
    return (
        pairs.join(a, pairs.doc_a == F.col("a.doc_id"))
        .join(b, pairs.doc_b == F.col("b.doc_id"))
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= _VERIFY_THRESHOLD)
    )


_pairs_sql = ORACLE["dedup_minhash_lsh"].strip()

_register(
    dedup_lsh_verified,
    f"""
WITH pairs AS (
{_pairs_sql}
), toks2 AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, len(t) - 2),
                       i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS sset
  FROM toks2
)
SELECT p.doc_a, p.doc_b,
       len(list_intersect(a.sset, b.sset))
         / (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))) AS jaccard
FROM pairs p JOIN sh a ON p.doc_a = a.doc_id JOIN sh b ON p.doc_b = b.doc_id
WHERE len(list_intersect(a.sset, b.sset))
        / (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)))
      >= {_VERIFY_THRESHOLD}
""",
)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup + brute-force ANN top-k.
# Dot products in double precision via zip_with/aggregate (sequential fold,
# bit-identical to DuckDB's list_dot_product over DOUBLE[]).
# ---------------------------------------------------------------------------
def _dot(x: Column | str, y: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
    )


def _emb_with_norm2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with the self-dot precomputed ONCE per row. Pairwise
    cosine then needs a single fold per pair (dot / sqrt(n2_a) / sqrt(n2_b)
    — identical op order to the inline form, so oracle floats bit-match)
    instead of three; at N² pair counts the two self-dots dominate."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return emb.withColumn("n2", _dot("v", "v"))


_EMB_DIM_CACHE: dict[str, int] = {}


def _emb_dim(spark: SparkSession, sf_dir: str) -> int:
    """Embedding width for the plan-time hyperplane-sign fold
    (_plane_sign(j, dim)): a one-row probe of the raw embeddings table,
    memoized per sf_dir like _CORPUS_N_CACHE. The fixture generator
    emits a constant width per corpus (the oracle sweep pins the
    signatures at every SF, so a mixed-width table would surface as a
    red oracle row, not a silent drift)."""
    d = _EMB_DIM_CACHE.get(sf_dir)
    if d is None:
        row = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select(F.size("embedding").alias("d"))
            .first()
        )
        if row is None:
            # ADVICE r12: .first() returns None on an empty table and
            # row["d"] would raise an opaque TypeError here
            raise ValueError(
                f"_emb_dim: embeddings table at {sf_dir!r} is empty — "
                "cannot probe the embedding width"
            )
        d = int(row["d"])
        _EMB_DIM_CACHE[sf_dir] = d
    return d


def _cos_pre(a: str, b: str) -> Column:
    """Cosine between pre-normed sides (aliases a/b from _emb_with_norm2)."""
    return (
        _dot(F.col(f"{a}.v"), F.col(f"{b}.v"))
        / F.sqrt(F.col(f"{a}.n2"))
        / F.sqrt(F.col(f"{b}.n2"))
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_with_norm2(spark, sf_dir)
    a = emb.filter(F.col("vec_id") % 50 == 0).alias("a")
    b = emb.alias("b")
    sim = _cos_pre("a", "b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cosine"),
        )
        # Fixture embeddings are independent random vectors — pairwise
        # cosine tops out at ~0.45, so the original 0.9 near-dup
        # threshold selected nothing. 0.35 keeps the scan discriminating
        # (24 pairs at sf0.01; see tests/test_vacuity.py).
        .filter(F.col("cosine") >= 0.35)
    )


_cos_sql = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    " / sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    " / sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))"
)

_register(
    dedup_embedding_cosine,
    f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_cos_sql} AS cosine
FROM embeddings a CROSS JOIN embeddings b
WHERE a.vec_id % 50 = 0 AND a.vec_id != b.vec_id AND {_cos_sql} >= 0.35
""",
)


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors vec_id < 5."""
    emb = _emb_with_norm2(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5).alias("q")
    c = emb.alias("c")
    sim = _cos_pre("q", "c")
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            sim.alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").cast("bigint").alias("rn"))
    )


_register(
    similarity_topk,
    f"""
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_cos_sql} AS cosine,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id
                            ORDER BY {_cos_sql} DESC, b.vec_id ASC) AS rn
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id < 5 AND a.vec_id != b.vec_id
)
WHERE rn <= 5
""",
)


def _plane_sign(j: int, dim: int | None = None) -> Column:
    """Sign bit of hyperplane j over the ``v`` array column: plane j has
    components +1/-1 by md5 bit of (j, dim). Deterministic, so the LSH
    bucketing is oracle-checkable (shared by similarity_lsh_bucketed and
    dedup_semantic; SQL twin: _plane_bit_sql).

    Round 12 (guide §1.2 — row-invariant work out of the row loop): the
    plane-component signs depend only on (j, d), never on the row, yet
    the runtime form re-derives them from planes x dim md5+substr evals
    PER ROW (8 x 64 = 512 per vector, ~1M md5s per query at sf0.1).
    When the embedding width is known at plan-build time (``dim``, from
    the one-row ``_emb_dim`` probe) the signs fold to a literal ±1
    array built with hashlib.md5 — byte-identical input strings, and
    ``x * 1.0D`` / ``x * -1.0D`` are IEEE-exact ``x`` / ``-x`` with the
    fold order unchanged, so the signature is bit-identical to the
    runtime-md5 form the DuckDB twin mirrors (pinned by
    tests/test_semdedup_bound.py::test_plane_sign_literal_fold_matches).
    Callers that don't know the width keep the runtime form."""
    runtime_form = (
        "aggregate(zip_with(v, sequence(0, size(v) - 1), (x, d) ->"
        f" if(substr(md5(concat('p{j}#', d)), 1, 1) >= '8', x, -x)),"
        " 0.0d, (acc, x) -> acc + x)"
    )
    if dim is not None:
        signs = ",".join(
            "1.0D"
            if hashlib.md5(f"p{j}#{d}".encode()).hexdigest()[0] >= "8"
            else "-1.0D"
            for d in range(dim)
        )
        # ADVICE r12: zip_with null-pads when a row's width differs from
        # the probed dim, turning the fold NULL and the sign silently
        # into '0' — a wrong bucket. Guard with a width check so a
        # mixed-width row takes the per-row runtime form instead (one
        # size() comparison per row; the literal fold still runs for
        # every constant-width row, i.e. all of them on real corpora).
        signed = F.expr(
            f"if(size(v) = {dim},"
            f" aggregate(zip_with(v, array({signs}), (x, s) -> x * s),"
            f" 0.0d, (acc, x) -> acc + x), {runtime_form})"
        )
    else:
        signed = F.expr(runtime_form)
    return F.when(signed >= 0, F.lit("1")).otherwise(F.lit("0"))


def similarity_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: random-hyperplane LSH bucketing, then exact cosine
    only within buckets (the 100 TB strategy — candidates shrink by the
    bucket factor; the shuffle key is the bucket signature).

    Hyperplanes are derived from md5 bits of the dimension index, so the
    bucketing is fully deterministic AND oracle-checkable: both engines
    fold the signed components in the same sequential order over doubles,
    so the sign bits agree exactly (verified bit-identical over the full
    table before the oracle was added).
    """
    emb = _emb_with_norm2(spark, sf_dir)
    # Signatures once: bucket ids only, emit in-bucket candidate id pairs
    # from the grouped array (same shape as dedup_minhash_lsh), then join
    # the vectors back by id for the exact-cosine rerank. At scale this is
    # the materialize-candidates-then-fetch-vectors pipeline; the heavy
    # hyperplane folds never run twice.
    dim = _emb_dim(spark, sf_dir)
    bucketed = emb.select(
        "vec_id",
        F.concat(*[_plane_sign(j, dim) for j in range(8)]).alias("bucket"),
    )
    buckets = (
        bucketed.groupBy("bucket")
        .agg(F.sort_array(F.collect_set("vec_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            "ids",
            # 2-ary lambda: PySpark passes the element index second
            lambda x, i: F.transform(
                F.slice("ids", i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("qid"), y.alias("nid")),
            ),
        )
    )
    cand = buckets.select(F.explode(pair_structs).alias("p")).select(
        "p.qid", "p.nid"
    )
    # in-bucket pairs are emitted once with qid<nid; top-k needs both
    # directions, so mirror before the rerank
    cand = cand.union(
        cand.select(F.col("nid").alias("qid"), F.col("qid").alias("nid"))
    )
    a, b = emb.alias("a"), emb.alias("b")
    sim = _cos_pre("a", "b")
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(a, cand.qid == F.col("a.vec_id"))
        .join(b, cand.nid == F.col("b.vec_id"))
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            sim.alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cosine")
    )


_plane_bit_sql = " || ".join(
    "CASE WHEN list_sum(list_transform(range(0, len(v)), d -> "
    f"CASE WHEN substr(md5('p{j}#' || d), 1, 1) >= '8' THEN v[d + 1] "
    "ELSE -v[d + 1] END)) >= 0 THEN '1' ELSE '0' END"
    for j in range(8)
)

_register(
    similarity_lsh_bucketed,
    f"""
WITH vv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), bucketed AS (
  SELECT vec_id, {_plane_bit_sql} AS bucket FROM vv
), pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id != b.vec_id
), scored AS (
  SELECT p.qid AS query_id, p.nid AS nbr_id,
         list_dot_product(va.v, vb.v)
           / sqrt(list_dot_product(va.v, va.v))
           / sqrt(list_dot_product(vb.v, vb.v)) AS cosine
  FROM pairs p
  JOIN vv va ON p.qid = va.vec_id
  JOIN vv vb ON p.nid = vb.vec_id
)
SELECT query_id, nbr_id AS neighbor_id, cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, nbr_id ASC) AS rn
      FROM scored)
WHERE rn <= 5
""",
)


def _ivf_cell_assignments(
    spark: SparkSession, emb: DataFrame, n_probes: int = 2
) -> DataFrame:
    """Coarse quantization shared by similarity_ivf and the IVF
    candidate mode of similarity_hard_negatives: every vector's home
    cell, second probe, and top-``n_probes`` probe list against the 16
    deterministic seed centroids (vec_id < 16), as
    (vec_id, cell, probe2, probes) via one Arrow-batched NumPy map.
    ``n_probes`` trades recall for candidate volume: 2 suits
    nearest-neighbor search (similarity_ivf); hard-NEGATIVE mining uses
    4 because different-label top-K sit farther out and spread over
    more cells (recall measured in tests/test_queries_extra.py)."""
    import numpy as np
    import pandas as pd

    cents = np.array(
        [
            r["v"]
            for r in emb.filter(F.col("vec_id") < 16)
            .orderBy("vec_id")
            .collect()
        ]
    )
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(cents)

    def assign(pdfs):
        c = bc.value
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["v"].to_numpy())
            xn = x / np.linalg.norm(x, axis=1, keepdims=True)
            sims = xn @ c.T
            order = np.argsort(-sims, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": order[:, 0],
                    "probe2": order[:, 1],
                    "probes": list(order[:, :n_probes]),
                }
            )

    return emb.select("vec_id", "v").mapInPandas(
        assign, "vec_id long, cell int, probe2 int, probes array<int>"
    )


def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN — the scale path for *clustered* corpora:
    coarse-quantize every vector to its nearest of 16 seed centroids
    (vec_id < 16, deterministic) with a NumPy batch kernel, then search
    only the query's top-2 probe cells with the exact-cosine rerank.

    Regime note vs ``similarity_lsh_bucketed``: random-hyperplane LSH
    only recalls well when neighbors are near-duplicates (cos ≳ 0.95 —
    the dedup regime); IVF recalls general nearest neighbors on
    clustered data (recall@5 ≈ 0.8–1.0 on the testdata embeddings,
    pinned in tests/test_queries_extra.py). Rows-only: the argmin chain
    is data-dependent float math.

    At 100 TB: the cell assignment is one Arrow-batched map and the
    probe join shuffles only on cell_id. Centroid choice was MEASURED:
    3-iteration spherical k-means on a 1024-vector sample drops
    recall@5 to 0.76-0.84 on this corpus (balanced cells capture fewer
    true neighbors at a fixed 2-probe budget), so the deterministic
    seed centroids (recall 0.92) are kept; a production corpus with
    real cluster structure would revisit with more probes.
    """
    emb = _emb_with_norm2(spark, sf_dir)
    cells = _ivf_cell_assignments(spark, emb)
    data = emb.join(cells.select("vec_id", "cell"), "vec_id")
    queries = (
        emb.filter(F.col("vec_id") < 5)
        .join(cells, "vec_id")
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("n2").alias("qn2"),
            F.explode(F.array("cell", "probe2")).alias("cell"),
        )
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / F.sqrt(F.col("qn2")) / F.sqrt(F.col("n2"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        queries.join(data, "cell")
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            F.col("qid").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            sim.alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cosine")
    )


_register(
    similarity_ivf,
    # The coarse quantization IS oracle-checkable: assignment margins on
    # this corpus (min rank1-rank2 gap 2.3e-4, rank2-rank3 5.3e-5,
    # top-5 boundary 2.0e-4) sit ~10 orders of magnitude above
    # cross-engine float drift, so the NumPy-kernel cell assignment and
    # the SQL rank agree exactly (measured: identical top-5 sets).
    """
WITH vv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cents AS (
  SELECT vec_id AS cid, v AS c FROM vv WHERE vec_id < 16
), assign AS (
  SELECT vec_id, cid, rn FROM (
    SELECT vv.vec_id, cents.cid,
           ROW_NUMBER() OVER (PARTITION BY vv.vec_id
             ORDER BY list_dot_product(vv.v, cents.c)
                        / sqrt(list_dot_product(vv.v, vv.v))
                        / sqrt(list_dot_product(cents.c, cents.c)) DESC,
                      cents.cid ASC) AS rn
    FROM vv CROSS JOIN cents)
  WHERE rn <= 2
), cells AS (
  SELECT vec_id,
         MAX(CASE WHEN rn = 1 THEN cid END) AS cell,
         MAX(CASE WHEN rn = 2 THEN cid END) AS probe2
  FROM assign GROUP BY vec_id
), data AS (
  SELECT vv.vec_id, vv.v, cells.cell, cells.probe2
  FROM vv JOIN cells USING (vec_id)
), qs AS (
  SELECT vec_id AS qid, v AS qv, unnest([cell, probe2]) AS cell
  FROM data WHERE vec_id < 5
), scored AS (
  SELECT q.qid AS query_id, d.vec_id AS nbr_id,
         list_dot_product(q.qv, d.v)
           / sqrt(list_dot_product(q.qv, q.qv))
           / sqrt(list_dot_product(d.v, d.v)) AS cosine
  FROM qs q JOIN data d ON q.cell = d.cell AND d.vec_id != q.qid
)
SELECT query_id, nbr_id AS neighbor_id, cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, nbr_id ASC) AS rn
      FROM scored)
WHERE rn <= 5
""",
)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_text"),
        # BPE-ish subword estimate: ~1 token per 4 chars, at least one per word
        F.greatest(
            F.size(toks).cast("bigint"),
            F.ceil(F.length("text") / 4).cast("bigint"),
        ).alias("n_subwords_est"),
    )


_register(
    text_token_count,
    """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_text,
       CAST(GREATEST(len(string_split(text, ' ')),
                     CAST(CEIL(length(text) / 4) AS BIGINT)) AS BIGINT) AS n_subwords_est
FROM documents
""",
)


_STOPWORDS = ("the", "a", "of", "and", "to", "in")


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    # try_divide: empty text -> NULL, matching DuckDB's x/0 -> NULL (under
    # Spark 4 default ANSI mode a bare `/` would raise DIVIDE_BY_ZERO).
    alpha_ratio = F.try_divide(
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")), F.length("text")
    )
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))) / n_tok
    )
    return docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stop_ratio"),
        (0.5 * alpha_ratio + 0.5 * stop_ratio).alias("quality"),
    )


_stop_in = ", ".join(f"'{s}'" for s in _STOPWORDS)
_register(
    text_quality_score,
    f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text) AS alpha_ratio,
       len(list_filter(string_split(text, ' '), t -> t IN ({_stop_in})))
         / len(string_split(text, ' ')) AS stop_ratio,
       0.5 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text))
       + 0.5 * (len(list_filter(string_split(text, ' '), t -> t IN ({_stop_in})))
                  / len(string_split(text, ' '))) AS quality
FROM documents
""",
)


_LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "la", "y", "los"),
}


def _lang_pred_expr() -> Column:
    """The marker-word language prediction for a ``text`` column — ONE
    definition shared by text_lang_id and langid_confusion_matrix (the
    datasheet_signals no-drift discipline)."""
    toks = F.split("text", " ")
    def _marker_pred(markers: tuple[str, ...]):
        return lambda t: t.isin(*markers)

    score = {
        lang: F.size(F.filter(toks, _marker_pred(m)))
        for lang, m in _LANG_MARKERS.items()
    }
    return (
        F.when(
            (score["en"] >= score["de"])
            & (score["en"] >= score["fr"])
            & (score["en"] >= score["es"])
            & (score["en"] > 0),
            "en",
        )
        .when(
            (score["de"] >= score["fr"]) & (score["de"] >= score["es"]) & (score["de"] > 0),
            "de",
        )
        .when((score["fr"] >= score["es"]) & (score["fr"] > 0), "fr")
        .when(score["es"] > 0, "es")
        .otherwise("und")
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", _lang_pred_expr().alias("pred_lang"))


def _lang_score_sql(m: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in m)
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({in_list})))"


_s = {lang: _lang_score_sql(m) for lang, m in _LANG_MARKERS.items()}
_register(
    text_lang_id,
    f"""
SELECT doc_id,
       CASE WHEN {_s['en']} >= {_s['de']} AND {_s['en']} >= {_s['fr']}
                 AND {_s['en']} >= {_s['es']} AND {_s['en']} > 0 THEN 'en'
            WHEN {_s['de']} >= {_s['fr']} AND {_s['de']} >= {_s['es']}
                 AND {_s['de']} > 0 THEN 'de'
            WHEN {_s['fr']} >= {_s['es']} AND {_s['fr']} > 0 THEN 'fr'
            WHEN {_s['es']} > 0 THEN 'es'
            ELSE 'und' END AS pred_lang
FROM documents
""",
)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set (the hash-sketch analog of a rolling-hash fingerprint)."""
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


_register(
    text_fingerprint,
    """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
FROM documents
""",
)


# ---------------------------------------------------------------------------
# Rabin-Karp rolling-hash fingerprint: token codes from an md5 prefix,
# polynomial rolling hash over every 4-token window, document fingerprint
# = (min, max, distinct-count) of the window hashes — the winnowing-style
# order-SENSITIVE counterpart of text_fingerprint's sorted-set md5.
# All arithmetic stays in int64: codes < P (1e6), base B=131, so a window
# hash is bounded by 4·P·B³ ≈ 9e12. Pure expression level (one transform
# over a sequence), no shuffle besides the scan.
# ---------------------------------------------------------------------------
_RH_P = 1_000_003  # prime modulus for token codes and window hashes
_RH_B = 131  # polynomial base
_RH_N = 4  # tokens per window


def _token_codes_expr(col: str = "text") -> Column:
    """md5-prefix token codes mod _RH_P — the hashing contract's ONE
    home, shared by text_rolling_hash and winnowing_fingerprint_panel
    (and their pure-Python test twins)."""
    return F.transform(
        F.split(col, " "),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
        % _RH_P,
    )


def _kgram_hash(codes, i: Column, k: int) -> Column:
    """Polynomial hash of the k tokens starting at (0-based) ``i`` over
    ``codes`` (column name or bound lambda variable)."""
    h = F.get(codes, i)
    for j in range(1, k):
        h = h * _RH_B + F.get(codes, i + j)
    return h % _RH_P


def _poly_terms_sql(k: int) -> str:
    """DuckDB twin of _kgram_hash's polynomial (1-based list ``c``,
    0-based position ``i``)."""
    return " + ".join(
        f"c[i + {j + 1}] * {_RH_B ** (k - 1 - j)}" for j in range(k)
    )


def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    df = docs.select(
        "doc_id", _token_codes_expr().alias("codes")
    ).filter(F.size("codes") >= _RH_N)
    hashes = F.transform(
        F.sequence(F.lit(0), F.size("codes") - _RH_N),
        lambda i: _kgram_hash("codes", i, _RH_N),
    )
    return df.select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        F.size(F.array_distinct(hashes)).cast("bigint").alias("n_windows"),
    )


_rh_terms = _poly_terms_sql(_RH_N)

_register(
    text_rolling_hash,
    f"""
WITH coded AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % {_RH_P}) AS c
  FROM documents
), hashed AS (
  SELECT doc_id,
         list_transform(range(0, len(c) - {_RH_N - 1}),
                        i -> ({_rh_terms}) % {_RH_P}) AS hs
  FROM coded
  WHERE len(c) >= {_RH_N}
)
SELECT doc_id,
       list_min(hs) AS fp_min,
       list_max(hs) AS fp_max,
       CAST(len(list_distinct(hs)) AS BIGINT) AS n_windows
FROM hashed
""",
)


# ---------------------------------------------------------------------------
# Python UDTF (the reference's TableFunction surface, SURVEY §2.K —
# FT/flink-table/flink-table-common/.../functions/TableFunction.java):
# one input row fans out to N output rows from imperative Python. The
# hot-path UDTF-shaped queries here use explode (JVM); this query pins the
# real pyspark.sql.functions.udtf API for logic explode can't express.
# ---------------------------------------------------------------------------
def text_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigrams via LATERAL udtf over a deterministic 1-in-50 doc sample —
    row-at-a-time Python is deliberately NOT a scale path; the bounded
    sample keeps the UDTF cheap at any sf."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class BigramEmitter:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("bigram_emitter", BigramEmitter)
    from ..tables import register_views

    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM documents d,
             LATERAL bigram_emitter(d.text) b
        WHERE d.doc_id % 50 = 0
        """
    )


_register(
    text_udtf_ngrams,
    """
SELECT doc_id,
       CAST(i AS INTEGER) AS pos,
       t[i + 1] || ' ' || t[i + 2] AS bigram
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE doc_id % 50 = 0),
     LATERAL (SELECT unnest(range(0, len(t) - 1)) AS i)
""",
)


# ---------------------------------------------------------------------------
# Multimodal: binary column + typed metadata plumbing. The decode /
# feature-extract kernels live in operators/multimodal.py (mapInPandas with
# a deterministic fake decoder — image/audio libs are not in this
# container); this query verifies the schema/bytes plumbing itself.
# ---------------------------------------------------------------------------
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.length(blob).cast("bigint").alias("n_bytes"),
        F.hex(F.substring("text", 1, 8).cast("binary")).alias("header_hex"),
    )


_register(
    multimodal_binary_meta,
    """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       hex(encode(substring(text, 1, 8))) AS header_hex
FROM documents
""",
)


def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: blob column → JVM-side metadata →
    Arrow-batched decode+feature kernel (operators/multimodal.py, stubbed
    codec). The fake decode is md5-derived integer arithmetic, so even
    the Python kernel is oracle-checkable: DuckDB re-derives the digest
    bytes from md5 hex and reproduces width/height/features exactly.

    Registered output flattens the ``features array<double>`` into scalar
    ``f0..f7`` columns: the harness canonicalizes results with a pandas
    sort over every column, and list-valued cells are unsortable there.
    The array-returning API (``decode_image_features``) is unchanged for
    library users — this is a projection at the query boundary only."""
    from ..operators.multimodal import decode_image_features, with_metadata

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    blobs = with_metadata(docs, "content").filter(F.col("meta.n_bytes") > 0)
    feats = decode_image_features(blobs, id_col="doc_id")
    return feats.select(
        "doc_id",
        "width",
        "height",
        *[F.col("features")[i].alias(f"f{i}") for i in range(8)],
    )


def _hex_byte(j: int) -> str:
    """Digest byte j from the md5 hex string (column ``hx``)."""
    return (
        f"((strpos('0123456789abcdef', substr(hx, {2 * j + 1}, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr(hx, {2 * j + 2}, 1)) - 1))"
    )


_feat_sql = ", ".join(
    f"CAST({_hex_byte(2 * i)} + 256 * {_hex_byte(2 * i + 1)} AS DOUBLE)"
    f" / 65535.0 AS f{i}"
    for i in range(8)
)

_register(
    multimodal_feature_extract,
    f"""
WITH h AS (
  SELECT doc_id, md5(text) AS hx FROM documents
  WHERE octet_length(encode(text)) > 0
)
SELECT doc_id,
       CAST(16 + {_hex_byte(0)} % 64 AS INTEGER) AS width,
       CAST(16 + {_hex_byte(1)} % 64 AS INTEGER) AS height,
       {_feat_sql}
FROM h
""",
)


# ---------------------------------------------------------------------------
# Multimodal perceptual-hash near-dup (round 10 — the image analog of
# SimHash dedup; the dedup family was text/embedding-only before): a
# 64-bit dHash per blob + banded Hamming LSH bucketing + exact Hamming
# verify on candidates only.
#
# dHash (difference hash, the classic perceptual image hash): downscale
# to a (bands*bits+1)-pixel strip, bit_j = pixel_j < pixel_{j+1}. The
# real decode+downscale is codec work (stubbed in this container, same
# policy as operators/multimodal.py); the deterministic stand-in
# "downscale" is a STRIDED SAMPLE of the blob's bytes — unlike the
# md5-seeded fake decoder it PRESERVES LOCALITY, so near-identical
# blobs genuinely get near-identical hashes and the near-dup semantics
# are real, not simulated (tests/test_round10_ops.py injects true
# near-dup blobs and checks they are found).
#
# Plan / 100 TB: one scan computes the 8 band values per blob (pure JVM
# expressions); the candidate join shuffles on (band_idx, band_value) —
# never all-pairs; the Hamming verify runs per candidate pair over 8
# ints. Recall guarantee: any pair within Hamming distance < 8 agrees
# exactly on >=1 of the 8 bands (pigeonhole), so true near-dups always
# collide. Band WIDTH is a mechanism, not a constant (the SemDeDup
# occupancy control, llm.py:_semdedup_planes): band_bits =
# max(8, ceil(log2(N / PHASH_TARGET_BUCKET))) from a metadata-only
# corpus count, so expected bucket occupancy N/2^band_bits stays
# bounded at any corpus size. At every test SF (N <= 5000) the formula
# yields exactly 8 bits, so the static 8-bit oracle SQL is the exact
# twin. The fixture corpus is independent word salad (no true image
# dups): banded-candidate Hamming bottoms out at 14/64, so the
# registered threshold 16 keeps the verify stage discriminating
# (13/19/1804 pairs at sf0.001/0.01/0.1); real pipelines use <= 7
# (inside the pigeonhole bound) via the `ham_max` parameter.
# ---------------------------------------------------------------------------
PHASH_BANDS = 8
PHASH_MIN_BAND_BITS = 8
PHASH_TARGET_BUCKET = 64
_PHASH_HAM_MAX = 16


def _phash_band_bits(n_docs: int) -> int:
    """Band width for an ``n_docs`` corpus: enough bits per band that
    expected bucket occupancy N / 2^bits <= PHASH_TARGET_BUCKET,
    floored at PHASH_MIN_BAND_BITS (== classic 64-bit dHash)."""
    if n_docs <= PHASH_TARGET_BUCKET:
        return PHASH_MIN_BAND_BITS
    return max(
        PHASH_MIN_BAND_BITS,
        math.ceil(math.log2(n_docs / PHASH_TARGET_BUCKET)),
    )


def _phash_bands_expr(bits: int) -> str:
    """Spark SQL for the per-blob band-value array: strided
    8*bits+1-pixel sample -> dHash bits -> `PHASH_BANDS` ints of
    `bits` bits each. The pixel array is LET-BOUND via the
    single-element-transform idiom (``transform(array(px), px -> ...)``)
    so CollapseProject cannot inline the 8*bits+1-substring sample into
    each of the 2*8*bits element_at references (measured 230 s -> 5 s
    at sf0.1 before the binding + slim-join fixes)."""
    n_px = PHASH_BANDS * bits
    px = (
        f"transform(sequence(0, {n_px}), j -> "
        f"ascii(substring(text, "
        f"1 + cast((j * (length(text) - 1)) div {n_px} as int), 1)))"
    )
    return (
        f"transform(array({px}), px -> "
        f"transform(sequence(0, {PHASH_BANDS - 1}), k -> "
        f"aggregate(transform(sequence(0, {bits - 1}), i -> "
        f"shiftleft(CASE WHEN element_at(px, {bits} * k + i + 1) "
        f"< element_at(px, {bits} * k + i + 2) THEN 1 ELSE 0 END, i)), "
        f"0, (acc, x) -> acc + x)))[0]"
    )


def multimodal_phash_neardup(
    spark: SparkSession, sf_dir: str, ham_max: int = _PHASH_HAM_MAX
) -> DataFrame:
    """Near-duplicate blob pairs by banded dHash: (doc_u, doc_v,
    hamming) for every candidate pair sharing >=1 band with Hamming
    distance <= ham_max over the full 8*band_bits-bit hash.

    Join discipline: the band-bucket self-join and the (doc_u, doc_v)
    dedup run over SLIM scalar columns only — carrying the band ARRAYS
    through the join makes every join output row re-evaluate the
    signature expression (839k rows * the whole pixel sample; the
    measured 230 s pathology) — and the arrays rejoin AFTER the dedup,
    once per surviving pair side."""
    bits = _phash_band_bits(_corpus_count(spark, sf_dir, "documents"))
    # Round 12 batch 9 (guide §2.5): the signature expression is the
    # query's heaviest scan work and the checkpoint materialized it in
    # the single-split scan task; spread_scan distributes the docs
    # across the session's cores first (no-op when the source already
    # supplies enough splits).
    docs = spread_scan(
        load(spark, sf_dir, "documents").filter(F.length("text") >= 2)
    )
    # Round 12 (guide §5 / §1.2): the signature table is TINY (one row
    # of band ints per doc) but its pixel-sampling expression is the
    # query's heaviest scan work, and the plan references it four times
    # (both self-join sides + both band-array re-attach joins) with no
    # common exchange for ReuseExchange to dedup. localCheckpoint
    # materializes it once; every downstream read is a cached-partition
    # scan (ContextCleaner reclaims the blocks when the frame is
    # dropped — same lifetime discipline as the iterative pipelines).
    sig = docs.select(
        "doc_id", F.expr(_phash_bands_expr(bits)).alias("bands")
    ).localCheckpoint(eager=True)
    flat = sig.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "bval")
    )
    a, b = flat.alias("a"), flat.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_u"),
            F.col("b.doc_id").alias("doc_v"),
        )
        .dropDuplicates(["doc_u", "doc_v"])
    )
    pairs = (
        cand.join(sig.select(F.col("doc_id").alias("doc_u"),
                             F.col("bands").alias("bu")), "doc_u")
        .join(sig.select(F.col("doc_id").alias("doc_v"),
                         F.col("bands").alias("bv")), "doc_v")
    )
    ham = F.aggregate(
        F.zip_with("bu", "bv", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("int")
    return (
        pairs.select("doc_u", "doc_v", ham.alias("hamming"))
        .filter(F.col("hamming") <= ham_max)
    )


# the px CTE is shared by the bands construction; 8-bit static twin of
# the derived-width Spark plan (exact at every test SF — see above)
_register(
    multimodal_phash_neardup,
    f"""
WITH px AS (
  SELECT doc_id,
         list_transform(range(0, {PHASH_BANDS * 8 + 1}), j ->
           ascii(substr(text,
                        1 + ((j * (length(text) - 1)) // {PHASH_BANDS * 8}),
                        1))) AS px
  FROM documents WHERE length(text) >= 2
), sig AS (
  SELECT doc_id,
         list_transform(range(0, {PHASH_BANDS}), k ->
           list_sum(list_transform(range(0, 8), i ->
             CASE WHEN px[8 * k + i + 1] < px[8 * k + i + 2]
                  THEN (1 << i) ELSE 0 END))) AS bands
  FROM px
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_u, b.doc_id AS doc_v,
         a.bands AS bu, b.bands AS bv
  FROM sig a, LATERAL (SELECT unnest(range(0, {PHASH_BANDS})) AS k), sig b
  WHERE a.bands[k + 1] = b.bands[k + 1] AND a.doc_id < b.doc_id
)
SELECT doc_u, doc_v,
       CAST(list_sum(list_transform(range(0, {PHASH_BANDS}), k ->
              bit_count(xor(CAST(bu[k + 1] AS BIGINT),
                            CAST(bv[k + 1] AS BIGINT))))) AS INTEGER)
         AS hamming
FROM cand
WHERE list_sum(list_transform(range(0, {PHASH_BANDS}), k ->
        bit_count(xor(CAST(bu[k + 1] AS BIGINT), CAST(bv[k + 1] AS BIGINT)))))
      <= {_PHASH_HAM_MAX}
""",
)


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag corpus documents sharing any word
# 3-shingle with a benchmark/eval set — the training-pipeline step that
# keeps test data out of the training corpus. The benchmark here is the
# deterministic doc_id % 23 == 0 subset standing in for an eval suite.
#
# Scale shape: a benchmark is SMALL by definition (eval suites, not
# corpora), so its distinct-shingle set broadcasts; the corpus side is
# one explode + broadcast-hash semi-ish join + per-doc count — a single
# scan of the corpus, no shuffle of the exploded shingles on a join
# key. Output: (doc_id, n_contaminated_shingles) per flagged doc; the
# caller thresholds or anti-joins to drop.
# ---------------------------------------------------------------------------
_DECON_MOD = 23


def _decon_bench_set(sh: DataFrame) -> DataFrame:
    """Distinct benchmark shingle set off the shared sset frame — the
    exact screen's build side, also the Bloom bitmap's insert set and
    the fused verdict panel's exact-flag side (round-12 batch 9: one
    definition so the fused panel cannot drift from the screens)."""
    return (
        sh.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select(F.explode("sset").alias("s"))
        .distinct()
    )


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PERSISTED (round 11; the bloom-screen discipline, measured there
    # 10.5 s → 6.5 s and here 8.5 s → ~1 s standalone at sf0.1): the
    # frame feeds BOTH the benchmark and corpus branches, and without
    # the persist the explode-implied size/isnotnull predicates push
    # below the projection and inline the whole shingle transform into
    # a Filter re-evaluated per corpus row on each branch. Inside the
    # full bench pass the cost was masked by CacheManager plan-dedup
    # onto bloom_decontaminate_screen's persisted twin of this exact
    # frame; standalone (and under perplexity_decontaminate, which
    # composes this query) nothing was cached.
    sh = _decon_sset(spark, sf_dir)
    bench = _decon_bench_set(sh)
    corpus = sh.filter(F.col("doc_id") % _DECON_MOD != 0).select(
        "doc_id", F.explode("sset").alias("s")
    )
    return (
        corpus.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )


_register(
    text_decontaminate,
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), shingled AS (
  SELECT doc_id,
         list_transform(range(0, len(t) - 2),
                        i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]) AS shingles
  FROM toks
), ex AS (
  SELECT doc_id, UNNEST(list_distinct(shingles)) AS s FROM shingled
), bench AS (
  SELECT DISTINCT s FROM ex WHERE doc_id % {_DECON_MOD} = 0
)
SELECT e.doc_id, COUNT(*) AS n_contaminated_shingles
FROM ex e JOIN bench b ON e.s = b.s
WHERE e.doc_id % {_DECON_MOD} <> 0
GROUP BY e.doc_id
""",
)


# ---------------------------------------------------------------------------
# Bloom-filter contamination screen (round 10 — Bloom 1970; the
# membership-screen primitive an incremental 100 TB ingest actually
# ships): the EVAL/BENCHMARK set's shingles (the text_decontaminate
# benchmark: doc_id % _DECON_MOD == 0) are summarized as an m-bit Bloom
# filter (k md5-derived positions per shingle — the engine-portable
# hash family the CMS/HLL sketches already use), and every incoming
# corpus document is screened against the BITSET, never against the
# benchmark rows: per doc, the count/share of its shingles whose k
# positions are all set — the Bloom-approximate version of
# text_decontaminate's exact join, ONE-SIDED by construction (no false
# negatives; E[fp] = (1 - e^(-kn/m))^k, pinned with the exact-superset
# invariant in tests/test_round10_ops.py).
# Filter SIZE is a mechanism, not a constant (the SemDeDup rule): m =
# 2^max(17, ceil(log2(N_docs * BLOOM_BITS_PER_DOC))) from the
# metadata-only corpus count, identical arithmetic in the oracle SQL
# (which derives m from its own COUNT(*)), so bits-per-element — and
# therefore the fp rate (~1e-3) — stays flat from 500 docs to 10^9
# while the fixed-m form saturates by sf0.1.
# Plan / 100 TB: the screen side collapses to <= m distinct BIT
# POSITIONS (broadcast here; literally a bitmap in cluster memory), so
# screening costs ONE broadcast-hash probe per (shingle, position) —
# no shuffle of the benchmark shingle set, no corpus⋈benchmark join,
# and re-screening a new batch reuses the filter without re-reading
# the benchmark (text_decontaminate re-broadcasts its exact set every
# run; the Bloom form is the amortized streaming-ingest analog).
# ---------------------------------------------------------------------------
BLOOM_K = 3  # hash functions
BLOOM_MIN_M_EXP = 17  # filter floor: 2^17 bits
BLOOM_BITS_PER_DOC = 128  # sizing budget per CORPUS doc (benchmark =
# a fixed 1/_DECON_MOD share of it, so bits/element stays ~27-33)


def _bloom_m_exp(n_docs: int) -> int:
    """log2 of the filter width for an ``n_docs`` corpus."""
    return max(
        BLOOM_MIN_M_EXP, math.ceil(math.log2(max(2, n_docs) * BLOOM_BITS_PER_DOC))
    )


def bloom_decontaminate_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per corpus doc with >= 1 Bloom-flagged shingle: (doc_id,
    n_shingles, bloom_hits, bloom_containment) — the Bloom-approximate
    superset of ``text_decontaminate``'s exact contamination join."""
    # The distinct-shingle frame is PERSISTED (MEMORY_AND_DISK, the
    # graph-base discipline — CacheManager plan-dedupes repeated
    # builds): without it, the explode's implied size/isnotnull
    # predicates push below the projection and inline the whole
    # shingle transform into a Filter re-evaluated several times per
    # corpus row on BOTH branches (measured 10.5 s -> 6.5 s at sf0.1).
    sh = _decon_sset(spark, sf_dir)
    tflag = _bloom_type_flags(spark, sf_dir, sh)
    corpus = sh.filter(F.col("doc_id") % _DECON_MOD != 0)
    occ = corpus.select(
        "doc_id",
        F.size("sset").cast("bigint").alias("n_shingles"),
        F.explode("sset").alias("s"),
    )
    return (
        occ.join(F.broadcast(tflag), "s")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("bloom_hits"))
        .select(
            "doc_id",
            "n_shingles",
            "bloom_hits",
            (F.col("bloom_hits") / F.col("n_shingles")).alias(
                "bloom_containment"
            ),
        )
    )


def _bloom_type_flags(
    spark: SparkSession, sf_dir: str, sh: DataFrame
) -> DataFrame:
    """The Bloom screen's per-TYPE verdict frame: the distinct corpus
    shingle types whose K md5 positions are all set in the
    benchmark-built bitmap (round-12 batch 9: extracted so the fused
    verdict panel reuses the screen's own construction verbatim)."""
    m = 1 << _bloom_m_exp(_corpus_count(spark, sf_dir, "documents"))
    bench = _decon_bench_set(sh)
    positions = lambda col: F.array_distinct(
        F.array(*[_md5_bucket(col, f"#bf{j}", m) for j in range(BLOOM_K)])
    )
    bits = (
        bench.select(F.explode(positions(F.col("s"))).alias("pos")).distinct()
    )  # <= m rows by construction — the bitmap
    # probe keys are ALL ints (doc_id, shingle ordinal si): shuffling
    # the shingle STRINGS through the per-shingle verdict groupBy was
    # the dominant local cost (~2x)
    #
    # Round 12 (guide §4 / the _phash_bands_expr let-bind idiom): the
    # r11 form evaluated positions(s) — BLOOM_K salted md5s — TWICE per
    # shingle (once under size() for n_pos, once under the explode);
    # CollapseProject inlines the array into both references. Binding
    # the array as a transform lambda variable and emitting
    # (n_pos, pos) structs from ONE generator halves the md5 work and
    # yields the identical row set.
    pos_structs = F.explode(
        F.flatten(
            F.transform(
                F.array(positions(F.col("s"))),
                lambda parr: F.transform(
                    parr,
                    lambda p: F.struct(
                        F.size(parr).alias("n_pos"), p.alias("pos")
                    ),
                ),
            )
        )
    )
    # Round 12 (opt batch 7, guide §2.3 — the dedup_simhash /
    # count-min per-TYPE precedent): the K-md5 probe ran per shingle
    # OCCURRENCE — 9.2x the distinct-type count at sf0.1 (249k
    # occurrences vs 27k types, measured) and unboundedly more on a
    # duplicated crawl. The verdict (all k positions set) depends only
    # on the shingle STRING, so: hash each distinct corpus type once,
    # keep the Bloom-POSITIVE types (a benchmark-plus-fp-sized set —
    # the same broadcast argument as the exact screen's bench side),
    # and count each doc's sset members against that broadcast set.
    # sset entries are distinct per doc (array_distinct), so the
    # occurrence join counts exactly the old per-(doc, si) verdicts.
    # This also supersedes the batch-3 spread of the probe branch: the
    # occurrence branch no longer does per-row md5 work, and the
    # 9x-smaller type branch is position-join-bounded.
    corpus = sh.filter(F.col("doc_id") % _DECON_MOD != 0)
    types = corpus.select(F.explode("sset").alias("s")).distinct()
    tpos = types.select("s", pos_structs.alias("x")).select(
        "s", F.col("x.n_pos").alias("n_pos"), F.col("x.pos").alias("pos")
    )
    return (
        tpos.join(F.broadcast(bits), "pos")
        .groupBy("s", "n_pos")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == F.col("n_pos"))  # all k bits set
        .select("s")
    )


def _bloom_pos_sql(j: int) -> str:
    """DuckDB twin of _md5_bucket(s, '#bfj', m); m is the mexp CTE's
    column, cross-joined into scope (a scalar subquery inside
    UNNEST(list_transform(...)) trips DuckDB's binder)."""
    return (
        f"CAST(concat('0x', substr(md5(s || '#bf{j}'), 1, 8)) AS BIGINT)"
        f" % m"
    )


_bloom_positions_sql = (
    "list_distinct(["
    + ", ".join(_bloom_pos_sql(j) for j in range(BLOOM_K))
    + "])"
)

_register(
    bloom_decontaminate_screen,
    f"""
WITH mexp AS (
  SELECT (CAST(1 AS BIGINT) << GREATEST({BLOOM_MIN_M_EXP},
            CAST(ceil(log2(GREATEST(2, COUNT(*)) * {BLOOM_BITS_PER_DOC}))
                 AS INT))) AS m
  FROM documents
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, len(t) - 2),
                        i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]))
           AS sset
  FROM toks
), ex AS (
  SELECT doc_id, len(sset) AS n_shingles,
         UNNEST(sset) AS s,
         UNNEST(range(1, len(sset) + 1)) AS si
  FROM shingled
), bits AS (
  SELECT DISTINCT UNNEST({_bloom_positions_sql}) AS pos
  FROM (SELECT DISTINCT s FROM ex WHERE doc_id % {_DECON_MOD} = 0), mexp
), probe AS (
  SELECT doc_id, n_shingles, si,
         len({_bloom_positions_sql}) AS n_pos,
         UNNEST({_bloom_positions_sql}) AS pos
  FROM ex, mexp WHERE doc_id % {_DECON_MOD} <> 0
), hits AS (
  SELECT doc_id, n_shingles, si, n_pos, COUNT(*) AS n_hit
  FROM probe JOIN bits USING (pos)
  GROUP BY 1, 2, 3, 4
  HAVING COUNT(*) = n_pos
)
SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(COUNT(*) AS BIGINT) AS bloom_hits,
       COUNT(*) * 1.0 / n_shingles AS bloom_containment
FROM hits
GROUP BY doc_id, n_shingles
""",
)


# ---------------------------------------------------------------------------
# Within-document repetition metrics (round 4) — the Gopher-rules family
# of quality signals (Rae et al. 2021 §A1.1: fraction of duplicated
# words / n-grams inside a document flags boilerplate and degenerate
# generations). Entirely per-row higher-order-function expressions:
# ZERO shuffles for a full-corpus pass — at 100 TB this runs at scan
# speed, the plan you want for a filter applied to every document. The
# inner count is O(types × tokens) per document, bounded by document
# length, vectorized inside whole-stage codegen.
# ---------------------------------------------------------------------------
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 12 (guide §2.5): every metric here is per-row array math
    # (an O(n log n) sort-fold per doc) with NO shuffle after it — the
    # whole query ran inside the single-split scan task; spread_scan
    # distributes the docs across the session's cores first.
    docs = spread_scan(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = F.split("text", " ")
    types = F.array_distinct(toks)
    n_tok = F.size(toks)
    n_types = F.size(types)
    # top-token count = longest equal-run in the SORTED token array, one
    # O(n log n) fold per row. The obvious nested form —
    # transform(types, t -> size(filter(toks, x = t))) — is quadratic
    # AND re-evaluates the split inside every lambda (Catalyst inlines
    # the expression, not a materialized value): it measured 10.4s at
    # sf0.1 vs ~1s for this fold.
    run_state = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_count = run_state.best
    # 2-grams as zip_with(toks, toks[1:]) — ONE evaluation of the token
    # array per row. An index-transform (element_at(split(...), i)) re-
    # splits the text inside every lambda call (Catalyst inlines the
    # expression): ~100 splits/row, measured 3s of the pass's cost on
    # its own. zip_with pads the shorter side with null, so the last
    # element concat's to null and array_compact drops it.
    grams2 = F.array_compact(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.size(toks)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    n_2g = F.size(grams2)
    dup_2g = F.when(
        n_2g > 0,
        (n_2g - F.size(F.array_distinct(grams2))) / n_2g.cast("double"),
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        ((n_tok - n_types) / n_tok.cast("double")).alias("dup_token_frac"),
        (top_count / n_tok.cast("double")).alias("top_token_frac"),
        dup_2g.alias("dup_2gram_frac"),
    )


_register(
    text_repetition_metrics,
    """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
g AS (
  SELECT doc_id, t,
         list_transform(range(0, len(t) - 1),
                        i -> t[i + 1] || ' ' || t[i + 2]) AS g2
  FROM toks
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       (len(t) - len(list_distinct(t))) / CAST(len(t) AS DOUBLE)
         AS dup_token_frac,
       list_max(list_transform(list_distinct(t),
                u -> len(list_filter(t, x -> x = u))))
         / CAST(len(t) AS DOUBLE) AS top_token_frac,
       CASE WHEN len(g2) > 0
            THEN (len(g2) - len(list_distinct(g2))) / CAST(len(g2) AS DOUBLE)
            ELSE 0.0 END AS dup_2gram_frac
FROM g
""",
)


# ---------------------------------------------------------------------------
# Corpus bigram language-model scoring (round 4) — the KenLM-style
# quality filter of CCNet/Gopher pipelines (Wenzek et al. 2019 §4.3):
# score each document by the average log-probability its own corpus's
# bigram model assigns to it; low scores flag incoherent or
# out-of-distribution text. Two passes over the exploded bigrams:
# (1) model build — bigram and first-word counts plus vocabulary size,
# (2) scoring — join each document's bigrams to the model and average
# add-one-smoothed log P(w2|w1) = ln((c(w1 w2)+1)/(c(w1 ·)+V)).
# At 100 TB the model tables are corpus-sized aggregates, so the joins
# shuffle on the bigram/first-word keys (no broadcast hint — AQE picks
# broadcast when a real deployment's model fits); documents with fewer
# than two tokens have no bigrams and drop out in both engines.
# ---------------------------------------------------------------------------
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    grams2 = F.array_compact(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.size(toks)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    bg = docs.select(
        "doc_id",
        F.explode(grams2).alias("bg"),
    ).withColumn("w1", F.split("bg", " ")[0])
    lm = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    # Round 12 (guide §2.4): c(w1 ·) = Σ c(w1 w2) — the first-word
    # counts fold out of the ALREADY-AGGREGATED bigram-type table
    # (vocabulary-sized) instead of re-running the corpus bigram
    # explode + a second corpus-sized shuffle.
    fc = (
        lm.groupBy(F.split("bg", " ")[0].alias("w1"))
        .agg(F.sum("c_bg").alias("c_w1"))
    )
    vocab = (
        docs.select(F.explode(toks).alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab"))
    )
    logp = F.log(
        (F.col("c_bg") + F.lit(1.0)) / (F.col("c_w1") + F.col("vocab"))
    )
    return (
        bg.join(lm, "bg")
        .join(fc, "w1")
        .crossJoin(vocab)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(logp).alias("lm_logprob"),
        )
    )


_register(
    text_bigram_lm_score,
    """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(0, len(t) - 1),
                               i -> t[i + 1] || ' ' || t[i + 2])) AS bg
  FROM toks
),
withw1 AS (
  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bg
),
lm AS (SELECT bg, COUNT(*) AS c_bg FROM withw1 GROUP BY bg),
fc AS (SELECT w1, COUNT(*) AS c_w1 FROM withw1 GROUP BY w1),
v AS (
  SELECT COUNT(DISTINCT tok) AS vocab
  FROM (SELECT unnest(t) AS tok FROM toks)
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       AVG(ln((c_bg + 1.0) / (c_w1 + vocab))) AS lm_logprob
FROM withw1
JOIN lm USING (bg)
JOIN fc USING (w1)
CROSS JOIN v
GROUP BY doc_id
""",
)


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (round 4): top-3 terms per document by
# tf·idf with the smooth idf = ln((N+1)/(df+1)) + 1 (scikit-learn's
# formulation, public knowledge). Three shuffles total — (doc, token)
# counts, token document-frequencies, and the per-document top-k window
# — all keyed aggregations that scale linearly; the 1-row corpus-size
# aggregate rides along as a crossJoin that AQE turns into a broadcast.
# Ties break on the token string so the rank column is deterministic
# and oracle-checkable.
# ---------------------------------------------------------------------------
TFIDF_TOP_K = 3


def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * (
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df_t") + F.lit(1.0)))
        + F.lit(1.0)
    )
    ranked = (
        tf.join(dfreq, "token")
        .crossJoin(n)
        .withColumn("score", score)
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(
                    F.col("score").desc(), F.col("token")
                )
            ),
        )
    )
    return ranked.filter(F.col("rk") <= TFIDF_TOP_K).select(
        "doc_id", "token", "tf", "score", "rk"
    )


_register(
    text_tfidf_keywords,
    f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
),
dfreq AS (SELECT token, COUNT(*) AS df_t FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token, tf, score, CAST(rk AS INTEGER) AS rk FROM (
  SELECT t.doc_id, t.token, t.tf,
         t.tf * (ln((n_docs + 1.0) / (d.df_t + 1.0)) + 1.0) AS score,
         ROW_NUMBER() OVER (
           PARTITION BY t.doc_id
           ORDER BY t.tf * (ln((n_docs + 1.0) / (d.df_t + 1.0)) + 1.0) DESC,
                    t.token
         ) AS rk
  FROM tf t JOIN dfreq d USING (token) CROSS JOIN n
) WHERE rk <= {TFIDF_TOP_K}
""",
)


# ---------------------------------------------------------------------------
# Deterministic importance sampling (round 4): keep each document with
# probability proportional to its token count — the mixture-reweighting
# primitive of training-data pipelines (upsample long documents /
# downsample boilerplate without a separate pass to materialize
# weights). The Bernoulli draw is the md5-of-doc_id uniform (13 hex
# digits = a double's full 52-bit mantissa), so the sample is a pure
# function of the corpus: reproducible across cluster layouts, re-runs,
# and engines — which is also what makes it fully oracle-checkable,
# unlike rand()-based sampling. One scan + a 1-row max crossJoin (AQE
# broadcast); no shuffle of the corpus itself.
# ---------------------------------------------------------------------------
def text_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    mx = base.agg(F.max("n_tokens").alias("max_tokens"))
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("double") / float(16**13)
    return (
        base.crossJoin(mx)
        .withColumn("p_keep", F.col("n_tokens") / F.col("max_tokens"))
        .filter(u < F.col("p_keep"))
        .select("doc_id", "n_tokens", "p_keep")
    )


_register(
    text_importance_sample,
    """
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
mx AS (SELECT MAX(n_tokens) AS max_tokens FROM base)
SELECT doc_id, n_tokens, n_tokens / max_tokens AS p_keep
FROM base CROSS JOIN mx
WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
           AS BIGINT) / 4503599627370496.0
      < n_tokens / max_tokens
""",
)


# ---------------------------------------------------------------------------
# Embedding outlier scoring (round 4): squared distance of each vector
# to its label's centroid — the embedding-space curation primitive
# (drop far-from-centroid documents as probable mislabels/noise before
# training; cluster-and-filter in the Gopher/DataComp pipelines). One
# posexplode (map-side, no shuffle) → a (label, dim) centroid aggregate
# whose cardinality is labels x dims (tiny — AQE broadcasts it back)
# → one keyed re-aggregation per vector. Everything JVM expressions;
# floats widen to double identically in both engines (CAST to
# DOUBLE[] in the oracle), keeping the 4dp differential stable.
# ---------------------------------------------------------------------------
def embedding_outlier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    cent = ex.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    d = F.col("val") - F.col("c")
    return (
        ex.join(cent, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum(d * d).alias("dist2"))
    )


_register(
    embedding_outlier_score,
    """
WITH ex AS (
  SELECT vec_id, label,
         unnest(range(0, len(embedding))) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM embeddings
),
cent AS (
  SELECT label, pos, AVG(val) AS c FROM ex GROUP BY label, pos
)
SELECT e.vec_id, e.label, SUM((e.val - c.c) * (e.val - c.c)) AS dist2
FROM ex e
JOIN cent c ON e.label = c.label AND e.pos = c.pos
GROUP BY e.vec_id, e.label
""",
)


# ---------------------------------------------------------------------------
# Cross-document boilerplate n-grams (round 4): word 5-grams appearing
# in >= BOILERPLATE_MIN_DOCS distinct documents — the C4-style
# repeated-content detector (Raffel et al. 2020 §2.2 deduplicate
# three-sentence spans repeated across documents; the n-gram doc
# frequency is its scalable form). Per-doc distinct 5-grams come from a
# chained zip_with (each zip references the token array a constant
# number of times — the per-lambda re-evaluation trap measured on
# text_repetition_metrics), then ONE shuffle on the n-gram key. The
# output (a boilerplate lexicon) is corpus-profiling metadata, small
# enough to broadcast back into a removal pass.
# ---------------------------------------------------------------------------
BOILERPLATE_N, BOILERPLATE_MIN_DOCS = 5, 3


def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 12 (guide §2.5): the chained 5-gram zip_with build is the
    # dominant per-row work and ran in the single-split scan task
    # before the ngram shuffle; spread_scan distributes the docs first.
    docs = spread_scan(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = F.split("text", " ")
    grams = toks
    for k in range(1, BOILERPLATE_N):
        grams = F.zip_with(
            grams,
            F.slice(toks, k + 1, F.size(toks)),
            # concat propagates the null padding of the shorter side,
            # so incomplete windows drop in array_compact below
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    per_doc = F.array_distinct(F.array_compact(grams))
    return (
        docs.select(F.explode(per_doc).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= BOILERPLATE_MIN_DOCS)
    )


_register(
    text_boilerplate_ngrams,
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(0, len(t) - {BOILERPLATE_N - 1}),
           i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] || ' ' ||
                t[i + 4] || ' ' || t[i + 5]))) AS ngram
  FROM toks
)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS doc_freq
FROM g GROUP BY ngram
HAVING COUNT(*) >= {BOILERPLATE_MIN_DOCS}
""",
)


# ---------------------------------------------------------------------------
# Near-dup cluster representatives (round 4): the FINAL step of a
# production dedup pipeline, composed end-to-end — LSH candidates →
# exact-Jaccard verify (dedup_lsh_verified) → connected components over
# the verified match graph → keep the minimum doc_id of each cluster as
# its representative. Every document gets a row: members point at their
# cluster representative, singletons at themselves, and
# is_representative marks the keep-set (filtering on it IS the
# deduplicated corpus). The CC runs on the verified PAIRS (tiny
# relative to the corpus — collision-bounded, never all-pairs), so the
# iteration cost is independent of corpus size; the final join is one
# shuffle on doc_id.
# ---------------------------------------------------------------------------
#: (session applicationId, sf_dir) -> persisted (doc_id, component)
#: map of the verified near-dup match graph. The cluster map is the
#: dedup pass's OUTPUT artifact: a production pipeline materializes it
#: once and every downstream consumer (the representatives view, the
#: datasheet, the impact panel, the release filter) reads the
#: materialized table — this memo is that materialization's in-process
#: analog (the _QC_W_CACHE discipline, but holding a session-bound
#: persisted frame, hence the applicationId in the key: a new session
#: can never see another session's frame). Without it every consumer
#: re-pays the full LSH -> exact-verify -> CC-iteration chain.
_CC_COMP_CACHE: dict[tuple[str, str], DataFrame] = {}


def _verified_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    _evict_stale_session_entries(_CC_COMP_CACHE, spark)
    key = (spark.sparkContext.applicationId, sf_dir)
    comp = _CC_COMP_CACHE.get(key)
    if comp is None:
        from pyspark import StorageLevel

        from ..functions.graph import connected_components

        pairs = dedup_lsh_verified(spark, sf_dir).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        comp = (
            connected_components(pairs, max_iterations=20)
            .select(F.col("vertex").alias("doc_id"), "component")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        _CC_COMP_CACHE[key] = comp
    return comp


def dedup_cluster_representatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    comp = _verified_components(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    rep = F.coalesce("component", F.col("doc_id"))
    return docs.join(comp, "doc_id", "left").select(
        "doc_id",
        rep.alias("cluster_rep"),
        (rep == F.col("doc_id")).alias("is_representative"),
    )


_verified_sql = ORACLE["dedup_lsh_verified"].strip()

#: the verified-pairs -> undirected edges -> recursive closure ->
#: min-reach representative CTE chain (assumes a preceding
#: ``WITH RECURSIVE verified AS (...)``). ONE home for the keep-set
#: rule: dedup_cluster_representatives, corpus_datasheet_v3 and
#: dedup_impact_panel all interpolate this fragment, so a change to
#: the representative rule (tie-break, closure form) cannot diverge
#: the three oracles.
_CC_KEEPSET_SQL = """und AS (
  SELECT doc_a AS src, doc_b AS dst FROM verified
  UNION
  SELECT doc_b, doc_a FROM verified
),
r(vertex, reach) AS (
  SELECT DISTINCT src, src FROM und
  UNION
  SELECT r.vertex, e.dst FROM r JOIN und e ON r.reach = e.src
),
cc AS (SELECT vertex, MIN(reach) AS comp FROM r GROUP BY vertex)"""

_register(
    dedup_cluster_representatives,
    # the verified-pair SQL nests wholesale as a CTE body; the closure
    # is the same recursive-CTE technique as connected_components_pipeline
    f"""
WITH RECURSIVE verified AS (
{_verified_sql}
),
{_CC_KEEPSET_SQL}
SELECT d.doc_id,
       COALESCE(cc.comp, d.doc_id) AS cluster_rep,
       COALESCE(cc.comp, d.doc_id) = d.doc_id AS is_representative
FROM documents d
LEFT JOIN cc ON d.doc_id = cc.vertex
""",
)


# ---------------------------------------------------------------------------
# Corpus datasheet (round 4): the per-(source, lang) rollup a dataset
# card reports — document counts, token statistics, and length spread
# (Gebru et al. 2021 "Datasheets for Datasets"; every training-data
# release ships one). One groupBy over expression-level token counts:
# a full-corpus pass with a single tiny-cardinality shuffle.
# ---------------------------------------------------------------------------
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "source", "lang", "text", "n_chars"
    )
    n_tok = F.size(F.split("text", " ")).cast("long")
    return (
        docs.withColumn("n_tokens", n_tok)
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.avg("n_tokens").alias("avg_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


_register(
    corpus_datasheet,
    """
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       AVG(len(string_split(text, ' '))) AS avg_tokens,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY source, lang
""",
)


# ---------------------------------------------------------------------------
# Corpus datasheet v2 (round 5): the v1 per-(source, lang) size rollup
# composed with the already-built quality signals — the artifact a
# 100 TB curation run actually publishes alongside the data release:
#
# - mean composite quality score (text_quality_score's alpha/stopword
#   blend) and the Gopher repetition fractions (text_repetition_metrics'
#   dup-token / dup-2gram signals) — all per-row JVM expressions that
#   ride the same single corpus scan;
# - language-ID mix: agreement rate between the n-gram heuristic
#   (text_lang_id) and the declared lang column, plus the undetermined
#   count — the drift signal that catches mislabeled sources;
# - exact-duplicate rate per group: corpus-WIDE md5 copy counts joined
#   back per doc (a near-1.0 rate for one source = a crawler re-ingest).
#
# Plan shape: one corpus scan with per-row expressions, one keyed
# shuffle on the digest (copy counts; corpus-sized, so NOT broadcast —
# AQE may promote after partial-agg shrinkage), one digest-keyed join,
# and the final tiny-cardinality (source, lang) groupBy.
# ---------------------------------------------------------------------------
def _datasheet_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document datasheet signal frame shared by v2/v3 (batch
    loader wrapper around :func:`datasheet_signals`). Round 12
    (guide §5): persisted — v2 and v3 each scanned the corpus through
    the full signal-expression chain (regexp + token filters + 2-gram
    zip_with per doc), and the exact-dup copy counts now fold out of
    this frame's ``h`` column instead of re-hashing the corpus. Slim
    projection (9 scalar columns), MEMORY_AND_DISK; counts against the
    documented memo inventory (tests/test_memo_occupancy.py)."""
    from pyspark import StorageLevel

    return datasheet_signals(
        load(spark, sf_dir, "documents").select(
            "doc_id", "source", "lang", "text"
        )
    ).persist(StorageLevel.MEMORY_AND_DISK)


def datasheet_signals(docs: DataFrame) -> DataFrame:
    """Per-document datasheet signals over ANY documents frame — batch
    or STREAMING (every signal is an expression; no shuffle, no state):
    token count, composite quality (alpha/stopword blend, ANSI-safe
    try_divide), Gopher repetition fractions, and the n-gram lang-ID
    prediction."""
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    # try_divide: empty text -> NULL (ANSI-safe; DuckDB x/0 is NULL too).
    alpha_ratio = F.try_divide(
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")), F.length("text")
    )
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))) / n_tok
    quality = 0.5 * alpha_ratio + 0.5 * stop_ratio
    dup_token_frac = (n_tok - F.size(F.array_distinct(toks))) / n_tok.cast(
        "double"
    )
    grams2 = F.array_compact(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.size(toks)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    n_2g = F.size(grams2)
    dup_2gram_frac = F.when(
        n_2g > 0,
        (n_2g - F.size(F.array_distinct(grams2))) / n_2g.cast("double"),
    ).otherwise(F.lit(0.0))

    def _marker_pred(markers: tuple[str, ...]):
        return lambda t: t.isin(*markers)

    score = {
        lang: F.size(F.filter(toks, _marker_pred(m)))
        for lang, m in _LANG_MARKERS.items()
    }
    pred_lang = (
        F.when(
            (score["en"] >= score["de"])
            & (score["en"] >= score["fr"])
            & (score["en"] >= score["es"])
            & (score["en"] > 0),
            "en",
        )
        .when(
            (score["de"] >= score["fr"])
            & (score["de"] >= score["es"])
            & (score["de"] > 0),
            "de",
        )
        .when((score["fr"] >= score["es"]) & (score["fr"] > 0), "fr")
        .when(score["es"] > 0, "es")
        .otherwise("und")
    )
    return docs.select(
        "doc_id",
        "source",
        "lang",
        F.md5("text").alias("h"),
        n_tok.cast("long").alias("n_tokens"),
        quality.alias("quality"),
        dup_token_frac.alias("dup_token_frac"),
        dup_2gram_frac.alias("dup_2gram_frac"),
        pred_lang.alias("pred_lang"),
    )


def _datasheet_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide md5 copy counts (the exact-dup-rate shuffle) —
    round 12: one keyed aggregate over the persisted per-doc frame's
    already-computed ``h`` column (was: a second corpus scan + md5
    pass per datasheet)."""
    return (
        _datasheet_per_doc(spark, sf_dir)
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("copies"))
    )


def _datasheet_signal_aggs() -> list:
    """The (source, lang) rollup columns derivable from per-doc signals
    ALONE — shared verbatim by the batch v2/v3 datasheets and the
    streaming monitor (corpus_datasheet_stream), so the two cannot
    drift."""
    return [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("n_tokens").alias("avg_tokens"),
        F.avg("quality").alias("avg_quality"),
        F.avg("dup_token_frac").alias("avg_dup_token_frac"),
        F.avg("dup_2gram_frac").alias("avg_dup_2gram_frac"),
        F.avg(
            F.when(F.col("pred_lang") == F.col("lang"), 1.0).otherwise(0.0)
        ).alias("lang_id_match_frac"),
        F.sum(F.when(F.col("pred_lang") == "und", 1).otherwise(0))
        .cast("bigint")
        .alias("n_pred_und"),
    ]


def _datasheet_aggs() -> list:
    """The batch rollup list: the shared signal aggregates plus the
    corpus-wide exact-dup rate (needs the copies join — batch-only)."""
    return _datasheet_signal_aggs() + [
        F.avg(F.when(F.col("copies") > 1, 1.0).otherwise(0.0)).alias(
            "exact_dup_frac"
        ),
    ]


def corpus_datasheet_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _datasheet_per_doc(spark, sf_dir)
        .join(_datasheet_copies(spark, sf_dir), "h")
        .groupBy("source", "lang")
        .agg(*_datasheet_aggs())
    )


#: Shared CTE prefix for the v2/v3 oracles: the per-doc signal frame and
#: the corpus-wide copy counts, one definition so the two datasheets
#: cannot drift apart.
_DATASHEET_CTES = f"""base AS (
  SELECT doc_id, source, lang, text, md5(text) AS h,
         string_split(text, ' ') AS t
  FROM documents
),
per_doc AS (
  SELECT doc_id, source, lang, h,
         CAST(len(t) AS BIGINT) AS n_tokens,
         0.5 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                / length(text))
         + 0.5 * (len(list_filter(t, x -> x IN ({_stop_in}))) / len(t))
           AS quality,
         (len(t) - len(list_distinct(t))) / CAST(len(t) AS DOUBLE)
           AS dup_token_frac,
         CASE WHEN len(t) > 1 THEN
           (len(t) - 1 - len(list_distinct(
              list_transform(range(0, len(t) - 1),
                             i -> t[i + 1] || ' ' || t[i + 2]))))
           / CAST(len(t) - 1 AS DOUBLE)
         ELSE 0.0 END AS dup_2gram_frac,
         CASE WHEN {_s['en']} >= {_s['de']} AND {_s['en']} >= {_s['fr']}
                   AND {_s['en']} >= {_s['es']} AND {_s['en']} > 0 THEN 'en'
              WHEN {_s['de']} >= {_s['fr']} AND {_s['de']} >= {_s['es']}
                   AND {_s['de']} > 0 THEN 'de'
              WHEN {_s['fr']} >= {_s['es']} AND {_s['fr']} > 0 THEN 'fr'
              WHEN {_s['es']} > 0 THEN 'es'
              ELSE 'und' END AS pred_lang
  FROM base
),
copies AS (SELECT h, COUNT(*) AS copies FROM base GROUP BY h)"""

_DATASHEET_SELECT = """source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       AVG(n_tokens) AS avg_tokens,
       AVG(quality) AS avg_quality,
       AVG(dup_token_frac) AS avg_dup_token_frac,
       AVG(dup_2gram_frac) AS avg_dup_2gram_frac,
       AVG(CASE WHEN pred_lang = lang THEN 1.0 ELSE 0.0 END)
         AS lang_id_match_frac,
       CAST(SUM(CASE WHEN pred_lang = 'und' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pred_und,
       AVG(CASE WHEN c.copies > 1 THEN 1.0 ELSE 0.0 END) AS exact_dup_frac"""

_register(
    corpus_datasheet_v2,
    f"""
WITH {_DATASHEET_CTES}
SELECT {_DATASHEET_SELECT}
FROM per_doc p JOIN copies c USING (h)
GROUP BY source, lang
""",
)


# ---------------------------------------------------------------------------
# Corpus datasheet v3 (round 6): v2 plus the near-dup signal — the one
# column a publishable data card still lacked. Joins the keep-set from
# dedup_cluster_representatives (LSH candidates -> exact-Jaccard verify
# -> connected components -> min-id representative) back per document
# and reports, per (source, lang):
#   near_dup_frac    — fraction of docs that are NOT their cluster's
#                      representative (what near-dup dedup would drop);
#   n_representatives — the kept-corpus size for the group.
# Plan shape on top of v2: the CC runs on the verified pair set (tiny,
# collision-bounded — never corpus-quadratic) and joins back on doc_id,
# so the added cost at 100 TB is one keyed join, not a new corpus pass.
# ---------------------------------------------------------------------------
def corpus_datasheet_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # join the CLUSTER MAP (one row per vertex of the verified match
    # graph — tiny relative to the corpus, broadcastable) straight onto
    # the per-doc frame, not dedup_cluster_representatives' output: its
    # docs⋈comp materialization would make this a corpus×corpus
    # shuffle join at 100 TB for columns v3 can derive with a coalesce.
    # The map itself is the shared persisted _verified_components frame.
    comp = _verified_components(spark, sf_dir)
    is_rep = F.coalesce("component", F.col("doc_id")) == F.col("doc_id")
    return (
        _datasheet_per_doc(spark, sf_dir)
        .join(_datasheet_copies(spark, sf_dir), "h")
        .join(comp, "doc_id", "left")
        .withColumn("is_representative", is_rep)
        .groupBy("source", "lang")
        .agg(
            *_datasheet_aggs(),
            F.avg(
                F.when(F.col("is_representative"), 0.0).otherwise(1.0)
            ).alias("near_dup_frac"),
            F.sum(F.when(F.col("is_representative"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_representatives"),
        )
    )


_register(
    corpus_datasheet_v3,
    # the recursive-CTE closure is the shared _CC_KEEPSET_SQL fragment
    # (the dedup_cluster_representatives rule); the datasheet CTEs are
    # the shared v2 fragment
    f"""
WITH RECURSIVE verified AS (
{_verified_sql}
),
{_CC_KEEPSET_SQL},
{_DATASHEET_CTES}
SELECT {_DATASHEET_SELECT},
       AVG(CASE WHEN COALESCE(cc.comp, p.doc_id) <> p.doc_id
                THEN 1.0 ELSE 0.0 END) AS near_dup_frac,
       CAST(SUM(CASE WHEN COALESCE(cc.comp, p.doc_id) = p.doc_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_representatives
FROM per_doc p
JOIN copies c USING (h)
LEFT JOIN cc ON p.doc_id = cc.vertex
GROUP BY source, lang
""",
)


# ---------------------------------------------------------------------------
# Document chunking (round 6): fixed token windows with overlap — the
# tokenize-and-chunk step every pretraining pipeline runs between
# curation and the trainer (window CHUNK_SIZE, stride CHUNK_STRIDE,
# overlap = size - stride). Pure per-row expressions: a sequence of
# window starts exploded against the token array, no shuffle anywhere,
# output rows linear in corpus tokens — the shape that holds at
# 100 TB. Each chunk row carries (doc_id, chunk_idx, start_tok,
# chunk_len, chunk_text); the final window may be short, and a doc
# shorter than one window yields exactly one chunk.
# ---------------------------------------------------------------------------
CHUNK_SIZE, CHUNK_STRIDE = 32, 24


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    starts = F.sequence(
        F.lit(0),
        # last start strictly below n_tok, stride-aligned
        ((n_tok - 1) / CHUNK_STRIDE).cast("int") * CHUNK_STRIDE,
        F.lit(CHUNK_STRIDE),
    )
    chunked = docs.select(
        "doc_id",
        toks.alias("t"),
        n_tok.alias("n_tok"),
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    # slice is 1-based; chunk may run past the end (slice truncates)
    piece = F.slice(F.col("t"), F.col("start_tok") + 1, CHUNK_SIZE)
    return chunked.select(
        "doc_id",
        "chunk_idx",
        # long to match the oracle's BIGINT exactly — the driver's
        # value-hash is Arrow-buffer type-sensitive (int32 != int64)
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(piece).cast("int").alias("chunk_len"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


_register(
    text_chunk_windows,
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
),
starts AS (
  SELECT doc_id, t,
         unnest(range(0, ((n_tok - 1) // {CHUNK_STRIDE}) * {CHUNK_STRIDE} + 1,
                      {CHUNK_STRIDE})) AS start_tok
  FROM toks
),
numbered AS (
  SELECT doc_id, t, start_tok,
         CAST(start_tok // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
         list_slice(t, start_tok + 1, start_tok + {CHUNK_SIZE}) AS piece
  FROM starts
)
SELECT doc_id, chunk_idx, CAST(start_tok AS BIGINT) AS start_tok,
       CAST(len(piece) AS INTEGER) AS chunk_len,
       array_to_string(piece, ' ') AS chunk_text
FROM numbered
""",
)


# ---------------------------------------------------------------------------
# Vocabulary coverage (round 6; restructured round 7): the corpus
# token-frequency head with rank and cumulative coverage fraction — the
# artifact a tokenizer/BPE training run reads first ("how many types
# cover 99% of tokens"). One corpus scan + one shuffle on the token
# key; the head is taken with orderBy().limit() — Spark plans that as
# TakeOrderedAndProject, a per-partition top-K heap merged on one
# K-sized reduce, so NO task ever sorts the full token-type table (at
# 100 TB of web text the type table is billions of rows — URLs, typos,
# numbers — and the round-6 global rank window forced it all through
# one task; this was the r6 verdict's scale-killer #2). The corpus
# total rides in as a 1-row aggregate broadcast, and the cumulative
# window runs only over the ≤VOCAB_TOP_K survivors (bounded frame —
# the one place a single-partition window is legitimate).
# ---------------------------------------------------------------------------
VOCAB_TOP_K = 50


def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    total = freq.agg(F.sum("freq").alias("total"))
    head = freq.orderBy(F.desc("freq"), F.asc("token")).limit(VOCAB_TOP_K)
    w = W.orderBy(F.desc("freq"), F.asc("token"))
    return head.crossJoin(F.broadcast(total)).select(
        "token",
        "freq",
        F.row_number().over(w).alias("rank"),
        (
            F.sum("freq").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            / F.col("total")
        ).alias("cum_frac"),
    )


_register(
    text_vocab_coverage,
    f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY token
),
ranked AS (
  SELECT token, freq,
         CAST(ROW_NUMBER() OVER w AS INTEGER) AS rank,
         SUM(freq) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_freq,
         SUM(freq) OVER () AS total
  FROM freq
  WINDOW w AS (ORDER BY freq DESC, token ASC)
)
SELECT token, freq, rank, cum_freq / total AS cum_frac
FROM ranked WHERE rank <= {VOCAB_TOP_K}
""",
)


# ---------------------------------------------------------------------------
# Token-length histogram (round 6): per-(source) power-of-two length
# buckets with counts and in-source share — the length-distribution
# panel of a data card (and the input to maxPartitionBytes / packing
# decisions in a training loader). One scan, one tiny-cardinality
# groupBy: buckets × sources rows.
# ---------------------------------------------------------------------------
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("source", "text")
    n_tok = F.size(F.split("text", " "))
    bucket = F.floor(F.log2(n_tok.cast("double"))).cast("int")
    per = docs.select("source", bucket.alias("len_bucket"))
    counts = per.groupBy("source", "len_bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = W.partitionBy("source")
    return counts.select(
        "source",
        "len_bucket",
        "n_docs",
        (F.col("n_docs") / F.sum("n_docs").over(w)).alias("share"),
    )


_register(
    text_length_histogram,
    """
WITH per AS (
  SELECT source,
         CAST(floor(log2(len(string_split(text, ' ')))) AS INTEGER)
           AS len_bucket
  FROM documents
),
counts AS (
  SELECT source, len_bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM per GROUP BY source, len_bucket
)
SELECT source, len_bucket, n_docs,
       n_docs / CAST(SUM(n_docs) OVER (PARTITION BY source) AS DOUBLE)
         AS share
FROM counts
""",
)


# ---------------------------------------------------------------------------
# Count-min sketch over corpus token frequencies (round 6): the
# mergeable frequency sketch (Cormode & Muthukrishnan 2005) every
# streaming frequency-capping / heavy-hitter pass leans on. DEPTH
# salted hash rows × WIDTH buckets; point estimate = min over rows of
# the bucket count, always an OVERestimate. Hashes are md5-based (the
# repo's cross-engine idiom), so the sketch TABLE itself is
# deterministic and oracle-equal — unlike an approx-agg whose internal
# state differs per engine, this sketch is differential bit-for-bit.
#
# Plan: one corpus scan, a 4-wide posexplode (rows linear in tokens),
# one groupBy whose partial aggregate collapses map-side to ≤
# DEPTH×WIDTH rows per partition — the shuffle carries sketch-sized
# data regardless of corpus size. That is the 100 TB story: the sketch
# is the only thing that moves.
# ---------------------------------------------------------------------------
CMS_DEPTH, CMS_WIDTH = 4, 256


def sketch_count_min_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    buckets = F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("t"), F.lit(f"#cms{i}"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % CMS_WIDTH
            ).cast("int")
            for i in range(CMS_DEPTH)
        ]
    )
    # Round 12 (guide §2.3): the DEPTH salted md5s depend on the token
    # alone — count occurrences per TYPE first (one keyed aggregate,
    # map-side combined), then hash each type once and SUM the type
    # counts into the buckets. Identical sketch table (bucket counts
    # are sums over the same multiset), md5 work now
    # vocabulary-bounded, not corpus-bounded. NB: deriving the type
    # counts from the shared _word_counts_sw frame instead was tried
    # and REVERTED (0.31 → 0.38 s matched A/B): the sketch's own
    # explode + map-side combine already collapses to type size in one
    # stage, and the extra cache-read stage is pure scheduling tax on
    # this cheap consumer (the batch-3 _shingled lesson).
    tok = load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("t")
    )
    tf = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        tf.select("cnt", F.posexplode(buckets).alias("row_id", "bucket"))
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


_register(
    sketch_count_min_tokens,
    f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
),
e AS (
  SELECT CAST(i AS INTEGER) AS row_id,
         CAST(CAST(concat('0x', substr(md5(t || '#cms' || i), 1, 8))
                   AS BIGINT) % {CMS_WIDTH} AS INTEGER) AS bucket
  FROM tok, range(0, {CMS_DEPTH}) r(i)
)
SELECT row_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
FROM e GROUP BY 1, 2
""",
)


# ---------------------------------------------------------------------------
# Streaming datasheet (round 6): live maintenance of the per-
# (source, lang) data card DURING ingest — the monitoring panel a
# 100 TB crawl pipeline watches while documents arrive, built from the
# SAME per-doc signal expressions as the batch datasheets (one shared
# definition, so batch and stream cannot drift). Update-mode keyed
# aggregate: state is one row per (source, lang).
#
# Deliberately EXCLUDED from this single-query stream variant:
# exact_dup_frac (it needs corpus-wide digest counts — a second
# stateful aggregate, which Structured Streaming does not chain in
# update mode; :class:`StreamingDatasheet` below closes that gap with
# a second query + store-merge) and the near-dup columns (the LSH/CC
# composition legitimately stays a batch job). The batch
# corpus_datasheet_v2/v3 remain the authoritative release artifacts.
# ---------------------------------------------------------------------------
def corpus_datasheet_stream(docs_stream: DataFrame) -> DataFrame:
    """Streaming per-(source, lang) datasheet aggregate over a
    documents STREAM with columns (doc_id, source, lang, text). Returns
    the update-mode aggregate frame; attach a sink (memory /
    foreachBatch upsert) to serve it."""
    per_doc = datasheet_signals(docs_stream)
    return per_doc.groupBy("source", "lang").agg(*_datasheet_signal_aggs())


def corpus_digest_counts_stream(docs_stream: DataFrame) -> DataFrame:
    """Cumulative copy counts per (text digest, source, lang) over the
    ingest stream — the streaming half of the exact-dup rate. Update
    mode keeps the counts CUMULATIVE per key, which is what makes the
    foreachBatch store upsert idempotent under micro-batch replay
    (latest row per key wins; a delta-append would double-count)."""
    return docs_stream.groupBy(
        F.md5("text").alias("h"), "source", "lang"
    ).agg(F.count(F.lit(1)).alias("cnt"))


class StreamingDatasheet:
    """Round-7 closure of the streaming exact-dup gap: the live data
    card INCLUDING ``exact_dup_frac``, maintained by two update-mode
    keyed aggregates over the SAME ingest stream, each upserted into a
    parquet-backed key table (the ``ExternalQueryableState`` /
    ``ContinuousAggregate`` partial-algebra pattern,
    streaming/rollup.py):

    * the signal card — one state row per (source, lang)
      (:func:`corpus_datasheet_stream`, the shared expression set);
    * digest counts — one state row per (md5, source, lang)
      (:func:`corpus_digest_counts_stream`).

    ``card(spark)`` merges the stores: a digest is a corpus-wide
    duplicate when the SUM of its per-group counts exceeds 1, and a
    group's ``exact_dup_frac`` is its duplicate-doc mass over its doc
    count — algebraically identical to the batch v2 definition (the
    differential in tests/test_corpus_datasheet.py pins every column).

    100 TB note: the digest aggregate's state is one row per distinct
    text — the unavoidable price of an EXACT rate (RocksDB state store
    / state-store-in-cloud territory; the sketch family above is the
    approximate alternative when that state is too dear). The serve
    query is a distributed agg + broadcast-able join over the digest
    store, not a driver loop. Near-dup columns stay batch-only.
    """

    def __init__(self, base_path: str):
        from ..streaming.core import ExternalQueryableState

        self._card_store = ExternalQueryableState(
            "__ckey", base_path.rstrip("/") + "/card"
        )
        self._digest_store = ExternalQueryableState(
            "__ckey", base_path.rstrip("/") + "/digests"
        )

    def attach(self, docs_stream: DataFrame, checkpoint_base: str | None = None):
        """Start both maintenance queries; returns (card_q, digest_q)
        — caller owns stop()."""

        def _start(agg_df, store, name):
            w = agg_df.writeStream.outputMode("update").foreachBatch(
                store.on_batch
            )
            if checkpoint_base is not None:
                w = w.option(
                    "checkpointLocation", f"{checkpoint_base.rstrip('/')}/{name}"
                )
            return w.start()

        card = corpus_datasheet_stream(docs_stream).withColumn(
            "__ckey", F.struct("source", "lang")
        )
        digests = corpus_digest_counts_stream(docs_stream).withColumn(
            "__ckey", F.struct("h", "source", "lang")
        )
        return (
            _start(card, self._card_store, "card"),
            _start(digests, self._digest_store, "digests"),
        )

    def card(self, spark: SparkSession) -> DataFrame:
        """The live datasheet as of the last committed micro-batches:
        the signal columns plus exact_dup_frac.

        The two stores are maintained by two INDEPENDENT streaming
        queries, so in live operation one can be a committed batch
        ahead of the other. The merge is therefore a LEFT join from
        the signal store: a (source, lang) group the digest query has
        not caught up to yet appears with ``exact_dup_frac`` NULL
        (stale-marker) rather than silently vanishing from the card.
        Under ``processAllAvailable`` (the test path) both stores are
        drained, no NULLs appear, and the batch differential pins
        every column."""
        sig = self._card_store.snapshot_df(spark).drop("__ckey")
        dg = self._digest_store.snapshot_df(spark).drop("__ckey")
        glob = dg.groupBy("h").agg(F.sum("cnt").alias("copies"))
        dup = (
            dg.join(glob, "h")
            .groupBy("source", "lang")
            .agg(
                (
                    F.sum(
                        F.when(F.col("copies") > 1, F.col("cnt")).otherwise(
                            F.lit(0)
                        )
                    )
                    / F.sum("cnt")
                ).alias("exact_dup_frac")
            )
        )
        return sig.join(dup, ["source", "lang"], "left")


# ---------------------------------------------------------------------------
# PMI collocations (round 6): pointwise mutual information of adjacent
# token bigrams — the collocation/phrase-detection artifact an
# embedding or tokenizer-merge pipeline computes over the corpus
# (Church & Hanks 1990; word2vec's phrase pass uses the same score).
# PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p over the corpus bigram /
# unigram streams.
#
# Plan: two column-pruned scans of the text column (the bigram and
# unigram streams are independent explode subtrees; at 100 TB each
# scan reads ONE pruned column, and fusing them behind a persist would
# trade the second scan for materializing the exploded token stream —
# strictly worse) feeding two keyed aggregations + two keyed joins
# back on the word, all shuffles on token keys. The corpus totals are
# 1-row aggregates broadcast-crossJoined onto the filtered pair table
# (see the in-function note — restructured round 7 away from
# unpartitioned windows, which put the full bigram-type table on one
# task). Output is cut at PMI_MIN_COUNT, bounding cardinality by
# frequent-bigram count.
# ---------------------------------------------------------------------------
PMI_MIN_COUNT = 5


def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("text")
    toks = F.split("text", " ")
    prs = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.size(toks)),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda p: p.w2.isNotNull(),
    )
    pairs = docs.select(F.explode(prs).alias("p")).select("p.w1", "p.w2")
    uni = docs.select(F.explode(toks).alias("w"))

    # Corpus totals as 1-row aggregates broadcast onto the filtered
    # pair table (round-7 restructure): the round-6 version computed
    # t_total/p_total with unpartitioned windows over the unigram- and
    # bigram-TYPE tables — at 100 TB the bigram-type table is tens of
    # billions of rows, all funnelled through ONE window task. A 1-row
    # agg + broadcast crossJoin keeps both totals map-side-combined
    # and the crossJoin cost at one row per partition (the documented
    # "1-row stats join" pattern, cf. triadic_census). Totals are taken
    # BEFORE the min-count filter, as PMI's probabilities require.
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    t_tot = uc.agg(F.sum("c").alias("t_total"))
    p_tot = pc.agg(F.sum("pair_count").alias("p_total"))
    c1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        pc.filter(F.col("pair_count") >= PMI_MIN_COUNT)
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(p_tot))
        .join(c1, "w1")
        .join(c2, "w2")
        .select(
            "w1",
            "w2",
            "pair_count",
            F.log(
                (F.col("pair_count") / F.col("p_total"))
                / (
                    (F.col("c1") / F.col("t_total"))
                    * (F.col("c2") / F.col("t_total"))
                )
            ).alias("pmi"),
        )
    )


_register(
    text_pmi_bigrams,
    f"""
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
pr AS (
  SELECT unnest(list_transform(range(0, len(t) - 1),
                               i -> {{'w1': t[i + 1], 'w2': t[i + 2]}})) AS p
  FROM toks
),
pc AS (
  SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS pair_count
  FROM pr GROUP BY 1, 2
),
uc AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
),
tot AS (SELECT SUM(c) AS t_total FROM uc),
ptot AS (SELECT SUM(pair_count) AS p_total FROM pc)
SELECT w1, w2, CAST(pair_count AS BIGINT) AS pair_count,
       ln((pair_count / p_total) /
          ((c1.c / t_total) * (c2.c / t_total))) AS pmi
FROM pc, tot, ptot
JOIN uc c1 ON pc.w1 = c1.w
JOIN uc c2 ON pc.w2 = c2.w
WHERE pair_count >= {PMI_MIN_COUNT}
""",
)


# ---------------------------------------------------------------------------
# Round 7 — training-data pipeline operators, part 4: the release
# mechanics a 100 TB curation run performs after dedup/quality — split
# assignment, per-domain capping, stratified rebalancing, incremental
# ingest dedup, and a mergeable distinct-count sketch. All hashes are
# the repo's cross-engine salted-md5 idiom (deterministic, oracle-equal
# bit-for-bit — no RNG, so a re-run or a backfill assigns every
# document identically, which is what makes hash-based splits the
# production norm over random ones).
# ---------------------------------------------------------------------------

def _md5_bucket(col, salt: str, mod: int):
    """First 8 md5 hex chars of (col || salt) as a bigint in [0, mod) —
    the engine-portable uniform hash (cf. sketch_count_min_tokens)."""
    return (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(salt))), 1, 8), 16, 10)
        .cast("bigint")
        % mod
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (80/10/10 by doc_id hash) with a
# per-(split, source) doc/token summary — the first sanity panel after
# cutting a release: does every source actually land in every split.
# Plan: one scan with per-row expressions, then a (3 × sources)-row
# groupBy — map-side combine collapses to tiny partials; nothing else
# shuffles. Hash-based assignment keeps the split STABLE under
# re-partitioning, backfills, and incremental appends (a random split
# would re-deal on every run and leak val into train).
# ---------------------------------------------------------------------------
def _split_expr(doc_id_col):
    """The ONE definition of split membership — shared by
    corpus_train_split and split_leakage_audit so the audited splits
    cannot drift from the assigned ones (the datasheet_signals
    argument)."""
    h = _md5_bucket(doc_id_col.cast("string"), "#split", 100)
    return F.when(h < 80, "train").when(h < 90, "val").otherwise("test")


#: DuckDB twin of _split_expr, spliced into both oracles.
_SPLIT_SQL = """CASE
           WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 8))
                     AS BIGINT) % 100 < 80 THEN 'train'
           WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 8))
                     AS BIGINT) % 100 < 90 THEN 'val'
           ELSE 'test'
         END"""


def corpus_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    split = _split_expr(F.col("doc_id"))
    return (
        docs.select(
            split.alias("split"),
            "source",
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )


_register(
    corpus_train_split,
    f"""
WITH a AS (
  SELECT {_SPLIT_SQL} AS split,
         source,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
)
SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM a GROUP BY 1, 2
""",
)


# ---------------------------------------------------------------------------
# Split-leakage audit: n-gram contamination of the val/test splits BY
# the train split of the same release — the check a benchmark-hygiene
# pass runs before shipping (an eval doc sharing verbatim 3-gram
# shingles with train inflates downstream scores; Brown et al. 2020
# §C ran exactly this audit for GPT-3). Composes the release's own
# hash-split definition (_split_expr — the audited splits ARE the
# assigned ones) with the decontamination shingle machinery.
# Plan: one shingle pass, a distinct on train shingles, then an
# eval-shingle ⋈ train-shingle hash join SHUFFLED on the shingle key —
# deliberately NOT broadcast: at 100 TB the train shingle set is
# corpus-sized (the small side is the eval explode, and AQE picks the
# build side). Per-doc counts then a (split × source)-row rollup.
# ---------------------------------------------------------------------------
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    tagged = (
        _shingled(spark, sf_dir)
        .select("doc_id", F.array_distinct("shingles").alias("sset"))
        .join(docs, "doc_id")
        .withColumn("split", _split_expr(F.col("doc_id")))
    )
    train_sh = (
        tagged.filter(F.col("split") == "train")
        .select(F.explode("sset").alias("s"))
        .distinct()
    )
    ev = tagged.filter(F.col("split") != "train")
    leaked = (
        ev.select("doc_id", F.explode("sset").alias("s"))
        .join(train_sh, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    per_doc = ev.select("doc_id", "split", "source").join(
        leaked, "doc_id", "left"
    )
    return per_doc.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_shared") >= 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_leaky"),
        F.avg(
            F.when(F.col("n_shared") >= 1, 1.0).otherwise(0.0)
        ).alias("leak_frac"),
    )


_register(
    split_leakage_audit,
    f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), tagged AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(0, len(t) - 2),
             i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS sset,
         {_SPLIT_SQL} AS split
  FROM toks
), train_sh AS (
  SELECT DISTINCT UNNEST(sset) AS s FROM tagged WHERE split = 'train'
), ev_sh AS (
  SELECT doc_id, UNNEST(sset) AS s FROM tagged WHERE split <> 'train'
), leaked AS (
  SELECT doc_id, COUNT(*) AS n_shared
  FROM ev_sh JOIN train_sh USING (s) GROUP BY 1
)
SELECT t.split, t.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN l.n_shared >= 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaky,
       AVG(CASE WHEN l.n_shared >= 1 THEN 1.0 ELSE 0.0 END) AS leak_frac
FROM tagged t LEFT JOIN leaked l ON t.doc_id = l.doc_id
WHERE t.split <> 'train'
GROUP BY 1, 2
""",
)


# ---------------------------------------------------------------------------
# Per-domain frequency cap: keep at most DOMAIN_CAP_N documents per
# source, chosen in deterministic hash order (the anti-boilerplate /
# anti-SEO-farm trim — one domain may not dominate the corpus no
# matter how many pages it contributes). The row_number-≤-N filter is
# planned by Spark as WindowGroupLimit (rank-limit pushdown): each map
# task keeps a per-source N-row heap BEFORE the shuffle, so the
# exchange carries ≤ N rows per (task, source) and the final per-source
# sort touches ≤ tasks×N rows — a giant domain never funnels its full
# page list through one task (verified in tests/test_queries_extra.py).
# ---------------------------------------------------------------------------
DOMAIN_CAP_N = 20


def text_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    ord_h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#cap")))
    w = W.partitionBy("source").orderBy(ord_h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DOMAIN_CAP_N)
        .select("doc_id", "source", F.col("rk").cast("int").alias("rk"))
    )


_register(
    text_domain_cap,
    f"""
WITH r AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '#cap'), doc_id
         ) AS INTEGER) AS rk
  FROM documents
)
SELECT doc_id, source, rk FROM r WHERE rk <= {DOMAIN_CAP_N}
""",
)


# ---------------------------------------------------------------------------
# Stratified language rebalancing: downsample every language to the
# size of the SMALLEST one by deterministic hash thresholding (the
# md5-uniform u < min_count/lang_count), the curation move that stops
# English from being 10× of everything else in the release. Plan: a
# languages-sized groupBy, a 1-row min broadcast onto it, then one
# per-doc expression filter behind a broadcast equi-join on lang — the
# document stream itself never shuffles. Determinism makes the sample
# reproducible and append-stable (a re-run keeps exactly the same
# documents; cf. the sampling discussion in SCALE.md).
# ---------------------------------------------------------------------------
def sample_stratified_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mn = counts.agg(F.min("n").alias("mn"))
    frac = counts.crossJoin(F.broadcast(mn)).select(
        "lang", (F.col("mn") / F.col("n")).alias("frac")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#strat"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    return (
        docs.join(F.broadcast(frac), "lang")
        .filter(u < F.col("frac"))
        .select("doc_id", "lang")
    )


_register(
    sample_stratified_lang,
    """
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
m AS (SELECT MIN(n) AS mn FROM c),
f AS (SELECT lang, mn / CAST(n AS DOUBLE) AS frac FROM c, m)
SELECT d.doc_id, d.lang
FROM documents d JOIN f ON d.lang = f.lang
WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR) || '#strat'), 1, 8))
           AS BIGINT) / 4294967296.0 < f.frac
""",
)


# ---------------------------------------------------------------------------
# Incremental ingest dedup: an arriving batch (doc_id % 10 = 0 stands
# in for "today's crawl") is checked against the EXISTING corpus by
# opening-prefix fingerprint — md5 of the first DEDUP_PREFIX_K tokens,
# the cheap header-dup heuristic that catches mirrored articles and
# re-posted boilerplate whose tails differ (raw full-text md5 finds
# nothing here; the LSH family is the expensive follow-up). Plan: one
# scan split into the two sides, then a LEFT ANTI hash join on the
# fingerprint — the canonical at-scale shape for "new data vs corpus"
# (shuffles only digests + ids; with a corpus-side digest table kept
# as a bucketed table the shuffle drops to the batch side alone).
# The anti-join clears the batch against the CORPUS only; two incoming
# documents sharing a fingerprint (both absent from the corpus) would
# otherwise both survive, so a per-fingerprint min-doc_id
# representative pass (row_number window PARTITIONED BY the digest —
# key-partitioned, never global) makes the emitted "kept" set clean
# within the batch too.
# ---------------------------------------------------------------------------
DEDUP_PREFIX_K = 5


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    dg = F.md5(
        F.array_join(F.slice(F.split("text", " "), 1, DEDUP_PREFIX_K), " ")
    )
    d = docs.select("doc_id", "source", dg.alias("dg"))
    incoming = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0).select("dg")
    kept = incoming.join(corpus, "dg", "left_anti")
    w = W.partitionBy("dg").orderBy("doc_id")
    return (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "source")
    )


_register(
    dedup_incremental,
    f"""
WITH d AS (
  SELECT doc_id, source,
         md5(array_to_string(string_split(text, ' ')[1:{DEDUP_PREFIX_K}], ' ')) AS dg
  FROM documents
)
SELECT a.doc_id, a.source FROM d a
WHERE a.doc_id % 10 = 0
  AND NOT EXISTS (SELECT 1 FROM d b WHERE b.doc_id % 10 <> 0 AND b.dg = a.dg)
QUALIFY ROW_NUMBER() OVER (PARTITION BY a.dg ORDER BY a.doc_id) = 1
""",
)


# ---------------------------------------------------------------------------
# HyperLogLog register table over corpus token types (Flajolet et al.
# 2007): the mergeable distinct-count sketch behind every "how many
# unique tokens/urls/users" panel. Like the count-min sketch above, the
# registers are salted-md5-deterministic, so the sketch TABLE is
# oracle-equal bit-for-bit across engines — unlike approx_count_distinct,
# whose internal HLL state is engine-private. Two independent hashes
# (bucket: 8 hex chars; rank source: 12 hex chars = 48 bits) keep the
# leading-zero computation exact STRING arithmetic — no float log2,
# whose libm rounding differs between JVM and C++ at powers of two.
# Plan: explode → (bucket, rho) expressions → groupBy(bucket).max —
# partial aggregation collapses every map task to ≤ HLL_BUCKETS rows,
# so the shuffle carries ≤ tasks × 512 rows regardless of corpus size,
# and duplicate tokens never widen state (max is insert-invariant).
# tests/test_queries_extra.py pins the harmonic-mean estimate within
# HLL's theoretical error of the true distinct count.
# ---------------------------------------------------------------------------
HLL_BUCKETS = 512


def _hll_register_rows(tok: DataFrame, keys: tuple[str, ...] = ()) -> DataFrame:
    """(bucket, rho) rows for a ``t`` token frame — ONE definition
    shared by the batch sketch, its streaming twin, and the per-source
    union matrix (the datasheet_signals no-drift discipline). ``keys``
    carries grouping columns (e.g. source) through unchanged."""
    bucket = _md5_bucket(F.col("t"), "#hllb", HLL_BUCKETS).cast("int")
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
    # rho = leading zeros of the 48-bit value + 1 = 49 - bit_length
    rho = F.when(ln == 0, F.lit(49)).otherwise(49 - (4 * (ln - 1) + bits_first))
    return tok.select(
        *keys, bucket.alias("bucket"), rho.cast("int").alias("rho")
    )


def sketch_hyperloglog_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 12 (guide §5): register rows off the shared persisted
    # word-count frame's key set — max-of-rho is duplicate-insensitive,
    # so hashing each (source, type) pair once yields the identical
    # register table without a corpus-occurrence pass. (An earlier
    # distinct-first variant was reverted at 1.48 → 1.72 s, but it
    # predates the shared frame: it paid a fresh corpus explode PLUS a
    # distinct shuffle; the cache needs neither — no distinct at all,
    # duplicates across sources collapse in the same map-side max.)
    tok = _word_counts_sw(spark, sf_dir).select(F.col("w").alias("t"))
    return (
        _hll_register_rows(tok)
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("rho_max"))
    )


def sketch_hll_registers_stream(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin of :func:`sketch_hyperloglog_tokens`: the live
    distinct-token register table, maintained as an update-mode
    ``groupBy(bucket).max(rho)`` over the ingest stream — the register
    algebra (max) IS the streaming merge, so cumulative state per
    bucket equals the batch sketch over everything ingested so far
    (differential-pinned in tests/test_round8b_ops.py, with the fixture
    split across micro-batches so cross-batch merging is exercised).

    100 TB note: state is ≤ HLL_BUCKETS rows TOTAL (vs the exact
    digest store's row-per-distinct-text in StreamingDatasheet) — this
    is the sketch leg of that documented trade, and why a live
    distinct-count card stays cheap at any corpus size. Serve via
    ``ExternalQueryableState`` keyed on the bucket (upsert-latest is
    correct because the update-mode aggregate is already cumulative).
    """
    tok = docs_stream.select(F.explode(F.split("text", " ")).alias("t"))
    return (
        _hll_register_rows(tok)
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("rho_max"))
    )


_register(
    sketch_hyperloglog_tokens,
    f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
),
r AS (
  SELECT CAST(CAST(concat('0x', substr(md5(t || '#hllb'), 1, 8)) AS BIGINT)
              % {HLL_BUCKETS} AS INTEGER) AS bucket,
         regexp_replace(substr(md5(t || '#hllw'), 1, 12), '^0+', '') AS s
  FROM tok
),
rr AS (
  SELECT bucket,
         CASE WHEN len(s) = 0 THEN 49
              ELSE 49 - (4 * (len(s) - 1) +
                   CASE WHEN s[1] = '1' THEN 1
                        WHEN s[1] IN ('2', '3') THEN 2
                        WHEN s[1] IN ('4', '5', '6', '7') THEN 3
                        ELSE 4 END)
         END AS rho
  FROM r
)
SELECT bucket, CAST(MAX(rho) AS INTEGER) AS rho_max FROM rr GROUP BY 1
""",
)


# ---------------------------------------------------------------------------
# Duplicate-passage detection: EXACT-substring dedup at passage
# granularity (the scale form of Lee et al. 2022's suffix-array
# "deduplicating training data" pass — repeated >=PASSAGE_K-token spans,
# not whole-document dups, which dedup_exact/minhash already cover).
# Instead of a suffix array (quadratic memory per shard), every
# PASSAGE_K-token window is hashed; a window whose hash occurs >=2
# times anywhere in the corpus is a duplicated window, and per document
# the covered token intervals [pos, pos+K-1] are merged into maximal
# spans with a classic interval-merge (cumulative-max window per doc —
# bounded frame, one doc's windows). Output is the (source, lang) data
# card: how much of each slice is copied text.
# Plan / 100 TB: the shingle table is linear in corpus tokens; the
# count>=2 aggregation and the mark join both shuffle on the hash key
# (map-side combine collapses the count); the interval merge windows
# are partitioned by doc_id — no global windows, no all-pairs.
# ---------------------------------------------------------------------------
PASSAGE_K = 8


def text_duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 12 batch 9 (guide §2.5): the per-doc md5-window posexplode
    # is the heaviest scan work and ran in the single-split scan task
    # before the h shuffle; spread_scan distributes the docs first.
    docs = spread_scan(load(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        F.split("text", " ").alias("toks"),
    ).withColumn("n_toks", F.size("toks"))
    sh = base.filter(F.col("n_toks") >= PASSAGE_K).select(
        "doc_id",
        "source",
        "lang",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_toks") - PASSAGE_K),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("toks", i + 1, PASSAGE_K))
                ),
            )
        ).alias("pos", "h"),
    )
    # Round 12 (guide §2.4): the r1-r11 shape aggregated window-hash
    # counts and joined the >=2 set back onto the SAME shingle subtree
    # — two full md5-window passes (the agg side and the join side feed
    # different exchanges, so ReuseExchange cannot dedup them). A
    # partition-only count window over h marks duplicates in ONE pass:
    # same h-keyed shuffle the join needed anyway, no second scan. The
    # window is hash-bucket-bounded (rows per h = the duplicate
    # multiplicity), never a global window.
    marked = (
        sh.withColumn("cnt", F.count(F.lit(1)).over(W.partitionBy("h")))
        .filter(F.col("cnt") >= 2)
        .select("doc_id", "source", "lang", "pos")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + PASSAGE_K - 1).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    isl = marked.withColumn(
        "new_span",
        F.when(
            prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
        ).otherwise(0),
    ).withColumn("span_id", F.sum("new_span").over(w))
    spans = isl.groupBy("doc_id", "source", "lang", "span_id").agg(
        F.min("pos").alias("s"),
        F.max(F.col("pos") + PASSAGE_K - 1).alias("e"),
    )
    per_doc = spans.groupBy("doc_id", "source", "lang").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
    )
    totals = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
    )
    dup_sl = per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("docs_with_dup"),
        F.sum("n_spans").alias("dup_spans"),
        F.sum("dup_tokens").alias("dup_tokens"),
    )
    return (
        totals.join(dup_sl, ["source", "lang"], "left")
        .select(
            "source",
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "total_tokens",
            F.coalesce("docs_with_dup", F.lit(0))
            .cast("bigint")
            .alias("docs_with_dup"),
            F.coalesce("dup_spans", F.lit(0)).cast("bigint").alias("dup_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("bigint")
            .alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("total_tokens")
            ).alias("dup_token_frac"),
        )
    )


_register(
    text_duplicate_passages,
    f"""
WITH base AS (
  SELECT doc_id, source, lang, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n_toks
  FROM documents
), sh AS (
  SELECT doc_id, source, lang, pos,
         md5(array_to_string(t[pos + 1 : pos + {PASSAGE_K}], ' ')) AS h
  FROM base, UNNEST(range(0, n_toks - {PASSAGE_K} + 1)) AS r(pos)
  WHERE n_toks >= {PASSAGE_K}
), dup_h AS (
  SELECT h FROM sh GROUP BY h HAVING COUNT(*) >= 2
), marked AS (
  SELECT s.doc_id, s.source, s.lang, s.pos FROM sh s JOIN dup_h USING (h)
), isl AS (
  SELECT *,
         CASE WHEN prev_e IS NULL OR pos > prev_e + 1 THEN 1 ELSE 0 END AS new_span
  FROM (SELECT doc_id, source, lang, pos,
               MAX(pos + {PASSAGE_K} - 1) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
        FROM marked)
), isl2 AS (
  SELECT *, SUM(new_span) OVER (
    PARTITION BY doc_id ORDER BY pos
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM isl
), spans AS (
  SELECT doc_id, source, lang, span_id,
         MIN(pos) AS s, MAX(pos + {PASSAGE_K} - 1) AS e
  FROM isl2 GROUP BY 1, 2, 3, 4
), per_doc AS (
  SELECT doc_id, source, lang, COUNT(*) AS n_spans,
         SUM(e - s + 1) AS dup_tokens
  FROM spans GROUP BY 1, 2, 3
), totals AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS total_tokens
  FROM base GROUP BY 1, 2
)
SELECT t.source, t.lang,
       CAST(t.n_docs AS BIGINT)                     AS n_docs,
       t.total_tokens,
       CAST(COALESCE(d.docs_with_dup, 0) AS BIGINT) AS docs_with_dup,
       CAST(COALESCE(d.dup_spans, 0) AS BIGINT)     AS dup_spans,
       CAST(COALESCE(d.dup_tokens, 0) AS BIGINT)    AS dup_tokens,
       CAST(COALESCE(d.dup_tokens, 0) AS DOUBLE) / t.total_tokens
                                                    AS dup_token_frac
FROM totals t
LEFT JOIN (SELECT source, lang, COUNT(*) AS docs_with_dup,
                  SUM(n_spans) AS dup_spans, SUM(dup_tokens) AS dup_tokens
           FROM per_doc GROUP BY 1, 2) d USING (source, lang)
""",
)


# ---------------------------------------------------------------------------
# Cross-source overlap matrix: for every source pair, how many
# duplicated passage hashes they SHARE — the data-card panel that tells
# you source B is a scrape of source A before you pay to train on both.
# Exact whole-document digests are too blunt (disjoint at this SF and
# in real mixed crawls); passage hashes catch partial copying. Hub
# guard: a hash spread over > OVERLAP_MAX_SOURCES sources is boilerplate
# (navigation chrome, licence headers), not provenance, and is excluded
# — the same hub-cap mitigation as the bipartite projection (SCALE.md).
# Plan / 100 TB: distinct (h, source) collapses each hash to <= #sources
# rows; the self-join explodes each hash to at most
# C(OVERLAP_MAX_SOURCES, 2) pairs — bounded per key, never all-pairs —
# and the pair groupBy output is #sources^2-bounded (a dashboard table).
# ---------------------------------------------------------------------------
OVERLAP_MAX_SOURCES = 16


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # Round 12 (guide §2.5): the passage-window md5 pass dominates and
    # ran in the single-split scan task; spread first (no-op at scale).
    base = spread_scan(
        docs.select("source", F.split("text", " ").alias("toks"))
    ).withColumn("n_toks", F.size("toks"))
    sh = base.filter(F.col("n_toks") >= PASSAGE_K).select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_toks") - PASSAGE_K),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("toks", i + 1, PASSAGE_K))
                ),
            )
        ).alias("h"),
    )
    hs = sh.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.collect_set("source").alias("srcs"),
    )
    eligible = hs.filter(
        (F.col("cnt") >= 2)
        & (F.size("srcs") >= 2)
        & (F.size("srcs") <= OVERLAP_MAX_SOURCES)
    ).select("h", F.explode("srcs").alias("source"))
    a = eligible.alias("a")
    b = eligible.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_passages"))
    )


_register(
    source_overlap_matrix,
    f"""
WITH base AS (
  SELECT source, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n_toks
  FROM documents
), sh AS (
  SELECT source,
         md5(array_to_string(t[pos + 1 : pos + {PASSAGE_K}], ' ')) AS h
  FROM base, UNNEST(range(0, n_toks - {PASSAGE_K} + 1)) AS r(pos)
  WHERE n_toks >= {PASSAGE_K}
), hs AS (
  SELECT h, COUNT(*) AS cnt, COUNT(DISTINCT source) AS n_srcs
  FROM sh GROUP BY h
), eligible AS (
  SELECT DISTINCT s.h, s.source
  FROM sh s JOIN hs ON s.h = hs.h
  WHERE hs.cnt >= 2 AND hs.n_srcs BETWEEN 2 AND {OVERLAP_MAX_SOURCES}
)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS shared_passages
FROM eligible a JOIN eligible b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2
""",
)


# ---------------------------------------------------------------------------
# Int8 scalar quantization of the embedding column (the compression
# step in front of every large-scale ANN index — FAISS SQ8 semantics:
# per-dimension [min, max] codebook, 255 levels). Returns the codebook
# WITH reconstruction-error stats per dimension, i.e. both the artifact
# a serving index needs and the QA panel that says whether 8 bits are
# enough. Deterministic: quantization is round((x-lo)/scale) on doubles
# — identical IEEE ops in both engines.
# Plan / 100 TB: posexplode is linear (rows × dim); both groupBy(dim)
# aggregations collapse map-side to <= 64 rows per task, so the two
# shuffles carry tasks × dim rows; the codebook joins back as a
# broadcast (dim-sized). No driver collect, no global windows.
# ---------------------------------------------------------------------------
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    el = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    cb = (
        el.groupBy("dim")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .withColumn("scale", (F.col("hi") - F.col("lo")) / F.lit(255.0))
    )
    q = el.join(F.broadcast(cb), "dim").withColumn(
        "qv",
        F.when(
            F.col("scale") > 0,
            F.round((F.col("x") - F.col("lo")) / F.col("scale"), 0),
        ).otherwise(F.lit(0.0)),
    )
    err = F.abs(F.col("qv") * F.col("scale") + F.col("lo") - F.col("x"))
    return (
        q.select("dim", "lo", "hi", "scale", err.alias("err"))
        .groupBy("dim")
        .agg(
            F.min("lo").alias("lo"),
            F.min("hi").alias("hi"),
            F.min("scale").alias("scale"),
            F.avg("err").alias("mean_abs_err"),
            F.max("err").alias("max_abs_err"),
            F.count(F.lit(1)).alias("n_values"),
        )
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            "lo",
            "hi",
            "scale",
            "mean_abs_err",
            "max_abs_err",
            "n_values",
        )
    )


_register(
    embedding_quantize_int8,
    """
WITH el AS (
  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
), cb AS (
  SELECT dim, MIN(x) AS lo, MAX(x) AS hi,
         (MAX(x) - MIN(x)) / 255.0 AS scale
  FROM el GROUP BY dim
), q AS (
  SELECT el.dim, cb.lo, cb.hi, cb.scale,
         CASE WHEN cb.scale > 0
              THEN ROUND((el.x - cb.lo) / cb.scale, 0)
              ELSE 0.0 END AS qv,
         el.x
  FROM el JOIN cb ON el.dim = cb.dim
)
SELECT CAST(dim AS BIGINT) AS dim,
       MIN(lo) AS lo, MIN(hi) AS hi, MIN(scale) AS scale,
       AVG(ABS(qv * scale + lo - x)) AS mean_abs_err,
       MAX(ABS(qv * scale + lo - x)) AS max_abs_err,
       COUNT(*) AS n_values
FROM q GROUP BY dim
""",
)


# ---------------------------------------------------------------------------
# BPE merge training (Sennrich et al. 2016, "Neural Machine Translation
# of Rare Words with Subword Units"): learn the first BPE_N_MERGES merge
# rules from corpus word frequencies — the tokenizer-construction step
# that text_vocab_coverage and text_pmi_bigrams prepare for. Classic
# algorithm: words split to character symbols; each round counts
# adjacent symbol pairs weighted by word frequency, picks the most
# frequent pair (ties: lexicographically smallest — deterministic), and
# replaces its occurrences greedily left-to-right non-overlapping.
# Spark side: the corpus-sized work happens ONCE (token explode →
# word-frequency groupBy); every iteration then runs over the
# VOCABULARY-sized type table — pair explode + groupBy, a bounded
# TakeOrdered candidate collect (the kmeans k-row pattern), and
# shuffle-free F.aggregate folds implementing the greedy merge as pure
# JVM expressions (the merged token a||b can never equal the left
# symbol a, so a plain replace-last fold IS greedy non-overlap).
# localCheckpoint per ROUND (not per merge) cuts the expression
# lineage.
#
# MERGE BATCHING (round 8 — scaling the loop in MERGE COUNT, not just
# data): a real tokenizer build is 30k-50k merges; one Spark job +
# driver round trip PER merge would mean 30k sequential jobs. Instead
# each round collects the top-BPE_BATCH_CAND ranked candidate pairs
# and applies up to BPE_BATCH_M of them in ONE job (chained folds in a
# single select), so the job count scales as ceil(merges / M) when the
# frequency head permits. The batch is chosen so the result is
# PROVABLY identical to the sequential algorithm:
#   1. PREFIX: take candidates in global (cnt DESC, l, r) rank order,
#      stopping at the first CONFLICT — a pair whose symbol set
#      {l, r, l||r} intersects the union of the sets of the pairs
#      already accepted. Batch pairs are then mutually non-interacting:
#      applying any of them changes none of the others' counts or
#      occurrences (destroyed pairs contain an accepted symbol;
#      created pairs contain an accepted merged token).
#   2. STRICT 3x TRIM: let X = cnt of the first excluded candidate
#      (the conflict, the M+1-th, or 0 if the candidate list was
#      exhausted unconflicted — in which case NO pair in the corpus
#      interacts with the batch and no trim is needed). Every pair NOT
#      in the batch ranks at-or-after that candidate, so its pre-batch
#      count is <= X; applying the batch can raise a pair's count only
#      by occurrences created adjacent to a merged token — at most one
#      batch merge produces any given token string (two producers
#      would share it and conflict), so a pair gains at most once per
#      side, each gain bounded by a destroyed (hence conflicting,
#      hence <= X) pair's count: post-batch counts of non-batch pairs
#      are <= 3X. Trimming the batch to the prefix whose counts are
#      STRICTLY > 3X therefore guarantees each kept pair is the exact
#      global argmax (ties impossible at strict >) at its sequential
#      round. Worst case (flat frequencies) the batch degenerates to
#      size 1 = the classic per-merge loop; Zipfian heads batch well.
# tests/test_bpe_batching.py pins (a) equality with a pure-Python
# sequential reference on real data, (b) exactly ceil(N/M) rounds on a
# synthetic disjoint-head corpus, (c) the trim triggering on a
# constructed tie.
# The DuckDB oracle is an INDEPENDENT formulation — island/odd-even
# selection over match positions with a list rebuild — so agreement
# checks the greedy semantics themselves, not a shared shape.
# ---------------------------------------------------------------------------
BPE_N_MERGES = 8
BPE_BATCH_M = 8
BPE_BATCH_CAND = 64


def _bpe_merge_fold(col: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping replace of (a,b)->a||b over
    the ``col`` symbol array, as a sequential fold. Taking the input
    column (rather than pinning F.col("syms")) lets a merge BATCH
    chain m folds into one select — one Spark job per round."""
    merged = F.lit(a + b)

    def step(acc: Column, s: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(col, F.array().cast("array<string>"), step)


def _bpe_select_batch(cands, max_m: int):
    """Pure batching rule over the collected, already-ranked candidate
    rows: longest mutually-non-conflicting prefix (conflict = shared
    symbol or merged-token string), capped at ``max_m``, then trimmed
    so every kept pair's count is strictly > 3 * X where X is the
    count of the first excluded candidate (0 when the full candidate
    list was collected and exhausted without conflict). Returns the
    list of (l, r, cnt) to apply this round — see the proof sketch in
    the block comment above. Split out driverside-pure so the test can
    exercise tie/conflict cases without a SparkSession."""
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    exhausted = True
    bound = 0
    for row in cands:
        toks = {row[0], row[1], row[0] + row[1]}
        if len(batch) >= max_m or toks & used:
            exhausted = False
            bound = int(row[2])
            break
        batch.append((row[0], row[1], int(row[2])))
        used |= toks
    if exhausted and len(cands) >= BPE_BATCH_CAND:
        # the candidate list was truncated at CAND: unseen pairs may
        # conflict, bounded by the last collected count
        bound = int(cands[-1][2])
        exhausted = False
    if not exhausted:
        while len(batch) > 1 and batch[-1][2] <= 3 * bound:
            bound = batch.pop()[2]
    return batch


#: (session applicationId, sf_dir) -> (merge list, post-merge word-type
#: DataFrame, round count). Same discipline as pipeline.py's _QC_CACHE
#: (session-scoped key, eviction via evict_stale_session_entries): the
#: merge table is a pure function of the corpus and the BPE_* constants,
#: and BOTH bpe_merge_table and bpe_encode_fertility re-ran the whole
#: training loop (per-round type-table jobs + candidate collects +
#: localCheckpoints) before the memo. The words frame is a
#: localCheckpoint — session-lifetime by construction; eviction keeps
#: the dict itself from leaking across sessions (round 12, guide §5).
_BPE_CACHE: dict[tuple[str, str], tuple[list, DataFrame, int]] = {}


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Run the merge-learning loop; returns (merge list, word-type
    DataFrame with the post-merge ``syms`` encoding, round count).
    The corpus-sized work is the one word-frequency groupBy — round 12:
    folded out of the shared persisted word-count frame (guide §5);
    every round after runs on the vocabulary-sized type table and
    applies up to BPE_BATCH_M merges in one job (batching rule above).
    Memoized per (session, corpus) — see _BPE_CACHE."""
    from ._util import evict_stale_session_entries

    evict_stale_session_entries(_BPE_CACHE, spark)
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BPE_CACHE.get(memo_key)
    if hit is not None:
        return hit
    words = (
        _word_counts_sw(spark, sf_dir)
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.sum("c").alias("freq"))
        .withColumn(
            "syms",
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < BPE_N_MERGES:
        pairs = (
            # sequence(1, 0) DESCENDS in Spark, so single-symbol words
            # must be excluded before the pair window is generated
            words.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i-1] AS l, syms[i] AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        cands = [
            (r.l, r.r, int(r.cnt))
            for r in pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(BPE_BATCH_CAND)
            .collect()
        ]
        if not cands:
            break
        rounds += 1
        batch = _bpe_select_batch(
            cands, min(BPE_BATCH_M, BPE_N_MERGES - len(merges))
        )
        for a, b, cnt in batch:
            merges.append((len(merges), a, b, cnt))
        # one job applies the whole batch: chained greedy folds in a
        # single select, one checkpoint per ROUND
        col = F.col("syms")
        for a, b, _ in batch:
            col = _bpe_merge_fold(col, a, b)
        words = words.withColumn("syms", col).localCheckpoint(eager=True)
    _BPE_CACHE[memo_key] = (merges, words, rounds)
    return merges, words, rounds


def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _, _ = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_count bigint"
    )


def _bpe_oracle_ctes(n_merges: int) -> str:
    """The shared islands/odd-even CTE chain: w{k} carries the
    vocabulary encoding after k merges, best{k} the k-th rule."""
    ctes = [
        """w0 AS MATERIALIZED (
  SELECT w, COUNT(*) AS freq,
         list_transform(range(1, len(w) + 1), i -> w[i]) AS syms
  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE len(w) > 0 GROUP BY w
)"""
    ]
    for k in range(n_merges):
        ctes.append(f"""pairs{k} AS MATERIALIZED (
  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM w{k}, UNNEST(range(1, len(syms))) AS u(i)
  GROUP BY 1, 2
), best{k} AS MATERIALIZED (
  SELECT l, r, cnt FROM pairs{k} ORDER BY cnt DESC, l, r LIMIT 1
), sel{k} AS MATERIALIZED (
  SELECT w, list(i) AS sel
  FROM (SELECT w, i, i - MIN(i) OVER (PARTITION BY w, grp) AS off
        FROM (SELECT m.w, m.i,
                     m.i - ROW_NUMBER() OVER (PARTITION BY m.w ORDER BY m.i) AS grp
              FROM (SELECT t.w, u.i
                    FROM w{k} t, best{k} b, UNNEST(range(1, len(t.syms))) AS u(i)
                    WHERE t.syms[u.i] = b.l AND t.syms[u.i + 1] = b.r) m))
  WHERE off % 2 = 0 GROUP BY w
), w{k + 1} AS MATERIALIZED (
  SELECT t.w, t.freq,
         CASE WHEN s.sel IS NULL THEN t.syms
              ELSE list_filter(
                     list_transform(range(1, len(t.syms) + 1), i ->
                       CASE WHEN list_contains(s.sel, i)
                              THEN t.syms[i] || t.syms[i + 1]
                            WHEN list_contains(s.sel, i - 1) THEN NULL
                            ELSE t.syms[i] END),
                     x -> x IS NOT NULL) END AS syms
  FROM w{k} t LEFT JOIN sel{k} s USING (w)
)""")
    return "WITH " + ",\n".join(ctes)


def _bpe_oracle_sql(n_merges: int) -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INTEGER) AS step, l AS lhs, r AS rhs, cnt AS pair_count FROM best{k}"
        for k in range(n_merges)
    )
    return _bpe_oracle_ctes(n_merges) + "\n" + selects


_register(bpe_merge_table, _bpe_oracle_sql(BPE_N_MERGES))


# ---------------------------------------------------------------------------
# BPE application / fertility panel: encode the corpus with the merges
# just learned and report per-source tokenizer fit — fertility (subword
# tokens per whitespace word) and chars-per-token, the two numbers a
# tokenizer report card leads with. The encoded vocabulary is the
# training loop's own post-merge type table (train once, apply by a
# vocab-keyed hash join — never re-encoding the corpus text); the
# corpus-sized work is one (source, word) groupBy. The oracle reuses
# the islands CTE chain, whose final w{N} IS the encoded vocabulary.
# ---------------------------------------------------------------------------
def bpe_encode_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, words, _ = _bpe_train(spark, sf_dir)
    enc = words.select("w", F.size("syms").alias("n_sub"))
    # round 12: the (source, word, count) table IS the shared persisted
    # word-count frame (guide §5), filtered to non-empty words
    per = _word_counts_sw(spark, sf_dir).filter(F.length("w") > 0)
    return (
        per.join(enc, "w")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum(F.col("c") * F.col("n_sub"))
            .cast("bigint")
            .alias("n_subwords"),
            (
                F.sum(F.col("c") * F.col("n_sub")) / F.sum("c")
            ).alias("fertility"),
            (
                F.sum(F.col("c") * F.length("w"))
                / F.sum(F.col("c") * F.col("n_sub"))
            ).alias("chars_per_token"),
        )
    )


_register(
    bpe_encode_fertility,
    _bpe_oracle_ctes(BPE_N_MERGES)
    + f""",
ws AS MATERIALIZED (
  SELECT source, w, COUNT(*) AS c
  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE len(w) > 0 GROUP BY source, w
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_words,
       CAST(SUM(c * len(syms)) AS BIGINT) AS n_subwords,
       SUM(c * len(syms)) * 1.0 / SUM(c) AS fertility,
       SUM(c * len(w)) * 1.0 / SUM(c * len(syms)) AS chars_per_token
FROM ws JOIN w{BPE_N_MERGES} USING (w)
GROUP BY source
""",
)


# ---------------------------------------------------------------------------
# Training-mixture weights (temperature sampling over sources — the
# GPT-3 / PaLM data-mixing step): per-source token shares are raised to
# alpha < 1 so low-resource sources are upsampled, then renormalized;
# expected epochs per source follow from a token budget expressed as a
# multiple of the corpus (budget = MIX_BUDGET_EPOCHS x corpus tokens, so
# the panel is scale-free). One corpus-sized groupBy(source); everything
# after runs on the #sources-row table with totals as 1-row aggregate
# broadcasts (the allowlisted "1-row stats join" pattern).
# ---------------------------------------------------------------------------
MIX_ALPHA = 0.7
MIX_BUDGET_EPOCHS = 5.0


def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").cast("double").alias("t"))
    w = (
        per.crossJoin(F.broadcast(tot))
        .withColumn("raw_share", F.col("n_tokens") / F.col("t"))
        .withColumn("pa", F.pow("raw_share", F.lit(MIX_ALPHA)))
    )
    z = w.agg(F.sum("pa").alias("s"))
    return w.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        "raw_share",
        (F.col("pa") / F.col("s")).alias("weight"),
        (
            (F.col("pa") / F.col("s"))
            * F.lit(MIX_BUDGET_EPOCHS)
            / F.col("raw_share")
        ).alias("expected_epochs"),
    )


_register(
    corpus_mixture_weights,
    """
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t FROM per),
w AS (
  SELECT source, n_docs, n_tokens,
         n_tokens / t AS raw_share,
         POWER(n_tokens / t, 0.7) AS pa
  FROM per, tot
), z AS (SELECT SUM(pa) AS s FROM w)
SELECT source, n_docs, n_tokens, raw_share,
       pa / s AS weight,
       (pa / s) * 5.0 / raw_share AS expected_epochs
FROM w, z
""",
)


# ---------------------------------------------------------------------------
# Release shard manifest — the write-side of a data release: the
# exact-dedup keep-set (min-doc_id representative per content digest)
# is hash-assigned to N_SHARDS output shards, and the manifest reports
# per-shard doc/token/byte totals plus the skew ratio against a
# perfectly balanced layout (the number a release engineer checks
# before a 100 TB write — one hot shard serializes the whole job's
# tail). Sharding is the engine-portable md5 bucket, so the layout is
# reproducible across runs and engines; totals ride as a 1-row
# aggregate broadcast (allowlisted "1-row stats join").
# ---------------------------------------------------------------------------
N_SHARDS = 16


def release_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    keep = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = docs.join(keep.select("doc_id"), "doc_id", "left_semi")
    per = (
        kept.select(
            _md5_bucket(F.col("doc_id").cast("string"), "#shard", N_SHARDS)
            .cast("int")
            .alias("shard"),
            F.size(F.split("text", " ")).alias("n_tok"),
            "n_chars",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_bytes"),
        )
    )
    tot = per.agg(F.sum("n_tokens").cast("double").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "n_tokens",
        "n_bytes",
        (F.col("n_tokens") / F.col("t")).alias("token_share"),
        (F.col("n_tokens") * F.lit(float(N_SHARDS)) / F.col("t")).alias(
            "skew"
        ),
    )


_register(
    release_shard_manifest,
    f"""
WITH keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), k AS (
  SELECT d.* FROM documents d JOIN keep USING (doc_id)
), s AS (
  SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#shard'), 1, 8))
                   AS BIGINT) % {N_SHARDS} AS INTEGER) AS shard,
         len(string_split(text, ' ')) AS n_tok, n_chars
  FROM k
), per AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS n_bytes
  FROM s GROUP BY shard
), tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t FROM per)
SELECT shard, n_docs, n_tokens, n_bytes,
       n_tokens / t AS token_share,
       n_tokens * {float(N_SHARDS)} / t AS skew
FROM per, tot
""",
)


# ---------------------------------------------------------------------------
# Embedding covariance / anisotropy panel — the statistics PCA
# whitening and "all-but-the-top" post-processing (Mu & Viswanath,
# ICLR 2018) start from: the dim x dim covariance matrix plus each
# dimension's share of total variance (embedding spaces with one
# dominant direction hurt cosine retrieval — this panel is how you
# catch that before building the ANN index).
# Plan (round 12, guide §4.2): per-partition X^T X / column-sum
# partials via ONE vectorized numpy gemm inside mapInPandas — each
# task emits d(d+1)/2 upper-triangle rows + its row count and column
# sums, so the shuffle is dimension-bounded (partitions x d^2/2 rows),
# never corpus-bounded, and the per-row pair-product work runs as one
# native BLAS call per batch instead of a d^2/2-wide exploded
# expression per vector (the r1-r11 shape: 4.16M exploded struct rows
# at sf0.1, measured 2.66 s; the gemm partial pass replaces the
# explode AND the separate posexplode means scan). Products are
# accumulated in float64 on both engines so the only cross-engine
# difference is summation order (ulp-level, inside the 4dp oracle
# rounding — same contract as the r1 explode form, whose groupBy
# summation order was already nondeterministic).
# ---------------------------------------------------------------------------
def _cov_gemm_partials(it):
    """mapInPandas worker: one (i, j, s, n, si) upper-triangle partial
    frame per task. ``s`` = partial sum of v_i * v_j, ``n`` = partial
    row count (repeated on every pair row; summed per (i, j) group it
    re-totals exactly because each task emits each pair once), ``si`` =
    partial sum of v_i (meaningful on diagonal rows i == j, where it
    feeds the per-dimension means)."""
    import numpy as np
    import pandas as pd

    n = 0
    xtx = None
    colsum = None
    for pdf in it:
        if not len(pdf):
            continue
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        if xtx is None:
            d = X.shape[1]
            xtx = np.zeros((d, d), dtype=np.float64)
            colsum = np.zeros(d, dtype=np.float64)
        xtx += X.T @ X
        colsum += X.sum(axis=0)
        n += X.shape[0]
    if n == 0:
        return
    d = xtx.shape[0]
    iu, ju = np.triu_indices(d)
    yield pd.DataFrame(
        {
            "i": (iu + 1).astype("int32"),
            "j": (ju + 1).astype("int32"),
            "s": xtx[iu, ju],
            "n": np.full(len(iu), n, dtype=np.int64),
            "si": colsum[iu],
        }
    )


def _cov_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted (i, j, s, n, si) covariance-moment table — ONE
    embeddings scan + gemm-partial pass shared (via CacheManager
    plan-dedup, the ``_decon_sset`` idiom) by embedding_covariance_panel,
    embedding_principal_direction (which previously re-built the whole
    covariance just to collect it) and embedding_abtt_residuals (whose
    per-dimension means are this table's diagonal si / n — previously a
    separate corpus-sized posexplode scan). d(d+1)/2 rows — dimension-
    bounded, never corpus-bounded. Counts against the documented memo
    inventory (tests/test_memo_occupancy.py)."""
    from pyspark import StorageLevel

    emb = load(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    partials = emb.mapInPandas(
        _cov_gemm_partials, "i int, j int, s double, n bigint, si double"
    )
    return (
        partials.groupBy("i", "j")
        .agg(
            F.sum("s").alias("s"),
            F.sum("n").alias("n"),
            F.sum("si").alias("si"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def embedding_covariance_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 12: the shared persisted moment table (see _cov_stats) —
    # every downstream branch (raw, mu_i, mu_j, the total-variance
    # scalar) reads the d(d+1)/2-row cache instead of sharing one
    # exchange per query invocation.
    stats = _cov_stats(spark, sf_dir)
    raw = stats.select("i", "j", "s", "n")
    means = stats.filter(F.col("i") == F.col("j")).select(
        "i", (F.col("si") / F.col("n")).alias("mu")
    )
    mi = means.select(F.col("i"), F.col("mu").alias("mu_i"))
    mj = means.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))
    cov = (
        raw.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (F.col("s") / F.col("n") - F.col("mu_i") * F.col("mu_j")).alias(
                "cov"
            ),
        )
    )
    # total variance = sum of the diagonal, as a 1-row broadcast; each
    # diagonal row gains its variance share (anisotropy read-out)
    tot = cov.filter(F.col("i") == F.col("j")).agg(
        F.sum("cov").alias("var_total")
    )
    return cov.crossJoin(F.broadcast(tot)).select(
        "i",
        "j",
        "cov",
        F.when(F.col("i") == F.col("j"), F.col("cov") / F.col("var_total"))
        .otherwise(F.lit(None).cast("double"))
        .alias("var_share"),
    )


_register(
    embedding_covariance_panel,
    """
WITH e AS (SELECT embedding AS v FROM embeddings),
x AS (
  SELECT CAST(i.i AS INTEGER) AS i, CAST(j.j AS INTEGER) AS j,
         SUM(CAST(v[i.i] AS DOUBLE) * CAST(v[j.j] AS DOUBLE)) AS s,
         COUNT(*) AS n
  FROM e, UNNEST(range(1, len(v) + 1)) AS i(i), UNNEST(range(1, len(v) + 1)) AS j(j)
  WHERE j.j >= i.i GROUP BY 1, 2
), m AS (
  SELECT CAST(u.i AS INTEGER) AS i, AVG(CAST(v[u.i] AS DOUBLE)) AS mu
  FROM e, UNNEST(range(1, len(v) + 1)) AS u(i) GROUP BY 1
), c AS (
  SELECT x.i, x.j, s / n - mi.mu * mj.mu AS cov
  FROM x JOIN m mi ON x.i = mi.i JOIN m mj ON x.j = mj.i
), t AS (SELECT SUM(cov) AS var_total FROM c WHERE i = j)
SELECT i, j, cov,
       CASE WHEN i = j THEN cov / var_total END AS var_share
FROM c, t
""",
)


# ---------------------------------------------------------------------------
# Quality-retention curve — the filter-calibration panel: for each
# quality threshold t in {0.00, 0.05, ..., 1.00}, how many documents
# and tokens survive `quality >= t` (how a curation team picks the
# cutoff: you don't choose 0.4 a priori, you read it off this curve
# against your token budget). Corpus-sized work is ONE expression scan
# + a <=21-row bucket groupBy; the curve itself is a shuffle-free
# sequence-explode over the bucket table (each bucket row fans out to
# the thresholds it satisfies — no join, no window), with the total as
# a 1-row broadcast. NULL-quality docs (empty text) are unscoreable
# and excluded; the curve is relative to scoreable docs (threshold
# 0.0 row = 100%). The output domain is the FULL 0.00..1.00 grid (21
# rows) regardless of data: thresholds above the highest populated
# bucket appear with docs_retained = 0 (a 21-row spark.range left
# join — round-8 fix; previously the domain was data-dependent and a
# consumer iterating the grid saw missing points).
# ---------------------------------------------------------------------------
def quality_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = text_quality_score(spark, sf_dir).filter(
        F.col("quality").isNotNull()
    )
    b = q.groupBy(
        F.floor(F.col("quality") * 20).cast("int").alias("b")
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("n_tokens").cast("bigint").alias("tk"),
    )
    r = (
        b.select(
            F.explode(F.sequence(F.lit(0), F.col("b"))).alias("k"),
            "c",
            "tk",
        )
        .groupBy("k")
        .agg(
            F.sum("c").cast("bigint").alias("docs_retained"),
            F.sum("tk").cast("bigint").alias("tokens_retained"),
        )
    )
    grid = spark.range(21).select(F.col("id").cast("int").alias("k"))
    full = grid.join(r, "k", "left").select(
        "k",
        F.coalesce("docs_retained", F.lit(0)).cast("bigint").alias(
            "docs_retained"
        ),
        F.coalesce("tokens_retained", F.lit(0)).cast("bigint").alias(
            "tokens_retained"
        ),
    )
    tot = full.agg(F.max("tokens_retained").alias("tot"))
    return full.crossJoin(F.broadcast(tot)).select(
        (F.col("k").cast("double") / 20).alias("threshold"),
        "docs_retained",
        "tokens_retained",
        (F.col("tokens_retained") / F.col("tot")).alias("token_frac"),
    )


_register(
    quality_retention_curve,
    f"""
WITH q AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         0.5 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text))
         + 0.5 * (len(list_filter(string_split(text, ' '), t -> t IN ({_stop_in})))
                    / len(string_split(text, ' '))) AS quality
  FROM documents
), b AS (
  SELECT CAST(FLOOR(quality * 20) AS INTEGER) AS b,
         COUNT(*) AS c, CAST(SUM(n_tokens) AS BIGINT) AS tk
  FROM q WHERE quality IS NOT NULL GROUP BY 1
), r AS (
  SELECT u.k AS k, CAST(SUM(c) AS BIGINT) AS docs_retained,
         CAST(SUM(tk) AS BIGINT) AS tokens_retained
  FROM b, UNNEST(range(0, b + 1)) AS u(k) GROUP BY 1
), grid AS (
  SELECT g.k, COALESCE(r.docs_retained, 0) AS docs_retained,
         COALESCE(r.tokens_retained, 0) AS tokens_retained
  FROM range(0, 21) AS g(k) LEFT JOIN r ON g.k = r.k
), t AS (SELECT MAX(tokens_retained) AS tot FROM grid)
SELECT CAST(k AS DOUBLE) / 20 AS threshold,
       CAST(docs_retained AS BIGINT) AS docs_retained,
       CAST(tokens_retained AS BIGINT) AS tokens_retained,
       CAST(tokens_retained AS DOUBLE) / tot AS token_frac
FROM grid, t
""",
)


# ===========================================================================
# Round-8 operators: release packing, semantic dedup, KN bigram LM,
# char-entropy quality signal, snapshot delta, hard-negative mining.
# ===========================================================================

# ---------------------------------------------------------------------------
# Sequence packing (GPT-style concat-and-split): training releases don't
# ship documents, they ship fixed-length token sequences. Docs are
# deterministically shuffled (md5 order — the standard hash-shuffle a
# release does before packing), concatenated within a shard, and split
# at SEQ_LEN boundaries; a doc straddling a boundary contributes tokens
# to both sequences. Output is the per-(shard, sequence) manifest: how
# many docs touch it, how many start in it, and its token fill.
# Plan / 100 TB: packing is embarrassingly parallel ACROSS shards —
# the cumulative-sum window is PARTITIONED by shard (never global), so
# each shard packs independently exactly like a packing worker; at
# 100 TB NSHARDS rises to O(10k) and each shard is one task. The
# boundary explode fans a doc only over the <= ceil(len/SEQ_LEN)+1
# sequences it overlaps.
# ---------------------------------------------------------------------------
PACK_SEQ_LEN = 256
PACK_NSHARDS = 8


def release_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("tk")
    )
    h = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#pack"))), 1, 8
    )
    d = docs.select(
        "doc_id",
        "tk",
        (_md5_bucket(F.col("doc_id").cast("string"), "#shard", PACK_NSHARDS))
        .cast("int")
        .alias("shard"),
        h.alias("h"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pos = d.withColumn("cum", F.sum("tk").over(w)).select(
        "shard",
        "doc_id",
        "tk",
        (F.col("cum") - F.col("tk")).alias("start"),
        F.col("cum").alias("end"),
    )
    # fan each doc over the sequences [floor(start/L), floor((end-1)/L)]
    L = PACK_SEQ_LEN
    spans = pos.filter(F.col("tk") > 0).select(
        "shard",
        "doc_id",
        "start",
        "end",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / L),
                F.floor((F.col("end") - 1) / L),
            )
        ).alias("seq_id"),
    )
    contrib = spans.select(
        "shard",
        "seq_id",
        "doc_id",
        (
            F.least(F.col("end"), (F.col("seq_id") + 1) * L)
            - F.greatest(F.col("start"), F.col("seq_id") * L)
        ).alias("toks_in_seq"),
        (
            (F.col("start") >= F.col("seq_id") * L)
            & (F.col("start") < (F.col("seq_id") + 1) * L)
        )
        .cast("int")
        .alias("starts_here"),
    )
    return contrib.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks_in_seq").cast("bigint").alias("n_tokens"),
        F.sum("starts_here").cast("bigint").alias("n_docs_starting"),
    )


_register(
    release_sequence_packing,
    f"""
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tk,
         CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#shard'), 1, 8))
              AS BIGINT) % {PACK_NSHARDS} AS INTEGER) AS shard,
         substr(md5(CAST(doc_id AS VARCHAR) || '#pack'), 1, 8) AS h
  FROM documents
), pos AS (
  SELECT shard, doc_id, tk,
         CAST(SUM(tk) OVER (PARTITION BY shard ORDER BY h, doc_id
                            ROWS UNBOUNDED PRECEDING) - tk AS BIGINT) AS start,
         CAST(SUM(tk) OVER (PARTITION BY shard ORDER BY h, doc_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS "end"
  FROM d
), spans AS (
  SELECT shard, doc_id, start, "end", u.s AS seq_id
  FROM pos, UNNEST(range(start // {PACK_SEQ_LEN}, ("end" - 1) // {PACK_SEQ_LEN} + 1)) AS u(s)
  WHERE tk > 0
)
SELECT shard, seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEAST("end", (seq_id + 1) * {PACK_SEQ_LEN})
                - GREATEST(start, seq_id * {PACK_SEQ_LEN})) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN start >= seq_id * {PACK_SEQ_LEN}
                      AND start < (seq_id + 1) * {PACK_SEQ_LEN}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_starting
FROM spans GROUP BY 1, 2
""",
)


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023 "SemDeDup: Data-efficient
# learning at web-scale through semantic deduplication"): prune
# embedding-near-duplicate documents, keeping ONE representative per
# semantic cluster. Clusters here are the deterministic md5-hyperplane
# LSH cells (the oracle-checkable stand-in for SemDeDup's k-means
# cells — same role: restrict the pairwise check to a cell); within a
# cell, vector v is DROPPED when some lower-id u has cosine >= tau,
# and the emitted row names its representative (arg-min u) — the
# greedy id-ordered pruning policy SemDeDup applies per cluster.
# Plan / 100 TB: the cell signature is one fold per vector; pairwise
# cosine runs ONLY within cells (shuffle key = cell signature), never
# all-pairs; the keep-decision is a per-v min_by aggregate.
#
# Cell count is a MECHANISM, not a constant (round-9 fix; VERDICT r8
# What's-wrong 4): the signature width is derived from the corpus size
# so expected cell occupancy stays bounded — planes =
# max(8, ceil(log2(N / SEMDEDUP_TARGET_CELL))), i.e. 2^planes cells and
# E[occupancy] = N / 2^planes <= SEMDEDUP_TARGET_CELL once N exceeds
# 2^8 * TARGET_CELL. In-cell all-pairs cosine is then
# O(N * TARGET_CELL), linear in the corpus — the same occupancy control
# SemDeDup gets from scaling its k-means cluster count with the corpus
# (and with the same documented tradeoff: near-dups split across cells
# are missed; tests/test_semdedup_bound.py pins the bound). The sizing
# count is a parquet metadata-only count(*). At every test SF
# (N <= 2000) the formula yields exactly 8 planes, so the static 8-bit
# oracle SQL remains the exact twin.
# ---------------------------------------------------------------------------
SEMDEDUP_TAU = 0.3
SEMDEDUP_TARGET_CELL = 64
SEMDEDUP_MIN_PLANES = 8


def _semdedup_planes(n_vectors: int) -> int:
    """Signature width for an ``n_vectors``-row corpus: enough hyperplanes
    that expected cell occupancy N / 2^planes <= SEMDEDUP_TARGET_CELL,
    floored at SEMDEDUP_MIN_PLANES so tiny corpora keep a stable shape."""
    if n_vectors <= SEMDEDUP_TARGET_CELL:
        return SEMDEDUP_MIN_PLANES
    return max(
        SEMDEDUP_MIN_PLANES, math.ceil(math.log2(n_vectors / SEMDEDUP_TARGET_CELL))
    )


_CORPUS_N_CACHE: dict[tuple[str, str], int] = {}


def _corpus_count(spark: SparkSession, sf_dir: str, table: str) -> int:
    """Corpus size for the occupancy-control mechanisms (SemDeDup plane
    width, pHash band width): a count(*) on the RAW table parquet
    (metadata-only — parquet footers answer it with no column scan),
    memoized per (sf_dir, table) so repeated query builds / EXPLAINs
    trigger at most one such job per corpus (round-10 fix: the r9 form
    counted the projected+derived plan eagerly on every build)."""
    key = (sf_dir, table)
    n = _CORPUS_N_CACHE.get(key)
    if n is None:
        n = spark.read.parquet(f"{sf_dir}/{table}.parquet").count()
        _CORPUS_N_CACHE[key] = n
    return n


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_with_norm2(spark, sf_dir)
    planes = _semdedup_planes(_corpus_count(spark, sf_dir, "embeddings"))
    # Round 12 (guide §5 / the phash idiom): the signature projection is
    # the query's heaviest per-row work (planes x d md5-derived plane
    # terms per vector) and the self-join references it on BOTH sides
    # with no shareable exchange — localCheckpoint materializes the
    # small (vec_id, v, n2, bucket) table once; each join side is then a
    # cached-partition scan.
    bucketed = emb.select(
        "vec_id",
        "v",
        "n2",
        F.concat(
            *[_plane_sign(j, _emb_dim(spark, sf_dir)) for j in range(planes)]
        ).alias("bucket"),
    ).localCheckpoint(eager=True)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    sim = _cos_pre("a", "b")
    pairs = (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("u"),
            F.col("b.vec_id").alias("vid"),
            sim.alias("cosine"),
        )
        .filter(F.col("cosine") >= SEMDEDUP_TAU)
    )
    return pairs.groupBy("vid").agg(
        F.min("u").cast("bigint").alias("kept_by"),
        F.min_by("cosine", "u").alias("cosine_to_rep"),
    ).select(F.col("vid").alias("vec_id"), "kept_by", "cosine_to_rep")


_register(
    dedup_semantic,
    f"""
WITH vv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), bucketed AS (
  SELECT vec_id, v, {_plane_bit_sql} AS bucket FROM vv
), pairs AS (
  SELECT a.vec_id AS u, b.vec_id AS vid,
         list_dot_product(a.v, b.v)
           / sqrt(list_dot_product(a.v, a.v))
           / sqrt(list_dot_product(b.v, b.v)) AS cosine
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vid AS vec_id, CAST(MIN(u) AS BIGINT) AS kept_by,
       arg_min(cosine, u) AS cosine_to_rep
FROM pairs WHERE cosine >= {SEMDEDUP_TAU}
GROUP BY vid
""",
)


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & Goodman
# 1999 formulation with absolute discount D): the probability table a
# CCNet-style perplexity filter scores documents with. For bigram
# (w1, w2): p_kn(w2|w1) = max(c - D, 0)/c(w1)
#                          + (D * N1+(w1,.)/c(w1)) * Pcont(w2)
# with Pcont(w2) = N1+(., w2) / |bigram types|. Every factor is a keyed
# aggregate over the bigram-type table: c(w1) and N1+(w1,.) from a
# groupBy(w1), N1+(., w2) from a groupBy(w2), |types| a 1-row broadcast.
# Output bounded by the pair_count >= KN_MIN_COUNT head.
# Plan / 100 TB: one corpus-sized bigram explode+count; everything after
# is vocabulary-sized joins on token keys; no windows, no all-pairs.
# ---------------------------------------------------------------------------
KN_DISCOUNT = 0.75
KN_MIN_COUNT = 5


def _bigram_pairs_expr(col: str = "text") -> Column:
    """(w1, w2) struct array over adjacent tokens — the KN math's ONE
    pair definition, shared by lm_kn_bigram and perplexity_decontaminate
    (both the model build and the candidate scoring explode)."""
    toks = F.split(col, " ")
    return F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.size(toks)),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda p: p.w2.isNotNull(),
    )


def _kn_model_tables(docs: DataFrame, persist: bool = False):
    """The four interpolated-KN model tables over ``docs`` (must carry
    a text column): bigram counts bc(w1, w2, c), context marginals
    ctx(w1, c1, n1p), continuation counts pre(w2, n_prec), and the
    1-row type total. ``persist`` pins bc when it feeds more than the
    three marginals (perplexity_decontaminate's pair join)."""
    bc = (
        docs.select(F.explode(_bigram_pairs_expr()).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if persist:
        from pyspark import StorageLevel

        bc = bc.persist(StorageLevel.MEMORY_AND_DISK)
    ctx = bc.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1p")
    )
    pre = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("n_prec"))
    types = bc.agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    return bc, ctx, pre, types


def _kn_seen_prob() -> Column:
    """p_kn(w2|w1) for a SEEN pair, over joined (c, c1, n1p, n_prec,
    n_types) columns — the discount/continuation formula's one home."""
    D = KN_DISCOUNT
    return F.greatest(F.col("c") - D, F.lit(0.0)) / F.col("c1") + (
        D * F.col("n1p") / F.col("c1")
    ) * (F.col("n_prec") / F.col("n_types"))


#: DuckDB twins of the shared pieces (parameterized on column refs so
#: each oracle keeps its own qualification style)
_KN_PAIRS_LT = (
    "list_transform(range(0, len(t) - 1),"
    " i -> {'w1': t[i + 1], 'w2': t[i + 2]})"
)
_KN_MARGINALS_SQL = """ctx AS (SELECT w1, SUM(c) AS c1, COUNT(*) AS n1p FROM bc GROUP BY 1),
pre AS (SELECT w2, COUNT(*) AS n_prec FROM bc GROUP BY 1),
types AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_types FROM bc)"""


def _kn_seen_prob_sql(
    c: str = "bc.c",
    c1: str = "ctx.c1",
    n1p: str = "ctx.n1p",
    n_prec: str = "pre.n_prec",
    n_types: str = "types.n_types",
) -> str:
    return (
        f"GREATEST({c} - {KN_DISCOUNT}, 0.0) / {c1}"
        f" + ({KN_DISCOUNT} * {n1p} / {c1}) * ({n_prec} / {n_types})"
    )


#: (session applicationId, sf_dir) -> the persisted corpus KN model
#: frame (w1, w2, pair_count, p_kn) — bigram-TYPE-bounded, never
#: corpus-sized. Round 13 (guide §5, the _decon_sset idiom): both
#: lm_kn_bigram and lm_perplexity_bucket (which embeds the model as its
#: scoring join's build side) re-ran the full corpus bigram explode +
#: three marginal aggregations per invocation; one persisted frame now
#: serves both. perplexity_decontaminate is NOT a consumer — its model
#: trains on the benchmark split, a different corpus.
_KN_MODEL_CACHE: dict[tuple[str, str], DataFrame] = {}


def lm_kn_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    _evict_stale_session_entries(_KN_MODEL_CACHE, spark)
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _KN_MODEL_CACHE.get(key)
    if hit is not None:
        return hit
    docs = load(spark, sf_dir, "documents").select("text")
    bc, ctx, pre, types = _kn_model_tables(docs)
    model = (
        bc.filter(F.col("c") >= KN_MIN_COUNT)
        .join(ctx, "w1")
        .join(pre, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("pair_count"),
            _kn_seen_prob().alias("p_kn"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _KN_MODEL_CACHE[key] = model
    return model


_register(
    lm_kn_bigram,
    f"""
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
pr AS (
  SELECT unnest({_KN_PAIRS_LT}) AS p
  FROM toks
),
bc AS (
  SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS c FROM pr GROUP BY 1, 2
),
{_KN_MARGINALS_SQL}
SELECT bc.w1, bc.w2, CAST(bc.c AS BIGINT) AS pair_count,
       {_kn_seen_prob_sql()}
         AS p_kn
FROM bc JOIN ctx ON bc.w1 = ctx.w1 JOIN pre ON bc.w2 = pre.w2, types
WHERE bc.c >= {KN_MIN_COUNT}
""",
)


# ---------------------------------------------------------------------------
# Character-entropy quality signal: per-document Shannon entropy (nats)
# of the non-space character distribution — the classic cheap gibberish
# / repeated-char / encoding-garbage detector a quality pipeline runs
# beside the stopword and length signals (cf. Gopher rules, Rae et al.
# 2021). Low entropy = few distinct characters dominating (aaaa...,
# base64 walls score HIGH and are caught by the alpha-ratio signal
# instead). Panel per source: doc count, avg/min/max entropy, and the
# count under ENTROPY_LOW nats.
# Plan / 100 TB: char explode is corpus-char-linear with map-side
# combine on (doc_id, ch); the per-doc entropy fold and the per-source
# rollup are keyed aggregates; no windows.
# ---------------------------------------------------------------------------
ENTROPY_LOW = 2.5


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 12 (guide §2.5): the char explode is the query's dominant
    # work (corpus-char rows built per doc) and ran entirely inside the
    # single-split scan task; spread_scan distributes the docs across
    # the session's cores first (no-op when the source already supplies
    # enough splits).
    docs = spread_scan(
        load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    # Round 13 (guide §1.2 — per-task work): substring(text, i, 1) seeks
    # from the string start per codepoint (UTF8 byte-offset scan), so the
    # transform(sequence(...)) char explode was O(L²) per doc;
    # split(text, '') builds the same per-char array in one O(L) pass
    # (measured ~18% off the warm subtree). The != '' guard keeps the
    # empty-doc case aligned with the oracle's range(1, length+1) (empty
    # array), where sequence(1, 0) would have descended through [1, 0].
    ch = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.expr("split(text, '')")).alias("ch"),
        )
        .filter((F.col("ch") != " ") & (F.col("ch") != ""))
        .groupBy("doc_id", "source", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Round 12 (guide §2.4): the per-doc total used to ride a window
    # partitioned by doc_id — a full extra sort+shuffle round over the
    # char-count table before the per-doc groupBy. The identity
    # -Σ (c/n)·ln(c/n) = ln n − (Σ c·ln c)/n folds the total into the
    # SAME aggregation (one keyed shuffle instead of two); FP drift is
    # ulp-level, inside the 4dp oracle rounding.
    per_doc = ch.groupBy("doc_id", "source").agg(
        (
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c").cast("double") * F.log("c"))
            / F.sum("c").cast("double")
        ).alias("entropy")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("entropy").alias("avg_entropy"),
        F.min("entropy").alias("min_entropy"),
        F.max("entropy").alias("max_entropy"),
        F.sum((F.col("entropy") < ENTROPY_LOW).cast("int"))
        .cast("bigint")
        .alias("n_low_entropy"),
    )


_register(
    text_char_entropy,
    f"""
WITH ch AS (
  SELECT doc_id, source, u.ch AS ch, COUNT(*) AS c
  FROM documents,
       UNNEST(list_transform(range(1, length(text) + 1), i -> text[i])) AS u(ch)
  WHERE u.ch <> ' '
  GROUP BY 1, 2, 3
), per_doc AS (
  SELECT doc_id, source,
         -SUM((c / n) * ln(c / n)) AS entropy
  FROM (SELECT doc_id, source, c,
               CAST(SUM(c) OVER (PARTITION BY doc_id) AS DOUBLE) AS n
        FROM ch)
  GROUP BY 1, 2
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       AVG(entropy) AS avg_entropy,
       MIN(entropy) AS min_entropy,
       MAX(entropy) AS max_entropy,
       CAST(SUM(CASE WHEN entropy < {ENTROPY_LOW} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_entropy
FROM per_doc GROUP BY 1
""",
)


# ---------------------------------------------------------------------------
# Snapshot delta — the "what changed since the last crawl" panel a
# continuously-ingesting corpus publishes per refresh: the incoming
# batch (a deterministic md5 10% of doc_ids — doc_id %% 10 would
# correlate with the fixture's round-robin source assignment and
# starve 18 of 20 sources of a base side) against the standing
# corpus, per source: volume added, relative
# growth, and how many token TYPES are new to that source's vocabulary
# (vocabulary drift — the early-warning signal for a source changing
# character, e.g. a forum turning spammy).
# Plan / 100 TB: one scan split into the two sides; the vocabulary
# delta is a distinct (source, token) LEFT ANTI join on (source,
# token) — shuffles carry type tables, not the corpus; panel is
# #sources rows.
# ---------------------------------------------------------------------------
def corpus_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    b = _md5_bucket(F.col("doc_id").cast("string"), "#snap", 10)
    new = docs.filter(b == 0)
    base = docs.filter(b != 0)
    stats_new = new.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_new"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens_new"),
    )
    stats_base = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_base")
    )
    tok_new = new.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).distinct()
    tok_base = base.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).distinct()
    fresh = (
        tok_new.join(tok_base, ["source", "w"], "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_token_types"))
    )
    return (
        stats_new.join(stats_base, "source")
        .join(fresh, "source", "left")
        .select(
            "source",
            "n_docs_new",
            "n_tokens_new",
            "n_docs_base",
            (F.col("n_docs_new") / F.col("n_docs_base")).alias("growth"),
            F.coalesce("new_token_types", F.lit(0))
            .cast("bigint")
            .alias("new_token_types"),
        )
    )


_register(
    corpus_snapshot_delta,
    """
WITH tagged AS (
  SELECT *, CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#snap'), 1, 8))
                 AS BIGINT) % 10 AS b
  FROM documents
), new_side AS (
  SELECT * FROM tagged WHERE b = 0
), base_side AS (
  SELECT * FROM tagged WHERE b <> 0
), sn AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_new,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_new
  FROM new_side GROUP BY 1
), sb AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_base
  FROM base_side GROUP BY 1
), tn AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w FROM new_side
), tb AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w FROM base_side
), fresh AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS new_token_types
  FROM tn WHERE NOT EXISTS (
    SELECT 1 FROM tb WHERE tb.source = tn.source AND tb.w = tn.w)
  GROUP BY 1
)
SELECT sn.source, sn.n_docs_new, sn.n_tokens_new, sb.n_docs_base,
       CAST(sn.n_docs_new AS DOUBLE) / sb.n_docs_base AS growth,
       CAST(COALESCE(fresh.new_token_types, 0) AS BIGINT) AS new_token_types
FROM sn JOIN sb ON sn.source = sb.source
LEFT JOIN fresh ON sn.source = fresh.source
""",
)


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep, cf. DPR /
# Contriever): for each anchor vector, the top-HARDNEG_K most-similar
# vectors with a DIFFERENT label — the "hard negatives" a contrastive
# trainer pairs against the anchor — plus the anchor's best SAME-label
# cosine (its positive ceiling) and the triplet margin pos - neg. A
# negative with positive margin near zero is the valuable kind; a
# NEGATIVE margin flags label noise.
# Plan / 100 TB: the registered (oracle-checked) variant is the exact
# brute-force baseline over a broadcast anchor set (the similarity_topk
# shape + label exclusion). The scale path is a MECHANISM, not prose
# (round 9): ``candidates="ivf"`` swaps the crossJoin for the shared
# IVF coarse quantization (_ivf_cell_assignments — the same 16-seed /
# 2-probe layout as similarity_ivf), so candidate generation becomes an
# equi-join on cell_id and per-anchor work is cell-bounded; recall of
# the IVF negatives vs the brute-force top-K is pinned in
# tests/test_queries_extra.py, and the IVF plan is asserted
# nested-loop-free.
# ---------------------------------------------------------------------------
HARDNEG_K = 5


def similarity_hard_negatives(
    spark: SparkSession, sf_dir: str, candidates: str = "broadcast"
) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("n2", _dot("v", "v"))
    q = emb.filter(F.col("vec_id") % 25 == 0).alias("q")
    c = emb.alias("c")
    sim = _cos_pre("q", "c")
    if candidates == "ivf":
        cells = _ivf_cell_assignments(spark, emb, n_probes=4)
        qc = (
            q.join(cells, F.col("q.vec_id") == cells.vec_id)
            .select(
                "q.vec_id",
                "q.label",
                "q.v",
                "q.n2",
                F.explode("probes").alias("probe_cell"),
            )
            .alias("q")
        )
        cc = (
            c.join(
                cells.select(F.col("vec_id").alias("cid"), "cell"),
                F.col("c.vec_id") == F.col("cid"),
            )
            .select("c.vec_id", "c.label", "c.v", "c.n2", "cell")
            .alias("c")
        )
        scored = (
            qc.join(cc, F.col("q.probe_cell") == F.col("c.cell"))
            .filter(F.col("q.vec_id") != F.col("c.vec_id"))
            .select(
                F.col("q.vec_id").alias("query_id"),
                F.col("c.vec_id").alias("neighbor_id"),
                (F.col("q.label") == F.col("c.label")).alias("same"),
                sim.alias("cosine"),
            )
            .distinct()  # a candidate can match via both probes
        )
    else:
        scored = (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("q.vec_id") != F.col("c.vec_id"))
            .select(
                F.col("q.vec_id").alias("query_id"),
                F.col("c.vec_id").alias("neighbor_id"),
                (F.col("q.label") == F.col("c.label")).alias("same"),
                sim.alias("cosine"),
            )
        )
    pos = scored.filter("same").groupBy("query_id").agg(
        F.max("cosine").alias("pos_cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    neg = (
        scored.filter(~F.col("same"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HARDNEG_K)
    )
    return neg.join(pos, "query_id", "left").select(
        "query_id",
        "neighbor_id",
        "cosine",
        F.col("rn").cast("bigint").alias("rn"),
        "pos_cos",
        (F.col("pos_cos") - F.col("cosine")).alias("margin"),
    )


_register(
    similarity_hard_negatives,
    f"""
WITH vv AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.label = c.label AS same,
         list_dot_product(q.v, c.v)
           / sqrt(list_dot_product(q.v, q.v))
           / sqrt(list_dot_product(c.v, c.v)) AS cosine
  FROM vv q JOIN vv c ON q.vec_id <> c.vec_id
  WHERE q.vec_id % 25 = 0
), pos AS (
  SELECT query_id, MAX(cosine) AS pos_cos FROM scored WHERE same GROUP BY 1
), neg AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id ASC)
              AS BIGINT) AS rn
  FROM scored WHERE NOT same
)
SELECT n.query_id, n.neighbor_id, n.cosine, n.rn, p.pos_cos,
       p.pos_cos - n.cosine AS margin
FROM neg n LEFT JOIN pos p ON n.query_id = p.query_id
WHERE n.rn <= {HARDNEG_K}
""",
)


# ---------------------------------------------------------------------------
# Asymmetric containment dedup (Broder 1997's containment coefficient;
# the Lee et al. 2022 / quote-detection complement to symmetric
# Jaccard): C(A→B) = |S(A) ∩ S(B)| / |S(A)| over distinct 3-token
# shingle sets. Jaccard-based MinHash misses a short document embedded
# verbatim in a much longer one (the union term swamps the overlap);
# containment is the right score for subset/quote relationships, so a
# curation pipeline runs both. Candidates come from RARE shingles —
# shingles with document frequency in [2, CONTAIN_DF_MAX] — because a
# containment pair must share at least one shingle, and rare shingles
# are the discriminative ones; the df cap bounds pair fan-out per
# shingle at C(df_max, 2) = 6, so the candidate set is linear in the
# rare-shingle count, never all-pairs (common boilerplate shingles are
# exactly the ones dropped, the same hub-cap move as
# source_overlap_matrix).
# Plan / 100 TB: shingle explode (corpus-linear, map-side combined) →
# df groupBy → hash join back on the shingle key → per-bucket i<j pair
# emission (≤6 rows/bucket) → distinct pairs → two doc_id-keyed joins
# to the shingle-set table → expression math. All shuffles on shingle
# or doc keys; no windows; no driver loops.
# ---------------------------------------------------------------------------
CONTAIN_DF_MAX = 4
CONTAIN_THRESHOLD = 0.5


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # candidate stage shared with dedup_recall_panel (identical plan)
    pairs = _rare_shingle_pairs(spark, sf_dir)
    # round 12: the shared persisted family frame (see _decon_sset) —
    # both pair sides previously re-ran the shingle transform
    sset = _decon_sset(spark, sf_dir)
    a, b = sset.alias("a"), sset.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sset"), F.col("b.sset")))
    c_ab = inter / F.size(F.col("a.sset"))
    c_ba = inter / F.size(F.col("b.sset"))
    union = F.size(F.col("a.sset")) + F.size(F.col("b.sset")) - inter
    return (
        pairs.join(a, pairs.doc_a == F.col("a.doc_id"))
        .join(b, pairs.doc_b == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            c_ab.alias("containment_ab"),
            c_ba.alias("containment_ba"),
            (inter / union).alias("jaccard"),
        )
        .filter(
            F.greatest("containment_ab", "containment_ba")
            >= CONTAIN_THRESHOLD
        )
    )


_register(
    dedup_containment,
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), sset AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, len(t) - 2),
                       i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS ss
  FROM toks
), sh AS (SELECT doc_id, unnest(ss) AS s FROM sset),
rare AS (
  SELECT s FROM sh GROUP BY s HAVING COUNT(*) BETWEEN 2 AND {CONTAIN_DF_MAX}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN rare USING (s) JOIN sh b
    ON a.s = b.s AND a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b,
       len(list_intersect(a.ss, b.ss)) / len(a.ss) AS containment_ab,
       len(list_intersect(a.ss, b.ss)) / len(b.ss) AS containment_ba,
       len(list_intersect(a.ss, b.ss))
         / (len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss))) AS jaccard
FROM pairs p JOIN sset a ON p.doc_a = a.doc_id JOIN sset b ON p.doc_b = b.doc_id
WHERE GREATEST(len(list_intersect(a.ss, b.ss)) / len(a.ss),
               len(list_intersect(a.ss, b.ss)) / len(b.ss))
      >= {CONTAIN_THRESHOLD}
""",
)


# ---------------------------------------------------------------------------
# Dominant principal direction of the embedding cloud ("all-but-the-top"
# step 1, Mu & Viswanath 2018): a FIXED-STEP power iteration (K = 60,
# renormalized after steps 20 and 40 against underflow) on the
# covariance matrix from embedding_covariance_panel. Emits, per
# dimension, the unit-norm loading of the K-step iterate (sign-fixed:
# component sum >= 0), the Rayleigh-quotient eigenvalue estimate
# lambda1 = (x_K . x_{K-1}) / (x_{K-1} . x_{K-1}), and lambda1 /
# trace — the fraction of total variance the top direction explains,
# THE anisotropy number the covariance panel's per-dim shares only
# bound. The contract is the exact fixed-step iterate (deterministic
# in both engines); convergence to the true eigenvector depends on the
# spectral gap and is pinned separately by a numpy eigh differential
# (the fixture's isotropic-gaussian embeddings have lambda2/lambda1 ~
# 0.93, which is exactly why K = 60, not 12).
# Plan / 100 TB: the corpus-sized work is the covariance build (d^2-
# bounded shuffles, see embedding_covariance_panel); the iteration
# runs DRIVER-SIDE on the collected d(d+1)/2-row matrix — the same
# bounded-collect discipline as the kmeans centroid update (SCALE.md
# "collect only k-row aggregates"), because a 64x64 matvec has no
# business being 60 distributed jobs. The oracle mirrors the exact
# iteration as a generated K-step CTE chain (the BPE-unroll idiom).
# ---------------------------------------------------------------------------
POWER_ITER_K = 60
_POWER_RENORM_AT = (20, 40)  # renormalize after these steps (underflow guard)


#: (session applicationId, sf_dir) -> the principal-direction rows
#: (plain Python floats, no RDDs — the _QC_CACHE trained-artifact
#: discipline). Round 13 ("Not yet optimized" item 1): the K-step
#: driver power iteration re-ran per invocation, and
#: embedding_abtt_residuals additionally paid a createDataFrame +
#: collect round-trip just to read the vector back.
_PD_CACHE: dict[tuple[str, str], list[tuple]] = {}


def _principal_direction_rows(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """(dim, loading, lambda1, var_share) rows off the memoized
    covariance-moment table; memoized per (session, corpus)."""
    import math as _math

    import numpy as _np

    _evict_stale_session_entries(_PD_CACHE, spark)
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _PD_CACHE.get(key)
    if hit is not None:
        return hit
    ut = embedding_covariance_panel(spark, sf_dir).select("i", "j", "cov")
    rows = ut.collect()  # d(d+1)/2 rows — dimension-bounded by design
    d = max(r.i for r in rows)
    C = _np.zeros((d, d), dtype=_np.float64)
    for r in rows:
        C[r.i - 1, r.j - 1] = r.cov
        C[r.j - 1, r.i - 1] = r.cov
    x = _np.full(d, 1.0 / _math.sqrt(d), dtype=_np.float64)
    prev = x
    for k in range(POWER_ITER_K):
        prev = x
        x = C @ prev
        if k + 1 in _POWER_RENORM_AT:
            x = x / _math.sqrt(float((x * x).sum()))
    lam = float((x * prev).sum() / (prev * prev).sum())
    nrm = _math.sqrt(float((x * x).sum()))
    sgn = 1.0 if float(x.sum()) >= 0 else -1.0
    trace = float(C.trace())
    share = lam / trace
    out = [
        (i + 1, sgn * float(x[i]) / nrm, lam, share) for i in range(d)
    ]
    _PD_CACHE[key] = out
    return out


def embedding_principal_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _principal_direction_rows(spark, sf_dir)
    return spark.createDataFrame(
        out, "dim int, loading double, lambda1 double, var_share double"
    )


def _power_cte(k: int) -> str:
    src = f"x{k - 1}n" if (k - 1) in _POWER_RENORM_AT else f"x{k - 1}"
    cte = f"""x{k} AS MATERIALIZED (
  SELECT f.i AS dim, SUM(f.cov * s.val) AS val
  FROM fm f JOIN {src} s ON f.j = s.dim GROUP BY 1
),"""
    if k in _POWER_RENORM_AT:
        cte += f"""
x{k}n AS MATERIALIZED (
  SELECT dim, val / (SELECT sqrt(SUM(val * val)) FROM x{k}) AS val FROM x{k}
),"""
    return cte


_x_ctes = "\n".join(_power_cte(k) for k in range(1, POWER_ITER_K + 1))

_register(
    embedding_principal_direction,
    # the covariance CTE is the embedding_covariance_panel oracle
    # verbatim; the iteration is a generated K-step CTE chain (the
    # same unroll idiom as the BPE islands oracle)
    # MATERIALIZED is load-bearing (the sssp-oracle precedent): fm is
    # referenced by every one of the POWER_ITER_K unrolled CTEs, and
    # without the hint DuckDB inlines the full covariance computation
    # into each of them — measured 156 s -> ~2 s at sf0.01 (round 13;
    # the abtt oracle nests this one and fell from 136 s the same way)
    f"""
WITH covp AS MATERIALIZED ({{COV_SQL}}),
ut AS MATERIALIZED (SELECT i, j, cov FROM covp),
fm AS MATERIALIZED (
  SELECT i, j, cov FROM ut
  UNION ALL
  SELECT j AS i, i AS j, cov FROM ut WHERE i < j
),
dims AS (SELECT DISTINCT i AS dim FROM ut),
x0 AS (
  SELECT dim, 1.0 / sqrt((SELECT COUNT(*) FROM dims)) AS val FROM dims
),
{_x_ctes}
lam AS (
  SELECT SUM(a.val * b.val) / SUM(b.val * b.val) AS lambda1
  FROM x{POWER_ITER_K} a JOIN x{POWER_ITER_K - 1} b ON a.dim = b.dim
),
nrm AS (
  SELECT sqrt(SUM(val * val)) AS nrm,
         CASE WHEN SUM(val) >= 0 THEN 1.0 ELSE -1.0 END AS sgn
  FROM x{POWER_ITER_K}
),
tr AS (SELECT SUM(cov) AS var_total FROM ut WHERE i = j)
SELECT x.dim, nrm.sgn * x.val / nrm.nrm AS loading,
       lam.lambda1 AS lambda1,
       lam.lambda1 / tr.var_total AS var_share
FROM x{POWER_ITER_K} x, nrm, lam, tr
""".replace("{COV_SQL}", ORACLE["embedding_covariance_panel"]),
)


# ---------------------------------------------------------------------------
# All-but-the-top residual panel (Mu & Viswanath 2018, step 2 of the
# post-processing their paper ships): remove the dominant principal
# direction from every centered embedding and report, per label, how
# much squared mass the removal takes out — avg ||e - mu||^2, avg
# (projection onto v)^2, and the residual share 1 - sum(proj^2) /
# sum(||e - mu||^2). This is the downstream consumer of
# embedding_principal_direction: the panel that tells a release
# whether ABTT post-processing is worth shipping for its embedding
# column (residual_share near 1 - lambda1/trace when labels are
# isotropic; a label whose share is much lower is the cluster the top
# direction encodes).
# Plan / 100 TB: v comes from the power iteration (dimension-bounded
# collect, see embedding_principal_direction); mu is a d-row collected
# aggregate. Both enter the plan as LITERAL arrays, so the per-vector
# projection/residual is a pure JVM zip_with/aggregate expression over
# the embedding array — one scan, one labels-sized rollup, nothing
# corpus-sized ever collected or shuffled.
# ---------------------------------------------------------------------------
def embedding_abtt_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 13: read the memoized direction rows directly — the r8-r12
    # shape collect()ed the principal-direction DataFrame, paying a
    # createDataFrame + collect round-trip per invocation for a vector
    # the driver already holds
    pd_rows = sorted(
        _principal_direction_rows(spark, sf_dir), key=lambda r: r[0]
    )
    v = [float(r[1]) for r in pd_rows]  # d-bounded by design
    emb = load(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # round 12: mu is the shared covariance-moment table's diagonal
    # si / n (see _cov_stats) — the r1-r11 shape re-scanned and
    # posexploded the whole embeddings table (corpus x d rows) just to
    # average each dimension, a quantity the gemm partials already
    # carry. Summation-order drift vs the old explode-avg is ulp-level,
    # inside the 4dp oracle rounding (the gemm-rewrite precedent).
    mu_rows = (
        _cov_stats(spark, sf_dir)
        .filter(F.col("i") == F.col("j"))
        .select("i", (F.col("si") / F.col("n")).alias("mu"))
        .collect()
    )  # d rows
    mu = [float(r.mu) for r in sorted(mu_rows, key=lambda r: r.i)]
    mu_arr = F.array(*[F.lit(x) for x in mu])
    v_arr = F.array(*[F.lit(x) for x in v])
    ec = F.zip_with("v", mu_arr, lambda x, y: x - y)
    proj = F.aggregate(
        F.zip_with(ec, v_arr, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sq = F.aggregate(ec, F.lit(0.0), lambda acc, x: acc + x * x)
    per = emb.select("label", proj.alias("proj"), sq.alias("sq"))
    return per.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.avg("sq").alias("avg_sq_norm"),
        F.avg(F.col("proj") * F.col("proj")).alias("avg_proj_sq"),
        (
            F.lit(1.0)
            - F.sum(F.col("proj") * F.col("proj")) / F.sum("sq")
        ).alias("residual_share"),
    )


_register(
    embedding_abtt_residuals,
    # pd nests the full principal-direction oracle (itself nesting the
    # covariance oracle) — the audited v IS the shipped one
    """
WITH pd AS MATERIALIZED ({PD_SQL}),
emb0 AS MATERIALIZED (SELECT label, embedding AS v FROM embeddings),
mu0 AS (
  SELECT CAST(u.i AS INTEGER) AS dim, AVG(CAST(v[u.i] AS DOUBLE)) AS mu
  FROM emb0, UNNEST(range(1, len(v) + 1)) AS u(i) GROUP BY 1
),
doc AS (
  SELECT ROW_NUMBER() OVER () AS rid, label, v FROM emb0
),
per AS (
  SELECT d.rid, d.label,
         SUM((CAST(v[u.i] AS DOUBLE) - m.mu) * p.loading) AS proj,
         SUM((CAST(v[u.i] AS DOUBLE) - m.mu)
             * (CAST(v[u.i] AS DOUBLE) - m.mu)) AS sq
  FROM doc d, UNNEST(range(1, len(v) + 1)) AS u(i), mu0 m, pd p
  WHERE m.dim = CAST(u.i AS INTEGER) AND p.dim = CAST(u.i AS INTEGER)
  GROUP BY 1, 2
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       AVG(sq) AS avg_sq_norm,
       AVG(proj * proj) AS avg_proj_sq,
       1 - SUM(proj * proj) / SUM(sq) AS residual_share
FROM per GROUP BY 1
""".replace("{PD_SQL}", ORACLE["embedding_principal_direction"]),
)


# ---------------------------------------------------------------------------
# Dedup recall/precision QA panel: cross-validates the MinHash-LSH
# candidate generator against the INDEPENDENT rare-shingle generator
# (dedup_containment's candidate stage). Ground truth = pairs from the
# UNION of both generators whose exact shingle-set Jaccard clears the
# verify threshold; the panel reports how many true near-dup pairs LSH
# surfaced (recall — pairs only the rare-shingle path found are LSH
# false negatives) and what fraction of LSH candidates verify
# (precision — the band-collision noise the verify join pays for).
# This is the measurement a pipeline publishes when it tunes
# bands/rows: the b=4, r=2 S-curve's empirical operating point, not
# its theoretical one.
# Plan / 100 TB: both generators are bucket-shaped (band-key /
# rare-shingle-key shuffles, never all-pairs); the union is a full
# outer hash join on the pair key; the verify join is two doc-keyed
# hash joins to the shingle-set table; the panel is a 1-row aggregate
# with map-side partial combine. Ground truth is candidate-limited by
# construction (a pair BOTH generators miss is invisible) — stated
# here because no subquadratic method can see it.
# ---------------------------------------------------------------------------
def _rare_shingle_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_containment's candidate stage: i<j doc pairs sharing at
    least one rare shingle (document frequency in [2, CONTAIN_DF_MAX])."""
    # round 12 (opt batch 7): explode(array_distinct(shingles)) IS the
    # shared persisted _decon_sset frame's definition — read the cache
    # instead of re-running the distinct per candidate-stage consumer
    # (dedup_containment + dedup_recall_panel)
    sh = _decon_sset(spark, sf_dir).select(
        "doc_id", F.explode("sset").alias("s")
    )
    rare_keys = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("dfreq"))
        .filter((F.col("dfreq") >= 2) & (F.col("dfreq") <= CONTAIN_DF_MAX))
        .select("s")
    )
    buckets = (
        sh.join(rare_keys, "s")
        .groupBy("s")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
    )
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def dedup_recall_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    lsh = dedup_minhash_lsh(spark, sf_dir).withColumn("in_lsh", F.lit(1))
    rsh = _rare_shingle_pairs(spark, sf_dir).withColumn("in_sh", F.lit(1))
    cand = (
        lsh.join(rsh, ["doc_a", "doc_b"], "full")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("in_lsh", F.lit(0)).alias("in_lsh"),
            F.coalesce("in_sh", F.lit(0)).alias("in_sh"),
        )
    )
    # round 12: the shared persisted family frame (see _decon_sset)
    sset = _decon_sset(spark, sf_dir)
    a, b = sset.alias("a"), sset.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sset"), F.col("b.sset")))
    union = F.size(F.col("a.sset")) + F.size(F.col("b.sset")) - inter
    scored = (
        cand.join(a, cand.doc_a == F.col("a.doc_id"))
        .join(b, cand.doc_b == F.col("b.doc_id"))
        .select("in_lsh", "in_sh", (inter / union).alias("jac"))
    )
    truth = (F.col("jac") >= _VERIFY_THRESHOLD).cast("int")
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_cand_union"),
        F.sum("in_lsh").cast("bigint").alias("n_cand_lsh"),
        F.sum("in_sh").cast("bigint").alias("n_cand_shingle"),
        F.sum(truth).cast("bigint").alias("n_truth"),
        F.sum(truth * F.col("in_lsh")).cast("bigint").alias("n_truth_lsh"),
    )
    return agg.select(
        "*",
        F.try_divide(F.col("n_truth_lsh"), F.col("n_truth")).alias(
            "recall_lsh"
        ),
        F.try_divide(F.col("n_truth_lsh"), F.col("n_cand_lsh")).alias(
            "precision_lsh"
        ),
    )


_register(
    dedup_recall_panel,
    f"""
WITH lsh AS (
{ORACLE["dedup_minhash_lsh"].strip()}
), toksr AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), ssetr AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, len(t) - 2),
                       i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS ss
  FROM toksr
), shr AS (SELECT doc_id, unnest(ss) AS s FROM ssetr),
rarer AS (
  SELECT s FROM shr GROUP BY s HAVING COUNT(*) BETWEEN 2 AND {CONTAIN_DF_MAX}
),
spairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM shr a JOIN rarer USING (s) JOIN shr b
    ON a.s = b.s AND a.doc_id < b.doc_id
),
cand AS (
  SELECT COALESCE(l.doc_a, s.doc_a) AS doc_a,
         COALESCE(l.doc_b, s.doc_b) AS doc_b,
         CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_lsh,
         CASE WHEN s.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_sh
  FROM lsh l FULL JOIN spairs s
    ON l.doc_a = s.doc_a AND l.doc_b = s.doc_b
),
scored AS (
  SELECT c.in_lsh, c.in_sh,
         len(list_intersect(a.ss, b.ss))
           / (len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss))) AS jac
  FROM cand c JOIN ssetr a ON c.doc_a = a.doc_id
              JOIN ssetr b ON c.doc_b = b.doc_id
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cand_union,
         CAST(SUM(in_lsh) AS BIGINT) AS n_cand_lsh,
         CAST(SUM(in_sh) AS BIGINT) AS n_cand_shingle,
         CAST(SUM(CASE WHEN jac >= {_VERIFY_THRESHOLD} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_truth,
         CAST(SUM(CASE WHEN jac >= {_VERIFY_THRESHOLD} THEN in_lsh ELSE 0 END)
              AS BIGINT) AS n_truth_lsh
  FROM scored
)
SELECT n_cand_union, n_cand_lsh, n_cand_shingle, n_truth, n_truth_lsh,
       CASE WHEN n_truth > 0 THEN n_truth_lsh * 1.0 / n_truth END
         AS recall_lsh,
       CASE WHEN n_cand_lsh > 0 THEN n_truth_lsh * 1.0 / n_cand_lsh END
         AS precision_lsh
FROM agg
""",
)


# ---------------------------------------------------------------------------
# HLL union/intersection matrix (Flajolet et al. 2007 §4 merge
# property + inclusion-exclusion): per source pair, the union
# cardinality estimated by MERGING the two sources' register tables
# (bucket-wise max — the property that makes HLL the sketch of choice
# for distributed distinct counting), the intersection by
# |A| + |B| - |A∪B|, and BOTH compared against the exact distinct-token
# overlap so the panel carries its own error column — the calibration a
# pipeline publishes before trusting sketch-level overlap triage at
# full scale (est_intersect may go negative at sketch noise level;
# shown, not clipped). Estimator = alpha·m²/Σ2^-rho with Flajolet's
# §4 small-range correction (linear counting m·ln(m/V) when the raw
# estimate is ≤ 2.5m and V zero registers remain) — required here, not
# optional: the fixture vocabulary is tiny relative to m = 512, the
# exact regime where the raw estimator is upward-biased by an order of
# magnitude (pinned in tests: the corrected union error sits inside
# the 6σ envelope; the raw one was ~11×).
# Plan / 100 TB: registers are per-(source, bucket) keyed aggregates —
# map-side collapse to ≤ sources×512 rows; the pair matrix is a
# bucket-key join over that bounded table (never corpus-sized). The
# exact side is the (source, token) TYPE table (Heaps-law sub-linear)
# self-joined on the token key with fan-out bounded by the source
# count — the same hub-cap argument as source_overlap_matrix.
# ---------------------------------------------------------------------------
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_BUCKETS)
_HLL_MM = float(HLL_ALPHA * HLL_BUCKETS * HLL_BUCKETS)  # one double literal for the oracle


def sketch_hll_union_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 12 (guide §2.3): registers are built from the DISTINCT
    # (source, token) table the exact side needs anyway — max-of-rho is
    # duplicate-insensitive, so the result is bit-identical and the two
    # salted md5s run once per TYPE instead of once per TOKEN. The
    # distinct pairs are the KEY SET of the shared persisted word-count
    # frame (guide §5): the three references below (registers, exact
    # per-source counts, exact intersection self-join) all read the
    # cache instead of re-shuffling the corpus explode.
    st = _word_counts_sw(spark, sf_dir).select("source", F.col("w").alias("t"))
    regs = (
        _hll_register_rows(st, keys=("source",))
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    # Round 12 (guide §2.2/§5, second pass): the register grid is ≤
    # sources × HLL_BUCKETS cells, yet the row-form computed it through
    # a grid crossJoin + dense zero-fill + a bucket-keyed SELF-JOIN +
    # two keyed aggregations — four shuffling stages of scheduling
    # floor on a table this small. Folding each source's registers into
    # ONE dense array row collapses the whole chain: per-source
    # estimates become an expression fold, and the pairwise union
    # matrix is a sources-row broadcast crossJoin with an elementwise
    # zip_with(greatest). Identical arithmetic (max-merge then Σ2^-rho,
    # zero-count, same small-range correction); the double-sum order
    # differs only at ulp level — far inside the oracle's 4dp rounding.
    from pyspark import StorageLevel

    # persist, not localCheckpoint: the plan is identical across
    # invocations, so CacheManager dedups repeat calls into ONE cache
    # entry (a per-call checkpoint would register a new RDD every
    # execution — the growth signature test_memo_occupancy pins)
    arr = (
        regs.groupBy("source")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "rho"))
            ).alias("m")
        )
        .select(
            "source",
            F.transform(
                F.sequence(F.lit(0), F.lit(HLL_BUCKETS - 1)),
                lambda b: F.coalesce(F.element_at(F.col("m"), b), F.lit(0)),
            ).alias("rhos"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def _est_arr(rhos):
        denom = F.aggregate(
            rhos, F.lit(0.0), lambda acc, r: acc + F.pow(F.lit(2.0), -r)
        )
        zeros = F.size(F.filter(rhos, lambda r: r == F.lit(0)))
        raw = F.lit(_HLL_MM) / denom
        lin = F.lit(float(HLL_BUCKETS)) * F.log(
            F.lit(float(HLL_BUCKETS)) / zeros
        )
        return F.when(
            (raw <= 2.5 * HLL_BUCKETS) & (zeros > 0), lin
        ).otherwise(raw)

    den = arr.select("source", _est_arr(F.col("rhos")).alias("est"))
    a = arr.alias("a")
    b = arr.alias("b")
    pden = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            _est_arr(
                F.zip_with(
                    F.col("a.rhos"),
                    F.col("b.rhos"),
                    lambda x, y: F.greatest(x, y),
                )
            ).alias("est_union"),
        )
    )
    ex = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    sa, sb = st.alias("sa"), st.alias("sb")
    exi = (
        sa.join(sb, "t")
        .filter(F.col("sa.source") < F.col("sb.source"))
        .groupBy(
            F.col("sa.source").alias("source_a"),
            F.col("sb.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    da = den.select(F.col("source").alias("source_a"), F.col("est").alias("est_a"))
    db = den.select(F.col("source").alias("source_b"), F.col("est").alias("est_b"))
    ea = ex.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    eb = ex.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    out = (
        pden.join(F.broadcast(da), "source_a")
        .join(F.broadcast(db), "source_b")
        .join(exi, ["source_a", "source_b"])
        .join(F.broadcast(ea), "source_a")
        .join(F.broadcast(eb), "source_b")
    )
    return out.select(
        "source_a",
        "source_b",
        "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
            "est_intersect"
        ),
        (F.col("n_a") + F.col("n_b") - F.col("exact_intersect"))
        .cast("bigint")
        .alias("exact_union"),
        F.col("exact_intersect").cast("bigint").alias("exact_intersect"),
        (
            F.col("est_union")
            / (F.col("n_a") + F.col("n_b") - F.col("exact_intersect"))
            - 1.0
        ).alias("err_union"),
    )


_register(
    sketch_hll_union_matrix,
    f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
),
r AS (
  SELECT source,
         CAST(CAST(concat('0x', substr(md5(t || '#hllb'), 1, 8)) AS BIGINT)
              % {HLL_BUCKETS} AS INTEGER) AS bucket,
         regexp_replace(substr(md5(t || '#hllw'), 1, 12), '^0+', '') AS s
  FROM tok
),
rr AS (
  SELECT source, bucket,
         CASE WHEN len(s) = 0 THEN 49
              ELSE 49 - (4 * (len(s) - 1) +
                   CASE WHEN s[1] = '1' THEN 1
                        WHEN s[1] IN ('2', '3') THEN 2
                        WHEN s[1] IN ('4', '5', '6', '7') THEN 3
                        ELSE 4 END)
         END AS rho
  FROM r
),
regs AS (SELECT source, bucket, MAX(rho) AS rho FROM rr GROUP BY 1, 2),
srcs AS (SELECT DISTINCT source FROM regs),
grid AS (
  SELECT s.source, CAST(g.b AS INTEGER) AS bucket
  FROM srcs s, UNNEST(range(0, {HLL_BUCKETS})) AS g(b)
),
dense AS (
  SELECT g.source, g.bucket, COALESCE(regs.rho, 0) AS rho
  FROM grid g LEFT JOIN regs
    ON g.source = regs.source AND g.bucket = regs.bucket
),
den AS (
  SELECT source,
         CASE WHEN {_HLL_MM!r} / SUM(power(2.0, -rho))
                   <= 2.5 * {HLL_BUCKETS}
               AND SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) > 0
              THEN {HLL_BUCKETS} * ln({HLL_BUCKETS}
                   / SUM(CASE WHEN rho = 0 THEN 1.0 ELSE 0.0 END))
              ELSE {_HLL_MM!r} / SUM(power(2.0, -rho)) END AS est
  FROM dense GROUP BY 1
),
pden AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CASE WHEN {_HLL_MM!r} / SUM(power(2.0, -GREATEST(a.rho, b.rho)))
                   <= 2.5 * {HLL_BUCKETS}
               AND SUM(CASE WHEN GREATEST(a.rho, b.rho) = 0
                       THEN 1 ELSE 0 END) > 0
              THEN {HLL_BUCKETS} * ln({HLL_BUCKETS}
                   / SUM(CASE WHEN GREATEST(a.rho, b.rho) = 0
                         THEN 1.0 ELSE 0.0 END))
              ELSE {_HLL_MM!r} / SUM(power(2.0, -GREATEST(a.rho, b.rho)))
              END AS est_union
  FROM dense a JOIN dense b
    ON a.bucket = b.bucket AND a.source < b.source
  GROUP BY 1, 2
),
st AS (SELECT DISTINCT source, t FROM tok),
ex AS (SELECT source, COUNT(*) AS n FROM st GROUP BY 1),
exi AS (
  SELECT a.source AS source_a, b.source AS source_b,
         COUNT(*) AS exact_intersect
  FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b, p.est_union,
       da.est + db.est - p.est_union AS est_intersect,
       CAST(ea.n + eb.n - exi.exact_intersect AS BIGINT) AS exact_union,
       CAST(exi.exact_intersect AS BIGINT) AS exact_intersect,
       p.est_union / (ea.n + eb.n - exi.exact_intersect) - 1.0 AS err_union
FROM pden p
JOIN den da ON da.source = p.source_a
JOIN den db ON db.source = p.source_b
JOIN exi ON exi.source_a = p.source_a AND exi.source_b = p.source_b
JOIN ex ea ON ea.source = p.source_a
JOIN ex eb ON eb.source = p.source_b
""",
)


# ---------------------------------------------------------------------------
# Language-ID confusion matrix: the classifier-QA panel for
# text_lang_id scored against the corpus's labeled lang column — per
# (actual, predicted) cell count and its share of the actual
# language's documents (row-normalized confusion), plus the per-cell
# correctness flag. This is the panel a pipeline publishes before
# trusting the heuristic for routing or rebalancing (cf.
# sample_stratified_lang, which consumes lang labels): the marker-word
# heuristic's failure mode — short docs matching no marker → 'und' —
# is visible as the und column mass.
# Plan / 100 TB: the prediction is the same per-doc expression as
# text_lang_id (ONE definition, _lang_pred_expr); one langs²-bounded
# keyed aggregate + a langs-sized totals broadcast. Nothing
# corpus-sized shuffles.
# ---------------------------------------------------------------------------
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "lang", _lang_pred_expr().alias("pred_lang")
    )
    cells = docs.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = cells.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "pred_lang",
            "n_docs",
            (F.col("n_docs") / F.col("n_lang")).alias("frac_of_lang"),
            (F.col("lang") == F.col("pred_lang"))
            .cast("int")
            .alias("is_correct"),
        )
    )


_register(
    langid_confusion_matrix,
    f"""
WITH p AS (
  SELECT lang,
         CASE WHEN {_s['en']} >= {_s['de']} AND {_s['en']} >= {_s['fr']}
                   AND {_s['en']} >= {_s['es']} AND {_s['en']} > 0 THEN 'en'
              WHEN {_s['de']} >= {_s['fr']} AND {_s['de']} >= {_s['es']}
                   AND {_s['de']} > 0 THEN 'de'
              WHEN {_s['fr']} >= {_s['es']} AND {_s['fr']} > 0 THEN 'fr'
              WHEN {_s['es']} > 0 THEN 'es'
              ELSE 'und' END AS pred_lang
  FROM documents
), cells AS (
  SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM p GROUP BY 1, 2
), totals AS (
  SELECT lang, SUM(n_docs) AS n_lang FROM cells GROUP BY 1
)
SELECT c.lang, c.pred_lang, c.n_docs,
       c.n_docs * 1.0 / t.n_lang AS frac_of_lang,
       CAST(CASE WHEN c.lang = c.pred_lang THEN 1 ELSE 0 END AS INTEGER)
         AS is_correct
FROM cells c JOIN totals t ON c.lang = t.lang
""",
)


# ---------------------------------------------------------------------------
# WordPiece greedy max-match fertility panel (Wu et al. 2016 §4.1
# segmentation; vocab built by frequency thresholding — the simplified
# builder, cited as such): segment every word type by repeatedly
# taking the LONGEST vocabulary piece that prefixes the remaining
# suffix (max piece length WORDPIECE_MAX_LEN; a position with no
# matching piece emits UNK and advances one char), then weight the
# per-type piece/unk counts by occurrence to report per-source
# fertility and unk rate — the second tokenizer ALGORITHM next to the
# BPE pair (bpe_merge_table applies learned merges in merge order;
# greedy max-match is the different decoding the WordPiece family
# ships, and the two panels quantify how the segmentations differ).
# Vocabulary = substrings of length 1..4 whose corpus occurrence mass
# is >= WORDPIECE_VOCAB_RATIO of all substring mass — which PROVABLY
# bounds the vocab at <= 1/ratio entries, so its broadcast join is
# bounded at any corpus size (not merely observed-small).
# Plan / 100 TB: corpus touched once (the word-occurrence groupBy);
# the vocabulary is COLLECTED — legitimate, because the frequency
# threshold bounds it at <= 1/ratio entries regardless of corpus size
# (the kmeans bounded-collect discipline, here with a provable rather
# than configured bound) — and enters the plan as a literal array, so
# the entire greedy segmentation is ONE expression fold over each
# word type's positions: no per-step joins, no iteration jobs (a
# 10-step checkpointed loop was measured 5-7 s of pure job overhead;
# the fold form is a single job). The oracle stays an INDEPENDENT
# formulation — a step-unrolled MATERIALIZED-CTE chain with a real
# vocab JOIN per step — so agreement checks the greedy semantics, not
# a shared shape.
# ---------------------------------------------------------------------------
WORDPIECE_MAX_LEN = 4
WORDPIECE_VOCAB_RATIO = 0.005
WORDPIECE_MAX_STEPS = 10  # oracle unroll depth; >= max fixture word length


def wordpiece_fertility_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 12: the shared persisted word-count frame (guide §5)
    occ_sw = _word_counts_sw(spark, sf_dir)
    occ = occ_sw.groupBy("w").agg(F.sum("c").alias("c"))
    subs = occ.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(w)), i ->"
                f" transform(sequence(1, least({WORDPIECE_MAX_LEN},"
                f" length(w) - i + 1)), k -> substr(w, i, k))))"
            )
        ).alias("piece"),
        "c",
    )
    sub_freq = subs.groupBy("piece").agg(F.sum("c").alias("freq"))
    tot = sub_freq.agg(F.sum("freq").cast("double").alias("t"))
    vocab_rows = (
        sub_freq.crossJoin(F.broadcast(tot))
        .filter(F.col("freq") >= WORDPIECE_VOCAB_RATIO * F.col("t"))
        .select("piece")
        .collect()
    )  # <= 1/WORDPIECE_VOCAB_RATIO rows by the threshold bound
    vlit = F.array(*[F.lit(r.piece) for r in vocab_rows])

    def step(acc: Column, i: Column) -> Column:
        in_v = lambda k: (F.length("w") - i + 1 >= k) & F.array_contains(
            vlit, F.substring(F.col("w"), i, F.lit(k))
        )
        best = F.lit(None).cast("int")
        for k in range(1, WORDPIECE_MAX_LEN + 1):
            best = F.when(in_v(k), k).otherwise(best)
        return F.when(acc.getField("pos") != i, acc).otherwise(
            F.when(
                best.isNotNull(),
                F.struct(
                    (i + best).alias("pos"),
                    (acc.getField("pieces") + 1).alias("pieces"),
                    acc.getField("unks").alias("unks"),
                ),
            ).otherwise(
                F.struct(
                    (i + 1).alias("pos"),
                    acc.getField("pieces").alias("pieces"),
                    (acc.getField("unks") + 1).alias("unks"),
                )
            )
        )

    seg_state = F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.struct(
            F.lit(1).alias("pos"),
            F.lit(0).alias("pieces"),
            F.lit(0).alias("unks"),
        ),
        step,
    )
    seg = occ.select(
        "w",
        seg_state.getField("pieces").alias("pieces"),
        seg_state.getField("unks").alias("unks"),
    )
    return (
        occ_sw.join(seg, "w")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("pieces") * F.col("c")).cast("bigint").alias(
                "n_pieces"
            ),
            F.sum(F.col("unks") * F.col("c")).cast("bigint").alias("n_unk"),
            (
                F.sum(F.col("pieces") * F.col("c")) / F.sum("c")
            ).alias("fertility"),
            (F.sum(F.col("unks") * F.col("c")) / F.sum("c")).alias(
                "unk_rate"
            ),
        )
    )


def _wordpiece_oracle() -> str:
    steps = []
    for k in range(1, WORDPIECE_MAX_STEPS + 1):
        steps.append(
            f"""c{k} AS MATERIALIZED (
  SELECT s.w, MAX(u.k) AS mk
  FROM s{k - 1} s, UNNEST([1, 2, 3, 4]) AS u(k), vocab v
  WHERE s.pos <= s.len AND s.pos + u.k - 1 <= s.len
    AND v.piece = substr(s.w, s.pos, u.k)
  GROUP BY 1
), s{k} AS MATERIALIZED (
  SELECT s.w, s.len,
         CASE WHEN s.pos > s.len THEN s.pos
              WHEN c.mk IS NOT NULL THEN s.pos + c.mk
              ELSE s.pos + 1 END AS pos,
         s.pieces + CASE WHEN s.pos <= s.len AND c.mk IS NOT NULL
                    THEN 1 ELSE 0 END AS pieces,
         s.unks + CASE WHEN s.pos <= s.len AND c.mk IS NULL
                  THEN 1 ELSE 0 END AS unks
  FROM s{k - 1} s LEFT JOIN c{k} c ON c.w = s.w
),"""
        )
    unroll = "\n".join(steps)
    return f"""
WITH occ_sw AS (
  SELECT source, w, COUNT(*) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2
), occ AS (SELECT w, SUM(c) AS c FROM occ_sw GROUP BY 1),
sub AS (
  SELECT substr(w, s.i, l.k) AS piece, SUM(c) AS freq
  FROM occ, UNNEST(range(1, length(w) + 1)) AS s(i),
       UNNEST([1, 2, 3, 4]) AS l(k)
  WHERE s.i + l.k - 1 <= length(w)
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(freq) AS DOUBLE) AS t FROM sub),
vocab AS (
  SELECT piece FROM sub, tot WHERE freq >= {WORDPIECE_VOCAB_RATIO} * t
),
s0 AS (
  SELECT w, length(w) AS len, 1 AS pos, 0 AS pieces, 0 AS unks FROM occ
),
{unroll}
fin AS (SELECT w, pieces, unks FROM s{WORDPIECE_MAX_STEPS})
SELECT o.source, CAST(SUM(o.c) AS BIGINT) AS n_tokens,
       CAST(SUM(f.pieces * o.c) AS BIGINT) AS n_pieces,
       CAST(SUM(f.unks * o.c) AS BIGINT) AS n_unk,
       SUM(f.pieces * o.c) * 1.0 / SUM(o.c) AS fertility,
       SUM(f.unks * o.c) * 1.0 / SUM(o.c) AS unk_rate
FROM occ_sw o JOIN fin f ON o.w = f.w
GROUP BY 1
"""


_register(wordpiece_fertility_panel, _wordpiece_oracle())


# ---------------------------------------------------------------------------
# Tokenizer round-trip QA panel (round 10): encode -> decode -> compare
# against the ORIGINAL text, over the same frequency-thresholded
# WordPiece vocabulary and greedy max-match segmentation as
# wordpiece_fertility_panel (ONE vocab definition). The fertility panel
# counts pieces; this panel proves the segmentation is LOSSLESS where
# it claims to be: the decode re-CONCATENATES the matched pieces (UNK
# positions decode to the replacement char '?'), and a word type is
# round-trip exact iff decoded == original — the QA gate a pipeline
# runs before trusting token counts for packing/billing, catching
# normalization loss and off-by-one segmentation bugs that a pure
# unk-rate cannot (the comparison is on the actual reconstructed
# string, not on the unk counter).
# Per source: occurrence-weighted token fidelity, distinct OOV types,
# and the char-level loss rate (share of characters that decoded to
# the replacement char).
# Plan / 100 TB: identical shape to the fertility panel — corpus
# touched once (word-occurrence groupBy), vocabulary broadcast bounded
# at <= 1/WORDPIECE_VOCAB_RATIO entries by the frequency threshold,
# decode = ONE expression fold per word TYPE (types, not tokens), then
# a sources-sized keyed aggregate.
# ---------------------------------------------------------------------------
def tokenizer_roundtrip_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 12: the shared persisted word-count frame (guide §5)
    occ_sw = _word_counts_sw(spark, sf_dir)
    occ = occ_sw.groupBy("w").agg(F.sum("c").alias("c"))
    subs = occ.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(w)), i ->"
                f" transform(sequence(1, least({WORDPIECE_MAX_LEN},"
                f" length(w) - i + 1)), k -> substr(w, i, k))))"
            )
        ).alias("piece"),
        "c",
    )
    sub_freq = subs.groupBy("piece").agg(F.sum("c").alias("freq"))
    tot = sub_freq.agg(F.sum("freq").cast("double").alias("t"))
    vocab_rows = (
        sub_freq.crossJoin(F.broadcast(tot))
        .filter(F.col("freq") >= WORDPIECE_VOCAB_RATIO * F.col("t"))
        .select("piece")
        .collect()
    )  # <= 1/WORDPIECE_VOCAB_RATIO rows by the threshold bound
    vlit = F.array(*[F.lit(r.piece) for r in vocab_rows])

    def step(acc: Column, i: Column) -> Column:
        in_v = lambda k: (F.length("w") - i + 1 >= k) & F.array_contains(
            vlit, F.substring(F.col("w"), i, F.lit(k))
        )
        best = F.lit(None).cast("int")
        for k in range(1, WORDPIECE_MAX_LEN + 1):
            best = F.when(in_v(k), k).otherwise(best)
        return F.when(acc.getField("pos") != i, acc).otherwise(
            F.when(
                best.isNotNull(),
                F.struct(
                    (i + best).alias("pos"),
                    F.concat(
                        acc.getField("dec"), F.col("w").substr(i, best)
                    ).alias("dec"),
                    acc.getField("unks").alias("unks"),
                ),
            ).otherwise(
                F.struct(
                    (i + 1).alias("pos"),
                    F.concat(acc.getField("dec"), F.lit("?")).alias("dec"),
                    (acc.getField("unks") + 1).alias("unks"),
                )
            )
        )

    seg_state = F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.struct(
            F.lit(1).alias("pos"),
            F.lit("").alias("dec"),
            F.lit(0).alias("unks"),
        ),
        step,
    )
    seg = occ.select(
        "w",
        (seg_state.getField("dec") == F.col("w")).alias("exact"),
        seg_state.getField("unks").alias("unks"),
    )
    return (
        occ_sw.join(seg, "w")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("exact"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
            (
                F.sum(F.when(F.col("exact"), F.col("c")).otherwise(0))
                / F.sum("c")
            ).alias("roundtrip_fidelity"),
            F.count_distinct(
                F.when(~F.col("exact"), F.col("w"))
            ).alias("n_oov_types"),
            (
                F.sum(F.col("unks") * F.col("c"))
                / F.sum(F.length("w") * F.col("c"))
            ).alias("char_loss_rate"),
        )
    )


def _roundtrip_oracle() -> str:
    """Step-unrolled independent formulation, same depth policy as
    _wordpiece_oracle, with the decoded-string accumulator carried
    through the chain."""
    steps = []
    for k in range(1, WORDPIECE_MAX_STEPS + 1):
        steps.append(
            f"""c{k} AS MATERIALIZED (
  SELECT s.w, MAX(u.k) AS mk
  FROM s{k - 1} s, UNNEST([1, 2, 3, 4]) AS u(k), vocab v
  WHERE s.pos <= s.len AND s.pos + u.k - 1 <= s.len
    AND v.piece = substr(s.w, s.pos, u.k)
  GROUP BY 1
), s{k} AS MATERIALIZED (
  SELECT s.w, s.len,
         CASE WHEN s.pos > s.len THEN s.pos
              WHEN c.mk IS NOT NULL THEN s.pos + c.mk
              ELSE s.pos + 1 END AS pos,
         CASE WHEN s.pos > s.len THEN s.dec
              WHEN c.mk IS NOT NULL THEN s.dec || substr(s.w, s.pos, c.mk)
              ELSE s.dec || '?' END AS dec,
         s.unks + CASE WHEN s.pos <= s.len AND c.mk IS NULL
                  THEN 1 ELSE 0 END AS unks
  FROM s{k - 1} s LEFT JOIN c{k} c ON c.w = s.w
),"""
        )
    unroll = "\n".join(steps)
    return f"""
WITH occ_sw AS (
  SELECT source, w, COUNT(*) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2
), occ AS (SELECT w, SUM(c) AS c FROM occ_sw GROUP BY 1),
sub AS (
  SELECT substr(w, s.i, l.k) AS piece, SUM(c) AS freq
  FROM occ, UNNEST(range(1, length(w) + 1)) AS s(i),
       UNNEST([1, 2, 3, 4]) AS l(k)
  WHERE s.i + l.k - 1 <= length(w)
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(freq) AS DOUBLE) AS t FROM sub),
vocab AS (
  SELECT piece FROM sub, tot WHERE freq >= {WORDPIECE_VOCAB_RATIO} * t
),
s0 AS (
  SELECT w, length(w) AS len, 1 AS pos, '' AS dec, 0 AS unks FROM occ
),
{unroll}
fin AS (
  SELECT w, dec = w AS exact, unks FROM s{WORDPIECE_MAX_STEPS}
)
SELECT o.source, CAST(SUM(o.c) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN f.exact THEN o.c ELSE 0 END) AS BIGINT) AS n_exact,
       SUM(CASE WHEN f.exact THEN o.c ELSE 0 END) * 1.0 / SUM(o.c)
         AS roundtrip_fidelity,
       CAST(COUNT(DISTINCT CASE WHEN NOT f.exact THEN o.w END) AS BIGINT)
         AS n_oov_types,
       SUM(f.unks * o.c) * 1.0 / SUM(length(o.w) * o.c) AS char_loss_rate
FROM occ_sw o JOIN fin f ON o.w = f.w
GROUP BY 1
"""


_register(tokenizer_roundtrip_qa, _roundtrip_oracle())


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi fertility panel (Kudo 2018 §3 optimal
# segmentation; piece unigram probs = the same frequency-thresholded
# vocabulary as wordpiece_fertility_panel with p = freq/total, UNK =
# one char at p = 1/total): per word type, the SEGMENTATION OF MAXIMUM
# PROBABILITY via Viterbi DP — the third tokenizer algorithm, and the
# decode-quality comparison for the greedy panel (same vocab, optimal
# vs max-match decode; fertility_viterbi <= greedy fertility is NOT
# guaranteed, probability is what's optimal — the test pins prob).
# Cross-engine determinism: the DP compares PRODUCTS of probabilities,
# never logs — freq/total division and the fold-ordered products are
# exactly-rounded IEEE ops on identical operands, so both engines
# compute bit-identical scores and take identical argmax branches
# (libm ln differs across engines at ulp level and is used only in
# the final reported mean_logprob, where 4dp rounding absorbs it).
# Tie-break order is pinned: UNK first, then k = 1..4, strict >.
# Plan / 100 TB: same shape as the greedy panel — corpus touched once,
# vocab collect bounded at <= 1/ratio entries, DP = one expression
# fold per word TYPE carrying the best-score/piece-count arrays.
# ---------------------------------------------------------------------------
#: Round-12 batch 9: unigram_viterbi_panel's vocab is TRAINED (a
#: substring-frequency aggregate + driver collect) on every invocation;
#: the (probs, unk_p) pair is corpus-determined, so it memoizes under
#: the same session-scoped discipline as _BPE_CACHE / _QC_W_CACHE
#: ((applicationId, sf_dir) key, stale-session eviction). Plain Python
#: floats — no Spark resources to unpersist on eviction.
_UNIGRAM_VOCAB_CACHE: dict[tuple[str, str], tuple[dict, float]] = {}


def _unigram_vocab(
    spark: SparkSession, sf_dir: str
) -> tuple[dict, float]:
    _evict_stale_session_entries(_UNIGRAM_VOCAB_CACHE, spark)
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _UNIGRAM_VOCAB_CACHE.get(key)
    if hit is not None:
        return hit
    occ_sw = _word_counts_sw(spark, sf_dir)
    occ = occ_sw.groupBy("w").agg(F.sum("c").alias("c"))
    subs = occ.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(w)), i ->"
                f" transform(sequence(1, least({WORDPIECE_MAX_LEN},"
                f" length(w) - i + 1)), k -> substr(w, i, k))))"
            )
        ).alias("piece"),
        "c",
    )
    sub_freq = subs.groupBy("piece").agg(F.sum("c").alias("freq"))
    rows = sub_freq.collect()  # substring-type-bounded (Heaps-law)
    tot = float(sum(r.freq for r in rows))
    probs = {
        r.piece: r.freq / tot
        for r in rows
        if r.freq >= WORDPIECE_VOCAB_RATIO * tot
    }
    out = (probs, 1.0 / tot)
    _UNIGRAM_VOCAB_CACHE[key] = out
    return out


#: (session applicationId, sf_dir) -> the BUILT (lazy, un-persisted)
#: viterbi-panel DataFrame. Round 13: the DP fold is a literal
#: create_map over the whole trained vocab times a 4-way unrolled
#: update — a ~10^4-node expression tree whose py4j construction +
#: Catalyst analysis measured 1.0-1.7 s of DRIVER time per invocation
#: (event-log gap, zero stage time). The memo caches the PLAN only:
#: nothing is persisted, every action on it re-executes the full
#: computation from the shared word-count frame — this is
#: plan-construction work-sharing, not result caching.
_VITERBI_DF_CACHE: dict[tuple[str, str], DataFrame] = {}


def unigram_viterbi_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _math

    _evict_stale_session_entries(_VITERBI_DF_CACHE, spark)
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    hit = _VITERBI_DF_CACHE.get(memo_key)
    if hit is not None:
        return hit

    # round 12: the shared persisted word-count frame (guide §5); the
    # trained vocab memoizes per (session, corpus) — see _unigram_vocab
    occ_sw = _word_counts_sw(spark, sf_dir)
    occ = occ_sw.groupBy("w").agg(F.sum("c").alias("c"))
    probs, unk_p = _unigram_vocab(spark, sf_dir)
    pmap = F.create_map(
        *[x for p, v in sorted(probs.items()) for x in (F.lit(p), F.lit(v))]
    )

    def step(acc: Column, i: Column) -> Column:
        scores = acc.getField("s")
        counts = acc.getField("n")
        best = (F.element_at(scores, i) * unk_p).alias("x")
        cnt = F.element_at(counts, i) + 1
        for k in range(1, WORDPIECE_MAX_LEN + 1):
            # the index i-k+1 is <= 0 while i < k and element_at raises
            # before the i >= k guard can short-circuit; clamp it to 1 —
            # pk is NULL in exactly those cases, nulling the candidate
            idx = F.greatest(i - (k - 1), F.lit(1))
            pk = F.when(
                i >= k,
                pmap[F.substring(F.col("w"), i - (k - 1), F.lit(k))],
            )
            cand = F.element_at(scores, idx) * pk
            take = cand.isNotNull() & (cand > best)
            cnt = F.when(take, F.element_at(counts, idx) + 1).otherwise(cnt)
            best = F.when(take, cand).otherwise(best)
        return F.struct(
            F.concat(scores, F.array(best)).alias("s"),
            F.concat(counts, F.array(cnt)).alias("n"),
        )

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.struct(
            F.array(F.lit(1.0)).alias("s"),
            F.array(F.lit(0)).alias("n"),
        ),
        step,
    )
    seg = occ.select(
        "w",
        F.element_at(dp.getField("n"), -1).alias("pieces"),
        F.log(F.element_at(dp.getField("s"), -1)).alias("logprob"),
    )
    out = (
        occ_sw.join(seg, "w")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("pieces") * F.col("c")).cast("bigint").alias(
                "n_pieces"
            ),
            (F.sum(F.col("pieces") * F.col("c")) / F.sum("c")).alias(
                "fertility_viterbi"
            ),
            (F.sum(F.col("logprob") * F.col("c")) / F.sum("c")).alias(
                "mean_logprob"
            ),
        )
    )
    _VITERBI_DF_CACHE[memo_key] = out
    return out


def _viterbi_oracle() -> str:
    # one CTE per position; lateral column aliases give the pinned
    # UNK-first, k=1..4, strict-> update order without expression blowup
    steps = []
    for i in range(1, WORDPIECE_MAX_STEPS + 1):
        joins = []
        cands = []
        for k in range(1, WORDPIECE_MAX_LEN + 1):
            if i - k >= 0:
                joins.append(
                    f"LEFT JOIN probs p{k} ON p{k}.piece ="
                    f" substr(v.w, {i - k + 1}, {k}) AND v.len >= {i}"
                )
                cands.append((k, f"v.b{i - k} * p{k}.p"))
        # carried columns are listed explicitly (never v.*): the stage
        # aliases would otherwise collide with the previous CTE's and
        # lateral references would resolve to the stale columns
        carry = ["v.w", "v.len"] + [
            c for j in range(i) for c in (f"v.b{j}", f"v.n{j}")
        ]
        stage = [
            f"CASE WHEN v.len >= {i} THEN v.b{i - 1} * unk.p END AS s{i}_0",
            f"v.n{i - 1} + 1 AS m{i}_0",
        ]
        for idx, (k, cexpr) in enumerate(cands, 1):
            stage.append(
                f"CASE WHEN {cexpr} IS NOT NULL AND {cexpr} > s{i}_{idx - 1}"
                f" THEN {cexpr} ELSE s{i}_{idx - 1} END AS s{i}_{idx}"
            )
            stage.append(
                f"CASE WHEN {cexpr} IS NOT NULL AND {cexpr} > s{i}_{idx - 1}"
                f" THEN v.n{i - k} + 1 ELSE m{i}_{idx - 1} END AS m{i}_{idx}"
            )
        last = len(cands)
        steps.append(
            f"""v{i} AS MATERIALIZED (
  SELECT {', '.join(carry)}, {', '.join(stage)},
         CASE WHEN v.len >= {i} THEN s{i}_{last} ELSE v.b{i - 1} END AS b{i},
         CASE WHEN v.len >= {i} THEN m{i}_{last} ELSE v.n{i - 1} END AS n{i}
  FROM v{i - 1} v {' '.join(joins)}, unk
),"""
        )
    unroll = "\n".join(steps)
    K = WORDPIECE_MAX_STEPS
    return f"""
WITH occ_sw AS (
  SELECT source, w, COUNT(*) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2
), occ AS (SELECT w, SUM(c) AS c FROM occ_sw GROUP BY 1),
sub AS (
  SELECT substr(w, s.i, l.k) AS piece, SUM(c) AS freq
  FROM occ, UNNEST(range(1, length(w) + 1)) AS s(i),
       UNNEST([1, 2, 3, 4]) AS l(k)
  WHERE s.i + l.k - 1 <= length(w)
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(freq) AS DOUBLE) AS t FROM sub),
probs AS (
  SELECT piece, freq / t AS p FROM sub, tot
  WHERE freq >= {WORDPIECE_VOCAB_RATIO} * t
),
unk AS (SELECT 1.0 / t AS p FROM tot),
v0 AS (
  SELECT w, length(w) AS len, CAST(1.0 AS DOUBLE) AS b0, 0 AS n0 FROM occ
),
{unroll}
fin AS (SELECT w, n{K} AS pieces, ln(b{K}) AS logprob FROM v{K})
SELECT o.source, CAST(SUM(o.c) AS BIGINT) AS n_tokens,
       CAST(SUM(f.pieces * o.c) AS BIGINT) AS n_pieces,
       SUM(f.pieces * o.c) * 1.0 / SUM(o.c) AS fertility_viterbi,
       SUM(f.logprob * o.c) / SUM(o.c) AS mean_logprob
FROM occ_sw o JOIN fin f ON o.w = f.w
GROUP BY 1
"""


_register(unigram_viterbi_panel, _viterbi_oracle())


# ---------------------------------------------------------------------------
# Count-min heavy hitters (Cormode & Muthukrishnan 2005 §3.2): the
# tokens whose exact frequency is ≥ φ·N, each cross-checked against
# the count-min sketch's point estimate (min over the d=4 counter
# rows) with its one-sided overestimate — the QA panel that validates
# the sketch's ε-guarantee on the corpus it will summarize, completing
# the frequency leg of the sketch family (count-min → HLL → quantile
# registers).
# Plan / 100 TB: the exact side is the token-TYPE table (Heaps-law
# bounded) with a 1-row total broadcast; the sketch side reuses
# sketch_count_min_tokens' register build VERBATIM (≤ d·w = 1024 rows,
# broadcast onto the φ-filtered head). Nothing corpus-sized shuffles
# except the two token-key collapses.
# ---------------------------------------------------------------------------
CMS_PHI = 0.02


def _cms_buckets(col: Column) -> Column:
    """The d row-hash buckets of a token — shared with
    sketch_count_min_tokens so panel and sketch cannot drift."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(col, F.lit(f"#cms{i}"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % CMS_WIDTH
            ).cast("int")
            for i in range(CMS_DEPTH)
        ]
    )


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NB (round 12): the shared _word_counts_sw frame was tried and
    # REVERTED here too (0.63 → 0.83 s matched A/B, same scheduling-tax
    # shape as the count-min base — see its note)
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("t"))
    exact = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n_exact"))
    tot = exact.agg(F.sum("n_exact").cast("bigint").alias("n_total"))
    heavy = exact.crossJoin(F.broadcast(tot)).filter(
        F.col("n_exact") >= F.lit(CMS_PHI) * F.col("n_total")
    )
    registers = sketch_count_min_tokens(spark, sf_dir)
    probes = heavy.select(
        "t",
        "n_exact",
        "n_total",
        F.posexplode(_cms_buckets(F.col("t"))).alias("row_id", "bucket"),
    )
    return (
        probes.join(F.broadcast(registers), ["row_id", "bucket"])
        .groupBy("t", "n_exact", "n_total")
        .agg(F.min("cnt").alias("n_cms"))
        .select(
            "t",
            "n_exact",
            "n_cms",
            (F.col("n_cms") - F.col("n_exact")).alias("overestimate"),
        )
    )


_register(
    sketch_cms_heavy_hitters,
    f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
),
exact AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_exact FROM tok GROUP BY 1
),
heavy AS (
  SELECT t, n_exact FROM exact
  WHERE n_exact >= {CMS_PHI} * (SELECT SUM(n_exact) FROM exact)
),
e AS (
  SELECT CAST(i AS INTEGER) AS row_id,
         CAST(CAST(concat('0x', substr(md5(t || '#cms' || i), 1, 8))
                   AS BIGINT) % {{w}} AS INTEGER) AS bucket
  FROM tok, range(0, {{d}}) r(i)
),
regs AS (
  SELECT row_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM e GROUP BY 1, 2
),
probes AS (
  SELECT heavy.t, heavy.n_exact, CAST(i AS INTEGER) AS row_id,
         CAST(CAST(concat('0x', substr(md5(heavy.t || '#cms' || i), 1, 8))
                   AS BIGINT) % {{w}} AS INTEGER) AS bucket
  FROM heavy, range(0, {{d}}) r(i)
)
SELECT probes.t, probes.n_exact, MIN(regs.cnt) AS n_cms,
       MIN(regs.cnt) - probes.n_exact AS overestimate
FROM probes JOIN regs
  ON regs.row_id = probes.row_id AND regs.bucket = probes.bucket
GROUP BY 1, 2
""".replace("{w}", str(CMS_WIDTH)).replace("{d}", str(CMS_DEPTH)),
)


# ---------------------------------------------------------------------------
# Mergeable quantile-sketch registers over document length: a B-bin
# equi-width histogram whose registers merge by plain addition (the
# map-side-combine / cross-shard algebra — the order-statistics leg of
# the sketch family), read out at the nine deciles by within-bin
# linear interpolation and cross-checked against the EXACT percentile
# with the abs error and the ε = bin-width guarantee column.
# Plan / 100 TB: one scan bins every doc (a single expression against
# the broadcast 1-row min/max/count panel); the registers are ≤ B rows
# (map-side combined); the decile read-out is a 9-row × B-row bounded
# grid join + a keyed first-covering-bin pick. The exact side is one
# 1-row percentile aggregate (at 100 TB the exact column is the
# audit's luxury — the registers ARE the production answer;
# approx_percentile is the engine's own equivalent flip).
# ---------------------------------------------------------------------------
QSK_BINS = 128


def sketch_quantile_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("n_chars")
    stats = docs.agg(
        F.min("n_chars").cast("double").alias("lo"),
        F.max("n_chars").cast("double").alias("hi"),
        F.count(F.lit(1)).alias("n_total"),
        F.expr(
            "percentile(n_chars, array(0.1D,0.2D,0.3D,0.4D,0.5D,"
            "0.6D,0.7D,0.8D,0.9D))"
        ).alias("ex"),
    ).select(
        "lo", "hi", "n_total", "ex",
        ((F.col("hi") - F.col("lo")) / F.lit(QSK_BINS)).alias("wdt"),
    )
    regs = (
        docs.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor((F.col("n_chars") - F.col("lo")) / F.col("wdt")),
                F.lit(QSK_BINS - 1),
            )
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    cum = regs.select(
        "bin", "cnt", F.sum("cnt").over(w_cum).alias("cum_cnt")
    )
    grid = stats.select(
        "lo", "n_total", "wdt", F.posexplode("ex").alias("pos", "exact")
    ).select(
        ((F.col("pos") + 1) / F.lit(10.0)).alias("q"),
        "exact",
        (((F.col("pos") + 1) / F.lit(10.0)) * F.col("n_total")).alias(
            "target"
        ),
        "lo",
        "wdt",
    )
    covering = grid.join(
        F.broadcast(cum), F.col("cum_cnt") >= F.col("target")
    )
    first = covering.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("q").orderBy("bin")),
    ).filter(F.col("rn") == 1)
    est = (
        F.col("lo")
        + (
            F.col("bin")
            + (F.col("target") - (F.col("cum_cnt") - F.col("cnt")))
            / F.col("cnt")
        )
        * F.col("wdt")
    )
    return first.select(
        "q",
        est.alias("est"),
        "exact",
        F.abs(est - F.col("exact")).alias("abs_err"),
        F.col("wdt").alias("bin_width"),
    )


_register(
    sketch_quantile_doc_length,
    f"""
WITH stats AS (
  SELECT CAST(MIN(n_chars) AS DOUBLE) AS lo,
         CAST(MAX(n_chars) AS DOUBLE) AS hi,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         quantile_cont(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS ex,
         (CAST(MAX(n_chars) AS DOUBLE) - CAST(MIN(n_chars) AS DOUBLE))
           / {QSK_BINS} AS wdt
  FROM documents
), regs AS (
  SELECT CAST(least(floor((n_chars - stats.lo) / stats.wdt),
                    {QSK_BINS - 1}) AS INTEGER) AS bin,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents, stats GROUP BY 1
), cum AS (
  SELECT bin, cnt,
         CAST(SUM(cnt) OVER (ORDER BY bin
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum_cnt
  FROM regs
), grid AS (
  SELECT (g.pos + 1) / 10.0 AS q,
         g.exact,
         (g.pos + 1) / 10.0 * stats.n_total AS target,
         stats.lo, stats.wdt
  FROM stats,
       LATERAL (SELECT CAST(generate_subscripts(stats.ex, 1) - 1 AS INTEGER)
                         AS pos,
                       unnest(stats.ex) AS exact) g
), first AS (
  SELECT grid.*, cum.bin, cum.cnt, cum.cum_cnt,
         ROW_NUMBER() OVER (PARTITION BY grid.q ORDER BY cum.bin) AS rn
  FROM grid JOIN cum ON cum.cum_cnt >= grid.target
)
SELECT q,
       lo + (bin + (target - (cum_cnt - cnt)) * 1.0 / cnt) * wdt AS est,
       exact,
       abs(lo + (bin + (target - (cum_cnt - cnt)) * 1.0 / cnt) * wdt
           - exact) AS abs_err,
       wdt AS bin_width
FROM first WHERE rn = 1
""",
)


# ---------------------------------------------------------------------------
# Good-Turing count-of-counts panel (Good 1953; Gale & Sampson 1995
# simple GT): the frequency-of-frequencies table N_r over token types,
# with the GT adjusted count r* = (r+1)·N_{r+1}/N_r where the next
# class is populated, and the leave-one-out total-probability mass
# each class carries — the smoothing table behind every classic LM
# (and the unseen-mass estimate N_1/N a crawl's vocabulary-growth
# forecast uses).
# Plan / 100 TB: token counts are the Heaps-bounded TYPE table; the
# count-of-counts collapse is a second ≤distinct-frequencies-bounded
# groupBy; the N_{r+1} lookup is a self-join on the adjacency key
# r+1 over that tiny table; totals ride as a 1-row broadcast.
# ---------------------------------------------------------------------------
def lm_good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("t"))
    types = tok.groupBy("t").agg(F.count(F.lit(1)).alias("r"))
    coc = types.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    nxt = coc.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    tot = types.agg(F.sum("r").cast("bigint").alias("n_tokens"))
    return (
        coc.join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            ((F.col("r") + 1) * F.col("n_r1") / F.col("n_r")).alias(
                "r_star"
            ),
            (F.col("r") * F.col("n_r") / F.col("n_tokens")).alias(
                "p_class"
            ),
        )
    )


_register(
    lm_good_turing_counts,
    """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
), types AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS r FROM tok GROUP BY 1
), coc AS (
  SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM types GROUP BY 1
), tot AS (
  SELECT CAST(SUM(r) AS BIGINT) AS n_tokens FROM types
)
SELECT coc.r, coc.n_r,
       (coc.r + 1) * nxt.n_r * 1.0 / coc.n_r AS r_star,
       coc.r * coc.n_r * 1.0 / tot.n_tokens AS p_class
FROM coc
LEFT JOIN coc nxt ON nxt.r = coc.r + 1
CROSS JOIN tot
""",
)


# ---------------------------------------------------------------------------
# Quality-weighted corpus sampling (Efraimidis & Spirakis 2006 A-Res):
# weighted sampling WITHOUT replacement as a pure expression — each
# doc draws u from its md5 (the engine-portable uniform), keys on
# u^(1/w) with w = its quality score, and the global top-K keys ARE
# the weighted sample. The distributed primitive behind
# quality-weighted corpus subsampling (the text_importance_sample
# family's without-replacement counterpart).
# Plan / 100 TB: one expression pass + TakeOrderedAndProject (per-
# partition K-heap + driver merge — never a global sort). The md5
# uniform makes the draw reproducible across engines AND runs — a
# seeded-sample contract, not just a sampling demo.
# ---------------------------------------------------------------------------
WS_TOPK = 100
WS_MIN_W = 0.05


def sample_weighted_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = text_quality_score(spark, sf_dir).select(
        "doc_id",
        F.greatest(F.col("quality"), F.lit(WS_MIN_W)).alias("w"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#ws"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    keyed = q.select(
        "doc_id", "w", u.alias("rand_u"),
        F.pow(u, F.lit(1.0) / F.col("w")).alias("sample_key"),
    )
    return keyed.orderBy(
        F.col("sample_key").desc(), "doc_id"
    ).limit(WS_TOPK)


_register(
    sample_weighted_quality,
    f"""
WITH q AS (
  SELECT doc_id,
         greatest(
           0.5 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                    / length(text))
           + 0.5 * (len(list_filter(string_split(text, ' '),
                                    t -> t IN ({_stop_in})))
                      / len(string_split(text, ' '))),
           {WS_MIN_W}) AS w
  FROM documents
), keyed AS (
  SELECT doc_id, w,
         (CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#ws'),
                                        1, 8)) AS BIGINT) AS DOUBLE) + 0.5)
           / 4294967296.0 AS rand_u
  FROM q
)
SELECT doc_id, w, rand_u, pow(rand_u, 1.0 / w) AS sample_key
FROM keyed
ORDER BY sample_key DESC, doc_id
LIMIT {WS_TOPK}
""",
)


# ---------------------------------------------------------------------------
# Token burstiness panel (Church & Gale 1995): per token type, the
# collection frequency, document frequency, burstiness cf/df (how
# concentrated the occurrences are in the docs that use the word) and
# the Fano factor var/mean of per-doc counts over ALL docs — the
# dispersion diagnostics a term-weighting or stopword decision reads.
# Plan / 100 TB: per-(doc, token) counts are one map-side-combined
# groupBy over the explode; the panel is a second token-keyed collapse
# (Heaps-bounded) with the doc count as a 1-row broadcast; every
# moment is an exact INTEGER sum.
# ---------------------------------------------------------------------------
def text_burstiness_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    panel = per_doc.groupBy("t").agg(
        F.sum("c").alias("cf"),
        F.count(F.lit(1)).alias("df"),
        F.sum(F.col("c") * F.col("c")).alias("cf2"),
    )
    mean = F.col("cf") / F.col("n_docs")
    ex2 = F.col("cf2") / F.col("n_docs")
    return panel.crossJoin(F.broadcast(n_docs)).select(
        "t",
        "cf",
        "df",
        (F.col("cf") / F.col("df")).alias("burstiness"),
        ((ex2 - mean * mean) / mean).alias("fano_factor"),
    )


_register(
    text_burstiness_panel,
    """
WITH per_doc AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents)
  GROUP BY 1, 2
), nd AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
), panel AS (
  SELECT t, CAST(SUM(c) AS BIGINT) AS cf,
         CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(c * c) AS BIGINT) AS cf2
  FROM per_doc GROUP BY 1
)
SELECT t, cf, df,
       cf * 1.0 / df AS burstiness,
       (cf2 * 1.0 / nd.n_docs
        - (cf * 1.0 / nd.n_docs) * (cf * 1.0 / nd.n_docs))
         / (cf * 1.0 / nd.n_docs) AS fano_factor
FROM panel CROSS JOIN nd
""",
)


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift statistic on document length:
# KS = max |ECDF_A − ECDF_B| between the first ten sources and the
# rest — the distribution-level drift test next to the token-level JS
# divergence (corpus_drift_js). Emits the statistic, the length where
# the ECDF gap peaks (min such length — deterministic tie-break), and
# the classic sqrt(n·m/(n+m))-scaled value the p-value tables read.
# Plan / 100 TB: per-(length) conditional group counts (length-domain-
# bounded), cumulative ECDFs via a global window over that VALUE-
# bounded grid (GLOBAL_WINDOW_ALLOWLIST — the quantile-register
# discipline), TakeOrdered(1) for the argmax. The ECDF differences
# are single divisions of exact integers — engine-identical, so the
# argmax cannot flip between engines.
# ---------------------------------------------------------------------------
def text_ks_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "n_chars",
        (
            F.regexp_extract("source", r"(\d+)$", 1).cast("int") < 10
        ).alias("is_a"),
    )
    per_len = docs.groupBy("n_chars").agg(
        F.sum(F.col("is_a").cast("int")).alias("ca"),
        F.sum((~F.col("is_a")).cast("int")).alias("cb"),
    )
    tot = per_len.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    w_cum = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, 0)
    ecdf = per_len.select(
        "n_chars",
        F.sum("ca").over(w_cum).alias("cum_a"),
        F.sum("cb").over(w_cum).alias("cum_b"),
    ).crossJoin(F.broadcast(tot))
    diff = F.abs(
        F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb")
    )
    top = (
        ecdf.select(
            "n_chars", "na", "nb", diff.alias("gap")
        )
        .orderBy(F.col("gap").desc(), "n_chars")
        .limit(1)
    )
    return top.select(
        "na",
        "nb",
        F.col("gap").alias("ks_stat"),
        F.col("n_chars").alias("ks_at_length"),
        (
            F.col("gap")
            * F.sqrt(
                (F.col("na") * F.col("nb")).cast("double")
                / (F.col("na") + F.col("nb"))
            )
        ).alias("ks_scaled"),
    )


_register(
    text_ks_length_drift,
    r"""
WITH d AS (
  SELECT n_chars,
         CAST(regexp_extract(source, '(\d+)$', 1) AS INTEGER) < 10 AS is_a
  FROM documents
), per_len AS (
  SELECT n_chars,
         SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
  FROM d GROUP BY 1
), tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
  FROM per_len
), ecdf AS (
  SELECT n_chars,
         SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b
  FROM per_len
  WINDOW w AS (ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), g AS (
  SELECT n_chars, tot.na, tot.nb,
         abs(cum_a * 1.0 / tot.na - cum_b * 1.0 / tot.nb) AS gap
  FROM ecdf CROSS JOIN tot
  ORDER BY gap DESC, n_chars
  LIMIT 1
)
SELECT na, nb, gap AS ks_stat, n_chars AS ks_at_length,
       gap * sqrt(CAST(na * nb AS DOUBLE) / (na + nb)) AS ks_scaled
FROM g
""",
)


# ---------------------------------------------------------------------------
# Round-10 second batch (registry growth under the per-round cap).
#
# text_normalize_panel — Unicode/whitespace canonicalization, the very
# first stage of every crawl-derived curation pipeline (C4/Gopher strip
# control chars, fold typographic punctuation, collapse whitespace
# BEFORE any hashing/dedup — otherwise byte-identical prose with curly
# vs straight quotes defeats exact dedup). The fixture corpus is
# already clean, so mess is INJECTED deterministically from doc_id
# (the _MESSY_URL_SQL pattern): typographic quotes, NBSP, zero-width
# space, a control char, tab/CRLF runs — and some doc_ids get NO mess,
# so the `changed` flag is non-vacuous both ways.
#
# Shared dialect: the whole normalization is one translate() plus two
# regexp_replace() per row. Sub-256 characters (controls, quote/dash
# ASCII targets) are built with chr() concatenation instead of
# backslash escapes because the two engines disagree on string-literal
# escape processing (Spark SQL processes \xNN, DuckDB
# standard-conforming strings do not) while chr(n<256) folds to the
# identical constant in both. Codepoints ABOVE 255 must instead be RAW
# UTF-8 literals in the SQL text: Spark's chr() is mod-256 ("ASCII
# character of expr % 256"), so chr(8216) is \x18 there while DuckDB
# yields U+2018 — the one chr() divergence, caught by the hypothesis
# recompute property (tests/test_round10b_properties.py); raw literals
# involve no escape processing and parse to the same codepoints in
# both dialects. DuckDB's regexp_replace needs an explicit 'g' flag
# for global replacement (Spark is global by default) — the only
# per-engine parameter.
#
# Plan / 100 TB: pure per-row JVM expressions inside whole-stage
# codegen; ZERO shuffles. The panel is a scan.
# ---------------------------------------------------------------------------
_MESSY_TEXT_SQL = (
    "CASE WHEN doc_id % 4 = 0 THEN ' \u00a0' ELSE '' END"
    " || CASE WHEN doc_id % 3 = 0 THEN '\u201c' || text || '\u201d'"
    " ELSE text END"
    " || CASE WHEN doc_id % 2 = 0 THEN chr(9) || chr(13) || chr(10) || ' '"
    " ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN '\u200b' || chr(1) ELSE '' END"
)

#: typographic chars folded to ASCII; trailing chars with no `to`
#: counterpart (zero-width space) are DELETED — identical translate()
#: semantics in Spark and DuckDB (pinned in tests/test_round10b_ops.py)
_NORM_FROM = "'‘’“”—– ​'"
_NORM_TO = "chr(39) || chr(39) || chr(34) || chr(34) || '--' || ' '"


def _text_norm_sql(col: str, g: str) -> str:
    """The normalization expression over messy column ``col``;
    ``g`` = ", 'g'" for DuckDB (global regexp flag), "" for Spark."""
    mapped = f"translate({col}, {_NORM_FROM}, {_NORM_TO})"
    ctl = (
        f"regexp_replace({mapped},"
        f" '[' || chr(1) || '-' || chr(31) || chr(127) || ']', ' '{g})"
    )
    return f"trim(regexp_replace({ctl}, ' +', ' '{g}))"


def text_normalize_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.expr(_MESSY_TEXT_SQL).alias("messy")
    )
    norm = F.expr(_text_norm_sql("messy", ""))
    return docs.select(
        "doc_id",
        F.length("messy").cast("bigint").alias("n_chars_raw"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
        (F.length("messy") - F.length(norm)).cast("bigint").alias("shrunk"),
        (norm != F.col("text")).alias("changed"),
        F.md5(norm).alias("norm_hash"),
    )


_register(
    text_normalize_panel,
    f"""
WITH raw AS (
  SELECT doc_id, text, {_MESSY_TEXT_SQL} AS messy FROM documents
), n AS (
  SELECT doc_id, text, messy,
         {_text_norm_sql("messy", ", 'g'")} AS norm
  FROM raw
)
SELECT doc_id,
       CAST(length(messy) AS BIGINT) AS n_chars_raw,
       CAST(length(norm) AS BIGINT) AS n_chars_norm,
       CAST(length(messy) - length(norm) AS BIGINT) AS shrunk,
       norm <> text AS changed,
       md5(norm) AS norm_hash
FROM n
""",
)


# ---------------------------------------------------------------------------
# ANN recall panel — mechanism validation as a first-class query: the
# recall@5 of BOTH approximate index paths (IVF 2-probe and
# random-hyperplane LSH) against the exact brute-force top-5
# (similarity_topk), per query vector and per method. This is the
# number an ANN index is GRADED on; shipping it as a registered
# operator means the REGIME claim the docstrings make — IVF recalls
# general nearest neighbors on clustered data (~0.9 here), LSH only
# recalls near-duplicates (cos ≳ 0.95) and scores 0.0 on this
# corpus's general top-5 — is recomputed and driver-oracle-checked on
# every sweep instead of living in prose. Composes the registered
# queries' own DataFrames (the test_pipeline_e2e discipline: the panel
# cannot drift from the operators it scores).
#
# Determinism: both engines compute all legs; the IVF leg's coarse
# assignment margins sit ~10 orders above cross-engine float drift
# (measured for similarity_ivf's own oracle), the LSH bucketing is
# md5-derived, and recall is a ratio of small integer counts — exact
# multiples of 1/5, hash-stable.
#
# Plan / 100 TB: the exact leg is a broadcast of the (bounded) query
# set against the corpus — at production scale the exact leg runs on a
# SAMPLE of queries (this is how FAISS/ScaNN recall is measured: a
# fixed query benchmark, not all vectors), so the panel stays
# broadcast-joins + keyed counts; never all-pairs.
# ---------------------------------------------------------------------------
@_plan_memo
def ann_recall_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NB (round 12): a localCheckpoint on the 4x-referenced exact table
    # was tried and measured dead-neutral (ReuseExchange already shares
    # the brute-force subtree's exchanges) — not kept.
    # plan_memo (round 13): the panel embeds all three similarity
    # subplans — ~1.9 s of driver-side analysis per build, the
    # registry's deepest lazy plan; every action still recomputes the
    # three legs from parquet (+ the documented trained-artifact memos
    # the similarity family already holds).
    exact = similarity_topk(spark, sf_dir).select("query_id", "neighbor_id")
    n_ex = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )

    def leg(method: str, approx: DataFrame) -> DataFrame:
        hits = exact.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "leftsemi",
        )
        n_hit = hits.groupBy("query_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hit")
        )
        return n_ex.join(n_hit, "query_id", "left").select(
            F.lit(method).alias("method"),
            "query_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0)) / F.col("n_exact")
            ).alias("recall_at_5"),
        )

    ivf = leg("ivf", similarity_ivf(spark, sf_dir))
    lsh = leg(
        "lsh",
        similarity_lsh_bucketed(spark, sf_dir).filter(F.col("query_id") < 5),
    )
    return ivf.unionByName(lsh)


def _ann_leg_sql(method: str, approx_sql: str) -> str:
    return f"""
SELECT '{method}' AS method, n_ex.query_id, n_exact,
       CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
       COALESCE(n_hit, 0) * 1.0 / n_exact AS recall_at_5
FROM (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM exact_k GROUP BY 1
) n_ex LEFT JOIN (
  -- COUNT(DISTINCT): the Spark twin counts via a deduplicating
  -- left-semi join, so the oracle must also count each exact
  -- neighbor at most once — otherwise the twins agree only while
  -- both approx legs happen to emit unique (query_id, neighbor_id)
  -- pairs (one LSH bucket / one IVF home cell per vector), a latent
  -- divergence if an approx leg ever gains multi-cell membership
  -- (ADVICE r10).
  SELECT e.query_id, CAST(COUNT(DISTINCT e.neighbor_id) AS BIGINT) AS n_hit
  FROM exact_k e
  JOIN ({approx_sql}) a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
  GROUP BY 1
) n_hit ON n_ex.query_id = n_hit.query_id
"""


_register(
    ann_recall_panel,
    f"""
WITH exact_k AS (
  SELECT query_id, neighbor_id FROM ({ORACLE["similarity_topk"]}) t
)
{_ann_leg_sql("ivf", ORACLE["similarity_ivf"])}
UNION ALL
{_ann_leg_sql(
    "lsh",
    f'SELECT * FROM ({ORACLE["similarity_lsh_bucketed"]}) l WHERE query_id < 5',
)}
""",
)


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle — reproducible training-data ORDER.
# Training runs shuffle the corpus differently per epoch but must be
# bit-reproducible for repro/debug (and for resuming mid-epoch at a
# known position). Hash-based shuffles (xxhash64(seed, id)) are the
# common trick but the two engines' hash functions differ; an AFFINE
# PERMUTATION pos = (p*rank + 7919*epoch) mod n is reproducible,
# oracle-exact, AND a guaranteed bijection: p is prime and coprime
# with n, so multiplication by p permutes Z_n (every doc appears
# exactly once per epoch — positions collide never, a property a
# mere hash sort lacks).
#
# Mechanism, not constant: p = first prime in EPOCH_SHUFFLE_PRIMES
# with n % p != 0, derived from the metadata-only corpus count (the
# _phash_band_bits pattern). A corpus divisible by all five listed
# primes would exceed 10^30 docs, so the chain is total in practice;
# at every test SF (n <= 5000 < 10^6) the first prime wins, so the
# static-constant oracle SQL is the exact twin. Overflow headroom:
# p*rank < 10^6 * n stays inside int64 up to n ~ 9*10^12 docs.
#
# Rank mechanism: sorted_rank (operators/utils.py) — range-partitioned
# parallel sort + broadcast partition offsets; a global-window
# ROW_NUMBER would serialize the corpus into one partition. The oracle
# reproduces it as ROW_NUMBER() OVER (ORDER BY doc_id) because ranks
# by a key column are engine-independent.
# ---------------------------------------------------------------------------
EPOCH_SHUFFLE_PRIMES = (1000003, 1000033, 1000037, 1000039, 1000081)
EPOCH_SHUFFLE_OFFSET = 7919
EPOCH_SHUFFLE_EPOCHS = 2


def _epoch_shuffle_prime(n_docs: int) -> int:
    """Smallest listed prime coprime with the corpus size — the
    multiplier of the affine permutation over Z_n."""
    for p in EPOCH_SHUFFLE_PRIMES:
        if n_docs % p != 0:
            return p
    raise ValueError(
        f"corpus size {n_docs} divisible by every candidate prime"
    )


def epoch_shuffle_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.utils import sorted_rank

    n = _corpus_count(spark, sf_dir, "documents")
    if n == 0:
        # empty corpus: nothing to order (the oracle's answer); without
        # this, `% n` is undefined and the prime chain has no coprime
        return spark.createDataFrame([], "doc_id long, epoch int, pos long")
    p = _epoch_shuffle_prime(n)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    ranked = sorted_rank(docs, "doc_id", rank_col="rid")
    return ranked.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(EPOCH_SHUFFLE_EPOCHS - 1))
        ).alias("epoch"),
        "rid",
    ).select(
        "doc_id",
        F.col("epoch").cast("int").alias("epoch"),
        (
            (F.lit(p) * F.col("rid") + F.lit(EPOCH_SHUFFLE_OFFSET) * F.col("epoch"))
            % F.lit(n)
        ).cast("bigint").alias("pos"),
    )


# static twin: at every test SF n < 10^6, so the derived prime is the
# list head — the same constant-vs-mechanism contract as the pHash
# band width's 8-bit static oracle
_register(
    epoch_shuffle_contract,
    f"""
WITH ranked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rid,
         COUNT(*) OVER () AS n
  FROM documents
)
SELECT doc_id, CAST(epoch AS INTEGER) AS epoch,
       CAST(({EPOCH_SHUFFLE_PRIMES[0]} * rid
             + {EPOCH_SHUFFLE_OFFSET} * epoch) % n AS BIGINT) AS pos
FROM ranked, LATERAL (SELECT unnest(range(0, {EPOCH_SHUFFLE_EPOCHS})) AS epoch)
""",
)


# ---------------------------------------------------------------------------
# Multimodal frame sampling — the video leg of the multimodal
# plumbing (binary_meta covers magic-byte typing, feature_extract the
# image features, phash_neardup the image near-dup; frame SAMPLING is
# how video enters a training pipeline: decode is far too expensive
# for every frame, so a strided subset is extracted per clip).
#
# Same stub policy as operators/multimodal.py: the real
# demux/decode is codec work (absent from this container); the
# deterministic stand-in derives a frame COUNT from the blob id, maps
# each sampled frame to its BYTE OFFSET in the blob, and computes a
# locality-preserving checksum from a strided byte sample of the
# frame's span (the dHash stand-in discipline — near-identical blobs
# get near-identical frame checksums, so downstream frame-level dedup
# over this output is semantically real). The Spark-side plumbing —
# schema, explode shape, per-frame rows, offset math — is the real
# deliverable and is exact.
#
# Plan / 100 TB: one scan, per-row explode of <= 6 sampled frame
# indices (bounded fan-out), all integer arithmetic in whole-stage
# codegen; ZERO shuffles.
# ---------------------------------------------------------------------------
FRAME_SAMPLE_MAX = 6
_FRAME_MIN_LEN = 32


def _frame_exprs(idiv: str) -> dict[str, str]:
    """Shared frame arithmetic; ``idiv`` is the engine's integer-divide
    operator ('div' for Spark, '//' for DuckDB)."""
    n_frames = "(8 + doc_id % 25)"
    stride = f"(({n_frames} + {FRAME_SAMPLE_MAX - 1}) {idiv} {FRAME_SAMPLE_MAX})"
    span = f"(length(text) {idiv} {n_frames})"
    return {"n_frames": n_frames, "stride": stride, "span": span}


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _frame_exprs("div")
    docs = load(spark, sf_dir, "documents").filter(
        F.length("text") >= _FRAME_MIN_LEN
    )
    frames = docs.select(
        "doc_id",
        "text",
        F.expr(e["n_frames"]).cast("int").alias("n_frames"),
        F.expr(e["span"]).alias("span"),
        F.explode(
            F.expr(
                f"sequence(0, {e['n_frames']} - 1, {e['stride']})"
            )
        ).alias("frame_idx"),
    )
    checksum = F.expr(
        "aggregate(transform(sequence(0, 7), i ->"
        " ascii(substring(text, 1 + frame_idx * span + (i * span) div 8, 1))"
        " * (i + 1)), 0, (acc, x) -> acc + x)"
    )
    return frames.select(
        "doc_id",
        "n_frames",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx") * F.col("span")).cast("bigint").alias("frame_offset"),
        checksum.cast("bigint").alias("frame_checksum"),
    )


_frame_d = _frame_exprs("//")

_register(
    multimodal_frame_sample,
    f"""
WITH frames AS (
  SELECT doc_id, text,
         {_frame_d["n_frames"]} AS n_frames,
         {_frame_d["span"]} AS span,
         unnest(range(0, {_frame_d["n_frames"]}, {_frame_d["stride"]}))
           AS frame_idx
  FROM documents
  WHERE length(text) >= {_FRAME_MIN_LEN}
)
SELECT doc_id,
       CAST(n_frames AS INTEGER) AS n_frames,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(frame_idx * span AS BIGINT) AS frame_offset,
       CAST(list_sum(list_transform(range(0, 8), i ->
            ascii(substr(text, CAST(1 + frame_idx * span + (i * span) // 8
                                    AS INTEGER), 1))
            * (i + 1))) AS BIGINT) AS frame_checksum
FROM frames
""",
)


# ---------------------------------------------------------------------------
# MinHash estimator-error panel — the sketch-QA companion the MinHash
# family lacked: q49 audits HLL/percentile sketches against their
# exact counterparts and ann_recall_panel audits the ANN indexes, but
# nothing measured how well the k=8 chunked-md5 MinHash signature
# actually ESTIMATES Jaccard. For every LSH candidate pair this emits
# the signature estimate (fraction of agreeing minhash rows — the
# number LSH banding thresholds are derived from), the exact
# shingle-set Jaccard, and the absolute error. Composed entirely from
# the registered operators' own pieces (_shingled/_minhash_sig/
# dedup_minhash_lsh — the test_pipeline_e2e discipline).
#
# Determinism: minhash rows are md5-derived (both engines agree
# bit-for-bit); the estimate is a multiple of 1/8 and the exact value
# a ratio of ints, so the panel is hash-stable.
#
# Plan / 100 TB: candidates come from the banded LSH (never
# all-pairs); the signature + shingle-set features join back by doc id
# (two hash joins per side); per-pair work is 8 chunk comparisons and
# one set intersection — the same bound as dedup_lsh_verified.
# ---------------------------------------------------------------------------
def minhash_estimate_error_panel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Round 12 (guide §5): both feature legs are the session's shared
    # persisted frames — the signature table (_mh_sig_frame) and the
    # distinct-shingle sets (_decon_sset, whose definition IS the
    # array_distinct this panel previously recomputed). The earlier
    # localCheckpoint experiment on the recomputed feature table
    # (3.33 → 3.65 s, reverted) predates the shared frames.
    feats = _mh_sig_frame(spark, sf_dir).join(
        _decon_sset(spark, sf_dir), "doc_id"
    )
    pairs = dedup_minhash_lsh(spark, sf_dir)
    fa = feats.select([F.col(c).alias(f"a_{c}") for c in feats.columns])
    fb = feats.select([F.col(c).alias(f"b_{c}") for c in feats.columns])
    j = pairs.join(fa, pairs.doc_a == F.col("a_doc_id")).join(
        fb, pairs.doc_b == F.col("b_doc_id")
    )
    agree = sum(
        F.when(F.col(f"a_mh{k}") == F.col(f"b_mh{k}"), 1).otherwise(0)
        for k in range(_MINHASH_K)
    )
    est = agree / F.lit(float(_MINHASH_K))
    inter = F.size(F.array_intersect("a_sset", "b_sset"))
    union = F.size("a_sset") + F.size("b_sset") - inter
    exact = inter / union
    return j.select(
        "doc_a",
        "doc_b",
        est.alias("est_jaccard"),
        exact.alias("exact_jaccard"),
        F.abs(est - exact).alias("abs_error"),
    )


_est_sql = (
    "("
    + " + ".join(
        f"CASE WHEN sa.mh{k} = sb.mh{k} THEN 1 ELSE 0 END"
        for k in range(_MINHASH_K)
    )
    + f") / {float(_MINHASH_K)}"
)
_exact_sql = (
    "len(list_intersect(a.sset, b.sset)) * 1.0"
    " / (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)))"
)

_register(
    minhash_estimate_error_panel,
    f"""
WITH pairs AS (
{ORACLE["dedup_minhash_lsh"].strip()}
), toks3 AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), shingled3 AS (
  SELECT doc_id,
         list_transform(range(0, len(t) - 2),
                        i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])
           AS shingles
  FROM toks3
), sh AS (
  SELECT doc_id, list_distinct(shingles) AS sset FROM shingled3
), hashed3 AS (
  SELECT doc_id, list_transform(shingles, s -> md5(s)) AS hs FROM shingled3
), sig3 AS (
  SELECT doc_id,
         {", ".join(
             f"list_min(list_transform(hs, h -> substr(h, {4 * k + 1}, 4)))"
             f" AS mh{k}"
             for k in range(_MINHASH_K)
         )}
  FROM hashed3
)
SELECT p.doc_a, p.doc_b,
       {_est_sql} AS est_jaccard,
       {_exact_sql} AS exact_jaccard,
       abs({_est_sql} - {_exact_sql}) AS abs_error
FROM pairs p
JOIN sig3 sa ON p.doc_a = sa.doc_id
JOIN sig3 sb ON p.doc_b = sb.doc_id
JOIN sh a ON p.doc_a = a.doc_id
JOIN sh b ON p.doc_b = b.doc_id
""",
)


# ---------------------------------------------------------------------------
# Perplexity-based decontamination (round 11) — the SOFT companion to
# the exact shingle join (text_decontaminate) and the Bloom screen
# (bloom_decontaminate_screen): score each benchmark-overlap CANDIDATE
# document's perplexity under an interpolated Kneser-Ney bigram LM
# trained on the BENCHMARK split itself (the lm_kn_bigram math,
# Kneser & Ney 1995 / Chen & Goodman 1999). A doc that merely shares a
# few formulaic shingles with the benchmark scores high perplexity and
# survives; a doc that IS benchmark-like prose (paraphrased or
# reformatted test data the exact join cannot see past) scores low and
# is flagged — the same reasoning CCNet runs in reverse (there: keep
# low-ppl under Wikipedia; here: drop low-ppl under the eval suite).
#
# Model mechanics: the benchmark's bigram-type table plus its keyed
# marginals (c(w1), N1+(w1,·), N1+(·,w2), |types|) — the lm_kn_bigram
# expressions verbatim, but trained on the benchmark split only and
# WITHOUT the min-count head (a benchmark is small; every observed
# type matters). Unseen mass backs off exactly as interpolated KN
# does: pair unseen but w1 known → the w1 continuation weight times
# Pcont(w2); w1 unknown but w2 seen → Pcont(w2); both unknown → the
# mechanized floor 0.5/|types| (half of one type's continuation mass —
# derived from the model size in BOTH engines, never a magic
# constant).
#
# Determinism: every probability is a ratio of exact ints in fixed
# expression order; per-doc avg log-p aggregates commute in the
# driver's round(…,4) hash band (the corpus_datasheet precedent).
#
# Plan / 100 TB: a benchmark is eval-suite-sized, so the four model
# tables are broadcast (the text_decontaminate scale note); only the
# CANDIDATE docs (left-semi of the exact screen — a tiny fraction of
# the corpus) are ever bigram-exploded and scored, so the scoring
# shuffle is candidates-sized on token keys. No windows, no all-pairs,
# nothing corpus² anywhere.
# ---------------------------------------------------------------------------
PPL_DECON_MAX = 40.0  # flag candidates at or below this perplexity


def perplexity_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # candidates: the exact screen's flagged docs (>= 1 shared shingle)
    return _ppl_over_flagged(
        spark, sf_dir, text_decontaminate(spark, sf_dir)
    )


def _ppl_over_flagged(
    spark: SparkSession, sf_dir: str, flagged: DataFrame
) -> DataFrame:
    """KN-bigram perplexity scoring of a (doc_id,
    n_contaminated_shingles) candidate frame (round-12 batch 9:
    extracted from perplexity_decontaminate verbatim so the fused
    verdict panel scores its own candidate frame with the screen's
    exact construction)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    bench_docs = docs.filter(F.col("doc_id") % _DECON_MOD == 0)

    # benchmark bigram model — the SHARED _kn_model_tables construction
    # (lm_kn_bigram's, no min-count head). bc PERSISTED (the
    # bloom-screen discipline): the type table feeds FOUR consumers
    # (the pair join + the three marginals), and without the persist
    # each one re-executes the benchmark explode + groupBy from the
    # scan.
    bc, ctx, pre, types = _kn_model_tables(bench_docs, persist=True)

    cand = docs.join(flagged, "doc_id").select(
        "doc_id", "text", "n_contaminated_shingles"
    )
    grams = cand.select(
        "doc_id",
        "n_contaminated_shingles",
        F.explode(_bigram_pairs_expr()).alias("p"),
    ).select(
        "doc_id",
        "n_contaminated_shingles",
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
    )
    D = KN_DISCOUNT
    scored = (
        grams.join(F.broadcast(bc), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(pre), "w2", "left")
        .crossJoin(F.broadcast(types))
        .select(
            "doc_id",
            "n_contaminated_shingles",
            F.when(F.col("c").isNotNull(), _kn_seen_prob())
            .when(
                F.col("c1").isNotNull() & F.col("n_prec").isNotNull(),
                (D * F.col("n1p") / F.col("c1"))
                * (F.col("n_prec") / F.col("n_types")),
            )
            .when(
                F.col("n_prec").isNotNull(),
                F.col("n_prec") / F.col("n_types"),
            )
            .otherwise(F.lit(0.5) / F.col("n_types"))
            .alias("p"),
        )
    )
    return (
        scored.groupBy("doc_id", "n_contaminated_shingles")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.avg(F.log("p")).alias("avg_logp"),
        )
        .select(
            "doc_id",
            "n_contaminated_shingles",
            "n_bigrams",
            "avg_logp",
            F.exp(-F.col("avg_logp")).alias("ppl"),
            (F.exp(-F.col("avg_logp")) <= PPL_DECON_MAX).alias("flagged"),
        )
    )


_register(
    perplexity_decontaminate,
    f"""
WITH pr AS (
  SELECT doc_id,
         unnest({_KN_PAIRS_LT}) AS p
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
bc AS (
  SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS c FROM pr
  WHERE doc_id % {_DECON_MOD} = 0 GROUP BY 1, 2
),
{_KN_MARGINALS_SQL},
flagged AS (
{ORACLE["text_decontaminate"].strip()}
),
grams AS (
  SELECT f.doc_id, f.n_contaminated_shingles, pr.p.w1 AS w1, pr.p.w2 AS w2
  FROM flagged f JOIN pr ON pr.doc_id = f.doc_id
),
scored AS (
  SELECT g.doc_id, g.n_contaminated_shingles,
         CASE WHEN bc.c IS NOT NULL THEN
                {_kn_seen_prob_sql()}
              WHEN ctx.c1 IS NOT NULL AND pre.n_prec IS NOT NULL THEN
                ({KN_DISCOUNT} * ctx.n1p / ctx.c1)
                  * (pre.n_prec / types.n_types)
              WHEN pre.n_prec IS NOT NULL THEN pre.n_prec / types.n_types
              ELSE 0.5 / types.n_types END AS p
  FROM grams g
  LEFT JOIN bc ON g.w1 = bc.w1 AND g.w2 = bc.w2
  LEFT JOIN ctx ON g.w1 = ctx.w1
  LEFT JOIN pre ON g.w2 = pre.w2
  CROSS JOIN types
)
SELECT doc_id, n_contaminated_shingles,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       AVG(ln(p)) AS avg_logp,
       exp(-AVG(ln(p))) AS ppl,
       exp(-AVG(ln(p))) <= {PPL_DECON_MAX} AS flagged
FROM scored
GROUP BY 1, 2
""",
)


# ---------------------------------------------------------------------------
# Multimodal audio leg (round 11) — windowed amplitude/checksum panel,
# completing the modality trio (image: multimodal_phash_neardup +
# multimodal_feature_extract; video: multimodal_frame_sample; audio:
# this). The plumbing a real audio-curation pass needs — fixed-length
# analysis WINDOWS over a PCM sample stream, per-window byte offsets,
# amplitude statistics (the clipping / silence screens), and a
# locality-preserving window checksum (the near-dup key) — is real and
# oracle-checked; only the CODEC is stubbed, per the standing
# multimodal policy (operators/multimodal.py:97 raises
# NotImplementedError unless a decoder is importable; here the "PCM
# byte stream" is the document text's byte values, the same honest
# deterministic fake multimodal_frame_sample uses for video frames).
#
# Window arithmetic mirrors the frame leg: per doc, n_windows =
# 4 + doc_id % 13 (a metadata-derived, engine-identical count), span =
# len/n_windows samples per window, and a stride subsamples at most
# AUDIO_WINDOW_MAX windows per doc — the bounded fan-out that keeps the
# explode O(docs), never O(samples). Each emitted window probes 8
# evenly-spaced samples: peak (the clipping screen), sum (the silence
# screen: low total amplitude = near-silent window), and a
# position-weighted checksum (locality-preserving — the audio analog of
# the frame checksum).
#
# Plan / 100 TB: one scan, <= AUDIO_WINDOW_MAX-row bounded fan-out per
# doc, zero shuffles, zero joins — the same all-expression shape as the
# frame leg (whole-stage codegen end to end).
# ---------------------------------------------------------------------------
AUDIO_WINDOW_MAX = 8
_AUDIO_MIN_LEN = 64


def _audio_exprs(idiv: str) -> dict[str, str]:
    """Shared window arithmetic; ``idiv`` is the engine's integer-divide
    operator ('div' for Spark, '//' for DuckDB)."""
    n_win = "(4 + doc_id % 13)"
    stride = f"(({n_win} + {AUDIO_WINDOW_MAX - 1}) {idiv} {AUDIO_WINDOW_MAX})"
    span = f"(length(text) {idiv} {n_win})"
    return {"n_win": n_win, "stride": stride, "span": span}


def multimodal_audio_window_panel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _audio_exprs("div")
    docs = load(spark, sf_dir, "documents").filter(
        F.length("text") >= _AUDIO_MIN_LEN
    )
    wins = docs.select(
        "doc_id",
        "text",
        F.expr(e["n_win"]).cast("int").alias("n_windows"),
        F.expr(e["span"]).alias("span"),
        F.explode(
            F.expr(f"sequence(0, {e['n_win']} - 1, {e['stride']})")
        ).alias("win_idx"),
    )
    probe = (
        "transform(sequence(0, 7), i ->"
        " ascii(substring(text, 1 + win_idx * span + (i * span) div 8, 1)))"
    )
    return wins.select(
        "doc_id",
        "n_windows",
        F.col("win_idx").cast("int").alias("win_idx"),
        (F.col("win_idx") * F.col("span")).cast("bigint").alias("win_offset"),
        F.col("span").cast("bigint").alias("win_samples"),
        F.expr(f"array_max({probe})").cast("int").alias("amp_peak"),
        F.expr(f"aggregate({probe}, 0, (acc, x) -> acc + x)")
        .cast("bigint")
        .alias("amp_sum"),
        F.expr(
            f"aggregate(zip_with({probe}, sequence(1, 8), (x, i) -> x * i),"
            " 0, (acc, x) -> acc + x)"
        )
        .cast("bigint")
        .alias("win_checksum"),
    )


_audio_d = _audio_exprs("//")
_probe_d = (
    "list_transform(range(0, 8), i ->"
    " ascii(substr(text, CAST(1 + win_idx * span + (i * span) // 8"
    " AS INTEGER), 1)))"
)

_register(
    multimodal_audio_window_panel,
    f"""
WITH wins AS (
  SELECT doc_id, text,
         {_audio_d["n_win"]} AS n_windows,
         {_audio_d["span"]} AS span,
         unnest(range(0, {_audio_d["n_win"]}, {_audio_d["stride"]})) AS win_idx
  FROM documents
  WHERE length(text) >= {_AUDIO_MIN_LEN}
)
SELECT doc_id,
       CAST(n_windows AS INTEGER) AS n_windows,
       CAST(win_idx AS INTEGER) AS win_idx,
       CAST(win_idx * span AS BIGINT) AS win_offset,
       CAST(span AS BIGINT) AS win_samples,
       CAST(list_max({_probe_d}) AS INTEGER) AS amp_peak,
       CAST(list_sum({_probe_d}) AS BIGINT) AS amp_sum,
       CAST(list_sum(list_transform(range(0, 8), i ->
            ascii(substr(text, CAST(1 + win_idx * span + (i * span) // 8
                                    AS INTEGER), 1)) * (i + 1)))
            AS BIGINT) AS win_checksum
FROM wins
""",
)


# ---------------------------------------------------------------------------
# Decontamination verdict fusion (round 11) — the three contamination
# screens as ONE per-document audit table, the composition a release
# actually publishes (the test_pipeline_e2e discipline: the panel is
# built from the registered operators' own frames, so it cannot drift
# from them). For every document any screen flags:
#   - the Bloom bitset screen (one-sided: no false negatives, ~1e-3
#     fp) supplies the candidate superset + containment share;
#   - the exact shingle join supplies ground truth overlap counts;
#   - the benchmark-LM perplexity supplies the SOFT read on whether
#     the overlap is benchmark-like prose or formulaic coincidence.
# Verdict ladder: 'confirmed' (exact overlap AND benchmark-like ppl),
# 'overlap' (exact overlap, high ppl — shared boilerplate), and
# 'screen_fp' (Bloom-only — the screen's false positive, the row an
# fp-budget audit counts). A Bloom-only doc has NO exact hits by the
# one-sided invariant, so n_exact_hits coalesces to 0 and ppl to NULL
# honestly (nothing was scored).
#
# Plan / 100 TB: all three inputs share the persisted distinct-shingle
# frame (CacheManager plan-dedup); the fusion is two doc_id-keyed hash
# joins on the candidates-sized frames. Nothing corpus² anywhere.
# ---------------------------------------------------------------------------
def decontaminate_verdict_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 12 batch 9 (guide §2.4 — one corpus pass, not three): the
    # r11 form composed the three REGISTERED screens, so the corpus
    # sset frame was exploded + broadcast-joined + doc-aggregated three
    # times (bloom occurrence count, exact count, and the ppl leg's own
    # embedded text_decontaminate). The screens' build sides are now
    # shared helpers (_bloom_type_flags, _decon_bench_set,
    # _ppl_over_flagged — each the screen's own construction, so the
    # panel still cannot drift from them), and ONE explode with two
    # broadcast left joins computes bloom_hits and n_exact in a single
    # doc aggregate. Equivalences: count(col) skips nulls, so
    # count(bl)/count(ex) are exactly the inner-join counts; the Bloom
    # filter has no false negatives (the one-sided-superset pin), so
    # "n_exact > 0" rows are exactly the exact screen's rows and the
    # bloom_hits >= 1 filter drops none of them; n_exact is 0, never
    # NULL, for exact-clean docs — the old COALESCE.
    sh = _decon_sset(spark, sf_dir)
    tflag = _bloom_type_flags(spark, sf_dir, sh)
    bench = _decon_bench_set(sh)
    occ = sh.filter(F.col("doc_id") % _DECON_MOD != 0).select(
        "doc_id",
        F.size("sset").cast("bigint").alias("n_shingles"),
        F.explode("sset").alias("s"),
    )
    # localCheckpoint: the per-doc verdict aggregate is docs-sized and
    # referenced twice (the panel base AND the ppl leg's candidate
    # derivation) — uncheckpointed, the whole fused subtree re-plans
    # under the ppl join
    per_doc = (
        occ.join(F.broadcast(tflag.withColumn("bl", F.lit(1))), "s", "left")
        .join(F.broadcast(bench.withColumn("ex", F.lit(1))), "s", "left")
        .groupBy("doc_id", "n_shingles")
        .agg(
            F.count("bl").alias("bloom_hits"),
            F.count("ex").alias("n_exact"),
        )
        .filter(F.col("bloom_hits") > 0)
        .localCheckpoint(eager=True)
    )
    flagged = per_doc.filter(F.col("n_exact") > 0).select(
        "doc_id", F.col("n_exact").alias("n_contaminated_shingles")
    )
    ppl = _ppl_over_flagged(spark, sf_dir, flagged).select(
        "doc_id", "ppl", "flagged"
    )
    return (
        per_doc.join(ppl, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            "bloom_hits",
            (F.col("bloom_hits") / F.col("n_shingles")).alias(
                "bloom_containment"
            ),
            F.col("n_exact").cast("bigint").alias("n_exact_hits"),
            "ppl",
            F.when((F.col("n_exact") > 0) & F.col("flagged"), "confirmed")
            .when(F.col("n_exact") > 0, "overlap")
            .otherwise("screen_fp")
            .alias("verdict"),
        )
    )


_register(
    decontaminate_verdict_panel,
    f"""
WITH bloom AS (
{ORACLE["bloom_decontaminate_screen"].strip()}
), exact AS (
{ORACLE["text_decontaminate"].strip()}
), ppl AS (
{ORACLE["perplexity_decontaminate"].strip()}
)
SELECT bloom.doc_id, bloom.n_shingles, bloom.bloom_hits,
       bloom.bloom_containment,
       CAST(COALESCE(exact.n_contaminated_shingles, 0) AS BIGINT)
         AS n_exact_hits,
       ppl.ppl,
       CASE WHEN exact.n_contaminated_shingles IS NOT NULL AND ppl.flagged
              THEN 'confirmed'
            WHEN exact.n_contaminated_shingles IS NOT NULL THEN 'overlap'
            ELSE 'screen_fp' END AS verdict
FROM bloom
LEFT JOIN exact ON bloom.doc_id = exact.doc_id
LEFT JOIN ppl ON bloom.doc_id = ppl.doc_id
""",
)


# ---------------------------------------------------------------------------
# Contamination overlap RUNS (round 11, sixth debut) — the positional
# depth metric the count-based screens lack: text_decontaminate counts
# HOW MANY shingles a candidate shares with the benchmark, but a
# 13-gram-style decontamination policy (GPT-3 appendix C; Brown et al.
# 2020) keys on the LONGEST CONSECUTIVE overlap — 40 scattered
# formulaic shingles are noise, one unbroken 40-shingle run is a
# verbatim benchmark passage. Per exact-screen candidate: the number
# of marked shingle positions, the number of maximal consecutive runs
# (gaps-and-islands), the longest run in shingles, and that run's
# token span (run + 2 for word 3-shingles — the contiguous verbatim
# token count a redaction pass would cut).
#
# Mechanics: the shingle stream keeps its POSITION (posexplode of the
# _shingled array); candidate positions are marked by a broadcast
# LEFT SEMI join against the benchmark's distinct shingle set; runs
# are the classic islands grouping key pos − ROW_NUMBER() inside each
# doc. Determinism: pure integer arithmetic.
#
# Plan / 100 TB: the posexplode is corpus-token-linear (the screen
# family's irreducible scan); the benchmark set broadcasts
# (eval-suite-sized); the islands windows are partitioned BY DOC over
# only the MARKED positions (candidates' overlap shingles — orders of
# magnitude below corpus scale), never a global window.
# ---------------------------------------------------------------------------
def decontaminate_overlap_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persisted for the same reason as text_decontaminate's frame (two
    # consumers: the benchmark branch and the positional explode;
    # uncached, the explode-implied predicates inline the shingle
    # transform per row — measured 5.45 s → ~1 s at sf0.1)
    from pyspark import StorageLevel

    sh = _shingled(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    bench = (
        sh.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select(F.explode(F.array_distinct("shingles")).alias("s"))
        .distinct()
    )
    pos = sh.filter(F.col("doc_id") % _DECON_MOD != 0).select(
        "doc_id", F.posexplode("shingles").alias("pos", "s")
    )
    marked = pos.join(F.broadcast(bench), "s", "left_semi")
    grp = (
        F.col("pos")
        - F.row_number().over(
            W.partitionBy("doc_id").orderBy("pos")
        )
    ).alias("grp")
    runs = (
        marked.select("doc_id", "pos", grp)
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("doc_id").agg(
        F.sum("run_len").cast("bigint").alias("n_marked_shingles"),
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("run_len").cast("bigint").alias("longest_run"),
        (F.max("run_len") + 2).cast("bigint").alias("longest_run_tokens"),
    )


_register(
    decontaminate_overlap_runs,
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), shingled AS (
  SELECT doc_id,
         list_transform(range(0, len(t) - 2),
                        i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]) AS shingles
  FROM toks
), bench AS (
  SELECT DISTINCT UNNEST(list_distinct(shingles)) AS s
  FROM shingled WHERE doc_id % {_DECON_MOD} = 0
), pos AS (
  SELECT doc_id, u.p.pos AS pos, u.p.s AS s
  FROM (SELECT doc_id,
               unnest(list_transform(range(0, len(shingles)),
                      i -> {{'pos': i, 's': shingles[i + 1]}})) AS p
        FROM shingled WHERE doc_id % {_DECON_MOD} <> 0) u
), marked AS (
  SELECT doc_id, pos FROM pos WHERE s IN (SELECT s FROM bench)
), runs AS (
  SELECT doc_id, grp, COUNT(*) AS run_len
  FROM (SELECT doc_id,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                 AS grp
        FROM marked)
  GROUP BY doc_id, grp
)
SELECT doc_id,
       CAST(SUM(run_len) AS BIGINT) AS n_marked_shingles,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(run_len) AS BIGINT) AS longest_run,
       CAST(MAX(run_len) + 2 AS BIGINT) AS longest_run_tokens
FROM runs
GROUP BY doc_id
""",
)


# ---------------------------------------------------------------------------
# Winnowing fingerprint panel (round 11) — the Schleimer/Wilkerson/Aiken
# SIGMOD'03 local document fingerprinting algorithm (the MOSS detector):
# k-gram rolling hashes (the exact token-code + polynomial discipline of
# text_rolling_hash above), then from every window of WINNOW_W
# consecutive k-gram hashes select the minimum — RIGHTMOST position on
# ties, the paper's robust-winnowing rule — and keep the distinct
# selected positions as the document's fingerprints. The guarantee the
# panel audits: any shared substring of length >= WINNOW_K + WINNOW_W - 1
# tokens is caught by at least one shared fingerprint, at an expected
# density of 2/(WINNOW_W + 1) — the order-of-magnitude sketch that makes
# corpus-scale plagiarism/duplication detection affordable where full
# rolling-hash indexing is not. Per doc: k-gram count, selected
# fingerprint count, density (vs the 2/(w+1) bound), distinct
# fingerprint hashes, and how many of those hashes appear in >= 2
# documents (the dup-detection signal).
#
# Plan / 100 TB: selection is pure row-local array math (nested
# higher-order transforms, zero shuffles); the sharing pass explodes
# only the SELECTED fingerprints (~2/(w+1) of the k-grams), aggregates
# on the hash key (cardinality bounded by the _RH_P modulus, 1e6), and
# the hash->doc_freq table rides back as one hash join on the same key.
# Docs shorter than WINNOW_K + WINNOW_W - 1 tokens have no full window
# and are excluded in BOTH engines (stated contract).
# ---------------------------------------------------------------------------
WINNOW_K = 4  # tokens per k-gram (the text_rolling_hash window)
WINNOW_W = 4  # k-gram hashes per winnowing window; density bound 2/(w+1)


def winnowing_fingerprint_panel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    codes_expr = _token_codes_expr()

    # rightmost argmin per window j (0-based window start): the largest
    # i in [j, j+W) whose hash equals the window minimum
    def rightmost_min(hs: Column, j: Column) -> Column:
        m = F.array_min(F.slice(hs, j + 1, WINNOW_W))
        return F.array_max(
            F.transform(
                F.sequence(j, j + WINNOW_W - 1),
                lambda i: F.when(F.get(hs, i) == m, i).otherwise(F.lit(-1)),
            )
        )

    # codes, hs and sp are LET-BOUND via the single-element-transform
    # idiom (_phash_bands_expr's trick): each is an O(n_tokens)
    # expression referenced O(n) times downstream, and CollapseProject
    # would otherwise inline the md5-chain into every window reference
    # — the same multiplicative re-evaluation that cost pHash 230 s
    # (measured here: the unbound form never finished 500 docs; this
    # form is sub-second).
    res = F.element_at(
        F.transform(
            F.array(codes_expr),
            lambda codes: F.element_at(
                F.transform(
                    F.array(
                        F.transform(
                            F.sequence(
                                F.lit(0), F.size(codes) - WINNOW_K
                            ),
                            lambda i: _kgram_hash(codes, i, WINNOW_K),
                        )
                    ),
                    lambda hs: F.element_at(
                        F.transform(
                            F.array(
                                F.array_distinct(
                                    F.transform(
                                        F.sequence(
                                            F.lit(0),
                                            F.size(hs) - WINNOW_W,
                                        ),
                                        lambda j: rightmost_min(hs, j),
                                    )
                                )
                            ),
                            lambda sp: F.struct(
                                F.size(hs)
                                .cast("bigint")
                                .alias("n_kgrams"),
                                F.size(sp)
                                .cast("bigint")
                                .alias("n_fingerprints"),
                                F.array_distinct(
                                    F.transform(
                                        sp, lambda p: F.get(hs, p)
                                    )
                                ).alias("fph"),
                            ),
                        ),
                        1,
                    ),
                ),
                1,
            ),
        ),
        1,
    )
    from pyspark import StorageLevel

    # persisted: the frame feeds BOTH the sharing explode and the final
    # join — without it the whole selection expression runs twice (the
    # text_decontaminate discipline)
    per_doc = (
        docs.filter(
            F.size(F.split("text", " ")) >= WINNOW_K + WINNOW_W - 1
        )
        .select("doc_id", res.alias("w"))
        .select(
            "doc_id",
            F.col("w.n_kgrams").alias("n_kgrams"),
            F.col("w.n_fingerprints").alias("n_fingerprints"),
            F.col("w.fph").alias("fph"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ex = per_doc.select("doc_id", F.explode("fph").alias("h"))
    freq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
    shared = (
        ex.join(freq.filter(F.col("nd") >= 2), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fp"))
    )
    return (
        per_doc.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            "n_kgrams",
            "n_fingerprints",
            (F.col("n_fingerprints") / F.col("n_kgrams")).alias("density"),
            F.size("fph").cast("bigint").alias("n_fp_hashes"),
            F.coalesce("n_shared_fp", F.lit(0)).alias("n_shared_fp"),
        )
    )


_winnow_poly = _poly_terms_sql(WINNOW_K)

_register(
    winnowing_fingerprint_panel,
    f"""
WITH coded AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % {_RH_P}) AS c
  FROM documents
), hashed AS (
  SELECT doc_id,
         list_transform(range(0, len(c) - {WINNOW_K - 1}),
                        i -> ({_winnow_poly}) % {_RH_P}) AS hs
  FROM coded
  WHERE len(c) >= {WINNOW_K + WINNOW_W - 1}
), sel AS (
  SELECT doc_id, hs,
         list_distinct(list_transform(
           range(0, len(hs) - {WINNOW_W - 1}),
           j -> list_max(list_transform(
                  range(j, j + {WINNOW_W}),
                  i -> CASE WHEN hs[i + 1] = list_min(list_slice(hs, j + 1, j + {WINNOW_W}))
                       THEN i ELSE -1 END)))) AS sp
  FROM hashed
), per_doc AS (
  SELECT doc_id,
         CAST(len(hs) AS BIGINT) AS n_kgrams,
         sp,
         list_distinct(list_transform(sp, p -> hs[p + 1])) AS fph
  FROM sel
), ex AS (
  SELECT doc_id, unnest(fph) AS h FROM per_doc
), freq AS (
  SELECT h, COUNT(*) AS nd FROM ex GROUP BY h
), shared AS (
  SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_fp
  FROM ex e JOIN freq f ON e.h = f.h
  WHERE f.nd >= 2
  GROUP BY e.doc_id
)
SELECT p.doc_id, p.n_kgrams,
       CAST(len(p.sp) AS BIGINT) AS n_fingerprints,
       len(p.sp) * 1.0 / p.n_kgrams AS density,
       CAST(len(p.fph) AS BIGINT) AS n_fp_hashes,
       COALESCE(s.n_shared_fp, 0) AS n_shared_fp
FROM per_doc p LEFT JOIN shared s ON p.doc_id = s.doc_id
""",
)


# ---------------------------------------------------------------------------
# Dedup impact panel (round 11) — what the near-dup pass REMOVED, by
# (source, lang): the release-audit table a curation run publishes next
# to its datasheet ("dedup cut src3/en by 9%") and the number
# mixture-weight decisions are re-checked against after dedup shifts
# the per-source token mass. Composed from the registered pipeline's
# own keep-set — dedup_cluster_representatives' is_representative flag
# (LSH candidates -> exact-Jaccard verify -> connected components ->
# min-doc_id representative) — joined back to the corpus and rolled up.
#
# Plan / 100 TB: the cluster pass's cost is the LSH family's (bucketed,
# never all-pairs; the CC iterates only over verified pairs); the panel
# adds ONE doc_id hash join and a tiny-cardinality (source, lang)
# aggregate. Fractions are exact ratios of counts, identical in both
# engines.
# ---------------------------------------------------------------------------
def dedup_impact_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    reps = dedup_cluster_representatives(spark, sf_dir).select(
        "doc_id", "is_representative"
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    removed = (~F.col("is_representative")).cast("int")
    return (
        docs.join(reps, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(removed).cast("bigint").alias("n_removed"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(F.col("n_tok") * removed)
            .cast("bigint")
            .alias("tokens_removed"),
            (F.sum(removed) / F.count(F.lit(1))).alias("removed_doc_frac"),
            (F.sum(F.col("n_tok") * removed) / F.sum("n_tok")).alias(
                "removed_token_frac"
            ),
        )
    )


_register(
    dedup_impact_panel,
    # keep-set closure = the shared _CC_KEEPSET_SQL fragment (the
    # dedup_cluster_representatives rule the Spark side composes)
    f"""
WITH RECURSIVE verified AS (
{_verified_sql}
),
{_CC_KEEPSET_SQL},
flagged AS (
  SELECT d.doc_id, d.source, d.lang,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
         CASE WHEN COALESCE(cc.comp, d.doc_id) = d.doc_id
              THEN 0 ELSE 1 END AS removed
  FROM documents d
  LEFT JOIN cc ON d.doc_id = cc.vertex
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(removed) AS BIGINT) AS n_removed,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_tok * removed) AS BIGINT) AS tokens_removed,
       SUM(removed) * 1.0 / COUNT(*) AS removed_doc_frac,
       SUM(n_tok * removed) * 1.0 / SUM(n_tok) AS removed_token_frac
FROM flagged
GROUP BY source, lang
""",
)


# ---------------------------------------------------------------------------
# Streaming near-dup ingest gate (round 12) — the stage a 100 TB crawl
# actually runs: stream_dedup_events (behavior.py) replays EXACT
# event_id duplicates; this is its NEAR-DUP analog over documents,
# the incremental MinHash-LSH admission decision made at ingest time.
# Policy: first-writer-wins on LSH band buckets — state is
# band_key -> min doc_id over ALL arrivals (admitted or not, so a
# third copy matching the second-but-not-first is still caught), and
# a document is ADMITTED iff it owns the minimum on EVERY one of its
# _BANDS band keys; otherwise it is evicted by the earliest colliding
# document. Because the state update is a monotone MIN, the verdict
# set is independent of arrival order — the streaming leg
# (streaming/neardup.py: applyInPandasWithState keyed on the band
# bucket) converges to exactly this batch twin's answer under replay,
# reordering, and kill-restart, which is what the tests pin (the
# stream_dedup_events discipline; reference contract: keyed
# ValueState dedup on a KeyedStream, FT/flink-streaming-java
# KeyedStream.java + state TTL).
#
# Docs too short to shingle (< 3 tokens) have no bands and are
# admitted trivially.
#
# Plan / 100 TB: ONE pass over the signature pipeline (the bucket
# collect_list formulation of dedup_minhash_lsh — a bands-to-buckets
# self-join would run the md5 chain twice), one shuffle on the band
# key, one on doc_id, then a broadcast-able left join back to the
# corpus row set. State size in the streaming leg is one (band_key,
# min_id) pair per DISTINCT band bucket — corpus-sublinear, and
# TTL-able by watermark exactly like the event dedup's.
# ---------------------------------------------------------------------------
def stream_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the admission rule itself lives in streaming/neardup.py
    # (fold_verdicts) — ONE home shared with the streaming drain fold,
    # the `_lsh_bands` discipline; lazy import mirrors that module's
    # function-level imports of the signature pipeline
    from ..streaming.neardup import fold_verdicts

    sig = _mh_sig_frame(spark, sf_dir)
    bands = _lsh_bands(sig)
    buckets = bands.groupBy("band_id", "band_key").agg(
        F.collect_list("doc_id").alias("ids")
    )
    ex = buckets.select(
        F.array_min("ids").alias("first_doc"),
        F.explode("ids").alias("doc_id"),
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return fold_verdicts(ex, docs)


_register(
    stream_neardup_ingest,
    f"""
{_LSH_BANDS_CTE},
buckets AS (
  SELECT band_id, band_key, MIN(doc_id) AS first_doc
  FROM bands GROUP BY band_id, band_key
),
coll AS (
  SELECT b.doc_id,
         MIN(CASE WHEN k.first_doc < b.doc_id THEN k.first_doc END)
           AS evicted_by,
         CAST(SUM(CASE WHEN k.first_doc < b.doc_id THEN 1 ELSE 0 END)
              AS INTEGER) AS n_stale_bands
  FROM bands b
  JOIN buckets k ON b.band_id = k.band_id AND b.band_key = k.band_key
  GROUP BY b.doc_id
)
SELECT d.doc_id, d.source,
       c.evicted_by IS NULL AS admitted,
       c.evicted_by,
       COALESCE(c.n_stale_bands, 0) AS n_stale_bands
FROM documents d LEFT JOIN coll c ON d.doc_id = c.doc_id
""",
)


# ---------------------------------------------------------------------------
# Exact-substring duplication family (round 12) — the token-granular
# suffix-array-method accounting of Lee et al. 2022 ("Deduplicating
# Training Data Makes Language Models Better", ExactSubstr), composed
# from grouped shared k-gram fingerprints + position-anchored run
# extension — NEVER a suffix array over the corpus (the paper builds
# one; at 100 TB the equivalent signal is exactly this: corpus-linear
# k-gram explosion, one hash-keyed aggregate, per-doc islands windows).
#
# Shared base: _exsub_occ emits (doc_id, pos, h) for every EXSUB_K-token
# k-gram (md5 of the space-joined window — 128-bit, so cross-doc
# equality is exact in practice, unlike the 1e6-modulus rolling hashes
# the winnowing sketch uses for RELATIVE density). A maximal run of L
# consecutive positions whose k-gram recurs corpus-wide is a shared
# token span of L + EXSUB_K - 1 tokens; spans >= EXSUB_MIN_TOKENS are
# the family's match unit (the paper's 50-token rule, scaled to the
# fixture's ~56-token docs).
#
# The occ frame is persisted (MEMORY_AND_DISK): three registered
# consumers (spans / removal / exposure) share it within a session via
# CacheManager plan-dedup — the _corpus_count memo discipline, with the
# cold cost visible in first-execution spreads (SCALE.md row).
# ---------------------------------------------------------------------------
EXSUB_K = 8  # tokens per k-gram fingerprint
EXSUB_MIN_TOKENS = 20  # minimum shared-span length that counts as a match
#: lexicographic (doc_id, pos) encoded as one BIGINT for the keep-first
#: rule; pos < 1e6 holds for any realistic document (fixture max ~1e2).
#: At doc_id > 9.2e12 the product would overflow int64 — a 100 TB
#: deploy re-keys on a struct/int128 ordinal instead.
_EXSUB_ORD = 1_000_000


def _exsub_occ(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, h): one row per k-gram position; pos is int32
    (posexplode's native width — the oracle casts to match)."""
    from pyspark import StorageLevel

    docs = load(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= EXSUB_K
    )
    hs = F.transform(
        F.sequence(F.lit(0), F.size("toks") - EXSUB_K),
        lambda i: F.md5(
            F.array_join(F.slice("toks", i + 1, F.lit(EXSUB_K)), " ")
        ),
    )
    return d.select("doc_id", F.posexplode(hs).alias("pos", "h")).persist(
        StorageLevel.MEMORY_AND_DISK
    )


#: the shared occ CTE (DuckDB twin of _exsub_occ)
_EXSUB_OCC_CTE = f"""occ AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         md5(array_to_string(t[i + 1 : i + {EXSUB_K}], ' ')) AS h
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= {EXSUB_K}),
       UNNEST(range(0, len(t) - {EXSUB_K - 1})) AS u(i)
)"""


def exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detection leg: every maximal duplicated token span >=
    EXSUB_MIN_TOKENS, per doc — (doc_id, span_id, start_tok,
    span_tokens). Duplication is corpus-wide recurrence of the k-gram
    (same-doc repeats included, exactly as a suffix array would see
    them)."""
    occ = _exsub_occ(spark, sf_dir)
    freq = occ.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    marked = (
        occ.join(freq, "h")
        .filter(F.col("c") >= 2)
        .select("doc_id", "pos")
    )
    grp = (
        F.col("pos")
        - F.row_number().over(W.partitionBy("doc_id").orderBy("pos"))
    ).alias("grp")
    runs = (
        marked.select("doc_id", "pos", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.count(F.lit(1)) + F.lit(EXSUB_K - 1))
            .cast("int")
            .alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= EXSUB_MIN_TOKENS)
    )
    return runs.select(
        "doc_id",
        F.row_number()
        .over(W.partitionBy("doc_id").orderBy("start_tok"))
        .cast("int")
        .alias("span_id"),
        F.col("start_tok").cast("int").alias("start_tok"),
        "span_tokens",
    )


_register(
    exact_substring_spans,
    f"""
WITH {_EXSUB_OCC_CTE},
freq AS (SELECT h, COUNT(*) AS c FROM occ GROUP BY h),
marked AS (
  SELECT o.doc_id, o.pos FROM occ o JOIN freq f ON o.h = f.h WHERE f.c >= 2
),
runs AS (
  SELECT doc_id, grp,
         CAST(MIN(pos) AS INTEGER) AS start_tok,
         CAST(COUNT(*) + {EXSUB_K - 1} AS INTEGER) AS span_tokens
  FROM (SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                 AS grp
        FROM marked)
  GROUP BY doc_id, grp
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_tok)
            AS INTEGER) AS span_id,
       start_tok, span_tokens
FROM runs WHERE span_tokens >= {EXSUB_MIN_TOKENS}
""",
)


def exact_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal leg (keep-first): a position is removal-marked iff its
    k-gram has a strictly earlier occurrence in (doc_id, pos) order —
    the paper's keep-one-occurrence rule with the deterministic
    earliest-copy canonical. Qualifying runs (span >= EXSUB_MIN_TOKENS)
    become token intervals [start, start + span - 1]; overlapping
    intervals are MERGED (two qualifying runs < EXSUB_K - 1 positions
    apart share covered tokens) so tokens_removed is the exact union
    length, never double-counted. All windows are partitioned by doc.
    Emits per-doc accounting over the WHOLE corpus (docs with nothing
    removed included)."""
    occ = _exsub_occ(spark, sf_dir)
    ordc = F.col("doc_id") * _EXSUB_ORD + F.col("pos")
    firsts = occ.groupBy("h").agg(
        F.min(F.col("doc_id") * _EXSUB_ORD + F.col("pos")).alias("first_ord")
    )
    marked = (
        occ.join(firsts, "h")
        .filter(ordc > F.col("first_ord"))
        .select("doc_id", "pos")
    )
    grp = (
        F.col("pos")
        - F.row_number().over(W.partitionBy("doc_id").orderBy("pos"))
    ).alias("grp")
    runs = (
        marked.select("doc_id", "pos", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("s"),
            (F.min("pos") + F.count(F.lit(1)) + F.lit(EXSUB_K - 2)).alias(
                "e"
            ),
            (F.count(F.lit(1)) + F.lit(EXSUB_K - 1)).alias("span"),
        )
        .filter(F.col("span") >= EXSUB_MIN_TOKENS)
    )
    wo = W.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(
        wo.rowsBetween(W.unboundedPreceding, -1)
    )
    merged = (
        runs.withColumn(
            "new_iv",
            (F.col("s") > F.coalesce(prev_max_e, F.lit(-1))).cast("int"),
        )
        .withColumn(
            "iv", F.sum("new_iv").over(wo.rowsBetween(W.unboundedPreceding, 0))
        )
        .groupBy("doc_id", "iv")
        .agg((F.max("e") - F.min("s") + 1).alias("tok"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans_removed"),
            F.sum("tok").cast("bigint").alias("tokens_removed"),
        )
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    return docs.join(merged, "doc_id", "left").select(
        "doc_id",
        "source",
        "n_tok",
        F.coalesce("n_spans_removed", F.lit(0)).cast("bigint").alias(
            "n_spans_removed"
        ),
        F.coalesce("tokens_removed", F.lit(0)).cast("bigint").alias(
            "tokens_removed"
        ),
        (F.coalesce("tokens_removed", F.lit(0)) / F.col("n_tok")).alias(
            "frac_removed"
        ),
    )


_register(
    exact_substring_removal,
    f"""
WITH {_EXSUB_OCC_CTE},
firsts AS (
  SELECT h, MIN(doc_id * {_EXSUB_ORD} + pos) AS first_ord FROM occ GROUP BY h
),
marked AS (
  SELECT o.doc_id, o.pos FROM occ o JOIN firsts f ON o.h = f.h
  WHERE o.doc_id * {_EXSUB_ORD} + o.pos > f.first_ord
),
runs AS (
  SELECT doc_id, grp, MIN(pos) AS s,
         MIN(pos) + COUNT(*) + {EXSUB_K - 2} AS e,
         COUNT(*) + {EXSUB_K - 1} AS span
  FROM (SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                 AS grp
        FROM marked)
  GROUP BY doc_id, grp
),
q AS (SELECT doc_id, s, e FROM runs WHERE span >= {EXSUB_MIN_TOKENS}),
iv0 AS (
  SELECT doc_id, s, e,
         MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pm
  FROM q
),
iv AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN s > COALESCE(pm, -1) THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING)
           AS grp
  FROM iv0
),
per_iv AS (
  SELECT doc_id, grp, MAX(e) - MIN(s) + 1 AS tok FROM iv GROUP BY doc_id, grp
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans_removed,
         CAST(SUM(tok) AS BIGINT) AS tokens_removed
  FROM per_iv GROUP BY doc_id
)
SELECT d.doc_id, d.source,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
       COALESCE(p.n_spans_removed, 0) AS n_spans_removed,
       COALESCE(p.tokens_removed, 0) AS tokens_removed,
       COALESCE(p.tokens_removed, 0) * 1.0
         / len(string_split(d.text, ' ')) AS frac_removed
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
""",
)


def dup_ngram_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The family's headline statistic (the paper reports it as "% of
    tokens in duplicated 50-grams"): per source, the fraction of k-gram
    positions whose fingerprint recurs corpus-wide, plus how many docs
    carry any duplication at all. One hash-keyed aggregate + one
    source-keyed rollup over the shared occ frame."""
    occ = _exsub_occ(spark, sf_dir)
    freq = occ.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (
        occ.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum((F.col("c") >= 2).cast("int")).alias("n_dup"),
        )
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    j = docs.join(per_doc, "doc_id", "left")
    n_pos = F.sum(F.coalesce("n_pos", F.lit(0)))
    n_dup = F.sum(F.coalesce("n_dup", F.lit(0)))
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.coalesce("n_dup", F.lit(0)) > 0).cast("int"))
        .cast("bigint")
        .alias("n_docs_with_dup"),
        n_pos.cast("bigint").alias("n_positions"),
        n_dup.cast("bigint").alias("n_dup_positions"),
        F.when(n_pos == 0, F.lit(0.0))
        .otherwise(n_dup / n_pos)
        .alias("dup_position_frac"),
    )


_register(
    dup_ngram_exposure,
    f"""
WITH {_EXSUB_OCC_CTE},
freq AS (SELECT h, COUNT(*) AS c FROM occ GROUP BY h),
per_doc AS (
  SELECT o.doc_id, COUNT(*) AS n_pos,
         SUM(CASE WHEN f.c >= 2 THEN 1 ELSE 0 END) AS n_dup
  FROM occ o JOIN freq f ON o.h = f.h
  GROUP BY o.doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN COALESCE(p.n_dup, 0) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_with_dup,
       CAST(SUM(COALESCE(p.n_pos, 0)) AS BIGINT) AS n_positions,
       CAST(SUM(COALESCE(p.n_dup, 0)) AS BIGINT) AS n_dup_positions,
       CASE WHEN SUM(COALESCE(p.n_pos, 0)) = 0 THEN 0.0
            ELSE SUM(COALESCE(p.n_dup, 0)) * 1.0
                 / SUM(COALESCE(p.n_pos, 0)) END AS dup_position_frac
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
GROUP BY d.source
""",
)
