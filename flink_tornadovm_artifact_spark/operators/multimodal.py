"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels (SURVEY.md §7 M5 — beyond the reference surface, built on the
same accelerated-map machinery as the numeric kernels).

Design for 100 TB:

- blobs stay opaque ``binary`` columns end-to-end; Spark never parses
  them JVM-side, and the parquet scan prunes them unless requested;
- metadata (modality, byte size, container magic) is extracted with
  JVM expressions so filters on it push down BEFORE any Python decode;
- decode / feature-extract / resize / frame-sample run per Arrow batch
  in ``mapInPandas`` — batch size bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
  bounded regardless of blob sizes;
- partition discipline: decode preserves the input partitioning (no
  shuffle); frame-sampling fans out rows 1→N inside the batch kernel,
  never via a join.

The image/audio codec libraries are NOT present in this container, so the
decode step is STUBBED: ``codec='fake'`` (default) derives deterministic
pseudo-decoded features from the bytes themselves (md5-seeded), keeping
every Spark-side contract — schema, UDF signature, batch shape,
partitioning — real and testable. ``codec='real'`` raises
``NotImplementedError`` unless PIL/soundfile are importable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: magic-byte prefixes → modality tag (JVM-side expression dispatch)
_MAGIC = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "52494646": "audio/wav",  # RIFF
    "494433": "audio/mp3",  # ID3
    "0000001866747970": "video/mp4",  # ....ftyp
    "1A45DFA3": "video/webm",
}


def modality(content: Column | str) -> Column:
    """Classify a binary column by container magic bytes — pure JVM
    expression, so modality filters prune before any Python decode."""
    c = F.col(content) if isinstance(content, str) else content
    head = F.upper(F.hex(F.substring(c, 1, 8)))
    expr = F.lit("application/octet-stream")
    for magic, tag in sorted(_MAGIC.items(), key=lambda kv: len(kv[0])):
        expr = F.when(head.startswith(magic), F.lit(tag)).otherwise(expr)
    return expr


def with_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach the typed metadata struct for a blob column:
    (n_bytes, modality, digest) — all JVM expressions, no UDF."""
    c = F.col(content_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.length(c).cast("bigint").alias("n_bytes"),
            modality(c).alias("modality"),
            F.md5(c).alias("digest"),
        ),
    )


def _fake_decode(blob: bytes, n_feats: int = 8) -> tuple[int, int, np.ndarray]:
    """Deterministic pseudo-decode: md5-seeded (width, height, features).
    Stands in for a real codec; stable across partitionings/engines."""
    h = hashlib.md5(blob if blob is not None else b"").digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feats = (
        np.frombuffer(h[: n_feats * 2], dtype=np.uint16).astype(np.float64)
        / 65535.0
    )
    return width, height, feats


def _require_real_codec(kind: str):
    try:
        if kind == "image":
            import PIL.Image  # noqa: F401
            return
        if kind == "audio":
            import soundfile  # noqa: F401
            return
    except ImportError:
        pass
    raise NotImplementedError(
        f"real {kind} decode needs the codec libraries (not in this "
        "container); use codec='fake' for the deterministic stub"
    )


def decode_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "id",
    n_feats: int = 8,
    codec: str = "fake",
) -> DataFrame:
    """Decode + feature-extract per image blob → (id, width, height,
    features array<double>). Arrow-batched; one output row per input row,
    partitioning preserved."""
    if codec != "fake":
        _require_real_codec("image")

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            decoded = [_fake_decode(b, n_feats) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2].tolist() for d in decoded],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel, f"{id_col} long, width int, height int, features array<double>"
    )


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    content_col: str = "content",
    id_col: str = "id",
    codec: str = "fake",
) -> DataFrame:
    """Resize each image blob → (id, content binary, width, height). The
    fake codec re-digests the bytes with the target shape so the output
    is deterministic and shape-checkable."""
    if codec != "fake":
        _require_real_codec("image")

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"#resize{target_w}x{target_h}".encode()
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            out = [
                hashlib.md5((b or b"") + tag).digest()
                for b in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    content_col: out,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel, f"{id_col} long, {content_col} binary, width int, height int"
    )


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 4,
    content_col: str = "content",
    id_col: str = "id",
    codec: str = "fake",
) -> DataFrame:
    """Frame-sample each video blob → 1→N rows (id, frame_idx,
    frame binary). Fan-out happens inside the batch kernel — no join, no
    shuffle; downstream repartition only if frame-level balance matters."""
    if codec != "fake":
        _require_real_codec("image")

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                blob = b or b""
                # fake frame count derived from byte length
                n = min(max_frames, 1 + len(blob) // max(every_n, 1))
                for k in range(n):
                    ids.append(i)
                    idxs.append(k * every_n)
                    frames.append(
                        hashlib.md5(blob + f"#frame{k * every_n}".encode()).digest()
                    )
            if ids:
                yield pd.DataFrame(
                    {id_col: ids, "frame_idx": idxs, "frame": frames}
                )

    return df.select(id_col, content_col).mapInPandas(
        kernel, f"{id_col} long, frame_idx int, frame binary"
    )


def audio_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "id",
    codec: str = "fake",
) -> DataFrame:
    """Per-blob audio features → (id, duration_s, rms). Fake codec derives
    both deterministically from the digest."""
    if codec != "fake":
        _require_real_codec("audio")

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            h = [hashlib.md5(b or b"").digest() for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "duration_s": [1.0 + d[2] / 16.0 for d in h],
                    "rms": [d[3] / 255.0 for d in h],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel, f"{id_col} long, duration_s double, rms double"
    )
