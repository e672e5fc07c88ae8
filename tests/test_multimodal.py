"""Multimodal operator tests: the Spark-side plumbing (schema, batch
shape, fan-out, partition preservation) is real; the codec is the
deterministic fake — its outputs are pinned against the same math
computed driver-side (the reference's dual-mode comparison idea)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.operators.multimodal import (
    _fake_decode,
    audio_features,
    decode_image_features,
    modality,
    resize_images,
    sample_video_frames,
    with_metadata,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"x" * 40
JPG = b"\xff\xd8\xff\xe0" + b"y" * 30
WAV = b"RIFF" + b"z" * 20
RAW = b"\x00\x01\x02\x03 not a container"


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [(1, PNG), (2, JPG), (3, WAV), (4, RAW)]
    return spark.createDataFrame(rows, "id long, content binary")


def test_modality_magic_dispatch(spark, blobs):
    got = dict(
        blobs.select("id", modality("content").alias("m")).collect()
    )
    assert got == {
        1: "image/png",
        2: "image/jpeg",
        3: "audio/wav",
        4: "application/octet-stream",
    }


def test_with_metadata_struct(spark, blobs):
    row = (
        with_metadata(blobs, "content")
        .filter(F.col("id") == 1)
        .select("meta.n_bytes", "meta.modality", "meta.digest")
        .collect()[0]
    )
    assert row["n_bytes"] == len(PNG)
    assert row["modality"] == "image/png"
    assert row["digest"] == hashlib.md5(PNG).hexdigest()


def test_decode_image_features_matches_driver_math(spark, blobs):
    out = {
        r["id"]: r
        for r in decode_image_features(blobs, id_col="id").collect()
    }
    assert set(out) == {1, 2, 3, 4}
    for blob, i in [(PNG, 1), (JPG, 2)]:
        w, h, feats = _fake_decode(blob)
        assert out[i]["width"] == w
        assert out[i]["height"] == h
        assert out[i]["features"] == pytest.approx(list(feats))


def test_resize_is_deterministic_and_shaped(spark, blobs):
    out = resize_images(blobs, 32, 24, id_col="id").collect()
    assert all(r["width"] == 32 and r["height"] == 24 for r in out)
    by_id = {r["id"]: bytes(r["content"]) for r in out}
    assert by_id[1] == hashlib.md5(PNG + b"#resize32x24").digest()


def test_sample_video_frames_fanout(spark, blobs):
    out = sample_video_frames(
        blobs, every_n=10, max_frames=4, id_col="id"
    ).collect()
    # PNG blob is 48 bytes → min(4, 1 + 48//10) = 4 frames
    png_frames = [r for r in out if r["id"] == 1]
    assert len(png_frames) == 4
    assert sorted(r["frame_idx"] for r in png_frames) == [0, 10, 20, 30]
    assert bytes(png_frames[0]["frame"]) == hashlib.md5(PNG + b"#frame0").digest()


def test_audio_features_schema(spark, blobs):
    out = audio_features(blobs, id_col="id")
    assert dict(out.dtypes) == {
        "id": "bigint",
        "duration_s": "double",
        "rms": "double",
    }
    rows = out.collect()
    assert len(rows) == 4 and all(r["duration_s"] >= 1.0 for r in rows)


def test_real_codec_gated(spark, blobs):
    with pytest.raises(NotImplementedError):
        decode_image_features(blobs, id_col="id", codec="real")


def test_decode_features_under_structured_streaming(spark, tmp_path, blobs):
    """A 100 TB multimodal ingest runs the SAME Arrow kernel inside a
    stream: mapInPandas composes with readStream unchanged (schema,
    batch shape, per-file micro-batches), so the batch-tested decode
    path is the streaming ingest path — no separate implementation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "mm_src"
    src.mkdir()
    for name, rows in (
        ("b0.parquet", [(1, PNG), (2, JPG)]),
        ("b1.parquet", [(3, WAV), (4, RAW)]),
    ):
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([r[0] for r in rows], pa.int64()),
                    "content": pa.array([r[1] for r in rows], pa.binary()),
                }
            ),
            str(src / name),
        )

    stream = (
        spark.readStream.schema("id long, content binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    feats = decode_image_features(stream)
    q = (
        feats.writeStream.format("memory")
        .queryName("mm_stream_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.id: (r.width, r.height, list(r.features))
        for r in spark.sql("SELECT * FROM mm_stream_out").collect()
    }
    want = {
        r.id: (r.width, r.height, list(r.features))
        for r in decode_image_features(blobs).collect()
    }
    assert got == want and len(got) == 4
