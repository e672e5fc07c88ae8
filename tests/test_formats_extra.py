"""Format-module evidence beyond parquet/csv/json/orc: the
``FT/flink-formats/flink-compress`` and ``flink-sequence-file`` modules
map to Spark-native codec options and the Hadoop SequenceFile RDD API —
pinned here with round trips so the SURVEY formats row is backed by
tests, not just a mapping claim."""

from __future__ import annotations

import glob


def test_compressed_text_roundtrip(spark, tmp_path):
    """flink-compress's role: write compressed bulk text output.
    Spark-native: the codec option on any text/csv sink; the reader
    decompresses transparently by extension."""
    out = str(tmp_path / "gz")
    df = spark.range(100).selectExpr("CAST(id AS STRING) AS value")
    df.write.option("compression", "gzip").text(out)
    assert glob.glob(out + "/*.txt.gz"), "expected gzip part files"
    back = spark.read.text(out)
    assert sorted(int(r.value) for r in back.collect()) == list(range(100))


def test_sequence_file_roundtrip(spark, tmp_path):
    """flink-sequence-file's role: Hadoop SequenceFile I/O. Spark-native
    via the pair-RDD API (saveAsSequenceFile / sequenceFile)."""
    out = str(tmp_path / "seq")
    sc = spark.sparkContext
    pairs = [(i, f"v{i}") for i in range(50)]
    sc.parallelize(pairs, 4).saveAsSequenceFile(out)
    back = sorted(sc.sequenceFile(out).collect())
    assert back == pairs
