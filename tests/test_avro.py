"""Avro format gate (reference FT/flink-formats/flink-avro/): when the
spark-avro module is present the round trip must be full-fidelity; when
absent the degradation must be the typed error with the deploy remedy.
Exactly one branch runs per environment — both are pinned."""

from __future__ import annotations

import pytest

from flink_tornadovm_artifact_spark.sources.avro_fmt import (
    AvroUnavailableError,
    avro_available,
    read_avro,
    write_avro,
)


def _fixture_df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5, ["x", "y"]), (2, "b", 2.5, [])],
        "id long, s string, d double, tags array<string>",
    )


def test_avro_round_trip_or_pinned_degradation(spark, tmp_path):
    df = _fixture_df(spark)
    path = str(tmp_path / "avro_out")
    if avro_available(spark):
        write_avro(df, path)
        got = read_avro(spark, path)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, df.collect())
        )
        assert got.schema == df.schema
    else:
        with pytest.raises(AvroUnavailableError) as ei:
            write_avro(df, path)
        assert "spark-avro" in str(ei.value)
        with pytest.raises(AvroUnavailableError):
            read_avro(spark, path)


def test_avro_probe_is_consistent(spark):
    """The probe is deterministic per session and agrees with the raw
    datasource resolution error (guards against the probe reporting
    available while the real write would throw)."""
    avail = avro_available(spark)
    df = _fixture_df(spark)
    try:
        df.write.format("avro").mode("overwrite").save("/tmp/avro_probe_raw")
        raw_ok = True
    except Exception as e:  # noqa: BLE001
        raw_ok = "Failed to find data source" not in str(e)
    assert avail == raw_ok
