"""TableFormat seam (boris_spark/engine/tableformat.py): the engine-facing
sink interface whose default impl is parquet deltas + JSON manifests and
whose methods map 1:1 onto Iceberg snapshots (module docstring table)."""

import os

import pytest

from boris_spark.engine.tableformat import (
    IcebergFormat, ParquetManifestFormat,
)


def test_write_read_delta_roundtrip(spark, tmp_path):
    tf = ParquetManifestFormat(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    tf.write_delta(df, "seen", 0)
    tf.write_delta(
        spark.createDataFrame([(3, "c")], "id long, v string"), "seen", 1
    )
    assert tf.delta_rows("seen", 0) == 2
    assert tf.delta_rows("seen", 1) == 1
    # full-sink read spans both deltas and carries the round column
    full = tf.read_sink("seen", "id long, v string")
    assert {(r["id"], r["round"]) for r in full.collect()} == {
        (1, 0), (2, 0), (3, 1),
    }
    # driver-side columnar read of one delta — no Spark job
    pdf = tf.read_delta_pandas("seen", 1, columns=["id"])
    assert list(pdf["id"]) == [3]


def test_read_sink_missing_returns_none(spark, tmp_path):
    tf = ParquetManifestFormat(spark, str(tmp_path))
    assert tf.read_sink("nope") is None


def test_adopt_delta(spark, tmp_path):
    tf = ParquetManifestFormat(spark, str(tmp_path))
    src = str(tmp_path / "staged")
    spark.createDataFrame([(7,)], "id long").write.parquet(src)
    assert tf.adopt_delta(src, "store", 3) is True
    assert not os.path.exists(src)  # renamed, not copied
    assert tf.delta_rows("store", 3) == 1
    # missing source dir = empty delta, reported as False
    assert tf.adopt_delta(str(tmp_path / "missing"), "store", 4) is False


def test_commit_and_resume_rounds(spark, tmp_path):
    tf = ParquetManifestFormat(spark, str(tmp_path))
    assert tf.committed_rounds() == []
    tf.commit_round(0, {"fetched": 5})
    tf.commit_round(2, {"fetched": 1})
    tf.commit_round(1, {"fetched": 3})
    assert tf.committed_rounds() == [0, 1, 2]


def test_iceberg_format_documents_its_requirements(spark):
    with pytest.raises(NotImplementedError, match="iceberg-spark-runtime"):
        IcebergFormat(spark, "cat", "ns")
