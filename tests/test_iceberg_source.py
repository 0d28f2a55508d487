"""Iceberg source gating + the shared split-encode engine.

The sandbox has no iceberg-spark runtime jar, so the catalog paths must
fail with a clear, actionable error (not silently fall through), while
the shared ``encode_splits`` engine — which the Iceberg manifest path
feeds — is exercised directly with an explicit split list.
"""

import glob

import pytest

from orc_format_spark.sources import iceberg
from orc_format_spark.sources.parquet_scan import encode_splits, list_parquet_splits


def test_iceberg_gating(spark):
    if iceberg.iceberg_available(spark):  # pragma: no cover - jar present
        pytest.skip("iceberg runtime present; gating not exercisable")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        iceberg.read_tokens_table(spark, "demo.tokens")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        iceberg.list_iceberg_splits(spark, "demo.tokens")


def test_encode_splits_explicit_list(spark, tmp_path):
    from orc_format_spark import TOKENS_SCHEMA, decode_blobs, tokenize_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "toks")
    tokenize_documents(docs).repartition(4).write.parquet(src)
    splits = list_parquet_splits(src)
    assert len(splits) >= 4
    # hand the engine the manifest-shaped list (what the Iceberg path does)
    blobs = encode_splits(spark, splits)
    assert blobs.count() == len(splits)
    out = decode_blobs(blobs, TOKENS_SCHEMA)
    assert out.count() == docs.count()


def test_blob_sink_roundtrip(spark, tmp_path):
    """encode_splits(blob_sink=...): workers persist blobs themselves
    (atomic deterministic names), only lineage reaches the JVM, and
    decode_blob_files reproduces the table from the sink files."""
    import os

    from orc_format_spark import TOKENS_SCHEMA, decode_blob_files, tokenize_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "toks")
    tokenize_documents(docs).repartition(4).write.parquet(src)
    splits = list_parquet_splits(src)
    sink = str(tmp_path / "sink")
    blobs = encode_splits(spark, splits, blob_sink=sink)
    rows = blobs.collect()
    assert "blob_path" in blobs.columns and "blob" not in blobs.columns
    assert sorted(os.path.basename(r.blob_path) for r in rows) == sorted(
        f"split-{sid:08d}.ofs" for sid, _, _ in splits
    )
    assert not glob.glob(os.path.join(sink, "*.tmp.*"))  # atomic renames
    for r in rows:  # lineage byte counts match the persisted files
        assert os.path.getsize(r.blob_path) == r.output_bytes
    out = decode_blob_files(blobs, TOKENS_SCHEMA)
    assert out.count() == docs.count()
    # sink-written bytes identical to the ferry route's blobs
    ferry = {r.group_id: r.blob for r in encode_splits(spark, splits).collect()}
    for r in rows:
        with open(r.blob_path, "rb") as f:
            assert f.read() == ferry[r.group_id]


def test_verify_blob_files(spark, tmp_path):
    from orc_format_spark import tokenize_documents, verify_blob_files

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "toks")
    tokenize_documents(docs).repartition(2).write.parquet(src)
    lineage = encode_splits(
        spark, list_parquet_splits(src), blob_sink=str(tmp_path / "sink")
    ).collect()
    # materialized lineage: re-verification must NOT re-run the encode
    # (a lazy plan would rewrite the sink and mask corruption)
    blobs = spark.createDataFrame(lineage)
    ver = verify_blob_files(blobs)
    rows = ver.collect()
    assert len(rows) >= 2 and all(r.ok for r in rows)
    # corrupt one blob file -> its checksum must fail loudly, not silently
    victim = lineage[0].blob_path
    raw = bytearray(open(victim, "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(raw))
    import pyspark.errors

    try:
        bad = verify_blob_files(blobs).collect()
        assert not all(r.ok for r in bad)
    except pyspark.errors.PySparkException:
        pass  # a corrupted stream may also fail decode outright — acceptable
