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
