"""Structured Streaming encode: micro-batch blobs must decode to the same
rows the batch path produces (stream/batch parity), with exactly-once via
the streaming checkpoint."""

import pytest

from orc_format_spark import (
    TOKENS_SCHEMA,
    decode_blobs,
    tokenize_documents,
)
from orc_format_spark.streaming.encode_stream import encode_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tokens_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_src") / "tokens")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tokenize_documents(docs).write.parquet(path)
    return path


def test_stream_encode_matches_batch(spark, tokens_dir, tmp_path):
    out = str(tmp_path / "blobs")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(tokens_dir).schema
    stream = spark.readStream.schema(schema).parquet(tokens_dir)
    q = encode_stream(stream, out, ckpt, num_groups=4)
    q.awaitTermination(120)
    blobs = spark.read.parquet(out)
    assert blobs.count() >= 1
    decoded = decode_blobs(blobs, TOKENS_SCHEMA)
    batch = spark.read.parquet(tokens_dir)
    assert decoded.count() == batch.count()
    # content parity with the batch table (doc_id + detokenized text)
    a = {(r.doc_id, tuple(r.tokens)) for r in decoded.collect()}
    b = {(r.doc_id, tuple(r.tokens)) for r in batch.collect()}
    assert a == b


def test_stream_restart_is_exactly_once(spark, tokens_dir, tmp_path):
    out = str(tmp_path / "blobs")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(tokens_dir).schema
    stream = spark.readStream.schema(schema).parquet(tokens_dir)
    encode_stream(stream, out, ckpt, num_groups=4).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # restart against the same checkpoint: no new input -> no new blobs
    stream2 = spark.readStream.schema(schema).parquet(tokens_dir)
    encode_stream(stream2, out, ckpt, num_groups=4).awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_stream_encode_blob_sink(spark, tokens_dir, tmp_path):
    """Sink-mode stream: batch parquet carries blob_path lineage, tasks
    persist blobs under the sink, decode_blob_files restores parity."""
    import glob
    import os

    from orc_format_spark import decode_blob_files

    out = str(tmp_path / "blobs")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "store")
    schema = spark.read.parquet(tokens_dir).schema
    stream = spark.readStream.schema(schema).parquet(tokens_dir)
    encode_stream(stream, out, ckpt, num_groups=4, blob_sink=sink).awaitTermination(120)
    blobs = spark.read.parquet(out)
    assert "blob_path" in blobs.columns and "blob" not in blobs.columns
    files = glob.glob(os.path.join(sink, "batch_id=*", "group-*.ofs"))
    assert len(files) == blobs.count() == 4
    decoded = decode_blob_files(blobs, TOKENS_SCHEMA)
    batch = spark.read.parquet(tokens_dir)
    a = {(r.doc_id, tuple(r.tokens)) for r in decoded.collect()}
    b = {(r.doc_id, tuple(r.tokens)) for r in batch.collect()}
    assert a == b
