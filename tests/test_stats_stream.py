"""Streaming ingest analytics: watermarked window agg and the custom
stateful running-totals operator must match the equivalent batch
computation when the stream is fully drained (availableNow)."""

import pytest
from pyspark.sql import functions as F

from orc_format_spark import tokenize_documents
from orc_format_spark.streaming import token_running_totals, token_window_stats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def timed_tokens_dir(spark, tmp_path_factory):
    """Tokens table + synthetic event_time spread over 5 minutes."""
    path = str(tmp_path_factory.mktemp("stream_src") / "timed")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = tokenize_documents(docs).withColumn(
        "event_time",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(secs=F.xxhash64("doc_id") % 300),
    )
    toks.write.parquet(path)
    return path


def _drain(q, seconds=120):
    q.awaitTermination(seconds)


def test_window_stats_match_batch(spark, timed_tokens_dir, tmp_path):
    schema = spark.read.parquet(timed_tokens_dir).schema
    stream = spark.readStream.schema(schema).parquet(timed_tokens_dir)
    # zero lateness: availableNow advances the watermark to max(event_time),
    # closing (and emitting) every window except the one holding the max
    out = token_window_stats(stream, window="1 minute", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("winstats")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    _drain(q)
    got = {
        (r.window_start, r.source): (r.n_docs, r.n_tokens)
        for r in spark.sql("SELECT * FROM winstats").collect()
    }
    batch = (
        spark.read.parquet(timed_tokens_dir)
        .groupBy(F.window("event_time", "1 minute").alias("win"), "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    want = {
        (r.win.start, r.source): (r.n_docs, r.n_tokens) for r in batch.collect()
    }
    # append mode emits exactly the watermark-closed windows: with zero
    # lateness those are the (window, source) groups whose window ends at
    # or before the max event time
    assert got
    for k, v in got.items():
        assert want[k] == v
    max_ev = (
        spark.read.parquet(timed_tokens_dir).agg(F.max("event_time")).first()[0]
    )
    closed = {
        k for k in want
        if (k[0] + __import__("datetime").timedelta(minutes=1)) <= max_ev
    }
    assert set(got) >= closed


def test_running_totals_match_batch(spark, timed_tokens_dir, tmp_path):
    schema = spark.read.parquet(timed_tokens_dir).schema
    stream = spark.readStream.schema(schema).parquet(timed_tokens_dir)
    out = token_running_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("runtotals")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    _drain(q)
    rows = spark.sql("SELECT * FROM runtotals").collect()
    # last emitted row per source = the final cumulative totals
    final = {}
    for r in rows:
        final[r.source] = (r.total_docs, r.total_tokens)
    batch = (
        spark.read.parquet(timed_tokens_dir)
        .groupBy("source")
        .agg(F.count("*").alias("d"), F.sum("n_tok").cast("long").alias("t"))
    )
    want = {r.source: (r.d, r.t) for r in batch.collect()}
    assert final == want
