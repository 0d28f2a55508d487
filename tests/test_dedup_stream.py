"""stream_dedup: cross-batch first-arrival semantics, same-batch
min-key tie-break, carry columns, and schema validation. (The
driver-level oracle parity runs in test_entry_contract.py::
test_query_matches_oracle[stream_dedup].)"""

import os
import time

import pytest
from pyspark.sql import Row

from orc_format_spark.streaming import stream_dedup


def _write_batches(spark, path, batches):
    """Write each batch as one parquet part file with increasing mtime
    so the file stream source replays them in order."""
    os.makedirs(path)
    t0 = time.time() - 600
    seen = set()
    for b, rows in enumerate(batches):
        spark.createDataFrame(
            [Row(**r) for r in rows], "doc_id string, fp string, src string"
        ).coalesce(1).write.mode("append").parquet(path)
        for name in sorted(os.listdir(path)):
            if name.startswith("part-") and name not in seen:
                os.utime(f"{path}/{name}", (t0 + b * 60, t0 + b * 60))
                seen.add(name)


_QN = [0]


def _run(spark, src, out_dir, ckpt, **kw):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _QN[0] += 1
    name = f"sdedup_{_QN[0]}"
    q = (
        stream_dedup(stream, fingerprint_col="fp", key_col="doc_id", **kw)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_first_batch_wins_min_key_tiebreak(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(
        spark,
        src,
        [
            # batch 0: fp A twice (keys b, a) and fp B once
            [
                {"doc_id": "b", "fp": "A", "src": "s"},
                {"doc_id": "a", "fp": "A", "src": "s"},
                {"doc_id": "x", "fp": "B", "src": "s"},
            ],
            # batch 1: fp A again (suppressed), fp C new
            [
                {"doc_id": "0", "fp": "A", "src": "s"},
                {"doc_id": "z", "fp": "C", "src": "s"},
            ],
        ],
    )
    got = {
        r.fp: r.doc_id
        for r in _run(
            spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
        ).collect()
    }
    assert got == {"A": "a", "B": "x", "C": "z"}


def test_carry_cols_and_validation(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(
        spark, src, [[{"doc_id": "d1", "fp": "F", "src": "web"}]]
    )
    out = _run(
        spark,
        src,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        carry_cols=("src",),
    )
    assert out.columns == ["doc_id", "fp", "src"]
    assert out.collect()[0].src == "web"
    batch_df = spark.read.parquet(src)
    with pytest.raises(ValueError, match="not in stream schema"):
        stream_dedup(batch_df, fingerprint_col="nope")


def test_ttl_plan_builds(spark, tmp_path):
    """ttl path: the stateful plan with ProcessingTimeTimeout builds on
    a streaming source. (Not started: processing-time timeouts keep an
    availableNow query alive scheduling timeout batches — TTL is a
    continuous-trigger feature, see the operator docstring.)"""
    src = str(tmp_path / "src")
    _write_batches(spark, src, [[{"doc_id": "d", "fp": "F", "src": "s"}]])
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_dedup(stream, fingerprint_col="fp", ttl_ms=500)
    assert out.isStreaming and out.columns == ["doc_id", "fp"]
