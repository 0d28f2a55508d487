"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extraction / frame-sampling over ``mapInArrow``.

Image/audio/video libraries are not available in this container, so the
*decode* step is stubbed (``decode_image`` raises ``NotImplementedError``
unless PIL is importable; ``fake_features`` is a deterministic stand-in)
— but the Spark-side plumbing is real and tested: binary columns travel
as Arrow buffers, the UDFs are Arrow-batched (no per-row Python), the
schema/partitioning shapes are what a real decoder would use.

Scale shape: feature extraction is a map-side projection over binary
buffers; at 100 TB the binary column stays in the parquet scan's own
splits (no shuffle) exactly like the split-level encode path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 8
_MOD = 997


def with_payload(docs: DataFrame) -> DataFrame:
    """documents -> multimodal-shaped table: binary payload + metadata.

    (Sandbox stand-in: the payload is the UTF-8 text bytes; in production
    it would be image/audio bytes read from the object store.)
    """
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.col("text")).alias("n_bytes"),
    )


def decode_image(payload: bytes):
    """Decode an image payload. STUB: pillow is not installed in this
    container; the real implementation is gated on its availability."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as ex:
        raise NotImplementedError(
            "image decode requires pillow, which is not available here; "
            "the surrounding Spark plumbing (binary columns, Arrow batching, "
            "schema) is real and tested with fake_features()"
        ) from ex
    import io

    return Image.open(io.BytesIO(payload))


def fake_features(n_bytes: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature map: (len(payload) * k) % 997 for
    k = 1..dim. Shape (n, dim), int64."""
    k = np.arange(1, dim + 1, dtype=np.int64)
    return (n_bytes.astype(np.int64)[:, None] * k[None, :]) % _MOD


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(doc_id, payload, ...) -> (doc_id, features array<bigint>).

    Real Arrow-batched plumbing: payload buffers arrive as Arrow binary
    arrays, lengths are computed zero-copy from the offsets buffer, and
    the feature matrix is built vectorized — swap ``fake_features`` for a
    real image/audio featurizer and nothing else changes.
    """

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            pay = tbl.column("payload").combine_chunks().cast(pa.large_binary())
            n = len(pay)
            if n == 0:
                continue
            bufs = pay.buffers()
            off = np.frombuffer(bufs[1], np.int64, n + 1, pay.offset * 8)
            lens = off[1:] - off[:-1]
            feats = fake_features(lens, dim)
            flat = pa.array(feats.reshape(-1), pa.int64())
            offsets = pa.array(
                np.arange(0, (n + 1) * dim, dim, dtype=np.int32), pa.int32()
            )
            yield pa.record_batch(
                [
                    tbl.column("doc_id").combine_chunks().cast(pa.string()),
                    pa.ListArray.from_arrays(offsets, flat),
                ],
                names=["doc_id", "features"],
            )

    return df.select("doc_id", "payload").mapInArrow(
        fn, "doc_id string, features array<bigint>"
    )


def extract_features_sql(dim: int = FEATURE_DIM, table: str = "documents") -> str:
    """DuckDB oracle for the deterministic stand-in featurizer (CSV string
    output so the driver's pandas canonicalizer can sort/hash rows)."""
    return (
        f"SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
        f"array_to_string(list_transform(range(1, {dim} + 1), "
        f"k -> (CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * k) % {_MOD}), ',') "
        f"AS features_csv "
        f"FROM {table}"
    )


def frame_sample(df: DataFrame, stride: int = 16) -> DataFrame:
    """Sample every stride-th byte of the payload (the video frame-sample
    shape: seek + slice without decoding). Arrow-batched, zero-copy in."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            pay = tbl.column("payload").combine_chunks().cast(pa.large_binary())
            n = len(pay)
            if n == 0:
                continue
            bufs = pay.buffers()
            off = np.frombuffer(bufs[1], np.int64, n + 1, pay.offset * 8)
            data = np.frombuffer(bufs[2], np.uint8)[off[0] : off[-1]]
            rel = off - off[0]
            lens = rel[1:] - rel[:-1]
            out_lens = (lens + stride - 1) // stride
            tot = int(out_lens.sum())
            ends = np.cumsum(out_lens)
            within = np.arange(tot, dtype=np.int64) - np.repeat(ends - out_lens, out_lens)
            src = np.repeat(rel[:-1], out_lens) + within * stride
            sampled = data[src]
            out_off = np.zeros(n + 1, np.int64)
            out_off[1:] = ends
            arr = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(),
                n,
                [None, pa.py_buffer(out_off), pa.py_buffer(sampled)],
            )
            yield pa.record_batch(
                [
                    tbl.column("doc_id").combine_chunks().cast(pa.string()),
                    arr.cast(pa.binary()),
                ],
                names=["doc_id", "frames"],
            )

    return df.select("doc_id", "payload").mapInArrow(
        fn, "doc_id string, frames binary"
    )


def resize_payload(df: DataFrame, target: int = 32) -> DataFrame:
    """Nearest-neighbor resize of each payload to exactly ``target``
    bytes (the 1-D byte-level analogue of image resize: output byte i
    is source byte floor(i*L/target); L==0 -> empty). Deterministic,
    vectorized gather over Arrow buffers — zero-copy in, no per-row
    Python — so the hex-projected DuckDB oracle reproduces it exactly.
    A real image resize would swap this kernel for a decoder+resampler
    behind the same Arrow-batched signature (see decode_image's gate)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            pay = tbl.column("payload").combine_chunks().cast(pa.large_binary())
            n = len(pay)
            if n == 0:
                continue
            bufs = pay.buffers()
            off = np.frombuffer(bufs[1], np.int64, n + 1, pay.offset * 8)
            data = np.frombuffer(bufs[2], np.uint8)[off[0] : off[-1]]
            rel = off - off[0]
            lens = rel[1:] - rel[:-1]
            out_lens = np.where(lens == 0, 0, target).astype(np.int64)
            tot = int(out_lens.sum())
            ends = np.cumsum(out_lens)
            within = np.arange(tot, dtype=np.int64) - np.repeat(
                ends - out_lens, out_lens
            )
            src_lens = np.repeat(lens, out_lens)
            src = np.repeat(rel[:-1], out_lens) + (within * src_lens) // target
            resized = data[src] if tot else np.empty(0, np.uint8)
            out_off = np.zeros(n + 1, np.int64)
            out_off[1:] = ends
            arr = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(),
                n,
                [None, pa.py_buffer(out_off), pa.py_buffer(resized)],
            )
            yield pa.record_batch(
                [
                    tbl.column("doc_id").combine_chunks().cast(pa.string()),
                    arr.cast(pa.binary()),
                ],
                names=["doc_id", "resized"],
            )

    return df.select("doc_id", "payload").mapInArrow(
        fn, "doc_id string, resized binary"
    )


def resize_payload_sql(target: int = 32, table: str = "documents") -> str:
    """DuckDB oracle for :func:`resize_payload` over the documents-backed
    payload (payload == UTF-8 text bytes, as in with_payload)."""
    return (
        "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
        "lower(array_to_string(list_transform("
        "range(0, CASE WHEN octet_length(CAST(text AS BLOB)) = 0 THEN 0 "
        f"ELSE {target} END), "
        "i -> substr(hex(CAST(text AS BLOB)), "
        f"CAST(2 * ((i * octet_length(CAST(text AS BLOB))) // {target}) + 1 AS INT), 2)"
        "), '')) AS resized_hex "
        f"FROM {table}"
    )
