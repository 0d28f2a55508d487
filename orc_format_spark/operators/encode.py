"""Encode / decode / verify operators (the engine core).

``encode_groups`` is the Spark reshaping of the reference's stripe writer
(src/writer/stripe.rs): one deterministic group == one stripe; the group's
columns are encoded by the vectorized kernels in
``orc_format_spark.codecs`` inside an ``applyInArrow`` UDF (Arrow-batched,
zero per-row Python), emitting one blob row + codec lineage, mirroring the
reference's StripeInfo/StreamInfo bookkeeping (stripe.rs:13-28) plus the
codec-selection metadata the reference lacks (SURVEY.md section 4.2).

Scale notes: the only shuffle is the groupBy on the deterministic
``group_id`` (see operators/partitioning.py); encoding is map-side work
after the shuffle; blobs are ~tokens_per_group * 4 bytes before
compression, sized to stay well inside executor memory. Decoding streams
blobs through ``mapInArrow`` without ever collecting.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

from ..codecs.container import decode_table, encode_table, table_checksum
from .partitioning import with_group_id

BLOB_SCHEMA = (
    "group_id long, n_rows long, n_values long, input_bytes long, "
    "output_bytes long, checksum string, codecs string, lineage string, "
    "blob binary"
)


def encode_groups(
    df: DataFrame,
    num_groups: int | None = None,
    codec: str = "auto",
    compression: str = "zstd",
    key_col: str | None = None,
    size_col: str | None = None,
) -> DataFrame:
    """Encode a DataFrame into per-group blobs + lineage."""
    if "group_id" not in df.columns:
        if num_groups is None:
            num_groups = max(1, df.rdd.getNumPartitions())
        key = key_col or df.columns[0]
        df = with_group_id(df, num_groups, key_col=key, size_col=size_col)
    sort_key = key_col or [c for c in df.columns if c != "group_id"][0]

    def fn(tbl: pa.Table) -> pa.Table:
        gid = tbl.column("group_id")[0].as_py() if tbl.num_rows else -1
        data = tbl.drop_columns(["group_id"]).sort_by(sort_key)
        blob, lineage = encode_table(data, codec=codec, compression=compression)
        leaf = [l for l in lineage if l["codec"] != "list"]
        n_values = sum(l["n_present"] for l in leaf)
        input_bytes = sum(l["input_bytes"] for l in lineage)
        codecs = {l["column"]: l["codec"] for l in lineage}
        return pa.table(
            {
                "group_id": pa.array([gid], pa.int64()),
                "n_rows": pa.array([data.num_rows], pa.int64()),
                "n_values": pa.array([n_values], pa.int64()),
                "input_bytes": pa.array([input_bytes], pa.int64()),
                "output_bytes": pa.array([len(blob)], pa.int64()),
                "checksum": pa.array([table_checksum(data)], pa.string()),
                "codecs": pa.array([json.dumps(codecs, sort_keys=True)], pa.string()),
                "lineage": pa.array([json.dumps(lineage, sort_keys=True)], pa.string()),
                "blob": pa.array([blob], pa.binary()),
            }
        )

    return df.groupBy("group_id").applyInArrow(fn, BLOB_SCHEMA)


def decode_blobs(blobs: DataFrame, schema: str) -> DataFrame:
    """Decode blob rows back into the original table shape."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            col = batch.column(batch.schema.get_field_index("blob"))
            for v in col:
                tbl = decode_table(v.as_py())
                yield from tbl.to_batches()

    return blobs.select("blob").mapInArrow(fn, schema)


def verify_blobs(blobs: DataFrame) -> DataFrame:
    """Per-blob roundtrip verification: decode and compare checksums."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            t = pa.Table.from_batches([batch])
            gids = t.column("group_id").to_pylist()
            sums = t.column("checksum").to_pylist()
            blobs_col = t.column("blob").to_pylist()
            out_ok = []
            out_sum = []
            for cs, bl in zip(sums, blobs_col):
                decoded = decode_table(bl)
                ds = table_checksum(decoded)
                out_sum.append(ds)
                out_ok.append(ds == cs)
            yield pa.record_batch(
                [
                    pa.array(gids, pa.int64()),
                    pa.array(out_ok, pa.bool_()),
                    pa.array(sums, pa.string()),
                    pa.array(out_sum, pa.string()),
                ],
                names=["group_id", "ok", "checksum", "checksum_decoded"],
            )

    return blobs.select("group_id", "checksum", "blob").mapInArrow(
        fn, "group_id long, ok boolean, checksum string, checksum_decoded string"
    )
