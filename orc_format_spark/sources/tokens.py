"""Tokens-table source: the engine's authoritative input shape.

BASELINE.json input_hint: ``tokens(doc_id string, tokens array<int32>,
n_tok int, source string)`` — an Iceberg table of pre-tokenized training
sequences. At sandbox scale we derive it deterministically from the
driver-provided ``documents`` parquet (doc_id, text, lang, source,
n_chars) with a lossless byte-level tokenizer: token ids are the UTF-8
bytes of ``text``. Losslessness means encode->decode->detokenize can be
oracle-checked against ``SELECT doc_id, text FROM documents`` in DuckDB.

All transformations are Arrow-vectorized inside ``mapInArrow`` — no
per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from ..worker_env import limit_worker_threads

TOKENS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _text_to_token_lists(text_arr: pa.Array) -> tuple[pa.Array, pa.Array]:
    """utf8 column -> (list<int32> token arrays, int32 lengths)."""
    a = text_arr.cast(pa.large_binary())
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    n = len(a)
    bufs = a.buffers()
    if n == 0:
        empty = pa.array([], pa.list_(pa.int32()))
        return empty, pa.array([], pa.int32())
    off = np.frombuffer(bufs[1], np.int64, n + 1, a.offset * 8)
    data = np.frombuffer(bufs[2], np.uint8)[off[0] : off[-1]]
    rel_off = (off - off[0]).astype(np.int64)
    toks = pa.LargeListArray.from_arrays(
        pa.array(rel_off, pa.int64()), pa.array(data.astype(np.int32), pa.int32())
    ).cast(pa.list_(pa.int32()))
    lens = pa.array((rel_off[1:] - rel_off[:-1]).astype(np.int32), pa.int32())
    return toks, lens


def _token_lists_to_text(tok_col: pa.Array) -> pa.Array:
    """list<int32> token arrays -> utf8 strings (inverse tokenizer)."""
    a = tok_col.cast(pa.large_list(pa.int32()))
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    n = len(a)
    off = np.frombuffer(a.buffers()[1], np.int64, n + 1, a.offset * 8)
    flat = a.flatten().to_numpy(zero_copy_only=False).astype(np.uint8)
    rel_off = (off - off[0]).astype(np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(rel_off), pa.py_buffer(flat)]
    ).cast(pa.string())


def tokenize_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id,text,lang,source,...) -> tokens table (input_hint)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        limit_worker_threads()
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            toks, lens = _text_to_token_lists(tbl.column("text").combine_chunks())
            yield pa.record_batch(
                [
                    tbl.column("doc_id").cast(pa.string()).combine_chunks(),
                    toks,
                    lens,
                    tbl.column("source").cast(pa.string()).combine_chunks(),
                ],
                names=["doc_id", "tokens", "n_tok", "source"],
            )

    return docs.select("doc_id", "text", "source").mapInArrow(fn, TOKENS_SCHEMA)


def detokenize(tokens: DataFrame) -> DataFrame:
    """tokens table -> (doc_id string, text string); inverse of tokenize."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        limit_worker_threads()
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            text = _token_lists_to_text(tbl.column("tokens").combine_chunks())
            yield pa.record_batch(
                [tbl.column("doc_id").combine_chunks(), text],
                names=["doc_id", "text"],
            )

    return tokens.select("doc_id", "tokens").mapInArrow(fn, "doc_id string, text string")
