"""Adversarial blob-input fuzz: corrupted containers must never yield
silently-wrong data.

The system-level guarantee (mirrors the reference's corrupt-file
behavior, reader errors not wrong values): for ANY truncation or
single-byte flip of a blob, `decode_table` either (a) raises a clean
Python exception, (b) returns a table logically EQUAL to the original
(the flipped byte is genuinely decode-redundant — e.g. the
informational engine tag, or `n_present` under has_null=False), or
(c) returns a table whose `table_checksum` differs from the original's
— which `verify_blobs` (and the encode job's lineage checksums) catch.
There is no fourth outcome: a wrong table that PASSES the checksum.
"""

import numpy as np
import pyarrow as pa
import pytest

from orc_format_spark.codecs.container import (
    decode_table,
    encode_table,
    table_checksum,
)


def _table():
    rng = np.random.default_rng(7)
    return pa.table(
        {
            "a": pa.array(rng.integers(0, 50, 400), pa.int64()),
            "s": pa.array([f"word{i % 17}" for i in range(400)]),
            "f": pa.array(rng.normal(size=400), pa.float64()),
            "n": pa.array(
                [None if i % 5 == 0 else i for i in range(400)], pa.int32()
            ),
        }
    )


def test_every_truncation_raises():
    t = _table()
    blob, _ = encode_table(t)
    for k in range(len(blob)):
        with pytest.raises(Exception):
            decode_table(blob[:k])


def test_every_byte_flip_is_raise_equal_or_checksum_caught():
    t = _table()
    blob, _ = encode_table(t)
    orig = table_checksum(t)
    outcomes = {"raise": 0, "equal": 0, "caught": 0}
    for pos in range(len(blob)):
        bad = bytearray(blob)
        bad[pos] ^= 0x41
        try:
            out = decode_table(bytes(bad))
        except Exception:
            outcomes["raise"] += 1
            continue
        if out.equals(t):
            outcomes["equal"] += 1
        else:
            # wrong data MUST be checksum-detectable
            assert table_checksum(out) != orig, f"silent wrong data at byte {pos}"
            outcomes["caught"] += 1
    # the guarantee is the absence of a fourth outcome; sanity-check the
    # distribution is non-degenerate (header flips raise, payload flips
    # mostly decode wrong and are checksum-caught, a few bytes are
    # genuinely redundant)
    assert outcomes["raise"] > 0 and outcomes["caught"] > 0, outcomes
    assert outcomes["equal"] < len(blob) // 50, outcomes


def test_random_garbage_raises():
    rng = np.random.default_rng(11)
    for n in (0, 1, 6, 7, 64, 4096):
        with pytest.raises(Exception):
            decode_table(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    # right magic, absurd entry count, garbage tail
    with pytest.raises(Exception):
        decode_table(b"OFS1\x03\xff\xff" + bytes(64))
