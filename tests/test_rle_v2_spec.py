"""ORC v1 specification golden vectors for RLEv2 (SURVEY.md §5.2 /
round-2 verdict item 4).

The public ORC v1 spec ("Run Length Encoding, version 2") publishes one
worked byte example per sub-encoding. Encoder equality is asserted where
the spec's example corresponds to the width/strategy choice a conforming
greedy writer makes (short-repeat, direct, delta — our writer emits the
spec's exact bytes); patched-base grants the writer strategy freedom
(percentile split, patch width), so there the DECODER is pinned to the
spec bytes — interop insurance that our reader consumes foreign
ORC-conformant streams, and a guard against self-consistent-but-wrong
headers (the round-2 delta width field was exactly such a bug class:
off by one vs the spec table).
"""

import numpy as np

from orc_format_spark.codecs.rle_v2 import decode_int_rle_v2, encode_int_rle_v2

# --- spec worked examples (ORC v1 spec, RLEv2 section) -------------------

# Short Repeat: [10000, 10000, 10000, 10000, 10000]
SR_VALUES = [10000] * 5
SR_BYTES = bytes([0x0A, 0x27, 0x10])

# Direct: [23713, 43806, 57005, 48879]
DIR_VALUES = [23713, 43806, 57005, 48879]
DIR_BYTES = bytes(
    [0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF]
)

# Delta: [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
DELTA_VALUES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
DELTA_BYTES = bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46])

# Patched Base: [2030, 2000, 2020, 1000000, 2040, 2050, 2060, 2070,
#                2080, 2090]
PB_VALUES = [2030, 2000, 2020, 1000000, 2040, 2050, 2060, 2070, 2080, 2090]
PB_BYTES = bytes(
    [
        0x8E, 0x09, 0x2B, 0x21, 0x07, 0xD0, 0x1E, 0x00, 0x14, 0x70,
        0x28, 0x32, 0x3C, 0x46, 0x50, 0x5A, 0xFC, 0xE8,
    ]
)


def test_short_repeat_spec_encode():
    got = encode_int_rle_v2(np.array(SR_VALUES, np.uint64), signed=False)
    assert got == SR_BYTES


def test_direct_spec_encode():
    got = encode_int_rle_v2(np.array(DIR_VALUES, np.uint64), signed=False)
    assert got == DIR_BYTES


def test_delta_spec_encode():
    got = encode_int_rle_v2(np.array(DELTA_VALUES, np.uint64), signed=False)
    assert got == DELTA_BYTES


def test_spec_bytes_decode():
    for values, blob in (
        (SR_VALUES, SR_BYTES),
        (DIR_VALUES, DIR_BYTES),
        (DELTA_VALUES, DELTA_BYTES),
        (PB_VALUES, PB_BYTES),
    ):
        out = decode_int_rle_v2(blob, signed=False)
        assert out.tolist() == values, values


def test_spec_streams_concatenated_decode():
    """Sub-encoding groups concatenate into one stream (an ORC DATA
    stream is a sequence of groups)."""
    blob = SR_BYTES + DELTA_BYTES + DIR_BYTES + PB_BYTES
    out = decode_int_rle_v2(blob, signed=False)
    assert out.tolist() == SR_VALUES + DELTA_VALUES + DIR_VALUES + PB_VALUES


def test_patched_base_roundtrip_stays_spec_decodable():
    """Our own patched-base strategy differs from the Java writer's
    (exact-count 95th percentile), but the bytes it emits must stay
    spec-shaped: headers parse, and decode inverts encode."""
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1 << 10, 300).astype(np.int64) + 5000
    vals[rng.choice(300, 7, replace=False)] += np.int64(1) << 45
    blob = encode_int_rle_v2(vals, signed=True)
    assert blob[0] >> 6 == 2  # patched-base tag
    assert decode_int_rle_v2(blob, signed=True).tolist() == vals.tolist()
